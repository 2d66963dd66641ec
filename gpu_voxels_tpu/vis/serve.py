"""Live visualizer process (reference: gpu_visualization/ viewer app).

The CUDA viewer is a separate process reading shared GPU memory; the TPU
equivalent is a separate process reading the VisProvider's published
snapshots. `python -m gpu_voxels_tpu.vis.serve [dir] [port]` serves a
self-refreshing three.js page over HTTP: the library process keeps calling
`GpuVoxels.visualize_map` (or VisProvider.visualize) and the browser follows
along — same architecture, shared files instead of CUDA IPC.
"""
from __future__ import annotations

import json
import os
import sys
import time
from http.server import HTTPServer, SimpleHTTPRequestHandler
from pathlib import Path

INDEX = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>gpu_voxels_tpu live</title>
<style>body{margin:0;background:#111;color:#eee;font-family:sans-serif}
#hud{position:absolute;top:8px;left:8px;z-index:2}</style></head>
<body><div id="hud">gpu_voxels_tpu live viewer — <span id="status">loading</span></div>
<canvas id="c"></canvas>
<script type="module">
import * as THREE from 'https://unpkg.com/three@0.160.0/build/three.module.js';
import {OrbitControls} from 'https://unpkg.com/three@0.160.0/examples/jsm/controls/OrbitControls.js';
const renderer = new THREE.WebGLRenderer({canvas: document.getElementById('c')});
renderer.setSize(window.innerWidth, window.innerHeight);
const scene = new THREE.Scene();
const camera = new THREE.PerspectiveCamera(60, innerWidth/innerHeight, 0.01, 10000);
camera.position.set(40, 40, 40);
new OrbitControls(camera, renderer.domElement);
scene.add(new THREE.AmbientLight(0xffffff, 0.7));
const dl = new THREE.DirectionalLight(0xffffff, 1.2); dl.position.set(1,2,3); scene.add(dl);
let meshes = [];
async function refresh() {
  try {
    const manifest = await (await fetch('manifest.json', {cache: 'no-store'})).json();
    const layers = [];
    for (const name of manifest.maps) {
      layers.push(await (await fetch(name + '.cubes.json', {cache: 'no-store'})).json());
    }
    meshes.forEach(m => scene.remove(m));
    meshes = [];
    let total = 0;
    for (const layer of layers) {
      const geo = new THREE.BoxGeometry(layer.side, layer.side, layer.side);
      const mat = new THREE.MeshLambertMaterial();
      const mesh = new THREE.InstancedMesh(geo, mat, layer.centers.length);
      const mtx = new THREE.Matrix4();
      layer.centers.forEach((c, i) => {
        mtx.setPosition(c[0], c[1], c[2]); mesh.setMatrixAt(i, mtx);
        const col = layer.colors[i];
        mesh.setColorAt(i, new THREE.Color(col[0]/255, col[1]/255, col[2]/255));
      });
      scene.add(mesh); meshes.push(mesh); total += layer.centers.length;
    }
    document.getElementById('status').textContent =
      `${manifest.maps.length} maps, ${total} cubes, t=${manifest.ts}`;
  } catch (e) { document.getElementById('status').textContent = 'waiting for data'; }
}
setInterval(refresh, 1000); refresh();
(function animate(){ requestAnimationFrame(animate); renderer.render(scene, camera); })();
</script></body></html>"""


def publish_cubes(out_dir, name: str, m, threshold: float = 0.5) -> None:
    """Write a map snapshot consumable by the live viewer."""
    import numpy as np

    from .export import _color_for
    from .extract import extract_cubes

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    centers, types = extract_cubes(m, threshold)
    payload = dict(
        side=float(m.side_length),
        centers=np.round(centers, 4).tolist(),
        colors=[list(_color_for(int(t))) for t in types],
    )
    (out / f"{name}.cubes.json").write_text(json.dumps(payload))
    manifest = {"maps": [], "ts": time.strftime("%H:%M:%S")}
    mf = out / "manifest.json"
    if mf.exists():
        try:
            manifest["maps"] = json.loads(mf.read_text()).get("maps", [])
        except json.JSONDecodeError:
            pass
    if name not in manifest["maps"]:
        manifest["maps"].append(name)
    mf.write_text(json.dumps(manifest))


def serve(directory, port: int = 8321) -> None:
    d = Path(directory)
    d.mkdir(parents=True, exist_ok=True)
    (d / "index.html").write_text(INDEX)

    class Handler(SimpleHTTPRequestHandler):
        def __init__(self, *args, **kwargs):
            super().__init__(*args, directory=str(d), **kwargs)

        def log_message(self, *args):
            pass

    print(f"serving {d} at http://localhost:{port}")
    HTTPServer(("0.0.0.0", port), Handler).serve_forever()


if __name__ == "__main__":
    directory = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "GPU_VOXELS_VIS_DIR", "/tmp/gpu_voxels_tpu_vis"
    )
    port = int(sys.argv[2]) if len(sys.argv) > 2 else 8321
    serve(directory, port)
