"""Headline benchmark: voxel collision checks/sec + insert->collide cycle Hz.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where the
value is voxel-pair collision checks/sec on a 512^3 prob x prob sweep (the
reference's kernelCollideVoxelMapsDebug workload) and vs_baseline is measured
against the 1e9 checks/s target from BASELINE.md. Details (cycle Hz etc.) go
to stderr.

Measurement method: the TPU here sits behind a relay with ~3ms dispatch and
~30ms fetch latency, so per-call wall timing lies. Each measurement runs K
sweeps inside ONE jitted lax.fori_loop whose per-iteration parameters change
(so XLA cannot hoist the sweep), and the 1-iteration launch baseline is
subtracted: t_sweep = (t(K) - t(1)) / (K - 1).
"""
import json
import sys
import time

import numpy as np


def _timed_loop(build_fn, iters, *args):
    """build_fn(k) -> jitted callable(*args) running k serially-dependent
    sweeps. The TPU relay makes block_until_ready unreliable, so timing
    fetches the scalar result (forcing completion) and subtracts the
    1-iteration launch+fetch baseline."""
    fn_k = build_fn(iters)
    fn_1 = build_fn(1)
    # warm both (compile)
    int(fn_k(*args))
    int(fn_1(*args))

    def run(f):
        t0 = time.perf_counter()
        out = int(f(*args))
        dt = time.perf_counter() - t0
        return dt, out

    t1 = min(run(fn_1)[0] for _ in range(3))
    tk = min(run(fn_k)[0] for _ in range(3))
    return max(tk - t1, 1e-9) / (iters - 1)


def main():
    import jax
    import jax.numpy as jnp

    from gpu_voxels_tpu.geometry import generation
    from gpu_voxels_tpu.maps.voxelmap import ProbVoxelMap
    from gpu_voxels_tpu.ops import collide as xla_collide
    from gpu_voxels_tpu.ops import collide_pallas as cp

    dims = (512, 512, 512)
    n = dims[0] * dims[1] * dims[2]
    side = 1.0

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(-128, 128, n, dtype=np.int64).astype(np.int8))
    b = jnp.asarray(rng.integers(-128, 128, n, dtype=np.int64).astype(np.int8))

    def build_xla(k):
        @jax.jit
        def run(x, y):
            def body(i, acc):
                # threshold depends on the carried count: serial dependency,
                # so XLA cannot hoist or batch the sweeps
                t1 = (acc % jnp.uint32(3)).astype(jnp.int32) - 120
                return acc + xla_collide.count_prob_prob(x, y, t1, 0)

            return jax.lax.fori_loop(0, k, body, jnp.uint32(0))

        return run

    def build_pallas(k):
        @jax.jit
        def run(x, y):
            def body(i, acc):
                t1 = (acc % jnp.uint32(3)).astype(jnp.int32) - 120
                return acc + cp.count_prob_prob(x, y, t1, 0)

            return jax.lax.fori_loop(0, k, body, jnp.uint32(0))

        return run

    iters = 201
    t_xla = _timed_loop(build_xla, iters, a, b)
    t_pallas = _timed_loop(build_pallas, iters, a, b)
    best = min(t_xla, t_pallas)
    checks_per_sec = n / best
    print(
        f"collide 512^3: xla {t_xla*1e3:.3f} ms/sweep, pallas {t_pallas*1e3:.3f} ms/sweep "
        f"-> {checks_per_sec:.3e} checks/s (eff BW {2*n/best/1e9:.0f} GB/s)",
        file=sys.stderr,
    )

    # full cycle: insert two Kinect-sized clouds (307k points) + collide, 512^3
    pts_env = jnp.asarray(
        generation.create_equidistant_points_in_box(307200, (511, 511, 511), side)
    )

    def build_cycle(k):
        @jax.jit
        def run(pts):
            def body(i, acc):
                # cloud shift depends on the carried count: serial dependency
                off = (acc % jnp.uint32(7)).astype(jnp.float32)
                m1 = ProbVoxelMap.create(dims, side).insert_point_cloud(pts + off)
                m2 = ProbVoxelMap.create(dims, side).insert_point_cloud(pts + off + 1.0)
                return acc + m1.collide_with(m2, 0.5)

            return jax.lax.fori_loop(0, k, body, jnp.uint32(0))

        return run

    t_cycle = _timed_loop(build_cycle, 101, pts_env)
    print(
        f"full insert->collide cycle 512^3: {t_cycle*1e3:.2f} ms = {1.0/t_cycle:.1f} Hz",
        file=sys.stderr,
    )

    print(
        json.dumps(
            {
                "metric": "voxel collision checks/sec (512^3 prob x prob)",
                "value": checks_per_sec,
                "unit": "checks/s",
                "vs_baseline": checks_per_sec / 1e9,
            }
        )
    )


if __name__ == "__main__":
    main()
