"""Randomized differential tests: framework vs independent numpy oracles.

Broader hardening than the fixed reference scenes: random clouds, random
offsets, random thresholds — counts must match exact set arithmetic.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from gpu_voxels_tpu.constants import float_to_probability
from gpu_voxels_tpu.maps.voxellist import bit_vector_voxel_list
from gpu_voxels_tpu.maps.voxelmap import BitVectorVoxelMap, ProbVoxelMap

DIMS = (21, 18, 15)


def _voxels(pts, side=1.0):
    return set(map(tuple, np.floor(np.asarray(pts) / side).astype(int)))


def _clip_in(vox, dims):
    return {v for v in vox if all(0 <= v[i] < dims[i] for i in range(3))}


@pytest.mark.parametrize("seed", range(6))
def test_offset_collision_differential(seed):
    rng = np.random.default_rng(seed)
    a = rng.uniform(-2, 20, (rng.integers(5, 400), 3)).astype(np.float32)
    b = rng.uniform(-2, 20, (rng.integers(5, 400), 3)).astype(np.float32)
    off = tuple(int(v) for v in rng.integers(-3, 4, 3))

    m1 = ProbVoxelMap.create(DIMS).insert_point_cloud(a)
    m2 = ProbVoxelMap.create(DIMS).insert_point_cloud(b)
    got = int(m1.collide_with(m2, 0.1, off))

    # oracle: collide(this[i+off], other[i]) over in-range flat indices;
    # equivalently this voxel v (in-map) vs other voxel v-off (in-map), where
    # "in-map" means the flat index stays in range — the reference's shifted
    # pointer wraps across rows, so emulate via flat index arithmetic
    va = _clip_in(_voxels(a), DIMS)
    vb = _clip_in(_voxels(b), DIMS)
    dx, dy, dz = DIMS
    n = dx * dy * dz

    def flat(v):
        return v[2] * dx * dy + v[1] * dx + v[0]

    offl = off[2] * dx * dy + off[1] * dx + off[0]
    fa = {flat(v) for v in va}
    fb = {flat(v) for v in vb}
    expect = sum(1 for i in range(n) if 0 <= i + offl < n and (i + offl) in fa and i in fb)
    assert got == expect, (seed, off)


@pytest.mark.parametrize("seed", range(4))
def test_list_set_ops_differential(seed):
    rng = np.random.default_rng(100 + seed)
    a = rng.uniform(0, 20, (rng.integers(10, 300), 3)).astype(np.float32)
    b = rng.uniform(0, 20, (rng.integers(10, 300), 3)).astype(np.float32)
    la = bit_vector_voxel_list(DIMS).insert_point_cloud(a, 50)
    lb = bit_vector_voxel_list(DIMS).insert_point_cloud(b, 60)

    # the list insert does NOT bounds-check (reference parity): out-of-range
    # coords produce wrapped linear ids that can alias, so the oracle works
    # on linear ids, not 3D voxels
    dx, dy, _ = DIMS

    def ids(pts):
        v = np.floor(np.asarray(pts)).astype(np.int64)
        return set(((v[:, 2] * dx * dy + v[:, 1] * dx + v[:, 0]) % (1 << 32)).tolist())

    va, vb = ids(a), ids(b)
    assert int(la.count) == len(va)
    assert int(la.collide_with(lb)) == len(va & vb)
    assert int(la.subtract(lb).count) == len(va - vb)
    assert int(la.merge(lb).count) == len(va | vb)


@pytest.mark.parametrize("seed", range(4))
def test_bitmap_vs_probmap_cross_type_differential(seed):
    rng = np.random.default_rng(200 + seed)
    a = rng.uniform(0, 18, (200, 3)).astype(np.float32)
    b = rng.uniform(0, 18, (200, 3)).astype(np.float32)
    bm = BitVectorVoxelMap.create(DIMS).insert_point_cloud(a, 77)
    pm = ProbVoxelMap.create(DIMS).insert_point_cloud(b)
    expect = len(_clip_in(_voxels(a), DIMS) & _clip_in(_voxels(b), DIMS))
    assert int(bm.collide_with(pm, 0.5)) == expect
    assert int(pm.collide_with(bm, 0.5)) == expect
    assert bool(bm.collides_with(pm, 0.5)) == (expect > 0)
