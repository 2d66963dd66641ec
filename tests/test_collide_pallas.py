"""Pallas collision kernels agree with the XLA reference formulation.

On the CPU test backend the kernels auto-select interpreter mode
(collide_pallas._interpret), so these tests exercise the same kernel bodies
that compile on TPU.
"""
import numpy as np
import jax.numpy as jnp

from gpu_voxels_tpu.ops import collide as xla_collide
from gpu_voxels_tpu.ops import collide_pallas as cp


def test_count_prob_prob_matches_xla():
    rng = np.random.default_rng(0)
    n = 300_000  # not tile aligned on purpose
    a = jnp.asarray(rng.integers(-128, 128, n, dtype=np.int64).astype(np.int8))
    b = jnp.asarray(rng.integers(-128, 128, n, dtype=np.int64).astype(np.int8))
    got = int(cp.count_prob_prob(a, b, 100, 100))
    ref = int(xla_collide.count_prob_prob(a, b, 100, 100))
    assert got == ref


def test_count_bit_bit_matches_xla():
    rng = np.random.default_rng(1)
    n = 100_000
    a = jnp.asarray((rng.integers(0, 2**32, (8, n), dtype=np.uint64) & rng.integers(0, 4, (8, n), dtype=np.uint64)).astype(np.uint32))
    b = jnp.asarray((rng.integers(0, 2**32, (8, n), dtype=np.uint64) & rng.integers(0, 4, (8, n), dtype=np.uint64)).astype(np.uint32))
    got = int(cp.count_bit_bit(a, b))
    ref = int(xla_collide.count_bit_bit(a, b))
    assert got == ref


def test_count_and_mark_matches_xla():
    rng = np.random.default_rng(2)
    n = 50_000
    a = jnp.asarray(rng.integers(-128, 128, n, dtype=np.int64).astype(np.int8))
    b = jnp.asarray(rng.integers(-128, 128, n, dtype=np.int64).astype(np.int8))
    got_c, got_m = cp.count_and_mark_prob(a, b, 50, 50)
    ref_c, ref_m = xla_collide.count_and_mark_prob(a, b, 50, 50)
    assert int(got_c) == int(ref_c)
    np.testing.assert_array_equal(np.asarray(got_m), np.asarray(ref_m))


def test_collide_types_one_pass_matches_xla():
    """One-pass kernel (count + meanings OR + mark) == packed XLA path for
    every margin in the fast domain, incl. the doubling OR-shift window."""
    rng = np.random.default_rng(3)
    n = 70_000  # not tile aligned
    # dense-random words (sparse low-bit fixtures never exercise cross-word
    # carries or the low-bit window boundary — that hid a real doubling bug),
    # zeroed per-voxel so the count stays nontrivial too
    def mk(seed):
        r = np.random.default_rng(seed)
        w = r.integers(0, 2**32, (8, n), dtype=np.uint64).astype(np.uint32)
        return jnp.asarray(w * (r.random(n) < 0.3))
    a, b = mk(3), mk(4)
    for margin in (0, 1, 4, 7, 24):
        got_c, got_m, got_a = cp.collide_types_bit_bit(a, b, margin)
        ref_c, ref_m, ref_a = xla_collide.collide_with_types_bit_bit(
            a, b, margin=margin, sv_offset=0
        )
        assert int(got_c) == int(ref_c), margin
        np.testing.assert_array_equal(np.asarray(got_m), np.asarray(ref_m))
        np.testing.assert_array_equal(np.asarray(got_a), np.asarray(ref_a))


def test_collide_types_mark_false_skips_marked_output():
    """mark=False returns count+meanings identical to mark=True with the
    input planes untouched (the whole marked-plane write is skipped)."""
    rng = np.random.default_rng(9)
    n = 20_000
    def mk(seed):
        r = np.random.default_rng(seed)
        w = r.integers(0, 2**32, (8, n), dtype=np.uint64).astype(np.uint32)
        return jnp.asarray(w * (r.random(n) < 0.3))
    a, b = mk(9), mk(10)
    for margin in (0, 3):
        c1, m1, a1 = cp.collide_types_bit_bit(a, b, margin, mark=True)
        c0, m0, a0 = cp.collide_types_bit_bit(a, b, margin, mark=False)
        assert int(c0) == int(c1)
        np.testing.assert_array_equal(np.asarray(m0), np.asarray(m1))
        np.testing.assert_array_equal(np.asarray(a0), np.asarray(a))
        # the public path threads the flag through
        from gpu_voxels_tpu.ops import collide as xc
        c2, m2, a2 = xc.collide_with_types_bit_bit(a, b, margin=margin, mark_collisions=False)
        assert int(c2) == int(c1)
        np.testing.assert_array_equal(np.asarray(a2), np.asarray(a))


def test_gated_types_matches_ungated(monkeypatch):
    """Occupancy-gated tile skipping (scalar-prefetched liveness + block
    remap) must be bit-identical to the ungated kernel — including the
    margin>=4 hazard where a bit-0-only voxel of `a` (occ summary 0, since
    !noneButEmpty excludes eBVM_FREE) collides with a b SV bit shifted down
    into the low nibble."""
    monkeypatch.setattr(cp, "TYPES_TILE_ROWS", 8)  # many small tiles
    rng = np.random.default_rng(11)
    n = 5000

    def occ_of(p):
        x = p[0] & jnp.uint32(0xFFFFFFFE)
        for q in range(1, 8):
            x = x | p[q]
        return (x != 0).astype(jnp.uint8)

    for density in (0.0, 0.002, 0.2):
        a = np.zeros((8, n), np.uint32)
        b = np.zeros((8, n), np.uint32)
        k = max(1, int(n * density))
        ia, ib = rng.choice(n, k, replace=False), rng.choice(n, k, replace=False)
        a[rng.integers(0, 8, k), ia] = np.uint32(1) << rng.integers(0, 32, k).astype(np.uint32)
        b[rng.integers(0, 8, k), ib] = np.uint32(1) << rng.integers(0, 32, k).astype(np.uint32)
        a, b = jnp.asarray(a), jnp.asarray(b)
        a = a.at[0, 5].set(jnp.uint32(1))       # bit-0-only voxel: occ == 0
        b = b.at[0, 5].set(jnp.uint32(1) << 6)  # SV bit 6 at the same index
        oa, ob = occ_of(a), occ_of(b)
        for margin in (0, 4, 8):
            for mark in (True, False):
                cg, mg, ng = cp.collide_types_bit_bit(a, b, margin, mark=mark, occ_a=oa, occ_b=ob)
                cu, mu, nu = cp.collide_types_bit_bit(a, b, margin, mark=mark)
                assert int(cg) == int(cu), (density, margin, mark)
                np.testing.assert_array_equal(np.asarray(mg), np.asarray(mu))
                np.testing.assert_array_equal(np.asarray(ng), np.asarray(nu))
        # margin 8 reaches the hazard voxel: it MUST be counted
        c8, _, _ = cp.collide_types_bit_bit(a, b, 8, mark=False, occ_a=oa, occ_b=ob)
        assert int(c8) >= 1
