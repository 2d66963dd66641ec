"""Swept-volume insertion along trajectories.

Reference: examples/SweptVolumeVsEnvironment.cpp — each trajectory step
inserts the robot's transformed clouds with meaning
eBVM_SWEPT_VOLUME_START + (step % n_sv_ids), encoding time in the 256-bit
axis (SURVEY.md §5: time is the "sequence" dimension, packed into bits).

The TPU formulation vectorizes the whole trajectory: FK for all steps at
once (vmapped), one concatenated scatter per swept-volume id.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import SV_END, SV_START
from ..maps.voxelmap import BitVectorVoxelMap

NUM_SV_IDS = SV_END - SV_START  # 250


def sv_meaning_for_step(step: int, num_ids: int = NUM_SV_IDS - 1) -> int:
    """eBVM_SWEPT_VOLUME_START + (step % n) (SweptVolumeVsEnvironment.cpp)."""
    return SV_START + (int(step) % num_ids)


def insert_swept_volume(
    bitmap: BitVectorVoxelMap,
    robot,
    trajectory: Sequence,
    num_ids: int = NUM_SV_IDS - 1,
) -> BitVectorVoxelMap:
    """Insert robot clouds for every configuration with per-step SV bits.

    `robot` provides transformed_clouds_for(values) (KinematicChain) or
    set_configuration/get_transformed_clouds (any RobotInterface);
    `trajectory` is a sequence of joint-value vectors/maps.
    """
    m = bitmap
    for step, cfg in enumerate(trajectory):
        if hasattr(robot, "transformed_clouds_for") and not isinstance(cfg, dict):
            clouds = robot.transformed_clouds_for(jnp.asarray(cfg, jnp.float32))
        else:
            robot.set_configuration(cfg)
            clouds = robot.get_transformed_clouds()
        m = m.insert_point_cloud(clouds.points, sv_meaning_for_step(step, num_ids))
    return m


def insert_swept_volume_batched(
    bitmap: BitVectorVoxelMap,
    robot,
    trajectory,
    num_ids: int = NUM_SV_IDS - 1,
) -> BitVectorVoxelMap:
    """Whole-trajectory swept-volume insert as ONE fused program.

    FK for all T configurations runs vmapped, and all T*P points scatter in a
    single pass: (voxel, meaning) pairs are deduplicated by sort so the
    one-hot bit values can be scatter-ADDED (sum of distinct powers of two ==
    OR). Equivalent to insert_swept_volume; scales to long trajectories
    without per-step dispatch.

    Requires robot.transformed_clouds_for (pure FK) and an array trajectory
    [T, n_joints].
    """
    from ..ops.insert import voxelize

    traj = jnp.asarray(trajectory, jnp.float32)
    T = traj.shape[0]

    pts = jax.vmap(lambda cfg: robot.transformed_clouds_for(cfg).points)(traj)  # [T,P,3]
    P = pts.shape[1]
    # per-step meanings are a STATIC function of (T, num_ids): compute them in
    # numpy so the set of touched bit planes is known at trace time. A T-step
    # trajectory touches ceil(min(T, num_ids)/32)-ish planes (3 of 8 for 64
    # steps), and only those pay scatter + OR traffic below.
    meanings_np = (SV_START + (np.arange(T, dtype=np.int32) % int(num_ids)))
    touched = sorted({int(m) >> 5 for m in meanings_np})
    slot_of_plane = np.full(8, -1, np.int32)
    for s, p in enumerate(touched):
        slot_of_plane[p] = s
    K = len(touched)
    meaning = jnp.asarray(np.repeat(meanings_np, P))

    idx, _ = voxelize(pts.reshape(-1, 3), bitmap.side_length, bitmap.dims)
    n = bitmap.voxelmap_size

    # dedup (voxel, meaning) pairs: sort by a fused key, keep first of runs
    key = idx.astype(jnp.uint32) * jnp.uint32(256) + meaning.astype(jnp.uint32)
    order = jnp.argsort(key)
    key_s = key[order]
    first = jnp.concatenate([jnp.ones((1,), bool), key_s[1:] != key_s[:-1]])
    idx_s = idx[order]
    meaning_s = meaning[order]
    word = jnp.where(first, jnp.uint32(1) << (meaning_s.astype(jnp.uint32) & 31), 0)
    slot = jnp.asarray(slot_of_plane)[meaning_s >> 5]

    # ONE scatter for all touched planes (dedup makes add == OR): slot-major
    # flat targets, invalid/duplicate rows dropped past the end. One pass of
    # ~len(pairs) scatter updates instead of one full pass per plane.
    tgt = jnp.where(first & (idx_s < n), slot * n + idx_s, K * n)
    delta = (
        jnp.zeros((K * n,), jnp.uint32).at[tgt].add(word, mode="drop").reshape(K, n)
    )

    data = bitmap.data
    out_planes = [
        data[p] if slot_of_plane[p] < 0 else data[p] | delta[slot_of_plane[p]]
        for p in range(data.shape[0])
    ]
    from dataclasses import replace

    occ = bitmap.occ
    if occ is not None:
        # SV meanings are all >= SV_START (4), so any delta marks occupancy
        # for the maintained summary (noneButEmpty masks only bit 0)
        occ_words = delta
        if slot_of_plane[0] >= 0:
            occ_words = occ_words.at[slot_of_plane[0]].set(
                delta[slot_of_plane[0]] & jnp.uint32(0xFFFFFFFE)
            )
        occ = occ | jnp.any(occ_words != 0, axis=0).astype(jnp.uint8)
    return replace(bitmap, data=jnp.stack(out_planes, axis=0), occ=occ)
