"""Batched-trial RANSAC rigid pose estimation.

Re-design of the reference's per-pair CUDA-stream RANSAC
(`cuda_ransac.cu:1368-1616` + host `FeatureManager.cpp:1587-1713`): one
jitted kernel evaluates all trials of one pair as a vmapped batch; the
bundler vmaps/loops over pairs. Semantics preserved:
  - 3-point samples, trials with repeated indices discarded (:1386)
  - Kabsch/Umeyama model fit per trial
  - inlier = dist <= thres AND normal angle within thres, conf-weighted
    count (:1417-1444)
  - trials whose pose exceeds per-pair max trans/rot caps are zeroed
    (:1482-1505); inputs are model-frame points so the pose is a correction
    around identity
  - best trial by weighted inlier count; its inlier set is returned
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from bundlesdf_tpu.utils.se3 import kabsch


@functools.partial(jax.jit, static_argnames=("n_trials",))
def ransac_pose(key, ptsA, ptsB, normalsA, normalsB, conf, valid,
                dist_thres, cos_normal_angle, max_trans, max_rot,
                n_trials: int = 2000):
    """@ptsA/@ptsB: (M,3) correspondence points in the MODEL frame (already
    transformed by the frames' current poses); padded rows have valid=0.
    Returns dict: best_pose (4,4), inlier_mask (M,), n_inliers (float)."""
    M = ptsA.shape[0]
    count = jnp.maximum(jnp.sum(valid.astype(jnp.int32)), 1)

    # trials x 3 sample indices over the valid prefix-compacted points
    order = jnp.argsort(~valid)  # valid first
    idx3 = jax.random.randint(key, (n_trials, 3), 0, count)
    idx3 = order[idx3]
    distinct = ((idx3[:, 0] != idx3[:, 1]) & (idx3[:, 1] != idx3[:, 2])
                & (idx3[:, 0] != idx3[:, 2]))

    src = ptsA[idx3]  # (T,3,3)
    dst = ptsB[idx3]
    # 20 power iterations suffice for trial scoring (the winning pose is
    # re-estimated exactly from inliers by the host procrustes)
    poses = jax.vmap(functools.partial(kabsch, power_iters=20))(src, dst)

    # inlier eval: (T, M)
    R = poses[:, :3, :3]
    t = poses[:, :3, 3]
    pA_tf = jnp.einsum("tij,mj->tmi", R, ptsA) + t[:, None, :]
    dist = jnp.linalg.norm(pA_tf - ptsB[None], axis=-1)
    nA_tf = jnp.einsum("tij,mj->tmi", R, normalsA)
    ndot = jnp.sum(nA_tf * normalsB[None], axis=-1)
    inlier = (dist <= dist_thres) & (ndot >= cos_normal_angle) & valid[None]
    score = jnp.sum(inlier * conf[None], axis=-1)  # (T,)

    # pose-magnitude caps vs identity (correction should be small)
    trans_mag = jnp.linalg.norm(t, axis=-1)
    cos_r = jnp.clip((jnp.trace(R, axis1=-2, axis2=-1) - 1) / 2, -1, 1)
    rot_mag = jnp.arccos(cos_r)
    ok = distinct & (trans_mag <= max_trans) & (rot_mag <= max_rot)
    score = jnp.where(ok, score, 0.0)

    best = jnp.argmax(score)
    return {
        "best_pose": poses[best],
        "inlier_mask": inlier[best] & (score[best] > 0),
        "n_inliers": score[best],
    }
