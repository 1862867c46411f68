"""Hybrid entry association (ba.py assoc_entry_mode="hybrid"): the wide
windowed entry search runs only on pairs touching the NEW frame (the one
pose with fresh error); old-old pairs — jointly converged by the previous
BA call — get single-tap projective entry association. Must match the
all-window entry schedule on a perturbed problem.

Also covers the reference's dense-pair relative-rotation gate
(icp_pose_rot_thres, SolverBundling.cu:48-55): pairs whose poses differ
by more than the threshold are excluded from the dense term.
"""
import numpy as np
from test_assoc_projective import _run_mode_cfg
from test_ba_early_out import _build

from bundlesdf_tpu.config import default_track_config


def test_ba_hybrid_entry_matches_window():
    poses_w = _run_mode_cfg({"assoc_entry_mode": "window"})
    poses_h = _run_mode_cfg({"assoc_entry_mode": "hybrid"})
    dt = np.abs(poses_w[:, :3, 3] - poses_h[:, :3, 3]).max()
    dR = np.abs(poses_w[:, :3, :3] - poses_h[:, :3, :3]).max()
    assert dt < 1e-3, dt
    assert dR < 1e-2, dR


def _run_rot_thres(deg):
    cfg = default_track_config()
    cfg["bundle"]["max_BA_frames"] = 4
    cfg["bundle"]["icp_pose_rot_thres"] = deg
    cfg["ransac"]["max_trans_neighbor"] = 1.0
    cfg["ransac"]["max_rot_deg_neighbor"] = 180.0
    b, frames = _build(cfg)
    b.optimize(frames)
    return b, np.stack([f.pose_in_model for f in frames])


def test_rot_thres_gates_dense_pairs():
    # full_angle=0.3 rad over 3 frames -> ~8.6 deg between neighbors
    b_open, poses_open = _run_rot_thres(180)
    assert b_open._last_ba_stats["P"] == 3      # all pairs kept
    b_gated, poses_gated = _run_rot_thres(5)    # gates every pair
    assert b_gated._last_ba_stats["P"] == 0
    # sparse term alone still solves the (well-matched) problem
    assert np.all(np.isfinite(poses_gated))
    dt = np.abs(poses_open[:, :3, 3] - poses_gated[:, :3, 3]).max()
    assert dt < 5e-3, dt


def test_rot_thres_partial_gate():
    # 8 deg: neighbors (5.73 deg) kept, the 0-2 pair (11.46 deg) dropped
    b, _ = _run_rot_thres(8)
    assert b._last_ba_stats["P"] == 2
