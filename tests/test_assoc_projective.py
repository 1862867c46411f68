"""Projective refine association (ba.py assoc_refine_mode="projective"):
single-tap data association must (a) agree with the windowed search at
near-aligned poses — the refine regime, where the pose delta is below the
/4-grid pixel quantum — and (b) drive the full BA to the same poses as
the windowed refine schedule on a real perturbed problem."""
import jax.numpy as jnp
import numpy as np

from synthetic import cube_orbit_sequence
from test_ba_early_out import _build

from bundlesdf_tpu.config import default_track_config
from bundlesdf_tpu.tracker.ba import (BAConfig, _dense_associate,
                                      _projective_associate)


def _maps(n=2):
    seq = cube_orbit_sequence(n_frames=n, H=64, W=80, full_angle=0.15)
    xyz, nrm, valid = [], [], []
    for i in range(n):
        d = seq["depths"][i]
        H, W = d.shape
        K = seq["K"]
        us, vs = np.meshgrid(np.arange(W), np.arange(H))
        z = d
        x = (us - K[0, 2]) / K[0, 0] * z
        y = (vs - K[1, 2]) / K[1, 1] * z
        p = np.stack([x, y, z], -1).astype(np.float32)
        # normals from central differences
        dx = np.gradient(p, axis=1)
        dy = np.gradient(p, axis=0)
        nn = np.cross(dy.reshape(-1, 3), dx.reshape(-1, 3)).reshape(p.shape)
        nn /= np.maximum(np.linalg.norm(nn, axis=-1, keepdims=True), 1e-9)
        m = (seq["masks"][i] > 0) & (z > 0.05)
        p[~m] = 0
        nn[~m] = 0
        xyz.append(p)
        nrm.append(nn.astype(np.float32))
        valid.append(m)
    return seq, np.stack(xyz), np.stack(nrm), np.stack(valid)


def test_projective_matches_window_at_aligned_poses():
    seq, xyz, nrm, valid = _maps()
    K = jnp.asarray(seq["K"], jnp.float32)
    poses = jnp.asarray(seq["cam_in_obs"], jnp.float32)  # truth: aligned
    D = 256
    src_idx = np.zeros((2, D), np.int64)
    src_valid = np.zeros((2, D), bool)
    for i in range(2):
        flat = np.flatnonzero(valid[i].reshape(-1))
        take = flat[:: max(len(flat) // D, 1)][:D]
        src_idx[i, : len(take)] = take
        src_valid[i, : len(take)] = True
    pair_ij = jnp.asarray([[0, 1]], jnp.int32)
    cfg = BAConfig(dense_dist_thres=0.02, dense_normal_thres_deg=45)
    a_win = _dense_associate(poses, jnp.asarray(xyz), jnp.asarray(nrm), K,
                             pair_ij, jnp.asarray(src_idx),
                             jnp.asarray(src_valid), cfg,
                             cfg.assoc_radius_refine)
    a_prj = _projective_associate(poses, jnp.asarray(xyz), jnp.asarray(nrm),
                                  K, pair_ij, jnp.asarray(src_idx),
                                  jnp.asarray(src_valid), cfg)
    f_win = np.asarray(a_win["found"][0])
    f_prj = np.asarray(a_prj["found"][0])
    # projective found-set is a subset of the windowed one (the window can
    # only add matches); at aligned poses it must retain the bulk of it
    assert (f_prj & ~f_win).sum() <= 2
    assert f_prj.sum() >= 0.85 * f_win.sum()
    both = f_prj & f_win
    # where both associate, the windowed NN pick is within the projective
    # tap's own dist gate of the projective pick
    d = np.linalg.norm(np.asarray(a_win["tgt_p"][0])[both]
                       - np.asarray(a_prj["tgt_p"][0])[both], axis=-1)
    assert np.median(d) < cfg.dense_dist_thres


def _run_mode_cfg(bundle_overrides):
    cfg = default_track_config()
    cfg["bundle"]["max_BA_frames"] = 4
    cfg["bundle"]["early_out_delta"] = 0.0
    cfg["bundle"].update(bundle_overrides)
    cfg["ransac"]["max_trans_neighbor"] = 1.0
    cfg["ransac"]["max_rot_deg_neighbor"] = 180.0
    b, frames = _build(cfg)
    b.optimize(frames)
    return np.stack([f.pose_in_model for f in frames])


def _run_mode(mode):
    # reassoc_iters >= 2: the refine re-association runs only for GN
    # iterations 1..reassoc_iters-1, so the shipped default (1) never
    # executes assoc_refine_mode at all — force a real refine pass so the
    # two arms actually differ in the program they run
    return _run_mode_cfg({"assoc_refine_mode": mode, "reassoc_iters": 3})


def test_ba_projective_refine_matches_window():
    poses_w = _run_mode("window")
    poses_p = _run_mode("projective")
    dt = np.abs(poses_w[:, :3, 3] - poses_p[:, :3, 3]).max()
    dR = np.abs(poses_w[:, :3, :3] - poses_p[:, :3, :3]).max()
    assert dt < 1e-3, dt
    assert dR < 1e-2, dR
