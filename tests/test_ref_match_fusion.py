"""Ref-match fusion: device procrustes + window-selection covisibility
riding the ref-match dispatch (tracker/pool.py _procrustes_and_covis).
With a small BA window the selection needs covisibility every frame; the
fused path must (a) track as accurately as the split path, (b) seed the
selection so no separate covisibility dispatch happens on the steady
path, and (c) apply a device procrustes offset equivalent to the host
SVD one."""
import numpy as np
import pytest

from synthetic import cube_orbit_sequence

from bundlesdf_tpu.bundlesdf import BundleSdf
from bundlesdf_tpu.config import default_nerf_config, default_track_config
from bundlesdf_tpu.matcher import OrbMatcher

N = 10


def _run(fused, tmp_path, spy=None):
    seq = cube_orbit_sequence(n_frames=N, H=90, W=120, radius=0.45,
                              obj_size=0.08, full_angle=0.5)
    cfg = default_track_config()
    cfg["SPDLOG"] = 1  # ob_in_cam artifacts are the checked output
    cfg["debug_dir"] = str(tmp_path / ("fused" if fused else "split"))
    cfg["feature_corres"]["fused_matcher"] = fused
    cfg["ransac"]["max_trans_neighbor"] = 0.05
    cfg["ransac"]["max_iter"] = 500
    cfg["keyframe"]["min_rot"] = 2  # admit keyframes fast
    cfg["bundle"]["max_BA_frames"] = 3  # selection covis needed every frame
    cfg["bundle"]["depth_association_radius"] = 2
    t = BundleSdf(cfg_track=cfg, cfg_nerf=default_nerf_config(),
                  start_nerf_keyframes=10 ** 9,
                  matcher=OrbMatcher(feat_cap=512))
    if spy is not None:
        orig = t.bundler.covisibility_pairs

        def counted(pairs):
            spy.append(len(pairs))
            return orig(pairs)

        t.bundler.covisibility_pairs = counted
    for i in range(N):
        t.run(seq["colors"][i], seq["depths"][i].copy(), seq["K"],
              seq["id_strs"][i], mask=seq["masks"][i])
    t.flush_pipeline()
    est = np.array([np.linalg.inv(np.loadtxt(
        tmp_path / ("fused" if fused else "split") / "ob_in_cam"
        / f"{i:04d}.txt")) for i in range(N)])
    return t, est, seq


def test_sel_fusion_accuracy_and_no_covis_dispatch(tmp_path):
    calls = []
    t, est, seq = _run(True, tmp_path, spy=calls)
    gt = seq["cam_in_obs"]
    A = gt[0] @ np.linalg.inv(est[0])
    est_al = np.einsum("ij,njk->nik", A, est)
    errs = [np.linalg.norm(est_al[i][:3, 3] - gt[i][:3, 3])
            for i in range(N)]
    assert np.mean(errs) < 0.005, errs
    # keyframes outgrew the window so selection ran with covis — all of it
    # seeded from the fused ref-match dispatch (no separate dispatch)
    assert len(t.bundler.keyframes) > 3
    assert calls == [], f"covisibility dispatched separately: {calls}"


def test_sel_fusion_matches_split_path(tmp_path):
    _, est_f, seq = _run(True, tmp_path)
    _, est_s, _ = _run(False, tmp_path)
    for a, b in zip(est_f, est_s):
        dt = np.linalg.norm(a[:3, 3] - b[:3, 3])
        assert dt < 0.004, dt


def test_device_procrustes_guards(tmp_path):
    """A frame whose ref match collapses (mask shrunk to a sliver) must
    not get a garbage device offset — the FAIL/re-localization cascade
    still catches it, as with the host procrustes."""
    seq = cube_orbit_sequence(n_frames=4, H=90, W=120, radius=0.45,
                              obj_size=0.08, full_angle=0.2)
    cfg = default_track_config()
    cfg["SPDLOG"] = 0
    cfg["debug_dir"] = str(tmp_path)
    cfg["feature_corres"]["fused_matcher"] = True
    cfg["bundle"]["max_BA_frames"] = 3
    cfg["keyframe"]["min_rot"] = 2
    cfg["bundle"]["depth_association_radius"] = 2
    t = BundleSdf(cfg_track=cfg, cfg_nerf=default_nerf_config(),
                  start_nerf_keyframes=10 ** 9,
                  matcher=OrbMatcher(feat_cap=512))
    from bundlesdf_tpu.tracker import FrameStatus
    statuses = []
    for i in range(4):
        mask = seq["masks"][i].copy()
        if i == 2:  # keep a sliver: too few features for a valid match
            ys, xs = np.nonzero(mask)
            keep = ys < (ys.min() + 3)
            mask[:] = 0
            mask[ys[keep], xs[keep]] = 1
        f = t.run(seq["colors"][i], seq["depths"][i].copy(), seq["K"],
                  seq["id_strs"][i], mask=mask)
        statuses.append(f.status)
    t.flush_pipeline()
    assert statuses[2] == FrameStatus.FAIL
