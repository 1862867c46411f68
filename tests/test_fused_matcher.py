"""Fused find_corres device path (`orb_lift_ransac_slots`,
tracker/pool.py): ORB matching + top-M selection + lifting + 3D gating +
RANSAC as ONE program with ONE host pull. On TPU this replaces the split
match_frames -> match_pairs chain (~4 tunnel RTTs per call); here it is
forced on the CPU backend with a small feature cap and checked for
tracking accuracy against ground truth and for agreement with the split
path's match tables."""
import numpy as np

from synthetic import cube_orbit_sequence

from bundlesdf_tpu.bundlesdf import BundleSdf
from bundlesdf_tpu.config import default_nerf_config, default_track_config
from bundlesdf_tpu.matcher import OrbMatcher

N = 8


def _run(fused, tmp_path):
    seq = cube_orbit_sequence(n_frames=N, H=90, W=120, radius=0.45,
                              obj_size=0.08, full_angle=0.35)
    cfg = default_track_config()
    cfg["SPDLOG"] = 0
    cfg["debug_dir"] = str(tmp_path / ("fused" if fused else "split"))
    cfg["feature_corres"]["fused_matcher"] = fused
    cfg["ransac"]["max_trans_neighbor"] = 0.05
    cfg["ransac"]["max_iter"] = 500
    cfg["bundle"]["max_BA_frames"] = 5
    cfg["bundle"]["depth_association_radius"] = 2
    t = BundleSdf(cfg_track=cfg, cfg_nerf=default_nerf_config(),
                  start_nerf_keyframes=10 ** 9,
                  matcher=OrbMatcher(feat_cap=512))
    frames = [t.run(seq["colors"][i], seq["depths"][i].copy(), seq["K"],
                    seq["id_strs"][i], mask=seq["masks"][i])
              for i in range(N)]
    poses = np.array([f.pose_in_model for f in frames])
    return t, poses, seq


def test_fused_tracks_accurately(tmp_path):
    t, est_cam_in_ob, seq = _run(True, tmp_path)
    gt = seq["cam_in_obs"]
    A = gt[0] @ np.linalg.inv(est_cam_in_ob[0])
    est = np.einsum("ij,njk->nik", A, est_cam_in_ob)
    errs = [np.linalg.norm(est[i][:3, 3] - gt[i][:3, 3]) for i in range(N)]
    assert np.mean(errs) < 0.005, errs
    assert len(t.bundler.keyframes) >= 1
    # match tables populated with every consumed field (the compact pull
    # intentionally omits nA_cam/nB_cam — nothing downstream reads them)
    m = next(v for v in t.bundler.matches.values() if v is not None)
    for k in ("uvA", "uvB", "pA_cam", "pB_cam", "conf"):
        assert k in m and len(m[k]) == len(m["conf"])


def test_fused_agrees_with_split(tmp_path):
    """The two paths use different hamming matchers (MXU-style matmul vs
    cv2 BFMatcher) so match sets differ at ties, but tracked poses must
    agree to well under the RANSAC inlier threshold."""
    _, p_fused, seq = _run(True, tmp_path)
    _, p_split, _ = _run(False, tmp_path)
    for a, b in zip(p_fused, p_split):
        dt = np.linalg.norm(a[:3, 3] - b[:3, 3])
        assert dt < 0.004, (a, b)
