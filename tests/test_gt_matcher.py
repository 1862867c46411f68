"""GT-oracle debug matcher (ref FeatureManager.cpp:990-1039
findCorresbyGroundtruth): correspondences from ground-truth 3D proximity
instead of descriptors, plugged into the pipeline's pluggable-matcher
slot. Checks (a) the oracle contract — every returned match's
GT-transformed 3D points coincide within the 2 mm gate — and (b) that an
oracle-driven end-to-end run tracks the synthetic orbit accurately."""
import numpy as np

from synthetic import cube_orbit_sequence

from bundlesdf_tpu.bundlesdf import BundleSdf
from bundlesdf_tpu.config import default_nerf_config, default_track_config
from bundlesdf_tpu.matcher import GtMatcher

N = 6


def _setup(tmp_path):
    seq = cube_orbit_sequence(n_frames=N, H=90, W=120, radius=0.45,
                              obj_size=0.08, full_angle=0.3)
    gt_poses = {seq["id_strs"][i]: seq["cam_in_obs"][i] for i in range(N)}
    cfg = default_track_config()
    cfg["SPDLOG"] = 0
    cfg["debug_dir"] = str(tmp_path / "gt")
    cfg["feature_corres"]["fused_matcher"] = False
    cfg["ransac"]["max_trans_neighbor"] = 0.05
    cfg["bundle"]["max_BA_frames"] = 5
    t = BundleSdf(cfg_track=cfg, cfg_nerf=default_nerf_config(),
                  start_nerf_keyframes=10 ** 9,
                  matcher=GtMatcher(gt_poses))
    return t, seq, gt_poses


def test_gt_matches_respect_oracle_gate(tmp_path):
    t, seq, gt_poses = _setup(tmp_path)
    fA = t.make_frame(seq["colors"][0], seq["depths"][0].copy(), seq["K"],
                      seq["id_strs"][0], mask=seq["masks"][0])
    fB = t.make_frame(seq["colors"][2], seq["depths"][2].copy(), seq["K"],
                      seq["id_strs"][2], mask=seq["masks"][2])
    (rows,) = t.matcher.match_frames([(fA, fB)])
    assert len(rows) > 30, f"oracle found only {len(rows)} matches"
    # re-derive the GT-3D distance of each match independently
    for f, cols in ((fA, (0, 1)), (fB, (2, 3))):
        xyz = np.asarray(f.xyz_map)
        ij = np.round(rows[:, cols]).astype(int)
        gt = np.asarray(gt_poses[f.id_str])
        p = xyz[np.clip(ij[:, 1], 0, xyz.shape[0] - 1),
                np.clip(ij[:, 0], 0, xyz.shape[1] - 1)]
        pm = p @ gt[:3, :3].T + gt[:3, 3]
        if cols == (0, 1):
            pmA = pm
        else:
            d = np.linalg.norm(pmA - pm, axis=1)
            assert (d <= 0.002 + 1e-9).all(), d.max()


def test_gt_oracle_tracks_accurately(tmp_path):
    t, seq, _ = _setup(tmp_path)
    frames = [t.run(seq["colors"][i], seq["depths"][i].copy(), seq["K"],
                    seq["id_strs"][i], mask=seq["masks"][i])
              for i in range(N)]
    est = np.array([f.pose_in_model for f in frames])
    gt = seq["cam_in_obs"]
    A = gt[0] @ np.linalg.inv(est[0])
    est = np.einsum("ij,njk->nik", A, est)
    errs = [np.linalg.norm(est[i][:3, 3] - gt[i][:3, 3]) for i in range(N)]
    assert np.mean(errs) < 0.005, errs
