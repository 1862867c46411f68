"""Online pipeline integration: track a synthetic orbit, evaluate pose
accuracy with the benchmark harness, exercise the FAIL cascade."""
import numpy as np
import pytest

from synthetic import cube_orbit_sequence

from bundlesdf_tpu.bundlesdf import BundleSdf
from bundlesdf_tpu.config import default_nerf_config, default_track_config
from bundlesdf_tpu.eval import benchmark_video


def _small_cfg(tmp, max_ba=5):
    cfg_t = default_track_config()
    cfg_t["debug_dir"] = str(tmp)
    cfg_t["ransac"]["max_trans_neighbor"] = 0.05
    cfg_t["ransac"]["max_iter"] = 500
    cfg_t["bundle"]["max_BA_frames"] = max_ba
    cfg_t["bundle"]["depth_association_radius"] = 2
    return cfg_t


@pytest.fixture(scope="module")
def tracked(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("run")
    seq = cube_orbit_sequence(n_frames=8, H=90, W=120, radius=0.45,
                              obj_size=0.08, full_angle=0.35)
    tracker = BundleSdf(cfg_track=_small_cfg(tmp),
                        cfg_nerf=default_nerf_config(),
                        start_nerf_keyframes=99)
    for i in range(8):
        tracker.run(seq["colors"][i], seq["depths"][i].copy(), seq["K"],
                    seq["id_strs"][i], mask=seq["masks"][i])
    tracker.flush_pipeline()  # last frame's BA/artifacts are deferred
    return tracker, seq, tmp


def test_pose_accuracy(tracked):
    tracker, seq, tmp = tracked
    gt = seq["cam_in_obs"]
    est = np.array([np.linalg.inv(np.loadtxt(
        tmp / "ob_in_cam" / f"{i:04d}.txt")) for i in range(8)])
    A = gt[0] @ np.linalg.inv(est[0])
    est = np.einsum("ij,njk->nik", A, est)
    errs = [np.linalg.norm(est[i][:3, 3] - gt[i][:3, 3]) for i in range(8)]
    assert np.mean(errs) < 0.005  # <5mm mean on easy synthetic

def test_benchmark_harness(tracked):
    tracker, seq, tmp = tracked
    # GT model points: cube cluster corners sampled from frame-0 depth
    from bundlesdf_tpu.utils.common import depth2xyzmap
    xyz = depth2xyzmap(seq["depths"][0], seq["K"])
    pts_cam = xyz[seq["masks"][0] > 0]
    # to object frame via GT
    T = seq["cam_in_obs"][0]
    model_pts = pts_cam[::7] @ T[:3, :3].T + T[:3, 3]
    gt_ob_in_cam = np.array([np.linalg.inv(seq["cam_in_obs"][i])
                             for i in range(8)])
    out = benchmark_video(str(tmp), gt_ob_in_cam, model_pts)
    assert out["ADDS_AUC(%)"] > 90
    assert out["ADD_AUC(%)"] > 90


def test_keyframes_and_outputs(tracked):
    tracker, seq, tmp = tracked
    assert len(tracker.bundler.keyframes) >= 1
    assert (tmp / "cam_K.txt").exists()
    assert (tmp / "color" / "0003.png").exists()
    assert (tmp / "mask" / "0003.png").exists()
    assert (tmp / "0007" / "keyframes.yml").exists()


def test_fail_cascade_and_recovery(tmp_path):
    seq = cube_orbit_sequence(n_frames=5, H=90, W=120, radius=0.45,
                              obj_size=0.08, full_angle=0.2)
    tracker = BundleSdf(cfg_track=_small_cfg(tmp_path),
                        cfg_nerf=default_nerf_config(),
                        start_nerf_keyframes=99)
    from bundlesdf_tpu.tracker import FrameStatus
    statuses = []
    for i in range(5):
        mask = seq["masks"][i].copy()
        if i == 2:
            mask[:] = 0
        f = tracker.run(seq["colors"][i], seq["depths"][i].copy(), seq["K"],
                        seq["id_strs"][i], mask=mask)
        statuses.append(f.status)
    assert statuses[2] == FrameStatus.FAIL
    assert statuses[3] == FrameStatus.OTHER  # recovered
    assert statuses[4] == FrameStatus.OTHER
