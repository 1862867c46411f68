"""GN convergence early-out (ref SolverBundling.cu ENABLE_EARLY_OUT,
EvalGNConvergence < thres): the while_loop variant must match the full
fixed-count fori_loop schedule to within the convergence threshold."""
import numpy as np

from synthetic import cube_orbit_sequence

from bundlesdf_tpu.config import default_track_config
from bundlesdf_tpu.tracker import Bundler, Frame


def _build(cfg, n=3, jitter=0.004):
    seq = cube_orbit_sequence(n_frames=n, H=64, W=80, full_angle=0.3)
    b = Bundler(cfg)
    frames = []
    rng = np.random.default_rng(1)
    for i in range(n):
        pose = seq["cam_in_obs"][i].copy()
        if i > 0:  # perturb so BA has real work to do
            pose[:3, 3] += rng.normal(0, jitter, 3)
        f = Frame(seq["colors"][i], seq["depths"][i], seq["K"], i, f"{i:04d}",
                  cfg, mask=seq["masks"][i], pose_in_model=pose)
        frames.append(f)
        b.frames[i] = f
    b.first_frame = frames[0]
    b.keyframes = frames[:-1]
    b.new_frame = frames[-1]
    # sparse matches from GT geometry: project shared object points
    gt_pts = rng.uniform(-0.04, 0.04, (16, 3))
    for i in range(1, n):
        TA = np.linalg.inv(seq["cam_in_obs"][i])
        TB = np.linalg.inv(seq["cam_in_obs"][i - 1])
        pA = gt_pts @ TA[:3, :3].T + TA[:3, 3]
        pB = gt_pts @ TB[:3, :3].T + TB[:3, 3]
        b.matches[(i, i - 1)] = {
            "uvA": np.full((16, 2), 32), "uvB": np.full((16, 2), 32),
            "pA_cam": pA.astype(np.float32),
            "pB_cam": pB.astype(np.float32),
            "nA_cam": np.zeros((16, 3)), "nB_cam": np.zeros((16, 3)),
            "conf": np.ones(16, np.float32)}
    return b, frames


def _run(early_out):
    cfg = default_track_config()
    cfg["bundle"]["max_BA_frames"] = 4
    cfg["bundle"]["early_out_delta"] = early_out
    cfg["ransac"]["max_trans_neighbor"] = 1.0  # no jump rejection here
    cfg["ransac"]["max_rot_deg_neighbor"] = 180.0
    b, frames = _build(cfg)
    b.optimize(frames)
    return np.stack([f.pose_in_model for f in frames])


def test_early_out_matches_full_schedule():
    poses_full = _run(0.0)        # reference default build: all 7 iters
    poses_eo = _run(1e-4)         # convergence-gated
    # translation agreement well under the convergence threshold scale
    dt = np.abs(poses_full[:, :3, 3] - poses_eo[:, :3, 3]).max()
    dR = np.abs(poses_full[:, :3, :3] - poses_eo[:, :3, :3]).max()
    assert dt < 5e-4, dt
    assert dR < 5e-3, dR
