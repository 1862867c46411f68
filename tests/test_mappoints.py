"""Map-point tracks and cloud denoising."""
import numpy as np

from synthetic import cube_orbit_sequence

from bundlesdf_tpu.config import default_track_config
from bundlesdf_tpu.tracker import Bundler, Frame


def _frames(n=3):
    seq = cube_orbit_sequence(n_frames=n, H=80, W=100, full_angle=0.2)
    cfg = default_track_config()
    frames = []
    for i in range(n):
        f = Frame(seq["colors"][i], seq["depths"][i], seq["K"], i, f"{i:04d}",
                  cfg, mask=seq["masks"][i],
                  pose_in_model=np.linalg.inv(
                      np.linalg.inv(seq["cam_in_obs"][i])))
        frames.append(f)
    return frames, cfg, seq


def test_map_point_propagation():
    frames, cfg, seq = _frames(3)
    b = Bundler(cfg)
    f0, f1, f2 = frames
    # fake inlier matches: (u,v) pixel pairs on the object
    m01 = {"uvA": np.array([[50, 40], [52, 42]]),
           "uvB": np.array([[49, 40], [51, 42]]),
           "pA_cam": np.zeros((2, 3)), "pB_cam": np.zeros((2, 3)),
           "nA_cam": np.zeros((2, 3)), "nB_cam": np.zeros((2, 3)),
           "conf": np.ones(2, np.float32)}
    b.matches[(f1.id, f0.id)] = m01
    b.update_map_points(f1, f0)
    m21 = {"uvA": np.array([[48, 39]]), "uvB": np.array([[50, 40]]),
           "pA_cam": np.zeros((1, 3)), "pB_cam": np.zeros((1, 3)),
           "nA_cam": np.zeros((1, 3)), "nB_cam": np.zeros((1, 3)),
           "conf": np.ones(1, np.float32)}
    b.matches[(f2.id, f1.id)] = m21
    b.update_map_points(f2, f1)

    # track propagates f2 -> f0 through the shared point at f1 (50,40)
    prop = b.propagate_matches(f2, f0)
    assert len(prop) == 1
    np.testing.assert_allclose(prop[0][:4], [48, 39, 49, 40])

    # forgetting f1 removes its observations but keeps the track alive
    from bundlesdf_tpu.tracker import FrameStatus
    f1.status = FrameStatus.FAIL
    b.frames[f1.id] = f1
    b.forget_frame(f1)
    prop = b.propagate_matches(f2, f0)
    assert len(prop) == 1


def test_point_cloud_denoise_drops_floaters():
    frames, cfg, seq = _frames(1)
    f = frames[0]
    # inject a floating depth blob far from the object surface
    depth = seq["depths"][0].copy()
    mask = seq["masks"][0].copy()
    depth[2:5, 2:5] = 0.9
    mask[2:5, 2:5] = 1
    f2 = Frame(seq["colors"][0], depth, seq["K"], 0, "0000", cfg, mask=mask)
    n_before = f2.count_valid_points()
    f2.point_cloud_denoise()
    n_after = f2.count_valid_points()
    assert n_after < n_before            # floaters invalidated
    assert (f2.fg_mask[3, 3] == 0)       # the blob is gone
