"""BA window subset-selection strategies (ref selectKeyFramesForBA
Bundler.cpp:430-609) and Procrustes residual/degeneracy guards
(ref FeatureManager.cpp:1050-1129)."""
import numpy as np
import pytest

from synthetic import cube_orbit_sequence

from bundlesdf_tpu.config import default_track_config
from bundlesdf_tpu.tracker import Bundler, Frame

ALL_METHODS = ["normal_orientation_nearest", "nearest_rotations",
               "greedy_rot", "normal_orientation_greedy",
               "greedy_covisible_points", "max_edge", "near_enough_rot"]


def _fake_match(n=6, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-0.05, 0.05, (n, 3))
    return {"uvA": rng.integers(20, 60, (n, 2)),
            "uvB": rng.integers(20, 60, (n, 2)),
            "pA_cam": pts, "pB_cam": pts + rng.normal(0, 1e-5, (n, 3)),
            "nA_cam": np.zeros((n, 3)), "nB_cam": np.zeros((n, 3)),
            "conf": np.ones(n, np.float32)}


@pytest.fixture(scope="module")
def bundler_with_keyframes():
    n = 7
    seq = cube_orbit_sequence(n_frames=n, H=64, W=80, full_angle=0.5)
    cfg = default_track_config()
    cfg["bundle"]["max_BA_frames"] = 4
    b = Bundler(cfg)
    frames = []
    for i in range(n):
        f = Frame(seq["colors"][i], seq["depths"][i], seq["K"], i, f"{i:04d}",
                  cfg, mask=seq["masks"][i],
                  pose_in_model=seq["cam_in_obs"][i])
        frames.append(f)
        b.frames[i] = f
    b.first_frame = frames[0]
    b.keyframes = frames[:-1]
    b.new_frame = frames[-1]
    # match edges between temporal neighbors and stride-2 pairs
    # (for max_edge / map points: a 4-node path 0-2-4-6 must exist)
    for i in range(1, n):
        b.matches[(i, i - 1)] = _fake_match(seed=i)
        b.update_map_points(frames[i], frames[i - 1])
        if i >= 2:
            b.matches[(i, i - 2)] = _fake_match(seed=100 + i)
    return b, frames


@pytest.mark.parametrize("method", ALL_METHODS)
def test_selection_strategies(bundler_with_keyframes, method):
    b, frames = bundler_with_keyframes
    b.cfg["bundle"]["subset_selection_method"] = method
    b.select_keyframes_for_ba()
    sel = b.local_frames
    max_ba = b.cfg["bundle"]["max_BA_frames"]
    assert b.new_frame in sel
    assert len(sel) <= max_ba and len(sel) >= 2
    assert [f.id for f in sel] == sorted(f.id for f in sel)
    if method not in ("near_enough_rot",):  # may return a shorter chain
        assert len(sel) == max_ba


def test_unknown_method_raises(bundler_with_keyframes):
    b, _ = bundler_with_keyframes
    b.cfg["bundle"]["subset_selection_method"] = "nope"
    with pytest.raises(ValueError):
        b.select_keyframes_for_ba()
    b.cfg["bundle"]["subset_selection_method"] = "normal_orientation_nearest"


def test_procrustes_degenerate_collinear(bundler_with_keyframes):
    """Collinear inliers must not emit a garbage pose."""
    b, frames = bundler_with_keyframes
    fA, fB = frames[1], frames[0]
    t = np.linspace(0, 1, 8)[:, None]
    line = t * np.array([[0.1, 0.0, 0.0]])
    b.matches[(fA.id, fB.id)] = {
        "uvA": np.zeros((8, 2), int), "uvB": np.zeros((8, 2), int),
        "pA_cam": line, "pB_cam": line + 0.01,
        "nA_cam": np.zeros((8, 3)), "nB_cam": np.zeros((8, 3)),
        "conf": np.ones(8, np.float32)}
    T = b.procrustes(fA, fB)
    np.testing.assert_allclose(T, np.eye(4))


def test_procrustes_residual_guard(bundler_with_keyframes):
    """Neighbor pair with inconsistent (non-rigid) correspondences is
    rejected (intended FeatureManager.cpp:1099 semantics)."""
    b, frames = bundler_with_keyframes
    fA, fB = frames[1], frames[0]
    rng = np.random.default_rng(3)
    src = rng.uniform(-0.1, 0.1, (32, 3))
    dst = rng.uniform(-0.1, 0.1, (32, 3))  # unrelated -> huge residual
    b.matches[(fA.id, fB.id)] = {
        "uvA": np.zeros((32, 2), int), "uvB": np.zeros((32, 2), int),
        "pA_cam": src, "pB_cam": dst,
        "nA_cam": np.zeros((32, 3)), "nB_cam": np.zeros((32, 3)),
        "conf": np.ones(32, np.float32)}
    T = b.procrustes(fA, fB)
    np.testing.assert_allclose(T, np.eye(4))


def test_procrustes_good_pair_still_solves(bundler_with_keyframes):
    """A clean rigid correspondence set still yields the right transform."""
    from bundlesdf_tpu.utils.se3 import so3_exp
    import jax.numpy as jnp

    b, frames = bundler_with_keyframes
    fA, fB = frames[1], frames[0]
    rng = np.random.default_rng(5)
    src_cam = rng.uniform(-0.1, 0.1, (64, 3))
    R = np.asarray(so3_exp(jnp.asarray([0.02, -0.01, 0.03])))
    t = np.array([0.004, -0.002, 0.001])
    # pB chosen so that world(pA) -> world(pB) is the rigid (R, t)
    TA, TB = fA.pose_in_model, fB.pose_in_model
    srcw = src_cam @ TA[:3, :3].T + TA[:3, 3]
    dstw = srcw @ R.T + t
    pB_cam = (dstw - TB[:3, 3]) @ np.linalg.inv(TB[:3, :3]).T
    b.matches[(fA.id, fB.id)] = {
        "uvA": np.zeros((64, 2), int), "uvB": np.zeros((64, 2), int),
        "pA_cam": src_cam, "pB_cam": pB_cam,
        "nA_cam": np.zeros((64, 3)), "nB_cam": np.zeros((64, 3)),
        "conf": np.ones(64, np.float32)}
    T = b.procrustes(fA, fB)
    np.testing.assert_allclose(T[:3, :3], R, atol=1e-4)
    np.testing.assert_allclose(T[:3, 3], t, atol=1e-4)
