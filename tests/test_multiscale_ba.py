"""Coarse-to-fine BA scale loop (ref LossGPU.cpp:79-131): a 2-scale
config runs the BA once per scale, with the sparse feature-match term
active only at the first scale."""
import numpy as np

from synthetic import cube_orbit_sequence

from bundlesdf_tpu.config import default_track_config
from bundlesdf_tpu.tracker import Bundler, Frame
from bundlesdf_tpu.tracker import bundler as bundler_mod


def _build(cfg, n=3):
    seq = cube_orbit_sequence(n_frames=n, H=64, W=80, full_angle=0.3)
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
    rng = np.random.default_rng(0)
    pts = rng.uniform(-0.05, 0.05, (8, 3))
    for i in range(1, n):
        b.matches[(i, i - 1)] = {
            "uvA": rng.integers(20, 60, (8, 2)),
            "uvB": rng.integers(20, 60, (8, 2)),
            "pA_cam": pts, "pB_cam": pts + rng.normal(0, 1e-5, (8, 3)),
            "nA_cam": np.zeros((8, 3)), "nB_cam": np.zeros((8, 3)),
            "conf": np.ones(8, np.float32)}
    return b, frames


def test_two_scale_loop_sparse_only_first(monkeypatch):
    cfg = default_track_config()
    cfg["bundle"]["max_BA_frames"] = 4
    cfg["bundle"]["image_downscale"] = [4, 2]
    b, frames = _build(cfg)

    calls = []
    real_ba = bundler_mod.bundle_adjust_pooled

    def spy_ba(pool_xyzs, pool_nrms, *args, **kw):
        cfg_ba = args[-1]
        factor = args[-2]
        calls.append({"scale": cfg_ba.image_downscale,
                      "w_sparse": cfg_ba.w_sparse,
                      "w_dense": cfg_ba.w_dense,
                      "h": pool_xyzs.shape[1] // factor})
        return real_ba(pool_xyzs, pool_nrms, *args, **kw)

    monkeypatch.setattr(bundler_mod, "bundle_adjust_pooled", spy_ba)
    b.optimize(frames)

    assert [c["scale"] for c in calls] == [4, 2]
    assert calls[0]["w_sparse"] > 0
    assert calls[1]["w_sparse"] == 0.0       # dense-only after scale 0
    assert calls[1]["w_dense"] > 0
    # the second scale really runs on the finer grid
    assert calls[1]["h"] == 2 * calls[0]["h"]
    # poses stay finite and frame 0 stays pinned
    assert np.isfinite(frames[-1].pose_in_model).all()
    np.testing.assert_allclose(frames[0].pose_in_model,
                               b.frames[0].pose_in_model)


def test_single_scale_scalar_config_unchanged(monkeypatch):
    cfg = default_track_config()
    cfg["bundle"]["max_BA_frames"] = 4
    cfg["bundle"]["image_downscale"] = 4  # scalar form
    b, frames = _build(cfg)
    calls = []
    real_ba = bundler_mod.bundle_adjust_pooled

    def spy_ba(*args, **kw):
        calls.append(args[-1].image_downscale)
        return real_ba(*args, **kw)

    monkeypatch.setattr(bundler_mod, "bundle_adjust_pooled", spy_ba)
    b.optimize(frames)
    assert calls == [4]
