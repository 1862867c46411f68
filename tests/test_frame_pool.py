"""Device-resident frame pool: fused preprocess+write+count parity with
the standalone path, slot lifecycle, capacity growth, and the fused
lift+RANSAC kernel vs its unfused equivalents."""
import jax.numpy as jnp
import numpy as np

from synthetic import cube_orbit_sequence

from bundlesdf_tpu.config import default_track_config
from bundlesdf_tpu.tracker import Bundler, Frame
from bundlesdf_tpu.tracker.pool import FramePool


def _seq(n=3, H=64, W=80):
    return cube_orbit_sequence(n_frames=n, H=H, W=W, full_angle=0.3)


def test_pooled_frame_matches_standalone():
    seq = _seq()
    cfg = default_track_config()
    pool = FramePool(64, 80, cap=4)
    fp = Frame(seq["colors"][0], seq["depths"][0], seq["K"], 0, "0000", cfg,
               mask=seq["masks"][0], pool=pool)
    fs = Frame(seq["colors"][0], seq["depths"][0], seq["K"], 1, "0001", cfg,
               mask=seq["masks"][0])
    assert fp.pooled and not fs.pooled
    np.testing.assert_allclose(fp.depth, fs.depth, atol=1e-6)
    np.testing.assert_allclose(fp.xyz_map, fs.xyz_map, atol=1e-6)
    np.testing.assert_allclose(fp.normal_map, fs.normal_map, atol=1e-6)
    assert fp.count_valid_points() == fs.count_valid_points()


def test_pool_growth_and_release():
    seq = _seq()
    cfg = default_track_config()
    pool = FramePool(64, 80, cap=2)
    frames = [Frame(seq["colors"][i % 3], seq["depths"][i % 3], seq["K"], i,
                    f"{i:04d}", cfg, mask=seq["masks"][i % 3], pool=pool)
              for i in range(5)]  # forces growth 2 -> 4 -> 8
    assert pool.cap == 8
    assert len(pool.slot_of) == 5
    d0 = frames[0].depth.copy()
    pool.release(3)
    assert 3 not in pool.slot_of
    # released slot reuse must not disturb other frames
    Frame(seq["colors"][1], seq["depths"][1], seq["K"], 9, "0009", cfg,
          mask=seq["masks"][1], pool=pool)
    frames[0]._depth_host = None
    np.testing.assert_allclose(frames[0].depth, d0, atol=0)


def test_covisibility_pairs_matches_single():
    seq = _seq()
    cfg = default_track_config()
    b = Bundler(cfg)
    frames = []
    for i in range(3):
        f = Frame(seq["colors"][i], seq["depths"][i], seq["K"], i,
                  f"{i:04d}", cfg, mask=seq["masks"][i],
                  pose_in_model=seq["cam_in_obs"][i])
        frames.append(f)
    pairs = [(frames[0], frames[1]), (frames[2], frames[0]),
             (frames[1], frames[2])]
    batched = b.covisibility_pairs(pairs)
    singles = [b.covisibility(fA, fB) for fA, fB in pairs]
    np.testing.assert_allclose(batched, singles, rtol=1e-5)
    assert (batched > 0.3).all()  # small orbit: frames see each other


def test_match_pairs_fused_inliers():
    """The fused lift+RANSAC keeps planted-good matches and rejects a
    corrupted pair below min_match_after_ransac."""
    seq = _seq()
    cfg = default_track_config()
    cfg["ransac"]["max_trans_neighbor"] = 0.05
    b = Bundler(cfg)
    frames = []
    for i in range(3):
        f = Frame(seq["colors"][i], seq["depths"][i], seq["K"], i,
                  f"{i:04d}", cfg, mask=seq["masks"][i],
                  pose_in_model=seq["cam_in_obs"][i])
        frames.append(f)
        b.frames[i] = f
    b.new_frame = frames[-1]

    # genuine matches by reprojecting frame B's object pixels into frame A
    def plant(fA, fB, n=80):
        vs, us = np.nonzero((fB.depth > 0.1) & (fB.fg_mask > 0))
        sel = np.linspace(0, len(vs) - 1, n).astype(int)
        us, vs = us[sel], vs[sel]
        p_cam_b = fB.xyz_map[vs, us]
        TB, TA = fB.pose_in_model, fA.pose_in_model
        p_w = p_cam_b @ TB[:3, :3].T + TB[:3, 3]
        p_a = (p_w - TA[:3, 3]) @ TA[:3, :3]
        K = fA.K
        uA = p_a[:, 0] / p_a[:, 2] * K[0, 0] + K[0, 2]
        vA = p_a[:, 1] / p_a[:, 2] * K[1, 1] + K[1, 2]
        return np.stack([uA, vA, us, vs, np.ones(n)], -1).astype(np.float32)

    good = plant(frames[2], frames[1])
    bad = plant(frames[1], frames[0])
    bad[:, :2] += np.random.default_rng(0).uniform(-30, 30,
                                                   (len(bad), 2))  # corrupt
    frames[2].ref_frame_id = 1
    b.match_pairs([(frames[2], frames[1]), (frames[1], frames[0])],
                  [good, bad], viz=False)
    m = b.matches[(2, 1)]
    assert m is not None and len(m["conf"]) >= 40
    assert b.matches.get((1, 0)) is None  # corrupted pair cleared
    # lifted camera points agree with the host maps
    uv = m["uvB"]
    np.testing.assert_allclose(m["pB_cam"],
                               frames[1].xyz_map[uv[:, 1], uv[:, 0]],
                               atol=1e-5)
