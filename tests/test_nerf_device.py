"""Two-device tracker||NOF placement (SURVEY §2.3 "tracker and NOF can
share a chip or use 2 devices"): cfg_nerf['nerf_device'] commits all NOF
state + training dispatches to a second device so tracking and NOF
genuinely overlap. Run on the conftest 8-virtual-CPU-device mesh."""
import jax
import numpy as np
import pytest

from synthetic import cube_orbit_sequence

from bundlesdf_tpu.bundlesdf import BundleSdf
from bundlesdf_tpu.config import default_nerf_config, default_track_config
from bundlesdf_tpu.nof.runner import NofRunner, preprocess_frame_data
from bundlesdf_tpu.utils.common import GLCAM_IN_CVCAM


def _tiny_runner(nerf_device=-1, n_frames=3, seed=0):
    seq = cube_orbit_sequence(n_frames=n_frames, H=48, W=64, radius=0.45,
                              obj_size=0.08)
    translation = np.zeros(3)
    sc = 0.9 / 0.6
    cfg = default_nerf_config()
    cfg.update(dict(
        sc_factor=sc, translation=translation.tolist(), n_step=6, N_rand=64,
        N_samples=8, N_samples_around_depth=8, num_levels=2, finest_res=32,
        base_res=8, log2_hashmap_size=12, n_trace_steps=32,
        nerf_device=nerf_device,
        octree_smallest_voxel_size=2.0 / 32 / sc,
        octree_dilate_size=2.0 / 32 / sc))
    poses_gl = seq["cam_in_obs"] @ GLCAM_IN_CVCAM
    rgbs, depths, masks, normals, poses = preprocess_frame_data(
        seq["colors"].copy(), seq["depths"].copy(), seq["masks"].copy(),
        None, poses_gl.copy(), sc, translation)
    return NofRunner(cfg, rgbs, depths, masks, normals, poses, seq["K"],
                     seed=seed)


def _device_of(tree):
    devs = {d for leaf in jax.tree.leaves(tree) for d in leaf.devices()}
    assert len(devs) == 1, f"state spread over {devs}"
    return next(iter(devs))


def test_nerf_device_placement_and_math_equivalence():
    """Placement must not change the training math: same seed on device 0
    vs device 1 produces identical params; the device-1 runner's state
    (params, opt, rays) is committed to jax.devices()[1]."""
    devs = jax.devices()
    assert len(devs) >= 2
    r0 = _tiny_runner(nerf_device=-1)
    r1 = _tiny_runner(nerf_device=1)
    assert _device_of(r1.params) == devs[1]
    assert _device_of(r1.rays) == devs[1]
    assert _device_of(r0.params) == devs[0]
    r0.train(n_steps=6)
    r1.train(n_steps=6)
    assert _device_of(r1.params) == devs[1]  # donation kept placement
    for a, b in zip(jax.tree.leaves(r0.params), jax.tree.leaves(r1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_nerf_device_survives_continual_handoff():
    """add_new_frames rebuilds the ray store and params — the rebuilt
    state must be re-committed to the nerf device."""
    devs = jax.devices()
    r = _tiny_runner(nerf_device=2)
    r.train(n_steps=3)
    seq = cube_orbit_sequence(n_frames=5, H=48, W=64, radius=0.45,
                              obj_size=0.08)
    sc = 0.9 / 0.6
    poses_gl = seq["cam_in_obs"] @ GLCAM_IN_CVCAM
    rgbs, depths, masks, normals, poses = preprocess_frame_data(
        seq["colors"].copy(), seq["depths"].copy(), seq["masks"].copy(),
        None, poses_gl.copy(), sc, np.zeros(3))
    r.add_new_frames(rgbs[3:], depths[3:], masks[3:], None, poses,
                     reuse_weights=False)
    assert _device_of(r.params) == devs[2]
    assert _device_of(r.rays) == devs[2]
    r.train(n_steps=3)
    assert _device_of(r.params) == devs[2]


def test_pipeline_nerf_device_split(tmp_path):
    """End-to-end: online pipeline with NOF pinned to device 1 — tracker
    pool arrays stay on device 0, NOF state lives on device 1, poses
    still sync back (nerfed keyframes) and stall anatomy is recorded."""
    devs = jax.devices()
    seq = cube_orbit_sequence(n_frames=8, H=90, W=120, radius=0.45,
                              obj_size=0.08)
    cfg_t = default_track_config()
    cfg_t["debug_dir"] = str(tmp_path / "dbg")
    cfg_t["SPDLOG"] = 0
    cfg_t["ransac"]["max_trans_neighbor"] = 0.05
    cfg_t["ransac"]["max_iter"] = 500
    cfg_t["bundle"]["max_BA_frames"] = 5
    cfg_t["bundle"]["depth_association_radius"] = 2
    cfg_n = default_nerf_config()
    cfg_n.update(dict(
        n_step=20, N_rand=128, N_samples=8, N_samples_around_depth=8,
        num_levels=2, finest_res=32, base_res=8, log2_hashmap_size=12,
        n_trace_steps=32, sync_max_delay=4, nerf_device=1))
    b = BundleSdf(cfg_track=cfg_t, cfg_nerf=cfg_n, start_nerf_keyframes=2)
    for i in range(8):
        b.run(seq["colors"][i], seq["depths"][i], seq["K"], f"{i:04d}",
              mask=seq["masks"][i])
    b.on_finish()
    assert b.nerf is not None
    assert _device_of(b.nerf.params) == devs[1]
    assert _device_of(b.nerf.rays) == devs[1]
    pool_dev = _device_of(b.bundler.pool.xyzs)
    assert pool_dev == devs[0]
    assert any(kf.nerfed for kf in b.bundler.keyframes)
    assert b.pipeline_stats["n_batches"] >= 1
    assert b.pipeline_stats["nerf_sync_s"] >= 0.0


def test_nerf_device_out_of_range_falls_back():
    r = _tiny_runner(nerf_device=64)
    assert r.device is None
    r.train(n_steps=2)  # still trains on the default device
