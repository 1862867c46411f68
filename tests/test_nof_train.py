"""End-to-end NOF training on the synthetic cube orbit: losses fall, the
reconstructed mesh has the right extent, pose export is anchored."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from synthetic import cube_orbit_sequence

from bundlesdf_tpu.config import default_nerf_config
from bundlesdf_tpu.nof.render import render_rays
from bundlesdf_tpu.nof.runner import NofRunner, preprocess_frame_data
from bundlesdf_tpu.utils.common import GLCAM_IN_CVCAM


@pytest.fixture(scope="module")
def trained_runner():
    seq = cube_orbit_sequence(n_frames=5, H=56, W=72, radius=0.45,
                              obj_size=0.08)
    translation = np.zeros(3)
    sc_factor = 0.9 / 0.6
    cfg = default_nerf_config()
    cfg.update(dict(
        sc_factor=sc_factor, translation=translation.tolist(), n_step=160,
        N_rand=768, N_samples=20, N_samples_around_depth=20, num_levels=4,
        finest_res=48, base_res=8, log2_hashmap_size=14, n_trace_steps=64,
        octree_smallest_voxel_size=2.0 / 64 / sc_factor,
        octree_dilate_size=2.0 / 64 / sc_factor))
    poses_gl = seq["cam_in_obs"] @ GLCAM_IN_CVCAM
    rgbs, depths, masks, normals, poses = preprocess_frame_data(
        seq["colors"].copy(), seq["depths"].copy(), seq["masks"].copy(), None,
        poses_gl.copy(), sc_factor, translation)
    runner = NofRunner(cfg, rgbs, depths, masks, normals, poses, seq["K"])
    metrics = runner.train()
    return runner, metrics, seq


def _object_ray_errors(runner, n=4096):
    m = np.asarray(runner.rays["mask"]) > 0
    idx = np.nonzero(m)[0][:n]
    batch = jax.tree.map(lambda a: a[jnp.asarray(idx)], runner.rays)
    out = render_rays(runner.params, runner.spec, runner.rcfg, batch,
                      runner.c2w_array, runner.occ_grid,
                      jax.random.PRNGKey(0), perturb=False)
    rgb_err = float(jnp.mean((out["rgb_map"] - batch["rgb"]) ** 2))
    depth_pred = jnp.sum(out["weights"] * out["z_vals"], -1)
    d_err = float(jnp.mean(jnp.abs(depth_pred - batch["depth"])))
    return rgb_err, d_err


def test_losses_decrease(trained_runner):
    runner, metrics, _ = trained_runner
    assert metrics["sdf_loss"][-1] < metrics["sdf_loss"][0] * 0.5
    assert np.isfinite(metrics["loss"]).all()


def test_object_rays_fit(trained_runner):
    runner, _, _ = trained_runner
    rgb_err, d_err = _object_ray_errors(runner)
    assert rgb_err < 0.02   # untrained init gives ~0.08
    assert d_err < 0.01     # normalized units


def test_mesh_extent(trained_runner):
    runner, _, seq = trained_runner
    mesh = runner.extract_mesh(voxel_size=0.012)
    assert mesh is not None and len(mesh.faces) > 100
    world = runner.mesh_to_real_world(mesh.copy())
    ext = world.vertices.max(0) - world.vertices.min(0)
    # cube cluster spans ~0.2-0.3 in world units (obj_size 0.08 cluster)
    assert (ext > 0.12).all() and (ext < 0.45).all()


def test_pose_export_anchored(trained_runner):
    runner, _, seq = trained_runner
    poses_out, offset = runner.get_optimized_poses_in_real_world()
    # frame 0 is pinned: exported pose equals the input cv pose
    np.testing.assert_allclose(poses_out[0], seq["cam_in_obs"][0], atol=1e-5)
    # all poses valid rigid transforms
    for T in poses_out:
        R = T[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-4)


def test_continued_training_resumes(trained_runner):
    runner, _, _ = trained_runner
    step_before = runner.global_step
    metrics = runner.train(n_steps=5)
    assert runner.global_step == step_before + 5
    assert np.isfinite(metrics["loss"]).all()


def test_run_budget_telemetry(trained_runner):
    """_check_run_budget measures per-dense-level overflow on a real
    training batch (round-2 verdict: k_runs clamp was a silent dial)."""
    runner, _, _ = trained_runner
    fracs = runner._check_run_budget(n_rays=64)
    assert fracs is not None
    assert fracs.ndim == 1 and len(fracs) >= 1
    assert np.isfinite(fracs).all()
    assert ((fracs >= 0) & (fracs <= 1)).all()


def test_n_importance_adds_samples(trained_runner):
    """N_importance>0 runs the hierarchical PDF resample (ref
    nerf_runner.py:1090-1126): sample count grows by n_importance per
    iteration, z stays sorted, output stays finite and close to the base
    render on a converged model."""
    from dataclasses import replace

    runner, _, _ = trained_runner
    m = np.asarray(runner.rays["mask"]) > 0
    idx = np.nonzero(m)[0][:512]
    batch = jax.tree.map(lambda a: a[jnp.asarray(idx)], runner.rays)
    base_S = runner.rcfg.n_samples + runner.rcfg.n_samples_around_depth

    out0 = render_rays(runner.params, runner.spec, runner.rcfg, batch,
                       runner.c2w_array, runner.occ_grid,
                       jax.random.PRNGKey(0), perturb=False)
    rcfg_imp = replace(runner.rcfg, n_importance=8, n_importance_iter=2)
    out = render_rays(runner.params, runner.spec, rcfg_imp, batch,
                      runner.c2w_array, runner.occ_grid,
                      jax.random.PRNGKey(0), perturb=False)
    assert out["z_vals"].shape[-1] == base_S + 2 * 8
    assert out0["z_vals"].shape[-1] == base_S
    z = np.asarray(out["z_vals"])
    assert (np.diff(z, axis=-1) >= -1e-6).all()
    assert np.isfinite(np.asarray(out["rgb_map"])).all()
    # converged model: importance sampling must not change the render much
    d0 = np.asarray(jnp.sum(out0["weights"] * out0["z_vals"], -1))
    d1 = np.asarray(jnp.sum(out["weights"] * out["z_vals"], -1))
    assert np.abs(d0 - d1).mean() < 5e-3
