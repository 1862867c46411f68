"""Full reference workflow: online tracking -> saved artifacts ->
offline global refine -> cleaned/textured meshes + optimized poses."""
import os

import numpy as np
import pytest

from synthetic import cube_orbit_sequence

from bundlesdf_tpu.bundlesdf import BundleSdf
from bundlesdf_tpu.config import default_nerf_config, default_track_config


@pytest.fixture(scope="module")
def online_run(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("refine"))
    seq = cube_orbit_sequence(n_frames=8, H=90, W=120, radius=0.45,
                              obj_size=0.08, full_angle=0.35)
    cfg_t = default_track_config()
    cfg_t["debug_dir"] = tmp
    cfg_t["ransac"]["max_trans_neighbor"] = 0.05
    cfg_t["ransac"]["max_iter"] = 500
    cfg_t["bundle"]["max_BA_frames"] = 5
    cfg_t["bundle"]["depth_association_radius"] = 2
    cfg_n = default_nerf_config()
    tracker = BundleSdf(cfg_track=cfg_t, cfg_nerf=cfg_n,
                        start_nerf_keyframes=99)
    for i in range(8):
        tracker.run(seq["colors"][i], seq["depths"][i].copy(), seq["K"],
                    seq["id_strs"][i], mask=seq["masks"][i])
    return tmp, seq, cfg_t


def test_global_refine_produces_artifacts(online_run):
    tmp, seq, cfg_t = online_run
    cfg_n = default_nerf_config()
    cfg_n.update(dict(
        n_step=100, N_rand=512, N_samples=16, N_samples_around_depth=16,
        num_levels=4, finest_res=48, base_res=8, log2_hashmap_size=14,
        n_trace_steps=64, mesh_resolution=0.01, frame_features=2,
        rgb_weight=100, first_frame_weight=1, fs_sdf=0.1, n_train_image=100))
    tracker = BundleSdf(cfg_track=cfg_t, cfg_nerf=cfg_n,
                        start_nerf_keyframes=5)
    mesh = tracker.run_global_nerf(get_texture=True, tex_res=256)
    d = os.path.join(tmp, "nerf_with_bundletrack_online")
    assert os.path.exists(os.path.join(d, "mesh_cleaned.obj"))
    assert os.path.exists(os.path.join(d, "mesh_real_world.obj"))
    assert os.path.exists(os.path.join(d, "optimized_poses.txt"))
    assert os.path.exists(os.path.join(tmp, "textured_mesh.obj"))
    assert mesh is not None and len(mesh.faces) > 50
    ext = mesh.vertices.max(0) - mesh.vertices.min(0)
    # partial orbit: the unseen back stays open, so z-extent can be shallow
    assert (ext > 0.05).all() and (ext < 0.5).all()
    poses = np.loadtxt(os.path.join(d, "optimized_poses.txt")).reshape(-1, 4, 4)
    assert len(poses) >= 3  # keyframes admitted over the short orbit
    for T in poses:
        np.testing.assert_allclose(T[:3, :3] @ T[:3, :3].T, np.eye(3),
                                   atol=1e-3)
