"""Train-loop interval hooks: debug render, checkpoint, mesh/pose dumps."""
import glob
import os

import numpy as np

from synthetic import cube_orbit_sequence

from bundlesdf_tpu.config import default_nerf_config
from bundlesdf_tpu.nof.runner import NofRunner, preprocess_frame_data
from bundlesdf_tpu.utils.common import GLCAM_IN_CVCAM


def test_interval_artifacts(tmp_path):
    seq = cube_orbit_sequence(n_frames=3, H=48, W=64)
    translation = np.zeros(3)
    sc = 0.9 / 0.6
    cfg = default_nerf_config()
    cfg.update(dict(
        sc_factor=sc, translation=translation.tolist(), n_step=60,
        N_rand=128, N_samples=8, N_samples_around_depth=8, num_levels=2,
        finest_res=32, base_res=8, log2_hashmap_size=12, n_trace_steps=32,
        octree_smallest_voxel_size=2.0 / 32 / sc,
        octree_dilate_size=2.0 / 32 / sc, mesh_resolution=0.05,
        save_dir=str(tmp_path),
        i_weights=50, i_img=50, i_mesh=50, i_pose=50, i_print=50))
    poses_gl = seq["cam_in_obs"] @ GLCAM_IN_CVCAM
    rgbs, depths, masks, normals, poses = preprocess_frame_data(
        seq["colors"].copy(), seq["depths"].copy(), seq["masks"].copy(),
        None, poses_gl.copy(), sc, translation)
    r = NofRunner(cfg, rgbs, depths, masks, normals, poses, seq["K"])
    r.train(n_steps=60)
    assert os.path.exists(tmp_path / "model_latest.npz")
    assert glob.glob(str(tmp_path / "image_step_*.png"))
    assert glob.glob(str(tmp_path / "step_*_optimized_poses.txt"))
    # mesh dump may legitimately be empty early in training; file-or-none
    # is exercised either way by the hook call
