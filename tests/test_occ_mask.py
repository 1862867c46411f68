"""Occluder-mask path (HO3D hands): occluded pixels leave the foreground
and the NOF ray store."""
import numpy as np

from synthetic import cube_orbit_sequence

from bundlesdf_tpu.config import default_nerf_config, default_track_config
from bundlesdf_tpu.nof.runner import NofRunner, preprocess_frame_data
from bundlesdf_tpu.tracker import Frame
from bundlesdf_tpu.utils.common import GLCAM_IN_CVCAM


def test_frame_occ_mask_removes_foreground():
    seq = cube_orbit_sequence(n_frames=1, H=60, W=80)
    occ = np.zeros((60, 80), np.uint8)
    occ[:, :40] = 1  # occluder covers the left half
    cfg = default_track_config()
    f_plain = Frame(seq["colors"][0], seq["depths"][0], seq["K"], 0, "0000",
                    cfg, mask=seq["masks"][0])
    f_occ = Frame(seq["colors"][0], seq["depths"][0], seq["K"], 0, "0000",
                  cfg, mask=seq["masks"][0], occ_mask=occ)
    assert f_occ.count_valid_points() < f_plain.count_valid_points()
    assert (f_occ.fg_mask[:, :40] == 0).all()


def test_nof_rays_exclude_occluded():
    seq = cube_orbit_sequence(n_frames=3, H=48, W=64)
    occ = np.zeros((3, 48, 64), np.uint8)
    occ[:, :, :32] = 1
    sc = 0.9 / 0.6
    cfg = default_nerf_config()
    cfg.update(dict(sc_factor=sc, translation=[0, 0, 0], N_rand=64,
                    N_samples=8, N_samples_around_depth=8, num_levels=2,
                    finest_res=32, base_res=8, log2_hashmap_size=12,
                    n_trace_steps=32,
                    octree_smallest_voxel_size=2.0 / 32 / sc,
                    octree_dilate_size=2.0 / 32 / sc))
    poses_gl = seq["cam_in_obs"] @ GLCAM_IN_CVCAM
    rgbs, depths, masks, normals, poses = preprocess_frame_data(
        seq["colors"].copy(), seq["depths"].copy(), seq["masks"].copy(),
        None, poses_gl.copy(), sc, [0, 0, 0])
    r_plain = NofRunner(cfg, rgbs, depths, masks, normals, poses, seq["K"])
    r_occ = NofRunner(cfg, rgbs, depths, masks, normals, poses, seq["K"],
                      occ_masks=occ)
    # the device store is padded to a shape bucket; compare REAL ray counts
    n_plain = r_plain.n_rays_valid
    n_occ = r_occ.n_rays_valid
    assert n_occ < n_plain
    # no surviving ray projects into the occluded half
    dirs = np.asarray(r_occ.rays["dirs"])[:n_occ]
    us = dirs[:, 0] / -dirs[:, 2] * seq["K"][0, 0] + seq["K"][0, 2]
    assert (us >= 31).all()
