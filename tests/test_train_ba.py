"""Feature-match BA in ray space: a perturbed frame pose is pulled back by
matched-ray point consistency."""
import numpy as np
import jax.numpy as jnp

from synthetic import cube_orbit_sequence

from bundlesdf_tpu.config import default_nerf_config
from bundlesdf_tpu.nof.models import pose_array_matrices
from bundlesdf_tpu.nof.runner import NofRunner, preprocess_frame_data
from bundlesdf_tpu.utils.common import GLCAM_IN_CVCAM


def test_train_ba_reduces_match_distance():
    seq = cube_orbit_sequence(n_frames=3, H=64, W=80, radius=0.45,
                              obj_size=0.08, full_angle=0.2)
    translation = np.zeros(3)
    sc = 0.9 / 0.6
    cfg = default_nerf_config()
    cfg.update(dict(
        sc_factor=sc, translation=translation.tolist(), n_step=10,
        N_rand=128, N_samples=8, N_samples_around_depth=8, num_levels=2,
        finest_res=32, base_res=8, log2_hashmap_size=12, n_trace_steps=32,
        octree_smallest_voxel_size=2.0 / 32 / sc,
        octree_dilate_size=2.0 / 32 / sc, max_trans=0.04, max_rot=10))
    poses_gl = seq["cam_in_obs"] @ GLCAM_IN_CVCAM
    # perturb frame 1's pose slightly (as if tracking drifted)
    poses_gl[1][:3, 3] += np.array([0.008, -0.005, 0.004])
    rgbs, depths, masks, normals, poses = preprocess_frame_data(
        seq["colors"].copy(), seq["depths"].copy(), seq["masks"].copy(),
        None, poses_gl.copy(), sc, translation)
    r = NofRunner(cfg, rgbs, depths, masks, normals, poses, seq["K"])

    # ground-truth pixel matches between frames 0 and 1 via reprojection:
    # sample mask pixels of frame 0, lift with depth, project into frame 1
    m0 = (seq["masks"][0] > 0) & (seq["depths"][0] > 0.1)
    vs, us = np.nonzero(m0)
    sel = np.random.default_rng(0).choice(len(vs), 200, replace=False)
    vs, us = vs[sel], us[sel]
    K = seq["K"]
    z = seq["depths"][0][vs, us]
    pts_cam0 = np.stack([(us - K[0, 2]) * z / K[0, 0],
                         (vs - K[1, 2]) * z / K[1, 1], z], -1)
    T0 = seq["cam_in_obs"][0]
    T1 = seq["cam_in_obs"][1]
    pts_w = pts_cam0 @ T0[:3, :3].T + T0[:3, 3]
    pts_c1 = (pts_w - T1[:3, 3]) @ T1[:3, :3]
    u1 = pts_c1[:, 0] / pts_c1[:, 2] * K[0, 0] + K[0, 2]
    v1 = pts_c1[:, 1] / pts_c1[:, 2] * K[1, 1] + K[1, 2]
    ok = (u1 >= 0) & (u1 < 80) & (v1 >= 0) & (v1 < 64)
    matches = {(0, 1): np.stack([us[ok], vs[ok], u1[ok], v1[ok]], -1)}

    pairs = r.match_table_to_ray_pairs(matches)
    assert len(pairs) > 50
    losses = r.train_ba(pairs, n_steps=150, max_dist=0.05)
    assert losses is not None
    assert losses[-1] < losses[0] * 0.7  # match distance shrinks

    # the learned correction for frame 1 moves opposite the perturbation
    T = np.asarray(pose_array_matrices(
        r.params["pose_array"], jnp.arange(3), r.spec.max_trans,
        r.spec.max_rot_deg))
    assert np.abs(T[1] - np.eye(4)).max() > 1e-4  # frame 1 got corrected
    np.testing.assert_allclose(T[0], np.eye(4), atol=1e-7)  # frame 0 pinned
