import jax.numpy as jnp
import numpy as np

from bundlesdf_tpu.ops import preprocess as pp
from tests.synthetic import cube_orbit_sequence


def _numpy_erode(depth, radius, diff, ratio, zfar):
    H, W = depth.shape
    out = depth.copy()
    total = (2 * radius + 1) ** 2
    for y in range(H):
        for x in range(W):
            d = depth[y, x]
            if d <= 0.1 or d > zfar:
                out[y, x] = 0
                continue
            cnt = 0
            for i in range(-radius, radius + 1):
                for j in range(-radius, radius + 1):
                    yy, xx = y + i, x + j
                    if 0 <= yy < H and 0 <= xx < W:
                        nb = depth[yy, xx]
                        if nb < 0.1 or abs(nb - d) > diff:
                            cnt += 1
            if cnt / total >= ratio:
                out[y, x] = 0
    return out


def test_erode_matches_numpy_reference():
    rng = np.random.default_rng(0)
    depth = (0.5 + 0.01 * rng.standard_normal((12, 16))).astype(np.float32)
    depth[3, 4] = 0.0
    depth[7, 7] = 2.0  # beyond zfar
    got = np.asarray(pp.erode_depth(jnp.asarray(depth), radius=1, diff=0.001,
                                    ratio=0.8, zfar=1.0))
    want = _numpy_erode(depth, 1, 0.001, 0.8, 1.0)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_bilateral_preserves_flat_region():
    depth = np.full((16, 16), 0.6, np.float32)
    out = np.asarray(pp.bilateral_filter_depth(jnp.asarray(depth)))
    np.testing.assert_allclose(out, depth, atol=1e-5)


def test_depth_to_xyz_roundtrip():
    seq = cube_orbit_sequence(n_frames=1, H=60, W=80)
    depth = seq["depths"][0]
    K = seq["K"]
    xyz = np.asarray(pp.depth_to_xyz(jnp.asarray(depth), jnp.asarray(K, jnp.float32)))
    # project back
    valid = depth > 0.1
    proj = xyz[valid] @ K.T
    uv = proj[:, :2] / proj[:, 2:3]
    vs, us = np.where(valid)
    np.testing.assert_allclose(uv[:, 0], us, atol=1e-3)
    np.testing.assert_allclose(uv[:, 1], vs, atol=1e-3)


def test_normals_on_flat_plane_face_camera():
    # plane z = 0.5 fronto-parallel: normals should be (0,0,-1) (toward camera)
    H, W = 32, 32
    depth = np.full((H, W), 0.5, np.float32)
    K = np.array([[40.0, 0, 16], [0, 40.0, 16], [0, 0, 1]], np.float32)
    xyz = pp.depth_to_xyz(jnp.asarray(depth), jnp.asarray(K))
    nrm = np.asarray(pp.compute_normals(xyz))
    inner = nrm[8:-8, 8:-8]
    np.testing.assert_allclose(inner[..., 2], -1.0, atol=1e-2)


def test_full_pipeline_shapes_and_mask():
    seq = cube_orbit_sequence(n_frames=1, H=60, W=80)
    depth = jnp.asarray(seq["depths"][0])
    mask = jnp.asarray(seq["masks"][0])
    K = jnp.asarray(seq["K"], jnp.float32)
    d, xyz, nrm = pp.preprocess_depth_frame(depth, K, mask=mask)
    d = np.asarray(d)
    assert d.shape == seq["depths"][0].shape
    assert np.all(d[np.asarray(mask) == 0] == 0)
    n = np.asarray(nrm)
    lens = np.linalg.norm(n, axis=-1)
    assert np.all((lens < 1e-6) | (np.abs(lens - 1) < 1e-3))


def test_covisibility_same_pose_high_overlap():
    seq = cube_orbit_sequence(n_frames=2, H=60, W=80)
    K = jnp.asarray(seq["K"], jnp.float32)
    d, xyz, nrm = pp.preprocess_depth_frame(
        jnp.asarray(seq["depths"][0]), K, mask=jnp.asarray(seq["masks"][0]))
    valid = d >= 0.1
    vis_same = float(pp.compute_covisibility(xyz, nrm, valid, jnp.eye(4)))
    assert vis_same > 0.5
    # frame half-orbit away should share less visibility
    seq2 = cube_orbit_sequence(n_frames=2, H=60, W=80, full_angle=np.pi)
    A_in_B = np.linalg.inv(seq2["cam_in_obs"][1]) @ seq2["cam_in_obs"][0]
    vis_far = float(pp.compute_covisibility(xyz, nrm, valid,
                                            jnp.asarray(A_in_B, jnp.float32)))
    assert vis_far < vis_same
