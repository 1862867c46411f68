"""NOF model components: SH encoding, pose array, init, forward."""
import jax
import jax.numpy as jnp
import numpy as np

from bundlesdf_tpu.nof.models import (NofSpec, freq_encode, init_nof_params,
                                      nof_forward, nof_sdf,
                                      pose_array_matrices, sh_encode)
from bundlesdf_tpu.ops.hashgrid import HashGridSpec


def _spec(**kw):
    d = dict(grid=HashGridSpec(n_levels=2, base_res=4, finest_res=16,
                               log2_hashmap_size=10),
             n_frames=4, frame_features=2)
    d.update(kw)
    return NofSpec(**d)


def test_sh_degree3_matches_manual():
    dirs = np.random.default_rng(0).standard_normal((16, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    out = np.asarray(sh_encode(jnp.asarray(dirs), 3))
    assert out.shape == (16, 9)
    x, y, z = dirs[:, 0], dirs[:, 1], dirs[:, 2]
    np.testing.assert_allclose(out[:, 0], 0.28209479177387814, atol=1e-6)
    np.testing.assert_allclose(out[:, 1], -0.4886025119029199 * y, atol=1e-6)
    np.testing.assert_allclose(out[:, 3], -0.4886025119029199 * x, atol=1e-6)
    np.testing.assert_allclose(
        out[:, 6], 0.31539156525252005 * (2 * z * z - x * x - y * y), atol=1e-5)


def test_freq_encode_shape_and_identity():
    x = jnp.array([[0.1, -0.2, 0.3]])
    out = freq_encode(x, 4)
    assert out.shape == (1, 3 + 3 * 2 * 4)
    np.testing.assert_allclose(np.asarray(out[0, :3]), [0.1, -0.2, 0.3],
                               atol=1e-7)
    np.testing.assert_allclose(float(out[0, 3]), np.sin(0.1), atol=1e-6)


def test_pose_array_frame0_pinned_and_bounded():
    pose_params = jnp.full((4, 6), 100.0)  # tanh saturates -> max corrections
    T = pose_array_matrices(pose_params, jnp.arange(4), max_trans=0.02,
                            max_rot_deg=20.0)
    np.testing.assert_allclose(np.asarray(T[0]), np.eye(4), atol=1e-7)
    for i in range(1, 4):
        t = np.asarray(T[i][:3, 3])
        # translation of SE(3) exp is V@t, |t|<=max_trans*sqrt(3) bound-ish
        assert np.linalg.norm(t) < 0.05
        R = np.asarray(T[i][:3, :3])
        ang = np.degrees(np.arccos(np.clip((np.trace(R) - 1) / 2, -1, 1)))
        assert ang <= 20.0 * np.sqrt(3) + 1e-3


def test_init_and_forward_shapes():
    spec = _spec()
    params = init_nof_params(jax.random.PRNGKey(0), spec)
    # exact-allocation flat table: level 0 dense (5^3 rows), level 1 hashed
    assert params["table"].shape == (5 ** 3 + 1024, 2)
    assert params["table"].shape == (spec.grid.total_rows, spec.grid.level_dim)
    assert params["pose_array"].shape == (4, 6)
    assert params["feature_array"].shape == (4, 2)
    # sdf bias init 0.1 on the whole last sigma layer (ref nerf_helpers.py:272)
    np.testing.assert_allclose(np.asarray(params["sigma_net"][-1]["b"]), 0.1)

    pts = jax.random.uniform(jax.random.PRNGKey(1), (32, 3), minval=-1, maxval=1)
    dirs = pts / jnp.linalg.norm(pts, axis=-1, keepdims=True)
    fids = jnp.zeros(32, jnp.int32)
    out = nof_forward(params, spec, pts, dirs, fids)
    assert out.shape == (32, 4)
    assert np.isfinite(np.asarray(out)).all()
    # initial SDF positive-ish thanks to bias init
    assert float(jnp.mean(out[:, 3])) > 0

    sdf = nof_sdf(params, spec, pts)
    np.testing.assert_allclose(np.asarray(sdf), np.asarray(out[:, 3]),
                               atol=1e-5)


def test_forward_differentiable():
    spec = _spec()
    params = init_nof_params(jax.random.PRNGKey(0), spec)
    pts = jnp.array([[0.1, 0.2, 0.3]])
    dirs = jnp.array([[0.0, 0.0, 1.0]])
    fids = jnp.array([1], jnp.int32)

    def loss(p):
        return jnp.sum(nof_forward(p, spec, pts, dirs, fids) ** 2)

    g = jax.grad(loss)(params)
    flat = jax.tree.leaves(jax.tree.map(lambda a: jnp.abs(a).sum(), g))
    assert all(np.isfinite(float(x)) for x in flat)
    assert float(jnp.abs(g["table"]).sum()) > 0
    assert float(jnp.abs(g["pose_array"]).sum()) == 0  # not used in forward
