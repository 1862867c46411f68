"""Hash-grid encoder: parity vs numpy golden, gradients, dense/hash paths."""
import jax
import jax.numpy as jnp
import numpy as np

from bundlesdf_tpu.ops.hashgrid import (
    HashGridSpec, hashgrid_encode, hashgrid_encode_np, init_hashgrid_params)


def test_forward_matches_numpy_golden():
    spec = HashGridSpec(n_levels=4, level_dim=2, base_res=4, finest_res=32,
                        log2_hashmap_size=10)
    key = jax.random.PRNGKey(0)
    table = init_hashgrid_params(key, spec)
    x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3), minval=-1, maxval=1)
    out = hashgrid_encode(table, x, spec)
    ref = hashgrid_encode_np(np.asarray(table), np.asarray(x), spec)
    assert out.shape == (64, spec.out_dim)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-6)


def test_hash_path_used_for_large_levels():
    # tiny table so the finest levels must hash
    spec = HashGridSpec(n_levels=3, level_dim=2, base_res=8, finest_res=64,
                        log2_hashmap_size=6)
    table = init_hashgrid_params(jax.random.PRNGKey(0), spec)
    x = jax.random.uniform(jax.random.PRNGKey(1), (32, 3), minval=-1, maxval=1)
    out = hashgrid_encode(table, x, spec)
    ref = hashgrid_encode_np(np.asarray(table), np.asarray(x), spec)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-6)


def test_gradients_flow_to_table_and_points():
    spec = HashGridSpec(n_levels=2, level_dim=2, base_res=4, finest_res=8,
                        log2_hashmap_size=8)
    table = init_hashgrid_params(jax.random.PRNGKey(0), spec)
    x = jnp.array([[0.1, -0.2, 0.3], [0.5, 0.5, -0.5]])

    def loss(tab, pts):
        return jnp.sum(hashgrid_encode(tab, pts, spec) ** 2)

    gt, gx = jax.grad(loss, argnums=(0, 1))(table, x)
    assert np.isfinite(np.asarray(gt)).all()
    assert np.isfinite(np.asarray(gx)).all()
    assert float(jnp.abs(gt).sum()) > 0
    # finite-difference check on the point gradient
    eps = 1e-4
    for d in range(3):
        xp = x.at[0, d].add(eps)
        xm = x.at[0, d].add(-eps)
        fd = (loss(table, xp) - loss(table, xm)) / (2 * eps)
        np.testing.assert_allclose(float(gx[0, d]), float(fd), rtol=5e-2, atol=1e-3)


def test_interpolation_continuity():
    """Feature should be continuous across voxel boundaries."""
    spec = HashGridSpec(n_levels=2, level_dim=2, base_res=4, finest_res=8,
                        log2_hashmap_size=12)
    table = init_hashgrid_params(jax.random.PRNGKey(3), spec)
    # straddle a boundary at x01=0.25 -> x=-0.5
    xs = jnp.stack([jnp.linspace(-0.5 - 1e-5, -0.5 + 1e-5, 11),
                    jnp.zeros(11), jnp.zeros(11)], axis=-1)
    out = np.asarray(hashgrid_encode(table, xs, spec))
    assert np.abs(np.diff(out, axis=0)).max() < 1e-3


def test_select_ids_einsum_big_dense_level():
    """Row-id selection must stay exact for dense levels past the f32
    integer range (res 256 at T=2^25 -> 257^3 = 16.97M rows): the split
    12-bit two-einsum path must reproduce integer selection exactly."""
    import numpy as np
    from bundlesdf_tpu.ops.hashgrid import _select_ids_einsum
    rng = np.random.default_rng(0)
    R, S, K = 16, 32, 8
    n_rows = 257 ** 3  # 16_974_593 > 2^24
    # ids around / above 2^24 where f32 spacing is 2.0
    ids = rng.integers(n_rows - (1 << 20), n_rows, size=(R, S)).astype(
        np.int32)
    st = np.zeros((R, S, K), bool)
    for r in range(R):
        for k in range(K):
            st[r, rng.integers(0, S), k] = True
    got = np.asarray(_select_ids_einsum(jnp.asarray(st), jnp.asarray(ids),
                                        n_rows))
    want = (st.astype(np.int64) *
            ids[:, :, None].astype(np.int64)).sum(axis=1)
    np.testing.assert_array_equal(got, want)
