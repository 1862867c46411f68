"""Ray-coherent dedup backward: gradient parity with plain autodiff when
the per-ray run budget is not exceeded."""
import jax
import jax.numpy as jnp
import numpy as np

from bundlesdf_tpu.ops.hashgrid import (HashGridSpec, hashgrid_encode,
                                        init_hashgrid_params)


def _ray_points(n_rays=32, n_samples=24, seed=0):
    """z-ordered samples along random rays inside [-1,1]^3."""
    rng = np.random.default_rng(seed)
    o = rng.uniform(-0.3, 0.3, (n_rays, 3))
    d = rng.standard_normal((n_rays, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    t = np.sort(rng.uniform(0.0, 0.5, (n_rays, n_samples)), axis=1)
    pts = o[:, None] + d[:, None] * t[..., None]
    return jnp.asarray(np.clip(pts.reshape(-1, 3), -0.99, 0.99), jnp.float32)


def test_dedup_gradient_matches_autodiff():
    n_samples = 24
    spec_plain = HashGridSpec(n_levels=3, level_dim=2, base_res=4,
                              finest_res=16, log2_hashmap_size=14)
    spec_dedup = HashGridSpec(n_levels=3, level_dim=2, base_res=4,
                              finest_res=16, log2_hashmap_size=14,
                              ray_samples=n_samples, scatter_bf16=False)
    spec_bf16 = HashGridSpec(n_levels=3, level_dim=2, base_res=4,
                             finest_res=16, log2_hashmap_size=14,
                             ray_samples=n_samples)
    table = init_hashgrid_params(jax.random.PRNGKey(0), spec_plain)
    x = _ray_points(n_samples=n_samples)
    key = jax.random.normal(jax.random.PRNGKey(1),
                            (x.shape[0], spec_plain.out_dim))

    def loss(spec, ray_mode=False):
        def f(tab):
            return jnp.sum(hashgrid_encode(tab, x, spec, ray_mode=ray_mode)
                           * key)
        return f

    # forwards identical
    np.testing.assert_allclose(
        np.asarray(hashgrid_encode(table, x, spec_plain)),
        np.asarray(hashgrid_encode(table, x, spec_dedup, ray_mode=True)),
        atol=1e-6)

    g_plain = jax.grad(loss(spec_plain))(table)
    g_dedup = jax.grad(loss(spec_dedup, ray_mode=True))(table)
    np.testing.assert_allclose(np.asarray(g_dedup), np.asarray(g_plain),
                               rtol=1e-4, atol=1e-5)
    # default bf16 scatter compute: f32-accumulated, close but not exact
    g_bf16 = jax.grad(loss(spec_bf16, ray_mode=True))(table)
    np.testing.assert_allclose(np.asarray(g_bf16), np.asarray(g_plain),
                               rtol=3e-2, atol=3e-2)


def test_dedup_point_gradient_unaffected():
    n_samples = 16
    spec = HashGridSpec(n_levels=2, level_dim=2, base_res=4, finest_res=8,
                        log2_hashmap_size=12, ray_samples=n_samples)
    table = init_hashgrid_params(jax.random.PRNGKey(0), spec)
    x = _ray_points(n_rays=8, n_samples=n_samples)

    def loss(pts):
        return jnp.sum(hashgrid_encode(table, pts, spec, ray_mode=True) ** 2)

    g = jax.grad(loss)(x)
    assert np.isfinite(np.asarray(g)).all()
    # finite difference on one coordinate
    eps = 1e-4
    fd = (loss(x.at[3, 1].add(eps)) - loss(x.at[3, 1].add(-eps))) / (2 * eps)
    np.testing.assert_allclose(float(g[3, 1]), float(fd), rtol=5e-2,
                               atol=1e-3)


def test_non_ray_shapes_fall_back():
    spec = HashGridSpec(n_levels=2, level_dim=2, base_res=4, finest_res=8,
                        log2_hashmap_size=12, ray_samples=24)
    table = init_hashgrid_params(jax.random.PRNGKey(0), spec)
    x = jax.random.uniform(jax.random.PRNGKey(1), (25, 3), minval=-1,
                           maxval=1)  # 25 % 24 != 0 -> plain path
    g = jax.grad(lambda t: jnp.sum(
        hashgrid_encode(t, x, spec, ray_mode=True) ** 2))(table)
    assert np.isfinite(np.asarray(g)).all()
