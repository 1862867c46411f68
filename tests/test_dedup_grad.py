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


def _tier_rays(n_heavy, n_light, n_samples=48, seed=2):
    """Heavy rays sweep the whole volume (many voxel runs); light rays
    barely move (few runs). z-ordered samples, (R*S, 3)."""
    rng = np.random.default_rng(seed)
    pts = []
    for i in range(n_heavy + n_light):
        o = rng.uniform(-0.9, -0.5, 3)
        d = rng.standard_normal(3)
        d /= np.linalg.norm(d)
        span = 1.6 if i < n_heavy else 0.02
        t = np.sort(rng.uniform(0.0, span, n_samples))
        pts.append(o[None] + d[None] * t[:, None])
    return jnp.asarray(np.clip(np.concatenate(pts), -0.99, 0.99), jnp.float32)


def test_two_tier_exact_and_grad_parity():
    """Two-tier path active (K=32, X=16) with few heavy rays: forward must
    equal the numpy golden and the table grad must match plain autodiff."""
    from bundlesdf_tpu.ops.hashgrid import hashgrid_encode_np

    S = 48
    x = _tier_rays(n_heavy=8, n_light=56, n_samples=S)  # R=64, X=16
    spec_tier = HashGridSpec(n_levels=2, level_dim=2, base_res=8,
                             finest_res=32, log2_hashmap_size=16,
                             ray_samples=S, scatter_bf16=False,
                             tier_frac=0.25)
    spec_plain = HashGridSpec(n_levels=2, level_dim=2, base_res=8,
                              finest_res=32, log2_hashmap_size=16)
    table = init_hashgrid_params(jax.random.PRNGKey(0), spec_plain)

    out = hashgrid_encode(table, x, spec_tier, ray_mode=True)
    ref = hashgrid_encode_np(np.asarray(table), np.asarray(x), spec_plain)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)

    key = jax.random.normal(jax.random.PRNGKey(1), out.shape)
    g_tier = jax.grad(lambda t: jnp.sum(
        hashgrid_encode(t, x, spec_tier, ray_mode=True) * key))(table)
    g_plain = jax.grad(lambda t: jnp.sum(
        hashgrid_encode(t, x, spec_plain) * key))(table)
    np.testing.assert_allclose(np.asarray(g_tier), np.asarray(g_plain),
                               rtol=1e-4, atol=1e-5)


def test_two_tier_fallback_when_low_tier_overflows():
    """With more heavy rays than the top tier holds, the lax.cond must fall
    back to the single-budget path: output == tier_frac=0 output."""
    S = 48
    x = _tier_rays(n_heavy=40, n_light=24, n_samples=S)  # 40 > X=16
    kw = dict(n_levels=2, level_dim=2, base_res=8, finest_res=32,
              log2_hashmap_size=16, ray_samples=S, scatter_bf16=False)
    spec_tier = HashGridSpec(tier_frac=0.25, **kw)
    spec_single = HashGridSpec(tier_frac=0.0, **kw)
    table = init_hashgrid_params(jax.random.PRNGKey(0), spec_tier)
    out_tier = hashgrid_encode(table, x, spec_tier, ray_mode=True)
    out_single = hashgrid_encode(table, x, spec_single, ray_mode=True)
    np.testing.assert_allclose(np.asarray(out_tier), np.asarray(out_single),
                               atol=1e-6)
