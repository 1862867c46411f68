"""Smart scatter engines: exact parity with the plain XLA scatter-add,
including sentinel rows, truncation-overflow fallback, hot-tile fallback,
and end-to-end hash-grid gradient parity."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bundlesdf_tpu.ops.scatter import (scatter_rows, scatter_rows_dense_onehot,
                                       scatter_rows_sorted_tiles,
                                       scatter_rows_xla)


def _case(M, D, frac_sentinel=0.3, seed=0, hot=None):
    rng = np.random.default_rng(seed)
    rows = rng.integers(0, D, M).astype(np.int32)
    rows[rng.random(M) < frac_sentinel] = D
    if hot is not None:
        n_hot, target = hot
        rows[rng.choice(M, n_hot, replace=False)] = target
    vals = rng.standard_normal((M, 16)).astype(np.float32)
    return jnp.asarray(rows), jnp.asarray(vals)


def test_dense_onehot_matches_xla():
    rows, vals = _case(4096, 913)
    ref = scatter_rows_xla(vals, rows, 913)
    out = scatter_rows_dense_onehot(vals, rows, 913, bf16=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    out16 = scatter_rows_dense_onehot(vals, rows, 913, bf16=True)
    np.testing.assert_allclose(np.asarray(out16), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_out_bf16_parity_both_cond_branches():
    """out_bf16 must hold in the fast path AND the overflow fallback (the
    lax.cond branches must agree on the bf16 aval)."""
    rows, vals = _case(4096, 30000, seed=5)
    ref = np.asarray(scatter_rows_xla(vals, rows, 30000))
    fast = scatter_rows_sorted_tiles(vals, rows, 30000, m_cap=0, t_tile=512,
                                     win=256, out_bf16=True)
    assert fast.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(fast, np.float32), ref,
                               rtol=2e-2, atol=2e-2)
    # m_cap far below the valid count forces the fallback branch
    slow = scatter_rows_sorted_tiles(vals, rows, 30000, m_cap=256,
                                     t_tile=512, win=256, out_bf16=True)
    assert slow.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(slow, np.float32), ref,
                               rtol=2e-2, atol=2e-2)


def test_dispatch_out_bf16_all_engines():
    rows, vals = _case(2048, 1024, seed=6)
    ref = np.asarray(scatter_rows_xla(vals, rows, 1024))
    for method in ("xla", "onehot", "tiles"):
        out = scatter_rows(vals, rows, 1024, method=method, out_bf16=True)
        assert out.dtype == jnp.bfloat16, method
        np.testing.assert_allclose(np.asarray(out, np.float32), ref,
                                   rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("D,M", [(5000, 4096), (70000, 8192)])
def test_sorted_tiles_matches_xla(D, M):
    rows, vals = _case(M, D, seed=2)
    ref = scatter_rows_xla(vals, rows, D)
    out = scatter_rows_sorted_tiles(vals, rows, D, m_cap=0, t_tile=512,
                                    win=512, bf16=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
    # bf16 compute: f32 accumulate keeps sums close
    out16 = scatter_rows_sorted_tiles(vals, rows, D, m_cap=0, t_tile=512,
                                      win=512, bf16=True)
    np.testing.assert_allclose(np.asarray(out16), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_sorted_tiles_truncation_overflow_falls_back():
    # m_cap smaller than the valid-row count -> must take the exact path
    rows, vals = _case(4096, 5000, frac_sentinel=0.0, seed=3)
    ref = scatter_rows_xla(vals, rows, 5000)
    out = scatter_rows_sorted_tiles(vals, rows, 5000, m_cap=512,
                                    t_tile=512, win=512, bf16=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_sorted_tiles_hot_tile_multipass():
    # one voxel receives more rows than one window -> extra passes cover it
    rows, vals = _case(4096, 5000, frac_sentinel=0.0, seed=4,
                       hot=(1500, 1234))
    ref = scatter_rows_xla(vals, rows, 5000)
    out = scatter_rows_sorted_tiles(vals, rows, 5000, m_cap=0, t_tile=512,
                                    win=512, bf16=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_sorted_tiles_truncation_cap_falls_back():
    # m_cap below the valid-row count -> exact fallback path
    rows, vals = _case(4096, 5000, frac_sentinel=0.0, seed=4,
                       hot=(1500, 1234))
    ref = scatter_rows_xla(vals, rows, 5000)
    out = scatter_rows_sorted_tiles(vals, rows, 5000, m_cap=1024, t_tile=512,
                                    win=512, bf16=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("M", [300, 700, 1])
def test_sorted_tiles_m_not_multiple_of_win(M):
    # M not a multiple of win used to crash at trace time (m_cap rounded up
    # past M -> slice out of bounds); must now pad and stay exact
    rows, vals = _case(M, 5000, seed=8)
    ref = scatter_rows_xla(vals, rows, 5000)
    out = scatter_rows_sorted_tiles(vals, rows, 5000, m_cap=0, t_tile=512,
                                    win=512, bf16=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_run_overflow_fractions():
    """Telemetry for the k_runs budget: overflow fraction is 0 when the
    budget covers S and 1 when the budget is tiny and samples hop voxels."""
    from bundlesdf_tpu.ops.hashgrid import (HashGridSpec,
                                            run_overflow_fractions)
    S = 32
    # rays marching straight through the finest level: one voxel per sample
    t = np.linspace(-0.9, 0.9, S)
    x = np.stack([t, np.zeros(S), np.zeros(S)], -1)[None].repeat(4, 0)
    x = jnp.asarray(x.reshape(-1, 3), jnp.float32)
    ample = HashGridSpec(n_levels=2, level_dim=2, base_res=4, finest_res=64,
                         log2_hashmap_size=20, ray_samples=S)
    f = np.asarray(run_overflow_fractions(x, ample))
    assert f.shape == (2,) and f[0] == 0.0  # coarse level: few runs
    tight = HashGridSpec(n_levels=2, level_dim=2, base_res=4, finest_res=64,
                         log2_hashmap_size=20, ray_samples=S,
                         k_runs=(8, 8))
    f2 = np.asarray(run_overflow_fractions(x, tight))
    assert f2[1] == 1.0  # every ray blows the 8-run budget at res 64


def test_hashgrid_backward_tiny_ray_count():
    """3-ray hash-grid backward through the tile engine (regression: odd
    row counts from small debug batches crashed the scatter)."""
    from bundlesdf_tpu.ops.hashgrid import (HashGridSpec, hashgrid_encode,
                                            init_hashgrid_params)
    n_samples = 16
    rng = np.random.default_rng(9)
    o = rng.uniform(-0.3, 0.3, (3, 3))
    d = rng.standard_normal((3, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    t = np.sort(rng.uniform(0.0, 0.6, (3, n_samples)), axis=1)
    x = jnp.asarray(np.clip((o[:, None] + d[:, None] * t[..., None]
                             ).reshape(-1, 3), -0.99, 0.99), jnp.float32)
    for m in ("xla", "tiles"):
        spec = HashGridSpec(n_levels=3, level_dim=2, base_res=4,
                            finest_res=64, log2_hashmap_size=20,
                            ray_samples=n_samples, scatter_method=m,
                            scatter_bf16=False)
        table = init_hashgrid_params(jax.random.PRNGKey(0), spec)

        def loss(tab):
            return jnp.sum(hashgrid_encode(tab, x, spec, ray_mode=True))
        g = np.asarray(jax.grad(loss)(table))
        assert np.isfinite(g).all()


def test_dispatcher_routes():
    rows, vals = _case(2048, 1024, seed=5)
    ref = scatter_rows_xla(vals, rows, 1024)
    for method in ("auto", "xla", "onehot", "tiles"):
        out = scatter_rows(vals, rows, 1024, method=method, t_tile=512,
                           win=512, bf16=False)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5, err_msg=method)


def test_hashgrid_grad_parity_smart_vs_xla():
    """End-to-end: table gradient identical between scatter engines."""
    from bundlesdf_tpu.ops.hashgrid import (HashGridSpec, hashgrid_encode,
                                            init_hashgrid_params)

    n_samples = 32
    rng = np.random.default_rng(7)
    o = rng.uniform(-0.3, 0.3, (64, 3))
    d = rng.standard_normal((64, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    t = np.sort(rng.uniform(0.0, 0.6, (64, n_samples)), axis=1)
    x = jnp.asarray(np.clip((o[:, None] + d[:, None] * t[..., None]
                             ).reshape(-1, 3), -0.99, 0.99), jnp.float32)

    specs = {
        m: HashGridSpec(n_levels=3, level_dim=2, base_res=4, finest_res=64,
                        log2_hashmap_size=20, ray_samples=n_samples,
                        scatter_method=m, scatter_bf16=False)
        for m in ("xla", "auto")
    }
    table = init_hashgrid_params(jax.random.PRNGKey(0), specs["xla"])
    key = jax.random.normal(jax.random.PRNGKey(1),
                            (x.shape[0], specs["xla"].out_dim))

    grads = {}
    for m, spec in specs.items():
        def loss(tab):
            return jnp.sum(hashgrid_encode(tab, x, spec, ray_mode=True) * key)
        grads[m] = np.asarray(jax.grad(loss)(table))
    np.testing.assert_allclose(grads["auto"], grads["xla"], rtol=1e-4,
                               atol=1e-5)
