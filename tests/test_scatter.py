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
