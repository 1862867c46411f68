"""Occupancy grid build/query/ray-trace + ray sample placement."""
import jax
import pytest
import jax.numpy as jnp
import numpy as np

from bundlesdf_tpu.ops.occupancy import (
    OccupancyGrid, build_occupancy_grid, query_occupancy, ray_trace_occupancy)
from bundlesdf_tpu.ops.sampling import (
    sample_occupied_steps, sample_pdf, sample_rays_uniform)


def _center_sphere_grid(res=32, r=0.3):
    xs = (np.arange(res) + 0.5) / res * 2 - 1
    X, Y, Z = np.meshgrid(xs, xs, xs, indexing="ij")
    return OccupancyGrid(grid=jnp.asarray(X**2 + Y**2 + Z**2 < r**2), res=res)


def test_build_and_query():
    pts = np.array([[0.0, 0.0, 0.0], [0.5, 0.5, 0.5]])
    g = build_occupancy_grid(pts, res=16, dilate_radius=1)
    assert bool(query_occupancy(g, jnp.array([[0.0, 0.0, 0.0]]))[0])
    assert not bool(query_occupancy(g, jnp.array([[-0.9, -0.9, -0.9]]))[0])
    # dilation: a neighbor voxel of an occupied one is occupied
    assert bool(query_occupancy(g, jnp.array([[2.0 / 16 + 0.01, 0.0, 0.0]]))[0])
    # outside the cube is never occupied
    assert not bool(query_occupancy(g, jnp.array([[1.5, 0.0, 0.0]]))[0])


def test_ray_trace_hits_sphere():
    g = _center_sphere_grid()
    o = jnp.array([[0.0, 0.0, -2.0], [1.5, 1.5, -2.0]])
    d = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    out = ray_trace_occupancy(g, o, d, n_steps=128)
    assert bool(out["hit"][0])
    assert not bool(out["hit"][1])
    # near/far bracket the sphere surface [-0.3, 0.3] -> t in [1.7, 2.3]
    assert 1.6 < float(out["near"][0]) < 1.8
    assert 2.2 < float(out["far"][0]) < 2.4


def test_sample_rays_uniform_in_range():
    key = jax.random.PRNGKey(0)
    near = jnp.full((8, 1), 0.5)
    far = jnp.full((8, 1), 1.5)
    z = sample_rays_uniform(key, near, far, 32, perturb=True)
    assert z.shape == (8, 32)
    assert float(z.min()) >= 0.5 and float(z.max()) <= 1.5
    assert bool(jnp.all(jnp.diff(z, axis=-1) >= 0))


def test_sample_occupied_steps_land_in_occupied():
    g = _center_sphere_grid()
    o = jnp.array([[0.0, 0.0, -2.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    tr = ray_trace_occupancy(g, o, d, n_steps=128)
    z = sample_occupied_steps(jax.random.PRNGKey(1), tr["t0"], tr["t1"],
                              tr["occ"], 64, perturb=True)
    pts = o + d * z[..., None]
    occ = query_occupancy(g, pts.reshape(-1, 3))
    assert float(jnp.mean(occ.astype(jnp.float32))) > 0.98


def test_sample_occupied_fallback_no_hit():
    g = _center_sphere_grid()
    o = jnp.array([[1.5, 1.5, -2.0]])  # misses
    d = jnp.array([[0.0, 0.0, 1.0]])
    tr = ray_trace_occupancy(g, o, d, n_steps=64)
    z = sample_occupied_steps(jax.random.PRNGKey(1), tr["t0"], tr["t1"],
                              tr["occ"], 16, perturb=False)
    assert np.isfinite(np.asarray(z)).all()


def test_sample_pdf_concentrates_mass():
    bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 11), (4, 11))
    w = jnp.zeros((4, 10)).at[:, 5].set(100.0)  # all mass in bin [0.5, 0.6]
    z = sample_pdf(jax.random.PRNGKey(0), bins, w, 64, det=True)
    frac = jnp.mean(((z >= 0.5) & (z <= 0.6)).astype(jnp.float32))
    assert float(frac) > 0.9


@pytest.mark.parametrize("trace_factor,n_steps", [(1, 64), (2, 64), (2, 32)])
def test_trace_never_skips_occupied_voxel(trace_factor, n_steps):
    """VERDICT round-1 item: at res=128-scale step sizes the old midpoint
    DDA could hop over single occupied voxels. With the +1-dilated trace
    grid — including the round-3 COARSE trace (trace_factor 2, n_steps
    down to trace_res) — every occupied voxel a ray crosses must overlap
    a step marked occupied (brute-force fine-walk comparison)."""
    import numpy as np
    from bundlesdf_tpu.ops.occupancy import (build_occupancy_grid,
                                             ray_trace_occupancy)

    rng = np.random.default_rng(0)
    res = 64
    # sparse single voxels -> hardest case for midpoint stepping
    pts = rng.uniform(-0.9, 0.9, (40, 3))
    grid = build_occupancy_grid(pts, res=res, dilate_radius=0,
                                trace_factor=trace_factor)
    g_np = np.asarray(grid.grid)

    n_rays = 256
    o = rng.uniform(-0.2, 0.2, (n_rays, 3)).astype(np.float32)
    d = rng.standard_normal((n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    tr = ray_trace_occupancy(grid, jnp.asarray(o), jnp.asarray(d),
                             n_steps=n_steps)
    t0 = np.asarray(tr["t0"]); t1 = np.asarray(tr["t1"])
    occ = np.asarray(tr["occ"])

    # brute force: fine-walk each ray, find ts inside occupied voxels
    misses = 0
    for r in range(n_rays):
        ts = np.linspace(t0[r, 0], t1[r, -1], 4000)
        p = o[r] + d[r] * ts[:, None]
        c = np.floor((p + 1.0) * (res / 2.0)).astype(int)
        inside = np.all((c >= 0) & (c < res), axis=1)
        c = np.clip(c, 0, res - 1)
        hit = g_np[c[:, 0], c[:, 1], c[:, 2]] & inside
        for t in ts[hit]:
            # some step marked occupied must contain (or touch) t
            ok = np.any(occ[r] & (t0[r] <= t + 1e-6) & (t1[r] >= t - 1e-6))
            misses += 0 if ok else 1
    assert misses == 0, f"{misses} occupied crossings missed by the trace"
