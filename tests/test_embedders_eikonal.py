"""i_embed / i_embed_views selection and the eikonal loss actually change
behavior (round-2 verdict: these config keys were accepted but dead)."""
import jax
import jax.numpy as jnp
import numpy as np

from bundlesdf_tpu.nof.losses import LossConfig, nof_loss
from bundlesdf_tpu.nof.models import (NofSpec, init_nof_params, nof_forward,
                                      nof_sdf)
from bundlesdf_tpu.nof.render import RenderConfig, render_rays
from bundlesdf_tpu.ops.hashgrid import HashGridSpec
from bundlesdf_tpu.ops.occupancy import build_occupancy_grid


def _spec(**kw):
    grid = HashGridSpec(n_levels=2, level_dim=2, base_res=4, finest_res=16,
                        log2_hashmap_size=12, ray_samples=8)
    return NofSpec(grid=grid, sh_degree=3, n_frames=2, **kw)


def test_i_embed_freq_no_table_and_forward():
    spec = _spec(i_embed=0, multires=6)
    assert spec.pos_dim == 3 + 3 * 2 * 6
    params = init_nof_params(jax.random.PRNGKey(0), spec)
    assert "table" not in params
    pts = jax.random.uniform(jax.random.PRNGKey(1), (16, 3), minval=-0.9,
                             maxval=0.9)
    dirs = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]]), (16, 1))
    fids = jnp.zeros((16,), jnp.int32)
    out = nof_forward(params, spec, pts, viewdirs=dirs, frame_ids=fids)
    assert out.shape == (16, 4)
    assert np.isfinite(np.asarray(out)).all()
    # gradients flow to the MLP
    g = jax.grad(lambda p: jnp.sum(
        nof_forward(p, spec, pts, viewdirs=dirs, frame_ids=fids)))(params)
    assert float(jnp.abs(g["sigma_net"][0]["w"]).sum()) > 0


def test_i_embed_views_freq_changes_color_input():
    spec_sh = _spec(i_embed_views=2)
    spec_fr = _spec(i_embed_views=0)
    assert spec_sh.view_dim == 9
    assert spec_fr.view_dim == 3 + 3 * 2 * 3
    params = init_nof_params(jax.random.PRNGKey(0), spec_fr)
    pts = jax.random.uniform(jax.random.PRNGKey(1), (8, 3), minval=-0.9,
                             maxval=0.9)
    dirs = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]]), (8, 1))
    out = nof_forward(params, spec_fr, pts, viewdirs=dirs,
                      frame_ids=jnp.zeros((8,), jnp.int32))
    assert out.shape == (8, 4)


def test_i_embed_identity():
    spec = _spec(i_embed=-1, i_embed_views=-1)
    assert spec.pos_dim == 3 and spec.view_dim == 3
    params = init_nof_params(jax.random.PRNGKey(0), spec)
    pts = jnp.zeros((4, 3))
    out = nof_forward(params, spec, pts,
                      viewdirs=jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]]),
                                        (4, 1)),
                      frame_ids=jnp.zeros((4,), jnp.int32))
    assert out.shape == (4, 4)


def _tiny_render_setup(eikonal: bool):
    grid = HashGridSpec(n_levels=2, level_dim=2, base_res=4, finest_res=16,
                        log2_hashmap_size=12, ray_samples=16)
    spec = NofSpec(grid=grid, sh_degree=2, n_frames=1)
    params = init_nof_params(jax.random.PRNGKey(0), spec)
    rcfg = RenderConfig(n_samples=8, n_samples_around_depth=8, trunc=0.05,
                        near=0.05, far=1.5, n_trace_steps=32,
                        compute_bf16=False, eikonal=eikonal)
    pts = np.random.default_rng(0).uniform(-0.3, 0.3, (500, 3))
    occ = build_occupancy_grid(pts, res=16, dilate_radius=1)
    N = 32
    rng = np.random.default_rng(1)
    dirs = np.concatenate([rng.uniform(-0.2, 0.2, (N, 2)),
                           -np.ones((N, 1))], axis=-1)
    rays = {"dirs": jnp.asarray(dirs, jnp.float32),
            "rgb": jnp.full((N, 3), 0.5, jnp.float32),
            "depth": jnp.full((N,), 0.8, jnp.float32),
            "mask": jnp.ones((N,), jnp.float32),
            "frame_id": jnp.zeros((N,), jnp.int32),
            "ray_type": jnp.zeros((N,), jnp.int32),
            "near": jnp.full((N,), 0.05, jnp.float32),
            "far": jnp.full((N,), 1.5, jnp.float32)}
    c2w = jnp.eye(4)[None]
    c2w = c2w.at[0, 2, 3].set(0.9)  # camera in front, looking -z
    return params, spec, rcfg, rays, c2w, occ


def test_eikonal_normals_emitted_and_loss_changes():
    params, spec, rcfg, rays, c2w, occ = _tiny_render_setup(eikonal=True)
    out = render_rays(params, spec, rcfg, rays, c2w, occ,
                      jax.random.PRNGKey(0), perturb=False)
    assert "normals" in out and out["normals"].shape == out["sdf"].shape + (3,)
    assert np.isfinite(np.asarray(out["normals"])).all()

    lcfg_off = LossConfig(near=0.05, far=1.5)
    lcfg_on = LossConfig(near=0.05, far=1.5, eikonal_weight=0.1)
    loss_off, m_off = nof_loss(out, rays, params, 0.05, lcfg_off)
    loss_on, m_on = nof_loss(out, rays, params, 0.05, lcfg_on)
    assert "eikonal_loss" not in m_off
    assert "eikonal_loss" in m_on and float(m_on["eikonal_loss"]) > 0
    assert float(loss_on) != float(loss_off)

    # the eikonal term must be differentiable wrt the field params
    def loss_fn(p):
        o = render_rays(p, spec, rcfg, rays, c2w, occ, jax.random.PRNGKey(0),
                        perturb=False)
        return nof_loss(o, rays, p, 0.05, lcfg_on)[0]
    g = jax.grad(loss_fn)(params)
    assert np.isfinite(np.asarray(g["table"])).all()


def test_eikonal_fd_matches_analytic_on_freq_field():
    """On the smooth freq-encoded field the FD normals match autodiff."""
    spec = _spec(i_embed=0, multires=4)
    params = init_nof_params(jax.random.PRNGKey(3), spec)
    pts = jax.random.uniform(jax.random.PRNGKey(4), (64, 3), minval=-0.5,
                             maxval=0.5)
    eps = 1e-3
    offs = jnp.concatenate([jnp.eye(3), -jnp.eye(3)], axis=0) * eps
    pq = (pts[None] + offs[:, None]).reshape(-1, 3)
    sq = nof_sdf(params, spec, pq).reshape(6, -1)
    fd = ((sq[:3] - sq[3:]) / (2 * eps)).T
    ad = jax.vmap(jax.grad(lambda x: nof_sdf(params, spec, x[None])[0]))(pts)
    # samples whose FD stencil straddles a ReLU kink legitimately disagree
    # with the one-sided autodiff; the smooth majority must match tightly
    close = np.isclose(np.asarray(fd), np.asarray(ad), rtol=1e-2, atol=1e-3)
    assert close.mean() > 0.9, close.mean()
