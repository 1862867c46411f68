"""Data-parallel NOF training over a device mesh.

Each device holds a shard of the ray store, samples its own sub-batch each
step, computes gradients, and psums them before a replicated Adam update —
the canonical dp recipe (grads ride ICI; params stay replicated). The whole
multi-step loop is one shard_map'ed lax.scan, mirroring the single-chip
`train_steps` (nof/train.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from bundlesdf_tpu.nof.losses import LossConfig, nof_loss
from bundlesdf_tpu.nof.models import NofSpec
from bundlesdf_tpu.nof.render import RenderConfig, render_rays
from bundlesdf_tpu.nof.train import (TrainConfig, lr_factor_at,
                                     make_optimizer, truncation_at)


def make_ray_mesh(devices=None, axis: str = "dp") -> Mesh:
    import numpy as np
    devices = jax.devices() if devices is None else devices
    return Mesh(np.asarray(devices), (axis,))


def shard_rays(rays_store: dict, mesh: Mesh, axis: str = "dp") -> dict:
    """Pad the ray store to a multiple of the mesh size and place it with
    rays sharded across devices."""
    n_dev = mesh.shape[axis]
    n = rays_store["depth"].shape[0]
    n_pad = -(-n // n_dev) * n_dev

    def place(a):
        if n_pad != n:
            pad = [(0, n_pad - n)] + [(0, 0)] * (a.ndim - 1)
            a = jnp.pad(a, pad)
        return jax.device_put(a, NamedSharding(mesh, P(axis)))

    return {k: place(v) for k, v in rays_store.items()}


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "spec", "rcfg", "lcfg", "tcfg", "n_steps",
                     "n_iters"),
    donate_argnums=(0, 1),
)
def train_steps_dp(params, opt_state, rays_sharded, c2w, occ_grid, key,
                   start_step, mesh: Mesh, spec: NofSpec, rcfg: RenderConfig,
                   lcfg: LossConfig, tcfg: TrainConfig, n_steps: int,
                   n_iters: int):
    """DP variant of `train_steps`: per-device sub-batches of
    n_rand/n_devices rays, psum'd grads/metrics, replicated update."""
    axis = mesh.axis_names[0]
    n_dev = mesh.shape[axis]
    per_dev = max(1, tcfg.n_rand // n_dev)
    opt = make_optimizer()

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(), P(axis), P(), P(), P(), P()),
        out_specs=(P(), P(), P()),
    )
    def run(params, opt_state, rays_shard, c2w, occ_grid, key, start_step):
        me = jax.lax.axis_index(axis)
        n_local = rays_shard["depth"].shape[0]

        def one_step(carry, i):
            params, opt_state = carry
            step = start_step + i
            k = jax.random.fold_in(jax.random.fold_in(key, i), me)
            k_batch, k_render = jax.random.split(k)
            idx = jax.random.randint(k_batch, (per_dev,), 0, n_local)
            batch = jax.tree.map(lambda a: a[idx], rays_shard)
            trunc = truncation_at(step, tcfg, n_iters)

            def loss_fn(p):
                out = render_rays(p, spec, rcfg, batch, c2w, occ_grid,
                                  k_render, perturb=True, trunc=trunc)
                return nof_loss(out, batch, p, trunc, lcfg)

            (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            grads = jax.lax.pmean(grads, axis)        # <- ICI collective
            metrics = jax.lax.pmean(metrics, axis)
            updates, opt_state2 = opt.update(grads, opt_state)
            f = lr_factor_at(step, tcfg, n_iters)

            def apply_lr(path, u):
                lr = (tcfg.lrate_pose if path[0].key == "pose_array"
                      else tcfg.lrate)
                return -lr * f * u

            updates = jax.tree_util.tree_map_with_path(apply_lr, updates)
            params2 = optax.apply_updates(params, updates)
            return (params2, opt_state2), metrics

        (params, opt_state), metrics = jax.lax.scan(
            one_step, (params, opt_state), jnp.arange(n_steps))
        return params, opt_state, metrics

    return run(params, opt_state, rays_sharded, c2w, occ_grid, key,
               start_step)
