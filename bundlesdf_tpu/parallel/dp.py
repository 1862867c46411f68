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


def shard_rays(rays_store: dict, mesh: Mesh, axis: str = "dp",
               n_valid: int | None = None):
    """Pad the ray store to a multiple of the mesh size and place it with
    rays sharded across devices.

    When the store has a valid PREFIX of @n_valid rows followed by padding
    (the runner's bucketed store), a contiguous shard split would hand
    later devices all-padding shards. Rows are therefore RESTRIPED
    round-robin (global row j*n_dev + s -> shard s, local row j) so every
    shard's valid rows are again a prefix of ~n_valid/n_dev rows. Returns
    (sharded_store, n_valid_local); samplers must bound indices by
    n_valid_local. With n_valid=None no restriping happens and every row
    is assumed real (n_valid_local = rows/n_dev).
    """
    n_dev = mesh.shape[axis]
    n = rays_store["depth"].shape[0]
    n_pad = -(-n // n_dev) * n_dev

    def place(a):
        if n_pad != n:
            pad = [(0, n_pad - n)] + [(0, 0)] * (a.ndim - 1)
            a = jnp.pad(a, pad)
        if n_valid is not None:
            a = (a.reshape(n_pad // n_dev, n_dev, *a.shape[1:])
                 .swapaxes(0, 1).reshape(n_pad, *a.shape[1:]))
        return jax.device_put(a, NamedSharding(mesh, P(axis)))

    out = {k: place(v) for k, v in rays_store.items()}
    n_valid_local = (n_pad // n_dev if n_valid is None
                     else max(1, min(n_valid, n) // n_dev))
    return out, n_valid_local


@functools.partial(
    jax.jit, static_argnames=("mesh", "spec", "rcfg", "lcfg"))
def grads_on_batch_dp(params, batch_sharded, c2w, occ_grid, key, trunc,
                      mesh: Mesh, spec: NofSpec, rcfg: RenderConfig,
                      lcfg: LossConfig):
    """Gradient of the mean loss over ONE fixed ray batch, data-parallel:
    each device takes the mean-loss gradient over its equal-size shard and
    the shards are pmean'd. Every default loss term is a plain batch mean
    (losses.py), so this must EQUAL the single-device gradient on the same
    batch to f32 reassociation error — the multi-chip correctness pin a
    wrong psum denominator or a dropped shard would fail
    (tests/test_dp_runner.py::test_dp_grads_equal_single_device and the
    driver's dryrun_multichip both assert it)."""
    axis = mesh.axis_names[0]

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(axis), P(), P()),
        out_specs=P(),
        check_vma=False,  # Pallas scatter out_shapes lack vma annotations
    )
    def run(params, batch, c2w, occ_grid):
        def loss_fn(p):
            out = render_rays(p, spec, rcfg, batch, c2w, occ_grid, key,
                              perturb=False, trunc=trunc)
            return nof_loss(out, batch, p, trunc, lcfg)[0]

        return jax.lax.pmean(jax.grad(loss_fn)(params), axis)

    return run(params, batch_sharded, c2w, occ_grid)


def shard_batch(batch: dict, mesh: Mesh, axis: str = "dp"):
    """Place one fixed ray batch with rows split across devices (rows must
    divide the mesh size; contiguous blocks — row order is irrelevant to
    the pmean'd gradient)."""
    n_dev = mesh.shape[axis]
    n = batch["depth"].shape[0]
    assert n % n_dev == 0, (n, n_dev)
    sh = NamedSharding(mesh, P(axis))
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "spec", "rcfg", "lcfg", "tcfg", "n_steps",
                     "n_iters"),
    donate_argnums=(0, 1),
)
def train_steps_dp(params, opt_state, rays_sharded, c2w, occ_grid, key,
                   start_step, mesh: Mesh, spec: NofSpec, rcfg: RenderConfig,
                   lcfg: LossConfig, tcfg: TrainConfig, n_steps: int,
                   n_iters: int, n_valid_local=None):
    """DP variant of `train_steps`: per-device sub-batches of
    n_rand/n_devices rays, psum'd grads/metrics, replicated update.
    @n_valid_local: per-shard real-row count from `shard_rays` (traced
    scalar; None -> every local row is real)."""
    axis = mesh.axis_names[0]
    n_dev = mesh.shape[axis]
    per_dev = max(1, tcfg.n_rand // n_dev)
    opt = make_optimizer()
    if n_valid_local is None:
        n_valid_local = rays_sharded["depth"].shape[0] // n_dev

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(), P(axis), P(), P(), P(), P(), P()),
        out_specs=(P(), P(), P()),
        # the Pallas sorted-tiles scatter engine (ops/scatter.py) declares
        # plain ShapeDtypeStruct out_shapes without vma annotations; the
        # varying-across-mesh check rejects those inside shard_map
        check_vma=False,
    )
    def run(params, opt_state, rays_shard, c2w, occ_grid, key, start_step,
            n_valid_local):
        me = jax.lax.axis_index(axis)

        def one_step(carry, i):
            params, opt_state = carry
            step = start_step + i
            k = jax.random.fold_in(jax.random.fold_in(key, i), me)
            k_batch, k_render = jax.random.split(k)
            idx = jax.random.randint(k_batch, (per_dev,), 0, n_valid_local)
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
               start_step, jnp.asarray(n_valid_local, jnp.int32))
