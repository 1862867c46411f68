"""NOF training: the whole optimization loop as one scanned, jitted XLA
program with donated state.

Re-design of the reference train loop (`nerf_runner.py:679-863`): instead of
a Python loop of torch AMP steps, `train_steps` lax.scans a fused
render->loss->adam step N times on device. The per-frame ray store lives in
HBM; each step gathers a random batch. Optimizer is Adam(eps=1e-15) with the
reference's staircase lr decay (`schedule_lr` nerf_runner.py:579-583,
applied every 10 steps) and a separate pose lr.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import optax

from bundlesdf_tpu.nof.losses import LossConfig, nof_loss
from bundlesdf_tpu.nof.models import NofSpec
from bundlesdf_tpu.nof.render import RenderConfig, render_rays


@dataclass(frozen=True)
class TrainConfig:
    n_step: int = 500
    n_rand: int = 2048
    lrate: float = 0.01
    lrate_pose: float = 0.01
    decay_rate: float = 0.1
    trunc: float = 0.01          # * sc_factor at build time
    trunc_start: float = 0.01    # * sc_factor at build time
    trunc_decay_type: str = ""   # "", "linear", "exp"


def make_optimizer():
    """Adam matching the reference (`create_optimizer` nerf_runner.py:494-503):
    betas (0.9, 0.999), eps 1e-15, no weight decay. The learning rate is
    applied manually per param group in the train step."""
    return optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-15)


def truncation_at(step, tcfg: TrainConfig, n_iters: int):
    """Truncation annealing (ref get_truncation nerf_runner.py:663-676);
    sc_factor is already folded into trunc/trunc_start."""
    if tcfg.trunc_decay_type == "linear":
        return tcfg.trunc_start - (tcfg.trunc_start - tcfg.trunc) * (
            step.astype(jnp.float32) / n_iters)
    if tcfg.trunc_decay_type == "exp":
        lamb = jnp.log(tcfg.trunc / tcfg.trunc_start) / (n_iters / 4)
        return jnp.maximum(tcfg.trunc_start * jnp.exp(step * lamb), tcfg.trunc)
    return jnp.asarray(tcfg.trunc)


def lr_factor_at(step, tcfg: TrainConfig, n_iters: int):
    """Staircase decay: the reference recomputes lr every 10 steps as
    init * decay_rate**(global_step/N) (nerf_runner.py:579-583,764)."""
    eff = (step // 10 * 10).astype(jnp.float32)
    return tcfg.decay_rate ** (eff / n_iters)


@functools.partial(
    jax.jit,
    static_argnames=("spec", "rcfg", "lcfg", "tcfg", "n_steps", "n_iters"),
    donate_argnums=(0, 1),
)
def train_steps(params, opt_state, rays_store, c2w, occ_grid, key,
                start_step, spec: NofSpec, rcfg: RenderConfig,
                lcfg: LossConfig, tcfg: TrainConfig, n_steps: int,
                n_iters: int, n_valid=None):
    """Run `n_steps` training steps as one on-device scan.

    @rays_store: dict of (R, ...) arrays over ALL training rays; R may be
    a padded bucket — pass the real ray count as @n_valid (traced scalar)
    so the program compiles once per bucket instead of once per batch.
    @c2w: (F,4,4) normalized GL cam-to-object poses.
    @start_step: scalar int — global step at entry (drives lr/trunc decay).
    Returns (params, opt_state, metrics) with metrics stacked (n_steps,).
    """
    n_rays_total = rays_store["depth"].shape[0]
    if n_valid is None:
        n_valid = n_rays_total
    opt = make_optimizer()

    # Pack the whole store into ONE (R, C) f32 matrix so each scan step
    # fetches its batch with a single row gather: TPU gathers are
    # row-descriptor-bound, so one (n_rand, 12) gather beats 8 narrow ones.
    # Every field is exactly f32-representable (frame_id/ray_type are small
    # ints). The concat runs once per chunk, amortized over n_steps.
    names = sorted(rays_store)
    widths = [1 if rays_store[k].ndim == 1 else rays_store[k].shape[1]
              for k in names]
    packed_store = jnp.concatenate(
        [rays_store[k].astype(jnp.float32).reshape(n_rays_total, -1)
         for k in names], axis=1)

    def unpack_batch(rows):
        batch, o = {}, 0
        for k, w in zip(names, widths):
            col = rows[:, o:o + w]
            if rays_store[k].ndim == 1:
                col = col[:, 0]
            batch[k] = col.astype(rays_store[k].dtype)
            o += w
        return batch

    def one_step(carry, i):
        params, opt_state = carry
        step = start_step + i
        k = jax.random.fold_in(key, i)
        k_batch, k_render = jax.random.split(k)
        idx = jax.random.randint(k_batch, (tcfg.n_rand,), 0, n_valid)
        batch = unpack_batch(packed_store[idx])

        trunc = truncation_at(step, tcfg, n_iters)

        def loss_fn(p):
            out = render_rays(p, spec, rcfg, batch, c2w, occ_grid, k_render,
                              perturb=True, trunc=trunc)
            return nof_loss(out, batch, p, trunc, lcfg)

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state)
        f = lr_factor_at(step, tcfg, n_iters)

        def apply_lr(path, u):
            lr = tcfg.lrate_pose if path[0].key == "pose_array" else tcfg.lrate
            return -lr * f * u

        updates = jax.tree_util.tree_map_with_path(apply_lr, updates)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), metrics

    (params, opt_state), metrics = jax.lax.scan(
        one_step, (params, opt_state), jnp.arange(n_steps))
    return params, opt_state, metrics
