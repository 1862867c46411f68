"""NOF losses: truncated-SDF objective + rgb + regularizers.

Exact semantics of the reference loss assembly (`nerf_runner.py:679-752`,
`nerf_helpers.py:367-399` get_masks/get_sdf_loss), written as pure
functions over a rendered batch. All reductions are masked means over
static-shape arrays.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class LossConfig:
    rgb_weight: float = 10.0
    fs_weight: float = 100.0
    empty_weight: float = 0.01
    trunc_weight: float = 6000.0
    fs_rgb_weight: float = 0.0
    eikonal_weight: float = 0.0
    feature_reg_weight: float = 0.1
    pose_reg_weight: float = 0.0
    first_frame_weight: float = 1.0
    fs_sdf: float = 0.001
    near: float = 0.1   # * sc_factor at build time
    far: float = 2.0    # * sc_factor at build time
    neg_trunc_ratio: float = 1.0


def sdf_losses(z_vals, target_d, sdf, truncation, lcfg: LossConfig,
               sample_weights):
    """Free-space + empty + truncation losses (ref get_sdf_loss
    nerf_helpers.py:385-399 with get_masks :367-381).

    @z_vals, @sdf, @sample_weights: (N,S); @target_d: (N,).
    Returns (fs_loss_incl_empty, sdf_loss) with the reference's 0.5 weights
    folded in (fs_weight=0.5, sdf_weight=0.5 from get_masks).
    """
    d = target_d[:, None]
    valid_depth = (d >= lcfg.near) & (d <= lcfg.far)
    front = z_vals < d - truncation
    back = z_vals > d + truncation * lcfg.neg_trunc_ratio
    sdf_mask = (~front) & (~back) & valid_depth

    # rays whose measured depth is beyond far: push sdf up to fs_sdf
    m1 = (d > lcfg.far) & (sdf < lcfg.fs_sdf)
    fs_loss = jnp.mean(((sdf - lcfg.fs_sdf) * m1) ** 2 * sample_weights) * 0.5

    # free space before the surface: sdf -> 1 (L1)
    m2 = front & (d <= lcfg.far) & (sdf < 1.0)
    empty_loss = jnp.mean(jnp.abs(sdf - 1.0) * m2 * sample_weights) \
        * lcfg.empty_weight
    fs_total = fs_loss + empty_loss

    # truncation region: predicted zero crossing z + sdf*trunc matches depth
    sdf_loss = jnp.mean(((z_vals + sdf * truncation) * sdf_mask
                         - d * sdf_mask) ** 2 * sample_weights) * 0.5
    return fs_total, sdf_loss


def nof_loss(out: dict, rays: dict, params: dict, truncation: float,
             lcfg: LossConfig):
    """Total training loss for one rendered batch (ref train_loop
    nerf_runner.py:679-752). Returns (loss, metrics dict)."""
    rgb_map = out["rgb_map"]
    sdf = out["sdf"]
    z_vals = out["z_vals"]
    valid_samples = out["valid_samples"].astype(jnp.float32)
    N, S = sdf.shape

    frame_ids = rays["frame_id"]
    ray_type = rays["ray_type"]
    valid_rays = (jnp.any(valid_samples > 0, axis=-1)
                  & (ray_type == 0)).astype(jnp.float32)
    ray_weights = jnp.where(frame_ids == 0, lcfg.first_frame_weight, 1.0)
    ray_weights = ray_weights * valid_rays
    sample_weights = ray_weights[:, None] * valid_samples
    sample_weights = jnp.where((ray_type == 1)[:, None], 0.0, sample_weights)

    img_loss = jnp.mean((rgb_map - rays["rgb"]) ** 2 * ray_weights[:, None])
    rgb_loss = lcfg.rgb_weight * img_loss

    fs_loss, sdf_loss = sdf_losses(z_vals, rays["depth"], sdf, truncation,
                                   lcfg, sample_weights)
    fs_loss = fs_loss * lcfg.fs_weight
    sdf_loss = sdf_loss * lcfg.trunc_weight
    loss = rgb_loss + fs_loss + sdf_loss

    metrics = {"rgb_loss": rgb_loss, "fs_loss": fs_loss, "sdf_loss": sdf_loss}

    if lcfg.fs_rgb_weight > 0:
        front = z_vals < rays["depth"][:, None] - truncation
        fs_rgb = jnp.mean(((jax.nn.sigmoid(out["raw_rgb"]) - 1.0)
                           * front[..., None]) ** 2
                          * sample_weights[..., None])
        loss = loss + fs_rgb * lcfg.fs_rgb_weight
        metrics["fs_rgb_loss"] = fs_rgb * lcfg.fs_rgb_weight

    if lcfg.eikonal_weight > 0 and "normals" in out:
        # ref nerf_runner.py:734-738: ((|∇sdf| - 1)^2) over samples with
        # sdf < 1 (the near-surface band); masked mean over valid samples
        # (the reference's own path crashes if enabled — see RenderConfig)
        m = ((out["eik_sdf"] < 1.0) & out["eik_valid"]).astype(jnp.float32)
        # safe norm: |∇sdf| can be exactly 0 at init (flat field), where
        # jnp.linalg.norm's VJP is NaN
        nrm = jnp.sqrt(jnp.sum(out["normals"] ** 2, axis=-1) + 1e-12)
        eik = (jnp.sum((nrm - 1.0) ** 2 * m) / (jnp.sum(m) + 1e-9)
               * lcfg.eikonal_weight)
        loss = loss + eik
        metrics["eikonal_loss"] = eik

    if "feature_array" in params:
        reg = lcfg.feature_reg_weight * jnp.mean(params["feature_array"] ** 2)
        loss = loss + reg
        metrics["feature_reg"] = reg

    if lcfg.pose_reg_weight > 0:
        reg = lcfg.pose_reg_weight * jnp.linalg.norm(params["pose_array"][1:])
        loss = loss + reg
        metrics["pose_reg"] = reg

    metrics["loss"] = loss
    return loss, metrics
