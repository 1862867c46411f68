"""Fused RGBD preprocessing as XLA stencil ops.

TPU-native replacement for the reference's per-frame CUDA chain
(`Frame.cpp:225-334` + `BundleTrack/src/cuda/CUDAImageUtil.cu`):
  erode -> 2x bilateral depth filter -> depth->xyz -> normals ->
  edge-aware depth filter -> recompute xyz -> mask invalidation.

Everything is pure jnp on static shapes; XLA fuses the stencils into a
handful of VPU passes, so there is no need for hand-written Pallas here
(the ops are bandwidth-trivial at 480x640). Stencils are built with
fixed-radius `jnp.roll` stacks — compile-time unrolled, vectorizer-friendly.

Validity convention follows the reference: depth < 0.1 means invalid.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

_VALID_MIN = 0.1


def _shifted(img, dy, dx, fill=0.0):
    """Shift an HxW(...) image so out[y,x] = img[y+dy, x+dx]; out-of-bounds -> fill."""
    out = jnp.roll(img, shift=(-dy, -dx), axis=(0, 1))
    H, W = img.shape[:2]
    ys = jnp.arange(H)[:, None]
    xs = jnp.arange(W)[None, :]
    inb = (ys + dy >= 0) & (ys + dy < H) & (xs + dx >= 0) & (xs + dx < W)
    if out.ndim > 2:
        inb = inb[..., None]
    return jnp.where(inb, out, jnp.asarray(fill, out.dtype))


@functools.partial(jax.jit, static_argnames=("radius",))
def erode_depth(depth, radius=1, diff=0.001, ratio=0.8, zfar=1.0):
    """Depth erosion (ref CUDAImageUtil.cu:758-800 erodeDepthMapDevice):
    zero a pixel when the fraction of neighbors that are invalid or differ
    by more than `diff` is >= `ratio`; out-of-range centers are zeroed."""
    depth = depth.astype(jnp.float32)
    bad_center = (depth <= _VALID_MIN) | (depth > zfar)
    count = jnp.zeros_like(depth)
    total = (2 * radius + 1) ** 2
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            # out-of-image neighbors are NOT counted as bad (matches the
            # reference's bounds check skipping them) but still divide `total`
            nb = _shifted(depth, dy, dx, fill=jnp.nan)
            inb = ~jnp.isnan(nb)
            bad = inb & ((nb < _VALID_MIN) | (jnp.abs(nb - depth) > diff))
            count = count + bad.astype(jnp.float32)
    out = jnp.where(count / total >= ratio, 0.0, depth)
    return jnp.where(bad_center, 0.0, out)


@functools.partial(jax.jit, static_argnames=("radius",))
def bilateral_filter_depth(depth, radius=2, sigma_d=2.0, sigma_r=100000.0, zfar=1.0):
    """Edge-preserving depth smoothing
    (ref CUDAImageUtil.cu:822-898 gaussFilterDepthMapDevice): neighbors must
    be valid, within zfar, and within 0.01 of the local mean; weights are
    gaussian in pixel distance and in depth difference to the center."""
    depth = depth.astype(jnp.float32)
    mean_sum = jnp.zeros_like(depth)
    mean_cnt = jnp.zeros_like(depth)
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            nb = _shifted(depth, dy, dx, fill=0.0)
            ok = (nb >= _VALID_MIN) & (nb <= zfar)
            mean_sum = mean_sum + jnp.where(ok, nb, 0.0)
            mean_cnt = mean_cnt + ok.astype(jnp.float32)
    mean_depth = mean_sum / jnp.maximum(mean_cnt, 1.0)

    inv_2sd2 = 1.0 / (2.0 * sigma_d * sigma_d)
    inv_2sr2 = 1.0 / (2.0 * sigma_r * sigma_r)
    wsum = jnp.zeros_like(depth)
    vsum = jnp.zeros_like(depth)
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            nb = _shifted(depth, dy, dx, fill=0.0)
            ok = (nb >= _VALID_MIN) & (nb <= zfar) & (jnp.abs(nb - mean_depth) < 0.01)
            w = jnp.exp(-(dy * dy + dx * dx) * inv_2sd2
                        - (depth - nb) ** 2 * inv_2sr2)
            w = jnp.where(ok, w, 0.0)
            wsum = wsum + w
            vsum = vsum + w * nb
    out = jnp.where((wsum > 0.0) & (mean_cnt > 0.0), vsum / jnp.maximum(wsum, 1e-12), 0.0)
    return out


@jax.jit
def depth_to_xyz(depth, K):
    """Depth -> camera-space xyz map (invalid pixels keep z<0.1 semantics;
    ref CUDAImageUtil.cu:371 convertDepthFloatToCameraSpaceFloat4)."""
    H, W = depth.shape
    us = jnp.arange(W, dtype=jnp.float32)[None, :]
    vs = jnp.arange(H, dtype=jnp.float32)[:, None]
    x = (us - K[0, 2]) * depth / K[0, 0]
    y = (vs - K[1, 2]) * depth / K[1, 1]
    return jnp.stack([x, y, depth], axis=-1)


@jax.jit
def compute_normals(xyz):
    """Camera-facing normals from central/one-sided differences with a 2cm
    z-continuity gate (ref CUDAImageUtil.cu:418-489 computeNormals_Kernel).
    Returns (H,W,3); invalid -> 0."""
    z_diff_thres = 0.02
    z = xyz[..., 2]
    CC = xyz
    # ref naming: PC=(y+1,x), CP=(y,x+1), MC=(y-1,x), CM=(y,x-1)
    PC = _shifted(xyz, 1, 0)
    CP = _shifted(xyz, 0, 1)
    MC = _shifted(xyz, -1, 0)
    CM = _shifted(xyz, 0, -1)

    def pick_dir(plus, minus):
        ok_p = (plus[..., 2] >= _VALID_MIN) & (jnp.abs(plus[..., 2] - z) <= z_diff_thres)
        ok_m = (minus[..., 2] >= _VALID_MIN) & (jnp.abs(minus[..., 2] - z) <= z_diff_thres)
        d_central = plus - minus
        d_fwd = plus - CC
        d_bwd = minus - CC
        d = jnp.where((ok_p & ok_m)[..., None], d_central,
                      jnp.where(ok_p[..., None], d_fwd,
                                jnp.where(ok_m[..., None], d_bwd, 0.0)))
        ok = ok_p | ok_m
        return d, ok

    x_dir, ok_x = pick_dir(PC, MC)
    y_dir, ok_y = pick_dir(CP, CM)
    n = jnp.cross(x_dir, y_dir)
    length = jnp.linalg.norm(n, axis=-1, keepdims=True)
    n = n / jnp.maximum(length, 1e-12)
    # orient toward camera
    flip = jnp.sum(n * (-CC), axis=-1, keepdims=True) < 0
    n = jnp.where(flip, -n, n)

    H, W = z.shape
    ys = jnp.arange(H)[:, None]
    xs = jnp.arange(W)[None, :]
    interior = (ys > 0) & (ys < H - 1) & (xs > 0) & (xs < W - 1)
    valid = interior & (z >= _VALID_MIN) & ok_x & ok_y & (length[..., 0] > 0.0)
    return jnp.where(valid[..., None], n, 0.0)


@jax.jit
def filter_depth_edges(depth, normal, K, angle_thres_rad):
    """Zero depth where the normal is near-perpendicular to the viewing ray
    (grazing surfaces / depth edges; ref CUDAImageUtil.cu:1066-1097)."""
    xyz = depth_to_xyz(depth, K)
    view = xyz / jnp.maximum(jnp.linalg.norm(xyz, axis=-1, keepdims=True), 1e-12)
    nrm = normal / jnp.maximum(jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-12)
    dot = jnp.clip(jnp.sum(nrm * view, axis=-1), -1.0, 1.0)
    angle = jnp.arccos(dot)
    edge = jnp.abs(angle - math.pi / 2.0) < angle_thres_rad
    return jnp.where((depth >= _VALID_MIN) & ~edge, depth, 0.0)


@functools.partial(jax.jit, static_argnames=("erode_radius", "bf_radius"))
def preprocess_depth_frame(depth, K, mask=None,
                           erode_radius=1, erode_diff=0.001, erode_ratio=0.8,
                           bf_radius=2, sigma_d=2.0, sigma_r=100000.0,
                           zfar=1.0, edge_angle_thres_rad=10.0 * math.pi / 180.0):
    """Full fused per-frame depth pipeline (ref Frame.cpp:24-334):
      erode -> bilateral x2 -> xyz -> normals -> edge filter -> xyz again,
      then optional foreground-mask invalidation (Frame.cpp:432-451).
    Returns (depth, xyz_map, normal_map), all (H,W[,3]) float32."""
    d = erode_depth(depth, radius=erode_radius, diff=erode_diff,
                    ratio=erode_ratio, zfar=zfar)
    d = bilateral_filter_depth(d, radius=bf_radius, sigma_d=sigma_d,
                               sigma_r=sigma_r, zfar=zfar)
    d = bilateral_filter_depth(d, radius=bf_radius, sigma_d=sigma_d,
                               sigma_r=sigma_r, zfar=zfar)
    xyz = depth_to_xyz(d, K)
    nrm = compute_normals(xyz)
    d = filter_depth_edges(d, nrm, K, edge_angle_thres_rad)
    if mask is not None:
        keep = mask > 0
        d = jnp.where(keep, d, 0.0)
        nrm = jnp.where(keep[..., None], nrm, 0.0)
    xyz = depth_to_xyz(d, K)
    nrm = jnp.where((d >= _VALID_MIN)[..., None], nrm, 0.0)
    return d, xyz, nrm


@functools.partial(jax.jit, static_argnames=("stride",))
def compute_covisibility(xyzA, normalA, validA, A_in_B, visible_angle_deg=70.0,
                         stride=2):
    """Fraction of frame A's valid points whose normals face camera B
    (ref Frame.h:122-165 computeCovisibility): transform A's cloud+normals by
    cur_in_kfcam = B_pose^-1 @ A_pose, count dot(-p_hat, n_hat) > cos(thres)."""
    xyz = xyzA[::stride, ::stride].reshape(-1, 3)
    nrm = normalA[::stride, ::stride].reshape(-1, 3)
    ok = validA[::stride, ::stride].reshape(-1)
    ok = ok & (jnp.linalg.norm(nrm, axis=-1) > 1e-6)
    R = A_in_B[:3, :3]
    t = A_in_B[:3, 3]
    p = xyz @ R.T + t
    n = nrm @ R.T
    p_hat = -p / jnp.maximum(jnp.linalg.norm(p, axis=-1, keepdims=True), 1e-12)
    n_hat = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    dot = jnp.sum(p_hat * n_hat, axis=-1)
    thres = jnp.cos(jnp.deg2rad(visible_angle_deg))
    vis = jnp.sum((dot > thres) & ok)
    total = jnp.sum(ok)
    return vis.astype(jnp.float32) / (total.astype(jnp.float32) + 1e-7)
