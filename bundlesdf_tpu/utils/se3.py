"""SE(3)/SO(3) math in pure jnp (vmap/jit friendly).

Replaces the reference's pytorch3d `se3_exp_map` (nerf_helpers.py:15,150) and
the C++ Lie helpers (`BundleTrack/src/cuda/Solver/LieDerivUtil.h`,
`Utils.cpp:360-404`) with functional JAX equivalents. All functions accept a
single element and vmap cleanly; no data-dependent control flow.

Convention: `se3_exp(tau)` with tau = (trans[3], rot[3]) matches pytorch3d's
`se3_exp_map(...).permute(0,2,1)` use in the reference PoseArray
(nerf_helpers.py:150): the returned matrix is the standard row-major 4x4 with
translation in the last column, T = [[R, V@t],[0,1]].
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_EPS = 1e-8


def hat(w):
    """(...,3) -> (...,3,3) skew-symmetric."""
    zeros = jnp.zeros_like(w[..., 0])
    return jnp.stack([
        jnp.stack([zeros, -w[..., 2], w[..., 1]], axis=-1),
        jnp.stack([w[..., 2], zeros, -w[..., 0]], axis=-1),
        jnp.stack([-w[..., 1], w[..., 0], zeros], axis=-1),
    ], axis=-2)


def so3_exp(w):
    """Rodrigues. (...,3) axis-angle -> (...,3,3) rotation. Taylor-safe at 0."""
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    W = hat(w)
    W2 = W @ W
    s = jnp.sin(theta) / theta
    c = (1.0 - jnp.cos(theta)) / (theta2 + _EPS * _EPS)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + s[..., None, None] * W + c[..., None, None] * W2


def so3_log(R):
    """(...,3,3) -> (...,3) axis-angle. Stable away from pi."""
    cos = (jnp.trace(R, axis1=-2, axis2=-1) - 1.0) / 2.0
    cos = jnp.clip(cos, -1.0 + 1e-7, 1.0 - 1e-7)
    theta = jnp.arccos(cos)
    w = jnp.stack([
        R[..., 2, 1] - R[..., 1, 2],
        R[..., 0, 2] - R[..., 2, 0],
        R[..., 1, 0] - R[..., 0, 1],
    ], axis=-1)
    scale = theta / (2.0 * jnp.sin(theta) + _EPS)
    return w * scale[..., None]


def _so3_left_jacobian(w):
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    W = hat(w)
    W2 = W @ W
    a = (1.0 - jnp.cos(theta)) / (theta2 + _EPS * _EPS)
    b = (theta - jnp.sin(theta)) / (theta2 * theta + _EPS)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * W2


def se3_exp(tau):
    """(...,6) (trans, rot) -> (...,4,4)."""
    t, w = tau[..., :3], tau[..., 3:6]
    R = so3_exp(w)
    V = _so3_left_jacobian(w)
    trans = (V @ t[..., None])[..., 0]
    top = jnp.concatenate([R, trans[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=tau.dtype), top[..., :1, :].shape)
    return jnp.concatenate([top, bottom], axis=-2)


def se3_log(T):
    """(...,4,4) -> (...,6) (trans, rot)."""
    R = T[..., :3, :3]
    w = so3_log(R)
    V = _so3_left_jacobian(w)
    t = jnp.linalg.solve(V, T[..., :3, 3:4])[..., 0]
    return jnp.concatenate([t, w], axis=-1)


def geodesic_distance(R1, R2):
    """Rotation geodesic distance in radians (ref Utils.py:201-205)."""
    xp = jnp if not isinstance(R1, np.ndarray) else np
    cos = (xp.trace(R1 @ xp.swapaxes(R2, -1, -2)) - 1.0) / 2.0
    cos = xp.clip(cos, -1.0, 1.0)
    return xp.arccos(cos)


def rot_geodesic_ignore_cam_z(R1, R2):
    """Geodesic distance zeroing the rotation-around-camera-Z component
    (ref Utils.cpp:89-99). Used for keyframe rotation diversity.

    The reference converts R2*R1^-1 to axis-angle, zeroes axis.z,
    renormalizes the axis keeping the angle, and measures the resulting
    rotation's angle — which equals the original angle unless the axis was
    purely Z. We reproduce that exactly.
    """
    R = R2 @ jnp.swapaxes(R1, -1, -2)
    w = so3_log(R)  # axis * angle
    angle = jnp.linalg.norm(w, axis=-1)
    axis = w / (angle[..., None] + _EPS)
    axis = axis.at[..., 2].set(0.0) if hasattr(axis, "at") else axis
    norm = jnp.linalg.norm(axis, axis=-1)
    # if the axis was (0,0,1) the zeroed axis has norm 0 -> distance 0
    axis = axis / (norm[..., None] + _EPS)
    R_out = so3_exp(axis * angle[..., None])
    return geodesic_distance(R_out, jnp.eye(3, dtype=R_out.dtype)) * (norm > 1e-6)


def kabsch(src, dst, weights=None, power_iters: int = 50):
    """Least-squares rigid transform T s.t. T @ src ~= dst.

    Same problem as the reference's Umeyama SVD
    (ref Utils.cpp:360-404 solveRigidTransformBetweenPoints), solved with
    Horn's quaternion method (closed-form, eigh of a symmetric 4x4) instead:
    `jnp.linalg.svd` lowers to a host custom-call on this TPU stack (24s
    round trip through the tunnel per dispatch), while eigh is native; Horn
    also guarantees a proper rotation with no det fix-up.
    @src, @dst: (N,3). @weights: optional (N,) nonneg. Returns (4,4).
    vmap over leading axes for batched problems (replaces the per-trial CUDA
    procrustesKernel, cuda_ransac.cu:1368).
    """
    if weights is None:
        weights = jnp.ones(src.shape[:-1], dtype=src.dtype)
    wsum = jnp.sum(weights) + _EPS
    w = (weights / wsum)[..., None]
    mean1 = jnp.sum(src * w, axis=-2)
    mean2 = jnp.sum(dst * w, axis=-2)
    P = src - mean1
    Q = dst - mean2
    S = (P * w).swapaxes(-1, -2) @ Q  # 3x3 cross-covariance

    sxx, sxy, sxz = S[0, 0], S[0, 1], S[0, 2]
    syx, syy, syz = S[1, 0], S[1, 1], S[1, 2]
    szx, szy, szz = S[2, 0], S[2, 1], S[2, 2]
    N = jnp.array([
        [sxx + syy + szz, syz - szy, szx - sxz, sxy - syx],
        [syz - szy, sxx - syy - szz, sxy + syx, szx + sxz],
        [szx - sxz, sxy + syx, -sxx + syy - szz, syz + szy],
        [sxy - syx, szx + sxz, syz + szy, -sxx - syy + szz],
    ])
    # max eigenvector by shifted power iteration: batched eigh ALSO lowers
    # to a host custom-call on this stack (13s for 4000x4x4 vs 11ms here);
    # a 4x4 power iteration is pure VPU math and vmaps freely
    shift = jnp.sqrt(jnp.sum(N * N)) + _EPS
    K = N + shift * jnp.eye(4, dtype=N.dtype)
    q = jnp.array([1.0, 0.1, 0.2, 0.3], dtype=N.dtype)

    def _power(i, v):
        v = K @ v
        return v / (jnp.linalg.norm(v) + _EPS)

    q = jax.lax.fori_loop(0, power_iters, _power, q)
    qw, qx, qy, qz = q[0], q[1], q[2], q[3]
    R = jnp.array([
        [1 - 2 * (qy * qy + qz * qz), 2 * (qx * qy - qw * qz),
         2 * (qx * qz + qw * qy)],
        [2 * (qx * qy + qw * qz), 1 - 2 * (qx * qx + qz * qz),
         2 * (qy * qz - qw * qx)],
        [2 * (qx * qz - qw * qy), 2 * (qy * qz + qw * qx),
         1 - 2 * (qx * qx + qy * qy)],
    ])
    t = mean2 - (R @ mean1[..., None])[..., 0]
    T = jnp.eye(4, dtype=src.dtype)
    T = T.at[:3, :3].set(R)
    T = T.at[:3, 3].set(t)
    return T


kabsch_batched = jax.vmap(kabsch)


# ---------------------------------------------------------------------------
# NumPy twins for HOST-side small-matrix math. The jnp versions above
# dispatch to the default (TPU) backend — through the dev tunnel a single
# 3x3 geodesic costs a 10-35 ms round trip, and the tracker calls these in
# per-keyframe loops (round-2: a large share of the ~3 s/frame).
# ---------------------------------------------------------------------------

def rot_geodesic_ignore_cam_z_np(R1, R2):
    """NumPy twin of rot_geodesic_ignore_cam_z (ref Utils.cpp:89-99)."""
    from scipy.spatial.transform import Rotation

    R = np.asarray(R2) @ np.asarray(R1).T
    w = Rotation.from_matrix(R).as_rotvec()
    angle = np.linalg.norm(w)
    if angle < 1e-12:
        return 0.0
    axis = w / angle
    axis[2] = 0.0
    n = np.linalg.norm(axis)
    if n < 1e-6:  # pure cam-Z roll -> distance 0
        return 0.0
    return float(angle)


def kabsch_np(src, dst, weights=None):
    """NumPy twin of kabsch (Horn quaternion via eigh of the 4x4)."""
    src = np.asarray(src, np.float64)
    dst = np.asarray(dst, np.float64)
    if weights is None:
        weights = np.ones(src.shape[0])
    w = (weights / (weights.sum() + _EPS))[:, None]
    mean1 = (src * w).sum(axis=0)
    mean2 = (dst * w).sum(axis=0)
    P = src - mean1
    Q = dst - mean2
    S = (P * w).T @ Q
    sxx, sxy, sxz = S[0]
    syx, syy, syz = S[1]
    szx, szy, szz = S[2]
    N = np.array([
        [sxx + syy + szz, syz - szy, szx - sxz, sxy - syx],
        [syz - szy, sxx - syy - szz, sxy + syx, szx + sxz],
        [szx - sxz, sxy + syx, -sxx + syy - szz, syz + szy],
        [sxy - syx, szx + sxz, syz + szy, -sxx - syy + szz],
    ])
    vals, vecs = np.linalg.eigh(N)
    qw, qx, qy, qz = vecs[:, -1]
    R = np.array([
        [1 - 2 * (qy * qy + qz * qz), 2 * (qx * qy - qw * qz),
         2 * (qx * qz + qw * qy)],
        [2 * (qx * qy + qw * qz), 1 - 2 * (qx * qx + qz * qz),
         2 * (qy * qz - qw * qx)],
        [2 * (qx * qz - qw * qy), 2 * (qy * qz + qw * qx),
         1 - 2 * (qx * qx + qy * qy)],
    ])
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = mean2 - R @ mean1
    return T


def _hat_np(w):
    zeros = np.zeros_like(w[..., 0])
    return np.stack([
        np.stack([zeros, -w[..., 2], w[..., 1]], axis=-1),
        np.stack([w[..., 2], zeros, -w[..., 0]], axis=-1),
        np.stack([-w[..., 1], w[..., 0], zeros], axis=-1),
    ], axis=-2)


def se3_exp_np(tau):
    """NumPy twin of se3_exp for host-side pose math (the NOF pose
    sync-back runs per batch with a frame count that changes every batch;
    the jnp path would retrace + recompile per batch through the tunnel)."""
    tau = np.asarray(tau, np.float64)
    t, w = tau[..., :3], tau[..., 3:6]
    theta2 = np.sum(w * w, axis=-1)
    theta = np.sqrt(theta2 + _EPS * _EPS)
    W = _hat_np(w)
    W2 = W @ W
    s = (np.sin(theta) / theta)[..., None, None]
    c = ((1.0 - np.cos(theta)) / (theta2 + _EPS * _EPS))[..., None, None]
    R = np.eye(3) + s * W + c * W2
    b = ((theta - np.sin(theta)) / (theta2 * theta + _EPS))[..., None, None]
    V = np.eye(3) + c * W + b * W2
    T = np.zeros(tau.shape[:-1] + (4, 4))
    T[..., :3, :3] = R
    T[..., :3, 3] = (V @ t[..., None])[..., 0]
    T[..., 3, 3] = 1.0
    return T
