"""Shared constants and geometry helpers (host + device).

Parity notes: sentinels and conventions follow the reference
(`Utils.py:34-40`, `Utils.py:219-257`), rebuilt for jnp/numpy duality.
"""
from __future__ import annotations

import logging
import random

import numpy as np

# Sentinel values used when masking out pixels before NOF training
# (ref Utils.py:34-35).
BAD_DEPTH = 99.0
BAD_COLOR = 128

# OpenGL camera expressed in OpenCV camera (ref Utils.py:37-40).
GLCAM_IN_CVCAM = np.array(
    [[1, 0, 0, 0],
     [0, -1, 0, 0],
     [0, 0, -1, 0],
     [0, 0, 0, 1]], dtype=np.float64)


def set_seed(seed: int) -> None:
    """Determinism control (ref Utils.py:71-78). JAX randomness is keyed
    explicitly, so only python/numpy global state needs seeding here."""
    np.random.seed(seed)
    random.seed(seed)


def set_logging_format(level=logging.INFO):
    importer_format = "[%(asctime)s %(filename)s:%(lineno)d] %(message)s"
    logging.basicConfig(level=level, format=importer_format, datefmt="%H:%M:%S")


def to_homo(pts):
    """(N,D) -> (N,D+1) with a 1 appended (ref Utils.py:235-241)."""
    xp = _xp(pts)
    return xp.concatenate([pts, xp.ones_like(pts[..., :1])], axis=-1)


def transform_pts(pts, tf):
    """Apply (...,4,4) (or 3x3 homography) transforms to (...,D) points
    (ref Utils.py:253-257)."""
    return (tf[..., :-1, :-1] @ pts[..., None] + tf[..., :-1, -1:])[..., 0]


def depth2xyzmap(depth, K):
    """Depth image -> camera-space xyz map; invalid (<0.1) pixels -> 0
    (ref Utils.py:219-232). Works on numpy or jnp arrays."""
    xp = _xp(depth)
    H, W = depth.shape[:2]
    us = xp.arange(W, dtype=depth.dtype)[None, :]
    vs = xp.arange(H, dtype=depth.dtype)[:, None]
    zs = depth
    xs = (us - K[0, 2]) * zs / K[0, 0]
    ys = (vs - K[1, 2]) * zs / K[1, 1]
    xyz = xp.stack([xs, ys, zs], axis=-1)
    invalid = depth < 0.1
    return xp.where(invalid[..., None], xp.zeros_like(xyz), xyz)


def geodesic_distance_np(R1, R2):
    """Rotation geodesic distance in radians, host numpy
    (ref Utils.py:201-205)."""
    cos = (np.trace(R1 @ R2.T) - 1.0) / 2.0
    return float(np.arccos(np.clip(cos, -1.0, 1.0)))


def _xp(arr):
    """numpy/jnp duality: dispatch on the array's module."""
    if isinstance(arr, np.ndarray):
        return np
    import jax.numpy as jnp

    return jnp
