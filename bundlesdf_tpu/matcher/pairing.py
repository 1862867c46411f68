"""Frame-pair canonicalization for the matcher.

Re-implements `processImagePair` (FeatureManager.cpp:126-257): rotate frame
B into frame A's in-plane orientation (camera-Z component of the relative
rotation under current pose estimates), crop each foreground ROI with a
10px margin, scale both to a shared square `out_size`, and record the 3x3
pixel affines so matches map back to full-resolution coordinates.
"""
from __future__ import annotations

import cv2
import numpy as np


def mask_roi(mask, pad=0):
    """Bounding box of the foreground mask: (umin, umax, vmin, vmax)."""
    vs, us = np.nonzero(np.asarray(mask) > 0)
    if len(vs) == 0:
        H, W = np.asarray(mask).shape[:2]
        return np.array([0, W - 1, 0, H - 1])
    return np.array([max(us.min() - pad, 0), us.max() + pad,
                     max(vs.min() - pad, 0), vs.max() + pad])


def _rotate_image_transform(H, W, angle_rad):
    """In-plane rotation about the image center as a 3x3 pixel transform
    (ref Utils::getRotateImageTransform)."""
    c, s = np.cos(angle_rad), np.sin(angle_rad)
    cx, cy = W / 2.0, H / 2.0
    T1 = np.array([[1, 0, -cx], [0, 1, -cy], [0, 0, 1]], np.float64)
    R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float64)
    T2 = np.array([[1, 0, cx], [0, 1, cy], [0, 0, 1]], np.float64)
    return T2 @ R @ T1


def process_image_pair(imgA, imgB, roiA, roiB, poseA, poseB, out_size=400,
                       use_gray=True, margin=10):
    """@imgA/@imgB: (H,W[,3]) uint8. @roiA/@roiB: (4,) mask bboxes.
    @poseA/@poseB: current cam-in-model poses. Returns (outA, outB, tfA,
    tfB) with out* (out_size,out_size) and tf* the 3x3 full-res->crop pixel
    transforms."""
    H, W = np.asarray(imgB).shape[:2]
    tfA = np.eye(3)
    tfB = np.eye(3)

    # rotate B into A's in-plane orientation: z-component of axis-angle of
    # RA @ RB^-1 with R = pose[:3,:3].T (ob-in-cam rotations)
    RA = np.asarray(poseA)[:3, :3].T
    RB = np.asarray(poseB)[:3, :3].T
    R_BA = RA @ RB.T
    rvec, _ = cv2.Rodrigues(R_BA)
    tfB = _rotate_image_transform(H, W, float(rvec[2, 0])) @ tfB

    corners = np.array([[roiB[0], roiB[2], 1], [roiB[0], roiB[3], 1],
                        [roiB[1], roiB[2], 1], [roiB[1], roiB[3], 1]],
                       np.float64)
    tc = (tfB @ corners.T).T
    umin, vmin = tc[:, 0].min(), tc[:, 1].min()
    umax, vmax = tc[:, 0].max(), tc[:, 1].max()

    tA = np.eye(3)
    tA[0, 2] = -roiA[0] + margin
    tA[1, 2] = -roiA[2] + margin
    tfA = tA @ tfA
    tB = np.eye(3)
    tB[0, 2] = -umin + margin
    tB[1, 2] = -vmin + margin
    tfB = tB @ tfB

    WA = roiA[1] - roiA[0] + margin * 2
    HA = roiA[3] - roiA[2] + margin * 2
    WB = umax - umin + margin * 2
    HB = vmax - vmin + margin * 2
    max_dim = max(WA, HA, WB, HB)
    sA = np.eye(3)
    sA[:2, :2] *= max_dim / max(WA, HA)
    tfA = sA @ tfA
    sB = np.eye(3)
    sB[:2, :2] *= max_dim / max(WB, HB)
    tfB = sB @ tfB
    so = np.eye(3)
    so[:2, :2] *= out_size / max_dim
    tfA = so @ tfA
    tfB = so @ tfB

    def warp(img, tf):
        if use_gray and img.ndim == 3:
            img = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)
        return cv2.warpPerspective(np.asarray(img), tf.astype(np.float32),
                                   (out_size, out_size))

    return warp(imgA, tfA), warp(imgB, tfB), tfA, tfB


def map_matches_back(uv_matches, tfA, tfB):
    """Map (N,>=4) [uA,vA,uB,vB,...] crop-space matches back to full-res
    pixels via the inverse affines (ref bundlesdf.py:364-368)."""
    if len(uv_matches) == 0:
        return uv_matches
    out = np.array(uv_matches, np.float64).copy()
    invA = np.linalg.inv(tfA)
    invB = np.linalg.inv(tfB)

    def apply(uv, T):
        homo = np.concatenate([uv, np.ones((len(uv), 1))], axis=-1)
        p = homo @ T.T
        return p[:, :2] / p[:, 2:3]

    out[:, 0:2] = apply(out[:, 0:2], invA)
    out[:, 2:4] = apply(out[:, 2:4], invB)
    return out
