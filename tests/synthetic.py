"""Synthetic RGBD cube-orbit generator — fixture substitute for the milk-jug
demo (the reference ships no test data; SURVEY.md §4)."""
from __future__ import annotations

import numpy as np


def look_at(eye, target, up=(0, -1, 0)):
    """cam-to-world (OpenCV convention: +z forward, +y down)."""
    eye = np.asarray(eye, dtype=np.float64)
    target = np.asarray(target, dtype=np.float64)
    z = target - eye
    z /= np.linalg.norm(z)
    up = np.asarray(up, dtype=np.float64)
    x = np.cross(up, z)
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    T = np.eye(4)
    T[:3, 0] = x
    T[:3, 1] = y
    T[:3, 2] = z
    T[:3, 3] = eye
    return T


def render_boxes_depth(cam_in_world, K, H, W, boxes):
    """Tiny CPU ray-marcher against a union of axis-aligned boxes.
    @boxes: list of (center(3), half(3), color(3 uint8)).
    Returns color (H,W,3) uint8, depth (H,W) float32 (z-depth), mask (H,W) uint8."""
    us, vs = np.meshgrid(np.arange(W), np.arange(H))
    dirs = np.stack([(us - K[0, 2]) / K[0, 0], (vs - K[1, 2]) / K[1, 1],
                     np.ones_like(us, dtype=np.float64)], axis=-1)
    R = cam_in_world[:3, :3]
    o = cam_in_world[:3, 3]
    dirs_w = dirs @ R.T
    depth = np.full((H, W), np.inf)
    color = np.zeros((H, W, 3), np.uint8)
    for center, half, col in boxes:
        center = np.asarray(center, dtype=np.float64)
        half = np.asarray(half, dtype=np.float64)
        inv = 1.0 / np.where(np.abs(dirs_w) < 1e-12, 1e-12, dirs_w)
        t0 = (center - half - o) * inv
        t1 = (center + half - o) * inv
        tmin = np.minimum(t0, t1).max(axis=-1)
        tmax = np.maximum(t0, t1).min(axis=-1)
        hit = (tmax > np.maximum(tmin, 0.0))
        t = np.where(hit, tmin, np.inf)
        z = t * dirs[..., 2]  # z-depth along optical axis
        closer = z < depth
        upd = hit & closer
        depth = np.where(upd, z, depth)
        # cheap shading: color modulated by hit-face
        t_safe = np.where(np.isfinite(t), t, 0.0)
        pts = o + t_safe[..., None] * dirs_w
        rel = (pts - center) / half
        face = np.argmax(np.abs(rel), axis=-1)
        shade = np.take(np.array([1.0, 0.82, 0.65]), face)
        # procedural checkerboard + speckle texture on each face so feature
        # matchers (ORB/LoFTR) have corners to latch onto
        uv_ax = np.stack([(face + 1) % 3, (face + 2) % 3], axis=-1)
        fu = np.take_along_axis(rel, uv_ax[..., :1], axis=-1)[..., 0]
        fv = np.take_along_axis(rel, uv_ax[..., 1:], axis=-1)[..., 0]
        checker = ((np.floor(fu * 6) + np.floor(fv * 6)) % 2)
        speckle = 0.5 + 0.5 * np.sin(37.0 * fu + 61.0 * fv * fu + 13.0 * fv)
        shade = shade * (0.55 + 0.3 * checker + 0.15 * speckle)
        # face-unique glyph constellation OVER the (unchanged) base
        # texture: dark dots at positions unique to each SIGNED face.
        # The base texture is near-symmetric under 90-deg cube rotations,
        # which made post-occlusion relocalization after a blind rotation
        # information-theoretically ambiguous (round 4 measured every
        # A/B arm recover into the same self-consistent 90-deg flip) —
        # the occluder benchmark was scoring the fixture, not the
        # pipeline. Dots are 0.16 half-width in face UV (resolve from
        # ~200p up; at 90x120 they just add a couple of corners).
        sgn = np.take_along_axis(rel, face[..., None], axis=-1)[..., 0] < 0
        face_id = face * 2 + sgn.astype(np.int64)
        glyph_uv = np.array([   # (6 faces, 2 dots, 2 uv) in [-1,1]
            [[-0.55, -0.55], [0.55, 0.55]],
            [[-0.55, 0.55], [0.55, -0.55]],
            [[0.0, -0.55], [0.0, 0.55]],
            [[-0.55, 0.0], [0.55, 0.0]],
            [[-0.55, -0.55], [-0.55, 0.55]],
            [[0.55, -0.55], [0.55, 0.55]],
        ])
        g = glyph_uv[face_id]                     # (H,W,2,2)
        hit_g = (np.maximum(np.abs(fu[..., None] - g[..., 0]),
                            np.abs(fv[..., None] - g[..., 1]))
                 < 0.16).any(axis=-1)
        shade = np.where(hit_g, shade * 0.25, shade)
        for c in range(3):
            ch = np.clip(col[c] * shade, 0, 255).astype(np.uint8)
            color[..., c] = np.where(upd, ch, color[..., c])
    mask = np.isfinite(depth).astype(np.uint8)
    depth = np.where(np.isfinite(depth), depth, 0.0).astype(np.float32)
    return color, depth, mask


def cube_orbit_sequence(n_frames=12, H=120, W=160, radius=0.45, obj_size=0.08,
                        full_angle=2 * np.pi, noise=0.0, seed=0):
    """Camera orbits a textured cube cluster at the origin.
    Returns dict with colors, depths, masks, K, cam_in_obs (cv convention,
    cam-to-object), id_strs."""
    rng = np.random.default_rng(seed)
    f = 0.9 * max(H, W)
    K = np.array([[f, 0, W / 2.0], [0, f, H / 2.0], [0, 0, 1]], dtype=np.float64)
    s = obj_size
    boxes = [
        ((0, 0, 0), (s, s, s), (200, 60, 60)),
        ((s * 0.9, 0, s * 0.9), (s * 0.45, s * 0.45, s * 0.45), (60, 200, 60)),
        ((-s * 0.8, s * 0.7, 0), (s * 0.35, s * 0.35, s * 0.35), (60, 60, 220)),
    ]
    colors, depths, masks, poses, ids = [], [], [], [], []
    for i in range(n_frames):
        ang = full_angle * i / n_frames
        eye = np.array([radius * np.sin(ang), -0.12, radius * np.cos(ang)])
        cam_in_ob = look_at(eye, (0, 0, 0))
        color, depth, mask = render_boxes_depth(cam_in_ob, K, H, W, boxes)
        if noise > 0:
            depth = depth + (rng.standard_normal(depth.shape) * noise * mask).astype(np.float32)
        colors.append(color)
        depths.append(depth)
        masks.append(mask)
        poses.append(cam_in_ob)
        ids.append(f"{i:04d}")
    return {
        "colors": np.array(colors),
        "depths": np.array(depths),
        "masks": np.array(masks),
        "K": K,
        "cam_in_obs": np.array(poses),
        "id_strs": ids,
    }


def cube_translation_sequence(n_frames=12, H=120, W=160, z_dist=0.45,
                              obj_size=0.08, sweep=0.30, noise=0.0, seed=0):
    """Translation-dominant stress sequence: the camera slides laterally
    past the cube cluster at FIXED orientation (look direction constant),
    so the object translates across the image with near-zero rotation.
    Stresses the in-image-plane directions where projective association
    taps shift every frame, complementing the rotation-dominant orbit —
    the second stress geometry for BA-schedule A/Bs (round-4 verdict
    item 5)."""
    rng = np.random.default_rng(seed)
    f = 0.9 * max(H, W)
    K = np.array([[f, 0, W / 2.0], [0, f, H / 2.0], [0, 0, 1]],
                 dtype=np.float64)
    s = obj_size
    boxes = [
        ((0, 0, 0), (s, s, s), (200, 60, 60)),
        ((s * 0.9, 0, s * 0.9), (s * 0.45, s * 0.45, s * 0.45), (60, 200, 60)),
        ((-s * 0.8, s * 0.7, 0), (s * 0.35, s * 0.35, s * 0.35), (60, 60, 220)),
    ]
    colors, depths, masks, poses, ids = [], [], [], [], []
    for i in range(n_frames):
        t = i / max(n_frames - 1, 1)
        x = sweep * (t - 0.5)
        eye = np.array([x, -0.12, z_dist])
        # constant view direction: target rides WITH the eye, so the
        # rotation is identical in every frame (pure translation)
        cam_in_ob = look_at(eye, (x, 0, 0))
        color, depth, mask = render_boxes_depth(cam_in_ob, K, H, W, boxes)
        if noise > 0:
            depth = depth + (rng.standard_normal(depth.shape) * noise
                             * mask).astype(np.float32)
        colors.append(color)
        depths.append(depth)
        masks.append(mask)
        poses.append(cam_in_ob)
        ids.append(f"{i:04d}")
    return {
        "colors": np.array(colors),
        "depths": np.array(depths),
        "masks": np.array(masks),
        "K": K,
        "cam_in_obs": np.array(poses),
        "id_strs": ids,
    }


def add_occluder(seq, start_frac=0.35, end_frac=0.65, width_frac=0.45,
                 occ_depth=0.22, color=(90, 90, 90)):
    """Sweep a screen-space occluder strip across the view for the middle
    segment of a sequence (in place). Models a hand/object passing in
    front of the target: occluded pixels get the occluder's color+depth,
    leave the foreground mask, and are flagged in per-frame occ_masks
    (the HO3D masks_hand semantics). Mid-sweep frames lose most of the
    object, driving the tracker's FAIL cascade + relocalization.

    Returns the mutated seq with an added "occ_masks" (N,H,W) uint8.
    """
    colors = seq["colors"]
    depths = seq["depths"]
    masks = seq["masks"]
    n, H, W = masks.shape[:3]
    occ_masks = np.zeros((n, H, W), np.uint8)
    t0 = int(round(start_frac * n))
    t1 = int(round(end_frac * n))
    us = np.arange(W)[None, :]
    for i in range(t0, min(t1, n)):
        prog = (i - t0) / max(t1 - t0 - 1, 1)
        center = (0.1 + 0.8 * prog) * W
        # mid-sweep the occluder covers the whole view (total occlusion):
        # guarantees FAIL frames so the benchmark exercises the cascade +
        # re-localization, not just partial-occlusion robustness
        half = width_frac * W / 2.0
        if abs(prog - 0.5) < 0.15:
            half = W
        strip = np.broadcast_to(np.abs(us - center) < half, (H, W))
        occ_masks[i] = strip.astype(np.uint8)
        colors[i][strip] = color
        depths[i][strip] = occ_depth
        masks[i][strip] = 0
    seq["occ_masks"] = occ_masks
    return seq
