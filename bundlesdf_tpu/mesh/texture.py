"""Texture baking: UV atlas + per-frame color projection.

Replaces `mesh_texture_from_train_images` (nerf_runner.py:1468-1542): the
reference unwraps with xatlas, renders visibility with pyrender, finds
mesh-closest points with trimesh and scatters colors to UV with a CUDA
kernel. Here: a trivial per-face right-triangle atlas (xatlas is not in the
image), visibility + barycentric UVs straight from the software rasterizer
(mesh/render.py), numpy scatter-add accumulation.
"""
from __future__ import annotations

import logging

import numpy as np

from bundlesdf_tpu.mesh.core import Mesh
from bundlesdf_tpu.mesh.render import rasterize
from bundlesdf_tpu.utils.common import GLCAM_IN_CVCAM


def unwrap_trivial_atlas(mesh: Mesh, tex_res: int = 1024, pad: float = 1.0):
    """Assign each face its own right triangle in a regular texture grid.
    Vertices are duplicated per face (3F vertices). Returns a new Mesh with
    `uv` in [0,1]^2 (v up, OBJ convention)."""
    F = len(mesh.faces)
    # 2 triangles per grid cell
    n_cells = (F + 1) // 2
    grid = int(np.ceil(np.sqrt(n_cells)))
    cell = tex_res / grid
    p = pad / tex_res

    verts = mesh.vertices[mesh.faces].reshape(-1, 3)  # (3F,3)
    faces = np.arange(3 * F, dtype=np.int64).reshape(F, 3)
    uv = np.zeros((3 * F, 2))
    cells = np.arange(F) // 2
    lower = np.arange(F) % 2 == 0
    cx = (cells % grid) * cell / tex_res
    cy = (cells // grid) * cell / tex_res
    s = cell / tex_res
    # lower-left triangle / upper-right triangle of the cell, with padding
    for i in range(F):
        x0, y0 = cx[i] + p, cy[i] + p
        x1, y1 = cx[i] + s - p, cy[i] + s - p
        if lower[i]:
            tri = [(x0, y0), (x1, y0), (x0, y1)]
        else:
            tri = [(x1, y1), (x0, y1), (x1, y0)]
        uv[3 * i:3 * i + 3] = tri
    return Mesh(verts, faces, uv=uv)


def bake_texture(mesh: Mesh, rgbs_raw, masks, glcam_in_obs, K,
                 pose_corrections=None, tex_res: int = 1024,
                 min_view_dot: float = 0.0):
    """Bake per-frame colors into a texture image.

    @mesh: in the SAME (normalized or real) space as @glcam_in_obs poses.
    @rgbs_raw: (F,H,W,3) uint8 full images; @masks: (F,H,W) bool/uint8.
    @glcam_in_obs: (F,4,4) GL cam-to-object. Returns textured Mesh (with
    .uv and .texture set).
    """
    tex_mesh = unwrap_trivial_atlas(mesh, tex_res)
    Htex = Wtex = tex_res
    acc = np.zeros((Htex, Wtex, 3), np.float64)
    wacc = np.zeros((Htex, Wtex), np.float64)
    H, W = np.asarray(rgbs_raw[0]).shape[:2]

    fn = np.cross(
        tex_mesh.vertices[tex_mesh.faces[:, 1]] - tex_mesh.vertices[tex_mesh.faces[:, 0]],
        tex_mesh.vertices[tex_mesh.faces[:, 2]] - tex_mesh.vertices[tex_mesh.faces[:, 0]])
    fn /= np.maximum(np.linalg.norm(fn, axis=-1, keepdims=True), 1e-12)

    for i in range(len(rgbs_raw)):
        tf = np.asarray(glcam_in_obs[i])
        if pose_corrections is not None:
            tf = np.asarray(pose_corrections[i]) @ tf
        cvcam_in_ob = tf @ np.linalg.inv(GLCAM_IN_CVCAM)
        ob_in_cam = np.linalg.inv(cvcam_in_ob)
        ras = rasterize(tex_mesh.vertices, tex_mesh.faces, K, ob_in_cam, H, W)
        fid = ras["face_id"]
        valid = (fid >= 0) & (np.asarray(masks[i]) > 0)
        if not valid.any():
            continue
        vs, us = np.nonzero(valid)
        f = fid[vs, us]
        b = ras["bary"][vs, us]  # (N,3)
        uv_face = tex_mesh.uv[tex_mesh.faces[f]]  # (N,3,2)
        uv = np.einsum("nc,ncd->nd", b, uv_face)  # (N,2) in [0,1]
        tx = np.clip(np.round(uv[:, 0] * (Wtex - 1)).astype(int), 0, Wtex - 1)
        ty = np.clip(np.round(uv[:, 1] * (Htex - 1)).astype(int), 0, Htex - 1)
        colors = np.asarray(rgbs_raw[i])[vs, us].astype(np.float64)
        # view-angle weight
        view = -(ob_in_cam[:3, :3] @ fn[f].T).T[:, 2]
        w = np.clip(view, min_view_dot, None)
        np.add.at(acc, (ty, tx), colors * w[:, None])
        np.add.at(wacc, (ty, tx), w)
        logging.debug(f"bake frame {i}: {valid.sum()} px")

    tex = np.zeros((Htex, Wtex, 3), np.uint8)
    got = wacc > 0
    tex[got] = np.clip(acc[got] / wacc[got][:, None], 0, 255).astype(np.uint8)
    # fill unbaked texels with a neutral gray for clean rendering
    tex[~got] = 128
    # texture images use v-up: flip rows (ref nerf_runner.py:1539)
    tex_mesh.texture = tex[::-1].copy()
    return tex_mesh
