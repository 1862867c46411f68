"""Rasterizer + texture baking."""
import numpy as np

from synthetic import cube_orbit_sequence

from bundlesdf_tpu.mesh import Mesh, marching_tetrahedra
from bundlesdf_tpu.mesh.render import rasterize, render_color
from bundlesdf_tpu.mesh.texture import (bake_texture, unwrap_charted_atlas,
                                        unwrap_trivial_atlas)
from bundlesdf_tpu.utils.common import GLCAM_IN_CVCAM


def _cube_mesh(half=0.08):
    xs = np.linspace(-1.5 * half, 1.5 * half, 24)
    X, Y, Z = np.meshgrid(xs, xs, xs, indexing="ij")
    sdf = np.maximum.reduce([np.abs(X), np.abs(Y), np.abs(Z)]) - half
    v, f = marching_tetrahedra(sdf, 0)
    return Mesh(v * (xs[1] - xs[0]) + xs[0], f)


def test_rasterize_matches_synthetic_depth():
    seq = cube_orbit_sequence(n_frames=1, H=80, W=100, radius=0.45,
                              obj_size=0.08)
    mesh = _cube_mesh()
    ob_in_cam = np.linalg.inv(seq["cam_in_obs"][0])
    ras = rasterize(mesh.vertices, mesh.faces, seq["K"], ob_in_cam, 80, 100)
    hit = ras["face_id"] >= 0
    assert hit.sum() > 100
    both = hit & (seq["depths"][0] > 0.1)
    diff = np.abs(ras["depth"] - seq["depths"][0])[both]
    assert np.median(diff) < 2e-3
    # barycentrics sum to 1 on hits
    s = ras["bary"][hit].sum(-1)
    np.testing.assert_allclose(s, 1.0, atol=1e-5)


def test_unwrap_atlas_uv_in_unit_square():
    mesh = _cube_mesh()
    t = unwrap_trivial_atlas(mesh, tex_res=512)
    assert t.uv.shape == (3 * len(mesh.faces), 2)
    assert (t.uv >= 0).all() and (t.uv <= 1).all()
    # every face keeps its geometry
    np.testing.assert_allclose(t.vertices[t.faces],
                               mesh.vertices[mesh.faces], atol=1e-12)


def _uv_coverage(t, res):
    """Rasterize UV triangles onto a res x res grid; returns per-texel
    triangle counts (interior-only, so shared edges don't double count)."""
    count = np.zeros((res, res), np.int32)
    uv = t.uv * res
    for tri in t.faces:
        p = uv[tri]  # (3,2)
        lo = np.floor(p.min(0)).astype(int)
        hi = np.ceil(p.max(0)).astype(int)
        xs = np.arange(max(lo[0], 0), min(hi[0], res))
        ys = np.arange(max(lo[1], 0), min(hi[1], res))
        if not len(xs) or not len(ys):
            continue
        X, Y = np.meshgrid(xs + 0.5, ys + 0.5)
        d = np.stack([X, Y], -1) - p[0]
        e1, e2 = p[1] - p[0], p[2] - p[0]
        det = e1[0] * e2[1] - e1[1] * e2[0]
        if abs(det) < 1e-12:
            continue
        a = (d[..., 0] * e2[1] - d[..., 1] * e2[0]) / det
        b = (e1[0] * d[..., 1] - e1[1] * d[..., 0]) / det
        inside = (a > 1e-6) & (b > 1e-6) & (a + b < 1 - 1e-6)
        count[np.ix_(ys, xs)] += inside.astype(np.int32)
    return count


def test_charted_atlas_utilization_and_no_overlap():
    """VERDICT #8 acceptance: texel utilization > 50% on the cube fixture,
    charts never overlap, geometry is preserved per face."""
    mesh = _cube_mesh()
    res = 256
    t = unwrap_charted_atlas(mesh, tex_res=res)
    assert (t.uv >= 0).all() and (t.uv <= 1).all()
    np.testing.assert_allclose(
        np.sort(t.vertices[t.faces], axis=0),
        np.sort(mesh.vertices[mesh.faces], axis=0), atol=1e-12)
    cov = _uv_coverage(t, res)
    assert (cov > 1).mean() < 1e-3  # no chart overlap
    assert (cov > 0).mean() > 0.5   # >50% texel utilization
    assert len(t.faces) == len(mesh.faces)


def test_bake_texture_colors_from_views():
    seq = cube_orbit_sequence(n_frames=3, H=80, W=100, radius=0.45,
                              obj_size=0.08)
    mesh = _cube_mesh()
    glcam = seq["cam_in_obs"] @ GLCAM_IN_CVCAM
    tex_mesh = bake_texture(mesh, seq["colors"], seq["masks"], glcam,
                            seq["K"], tex_res=256)
    assert tex_mesh.texture.shape == (256, 256, 3)
    baked = (tex_mesh.texture != 128).any(-1)
    assert baked.mean() > 0.01
    # baked colors should be reddish (main cube color 200,60,60)
    reds = tex_mesh.texture[baked]
    assert reds[:, 0].mean() > reds[:, 2].mean()


def test_render_color_runs():
    seq = cube_orbit_sequence(n_frames=1, H=60, W=80)
    mesh = _cube_mesh()
    img, depth = render_color(mesh, seq["K"],
                              np.linalg.inv(seq["cam_in_obs"][0]), 60, 80)
    assert (img.sum(-1) > 0).sum() > 50
