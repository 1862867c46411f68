"""Marching tetrahedra + mesh utilities."""
import numpy as np

from bundlesdf_tpu.mesh import Mesh, marching_tetrahedra


def _sphere_grid(n=40, r=0.6):
    xs = np.linspace(-1, 1, n)
    X, Y, Z = np.meshgrid(xs, xs, xs, indexing="ij")
    return np.sqrt(X**2 + Y**2 + Z**2) - r, xs


def test_sphere_surface_accuracy_and_watertight():
    sdf, xs = _sphere_grid()
    v, f = marching_tetrahedra(sdf, 0.0)
    assert len(v) > 100 and len(f) > 100
    v_w = v * (xs[1] - xs[0]) + xs[0]
    r = np.linalg.norm(v_w, axis=1)
    assert abs(r.mean() - 0.6) < 0.01
    assert r.std() < 0.01
    # watertight: every edge shared by exactly two faces
    edges = np.sort(np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]]),
                    axis=1)
    _, cnt = np.unique(edges, axis=0, return_counts=True)
    assert (cnt == 2).all()


def test_normals_point_outward():
    sdf, xs = _sphere_grid()
    v, f = marching_tetrahedra(sdf, 0.0)
    v_w = v * (xs[1] - xs[0]) + xs[0]
    m = Mesh(v_w, f)
    n = m.vertex_normals()
    outward = np.sum(n * (v_w / np.linalg.norm(v_w, axis=1, keepdims=True)),
                     axis=1)
    assert (outward > 0).mean() > 0.99


def test_empty_and_full_grids():
    v, f = marching_tetrahedra(np.ones((8, 8, 8)), 0.0)
    assert len(v) == 0 and len(f) == 0
    v, f = marching_tetrahedra(-np.ones((8, 8, 8)), 0.0)
    assert len(v) == 0 and len(f) == 0


def test_mesh_io_roundtrip(tmp_path):
    sdf, xs = _sphere_grid(n=16)
    v, f = marching_tetrahedra(sdf, 0.0)
    m = Mesh(v, f, vertex_colors=np.full((len(v), 3), 128, np.uint8))
    for ext in ("obj", "ply"):
        p = str(tmp_path / f"m.{ext}")
        m.export(p)
        m2 = Mesh.load(p)
        assert m2.vertices.shape == m.vertices.shape
        assert m2.faces.shape == m.faces.shape


def test_components_and_biggest():
    # two separated spheres
    xs = np.linspace(-1, 1, 40)
    X, Y, Z = np.meshgrid(xs, xs, xs, indexing="ij")
    s1 = np.sqrt((X + 0.5)**2 + Y**2 + Z**2) - 0.3
    s2 = np.sqrt((X - 0.55)**2 + Y**2 + Z**2) - 0.15
    v, f = marching_tetrahedra(np.minimum(s1, s2), 0.0)
    m = Mesh(v, f)
    comps = m.split_components()
    assert len(comps) == 2
    m.keep_biggest_component()
    assert len(m.vertices) == max(len(c.vertices) for c in comps)


def test_sample_surface():
    sdf, xs = _sphere_grid()
    v, f = marching_tetrahedra(sdf, 0.0)
    v_w = v * (xs[1] - xs[0]) + xs[0]
    pts = Mesh(v_w, f).sample_surface(5000)
    r = np.linalg.norm(pts, axis=1)
    assert abs(r.mean() - 0.6) < 0.02
