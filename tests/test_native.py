"""Native C++ library: build, parity with the Python fallbacks."""
import numpy as np
import pytest

import bundlesdf_tpu.native as nat
from bundlesdf_tpu.mesh import marching_tetrahedra
from bundlesdf_tpu.mesh.render import rasterize

pytestmark = pytest.mark.skipif(not nat.available(),
                                reason="native toolchain unavailable")


@pytest.fixture
def sphere():
    n = 32
    xs = np.linspace(-1, 1, n)
    X, Y, Z = np.meshgrid(xs, xs, xs, indexing="ij")
    return np.sqrt(X**2 + Y**2 + Z**2) - 0.6, n


def _force_python(monkeypatch):
    monkeypatch.setattr(nat, "_lib", None)
    monkeypatch.setattr(nat, "_tried", True)


def test_marching_parity(sphere, monkeypatch):
    sdf, n = sphere
    v1, f1 = marching_tetrahedra(sdf, 0.0)
    _force_python(monkeypatch)
    v2, f2 = marching_tetrahedra(sdf, 0.0)
    assert len(v1) == len(v2) and len(f1) == len(f2)
    r1 = np.sort(np.linalg.norm(v1, axis=1))
    r2 = np.sort(np.linalg.norm(v2, axis=1))
    np.testing.assert_allclose(r1, r2, atol=1e-9)
    # watertight
    e = np.sort(np.concatenate([f1[:, [0, 1]], f1[:, [1, 2]], f1[:, [2, 0]]]),
                axis=1)
    _, cnt = np.unique(e, axis=0, return_counts=True)
    assert (cnt == 2).all()


def test_rasterize_parity(sphere, monkeypatch):
    sdf, n = sphere
    v, f = marching_tetrahedra(sdf, 0.0)
    v = v * (2 / (n - 1)) - 1
    K = np.array([[100, 0, 64], [0, 100, 48], [0, 0, 1]], float)
    T = np.eye(4)
    T[2, 3] = 2.0
    outN = rasterize(v, f, K, T, 96, 128)
    _force_python(monkeypatch)
    outP = rasterize(v, f, K, T, 96, 128)
    # identical except triangle-edge tie-breaks
    agree = (outN["face_id"] == outP["face_id"]).mean()
    assert agree > 0.995
    hitN = outN["face_id"] >= 0
    hitP = outP["face_id"] >= 0
    assert (hitN == hitP).mean() > 0.999
    same = hitN & (outN["face_id"] == outP["face_id"])
    np.testing.assert_allclose(outN["depth"][same], outP["depth"][same],
                               atol=1e-4)
