import jax
import jax.numpy as jnp
import numpy as np

from bundlesdf_tpu.utils import se3


def random_rotation(rng):
    A = rng.standard_normal((3, 3))
    Q, _ = np.linalg.qr(A)
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    return Q


def test_exp_log_roundtrip():
    rng = np.random.default_rng(0)
    tau = rng.standard_normal((8, 6)) * 0.5
    T = se3.se3_exp(jnp.asarray(tau))
    tau2 = se3.se3_log(T)
    np.testing.assert_allclose(np.asarray(tau2), tau, atol=1e-4)


def test_exp_zero_is_identity():
    T = se3.se3_exp(jnp.zeros(6))
    np.testing.assert_allclose(np.asarray(T), np.eye(4), atol=1e-5)


def test_so3_exp_matches_rodrigues():
    import cv2
    rng = np.random.default_rng(1)
    for _ in range(5):
        w = rng.standard_normal(3)
        R_cv, _ = cv2.Rodrigues(w)
        R = np.asarray(se3.so3_exp(jnp.asarray(w)))
        np.testing.assert_allclose(R, R_cv, atol=1e-5)


def test_kabsch_recovers_transform():
    rng = np.random.default_rng(2)
    R = random_rotation(rng)
    t = rng.standard_normal(3) * 0.1
    src = rng.standard_normal((50, 3))
    dst = src @ R.T + t
    T = np.asarray(se3.kabsch(jnp.asarray(src, jnp.float32), jnp.asarray(dst, jnp.float32)))
    np.testing.assert_allclose(T[:3, :3], R, atol=1e-4)
    np.testing.assert_allclose(T[:3, 3], t, atol=1e-4)


def test_kabsch_batched():
    rng = np.random.default_rng(3)
    Ts = []
    srcs, dsts = [], []
    for _ in range(4):
        R = random_rotation(rng)
        t = rng.standard_normal(3) * 0.1
        src = rng.standard_normal((20, 3))
        srcs.append(src)
        dsts.append(src @ R.T + t)
        T = np.eye(4)
        T[:3, :3] = R
        T[:3, 3] = t
        Ts.append(T)
    out = np.asarray(se3.kabsch_batched(jnp.asarray(np.array(srcs), jnp.float32),
                                        jnp.asarray(np.array(dsts), jnp.float32)))
    np.testing.assert_allclose(out, np.array(Ts), atol=1e-4)


def test_geodesic_distance():
    w = np.array([0.0, 0.3, 0.0])
    R = np.asarray(se3.so3_exp(jnp.asarray(w)))
    d = float(se3.geodesic_distance(jnp.asarray(R), jnp.eye(3)))
    assert abs(d - 0.3) < 1e-5


def test_rot_geodesic_ignore_cam_z():
    # pure rotation around camera z -> distance ~ 0
    wz = jnp.asarray(np.array([0.0, 0.0, 0.4]))
    Rz = se3.so3_exp(wz)
    d = float(se3.rot_geodesic_ignore_cam_z(jnp.eye(3), Rz))
    assert d < 1e-3
    # rotation around x keeps its angle
    wx = jnp.asarray(np.array([0.4, 0.0, 0.0]))
    Rx = se3.so3_exp(wx)
    d = float(se3.rot_geodesic_ignore_cam_z(jnp.eye(3), Rx))
    assert abs(d - 0.4) < 1e-3


def test_kabsch_jit_and_grad():
    src = jnp.asarray(np.random.default_rng(4).standard_normal((10, 3)), jnp.float32)
    dst = src + 0.05

    def loss(s):
        T = se3.kabsch(s, dst)
        return jnp.sum((se3.se3_log(T)) ** 2)

    g = jax.grad(loss)(src)
    assert np.all(np.isfinite(np.asarray(g)))
