"""Evaluation metrics: ADD/ADD-S, AUC, chamfer, ICP."""
import numpy as np

from bundlesdf_tpu.eval import (add_err, adi_err, chamfer_distance_mutual,
                                compute_auc, icp_point_to_point)
from bundlesdf_tpu.utils.se3 import se3_exp
import jax.numpy as jnp


def test_add_adi_zero_for_identical_poses():
    pts = np.random.default_rng(0).uniform(-0.1, 0.1, (500, 3))
    T = np.eye(4)
    T[:3, 3] = [0.1, 0.2, 0.3]
    assert add_err(T, T, pts) < 1e-12
    assert adi_err(T, T, pts) < 1e-12


def test_add_ge_adi():
    rng = np.random.default_rng(1)
    pts = rng.uniform(-0.1, 0.1, (300, 3))
    T1 = np.eye(4)
    T2 = np.asarray(se3_exp(jnp.asarray([0.01, 0.0, 0.0, 0.0, 0.3, 0.0])))
    assert adi_err(T1, T2, pts) <= add_err(T1, T2, pts) + 1e-9


def test_compute_auc_known_values():
    # all errors zero -> AUC = 1
    assert abs(compute_auc(np.zeros(10)) - 1.0) < 1e-6
    # all errors beyond max -> AUC = 0
    assert compute_auc(np.full(10, 0.5)) == 0
    # uniform errors over [0, 0.1] -> AUC ~ 0.5
    auc = compute_auc(np.linspace(0, 0.0999, 1000))
    assert 0.45 < auc < 0.55


def test_chamfer_and_icp():
    rng = np.random.default_rng(2)
    pts = rng.uniform(-0.1, 0.1, (2000, 3))
    assert chamfer_distance_mutual(pts, pts) < 1e-12
    T_gt = np.asarray(se3_exp(jnp.asarray([0.005, -0.003, 0.004,
                                           0.02, 0.01, -0.015])))
    moved = pts @ T_gt[:3, :3].T + T_gt[:3, 3]
    T = icp_point_to_point(pts, moved, max_dist=0.05)
    np.testing.assert_allclose(T, np.asarray(T_gt), atol=1e-3)
    back = pts @ T[:3, :3].T + T[:3, 3]
    assert chamfer_distance_mutual(back, moved) < 1e-4
