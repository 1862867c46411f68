"""Dense photometric BA term (BAConfig.w_dense_color — reference parity
with SolverBundling.cu:236-257 dense color residual; SBA.cu:170 weight
defaults 0).

Fixture built so the depth term is BLIND to the error: a fronto-parallel
flat plane constrains only z/tilt through point-to-plane, so an in-plane
translation offset survives p2p BA untouched — only the intensity term
can see the texture slide."""
import jax.numpy as jnp
import numpy as np
import pytest

from bundlesdf_tpu.tracker.ba import BAConfig, bundle_adjust

H, W = 64, 64
FX = FY = 80.0
CX, CY = W / 2 - 0.5, H / 2 - 0.5
Z0 = 0.5


def _texture(x, y):
    """Smooth world-anchored intensity (bilinear-friendly)."""
    return (0.5 + 0.25 * np.sin(2 * np.pi * x / 0.04)
            + 0.25 * np.cos(2 * np.pi * y / 0.05)).astype(np.float32)


def _render(cam_in_world):
    """Pinhole view of the textured plane z_world = Z0 (camera axes ==
    world axes, camera at cam_in_world[:3,3])."""
    t = cam_in_world[:3, 3]
    us, vs = np.meshgrid(np.arange(W), np.arange(H))
    zc = Z0 - t[2]
    xc = (us - CX) / FX * zc
    yc = (vs - CY) / FY * zc
    xw, yw = xc + t[0], yc + t[1]
    grey = _texture(xw, yw)
    xyz = np.stack([xc, yc, np.full_like(xc, zc)], axis=-1).astype(np.float32)
    nrm = np.zeros_like(xyz)
    # tiny nx: _dense_associate marks normals valid via |n_x| > 0 (the
    # pool stores zero-normals for invalid pixels), and the color rows
    # are gated by the association's found mask
    nrm[..., 0] = 0.02
    nrm[..., 2] = -0.9998
    return xyz, nrm, grey


def _setup(offset_x=0.003):
    """Frame 0 at origin; frame 1 GT-translated +offset_x but initialized
    at identity — the BA must discover the offset."""
    T0 = np.eye(4)
    T1 = np.eye(4)
    T1[0, 3] = offset_x
    maps = [_render(T0), _render(T1)]
    xyz = jnp.asarray(np.stack([m[0] for m in maps]))
    nrm = jnp.asarray(np.stack([m[1] for m in maps]))
    grey = jnp.asarray(np.stack([m[2] for m in maps]))
    K = jnp.asarray(np.array([[FX, 0, CX], [0, FY, CY], [0, 0, 1]],
                             np.float32))
    D = 1024
    idx = np.linspace(0, H * W - 1, D).astype(np.int32)
    src_idx = jnp.asarray(np.stack([idx, idx]))
    src_valid = jnp.ones((2, D), bool)
    pair_ij = jnp.asarray(np.array([[0, 1], [1, 0]], np.int32))
    C = 8  # padded, all-invalid sparse block
    corr = dict(corr_i=jnp.zeros(C, jnp.int32),
                corr_j=jnp.zeros(C, jnp.int32),
                corr_pi=jnp.zeros((C, 3), jnp.float32),
                corr_pj=jnp.zeros((C, 3), jnp.float32),
                corr_valid=jnp.zeros(C, bool))
    poses0 = jnp.asarray(np.stack([np.eye(4), np.eye(4)]).astype(np.float32))
    flags = jnp.asarray(np.array([0, 1], np.float32))
    return dict(poses0=poses0, K_down=K, xyz_down=xyz, nrm_down=nrm,
                pair_ij=pair_ij, update_flags=flags, src_idx=src_idx,
                src_valid=src_valid, grey=grey, gt_dx=offset_x, **corr)


def _run(s, w_color):
    cfg = BAConfig(n_outer=12, assoc_entry_mode="window",
                   assoc_refine_mode="window", reassoc_iters=12,
                   assoc_radius=3, assoc_stride_first=1,
                   dense_dist_thres=0.02, early_out_delta=0.0,
                   w_sparse=0.0, w_dense=1.0, w_dense_color=w_color,
                   robust_delta_color=0.5)
    poses = bundle_adjust(
        s["poses0"], s["K_down"], s["xyz_down"], s["nrm_down"], s["pair_ij"],
        s["corr_i"], s["corr_j"], s["corr_pi"], s["corr_pj"], s["corr_valid"],
        s["update_flags"], s["src_idx"], s["src_valid"], cfg,
        grey_down=(s["grey"] if w_color > 0 else None))
    return np.asarray(poses)


def test_color_term_recovers_inplane_offset():
    s = _setup(offset_x=0.003)
    # depth-only arm: point-to-plane on a fronto-parallel plane cannot
    # see the x-slide — the error must survive
    p_depth = _run(s, 0.0)
    err_depth = abs(p_depth[1][0, 3] - s["gt_dx"])
    assert err_depth > 0.8 * s["gt_dx"], (
        f"fixture broken: depth term alone fixed the in-plane offset "
        f"(err {err_depth * 1000:.3f} mm)")
    # photometric arm must shrink it by a large factor
    p_color = _run(s, 20.0)
    err_color = abs(p_color[1][0, 3] - s["gt_dx"])
    assert err_color < 0.35 * err_depth, (
        f"color term did not help: {err_color * 1e3:.3f} mm vs depth-only "
        f"{err_depth * 1e3:.3f} mm")
    assert np.allclose(p_color[0], np.eye(4))  # frame 0 pinned


def test_color_weight_zero_is_exact_noop():
    """w_dense_color=0 with grey maps present must produce the identical
    program result as no grey maps at all."""
    s = _setup()
    cfg = BAConfig(w_dense_color=0.0)
    a = bundle_adjust(
        s["poses0"], s["K_down"], s["xyz_down"], s["nrm_down"], s["pair_ij"],
        s["corr_i"], s["corr_j"], s["corr_pi"], s["corr_pj"], s["corr_valid"],
        s["update_flags"], s["src_idx"], s["src_valid"], cfg,
        grey_down=s["grey"])
    b = bundle_adjust(
        s["poses0"], s["K_down"], s["xyz_down"], s["nrm_down"], s["pair_ij"],
        s["corr_i"], s["corr_j"], s["corr_pi"], s["corr_pj"], s["corr_valid"],
        s["update_flags"], s["src_idx"], s["src_valid"], cfg)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pipeline_smoke_with_color_term(tmp_path):
    """End-to-end wiring: pool grey maps populate and the BA runs with the
    photometric rows when bundle.w_dense_color > 0."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from synthetic import cube_orbit_sequence
    from bundlesdf_tpu.bundlesdf import BundleSdf
    from bundlesdf_tpu.config import default_nerf_config, default_track_config

    seq = cube_orbit_sequence(n_frames=4, H=90, W=120, radius=0.45,
                              obj_size=0.08, full_angle=0.2)
    cfg = default_track_config()
    cfg["debug_dir"] = str(tmp_path)
    cfg["ransac"]["max_trans_neighbor"] = 0.05
    cfg["ransac"]["max_iter"] = 500
    cfg["bundle"]["max_BA_frames"] = 4
    cfg["bundle"]["depth_association_radius"] = 2
    cfg["bundle"]["w_dense_color"] = 0.1
    b = BundleSdf(cfg_track=cfg, cfg_nerf=default_nerf_config(),
                  start_nerf_keyframes=99)
    for i in range(4):
        b.run(seq["colors"][i], seq["depths"][i].copy(), seq["K"],
              seq["id_strs"][i], mask=seq["masks"][i])
    b.flush_pipeline()
    assert b.bundler.pool.greys is not None
    for f in b.bundler.frames.values():
        assert np.isfinite(f.pose_in_model).all()
