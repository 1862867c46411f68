"""Aux subsystems: checkpoint/resume, copy_from, profiling timer,
headless GUI, segmenter stub."""
import numpy as np
import jax

from synthetic import cube_orbit_sequence

from bundlesdf_tpu.config import default_nerf_config
from bundlesdf_tpu.nof.runner import NofRunner, preprocess_frame_data
from bundlesdf_tpu.utils.common import GLCAM_IN_CVCAM
from bundlesdf_tpu.utils.profiling import Timer


def _tiny_runner(n_frames=3):
    seq = cube_orbit_sequence(n_frames=n_frames, H=48, W=64)
    translation = np.zeros(3)
    sc = 0.9 / 0.6
    cfg = default_nerf_config()
    cfg.update(dict(
        sc_factor=sc, translation=translation.tolist(), n_step=10,
        N_rand=128, N_samples=8, N_samples_around_depth=8, num_levels=2,
        finest_res=32, base_res=8, log2_hashmap_size=12, n_trace_steps=32,
        octree_smallest_voxel_size=2.0 / 32 / sc,
        octree_dilate_size=2.0 / 32 / sc, frame_features=2))
    poses_gl = seq["cam_in_obs"] @ GLCAM_IN_CVCAM
    rgbs, depths, masks, normals, poses = preprocess_frame_data(
        seq["colors"].copy(), seq["depths"].copy(), seq["masks"].copy(),
        None, poses_gl.copy(), sc, translation)
    return NofRunner(cfg, rgbs, depths, masks, normals, poses, seq["K"])


def test_checkpoint_roundtrip(tmp_path):
    r = _tiny_runner()
    r.train(n_steps=5)
    f = str(tmp_path / "model_latest.npz")
    r.save_weights(f)
    r2 = _tiny_runner()
    assert float(np.abs(np.asarray(r2.params["table"])
                        - np.asarray(r.params["table"])).max()) > 0
    r2.load_weights(f)
    for a, b in zip(jax.tree.leaves(r.params), jax.tree.leaves(r2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert r2.global_step == r.global_step
    # resumed runner can keep training
    m = r2.train(n_steps=3)
    assert np.isfinite(m["loss"]).all()


def test_copy_from():
    r = _tiny_runner(n_frames=2)
    r.train(n_steps=3)
    r2 = _tiny_runner(n_frames=3)
    r2.copy_from(r)
    np.testing.assert_array_equal(np.asarray(r2.params["table"]),
                                  np.asarray(r.params["table"]))
    np.testing.assert_array_equal(
        np.asarray(r2.params["feature_array"][:2]),
        np.asarray(r.params["feature_array"][:2]))


def test_timer_report():
    t = Timer()
    with t.span("alpha"):
        sum(range(1000))
    with t.span("alpha"):
        sum(range(1000))
    rep = t.report()
    assert "alpha" in rep and "calls     2" in rep


def test_headless_gui(tmp_path):
    from bundlesdf_tpu.gui import HeadlessGui
    from bundlesdf_tpu.mesh import Mesh, marching_tetrahedra
    seq = cube_orbit_sequence(n_frames=1, H=60, W=80)
    gui = HeadlessGui(str(tmp_path), every_n=1)
    xs = np.linspace(-0.12, 0.12, 12)
    X, Y, Z = np.meshgrid(xs, xs, xs, indexing="ij")
    v, f = marching_tetrahedra(
        np.maximum.reduce([np.abs(X), np.abs(Y), np.abs(Z)]) - 0.08, 0)
    gui.update_mesh(Mesh(v * (xs[1] - xs[0]) + xs[0], f))
    gui.set_nerf_num_frames(3)
    gui.update_frame(rgb=seq["colors"][0], mask=seq["masks"][0],
                     ob_in_cam=np.linalg.inv(seq["cam_in_obs"][0]),
                     id_str="0000", K=seq["K"], n_keyframe=2)
    assert (tmp_path / "gui_0000.png").exists()


def test_gui_factory_and_view_math(tmp_path):
    """BundleSdfGui falls back to HeadlessGui without dearpygui; the
    interactive view-rotation helper is a proper rotation (the DpgGui
    window itself needs the dearpygui package + display — env-blocked)."""
    from bundlesdf_tpu.gui import BundleSdfGui, HeadlessGui, _euler_xy, HAS_DPG
    g = BundleSdfGui(out_dir=str(tmp_path))
    if not HAS_DPG:
        assert isinstance(g, HeadlessGui)
    T = _euler_xy(0.3, -0.7)
    R = T[:3, :3]
    assert np.allclose(R @ R.T, np.eye(3), atol=1e-12)
    assert np.isclose(np.linalg.det(R), 1.0)
    assert np.allclose(T[3], [0, 0, 0, 1]) and np.allclose(T[:3, 3], 0)


def test_segmenter_stub(tmp_path):
    import cv2
    from bundlesdf_tpu.utils.segmentation import Segmenter
    f = str(tmp_path / "m.png")
    cv2.imwrite(f, np.full((10, 10), 255, np.uint8))
    mask = Segmenter().run(f)
    assert mask.shape == (10, 10) and (mask > 0).all()


def test_segmenter_bg_subtraction(tmp_path):
    """bg_dir/bg_dist (config_ycbineoat.yml:14-15): mask pixels whose 3D
    point sits on the pre-captured background cloud are removed."""
    import cv2
    import numpy as np
    from bundlesdf_tpu.utils.segmentation import Segmenter, load_ply_vertices

    K = np.array([[100.0, 0, 16], [0, 100.0, 12], [0, 0, 1]])
    depth = np.full((24, 32), 0.5, np.float32)
    mask = np.full((24, 32), 255, np.uint8)
    # background plane at z=0.5 covering the left half of the image
    us, vs = np.meshgrid(np.arange(16), np.arange(24))
    z = np.full(us.size, 0.5)
    x = (us.reshape(-1) - K[0, 2]) * z / K[0, 0]
    y = (vs.reshape(-1) - K[1, 2]) * z / K[1, 1]
    bg = np.stack([x, y, z], -1)
    ply = tmp_path / "bg.ply"
    with open(ply, "w") as f:
        f.write("ply\nformat ascii 1.0\n"
                f"element vertex {len(bg)}\n"
                "property float x\nproperty float y\nproperty float z\n"
                "end_header\n")
        for p in bg:
            f.write(f"{p[0]} {p[1]} {p[2]}\n")
    np.testing.assert_allclose(load_ply_vertices(str(ply)), bg, atol=1e-6)

    mask_file = tmp_path / "mask.png"
    cv2.imwrite(str(mask_file), mask)
    seg = Segmenter({"segmentation": {"bg_dir": str(ply), "bg_dist": 0.005}})
    out = seg.run(str(mask_file), depth=depth, K=K)
    assert (out[:, :16] == 0).all()      # background half removed
    assert (out[:, 17:] > 0).all()       # foreground half kept

    # without a bg cloud the mask passes through unchanged
    seg2 = Segmenter({})
    out2 = seg2.run(str(mask_file), depth=depth, K=K)
    assert (out2 > 0).all()


def test_experiment_logger(tmp_path):
    """cfg experiment_log enables the sacred-equivalent JSONL sink
    (ref nerf_runner.py:569-576,820-822): per-step scalars at the i_print
    cadence + ckpt artifacts at i_weights."""
    import json
    import os

    seq = cube_orbit_sequence(n_frames=2, H=48, W=64)
    sc = 0.9 / 0.6
    cfg = default_nerf_config()
    cfg.update(dict(
        sc_factor=sc, translation=[0.0, 0.0, 0.0], n_step=10, N_rand=128,
        N_samples=8, N_samples_around_depth=8, num_levels=2, finest_res=32,
        base_res=8, log2_hashmap_size=12, n_trace_steps=32,
        octree_smallest_voxel_size=2.0 / 32 / sc,
        octree_dilate_size=2.0 / 32 / sc,
        experiment_log=str(tmp_path / "run0"), i_print=5, i_weights=10,
        save_dir=str(tmp_path / "save")))
    poses_gl = seq["cam_in_obs"] @ GLCAM_IN_CVCAM
    rgbs, depths, masks, normals, poses = preprocess_frame_data(
        seq["colors"].copy(), seq["depths"].copy(), seq["masks"].copy(),
        None, poses_gl.copy(), sc, np.zeros(3))
    r = NofRunner(cfg, rgbs, depths, masks, normals, poses, seq["K"])
    r.train(n_steps=10)

    with open(tmp_path / "run0" / "scalars.jsonl") as f:
        scalars = [json.loads(l) for l in f]
    names = {s["name"] for s in scalars}
    assert "loss" in names and "rgb_loss" in names
    assert all(np.isfinite(s["value"]) for s in scalars)
    with open(tmp_path / "run0" / "artifacts.jsonl") as f:
        arts = [json.loads(l) for l in f]
    assert any(a["name"] == "model_latest.npz" and os.path.exists(a["path"])
               for a in arts)
