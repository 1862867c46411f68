"""Dataset readers on a synthetic YCBInEOAT-format dump."""
import os

import cv2
import numpy as np

from synthetic import cube_orbit_sequence

from bundlesdf_tpu.datasets import YcbineoatReader


def _dump_ycbineoat(tmp_path, seq):
    d = str(tmp_path / "vid")
    for sub in ("rgb", "depth", "masks", "annotated_poses"):
        os.makedirs(f"{d}/{sub}", exist_ok=True)
    np.savetxt(f"{d}/cam_K.txt", seq["K"])
    for i, id_str in enumerate(seq["id_strs"]):
        cv2.imwrite(f"{d}/rgb/{id_str}.png", seq["colors"][i][..., ::-1])
        cv2.imwrite(f"{d}/depth/{id_str}.png",
                    (seq["depths"][i] * 1000).astype(np.uint16))
        cv2.imwrite(f"{d}/masks/{id_str}.png", seq["masks"][i] * 255)
        np.savetxt(f"{d}/annotated_poses/{id_str}.txt",
                   np.linalg.inv(seq["cam_in_obs"][i]))
    return d


def test_ycbineoat_roundtrip(tmp_path):
    seq = cube_orbit_sequence(n_frames=3, H=60, W=80)
    d = _dump_ycbineoat(tmp_path, seq)
    r = YcbineoatReader(d)
    assert len(r) == 3
    assert r.id_strs == seq["id_strs"]
    np.testing.assert_allclose(r.K, seq["K"])
    c = r.get_color(0)
    assert c.shape == (60, 80, 3)
    np.testing.assert_allclose(r.get_depth(1), seq["depths"][1], atol=1e-3)
    assert (r.get_mask(2) > 0).sum() == (seq["masks"][2] > 0).sum()
    gt = r.get_gt_pose(0)
    np.testing.assert_allclose(gt, np.linalg.inv(seq["cam_in_obs"][0]),
                               atol=1e-6)
    xyz = r.get_xyz_map(0)
    assert xyz.shape == (60, 80, 3)


def test_ycbineoat_shorter_side(tmp_path):
    seq = cube_orbit_sequence(n_frames=2, H=60, W=80)
    d = _dump_ycbineoat(tmp_path, seq)
    r = YcbineoatReader(d, shorter_side=30)
    assert min(r.H, r.W) == 30
    assert r.get_color(0).shape[:2] == (r.H, r.W)
    # intrinsics rescale with the image
    np.testing.assert_allclose(r.K[0, 0] / seq["K"][0, 0], 0.5, atol=1e-6)
