"""Video dataset readers.

Same folder layouts and decode rules as the reference
(`BundleTrack/scripts/data_reader.py:21-185`): YCBInEOAT/custom folders with
rgb/depth-mm PNGs + masks + cam_K.txt, and HO3D with jpg color, packed
2-channel depth x 0.00012498..., XMem masks, pkl meta GT poses.
"""
from __future__ import annotations

import glob
import logging
import os
import pickle

import cv2
import imageio.v2 as imageio
import numpy as np

from bundlesdf_tpu.utils.common import GLCAM_IN_CVCAM, depth2xyzmap


class YcbineoatReader:
    """Ref data_reader.py:21-110. Works for any folder with
    rgb/*.png, depth/*.png (mm), masks/*.png, cam_K.txt."""

    def __init__(self, video_dir, downscale=1, shorter_side=None):
        self.video_dir = video_dir
        self.downscale = downscale
        self.color_files = sorted(glob.glob(f"{video_dir}/rgb/*.png"))
        self.K = np.loadtxt(f"{video_dir}/cam_K.txt").reshape(3, 3)
        self.id_strs = [os.path.basename(f).replace(".png", "")
                        for f in self.color_files]
        self.H, self.W = cv2.imread(self.color_files[0]).shape[:2]
        if shorter_side is not None:
            self.downscale = shorter_side / min(self.H, self.W)
        self.H = int(self.H * self.downscale)
        self.W = int(self.W * self.downscale)
        self.K[:2] *= self.downscale
        self.gt_pose_files = sorted(glob.glob(f"{video_dir}/annotated_poses/*"))

    def get_video_name(self):
        return self.video_dir.rstrip("/").split("/")[-1]

    def __len__(self):
        return len(self.color_files)

    def get_color(self, i):
        color = imageio.imread(self.color_files[i])[..., :3]
        return cv2.resize(color, (self.W, self.H),
                          interpolation=cv2.INTER_NEAREST)

    def get_mask(self, i):
        mask = cv2.imread(self.color_files[i].replace("rgb", "masks"), -1)
        if mask is None:
            return None
        if mask.ndim == 3:
            mask = (mask.sum(axis=-1) > 0).astype(np.uint8)
        return cv2.resize(mask, (self.W, self.H),
                          interpolation=cv2.INTER_NEAREST)

    def get_depth(self, i):
        depth = cv2.imread(self.color_files[i].replace("rgb", "depth"), -1) / 1e3
        return cv2.resize(depth, (self.W, self.H),
                          interpolation=cv2.INTER_NEAREST).astype(np.float32)

    def get_xyz_map(self, i):
        return depth2xyzmap(self.get_depth(i), self.K)

    def get_occ_mask(self, i):
        occ = np.zeros((self.H, self.W), bool)
        for sub in ("masks_hand", "masks_hand_right"):
            f = self.color_files[i].replace("rgb", sub)
            if os.path.exists(f):
                m = cv2.imread(f, -1)
                occ |= cv2.resize(m, (self.W, self.H),
                                  interpolation=cv2.INTER_NEAREST) > 0
        return occ.astype(np.uint8)

    def get_gt_pose(self, i):
        try:
            return np.loadtxt(self.gt_pose_files[i]).reshape(4, 4)
        except (IndexError, OSError):
            logging.info("GT pose not found")
            return None


class Ho3dReader:
    """Ref data_reader.py:113-185."""

    DEPTH_SCALE = 0.00012498664727900177

    def __init__(self, video_dir, ho3d_root=None):
        self.video_dir = video_dir
        self.ho3d_root = ho3d_root or os.path.dirname(
            os.path.dirname(os.path.abspath(video_dir)))
        self.color_files = sorted(glob.glob(f"{video_dir}/rgb/*.jpg"))
        meta0 = self.color_files[0].replace(".jpg", ".pkl").replace("rgb",
                                                                    "meta")
        with open(meta0, "rb") as f:
            self.K = pickle.load(f)["camMat"]
        self.id_strs = [os.path.basename(f).split(".")[0]
                        for f in self.color_files]

    def __len__(self):
        return len(self.color_files)

    def get_video_name(self):
        return os.path.dirname(
            os.path.abspath(self.color_files[0])).split("/")[-2]

    def get_color(self, i):
        return imageio.imread(self.color_files[i])[..., :3]

    def get_depth(self, i):
        """Packed 2-channel depth decode (ref data_reader.py:162-167)."""
        depth = cv2.imread(self.color_files[i].replace(".jpg", ".png")
                           .replace("rgb", "depth"), -1)
        return ((depth[..., 2] + depth[..., 1] * 256)
                * self.DEPTH_SCALE).astype(np.float32)

    def get_mask(self, i):
        name = self.get_video_name()
        index = int(self.id_strs[i])
        return cv2.imread(
            f"{self.ho3d_root}/masks_XMem/{name}/{index:05d}.png", -1)

    def get_occ_mask(self, i):
        name = self.get_video_name()
        index = int(self.id_strs[i])
        return cv2.imread(
            f"{self.ho3d_root}/masks_XMem/{name}_hand/{index:04d}.png", -1)

    def get_xyz_map(self, i):
        return depth2xyzmap(self.get_depth(i), self.K)

    def get_gt_pose(self, i):
        meta_file = self.color_files[i].replace(".jpg", ".pkl").replace("rgb",
                                                                        "meta")
        with open(meta_file, "rb") as f:
            meta = pickle.load(f)
        if meta["objTrans"] is None:
            return None
        T = np.eye(4)
        T[:3, 3] = meta["objTrans"]
        T[:3, :3] = cv2.Rodrigues(meta["objRot"].reshape(3))[0]
        return GLCAM_IN_CVCAM @ T
