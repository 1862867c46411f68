"""CLI driver: track + reconstruct a custom RGBD video.

Same three modes and flags as the reference `run_custom.py:210-228`:
  --mode run_video      online tracking + concurrent NOF
  --mode global_refine  offline high-quality NOF from saved artifacts
  --mode draw_pose      render pose box overlays from saved results
Config mutations mirror `run_custom.py:18-154`.
"""
from __future__ import annotations

import argparse
import copy
import glob
import logging
import os

import cv2
import imageio.v2 as imageio
import numpy as np
import yaml

from bundlesdf_tpu.bundlesdf import BundleSdf
from bundlesdf_tpu.config import (default_nerf_config, default_track_config,
                                  dump_config, load_config)
from bundlesdf_tpu.datasets import YcbineoatReader
from bundlesdf_tpu.mesh import Mesh
from bundlesdf_tpu.utils.common import set_logging_format, set_seed
from bundlesdf_tpu.utils.segmentation import Segmenter
from bundlesdf_tpu.utils.viz import draw_posed_3d_box


def make_configs(out_folder, debug_level=2):
    """Config mutations for the custom-video mode (ref run_custom.py:23-62)."""
    cfg_track = default_track_config()
    cfg_track["SPDLOG"] = int(debug_level)
    cfg_track["depth_processing"]["percentile"] = 95
    cfg_track["erode_mask"] = 3
    cfg_track["debug_dir"] = out_folder + "/"
    cfg_track["bundle"]["max_BA_frames"] = 10
    cfg_track["bundle"]["max_optimized_feature_loss"] = 0.03
    cfg_track["feature_corres"]["max_dist_neighbor"] = 0.02
    cfg_track["feature_corres"]["max_normal_neighbor"] = 30
    cfg_track["feature_corres"]["max_dist_no_neighbor"] = 0.01
    cfg_track["feature_corres"]["max_normal_no_neighbor"] = 20
    cfg_track["feature_corres"]["map_points"] = True
    cfg_track["feature_corres"]["resize"] = 400
    cfg_track["feature_corres"]["rematch_after_nerf"] = True
    cfg_track["keyframe"]["min_rot"] = 5
    cfg_track["ransac"]["inlier_dist"] = 0.01
    cfg_track["ransac"]["inlier_normal_angle"] = 20
    cfg_track["ransac"]["max_trans_neighbor"] = 0.02
    cfg_track["ransac"]["max_rot_deg_neighbor"] = 30
    cfg_track["ransac"]["max_trans_no_neighbor"] = 0.01
    cfg_track["ransac"]["max_rot_no_neighbor"] = 10
    cfg_track["p2p"]["max_dist"] = 0.02
    cfg_track["p2p"]["max_normal_angle"] = 45

    cfg_nerf = default_nerf_config()
    cfg_nerf["continual"] = True
    cfg_nerf["trunc_start"] = 0.01
    cfg_nerf["trunc"] = 0.01
    cfg_nerf["mesh_resolution"] = 0.005
    cfg_nerf["down_scale_ratio"] = 1
    cfg_nerf["fs_sdf"] = 0.1
    cfg_nerf["far"] = cfg_track["depth_processing"]["zfar"]
    cfg_nerf["datadir"] = f"{cfg_track['debug_dir']}/nerf_with_bundletrack_online"
    cfg_nerf["save_dir"] = cfg_nerf["datadir"]
    return cfg_track, cfg_nerf


def run_one_video(video_dir, out_folder, use_segmenter=False, use_gui=False,
                  stride=1, debug_level=2, refine_overrides=None,
                  online_overrides=None, track_overrides=None,
                  skip_refine=False, start_nerf_keyframes=5, matcher=None):
    """@online_overrides: optional deltas on the ONLINE nerf config (e.g.
    n_step to bound per-keyframe NOF wall in benchmark harnesses; the
    reference exposes the same knob as config.yml:2).
    @track_overrides: {dotted.key: value} deltas on the tracker config
    (A/B harness knob, e.g. {"bundle.reassoc_iters": 7}).
    @skip_refine: stop after online tracking (pose-metric A/B runs don't
    need the offline refine).
    @start_nerf_keyframes: reference default 5 (run_custom.py:115); a
    huge value disables online NOF — tracker-only A/B isolation.
    @matcher: optional matcher instance for BundleSdf (e.g. GtMatcher for
    oracle-correspondence A/B runs; None = config-driven LoFTR/ORB)."""
    set_seed(0)
    os.makedirs(out_folder, exist_ok=True)
    cfg_track, cfg_nerf = make_configs(out_folder, debug_level)
    for key, val in (track_overrides or {}).items():
        node = cfg_track
        parts = key.split(".")
        for p in parts[:-1]:
            node = node[p]
        node[parts[-1]] = val
    # dump the PRE-override config: run_one_video_global_nerf reloads
    # config_nerf.yml as the refine base, so benchmark-only online knobs
    # (e.g. n_step) must not leak into the offline refine settings
    dump_config(cfg_track, f"{out_folder}/config_bundletrack.yml")
    dump_config(cfg_nerf, f"{out_folder}/config_nerf.yml")
    cfg_nerf_online = copy.deepcopy(cfg_nerf)
    if online_overrides:
        cfg_nerf_online.update(online_overrides)

    tracker = BundleSdf(cfg_track=cfg_track, cfg_nerf=cfg_nerf_online,
                        start_nerf_keyframes=start_nerf_keyframes,
                        use_gui=use_gui, matcher=matcher)
    reader = YcbineoatReader(video_dir=video_dir, shorter_side=480)

    # per-frame segmenter (ref run_custom.py:64-91: reads the mask via
    # Segmenter.run on the rgb->masks path instead of the reader; XMem is
    # excluded upstream for license, so run() reads precomputed masks and
    # optionally subtracts a static background cloud)
    segmenter = Segmenter(cfg_track) if use_segmenter else None

    erode = cfg_track.get("erode_mask", 0)
    for i in range(0, len(reader.color_files), stride):
        color = reader.get_color(i)
        depth = reader.get_depth(i)
        if segmenter is not None:
            mask_file = reader.color_files[i].replace("rgb", "masks")
            mask = segmenter.run(mask_file, depth=depth, K=reader.K)
            if mask is not None and mask.shape[:2] != color.shape[:2]:
                mask = cv2.resize(mask, (color.shape[1], color.shape[0]),
                                  interpolation=cv2.INTER_NEAREST)
        else:
            mask = reader.get_mask(i)
        if erode > 0 and mask is not None:
            kernel = np.ones((erode, erode), np.uint8)
            mask = cv2.erode(mask.astype(np.uint8), kernel)
        # occluder masks (HO3D masks_hand layout) ride along when present
        occ_mask = None
        if os.path.isdir(os.path.join(video_dir, "masks_hand")):
            occ_mask = reader.get_occ_mask(i)
        tracker.run(color, depth, reader.K.copy(), reader.id_strs[i],
                    mask=mask, occ_mask=occ_mask, pose_in_model=np.eye(4))
    tracker.on_finish()
    if skip_refine:
        return
    run_one_video_global_nerf(out_folder=out_folder, video_dir=video_dir,
                              refine_overrides=refine_overrides)


def run_one_video_global_nerf(out_folder, video_dir=None,
                              refine_overrides=None):
    """Offline high-quality refine (ref run_custom.py:110-154).
    @refine_overrides: optional config deltas on top of the reference's
    hardcoded refine settings (used by benchmark_synthetic.py to bound
    wall-clock)."""
    set_seed(0)
    cfg_track = load_config(f"{out_folder}/config_bundletrack.yml",
                            default_track_config())
    cfg_track["debug_dir"] = out_folder + "/"
    cfg_nerf = load_config(f"{out_folder}/config_nerf.yml",
                           default_nerf_config())
    cfg_nerf.update(dict(
        n_step=2000, N_samples=64, N_samples_around_depth=256,
        first_frame_weight=1, down_scale_ratio=1, finest_res=256,
        num_levels=16, mesh_resolution=0.002, n_train_image=500, fs_sdf=0.1,
        frame_features=2, rgb_weight=100,
        # TPU deviation from the reference refine config (which keeps
        # log2_hashmap_size 22, run_custom.py:121-128): T=2^24 makes every
        # level except the finest collision-FREE dense (res<=254), so they
        # use the run-dedup gather + sorted-tiles scatter engines instead
        # of the 8-rows-per-sample hashed path — the hashed levels'
        # scatter dominated the offline step (docs/PERF.md). Memory for
        # speed; quality can only improve (fewer collisions)
        log2_hashmap_size=24))
    if refine_overrides:
        cfg_nerf.update(refine_overrides)
    cfg_nerf["datadir"] = f"{out_folder}/nerf_with_bundletrack_online"
    cfg_nerf["save_dir"] = cfg_nerf["datadir"]
    os.makedirs(cfg_nerf["datadir"], exist_ok=True)
    dump_config(cfg_nerf, f"{cfg_nerf['datadir']}/config.yml")

    tracker = BundleSdf(cfg_track=cfg_track, cfg_nerf=cfg_nerf,
                        start_nerf_keyframes=5)
    reader = (YcbineoatReader(video_dir=video_dir, downscale=1)
              if video_dir else None)
    tracker.run_global_nerf(reader=reader, get_texture=True, tex_res=512)
    print("Done")


def postprocess_mesh(out_folder):
    """Un-normalize the latest NOF mesh, keep the biggest component, smooth
    (ref run_custom.py:158-189)."""
    cands = (sorted(glob.glob(f"{out_folder}/**/*normalized_space.obj",
                              recursive=True))
             or sorted(glob.glob(f"{out_folder}/**/mesh_cleaned.obj",
                                 recursive=True)))
    mesh_file = cands[-1]
    print(f"Using {mesh_file}")
    os.makedirs(f"{out_folder}/mesh", exist_ok=True)
    mesh = Mesh.load(mesh_file)
    with open(os.path.join(os.path.dirname(mesh_file), "config.yml")) as f:
        cfg = yaml.safe_load(f)
    tf = np.eye(4)
    tf[:3, 3] = np.asarray(cfg["translation"]).reshape(3)
    tf1 = np.eye(4)
    tf1[:3, :3] *= cfg["sc_factor"]
    mesh.apply_transform(np.linalg.inv(tf1 @ tf))
    mesh.export(f"{out_folder}/mesh/mesh_real_scale.obj")
    mesh.merge_vertices()
    mesh.keep_biggest_component()
    mesh.export(f"{out_folder}/mesh/mesh_biggest_component.obj")
    mesh.smooth_laplacian(lamb=0.5, iterations=3)
    mesh.export(f"{out_folder}/mesh/mesh_biggest_component_smoothed.obj")


def draw_pose(out_folder):
    """Render pose box overlays (ref run_custom.py:191-206)."""
    K = np.loadtxt(f"{out_folder}/cam_K.txt").reshape(3, 3)
    color_files = sorted(glob.glob(f"{out_folder}/color/*"))
    mesh_file = f"{out_folder}/textured_mesh.obj"
    if not os.path.exists(mesh_file):
        cands = sorted(glob.glob(f"{out_folder}/**/mesh_real_world.obj",
                                 recursive=True))
        mesh_file = cands[-1]
    mesh = Mesh.load(mesh_file)
    to_origin, extents = mesh.oriented_bounds()
    bbox = np.stack([-extents / 2, extents / 2], axis=0)
    out_dir = f"{out_folder}/pose_vis"
    os.makedirs(out_dir, exist_ok=True)
    for color_file in color_files:
        color = imageio.imread(color_file)
        pose = np.loadtxt(color_file.replace(".png", ".txt")
                          .replace("color", "ob_in_cam"))
        pose = pose @ np.linalg.inv(to_origin)
        vis = draw_posed_3d_box(K, color, ob_in_cam=pose, bbox=bbox,
                                line_color=(255, 255, 0))
        id_str = os.path.basename(color_file).replace(".png", "")
        imageio.imwrite(f"{out_dir}/{id_str}.png", vis)


if __name__ == "__main__":
    set_logging_format()
    parser = argparse.ArgumentParser()
    parser.add_argument("--mode", type=str, default="run_video",
                        help="run_video/global_refine/draw_pose")
    parser.add_argument("--video_dir", type=str, default="")
    parser.add_argument("--out_folder", type=str, default="/tmp/bundlesdf_out")
    parser.add_argument("--use_segmenter", type=int, default=0)
    parser.add_argument("--use_gui", type=int, default=0)
    parser.add_argument("--stride", type=int, default=1)
    parser.add_argument("--debug_level", type=int, default=2)
    args = parser.parse_args()

    if args.mode == "run_video":
        run_one_video(args.video_dir, args.out_folder,
                      use_segmenter=bool(args.use_segmenter),
                      use_gui=bool(args.use_gui), stride=args.stride,
                      debug_level=args.debug_level)
    elif args.mode == "global_refine":
        run_one_video_global_nerf(out_folder=args.out_folder,
                                  video_dir=args.video_dir or None)
    elif args.mode == "draw_pose":
        draw_pose(args.out_folder)
    elif args.mode == "postprocess_mesh":
        postprocess_mesh(args.out_folder)
    else:
        raise RuntimeError(f"unknown mode {args.mode}")
