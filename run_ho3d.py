"""CLI driver: HO3D batch runs (ref `run_ho3d.py:18-119`).

Adds a TPU-native extra over the reference: `--parallel_videos N` runs N
videos concurrently, one per device, via the videos sweep (the reference
runs videos sequentially, run_ho3d.py:116-119)."""
from __future__ import annotations

import argparse
import copy
import glob
import os

import cv2
import numpy as np

from bundlesdf_tpu.bundlesdf import BundleSdf
from bundlesdf_tpu.config import (default_nerf_config, default_track_config,
                                  dump_config, load_config)
from bundlesdf_tpu.datasets import Ho3dReader
from bundlesdf_tpu.utils.common import set_logging_format, set_seed


def _video_done(reader, out_folder):
    if os.path.exists(f"{out_folder}/ob_in_cam"):
        pose_files = sorted(glob.glob(f"{out_folder}/ob_in_cam/*.txt"))
        if len(pose_files) == len(reader.color_files):
            return True
    return False


def _make_tracker(video_dir, out_folder, use_gui=False):
    os.makedirs(out_folder, exist_ok=True)
    cfg_track = default_track_config()
    cfg_track["data_dir"] = video_dir
    cfg_track["SPDLOG"] = 2
    cfg_track["depth_processing"]["zfar"] = 1
    cfg_track["debug_dir"] = out_folder
    dump_config(cfg_track, f"{out_folder}/config_bundletrack.yml")

    cfg_nerf = default_nerf_config()
    cfg_nerf["trunc_start"] = 0.01
    cfg_nerf["trunc"] = 0.01
    cfg_nerf["down_scale_ratio"] = 1
    cfg_nerf["far"] = cfg_track["depth_processing"]["zfar"]
    cfg_nerf["datadir"] = f"{out_folder}/nerf_with_bundletrack_online"
    cfg_nerf["save_dir"] = copy.deepcopy(cfg_nerf["datadir"])
    dump_config(cfg_nerf, f"{out_folder}/config_nerf.yml")

    return BundleSdf(cfg_track=cfg_track, cfg_nerf=cfg_nerf,
                     start_nerf_keyframes=5, use_gui=use_gui)


def run_one_video(video_dir, out_dir, use_gui=False):
    set_seed(0)
    reader = Ho3dReader(video_dir)
    out_folder = f"{out_dir}/{reader.get_video_name()}/"
    if _video_done(reader, out_folder):
        print(f"{out_folder} done before, skip")
        return
    tracker = _make_tracker(video_dir, out_folder, use_gui=use_gui)
    for i in range(len(reader.color_files)):
        color = reader.get_color(i)
        depth = reader.get_depth(i)
        mask = reader.get_mask(i)
        occ_mask = reader.get_occ_mask(i)
        tracker.run(color, depth, reader.K, reader.id_strs[i], mask=mask,
                    occ_mask=occ_mask)
    tracker.on_finish()
    print(f"Done {video_dir}")


def run_videos(video_dirs, out_dir, parallel_videos=0, use_gui=False):
    """Run many videos; with @parallel_videos > 0, N videos run
    concurrently, one device each (TPU-native extra over the reference's
    sequential loop, run_ho3d.py:116-119)."""
    if parallel_videos <= 1:
        for video_dir in video_dirs:
            run_one_video(video_dir, out_dir, use_gui=use_gui)
        return
    from bundlesdf_tpu.parallel.videos import run_videos_parallel

    set_seed(0)
    jobs = []
    video_of = {}  # out_folder -> video_dir for the tracker factory
    for video_dir in video_dirs:
        reader = Ho3dReader(video_dir)
        out_folder = f"{out_dir}/{reader.get_video_name()}/"
        if _video_done(reader, out_folder):
            print(f"{out_folder} done before, skip")
            continue
        video_of[out_folder] = video_dir
        jobs.append((reader, out_folder))

    def make_tracker(out_folder):
        return _make_tracker(video_of[out_folder], out_folder)

    for s in range(0, len(jobs), parallel_videos):
        run_videos_parallel(jobs[s:s + parallel_videos],
                            make_tracker=make_tracker,
                            n_devices=parallel_videos)


def run_one_video_global_nerf(video_dir, out_dir):
    set_seed(0)
    reader = Ho3dReader(video_dir)
    out_folder = f"{out_dir}/{reader.get_video_name()}/"
    cfg_track = load_config(f"{out_folder}/config_bundletrack.yml",
                            default_track_config())
    cfg_nerf = load_config(f"{out_folder}/config_nerf.yml",
                           default_nerf_config())
    cfg_nerf.update(dict(n_step=2000, N_samples=128, down_scale_ratio=1,
                         finest_res=512, num_levels=16,
                         mesh_resolution=0.003,
                         # dense (collision-free) tables for all levels up
                         # to res 254 — see run_custom.py refine note
                         log2_hashmap_size=24))
    cfg_nerf["datadir"] = f"{out_folder}/nerf_with_bundletrack_online"
    cfg_nerf["save_dir"] = copy.deepcopy(cfg_nerf["datadir"])
    tracker = BundleSdf(cfg_track=cfg_track, cfg_nerf=cfg_nerf,
                        start_nerf_keyframes=5)
    tracker.debug_dir = out_folder
    tracker.run_global_nerf()
    print(f"Done {video_dir}")


if __name__ == "__main__":
    set_logging_format()
    parser = argparse.ArgumentParser()
    parser.add_argument("--video_dirs", type=str, required=True,
                        help="comma-separated HO3D video dirs")
    parser.add_argument("--out_dir", type=str, default="/tmp/ho3d_ours")
    parser.add_argument("--mode", type=str, default="run_video",
                        help="run_video/global_refine")
    parser.add_argument("--use_gui", type=int, default=0)
    parser.add_argument("--parallel_videos", type=int, default=0,
                        help="run N videos concurrently, one per device "
                             "(run_video mode only)")
    args = parser.parse_args()

    video_dirs = args.video_dirs.split(",")
    if args.mode == "run_video":
        run_videos(video_dirs, args.out_dir,
                   parallel_videos=args.parallel_videos,
                   use_gui=bool(args.use_gui))
    else:
        for video_dir in video_dirs:
            run_one_video_global_nerf(video_dir, args.out_dir)
