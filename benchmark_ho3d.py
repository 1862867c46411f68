"""HO3D benchmark aggregation (ref `benchmark_ho3d.py:18-207`): per-video
ADD/ADD-S AUC + mesh Chamfer, aggregated to an xlsx/csv table."""
from __future__ import annotations

import argparse
import glob
import os

import numpy as np
import pandas as pd

from bundlesdf_tpu.datasets import Ho3dReader
from bundlesdf_tpu.eval import benchmark_video
from bundlesdf_tpu.mesh import Mesh


def benchmark_one_video(video_dir, out_dir, method="ours"):
    reader = Ho3dReader(video_dir)
    video_name = reader.get_video_name()
    run_dir = f"{out_dir}/{video_name}"

    gt_poses, ids = [], []
    for i in range(len(reader.color_files)):
        gt = reader.get_gt_pose(i)
        if gt is None:
            continue
        gt_poses.append(gt)
        ids.append(i)
    gt_poses = np.array(gt_poses)

    # GT model cloud: prefer the dataset's model obj; else visible_mesh.ply
    gt_model_pts = None
    gt_visible = None
    vm = f"{video_dir}/visible_mesh.ply"
    if os.path.exists(vm):
        m = Mesh.load(vm)
        gt_visible = m.vertices
        gt_model_pts = m.vertices[::max(1, len(m.vertices) // 5000)]
    if gt_model_pts is None:
        raise FileNotFoundError(f"no GT mesh for {video_name}")

    pred_mesh = None
    cands = sorted(glob.glob(f"{run_dir}/**/*mesh_real_world.obj",
                             recursive=True))
    if cands:
        pred_mesh = Mesh.load(cands[-1])

    out = benchmark_video(run_dir, gt_poses, gt_model_pts,
                          gt_visible_pts=gt_visible, pred_mesh=pred_mesh,
                          ids=ids)
    print(f"video {video_name}: " + ", ".join(
        f"{k}={v:.2f}" for k, v in out.items() if np.isfinite(v)))
    return {f"{method}/{video_name}/{k}": v for k, v in out.items()}


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--video_dirs", type=str, required=True)
    parser.add_argument("--out_dir", type=str, required=True)
    parser.add_argument("--log_dir", type=str, default="/tmp/ho3d_bench")
    args = parser.parse_args()
    os.makedirs(args.log_dir, exist_ok=True)

    rows = {}
    for video_dir in args.video_dirs.split(","):
        rows.update(benchmark_one_video(video_dir, args.out_dir))
    df = pd.DataFrame([{"key": k, "value": v} for k, v in rows.items()])
    out_csv = os.path.join(args.log_dir, "results.csv")
    df.to_csv(out_csv, index=False)
    try:
        df.to_excel(os.path.join(args.log_dir, "results.xlsx"), index=False)
    except Exception:
        pass
    print(f"saved {out_csv}")
