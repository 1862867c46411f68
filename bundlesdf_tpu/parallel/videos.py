"""Throughput sweep: one video pipeline per device.

The reference runs benchmark videos sequentially (`run_ho3d.py:116-119`);
here each video's device work is pinned to its own chip with
`jax.default_device` and the host loop interleaves frames round-robin, so
the per-video jitted kernels (preprocess, RANSAC, BA, NOF steps) execute
concurrently across the mesh while host-side logic stays serial. This is
BASELINE config #5 ("data parallelism over videos"); collectives are not
needed — videos are independent.
"""
from __future__ import annotations

import logging

import jax


def run_videos_parallel(video_jobs, make_tracker, n_devices=None,
                        devices=None):
    """@video_jobs: list of (reader, out_dir). @make_tracker:
    callable(out_dir) -> BundleSdf. Interleaves frames across videos with
    each tracker's device work pinned to one chip.
    @devices: explicit device list (e.g. jax.devices('cpu') in mesh
    dry-runs where the default backend was already initialized on
    another platform); default = jax.devices()."""
    devices = jax.devices() if devices is None else list(devices)
    n_devices = n_devices or len(devices)
    assert len(devices) >= (n_devices or 1), (
        f"need {n_devices} devices, jax.devices() has {len(devices)}")
    jobs = []
    for k, (reader, out_dir) in enumerate(video_jobs):
        dev = devices[k % n_devices]
        with jax.default_device(dev):
            tracker = make_tracker(out_dir)
        jobs.append({"reader": reader, "tracker": tracker, "device": dev,
                     "i": 0, "done": False})

    remaining = len(jobs)
    while remaining > 0:
        for job in jobs:
            if job["done"]:
                continue
            reader = job["reader"]
            i = job["i"]
            if i >= len(reader):
                with jax.default_device(job["device"]):
                    job["tracker"].on_finish()
                job["done"] = True
                remaining -= 1
                logging.info(f"video done ({reader.get_video_name()})")
                continue
            with jax.default_device(job["device"]):
                job["tracker"].run(
                    reader.get_color(i), reader.get_depth(i), reader.K,
                    reader.id_strs[i], mask=reader.get_mask(i),
                    occ_mask=(reader.get_occ_mask(i)
                              if hasattr(reader, "get_occ_mask") else None))
            job["i"] += 1
    return [j["tracker"] for j in jobs]
