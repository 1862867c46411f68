"""Benchmark: NOF training step rate + online tracking FPS.

Prints TWO JSON lines {"metric", "value", "unit", "vs_baseline"} — the
first (NOF steps/s) is the driver-recorded headline; the second is
steady-state online tracking FPS on a 480x640 synthetic sequence
(SPDLOG=0, ORB matcher, NOF disabled — isolates the tracker hot path
against the reference's "near-real-time" ~10 FPS claim, readme.md:8).

The metric is NOF train steps/sec at the reference online workload
(2048 rays x (64 occupied + 64 depth-guided) samples, 4-level hash grid,
2^22 table — config.yml:2,7,18-19,44-47). The reference publishes no
steps/sec. The defensible reference rate is ~10 steps/s on an RTX-class
GPU: the online loop trains n_step=501 steps per keyframe batch
(config.yml:2, bundlesdf.py:228) and the paper/readme describe the system
as near-real-time with NOF batches landing every ~1 min of wall clock —
i.e. ~50 s/batch ~= 10 steps/s (the full stack pays kaolin octree
raytrace + mycuda sampling + python dataloader overhead per step, not
just the bare NGP kernels). BASELINE.md's build target is ">=5x
reference steps/sec/chip", so vs_baseline = steps_per_sec / 10 and
vs_baseline >= 5 meets the target.
"""
from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import shutil
import time

import numpy as np


def _trace_device_ms(fn, n_steps: int):
    """Run @fn under a jax.profiler trace; return summed TPU device-op ms
    per step (None if no device timeline is found, e.g. on CPU)."""
    import jax

    d = "/tmp/bench_nof_trace"
    shutil.rmtree(d, ignore_errors=True)
    try:
        jax.profiler.start_trace(d)
        fn()
    finally:
        jax.profiler.stop_trace()
    return _trace_device_ms_from_dir(d, n_steps)


def _trace_device_events(d: str):
    """Parse a jax.profiler trace dir -> list of (ts, te, name) device
    X-events, or None without a TPU timeline."""
    paths = glob.glob(os.path.join(d, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        return None
    with gzip.open(sorted(paths)[-1]) as f:
        events = json.load(f)
    events = events["traceEvents"] if isinstance(events, dict) else events
    pids = {e["pid"]: e["args"].get("name", "") for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev = {p for p, n in pids.items() if "TPU" in n or "tpu" in n.lower()}
    if not dev:
        return None
    return [(e["ts"], e["ts"] + e.get("dur", 0), e.get("name", ""))
            for e in events if e.get("ph") == "X" and e.get("pid") in dev]


def _interval_union_ms(iv):
    # GLOBAL interval union across every device stream: module spans nest
    # their fusions and DMA streams overlap compute, so any per-stream or
    # per-op sum double-counts — busy wall-clock on the chip is the union
    iv = sorted((s, t) for s, t, *_ in iv)
    total = 0.0
    end = -1.0
    for s, t in iv:
        if s >= end:
            total += t - s
            end = t
        elif t > end:
            total += t - end
            end = t
    return total / 1e3


def _trace_device_ms_from_dir(d: str, n_steps: int):
    """TPU-busy ms per step from a profiler trace (interval union)."""
    ev = _trace_device_events(d)
    if ev is None:
        return None
    return _interval_union_ms(ev) / n_steps


def _trace_frame_attribution(d: str, marker: str = "jit_bundle_adjust"):
    """Per-FRAME device attribution that survives the tunnel profiler's
    replay sampling: executions of already-cached executables are often
    NOT re-traced (round 4 measured: a 10-frame trace window captured ONE
    frame's module spans), so dividing the busy union by the nominal frame
    count undercounts wildly. The steady frame dispatches exactly one BA
    program, so the number of @marker module spans captured = frames
    actually traced; normalize by that instead. Returns
    (device_ms_per_frame, per_program_ms_per_frame) or None."""
    ev = _trace_device_events(d)
    if not ev:
        return None
    import re
    n_frames = sum(1 for _, _, nm in ev if nm.startswith(marker))
    if n_frames == 0:
        return None
    union = _interval_union_ms(ev)
    per_prog = collections.Counter()
    for s, t, nm in ev:
        if nm.startswith("jit_"):
            per_prog[re.sub(r"\(\d+\)", "", nm)] += (t - s) / 1e3
    per_frame = {k: round(v / n_frames, 2) for k, v in per_prog.items()}
    return union / n_frames, per_frame


# v5e hardware ceilings (public: jax-ml.github.io/scaling-book and TPU v5e
# datasheet): HBM ~819 GB/s, bf16 MXU ~197 TFLOP/s, f32 ~49 TFLOP/s.
HBM_GBPS = 819.0
# measured per-op costs on THIS chip (docs/PERF.md "Primitive costs"):
# XLA gather ~12 ns/row (row-descriptor bound), BA patch dynamic-slice
# ~125 ns/slice (near-flat in slice bytes)
GATHER_NS_PER_ROW = 12.0
SLICE_NS = 125.0


def nof_roofline(runner, device_ms):
    """Analytic lower-bound step time for the NOF train step from the
    executed gather/scatter row counts and HBM traffic, vs the measured
    device time. Rows are what the kernels actually execute (run budgets
    including sentinel slots), each charged at the measured gather
    ns/row; scatters are charged the same rate (the sorted-tiles engine
    measured FASTER per row, so the bound is conservative). Returns a
    dict for the bench record."""
    spec = runner.spec.grid
    R = runner.tcfg.n_rand
    S = spec.ray_samples
    rows = 0
    traffic = 0.0  # bytes
    for lvl, (res, dense, n_rows, off) in enumerate(spec.layout()):
        if dense:
            k = min(spec.run_budget(lvl), S)
            X = (int(R * spec.tier_frac) // 8) * 8
            if spec.tier_frac > 0 and k >= 32 and X >= 8 and R - X >= 8:
                # two-tier budgets (ops/hashgrid.py::_dedup_two_tier):
                # top X rays at min(S, 2k), the rest at k//4
                k_lo = max(8, (k // 4 // 8) * 8)
                r = X * min(S, 2 * k) + (R - X) * k_lo
            else:
                r = R * k                  # dedup: one packed row per run
            wb = 8 * spec.level_dim * (2 if spec.table_bf16 else 4)
        else:
            r = R * S * 8                  # 8 hashed corners per sample
            wb = spec.level_dim * 4
        rows += 2 * r                      # fwd gather + bwd scatter
        traffic += 2 * r * wb * 2          # row read + output write
    # occupancy DDA trace: ~trace_res byte-lookups per ray
    rows += R * max(spec.finest_res // 2, 1)
    # optimizer reads/writes the whole table (p,m,v + grad) every step
    traffic += 7 * spec.total_rows * spec.level_dim * 4
    row_bound_ms = rows * GATHER_NS_PER_ROW * 1e-6
    bw_bound_ms = traffic / (HBM_GBPS * 1e9) * 1e3
    bound = "gather-row-count" if row_bound_ms >= bw_bound_ms else "hbm-bw"
    util = {
        "rows_per_step": int(rows),
        "row_bound_ms": round(row_bound_ms, 2),
        "hbm_gbps_achieved": round(traffic / (device_ms * 1e-3) / 1e9, 1),
        "hbm_frac": round(traffic / (device_ms * 1e-3) / 1e9 / HBM_GBPS, 3),
        "bound": bound,
        "bound_frac": round(max(row_bound_ms, bw_bound_ms) / device_ms, 2),
        "next_wall": "gather/scatter descriptor rate (~12 ns/row): fewer "
                     "executed rows needs fewer hashed-corner rows (more "
                     "dense levels) or tighter run budgets; HBM bytes and "
                     "MXU flops are both <2% of ceiling at this workload",
    }
    return util


def tracking_roofline(tracker, device_ms, ba_ms=None):
    """BA-association slice bound for the steady tracking frame: the
    dominant device cost is the P_live x D windowed-association dynamic
    slices (~125 ns each, near-flat in slice bytes — row-descriptor
    bound, docs/PERF.md round 3), executed once per association PASS
    (1 wide entry pass + reassoc_iters refine passes; the GN solve
    matmuls are 60-wide and negligible, and the association HBM traffic
    ~400 MB/frame is ~0.5 ms at the 819 GB/s ceiling — the slice
    DESCRIPTOR rate is the wall, not bandwidth or flops)."""
    stats = getattr(tracker.bundler, "_last_ba_stats", None)
    if not stats or "D" not in stats:
        return None
    # round-4 measured anatomy: at steady state the GN while_loop
    # (refine passes + all outer iterations) is ~2 ms — the ENTRY
    # association pass is the whole slice bill. In hybrid entry mode
    # only the Pw new-frame pairs pay windowed slices (~139 ns each,
    # measured); the other pairs pay ~12 ns/row projective gathers.
    bcfg = tracker.cfg_track["bundle"]
    hybrid = bcfg.get("assoc_entry_mode", "window") == "hybrid"
    p_win = stats.get("Pw", stats["P"]) if hybrid else stats["P"]
    slices = p_win * stats["D"]
    slice_bound_ms = slices * SLICE_NS * 1e-6 \
        + (stats["P"] - p_win) * stats["D"] * GATHER_NS_PER_ROW * 1e-6
    util = {
        "ba_pairs": stats["P"], "ba_windowed_pairs": p_win,
        "ba_dense_pts": stats["D"],
        "ba_slice_bound_ms": round(slice_bound_ms, 2),
        "bound": "assoc-slice-count",
        "bound_frac": round(slice_bound_ms / device_ms, 2),
        "next_wall": "entry-pass slice descriptors (Pw*D*~139ns): fewer "
                     "windowed pairs or a smaller dense bucket; the GN "
                     "solve itself is ~2 ms",
    }
    if ba_ms is not None:
        util["ba_device_ms"] = round(ba_ms, 2)
        util["ba_frac_of_frame"] = round(ba_ms / device_ms, 2)
    return util


def main():
    import jax
    import jax.numpy as jnp
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))
    from synthetic import cube_orbit_sequence
    from bundlesdf_tpu.config import default_nerf_config
    from bundlesdf_tpu.nof.runner import NofRunner, preprocess_frame_data
    from bundlesdf_tpu.utils.common import GLCAM_IN_CVCAM

    # reference online workload (config.yml): 480x640 frames, 2048 rays,
    # 64+64 samples, 4-level hash grid 16->128, 2^22 table
    seq = cube_orbit_sequence(n_frames=5, H=480, W=640, radius=0.45,
                              obj_size=0.08)
    translation = np.zeros(3)
    sc = 0.9 / 0.6
    cfg = default_nerf_config()
    cfg.update(dict(sc_factor=sc, translation=translation.tolist()))
    poses_gl = seq["cam_in_obs"] @ GLCAM_IN_CVCAM
    rgbs, depths, masks, normals, poses = preprocess_frame_data(
        seq["colors"].copy(), seq["depths"].copy(), seq["masks"].copy(), None,
        poses_gl.copy(), sc, translation)
    runner = NofRunner(cfg, rgbs, depths, masks, normals, poses, seq["K"])

    # warmup: compiles the fixed-length scan chunk once
    m = runner.train(n_steps=runner.scan_chunk)
    np.asarray(m["loss"])  # host sync

    # best of 3: run-to-run sigma through the dev tunnel is ~0.5 steps/s
    # quiet but tunnel congestion can inflate a single run 2-10x; the best
    # run is the least-congested estimate of the same fixed program
    n = 2 * runner.scan_chunk
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        m = runner.train(n_steps=n)
        np.asarray(m["loss"])  # host sync (block_until_ready is unreliable
        # through the axon tunnel; a host transfer is a real barrier)
        dt = min(dt, time.perf_counter() - t0)
    steps_per_sec = n / dt

    # hard per-step device time from a profiler trace (the wall steps/s
    # includes host dispatch; device-ms/step is the chip-bound claim)
    def traced():
        m = runner.train(n_steps=runner.scan_chunk)
        np.asarray(m["loss"])

    try:
        dev_ms = _trace_device_ms(traced, runner.scan_chunk)
    except Exception:
        dev_ms = None

    # reference: the torch+CUDA pipeline trains ~10 steps/s at this online
    # workload on an RTX-class GPU (501-step batches take ~1 min)
    rec = {
        "metric": "nof_train_steps_per_sec",
        "value": round(steps_per_sec, 2),
        "unit": "steps/s (2048 rays x 192 samples, 4-level grid)",
        "vs_baseline": round(steps_per_sec / 10.0, 2),
    }
    if dev_ms is not None:
        rec["device_ms_per_step"] = round(dev_ms, 2)
        try:
            rec["util"] = nof_roofline(runner, dev_ms)
        except Exception:
            pass
    print(json.dumps(rec), flush=True)

    bench_tracking()
    bench_pipeline()


def bench_tracking(n_frames=70, warmup=40):
    """Steady-state online tracking FPS (round-2 verdict item 2: the FPS
    target was the one thing bench.py didn't measure). 70/40: keyframe
    admission keeps minting shape buckets (pair-count, corres ladder,
    dense-point, keyframe-count) through ~frame 35 — a shorter warmup
    counts bucket compiles as steady frames."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))
    from synthetic import cube_orbit_sequence
    from bundlesdf_tpu.bundlesdf import BundleSdf
    from bundlesdf_tpu.config import default_nerf_config, default_track_config

    seq = cube_orbit_sequence(n_frames=n_frames, H=480, W=640, radius=0.45,
                              obj_size=0.10, full_angle=1.2)
    cfg = default_track_config()
    cfg["SPDLOG"] = 0  # no per-frame artifact dumps in the timed loop
    cfg["debug_dir"] = "/tmp/bench_tracking"
    cfg["stage_timing"] = True  # wall attribution table (PERF.md round 5)
    tracker = BundleSdf(cfg_track=cfg, cfg_nerf=default_nerf_config(),
                        start_nerf_keyframes=10 ** 9)  # NOF off: tracker only

    times = []
    n_traced = 10
    trace_from = n_frames - n_traced
    dev_ms = None
    for i in range(n_frames):
        if i == trace_from:
            # device-ms/frame over the last steady frames: the wall FPS
            # through the dev tunnel is RTT-bound (docs/PERF.md), so the
            # chip-side claim rides in the same JSON record
            import jax
            shutil.rmtree("/tmp/bench_track_trace", ignore_errors=True)
            jax.profiler.start_trace("/tmp/bench_track_trace")
        t0 = time.perf_counter()
        tracker.run(seq["colors"][i], seq["depths"][i].copy(), seq["K"],
                    seq["id_strs"][i], mask=seq["masks"][i])
        times.append(time.perf_counter() - t0)
    per_prog = None
    try:
        import jax
        jax.profiler.stop_trace()
        # normalize by the BA-span count, NOT n_traced: the tunnel
        # profiler skips replayed executables, so the window usually
        # captures fewer frames than dispatched (round 4: 1 of 10)
        attr = _trace_frame_attribution("/tmp/bench_track_trace")
        dev_ms, per_prog = attr if attr else (None, None)
    except Exception:
        dev_ms = None
    # steady state = the tail: jit compiles (one per shape bucket, ~10s
    # each through the dev tunnel) land over the first ~2/3 of the run as
    # keyframe-count buckets fill
    steady = np.asarray(times[-max(n_frames - warmup, 10):])
    fps = 1.0 / np.median(steady)

    tracker.flush_pipeline()
    rec = {
        "metric": "tracking_fps",
        "value": round(float(fps), 2),
        "unit": "frames/s (480x640, steady-state median, ORB matcher)",
        # reference "near real-time" ~10 FPS (paper abstract / readme.md:8)
        "vs_baseline": round(float(fps) / 10.0, 2),
    }
    if dev_ms is not None:
        rec["device_ms_per_frame"] = round(dev_ms, 2)
        # the wall FPS through the dev tunnel is RTT-bound (docs/PERF.md):
        # the chip-side number is the primary hardware claim
        rec["device_fps"] = round(1000.0 / dev_ms, 2)
        ba_ms = None
        if per_prog:
            ba_ms = next((v for k, v in per_prog.items()
                          if k.startswith("jit_bundle_adjust")), None)
            rec["device_ms_by_program"] = dict(
                sorted(per_prog.items(), key=lambda kv: -kv[1])[:4])
        util = tracking_roofline(tracker, dev_ms, ba_ms=ba_ms)
        if util is not None:
            rec["util"] = util
    # wall attribution: median per-stage host wall over the steady tail —
    # with async BA the frame's blocking waits are ba_finish_prev (pull of
    # the PREVIOUS frame's BA result + admission) and the match pulls;
    # everything else is host compute. device_ms_per_frame vs the sum of
    # these medians is the tunnel-RTT attribution table (PERF.md round 5).
    st = tracker.stage_stats[-max(n_frames - warmup, 10):]
    if st:
        keys = sorted({k for d in st for k in d})
        rec["wall_stage_ms"] = {
            k: round(float(np.median([d.get(k, 0.0) for d in st])) * 1e3, 1)
            for k in keys}
        rec["wall_ms_median"] = round(float(np.median(steady)) * 1e3, 1)
    print(json.dumps(rec), flush=True)


def bench_pipeline(n_frames=70, warmup=40):
    """Steady-state FPS of the ONLINE pipeline with NOF training
    concurrently — the reference's actual operating point (readme.md:8
    'near real-time' is claimed WITH the nerf process training;
    bundlesdf.py:571-599). Reference online NOF settings: batches of 500
    steps, sync_max_delay gating."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))
    from synthetic import cube_orbit_sequence
    from bundlesdf_tpu.bundlesdf import BundleSdf
    from bundlesdf_tpu.config import default_nerf_config, default_track_config

    seq = cube_orbit_sequence(n_frames=n_frames, H=480, W=640, radius=0.45,
                              obj_size=0.10, full_angle=1.2)
    cfg = default_track_config()
    cfg["SPDLOG"] = 0
    cfg["debug_dir"] = "/tmp/bench_pipeline"
    cfg_nerf = default_nerf_config()
    # overlap operating point: the reference DEFAULT is sync_max_delay=0
    # (strict sync — the tracker fully stalls for every 500-step NOF
    # batch, ~50 s on its GPU; the flagship benchmark runs measure that
    # end to end). Here the tracker runs up to 4 keyframes ahead while
    # the batch trains — the combined-throughput claim — with short scan
    # chunks so tracker dispatches don't queue behind ~1 s NOF scans.
    cfg_nerf["sync_max_delay"] = 4
    cfg_nerf["scan_chunk"] = 10
    tracker = BundleSdf(cfg_track=cfg, cfg_nerf=cfg_nerf,
                        start_nerf_keyframes=5)
    times = []
    t_run0 = time.perf_counter()
    for i in range(n_frames):
        t0 = time.perf_counter()
        tracker.run(seq["colors"][i], seq["depths"][i].copy(), seq["K"],
                    seq["id_strs"][i], mask=seq["masks"][i])
        times.append(time.perf_counter() - t0)
    t_frames = time.perf_counter() - t_run0
    # in-loop stall snapshot BEFORE the final drain: on_finish joins the
    # last batch + extracts the final mesh, which is post-video work the
    # user doesn't pay per frame — report it separately
    ps_inloop = dict(tracker.pipeline_stats)
    t_fin = time.perf_counter()
    tracker.on_finish()
    final_drain_s = time.perf_counter() - t_fin
    # MEAN over the steady tail (includes NOF-batch back-pressure stalls;
    # a median would hide them)
    steady = np.asarray(times[-max(n_frames - warmup, 10):])
    fps = 1.0 / float(steady.mean())
    n_batches = tracker.cnt_nerf + 1
    # single-chip physics: NOF batches are device work the one chip must
    # execute no matter how the host overlaps — frames / (NOF device
    # seconds + tracking device seconds) bounds the achievable mean.
    nof_steps = tracker.pipeline_stats.get(
        "nof_steps_total",
        tracker.nerf.global_step if tracker.nerf is not None else 0)
    dev_floor = None
    nof_dev_s = nof_steps * 18.7e-3  # measured device ms/step (util rec)
    trk_dev_s = n_frames * 43e-3     # measured device ms/frame (r4)
    if nof_steps:
        dev_floor = n_frames / (nof_dev_s + trk_dev_s)
    ps = dict(tracker.pipeline_stats)
    rec = {
        "metric": "pipeline_fps",
        "value": round(float(fps), 2),
        "unit": "frames/s (tracking WITH concurrent 500-step NOF batches, "
                "sync_max_delay=4, steady-state mean incl. sync stalls)",
        "vs_baseline": round(float(fps) / 10.0, 2),
        "nof_batches_trained": n_batches,
        "nof_steps_trained": int(nof_steps),
        "median_fps": round(1.0 / float(np.median(steady)), 2),
        "mean_fps_full_run": round(n_frames / t_frames, 2),
        # stall attribution (host wall seconds over the whole run):
        # prep = host batch prep (scene bounds/ray store/runner init),
        # dispatch = start_training enqueue, poll = non-blocking chunk
        # feed, sync = blocking finish_training drains, post = pose
        # sync-back (+ mesh extract when GUI/mesh_every_batch).
        # IN-LOOP only (what frames actually paid); the final batch
        # drain + mesh extract after the last frame is final_drain_s.
        "stalls_s": {k: round(v, 2) for k, v in ps_inloop.items()
                     if k.endswith("_s")},
        "final_drain_s": round(final_drain_s, 2),
        "n_sync_blocks": ps.get("n_sync_blocks", 0),
    }
    if dev_floor is not None:
        rec["device_floor_fps_single_chip"] = round(dev_floor, 2)
        # host-pipeline quality: how close the measured mean sits to the
        # single-chip physics floor. ~1.0 means every stall is device
        # work the one chip must execute anyway (NOF batches), not host
        # serialization — the remaining gap to real-time is a second
        # chip (nerf_device=1), not better overlap.
        rec["overlap_efficiency"] = round(float(fps) / dev_floor, 2)
        rec["note"] = ("floor = frames/(NOF+tracking device seconds) on "
                       "ONE chip; nerf_device=1 moves the NOF seconds to "
                       "a second chip (tests/test_nerf_device.py)")
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
