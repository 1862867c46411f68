"""Steady-state dispatch-count regression guard.

The round-3 tracking latency work collapsed the per-frame pipeline from
~12 device dispatches (+ several host pulls) to ~6 fused programs
(docs/PERF.md "tracking latency war"); through the dev tunnel every
dispatch costs 10-35 ms RTT, so a regression here is a direct FPS
regression that unit tests on outputs would never catch. This counts
actual executable launches (PjRtCpuExecutable::Execute) in a profiler
trace over steady-state frames of the fused tracking path and pins the
per-frame budget."""
import glob
import gzip
import json
import shutil

import jax
import numpy as np
import pytest

from synthetic import cube_orbit_sequence

from bundlesdf_tpu.bundlesdf import BundleSdf
from bundlesdf_tpu.config import default_nerf_config, default_track_config
from bundlesdf_tpu.matcher import OrbMatcher

# trace-measured steady-state launches/frame on this path is 4
# (preprocess+denoise 2, fused ref-match + fused window-match 2... the
# trace shows orb_lift x2, preprocess x2 incl. the denoise mask rewrite,
# BA x1) plus 1 on keyframe-admission frames (_slice_maps for the NOF
# feed); budget leaves headroom for bucket-boundary frames without
# letting eager-op creep or a per-pair dispatch chain (the round-2
# shape, ~12-23) back in.
BUDGET_PER_FRAME = 7
N, STEADY = 16, 4  # trace the last STEADY frames


def _count_executes(trace_dir):
    paths = sorted(glob.glob(trace_dir + "/**/*.trace.json.gz",
                             recursive=True))
    if not paths:
        return None
    ev = json.load(gzip.open(paths[-1]))
    ev = ev["traceEvents"] if isinstance(ev, dict) else ev
    return sum(1 for e in ev if e.get("ph") == "X"
               and e.get("name") == "PjRtCpuExecutable::Execute")


def test_steady_tracking_dispatch_budget(tmp_path):
    if jax.default_backend() != "cpu":
        pytest.skip("dispatch counting relies on the CPU executable name")
    seq = cube_orbit_sequence(n_frames=N, H=120, W=160, radius=0.45,
                              obj_size=0.08, full_angle=0.6)
    cfg = default_track_config()
    cfg["SPDLOG"] = 0
    cfg["debug_dir"] = str(tmp_path / "dispatch")
    cfg["feature_corres"]["fused_matcher"] = True  # the TPU hot path
    t = BundleSdf(cfg_track=cfg, cfg_nerf=default_nerf_config(),
                  start_nerf_keyframes=10 ** 9,
                  matcher=OrbMatcher(feat_cap=512))

    def step(i):
        t.run(seq["colors"][i], seq["depths"][i].copy(), seq["K"],
              seq["id_strs"][i], mask=seq["masks"][i])

    for i in range(N - STEADY):
        step(i)
    d = str(tmp_path / "trace")
    shutil.rmtree(d, ignore_errors=True)
    jax.profiler.start_trace(d)
    for i in range(N - STEADY, N):
        step(i)
    jax.profiler.stop_trace()
    n = _count_executes(d)
    assert n is not None, "no trace produced"
    # lower bound keeps the guard honest: a steady frame MUST launch at
    # least preprocess + one match program, so n ~ 0 means the executable
    # event name no longer matches and the budget check is vacuous
    assert n >= 2 * STEADY, (
        f"only {n} executable launches found over {STEADY} frames — the "
        "trace filter ('PjRtCpuExecutable::Execute') no longer matches")
    per_frame = n / STEADY
    assert per_frame <= BUDGET_PER_FRAME, (
        f"steady tracking now launches {per_frame:.1f} programs/frame "
        f"(budget {BUDGET_PER_FRAME}) — a dispatch-chain regression; "
        "see docs/PERF.md round-3 'tracking latency war'")
