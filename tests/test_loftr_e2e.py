"""End-to-end synthetic run forced through the LoftrMatcher path (round-2
verdict item 4: every real run used ORB; the LoFTR wiring — pair warp,
batched predict, match mapping, corres lifting — was never exercised in a
full pipeline). Uses the tiny-golden random weights, so match QUALITY is
not asserted; the pipeline must run the LoFTR path, not crash, and emit a
pose per frame (FAIL frames carry the previous pose forward, which is the
reference's own behavior under bad matches)."""
import os

import numpy as np
import pytest

from synthetic import cube_orbit_sequence

from bundlesdf_tpu.bundlesdf import BundleSdf
from bundlesdf_tpu.config import default_nerf_config, default_track_config
from bundlesdf_tpu.matcher.loftr import (LoftrConfig, LoftrMatcher,
                                         convert_torch_state_dict)


def test_pipeline_runs_through_loftr_matcher(tmp_path):
    path = os.path.join(os.path.dirname(__file__), "fixtures",
                        "loftr_golden_tiny.npz")
    d = np.load(path)
    sd = {k[3:]: d[k] for k in d.files if k.startswith("sd/")}
    cfg_l = LoftrConfig(initial_dim=8, block_dims=(8, 12, 16), d_coarse=16,
                        d_fine=8, nhead=2, n_coarse_layers=2,
                        n_fine_layers=1, match_thr=0.0, max_matches=64)
    matcher = LoftrMatcher(cfg=cfg_l, params=convert_torch_state_dict(
        sd, cfg_l))

    n = 4
    seq = cube_orbit_sequence(n_frames=n, H=72, W=96, full_angle=0.15)
    cfg = default_track_config()
    cfg["debug_dir"] = str(tmp_path)
    cfg["bundle"]["max_BA_frames"] = 4
    cfg["bundle"]["depth_association_radius"] = 2
    cfg["feature_corres"]["resize"] = 64   # tiny net wants tiny crops
    cfg["feature_corres"]["min_match_with_ref"] = 3
    b = BundleSdf(cfg_track=cfg, cfg_nerf=default_nerf_config(),
                  start_nerf_keyframes=99, matcher=matcher)
    assert type(b.matcher).__name__ == "LoftrMatcher"

    calls = {"n": 0}
    orig_predict = matcher.predict

    def spy(rgbAs, rgbBs):
        calls["n"] += 1
        return orig_predict(rgbAs, rgbBs)

    matcher.predict = spy
    for i in range(n):
        b.run(seq["colors"][i], seq["depths"][i].copy(), seq["K"],
              seq["id_strs"][i], mask=seq["masks"][i])
    b.on_finish()

    assert calls["n"] >= n - 1, "LoFTR predict was never exercised"
    for i in range(n):
        pose = np.loadtxt(tmp_path / "ob_in_cam" / f"{i:04d}.txt")
        assert pose.shape == (4, 4)
        assert np.isfinite(pose).all()
