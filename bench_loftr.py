"""LoFTR TPU inference throughput (round-2 verdict item 4: full-scale
parity is tested in tests/test_loftr_fullscale.py; this measures jitted
batched inference pairs/s on the TPU so the matcher path has a hardware
number even though no pretrained ckpt ships in the image).

Reference comparison point: the torch LoFTR runs batch-64 inference on
the GPU inside the pipeline (loftr_wrapper.py:43-56); the published
indoor-model timing is ~10-15 pairs/s at 640x480 on an RTX-class GPU.

Prints one JSON line per batch size.
"""
from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    from bundlesdf_tpu.matcher.loftr import LoftrConfig, LoftrMatcher

    rng = np.random.default_rng(0)
    # the pipeline feeds mask-bbox crops zoomed to 400x400 (ref
    # loftr_wrapper.py:30, cfg_track image size); random weights — the
    # compute cost is weight-independent
    imgs = (rng.uniform(0, 255, (64, 400, 400)).astype(np.uint8))

    for amp in (False, True):
        m = LoftrMatcher(seed=0, cfg=LoftrConfig(amp=amp))
        for batch in (8, 64):
            a = [imgs[i] for i in range(batch)]
            b = [imgs[(i + 1) % batch] for i in range(batch)]
            m.predict(a, b)  # warmup/compile for this bucket
            n_rep = 3
            t0 = time.perf_counter()
            for _ in range(n_rep):
                out = m.predict(a, b)
            dt = time.perf_counter() - t0
            print(json.dumps({
                "metric": "loftr_pairs_per_sec",
                "amp": amp,
                "batch": batch,
                "value": round(n_rep * batch / dt, 2),
                "unit": "pairs/s (400x400, jitted batched inference)",
                "platform": jax.devices()[0].platform,
                "n_matches_first_pair": int(len(out[0])),
            }), flush=True)


if __name__ == "__main__":
    main()
