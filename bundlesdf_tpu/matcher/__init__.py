"""Feature matching between frame pairs.

The reference uses a pretrained LoFTR network (`loftr_wrapper.py`,
`BundleTrack/LoFTR/`); this package provides the same `predict` contract:

    predict(rgbAs, rgbBs) -> list of (N,5) float arrays [uA,vA,uB,vB,conf]

Backends:
  - `classical.OrbMatcher` — cv2 ORB + mutual NN, weight-free fallback
  - `loftr.LoftrMatcher` — flax/JAX LoFTR-style dense matcher (pretrained
    weights required for parity)
  - `gt.GtMatcher` — GT-oracle debug matcher (ref
    FeatureManager.cpp:990-1039 findCorresbyGroundtruth)
"""
from bundlesdf_tpu.matcher.classical import OrbMatcher
from bundlesdf_tpu.matcher.gt import GtMatcher
