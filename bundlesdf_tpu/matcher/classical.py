"""Classical weight-free matcher: ORB keypoints + mutual nearest neighbor.

Drop-in for the LoFTR wrapper contract (`loftr_wrapper.py:19-82`): takes
batches of RGB pair images, returns per-pair (N,5) [uA,vA,uB,vB,conf].
Used when no pretrained LoFTR weights are available (the reference requires
downloading `outdoor_ds.ckpt`, readme.md:30-31); accuracy is lower but the
full pipeline runs.
"""
from __future__ import annotations

import cv2
import numpy as np


class OrbMatcher:
    def __init__(self, n_features: int = 2000, ratio: float = 0.85):
        self.orb = cv2.ORB_create(nfeatures=n_features, fastThreshold=5)
        self.ratio = ratio
        self.bf = cv2.BFMatcher(cv2.NORM_HAMMING)

    def _detect(self, img):
        gray = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY) if img.ndim == 3 else img
        kps, des = self.orb.detectAndCompute(gray, None)
        return kps, des

    def predict(self, rgbAs, rgbBs):
        out = []
        for imgA, imgB in zip(rgbAs, rgbBs):
            kA, dA = self._detect(np.asarray(imgA))
            kB, dB = self._detect(np.asarray(imgB))
            if dA is None or dB is None or len(kA) < 2 or len(kB) < 2:
                out.append(np.zeros((0, 5), np.float32))
                continue
            # ratio test both directions -> mutual consistency
            mAB = self.bf.knnMatch(dA, dB, k=2)
            mBA = self.bf.knnMatch(dB, dA, k=2)
            fwd = {}
            for m in mAB:
                if len(m) == 2 and m[0].distance < self.ratio * m[1].distance:
                    fwd[m[0].queryIdx] = m[0]
            bwd = {}
            for m in mBA:
                if len(m) == 2 and m[0].distance < self.ratio * m[1].distance:
                    bwd[m[0].queryIdx] = m[0].trainIdx
            rows = []
            for qi, m in fwd.items():
                if bwd.get(m.trainIdx, -1) == qi:
                    uA, vA = kA[qi].pt
                    uB, vB = kB[m.trainIdx].pt
                    conf = 1.0 / (1.0 + m.distance / 64.0)
                    rows.append([uA, vA, uB, vB, conf])
            out.append(np.asarray(rows, np.float32).reshape(-1, 5))
        return out
