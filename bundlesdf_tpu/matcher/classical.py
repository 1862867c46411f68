"""Classical weight-free matcher: ORB keypoints + mutual nearest neighbor.

Drop-in for the LoFTR wrapper contract (`loftr_wrapper.py:19-82`): takes
batches of RGB pair images, returns per-pair (N,5) [uA,vA,uB,vB,conf].
Used when no pretrained LoFTR weights are available (the reference requires
downloading `outdoor_ds.ckpt`, readme.md:30-31); accuracy is lower but the
full pipeline runs.
"""
from __future__ import annotations

import functools

import cv2
import jax
import jax.numpy as jnp
import numpy as np


class OrbMatcher:
    # per-frame feature cache capacity (keyframes + window)
    CACHE_CAP = 256

    def __init__(self, n_features: int = 2000, ratio: float = 0.75,
                 ratio_loose: float = 0.85, min_strict: int = 0,
                 feat_cap: int | None = None):
        """@ratio: mutual ratio test threshold. The GT-oracle diagnostic
        (docs/PERF.md) showed tracking error is match-ambiguity-bound:
        0.75 tracks ~2.7x tighter than the old 0.85 default with zero extra
        FAILs on the benchmark orbit (0.70 is tighter still at >=240p but
        match-starves small/low-texture crops). @ratio_loose/@min_strict: OPT-IN
        two-tier fallback (min_strict > 0) — pairs whose strict-gate match
        count falls below min_strict rerun at ratio_loose. Measured to
        COST accuracy wherever it triggers (2.9 -> 5.8 mm at min_strict=5
        on the easy orbit) without rescuing degenerate wide-baseline
        sequences, hence disabled by default; it exists as a safety valve
        for match-starved real-world footage."""
        self.orb = cv2.ORB_create(nfeatures=n_features, fastThreshold=5)
        self.ratio = ratio
        self.ratio_loose = ratio_loose
        self.min_strict = int(min_strict)
        self.bf = cv2.BFMatcher(cv2.NORM_HAMMING)
        self._cache: dict[int, tuple] = {}
        if feat_cap is not None:
            self.FEAT_CAP = int(feat_cap)

    def _detect(self, img):
        gray = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY) if img.ndim == 3 else img
        kps, des = self.orb.detectAndCompute(gray, None)
        return kps, des

    @staticmethod
    def _mutual_ratio(mAB, mBA, ratio):
        """[(queryIdx, trainIdx, distance)] passing the two-way ratio +
        mutual-NN tests at @ratio."""
        fwd = {}
        for m in mAB:
            if len(m) == 2 and m[0].distance < ratio * m[1].distance:
                fwd[m[0].queryIdx] = m[0]
        bwd = {}
        for m in mBA:
            if len(m) == 2 and m[0].distance < ratio * m[1].distance:
                bwd[m[0].queryIdx] = m[0].trainIdx
        return [(qi, m.trainIdx, m.distance) for qi, m in fwd.items()
                if bwd.get(m.trainIdx, -1) == qi]

    def _mutual_ratio_adaptive(self, dA, dB):
        """Strict ratio when it yields enough matches, loose otherwise
        (same semantics as the in-program gate in orb_match_core)."""
        mAB = self.bf.knnMatch(dA, dB, k=2)
        mBA = self.bf.knnMatch(dB, dA, k=2)
        pairs = self._mutual_ratio(mAB, mBA, self.ratio)
        if (len(pairs) < self.min_strict
                and self.ratio_loose > self.ratio):
            pairs = self._mutual_ratio(mAB, mBA, self.ratio_loose)
        return pairs

    def _match_feats(self, kA, dA, kB, dB):
        if dA is None or dB is None or len(kA) < 2 or len(kB) < 2:
            return np.zeros((0, 5), np.float32)
        rows = []
        for qi, tj, dist in self._mutual_ratio_adaptive(dA, dB):
            uA, vA = kA[qi].pt
            uB, vB = kB[tj].pt
            rows.append([uA, vA, uB, vB, 1.0 / (1.0 + dist / 64.0)])
        return np.asarray(rows, np.float32).reshape(-1, 5)

    def _match_feats_np(self, uvA, dA, uvB, dB):
        """Cached-descriptor variant of _match_feats (uv arrays, not cv2
        KeyPoint objects)."""
        if dA is None or dB is None or len(uvA) < 2 or len(uvB) < 2:
            return np.zeros((0, 5), np.float32)
        rows = [[*uvA[qi], *uvB[tj], 1.0 / (1.0 + dist / 64.0)]
                for qi, tj, dist in self._mutual_ratio_adaptive(dA, dB)]
        return np.asarray(rows, np.float32).reshape(-1, 5)

    def predict(self, rgbAs, rgbBs):
        out = []
        for imgA, imgB in zip(rgbAs, rgbBs):
            kA, dA = self._detect(np.asarray(imgA))
            kB, dB = self._detect(np.asarray(imgB))
            out.append(self._match_feats(kA, dA, kB, dB))
        return out

    # -- frame-keyed fast path ---------------------------------------------
    # ORB's oriented BRIEF descriptors are in-plane-rotation invariant, so
    # (unlike LoFTR) the pair canonicalization warp of processImagePair
    # (FeatureManager.cpp:126-257) is unnecessary: detect ONCE per frame
    # (cropped to the mask bbox), cache by frame id, and match cached
    # descriptors for ALL pairs in one device dispatch — hamming distance
    # becomes a +/-1 MXU matmul (sim = 256 - 2*hamming), with the ratio +
    # mutual-NN tests vectorized on device. cv2's BFMatcher took ~74 ms/
    # pair host-side; the batched device matcher does every pair at once.

    FEAT_CAP = 2048    # padded descriptor count per frame (device shapes)
    DETECT_SIZE = 400  # canonical crop size for detection (ref resize)

    def _frame_feats(self, frame):
        hit = self._cache.get(frame.id)
        if hit is not None:
            return hit
        gray = cv2.cvtColor(np.asarray(frame.color), cv2.COLOR_RGB2GRAY)
        mask = (np.asarray(frame.fg_mask) > 0).astype(np.uint8)
        # detect on the mask bbox crop, zoomed to a canonical size (the
        # reference's processImagePair resizes crops to 400x400 — the zoom
        # is what gives ORB enough texture on small/distant objects; here
        # it is per-FRAME with no rotation warp, so features are cached)
        vs, us = np.nonzero(mask)
        if len(vs) == 0:
            entry = (np.zeros((0, 2), np.float32), None, None, None)
            self._cache[frame.id] = entry
            return entry
        m = 10
        v0, v1 = max(vs.min() - m, 0), min(vs.max() + m + 1, mask.shape[0])
        u0, u1 = max(us.min() - m, 0), min(us.max() + m + 1, mask.shape[1])
        crop = gray[v0:v1, u0:u1]
        cmask = mask[v0:v1, u0:u1]
        zoom = self.DETECT_SIZE / max(crop.shape)
        if abs(zoom - 1.0) > 0.05:
            size = (max(int(round(crop.shape[1] * zoom)), 8),
                    max(int(round(crop.shape[0] * zoom)), 8))
            crop = cv2.resize(crop, size, interpolation=cv2.INTER_LINEAR)
            cmask = cv2.resize(cmask, size, interpolation=cv2.INTER_NEAREST)
            zoom_uv = (size[0] / (u1 - u0), size[1] / (v1 - v0))
        else:
            zoom_uv = (1.0, 1.0)
        kps, des = self.orb.detectAndCompute(crop, cmask)
        if des is None or len(kps) == 0:
            entry = (np.zeros((0, 2), np.float32), None, None, None)
        else:
            uv = (np.array([k.pt for k in kps], np.float32) / zoom_uv
                  + (u0, v0))
            if len(uv) > self.FEAT_CAP:
                order = np.argsort([-k.response for k in kps])[:self.FEAT_CAP]
                uv, des = uv[order], des[order]
            # +/-1 bit expansion for the MXU hamming matmul, padded to the
            # cap and cached ON DEVICE as int8: re-uploading the expanded
            # batch each call cost ~32MB/call through the tunnel
            bits = np.unpackbits(des, axis=1).astype(np.int8) * 2 - 1
            bits_p = np.zeros((self.FEAT_CAP, bits.shape[1]), np.int8)
            bits_p[:len(bits)] = bits
            uv_p = np.zeros((self.FEAT_CAP, 2), np.float32)
            uv_p[:len(uv)] = uv
            entry = (uv, des, jnp.asarray(bits_p), jnp.asarray(uv_p))
        if len(self._cache) >= self.CACHE_CAP:
            self._cache.pop(next(iter(self._cache)))
        self._cache[frame.id] = entry
        return entry

    def match_frames(self, frame_pairs):
        """@frame_pairs: [(fA, fB)] tracker Frame objects. Returns per-pair
        (N,5) [uA,vA,uB,vB,conf] in FULL-RES pixel coords. One device
        dispatch matches every pair."""
        feats = [(self._frame_feats(fA), self._frame_feats(fB))
                 for fA, fB in frame_pairs]
        live = [i for i, ((_, dA, *_), (_, dB, *_)) in enumerate(feats)
                if dA is not None and dB is not None]
        out = [np.zeros((0, 5), np.float32)] * len(frame_pairs)
        if not live:
            return out
        if jax.default_backend() == "cpu":
            # the MXU matmul matcher loses to cv2's SIMD hamming on CPU
            for i in live:
                (uvA, dA, *_), (uvB, dB, *_) = feats[i]
                out[i] = self._match_feats_np(uvA, dA, uvB, dB)
            return out
        # pair-count bucket: each distinct P compiles its own program
        # (seconds through the tunnel); 1 covers the per-frame ref match,
        # 8/16 the BA-window batches
        P = next(b for b in (1, 8, 16, 32, 64, 128, 256) if b >= len(live))
        F = self.FEAT_CAP
        nbits = feats[live[0]][0][2].shape[1]
        # pad constant cached on device (a fresh jnp.zeros is an eager
        # device launch — one tunnel RTT — per call)
        zero = getattr(self, "_zero_dev", None)
        if zero is None or zero.shape != (F, nbits):
            zero = self._zero_dev = jnp.zeros((F, nbits), jnp.int8)
        colA, colB = [], []
        nA = np.zeros(P, np.int32)
        nB = np.zeros(P, np.int32)
        for k, i in enumerate(live):
            (uvA, _, bitsA, _), (uvB, _, bitsB, _) = feats[i]
            colA.append(bitsA)
            colB.append(bitsB)
            nA[k], nB[k] = len(uvA), len(uvB)
        colA += [zero] * (P - len(live))
        colB += [zero] * (P - len(live))
        # cached device arrays go in as a tuple pytree and are stacked
        # INSIDE the program (a host-side jnp.stack was one extra dispatch
        # = one extra tunnel RTT per call); ONE device_get pulls all three
        # outputs together
        res = jax.device_get(_orb_match_batch(
            tuple(colA), tuple(colB), jnp.asarray(nA), jnp.asarray(nB),
            float(self.ratio), nbits, float(self.ratio_loose),
            int(self.min_strict)))
        j_best, accept, dist = res["j"], res["ok"], res["dist"]
        for k, i in enumerate(live):
            (uvA, *_), (uvB, *_) = feats[i]
            sel = np.nonzero(accept[k, :len(uvA)])[0]
            j = j_best[k, sel]
            conf = 1.0 / (1.0 + dist[k, sel] / 64.0)
            rows = np.concatenate([uvA[sel], uvB[j], conf[:, None]],
                                  axis=1).astype(np.float32)
            out[i] = rows
        return out


@functools.partial(jax.jit, static_argnames=("ratio", "nbits",
                                             "ratio_loose", "min_strict"))
def _orb_match_batch(bitsA, bitsB, nA, nB, ratio: float, nbits: int,
                     ratio_loose: float = 0.0, min_strict: int = 0):
    """Batched mutual-ratio hamming matching on the MXU.

    @bitsA/@bitsB: length-P tuples of (F,nbits) +/-1 int8 arrays (padded
    rows are all -1 but are masked out via @nA/@nB); stacked in-program.
    sim = bitsA @ bitsB^T in [-nbits, nbits]; hamming = (nbits - sim)/2.
    Ratio test (best < ratio * second-best) in both directions + mutual-NN,
    exactly the host _match_feats semantics (incl. the adaptive loose
    fallback; see orb_match_core).
    """
    return orb_match_core(jnp.stack(bitsA), jnp.stack(bitsB), nA, nB,
                          ratio, nbits, ratio_loose, min_strict)


def orb_match_core(bitsA, bitsB, nA, nB, ratio, nbits, ratio_loose=None,
                   min_strict: int = 0):
    """Traceable core of the batched MXU hamming matcher (shared with the
    fused orb+lift+RANSAC program, tracker/pool.py).
    @bitsA/@bitsB: (P,F,nbits) stacked +/-1 int8.

    Adaptive ratio: the GT-oracle diagnostic (docs/PERF.md) showed pose
    error is match-ambiguity-bound — a strict ratio (0.7) tracks ~4x
    tighter than 0.85 — but strict starves hard wide-baseline pairs into
    the FAIL cascade. Both gates come out of the SAME distance matrix, so
    each pair uses the strict mask when it yields >= @min_strict matches
    and the @ratio_loose mask otherwise, at zero extra device cost."""
    if ratio_loose is None or ratio_loose <= ratio or min_strict <= 0:
        ratio_loose = ratio
        min_strict = 0
    # bf16 distance-matrix exactness holds only while every hamming
    # distance (<= nbits) and the 512 sentinel are exactly representable
    # in bf16's 8-bit mantissa; a wider descriptor (> 256 bits) would
    # silently corrupt argmin/ratio results, so fall back to f32 there
    dist_dtype = jnp.bfloat16 if nbits <= 256 else jnp.float32

    def one(bA, bB, na, nb):
        # int8 +/-1 bits -> bf16 for the MXU; f32 accumulation is exact
        # (sums bounded by nbits=256)
        sim = jax.lax.dot_general(
            bA.astype(jnp.bfloat16), bB.astype(jnp.bfloat16),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # (F,F)
        F = sim.shape[0]
        colmask = jnp.arange(F) < nb
        rowmask = jnp.arange(F) < na
        # the (F,F) distance matrix stays in bf16: hamming distances are
        # integers <= nbits=256, all EXACTLY representable in bf16 (8-bit
        # mantissa), so every min/argmin over it is bit-identical to f32
        # at half the HBM traffic — the top-2 reductions over the 2048^2
        # matrices are this program's dominant cost (round-4 trace). The
        # masked sentinel 512 is exact in bf16 and > any real distance.
        # Only the per-row F-vectors are cast back to f32 so the ratio
        # products keep exact reference semantics.
        dist = ((nbits - sim) * 0.5).astype(dist_dtype)
        big = dist_dtype(512.0)
        bigf = jnp.float32(512.0)
        d = jnp.where(colmask[None, :] & rowmask[:, None], dist, big)
        iota = jnp.arange(F)
        # row direction: best + runner-up. The runner-up uses a fused
        # where-mask over the matrix instead of .at[].set (a TPU scatter
        # would materialize a second (F,F) copy).
        j1 = jnp.argmin(d, axis=1)
        d1 = jnp.min(d, axis=1).astype(jnp.float32)
        d2 = jnp.min(jnp.where(iota[None, :] == j1[:, None], big, d),
                     axis=1).astype(jnp.float32)
        # column direction
        i1 = jnp.argmin(d, axis=0)
        c1 = jnp.min(d, axis=0).astype(jnp.float32)
        c2 = jnp.min(jnp.where(iota[:, None] == i1[None, :], big, d),
                     axis=0).astype(jnp.float32)
        big = bigf

        # with < 2 candidates on either side the runner-up distance is the
        # masked sentinel and the ratio test is vacuous; the host path
        # (knnMatch len==2 filter) rejects such pairs — match it
        two = (na >= 2) & (nb >= 2)

        def gate(r):
            row_ok = (d1 < r * d2) & rowmask & (d1 < big)
            col_ok = (c1 < r * c2) & colmask & (c1 < big)
            # mutual: A_i's best j maps back to i and passes its own ratio
            return row_ok & (i1[j1] == jnp.arange(F)) & col_ok[j1] & two

        ok = gate(ratio)
        if min_strict > 0:
            ok = jnp.where(jnp.sum(ok) >= min_strict, ok,
                           gate(ratio_loose))
        return {"j": j1, "ok": ok, "dist": d1}

    return jax.vmap(one)(bitsA, bitsB, nA, nB)
