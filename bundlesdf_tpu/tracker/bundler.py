"""Bundler: keyframe pool, correspondence store, per-frame tracking pipeline.

Python re-design of the reference C++ `Bundler` (`Bundler.cpp`) plus the
live-path pieces of `SiftManager`/`GluNet` (`FeatureManager.cpp`): the
pipeline control flow (FAIL cascade, ref reselection, keyframe admission,
BA window selection) is host-side; per-pair geometry (correspondence
lifting/gating, RANSAC, covisibility, bundle adjustment) dispatches to
batched jitted kernels.
"""
from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np

from bundlesdf_tpu.ops.preprocess import compute_covisibility
from bundlesdf_tpu.tracker.ba import BAConfig, bundle_adjust, downsample_maps
from bundlesdf_tpu.tracker.frame import Frame, FrameStatus
from bundlesdf_tpu.tracker.ransac import ransac_pose
from bundlesdf_tpu.utils.se3 import kabsch, rot_geodesic_ignore_cam_z


def _pad_to(arr, n, fill=0.0):
    pad = n - arr.shape[0]
    if pad <= 0:
        return arr[:n]
    width = [(0, pad)] + [(0, 0)] * (arr.ndim - 1)
    return np.pad(arr, width, constant_values=fill)


def _round_up(n, base=256):
    return max(base, -(-n // base) * base)


class Bundler:
    """@cfg: tracker config dict (schema of config_ho3d.yml).
    @matcher: object with predict(imgA_batch, imgB_batch) -> list of (N,5)
    [uA,vA,uB,vB,conf] arrays (the LoFTR-wrapper contract,
    loftr_wrapper.py:28-82)."""

    def __init__(self, cfg, matcher=None):
        self.cfg = cfg
        self.matcher = matcher
        self.frames: dict[int, Frame] = {}
        self.keyframes: list[Frame] = []
        self.first_frame: Frame | None = None
        self.new_frame: Frame | None = None
        self.local_frames: list[Frame] = []
        # (idA,idB) -> dict of match arrays; idA > idB always
        self.matches: dict[tuple[int, int], dict] = {}
        # frame_id -> {(u,v) -> map point track {frame_id: (u,v)}}
        self._map_points: dict[int, dict] = {}
        self._rng = np.random.default_rng(0)
        self._key = jax.random.PRNGKey(0)

    # ------------------------------------------------------------------
    # covisibility (ref Frame.h:122-165 via ops kernel)
    # ------------------------------------------------------------------
    def covisibility(self, fA: Frame, fB: Frame) -> float:
        A_in_B = np.linalg.inv(fB.pose_in_model) @ fA.pose_in_model
        valid = jnp.asarray((fA.depth > 0.1) & (fA.fg_mask > 0))
        return float(compute_covisibility(
            fA.xyz_dev, fA.normal_dev, valid,
            jnp.asarray(A_in_B, jnp.float32),
            visible_angle_deg=self.cfg["visible_angle"]))

    # ------------------------------------------------------------------
    # correspondence construction (ref rawMatchesToCorres + makeCorrespondence
    # FeatureManager.cpp:1545-1584, 2720-2769)
    # ------------------------------------------------------------------
    def raw_matches_to_corres(self, fA: Frame, fB: Frame, uv):
        """@uv: (N,>=4) [uA,vA,uB,vB(,conf)] full-resolution pixel matches.
        Lifts to 3D with validity gating; stores the match table."""
        key = (fA.id, fB.id)
        if uv is None or len(uv) == 0:
            self.matches[key] = None
            return
        uv = np.asarray(uv)
        uA = np.round(uv[:, 0]).astype(int)
        vA = np.round(uv[:, 1]).astype(int)
        uB = np.round(uv[:, 2]).astype(int)
        vB = np.round(uv[:, 3]).astype(int)
        conf = uv[:, 4] if uv.shape[1] > 4 else np.ones(len(uv))
        inb = ((uA >= 0) & (uA < fA.W) & (vA >= 0) & (vA < fA.H)
               & (uB >= 0) & (uB < fB.W) & (vB >= 0) & (vB < fB.H))
        uA, vA, uB, vB, conf = uA[inb], vA[inb], uB[inb], vB[inb], conf[inb]
        pA = fA.xyz_map[vA, uA]
        pB = fB.xyz_map[vB, uB]
        nA = fA.normal_map[vA, uA]
        nB = fB.normal_map[vB, uB]
        ok = (pA[:, 2] > 0.1) & (pB[:, 2] > 0.1)
        self.matches[key] = {
            "uvA": np.stack([uA[ok], vA[ok]], -1),
            "uvB": np.stack([uB[ok], vB[ok]], -1),
            "pA_cam": pA[ok], "pB_cam": pB[ok],
            "nA_cam": nA[ok], "nB_cam": nB[ok],
            "conf": conf[ok].astype(np.float32),
        }

    def n_matches(self, fA: Frame, fB: Frame) -> int:
        m = self.matches.get((fA.id, fB.id))
        return 0 if m is None else len(m["conf"])

    # ------------------------------------------------------------------
    # map points: persistent multi-frame feature tracks
    # (ref updateFramePairMapPoints FeatureManager.cpp:854-891 and
    # findCorresByMapPoints :939-970; enabled by feature_corres.map_points)
    # ------------------------------------------------------------------
    def update_map_points(self, fA: Frame, fB: Frame):
        """Merge the (post-RANSAC) inlier matches of a pair into map-point
        tracks. A map point is a dict {frame_id: (u,v)} shared via each
        frame's `map_points` registry."""
        m = self.matches.get((fA.id, fB.id))
        if m is None or len(m["conf"]) == 0:
            return
        regA = self._map_points.setdefault(fA.id, {})
        regB = self._map_points.setdefault(fB.id, {})
        for (uA, vA), (uB, vB) in zip(map(tuple, m["uvA"]),
                                      map(tuple, m["uvB"])):
            if (uA, vA) in regA and (uB, vB) in regB:
                continue
            mpt = regB.get((uB, vB))
            if mpt is None:
                mpt = {fB.id: (uB, vB)}
                regB[(uB, vB)] = mpt
            mpt[fA.id] = (uA, vA)
            regA[(uA, vA)] = mpt

    def propagate_matches(self, fA: Frame, fB: Frame):
        """uv matches implied by shared map points (marked propagated in
        the reference; used to seed/augment pair matching). Returns
        (P,5) [uA,vA,uB,vB,conf] or empty."""
        regA = self._map_points.get(fA.id, {})
        rows = []
        for (uA, vA), mpt in regA.items():
            if fB.id in mpt:
                uB, vB = mpt[fB.id]
                rows.append([uA, vA, uB, vB, 1.0])
        return np.asarray(rows, np.float32).reshape(-1, 5)

    # ------------------------------------------------------------------
    # RANSAC filtering (ref runRansacMultiPairGPU FeatureManager.cpp:1587)
    # ------------------------------------------------------------------
    def run_ransac(self, pairs):
        cfg = self.cfg["ransac"]
        for fA, fB in pairs:
            m = self.matches.get((fA.id, fB.id))
            if m is None or len(m["conf"]) == 0:
                continue
            # model-frame points under current poses
            TA = fA.pose_in_model
            TB = fB.pose_in_model
            pA_w = m["pA_cam"] @ TA[:3, :3].T + TA[:3, 3]
            pB_w = m["pB_cam"] @ TB[:3, :3].T + TB[:3, 3]
            nA_w = m["nA_cam"] @ TA[:3, :3].T
            nB_w = m["nB_cam"] @ TB[:3, :3].T

            neighbor = (fA.ref_frame_id == fB.id and fA.id == fB.id + 1)
            if neighbor:
                max_trans = cfg["max_trans_neighbor"]
                max_rot = np.deg2rad(cfg["max_rot_deg_neighbor"])
            elif fA.ref_frame_id != fB.id:
                max_trans = cfg["max_trans_no_neighbor"]
                max_rot = np.deg2rad(cfg["max_rot_no_neighbor"])
            else:
                max_trans, max_rot = np.inf, np.inf

            M = _round_up(len(m["conf"]))
            valid = _pad_to(np.ones(len(m["conf"]), bool), M, False)
            self._key, k = jax.random.split(self._key)
            out = ransac_pose(
                k, jnp.asarray(_pad_to(pA_w, M), jnp.float32),
                jnp.asarray(_pad_to(pB_w, M), jnp.float32),
                jnp.asarray(_pad_to(nA_w, M), jnp.float32),
                jnp.asarray(_pad_to(nB_w, M), jnp.float32),
                jnp.asarray(_pad_to(m["conf"], M), jnp.float32),
                jnp.asarray(valid),
                cfg["inlier_dist"],
                float(np.cos(np.deg2rad(cfg["inlier_normal_angle"]))),
                max_trans, max_rot, n_trials=cfg["max_iter"])
            inlier = np.asarray(out["inlier_mask"])[:len(m["conf"])]
            if inlier.sum() < cfg["min_match_after_ransac"]:
                logging.info(f"ransac {fA.id_str}-{fB.id_str}: "
                             f"{int(inlier.sum())} inliers, cleared")
                self.matches[(fA.id, fB.id)] = None
                continue
            self.matches[(fA.id, fB.id)] = {k2: v[inlier]
                                            for k2, v in m.items()}

    # ------------------------------------------------------------------
    # pose from correspondences (ref procrustesByCorrespondence
    # FeatureManager.cpp:1050-1129)
    # ------------------------------------------------------------------
    def procrustes(self, fA: Frame, fB: Frame):
        m = self.matches.get((fA.id, fB.id))
        if m is None or len(m["conf"]) < 5:
            return np.eye(4)
        TA = fA.pose_in_model
        TB = fB.pose_in_model
        src = m["pA_cam"] @ TA[:3, :3].T + TA[:3, 3]
        dst = m["pB_cam"] @ TB[:3, :3].T + TB[:3, 3]
        T = np.asarray(kabsch(jnp.asarray(src, jnp.float32),
                              jnp.asarray(dst, jnp.float32)), np.float64)
        err = np.linalg.norm(src @ T[:3, :3].T + T[:3, 3] - dst) / len(src)
        logging.debug(f"procrustes {fA.id_str}-{fB.id_str} err/pt {err:.2e}")
        return T

    # ------------------------------------------------------------------
    # keyframe admission (ref checkAndAddKeyframe Bundler.cpp:263-323)
    # ------------------------------------------------------------------
    def check_and_add_keyframe(self, frame: Frame) -> bool:
        if frame.id == 0:
            self.keyframes.append(frame)
            return True
        if frame.status != FrameStatus.OTHER:
            return False
        kf_cfg = self.cfg["keyframe"]
        n_valid = frame.count_valid_points()
        if n_valid < self.first_frame.count_valid_points() / 10.0:
            return False
        min_rot = np.deg2rad(kf_cfg["min_rot"])
        for kf in self.keyframes:
            # camera rotation diversity ignoring roll around camera Z
            rot_diff = float(rot_geodesic_ignore_cam_z(
                jnp.asarray(frame.pose_in_model[:3, :3].T),
                jnp.asarray(kf.pose_in_model[:3, :3].T)))
            if rot_diff < min_rot:
                return False
        for kf in self.keyframes:
            if self.covisibility(frame, kf) > kf_cfg["min_visible"]:
                return False
        self.keyframes.append(frame)
        logging.info(f"added keyframe {frame.id_str}, "
                     f"#keyframes={len(self.keyframes)}")
        return True

    # ------------------------------------------------------------------
    # BA window selection (ref selectKeyFramesForBA Bundler.cpp:430-526,
    # default method normal_orientation_nearest)
    # ------------------------------------------------------------------
    def select_keyframes_for_ba(self):
        max_ba = self.cfg["bundle"]["max_BA_frames"]
        frames = [self.new_frame]
        if len(self.keyframes) + 1 <= max_ba:
            frames += [kf for kf in self.keyframes if kf is not self.new_frame]
        else:
            vis = [(self.covisibility(self.new_frame, kf), kf)
                   for kf in self.keyframes]
            vis.sort(key=lambda x: -x[0])
            for _, kf in vis:
                if kf is self.new_frame:
                    continue
                frames.append(kf)
                if len(frames) == max_ba:
                    break
        frames.sort(key=lambda f: f.id)
        self.local_frames = frames

    # ------------------------------------------------------------------
    # match-pair gating (ref getFeatureMatchPairs Bundler.cpp:781-807)
    # ------------------------------------------------------------------
    def get_feature_match_pairs(self, frames):
        pairs = []
        min_vis = self.cfg["bundle"]["non_neighbor_min_visible"]
        for i in range(len(frames)):
            for j in range(i + 1, len(frames)):
                fA, fB = frames[j], frames[i]
                if (fA.id, fB.id) in self.matches:
                    continue
                if np.allclose(fA.pose_in_model, np.eye(4)):
                    continue
                vis = self.covisibility(fA, fB)
                if vis < min_vis:
                    self.matches[(fA.id, fB.id)] = None
                    continue
                pairs.append((fA, fB))
        return pairs

    # ------------------------------------------------------------------
    # frame eviction (ref forgetFrame + SiftManager::forgetFrame)
    # ------------------------------------------------------------------
    def forget_frame(self, frame: Frame) -> bool:
        if frame in self.keyframes and frame.status != FrameStatus.FAIL:
            return False
        self.frames.pop(frame.id, None)
        if frame in self.keyframes:
            self.keyframes.remove(frame)
        for key in [k for k in self.matches if frame.id in k]:
            del self.matches[key]
        # purge map-point observations (ref SiftManager::forgetFrame
        # FeatureManager.cpp:467-511)
        for mpt in self._map_points.pop(frame.id, {}).values():
            mpt.pop(frame.id, None)
        return True

    # ------------------------------------------------------------------
    # GN bundle adjustment driver (ref optimizeGPU Bundler.cpp:810-956)
    # ------------------------------------------------------------------
    def optimize(self, frames):
        bcfg = self.cfg["bundle"]
        idx_of = {f.id: k for k, f in enumerate(frames)}

        corr_i, corr_j, pi, pj = [], [], [], []
        for a in range(len(frames)):
            for b in range(a + 1, len(frames)):
                fA, fB = frames[b], frames[a]
                m = self.matches.get((fA.id, fB.id))
                if m is None or len(m["conf"]) == 0:
                    continue
                # EntryJ convention: j=frameA index, i=frameB index
                n = len(m["conf"])
                corr_j += [idx_of[fA.id]] * n
                corr_i += [idx_of[fB.id]] * n
                pj.append(m["pA_cam"])
                pi.append(m["pB_cam"])

        if not corr_i:
            logging.info(f"frame {self.new_frame.id_str}: zero global corres,"
                         " FAIL")
            self.new_frame.status = FrameStatus.FAIL
            return

        C = _round_up(len(corr_i))
        corr_i_a = _pad_to(np.array(corr_i, np.int32), C)
        corr_j_a = _pad_to(np.array(corr_j, np.int32), C)
        pi_a = _pad_to(np.concatenate(pi), C)
        pj_a = _pad_to(np.concatenate(pj), C)
        valid = _pad_to(np.ones(len(corr_i), np.float32), C)

        # pad the window to max_BA_frames so the BA kernel compiles once:
        # padded slots get zero maps (no dense residuals) and pinned poses
        N_pad = int(bcfg["max_BA_frames"])
        N = len(frames)
        xyz = jnp.stack([f.xyz_dev for f in frames]
                        + [jnp.zeros_like(frames[0].xyz_dev)] * (N_pad - N))
        nrm = jnp.stack([f.normal_dev for f in frames]
                        + [jnp.zeros_like(frames[0].normal_dev)] * (N_pad - N))
        factor = int(bcfg["image_downscale"][0]
                     if isinstance(bcfg["image_downscale"], (list, tuple))
                     else bcfg["image_downscale"])
        xyz_d, nrm_d, K_d = downsample_maps(xyz, nrm,
                                            frames[0].K.astype(np.float32),
                                            factor)
        pair_ij = np.array([(i, j) for i in range(N_pad) for j in range(N_pad)
                            if i < j], np.int32)
        update_flags = np.zeros(N_pad, np.float32)
        for k, f in enumerate(frames):
            if k > 0 and not f.nerfed:
                update_flags[k] = 1.0

        cfg_ba = BAConfig(
            n_outer=bcfg["num_iter_outter"],
            image_downscale=factor,
            dense_dist_thres=self.cfg["p2p"]["max_dist"],
            dense_normal_thres_deg=self.cfg["p2p"]["max_normal_angle"],
            assoc_radius=int(bcfg["depth_association_radius"]),
            robust_delta=bcfg["robust_delta"],
            w_sparse=bcfg["w_fm"], w_dense=bcfg["w_p2p"])

        poses0 = np.stack([f.pose_in_model for f in frames]
                          + [np.eye(4)] * (N_pad - N)).astype(np.float32)
        poses = np.asarray(bundle_adjust(
            jnp.asarray(poses0), K_d, xyz_d, nrm_d, jnp.asarray(pair_ij),
            jnp.asarray(corr_i_a), jnp.asarray(corr_j_a),
            jnp.asarray(pi_a, jnp.float32), jnp.asarray(pj_a, jnp.float32),
            jnp.asarray(valid), jnp.asarray(update_flags), cfg_ba))

        # abnormal-pose-change rejection vs temporal neighbor
        # (ref Bundler.cpp:927-946)
        nf = self.new_frame
        if nf.ref_frame_id == nf.id - 1 and nf.ref_frame_id in self.frames:
            ref = self.frames[nf.ref_frame_id]
            k_new = idx_of[nf.id]
            new_pose = poses[k_new].astype(np.float64)
            t_new = np.linalg.inv(new_pose)[:3, 3]
            t_ref = np.linalg.inv(ref.pose_in_model)[:3, 3]
            trans_diff = np.linalg.norm(t_new - t_ref)
            R1 = np.linalg.inv(new_pose)[:3, :3]
            R2 = np.linalg.inv(ref.pose_in_model)[:3, :3]
            cosang = np.clip((np.trace(R1 @ R2.T) - 1) / 2, -1, 1)
            rot_diff = np.arccos(cosang)
            if trans_diff > self.cfg["ransac"]["max_trans_neighbor"]:
                logging.info(f"frame {nf.id_str} BA trans jump {trans_diff:.4f}"
                             " too big, FAIL")
                nf.status = FrameStatus.FAIL
                return
            if rot_diff > np.deg2rad(self.cfg["ransac"]["max_rot_deg_neighbor"]):
                logging.info(f"frame {nf.id_str} BA rot jump too big, FAIL")
                nf.status = FrameStatus.FAIL
                return

        for k, f in enumerate(frames):
            f.pose_in_model = poses[k].astype(np.float64)
