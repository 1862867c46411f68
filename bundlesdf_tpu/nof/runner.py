"""NofRunner — per-video Neural Object Field trainer.

Functional re-design of the reference `NerfRunner` (`nerf_runner.py:112-433`):
same inputs (normalized keyframe images/depths/masks/normals + GL poses +
point cloud for the acceleration structure), same outputs (optimized poses,
mesh), but the training loop is a single donated lax.scan on device
(nof/train.py) and the octree is a dense occupancy grid (ops/occupancy.py).

Ray construction (`make_frame_rays` nerf_runner.py:246-316) happens once on
host in numpy; the resulting ray store is a dict of device arrays.
"""
from __future__ import annotations

import logging
import os

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import optax
from scipy.spatial import cKDTree

from bundlesdf_tpu.mesh import Mesh, marching_tetrahedra
from bundlesdf_tpu.nof.losses import LossConfig
from bundlesdf_tpu.nof.models import NofSpec, init_nof_params, nof_sdf
from bundlesdf_tpu.nof.render import RenderConfig, render_rays
from bundlesdf_tpu.nof.train import (TrainConfig, make_optimizer, train_steps)
from bundlesdf_tpu.ops.hashgrid import HashGridSpec
from bundlesdf_tpu.ops.occupancy import OccupancyGrid, build_occupancy_grid
from bundlesdf_tpu.utils.common import BAD_COLOR, BAD_DEPTH, GLCAM_IN_CVCAM


def preprocess_frame_data(rgbs, depths, masks, normal_maps, poses, sc_factor,
                          translation):
    """Normalize raw keyframe data into NOF space (ref `preprocess_data`
    nerf_helpers.py:218-240): sentinel-fill masked-out pixels, scale depth,
    normalize poses. Arrays are modified copies."""
    rgbs = np.array(rgbs)
    depths = np.array(depths, np.float32)
    poses = np.array(poses, np.float64)
    depths[depths < 0.1] = BAD_DEPTH
    if masks is not None:
        masks = np.array(masks)
        rgbs[masks == 0] = BAD_COLOR
        depths[masks == 0] = BAD_DEPTH
        if normal_maps is not None:
            normal_maps = np.array(normal_maps)
            normal_maps[..., [1, 2]] *= -1  # to OpenGL
            normal_maps[masks == 0] = 0
        masks = masks[..., None]
    rgbs = (rgbs / 255.0).astype(np.float32)
    depths = depths * sc_factor
    depths = depths[..., None]
    poses[:, :3, 3] += translation
    poses[:, :3, 3] *= sc_factor
    return rgbs, depths, masks, normal_maps, poses


def get_camera_rays_np(H, W, K):
    """Pinhole rays in the OpenGL convention (y up, z backward), matching
    `get_camera_rays_np` (nerf_helpers.py:358-363)."""
    i, j = np.meshgrid(np.arange(W, dtype=np.float32),
                       np.arange(H, dtype=np.float32), indexing="xy")
    return np.stack([(i - K[0, 2]) / K[0, 0], -(j - K[1, 2]) / K[1, 1],
                     -np.ones_like(i)], axis=-1)


def ray_box_near_far(origins, dirs, bounds):
    """Per-ray entry/exit of an AABB; returns z-depth (|unit_dir.z| scaled)
    near/far and a hit mask (ref `ray_box_intersection_batch`
    nerf_helpers.py:403-446 + `compute_near_far_and_filter_rays`
    nerf_runner.py:39-65)."""
    dirs_unit = dirs / (np.linalg.norm(dirs, axis=-1, keepdims=True) + 1e-10)
    inv = 1.0 / np.where(np.abs(dirs_unit) < 1e-12, 1e-12, dirs_unit)
    t0 = (bounds[0] - origins) * inv
    t1 = (bounds[1] - origins) * inv
    tmin = np.minimum(t0, t1)
    tmax = np.maximum(t0, t1)
    tmin = np.where(tmin < 0, 0.0, tmin)  # per-axis clamp as in the reference
    near = tmin.max(axis=-1)
    far = tmax.min(axis=-1)
    hit = near <= far
    return near, far, hit


class NofRunner:
    """Owns NOF params/optimizer/ray store for one (growing) keyframe set.

    @cfg: NOF config dict (schema of config.yml) with 'sc_factor' and
    'translation' already set.
    @images/depths/masks/normal_maps: outputs of `preprocess_frame_data`.
    @poses: (F,4,4) normalized GL cam-to-object.
    @build_octree_pts: (N,3) normalized cloud for the occupancy grid.
    """

    def __init__(self, cfg, images, depths, masks, normal_maps, poses, K,
                 occ_masks=None, build_octree_pts=None, seed=0,
                 exp_logger=None):
        self.cfg = cfg
        # experiment scalar/artifact sink (ref attaches a sacred _run,
        # nerf_runner.py:569-576,820-822); cfg 'experiment_log: <dir>'
        # enables the JSONL default, or inject any ExperimentLogger
        if exp_logger is None:
            from bundlesdf_tpu.utils.explog import make_experiment_logger
            exp_logger = make_experiment_logger(cfg)
        self.exp_logger = exp_logger
        self.images = np.asarray(images)
        self.depths = np.asarray(depths)
        self.masks = np.asarray(masks)
        self.normal_maps = None if normal_maps is None else np.asarray(normal_maps)
        self.occ_masks = None if occ_masks is None else np.asarray(occ_masks)
        self.poses = np.asarray(poses, np.float64)
        self.K = np.asarray(K, np.float64).copy()
        self.build_octree_pts = (None if build_octree_pts is None
                                 else np.asarray(build_octree_pts))
        self.mesh = None
        self.global_step = 0
        self.N_iters = cfg["n_step"] + 1

        down = int(cfg.get("down_scale_ratio", 1))
        if down != 1:
            H, W = self.images.shape[1:3]
            self.images = self.images[:, ::down, ::down]
            self.depths = self.depths[:, ::down, ::down]
            self.masks = self.masks[:, ::down, ::down]
            if self.normal_maps is not None:
                self.normal_maps = self.normal_maps[:, ::down, ::down]
            if self.occ_masks is not None:
                self.occ_masks = self.occ_masks[:, ::down, ::down]
            h2, w2 = self.images.shape[1:3]
            self.K[0] *= float(w2) / W
            self.K[1] *= float(h2) / H
        self.H, self.W = self.images.shape[1:3]

        sc = cfg["sc_factor"]
        self.occ_grid = self._build_occupancy()

        n_samples_total = cfg["N_samples"] + cfg["N_samples_around_depth"]
        grid = HashGridSpec(
            n_levels=cfg["num_levels"], level_dim=cfg["feature_grid_dim"],
            base_res=cfg["base_res"], finest_res=cfg["finest_res"],
            log2_hashmap_size=cfg["log2_hashmap_size"],
            ray_samples=n_samples_total,
            table_bf16=bool(cfg.get("amp", True)))
        self.spec = NofSpec(
            grid=grid, sh_degree=cfg["multires_views"],
            frame_features=cfg["frame_features"],
            n_frames=self._frame_bucket(len(self.images)),
            max_trans=cfg["max_trans"] * sc, max_rot_deg=cfg["max_rot"],
            use_viewdirs=bool(cfg["use_viewdirs"]),
            i_embed=int(cfg.get("i_embed", 1)),
            i_embed_views=int(cfg.get("i_embed_views", 2)),
            multires=int(cfg.get("multires", 8)))
        # field-query residuals scale with rays*samples*levels; remat when
        # they would threaten HBM (the 16-level global-refine config OOMs
        # without it)
        residual_gb = (cfg["N_rand"] * n_samples_total * cfg["num_levels"]
                       * 8 * cfg["feature_grid_dim"] * 2 * 4) / 1e9
        self.rcfg = RenderConfig(
            n_samples=cfg["N_samples"],
            n_samples_around_depth=cfg["N_samples_around_depth"],
            trunc=cfg["trunc"] * sc, neg_trunc_ratio=cfg["neg_trunc_ratio"],
            sdf_lambda=cfg["sdf_lambda"], near=cfg["near"] * sc,
            far=cfg["far"] * sc,
            # DDA step count: n_steps >= trace_res keeps the no-skip
            # guarantee (ops/occupancy.py); the coarse trace halves both
            # the rows and the steps
            n_trace_steps=int(cfg.get("n_trace_steps",
                                      self.occ_grid.trace_res or 128)),
            raw_noise_std=cfg["raw_noise_std"],
            n_importance=int(cfg.get("N_importance", 0)),
            n_importance_iter=int(cfg.get("N_importance_iter", 1)),
            remat=bool(cfg.get("remat", residual_gb > 1.0)),
            compute_bf16=bool(cfg.get("amp", True)),
            eikonal=float(cfg["eikonal_weight"]) > 0)
        self.lcfg = LossConfig(
            rgb_weight=cfg["rgb_weight"], fs_weight=cfg["fs_weight"],
            empty_weight=cfg["empty_weight"], trunc_weight=cfg["trunc_weight"],
            fs_rgb_weight=cfg["fs_rgb_weight"],
            eikonal_weight=cfg["eikonal_weight"],
            feature_reg_weight=cfg["feature_reg_weight"],
            pose_reg_weight=cfg["pose_reg_weight"],
            first_frame_weight=cfg["first_frame_weight"],
            fs_sdf=cfg["fs_sdf"], near=cfg["near"] * sc, far=cfg["far"] * sc,
            neg_trunc_ratio=cfg["neg_trunc_ratio"])
        self.tcfg = TrainConfig(
            n_step=cfg["n_step"], n_rand=cfg["N_rand"], lrate=cfg["lrate"],
            lrate_pose=cfg["lrate_pose"], decay_rate=cfg["decay_rate"],
            trunc=cfg["trunc"] * sc, trunc_start=cfg["trunc_start"] * sc,
            trunc_decay_type=cfg["trunc_decay_type"])

        self.key = jax.random.PRNGKey(seed)
        self.key, k_init = jax.random.split(self.key)
        self.params = init_nof_params(k_init, self.spec)
        if not cfg["optimize_poses"]:
            # pose gradients still flow but are multiplied by lr 0
            self.tcfg = TrainConfig(**{**self.tcfg.__dict__, "lrate_pose": 0.0})
        self.opt_state = make_optimizer().init(self.params)
        self.c2w_array = self._pad_c2w(self.poses)

        self._rays_host = self._build_ray_store()
        self.rays = self._pad_ray_store(self._rays_host)

        # data-parallel ray training over a device mesh (cfg 'dp_devices'
        # > 1): the scanned train step runs under shard_map with the ray
        # store sharded across devices and gradients pmean'd over ICI
        # (parallel/dp.py). The canonical single-device self.rays stays
        # authoritative for render/BA/export paths; the sharded copy is
        # rebuilt lazily whenever the store changes.
        self.dp_mesh = None
        self._dp_rays = None
        n_dp = int(cfg.get("dp_devices", 0))
        if n_dp > 1:
            devs = jax.devices()
            if len(devs) >= n_dp:
                from bundlesdf_tpu.parallel.dp import make_ray_mesh
                self.dp_mesh = make_ray_mesh(devs[:n_dp])
            else:
                logging.warning(f"dp_devices={n_dp} but only {len(devs)} "
                                "devices visible; training single-device")

        # two-device tracker||NOF placement (SURVEY §2.3 "tracker and NOF
        # can share a chip or use 2 devices"): cfg 'nerf_device: <idx>'
        # commits the NOF state (params/opt/rays/occupancy) to that device
        # so every training dispatch executes there, off the tracker's
        # chip — the single-chip mode serializes 500-step batches against
        # tracking on one instruction stream (docs/PERF.md pipeline
        # anatomy). Mutually exclusive with ray-DP (dp_devices).
        self.device = None
        nd = int(cfg.get("nerf_device", -1))
        if nd >= 0 and self.dp_mesh is None:
            devs = jax.devices()
            if nd < len(devs):
                self.device = devs[nd]
            else:
                logging.warning(f"nerf_device={nd} but only {len(devs)} "
                                "devices visible; staying on default")
        self._commit_state()

    def _commit_state(self):
        """Commit the persistent NOF state to the configured nerf_device
        (no-op otherwise). Committed inputs make every downstream jit
        execute on that device; dispatch-time scalars are uncommitted and
        follow."""
        if self.device is None:
            return
        (self.params, self.opt_state, self.rays, self.c2w_array,
         self.occ_grid) = jax.device_put(
            (self.params, self.opt_state, self.rays, self.c2w_array,
             self.occ_grid), self.device)

    def _dispatch_train_steps(self, chunk: int, k):
        """One train_steps dispatch, routed to the single-chip scan or the
        shard_map DP variant when a dp mesh is configured."""
        if self.dp_mesh is None:
            return train_steps(
                self.params, self.opt_state, self.rays, self.c2w_array,
                self.occ_grid, k,
                jnp.asarray(self.global_step, dtype=jnp.int32), self.spec,
                self.rcfg, self.lcfg, self.tcfg, chunk, self.N_iters,
                n_valid=jnp.asarray(self.n_rays_valid, jnp.int32))
        from bundlesdf_tpu.parallel.dp import shard_rays, train_steps_dp
        if self._dp_rays is None:
            self._dp_rays, self._dp_n_valid = shard_rays(
                self.rays, self.dp_mesh, n_valid=self.n_rays_valid)
        return train_steps_dp(
            self.params, self.opt_state, self._dp_rays, self.c2w_array,
            self.occ_grid, k, jnp.asarray(self.global_step, jnp.int32),
            self.dp_mesh, self.spec, self.rcfg, self.lcfg, self.tcfg,
            chunk, self.N_iters, n_valid_local=self._dp_n_valid)

    # -- dataset -----------------------------------------------------------

    def _build_occupancy(self) -> OccupancyGrid:
        """Occupancy grid from the (normalized) scene cloud with the
        reference's voxel-size and dilation math (`build_octree`
        nerf_runner.py:436-489)."""
        cfg = self.cfg
        sc = cfg["sc_factor"]
        vs = cfg["octree_smallest_voxel_size"] * sc
        max_level = int(np.ceil(np.log2(2.0 / vs)))
        res = 2 ** max_level
        dilate_radius = max(1, int(np.ceil(cfg["octree_dilate_size"]
                                           / cfg["octree_smallest_voxel_size"])))
        pts = self.build_octree_pts
        if pts is None:  # fall back to depth-projected cloud
            pts = self._depth_cloud()
        return build_occupancy_grid(pts, res=res, dilate_radius=dilate_radius,
                                    trace_factor=int(cfg.get("trace_factor",
                                                             2)))

    def _depth_cloud(self):
        pts = []
        for i in range(len(self.images)):
            d = self.depths[i, ..., 0]
            m = (self.masks[i, ..., 0] > 0) & (d > 0.1 * self.cfg["sc_factor"]) \
                & (d < BAD_DEPTH * self.cfg["sc_factor"] * 0.9)
            vs, us = np.nonzero(m)
            z = d[vs, us]
            x = (us - self.K[0, 2]) * z / self.K[0, 0]
            y = (vs - self.K[1, 2]) * z / self.K[1, 1]
            p_cam = np.stack([x, -y, -z], axis=-1)  # GL
            p_w = p_cam @ self.poses[i][:3, :3].T + self.poses[i][:3, 3]
            pts.append(p_w)
        return np.clip(np.concatenate(pts, axis=0), -1, 1)

    def make_frame_rays(self, frame_id):
        """Per-frame ray records (ref nerf_runner.py:246-316): GL dirs + rgb
        + depth + mask + frame id + type, mask-dilated, invalid-depth culled,
        near/far from the bounding box, occupancy-culled."""
        cfg = self.cfg
        sc = cfg["sc_factor"]
        mask = self.masks[frame_id, ..., 0].copy().astype(np.uint8)
        dirs = get_camera_rays_np(self.H, self.W, self.K)  # (H,W,3)
        depth = self.depths[frame_id, ..., 0]
        invalid_depth = ((depth < cfg["near"] * sc)
                         | (depth > cfg["far"] * sc)) & (mask > 0)

        down = int(cfg.get("down_scale_ratio", 1))
        if frame_id == 0:  # first-frame mask assumed perfect -> big dilation
            kernel = np.ones((100, 100), np.uint8)
        else:
            k = max(1, 60 // down)
            kernel = np.ones((k, k), np.uint8)
        mask = cv2.dilate(mask, kernel, iterations=1)
        if self.occ_masks is not None:
            mask[self.occ_masks[frame_id] > 0] = 0
        if cfg["rays_valid_depth_only"]:
            mask[invalid_depth] = 0

        vs, us = np.nonzero(mask > 0)
        if len(vs) == 0:
            return None
        rec = {
            "dirs": dirs[vs, us],
            "rgb": self.images[frame_id][vs, us].astype(np.float32),
            "depth": depth[vs, us].astype(np.float32),
            "mask": (self.masks[frame_id, ..., 0][vs, us] > 0).astype(np.float32),
            "frame_id": np.full(len(vs), frame_id, np.int32),
            "ray_type": np.zeros(len(vs), np.float32),
        }
        # near/far from the scene bounding box, in z-depth units
        bounds = np.array(cfg["bounding_box"], np.float64).reshape(2, 3)
        pose = self.poses[frame_id]
        d_world = rec["dirs"] @ pose[:3, :3].T
        o_world = np.broadcast_to(pose[:3, 3], d_world.shape)
        near, far, hit = ray_box_near_far(o_world, d_world, bounds)
        dz = np.abs(rec["dirs"][:, 2] / np.linalg.norm(rec["dirs"], axis=-1))
        rec["near"] = np.abs(near * dz).astype(np.float32)
        rec["far"] = np.abs(far * dz).astype(np.float32)
        rec = {k: v[hit] for k, v in rec.items()}
        return rec

    # -- shape bucketing: the scanned train program is compiled per input
    # shape; continual batches grow the ray store and frame count every
    # hand-off, which would recompile the whole program (~minutes through
    # the dev tunnel) per batch. Pad both to coarse buckets so one compile
    # serves every batch in the bucket; sampling draws only real rays.
    # Buckets grow 4x (not 2x): the padded store is dead memory only
    # (~48 MB/1M rays — the per-step sampler gathers N_rand rows bounded
    # by n_rays_valid, so padding costs zero compute), while every bucket
    # crossing is a full recompile that stalls the ONLINE pipeline
    # mid-run (docs/PERF.md pipeline anatomy), so trade memory for
    # crossings aggressively.
    @staticmethod
    def _ray_bucket(n: int) -> int:
        b = 1 << 16
        while b < n:
            b <<= 2
        return b

    @staticmethod
    def _frame_bucket(n: int) -> int:
        return -(-n // 16) * 16

    def _pad_ray_store(self, rays):
        """Pad on the HOST, then upload each array once. Building the
        padded store with eager jnp ops paid one device dispatch (+tunnel
        RTT) per op per key — ~12 s of a continual batch's prep went to
        exactly that (docs/PERF.md round-5 pipeline anatomy)."""
        n = int(rays["depth"].shape[0])
        self.n_rays_valid = n
        cap = self._ray_bucket(n)
        if cap == n:
            return {k: jnp.asarray(np.ascontiguousarray(v))
                    for k, v in rays.items()}
        # pad with copies of ray 0 (NOT zeros: a zero direction would NaN
        # under normalization if a sharded path ever samples the padding;
        # the single-chip sampler is bounded by n_rays_valid and never does)
        return {k: jnp.asarray(np.concatenate(
            [v, np.broadcast_to(v[:1], (cap - n,) + v.shape[1:])]))
            for k, v in rays.items()}

    def _pad_c2w(self, poses):
        F_cap = self._frame_bucket(len(poses))
        c2w = np.broadcast_to(np.eye(4, dtype=np.float32),
                              (F_cap, 4, 4)).copy()
        c2w[:len(poses)] = np.asarray(poses, np.float32)
        return jnp.asarray(c2w)

    def _build_ray_store(self, frame_range=None):
        if frame_range is None:
            frame_range = range(len(self.images))
        recs = [r for i in frame_range
                for r in [self.make_frame_rays(i)] if r is not None]
        rays = {k: np.concatenate([r[k] for r in recs], axis=0)
                for k in recs[0]}

        if self.cfg.get("denoise_depth_use_octree_cloud", True) \
                and self.build_octree_pts is not None:
            # flag rays whose lifted 3D point is far from the scene cloud
            # (ref nerf_runner.py:183-199)
            sc = self.cfg["sc_factor"]
            m = (rays["mask"] > 0) & (rays["depth"] <= self.cfg["far"] * sc)
            pts_cam = rays["dirs"][m] * rays["depth"][m][:, None]
            fids = rays["frame_id"][m]
            P = self.poses[fids]
            pts_w = np.einsum("nij,nj->ni", P[:, :3, :3], pts_cam) + P[:, :3, 3]
            kdtree = cKDTree(self.build_octree_pts)
            dists, _ = kdtree.query(pts_w, k=1, workers=-1)
            bad = dists > 0.02 * sc
            bad_ids = np.nonzero(m)[0][bad]
            keep = np.ones(len(rays["depth"]), bool)
            keep[bad_ids] = False
            rays = {k: v[keep] for k, v in rays.items()}
            logging.info(f"denoise dropped {int((~keep).sum())} rays")

        logging.info(f"ray store: {len(rays['depth'])} rays")
        return rays  # host numpy; _pad_ray_store uploads once

    # -- continual learning (ref add_new_frames nerf_runner.py:352-433) ----

    def add_new_frames(self, images, depths, masks, normal_maps, poses,
                       occ_masks=None, new_pcd=None, reuse_weights=False):
        """Append a new keyframe batch and retrain. @images...: only the NEW
        frames (already preprocessed); @poses: ALL frames' normalized GL
        poses (keyframe poses may have moved); @new_pcd: updated normalized
        scene cloud for the occupancy grid."""
        prev_n = len(self.images)
        down = int(self.cfg.get("down_scale_ratio", 1))
        if down != 1:
            images = images[:, ::down, ::down]
            depths = depths[:, ::down, ::down]
            masks = masks[:, ::down, ::down]
            if normal_maps is not None:
                normal_maps = normal_maps[:, ::down, ::down]
            if occ_masks is not None:
                occ_masks = occ_masks[:, ::down, ::down]
        self.images = np.concatenate([self.images, images], axis=0)
        self.depths = np.concatenate([self.depths, depths], axis=0)
        self.masks = np.concatenate([self.masks, masks], axis=0)
        if normal_maps is not None and self.normal_maps is not None:
            self.normal_maps = np.concatenate([self.normal_maps, normal_maps],
                                              axis=0)
        if occ_masks is not None and self.occ_masks is not None:
            self.occ_masks = np.concatenate([self.occ_masks, occ_masks],
                                            axis=0)
        self.poses = np.asarray(poses, np.float64).copy()
        self.c2w_array = self._pad_c2w(self.poses)

        if new_pcd is not None:
            from bundlesdf_tpu.scene.bounds import voxel_downsample
            self.build_octree_pts = voxel_downsample(np.asarray(new_pcd),
                                                     0.005)
            self.occ_grid = self._build_occupancy()

        old_params = self.params
        # n_frames is a padded bucket (static jit arg): only re-spec when a
        # bucket boundary is crossed so continual hand-offs reuse compiles
        self.spec = NofSpec(**{**self.spec.__dict__,
                               "n_frames": self._frame_bucket(
                                   len(self.images))})
        self.key, k_init = jax.random.split(self.key)
        self.params = init_nof_params(k_init, self.spec)
        if reuse_weights:
            # keep field weights; per-frame arrays restart except carried-over
            # feature rows (ref nerf_runner.py:385-397; delta poses are new)
            if "table" in old_params:
                self.params["table"] = old_params["table"]
            self.params["sigma_net"] = old_params["sigma_net"]
            self.params["color_net"] = old_params["color_net"]
            if "feature_array" in old_params:
                self.params["feature_array"] = (
                    self.params["feature_array"]
                    .at[:prev_n].set(old_params["feature_array"][:prev_n]))
        self.opt_state = make_optimizer().init(self.params)
        self.global_step = 0

        new_rays = self._build_ray_store(frame_range=range(prev_n,
                                                           len(self.images)))
        # host mirror: append + re-pad in numpy, ONE upload per key (the
        # old path sliced + concatenated the device store eagerly — a
        # device download + per-op dispatch chain through the tunnel)
        self._rays_host = {k: np.concatenate([self._rays_host[k],
                                              new_rays[k]], axis=0)
                           for k in self._rays_host}
        self.rays = self._pad_ray_store(self._rays_host)
        self._dp_rays = None  # sharded copy rebuilt from the new store
        self._commit_state()

    # -- training ----------------------------------------------------------

    # fixed scan length: the XLA compile of the scanned step is expensive
    # (minutes at full config) and scan programs are length-specific, so
    # train() always dispatches chunks of SCAN_CHUNK steps — one compile
    # serves every batch/epoch; a short remainder adds at most one more.
    # Big models (16-level global refine) use a shorter chunk: the len-50
    # program's compile crashes the TPU worker at that scale.
    SCAN_CHUNK = 50
    SCAN_CHUNK_BIG = 10

    @property
    def scan_chunk(self) -> int:
        # config override (scan_chunk): the online tracker||NOF overlap
        # wants SHORT chunks — tracker dispatches enqueue behind in-flight
        # NOF scans on the single device stream, so a 50-step chunk adds
        # up to ~1 s of stall per tracker sync (the reference's two-process
        # GPU timeshares at kernel granularity instead)
        o = int(self.cfg.get("scan_chunk", 0) or 0)
        if o > 0:
            return o
        return self.SCAN_CHUNK_BIG if self.rcfg.remat else self.SCAN_CHUNK

    def train(self, n_steps=None):
        """Run the remaining training steps as fixed-length on-device scans
        (ref train nerf_runner.py:855-863). Between chunks, the reference's
        interval hooks fire: loss print (i_print, nerf_runner.py:794-818),
        debug render (i_img :768-791), checkpoint (i_weights :744),
        mesh/pose dumps (i_mesh/i_pose :826-852). Returns stacked metrics."""
        n = self.N_iters if n_steps is None else n_steps
        all_metrics = []
        remaining = n
        while remaining > 0:
            chunk = (self.scan_chunk if remaining >= self.scan_chunk
                     else remaining)
            self.key, k = jax.random.split(self.key)
            self.params, self.opt_state, metrics = \
                self._dispatch_train_steps(chunk, k)
            prev_step = self.global_step
            self.global_step += chunk
            remaining -= chunk
            all_metrics.append(metrics)
            self._interval_hooks(prev_step, metrics)
        metrics = jax.tree.map(lambda *xs: jnp.concatenate(xs), *all_metrics)
        return self._pull_metrics(metrics)

    @staticmethod
    def _pull_metrics(metrics):
        """Device->host pull of a metrics dict as ONE transfer: per-key
        np.asarray pays a full tunnel RTT per key (~25 ms x 5 keys measured
        on the dev tunnel); the keys are all (n,) f32 so stack once."""
        names = sorted(metrics)
        host = np.asarray(jnp.stack([metrics[k] for k in names]))
        return {k: host[i] for i, k in enumerate(names)}

    # -- asynchronous training (tracker || NOF overlap) --------------------
    # The reference trains the NOF in a child process while the tracker
    # keeps processing frames, bounded by sync_max_delay
    # (bundlesdf.py:571-582). Single-process equivalent: JAX dispatch is
    # async, so chunks are enqueued WITHOUT host syncs and the tracker's
    # own device work interleaves behind them; interval hooks (which need
    # host values) are deferred to finish_training().

    def start_training(self, n_steps=None):
        """Begin an async training batch: dispatch the first chunk and
        return immediately. Drive with poll_training(); complete with
        finish_training()."""
        assert getattr(self, "_async", None) is None, "batch already running"
        self._async = {"remaining": (self.N_iters if n_steps is None
                                     else n_steps),
                       "metrics": [], "start_step": self.global_step}
        self.poll_training()

    def poll_training(self, max_chunks: int = 2, force: bool = False) -> bool:
        """Dispatch up to max_chunks further chunks if the device has
        drained the previous ones; True when all chunks are dispatched and
        the last one has completed. Never blocks the host unless @force
        (which enqueues regardless of readiness)."""
        st = self._async
        if st is None:
            return True
        for _ in range(max_chunks):
            if st["remaining"] <= 0:
                break
            if (not force and st["metrics"]
                    and not self._chunk_ready(st["metrics"][-1])):
                break
            chunk = min(self.scan_chunk, st["remaining"])
            self.key, k = jax.random.split(self.key)
            self.params, self.opt_state, metrics = \
                self._dispatch_train_steps(chunk, k)
            self.global_step += chunk
            st["remaining"] -= chunk
            st["metrics"].append(metrics)
        return (st["remaining"] <= 0
                and (not st["metrics"]
                     or self._chunk_ready(st["metrics"][-1])))

    @staticmethod
    def _chunk_ready(metrics) -> bool:
        leaf = jax.tree.leaves(metrics)[0]
        try:
            return bool(leaf.is_ready())
        except AttributeError:  # non-jax leaf / older runtime
            return True

    def finish_training(self):
        """Block until the async batch completes; fire the deferred
        interval hooks; return stacked host metrics."""
        st = self._async
        if st is None:
            return None
        while st["remaining"] > 0:
            self.poll_training(max_chunks=10 ** 6, force=True)
        metrics = jax.tree.map(lambda *xs: jnp.concatenate(xs),
                               *st["metrics"])
        metrics = self._pull_metrics(metrics)  # real host barrier, 1 pull
        self._async = None
        self._interval_hooks(st["start_step"], metrics)
        return metrics

    @property
    def training_in_flight(self) -> bool:
        return getattr(self, "_async", None) is not None

    def _crossed(self, prev, every):
        return every and every < 10 ** 8 \
            and (prev // every) != (self.global_step // every)

    def _interval_hooks(self, prev_step, metrics):
        cfg = self.cfg
        save_dir = cfg.get("save_dir", "")
        if self._crossed(prev_step, cfg.get("i_print", 0)):
            means = {k: float(np.asarray(v).mean())
                     for k, v in metrics.items()}
            logging.info(f"Iter {self.global_step}: " + ", ".join(
                f"{k}: {v:.5f}" for k, v in sorted(means.items())))
            self.exp_logger.log_scalars(means, self.global_step)
            self._check_run_budget()
        if self._crossed(prev_step, cfg.get("i_weights", 0)) and save_dir:
            ckpt = os.path.join(save_dir, "model_latest.npz")
            self.save_weights(ckpt)
            self.exp_logger.add_artifact(ckpt)
        if self._crossed(prev_step, cfg.get("i_img", 0)) and save_dir:
            self._save_debug_render(save_dir)
        if self._crossed(prev_step, cfg.get("i_mesh", 0)) and save_dir:
            mesh = self.extract_mesh()
            if mesh is not None:
                mesh_path = os.path.join(
                    save_dir,
                    f"step_{self.global_step:07d}_mesh_normalized_space.obj")
                mesh.export(mesh_path)
                self.exp_logger.add_artifact(mesh_path)
        if self._crossed(prev_step, cfg.get("i_pose", 0)) and save_dir:
            poses, _ = self.get_optimized_poses_in_real_world()
            np.savetxt(os.path.join(
                save_dir, f"step_{self.global_step:07d}_optimized_poses.txt"),
                poses.reshape(-1, 4))

    # overflow fraction above which the k_runs clamp is reported (the
    # measured online workload sits at ~1%; docs/PERF.md)
    RUN_BUDGET_WARN_FRAC = 0.02

    def _check_run_budget(self, n_rays=256):
        """Run-budget overflow telemetry (round-2 verdict: the k_runs
        clamp was a silent quality dial). Samples a training-like ray
        batch, measures the per-dense-level fraction of rays whose voxel
        runs exceed the budget, and warns when it exceeds the measured
        ~1% envelope so unusual configs aren't silently degraded."""
        if self.spec.i_embed != 1 or self.spec.grid.ray_samples == 0:
            return None
        from bundlesdf_tpu.ops.hashgrid import run_overflow_fractions
        self.key, k = jax.random.split(self.key)
        idx = jax.random.randint(k, (n_rays,), 0, self.n_rays_valid)
        batch = jax.tree.map(lambda a: a[idx], self.rays)
        out = render_rays(self.params, self.spec, self.rcfg, batch,
                          self.c2w_array, self.occ_grid, k, perturb=True)
        fracs = np.asarray(run_overflow_fractions(
            out["pts_w"].reshape(-1, 3), self.spec.grid))
        if len(fracs) and fracs.max() > self.RUN_BUDGET_WARN_FRAC:
            logging.warning(
                "hash-grid run budget exceeded: per-dense-level overflow "
                f"fractions {np.round(fracs, 4).tolist()} (> "
                f"{self.RUN_BUDGET_WARN_FRAC}); rays past the k_runs budget "
                "reuse the last run's features — raise grid k_runs for "
                "this workload")
        return fracs

    def _save_debug_render(self, save_dir):
        """Rendered-vs-GT color panel for the last training frame."""
        fid = len(self.images) - 1  # spec.n_frames is a padded bucket
        out, idx = self.render_frame(fid)
        if len(idx) == 0:
            return
        canvas = np.full((self.H, self.W, 3), 128, np.uint8)
        dirs = self._rays_host["dirs"][idx]
        us = np.clip(np.round(dirs[:, 0] / -dirs[:, 2] * self.K[0, 0]
                              + self.K[0, 2]).astype(int), 0, self.W - 1)
        vs = np.clip(np.round(-dirs[:, 1] / -dirs[:, 2] * self.K[1, 1]
                              + self.K[1, 2]).astype(int), 0, self.H - 1)
        canvas[vs, us] = np.clip(out["rgb_map"] * 255, 0, 255).astype(np.uint8)
        gt = np.clip(self.images[fid] * 255, 0, 255).astype(np.uint8)
        os.makedirs(save_dir, exist_ok=True)
        cv2.imwrite(os.path.join(save_dir,
                                 f"image_step_{self.global_step:07d}.png"),
                    np.concatenate([canvas, gt], axis=1)[..., ::-1])

    # -- feature-match BA in ray space (ref make_key_ray_ids + train_BA
    # nerf_runner.py:866-976): offline pose refinement that pulls the
    # depth-lifted world points of matched rays together ------------------

    def match_table_to_ray_pairs(self, matches_table, dilate=5):
        """Map a {(idA,idB): (N,4) uv matches} table to ray-store index
        pairs by nearest pixel (ref make_key_ray_ids)."""
        fx, fy = self.K[0, 0], self.K[1, 1]
        cx, cy = self.K[0, 2], self.K[1, 2]
        # the host mirror holds only real rays (no padding rows)
        dirs = self._rays_host["dirs"]
        fids = self._rays_host["frame_id"]
        # GL dirs -> pixel coords (ref dirs_to_uvs)
        us = dirs[:, 0] / -dirs[:, 2] * fx + cx
        vs = -dirs[:, 1] / -dirs[:, 2] * fy + cy
        uvs = np.stack([us, vs], -1)

        pairs = []
        for (idA, idB), uv in matches_table.items():
            if uv is None or len(uv) == 0:
                continue
            uv = np.asarray(uv)

            def kpts_to_ray_ids(kpts, fid):
                sel = np.nonzero(fids == fid)[0]
                if len(sel) == 0:
                    return None
                tree = cKDTree(uvs[sel])
                _, ind = tree.query(kpts, k=1, workers=-1)
                return sel[ind]

            ra = kpts_to_ray_ids(uv[:, :2], idA)
            rb = kpts_to_ray_ids(uv[:, 2:4], idB)
            if ra is None or rb is None:
                continue
            pairs.append(np.stack([ra, rb], -1))
        if not pairs:
            return np.zeros((0, 2), np.int64)
        return np.concatenate(pairs, axis=0)

    def train_ba(self, match_ray_ids, n_steps=200, max_dist=0.02):
        """Optimize only the pose corrections so matched rays' depth-lifted
        world points coincide (ref train_BA nerf_runner.py:932-976)."""
        if len(match_ray_ids) == 0:
            return None
        gather = lambda k, col: jnp.asarray(  # noqa: E731
            self._rays_host[k][match_ray_ids[:, col]])
        data = {s: {"dirs": gather("dirs", i), "depth": gather("depth", i),
                    "fid": gather("frame_id", i).astype(jnp.int32)}
                for i, s in enumerate("ab")}
        thresh = max_dist * self.cfg["sc_factor"]
        far = self.lcfg.far
        spec = self.spec
        c2w = self.c2w_array
        opt = make_optimizer()
        pose0 = self.params["pose_array"]
        ost = opt.init(pose0)
        lr = self.tcfg.lrate_pose or self.tcfg.lrate

        from bundlesdf_tpu.nof.models import pose_array_matrices

        def pts_world(pose_params, d):
            tf = pose_array_matrices(pose_params, d["fid"], spec.max_trans,
                                     spec.max_rot_deg) @ c2w[d["fid"]]
            pts = d["dirs"] * d["depth"][:, None]
            return (jnp.einsum("nij,nj->ni", tf[:, :3, :3], pts)
                    + tf[:, :3, 3])

        valid = (data["a"]["depth"] <= far) & (data["b"]["depth"] <= far)

        @jax.jit
        def run(pose_params, ost):
            def step(carry, _):
                p, s = carry

                def loss_fn(pp):
                    d = jnp.linalg.norm(pts_world(pp, data["a"])
                                        - pts_world(pp, data["b"]), axis=-1)
                    m = valid & (d < thresh)
                    return jnp.sum(d * m) / jnp.maximum(jnp.sum(m), 1)

                l, g = jax.value_and_grad(loss_fn)(p)
                u, s = opt.update(g, s)
                p = optax.apply_updates(p, jax.tree.map(lambda x: -lr * x, u))
                return (p, s), l

            (p, s), losses = jax.lax.scan(step, (pose_params, ost),
                                          None, length=n_steps)
            return p, losses

        pose_new, losses = run(pose0, ost)
        self.params["pose_array"] = pose_new
        return np.asarray(losses)

    # -- checkpointing (ref save_weights/load_weights nerf_runner.py:528-576)

    def save_weights(self, out_file):
        """Serialize model params + optimizer state + step to one npz."""
        flat, treedef = jax.tree_util.tree_flatten(
            {"params": self.params, "opt_state": self.opt_state})
        os.makedirs(os.path.dirname(os.path.abspath(out_file)), exist_ok=True)
        np.savez(out_file,
                 n_leaves=len(flat),
                 global_step=self.global_step,
                 **{f"leaf_{i}": np.asarray(a) for i, a in enumerate(flat)})

    def load_weights(self, ckpt_path):
        data = np.load(ckpt_path)
        flat = [jnp.asarray(data[f"leaf_{i}"])
                for i in range(int(data["n_leaves"]))]
        _, treedef = jax.tree_util.tree_flatten(
            {"params": self.params, "opt_state": self.opt_state})
        restored = jax.tree_util.tree_unflatten(treedef, flat)
        self.params = restored["params"]
        self.opt_state = restored["opt_state"]
        self.global_step = int(data["global_step"])
        self._commit_state()

    def copy_from(self, other, ignore=()):
        """Warm-start field weights from another runner
        (ref copy_from nerf_runner.py:507-525): shared nets copied, the
        per-frame arrays keep their first len(other) rows."""
        # real frame count, not the padded spec bucket; clamp to ours in
        # case the donor has more frames than this runner
        n_other = min(len(other.images), len(self.images))
        for k in ("table", "sigma_net", "color_net"):
            if k not in ignore and k in other.params:
                self.params[k] = other.params[k]
        for k in ("pose_array", "feature_array"):
            if k in self.params and k in other.params and k not in ignore:
                self.params[k] = (self.params[k].at[:n_other]
                                  .set(other.params[k][:n_other]))
        self.opt_state = make_optimizer().init(self.params)
        self._commit_state()

    # -- outputs -----------------------------------------------------------

    def extract_mesh(self, voxel_size=None, isolevel=0.0):
        """Dense SDF grid -> marching tetrahedra (ref extract_mesh
        nerf_runner.py:1351-1409). Occupancy-culled queries; non-occupied
        cells get SDF=1."""
        cfg = self.cfg
        voxel_size = (cfg["mesh_resolution"] if voxel_size is None
                      else voxel_size) * cfg["sc_factor"]
        bounds = np.array(cfg["bounding_box"], np.float64).reshape(2, 3)
        tx = np.arange(bounds[0, 0] + 0.5 * voxel_size, bounds[1, 0], voxel_size)
        ty = np.arange(bounds[0, 1] + 0.5 * voxel_size, bounds[1, 1], voxel_size)
        tz = np.arange(bounds[0, 2] + 0.5 * voxel_size, bounds[1, 2], voxel_size)
        query = np.stack(np.meshgrid(tx, ty, tz, indexing="ij"), -1)
        shape = query.shape[:3]
        flat = jnp.asarray(query.reshape(-1, 3), jnp.float32)

        from bundlesdf_tpu.ops.occupancy import query_occupancy
        valid = np.asarray(query_occupancy(self.occ_grid, flat))
        sigma = np.ones(len(flat), np.float32)
        if valid.any():
            chunk = 2 ** 18
            vi = np.nonzero(valid)[0]
            vals = []
            for s in range(0, len(vi), chunk):
                vals.append(np.asarray(
                    nof_sdf(self.params, self.spec, flat[vi[s:s + chunk]])))
            sigma[vi] = np.concatenate(vals)
        sigma = sigma.reshape(shape)

        verts, faces = marching_tetrahedra(sigma, isolevel)
        if len(faces) == 0:
            logging.info("extract_mesh: empty surface")
            return None
        # index coords -> normalized space
        offset = np.array([tx[0], ty[0], tz[0]])
        verts = verts * voxel_size + offset
        self.mesh = Mesh(verts, faces)
        return self.mesh

    def get_optimized_poses_in_real_world(self):
        """Apply pose corrections, undo normalization, anchor to frame 0,
        convert GL->CV (ref `get_optimized_poses_in_real_world`
        Utils.py:479-505). Returns (poses (F,4,4) cv cam-in-object, offset)."""
        sc = self.cfg["sc_factor"]
        translation = np.asarray(self.cfg["translation"]).reshape(3)
        poses_norm = self.poses.copy()

        original = poses_norm.copy()
        original[:, :3, 3] /= sc
        original[:, :3, 3] -= translation

        # HOST pose math (numpy twin of pose_array_matrices): the frame
        # count changes every batch, so the jnp path would retrace +
        # recompile per batch (~8 s each through the tunnel, round-5
        # pipeline anatomy); only the tiny (F,6) param pull hits the device
        from bundlesdf_tpu.utils.se3 import se3_exp_np
        theta = np.tanh(np.asarray(self.params["pose_array"],
                                   np.float64)[:len(poses_norm)])
        tau = np.concatenate([theta[:, :3] * self.spec.max_trans,
                              theta[:, 3:6] * (self.spec.max_rot_deg
                                               / 180.0 * np.pi)], axis=-1)
        tf = se3_exp_np(tau)
        tf[0] = np.eye(4)  # frame 0 pinned (PoseArray semantics)
        optimized = tf @ poses_norm
        optimized[:, :3, 3] /= sc
        optimized[:, :3, 3] -= translation

        offset = np.linalg.inv(optimized[0]) @ original[0]
        out = np.einsum("nij,jk->nik", optimized, offset)
        out = out @ GLCAM_IN_CVCAM
        return out.astype(np.float32), offset

    def mesh_to_real_world(self, mesh: Mesh, pose_offset=None):
        """Undo normalization on mesh vertices (ref `mesh_to_real_world`
        Utils.py:508-514)."""
        if pose_offset is None:
            pose_offset = np.eye(4)
        sc = self.cfg["sc_factor"]
        translation = np.asarray(self.cfg["translation"]).reshape(3)
        mesh.vertices = mesh.vertices / sc - translation
        mesh.apply_transform(pose_offset)
        return mesh

    def render_frame(self, frame_id, max_rays=2 ** 16):
        """Render all rays of one training frame (debug/eval; ref
        render_images nerf_runner.py:586-640). Returns dict of host arrays."""
        # the host mirror holds only real rays (no padding rows)
        fid_all = self._rays_host["frame_id"]
        idx = np.nonzero(fid_all == frame_id)[0]
        outs = {"rgb_map": [], "depth_pred": []}
        for s in range(0, len(idx), max_rays):
            batch = jax.tree.map(lambda a: a[jnp.asarray(idx[s:s + max_rays])],
                                 self.rays)
            out = render_rays(self.params, self.spec, self.rcfg, batch,
                              self.c2w_array, self.occ_grid,
                              jax.random.PRNGKey(0), perturb=False)
            outs["rgb_map"].append(np.asarray(out["rgb_map"]))
            depth_pred = np.asarray(
                jnp.sum(out["weights"] * out["z_vals"], axis=-1))
            outs["depth_pred"].append(depth_pred)
        return {k: np.concatenate(v) if v else np.zeros((0,))
                for k, v in outs.items()}, idx
