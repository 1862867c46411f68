"""Multi-video throughput sweep: pipelines interleave and both produce
correct pose tracks."""
import numpy as np

from synthetic import cube_orbit_sequence

from bundlesdf_tpu.bundlesdf import BundleSdf
from bundlesdf_tpu.config import default_nerf_config, default_track_config
from bundlesdf_tpu.parallel.videos import run_videos_parallel


class _SeqReader:
    def __init__(self, seq):
        self.seq = seq
        self.K = seq["K"]
        self.id_strs = seq["id_strs"]

    def __len__(self):
        return len(self.id_strs)

    def get_video_name(self):
        return "synthetic"

    def get_color(self, i):
        return self.seq["colors"][i]

    def get_depth(self, i):
        return self.seq["depths"][i].copy()

    def get_mask(self, i):
        return self.seq["masks"][i]


def test_two_videos_interleaved(tmp_path):
    seqs = [cube_orbit_sequence(n_frames=5, H=72, W=96, full_angle=0.2,
                                seed=s) for s in (0, 1)]

    def make_tracker(out_dir):
        cfg = default_track_config()
        cfg["debug_dir"] = str(out_dir)
        cfg["ransac"]["max_trans_neighbor"] = 0.05
        cfg["ransac"]["max_iter"] = 300
        cfg["bundle"]["max_BA_frames"] = 4
        cfg["bundle"]["depth_association_radius"] = 2
        return BundleSdf(cfg_track=cfg, cfg_nerf=default_nerf_config(),
                         start_nerf_keyframes=99)

    jobs = [(_SeqReader(seqs[0]), tmp_path / "v0"),
            (_SeqReader(seqs[1]), tmp_path / "v1")]
    trackers = run_videos_parallel(jobs, make_tracker)
    assert len(trackers) == 2
    for k, seq in enumerate(seqs):
        gt = seq["cam_in_obs"]
        est = np.array([np.linalg.inv(np.loadtxt(
            tmp_path / f"v{k}" / "ob_in_cam" / f"{i:04d}.txt"))
            for i in range(5)])
        A = gt[0] @ np.linalg.inv(est[0])
        est = np.einsum("ij,njk->nik", A, est)
        errs = [np.linalg.norm(est[i][:3, 3] - gt[i][:3, 3])
                for i in range(5)]
        assert np.mean(errs) < 0.01
