"""--parallel_videos wiring in run_ho3d (round-2 verdict: the docstring
advertised a flag that didn't exist; BASELINE config #5 had no runnable
entry point)."""
import numpy as np


class _FakeReader:
    def __init__(self, video_dir):
        self.video_dir = video_dir
        self.color_files = ["a", "b"]
        self.K = np.eye(3)
        self.id_strs = ["0000", "0001"]

    def get_video_name(self):
        return self.video_dir.rstrip("/").split("/")[-1]


def test_parallel_videos_routes_to_sweep(monkeypatch, tmp_path):
    import run_ho3d

    monkeypatch.setattr(run_ho3d, "Ho3dReader", _FakeReader)

    sweeps = []

    def fake_sweep(jobs, make_tracker, n_devices=None):
        sweeps.append({"n_jobs": len(jobs), "n_devices": n_devices,
                       "out_folders": [of for _, of in jobs]})
        # the factory must build a tracker for each job's out_folder
        for _, of in jobs:
            t = make_tracker(of)
            assert t is not None
        return [object()] * len(jobs)

    made = []
    monkeypatch.setattr(run_ho3d, "_make_tracker",
                        lambda vd, of, use_gui=False: made.append((vd, of))
                        or "tracker")
    import bundlesdf_tpu.parallel.videos as pv
    monkeypatch.setattr(pv, "run_videos_parallel", fake_sweep)

    dirs = [str(tmp_path / f"vid{i}") for i in range(3)]
    run_ho3d.run_videos(dirs, str(tmp_path / "out"), parallel_videos=2)

    # 3 videos, chunked 2 + 1
    assert [s["n_jobs"] for s in sweeps] == [2, 1]
    assert all(s["n_devices"] == 2 for s in sweeps)
    assert len(made) == 3
    # each tracker factory received the matching video dir
    assert {vd.split("/")[-1] for vd, _ in made} == {"vid0", "vid1", "vid2"}


def test_sequential_path_unchanged(monkeypatch, tmp_path):
    import run_ho3d

    calls = []
    monkeypatch.setattr(run_ho3d, "run_one_video",
                        lambda vd, od, use_gui=False: calls.append(vd))
    run_ho3d.run_videos(["a", "b"], str(tmp_path), parallel_videos=0)
    assert calls == ["a", "b"]
