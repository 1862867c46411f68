"""--use_segmenter wiring in run_custom.run_one_video (round-2 verdict:
the flag was accepted but dropped; ref run_custom.py:64-91 routes the mask
through Segmenter.run per frame)."""
import os

import cv2
import numpy as np


def _make_video_dir(root, n=3, H=48, W=64):
    for sub in ("rgb", "depth", "masks"):
        os.makedirs(f"{root}/{sub}", exist_ok=True)
    np.savetxt(f"{root}/cam_K.txt",
               np.array([[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1]]))
    rng = np.random.default_rng(0)
    for i in range(n):
        rgb = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
        cv2.imwrite(f"{root}/rgb/{i:04d}.png", rgb)
        depth = np.full((H, W), 500, np.uint16)
        cv2.imwrite(f"{root}/depth/{i:04d}.png", depth)
        mask = np.zeros((H, W), np.uint8)
        mask[10:30, 20:50] = 255
        cv2.imwrite(f"{root}/masks/{i:04d}.png", mask)


def test_use_segmenter_routes_masks_through_segmenter(tmp_path, monkeypatch):
    import run_custom

    video = tmp_path / "video"
    out = tmp_path / "out"
    _make_video_dir(str(video))

    seg_calls = []
    recorded = {"masks": [], "finished": False}

    class SpySegmenter:
        def __init__(self, cfg=None):
            pass

        def run(self, mask_file, depth=None, K=None):
            seg_calls.append(mask_file)
            m = cv2.imread(mask_file, -1)
            # distinctive value so we can prove the tracker got THIS mask
            m[m > 0] = 7
            return m

    class SpyTracker:
        def __init__(self, **kw):
            pass

        def run(self, color, depth, K, id_str, mask=None, occ_mask=None,
                pose_in_model=None):
            recorded["masks"].append(mask)

        def on_finish(self):
            recorded["finished"] = True

    monkeypatch.setattr(run_custom, "Segmenter", SpySegmenter)
    monkeypatch.setattr(run_custom, "BundleSdf", SpyTracker)
    monkeypatch.setattr(run_custom, "run_one_video_global_nerf",
                        lambda **kw: None)

    run_custom.run_one_video(str(video), str(out), use_segmenter=True)

    assert len(seg_calls) == 3
    assert all("/masks/" in f for f in seg_calls)
    # erode_mask=3 erodes but preserves the distinctive value
    assert all(m.max() == 7 for m in recorded["masks"])
    assert recorded["finished"]

    # without the flag the segmenter must not be constructed
    seg_calls.clear()
    recorded["masks"].clear()
    run_custom.run_one_video(str(video), str(out), use_segmenter=False)
    assert not seg_calls
    assert recorded["masks"][0].max() != 7
