"""Prefetching reader: same frames, overlapped loading."""
import time

import numpy as np

from synthetic import cube_orbit_sequence

from bundlesdf_tpu.datasets.prefetch import PrefetchReader


class _SlowReader:
    def __init__(self, seq, delay=0.02):
        self.seq = seq
        self.K = seq["K"]
        self.id_strs = seq["id_strs"]
        self.delay = delay
        self.loads = 0

    def __len__(self):
        return len(self.id_strs)

    def get_video_name(self):
        return "slow"

    def get_color(self, i):
        time.sleep(self.delay)
        self.loads += 1
        return self.seq["colors"][i]

    def get_depth(self, i):
        return self.seq["depths"][i]

    def get_mask(self, i):
        return self.seq["masks"][i]


def test_prefetch_matches_and_overlaps():
    seq = cube_orbit_sequence(n_frames=8, H=24, W=32)
    base = _SlowReader(seq)
    pr = PrefetchReader(base, ahead=4, workers=2)
    assert len(pr) == 8
    # give workers a head start, then consume: frames should be cached
    time.sleep(0.3)
    t0 = time.time()
    for i in range(8):
        f = pr.frame(i)
        np.testing.assert_array_equal(f["color"], seq["colors"][i])
        np.testing.assert_array_equal(f["depth"], seq["depths"][i])
    consume = time.time() - t0
    # naive serial load would be >= 8 * delay; prefetch should beat it
    assert consume < 8 * base.delay
    pr.close()


def test_prefetch_field_accessors():
    seq = cube_orbit_sequence(n_frames=3, H=24, W=32)
    pr = PrefetchReader(_SlowReader(seq, delay=0.0), ahead=2)
    np.testing.assert_array_equal(pr.get_color(1), seq["colors"][1])
    np.testing.assert_array_equal(pr.get_mask(2), seq["masks"][2])
    pr.evict(1)
    pr.close()
