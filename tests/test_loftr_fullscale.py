"""Full-scale LoFTR golden parity (round-2 verdict item 4): the tiny-dims
fixture could not catch bugs that only manifest at real dims (e.g. 8-head
reshape order at d=256). Builds the REFERENCE torch net (full cvpr_ds
config, 400x400 input, seeded random weights) on the fly and checks our
JAX port end to end. Skipped when /root/reference is absent."""
import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from loftr_reference import FULL, build_reference_model, reference_available

from bundlesdf_tpu.matcher.loftr import (LoftrConfig,
                                         convert_torch_state_dict,
                                         loftr_forward)

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="/root/reference not present")


@pytest.fixture(scope="module")
def golden():
    import torch

    model = build_reference_model(FULL, seed=0)
    rng = np.random.default_rng(0)
    # structured input (smooth blobs), not white noise: random-init conv
    # nets collapse white noise to near-constant features, which makes the
    # dual-softmax degenerate and the comparison vacuous
    def blobs(seed):
        r = np.random.default_rng(seed)
        img = np.zeros((400, 400), np.float32)
        for _ in range(40):
            cx, cy = r.uniform(40, 360, 2)
            s = r.uniform(8, 40)
            a = r.uniform(0.2, 1.0)
            y, x = np.mgrid[0:400, 0:400]
            img += a * np.exp(-((x - cx) ** 2 + (y - cy) ** 2) / (2 * s * s))
        img -= img.min()
        return (img / img.max()).astype(np.float32)

    # img1 = img0 shifted by one coarse cell (8 px): conv features are
    # translation-equivariant, so even random weights produce DENSE
    # mutual-NN matches — a much harder exercise of the coarse/fine path
    # than two unrelated images (12 matches) would be
    img0 = blobs(1)
    img1 = np.roll(img0, (8, 8), axis=(0, 1))
    data = {"image0": torch.from_numpy(img0)[None, None],
            "image1": torch.from_numpy(img1)[None, None]}
    with torch.no_grad():
        model(data)
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    return dict(sd=sd, img0=img0, img1=img1,
                conf_matrix=data["conf_matrix"][0].numpy(),
                mkpts0=data["mkpts0_f"].numpy(),
                mkpts1=data["mkpts1_f"].numpy(),
                mconf=data["mconf"].numpy())


def test_full_dims_conf_matrix_parity(golden):
    cfg = LoftrConfig(match_thr=0.0, max_matches=2048)
    params = convert_torch_state_dict(golden["sd"], cfg)
    out = loftr_forward(params, jnp.asarray(golden["img0"]),
                        jnp.asarray(golden["img1"]), cfg, debug=True)
    ours = np.asarray(out["conf_matrix"])
    refs = golden["conf_matrix"]
    assert ours.shape == refs.shape == (2500, 2500)
    rel = np.abs(ours - refs).max() / (refs.max() + 1e-12)
    assert rel < 1e-3, f"conf matrix rel err {rel}"

    # fine matches: identical coarse picks, subpixel within half fine px
    conf = np.asarray(out["conf"])
    keep = conf > 0
    ours0 = {tuple(np.round(uv).astype(int))
             for uv in np.asarray(out["uv0"])[keep]}
    refs0 = {tuple(np.round(uv).astype(int)) for uv in golden["mkpts0"]}
    assert len(golden["mkpts0"]) > 20, "degenerate golden (too few matches)"
    assert refs0 == ours0
    order0 = np.lexsort(np.asarray(out["uv0"])[keep].T)
    order1 = np.lexsort(golden["mkpts0"].T)
    np.testing.assert_allclose(np.asarray(out["uv1"])[keep][order0],
                               golden["mkpts1"][order1], atol=0.51)
