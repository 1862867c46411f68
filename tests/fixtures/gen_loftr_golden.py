"""Generate the LoFTR golden-parity fixture from the reference torch net.

Run manually (needs /root/reference present):
    python tests/fixtures/gen_loftr_golden.py

Builds the reference LoFTR (BundleTrack/LoFTR/src/loftr) at TINY dims with
seeded random weights, runs one 64x64 pair, and saves the state_dict,
inputs, coarse confidence matrix, and fine matches. tests/test_loftr.py
checks our JAX port (weights converted with convert_torch_state_dict)
against these outputs — catches converter transposition/order bugs that
synthetic round-trips cannot (round-1 verdict item).
"""
import os
import sys

import numpy as np

REF = "/root/reference/BundleTrack/LoFTR"
OUT = os.path.join(os.path.dirname(__file__), "loftr_golden_tiny.npz")

TINY = dict(
    backbone_type="ResNetFPN",
    resolution=(8, 2),
    fine_window_size=5,
    fine_concat_coarse_feat=True,
    resnetfpn=dict(initial_dim=8, block_dims=[8, 12, 16]),
    coarse=dict(d_model=16, d_ffn=16, nhead=2,
                layer_names=["self", "cross"] * 2, attention="linear",
                temp_bug_fix=False),
    match_coarse=dict(thr=0.0, border_rm=2, match_type="dual_softmax",
                      dsmax_temperature=0.1, skh_iters=3,
                      skh_init_bin_score=1.0, skh_prefilter=True,
                      train_coarse_percent=0.4, train_pad_num_gt_min=200),
    fine=dict(d_model=8, d_ffn=8, nhead=2, layer_names=["self", "cross"],
              attention="linear"),
)


def _shim_kornia():
    """kornia isn't in this image; fine_matching only needs two small
    utilities (normalized meshgrid + spatial expectation), shimmed here."""
    import types

    import torch

    def create_meshgrid(h, w, normalized=True, device=None, dtype=None):
        xs = torch.linspace(-1.0, 1.0, w, device=device, dtype=dtype)
        ys = torch.linspace(-1.0, 1.0, h, device=device, dtype=dtype)
        gy, gx = torch.meshgrid(ys, xs, indexing="ij")
        return torch.stack([gx, gy], dim=-1)[None]  # (1,H,W,2) xy

    def spatial_expectation2d(heatmap, normalized=True):
        b, m, h, w = heatmap.shape
        grid = create_meshgrid(h, w, normalized, heatmap.device,
                               heatmap.dtype).reshape(1, 1, h * w, 2)
        return torch.sum(heatmap.reshape(b, m, h * w, 1) * grid, dim=2)

    kornia = types.ModuleType("kornia")
    geometry = types.ModuleType("kornia.geometry")
    subpix = types.ModuleType("kornia.geometry.subpix")
    dsnt = types.ModuleType("kornia.geometry.subpix.dsnt")
    utils = types.ModuleType("kornia.utils")
    grid_mod = types.ModuleType("kornia.utils.grid")
    dsnt.spatial_expectation2d = spatial_expectation2d
    grid_mod.create_meshgrid = create_meshgrid
    utils.grid = grid_mod
    utils.create_meshgrid = create_meshgrid
    subpix.dsnt = dsnt
    geometry.subpix = subpix
    kornia.geometry = geometry
    kornia.utils = utils
    for name, mod in [("kornia", kornia), ("kornia.geometry", geometry),
                      ("kornia.geometry.subpix", subpix),
                      ("kornia.geometry.subpix.dsnt", dsnt),
                      ("kornia.utils", utils),
                      ("kornia.utils.grid", grid_mod)]:
        sys.modules[name] = mod


def _shim_yacs():
    """yacs isn't in this image; cvpr_ds_config only needs an
    attribute-dict CfgNode."""
    import types

    class CfgNode(dict):
        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError as e:
                raise AttributeError(k) from e

        def __setattr__(self, k, v):
            self[k] = v

    yacs = types.ModuleType("yacs")
    config = types.ModuleType("yacs.config")
    config.CfgNode = CfgNode
    yacs.config = config
    sys.modules["yacs"] = yacs
    sys.modules["yacs.config"] = config


def main():
    import torch

    _shim_kornia()
    _shim_yacs()
    sys.path.insert(0, os.path.join(REF, "src"))
    from loftr.loftr import LoFTR

    torch.manual_seed(0)
    model = LoFTR(TINY).eval()
    rng = np.random.default_rng(0)
    img0 = rng.random((64, 64), np.float32)
    img1 = rng.random((64, 64), np.float32)
    data = {"image0": torch.from_numpy(img0)[None, None],
            "image1": torch.from_numpy(img1)[None, None]}

    # stage taps for localizing port bugs
    taps = {}
    with torch.no_grad():
        feats_c, feats_f = model.backbone(
            torch.cat([data["image0"], data["image1"]], dim=0))
        taps["feat_c"] = feats_c.numpy()   # (2,C,hc,wc)
        taps["feat_f"] = feats_f.numpy()   # (2,C,hf,wf)
        pe = model.pos_encoding(feats_c)
        taps["feat_c_pe"] = pe.numpy()
        fc = pe.flatten(2).transpose(1, 2)  # (2,L,C)
        f0, f1 = model.loftr_coarse(fc[:1], fc[1:2])
        taps["fc0_tr"] = f0.numpy()
        taps["fc1_tr"] = f1.numpy()
        model(data)

    out = {
        "img0": img0, "img1": img1,
        "conf_matrix": data["conf_matrix"][0].numpy(),
        "mkpts0": data["mkpts0_f"].numpy(),
        "mkpts1": data["mkpts1_f"].numpy(),
        "mconf": data["mconf"].numpy(),
        **taps,
    }
    for k, v in model.state_dict().items():
        out["sd/" + k] = v.numpy()
    np.savez_compressed(OUT, **out)
    print(f"wrote {OUT} ({os.path.getsize(OUT)/1e3:.0f} KB), "
          f"{len(out['mconf'])} fine matches")


if __name__ == "__main__":
    main()
