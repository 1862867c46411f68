"""Build the reference torch LoFTR (BundleTrack/LoFTR/src/loftr) in this
image for golden-parity tests. kornia / yacs are not installed; the two
small utilities LoFTR needs are shimmed."""
import os
import sys
import types

REF = "/root/reference/BundleTrack/LoFTR"

FULL = dict(
    backbone_type="ResNetFPN",
    resolution=(8, 2),
    fine_window_size=5,
    fine_concat_coarse_feat=True,
    resnetfpn=dict(initial_dim=128, block_dims=[128, 196, 256]),
    coarse=dict(d_model=256, d_ffn=256, nhead=8,
                layer_names=["self", "cross"] * 4, attention="linear",
                temp_bug_fix=False),
    match_coarse=dict(thr=0.0, border_rm=2, match_type="dual_softmax",
                      dsmax_temperature=0.1, skh_iters=3,
                      skh_init_bin_score=1.0, skh_prefilter=True,
                      train_coarse_percent=0.4, train_pad_num_gt_min=200),
    fine=dict(d_model=128, d_ffn=128, nhead=8,
              layer_names=["self", "cross"], attention="linear"),
)


def reference_available() -> bool:
    return os.path.isdir(REF)


def shim_kornia():
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


def shim_yacs():
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


def build_reference_model(config=None, seed=0):
    """Seeded reference torch LoFTR in eval mode."""
    import torch

    shim_kornia()
    shim_yacs()
    if os.path.join(REF, "src") not in sys.path:
        sys.path.insert(0, os.path.join(REF, "src"))
    from loftr.loftr import LoFTR

    torch.manual_seed(seed)
    return LoFTR(config or FULL).eval()
