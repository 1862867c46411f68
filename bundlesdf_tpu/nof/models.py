"""NOF model family: hash-grid + tiny SDF/color MLP + per-frame corrections.

Functional re-design of the reference torch modules (`nerf_helpers.py`):
  - `NeRFSmall` (nerf_helpers.py:243-321): 2-layer sigma net -> 1 SDF + 15
    geo features; 3-layer color net; SDF head bias init 0.1 (:272).
  - `SHEncoder` (nerf_helpers.py:22-105): real spherical harmonics of the
    view direction, degree<=5.
  - `Embedder` (nerf_helpers.py:156-189): NeRF frequency encoding (i_embed=0).
  - `FeatureArray` (nerf_helpers.py:108-124): per-frame latent, N(0,1) init.
  - `PoseArray` (nerf_helpers.py:127-154): per-frame SE(3) correction,
    tanh-bounded, frame 0 pinned to identity.

Everything is a plain pytree (dict of arrays) + pure apply functions, so the
whole model jits/vmaps/donates cleanly and shards with pjit.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from bundlesdf_tpu.ops.hashgrid import (HashGridSpec, hashgrid_encode,
                                        init_hashgrid_params)
from bundlesdf_tpu.utils.se3 import se3_exp

# ---------------------------------------------------------------------------
# Spherical-harmonics view encoding (ref nerf_helpers.py:22-105)
# ---------------------------------------------------------------------------

_C0 = 0.28209479177387814
_C1 = 0.4886025119029199
_C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
       -1.0925484305920792, 0.5462742152960396)
_C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
       0.3731763325901154, -0.4570457994644658, 1.445305721320277,
       -0.5900435899266435)
_C4 = (2.5033429417967046, -1.7701307697799304, 0.9461746957575601,
       -0.6690465435572892, 0.10578554691520431, -0.6690465435572892,
       0.47308734787878004, -1.7701307697799304, 0.6258357354491761)


def sh_encode(dirs, degree: int):
    """Real SH basis of unit directions. (...,3) -> (..., degree**2)."""
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    out = [jnp.full_like(x, _C0)]
    if degree > 1:
        out += [-_C1 * y, _C1 * z, -_C1 * x]
    if degree > 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        out += [_C2[0] * xy, _C2[1] * yz, _C2[2] * (2.0 * zz - xx - yy),
                _C2[3] * xz, _C2[4] * (xx - yy)]
    if degree > 3:
        out += [_C3[0] * y * (3 * xx - yy), _C3[1] * xy * z,
                _C3[2] * y * (4 * zz - xx - yy),
                _C3[3] * z * (2 * zz - 3 * xx - 3 * yy),
                _C3[4] * x * (4 * zz - xx - yy), _C3[5] * z * (xx - yy),
                _C3[6] * x * (xx - 3 * yy)]
    if degree > 4:
        out += [_C4[0] * xy * (xx - yy), _C4[1] * yz * (3 * xx - yy),
                _C4[2] * xy * (7 * zz - 1), _C4[3] * yz * (7 * zz - 3),
                _C4[4] * (zz * (35 * zz - 30) + 3), _C4[5] * xz * (7 * zz - 3),
                _C4[6] * (xx - yy) * (7 * zz - 1), _C4[7] * xz * (xx - 3 * yy),
                _C4[8] * (xx * (xx - 3 * yy) - yy * (3 * xx - yy))]
    return jnp.stack(out, axis=-1)


def freq_encode(x, n_freqs: int):
    """NeRF frequency encoding with include_input (ref nerf_helpers.py:156-189).
    (...,3) -> (...,3 + 3*2*n_freqs)."""
    freqs = 2.0 ** jnp.arange(n_freqs, dtype=x.dtype)
    xs = x[..., None, :] * freqs[:, None]  # (...,F,3)
    enc = jnp.concatenate([jnp.sin(xs), jnp.cos(xs)], axis=-1)
    return jnp.concatenate([x, enc.reshape(*x.shape[:-1], -1)], axis=-1)


# ---------------------------------------------------------------------------
# Spec + init
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class NofSpec:
    """Static model configuration (hashable -> usable as jit static arg)."""
    grid: HashGridSpec = field(default_factory=HashGridSpec)
    sh_degree: int = 3              # multires_views (ref config.yml:24)
    frame_features: int = 0         # per-frame latent dim (config.yml:70)
    n_frames: int = 1
    hidden_dim: int = 64
    geo_feat_dim: int = 15
    num_layers_sigma: int = 2       # ref nerf_runner.py:222
    num_layers_color: int = 3
    max_trans: float = 0.02         # already scaled by sc_factor at build time
    max_rot_deg: float = 20.0
    use_viewdirs: bool = True
    # embedder selection (ref get_embedder nerf_helpers.py:191-214):
    # positions: 1 = hash grid, 0 = NeRF frequency encoding (multires
    # freqs), -1 = identity. views: 2 = SH (degree sh_degree), 0 = freq
    # (sh_degree freqs, matching the reference's multires_views reuse),
    # -1 = identity.
    i_embed: int = 1
    i_embed_views: int = 2
    multires: int = 8               # freq count for i_embed=0 (config.yml)

    @property
    def pos_dim(self) -> int:
        if self.i_embed == 1:
            return self.grid.out_dim
        if self.i_embed == 0:
            return 3 + 3 * 2 * self.multires
        return 3  # identity

    @property
    def view_dim(self) -> int:
        if not self.use_viewdirs:
            d = 0
        elif self.i_embed_views == 2:
            d = self.sh_degree ** 2
        elif self.i_embed_views == 0:
            d = 3 + 3 * 2 * self.sh_degree
        else:
            d = 3
        return d + self.frame_features


def _linear_init(key, n_in, n_out, bias_const=None):
    """torch.nn.Linear default init (kaiming-uniform a=sqrt(5)): both weight
    and bias ~ U(-1/sqrt(n_in), 1/sqrt(n_in)). Matching the reference init
    keeps training dynamics comparable."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / np.sqrt(n_in)
    W = jax.random.uniform(kw, (n_in, n_out), minval=-bound, maxval=bound)
    if bias_const is not None:
        # explicit dtype: a weak-typed leaf here changes the jit signature
        # after the first optimizer step and forces a recompile per call
        b = jnp.full((n_out,), bias_const, dtype=jnp.float32)
    else:
        b = jax.random.uniform(kb, (n_out,), minval=-bound, maxval=bound)
    return {"w": W, "b": b}


def init_nof_params(key, spec: NofSpec, table_dtype=jnp.float32):
    """Build the full NOF parameter pytree."""
    keys = jax.random.split(key, 8)
    sigma_dims = ([spec.pos_dim] + [spec.hidden_dim] * (spec.num_layers_sigma - 1)
                  + [1 + spec.geo_feat_dim])
    color_dims = ([spec.view_dim + spec.geo_feat_dim]
                  + [spec.hidden_dim] * (spec.num_layers_color - 1) + [3])
    sigma_net = []
    for i in range(spec.num_layers_sigma):
        # SDF-head bias 0.1 encourages initially-positive SDF (ref :272)
        bias_const = 0.1 if i == spec.num_layers_sigma - 1 else None
        sigma_net.append(_linear_init(keys[i], sigma_dims[i], sigma_dims[i + 1],
                                      bias_const=bias_const))
    color_net = [
        _linear_init(keys[3 + i], color_dims[i], color_dims[i + 1])
        for i in range(spec.num_layers_color)
    ]
    params = {
        "sigma_net": sigma_net,
        "color_net": color_net,
        "pose_array": jnp.zeros((spec.n_frames, 6), jnp.float32),
    }
    if spec.i_embed == 1:
        params["table"] = init_hashgrid_params(keys[6], spec.grid,
                                               dtype=table_dtype)
    if spec.frame_features > 0:
        params["feature_array"] = jax.random.normal(
            keys[7], (spec.n_frames, spec.frame_features))
    return params


# ---------------------------------------------------------------------------
# Apply
# ---------------------------------------------------------------------------

def _mlp(layers, x):
    for i, layer in enumerate(layers):
        x = x @ layer["w"] + layer["b"]
        if i != len(layers) - 1:
            x = jax.nn.relu(x)
    return x


def _embed_pos(params, spec: NofSpec, pts, ray_mode: bool):
    """Position embedding per spec.i_embed (ref get_embedder i=1/0/-1)."""
    if spec.i_embed == 1:
        return hashgrid_encode(params["table"], pts, spec.grid,
                               ray_mode=ray_mode)
    if spec.i_embed == 0:
        return freq_encode(pts, spec.multires)
    return pts


def _embed_views(spec: NofSpec, viewdirs):
    """View embedding per spec.i_embed_views (ref get_embedder i=2/0/-1)."""
    if spec.i_embed_views == 2:
        return sh_encode(viewdirs, spec.sh_degree)
    if spec.i_embed_views == 0:
        return freq_encode(viewdirs, spec.sh_degree)
    return viewdirs


def nof_forward(params, spec: NofSpec, pts, viewdirs=None, frame_ids=None,
                compute_dtype=jnp.float32, ray_mode: bool = False):
    """Full field query. @pts: (N,3) in [-1,1] (normalized object space);
    @viewdirs: (N,3) unit dirs in world/object space; @frame_ids: (N,) int.
    @ray_mode: True iff pts are (rays * spec.grid.ray_samples) z-ordered
    samples — enables the hash-grid run-dedup fast path.
    Returns (N,4): rgb logits (3) + sdf (1). (ref NeRFSmall.forward +
    run_network embedding assembly nerf_runner.py:1227-1304)."""
    feats = _embed_pos(params, spec, pts, ray_mode).astype(compute_dtype)
    h = _mlp(jax.tree.map(lambda a: a.astype(compute_dtype), params["sigma_net"]),
             feats)
    sdf, geo = h[..., :1], h[..., 1:]

    views = []
    if "feature_array" in params and frame_ids is not None:
        views.append(params["feature_array"][frame_ids].astype(compute_dtype))
    if spec.use_viewdirs and viewdirs is not None:
        views.append(_embed_views(spec, viewdirs).astype(compute_dtype))
    color_in = jnp.concatenate(views + [geo], axis=-1)
    rgb = _mlp(jax.tree.map(lambda a: a.astype(compute_dtype), params["color_net"]),
               color_in)
    return jnp.concatenate([rgb, sdf], axis=-1).astype(jnp.float32)


def nof_sdf(params, spec: NofSpec, pts, compute_dtype=jnp.float32):
    """SDF-only query (for mesh extraction / eikonal; ref run_network_density
    nerf_runner.py:1307-1347)."""
    feats = _embed_pos(params, spec, pts, ray_mode=False).astype(compute_dtype)
    h = _mlp(jax.tree.map(lambda a: a.astype(compute_dtype), params["sigma_net"]),
             feats)
    return h[..., 0].astype(jnp.float32)


def pose_array_matrices(pose_params, frame_ids, max_trans, max_rot_deg):
    """Per-frame SE(3) corrections (ref PoseArray.get_matrices
    nerf_helpers.py:142-154): tanh-bounded translation/axis-angle, exp-map,
    frame 0 pinned to identity."""
    theta = jnp.tanh(pose_params)
    trans = theta[:, :3] * max_trans
    rot = theta[:, 3:6] * (max_rot_deg / 180.0 * jnp.pi)
    Ts = se3_exp(jnp.concatenate([trans, rot], axis=-1))  # (F,4,4)
    Ts = Ts.at[0].set(jnp.eye(4))
    return Ts[frame_ids]
