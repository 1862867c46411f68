"""LoFTR dense matcher in pure JAX, TPU-first.

From-scratch functional re-implementation of the reference network
(`BundleTrack/LoFTR/src/loftr/`): ResNet-FPN backbone (1/8 coarse 256-d,
1/2 fine 128-d, resnet_fpn.py:44-120), 2D sine positional encoding
(position_encoding.py), 4x(self,cross) linear-attention transformer
(transformer.py, linear_attention.py:14-46), dual-softmax coarse matching
with T=0.1 + mutual-NN (coarse_matching.py:112-137,160-196), 5x5 fine
windows with coarse-context concat (fine_preprocess.py), 1x(self,cross)
fine transformer, expectation-based subpixel refinement (fine_matching.py).

TPU-first deviations (behavior-preserving):
  - static shapes end to end: matches are top-K slots with a validity mask
    instead of a dynamic list; invalid slots have conf 0
  - NHWC conv layout, einsum attention (lowers onto the MXU)
  - weights live in a plain pytree; `convert_torch_state_dict` ports the
    pretrained `outdoor_ds.ckpt` tensors into it
"""
from __future__ import annotations

import functools
import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# config (mirrors cvpr_ds_config.py defaults)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class LoftrConfig:
    initial_dim: int = 128
    block_dims: tuple = (128, 196, 256)
    d_coarse: int = 256
    d_fine: int = 128
    nhead: int = 8
    n_coarse_layers: int = 4     # x (self, cross)
    n_fine_layers: int = 1
    fine_window: int = 5
    match_thr: float = 0.2       # loftr_wrapper.py:21 overrides to 0.2
    dsmax_temperature: float = 0.1
    border_rm: int = 2
    max_matches: int = 1024      # static top-K slots
    fine_concat_coarse: bool = True
    # bf16 feature extraction + transformers (matching math stays f32) —
    # the reference wrapper runs the net under torch AMP autocast
    # (loftr_wrapper.py:43-56); bf16 has more exponent range than the
    # fp16 the reference uses, so this is numerically safer than parity
    amp: bool = False


# ---------------------------------------------------------------------------
# primitive layers
# ---------------------------------------------------------------------------

def _conv(params, x, stride=1):
    """NHWC conv with HWIO weights + optional fused BN params.

    Padding is torch's symmetric k//2 per side — XLA's SAME pads
    asymmetrically ((k-1)//2, k//2) for stride>1, which shifts every
    strided conv's windows by one pixel vs the reference net."""
    kh, kw = params["w"].shape[:2]
    y = jax.lax.conv_general_dilated(
        x, params["w"], window_strides=(stride, stride),
        padding=((kh // 2, kh // 2), (kw // 2, kw // 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if "bn_scale" in params:
        y = y * params["bn_scale"] + params["bn_bias"]
    return y


def _fuse_bn(gamma, beta, mean, var, eps=1e-5):
    scale = gamma / np.sqrt(var + eps)
    return scale, beta - mean * scale


def _init_conv(key, kh, kw, cin, cout, bn=True):
    w = jax.random.normal(key, (kh, kw, cin, cout)) * np.sqrt(
        2.0 / (kh * kw * cout))
    p = {"w": w}
    if bn:
        p["bn_scale"] = jnp.ones((cout,))
        p["bn_bias"] = jnp.zeros((cout,))
    return p


def _linear(params, x):
    y = x @ params["w"]
    if "b" in params:
        y = y + params["b"]
    return y


def _init_linear(key, cin, cout, bias=False):
    p = {"w": jax.random.normal(key, (cin, cout)) * np.sqrt(1.0 / cin)}
    if bias:
        p["b"] = jnp.zeros((cout,))
    return p


def _layernorm(params, x, eps=1e-5):
    # stats in f32 even under amp (torch autocast keeps LN in fp32)
    x32 = x.astype(jnp.float32)
    mu = x32.mean(axis=-1, keepdims=True)
    var = ((x32 - mu) ** 2).mean(axis=-1, keepdims=True)
    y = (x32 - mu) / jnp.sqrt(var + eps) * params["g"] + params["b"]
    return y.astype(x.dtype)


# ---------------------------------------------------------------------------
# backbone: ResNet-FPN 8_2
# ---------------------------------------------------------------------------

def _basic_block(params, x, stride=1):
    y = jax.nn.relu(_conv(params["conv1"], x, stride))
    y = _conv(params["conv2"], y)
    if "down" in params:
        x = _conv(params["down"], x, stride)
    return jax.nn.relu(x + y)


def _init_block(key, cin, cout, stride=1):
    ks = jax.random.split(key, 3)
    p = {"conv1": _init_conv(ks[0], 3, 3, cin, cout),
         "conv2": _init_conv(ks[1], 3, 3, cout, cout)}
    if stride != 1:
        p["down"] = _init_conv(ks[2], 1, 1, cin, cout)
    return p


def _upsample2x_align_corners(x):
    """Bilinear 2x upsample with torch align_corners=True semantics."""
    N, H, W, C = x.shape
    Ho, Wo = H * 2, W * 2
    ys = jnp.linspace(0.0, H - 1.0, Ho)
    xs = jnp.linspace(0.0, W - 1.0, Wo)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, H - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    wy = (ys - y0)[None, :, None, None].astype(x.dtype)
    wx = (xs - x0)[None, None, :, None].astype(x.dtype)
    a = x[:, y0][:, :, x0]
    b = x[:, y0][:, :, x1]
    c = x[:, y1][:, :, x0]
    d = x[:, y1][:, :, x1]
    return (a * (1 - wy) * (1 - wx) + b * (1 - wy) * wx
            + c * wy * (1 - wx) + d * wy * wx)


def backbone_forward(params, x):
    """@x: (N,H,W,1) float. Returns (coarse (N,H/8,W/8,256),
    fine (N,H/2,W/2,128)). Ref resnet_fpn.py:101-120."""
    x0 = jax.nn.relu(_conv(params["conv1"], x, stride=2))       # 1/2
    x1 = _basic_block(params["layer1_1"],
                      _basic_block(params["layer1_0"], x0))      # 1/2
    x2 = _basic_block(params["layer2_1"],
                      _basic_block(params["layer2_0"], x1, 2))   # 1/4
    x3 = _basic_block(params["layer3_1"],
                      _basic_block(params["layer3_0"], x2, 2))   # 1/8

    x3_out = _conv(params["layer3_outconv"], x3)
    x3_up = _upsample2x_align_corners(x3_out)
    x2_out = _conv(params["layer2_outconv"], x2)
    h = _conv(params["layer2_outconv2_0"], x2_out + x3_up)
    h = jax.nn.leaky_relu(h, 0.01)
    x2_out = _conv(params["layer2_outconv2_1"], h)
    x2_up = _upsample2x_align_corners(x2_out)
    x1_out = _conv(params["layer1_outconv"], x1)
    h = _conv(params["layer1_outconv2_0"], x1_out + x2_up)
    h = jax.nn.leaky_relu(h, 0.01)
    x1_out = _conv(params["layer1_outconv2_1"], h)
    return x3_out, x1_out


def _init_backbone(key, cfg: LoftrConfig):
    ks = jax.random.split(key, 16)
    d0, d1, d2 = cfg.block_dims
    di = cfg.initial_dim
    return {
        "conv1": _init_conv(ks[0], 7, 7, 1, di),
        "layer1_0": _init_block(ks[1], di, d0),
        "layer1_1": _init_block(ks[2], d0, d0),
        "layer2_0": _init_block(ks[3], d0, d1, 2),
        "layer2_1": _init_block(ks[4], d1, d1),
        "layer3_0": _init_block(ks[5], d1, d2, 2),
        "layer3_1": _init_block(ks[6], d2, d2),
        "layer3_outconv": _init_conv(ks[7], 1, 1, d2, d2, bn=False),
        "layer2_outconv": _init_conv(ks[8], 1, 1, d1, d2, bn=False),
        "layer2_outconv2_0": _init_conv(ks[9], 3, 3, d2, d2),
        "layer2_outconv2_1": _init_conv(ks[10], 3, 3, d2, d1, bn=False),
        "layer1_outconv": _init_conv(ks[11], 1, 1, d0, d1, bn=False),
        "layer1_outconv2_0": _init_conv(ks[12], 3, 3, d1, d1),
        "layer1_outconv2_1": _init_conv(ks[13], 3, 3, d1, d0, bn=False),
    }


# ---------------------------------------------------------------------------
# positional encoding (ref position_encoding.py, temp_bug_fix=False per
# cvpr_ds_config.py:28 — the released ckpt was trained with the buggy temp)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=4)
def _sine_pos_encoding(d_model, H, W, temp_bug_fix=False):
    pe = np.zeros((H, W, d_model), np.float32)
    y = np.arange(1, H + 1, dtype=np.float32)[:, None]
    x = np.arange(1, W + 1, dtype=np.float32)[None, :]
    if temp_bug_fix:
        div = np.exp(np.arange(0, d_model // 2, 2, dtype=np.float32)
                     * (-math.log(10000.0) / (d_model // 2)))
    else:
        div = np.exp(np.arange(0, d_model // 2, 2, dtype=np.float32)
                     * (-math.log(10000.0) / d_model // 2))
    pe[..., 0::4] = np.sin(x[..., None] * div)
    pe[..., 1::4] = np.cos(x[..., None] * div)
    pe[..., 2::4] = np.sin(y[..., None] * div)
    pe[..., 3::4] = np.cos(y[..., None] * div)
    return pe  # numpy on purpose: a jnp array built under trace would leak


# ---------------------------------------------------------------------------
# transformer: linear attention encoder layers
# ---------------------------------------------------------------------------

def _linear_attention(q, k, v, eps=1e-6):
    """elu+1 feature-map linear attention (ref linear_attention.py:14-46).
    @q: (N,L,H,D); @k,@v: (N,S,H,D)."""
    Q = jax.nn.elu(q) + 1.0
    K = jax.nn.elu(k) + 1.0
    S = v.shape[1]
    v = v / S
    KV = jnp.einsum("nshd,nshv->nhdv", K, v)
    Z = 1.0 / (jnp.einsum("nlhd,nhd->nlh", Q, K.sum(axis=1)) + eps)
    return jnp.einsum("nlhd,nhdv,nlh->nlhv", Q, KV, Z) * S


def _encoder_layer(params, x, source, nhead):
    """Ref transformer.py LoFTREncoderLayer.forward."""
    N, L, C = x.shape
    D = C // nhead
    q = _linear(params["q_proj"], x).reshape(N, L, nhead, D)
    k = _linear(params["k_proj"], source).reshape(N, -1, nhead, D)
    v = _linear(params["v_proj"], source).reshape(N, -1, nhead, D)
    msg = _linear_attention(q, k, v).reshape(N, L, C)
    msg = _layernorm(params["norm1"], _linear(params["merge"], msg))
    h = jnp.concatenate([x, msg], axis=-1)
    h = jax.nn.relu(_linear(params["mlp_0"], h))
    msg = _layernorm(params["norm2"], _linear(params["mlp_1"], h))
    return x + msg


def _init_encoder_layer(key, d_model):
    ks = jax.random.split(key, 6)
    return {
        "q_proj": _init_linear(ks[0], d_model, d_model),
        "k_proj": _init_linear(ks[1], d_model, d_model),
        "v_proj": _init_linear(ks[2], d_model, d_model),
        "merge": _init_linear(ks[3], d_model, d_model),
        "mlp_0": _init_linear(ks[4], d_model * 2, d_model * 2),
        "mlp_1": _init_linear(ks[5], d_model * 2, d_model),
        "norm1": {"g": jnp.ones((d_model,)), "b": jnp.zeros((d_model,))},
        "norm2": {"g": jnp.ones((d_model,)), "b": jnp.zeros((d_model,))},
    }


def _transformer(layers, feat0, feat1, nhead):
    """Alternating (self, cross) layers (ref transformer.py:91-98).

    NOTE the reference cross step is SEQUENTIAL: feat1 attends to the
    ALREADY-UPDATED feat0 (golden-parity fixture caught the parallel
    variant diverging)."""
    for i, layer in enumerate(layers):
        if i % 2 == 0:  # self
            feat0 = _encoder_layer(layer, feat0, feat0, nhead)
            feat1 = _encoder_layer(layer, feat1, feat1, nhead)
        else:           # cross
            feat0 = _encoder_layer(layer, feat0, feat1, nhead)
            feat1 = _encoder_layer(layer, feat1, feat0, nhead)
    return feat0, feat1


# ---------------------------------------------------------------------------
# init + full forward
# ---------------------------------------------------------------------------

def init_loftr_params(key, cfg: LoftrConfig = LoftrConfig()):
    ks = jax.random.split(key, 4 + 2 * cfg.n_coarse_layers
                          + 2 * cfg.n_fine_layers)
    params = {
        "backbone": _init_backbone(ks[0], cfg),
        "coarse_layers": [
            _init_encoder_layer(ks[1 + i], cfg.d_coarse)
            for i in range(2 * cfg.n_coarse_layers)],
        "fine_layers": [
            _init_encoder_layer(ks[1 + 2 * cfg.n_coarse_layers + i],
                                cfg.d_fine)
            for i in range(2 * cfg.n_fine_layers)],
    }
    if cfg.fine_concat_coarse:
        k1, k2 = ks[-2], ks[-1]
        params["down_proj"] = _init_linear(k1, cfg.d_coarse, cfg.d_fine,
                                           bias=True)
        params["merge_feat"] = _init_linear(k2, 2 * cfg.d_fine, cfg.d_fine,
                                            bias=True)
    return params


@functools.partial(jax.jit, static_argnames=("cfg", "debug"))
def loftr_forward(params, img0, img1, cfg: LoftrConfig = LoftrConfig(),
                  debug: bool = False):
    """Match two grayscale images.

    @img0/@img1: (H,W) float32 in [0,1], H,W divisible by 8.
    Returns dict with static top-K slots:
      uv0, uv1: (K,2) pixel coords; conf: (K,) (0 = invalid slot).
    @debug adds the dense coarse confidence matrix (L,S) for parity tests.
    """
    H, W = img0.shape
    hc, wc = H // 8, W // 8
    hf, wf = H // 2, W // 2
    stride = hf // hc  # 4
    Wwin = cfg.fine_window

    x = jnp.stack([img0, img1])[..., None]  # (2,H,W,1)
    if cfg.amp:
        params = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if a.dtype == jnp.float32 else a, params)
        x = x.astype(jnp.bfloat16)
    feat_c, feat_f = backbone_forward(params["backbone"], x)
    pe = jnp.asarray(_sine_pos_encoding(cfg.d_coarse, hc, wc),
                     dtype=feat_c.dtype)
    feat_c = (feat_c + pe[None]).reshape(2, hc * wc, cfg.d_coarse)
    fc0, fc1 = _transformer(params["coarse_layers"], feat_c[:1], feat_c[1:2],
                            cfg.nhead)

    # dual-softmax confidence in f32 (ref coarse_matching.py:112-119;
    # torch autocast also computes softmax in fp32)
    f0 = fc0[0].astype(jnp.float32) / cfg.d_coarse ** 0.5
    f1 = fc1[0].astype(jnp.float32) / cfg.d_coarse ** 0.5
    sim = (f0 @ f1.T) / cfg.dsmax_temperature  # (L,S)
    conf = jax.nn.softmax(sim, axis=0) * jax.nn.softmax(sim, axis=1)

    # threshold + border removal + mutual NN (ref :171-189)
    L = hc * wc
    iy = jnp.arange(L) // wc
    ix = jnp.arange(L) % wc
    border0 = ((iy < cfg.border_rm) | (iy >= hc - cfg.border_rm)
               | (ix < cfg.border_rm) | (ix >= wc - cfg.border_rm))
    ok = (conf > cfg.match_thr)
    ok &= ~border0[:, None] & ~border0[None, :]
    ok &= conf == conf.max(axis=1, keepdims=True)
    ok &= conf == conf.max(axis=0, keepdims=True)

    # static top-K: best j per i, ranked by confidence
    j_best = jnp.argmax(conf, axis=1)
    row_conf = jnp.where(ok[jnp.arange(L), j_best],
                         conf[jnp.arange(L), j_best], 0.0)
    # K is static per (H,W) compile; small images can have fewer coarse
    # cells than max_matches (full-dims config on a 64x64 crop)
    K = min(cfg.max_matches, L)
    top_conf, i_ids = jax.lax.top_k(row_conf, K)
    j_ids = j_best[i_ids]
    valid = top_conf > 0.0

    # coarse pixel coords (scale 8)
    uv0_c = jnp.stack([(i_ids % wc) * 8, (i_ids // wc) * 8], -1).astype(
        jnp.float32)
    uv1_c = jnp.stack([(j_ids % wc) * 8, (j_ids // wc) * 8], -1).astype(
        jnp.float32)

    # fine windows: 5x5 crop around (i*stride, j*stride) in the fine maps
    # (ref fine_preprocess.py:40-47 F.unfold semantics)
    ff0 = feat_f[0]
    ff1 = feat_f[1]
    r = Wwin // 2
    dy, dx = jnp.meshgrid(jnp.arange(-r, r + 1), jnp.arange(-r, r + 1),
                          indexing="ij")
    offs = jnp.stack([dy.ravel(), dx.ravel()], -1)  # (25,2)

    def crop(fmap, ids):
        cy = (ids // wc) * stride
        cx = (ids % wc) * stride
        yy = cy[:, None] + offs[None, :, 0]
        xx = cx[:, None] + offs[None, :, 1]
        inb = ((yy >= 0) & (yy < hf) & (xx >= 0) & (xx < wf))[..., None]
        yy = jnp.clip(yy, 0, hf - 1)
        xx = jnp.clip(xx, 0, wf - 1)
        return fmap[yy, xx] * inb  # zero-pad off-image (unfold pads with 0)

    win0 = crop(ff0, i_ids)  # (K,25,128)
    win1 = crop(ff1, j_ids)

    if cfg.fine_concat_coarse:
        ctx = jnp.concatenate([fc0[0][i_ids], fc1[0][j_ids]], axis=0)
        ctx = _linear(params["down_proj"], ctx)  # (2K,128)
        wins = jnp.concatenate([win0, win1], axis=0)  # (2K,25,128)
        merged = _linear(params["merge_feat"], jnp.concatenate(
            [wins, jnp.broadcast_to(ctx[:, None], wins.shape)], axis=-1))
        win0, win1 = merged[:K], merged[K:]

    win0, win1 = _transformer(params["fine_layers"], win0, win1, cfg.nhead)

    # expectation subpixel refinement (ref fine_matching.py:42-60)
    center = win0[:, (Wwin * Wwin) // 2, :]  # (K,128)
    sim_f = jnp.einsum("kc,krc->kr", center, win1).astype(
        jnp.float32) / cfg.d_fine ** 0.5
    heat = jax.nn.softmax(sim_f, axis=-1)  # (K,25)
    grid = jnp.stack([dx.ravel(), dy.ravel()], -1).astype(jnp.float32) / r
    expect = heat @ grid  # (K,2) in [-1,1]
    scale_f = H // hf  # 2
    uv1_f = uv1_c + expect * r * scale_f

    out = {"uv0": uv0_c, "uv1": uv1_f, "conf": top_conf * valid}
    if debug:
        out["conf_matrix"] = conf
    return out


# ---------------------------------------------------------------------------
# torch checkpoint port
# ---------------------------------------------------------------------------

def convert_torch_state_dict(sd, cfg: LoftrConfig = LoftrConfig()):
    """Convert the pretrained torch `outdoor_ds.ckpt` state_dict (keys
    already stripped of the 'matcher.' prefix, as loftr_wrapper.py does)
    into our parameter pytree. Conv weights OIHW->HWIO, linear OI->IO,
    BatchNorms folded into conv scale/bias."""
    import numpy as np

    def t(name):
        return np.asarray(sd[name])

    def conv(prefix, bn_prefix=None):
        p = {"w": jnp.asarray(np.transpose(t(f"{prefix}.weight"),
                                           (2, 3, 1, 0)))}
        if bn_prefix is not None:
            scale, bias = _fuse_bn(t(f"{bn_prefix}.weight"),
                                   t(f"{bn_prefix}.bias"),
                                   t(f"{bn_prefix}.running_mean"),
                                   t(f"{bn_prefix}.running_var"))
            p["bn_scale"] = jnp.asarray(scale)
            p["bn_bias"] = jnp.asarray(bias)
        return p

    def block(prefix):
        p = {"conv1": conv(f"{prefix}.conv1", f"{prefix}.bn1"),
             "conv2": conv(f"{prefix}.conv2", f"{prefix}.bn2")}
        if f"{prefix}.downsample.0.weight" in sd:
            p["down"] = conv(f"{prefix}.downsample.0",
                             f"{prefix}.downsample.1")
        return p

    def linear(prefix, bias=False):
        p = {"w": jnp.asarray(np.transpose(t(f"{prefix}.weight")))}
        if bias:
            p["b"] = jnp.asarray(t(f"{prefix}.bias"))
        return p

    def enc_layer(prefix):
        return {
            "q_proj": linear(f"{prefix}.q_proj"),
            "k_proj": linear(f"{prefix}.k_proj"),
            "v_proj": linear(f"{prefix}.v_proj"),
            "merge": linear(f"{prefix}.merge"),
            "mlp_0": linear(f"{prefix}.mlp.0"),
            "mlp_1": linear(f"{prefix}.mlp.2"),
            "norm1": {"g": jnp.asarray(t(f"{prefix}.norm1.weight")),
                      "b": jnp.asarray(t(f"{prefix}.norm1.bias"))},
            "norm2": {"g": jnp.asarray(t(f"{prefix}.norm2.weight")),
                      "b": jnp.asarray(t(f"{prefix}.norm2.bias"))},
        }

    bb = "backbone"
    params = {"backbone": {
        "conv1": conv(f"{bb}.conv1", f"{bb}.bn1"),
        "layer1_0": block(f"{bb}.layer1.0"),
        "layer1_1": block(f"{bb}.layer1.1"),
        "layer2_0": block(f"{bb}.layer2.0"),
        "layer2_1": block(f"{bb}.layer2.1"),
        "layer3_0": block(f"{bb}.layer3.0"),
        "layer3_1": block(f"{bb}.layer3.1"),
        "layer3_outconv": conv(f"{bb}.layer3_outconv"),
        "layer2_outconv": conv(f"{bb}.layer2_outconv"),
        "layer2_outconv2_0": conv(f"{bb}.layer2_outconv2.0",
                                  f"{bb}.layer2_outconv2.1"),
        "layer2_outconv2_1": conv(f"{bb}.layer2_outconv2.3"),
        "layer1_outconv": conv(f"{bb}.layer1_outconv"),
        "layer1_outconv2_0": conv(f"{bb}.layer1_outconv2.0",
                                  f"{bb}.layer1_outconv2.1"),
        "layer1_outconv2_1": conv(f"{bb}.layer1_outconv2.3"),
    }}
    params["coarse_layers"] = [enc_layer(f"loftr_coarse.layers.{i}")
                               for i in range(2 * cfg.n_coarse_layers)]
    params["fine_layers"] = [enc_layer(f"loftr_fine.layers.{i}")
                             for i in range(2 * cfg.n_fine_layers)]
    if cfg.fine_concat_coarse:
        params["down_proj"] = linear("fine_preprocess.down_proj", bias=True)
        params["merge_feat"] = linear("fine_preprocess.merge_feat", bias=True)
    return params


# ---------------------------------------------------------------------------
# wrapper with the LoftrRunner contract (ref loftr_wrapper.py:19-82)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("cfg",))
def loftr_forward_batch(params, imgs0, imgs1, cfg: LoftrConfig = LoftrConfig()):
    """Match a batch of grayscale pairs in ONE device dispatch.

    The reference batches 64 pairs per forward (loftr_wrapper.py:43-56);
    per-pair dispatches through the axon tunnel cost 10-35ms EACH, so the
    whole pair set must ride one program. @imgs0/@imgs1: (B,H,W) in [0,1].
    Returns dict of (B,K,...) arrays.
    """
    return jax.vmap(lambda a, b: loftr_forward(params, a, b, cfg))(
        imgs0, imgs1)


class LoftrMatcher:
    """predict(rgbAs, rgbBs) -> list of (N,5) [uA,vA,uB,vB,conf].

    Pairs are stacked and dispatched as ONE batched jitted forward per
    static bucket size (the reference runs batch-64 GPU inference,
    loftr_wrapper.py:43-56; per-pair dispatch wastes ~10-35ms of tunnel
    latency each on the axon setup).
    """

    # Device micro-batch is capped at 16: the fine-level window gather
    # allocates ~0.4 GB of HLO temps per pair at 400x400 (batch 64 asks
    # for 25 GB and fails HBM compile on a 16 GB v5e). A reference-sized
    # batch of 64 pairs (loftr_wrapper.py:43-56) loops 4x over the one
    # compiled batch-16 program — throughput, not peak memory, scales.
    BUCKETS = (1, 2, 4, 8, 16)

    def __init__(self, params=None, ckpt_path=None,
                 cfg: LoftrConfig = LoftrConfig(), seed=0):
        self.cfg = cfg
        if params is not None:
            self.params = params
        elif ckpt_path is not None:
            import torch
            ckpt = torch.load(ckpt_path, map_location="cpu",
                              weights_only=False)
            sd = {k.replace("matcher.", "", 1): v.numpy()
                  for k, v in ckpt["state_dict"].items()}
            self.params = convert_torch_state_dict(sd, cfg)
        else:
            self.params = init_loftr_params(jax.random.PRNGKey(seed), cfg)
        if cfg.amp:
            # cast weights to bf16 ONCE here: casting inside the jitted
            # forward re-ran the conversion per dispatch and kept both the
            # f32 and bf16 copies of every weight live in HBM (the
            # in-forward tree-map below stays as a no-op for direct
            # loftr_forward callers that pass f32 params)
            self.params = jax.tree.map(
                lambda a: a.astype(jnp.bfloat16)
                if a.dtype == jnp.float32 else a, self.params)

    def _to_gray(self, img):
        import cv2
        a = np.asarray(img)
        if a.ndim == 3:
            a = cv2.cvtColor(a, cv2.COLOR_RGB2GRAY)
        H = a.shape[0] // 8 * 8
        W = a.shape[1] // 8 * 8
        return a[:H, :W].astype(np.float32) / 255.0

    def predict(self, rgbAs, rgbBs):
        n = len(rgbAs)
        if n == 0:
            return []
        grayA = [self._to_gray(i) for i in rgbAs]
        grayB = [self._to_gray(i) for i in rgbBs]
        # the bucketed batch requires uniform image size; group pairs by
        # (H, W) so heterogeneous inputs (supported by the old per-pair
        # loop) still work — within the pipeline all pairs share the
        # canonical 400x400 warp, so this is one group in practice
        by_shape = {}
        for i in range(n):
            sh = (grayA[i].shape, grayB[i].shape)
            by_shape.setdefault(sh, []).append(i)
        out = [None] * n
        for ids in by_shape.values():
            start = 0
            while start < len(ids):
                chunk = min(len(ids) - start, self.BUCKETS[-1])
                bucket = next(b for b in self.BUCKETS if b >= chunk)
                a = np.zeros((bucket,) + grayA[ids[0]].shape, np.float32)
                b = np.zeros((bucket,) + grayB[ids[0]].shape, np.float32)
                for i in range(chunk):
                    a[i] = grayA[ids[start + i]]
                    b[i] = grayB[ids[start + i]]
                res = loftr_forward_batch(self.params, jnp.asarray(a),
                                          jnp.asarray(b), self.cfg)
                uv0 = np.asarray(res["uv0"])
                uv1 = np.asarray(res["uv1"])
                conf = np.asarray(res["conf"])
                for i in range(chunk):
                    keep = conf[i] > 0
                    rows = np.concatenate([uv0[i][keep], uv1[i][keep],
                                           conf[i][keep][:, None]], axis=-1)
                    out[ids[start + i]] = rows.astype(np.float32)
                start += chunk
        return out
