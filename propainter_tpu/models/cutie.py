"""Cutie video-object-segmentation model (the web demo's VOS tracker), NHWC.

TPU-native re-implementation of the reference's vendored Cutie
(web-demos/hugging_face/tracker/model/*): a query-transformer VOS network
with pixel/mask resnet encoders, an anisotropic-L2 key memory, object
summaries, a sensory (GRU) memory and a skip-connected mask decoder.

Module/attribute names mirror the torch tree so the mechanical converter
(convert/torch_to_jax.py) maps the released `cutie-base-mega.pth` weights;
`convert_cutie_state_dict` below adds the Cutie-specific pre-processing
(MultiheadAttention in_proj splits, Embedding/Conv1d leaf handling).

Layout conventions:
  * shared ("x") features: (B, H, W, C);
  * per-object ("g") features: (B, N, H, W, C) — folded to (B*N, H, W, C)
    around convolutions (reference group_modules.py GConv2d);
  * memory keys/values keep the token axis LAST: (B, C, T_tokens).

Inference-time memory management lives in propainter_tpu/demo/cutie_core.py.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from propainter_tpu.models.layers import conv2d, FrozenBatchNorm
from propainter_tpu.ops.interp import resize


@dataclasses.dataclass(frozen=True)
class CutieConfig:
    """Mirror of the demo CONFIG['model'] (tracker/config/__init__.py:1)."""

    pixel_mean: tuple = (0.485, 0.456, 0.406)
    pixel_std: tuple = (0.229, 0.224, 0.225)
    pixel_dim: int = 256
    key_dim: int = 64
    value_dim: int = 256
    sensory_dim: int = 256
    embed_dim: int = 256
    pixel_encoder_type: str = "resnet50"
    ms_dims: tuple = (1024, 512, 256)
    mask_encoder_type: str = "resnet18"
    mask_encoder_final_dim: int = 256
    pixel_pe_scale: float = 32.0
    pixel_pe_temperature: float = 128.0
    ot_ff_dim: int = 2048
    ot_num_heads: int = 8
    ot_num_blocks: int = 3
    ot_num_queries: int = 16
    up_dims: tuple = (256, 128, 128)


# ---------------------------------------------------------------------------
# ResNet trunk (frozen BN) — reference tracker/model/utils/resnet.py
# ---------------------------------------------------------------------------


class _BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    has_downsample: bool = False

    @nn.compact
    def __call__(self, x):
        r = x
        y = conv2d(self.planes, 3, self.stride, 1, bias=False,
                   name="conv1")(x)
        y = FrozenBatchNorm(self.planes, name="bn1")(y)
        y = jax.nn.relu(y)
        y = conv2d(self.planes, 3, 1, 1, bias=False, name="conv2")(y)
        y = FrozenBatchNorm(self.planes, name="bn2")(y)
        if self.has_downsample:
            r = conv2d(self.planes, 1, self.stride, 0, bias=False,
                       name="downsample_0")(x)
            r = FrozenBatchNorm(self.planes, name="downsample_1")(r)
        return jax.nn.relu(y + r)


class _Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    has_downsample: bool = False

    @nn.compact
    def __call__(self, x):
        r = x
        y = conv2d(self.planes, 1, 1, 0, bias=False, name="conv1")(x)
        y = FrozenBatchNorm(self.planes, name="bn1")(y)
        y = jax.nn.relu(y)
        y = conv2d(self.planes, 3, self.stride, 1, bias=False,
                   name="conv2")(y)
        y = FrozenBatchNorm(self.planes, name="bn2")(y)
        y = jax.nn.relu(y)
        y = conv2d(self.planes * 4, 1, 1, 0, bias=False, name="conv3")(y)
        y = FrozenBatchNorm(self.planes * 4, name="bn3")(y)
        if self.has_downsample:
            r = conv2d(self.planes * 4, 1, self.stride, 0, bias=False,
                       name="downsample_0")(x)
            r = FrozenBatchNorm(self.planes * 4, name="downsample_1")(r)
        return jax.nn.relu(y + r)


def _max_pool_3x3s2(x):
    """torch MaxPool2d(kernel=3, stride=2, padding=1)."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)])


class ResNetTrunk(nn.Module):
    """conv1..layer3 of a torchvision-layout resnet (layer names passed in
    so PixelEncoder can alias layer1 as 'res2' like the reference,
    big_modules.py:33-39)."""

    arch: str  # 'resnet18' | 'resnet50'
    layer_names: Sequence[str] = ("layer1", "layer2", "layer3")

    @nn.compact
    def __call__(self, x):
        block = _BasicBlock if self.arch == "resnet18" else _Bottleneck
        counts = (2, 2, 2) if self.arch == "resnet18" else (3, 4, 6)
        expansion = 1 if self.arch == "resnet18" else 4

        x = conv2d(64, 7, 2, 3, bias=False, name="conv1")(x)
        x = FrozenBatchNorm(64, name="bn1")(x)
        x = jax.nn.relu(x)
        x = _max_pool_3x3s2(x)

        feats = []
        inplanes = 64
        for li, (lname, n, planes, stride) in enumerate(zip(
                self.layer_names, counts, (64, 128, 256), (1, 2, 2))):
            for bi in range(n):
                s = stride if bi == 0 else 1
                ds = bi == 0 and (s != 1 or inplanes != planes * expansion)
                x = block(planes, s, ds, name=f"{lname}_{bi}")(x)
                inplanes = planes * expansion
            feats.append(x)
        return feats  # [f4, f8, f16]


# ---------------------------------------------------------------------------
# Group helpers — reference tracker/model/group_modules.py
# ---------------------------------------------------------------------------


def _fold(g):  # (B, N, H, W, C) -> (B*N, H, W, C)
    B, N = g.shape[:2]
    return g.reshape((B * N,) + g.shape[2:]), (B, N)


def _unfold(x, bn):
    B, N = bn
    return x.reshape((B, N) + x.shape[1:])


def upsample_groups(g, ratio=2):
    """bilinear, align_corners=False (group_modules.py:20-24)."""
    x, bn = _fold(g)
    H, W = x.shape[1:3]
    x = resize(x, (H * ratio, W * ratio), "bilinear", align_corners=False)
    return _unfold(x, bn)


def downsample_groups(g, factor=2):
    """area interpolation at an integer factor == average pooling."""
    x, bn = _fold(g)
    B, H, W, C = x.shape
    x = x.reshape(B, H // factor, factor, W // factor, factor, C).mean(
        axis=(2, 4))
    return _unfold(x, bn)


def avg_pool_area(x, factor):
    """F.interpolate(mode='area') at integer factor, NHWC."""
    B, H, W, C = x.shape
    return x.reshape(B, H // factor, factor, W // factor, factor, C).mean(
        axis=(2, 4))


class GroupResBlock(nn.Module):
    out_dim: int

    @nn.compact
    def __call__(self, g):
        x, bn = _fold(g)
        y = conv2d(self.out_dim, 3, 1, 1, name="conv1")(jax.nn.relu(x))
        y = conv2d(self.out_dim, 3, 1, 1, name="conv2")(jax.nn.relu(y))
        if x.shape[-1] != self.out_dim:
            x = conv2d(self.out_dim, 1, 1, 0, name="downsample")(x)
        return _unfold(y + x, bn)


class CAResBlock(nn.Module):
    """Channel-attention res block (tracker/model/channel_attn.py:7-39)."""

    out_dim: int

    @nn.compact
    def __call__(self, x):  # (B', H, W, C)
        r = x
        y = conv2d(self.out_dim, 3, 1, 1, name="conv1")(jax.nn.relu(x))
        y = conv2d(self.out_dim, 3, 1, 1, name="conv2")(jax.nn.relu(y))

        t = int((abs(math.log2(self.out_dim)) + 1) // 2)
        k = t if t % 2 else t + 1
        # eca: adaptive-avg-pool to (1,1) then a k-tap conv over the CHANNEL
        # axis (torch Conv1d(1, 1, k, padding=(k-1)//2, bias=False))
        w = jnp.mean(y, axis=(1, 2))  # (B', C)
        kern = self.param("eca_kernel", nn.initializers.normal(0.02), (k,))
        wp = jnp.pad(w, ((0, 0), ((k - 1) // 2, (k - 1) // 2)))
        w = sum(wp[:, i : i + y.shape[-1]] * kern[i] for i in range(k))
        w = jax.nn.sigmoid(w)[:, None, None, :]

        if x.shape[-1] != self.out_dim:
            r = conv2d(self.out_dim, 1, 1, 0, name="downsample")(r)
        return y * w + r


class GroupFeatureFusionBlock(nn.Module):
    """x (shared) + g (grouped) -> fused grouped features
    (group_modules.py:104-129)."""

    out_dim: int

    @nn.compact
    def __call__(self, x, g):
        # distributor with x/g 1x1 transforms, method='add'
        xt = conv2d(self.out_dim, 1, 1, 0, name="distributor_x_transform")(x)
        gf, bn = _fold(g)
        gt = conv2d(self.out_dim, 1, 1, 0, name="distributor_g_transform")(gf)
        g = _unfold(gt, bn) + xt[:, None]
        gf, bn = _fold(g)
        gf = CAResBlock(self.out_dim, name="block1")(gf)
        gf = CAResBlock(self.out_dim, name="block2")(gf)
        return _unfold(gf, bn)


def _recurrent_update(h, values):
    """GRU-style sensory update (tracker/model/modules.py:36-44)."""
    dim = values.shape[-1] // 3
    forget = jax.nn.sigmoid(values[..., :dim])
    update = jax.nn.sigmoid(values[..., dim : 2 * dim])
    new_value = jnp.tanh(values[..., 2 * dim :])
    return forget * h * (1 - update) + update * new_value


class SensoryDeepUpdater(nn.Module):
    sensory_dim: int

    @nn.compact
    def __call__(self, g, h):  # both (B, N, H, W, C)
        x, bn = _fold(jnp.concatenate([g, h], axis=-1))
        values = conv2d(self.sensory_dim * 3, 3, 1, 1, name="transform")(x)
        return _recurrent_update(h, _unfold(values, bn))


class SensoryUpdater(nn.Module):
    """Multi-scale decoder-driven sensory update (modules.py:47-69)."""

    mid_dim: int
    sensory_dim: int

    @nn.compact
    def __call__(self, g16, g8, g4, h):
        def gconv(g, name):
            x, bn = _fold(g)
            return _unfold(conv2d(self.mid_dim, 1, 1, 0, name=name)(x), bn)

        g = (gconv(g16, "g16_conv")
             + gconv(downsample_groups(g8, 2), "g8_conv")
             + gconv(downsample_groups(g4, 4), "g4_conv"))
        x, bn = _fold(jnp.concatenate([g, h], axis=-1))
        values = conv2d(self.sensory_dim * 3, 3, 1, 1, name="transform")(x)
        return _recurrent_update(h, _unfold(values, bn))


# ---------------------------------------------------------------------------
# Positional encoding — tracker/model/transformer/positional_encoding.py
# ---------------------------------------------------------------------------


def positional_encoding_2d(h: int, w: int, dim: int, scale: float,
                           temperature: float) -> np.ndarray:
    """(h, w, 2*ceil(dim/4)*2) sin/cos embedding, normalized coords."""
    d = int(np.ceil(dim / 4) * 2)
    inv_freq = 1.0 / (temperature ** (np.arange(0, d, 2, np.float32) / d))
    eps = 1e-6
    pos_y = np.arange(h, dtype=np.float32)
    pos_x = np.arange(w, dtype=np.float32)
    pos_y = pos_y / (pos_y[-1] + eps) * scale
    pos_x = pos_x / (pos_x[-1] + eps) * scale

    def emb(pos):
        sin_inp = pos[:, None] * inv_freq[None, :]
        e = np.stack([np.sin(sin_inp), np.cos(sin_inp)], -1)
        return e.reshape(pos.shape[0], -1)

    emb_y = emb(pos_y)[:, None, :]  # (h, 1, d)
    emb_x = emb(pos_x)[None, :, :]  # (1, w, d)
    out = np.zeros((h, w, d * 2), np.float32)
    out[:, :, :d] = emb_x
    out[:, :, d:] = np.broadcast_to(emb_y, (h, w, d))
    return out


# ---------------------------------------------------------------------------
# Attention — torch nn.MultiheadAttention parity
# ---------------------------------------------------------------------------


class MultiheadAttention(nn.Module):
    dim: int
    nhead: int

    @nn.compact
    def __call__(self, q, k, v, attn_mask=None):
        """q (B', Tq, C), k/v (B', Tk, C); attn_mask (B'*h, Tq, Tk) bool,
        True = blocked (torch convention)."""
        hd = self.dim // self.nhead
        B = q.shape[0]
        qp = nn.Dense(self.dim, name="q_proj")(q)
        kp = nn.Dense(self.dim, name="k_proj")(k)
        vp = nn.Dense(self.dim, name="v_proj")(v)

        def heads(x):
            return x.reshape(B, x.shape[1], self.nhead, hd).transpose(
                0, 2, 1, 3)

        qh, kh, vh = heads(qp), heads(kp), heads(vp)
        att = jnp.einsum("bhqc,bhkc->bhqk", qh, kh) / math.sqrt(hd)
        if attn_mask is not None:
            m = attn_mask.reshape(B, self.nhead, att.shape[2], att.shape[3])
            att = jnp.where(m, -jnp.inf, att)
        att = jax.nn.softmax(att, axis=-1)
        out = jnp.einsum("bhqk,bhkc->bhqc", att, vh)
        out = out.transpose(0, 2, 1, 3).reshape(B, -1, self.dim)
        return nn.Dense(self.dim, name="out_proj")(out)


class SelfAttention(nn.Module):
    """transformer_layers.py:12-41 (pre-LN, residual outside)."""

    dim: int
    nhead: int
    add_pe_to_qkv: tuple = (True, True, False)

    @nn.compact
    def __call__(self, x, pe):
        x = nn.LayerNorm(name="norm")(x)
        xpe = x + pe
        q = xpe if self.add_pe_to_qkv[0] else x
        k = xpe if self.add_pe_to_qkv[1] else x
        v = xpe if self.add_pe_to_qkv[2] else x
        return x + MultiheadAttention(self.dim, self.nhead,
                                      name="self_attn")(q, k, v)


class CrossAttention(nn.Module):
    """transformer_layers.py:45-99."""

    dim: int
    nhead: int
    add_pe_to_qkv: tuple = (True, True, False)
    norm: bool = True

    @nn.compact
    def __call__(self, x, mem, x_pe, mem_pe, attn_mask=None):
        if self.norm:
            x = nn.LayerNorm(name="norm")(x)
        q = x + x_pe if self.add_pe_to_qkv[0] else x
        mem_pe_sum = mem + mem_pe
        k = mem_pe_sum if self.add_pe_to_qkv[1] else mem
        v = mem_pe_sum if self.add_pe_to_qkv[2] else mem
        return x + MultiheadAttention(self.dim, self.nhead,
                                      name="cross_attn")(q, k, v, attn_mask)


class FFN(nn.Module):
    dim_ff: int

    @nn.compact
    def __call__(self, x):
        r = x
        x = nn.LayerNorm(name="norm")(x)
        x = nn.Dense(self.dim_ff, name="linear1")(x)
        x = nn.Dense(r.shape[-1], name="linear2")(jax.nn.relu(x))
        return r + x


class PixelFFN(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, pixel, pixel_flat):
        # pixel (B, N, H, W, C); pixel_flat (B*N, H*W, C)
        B, N, H, W, C = pixel.shape
        x = pixel_flat.reshape(B * N, H, W, C)
        x = CAResBlock(self.dim, name="conv")(x)
        return x.reshape(B, N, H, W, C)


# ---------------------------------------------------------------------------
# Big modules — reference tracker/model/big_modules.py
# ---------------------------------------------------------------------------


class PixelEncoder(nn.Module):
    config: CutieConfig

    @nn.compact
    def __call__(self, image):
        # reference aliases resnet50 layer1 as 'res2' (big_modules.py:33-39)
        f4, f8, f16 = ResNetTrunk(
            self.config.pixel_encoder_type,
            layer_names=("res2", "layer2", "layer3"), name="trunk")(image)
        return f16, f8, f4


class KeyProjection(nn.Module):
    config: CutieConfig

    @nn.compact
    def __call__(self, f16, need_s=True, need_e=True):
        x = conv2d(self.config.pixel_dim, 1, 1, 0, name="pix_feat_proj")(f16)
        shrinkage = (conv2d(1, 3, 1, 1, name="d_proj")(x) ** 2 + 1
                     if need_s else None)
        selection = (jax.nn.sigmoid(conv2d(self.config.key_dim, 3, 1, 1,
                                           name="e_proj")(x))
                     if need_e else None)
        key = conv2d(self.config.key_dim, 3, 1, 1, name="key_proj")(x)
        return key, shrinkage, selection


class MaskEncoder(nn.Module):
    config: CutieConfig

    @nn.compact
    def __call__(self, image, pix_feat, sensory, masks, others,
                 deep_update=True):
        """image (B,H,W,3) normalized; pix_feat (B,h,w,pixel_dim);
        sensory (B,N,h,w,sensory_dim); masks/others (B,N,H,W)."""
        g = jnp.stack([masks, others], axis=-1)  # (B, N, H, W, 2)
        B, N = g.shape[:2]
        img = jnp.broadcast_to(image[:, None], (B, N) + image.shape[1:])
        g = jnp.concatenate([img, g], axis=-1)  # distributor 'cat'

        x, bn = _fold(g)
        feats = ResNetTrunk(self.config.mask_encoder_type, name="trunk")(x)
        g16 = _unfold(feats[2], bn)
        g = GroupFeatureFusionBlock(self.config.value_dim,
                                    name="fuser")(pix_feat, g16)
        if deep_update:
            new_sensory = SensoryDeepUpdater(
                self.config.sensory_dim, name="sensory_update")(g, sensory)
        else:
            new_sensory = sensory
        return g, new_sensory


class PixelFeatureFuser(nn.Module):
    config: CutieConfig

    @nn.compact
    def __call__(self, pix_feat, pixel_memory, sensory_memory, last_mask,
                 last_others):
        """pix_feat (B,h,w,C); pixel_memory (B,N,h,w,value_dim);
        sensory_memory (B,N,h,w,sensory); last_mask/others (B,N,h,w)."""
        g = jnp.stack([last_mask, last_others], axis=-1)
        x, bn = _fold(jnp.concatenate([sensory_memory, g], axis=-1))
        sensory_readout = conv2d(self.config.value_dim, 1, 1, 0,
                                 name="sensory_compress")(x)
        p16 = pixel_memory + _unfold(sensory_readout, bn)
        return GroupFeatureFusionBlock(self.config.embed_dim,
                                       name="fuser")(pix_feat, p16)


class ObjectSummarizer(nn.Module):
    """tracker/model/transformer/object_summarizer.py."""

    config: CutieConfig

    @nn.compact
    def __call__(self, masks, value):
        """masks (B,N,H0,W0) in [0,1]; value (B,N,h,w,value_dim).
        Returns summaries (B,N,num_summaries,embed_dim+1)."""
        cfg = self.config
        h, w = value.shape[2:4]
        H0 = masks.shape[2]
        m = avg_pool_area(masks[..., None].reshape(-1, H0, masks.shape[3], 1),
                          H0 // h)
        m = m.reshape(masks.shape[0], masks.shape[1], h, w, 1)
        inv_m = 1 - m
        ns = cfg.ot_num_queries
        repeated = jnp.concatenate([
            jnp.broadcast_to(m, m.shape[:-1] + (ns // 2,)),
            jnp.broadcast_to(inv_m, m.shape[:-1] + (ns // 2,))], axis=-1)

        v = nn.Dense(cfg.embed_dim, name="input_proj")(value)
        pe = jnp.asarray(positional_encoding_2d(
            h, w, cfg.embed_dim, cfg.pixel_pe_scale,
            cfg.pixel_pe_temperature))
        v = v + pe[None, None]

        f = nn.Dense(cfg.embed_dim, name="feature_pred_0")(v)
        f = nn.Dense(cfg.embed_dim, name="feature_pred_2")(jax.nn.relu(f))
        lg = nn.Dense(cfg.embed_dim, name="weights_pred_0")(v)
        lg = nn.Dense(ns, name="weights_pred_2")(jax.nn.relu(lg))

        weights = jax.nn.sigmoid(lg) * repeated
        sums = jnp.einsum("bkhwq,bkhwc->bkqc", weights, f)
        area = weights.sum(axis=(2, 3))[..., None]  # (B,N,ns,1)
        return jnp.concatenate([sums, area], axis=-1)


def aggregate(prob, axis):
    """Soft-aggregation logits (tracker/utils/tensor_utils.py:47-54)."""
    bg = jnp.prod(1 - prob, axis=axis, keepdims=True)
    new_prob = jnp.clip(jnp.concatenate([bg, prob], axis), 1e-7, 1 - 1e-7)
    return jnp.log(new_prob / (1 - new_prob))


class QueryTransformerBlock(nn.Module):
    config: CutieConfig

    @nn.compact
    def __call__(self, x, pixel, query_pe, pixel_pe, attn_mask):
        cfg = self.config
        B, N, H, W, C = pixel.shape
        pixel_flat = pixel.reshape(B * N, H * W, C)
        x = CrossAttention(cfg.embed_dim, cfg.ot_num_heads,
                           name="read_from_pixel")(
            x, pixel_flat, query_pe, pixel_pe, attn_mask)
        x = SelfAttention(cfg.embed_dim, cfg.ot_num_heads,
                          name="self_attn")(x, query_pe)
        x = FFN(cfg.ot_ff_dim, name="ffn")(x)
        pixel_flat = CrossAttention(
            cfg.embed_dim, cfg.ot_num_heads, norm=False,
            name="read_from_query")(pixel_flat, x, pixel_pe, query_pe)
        pixel = PixelFFN(cfg.embed_dim, name="pixel_ffn")(pixel, pixel_flat)
        return x, pixel


class QueryTransformer(nn.Module):
    """tracker/model/transformer/object_transformer.py QueryTransformer."""

    config: CutieConfig

    @nn.compact
    def __call__(self, pixel, obj_summaries, selector=None):
        """pixel (B,N,H,W,embed); obj_summaries (B,N,T,Q,embed+1).
        Returns (pixel', aux_logits list)."""
        cfg = self.config
        B, N, H, W, _ = pixel.shape
        Q = cfg.ot_num_queries

        obj = obj_summaries.reshape(B * N, -1, Q, cfg.embed_dim + 1)
        obj_sums = obj[..., :-1].sum(axis=1)
        obj_area = obj[..., -1:].sum(axis=1)
        obj_values = obj_sums / (obj_area + 1e-4)
        obj_init = nn.Dense(cfg.embed_dim, name="summary_to_query_init")(
            obj_values)
        obj_emb = nn.Dense(cfg.embed_dim, name="summary_to_query_emb")(
            obj_values)

        query_init_w = self.param("query_init_embedding",
                                  nn.initializers.normal(1.0),
                                  (Q, cfg.embed_dim))
        query_emb_w = self.param("query_emb_embedding",
                                 nn.initializers.normal(1.0),
                                 (Q, cfg.embed_dim))
        query = query_init_w[None] + obj_init
        query_emb = query_emb_w[None] + obj_emb

        pf, bn = _fold(pixel)
        pixel_init = _unfold(conv2d(cfg.embed_dim, 1, 1, 0,
                                    name="pixel_init_proj")(pf), bn)
        pixel_emb = conv2d(cfg.embed_dim, 1, 1, 0, name="pixel_emb_proj")(pf)
        pe = jnp.asarray(positional_encoding_2d(
            H, W, cfg.embed_dim, cfg.pixel_pe_scale,
            cfg.pixel_pe_temperature))
        pixel_pe = (pe[None] + pixel_emb).reshape(B * N, H * W, cfg.embed_dim)

        pixel = pixel_init
        aux_logits = []

        def mask_pred(p, i):
            x, bn2 = _fold(p)
            lg = conv2d(1, 1, 1, 0, name=f"mask_pred_{i}")(jax.nn.relu(x))
            return _unfold(lg, bn2)[..., 0]  # (B, N, H, W)

        lg = mask_pred(pixel, 0)
        aux_logits.append(lg)
        attn_mask = self._aux_mask(lg, selector)
        for i in range(cfg.ot_num_blocks):
            query, pixel = QueryTransformerBlock(
                cfg, name=f"blocks_{i}")(query, pixel, query_emb, pixel_pe,
                                         attn_mask)
            lg = mask_pred(pixel, i + 1)
            aux_logits.append(lg)
            attn_mask = self._aux_mask(lg, selector)
        return pixel, aux_logits

    def _aux_mask(self, logits, selector):
        """object_transformer.py:_get_aux_mask — True = blocked."""
        cfg = self.config
        B, N, H, W = logits.shape
        prob = jax.nn.sigmoid(logits)
        if selector is not None:
            prob = prob * selector
        agg = aggregate(prob, axis=1)  # (B, N+1, H, W)
        is_fg = agg[:, 1:] >= jnp.max(agg, axis=1, keepdims=True)
        fg = is_fg.reshape(B, N, H * W)
        q2 = cfg.ot_num_queries // 2
        aux_fg = jnp.broadcast_to(
            (~fg)[:, :, None, None, :], (B, N, cfg.ot_num_heads, q2, H * W))
        aux_bg = jnp.broadcast_to(
            fg[:, :, None, None, :], (B, N, cfg.ot_num_heads, q2, H * W))
        mask = jnp.concatenate([aux_fg, aux_bg], axis=3)
        # unblock fully-masked rows (reference :199)
        all_blocked = mask.all(axis=-1, keepdims=True)
        mask = mask & ~all_blocked
        return mask.reshape(B * N * cfg.ot_num_heads, cfg.ot_num_queries,
                            H * W)


class MaskUpsampleBlock(nn.Module):
    out_dim: int

    @nn.compact
    def __call__(self, in_g, skip_f):
        g = upsample_groups(in_g, 2)
        g = g + skip_f[:, None]  # distributor method='add'
        return GroupResBlock(self.out_dim, name="out_conv")(g)


class MaskDecoder(nn.Module):
    config: CutieConfig

    @nn.compact
    def __call__(self, f16, f8, f4, memory_readout, sensory,
                 update_sensory=True):
        cfg = self.config
        # DecoderFeatureProcessor: ms_dims[1:] -> up_dims[:-1]
        # (tracker/model/modules.py:22-31)
        f8t = conv2d(cfg.up_dims[0], 1, 1, 0,
                     name="decoder_feat_proc_0")(f8)
        f4t = conv2d(cfg.up_dims[1], 1, 1, 0,
                     name="decoder_feat_proc_1")(f4)

        p16 = memory_readout
        p8 = MaskUpsampleBlock(cfg.up_dims[1], name="up_16_8")(p16, f8t)
        p4 = MaskUpsampleBlock(cfg.up_dims[2], name="up_8_4")(p8, f4t)
        x, bn = _fold(p4)
        logits = conv2d(1, 3, 1, 1, name="pred")(jax.nn.relu(x))
        logits_g = _unfold(logits, bn)  # (B, N, H4, W4, 1)

        if update_sensory:
            p4cat = jnp.concatenate([p4, logits_g], axis=-1)
            sensory = SensoryUpdater(
                cfg.sensory_dim, cfg.sensory_dim,
                name="sensory_update")(p16, p8, p4cat, sensory)
        return sensory, logits_g[..., 0]  # (B, N, H4, W4)


# ---------------------------------------------------------------------------
# Memory math — tracker/model/utils/memory_utils.py
# ---------------------------------------------------------------------------


def get_similarity(mk, ms, qk, qe):
    """Anisotropic L2 similarity (memory_utils.py:7-47).

    mk (B, Ck, N); ms (B, 1, N) or None; qk (B, Ck, P); qe (B, Ck, P) or
    None. Returns (B, N, P).
    """
    CK = mk.shape[1]
    if qe is not None:
        mk_t = mk.transpose(0, 2, 1)  # (B, N, Ck)
        a_sq = jnp.einsum("bnc,bcp->bnp", mk_t ** 2, qe)
        two_ab = 2 * jnp.einsum("bnc,bcp->bnp", mk_t, qk * qe)
        b_sq = jnp.sum(qe * qk ** 2, axis=1, keepdims=True)  # (B, 1, P)
        similarity = -a_sq + two_ab - b_sq
    else:
        a_sq = jnp.sum(mk ** 2, axis=1)[..., None]
        two_ab = 2 * jnp.einsum("bcn,bcp->bnp", mk, qk)
        similarity = -a_sq + two_ab
    if ms is not None:
        similarity = similarity * ms.transpose(0, 2, 1) / math.sqrt(CK)
    else:
        similarity = similarity / math.sqrt(CK)
    return similarity


def topk_softmax(similarity, top_k: Optional[int]):
    """Top-k-sparsified softmax over the memory-token axis
    (memory_utils.py:50-78)."""
    if top_k is None:
        return jax.nn.softmax(similarity, axis=1)
    B, N, P = similarity.shape
    k = min(top_k, N)
    sim_t = similarity.transpose(0, 2, 1)  # (B, P, N)
    values, indices = jax.lax.top_k(sim_t, k)
    x_exp = jnp.exp(values - values[..., :1])  # values sorted desc: max first
    x_exp = x_exp / jnp.sum(x_exp, axis=-1, keepdims=True)
    # scatter the k weights back
    aff = jnp.zeros((B, P, N), similarity.dtype)
    aff = aff.at[
        jnp.arange(B)[:, None, None],
        jnp.arange(P)[None, :, None],
        indices].set(x_exp)
    return aff.transpose(0, 2, 1)  # (B, N, P)


def readout(affinity, mv):
    """affinity (B, N, P); mv (B, N_obj, C, N) -> (B, N_obj, C, P)."""
    return jnp.einsum("bocn,bnp->bocp", mv, affinity)


# ---------------------------------------------------------------------------
# Top-level CUTIE
# ---------------------------------------------------------------------------


class CUTIE(nn.Module):
    """Functional Cutie: submodules exposed via `method=` apply calls
    (reference tracker/model/cutie.py:18)."""

    config: CutieConfig = CutieConfig()

    def setup(self):
        cfg = self.config
        self.pixel_encoder = PixelEncoder(cfg)
        self.pix_feat_proj = conv2d(cfg.pixel_dim, 1, 1, 0)
        self.key_proj = KeyProjection(cfg)
        self.mask_encoder = MaskEncoder(cfg)
        self.mask_decoder = MaskDecoder(cfg)
        self.pixel_fuser = PixelFeatureFuser(cfg)
        self.object_transformer = QueryTransformer(cfg)
        self.object_summarizer = ObjectSummarizer(cfg)

    def _normalize(self, image):
        mean = jnp.asarray(self.config.pixel_mean)
        std = jnp.asarray(self.config.pixel_std)
        return (image - mean) / std

    def encode_image(self, image):
        """image (B, H, W, 3) in [0,1] -> ((f16, f8, f4), pix_feat)."""
        image = self._normalize(image)
        f16, f8, f4 = self.pixel_encoder(image)
        return (f16, f8, f4), self.pix_feat_proj(f16)

    def transform_key(self, f16, need_s=True, need_e=True):
        return self.key_proj(f16, need_s, need_e)

    def encode_mask(self, image, pix_feat, sensory, masks, deep_update=True):
        """masks (B, N, H, W) in [0,1]. Returns (value, new_sensory,
        object_summaries)."""
        image = self._normalize(image)
        others = jnp.clip(masks.sum(axis=1, keepdims=True) - masks, 0, 1)
        value, new_sensory = self.mask_encoder(
            image, pix_feat, sensory, masks, others, deep_update=deep_update)
        summaries = self.object_summarizer(masks, value)
        return value, new_sensory, summaries

    def read_first(self, pix_feat, visual_readout, sensory, last_mask,
                   obj_memory):
        """pixel fusion + object transformer readout (the memory-manager
        read path, memory_manager.py:181-190).

        visual_readout (B, N, h, w, CV); last_mask (B, N, H, W) full-res.
        obj_memory (B, N, 1, Q, embed+1)."""
        H0 = last_mask.shape[2]
        h = sensory.shape[2]
        lm = avg_pool_area(
            last_mask.reshape(-1, H0, last_mask.shape[3])[..., None],
            H0 // h)[..., 0]
        lm = lm.reshape(last_mask.shape[0], last_mask.shape[1], h, -1)
        last_others = jnp.clip(lm.sum(axis=1, keepdims=True) - lm, 0, 1)
        pixel_readout = self.pixel_fuser(pix_feat, visual_readout, sensory,
                                         lm, last_others)
        mem_readout, _aux = self.object_transformer(pixel_readout, obj_memory)
        return mem_readout

    def init_all_params(self, image, pix_feat, sensory, masks):
        """Touch every submodule once so `init` creates the full param tree
        (the functional methods are otherwise initialized lazily)."""
        (f16, f8, f4), pf = self.encode_image(image)
        key, s, e = self.transform_key(f16)
        v, sens2, summ = self.encode_mask(image, pix_feat, sensory, masks)
        ro = self.read_first(pix_feat, v, sensory, masks, summ[:, :, None])
        return self.segment(f16, f8, f4, ro, sensory)

    def segment(self, f16, f8, f4, memory_readout, sensory,
                update_sensory=True):
        """Returns (new_sensory, prob_with_bg (B, N+1, H, W))."""
        sensory, logits = self.mask_decoder(
            f16, f8, f4, memory_readout, sensory,
            update_sensory=update_sensory)
        prob = jax.nn.sigmoid(logits)
        agg = aggregate(prob, axis=1)  # (B, N+1, h4, w4)
        B, N1, h4, w4 = agg.shape
        up = resize(agg.transpose(0, 2, 3, 1), (h4 * 4, w4 * 4), "bilinear",
                    align_corners=False)
        prob = jax.nn.softmax(up.transpose(0, 3, 1, 2), axis=1)
        return sensory, prob


# ---------------------------------------------------------------------------
# Weight conversion
# ---------------------------------------------------------------------------


def convert_cutie_state_dict(sd) -> dict:
    """cutie-base-mega.pth (or the vendored torch CUTIE's state dict) ->
    flax params for `CUTIE`."""
    from propainter_tpu.convert.torch_to_jax import convert_state_dict

    pre = {}
    for k, v in sd.items():
        arr = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
        if k.endswith(".in_proj_weight"):
            E = arr.shape[1]
            base = k[: -len(".in_proj_weight")]
            pre[f"{base}.q_proj.weight"] = arr[:E]
            pre[f"{base}.k_proj.weight"] = arr[E : 2 * E]
            pre[f"{base}.v_proj.weight"] = arr[2 * E :]
        elif k.endswith(".in_proj_bias"):
            E = arr.shape[0] // 3
            base = k[: -len(".in_proj_bias")]
            pre[f"{base}.q_proj.bias"] = arr[:E]
            pre[f"{base}.k_proj.bias"] = arr[E : 2 * E]
            pre[f"{base}.v_proj.bias"] = arr[2 * E :]
        elif (k.endswith(".query_init.weight")
              or k.endswith(".query_emb.weight")):
            # nn.Embedding tables: keep the (Q, E) orientation, flat leaf
            # ('.' guard: summary_to_query_init is a Linear, not this)
            pre[k.replace(".query_init.weight", ".query_init_embedding")
                 .replace(".query_emb.weight", ".query_emb_embedding")] = arr
        elif arr.ndim == 3 and k.endswith(".conv.weight"):
            # eca Conv1d (1, 1, k) inside CAResBlock -> flat (k,) leaf
            pre[k.replace(".conv.weight", ".eca_kernel")] = arr[0, 0]
        else:
            pre[k] = arr

    return convert_state_dict(
        pre,
        rename=[
            # PixelEncoder/MaskEncoder keep their resnet under a 'trunk'
            # module; the torch reference grafts resnet attrs directly
            (r"^(pixel_encoder|mask_encoder)\."
             r"(conv1|bn1|res2|layer1|layer2|layer3)\.",
             r"\1.trunk.\2."),
            # MaskEncoder's torch layer1 == our trunk layer1 (same name);
            # PixelEncoder's 'res2' kept as-is.
            # torch nn.Sequential inside feature/weights preds: Linear at
            # indices 0 and 2
            (r"\.feature_pred\.0\.", r".feature_pred_0."),
            (r"\.feature_pred\.2\.", r".feature_pred_2."),
            (r"\.weights_pred\.0\.", r".weights_pred_0."),
            (r"\.weights_pred\.2\.", r".weights_pred_2."),
            # mask_pred ModuleList of Sequential(ReLU, GConv2d): index 1 is
            # the conv
            (r"\.mask_pred\.(\d+)\.1\.", r".mask_pred_\1."),
            # decoder feature processor ModuleList
            (r"\.decoder_feat_proc\.transforms\.(\d+)\.",
             r".decoder_feat_proc_\1."),
            # distributor transforms inside GroupFeatureFusionBlock
            (r"\.distributor\.x_transform\.", r".distributor_x_transform."),
            (r"\.distributor\.g_transform\.", r".distributor_g_transform."),
            # torch downsample Sequential (conv, bn)
            (r"\.downsample\.0\.", r".downsample_0."),
            (r"\.downsample\.1\.", r".downsample_1."),
            # GroupResBlock downsample is a bare GConv2d (no Sequential)
        ],
        skip=[r"pixel_mean", r"pixel_std", r"aux_computer",
              # PositionalEncoding buffers (recomputed, not params)
              r"\.inv_freq$", r"cached_penc"],
    )


def load_cutie_params(path: str) -> dict:
    """Load + convert a released Cutie checkpoint (cutie-base-mega.pth)."""
    from propainter_tpu.convert.torch_to_jax import load_torch_checkpoint

    return convert_cutie_state_dict(load_torch_checkpoint(path))
