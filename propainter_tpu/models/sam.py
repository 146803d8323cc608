"""Segment Anything (SAM) — promptable image segmentation, NHWC flax.

The reference demo's first-frame segmenter is SAM via the external
`segment_anything` pip package (web-demos/hugging_face/tools/
base_segmenter.py:7,26 builds `sam_model_registry[model_type](checkpoint)`
and drives it through `SamPredictor`). This is a TPU-native re-implementation
of that model family (vit_b / vit_l / vit_h) from the published architecture:

  * `ImageEncoderViT` — 16x16 patch ViT with 14x14 windowed attention,
    decomposed relative position biases, global attention at 4 depths, and a
    2-conv LayerNorm neck to 256 channels;
  * `PromptEncoder` — random-Fourier point/box embeddings + a small conv
    stack for dense mask prompts;
  * `MaskDecoder` — two-way (token<->image) transformer, hypernetwork mask
    heads over a 4x upscaled embedding, and an IoU ranking head.

Everything is static-shape and jit-friendly: prompts are padded to a fixed
bucket with SAM's own "not a point" embedding (label -1), so one compiled
executable serves any click count.

`convert_sam_state_dict` maps the released checkpoints
(sam_vit_{b,l,h}_*.pth) onto this tree; module/attribute names mirror the
torch tree so the mechanical converter (convert/torch_to_jax.py) does most
of the work. The interactive predictor lives in demo/segmenter.py.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from propainter_tpu.models.layers import conv2d


def _gelu(x):
    # torch nn.GELU default is the exact erf form
    return jax.nn.gelu(x, approximate=False)


@dataclasses.dataclass(frozen=True)
class SamConfig:
    """Architecture hyperparameters (segment_anything/build_sam.py)."""

    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    global_attn_indexes: Tuple[int, ...] = (2, 5, 8, 11)
    img_size: int = 1024
    patch_size: int = 16
    window_size: int = 14
    mlp_ratio: float = 4.0
    out_chans: int = 256           # prompt/decoder embedding dim
    mask_in_chans: int = 16
    num_multimask_outputs: int = 3
    decoder_depth: int = 2
    decoder_num_heads: int = 8
    decoder_mlp_dim: int = 2048

    @property
    def grid(self) -> int:
        return self.img_size // self.patch_size

    @staticmethod
    def vit_b() -> "SamConfig":
        return SamConfig()

    @staticmethod
    def vit_l() -> "SamConfig":
        return SamConfig(embed_dim=1024, depth=24, num_heads=16,
                         global_attn_indexes=(5, 11, 17, 23))

    @staticmethod
    def vit_h() -> "SamConfig":
        return SamConfig(embed_dim=1280, depth=32, num_heads=16,
                         global_attn_indexes=(7, 15, 23, 31))


sam_config_registry = {
    "vit_b": SamConfig.vit_b,
    "vit_l": SamConfig.vit_l,
    "vit_h": SamConfig.vit_h,
}


# ---------------------------------------------------------------------------
# shared pieces
# ---------------------------------------------------------------------------


class LayerNorm2d(nn.Module):
    """Channel LayerNorm over NHWC maps (segment_anything LayerNorm2d,
    eps 1e-6, biased variance — identical to flax LayerNorm on the C axis)."""

    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(epsilon=self.eps, name="ln")(x)


class MLPBlock(nn.Module):
    """lin1 -> act -> lin2 (segment_anything/modeling/common.py)."""

    mlp_dim: int
    out_dim: int
    act: str = "gelu"  # 'gelu' in the ViT, 'relu' in the two-way transformer

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.mlp_dim, name="lin1")(x)
        x = _gelu(x) if self.act == "gelu" else jax.nn.relu(x)
        return nn.Dense(self.out_dim, name="lin2")(x)


def _rel_pos_table(rel_pos: jnp.ndarray, size: int) -> jnp.ndarray:
    """(2*size-1, d) relative position table, linearly resized if the stored
    table was trained for a different extent (get_rel_pos semantics for the
    q_size == k_size case, which is the only one SAM uses)."""
    need = 2 * size - 1
    if rel_pos.shape[0] != need:
        # linear interp along the first axis
        src = rel_pos.shape[0]
        pos = jnp.linspace(0.0, src - 1.0, need)
        lo = jnp.floor(pos).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, src - 1)
        w = (pos - lo)[:, None]
        rel_pos = rel_pos[lo] * (1 - w) + rel_pos[hi] * w
    # index [i, j] -> table[(i - j) + size - 1]
    idx = (jnp.arange(size)[:, None] - jnp.arange(size)[None, :]) + size - 1
    return rel_pos[idx]  # (size, size, d); static gather


class ViTAttention(nn.Module):
    """Multi-head attention with decomposed relative position biases
    (segment_anything/modeling/image_encoder.py Attention +
    add_decomposed_rel_pos)."""

    num_heads: int
    input_size: int  # window side (or full grid for global blocks)

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        nh = self.num_heads
        d = C // nh
        qkv = nn.Dense(3 * C, name="qkv")(x)            # (B, H, W, 3C)
        qkv = qkv.reshape(B, H * W, 3, nh, d)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B, N, nh, d)

        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (d ** -0.5)

        rel_pos_h = self.param(
            "rel_pos_h", nn.initializers.zeros, (2 * self.input_size - 1, d))
        rel_pos_w = self.param(
            "rel_pos_w", nn.initializers.zeros, (2 * self.input_size - 1, d))
        Rh = _rel_pos_table(rel_pos_h, H)               # (H, H, d)
        Rw = _rel_pos_table(rel_pos_w, W)               # (W, W, d)
        r_q = q.reshape(B, H, W, nh, d)
        rel_h = jnp.einsum("bhwnd,hkd->bnhwk", r_q, Rh)  # (B, nh, H, W, H)
        rel_w = jnp.einsum("bhwnd,wkd->bnhwk", r_q, Rw)  # (B, nh, H, W, W)
        attn = (attn.reshape(B, nh, H, W, H, W)
                + rel_h[..., None] + rel_w[..., None, :]
                ).reshape(B, nh, H * W, H * W)

        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, H, W, C)
        return nn.Dense(C, name="proj")(out)


def _window_partition(x, ws):
    """(B, H, W, C) -> (B*nW, ws, ws, C), zero-padding H/W up to ws
    multiples. Returns (windows, padded_hw)."""
    B, H, W, C = x.shape
    ph, pw = (-H) % ws, (-W) % ws
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    Hp, Wp = H + ph, W + pw
    x = x.reshape(B, Hp // ws, ws, Wp // ws, ws, C)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, C)
    return x, (Hp, Wp)


def _window_unpartition(wins, ws, padded_hw, hw):
    Hp, Wp = padded_hw
    H, W = hw
    B = wins.shape[0] // ((Hp // ws) * (Wp // ws))
    x = wins.reshape(B, Hp // ws, Wp // ws, ws, ws, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, -1)
    return x[:, :H, :W]


class ViTBlock(nn.Module):
    """Pre-norm transformer block with optional 14x14 windowing."""

    num_heads: int
    mlp_ratio: float
    window_size: int     # 0 = global attention
    input_size: int      # full grid side

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        if self.window_size > 0:
            x, padded = _window_partition(x, self.window_size)
            attn_size = self.window_size
        else:
            attn_size = self.input_size
        x = ViTAttention(self.num_heads, attn_size, name="attn")(x)
        if self.window_size > 0:
            x = _window_unpartition(x, self.window_size, padded, (H, W))
        x = shortcut + x
        y = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        y = MLPBlock(int(C * self.mlp_ratio), C, name="mlp")(y)
        return x + y


class ImageEncoderViT(nn.Module):
    """1024x1024x3 (normalized) -> (64, 64, 256) image embedding."""

    config: SamConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        # patch_embed.proj: Conv2d(3, C, k=16, s=16)
        x = conv2d(cfg.embed_dim, cfg.patch_size, cfg.patch_size, 0,
                   name="patch_embed_proj")(x)
        B, H, W, C = x.shape
        pos = self.param("pos_embed", nn.initializers.zeros,
                         (1, cfg.grid, cfg.grid, cfg.embed_dim))
        x = x + pos[:, :H, :W]
        for i in range(cfg.depth):
            ws = 0 if i in cfg.global_attn_indexes else cfg.window_size
            x = ViTBlock(cfg.num_heads, cfg.mlp_ratio, ws, cfg.grid,
                         name=f"blocks_{i}")(x)
        x = conv2d(cfg.out_chans, 1, bias=False, name="neck_0")(x)
        x = LayerNorm2d(name="neck_1")(x)
        x = conv2d(cfg.out_chans, 3, 1, 1, bias=False, name="neck_2")(x)
        x = LayerNorm2d(name="neck_3")(x)
        return x


# ---------------------------------------------------------------------------
# prompt encoder
# ---------------------------------------------------------------------------


class PromptEncoder(nn.Module):
    """Point/box/mask prompts -> sparse (tokens) + dense (map) embeddings.

    Point labels follow SamPredictor: 1 foreground, 0 background, -1 padding
    ("not a point"), 2/3 box corners. Coordinates are pixel coords in the
    model's 1024-space; +0.5 pixel-center shift applied here.
    """

    config: SamConfig

    def setup(self):
        c = self.config
        self.pe_gaussian = self.param(
            "pe_layer_positional_encoding_gaussian_matrix",
            nn.initializers.normal(1.0), (2, c.out_chans // 2))
        init = nn.initializers.normal(1.0)
        # 0: negative point, 1: positive point, 2/3: box corners
        self.pe_points = [
            self.param(f"pe_points_{i}", init, (1, c.out_chans))
            for i in range(4)]
        self.pe_not_a_point = self.param(
            "pe_not_a_point", init, (1, c.out_chans))
        self.no_mask_embed = self.param(
            "no_mask_embed", init, (1, c.out_chans))
        self.mask_downscaling_0 = conv2d(c.mask_in_chans // 4, 2, 2,
                                         name="mask_downscaling_0")
        self.mask_downscaling_1 = LayerNorm2d(name="mask_downscaling_1")
        self.mask_downscaling_3 = conv2d(c.mask_in_chans, 2, 2,
                                         name="mask_downscaling_3")
        self.mask_downscaling_4 = LayerNorm2d(name="mask_downscaling_4")
        self.mask_downscaling_6 = conv2d(c.out_chans, 1,
                                         name="mask_downscaling_6")

    def _pe(self, coords01):
        """[0,1]-normalized coords (..., 2) -> (..., out_chans) random
        Fourier features (PositionEmbeddingRandom._pe_encoding)."""
        c = 2.0 * coords01 - 1.0
        c = c @ self.pe_gaussian
        c = 2.0 * np.pi * c
        return jnp.concatenate([jnp.sin(c), jnp.cos(c)], axis=-1)

    def dense_pe(self):
        """(grid, grid, out_chans) positional map for the image embedding."""
        g = self.config.grid
        ys = (jnp.arange(g, dtype=jnp.float32) + 0.5) / g
        xs = (jnp.arange(g, dtype=jnp.float32) + 0.5) / g
        grid = jnp.stack(
            [jnp.tile(xs[None, :], (g, 1)), jnp.tile(ys[:, None], (1, g))],
            axis=-1)  # (g, g, [x, y])
        return self._pe(grid)

    def embed_points(self, coords, labels):
        """coords (B, N, 2) pixel xy in 1024-space, labels (B, N) int.
        Returns (B, N, out_chans) sparse embeddings."""
        size = float(self.config.img_size)
        pe = self._pe((coords + 0.5) / size)
        lab = labels[..., None]
        out = jnp.where(lab == -1, self.pe_not_a_point[0],
                        jnp.zeros_like(pe))
        out = out + jnp.where(lab == -1, jnp.zeros_like(pe), pe)
        out = out + jnp.where(lab == 0, self.pe_points[0][0], 0.0)
        out = out + jnp.where(lab == 1, self.pe_points[1][0], 0.0)
        out = out + jnp.where(lab == 2, self.pe_points[2][0], 0.0)
        out = out + jnp.where(lab == 3, self.pe_points[3][0], 0.0)
        return out

    def embed_masks(self, masks):
        """(B, 4*grid, 4*grid, 1) mask logits -> (B, grid, grid, out_chans)."""
        x = self.mask_downscaling_0(masks)
        x = _gelu(self.mask_downscaling_1(x))
        x = self.mask_downscaling_3(x)
        x = _gelu(self.mask_downscaling_4(x))
        return self.mask_downscaling_6(x)

    def __call__(self, coords, labels, mask_input=None):
        """Returns (sparse (B, N, C), dense (B, grid, grid, C))."""
        sparse = self.embed_points(coords, labels)
        if mask_input is None:
            g = self.config.grid
            dense = jnp.broadcast_to(
                self.no_mask_embed[0][None, None, None, :],
                (coords.shape[0], g, g, self.config.out_chans))
        else:
            dense = self.embed_masks(mask_input)
        return sparse, dense


# ---------------------------------------------------------------------------
# mask decoder (two-way transformer)
# ---------------------------------------------------------------------------


class DecoderAttention(nn.Module):
    """Plain MHA with optional channel downsampling
    (segment_anything/modeling/transformer.py Attention)."""

    embed_dim: int
    num_heads: int
    downsample_rate: int = 1

    @nn.compact
    def __call__(self, q, k, v):
        inner = self.embed_dim // self.downsample_rate
        nh = self.num_heads
        d = inner // nh
        q = nn.Dense(inner, name="q_proj")(q)
        k = nn.Dense(inner, name="k_proj")(k)
        v = nn.Dense(inner, name="v_proj")(v)
        B, Nq, _ = q.shape
        Nk = k.shape[1]
        q = q.reshape(B, Nq, nh, d)
        k = k.reshape(B, Nk, nh, d)
        v = v.reshape(B, Nk, nh, d)
        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) / (d ** 0.5)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, Nq, inner)
        return nn.Dense(self.embed_dim, name="out_proj")(out)


class TwoWayAttentionBlock(nn.Module):
    embed_dim: int
    num_heads: int
    mlp_dim: int
    skip_first_layer_pe: bool

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe):
        E, H = self.embed_dim, self.num_heads
        if self.skip_first_layer_pe:
            queries = DecoderAttention(E, H, name="self_attn")(
                queries, queries, queries)
        else:
            q = queries + query_pe
            queries = queries + DecoderAttention(E, H, name="self_attn")(
                q, q, queries)
        queries = nn.LayerNorm(epsilon=1e-5, name="norm1")(queries)

        q = queries + query_pe
        k = keys + key_pe
        queries = queries + DecoderAttention(
            E, H, 2, name="cross_attn_token_to_image")(q, k, keys)
        queries = nn.LayerNorm(epsilon=1e-5, name="norm2")(queries)

        queries = queries + MLPBlock(self.mlp_dim, E, act="relu",
                                     name="mlp")(queries)
        queries = nn.LayerNorm(epsilon=1e-5, name="norm3")(queries)

        q = queries + query_pe
        k = keys + key_pe
        keys = keys + DecoderAttention(
            E, H, 2, name="cross_attn_image_to_token")(k, q, queries)
        keys = nn.LayerNorm(epsilon=1e-5, name="norm4")(keys)
        return queries, keys


class TwoWayTransformer(nn.Module):
    depth: int
    embed_dim: int
    num_heads: int
    mlp_dim: int

    @nn.compact
    def __call__(self, image_embedding, image_pe, point_embedding):
        """image_embedding/image_pe (B, H, W, C); point_embedding (B, N, C).
        Returns (queries (B, N, C), keys (B, H*W, C))."""
        B, H, W, C = image_embedding.shape
        keys = image_embedding.reshape(B, H * W, C)
        key_pe = image_pe.reshape(B, H * W, C)
        queries = point_embedding
        for i in range(self.depth):
            queries, keys = TwoWayAttentionBlock(
                self.embed_dim, self.num_heads, self.mlp_dim,
                skip_first_layer_pe=(i == 0), name=f"layers_{i}")(
                    queries, keys, point_embedding, key_pe)
        q = queries + point_embedding
        k = keys + key_pe
        queries = queries + DecoderAttention(
            self.embed_dim, self.num_heads, 2,
            name="final_attn_token_to_image")(q, k, keys)
        queries = nn.LayerNorm(epsilon=1e-5, name="norm_final_attn")(queries)
        return queries, keys


class ConvTranspose2x2(nn.Module):
    """Stride-2 kernel-2 transposed conv as an explicit per-pixel outer
    product + reshape (non-overlapping, so this IS ConvTranspose2d(k=2,s=2)
    — and it is one MXU matmul instead of a conv-transpose lowering)."""

    features: int

    @nn.compact
    def __call__(self, x):
        B, H, W, I = x.shape
        kern = self.param("kernel", nn.initializers.lecun_normal(),
                          (2, 2, I, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        y = jnp.einsum("bhwi,pqio->bhpwqo",
                       x, kern).reshape(B, 2 * H, 2 * W, self.features)
        return y + bias


class HyperMLP(nn.Module):
    """3-layer ReLU MLP (segment_anything/modeling/mask_decoder.py MLP)."""

    hidden: int
    out: int
    num_layers: int = 3

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            last = i == self.num_layers - 1
            x = nn.Dense(self.out if last else self.hidden,
                         name=f"layers_{i}")(x)
            if not last:
                x = jax.nn.relu(x)
        return x


class MaskDecoder(nn.Module):
    config: SamConfig

    @nn.compact
    def __call__(self, image_embeddings, image_pe, sparse_prompt,
                 dense_prompt):
        """image_embeddings (1 or B, g, g, C); image_pe (g, g, C);
        sparse_prompt (B, N, C); dense_prompt (B, g, g, C).
        Returns (masks (B, 4, 4g, 4g), iou_pred (B, 4)) — caller slices
        multimask [1:] / single [0:1]."""
        cfg = self.config
        C = cfg.out_chans
        B = sparse_prompt.shape[0]
        nm = cfg.num_multimask_outputs + 1

        iou_token = self.param("iou_token", nn.initializers.normal(1.0),
                               (1, C))
        mask_tokens = self.param("mask_tokens", nn.initializers.normal(1.0),
                                 (nm, C))
        output_tokens = jnp.concatenate([iou_token, mask_tokens], axis=0)
        tokens = jnp.concatenate(
            [jnp.broadcast_to(output_tokens[None], (B, nm + 1, C)),
             sparse_prompt], axis=1)

        src = jnp.broadcast_to(image_embeddings,
                               (B,) + image_embeddings.shape[1:])
        src = src + dense_prompt
        pos = jnp.broadcast_to(image_pe[None], src.shape)

        hs, src = TwoWayTransformer(
            cfg.decoder_depth, C, cfg.decoder_num_heads, cfg.decoder_mlp_dim,
            name="transformer")(src, pos, tokens)
        iou_token_out = hs[:, 0]
        mask_tokens_out = hs[:, 1:1 + nm]

        g = image_embeddings.shape[1]
        src = src.reshape(B, g, g, C)
        x = ConvTranspose2x2(C // 4, name="output_upscaling_0")(src)
        x = LayerNorm2d(name="output_upscaling_1")(x)
        x = _gelu(x)
        x = ConvTranspose2x2(C // 8, name="output_upscaling_3")(x)
        upscaled = _gelu(x)  # (B, 4g, 4g, C/8)

        hyper_in = jnp.stack(
            [HyperMLP(C, C // 8, name=f"output_hypernetworks_mlps_{i}")(
                mask_tokens_out[:, i]) for i in range(nm)], axis=1)
        masks = jnp.einsum("bnc,bhwc->bnhw", hyper_in, upscaled)
        iou_pred = HyperMLP(C, nm, name="iou_prediction_head")(iou_token_out)
        return masks, iou_pred


# ---------------------------------------------------------------------------
# full model
# ---------------------------------------------------------------------------

# SamPredictor preprocessing constants (segment_anything/modeling/sam.py)
SAM_PIXEL_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
SAM_PIXEL_STD = np.array([58.395, 57.12, 57.375], np.float32)


class Sam(nn.Module):
    """Full SAM: methods mirror the torch model's submodule calls so jitted
    entry points can pick exactly what they need (embed once, prompt many)."""

    config: SamConfig = SamConfig.vit_b()

    def setup(self):
        self.image_encoder = ImageEncoderViT(self.config,
                                             name="image_encoder")
        self.prompt_encoder = PromptEncoder(self.config,
                                            name="prompt_encoder")
        self.mask_decoder = MaskDecoder(self.config, name="mask_decoder")

    def encode_image(self, x):
        """x (B, img_size, img_size, 3), already mean/std-normalized."""
        return self.image_encoder(x)

    def decode(self, image_embeddings, coords, labels, mask_input=None):
        """Prompt + decode. coords (B, N, 2) xy in model space; labels
        (B, N) in {-1, 0, 1, 2, 3}; mask_input optional (B, 4g, 4g, 1)
        logits. Returns (low_res_masks (B, 4, 4g, 4g), iou_pred (B, 4))."""
        sparse, dense = self.prompt_encoder(coords, labels, mask_input)
        image_pe = self.prompt_encoder.dense_pe()
        return self.mask_decoder(image_embeddings, image_pe, sparse, dense)

    def __call__(self, x, coords, labels, mask_input=None):
        emb = self.encode_image(x)
        return self.decode(emb, coords, labels, mask_input)


# ---------------------------------------------------------------------------
# checkpoint conversion
# ---------------------------------------------------------------------------


def convert_sam_state_dict(sd) -> dict:
    """sam_vit_{b,l,h}_*.pth state dict -> flax params for `Sam`."""
    from propainter_tpu.convert.torch_to_jax import convert_state_dict

    pre = {}
    for k, v in sd.items():
        arr = v.detach().cpu().numpy() if hasattr(v, "detach") \
            else np.asarray(v)
        if k == "image_encoder.pos_embed":
            # stored NHWC already: (1, grid, grid, C)
            pre["image_encoder.pos_embed"] = arr
        elif (".output_upscaling." in k and k.endswith(".weight")
              and np.ndim(arr) == 4):
            # ConvTranspose2d weight (I, O, kh, kw) -> (kh, kw, I, O);
            # leaf renamed to 'kernel' so the generic OIHW rule is bypassed
            kk = k.replace(".output_upscaling.", ".output_upscaling_")
            pre[kk[: -len(".weight")].replace(".weight", "")
                + ".kernel"] = np.transpose(arr, (2, 3, 0, 1))
        elif k.startswith("prompt_encoder.point_embeddings.") \
                and k.endswith(".weight"):
            i = k.split(".")[2]
            pre[f"prompt_encoder.pe_points_{i}"] = arr  # (1, C), flat leaf
        elif k == "prompt_encoder.not_a_point_embed.weight":
            pre["prompt_encoder.pe_not_a_point"] = arr
        elif k == "prompt_encoder.no_mask_embed.weight":
            pre["prompt_encoder.no_mask_embed"] = arr
        elif k == "mask_decoder.iou_token.weight":
            pre["mask_decoder.iou_token"] = arr
        elif k == "mask_decoder.mask_tokens.weight":
            pre["mask_decoder.mask_tokens"] = arr
        elif k == ("prompt_encoder.pe_layer."
                   "positional_encoding_gaussian_matrix"):
            pre["prompt_encoder."
                "pe_layer_positional_encoding_gaussian_matrix"] = arr
        else:
            pre[k] = arr

    return convert_state_dict(
        pre,
        rename=[
            (r"\.patch_embed\.proj\.", r".patch_embed_proj."),
            # neck / mask_downscaling / output_upscaling Sequential indices
            (r"\.neck\.(\d+)\.", r".neck_\1."),
            (r"\.mask_downscaling\.(\d+)\.", r".mask_downscaling_\1."),
            (r"\.output_upscaling\.(\d+)\.", r".output_upscaling_\1."),
            (r"\.output_hypernetworks_mlps\.(\d+)\.",
             r".output_hypernetworks_mlps_\1."),
            # LayerNorm2d / LayerNorm params live under an 'ln' submodule in
            # our LayerNorm2d wrapper; plain nn.LayerNorm names map directly.
            (r"\.(neck_1|neck_3|mask_downscaling_1|mask_downscaling_4|"
             r"output_upscaling_1)\.(weight|bias)$", r".\1.ln.\2"),
        ],
        skip=[r"^pixel_mean$", r"^pixel_std$"],
    )


def load_sam_params(path: str, model_type: str = "vit_h") -> dict:
    """Load + convert a released SAM checkpoint."""
    from propainter_tpu.convert.torch_to_jax import load_torch_checkpoint

    del model_type  # architecture selected by SamConfig at model build time
    return convert_sam_state_dict(load_torch_checkpoint(path))
