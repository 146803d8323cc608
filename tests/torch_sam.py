"""Independent PyTorch implementation of the SAM architecture for parity
testing propainter_tpu/models/sam.py.

The reference demo consumes SAM through the external `segment_anything` pip
package (web-demos/hugging_face/tools/base_segmenter.py:7), which is not
vendored in the reference tree and not installed here — so, like
tests/torch_ref.py's hand-written deform_conv2d, this file re-implements the
published architecture from its documented semantics rather than importing
it. Module/parameter names follow the released checkpoints' state-dict keys
(image_encoder.blocks.N.attn.qkv.weight, prompt_encoder.pe_layer...., etc.)
so `convert_sam_state_dict` is exercised on realistic keys.
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


class LayerNorm2d(nn.Module):
    def __init__(self, ch, eps=1e-6):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(ch))
        self.bias = nn.Parameter(torch.zeros(ch))
        self.eps = eps

    def forward(self, x):  # (B, C, H, W)
        u = x.mean(1, keepdim=True)
        s = (x - u).pow(2).mean(1, keepdim=True)
        x = (x - u) / torch.sqrt(s + self.eps)
        return self.weight[:, None, None] * x + self.bias[:, None, None]


class MLPBlock(nn.Module):
    def __init__(self, dim, mlp_dim, act):
        super().__init__()
        self.lin1 = nn.Linear(dim, mlp_dim)
        self.lin2 = nn.Linear(mlp_dim, dim)
        self.act = act

    def forward(self, x):
        return self.lin2(self.act(self.lin1(x)))


def _rel_pos_table(rel_pos, size):
    need = 2 * size - 1
    if rel_pos.shape[0] != need:
        rel_pos = F.interpolate(
            rel_pos.reshape(1, rel_pos.shape[0], -1).permute(0, 2, 1),
            size=need, mode="linear", align_corners=True,
        ).reshape(-1, need).permute(1, 0)
    idx = (torch.arange(size)[:, None] - torch.arange(size)[None, :]
           + size - 1)
    return rel_pos[idx]


class ViTAttention(nn.Module):
    def __init__(self, dim, num_heads, input_size):
        super().__init__()
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.qkv = nn.Linear(dim, 3 * dim)
        self.proj = nn.Linear(dim, dim)
        self.rel_pos_h = nn.Parameter(
            torch.zeros(2 * input_size - 1, self.head_dim))
        self.rel_pos_w = nn.Parameter(
            torch.zeros(2 * input_size - 1, self.head_dim))

    def forward(self, x):  # (B, H, W, C)
        B, H, W, C = x.shape
        nh, d = self.num_heads, self.head_dim
        qkv = self.qkv(x).reshape(B, H * W, 3, nh, d).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]  # (B, nh, N, d)
        attn = (q * d ** -0.5) @ k.transpose(-2, -1)

        Rh = _rel_pos_table(self.rel_pos_h, H)
        Rw = _rel_pos_table(self.rel_pos_w, W)
        r_q = q.reshape(B, nh, H, W, d)
        rel_h = torch.einsum("bnhwd,hkd->bnhwk", r_q, Rh)
        rel_w = torch.einsum("bnhwd,wkd->bnhwk", r_q, Rw)
        attn = (attn.view(B, nh, H, W, H, W)
                + rel_h[..., :, None] + rel_w[..., None, :]
                ).view(B, nh, H * W, H * W)

        attn = attn.softmax(-1)
        out = (attn @ v).reshape(B, nh, H, W, d).permute(0, 2, 3, 1, 4)
        return self.proj(out.reshape(B, H, W, C))


def window_partition(x, ws):
    B, H, W, C = x.shape
    ph, pw = (-H) % ws, (-W) % ws
    if ph or pw:
        x = F.pad(x, (0, 0, 0, pw, 0, ph))
    Hp, Wp = H + ph, W + pw
    x = x.view(B, Hp // ws, ws, Wp // ws, ws, C)
    return (x.permute(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, C), (Hp, Wp))


def window_unpartition(wins, ws, padded, hw):
    Hp, Wp = padded
    H, W = hw
    B = wins.shape[0] // ((Hp // ws) * (Wp // ws))
    x = wins.view(B, Hp // ws, Wp // ws, ws, ws, -1)
    x = x.permute(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, -1)
    return x[:, :H, :W]


class Block(nn.Module):
    def __init__(self, dim, num_heads, mlp_ratio, window_size, input_size):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = ViTAttention(
            dim, num_heads, window_size if window_size > 0 else input_size)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = MLPBlock(dim, int(dim * mlp_ratio), nn.GELU())
        self.window_size = window_size

    def forward(self, x):
        shortcut = x
        x = self.norm1(x)
        if self.window_size > 0:
            H, W = x.shape[1:3]
            x, padded = window_partition(x, self.window_size)
        x = self.attn(x)
        if self.window_size > 0:
            x = window_unpartition(x, self.window_size, padded, (H, W))
        x = shortcut + x
        return x + self.mlp(self.norm2(x))


class PatchEmbed(nn.Module):
    def __init__(self, dim, patch):
        super().__init__()
        self.proj = nn.Conv2d(3, dim, kernel_size=patch, stride=patch)

    def forward(self, x):  # (B, 3, H, W) -> (B, H/p, W/p, C)
        return self.proj(x).permute(0, 2, 3, 1)


class ImageEncoderViT(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        grid = cfg.img_size // cfg.patch_size
        self.patch_embed = PatchEmbed(cfg.embed_dim, cfg.patch_size)
        self.pos_embed = nn.Parameter(
            torch.zeros(1, grid, grid, cfg.embed_dim))
        self.blocks = nn.ModuleList([
            Block(cfg.embed_dim, cfg.num_heads, cfg.mlp_ratio,
                  0 if i in cfg.global_attn_indexes else cfg.window_size,
                  grid)
            for i in range(cfg.depth)])
        self.neck = nn.Sequential(
            nn.Conv2d(cfg.embed_dim, cfg.out_chans, 1, bias=False),
            LayerNorm2d(cfg.out_chans),
            nn.Conv2d(cfg.out_chans, cfg.out_chans, 3, padding=1,
                      bias=False),
            LayerNorm2d(cfg.out_chans))

    def forward(self, x):  # (B, 3, S, S) -> (B, 256, g, g)
        x = self.patch_embed(x)
        x = x + self.pos_embed[:, : x.shape[1], : x.shape[2]]
        for blk in self.blocks:
            x = blk(x)
        return self.neck(x.permute(0, 3, 1, 2))


class PositionEmbeddingRandom(nn.Module):
    def __init__(self, num_pos_feats):
        super().__init__()
        self.register_buffer(
            "positional_encoding_gaussian_matrix",
            torch.randn(2, num_pos_feats))

    def _pe(self, coords01):
        c = 2 * coords01 - 1
        c = c @ self.positional_encoding_gaussian_matrix
        c = 2 * math.pi * c
        return torch.cat([torch.sin(c), torch.cos(c)], dim=-1)

    def forward(self, size):
        h = w = size
        ys = (torch.arange(h, dtype=torch.float32) + 0.5) / h
        xs = (torch.arange(w, dtype=torch.float32) + 0.5) / w
        grid = torch.stack(
            [xs[None, :].expand(h, w), ys[:, None].expand(h, w)], dim=-1)
        return self._pe(grid).permute(2, 0, 1)  # (C, g, g)

    def forward_with_coords(self, coords, image_size):
        c = coords.clone()
        c[..., 0] = c[..., 0] / image_size[1]
        c[..., 1] = c[..., 1] / image_size[0]
        return self._pe(c)


class PromptEncoder(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        E = cfg.out_chans
        self.embed_dim = E
        self.input_image_size = (cfg.img_size, cfg.img_size)
        self.image_embedding_size = (cfg.img_size // cfg.patch_size,) * 2
        self.pe_layer = PositionEmbeddingRandom(E // 2)
        self.point_embeddings = nn.ModuleList(
            [nn.Embedding(1, E) for _ in range(4)])
        self.not_a_point_embed = nn.Embedding(1, E)
        self.no_mask_embed = nn.Embedding(1, E)
        m = cfg.mask_in_chans
        self.mask_downscaling = nn.Sequential(
            nn.Conv2d(1, m // 4, kernel_size=2, stride=2),
            LayerNorm2d(m // 4), nn.GELU(),
            nn.Conv2d(m // 4, m, kernel_size=2, stride=2),
            LayerNorm2d(m), nn.GELU(),
            nn.Conv2d(m, E, kernel_size=1))

    def get_dense_pe(self):
        return self.pe_layer(self.image_embedding_size[0])[None]

    def forward(self, coords, labels, mask_input=None):
        """coords (B, N, 2) xy; labels (B, N); mask_input (B, 1, 4g, 4g)."""
        pe = self.pe_layer.forward_with_coords(
            coords + 0.5, self.input_image_size)
        out = torch.where(labels[..., None] == -1,
                          self.not_a_point_embed.weight[0],
                          pe)
        for lab, emb in enumerate(self.point_embeddings):
            out = out + torch.where(labels[..., None] == lab,
                                    emb.weight[0],
                                    torch.zeros_like(out))
        if mask_input is None:
            g = self.image_embedding_size[0]
            dense = self.no_mask_embed.weight.reshape(1, -1, 1, 1).expand(
                coords.shape[0], -1, g, g)
        else:
            dense = self.mask_downscaling(mask_input)
        return out, dense


class Attention(nn.Module):
    def __init__(self, dim, num_heads, downsample_rate=1):
        super().__init__()
        self.inner = dim // downsample_rate
        self.num_heads = num_heads
        self.q_proj = nn.Linear(dim, self.inner)
        self.k_proj = nn.Linear(dim, self.inner)
        self.v_proj = nn.Linear(dim, self.inner)
        self.out_proj = nn.Linear(self.inner, dim)

    def _split(self, x):
        B, N, _ = x.shape
        return x.reshape(B, N, self.num_heads, -1).transpose(1, 2)

    def forward(self, q, k, v):
        q = self._split(self.q_proj(q))
        k = self._split(self.k_proj(k))
        v = self._split(self.v_proj(v))
        attn = q @ k.transpose(-2, -1) / math.sqrt(q.shape[-1])
        out = (attn.softmax(-1) @ v).transpose(1, 2).flatten(2)
        return self.out_proj(out)


class TwoWayAttentionBlock(nn.Module):
    def __init__(self, dim, num_heads, mlp_dim, skip_first_layer_pe):
        super().__init__()
        self.self_attn = Attention(dim, num_heads)
        self.norm1 = nn.LayerNorm(dim)
        self.cross_attn_token_to_image = Attention(dim, num_heads, 2)
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = MLPBlock(dim, mlp_dim, nn.ReLU())
        self.norm3 = nn.LayerNorm(dim)
        self.cross_attn_image_to_token = Attention(dim, num_heads, 2)
        self.norm4 = nn.LayerNorm(dim)
        self.skip_first_layer_pe = skip_first_layer_pe

    def forward(self, queries, keys, query_pe, key_pe):
        if self.skip_first_layer_pe:
            queries = self.self_attn(queries, queries, queries)
        else:
            q = queries + query_pe
            queries = queries + self.self_attn(q, q, queries)
        queries = self.norm1(queries)
        q = queries + query_pe
        k = keys + key_pe
        queries = self.norm2(
            queries + self.cross_attn_token_to_image(q, k, keys))
        queries = self.norm3(queries + self.mlp(queries))
        q = queries + query_pe
        k = keys + key_pe
        keys = self.norm4(keys + self.cross_attn_image_to_token(k, q, queries))
        return queries, keys


class TwoWayTransformer(nn.Module):
    def __init__(self, depth, dim, num_heads, mlp_dim):
        super().__init__()
        self.layers = nn.ModuleList([
            TwoWayAttentionBlock(dim, num_heads, mlp_dim, i == 0)
            for i in range(depth)])
        self.final_attn_token_to_image = Attention(dim, num_heads, 2)
        self.norm_final_attn = nn.LayerNorm(dim)

    def forward(self, image_embedding, image_pe, point_embedding):
        B, C, H, W = image_embedding.shape
        keys = image_embedding.flatten(2).permute(0, 2, 1)
        key_pe = image_pe.flatten(2).permute(0, 2, 1)
        queries = point_embedding
        for layer in self.layers:
            queries, keys = layer(queries, keys, point_embedding, key_pe)
        q = queries + point_embedding
        k = keys + key_pe
        queries = queries + self.final_attn_token_to_image(q, k, keys)
        return self.norm_final_attn(queries), keys


class MLP(nn.Module):
    def __init__(self, in_dim, hidden, out, num_layers):
        super().__init__()
        dims = [in_dim] + [hidden] * (num_layers - 1)
        self.layers = nn.ModuleList(
            [nn.Linear(dims[i], out if i == num_layers - 1 else dims[i + 1])
             for i in range(num_layers)])

    def forward(self, x):
        for i, layer in enumerate(self.layers):
            x = layer(x)
            if i < len(self.layers) - 1:
                x = F.relu(x)
        return x


class MaskDecoder(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        E = cfg.out_chans
        self.num_mask_tokens = cfg.num_multimask_outputs + 1
        self.transformer = TwoWayTransformer(
            cfg.decoder_depth, E, cfg.decoder_num_heads, cfg.decoder_mlp_dim)
        self.iou_token = nn.Embedding(1, E)
        self.mask_tokens = nn.Embedding(self.num_mask_tokens, E)
        self.output_upscaling = nn.Sequential(
            nn.ConvTranspose2d(E, E // 4, kernel_size=2, stride=2),
            LayerNorm2d(E // 4), nn.GELU(),
            nn.ConvTranspose2d(E // 4, E // 8, kernel_size=2, stride=2),
            nn.GELU())
        self.output_hypernetworks_mlps = nn.ModuleList(
            [MLP(E, E, E // 8, 3) for _ in range(self.num_mask_tokens)])
        self.iou_prediction_head = MLP(E, E, self.num_mask_tokens, 3)

    def forward(self, image_embeddings, image_pe, sparse, dense):
        nm = self.num_mask_tokens
        output_tokens = torch.cat(
            [self.iou_token.weight, self.mask_tokens.weight], dim=0)
        B = sparse.shape[0]
        tokens = torch.cat(
            [output_tokens[None].expand(B, -1, -1), sparse], dim=1)
        src = image_embeddings.expand(B, -1, -1, -1) + dense
        pos = image_pe.expand(B, -1, -1, -1)
        hs, src = self.transformer(src, pos, tokens)
        iou_token_out = hs[:, 0]
        mask_tokens_out = hs[:, 1:1 + nm]
        g = image_embeddings.shape[-1]
        src = src.transpose(1, 2).reshape(B, -1, g, g)
        upscaled = self.output_upscaling(src)
        hyper_in = torch.stack(
            [self.output_hypernetworks_mlps[i](mask_tokens_out[:, i])
             for i in range(nm)], dim=1)
        b, c, h, w = upscaled.shape
        masks = (hyper_in @ upscaled.reshape(b, c, h * w)).reshape(b, -1, h, w)
        iou_pred = self.iou_prediction_head(iou_token_out)
        return masks, iou_pred


class Sam(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.image_encoder = ImageEncoderViT(cfg)
        self.prompt_encoder = PromptEncoder(cfg)
        self.mask_decoder = MaskDecoder(cfg)

    def forward(self, image, coords, labels, mask_input=None):
        """image (B, 3, S, S) normalized; coords (B, N, 2); labels (B, N).
        Returns (low_res_masks (B, 4, 4g, 4g), iou_pred (B, 4))."""
        emb = self.image_encoder(image)
        sparse, dense = self.prompt_encoder(coords, labels, mask_input)
        return self.mask_decoder(
            emb, self.prompt_encoder.get_dense_pe(), sparse, dense)
