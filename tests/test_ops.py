"""Numerical parity of foundation ops vs torch (reference L0 semantics)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from propainter_tpu.ops import (
    grid_sample, flow_warp, bilinear_sampler, coords_grid, upflow8,
    resize, avg_pool2d, max_pool2d, unfold, fold,
)
from tests.torch_ref import to_nchw, to_nhwc, torch_deform_conv2d


def _rand(rng, *shape):
    return rng.standard_normal(shape).astype(np.float32)


class TestGridSample:
    @pytest.mark.parametrize("mode", ["bilinear", "nearest"])
    @pytest.mark.parametrize("padding", ["zeros", "border"])
    @pytest.mark.parametrize("align", [True, False])
    def test_matches_torch(self, rng, mode, padding, align):
        img = _rand(rng, 2, 13, 17, 3)
        grid = (rng.uniform(-1.4, 1.4, (2, 9, 11, 2))).astype(np.float32)
        ours = grid_sample(jnp.asarray(img), jnp.asarray(grid), mode=mode,
                           padding_mode=padding, align_corners=align)
        theirs = F.grid_sample(to_nchw(img), torch.from_numpy(grid), mode=mode,
                               padding_mode=padding, align_corners=align)
        np.testing.assert_allclose(np.asarray(ours), to_nhwc(theirs),
                                   rtol=1e-5, atol=1e-5)

    def test_flow_warp_matches_reference_impl(self, rng):
        # reference flow_warp = grid + flow normalized, align_corners=True
        x = _rand(rng, 2, 12, 16, 4)
        flow = 3.0 * _rand(rng, 2, 12, 16, 2)
        ours = flow_warp(jnp.asarray(x), jnp.asarray(flow))

        xt = to_nchw(x)
        h, w = 12, 16
        gy, gx = torch.meshgrid(torch.arange(h), torch.arange(w), indexing="ij")
        grid = torch.stack((gx, gy), 2).float()
        gf = grid[None] + torch.from_numpy(flow)
        gfx = 2.0 * gf[..., 0] / (w - 1) - 1.0
        gfy = 2.0 * gf[..., 1] / (h - 1) - 1.0
        theirs = F.grid_sample(xt, torch.stack((gfx, gfy), dim=3),
                               mode="bilinear", padding_mode="zeros",
                               align_corners=True)
        np.testing.assert_allclose(np.asarray(ours), to_nhwc(theirs),
                                   rtol=1e-5, atol=1e-5)

    def test_bilinear_sampler_pixel_coords(self, rng):
        img = _rand(rng, 3, 10, 14, 2)
        coords = np.stack(
            [rng.uniform(-2, 15, (3, 6, 7)), rng.uniform(-2, 11, (3, 6, 7))],
            axis=-1,
        ).astype(np.float32)
        ours = bilinear_sampler(jnp.asarray(img), jnp.asarray(coords))
        xg = 2 * torch.from_numpy(coords[..., 0]) / (14 - 1) - 1
        yg = 2 * torch.from_numpy(coords[..., 1]) / (10 - 1) - 1
        theirs = F.grid_sample(to_nchw(img), torch.stack([xg, yg], dim=-1),
                               align_corners=True)
        np.testing.assert_allclose(np.asarray(ours), to_nhwc(theirs),
                                   rtol=1e-5, atol=1e-5)

    def test_flow_warp_bilinear_nearest_fused(self, rng):
        # fused single-gather warp == two independent flow_warp calls,
        # bit-exact, including out-of-bounds zeroing and .5-fraction flows
        from propainter_tpu.ops.warp import flow_warp_bilinear_nearest
        B, H, W = 2, 12, 16
        xb = _rand(rng, B, H, W, 3)
        xn = _rand(rng, B, H, W, 4)
        flow = 5.0 * _rand(rng, B, H, W, 2)
        # force a block of exact .5 fractional offsets (rounding boundary)
        flow[0, :4, :4] = np.float32(2.5)
        # and far out-of-bounds samples (zero padding path)
        flow[1, -3:, -3:] = np.float32(100.0)
        out_b, out_n = flow_warp_bilinear_nearest(
            jnp.asarray(xb), jnp.asarray(xn), jnp.asarray(flow))
        ref_b = flow_warp(jnp.asarray(xb), jnp.asarray(flow), "bilinear")
        ref_n = flow_warp(jnp.asarray(xn), jnp.asarray(flow), "nearest")
        np.testing.assert_array_equal(np.asarray(out_b), np.asarray(ref_b))
        np.testing.assert_array_equal(np.asarray(out_n), np.asarray(ref_n))

    def test_flow_warp_packed(self, rng):
        # channel-packed single-gather warp == two independent flow_warp
        # calls, bit-exact on CPU, including out-of-bounds zeroing,
        # .5-fraction flows, and the edge rows/cols of the extended image
        from propainter_tpu.ops.warp import flow_warp_packed
        B, H, W = 2, 12, 16
        xb = _rand(rng, B, H, W, 3)
        xn = _rand(rng, B, H, W, 4)
        flow = 5.0 * _rand(rng, B, H, W, 2)
        flow[0, :4, :4] = np.float32(2.5)          # rounding boundary
        flow[1, -3:, -3:] = np.float32(100.0)      # far out of bounds
        flow[0, -1, :] = np.float32(-0.5)          # corners straddling edges
        out_b, out_n = flow_warp_packed(
            jnp.asarray(xb), jnp.asarray(xn), jnp.asarray(flow))
        ref_b = flow_warp(jnp.asarray(xb), jnp.asarray(flow), "bilinear")
        ref_n = flow_warp(jnp.asarray(xn), jnp.asarray(flow), "nearest")
        np.testing.assert_array_equal(np.asarray(out_b), np.asarray(ref_b))
        np.testing.assert_array_equal(np.asarray(out_n), np.asarray(ref_n))
        # bilinear-only form (xn=None) used for interpolation='bilinear'
        out_b2, none = flow_warp_packed(jnp.asarray(xb), None,
                                        jnp.asarray(flow))
        assert none is None
        np.testing.assert_array_equal(np.asarray(out_b2), np.asarray(ref_b))

    def test_coords_grid(self):
        g = np.asarray(coords_grid(2, 3, 4))
        assert g.shape == (2, 3, 4, 2)
        assert g[0, 1, 2, 0] == 2 and g[0, 1, 2, 1] == 1

    def test_upflow8(self, rng):
        flow = _rand(rng, 1, 6, 8, 2)
        ours = upflow8(jnp.asarray(flow))
        theirs = 8 * F.interpolate(to_nchw(flow), size=(48, 64),
                                   mode="bilinear", align_corners=True)
        np.testing.assert_allclose(np.asarray(ours), to_nhwc(theirs),
                                   rtol=1e-5, atol=1e-5)


class TestResize:
    @pytest.mark.parametrize("align", [True, False])
    @pytest.mark.parametrize("size", [(24, 32), (5, 7), (13, 9)])
    def test_bilinear(self, rng, align, size):
        x = _rand(rng, 2, 12, 16, 3)
        ours = resize(jnp.asarray(x), size, "bilinear", align_corners=align)
        theirs = F.interpolate(to_nchw(x), size=size, mode="bilinear",
                               align_corners=align)
        np.testing.assert_allclose(np.asarray(ours), to_nhwc(theirs),
                                   rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("align", [True, False])
    @pytest.mark.parametrize("size", [(24, 32), (5, 7), (13, 9)])
    def test_bilinear_mxu(self, rng, align, size):
        # matmul-form bilinear (decoder/flowcomp hot path on TPU)
        x = _rand(rng, 2, 12, 16, 3)
        ours = resize(jnp.asarray(x), size, "bilinear", align_corners=align,
                      impl="mxu")
        theirs = F.interpolate(to_nchw(x), size=size, mode="bilinear",
                               align_corners=align)
        np.testing.assert_allclose(np.asarray(ours), to_nhwc(theirs),
                                   rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("size", [(3, 4), (24, 32), (7, 5)])
    def test_nearest(self, rng, size):
        x = _rand(rng, 2, 12, 16, 3)
        ours = resize(jnp.asarray(x), size, "nearest")
        theirs = F.interpolate(to_nchw(x), size=size, mode="nearest")
        np.testing.assert_allclose(np.asarray(ours), to_nhwc(theirs))

    def test_scale_quarter_matches_torch_scale_factor(self, rng):
        # generator downsamples flows with scale_factor=1/4, align_corners=False
        x = _rand(rng, 2, 16, 24, 2)
        ours = resize(jnp.asarray(x), (4, 6), "bilinear", align_corners=False)
        theirs = F.interpolate(to_nchw(x), scale_factor=0.25, mode="bilinear",
                               align_corners=False)
        np.testing.assert_allclose(np.asarray(ours), to_nhwc(theirs),
                                   rtol=1e-5, atol=1e-5)

    def test_avg_pool(self, rng):
        x = _rand(rng, 5, 8, 12, 2)
        ours = avg_pool2d(jnp.asarray(x), 2, 2)
        theirs = F.avg_pool2d(to_nchw(x), 2, 2)
        np.testing.assert_allclose(np.asarray(ours), to_nhwc(theirs),
                                   rtol=1e-6, atol=1e-6)

    def test_max_pool_padded(self, rng):
        # InpaintGenerator.max_pool: k=(7,7) s=(3,3) p=(3,3)
        x = np.abs(_rand(rng, 2, 60, 108, 1))
        ours = max_pool2d(jnp.asarray(x), (7, 7), (3, 3), (3, 3))
        theirs = F.max_pool2d(to_nchw(x), (7, 7), (3, 3), (3, 3))
        assert ours.shape[1:3] == (20, 36)
        np.testing.assert_allclose(np.asarray(ours), to_nhwc(theirs))

    def test_max_pool_window(self, rng):
        # SparseWindowAttention occupancy pool: k=win s=win p=0
        x = np.abs(_rand(rng, 4, 20, 36, 1))
        ours = max_pool2d(jnp.asarray(x), (5, 9), (5, 9), (0, 0))
        theirs = F.max_pool2d(to_nchw(x), (5, 9), (5, 9), (0, 0))
        np.testing.assert_allclose(np.asarray(ours), to_nhwc(theirs))


class TestUnfoldFold:
    @pytest.mark.parametrize("cfg", [
        ((7, 7), (3, 3), (3, 3), (60, 108)),   # soft split config
        ((3, 3), (1, 1), (1, 1), (8, 8)),      # raft convex upsample config
        ((5, 4), (2, 3), (1, 2), (17, 23)),    # odd config
    ])
    def test_unfold_matches_torch(self, rng, cfg):
        k, s, p, hw = cfg
        x = _rand(rng, 2, hw[0], hw[1], 5)
        ours = unfold(jnp.asarray(x), k, s, p)
        theirs = F.unfold(to_nchw(x), k, padding=p, stride=s)  # (B, C*kh*kw, L)
        np.testing.assert_allclose(
            np.asarray(ours), theirs.permute(0, 2, 1).numpy(), rtol=1e-6, atol=1e-6
        )

    @pytest.mark.parametrize("cfg", [
        ((7, 7), (3, 3), (3, 3), (60, 108)),
        ((5, 4), (2, 3), (1, 2), (17, 23)),
    ])
    def test_fold_matches_torch(self, rng, cfg):
        k, s, p, hw = cfg
        from propainter_tpu.ops.patches import unfold_output_size
        L = unfold_output_size(hw[0], k[0], s[0], p[0]) * unfold_output_size(
            hw[1], k[1], s[1], p[1])
        C = 3
        y = _rand(rng, 2, L, C * k[0] * k[1])
        ours = fold(jnp.asarray(y), hw, k, s, p)
        yt = torch.from_numpy(y).permute(0, 2, 1)
        theirs = F.fold(yt, output_size=hw, kernel_size=k, padding=p, stride=s)
        np.testing.assert_allclose(np.asarray(ours), to_nhwc(theirs),
                                   rtol=1e-5, atol=1e-5)

    def test_fold_unfold_roundtrip_renorm(self, rng):
        # FusionFeedForward overlap renormalization: fold(x)/fold(ones) then unfold
        k, s, p, hw = (7, 7), (3, 3), (3, 3), (60, 108)
        x = _rand(rng, 1, 20 * 36, 49)
        ones = np.ones_like(x)
        folded = fold(jnp.asarray(x), hw, k, s, p)
        norm = fold(jnp.asarray(ones), hw, k, s, p)
        out = unfold(folded / norm, k, s, p)
        assert out.shape == (1, 20 * 36, 49)
        assert np.isfinite(np.asarray(out)).all()


class TestDeformConv:
    @pytest.mark.parametrize("dg,cin,cout", [(16, 64, 32), (4, 8, 8), (1, 4, 6)])
    def test_matches_pure_torch_dcnv2(self, rng, dg, cin, cout):
        from propainter_tpu.ops import modulated_deform_conv2d
        B, H, W = 2, 9, 11
        x = _rand(rng, B, H, W, cin)
        offset = 2.5 * _rand(rng, B, H, W, dg, 9, 2)
        mask = 1 / (1 + np.exp(-_rand(rng, B, H, W, dg, 9)))
        w = _rand(rng, 3, 3, cin, cout) * 0.2
        b = _rand(rng, cout)

        ours = modulated_deform_conv2d(
            jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
            jnp.asarray(w), jnp.asarray(b))

        # torch layouts
        xt = to_nchw(x)
        # offset (B,H,W,dg,K,2)->(B, dg*K*2, H, W) interleaved
        ot = torch.from_numpy(
            np.moveaxis(offset.reshape(B, H, W, dg * 9 * 2), -1, 1).copy())
        mt = torch.from_numpy(
            np.moveaxis(mask.reshape(B, H, W, dg * 9), -1, 1).copy())
        wt = torch.from_numpy(np.transpose(w, (3, 2, 0, 1)).copy())
        out_t = torch_deform_conv2d(xt, ot, wt, torch.from_numpy(b),
                                    stride=1, padding=1, dilation=1, mask=mt)
        np.testing.assert_allclose(np.asarray(ours), to_nhwc(out_t),
                                   rtol=2e-4, atol=2e-4)


class TestCorr:
    def test_pyramid_and_lookup_match_reference(self, rng):
        from propainter_tpu.ops import corr_pyramid, corr_lookup
        from tests.torch_ref import import_reference_module
        corr_mod = import_reference_module("RAFT.corr")

        B, H, W, D = 2, 8, 16, 12
        f1 = _rand(rng, B, H, W, D)
        f2 = _rand(rng, B, H, W, D)
        coords = np.stack(
            [rng.uniform(0, W - 1, (B, H, W)), rng.uniform(0, H - 1, (B, H, W))],
            axis=-1,
        ).astype(np.float32)

        pyr = corr_pyramid(jnp.asarray(f1), jnp.asarray(f2), num_levels=3)
        ours = corr_lookup(pyr, jnp.asarray(coords), radius=3)

        cb = corr_mod.CorrBlock(to_nchw(f1), to_nchw(f2), num_levels=3, radius=3)
        coords_t = torch.from_numpy(np.moveaxis(coords, -1, 1).copy())
        theirs = cb(coords_t)
        np.testing.assert_allclose(np.asarray(ours), to_nhwc(theirs),
                                   rtol=1e-4, atol=1e-4)


class TestCorrLookupMXU:
    def test_matches_gather_lookup(self, rng):
        import jax.numpy as jnp
        from propainter_tpu.ops.corr import (
            corr_pyramid, corr_lookup, corr_lookup_mxu)

        B, H, W, D = 1, 16, 24, 32
        f1 = jnp.asarray(rng.standard_normal((B, H, W, D), np.float32))
        f2 = jnp.asarray(rng.standard_normal((B, H, W, D), np.float32))
        pyr = corr_pyramid(f1, f2, 4)
        coords = jnp.asarray(
            rng.uniform(-3, max(H, W) + 3, (B, H, W, 2)).astype(np.float32))
        ref = np.asarray(corr_lookup(pyr, coords, radius=4))
        mxu = np.asarray(corr_lookup_mxu(pyr, coords, radius=4))
        np.testing.assert_allclose(mxu, ref, rtol=1e-4, atol=1e-4)


class TestDeformMXU:
    def test_matches_gather_deform(self, rng):
        import jax.numpy as jnp
        from propainter_tpu.ops.deform import (
            modulated_deform_conv2d, modulated_deform_conv2d_mxu)

        B, H, W, C, dg = 2, 11, 13, 16, 4
        K = 9
        x = jnp.asarray(rng.standard_normal((B, H, W, C), np.float32))
        offset = jnp.asarray(
            rng.uniform(-4, 4, (B, H, W, dg, K, 2)).astype(np.float32))
        mask = jnp.asarray(
            rng.uniform(0, 1, (B, H, W, dg, K)).astype(np.float32))
        weight = jnp.asarray(
            rng.standard_normal((3, 3, C, 8)).astype(np.float32) * 0.1)
        bias = jnp.asarray(rng.standard_normal((8,)).astype(np.float32))

        ref = np.asarray(modulated_deform_conv2d(x, offset, mask, weight, bias))
        for out_fused in (True, False):
            mxu = np.asarray(
                modulated_deform_conv2d_mxu(x, offset, mask, weight, bias,
                                            row_chunk=4, out_fused=out_fused))
            np.testing.assert_allclose(mxu, ref, rtol=2e-4, atol=2e-4)


class TestDeformBanded:
    def test_matches_gather_deform_for_bounded_offsets(self, rng):
        import jax.numpy as jnp
        from propainter_tpu.ops.deform import (
            modulated_deform_conv2d, modulated_deform_conv2d_banded)

        B, H, W, C, dg = 2, 11, 13, 16, 4
        K = 9
        x = jnp.asarray(rng.standard_normal((B, H, W, C), np.float32))
        # flow-completion regime: offsets = 5*tanh(...), so |off| <= 5 < band-2
        offset = jnp.asarray(
            5.0 * np.tanh(rng.standard_normal((B, H, W, dg, K, 2))
                          ).astype(np.float32))
        mask = jnp.asarray(
            rng.uniform(0, 1, (B, H, W, dg, K)).astype(np.float32))
        weight = jnp.asarray(
            rng.standard_normal((3, 3, C, 8)).astype(np.float32) * 0.1)
        bias = jnp.asarray(rng.standard_normal((8,)).astype(np.float32))

        ref = np.asarray(modulated_deform_conv2d(x, offset, mask, weight, bias))
        banded = np.asarray(
            modulated_deform_conv2d_banded(x, offset, mask, weight, bias,
                                           band=8))
        np.testing.assert_allclose(banded, ref, rtol=2e-4, atol=2e-4)


class TestPatchMatmulForms:
    def test_fold_matmul_matches(self, rng):
        import jax.numpy as jnp
        from propainter_tpu.ops.patches import (
            fold, fold_matmul, unfold_output_size)

        for H, W, C, k, s, p in [(14, 22, 6, (7, 7), (3, 3), (3, 3)),
                                 (9, 11, 4, (3, 3), (2, 2), (1, 1))]:
            Ho = unfold_output_size(H, k[0], s[0], p[0])
            Wo = unfold_output_size(W, k[1], s[1], p[1])
            y = jnp.asarray(rng.standard_normal(
                (2, Ho * Wo, C * k[0] * k[1]), np.float32))
            a = np.asarray(fold(y, (H, W), k, s, p))
            b = np.asarray(fold_matmul(y, (H, W), k, s, p))
            np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-5)

    def test_overlap_renorm_matches_fold_unfold(self, rng):
        import jax.numpy as jnp
        from propainter_tpu.ops.patches import (
            fold, unfold, overlap_renorm, unfold_output_size)

        for H, W, C, k, s, p in [(18, 24, 5, (7, 7), (3, 3), (3, 3)),
                                 (9, 11, 4, (3, 3), (2, 2), (1, 1))]:
            Ho = unfold_output_size(H, k[0], s[0], p[0])
            Wo = unfold_output_size(W, k[1], s[1], p[1])
            ck = C * k[0] * k[1]
            y = jnp.asarray(rng.standard_normal(
                (2, Ho * Wo, ck), np.float32))
            ones = jnp.ones((1, Ho * Wo, k[0] * k[1]), jnp.float32)
            norm = fold(ones, (H, W), k, s, p)  # (1, H, W, 1)
            ref = np.asarray(unfold(fold(y, (H, W), k, s, p) / norm,
                                    k, s, p))
            got = np.asarray(overlap_renorm(y, (H, W), k, s, p))
            np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


class TestPatchConvForms:
    def test_unfold_conv_matches(self, rng):
        import jax.numpy as jnp
        from propainter_tpu.ops.patches import unfold, unfold_conv

        for H, W, C, k, s, p in [(14, 22, 6, (7, 7), (3, 3), (3, 3)),
                                 (9, 11, 4, (3, 3), (2, 2), (1, 1))]:
            x = jnp.asarray(rng.standard_normal((2, H, W, C), np.float32))
            a = np.asarray(unfold(x, k, s, p))
            b = np.asarray(unfold_conv(x, k, s, p))
            np.testing.assert_allclose(b, a, rtol=1e-6, atol=1e-6)

    def test_fold_conv_matches(self, rng):
        import jax.numpy as jnp
        from propainter_tpu.ops.patches import (
            fold, fold_conv, unfold_output_size)

        for H, W, C, k, s, p in [(14, 22, 6, (7, 7), (3, 3), (3, 3)),
                                 (9, 11, 4, (3, 3), (2, 2), (1, 1))]:
            Ho = unfold_output_size(H, k[0], s[0], p[0])
            Wo = unfold_output_size(W, k[1], s[1], p[1])
            y = jnp.asarray(rng.standard_normal(
                (2, Ho * Wo, C * k[0] * k[1]), np.float32))
            a = np.asarray(fold(y, (H, W), k, s, p))
            b = np.asarray(fold_conv(y, (H, W), k, s, p))
            np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-5)

    def test_fold_dense_conv_impls_match(self, rng):
        """fold_dense_conv 'dilated' and 'phase' lowerings == fold(x@K + b)."""
        import jax.numpy as jnp
        from propainter_tpu.ops.patches import (
            fold, fold_dense_conv, unfold_output_size)

        for H, W, C, Cin, k, s, p in [
                (14, 22, 5, 12, (7, 7), (3, 3), (3, 3)),
                (9, 11, 4, 8, (3, 3), (2, 2), (1, 1))]:
            Ho = unfold_output_size(H, k[0], s[0], p[0])
            Wo = unfold_output_size(W, k[1], s[1], p[1])
            x = jnp.asarray(rng.standard_normal((2, Ho, Wo, Cin)), jnp.float32)
            kern = jnp.asarray(
                rng.standard_normal((Cin, C * k[0] * k[1])) * 0.1, jnp.float32)
            bias = jnp.asarray(
                rng.standard_normal((C * k[0] * k[1],)), jnp.float32)
            taps = (x.reshape(2, Ho * Wo, Cin) @ kern + bias)
            ref = np.asarray(fold(taps, (H, W), k, s, p))
            for impl in ("dilated", "phase"):
                got = np.asarray(fold_dense_conv(
                    x, kern, bias, (H, W), k, s, p, impl=impl))
                np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


class TestDeformPallas:
    def test_fused_matches_mxu_interpret(self, rng):
        """Pallas-fused deform sampling == XLA separable-matmul formulation
        (interpreter mode on CPU — same code path the TPU compiles)."""
        import jax.numpy as jnp
        from propainter_tpu.ops.deform import modulated_deform_conv2d_mxu
        from propainter_tpu.ops.deform_pallas import (
            modulated_deform_conv2d_fused)

        for (B, H, W, C, dg, O) in [(1, 12, 20, 32, 4, 48),
                                    (2, 9, 15, 16, 2, 16)]:
            x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
            off = jnp.asarray(
                rng.standard_normal((B, H, W, dg, 9, 2)) * 3, jnp.float32)
            msk = jnp.asarray(rng.uniform(0, 1, (B, H, W, dg, 9)), jnp.float32)
            wgt = jnp.asarray(
                rng.standard_normal((3, 3, C, O)) * 0.05, jnp.float32)
            b = jnp.asarray(rng.standard_normal((O,)), jnp.float32)
            a = np.asarray(modulated_deform_conv2d_mxu(x, off, msk, wgt, b))
            c = np.asarray(modulated_deform_conv2d_fused(
                x, off, msk, wgt, b, interpret=True))
            np.testing.assert_allclose(c, a, rtol=2e-5, atol=2e-5)

    def test_fused_out_matches_mxu_interpret(self, rng):
        """Pallas fully-fused deform (sampling + output contraction in-kernel)
        == XLA separable-matmul formulation (interpreter mode on CPU)."""
        import jax.numpy as jnp
        from propainter_tpu.ops.deform import modulated_deform_conv2d_mxu
        from propainter_tpu.ops.deform_pallas import (
            modulated_deform_conv2d_fused_out)

        for (B, H, W, C, dg, O) in [(1, 12, 20, 32, 4, 48),
                                    (2, 9, 15, 16, 2, 16)]:
            x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
            off = jnp.asarray(
                rng.standard_normal((B, H, W, dg, 9, 2)) * 3, jnp.float32)
            msk = jnp.asarray(rng.uniform(0, 1, (B, H, W, dg, 9)), jnp.float32)
            wgt = jnp.asarray(
                rng.standard_normal((3, 3, C, O)) * 0.05, jnp.float32)
            b = jnp.asarray(rng.standard_normal((O,)), jnp.float32)
            a = np.asarray(modulated_deform_conv2d_mxu(x, off, msk, wgt, b))
            c = np.asarray(modulated_deform_conv2d_fused_out(
                x, off, msk, wgt, b, interpret=True))
            np.testing.assert_allclose(c, a, rtol=2e-5, atol=2e-5)

    def test_opt2_dispatcher_grads(self, rng):
        """modulated_deform_conv2d_opt2 (the dispatcher the models call):
        values match mxu and gradients flow (custom_vjp linearizes the XLA
        formulation; row_chunk is a nondiff arg)."""
        import jax
        import jax.numpy as jnp
        from propainter_tpu.ops.deform import modulated_deform_conv2d_mxu
        from propainter_tpu.ops.deform_pallas import (
            modulated_deform_conv2d_opt2)

        B, H, W, C, dg, O = 1, 10, 14, 16, 4, 16
        x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
        off = jnp.asarray(
            rng.standard_normal((B, H, W, dg, 9, 2)) * 2, jnp.float32)
        msk = jnp.asarray(rng.uniform(0, 1, (B, H, W, dg, 9)), jnp.float32)
        wgt = jnp.asarray(
            rng.standard_normal((3, 3, C, O)) * 0.05, jnp.float32)
        b = jnp.asarray(rng.standard_normal((O,)), jnp.float32)

        out = modulated_deform_conv2d_opt2(x, off, msk, wgt, b, 4)
        ref = modulated_deform_conv2d_mxu(x, off, msk, wgt, b, row_chunk=4)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

        def loss_opt2(x, off):
            return jnp.sum(
                modulated_deform_conv2d_opt2(x, off, msk, wgt, b, 4) ** 2)

        def loss_mxu(x, off):
            return jnp.sum(modulated_deform_conv2d_mxu(
                x, off, msk, wgt, b, row_chunk=4) ** 2)

        g_opt = jax.grad(loss_opt2, argnums=(0, 1))(x, off)
        g_ref = jax.grad(loss_mxu, argnums=(0, 1))(x, off)
        for a, r in zip(g_opt, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                       rtol=2e-4, atol=2e-4)

    def test_opt_dispatcher_grads(self, rng):
        """modulated_deform_conv2d_opt: values match mxu and gradients flow
        (custom_vjp linearizes the XLA formulation)."""
        import jax
        import jax.numpy as jnp
        from propainter_tpu.ops.deform import modulated_deform_conv2d_mxu
        from propainter_tpu.ops.deform_pallas import (
            modulated_deform_conv2d_opt)

        B, H, W, C, dg, O = 1, 10, 14, 16, 4, 16
        x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
        off = jnp.asarray(
            rng.standard_normal((B, H, W, dg, 9, 2)) * 2, jnp.float32)
        msk = jnp.asarray(rng.uniform(0, 1, (B, H, W, dg, 9)), jnp.float32)
        wgt = jnp.asarray(
            rng.standard_normal((3, 3, C, O)) * 0.05, jnp.float32)
        b = jnp.asarray(rng.standard_normal((O,)), jnp.float32)

        out = modulated_deform_conv2d_opt(x, off, msk, wgt, b)
        ref = modulated_deform_conv2d_mxu(x, off, msk, wgt, b)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

        def loss_opt(x, off):
            return jnp.sum(
                modulated_deform_conv2d_opt(x, off, msk, wgt, b) ** 2)

        def loss_mxu(x, off):
            return jnp.sum(
                modulated_deform_conv2d_mxu(x, off, msk, wgt, b) ** 2)

        g1 = jax.grad(loss_opt, argnums=(0, 1))(x, off)
        g2 = jax.grad(loss_mxu, argnums=(0, 1))(x, off)
        for a, c in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                       rtol=2e-4, atol=2e-4)


class TestCorrPallas:
    def test_fused_lookup_matches_mxu(self, rng):
        """Transposed-pyramid pallas lookup == MXU interpolation-matmul
        lookup (interpreter mode on CPU), incl. far out-of-range coords."""
        import jax.numpy as jnp
        from propainter_tpu.ops.corr import corr_pyramid, corr_lookup_mxu
        from propainter_tpu.ops.corr_pallas import (
            corr_pyramid_t, corr_lookup_fused)

        for (B, Hc, Wc, D) in [(3, 12, 20, 64), (1, 8, 10, 16)]:
            f1 = jnp.asarray(rng.standard_normal((B, Hc, Wc, D)),
                             jnp.float32)
            f2 = jnp.asarray(rng.standard_normal((B, Hc, Wc, D)),
                             jnp.float32)
            coords = jnp.asarray(
                rng.uniform(-20, max(Hc, Wc) + 20, (B, Hc, Wc, 2)),
                jnp.float32)
            ref = np.asarray(
                corr_lookup_mxu(corr_pyramid(f1, f2), coords, 4))
            got = np.asarray(corr_lookup_fused(
                corr_pyramid_t(f1, f2), coords, 4, interpret=True))
            np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)

    def test_flat_lookup_matches_mxu(self, rng):
        """Flat (pair-batch-in-lanes) pyramid lookup == MXU lookup,
        including the build-time lane padding path (B*H*W % 128 != 0)."""
        import jax.numpy as jnp
        from propainter_tpu.ops.corr import corr_pyramid, corr_lookup_mxu
        from propainter_tpu.ops.corr_pallas import (
            corr_pyramid_flat, corr_lookup_flat)

        for (B, Hc, Wc, D) in [(3, 12, 20, 64), (2, 8, 10, 16)]:
            f1 = jnp.asarray(rng.standard_normal((B, Hc, Wc, D)),
                             jnp.float32)
            f2 = jnp.asarray(rng.standard_normal((B, Hc, Wc, D)),
                             jnp.float32)
            coords = jnp.asarray(
                rng.uniform(-20, max(Hc, Wc) + 20, (B, Hc, Wc, 2)),
                jnp.float32)
            pyr = corr_pyramid_flat(f1, f2)
            assert pyr[0].shape[-1] % 128 == 0
            ref = np.asarray(
                corr_lookup_mxu(corr_pyramid(f1, f2), coords, 4))
            got = np.asarray(corr_lookup_flat(
                pyr, coords, 4, interpret=True))
            np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)

    def test_flat_lookup_moenc_fusion(self, rng):
        """The convc1-fused epilogue == relu(lookup @ W + b) (bf16 MXU
        operand precision in-kernel -> bf16-class tolerance)."""
        import jax
        import jax.numpy as jnp
        from propainter_tpu.ops.corr_pallas import (
            corr_pyramid_flat, corr_lookup_flat, corr_lookup_flat_moenc)

        B, Hc, Wc, D = 2, 12, 20, 64
        f1 = jnp.asarray(rng.standard_normal((B, Hc, Wc, D)), jnp.float32)
        f2 = jnp.asarray(rng.standard_normal((B, Hc, Wc, D)), jnp.float32)
        coords = jnp.asarray(
            rng.uniform(-5, max(Hc, Wc) + 5, (B, Hc, Wc, 2)), jnp.float32)
        C = 4 * 81
        w = jnp.asarray(rng.standard_normal((C, 256)) * 0.05, jnp.float32)
        b = jnp.asarray(rng.standard_normal((256,)) * 0.05, jnp.float32)

        pyr = corr_pyramid_flat(f1, f2)
        corr = corr_lookup_flat(pyr, coords, 4, interpret=True)
        ref = np.asarray(jax.nn.relu(corr @ w + b))
        got = np.asarray(corr_lookup_flat_moenc(
            pyr, coords, w, b, 4, interpret=True))
        np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)
        # fused epilogue must not change WHERE activations fire
        assert ((got > 0) == (ref > 0)).mean() > 0.99
