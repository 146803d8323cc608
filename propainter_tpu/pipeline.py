"""End-to-end video inpainting pipeline (the reference's 4-stage schedule).

TPU-native re-design of reference inference_propainter.py:296-452:

  stage 1  bidirectional RAFT flow, fp32, chunked by clip length
  stage 2  flow completion, chunked by subvideo_length with 5-frame overlap
  stage 3  image propagation, chunked with 10-frame overlap
  stage 4  sliding-window feature propagation + transformer with global refs

Design notes:
  * every stage is jitted once per (static) chunk shape; chunk lengths are
    bucketed so long videos reuse the same compiled executable instead of
    recompiling per chunk;
  * all frames stay on device between stages (the reference round-trips to
    host per window in stage 4; we composite on device and transfer once);
  * the model runs bf16 on TPU when precision='bf16' (the reference's fp16
    switch, inference_propainter.py:333-337) — RAFT always fp32.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from propainter_tpu.models.raft import RAFT
from propainter_tpu.models.flow_completion import (
    RecurrentFlowCompleteNet,
    forward_bidirect_flow,
    combine_flow,
)
from propainter_tpu.models.propainter import (
    Encoder, InpaintGenerator, SoftSplit, image_propagation)


def get_short_clip_len(width: int) -> int:
    """RAFT chunk length by width. Reference inference_propainter.py:302-309."""
    if width <= 640:
        return 12
    if width <= 720:
        return 8
    if width <= 1280:
        return 4
    return 2


def equal_chunk_schedule(length: int, n_chunks: int, pad: int
                         ) -> list[tuple[int, int, int, int]] | None:
    """Equal-length overlapping chunk schedule for batched (sharded) stage
    2/3 execution.

    The reference's sequential schedule (inference_propainter.py:341-404)
    produces unequal tail chunks, which cannot stack into one batched call;
    this variant keeps every chunk the same length L = ceil(length/n) + 2*pad
    (same overlap-trim semantics: every output frame is >= pad frames away
    from its chunk's border, except at the video boundary, exactly like the
    reference's pad_len logic).

    Returns [(start, end, out_start, out_end)] with end-start constant and
    the out ranges tiling [0, length), or None when the video is too short
    to split (chunk length would reach the whole video).

    Chunk starts are spread evenly over [0, length-L] and output boundaries
    sit at the midpoints of consecutive chunks' overlaps: each boundary is
    >= overlap/2 >= pad frames from both chunks' borders.
    """
    if n_chunks < 2:
        return None  # nothing to split (and `starts` would divide by 0)
    step = -(-length // n_chunks)
    L = min(length, step + 2 * pad)
    if L >= length:
        return None
    starts = [i * (length - L) // (n_chunks - 1) for i in range(n_chunks)]
    if any(starts[i] + L - starts[i + 1] < 2 * pad
           for i in range(n_chunks - 1)):
        return None  # rounding ate the overlap margin — fall back
    bounds = ([0]
              + [(starts[i] + starts[i + 1] + L) // 2
                 for i in range(n_chunks - 1)]
              + [length])
    return [(starts[i], starts[i] + L, bounds[i], bounds[i + 1])
            for i in range(n_chunks)]


def plan_bucket_subruns(bm: np.ndarray) -> list[tuple[int, list[int]]]:
    """Split a window run into consecutive same-bucket sub-runs for the
    stage-4 occupancy bucketing.

    bm: (n_windows, nW) bool masked-window bitmaps, in execution order.
    Returns [(bucket, [window rows])]: buckets are the per-window masked
    counts rounded up to multiples of 4 (pow2 is too coarse at nW=16 — one
    briefly-large mask would push the whole run to the dense fallback),
    then adjacent sub-runs merge greedily while the bucket-upgrade cost
    stays under a dispatch floor: a separate sub-run costs one extra
    dispatch (~3 ms, PERF.md); merging upgrades windows to the max bucket
    (~1 ms of branch-A work per window per 4-step). Execution order is
    preserved (the 0.5/0.5 revisit average is sequential)."""
    nW = bm.shape[1]
    buckets = np.minimum(-(-bm.sum(axis=1).astype(int) // 4) * 4, nW)
    buckets = np.maximum(buckets, 4)
    subruns: list[tuple[int, list[int]]] = []
    for gi, b in enumerate(buckets):
        if subruns and subruns[-1][0] == b:
            subruns[-1][1].append(gi)
        else:
            subruns.append((int(b), [gi]))

    def upgrade_steps(a, b):
        bm_ = max(a[0], b[0])
        return (len(a[1]) * (bm_ - a[0]) + len(b[1]) * (bm_ - b[0])) // 4

    merged: list[tuple[int, list[int]]] = []
    for sr in subruns:
        while merged and upgrade_steps(merged[-1], sr) <= 2:
            prev = merged.pop()
            sr = (max(prev[0], sr[0]), prev[1] + sr[1])
        merged.append(sr)
    return merged


def get_ref_index(mid_neighbor_id, neighbor_ids, length, ref_stride=10,
                  ref_num=-1):
    """Global reference frame selection. Reference inference_propainter.py:159-173."""
    ref_index = []
    if ref_num == -1:
        for i in range(0, length, ref_stride):
            if i not in neighbor_ids:
                ref_index.append(i)
    else:
        start_idx = max(0, mid_neighbor_id - ref_stride * (ref_num // 2))
        end_idx = min(length, mid_neighbor_id + ref_stride * (ref_num // 2))
        for i in range(start_idx, end_idx, ref_stride):
            if i not in neighbor_ids:
                if len(ref_index) > ref_num:
                    break
                ref_index.append(i)
    return ref_index


@dataclasses.dataclass
class PipelineConfig:
    ref_stride: int = 10
    neighbor_length: int = 10
    subvideo_length: int = 80
    raft_iter: int = 20
    precision: str = "fp32"  # 'fp32' | 'bf16'
    # fixed RAFT chunk length override. None = width-based clip length
    # (inference protocol, inference_propainter.py:302-309); the reference
    # EVAL protocol always chunks RAFT by 60 frames instead
    # (scripts/evaluate_propainter.py:108).
    raft_clip_len: int | None = None
    # reference EVAL protocol: flow completion and image propagation run
    # whole-video (no subvideo chunking, no 100-frame img-prop cap) and
    # reference frames are uncapped (ref_num=-1)
    # (scripts/evaluate_propainter.py:29-34,127-137).
    unchunked: bool = False
    # stage-4 windows with identical shape can run as one batched generator
    # call (pad windows repeat an earlier window, weighted out of the
    # compositing average). Measured slower than per-window calls on one
    # v5e chip (HBM-bandwidth bound), so off by default; used for multi-chip
    # sharding where the window batch is split across devices.
    window_batch: int = 1
    # shard the embarrassingly-parallel batch axes (RAFT frame pairs,
    # stage-4 window batches) over all visible devices — the multi-chip
    # inference layout (SURVEY.md section 7.7: batch-of-windows sharding).
    shard_inference: bool = False
    # stage-4 branch-A occupancy bucketing: compute the per-window
    # masked-window bitmap (models.propainter.masked_window_bitmap) once per
    # window group and run the expensive cross-frame attention on only a
    # power-of-2 bucket of the windows that contain hole tokens. Bit-exact
    # vs the dense dual-branch; FLOPs scale with the mask instead of the
    # frame (the reference's data-dependent mask_tokens gather in
    # static-shape form). Costs one tiny readback per window group.
    occupancy_bucketing: bool = True
    # stage-4 encoder overlap carry: consecutive sliding windows share
    # l_t - stride local frames (11 - 5 = 6 at the defaults); the window
    # scan carries their encoder features so each step encodes only the
    # stride new frames (the encoder is strictly per-frame, so features
    # are identical — the reference re-encodes every frame up to 4x).
    # Applies when window_batch == 1 and the run's windows are regularly
    # strided; bit-exactness is pinned by the on/off pipeline test.
    encoder_carry: bool = True
    # sparse window attention implementation.
    # 'flash' (default): dense dual-branch, with branch A's softmax fused in
    #   a pallas kernel whose K/V fit in VMEM whole — the (Tq, Tk) logits
    #   never hit HBM and the softmax runs in fp32 (measured 5.2 vs 6.4
    #   ms/block vs 'xla' in bf16, better numerics). Inference-only (no VJP).
    # 'xla': all (window, head) problems in one batched MXU einsum;
    #   differentiable — what training uses.
    # 'pallas': per-(window, head) streaming kernel — measured 6x SLOWER
    #   than 'xla' on v5e (one TensorCore: per-window grid programs
    #   serialize and under-fill the MXU); kept as an opt-in reference.
    attention_impl: str = "flash"
    # bf16 pipeline only: run the RAFT GRU refinement's conv/GRU work in
    # bf16 (fp32 coords carry, fp32 softmax-free math unaffected). The
    # reference keeps RAFT fp32 even in fp16 mode because CUDA fp16's 5-bit
    # exponent overflows on correlation values; bf16 keeps fp32's exponent,
    # and the measured final-flow drift is 0.005 px mean / 0.02 px max on
    # ~2.4 px flows (tools/raft_bf16_ab.py) — far below RAFT's own
    # estimation error. Encoders stay fp32. Ignored in fp32 mode.
    raft_bf16_refine: bool = True
    # bf16 pipeline only: also run the RAFT feature/context ENCODERS in
    # bf16 (InstanceNorm stats stay fp32 inside the layer). Stacks on top
    # of raft_bf16_refine; drift measured in tools/raft_bf16_ab.py.
    # Ignored in fp32 mode.
    raft_bf16_encode: bool = True


class ProPainterPipeline:
    """Holds the three model param trees and the jitted stage functions."""

    def __init__(self, raft_params, flowcomp_params, inpaint_params,
                 config: PipelineConfig | None = None, *,
                 raft=None, flowcomp=None, inpaint=None):
        """Optional `raft`/`flowcomp`/`inpaint` module overrides let callers
        run the same orchestration with non-default model configs (reduced
        sizes for dry runs and tests, research variants)."""
        self.config = config or PipelineConfig()
        impl = self.config.attention_impl
        self.raft = raft or RAFT(
            corr_volume_dtype=("bfloat16" if self.config.precision == "bf16"
                               else "float32"),
            # the flat corr layout fuses the pair axis into the kernel lane
            # axis; keep per-pair lanes when the pair batch is sharded so
            # the partitioner can split it (see RAFT.corr_layout)
            corr_layout=("batched" if self.config.shard_inference
                         else "flat"))
        self.flowcomp = flowcomp or RecurrentFlowCompleteNet()
        self.inpaint = inpaint or InpaintGenerator(attention_impl=impl)
        self.raft_params = raft_params
        self.flowcomp_params = flowcomp_params
        self.inpaint_params = inpaint_params
        self._dtype = (jnp.bfloat16 if self.config.precision == "bf16"
                       else jnp.float32)
        if self._dtype != jnp.float32:
            cast = lambda t: jax.tree.map(
                lambda a: a.astype(self._dtype)
                if a.dtype == jnp.float32 else a, t)
            # RAFT stays fp32 (reference inference_propainter.py:311)
            self._flowcomp_params_c = cast(flowcomp_params)
            self._inpaint_params_c = cast(inpaint_params)
        else:
            self._flowcomp_params_c = flowcomp_params
            self._inpaint_params_c = inpaint_params

        self._batch_sharding = None
        self._window_batch = max(1, self.config.window_batch)
        if self.config.shard_inference and len(jax.devices()) > 1:
            from propainter_tpu.parallel.mesh import make_mesh, batch_sharding

            self._batch_sharding = batch_sharding(make_mesh())
            if self.config.window_batch == 1:
                # default the stage-4 window batch to the mesh size: windows
                # are the unit of multi-chip sharding (one window per chip)
                self._window_batch = self._batch_sharding.mesh.size

        # params are passed as jit ARGUMENTS (not closure constants): XLA
        # cannot constant-fold the network away for degenerate weights, and
        # swapping checkpoints reuses the compiled executables
        self._raft_bi = jax.jit(self._raft_bi_fn, static_argnames=("iters",))
        self._complete_flow = jax.jit(self._complete_flow_fn)
        self._img_prop = jax.jit(self._img_prop_fn)
        # one dispatch per same-shape WINDOW GROUP (lax.scan over windows):
        # the per-window dispatch floor (~3 ms each through the remote-exec
        # path, PERF.md) is paid once per group instead of once per window
        self._generate_group = jax.jit(
            self._generate_group_fn, static_argnames=("l_t", "stride"),
            donate_argnums=(1, 2))
        self._encode_all = jax.jit(self._encode_all_fn)
        self._window_occ = jax.jit(self._window_occ_fn)
        self._ss_tokens = jax.jit(self._ss_tokens_fn)

    # ---- stage fns -------------------------------------------------------

    def _raft_bi_fn(self, raft_params, frames, iters: int):
        """frames (B, T, H, W, 3) in [-1,1] -> (flows_f, flows_b) (B,T-1,H,W,2).
        Reference model/modules/flow_comp_raft.py:39-55."""
        B, T, H, W, C = frames.shape
        # encode each unique frame ONCE (the reference re-encodes frames up
        # to 4x across the fwd/bwd pair batches), then index pairs into one
        # batched GRU refinement: fwd pairs (t, t+1), bwd pairs (t+1, t).
        flat = frames.reshape(B * T, H, W, C)
        if self._batch_sharding is not None:
            flat = jax.lax.with_sharding_constraint(flat,
                                                    self._batch_sharding)
        use_bf16 = (self.config.precision == "bf16"
                    and jax.default_backend() != "cpu")
        bf = lambda t: jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if a.dtype == jnp.float32 else a, t)
        if (use_bf16 and self.config.raft_bf16_encode
                and self.config.raft_bf16_refine):
            # (encode casts the WHOLE param tree, so a bf16 encode implies
            # a bf16 refine — the knob stacks on raft_bf16_refine)
            # bf16 encoders (see PipelineConfig.raft_bf16_encode): the
            # params are cast once here; InstanceNorm keeps fp32 stats
            raft_params = bf(raft_params)
            fmap, net, inp = self.raft.apply(
                {"params": raft_params}, flat,
                compute_dtype=jnp.bfloat16, method="encode")
        else:
            fmap, net, inp = self.raft.apply(
                {"params": raft_params}, flat, method="encode")

        def pairs(x):
            x = x.reshape((B, T) + x.shape[1:])
            first = x[:, :-1].reshape((B * (T - 1),) + x.shape[2:])
            second = x[:, 1:].reshape((B * (T - 1),) + x.shape[2:])
            return first, second

        fm1, fm2 = pairs(fmap)
        nt1, nt2 = pairs(net)
        in1, in2 = pairs(inp)
        fmap1 = jnp.concatenate([fm1, fm2], axis=0)
        fmap2 = jnp.concatenate([fm2, fm1], axis=0)
        net_b = jnp.concatenate([nt1, nt2], axis=0)
        inp_b = jnp.concatenate([in1, in2], axis=0)
        if self._batch_sharding is not None:
            # pairs are independent: shard the pair axis across chips
            wsc = lambda x: jax.lax.with_sharding_constraint(
                x, self._batch_sharding)
            fmap1, fmap2, net_b, inp_b = map(wsc, (fmap1, fmap2, net_b,
                                                   inp_b))
        if use_bf16 and self.config.raft_bf16_refine:
            # bf16 refinement (see PipelineConfig.raft_bf16_refine): cast
            # params + features (no-ops if the bf16 encode already did);
            # the coords carry and the convex upsample stay fp32 inside
            # refine
            raft_params, fmap1, fmap2, net_b, inp_b = map(
                bf, (raft_params, fmap1, fmap2, net_b, inp_b))
        _, flow = self.raft.apply(
            {"params": raft_params}, fmap1, fmap2, net_b, inp_b,
            iters, method="refine")
        n = B * (T - 1)
        flows_f = flow[:n].reshape(B, T - 1, H, W, 2)
        flows_b = flow[n:].reshape(B, T - 1, H, W, 2)
        return flows_f, flows_b

    def _complete_flow_fn(self, fc_params, flows_f, flows_b, flow_masks):
        """Complete + combine flows for one chunk (or a batch of equal-length
        chunks on the batch axis, sharded across the mesh).
        Reference inference_propainter.py:350-356."""
        dt = self._dtype
        if self._batch_sharding is not None and flows_f.shape[0] > 1:
            wsc = lambda x: jax.lax.with_sharding_constraint(
                x, self._batch_sharding)
            flows_f, flows_b, flow_masks = map(wsc,
                                               (flows_f, flows_b, flow_masks))
        flows = (flows_f.astype(dt), flows_b.astype(dt))
        masks = flow_masks.astype(dt)

        def apply_fn(mf, mk, train):
            return self.flowcomp.apply({"params": fc_params}, mf, mk, train)

        pred, _ = forward_bidirect_flow(apply_fn, flows, masks)
        return combine_flow(flows, pred, masks)

    def _img_prop_fn(self, frames, flows_f, flows_b, masks_dilated):
        """Image propagation for one chunk (or a batch of equal-length
        chunks on the batch axis, sharded across the mesh).
        Reference inference_propainter.py:383-394."""
        dt = self._dtype
        if self._batch_sharding is not None and frames.shape[0] > 1:
            wsc = lambda x: jax.lax.with_sharding_constraint(
                x, self._batch_sharding)
            frames, flows_f, flows_b, masks_dilated = map(
                wsc, (frames, flows_f, flows_b, masks_dilated))
        frames = frames.astype(dt)
        masks = masks_dilated.astype(dt)
        masked_frames = frames * (1 - masks)
        # unroll=4: the warp-only step bodies are loop-overhead-bound
        # (301 -> 262 ms at the 80-frame bench shape; tools/unroll_ab.py)
        prop, updated = image_propagation(
            masked_frames, flows_f.astype(dt), flows_b.astype(dt), masks,
            "nearest", unroll=4)
        updated_frames = frames * (1 - masks) + prop * masks
        return updated_frames, updated

    def _encode_all_fn(self, inpaint_params, frames, masks_in,
                       masks_updated):
        """Encode every frame ONCE (the encoder is per-frame; sliding
        windows would otherwise re-encode each frame up to 4x, as the
        reference does). Returns (B, T, h, w, c) features."""
        dt = self._dtype
        B, T, H, W, _ = frames.shape
        enc_in = jnp.concatenate(
            [frames.astype(dt), masks_in.astype(dt),
             masks_updated.astype(dt)], axis=-1)
        feat = Encoder().apply({"params": inpaint_params["encoder"]},
                               enc_in.reshape(B * T, H, W, 5))
        return feat.reshape((B, T) + feat.shape[1:])

    def _ss_tokens_fn(self, inpaint_params, feat):
        """SoftSplit tokens for per-frame features (n, h, w, c) ->
        (n, fh, fw, hidden). The tokenizer is one strided conv per frame, so
        tokens for the reference-frame union can be computed once per video
        and gathered per window (like their encoder features)."""
        n, h, w, _ = feat.shape
        return SoftSplit(self.inpaint.hidden).apply(
            {"params": inpaint_params["ss"]}, feat, n, (h, w))[:, 0]

    def _window_occ_fn(self, masks_dilated, nb):
        """Per-window masked-window bitmaps for stage-4 branch-A bucketing.
        masks_dilated (B, T, H, W, 1); nb (n_windows, l_t) neighbor ids.
        Returns (n_windows, nW) bool."""
        from propainter_tpu.models.propainter import masked_window_bitmap

        return masked_window_bitmap(masks_dilated[0][nb])

    def _generate_group_fn(self, inpaint_params, comp, visited,
                           updated_frames, flows_f, flows_b, masks_dilated,
                           updated_masks, ori, nb, rp, fv, w, mi, mv,
                           ref_feat_all, ref_tok_all, seed_ids, l_t: int,
                           stride: int | None = None):
        """All same-shape sliding windows of one group in ONE executable:
        lax.scan over window batches; each step runs the generator on a
        (wb, l_t+ref_pad, ...) batch and applies the reference's SEQUENTIAL
        compositing update (inference_propainter.py:438-450):

            img   = uint8(pred) * mask + ori * (1 - mask)
            comp  = img                      on first visit
            comp  = uint8(comp/2 + img/2)    on each revisit

        The exponential 0.5/0.5 revisit average (NOT mean-of-visits: frames
        at window-stride multiples are visited 3x) and the per-visit uint8
        truncation are reproduced exactly — floor() stands in for the uint8
        cast; values stay integer-valued f32 on device until the end.

        nb: (n, wb, l_t) neighbor ids; rp: (n, wb, ref_pad) ref-union rows;
        fv: (n, wb, l_t+ref_pad) valid flags; w: (n, wb) 0 = batch-pad
        window (skipped). frame_valid masks padded reference frames (fixed
        window shapes -> one compile per l_t)."""
        dt = self._dtype
        uf = updated_frames[0].astype(dt)
        md = masks_dilated[0].astype(dt)
        um = updated_masks[0].astype(dt)
        ff = flows_f[0].astype(dt)
        fb = flows_b[0].astype(dt)
        masks_bin = masks_dilated[0]  # (T, H, W, 1) 0/1 f32

        use_mw = mi is not None
        use_carry = stride is not None

        def enc_frames(ids):
            """Encoder features for a set of frame ids (per-frame op —
            identical no matter which window computes them)."""
            enc_in = jnp.concatenate([uf[ids], md[ids], um[ids]], axis=-1)
            return Encoder().apply(
                {"params": inpaint_params["encoder"]}, enc_in)

        def step(carry, xs):
            if use_carry:
                comp, visited, feat_carry = carry
            else:
                comp, visited = carry
            if use_mw:
                nb_i, rp_i, fv_i, w_i, mi_i, mv_i = xs
            else:
                nb_i, rp_i, fv_i, w_i = xs
            sel_imgs = uf[nb_i]
            sel_masks = md[nb_i]
            sel_upd = um[nb_i]
            sel_ff = ff[nb_i[:, :-1]]
            sel_fb = fb[nb_i[:, :-1]]
            ref_feat = ref_feat_all[rp_i]
            ref_tok = ref_tok_all[rp_i]
            if self._batch_sharding is not None:
                # windows are independent: shard the window-batch axis
                wsc = lambda x: jax.lax.with_sharding_constraint(
                    x, self._batch_sharding)
                sel_imgs, sel_ff, sel_fb, sel_masks, sel_upd, ref_feat = map(
                    wsc, (sel_imgs, sel_ff, sel_fb, sel_masks, sel_upd,
                          ref_feat))
            if use_carry:
                # consecutive windows overlap by l_t - stride local frames:
                # encode only the stride NEW ones, reuse the rest from the
                # scan carry (wb == 1 on this path)
                new_feat = enc_frames(nb_i[0, l_t - stride:])
                local_feat = jnp.concatenate([feat_carry, new_feat], axis=0)
                enc_feat = jnp.concatenate(
                    [local_feat[None], ref_feat], axis=1)
                pred = self.inpaint.apply(
                    {"params": inpaint_params}, sel_imgs, (sel_ff, sel_fb),
                    sel_masks, sel_upd, l_t,
                    frame_valid=fv_i, precomputed_enc_feat=enc_feat,
                    precomputed_ref_tokens=ref_tok,
                    masked_windows=((mi_i, mv_i) if use_mw else None))
            else:
                pred = self.inpaint.apply(
                    {"params": inpaint_params}, sel_imgs, (sel_ff, sel_fb),
                    sel_masks, sel_upd, l_t,
                    frame_valid=fv_i, precomputed_ref_feat=ref_feat,
                    precomputed_ref_tokens=ref_tok,
                    masked_windows=((mi_i, mv_i) if use_mw else None))
            # (pred+1)/2*255 in the reference's operation order, then the
            # uint8 truncation (floor: values are non-negative)
            img8 = jnp.floor((pred.astype(jnp.float32) + 1.0) / 2.0 * 255.0)
            img8 = jnp.clip(img8, 0.0, 255.0)

            def upd(j, c):
                comp, visited = c
                ids = nb_i[j]  # (l_t,) distinct frame indices
                m = masks_bin[ids]
                img = img8[j] * m + ori[ids] * (1.0 - m)
                prev = comp[ids]
                new = jnp.where(visited[ids],
                                jnp.floor(0.5 * prev + 0.5 * img), img)
                real = w_i[j] > 0
                comp = comp.at[ids].set(jnp.where(real, new, prev))
                visited = visited.at[ids].set(visited[ids] | real)
                return comp, visited

            comp, visited = jax.lax.fori_loop(
                0, nb_i.shape[0], upd, (comp, visited))
            if use_carry:
                return (comp, visited, local_feat[stride:]), None
            return (comp, visited), None

        xs = (nb, rp, fv, w) + ((mi, mv) if use_mw else ())
        init = (comp, visited)
        if use_carry:
            # seed: features of window 0's first l_t - stride local frames
            init = init + (enc_frames(seed_ids),)
        out_carry, _ = jax.lax.scan(step, init, xs)
        return out_carry[0], out_carry[1]

    # ---- multi-chip chunk sharding (stages 2+3) --------------------------

    def _complete_flow_batched(self, chunks):
        cat = lambda i: jnp.concatenate([c[i] for c in chunks], 0)
        return self._complete_flow(self._flowcomp_params_c,
                                   cat(0), cat(1), cat(2))

    def _img_prop_batched(self, chunks):
        cat = lambda i: jnp.concatenate([c[i] for c in chunks], 0)
        return self._img_prop(cat(0), cat(1), cat(2), cat(3))

    def _sharded_chunks(self, batched_call, length: int, pad: int, slice_fn):
        """Run a chunked stage as ONE batched call with the chunk axis
        sharded across the mesh (stages 2+3 are sequential scans per chunk
        but chunks are independent — the reference proves chunk independence
        up to the pad-frame overlap trim, inference_propainter.py:341-404).

        Returns None when the video is too short to split usefully (the
        caller falls back to the single-device path)."""
        n_dev = self._batch_sharding.mesh.size
        sub = self.config.subvideo_length
        # quality guard: every chunk must keep >= subvideo_length temporal
        # context — the recurrent completion/propagation nets degrade on
        # shorter clips, and the reference's sequential schedule never runs
        # them below sub frames either (inference_propainter.py:341-404).
        # Shard only when the video supports n_dev such chunks (in device
        # multiples); shorter videos fall back to the single-device path.
        n_chunks = (length // sub) // n_dev * n_dev
        if n_chunks < 2:
            return None
        sched = equal_chunk_schedule(length, n_chunks, pad)
        if sched is None:
            return None
        chunks = [slice_fn(s, e) for (s, e, _, _) in sched]
        outs = batched_call(chunks)
        pieces = [
            jax.tree.map(lambda x: x[i : i + 1, os - s : oe - s], outs)
            for i, (s, e, os, oe) in enumerate(sched) if oe > os
        ]
        return jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=1), *pieces)

    # ---- full pipeline ---------------------------------------------------

    def compute_flows(self, frames: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Stage 1: chunked bidirectional RAFT.
        Reference inference_propainter.py:302-330."""
        B, T, H, W, _ = frames.shape
        clip = self.config.raft_clip_len or get_short_clip_len(W)
        iters = self.config.raft_iter
        if T <= clip:
            return self._raft_bi(self.raft_params, frames, iters=iters)
        fs, bs = [], []
        for f in range(0, T, clip):
            end_f = min(T, f + clip)
            s = f if f == 0 else f - 1
            ff, fb = self._raft_bi(self.raft_params, frames[:, s:end_f], iters=iters)
            # overlap of 1 frame produces 1 duplicate flow at chunk joins
            if f != 0:
                pass  # chunk starts at f-1 so flows [s..end_f-2] start at f-1
            fs.append(ff)
            bs.append(fb)
        flows_f = jnp.concatenate(fs, axis=1)
        flows_b = jnp.concatenate(bs, axis=1)
        return flows_f, flows_b

    def complete_flows(self, gt_flows_bi, flow_masks):
        """Stage 2: chunked flow completion with 5-frame overlap trim.
        Reference inference_propainter.py:341-368."""
        flows_f, flows_b = gt_flows_bi
        flow_length = flows_f.shape[1]
        sub = self.config.subvideo_length
        if self._batch_sharding is not None and not self.config.unchunked:
            out = self._sharded_chunks(
                self._complete_flow_batched, flow_length, pad=5,
                slice_fn=lambda s, e: (flows_f[:, s:e], flows_b[:, s:e],
                                       flow_masks[:, s : e + 1]))
            if out is not None:
                return out
        if self.config.unchunked or flow_length <= sub:
            return self._complete_flow(self._flowcomp_params_c, flows_f, flows_b, flow_masks)
        pred_f, pred_b = [], []
        pad_len = 5
        for f in range(0, flow_length, sub):
            s_f = max(0, f - pad_len)
            e_f = min(flow_length, f + sub + pad_len)
            pad_len_s = max(0, f) - s_f
            pad_len_e = e_f - min(flow_length, f + sub)
            pf, pb = self._complete_flow(
                self._flowcomp_params_c,
                flows_f[:, s_f:e_f], flows_b[:, s_f:e_f],
                flow_masks[:, s_f : e_f + 1])
            pred_f.append(pf[:, pad_len_s : e_f - s_f - pad_len_e])
            pred_b.append(pb[:, pad_len_s : e_f - s_f - pad_len_e])
        return (jnp.concatenate(pred_f, axis=1),
                jnp.concatenate(pred_b, axis=1))

    def propagate_images(self, frames, pred_flows_bi, masks_dilated):
        """Stage 3: chunked image propagation with 10-frame overlap trim.
        Reference inference_propainter.py:371-404."""
        T = frames.shape[1]
        sub = min(100, self.config.subvideo_length)
        flows_f, flows_b = pred_flows_bi
        if self._batch_sharding is not None and not self.config.unchunked:
            out = self._sharded_chunks(
                self._img_prop_batched, T, pad=10,
                slice_fn=lambda s, e: (frames[:, s:e], flows_f[:, s : e - 1],
                                       flows_b[:, s : e - 1],
                                       masks_dilated[:, s:e]))
            if out is not None:
                return out
        if self.config.unchunked or T <= sub:
            return self._img_prop(frames, flows_f, flows_b, masks_dilated)
        upd_frames, upd_masks = [], []
        pad_len = 10
        for f in range(0, T, sub):
            s_f = max(0, f - pad_len)
            e_f = min(T, f + sub + pad_len)
            pad_len_s = max(0, f) - s_f
            pad_len_e = e_f - min(T, f + sub)
            uf, um = self._img_prop(
                frames[:, s_f:e_f], flows_f[:, s_f : e_f - 1],
                flows_b[:, s_f : e_f - 1], masks_dilated[:, s_f:e_f])
            upd_frames.append(uf[:, pad_len_s : e_f - s_f - pad_len_e])
            upd_masks.append(um[:, pad_len_s : e_f - s_f - pad_len_e])
        return (jnp.concatenate(upd_frames, axis=1),
                jnp.concatenate(upd_masks, axis=1))

    def generate(self, updated_frames, pred_flows_bi, masks_dilated,
                 updated_masks, ori_frames: np.ndarray):
        """Stage 4: sliding-window transformer inference + compositing.
        Reference inference_propainter.py:407-452.

        Args:
          ori_frames: (T, H, W, 3) uint8 original frames (host).
        Returns:
          (T, H, W, 3) uint8 composited frames — a DEVICE array (callers
          that need host frames convert once; keeping it on device avoids
          paying the transfer in benchmarks/pipelines that keep going).
        """
        cfg = self.config
        B, video_length, H, W, _ = updated_frames.shape
        neighbor_stride = cfg.neighbor_length // 2
        if not cfg.unchunked and video_length > cfg.subvideo_length:
            ref_num = cfg.subvideo_length // cfg.ref_stride
        else:
            # unchunked eval protocol never caps refs
            # (scripts/evaluate_propainter.py:29-34)
            ref_num = -1

        # fixed reference-frame count: pad shorter ref lists (masked via
        # frame_valid, numerically exact) so every window with the same l_t
        # shares one compiled executable
        ref_cap = (video_length if cfg.unchunked
                   else min(video_length, cfg.subvideo_length))
        ref_pad = max(1, -(-ref_cap // cfg.ref_stride))

        # on-device compositing: predictions never round-trip to host per
        # window (the reference downloads every window,
        # inference_propainter.py:438); one uint8 transfer at the end.
        comp = jnp.zeros((video_length, H, W, 3), jnp.float32)
        visited = jnp.zeros((video_length, 1, 1, 1), jnp.bool_)
        if isinstance(ori_frames, jnp.ndarray):
            ori = ori_frames.astype(jnp.float32)  # caller pre-uploaded
        else:
            # upload the ORIGINAL uint8 (4x less host->device traffic than
            # float32) and convert on device
            ori = jnp.asarray(np.ascontiguousarray(ori_frames)).astype(
                jnp.float32)
        flows_f, flows_b = pred_flows_bi
        assert B == 1, "stage 4 batches windows over the batch axis"
        # NOTE: one-shot whole-video encoding + per-window feature gather
        # measured SLOWER than re-encoding inside each window executable
        # (materialize+gather beats fused redundant encodes) — see PERF.md.
        # The GLOBAL reference frames are different: the same ~8 stride
        # frames repeat in EVERY window (16x redundant encodes), and their
        # features feed only attention keys — encode them once and gather.

        # build all windows, then group same-shape windows into batched
        # calls. Window refs index into the encoded ref-union (ref_pos);
        # padded slots point at union entry 0 and are masked by frame_valid.
        window_specs = []  # (neighbor_ids, ref_ids truncated to ref_pad)
        for f in range(0, video_length, neighbor_stride):
            neighbor_ids = list(
                range(max(0, f - neighbor_stride),
                      min(video_length, f + neighbor_stride + 1)))
            ref_ids = get_ref_index(f, neighbor_ids, video_length,
                                    cfg.ref_stride, ref_num)[:ref_pad]
            window_specs.append((neighbor_ids, ref_ids))
        # union over the TRUNCATED lists: only frames whose features are
        # actually gathered get encoded
        ref_union = sorted({rid for _, rids in window_specs for rid in rids})
        if not ref_union:
            # short videos can have no refs at all (every frame is a
            # neighbor); keep one dummy union entry for the padded
            # (frame_valid=False) slots
            ref_union = [0]
        ref_index = {rid: i for i, rid in enumerate(ref_union)}
        ru = np.asarray(ref_union, np.int32)
        ref_feat_all = self._encode_all(
            self._inpaint_params_c, updated_frames[:, ru],
            masks_dilated[:, ru], updated_masks[:, ru])[0]
        # tokenize the ref union once too: SoftSplit is per-frame, and the
        # same ref frames repeat in every window's transformer input
        ref_tok_all = self._ss_tokens(self._inpaint_params_c, ref_feat_all)

        windows = []  # (neighbor_ids, ref_pos, frame_valid)
        for neighbor_ids, ref_ids in window_specs:
            l_t = len(neighbor_ids)
            n_valid_refs = len(ref_ids)
            ref_pos = ([ref_index[rid] for rid in ref_ids]
                       + [0] * (ref_pad - n_valid_refs))
            frame_valid = np.ones(l_t + ref_pad, np.bool_)
            frame_valid[l_t + n_valid_refs:] = False
            windows.append((neighbor_ids, ref_pos, frame_valid))

        # batch windows into maximal CONSECUTIVE same-l_t runs: the 0.5/0.5
        # revisit average is order-dependent, so windows must execute in f
        # order (reference inference_propainter.py:417). Runs with equal
        # (l_t, n_batches) reuse one compiled executable; a typical video
        # has 3 runs (start-boundary l_t, main l_t, tail l_t).
        runs: list[tuple[int, list]] = []
        for wdw in windows:
            if runs and len(wdw[0]) == runs[-1][0]:
                runs[-1][1].append(wdw)
            else:
                runs.append((len(wdw[0]), [wdw]))

        # occupancy bucketing: branch-A attention runs on only the windows
        # that contain hole tokens (a power-of-2 bucket keeps shapes static;
        # executables key on (l_t, bucket)). ONE tiny device round-trip for
        # all groups: neighbor lists pad to the longest l_t by repeating a
        # frame — repetition cannot change the union occupancy.
        bitmaps = None
        if self.config.occupancy_bucketing:
            l_t_max = max(len(w_[0]) for w_ in windows)
            nb_all = np.array(
                [w_[0] + [w_[0][-1]] * (l_t_max - len(w_[0]))
                 for w_ in windows], np.int32)
            bitmaps = np.asarray(
                self._window_occ(masks_dilated, jnp.asarray(nb_all)))

        wb = self._window_batch
        grp_row = 0  # runs partition `windows` in order
        for l_t, grp in runs:
            # split the run into consecutive same-bucket sub-runs: buckets
            # are multiples of 4 of the per-window masked count (pow2 is
            # too coarse at nW=16 — one briefly-large mask would push the
            # whole run to the dense fallback). Length-1 sub-runs merge
            # into their neighbor (max bucket) to limit executable
            # variants; order is preserved (the 0.5/0.5 revisit average is
            # sequential).
            if bitmaps is not None:
                bm = bitmaps[grp_row : grp_row + len(grp)]
                grp_row += len(grp)
                subruns = plan_bucket_subruns(bm)
            else:
                subruns = [(None, list(range(len(grp))))]

            for m_b, rows in subruns:
                sub = [grp[i] for i in rows]
                mw = None
                if m_b is not None and m_b < bm.shape[1]:
                    idxs = np.zeros((len(sub), m_b), np.int32)
                    valids = np.zeros((len(sub), m_b), np.bool_)
                    for si, gi in enumerate(rows):
                        nz = np.nonzero(bm[gi])[0]
                        if len(nz):
                            # pad by cycling REAL masked indices: duplicate
                            # scatter slots write identical values
                            idxs[si] = np.resize(nz, m_b)
                            valids[si] = True
                    mw = (idxs, valids)

                batches = []  # (nb (wb,l_t), rp, fv, w[, mi, mv])
                for start in range(0, len(sub), wb):
                    ids = list(range(start, min(start + wb, len(sub))))
                    n_real = len(ids)
                    if n_real < wb:
                        # pad the tail batch by repeating windows with
                        # weight 0 (skipped in the compositing update)
                        ids = (ids * wb)[:wb]
                    batch = [sub[i] for i in ids]
                    nb = np.array([w_[0] for w_ in batch], np.int32)
                    rp = np.array([w_[1] for w_ in batch], np.int32)
                    fv = np.array([w_[2] for w_ in batch])
                    w = np.zeros(len(batch), np.float32)
                    w[:n_real] = 1.0
                    entry = (nb, rp, fv, w)
                    if mw is not None:
                        entry += (mw[0][ids], mw[1][ids])
                    batches.append(entry)
                n_xs = len(batches[0])
                stacks = tuple(
                    jnp.asarray(np.stack([b[i] for b in batches]))
                    for i in range(n_xs))
                mi, mv = ((stacks[4], stacks[5]) if mw is not None
                          else (None, None))
                # encoder overlap carry: regularly-strided single-window
                # steps share l_t - stride local frames with their
                # predecessor — encode only the new ones (PipelineConfig
                # .encoder_carry)
                stride = None
                seed_ids = jnp.zeros((0,), jnp.int32)
                if self.config.encoder_carry and wb == 1 and len(sub) > 1:
                    nbs = [w_[0] for w_ in sub]
                    s = nbs[1][0] - nbs[0][0]
                    if 0 < s < l_t and all(
                            nbs[k + 1] == [x + s for x in nbs[k]]
                            for k in range(len(nbs) - 1)):
                        stride = s
                        seed_ids = jnp.asarray(nbs[0][: l_t - s], jnp.int32)
                comp, visited = self._generate_group(
                    self._inpaint_params_c, comp, visited,
                    updated_frames, flows_f, flows_b, masks_dilated,
                    updated_masks, ori, stacks[0], stacks[1], stacks[2],
                    stacks[3], mi, mv, ref_feat_all, ref_tok_all, seed_ids,
                    l_t=l_t, stride=stride)

        return comp.astype(jnp.uint8)

    def inpaint_video(self, frames_np: np.ndarray, flow_masks_np: np.ndarray,
                      masks_dilated_np: np.ndarray,
                      timings: dict | None = None) -> list[np.ndarray]:
        """Full 4-stage pipeline.

        Args:
          frames_np: (T, H, W, 3) uint8.
          flow_masks_np / masks_dilated_np: (T, H, W) bool/uint8 (1 = hole).
          timings: optional dict that receives per-stage wall seconds
            (keys raft/flow_completion/image_propagation/generation) — the
            jax.profiler-friendly analogue of the reference's coarse
            cuda-synchronized timers (scripts/evaluate_propainter.py:100-184).
        Returns:
          list of (H, W, 3) uint8 inpainted frames.
        """
        import time

        # Below 128 px the coarsest RAFT corr-pyramid level degenerates
        # under 2x2 and align-corners interpolation divides by zero: the
        # torch reference silently emits NaN -> all-black frames at these
        # sizes. Instead of reproducing that failure, auto-pad into RAFT's
        # valid domain (the reference ships the same remedy as an unused
        # InputPadder, RAFT/utils/utils.py:7-24): frames replicate-pad on
        # the bottom/right (flow near the real borders is unaffected on the
        # top/left), masks zero-pad (the padding is valid content, never
        # hole), and the output is cropped back to the caller's size.
        T0, H0, W0 = frames_np.shape[:3]
        pad_h = max(0, 128 - H0)
        pad_w = max(0, 128 - W0)
        if pad_h or pad_w:
            frames_np = np.pad(
                frames_np, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)),
                mode="edge")
            flow_masks_np = np.pad(
                np.asarray(flow_masks_np),
                ((0, 0), (0, pad_h), (0, pad_w)), mode="constant")
            masks_dilated_np = np.pad(
                np.asarray(masks_dilated_np),
                ((0, 0), (0, pad_h), (0, pad_w)), mode="constant")

        # upload uint8/bool and normalize ON DEVICE: 4x less host->device
        # traffic than pre-normalized float32 (PCIe on production hardware,
        # a ~55 MB/s tunnel on the dev harness)
        frames = (jnp.asarray(np.ascontiguousarray(frames_np))[None]
                  .astype(jnp.float32) / 255.0 * 2.0 - 1.0)
        flow_masks = jnp.asarray(
            np.ascontiguousarray(flow_masks_np).astype(np.uint8)
        )[None, ..., None].astype(jnp.float32)
        masks_dilated = jnp.asarray(
            np.ascontiguousarray(masks_dilated_np).astype(np.uint8)
        )[None, ..., None].astype(jnp.float32)

        def timed(key, fn):
            t0 = time.perf_counter()
            out = fn()
            jax.block_until_ready(out)
            if timings is not None:
                # 1-element readback: block_until_ready alone does not await
                # device completion on remote/tunneled backends
                np.asarray(jax.tree.leaves(out)[0].ravel()[0])
                timings[key] = timings.get(key, 0.0) + time.perf_counter() - t0
            return out

        gt_flows_bi = timed("raft", lambda: self.compute_flows(frames))
        pred_flows_bi = timed(
            "flow_completion",
            lambda: self.complete_flows(gt_flows_bi, flow_masks))
        updated_frames, updated_masks = timed(
            "image_propagation",
            lambda: self.propagate_images(frames, pred_flows_bi,
                                          masks_dilated))
        out_dev = timed(
            "generation",
            lambda: self.generate(updated_frames, pred_flows_bi,
                                  masks_dilated, updated_masks, frames_np))
        t0 = time.perf_counter()
        out_np = np.asarray(out_dev)
        if timings is not None:
            timings["readback"] = (timings.get("readback", 0.0)
                                   + time.perf_counter() - t0)
        if pad_h or pad_w:
            out_np = out_np[:, :H0, :W0]
        return [out_np[i] for i in range(out_np.shape[0])]
