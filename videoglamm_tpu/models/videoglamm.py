"""VideoGLaMM composite model: dual encoders + LLM + pixel decoder + losses.

Behavioral contract from the reference composite
(/root/reference/VideoGLaMM/model/VideoGLaMM.py:84-903):
- dual V->L path: InternVideo2 4-frame chunks + per-frame CLIP-336, projected
  and pooled into the [context(T*144) ; video(T*64)] visual prefix
  (arch.py:121-191);
- the Phi-3 forward over the spliced sequence produces the CE loss and the
  [SEG] hidden states; text_hidden_fcs projects those into the 256-d SAM
  prompt space (VideoGLaMM.py:368-437);
- per (sample, frame): SAM-2 prompt-encoder(text_embeds) + mask decoder
  (multimask_output=False) produce per-[SEG] mask logits (VideoGLaMM.py:439-496);
- loss = ce*1.0 + bce*2.0 + dice*0.5 with MASK_IGNORE_INDEX semantics
  (VideoGLaMM.py:20-81,510-558).

TPU-first redesign vs the reference:
- everything is fixed-shape: each batch row is ONE conversation carrying a
  `video_idx` into the (deduplicated) video batch — replacing the ragged
  `offset` bookkeeping (VideoGLaMM.py:356-391) with static gathers;
- [SEG] slots are padded to MAX_NUM_SEG_TOKENS_PER_SAMPLE=4 with zeroed
  prompts, matching the reference's own padding (VideoGLaMM.py:416-435), so
  num_masks == R * max_seg * T_sam exactly as the torch loop computes it;
- the per-sample/per-frame Python loops over the SAM decoder
  (VideoGLaMM.py:453-496) become ONE batched decoder call over
  R*max_seg*T_sam prompts;
- frozen towers are wrapped in stop_gradient (the torch code relies on
  requires_grad=False + no_grad blocks).
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..config import VideoGLaMMConfig
from ..constants import IGNORE_INDEX, MASK_IGNORE_INDEX
from ..ops.resize import resize_bilinear
from .clip_vit import CLIPVisionTower
from .internvideo2 import InternVideo2Tower
from .multimodal import SplicedBatch, splice_visual_prefix
from .llama import LlamaForCausalLM
from .phi3 import Phi3ForCausalLM
from .projectors import TextHiddenFCs, VisionProjector, build_visual_prefix
from .sam2.sam2_base import SAM2Base


class SegExtraction(NamedTuple):
    embeds: jnp.ndarray   # [R, max_seg, out_dim] (invalid slots zeroed)
    valid: jnp.ndarray    # [R, max_seg] bool
    positions: jnp.ndarray  # [R, max_seg] spliced-seq position of each [SEG]


class VideoGLaMMOutput(NamedTuple):
    loss: jnp.ndarray
    ce_loss: jnp.ndarray
    mask_bce_loss: jnp.ndarray
    mask_dice_loss: jnp.ndarray
    mask_loss: jnp.ndarray
    pred_masks: Optional[jnp.ndarray] = None  # [R, max_seg, T_sam, h, w]


def ce_loss_fn(logits, labels, vocab_size):
    """Causal LM loss: shift, ignore IGNORE_INDEX, mean over valid tokens
    (matching HF CausalLM loss used by the reference, phi3.py:42)."""
    logits = logits[:, :-1].astype(jnp.float32)
    targets = labels[:, 1:]
    valid = targets != IGNORE_INDEX
    tgt = jnp.where(valid, targets, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    return nll.sum() / jnp.maximum(valid.sum(), 1)


def sigmoid_ce_loss(pred, gt):
    """Per-mask pixel-mean BCE with MASK_IGNORE_INDEX regions zeroed but the
    mean still taken over ALL pixels (reference VideoGLaMM.py:56-81).
    pred/gt: [..., h, w] -> [...] per-mask loss."""
    p = pred.astype(jnp.float32)
    g = gt.astype(jnp.float32)
    keep = g != MASK_IGNORE_INDEX
    gc = jnp.where(keep, g, 0.0)
    # numerically-stable bce_with_logits
    loss = jnp.maximum(p, 0.0) - p * gc + jnp.log1p(jnp.exp(-jnp.abs(p)))
    loss = jnp.where(keep, loss, 0.0)
    return loss.mean(axis=(-2, -1))


def dice_loss(pred, gt, scale: float = 1000.0, eps: float = 1e-6):
    """Per-mask DICE with ignore regions removed (reference VideoGLaMM.py:20-53).
    pred/gt: [..., h, w] -> [...]."""
    p = jax.nn.sigmoid(pred.astype(jnp.float32))
    g = gt.astype(jnp.float32)
    keep = (g != MASK_IGNORE_INDEX).astype(jnp.float32)
    p = p * keep
    g = g * keep
    num = 2.0 * (p / scale * g).sum(axis=(-2, -1))
    den = (p / scale).sum(axis=(-2, -1)) + (g / scale).sum(axis=(-2, -1))
    return 1.0 - (num + eps) / (den + eps)


class VideoGLaMM(nn.Module):
    cfg: VideoGLaMMConfig
    dtype: jnp.dtype = jnp.bfloat16
    remat_llm: bool = False
    lora_rank: int = 0          # LoRA on LLM q/v (training); 0 = disabled
    lora_alpha: float = 16.0
    quant_llm_int8: bool = False  # weight-only int8 LLM serving mode
    quant_llm_int4: bool = False  # experimental int4 serving (group-128)
    quant_kv_int8: bool = False   # int8 KV cache (decode HBM + residency;
                                  # read by inference/generate.py)

    def setup(self):
        cfg = self.cfg
        self.vision_tower = InternVideo2Tower(cfg.internvideo, dtype=self.dtype)
        self.image_vision_tower = CLIPVisionTower(cfg.clip, dtype=self.dtype)
        llm_hidden = (cfg.llm.hidden_size if cfg.llm_type == "phi3"
                      else cfg.llama.hidden_size)
        self.mm_projector = VisionProjector(
            cfg.mm_projector_type, llm_hidden, dtype=self.dtype)
        self.image_mm_projector = VisionProjector(
            cfg.mm_projector_type, llm_hidden, dtype=self.dtype)
        if cfg.llm_type == "phi3":
            self.llm = Phi3ForCausalLM(cfg.llm, extra_vocab=1,
                                       dtype=self.dtype,
                                       remat=self.remat_llm,
                                       lora_rank=self.lora_rank,
                                       lora_alpha=self.lora_alpha,
                                       quant_int8=self.quant_llm_int8,
                                       quant_int4=self.quant_llm_int4)
        elif cfg.llm_type == "llama3_1":
            self.llm = LlamaForCausalLM(cfg.llama, extra_vocab=1,
                                        dtype=self.dtype,
                                        remat=self.remat_llm)
        else:
            raise ValueError(cfg.llm_type)
        self.text_hidden_fcs = TextHiddenFCs(cfg.out_dim)
        self.sam = SAM2Base(cfg.sam2, dtype=self.dtype)

    # ------------------------------------------------------------------
    def encode_visual_prefix(self, frames, context_images):
        """frames: [Bv, T, 224, 224, 3]; context: [Bv, T, 336, 336, 3]
        -> [Bv, V, H] visual prefix (reference arch.py:121-191)."""
        cfg = self.cfg
        Bv, T = frames.shape[:2]
        ck = cfg.chunk_size
        assert T % ck == 0, (T, ck)
        L = cfg.internvideo.tokens_per_frame

        chunks = frames.reshape(Bv * (T // ck), ck, *frames.shape[2:])
        vid = self.vision_tower(chunks)               # [Bv*nc, ck*L, D]
        vid = vid.reshape(Bv, T, L, vid.shape[-1])

        ctx = self.image_vision_tower(
            context_images.reshape((Bv * T,) + context_images.shape[2:]))
        ctx = ctx.reshape(Bv, T, ctx.shape[1], ctx.shape[2])

        vid = self.mm_projector(vid)
        ctx = self.image_mm_projector(ctx)
        return build_visual_prefix(vid, ctx, chunk_size=ck,
                                   video_pool=cfg.video_pool,
                                   context_pool=cfg.context_pool)

    # ------------------------------------------------------------------
    def sam_image_features_chunked(self, images):
        """images: [N, S, S, 3] -> (feats, pos). Frames run through the
        Hiera encoder VGT_SAM_CHUNK at a time under nn.scan. Default 1:
        the r5 sweep at 8 flagship frames WITH the fused-block kernels
        still favors per-frame (chunk 1: 197 ms, 2: 208, 4: 218, 8: 221 —
        sweep harness adds ~20 ms of per-iter sync vs the in-pipeline
        stage wall of 174 ms; ordering is the signal) — the smaller
        working set pipelines better than batch amortization of program
        launches, confirming the pre-fusion measurement (479 -> 366 ms).
        The scan keeps ONE compiled encoder body either way."""
        import os
        N = images.shape[0]
        if N == 1 or self.is_initializing():
            return self.sam.forward_image(images)
        c = int(os.environ.get("VGT_SAM_CHUNK", "1"))
        if c < 1 or N % c:
            c = 1
        if c == N:
            return self.sam.forward_image(images)

        xs = images.reshape((N // c, c) + images.shape[1:])

        def body(mdl, carry, xb):
            feats, pos = mdl.sam.forward_image(xb)
            return carry, (tuple(feats), tuple(pos))

        _, (feats, pos) = nn.scan(
            body, variable_broadcast="params",
            split_rngs={"params": False})(self, 0, xs)
        feats = [f.reshape((N,) + f.shape[2:]) for f in feats]
        pos = [p[0] for p in pos]   # sine grids are frame-invariant
        return feats, pos

    def encode_sam_features(self, frames_sam):
        """frames_sam: [Bv, T_sam, S, S, 3] (SAM-normalized) -> per-level
        feature pyramids with a leading [Bv, T_sam] batch (reference
        get_visual_embs_sam2, VideoGLaMM.py:205-241 — its per-frame Python
        loop becomes one scanned encoder call)."""
        Bv, T = frames_sam.shape[:2]
        flat = frames_sam.reshape((Bv * T,) + frames_sam.shape[2:])
        feats, pos = self.sam_image_features_chunked(flat)
        feats = [f.reshape((Bv, T) + f.shape[1:]) for f in feats]
        # pos levels are unbatched [h, w, C] sine grids — shared across frames
        return feats, pos

    # ------------------------------------------------------------------
    def lm_forward(self, visual_prefix, input_ids, text_lens, labels=None,
                   video_idx=None):
        """Splice per-row visual prefixes (gathered via video_idx) and run the
        decoder. Returns (logits, hidden, SplicedBatch)."""
        if video_idx is not None:
            visual_prefix = visual_prefix[video_idx]
        embeds = self.llm.embed(input_ids)
        sp = splice_visual_prefix(embeds, input_ids, visual_prefix, text_lens,
                                  labels)
        logits, hidden, _ = self.llm(sp.embeds, sp.positions, sp.attn_lens)
        return logits, hidden, sp

    # ------------------------------------------------------------------
    def extract_seg(self, hidden, sp: SplicedBatch) -> SegExtraction:
        """First max_seg [SEG] occurrences per row -> prompt embeddings
        (reference VideoGLaMM.py:368-437; invalid slots zeroed to match its
        zero-padding of sparse embeddings)."""
        cfg = self.cfg
        R, S = sp.token_ids.shape
        pos = jnp.arange(S)[None, :]
        is_seg = (sp.token_ids == cfg.seg_token_idx) & (pos < sp.attn_lens[:, None])
        key = jnp.where(is_seg, pos, S + pos)
        idx = jnp.argsort(key, axis=1)[:, :cfg.max_seg_tokens]          # [R, max_seg]
        valid = jnp.take_along_axis(is_seg, idx, axis=1)
        h = jnp.take_along_axis(hidden, idx[..., None], axis=1)  # [R, ms, D]
        emb = self.text_hidden_fcs(h.astype(jnp.float32))
        emb = jnp.where(valid[..., None], emb, 0.0)
        return SegExtraction(embeds=emb, valid=valid, positions=idx)

    # ------------------------------------------------------------------
    def decode_masks(self, sam_feats, seg: SegExtraction, video_idx,
                     training: bool = True):
        """Batched SAM decode: one call over R*max_seg*T_sam prompts
        (replacing the reference's nested Python loops, VideoGLaMM.py:453-496).

        sam_feats: 3 levels [Bv, T, h, w, c]. Returns low-res mask logits
        [R, max_seg, T_sam, 4E, 4E]."""
        cfg = self.cfg
        ms = cfg.max_seg_tokens
        R = seg.embeds.shape[0]
        T = sam_feats[0].shape[1]

        sparse = seg.embeds[:, :, None, :]                 # [R, ms, 1, C]
        sparse = jnp.broadcast_to(sparse[:, :, None],
                                  (R, ms, T, 1, sparse.shape[-1]))
        sparse = sparse.reshape(R * ms * T, 1, sparse.shape[-1])

        def expand(f):
            f = f[video_idx]                               # [R, T, h, w, c]
            f = jnp.broadcast_to(f[:, None], (R, ms) + f.shape[1:])
            return f.reshape((R * ms * T,) + f.shape[3:])

        s0, s1, embed = expand(sam_feats[0]), expand(sam_feats[1]), \
            expand(sam_feats[2])

        sparse_pe, dense_pe = self.sam.sam_prompt_encoder(
            points=None, text_embeds=sparse)
        image_pe = self.sam.sam_prompt_encoder.get_dense_pe()
        dec = self.sam.sam_mask_decoder(
            embed, image_pe, sparse_pe, dense_pe, multimask_output=False,
            high_res_features=(s0, s1), training=training)
        m = dec.masks[:, 0]                                # [RmsT, 4E, 4E]
        return m.reshape(R, ms, T, m.shape[-2], m.shape[-1])

    # ------------------------------------------------------------------
    def track_masks(self, frames_sam, seg_embeds):
        """SAM-2 video-branch tracking for ONE video (reference
        inference_video_branch, VideoGLaMM.py:770-879): every [SEG] slot is
        an object prompted on frame 0, propagated with memory attention.

        frames_sam: [T, S, S, 3]; seg_embeds: [ms, C].
        Returns low-res mask logits [ms, T, 4E, 4E]."""
        from .sam2.video_predictor import track_video
        feats, pos = self.sam_image_features_chunked(frames_sam)  # [T, ...]
        # features are shared across objects (track_video broadcasts
        # per-object inside its scan — one HBM copy of the pyramid)
        res = track_video(self.sam, feats, pos, seg_embeds[:, None, :])
        return res.low_res_masks

    # ------------------------------------------------------------------
    def __call__(self, frames, context_images, frames_sam, input_ids,
                 text_lens, labels, video_idx, gt_masks,
                 freeze_towers: bool = True, return_pred_masks: bool = False):
        """Training forward (reference model_forward, VideoGLaMM.py:325-558).

        Args:
          frames:         [Bv, T, 224, 224, 3]
          context_images: [Bv, T, 336, 336, 3]
          frames_sam:     [Bv, T_sam, S, S, 3]
          input_ids:      [R, S_text] (one IMAGE_TOKEN_INDEX placeholder/row)
          text_lens:      [R]
          labels:         [R, S_text]
          video_idx:      [R] row -> video slot
          gt_masks:       [R, max_seg, T_sam, h, w] binary with
                          MASK_IGNORE_INDEX padding
        """
        cfg = self.cfg

        if self.is_initializing():
            # touch the full SAM2Base path (memory encoder/attention,
            # obj_ptr_proj, no_mem embeds) so the param tree is complete for
            # the video-branch tracker even though training never runs it
            self.sam(frames_sam[:1, 0],
                     text_inputs=jnp.zeros((1, 1, cfg.sam2.d_model),
                                           jnp.float32))

        visual = self.encode_visual_prefix(frames, context_images)
        sam_feats, _ = self.encode_sam_features(frames_sam)
        if freeze_towers:
            visual = jax.lax.stop_gradient(visual)
            sam_feats = [jax.lax.stop_gradient(f) for f in sam_feats]

        logits, hidden, sp = self.lm_forward(visual, input_ids, text_lens,
                                             labels, video_idx)
        ce = ce_loss_fn(logits, sp.labels, logits.shape[-1])

        seg = self.extract_seg(hidden, sp)
        pred = self.decode_masks(sam_feats, seg, video_idx, training=True)

        # upsample predictions to the gt resolution (the reference
        # postprocesses to each sample's original size, VideoGLaMM.py:497-503;
        # here gt is delivered at one fixed resolution by the data layer)
        R, ms, T = pred.shape[:3]
        h, w = gt_masks.shape[-2:]
        if pred.shape[-2:] != (h, w):
            p = pred.reshape(R * ms * T, *pred.shape[3:])[..., None]
            p = resize_bilinear(p, (h, w))[..., 0]
            pred = p.reshape(R, ms, T, h, w)

        # reference counts every padded slot in num_masks (its gt is padded
        # to max_seg with all-ignore masks, VideoGLaMM.py:529-547)
        num_masks = R * ms * T
        bce = sigmoid_ce_loss(pred, gt_masks).sum() / (num_masks + 1e-8)
        dce = dice_loss(pred, gt_masks).sum() / (num_masks + 1e-8)

        ce_w = cfg.ce_loss_weight * ce
        bce_w = cfg.bce_loss_weight * bce
        dice_w = cfg.dice_loss_weight * dce
        mask_loss = bce_w + dice_w
        return VideoGLaMMOutput(
            loss=ce_w + mask_loss, ce_loss=ce_w, mask_bce_loss=bce_w,
            mask_dice_loss=dice_w, mask_loss=mask_loss,
            pred_masks=pred if return_pred_masks else None)
