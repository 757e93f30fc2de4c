"""End-to-end grounded inference (framewise path).

Behavioral contract from the reference `inference` / `inference_framewise`
(/root/reference/VideoGLaMM/model/VideoGLaMM.py:560-768): encode video ->
generate text with [SEG] tokens -> project [SEG] hidden states ->
prompt-encode + mask-decode every SAM frame independently (no memory
attention) -> per-[SEG] mask tube.

TPU-native redesign: three jitted stages with static shapes —
  1. visual-prefix encode (InternVideo2 chunks + CLIP frames, one call),
  2. prefill + scan decode over a KV cache (generate.py),
  3. batched SAM decode over B*max_seg*T_sam prompts (one decoder call,
     replacing the reference's per-sample per-frame loops).
The video-branch (memory-conditioned propagation) lives in
models/sam2/video_predictor.py.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..models.videoglamm import SegExtraction
from .generate import GenerateResult, generate_with_prefix


class InferenceResult(NamedTuple):
    tokens: jnp.ndarray        # [B, max_new]
    lengths: jnp.ndarray       # [B]
    seg_valid: jnp.ndarray     # [B, max_seg]
    pred_masks: jnp.ndarray    # [B, max_seg, T_sam, 4E, 4E] logits (low-res)


def extract_seg_from_generation(model, params, gen: GenerateResult):
    """First max_seg [SEG] tokens of the generated stream -> prompt
    embeddings (mirrors the training-path extraction; reference
    VideoGLaMM.py:628-657)."""
    cfg = model.cfg
    tokens = gen.tokens
    B, S = tokens.shape
    pos = jnp.arange(S)[None, :]
    is_seg = tokens == cfg.seg_token_idx
    key = jnp.where(is_seg, pos, S + pos)
    idx = jnp.argsort(key, axis=1)[:, :cfg.max_seg_tokens]
    valid = jnp.take_along_axis(is_seg, idx, axis=1)
    h = jnp.take_along_axis(gen.hidden, idx[..., None], axis=1)
    emb = model.apply(
        params, h.astype(jnp.float32),
        method=lambda mdl, x: mdl.text_hidden_fcs(x))
    emb = jnp.where(valid[..., None], emb, 0.0)
    return SegExtraction(embeds=emb, valid=valid, positions=idx)


class GroundedInference:
    """Jitted end-to-end grounded video chat / eval pipeline (framewise)."""

    def __init__(self, model, params, *, max_new_tokens: int = 128,
                 eos_id=None, temperature: float = 0.0, draft_k: int = 0):
        """draft_k >= 2 enables n-gram speculative decoding for greedy
        generation (identical outputs, faster on repetitive grounded
        captions — generate.generate_speculative)."""
        if eos_id is None:
            from .generate import terminators_for
            eos_id = terminators_for(getattr(model.cfg, "llm_type", "phi3"))
        self.model = model
        self.params = params
        self.max_new_tokens = max_new_tokens
        self.eos_id = eos_id
        self.temperature = temperature

        self._encode_visual = jax.jit(
            lambda p, f, c: model.apply(
                p, f, c, method=lambda mdl, a, b: mdl.encode_visual_prefix(a, b)))
        self._encode_sam = jax.jit(
            lambda p, f: model.apply(
                p, f, method=lambda mdl, a: mdl.encode_sam_features(a)))
        self._generate = jax.jit(functools.partial(
            generate_with_prefix, model,
            max_new_tokens=max_new_tokens, eos_id=eos_id,
            temperature=temperature, draft_k=draft_k))
        self._decode_masks = jax.jit(
            lambda p, feats, seg, vidx: model.apply(
                p, feats, seg, vidx,
                method=lambda mdl, f, s, v: mdl.decode_masks(
                    f, s, v, training=False)))
        self._track_masks = jax.jit(
            lambda p, f, s: model.apply(
                p, f, s, method=lambda mdl, a, b: mdl.track_masks(a, b)))
        # batched rows ride a vmap over the per-video tracker (params
        # broadcast): one compiled tracker serves any batch size, so
        # throughput serving (BENCH_BATCH>1) can use the video branch too
        self._track_masks_batch = jax.jit(jax.vmap(
            lambda p, f, s: model.apply(
                p, f, s, method=lambda mdl, a, b: mdl.track_masks(a, b)),
            in_axes=(None, 0, 0)))

    def __call__(self, frames, context_images, frames_sam, input_ids,
                 text_lens, rng: Optional[jax.Array] = None,
                 use_video_branch: bool = False) -> InferenceResult:
        """frames: [B,T,224,224,3]; context: [B,T,336,336,3];
        frames_sam: [B,T_sam,S,S,3]; input_ids: [B,S_text].

        use_video_branch=True runs the SAM-2 memory tracker (reference
        inference_video_branch) instead of independent per-frame decoding."""
        p = self.params
        visual = self._encode_visual(p, frames, context_images)
        gen = self._generate(p, visual, input_ids, text_lens, rng=rng)
        seg = extract_seg_from_generation(self.model, p, gen)
        if use_video_branch:
            if frames_sam.shape[0] == 1:
                masks = self._track_masks(p, frames_sam[0], seg.embeds[0])[
                    None]
            else:
                masks = self._track_masks_batch(p, frames_sam, seg.embeds)
        else:
            sam_feats, _ = self._encode_sam(p, frames_sam)
            vidx = jnp.arange(frames_sam.shape[0], dtype=jnp.int32)
            masks = self._decode_masks(p, sam_feats, seg, vidx)
        masks = jnp.where(seg.valid[:, :, None, None, None], masks, -1e4)
        return InferenceResult(tokens=gen.tokens, lengths=gen.lengths,
                               seg_valid=seg.valid, pred_masks=masks)
