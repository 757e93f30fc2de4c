"""SAM-2 video predictor: memory-conditioned mask propagation as one lax.scan.

Behavioral contract from the reference SAM2VideoPredictor + SAM2Base.track_step
(/root/reference/VideoGLaMM/model/segment_anything_2/sam2/
sam2_video_predictor.py:17-1061, modeling/sam2_base.py:495-833), restricted to
the path VideoGLaMM actually drives (inference_video_branch,
model/VideoGLaMM.py:770-879): one `add_new_text` prompt per object on frame 0,
then forward `propagate_in_video`. Per tracked frame t:
- memory bank = cond-frame memory (t_pos=0, tpos index num_maskmem-1) +
  the last num_maskmem-1 non-cond frame memories (frame t-k gets tpos index
  k-1), + object pointers from the cond frame and the last
  max_obj_ptrs_in_encoder-1 frames, each 256-d pointer split into
  C/mem_dim=4 64-d tokens with zero pos (add_tpos_enc_to_obj_ptrs=False)
  (sam2_base.py:519-638);
- memory attention -> SAM heads (multimask + stability fallback, obj-score
  gating) -> encode new memory -> bank update.

TPU-first redesign: the reference keeps per-frame python dicts with
data-dependent memory selection; here the bank is a fixed-shape ring buffer
([num_maskmem-1] spatial-memory slots keyed by frame_idx % ring, object
pointers likewise) and invalid slots are handled by the attention kv_mask, so
the whole propagation is ONE compiled `lax.scan` over pre-encoded (batched)
frame features.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .sam2_base import SAM2Base, SamHeadsOutput


class MemoryBank(NamedTuple):
    cond_mem: jnp.ndarray    # [B, E2, mem_dim]
    cond_ptr: jnp.ndarray    # [B, C]
    mem_ring: jnp.ndarray    # [B, R, E2, mem_dim]   R = num_maskmem - 1
    mem_frame: jnp.ndarray   # [B, R] frame idx held (-1 empty)
    ptr_ring: jnp.ndarray    # [B, P, C]             P = max_obj_ptrs - 1
    ptr_frame: jnp.ndarray   # [B, P] frame idx held (-1 empty)
    spatial_pos: jnp.ndarray  # [E2, mem_dim] sine PE over the memory grid


class TrackResult(NamedTuple):
    low_res_masks: jnp.ndarray   # [B, T, 4E, 4E] logits
    ious: jnp.ndarray            # [B, T]
    object_score_logits: jnp.ndarray  # [B, T]


def _frame_feats(feats, t):
    return [f[:, t] for f in feats]


def init_bank(sam: SAM2Base, B: int, cond_mem, cond_ptr, spatial_pos):
    cfg = sam.cfg
    R = cfg.num_maskmem - 1
    P = cfg.max_obj_ptrs_in_encoder - 1
    E2 = cond_mem.shape[1]
    return MemoryBank(
        cond_mem=cond_mem,
        cond_ptr=cond_ptr,
        mem_ring=jnp.zeros((B, R, E2, cfg.mem_dim), jnp.float32),
        mem_frame=jnp.full((B, R), -1, jnp.int32),
        ptr_ring=jnp.zeros((B, P, cond_ptr.shape[-1]), jnp.float32),
        ptr_frame=jnp.full((B, P), -1, jnp.int32),
        spatial_pos=spatial_pos,
    )


def assemble_memory(sam: SAM2Base, bank: MemoryBank, t, num_frames: int):
    """Build the fixed-shape (memory, pos, kv_mask, n_obj_ptr_tokens) for
    frame t (reference _prepare_memory_conditioned_features,
    sam2_base.py:519-638)."""
    cfg = sam.cfg
    B, E2, mem_dim = bank.cond_mem.shape
    R = bank.mem_ring.shape[1]
    P = bank.ptr_ring.shape[1]
    C = bank.cond_ptr.shape[-1]
    split = C // mem_dim

    tpos = sam.maskmem_tpos_enc[:, 0, :]                     # [num_maskmem, mem_dim]
    sp = bank.spatial_pos                                    # [E2, mem_dim]

    # cond block: t_pos = 0 -> tpos index num_maskmem-1
    cond_pos = sp + tpos[cfg.num_maskmem - 1]
    # ring blocks: frame f has age t-f in [1, R]; tpos index age-1
    age = t - bank.mem_frame                                  # [B, R]
    age_c = jnp.clip(age, 1, R)
    ring_pos = sp[None, None] + tpos[age_c - 1][:, :, None, :]  # [B,R,E2,md]
    ring_valid = (bank.mem_frame >= 1) & (age >= 1) & (age <= R)

    memory = jnp.concatenate(
        [bank.cond_mem[:, None], bank.mem_ring], axis=1)      # [B, R+1, E2, md]
    memory = memory.reshape(B, (R + 1) * E2, mem_dim)
    mem_pos = jnp.concatenate(
        [jnp.broadcast_to(cond_pos, (B, 1, E2, mem_dim)), ring_pos], axis=1)
    mem_pos = mem_pos.reshape(B, (R + 1) * E2, mem_dim)
    spatial_mask = jnp.concatenate(
        [jnp.ones((B, 1), bool), ring_valid], axis=1)         # [B, R+1]
    spatial_mask = jnp.repeat(spatial_mask, E2, axis=1)

    # object pointers: cond (t_diff=t) + ring (t_diff = t - f), capped by
    # max_obj_ptrs_in_encoder = min(num_frames, cfg.max_obj_ptrs_in_encoder)
    max_ptrs = min(num_frames, cfg.max_obj_ptrs_in_encoder)
    ptrs = jnp.concatenate([bank.cond_ptr[:, None], bank.ptr_ring], axis=1)
    p_age = t - bank.ptr_frame
    ptr_valid = (bank.ptr_frame >= 1) & (p_age >= 1) & (p_age <= max_ptrs - 1)
    ptr_valid = jnp.concatenate([jnp.ones((B, 1), bool), ptr_valid], axis=1)

    ptr_tokens = ptrs.reshape(B, (P + 1) * split, mem_dim)
    ptr_mask = jnp.repeat(ptr_valid, split, axis=1)
    ptr_pos = jnp.zeros_like(ptr_tokens)

    memory = jnp.concatenate([memory, ptr_tokens], axis=1)
    mem_pos = jnp.concatenate([mem_pos, ptr_pos], axis=1)
    kv_mask = jnp.concatenate([spatial_mask, ptr_mask], axis=1)
    return memory, mem_pos, kv_mask, (P + 1) * split


def track_init_frame(sam: SAM2Base, feats0, pos0, text_embeds
                     ) -> Tuple[SamHeadsOutput, MemoryBank]:
    """Frame-0 conditioning step: no-mem features + text prompt + memory
    encode (reference add_new_text -> track_step(is_init_cond_frame=True) +
    propagate preflight, sam2_video_predictor.py:415-495,675-742).

    feats0: 3 levels [B, h, w, c] (already conv_s0/s1-projected);
    text_embeds: [B, N, C]."""
    B = feats0[-1].shape[0]
    E = feats0[-1].shape[1]
    embed = feats0[-1] + sam.no_mem_embed.reshape(1, 1, 1, -1).astype(
        feats0[-1].dtype)
    heads = sam.forward_sam_heads(
        embed, text_inputs=text_embeds,
        high_res_features=(feats0[0], feats0[1]),
        multimask_output=sam.cfg.multimask_output_in_sam)
    mem, mem_pos = sam.encode_new_memory(
        feats0[-1], heads.high_res_masks.transpose(0, 2, 3, 1),
        heads.object_score_logits)
    bank = init_bank(sam, B, mem, heads.obj_ptr, mem_pos)
    return heads, bank


def track_step(sam: SAM2Base, feats_t, pos_top, bank: MemoryBank, t,
               num_frames: int) -> Tuple[SamHeadsOutput, MemoryBank]:
    """One propagation step at frame t >= 1 (reference track_step,
    sam2_base.py:706-833)."""
    cfg = sam.cfg
    B, E = feats_t[-1].shape[0], feats_t[-1].shape[1]
    memory, mem_pos, kv_mask, n_ptr_tokens = assemble_memory(
        sam, bank, t, num_frames)
    cond_feat = sam.condition_features(
        feats_t[-1], jnp.broadcast_to(pos_top, feats_t[-1].shape),
        memory, mem_pos, n_ptr_tokens, kv_mask,
        jnp.ones((B,), bool))
    heads = sam.forward_sam_heads(
        cond_feat, high_res_features=(feats_t[0], feats_t[1]),
        multimask_output=cfg.multimask_output_for_tracking)
    mem, _ = sam.encode_new_memory(
        feats_t[-1], heads.high_res_masks.transpose(0, 2, 3, 1),
        heads.object_score_logits)

    R = bank.mem_ring.shape[1]
    P = bank.ptr_ring.shape[1]
    mem_slot = (t - 1) % R
    ptr_slot = (t - 1) % P
    bank = bank._replace(
        mem_ring=bank.mem_ring.at[:, mem_slot].set(mem),
        mem_frame=bank.mem_frame.at[:, mem_slot].set(t),
        ptr_ring=bank.ptr_ring.at[:, ptr_slot].set(heads.obj_ptr),
        ptr_frame=bank.ptr_frame.at[:, ptr_slot].set(t),
    )
    return heads, bank


def track_video(sam: SAM2Base, feats, pos, text_embeds) -> TrackResult:
    """Full video propagation as one scan.

    feats: 3 levels [T, h, w, c] from SAM2Base.forward_image over the video's
    frames — carried ONCE, not per object (the reference shares image
    features across its per-object loop, VideoGLaMM.py:834-877; the
    per-object broadcast happens inside the scan body where XLA fuses it,
    so HBM holds one copy of the pyramid instead of num_objects copies);
    pos: per-level [h, w, c]; text_embeds: [B, N, C] — one [SEG] prompt per
    tracked object (B = num objects).

    Returns per-frame low-res mask logits [B, T, 4E, 4E]."""
    T = feats[0].shape[0]
    B = text_embeds.shape[0]

    def per_obj(level_t):
        return jnp.broadcast_to(level_t[None], (B,) + level_t.shape)

    heads0, bank = track_init_frame(
        sam, [per_obj(f[0]) for f in feats], pos[-1], text_embeds)

    # lax.scan over frames 1..T-1; the SHARED frame features are the
    # scanned-over inputs
    xs = ([f[1:] for f in feats], jnp.arange(1, T))

    def body(bank, x):
        fts, t = x
        heads, bank = track_step(sam, [per_obj(f) for f in fts], pos[-1],
                                 bank, t, T)
        return bank, (heads.low_res_masks[:, 0], heads.ious.max(-1),
                      heads.object_score_logits[:, 0])

    bank, (masks, ious, scores) = jax.lax.scan(body, bank, xs)

    low = jnp.concatenate(
        [heads0.low_res_masks[:, 0][:, None], jnp.moveaxis(masks, 0, 1)],
        axis=1)
    iou = jnp.concatenate(
        [heads0.ious.max(-1, keepdims=True), jnp.moveaxis(ious, 0, 1)], axis=1)
    sc = jnp.concatenate(
        [heads0.object_score_logits[:, :1], jnp.moveaxis(scores, 0, 1)],
        axis=1)
    return TrackResult(low_res_masks=low, ious=iou, object_score_logits=sc)
