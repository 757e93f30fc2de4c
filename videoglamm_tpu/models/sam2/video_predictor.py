"""SAM-2 video predictor: memory-conditioned mask propagation as one lax.scan.

Behavioral contract from the reference SAM2VideoPredictor + SAM2Base.track_step
(/root/reference/VideoGLaMM/model/segment_anything_2/sam2/
sam2_video_predictor.py:17-1061, modeling/sam2_base.py:495-833), restricted to
the path VideoGLaMM actually drives (inference_video_branch,
model/VideoGLaMM.py:770-879): one `add_new_text` prompt per object on frame 0,
then forward `propagate_in_video`. Per tracked frame t:
- memory bank = cond-frame memory (t_pos=0, tpos index num_maskmem-1) +
  num_maskmem-1 prior non-cond frame memories — the immediately previous
  frame plus every-r-th strided frames (`memory_temporal_stride_for_eval`,
  sam2_base.py:535-559; r=1 means the last num_maskmem-1 frames, frame t-k
  at tpos index k-1) — + object pointers from the cond frame and the last
  max_obj_ptrs_in_encoder-1 frames, each 256-d pointer split into
  C/mem_dim=4 64-d tokens with zero pos (add_tpos_enc_to_obj_ptrs=False)
  (sam2_base.py:519-638);
- memory attention -> SAM heads (multimask + stability fallback, obj-score
  gating) -> encode new memory -> bank update.

TPU-first redesign: the reference keeps per-frame python dicts with
data-dependent memory selection; here the bank is a fixed-shape ring buffer
(memories keyed by frame_idx % num_slots, object pointers likewise) and the
per-frame selection is a static-shape GATHER of the wanted frame indices —
the reference's dict lookups become `held_frame == wanted_frame` validity
masks consumed by the attention kv_mask — so the whole propagation is ONE
compiled `lax.scan` over pre-encoded (batched) frame features. The ring holds
(num_maskmem-2)*r + 1 slots: exactly the window the strided selection can
reach, so distinct wanted frames never collide in a slot.

`reverse=True` mirrors the reference's `track_in_reverse` selection (the
ceil-aligned strided window AFTER the current frame, sam2_base.py:540-559)
for the interactive predictor's backward propagation.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .sam2_base import SAM2Base, SamHeadsOutput


class MemoryBank(NamedTuple):
    cond_mem: jnp.ndarray    # [B, E2, mem_dim]
    cond_ptr: jnp.ndarray    # [B, C]
    mem_ring: jnp.ndarray    # [B, S, E2, mem_dim]   S = (num_maskmem-2)*r + 1
    mem_frame: jnp.ndarray   # [B, S] frame idx held (-1 empty)
    ptr_ring: jnp.ndarray    # [B, P, C]             P = max_obj_ptrs - 1
    ptr_frame: jnp.ndarray   # [B, P] frame idx held (-1 empty)
    spatial_pos: jnp.ndarray  # [E2, mem_dim] sine PE over the memory grid


class TrackResult(NamedTuple):
    low_res_masks: jnp.ndarray   # [B, T, 4E, 4E] logits
    ious: jnp.ndarray            # [B, T]
    object_score_logits: jnp.ndarray  # [B, T]


def _frame_feats(feats, t):
    return [f[:, t] for f in feats]


def num_mem_slots(cfg) -> int:
    """Ring size: the strided selection reaches at most (num_maskmem-2)*r + 1
    frames back (t-1 plus num_maskmem-2 every-r-th frames), so this many slots
    keyed by frame % S hold every reachable frame collision-free."""
    r = cfg.memory_temporal_stride_for_eval
    return max((cfg.num_maskmem - 2) * r + 1, 1)


def init_bank(sam: SAM2Base, B: int, cond_mem, cond_ptr, spatial_pos):
    cfg = sam.cfg
    S = num_mem_slots(cfg)
    P = max(cfg.max_obj_ptrs_in_encoder - 1, 1)
    E2 = cond_mem.shape[1]
    return MemoryBank(
        cond_mem=cond_mem,
        cond_ptr=cond_ptr,
        mem_ring=jnp.zeros((B, S, E2, cfg.mem_dim), jnp.float32),
        mem_frame=jnp.full((B, S), -1, jnp.int32),
        ptr_ring=jnp.zeros((B, P, cond_ptr.shape[-1]), jnp.float32),
        ptr_frame=jnp.full((B, P), -1, jnp.int32),
        spatial_pos=spatial_pos,
    )


def wanted_mem_frames(cfg, t, reverse: bool = False):
    """Absolute frame indices the reference selects for the non-cond memory
    of frame t (sam2_base.py:535-559), in t_rel order [1 .. num_maskmem-1].

    t_rel=1 is the adjacent frame (t-1, or t+1 in reverse); t_rel>=2 walk
    every-r-th frames from the floor- (ceil- in reverse) aligned anchor.
    Returns (want [num_maskmem-1] jnp.int32, t_rel [num_maskmem-1] static)."""
    r = cfg.memory_temporal_stride_for_eval
    rels = np.arange(1, cfg.num_maskmem)                    # static t_rel
    if not reverse:
        anchor = ((t - 2) // r) * r
        strided = anchor - (rels - 2) * r
        adjacent = t - 1
    else:
        anchor = -((-(t + 2)) // r) * r                      # ceil align
        strided = anchor + (rels - 2) * r
        adjacent = t + 1
    want = jnp.where(rels == 1, adjacent, strided)
    return want.astype(jnp.int32), rels


def assemble_memory(sam: SAM2Base, bank: MemoryBank, t, num_frames: int,
                    reverse: bool = False):
    """Build the fixed-shape (memory, pos, kv_mask, n_obj_ptr_tokens) for
    frame t (reference _prepare_memory_conditioned_features,
    sam2_base.py:519-638). Selection is a static gather over the ring; a
    slot is valid iff it actually holds the wanted frame (the reference's
    dict .get returning None -> our kv_mask False)."""
    cfg = sam.cfg
    B, E2, mem_dim = bank.cond_mem.shape
    P = bank.ptr_ring.shape[1]
    C = bank.cond_ptr.shape[-1]
    split = C // mem_dim
    S = bank.mem_ring.shape[1]
    M = cfg.num_maskmem - 1

    tpos = sam.maskmem_tpos_enc[:, 0, :]                     # [num_maskmem, mem_dim]
    sp = bank.spatial_pos                                    # [E2, mem_dim]

    # cond block: t_pos = 0 -> tpos index num_maskmem-1
    cond_pos = sp + tpos[cfg.num_maskmem - 1]

    # non-cond blocks: gather the wanted frames from the ring
    want, rels = wanted_mem_frames(cfg, t, reverse)          # [M]
    slots = want % S
    mem_sel = jnp.take(bank.mem_ring, slots, axis=1)         # [B, M, E2, md]
    held = jnp.take(bank.mem_frame, slots, axis=1)           # [B, M]
    ring_valid = (want >= 0)[None, :] & (held == want[None, :])
    if reverse:
        ring_valid &= (want < num_frames)[None, :]
    # temporal positional encoding: t_rel k -> tpos index k-1 (reference
    # maskmem_tpos_enc[num_maskmem - t_pos - 1] with t_pos = num_maskmem - k)
    ring_pos = sp[None, None] + tpos[rels - 1][None, :, None, :]  # [1,M,E2,md]

    memory = jnp.concatenate(
        [bank.cond_mem[:, None], mem_sel], axis=1)           # [B, M+1, E2, md]
    memory = memory.reshape(B, (M + 1) * E2, mem_dim)
    mem_pos = jnp.concatenate(
        [jnp.broadcast_to(cond_pos, (B, 1, E2, mem_dim)),
         jnp.broadcast_to(ring_pos, (B, M, E2, mem_dim))], axis=1)
    mem_pos = mem_pos.reshape(B, (M + 1) * E2, mem_dim)
    spatial_mask = jnp.concatenate(
        [jnp.ones((B, 1), bool), ring_valid], axis=1)        # [B, M+1]
    spatial_mask = jnp.repeat(spatial_mask, E2, axis=1)

    # object pointers: cond + the last max_obj_ptrs-1 tracked frames, capped
    # by max_obj_ptrs_in_encoder = min(num_frames, cfg.max_obj_ptrs_in_encoder)
    max_ptrs = min(num_frames, cfg.max_obj_ptrs_in_encoder)
    diffs = np.arange(1, P + 1)                              # static t_diff
    want_p = (t + diffs if reverse else t - diffs).astype(jnp.int32)
    slots_p = want_p % P
    ptr_sel = jnp.take(bank.ptr_ring, slots_p, axis=1)       # [B, P, C]
    held_p = jnp.take(bank.ptr_frame, slots_p, axis=1)
    ptr_valid = ((want_p >= 0)[None, :] & (held_p == want_p[None, :])
                 & (diffs <= max_ptrs - 1)[None, :])
    if reverse:
        ptr_valid &= (want_p < num_frames)[None, :]
    ptr_valid = jnp.concatenate([jnp.ones((B, 1), bool), ptr_valid], axis=1)

    ptrs = jnp.concatenate([bank.cond_ptr[:, None], ptr_sel], axis=1)
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
    # prompted frames are (re-)encoded by the predictor's preflight
    # consolidation with is_mask_from_pts=True -> binarized mask when the
    # video-predictor build flag is on (sam2_video_predictor.py:626-632)
    mem, mem_pos = sam.encode_new_memory(
        feats0[-1], heads.high_res_masks.transpose(0, 2, 3, 1),
        heads.object_score_logits,
        binarize=sam.cfg.binarize_mask_from_pts_for_mem_enc)
    bank = init_bank(sam, B, mem, heads.obj_ptr, mem_pos)
    return heads, bank


def track_step(sam: SAM2Base, feats_t, pos_top, bank: MemoryBank, t,
               num_frames: int, reverse: bool = False
               ) -> Tuple[SamHeadsOutput, MemoryBank]:
    """One propagation step at frame t (reference track_step,
    sam2_base.py:706-833). The new memory lands in ring slot t % S
    (t % P for the pointer), read back by frame-equality gathers."""
    cfg = sam.cfg
    B, E = feats_t[-1].shape[0], feats_t[-1].shape[1]
    memory, mem_pos, kv_mask, n_ptr_tokens = assemble_memory(
        sam, bank, t, num_frames, reverse)
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

    S = bank.mem_ring.shape[1]
    P = bank.ptr_ring.shape[1]
    mem_slot = t % S
    ptr_slot = t % P
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
