"""Interactive SAM-2 video predictor: point/box/mask/text prompts at
arbitrary frames, bidirectional propagation, fixed shapes throughout.

Behavioral contract from the reference SAM2VideoPredictor
(/root/reference/VideoGLaMM/model/segment_anything_2/sam2/
sam2_video_predictor.py):
- `add_new_points` / `add_new_mask` / `add_new_text` (:252-495): a prompt on
  a not-yet-tracked frame is an *initial conditioning* frame (no-memory
  features, like SAM on an image); a prompt on an already-tracked frame is a
  *refinement* (memory-conditioned features + the clicks + the previously
  predicted mask logits clamped to +-32, stored as a NON-cond output since
  add_all_frames_to_correct_as_cond=False).
- `propagate_in_video_preflight` (:675-742): prompted frames' memories are
  encoded from the consolidated masks with is_mask_from_pts=True — the
  binarize path when the video-predictor build flag is on — and objects
  missing on a prompted frame get NO_OBJ_SCORE placeholder masks and an
  empty-mask object pointer (_consolidate_temp_output_across_obj:520-638,
  _get_empty_mask_ptr:640-673).
- `propagate_in_video` (:744-827): frames processed from the start frame
  forward or backward; consolidated (prompted) frames are skipped and their
  stored outputs yielded.
- memory selection per tracked frame (modeling/sam2_base.py:519-638):
  up to `max_cond_frames_in_attn` temporally closest cond frames (always
  including the closest before and the closest at-or-after,
  sam2_utils.py:15-57), the strided non-cond window, object pointers from
  the selected *past* cond frames (only_obj_ptrs_in_the_past_for_eval=True)
  plus the last max_obj_ptrs-1 frames; unselected cond frames are attended
  as if non-cond when they fall inside either window.

TPU-first redesign: the reference keeps per-frame python dicts (unbounded,
data-dependent); here the session state is a fixed-shape `InteractiveBank`
— K static cond slots and a FULL-RETENTION per-frame memory bank (slot ==
frame index, matching the reference's keep-everything dicts, unlike the
production text path's small ring in video_predictor.py) — and every
selection is a static gather with `held == wanted` / rank-based validity
masks consumed by the attention kv_mask. Propagation compiles to ONE
`lax.scan` over all T frames with a dynamic [start, end] active window, so
any start frame / direction reuses one compiled program.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .sam2_base import NO_OBJ_SCORE, SAM2Base, SamHeadsOutput
from .video_predictor import wanted_mem_frames


class InteractiveBank(NamedTuple):
    cond_mem: jnp.ndarray    # [B, K, E2, mem_dim]
    cond_ptr: jnp.ndarray    # [B, K, C]
    cond_frame: jnp.ndarray  # [K] int32 frame idx (-1 empty)
    mem_ring: jnp.ndarray    # [B, T, E2, mem_dim]  slot == frame idx
    mem_frame: jnp.ndarray   # [T] int32 (== t when frame t holds memory)
    ptr_ring: jnp.ndarray    # [B, T, C]
    ptr_frame: jnp.ndarray   # [T]
    spatial_pos: jnp.ndarray  # [E2, mem_dim]


class PropagateResult(NamedTuple):
    low_res_masks: jnp.ndarray        # [B, T, 4E, 4E] full timeline
    object_score_logits: jnp.ndarray  # [B, T]


def init_interactive_bank(sam: SAM2Base, B: int, T: int,
                          max_cond_frames: int = 8) -> InteractiveBank:
    """Empty session state (reference init_state, sam2_video_predictor.py:
    40-121). K = max_cond_frames bounds how many distinct frames can carry
    prompts (the reference is unbounded; 8 covers interactive use)."""
    cfg = sam.cfg
    E2 = (cfg.image_size // cfg.backbone_stride) ** 2
    C = cfg.d_model
    return InteractiveBank(
        cond_mem=jnp.zeros((B, max_cond_frames, E2, cfg.mem_dim),
                           jnp.float32),
        cond_ptr=jnp.zeros((B, max_cond_frames, C), jnp.float32),
        cond_frame=jnp.full((max_cond_frames,), -1, jnp.int32),
        mem_ring=jnp.zeros((B, T, E2, cfg.mem_dim), jnp.float32),
        mem_frame=jnp.full((T,), -1, jnp.int32),
        ptr_ring=jnp.zeros((B, T, C), jnp.float32),
        ptr_frame=jnp.full((T,), -1, jnp.int32),
        spatial_pos=jnp.zeros((E2, cfg.mem_dim), jnp.float32),
    )


def select_cond_frames(cond_frame, t, cap: int):
    """Static-shape select_closest_cond_frames (reference
    sam2_utils.py:15-57): always keep the closest cond frame before t and
    the closest at-or-after t, then fill to `cap` by |frame - t| (ties ->
    smaller frame). Returns selected [K] bool; cap=-1 selects every valid
    slot."""
    valid = cond_frame >= 0
    K = cond_frame.shape[0]
    if cap == -1 or cap >= K:
        return valid
    f = cond_frame
    big = jnp.int32(2 ** 30)
    before = valid & (f < t)
    after = valid & (f >= t)
    best_before = jnp.max(jnp.where(before, f, -big))
    best_after = jnp.min(jnp.where(after, f, big))
    forced = (before & (f == best_before)) | (after & (f == best_after))
    key = jnp.abs(f - t) * jnp.int32(65536) + f
    key = jnp.where(valid & ~forced, key, big)
    rank = jnp.argsort(jnp.argsort(key))
    num_remain = jnp.maximum(cap - jnp.sum(forced.astype(jnp.int32)), 0)
    return forced | (valid & ~forced & (rank < num_remain))


def assemble_memory_interactive(sam: SAM2Base, bank: InteractiveBank, t,
                                num_frames: int, reverse: bool = False):
    """Fixed-shape (memory, pos, kv_mask, n_obj_ptr_tokens) for frame t with
    MULTIPLE cond frames (reference _prepare_memory_conditioned_features,
    sam2_base.py:519-638). Layout: [K cond blocks ; num_maskmem-1 non-cond
    blocks ; (K + max_obj_ptrs-1) pointer groups] — attention is
    permutation-invariant over kv given each token's own pos embedding, so
    only the SET of (token, pos, validity) must match the reference."""
    cfg = sam.cfg
    B, K, E2, mem_dim = bank.cond_mem.shape
    T = bank.mem_ring.shape[1]
    C = bank.cond_ptr.shape[-1]
    split = C // mem_dim
    M = cfg.num_maskmem - 1
    P = max(cfg.max_obj_ptrs_in_encoder - 1, 1)

    tpos = sam.maskmem_tpos_enc[:, 0, :]        # [num_maskmem, mem_dim]
    sp = bank.spatial_pos                        # [E2, mem_dim]

    selected = select_cond_frames(bank.cond_frame, t,
                                  cfg.max_cond_frames_in_attn)   # [K]
    cond_valid = bank.cond_frame >= 0
    unselected = cond_valid & ~selected

    # --- spatial memory: K cond blocks (t_pos=0 -> tpos[num_maskmem-1]) ---
    cond_pos = sp + tpos[cfg.num_maskmem - 1]    # [E2, mem_dim]

    # --- non-cond blocks: gather wanted frames from the per-frame bank,
    # falling back to UNSELECTED cond frames inside the window (the
    # reference attends those as if non-cond, sam2_base.py:562-566) ---
    want, rels = wanted_mem_frames(cfg, t, reverse)              # [M]
    in_range = (want >= 0) & (want < T)
    slots = jnp.clip(want, 0, T - 1)
    ring_sel = jnp.take(bank.mem_ring, slots, axis=1)            # [B,M,E2,md]
    held = jnp.take(bank.mem_frame, slots)                       # [M]
    ring_valid = in_range & (held == want)
    cmatch = (bank.cond_frame[None, :] == want[:, None]) & \
        unselected[None, :]                                      # [M, K]
    has_cmatch = cmatch.any(axis=1) & in_range
    cidx = jnp.argmax(cmatch, axis=1)                            # [M]
    cond_pick = jnp.take(bank.cond_mem, cidx, axis=1)            # [B,M,E2,md]
    mem_sel = jnp.where(has_cmatch[None, :, None, None], cond_pick, ring_sel)
    noncond_valid = ring_valid | has_cmatch
    ring_pos = sp[None, None] + tpos[rels - 1][None, :, None, :]  # [1,M,E2,md]

    memory = jnp.concatenate([bank.cond_mem, mem_sel], axis=1)
    memory = memory.reshape(B, (K + M) * E2, mem_dim)
    mem_pos = jnp.concatenate(
        [jnp.broadcast_to(cond_pos, (B, K, E2, mem_dim)),
         jnp.broadcast_to(ring_pos, (B, M, E2, mem_dim))], axis=1)
    mem_pos = mem_pos.reshape(B, (K + M) * E2, mem_dim)
    spatial_mask = jnp.concatenate(
        [jnp.broadcast_to(selected[None], (B, K)),
         jnp.broadcast_to(noncond_valid[None], (B, M))], axis=1)
    spatial_mask = jnp.repeat(spatial_mask, E2, axis=1)

    # --- object pointers: selected *past* cond frames
    # (only_obj_ptrs_in_the_past_for_eval=true, sam2_hiera_l.yaml:105) plus
    # the last max_obj_ptrs-1 frames, with unselected-cond fallback ---
    max_ptrs = min(num_frames, cfg.max_obj_ptrs_in_encoder)
    f = bank.cond_frame
    past = (f >= t) if reverse else (f <= t)
    cond_ptr_valid = selected & past                             # [K]

    diffs = np.arange(1, P + 1)
    want_p = (t + diffs if reverse else t - diffs).astype(jnp.int32)
    in_range_p = (want_p >= 0) & (want_p < T)
    slots_p = jnp.clip(want_p, 0, T - 1)
    ptr_sel = jnp.take(bank.ptr_ring, slots_p, axis=1)           # [B, P, C]
    held_p = jnp.take(bank.ptr_frame, slots_p)
    ring_p_valid = in_range_p & (held_p == want_p)
    pmatch = (f[None, :] == want_p[:, None]) & unselected[None, :]
    has_pmatch = pmatch.any(axis=1) & in_range_p
    pidx = jnp.argmax(pmatch, axis=1)
    cond_ptr_pick = jnp.take(bank.cond_ptr, pidx, axis=1)        # [B, P, C]
    ptr_sel = jnp.where(has_pmatch[None, :, None], cond_ptr_pick, ptr_sel)
    noncond_ptr_valid = (ring_p_valid | has_pmatch) & \
        (diffs <= max_ptrs - 1)

    ptr_valid = jnp.concatenate(
        [jnp.broadcast_to(cond_ptr_valid[None], (B, K)),
         jnp.broadcast_to(noncond_ptr_valid[None], (B, P))], axis=1)
    ptrs = jnp.concatenate([bank.cond_ptr, ptr_sel], axis=1)     # [B,K+P,C]
    ptr_tokens = ptrs.reshape(B, (K + P) * split, mem_dim)
    ptr_mask = jnp.repeat(ptr_valid, split, axis=1)
    ptr_pos = jnp.zeros_like(ptr_tokens)  # add_tpos_enc_to_obj_ptrs=False

    memory = jnp.concatenate([memory, ptr_tokens], axis=1)
    mem_pos = jnp.concatenate([mem_pos, ptr_pos], axis=1)
    kv_mask = jnp.concatenate([spatial_mask, ptr_mask], axis=1)
    return memory, mem_pos, kv_mask, (K + P) * split


def apply_non_overlapping_constraints(pred_masks):
    """Keep only the highest-scoring object at each spatial location across
    the leading OBJECT axis, clamping suppressed scores to <= -10
    (sigmoid(-10) ~ 4.5e-5) — reference _apply_non_overlapping_constraints
    (sam2_base.py:815-833). Single-object input returns unchanged."""
    B = pred_masks.shape[0]
    if B == 1:
        return pred_masks
    max_idx = jnp.argmax(pred_masks, axis=0, keepdims=True)
    keep = max_idx == jnp.arange(B).reshape(
        (B,) + (1,) * (pred_masks.ndim - 1))
    return jnp.where(keep, pred_masks, jnp.minimum(pred_masks, -10.0))


def clear_non_cond_mem_around(cfg, bank: InteractiveBank, t):
    """Invalidate non-cond memories (and their object pointers) within
    +-(memory_temporal_stride_for_eval * num_maskmem) frames of t —
    reference _clear_non_cond_mem_around_input
    (sam2_video_predictor.py:1044-1061). The window is INCLUSIVE of t
    itself: a refinement's own just-written non-cond output is popped too,
    exactly as the reference pops every t in [begin, end]. Cond-slot
    memories are untouched (the reference only pops non_cond_frame_outputs).
    Ring contents stay in place; validity lives in the frame indices."""
    T = bank.mem_frame.shape[0]
    w = cfg.memory_temporal_stride_for_eval * cfg.num_maskmem
    idx = jnp.arange(T)
    inwin = (idx >= t - w) & (idx <= t + w)
    return bank._replace(
        mem_frame=jnp.where(inwin, -1, bank.mem_frame),
        ptr_frame=jnp.where(inwin, -1, bank.ptr_frame))


def _use_multimask(cfg, is_init: bool, num_pts: int) -> bool:
    """Reference _use_multimask (sam2_base.py:806-814); num_pts is static
    here (prompt arrays are fixed-shape, padding labels count)."""
    return (cfg.multimask_output_in_sam
            and (is_init or cfg.multimask_output_for_tracking)
            and cfg.multimask_min_pt_num <= num_pts
            <= cfg.multimask_max_pt_num)


def empty_mask_ptr(sam: SAM2Base, feats_t) -> jnp.ndarray:
    """Object pointer from an empty mask on this frame — the placeholder the
    consolidation gives objects without a prompt on a prompted frame
    (reference _get_empty_mask_ptr, sam2_video_predictor.py:640-673)."""
    B = feats_t[-1].shape[0]
    S = sam.cfg.image_size
    heads = sam.use_mask_as_output(
        feats_t[-1], (feats_t[0], feats_t[1]),
        jnp.zeros((B, S, S, 1), jnp.float32))
    return heads.obj_ptr


def _merge_placeholder(sam: SAM2Base, heads: SamHeadsOutput, feats_t,
                       active) -> SamHeadsOutput:
    """Objects not being prompted on this frame get NO_OBJ_SCORE masks and
    the empty-mask pointer (reference consolidation,
    sam2_video_predictor.py:560-597)."""
    if active is None:
        return heads
    a = active[:, None, None, None]
    low = jnp.where(a, heads.low_res_masks, NO_OBJ_SCORE)
    high = jnp.where(a, heads.high_res_masks, NO_OBJ_SCORE)
    ptr = jnp.where(active[:, None], heads.obj_ptr,
                    empty_mask_ptr(sam, feats_t))
    return heads._replace(low_res_masks=low, high_res_masks=high,
                          obj_ptr=ptr)


def _write_prompt_output(sam: SAM2Base, bank: InteractiveBank, t, feats_t,
                         heads: SamHeadsOutput, cond_slot: Optional[int]):
    """Encode the prompted frame's memory (preflight consolidation:
    is_mask_from_pts=True for every user-prompted frame -> binarize when the
    build flag is on) and store it in a cond slot (fresh prompt) or the
    frame's own non-cond slot (refinement click on a tracked frame).

    The consolidation re-derives the high-res mask by interpolating the
    LOW-res prediction back up (sam2_video_predictor.py:618-624) — for mask
    prompts that down-then-up smooths the crisp use_mask_as_output edges
    before the binarize, so we must do the same rather than reuse
    heads.high_res_masks."""
    from ...ops.resize import resize_bilinear
    S = sam.cfg.image_size
    high = resize_bilinear(heads.low_res_masks.transpose(0, 2, 3, 1), (S, S))
    mem, mem_pos = sam.encode_new_memory(
        feats_t[-1], high, heads.object_score_logits,
        binarize=sam.cfg.binarize_mask_from_pts_for_mem_enc)
    bank = bank._replace(spatial_pos=mem_pos)
    if cond_slot is not None:
        return bank._replace(
            cond_mem=bank.cond_mem.at[:, cond_slot].set(mem),
            cond_ptr=bank.cond_ptr.at[:, cond_slot].set(heads.obj_ptr),
            cond_frame=bank.cond_frame.at[cond_slot].set(t),
        )
    return bank._replace(
        mem_ring=bank.mem_ring.at[:, t].set(mem),
        mem_frame=bank.mem_frame.at[t].set(t),
        ptr_ring=bank.ptr_ring.at[:, t].set(heads.obj_ptr),
        ptr_frame=bank.ptr_frame.at[t].set(t),
    )


def add_point_prompt(sam: SAM2Base, feats_t, pos_top, bank: InteractiveBank,
                     t, coords, labels, num_frames: int,
                     cond_slot: Optional[int] = None,
                     prev_mask_logits=None, reverse: bool = False,
                     active=None) -> Tuple[SamHeadsOutput, InteractiveBank]:
    """Click prompt on frame t (reference add_new_points,
    sam2_video_predictor.py:252-330). cond_slot set = fresh (init-cond)
    frame -> SAM-style no-memory decode; cond_slot None = refinement on an
    already-tracked frame -> memory-conditioned decode, output stored as
    non-cond. prev_mask_logits [B, 4E, 4E, 1] are the frame's previous
    predictions fed back with the clicks (clamped to +-32, :293-296).

    coords [B, N, 2] pixel xy, labels [B, N] (1 pos / 0 neg / -1 pad);
    active [B] bool or None — objects not prompted here get the
    consolidation placeholder."""
    cfg = sam.cfg
    is_init = cond_slot is not None
    if is_init:
        feat = feats_t[-1] + sam.no_mem_embed.reshape(1, 1, 1, -1).astype(
            feats_t[-1].dtype)
    else:
        memory, mem_pos, kv_mask, n_ptr = assemble_memory_interactive(
            sam, bank, t, num_frames, reverse)
        B = feats_t[-1].shape[0]
        feat = sam.condition_features(
            feats_t[-1], jnp.broadcast_to(pos_top, feats_t[-1].shape),
            memory, mem_pos, n_ptr, kv_mask, jnp.ones((B,), bool))
    mask_in = None
    if prev_mask_logits is not None:
        mask_in = jnp.clip(prev_mask_logits, -32.0, 32.0)
    heads = sam.forward_sam_heads(
        feat, point_inputs=(coords, labels), mask_inputs=mask_in,
        high_res_features=(feats_t[0], feats_t[1]),
        multimask_output=_use_multimask(cfg, is_init, labels.shape[1]))
    heads = _merge_placeholder(sam, heads, feats_t, active)
    bank = _write_prompt_output(sam, bank, t, feats_t, heads, cond_slot)
    return heads, bank


def add_box_prompt(sam: SAM2Base, feats_t, pos_top, bank, t, boxes,
                   num_frames: int, cond_slot: Optional[int] = None,
                   reverse: bool = False, active=None):
    """Box prompt as two labeled corner points (labels 2/3 — the SAM box
    convention the prompt encoder implements, prompt_encoder.py:73-78)."""
    B = boxes.shape[0]
    coords = boxes.reshape(B, 2, 2)
    labels = jnp.tile(jnp.array([[2, 3]], jnp.int32), (B, 1))
    return add_point_prompt(sam, feats_t, pos_top, bank, t, coords, labels,
                            num_frames, cond_slot=cond_slot, reverse=reverse,
                            active=active)


def add_mask_prompt(sam: SAM2Base, feats_t, bank: InteractiveBank, t, masks,
                    cond_slot: Optional[int] = None, active=None
                    ) -> Tuple[SamHeadsOutput, InteractiveBank]:
    """Binary mask prompt on frame t (reference add_new_mask, :332-414).
    With use_mask_input_as_output_without_sam=True (sam2_hiera_l.yaml:93)
    the mask IS the output — no memory conditioning, no decoder
    (sam2_base.py:737-745). masks: [B, S, S, 1] in {0, 1}."""
    heads = sam.use_mask_as_output(
        feats_t[-1], (feats_t[0], feats_t[1]), masks)
    heads = _merge_placeholder(sam, heads, feats_t, active)
    bank = _write_prompt_output(sam, bank, t, feats_t, heads, cond_slot)
    return heads, bank


def add_text_prompt(sam: SAM2Base, feats_t, pos_top, bank: InteractiveBank,
                    t, text_embeds, num_frames: int,
                    cond_slot: Optional[int] = None,
                    reverse: bool = False, active=None
                    ) -> Tuple[SamHeadsOutput, InteractiveBank]:
    """[SEG]-embedding prompt on frame t (reference add_new_text, :415-495
    — the VideoGLaMM production prompt, generalized here to any frame)."""
    cfg = sam.cfg
    is_init = cond_slot is not None
    if is_init:
        feat = feats_t[-1] + sam.no_mem_embed.reshape(1, 1, 1, -1).astype(
            feats_t[-1].dtype)
    else:
        memory, mem_pos, kv_mask, n_ptr = assemble_memory_interactive(
            sam, bank, t, num_frames, reverse)
        B = feats_t[-1].shape[0]
        feat = sam.condition_features(
            feats_t[-1], jnp.broadcast_to(pos_top, feats_t[-1].shape),
            memory, mem_pos, n_ptr, kv_mask, jnp.ones((B,), bool))
    heads = sam.forward_sam_heads(
        feat, text_inputs=text_embeds,
        high_res_features=(feats_t[0], feats_t[1]),
        multimask_output=_use_multimask(cfg, is_init, 0))
    heads = _merge_placeholder(sam, heads, feats_t, active)
    bank = _write_prompt_output(sam, bank, t, feats_t, heads, cond_slot)
    return heads, bank


def propagate(sam: SAM2Base, feats, pos, bank: InteractiveBank, start,
              num_frames: int, reverse: bool = False, end=None,
              pinned=None, init_masks=None, init_scores=None,
              clear_non_cond: bool = False
              ) -> Tuple[PropagateResult, InteractiveBank]:
    """Propagate through the video from `start` (reference
    propagate_in_video, sam2_video_predictor.py:744-827) as ONE lax.scan
    over all T frames with a dynamic active window — any (start, end,
    prompt layout) reuses the same compiled program.

    feats: 3 levels [T, h, w, c] shared across objects; start/end: dynamic
    scalars (end defaults to the video edge); pinned: [T] bool — frames
    whose outputs were consolidated from user prompts, skipped like the
    reference's consolidated_frame_inds (cond frames are derived from the
    bank and always skipped); init_masks [B, T, 4E, 4E] / init_scores
    [B, T]: the timeline so far (stored prompt outputs and earlier
    propagation results) — returned unchanged outside the active window."""
    cfg = sam.cfg
    T = feats[0].shape[0]
    B = bank.cond_mem.shape[0]
    if end is None:
        end = 0 if reverse else T - 1
    if pinned is None:
        pinned = jnp.zeros((T,), bool)
    if init_masks is None:
        E4 = 4 * (cfg.image_size // cfg.backbone_stride)
        init_masks = jnp.full((B, T, E4, E4), NO_OBJ_SCORE, jnp.float32)
    if init_scores is None:
        init_scores = jnp.zeros((B, T), jnp.float32)

    order = np.arange(T)[::-1] if reverse else np.arange(T)
    xs = ([jnp.take(f, order, axis=0) for f in feats], jnp.asarray(order),
          jnp.take(pinned, order),
          jnp.moveaxis(jnp.take(init_masks, order, axis=1), 1, 0),
          jnp.take(init_scores, jnp.asarray(order), axis=1).T)

    def per_obj(level_t):
        return jnp.broadcast_to(level_t[None], (B,) + level_t.shape)

    def body(bank, x):
        fts_raw, t, pin, init_m, init_s = x
        fts = [per_obj(f) for f in fts_raw]
        active = (t <= start) & (t >= end) if reverse else \
            (t >= start) & (t <= end)
        is_cond = jnp.any(bank.cond_frame == t)
        run = active & ~is_cond & ~pin
        if clear_non_cond:
            # visiting a cond frame in processing order drops the stale
            # non-cond memories around it before later frames read them
            # (reference propagate_in_video, :762-796)
            cleared = clear_non_cond_mem_around(cfg, bank, t)
            do = is_cond & active
            bank = bank._replace(
                mem_frame=jnp.where(do, cleared.mem_frame, bank.mem_frame),
                ptr_frame=jnp.where(do, cleared.ptr_frame, bank.ptr_frame))

        memory, mem_pos, kv_mask, n_ptr = assemble_memory_interactive(
            sam, bank, t, num_frames, reverse)
        cond_feat = sam.condition_features(
            fts[-1], jnp.broadcast_to(pos[-1], fts[-1].shape),
            memory, mem_pos, n_ptr, kv_mask, jnp.ones((B,), bool))
        heads = sam.forward_sam_heads(
            cond_feat, high_res_features=(fts[0], fts[1]),
            multimask_output=cfg.multimask_output_for_tracking)
        mem, _ = sam.encode_new_memory(
            fts[-1], heads.high_res_masks.transpose(0, 2, 3, 1),
            heads.object_score_logits)

        bank = bank._replace(
            mem_ring=bank.mem_ring.at[:, t].set(
                jnp.where(run, mem, bank.mem_ring[:, t])),
            mem_frame=bank.mem_frame.at[t].set(
                jnp.where(run, t, bank.mem_frame[t])),
            ptr_ring=bank.ptr_ring.at[:, t].set(
                jnp.where(run, heads.obj_ptr, bank.ptr_ring[:, t])),
            ptr_frame=bank.ptr_frame.at[t].set(
                jnp.where(run, t, bank.ptr_frame[t])),
        )
        out_m = jnp.where(run, heads.low_res_masks[:, 0], init_m)
        out_s = jnp.where(run, heads.object_score_logits[:, 0], init_s)
        return bank, (out_m, out_s)

    bank, (masks, scores) = jax.lax.scan(body, bank, xs)
    inv = np.argsort(order)
    masks = jnp.moveaxis(masks, 0, 1)[:, inv]
    scores = scores.T[:, inv]
    return PropagateResult(masks, scores), bank


class SAM2InteractivePredictor:
    """Stateful session mirroring the reference SAM2VideoPredictor's user
    API (init_state / add_new_points / add_new_box / add_new_mask /
    add_new_text / propagate_in_video / reset_state) over the functional
    fixed-shape core above. Host-side bookkeeping (which frames are cond,
    which were tracked, which are pinned) stays in Python — it is the
    reference's inference_state dict — while all tensor state lives in the
    InteractiveBank on device.

    Prompts apply to all `num_objects` rows at once; pass `active` to
    prompt a subset (others get the reference's consolidation placeholder).
    """

    def __init__(self, model: SAM2Base, params, frames,
                 num_objects: int = 1, max_cond_frames: int = 8,
                 non_overlap_masks: bool = False,
                 clear_non_cond_mem_around_input: bool = False,
                 clear_non_cond_mem_for_multi_obj: bool = False):
        """frames: [T, S, S, 3] SAM-normalized (data/preprocess.py or
        ops/preprocess.py). Features for ALL frames are encoded once up
        front (the reference decodes+encodes lazily per frame; one batch
        encode is the TPU-friendly layout for propagation-heavy use).

        The three config edges mirror SAM2VideoPredictor.__init__
        (sam2_video_predictor.py:22-36, default off there too):
        non_overlap_masks applies the per-pixel winner-takes-all constraint
        in to_video_res; clear_non_cond_mem_around_input drops stale
        non-cond memories around prompted frames (single-object only,
        unless clear_non_cond_mem_for_multi_obj)."""
        self.model = model
        self.params = params
        self.B = num_objects
        self.non_overlap_masks = non_overlap_masks
        self._clear_mem = clear_non_cond_mem_around_input and (
            clear_non_cond_mem_for_multi_obj or num_objects <= 1)
        self.T = int(frames.shape[0])
        self._jit_cache = {}
        feats, pos = jax.jit(lambda p, a: model.apply(
            p, a, method=lambda mdl, x: mdl.forward_image(x)))(
            params, jnp.asarray(frames))
        self.feats, self.pos = feats, pos
        self.reset_state(max_cond_frames)

    def _jit(self, kind: str, **static):
        """One compiled program per (op, static-config); frame index, bank,
        prompts etc. stay dynamic so repeated interactions never retrace."""
        key = (kind,) + tuple(sorted(static.items()))
        fn = self._jit_cache.get(key)
        if fn is not None:
            return fn
        model, T = self.model, self.T

        if kind in ("point", "text"):
            core = add_point_prompt if kind == "point" else add_text_prompt

            def raw(params, feats_t, pos_top, bank, t, prompt, prev, active):
                def m(mdl):
                    kw = dict(cond_slot=static["cond_slot"],
                              reverse=static["reverse"],
                              active=active if static["has_active"] else None)
                    if kind == "point":
                        kw["prev_mask_logits"] = \
                            prev if static["has_prev"] else None
                        return core(mdl, feats_t, pos_top, bank, t,
                                    prompt[0], prompt[1], T, **kw)
                    return core(mdl, feats_t, pos_top, bank, t, prompt, T,
                                **kw)
                return model.apply(params, method=m)
        elif kind == "mask":
            def raw(params, feats_t, pos_top, bank, t, prompt, prev, active):
                return model.apply(params, method=lambda mdl: add_mask_prompt(
                    mdl, feats_t, bank, t, prompt,
                    cond_slot=static["cond_slot"],
                    active=active if static["has_active"] else None))
        elif kind == "propagate":
            def raw(params, feats, pos, bank, start, end, pinned, init_m):
                return model.apply(params, method=lambda mdl: propagate(
                    mdl, feats, pos, bank, start, T,
                    reverse=static["reverse"], end=end, pinned=pinned,
                    init_masks=init_m,
                    clear_non_cond=static.get("clear", False)))
        else:
            raise ValueError(kind)
        fn = jax.jit(raw)
        self._jit_cache[key] = fn
        return fn

    def reset_state(self, max_cond_frames: int = 8):
        """Reference reset_state (sam2_video_predictor.py:1029-1061):
        drop every prompt and tracking result, keep the cached features."""
        def fn(mdl):
            return init_interactive_bank(mdl, self.B, self.T,
                                         max_cond_frames)
        self.bank = self.model.apply(self.params, method=fn)
        E4 = 4 * (self.model.cfg.image_size // self.model.cfg.backbone_stride)
        self.masks = jnp.full((self.B, self.T, E4, E4), NO_OBJ_SCORE,
                              jnp.float32)
        self.cond_frames = {}          # frame -> cond slot
        self.tracked = {}              # frame -> {"reverse": bool}
        self.pinned = set()            # consolidated (prompted) frames

    def _frame_feats(self, t):
        return [jnp.broadcast_to(f[t][None], (self.B,) + f[t].shape)
                for f in self.feats]

    def _store(self, t, heads, fresh: bool):
        self.masks = self.masks.at[:, t].set(heads.low_res_masks[:, 0])
        self.pinned.add(t)
        if fresh:
            self.cond_frames[t] = self.cond_frames.get(
                t, len(self.cond_frames))

    def _slot(self, t):
        """Fresh-prompt cond slot, or None for a refinement on a tracked
        frame (reference is_init_cond_frame, sam2_video_predictor.py:269)."""
        if t in self.cond_frames:
            return self.cond_frames[t]
        if t in self.tracked:
            return None
        K = self.bank.cond_frame.shape[0]
        if len(self.cond_frames) >= K:
            raise ValueError(f"more than max_cond_frames={K} prompted "
                             "frames; raise max_cond_frames in init")
        return len(self.cond_frames)

    def _prev_logits(self, t):
        if t in self.pinned or t in self.tracked:
            return self.masks[:, t][..., None]
        return None

    def _dummy_prev(self):
        E4 = 4 * (self.model.cfg.image_size // self.model.cfg.backbone_stride)
        return jnp.zeros((self.B, E4, E4, 1), jnp.float32)

    def _run_prompt(self, kind, frame_idx, prompt, active):
        slot = self._slot(frame_idx)
        prev = self._prev_logits(frame_idx) if kind == "point" else None
        fn = self._jit(
            kind, cond_slot=slot,
            reverse=(self.tracked.get(frame_idx, {}).get("reverse", False)
                     if kind != "mask" else False),
            has_prev=prev is not None, has_active=active is not None) \
            if kind != "mask" else self._jit(
                "mask", cond_slot=slot, has_active=active is not None)
        heads, self.bank = fn(
            self.params, self._frame_feats(frame_idx), self.pos[-1],
            self.bank, jnp.asarray(frame_idx, jnp.int32), prompt,
            prev if prev is not None else self._dummy_prev(),
            jnp.asarray(active) if active is not None
            else jnp.ones((self.B,), bool))
        if self._clear_mem:
            # consolidation clears stale non-cond memories around every
            # prompted frame (preflight, sam2_video_predictor.py:709-714) —
            # inclusive of the frame's own just-written refinement output
            self.bank = clear_non_cond_mem_around(
                self.model.cfg, self.bank, jnp.asarray(frame_idx))
        self._store(frame_idx, heads, fresh=slot is not None)
        return heads.low_res_masks[:, 0]

    def add_new_points(self, frame_idx: int, coords, labels, active=None):
        """coords [B, N, 2] pixel xy, labels [B, N] (1 pos / 0 neg /
        -1 pad). Returns [B, 4E, 4E] mask logits for the frame."""
        return self._run_prompt(
            "point", frame_idx,
            (jnp.asarray(coords, jnp.float32), jnp.asarray(labels, jnp.int32)),
            active)

    def add_new_box(self, frame_idx: int, boxes, active=None):
        """boxes [B, 4] xyxy pixel coords -> two corner points labeled 2/3
        (the SAM box convention)."""
        b = np.asarray(boxes, np.float32).reshape(self.B, 2, 2)
        labels = np.tile(np.array([[2, 3]], np.int32), (self.B, 1))
        return self._run_prompt(
            "point", frame_idx, (jnp.asarray(b), jnp.asarray(labels)), active)

    def add_new_mask(self, frame_idx: int, masks, active=None):
        """masks [B, S, S] binary."""
        return self._run_prompt(
            "mask", frame_idx, jnp.asarray(masks, jnp.float32)[..., None],
            active)

    def add_new_text(self, frame_idx: int, text_embeds, active=None):
        """text_embeds [B, N, C] — projected [SEG] hiddens (the VideoGLaMM
        production prompt)."""
        return self._run_prompt("text", frame_idx, jnp.asarray(text_embeds),
                                active)

    def propagate_in_video(self, start_frame_idx: int = None,
                           max_frame_num_to_track: int = None,
                           reverse: bool = False):
        """Returns [B, T, 4E, 4E] mask logits for the whole timeline
        (reference propagate_in_video, sam2_video_predictor.py:744-827 —
        a generator there; the scan computes the range in one program)."""
        if not self.cond_frames:
            raise RuntimeError("no prompts added; call add_new_* first")
        start = (min(self.cond_frames) if start_frame_idx is None
                 else start_frame_idx)
        if max_frame_num_to_track is None:
            end = 0 if reverse else self.T - 1
        else:
            end = (max(start - max_frame_num_to_track, 0) if reverse else
                   min(start + max_frame_num_to_track, self.T - 1))
        pinned = np.zeros((self.T,), bool)
        for t in self.pinned:
            pinned[t] = True
        res, self.bank = propagate(
            self.model.bind(self.params), self.feats, self.pos, self.bank,
            jnp.asarray(start), self.T, reverse=reverse,
            end=jnp.asarray(end), pinned=jnp.asarray(pinned),
            init_masks=self.masks, clear_non_cond=self._clear_mem)
        self.masks = res.low_res_masks
        lo, hi = (end, start) if reverse else (start, end)
        for t in range(int(lo), int(hi) + 1):
            self.tracked.setdefault(t, {"reverse": reverse})
        return res.low_res_masks

    def to_video_res(self, orig_hw: Tuple[int, int], masks=None):
        """Upsample mask logits to the original video resolution, applying
        the non-overlapping constraint across objects when enabled —
        reference _get_orig_video_res_output
        (sam2_video_predictor.py:497-518). masks defaults to the session
        timeline [B, T, 4E, 4E]; returns [B, T, H, W] logits."""
        from ...ops.resize import resize_bilinear
        m = self.masks if masks is None else masks
        B, T = m.shape[:2]
        up = resize_bilinear(m.reshape((B * T,) + m.shape[2:])[..., None],
                             tuple(orig_hw))[..., 0]
        up = up.reshape((B, T) + tuple(orig_hw))
        if self.non_overlap_masks:
            up = apply_non_overlapping_constraints(up)
        return up
