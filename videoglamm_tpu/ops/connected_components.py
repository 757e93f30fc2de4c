"""On-device connected components (8-connectivity) + mask cleanup.

TPU-native replacement for the reference's only CUDA kernel
(/root/reference/VideoGLaMM/model/segment_anything_2/sam2/csrc/
connected_components.cu:1-289, `get_connected_componnets`): block union-find
becomes min-label propagation with pointer jumping under `lax.while_loop`
(pure gathers/mins — everything XLA compiles to TPU), converging in
O(log(diameter)) sweeps instead of the O(diameter) of naive propagation.

Drives the same consumers the reference wires up
(sam2/utils/transforms.py:78-100): hole filling (background components with
area <= max_hole_area become foreground) and sprinkle removal (foreground
components with area <= max_sprinkle_area become background), plus the
eval-side small-blob removal (eval_gcg_infer.py:20-29) without leaving the
device.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_BIG = jnp.int32(2 ** 30)


@jax.jit
def connected_components(mask):
    """mask: [B, H, W] bool. Returns (labels, areas):
    labels [B, H, W] int32 — 1-based component ids on foreground, 0 on
    background (ids are arbitrary but consistent); areas [B, H, W] int32 —
    component size per foreground pixel, 0 on background."""
    mask = mask.astype(bool)
    B, H, W = mask.shape
    HW = H * W
    init = jnp.arange(HW, dtype=jnp.int32).reshape(1, H, W)
    labels = jnp.where(mask, jnp.broadcast_to(init, mask.shape), _BIG)

    def neighbor_min(lab):
        p = jnp.pad(lab, ((0, 0), (1, 1), (1, 1)), constant_values=_BIG)
        m = lab
        for dy in range(3):
            for dx in range(3):
                m = jnp.minimum(m, p[:, dy:dy + H, dx:dx + W])
        return m

    def body(state):
        lab, _ = state
        new = jnp.where(mask, neighbor_min(lab), _BIG)
        flat = new.reshape(B, HW)
        for _ in range(2):  # pointer jumping: label -> label of its target
            tgt = jnp.clip(flat, 0, HW - 1)
            jumped = jnp.take_along_axis(flat, tgt, axis=1)
            flat = jnp.where(flat < _BIG, jumped, _BIG)
        new = flat.reshape(B, H, W)
        return new, jnp.any(new != lab)

    def cond(state):
        return state[1]

    labels, _ = jax.lax.while_loop(cond, body, (labels, jnp.asarray(True)))

    flat = labels.reshape(B, HW)
    ones = mask.reshape(B, HW).astype(jnp.int32)
    areas_by_root = jnp.zeros((B, HW), jnp.int32).at[
        jnp.arange(B)[:, None], jnp.clip(flat, 0, HW - 1)].add(ones)
    areas = jnp.where(
        mask, jnp.take_along_axis(
            areas_by_root, jnp.clip(flat, 0, HW - 1), axis=1).reshape(
            B, H, W), 0)
    out_labels = jnp.where(mask, labels + 1, 0).astype(jnp.int32)
    return out_labels, areas


@functools.partial(jax.jit, static_argnames=("max_hole_area",
                                             "max_sprinkle_area",
                                             "mask_threshold"))
def postprocess_mask_scores(masks, max_hole_area: float = 0.0,
                            max_sprinkle_area: float = 0.0,
                            mask_threshold: float = 0.0):
    """SAM2Transforms.postprocess_masks semantics on device
    (sam2/utils/transforms.py:78-100). masks: [B, H, W] logits."""
    out = masks.astype(jnp.float32)
    if max_hole_area > 0:
        _, areas = connected_components(out <= mask_threshold)
        is_hole = (areas > 0) & (areas <= max_hole_area)
        out = jnp.where(is_hole, mask_threshold + 10.0, out)
    if max_sprinkle_area > 0:
        _, areas = connected_components(out > mask_threshold)
        is_spr = (areas > 0) & (areas <= max_sprinkle_area)
        out = jnp.where(is_spr, mask_threshold - 10.0, out)
    return out


@functools.partial(jax.jit, static_argnames=("min_size",))
def remove_small_objects_device(mask, min_size: int):
    """Device-side small-blob removal (the eval pipelines' skimage
    remove_small_objects, eval_gcg_infer.py:20-29, without host transfer).
    mask: [B, H, W] bool."""
    if min_size <= 0:
        return mask
    _, areas = connected_components(mask)
    return mask & (areas >= min_size)
