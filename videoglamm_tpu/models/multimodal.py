"""Static-shape multimodal token splicing.

The reference splices visual features into the token stream with per-sample
Python list surgery over ragged tensors
(/root/reference/VideoGLaMM/model/videogpt_plus/model/arch.py:256-552:
prepare_inputs_labels_for_multimodal). That is hostile to XLA: every sample
re-traces. Here splicing is a single vectorized gather with explicit
prefix-length bookkeeping:

- input text carries exactly ONE placeholder id (IMAGE_TOKEN_INDEX) at
  position p (the data layer expands "<video>" to one placeholder, not T);
- the spliced sequence is [text[:p], visual[0:V], text[p+1:]], identical for
  labels (IGNORE_INDEX over the visual run) and for the seg-token mask.

All outputs have static length S_out = S_text - 1 + V.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX


class SplicedBatch(NamedTuple):
    embeds: jnp.ndarray        # [B, S_out, D]
    labels: jnp.ndarray        # [B, S_out] (IGNORE_INDEX over visual run/pad)
    attn_lens: jnp.ndarray     # [B] valid lengths
    positions: jnp.ndarray     # [B, S_out]
    is_visual: jnp.ndarray     # [B, S_out] bool
    token_ids: jnp.ndarray     # [B, S_out] (visual run = IMAGE_TOKEN_INDEX)


def find_image_token_pos(input_ids):
    """Position of the single IMAGE_TOKEN_INDEX per row (first occurrence)."""
    hit = input_ids == IMAGE_TOKEN_INDEX
    return jnp.argmax(hit, axis=1), hit.any(axis=1)


def splice_visual_prefix(text_embeds, input_ids, visual, text_lens,
                         labels=None):
    """Splice the visual prefix into each row at its placeholder position.

    Args:
      text_embeds: [B, S_text, D] token embeddings (placeholder row value is
                   irrelevant — it gets replaced).
      input_ids:   [B, S_text] with exactly one IMAGE_TOKEN_INDEX per row
                   (rows without a placeholder keep pure-text behavior:
                   the visual run is inserted at position 0 masked off).
      visual:      [B, V, D] visual prefix tokens.
      text_lens:   [B] valid text lengths (right padding).
      labels:      optional [B, S_text] training labels.
    """
    B, S_text, D = text_embeds.shape
    V = visual.shape[1]
    S_out = S_text - 1 + V

    pos, has_img = find_image_token_pos(input_ids)        # [B]
    j = jnp.arange(S_out)[None, :]                        # [1, S_out]
    p = pos[:, None]                                      # [B, 1]

    is_visual = (j >= p) & (j < p + V) & has_img[:, None]
    # text source index: before the run -> j; after -> j - V + 1 (skip the
    # placeholder token itself)
    idx_text = jnp.where(j < p + V, jnp.minimum(j, S_text - 1),
                         jnp.minimum(j - V + 1, S_text - 1))
    idx_vis = jnp.clip(j - p, 0, V - 1)

    gathered_text = jnp.take_along_axis(text_embeds, idx_text[..., None],
                                        axis=1)
    gathered_vis = jnp.take_along_axis(visual.astype(text_embeds.dtype),
                                       idx_vis[..., None], axis=1)
    embeds = jnp.where(is_visual[..., None], gathered_vis, gathered_text)

    token_ids = jnp.where(
        is_visual, IMAGE_TOKEN_INDEX,
        jnp.take_along_axis(input_ids, idx_text, axis=1))

    if labels is not None:
        out_labels = jnp.where(
            is_visual, IGNORE_INDEX,
            jnp.take_along_axis(labels, idx_text, axis=1))
    else:
        out_labels = jnp.full((B, S_out), IGNORE_INDEX, jnp.int32)

    attn_lens = jnp.where(has_img, text_lens - 1 + V, text_lens)
    positions = jnp.arange(S_out)[None, :].repeat(B, 0)
    # zero out labels past each row's valid length
    valid = positions < attn_lens[:, None]
    out_labels = jnp.where(valid, out_labels, IGNORE_INDEX)

    return SplicedBatch(embeds=embeds, labels=out_labels, attn_lens=attn_lens,
                        positions=positions, is_visual=is_visual,
                        token_ids=token_ids)
