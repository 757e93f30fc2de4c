"""Phi-3-mini decoder with a static KV cache.

Behavioral contract from the reference LLM wrapper
(/root/reference/VideoGLaMM/model/videogpt_plus/model/language_model/phi3.py:10-146,
which wraps HF Phi3ForCausalLM): fused qkv_proj / gate_up_proj projections,
full-head RoPE (theta 1e4), RMSNorm, untied lm_head.

TPU-first redesign vs the reference:
- The reference decodes with use_cache=False — it recomputes the full 3.3k
  token prefix for EVERY generated token (reference model/VideoGLaMM.py:798).
  Here generation is prefill + cached decode over a static-shape KV cache
  (see inference/generate.py), the single biggest inference win (SURVEY §7.1).
- Layers run under `nn.scan` (stacked params): one compiled layer body,
  fast compiles, and a stacked layout that shards cleanly over the mesh.
- Visual splicing is a static gather (`multimodal.splice_visual_prefix`)
  instead of the reference's per-sample Python list surgery (arch.py:256-552).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..config import Phi3Config
from ..ops import dot_product_attention
from ..ops.rope import apply_rope, rope_cos_sin
from . import kvcache
from .common import Dense, QDense, QDense4, RMSNorm


def init_kv_cache(cfg: Phi3Config, batch: int, max_len: int,
                  extra_vocab: int = 0, dtype=jnp.bfloat16,
                  quant_kv: bool = False):
    """Static-shape KV cache laid out attention-ready: [L, B, Hkv, max_len,
    hd] — updates are per-row dynamic slices and attention consumes the
    buffer with NO transpose (a whole-cache transpose per layer per decode
    step costs ~1.4 GB/step of HBM traffic at flagship scale). quant_kv
    stores K/V as int8 with per-token/head scales (models/kvcache.py)."""
    return kvcache.init_cache(cfg.num_layers, batch, cfg.num_kv_heads,
                              max_len, cfg.head_dim, dtype, quant_kv)


class Phi3DecoderLayer(nn.Module):
    cfg: Phi3Config
    causal: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    # LoRA on q/v projections (reference train_ds_with_videogptplus.py:279-296:
    # r=8, alpha=16 on q_proj,v_proj only). 0 disables — params absent, so
    # inference checkpoints are unchanged.
    lora_rank: int = 0
    lora_alpha: float = 16.0
    # weight-only quantized serving modes: the four big projections load
    # int8 (fused dequant matmul) or packed int4 (Pallas unpack-fused
    # matvec) weights (ops/quant.py)
    quant_int8: bool = False
    quant_int4: bool = False

    def _proj(self, features, name):
        if self.quant_int4:
            return QDense4(features, dtype=self.dtype, name=name)
        if self.quant_int8:
            return QDense(features, dtype=self.dtype, name=name)
        return Dense(features, use_bias=False, dtype=self.dtype, name=name)

    @nn.compact
    def __call__(self, x, positions, cache, kv_lens, layer_idx=None,
                 self_contained: bool = False):
        """x: [B, S, D]; positions: [B, S]; kv_lens: [B] (total valid KV
        after this block's tokens are appended); cache: the FULL stacked
        [L, B, Hkv, C, hd] cache pytree (or None) with `layer_idx` selecting
        this layer's slab — stacked so the whole cache rides the scan carry
        and updates stay tiny in-place dynamic slices instead of per-layer
        xs->ys rematerializations (~1.4 GB/step at flagship scale).

        Returns (y, new_cache)."""
        cfg = self.cfg
        B, S, _ = x.shape
        D = cfg.hidden_size
        nh, nkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

        # NOTE: a fused decode-layer experiment (three Pallas programs per
        # layer: norm+qkv, o_proj+residual, norm+glu-MLP+residual) measured
        # SLOWER than this op-by-op XLA path (9.26 vs 7.11 ms/token at
        # flagship scale — XLA already streams the int8 weights at ~605 GB/s
        # effective with no bubbles to reclaim). The kernels live in
        # scripts/decode_mlp_experiment.py with their A/B harness.
        in_norm = RMSNorm(eps=cfg.rms_norm_eps, name="input_layernorm")
        qkv_proj = self._proj((nh + 2 * nkv) * hd, "qkv_proj")
        h = in_norm(x)
        qkv = qkv_proj(h)
        q, k, v = jnp.split(qkv, [nh * hd, (nh + nkv) * hd], axis=-1)
        if self.lora_rank > 0:
            scale = self.lora_alpha / self.lora_rank
            for nm, tgt_dim in (("q", nh * hd), ("v", nkv * hd)):
                a = Dense(self.lora_rank, use_bias=False, dtype=self.dtype,
                          name=f"{nm}_lora_a")(h)
                d = Dense(tgt_dim, use_bias=False, dtype=self.dtype,
                          kernel_init=nn.initializers.zeros,
                          name=f"{nm}_lora_b")(a) * scale
                if nm == "q":
                    q = q + d
                else:
                    v = v + d
        q = q.reshape(B, S, nh, hd).transpose(0, 2, 1, 3)    # [B,nh,S,hd]
        k = k.reshape(B, S, nkv, hd).transpose(0, 2, 1, 3)   # [B,nkv,S,hd]
        v = v.reshape(B, S, nkv, hd)

        cos, sin = rope_cos_sin(positions, hd, cfg.rope_theta)  # [B,S,hd]
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)                          # [B,nkv,S,hd]

        if cache is not None and self_contained:
            # pure prefill from position 0 (forward_hidden): this block's
            # k/v ARE the whole prefix, so attention consumes them directly
            # and the cache is write-only. The old write-then-read-back
            # forced a token-minor layout onto the prefill scan carry and
            # an 85 GB/s dynamic-update-slice (~7.8 ms/clip), plus a
            # dequantized int8 round-trip the attention never needed.
            cache = kvcache.write(cache, layer_idx, k,
                                  v.transpose(0, 2, 1, 3), positions[:, 0])
            k_att = k
            v_att = v.transpose(0, 2, 1, 3)
            k_scale = v_scale = None
        elif cache is not None:
            # positions are contiguous per row (arange for prefill, a single
            # slot for decode): write via in-place dynamic slices at each
            # row's start position — no scatter, no cache transpose
            cache, k_att, v_att, k_scale, v_scale = kvcache.update_and_fetch(
                cache, layer_idx, k, v.transpose(0, 2, 1, 3),
                positions[:, 0], self.dtype)
        else:
            k_att = k
            v_att = v.transpose(0, 2, 1, 3)
            k_scale = v_scale = None

        # GQA: the int8-cache (k_scale) path passes k/v UNREPEATED — the
        # dispatcher handles grouping (natively in the Pallas decode kernel,
        # so no repeated copy of the cache is ever materialized per step)
        if nkv != nh and k_scale is None:
            rep = nh // nkv
            k_att = jnp.repeat(k_att, rep, axis=1)
            v_att = jnp.repeat(v_att, rep, axis=1)

        # positions[:, 0] is the absolute KV position of the first query:
        # 0 for prefill / full forward (right-padded batches), pos for decode.
        o = dot_product_attention(q, k_att, v_att, causal=self.causal,
                                  kv_lens=kv_lens, q_start=positions[:, 0],
                                  k_scale=k_scale, v_scale=v_scale,
                                  layer=layer_idx)
        o = o.transpose(0, 2, 1, 3).reshape(B, S, nh * hd)
        o_proj = self._proj(cfg.hidden_size, "o_proj")
        post_norm = RMSNorm(eps=cfg.rms_norm_eps,
                            name="post_attention_layernorm")
        gu_proj = self._proj(2 * cfg.intermediate_size, "gate_up_proj")
        dn_proj = self._proj(cfg.hidden_size, "down_proj")
        x = x + o_proj(o)
        h = post_norm(x)
        gu = gu_proj(h)
        gate, up = jnp.split(gu, 2, axis=-1)
        h = jax.nn.silu(gate) * up
        h = dn_proj(h)
        return x + h, cache


class Phi3Model(nn.Module):
    """Decoder stack over input embeddings. Embedding lookup is separate so
    visual features can be spliced in before the stack."""
    cfg: Phi3Config
    causal: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    remat: bool = False
    lora_rank: int = 0
    lora_alpha: float = 16.0
    quant_int8: bool = False
    quant_int4: bool = False

    @nn.compact
    def __call__(self, embeds, positions, kv_lens, cache=None,
                 self_contained: bool = False):
        cfg = self.cfg
        layer_cls = Phi3DecoderLayer
        if self.remat:
            layer_cls = nn.remat(layer_cls, prevent_cse=False)
        layer = layer_cls(cfg, causal=self.causal, dtype=self.dtype,
                          lora_rank=self.lora_rank, lora_alpha=self.lora_alpha,
                          quant_int8=self.quant_int8,
                          quant_int4=self.quant_int4, name="layers")

        if cache is not None:
            # the stacked cache rides the CARRY: per-layer updates are tiny
            # in-place slices, not per-layer stacked-output materializations
            def body(mdl, carry, l):
                y, c = carry
                y, c = mdl(y, positions, c, kv_lens, l,
                           self_contained=self_contained)
                return (y, c), None
            scan = nn.scan(body, variable_axes={"params": 0},
                           split_rngs={"params": True}, length=cfg.num_layers)
            (x, new_cache), _ = scan(layer, (embeds, cache),
                                     jnp.arange(cfg.num_layers))
        else:
            def body(mdl, carry, xs):
                y, _ = mdl(carry, positions, None, kv_lens)
                return y, None
            scan = nn.scan(body, variable_axes={"params": 0},
                           split_rngs={"params": True}, length=cfg.num_layers)
            x, _ = scan(layer, embeds, None)
            new_cache = None

        x = RMSNorm(eps=cfg.rms_norm_eps, name="norm")(x)
        return x, new_cache


class Phi3ForCausalLM(nn.Module):
    """Embedding + decoder + lm_head. `extra_vocab` appends embedding/lm_head
    rows for added tokens ([SEG]), mirroring the reference's
    resize_token_embeddings (train_ds_with_videogptplus.py:297-300)."""
    cfg: Phi3Config
    extra_vocab: int = 0
    dtype: jnp.dtype = jnp.bfloat16
    remat: bool = False
    lora_rank: int = 0
    lora_alpha: float = 16.0
    quant_int8: bool = False
    quant_int4: bool = False

    def setup(self):
        vocab = self.cfg.vocab_size + self.extra_vocab
        self.embed_tokens = nn.Embed(vocab, self.cfg.hidden_size,
                                     param_dtype=jnp.float32,
                                     dtype=self.dtype)
        self.model = Phi3Model(self.cfg, dtype=self.dtype, remat=self.remat,
                               lora_rank=self.lora_rank,
                               lora_alpha=self.lora_alpha,
                               quant_int8=self.quant_int8,
                               quant_int4=self.quant_int4)
        if self.quant_int4:
            self.lm_head = QDense4(vocab, dtype=self.dtype)
        elif self.quant_int8:
            self.lm_head = QDense(vocab, dtype=self.dtype)
        else:
            self.lm_head = nn.Dense(vocab, use_bias=False, dtype=self.dtype,
                                    param_dtype=jnp.float32)

    def embed(self, input_ids):
        """Token embedding; negative placeholder ids (IMAGE_TOKEN_INDEX) are
        clamped — their rows get replaced by visual features."""
        return self.embed_tokens(jnp.maximum(input_ids, 0))

    def __call__(self, embeds, positions, kv_lens, cache=None):
        hidden, new_cache = self.model(embeds, positions, kv_lens, cache)
        logits = self.lm_head(hidden)
        return logits, hidden, new_cache

    def forward_hidden(self, embeds, positions, kv_lens, cache=None):
        """Decoder without lm_head — prefill only needs the LAST position's
        logits; projecting all ~3.4k positions through the 32k-vocab head
        costs ~3.5 ms at flagship scale. With a cache this IS the prefill
        entry (generate.py), so attention runs self-contained on the fresh
        k/v and the cache is write-only."""
        return self.model(embeds, positions, kv_lens, cache,
                          self_contained=cache is not None)

    def head(self, hidden):
        return self.lm_head(hidden)

    def forward_ids(self, input_ids, positions, kv_lens, cache=None):
        """Pure-text forward from token ids (also the init path: touches
        embed_tokens + decoder + lm_head)."""
        return self(self.embed(input_ids), positions, kv_lens, cache)
