"""Llama-3.1 decoder — the alternate LLM base.

Behavioral contract from the reference wrapper
(/root/reference/VideoGLaMM/model/videogpt_plus/model/language_model/
llama3_1.py, which subclasses HF LlamaForCausalLM): separate q/k/v
projections with GQA (8 KV heads), separate gate/up MLP projections, RoPE
theta 5e5 with the Llama-3.1 frequency scaling, RMSNorm, untied lm_head.
The reference keeps this base as config plumbing (train/chat raise on
anything but phi3, SURVEY §7.5) — here it is a fully functional decoder
sharing the KV-cache/scan machinery with Phi-3.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..config import LlamaConfig
from ..ops import dot_product_attention
from ..ops.rope import apply_rope, rope_cos_sin
from . import kvcache
from .common import Dense, RMSNorm


def llama31_rope_cos_sin(positions, head_dim, theta,
                         factor: float = 8.0, low_freq_factor: float = 1.0,
                         high_freq_factor: float = 4.0,
                         original_max_position: int = 8192):
    """Llama-3.1 RoPE frequency rescaling (HF rope_scaling type="llama3")."""
    import numpy as np
    inv_freq = 1.0 / (theta ** (np.arange(0, head_dim, 2) / head_dim))
    low_wavelen = original_max_position / low_freq_factor
    high_wavelen = original_max_position / high_freq_factor
    wavelen = 2 * np.pi / inv_freq
    scaled = np.where(wavelen > low_wavelen, inv_freq / factor, inv_freq)
    smooth = (original_max_position / wavelen - low_freq_factor) / (
        high_freq_factor - low_freq_factor)
    mid = (1 - smooth) / factor * inv_freq + smooth * inv_freq
    is_mid = (wavelen <= low_wavelen) & (wavelen >= high_wavelen)
    inv_freq = np.where(is_mid, mid, scaled)

    ang = positions[..., None].astype(jnp.float32) * jnp.asarray(
        inv_freq, jnp.float32)
    cos = jnp.cos(ang)
    sin = jnp.sin(ang)
    return (jnp.concatenate([cos, cos], axis=-1),
            jnp.concatenate([sin, sin], axis=-1))


class LlamaDecoderLayer(nn.Module):
    cfg: LlamaConfig
    causal: bool = True
    use_rope_scaling: bool = True
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, positions, cache, kv_lens, layer_idx=None,
                 self_contained: bool = False):
        cfg = self.cfg
        B, S, _ = x.shape
        nh, nkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

        h = RMSNorm(eps=cfg.rms_norm_eps, name="input_layernorm")(x)
        q = Dense(nh * hd, use_bias=False, dtype=self.dtype, name="q_proj")(h)
        k = Dense(nkv * hd, use_bias=False, dtype=self.dtype,
                  name="k_proj")(h)
        v = Dense(nkv * hd, use_bias=False, dtype=self.dtype,
                  name="v_proj")(h)
        q = q.reshape(B, S, nh, hd).transpose(0, 2, 1, 3)
        k = k.reshape(B, S, nkv, hd).transpose(0, 2, 1, 3)   # [B,nkv,S,hd]
        v = v.reshape(B, S, nkv, hd)

        if self.use_rope_scaling:
            cos, sin = llama31_rope_cos_sin(positions, hd, cfg.rope_theta)
        else:
            cos, sin = rope_cos_sin(positions, hd, cfg.rope_theta)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

        if cache is not None and self_contained:
            # pure prefill from position 0: attention runs on the fresh
            # k/v (they are the whole prefix); cache is write-only — see
            # models/phi3.py for the layout/bandwidth rationale
            cache = kvcache.write(cache, layer_idx, k,
                                  v.transpose(0, 2, 1, 3), positions[:, 0])
            k_att = k
            v_att = v.transpose(0, 2, 1, 3)
            k_scale = v_scale = None
        elif cache is not None:
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

        o = dot_product_attention(q, k_att, v_att, causal=self.causal,
                                  kv_lens=kv_lens, q_start=positions[:, 0],
                                  k_scale=k_scale, v_scale=v_scale,
                                  layer=layer_idx)
        o = o.transpose(0, 2, 1, 3).reshape(B, S, nh * hd)
        o = Dense(cfg.hidden_size, use_bias=False, dtype=self.dtype,
                  name="o_proj")(o)
        x = x + o

        h = RMSNorm(eps=cfg.rms_norm_eps, name="post_attention_layernorm")(x)
        gate = Dense(cfg.intermediate_size, use_bias=False, dtype=self.dtype,
                     name="gate_proj")(h)
        up = Dense(cfg.intermediate_size, use_bias=False, dtype=self.dtype,
                   name="up_proj")(h)
        h = Dense(cfg.hidden_size, use_bias=False, dtype=self.dtype,
                  name="down_proj")(jax.nn.silu(gate) * up)
        return x + h, cache


class LlamaForCausalLM(nn.Module):
    """Same interface as Phi3ForCausalLM (embed / __call__ / forward_ids) —
    drop-in alternate base for the composite."""
    cfg: LlamaConfig
    extra_vocab: int = 0
    use_rope_scaling: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    remat: bool = False

    def setup(self):
        vocab = self.cfg.vocab_size + self.extra_vocab
        self.embed_tokens = nn.Embed(vocab, self.cfg.hidden_size,
                                     param_dtype=jnp.float32,
                                     dtype=self.dtype)
        self.lm_head = nn.Dense(vocab, use_bias=False, dtype=self.dtype,
                                param_dtype=jnp.float32)
        self.final_norm = RMSNorm(eps=self.cfg.rms_norm_eps, name="norm")

    def embed(self, input_ids):
        return self.embed_tokens(jnp.maximum(input_ids, 0))

    def forward_hidden(self, embeds, positions, kv_lens, cache=None):
        """Decoder without lm_head (see Phi3ForCausalLM.forward_hidden).
        With a cache this is the PREFILL entry (generate.py): attention
        runs self-contained on the fresh k/v and the cache is write-only."""
        return self._forward(embeds, positions, kv_lens, cache,
                             self_contained=cache is not None)

    @nn.compact
    def _forward(self, embeds, positions, kv_lens, cache=None,
                 self_contained: bool = False):
        cfg = self.cfg
        layer_cls = LlamaDecoderLayer
        if self.remat:
            layer_cls = nn.remat(layer_cls, prevent_cse=False)
        layer = layer_cls(cfg, dtype=self.dtype,
                          use_rope_scaling=self.use_rope_scaling,
                          name="layers")

        if cache is not None:
            def body(mdl, carry, l):
                y, c = carry
                y, c = mdl(y, positions, c, kv_lens, l,
                           self_contained=self_contained)
                return (y, c), None
            scan = nn.scan(body, variable_axes={"params": 0},
                           split_rngs={"params": True},
                           length=cfg.num_layers)
            (x, new_cache), _ = scan(layer, (embeds, cache),
                                     jnp.arange(cfg.num_layers))
        else:
            def body(mdl, carry, xs):
                y, _ = mdl(carry, positions, None, kv_lens)
                return y, None
            scan = nn.scan(body, variable_axes={"params": 0},
                           split_rngs={"params": True},
                           length=cfg.num_layers)
            x, _ = scan(layer, embeds, None)
            new_cache = None

        x = self.final_norm(x)
        return x, new_cache

    def head(self, hidden):
        return self.lm_head(hidden)

    def __call__(self, embeds, positions, kv_lens, cache=None):
        x, new_cache = self._forward(embeds, positions, kv_lens, cache)
        return self.lm_head(x), x, new_cache

    def forward_ids(self, input_ids, positions, kv_lens, cache=None):
        return self(self.embed(input_ids), positions, kv_lens, cache)


def init_llama_kv_cache(cfg: LlamaConfig, batch: int, max_len: int,
                        dtype=jnp.bfloat16, quant_kv: bool = False):
    return kvcache.init_cache(cfg.num_layers, batch, cfg.num_kv_heads,
                              max_len, cfg.head_dim, dtype, quant_kv)
