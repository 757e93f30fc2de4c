"""KV-cache autoregressive generation with a spliced multimodal prefix.

The reference decodes with use_cache=False — every generated token recomputes
the full ~3.3k-token visual prefix (/root/reference/VideoGLaMM/model/
VideoGLaMM.py:789-799, generate(use_cache=False)). This module is the
TPU-native replacement: one prefill over the spliced sequence, then a
`lax.scan` decode loop over a static KV cache — O(S) instead of O(S*N) per
token, the single biggest inference win identified in SURVEY §7.1.

[SEG]-position bookkeeping: the reference recovers [SEG] hidden states by
recomputing the whole sequence and masking (`num_newly_added_tokens` hack,
VideoGLaMM.py:609-633). Here every decode step feeds the previously sampled
token and returns its final-layer hidden state, so the hidden for each
generated token is collected exactly once, cache-priced.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.multimodal import splice_visual_prefix
from ..models.llama import init_llama_kv_cache
from ..models.phi3 import init_kv_cache


class GenerateResult(NamedTuple):
    tokens: jnp.ndarray       # [B, max_new] sampled ids (pad after EOS)
    hidden: jnp.ndarray       # [B, max_new, D] final-layer hidden of each
                              # generated token as it was FED BACK (position j
                              # hidden — matches the reference's full-sequence
                              # recompute semantics)
    lengths: jnp.ndarray      # [B] number of generated tokens BEFORE the
                              # stop token; the stop token itself is
                              # stripped (replaced by pad_id), as are all
                              # slots after it
    prefill_hidden: jnp.ndarray  # [B, S_prefill, D]
    prefill_len: jnp.ndarray  # [B] spliced prompt lengths


# Per-LLM stop tokens (reference chat templates): Phi-3 instruct stops at
# <|endoftext|>=32000, <|assistant|>=32001, <|end|>=32007; Llama-3.1 at
# <|end_of_text|>=128001, <|eot_id|>=128009.
TERMINATORS = {
    "phi3": (32000, 32001, 32007),
    "llama3_1": (128001, 128009),
}


def terminators_for(llm_type: str, tokenizer=None) -> tuple:
    """Stop-token ids for the configured base LLM, optionally unioned with
    the tokenizer's eos_token_id."""
    ids = set(TERMINATORS.get(llm_type, TERMINATORS["phi3"]))
    if tokenizer is not None and getattr(tokenizer, "eos_token_id", None):
        ids.add(int(tokenizer.eos_token_id))
    return tuple(sorted(ids))


def generate_with_prefix(model, params, visual_prefix, input_ids, text_lens,
                         *, max_new_tokens: int, eos_id=32000,
                         pad_id: int = 0, temperature: float = 0.0,
                         rng: Optional[jax.Array] = None, draft_k: int = 0):
    """Greedy (temperature=0) or sampled decode of the composite's LLM.

    model: VideoGLaMM flax module (apply'd with `params`); uses its `llm`.
    visual_prefix: [B, V, H]; input_ids: [B, S_text] with one placeholder.
    eos_id: int or tuple of ints — generation stops at ANY of them (Phi-3
    instruct uses several terminators: <|endoftext|>=32000, <|end|>=32007).
    draft_k >= 2 enables n-gram speculative decoding for greedy generation
    (exact same outputs, fewer weight-streaming passes — see
    generate_speculative).
    """
    if draft_k >= 2 and temperature == 0.0:
        return generate_speculative(
            model, params, visual_prefix, input_ids, text_lens,
            max_new_tokens=max_new_tokens, eos_id=eos_id, pad_id=pad_id,
            draft_k=draft_k)
    eos_ids = jnp.asarray(
        eos_id if isinstance(eos_id, (tuple, list)) else [eos_id],
        jnp.int32)

    def is_stop(tok):
        return jnp.any(tok[:, None] == eos_ids[None, :], axis=-1)
    B, S_text = input_ids.shape
    V = visual_prefix.shape[1]
    S_prefill = S_text - 1 + V
    max_len = S_prefill + max_new_tokens + 1
    llm_type = getattr(model.cfg, "llm_type", "phi3")
    cfg = model.cfg.llm if llm_type == "phi3" else model.cfg.llama

    def llm_apply(method, *args):
        return model.apply(params, *args,
                           method=lambda mdl, *a: getattr(mdl.llm, method)(*a))

    embeds = llm_apply("embed", input_ids)
    sp = splice_visual_prefix(embeds, input_ids, visual_prefix, text_lens)

    make_cache = init_kv_cache if llm_type == "phi3" \
        else init_llama_kv_cache
    cache = make_cache(cfg, B, max_len, dtype=embeds.dtype,
                       quant_kv=getattr(model, "quant_kv_int8", False))
    # prefill without lm_head: only the LAST position's logits are needed
    # (projecting all ~3.4k positions through the 32k-vocab head costs
    # ~3.5 ms at flagship scale)
    hidden_pre, cache = llm_apply(
        "forward_hidden", sp.embeds, sp.positions, sp.attn_lens, cache)

    # last valid prompt position -> first sampled token
    last_idx = sp.attn_lens - 1                               # [B]
    bidx = jnp.arange(B)
    next_logits = llm_apply("head", hidden_pre[bidx, last_idx])  # [B, vocab]

    def sample(lg, key):
        if temperature > 0.0:
            return jax.random.categorical(key, lg / temperature, axis=-1)
        return jnp.argmax(lg, axis=-1)

    if rng is None:
        rng = jax.random.PRNGKey(0)

    tok0 = sample(next_logits, rng)
    done0 = is_stop(tok0)

    def step(carry, key):
        cache, tok, done, pos = carry
        # feed the previously sampled token at its own position
        emb = llm_apply("embed", tok[:, None])
        kv_lens = pos + 1
        logits, hidden, cache = llm_apply(
            "__call__", emb, pos[:, None], kv_lens, cache)
        nxt = sample(logits[:, -1], key)
        nxt = jnp.where(done, pad_id, nxt)
        new_done = done | is_stop(nxt)
        return (cache, nxt, new_done, pos + 1), \
            (tok, hidden[:, 0], done)

    keys = jax.random.split(rng, max_new_tokens)
    pos0 = sp.attn_lens
    (_, _, done, _), (toks, hiddens, was_done) = jax.lax.scan(
        step, (cache, tok0, done0, pos0), keys)

    tokens = jnp.where(was_done.T, pad_id, toks.T)            # [B, max_new]
    hidden = jnp.swapaxes(hiddens, 0, 1)                      # [B, max_new, D]
    lengths = jnp.sum(~was_done.T, axis=1)
    return GenerateResult(tokens=tokens, hidden=hidden, lengths=lengths,
                          prefill_hidden=hidden_pre, prefill_len=sp.attn_lens)


def ngram_replay_stats(tokens, draft_k: int) -> dict:
    """Replay a REAL token stream through the n-gram drafter to measure the
    true accept-rate speculative decoding would achieve on it.

    Greedy verification emits exactly the plain-decode stream, so the
    accepted-draft count per iteration is a pure function of the stream
    itself: at each position, draft K-1 tokens with the same
    most-recent-bigram rule as generate_speculative's draft_row and count
    the longest prefix matching the actual continuation. tokens: 1-D int
    sequence (e.g. a generated GCG caption). Returns
    {iterations, tokens, accept_rate, tokens_per_iteration} —
    tokens_per_iteration is the decode-pass reduction factor (each
    iteration costs one weight-streaming forward regardless of K).
    """
    toks = [int(t) for t in np.asarray(tokens).reshape(-1)]
    K = int(draft_k)
    assert K >= 2
    n = len(toks)
    idx = 0          # index of last emitted token (position 0 given)
    iters = 0
    accepted = 0
    while idx < n - 1:
        # draft_row: most recent earlier occurrence of the current bigram
        drafts = []
        if idx >= 1:
            a, b = toks[idx - 1], toks[idx]
            for j in range(idx - 2, -1, -1):
                if toks[j] == a and toks[j + 1] == b:
                    drafts = toks[j + 2:j + 2 + (K - 1)]
                    break
        if not drafts:
            drafts = [toks[idx]] * (K - 1)
        drafts = (drafts + [toks[idx]] * (K - 1))[:K - 1]
        n_acc = 0
        for d, actual in zip(drafts, toks[idx + 1:idx + K]):
            if d == actual:
                n_acc += 1
            else:
                break
        n_acc = min(n_acc, n - 1 - idx - 1)  # bonus token always emitted
        idx += n_acc + 1
        iters += 1
        accepted += n_acc
    emitted = idx
    return {
        "iterations": iters,
        "tokens": emitted,
        "accept_rate": accepted / max(iters * (K - 1), 1),
        "tokens_per_iteration": emitted / max(iters, 1),
    }


def generate_speculative(model, params, visual_prefix, input_ids, text_lens,
                         *, max_new_tokens: int, eos_id=32000,
                         pad_id: int = 0, draft_k: int = 4):
    """Greedy decode with n-gram (prompt-lookup) speculative decoding.

    Decode is HBM-bound: one step streams the full int8/bf16 weight set
    (~3.7 GB at flagship scale) whether it scores 1 token or K. Each
    iteration drafts K-1 tokens by matching the last generated bigram
    against the already-generated text (grounded captions repeat phrase
    structure like "</p> [SEG]"), feeds [last, drafts] in ONE cached
    forward, and accepts the longest draft prefix that agrees with the
    model's own argmax — outputs are exactly the plain greedy decode's
    (verification discards any divergence), but accepted drafts cost no
    extra weight traffic. No draft model needed (the reference has none;
    this is a serving optimization with identical semantics).

    Rejected drafts leave stale KV entries above the accepted position;
    they are masked by kv_lens and overwritten by the next iteration's
    writes at the same slots.
    """
    K = int(draft_k)
    assert K >= 2
    eos_ids = jnp.asarray(
        eos_id if isinstance(eos_id, (tuple, list)) else [eos_id],
        jnp.int32)

    def is_stop(tok):
        return jnp.any(tok[..., None] == eos_ids, axis=-1)

    B, S_text = input_ids.shape
    V = visual_prefix.shape[1]
    S_prefill = S_text - 1 + V
    M = max_new_tokens
    max_len = S_prefill + M + K + 1
    llm_type = getattr(model.cfg, "llm_type", "phi3")
    cfg = model.cfg.llm if llm_type == "phi3" else model.cfg.llama

    def llm_apply(method, *args):
        return model.apply(params, *args,
                           method=lambda mdl, *a: getattr(mdl.llm, method)(*a))

    embeds = llm_apply("embed", input_ids)
    sp = splice_visual_prefix(embeds, input_ids, visual_prefix, text_lens)
    make_cache = init_kv_cache if llm_type == "phi3" \
        else init_llama_kv_cache
    cache = make_cache(cfg, B, max_len, dtype=embeds.dtype,
                       quant_kv=getattr(model, "quant_kv_int8", False))
    hidden_pre, cache = llm_apply(
        "forward_hidden", sp.embeds, sp.positions, sp.attn_lens, cache)

    bidx = jnp.arange(B)
    tok0 = jnp.argmax(llm_apply("head", hidden_pre[bidx, sp.attn_lens - 1]),
                      axis=-1).astype(jnp.int32)
    D = hidden_pre.shape[-1]
    pos0 = sp.attn_lens                                        # [B]

    # buffers with K+1 slack so a full K-write at idx <= M never overflows
    BUF = M + K + 1
    tokens0 = jnp.full((B, BUF), pad_id, jnp.int32).at[:, 0].set(tok0)
    hidden0 = jnp.zeros((B, BUF, D), hidden_pre.dtype)
    idx0 = jnp.zeros((B,), jnp.int32)       # index of last valid token
    done0 = is_stop(tok0) | (M <= 1)

    jpos = jnp.arange(BUF)

    def draft_row(toks, idx):
        """Most recent earlier occurrence of the current bigram -> the K-1
        tokens that followed; falls back to repeating the last token."""
        a = toks[jnp.maximum(idx - 1, 0)]
        b = toks[idx]
        match = (toks == a) & \
            (jnp.roll(toks, -1) == b) & (jpos + 1 < idx)
        any_m = jnp.any(match) & (idx >= 1)
        j_sel = jnp.max(jnp.where(match, jpos, -1))
        start = jnp.where(any_m, j_sel + 2, 0)
        window = jax.lax.dynamic_slice(toks, (start,), (K - 1,))
        return jnp.where(any_m, window, jnp.full((K - 1,), b, jnp.int32))

    def body(carry):
        tokens, hidden, cache, idx, done = carry
        drafts = jax.vmap(draft_row)(tokens, idx)              # [B, K-1]
        last = tokens[bidx, idx]
        block = jnp.concatenate([last[:, None], drafts], axis=1)  # [B, K]
        positions = (pos0 + idx)[:, None] + jnp.arange(K)[None]
        kv_lens = pos0 + idx + K
        emb = llm_apply("embed", block)
        lg, h, cache = llm_apply("__call__", emb, positions, kv_lens, cache)
        preds = jnp.argmax(lg, axis=-1).astype(jnp.int32)      # [B, K]

        match = drafts == preds[:, :-1]                        # [B, K-1]
        n_acc = jnp.sum(jnp.cumprod(match, axis=1), axis=1)    # [B] 0..K-1
        bonus = preds[bidx, n_acc]
        ar = jnp.arange(K)[None]
        out_write = jnp.where(ar < n_acc[:, None],
                              jnp.pad(drafts, ((0, 0), (0, 1))),
                              bonus[:, None])

        # emitted run: out_write[0..n_acc]; cut at the first stop token
        stops = is_stop(out_write) & (ar <= n_acc[:, None])
        any_stop = jnp.any(stops, axis=1)
        first_stop = jnp.argmax(stops, axis=1)
        n_emit = jnp.where(any_stop, first_stop + 1, n_acc + 1)

        def wr(buf, upd, i):
            return jax.lax.dynamic_update_slice(buf, upd, (i,))

        def wrh(buf, upd, i):
            return jax.lax.dynamic_update_slice(buf, upd, (i, 0))

        new_tokens = jax.vmap(wr)(tokens, out_write, idx + 1)
        new_hidden = jax.vmap(wrh)(hidden, h.astype(hidden.dtype), idx)
        keep = done[:, None]
        tokens = jnp.where(keep, tokens, new_tokens)
        hidden = jnp.where(keep[..., None], hidden, new_hidden)
        new_idx = jnp.where(done, idx, idx + n_emit)
        new_done = done | any_stop | (new_idx >= M - 1)
        return tokens, hidden, cache, new_idx, new_done

    def cond(carry):
        return ~jnp.all(carry[4])

    tokens, hidden, cache, idx, done = jax.lax.while_loop(
        cond, body, (tokens0, hidden0, cache, idx0, done0))

    # the loop computes hidden[j] only for tokens that were FED; the final
    # token (a verification bonus) never was — one epilogue step fills it
    # (matches the plain decode, whose scan feeds every emitted token)
    last = tokens[bidx, idx]
    emb = llm_apply("embed", last[:, None])
    _, h_last, cache = llm_apply(
        "__call__", emb, (pos0 + idx)[:, None], pos0 + idx + 1, cache)
    hidden = jax.vmap(
        lambda buf, upd, i: jax.lax.dynamic_update_slice(buf, upd, (i, 0))
    )(hidden, h_last.astype(hidden.dtype), idx)

    valid = tokens[:, :M]
    stop_mask = is_stop(valid)
    any_stop = jnp.any(stop_mask, axis=1)
    first_stop = jnp.argmax(stop_mask, axis=1)
    lengths = jnp.where(any_stop, first_stop, M).astype(jnp.int32)
    out_tokens = jnp.where(jnp.arange(M)[None] < lengths[:, None], valid,
                           pad_id)
    return GenerateResult(tokens=out_tokens, hidden=hidden[:, :M],
                          lengths=lengths, prefill_hidden=hidden_pre,
                          prefill_len=sp.attn_lens)
