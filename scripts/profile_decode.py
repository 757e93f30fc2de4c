"""Decode-phase profiler: where do the ms/token go at flagship scale?

Times the full scan-decode step, then isolated pieces (int8 matvec
projections, attention-over-cache, lm_head, embed) so the per-token budget
can be attributed against the HBM-bandwidth floor.

Usage: python scripts/profile_decode.py [--int8/--bf16] [--tokens N]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from videoglamm_tpu.config import Phi3Config
from videoglamm_tpu.models.phi3 import Phi3ForCausalLM, init_kv_cache
from videoglamm_tpu.ops.quant import dequant_matmul


def sync(x):
    float(jnp.asarray(jax.tree_util.tree_leaves(x)[0]).astype(
        jnp.float32).sum())


def timeit(fn, *args, n=8):
    out = fn(*args)
    sync(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    sync(out)
    return (time.time() - t0) / n * 1000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--kv8", action="store_true",
                    help="int8 KV cache (the serving default)")
    ap.add_argument("--tokens", type=int, default=32)
    ap.add_argument("--cache_len", type=int, default=3520)
    ap.add_argument("--full_only", action="store_true",
                    help="only the full scan-decode timing (skip pieces)")
    args = ap.parse_args()
    int8 = not args.bf16

    cfg = Phi3Config.phi3_mini_4k()
    B, C = 1, args.cache_len
    model = Phi3ForCausalLM(cfg, extra_vocab=1, dtype=jnp.bfloat16,
                            quant_int8=int8)
    shapes = jax.eval_shape(lambda: model.init(
        jax.random.PRNGKey(0), jnp.zeros((B, 1), jnp.int32),
        jnp.zeros((B, 1), jnp.int32), jnp.ones((B,), jnp.int32),
        method=Phi3ForCausalLM.forward_ids))
    params = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape,
                            s.dtype if not jnp.issubdtype(s.dtype,
                                                          jnp.floating)
                            else jnp.float32 if (int8 and s.ndim <= 2)
                            else jnp.bfloat16), shapes)
    nbytes = sum(x.nbytes for x in jax.tree_util.tree_leaves(params))
    print(f"param bytes: {nbytes/1e9:.2f} GB "
          f"({'int8' if int8 else 'bf16'} mode)")

    cache = init_kv_cache(cfg, B, C, quant_kv=args.kv8)
    kv_bytes = sum(x.nbytes for x in cache.values())
    print(f"kv cache bytes (C={C}): {kv_bytes/1e9:.2f} GB"
          f" ({'int8' if args.kv8 else 'bf16'} kv)")

    # ---- full scan decode of N tokens under one jit --------------------
    N = args.tokens

    @jax.jit
    def decode_n(params, cache, tok0):
        def step(carry, _):
            cache, tok, pos = carry
            emb = model.apply(params, tok[:, None],
                              method=Phi3ForCausalLM.embed)
            logits, hidden, cache = model.apply(
                params, emb, pos[:, None], pos + 1, cache)
            nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
            return (cache, nxt, pos + 1), hidden[:, 0]
        pos0 = jnp.full((B,), 3400, jnp.int32)
        (_, tok, _), hs = jax.lax.scan(step, (cache, tok0, pos0), None,
                                       length=N)
        return tok, hs.sum()

    tok0 = jnp.zeros((B,), jnp.int32)
    ms = timeit(decode_n, params, cache, tok0, n=4)
    print(f"full decode: {ms/N:.2f} ms/token  ({N} tokens scanned)")
    if args.full_only:
        return

    # ---- isolated pieces ----------------------------------------------
    D, I = cfg.hidden_size, cfg.intermediate_size
    nh, hd = cfg.num_heads, cfg.head_dim
    vocab = cfg.vocab_size + 1
    x = jnp.zeros((B, D), jnp.bfloat16)

    def mk_w(k, n):
        if int8:
            return (jnp.zeros((k, n), jnp.int8), jnp.ones((n,), jnp.float32))
        return (jnp.zeros((k, n), jnp.bfloat16),)

    def mv(x, w):
        if int8:
            return dequant_matmul(x, w[0], w[1])
        return x @ w[0]

    projs = {
        "qkv  [3072x9216]": mk_w(D, 3 * D),
        "o    [3072x3072]": mk_w(D, D),
        "gate_up [3072x16384]": mk_w(D, 2 * I),
        "down [8192x3072]": (mk_w(I, D)[0],) if False else mk_w(I, D),
        "lm_head [3072x32065]": mk_w(D, vocab),
    }
    L = cfg.num_layers
    for name, w in projs.items():
        xin = jnp.zeros((B, w[0].shape[0]), jnp.bfloat16)

        @jax.jit
        def rep(x, w):
            def body(c, _):
                return c, mv(x, w).sum()
            _, ys = jax.lax.scan(body, 0, None, length=L)
            return ys.sum()
        t = timeit(rep, xin, w, n=4) / L
        gb = (w[0].nbytes + (w[1].nbytes if len(w) > 1 else 0)) / 1e9
        print(f"{name}: {t*1000:.0f} us/call  ({gb*1000:.0f} MB, "
              f"{gb/ (t/1e3):.0f} GB/s)")

    # attention over the full cache, one layer, scanned L times
    k_att = jnp.zeros((B, cfg.num_kv_heads, C, hd), jnp.bfloat16)
    q = jnp.zeros((B, nh, 1, hd), jnp.bfloat16)

    from videoglamm_tpu.ops import dot_product_attention

    @jax.jit
    def att_rep(q, k, v):
        def body(c, _):
            o = dot_product_attention(q, k, v, causal=True,
                                      kv_lens=jnp.full((B,), 3400, jnp.int32),
                                      q_start=jnp.full((B,), 3400, jnp.int32))
            return c, o.sum()
        _, ys = jax.lax.scan(body, 0, None, length=L)
        return ys.sum()
    t = timeit(att_rep, q, k_att, k_att, n=4) / L
    gb = 2 * k_att.nbytes / 1e9
    print(f"attention (C={C}): {t*1000:.0f} us/layer  "
          f"({gb*1000:.0f} MB, {gb/(t/1e3):.0f} GB/s)")

    # embed gather
    @jax.jit
    def emb_rep(tok):
        def body(c, _):
            e = model.apply(params, tok[:, None],
                            method=Phi3ForCausalLM.embed)
            return c, e.sum()
        _, ys = jax.lax.scan(body, 0, None, length=L)
        return ys.sum()
    t = timeit(emb_rep, tok0, n=4) / L
    print(f"embed: {t*1000:.0f} us/call")


if __name__ == "__main__":
    main()
