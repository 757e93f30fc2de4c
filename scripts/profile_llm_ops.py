"""Per-op xprof attribution for LLM prefill and decode at flagship scale.

Usage: python scripts/profile_llm_ops.py [--bf16] [prefill|decode|both]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from xprof_summary import trace_and_summarize


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("what", nargs="?", default="both")
    args = ap.parse_args()
    int8 = not args.bf16

    from videoglamm_tpu.config import Phi3Config
    from videoglamm_tpu.models.phi3 import Phi3ForCausalLM, init_kv_cache

    cfg = Phi3Config.phi3_mini_4k()
    B, S, C = 1, 3456, 3520
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
    import os
    cache = init_kv_cache(cfg, B, C,
                          quant_kv=os.environ.get("BENCH_KV8", "1") == "1")

    def sync(x):
        float(jnp.asarray(jax.tree_util.tree_leaves(x)[0]).astype(
            jnp.float32).sum())

    if args.what in ("prefill", "both"):
        ids = jnp.zeros((B, S), jnp.int32)
        pos = jnp.arange(S, dtype=jnp.int32)[None]
        lens = jnp.full((B,), S, jnp.int32)

        @jax.jit
        def prefill(params, cache):
            logits, hidden, cache = model.apply(
                params, ids, pos, lens, cache,
                method=Phi3ForCausalLM.forward_ids)
            return logits[:, -1].sum()

        sync(prefill(params, cache))
        print(f"\n=== PREFILL S={S} ({'int8' if int8 else 'bf16'}) ===")
        trace_and_summarize(lambda: sync(prefill(params, cache)))

    if args.what in ("decode", "both"):
        N = 16

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
        sync(decode_n(params, cache, tok0))
        print(f"\n=== DECODE x{N} ({'int8' if int8 else 'bf16'}) ===")
        tot = trace_and_summarize(lambda: sync(decode_n(params, cache, tok0)))
        dev = sum(tot.values())
        print(f"per token: {dev/N:.2f} ms (device op time)")


if __name__ == "__main__":
    main()
