"""xprof trace of the flagship cached-decode loop: per-op attribution.

Builds the same zero-weight flagship Phi-3 decode as profile_decode.py,
scans N tokens under one jit, traces one invocation, and prints the raw
per-op totals (divide by N for ms/token).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from videoglamm_tpu.config import Phi3Config
from videoglamm_tpu.models.phi3 import Phi3ForCausalLM, init_kv_cache
from xprof_summary import trace_and_summarize


def main():
    int8 = os.environ.get("BF16", "0") != "1"
    kv8 = os.environ.get("KV8", "1") == "1"
    N = int(os.environ.get("TOKENS", "32"))
    cfg = Phi3Config.phi3_mini_4k()
    B, C = 1, 3520
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
    cache = init_kv_cache(cfg, B, C, quant_kv=kv8)

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

    def run():
        t, s = decode_n(params, cache, tok0)
        float(jnp.asarray(s).astype(jnp.float32))

    run()  # compile outside the trace
    trace_and_summarize(run, top=40, group=False)
    print(f"\n(divide by {N} for per-token; includes one dispatch)")


if __name__ == "__main__":
    main()
