"""Honest per-block timings for Hiera stage geometries: 16 copies of one
block chained under a single jit (lax.scan over stacked params) so dispatch
and tunnel overheads amortize away. Used to attack the stage-1/2 gap
(VERDICT r3 item 1): equal FLOPs per block across stages, yet stage-1/2
blocks measured 2-4x slower than stage-3 ones.

Usage: python scripts/bench_hiera_stages.py [variant ...]
Variants: full, no_attn, no_ln, no_mlp, attn_only
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from videoglamm_tpu.models.sam2.hiera import MultiScaleBlock

N_CHAIN = 16
N_ITERS = 8

GEOMS = [
    ("stage1 256^2 d144 h2 w8", 256, 144, 2, 8),
    ("stage2 128^2 d288 h4 w4", 128, 288, 4, 4),
    ("stage3  64^2 d576 h8 w16", 64, 576, 8, 16),
    ("stage4  32^2 d1152 h16 w8", 32, 1152, 16, 8),
]


class Patched(nn.Module):
    """MultiScaleBlock with pieces knocked out for attribution."""
    dim: int
    heads: int
    ws: int
    variant: str = "full"

    @nn.compact
    def __call__(self, x):
        if self.variant == "full":
            return MultiScaleBlock(dim=self.dim, dim_out=self.dim,
                                   num_heads=self.heads, mlp_ratio=4.0,
                                   window_size=self.ws,
                                   dtype=jnp.bfloat16)(x)
        from videoglamm_tpu.models.common import Dense, LayerNorm, Mlp
        from videoglamm_tpu.models.sam2.hiera import (window_partition,
                                                      window_unpartition)
        from videoglamm_tpu.ops.attention import attention_packed_qkv
        shortcut = x
        h = x if self.variant == "no_ln" else \
            LayerNorm(eps=1e-6, name="norm1")(x)
        if self.variant not in ("no_attn",):
            B, H, W, _ = h.shape
            hw, pad_hw = window_partition(h, self.ws)
            qkv = Dense(3 * self.dim, dtype=jnp.bfloat16, name="qkv")(hw)
            Bw, S = qkv.shape[0], self.ws * self.ws
            if self.variant == "attn_only":
                o = attention_packed_qkv(
                    qkv.reshape(Bw, S, 3 * self.dim), self.heads)
                o = o.reshape(Bw, self.ws, self.ws, self.dim)
            else:
                # plain XLA route via the block's own dispatch
                qkv4 = qkv.reshape(Bw, S, 3, self.heads,
                                   self.dim // self.heads)
                from videoglamm_tpu.ops import dot_product_attention
                o = dot_product_attention(
                    qkv4[:, :, 0].transpose(0, 2, 1, 3),
                    qkv4[:, :, 1].transpose(0, 2, 1, 3),
                    qkv4[:, :, 2].transpose(0, 2, 1, 3))
                o = o.transpose(0, 2, 1, 3).reshape(Bw, self.ws, self.ws,
                                                    self.dim)
            o = Dense(self.dim, dtype=jnp.bfloat16, name="proj")(o)
            h = window_unpartition(o, self.ws, pad_hw, (H, W))
        else:
            h = Dense(self.dim, dtype=jnp.bfloat16, name="proj")(
                Dense(self.dim, dtype=jnp.bfloat16, name="qkv3")(h))
        x = shortcut + h
        if self.variant == "no_mlp":
            return x
        h2 = x if self.variant == "no_ln" else \
            LayerNorm(eps=1e-6, name="norm2")(x)
        return x + Mlp(self.dim * 4, dtype=jnp.bfloat16, name="mlp")(h2)


def time_chain(blk, params_stacked, x):
    @jax.jit
    def run(ps, x):
        def body(carry, p):
            return blk.apply({"params": p}, carry), None
        y, _ = jax.lax.scan(body, x, ps)
        return y

    float(run(params_stacked, x).astype(jnp.float32).sum())
    t0 = time.time()
    for _ in range(N_ITERS):
        out = run(params_stacked, x)
    float(out.astype(jnp.float32).sum())
    return (time.time() - t0) / N_ITERS / N_CHAIN * 1000


def main():
    args = sys.argv[1:]
    only = [a.split("=", 1)[1] for a in args if a.startswith("stage=")]
    B = int(os.environ.get("HIERA_BENCH_B", "1"))
    variants = [a for a in args if not a.startswith("stage=")] or ["full"]
    geoms = [g for g in GEOMS if not only or any(o in g[0] for o in only)]
    for name, hw, dim, heads, ws in geoms:
        x = jnp.asarray(np.random.RandomState(0).randn(B, hw, hw, dim),
                        jnp.bfloat16)
        row = [name]
        for variant in variants:
            blk = Patched(dim=dim, heads=heads, ws=ws, variant=variant)
            p1 = blk.init(jax.random.PRNGKey(0), x)["params"]
            ps = jax.tree_util.tree_map(
                lambda a: jnp.stack([jnp.asarray(a, jnp.bfloat16)]
                                    * N_CHAIN), p1)
            ms = time_chain(blk, ps, x)
            row.append(f"{variant}={ms:.3f}ms")
        print("  ".join(row))


if __name__ == "__main__":
    main()
