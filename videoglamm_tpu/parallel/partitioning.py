"""GSPMD partitioning rules.

Parameter shardings are derived from array names + shapes rather than a
hand-written tree: the rule set below maps flax param path regexes to
PartitionSpecs. The reference has no TP at all (DeepSpeed ZeRO-2 only,
/root/reference/VideoGLaMM/utils/trainer.py:41-48); here the LLM/tower
matmuls shard over the ``model`` axis and optimizer state shards over
``data`` (ZeRO-2 equivalent).
"""
from __future__ import annotations

import re
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS, MODEL_AXIS

# (regex over '/'-joined param path, spec). First match wins. Specs apply to the
# *last* len(spec) dims of the param; leading dims are replicated.
_RULES = [
    # LLM / ViT attention projections: shard the head (output) dim.
    (r"(q_proj|k_proj|v_proj|qkv|qkv_proj|query|key|value)/kernel$", P(None, MODEL_AXIS)),
    (r"(o_proj|out_proj|proj|attn_out)/kernel$", P(MODEL_AXIS, None)),
    # MLPs: shard hidden dim.
    (r"(gate_up_proj|up_proj|gate_proj|fc1|lin1|w1|w3)/kernel$", P(None, MODEL_AXIS)),
    (r"(down_proj|fc2|lin2|w2)/kernel$", P(MODEL_AXIS, None)),
    # Embedding / unembedding: shard vocab dim.
    (r"embed_tokens/embedding$", P(MODEL_AXIS, None)),
    (r"lm_head/kernel$", P(None, MODEL_AXIS)),
    # Biases/norms/small params: replicate.
]


def _spec_for(path: str, ndim: int) -> P:
    for pat, spec in _RULES:
        if re.search(pat, path):
            if len(spec) <= ndim:
                return P(*([None] * (ndim - len(spec)) + list(spec)))
    return P()  # replicated


def param_partition_spec(params) -> Any:
    """PartitionSpec pytree for a flax param tree (TP over `model` axis)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    paths = {}
    for kp, leaf in flat:
        path = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)
        paths[path] = _spec_for(path, np.ndim(leaf))
    treedef = jax.tree_util.tree_structure(params)
    specs = [paths["/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)]
             for kp, _ in flat]
    return jax.tree_util.tree_unflatten(treedef, specs)


def _divisible(shape, spec, mesh: Mesh) -> bool:
    for dim, axis in zip(shape, tuple(spec) + (None,) * (len(shape) - len(spec))):
        if axis is None:
            continue
        if dim % mesh.shape[axis] != 0:
            return False
    return True


def with_sharding(x, spec: P, mesh: Mesh):
    """Apply a NamedSharding, falling back to replication when the spec does
    not divide the array evenly (tiny test configs)."""
    if not _divisible(np.shape(x), tuple(spec), mesh):
        spec = P()
    return jax.device_put(x, NamedSharding(mesh, spec))


def shard_params(params, mesh: Mesh):
    """Place a param tree on the mesh according to `param_partition_spec`."""
    specs = param_partition_spec(params)
    return jax.tree_util.tree_map(lambda x, s: with_sharding(x, s, mesh), params, specs)
