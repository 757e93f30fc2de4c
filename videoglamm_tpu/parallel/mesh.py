"""Device-mesh construction.

The reference's only parallelism is DeepSpeed ZeRO-2 data parallelism over
NCCL (/root/reference/VideoGLaMM/utils/trainer.py:41-48). Here all parallelism
is expressed through one `jax.sharding.Mesh` with two logical axes:

- ``data``  : batch sharding (DP); optimizer state is additionally sharded
              along this axis (ZeRO-2 equivalent).
- ``model`` : tensor parallelism for attention heads / MLP hidden dims of the
              towers and the LLM.

Collectives are inserted by GSPMD from sharding annotations; they ride ICI
inside a slice and DCN across slices automatically.
"""
from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"


def create_mesh(data: int = -1, model: int = 1, devices=None) -> Mesh:
    """Build a 2D (data, model) mesh over the given devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data <= 0:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def local_mesh() -> Mesh:
    """Single-axis data mesh over all local devices (pure DP)."""
    return create_mesh(data=len(jax.devices()), model=1)
