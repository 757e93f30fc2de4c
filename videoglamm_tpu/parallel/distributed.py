"""Multi-host / multi-slice runtime initialization.

The reference's distributed runtime is the DeepSpeed launcher + NCCL
(SURVEY §5.8). TPU-native equivalent: `jax.distributed.initialize` wires the
hosts of a pod slice (ICI) or multiple slices (DCN) into one JAX runtime;
GSPMD then treats every chip as part of the global mesh. These helpers wrap
the init + the process-0 gating the trainer/loggers need.
"""
from __future__ import annotations

import os
from typing import Optional


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Initialize the multi-host runtime. On TPU pods the arguments are
    auto-detected from the environment; pass them explicitly for manual
    CPU/GPU bring-up. Safe to call when single-process (no-op)."""
    import jax
    if num_processes is None and coordinator_address is None \
            and "COORDINATOR_ADDRESS" not in os.environ \
            and not _on_tpu_pod():
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def _on_tpu_pod() -> bool:
    return any(k in os.environ for k in
               ("TPU_WORKER_HOSTNAMES", "MEGASCALE_COORDINATOR_ADDRESS"))


def is_main_process() -> bool:
    import jax
    return jax.process_index() == 0


def global_device_mesh(model_parallel: int = 1):
    """Mesh over ALL processes' devices (DP across hosts rides DCN; TP stays
    intra-host/slice when model_parallel divides the local device count)."""
    from .mesh import create_mesh
    import jax
    return create_mesh(model=model_parallel, devices=jax.devices())
