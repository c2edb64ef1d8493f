"""Multi-host initialization — the ``init_distributed_mode`` replacement.

Reference (LAVIS/lavis/common/dist_utils.py:57-90) bootstraps an NCCL process
group from RANK/WORLD_SIZE env or SLURM. On TPU pods the analogue is
``jax.distributed.initialize()``, which reads the TPU metadata (or
COORDINATOR_ADDRESS/NUM_PROCESSES/PROCESS_ID env) and wires the DCN
rendezvous; ICI collectives need no setup at all. Single-process runs are a
no-op — there is no "disabled distributed mode" state to track.
"""

from __future__ import annotations

import logging
import os
from typing import Optional


def init_distributed_mode(initialize_fn: Optional[callable] = None) -> bool:
    """Initialize multi-host JAX if the environment asks for it. Returns
    True when running multi-process.

    Env-var matrix (reference: dist_utils.py:57-90 RANK/WORLD_SIZE/SLURM):
      * COORDINATOR_ADDRESS + NUM_PROCESSES + PROCESS_ID -> explicit init
        (the torchrun-style rendezvous);
      * MEGASCALE_COORDINATOR_ADDRESS or bare COORDINATOR_ADDRESS -> let
        ``jax.distributed.initialize()`` auto-detect from env/TPU metadata;
      * NUM_PROCESSES > 1 alone is a misconfiguration -> clear error
        (not the reference's silent "Not using distributed mode" fallback:
        a half-configured pod run should fail loudly, not run 1-process);
      * nothing set -> single-process no-op.

    ``initialize_fn`` injects a fake for tests; defaults to
    ``jax.distributed.initialize``.
    """
    import jax

    init = initialize_fn or jax.distributed.initialize
    coord = os.environ.get("COORDINATOR_ADDRESS")
    nproc = int(os.environ.get("NUM_PROCESSES", "0") or 0)
    if coord and nproc > 1:
        init(
            coordinator_address=coord,
            num_processes=nproc,
            process_id=int(os.environ["PROCESS_ID"]),
        )
    elif coord or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"):
        init()
    elif nproc > 1:
        raise RuntimeError(
            "NUM_PROCESSES>1 but COORDINATOR_ADDRESS is unset; multi-process "
            "runs need both (plus PROCESS_ID)"
        )
    multi = jax.process_count() > 1
    if multi:
        logging.info(
            "distributed: process %d/%d, %d local devices",
            jax.process_index(), jax.process_count(), jax.local_device_count(),
        )
    return multi


def is_main_process() -> bool:
    import jax

    return jax.process_index() == 0


def get_rank() -> int:
    import jax

    return jax.process_index()


def get_world_size() -> int:
    import jax

    return jax.process_count()


def main_process(func):
    """Decorator: run only on process 0 (dist_utils.py:107-114)."""
    import functools

    @functools.wraps(func)
    def wrapper(*args, **kwargs):
        if is_main_process():
            return func(*args, **kwargs)

    return wrapper
