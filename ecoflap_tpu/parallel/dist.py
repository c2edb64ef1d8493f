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


def init_distributed_mode() -> bool:
    """Initialize multi-host JAX if the environment asks for it. Returns
    True when running multi-process."""
    import jax

    if os.environ.get("COORDINATOR_ADDRESS") or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()
    elif int(os.environ.get("NUM_PROCESSES", "1")) > 1:
        jax.distributed.initialize(
            coordinator_address=os.environ["COORDINATOR_ADDRESS"],
            num_processes=int(os.environ["NUM_PROCESSES"]),
            process_id=int(os.environ["PROCESS_ID"]),
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
