"""Device-mesh runtime — the TPU replacement for the reference's NCCL layer.

The reference initializes a torch.distributed NCCL process group per rank
(LAVIS/lavis/common/dist_utils.py:57-90) and wraps models in DDP. On TPU the
whole distributed story is declarative: build one ``jax.sharding.Mesh`` over
the slice, annotate array shardings, and let XLA insert ICI collectives
(SURVEY.md §2.6). There is no backend code to port — these helpers only name
the axes and pick shapes.

Axes:
  ``dp`` — data parallel (batch, calibration microbatches, MeZO ensembles)
  ``tp`` — tensor parallel (big weight matrices: FlanT5-XL/XXL, LLaMA 30/65B)

Sequence/pipeline/expert axes are deliberately absent: the reference has no
long-context or MoE machinery to replicate (SURVEY.md §5 "long-context:
absent"), and at v5e-8 scale layer-sharding loses to tp (§2.6 PP row).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    dp: Optional[int] = None,
    tp: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (dp, tp) mesh over ``devices`` (default: all).

    ``dp`` defaults to n_devices // tp. tp should divide the chip count and
    map to an ICI-contiguous block (jax device order already is)."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % tp != 0:
        raise ValueError(f"tp={tp} does not divide device count {n}")
    if dp is None:
        dp = n // tp
    if dp * tp != n:
        raise ValueError(f"dp*tp = {dp * tp} != {n} devices")
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def parse_mesh_spec(spec: str) -> dict:
    """CLI mesh grammar shared by prune/evaluate: ``'dp'`` (all devices on
    the batch axis) or ``'dp=N[,tp=M]'`` -> make_mesh kwargs, with parser
    -grade errors instead of raw unpacking tracebacks."""
    if spec == "dp":
        return {"dp": None, "tp": 1}
    kv = {}
    for part in spec.split(","):
        if "=" not in part:
            raise ValueError(
                f"bad --mesh spec {spec!r}: expected 'dp' or 'dp=N[,tp=M]'")
        k, v = part.split("=", 1)
        if k not in ("dp", "tp"):
            raise ValueError(
                f"bad --mesh axis {k!r} in {spec!r} (axes: dp, tp)")
        try:
            kv[k] = int(v)
        except ValueError:
            raise ValueError(
                f"bad --mesh extent {v!r} for axis {k!r} in {spec!r}")
    if not kv:
        raise ValueError(f"empty --mesh spec {spec!r}")
    return {"dp": kv.get("dp"), "tp": kv.get("tp", 1)}


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over dp."""
    return NamedSharding(mesh, P("dp"))


def host_local_mesh_info(mesh: Mesh) -> Tuple[int, int]:
    return mesh.shape["dp"], mesh.shape["tp"]
