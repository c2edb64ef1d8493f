"""Prune-spec string parsing.

The reference encodes per-submodel pruning specs as
``"<num_layers>-<res_keep>-<attn_keep>-<ffn_keep>"`` strings (e.g.
``"24-0.5-1.0-1.0"``), parsed by ``convert_spec_to_list``
(LAVIS/lavis/compression/pruners/base_pruner.py:75-81,
layer_single_base_pruner.py:108-114). Only the second field (``res_keep``)
drives the ECoFLaP entry points — ``sparsity = 1 - res_keep``.
"""

from __future__ import annotations

from typing import NamedTuple


class PruneSpec(NamedTuple):
    num_layers: int
    res_keep_ratio: float
    attn_keep_ratio: float
    ffn_keep_ratio: float

    @property
    def sparsity(self) -> float:
        """Target unstructured sparsity implied by the spec."""
        return 1.0 - self.res_keep_ratio


def parse_prune_spec(spec: str) -> PruneSpec:
    parts = spec.split("-")
    if len(parts) != 4:
        raise ValueError(
            f"prune spec must be '<layers>-<res>-<attn>-<ffn>', got {spec!r}"
        )
    num_layers = int(parts[0])
    res, attn, ffn = (float(x) for x in parts[1:])
    for name, v in (("res", res), ("attn", attn), ("ffn", ffn)):
        if not 0.0 <= v <= 1.0:
            raise ValueError(f"{name} keep ratio {v} outside [0, 1] in {spec!r}")
    return PruneSpec(num_layers, res, attn, ffn)


def format_prune_spec(spec: PruneSpec) -> str:
    return (
        f"{spec.num_layers}-{spec.res_keep_ratio}-"
        f"{spec.attn_keep_ratio}-{spec.ffn_keep_ratio}"
    )
