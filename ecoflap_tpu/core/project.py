"""--cfg-path: the reference's file-level launch API.

The reference drives every run from a project YAML
(``lavis/projects/**/*.yaml`` with ``model:``/``datasets:``/``run:`` trees)
passed as ``evaluate_blip.py --cfg-path ... --options a.b=c``
(LAVIS/lavis/common/config.py:16-144); pruning hyperparameters stay
argparse flags there too. This module gives both CLIs the same surface:
a shipped tree under ``configs/projects/`` (same layout as the
reference's), loaded through ``core.config.Config`` and mapped onto the
parsed args.

Precedence (reference semantics): explicit CLI flag > ``--options``
dot-list > project YAML > parser default. "Explicit" is determined from
argv — a flag the user actually typed is never overridden by the file.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Sequence

from ecoflap_tpu.core.config import Config

# reference task registry names -> this repo's --task values
_TASK_ALIASES = {
    "multimodal_classification": "classification",
    "image_text_pretrain": None,  # calibration-only configs: no eval task
    "language_modeling": None,
}

# dotted YAML key -> args attribute, shared by both CLIs where present
_COMMON_MAP = {
    "model.arch": "model",
    "model.model_scale": "model_scale",
    "run.seed": "seed",
    "run.output_dir": "output_dir",
    "run.batch_size_eval": "batch_size",
    "run.num_beams": "num_beams",
    "run.max_len": "max_new_tokens",
    "run.length_penalty": "length_penalty",
    "run.tokenizer_path": "tokenizer_path",
}

# prune-CLI extension tree (the reference passes these as argparse flags on
# evaluate_blip.py:37-284; a prune: tree keeps one-file launches possible)
_PRUNE_MAP = {
    "prune.pruning_method": "pruning_method",
    "prune.prune_spec": "prune_spec",
    "prune.t5_prune_spec": "t5_prune_spec",
    "prune.vit_prune_spec": "vit_prune_spec",
    "prune.sparsity_ratio_granularity": "sparsity_ratio_granularity",
    "prune.max_sparsity_per_layer": "max_sparsity_per_layer",
    "prune.score_method": "score_method",
    "prune.num_data_first_stage": "num_data_first_stage",
    "prune.num_noise": "num_noise",
    "prune.noise_eps": "noise_eps",
    "prune.sparsity_type": "sparsity_type",
    "prune.num_samples": "num_samples",
    "prune.batch_size": "batch_size",
    "prune.eval_chunk": "eval_chunk",
    "prune.host_stream": "host_stream",
}


def projects_root() -> str:
    """Shipped config tree: <repo>/configs/projects."""
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), "configs", "projects")


def resolve_cfg_path(path: str) -> str:
    """Absolute/relative path, or a path relative to the shipped tree
    (``blip2/eval/vqav2_zeroshot_flant5xl_eval.yaml`` works from anywhere,
    mirroring the reference's repo-relative --cfg-path convention)."""
    if os.path.exists(path):
        return path
    shipped = os.path.join(projects_root(), path)
    if os.path.exists(shipped):
        return shipped
    raise FileNotFoundError(
        f"--cfg-path {path!r}: not a file and not under {projects_root()!r}")


def _explicit_flags(argv: Optional[Sequence[str]]) -> set:
    out = set()
    for a in argv or []:
        if a.startswith("--"):
            out.add(a[2:].split("=", 1)[0].replace("-", "_"))
    return out


def apply_cfg_path(args, argv: Optional[Sequence[str]],
                   prune: bool = False) -> Optional[Config]:
    """Merge ``--cfg-path`` + ``--options`` into ``args`` in place.

    Returns the merged Config (or None when no --cfg-path was given) so
    callers can read dataset sub-trees directly.
    """
    if not getattr(args, "cfg_path", None):
        return None
    cfg = Config(resolve_cfg_path(args.cfg_path),
                 options=getattr(args, "options", None))
    explicit = _explicit_flags(argv)

    mapping: Dict[str, str] = dict(_COMMON_MAP)
    if prune:
        mapping.update(_PRUNE_MAP)
    for dotted, attr in mapping.items():
        if not hasattr(args, attr) or attr in explicit:
            continue
        val = cfg.get(dotted)
        if val is not None:
            setattr(args, attr, val)

    task = cfg.get("run.task")
    if task is not None and hasattr(args, "task") and "task" not in explicit:
        mapped = _TASK_ALIASES.get(task, task)
        if mapped is not None:
            args.task = mapped

    # datasets: the first entry's build_info carries local paths (the
    # reference comments them out of shipped YAMLs the same way — storage is
    # machine-specific). Each key maps to the first attr the CLI actually
    # defines: the eval CLI's data flag is --ann, the prune CLI's is --calib
    # (a jsonl/text calibration source) — a path that matched no attr would
    # otherwise be DROPPED silently and the prune would run on synthetic
    # calibration data while looking configured.
    ds_cfg: Dict[str, Any] = cfg.datasets_cfg or {}
    if ds_cfg:
        _, spec = next(iter(ds_cfg.items()))
        info = (spec or {}).get("build_info", {}) or {}
        path_map = (("ann_path", ("ann", "calib")),
                    ("text_path", ("ann", "calib")),
                    ("jsonl_path", ("ann", "calib")),
                    ("vis_root", ("vis_root",)))
        for key, attrs in path_map:
            if key not in info:
                continue
            attr = next((a for a in attrs if hasattr(args, a)), None)
            if attr is not None and attr not in explicit:
                setattr(args, attr, info[key])
    return cfg
