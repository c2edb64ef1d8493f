"""Runner — evaluation loops, pruning-artifact IO, checkpoint save/resume.

Rebuild of ``RunnerBase`` (LAVIS/lavis/runners/runner_base.py) minus the DDP
plumbing (the mesh runtime replaces it, parallel/mesh.py):

* ``evaluate`` — batches through a task's evaluation (runner_base.py:419-428).
* ``get_calibration_batch`` — the count-limited importance loader
  (:645-693), returning ONE stacked pytree batch.
* pruning artifacts — sparsity dict YAML + pruned checkpoint + stats YAML
  (wall-clock / peak memory), mirroring evaluate_blip.py:438-472's
  ``sparsity_dict/``, ``pruned_checkpoint/``, ``training_statistics/``.
* checkpoints — orbax for pytrees (resume), torch-format .pth export for
  cross-tool parity (utils/checkpoint.py).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Callable, Dict, Iterable, Optional

import jax
import numpy as np
import yaml

PyTree = Any


class Runner:
    def __init__(self, output_dir: str = "output", job_id: str = "job"):
        self.output_dir = output_dir
        self.job_id = job_id
        os.makedirs(output_dir, exist_ok=True)

    # -- evaluation --------------------------------------------------------

    def evaluate(self, task, data) -> Dict[str, float]:
        t0 = time.time()
        metrics = task.evaluation(data)
        metrics["eval_time_s"] = round(time.time() - t0, 2)
        self.log_metrics(metrics)
        return metrics

    def evaluate_splits(self, task, split_data: Dict[str, Any],
                        cur_epoch: Any = "best") -> Dict[str, Dict[str, float]]:
        """Split-aware evaluation loop — the reference's testing phase
        (RunnerBase.evaluate, runner_base.py:419-428): one ``eval_epoch`` per
        test split, each logged under its split name."""
        logs: Dict[str, Dict[str, float]] = {}
        for split_name, data in split_data.items():
            t0 = time.time()
            metrics = task.evaluation(data)
            metrics["eval_time_s"] = round(time.time() - t0, 2)
            metrics["epoch"] = cur_epoch
            self.log_metrics(metrics, split=split_name)
            logs[split_name] = metrics
        return logs

    def log_metrics(self, metrics: Dict[str, float], split: str = "val") -> None:
        """Append JSON line to evaluate.txt (vqa.py:178-181 convention)."""
        path = os.path.join(self.output_dir, "evaluate.txt")
        with open(path, "a") as f:
            f.write(json.dumps({split: metrics}) + "\n")

    # -- pruning artifacts (evaluate_blip.py:438-472) -----------------------

    def save_sparsity_dict(self, sparsity_dict: Optional[Dict[str, float]]) -> Optional[str]:
        if sparsity_dict is None:
            return None
        d = os.path.join(self.output_dir, "sparsity_dict")
        os.makedirs(d, exist_ok=True)
        path = os.path.join(d, f"{self.job_id}.yaml")
        with open(path, "w") as f:
            yaml.safe_dump({k: float(v) for k, v in sparsity_dict.items()}, f)
        return path

    def save_training_statistics(self, wall_clock_s: float,
                                 extra: Optional[Dict] = None) -> str:
        d = os.path.join(self.output_dir, "training_statistics")
        os.makedirs(d, exist_ok=True)
        stats: Dict[str, Any] = {"spent_time": round(wall_clock_s, 1)}
        try:
            ms = jax.devices()[0].memory_stats()
            if ms:
                stats["max_memory_GiB"] = round(
                    ms.get("peak_bytes_in_use", 0) / 2**30, 2)
        except Exception:
            pass
        stats.update(extra or {})
        path = os.path.join(d, f"{self.job_id}.yaml")
        with open(path, "w") as f:
            yaml.safe_dump(stats, f)
        return path

    # -- checkpoints --------------------------------------------------------

    def save_checkpoint(self, params: PyTree, name: str = "checkpoint_best") -> str:
        import orbax.checkpoint as ocp

        path = os.path.abspath(os.path.join(self.output_dir, name))
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, params, force=True)
        ckptr.wait_until_finished()
        return path

    def load_checkpoint(self, template: PyTree, name: str = "checkpoint_best") -> PyTree:
        import orbax.checkpoint as ocp

        path = os.path.abspath(os.path.join(self.output_dir, name))
        ckptr = ocp.StandardCheckpointer()
        shapes = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), template
        )
        return ckptr.restore(path, shapes)

    def save_pruned_torch(self, state_dict: Dict[str, np.ndarray],
                          name: Optional[str] = None) -> str:
        """Reference-compatible .pth under pruned_checkpoint/."""
        from ecoflap_tpu.utils.checkpoint import save_torch_checkpoint

        d = os.path.join(self.output_dir, "pruned_checkpoint")
        os.makedirs(d, exist_ok=True)
        path = os.path.join(d, f"{name or self.job_id}.pth")
        save_torch_checkpoint(state_dict, path)
        return path


class TrainRunner(Runner):
    """Epoch-based training orchestration — RunnerBase.train
    (runner_base.py:360-417): per-epoch masked train pass, evaluation,
    best-checkpoint tracking on ``agg_metrics``, resumable train state.

    Full train state ``{params, opt_state, epoch, best_agg, best_epoch}``
    is checkpointed per epoch and restored by ``resume=True`` — the
    reference's ``{model, optimizer, config, scaler, epoch}`` dict
    (runner_base.py:897-967). No scaler state exists here: bf16 on TPU
    needs no AMP loss scaling."""

    def __init__(self, output_dir: str = "output", job_id: str = "job",
                 max_epoch: int = 1):
        super().__init__(output_dir, job_id)
        self.max_epoch = max_epoch
        self.best_agg = float("-inf")
        self.best_epoch = -1

    def save_train_state(self, params, opt_state, epoch: int,
                         name: str = "train_state") -> str:
        import jax.numpy as jnp

        return self.save_checkpoint({
            "params": params,
            "opt_state": opt_state,
            "epoch": jnp.asarray(epoch, jnp.int32),
            "best_agg": jnp.asarray(self.best_agg, jnp.float32),
            "best_epoch": jnp.asarray(self.best_epoch, jnp.int32),
        }, name)

    def load_train_state(self, params_template, opt_state_template,
                         name: str = "train_state"):
        """(params, opt_state, next_epoch) — also restores best-ckpt
        tracking (reference _load_checkpoint, runner_base.py:945-967)."""
        import jax.numpy as jnp

        state = self.load_checkpoint({
            "params": params_template,
            "opt_state": opt_state_template,
            "epoch": jnp.zeros((), jnp.int32),
            "best_agg": jnp.zeros((), jnp.float32),
            "best_epoch": jnp.zeros((), jnp.int32),
        }, name)
        self.best_agg = float(state["best_agg"])
        self.best_epoch = int(state["best_epoch"])
        return state["params"], state["opt_state"], int(state["epoch"]) + 1

    def train(self, loss_fn, params, epoch_batches_fn, task=None,
              eval_data_fn=None, optimizer=None, masks=None,
              learning_rate: float = 1e-5, weight_decay: float = 0.05,
              resume: bool = False, valid_splits_fn=None,
              test_splits_fn=None, set_params_fn=None):
        """epoch_batches_fn(epoch) -> iterable of batches. ``resume=True``
        restarts from the last saved train state (optimizer + epoch included).

        Split-aware evaluation (RunnerBase.train, runner_base.py:360-417):
        ``valid_splits_fn() -> {split: data}`` evaluates every valid split per
        epoch; best-checkpoint selection keys STRICTLY on the "val" split's
        ``agg_metrics`` (matching runner_base.py:393 — other split names are
        logged but never drive checkpoint_best; a warning is logged when no
        "val" split exists), and each val log records ``best_epoch``. After the last epoch, ``test_splits_fn`` runs
        the testing phase on the BEST params (the reference reloads
        checkpoint_best). ``eval_data_fn`` is the single-split shorthand —
        equivalent to ``valid_splits_fn=lambda: {"val": eval_data_fn()}``.
        Returns best params."""
        import optax

        from ecoflap_tpu.runners.finetune import (
            make_sparsity_masks,
            make_train_step,
        )

        optimizer = optimizer or optax.adamw(learning_rate,
                                             weight_decay=weight_decay)
        masks = masks if masks is not None else make_sparsity_masks(params)
        opt_state = optimizer.init(params)
        start_epoch = 0
        if resume:
            params, opt_state, start_epoch = self.load_train_state(
                params, opt_state)
        step = make_train_step(loss_fn, optimizer, donate=False)
        best_params = params
        if eval_data_fn is not None and valid_splits_fn is None:
            valid_splits_fn = lambda: {"val": eval_data_fn()}  # noqa: E731

        for epoch in range(start_epoch, self.max_epoch):
            losses = []
            for batch in epoch_batches_fn(epoch):
                params, opt_state, loss = step(params, opt_state, masks, batch)
                losses.append(float(loss))
            train_metrics: Dict[str, Any] = {
                "epoch": epoch,
                "train_loss": sum(losses) / max(len(losses), 1),
            }
            self.log_metrics(train_metrics, split="train")

            if task is not None and valid_splits_fn is not None:
                splits = valid_splits_fn()
                if "val" not in splits:
                    import logging

                    logging.getLogger(__name__).warning(
                        "valid splits %s contain no 'val' entry: "
                        "checkpoint_best will never be saved and the test "
                        "phase runs on the initial params "
                        "(best-ckpt selection keys on 'val' only, "
                        "runner_base.py:393)", sorted(splits))
                for split_name, data in splits.items():
                    val_log = dict(train_metrics)
                    val_log.update(task.evaluation(data))
                    # best-ckpt selection keys on the "val" split ONLY
                    # (runner_base.py:392-397); single-split callers get it
                    # by default via the eval_data_fn shorthand
                    agg = val_log.get("agg_metrics",
                                      -val_log["train_loss"])
                    if split_name == "val" and agg > self.best_agg:
                        self.best_agg, self.best_epoch = agg, epoch
                        best_params = params
                        self.save_checkpoint(params, "checkpoint_best")
                    val_log["best_epoch"] = self.best_epoch
                    self.log_metrics(val_log, split=split_name)
            else:
                # no valid splits: track by train loss so best_params/"best"
                # semantics stay meaningful (reference instead saves a
                # per-epoch checkpoint, runner_base.py:402-405 — our
                # save_train_state below covers that)
                agg = -train_metrics["train_loss"]
                if agg > self.best_agg:
                    self.best_agg, self.best_epoch = agg, epoch
                    best_params = params
                    self.save_checkpoint(params, "checkpoint_best")
            self.save_train_state(params, opt_state, epoch)

        if task is not None and test_splits_fn is not None:
            # testing phase on the BEST params (runner_base.py:411-417 —
            # the reference reloads checkpoint_best into the model; tasks
            # here close over params via predict_fn, so the caller rebinds
            # through set_params_fn)
            if set_params_fn is not None:
                set_params_fn(best_params)
            self.evaluate_splits(task, test_splits_fn(),
                                 cur_epoch=self.best_epoch)
        return best_params


class IterTrainRunner(TrainRunner):
    """Iteration-based runner (RunnerIter, lavis/runners/runner_iter.py):
    trains in fixed-size inner "epochs" of ``iters_per_inner_epoch`` steps
    over an infinite iterator instead of dataset epochs."""

    def __init__(self, output_dir: str = "output", job_id: str = "job",
                 max_iters: int = 100, iters_per_inner_epoch: int = 10):
        super().__init__(output_dir, job_id,
                         max_epoch=max(1, max_iters // iters_per_inner_epoch))
        self.iters_per_inner_epoch = iters_per_inner_epoch

    def train_iters(self, loss_fn, params, infinite_batches, **kw):
        it = iter(infinite_batches)

        def epoch_batches(_epoch):
            return [next(it) for _ in range(self.iters_per_inner_epoch)]

        return self.train(loss_fn, params, epoch_batches, **kw)


def global_sparsity(params: PyTree) -> float:
    """Σ(p==0)/Σnumel over all leaves (evaluate_blip.py:432-436).

    Host (numpy) leaves — e.g. after a --host_stream prune — count on the
    host: a jnp reduction would round-trip every block's weights through the
    device (13 GB at LLaMA-7B) just to count zeros."""
    import numpy as np

    import jax.numpy as jnp

    zeros = total = 0
    for leaf in jax.tree_util.tree_leaves(params):
        if isinstance(leaf, np.ndarray):
            zeros += int(np.sum(leaf == 0))
        else:
            zeros += int(jnp.sum(leaf == 0))
        total += int(leaf.size)
    return zeros / max(total, 1)
