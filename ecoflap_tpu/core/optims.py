"""LR schedules + optimizer factory.

Reference (LAVIS/lavis/common/optims.py:117): ``LinearWarmupCosineLRScheduler``
and ``LinearWarmupStepLRScheduler`` registered as lr_schedulers, plus the
AdamW weight-decay split (runner_base.py:102-132 — no decay for params with
ndim < 2, i.e. biases/norms). Expressed as optax schedules/transforms.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import optax

from ecoflap_tpu.core.registry import registry


@registry.register("lr_scheduler", "linear_warmup_cosine_lr")
def linear_warmup_cosine_lr(
    init_lr: float,
    min_lr: float,
    warmup_steps: int,
    decay_steps: int,
    warmup_start_lr: float = -1.0,
    **_: Any,
) -> optax.Schedule:
    """Linear warmup then cosine decay to min_lr (optims.py class of the same
    name; warmup_start_lr -1 means start at 0)."""
    start = 0.0 if warmup_start_lr < 0 else warmup_start_lr
    return optax.join_schedules(
        [
            optax.linear_schedule(start, init_lr, max(warmup_steps, 1)),
            optax.cosine_decay_schedule(
                init_lr, max(decay_steps - warmup_steps, 1),
                alpha=min_lr / max(init_lr, 1e-12),
            ),
        ],
        [max(warmup_steps, 1)],
    )


@registry.register("lr_scheduler", "linear_warmup_step_lr")
def linear_warmup_step_lr(
    init_lr: float,
    min_lr: float,
    warmup_steps: int,
    decay_rate: float = 1.0,
    steps_per_epoch: int = 1,
    warmup_start_lr: float = -1.0,
    **_: Any,
) -> optax.Schedule:
    """Linear warmup then per-epoch step decay (optims.py step_lr_schedule)."""
    start = 0.0 if warmup_start_lr < 0 else warmup_start_lr
    warm = optax.linear_schedule(start, init_lr, max(warmup_steps, 1))

    def step_decay(count):
        epoch = count // max(steps_per_epoch, 1)
        lr = init_lr * (decay_rate**epoch)
        return jax.numpy.maximum(lr, min_lr)

    return optax.join_schedules([warm, step_decay], [max(warmup_steps, 1)])


def make_optimizer(
    lr: Any,
    weight_decay: float = 0.05,
    beta2: float = 0.999,
) -> optax.GradientTransformation:
    """AdamW with the reference's decay split: no weight decay on 1-D params
    (biases, norm scales) — runner_base.py:110-126."""
    return optax.adamw(
        lr, b2=beta2, weight_decay=weight_decay,
        mask=lambda params: jax.tree_util.tree_map(
            lambda p: p.ndim >= 2, params
        ),
    )
