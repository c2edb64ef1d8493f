"""Infra: LR schedules, optimizer decay mask, loaders, logger, dist, runner."""

import logging

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ecoflap_tpu.core.optims import (
    linear_warmup_cosine_lr,
    linear_warmup_step_lr,
    make_optimizer,
)
from ecoflap_tpu.data.loaders import IterLoader, MultiIterLoader, PrefetchLoader
from ecoflap_tpu.parallel.dist import get_rank, get_world_size, is_main_process
from ecoflap_tpu.runners.runner import Runner, global_sparsity
from ecoflap_tpu.utils.logger import MetricLogger, SmoothedValue


def test_warmup_cosine_schedule():
    sched = linear_warmup_cosine_lr(
        init_lr=1e-4, min_lr=1e-6, warmup_steps=10, decay_steps=110)
    assert float(sched(0)) < 1e-5
    assert abs(float(sched(10)) - 1e-4) < 1e-8
    assert float(sched(60)) < 1e-4
    assert float(sched(200)) <= 1e-4
    assert float(sched(110)) >= 1e-6 - 1e-9


def test_warmup_step_schedule():
    sched = linear_warmup_step_lr(
        init_lr=1e-3, min_lr=1e-5, warmup_steps=5, decay_rate=0.1,
        steps_per_epoch=10)
    assert abs(float(sched(5)) - 1e-3) < 1e-9
    # count inside step phase is relative; after one epoch it has decayed
    assert float(sched(16)) < float(sched(6))


def test_optimizer_decay_mask():
    params = {"w": jnp.ones((4, 4)), "b": jnp.ones((4,))}
    opt = make_optimizer(1e-2, weight_decay=0.5)
    state = opt.init(params)
    grads = {"w": jnp.zeros((4, 4)), "b": jnp.zeros((4,))}
    updates, _ = opt.update(grads, state, params)
    # zero grads: only weight decay moves params; bias must be untouched
    assert float(jnp.abs(updates["b"]).max()) == 0.0
    assert float(jnp.abs(updates["w"]).max()) > 0.0


def test_iter_loader_resets():
    loader = IterLoader(lambda: iter([1, 2, 3]))
    out = [next(loader) for _ in range(7)]
    assert out == [1, 2, 3, 1, 2, 3, 1]
    assert loader.epoch == 2


def test_multi_iter_loader_ratios():
    a = IterLoader(lambda: iter(["a"]))
    b = IterLoader(lambda: iter(["b"]))
    ml = MultiIterLoader([a, b], ratios=[9, 1], seed=0)
    draws = [next(ml) for _ in range(200)]
    assert draws.count("a") > 150


def test_prefetch_loader_order():
    pl = PrefetchLoader([{"x": np.asarray([i])} for i in range(5)])
    out = [int(b["x"][0]) for b in pl]
    assert out == [0, 1, 2, 3, 4]


def test_metric_logger():
    ml = MetricLogger()
    for v in [1.0, 2.0, 3.0]:
        ml.update(loss=v)
    assert abs(ml.meters["loss"].global_avg - 2.0) < 1e-9
    assert "loss" in str(ml)
    sv = SmoothedValue(window_size=2)
    sv.update(1.0)
    sv.update(5.0)
    assert sv.avg == 3.0


def test_dist_single_process():
    assert get_rank() == 0
    assert get_world_size() == 1
    assert is_main_process()


def test_init_distributed_env_matrix(monkeypatch):
    """All init_distributed_mode branches (dist_utils.py:57-90 equivalent)
    without touching real distributed state."""
    import pytest

    from ecoflap_tpu.parallel.dist import init_distributed_mode

    calls = []

    def fake_init(**kwargs):
        calls.append(kwargs)

    for var in ("COORDINATOR_ADDRESS", "MEGASCALE_COORDINATOR_ADDRESS",
                "NUM_PROCESSES", "PROCESS_ID"):
        monkeypatch.delenv(var, raising=False)

    # 1) nothing set -> no-op, single-process
    assert init_distributed_mode(fake_init) is False
    assert calls == []

    # 2) explicit torchrun-style rendezvous -> explicit kwargs
    monkeypatch.setenv("COORDINATOR_ADDRESS", "10.0.0.1:1234")
    monkeypatch.setenv("NUM_PROCESSES", "4")
    monkeypatch.setenv("PROCESS_ID", "2")
    init_distributed_mode(fake_init)
    assert calls == [dict(coordinator_address="10.0.0.1:1234",
                          num_processes=4, process_id=2)]

    # 3) coordinator alone -> auto-detect initialize()
    calls.clear()
    monkeypatch.delenv("NUM_PROCESSES")
    monkeypatch.delenv("PROCESS_ID")
    init_distributed_mode(fake_init)
    assert calls == [{}]

    # 4) megascale auto-detect
    calls.clear()
    monkeypatch.delenv("COORDINATOR_ADDRESS")
    monkeypatch.setenv("MEGASCALE_COORDINATOR_ADDRESS", "coord:8476")
    init_distributed_mode(fake_init)
    assert calls == [{}]

    # 5) NUM_PROCESSES>1 without a coordinator -> loud failure
    calls.clear()
    monkeypatch.delenv("MEGASCALE_COORDINATOR_ADDRESS")
    monkeypatch.setenv("NUM_PROCESSES", "2")
    with pytest.raises(RuntimeError, match="COORDINATOR_ADDRESS"):
        init_distributed_mode(fake_init)
    assert calls == []


def test_runner_artifacts(tmp_path):
    r = Runner(str(tmp_path), "jobx")
    p = r.save_sparsity_dict({"a.weight": 0.5})
    assert p and p.endswith("jobx.yaml")
    s = r.save_training_statistics(12.3, {"note": "test"})
    import yaml

    stats = yaml.safe_load(open(s))
    assert stats["spent_time"] == 12.3
    r.log_metrics({"agg_metrics": 1.0})
    assert (tmp_path / "evaluate.txt").exists()
    assert global_sparsity({"w": jnp.asarray([0.0, 1.0, 0.0, 2.0])}) == 0.5


def test_runner_checkpoint_roundtrip(tmp_path):
    r = Runner(str(tmp_path), "ck")
    params = {"a": jnp.arange(6.0).reshape(2, 3), "b": {"c": jnp.ones((4,))}}
    r.save_checkpoint(params, "ckpt")
    back = r.load_checkpoint(params, "ckpt")
    np.testing.assert_array_equal(np.asarray(back["a"]), np.asarray(params["a"]))
    np.testing.assert_array_equal(np.asarray(back["b"]["c"]),
                                  np.asarray(params["b"]["c"]))


def test_timer_and_print_time(capsys):
    from ecoflap_tpu.utils.profiling import Timer, print_time

    t = Timer()
    with t("phase_a"):
        pass
    with t("phase_a"):
        pass
    assert "phase_a" in t.summary()

    @print_time
    def f():
        return 3

    assert f() == 3
    assert "f spent" in capsys.readouterr().out


def test_train_runner_best_ckpt(tmp_path):
    import optax

    from ecoflap_tpu.models import llama
    from ecoflap_tpu.runners.runner import TrainRunner

    cfg = llama.tiny_config()
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(2, cfg.vocab_size, size=(8, 10)), jnp.int32)

    def loss_fn(p, batch):
        return llama.per_sample_loss(cfg, p, batch["input_ids"])

    r = TrainRunner(str(tmp_path), "train", max_epoch=2)
    best = r.train(
        loss_fn, params,
        epoch_batches_fn=lambda e: [{"input_ids": ids}] * 3,
        optimizer=optax.adam(1e-2),
    )
    assert r.best_epoch >= 0
    assert (tmp_path / "checkpoint_best").exists()
    l0 = float(jnp.mean(loss_fn(params, {"input_ids": ids})))
    l1 = float(jnp.mean(loss_fn(best, {"input_ids": ids})))
    assert l1 < l0


def test_iter_train_runner(tmp_path):
    import itertools

    import optax

    from ecoflap_tpu.data.loaders import IterLoader
    from ecoflap_tpu.models import llama
    from ecoflap_tpu.runners.runner import IterTrainRunner

    cfg = llama.tiny_config()
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(2, cfg.vocab_size, size=(4, 8)), jnp.int32)

    def loss_fn(p, batch):
        return llama.per_sample_loss(cfg, p, batch["input_ids"])

    loader = IterLoader(lambda: iter([{"input_ids": ids}] * 2))
    r = IterTrainRunner(str(tmp_path), "it", max_iters=6,
                        iters_per_inner_epoch=3)
    best = r.train_iters(loss_fn, params, loader, optimizer=optax.adam(1e-2))
    assert r.best_epoch >= 0
    l0 = float(jnp.mean(loss_fn(params, {"input_ids": ids})))
    l1 = float(jnp.mean(loss_fn(best, {"input_ids": ids})))
    assert l1 < l0


def test_train_runner_resume_restores_optimizer_and_epoch(tmp_path):
    """Resumed training must continue from the saved epoch with the saved
    optimizer state: run A trains 3 epochs straight; run B trains 1 epoch,
    then resumes for the remaining 2 — identical data order must give
    identical final params (reference resume contract,
    runner_base.py:897-967)."""
    import optax

    from ecoflap_tpu.models import llama
    from ecoflap_tpu.runners.runner import TrainRunner

    cfg = llama.tiny_config()
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    batches = {
        e: [{"input_ids": jnp.asarray(
            rng.integers(2, cfg.vocab_size, size=(4, 8)), jnp.int32)}]
        for e in range(3)
    }

    def loss_fn(p, batch):
        return llama.per_sample_loss(cfg, p, batch["input_ids"])

    ra = TrainRunner(str(tmp_path / "a"), "a", max_epoch=3)
    best_a = ra.train(loss_fn, params, lambda e: batches[e],
                      optimizer=optax.adam(1e-2))

    rb = TrainRunner(str(tmp_path / "b"), "b", max_epoch=1)
    rb.train(loss_fn, params, lambda e: batches[e], optimizer=optax.adam(1e-2))
    rb2 = TrainRunner(str(tmp_path / "b"), "b", max_epoch=3)
    best_b = rb2.train(loss_fn, params, lambda e: batches[e],
                       optimizer=optax.adam(1e-2), resume=True)

    from ecoflap_tpu.core.pytree import flatten_named

    fa, fb = flatten_named(best_a), flatten_named(best_b)
    for k in fa:
        np.testing.assert_allclose(np.asarray(fa[k]), np.asarray(fb[k]),
                                   rtol=1e-6, atol=1e-6, err_msg=k)


def test_train_runner_split_aware_eval(tmp_path):
    """Reference split semantics (runner_base.py:378-417): best-ckpt
    selection keys ONLY on the "val" split's agg_metrics, every valid split's
    log records best_epoch, and the testing phase runs once on the BEST
    params over the test splits."""
    import json as _json

    import optax

    from ecoflap_tpu.models import llama
    from ecoflap_tpu.runners.runner import TrainRunner

    cfg = llama.tiny_config()
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(2, cfg.vocab_size, size=(4, 8)), jnp.int32)

    def loss_fn(p, batch):
        return llama.per_sample_loss(cfg, p, batch["input_ids"])

    # val agg peaks at epoch 1 then drops; val_seen rises monotonically and
    # must NOT drive best selection
    val_aggs = {0: 1.0, 1: 5.0, 2: 2.0}
    seen_aggs = {0: 1.0, 1: 2.0, 2: 9.0}
    state = {"epoch": -1, "test_evals": []}

    class FakeTask:
        def evaluation(self, data):
            if data["split"] == "test":
                state["test_evals"].append(data["params_tag"][0])
                return {"agg_metrics": 0.0}
            aggs = val_aggs if data["split"] == "val" else seen_aggs
            return {"agg_metrics": aggs[state["epoch"]]}

    def epoch_batches(e):
        state["epoch"] = e
        return [{"input_ids": ids}]

    tag = ["init"]

    r = TrainRunner(str(tmp_path), "split", max_epoch=3)
    best = r.train(
        loss_fn, params, epoch_batches, task=FakeTask(),
        optimizer=optax.adam(1e-2),
        valid_splits_fn=lambda: {"val": {"split": "val"},
                                 "val_seen": {"split": "val_seen"}},
        test_splits_fn=lambda: {"test": {"split": "test", "params_tag": tag}},
        set_params_fn=lambda p: tag.__setitem__(0, "best"),
    )
    assert r.best_epoch == 1  # val peak, not val_seen's epoch-2 peak
    assert state["test_evals"] == ["best"]  # test ran once, after rebind
    logs = [
        _json.loads(line)
        for line in open(tmp_path / "evaluate.txt").read().splitlines()
    ]
    val_logs = [v for l in logs for k, v in l.items() if k == "val"]
    assert [v["best_epoch"] for v in val_logs] == [0, 1, 1]
    test_logs = [v for l in logs for k, v in l.items() if k == "test"]
    assert len(test_logs) == 1 and test_logs[0]["epoch"] == 1
    # best params come from epoch 1, not the final epoch
    from ecoflap_tpu.core.pytree import flatten_named

    assert any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(flatten_named(best).values(),
                        flatten_named(params).values())
    )


def test_xl_mesh_compile_smoke():
    """ECOFLAP_DRYRUN_XL=1: AOT compile-only pass over the XL-shaped coarse
    (lane scorer) + fine (fused step) programs under a dp=4,tp=2 virtual
    CPU mesh with Megatron param shardings (abstract 4B-param tree).
    Env-gated: ~5-10 min of pure XLA compilation."""
    import os
    import pytest

    if os.environ.get("ECOFLAP_DRYRUN_XL") != "1":
        pytest.skip("set ECOFLAP_DRYRUN_XL=1 to run the XL compile smoke")
    import __graft_entry__ as g

    g.dryrun_xl_compile(8)
