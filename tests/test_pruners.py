"""End-to-end pruner classes (registry API) on the toy adapter."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.toy import make_toy_adapter, make_toy_batch

from ecoflap_tpu.pruning import load_pruner
from ecoflap_tpu.pruning.pruners import GlobalMagPruner, WandaPruner


@pytest.fixture
def setup():
    adapter = make_toy_adapter(num_blocks=4, dim=16, hidden=32)
    batch = make_toy_batch(n=32, dim=16)
    return adapter, batch


def test_registry_dispatch(setup):
    adapter, batch = setup
    pruner = load_pruner(
        "blipt5_wanda_pruner",
        adapter,
        batch,
        num_microbatches=4,
        cfg={"prune_spec": "4-0.5-1.0-1.0", "verbose": False},
    )
    assert isinstance(pruner, WandaPruner)


def test_uniform_wanda_prune(setup):
    adapter, batch = setup
    pruner = load_pruner(
        "t5_wanda_pruner",
        adapter,
        batch,
        num_microbatches=4,
        cfg={"prune_spec": "4-0.5-1.0-1.0", "verbose": False},
    )
    params, sparsity_dict = pruner.prune()
    assert sparsity_dict is None  # no granularity -> uniform, no dict
    assert pruner.check_sparsity() == pytest.approx(0.5, abs=0.02)


def test_ecoflap_zeroth_two_stage(setup):
    """Full ECoFLaP: MeZO coarse stage at block granularity + wanda fine."""
    adapter, batch = setup
    pruner = load_pruner(
        "blipt5_wanda_pruner",
        adapter,
        batch,
        num_microbatches=4,
        cfg={
            "prune_spec": "4-0.5-1.0-1.0",
            "sparsity_ratio_granularity": "block",
            "score_method": "MEZO-GradOnly_sum",
            "max_sparsity_per_layer": 0.6,
            "num_data_first_stage": 16,
            "verbose": False,
        },
    )
    params, sparsity_dict = pruner.prune()
    assert sparsity_dict is not None
    # per-block ratios: all weights in a block share the block's ratio
    keys = sorted(sparsity_dict)
    assert "toy.blocks.0.fc1.weight" in sparsity_dict
    for i in range(4):
        assert sparsity_dict[f"toy.blocks.{i}.fc1.weight"] == pytest.approx(
            sparsity_dict[f"toy.blocks.{i}.fc2.weight"]
        )
        assert sparsity_dict[f"toy.blocks.{i}.fc1.weight"] <= 0.6 + 1e-6
    # global budget approximately preserved
    assert pruner.check_sparsity() == pytest.approx(0.5, abs=0.03)


def test_first_order_two_stage(setup):
    adapter, batch = setup
    pruner = load_pruner(
        "blipt5_wanda_pruner",
        adapter,
        batch,
        num_microbatches=4,
        cfg={
            "prune_spec": "4-0.5-1.0-1.0",
            "sparsity_ratio_granularity": "block",
            "score_method": "GradMagAbs_sum",
            "max_sparsity_per_layer": 0.7,
            "num_data_first_stage": 16,
            "verbose": False,
        },
    )
    _, sparsity_dict = pruner.prune()
    assert sparsity_dict is not None
    assert pruner.check_sparsity() == pytest.approx(0.5, abs=0.03)


def test_sparsity_dict_reuse(setup):
    """Passing a precomputed sparsity dict skips the coarse stage
    (--sparsity_dict flag, wanda_pruner.py:293-296)."""
    adapter, batch = setup
    stack = adapter.stacks[0]
    given = {}
    for i in range(4):
        for local in stack.linear_names:
            given[stack.weight_key(i, local)] = 0.5
    pruner = load_pruner(
        "t5_wanda_pruner",
        adapter,
        batch,
        num_microbatches=4,
        cfg={
            "prune_spec": "4-0.5-1.0-1.0",
            "sparsity_dict": given,
            "sparsity_ratio_granularity": "block",
            "verbose": False,
        },
    )
    _, sd = pruner.prune()
    assert sd == given


def test_global_mag_pruner(setup):
    adapter, batch = setup
    pruner = load_pruner(
        "blipt5_global_mag_pruner",
        adapter,
        batch,
        num_microbatches=4,
        cfg={"prune_spec": "4-0.5-1.0-1.0", "iteration": 3, "verbose": False},
    )
    assert isinstance(pruner, GlobalMagPruner)
    params, _ = pruner.prune()

    targets = adapter.targets()
    zeros = sum(int(jnp.sum(t.get(params) == 0)) for t in targets)
    total = sum(t.numel(params) for t in targets)
    assert zeros / total == pytest.approx(0.5, abs=0.02)


def test_global_mezo_whole_tensor_masks(setup):
    """Reference's global MeZO pruner keeps/drops whole tensors."""
    adapter, batch = setup
    pruner = load_pruner(
        "blipt5_global_mezo_pruner",
        adapter,
        batch,
        num_microbatches=4,
        cfg={"prune_spec": "4-0.5-1.0-1.0", "iteration": 1, "verbose": False},
    )
    params, _ = pruner.prune()
    for t in adapter.targets():
        w = np.asarray(t.get(params))
        frac = (w == 0).mean()
        assert frac in (0.0, 1.0)


def test_two_stage_pruner_host_stream_end_to_end():
    """Full TwoStagePruner with host_stream: coarse on device params, blocks
    pulled to host before the fine stage, dict + sparsity identical to the
    device-resident run."""
    import numpy as np

    from ecoflap_tpu.models import llama
    from ecoflap_tpu.pruning.pruners import WandaPruner

    cfg = llama.tiny_config()
    rng = np.random.default_rng(0)
    batch = {"input_ids": jnp.asarray(
        rng.integers(2, cfg.vocab_size, size=(16, 12)), jnp.int32)}

    def run(host_stream):
        params = llama.init_params(cfg, jax.random.PRNGKey(5))
        pruner = WandaPruner(
            llama.make_adapter(cfg, params), batch, num_microbatches=4,
            stack_specs={"model.layers": f"{cfg.num_layers}-0.5-1.0-1.0"},
            sparsity_ratio_granularity="block",
            score_method="MEZO-GradOnly_sum", num_data_first_stage=8,
            max_sparsity_per_layer=0.7, key=jax.random.PRNGKey(0),
            host_stream=host_stream, verbose=False,
        )
        pruned, sdict = pruner.prune()
        return pruned, sdict, pruner.check_sparsity()

    ref_params, ref_dict, ref_sp = run(False)
    hs_params, hs_dict, hs_sp = run(True)
    assert ref_dict == hs_dict
    assert abs(ref_sp - hs_sp) < 1e-6
    for a, b in zip(jax.tree_util.tree_leaves(ref_params),
                    jax.tree_util.tree_leaves(hs_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_coarse_data_and_eval_chunks_divisibility(setup):
    """Non-dividing num_data_first_stage / eval_chunk values must round to
    safe counts instead of crashing the chunked-loss reshapes: microbatches
    divide the sliced samples, chunk size never exceeds the requested cap,
    and oversized sample requests clamp to the batch."""
    adapter, batch = setup  # 32 samples
    pruner = load_pruner(
        "t5_wanda_pruner", adapter, batch, num_microbatches=4,
        cfg={"prune_spec": "4-0.5-1.0-1.0", "verbose": False,
             "sparsity_ratio_granularity": "block",
             "score_method": "MEZO-GradOnly_sum",
             # 13 is not a multiple of the microbatch size 8; 5 divides
             # nothing interesting either
             "num_data_first_stage": 13, "eval_chunk_size": 5},
    )
    data, num_mb = pruner._coarse_data()
    n = jax.tree_util.tree_leaves(data)[0].shape[0]
    assert n % num_mb == 0 and n <= 13
    chunks = pruner._eval_chunks(data)
    assert n % chunks == 0
    assert n // chunks <= 5  # cap respected
    params, sd = pruner.prune()  # end-to-end: no reshape/assert crashes
    assert 0.3 < pruner.check_sparsity() < 0.7

    # oversized request clamps to the available batch
    pruner2 = load_pruner(
        "t5_wanda_pruner", adapter, batch, num_microbatches=4,
        cfg={"prune_spec": "4-0.5-1.0-1.0", "verbose": False,
             "num_data_first_stage": 999},
    )
    data2, num_mb2 = pruner2._coarse_data()
    assert jax.tree_util.tree_leaves(data2)[0].shape[0] == 32
    assert num_mb2 == 4


def test_sparsity_dict_cross_model_remap_and_zero_fill(capsys):
    """wanda_pruner.py:570-585 parity: a BLIP-2-derived sparsity dict
    (visual_encoder.* keys, one block short) drives the eva_clip pruner —
    keys remap to visual.*, the extra block zero-fills (kept dense), and a
    dict for the wrong model raises."""
    import jax

    from ecoflap_tpu.models import clip as clip_mod
    from ecoflap_tpu.pruning.pruners import WandaPruner

    cfg = clip_mod.tiny_config(eva=True)
    params = clip_mod.init_params(cfg, jax.random.PRNGKey(0))
    adapter = clip_mod.make_adapter(cfg, params, include_text=False)
    stack = adapter.stacks[0]
    assert stack.name == "visual.blocks"
    L = stack.num_blocks

    rng = np.random.default_rng(0)
    img = cfg.eva_visual.img_size
    n = 8
    ids = rng.integers(1, cfg.text.vocab_size,
                       size=(n, cfg.text.context_length))
    batch = {
        "image": jnp.asarray(rng.normal(size=(n, img, img, 3)), jnp.float32),
        "text_ids": jnp.asarray(ids, jnp.int32),
        "label": jnp.asarray(rng.integers(0, 4, size=(n,)), jnp.int32),
    }

    # BLIP-2-style dict: visual_encoder.* names, last block ABSENT
    src = {f"visual_encoder.blocks.{i}.{ln}.weight": 0.5
           for i in range(L - 1) for ln in stack.linear_names}
    pruner = WandaPruner(adapter, batch, num_microbatches=2,
                         prune_spec=f"{L}-0.5-1.0-1.0",
                         sparsity_dict=src, verbose=False)
    sd = pruner.get_sparsity(0.5, None)
    for i in range(L - 1):
        for ln in stack.linear_names:
            assert sd[f"visual.blocks.{i}.{ln}.weight"] == 0.5
    for ln in stack.linear_names:
        assert sd[f"visual.blocks.{L-1}.{ln}.weight"] == 0.0
    assert "zero-filling" in capsys.readouterr().out

    # prune end-to-end with the adapted dict: last block stays dense
    pruner.prune()
    w_last = stack.weight_get(stack.get_block(adapter.params, L - 1),
                              stack.linear_names[0])
    assert float(jnp.mean((w_last == 0).astype(jnp.float32))) < 0.01

    # wrong-model dict raises
    bad = {"t5_model.encoder.block.0.layer.0.SelfAttention.q.weight": 0.5}
    p2 = WandaPruner(adapter, batch, num_microbatches=2,
                     prune_spec=f"{L}-0.5-1.0-1.0",
                     sparsity_dict=bad, verbose=False)
    with pytest.raises(KeyError, match="wrong dict"):
        p2.get_sparsity(0.5, None)


def test_sparsity_dict_scope_is_pruned_stacks_only():
    """A ViT-only dict driving --stacks visual_encoder.blocks on BLIP-2
    must be accepted: coverage is judged against the stacks being pruned,
    not every adapter target (round-4 review #1)."""
    import jax

    from ecoflap_tpu.models import blip2
    from ecoflap_tpu.pruning.pruners import WandaPruner

    cfg = blip2.tiny_config()
    params = blip2.init_params(cfg, jax.random.PRNGKey(0))
    adapter = blip2.make_adapter(cfg, params)
    vit = adapter.stacks[0]
    rng = np.random.default_rng(1)
    n, src, tgt = 8, 6, 5
    batch = {
        "image": jnp.asarray(
            rng.normal(size=(n, cfg.vit.img_size, cfg.vit.img_size, 3)),
            jnp.float32),
        "text_input_ids": jnp.asarray(
            rng.integers(2, cfg.t5.vocab_size, size=(n, src)), jnp.int32),
        "text_input_mask": jnp.ones((n, src), jnp.int32),
        "labels": jnp.asarray(
            rng.integers(2, cfg.t5.vocab_size, size=(n, tgt)), jnp.int32),
    }
    vit_dict = {vit.weight_key(i, ln): 0.5
                for i in range(vit.num_blocks) for ln in vit.linear_names}
    pruner = WandaPruner(
        adapter, batch, num_microbatches=2,
        stack_specs={vit.name: f"{vit.num_blocks}-0.5-1.0-1.0",
                     "t5_model.encoder.block": None,
                     "t5_model.decoder.block": None},
        sparsity_dict=vit_dict, verbose=False)
    sd = pruner.get_sparsity(0.5, None)  # must NOT raise on missing T5 keys
    assert all(sd[k] == 0.5 for k in vit_dict)
    pruner.prune()
    assert 0.1 < pruner.check_sparsity() < 0.35  # only the ViT pruned
