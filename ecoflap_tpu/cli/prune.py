"""Unified prune CLI — the rebuild of the reference's evaluate_{blip,t5,
eva_clip}.py / LLaMA main.py / CoOp train.py pruning entry points
(SURVEY.md §2.7), one argparse surface:

  python -m ecoflap_tpu.cli.prune \
      --model blip2_t5 --pruning_method blipt5_wanda_pruner \
      --prune_spec 24-0.5-1.0-1.0 --vit_prune_spec 39-0.5-1.0-1.0 \
      --sparsity_ratio_granularity block --score_method MEZO-GradOnly_sum \
      --max_sparsity_per_layer 0.6 --num_data_first_stage 128 \
      --calib synthetic --save_pruned

Flag names follow the reference CLIs (evaluate_blip.py:37-284,
LLaMA/main.py:14-60) so reference launch scripts port line-for-line. Without
``--ckpt`` the model is randomly initialized at ``--model_scale`` (tiny for
smoke runs, full for real shapes) — real checkpoints arrive via torch .pth
(utils/checkpoint.py converters).
"""

from __future__ import annotations

import argparse
import json
import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def build_parser() -> argparse.ArgumentParser:
    # allow_abbrev=False: --cfg-path precedence detection reads raw argv
    # tokens (core/project.py:_explicit_flags); an abbreviated flag would
    # not register as explicit and the YAML would override it
    p = argparse.ArgumentParser(description="ECoFLaP-TPU pruning",
                                allow_abbrev=False)
    p.add_argument("--cfg-path", dest="cfg_path", default=None,
                   help="project YAML (reference file-level API; bare names "
                        "resolve under configs/projects/). model/run trees "
                        "map like the reference's Config; an optional "
                        "prune: tree carries the flags below. Explicit "
                        "flags override the file")
    p.add_argument("--model", default=None,
                   choices=["blip2_t5", "t5", "eva_clip", "clip", "llama",
                            "deit", "convnext"])
    p.add_argument("--model_scale", default="tiny",
                   choices=["tiny", "small", "full"],
                   help="tiny = CPU-test shapes; small = mid-scale real "
                        "dims (OpenLLaMA-3B, ViT-B/flan-t5-base BLIP-2, "
                        "flan-t5-base, ViT-B CLIP, DeiT-S); full = the "
                        "reference model. small/full default to bf16 "
                        "weights, tiny to f32 — override with --dtype")
    p.add_argument("--dtype", default="auto",
                   choices=["auto", "float32", "bfloat16"],
                   help="weight dtype; auto = bf16 for small/full "
                        "(base_pruner.py:48-63 casts to bf16), f32 for tiny")
    p.add_argument("--ckpt", default=None, help="torch .pth checkpoint")
    p.add_argument("--pruning_method", default="blipt5_wanda_pruner")
    # prune specs (keep-ratio encoding, base_pruner.py:75-81)
    p.add_argument("--prune_spec", default=None)
    p.add_argument("--t5_prune_spec", default=None)
    p.add_argument("--vit_prune_spec", default=None)
    # coarse stage
    p.add_argument("--sparsity_ratio_granularity", default=None,
                   choices=[None, "layer", "block", "model"])
    p.add_argument("--max_sparsity_per_layer", type=float, default=0.8)
    p.add_argument("--score_method", default="MEZO-GradOnly_sum")
    p.add_argument("--num_data_first_stage", type=int, default=128)
    p.add_argument("--num_noise", type=int, default=1)
    p.add_argument("--noise_eps", type=float, default=1e-3)
    p.add_argument("--noise_mode", default="per_batch",
                   choices=["per_batch", "shared"],
                   help="MeZO sampling: per_batch = reference-exact fresh z "
                        "per microbatch (default); shared = one z across all "
                        "microbatches (documented deviation, PARITY.md)")
    p.add_argument("--sparsity_dict", default=None)
    p.add_argument("--prune_per_model", action="store_true")
    p.add_argument("--prune_n", type=int, default=0)
    p.add_argument("--prune_m", type=int, default=0)
    p.add_argument("--sparsity_type", default="unstructured",
                   help="unstructured | N:M (e.g. 2:4, 4:8 — LLaMA/main.py:31)")
    # global-pruner baselines
    p.add_argument("--is_global", action="store_true")
    p.add_argument("--iteration", type=int, default=1)
    # calibration
    p.add_argument("--tokenizer_path", default=None,
                   help="local tokenizer.json (real subword vocab); "
                        "without it a LOUD HashTokenizer fallback applies")
    p.add_argument("--calib", default="synthetic",
                   help="synthetic | path to annotation json / jsonl "
                        "(clip/deit/convnext: an imagefolder root)")
    p.add_argument("--vis_root", default="",
                   help="image root for --calib annotations")
    p.add_argument("--dataset", default="imagenet",
                   help="imagefolder builder + CoOp prompt template for the "
                        "clip --calib path (any of the 11 CoOp dataset "
                        "names; CoOp/trainers/zsclip.py:42 protocol)")
    p.add_argument("--num_samples", type=int, default=128)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--eval_chunk", type=int, default=None,
                   help="memory-chunk size for loss evals / calibration "
                        "streaming (samples per chunk; default = one "
                        "microbatch). LLaMA-7B at seqlen 2048 needs 4: the "
                        "bf16 attention scores are 2 GB per 8-sample chunk")
    p.add_argument("--seqlen", type=int, default=2048)  # LLaMA (main.py:27)
    # staged / isolated execution (SparseGPT-at-XL memory relief: the axon
    # device budget is per-process; running each stack in its own process
    # resets it — chained through --save_pruned / --load_pruned checkpoints
    # and the reference's --sparsity_dict handoff)
    p.add_argument("--stacks", default=None,
                   help="comma-separated stack names to prune (others skip)")
    p.add_argument("--load_pruned", default=None,
                   help="orbax checkpoint dir to start params from "
                        "(a previous stage's --save_pruned output)")
    p.add_argument("--coarse_only", action="store_true",
                   help="compute + save the coarse-stage sparsity dict, "
                        "skip the fine stage")
    p.add_argument("--stream_grad", default=None, choices=["0", "1"],
                   help="Grad* coarse scoring: 1 = streamed per-block "
                        "backward (three small programs per stack instead "
                        "of one giant remat'd grad-of-scan — kills the "
                        "multi-minute remote compile on the cold path; "
                        "sums are equality-tested). Defaults to the "
                        "ECOFLAP_STREAM_GRAD env (off)")
    p.add_argument("--host_stream", action="store_true",
                   help="fine stage with HOST-resident weights, one block on "
                        "device at a time (single-chip big-model mode; the "
                        "reference analogue is LLaMA device_map streaming)")
    p.add_argument("--per_stack_process", action="store_true",
                   help="orchestrate: coarse stage then one subprocess per "
                        "stack, chaining checkpoints")
    p.add_argument("--consume_params", action="store_true",
                   help="donate the model's own buffers to the prune "
                        "programs (skips the defensive stack copy)")
    p.add_argument("--hessian_bf16", action="store_true",
                   help="accumulate SparseGPT Hessians in bf16 (halves "
                        "stat-output memory churn)")
    # output
    p.add_argument("--output_dir", default="output")
    p.add_argument("--job_id", default=None)
    p.add_argument("--save_pruned", action="store_true",
                   help="orbax checkpoint (fast; stage chaining)")
    p.add_argument("--save_pruned_model", action="store_true",
                   help="reference-contract torch .pth under "
                        "pruned_checkpoint/ (evaluate_blip.py:438-456; the "
                        "eva_clip export drops the text tower + last block "
                        "exactly like evaluate_eva_clip.py:414-428)")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"],
                   help="force a JAX backend (the axon TPU plugin ignores "
                        "JAX_PLATFORMS; this flag uses jax.config, which it "
                        "honors)")
    p.add_argument("--mesh", default=None,
                   help="run the WHOLE pruning pipeline sharded over a "
                        "(dp, tp) device mesh, e.g. 'dp=8' or 'dp=4,tp=2' "
                        "(the v5e-8 north-star path; the reference's "
                        "user-facing analogue is the DDP plumbing in "
                        "runner_base.py:92-98). Params get Megatron-style "
                        "tp shardings (parallel/sharding.py), the "
                        "calibration batch is dp-sharded, XLA inserts the "
                        "ICI collectives. With --platform cpu the device "
                        "count is provisioned virtually "
                        "(xla_force_host_platform_device_count)")
    p.add_argument("--options", nargs="*", default=None)
    return p



def _setup_mesh(args):
    """(mesh or None) from --mesh. Must run before any backend init when
    virtual CPU devices are needed: the device count comes from XLA_FLAGS."""
    if not args.mesh or args.mesh == "none":
        return None
    import re

    from ecoflap_tpu.parallel.mesh import make_mesh, parse_mesh_spec

    kv = parse_mesh_spec(args.mesh)
    if args.platform == "cpu" and kv["dp"] is not None:
        need = kv["dp"] * kv["tp"]
        flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "",
                       os.environ.get("XLA_FLAGS", ""))
        os.environ["XLA_FLAGS"] = (
            f"{flags} --xla_force_host_platform_device_count={need}"
        ).strip()
    return make_mesh(**kv)


def _jit_init(init_fn, cfg, key, dtype):
    """One jitted init program: eager per-leaf RNG churns ~3x the param
    bytes through the axon cumulative allocator — at LLaMA-7B (13.5 GB
    bf16) that alone nearly exhausts the ~40 GB/process budget."""
    return jax.jit(lambda k: init_fn(cfg, k, dtype=dtype))(key)


def _configs(args):
    """(cfg, params, adapter_fn, batch) per model family."""
    from ecoflap_tpu.data import calibration as cal

    scale = args.model_scale
    key = jax.random.PRNGKey(args.seed)
    if getattr(args, "dtype", "auto") != "auto":
        dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    else:
        dtype = jnp.bfloat16 if scale in ("full", "small") else jnp.float32

    if args.model == "blip2_t5":
        from ecoflap_tpu.models import blip2
        from ecoflap_tpu.utils import checkpoint as ck

        cfg = (blip2.blip2_flant5xl() if scale == "full"
               else blip2.blip2_small() if scale == "small"
               else blip2.tiny_config())
        if args.ckpt:
            params = ck.convert_blip2(ck.load_torch_checkpoint(args.ckpt), cfg,
                                      dtype=dtype)
        else:
            params = _jit_init(blip2.init_params, cfg, key, dtype)
        tok = cal.load_t5_tokenizer(vocab_size=cfg.t5.vocab_size,
                                    path=args.tokenizer_path)
        spec = cal.CalibrationSpec(args.num_samples, args.batch_size)
        if args.calib != "synthetic":
            # LAVIS-style caption annotations + real images via the dataset
            # builder + eval processor (the reference's prefix-CC3M loader,
            # prefix_language_pretraining.py:29-55)
            from ecoflap_tpu.core.registry import registry
            from ecoflap_tpu.data import datasets as _datasets  # noqa: F401 (registers builders)
            from ecoflap_tpu.data.processors import ImageEvalProcessor

            ds = registry.get("builder", "coco_caption")(
                {"vis_root": args.vis_root, "ann_paths": [args.calib]},
                vis_processor=ImageEvalProcessor(image_size=cfg.vit.img_size))
            samples = []
            for i in range(min(len(ds), args.num_samples)):
                item = ds[i]
                caps = item.get("gt_captions") or [item.get("text_input", "")]
                samples.append({"image": item["image"],
                                "caption": caps[0] if isinstance(caps, list)
                                else caps})
            # cycle to the requested count (the reference's count-limited
            # wrapper loops the loader, runner_base.py:645-693)
            while len(samples) < args.num_samples:
                samples.append(samples[len(samples) % max(len(ds), 1)])
        else:
            samples = cal.synthetic_vl_samples(
                args.num_samples, cfg.vit.img_size, args.seed)
        batch = cal.build_vl_calibration_batch(samples, tok, spec, args.seed)
        if scale == "tiny":
            batch = {**batch,
                     "text_input_ids": batch["text_input_ids"] % cfg.t5.vocab_size,
                     "labels": jnp.where(batch["labels"] == -100, -100,
                                          batch["labels"] % cfg.t5.vocab_size)}
        adapter = blip2.make_adapter(cfg, params)
        from ecoflap_tpu.utils import checkpoint as _ck

        adapter.export_torch = lambda p: _ck.export_blip2(p, cfg)
        stack_specs = {}
        if args.vit_prune_spec:
            stack_specs["visual_encoder.blocks"] = args.vit_prune_spec
        t5_spec = args.t5_prune_spec or args.prune_spec
        if t5_spec:
            stack_specs["t5_model.encoder.block"] = t5_spec
            stack_specs["t5_model.decoder.block"] = t5_spec
        return adapter, batch, spec.num_microbatches, stack_specs

    if args.model == "t5":
        from ecoflap_tpu.models import t5 as t5_mod
        from ecoflap_tpu.utils import checkpoint as ck

        cfg = (t5_mod.flan_t5_xl() if scale == "full"
               else t5_mod.flan_t5_base() if scale == "small"
               else t5_mod.tiny_config())
        if args.ckpt:
            params = ck.convert_t5(ck.load_torch_checkpoint(args.ckpt), cfg, dtype)
        else:
            params = _jit_init(t5_mod.init_params, cfg, key, dtype)
        tok = cal.load_t5_tokenizer(
            vocab_size=cfg.t5.vocab_size if hasattr(cfg, "t5") else cfg.vocab_size,
            path=args.tokenizer_path)
        spec = cal.CalibrationSpec(args.num_samples, args.batch_size)
        texts = [" ".join(np.random.default_rng(args.seed + i)
                          .choice(["the", "a", "dog", "cat", "run"], 20))
                 for i in range(args.num_samples)]
        batch = cal.build_text_calibration_batch(texts, tok, spec, args.seed)
        if scale == "tiny":
            batch = {**batch,
                     "input_ids": batch["input_ids"] % cfg.vocab_size,
                     "labels": jnp.where(batch["labels"] == -100, -100,
                                          batch["labels"] % cfg.vocab_size)}
        adapter = t5_mod.make_adapter(cfg, params)
        from ecoflap_tpu.utils import checkpoint as _ck

        adapter.export_torch = lambda p: _ck.export_t5(p, cfg)
        stack_specs = {}
        if args.prune_spec:
            stack_specs["encoder.block"] = args.prune_spec
            stack_specs["decoder.block"] = args.prune_spec
        return adapter, batch, spec.num_microbatches, stack_specs

    if args.model in ("eva_clip", "clip"):
        from ecoflap_tpu.models import clip as clip_mod

        eva = args.model == "eva_clip"
        cfg = ((clip_mod.eva_clip_g() if eva else clip_mod.vit_b16())
               if scale == "full"
               else clip_mod.small_config(eva=eva) if scale == "small"
               else clip_mod.tiny_config(eva=eva))
        if args.ckpt:
            from ecoflap_tpu.utils import checkpoint as ck

            params = ck.convert_clip(ck.load_torch_checkpoint(args.ckpt),
                                     cfg, dtype=dtype)
        else:
            params = _jit_init(clip_mod.init_params, cfg, key, dtype)
        rng = np.random.default_rng(args.seed)
        img = (cfg.eva_visual.img_size if cfg.eva_visual else cfg.visual.img_size)
        n = args.num_samples
        if args.calib != "synthetic":
            # CoOp calibration protocol (trainers/zsclip.py:72-90): dataset
            # images paired with their class's CUSTOM_TEMPLATE prompt; the
            # contrastive calibration loss sees exactly what the reference's
            # injected forward_to_cache computes
            from ecoflap_tpu.core.registry import registry as _reg
            from ecoflap_tpu.data import datasets as _ds  # noqa: F401
            from ecoflap_tpu.data.calibration import HashTokenizer
            from ecoflap_tpu.data.coop import COOP_TEMPLATES, coop_prompts
            from ecoflap_tpu.data.processors import ImageEvalProcessor

            folder = _reg.get("builder", args.dataset)(
                {"vis_root": args.calib},
                vis_processor=ImageEvalProcessor(image_size=img))
            items = [folder[i % len(folder)] for i in range(n)]
            labels = [it["label"] for it in items]
            ds_name = (args.dataset if args.dataset in COOP_TEMPLATES
                       else "imagenet")
            per_class = coop_prompts(ds_name, folder.classnames)
            tok = HashTokenizer(vocab_size=cfg.text.vocab_size)
            ids, _ = tok([per_class[l] for l in labels],
                         max_length=cfg.text.context_length)
            batch = {
                "image": jnp.asarray(
                    np.stack([it["image"] for it in items]), dtype),
                "text_ids": jnp.asarray(ids, jnp.int32),
                "label": jnp.asarray(labels, jnp.int32),
            }
        else:
            ids = rng.integers(1, cfg.text.vocab_size,
                               size=(n, cfg.text.context_length))
            ids[:, -1] = cfg.text.vocab_size - 1
            batch = {
                "image": jnp.asarray(rng.normal(size=(n, img, img, 3)), dtype),
                "text_ids": jnp.asarray(ids, jnp.int32),
                "label": jnp.asarray(rng.integers(0, 10, size=(n,)), jnp.int32),
            }
        adapter = clip_mod.make_adapter(cfg, params, include_text=not eva)
        if eva:
            from ecoflap_tpu.utils import checkpoint as _ck

            def _export_eva(p, _cfg=cfg):
                # evaluate_eva_clip.py:414-428: visual tower only, last
                # block dropped (the BLIP-2 EVA-ViT-g has 39 of the 40)
                state = _ck.export_eva_vit(p["visual"], _cfg.eva_visual,
                                           prefix="visual.")
                last = f"blocks.{_cfg.eva_visual.depth - 1}."
                return {k: v for k, v in state.items() if last not in k}

            adapter.export_torch = _export_eva
        stack_specs = {}
        if args.prune_spec:
            for s in adapter.stacks:
                stack_specs[s.name] = args.prune_spec
        return adapter, batch, max(1, n // args.batch_size), stack_specs

    if args.model in ("deit", "convnext"):
        # LLaMA/image_classifiers family (main.py --model deit_base/
        # convnext_tiny; prune_deit/prune_vit/prune_convnext,
        # prune_utils.py:27-226): CE calibration loss over (image, label)
        # pairs — synthetic by default, or an imagefolder root via --calib
        from ecoflap_tpu.models import classifiers

        cfg, init_fn, _, img, num_classes = classifiers.build(args.model,
                                                              scale)
        if args.model == "deit":
            if args.ckpt:
                from ecoflap_tpu.utils import checkpoint as ck

                params = ck.convert_eva_vit(
                    ck.load_torch_checkpoint(args.ckpt), cfg, dtype=dtype)
            else:
                params = _jit_init(init_fn, cfg, key, dtype)
            adapter = classifiers.make_vit_classifier_adapter(cfg, params)
            from ecoflap_tpu.utils import checkpoint as _ck

            adapter.export_torch = lambda p: _ck.export_eva_vit(p, cfg)
        else:
            from ecoflap_tpu.utils import checkpoint as _ck

            if args.ckpt:
                params = _ck.convert_convnext(
                    _ck.load_torch_checkpoint(args.ckpt), cfg, dtype=dtype)
            else:
                params = _jit_init(init_fn, cfg, key, dtype)
            adapter = classifiers.make_convnext_adapter(cfg, params)
            adapter.export_torch = lambda p: _ck.export_convnext(p, cfg)
        n = args.num_samples
        if args.calib != "synthetic":
            from ecoflap_tpu.core.registry import registry
            from ecoflap_tpu.data import datasets as _ds  # noqa: F401
            from ecoflap_tpu.data.processors import ImageEvalProcessor

            folder = registry.get("builder", "imagenet")(
                {"vis_root": args.calib},
                vis_processor=ImageEvalProcessor(image_size=img))
            items = [folder[i % len(folder)] for i in range(n)]
            batch = {
                "image": jnp.asarray(
                    np.stack([it["image"] for it in items]), dtype),
                "label": jnp.asarray(
                    [it["label"] % num_classes for it in items], jnp.int32),
            }
        else:
            rng = np.random.default_rng(args.seed)
            batch = {
                "image": jnp.asarray(rng.normal(size=(n, img, img, 3)), dtype),
                "label": jnp.asarray(
                    rng.integers(0, num_classes, size=(n,)), jnp.int32),
            }
        stack_specs = {}
        if args.prune_spec:
            for s in adapter.stacks:
                stack_specs[s.name] = args.prune_spec
        return adapter, batch, max(1, n // args.batch_size), stack_specs

    if args.model == "llama":
        from ecoflap_tpu.models import llama
        from ecoflap_tpu.utils import checkpoint as ck
        from ecoflap_tpu.data import calibration as cal2

        # "small" = OpenLLaMA-3B: the llama size that fits this 16 GB chip
        # dense (7B bf16 weights + the scoring program need ~17 GB)
        cfg = (llama.llama_7b() if scale == "full"
               else llama.open_llama_3b() if scale == "small"
               else llama.tiny_config())
        if args.ckpt:
            params = ck.convert_llama(ck.load_torch_checkpoint(args.ckpt), cfg,
                                      dtype)
        elif args.host_stream and not args.is_global and not (
                args.sparsity_ratio_granularity and args.sparsity_dict is None):
            # A host-streamed run with NO in-process coarse scoring (fine
            # stage only — the dict came via --sparsity_dict, e.g. from the
            # --per_stack_process coarse child — or a uniform-ratio run)
            # must NOT init on device: the jitted init of a 7B tree charges
            # ~13 GB of outputs (plus temps) to the axon cumulative-
            # allocation budget only for the streaming loop to pull it all
            # straight back to host. Init on the CPU backend and device-put
            # just the non-stack leaves the prepare programs read
            # (embed/final-norm/lm_head, ~0.5 GB at 7B). Scoring runs
            # (coarse stage in-process) keep the device init — MeZO needs
            # device-resident blocks.
            cpu = jax.local_devices(backend="cpu")[0]
            with jax.default_device(cpu):
                params = llama.init_params(cfg, key, dtype=dtype,
                                           per_leaf=True)
            dev = jax.devices()[0]
            params = {
                **params,
                "embed_tokens": jax.device_put(params["embed_tokens"], dev),
                "norm": jax.device_put(params["norm"], dev),
                "lm_head": jax.device_put(params["lm_head"], dev),
            }
        else:
            params = _jit_init(llama.init_params, cfg, key, dtype)
        seqlen = args.seqlen if scale in ("full", "small") else 32
        if args.calib != "synthetic":
            # Real-text C4-style calibration (LLaMA/main.py:27 --nsamples 128
            # C4; wanda lib/data.py get_c4 takes random seqlen windows of
            # tokenized documents): jsonl {"text": ...} lines -> tokenize
            # each doc -> one EOS-joined stream -> random windows.
            from ecoflap_tpu.core.registry import registry
            from ecoflap_tpu.data import datasets as _datasets  # noqa: F401

            tok = cal2.load_t5_tokenizer(vocab_size=cfg.vocab_size,
                                         path=args.tokenizer_path)
            ds = registry.get("builder", "c4")({"jsonl_path": args.calib})
            pieces = []
            for t in ds.texts:
                ids, _ = tok([t], max_length=10 ** 9, add_eos=True, pad=False)
                pieces.append(np.asarray(ids[0], np.int32))
            stream = np.concatenate(pieces)
            need = args.num_samples * seqlen + seqlen
            if stream.shape[0] < need:
                raise SystemExit(
                    f"--calib {args.calib}: {stream.shape[0]} tokens after "
                    f"tokenization, need >= {need} for {args.num_samples} "
                    f"windows of {seqlen}")
        else:
            rng = np.random.default_rng(args.seed)
            stream = rng.integers(
                2, cfg.vocab_size, size=(args.num_samples * seqlen + seqlen,))
        batch = cal2.build_lm_calibration_batch(
            np.asarray(stream), args.num_samples, seqlen, args.seed)
        adapter = llama.make_adapter(cfg, params)
        adapter.export_torch = lambda p: ck.export_llama(p, cfg)
        stack_specs = {"model.layers": args.prune_spec} if args.prune_spec else {}
        return adapter, batch, max(1, args.num_samples // args.batch_size), stack_specs

    raise ValueError(args.model)


STACK_NAMES = {
    "blip2_t5": ["visual_encoder.blocks", "t5_model.encoder.block",
                 "t5_model.decoder.block"],
    "t5": ["encoder.block", "decoder.block"],
    "llama": ["model.layers"],
}


def _per_stack_orchestrate(args) -> Dict[str, Any]:
    """Run the coarse stage (if requested) and then one subprocess per stack,
    chaining pruned params through orbax checkpoints. Each subprocess gets a
    fresh device-allocation budget — the fix for SparseGPT-at-XL dying with
    RESOURCE_EXHAUSTED at the decoder phase (ROUND1_NOTES.md round-2 list)."""
    import subprocess
    import sys

    # "/" partitions stacks into process groups ("a,b/c" = one process for
    # a+b, one for c); plain comma lists keep one process per stack
    if args.stacks:
        groups = [g.split(",") for g in args.stacks.split("/")] \
            if "/" in args.stacks else [[s] for s in args.stacks.split(",")]
    else:
        groups = [[s] for s in STACK_NAMES.get(args.model, [])]
    if not groups:
        raise SystemExit(f"--per_stack_process needs --stacks for {args.model}")

    base = [sys.executable, "-m", "ecoflap_tpu.cli.prune"]
    for k, v in vars(args).items():
        # cfg_path/options are already merged into these args — re-sending
        # them would double-apply (and --cfg_path is not a flag the child
        # parser knows: the option string is --cfg-path)
        if k in ("per_stack_process", "stacks", "load_pruned", "coarse_only",
                 "save_pruned", "save_pruned_model", "sparsity_dict",
                 "job_id", "options", "cfg_path") or v in (None, False):
            continue
        flag = f"--{k}"
        base += [flag] if v is True else [flag, str(v)]

    def run(extra, tag):
        cmd = base + extra
        res = subprocess.run(cmd, capture_output=True, text=True)
        sys.stderr.write(res.stderr)
        if res.returncode != 0:
            sys.stderr.write(res.stdout)
            raise RuntimeError(f"stage {tag} failed rc={res.returncode}")
        return json.loads(res.stdout.strip().splitlines()[-1])

    t0 = time.time()
    results = []
    sparsity_dict = args.sparsity_dict
    if args.sparsity_ratio_granularity and not sparsity_dict:
        r = run(["--coarse_only", "--job_id", "coarse"], "coarse")
        sparsity_dict = r["sparsity_dict"]
        results.append(r)

    prev_ckpt = args.load_pruned
    for i, group in enumerate(groups):
        extra = ["--stacks", ",".join(group), "--save_pruned",
                 "--job_id", f"stage{i}"]
        if sparsity_dict:
            extra += ["--sparsity_dict", sparsity_dict]
        if prev_ckpt:
            extra += ["--load_pruned", prev_ckpt]
        if args.save_pruned_model and i == len(groups) - 1:
            # the LAST stage child holds the fully-chained pruned params —
            # it writes the reference-contract .pth
            extra += ["--save_pruned_model"]
        r = run(extra, ",".join(group))
        prev_ckpt = r["checkpoint"]
        results.append(r)

    out = {
        "job_id": args.job_id or "per_stack",
        "wall_clock_s": round(time.time() - t0, 1),
        "prunable_sparsity": results[-1]["prunable_sparsity"],
        "stages": results,
        "checkpoint": prev_ckpt,
    }
    if args.save_pruned_model:
        out["pth"] = results[-1]["pth"]
    print(json.dumps(out))
    return out


def main(argv=None) -> Dict[str, Any]:
    from ecoflap_tpu.pruning.loader import load_pruner
    from ecoflap_tpu.runners.runner import Runner, global_sparsity

    import sys as _sys

    parser = build_parser()
    args = parser.parse_args(argv)
    from ecoflap_tpu.core.project import apply_cfg_path

    apply_cfg_path(args, _sys.argv[1:] if argv is None else argv, prune=True)
    if not args.model:
        parser.error("--model is required (directly or via --cfg-path)")
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.sparsity_type != "unstructured" and ":" in args.sparsity_type:
        args.prune_n, args.prune_m = map(int, args.sparsity_type.split(":"))
    if args.per_stack_process:
        # before any backend init: the orchestrating parent must never
        # attach the TPU (children do; two attached processes can wedge the
        # axon tunnel) — --mesh is forwarded to each child
        return _per_stack_orchestrate(args)
    mesh = _setup_mesh(args)
    job_id = args.job_id or (
        f"{args.pruning_method}_{args.prune_spec or 'none'}"
        f"_{args.score_method}_{args.sparsity_ratio_granularity}"
    )
    runner = Runner(args.output_dir, job_id)

    adapter, batch, num_mb, stack_specs = _configs(args)
    if args.load_pruned:
        import orbax.checkpoint as ocp

        shapes = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), adapter.params)

        adapter.params = ocp.StandardCheckpointer().restore(
            os.path.abspath(args.load_pruned), shapes)
    if mesh is not None:
        from ecoflap_tpu.parallel.sharding import shard_batch, shard_params

        adapter.params = shard_params(adapter.params, mesh)
        batch = shard_batch(batch, mesh)
    if args.stacks:
        # explicit None for non-kept stacks: a missing entry would fall back
        # to --prune_spec via _spec_for_stack and prune everything anyway
        keep = set(args.stacks.split(","))
        stack_specs = {
            s.name: (stack_specs.get(s.name) if s.name in keep else None)
            for s in adapter.stacks
        }

    pruner_cfg = dict(
        stack_specs=stack_specs or None,
        eval_chunk_size=args.eval_chunk,
        prune_spec=args.prune_spec,
        sparsity_ratio_granularity=args.sparsity_ratio_granularity,
        max_sparsity_per_layer=args.max_sparsity_per_layer,
        score_method=args.score_method,
        num_data_first_stage=args.num_data_first_stage,
        num_noise=args.num_noise,
        noise_eps=args.noise_eps,
        noise_mode=args.noise_mode,
        sparsity_dict=args.sparsity_dict,
        prune_per_model=args.prune_per_model,
        prune_n=args.prune_n,
        prune_m=args.prune_m,
        key=jax.random.PRNGKey(args.seed),
        consume_params=args.consume_params,
        hessian_bf16=args.hessian_bf16,
        host_stream=args.host_stream,
        # explicit kwarg, not an env write — an in-process caller's flag
        # must not leak into later main() calls
        stream_grad=(None if args.stream_grad is None
                     else args.stream_grad == "1"),
        # crash insurance: the coarse dict lands on disk before the fine
        # stage starts (re-enter with --sparsity_dict to skip re-scoring)
        on_coarse_dict=runner.save_sparsity_dict,
    )
    if args.is_global:
        pruner_cfg = dict(
            stack_specs=stack_specs or None, prune_spec=args.prune_spec,
            is_global=True, iteration=args.iteration,
            num_noise=args.num_noise, noise_eps=args.noise_eps,
            noise_mode=args.noise_mode,
            key=jax.random.PRNGKey(args.seed),
        )

    import contextlib

    mesh_ctx = mesh if mesh is not None else contextlib.nullcontext()
    t0 = time.time()
    pruner = load_pruner(args.pruning_method, adapter, batch, num_mb, pruner_cfg)
    if args.coarse_only:
        from ecoflap_tpu.core.spec import parse_prune_spec

        specs = [s for s in (stack_specs or {}).values() if s]
        ratio = parse_prune_spec(specs[0] if specs else args.prune_spec).sparsity
        with mesh_ctx:
            sdict = pruner.get_sparsity(ratio, args.sparsity_ratio_granularity)
        result = {
            "job_id": job_id,
            "wall_clock_s": round(time.time() - t0, 1),
            "sparsity_dict": runner.save_sparsity_dict(sdict),
        }
        print(json.dumps(result))
        return result
    with mesh_ctx:
        params, sparsity_dict = pruner.prune()
    jax.block_until_ready(jax.tree_util.tree_leaves(params)[0])
    wall = time.time() - t0

    sd_path = runner.save_sparsity_dict(sparsity_dict)
    stats_path = runner.save_training_statistics(wall)
    # key must be unique per (stack, block): keying by s.name alone
    # overwrote every entry with the LAST block's weights, so the reported
    # sparsity was block L-1's ratio, not the global zero fraction
    sparsity = global_sparsity(
        {f"{s.name}.{i}": [s.weight_get(s.get_block(params, i), ln)
                           for ln in s.linear_names]
         for s in adapter.stacks for i in range(s.num_blocks)}
    )
    result = {
        "job_id": job_id,
        "wall_clock_s": round(wall, 1),
        "prunable_sparsity": round(sparsity, 4),
        "sparsity_dict": sd_path,
        "stats": stats_path,
    }
    if args.save_pruned:
        result["checkpoint"] = runner.save_checkpoint(params, f"pruned_{job_id}")
    if args.save_pruned_model:
        exporter = getattr(adapter, "export_torch", None)
        if exporter is None:
            raise SystemExit(
                f"--save_pruned_model: no torch exporter for {args.model}")
        result["pth"] = runner.save_pruned_torch(exporter(params), job_id)
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
