"""Evaluation CLI — the post-prune half of the reference's evaluate_* scripts
(evaluate_blip.py:345-491, mmlu_eval/evaluate_flan.py, LLaMA/main.py:89-90).

  python -m ecoflap_tpu.cli.evaluate --model blip2_t5 --task vqa \
      --checkpoint output/pruned_... --ann data/vqa_val.json ...

Without real datasets (zero-egress image) the CLI accepts local annotation
files (data/datasets.py builders) or --synthetic for a smoke pass.
"""

from __future__ import annotations

import argparse
import functools
import json
import time
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np


def build_parser():
    # allow_abbrev=False: see cli/prune.py — explicit-flag precedence for
    # --cfg-path reads raw argv tokens
    p = argparse.ArgumentParser(description="ECoFLaP-TPU evaluation",
                                allow_abbrev=False)
    p.add_argument("--cfg-path", dest="cfg_path", default=None,
                   help="project YAML (reference file-level API: "
                        "model/datasets/run trees, lavis/projects layout); "
                        "bare names resolve under configs/projects/. "
                        "Explicit flags override the file")
    p.add_argument("--options", nargs="*", default=None,
                   help="dot-list overrides, e.g. run.batch_size_eval=16")
    p.add_argument("--model", default=None,
                   choices=["blip2_t5", "blip2_opt", "blip2_qformer", "t5",
                            "eva_clip", "clip", "llama", "blip1",
                            "deit", "convnext"])
    p.add_argument("--model_scale", default="tiny",
                   choices=["tiny", "small", "full"],
                   help="tiny = CPU-test shapes; small = mid-scale real "
                        "dims (OpenLLaMA-3B, ViT-B/flan-t5-base BLIP-2, "
                        "flan-t5-base, ViT-B CLIP, DeiT-S, blip_base); "
                        "full = the reference model. small/full default to "
                        "bf16 weights — override with --dtype")
    p.add_argument("--dtype", default="auto",
                   choices=["auto", "float32", "bfloat16"],
                   help="weight dtype; auto = bf16 for small/full, f32 "
                        "for tiny")
    p.add_argument("--task", default=None,
                   choices=["vqa", "gqa", "captioning", "classification",
                            "retrieval", "nlvr", "mmlu", "wikitext_ppl"])
    p.add_argument("--tokenizer_path", default=None,
                   help="local tokenizer.json (real subword vocab)")
    p.add_argument("--checkpoint", default=None,
                   help="orbax dir (runner.save_checkpoint) or torch .pth")
    p.add_argument("--ann", default=None, help="annotation json / data path")
    p.add_argument("--vis_root", default="")
    p.add_argument("--prompt_templates", default="full",
                   choices=("full", "subset", "simple", "coop"),
                   help="zero-shot classifier prompt ensemble: 'full' = the "
                        "reference's 80-entry openai_imagenet_template table "
                        "(clip_models/model.py:1175), 'subset' = the 7-entry "
                        "fast subset (~0.1pt drift, 11x cheaper), 'coop' = "
                        "the dataset's single CUSTOM_TEMPLATE prompt "
                        "(CoOp/trainers/zsclip.py:13-43 zero-shot protocol)")
    p.add_argument("--dataset", default="imagenet",
                   help="classification dataset builder (imagenet, cifar100, "
                        "or any of the 11 CoOp names: caltech101 dtd eurosat "
                        "fgvc_aircraft food101 oxford_flowers oxford_pets "
                        "stanford_cars sun397 ucf101 imagenet)")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--eval_batches", type=int, default=2,
                   help="synthetic eval: number of batches (>=3 separates "
                        "compile from steady-state throughput in the log)")
    p.add_argument("--num_beams", type=int, default=5)
    p.add_argument("--max_new_tokens", type=int, default=10)
    p.add_argument("--length_penalty", type=float, default=-1.0)
    p.add_argument("--seqlen", type=int, default=2048)
    p.add_argument("--output_dir", default="output")
    p.add_argument("--mesh", default="none",
                   help="'none' | 'dp' | 'dp=N,tp=M'. 'dp': data-parallel "
                        "eval — batch leaves sharded over a dp mesh of all "
                        "visible devices, params replicated; XLA partitions "
                        "the jitted generate/predict programs (batch_size "
                        "must be divisible by the dp extent). tp>1 adds "
                        "Megatron param sharding (parallel/sharding.py) for "
                        "models whose replicated weights don't fit one "
                        "chip's HBM")
    p.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"])
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--vocab_size", type=int, default=None,
                   help="tiny-scale T5 vocab override (e.g. to match a "
                        "--tokenizer_path vocab)")
    return p


def _eval_mesh(args):
    """(dp, tp) mesh for sharded evaluation (or None). ``--mesh dp`` = all
    devices on the batch axis; ``--mesh dp=4,tp=2`` adds Megatron tensor
    sharding of the params (3B+ models whose replicated weights don't fit
    one chip's HBM)."""
    spec = getattr(args, "mesh", "none")
    if spec in (None, "none"):
        return None
    from ecoflap_tpu.parallel.mesh import make_mesh, parse_mesh_spec

    return make_mesh(**parse_mesh_spec(spec))


def _replicate(mesh, params):
    """Place params on the eval mesh: replicated on a pure-dp mesh,
    Megatron-sharded (parallel/sharding.py rules) when tp > 1. The jitted
    generate/predict programs consume the shardings; XLA inserts the tp
    collectives inside the decode loop."""
    if mesh is None:
        return params
    if mesh.shape.get("tp", 1) > 1:
        from ecoflap_tpu.parallel.sharding import shard_params

        return shard_params(params, mesh)
    from jax.sharding import NamedSharding, PartitionSpec as P

    return jax.device_put(params, NamedSharding(mesh, P()))


def _shard_arrays(mesh, arrays):
    """Shard a dict of batch arrays over dp (no-op when mesh is None).

    jit consumes the shardings and partitions the generate/predict program —
    per-sample decode work (beam search included) splits cleanly along the
    batch axis, so eval throughput scales with the dp extent."""
    if mesh is None:
        return arrays
    from ecoflap_tpu.parallel.sharding import shard_batch

    return shard_batch(arrays, mesh)


def _init_params(init_fn, cfg, args):
    """Jitted random init; bf16 at full scale (an eager f32 init of the 4B
    BLIP-2 is 16 GB — over the 15.75 GB chip — and churns ~3x param bytes
    through the allocator in per-leaf RNG ops)."""
    dtype = _dtype(args)
    return jax.jit(lambda k: init_fn(cfg, k, dtype=dtype))(
        jax.random.PRNGKey(args.seed))


def _dtype(args):
    if getattr(args, "dtype", "auto") != "auto":
        return jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    return (jnp.bfloat16 if args.model_scale in ("full", "small")
            else jnp.float32)


def _pick(args, full, small, tiny):
    """Scale-dispatch for model configs; ``small=None`` = no mid-scale
    preset for this family."""
    if args.model_scale == "full":
        return full()
    if args.model_scale == "small":
        if small is None:
            raise SystemExit(f"--model_scale small: no mid-scale preset "
                             f"for {args.model}; use tiny or full")
        return small()
    return tiny()


def _classifier_model(args):
    """(cfg, params, forward_fn, img_size, num_classes) for the
    image_classifiers family (deit/convnext) — model construction shared
    with cli/prune via classifiers.build."""
    from ecoflap_tpu.models import classifiers
    from ecoflap_tpu.runners.runner import Runner

    cfg, init_fn, fwd, img, ncls = classifiers.build(args.model,
                                                     args.model_scale)
    params = _init_params(init_fn, cfg, args)
    if args.checkpoint and args.checkpoint.endswith(".pth"):
        # the artifact cli.prune --save_pruned_model emits
        if args.model != "deit":
            raise SystemExit(
                f"no torch .pth converter for {args.model}; pass an orbax "
                "checkpoint (--save_pruned)")
        from ecoflap_tpu.utils import checkpoint as ck

        params = ck.convert_eva_vit(
            ck.load_torch_checkpoint(args.checkpoint), cfg)
    elif args.checkpoint:
        params = Runner(args.output_dir).load_checkpoint(params,
                                                         args.checkpoint)
    return cfg, params, fwd, img, ncls


def _synthetic_eval(args) -> Dict[str, Any]:
    """Smoke evaluation on random data — exercises the full model+task path."""
    from ecoflap_tpu.data.calibration import HashTokenizer
    from ecoflap_tpu.models.generation import GenerateConfig
    from ecoflap_tpu.runners.runner import Runner

    rng = np.random.default_rng(args.seed)
    runner = Runner(args.output_dir, f"eval_{args.model}_{args.task}")

    if args.model == "llama" and args.task == "wikitext_ppl":
        from ecoflap_tpu.models import llama
        from ecoflap_tpu.tasks.lm import PerplexityTask

        cfg = _pick(args, llama.llama_7b, llama.open_llama_3b,
                    llama.tiny_config)
        params = _init_params(llama.init_params, cfg, args)
        stream = jnp.asarray(
            rng.integers(2, cfg.vocab_size, size=(64 * 32,)), jnp.int32)
        seqlen = args.seqlen if args.model_scale != "tiny" else 32
        task = PerplexityTask(
            lambda s: llama.perplexity(cfg, params, s, seqlen=seqlen,
                                       batch_size=args.batch_size))
        return runner.evaluate(task, stream)

    if args.model == "blip2_t5" and args.task in ("vqa", "gqa", "captioning"):
        from ecoflap_tpu.models import blip2
        from ecoflap_tpu.models.generation import GenerateConfig
        from ecoflap_tpu.tasks.vqa import VQATask

        cfg = _pick(args, blip2.blip2_flant5xl, blip2.blip2_small,
                    lambda: blip2.tiny_config(vocab_size=args.vocab_size))
        params = _init_params(blip2.init_params, cfg, args)
        tok = HashTokenizer(vocab_size=cfg.t5.vocab_size)
        gen = GenerateConfig(max_new_tokens=args.max_new_tokens,
                             num_beams=args.num_beams,
                             length_penalty=args.length_penalty)
        mesh = _eval_mesh(args)
        params = _replicate(mesh, params)

        batch_walls = []

        def predict_fn(batch):
            t0 = time.time()
            ids, mask = tok(batch["text_input"], max_length=8)
            arrs = _shard_arrays(mesh, {
                "image": jnp.asarray(batch["image"]),
                "ids": jnp.asarray(ids), "mask": jnp.asarray(mask)})
            out = blip2.generate(cfg, params, arrs["image"], arrs["ids"],
                                 arrs["mask"], gen)
            texts = [tok.decode(list(map(int, row))) for row in np.asarray(out)]
            batch_walls.append(round(time.time() - t0, 2))
            return texts

        img = cfg.vit.img_size
        batches = [{
            "image": rng.normal(size=(args.batch_size, img, img, 3)).astype(np.float32),
            "text_input": [f"question {i}" for i in range(args.batch_size)],
            "gt_answers": [["yes"] * 10 for _ in range(args.batch_size)],
        } for _ in range(args.eval_batches)]
        task = VQATask(predict_fn)
        metrics = runner.evaluate(task, batches)
        # compile-vs-steady attribution: batch 0 carries the jit compile,
        # the rest are steady-state decode throughput
        metrics["batch_walls_s"] = batch_walls
        if len(batch_walls) >= 3:
            steady = batch_walls[1:]
            metrics["steady_qps"] = round(
                args.batch_size * len(steady) / sum(steady), 3)
        return metrics

    if args.model == "blip2_opt" and args.task == "captioning":
        from ecoflap_tpu.models import blip2_opt
        from ecoflap_tpu.tasks.captioning import CaptionTask

        cfg = _pick(args, blip2_opt.blip2_opt2_7b, None,
                    blip2_opt.tiny_config)
        params = _init_params(blip2_opt.init_params, cfg, args)
        tok = HashTokenizer(vocab_size=cfg.opt.vocab_size)
        gen = GenerateConfig(max_new_tokens=args.max_new_tokens,
                             num_beams=args.num_beams,
                             min_length=8,  # caption_coco_opt2.7b_eval.yaml
                             length_penalty=args.length_penalty,
                             eos_token_id=cfg.opt.eos_token_id,
                             pad_token_id=cfg.opt.pad_token_id)
        mesh = _eval_mesh(args)
        params = _replicate(mesh, params)
        # one shared prompt, unpadded (reference blip2_opt caption prompt)
        # pad=False: generate's prompt contract is UNPADDED — a padded
        # prompt would condition decode step 0 on the PAD token
        prompt_ids = np.asarray(
            tok(["a photo of"], max_length=8, add_eos=False, pad=False)[0],
            np.int32)

        def gen_fn(batch):
            n = len(batch["image"])
            ids = np.repeat(prompt_ids, n, axis=0)
            arrs = _shard_arrays(mesh, {
                "image": jnp.asarray(batch["image"]),
                "ids": jnp.asarray(ids),
                "mask": jnp.ones_like(jnp.asarray(ids))})
            out = blip2_opt.generate(cfg, params, arrs["image"], arrs["ids"],
                                     arrs["mask"], gen)
            return [tok.decode(list(map(int, r))) for r in np.asarray(out)]

        img = cfg.vit.img_size
        batches = [{
            "image": rng.normal(size=(args.batch_size, img, img, 3)).astype(np.float32),
            "image_id": list(range(i * args.batch_size,
                                   (i + 1) * args.batch_size)),
            "gt_captions": [["a photo"] for _ in range(args.batch_size)],
        } for i in range(args.eval_batches)]
        task = CaptionTask(gen_fn)
        return runner.evaluate(task, batches)

    if args.model == "blip1" and args.task == "retrieval":
        from ecoflap_tpu.models import blip1

        # blip_base IS the ViT-B mid-scale; small aliases it (f32 vs bf16
        # is the only difference, via _dtype's auto rule)
        cfg = _pick(args, blip1.blip_base, blip1.blip_base,
                    blip1.tiny_config)
        params = _init_params(blip1.init_retrieval_params, cfg, args)
        tok = HashTokenizer(vocab_size=cfg.text.vocab_size)
        mesh = _eval_mesh(args)
        params = _replicate(mesh, params)
        sim_jit = jax.jit(lambda p, im, ids, m:
                          blip1.retrieval_sim_matrix(cfg, p, im, ids, m))
        itm_jit = jax.jit(lambda p, im, ids, m:
                          blip1.itm_logits(cfg, p, im, ids, m))

        n = args.batch_size
        img = cfg.vit.img_size
        images = jnp.asarray(rng.normal(size=(n, img, img, 3)), jnp.float32)
        t_ids, t_mask = tok([f"caption {i}" for i in range(n)], max_length=8)
        t_ids, t_mask = jnp.asarray(t_ids), jnp.asarray(t_mask)
        k = min(8, n)

        # the reference's two-stage eval (blip_retrieval evaluation):
        # ITM re-ranks each image's top-k texts AND each text's top-k
        # images INDEPENDENTLY — never mix ITM-boosted logits with raw
        # cosine sims inside one ranking
        sim = np.asarray(sim_jit(params, images, t_ids, t_mask))
        score_i2t = np.full_like(sim, -np.inf)
        for i in range(n):
            topk = np.argsort(-sim[i])[:k]
            lg = np.asarray(itm_jit(
                params, jnp.repeat(images[i:i + 1], k, axis=0),
                t_ids[topk], t_mask[topk]))
            score_i2t[i, topk] = lg[:, 1] + sim[i, topk]
        score_t2i = np.full_like(sim.T, -np.inf)
        for j in range(n):
            topk = np.argsort(-sim[:, j])[:k]
            lg = np.asarray(itm_jit(
                params, images[topk],
                jnp.repeat(t_ids[j:j + 1], k, axis=0),
                jnp.repeat(t_mask[j:j + 1], k, axis=0)))
            score_t2i[j, topk] = lg[:, 1] + sim[topk, j]

        from ecoflap_tpu.tasks.retrieval import score_retrieval_pair

        metrics = score_retrieval_pair(score_i2t, score_t2i)
        runner.log_metrics(metrics)
        return metrics

    if args.model == "blip2_qformer" and args.task == "retrieval":
        from ecoflap_tpu.models import blip2_qformer as q1
        from ecoflap_tpu.tasks.retrieval import score_retrieval_pair

        if args.model_scale != "tiny":
            raise SystemExit("blip2_qformer retrieval: only --model_scale "
                             "tiny is configured (stage-1 tower over "
                             "pre-extracted ViT features)")
        cfg = q1.tiny_config()
        params = q1.init_params(cfg, jax.random.PRNGKey(args.seed))
        tok = HashTokenizer(vocab_size=cfg.vocab_size)
        n = args.batch_size
        # stage-1 retrieval consumes frozen ViT features directly
        # (blip2_retrieval: compute_sim_matrix over extracted embeds)
        embeds = jnp.asarray(
            rng.normal(size=(n, 8, cfg.qformer.encoder_width)), jnp.float32)
        ids, mask = tok([f"caption {i}" for i in range(n)], max_length=8)
        s_i2t, s_t2i = q1.compute_sim_matrix(
            cfg, params, embeds, jnp.asarray(ids), jnp.asarray(mask),
            k_test=min(8, n))
        metrics = score_retrieval_pair(np.asarray(s_i2t), np.asarray(s_t2i))
        runner.log_metrics(metrics)
        return metrics

    if args.model == "blip1" and args.task == "vqa":
        from ecoflap_tpu.models import blip1
        from ecoflap_tpu.tasks.vqa import VQATask

        # blip_base IS the ViT-B mid-scale; small aliases it (f32 vs bf16
        # is the only difference, via _dtype's auto rule)
        cfg = _pick(args, blip1.blip_base, blip1.blip_base,
                    blip1.tiny_config)
        params = _init_params(blip1.init_vqa_params, cfg, args)
        tok = HashTokenizer(vocab_size=cfg.text.vocab_size)
        mesh = _eval_mesh(args)
        params = _replicate(mesh, params)
        # rank inference (blip_vqa.py predict_answers inference='rank'):
        # candidates scored, not generated
        answer_list = [f"answer {i}" for i in range(16)] + ["yes", "no"]
        bos = 2
        a_ids, a_mask = tok(answer_list, max_length=6, add_eos=False)
        a_ids = np.concatenate(
            [np.full((len(answer_list), 1), bos, np.int32), a_ids], axis=1)
        a_mask = np.concatenate(
            [np.ones((len(answer_list), 1), np.int32), a_mask], axis=1)
        rank_jit = jax.jit(functools.partial(blip1.rank_answers, cfg, k=8))

        def predict_fn(batch):
            ids, mask = tok(batch["text_input"], max_length=12)
            arrs = _shard_arrays(mesh, {
                "image": jnp.asarray(batch["image"]),
                "ids": jnp.asarray(ids), "mask": jnp.asarray(mask)})
            idx = np.asarray(rank_jit(
                params, arrs["image"], arrs["ids"], arrs["mask"],
                jnp.asarray(a_ids), jnp.asarray(a_mask)))
            return [answer_list[i] for i in idx]

        img = cfg.vit.img_size
        batches = [{
            "image": rng.normal(size=(args.batch_size, img, img, 3)).astype(np.float32),
            "text_input": [f"question {i}" for i in range(args.batch_size)],
            "gt_answers": [["yes"] * 10 for _ in range(args.batch_size)],
        } for _ in range(args.eval_batches)]
        task = VQATask(predict_fn)
        return runner.evaluate(task, batches)

    if args.model == "blip1" and args.task == "nlvr":
        from ecoflap_tpu.models import blip1
        from ecoflap_tpu.tasks.classification import ClassificationTask

        # blip_base IS the ViT-B mid-scale; small aliases it (f32 vs bf16
        # is the only difference, via _dtype's auto rule)
        cfg = _pick(args, blip1.blip_base, blip1.blip_base,
                    blip1.tiny_config)
        params = _init_params(blip1.init_nlvr_params, cfg, args)
        tok = HashTokenizer(vocab_size=cfg.text.vocab_size)
        mesh = _eval_mesh(args)
        params = _replicate(mesh, params)
        nlvr_jit = jax.jit(lambda p, b: blip1.nlvr_forward(cfg, p, b))

        def predict_fn(batch):
            ids, mask = tok(batch["text_input"], max_length=12)
            arrs = _shard_arrays(mesh, {
                "image0": jnp.asarray(batch["image0"]),
                "image1": jnp.asarray(batch["image1"]),
                "text_ids": jnp.asarray(ids), "text_mask": jnp.asarray(mask)})
            return nlvr_jit(params, arrs)

        img = cfg.vit.img_size
        batches = [{
            "image0": rng.normal(size=(args.batch_size, img, img, 3)).astype(np.float32),
            "image1": rng.normal(size=(args.batch_size, img, img, 3)).astype(np.float32),
            "text_input": [f"statement {i}" for i in range(args.batch_size)],
            "label": rng.integers(0, 2, size=(args.batch_size,)),
        } for _ in range(args.eval_batches)]
        task = ClassificationTask(predict_fn)
        return runner.evaluate(task, batches)

    if args.model == "blip1" and args.task == "captioning":
        from ecoflap_tpu.models import blip1
        from ecoflap_tpu.tasks.captioning import CaptionTask

        # blip_base IS the ViT-B mid-scale; small aliases it (f32 vs bf16
        # is the only difference, via _dtype's auto rule)
        cfg = _pick(args, blip1.blip_base, blip1.blip_base,
                    blip1.tiny_config)
        params = _init_params(blip1.init_params, cfg, args)
        tok = HashTokenizer(vocab_size=cfg.text.vocab_size)
        gen = GenerateConfig(max_new_tokens=args.max_new_tokens,
                             num_beams=args.num_beams,
                             min_length=5,  # blip_caption generate defaults
                             length_penalty=args.length_penalty,
                             eos_token_id=cfg.text.sep_token_id,
                             pad_token_id=cfg.text.pad_token_id)
        mesh = _eval_mesh(args)
        params = _replicate(mesh, params)
        prompt_ids = np.asarray(
            tok(["a picture of"], max_length=8, add_eos=False, pad=False)[0],
            np.int32)  # pad=False: unpadded-prompt contract (see blip2_opt)

        def gen_fn(batch):
            n = len(batch["image"])
            ids = np.repeat(prompt_ids, n, axis=0)
            arrs = _shard_arrays(mesh, {
                "image": jnp.asarray(batch["image"]),
                "ids": jnp.asarray(ids)})
            out = blip1.generate(cfg, params, arrs["image"], arrs["ids"], gen)
            return [tok.decode(list(map(int, r))) for r in np.asarray(out)]

        img = cfg.vit.img_size
        batches = [{
            "image": rng.normal(size=(args.batch_size, img, img, 3)).astype(np.float32),
            "image_id": list(range(i * args.batch_size,
                                   (i + 1) * args.batch_size)),
            "gt_captions": [["a picture"] for _ in range(args.batch_size)],
        } for i in range(args.eval_batches)]
        task = CaptionTask(gen_fn)
        return runner.evaluate(task, batches)

    if args.model in ("clip", "eva_clip") and args.task == "classification":
        from ecoflap_tpu.models import clip as clip_mod
        from ecoflap_tpu.tasks.classification import ClassificationTask

        cfg = clip_mod.tiny_config(eva=args.model == "eva_clip")
        params = clip_mod.init_params(cfg, jax.random.PRNGKey(args.seed))
        prompts = jnp.asarray(
            rng.integers(1, cfg.text.vocab_size,
                         size=(10, cfg.text.context_length)), jnp.int32)
        classifier = clip_mod.zero_shot_classifier(cfg, params, prompts, 10)
        mesh = _eval_mesh(args)
        params = _replicate(mesh, params)

        jit_predict = jax.jit(
            lambda p, im, cl: clip_mod.predict(cfg, p, im, cl))

        def predict_fn(batch):
            arrs = _shard_arrays(mesh, {"image": jnp.asarray(batch["image"])})
            return jit_predict(params, arrs["image"], classifier)

        img = (cfg.eva_visual.img_size if cfg.eva_visual else cfg.visual.img_size)
        batches = [{
            "image": rng.normal(size=(args.batch_size, img, img, 3)).astype(np.float32),
            "label": rng.integers(0, 10, size=(args.batch_size,)),
        } for _ in range(2)]
        task = ClassificationTask(predict_fn)
        return runner.evaluate(task, batches)

    if args.model in ("deit", "convnext") and args.task == "classification":
        # image_classifiers top-1 (reference LLaMA/image_classifiers
        # main.py evaluates after pruning)
        cfg, params, fwd, img, ncls = _classifier_model(args)
        mesh = _eval_mesh(args)
        params = _replicate(mesh, params)
        jit_predict = jax.jit(fwd)

        def predict_fn(batch):
            arrs = _shard_arrays(mesh, {"image": jnp.asarray(batch["image"])})
            return jit_predict(params, arrs["image"])

        batches = [{
            "image": rng.normal(
                size=(args.batch_size, img, img, 3)).astype(np.float32),
            "label": rng.integers(0, ncls, size=(args.batch_size,)),
        } for _ in range(2)]
        from ecoflap_tpu.tasks.classification import ClassificationTask

        return runner.evaluate(ClassificationTask(predict_fn), batches)

    if args.model == "t5" and args.task == "mmlu":
        from ecoflap_tpu.models import t5 as t5_mod
        from ecoflap_tpu.tasks.mmlu import MMLUTask

        cfg = _pick(args, t5_mod.flan_t5_xl, t5_mod.flan_t5_base,
                    t5_mod.tiny_config)
        params = _init_params(t5_mod.init_params, cfg, args)
        tok = HashTokenizer(vocab_size=cfg.vocab_size)

        @jax.jit
        def _first_logits(p, ids, mask, dec_in):
            enc = t5_mod.encode(cfg, p, ids, mask)
            return t5_mod.decode(cfg, p, enc, mask, dec_in)[:, 0]

        def first_token_logits(prompts):
            ids, mask = tok(prompts, max_length=64)
            dec_in = jnp.full((len(prompts), 1), cfg.decoder_start_token_id,
                              jnp.int32)
            return np.asarray(_first_logits(params, jnp.asarray(ids),
                                            jnp.asarray(mask), dec_in))

        abcd = [tok._word_id(c) for c in "ABCD"]
        token_len = lambda s: len(tok([s], max_length=10_000, pad=False)[0][0])  # noqa: E731
        dev = [[f"q{i}", "w", "x", "y", "z", "B"] for i in range(5)]
        test = [[f"t{i}", "w", "x", "y", "z",
                 "ABCD"[rng.integers(0, 4)]] for i in range(8)]
        task = MMLUTask(first_token_logits, abcd, token_len_fn=token_len,
                        max_tokens=2048)
        return runner.evaluate(
            task, {"college_physics": {"dev": dev, "test": test}})

    raise NotImplementedError(f"{args.model}/{args.task} synthetic eval")


def _real_eval(args) -> Dict[str, Any]:
    """File-driven evaluation: LAVIS-style annotations via the dataset
    builders (data/datasets.py), reference image processors, jitted generate.
    """
    from ecoflap_tpu.core.registry import registry
    from ecoflap_tpu.data.calibration import HashTokenizer, load_t5_tokenizer
    from ecoflap_tpu.data.datasets import batch_iterator
    from ecoflap_tpu.data.processors import ImageEvalProcessor
    from ecoflap_tpu.models.generation import GenerateConfig
    from ecoflap_tpu.runners.runner import Runner
    from ecoflap_tpu.tasks.captioning import CaptionTask
    from ecoflap_tpu.tasks.vqa import GQATask, VQATask

    runner = Runner(args.output_dir, f"eval_{args.model}_{args.task}")

    if args.model == "blip2_t5" and args.task in ("vqa", "gqa", "captioning"):
        from ecoflap_tpu.models import blip2
        from ecoflap_tpu.utils import checkpoint as ck

        cfg = _pick(args, blip2.blip2_flant5xl, blip2.blip2_small,
                    lambda: blip2.tiny_config(vocab_size=args.vocab_size))
        if args.checkpoint and args.checkpoint.endswith(".pth"):
            params = ck.convert_blip2(
                ck.load_torch_checkpoint(args.checkpoint), cfg,
                dtype=jnp.bfloat16)
        else:
            params = _init_params(blip2.init_params, cfg, args)
            if args.checkpoint:
                params = Runner(args.output_dir).load_checkpoint(
                    params, args.checkpoint)
        tok = load_t5_tokenizer(vocab_size=cfg.t5.vocab_size,
                                path=args.tokenizer_path)
        gen = GenerateConfig(max_new_tokens=args.max_new_tokens,
                             num_beams=args.num_beams,
                             length_penalty=args.length_penalty)
        vis = ImageEvalProcessor(image_size=cfg.vit.img_size)
        prompt = "Question: {} Short answer:"
        mesh = _eval_mesh(args)
        params = _replicate(mesh, params)

        def predict_fn(batch):
            texts = [prompt.format(q) for q in batch["text_input"]]
            ids, mask = tok(texts, max_length=32)
            arrs = _shard_arrays(mesh, {
                "image": jnp.asarray(batch["image"]),
                "ids": jnp.asarray(ids), "mask": jnp.asarray(mask)})
            out = blip2.generate(cfg, params, arrs["image"], arrs["ids"],
                                 arrs["mask"], gen)
            return [tok.decode(list(map(int, row))) for row in np.asarray(out)]

        name = {"vqa": "coco_vqa", "gqa": "gqa",
                "captioning": "coco_caption"}[args.task]
        ds = registry.get("builder", name)(
            {"vis_root": args.vis_root, "ann_paths": [args.ann]},
            vis_processor=vis)
        batches = list(batch_iterator(ds, args.batch_size, drop_last=True))
        if args.task == "captioning":
            def gen_fn(batch):
                ids, mask = tok([""] * len(batch["image"]), max_length=4)
                arrs = _shard_arrays(mesh, {
                    "image": jnp.asarray(batch["image"]),
                    "ids": jnp.asarray(ids), "mask": jnp.asarray(mask)})
                out = blip2.generate(cfg, params, arrs["image"], arrs["ids"],
                                     arrs["mask"], gen)
                return [tok.decode(list(map(int, r))) for r in np.asarray(out)]
            task = CaptionTask(gen_fn)
        else:
            task = GQATask(predict_fn) if args.task == "gqa" else VQATask(predict_fn)
        return runner.evaluate(task, batches)

    if args.model in ("clip", "eva_clip") and args.task == "classification":
        from ecoflap_tpu.data.prompts import (
            TEMPLATE_SETS,
            build_prompts,
            load_classnames,
        )
        from ecoflap_tpu.models import clip as clip_mod
        from ecoflap_tpu.tasks.classification import ClassificationTask

        _eva = args.model == "eva_clip"
        cfg = _pick(args,
                    clip_mod.eva_clip_g if _eva else clip_mod.vit_b16,
                    lambda: clip_mod.small_config(eva=_eva),
                    lambda: clip_mod.tiny_config(eva=_eva))
        params = _init_params(clip_mod.init_params, cfg, args)
        if args.checkpoint:
            params = Runner(args.output_dir).load_checkpoint(params,
                                                             args.checkpoint)
        img = (cfg.eva_visual.img_size if cfg.eva_visual
               else cfg.visual.img_size)
        vis = ImageEvalProcessor(image_size=img)
        ds = registry.get("builder", args.dataset)(
            {"vis_root": args.vis_root}, vis_processor=vis)
        tok = HashTokenizer(vocab_size=cfg.text.vocab_size)
        if args.prompt_templates == "coop":
            # single per-dataset CUSTOM_TEMPLATE (zsclip.py:42-43)
            from ecoflap_tpu.data.coop import coop_prompts

            prompts = coop_prompts(args.dataset, ds.classnames)
        else:
            prompts = build_prompts(ds.classnames,
                                    TEMPLATE_SETS[args.prompt_templates])
        ids, _ = tok(prompts, max_length=cfg.text.context_length)
        classifier = clip_mod.zero_shot_classifier(
            cfg, params, jnp.asarray(ids), len(ds.classnames))
        mesh = _eval_mesh(args)
        params = _replicate(mesh, params)
        # one jit program per batch — the eager tower would dispatch every
        # op separately through the device tunnel
        jit_predict = jax.jit(
            lambda p, im, cl: clip_mod.predict(cfg, p, im, cl))

        def predict_fn(batch):
            arrs = _shard_arrays(mesh, {"image": jnp.asarray(batch["image"])})
            return jit_predict(params, arrs["image"], classifier)

        task = ClassificationTask(predict_fn)
        return runner.evaluate(
            task, list(batch_iterator(ds, args.batch_size, drop_last=True)))

    if args.model in ("deit", "convnext") and args.task == "classification":
        from ecoflap_tpu.tasks.classification import ClassificationTask

        cfg, params, fwd, img, ncls = _classifier_model(args)
        vis = ImageEvalProcessor(image_size=img)
        ds = registry.get("builder", "imagenet")(
            {"vis_root": args.vis_root}, vis_processor=vis)
        mesh = _eval_mesh(args)
        params = _replicate(mesh, params)
        jit_predict = jax.jit(fwd)

        def predict_fn(batch):
            arrs = _shard_arrays(mesh, {"image": jnp.asarray(batch["image"])})
            return jit_predict(params, arrs["image"])

        return runner.evaluate(
            ClassificationTask(predict_fn),
            list(batch_iterator(ds, args.batch_size, drop_last=True)))

    raise NotImplementedError(f"{args.model}/{args.task} real-data eval")


def main(argv=None):
    import sys as _sys

    parser = build_parser()
    args = parser.parse_args(argv)
    from ecoflap_tpu.core.project import apply_cfg_path

    apply_cfg_path(args, _sys.argv[1:] if argv is None else argv)
    if not args.model or not args.task:
        parser.error("--model and --task are required "
                     "(directly or via --cfg-path)")
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from ecoflap_tpu.parallel.dist import init_distributed_mode

    init_distributed_mode()
    if args.synthetic or not (args.ann or args.vis_root):
        metrics = _synthetic_eval(args)
    else:
        metrics = _real_eval(args)
    print(json.dumps(metrics))
    return metrics


if __name__ == "__main__":
    main()
