"""BLIP-1 — the UPop-subproject model family (captioner first).

Reference: UPop/models/blip.py ``BLIP_Decoder`` (:77-140): ViT-B/16 tower +
BERT ``text_decoder`` (med.py BertLMHeadModel: 12 post-LN layers, cross-attn
to image tokens on every layer, causal, LM head), trained/evaluated with
next-token CE over the caption (prompt tokens masked out).

Pruned stacks (UPop/pruners/wanda_pruner.py:600-720): ``visual_encoder.
blocks`` (per-tensor) and ``text_decoder.bert.encoder.layer`` (per-row), a
joint coarse stage over both — exactly the BLIP-2 orchestration shape, so the
same TwoStagePruner drives it.

ITC/ITM retrieval heads and the NLVR dual-image variant follow the same
tower composition; the retrieval projections are included (vision_proj /
text_proj -> shared 256-d space, blip.py BLIP_Base).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ecoflap_tpu.models import bert as bert_mod
from ecoflap_tpu.models import eva_vit
from ecoflap_tpu.pruning.adapter import LossPlan, ModelAdapter

PyTree = Any


@dataclass(frozen=True)
class Blip1Config:
    vit: eva_vit.EvaViTConfig
    text: bert_mod.BertConfig
    embed_dim: int = 256  # ITC projection space
    prompt_length: int = 0  # caption prompt tokens excluded from the loss


def blip_base(img_size: int = 384) -> Blip1Config:
    """BLIP w/ ViT-B/16 (blip.py:84-92 defaults)."""
    vit = eva_vit.EvaViTConfig(
        img_size=img_size, patch_size=16, embed_dim=768, depth=12,
        num_heads=12, mlp_hidden=3072, final_norm=True, qkv_bias_mode="full",
    )
    text = bert_mod.BertConfig(
        add_cross_attention=True, causal=True, encoder_width=768,
    )
    return Blip1Config(vit=vit, text=text)


def tiny_config() -> Blip1Config:
    vit = eva_vit.tiny_config(final_norm=True, qkv_bias_mode="full")
    text = bert_mod.tiny_config(add_cross_attention=True, causal=True,
                                encoder_width=vit.embed_dim)
    return Blip1Config(vit=vit, text=text, embed_dim=16)


def init_params(cfg: Blip1Config, key: jax.Array, dtype=jnp.float32) -> PyTree:
    kv, kt, kp1, kp2 = jax.random.split(key, 4)
    d_v, d_t = cfg.vit.embed_dim, cfg.text.hidden_size
    return {
        "visual_encoder": eva_vit.init_params(cfg.vit, kv, dtype),
        "text_decoder": bert_mod.init_params(cfg.text, kt, dtype),
        "vision_proj": {
            "kernel": (jax.random.normal(kp1, (d_v, cfg.embed_dim), jnp.float32) * 0.02).astype(dtype),
            "bias": jnp.zeros((cfg.embed_dim,), dtype),
        },
        "text_proj": {
            "kernel": (jax.random.normal(kp2, (d_t, cfg.embed_dim), jnp.float32) * 0.02).astype(dtype),
            "bias": jnp.zeros((cfg.embed_dim,), dtype),
        },
    }


def encode_image(cfg: Blip1Config, params: PyTree, images: jax.Array) -> jax.Array:
    """All ViT tokens (final-norm applied to every token, BLIP convention)."""
    x = eva_vit.forward_features(cfg.vit, params["visual_encoder"], images)
    from ecoflap_tpu.models.layers import layer_norm

    return layer_norm(params["visual_encoder"]["norm"], x, cfg.vit.ln_eps)


def per_sample_loss(cfg: Blip1Config, params: PyTree, batch: Any) -> jax.Array:
    """Caption LM loss: decoder teacher-forced on caption ids with cross-attn
    to image tokens; next-token CE, -100/prompt positions ignored
    (blip.py:107-134)."""
    img = encode_image(cfg, params, batch["image"])
    ids = batch["caption_ids"]
    mask = batch["caption_mask"]
    hidden = bert_mod.forward(cfg.text, params["text_decoder"], ids, mask, img)
    logits = bert_mod.lm_logits(cfg.text, params["text_decoder"], hidden)
    targets = ids[:, 1:]
    valid = mask[:, 1:] > 0
    if cfg.prompt_length > 1:
        pos = jnp.arange(targets.shape[1])[None]
        valid = valid & (pos >= cfg.prompt_length - 1)
    logp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
    ce = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    ce = jnp.where(valid, ce, 0.0)
    return jnp.sum(ce, axis=-1) / jnp.maximum(jnp.sum(valid, axis=-1), 1)


def generate(
    cfg: Blip1Config,
    params: PyTree,
    images: jax.Array,
    prompt_ids: jax.Array,
    gen=None,
    use_beam: bool = True,
) -> jax.Array:
    """Jitted caption generate: ViT features cross-attended by the BERT
    decoder under HF beam-search semantics (the reference's
    blip_caption.generate / UPop caption eval: beam-3, max_length 20,
    min_length 5, shared unpadded prompt 'a picture of ')."""
    from ecoflap_tpu.models.generation import GenerateConfig

    if gen is None:
        gen = GenerateConfig(max_new_tokens=20, num_beams=3, min_length=5,
                             eos_token_id=cfg.text.sep_token_id,
                             pad_token_id=cfg.text.pad_token_id)
    return _generate_jit(cfg, params, images, prompt_ids, gen, use_beam)


@functools.partial(jax.jit, static_argnames=("cfg", "gen", "use_beam"))
def _generate_jit(cfg, params, images, prompt_ids, gen, use_beam):
    img = encode_image(cfg, params, images)
    return bert_mod.generate_with_encoder(
        cfg.text, params["text_decoder"], prompt_ids, img, gen, use_beam)


def itc_features(cfg: Blip1Config, params: PyTree, images, ids, mask):
    """Normalized (image, text) embeddings in the shared 256-d ITC space."""
    img = encode_image(cfg, params, images)[:, 0]
    iv = jnp.dot(img, params["vision_proj"]["kernel"],
                 preferred_element_type=jnp.float32) + params["vision_proj"]["bias"]
    txt_cfg = bert_mod.BertConfig(**{**cfg.text.__dict__, "causal": False,
                                     "add_cross_attention": False})
    # text-only encoding reuses the decoder's self-attn path without cross
    hidden = bert_mod.forward(txt_cfg, params["text_decoder"], ids, mask)
    tv = jnp.dot(hidden[:, 0], params["text_proj"]["kernel"],
                 preferred_element_type=jnp.float32) + params["text_proj"]["bias"]

    def norm(x):
        return x / jnp.linalg.norm(x, axis=-1, keepdims=True)

    return norm(iv), norm(tv)


# ---------------------------------------------------------------------------
# VQA variant (UPop/models/blip_vqa.py): question encoder + answer decoder
# ---------------------------------------------------------------------------

def init_vqa_params(cfg: Blip1Config, key: jax.Array, dtype=jnp.float32) -> PyTree:
    """BLIP-VQA: shared ViT; BERT ``text_encoder`` (bidirectional, cross-attn
    to image) encodes the question; BERT ``text_decoder`` (causal, cross-attn
    to question states) generates/scores the answer."""
    kv, ke, kd = jax.random.split(key, 3)
    enc_cfg = bert_mod.BertConfig(**{**cfg.text.__dict__, "causal": False})
    return {
        "visual_encoder": eva_vit.init_params(cfg.vit, kv, dtype),
        "text_encoder": bert_mod.init_params(enc_cfg, ke, dtype),
        "text_decoder": bert_mod.init_params(cfg.text, kd, dtype),
    }


def vqa_loss(cfg: Blip1Config, params: PyTree, batch) -> jax.Array:
    """(B,) answer LM loss given image+question (blip_vqa.py train branch)."""
    img = encode_image(cfg, params, batch["image"])
    enc_cfg = bert_mod.BertConfig(**{**cfg.text.__dict__, "causal": False})
    q_states = bert_mod.forward(
        enc_cfg, params["text_encoder"], batch["question_ids"],
        batch["question_mask"], img,
    )
    hidden = bert_mod.forward(
        cfg.text, params["text_decoder"], batch["answer_ids"],
        batch["answer_mask"], q_states, batch["question_mask"],
    )
    logits = bert_mod.lm_logits(cfg.text, params["text_decoder"], hidden)
    targets = batch["answer_ids"][:, 1:]
    valid = batch["answer_mask"][:, 1:] > 0
    logp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
    ce = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    ce = jnp.where(valid, ce, 0.0)
    return jnp.sum(ce, axis=-1) / jnp.maximum(jnp.sum(valid, axis=-1), 1)


def rank_answers(
    cfg: Blip1Config,
    params: PyTree,
    images: jax.Array,
    q_ids: jax.Array,
    q_mask: jax.Array,
    answer_ids: jax.Array,
    answer_mask: jax.Array,
    k: int = 128,
) -> jax.Array:
    """(B,) best answer-list indices — the reference's rank inference
    (UPop blip_vqa.py:132-177 rank_answer): a bos-only decoder pass picks
    the top-k candidates by FIRST-token probability, then the full decoder
    LM scores them (per-sample token-SUM of log-probs, med.py
    reduction='none' semantics) and argmax wins. ``answer_ids[:, 0]`` must
    be the shared decoder bos."""
    img = encode_image(cfg, params, images)
    enc_cfg = bert_mod.BertConfig(**{**cfg.text.__dict__, "causal": False})
    q_states = bert_mod.forward(enc_cfg, params["text_encoder"], q_ids,
                                q_mask, img)
    b = q_ids.shape[0]
    n = answer_ids.shape[0]
    k = min(k, n)

    start_ids = jnp.full((b, 1), answer_ids[0, 0], jnp.int32)
    hidden = bert_mod.forward(cfg.text, params["text_decoder"], start_ids,
                              jnp.ones((b, 1), jnp.int32), q_states, q_mask)
    logits = bert_mod.lm_logits(cfg.text, params["text_decoder"], hidden)[:, 0]
    first_prob = jax.nn.softmax(logits, axis=-1)[:, answer_ids[:, 1]]  # (B, N)
    _, topk_idx = jax.lax.top_k(first_prob, k)  # (B, k)

    flat_ids = answer_ids[topk_idx].reshape(b * k, -1)
    flat_mask = answer_mask[topk_idx].reshape(b * k, -1)
    hidden = bert_mod.forward(
        cfg.text, params["text_decoder"], flat_ids, flat_mask,
        jnp.repeat(q_states, k, axis=0), jnp.repeat(q_mask, k, axis=0))
    logits = bert_mod.lm_logits(cfg.text, params["text_decoder"], hidden)
    targets = flat_ids[:, 1:]
    valid = flat_mask[:, 1:] > 0
    logp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
    lp = jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    score = jnp.sum(jnp.where(valid, lp, 0.0), axis=-1).reshape(b, k)
    best = jnp.argmax(score, axis=1)
    return topk_idx[jnp.arange(b), best]


def make_vqa_adapter(cfg: Blip1Config, params: PyTree) -> ModelAdapter:
    vit_stack = eva_vit.make_stack(
        cfg.vit, name="visual_encoder.blocks", blocks_path="visual_encoder.blocks"
    )
    enc_cfg = bert_mod.BertConfig(**{**cfg.text.__dict__, "causal": False})

    def enc_prepare(p, batch):
        img = encode_image(cfg, p, batch["image"])
        x = bert_mod.embed(enc_cfg, p["text_encoder"], batch["question_ids"])
        cache = bert_mod.make_cache(
            enc_cfg, batch["question_mask"], img,
            jnp.ones(img.shape[:2], jnp.int32), x.shape[1])
        return x, cache

    def dec_prepare(p, batch):
        img = encode_image(cfg, p, batch["image"])
        q_states = bert_mod.forward(
            enc_cfg, p["text_encoder"], batch["question_ids"],
            batch["question_mask"], img)
        x = bert_mod.embed(cfg.text, p["text_decoder"], batch["answer_ids"])
        cache = bert_mod.make_cache(
            cfg.text, batch["answer_mask"], q_states, batch["question_mask"],
            x.shape[1])
        return x, cache

    # reference sparsity-key prefix: the VQA question encoder is a bare
    # BertModel — "text_encoder.encoder.layer", no ".bert." segment
    # (UPop/pruners/wanda_pruner.py:813-818)
    enc_stack = bert_mod.make_bert_stack(
        enc_cfg, "text_encoder.encoder.layer", "text_encoder.blocks",
        enc_prepare)
    dec_stack = bert_mod.make_bert_stack(
        cfg.text, "text_decoder.bert.encoder.layer", "text_decoder.blocks",
        dec_prepare)

    def loss_fn(p, batch):
        return vqa_loss(cfg, p, batch)

    return ModelAdapter(
        name="blip_vqa", params=params, loss_fn=loss_fn,
        stacks=[vit_stack, enc_stack, dec_stack],
        model_prefixes={vit_stack.name: "visual_encoder",
                        enc_stack.name: "text_encoder",
                        dec_stack.name: "text_decoder"},
    )


# ---------------------------------------------------------------------------
# Retrieval variant (UPop/models/blip_retrieval.py / blip_itm.py): ITC + ITM
# ---------------------------------------------------------------------------

def init_retrieval_params(cfg: Blip1Config, key: jax.Array,
                          dtype=jnp.float32) -> PyTree:
    """BLIP retrieval/ITM tower set (UPop/models/blip_retrieval.py:40-53):
    ViT + bidirectional ``text_encoder`` (BertModel — checkpoint keys have NO
    ``.bert.`` segment, unlike the caption decoder) + vision_proj/text_proj +
    2-way itm_head. Momentum copies (*_m) are eval-only EMA shadows and are
    not rebuilt."""
    base = init_params(cfg, key, dtype)
    base["text_encoder"] = base.pop("text_decoder")
    d = cfg.text.hidden_size
    k = jax.random.fold_in(key, 123)
    base["itm_head"] = {
        "kernel": (jax.random.normal(k, (d, 2), jnp.float32) * 0.02).astype(dtype),
        "bias": jnp.zeros((2,), dtype),
    }
    return base


def itm_logits(cfg: Blip1Config, params: PyTree, images, ids, mask) -> jax.Array:
    """(B, 2) image-text-matching logits: text encoder WITH cross-attn to the
    image, [CLS] -> itm_head (blip_itm.py itm branch)."""
    img = encode_image(cfg, params, images)
    enc_cfg = bert_mod.BertConfig(**{**cfg.text.__dict__, "causal": False})
    hidden = bert_mod.forward(enc_cfg, params["text_encoder"], ids, mask, img)
    cls = hidden[:, 0]
    return (jnp.dot(cls, params["itm_head"]["kernel"],
                    preferred_element_type=jnp.float32)
            + params["itm_head"]["bias"])


def retrieval_per_sample_loss(cfg: Blip1Config, params: PyTree,
                              batch) -> jax.Array:
    """Per-sample ITM cross-entropy on matched (image, caption) pairs — the
    UPop retrieval calibration loss (wanda_pruner.py:721-750 retrieval-ITM
    branch of forward_to_cache): -log p(match) from the ITM head."""
    logits = itm_logits(cfg, params, batch["image"], batch["caption_ids"],
                        batch["caption_mask"])
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -logp[:, 1]


def make_retrieval_adapter(cfg: Blip1Config, params: PyTree) -> ModelAdapter:
    """Retrieval pruning adapter: same ViT + text towers as the captioner,
    but the text stack streams the ITM path (bidirectional self-attn,
    cross-attn to the image) and the calibration loss is ITM-CE — so Wanda/
    SparseGPT activation stats match what the ITM head actually sees.
    Sparsity keys use the reference BertModel prefix
    ``text_encoder.encoder.layer`` (wanda_pruner.py:821-823: no ``.bert.``
    segment outside the caption/vqa decoders)."""
    vit_stack = eva_vit.make_stack(
        cfg.vit, name="visual_encoder.blocks",
        blocks_path="visual_encoder.blocks")
    enc_cfg = bert_mod.BertConfig(**{**cfg.text.__dict__, "causal": False})

    def bert_prepare(p, batch):
        img = encode_image(cfg, p, batch["image"])
        x = bert_mod.embed(enc_cfg, p["text_encoder"], batch["caption_ids"])
        cache = bert_mod.make_cache(
            enc_cfg, batch["caption_mask"], img,
            jnp.ones(img.shape[:2], jnp.int32), x.shape[1],
        )
        return x, cache

    bert_stack = bert_mod.make_bert_stack(
        enc_cfg, name="text_encoder.encoder.layer",
        blocks_path="text_encoder.blocks", prepare_inputs=bert_prepare,
    )

    def loss_fn(p, batch):
        return retrieval_per_sample_loss(cfg, p, batch)

    def build_mezo_plans(p, batch, num_chunks: int = 1):
        from ecoflap_tpu.pruning.mezo import make_chunked_loss

        enc = make_chunked_loss(
            lambda pp, b: encode_image(cfg, pp, b["image"]), num_chunks
        )
        img = jax.jit(enc)(p, {"image": batch["image"]})
        n = batch["image"].shape[0]
        img = img.reshape(n, -1, cfg.vit.embed_dim)
        data = {**batch, "image_embeds": img}

        def text_loss(pp, b):
            hidden = bert_mod.forward(
                enc_cfg, pp["text_encoder"], b["caption_ids"],
                b["caption_mask"], b["image_embeds"],
            )
            logits = (jnp.dot(hidden[:, 0], pp["itm_head"]["kernel"],
                              preferred_element_type=jnp.float32)
                      + pp["itm_head"]["bias"])
            return -jax.nn.log_softmax(logits, axis=-1)[:, 1]

        return [LossPlan(
            match=lambda name: name.startswith("text_encoder."),
            loss_fn=text_loss, data=data,
        )]

    return ModelAdapter(
        name="blip1_retrieval", params=params, loss_fn=loss_fn,
        stacks=[vit_stack, bert_stack],
        model_prefixes={
            vit_stack.name: "visual_encoder",
            bert_stack.name: "text_encoder",
        },
        build_mezo_plans=build_mezo_plans,
    )


def retrieval_sim_matrix(cfg: Blip1Config, params: PyTree, images, texts_ids,
                         texts_mask) -> jax.Array:
    """(N_img, N_txt) ITC cosine similarity (first-stage retrieval scores;
    ITM re-ranks the top-k via tasks.retrieval.rerank_fn)."""
    img = encode_image(cfg, params, images)[:, 0]
    iv = jnp.dot(img, params["vision_proj"]["kernel"],
                 preferred_element_type=jnp.float32) + params["vision_proj"]["bias"]
    iv = iv / jnp.linalg.norm(iv, axis=-1, keepdims=True)
    enc_cfg = bert_mod.BertConfig(**{**cfg.text.__dict__, "causal": False,
                                     "add_cross_attention": False})
    hidden = bert_mod.forward(enc_cfg, params["text_encoder"], texts_ids,
                              texts_mask)
    tv = jnp.dot(hidden[:, 0], params["text_proj"]["kernel"],
                 preferred_element_type=jnp.float32) + params["text_proj"]["bias"]
    tv = tv / jnp.linalg.norm(tv, axis=-1, keepdims=True)
    return jnp.dot(iv, tv.T)


# ---------------------------------------------------------------------------
# NLVR2 variant (UPop/models/blip_nlvr.py:18-91 + nlvr_encoder.py:228-269)
# ---------------------------------------------------------------------------

def init_nlvr_params(cfg: Blip1Config, key: jax.Array, dtype=jnp.float32) -> PyTree:
    """BLIP-NLVR: shared ViT over both images; ``text_encoder`` (BertModel,
    checkpoint keys WITHOUT ``.bert.``) whose cross attention runs TWIN
    streams with fully separate self0/self1 q/k/v (nlvr_encoder.py:262-268)
    and separate output denses — averaged for layers < 6, linearly merged by
    ``merge_layer`` for layers >= 6 (nlvr_encoder.py:239-253; the merge flag
    is set at layer_num >= 6); 2-way MLP cls head on [CLS]
    (blip_nlvr.py:44-47)."""
    base = init_params(cfg, key, dtype)
    base.pop("vision_proj", None)  # BLIP_NLVR has no ITC projections
    base.pop("text_proj", None)
    base["text_encoder"] = base.pop("text_decoder")
    d = cfg.text.hidden_size
    L = cfg.text.num_layers
    ks = jax.random.split(jax.random.fold_in(key, 99), 6)

    def dense(k, din, dout):
        return {
            "kernel": (jax.random.normal(k, (L, din, dout), jnp.float32) * 0.02).astype(dtype),
            "bias": jnp.zeros((L, dout), dtype),
        }

    blocks = base["text_encoder"]["blocks"]
    cp = blocks["cross"]
    cp["query1"] = dense(ks[3], d, d)
    cp["key1"] = dense(ks[4], cfg.text.encoder_width, d)
    cp["value1"] = dense(ks[5], cfg.text.encoder_width, d)
    cp["out1"] = dense(ks[0], d, d)
    cp["merge"] = dense(ks[1], 2 * d, d)
    # static per-layer merge flag (reference: merge_layer only for layers
    # >= 6); rides the stacked blocks tree so lax.scan sees it per step.
    # Not a ``.kernel`` leaf, so the pruning walk never touches it.
    cp["merge_on"] = (jnp.arange(L) >= min(6, L - 1)).astype(dtype)[:, None]
    base["cls_head"] = {
        "dense": {
            "kernel": (jax.random.normal(ks[2], (d, d), jnp.float32) * 0.02).astype(dtype),
            "bias": jnp.zeros((d,), dtype),
        },
        "out": {
            "kernel": (jax.random.normal(ks[2], (d, 2), jnp.float32) * 0.02).astype(dtype),
            "bias": jnp.zeros((2,), dtype),
        },
    }
    return base


def nlvr_block_forward(cfg: Blip1Config, bp: PyTree, x: jax.Array, cache,
                       collect=None):
    """Twin-cross BERT layer (nlvr_encoder.py BertAttention/BertSelfOutput):
    stream i runs its OWN q/k/v (self0/self1, :262-268) against image i's
    features and its own output dense (dense0/dense1); layers < 6 average
    the two dense outputs, layers >= 6 concatenate and pass ``merge_layer``
    (:246-253) — selected per layer by the static ``merge_on`` flag riding
    the stacked params (both paths compute; the merge matmul is tiny)."""
    from ecoflap_tpu.models.bert import _bert_attn, _proj
    from ecoflap_tpu.models.layers import attention as mha
    from ecoflap_tpu.models.layers import collect_stats, layer_norm

    tcfg = cfg.text
    self_bias, cross_bias0, cross_bias1, enc0, enc1 = cache
    stats = {}
    x = _bert_attn(tcfg, bp["attn"], x, x, self_bias, stats, "attention", collect)

    cp = bp["cross"]

    def one_stream(which, enc, bias):
        sfx = "" if which == 0 else "1"
        kv = enc.astype(x.dtype)
        collect_stats(stats, f"crossattention.self{which}.query", x, collect)
        collect_stats(stats, f"crossattention.self{which}.key", kv, collect)
        collect_stats(stats, f"crossattention.self{which}.value", kv, collect)
        q = _proj(cp["query" + sfx], x)
        k = _proj(cp["key" + sfx], kv)
        v = _proj(cp["value" + sfx], kv)
        o = mha(q, k, v, tcfg.num_heads, bias=bias)
        collect_stats(stats, f"crossattention.output.dense{which}", o,
                      collect)
        return _proj(cp["out" + sfx], o)

    h0 = one_stream(0, enc0, cross_bias0)
    h1 = one_stream(1, enc1, cross_bias1)
    cat = jnp.concatenate([h0, h1], axis=-1)
    collect_stats(stats, "crossattention.output.merge_layer", cat, collect)
    merged = _proj(cp["merge"], cat)
    avg = (h0 + h1) * 0.5
    f = cp["merge_on"].astype(merged.dtype)  # (1,) under the block scan
    mixed = merged * f + avg * (1.0 - f)
    x = layer_norm(cp["ln"], mixed + x, tcfg.ln_eps)

    collect_stats(stats, "intermediate.dense", x, collect)
    h = jax.nn.gelu(_proj(bp["ffn"]["intermediate"], x), approximate=False)
    collect_stats(stats, "output.dense", h, collect)
    h = _proj(bp["ffn"]["out"], h)
    return layer_norm(bp["ffn"]["ln"], h + x, tcfg.ln_eps), stats


def nlvr_forward(cfg: Blip1Config, params: PyTree, batch) -> jax.Array:
    """(B, 2) logits for NLVR2 (true/false)."""
    img0 = encode_image(cfg, params, batch["image0"])
    img1 = encode_image(cfg, params, batch["image1"])
    ids, mask = batch["text_ids"], batch["text_mask"]
    x = bert_mod.embed(cfg.text, params["text_encoder"], ids)
    from ecoflap_tpu.models.layers import mask_bias

    cache = (mask_bias(mask),
             mask_bias(jnp.ones(img0.shape[:2], jnp.int32)),
             mask_bias(jnp.ones(img1.shape[:2], jnp.int32)),
             img0, img1)

    def body(x, bp):
        y, _ = nlvr_block_forward(cfg, bp, x, cache)
        return y, None

    from ecoflap_tpu.models.layers import tower_scan

    x, _ = tower_scan(body, x, params["text_encoder"]["blocks"])
    cls = x[:, 0]
    h = (jnp.dot(cls, params["cls_head"]["dense"]["kernel"],
                 preferred_element_type=jnp.float32)
         + params["cls_head"]["dense"]["bias"]).astype(cls.dtype)
    h = jax.nn.relu(h)
    return (jnp.dot(h, params["cls_head"]["out"]["kernel"],
                    preferred_element_type=jnp.float32)
            + params["cls_head"]["out"]["bias"])


def nlvr_loss(cfg: Blip1Config, params: PyTree, batch) -> jax.Array:
    logits = nlvr_forward(cfg, params, batch)
    return -jax.nn.log_softmax(logits, axis=-1)[
        jnp.arange(logits.shape[0]), batch["label"]
    ]


def make_nlvr_adapter(cfg: Blip1Config, params: PyTree) -> ModelAdapter:
    """NLVR pruning adapter (task-conditional loss, UPop forward_to_cache
    nlvr branch, pruners/wanda_pruner.py:721-750)."""
    vit_stack = eva_vit.make_stack(
        cfg.vit, name="visual_encoder.blocks", blocks_path="visual_encoder.blocks"
    )

    # NLVR's ViT sees both images as one doubled batch (blip_nlvr.py:52-55)
    def vit_prepare(p, batch):
        images = jnp.concatenate([batch["image0"], batch["image1"]], axis=0)
        return eva_vit.embed(cfg.vit, p["visual_encoder"], images), None

    vit_stack.prepare_inputs = vit_prepare

    def bert_prepare(p, batch):
        from ecoflap_tpu.models.layers import mask_bias

        img0 = encode_image(cfg, p, batch["image0"])
        img1 = encode_image(cfg, p, batch["image1"])
        x = bert_mod.embed(cfg.text, p["text_encoder"], batch["text_ids"])
        cache = (mask_bias(batch["text_mask"]),
                 mask_bias(jnp.ones(img0.shape[:2], jnp.int32)),
                 mask_bias(jnp.ones(img1.shape[:2], jnp.int32)),
                 img0, img1)
        return x, cache

    from ecoflap_tpu.models.adapters import make_stack as _mk

    # reference-named twin-stream linears (nlvr_encoder.py; sparsity keys
    # f"text_encoder.encoder.layer.{i}.{name}.weight" — the NLVR BertModel
    # has no ``.bert.`` segment, wanda_pruner.py:821-823)
    nlvr_linears = tuple(
        n for n in bert_mod.LINEAR_NAMES if not n.startswith("crossattention")
    ) + (
        "crossattention.self0.query", "crossattention.self0.key",
        "crossattention.self0.value",
        "crossattention.self1.query", "crossattention.self1.key",
        "crossattention.self1.value",
        "crossattention.output.dense0", "crossattention.output.dense1",
        "crossattention.output.merge_layer",
    )
    local_to_path = {k: v for k, v in bert_mod.LOCAL_TO_PATH.items()
                     if not k.startswith("crossattention")}
    local_to_path.update({
        "crossattention.self0.query": "cross.query",
        "crossattention.self0.key": "cross.key",
        "crossattention.self0.value": "cross.value",
        "crossattention.self1.query": "cross.query1",
        "crossattention.self1.key": "cross.key1",
        "crossattention.self1.value": "cross.value1",
        "crossattention.output.dense0": "cross.out",
        "crossattention.output.dense1": "cross.out1",
        "crossattention.output.merge_layer": "cross.merge",
    })

    def _fwd(bp, x, cache, collect=None):
        return nlvr_block_forward(cfg, bp, x, cache, collect)

    bert_stack = _mk(
        name="text_encoder.encoder.layer",
        num_blocks=cfg.text.num_layers,
        linear_names=nlvr_linears,
        per_row_mask=True,
        prepare_inputs=bert_prepare,
        block_forward=_fwd,
        blocks_path="text_encoder.blocks",
        local_to_path=local_to_path,
    )

    def loss_fn(p, batch):
        return nlvr_loss(cfg, p, batch)

    return ModelAdapter(
        name="blip_nlvr", params=params, loss_fn=loss_fn,
        stacks=[vit_stack, bert_stack],
        model_prefixes={vit_stack.name: "visual_encoder",
                        bert_stack.name: "text_encoder"},
    )


def make_adapter(cfg: Blip1Config, params: PyTree) -> ModelAdapter:
    vit_stack = eva_vit.make_stack(
        cfg.vit, name="visual_encoder.blocks", blocks_path="visual_encoder.blocks"
    )

    def bert_prepare(p, batch):
        img = encode_image(cfg, p, batch["image"])
        x = bert_mod.embed(cfg.text, p["text_decoder"], batch["caption_ids"])
        cache = bert_mod.make_cache(
            cfg.text, batch["caption_mask"], img,
            jnp.ones(img.shape[:2], jnp.int32), x.shape[1],
        )
        return x, cache

    bert_stack = bert_mod.make_bert_stack(
        cfg.text, name="text_decoder.bert.encoder.layer",
        blocks_path="text_decoder.blocks", prepare_inputs=bert_prepare,
    )

    def loss_fn(p, batch):
        return per_sample_loss(cfg, p, batch)

    def build_mezo_plans(p, batch, num_chunks: int = 1):
        from ecoflap_tpu.pruning.mezo import make_chunked_loss

        enc = make_chunked_loss(
            lambda pp, b: encode_image(cfg, pp, b["image"]), num_chunks
        )
        img = jax.jit(enc)(p, {"image": batch["image"]})
        n = batch["image"].shape[0]
        img = img.reshape(n, -1, cfg.vit.embed_dim)
        data = {**batch, "image_embeds": img}

        def text_loss(pp, b):
            hidden = bert_mod.forward(
                cfg.text, pp["text_decoder"], b["caption_ids"],
                b["caption_mask"], b["image_embeds"],
            )
            logits = bert_mod.lm_logits(cfg.text, pp["text_decoder"], hidden)
            targets = b["caption_ids"][:, 1:]
            valid = b["caption_mask"][:, 1:] > 0
            logp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
            ce = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
            ce = jnp.where(valid, ce, 0.0)
            return jnp.sum(ce, axis=-1) / jnp.maximum(jnp.sum(valid, axis=-1), 1)

        return [LossPlan(
            match=lambda name: name.startswith("text_decoder."),
            loss_fn=text_loss, data=data,
        )]

    return ModelAdapter(
        name="blip1", params=params, loss_fn=loss_fn,
        stacks=[vit_stack, bert_stack],
        model_prefixes={
            vit_stack.name: "visual_encoder",
            bert_stack.name: "text_decoder",
        },
        build_mezo_plans=build_mezo_plans,
    )
