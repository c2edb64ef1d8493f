"""OPT decoder-only generation: KV-cache consistency, HF `generate` token
parity (greedy + beam, prompt-length offsets in min_length/length-penalty),
and the BLIP2-OPT composition (reference blip2_opt.py:154-236)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ecoflap_tpu.models import blip2_opt, opt
from ecoflap_tpu.models.generation import GenerateConfig

torch = pytest.importorskip("torch")


def _hf_twin(seed=0):
    from transformers import OPTConfig as HFOPTConfig
    from transformers import OPTForCausalLM

    hf_cfg = HFOPTConfig(
        vocab_size=64, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, ffn_dim=48, max_position_embeddings=64,
        do_layer_norm_before=True, dropout=0.0, activation_function="relu",
        word_embed_proj_dim=32, pad_token_id=1, bos_token_id=2,
        eos_token_id=2,
    )
    torch.manual_seed(seed)
    hf = OPTForCausalLM(hf_cfg).eval()
    from ecoflap_tpu.utils.checkpoint import convert_opt

    cfg = opt.tiny_config(d_ff=48)
    params = convert_opt({k: v.numpy() for k, v in hf.state_dict().items()},
                         cfg)
    return hf, cfg, params


def _ours_generate(cfg, params, ids, gen, use_beam):
    embeds = opt._embed(cfg, params, jnp.asarray(ids, jnp.int32), None)
    t = ids.shape[1]
    mask = jnp.ones((ids.shape[0], t - 1), jnp.int32)
    return np.asarray(opt.generate_from_embeds(
        cfg, params, embeds[:, :-1], mask,
        jnp.asarray(ids[:, -1], jnp.int32), gen, use_beam,
        pos0=t - 1, len_offset=t - 1))


def _canon(seqs, eos, pad):
    """Zero out everything after the first EOS (HF pads with pad-or-eos)."""
    seqs = np.array(seqs)
    for row in seqs:
        hit = np.where(row == eos)[0]
        if hit.size:
            row[hit[0] + 1:] = pad
    return seqs


def test_opt_cached_step_matches_teacher_forced():
    """Greedy via the prefilled KV cache == argmax loop over full forwards."""
    cfg = opt.tiny_config(d_ff=48)
    params = opt.init_params(cfg, jax.random.PRNGKey(3))
    rng = np.random.default_rng(0)
    ids = rng.integers(3, cfg.vocab_size, size=(3, 6))
    S = 7
    gen = GenerateConfig(max_new_tokens=S, num_beams=1, min_length=1,
                         eos_token_id=cfg.eos_token_id,
                         pad_token_id=cfg.pad_token_id)
    got = _ours_generate(cfg, params, ids, gen, use_beam=False)

    cur = ids.copy()
    done = np.zeros(3, bool)
    want = np.full((3, S), cfg.pad_token_id, np.int64)
    for s in range(S):
        logits = np.asarray(
            opt.forward(cfg, params, jnp.asarray(cur, jnp.int32)))[:, -1]
        nxt = logits.argmax(-1)
        nxt = np.where(done, cfg.pad_token_id, nxt)
        want[:, s] = nxt
        done |= nxt == cfg.eos_token_id
        cur = np.concatenate([cur, nxt[:, None]], axis=1)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("num_beams,length_penalty,min_extra",
                         [(1, 1.0, 0), (3, 1.0, 3), (3, 2.0, 0),
                          (5, -1.0, 2)])
def test_opt_hf_generate_parity(num_beams, length_penalty, min_extra):
    """Token-identical to HF generate for decoder-only prompts: HF counts
    the PROMPT in cur_len (min_length, length normalization), which is what
    len_offset models."""
    hf, cfg, params = _hf_twin()
    rng = np.random.default_rng(1)
    B, T, S = 4, 5, 8
    ids = rng.integers(3, cfg.vocab_size, size=(B, T))
    min_length = T + min_extra
    gen = GenerateConfig(max_new_tokens=S, num_beams=num_beams,
                         min_length=min_length,
                         length_penalty=length_penalty,
                         eos_token_id=cfg.eos_token_id,
                         pad_token_id=cfg.pad_token_id)
    with torch.no_grad():
        out = hf.generate(
            input_ids=torch.tensor(ids),
            attention_mask=torch.ones(B, T, dtype=torch.long),
            do_sample=False, num_beams=num_beams, max_new_tokens=S,
            min_length=min_length, length_penalty=length_penalty,
            early_stopping=False, eos_token_id=cfg.eos_token_id,
            pad_token_id=cfg.pad_token_id,
        ).numpy()[:, T:]
    if out.shape[1] < S:  # HF stops early when every beam finished
        out = np.pad(out, [(0, 0), (0, S - out.shape[1])],
                     constant_values=cfg.pad_token_id)
    ours = _ours_generate(cfg, params, ids, gen, use_beam=num_beams > 1)
    np.testing.assert_array_equal(
        _canon(ours, cfg.eos_token_id, cfg.pad_token_id),
        _canon(out, cfg.eos_token_id, cfg.pad_token_id))


def test_blip2_opt_generate_beam1_equals_greedy():
    cfg = blip2_opt.tiny_config()
    params = blip2_opt.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    img = rng.normal(size=(2, cfg.vit.img_size, cfg.vit.img_size, 3))
    ids = rng.integers(3, cfg.opt.vocab_size, size=(2, 4))
    mask = np.ones_like(ids)
    gen = GenerateConfig(max_new_tokens=6, num_beams=1, min_length=1,
                         eos_token_id=cfg.opt.eos_token_id,
                         pad_token_id=cfg.opt.pad_token_id)
    greedy = np.asarray(blip2_opt.generate(
        cfg, params, jnp.asarray(img, jnp.float32), jnp.asarray(ids, jnp.int32),
        jnp.asarray(mask, jnp.int32), gen, use_beam=False))
    beam1 = np.asarray(blip2_opt.generate(
        cfg, params, jnp.asarray(img, jnp.float32), jnp.asarray(ids, jnp.int32),
        jnp.asarray(mask, jnp.int32), gen, use_beam=True))
    np.testing.assert_array_equal(greedy, beam1)
    assert greedy.shape == (2, 6)


def test_blip2_opt_generate_beam5_runs():
    cfg = blip2_opt.tiny_config()
    params = blip2_opt.init_params(cfg, jax.random.PRNGKey(1))
    rng = np.random.default_rng(1)
    img = rng.normal(size=(2, cfg.vit.img_size, cfg.vit.img_size, 3))
    ids = rng.integers(3, cfg.opt.vocab_size, size=(2, 4))
    out = blip2_opt.generate(
        cfg, params, jnp.asarray(img, jnp.float32),
        jnp.asarray(ids, jnp.int32), jnp.asarray(np.ones_like(ids), jnp.int32))
    assert np.asarray(out).shape == (2, 30)


def test_opt_hf_parity_eos_competitive_min_length():
    """Pin the min_length prompt-offset (len_offset = T-1): with an
    EOS-boosted twin the EOS token reaches the beam frontier exactly at the
    min_length boundary, where an off-by-one diverges from HF (the random
    twins above never surface EOS there)."""
    from transformers import OPTConfig as HFOPTConfig
    from transformers import OPTForCausalLM

    hf_cfg = HFOPTConfig(
        vocab_size=64, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, ffn_dim=48, max_position_embeddings=64,
        do_layer_norm_before=True, dropout=0.0, activation_function="relu",
        word_embed_proj_dim=32, pad_token_id=1, bos_token_id=2,
        eos_token_id=2,
    )
    for seed in range(4):
        torch.manual_seed(seed)
        hf = OPTForCausalLM(hf_cfg).eval()
        with torch.no_grad():  # boost EOS so it competes at the boundary
            hf.model.decoder.embed_tokens.weight[2] *= 3.0
        from ecoflap_tpu.utils.checkpoint import convert_opt

        cfg = opt.tiny_config(d_ff=48)
        params = convert_opt(
            {k: v.numpy() for k, v in hf.state_dict().items()}, cfg)
        rng = np.random.default_rng(seed)
        B, T, S = 3, 5, 6
        ids = rng.integers(3, cfg.vocab_size, size=(B, T))
        for min_extra in (1, 3):
            min_length = T + min_extra
            gen = GenerateConfig(max_new_tokens=S, num_beams=3,
                                 min_length=min_length, length_penalty=1.0,
                                 eos_token_id=2, pad_token_id=1)
            with torch.no_grad():
                out = hf.generate(
                    input_ids=torch.tensor(ids),
                    attention_mask=torch.ones(B, T, dtype=torch.long),
                    do_sample=False, num_beams=3, max_new_tokens=S,
                    min_length=min_length, length_penalty=1.0,
                    early_stopping=False, eos_token_id=2, pad_token_id=1,
                ).numpy()[:, T:]
            if out.shape[1] < S:
                out = np.pad(out, [(0, 0), (0, S - out.shape[1])],
                             constant_values=1)
            ours = _ours_generate(cfg, params, ids, gen, use_beam=True)
            np.testing.assert_array_equal(
                _canon(ours, 2, 1), _canon(out, 2, 1),
                err_msg=f"seed={seed} min_extra={min_extra}")


@pytest.mark.parametrize("num_beams", [1, 3])
def test_opt_hf_parity_repetition_penalty(num_beams):
    """rp=1.5 on the decoder-only path: HF penalizes over the FULL input_ids
    (prompt included, no synthetic bos) — the prompt_tokens seen-set."""
    hf, cfg, params = _hf_twin(seed=7)
    rng = np.random.default_rng(7)
    B, T, S = 3, 5, 8
    ids = rng.integers(3, cfg.vocab_size, size=(B, T))
    gen = GenerateConfig(max_new_tokens=S, num_beams=num_beams, min_length=1,
                         repetition_penalty=1.5,
                         eos_token_id=cfg.eos_token_id,
                         pad_token_id=cfg.pad_token_id)
    with torch.no_grad():
        out = hf.generate(
            input_ids=torch.tensor(ids),
            attention_mask=torch.ones(B, T, dtype=torch.long),
            do_sample=False, num_beams=num_beams, max_new_tokens=S,
            min_length=1, repetition_penalty=1.5, early_stopping=False,
            eos_token_id=cfg.eos_token_id, pad_token_id=cfg.pad_token_id,
        ).numpy()[:, T:]
    if out.shape[1] < S:
        out = np.pad(out, [(0, 0), (0, S - out.shape[1])],
                     constant_values=cfg.pad_token_id)
    embeds = opt._embed(cfg, params, jnp.asarray(ids, jnp.int32), None)
    ours = np.asarray(opt.generate_from_embeds(
        cfg, params, embeds[:, :-1], jnp.ones((B, T - 1), jnp.int32),
        jnp.asarray(ids[:, -1], jnp.int32), gen, num_beams > 1,
        pos0=T - 1, len_offset=T - 1,
        prompt_tokens=jnp.asarray(ids, jnp.int32)))
    np.testing.assert_array_equal(
        _canon(ours, cfg.eos_token_id, cfg.pad_token_id),
        _canon(out, cfg.eos_token_id, cfg.pad_token_id))
