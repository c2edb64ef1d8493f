"""Generation: KV-cache consistency vs teacher-forced decode, beam search."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ecoflap_tpu.models import generation as gen_mod
from ecoflap_tpu.models import t5


@pytest.fixture(scope="module")
def setup():
    cfg = t5.tiny_config()
    params = t5.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(2, cfg.vocab_size, size=(3, 8)), jnp.int32)
    mask = jnp.ones((3, 8), jnp.int32)
    enc = t5.encode(cfg, params, ids, mask)
    return cfg, params, enc, mask


def naive_greedy(cfg, params, enc, mask, steps):
    """Reference decode: full teacher-forced forward per step, no cache."""
    b = enc.shape[0]
    toks = jnp.full((b, 1), cfg.decoder_start_token_id, jnp.int32)
    out = []
    done = np.zeros(b, bool)
    for _ in range(steps):
        logits = t5.decode(cfg, params, enc, mask, toks)
        nxt = np.asarray(jnp.argmax(logits[:, -1], axis=-1))
        nxt = np.where(done, cfg.pad_token_id, nxt)
        done |= nxt == cfg.eos_token_id
        out.append(nxt)
        toks = jnp.concatenate([toks, jnp.asarray(nxt[:, None], jnp.int32)], axis=1)
    return np.stack(out, axis=1)


def test_greedy_cache_matches_teacher_forced(setup):
    cfg, params, enc, mask = setup
    g = gen_mod.GenerateConfig(max_new_tokens=6, num_beams=1, min_length=1)
    fast = np.asarray(
        gen_mod.t5_generate(cfg, params, enc, mask, g, use_beam=False)
    )
    slow = naive_greedy(cfg, params, enc, mask, 6)
    np.testing.assert_array_equal(fast, slow)


def test_beam_one_matches_greedy(setup):
    cfg, params, enc, mask = setup
    g1 = gen_mod.GenerateConfig(max_new_tokens=6, num_beams=1)
    greedy = np.asarray(gen_mod.t5_generate(cfg, params, enc, mask, g1, use_beam=False))
    gb = gen_mod.GenerateConfig(max_new_tokens=6, num_beams=1)
    beam = np.asarray(gen_mod.t5_generate(cfg, params, enc, mask, gb, use_beam=True))
    np.testing.assert_array_equal(greedy, beam)


def seq_logprob(cfg, params, enc, mask, seq):
    """Teacher-forced sum of logprobs of `seq` (stopping at first pad after eos)."""
    b = enc.shape[0]
    toks = jnp.concatenate(
        [jnp.full((b, 1), cfg.decoder_start_token_id, jnp.int32), seq[:, :-1]], axis=1
    )
    logits = t5.decode(cfg, params, enc, mask, toks)
    logp = jax.nn.log_softmax(logits, axis=-1)
    picked = np.asarray(jnp.take_along_axis(logp, seq[..., None], axis=-1)[..., 0])
    out = np.zeros(b)
    for i in range(b):
        for t in range(seq.shape[1]):
            out[i] += picked[i, t]
            if int(seq[i, t]) == cfg.eos_token_id:
                break
    return out


def test_beam_finds_no_worse_sequences(setup):
    """With length_penalty=0 (pure sum-logprob) beam-4 must score >= greedy."""
    cfg, params, enc, mask = setup
    g1 = gen_mod.GenerateConfig(max_new_tokens=6, num_beams=1, length_penalty=0.0)
    g4 = gen_mod.GenerateConfig(max_new_tokens=6, num_beams=4, length_penalty=0.0)
    greedy = gen_mod.t5_generate(cfg, params, enc, mask, g1, use_beam=False)
    beam = gen_mod.t5_generate(cfg, params, enc, mask, g4, use_beam=True)
    s_greedy = seq_logprob(cfg, params, enc, mask, greedy)
    s_beam = seq_logprob(cfg, params, enc, mask, beam)
    assert np.all(s_beam >= s_greedy - 1e-4)


def test_min_length_blocks_eos(setup):
    cfg, params, enc, mask = setup
    g = gen_mod.GenerateConfig(max_new_tokens=6, num_beams=2, min_length=4)
    seqs = np.asarray(gen_mod.t5_generate(cfg, params, enc, mask, g, use_beam=True))
    # no EOS before position min_length-1
    assert not np.any(seqs[:, : 3] == cfg.eos_token_id)
