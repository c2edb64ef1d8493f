"""Planted-answer BLIP-2: weights constructed so `generate` emits one fixed,
closed-form-predictable token chain regardless of input.

This is the end-to-end eval drill VERDICT round 2 asked for: a model whose
correct VQA accuracy / CIDEr is known a priori, driven through the REAL
`cli/evaluate.py` path (checkpoint .pth load -> dataset builders -> image
processor -> jitted beam search -> tokenizer decode -> oracle-locked scorers
-> metric aggregation). Any bug anywhere in that chain moves the metric off
its closed-form value.

Construction (proof sketch):
* every parameter is zero except: T5 ``shared`` embedding rows for the chain
  tokens (distinct one-hot basis vectors), ``lm_head`` transition entries
  ``K[basis_i, chain[i+1]] = 20``, and the decoder ``final_ln`` scale (ones).
* decoder blocks are zero, so the residual stream carries exactly the
  embedding of the previous token: ``rms_norm`` maps basis ``e_i`` to
  ``sqrt(d) * e_i``, so logits are ``20*sqrt(d)`` at the planted next token
  and 0 elsewhere — a ~113-logit margin, leaving beam search no
  alternatives within 1e-40 of the chain's probability.
* chain tokens must be DISTINCT (the transition is a function of the token
  id); callers pick answers whose subword ids don't repeat.

Chain = [decoder_start(0)] + answer_ids + [eos(1)].
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from ecoflap_tpu.models import blip2


def make_planted_blip2(cfg: blip2.Blip2Config, answer_ids: Sequence[int]):
    """Params for a tiny BLIP-2 whose generate() always emits
    ``answer_ids + [eos]``. Requires len(chain) <= t5.d_model and distinct
    chain token ids."""
    t5c = cfg.t5
    chain = [t5c.decoder_start_token_id] + [int(t) for t in answer_ids]
    nxt = [int(t) for t in answer_ids] + [t5c.eos_token_id]
    if len(set(chain)) != len(chain):
        raise ValueError(f"chain tokens must be distinct, got {chain}")
    if len(chain) > t5c.d_model:
        raise ValueError(f"chain len {len(chain)} > d_model {t5c.d_model}")

    params = blip2.init_params(cfg, jax.random.PRNGKey(0))
    params = jax.tree_util.tree_map(jnp.zeros_like, params)

    shared = params["t5_model"]["shared"]
    head = params["t5_model"]["lm_head"]["kernel"]
    for i, (tok, to) in enumerate(zip(chain, nxt)):
        shared = shared.at[tok, i].set(1.0)
        head = head.at[i, to].set(20.0)
    params["t5_model"]["shared"] = shared
    params["t5_model"]["lm_head"]["kernel"] = head
    params["t5_model"]["decoder"]["final_ln"]["scale"] = jnp.ones(
        (t5c.d_model,), shared.dtype
    )
    return params
