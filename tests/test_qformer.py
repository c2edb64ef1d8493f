"""Q-Former: scanned pair path == unrolled loop."""

import jax
import jax.numpy as jnp
import numpy as np

from ecoflap_tpu.models import qformer


def test_scan_pairs_match_loop():
    cfg = qformer.tiny_config(num_layers=4)
    params = qformer.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(2, 5, cfg.encoder_width)), jnp.float32)

    out_scan = qformer.forward(cfg, params, img)  # 4 layers -> scan path

    # force the loop path by using the same layers under a 2-layer-at-a-time
    # manual unroll
    x = jnp.broadcast_to(params["query_tokens"],
                         (2, cfg.num_query_tokens, cfg.hidden_size))
    from ecoflap_tpu.models.layers import layer_norm

    x = layer_norm(params["embeddings_ln"], x, cfg.ln_eps)
    for layer in params["layers"]:
        x = qformer._layer_forward(cfg, layer, x, img, None)

    np.testing.assert_allclose(np.asarray(out_scan), np.asarray(x),
                               rtol=2e-5, atol=2e-5)
