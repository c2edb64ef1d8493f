"""Full-scale checkpoint drill: XL BLIP-2 params -> reference-named .pth ->
re-import -> bit-equal assertion (VERDICT round-1 item 5).

Exercises the exact artifact contract a reference user depends on, at REAL
FlanT5-XL/EVA-ViT-g shapes (~4B params, bf16): ``export_blip2`` must emit
reference-exact key names (fused qkv with separate q_bias/v_bias,
eva_vit.py:79-85; Q-Former stripped-FFN keys; block-0 rel-bias hoist,
modeling_t5.py relative_attention_bias on block 0 only) and the torch .pth
round trip must reproduce every tensor bit-for-bit.

Params init on the default backend (the real TPU under axon); the re-import
lands on host CPU so the 16 GB chip never holds two full copies.

Usage: python tools/ckpt_drill.py [--cpu] [--keep <path.pth>]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Load-bearing reference key quirks that MUST be present in the export
# (spot checks; the full naming contract is locked by tests/test_checkpoint.py)
QUIRK_KEYS = [
    "query_tokens",                                     # blip2_t5.py:86
    "visual_encoder.blocks.0.attn.q_bias",              # eva_vit.py:79-85
    "visual_encoder.blocks.0.attn.v_bias",
    "visual_encoder.blocks.0.attn.qkv.weight",          # fused, no k bias
    "visual_encoder.blocks.38.mlp.fc2.weight",
    "t5_model.encoder.block.0.layer.0.SelfAttention."
    "relative_attention_bias.weight",                   # block-0 hoist
    "t5_model.decoder.block.23.layer.2.DenseReluDense.wo.weight",
    "t5_proj.weight",
    "Qformer.bert.encoder.layer.0.crossattention.self.key.weight",
    "ln_vision.weight",
]
FORBIDDEN_KEYS = [
    "visual_encoder.blocks.0.attn.k_bias",  # EVA-ViT has NO k bias
    "t5_model.encoder.block.1.layer.0.SelfAttention."
    "relative_attention_bias.weight",        # rel bias lives on block 0 only
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--keep", default=None, help="write the .pth here")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from ecoflap_tpu.core.pytree import flatten_named
    from ecoflap_tpu.models import blip2
    from ecoflap_tpu.utils import checkpoint as ck

    t0 = time.time()
    cfg = blip2.blip2_flant5xl()
    backend = jax.default_backend()
    print(f"[drill] init XL params (bf16) on {backend} ...")
    params = jax.jit(
        lambda k: blip2.init_params(cfg, k, dtype=jnp.bfloat16)
    )(jax.random.PRNGKey(0))
    n = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"[drill] {n/1e9:.2f}B params +{time.time()-t0:.0f}s")

    # export (device -> host) with reference key names
    state = ck.export_blip2(params, cfg)
    missing = [k for k in QUIRK_KEYS if k not in state]
    present = [k for k in FORBIDDEN_KEYS if k in state]
    assert not missing, f"reference keys missing from export: {missing}"
    assert not present, f"non-reference keys present: {present}"
    print(f"[drill] export: {len(state)} tensors, quirk keys OK "
          f"+{time.time()-t0:.0f}s")

    # original as host arrays, then release the device copy
    host = {k: np.asarray(v) for k, v in flatten_named(params).items()}
    del params

    pth = args.keep or os.path.join(
        tempfile.mkdtemp(prefix="ecoflap_drill_"), "blip2_xl.pth")
    ck.save_torch_checkpoint(state, pth)
    sz = os.path.getsize(pth) / 2**30
    print(f"[drill] saved {pth} ({sz:.2f} GiB) +{time.time()-t0:.0f}s")

    # re-import on host CPU (the chip must not hold two full copies)
    with jax.default_device(jax.devices("cpu")[0]):
        back = ck.convert_blip2(ck.load_torch_checkpoint(pth), cfg,
                                dtype=jnp.bfloat16)
        fb = flatten_named(back)
        assert host.keys() == fb.keys(), (
            sorted(set(host) ^ set(fb))[:10])
        bad = []
        for k, a in host.items():
            b = np.asarray(fb[k])
            if a.shape != b.shape or a.dtype != b.dtype or \
                    not np.array_equal(a.view(np.uint16) if a.dtype == "bfloat16"
                                       else a,
                                       b.view(np.uint16) if b.dtype == "bfloat16"
                                       else b):
                bad.append(k)
        assert not bad, f"round trip not bit-equal: {bad[:10]}"
    print(f"[drill] re-import bit-equal ({len(fb)} leaves) on backend="
          f"{backend} +{time.time()-t0:.0f}s — GREEN")
    if not args.keep:
        os.remove(pth)


if __name__ == "__main__":
    main()
