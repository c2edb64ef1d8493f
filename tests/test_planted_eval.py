"""Planted-answer END-TO-END eval drill (VERDICT r2 item 3).

Runs the real `cli/evaluate.py` main() — torch-.pth checkpoint load, LAVIS
annotation builders, PIL image processing, jitted beam-5 search, real
subword tokenizer decode, oracle-locked scorers — against a planted BLIP-2
(tools/planted.py) whose output is a fixed token chain, and asserts the
CLOSED-FORM metric values:

* VQA: model answers "no" to everything; 4 questions with GT "no"x10 and 4
  with "yes"x10 -> overall accuracy exactly 50.0.
* Captioning: model emits "the quick brown fox"; 2 images have exactly that
  GT caption, 2 have a word-disjoint one ->
  CIDEr-D = (10+10+0+0)/4 = 5.0 (every n-gram df=2 of 4 images, so idf>0
  and the two perfect matches hit cosine 1 at every n), BLEU-4 = 0.5
  (precisions all 8/16=0.5, cumulative (0.5^4)^(1/4), BP=1) ->
  agg_metrics = 5.5.

Proves the reference flow evaluate_blip.py:484-491 -> vqa.py:126-183 end to
end with a nonzero, a-priori-known number.
"""

import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from ecoflap_tpu.data.calibration import FileTokenizer, tiny_tokenizer_path

VQA_ANSWER = "no"
CAPTION = "the quick brown fox"
OTHER_CAPTION = "zebra stripes pattern here"


@pytest.fixture(scope="module")
def planted_ckpt(tmp_path_factory):
    """Planted checkpoint (.pth) + tiny images, shared by both drills."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tools.planted import make_planted_blip2
    from ecoflap_tpu.models import blip2
    from ecoflap_tpu.utils import checkpoint as ckpt

    tok = FileTokenizer(tiny_tokenizer_path())
    root = tmp_path_factory.mktemp("planted")
    cfg = blip2.tiny_config(vocab_size=tok.vocab_size)

    paths = {}
    for name, text in (("vqa", VQA_ANSWER), ("cap", CAPTION)):
        ids = tok._tok.encode(text).ids
        params = make_planted_blip2(cfg, ids)
        state = ckpt.export_blip2(params, cfg)
        p = str(root / f"planted_{name}.pth")
        ckpt.save_torch_checkpoint(state, p)
        paths[name] = p

    # tiny images on disk for the builders
    from PIL import Image

    vis_root = root / "images"
    vis_root.mkdir()
    rng = np.random.default_rng(0)
    for i in range(8):
        arr = rng.integers(0, 255, size=(16, 16, 3), dtype=np.uint8)
        Image.fromarray(arr).save(vis_root / f"img{i}.png")
    return {"root": root, "vis_root": str(vis_root), "ckpts": paths,
            "vocab": tok.vocab_size}


def run_cli(args):
    from ecoflap_tpu.cli.evaluate import main

    return main(args)


def test_planted_vqa_scores_exactly_50(planted_ckpt):
    root = planted_ckpt["root"]
    ann = [
        {"image": f"img{i}.png", "question": "is it day?",
         "answers": [VQA_ANSWER] * 10, "question_id": i}
        for i in range(4)
    ] + [
        {"image": f"img{i}.png", "question": "is it night?",
         "answers": ["yes"] * 10, "question_id": i}
        for i in range(4, 8)
    ]
    ann_path = str(root / "vqa_ann.json")
    with open(ann_path, "w") as f:
        json.dump(ann, f)

    metrics = run_cli([
        "--model", "blip2_t5", "--task", "vqa", "--platform", "cpu",
        "--checkpoint", planted_ckpt["ckpts"]["vqa"],
        "--tokenizer_path", tiny_tokenizer_path(),
        "--vocab_size", str(planted_ckpt["vocab"]),
        "--ann", ann_path, "--vis_root", planted_ckpt["vis_root"],
        "--batch_size", "4", "--num_beams", "5",
        "--output_dir", str(root / "out"),
    ])
    assert metrics["agg_metrics"] == pytest.approx(50.0, abs=1e-9)


def test_planted_vqa_sharded_dp_mesh(planted_ckpt):
    """--mesh dp on the 8-virtual-device CPU mesh: the batch is sharded
    over dp, the jitted beam-5 generate partitions along it, and the metric
    is the same closed-form 50.0 as the unsharded run."""
    root = planted_ckpt["root"]
    ann = [
        {"image": f"img{i}.png", "question": "is it day?",
         "answers": [VQA_ANSWER] * 10, "question_id": i}
        for i in range(4)
    ] + [
        {"image": f"img{i}.png", "question": "is it night?",
         "answers": ["yes"] * 10, "question_id": i}
        for i in range(4, 8)
    ]
    ann_path = str(root / "vqa_ann_dp.json")
    with open(ann_path, "w") as f:
        json.dump(ann, f)

    metrics = run_cli([
        "--model", "blip2_t5", "--task", "vqa", "--platform", "cpu",
        "--checkpoint", planted_ckpt["ckpts"]["vqa"],
        "--tokenizer_path", tiny_tokenizer_path(),
        "--vocab_size", str(planted_ckpt["vocab"]),
        "--ann", ann_path, "--vis_root", planted_ckpt["vis_root"],
        "--batch_size", "8", "--num_beams", "5", "--mesh", "dp",
        "--output_dir", str(root / "out_dp"),
    ])
    assert metrics["agg_metrics"] == pytest.approx(50.0, abs=1e-9)

    # dp=4,tp=2: params Megatron-sharded instead of replicated; the planted
    # model's ~113-logit margins make the tp reduction order irrelevant, so
    # the metric stays exactly closed-form
    metrics_tp = run_cli([
        "--model", "blip2_t5", "--task", "vqa", "--platform", "cpu",
        "--checkpoint", planted_ckpt["ckpts"]["vqa"],
        "--tokenizer_path", tiny_tokenizer_path(),
        "--vocab_size", str(planted_ckpt["vocab"]),
        "--ann", ann_path, "--vis_root", planted_ckpt["vis_root"],
        "--batch_size", "8", "--num_beams", "5", "--mesh", "dp=4,tp=2",
        "--output_dir", str(root / "out_tp"),
    ])
    assert metrics_tp["agg_metrics"] == pytest.approx(50.0, abs=1e-9)


def test_planted_captioning_scores_exactly_5p5(planted_ckpt):
    root = planted_ckpt["root"]
    ann = [
        {"image": f"img{i}.png", "caption": [CAPTION], "image_id": i}
        for i in range(2)
    ] + [
        {"image": f"img{i}.png", "caption": [OTHER_CAPTION], "image_id": i}
        for i in range(2, 4)
    ]
    ann_path = str(root / "cap_ann.json")
    with open(ann_path, "w") as f:
        json.dump(ann, f)

    metrics = run_cli([
        "--model", "blip2_t5", "--task", "captioning", "--platform", "cpu",
        "--checkpoint", planted_ckpt["ckpts"]["cap"],
        "--tokenizer_path", tiny_tokenizer_path(),
        "--vocab_size", str(planted_ckpt["vocab"]),
        "--ann", ann_path, "--vis_root", planted_ckpt["vis_root"],
        "--batch_size", "2", "--num_beams", "5",
        "--max_new_tokens", "16", "--length_penalty", "1.0",
        "--output_dir", str(root / "out"),
    ])
    assert metrics["CIDEr"] == pytest.approx(5.0, abs=1e-7)
    assert metrics["Bleu_4"] == pytest.approx(0.5, abs=1e-7)
    assert metrics["agg_metrics"] == pytest.approx(5.5, abs=1e-7)


def test_tokenizer_roundtrip_and_loud_fallback(caplog):
    """FileTokenizer: real subword encode/decode roundtrip; the no-path
    fallback must WARN (VERDICT r2 item 4: no silent hash tokens)."""
    import logging

    from ecoflap_tpu.data.calibration import HashTokenizer, load_t5_tokenizer

    tok = load_t5_tokenizer(path=tiny_tokenizer_path())
    assert isinstance(tok, FileTokenizer)
    ids, mask = tok(["the quick brown fox", "no"], max_length=16)
    assert ids.shape == (2, 16)
    assert tok.decode(list(ids[0])) == "the quick brown fox"
    assert tok.decode(list(ids[1])) == "no"
    assert tok.eos_token_id == 1 and tok.pad_token_id == 0

    with caplog.at_level(logging.WARNING):
        fb = load_t5_tokenizer(name="definitely/not-cached-anywhere")
    assert isinstance(fb, HashTokenizer)
    assert any("FALLING BACK" in r.message for r in caplog.records)


def test_file_tokenizer_non_t5_special_ids(tmp_path, caplog):
    """ADVICE r3: pad/eos ids must come from the tokenizer.json's own
    padding/post-processor config (BERT-style [PAD]/[SEP] vocabs), not
    T5-convention guesses; explicit overrides win; pure guesses WARN."""
    import logging

    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace
    from tokenizers.processors import TemplateProcessing

    vocab = {"[CLS]": 0, "hello": 1, "world": 2, "[PAD]": 3, "[SEP]": 4}
    tok = Tokenizer(WordLevel(vocab, unk_token="[PAD]"))
    tok.pre_tokenizer = Whitespace()
    tok.post_processor = TemplateProcessing(
        single="$A [SEP]", special_tokens=[("[SEP]", 4)])
    tok.enable_padding(pad_id=3, pad_token="[PAD]")
    path = str(tmp_path / "bert_style.json")
    tok.save(path)

    ft = FileTokenizer(path)
    assert (ft.pad_token_id, ft.eos_token_id) == (3, 4)
    ids, mask = ft(["hello world"], max_length=6)
    assert list(ids[0]) == [1, 2, 4, 3, 3, 3]
    assert list(mask[0]) == [1, 1, 1, 0, 0, 0]

    assert FileTokenizer(path, pad_id=9, eos_id=7).pad_token_id == 9
    assert FileTokenizer(path, eos_id=7).eos_token_id == 7

    # no padding section, no post-processor, no conventional strings:
    # both ids are guessed and the guess must be loud
    bare = Tokenizer(WordLevel({"a": 0, "b": 1}, unk_token="a"))
    bare_path = str(tmp_path / "bare.json")
    bare.save(bare_path)
    with caplog.at_level(logging.WARNING):
        bt = FileTokenizer(bare_path)
    assert (bt.pad_token_id, bt.eos_token_id) == (0, 1)
    assert sum("GUESSING" in r.message for r in caplog.records) == 2
