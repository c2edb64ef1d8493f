"""Data layer: splits, tokenizer, calibration batches, processors, batching."""

import json

import numpy as np
import pytest

from ecoflap_tpu.data import calibration as cal
from ecoflap_tpu.data import datasets as ds
from ecoflap_tpu.data import processors as proc


def test_split_prefix_suffix_bounds():
    rng = np.random.default_rng(0)
    text = "abcdefghij"
    for _ in range(20):
        pre, suf = cal.split_prefix_suffix(text, rng)
        assert pre + suf == text
        assert 1 <= len(pre) <= len(text) // 2


def test_hash_tokenizer_roundtrip():
    tok = cal.HashTokenizer(vocab_size=100)
    ids, mask = tok(["hello world", "a"], max_length=5)
    assert ids.shape == (2, 5)
    assert mask[0].tolist() == [1, 1, 1, 0, 0]  # 2 words + eos
    assert ids[0, 2] == tok.eos_token_id
    # deterministic
    ids2, _ = tok(["hello world"], max_length=5)
    np.testing.assert_array_equal(ids[0], ids2[0])


def test_vl_calibration_batch_shapes():
    spec = cal.CalibrationSpec(num_samples=8, batch_size=4,
                               text_input_len=6, text_output_len=6)
    samples = cal.synthetic_vl_samples(10, img_size=16, words=2)
    tok = cal.HashTokenizer(vocab_size=64)
    batch = cal.build_vl_calibration_batch(samples, tok, spec)
    assert batch["image"].shape == (8, 16, 16, 3)
    assert batch["text_input_ids"].shape == (8, 6)
    assert batch["labels"].shape == (8, 6)
    assert spec.num_microbatches == 2
    # pad labels are -100
    assert (np.asarray(batch["labels"]) == -100).any()


def test_lm_calibration_windows():
    stream = np.arange(100, dtype=np.int32)
    b = cal.build_lm_calibration_batch(stream, num_samples=4, seqlen=16)
    assert b["input_ids"].shape == (4, 16)
    arr = np.asarray(b["input_ids"])
    # windows are contiguous slices
    assert np.all(np.diff(arr, axis=1) == 1)


def test_image_processors():
    img = (np.random.default_rng(0).random((50, 70, 3)) * 255).astype(np.uint8)
    evalp = proc.ImageEvalProcessor(image_size=32)
    out = evalp(img)
    assert out.shape == (32, 32, 3)
    assert out.dtype == np.float32
    trainp = proc.ImageTrainProcessor(image_size=32, seed=0)
    out2 = trainp(img)
    assert out2.shape == (32, 32, 3)


def test_text_processors():
    cp = proc.CaptionProcessor(prompt="a photo of ")
    assert cp("A Dog! Running.") == "a photo of a dog running"
    qp = proc.QuestionProcessor()
    assert qp("What IS this?") == "what is this?"


def test_vqa_dataset_and_batching(tmp_path):
    ann = [{"image": "img0.npy", "question": f"q{i}", "answer": ["a"] * 10,
            "question_id": i} for i in range(5)]
    ann_path = tmp_path / "ann.json"
    ann_path.write_text(json.dumps(ann))

    class NoImageVQA(ds.VQADataset):
        def _load_image(self, rel):
            return np.zeros((4, 4, 3), np.float32)

    d = NoImageVQA({"vis_root": str(tmp_path), "ann_paths": [str(ann_path)]})
    assert len(d) == 5
    batches = list(ds.batch_iterator(d, batch_size=2))
    assert len(batches) == 3
    assert batches[0]["image"].shape == (2, 4, 4, 3)
    assert batches[0]["text_input"] == ["q0", "q1"]
    assert batches[-1]["image"].shape == (1, 4, 4, 3)


def test_missing_annotation_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        ds.VQADataset({"vis_root": "", "ann_paths": [str(tmp_path / "no.json")]})


def test_registry_names():
    from ecoflap_tpu.core.registry import registry

    for name in ("coco_vqa", "gqa", "coco_caption", "imagenet", "c4",
                 "prefix_conceptual_caption_3m", "flickr30k", "wikitext2"):
        assert registry.get("builder", name) is not None
    for name in ("blip_image_eval", "blip2_image_train", "clip_image_eval",
                 "blip_caption", "blip_question"):
        assert registry.get("processor", name) is not None


def test_prompt_builder():
    from ecoflap_tpu.data.prompts import SIMPLE_TEMPLATE, build_prompts

    prompts = build_prompts(["dog", "tabby_cat"], SIMPLE_TEMPLATE)
    assert prompts == ["a photo of a dog.", "a photo of a tabby cat."]
    from ecoflap_tpu.data.prompts import IMAGENET_TEMPLATES_SUBSET

    p7 = build_prompts(["dog"], IMAGENET_TEMPLATES_SUBSET)
    assert len(p7) == 7 and all("dog" in p for p in p7)
