"""Task metrics: VQA normalization/accuracy, CIDEr/BLEU, retrieval recall,
MMLU harness, config system."""

import numpy as np

from ecoflap_tpu.core.config import Config, deep_merge, parse_dot_list
from ecoflap_tpu.tasks import captioning, mmlu, retrieval, vqa


# --- VQA -------------------------------------------------------------------

def test_vqa_normalization():
    assert vqa.normalize_answer("A Dog!") == "dog"
    assert vqa.normalize_answer("two") == "2"
    assert vqa.normalize_answer("isnt") == "isn't"
    assert vqa.normalize_answer("the cat, basically") == "cat basically"


def test_vqa_accuracy_formula():
    # 10 gt answers, 5 matching: each leave-one-out subset has 4 or 5 matches
    gts = ["dog"] * 5 + ["cat"] * 5
    acc = vqa.vqa_accuracy("dog", gts)
    # subsets dropping a "dog": 4 matches -> 1.0; dropping a "cat": 5 -> 1.0
    assert acc == 1.0
    gts = ["dog"] * 2 + ["cat"] * 8
    acc = vqa.vqa_accuracy("dog", gts)
    # drop a dog: 1 match -> 1/3 (x2); drop a cat: 2 matches -> 2/3 (x8)
    expected = (2 * (1 / 3) + 8 * (2 / 3)) / 10
    assert abs(acc - expected) < 1e-9


def test_gqa_exact_match():
    res = [{"answer": "The dog", "gt": "the dog"},
           {"answer": "cat", "gt": "dog"}]
    assert abs(vqa.score_gqa(res)["agg_metrics"] - 50.0) < 1e-9


# --- captioning ------------------------------------------------------------

def test_cider_perfect_match_scores_high():
    caps = ["a dog runs in the park", "a cat sits on the mat"]
    refs = [[c] for c in caps]
    score = captioning.cider_d(caps, refs)
    wrong = captioning.cider_d(["blue elephant flies quickly today"] * 2, refs)
    assert score > wrong
    assert score > 1.0


def test_bleu4_ordering():
    refs = [["the quick brown fox jumps over the lazy dog"]]
    good = captioning.bleu4(["the quick brown fox jumps over the lazy dog"], refs)
    bad = captioning.bleu4(["a completely different sentence here now"], refs)
    assert good > 0.99
    assert bad < 0.1


# --- retrieval -------------------------------------------------------------

def test_retrieval_identity_sim():
    sim = np.eye(6) * 10 + np.random.default_rng(0).normal(size=(6, 6)) * 0.01
    scores = retrieval.score_retrieval(sim)
    assert scores["txt_r1"] == 100.0
    assert scores["img_r1"] == 100.0


def test_retrieval_ranks():
    sim = np.zeros((4, 4))
    sim[0, 1] = 5.0; sim[0, 0] = 4.0  # gt text ranked 2nd for image 0
    for i in range(1, 4):
        sim[i, i] = 9.0
    scores = retrieval.score_retrieval(sim)
    assert scores["txt_r1"] == 75.0
    assert scores["txt_r5"] == 100.0


# --- MMLU ------------------------------------------------------------------

def test_mmlu_harness():
    dev = [["What is 1+1?", "1", "2", "3", "4", "B"]] * 5
    test_rows = [
        ["What is 2+2?", "3", "4", "5", "6", "B"],
        ["What is 3+3?", "5", "6", "7", "8", "B"],
    ]
    abcd = [10, 11, 12, 13]

    def fake_logits(prompts):
        # always put mass on token id 11 ("B")
        out = np.zeros((len(prompts), 20))
        out[:, 11] = 5.0
        return out

    task = mmlu.MMLUTask(fake_logits, abcd, k=5, batch_size=2)
    res = task.evaluation(
        {"elementary_mathematics": {"dev": dev, "test": test_rows}}
    )
    assert res["agg_metrics"] == 100.0
    assert res["acc/category/STEM"] == 1.0
    prompt = mmlu.gen_prompt(dev, "elementary_mathematics", 2)
    assert "elementary mathematics" in prompt
    assert prompt.count("Answer: B") == 2


# --- config ----------------------------------------------------------------

def test_config_dot_list_and_merge():
    base = {"run": {"batch_size": 4, "seed": 42}, "model": {"arch": "t5"}}
    cfg = Config(defaults=base, options=["run.batch_size=8", "model.load=true"])
    assert cfg.run_cfg["batch_size"] == 8
    assert cfg.run_cfg["seed"] == 42
    assert cfg.model_cfg["load"] is True
    assert cfg.get("model.arch") == "t5"
    assert cfg.get("nope.missing", "d") == "d"


def test_deep_merge_nested():
    a = {"x": {"y": 1, "z": 2}, "l": [1, 2]}
    b = {"x": {"y": 9}, "l": [3]}
    m = deep_merge(a, b)
    assert m == {"x": {"y": 9, "z": 2}, "l": [3]}


def test_parse_dot_list_types():
    t = parse_dot_list(["a.b=0.5", "a.c=null", "d=hello"])
    assert t == {"a": {"b": 0.5, "c": None}, "d": "hello"}


def test_mmlu_crop_prompt_drops_shots_to_budget():
    """Reference shot-reduction loop (evaluate_flan.py:59-64): few-shot
    examples drop one at a time until the tokenized prompt fits."""
    from ecoflap_tpu.tasks import mmlu

    dev = [[f"dev question {i}", "a", "b", "c", "d", "A"] for i in range(5)]
    end = mmlu.format_example(["test question", "a", "b", "c", "d", "B"],
                              include_answer=False)
    wc = lambda s: len(s.split())  # noqa: E731

    full = mmlu.crop_prompt("college_physics", dev, end, 5, wc,
                            max_tokens=10_000)
    assert full == mmlu.gen_prompt(dev, "college_physics", 5) + end

    # budget that fits exactly k=2 shots
    k2_len = wc(mmlu.gen_prompt(dev, "college_physics", 2) + end)
    k3_len = wc(mmlu.gen_prompt(dev, "college_physics", 3) + end)
    assert k3_len > k2_len
    cropped = mmlu.crop_prompt("college_physics", dev, end, 5, wc,
                               max_tokens=k2_len)
    assert cropped == mmlu.gen_prompt(dev, "college_physics", 2) + end

    # impossible budget floors at k=0 instead of looping forever
    zero = mmlu.crop_prompt("college_physics", dev, end, 5, wc, max_tokens=1)
    assert zero == mmlu.gen_prompt(dev, "college_physics", 0) + end


def test_mmlu_eval_subject_crops_per_row():
    """Rows with long questions get fewer shots; correctness still computed
    against each row's own cropped prompt."""
    from ecoflap_tpu.tasks import mmlu

    dev = [[f"d{i}", "a", "b", "c", "d", "A"] for i in range(5)]
    rows = [["short", "a", "b", "c", "d", "A"],
            ["long " * 200, "a", "b", "c", "d", "B"]]
    seen_prompts = []

    def fn(prompts):
        seen_prompts.extend(prompts)
        out = np.zeros((len(prompts), 10), np.float32)
        out[:, 3] = 1.0  # always predict choice id 3 -> letter A below
        return out

    wc = lambda s: len(s.split())  # noqa: E731
    corr = mmlu.eval_subject("anatomy", dev, rows, fn, [3, 4, 5, 6], k=5,
                             batch_size=2, token_len_fn=wc, max_tokens=60)
    assert list(corr) == [True, False]
    assert wc(seen_prompts[0]) <= 60          # short row: cropped to fit
    assert "d0" not in seen_prompts[1]        # long row: all shots dropped
