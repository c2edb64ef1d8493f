"""Captioning metrics — the full COCOEvalCap schema, pure Python.

The reference scores captions with pycocoevalcap against Karpathy ground
truth and returns every ``coco_val.eval`` field plus ``agg_metrics = CIDEr
+ Bleu_4`` (LAVIS/lavis/tasks/captioning.py:83-142): Bleu_1..Bleu_4,
METEOR, ROUGE_L, CIDEr, SPICE. Reimplemented here without the
pycocoevalcap dependency:

* CIDEr-D: n-gram (1..4) TF-IDF vectors, per-n cosine similarity clipped by
  candidate counts, Gaussian length penalty exp(-(lc-lr)^2/(2·6^2)), ×10
  scale, averaged over references and n.
* BLEU 1-4: corpus-level modified n-gram precision with brevity penalty
  (closest-reference length, pycocoevalcap fudge constants).
* ROUGE-L: LCS F-beta (beta=1.2), max precision/recall over refs.

Tokenization: lowercase + punctuation strip (the PTBTokenizer effect on
typical captions).

METEOR and SPICE are deliberately NOT reimplemented (documented exclusion):
both are Java jars in pycocoevalcap (meteor-1.5 with its paraphrase tables;
SPICE with the Stanford scene-graph parser) with no faithful pure-Python
equivalent — an approximation would produce numbers that LOOK comparable to
published values but aren't. The reference's own model selection never uses
them: ``agg_metrics = CIDEr + Bleu_4`` only. Schema parity is kept
field-for-field: both keys are always present, valued from pycocoevalcap
when it exists at runtime, else null with a reason in ``metric_notes``.
"""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict
from typing import Dict, Iterable, List, Sequence

from ecoflap_tpu.core.registry import registry

_PUNCT = re.compile(r"[^\w\s]")


def tokenize(text: str) -> List[str]:
    return _PUNCT.sub("", text.lower()).split()


def _ngrams(tokens: Sequence[str], n: int) -> Counter:
    return Counter(tuple(tokens[i : i + n]) for i in range(len(tokens) - n + 1))


def cider_d(
    candidates: Sequence[str],
    references: Sequence[Sequence[str]],
    max_n: int = 4,
    sigma: float = 6.0,
) -> float:
    """Corpus CIDEr-D (0-10 scale), algorithm-exact to pycocoevalcap's
    ``cider_scorer.py`` (the scorer `captioning.py:104` imports):

    * TF is the RAW n-gram count (pycocoevalcap ``counts2vec``:
      ``vec[n][ngram] = term_freq * (log_num_imgs - log(max(df, 1)))``) —
      NOT length-normalized; the raw scale matters inside the clipped
      ``min(hyp, ref)`` numerator and does not cancel in the cosine.
    * similarity per ref: sum(min(h, r) * r) / (|h||r|), Gaussian length
      penalty exp(-(len_h - len_r)^2 / (2 sigma^2)), averaged over refs,
      then over n, x10.
    Oracle-locked in tests/test_metric_oracles.py (independent
    implementation + closed-form values).
    """
    assert len(candidates) == len(references)
    cand_toks = [tokenize(c) for c in candidates]
    ref_toks = [[tokenize(r) for r in refs] for refs in references]

    # document frequency over reference sets
    df: List[Dict] = [defaultdict(float) for _ in range(max_n)]
    for refs in ref_toks:
        for n in range(max_n):
            seen = set()
            for r in refs:
                seen |= set(_ngrams(r, n + 1).keys())
            for g in seen:
                df[n][g] += 1.0
    log_num_imgs = math.log(max(len(references), 1))

    def tfidf(counts: Counter, n: int):
        vec = {}
        norm = 0.0
        for g, c in counts.items():
            idf = log_num_imgs - math.log(max(df[n][g], 1.0))
            v = float(c) * idf
            vec[g] = v
            norm += v * v
        return vec, math.sqrt(norm)

    scores = []
    for cand, refs in zip(cand_toks, ref_toks):
        score_n = [0.0] * max_n
        for n in range(max_n):
            c_counts = _ngrams(cand, n + 1)
            c_vec, c_norm = tfidf(c_counts, n)
            for ref in refs:
                r_counts = _ngrams(ref, n + 1)
                r_vec, r_norm = tfidf(r_counts, n)
                # CIDEr-D: clip hypothesis weight by the reference's
                num = 0.0
                for g, v in c_vec.items():
                    num += min(v, r_vec.get(g, 0.0)) * r_vec.get(g, 0.0)
                denom = c_norm * r_norm
                sim = num / denom if denom > 0 else 0.0
                delta = len(cand) - len(ref)
                sim *= math.exp(-(delta**2) / (2 * sigma**2))
                score_n[n] += sim
            score_n[n] /= max(len(refs), 1)
        scores.append(10.0 * sum(score_n) / max_n)
    return sum(scores) / max(len(scores), 1)


def bleu4(
    candidates: Sequence[str], references: Sequence[Sequence[str]]
) -> float:
    """Corpus BLEU-4, algorithm-exact to pycocoevalcap's ``bleu_scorer.py``
    (option='closest'): cumulative-product precisions with the tiny/small
    fudge terms, closest-reference length (ties broken toward the SHORTER
    reference — the tuple-min ``min((abs(l-testlen), l))`` form), and
    ratio-form brevity penalty."""
    return bleu_all(candidates, references)[3]


def bleu_all(
    candidates: Sequence[str], references: Sequence[Sequence[str]]
) -> List[float]:
    """[Bleu_1, Bleu_2, Bleu_3, Bleu_4] — COCOEvalCap reports all four."""
    tiny, small = 1e-15, 1e-9  # pycocoevalcap's exact fudge constants
    p_num = [0] * 4
    p_den = [0] * 4
    cand_len = ref_len = 0
    for cand, refs in zip(candidates, references):
        c = tokenize(cand)
        rs = [tokenize(r) for r in refs]
        cand_len += len(c)
        # 'closest' reflen, pycocoevalcap bleu_scorer.py: tuple-min over
        # (|l - testlen|, l) — equal distances break toward the SHORTER ref
        if rs:
            ref_len += min((abs(len(r) - len(c)), len(r)) for r in rs)[1]
        for n in range(4):
            c_ngrams = _ngrams(c, n + 1)
            max_ref = Counter()
            for r in rs:
                for g, cnt in _ngrams(r, n + 1).items():
                    max_ref[g] = max(max_ref[g], cnt)
            p_num[n] += sum(min(cnt, max_ref.get(g, 0)) for g, cnt in c_ngrams.items())
            p_den[n] += max(sum(c_ngrams.values()), 0)
    # cumulative product, k-th root (BleuScorer.compute_score)
    bleu = 1.0
    bleus = []
    for k in range(4):
        bleu *= (float(p_num[k]) + tiny) / (float(p_den[k]) + small)
        bleus.append(bleu ** (1.0 / (k + 1)))
    ratio = (cand_len + tiny) / (ref_len + small)
    if ratio < 1:
        bp = math.exp(1 - 1.0 / ratio)
        bleus = [b * bp for b in bleus]
    return bleus


def _lcs_len(a: Sequence[str], b: Sequence[str]) -> int:
    """Longest common subsequence length (pycocoevalcap rouge.py my_lcs)."""
    if not a or not b:
        return 0
    prev = [0] * (len(b) + 1)
    for x in a:
        cur = [0] * (len(b) + 1)
        for j, y in enumerate(b, 1):
            cur[j] = prev[j - 1] + 1 if x == y else max(prev[j], cur[j - 1])
        prev = cur
    return prev[-1]


def rouge_l(
    candidates: Sequence[str], references: Sequence[Sequence[str]],
    beta: float = 1.2,
) -> float:
    """Corpus ROUGE-L, algorithm-exact to pycocoevalcap's ``rouge.py``
    (part of the COCOEvalCap.eval schema the reference logs): per image,
    LCS precision/recall vs EACH ref, max over refs of each separately,
    F-beta (beta=1.2) combination, mean over images."""
    scores = []
    for cand, refs in zip(candidates, references):
        c = tokenize(cand)
        prec, rec = [], []
        for r in refs:
            rt = tokenize(r)
            lcs = _lcs_len(c, rt)
            prec.append(lcs / len(c) if c else 0.0)
            rec.append(lcs / len(rt) if rt else 0.0)
        pm, rm = (max(prec) if prec else 0.0), (max(rec) if rec else 0.0)
        if pm != 0 and rm != 0:
            scores.append(((1 + beta**2) * pm * rm) / (rm + beta**2 * pm))
        else:
            scores.append(0.0)
    return sum(scores) / max(len(scores), 1)


def score_captions(
    results: Iterable[Dict],
) -> Dict[str, float]:
    """results: [{"caption": str, "gt_captions": [str]}] -> the reference's
    full COCOEvalCap.eval schema (captioning.py:83-142 returns every
    ``coco_val.eval`` field plus ``agg_metrics = CIDEr + Bleu_4``):
    Bleu_1..Bleu_4, METEOR, ROUGE_L, CIDEr, SPICE, agg_metrics. The two
    Java-jar metrics (METEOR's meteor-1.5 paraphrase tables, SPICE's
    Stanford scene-graph parser) are null with a reason in ``metric_notes``
    when their runtimes are absent — never approximated (a lookalike number
    would invite false comparisons with published values); downstream
    result-JSON diffs see the column either way."""
    cands = [r["caption"] for r in results]
    refs = [r["gt_captions"] for r in results]
    b1, b2, b3, b4 = bleu_all(cands, refs)
    cd = cider_d(cands, refs)
    out = {
        "Bleu_1": b1, "Bleu_2": b2, "Bleu_3": b3, "Bleu_4": b4,
        "METEOR": None, "ROUGE_L": rouge_l(cands, refs), "CIDEr": cd,
        "SPICE": spice_or_none(cands, refs), "agg_metrics": cd + b4,
    }
    notes = {}
    if out["METEOR"] is None:
        notes["METEOR"] = ("meteor-1.5 Java jar (+paraphrase tables) not "
                           "available; not approximated")
    if out["SPICE"] is None:
        notes["SPICE"] = ("pycocoevalcap SPICE (JVM + Stanford scene-graph "
                          "parser) not available; not approximated")
    if notes:
        out["metric_notes"] = notes
    return out


def spice_or_none(cands, refs):
    """SPICE via pycocoevalcap when installed (it needs a JVM + the Stanford
    scene-graph jar); None otherwise — see the module docstring's exclusion
    note. Never approximated."""
    try:
        from pycocoevalcap.spice.spice import Spice  # type: ignore
    except Exception:
        return None
    gts = {i: rs for i, rs in enumerate(refs)}
    res = {i: [c] for i, c in enumerate(cands)}
    try:
        score, _ = Spice().compute_score(gts, res)
        return float(score)
    except Exception:
        return None


@registry.register("task", "captioning")
class CaptionTask:
    def __init__(self, generate_fn=None):
        self.generate_fn = generate_fn

    def evaluation(self, batches) -> Dict[str, float]:
        results = []
        for batch in batches:
            captions = self.generate_fn(batch)
            for cap, gts in zip(captions, batch["gt_captions"]):
                results.append({"caption": cap, "gt_captions": gts})
        return score_captions(results)
