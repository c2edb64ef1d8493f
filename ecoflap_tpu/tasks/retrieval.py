"""Image/text retrieval — recall@{1,5,10} from a similarity matrix.

Reference: ``RetrievalTask`` computes TR@k / IR@k from
``model.compute_sim_matrix`` (LAVIS/lavis/tasks/retrieval.py:32-113). The
Q-Former ITM re-ranking of top-k candidates (blip2.py:116-229) plugs in as an
optional ``rerank_fn`` over the top-k candidate indices.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import numpy as np

from ecoflap_tpu.core.registry import registry


def recall_at_k(ranks: np.ndarray, ks=(1, 5, 10)) -> Dict[int, float]:
    return {k: 100.0 * float((ranks < k).mean()) for k in ks}


def score_retrieval(
    sim_i2t: np.ndarray,
    txt2img: Optional[np.ndarray] = None,
    img2txt=None,
) -> Dict[str, float]:
    """sim_i2t: (N_img, N_txt). txt2img[j] = gt image of text j; img2txt[i] =
    list of gt texts of image i (defaults: identity pairing)."""
    return score_retrieval_pair(sim_i2t, sim_i2t.T, txt2img, img2txt)


def score_retrieval_pair(
    sim_i2t: np.ndarray,
    sim_t2i: np.ndarray,
    txt2img: Optional[np.ndarray] = None,
    img2txt=None,
) -> Dict[str, float]:
    """Asymmetric variant — the Q-Former's ``compute_sim_matrix`` produces
    SEPARATE ITM-refined i2t and t2i matrices (blip2.py:116-229), ranked
    independently like the reference's ``_report_metrics``."""
    n_img, n_txt = sim_i2t.shape
    if txt2img is None:
        txt2img = np.arange(n_txt)
    if img2txt is None:
        img2txt = [[i] for i in range(n_img)]

    # text retrieval (image query)
    tr_ranks = np.zeros(n_img)
    for i in range(n_img):
        order = np.argsort(-sim_i2t[i])
        best = min(int(np.where(order == t)[0][0]) for t in img2txt[i])
        tr_ranks[i] = best
    # image retrieval (text query)
    ir_ranks = np.zeros(n_txt)
    for j in range(n_txt):
        order = np.argsort(-sim_t2i[j])
        ir_ranks[j] = int(np.where(order == txt2img[j])[0][0])

    tr = recall_at_k(tr_ranks)
    ir = recall_at_k(ir_ranks)
    out = {
        "txt_r1": tr[1], "txt_r5": tr[5], "txt_r10": tr[10],
        "img_r1": ir[1], "img_r5": ir[5], "img_r10": ir[10],
    }
    out["r_mean"] = sum(out.values()) / 6
    out["agg_metrics"] = (out["txt_r1"] + out["txt_r5"] + out["txt_r10"]) / 3
    return out


@registry.register("task", "retrieval")
class RetrievalTask:
    def __init__(self, sim_fn: Optional[Callable] = None,
                 rerank_fn: Optional[Callable] = None, k_test: int = 128):
        self.sim_fn = sim_fn  # dataset -> (N_img, N_txt) similarity
        self.rerank_fn = rerank_fn
        self.k_test = k_test

    def evaluation(self, dataset) -> Dict[str, float]:
        sim = np.asarray(self.sim_fn(dataset))
        if self.rerank_fn is not None:
            k = min(self.k_test, sim.shape[1])
            topk = np.argsort(-sim, axis=1)[:, :k]
            sim = self.rerank_fn(dataset, sim, topk)
        return score_retrieval(
            sim,
            txt2img=dataset.get("txt2img"),
            img2txt=dataset.get("img2txt"),
        )
