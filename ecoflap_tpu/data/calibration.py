"""Calibration data plumbing: prefix/suffix splits, tokenization, fixed-shape
batch assembly.

Reference semantics:
* CC3M-style caption split — random CHARACTER split point in
  ``[1, len(caption)//2]``; prefix becomes text_input, remainder text_output
  (prefix_language_pretraining.py:47-55).
* C4 text split — identical on raw text (c4_dataset.py:24-64).
* Count-limited calibration loader — the runner wraps the test split in a
  ``DataLoaderWrapper`` that yields exactly ``num_data`` samples
  (runner_base.py:645-693). Here calibration is one STACKED pytree batch of
  ``num_data`` samples (leading dim = microbatches x batch_size), which is
  what the MeZO/engine paths consume directly.

Tokenization: HF tokenizers when a local cache exists (zero-egress image —
``from_pretrained`` works only if cached); otherwise ``HashTokenizer``, a
deterministic hashing tokenizer with the same interface, good enough for
synthetic calibration and tests.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from typing import Any, Dict, Iterable, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np


def split_prefix_suffix(text: str, rng: np.random.Generator):
    """Random character split (prefix_language_pretraining.py:47-55)."""
    hi = max(len(text) // 2, 1)
    split = int(rng.integers(1, hi + 1))
    return text[:split], text[split:]


class _TokenizerBase:
    """Shared truncate/eos/pad/mask/batch semantics; subclasses provide the
    raw-id primitive ``_raw_ids(text)`` plus pad/eos ids."""

    pad_token_id: int
    eos_token_id: int

    def _raw_ids(self, text: str):
        raise NotImplementedError

    def encode(self, text: str, max_length: int, add_eos: bool = True,
               pad: bool = True):
        ids = self._raw_ids(text)[: max_length - int(add_eos)]
        if add_eos:
            ids.append(self.eos_token_id)
        mask = [1] * len(ids)
        if not pad:  # stream builders: truncate-only, no O(max_length) fill
            return ids, mask
        n = max_length - len(ids)
        return ids + [self.pad_token_id] * n, mask + [0] * n

    def __call__(self, texts: Sequence[str], max_length: int = 32,
                 add_eos: bool = True, pad: bool = True):
        out_ids, out_mask = [], []
        for t in texts:
            ids, mask = self.encode(t, max_length, add_eos, pad=pad)
            out_ids.append(ids)
            out_mask.append(mask)
        if not pad:
            return out_ids, out_mask
        return (np.asarray(out_ids, np.int32), np.asarray(out_mask, np.int32))


class HashTokenizer(_TokenizerBase):
    """Deterministic whitespace+hash tokenizer with an HF-like interface.

    ids: 0=pad, 1=eos, 2..vocab-1 hashed word ids. Not a real BPE — a
    stand-in so every pipeline runs without downloaded vocab files.
    """

    def __init__(self, vocab_size: int = 32128, eos_token_id: int = 1,
                 pad_token_id: int = 0):
        self.vocab_size = vocab_size
        self.eos_token_id = eos_token_id
        self.pad_token_id = pad_token_id

    def _word_id(self, w: str) -> int:
        h = int(hashlib.md5(w.encode()).hexdigest()[:8], 16)
        return 2 + h % (self.vocab_size - 2)

    def _raw_ids(self, text: str):
        return [self._word_id(w) for w in text.split()]

    def decode(self, ids: Sequence[int]) -> str:
        return " ".join(f"<{i}>" for i in ids
                        if i not in (self.pad_token_id, self.eos_token_id))


class FileTokenizer(_TokenizerBase):
    """Real subword tokenizer loaded from a local HF ``tokenizer.json``
    (sentencepiece-style Unigram/BPE serialized by the ``tokenizers``
    library — the same serialization HF hub checkpoints carry).

    The reference tokenizes with the real FlanT5 sentencepiece vocab
    (blip2_t5.py:96 ``t5_tokenizer``); this is the zero-egress equivalent:
    point ``--tokenizer_path`` at any local tokenizer.json.

    pad/eos resolution order (non-T5 vocabs like BERT's [PAD]/[SEP] resolve
    correctly instead of silently inheriting T5's 0/1): explicit
    ``pad_id``/``eos_id`` kwargs > the file's own ``padding``/
    ``post_processor`` config > conventional token strings > a LOUDLY
    warned T5-convention fallback (pad=0, eos=1).
    """

    _PAD_STRINGS = ("<pad>", "[PAD]", "<|pad|>")
    _EOS_STRINGS = ("</s>", "[SEP]", "<|endoftext|>", "<eos>", "<|eot_id|>")

    def __init__(self, path: str, pad_id: Optional[int] = None,
                 eos_id: Optional[int] = None):
        from tokenizers import Tokenizer  # baked into the image

        self._tok = Tokenizer.from_file(path)
        self.path = path
        self.vocab_size = self._tok.get_vocab_size()
        cfg_pad, cfg_eos = self._ids_from_file_config(path)
        self.pad_token_id = self._resolve(
            pad_id, cfg_pad, self._PAD_STRINGS, default=0, kind="pad")
        self.eos_token_id = self._resolve(
            eos_id, cfg_eos, self._EOS_STRINGS, default=1, kind="eos")

    def _ids_from_file_config(self, path: str):
        """(pad_id, eos_id) declared by the tokenizer.json itself: the
        ``padding`` section names the pad token, and a TemplateProcessing
        post-processor's single-sequence template ends with the token the
        tokenizer appends (the eos)."""
        import json as _json

        pad = eos = None
        try:
            with open(path) as f:
                spec = _json.load(f)
        except Exception:
            return None, None
        padding = spec.get("padding") or {}
        if isinstance(padding.get("pad_id"), int):
            pad = padding["pad_id"]
        elif isinstance(padding.get("pad_token"), str):
            pad = self._tok.token_to_id(padding["pad_token"])
        post = spec.get("post_processor") or {}
        if post.get("type") == "TemplateProcessing":
            single = post.get("single") or []
            last = single[-1] if single else {}
            tok_name = (last.get("SpecialToken") or {}).get("id")
            if tok_name is not None:
                toks = post.get("special_tokens") or {}
                ids = (toks.get(tok_name) or {}).get("ids") or []
                eos = ids[0] if ids else self._tok.token_to_id(tok_name)
        return pad, eos

    def _resolve(self, explicit, from_config, strings, default, kind):
        if explicit is not None:
            return explicit
        if from_config is not None:
            return from_config
        for s in strings:
            tid = self._tok.token_to_id(s)
            if tid is not None:
                return tid
        import logging

        logging.getLogger(__name__).warning(
            "FileTokenizer(%s): could not determine the %s id from the "
            "file's padding/post-processor config or conventional token "
            "strings %s — GUESSING %s=%d (T5 convention). Pass "
            "pad_id/eos_id explicitly if this vocab uses different ids; "
            "wrong ids corrupt attention masks and EOS stopping.",
            self.path, kind, strings, kind, default)
        return default

    def _raw_ids(self, text: str):
        # add_special_tokens=False: the file's post-processor may append its
        # own eos; _TokenizerBase.encode appends ours exactly once.
        return self._tok.encode(text, add_special_tokens=False).ids

    def decode(self, ids: Sequence[int]) -> str:
        keep = [int(i) for i in ids
                if i not in (self.pad_token_id, self.eos_token_id)]
        return self._tok.decode(keep)


def tiny_tokenizer_path() -> str:
    """Checked-in tiny real Unigram tokenizer (188-token vocab, full ASCII
    coverage) used by tests and the planted-answer eval drill."""
    import os

    return os.path.join(os.path.dirname(__file__), "assets",
                        "tiny_unigram.json")


def load_t5_tokenizer(name: str = "google/flan-t5-xl",
                      vocab_size: int = 32128, path: Optional[str] = None):
    """Real tokenizer from ``path`` (tokenizer.json), else the HF cache,
    else a LOUDLY-warned HashTokenizer fallback (hash ids are fine for
    synthetic calibration but make any accuracy number meaningless)."""
    if path:
        return FileTokenizer(path)
    try:
        from transformers import AutoTokenizer

        tok = AutoTokenizer.from_pretrained(name, local_files_only=True)

        class _Wrap:
            eos_token_id = tok.eos_token_id
            pad_token_id = tok.pad_token_id
            vocab_size = tok.vocab_size

            def __call__(self, texts, max_length=32, add_eos=True):
                enc = tok(list(texts), padding="max_length", truncation=True,
                          max_length=max_length, return_tensors="np")
                return (enc["input_ids"].astype(np.int32),
                        enc["attention_mask"].astype(np.int32))

            def decode(self, ids):
                return tok.decode([i for i in ids if i != tok.pad_token_id],
                                  skip_special_tokens=True)

        return _Wrap()
    except Exception:
        import logging

        logging.getLogger(__name__).warning(
            "No HF tokenizer cache for %r and no --tokenizer_path given: "
            "FALLING BACK TO HashTokenizer (md5 word hashing). Token ids "
            "will NOT match the real sentencepiece vocab — generation/eval "
            "text and any accuracy numbers are synthetic-only. Pass "
            "--tokenizer_path <tokenizer.json> for real tokenization.",
            name,
        )
        return HashTokenizer(vocab_size=vocab_size)


@dataclass
class CalibrationSpec:
    num_samples: int = 128
    batch_size: int = 8
    text_input_len: int = 32
    text_output_len: int = 32

    @property
    def num_microbatches(self) -> int:
        return max(1, self.num_samples // self.batch_size)


def build_vl_calibration_batch(
    samples: Iterable[Dict[str, Any]],
    tokenizer,
    spec: CalibrationSpec,
    seed: int = 0,
    image_key: str = "image",
) -> Dict[str, jnp.ndarray]:
    """[{image: (H,W,3) float array, caption: str}] -> stacked BLIP-2
    calibration batch {image, text_input_ids, text_input_mask, labels}.

    labels use -100 padding so the T5 CE ignores pad positions
    (blip2_t5.py:152-154)."""
    rng = np.random.default_rng(seed)
    images, prefixes, suffixes = [], [], []
    for s in samples:
        if len(images) >= spec.num_samples:
            break
        pre, suf = split_prefix_suffix(s["caption"], rng)
        images.append(np.asarray(s[image_key]))
        prefixes.append(pre)
        suffixes.append(suf if suf.strip() else pre)
    n = len(images)
    assert n > 0, "no calibration samples"
    in_ids, in_mask = tokenizer(prefixes, max_length=spec.text_input_len)
    out_ids, out_mask = tokenizer(suffixes, max_length=spec.text_output_len)
    labels = np.where(out_mask > 0, out_ids, -100)
    return {
        "image": jnp.asarray(np.stack(images)),
        "text_input_ids": jnp.asarray(in_ids),
        "text_input_mask": jnp.asarray(in_mask),
        "labels": jnp.asarray(labels, jnp.int32),
    }


def build_text_calibration_batch(
    texts: Iterable[str],
    tokenizer,
    spec: CalibrationSpec,
    seed: int = 0,
) -> Dict[str, jnp.ndarray]:
    """C4-style prefix-LM batch for the standalone T5 path
    (c4_dataset.py:24-64): {input_ids, attn_mask, labels}."""
    rng = np.random.default_rng(seed)
    prefixes, suffixes = [], []
    for t in texts:
        if len(prefixes) >= spec.num_samples:
            break
        pre, suf = split_prefix_suffix(t, rng)
        prefixes.append(pre)
        suffixes.append(suf if suf.strip() else pre)
    in_ids, in_mask = tokenizer(prefixes, max_length=spec.text_input_len)
    out_ids, out_mask = tokenizer(suffixes, max_length=spec.text_output_len)
    labels = np.where(out_mask > 0, out_ids, -100)
    return {
        "input_ids": jnp.asarray(in_ids),
        "attn_mask": jnp.asarray(in_mask),
        "labels": jnp.asarray(labels, jnp.int32),
    }


def build_lm_calibration_batch(
    token_stream: np.ndarray,
    num_samples: int,
    seqlen: int,
    seed: int = 0,
) -> Dict[str, jnp.ndarray]:
    """Wanda-style C4 LM calibration: random seqlen windows from one token
    stream (wanda lib/data.py semantics, LLaMA/main.py:27)."""
    rng = np.random.default_rng(seed)
    n = token_stream.shape[0]
    starts = rng.integers(0, max(n - seqlen, 1), size=num_samples)
    windows = np.stack([token_stream[s : s + seqlen] for s in starts])
    return {"input_ids": jnp.asarray(windows, jnp.int32)}


def synthetic_vl_samples(
    n: int, img_size: int, seed: int = 0, words: int = 12
) -> List[Dict[str, Any]]:
    """Random images + captions for smoke/bench runs."""
    rng = np.random.default_rng(seed)
    vocab = ["dog", "cat", "tree", "house", "red", "blue", "runs", "sits",
             "park", "sky", "ball", "girl", "boy", "water", "bird"]
    out = []
    for i in range(n):
        cap = " ".join(rng.choice(vocab, size=words))
        out.append({
            "image": rng.normal(size=(img_size, img_size, 3)).astype(np.float32),
            "caption": cap,
        })
    return out
