"""Character-n-gram language identifier (fastText/Cavnar-Trenkle style,
built from scratch — public design, no external model files).

Model = a hashed-feature log-probability matrix ``(n_langs, n_buckets)``
float32. Training counts char 1–3-grams per language, hashes them into
buckets with crc32 (deterministic across processes), and stores
add-one-smoothed log probabilities. Inference scores a text as
``argmax_l Σ_g count(g)·logP(g|l)`` with a softmax confidence.

At scale: the matrix is ~1 MB — shipped to executors once via
``SparkContext.broadcast`` and used inside a scalar pandas UDF
(see functions/udfs.py). No per-row Python crosses the JVM boundary;
scoring is numpy ``take``+``bincount`` per Arrow batch.
"""

from __future__ import annotations

import zlib
from collections import Counter

import numpy as np

from ..config import LANGS
from .corpus import seed_corpus

N_BUCKETS = 1 << 14
_MAX_CHARS = 400  # score prefix only — plenty for language ID


def _ngrams(text: str) -> list[str]:
    t = text[:_MAX_CHARS].lower()
    out = []
    for n in (1, 2, 3):
        out.extend(t[i:i + n] for i in range(len(t) - n + 1))
    return out


def _bucket(g: str) -> int:
    return zlib.crc32(g.encode("utf-8")) % N_BUCKETS


class LangIdModel:
    """Pickle/broadcast-friendly: just (langs, float32 matrix)."""

    def __init__(self, langs: list[str], logprob: np.ndarray):
        self.langs = langs
        self.logprob = logprob  # (n_langs, N_BUCKETS) float32

    def predict_one(self, text: str) -> tuple[str, float]:
        grams = _ngrams(text)
        if not grams:
            return ("und", 0.0)
        idx = np.fromiter((_bucket(g) for g in grams), dtype=np.int64,
                          count=len(grams))
        counts = np.bincount(idx, minlength=N_BUCKETS).astype(np.float32)
        scores = self.logprob @ counts
        # softmax over per-gram-normalized scores for a stable confidence
        z = scores / max(len(grams), 1)
        z = z - z.max()
        p = np.exp(z * 50.0)  # temperature sharpens per-gram margins
        p = p / p.sum()
        k = int(np.argmax(scores))
        return (self.langs[k], float(p[k]))

    def predict_many(self, texts) -> tuple[list[str], list[float]]:
        langs, confs = [], []
        for t in texts:
            l, c = self.predict_one(t if isinstance(t, str) else "")
            langs.append(l)
            confs.append(c)
        return langs, confs


def train_langid(langs: list[str] | None = None,
                 n_sentences: int = 400) -> LangIdModel:
    langs = langs or LANGS
    mat = np.ones((len(langs), N_BUCKETS), dtype=np.float64)  # add-one
    for li, lang in enumerate(langs):
        ctr: Counter[int] = Counter()
        for sent in seed_corpus(lang, n_sentences):
            for g in _ngrams(sent):
                ctr[_bucket(g)] += 1
        for b, c in ctr.items():
            mat[li, b] += c
    mat = np.log(mat / mat.sum(axis=1, keepdims=True))
    return LangIdModel(langs, mat.astype(np.float32))
