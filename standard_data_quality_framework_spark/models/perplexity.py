"""Word-bigram language model with stupid backoff (KenLM-style design,
built from scratch — public technique: Brants et al. 2007).

Model = two hash maps (unigram counts, bigram counts) + total token
count. Perplexity(text) = exp(−mean log P(w_i | w_{i−1})) with
  P(w2|w1) = c(w1,w2)/c(w1)                 if bigram seen
           = 0.4 · c(w2)/total              elif unigram seen
           = 0.4 · floor                    otherwise.

Broadcast to executors once; scored inside a scalar pandas UDF.
Deterministic: trained on the seeded synthetic corpus (corpus.py).
"""

from __future__ import annotations

import math
from collections import Counter

from ..config import LANGS
from .corpus import seed_corpus

_ALPHA = 0.4
_MAX_WORDS = 300  # score prefix only


class PerplexityModel:
    def __init__(self, uni: dict[str, int], bi: dict[tuple[str, str], int],
                 total: int):
        self.uni = uni
        self.bi = bi
        self.total = total
        self.floor = 1.0 / (total * 10.0)

    def perplexity(self, text: str) -> float:
        toks = text.lower().split()[:_MAX_WORDS]
        if len(toks) < 2:
            return float(self.total)  # degenerate: max-ish penalty
        # locals for the per-token loop (UDF hot path): attribute and
        # global lookups per token cost ~15% of the whole scorer
        bi_get = self.bi.get
        uni = self.uni
        uni_get = uni.get
        total = self.total
        alpha_floor = _ALPHA * self.floor
        log = math.log
        logp = 0.0
        n = 0
        prev = toks[0]
        for w in toks[1:]:
            cb = bi_get((prev, w))
            if cb:
                p = cb / uni[prev]
            else:
                cu = uni_get(w)
                p = _ALPHA * (cu / total) if cu else alpha_floor
            logp += log(p)
            n += 1
            prev = w
        return float(math.exp(-logp / n))


def train_perplexity(langs: list[str] | None = None,
                     n_sentences: int = 400) -> PerplexityModel:
    langs = langs or LANGS
    uni: Counter[str] = Counter()
    bi: Counter[tuple[str, str]] = Counter()
    for lang in langs:
        for sent in seed_corpus(lang, n_sentences):
            toks = sent.lower().split()
            uni.update(toks)
            bi.update(zip(toks, toks[1:]))
    return PerplexityModel(dict(uni), dict(bi), sum(uni.values()))
