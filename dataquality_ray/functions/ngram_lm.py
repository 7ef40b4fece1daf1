"""KenLM-style word-bigram language model with add-k smoothing.

Trained deterministically on the embedded English seed corpus
(``corpora.LANG_CORPORA["en"]``); scores a text by its per-token log2
perplexity. Low perplexity → fluent, natural text; repetitive or
symbol-salad text scores high. Pure function of ``corpora.py`` + constants,
so oracle and Ray actors agree exactly.

The perplexity → 0-100 score mapping lives in ``spec.ppl_score``.
"""

from __future__ import annotations

import math
from typing import Dict, List, Tuple

from dataquality_ray.functions.corpora import LANG_CORPORA
from dataquality_ray.spec import tokenize

_BOS = "<s>"
_K = 0.1  # add-k smoothing


class BigramLM:
    def __init__(self) -> None:
        unigrams: Dict[str, int] = {}
        bigrams: Dict[Tuple[str, str], int] = {}
        for sent in LANG_CORPORA["en"]:
            toks = [_BOS] + tokenize(sent)
            for tok in toks:
                unigrams[tok] = unigrams.get(tok, 0) + 1
            for a, b in zip(toks, toks[1:]):
                bigrams[(a, b)] = bigrams.get((a, b), 0) + 1
        self.unigrams = unigrams
        self.bigrams = bigrams
        self.vocab_size = len(unigrams) + 1  # +1 for <unk>

    def log2_prob(self, prev: str, tok: str) -> float:
        num = self.bigrams.get((prev, tok), 0) + _K
        den = self.unigrams.get(prev, 0) + _K * self.vocab_size
        return math.log2(num / den)

    def log2_ppl(self, text: str) -> float:
        """Per-token log2 perplexity; empty text → a fixed high value."""
        toks = tokenize(text)
        if not toks:
            return 16.0
        total = 0.0
        prev = _BOS
        for tok in toks:
            if tok not in self.unigrams:
                tok_eff = "<unk>"
                # unseen token: probability mass from smoothing only
                num = _K
                den = self.unigrams.get(prev, 0) + _K * self.vocab_size
                total += math.log2(num / den)
                prev = tok  # prev unseen → next bigram backs off via smoothing
                continue
            total += self.log2_prob(prev, tok)
            prev = tok
        return -total / len(toks)


_LM: BigramLM | None = None


def get_lm() -> BigramLM:
    global _LM
    if _LM is None:
        _LM = BigramLM()
    return _LM
