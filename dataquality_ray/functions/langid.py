"""Character n-gram language identification (fastText-style, deterministic).

A small multinomial model over character trigrams: per-language trigram
log-probabilities with add-one smoothing, trained on the embedded seed
corpora (``corpora.LANG_CORPORA``). Prediction is the argmax of mean
per-trigram log-likelihood; confidence is the softmax margin between the
best and the runner-up language.

Everything is a pure function of ``corpora.py`` — no downloads, identical
across processes — so the Ray actor pool and the single-process oracle
produce bit-identical labels. Reference analog: the reference asks its LLM
for language-quality judgments (bedrock.py rubric text); we replace that
with a local model, loaded ONCE per actor (the lesson from the reference
constructing clients per call, bedrock.py:26-31).
"""

from __future__ import annotations

import math
from typing import Dict, List, Tuple

from dataquality_ray.functions.corpora import LANG_CORPORA

_N = 3  # trigrams


def _trigrams(text: str) -> List[str]:
    t = f"  {text.lower()} "
    return [t[i:i + _N] for i in range(len(t) - _N + 1)]


class LangIDModel:
    """Deterministic char-trigram language classifier."""

    def __init__(self) -> None:
        self.langs: List[str] = sorted(LANG_CORPORA)
        per_lang_counts: List[Dict[str, int]] = []
        per_lang_total: List[int] = []
        global_vocab: set = set()
        for lang in self.langs:
            counts: Dict[str, int] = {}
            total = 0
            for sent in LANG_CORPORA[lang]:
                for g in _trigrams(sent):
                    counts[g] = counts.get(g, 0) + 1
                    total += 1
            per_lang_counts.append(counts)
            per_lang_total.append(total)
            global_vocab.update(counts)
        # Add-one smoothing over the GLOBAL trigram vocabulary so every
        # language is a proper distribution over the same support — a small
        # corpus (zh) just gets a flatter profile, not an unfair advantage
        # on unseen trigrams.
        import numpy as np
        v = len(global_vocab) + 1
        vocab_sorted = sorted(global_vocab)
        self.gram_id = {g: i for i, g in enumerate(vocab_sorted)}
        n_langs = len(self.langs)
        # (V+1, L): row per known trigram + final default row for unknowns
        self.logp_matrix = np.empty((len(vocab_sorted) + 1, n_langs),
                                    dtype=np.float64)
        for li, (counts, total) in enumerate(
                zip(per_lang_counts, per_lang_total)):
            denom = total + v
            default = math.log(1.0 / denom)
            col = np.full(len(vocab_sorted) + 1, default)
            for g, c in counts.items():
                col[self.gram_id[g]] = math.log((c + 1) / denom)
            self.logp_matrix[:, li] = col

    def predict(self, text: str) -> Tuple[str, float]:
        """Returns (lang, confidence). Empty/garbage text → ("und", 0.0)."""
        import numpy as np
        grams = _trigrams(text) if text else []
        if not grams:
            return "und", 0.0
        gid = self.gram_id
        unk = len(gid)
        ids = np.fromiter((gid.get(g, unk) for g in grams),
                          dtype=np.int64, count=len(grams))
        scores = self.logp_matrix[ids].mean(axis=0)
        order = np.argsort(-scores, kind="stable")
        best, second = int(order[0]), int(order[1])
        margin = float(scores[best] - scores[second])
        conf = 1.0 - math.exp(-margin * 8.0)  # deterministic squashing
        return self.langs[best], max(0.0, min(1.0, conf))


_MODEL: LangIDModel | None = None


def get_model() -> LangIDModel:
    """Process-level singleton (model build is ~ms but why repeat it)."""
    global _MODEL
    if _MODEL is None:
        _MODEL = LangIDModel()
    return _MODEL
