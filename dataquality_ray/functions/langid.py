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
        """Returns (lang, confidence). Empty/garbage text → ("und", 0.0).

        Delegates to predict_batch so the scalar (oracle) and batched
        (pipeline) paths share ONE float summation order — bit-identical.
        """
        return self.predict_batch([text])[0]

    def predict_batch(self, texts) -> List[Tuple[str, float]]:
        """Vectorized scoring of a batch: one gram-id gather + one
        segmented sum (reduceat) over all texts' trigrams."""
        import numpy as np
        gid = self.gram_id
        unk = len(gid)
        ids_parts = []
        lengths = np.empty(len(texts), dtype=np.int64)
        for i, text in enumerate(texts):
            grams = _trigrams(text) if text else []
            lengths[i] = len(grams)
            if grams:
                ids_parts.append(np.fromiter(
                    (gid.get(g, unk) for g in grams),
                    dtype=np.int64, count=len(grams)))
        out: List[Tuple[str, float]] = [("und", 0.0)] * len(texts)
        if not ids_parts:
            return out
        all_ids = np.concatenate(ids_parts)
        gathered = self.logp_matrix[all_ids]          # (T_total, L)
        nonempty = np.flatnonzero(lengths > 0)
        starts = np.zeros(len(nonempty), dtype=np.int64)
        np.cumsum(lengths[nonempty][:-1], out=starts[1:])
        sums = np.add.reduceat(gathered, starts, axis=0)
        means = sums / lengths[nonempty][:, None]
        order = np.argsort(-means, axis=1, kind="stable")
        best = order[:, 0]
        second = order[:, 1]
        margins = means[np.arange(len(nonempty)), best] \
            - means[np.arange(len(nonempty)), second]
        confs = 1.0 - np.exp(-margins * 8.0)
        for j, row in enumerate(nonempty):
            out[row] = (self.langs[int(best[j])],
                        float(min(1.0, max(0.0, confs[j]))))
        return out


_MODEL: LangIDModel | None = None


def get_model() -> LangIDModel:
    """Process-level singleton (model build is ~ms but why repeat it)."""
    global _MODEL
    if _MODEL is None:
        _MODEL = LangIDModel()
    return _MODEL
