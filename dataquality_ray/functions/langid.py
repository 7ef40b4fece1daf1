"""Character n-gram language identification (fastText-style, deterministic).

A small multinomial model over character trigrams: per-language trigram
log-probabilities with add-one smoothing, trained on the embedded seed
corpora (``corpora.LANG_CORPORA``). Prediction is the argmax of mean
per-trigram log-likelihood; confidence is a squashed margin between the
best and the runner-up language.

Implementation: trigrams are bit-packed codepoint triples
(``a<<42 ^ b<<21 ^ c`` — exact, collision-free since codepoints < 2^21),
so a whole batch scores with one vectorized searchsorted + one segmented
sum. Everything is a pure function of ``corpora.py`` — no downloads,
identical across processes — so the Ray actor pool and the single-process
oracle produce bit-identical labels. Reference analog: the reference asks
its LLM for language judgments (bedrock.py rubric text); we replace that
with a local model loaded ONCE per actor (the lesson from the reference
constructing clients per call, bedrock.py:26-31).
"""

from __future__ import annotations

import math
from typing import Dict, List, Tuple

import numpy as np

from dataquality_ray.functions.corpora import LANG_CORPORA

_SPACE = np.uint64(32)


def _codepoints(text: str) -> np.ndarray:
    """'  text ' padding as uint64 codepoints (utf-32 fast path)."""
    cp = np.frombuffer(text.lower().encode("utf-32-le"), dtype=np.uint32)
    out = np.empty(len(cp) + 3, dtype=np.uint64)
    out[0] = out[1] = out[-1] = _SPACE
    out[2:-1] = cp
    return out


def _gram_keys(cp: np.ndarray) -> np.ndarray:
    """Exact bit-packed trigram keys over a padded codepoint array."""
    return (cp[:-2] << np.uint64(42)) ^ (cp[1:-1] << np.uint64(21)) ^ cp[2:]


class LangIDModel:
    """Deterministic char-trigram language classifier."""

    def __init__(self) -> None:
        self.langs: List[str] = sorted(LANG_CORPORA)
        per_lang_counts: List[Dict[int, int]] = []
        per_lang_total: List[int] = []
        global_vocab: set = set()
        for lang in self.langs:
            counts: Dict[int, int] = {}
            total = 0
            for sent in LANG_CORPORA[lang]:
                for g in _gram_keys(_codepoints(sent)).tolist():
                    counts[g] = counts.get(g, 0) + 1
                    total += 1
            per_lang_counts.append(counts)
            per_lang_total.append(total)
            global_vocab.update(counts)
        # Add-one smoothing over the GLOBAL trigram vocabulary so every
        # language is a proper distribution over the same support — a small
        # corpus (zh) just gets a flatter profile, not an unfair advantage
        # on unseen trigrams.
        v = len(global_vocab) + 1
        self.vocab = np.array(sorted(global_vocab), dtype=np.uint64)
        n_langs = len(self.langs)
        # (V+1, L): row per known trigram + final default row for unknowns
        self.logp_matrix = np.empty((len(self.vocab) + 1, n_langs),
                                    dtype=np.float64)
        key_to_idx = {int(k): i for i, k in enumerate(self.vocab)}
        for li, (counts, total) in enumerate(
                zip(per_lang_counts, per_lang_total)):
            denom = total + v
            default = math.log(1.0 / denom)
            col = np.full(len(self.vocab) + 1, default)
            for g, c in counts.items():
                col[key_to_idx[g]] = math.log((c + 1) / denom)
            self.logp_matrix[:, li] = col

    def predict(self, text: str) -> Tuple[str, float]:
        """Returns (lang, confidence). Empty text → ("und", 0.0).

        Delegates to predict_batch so the scalar (oracle) and batched
        (pipeline) paths share ONE float summation order — bit-identical.
        """
        return self.predict_batch([text])[0]

    def predict_batch(self, texts) -> List[Tuple[str, float]]:
        """Vectorized scoring: ONE vocab searchsorted + gather + segmented
        sum over all texts' trigrams in the batch."""
        key_parts = []
        lengths = np.empty(len(texts), dtype=np.int64)
        for i, text in enumerate(texts):
            if text:
                keys = _gram_keys(_codepoints(text))
                lengths[i] = len(keys)
                key_parts.append(keys)
            else:
                lengths[i] = 0
        out: List[Tuple[str, float]] = [("und", 0.0)] * len(texts)
        if not key_parts:
            return out
        all_keys = np.concatenate(key_parts)
        pos = np.searchsorted(self.vocab, all_keys)
        pos_c = np.minimum(pos, len(self.vocab) - 1)
        known = self.vocab[pos_c] == all_keys
        all_ids = np.where(known, pos_c, len(self.vocab))
        gathered = self.logp_matrix[all_ids]          # (T_total, L)
        nonempty = np.flatnonzero(lengths > 0)
        starts = np.zeros(len(nonempty), dtype=np.int64)
        np.cumsum(lengths[nonempty][:-1], out=starts[1:])
        sums = np.add.reduceat(gathered, starts, axis=0)
        means = sums / lengths[nonempty][:, None]
        order = np.argsort(-means, axis=1, kind="stable")
        best = order[:, 0]
        second = order[:, 1]
        rows = np.arange(len(nonempty))
        margins = means[rows, best] - means[rows, second]
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
