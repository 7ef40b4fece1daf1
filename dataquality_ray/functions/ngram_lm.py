"""KenLM-style word-bigram language model with add-k smoothing.

Trained deterministically on the embedded English seed corpus
(``corpora.LANG_CORPORA["en"]``); scores a text by its per-token log2
perplexity. Low perplexity → fluent, natural text; repetitive or
symbol-salad text scores high. Pure function of ``corpora.py`` + constants,
so oracle and Ray actors agree exactly (the scalar path delegates to the
batched path — one float summation order everywhere).

Vectorized scoring: tokens map to integer ids (unknown → -1); bigram
counts live in a sorted packed-key array, so a whole batch scores with one
searchsorted + one np.log2 + one segmented sum.

The perplexity → 0-100 score mapping lives in ``spec.ppl_score``.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from dataquality_ray.functions.corpora import LANG_CORPORA
from dataquality_ray.spec import tokenize

_BOS = "<s>"
_K = 0.1  # add-k smoothing
_EMPTY_PPL = 16.0


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
        self.vocab_size = len(unigrams) + 1  # +1 for <unk>

        # id maps: 0..V-1 known tokens (sorted for determinism), V = BOS
        # slot, -1 = unknown (mapped to V+1 internally for packing)
        tokens_sorted = sorted(t for t in unigrams if t != _BOS)
        self.token_id = {t: i for i, t in enumerate(tokens_sorted)}
        self._bos_id = len(tokens_sorted)
        n_ids = len(tokens_sorted) + 2       # + BOS + unk
        self._unk_id = n_ids - 1
        self.unig_counts = np.zeros(n_ids, dtype=np.float64)
        for t, c in unigrams.items():
            idx = self._bos_id if t == _BOS else self.token_id[t]
            self.unig_counts[idx] = c
        # packed bigram keys (prev_id * n_ids + tok_id), sorted
        keys = []
        counts = []
        for (a, b), c in bigrams.items():
            ia = self._bos_id if a == _BOS else self.token_id.get(a)
            ib = self._bos_id if b == _BOS else self.token_id.get(b)
            if ia is None or ib is None:
                continue
            keys.append(ia * n_ids + ib)
            counts.append(c)
        order = np.argsort(np.asarray(keys, dtype=np.int64))
        self._bi_keys = np.asarray(keys, dtype=np.int64)[order]
        self._bi_counts = np.asarray(counts, dtype=np.float64)[order]
        self._n_ids = n_ids
        # polars replace_strict sides for the vectorized tokenizer path
        # (token -> id; identical to the dict, just batch-applied)
        self._tok_keys = list(self.token_id)
        self._tok_vals = [self.token_id[t] for t in self._tok_keys]

    def log2_ppl(self, text: str) -> float:
        return float(self.log2_ppl_batch([text])[0])

    def log2_ppl_batch(self, texts: List[str]) -> np.ndarray:
        """Per-token log2 perplexity per text; empty → _EMPTY_PPL.

        Front-end is fully vectorized: polars lower + extract_all is the
        repo's parity-pinned twin of ``spec.tokenize`` (same quote-free
        ASCII pattern, leftmost-first in both engines — see CLAUDE.md),
        and replace_strict applies the same token->id dict batch-wide.
        """
        import polars as pl
        from dataquality_ray.spec import TOKEN_PATTERN
        s = pl.Series("t", texts, dtype=pl.Utf8)
        toks = s.str.to_lowercase().str.extract_all(TOKEN_PATTERN)
        lengths = toks.list.len().fill_null(0).to_numpy().astype(np.int64)
        out = np.full(len(texts), _EMPTY_PPL, dtype=np.float64)
        if int(lengths.sum()) == 0:
            return out
        flat = toks.explode().drop_nulls()
        all_ids = flat.replace_strict(
            old=self._tok_keys, new=self._tok_vals,
            default=self._unk_id, return_dtype=pl.Int64).to_numpy()
        all_ids = np.ascontiguousarray(all_ids)
        nonempty = np.flatnonzero(lengths > 0)
        lens = lengths[nonempty]
        starts = np.zeros(len(nonempty), dtype=np.int64)
        np.cumsum(lens[:-1], out=starts[1:])

        # prev ids: BOS at each text start, else the previous token
        prev = np.empty_like(all_ids)
        prev[0] = self._bos_id
        prev[1:] = all_ids[:-1]
        prev[starts] = self._bos_id

        # num = K + bigram_count(prev, tok); unknown tok → count 0
        pk = prev * self._n_ids + all_ids
        pos = np.searchsorted(self._bi_keys, pk)
        pos_c = np.minimum(pos, len(self._bi_keys) - 1) \
            if len(self._bi_keys) else np.zeros_like(pk)
        hit = (self._bi_keys[pos_c] == pk) if len(self._bi_keys) \
            else np.zeros(len(pk), dtype=bool)
        num = _K + np.where(hit, self._bi_counts[pos_c], 0.0)
        den = self.unig_counts[prev] + _K * self.vocab_size
        logs = np.log2(num / den)
        sums = np.add.reduceat(logs, starts)
        out[nonempty] = -sums / lens
        return out


_LM: BigramLM | None = None


def get_lm() -> BigramLM:
    global _LM
    if _LM is None:
        _LM = BigramLM()
    return _LM
