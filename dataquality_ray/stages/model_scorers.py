"""Stateful model-scoring stages — actor-pool callables for map_batches.

Each class builds its model ONCE in ``__init__`` (per actor) and scores
whole batches in ``__call__`` — the explicit fix for the reference's
anti-pattern of constructing a fresh Bedrock client per call
(bedrock.py:26-31); its network LLM scoring loop (metadata.py:304-312)
becomes a local deterministic model evaluated at memory speed.

Use as::

    ds.map_batches(LangIDScorer, batch_format="pyarrow",
                   batch_size=cfg.batch_size,
                   concurrency=cfg.actor_pool_size)

``CombinedModelScorer`` fuses both models into one pass (one actor pool,
one serialization hop) — the pipeline default; the separate classes remain
for à-la-carte use.
"""

from __future__ import annotations

from typing import List

import numpy as np
import pyarrow as pa

from dataquality_ray.config import DEFAULT_CONFIG, PipelineConfig
from dataquality_ray.functions.langid import LangIDModel
from dataquality_ray.functions.ngram_lm import BigramLM
from dataquality_ray.spec import lang_score, ppl_score


def _texts(batch: pa.Table, col: str) -> List[str]:
    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return arr.to_pylist()


class LangIDScorer:
    """Appends lang, lang_conf, lang_score columns."""

    def __init__(self, text_col: str = "text",
                 cfg: PipelineConfig = DEFAULT_CONFIG) -> None:
        self.model = LangIDModel()          # built once per actor
        self.text_col = text_col
        self.cfg = cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds = [self.model.predict(t) for t in _texts(batch, self.text_col)]
        langs = pa.array([p[0] for p in preds], pa.string())
        confs = pa.array(np.array([p[1] for p in preds], dtype=np.float32))
        scores = pa.array(
            np.array([lang_score(p[0], self.cfg) for p in preds],
                     dtype=np.int32))
        batch = batch.append_column("lang", langs)
        batch = batch.append_column("lang_conf", confs)
        batch = batch.append_column("lang_score", scores)
        return batch


class PerplexityScorer:
    """Appends log2_ppl, ppl_score columns."""

    def __init__(self, text_col: str = "text",
                 cfg: PipelineConfig = DEFAULT_CONFIG) -> None:
        self.lm = BigramLM()                # built once per actor
        self.text_col = text_col
        self.cfg = cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        ppls = np.array(
            [self.lm.log2_ppl(t) for t in _texts(batch, self.text_col)],
            dtype=np.float32)
        scores = np.array([ppl_score(float(p), self.cfg) for p in ppls],
                          dtype=np.int32)
        batch = batch.append_column("log2_ppl", pa.array(ppls))
        batch = batch.append_column("ppl_score", pa.array(scores))
        return batch


class CombinedModelScorer:
    """One actor pool hosting both models — langid + perplexity in one pass."""

    def __init__(self, text_col: str = "text",
                 cfg: PipelineConfig = DEFAULT_CONFIG) -> None:
        self.model = LangIDModel()
        self.lm = BigramLM()
        self.text_col = text_col
        self.cfg = cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = _texts(batch, self.text_col)
        langs, confs64 = self.model.predict_batch_arrays(texts)
        ppls = self.lm.log2_ppl_batch(texts)
        # vectorized spec.lang_score / spec.ppl_score twins — same integer
        # formulas elementwise (ppl >= 0 so int() truncation == astype)
        lscores = np.where(langs == self.cfg.target_lang,
                           np.int32(100),
                           np.int32(self.cfg.lang_other_score)) \
            .astype(np.int32)
        raw = self.cfg.ppl_score_a \
            - (self.cfg.ppl_score_b * ppls).astype(np.int64)
        pscores = np.clip(raw, 0, 100).astype(np.int32)
        batch = batch.append_column("lang", pa.array(langs, pa.string()))
        batch = batch.append_column(
            "lang_conf", pa.array(confs64.astype(np.float32)))
        batch = batch.append_column("lang_score", pa.array(lscores))
        batch = batch.append_column(
            "log2_ppl", pa.array(ppls.astype(np.float32)))
        batch = batch.append_column("ppl_score", pa.array(pscores))
        return batch
