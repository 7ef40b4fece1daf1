"""Decision stage — 17-dimension scores, overall score, action, keep flag.

Vectorized re-expression of the reference's scoring tail:
- dimension validation/defaults (metadata.py:151-180) → deterministic
  signal→dimension mapping (spec.dimension_scores)
- overall = round(mean(17 dims)) (metadata.py:419-421)
- action thresholds 85/70/60 (metadata.py:425-433)
- keep = action in {KEEP, REVIEW}

Expects the columns produced by scrub/heuristics/model stages:
length_score, repetition_score, symbol_score, boilerplate_score,
lang_score, ppl_score, timeliness_score, toxicity_score.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from dataquality_ray.config import DEFAULT_CONFIG, PipelineConfig
from dataquality_ray.spec import DIMENSION_NAMES, DIM_EVIDENCE_TEMPLATES

_SIGNAL_COLS = ("length_score", "repetition_score", "symbol_score",
                "boilerplate_score", "lang_score", "ppl_score",
                "timeliness_score", "toxicity_score")

_ACTIONS = np.array(["DISCARD", "QUARANTINE", "REVIEW", "KEEP"])


def _signals(batch: pa.Table) -> dict:
    sig = {}
    for col in _SIGNAL_COLS:
        sig[col.replace("_score", "")] = (
            batch[col].combine_chunks()
            if isinstance(batch[col], pa.ChunkedArray) else batch[col]
        ).to_numpy(zero_copy_only=False).astype(np.int64)
    return sig


def dimension_matrix(batch: pa.Table) -> np.ndarray:
    """(n_rows, 17) int matrix of dimension scores in DIMENSION_NAMES order.

    Vectorized mirror of spec.dimension_scores — any change there must be
    reflected here (tests enforce agreement).
    """
    s = _signals(batch)
    n = len(s["length"])
    heur_mean = (s["length"] + s["repetition"] + s["symbol"]
                 + s["boilerplate"]) // 4
    model_mean = (s["lang"] + s["ppl"]) // 2
    exprs = {
        "Accuracy": s["ppl"],
        "Completeness": s["length"],
        "Consistency": (s["repetition"] + s["symbol"]) // 2,
        "Timeliness": s["timeliness"],
        "Validity": s["symbol"],
        "Uniqueness": s["repetition"],
        "Reliability": s["ppl"],
        "Relevance": s["boilerplate"],
        "Accessibility": s["lang"],
        "Precision": s["symbol"],
        "Integrity": s["length"],
        "Conformity": s["boilerplate"],
        "Interpretability": s["lang"],
        "Traceability": np.full(n, 100, dtype=np.int64),
        "Credibility": (s["ppl"] + s["toxicity"]) // 2,
        "Fitness_for_Use": heur_mean,
        "Value": model_mean,
    }
    return np.stack([exprs[name] for name in DIMENSION_NAMES], axis=1)


def decision_batch(batch: pa.Table, cfg: PipelineConfig = DEFAULT_CONFIG,
                   with_dimensions: bool = False,
                   with_evidence: bool = False) -> pa.Table:
    """Append overall_quality_score, action, keep (+ optional dim columns).

    ``with_dimensions`` adds one int32 column per canonical dimension
    (``dim_<Name>``); ``with_evidence`` additionally adds the struct column
    ``dimensions`` with {score, evidence} per dimension, mirroring the
    reference's analysis record (metadata.py:437-451).
    """
    dims = dimension_matrix(batch)
    # round(mean): sum/17 can never land exactly on .5 (17 is odd, sum is
    # int), so np.rint (banker's) == Python round here — see spec.overall_score
    overall = np.rint(dims.sum(axis=1) / dims.shape[1]).astype(np.int64)
    action_idx = (
        (overall >= cfg.quarantine_action_threshold).astype(np.int8)
        + (overall >= cfg.review_action_threshold)
        + (overall >= cfg.keep_action_threshold)
    )
    action = _ACTIONS[action_idx]
    keep = overall >= cfg.keep_min_overall

    batch = batch.append_column(
        "overall_quality_score", pa.array(overall.astype(np.int32)))
    batch = batch.append_column("action", pa.array(action, pa.string()))
    batch = batch.append_column("keep", pa.array(keep))

    if with_dimensions or with_evidence:
        for i, name in enumerate(DIMENSION_NAMES):
            batch = batch.append_column(
                f"dim_{name}", pa.array(dims[:, i].astype(np.int32)))
    if with_evidence:
        fields = []
        arrays = []
        for i, name in enumerate(DIMENSION_NAMES):
            scores = dims[:, i].astype(np.int32)
            tmpl = DIM_EVIDENCE_TEMPLATES[name]
            evid = pa.array([tmpl.format(score=int(x)) for x in scores],
                            pa.string())
            struct = pa.StructArray.from_arrays(
                [pa.array(scores), evid], names=["score", "evidence"])
            fields.append(name)
            arrays.append(struct)
        dims_struct = pa.StructArray.from_arrays(arrays, names=fields)
        batch = batch.append_column("dimensions", dims_struct)
    return batch
