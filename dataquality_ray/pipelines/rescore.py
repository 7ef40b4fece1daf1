"""Re-scoring from a checkpoint — the cheap analog of the reference's
re-analyze loop (T3, routes.py:718-1054: re-run one dimension with new
guidance and recompute the overall score/action, routes.py:1031-1035).

Because phase-1 checkpoints keep every signal column (length/repetition/
symbol/boilerplate/lang/ppl/timeliness/toxicity scores — toxicity is
recomputed from the stored text for checkpoints predating it), changing
decision policy
— thresholds, dimension weighting — does NOT require re-running the model
actors over the corpus: ``rescore`` re-derives dims → overall → action →
keep from the stored signals in one streaming map over the checkpoint.
"""

from __future__ import annotations

import functools

import pyarrow as pa

from dataquality_ray.config import DEFAULT_CONFIG, PipelineConfig
from dataquality_ray.stages.decision import decision_batch


def rescore(scored_ds, cfg: PipelineConfig = DEFAULT_CONFIG,
            with_dimensions: bool = False):
    """Recompute overall_quality_score / action / keep under a (possibly
    different) config from an already-scored dataset or checkpoint.

    Input must carry the seven signal columns; existing decision columns
    are replaced.
    """

    def strip_and_rescore(batch: pa.Table) -> pa.Table:
        # "dimensions" included: a checkpoint written with
        # with_evidence=True must not keep stale {score, evidence}
        # structs that contradict the recomputed decision
        drop = [c for c in ("overall_quality_score", "action", "keep",
                            "dimensions")
                if c in batch.column_names]
        drop += [c for c in batch.column_names if c.startswith("dim_")]
        if drop:
            batch = batch.drop_columns(drop)
        # checkpoints written before the toxicity signal existed lack
        # toxicity_score — recompute it from the stored (scrubbed) text
        # instead of crashing; the signal is a pure text function
        if "toxicity_score" not in batch.column_names:
            import numpy as np
            import pyarrow.compute as pc

            from dataquality_ray.spec import TOXICITY_PATTERN
            lower = pc.utf8_lower(
                batch["text"].combine_chunks()
                if isinstance(batch["text"], pa.ChunkedArray)
                else batch["text"])
            n_tox = pc.cast(
                pc.count_substring_regex(lower, TOXICITY_PATTERN),
                pa.int32())
            tox = np.maximum(
                0, 100 - cfg.toxicity_penalty_mult
                * n_tox.to_numpy(zero_copy_only=False).astype(np.int64))
            if "n_toxic" not in batch.column_names:
                batch = batch.append_column("n_toxic", n_tox)
            batch = batch.append_column(
                "toxicity_score", pa.array(tox.astype(np.int32)))
        return decision_batch(batch, cfg=cfg,
                              with_dimensions=with_dimensions)

    return scored_ds.map_batches(strip_and_rescore,
                                 batch_format="pyarrow",
                                 zero_copy_batch=True)


def rescore_checkpoint(scored_dir: str,
                       cfg: PipelineConfig = DEFAULT_CONFIG):
    """Rescore a phase-1 parquet checkpoint directory (see run.py /
    quality_run) without touching text or model outputs."""
    import ray
    return rescore(ray.data.read_parquet(scored_dir), cfg)
