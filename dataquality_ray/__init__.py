"""dataquality_ray — a Ray-Data-native transcript quality-filter engine.

A from-scratch reimplementation of the capability classes of the reference
app `adebnathdebnath43/DataQuality` (see SURVEY.md) as a streaming Ray Data
DAG over Parquet tables of multi-turn conversation transcripts:

- regex PII scrub (emails / phones / SSNs) on zero-copy Arrow batches
- heuristic quality dimensions (length, repetition, symbol density,
  boilerplate) + 17-dimension scoring surface mirroring the reference's
  canonical dimension list (reference: app/services/metadata.py:153-158)
- fastText-style char-n-gram language ID and a KenLM-style word-bigram
  perplexity scorer hosted in map_batches actor pools
- exact + MinHash-LSH + SimHash dedup expressed as groupby shuffles
- keep/drop decisioning with the reference's 85/70/60 action thresholds
  (reference: app/services/metadata.py:425-433)
- stable (conv_id, turn_idx) output ordering, per-partition lineage
  manifests and resume-from-checkpoint.

No code is copied from the reference; file:line citations in docstrings
point at the *behavior* being re-expressed.
"""

from dataquality_ray.config import PipelineConfig, DEFAULT_CONFIG

__all__ = ["PipelineConfig", "DEFAULT_CONFIG"]
__version__ = "0.1.0"
