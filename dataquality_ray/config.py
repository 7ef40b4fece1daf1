"""Pipeline configuration — every threshold / knob in one frozen dataclass.

The numeric decision thresholds mirror the reference's rules:
- action thresholds 85/70/60 → KEEP / REVIEW / QUARANTINE / DISCARD
  (reference: app/services/metadata.py:425-433)
- timeliness: upload age > 30 days caps the Timeliness score at 60
  (reference: app/services/metadata.py:398-407)
- near-dup gate: the reference gates pairwise cosine checks on a token
  Jaccard >= 0.7 metadata similarity and flags duplicates at cosine >= 0.95
  (reference: app/services/metadata.py:536,599). Our analog: MinHash-LSH
  candidate generation + exact token-set Jaccard verification at
  ``near_dup_jaccard`` and a SimHash Hamming-distance cosine analog.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class PipelineConfig:
    # --- decision thresholds (reference: metadata.py:425-433) ---
    keep_action_threshold: int = 85      # overall >= 85 -> KEEP
    review_action_threshold: int = 70    # overall >= 70 -> REVIEW
    quarantine_action_threshold: int = 60  # overall >= 60 -> QUARANTINE, else DISCARD
    # keep/drop binarization: KEEP and REVIEW rows are "keep"
    keep_min_overall: int = 70

    # --- timeliness rule (reference: metadata.py:398-407) ---
    timeliness_max_age_days: int = 30
    timeliness_cap: int = 60
    # fixed "now" so runs are reproducible; pipelines may override per run
    reference_now: str = "2026-01-01T00:00:00"

    # --- heuristic scoring knobs (see spec.py for the exact formulas) ---
    min_len_chars: int = 20              # full length score at >= 20 chars
    symbol_penalty_mult: int = 300       # 33% symbol chars -> score 0
    toxicity_penalty_mult: int = 40      # per toxic-phrase hit; 3 hits -> 0
    target_lang: str = "en"
    lang_other_score: int = 30           # dim score for non-target language
    # perplexity -> score mapping: clamp(0, 100, round(a - b * log2_ppl))
    ppl_score_a: int = 160
    ppl_score_b: int = 10

    # --- dedup / sketches ---
    minhash_perms: int = 128
    lsh_bands: int = 32
    lsh_rows: int = 4                    # bands * rows == perms
    near_dup_jaccard: float = 0.8        # exact-verify threshold (ref gate 0.7/0.95)
    simhash_bits: int = 64
    simhash_max_hamming: int = 6
    max_lsh_bucket: int = 2000           # cap pairs per LSH bucket; log drops beyond

    # --- partitioning / layout ---
    num_buckets: int = 32                # conv-hash output buckets (resume granularity)
    salt_buckets: int = 8                # salt for hot-conversation partial aggregates
    # inline dedup_mode only: hard cap on TOTAL distinct dedup_keys the
    # aggregator shards may hold (the map is corpus-proportional — one
    # entry per unique text). Past the cap the hash stage fails LOUDLY
    # with instructions to use dedup_mode="shuffle" (bucketed groupby,
    # no size assumption) instead of OOMing an actor.
    max_inline_map_keys: int = 50_000_000

    # --- execution sizing ---
    batch_size: int = 4096               # rows per batch for text stages
    actor_pool_size: int = 4             # default actor pool concurrency
    seed: int = 42

    def action_for(self, overall: int) -> str:
        """Reference action derivation (metadata.py:425-433)."""
        if overall >= self.keep_action_threshold:
            return "KEEP"
        if overall >= self.review_action_threshold:
            return "REVIEW"
        if overall >= self.quarantine_action_threshold:
            return "QUARANTINE"
        return "DISCARD"


DEFAULT_CONFIG = PipelineConfig()
