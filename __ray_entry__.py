"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship transcript quality pipeline on an
sf0.001-scale deterministic fixture. ``queries()`` exposes one callable per
implemented operator/pipeline from SURVEY §2 (plus the training-data ops:
dedup variants, ANN, text analysis); ``oracle_sql()`` gives the DuckDB
equivalent for every SQL-expressible query — the SQL strings are built
from the SAME ``spec.py`` constants the Ray kernels use, so the two sides
cannot drift.

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from dataquality_ray import spec
from dataquality_ray.config import DEFAULT_CONFIG as CFG

# ---------------------------------------------------------------------------
# entry
# ---------------------------------------------------------------------------

def entry() -> Any:
    """Flagship pipeline on an sf0.001-scale transcript fixture."""
    import ray
    from dataquality_ray.fixtures import transcripts_path
    from dataquality_ray.pipelines.quality import quality_pipeline
    path = transcripts_path(2_000, seed=CFG.seed)
    ds = ray.data.read_parquet(path)
    return quality_pipeline(ds)


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def _transcript_ds(sf_dir: str, columns=None):
    import ray
    from dataquality_ray.fixtures import scale_for_sf_dir, transcripts_path
    path = transcripts_path(scale_for_sf_dir(sf_dir), seed=CFG.seed)
    return ray.data.read_parquet(path, columns=columns)


def queries() -> dict[str, Callable[[str], Any]]:
    from dataquality_ray.pipelines import documents as D
    from dataquality_ray.pipelines import metrics as M
    from dataquality_ray.pipelines.quality import (
        quality_pipeline,
        run_summary,
        transcript_near_dup_pairs,
    )

    def transcript_pipeline(sf_dir: str):
        return quality_pipeline(_transcript_ds(sf_dir))

    def transcript_near_dups(sf_dir: str):
        return transcript_near_dup_pairs(_transcript_ds(sf_dir))

    def transcript_near_dups_join(sf_dir: str):
        # the 100 TB shape: slim band rows + two hash joins instead of
        # carrying token payloads bands× through the shuffle (identical
        # output to the carry variant — tested)
        return transcript_near_dup_pairs(_transcript_ds(sf_dir),
                                         strategy="join")

    def transcript_run_summary(sf_dir: str):
        return run_summary(
            quality_pipeline(_transcript_ds(sf_dir), sort_output=False))

    def transcript_conv_stats(sf_dir: str):
        from dataquality_ray.pipelines.conversations import conv_stats
        scored = quality_pipeline(_transcript_ds(sf_dir),
                                  with_dedup=False, sort_output=False)
        return conv_stats(scored)

    def multimodal_features(sf_dir: str):
        from dataquality_ray.stages.multimodal import multimodal_demo
        return multimodal_demo(sf_dir)

    def multimodal_png_features(sf_dir: str):
        # REAL decode: synthesized PNGs → pure-Python/PIL decoder →
        # pixel-histogram features (rows-only check; decode correctness
        # is pinned by the codec round-trip tests)
        from dataquality_ray.stages.multimodal import \
            multimodal_png_features as _mpf
        return _mpf(sf_dir)

    def multimodal_wav_features(sf_dir: str):
        # REAL audio decode: synthesized PCM-16 WAVs → stdlib wave
        # decoder → integer features (rows-only; codec round-trip is
        # pinned by tests)
        from dataquality_ray.stages.multimodal import \
            multimodal_wav_features as _mwf
        return _mwf(sf_dir)

    def multimodal_frame_samples(sf_dir: str):
        from dataquality_ray.stages.multimodal import multimodal_frames
        return multimodal_frames(sf_dir)

    def multimodal_resized(sf_dir: str):
        from dataquality_ray.stages.multimodal import (
            resize_payloads,
            synthesize_binary_table,
        )
        return resize_payloads(synthesize_binary_table(sf_dir))

    def transcript_entities(sf_dir: str):
        import functools
        from dataquality_ray.pipelines.documents import entities_batch
        return _transcript_ds(sf_dir).map_batches(
            functools.partial(entities_batch,
                              id_cols=["conv_id", "turn_idx"]),
            batch_format="pyarrow")

    def transcript_turn_quality(sf_dir: str):
        """Per-turn scrub counts + heuristic scores + timeliness — the
        SQL-expressible core of the flagship pipeline (everything except
        the langid/LM model signals), under the driver's hard gate."""
        import functools
        import pyarrow as pa
        from dataquality_ray.stages.heuristics import heuristics_batch
        from dataquality_ray.stages.scrub import scrub_batch
        ds = _transcript_ds(sf_dir)
        ds = ds.map_batches(scrub_batch, batch_format="pyarrow",
                            zero_copy_batch=True)
        ds = ds.map_batches(functools.partial(heuristics_batch, cfg=CFG),
                            batch_format="pyarrow", zero_copy_batch=True)
        cols = ["conv_id", "turn_idx", "n_email", "n_phone", "n_ssn",
                "n_toxic", "n_chars", "n_tokens", "n_distinct",
                "length_score", "repetition_score", "symbol_score",
                "boilerplate_score", "toxicity_score", "age_days",
                "timeliness_score"]
        return ds.map_batches(lambda t: t.select(cols),
                              batch_format="pyarrow")

    def transcript_dim_evidence(sf_dir: str):
        """Per-turn {score, evidence} surface of the 17-dim analysis
        record (reference metadata.py:437-451), through the PRODUCTION
        decision path (decision_batch(with_evidence=True)) — flattened
        to the 11 SQL-expressible dimensions so the evidence strings
        themselves are value-hash-checked against the oracle (the
        lang/ppl-backed dims ride the same struct but have no SQL
        twin)."""
        import pyarrow.compute as _pc
        from dataquality_ray.pipelines.quality import quality_pipeline

        scored = quality_pipeline(_transcript_ds(sf_dir), cfg=CFG,
                                  with_dedup=False, with_evidence=True,
                                  sort_output=False)

        def flatten(t):
            import pyarrow as _pa
            dims = t["dimensions"]
            if isinstance(dims, _pa.ChunkedArray):
                dims = dims.combine_chunks()
            out = {"conv_id": t["conv_id"], "turn_idx": t["turn_idx"]}
            for name in SQL_EVIDENCE_DIMS:
                out[f"ev_{name}"] = _pc.struct_field(dims,
                                                     [name, "evidence"])
            return _pa.table(out)

        return scored.map_batches(flatten, batch_format="pyarrow")

    def transcript_dim_cofail(sf_dir: str):
        """(dim_a, dim_b, n_cofail): co-failure matrix of the
        SQL-expressible quality dimensions — on how many turns do
        dimensions a and b BOTH score below the review threshold
        (diagonal = per-dim failure counts). The filter-redundancy
        introspection a pipeline owner reads before tuning thresholds:
        a pair with n_cofail ≈ the diagonal counts is two filters
        doing one job. Runs through the PRODUCTION decision path
        (no forked formulas — CLAUDE.md single-source rule); per-batch
        partial = one 11×11 boolean-matrix matmul, so the exchange is
        ≤ 66 rows per batch into a constant-size aggregate at ANY
        corpus size."""
        import numpy as _np
        import pyarrow as _pa
        import pyarrow.compute as _pc
        from ray.data.aggregate import Sum
        from dataquality_ray.pipelines.quality import quality_pipeline

        scored = quality_pipeline(_transcript_ds(sf_dir), cfg=CFG,
                                  with_dedup=False, with_evidence=True,
                                  sort_output=False)
        names = sorted(SQL_EVIDENCE_DIMS)
        thresh = CFG.review_action_threshold

        def partial(t):
            dims = t["dimensions"]
            if isinstance(dims, _pa.ChunkedArray):
                dims = dims.combine_chunks()
            cols = [_pc.struct_field(dims, [n, "score"])
                    .to_numpy(zero_copy_only=False) for n in names]
            fails = (_np.stack(cols, axis=1) < thresh).astype(_np.int64)
            co = fails.T @ fails
            iu = _np.triu_indices(len(names))
            return _pa.table({
                "dim_a": _pa.array([names[i] for i in iu[0]]),
                "dim_b": _pa.array([names[j] for j in iu[1]]),
                "n": _pa.array(co[iu], type=_pa.int64()),
            })

        agg = scored.map_batches(partial, batch_format="pyarrow") \
            .groupby(["dim_a", "dim_b"]) \
            .aggregate(Sum("n", alias_name="n_cofail"))
        def trim(t):
            t = t.filter(_pc.greater(t["n_cofail"], 0))
            idx = t.schema.get_field_index("n_cofail")
            return t.set_column(idx, "n_cofail",
                                _pc.cast(t["n_cofail"], _pa.int64()))

        return agg.map_batches(trim, batch_format="pyarrow")

    def transcript_sentence_dedup(sf_dir: str):
        """Per-turn intra-document repetition counts (C4-style sentence
        dedup signal) — SQL-checked."""
        from dataquality_ray.stages.heuristics import sentence_stats_batch
        return _transcript_ds(sf_dir).map_batches(
            sentence_stats_batch, batch_format="pyarrow",
            zero_copy_batch=True)

    def conv_length_histogram(sf_dir: str):
        """Nested aggregation: conversation length distribution —
        groupby conv (salted two-phase partials) → groupby n_turns
        count. SQL-checked."""
        import pyarrow as pa
        import pyarrow.compute as _pc
        from ray.data.aggregate import Count, Sum

        ds = _transcript_ds(sf_dir).map_batches(
            lambda t: t.select(["conv_id"]), batch_format="pyarrow")

        def partial(t):
            import pandas as _pd
            g = (_pd.DataFrame({"conv_id": t["conv_id"].to_pylist()})
                 .groupby("conv_id", sort=False).size()
                 .rename("n").reset_index())
            from dataquality_ray.arrowutil import from_pandas_clean
            return from_pandas_clean(g)

        per_conv = ds.map_batches(partial, batch_format="pyarrow") \
            .groupby("conv_id").aggregate(Sum("n", alias_name="n_turns"))
        hist = per_conv.map_batches(
            lambda t: pa.table(
                {"n_turns": _pc.cast(t["n_turns"], pa.int64())}),
            batch_format="pyarrow") \
            .groupby("n_turns").aggregate(Count(alias_name="n_convs"))
        return hist.map_batches(
            lambda t: pa.table({
                "n_turns": t["n_turns"],
                "n_convs": _pc.cast(t["n_convs"], pa.int64())}),
            batch_format="pyarrow")

    def transcript_conv_heuristics(sf_dir: str):
        """Per-conversation aggregate through the SAME salted two-phase
        conv_stats path the flagship uses, driven by the SQL-expressible
        heuristic overall (integer mean of the four heuristic scores) so
        the aggregation topology sits under the driver's hard gate."""
        import functools
        import numpy as np
        import pyarrow as pa
        from dataquality_ray.pipelines.conversations import conv_stats
        from dataquality_ray.stages.heuristics import heuristics_batch
        from dataquality_ray.stages.scrub import scrub_batch
        ds = _transcript_ds(sf_dir)
        ds = ds.map_batches(
            functools.partial(scrub_batch, with_counts=False),
            batch_format="pyarrow", zero_copy_batch=True)
        ds = ds.map_batches(functools.partial(heuristics_batch, cfg=CFG),
                            batch_format="pyarrow", zero_copy_batch=True)

        def decide(t: pa.Table) -> pa.Table:
            from dataquality_ray.stages.heuristics import (
                heuristic_overall4,
            )
            overall = heuristic_overall4(t)
            return pa.table({
                "conv_id": t["conv_id"],
                "turn_idx": t["turn_idx"],
                "overall_quality_score": pa.array(
                    overall.astype(np.int32)),
                "keep": pa.array(overall >= CFG.keep_min_overall),
            })

        return conv_stats(ds.map_batches(decide, batch_format="pyarrow"))

    return {
        # --- documents: scrub / quality / dedup / langid (SQL-checked) ---
        "scrub_documents": D.scrub_documents,
        "toxicity_documents": D.toxicity_documents,
        "quality_documents": D.quality_documents,
        "exact_dedup_documents": D.exact_dedup_documents,
        "near_dup_documents": D.near_dup_documents,
        "shingle_near_dup_documents": D.shingle_near_dup_documents,
        "near_dup_kept_documents": D.near_dup_kept_documents,
        "near_dup_longest_kept_documents": D.near_dup_longest_kept_documents,
        "dup_cluster_size_histogram": D.dup_cluster_size_histogram,
        "quality_length_matrix": D.quality_length_matrix,
        # duplication provenance: near-dup pair mass per unordered
        # source pair (diagonal = within-source template reuse)
        "near_dup_source_matrix": D.near_dup_source_matrix,
        "stratified_sample_documents": D.stratified_sample_documents,
        "max_similarity_per_doc": D.max_similarity_per_doc,
        "union_dedup_documents": D.union_dedup_documents,
        "langid_documents": D.langid_documents,
        "quality_by_source": D.quality_by_source,
        # per-source KS drift of the quality-score distribution vs the
        # rest of the corpus (exact integer milli)
        "quality_drift_by_source": D.quality_drift_by_source,
        # datasheet length profile: log2 length buckets per source
        "doc_length_histogram": D.doc_length_histogram,
        # temperature-0.5 data-mixing weights (exact integer ppm) and
        # the filter-threshold survival curve — both SQL-checked
        "source_mixture_weights": D.source_mixture_weights,
        # largest-remainder integer sampling plan over the sqrt weights
        "mixture_allocation_plan": D.mixture_allocation_plan,
        "quality_threshold_curve": D.quality_threshold_curve,
        # partitioned PERCENT_RANK window via broadcast histogram
        # (integer scores collapse the window to a lookup)
        "quality_percentile_by_source": D.quality_percentile_by_source,
        "doc_key_terms": D.doc_key_terms,
        "key_term_cooccurrence": D.key_term_cooccurrence,
        "doc_tfidf_terms": D.doc_tfidf_terms,
        "dataset_split_documents": D.dataset_split_documents,
        # test-set leakage audit: exact-dup turn groups spanning
        # conversation-level splits — composition of the two frozen
        # hash surfaces, bucketed-local; exercised by the fixture's
        # injected cross-conversation duplicates
        "transcript_split_leakage": _transcript_split_leakage_q,
        # conversation-level near-dup: turn-hash-set Jaccard >= 0.5
        # via exact-recall inverted-index candidates + integer verify
        "conv_near_dup_pairs": _conv_near_dup_pairs_q,
        # NEAR-dup split leakage: near-dup pairs straddling the frozen
        # train/val/test split — the audit exact-content checks miss
        "conv_near_dup_split_leakage": _conv_near_dup_split_leakage_q,
        # the REMOVAL side of conversation-level dedup: connected
        # components, non-canonical members -> cluster min
        "conv_dup_drops": _conv_dup_drops_q,
        "corpus_vocab_stats": D.corpus_vocab_stats,
        # tokenizer-coverage signal: per-doc OOV rate vs the broadcast
        # top-K corpus vocabulary (integer milli rate)
        "doc_oov_rate": D.doc_oov_rate,
        # data SELECTION toward a target distribution: DSIR hashed-ngram
        # importance weights with an exact integer (log2-quantized) LLR
        "dsir_importance_documents": D.dsir_importance_documents,
        # ...and the selection step: top-N by length-normalized
        # importance (deterministic stand-in for Gumbel resampling)
        "dsir_selected_documents": D.dsir_selected_documents,
        "token_count_documents": D.token_count_documents,
        # training-data prep: context-window chunking (flat-map
        # explode), greedy sequence packing (bucketed prefix scan),
        # NTILE deciles (histogram ranking) — all SQL-checked
        "doc_context_chunks": D.doc_context_chunks,
        "packed_sequence_documents": D.packed_sequence_documents,
        "doc_quality_deciles": D.doc_quality_deciles,
        "doc_metadata_gate": D.doc_metadata_gate,
        "global_sentence_dedup": D.global_sentence_dedup,
        "dup_ngram_stats": D.dup_ngram_stats,
        # Gopher-style repetition filter (dup-line / top-2-gram /
        # dup-5-gram char mass + composite flag)
        "gopher_repetition_documents": D.gopher_repetition_documents,
        # Gopher-style QUALITY filter (word/line-shape rules — the
        # non-repetition half of Rae et al. 2021 §A1.1)
        "gopher_quality_documents": D.gopher_quality_documents,
        # C4-style line-level cleaning (Raffel et al. 2020 §2.2):
        # terminal-punct / min-words / javascript line rules + page flag
        "c4_line_filtered_documents": D.c4_line_filtered_documents,
        # unicode hygiene / mojibake audit (U+FFFD, control chars,
        # Latin-1 artifacts, non-ASCII density)
        "mojibake_documents": D.mojibake_documents,
        # tokenizer-fertility audit by source (BPE-ish pre-tokens per
        # whitespace token / per 100 chars)
        "source_token_fertility": D.source_token_fertility,
        # per-document tokenizer-compression gate (chars-per-token
        # bounds — the FineWeb-style fertility filter)
        "doc_compression_gate": D.doc_compression_gate,
        # BM25 top-K lexical retrieval (exact integer BM25, two-phase
        # stats + batch-local scoring + two-phase top-K)
        "bm25_top_docs": D.bm25_top_docs,
        # MOSS-style winnowing fingerprint near-dup pairs (Schleimer
        # et al. 2003): distinct window-min k-gram hashes, df-capped
        "winnow_dup_pairs": D.winnow_dup_pairs,
        # cross-doc exact-substring dedup signal (Lee et al. 2022)
        "duplicate_span_documents": D.duplicate_span_documents,
        # the REMOVAL surface of exact-substring dedup: covered tokens
        # dropped, docs reassembled from survivors
        "duplicate_span_removed_documents":
            D.duplicate_span_removed_documents,
        # group-level set similarity (vocabulary Jaccard between sources)
        "source_vocab_overlap": D.source_vocab_overlap,
        "contaminated_documents": D.contaminated_documents,
        # fixed-128KiB-broadcast decontamination (mergeable Bloom
        # bitmap); hash-checked including deterministic false positives
        "bloom_contaminated_documents": D.bloom_contaminated_documents,
        # span-level decontamination: only benchmark-colliding windows
        # removed, docs reassembled — zero-shuffle (broadcast set)
        "decontaminated_span_documents": D.decontaminated_span_documents,
        # the end-to-end corpus-curation surface (exact dedup + near
        # dedup + langid + toxicity + quality in ONE pipeline with
        # precedence-ordered drop reasons) — SQL-checked
        "curated_documents": D.curated_documents,
        "near_dup_triangle_counts": D.near_dup_triangle_counts,
        "incremental_dedup_documents": D.incremental_dedup_documents,
        # iterative graph centrality in int64 fixed point (recursive-
        # CTE oracle replays the exact recurrence) + deterministic
        # weight-biased sampling — both SQL-checked
        "pagerank_near_dup": D.pagerank_near_dup,
        "weighted_sample_documents": D.weighted_sample_documents,
        # k-anonymity audit over released metadata quasi-identifiers
        "k_anonymity_documents": D.k_anonymity_documents,
        # data-constrained repetition (epoch) planning per source
        "epoch_plan_by_source": D.epoch_plan_by_source,
        # balanced training-shard plan (longest-first round-robin)
        "shard_plan_documents": D.shard_plan_documents,
        # tokenizer-planning vocabulary coverage curve
        "vocab_coverage_curve": D.vocab_coverage_curve,
        # semantic source-similarity matrix over exact centroids
        "source_centroid_similarity": D.source_centroid_similarity,
        # cross-source exact-duplication mass (count math, no pair
        # enumeration — hot hashes cost O(|sources|))
        "exact_dup_source_matrix": D.exact_dup_source_matrix,
        "event_outliers": M.event_outliers,
        "approx_event_percentiles": M.approx_event_percentiles,
        # two-sample KS drift (first vs second half of the timeline)
        # in exact integer milli — SQL-checked
        "event_value_drift": M.event_value_drift,
        # --- transcripts: entity extraction + per-turn heuristics
        #     (SQL-checked via a direct read_parquet of the fixture) ---
        "transcript_entities": transcript_entities,
        "transcript_turn_quality": transcript_turn_quality,
        "transcript_dim_evidence": transcript_dim_evidence,
        # filter-redundancy introspection: 11x11 dimension co-failure
        # matrix through the production decision path
        "transcript_dim_cofail": transcript_dim_cofail,
        "transcript_sentence_dedup": transcript_sentence_dedup,
        "transcript_conv_heuristics": transcript_conv_heuristics,
        "conv_length_histogram": conv_length_histogram,
        "conv_turn_gaps": _conv_turn_gaps_q,
        "role_tool_stats": _role_tool_stats_q,
        # per-conversation majority language (multilingual routing
        # gate) — bucketed majority vote, SQL-checked
        "conv_lang_majority": _conv_lang_majority_q,
        # dialog-structure pattern mining + dialog-balance ratio
        "conv_role_patterns": _conv_role_patterns_q,
        # per-conversation dialog-structure validation (role
        # alternation, orphan tool turns, ts/idx monotonicity)
        "conv_structure_violations": _conv_structure_violations_q,
        # per-conversation context-window accounting (prefix-sum
        # truncation plan against a fixed char budget)
        "conv_context_budget": _conv_context_budget_q,
        # inactivity-based sessionization within conversations
        "conv_session_splits": _conv_session_splits_q,
        # agent-loop detection: exact within-conversation repeats
        "conv_loop_turns": _conv_loop_turns_q,
        # markdown / code-structure audit per conversation (fence
        # balance, headings, bullets, tables, links, backtick mass)
        "conv_markdown_stats": _conv_markdown_stats_q,
        # consecutive-turn token-overlap (near-echo) signal
        "turn_echo_jaccard": _turn_echo_jaccard_q,
        # template-opener dedup: group size per first-K-turn md5
        "conv_prefix_dup_groups": _conv_prefix_dup_groups_q,
        # agent-trajectory Markov counts over role/tool kinds
        "tool_transition_stats": _tool_transition_stats_q,
        # lexical diversity (type-token ratio) per conversation+role
        "conv_ttr_stats": _conv_ttr_stats_q,
        "conv_response_ratio": _conv_response_ratio_q,
        # time-windowed exact dedup (streaming-ingest rule: only
        # repeats within the 7-day horizon are duplicates)
        "windowed_turn_dedup": _windowed_turn_dedup_q,
        "conv_boilerplate_turns": _conv_boilerplate_turns_q,
        "conv_boilerplate_removed_docs": _conv_boilerplate_removed_q,
        "conv_loss_mask_stats": _conv_loss_mask_stats_q,
        "conv_ending_audit": _conv_ending_audit_q,
        "system_prompt_census": _system_prompt_census_q,
        "role_length_profile": _role_length_profile_q,
        "conv_pii_stats": _conv_pii_stats_q,
        "tool_latency_histogram": _tool_latency_histogram_q,
        # preference-pair mining (DPO-style chosen/rejected per conv)
        "conv_preference_pairs": _conv_preference_pairs_q,
        # instruction-diversity opener census over user turns
        "instruction_verb_census": _instruction_verb_census_q,
        # dedup observability: daily duplication-rate timeline
        "dup_rate_daily": _dup_rate_daily_q,
        # dedup-rate ESTIMATION from nested content-hash-range samples
        # (the at-scale "measure before you pay for the full dedup
        # shuffle" step; last row = exact full-corpus answer)
        "sampled_dup_rate": _sampled_dup_rate_q,
        # SFT-corpus health: per-day assistant refusal / canned-
        # deflection rate
        "assistant_refusal_census": _assistant_refusal_census_q,
        # per-source distinct-bigram diversity (distinct-n datasheet
        # stat) and leave-one-source-out mixture ablation planning
        "distinct_ngram_diversity": D.distinct_ngram_diversity,
        "mixture_ablation_weights": D.mixture_ablation_weights,
        # hybrid retrieval: reciprocal-rank fusion of the BM25 and
        # embedding-cosine top-K lists for the same query text
        "hybrid_rrf_top_docs": D.hybrid_rrf_top_docs,
        # provenance hygiene: per-doc cosine to its OWN source
        # centroid, off-domain flag
        "source_embedding_outliers": D.source_embedding_outliers,
        # corpus freshness: per-day novel-bigram ratio
        "ngram_novelty_daily": _ngram_novelty_daily_q,
        # privacy: assistant turns echoing user-supplied PII values
        "pii_echo_turns": _pii_echo_turns_q,
        # SFT health: per-conversation quality improve/decay trend
        "conv_quality_trend": _conv_quality_trend_q,
        # asymmetric (Broder) containment: best sub-document-inclusion
        # match per doc over capped distinct shingle hashes
        "max_containment_per_doc": D.max_containment_per_doc,
        # provenance hygiene: declared lang vs classifier per source
        "langid_mismatch_by_source": D.langid_mismatch_by_source,
        # grounding audit: assistant numbers with no prior support in
        # the conversation (hallucinated-figure shape)
        "unsupported_number_turns": _unsupported_number_turns_q,
        # drift monitor: daily embedding-centroid trajectory
        "semantic_drift_daily": _semantic_drift_daily_q,
        # split QA: per-source balance of the 80/10/10 hash split
        "split_balance_audit": D.split_balance_audit,
        # curation gate: tokenizer specials / eval canaries leaking
        # into training text, per source x marker grid
        "special_token_contamination": D.special_token_contamination,
        # training prep: deterministic fill-in-the-middle cut points
        "fim_split_documents": D.fim_split_documents,
        # filter-redundancy introspection: pairwise gate agreement
        "filter_agreement_matrix": D.filter_agreement_matrix,
        # per-source threshold calibration to a target keep-rate
        "calibrated_thresholds_by_source":
            D.calibrated_thresholds_by_source,
        # dedup -> mixture interaction: weight shift after removal
        "mixture_dedup_shift": D.mixture_dedup_shift,
        # doc-level split-leakage grid over near-dup pairs
        "doc_near_dup_split_leakage": D.doc_near_dup_split_leakage,
        # dedup observability: the K most-duplicated turn contents
        "top_duplicated_turns": _top_duplicated_turns_q,
        # multimodal near-dup: decode -> integer average-hash ->
        # banded hamming search over real decoded PNGs (rows-only:
        # binary codec path has no SQL twin, like the other
        # multimodal surfaces)
        "image_phash_near_dups": _image_phash_near_dups_q,
        # multilingual hygiene: per-conversation code-switching audit
        "conv_lang_switches": _conv_lang_switches_q,
        "conv_length_outliers": _conv_length_outliers_q,
        # Deequ-style table analyzers: per-column profile (exact
        # distinct via value-hash-bucketed local dedup) and a
        # declarative constraint suite — both SQL-checked
        "transcript_column_profile": _transcript_column_profile_q,
        "transcript_column_profile_hll": _transcript_column_profile_hll_q,
        "transcript_constraint_checks": _transcript_constraint_checks_q,
        # exact heavy hitters behind a CMS prefilter (no false
        # negatives — oracle is the plain GROUP BY ... HAVING)
        "transcript_heavy_hitters": _transcript_heavy_hitters_q,
        # BPE merge-candidate mining: top-K adjacent token pairs via
        # pair-hash-bucketed local totals (no corpus-sized aggregate)
        "token_bigram_merges": _token_bigram_merges_q,
        # memorization/PII-risk audit: per-turn corpus-unique token
        # counts (uniqueness decided on the frozen md5-u64 hash)
        "transcript_rare_tokens": _transcript_rare_tokens_q,
        # snapshot reconciliation: added/removed/changed/unchanged per
        # doc — both sides slim-hashed and co-bucketed (FULL OUTER
        # completes locally; neither snapshot broadcast)
        "corpus_snapshot_diff": D.corpus_snapshot_diff,
        # turns -> training documents (string_agg ORDER BY as the
        # bucketed ordered scan) — SQL-checked
        "conv_training_docs": _conv_training_docs_q,
        # conversation-level quality gating + LAG/LEAD context windows
        # — both SQL-checked
        "kept_conversations": _kept_conversations_q,
        "turn_context_windows": _turn_context_windows_q,
        # fuzzy string matching (SymSpell delete-1 blocking; reference
        # S3 fuzzy-key-recovery analog) — SQL-checked vs exact
        # levenshtein all-pairs
        "fuzzy_term_matches": _fuzzy_term_matches_q,
        # --- events: metrics (SQL-checked) ---
        "daily_event_metrics": M.daily_event_metrics,
        # gap-filled calendar-spine variant (dense (day x type) grid)
        "daily_event_type_dense": M.daily_event_type_dense,
        "top_users_by_value": M.top_users_by_value,
        "timeliness_events": M.timeliness_events,
        "latest_event_per_user": M.latest_event_per_user,
        "event_windows": M.event_windows,
        "sliding_event_windows": M.sliding_event_windows,
        "user_sessions": M.user_sessions,
        "asof_latest_error_per_event": _asof_latest_error_per_event,
        "events_near_errors": M.events_near_errors,
        # GLOBAL interval join (no shared key) via time-cell
        # co-partitioning — window side never broadcast
        "events_in_error_bursts": M.events_in_error_bursts,
        "event_value_percentiles": M.event_value_percentiles,
        # same exact-quantile contract, computed by iterative histogram
        # refinement (no single-reducer-per-type) — shares the oracle
        "event_value_percentiles_refine":
            M.event_value_percentiles_refine,
        "user_running_totals": M.user_running_totals,
        "distinct_users_by_event_type": M.distinct_users_by_event_type,
        # retention triangle: first-day cohorts x day offset, distinct
        # users — bucketed-local per-user cohorting
        "user_retention_cohorts": M.user_retention_cohorts,
        # LAG-based telemetry debounce: drop same-(user, type) repeats
        # within 10 min; bucketed per-user ordered scan
        "debounced_events": M.debounced_events,
        "users_without_purchase": M.users_without_purchase,
        # semi-join / EXISTS dual of the anti-join, via a distributed
        # hash join (no broadcast — holds when purchasers don't fit)
        "customers_with_purchases": M.customers_with_purchases,
        # bounded moving window (ROWS BETWEEN 3 PRECEDING AND CURRENT)
        "user_moving_window": M.user_moving_window,
        # robust stats: nested exact quantiles (median + MAD)
        "event_value_mad": M.event_value_mad,
        # sequence analytics: Markov transition matrix, MODE aggregate,
        # ordered funnel — all SQL-checked
        "event_type_transitions": M.event_type_transitions,
        "modal_event_type_per_user": M.modal_event_type_per_user,
        "user_funnel_stages": M.user_funnel_stages,
        # semi-structured JSON parsing + integer sufficient statistics
        # (mean/variance/correlation without float sums) — SQL-checked
        "event_props_numeric_stats": M.event_props_numeric_stats,
        # mergeable sketches: count-min (counters AND estimates exact
        # integers — whole surface SQL-checked) and HyperLogLog
        # (register surface SQL-checked; estimate pytest-bounded)
        "term_counts_cms": D.term_counts_cms,
        "distinct_users_hll": M.distinct_users_hll,
        # set-valued aggregation (array_agg DISTINCT ORDER BY class)
        "user_event_type_sets": M.user_event_type_sets,
        # FULL OUTER JOIN reconciliation (dimension vs activity audit)
        "customer_event_reconciliation": M.customer_event_reconciliation,
        "docs_from_top_sources": D.docs_from_top_sources,
        "docs_matching_terms": D.docs_matching_terms,
        # --- multi-format sources: JSONL + CSV shards derived
        #     deterministically from the sf tables, read back through
        #     ray.data.read_json / read_csv; oracles recompute from the
        #     ORIGINAL parquet views, so the whole write->read round
        #     trip is SQL-checked ---
        "events_jsonl_roundtrip": _events_jsonl_roundtrip,
        "supplier_balance_by_nation": _supplier_balance_by_nation,
        # --- relational: multi-table hash joins (SQL-checked) ---
        "orders_by_nation": _orders_by_nation,
        "revenue_by_brand": _revenue_by_brand,
        "lineitem_pricing_summary": _lineitem_pricing_summary,
        # TPC-H Q3 analog: 3-way join (both date predicates pushed to
        # the scans) + deterministic top-K by revenue
        "shipping_priority_revenue": _shipping_priority_revenue,
        "top_orders_per_customer": _top_orders_per_customer,
        "regional_revenue": _regional_revenue,
        "orders_rollup": _orders_rollup,
        # correlated-subquery shape, decorrelated (float-free compare)
        "orders_above_customer_avg": _orders_above_customer_avg,
        # GROUP BY CUBE grouping sets (complements the ROLLUP shape)
        "revenue_cube": _revenue_cube,
        "daily_event_type_pivot": _daily_event_type_pivot,
        # --- embeddings: similarity search (SQL-checked) ---
        "ann_topk_embeddings": D.ann_topk_embeddings,
        "int8_ann_embeddings": D.int8_ann_embeddings,
        "embedding_near_dup": D.embedding_near_dup,
        # approximate variants (rows-only; recall vs brute force / exact
        # asserted in tests/test_clustering.py)
        "ivf_topk_embeddings": _ivf_topk_embeddings,
        # IVF shape with DETERMINISTIC seed centroids (nprobe=1) —
        # the hash-checkable bucketed-ANN variant
        "ivf_exact_topk_embeddings": _ivf_exact_topk_embeddings,
        "embedding_near_dup_lsh": _embedding_near_dup_lsh,
        # embedding GENERATION (actor-pool feature-hash projection;
        # reference analog bedrock.py:415-453) + ANN over the generated
        # vectors (list-column / composition surfaces stay rows-only;
        # the VALUES are hash-checked via doc_embedding_values)
        "doc_embeddings": _doc_embeddings,
        "doc_embedding_ann": _doc_embedding_ann,
        # the embedder's deterministic tokenize->hash->bucket->tf front
        # half, hard-checked in SQL (everything up to the projection)
        "doc_token_buckets": D.doc_token_buckets,
        # ...and the WHOLE embedder, value-checked: integer projection
        # weights make the accumulation exact, so the generated
        # embeddings themselves hash-match a DuckDB replay
        "doc_embedding_values": D.doc_embedding_values,
        # per-source mean embedding over the exact int64 accumulators —
        # constant-size aggregate (|sources| x DIM), hash-checked
        "source_embedding_centroids": D.source_embedding_centroids,
        # k-means over the embedding corpus: the assignment step is
        # SQL-checked; the full Lloyd iteration is rows-only (pytest
        # enforces determinism + single-process-reference equality)
        "kmeans_assign_embeddings": D.kmeans_assign_embeddings,
        "prototype_pruned_embeddings": D.prototype_pruned_embeddings,
        "cluster_balanced_sample_embeddings":
            D.cluster_balanced_sample_embeddings,
        "kmeans_embeddings": D.kmeans_embeddings,
        # SemDeDup (Abbas et al. 2023): cluster-local cosine dedup —
        # SQL-checked end to end (assignment + drop decisions)
        "semantic_dedup_embeddings": D.semantic_dedup_embeddings,
        # product quantization: codes + asymmetric-distance top-k,
        # EXACT int8 arithmetic end to end (both SQL-checked)
        "pq_codes_embeddings": D.pq_codes_embeddings,
        "pq_ann_topk_embeddings": D.pq_ann_topk_embeddings,
        # --- transcripts: flagship pipeline (rows-only; pytest-verified
        #     against the single-process oracle labeler) ---
        "transcript_pipeline": transcript_pipeline,
        "transcript_near_dup_pairs": transcript_near_dups,
        "transcript_near_dup_pairs_join": transcript_near_dups_join,
        "transcript_run_summary": transcript_run_summary,
        "transcript_conv_stats": transcript_conv_stats,
        "transcript_dup_clusters": _transcript_dup_clusters,
        "transcript_simhash_pairs": _transcript_simhash_pairs,
        # --- sketches (all three SQL-checked: content hash/fingerprint,
        #     SimHash signature, MinHash-band signature) + multimodal ---
        "doc_sketches": D.doc_sketches,
        "doc_sim_sketches": D.doc_sim_sketches,
        "doc_minhash_bands": D.doc_minhash_bands,
        "multimodal_features": multimodal_features,
        "multimodal_png_features": multimodal_png_features,
        "multimodal_wav_features": multimodal_wav_features,
        "multimodal_frame_samples": multimodal_frame_samples,
        "multimodal_resized": multimodal_resized,
        # LM-training corpus statistics: modified Kneser-Ney
        # count-of-counts + closed-form discounts over corpus bigrams
        "kn_discount_stats": D.kn_discount_stats,
        # batch-shape planning: power-of-two length buckets with
        # exact padded-vs-packed overhead per bucket
        "length_bucket_packing_stats": D.length_bucket_packing_stats,
        # positional-index phrase query (adjacent-token exact match)
        "phrase_match_documents": D.phrase_match_documents,
        # curriculum phases from exact global difficulty tertiles
        # (pinned discrete-quantile rule)
        "curriculum_phase_documents": D.curriculum_phase_documents,
        # streaming "distinct users to date" growth curve at HLL
        # sketch cost (register surface exact — SQL-checked)
        "hll_users_cumulative_daily": M.hll_users_cumulative_daily,
        # word2phrase collocation mining: top-K phrase candidates by
        # the exact integer lift score (two slim hash-bucket passes)
        "collocation_phrases": D.collocation_phrases,
        # deterministic source-interleaved training order via the
        # histogram-rank pattern (no per-source global sort)
        "shard_interleave_plan": D.shard_interleave_plan,
        # mixture temperature sweep: size^tau weights for four taus
        # via nested exact isqrt compositions (never float pow)
        "mixture_temperature_sweep": D.mixture_temperature_sweep,
        # Heaps-law vocabulary growth from nested doc-hash samples
        # (last row = exact full corpus)
        "vocab_growth_curve": D.vocab_growth_curve,
        # compute-optimal token-budget planning (tokens/param ratio,
        # epochs needed, peta-FLOPs) per candidate model size
        "token_budget_plan": D.token_budget_plan,
        # inverted-index export: exact df + bounded posting-list head
        "term_posting_lists": D.term_posting_lists,
        # streaming watermark planning: per-user out-of-order arrival
        # audit (running-max lateness in arrival order)
        "event_disorder_stats": M.event_disorder_stats,
        # contrastive training prep: top-K most-similar DIFFERENT-label
        # vectors per query (the ann_topk float recipe + label filter)
        "hard_negative_topk_embeddings": D.hard_negative_topk_embeddings,
        # embedding-quality probe: 1-NN label confusion over a bounded
        # deterministic probe set (dense label-grid spine)
        "knn_label_probe": D.knn_label_probe,
        # turn length vs conversation depth (exact 0-7, pow2 deeper)
        "turn_position_length_curve": _turn_position_length_curve_q,
        # content-defined chunking (token-level rsync/LBFS rule):
        # per-doc chunk geometry for shift-resistant dedup storage
        "cdc_chunk_documents": D.cdc_chunk_documents,
        # SFT instruction-following audit: did the assistant comply
        # with the requested output format? (fixed kind spine)
        "format_compliance_turns": _format_compliance_turns_q,
        # multi-round distributed BPE trainer (word-frequency
        # formulation; one corpus pass, K vocab-sized merge rounds)
        "bpe_train_merges": D.bpe_train_merges,
        # declared-vs-predicted language confusion grid (dense spine)
        "lang_confusion_matrix": D.lang_confusion_matrix,
        # exact distinct-user overlap + Jaccard between event types
        # (the exact twin of an HLL-union estimate)
        "event_type_audience_overlap": M.event_type_audience_overlap,
        # the sketch-algebra twin: pairwise HLL UNION registers
        # (element-wise max; exact-integer surface, SQL-checked)
        "hll_audience_union_registers": M.hll_audience_union_registers,
        # deterministic per-day eval-set refresh (smallest-hash K)
        "daily_eval_sample": _daily_eval_sample_q,
        # verbosity coupling: exact integer sufficient stats for the
        # user-length vs assistant-reply-length correlation
        "reply_length_covariance": _reply_length_covariance_q,
        # curation insight: quality decile x exact-dup membership grid
        "quality_vs_dup_matrix": D.quality_vs_dup_matrix,
        # register audit: exact vocabulary Jaccard between roles
        "role_vocab_overlap": _role_vocab_overlap_q,
        # per-source style fingerprint (caps/digit/punct ppm,
        # mean word length)
        "source_style_profile": D.source_style_profile,
        # serving-cost planning: cumulative prior-context tokens per
        # depth bucket (the quadratic prefill curve)
        "prefill_cost_curve": _prefill_cost_curve_q,
        # dialog structure: run-length histogram of consecutive
        # same-role turns
        "role_run_lengths": _role_run_lengths_q,
        # agent-loop health: tool-retry vs recovery rate
        "tool_retry_stats": _tool_retry_stats_q,
        # structure-drift monitor: daily role-mix timeline
        "role_share_daily": _role_share_daily_q,
    }


def _ivf_exact_topk_embeddings(sf_dir: str):
    import os
    import ray
    from dataquality_ray.pipelines.documents import ANN_K, ANN_QUERY_IDS
    from dataquality_ray.stages.clustering import ivf_exact_topk
    from dataquality_ray.arrowutil import strip_meta
    ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet")) \
        .map_batches(strip_meta, batch_format="pyarrow",
                     zero_copy_batch=True)
    return ivf_exact_topk(ds, ANN_QUERY_IDS, k=ANN_K)


def _ivf_topk_embeddings(sf_dir: str):
    import os
    import ray
    from dataquality_ray.pipelines.documents import ANN_K, ANN_QUERY_IDS
    from dataquality_ray.stages.clustering import ivf_topk
    from dataquality_ray.arrowutil import strip_meta
    ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet")) \
        .map_batches(strip_meta, batch_format="pyarrow",
                     zero_copy_batch=True)
    return ivf_topk(ds, ANN_QUERY_IDS, k=ANN_K)


def _doc_embeddings(sf_dir: str):
    import os
    import ray
    from dataquality_ray.stages.embeddings import embed_texts
    from dataquality_ray.arrowutil import strip_meta
    ds = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                               columns=["doc_id", "text"]) \
        .map_batches(strip_meta, batch_format="pyarrow",
                     zero_copy_batch=True)
    return embed_texts(ds).map_batches(
        lambda t: t.select(["doc_id", "embedding"]),
        batch_format="pyarrow")


def _doc_embedding_ann(sf_dir: str):
    from dataquality_ray.stages.similarity import cosine_topk
    return cosine_topk(_doc_embeddings(sf_dir), [0, 1, 2, 3, 4], k=5,
                       id_col="doc_id")


def _embedding_near_dup_lsh(sf_dir: str):
    # Same 0.4 threshold as the exact triangle-join query, with a wide
    # Hamming budget (pigeonhole recall is exact for signature Hamming
    # <= 28; pairs at cosine 0.4 sit at ~23.6 expected Hamming, so
    # recall is high but < 1 — bounded in tests/test_clustering.py).
    # In the production near-dup regime (t >= 0.9, Hamming ~9) the
    # default budget gives recall ~= 1 with far smaller band groups.
    import os
    import ray
    from dataquality_ray.pipelines.documents import EMB_NEAR_DUP_COSINE
    from dataquality_ray.stages.similarity import embedding_near_dup_lsh
    from dataquality_ray.arrowutil import strip_meta
    ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet")) \
        .map_batches(strip_meta, batch_format="pyarrow",
                     zero_copy_batch=True)
    return embedding_near_dup_lsh(ds, EMB_NEAR_DUP_COSINE, max_hamming=28)


def _asof_latest_error_per_event(sf_dir: str):
    """For every non-error event, the SAME USER's latest error event at
    or before its timestamp (backward as-of join — the custom temporal
    operator Ray Data lacks; SQL-checked against DuckDB's native ASOF
    LEFT JOIN). Ties on (user, ts) break to max event_id on both
    sides."""
    import os

    import pyarrow as pa
    import pyarrow.compute as _pc

    import ray
    from dataquality_ray.arrowutil import strip_meta
    from dataquality_ray.stages.joins import asof_join_backward

    def read(pred):
        def f(batch):
            batch = strip_meta(batch)
            return batch.filter(pred(batch))
        return ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_id", "ts", "user_id", "event_type"]) \
            .map_batches(f, batch_format="pyarrow", zero_copy_batch=True)

    left = read(lambda b: _pc.not_equal(b["event_type"], "error"))
    right = read(lambda b: _pc.equal(b["event_type"], "error"))
    joined = asof_join_backward(
        left, right, by="user_id", on="ts",
        left_cols=["event_id"], right_cols=["event_id", "ts"],
        tiebreak_col="event_id")

    def finish(batch):
        gap = _pc.cast(
            _pc.cast(_pc.subtract(batch["ts"], batch["ts_r"]),
                     pa.duration("us")),
            pa.int64())
        return pa.table({
            "event_id": batch["event_id"],
            "user_id": batch["user_id"],
            "error_event_id": batch["event_id_r"],
            "us_since_error": gap,
        })
    return joined.map_batches(finish, batch_format="pyarrow",
                              zero_copy_batch=True)


def _orders_by_nation(sf_dir: str):
    from dataquality_ray.pipelines.relational import orders_by_nation
    return orders_by_nation(sf_dir)


def _revenue_by_brand(sf_dir: str):
    from dataquality_ray.pipelines.relational import revenue_by_brand
    return revenue_by_brand(sf_dir)


def _transcript_column_profile_q(sf_dir: str):
    from dataquality_ray.pipelines.profiling import column_profile
    return column_profile(_transcript_ds(sf_dir))


def _transcript_column_profile_hll_q(sf_dir: str):
    from dataquality_ray.pipelines.profiling import column_profile_hll
    return column_profile_hll(_transcript_ds(sf_dir))


def _transcript_constraint_checks_q(sf_dir: str):
    from dataquality_ray.pipelines.profiling import constraint_checks
    return constraint_checks(_transcript_ds(sf_dir))


def _transcript_heavy_hitters_q(sf_dir: str):
    from dataquality_ray.pipelines.conversations import \
        transcript_heavy_hitters
    return transcript_heavy_hitters(
        _transcript_ds(sf_dir, columns=["text"]))


def _token_bigram_merges_q(sf_dir: str):
    from dataquality_ray.pipelines.conversations import \
        token_bigram_merges
    return token_bigram_merges(_transcript_ds(sf_dir, columns=["text"]))


def _transcript_rare_tokens_q(sf_dir: str):
    from dataquality_ray.pipelines.conversations import \
        transcript_rare_tokens
    return transcript_rare_tokens(
        _transcript_ds(sf_dir, columns=["conv_id", "turn_idx", "text"]))


def _conv_turn_gaps_q(sf_dir: str):
    from dataquality_ray.pipelines.conversations import conv_turn_gaps
    return conv_turn_gaps(_transcript_ds(
        sf_dir, columns=["conv_id", "turn_idx", "ts"]))


def _role_tool_stats_q(sf_dir: str):
    from dataquality_ray.pipelines.conversations import role_tool_stats
    return role_tool_stats(_transcript_ds(
        sf_dir, columns=["conv_id", "role", "tool", "text"]))


def _conv_lang_majority_q(sf_dir: str):
    from dataquality_ray.pipelines.conversations import conv_lang_majority
    return conv_lang_majority(_transcript_ds(
        sf_dir, columns=["conv_id", "text"]))


def _windowed_turn_dedup_q(sf_dir: str):
    from dataquality_ray.pipelines.conversations import windowed_turn_dedup
    return windowed_turn_dedup(_transcript_ds(
        sf_dir, columns=["conv_id", "turn_idx", "text", "ts"]))


def _tool_latency_histogram_q(sf_dir: str):
    from dataquality_ray.pipelines.conversations import \
        tool_latency_histogram
    return tool_latency_histogram(_transcript_ds(
        sf_dir, columns=["conv_id", "turn_idx", "role", "tool", "ts"]))


def _conv_pii_stats_q(sf_dir: str):
    from dataquality_ray.pipelines.conversations import conv_pii_stats
    return conv_pii_stats(_transcript_ds(
        sf_dir, columns=["conv_id", "text"]))


def _role_length_profile_q(sf_dir: str):
    from dataquality_ray.pipelines.conversations import role_length_profile
    return role_length_profile(_transcript_ds(
        sf_dir, columns=["role", "text"]))


def _turn_position_length_curve_q(sf_dir: str):
    from dataquality_ray.pipelines.conversations import \
        turn_position_length_curve
    return turn_position_length_curve(_transcript_ds(
        sf_dir, columns=["role", "turn_idx", "text"]))


def _format_compliance_turns_q(sf_dir: str):
    from dataquality_ray.pipelines.conversations import \
        format_compliance_turns
    return format_compliance_turns(_transcript_ds(
        sf_dir, columns=["conv_id", "turn_idx", "role", "text"]))


def _daily_eval_sample_q(sf_dir: str):
    from dataquality_ray.pipelines.conversations import \
        daily_eval_sample
    return daily_eval_sample(_transcript_ds(
        sf_dir, columns=["conv_id", "turn_idx", "role", "text",
                         "ts"]))


def _reply_length_covariance_q(sf_dir: str):
    from dataquality_ray.pipelines.conversations import \
        reply_length_covariance
    return reply_length_covariance(_transcript_ds(
        sf_dir, columns=["conv_id", "turn_idx", "role", "text"]))


def _role_vocab_overlap_q(sf_dir: str):
    from dataquality_ray.pipelines.conversations import \
        role_vocab_overlap
    return role_vocab_overlap(_transcript_ds(
        sf_dir, columns=["role", "text"]))


def _prefill_cost_curve_q(sf_dir: str):
    from dataquality_ray.pipelines.conversations import \
        prefill_cost_curve
    return prefill_cost_curve(_transcript_ds(
        sf_dir, columns=["conv_id", "turn_idx", "text"]))


def _role_run_lengths_q(sf_dir: str):
    from dataquality_ray.pipelines.conversations import \
        role_run_lengths
    return role_run_lengths(_transcript_ds(
        sf_dir, columns=["conv_id", "turn_idx", "role"]))


def _tool_retry_stats_q(sf_dir: str):
    from dataquality_ray.pipelines.conversations import \
        tool_retry_stats
    return tool_retry_stats(_transcript_ds(
        sf_dir, columns=["conv_id", "turn_idx", "role"]))


def _role_share_daily_q(sf_dir: str):
    from dataquality_ray.pipelines.conversations import \
        role_share_daily
    return role_share_daily(_transcript_ds(
        sf_dir, columns=["ts", "role"]))


def _conv_lang_switches_q(sf_dir: str):
    from dataquality_ray.pipelines.conversations import \
        conv_lang_switches
    return conv_lang_switches(_transcript_ds(
        sf_dir, columns=["conv_id", "turn_idx", "text"]))


def _dup_rate_daily_q(sf_dir: str):
    from dataquality_ray.pipelines.conversations import dup_rate_daily
    return dup_rate_daily(
        _transcript_ds(sf_dir,
                       columns=["conv_id", "turn_idx", "text", "ts"]),
        ts_ds=_transcript_ds(sf_dir, columns=["ts"]))


def _sampled_dup_rate_q(sf_dir: str):
    from dataquality_ray.pipelines.conversations import sampled_dup_rate
    return sampled_dup_rate(_transcript_ds(sf_dir, columns=["text"]))


def _assistant_refusal_census_q(sf_dir: str):
    from dataquality_ray.pipelines.conversations import \
        assistant_refusal_census
    return assistant_refusal_census(
        _transcript_ds(sf_dir, columns=["role", "text", "ts"]))


def _top_duplicated_turns_q(sf_dir: str):
    from dataquality_ray.pipelines.conversations import \
        top_duplicated_turns
    return top_duplicated_turns(_transcript_ds(
        sf_dir, columns=["conv_id", "turn_idx", "text"]))


def _pii_echo_turns_q(sf_dir: str):
    from dataquality_ray.pipelines.conversations import pii_echo_turns
    return pii_echo_turns(_transcript_ds(
        sf_dir, columns=["conv_id", "turn_idx", "role", "text"]))


def _conv_quality_trend_q(sf_dir: str):
    from dataquality_ray.pipelines.conversations import conv_quality_trend
    return conv_quality_trend(_transcript_ds(sf_dir))


def _image_phash_near_dups_q(sf_dir: str):
    from dataquality_ray.stages.multimodal import image_phash_near_dups
    return image_phash_near_dups(sf_dir)


def _unsupported_number_turns_q(sf_dir: str):
    from dataquality_ray.pipelines.conversations import \
        unsupported_number_turns
    return unsupported_number_turns(_transcript_ds(
        sf_dir, columns=["conv_id", "turn_idx", "role", "text"]))


def _semantic_drift_daily_q(sf_dir: str):
    from dataquality_ray.pipelines.conversations import \
        semantic_drift_daily
    return semantic_drift_daily(
        _transcript_ds(sf_dir, columns=["text", "ts"]))


def _ngram_novelty_daily_q(sf_dir: str):
    from dataquality_ray.pipelines.conversations import \
        ngram_novelty_daily
    return ngram_novelty_daily(
        _transcript_ds(sf_dir, columns=["text", "ts"]))


def _instruction_verb_census_q(sf_dir: str):
    from dataquality_ray.pipelines.conversations import \
        instruction_verb_census
    return instruction_verb_census(_transcript_ds(
        sf_dir, columns=["role", "text"]))


def _conv_preference_pairs_q(sf_dir: str):
    from dataquality_ray.pipelines.conversations import \
        conv_preference_pairs
    return conv_preference_pairs(_transcript_ds(
        sf_dir, columns=["conv_id", "turn_idx", "role", "text", "ts"]),
        cfg=CFG)


def _conv_boilerplate_removed_q(sf_dir: str):
    from dataquality_ray.pipelines.conversations import \
        conv_boilerplate_removed_docs
    return conv_boilerplate_removed_docs(_transcript_ds(
        sf_dir, columns=["conv_id", "turn_idx", "text"]))


def _conv_ending_audit_q(sf_dir: str):
    from dataquality_ray.pipelines.conversations import conv_ending_audit
    return conv_ending_audit(_transcript_ds(
        sf_dir, columns=["conv_id", "turn_idx", "role"]))


def _system_prompt_census_q(sf_dir: str):
    from dataquality_ray.pipelines.conversations import \
        system_prompt_census
    return system_prompt_census(_transcript_ds(
        sf_dir, columns=["conv_id", "role", "text"]))


def _conv_loss_mask_stats_q(sf_dir: str):
    from dataquality_ray.pipelines.conversations import conv_loss_mask_stats
    return conv_loss_mask_stats(_transcript_ds(
        sf_dir, columns=["conv_id", "role", "text"]))


def _conv_length_outliers_q(sf_dir: str):
    from dataquality_ray.pipelines.conversations import conv_length_outliers
    return conv_length_outliers(_transcript_ds(
        sf_dir, columns=["conv_id", "text"]))


def _conv_boilerplate_turns_q(sf_dir: str):
    from dataquality_ray.pipelines.conversations import \
        conv_boilerplate_turns
    return conv_boilerplate_turns(_transcript_ds(
        sf_dir, columns=["conv_id", "text"]))


def _conv_role_patterns_q(sf_dir: str):
    from dataquality_ray.pipelines.conversations import conv_role_patterns
    return conv_role_patterns(_transcript_ds(
        sf_dir, columns=["conv_id", "turn_idx", "role"]))


def _conv_loop_turns_q(sf_dir: str):
    from dataquality_ray.pipelines.conversations import conv_loop_turns
    return conv_loop_turns(_transcript_ds(
        sf_dir, columns=["conv_id", "turn_idx", "text"]))


def _conv_markdown_stats_q(sf_dir: str):
    from dataquality_ray.pipelines.conversations import conv_markdown_stats
    return conv_markdown_stats(_transcript_ds(
        sf_dir, columns=["conv_id", "text"]))


def _turn_echo_jaccard_q(sf_dir: str):
    from dataquality_ray.pipelines.conversations import turn_echo_jaccard
    return turn_echo_jaccard(_transcript_ds(
        sf_dir, columns=["conv_id", "turn_idx", "text"]))


def _conv_session_splits_q(sf_dir: str):
    from dataquality_ray.pipelines.conversations import conv_session_splits
    return conv_session_splits(_transcript_ds(
        sf_dir, columns=["conv_id", "turn_idx", "ts"]))


def _conv_context_budget_q(sf_dir: str):
    from dataquality_ray.pipelines.conversations import conv_context_budget
    return conv_context_budget(_transcript_ds(
        sf_dir, columns=["conv_id", "turn_idx", "text"]))


def _conv_structure_violations_q(sf_dir: str):
    from dataquality_ray.pipelines.conversations import (
        conv_structure_violations,
    )
    return conv_structure_violations(_transcript_ds(
        sf_dir, columns=["conv_id", "turn_idx", "role", "ts"]))


def _conv_prefix_dup_groups_q(sf_dir: str):
    from dataquality_ray.pipelines.conversations import (
        conv_prefix_dup_groups,
    )
    return conv_prefix_dup_groups(_transcript_ds(
        sf_dir, columns=["conv_id", "turn_idx", "text"]))


def _tool_transition_stats_q(sf_dir: str):
    from dataquality_ray.pipelines.conversations import (
        tool_transition_stats,
    )
    return tool_transition_stats(_transcript_ds(
        sf_dir, columns=["conv_id", "turn_idx", "role", "tool"]))


def _conv_ttr_stats_q(sf_dir: str):
    from dataquality_ray.pipelines.conversations import conv_ttr_stats
    return conv_ttr_stats(_transcript_ds(
        sf_dir, columns=["conv_id", "role", "text"]))


def _conv_response_ratio_q(sf_dir: str):
    from dataquality_ray.pipelines.conversations import conv_response_ratio
    return conv_response_ratio(_transcript_ds(
        sf_dir, columns=["conv_id", "role", "text"]))


def _conv_training_docs_q(sf_dir: str):
    from dataquality_ray.pipelines.conversations import conv_training_docs
    return conv_training_docs(_transcript_ds(
        sf_dir, columns=["conv_id", "turn_idx", "role", "text"]))


def _kept_conversations_q(sf_dir: str):
    from dataquality_ray.pipelines.conversations import kept_conversations
    # heuristics_batch skips the timeliness columns when ts is absent;
    # the keep signal here is the 4-score overall, so prune to 2 cols
    return kept_conversations(
        _transcript_ds(sf_dir, columns=["conv_id", "turn_idx", "text"]),
        CFG)


def _turn_context_windows_q(sf_dir: str):
    from dataquality_ray.pipelines.conversations import turn_context_windows
    return turn_context_windows(_transcript_ds(
        sf_dir, columns=["conv_id", "turn_idx", "text"]))


def _conv_near_dup_pairs_q(sf_dir: str):
    from dataquality_ray.pipelines.conversations import conv_near_dup_pairs
    return conv_near_dup_pairs(
        _transcript_ds(sf_dir, columns=["conv_id", "text"]))


def _conv_near_dup_split_leakage_q(sf_dir: str):
    from dataquality_ray.pipelines.conversations import \
        conv_near_dup_split_leakage
    return conv_near_dup_split_leakage(
        _transcript_ds(sf_dir, columns=["conv_id", "text"]))


def _conv_dup_drops_q(sf_dir: str):
    from dataquality_ray.pipelines.conversations import conv_dup_drops
    return conv_dup_drops(
        _transcript_ds(sf_dir, columns=["conv_id", "text"]))


def _transcript_split_leakage_q(sf_dir: str):
    from dataquality_ray.pipelines.conversations import (
        transcript_split_leakage,
    )
    return transcript_split_leakage(
        _transcript_ds(sf_dir, columns=["conv_id", "text"]))


def _fuzzy_term_matches_q(sf_dir: str):
    from dataquality_ray.pipelines.conversations import fuzzy_term_matches
    return fuzzy_term_matches(_transcript_ds(sf_dir, columns=["text"]))


def _events_jsonl_roundtrip(sf_dir: str):
    from dataquality_ray.sources.formats import events_jsonl_roundtrip
    return events_jsonl_roundtrip(sf_dir)


def _supplier_balance_by_nation(sf_dir: str):
    from dataquality_ray.sources.formats import supplier_balance_by_nation
    return supplier_balance_by_nation(sf_dir)


def _shipping_priority_revenue(sf_dir: str):
    from dataquality_ray.pipelines.relational import (
        shipping_priority_revenue,
    )
    return shipping_priority_revenue(sf_dir)


def _lineitem_pricing_summary(sf_dir: str):
    from dataquality_ray.pipelines.relational import lineitem_pricing_summary
    return lineitem_pricing_summary(sf_dir)


def _top_orders_per_customer(sf_dir: str):
    from dataquality_ray.pipelines.relational import top_orders_per_customer
    return top_orders_per_customer(sf_dir)


def _regional_revenue(sf_dir: str):
    from dataquality_ray.pipelines.relational import regional_revenue
    return regional_revenue(sf_dir)


def _orders_rollup(sf_dir: str):
    from dataquality_ray.pipelines.relational import orders_rollup
    return orders_rollup(sf_dir)


def _orders_above_customer_avg(sf_dir: str):
    from dataquality_ray.pipelines.relational import \
        orders_above_customer_avg
    return orders_above_customer_avg(sf_dir)


def _revenue_cube(sf_dir: str):
    from dataquality_ray.pipelines.relational import revenue_cube
    return revenue_cube(sf_dir)


def _daily_event_type_pivot(sf_dir: str):
    from dataquality_ray.pipelines.relational import daily_event_type_pivot
    return daily_event_type_pivot(sf_dir)


def _transcript_simhash_pairs(sf_dir: str):
    import functools
    from dataquality_ray.stages.dedup import (
        MinHashSimHash, content_hash_batch, simhash_near_dup)
    from dataquality_ray.stages.scrub import scrub_batch
    ds = _transcript_ds(sf_dir)
    ds = ds.map_batches(functools.partial(scrub_batch, with_counts=False),
                        batch_format="pyarrow")
    ds = ds.map_batches(content_hash_batch, batch_format="pyarrow")
    ds = ds.map_batches(MinHashSimHash, batch_format="pyarrow",
                        concurrency=(1, CFG.actor_pool_size))
    return simhash_near_dup(ds)


def _transcript_dup_clusters(sf_dir: str):
    # auto dispatch: driver union-find for provably-small pair sets,
    # hash-join label-propagation fixpoint beyond the driver limit
    from dataquality_ray.pipelines.quality import transcript_near_dup_pairs
    from dataquality_ray.stages.clustering import dup_clusters_auto
    return dup_clusters_auto(transcript_near_dup_pairs(_transcript_ds(sf_dir)))


# ---------------------------------------------------------------------------
# oracle SQL — built from the same spec constants as the Ray kernels
# ---------------------------------------------------------------------------

_EMAIL = spec.EMAIL_PATTERN
_SSN = spec.SSN_PATTERN
_PHONE = spec.PHONE_PATTERN
_TOK = spec.TOKEN_PATTERN
_WS = spec.WS_TOKEN_PATTERN
_SYM = spec.SYMBOL_PATTERN
_BP = spec.BOILERPLATE_PATTERN

# window size for the exact-substring-dedup oracles — interpolated so
# the SQL twins track dataquality_ray.pipelines.documents.DUP_SPAN_K
# (CLAUDE.md: oracle SQL is generated from spec constants).
from dataquality_ray.pipelines.documents import DUP_SPAN_K as _SPAN_K  # noqa: E402

# the dimensions whose scores (and therefore evidence strings) are pure
# functions of the SQL-recomputable heuristic/timeliness signals — the
# lang/ppl-backed dims (Accuracy, Reliability, Accessibility,
# Interpretability, Credibility, Value) have no SQL twin. Score exprs in
# terms of transcript_turn_quality's oracle output columns; evidence
# strings are generated from spec.DIM_EVIDENCE_TEMPLATES (split on
# {score}) so template edits cannot desync the twins.
_HEUR_MEAN_SQL = ("(length_score + repetition_score + symbol_score"
                  " + boilerplate_score) // 4")
SQL_EVIDENCE_DIM_EXPRS: "dict[str, str]" = {
    "Completeness": "length_score",
    "Consistency": "(repetition_score + symbol_score) // 2",
    "Timeliness": "timeliness_score",
    "Validity": "symbol_score",
    "Uniqueness": "repetition_score",
    "Relevance": "boilerplate_score",
    "Precision": "symbol_score",
    "Integrity": "length_score",
    "Conformity": "boilerplate_score",
    "Traceability": "100",
    "Fitness_for_Use": _HEUR_MEAN_SQL,
}
SQL_EVIDENCE_DIMS = tuple(SQL_EVIDENCE_DIM_EXPRS)

_AFTER_EMAIL = f"regexp_replace(text, '{_EMAIL}', '<EMAIL>', 'g')"
_AFTER_SSN = f"regexp_replace({_AFTER_EMAIL}, '{_SSN}', '<SSN>', 'g')"
_SCRUBBED = f"regexp_replace({_AFTER_SSN}, '{_PHONE}', '<PHONE>', 'g')"

_QUALITY_CTE = f"""
WITH t AS (
  SELECT doc_id, source,
    length(text) AS n_chars,
    len(regexp_extract_all(lower(text), '{_TOK}')) AS n_tokens,
    len(list_distinct(regexp_extract_all(lower(text), '{_TOK}'))) AS n_distinct,
    len(regexp_extract_all(text, '{_SYM}')) AS n_sym,
    CASE WHEN regexp_matches(lower(text), '{_BP}') THEN 1 ELSE 0 END AS bp
  FROM documents),
s AS (
  SELECT doc_id, source, n_chars, n_tokens, n_distinct,
    LEAST(100, (100 * n_chars) // {CFG.min_len_chars}) AS length_score,
    CASE WHEN n_tokens = 0 THEN 100
         ELSE (100 * n_distinct) // n_tokens END AS repetition_score,
    CASE WHEN n_chars = 0 THEN 100
         ELSE 100 - LEAST(100, ({CFG.symbol_penalty_mult} * n_sym) // n_chars)
         END AS symbol_score,
    CASE WHEN bp = 1 THEN 0 ELSE 100 END AS boilerplate_score
  FROM t),
q AS (
  SELECT *, (length_score + repetition_score + symbol_score
             + boilerplate_score) // 4 AS overall
  FROM s)
"""

_PAIR_CTE = f"""
WITH t AS (
  SELECT doc_id,
    list_distinct(regexp_extract_all(lower(text), '{_TOK}')) AS toks
  FROM documents),
p AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
    CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
      / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))
      AS jaccard
  FROM t a JOIN t b ON a.doc_id < b.doc_id
  WHERE len(a.toks) > 0 AND len(b.toks) > 0)
"""


def _langid_parts() -> tuple[str, str]:
    """(count_exprs_sql, case_sql) over a CTE exposing ``toks`` — shared
    by the standalone langid oracle and the composed curation oracle."""
    count_exprs = []
    for lang, markers in spec.STOPWORD_MARKERS:
        in_list = ", ".join(f"'{m}'" for m in markers)
        count_exprs.append(
            f"len(list_filter(toks, x -> x IN ({in_list}))) AS c_{lang}")
    langs = [lang for lang, _ in spec.STOPWORD_MARKERS]
    greatest = "GREATEST(" + ", ".join(f"c_{l}" for l in langs) + ")"
    case = [f"WHEN {greatest} = 0 THEN 'und'"]
    for i, lang in enumerate(langs[:-1]):
        conds = " AND ".join(f"c_{lang} >= c_{other}"
                             for other in langs[i + 1:])
        case.append(f"WHEN {conds} THEN '{lang}'")
    case_sql = "CASE " + " ".join(case) + f" ELSE '{langs[-1]}' END"
    return ", ".join(count_exprs), case_sql


def _profile_oracle_sql(tr_glob: str) -> str:
    """DuckDB twin of pipelines.profiling.column_profile, generated
    from the SAME PROFILE_COLUMNS registry (min/max taken on the native
    type FIRST, then rendered — never string-compared numerics)."""
    from dataquality_ray.pipelines.profiling import PROFILE_COLUMNS
    parts = []
    for name, kind in PROFILE_COLUMNS:
        e = f"epoch_us({name})" if kind == "ts" else name
        parts.append(f"""
SELECT '{name}' AS col_name,
  CAST(COUNT(*) AS BIGINT) AS n_rows,
  CAST(COUNT(*) - COUNT({e}) AS BIGINT) AS n_null,
  CAST(COUNT(DISTINCT {e}) AS BIGINT) AS n_distinct,
  CAST(MIN({e}) AS VARCHAR) AS min_repr,
  CAST(MAX({e}) AS VARCHAR) AS max_repr
FROM t""")
    return (f"WITH t AS (SELECT * FROM read_parquet('{tr_glob}'))"
            + "\nUNION ALL".join(parts))


def _profile_hll_oracle_sql(tr_glob: str) -> str:
    """DuckDB twin of pipelines.profiling.column_profile_hll —
    register/rho arithmetic generated from the SAME constants as the
    distinct_users_hll twin (top HLL_REG_BITS bits / low-bit
    bit_length), hashing the SAME per-kind VARCHAR value reprs the Ray
    partial hashes."""
    from dataquality_ray.pipelines.metrics import (
        _HLL_MASK,
        _HLL_VALUE_BITS,
    )
    from dataquality_ray.pipelines.profiling import PROFILE_COLUMNS
    rho0 = _HLL_VALUE_BITS + 1
    parts = []
    for name, kind in PROFILE_COLUMNS:
        e = f"epoch_us({name})" if kind == "ts" else name
        parts.append(f"""
SELECT '{name}' AS col_name,
  CAST(hv >> {_HLL_VALUE_BITS} AS BIGINT) AS reg,
  MAX(CAST(CASE WHEN (hv & {_HLL_MASK}::UBIGINT) = 0
           THEN {rho0}
      ELSE {rho0} - length(bin(hv & {_HLL_MASK}::UBIGINT))
      END AS BIGINT)) AS rho
FROM (SELECT DISTINCT md5_number_upper(CAST({e} AS VARCHAR)) AS hv
      FROM t WHERE {e} IS NOT NULL)
GROUP BY 1, 2""")
    return (f"WITH t AS (SELECT * FROM read_parquet('{tr_glob}'))"
            + "\nUNION ALL".join(parts))


def _constraint_oracle_sql(tr_glob: str) -> str:
    """DuckDB twin of pipelines.profiling.constraint_checks, generated
    from the SAME constants (ROLE_SET, TS_LO_US/TS_HI_US)."""
    from dataquality_ray.pipelines.profiling import (
        ROLE_SET,
        TS_HI_US,
        TS_LO_US,
    )
    roles = ", ".join(f"'{r}'" for r in ROLE_SET)
    return f"""
WITH t AS (SELECT * FROM read_parquet('{tr_glob}')),
rowchk AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
    CAST(SUM(CASE WHEN role NOT IN ({roles}) THEN 1 ELSE 0 END)
      AS BIGINT) AS v_role,
    CAST(SUM(CASE WHEN length(text) = 0 THEN 1 ELSE 0 END)
      AS BIGINT) AS v_empty,
    CAST(SUM(CASE WHEN (tool = '') <> (role <> 'tool') THEN 1 ELSE 0
      END) AS BIGINT) AS v_tool,
    CAST(SUM(CASE WHEN turn_idx < 0 THEN 1 ELSE 0 END)
      AS BIGINT) AS v_neg,
    CAST(SUM(CASE WHEN epoch_us(ts) < {TS_LO_US}
      OR epoch_us(ts) >= {TS_HI_US} THEN 1 ELSE 0 END)
      AS BIGINT) AS v_ts
  FROM t),
pk AS (
  SELECT CAST((SELECT COUNT(*) FROM t) - COUNT(*) AS BIGINT) AS v_dup
  FROM (SELECT DISTINCT conv_id, turn_idx FROM t)),
conv AS (
  SELECT conv_id, MIN(turn_idx) AS mn, MAX(turn_idx) AS mx,
    COUNT(DISTINCT turn_idx) AS d
  FROM t GROUP BY conv_id),
convchk AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_convs,
    CAST(SUM(CASE WHEN mn <> 0 OR mx + 1 <> d THEN 1 ELSE 0 END)
      AS BIGINT) AS v_contig
  FROM conv),
mono AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS v_mono FROM (
    SELECT conv_id FROM (
      SELECT conv_id, CASE WHEN lag(epoch_us(ts)) OVER
          (PARTITION BY conv_id ORDER BY turn_idx, epoch_us(ts))
          > epoch_us(ts) THEN 1 ELSE 0 END AS bad
      FROM t) GROUP BY conv_id HAVING MAX(bad) = 1))
SELECT check_name, n_evaluated, n_violations,
  CAST(CASE WHEN n_violations = 0 THEN 1 ELSE 0 END AS BIGINT)
    AS passed
FROM (
  SELECT 'pk_unique' AS check_name, n_rows AS n_evaluated,
    v_dup AS n_violations FROM rowchk, pk
  UNION ALL SELECT 'role_in_set', n_rows, v_role FROM rowchk
  UNION ALL SELECT 'text_not_empty', n_rows, v_empty FROM rowchk
  UNION ALL SELECT 'tool_role_consistent', n_rows, v_tool FROM rowchk
  UNION ALL SELECT 'ts_in_range', n_rows, v_ts FROM rowchk
  UNION ALL SELECT 'ts_monotone_per_conv', n_convs, v_mono
    FROM convchk, mono
  UNION ALL SELECT 'turn_idx_contiguous', n_convs, v_contig
    FROM convchk
  UNION ALL SELECT 'turn_idx_nonneg', n_rows, v_neg FROM rowchk)
"""


def _langid_sql() -> str:
    count_exprs, case_sql = _langid_parts()
    return f"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{_TOK}') AS toks
  FROM documents),
c AS (SELECT doc_id, {count_exprs} FROM t)
SELECT doc_id, {case_sql} AS pred_lang FROM c
"""


def _oracle_sql_impl() -> dict[str, str]:
    import os

    from dataquality_ray.fixtures import transcripts_path
    from dataquality_ray.pipelines.conversations import (
        BIGRAM_TOP_K,
        HH_MIN_DIV,
    )
    from dataquality_ray.pipelines.documents import (
        DIFF_ADDED_MOD,
        DIFF_ADDED_OFFSET,
        DIFF_CHANGED_MOD,
        DIFF_REMOVED_MOD,
    )
    from dataquality_ray.pipelines.metrics import (
        _DAY_US as _DRIFT_DAY_US,
        DRIFT_BIN_SCALE,
        DRIFT_BINS,
    )
    from dataquality_ray.pipelines.documents import (
        ANN_K,
        ANN_QUERY_IDS,
        BLOOM_BITS,
        BLOOM_K,
        CHUNK_STRIDE,
        CHUNK_WINDOW,
        COOC_TOP_K,
        NTILE_BUCKETS,
        PACK_BUCKETS,
        PACK_TOKEN_BUDGET,
        EMB_NEAR_DUP_COSINE,
        METADATA_GATE_THRESHOLD as D_METADATA_GATE,
        NEAR_DUP_DOC_JACCARD,
        SHINGLE_NEAR_DUP_JACCARD,
        SHINGLE_NGRAM,
        SPLIT_BUCKETS,
        SPLIT_TRAIN_LT,
        SPLIT_VAL_LT,
        SAMPLE_PER_SOURCE,
        TFIDF_IDF_SCALE,
        TFIDF_TOP_K,
        TOP_SOURCES_K as D_TOP_SOURCES_K,
        VOCAB_TOP_K,
        OOV_VOCAB_K,
        MIXTURE_BUDGET_DOCS,
        DSIR_BUCKETS,
        DSIR_TARGET_SOURCE,
        DSIR_SELECT_N,
    )
    shingle_expr = " || ' ' || ".join(
        f"ts[i+{k}]" if k else "ts[i]" for k in range(SHINGLE_NGRAM))
    from dataquality_ray.pipelines.conversations import (
        CONTEXT_BUDGET_CHARS as CONV_CONTEXT_BUDGET,
        CONV_PREFIX_K,
        SESSION_GAP_US as CONV_SESSION_GAP_US,
        BOILER_CONV_CAP,
        CONV_DEDUP_DF_CAP,
        LEN_OUTLIER_ABS_FLOOR,
        LEN_OUTLIER_MAD_MULT,
        CONV_KEEP_FRAC_MILLI,
        FUZZY_MIN_LEN as CONV_FUZZY_MIN_LEN,
        TURN_DEDUP_WINDOW_US as CONV_TURN_DEDUP_WINDOW_US,
    )
    from dataquality_ray.pipelines.documents import (
        CMS_DEPTH,
        CMS_QUERY_TERMS,
        CMS_WIDTH,
        WEIGHTED_SAMPLE_N,
    )
    _CMS_TERMS_SQL = ", ".join(f"'{t}'" for t in CMS_QUERY_TERMS)
    from dataquality_ray.stages.clustering import (
        PAGERANK_ITERS as PR_ITERS,
        PAGERANK_SCALE as PR_SCALE,
    )
    from dataquality_ray.pipelines.metrics import (
        FUNNEL_STAGES as M_FUNNEL,
        HLL_REG_BITS as M_HLL_REG_BITS,
        HIGH_VALUE_MIN as M_HIGH_VALUE_MIN,
        DEBOUNCE_US as M_DEBOUNCE_US,
        RANGE_JOIN_WINDOW_US as M_RANGE_WINDOW_US,
        SKETCH_BINS as M_SKETCH_BINS,
    )
    from dataquality_ray.pipelines.relational import (
        EVENT_TYPES as REL_EVENT_TYPES,
        Q1_SHIP_CUTOFF as REL_Q1_CUTOFF,
        Q3_CUTOFF as REL_Q3_CUTOFF,
        Q3_SEGMENT as REL_Q3_SEGMENT,
        Q3_TOP_K as REL_Q3_TOP_K,
        TOP_ORDERS_PER_CUSTOMER_K as REL_TOP_ORDERS_K,
    )
    from dataquality_ray.pipelines.documents import (
        _SENT_IDX_BITS as SENT_IDX_BITS,
        CONTAM_BENCH_MOD,
        CONTAM_NGRAM,
        GOPHER_DUP5_CHAR_PCT,
        GOPHER_DUP_LINE_CHAR_PCT,
        GOPHER_DUP_LINE_PCT,
        GOPHER_TOP2_CHAR_PCT,
        GOPHERQ_ALPHA_PCT,
        GOPHERQ_BULLET_PCT,
        GOPHERQ_ELLIPSIS_PCT,
        GOPHERQ_MAX_WORD_LEN,
        GOPHERQ_MAX_WORDS,
        GOPHERQ_MIN_STOP,
        GOPHERQ_MIN_WORD_LEN,
        GOPHERQ_MIN_WORDS,
        GOPHERQ_STOPWORDS,
        GOPHERQ_SYMBOL_PCT,
        C4_MIN_LINE_WORDS,
        C4_MIN_KEPT_LINES,
        C4_LINE_BLACKLIST,
        C4_PAGE_PHRASE,
        MOJI_NONASCII_PCT,
        MOJI_CTRL_CLASS,
        MOJI_NONASCII_CLASS,
        COMPRESS_MIN_CPT_MILLI,
        COMPRESS_MAX_CPT_MILLI,
        BM25_QUERY_TERMS,
        BM25_K1_MILLI,
        BM25_B_MILLI,
        BM25_IDF_CAP_MILLI,
        BM25_TF_CAP,
        BM25_TOPK,
        WINNOW_K,
        WINNOW_W,
        WINNOW_DF_CAP,
        WINNOW_MIN_SHARED,
        INCR_NEW_MOD as D_INCR_NEW_MOD,
        INT8_SCALE as D_INT8_SCALE,
        SEARCH_TERMS as D_SEARCH_TERMS,
    )
    GOPHERQ_WS = _WS
    GOPHERQ_STOP_SQL = "[" + ", ".join(
        f"'{w}'" for w in GOPHERQ_STOPWORDS) + "]"
    _BM25_TERMS_SQL = ", ".join(f"'{t}'" for t in BM25_QUERY_TERMS)
    from dataquality_ray.stages.embeddings import (
        EMBED_DIM as EMB_DIM,
        HASH_BUCKETS as EMB_HASH_BUCKETS,
        PROJ_Q as EMB_PROJ_Q,
    )
    from dataquality_ray.stages.clustering import KMEANS_K, SEMDEDUP_TAU
    from dataquality_ray.pipelines.documents import (
        CLUSTER_SAMPLE_BUDGET,
        MIXTURE_SQRT_SCALE,
        PROTO_PRUNE_PCT,
    )
    lid_counts, lid_case = _langid_parts()
    contam_shingle = " || ' ' || ".join(
        f"ts[i+{k}]" if k else "ts[i]" for k in range(CONTAM_NGRAM))
    ann_ids = ", ".join(str(i) for i in ANN_QUERY_IDS)
    # Transcript-table oracles read the deterministic fixture directly
    # (the driver registers only the sf tables as views; the fixture is a
    # pure function of (n_turns=20000 @ sf0.01, seed) so both sides see
    # byte-identical input). transcripts_path() builds it if absent.
    tr_glob = os.path.join(transcripts_path(20_000, seed=CFG.seed),
                           "*.parquet")
    stoplist = ", ".join(f"'{w}'" for w in spec.KEY_TERM_STOPWORDS)
    # SimHash entirely in SQL: DuckDB's md5_number_upper(token) equals
    # spec.token_hash_u64 (first 8 md5 bytes, little-endian — verified
    # byte order), per-bit votes are 64 SUM aggregates over the distinct
    # token hashes (votes > 0  <=>  2*ones > n_tokens), and candidate
    # generation uses the SAME pigeonhole chunk join as
    # stages/dedup.simhash_near_dup — so the oracle replicates the
    # pipeline's banding exactly, not an O(n²) cross join.
    sh_chunks = CFG.simhash_max_hamming + 1
    sh_bits = 64 // sh_chunks
    sh_mask = (1 << sh_bits) - 1
    sh_bit_sums = ",\n    ".join(
        f"SUM(CAST((h >> {b}) & 1 AS BIGINT)) AS s{b}" for b in range(64))
    sh_sim_expr = "\n    | ".join(
        f"(CASE WHEN 2*s{b} > cnt THEN CAST({1 << b} AS UBIGINT) "
        f"ELSE CAST(0 AS UBIGINT) END)" for b in range(64))
    # MinHash entirely in SQL: (a*h + b) mod 2^64 via 32-bit limbs in
    # HUGEINT (UBIGINT multiply would overflow loudly in DuckDB), the
    # frozen (a, b) permutation constants inlined as a VALUES table, and
    # candidate generation joining on the RAW 4-value band slices — the
    # splitmix band-key fold is an optimization the oracle doesn't need
    # (equal slices <=> equal band keys up to 2^-64 collisions, and the
    # pipeline verifies exactly anyway).
    mh_a, mh_b = spec.minhash_params(CFG.minhash_perms, CFG.seed)
    mh_perms = ",\n    ".join(
        f"({p}, CAST({int(mh_a[p])} AS UBIGINT), "
        f"CAST({int(mh_b[p])} AS UBIGINT))"
        for p in range(CFG.minhash_perms))
    _M32, _M64 = 4294967296, 18446744073709551616
    mh_mulmod = (
        f"(CAST((a % {_M32}) * (h % {_M32}) AS HUGEINT)"
        f" + ((CAST((a % {_M32}) * (h // {_M32}) AS HUGEINT)"
        f"     + CAST((a // {_M32}) * (h % {_M32}) AS HUGEINT))"
        f"    % {_M32}) * {_M32}"
        f" + b) % {_M64}")
    mh_band_vals = ",\n    ".join(
        f"MAX(CASE WHEN p % {CFG.lsh_rows} = {r} THEN m END) AS v{r}"
        for r in range(CFG.lsh_rows))
    mh_band_eq = " AND ".join(
        f"a.v{r} = b.v{r}" for r in range(CFG.lsh_rows))
    mh_band_sel = ",\n  ".join(
        f"CAST(COALESCE(b.v{r}, CAST(18446744073709551615 AS HUGEINT)) "
        f"AS UBIGINT) AS v{r}" for r in range(CFG.lsh_rows))
    return {
        "doc_key_terms": f"""
WITH t AS (
  SELECT doc_id,
    unnest(regexp_extract_all(lower(text), '{_TOK}')) AS term
  FROM documents),
f AS (
  SELECT doc_id, term, COUNT(*) AS tf
  FROM t WHERE term NOT IN ({stoplist})
  GROUP BY 1, 2),
r AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY tf DESC, term) AS rank
  FROM f)
SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= {spec.KEY_TERMS_TOP_K}
""",
        # integer tf-idf: score = tf * ((N*scale) // df) — same integer
        # formula as the Ray side, so rank ties resolve identically
        "doc_tfidf_terms": f"""
WITH t AS (
  SELECT doc_id,
    unnest(regexp_extract_all(lower(text), '{_TOK}')) AS term
  FROM documents),
f AS (
  SELECT doc_id, term, COUNT(*) AS tf
  FROM t WHERE term NOT IN ({stoplist})
  GROUP BY 1, 2),
d AS (SELECT term, COUNT(*) AS df FROM f GROUP BY term),
n AS (SELECT COUNT(*) AS nd FROM documents),
s AS (
  SELECT f.doc_id, f.term, f.tf,
    f.tf * ((n.nd * {TFIDF_IDF_SCALE}) // d.df) AS score
  FROM f JOIN d USING (term) CROSS JOIN n),
r AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY score DESC, term) AS rank
  FROM s)
SELECT doc_id, term, CAST(tf AS BIGINT) AS tf,
  CAST(score AS BIGINT) AS score, CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= {TFIDF_TOP_K}
""",
        # token budgeting: whitespace + BPE-ish GPT-style pre-tokenizer
        # counts — the same quote-free ASCII regex in both engines
        "token_count_documents": f"""
SELECT doc_id,
  CAST(len(regexp_extract_all(text, '{spec.WS_TOKEN_PATTERN}'))
       AS BIGINT) AS n_ws_tokens,
  CAST(len(regexp_extract_all(lower(text), '{spec.BPE_TOKEN_PATTERN}'))
       AS BIGINT) AS n_bpe_tokens,
  CAST(length(text) AS BIGINT) AS n_chars
FROM documents
""",
        # tokenizer fertility rollup by source (integer ratios, -1 on
        # zero denominators)
        "source_token_fertility": f"""
WITH t AS (
  SELECT source,
    len(regexp_extract_all(text, '{spec.WS_TOKEN_PATTERN}')) AS ws,
    len(regexp_extract_all(lower(text), '{spec.BPE_TOKEN_PATTERN}'))
      AS bpe,
    length(text) AS c
  FROM documents)
SELECT source,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(ws) AS BIGINT) AS n_ws_tokens,
  CAST(SUM(bpe) AS BIGINT) AS n_bpe_tokens,
  CAST(SUM(c) AS BIGINT) AS n_chars,
  CASE WHEN SUM(ws) > 0
       THEN CAST((1000 * SUM(bpe)) // SUM(ws) AS BIGINT)
       ELSE -1 END AS bpe_per_ws_milli,
  CASE WHEN SUM(c) > 0
       THEN CAST((100 * SUM(bpe)) // SUM(c) AS BIGINT)
       ELSE -1 END AS bpe_per_100_chars
FROM t GROUP BY source
""",
        # per-doc tokenizer-compression gate (same tokenization
        # conventions as source_token_fertility; -1 on tokenless docs,
        # which are flagged because -1 < the lower bound)
        "doc_compression_gate": f"""
WITH t AS (
  SELECT doc_id,
    CAST(length(COALESCE(text, '')) AS BIGINT) AS n_chars,
    CAST(len(regexp_extract_all(COALESCE(text, ''),
                                '{spec.WS_TOKEN_PATTERN}'))
         AS BIGINT) AS n_ws_tokens,
    CAST(len(regexp_extract_all(lower(COALESCE(text, '')),
                                '{spec.BPE_TOKEN_PATTERN}'))
         AS BIGINT) AS n_bpe_tokens
  FROM documents),
s AS (
  SELECT doc_id, n_chars, n_ws_tokens, n_bpe_tokens,
    CASE WHEN n_bpe_tokens > 0
         THEN CAST((1000 * n_chars) // n_bpe_tokens AS BIGINT)
         ELSE -1 END AS cpt_milli
  FROM t)
SELECT doc_id, n_chars, n_ws_tokens, n_bpe_tokens, cpt_milli,
  CASE WHEN cpt_milli < {COMPRESS_MIN_CPT_MILLI}
         OR cpt_milli > {COMPRESS_MAX_CPT_MILLI}
       THEN 1 ELSE 0 END AS compress_flag
FROM s
""",
        # winnowing (MOSS): fingerprints = DISTINCT window minima of
        # md5_number_upper k-gram hashes; df-cap mirrored in HAVING
        # (the hot-posting policy); doc_a < doc_b under binary collation
        "winnow_dup_pairs": f"""
WITH t AS (
  SELECT doc_id,
    regexp_extract_all(lower(COALESCE(text, '')), '{_TOK}') AS ts
  FROM documents),
g AS (
  SELECT doc_id,
    list_transform(generate_series(1, len(ts) - {WINNOW_K - 1}),
      i -> md5_number_upper(
             array_to_string(list_slice(ts, i, i + {WINNOW_K - 1}),
                             ' '))) AS hs
  FROM t WHERE len(ts) >= {WINNOW_K}),
f AS (
  SELECT DISTINCT doc_id,
    unnest(list_transform(generate_series(1, len(hs) - {WINNOW_W - 1}),
      i -> list_min(list_slice(hs, i, i + {WINNOW_W - 1})))) AS fp
  FROM g WHERE len(hs) >= {WINNOW_W}),
keep AS (
  SELECT fp FROM f GROUP BY fp
  HAVING COUNT(*) >= 2 AND COUNT(*) <= {WINNOW_DF_CAP}),
p AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
    CAST(COUNT(*) AS BIGINT) AS n_shared
  FROM f a JOIN f b ON a.fp = b.fp AND a.doc_id < b.doc_id
  WHERE a.fp IN (SELECT fp FROM keep)
  GROUP BY 1, 2)
SELECT doc_a, doc_b, n_shared FROM p
WHERE n_shared >= {WINNOW_MIN_SHARED}
""",
        # BM25 top-K: exact integer BM25 (rational RSJ idf — no ln —
        # capped; tf saturated; per-term floored milli scores summed
        # exactly). LIMIT deterministic: (score DESC, doc_id) is total.
        "bm25_top_docs": f"""
WITH tok AS (
  SELECT doc_id,
    unnest(regexp_extract_all(lower(COALESCE(text, '')), '{_TOK}'))
      AS t
  FROM documents),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_tokens FROM tok),
dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl
       FROM tok GROUP BY doc_id),
df AS (SELECT t, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
       FROM tok WHERE t IN ({_BM25_TERMS_SQL}) GROUP BY t),
tf AS (SELECT doc_id, t, CAST(COUNT(*) AS BIGINT) AS tf
       FROM tok WHERE t IN ({_BM25_TERMS_SQL}) GROUP BY doc_id, t),
scored AS (
  SELECT tf.doc_id,
    CAST(MIN(dl.dl) AS BIGINT) AS dl,
    CAST(COUNT(*) AS BIGINT) AS n_terms_hit,
    CAST(SUM(
      (LEAST((1000 * (2 * n.n_docs - 2 * df.df + 1))
             // (2 * df.df + 1), {BM25_IDF_CAP_MILLI})
       * LEAST(tf.tf, {BM25_TF_CAP})
       * {BM25_K1_MILLI + 1000} * 1000)
      // (1000000 * LEAST(tf.tf, {BM25_TF_CAP})
          + {BM25_K1_MILLI} * (1000 - {BM25_B_MILLI})
          + ({BM25_K1_MILLI} * {BM25_B_MILLI}
             * ((1000 * dl.dl * n.n_docs) // tot.n_tokens)) // 1000))
      AS BIGINT) AS score_milli
  FROM tf
  JOIN dl ON tf.doc_id = dl.doc_id
  JOIN df ON df.t = tf.t
  CROSS JOIN n CROSS JOIN tot
  GROUP BY tf.doc_id)
SELECT doc_id, dl, n_terms_hit, score_milli
FROM scored
WHERE score_milli > 0
ORDER BY score_milli DESC, doc_id
LIMIT {BM25_TOPK}
""",
        # note LIMIT is deterministic: (cf DESC, term ASC) is a total
        # order over distinct terms
        "corpus_vocab_stats": f"""
WITH t AS (
  SELECT doc_id,
    unnest(regexp_extract_all(lower(text), '{_TOK}')) AS term
  FROM documents),
f AS (
  SELECT term, COUNT(*) AS cf, COUNT(DISTINCT doc_id) AS df
  FROM t GROUP BY term)
SELECT term, CAST(cf AS BIGINT) AS cf, CAST(df AS BIGINT) AS df
FROM f ORDER BY cf DESC, term LIMIT {VOCAB_TOP_K}
""",
        # per-doc OOV rate vs the top-K vocab (cf desc, term asc —
        # the same deterministic tie-break as the Ray top-k sort);
        # token-less docs -> (0, 0, 0) via the doc-spine LEFT JOIN
        "doc_oov_rate": f"""
WITH t AS (
  SELECT doc_id,
    unnest(regexp_extract_all(lower(text), '{_TOK}')) AS term
  FROM documents),
v AS (
  SELECT term FROM (
    SELECT term, COUNT(*) AS cf FROM t GROUP BY term
    ORDER BY cf DESC, term LIMIT {OOV_VOCAB_K})),
per AS (
  SELECT t.doc_id,
    COUNT(*) AS n_tokens,
    COUNT(CASE WHEN v.term IS NULL THEN 1 END) AS n_oov
  FROM t LEFT JOIN v ON t.term = v.term
  GROUP BY t.doc_id)
SELECT d.doc_id,
  CAST(COALESCE(per.n_tokens, 0) AS BIGINT) AS n_tokens,
  CAST(COALESCE(per.n_oov, 0) AS BIGINT) AS n_oov,
  CAST(CASE WHEN COALESCE(per.n_tokens, 0) = 0 THEN 0
       ELSE per.n_oov * 1000 // per.n_tokens END AS BIGINT)
    AS oov_milli
FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
""",
        # DSIR importance weights: hashed-unigram features (the frozen
        # md5-u64 token hash mod DSIR_BUCKETS), target = one source
        # slice, weight = bit_length(t+1) - bit_length(r+1) — DuckDB's
        # length(bin(x)) equals Python int.bit_length for x >= 1, so
        # the log2-quantized LLR is engine-exact end to end
        "dsir_importance_documents": f"""
WITH toks AS (
  SELECT doc_id, source,
    CAST(md5_number_upper(t) % {DSIR_BUCKETS} AS BIGINT) AS bucket
  FROM (
    SELECT doc_id, source,
      unnest(regexp_extract_all(lower(text), '{_TOK}')) AS t
    FROM documents)),
raw AS (SELECT bucket, COUNT(*) AS r FROM toks GROUP BY 1),
tgt AS (SELECT bucket, COUNT(*) AS t FROM toks
        WHERE source = '{DSIR_TARGET_SOURCE}' GROUP BY 1),
w AS (
  SELECT raw.bucket,
    CAST(length(bin(COALESCE(tgt.t, 0) + 1))
         - length(bin(raw.r + 1)) AS BIGINT) AS w
  FROM raw LEFT JOIN tgt ON tgt.bucket = raw.bucket),
sc AS (
  SELECT toks.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(SUM(w.w) AS BIGINT) AS importance
  FROM toks JOIN w USING (bucket) GROUP BY 1)
SELECT d.doc_id,
  COALESCE(sc.n_tokens, 0) AS n_tokens,
  COALESCE(sc.importance, 0) AS importance
FROM documents d LEFT JOIN sc ON sc.doc_id = d.doc_id
""",
        # the DSIR selection step: deterministic top-N by
        # length-normalized importance (trunc-div // on both engines)
        "dsir_selected_documents": f"""
WITH toks AS (
  SELECT doc_id, source,
    CAST(md5_number_upper(t) % {DSIR_BUCKETS} AS BIGINT) AS bucket
  FROM (
    SELECT doc_id, source,
      unnest(regexp_extract_all(lower(text), '{_TOK}')) AS t
    FROM documents)),
raw AS (SELECT bucket, COUNT(*) AS r FROM toks GROUP BY 1),
tgt AS (SELECT bucket, COUNT(*) AS t FROM toks
        WHERE source = '{DSIR_TARGET_SOURCE}' GROUP BY 1),
w AS (
  SELECT raw.bucket,
    CAST(length(bin(COALESCE(tgt.t, 0) + 1))
         - length(bin(raw.r + 1)) AS BIGINT) AS w
  FROM raw LEFT JOIN tgt ON tgt.bucket = raw.bucket),
sc AS (
  SELECT toks.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(SUM(w.w) AS BIGINT) AS importance
  FROM toks JOIN w USING (bucket) GROUP BY 1),
full_sc AS (
  SELECT d.doc_id,
    COALESCE(sc.n_tokens, 0) AS n_tokens,
    COALESCE(sc.importance, 0) AS importance
  FROM documents d LEFT JOIN sc ON sc.doc_id = d.doc_id)
SELECT doc_id, n_tokens, importance,
  CAST(CASE WHEN n_tokens = 0 THEN 0
       ELSE (importance * 1000) // n_tokens END AS BIGINT)
    AS rate_milli
FROM full_sc
ORDER BY rate_milli DESC, doc_id
LIMIT {DSIR_SELECT_N}
""",
        # md5_number_upper(CAST(id AS VARCHAR)) == spec.token_hash_u64
        # of str(id) — the shared frozen hash, so both engines bucket
        # identically
        "dataset_split_documents": f"""
SELECT doc_id,
  CASE WHEN md5_number_upper(CAST(doc_id AS VARCHAR))
            % {SPLIT_BUCKETS} < {SPLIT_TRAIN_LT} THEN 'train'
       WHEN md5_number_upper(CAST(doc_id AS VARCHAR))
            % {SPLIT_BUCKETS} < {SPLIT_VAL_LT} THEN 'val'
       ELSE 'test' END AS split
FROM documents
""",
        # conversation-level near-dup: distinct turn-hash sets, pairs
        # at Jaccard >= 0.5 — candidates share >= 1 hash so the
        # inverted index has exact recall; verify is pure integer
        "conv_near_dup_pairs": f"""
WITH h AS (
  SELECT DISTINCT conv_id,
    md5(regexp_replace(
      regexp_replace(lower(text), '{spec.EDGE_WS_PATTERN}', '', 'g'),
      '{spec.WS_PLUS_PATTERN}', ' ', 'g')) AS ch
  FROM read_parquet('{tr_glob}')
  WHERE length(regexp_replace(
      regexp_replace(lower(text), '{spec.EDGE_WS_PATTERN}', '', 'g'),
      '{spec.WS_PLUS_PATTERN}', ' ', 'g')) > 0),
keep AS (SELECT ch FROM h GROUP BY ch
         HAVING COUNT(*) <= {CONV_DEDUP_DF_CAP}),
hh AS (SELECT h.* FROM h JOIN keep USING (ch)),
sz AS (SELECT conv_id, CAST(COUNT(*) AS BIGINT) AS n
       FROM hh GROUP BY 1),
p AS (
  SELECT a.conv_id AS conv_a, b.conv_id AS conv_b,
         CAST(COUNT(*) AS BIGINT) AS n_shared
  FROM hh a JOIN hh b ON a.ch = b.ch AND a.conv_id < b.conv_id
  GROUP BY 1, 2)
SELECT p.conv_a, p.conv_b, p.n_shared,
  sa.n AS n_a, sb.n AS n_b,
  CAST((1000 * p.n_shared) // (sa.n + sb.n - p.n_shared) AS BIGINT)
    AS jaccard_milli
FROM p JOIN sz sa ON sa.conv_id = p.conv_a
       JOIN sz sb ON sb.conv_id = p.conv_b
WHERE 3 * p.n_shared >= sa.n + sb.n
""",
        # conversation-dedup removal surface: recursive-CTE components
        # over the qualifying pairs, dropped members -> cluster min
        "conv_dup_drops": f"""
WITH RECURSIVE h AS MATERIALIZED (
  SELECT DISTINCT conv_id,
    md5(regexp_replace(
      regexp_replace(lower(text), '{spec.EDGE_WS_PATTERN}', '', 'g'),
      '{spec.WS_PLUS_PATTERN}', ' ', 'g')) AS ch
  FROM read_parquet('{tr_glob}')
  WHERE length(regexp_replace(
      regexp_replace(lower(text), '{spec.EDGE_WS_PATTERN}', '', 'g'),
      '{spec.WS_PLUS_PATTERN}', ' ', 'g')) > 0),
keep AS MATERIALIZED (
  SELECT ch FROM h GROUP BY ch
  HAVING COUNT(*) <= {CONV_DEDUP_DF_CAP}),
hh AS MATERIALIZED (SELECT h.* FROM h JOIN keep USING (ch)),
sz AS MATERIALIZED (
  SELECT conv_id, CAST(COUNT(*) AS BIGINT) AS n FROM hh GROUP BY 1),
p AS MATERIALIZED (
  SELECT a.conv_id AS conv_a, b.conv_id AS conv_b,
         CAST(COUNT(*) AS BIGINT) AS n_shared
  FROM hh a JOIN hh b ON a.ch = b.ch AND a.conv_id < b.conv_id
  GROUP BY 1, 2),
q AS MATERIALIZED (
  SELECT p.conv_a, p.conv_b
  FROM p JOIN sz sa ON sa.conv_id = p.conv_a
         JOIN sz sb ON sb.conv_id = p.conv_b
  WHERE 3 * p.n_shared >= sa.n + sb.n),
e(src, dst) AS MATERIALIZED (
  SELECT conv_a, conv_b FROM q UNION ALL SELECT conv_b, conv_a FROM q),
r(key, lab) AS (
  SELECT src, src FROM e
  UNION
  SELECT e.dst, r.lab FROM r JOIN e ON e.src = r.key),
c AS (SELECT key, MIN(lab) AS cluster FROM r GROUP BY key)
SELECT key AS conv_id, cluster AS canonical_conv_id
FROM c WHERE key <> cluster
""",
        # leakage audit: exact-content TURN groups whose copies span
        # conversation-level splits (same split hash + same content
        # hash); empty-normalized turns excluded
        "transcript_split_leakage": f"""
WITH h AS (
  SELECT conv_id,
    md5(regexp_replace(
      regexp_replace(lower(text), '{spec.EDGE_WS_PATTERN}', '', 'g'),
      '{spec.WS_PLUS_PATTERN}', ' ', 'g')) AS content_hash,
    length(regexp_replace(
      regexp_replace(lower(text), '{spec.EDGE_WS_PATTERN}', '', 'g'),
      '{spec.WS_PLUS_PATTERN}', ' ', 'g')) AS n_norm,
    CASE WHEN md5_number_upper(conv_id)
              % {SPLIT_BUCKETS} < {SPLIT_TRAIN_LT} THEN 'train'
         WHEN md5_number_upper(conv_id)
              % {SPLIT_BUCKETS} < {SPLIT_VAL_LT} THEN 'val'
         ELSE 'test' END AS split
  FROM read_parquet('{tr_glob}'))
SELECT content_hash, CAST(COUNT(*) AS BIGINT) AS n_copies,
  CAST(COUNT(DISTINCT split) AS BIGINT) AS n_splits,
  MIN(conv_id) AS canonical_conv_id
FROM h WHERE n_norm > 0
GROUP BY 1 HAVING COUNT(DISTINCT split) >= 2
""",
        # co-occurrence of per-doc top-5 key terms; (n desc, a, b) is a
        # total order so LIMIT is deterministic
        "key_term_cooccurrence": f"""
WITH tok AS (
  SELECT doc_id,
    unnest(regexp_extract_all(lower(text), '{_TOK}')) AS term
  FROM documents),
f AS (
  SELECT doc_id, term, COUNT(*) AS tf
  FROM tok WHERE term NOT IN ({stoplist})
  GROUP BY 1, 2),
r AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY tf DESC, term) AS rank
  FROM f),
s AS (SELECT doc_id, term FROM r WHERE rank <= {spec.KEY_TERMS_TOP_K})
SELECT a.term AS term_a, b.term AS term_b,
  CAST(COUNT(*) AS BIGINT) AS n_docs
FROM s a JOIN s b ON a.doc_id = b.doc_id AND a.term < b.term
GROUP BY 1, 2
ORDER BY n_docs DESC, term_a, term_b LIMIT {COOC_TOP_K}
""",
        "conv_length_histogram": f"""
SELECT n_turns, CAST(COUNT(*) AS BIGINT) AS n_convs
FROM (SELECT conv_id, CAST(COUNT(*) AS BIGINT) AS n_turns
      FROM read_parquet('{tr_glob}') GROUP BY conv_id)
GROUP BY n_turns
""",
        # gate arithmetic ordered exactly like the Ray side:
        # (0.5|0.0) + 0.5*(inter/union) in doubles → bit-identical
        "doc_metadata_gate": f"""
WITH tok AS (
  SELECT doc_id,
    unnest(regexp_extract_all(lower(text), '{_TOK}')) AS term
  FROM documents),
f AS (
  SELECT doc_id, term, COUNT(*) AS tf
  FROM tok WHERE term NOT IN ({stoplist})
  GROUP BY 1, 2),
r AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY tf DESC, term) AS rank
  FROM f),
s AS (
  SELECT doc_id, list(term) AS terms
  FROM r WHERE rank <= {spec.KEY_TERMS_TOP_K}
  GROUP BY doc_id),
g AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
    (CASE WHEN da.source = db.source THEN 0.5 ELSE 0.0 END)
      + 0.5 * (CAST(len(list_intersect(a.terms, b.terms)) AS DOUBLE)
               / (len(a.terms) + len(b.terms)
                  - len(list_intersect(a.terms, b.terms)))) AS gate
  FROM s a
  JOIN s b ON a.doc_id < b.doc_id
  JOIN documents da ON da.doc_id = a.doc_id
  JOIN documents db ON db.doc_id = b.doc_id)
SELECT id_a, id_b, gate FROM g
WHERE gate >= {D_METADATA_GATE}
""",
        "transcript_entities": f"""
SELECT conv_id, turn_idx, entity,
  CAST(COUNT(*) AS BIGINT) AS n_mentions
FROM (SELECT conv_id, turn_idx,
        unnest(regexp_extract_all(text, '{spec.ENTITY_PATTERN}')) AS entity
      FROM read_parquet('{tr_glob}'))
GROUP BY 1, 2, 3
""",
        # floor division via positive-mod identity: DuckDB // truncates
        # toward zero, numpy // floors — they differ on negative ages
        # (turns time-stamped after reference_now)
        "transcript_turn_quality": f"""
WITH raw AS (
  SELECT conv_id, turn_idx, ts, text FROM read_parquet('{tr_glob}')),
s AS (
  SELECT conv_id, turn_idx, ts,
    {_SCRUBBED} AS text,
    CAST(len(regexp_extract_all(text, '{_EMAIL}')) AS INTEGER) AS n_email,
    CAST(len(regexp_extract_all({_AFTER_SSN}, '{_PHONE}')) AS INTEGER)
      AS n_phone,
    CAST(len(regexp_extract_all({_AFTER_EMAIL}, '{_SSN}')) AS INTEGER)
      AS n_ssn
  FROM raw),
t AS (
  SELECT *,
    length(text) AS n_chars,
    len(regexp_extract_all(lower(text), '{_TOK}')) AS n_tokens,
    len(list_distinct(regexp_extract_all(lower(text), '{_TOK}')))
      AS n_distinct,
    len(regexp_extract_all(text, '{_SYM}')) AS n_sym,
    CASE WHEN regexp_matches(lower(text), '{_BP}') THEN 1 ELSE 0 END AS bp,
    len(regexp_extract_all(lower(text), '{spec.TOXICITY_PATTERN}'))
      AS n_tox,
    epoch_us(TIMESTAMP '{CFG.reference_now}') - epoch_us(ts) AS d_us
  FROM s)
SELECT conv_id, turn_idx,
  n_email, n_phone, n_ssn,
  CAST(n_tox AS INTEGER) AS n_toxic,
  CAST(n_chars AS BIGINT) AS n_chars,
  CAST(n_tokens AS BIGINT) AS n_tokens,
  CAST(n_distinct AS BIGINT) AS n_distinct,
  CAST(LEAST(100, (100 * n_chars) // {CFG.min_len_chars}) AS INTEGER)
    AS length_score,
  CAST(CASE WHEN n_tokens = 0 THEN 100
       ELSE (100 * n_distinct) // n_tokens END AS INTEGER)
    AS repetition_score,
  CAST(CASE WHEN n_chars = 0 THEN 100
       ELSE 100 - LEAST(100, ({CFG.symbol_penalty_mult} * n_sym) // n_chars)
       END AS INTEGER) AS symbol_score,
  CAST(CASE WHEN bp = 1 THEN 0 ELSE 100 END AS INTEGER)
    AS boilerplate_score,
  CAST(GREATEST(0, 100 - {CFG.toxicity_penalty_mult} * n_tox) AS INTEGER)
    AS toxicity_score,
  CAST((d_us - ((d_us % 86400000000 + 86400000000) % 86400000000))
       // 86400000000 AS BIGINT) AS age_days,
  CAST(CASE WHEN (d_us - ((d_us % 86400000000 + 86400000000)
                          % 86400000000)) // 86400000000
              > {CFG.timeliness_max_age_days}
       THEN {CFG.timeliness_cap} ELSE 100 END AS INTEGER)
    AS timeliness_score
FROM t
""",
        # C4-style intra-document (sentence) repetition counts; the
        # trim charset matches polars strip_chars(" \\t\\r\\n") exactly
        "transcript_sentence_dedup": f"""
SELECT conv_id, turn_idx,
  CAST(len(segs) AS BIGINT) AS n_sentences,
  CAST(len(list_distinct(segs)) AS BIGINT) AS n_unique_sentences
FROM (
  SELECT conv_id, turn_idx,
    list_filter(list_transform(string_split(text, '.'),
                               x -> trim(x, ' ' || chr(9) || chr(13)
                                            || chr(10))),
                x -> x <> '') AS segs
  FROM read_parquet('{tr_glob}'))
""",
        "transcript_conv_heuristics": f"""
WITH raw AS (
  SELECT conv_id, turn_idx, {_SCRUBBED} AS stext
  FROM read_parquet('{tr_glob}')),
t AS (
  SELECT conv_id, turn_idx,
    length(stext) AS n_chars,
    len(regexp_extract_all(lower(stext), '{_TOK}')) AS n_tokens,
    len(list_distinct(regexp_extract_all(lower(stext), '{_TOK}')))
      AS n_distinct,
    len(regexp_extract_all(stext, '{_SYM}')) AS n_sym,
    CASE WHEN regexp_matches(lower(stext), '{_BP}') THEN 1 ELSE 0 END AS bp
  FROM raw),
q AS (
  SELECT conv_id, turn_idx,
    (LEAST(100, (100 * n_chars) // {CFG.min_len_chars})
     + (CASE WHEN n_tokens = 0 THEN 100
        ELSE (100 * n_distinct) // n_tokens END)
     + (CASE WHEN n_chars = 0 THEN 100
        ELSE 100 - LEAST(100, ({CFG.symbol_penalty_mult} * n_sym)
                              // n_chars) END)
     + (CASE WHEN bp = 1 THEN 0 ELSE 100 END)) // 4 AS overall
  FROM t)
SELECT conv_id,
  CAST(COUNT(*) AS BIGINT) AS n_turns,
  CAST(COUNT(*) FILTER (overall >= {CFG.keep_min_overall}) AS BIGINT)
    AS n_keep,
  CAST(SUM(overall) // COUNT(*) AS BIGINT) AS avg_quality,
  CAST(MIN(turn_idx) AS INTEGER) AS first_turn,
  CAST(MAX(turn_idx) AS INTEGER) AS last_turn
FROM q GROUP BY conv_id
""",
        # conversation-level quality gating: keep conversations whose
        # fraction of keep-quality turns reaches the milli threshold
        # (same heuristic-overall CTE as transcript_conv_heuristics)
        "kept_conversations": f"""
WITH raw AS (
  SELECT conv_id, turn_idx, {_SCRUBBED} AS stext
  FROM read_parquet('{tr_glob}')),
t AS (
  SELECT conv_id, turn_idx,
    length(stext) AS n_chars,
    len(regexp_extract_all(lower(stext), '{_TOK}')) AS n_tokens,
    len(list_distinct(regexp_extract_all(lower(stext), '{_TOK}')))
      AS n_distinct,
    len(regexp_extract_all(stext, '{_SYM}')) AS n_sym,
    CASE WHEN regexp_matches(lower(stext), '{_BP}') THEN 1 ELSE 0 END AS bp
  FROM raw),
q AS (
  SELECT conv_id, turn_idx,
    (LEAST(100, (100 * n_chars) // {CFG.min_len_chars})
     + (CASE WHEN n_tokens = 0 THEN 100
        ELSE (100 * n_distinct) // n_tokens END)
     + (CASE WHEN n_chars = 0 THEN 100
        ELSE 100 - LEAST(100, ({CFG.symbol_penalty_mult} * n_sym)
                              // n_chars) END)
     + (CASE WHEN bp = 1 THEN 0 ELSE 100 END)) // 4 AS overall
  FROM t),
c AS (
  SELECT conv_id,
    CAST(COUNT(*) AS BIGINT) AS n_turns,
    CAST(COUNT(*) FILTER (overall >= {CFG.keep_min_overall}) AS BIGINT)
      AS n_keep,
    CAST((COUNT(*) FILTER (overall >= {CFG.keep_min_overall}) * 1000)
         // COUNT(*) AS BIGINT) AS keep_frac_milli
  FROM q GROUP BY conv_id)
SELECT * FROM c WHERE keep_frac_milli >= {CONV_KEEP_FRAC_MILLI}
""",
        # fuzzy vocabulary matching: the oracle is the EXACT
        # levenshtein all-pairs join (affordable over the distinct
        # vocab); the pipeline's delete-1 blocking has exact recall at
        # distance 1 by construction
        "fuzzy_term_matches": f"""
WITH t AS (
  SELECT DISTINCT unnest(regexp_extract_all(lower(text), '[a-z]+'))
    AS term
  FROM read_parquet('{tr_glob}')),
f AS (SELECT term FROM t WHERE length(term) >= {CONV_FUZZY_MIN_LEN})
SELECT a.term AS term_a, b.term AS term_b
FROM f a JOIN f b ON a.term < b.term
WHERE levenshtein(a.term, b.term) = 1
""",
        # LAG + LEAD window pair: neighboring-turn context attachment
        "turn_context_windows": f"""
SELECT conv_id, turn_idx,
  COALESCE(lag(text) OVER (PARTITION BY conv_id ORDER BY turn_idx), '')
    AS prev_text,
  COALESCE(lead(text) OVER (PARTITION BY conv_id ORDER BY turn_idx), '')
    AS next_text
FROM read_parquet('{tr_glob}')
""",
        # The flagship near-dup surface, fully SQL-derived: tokens →
        # md5 hashes → 128 MinHash mins (limb-arithmetic mulmod) →
        # 32×4 band-slice self-join candidates → exact token-set
        # Jaccard verify at the same threshold, exact-dup pairs
        # excluded by content hash — mirroring stages/dedup.py
        # near_dup_pairs step for step. The "join" strategy variant is
        # output-identical (tested), so it shares the oracle — see the
        # post-dict aliasing below.
        "transcript_near_dup_pairs": f"""
WITH raw AS (
  SELECT concat(conv_id, '#', lpad(CAST(turn_idx AS VARCHAR), 8, '0'))
           AS order_key,
         {_SCRUBBED} AS stext
  FROM read_parquet('{tr_glob}')),
chash AS (
  SELECT order_key,
    md5(regexp_replace(
      regexp_replace(lower(stext), '{spec.EDGE_WS_PATTERN}', '', 'g'),
      '{spec.WS_PLUS_PATTERN}', ' ', 'g')) AS content_hash
  FROM raw),
tok AS (
  SELECT order_key,
    unnest(list_distinct(regexp_extract_all(lower(stext), '{_TOK}'))) AS t
  FROM raw),
th AS (SELECT order_key, md5_number_upper(t) AS h FROM tok),
cnt AS (SELECT order_key, COUNT(*) AS n FROM th GROUP BY 1),
perm(p, a, b) AS (VALUES
    {mh_perms}),
hu AS (SELECT DISTINCT h FROM th),
hperm AS (
  -- limb-arithmetic mulmod ONCE per (unique hash, perm) — the min
  -- aggregation below then only moves precomputed values
  SELECT h, p, {mh_mulmod} AS pv
  FROM hu CROSS JOIN perm),
mh AS (
  SELECT t.order_key, hp.p, MIN(hp.pv) AS m
  FROM th t JOIN hperm hp ON hp.h = t.h GROUP BY 1, 2),
band AS (
  SELECT order_key, p // {CFG.lsh_rows} AS band_id,
    {mh_band_vals}
  FROM mh GROUP BY 1, 2),
cand AS (
  SELECT DISTINCT a.order_key AS key_a, b.order_key AS key_b
  FROM band a JOIN band b
    ON a.band_id = b.band_id AND {mh_band_eq}
   AND a.order_key < b.order_key),
inter AS (
  SELECT c.key_a, c.key_b, COUNT(*) AS i
  FROM cand c
  JOIN th x ON x.order_key = c.key_a
  JOIN th y ON y.order_key = c.key_b AND y.h = x.h
  GROUP BY 1, 2),
scored AS (
  SELECT i.key_a, i.key_b,
    CAST(i.i AS DOUBLE) / (ca.n + cb.n - i.i) AS jaccard
  FROM inter i
  JOIN cnt ca ON ca.order_key = i.key_a
  JOIN cnt cb ON cb.order_key = i.key_b
  JOIN chash ha ON ha.order_key = i.key_a
  JOIN chash hb ON hb.order_key = i.key_b
  WHERE ha.content_hash <> hb.content_hash)
SELECT key_a, key_b, jaccard FROM scored
WHERE jaccard >= {CFG.near_dup_jaccard}
""",
        # DuckDB's native ASOF LEFT JOIN is the oracle for the custom
        # backward as-of operator; right side pre-aggregated to
        # max(event_id) per (user, ts) = the operator's tiebreak rule
        "asof_latest_error_per_event": """
WITH l AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type <> 'error'),
r AS (
  SELECT user_id, ts, max(event_id) AS error_event_id
  FROM events WHERE event_type = 'error' GROUP BY user_id, ts)
SELECT l.event_id, l.user_id, r.error_event_id,
  CAST(epoch_us(l.ts) - epoch_us(r.ts) AS BIGINT) AS us_since_error
FROM l ASOF LEFT JOIN r
  ON l.user_id = r.user_id AND r.ts <= l.ts
""",
        # windowed range join: count/sum of the same user's non-error
        # events in the 5 minutes up to each error (boundary t-W
        # exclusive, t inclusive)
        "events_near_errors": f"""
WITH e AS (
  SELECT event_id, user_id, epoch_us(ts) AS t
  FROM events WHERE event_type = 'error'),
x AS (
  SELECT user_id, epoch_us(ts) AS t,
    CAST(floor(value * 1000) AS BIGINT) AS v
  FROM events WHERE event_type <> 'error')
SELECT e.event_id AS error_event_id, e.user_id,
  CAST(COUNT(x.t) AS BIGINT) AS n_prior_events,
  CAST(COALESCE(SUM(x.v), 0) AS BIGINT) AS sum_value_milli
FROM e LEFT JOIN x
  ON x.user_id = e.user_id
 AND x.t > e.t - {M_RANGE_WINDOW_US} AND x.t <= e.t
GROUP BY 1, 2
""",
        # GLOBAL interval join: every event vs every error's ±60 s
        # window (any user) — events covered by >= 1 window, with the
        # covering-window count
        "events_in_error_bursts": """
WITH e AS (
  SELECT event_id, event_type, CAST(epoch_us(ts) AS BIGINT) AS tu
  FROM events),
w AS (
  SELECT tu - 60000000 AS lo, tu + 60000000 AS hi
  FROM e WHERE event_type = 'error')
SELECT e.event_id, e.event_type, CAST(COUNT(*) AS BIGINT) AS n_bursts
FROM e JOIN w ON e.tu >= w.lo AND e.tu <= w.hi
GROUP BY e.event_id, e.event_type
""",
        # window-function operator: running per-user cumulatives in
        # (ts, event_id) order
        "user_running_totals": """
SELECT event_id, user_id,
  CAST(row_number() OVER w AS BIGINT) AS cum_n,
  CAST(SUM(CAST(floor(value * 1000) AS BIGINT)) OVER
       (PARTITION BY user_id ORDER BY ts, event_id
        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_value_milli
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
        # telemetry debounce: keep rows with no same-(user, type)
        # predecessor within the window (LAG total order)
        "debounced_events": f"""
WITH g AS (
  SELECT event_id, user_id, event_type,
    epoch_us(ts) - lag(epoch_us(ts)) OVER
      (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS gap
  FROM events)
SELECT event_id, user_id, event_type,
  CAST(COALESCE(gap, -1) AS BIGINT) AS gap_us
FROM g WHERE gap IS NULL OR gap > {M_DEBOUNCE_US}
""",
        # retention triangle: integer epoch-day cohorts, distinct
        # active users per (cohort, offset)
        "user_retention_cohorts": """
WITH d AS (
  SELECT DISTINCT user_id,
    CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS day
  FROM events),
f AS (SELECT user_id, MIN(day) AS cohort_day FROM d GROUP BY 1)
SELECT CAST(f.cohort_day AS BIGINT) AS cohort_day,
  CAST(d.day - f.cohort_day AS BIGINT) AS day_offset,
  CAST(COUNT(*) AS BIGINT) AS n_users
FROM d JOIN f USING (user_id)
GROUP BY 1, 2
""",
        # broadcast semi-join: docs from the top-3 sources by count
        "docs_from_top_sources": f"""
SELECT doc_id, source FROM documents
WHERE source IN (
  SELECT source FROM documents GROUP BY source
  ORDER BY COUNT(*) DESC, source LIMIT {D_TOP_SOURCES_K})
""",
        # relational joins: money fixed-pointed to cents BEFORE the sum
        "orders_by_nation": """
SELECT n.n_name AS nation,
  CAST(COUNT(*) AS BIGINT) AS n_orders,
  CAST(SUM(CAST(floor(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
    AS total_price_cents
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
GROUP BY 1
""",
        "revenue_by_brand": """
SELECT p.p_brand AS brand,
  CAST(COUNT(*) AS BIGINT) AS n_items,
  CAST(SUM(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100)
                AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
GROUP BY 1
""",
        # C4-style GLOBAL sentence dedup: a sentence occurrence survives
        # iff it is the corpus-wide first (min (doc_id, sent_idx)) of
        # that trimmed sentence; grouping is by the md5-u64 sentence
        # hash on BOTH sides (identical semantics by construction)
        "global_sentence_dedup": f"""
WITH segs AS (
  SELECT doc_id,
    list_filter(list_transform(string_split(text, '.'),
                               x -> trim(x, ' ' || chr(9) || chr(13)
                                            || chr(10))),
                x -> x <> '') AS L
  FROM documents),
s AS (
  SELECT doc_id, unnest(L) AS sentence,
         generate_subscripts(L, 1) - 1 AS sent_idx
  FROM segs),
h AS (
  SELECT doc_id, sent_idx, sentence,
    md5_number_upper(sentence) AS hh,
    doc_id * {1 << SENT_IDX_BITS} + sent_idx AS packed
  FROM s),
w AS (SELECT hh, MIN(packed) AS win FROM h GROUP BY hh),
agg AS (
  SELECT h.doc_id,
    CAST(COUNT(*) AS BIGINT) AS n_sents,
    CAST(SUM(CASE WHEN h.packed = w.win THEN 1 ELSE 0 END) AS BIGINT)
      AS n_kept,
    COALESCE(string_agg(CASE WHEN h.packed = w.win THEN h.sentence END,
                        '. ' ORDER BY h.sent_idx), '') AS kept_text
  FROM h JOIN w ON w.hh = h.hh
  GROUP BY h.doc_id)
SELECT d.doc_id,
  COALESCE(a.n_sents, 0) AS n_sents,
  COALESCE(a.n_kept, 0) AS n_kept,
  COALESCE(a.kept_text, '') AS kept_text
FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id
""",
        # the feature-hash embedder's deterministic front half:
        # truncate(8000 chars) -> lower -> tokenize -> md5-u64 hash ->
        # mod-HASH_BUCKETS -> per-(doc,bucket) term frequency
        "doc_token_buckets": f"""
SELECT doc_id,
  CAST(md5_number_upper(t) % {EMB_HASH_BUCKETS} AS BIGINT) AS bucket,
  CAST(COUNT(*) AS BIGINT) AS tf
FROM (
  SELECT doc_id,
    unnest(regexp_extract_all(lower(substr(text, 1, 8000)), '{_TOK}'))
      AS t
  FROM documents)
GROUP BY 1, 2
""",
        # the full feature-hash embedder replayed in SQL: exact int64
        # tf×weight accumulation (md5-derived integer weights), one
        # sqrt+divide from exact integers, round-6 — token-less docs
        # are all-zero rows via the doc×dim grid
        "doc_embedding_values": f"""
WITH tb AS (
  SELECT doc_id,
    CAST(md5_number_upper(t) % {EMB_HASH_BUCKETS} AS BIGINT) AS bucket,
    CAST(COUNT(*) AS BIGINT) AS tf
  FROM (
    SELECT doc_id,
      unnest(regexp_extract_all(lower(substr(text, 1, 8000)), '{_TOK}'))
        AS t
    FROM documents)
  GROUP BY 1, 2),
proj AS (
  SELECT b.range AS bucket, d.range AS dim,
    CAST(md5_number_upper('proj:' || b.range || ':' || d.range)
         % {2 * EMB_PROJ_Q + 1} AS BIGINT) - {EMB_PROJ_Q} AS w
  FROM range(0, {EMB_HASH_BUCKETS}) b
  CROSS JOIN range(0, {EMB_DIM}) d),
acc AS (
  SELECT tb.doc_id, proj.dim, SUM(tb.tf * proj.w) AS a
  FROM tb JOIN proj USING (bucket) GROUP BY 1, 2),
nrm AS (SELECT doc_id, SUM(a * a) AS nsq FROM acc GROUP BY 1),
grid AS (
  SELECT doc_id, d.range AS dim
  FROM documents CROSS JOIN range(0, {EMB_DIM}) d)
SELECT g.doc_id, CAST(g.dim AS BIGINT) AS dim,
  CASE WHEN COALESCE(n.nsq, 0) = 0 THEN 0.0
       ELSE round(a.a / sqrt(CAST(n.nsq AS DOUBLE)), 6) END AS val
FROM grid g
LEFT JOIN acc a ON a.doc_id = g.doc_id AND a.dim = g.dim
LEFT JOIN nrm n ON n.doc_id = g.doc_id
""",
        # per-source mean embedding over the embedder's exact int64
        # accumulators; centroid_milli uses DuckDB's truncating //,
        # mirrored sign-aware on the Ray side
        "source_embedding_centroids": f"""
WITH tb AS (
  SELECT doc_id,
    CAST(md5_number_upper(t) % {EMB_HASH_BUCKETS} AS BIGINT) AS bucket,
    CAST(COUNT(*) AS BIGINT) AS tf
  FROM (
    SELECT doc_id,
      unnest(regexp_extract_all(lower(substr(text, 1, 8000)), '{_TOK}'))
        AS t
    FROM documents)
  GROUP BY 1, 2),
proj AS (
  SELECT b.range AS bucket, d.range AS dim,
    CAST(md5_number_upper('proj:' || b.range || ':' || d.range)
         % {2 * EMB_PROJ_Q + 1} AS BIGINT) - {EMB_PROJ_Q} AS w
  FROM range(0, {EMB_HASH_BUCKETS}) b
  CROSS JOIN range(0, {EMB_DIM}) d),
acc AS (
  SELECT tb.doc_id, proj.dim, SUM(tb.tf * proj.w) AS a
  FROM tb JOIN proj USING (bucket) GROUP BY 1, 2),
cnt AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM documents GROUP BY 1),
sums AS (
  SELECT d.source, a.dim, CAST(SUM(a.a) AS BIGINT) AS sa
  FROM acc a JOIN documents d USING (doc_id) GROUP BY 1, 2),
grid AS (
  SELECT source, n_docs, dm.range AS dim
  FROM cnt CROSS JOIN range(0, {EMB_DIM}) dm)
SELECT g.source, CAST(g.dim AS BIGINT) AS dim, g.n_docs,
  CAST(COALESCE(s.sa, 0) AS BIGINT) AS sum_acc,
  CAST((COALESCE(s.sa, 0) * 1000) // g.n_docs AS BIGINT)
    AS centroid_milli
FROM grid g
LEFT JOIN sums s ON s.source = g.source AND s.dim = g.dim
""",
        # per-(role, tool) usage aggregate with an exact distinct-conv
        # count (two-phase distinct on the Ray side)
        "role_tool_stats": f"""
SELECT role, tool,
  CAST(COUNT(*) AS BIGINT) AS n_turns,
  CAST(COUNT(DISTINCT conv_id) AS BIGINT) AS n_convs,
  CAST(SUM(length(text)) AS BIGINT) AS sum_chars
FROM read_parquet('{tr_glob}')
GROUP BY 1, 2
""",
        # time-windowed exact dedup: LAG gap within content-hash
        # groups ((ts, conv, turn) total order); empty-normalized
        # turns are never duplicates
        "windowed_turn_dedup": f"""
WITH n AS (
  SELECT conv_id, turn_idx, ts,
    regexp_replace(regexp_replace(lower(text),
      '{spec.EDGE_WS_PATTERN}', '', 'g'),
      '{spec.WS_PLUS_PATTERN}', ' ', 'g') AS s
  FROM read_parquet('{tr_glob}')),
h AS (
  SELECT conv_id, turn_idx, epoch_us(ts) AS ts_us,
    CASE WHEN length(s) = 0 THEN NULL ELSE md5(s) END AS ch
  FROM n),
w AS (
  SELECT conv_id, turn_idx,
    CASE WHEN ch IS NULL THEN FALSE
    ELSE COALESCE(ts_us - LAG(ts_us) OVER (
           PARTITION BY ch
           ORDER BY ts_us, conv_id, turn_idx)
         <= {CONV_TURN_DEDUP_WINDOW_US}, FALSE) END AS is_dup
  FROM h)
SELECT conv_id, turn_idx, is_dup FROM w
""",
        # frequency-capped boilerplate-turn removal (CCNet/Dolma rule):
        # non-empty normalized text in > cap DISTINCT conversations →
        # ALL occurrences flagged; NULL text behaves like empty (flag 0)
        "conv_boilerplate_turns": f"""
WITH n AS (
  SELECT conv_id,
    regexp_replace(regexp_replace(lower(text),
      '{spec.EDGE_WS_PATTERN}', '', 'g'),
      '{spec.WS_PLUS_PATTERN}', ' ', 'g') AS s
  FROM read_parquet('{tr_glob}')),
g AS (
  SELECT s, COUNT(DISTINCT conv_id) AS nc
  FROM n WHERE length(s) > 0 GROUP BY s),
f AS (
  SELECT n.conv_id,
    CASE WHEN length(n.s) > 0 AND g.nc > {BOILER_CONV_CAP}
         THEN 1 ELSE 0 END AS fl
  FROM n LEFT JOIN g ON g.s = n.s)
SELECT conv_id,
  CAST(COUNT(*) AS BIGINT) AS n_turns,
  CAST(SUM(fl) AS BIGINT) AS n_boiler,
  CAST((1000 * SUM(fl)) // COUNT(*) AS BIGINT) AS boiler_permille
FROM f GROUP BY conv_id
""",
        # tool-call latency histogram: LAG within conversation,
        # exact bit-length buckets of the microsecond gap
        "tool_latency_histogram": f"""
WITH o AS (
  SELECT conv_id, turn_idx, role, tool, epoch_us(ts) AS ts_us,
    LAG(role) OVER w AS prev_role,
    LAG(epoch_us(ts)) OVER w AS prev_ts
  FROM read_parquet('{tr_glob}')
  WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)),
g AS (
  SELECT tool, ts_us - prev_ts AS gap FROM o
  WHERE role = 'tool' AND prev_role = 'assistant'),
b AS (
  SELECT tool,
    CAST(CASE WHEN gap <= 0 THEN 0
         ELSE length(printf('%b', gap)) END AS BIGINT) AS gap_bucket
  FROM g)
SELECT tool, gap_bucket, CAST(COUNT(*) AS BIGINT) AS n_calls
FROM b GROUP BY tool, gap_bucket
""",
        # per-conversation PII exposure: sequential rule counting
        # (each rule counts on the text AFTER earlier replacements,
        # identical to stages/scrub.scrub_batch)
        "conv_pii_stats": f"""
WITH t AS (
  SELECT conv_id,
    len(regexp_extract_all(COALESCE(text, ''), '{_EMAIL}')) AS e,
    len(regexp_extract_all(regexp_replace(COALESCE(text, ''),
        '{_EMAIL}', '<EMAIL>', 'g'), '{_SSN}')) AS s,
    len(regexp_extract_all(regexp_replace(regexp_replace(
        COALESCE(text, ''), '{_EMAIL}', '<EMAIL>', 'g'),
        '{_SSN}', '<SSN>', 'g'), '{_PHONE}')) AS p
  FROM read_parquet('{tr_glob}'))
SELECT conv_id,
  CAST(SUM(e) AS BIGINT) AS n_email,
  CAST(SUM(p) AS BIGINT) AS n_phone,
  CAST(SUM(s) AS BIGINT) AS n_ssn,
  CAST(SUM(CASE WHEN e + p + s > 0 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_pii_turns
FROM t GROUP BY conv_id
""",
        # dataset-card length profile by role: exact discrete
        # quantiles (quantile_disc rule sorted[ceil(q*n)-1])
        "role_length_profile": f"""
WITH t AS (
  SELECT role,
    CAST(length(COALESCE(text, '')) AS BIGINT) AS l
  FROM read_parquet('{tr_glob}'))
SELECT role,
  CAST(COUNT(*) AS BIGINT) AS n_turns,
  CAST(quantile_disc(l, 0.5) AS BIGINT) AS med_len,
  CAST(quantile_disc(l, 0.9) AS BIGINT) AS p90_len,
  CAST(MAX(l) AS BIGINT) AS max_len
FROM t GROUP BY role
""",
        # removal surface of the boilerplate rule: raw text of
        # surviving turns, newline-joined in turn order
        "conv_boilerplate_removed_docs": f"""
WITH n AS (
  SELECT conv_id, turn_idx, COALESCE(text, '') AS raw,
    regexp_replace(regexp_replace(lower(text),
      '{spec.EDGE_WS_PATTERN}', '', 'g'),
      '{spec.WS_PLUS_PATTERN}', ' ', 'g') AS s
  FROM read_parquet('{tr_glob}')),
g AS (
  SELECT s, COUNT(DISTINCT conv_id) AS nc
  FROM n WHERE length(s) > 0 GROUP BY s),
f AS (
  SELECT n.conv_id, n.turn_idx, n.raw,
    NOT (length(n.s) > 0 AND COALESCE(g.nc, 0) > {BOILER_CONV_CAP})
      AS keep
  FROM n LEFT JOIN g ON g.s = n.s)
SELECT conv_id,
  CAST(COUNT(*) AS BIGINT) AS n_turns,
  CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
  COALESCE(string_agg(CASE WHEN keep THEN raw END, chr(10)
                      ORDER BY turn_idx), '') AS kept_text
FROM f GROUP BY conv_id
""",
        # dialog completeness: trailing turns after the last
        # assistant turn (no assistant turn -> all turns trail)
        "conv_ending_audit": f"""
WITH la AS (
  SELECT conv_id,
    max_by(role, turn_idx) AS last_role,
    MAX(CASE WHEN role = 'assistant' THEN turn_idx END) AS last_asst
  FROM read_parquet('{tr_glob}') GROUP BY conv_id)
SELECT t.conv_id, la.last_role,
  CAST(SUM(CASE WHEN t.turn_idx > COALESCE(la.last_asst, -1)
            THEN 1 ELSE 0 END) AS BIGINT) AS n_trailing,
  SUM(CASE WHEN t.turn_idx > COALESCE(la.last_asst, -1)
      THEN 1 ELSE 0 END) = 0 AS ends_with_assistant
FROM read_parquet('{tr_glob}') t
JOIN la ON la.conv_id = t.conv_id
GROUP BY t.conv_id, la.last_role
""",
        # system-prompt census: normalized system turns grouped by md5
        "system_prompt_census": f"""
WITH n AS (
  SELECT conv_id,
    md5(regexp_replace(regexp_replace(lower(COALESCE(text, '')),
      '{spec.EDGE_WS_PATTERN}', '', 'g'),
      '{spec.WS_PLUS_PATTERN}', ' ', 'g')) AS sys_hash
  FROM read_parquet('{tr_glob}') WHERE role = 'system')
SELECT sys_hash,
  CAST(COUNT(DISTINCT conv_id) AS BIGINT) AS n_convs,
  CAST(COUNT(*) AS BIGINT) AS n_turns,
  MIN(conv_id) AS canonical_conv_id
FROM n GROUP BY sys_hash
""",
        # SFT loss-mask audit: whitespace-token mass per role,
        # trainable fraction in exact permille
        "conv_loss_mask_stats": f"""
WITH t AS (
  SELECT conv_id, role,
    len(regexp_extract_all(COALESCE(text, ''),
                           '{spec.WS_TOKEN_PATTERN}')) AS ws
  FROM read_parquet('{tr_glob}'))
SELECT conv_id,
  CAST(COUNT(*) AS BIGINT) AS n_turns,
  CAST(SUM(ws) AS BIGINT) AS total_ws_tokens,
  CAST(SUM(CASE WHEN role = 'assistant' THEN ws ELSE 0 END) AS BIGINT)
    AS assistant_ws_tokens,
  CASE WHEN SUM(ws) > 0
       THEN CAST((1000 * SUM(CASE WHEN role = 'assistant' THEN ws
                             ELSE 0 END)) // SUM(ws) AS BIGINT)
       ELSE -1 END AS trainable_permille
FROM t GROUP BY conv_id
""",
        # robust turn-length outliers: LOWER medians (quantile_disc ==
        # polars 'lower' interpolation, pinned by test) + MAD gate with
        # an absolute floor for the mad == 0 degenerate case
        "conv_length_outliers": f"""
WITH t AS (
  SELECT conv_id, CAST(length(COALESCE(text, '')) AS BIGINT) AS l
  FROM read_parquet('{tr_glob}')),
m AS (SELECT conv_id, quantile_disc(l, 0.5) AS med
      FROM t GROUP BY conv_id),
d AS (SELECT t.conv_id, t.l, m.med, abs(t.l - m.med) AS dev
      FROM t JOIN m USING (conv_id)),
m2 AS (SELECT conv_id, quantile_disc(dev, 0.5) AS mad
       FROM d GROUP BY conv_id)
SELECT d.conv_id,
  CAST(MIN(d.med) AS BIGINT) AS med_len,
  CAST(MIN(m2.mad) AS BIGINT) AS mad_len,
  CAST(SUM(CASE WHEN d.dev > {LEN_OUTLIER_MAD_MULT} * m2.mad
                 AND d.dev > {LEN_OUTLIER_ABS_FLOOR}
            THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM d JOIN m2 ON m2.conv_id = d.conv_id GROUP BY d.conv_id
""",
        # dialog-structure mining: turn-ordered role sequence per
        # conversation (string_agg ORDER BY), counted per pattern
        "conv_role_patterns": f"""
WITH p AS (
  SELECT conv_id,
    string_agg(role, ',' ORDER BY turn_idx) AS role_pattern
  FROM read_parquet('{tr_glob}') GROUP BY conv_id)
SELECT role_pattern, CAST(COUNT(*) AS BIGINT) AS n_convs
FROM p GROUP BY 1
""",
        # dialog balance: assistant-to-user char-volume ratio per
        # conversation (integer milli; -1 when no user text)
        "conv_response_ratio": f"""
WITH g AS (
  SELECT conv_id,
    CAST(SUM(CASE WHEN role = 'assistant' THEN length(text)
             ELSE 0 END) AS BIGINT) AS assistant_chars,
    CAST(SUM(CASE WHEN role = 'user' THEN length(text)
             ELSE 0 END) AS BIGINT) AS user_chars
  FROM read_parquet('{tr_glob}') GROUP BY conv_id)
SELECT conv_id, assistant_chars, user_chars,
  CAST(CASE WHEN user_chars > 0
       THEN assistant_chars * 1000 // user_chars
       ELSE -1 END AS BIGINT) AS ratio_milli
FROM g
""",
        # per-conversation majority language: the per-turn langid
        # fragment (shared _langid_parts) + a windowed majority vote
        # with the Ray side's exact tie-break (n DESC, lang asc)
        "conv_lang_majority": f"""
WITH t AS (
  SELECT conv_id,
    regexp_extract_all(lower(text), '{_TOK}') AS toks
  FROM read_parquet('{tr_glob}')),
c AS (SELECT conv_id, {lid_counts} FROM t),
per AS (SELECT conv_id, {lid_case} AS pred_lang FROM c),
cnt AS (
  SELECT conv_id, pred_lang, CAST(COUNT(*) AS BIGINT) AS n
  FROM per GROUP BY 1, 2),
win AS (
  SELECT conv_id, pred_lang, n,
    SUM(n) OVER (PARTITION BY conv_id) AS n_turns,
    row_number() OVER (
      PARTITION BY conv_id ORDER BY n DESC, pred_lang) AS rn
  FROM cnt)
SELECT conv_id, pred_lang AS majority_lang,
  n AS n_majority, CAST(n_turns AS BIGINT) AS n_turns
FROM win WHERE rn = 1
""",
        # Deequ-style analyzers over the transcript table, generated
        # from the pipelines.profiling registries/constants
        "transcript_column_profile": _profile_oracle_sql(tr_glob),
        "transcript_column_profile_hll": _profile_hll_oracle_sql(tr_glob),
        "transcript_constraint_checks": _constraint_oracle_sql(tr_glob),
        # exact heavy hitters: the sketch is only a prefilter on the
        # Ray side (over-estimate ⇒ exact recall), so the oracle is
        # the plain full-vocabulary GROUP BY with the HAVING threshold
        "transcript_heavy_hitters": f"""
WITH t AS (
  SELECT unnest(regexp_extract_all(lower(text), '{_TOK}')) AS term
  FROM read_parquet('{tr_glob}'))
SELECT term, CAST(COUNT(*) AS BIGINT) AS cf
FROM t GROUP BY term
HAVING COUNT(*) >= GREATEST(1,
  (SELECT COUNT(*) FROM read_parquet('{tr_glob}')) // {HH_MIN_DIV})
""",
        # adjacent-pair statistics (one BPE merge round): list lateral
        # expansion, deterministic tie-break (cf DESC, a, b)
        "token_bigram_merges": f"""
WITH t AS (
  SELECT regexp_extract_all(lower(text), '{_TOK}') AS ts
  FROM read_parquet('{tr_glob}')),
p AS (
  SELECT unnest(list_transform(generate_series(1, len(ts) - 1),
                i -> struct_pack(a := ts[i], b := ts[i + 1]))) AS pr
  FROM t)
SELECT pr.a AS a, pr.b AS b, CAST(COUNT(*) AS BIGINT) AS cf
FROM p GROUP BY 1, 2
ORDER BY cf DESC, a, b
LIMIT {BIGRAM_TOP_K}
""",
        # per-turn corpus-unique token counts: uniqueness decided on
        # md5_number_upper(term) == spec.token_hash_u64, so hash
        # collisions merge identically on both engines; the MIN over a
        # COUNT(*)=1 group is the group's single row
        "transcript_rare_tokens": f"""
WITH t AS (
  SELECT conv_id, turn_idx,
    unnest(regexp_extract_all(lower(text), '{_TOK}')) AS term
  FROM read_parquet('{tr_glob}')),
h AS (
  SELECT conv_id, turn_idx, md5_number_upper(term) AS hh FROM t),
u AS (
  SELECT hh, MIN(conv_id) AS conv_id, MIN(turn_idx) AS turn_idx
  FROM h GROUP BY hh HAVING COUNT(*) = 1)
SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx,
  CAST(COUNT(*) AS BIGINT) AS n_rare
FROM u GROUP BY 1, 2
""",
        # snapshot reconciliation over the deterministic v2 synthesis
        # (same three rules as pipelines.documents constants)
        "corpus_snapshot_diff": f"""
WITH v1 AS (SELECT doc_id, text FROM documents),
v2 AS (
  SELECT doc_id,
    CASE WHEN doc_id % {DIFF_CHANGED_MOD} = 3 THEN text || ' v2'
         ELSE text END AS text
  FROM documents WHERE doc_id % {DIFF_REMOVED_MOD} <> 0
  UNION ALL
  SELECT doc_id + {DIFF_ADDED_OFFSET}, text || ' new'
  FROM documents WHERE doc_id % {DIFF_ADDED_MOD} = 1)
SELECT COALESCE(v1.doc_id, v2.doc_id) AS doc_id,
  CASE WHEN v1.doc_id IS NULL THEN 'added'
       WHEN v2.doc_id IS NULL THEN 'removed'
       WHEN v1.text = v2.text THEN 'unchanged'
       ELSE 'changed' END AS status
FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
""",
        # temperature-0.5 mixing weights: IEEE sqrt is correctly
        # rounded, so floor(sqrt(int)) is engine-exact; ppm division
        # is integer
        "source_mixture_weights": """
WITH a AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_chars) AS BIGINT) AS sum_chars
  FROM documents GROUP BY 1),
s AS (SELECT *, CAST(floor(sqrt(sum_chars * 1000000.0)) AS BIGINT)
        AS sq FROM a)
SELECT source, n_docs, sum_chars,
  CAST(sq * 1000000 // GREATEST((SELECT SUM(sq) FROM s), 1)
       AS BIGINT) AS weight_ppm
FROM s ORDER BY source
""",
        # largest-remainder apportionment of the doc budget over the
        # sqrt weights — rank remainders (DESC, source asc) in SQL,
        # +1 for the first (B - Σbase) of them
        "mixture_allocation_plan": f"""
WITH a AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_chars) AS BIGINT) AS sum_chars
  FROM documents GROUP BY 1),
s AS (SELECT *, CAST(floor(sqrt(sum_chars * 1000000.0)) AS BIGINT)
        AS sq FROM a),
t AS (SELECT *, GREATEST((SELECT SUM(sq) FROM s), 1) AS tot FROM s),
q AS (
  SELECT source, n_docs,
    ({MIXTURE_BUDGET_DOCS} * sq) // tot AS base,
    ({MIXTURE_BUDGET_DOCS} * sq) % tot AS rem
  FROM t),
r AS (
  SELECT *,
    row_number() OVER (ORDER BY rem DESC, source) AS rk,
    {MIXTURE_BUDGET_DOCS} - (SELECT SUM(base) FROM q) AS leftover
  FROM q)
SELECT source, n_docs,
  CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT)
    AS alloc_docs
FROM r
""",
        # two-sample KS drift: integer-milli CDF gap between the two
        # timeline halves, evaluated on the union of observed bins
        # (the sup of a step-CDF difference is attained at a jump)
        "event_value_drift": f"""
WITH b AS (
  SELECT (MIN(epoch_us(ts) // {_DRIFT_DAY_US})
        + MAX(epoch_us(ts) // {_DRIFT_DAY_US}) + 1) // 2 AS split
  FROM events),
e AS (
  SELECT event_type,
    CASE WHEN epoch_us(ts) // {_DRIFT_DAY_US} < b.split
         THEN 0 ELSE 1 END AS side,
    LEAST(GREATEST(CAST(floor(value * {DRIFT_BIN_SCALE}) AS BIGINT),
                   0), {DRIFT_BINS - 1}) AS bin
  FROM events, b),
g AS (
  SELECT event_type, bin,
    SUM(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS ca,
    SUM(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS cb
  FROM e GROUP BY 1, 2),
w AS (
  SELECT event_type,
    SUM(ca) OVER (PARTITION BY event_type ORDER BY bin) AS cuma,
    SUM(cb) OVER (PARTITION BY event_type ORDER BY bin) AS cumb,
    SUM(ca) OVER (PARTITION BY event_type) AS ta,
    SUM(cb) OVER (PARTITION BY event_type) AS tb
  FROM g)
SELECT event_type,
  CAST(MAX(ta) AS BIGINT) AS n_first,
  CAST(MAX(tb) AS BIGINT) AS n_second,
  CAST(CASE WHEN MAX(ta) = 0 OR MAX(tb) = 0 THEN 1000
       ELSE MAX(ABS(cuma * 1000 // ta - cumb * 1000 // tb))
       END AS BIGINT) AS d_milli
FROM w GROUP BY 1
""",
        # LAG window function: per-turn inter-arrival gap within the
        # conversation (first turn -> -1)
        "conv_turn_gaps": f"""
SELECT conv_id, turn_idx,
  CAST(COALESCE(epoch_us(ts) - lag(epoch_us(ts)) OVER
       (PARTITION BY conv_id ORDER BY turn_idx), -1) AS BIGINT)
    AS gap_us
FROM read_parquet('{tr_glob}')
""",
        # per-conversation dialog-structure validation (LAG window
        # comparisons → per-conv violation counters)
        "conv_structure_violations": f"""
WITH o AS (
  SELECT conv_id, turn_idx, role, epoch_us(ts) AS ts_us,
    lag(role) OVER w AS prev_role,
    lag(epoch_us(ts)) OVER w AS prev_ts,
    lag(turn_idx) OVER w AS prev_idx,
    row_number() OVER w AS rn
  FROM read_parquet('{tr_glob}')
  WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)),
v AS (
  SELECT conv_id,
    CAST(SUM(CASE WHEN rn = 1 AND role NOT IN ('user', 'system')
             THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_start,
    CAST(SUM(CASE WHEN prev_role IS NOT NULL AND role = prev_role
             THEN 1 ELSE 0 END) AS BIGINT) AS n_role_repeat,
    CAST(SUM(CASE WHEN role = 'tool'
                   AND (prev_role IS NULL OR prev_role <> 'assistant')
             THEN 1 ELSE 0 END) AS BIGINT) AS n_orphan_tool,
    CAST(SUM(CASE WHEN prev_ts IS NOT NULL AND ts_us < prev_ts
             THEN 1 ELSE 0 END) AS BIGINT) AS n_ts_regress,
    CAST(SUM(CASE WHEN (rn = 1 AND turn_idx <> 0)
                    OR (prev_idx IS NOT NULL
                        AND turn_idx <> prev_idx + 1)
             THEN 1 ELSE 0 END) AS BIGINT) AS n_idx_gaps
  FROM o GROUP BY conv_id)
SELECT *,
  CASE WHEN n_bad_start + n_role_repeat + n_orphan_tool
            + n_ts_regress + n_idx_gaps = 0
       THEN 1 ELSE 0 END AS is_valid
FROM v
""",
        # per-conversation context-window accounting: inclusive prefix
        # sum of text length in turn order vs a fixed char budget
        "conv_context_budget": f"""
WITH c AS (
  SELECT conv_id, turn_idx, length(text) AS len,
    SUM(length(text)) OVER (PARTITION BY conv_id ORDER BY turn_idx
                            ROWS UNBOUNDED PRECEDING) AS cum
  FROM read_parquet('{tr_glob}'))
SELECT conv_id,
  CAST(COUNT(*) AS BIGINT) AS n_turns,
  CAST(SUM(len) AS BIGINT) AS total_chars,
  CAST(COUNT(*) FILTER (cum <= {CONV_CONTEXT_BUDGET}) AS BIGINT)
    AS fit_turns,
  CAST(COALESCE(MIN(turn_idx)
                FILTER (cum > {CONV_CONTEXT_BUDGET}), -1) AS BIGINT)
    AS truncate_turn_idx
FROM c GROUP BY conv_id
""",
        # agent-loop detection: a turn is an echo when its exact text
        # appeared at an earlier turn of the same conversation
        "conv_loop_turns": f"""
WITH r AS (
  SELECT conv_id, turn_idx,
    row_number() OVER (PARTITION BY conv_id, text
                       ORDER BY turn_idx) AS k
  FROM read_parquet('{tr_glob}'))
SELECT conv_id,
  CAST(COUNT(*) AS BIGINT) AS n_turns,
  CAST(COUNT(*) FILTER (k > 1) AS BIGINT) AS n_echo_turns,
  CAST(COALESCE(MIN(turn_idx) FILTER (k > 1), -1) AS BIGINT)
    AS first_echo_idx
FROM r GROUP BY conv_id
""",
        # markdown / code-structure audit: pinned trim charset,
        # literal prefix tests (LIKE), replace-length literal counts;
        # fence_balanced = even number of fence-delimiter lines
        "conv_markdown_stats": f"""
WITH t AS (
  SELECT conv_id, COALESCE(text, '') AS text,
    list_transform(string_split(COALESCE(text, ''), chr(10)),
      x -> trim(x, ' ' || chr(9) || chr(13) || chr(10))) AS ls
  FROM read_parquet('{tr_glob}')),
p AS (
  SELECT conv_id,
    CAST(len(list_filter(ls, x -> x LIKE '```%')) AS BIGINT) AS fence,
    CAST(len(list_filter(ls, x -> regexp_matches(x, '^#'))) AS BIGINT)
      AS heading,
    CAST(len(list_filter(ls, x -> regexp_matches(x, '^[-*+] ')))
         AS BIGINT) AS bullet,
    CAST(len(list_filter(ls, x -> x LIKE '|%')) AS BIGINT) AS tbl,
    CAST((length(text) - length(replace(text, '](', ''))) // 2
         AS BIGINT) AS links,
    CAST(length(text) - length(replace(text, '`', '')) AS BIGINT)
      AS ticks
  FROM t)
SELECT conv_id,
  CAST(COUNT(*) AS BIGINT) AS n_turns,
  CAST(SUM(fence) AS BIGINT) AS n_fence_lines,
  CASE WHEN SUM(fence) % 2 = 0 THEN 1 ELSE 0 END AS fence_balanced,
  CAST(SUM(heading) AS BIGINT) AS n_heading_lines,
  CAST(SUM(bullet) AS BIGINT) AS n_bullet_lines,
  CAST(SUM(tbl) AS BIGINT) AS n_table_lines,
  CAST(SUM(links) AS BIGINT) AS n_links,
  CAST(SUM(ticks) AS BIGINT) AS n_backticks
FROM p GROUP BY conv_id
""",
        # distinct-token Jaccard between consecutive turns of a
        # conversation (integer milli; -1 on an empty side; turn 0
        # excluded — it has no predecessor)
        "turn_echo_jaccard": f"""
WITH t AS (
  SELECT conv_id, turn_idx,
    list_distinct(regexp_extract_all(lower(text), '{_TOK}')) AS toks
  FROM read_parquet('{tr_glob}')),
o AS (
  SELECT conv_id, turn_idx, toks,
    lag(toks) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev
  FROM t)
SELECT conv_id, turn_idx,
  CASE WHEN len(toks) > 0 AND len(prev) > 0
       THEN CAST((1000 * len(list_intersect(toks, prev)))
                 // (len(toks) + len(prev)
                     - len(list_intersect(toks, prev))) AS BIGINT)
       ELSE -1 END AS jaccard_milli
FROM o WHERE prev IS NOT NULL
""",
        # inactivity-based sessionization within conversations: a new
        # session when the gap to the previous turn exceeds the frozen
        # SESSION_GAP_US threshold
        "conv_session_splits": f"""
WITH g AS (
  SELECT conv_id, turn_idx,
    CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
              OVER (PARTITION BY conv_id ORDER BY turn_idx)
              > {CONV_SESSION_GAP_US}
         THEN 1 ELSE 0 END AS newsess
  FROM read_parquet('{tr_glob}')),
s AS (
  SELECT conv_id,
    SUM(newsess) OVER (PARTITION BY conv_id ORDER BY turn_idx
                       ROWS UNBOUNDED PRECEDING) AS sid
  FROM g),
per_sess AS (
  SELECT conv_id, sid, CAST(COUNT(*) AS BIGINT) AS n
  FROM s GROUP BY conv_id, sid)
SELECT conv_id,
  CAST(SUM(n) AS BIGINT) AS n_turns,
  CAST(COUNT(*) AS BIGINT) AS n_sessions,
  CAST(MAX(n) AS BIGINT) AS max_session_turns
FROM per_sess GROUP BY conv_id
""",
        # template-opener dedup: conversations grouped by the md5 of
        # their first-K-turn text (unit-separator-joined in turn
        # order, null text as '')
        "conv_prefix_dup_groups": f"""
WITH p AS (
  SELECT conv_id,
    md5(string_agg(coalesce(text, ''), chr(31) ORDER BY turn_idx))
      AS prefix_hash
  FROM read_parquet('{tr_glob}')
  WHERE turn_idx < {CONV_PREFIX_K}
  GROUP BY conv_id),
g AS (
  SELECT prefix_hash, CAST(COUNT(*) AS BIGINT) AS group_size
  FROM p GROUP BY prefix_hash)
SELECT p.conv_id, p.prefix_hash, g.group_size,
  CASE WHEN g.group_size > 1 THEN 1 ELSE 0 END AS is_prefix_dup
FROM p JOIN g USING (prefix_hash)
""",
        # agent-trajectory Markov counts: consecutive-turn transitions
        # over role/tool kinds within each conversation
        "tool_transition_stats": f"""
WITH o AS (
  SELECT conv_id,
    CASE WHEN role = 'tool' THEN 'tool:' || coalesce(tool, '')
         ELSE role END AS kind,
    lag(CASE WHEN role = 'tool' THEN 'tool:' || coalesce(tool, '')
             ELSE role END)
      OVER (PARTITION BY conv_id ORDER BY turn_idx) AS from_kind
  FROM read_parquet('{tr_glob}'))
SELECT from_kind, kind AS to_kind,
  CAST(COUNT(*) AS BIGINT) AS n_transitions
FROM o WHERE from_kind IS NOT NULL
GROUP BY from_kind, kind
""",
        # lexical diversity per conversation+role: total and distinct
        # lowercased TOKEN_PATTERN tokens, integer milli TTR
        "conv_ttr_stats": f"""
WITH t AS (
  SELECT conv_id, role,
    regexp_extract_all(lower(coalesce(text, '')), '{_TOK}') AS toks
  FROM read_parquet('{tr_glob}')),
base AS (
  SELECT conv_id, role, CAST(SUM(len(toks)) AS BIGINT) AS n_tokens
  FROM t GROUP BY conv_id, role),
d AS (
  SELECT conv_id, role, CAST(COUNT(DISTINCT tok) AS BIGINT)
    AS n_distinct
  FROM t, unnest(toks) AS u(tok) GROUP BY conv_id, role)
SELECT base.conv_id, base.role, base.n_tokens,
  COALESCE(d.n_distinct, 0) AS n_distinct_tokens,
  CASE WHEN base.n_tokens > 0
       THEN 1000 * COALESCE(d.n_distinct, 0) // base.n_tokens
       ELSE -1 END AS ttr_milli
FROM base LEFT JOIN d USING (conv_id, role)
""",
        # FULL OUTER JOIN reconciliation: every row of both sides
        # survives with a match-status tag
        "customer_event_reconciliation": """
WITH ev AS (
  SELECT user_id AS key, CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1),
cu AS (SELECT CAST(c_custkey AS BIGINT) AS key, c_mktsegment
       FROM customer)
SELECT COALESCE(cu.key, ev.key) AS key,
  CASE WHEN cu.key IS NOT NULL AND ev.key IS NOT NULL THEN 'both'
       WHEN cu.key IS NOT NULL THEN 'customer_only'
       ELSE 'events_only' END AS match_status,
  COALESCE(ev.n_events, 0) AS n_events,
  COALESCE(cu.c_mktsegment, '') AS mktsegment
FROM cu FULL OUTER JOIN ev ON cu.key = ev.key
""",
        # set-valued aggregation: sorted distinct event types per user
        "user_event_type_sets": """
SELECT user_id,
  string_agg(DISTINCT event_type, ',' ORDER BY event_type)
    AS event_types,
  CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types
FROM events GROUP BY user_id
""",
        # first-order Markov transition matrix of each user's event
        # stream (LEAD window feeding an aggregate)
        "event_type_transitions": """
WITH s AS (
  SELECT user_id, event_type,
    lead(event_type) OVER (PARTITION BY user_id
                           ORDER BY epoch_us(ts), event_id) AS next_type
  FROM events)
SELECT event_type AS from_type, next_type AS to_type,
  CAST(COUNT(*) AS BIGINT) AS n
FROM s WHERE next_type IS NOT NULL GROUP BY 1, 2
""",
        # MODE aggregate: most frequent event type per user, ties ->
        # lexicographically smallest type
        "modal_event_type_per_user": """
WITH c AS (
  SELECT user_id, event_type, COUNT(*) AS n FROM events GROUP BY 1, 2),
r AS (
  SELECT *, row_number() OVER (PARTITION BY user_id
            ORDER BY n DESC, event_type) AS rk FROM c)
SELECT user_id, event_type, CAST(n AS BIGINT) AS n FROM r WHERE rk = 1
""",
        # ordered funnel: deepest stage reached, each stage strictly
        # after the timestamp that satisfied the previous one
        "user_funnel_stages": f"""
WITH s1 AS (
  SELECT user_id, MIN(epoch_us(ts)) AS t1 FROM events
  WHERE event_type = '{M_FUNNEL[0]}' GROUP BY 1),
s2 AS (
  SELECT e.user_id, MIN(epoch_us(e.ts)) AS t2
  FROM events e JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = '{M_FUNNEL[1]}' AND epoch_us(e.ts) > s1.t1
  GROUP BY 1),
s3 AS (
  SELECT e.user_id, MIN(epoch_us(e.ts)) AS t3
  FROM events e JOIN s2 ON e.user_id = s2.user_id
  WHERE e.event_type = '{M_FUNNEL[2]}' AND epoch_us(e.ts) > s2.t2
  GROUP BY 1)
SELECT u.user_id,
  CAST(CASE WHEN s3.user_id IS NOT NULL THEN 3
            WHEN s2.user_id IS NOT NULL THEN 2
            WHEN s1.user_id IS NOT NULL THEN 1
            ELSE 0 END AS BIGINT) AS funnel_stage
FROM (SELECT DISTINCT user_id FROM events) u
LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
LEFT JOIN s3 USING (user_id)
""",
        # integer PageRank: WITH RECURSIVE replays the exact int64
        # recurrence (rank' = 0.15·SCALE + 0.85·Σ(rank // deg)) over
        # the same exact-Jaccard edge set, iteration by iteration
        "pagerank_near_dup": _PAIR_CTE.replace(
            "WITH ", "WITH RECURSIVE ", 1) + f""",
e(src, dst) AS MATERIALIZED (
  SELECT id_a, id_b FROM p WHERE jaccard >= {NEAR_DUP_DOC_JACCARD}
  UNION ALL
  SELECT id_b, id_a FROM p WHERE jaccard >= {NEAR_DUP_DOC_JACCARD}),
d AS MATERIALIZED (
  SELECT src AS node, COUNT(*) AS deg FROM e GROUP BY 1),
r(i, node, rank) AS (
  SELECT 0, node, CAST({PR_SCALE} AS BIGINT) FROM d
  UNION ALL
  SELECT i + 1, e.dst,
    CAST({(15 * PR_SCALE) // 100}
         + (85 * SUM(r.rank // d.deg)) // 100 AS BIGINT)
  FROM r JOIN e ON e.src = r.node JOIN d ON d.node = r.node
  WHERE i < {PR_ITERS} GROUP BY i + 1, e.dst)
SELECT node AS doc_id, CAST(rank AS BIGINT) AS rank
FROM r WHERE i = {PR_ITERS}
""",
        # deterministic weight-biased sampling: integer A-ES priorities
        "weighted_sample_documents": f"""
SELECT doc_id,
  CAST((md5_number_upper(CAST(doc_id AS VARCHAR)) >> 1)
       // (n_chars + 1) AS BIGINT) AS priority
FROM documents
ORDER BY priority, doc_id LIMIT {WEIGHTED_SAMPLE_N}
""",
        # count-min sketch: DuckDB rebuilds the DEPTH x WIDTH counter
        # table from the same frozen md5 cell hash and probes the same
        # frozen terms — estimates are exact integers, so the entire
        # sketch surface (not an approximation of it) is hash-compared
        "term_counts_cms": f"""
WITH t AS (
  SELECT unnest(regexp_extract_all(lower(text), '{_TOK}')) AS term
  FROM documents),
c AS (SELECT term, COUNT(*) AS n FROM t GROUP BY term),
g AS (
  SELECT i.range AS row_i,
    md5_number_upper(CAST(i.range AS VARCHAR) || ':' || term)
      % {CMS_WIDTH} AS col,
    SUM(n) AS cnt
  FROM c CROSS JOIN range(0, {CMS_DEPTH}) i GROUP BY 1, 2),
q AS (SELECT unnest([{_CMS_TERMS_SQL}]) AS term),
sel AS (
  SELECT q.term, i.range AS row_i,
    md5_number_upper(CAST(i.range AS VARCHAR) || ':' || q.term)
      % {CMS_WIDTH} AS col
  FROM q CROSS JOIN range(0, {CMS_DEPTH}) i)
SELECT sel.term,
  CAST(MIN(COALESCE(g.cnt, 0)) AS BIGINT) AS est_count
FROM sel LEFT JOIN g ON g.row_i = sel.row_i AND g.col = sel.col
GROUP BY sel.term
""",
        # HyperLogLog registers: reg = top 6 hash bits, rho = leading
        # zeros of the low 58 bits + 1 (exact via length(bin(v)))
        "distinct_users_hll": f"""
WITH h AS (
  SELECT DISTINCT event_type,
    md5_number_upper(CAST(user_id AS VARCHAR)) AS hv
  FROM events),
r AS (
  SELECT event_type,
    CAST(hv >> {64 - M_HLL_REG_BITS} AS BIGINT) AS reg,
    CAST(CASE WHEN (hv & {(1 << (64 - M_HLL_REG_BITS)) - 1}::UBIGINT) = 0
              THEN {64 - M_HLL_REG_BITS + 1}
         ELSE {64 - M_HLL_REG_BITS + 1}
              - length(bin(hv & {(1 << (64 - M_HLL_REG_BITS)) - 1}::UBIGINT))
         END AS BIGINT) AS rho
  FROM h)
SELECT event_type, reg, MAX(rho) AS rho FROM r GROUP BY 1, 2
""",
        # semi-structured JSON column parsing + exact integer
        # sufficient statistics for mean/variance/correlation
        "event_props_numeric_stats": """
WITH e AS (
  SELECT event_type,
    CAST(json_extract(props, '$.k') AS BIGINT) AS k,
    CAST(floor(value * 1000) AS BIGINT) AS v
  FROM events)
SELECT event_type,
  CAST(COUNT(*) AS BIGINT) AS n,
  CAST(SUM(k) AS BIGINT) AS sum_k,
  CAST(MIN(k) AS BIGINT) AS min_k,
  CAST(MAX(k) AS BIGINT) AS max_k,
  CAST(SUM(v) AS BIGINT) AS sum_v,
  CAST(SUM(k * k) AS BIGINT) AS sum_kk,
  CAST(SUM(v * v) AS BIGINT) AS sum_vv,
  CAST(SUM(k * v) AS BIGINT) AS sum_kv
FROM e GROUP BY 1
""",
        # multi-format sources: the Ray side reads derived JSONL/CSV
        # shards; these oracles recompute the same fixed-point integers
        # from the ORIGINAL parquet views (round-trip fidelity check)
        "events_jsonl_roundtrip": """
SELECT event_id, user_id, event_type,
  CAST(floor(value * 1000) AS BIGINT) AS value_milli
FROM events
""",
        "supplier_balance_by_nation": """
SELECT n_name,
  CAST(COUNT(*) AS BIGINT) AS n_suppliers,
  CAST(SUM(CAST(floor(s_acctbal * 100) AS BIGINT)) AS BIGINT)
    AS sum_acctbal_cents
FROM supplier JOIN nation ON s_nationkey = n_nationkey
GROUP BY 1
""",
        # turns -> training documents: string_agg(... ORDER BY turn_idx)
        # as the bucketed ordered scan
        "conv_training_docs": f"""
SELECT conv_id,
  CAST(COUNT(*) AS BIGINT) AS n_turns,
  CAST(length(string_agg(role || ': ' || text, chr(10)
                         ORDER BY turn_idx)) AS BIGINT) AS n_chars,
  string_agg(role || ': ' || text, chr(10) ORDER BY turn_idx) AS doc_text
FROM read_parquet('{tr_glob}')
GROUP BY conv_id
""",
        # context-window chunking: every doc explodes into windows of
        # CHUNK_WINDOW chars every CHUNK_STRIDE chars; empty docs keep
        # one empty chunk (substr/str.slice/python slicing all count
        # code points, so the surfaces agree on unicode)
        "doc_context_chunks": f"""
WITH d AS (
  SELECT doc_id, text, length(text) AS n FROM documents),
c AS (
  SELECT doc_id, text,
    unnest(range(0, greatest(
      (n + {CHUNK_STRIDE - 1}) // {CHUNK_STRIDE}, 1))) AS chunk_idx
  FROM d)
SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
  substr(text, CAST(chunk_idx * {CHUNK_STRIDE} + 1 AS BIGINT),
         {CHUNK_WINDOW}) AS chunk_text,
  CAST(length(substr(text, CAST(chunk_idx * {CHUNK_STRIDE} + 1 AS BIGINT),
                     {CHUNK_WINDOW})) AS BIGINT) AS chunk_len
FROM c
""",
        # greedy sequence packing: the recursive CTE replays the same
        # first-fit rule per bucket stream (new sequence when the
        # running token total would exceed the budget; an over-budget
        # doc still gets its own sequence)
        "packed_sequence_documents": f"""
WITH RECURSIVE
d AS MATERIALIZED (
  SELECT doc_id,
    CAST(md5_number_upper(CAST(doc_id AS VARCHAR))
         % {PACK_BUCKETS} AS BIGINT) AS bucket,
    CAST(len(regexp_extract_all(text, '{spec.WS_TOKEN_PATTERN}'))
         AS BIGINT) AS n_tokens,
    row_number() OVER (
      PARTITION BY md5_number_upper(CAST(doc_id AS VARCHAR))
                   % {PACK_BUCKETS}
      ORDER BY doc_id) AS rn
  FROM documents),
s(bucket, rn, doc_id, n_tokens, seq_id, tok_offset, run) AS (
  SELECT bucket, rn, doc_id, n_tokens,
         CAST(0 AS BIGINT), CAST(0 AS BIGINT), n_tokens
  FROM d WHERE rn = 1
  UNION ALL
  SELECT d.bucket, d.rn, d.doc_id, d.n_tokens,
    CASE WHEN s.run + d.n_tokens > {PACK_TOKEN_BUDGET}
         THEN s.seq_id + 1 ELSE s.seq_id END,
    CASE WHEN s.run + d.n_tokens > {PACK_TOKEN_BUDGET}
         THEN CAST(0 AS BIGINT) ELSE s.run END,
    CASE WHEN s.run + d.n_tokens > {PACK_TOKEN_BUDGET}
         THEN d.n_tokens ELSE s.run + d.n_tokens END
  FROM s JOIN d ON d.bucket = s.bucket AND d.rn = s.rn + 1)
SELECT doc_id, bucket, seq_id, tok_offset, n_tokens FROM s
""",
        # NTILE(10) global ranking over the heuristic quality score
        "doc_quality_deciles": _QUALITY_CTE + f"""
SELECT doc_id,
  CAST(overall AS BIGINT) AS overall_quality_score,
  CAST(ntile({NTILE_BUCKETS}) OVER (ORDER BY overall, doc_id)
       AS BIGINT) AS decile
FROM q
""",
        # incremental ingest dedup: incoming shard (doc_id % MOD == 0)
        # near-dup-matched against the committed corpus; winner = min
        # committed id, with its round-6 jaccard re-attached
        "incremental_dedup_documents": f"""
WITH t AS (
  SELECT doc_id,
    list_distinct(regexp_extract_all(lower(text), '{_TOK}')) AS toks
  FROM documents),
m AS (
  SELECT n.doc_id, o.doc_id AS cand,
    round(CAST(len(list_intersect(n.toks, o.toks)) AS DOUBLE)
      / (len(n.toks) + len(o.toks)
         - len(list_intersect(n.toks, o.toks))), 6) AS jaccard
  FROM t n JOIN t o
    ON n.doc_id % {D_INCR_NEW_MOD} = 0
   AND o.doc_id % {D_INCR_NEW_MOD} <> 0
  WHERE len(n.toks) > 0 AND len(o.toks) > 0
    AND CAST(len(list_intersect(n.toks, o.toks)) AS DOUBLE)
      / (len(n.toks) + len(o.toks)
         - len(list_intersect(n.toks, o.toks)))
      >= {NEAR_DUP_DOC_JACCARD}),
w AS (SELECT doc_id, MIN(cand) AS dup_of FROM m GROUP BY doc_id)
SELECT w.doc_id, w.dup_of, m.jaccard
FROM w JOIN m ON m.doc_id = w.doc_id AND m.cand = w.dup_of
""",
        # mergeable equal-width histogram sketch quantiles — the
        # estimate is pure integer math, so even the SKETCH is
        # hash-checked (error bound vs exact asserted in pytest)
        "approx_event_percentiles": f"""
WITH v AS (
  SELECT event_type, CAST(floor(value * 1000) AS BIGINT) AS vm
  FROM events),
s AS (
  SELECT event_type, MIN(vm) AS mn, MAX(vm) AS mx,
    CAST(COUNT(*) AS BIGINT) AS n
  FROM v GROUP BY 1),
b AS (
  SELECT v.event_type,
    ((v.vm - s.mn) * {M_SKETCH_BINS}) // (s.mx - s.mn + 1) AS bin
  FROM v JOIN s USING (event_type)),
h AS (SELECT event_type, bin, COUNT(*) AS c FROM b GROUP BY 1, 2),
cum AS (
  SELECT event_type, bin,
    SUM(c) OVER (PARTITION BY event_type ORDER BY bin) AS cum
  FROM h),
pick AS (
  SELECT c.event_type, pr.p, MIN(c.bin) AS bin
  FROM cum c
  JOIN s ON s.event_type = c.event_type
  CROSS JOIN (VALUES (50), (90), (99)) pr(p)
  WHERE c.cum >= (s.n * pr.p + 99) // 100
  GROUP BY 1, 2)
SELECT s.event_type, s.n AS n_events,
  {", ".join(
    "CAST(MAX(CASE WHEN pick.p = " + str(p) + " THEN "
    "s.mn + ((pick.bin + 1) * (s.mx - s.mn + 1)) // "
    + str(M_SKETCH_BINS) + " - 1 END) AS BIGINT) AS p" + str(p)
    + "_est" for p in (50, 90, 99))}
FROM s JOIN pick ON pick.event_type = s.event_type
GROUP BY 1, 2
""",
        # two-pass outlier filter: strict exceeders of each type's
        # exact discrete p99 (quantile_disc index rule)
        "event_outliers": """
WITH v AS (
  SELECT event_id, event_type,
    CAST(floor(value * 1000) AS BIGINT) AS value_milli
  FROM events),
thr AS (
  SELECT event_type, quantile_disc(value_milli, 0.99) AS p99_milli
  FROM v GROUP BY event_type)
SELECT v.event_id, v.event_type, v.value_milli, thr.p99_milli
FROM v JOIN thr ON thr.event_type = v.event_type
WHERE v.value_milli > thr.p99_milli
""",
        # per-node triangle counts over the near-dup graph (each
        # triangle a<b<c found once by the ordered 3-way join,
        # contributing to all three nodes)
        "near_dup_triangle_counts": f"""
WITH nt AS MATERIALIZED (
  SELECT doc_id,
    list_distinct(regexp_extract_all(lower(text), '{_TOK}')) AS toks
  FROM documents),
p AS MATERIALIZED (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM nt a JOIN nt b ON a.doc_id < b.doc_id
  WHERE len(a.toks) > 0 AND len(b.toks) > 0
    AND CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
      / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))
      >= {NEAR_DUP_DOC_JACCARD}),
tri AS (
  SELECT p1.id_a AS a, p1.id_b AS b, p2.id_b AS c
  FROM p p1
  JOIN p p2 ON p2.id_a = p1.id_b
  JOIN p p3 ON p3.id_a = p1.id_a AND p3.id_b = p2.id_b),
nodes AS (
  SELECT a AS v FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri)
SELECT v AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM nodes GROUP BY v
""",
        # end-to-end curation: exact dup > near dup > non-english >
        # toxic > low quality > ok (the composed pipeline oracle —
        # every branch reuses the already-verified per-operator SQL)
        "curated_documents": f"""
WITH RECURSIVE
qt AS (
  SELECT doc_id, length(text) AS n_chars,
    len(regexp_extract_all(lower(text), '{_TOK}')) AS n_tokens,
    len(list_distinct(regexp_extract_all(lower(text), '{_TOK}')))
      AS n_distinct,
    len(regexp_extract_all(text, '{_SYM}')) AS n_sym,
    CASE WHEN regexp_matches(lower(text), '{_BP}') THEN 1 ELSE 0 END
      AS bp
  FROM documents),
qs AS (
  SELECT doc_id,
    (LEAST(100, (100 * n_chars) // {CFG.min_len_chars})
     + (CASE WHEN n_tokens = 0 THEN 100
             ELSE (100 * n_distinct) // n_tokens END)
     + (CASE WHEN n_chars = 0 THEN 100
             ELSE 100 - LEAST(100, ({CFG.symbol_penalty_mult} * n_sym)
                                   // n_chars) END)
     + (CASE WHEN bp = 1 THEN 0 ELSE 100 END)) // 4 AS overall
  FROM qt),
lt AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{_TOK}') AS toks
  FROM documents),
lc AS (SELECT doc_id, {lid_counts} FROM lt),
lid AS (SELECT doc_id, {lid_case} AS pred_lang FROM lc),
tox AS (
  SELECT doc_id,
    len(regexp_extract_all(lower(text), '{spec.TOXICITY_PATTERN}'))
      AS n_toxic
  FROM documents),
ch AS (
  SELECT doc_id,
    md5(regexp_replace(regexp_replace(lower(text),
        '{spec.EDGE_WS_PATTERN}', '', 'g'),
        '{spec.WS_PLUS_PATTERN}', ' ', 'g')) AS h
  FROM documents),
canon AS (SELECT h, MIN(doc_id) AS cid FROM ch GROUP BY h),
nt AS MATERIALIZED (
  SELECT doc_id,
    list_distinct(regexp_extract_all(lower(text), '{_TOK}')) AS toks
  FROM documents),
np_ AS MATERIALIZED (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM nt a JOIN nt b ON a.doc_id < b.doc_id
  WHERE len(a.toks) > 0 AND len(b.toks) > 0
    AND CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
      / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))
      >= {NEAR_DUP_DOC_JACCARD}),
ne(src, dst) AS MATERIALIZED (
  SELECT id_a, id_b FROM np_ UNION ALL SELECT id_b, id_a FROM np_),
nr(key, lab) AS (
  SELECT src, src FROM ne
  UNION
  SELECT ne.dst, nr.lab FROM nr JOIN ne ON ne.src = nr.key),
ncl AS (SELECT key, MIN(lab) AS cluster FROM nr GROUP BY key),
fl AS (
  SELECT d.doc_id,
    (ch.doc_id <> canon.cid) AS is_exact,
    (ncl.key IS NOT NULL AND ncl.key <> ncl.cluster) AS is_near,
    (lid.pred_lang <> 'en') AS non_en,
    (tox.n_toxic >= 1) AS is_toxic,
    (qs.overall < {CFG.quarantine_action_threshold}) AS low_q
  FROM documents d
  JOIN ch ON ch.doc_id = d.doc_id
  JOIN canon ON canon.h = ch.h
  JOIN lid ON lid.doc_id = d.doc_id
  JOIN tox ON tox.doc_id = d.doc_id
  JOIN qs ON qs.doc_id = d.doc_id
  LEFT JOIN ncl ON ncl.key = d.doc_id)
SELECT doc_id,
  CASE WHEN is_exact THEN 'exact_dup'
       WHEN is_near THEN 'near_dup'
       WHEN non_en THEN 'non_english'
       WHEN is_toxic THEN 'toxic'
       WHEN low_q THEN 'low_quality'
       ELSE 'ok' END AS drop_reason,
  (NOT is_exact AND NOT is_near AND NOT non_en AND NOT is_toxic
   AND NOT low_q) AS keep
FROM fl
""",
        # Gopher-style duplicate-bigram repetition signals, integer
        # fixed-point; generate_series(1, len-1) is empty for len<2 so
        # token-poor docs fall out of the LEFT JOIN with zeros
        "dup_ngram_stats": f"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{_TOK}') AS ts
  FROM documents),
b AS (
  SELECT doc_id,
    list_transform(generate_series(1, len(ts) - 1),
                   i -> ts[i] || ' ' || ts[i+1]) AS bg
  FROM t),
c AS (
  SELECT doc_id, g, COUNT(*) AS c
  FROM (SELECT doc_id, unnest(bg) AS g FROM b) GROUP BY 1, 2),
agg AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n,
    CAST(COUNT(*) AS BIGINT) AS d, CAST(MAX(c) AS BIGINT) AS mx
  FROM c GROUP BY doc_id)
SELECT t.doc_id,
  COALESCE(a.n, 0) AS n_bigrams,
  COALESCE(a.d, 0) AS n_distinct_bigrams,
  CASE WHEN COALESCE(a.n, 0) > 0
       THEN (1000 * (a.n - a.d)) // a.n ELSE 0 END AS dup_frac_milli,
  COALESCE(a.mx, 0) AS max_bigram_count
FROM t LEFT JOIN agg a ON a.doc_id = t.doc_id
""",
        # Gopher-style repetition filter (Rae et al. 2021 §A1.1,
        # integer arithmetic; thresholds interpolated from
        # pipelines.documents.GOPHER_* so both engines move together)
        "gopher_repetition_documents": f"""
WITH t AS (
  SELECT doc_id, length(text) AS n_chars,
    list_filter(string_split(text, chr(10)), x -> x <> '') AS ls,
    regexp_extract_all(lower(text), '{_TOK}') AS ts
  FROM documents),
lc AS (
  SELECT doc_id, ln, CAST(COUNT(*) AS BIGINT) AS c, length(ln) AS llen
  FROM (SELECT doc_id, unnest(ls) AS ln FROM t) GROUP BY doc_id, ln),
la AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_lines,
    CAST(SUM(c * llen) AS BIGINT) AS line_chars,
    CAST(SUM(c - 1) AS BIGINT) AS dup_line_count,
    CAST(SUM((c - 1) * llen) AS BIGINT) AS dup_line_chars
  FROM lc GROUP BY doc_id),
bg AS (
  SELECT doc_id, g, CAST(COUNT(*) AS BIGINT) AS c FROM (
    SELECT doc_id,
      unnest(list_transform(generate_series(1, len(ts) - 1),
                            i -> ts[i] || ' ' || ts[i+1])) AS g
    FROM t) GROUP BY doc_id, g),
top2 AS (
  SELECT doc_id, g AS top2_gram, c AS top2_count,
    c * length(g) AS top2_chars
  FROM (SELECT doc_id, g, c, row_number()
          OVER (PARTITION BY doc_id ORDER BY c DESC, g ASC) AS rn
        FROM bg)
  WHERE rn = 1),
g5 AS (
  SELECT doc_id, g, CAST(COUNT(*) AS BIGINT) AS c FROM (
    SELECT doc_id,
      unnest(list_transform(generate_series(1, len(ts) - 4),
        i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] || ' '
             || ts[i+3] || ' ' || ts[i+4])) AS g
    FROM t) GROUP BY doc_id, g),
d5 AS (
  SELECT doc_id, CAST(SUM((c - 1) * length(g)) AS BIGINT) AS dup5_chars
  FROM g5 WHERE c > 1 GROUP BY doc_id),
j AS (
  SELECT t.doc_id, CAST(t.n_chars AS BIGINT) AS n_chars,
    COALESCE(la.n_lines, 0) AS n_lines,
    COALESCE(la.dup_line_count, 0) AS dup_line_count,
    COALESCE(la.dup_line_chars, 0) AS dup_line_chars,
    COALESCE(la.line_chars, 0) AS line_chars,
    COALESCE(top2.top2_gram, '') AS top2_gram,
    COALESCE(top2.top2_count, 0) AS top2_count,
    COALESCE(top2.top2_chars, 0) AS top2_chars,
    COALESCE(d5.dup5_chars, 0) AS dup5_chars
  FROM t
  LEFT JOIN la ON la.doc_id = t.doc_id
  LEFT JOIN top2 ON top2.doc_id = t.doc_id
  LEFT JOIN d5 ON d5.doc_id = t.doc_id)
SELECT doc_id, n_chars, n_lines, dup_line_count, dup_line_chars,
  top2_gram, top2_count, top2_chars, dup5_chars,
  CASE WHEN (n_lines > 0
             AND 100 * dup_line_count > {GOPHER_DUP_LINE_PCT} * n_lines)
         OR (line_chars > 0
             AND 100 * dup_line_chars
                 > {GOPHER_DUP_LINE_CHAR_PCT} * line_chars)
         OR (n_chars > 0
             AND 100 * top2_chars > {GOPHER_TOP2_CHAR_PCT} * n_chars)
         OR (n_chars > 0
             AND 100 * dup5_chars > {GOPHER_DUP5_CHAR_PCT} * n_chars)
       THEN 1 ELSE 0 END AS rep_flag
FROM j
""",
        # Gopher QUALITY rules (the non-repetition half of Rae et al.
        # 2021 §A1.1), integer arithmetic; thresholds + stop-word list
        # interpolated from pipelines.documents.GOPHERQ_* so both
        # engines move together. Counting conventions pinned by the
        # cross-engine prototype (words = WS matches on raw text,
        # '...' leftmost non-overlapping via the replace-length trick,
        # stop hits = DISTINCT stop words via list_intersect).
        "gopher_quality_documents": f"""
WITH t AS (
  SELECT doc_id, COALESCE(text, '') AS text,
    regexp_extract_all(COALESCE(text, ''), '{GOPHERQ_WS}') AS ws,
    list_filter(string_split(COALESCE(text, ''), chr(10)),
                x -> x <> '') AS ls,
    regexp_extract_all(lower(COALESCE(text, '')), '{_TOK}') AS ts
  FROM documents),
sig AS (
  SELECT doc_id,
    CAST(len(ws) AS BIGINT) AS n_words,
    CAST(COALESCE(list_sum(list_transform(ws, w -> length(w))), 0)
         AS BIGINT) AS word_chars,
    CAST(len(list_filter(ws, w -> regexp_matches(w, '[A-Za-z]')))
         AS BIGINT) AS n_alpha_words,
    CAST(length(text) - length(replace(text, '#', '')) AS BIGINT)
      AS n_hash,
    CAST((length(text) - length(replace(text, '...', ''))) // 3
         AS BIGINT) AS n_ellipsis,
    CAST(len(ls) AS BIGINT) AS n_lines,
    CAST(len(list_filter(ls, x -> regexp_matches(x, '^[-*]')))
         AS BIGINT) AS n_bullet_lines,
    CAST(len(list_filter(ls, x -> x LIKE '%...')) AS BIGINT)
      AS n_ellipsis_lines,
    CAST(len(list_intersect(ts, {GOPHERQ_STOP_SQL})) AS BIGINT)
      AS n_stop_hits
  FROM t)
SELECT doc_id, n_words, word_chars, n_alpha_words, n_hash, n_ellipsis,
  n_lines, n_bullet_lines, n_ellipsis_lines, n_stop_hits,
  CASE WHEN n_words < {GOPHERQ_MIN_WORDS}
         OR n_words > {GOPHERQ_MAX_WORDS}
         OR (n_words > 0
             AND (word_chars < {GOPHERQ_MIN_WORD_LEN} * n_words
                  OR word_chars > {GOPHERQ_MAX_WORD_LEN} * n_words))
         OR (n_words > 0
             AND 100 * (n_hash + n_ellipsis)
                 > {GOPHERQ_SYMBOL_PCT} * n_words)
         OR (n_lines > 0
             AND 100 * n_bullet_lines > {GOPHERQ_BULLET_PCT} * n_lines)
         OR (n_lines > 0
             AND 100 * n_ellipsis_lines
                 > {GOPHERQ_ELLIPSIS_PCT} * n_lines)
         OR (n_words > 0
             AND 100 * n_alpha_words < {GOPHERQ_ALPHA_PCT} * n_words)
         OR n_stop_hits < {GOPHERQ_MIN_STOP}
       THEN 1 ELSE 0 END AS q_flag
FROM sig
""",
        # C4 line cleaning: pinned trim charset, WS-token min-words,
        # literal lower() contains for blacklist/page phrase; the kept
        # list is rebuilt identically and joined with chr(10)
        "c4_line_filtered_documents": f"""
WITH t AS (
  SELECT doc_id, COALESCE(text, '') AS text,
    list_transform(string_split(COALESCE(text, ''), chr(10)),
      x -> trim(x, ' ' || chr(9) || chr(13) || chr(10))) AS ls
  FROM documents),
k AS (
  SELECT doc_id, text, ls,
    COALESCE(array_to_string(list_filter(ls, x ->
      (x LIKE '%.' OR x LIKE '%!' OR x LIKE '%?' OR x LIKE '%"')
      AND NOT contains(lower(x), '{C4_LINE_BLACKLIST}')
      AND len(regexp_extract_all(x, '{GOPHERQ_WS}'))
          >= {C4_MIN_LINE_WORDS}),
      chr(10)), '') AS clean_text,
    CAST(len(list_filter(ls, x ->
      (x LIKE '%.' OR x LIKE '%!' OR x LIKE '%?' OR x LIKE '%"')
      AND NOT contains(lower(x), '{C4_LINE_BLACKLIST}')
      AND len(regexp_extract_all(x, '{GOPHERQ_WS}'))
          >= {C4_MIN_LINE_WORDS}))
      AS BIGINT) AS n_kept_lines,
    CAST(len(list_filter(ls,
      x -> contains(lower(x), '{C4_LINE_BLACKLIST}')))
      AS BIGINT) AS n_js_lines
  FROM t)
SELECT doc_id,
  CAST(len(ls) AS BIGINT) AS n_lines,
  n_kept_lines, n_js_lines,
  CAST(length(clean_text) AS BIGINT) AS clean_chars,
  CASE WHEN contains(lower(text), '{C4_PAGE_PHRASE}')
         OR contains(text, '{{')
         OR n_kept_lines < {C4_MIN_KEPT_LINES}
       THEN 1 ELSE 0 END AS page_flag,
  clean_text
FROM k
""",
        # mojibake audit: quote-free hex char classes run identically
        # in Rust regex and RE2; single-char literals use the DuckDB
        # replace-length trick (chr(65533)=U+FFFD, chr(195)='Ã')
        "mojibake_documents": f"""
WITH t AS (SELECT doc_id, COALESCE(text, '') AS text FROM documents),
sig AS (
  SELECT doc_id,
    CAST(length(text) AS BIGINT) AS n_chars,
    CAST(len(regexp_extract_all(text, '{MOJI_NONASCII_CLASS}'))
         AS BIGINT) AS n_nonascii,
    CAST(len(regexp_extract_all(text, '{MOJI_CTRL_CLASS}'))
         AS BIGINT) AS n_ctrl,
    CAST(length(text) - length(replace(text, chr(65533), ''))
         AS BIGINT) AS n_repl,
    CAST(length(text) - length(replace(text, chr(195), ''))
         AS BIGINT) AS n_latin_artifact
  FROM t)
SELECT doc_id, n_chars, n_nonascii, n_ctrl, n_repl, n_latin_artifact,
  CASE WHEN n_repl > 0 OR n_ctrl > 0 OR n_latin_artifact > 0
         OR (n_chars > 0
             AND 100 * n_nonascii > {MOJI_NONASCII_PCT} * n_chars)
       THEN 1 ELSE 0 END AS moji_flag
FROM sig
""",
        # robust stats: exact discrete median + median absolute
        # deviation (nested quantile_disc composition)
        "event_value_mad": """
WITH f AS (
  SELECT event_type,
    CAST(floor(value * 1000) AS BIGINT) AS vm
  FROM events),
m AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
    CAST(quantile_disc(vm, 0.5) AS BIGINT) AS median_milli
  FROM f GROUP BY 1)
SELECT m.event_type, m.n_events, m.median_milli,
  CAST(quantile_disc(abs(f.vm - m.median_milli), 0.5) AS BIGINT)
    AS mad_milli
FROM f JOIN m USING (event_type)
GROUP BY m.event_type, m.n_events, m.median_milli
""",
        # pairwise source-vocabulary Jaccard (group-level set overlap)
        "source_vocab_overlap": f"""
WITH st AS (
  SELECT DISTINCT source, t
  FROM (SELECT source,
          unnest(regexp_extract_all(lower(text), '{_TOK}')) AS t
        FROM documents)),
v AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM st GROUP BY 1),
pair AS (
  SELECT a.source AS source_a, b.source AS source_b,
    CAST(COUNT(*) AS BIGINT) AS n_common
  FROM st a JOIN st b ON a.t = b.t AND a.source < b.source
  GROUP BY 1, 2)
SELECT p.source_a, p.source_b, p.n_common,
  va.n AS n_a, vb.n AS n_b,
  CAST((1000000 * p.n_common) // (va.n + vb.n - p.n_common) AS BIGINT)
    AS jaccard_micro
FROM pair p
JOIN v va ON va.source = p.source_a
JOIN v vb ON vb.source = p.source_b
""",
        # CROSS-document duplicate 8-token spans (exact-substring dedup
        # signal; window identity = md5-u64 of the joined window on
        # both engines)
        "duplicate_span_documents": f"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{_TOK}') AS ts
  FROM documents),
w AS (
  SELECT doc_id,
    list_transform(generate_series(1, len(ts) - {_SPAN_K - 1}),
                   i -> array_to_string(list_slice(ts, i, i + {_SPAN_K - 1}), ' '))
      AS ws
  FROM t WHERE len(ts) >= {_SPAN_K}),
h AS (SELECT doc_id, md5_number_upper(unnest(ws)) AS h FROM w),
ph AS (SELECT doc_id, h, COUNT(*) AS n_pos FROM h GROUP BY 1, 2),
dup AS (SELECT h FROM ph GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2),
c AS (
  SELECT doc_id,
    CAST(SUM(n_pos) AS BIGINT) AS n_windows,
    CAST(SUM(CASE WHEN h IN (SELECT h FROM dup) THEN n_pos ELSE 0 END)
         AS BIGINT) AS n_dup_windows
  FROM ph GROUP BY 1)
SELECT doc_id, n_windows, n_dup_windows,
  CAST((1000 * n_dup_windows) // n_windows AS BIGINT) AS dup_frac_milli
FROM c
""",
        # exact-substring REMOVAL: tokens covered by any duplicated
        # window (same md5_number_upper window identity and >= 2
        # distinct docs rule as the signal oracle) are dropped; docs
        # reassembled by string_agg over the surviving positions.
        # Parallel unnests in one SELECT zip (positions with window
        # hashes, positions with tokens)
        "duplicate_span_removed_documents": f"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{_TOK}') AS ts
  FROM documents),
w AS (
  SELECT doc_id,
    unnest(generate_series(1, len(ts) - {_SPAN_K - 1})) AS start,
    unnest(list_transform(generate_series(1, len(ts) - {_SPAN_K - 1}),
           i -> md5_number_upper(
                  array_to_string(list_slice(ts, i, i + {_SPAN_K - 1}), ' '))))
      AS h
  FROM t WHERE len(ts) >= {_SPAN_K}),
dup AS (
  SELECT h FROM w GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2),
rem AS (
  SELECT DISTINCT doc_id,
    unnest(generate_series(start, start + {_SPAN_K - 1})) AS p
  FROM w WHERE h IN (SELECT h FROM dup)),
pos AS (
  SELECT doc_id,
    unnest(generate_series(1, len(ts))) AS p,
    unnest(ts) AS tk
  FROM t),
k AS (
  SELECT pos.doc_id, pos.p, pos.tk,
    (rem.p IS NOT NULL) AS removed
  FROM pos LEFT JOIN rem
    ON rem.doc_id = pos.doc_id AND rem.p = pos.p),
a AS (
  SELECT doc_id,
    CAST(COUNT(*) AS BIGINT) AS n_tokens,
    CAST(SUM(CASE WHEN removed THEN 1 ELSE 0 END) AS BIGINT)
      AS n_removed,
    COALESCE(string_agg(CASE WHEN NOT removed THEN tk END, ' '
                        ORDER BY p), '') AS kept_text
  FROM k GROUP BY 1)
SELECT d.doc_id,
  COALESCE(a.n_tokens, 0) AS n_tokens,
  COALESCE(a.n_removed, 0) AS n_removed,
  COALESCE(a.kept_text, '') AS kept_text
FROM documents d LEFT JOIN a ON a.doc_id = d.doc_id
""",
        # benchmark decontamination: word-n-gram shingle collision with
        # the deterministic pseudo-benchmark (doc_id % MOD == 0)
        "contaminated_documents": f"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{_TOK}') AS ts
  FROM documents),
sh AS (
  SELECT doc_id, unnest(list_distinct(
    list_transform(generate_series(1, len(ts) - {CONTAM_NGRAM - 1}),
                   i -> {contam_shingle}))) AS g
  FROM t),
bset AS (
  SELECT DISTINCT g FROM sh WHERE doc_id % {CONTAM_BENCH_MOD} = 0)
SELECT s.doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits
FROM sh s JOIN bset b ON b.g = s.g
WHERE s.doc_id % {CONTAM_BENCH_MOD} <> 0
GROUP BY 1
""",
        # span-level decontamination: tokens covered by any
        # benchmark-colliding word-CONTAM_NGRAM window removed, docs
        # reassembled (duplicate_span_removed's rebuild contract with
        # set membership replacing the cross-doc distinct-doc test)
        "decontaminated_span_documents": f"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{_TOK}') AS ts
  FROM documents),
bset AS (
  SELECT DISTINCT unnest(list_distinct(
    list_transform(generate_series(1, len(ts) - {CONTAM_NGRAM - 1}),
                   i -> {contam_shingle}))) AS g
  FROM t WHERE doc_id % {CONTAM_BENCH_MOD} = 0),
w AS (
  SELECT doc_id,
    unnest(generate_series(1, len(ts) - {CONTAM_NGRAM - 1})) AS start,
    unnest(list_transform(generate_series(1, len(ts) - {CONTAM_NGRAM - 1}),
                          i -> {contam_shingle})) AS g
  FROM t
  WHERE len(ts) >= {CONTAM_NGRAM} AND doc_id % {CONTAM_BENCH_MOD} <> 0),
rem AS (
  SELECT DISTINCT doc_id,
    unnest(generate_series(start, start + {CONTAM_NGRAM - 1})) AS p
  FROM w WHERE g IN (SELECT g FROM bset)),
pos AS (
  SELECT doc_id,
    unnest(generate_series(1, len(ts))) AS p,
    unnest(ts) AS tk
  FROM t WHERE doc_id % {CONTAM_BENCH_MOD} <> 0),
k AS (
  SELECT pos.doc_id, pos.p, pos.tk,
    (rem.p IS NOT NULL) AS removed
  FROM pos LEFT JOIN rem
    ON rem.doc_id = pos.doc_id AND rem.p = pos.p),
a AS (
  SELECT doc_id,
    CAST(COUNT(*) AS BIGINT) AS n_tokens,
    CAST(SUM(CASE WHEN removed THEN 1 ELSE 0 END) AS BIGINT)
      AS n_removed,
    COALESCE(string_agg(CASE WHEN NOT removed THEN tk END, ' '
                        ORDER BY p), '') AS kept_text
  FROM k GROUP BY 1)
SELECT d.doc_id,
  COALESCE(a.n_tokens, 0) AS n_tokens,
  COALESCE(a.n_removed, 0) AS n_removed,
  COALESCE(a.kept_text, '') AS kept_text
FROM documents d LEFT JOIN a ON a.doc_id = d.doc_id
WHERE d.doc_id % {CONTAM_BENCH_MOD} <> 0
""",
        # Bloom-filter decontamination: identical probe replayed in SQL
        # (bit positions = md5_number_upper('bloom:'||j||':'||g) % M),
        # so the check covers the filter's deterministic false
        # positives too
        "bloom_contaminated_documents": f"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{_TOK}') AS ts
  FROM documents),
sh AS (
  SELECT doc_id, unnest(list_distinct(
    list_transform(generate_series(1, len(ts) - {CONTAM_NGRAM - 1}),
                   i -> {contam_shingle}))) AS g
  FROM t),
bbits AS (
  SELECT DISTINCT
    md5_number_upper('bloom:' || CAST(j AS VARCHAR) || ':' || g)
      % {BLOOM_BITS} AS bit
  FROM (SELECT DISTINCT g FROM sh
        WHERE doc_id % {CONTAM_BENCH_MOD} = 0),
       generate_series(0, {BLOOM_K - 1}) AS s(j)),
hitg AS (
  SELECT p.doc_id, p.g
  FROM sh p, generate_series(0, {BLOOM_K - 1}) AS s(j)
  WHERE p.doc_id % {CONTAM_BENCH_MOD} <> 0
    AND (md5_number_upper('bloom:' || CAST(j AS VARCHAR) || ':' || p.g)
         % {BLOOM_BITS}) IN (SELECT bit FROM bbits)
  GROUP BY p.doc_id, p.g
  HAVING COUNT(*) = {BLOOM_K})
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits
FROM hitg GROUP BY doc_id
""",
        # TPC-H Q3 analog: 3-way join, both date predicates + the
        # segment filter; revenue fixed-pointed per row; top-K on the
        # (revenue desc, orderkey) total order
        "shipping_priority_revenue": f"""
WITH r AS (
  SELECT l.l_orderkey,
    CAST(SUM(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100)
                  AS BIGINT)) AS BIGINT) AS revenue_cents
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  WHERE l.l_shipdate > TIMESTAMP '{REL_Q3_CUTOFF}'
    AND o.o_orderdate < TIMESTAMP '{REL_Q3_CUTOFF}'
    AND c.c_mktsegment = '{REL_Q3_SEGMENT}'
  GROUP BY 1)
SELECT r.l_orderkey AS o_orderkey, r.revenue_cents,
  strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
  o.o_orderpriority
FROM r JOIN orders o ON o.o_orderkey = r.l_orderkey
ORDER BY r.revenue_cents DESC, r.l_orderkey
LIMIT {REL_Q3_TOP_K}
""",
        # TPC-H Q1 analog: predicate pushed to the scan on the Ray side;
        # all money/qty fixed-pointed per row before summation
        "lineitem_pricing_summary": f"""
WITH s AS (
  SELECT l_returnflag AS returnflag, l_linestatus AS linestatus,
    CAST(COUNT(*) AS BIGINT) AS n_items,
    CAST(SUM(CAST(floor(l_quantity * 1000) AS BIGINT)) AS BIGINT)
      AS sum_qty_milli,
    CAST(SUM(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
      AS sum_base_cents,
    CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100)
                  AS BIGINT)) AS BIGINT) AS sum_disc_cents,
    CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount)
                        * (1 + l_tax) * 100) AS BIGINT)) AS BIGINT)
      AS sum_charge_cents
  FROM lineitem
  WHERE l_shipdate <= TIMESTAMP '{REL_Q1_CUTOFF}'
  GROUP BY 1, 2)
SELECT *, sum_qty_milli // n_items AS avg_qty_milli,
  sum_base_cents // n_items AS avg_price_cents
FROM s
""",
        # per-group windowed rank (row_number over partition)
        "top_orders_per_customer": f"""
SELECT o_custkey, o_orderkey, totalprice_cents,
  CAST(rn AS BIGINT) AS rank
FROM (
  SELECT o_custkey, o_orderkey,
    CAST(floor(o_totalprice * 100) AS BIGINT) AS totalprice_cents,
    row_number() OVER (
      PARTITION BY o_custkey
      ORDER BY floor(o_totalprice * 100) DESC, o_orderkey) AS rn
  FROM orders)
WHERE rn <= {REL_TOP_ORDERS_K}
""",
        # exact COUNT(DISTINCT) via the two-phase distinct-pairs shape
        "distinct_users_by_event_type": """
SELECT event_type,
  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
  CAST(COUNT(*) AS BIGINT) AS n_events
FROM events GROUP BY 1
""",
        # anti-join / EXCEPT: users with events but no HIGH-VALUE
        # purchase (value >= threshold)
        "users_without_purchase": f"""
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
FROM events
WHERE user_id NOT IN (
  SELECT user_id FROM events
  WHERE event_type = 'purchase' AND value >= {M_HIGH_VALUE_MIN})
GROUP BY 1
""",
        # semi-join / EXISTS (dual of the anti-join above)
        "customers_with_purchases": f"""
SELECT c_custkey, c_mktsegment
FROM customer
WHERE EXISTS (
  SELECT 1 FROM events
  WHERE user_id = c_custkey
    AND event_type = 'purchase' AND value >= {M_HIGH_VALUE_MIN})
""",
        # bounded moving frame (ROWS BETWEEN 3 PRECEDING AND CURRENT)
        "user_moving_window": """
SELECT event_id, user_id,
  CAST(COUNT(*) OVER w AS BIGINT) AS win_n,
  CAST(SUM(CAST(floor(value * 1000) AS BIGINT)) OVER w AS BIGINT)
    AS win_sum_milli,
  CAST(MIN(CAST(floor(value * 1000) AS BIGINT)) OVER w AS BIGINT)
    AS win_min_milli,
  CAST(MAX(CAST(floor(value * 1000) AS BIGINT)) OVER w AS BIGINT)
    AS win_max_milli
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
""",
        # conjunctive token search (inverted-index probe): docs whose
        # token set contains ALL query terms; n_matches = total
        # occurrences of the query terms
        "docs_matching_terms": f"""
WITH tok AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{_TOK}') AS ts
  FROM documents),
c AS (
  SELECT doc_id,
    {", ".join(
        "len(list_filter(ts, x -> x = '" + t + "')) AS c" + str(i)
        for i, t in enumerate(D_SEARCH_TERMS))}
  FROM tok)
SELECT doc_id,
  CAST({" + ".join("c" + str(i) for i in range(len(D_SEARCH_TERMS)))}
       AS BIGINT) AS n_matches
FROM c
WHERE {" AND ".join("c" + str(i) + " > 0"
                    for i in range(len(D_SEARCH_TERMS)))}
""",
        # GROUP BY ROLLUP with 'ALL' sentinels at the rolled-up levels
        "orders_rollup": """
SELECT COALESCE(o_orderstatus, 'ALL') AS orderstatus,
  COALESCE(o_orderpriority, 'ALL') AS orderpriority,
  CAST(COUNT(*) AS BIGINT) AS n_orders,
  CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
    AS total_price_cents
FROM orders
GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
""",
        # correlated subquery (orders above their customer's average),
        # decorrelated; the compare is cross-multiplied so no division
        "orders_above_customer_avg": """
WITH o AS (
  SELECT o_orderkey, o_custkey,
    CAST(floor(o_totalprice * 100) AS BIGINT) AS totalprice_cents
  FROM orders),
c AS (
  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS cust_n_orders,
    CAST(SUM(totalprice_cents) AS BIGINT) AS cust_sum_cents
  FROM o GROUP BY 1)
SELECT o.o_orderkey, o.o_custkey, o.totalprice_cents,
  c.cust_n_orders, c.cust_sum_cents
FROM o JOIN c USING (o_custkey)
WHERE o.totalprice_cents * c.cust_n_orders > c.cust_sum_cents
""",
        # GROUP BY CUBE over the orders⋈customer⋈nation chain
        "revenue_cube": """
SELECT COALESCE(n_name, 'ALL') AS nation,
  COALESCE(c_mktsegment, 'ALL') AS mktsegment,
  CAST(COUNT(*) AS BIGINT) AS n_orders,
  CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
    AS total_price_cents
FROM orders
JOIN customer ON c_custkey = o_custkey
JOIN nation ON n_nationkey = c_nationkey
GROUP BY CUBE(n_name, c_mktsegment)
""",
        # PIVOT as conditional aggregation (frozen event-type columns)
        "daily_event_type_pivot": f"""
SELECT date_trunc('day', ts) AS day,
  {", ".join(
      "CAST(SUM(CASE WHEN event_type = '" + t + "' THEN 1 ELSE 0 END) "
      "AS BIGINT) AS n_" + t for t in REL_EVENT_TYPES)},
  CAST(SUM(CASE WHEN event_type = 'purchase'
                THEN CAST(floor(value * 1000) AS BIGINT) ELSE 0 END)
       AS BIGINT) AS value_milli_purchase
FROM events GROUP BY 1
""",
        # deepest join chain: lineitem→orders→customer→nation→region
        "regional_revenue": """
SELECT r.r_name AS region,
  CAST(COUNT(*) AS BIGINT) AS n_items,
  CAST(SUM(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100)
                AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
GROUP BY 1
""",
        # exact discrete quantiles over the fixed-point value: DuckDB
        # quantile_disc picks index ceil(p*n)-1 of the ascending sort —
        # the Ray side uses the same integer index with np.partition
        "event_value_percentiles": """
WITH v AS (
  SELECT event_type, CAST(floor(value * 1000) AS BIGINT) AS vm
  FROM events)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
  quantile_disc(vm, 0.50) AS p50_milli,
  quantile_disc(vm, 0.90) AS p90_milli,
  quantile_disc(vm, 0.99) AS p99_milli
FROM v GROUP BY event_type
""",
        "transcript_simhash_pairs": f"""
WITH raw AS (
  SELECT concat(conv_id, '#', lpad(CAST(turn_idx AS VARCHAR), 8, '0'))
           AS order_key,
         {_SCRUBBED} AS stext
  FROM read_parquet('{tr_glob}')),
tok AS (
  SELECT order_key,
    unnest(list_distinct(regexp_extract_all(lower(stext), '{_TOK}'))) AS t
  FROM raw),
th AS (SELECT order_key, md5_number_upper(t) AS h FROM tok),
v AS (
  SELECT order_key, COUNT(*) AS cnt,
    {sh_bit_sums}
  FROM th GROUP BY order_key),
sim AS (
  SELECT order_key,
    {sh_sim_expr} AS simhash
  FROM v),
ch AS (
  SELECT order_key, simhash, c.range AS chunk_id,
    (simhash >> (c.range * {sh_bits})) & {sh_mask} AS val
  FROM sim CROSS JOIN range(0, {sh_chunks}) c)
SELECT DISTINCT a.order_key AS key_a, b.order_key AS key_b,
  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM ch a JOIN ch b
  ON a.chunk_id = b.chunk_id AND a.val = b.val
 AND a.order_key < b.order_key
WHERE bit_count(xor(a.simhash, b.simhash)) <= {CFG.simhash_max_hamming}
""",
        "scrub_documents": f"""
SELECT doc_id,
  {_SCRUBBED} AS text,
  CAST(len(regexp_extract_all(text, '{_EMAIL}')) AS INTEGER) AS n_email,
  CAST(len(regexp_extract_all({_AFTER_SSN}, '{_PHONE}')) AS INTEGER) AS n_phone,
  CAST(len(regexp_extract_all({_AFTER_EMAIL}, '{_SSN}')) AS INTEGER) AS n_ssn
FROM documents
""",
        "toxicity_documents": f"""
SELECT doc_id,
  CAST(len(regexp_extract_all(lower(text), '{spec.TOXICITY_PATTERN}'))
       AS INTEGER) AS n_toxic,
  CAST(GREATEST(0, 100 - {CFG.toxicity_penalty_mult}
       * len(regexp_extract_all(lower(text), '{spec.TOXICITY_PATTERN}')))
       AS INTEGER) AS toxicity_score,
  regexp_replace(lower(text), '{spec.TOXICITY_PATTERN}',
                 '{spec.TOX_TOKEN}', 'g') AS text_masked
FROM documents
""",
        "quality_documents": _QUALITY_CTE + f"""
SELECT doc_id,
  CAST(n_chars AS BIGINT) AS n_chars,
  CAST(n_tokens AS BIGINT) AS n_tokens,
  CAST(n_distinct AS BIGINT) AS n_distinct,
  CAST(length_score AS INTEGER) AS length_score,
  CAST(repetition_score AS INTEGER) AS repetition_score,
  CAST(symbol_score AS INTEGER) AS symbol_score,
  CAST(boilerplate_score AS INTEGER) AS boilerplate_score,
  CAST(overall AS INTEGER) AS overall_quality_score,
  CASE WHEN overall >= {CFG.keep_action_threshold} THEN 'KEEP'
       WHEN overall >= {CFG.review_action_threshold} THEN 'REVIEW'
       WHEN overall >= {CFG.quarantine_action_threshold} THEN 'QUARANTINE'
       ELSE 'DISCARD' END AS action
FROM q
""",
        "exact_dedup_documents": f"""
SELECT md5(regexp_replace(
         regexp_replace(lower(text), '{spec.EDGE_WS_PATTERN}', '', 'g'),
         '{spec.WS_PLUS_PATTERN}', ' ', 'g')) AS content_hash,
  MIN(doc_id) AS canonical_doc_id,
  CAST(COUNT(*) AS BIGINT) AS n_copies
FROM documents GROUP BY 1
""",
        "near_dup_documents": _PAIR_CTE + f"""
SELECT id_a, id_b, jaccard FROM p WHERE jaccard >= {NEAR_DUP_DOC_JACCARD}
""",
        # near-dup pair mass per unordered source pair — LEAST/GREATEST
        # normalizes the pair exactly like the Ray-side np.minimum/
        # maximum on the source strings
        "near_dup_source_matrix": _PAIR_CTE + f"""
SELECT LEAST(da.source, db.source) AS source_a,
  GREATEST(da.source, db.source) AS source_b,
  CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM (SELECT id_a, id_b FROM p
      WHERE jaccard >= {NEAR_DUP_DOC_JACCARD}) q
JOIN documents da ON da.doc_id = q.id_a
JOIN documents db ON db.doc_id = q.id_b
GROUP BY 1, 2
""",
        # dedup APPLICATION: connected components over the near-dup
        # graph (recursive min-label CTE), keep the min doc_id per
        # cluster — the removal surface, not just pair detection
        "near_dup_kept_documents": f"""
WITH RECURSIVE t AS MATERIALIZED (
  SELECT doc_id,
    list_distinct(regexp_extract_all(lower(text), '{_TOK}')) AS toks
  FROM documents),
p AS MATERIALIZED (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM t a JOIN t b ON a.doc_id < b.doc_id
  WHERE len(a.toks) > 0 AND len(b.toks) > 0
    AND CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
      / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))
      >= {NEAR_DUP_DOC_JACCARD}),
e(src, dst) AS MATERIALIZED (
  SELECT id_a, id_b FROM p UNION ALL SELECT id_b, id_a FROM p),
r(key, lab) AS (
  SELECT src, src FROM e
  UNION
  SELECT e.dst, r.lab FROM r JOIN e ON e.src = r.key),
c AS (SELECT key, MIN(lab) AS cluster FROM r GROUP BY key)
SELECT doc_id FROM documents
WHERE doc_id NOT IN (SELECT key FROM c WHERE key <> cluster)
""",
        # joint quality x length grid over the shared quality CTE
        "quality_length_matrix": _QUALITY_CTE + """
SELECT CAST(overall // 10 AS BIGINT) AS score_bucket,
  CAST(CASE WHEN n_chars = 0 THEN 0
       ELSE length(printf('%b', n_chars)) END AS BIGINT) AS len_bucket,
  CAST(COUNT(*) AS BIGINT) AS n_docs
FROM q GROUP BY 1, 2
""",
        # component-size histogram over the same recursive CTE
        "dup_cluster_size_histogram": f"""
WITH RECURSIVE t AS MATERIALIZED (
  SELECT doc_id,
    list_distinct(regexp_extract_all(lower(text), '{_TOK}')) AS toks
  FROM documents),
p AS MATERIALIZED (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM t a JOIN t b ON a.doc_id < b.doc_id
  WHERE len(a.toks) > 0 AND len(b.toks) > 0
    AND CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
      / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))
      >= {NEAR_DUP_DOC_JACCARD}),
e(src, dst) AS MATERIALIZED (
  SELECT id_a, id_b FROM p UNION ALL SELECT id_b, id_a FROM p),
r(key, lab) AS (
  SELECT src, src FROM e
  UNION
  SELECT e.dst, r.lab FROM r JOIN e ON e.src = r.key),
c AS (SELECT key, MIN(lab) AS cluster FROM r GROUP BY key),
sz AS (SELECT cluster, CAST(COUNT(*) AS BIGINT) AS cluster_size
       FROM c GROUP BY cluster)
SELECT cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters
FROM sz GROUP BY cluster_size
""",
        # quality-aware survivor: same component oracle, but the kept
        # member is the LONGEST (max n_chars, ties -> min doc_id)
        "near_dup_longest_kept_documents": f"""
WITH RECURSIVE t AS MATERIALIZED (
  SELECT doc_id,
    list_distinct(regexp_extract_all(lower(text), '{_TOK}')) AS toks
  FROM documents),
p AS MATERIALIZED (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM t a JOIN t b ON a.doc_id < b.doc_id
  WHERE len(a.toks) > 0 AND len(b.toks) > 0
    AND CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
      / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))
      >= {NEAR_DUP_DOC_JACCARD}),
e(src, dst) AS MATERIALIZED (
  SELECT id_a, id_b FROM p UNION ALL SELECT id_b, id_a FROM p),
r(key, lab) AS (
  SELECT src, src FROM e
  UNION
  SELECT e.dst, r.lab FROM r JOIN e ON e.src = r.key),
c AS (SELECT key, MIN(lab) AS cluster FROM r GROUP BY key),
m AS (
  SELECT c.key, c.cluster, d.n_chars
  FROM c JOIN documents d ON d.doc_id = c.key),
w AS (
  SELECT key, row_number() OVER (
    PARTITION BY cluster ORDER BY n_chars DESC, key) AS rn
  FROM m)
SELECT doc_id FROM documents
WHERE doc_id NOT IN (SELECT key FROM w WHERE rn > 1)
""",
        # deterministic stratified sample: per source, the n docs with
        # the smallest frozen hash of str(doc_id)
        "stratified_sample_documents": f"""
SELECT doc_id, source FROM (
  SELECT doc_id, source,
    row_number() OVER (
      PARTITION BY source
      ORDER BY md5_number_upper(CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents)
WHERE rn <= {SAMPLE_PER_SOURCE}
""",
        # order-sensitive n-gram (word-shingle) Jaccard: shingles built
        # in SQL exactly as the Ray side joins them (single spaces,
        # overlapping windows, then distinct)
        "shingle_near_dup_documents": f"""
WITH tok AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{_TOK}') AS ts
  FROM documents),
sh AS (
  SELECT doc_id, list_distinct(list_transform(
      generate_series(1, len(ts) - {SHINGLE_NGRAM - 1}),
      i -> {shingle_expr})) AS sset
  FROM tok),
p AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
    CAST(len(list_intersect(a.sset, b.sset)) AS DOUBLE)
      / (len(a.sset) + len(b.sset) - len(list_intersect(a.sset, b.sset)))
      AS jaccard
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE len(a.sset) > 0 AND len(b.sset) > 0)
SELECT id_a, id_b, jaccard FROM p
WHERE jaccard >= {SHINGLE_NEAR_DUP_JACCARD}
""",
        "max_similarity_per_doc": _PAIR_CTE + f"""
, nd AS (SELECT * FROM p WHERE jaccard >= {NEAR_DUP_DOC_JACCARD}),
b AS (SELECT id_a AS doc_id, jaccard FROM nd
      UNION ALL SELECT id_b AS doc_id, jaccard FROM nd)
SELECT doc_id, MAX(jaccard) AS max_jaccard FROM b GROUP BY doc_id
""",
        "union_dedup_documents": """
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_rows
FROM (SELECT doc_id FROM documents
      UNION ALL SELECT doc_id FROM documents WHERE doc_id < 100)
GROUP BY doc_id
""",
        "langid_documents": _langid_sql(),
        "quality_by_source": _QUALITY_CTE + """
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(overall) // COUNT(*) AS BIGINT) AS avg_quality
FROM q GROUP BY source
""",
        # log2 length buckets: bit length via the binary rendering's
        # string length (exact; float log2 misrounds near powers of 2)
        "doc_length_histogram": """
SELECT source,
  CAST(CASE WHEN n_chars = 0 THEN 0
       ELSE length(printf('%b', n_chars)) END AS BIGINT)
    AS len_bucket,
  CAST(COUNT(*) AS BIGINT) AS n_docs
FROM documents GROUP BY 1, 2
""",
        # per-source two-sample KS vs the rest of the corpus: CDFs on
        # the union of observed scores (sup attained at a jump),
        # cross-multiplied compare in HUGEINT, milli floor at the end
        "quality_drift_by_source": _QUALITY_CTE + """
, c AS (
  SELECT source, overall, CAST(COUNT(*) AS BIGINT) AS n
  FROM q GROUP BY 1, 2),
tot AS (SELECT source, SUM(n) AS ns FROM c GROUP BY 1),
gtot AS (SELECT SUM(n) AS ng FROM c),
grid AS (
  SELECT s.source, v.overall
  FROM (SELECT DISTINCT source FROM c) s,
       (SELECT DISTINCT overall FROM c) v),
cum AS (
  SELECT g.source, g.overall,
    COALESCE((SELECT SUM(n) FROM c
              WHERE c.source = g.source
                AND c.overall <= g.overall), 0) AS cs,
    (SELECT SUM(n) FROM c WHERE c.overall <= g.overall) AS cg
  FROM grid g),
k AS (
  SELECT cum.source, tot.ns, gtot.ng,
    MAX(abs(CAST(cs AS HUGEINT) * (gtot.ng - tot.ns)
            - CAST(cg - cs AS HUGEINT) * tot.ns)) AS num
  FROM cum JOIN tot ON tot.source = cum.source, gtot
  GROUP BY 1, 2, 3)
SELECT source, CAST(ns AS BIGINT) AS n_docs,
  CAST(CASE WHEN ng = ns THEN 0
       ELSE (1000 * num)
            // (CAST(ns AS HUGEINT) * (ng - ns)) END AS BIGINT)
    AS ks_milli
FROM k
""",
        # partitioned PERCENT_RANK as an exact integer (micro units):
        # RANK with ties = 1 + count of strictly-lower scores, so the
        # pipeline's broadcast-histogram lookup matches SQL's window
        "quality_percentile_by_source": _QUALITY_CTE + """
SELECT doc_id, source, CAST(overall AS BIGINT) AS overall,
  CASE WHEN COUNT(*) OVER (PARTITION BY source) <= 1 THEN 0
       ELSE CAST((RANK() OVER (PARTITION BY source ORDER BY overall)
                  - 1) * 1000000
                 // (COUNT(*) OVER (PARTITION BY source) - 1)
                 AS BIGINT) END AS pr_micro
FROM q
""",
        "daily_event_metrics": """
SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(SUM(CAST(floor(value * 1000) AS BIGINT)) // COUNT(*) AS BIGINT)
    AS avg_value_milli
FROM events GROUP BY 1, 2
""",
        # gap-filled calendar spine: generate_series over the observed
        # day range x the type domain, zero-filled LEFT JOIN
        "daily_event_type_dense": """
WITH e AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day, event_type FROM events),
a AS (
  SELECT day, event_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM e GROUP BY 1, 2),
spine AS (
  SELECT strftime(unnest(generate_series(
    (SELECT CAST(MIN(CAST(day AS DATE)) AS TIMESTAMP) FROM a),
    (SELECT CAST(MAX(CAST(day AS DATE)) AS TIMESTAMP) FROM a),
    INTERVAL '1' DAY)), '%Y-%m-%d') AS day),
ty AS (SELECT DISTINCT event_type FROM e)
SELECT spine.day, ty.event_type,
  COALESCE(a.n, 0) AS n_events
FROM spine CROSS JOIN ty
LEFT JOIN a ON a.day = spine.day AND a.event_type = ty.event_type
""",
        "top_users_by_value": """
SELECT user_id,
  CAST(SUM(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT)
    AS total_value_milli,
  CAST(COUNT(*) AS BIGINT) AS n_events
FROM events GROUP BY user_id
ORDER BY total_value_milli DESC, user_id LIMIT 20
""",
        "timeliness_events": f"""
WITH m AS (SELECT MAX(ts) AS mt FROM events)
SELECT event_id,
  (epoch_us(m.mt) - epoch_us(ts)) // 86400000000 AS age_days,
  CAST(CASE WHEN (epoch_us(m.mt) - epoch_us(ts)) // 86400000000
              > {CFG.timeliness_max_age_days}
            THEN {CFG.timeliness_cap} ELSE 100 END AS INTEGER)
    AS timeliness_score
FROM events, m
""",
        "latest_event_per_user": """
SELECT user_id, event_id AS last_event_id,
  event_type AS last_event_type,
  CAST(floor(value * 1000) AS BIGINT) AS last_value_milli
FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        ORDER BY ts DESC, event_id DESC) AS rn FROM events)
WHERE rn = 1
""",
        "event_windows": """
SELECT epoch_us(ts) // 3600000000 AS window_hour, event_type,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(SUM(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT)
    AS sum_value_milli
FROM events GROUP BY 1, 2
""",
        # sliding windows: each event expands to the 4 hop-aligned
        # window starts covering it (window 1 h, hop 15 min)
        "sliding_event_windows": """
SELECT (epoch_us(ts) // 900000000) - r.range AS window_start_q,
  event_type,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(SUM(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT)
    AS sum_value_milli
FROM events CROSS JOIN range(0, 4) r
GROUP BY 1, 2
""",
        "user_sessions": """
WITH o AS (SELECT event_id, user_id, epoch_us(ts) AS tus,
             CAST(floor(value * 1000) AS BIGINT) AS v FROM events),
m AS (SELECT *, CASE WHEN lag(tus) OVER w IS NULL
                       OR tus - lag(tus) OVER w > 1800000000
                     THEN 1 ELSE 0 END AS new_s
      FROM o WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)),
s AS (SELECT *, SUM(new_s) OVER (PARTITION BY user_id
        ORDER BY tus, event_id ROWS UNBOUNDED PRECEDING) AS session_no
      FROM m)
SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
  MIN(tus) AS session_start_us,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(SUM(v) AS BIGINT) AS sum_value_milli
FROM s GROUP BY 1, 2
""",
        "ann_topk_embeddings": f"""
WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
           FROM embeddings WHERE vec_id IN ({ann_ids})),
c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
      FROM embeddings WHERE vec_id NOT IN ({ann_ids})),
s AS (SELECT q.query_id, c.vec_id,
        list_cosine_similarity(q.qe, c.e) AS sim,
        row_number() OVER (PARTITION BY q.query_id
                           ORDER BY list_cosine_similarity(q.qe, c.e) DESC,
                                    c.vec_id) AS rank
      FROM q, c)
SELECT query_id, vec_id, round(sim, 6) AS cosine_sim,
  CAST(rank AS BIGINT) AS rank
FROM s WHERE rank <= {ANN_K}
""",
        # nprobe=1 IVF with deterministic seed centroids: assignment
        # (round-6 / smallest-cid ties) replayed per vector, each
        # query reranked only within its own centroid's partition
        "ivf_exact_topk_embeddings": f"""
WITH c AS (
  SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS ce
  FROM embeddings WHERE vec_id < {KMEANS_K}),
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
      FROM embeddings),
a AS (
  SELECT e.vec_id, c.cid,
    row_number() OVER (
      PARTITION BY e.vec_id
      ORDER BY round(list_cosine_similarity(e.emb, c.ce), 6) DESC,
               c.cid) AS rn
  FROM e, c),
asg AS (SELECT vec_id, cid FROM a WHERE rn = 1),
q AS (SELECT e.vec_id AS query_id, e.emb AS qe, asg.cid AS qcid
      FROM e JOIN asg USING (vec_id)
      WHERE e.vec_id IN ({ann_ids})),
corp AS (SELECT e.vec_id, e.emb, asg.cid FROM e JOIN asg USING (vec_id)
         WHERE e.vec_id NOT IN ({ann_ids})),
s AS (SELECT q.query_id, corp.vec_id,
        list_cosine_similarity(q.qe, corp.emb) AS sim,
        row_number() OVER (
          PARTITION BY q.query_id
          ORDER BY list_cosine_similarity(q.qe, corp.emb) DESC,
                   corp.vec_id) AS rank
      FROM q JOIN corp ON corp.cid = q.qcid)
SELECT query_id, vec_id, round(sim, 6) AS cosine_sim,
  CAST(rank AS BIGINT) AS rank
FROM s WHERE rank <= {ANN_K}
""",
        # int8-quantized ANN: EXACT integer dot products (clamp-floor
        # quantization identical on both sides), ties by vec_id asc
        "int8_ann_embeddings": f"""
WITH q8 AS (
  SELECT vec_id,
    list_transform(CAST(embedding AS DOUBLE[]),
      x -> GREATEST(-127, LEAST(127,
             CAST(floor(x * {D_INT8_SCALE}) AS BIGINT)))) AS qv
  FROM embeddings),
qs AS (SELECT vec_id AS query_id, qv AS qq FROM q8
       WHERE vec_id IN ({ann_ids})),
cs AS (SELECT vec_id, qv FROM q8 WHERE vec_id NOT IN ({ann_ids})),
s AS (
  SELECT qs.query_id, cs.vec_id,
    CAST(list_dot_product(qs.qq, cs.qv) AS BIGINT) AS int_dot,
    row_number() OVER (
      PARTITION BY qs.query_id
      ORDER BY list_dot_product(qs.qq, cs.qv) DESC, cs.vec_id)
      AS rank
  FROM qs, cs)
SELECT query_id, vec_id, int_dot, CAST(rank AS BIGINT) AS rank
FROM s WHERE rank <= {ANN_K}
""",
        "embedding_near_dup": f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
           FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
  round(list_cosine_similarity(a.emb, b.emb), 6) AS cosine_sim
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.emb, b.emb) >= {EMB_NEAR_DUP_COSINE}
""",
        # k-means assignment step: nearest of the K seed centroids
        # (vec_id < K) by cosine rounded to 6; ties -> smallest id —
        # ORDER BY the rounded value mirrors the Ray argmax exactly
        "kmeans_assign_embeddings": f"""
WITH c AS (
  SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS ce
  FROM embeddings WHERE vec_id < {KMEANS_K}),
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
      FROM embeddings),
s AS (
  SELECT e.vec_id, c.cid,
    round(list_cosine_similarity(e.emb, c.ce), 6) AS sim,
    row_number() OVER (
      PARTITION BY e.vec_id
      ORDER BY round(list_cosine_similarity(e.emb, c.ce), 6) DESC,
               c.cid) AS rn
  FROM e, c)
SELECT vec_id, cid AS centroid_id, sim AS cosine_sim
FROM s WHERE rn = 1
""",
        # cluster-balanced sample: kmeans_assign oracle + the
        # mixture_allocation_plan largest-remainder recipe at cluster
        # grain + per-cluster top-alloc by (sim DESC, vec_id)
        "cluster_balanced_sample_embeddings": f"""
WITH c AS (
  SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS ce
  FROM embeddings WHERE vec_id < {KMEANS_K}),
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
      FROM embeddings),
s AS (
  SELECT e.vec_id, c.cid,
    round(list_cosine_similarity(e.emb, c.ce), 6) AS sim,
    row_number() OVER (
      PARTITION BY e.vec_id
      ORDER BY round(list_cosine_similarity(e.emb, c.ce), 6) DESC,
               c.cid) AS rn
  FROM e, c),
asn AS (SELECT vec_id, cid AS centroid_id, sim FROM s WHERE rn = 1),
cz AS (
  SELECT centroid_id, CAST(COUNT(*) AS BIGINT) AS n
  FROM asn GROUP BY centroid_id),
w AS (SELECT *, CAST(floor(sqrt(n * {float(MIXTURE_SQRT_SCALE)}))
        AS BIGINT) AS sq FROM cz),
t2 AS (SELECT *, GREATEST((SELECT SUM(sq) FROM w), 1) AS tot FROM w),
q AS (
  SELECT centroid_id,
    ({CLUSTER_SAMPLE_BUDGET} * sq) // tot AS base,
    ({CLUSTER_SAMPLE_BUDGET} * sq) % tot AS rem
  FROM t2),
al AS (
  SELECT centroid_id,
    base + CASE WHEN row_number() OVER (ORDER BY rem DESC, centroid_id)
                <= {CLUSTER_SAMPLE_BUDGET} - (SELECT SUM(base) FROM q)
           THEN 1 ELSE 0 END AS alloc
  FROM q),
rk AS (
  SELECT asn.*, row_number() OVER (
    PARTITION BY centroid_id ORDER BY sim DESC, vec_id) AS rr
  FROM asn)
SELECT rk.vec_id, rk.centroid_id
FROM rk JOIN al ON al.centroid_id = rk.centroid_id
WHERE rk.rr <= al.alloc
""",
        # SSL-prototypes pruning: kmeans_assign oracle + per-cluster
        # n_target-th smallest round-6 sim as the strict-below cutoff
        # (no tie-break needed: equal-sim boundary members all survive)
        "prototype_pruned_embeddings": f"""
WITH c AS (
  SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS ce
  FROM embeddings WHERE vec_id < {KMEANS_K}),
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
      FROM embeddings),
s AS (
  SELECT e.vec_id, c.cid,
    round(list_cosine_similarity(e.emb, c.ce), 6) AS sim,
    row_number() OVER (
      PARTITION BY e.vec_id
      ORDER BY round(list_cosine_similarity(e.emb, c.ce), 6) DESC,
               c.cid) AS rn
  FROM e, c),
asn AS (SELECT vec_id, cid AS centroid_id, sim FROM s WHERE rn = 1),
cz AS (SELECT centroid_id, COUNT(*) AS n FROM asn GROUP BY centroid_id),
rk AS (
  SELECT asn.*, row_number() OVER (
    PARTITION BY centroid_id ORDER BY sim, vec_id) AS rr
  FROM asn),
cut AS (
  SELECT rk.centroid_id, rk.sim AS s_star
  FROM rk JOIN cz ON cz.centroid_id = rk.centroid_id
  WHERE (cz.n * {PROTO_PRUNE_PCT}) // 100 >= 1
    AND rk.rr = (cz.n * {PROTO_PRUNE_PCT}) // 100)
SELECT a.vec_id, a.centroid_id,
  NOT (cut.s_star IS NOT NULL AND a.sim < cut.s_star) AS kept
FROM asn a LEFT JOIN cut ON cut.centroid_id = a.centroid_id
""",
        # SemDeDup: the kmeans_assign oracle composed with a
        # within-cluster EXISTS self-join — a vector is dropped iff a
        # LOWER-id member of its own cluster has round-6 cosine >= tau
        # (identical rounded compare on the Ray side)
        "semantic_dedup_embeddings": f"""
WITH c AS (
  SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS ce
  FROM embeddings WHERE vec_id < {KMEANS_K}),
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
      FROM embeddings),
s AS (
  SELECT e.vec_id, c.cid,
    row_number() OVER (
      PARTITION BY e.vec_id
      ORDER BY round(list_cosine_similarity(e.emb, c.ce), 6) DESC,
               c.cid) AS rn
  FROM e, c),
asn AS (SELECT vec_id, cid AS centroid_id FROM s WHERE rn = 1),
hits AS (
  SELECT DISTINCT a.vec_id
  FROM asn a
  JOIN asn b ON a.centroid_id = b.centroid_id AND b.vec_id < a.vec_id
  JOIN e ea ON ea.vec_id = a.vec_id
  JOIN e eb ON eb.vec_id = b.vec_id
  WHERE round(list_cosine_similarity(ea.emb, eb.emb), 6)
        >= {SEMDEDUP_TAU})
SELECT asn.vec_id, asn.centroid_id,
       (hits.vec_id IS NULL) AS kept
FROM asn LEFT JOIN hits ON asn.vec_id = hits.vec_id
""",
        # rolling fingerprint: same fold as spec.rolling_fingerprint —
        # HUGEINT accumulator keeps h*FP_MULT (< 2^84) exact; % 2^64 each
        # step == numpy uint64 wraparound on the Ray side
        "doc_sketches": f"""
WITH n AS (
  SELECT doc_id,
    regexp_replace(regexp_replace(lower(text), '{spec.EDGE_WS_PATTERN}',
                   '', 'g'), '{spec.WS_PLUS_PATTERN}', ' ', 'g') AS s
  FROM documents)
SELECT doc_id,
  md5(s) AS content_hash,
  CASE WHEN length(s) = 0 THEN CAST({spec.FP_OFFSET} AS UBIGINT)
       ELSE CAST(list_reduce(
         list_prepend(CAST({spec.FP_OFFSET} AS HUGEINT),
           list_transform(string_split(s, ''),
                          x -> CAST(ord(x) AS HUGEINT))),
         (h, c) -> (h * {spec.FP_MULT} + c) % 18446744073709551616)
       AS UBIGINT)
  END AS fingerprint
FROM n
""",
        # per-document SimHash signature entirely in SQL (same kernel as
        # the transcript_simhash_pairs oracle: md5_number_upper == the
        # frozen token hash, 64 per-bit vote sums); token-less docs get
        # the all-zero signature via the LEFT JOIN
        "doc_sim_sketches": f"""
WITH tok AS (
  SELECT doc_id,
    unnest(list_distinct(regexp_extract_all(lower(text), '{_TOK}'))) AS t
  FROM documents),
th AS (SELECT doc_id, md5_number_upper(t) AS h FROM tok),
v AS (
  SELECT doc_id, COUNT(*) AS cnt,
    {sh_bit_sums}
  FROM th GROUP BY doc_id),
sim AS (
  SELECT doc_id,
    {sh_sim_expr} AS simhash
  FROM v)
SELECT d.doc_id,
  COALESCE(s.simhash, CAST(0 AS UBIGINT)) AS simhash
FROM documents d LEFT JOIN sim s ON s.doc_id = d.doc_id
""",
        # MinHash signature in LSH band layout entirely in SQL (same
        # limb-arithmetic mulmod as the transcript_near_dup_pairs
        # oracle); token-less docs get the all-max signature
        "doc_minhash_bands": f"""
WITH tok AS (
  SELECT doc_id,
    unnest(list_distinct(regexp_extract_all(lower(text), '{_TOK}'))) AS t
  FROM documents),
th AS (SELECT doc_id, md5_number_upper(t) AS h FROM tok),
perm(p, a, b) AS (VALUES
    {mh_perms}),
hu AS (SELECT DISTINCT h FROM th),
hperm AS (
  SELECT h, p, {mh_mulmod} AS pv
  FROM hu CROSS JOIN perm),
mh AS (
  SELECT t.doc_id, hp.p, MIN(hp.pv) AS m
  FROM th t JOIN hperm hp ON hp.h = t.h GROUP BY 1, 2),
band AS (
  SELECT doc_id, p // {CFG.lsh_rows} AS band_id,
    {mh_band_vals}
  FROM mh GROUP BY 1, 2)
SELECT d.doc_id, CAST(r.range AS BIGINT) AS band_id,
  {mh_band_sel}
FROM documents d CROSS JOIN range(0, {CFG.lsh_bands}) r
LEFT JOIN band b ON b.doc_id = d.doc_id AND b.band_id = r.range
""",
    }


def oracle_sql() -> dict[str, str]:
    sql = _oracle_sql_impl()
    # evidence strings for the SQL-expressible dims, generated from
    # spec.DIM_EVIDENCE_TEMPLATES over the turn-quality oracle's score
    # columns — template edits flow into BOTH engines from one place
    ev_cols = []
    for name in SQL_EVIDENCE_DIMS:
        tmpl = spec.DIM_EVIDENCE_TEMPLATES[name]
        expr = SQL_EVIDENCE_DIM_EXPRS[name]
        if "{score}" in tmpl:
            pre, suf = tmpl.split("{score}")
            e = f"'{pre}' || CAST({expr} AS VARCHAR)"
            if suf:
                e += f" || '{suf}'"
        else:
            e = f"'{tmpl}'"
        ev_cols.append(f"{e} AS ev_{name}")
    ev_select = ",\n  ".join(ev_cols)
    sql["transcript_dim_evidence"] = f"""
WITH q AS ({sql['transcript_turn_quality']})
SELECT conv_id, turn_idx,
  {ev_select}
FROM q
"""
    # dimension co-failure matrix over the same score expressions —
    # zipped parallel unnests pivot the 11 dims long, then a
    # within-turn self-join counts pairs below the review threshold
    cf_names = sorted(SQL_EVIDENCE_DIMS)
    cf_name_list = ", ".join(f"'{n}'" for n in cf_names)
    cf_expr_list = ", ".join(SQL_EVIDENCE_DIM_EXPRS[n] for n in cf_names)
    sql["transcript_dim_cofail"] = f"""
WITH q AS ({sql['transcript_turn_quality']}),
d AS (
  SELECT conv_id, turn_idx,
    unnest([{cf_name_list}]) AS dim,
    unnest([{cf_expr_list}]) AS score
  FROM q),
f AS (
  SELECT conv_id, turn_idx, dim FROM d
  WHERE score < {CFG.review_action_threshold})
SELECT a.dim AS dim_a, b.dim AS dim_b,
  CAST(COUNT(*) AS BIGINT) AS n_cofail
FROM f a JOIN f b
  ON a.conv_id = b.conv_id AND a.turn_idx = b.turn_idx
 AND a.dim <= b.dim
GROUP BY 1, 2
"""
    # near-dup split leakage: the conv near-dup pair table joined with
    # the frozen md5 80/10/10 split rule (a pure function of conv_id)
    from dataquality_ray.pipelines.documents import (
        SPLIT_BUCKETS as _SB,
        SPLIT_TRAIN_LT as _ST,
        SPLIT_VAL_LT as _SV,
    )

    def _split_case(col: str) -> str:
        return (f"CASE WHEN md5_number_upper({col}) % {_SB} < {_ST} "
                f"THEN 'train' WHEN md5_number_upper({col}) % {_SB} "
                f"< {_SV} THEN 'val' ELSE 'test' END")

    sql["conv_near_dup_split_leakage"] = f"""
WITH p AS ({sql['conv_near_dup_pairs']}),
s AS (
  SELECT conv_a, conv_b, jaccard_milli,
    {_split_case('conv_a')} AS split_a,
    {_split_case('conv_b')} AS split_b
  FROM p)
SELECT conv_a, conv_b, split_a, split_b, jaccard_milli
FROM s WHERE split_a <> split_b
"""
    # the join-strategy LSH variant is output-identical to the carry
    # variant (tested in tests/test_pipeline_e2e.py) — same oracle
    sql["transcript_near_dup_pairs_join"] = sql["transcript_near_dup_pairs"]
    # connected components over the SAME SQL-derived edge set: directed
    # edges + recursive min-label reachability, cluster = min key of
    # the component — the oracle for dup_clusters_auto's output
    sql["transcript_dup_clusters"] = f"""
WITH RECURSIVE
p AS MATERIALIZED (
  SELECT key_a, key_b FROM ({sql['transcript_near_dup_pairs']})),
e(src, dst) AS MATERIALIZED (
  SELECT key_a, key_b FROM p
  UNION ALL SELECT key_b, key_a FROM p),
r(key, lab) AS (
  SELECT src, src FROM e
  UNION
  SELECT e.dst, r.lab FROM r JOIN e ON e.src = r.key)
SELECT key, MIN(lab) AS cluster FROM r GROUP BY key
"""
    # generation -> search, end to end: ANN over the SQL-replayed
    # embeddings (doc_embedding_values), zero-vector convention
    # preserved (cosine 0, matching stages/similarity._normalize)
    sql["doc_embedding_ann"] = f"""
WITH v AS ({sql['doc_embedding_values']}),
emb AS (
  SELECT doc_id, list(val ORDER BY dim) AS e,
    sqrt(list_dot_product(list(val ORDER BY dim),
                          list(val ORDER BY dim))) AS nrm
  FROM v GROUP BY doc_id),
q AS (SELECT doc_id AS query_id, e AS qe, nrm AS qn FROM emb
      WHERE doc_id IN (0, 1, 2, 3, 4)),
c AS (SELECT doc_id, e, nrm FROM emb
      WHERE doc_id NOT IN (0, 1, 2, 3, 4)),
s AS (
  SELECT q.query_id, c.doc_id AS vec_id,
    CASE WHEN q.qn = 0 OR c.nrm = 0 THEN 0.0
         ELSE list_cosine_similarity(q.qe, c.e) END AS sim
  FROM q, c),
r2 AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY sim DESC, vec_id) AS rank
  FROM s)
SELECT query_id, vec_id, round(sim, 6) AS cosine_sim,
  CAST(rank AS BIGINT) AS rank
FROM r2 WHERE rank <= 5
"""
    # the refine variant computes the identical exact discrete
    # quantiles (different distributed shape, same contract)
    sql["event_value_percentiles_refine"] = \
        sql["event_value_percentiles"]
    # filter-threshold survival curve over the SAME hash-checked
    # quality_documents scores (composition keeps the two in lockstep)
    sql["quality_threshold_curve"] = f"""
WITH q AS ({sql['quality_documents']}),
t AS (SELECT unnest(generate_series(0, 100)) AS threshold),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM q)
SELECT CAST(t.threshold AS BIGINT) AS threshold,
  CAST((SELECT COUNT(*) FROM q
        WHERE overall_quality_score >= t.threshold) AS BIGINT)
    AS n_kept,
  CAST((SELECT COUNT(*) FROM q
        WHERE overall_quality_score >= t.threshold) * 1000000
       // GREATEST(n.total, 1) AS BIGINT) AS kept_ppm
FROM t, n
"""
    # --- round-5 session-8 batch: preference mining, privacy audit,
    #     repetition planning, shard balancing, product quantization ---
    import os

    from dataquality_ray.fixtures import transcripts_path as _tr_path
    from dataquality_ray.pipelines.conversations import (
        _PREF_TSPAN as _PTS,
    )
    from dataquality_ray.pipelines.documents import (
        ANN_K as _PQ_ANN_K,
        ANN_QUERY_IDS as _PQ_QIDS,
        EPOCH_BUDGET_MULT,
        INT8_SCALE as _PQ_INT8,
        K_ANON,
        MAX_EPOCHS,
        MIXTURE_SQRT_SCALE as _EP_SCALE,
        N_SHARDS,
        PQ_K,
        PQ_SUB,
    )
    _tr_glob = os.path.join(_tr_path(20_000, seed=CFG.seed), "*.parquet")
    # preference-pair mining: hscore = the six SQL dims of the
    # turn-quality oracle; packed-key argmax/argmin (ties -> lower
    # turn_idx) identical to the Ray fold's integer arithmetic
    sql["conv_preference_pairs"] = f"""
WITH q AS ({sql['transcript_turn_quality']}),
r AS (SELECT conv_id, turn_idx, role FROM read_parquet('{_tr_glob}')),
a AS (
  SELECT q.conv_id, CAST(q.turn_idx AS BIGINT) AS ti,
    CAST(q.length_score + q.repetition_score + q.symbol_score
       + q.boilerplate_score + q.toxicity_score + q.timeliness_score
       AS BIGINT) AS h
  FROM q JOIN r ON r.conv_id = q.conv_id AND r.turn_idx = q.turn_idx
  WHERE r.role = 'assistant'),
g AS (
  SELECT conv_id, CAST(COUNT(*) AS BIGINT) AS n_assistant,
    MAX(h * {_PTS} + ({_PTS} - 1 - ti)) AS km,
    MIN(h * {_PTS} + ti) AS kn
  FROM a GROUP BY conv_id)
SELECT conv_id, n_assistant,
  CAST({_PTS} - 1 - (km % {_PTS}) AS BIGINT) AS chosen_idx,
  CAST(km // {_PTS} AS BIGINT) AS chosen_score,
  CAST(kn % {_PTS} AS BIGINT) AS rejected_idx,
  CAST(kn // {_PTS} AS BIGINT) AS rejected_score,
  CAST(km // {_PTS} - kn // {_PTS} AS BIGINT) AS margin
FROM g
WHERE n_assistant >= 2 AND km // {_PTS} > kn // {_PTS}
"""
    # k-anonymity over (lang, source, exact bit-length bucket)
    sql["k_anonymity_documents"] = f"""
WITH t AS (
  SELECT lang, source,
    CAST(CASE WHEN n_chars <= 0 THEN 0
         ELSE length(printf('%b', n_chars)) END AS BIGINT)
      AS len_bucket
  FROM documents)
SELECT lang, source, len_bucket,
  CAST(COUNT(*) AS BIGINT) AS group_size,
  COUNT(*) >= {K_ANON} AS k_anonymous
FROM t GROUP BY lang, source, len_bucket
"""
    # data-constrained epoch plan: HUGEINT keeps MULT*total*sq exact
    # (the Ray side uses Python big ints on the driver)
    sql["epoch_plan_by_source"] = f"""
WITH g AS (
  SELECT source, CAST(SUM(n_chars) AS BIGINT) AS c
  FROM documents GROUP BY source),
w AS (SELECT source, c,
    CAST(floor(sqrt(c * {float(_EP_SCALE)})) AS BIGINT) AS sq
  FROM g),
t AS (SELECT *,
    (SELECT GREATEST(SUM(sq), 1) FROM w) AS tot_sq,
    (SELECT SUM(c) FROM w) AS tot_c
  FROM w),
a AS (SELECT source, c,
    CAST(({EPOCH_BUDGET_MULT}::HUGEINT * tot_c * sq) // tot_sq
      AS BIGINT) AS alloc
  FROM t),
e AS (SELECT source, c, alloc,
    CASE WHEN c = 0 THEN 0
         ELSE LEAST({MAX_EPOCHS}, (alloc + c - 1) // c) END AS ep
  FROM a)
SELECT source, c AS sum_chars, alloc AS alloc_chars,
  CAST(ep AS BIGINT) AS epochs,
  CAST(LEAST(alloc, ep * c) AS BIGINT) AS achieved_chars,
  CAST(alloc - LEAST(alloc, ep * c) AS BIGINT) AS shortfall_chars
FROM e
"""
    # balanced shard plan: longest-first round-robin dealing
    sql["shard_plan_documents"] = f"""
WITH r AS (
  SELECT doc_id, n_chars,
    row_number() OVER (ORDER BY n_chars DESC, doc_id) - 1 AS rank0
  FROM documents)
SELECT CAST(rank0 % {N_SHARDS} AS BIGINT) AS shard,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
  CAST(MAX(n_chars) AS BIGINT) AS max_chars,
  CAST(MIN(n_chars) AS BIGINT) AS min_chars
FROM r GROUP BY rank0 % {N_SHARDS}
"""
    # product quantization: int8 subvectors (the proven int8_ann
    # clamp-floor recipe) against the PQ_K seed codebook, EXACT
    # integer dots throughout; list slices are dim-agnostic
    _pq_q8 = f"""q8 AS (
  SELECT vec_id,
    list_transform(CAST(embedding AS DOUBLE[]),
      x -> GREATEST(-127, LEAST(127,
             CAST(floor(x * {_PQ_INT8}) AS BIGINT)))) AS qv
  FROM embeddings)"""
    _pq_sub_parts = "\nUNION ALL ".join(
        f"SELECT vec_id, CAST({s} AS BIGINT) AS subspace, "
        f"list_slice(qv, 1 + {s} * (len(qv) // {PQ_SUB}), "
        f"({s} + 1) * (len(qv) // {PQ_SUB})) AS sv FROM q8"
        for s in range(PQ_SUB))
    _pq_common = f"""WITH {_pq_q8},
sub AS ({_pq_sub_parts}),
cb AS (SELECT vec_id AS cid, subspace, sv AS cv
       FROM sub WHERE vec_id < {PQ_K})"""
    sql["pq_codes_embeddings"] = f"""
{_pq_common},
s AS (
  SELECT sub.vec_id, sub.subspace, cb.cid,
    CAST(list_dot_product(sub.sv, cb.cv) AS BIGINT) AS d,
    row_number() OVER (PARTITION BY sub.vec_id, sub.subspace
      ORDER BY list_dot_product(sub.sv, cb.cv) DESC, cb.cid) AS rn
  FROM sub JOIN cb ON cb.subspace = sub.subspace)
SELECT vec_id, subspace, cid AS code, d AS int_dot
FROM s WHERE rn = 1
"""
    _pq_ann_ids = ", ".join(str(i) for i in _PQ_QIDS)
    sql["pq_ann_topk_embeddings"] = f"""
{_pq_common},
s AS (
  SELECT sub.vec_id, sub.subspace, cb.cid,
    row_number() OVER (PARTITION BY sub.vec_id, sub.subspace
      ORDER BY list_dot_product(sub.sv, cb.cv) DESC, cb.cid) AS rn
  FROM sub JOIN cb ON cb.subspace = sub.subspace
  WHERE sub.vec_id NOT IN ({_pq_ann_ids})),
codes AS (SELECT vec_id, subspace, cid AS code FROM s WHERE rn = 1),
lut AS (
  SELECT sub.vec_id AS query_id, sub.subspace, cb.cid,
    CAST(list_dot_product(sub.sv, cb.cv) AS BIGINT) AS d
  FROM sub JOIN cb ON cb.subspace = sub.subspace
  WHERE sub.vec_id IN ({_pq_ann_ids})),
sc AS (
  SELECT l.query_id, c.vec_id, CAST(SUM(l.d) AS BIGINT) AS adc
  FROM codes c JOIN lut l
    ON l.subspace = c.subspace AND l.cid = c.code
  GROUP BY 1, 2),
r2 AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY adc DESC, vec_id) AS rank
  FROM sc)
SELECT query_id, vec_id, adc AS adc_dot, CAST(rank AS BIGINT) AS rank
FROM r2 WHERE rank <= {_PQ_ANN_K}
"""
    from dataquality_ray.pipelines.conversations import VERB_TOP_K
    from dataquality_ray.pipelines.documents import COVERAGE_MAX_K
    # instruction-diversity census: first-token openers of user turns
    sql["instruction_verb_census"] = f"""
WITH u AS (
  SELECT NULLIF(regexp_extract(lower(text), '{_TOK}'), '') AS tok
  FROM read_parquet('{_tr_glob}') WHERE role = 'user')
SELECT tok AS token, CAST(COUNT(*) AS BIGINT) AS n_turns
FROM u WHERE tok IS NOT NULL
GROUP BY tok ORDER BY n_turns DESC, tok LIMIT {VERB_TOP_K}
"""
    # tokenizer-planning coverage curve: exact tie-aware prefix mass
    # over the (cf, n_terms) histogram — boundary row = largest cf
    # whose cumulative term count reaches the vocab size
    sql["vocab_coverage_curve"] = f"""
WITH t AS (
  SELECT unnest(regexp_extract_all(lower(text), '{_TOK}')) AS term
  FROM documents),
tc AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS cf
       FROM t GROUP BY term),
h AS (SELECT cf, CAST(COUNT(*) AS BIGINT) AS nt FROM tc GROUP BY cf),
c AS (SELECT cf, nt,
    SUM(nt) OVER (ORDER BY cf DESC) AS cum_t,
    SUM(cf * nt) OVER (ORDER BY cf DESC) AS cum_m
  FROM h),
tot AS (SELECT COALESCE(SUM(nt), 0) AS v,
               COALESCE(SUM(cf * nt), 0) AS m FROM h),
ks AS (SELECT unnest(generate_series(0, {COVERAGE_MAX_K})) AS k),
vk AS (SELECT k,
    LEAST(1::BIGINT << k, (SELECT v FROM tot)) AS vsize FROM ks)
SELECT CAST(vk.k AS BIGINT) AS k,
  CAST(vk.vsize AS BIGINT) AS vocab_size,
  CAST(COALESCE((SELECT cum_m - (cum_t - vk.vsize) * cf FROM c
        WHERE cum_t >= vk.vsize ORDER BY cf DESC LIMIT 1), 0)
    AS BIGINT) AS covered_cf,
  CAST((SELECT m FROM tot) AS BIGINT) AS total_cf,
  CAST(COALESCE((SELECT cum_m - (cum_t - vk.vsize) * cf FROM c
        WHERE cum_t >= vk.vsize ORDER BY cf DESC LIMIT 1), 0)
       * 1000000 // GREATEST((SELECT m FROM tot), 1) AS BIGINT)
    AS coverage_ppm
FROM vk
"""
    # semantic source-similarity matrix: pairwise round-6 cosine of
    # the exact int64 centroid accumulator sums (cosine is invariant
    # to the 1/n scaling), zero-norm -> 0 like doc_embedding_ann
    sql["source_centroid_similarity"] = f"""
WITH c AS ({sql['source_embedding_centroids']}),
v AS (
  SELECT source,
    list(CAST(sum_acc AS DOUBLE) ORDER BY dim) AS e
  FROM c GROUP BY source),
n AS (SELECT source, e,
      sqrt(list_dot_product(e, e)) AS nrm FROM v)
SELECT a.source AS source_a, b.source AS source_b,
  round(CASE WHEN a.nrm = 0 OR b.nrm = 0 THEN 0.0
        ELSE list_dot_product(a.e, b.e) / (a.nrm * b.nrm) END, 6)
    AS cosine_sim
FROM n a JOIN n b ON a.source < b.source
"""
    _norm_doc = (f"regexp_replace(regexp_replace(lower(COALESCE(text, "
                 f"'')), '{spec.EDGE_WS_PATTERN}', '', 'g'), "
                 f"'{spec.WS_PLUS_PATTERN}', ' ', 'g')")
    # cross-source exact-duplication matrix: pair mass from per-
    # (hash, source) copy counts — n_a*n_b across, C(n,2) within
    sql["exact_dup_source_matrix"] = f"""
WITH nn AS (SELECT source, {_norm_doc} AS s FROM documents),
c AS (
  SELECT md5(s) AS h, source, CAST(COUNT(*) AS BIGINT) AS n
  FROM nn WHERE length(s) > 0 GROUP BY 1, 2),
x AS (
  SELECT a.source AS sa, b.source AS sb, a.n * b.n AS p, a.h
  FROM c a JOIN c b ON a.h = b.h AND a.source < b.source
  UNION ALL
  SELECT source, source, n * (n - 1) // 2, h FROM c WHERE n >= 2),
s AS (SELECT DISTINCT source FROM documents),
grid AS (SELECT a.source AS sa, b.source AS sb
         FROM s a JOIN s b ON a.source <= b.source),
agg AS (SELECT sa, sb, SUM(p) AS p, COUNT(DISTINCT h) AS nh
        FROM x GROUP BY 1, 2)
SELECT g.sa AS source_a, g.sb AS source_b,
  CAST(COALESCE(agg.p, 0) AS BIGINT) AS n_dup_pairs,
  CAST(COALESCE(agg.nh, 0) AS BIGINT) AS n_hashes
FROM grid g LEFT JOIN agg ON agg.sa = g.sa AND agg.sb = g.sb
"""
    # daily duplication-rate timeline: first occurrence by global
    # (ts, conv_id, turn_idx) order; empty-normalized turns count in
    # n_turns but never as duplicates
    sql["dup_rate_daily"] = f"""
WITH nn AS (
  SELECT conv_id, turn_idx, epoch_us(ts) AS ts_us, {_norm_doc} AS s
  FROM read_parquet('{_tr_glob}')),
tot AS (
  SELECT ts_us // 86400000000 AS day,
    CAST(COUNT(*) AS BIGINT) AS n_turns
  FROM nn GROUP BY 1),
f AS (
  SELECT ts_us // 86400000000 AS day,
    CASE WHEN row_number() OVER (
           PARTITION BY s ORDER BY ts_us, conv_id, turn_idx) > 1
         THEN 1 ELSE 0 END AS dup
  FROM nn WHERE length(s) > 0),
d AS (SELECT day, CAST(SUM(dup) AS BIGINT) AS n_dup_turns
      FROM f GROUP BY day)
SELECT tot.day, tot.n_turns,
  CAST(COALESCE(d.n_dup_turns, 0) AS BIGINT) AS n_dup_turns,
  CAST(1000 * COALESCE(d.n_dup_turns, 0) // tot.n_turns AS BIGINT)
    AS dup_permille
FROM tot LEFT JOIN d ON d.day = tot.day
"""
    # code-switching audit: the shared per-turn langid fragment + a
    # within-conversation LAG compare (NULL prev never counts)
    _lid_counts, _lid_case = _langid_parts()
    sql["conv_lang_switches"] = f"""
WITH t AS (
  SELECT conv_id, turn_idx,
    regexp_extract_all(lower(text), '{_TOK}') AS toks
  FROM read_parquet('{_tr_glob}')),
c AS (SELECT conv_id, turn_idx, {_lid_counts} FROM t),
per AS (SELECT conv_id, turn_idx, {_lid_case} AS pred_lang FROM c),
w AS (
  SELECT conv_id, pred_lang,
    LAG(pred_lang) OVER (
      PARTITION BY conv_id ORDER BY turn_idx) AS prev
  FROM per)
SELECT conv_id, CAST(COUNT(*) AS BIGINT) AS n_turns,
  CAST(SUM(CASE WHEN prev IS NOT NULL AND pred_lang <> prev
           THEN 1 ELSE 0 END) AS BIGINT) AS n_switches,
  CAST(COUNT(DISTINCT pred_lang) AS BIGINT) AS n_langs
FROM w GROUP BY conv_id
"""
    from dataquality_ray.pipelines.conversations import (
        DUP_SAMPLE_KEEPS,
        DUP_SAMPLE_MOD,
        REFUSAL_PATTERNS,
    )
    # dedup-rate estimation from nested content-hash-range samples:
    # sample key = md5_number_upper(norm) % MOD == the Ray side's
    # first-digest-byte (little-endian), the frozen token-hash contract
    _keeps = ", ".join(str(int(k)) for k in DUP_SAMPLE_KEEPS)
    sql["sampled_dup_rate"] = f"""
WITH nn AS (SELECT {_norm_doc} AS s FROM read_parquet('{_tr_glob}')),
h AS (
  SELECT md5(s) AS h, md5_number_upper(s) % {DUP_SAMPLE_MOD} AS skey,
    CAST(COUNT(*) AS BIGINT) AS n
  FROM nn WHERE length(s) > 0 GROUP BY 1, 2),
k AS (SELECT unnest([{_keeps}]) AS sample_keep),
a AS (
  SELECT k.sample_keep,
    CAST(COALESCE(SUM(h.n), 0) AS BIGINT) AS n_turns,
    CAST(COUNT(h.h) AS BIGINT) AS n_distinct
  FROM k LEFT JOIN h ON h.skey < k.sample_keep
  GROUP BY 1)
SELECT CAST(sample_keep AS BIGINT) AS sample_keep, n_turns,
  n_distinct,
  CAST(1000 * (n_turns - n_distinct) // GREATEST(n_turns, 1)
       AS BIGINT) AS dup_permille
FROM a
"""
    # assistant refusal / canned-deflection census: patterns are
    # quote-free ASCII literals shared with the Ray scan
    _ref_hit = " OR ".join(
        f"contains(lower(COALESCE(text, '')), '{p}')"
        for p in REFUSAL_PATTERNS)
    sql["assistant_refusal_census"] = f"""
WITH a AS (
  SELECT epoch_us(ts) // 86400000000 AS day,
    CASE WHEN {_ref_hit} THEN 1 ELSE 0 END AS r
  FROM read_parquet('{_tr_glob}') WHERE role = 'assistant')
SELECT day, CAST(COUNT(*) AS BIGINT) AS n_assistant_turns,
  CAST(SUM(r) AS BIGINT) AS n_refusal_turns,
  CAST(1000 * SUM(r) // GREATEST(COUNT(*), 1) AS BIGINT)
    AS refusal_permille
FROM a GROUP BY day
"""
    from dataquality_ray.pipelines.documents import (
        MIXTURE_PPM as _MIX_PPM,
        MIXTURE_SQRT_SCALE as _MIX_SCALE,
    )
    # per-source distinct-bigram diversity: distinctness decided on
    # md5_number_upper(bigram) == the Ray side's md5-u64; source spine
    # via LEFT JOIN (the empty-result rule)
    sql["distinct_ngram_diversity"] = f"""
WITH t AS (
  SELECT source,
    regexp_extract_all(lower(COALESCE(text, '')), '{_TOK}') AS ts
  FROM documents),
b AS (
  SELECT source,
    unnest(list_transform(generate_series(1, len(ts) - 1),
                          i -> ts[i] || ' ' || ts[i + 1])) AS bg
  FROM t),
a AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
    CAST(COUNT(DISTINCT md5_number_upper(bg)) AS BIGINT)
      AS n_distinct
  FROM b GROUP BY 1),
s AS (SELECT DISTINCT source FROM documents)
SELECT s.source,
  CAST(COALESCE(a.n_bigrams, 0) AS BIGINT) AS n_bigrams,
  CAST(COALESCE(a.n_distinct, 0) AS BIGINT) AS n_distinct,
  CAST(1000000 * COALESCE(a.n_distinct, 0)
       // GREATEST(COALESCE(a.n_bigrams, 0), 1) AS BIGINT)
    AS diversity_micro
FROM s LEFT JOIN a USING (source)
"""
    # leave-one-source-out mixture ablation: same exact integer
    # arithmetic as source_mixture_weights (floor(sqrt(chars*SCALE)),
    # ppm trunc-div), re-normalized per held-out source
    sql["mixture_ablation_weights"] = f"""
WITH a AS (
  SELECT source, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
  FROM documents GROUP BY 1),
s AS (SELECT source,
        CAST(floor(sqrt(sum_chars * {_MIX_SCALE}.0)) AS BIGINT) AS sq
      FROM a),
t AS (SELECT CAST(SUM(sq) AS BIGINT) AS tot FROM s),
base AS (
  SELECT source,
    sq * {_MIX_PPM} // GREATEST((SELECT tot FROM t), 1) AS w0
  FROM s)
SELECT h.source AS held_out, x.source AS source,
  CAST(x.sq * {_MIX_PPM}
       // GREATEST((SELECT tot FROM t) - h.sq, 1) AS BIGINT)
    AS weight_ppm,
  CAST(x.sq * {_MIX_PPM}
       // GREATEST((SELECT tot FROM t) - h.sq, 1) - base.w0 AS BIGINT)
    AS delta_ppm
FROM s h JOIN s x ON x.source <> h.source
JOIN base ON base.source = x.source
"""
    # --- round-5 session-10 batch: hybrid RRF retrieval, source
    #     embedding outliers, per-day n-gram novelty ---
    from dataquality_ray.pipelines.documents import (
        BM25_QUERY_TERMS,
        BM25_TOPK,
        OUTLIER_COS_TAU as _OUT_TAU,
        RRF_K as _RRF_K,
    )
    from dataquality_ray.stages.embeddings import (
        EMBED_DIM as EMB_DIM,
        HASH_BUCKETS as EMB_HASH_BUCKETS,
        PROJ_Q as EMB_PROJ_Q,
    )
    _rrf_qtext = " ".join(BM25_QUERY_TERMS)
    # the shared embedder CTEs (verbatim the doc_embedding_values /
    # source_embedding_centroids shapes — frozen hash contract)
    _proj_cte = f"""
proj AS (
  SELECT b.range AS bucket, d.range AS dim,
    CAST(md5_number_upper('proj:' || b.range || ':' || d.range)
         % {2 * EMB_PROJ_Q + 1} AS BIGINT) - {EMB_PROJ_Q} AS w
  FROM range(0, {EMB_HASH_BUCKETS}) b
  CROSS JOIN range(0, {EMB_DIM}) d)"""
    _tb_cte = f"""
tb AS (
  SELECT doc_id,
    CAST(md5_number_upper(t) % {EMB_HASH_BUCKETS} AS BIGINT) AS bucket,
    CAST(COUNT(*) AS BIGINT) AS tf
  FROM (
    SELECT doc_id,
      unnest(regexp_extract_all(lower(substr(text, 1, 8000)), '{_TOK}'))
        AS t
    FROM documents)
  GROUP BY 1, 2)"""
    # hybrid RRF: lexical ranks from the BM25 top-K, semantic ranks
    # from round-6 cosine of the round-6 doc vectors vs the SAME query
    # text embedded with the same CTEs; integer 1e6//(K+rank) fusion
    sql["hybrid_rrf_top_docs"] = f"""
WITH lex0 AS ({sql['bm25_top_docs']}),
lex AS (
  SELECT doc_id, CAST(row_number() OVER (
    ORDER BY score_milli DESC, doc_id) AS BIGINT) AS r
  FROM lex0),
v AS ({sql['doc_embedding_values']}),
emb AS (
  SELECT doc_id, list(val ORDER BY dim) AS e,
    sqrt(list_dot_product(list(val ORDER BY dim),
                          list(val ORDER BY dim))) AS nrm
  FROM v GROUP BY doc_id),
{_proj_cte},
qtb AS (
  SELECT CAST(md5_number_upper(t) % {EMB_HASH_BUCKETS} AS BIGINT)
    AS bucket, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (
    SELECT unnest(regexp_extract_all(
      lower(substr('{_rrf_qtext}', 1, 8000)), '{_TOK}')) AS t)
  GROUP BY 1),
qacc AS (
  SELECT proj.dim, SUM(qtb.tf * proj.w) AS a
  FROM qtb JOIN proj USING (bucket) GROUP BY 1),
qn AS (SELECT SUM(CAST(a AS HUGEINT) * a) AS nsq FROM qacc),
qv AS (
  SELECT list(CASE WHEN (SELECT nsq FROM qn) = 0 THEN 0.0
    ELSE round(a / sqrt(CAST((SELECT nsq FROM qn) AS DOUBLE)), 6) END
    ORDER BY dim) AS qe
  FROM qacc),
sc AS (
  SELECT emb.doc_id,
    CASE WHEN emb.nrm = 0 OR COALESCE((SELECT nsq FROM qn), 0) = 0
         THEN 0.0
         ELSE round(list_cosine_similarity(emb.e, qv.qe), 6) END
      AS sim
  FROM emb, qv),
semr AS (
  SELECT doc_id, CAST(row_number() OVER (
    ORDER BY sim DESC, doc_id) AS BIGINT) AS r
  FROM sc),
sem AS (SELECT * FROM semr WHERE r <= {BM25_TOPK}),
f AS (
  SELECT COALESCE(lex.doc_id, sem.doc_id) AS doc_id,
    COALESCE(lex.r, 0) AS lex_rank,
    COALESCE(sem.r, 0) AS sem_rank
  FROM lex FULL JOIN sem ON lex.doc_id = sem.doc_id)
SELECT doc_id, lex_rank, sem_rank,
  CAST(CASE WHEN lex_rank > 0
            THEN 1000000 // ({_RRF_K} + lex_rank) ELSE 0 END
     + CASE WHEN sem_rank > 0
            THEN 1000000 // ({_RRF_K} + sem_rank) ELSE 0 END
    AS BIGINT) AS rrf_ppm
FROM f
"""
    # per-doc cosine to the OWN-source centroid: centroid normalized
    # from the exact per-source int64 accumulator sums (HUGEINT
    # squares — the per-source sums overflow BIGINT when squared)
    sql["source_embedding_outliers"] = f"""
WITH {_tb_cte},
{_proj_cte},
acc AS (
  SELECT tb.doc_id, proj.dim, SUM(tb.tf * proj.w) AS a
  FROM tb JOIN proj USING (bucket) GROUP BY 1, 2),
v AS ({sql['doc_embedding_values']}),
emb AS (
  SELECT doc_id, list(val ORDER BY dim) AS e,
    sqrt(list_dot_product(list(val ORDER BY dim),
                          list(val ORDER BY dim))) AS nrm
  FROM v GROUP BY doc_id),
csum AS (
  SELECT d.source, a.dim, CAST(SUM(a.a) AS BIGINT) AS sa
  FROM acc a JOIN documents d USING (doc_id) GROUP BY 1, 2),
cgrid AS (
  SELECT s.source, d.range AS dim
  FROM (SELECT DISTINCT source FROM documents) s
  CROSS JOIN range(0, {EMB_DIM}) d),
cs AS (
  SELECT g.source, g.dim, COALESCE(c.sa, 0) AS sa
  FROM cgrid g LEFT JOIN csum c
    ON c.source = g.source AND c.dim = g.dim),
cn AS (
  SELECT source, SUM(CAST(sa AS HUGEINT) * sa) AS nsq
  FROM cs GROUP BY 1),
cv AS (
  SELECT cs.source,
    list(CASE WHEN cn.nsq = 0 THEN 0.0
      ELSE round(cs.sa / sqrt(CAST(cn.nsq AS DOUBLE)), 6) END
      ORDER BY cs.dim) AS ce,
    cn.nsq AS cnsq
  FROM cs JOIN cn USING (source) GROUP BY cs.source, cn.nsq),
j AS (
  SELECT d.doc_id, d.source,
    CASE WHEN emb.nrm = 0 OR cv.cnsq = 0 THEN 0.0
         ELSE round(list_cosine_similarity(emb.e, cv.ce), 6) END
      AS cos_centroid
  FROM documents d
  JOIN emb ON emb.doc_id = d.doc_id
  JOIN cv ON cv.source = d.source)
SELECT doc_id, source, cos_centroid,
  CAST(CASE WHEN cos_centroid < {_OUT_TAU} THEN 1 ELSE 0 END
    AS BIGINT) AS is_outlier
FROM j
"""
    # per-day novel-bigram ratio: distinctness / first-seen on the
    # frozen md5-u64 bigram hash; day spine from ALL turns
    sql["ngram_novelty_daily"] = f"""
WITH t AS (
  SELECT epoch_us(ts) // 86400000000 AS day,
    regexp_extract_all(lower(COALESCE(text, '')), '{_TOK}') AS tk
  FROM read_parquet('{_tr_glob}')),
b AS (
  SELECT day,
    unnest(list_transform(generate_series(1, len(tk) - 1),
                          i -> tk[i] || ' ' || tk[i + 1])) AS bg
  FROM t),
h AS (SELECT DISTINCT day, md5_number_upper(bg) AS hh FROM b),
m AS (SELECT hh, MIN(day) AS d0 FROM h GROUP BY 1),
a AS (
  SELECT h.day, CAST(COUNT(*) AS BIGINT) AS nd,
    CAST(SUM(CASE WHEN m.d0 = h.day THEN 1 ELSE 0 END) AS BIGINT)
      AS nn
  FROM h JOIN m USING (hh) GROUP BY 1),
sp AS (SELECT DISTINCT epoch_us(ts) // 86400000000 AS day
       FROM read_parquet('{_tr_glob}'))
SELECT sp.day,
  CAST(COALESCE(a.nd, 0) AS BIGINT) AS n_distinct,
  CAST(COALESCE(a.nn, 0) AS BIGINT) AS n_new,
  CAST(1000 * COALESCE(a.nn, 0)
       // GREATEST(COALESCE(a.nd, 0), 1) AS BIGINT)
    AS novelty_permille
FROM sp LEFT JOIN a USING (day)
"""
    # PII echo: value extraction with the scrub stage's SEQUENTIAL
    # semantics (each rule on the previous rules' replaced text);
    # echo = assistant turn_idx strictly after the value's first USER
    # turn; zero-filled all-conversations spine
    _em, _sstn, _phn = (spec.EMAIL_PATTERN, spec.SSN_PATTERN,
                        spec.PHONE_PATTERN)
    _after_email = (f"regexp_replace(tx, '{_em}', "
                    f"'{spec.EMAIL_TOKEN}', 'g')")
    _after_ssn = (f"regexp_replace({_after_email}, '{_sstn}', "
                  f"'{spec.SSN_TOKEN}', 'g')")
    sql["pii_echo_turns"] = f"""
WITH t AS (
  SELECT conv_id, CAST(turn_idx AS BIGINT) AS ti, role,
    COALESCE(text, '') AS tx
  FROM read_parquet('{_tr_glob}')),
m AS (
  SELECT conv_id, ti, role,
    unnest(regexp_extract_all(tx, '{_em}')) AS v
  FROM t WHERE role IN ('user', 'assistant')
  UNION ALL
  SELECT conv_id, ti, role,
    unnest(regexp_extract_all({_after_email}, '{_sstn}')) AS v
  FROM t WHERE role IN ('user', 'assistant')
  UNION ALL
  SELECT conv_id, ti, role,
    unnest(regexp_extract_all({_after_ssn}, '{_phn}')) AS v
  FROM t WHERE role IN ('user', 'assistant')),
u AS (
  SELECT conv_id, v, MIN(ti) AS fu
  FROM m WHERE role = 'user' GROUP BY 1, 2),
e AS (
  SELECT DISTINCT m.conv_id, m.ti, m.v
  FROM m JOIN u ON u.conv_id = m.conv_id AND u.v = m.v
  WHERE m.role = 'assistant' AND m.ti > u.fu),
g AS (
  SELECT conv_id,
    CAST(COUNT(DISTINCT v) AS BIGINT) AS n_echo_values,
    CAST(COUNT(DISTINCT ti) AS BIGINT) AS n_echo_turns
  FROM e GROUP BY 1),
uv AS (
  SELECT conv_id, CAST(COUNT(*) AS BIGINT) AS n_user_pii_values
  FROM u GROUP BY 1),
c AS (SELECT DISTINCT conv_id FROM t)
SELECT c.conv_id,
  CAST(COALESCE(uv.n_user_pii_values, 0) AS BIGINT)
    AS n_user_pii_values,
  CAST(COALESCE(g.n_echo_values, 0) AS BIGINT) AS n_echo_values,
  CAST(COALESCE(g.n_echo_turns, 0) AS BIGINT) AS n_echo_turns
FROM c LEFT JOIN uv ON uv.conv_id = c.conv_id
LEFT JOIN g ON g.conv_id = c.conv_id
"""
    # quality trend: hscore (the six SQL dims, the preference-pair
    # scorer) summed over the first k vs last k assistant turns,
    # k = n // 2; trend = sign(last - first); n >= 2 only
    sql["conv_quality_trend"] = f"""
WITH q AS ({sql['transcript_turn_quality']}),
r AS (SELECT conv_id, turn_idx, role FROM read_parquet('{_tr_glob}')),
a AS (
  SELECT q.conv_id, CAST(q.turn_idx AS BIGINT) AS ti,
    CAST(q.length_score + q.repetition_score + q.symbol_score
       + q.boilerplate_score + q.toxicity_score + q.timeliness_score
       AS BIGINT) AS h
  FROM q JOIN r ON r.conv_id = q.conv_id AND r.turn_idx = q.turn_idx
  WHERE r.role = 'assistant'),
rk AS (
  SELECT conv_id, ti, h,
    row_number() OVER (PARTITION BY conv_id ORDER BY ti) AS rnk,
    COUNT(*) OVER (PARTITION BY conv_id) AS n
  FROM a),
g AS (
  SELECT conv_id, CAST(MAX(n) AS BIGINT) AS n_assistant,
    CAST(SUM(CASE WHEN rnk <= n // 2 THEN h ELSE 0 END) AS BIGINT)
      AS first_sum,
    CAST(SUM(CASE WHEN rnk > n - n // 2 THEN h ELSE 0 END) AS BIGINT)
      AS last_sum
  FROM rk GROUP BY conv_id)
SELECT conv_id, n_assistant, first_sum, last_sum,
  CAST(CASE WHEN last_sum > first_sum THEN 1
            WHEN last_sum < first_sum THEN -1
            ELSE 0 END AS BIGINT) AS trend
FROM g WHERE n_assistant >= 2
"""
    # asymmetric containment: distinct CONT_K-token shingle hashes
    # (md5-u64 twin), df-cap on numerator AND denominator, per-doc
    # argmax by (cont DESC, shared DESC, other ASC), LEFT-JOIN doc
    # spine (shingle-less docs emit zero rows)
    from dataquality_ray.pipelines.documents import (
        CONT_DF_CAP as _C_CAP,
        CONT_K as _C_K,
    )
    _shingle_expr = " || ' ' || ".join(
        f"tk[i + {j}]" for j in range(_C_K))
    sql["max_containment_per_doc"] = f"""
WITH tok AS (
  SELECT doc_id,
    regexp_extract_all(lower(COALESCE(text, '')), '{_TOK}') AS tk
  FROM documents),
sh AS (
  SELECT DISTINCT doc_id, md5_number_upper(s) AS h
  FROM (
    SELECT doc_id,
      unnest(list_transform(generate_series(1, len(tk) - {_C_K - 1}),
                            i -> {_shingle_expr})) AS s
    FROM tok)),
dfq AS (SELECT h, COUNT(*) AS m FROM sh GROUP BY 1),
kept AS (
  SELECT sh.doc_id, sh.h FROM sh JOIN dfq USING (h)
  WHERE dfq.m <= {_C_CAP}),
cnt AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh
  FROM kept GROUP BY 1),
p AS (
  SELECT a.doc_id AS da, b.doc_id AS db2,
    CAST(COUNT(*) AS BIGINT) AS sh_n
  FROM kept a JOIN kept b ON a.h = b.h AND a.doc_id <> b.doc_id
  GROUP BY 1, 2),
dirx AS (
  SELECT p.da AS doc_id, p.db2 AS other, p.sh_n,
    CAST(1000 * p.sh_n // GREATEST(c.n_sh, 1) AS BIGINT)
      AS cont_milli
  FROM p JOIN cnt c ON c.doc_id = p.da),
best AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id
    ORDER BY cont_milli DESC, sh_n DESC, other ASC) AS rn
  FROM dirx)
SELECT d.doc_id,
  CAST(COALESCE(b.other, -1) AS BIGINT) AS best_other,
  CAST(COALESCE(b.sh_n, 0) AS BIGINT) AS n_shared,
  CAST(COALESCE(c.n_sh, 0) AS BIGINT) AS n_shingles,
  CAST(COALESCE(b.cont_milli, 0) AS BIGINT) AS cont_milli
FROM documents d
LEFT JOIN cnt c USING (doc_id)
LEFT JOIN (SELECT * FROM best WHERE rn = 1) b USING (doc_id)
"""
    # declared-label vs classifier disagreement per source
    sql["langid_mismatch_by_source"] = f"""
WITH l AS ({sql['langid_documents']}),
m AS (
  SELECT d.source,
    CASE WHEN l.pred_lang <> d.lang THEN 1 ELSE 0 END AS mm
  FROM documents d JOIN l USING (doc_id))
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(mm) AS BIGINT) AS n_mismatch,
  CAST(1000 * SUM(mm) // COUNT(*) AS BIGINT) AS mismatch_permille
FROM m GROUP BY source
"""
    # grounding audit: digit-run tokens (>= GROUND_MIN_DIGITS), first
    # appearance across ALL roles; unsupported = the assistant turn IS
    # the first appearance; all-conversations zero spine
    from dataquality_ray.pipelines.conversations import (
        GROUND_MIN_DIGITS as _G_MIN,
        NUMBER_PATTERN as _G_NUM,
    )
    sql["unsupported_number_turns"] = f"""
WITH t AS (
  SELECT conv_id, CAST(turn_idx AS BIGINT) AS ti, role,
    COALESCE(text, '') AS tx
  FROM read_parquet('{_tr_glob}')),
m AS (
  SELECT DISTINCT conv_id, ti, role, v FROM (
    SELECT conv_id, ti, role,
      unnest(regexp_extract_all(tx, '{_G_NUM}')) AS v
    FROM t)
  WHERE length(v) >= {_G_MIN}),
f AS (SELECT conv_id, v, MIN(ti) AS fm FROM m GROUP BY 1, 2),
a AS (
  SELECT m.conv_id, m.ti, m.v,
    CASE WHEN m.ti = f.fm THEN 1 ELSE 0 END AS uns
  FROM m JOIN f USING (conv_id, v)
  WHERE m.role = 'assistant'),
g AS (
  SELECT conv_id, CAST(COUNT(*) AS BIGINT) AS nn,
    CAST(SUM(uns) AS BIGINT) AS nu
  FROM a GROUP BY 1),
tn AS (SELECT conv_id, ti, MAX(uns) AS bad FROM a GROUP BY 1, 2),
tg AS (
  SELECT conv_id, CAST(SUM(1 - bad) AS BIGINT) AS ngt,
    CAST(SUM(bad) AS BIGINT) AS nut
  FROM tn GROUP BY 1),
c AS (SELECT DISTINCT conv_id FROM t)
SELECT c.conv_id,
  CAST(COALESCE(g.nn, 0) AS BIGINT) AS n_assistant_numbers,
  CAST(COALESCE(g.nu, 0) AS BIGINT) AS n_unsupported,
  CAST(COALESCE(tg.ngt, 0) AS BIGINT) AS n_grounded_turns,
  CAST(COALESCE(tg.nut, 0) AS BIGINT) AS n_ungrounded_turns
FROM c LEFT JOIN g ON g.conv_id = c.conv_id
LEFT JOIN tg ON tg.conv_id = c.conv_id
"""
    # daily semantic drift: per-day exact-int centroid (the embedder
    # CTEs over TURNS, truncation per turn), round-6 unit vectors,
    # LAG cosine over present days; day 1 pinned 1.0; HUGEINT squares
    sql["semantic_drift_daily"] = f"""
WITH tt AS (
  SELECT epoch_us(ts) // 86400000000 AS day,
    lower(substr(COALESCE(text, ''), 1, 8000)) AS lt
  FROM read_parquet('{_tr_glob}')),
cnts AS (
  SELECT day, CAST(COUNT(*) AS BIGINT) AS n_turns
  FROM tt GROUP BY 1),
tb AS (
  SELECT day,
    CAST(md5_number_upper(t) % {EMB_HASH_BUCKETS} AS BIGINT)
      AS bucket,
    CAST(COUNT(*) AS BIGINT) AS tf
  FROM (SELECT day, unnest(regexp_extract_all(lt, '{_TOK}')) AS t
        FROM tt)
  GROUP BY 1, 2),
{_proj_cte},
acc AS (
  SELECT tb.day, proj.dim, SUM(tb.tf * proj.w) AS a
  FROM tb JOIN proj USING (bucket) GROUP BY 1, 2),
grid AS (
  SELECT c.day, d.range AS dim
  FROM cnts c CROSS JOIN range(0, {EMB_DIM}) d),
av AS (
  SELECT g.day, g.dim, COALESCE(acc.a, 0) AS a
  FROM grid g LEFT JOIN acc
    ON acc.day = g.day AND acc.dim = g.dim),
nrm AS (
  SELECT day, SUM(CAST(a AS HUGEINT) * a) AS nsq
  FROM av GROUP BY 1),
u AS (
  SELECT av.day,
    list(CASE WHEN n.nsq = 0 THEN 0.0
      ELSE round(av.a / sqrt(CAST(n.nsq AS DOUBLE)), 6) END
      ORDER BY av.dim) AS e,
    n.nsq AS nsq
  FROM av JOIN nrm n USING (day) GROUP BY av.day, n.nsq),
lagd AS (
  SELECT day, e, nsq,
    LAG(day) OVER (ORDER BY day) AS pday,
    LAG(e) OVER (ORDER BY day) AS pe,
    LAG(nsq) OVER (ORDER BY day) AS pnsq
  FROM u)
SELECT l.day, c.n_turns,
  CASE WHEN l.pday IS NULL THEN 1.0
       WHEN l.nsq = 0 OR l.pnsq = 0 THEN 0.0
       ELSE round(list_cosine_similarity(l.e, l.pe), 6) END
    AS cos_prev
FROM lagd l JOIN cnts c USING (day)
"""
    # split balance: realized global split share applied per source,
    # trunc-div ppm deviation, full source x split grid
    from dataquality_ray.pipelines.documents import (
        SPLIT_BUCKETS as _SB,
        SPLIT_TRAIN_LT as _ST,
        SPLIT_VAL_LT as _SV,
    )
    sql["split_balance_audit"] = f"""
WITH a AS (
  SELECT source,
    CASE WHEN md5_number_upper(CAST(doc_id AS VARCHAR)) % {_SB}
              < {_ST} THEN 'train'
         WHEN md5_number_upper(CAST(doc_id AS VARCHAR)) % {_SB}
              < {_SV} THEN 'val'
         ELSE 'test' END AS split
  FROM documents),
cnts AS (
  SELECT source, split, CAST(COUNT(*) AS BIGINT) AS n
  FROM a GROUP BY 1, 2),
grid AS (
  SELECT s.source, sp.split
  FROM (SELECT DISTINCT source FROM documents) s
  CROSS JOIN (SELECT unnest(['test', 'train', 'val']) AS split) sp),
st AS (SELECT source, CAST(SUM(n) AS BIGINT) AS t FROM cnts
       GROUP BY 1),
pt AS (SELECT split, CAST(SUM(n) AS BIGINT) AS t FROM cnts
       GROUP BY 1),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM cnts),
j AS (
  SELECT g.source, g.split,
    COALESCE(c.n, 0) AS n,
    st.t * COALESCE(pt.t, 0) // GREATEST((SELECT t FROM tot), 1)
      AS exp
  FROM grid g
  LEFT JOIN cnts c ON c.source = g.source AND c.split = g.split
  JOIN st ON st.source = g.source
  LEFT JOIN pt ON pt.split = g.split)
SELECT source, split, CAST(n AS BIGINT) AS n_docs,
  CAST(exp AS BIGINT) AS expected_n,
  CAST(1000000 * (n - exp) // GREATEST(exp, 1) AS BIGINT) AS dev_ppm
FROM j
"""
    # special-token / canary contamination: case-sensitive literal
    # contains per (source, marker), full grid
    from dataquality_ray.pipelines.documents import (
        SPECIAL_TOKEN_MARKERS as _STM,
    )
    _mk_values = ", ".join(f"('{m}')" for m in _STM)
    sql["special_token_contamination"] = f"""
WITH mk AS (SELECT * FROM (VALUES {_mk_values}) AS t(marker)),
s AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n
  FROM documents GROUP BY 1),
h AS (
  SELECT d.source, mk.marker,
    CAST(SUM(CASE WHEN contains(d.text, mk.marker)
             THEN 1 ELSE 0 END) AS BIGINT) AS nh
  FROM documents d CROSS JOIN mk GROUP BY 1, 2)
SELECT h.source, h.marker, h.nh AS n_docs_hit,
  CAST(1000 * h.nh // GREATEST(s.n, 1) AS BIGINT) AS hit_permille
FROM h JOIN s USING (source)
"""
    # FIM planning: hash-derived char cut points, ordered; ineligible
    # docs (under FIM_MIN_CHARS) zero out
    from dataquality_ray.pipelines.documents import (
        FIM_MIN_CHARS as _FIM_MIN,
    )
    sql["fim_split_documents"] = f"""
WITH t AS (
  SELECT doc_id,
    CAST(length(COALESCE(text, '')) AS BIGINT) AS L,
    md5_number_upper('fim1:' || CAST(doc_id AS VARCHAR))
      % GREATEST(CAST(length(COALESCE(text, '')) AS BIGINT), 1) AS r1,
    md5_number_upper('fim2:' || CAST(doc_id AS VARCHAR))
      % GREATEST(CAST(length(COALESCE(text, '')) AS BIGINT), 1) AS r2
  FROM documents),
p AS (
  SELECT doc_id, L,
    CASE WHEN L >= {_FIM_MIN} THEN 1 ELSE 0 END AS elig,
    CASE WHEN L >= {_FIM_MIN} THEN LEAST(r1, r2) ELSE 0 END AS c1,
    CASE WHEN L >= {_FIM_MIN} THEN GREATEST(r1, r2) ELSE 0 END AS c2
  FROM t)
SELECT doc_id, L AS n_chars,
  CAST(c1 AS BIGINT) AS cut1, CAST(c2 AS BIGINT) AS cut2,
  CAST(c1 AS BIGINT) AS n_prefix,
  CAST(c2 - c1 AS BIGINT) AS n_middle,
  CAST(CASE WHEN elig = 1 THEN L - c2 ELSE 0 END AS BIGINT)
    AS n_suffix,
  CAST(elig AS BIGINT) AS fim_eligible
FROM p
"""
    # filter agreement: the five gate oracles joined on doc_id, all
    # C(5,2) pairwise conjunction counts + Jaccard — generated from
    # the same FILTER_GATES tuple the Ray side iterates
    from dataquality_ray.pipelines.documents import (
        FILTER_GATES as _FG,
    )
    _fg_aliases = []
    for _i, (_k, _qname, _col) in enumerate(_FG):
        _fg_aliases.append((_k, f"g{_i}", _qname, _col))
    _fg_join = f"g0 AS ({sql[_fg_aliases[0][2]]})"
    for _k, _al, _qname, _col in _fg_aliases[1:]:
        _fg_join += f",\n{_al} AS ({sql[_qname]})"
    _fg_from = "g0"
    for _k, _al, _qname, _col in _fg_aliases[1:]:
        _fg_from += f" JOIN {_al} USING (doc_id)"
    _fg_proj = ", ".join(
        f"CAST({al}.{col} AS BIGINT) AS f{i}"
        for i, (_k, al, _q, col) in enumerate(_fg_aliases))
    _fg_pairs = []
    for _i in range(len(_fg_aliases)):
        for _j in range(_i + 1, len(_fg_aliases)):
            ka = _fg_aliases[_i][0]
            kb = _fg_aliases[_j][0]
            fa, fb = f"f{_i}", f"f{_j}"
            _fg_pairs.append(f"""
SELECT '{ka}' AS gate_a, '{kb}' AS gate_b,
  CAST(SUM({fa} * {fb}) AS BIGINT) AS n_both,
  CAST(SUM({fa} * (1 - {fb})) AS BIGINT) AS n_only_a,
  CAST(SUM((1 - {fa}) * {fb}) AS BIGINT) AS n_only_b,
  CAST(SUM((1 - {fa}) * (1 - {fb})) AS BIGINT) AS n_neither,
  CAST(1000 * SUM({fa} * {fb})
       // GREATEST(SUM({fa} * {fb}) + SUM({fa} * (1 - {fb}))
                   + SUM((1 - {fa}) * {fb}), 1) AS BIGINT)
    AS jaccard_permille
FROM j""")
    _fg_union = "\nUNION ALL".join(_fg_pairs)
    sql["filter_agreement_matrix"] = f"""
WITH {_fg_join},
j AS (SELECT g0.doc_id, {_fg_proj} FROM {_fg_from})
{_fg_union}
"""
    # per-source calibration: smallest threshold with keep-rate <=
    # target, over the hash-checked quality scores (0..100 ints)
    from dataquality_ray.pipelines.documents import (
        CALIB_TARGET_PERMILLE as _CAL_T,
    )
    sql["calibrated_thresholds_by_source"] = f"""
WITH q AS ({sql['quality_documents']}),
d AS (
  SELECT q.doc_id, doc.source, q.overall_quality_score AS s
  FROM q JOIN documents doc USING (doc_id)),
tot AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY 1),
t AS (SELECT unnest(generate_series(0, 101)) AS th),
k AS (
  SELECT d.source, t.th,
    CAST(SUM(CASE WHEN d.s >= t.th THEN 1 ELSE 0 END) AS BIGINT)
      AS kept
  FROM d CROSS JOIN t GROUP BY 1, 2),
c AS (
  SELECT k.source, MIN(k.th) AS threshold
  FROM k JOIN tot USING (source)
  WHERE 1000 * k.kept <= {_CAL_T} * tot.n
  GROUP BY 1)
SELECT c.source, tot.n AS n_docs,
  CAST(c.threshold AS BIGINT) AS threshold,
  CAST(k.kept AS BIGINT) AS n_kept,
  CAST(1000 * k.kept // GREATEST(tot.n, 1) AS BIGINT)
    AS kept_permille
FROM c JOIN tot USING (source)
JOIN k ON k.source = c.source AND k.th = c.threshold
"""
    # dedup -> mixture shift: sqrt weights on raw vs near-dup-kept
    # chars, same integer arithmetic as source_mixture_weights
    sql["mixture_dedup_shift"] = f"""
WITH kd AS ({sql['near_dup_kept_documents']}),
raw AS (
  SELECT source, CAST(SUM(n_chars) AS BIGINT) AS cr
  FROM documents GROUP BY 1),
kept AS (
  SELECT d.source, CAST(SUM(d.n_chars) AS BIGINT) AS ck
  FROM documents d JOIN kd USING (doc_id) GROUP BY 1),
j AS (
  SELECT raw.source, raw.cr, COALESCE(kept.ck, 0) AS ck
  FROM raw LEFT JOIN kept USING (source)),
s AS (
  SELECT source, cr, ck,
    CAST(floor(sqrt(cr * {_MIX_SCALE}.0)) AS BIGINT) AS sr,
    CAST(floor(sqrt(ck * {_MIX_SCALE}.0)) AS BIGINT) AS sk
  FROM j),
t AS (
  SELECT CAST(GREATEST(SUM(sr), 1) AS BIGINT) AS tr,
    CAST(GREATEST(SUM(sk), 1) AS BIGINT) AS tk
  FROM s)
SELECT s.source, s.cr AS sum_chars_raw, s.ck AS sum_chars_kept,
  CAST(s.sr * {_MIX_PPM} // t.tr AS BIGINT) AS weight_raw_ppm,
  CAST(s.sk * {_MIX_PPM} // t.tk AS BIGINT) AS weight_kept_ppm,
  CAST(s.sk * {_MIX_PPM} // t.tk
       - s.sr * {_MIX_PPM} // t.tr AS BIGINT) AS delta_ppm
FROM s, t
"""
    # doc-level split-leakage grid: near-dup pairs x hash split,
    # normalized unordered cells, full zero-filled grid
    sql["doc_near_dup_split_leakage"] = f"""
WITH p AS ({sql['near_dup_documents']}),
sx AS (
  SELECT doc_id,
    CASE WHEN md5_number_upper(CAST(doc_id AS VARCHAR)) % {_SB}
              < {_ST} THEN 'train'
         WHEN md5_number_upper(CAST(doc_id AS VARCHAR)) % {_SB}
              < {_SV} THEN 'val'
         ELSE 'test' END AS split
  FROM documents),
j AS (
  SELECT LEAST(sa.split, sb.split) AS split_a,
    GREATEST(sa.split, sb.split) AS split_b
  FROM p
  JOIN sx sa ON sa.doc_id = p.id_a
  JOIN sx sb ON sb.doc_id = p.id_b),
n AS (
  SELECT split_a, split_b, CAST(COUNT(*) AS BIGINT) AS n_pairs
  FROM j GROUP BY 1, 2),
grid AS (
  SELECT * FROM (VALUES
    ('test', 'test'), ('test', 'train'), ('test', 'val'),
    ('train', 'train'), ('train', 'val'),
    ('val', 'val')) AS g(split_a, split_b))
SELECT g.split_a, g.split_b,
  CAST(COALESCE(n.n_pairs, 0) AS BIGINT) AS n_pairs
FROM grid g
LEFT JOIN n ON n.split_a = g.split_a AND n.split_b = g.split_b
"""
    # most-duplicated contents: frozen normalize+md5 identity; ties
    # (n DESC, hex ASC); sample = min (conv_id, turn_idx) raw text
    from dataquality_ray.pipelines.conversations import (
        TOP_DUP_K as _TDK,
    )
    sql["top_duplicated_turns"] = f"""
WITH nn AS (
  SELECT conv_id, CAST(turn_idx AS BIGINT) AS ti, text,
    {_norm_doc} AS s
  FROM read_parquet('{_tr_glob}')),
h AS (
  SELECT conv_id, ti, text, md5(s) AS hh
  FROM nn WHERE length(s) > 0),
c AS (SELECT hh, CAST(COUNT(*) AS BIGINT) AS n FROM h GROUP BY 1),
top AS (SELECT hh, n FROM c ORDER BY n DESC, hh LIMIT {_TDK}),
samp AS (
  SELECT hh, conv_id, ti, text FROM (
    SELECT hh, conv_id, ti, text,
      row_number() OVER (PARTITION BY hh
                         ORDER BY conv_id, ti) AS rn
    FROM h) WHERE rn = 1)
SELECT t.hh AS hash_hex, t.n AS n_copies, s.conv_id,
  s.ti AS turn_idx, COALESCE(s.text, '') AS sample_text
FROM top t JOIN samp s USING (hh)
"""
    # modified Kneser-Ney discounts from corpus bigram count-of-counts;
    # distinctness on the frozen md5-u64 bigram hash; negative discount
    # numerators clamped BEFORE the division (DuckDB // truncates
    # toward zero, Python floors — clamping makes both exact-equal)
    sql["kn_discount_stats"] = f"""
WITH t AS (
  SELECT regexp_extract_all(lower(COALESCE(text, '')), '{_TOK}') AS ts
  FROM documents),
b AS (
  SELECT unnest(list_transform(generate_series(1, len(ts) - 1),
                               i -> ts[i] || ' ' || ts[i + 1])) AS bg
  FROM t),
c AS (
  SELECT md5_number_upper(bg) AS h, CAST(COUNT(*) AS BIGINT) AS c
  FROM b GROUP BY 1),
a AS (
  SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) AS tot,
    CAST(COUNT(*) AS BIGINT) AS nd,
    CAST(COUNT(*) FILTER (WHERE c = 1) AS BIGINT) AS n1,
    CAST(COUNT(*) FILTER (WHERE c = 2) AS BIGINT) AS n2,
    CAST(COUNT(*) FILTER (WHERE c = 3) AS BIGINT) AS n3,
    CAST(COUNT(*) FILTER (WHERE c = 4) AS BIGINT) AS n4
  FROM c),
d AS (SELECT *, GREATEST(n1 + 2 * n2, 1) AS deno FROM a)
SELECT tot AS n_bigrams, nd AS n_distinct, n1, n2, n3, n4,
  CAST(1000000 * n1 // deno AS BIGINT) AS d1_micro,
  CAST(GREATEST(2 * n2 * deno - 3 * n1 * n3, 0) * 1000000
       // GREATEST(n2 * deno, 1) AS BIGINT) AS d2_micro,
  CAST(GREATEST(3 * n3 * deno - 4 * n1 * n4, 0) * 1000000
       // GREATEST(n3 * deno, 1) AS BIGINT) AS d3_micro
FROM d
"""
    # power-of-two length buckets: bucket = bit_length(n_tokens - 1)
    # as an exact integer (length(bin(n-1)) — float log2 misrounds
    # near powers of two), seq_len = 1 << bucket
    sql["length_bucket_packing_stats"] = f"""
WITH t AS (
  SELECT len(regexp_extract_all(lower(COALESCE(text, '')), '{_TOK}'))
    AS n
  FROM documents),
b AS (
  SELECT CAST(n AS BIGINT) AS n,
    CAST(CASE WHEN n <= 1 THEN 0
         ELSE length(bin(CAST(n - 1 AS BIGINT))) END AS BIGINT)
      AS bucket
  FROM t),
g AS (
  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
    CAST(SUM(n) AS BIGINT) AS sum_tokens
  FROM b GROUP BY 1),
s AS (SELECT *, CAST(1 << bucket AS BIGINT) AS seq_len FROM g)
SELECT bucket, seq_len, n_docs, sum_tokens,
  CAST(n_docs * seq_len AS BIGINT) AS padded_tokens,
  CAST(1000000 * (n_docs * seq_len - sum_tokens)
       // (n_docs * seq_len) AS BIGINT) AS pad_waste_ppm,
  CAST((sum_tokens + seq_len - 1) // seq_len AS BIGINT)
    AS packed_seqs
FROM s
"""
    from dataquality_ray.pipelines.documents import (
        PHRASE_QUERY as _PHRASE,
    )
    from dataquality_ray.pipelines.metrics import (
        HLL_REG_BITS as M_HLL_REG_BITS,
    )
    _phr_cond = " AND ".join(
        (f"ts[i + {j}] = '{t}'" if j else f"ts[i] = '{t}'")
        for j, t in enumerate(_PHRASE))
    # positional phrase query: adjacent-token exact match with 0-based
    # first position (SQL list positions are 1-based — MIN(i) - 1)
    sql["phrase_match_documents"] = f"""
WITH t AS (
  SELECT doc_id,
    regexp_extract_all(lower(COALESCE(text, '')), '{_TOK}') AS ts
  FROM documents),
p AS (
  SELECT doc_id,
    unnest(list_filter(
      generate_series(1, len(ts) - {len(_PHRASE) - 1}),
      i -> {_phr_cond})) AS i
  FROM t)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_matches,
  CAST(MIN(i) - 1 AS BIGINT) AS first_pos
FROM p GROUP BY 1
"""
    # curriculum tertiles via the pinned discrete-quantile rule:
    # threshold = min value whose cumulative count >= ceil(q*n),
    # ceil computed in exact integers ((n+2)//3, (2n+2)//3)
    sql["curriculum_phase_documents"] = f"""
WITH t AS (
  SELECT doc_id,
    CAST(length(COALESCE(text, '')) AS BIGINT) AS nc,
    CAST(len(regexp_extract_all(lower(COALESCE(text, '')),
                                '{spec.BPE_TOKEN_PATTERN}'))
         AS BIGINT) AS nb
  FROM documents),
d AS (
  SELECT doc_id,
    CASE WHEN nb > 0 THEN CAST((1000 * nc) // nb AS BIGINT)
         ELSE -1 END AS difficulty
  FROM t),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM d),
cum AS (
  SELECT difficulty AS v,
    SUM(COUNT(*)) OVER (ORDER BY difficulty) AS cc
  FROM d GROUP BY difficulty),
t1 AS (SELECT MIN(v) AS v FROM cum
       WHERE cc >= (SELECT (n + 2) // 3 FROM n)),
t2 AS (SELECT MIN(v) AS v FROM cum
       WHERE cc >= (SELECT (2 * n + 2) // 3 FROM n))
SELECT doc_id, difficulty,
  CAST(CASE WHEN difficulty <= (SELECT v FROM t1) THEN 1
            WHEN difficulty <= (SELECT v FROM t2) THEN 2
            ELSE 3 END AS BIGINT) AS phase
FROM d
"""
    # cumulative HLL register timeline: same register/rho arithmetic
    # as distinct_users_hll, dense 64-register grid per day, running
    # MAX over the (chronologically-ordered) day strings
    sql["hll_users_cumulative_daily"] = f"""
WITH h AS (
  SELECT DISTINCT strftime(ts, '%Y-%m-%d') AS day,
    md5_number_upper(CAST(user_id AS VARCHAR)) AS hv
  FROM events),
r AS (
  SELECT day,
    CAST(hv >> {64 - M_HLL_REG_BITS} AS BIGINT) AS reg,
    CAST(CASE WHEN (hv & {(1 << (64 - M_HLL_REG_BITS)) - 1}::UBIGINT) = 0
              THEN {64 - M_HLL_REG_BITS + 1}
         ELSE {64 - M_HLL_REG_BITS + 1}
              - length(bin(hv & {(1 << (64 - M_HLL_REG_BITS)) - 1}::UBIGINT))
         END AS BIGINT) AS rho
  FROM h),
m AS (SELECT day, reg, MAX(rho) AS rho FROM r GROUP BY 1, 2),
grid AS (
  SELECT day, g.reg
  FROM (SELECT DISTINCT day FROM r)
  CROSS JOIN (SELECT unnest(generate_series(
    0, {(1 << M_HLL_REG_BITS) - 1})) AS reg) g),
j AS (
  SELECT grid.day, grid.reg, COALESCE(m.rho, 0) AS rho
  FROM grid LEFT JOIN m
    ON m.day = grid.day AND m.reg = grid.reg)
SELECT day, reg,
  CAST(MAX(rho) OVER (PARTITION BY reg ORDER BY day) AS BIGINT)
    AS rho
FROM j
"""
    from dataquality_ray.pipelines.documents import (
        COLLOC_COUNT_CAP as _CCAP,
        COLLOC_DELTA as _CDELTA,
        COLLOC_TOP_K as _CTOPK,
    )
    # word2phrase collocation score: counts saturated at the cap so
    # int64 products stay in range at any corpus size; constant N
    # factor dropped (ranking-equivalent); ties by (a, b) ascending
    sql["collocation_phrases"] = f"""
WITH t AS (
  SELECT regexp_extract_all(lower(COALESCE(text, '')), '{_TOK}') AS ts
  FROM documents),
u AS (SELECT unnest(ts) AS tok FROM t),
uc AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM u GROUP BY 1),
p AS (
  SELECT unnest(list_transform(generate_series(1, len(ts) - 1),
    i -> {{'a': ts[i], 'b': ts[i + 1]}}), recursive := true)
  FROM t),
bc AS (
  SELECT a, b, CAST(COUNT(*) AS BIGINT) AS c_ab
  FROM p GROUP BY 1, 2),
s AS (
  SELECT bc.a, bc.b, ua.c AS c_a, ub.c AS c_b, bc.c_ab,
    CAST(GREATEST(LEAST(bc.c_ab, {_CCAP}) - {_CDELTA}, 0)
         * 1000000000
         // (LEAST(ua.c, {_CCAP}) * LEAST(ub.c, {_CCAP}))
         AS BIGINT) AS score_ppb
  FROM bc
  JOIN uc ua ON ua.tok = bc.a
  JOIN uc ub ON ub.tok = bc.b)
SELECT * FROM s ORDER BY score_ppb DESC, a, b LIMIT {_CTOPK}
"""
    # deterministic source-interleaved order: per-source rank by the
    # frozen md5-u64 of 'ilv:<doc_id>' (unsigned order), global grid
    # position = src_rank * n_sources + source_idx (binary-collation
    # source index)
    sql["shard_interleave_plan"] = """
WITH d AS (
  SELECT doc_id, source,
    md5_number_upper('ilv:' || CAST(doc_id AS VARCHAR)) AS hv
  FROM documents),
ns AS (SELECT CAST(COUNT(DISTINCT source) AS BIGINT) AS n FROM d),
si AS (
  SELECT source,
    CAST(dense_rank() OVER (ORDER BY source) - 1 AS BIGINT) AS sidx
  FROM (SELECT DISTINCT source FROM d)),
r AS (
  SELECT doc_id, source,
    CAST(row_number() OVER (PARTITION BY source
                            ORDER BY hv, doc_id) - 1 AS BIGINT)
      AS src_rank
  FROM d)
SELECT r.doc_id, r.source, r.src_rank,
  CAST(r.src_rank * (SELECT n FROM ns) + si.sidx AS BIGINT)
    AS global_pos
FROM r JOIN si USING (source)
"""
    from dataquality_ray.pipelines.documents import (
        BUDGET_MODEL_PARAMS as _BMP,
        BUDGET_TOKENS_PER_PARAM as _BTPP,
        POSTING_HEAD_K as _PHK,
        SEARCH_TERMS as _D_SEARCH_TERMS,
        VOCAB_SAMPLE_KEEPS as _VSK,
        VOCAB_SAMPLE_MOD as _VSM,
    )
    # temperature ladder by nested floor(sqrt(double)) — the
    # source_mixture_weights parity recipe, never float pow()
    sql["mixture_temperature_sweep"] = f"""
WITH a AS (
  SELECT source, CAST(SUM(n_chars) AS BIGINT) AS c
  FROM documents GROUP BY 1),
r AS (
  SELECT source, c,
    CAST(floor(sqrt(CAST(c AS DOUBLE) * {_MIX_SCALE}.0)) AS BIGINT)
      AS m
  FROM a),
r2 AS (
  SELECT source, c, m,
    CAST(floor(sqrt(CAST(m AS DOUBLE) * {_MIX_SCALE}.0)) AS BIGINT)
      AS q,
    CAST(floor(sqrt(CAST(c AS DOUBLE) * CAST(m AS DOUBLE)))
         AS BIGINT) AS t
  FROM r),
w AS (
  SELECT 250 AS tau_milli, source, c, q AS s FROM r2
  UNION ALL SELECT 500, source, c, m FROM r2
  UNION ALL SELECT 750, source, c, t FROM r2
  UNION ALL SELECT 1000, source, c, c FROM r2),
tot AS (SELECT tau_milli, SUM(s) AS tot FROM w GROUP BY 1)
SELECT CAST(w.tau_milli AS BIGINT) AS tau_milli, w.source,
  w.c AS sum_chars,
  CAST(CAST(w.s AS HUGEINT) * {_MIX_PPM}
       // GREATEST(tot.tot, 1) AS BIGINT) AS weight_ppm
FROM w JOIN tot USING (tau_milli)
"""
    # Heaps-law growth from nested doc-hash samples; a token is in
    # sample-k vocabulary iff the MIN containing-doc key is < k
    sql["vocab_growth_curve"] = f"""
WITH d AS (
  SELECT md5_number_upper(CAST(doc_id AS VARCHAR)) % {_VSM} AS key,
    regexp_extract_all(lower(COALESCE(text, '')), '{_TOK}') AS ts
  FROM documents),
k AS (SELECT unnest([{", ".join(str(x) for x in _VSK)}])
        AS sample_keep),
tok AS (SELECT key, unnest(ts) AS tok FROM d),
mh AS (
  SELECT md5_number_upper(tok) AS h, CAST(MIN(key) AS BIGINT) AS mk
  FROM tok GROUP BY 1)
SELECT CAST(k.sample_keep AS BIGINT) AS sample_keep,
  CAST((SELECT COUNT(*) FROM d
        WHERE key < k.sample_keep) AS BIGINT) AS n_docs,
  CAST((SELECT COALESCE(SUM(len(ts)), 0) FROM d
        WHERE key < k.sample_keep) AS BIGINT) AS n_tokens,
  CAST((SELECT COUNT(*) FROM mh
        WHERE mk < k.sample_keep) AS BIGINT) AS n_vocab
FROM k
"""
    # Chinchilla-ratio budget plan; products in HUGEINT (6*N*D
    # overflows int64 at 100-TB corpora), reported floor-exact
    sql["token_budget_plan"] = f"""
WITH n AS (
  SELECT CAST(COALESCE(SUM(len(regexp_extract_all(
    lower(COALESCE(text, '')), '{_TOK}'))), 0) AS BIGINT) AS tot
  FROM documents),
m AS (SELECT unnest([{", ".join(str(x) for x in _BMP)}])
        AS model_params)
SELECT CAST(model_params AS BIGINT) AS model_params,
  n.tot AS corpus_tokens,
  CAST(model_params * {_BTPP} AS BIGINT) AS needed_tokens,
  CAST(CAST(1000 AS HUGEINT) * model_params * {_BTPP}
       // GREATEST(n.tot, 1) AS BIGINT) AS epochs_milli,
  CAST(CAST(6 AS HUGEINT) * model_params
       * (CAST(model_params AS HUGEINT) * {_BTPP})
       // 1000000000000000 AS BIGINT) AS flops_peta
FROM m, n
"""
    _terms_sql = ", ".join(f"'{t}'" for t in _D_SEARCH_TERMS)
    # posting-list export: exact df + the first K doc_ids ascending;
    # LEFT-JOIN spine so a zero-hit term still emits its row
    sql["term_posting_lists"] = f"""
WITH t AS (
  SELECT doc_id,
    regexp_extract_all(lower(COALESCE(text, '')), '{_TOK}') AS ts
  FROM documents),
q AS (SELECT unnest([{_terms_sql}]) AS term),
h AS (
  SELECT q.term, t.doc_id
  FROM q JOIN t ON list_contains(t.ts, q.term)),
r AS (
  SELECT term, doc_id,
    row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rn
  FROM h),
a AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
    string_agg(CASE WHEN rn <= {_PHK}
                    THEN CAST(doc_id AS VARCHAR) END,
               ',' ORDER BY doc_id) AS posting_head
  FROM r GROUP BY term)
SELECT q.term, COALESCE(a.df, 0) AS df,
  COALESCE(a.posting_head, '') AS posting_head
FROM q LEFT JOIN a USING (term)
"""
    # per-user out-of-order arrival audit: lateness vs the running
    # max timestamp in arrival (event_id) order
    sql["event_disorder_stats"] = """
WITH w AS (
  SELECT user_id, epoch_us(ts) AS t,
    MAX(epoch_us(ts)) OVER (
      PARTITION BY user_id ORDER BY event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
  FROM events)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(SUM(CASE WHEN pm IS NOT NULL AND t < pm
                THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
  CAST(COALESCE(MAX(CASE WHEN pm IS NOT NULL AND t < pm
                          THEN pm - t END), 0) AS BIGINT)
    AS max_late_us
FROM w GROUP BY user_id
"""
    from dataquality_ray.pipelines.documents import (
        ANN_QUERY_IDS as _HN_QIDS,
        HARD_NEG_K as _HN_K,
        KNN_PROBE_N as _KNN_N,
    )
    _hn_ids = ", ".join(str(i) for i in _HN_QIDS)
    # hard negatives: the ann_topk oracle with a label constraint
    sql["hard_negative_topk_embeddings"] = f"""
WITH q AS (
  SELECT vec_id AS query_id, label AS query_label,
    CAST(embedding AS DOUBLE[]) AS qe
  FROM embeddings WHERE vec_id IN ({_hn_ids})),
c AS (SELECT vec_id, label AS neg_label,
        CAST(embedding AS DOUBLE[]) AS e
      FROM embeddings),
s AS (
  SELECT q.query_id, q.query_label, c.vec_id, c.neg_label,
    list_cosine_similarity(q.qe, c.e) AS sim,
    row_number() OVER (PARTITION BY q.query_id
      ORDER BY list_cosine_similarity(q.qe, c.e) DESC,
               c.vec_id) AS rank
  FROM q, c WHERE c.neg_label <> q.query_label)
SELECT query_id, CAST(query_label AS BIGINT) AS query_label,
  vec_id, CAST(neg_label AS BIGINT) AS neg_label,
  round(sim, 6) AS cosine_sim, CAST(rank AS BIGINT) AS rank
FROM s WHERE rank <= {_HN_K}
"""
    # 1-NN label confusion over the smallest-hash probe set, dense
    # label-grid spine
    sql["knn_label_probe"] = f"""
WITH h AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e,
    md5_number_upper(CAST(vec_id AS VARCHAR)) AS hv
  FROM embeddings),
q AS (SELECT * FROM h ORDER BY hv, vec_id LIMIT {_KNN_N}),
s AS (
  SELECT q.vec_id AS qid, q.label AS ql, c.label AS nl,
    row_number() OVER (PARTITION BY q.vec_id
      ORDER BY list_cosine_similarity(q.e, c.e) DESC,
               c.vec_id) AS rn
  FROM q JOIN h c ON c.vec_id <> q.vec_id),
n AS (SELECT ql, nl, CAST(COUNT(*) AS BIGINT) AS n
      FROM s WHERE rn = 1 GROUP BY 1, 2),
l AS (SELECT DISTINCT label FROM embeddings)
SELECT CAST(a.label AS BIGINT) AS query_label,
  CAST(b.label AS BIGINT) AS nn_label,
  CAST(COALESCE(n.n, 0) AS BIGINT) AS n_queries
FROM l a CROSS JOIN l b
LEFT JOIN n ON n.ql = a.label AND n.nl = b.label
"""
    # turn length vs conversation depth: positions 0-7 exact, deeper
    # in power-of-two buckets via exact integer bit_length
    sql["turn_position_length_curve"] = f"""
WITH t AS (
  SELECT role,
    CAST(CASE WHEN turn_idx < 8 THEN turn_idx
         ELSE 4 + length(bin(CAST(turn_idx AS BIGINT)))
         END AS BIGINT) AS pos_bucket,
    CAST(length(COALESCE(text, '')) AS BIGINT) AS ln
  FROM read_parquet('{_tr_glob}')),
g AS (
  SELECT role, pos_bucket, CAST(COUNT(*) AS BIGINT) AS n_turns,
    CAST(SUM(ln) AS BIGINT) AS sum_chars
  FROM t GROUP BY 1, 2)
SELECT role, pos_bucket,
  CAST(CASE WHEN pos_bucket < 8 THEN pos_bucket
       ELSE 1 << (pos_bucket - 5) END AS BIGINT) AS bucket_lo,
  n_turns, sum_chars,
  CAST(1000 * sum_chars // n_turns AS BIGINT) AS avg_chars_milli
FROM g
"""
    from dataquality_ray.pipelines.documents import (
        CDC_MOD as _CDC_MOD,
    )
    # token-level content-defined chunking: boundary AFTER tokens
    # whose frozen md5-u64 hash is 0 mod CDC_MOD; ends = boundary
    # positions plus the trailing end when the last token is not a
    # boundary; chunk lengths = within-doc diffs
    sql["cdc_chunk_documents"] = f"""
WITH t AS (
  SELECT doc_id,
    regexp_extract_all(lower(COALESCE(text, '')), '{_TOK}') AS ts
  FROM documents),
b AS (
  SELECT doc_id, len(ts) AS n,
    list_filter(generate_series(1, len(ts)),
      i -> md5_number_upper(ts[i]) % {_CDC_MOD} = 0) AS bp
  FROM t),
c AS (
  SELECT doc_id, CAST(n AS BIGINT) AS n_tokens, bp,
    CASE WHEN n = 0 THEN CAST([] AS BIGINT[])
         WHEN len(bp) > 0 AND bp[len(bp)] = n THEN bp
         ELSE list_append(bp, CAST(n AS BIGINT)) END AS ends
  FROM b)
SELECT doc_id, n_tokens,
  CAST(len(ends) AS BIGINT) AS n_chunks,
  CAST(CASE WHEN len(bp) > 0 THEN bp[1] - 1 ELSE -1 END AS BIGINT)
    AS first_boundary,
  CAST(COALESCE(list_max(list_transform(
    generate_series(1, len(ends)),
    j -> ends[j] - CASE WHEN j = 1 THEN 0 ELSE ends[j - 1] END)),
    0) AS BIGINT) AS max_chunk_tokens,
  CAST(CASE WHEN len(ends) > 0 THEN 1000 * n_tokens // len(ends)
       ELSE 0 END AS BIGINT) AS avg_chunk_tokens_milli
FROM c
"""
    # instruction-format compliance: user turn requesting a format,
    # next turn an assistant reply containing the marker; fixed
    # 3-kind spine
    sql["format_compliance_turns"] = f"""
WITH o AS (
  SELECT conv_id, role, COALESCE(text, '') AS txt,
    lead(role) OVER w AS nrole,
    lead(COALESCE(text, '')) OVER w AS ntxt
  FROM read_parquet('{_tr_glob}')
  WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)),
p AS (
  SELECT lower(txt) AS u, ntxt AS a FROM o
  WHERE role = 'user' AND nrole = 'assistant'),
k AS (
  SELECT 'json' AS kind,
    CAST(COUNT(*) FILTER (WHERE contains(u, 'json')) AS BIGINT)
      AS nr,
    CAST(COUNT(*) FILTER (WHERE contains(u, 'json')
                          AND contains(a, '{{')) AS BIGINT) AS nc
  FROM p
  UNION ALL
  SELECT 'list',
    CAST(COUNT(*) FILTER (WHERE contains(u, 'list')) AS BIGINT),
    CAST(COUNT(*) FILTER (WHERE contains(u, 'list')
      AND contains(a, chr(10) || '-')) AS BIGINT)
  FROM p
  UNION ALL
  SELECT 'code',
    CAST(COUNT(*) FILTER (WHERE contains(u, 'code')) AS BIGINT),
    CAST(COUNT(*) FILTER (WHERE contains(u, 'code')
      AND contains(a, '```')) AS BIGINT)
  FROM p)
SELECT kind, nr AS n_requests, nc AS n_compliant,
  CAST(nc * 1000000 // GREATEST(nr, 1) AS BIGINT)
    AS compliance_ppm
FROM k
"""
    from dataquality_ray.pipelines.documents import (
        BPE_APPLY_PASSES as _BPE_P,
        BPE_TRAIN_ROUNDS as _BPE_R,
    )
    # multi-round BPE trainer, unrolled: each round r is three CTEs
    # (weighted pair counts over the current symbol strings, the
    # argmax pair, the merge application as _BPE_P nested literal
    # replaces — the exact semantic the Ray side pins). Empty-pair
    # rounds degrade to a never-matching chr(0) pattern.
    _bpe_ctes = [f"""wf AS MATERIALIZED (
  SELECT tok AS word, CAST(COUNT(*) AS BIGINT) AS freq
  FROM (SELECT unnest(regexp_extract_all(
    lower(COALESCE(text, '')), '{_TOK}')) AS tok FROM documents)
  GROUP BY 1),
w0 AS MATERIALIZED (
  SELECT ' ' || array_to_string(regexp_extract_all(word, '.'), ' ')
    || ' ' AS sp, freq
  FROM wf)"""]
    for _r in range(1, _BPE_R + 1):
        _pv = f"w{_r - 1}"
        _pat = (f"COALESCE((SELECT ' ' || a || ' ' || b || ' ' "
                f"FROM b{_r}), chr(0))")
        _rep = (f"COALESCE((SELECT ' ' || a || b || ' ' "
                f"FROM b{_r}), '')")
        _expr = "sp"
        for _ in range(_BPE_P):
            _expr = f"replace({_expr}, {_pat}, {_rep})"
        _bpe_ctes.append(f"""p{_r} AS MATERIALIZED (
  SELECT a, b, CAST(SUM(freq) AS BIGINT) AS c FROM (
    SELECT freq, unnest(list_transform(
      generate_series(1, len(sy) - 1),
      i -> {{'a': sy[i], 'b': sy[i + 1]}}), recursive := true)
    FROM (SELECT string_split(trim(sp, ' '), ' ') AS sy, freq
          FROM {_pv}))
  GROUP BY 1, 2),
b{_r} AS MATERIALIZED (
  SELECT a, b, c FROM p{_r} ORDER BY c DESC, a, b LIMIT 1),
w{_r} AS MATERIALIZED (SELECT {_expr} AS sp, freq FROM {_pv})""")
    _bpe_sel = "\nUNION ALL\n".join(
        f"SELECT CAST({r} AS BIGINT) AS round, a AS sym_a, "
        f"b AS sym_b, a || b AS merged, c AS pair_count FROM b{r}"
        for r in range(1, _BPE_R + 1))
    sql["bpe_train_merges"] = ("WITH " + ",\n".join(_bpe_ctes)
                               + "\n" + _bpe_sel)
    # declared-vs-predicted language confusion grid: the pinned
    # marker classifier (same CTE as langid_documents) joined with
    # the declared label, zero-filled over the dense
    # (declared x classifier-domain) spine
    sql["lang_confusion_matrix"] = f"""
WITH l AS ({sql['langid_documents']}),
d AS (
  SELECT doc.lang AS declared_lang, l.pred_lang,
    CAST(COUNT(*) AS BIGINT) AS n
  FROM documents doc JOIN l ON l.doc_id = doc.doc_id
  GROUP BY 1, 2),
dl AS (SELECT DISTINCT lang AS declared_lang FROM documents),
pd AS (SELECT unnest(['de', 'en', 'es', 'fr', 'und'])
         AS pred_lang)
SELECT dl.declared_lang, pd.pred_lang,
  CAST(COALESCE(d.n, 0) AS BIGINT) AS n_docs
FROM dl CROSS JOIN pd
LEFT JOIN d ON d.declared_lang = dl.declared_lang
           AND d.pred_lang = pd.pred_lang
"""
    # exact distinct-user overlap between event types: distinct
    # (user, type) pairs self-joined per user, unordered pairs,
    # exact Jaccard in floor-ppm
    sql["event_type_audience_overlap"] = """
WITH d AS (SELECT DISTINCT user_id, event_type FROM events),
s AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
      FROM d GROUP BY 1),
p AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
    CAST(COUNT(*) AS BIGINT) AS n_common
  FROM d a JOIN d b ON a.user_id = b.user_id
  WHERE a.event_type < b.event_type
  GROUP BY 1, 2),
g AS (
  SELECT sa.event_type AS type_a, sb.event_type AS type_b,
    sa.n AS n_a, sb.n AS n_b
  FROM s sa JOIN s sb ON sa.event_type < sb.event_type)
SELECT g.type_a, g.type_b, g.n_a, g.n_b,
  CAST(COALESCE(p.n_common, 0) AS BIGINT) AS n_common,
  CAST(1000000 * COALESCE(p.n_common, 0)
       // GREATEST(g.n_a + g.n_b - COALESCE(p.n_common, 0), 1)
       AS BIGINT) AS jaccard_ppm
FROM g LEFT JOIN p ON p.type_a = g.type_a AND p.type_b = g.type_b
"""
    # pairwise HLL union: element-wise register MAX over the
    # distinct_users_hll surface, dense (pair x 64-register) spine
    sql["hll_audience_union_registers"] = f"""
WITH h AS MATERIALIZED ({sql['distinct_users_hll']}),
ty AS (SELECT DISTINCT event_type FROM events),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b
  FROM ty a JOIN ty b ON a.event_type < b.event_type),
grid AS (
  SELECT type_a, type_b, g.reg
  FROM pairs CROSS JOIN (SELECT unnest(generate_series(
    0, {(1 << M_HLL_REG_BITS) - 1})) AS reg) g)
SELECT grid.type_a, grid.type_b, CAST(grid.reg AS BIGINT) AS reg,
  CAST(GREATEST(COALESCE(ha.rho, 0), COALESCE(hb.rho, 0))
       AS BIGINT) AS rho
FROM grid
LEFT JOIN h ha ON ha.event_type = grid.type_a
              AND ha.reg = grid.reg
LEFT JOIN h hb ON hb.event_type = grid.type_b
              AND hb.reg = grid.reg
"""
    from dataquality_ray.pipelines.conversations import (
        EVAL_SAMPLE_K as _EVK,
    )
    # per-day smallest-hash eval sample; hv ordered as UNSIGNED
    # 64-bit on both engines
    sql["daily_eval_sample"] = f"""
WITH t AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day, conv_id,
    CAST(turn_idx AS BIGINT) AS turn_idx,
    COALESCE(text, '') AS sample_text,
    md5_number_upper(conv_id || ':'
                     || CAST(turn_idx AS VARCHAR)) AS hv
  FROM read_parquet('{_tr_glob}')),
r AS (
  SELECT *, row_number() OVER (
    PARTITION BY day ORDER BY hv, conv_id, turn_idx) AS rank
  FROM t)
SELECT day, CAST(rank AS BIGINT) AS rank, conv_id, turn_idx,
  sample_text
FROM r WHERE rank <= {_EVK}
"""
    # verbosity coupling: exact integer sufficient statistics over
    # (user turn, next assistant turn) length pairs
    sql["reply_length_covariance"] = f"""
WITH o AS (
  SELECT conv_id, role,
    CAST(length(COALESCE(text, '')) AS BIGINT) AS ln,
    lead(role) OVER w AS nrole,
    lead(CAST(length(COALESCE(text, '')) AS BIGINT)) OVER w AS nln
  FROM read_parquet('{_tr_glob}')
  WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)),
p AS (SELECT ln AS u, nln AS a FROM o
      WHERE role = 'user' AND nrole = 'assistant')
SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
  CAST(COALESCE(SUM(u), 0) AS BIGINT) AS sum_u,
  CAST(COALESCE(SUM(a), 0) AS BIGINT) AS sum_a,
  CAST(COALESCE(SUM(u * u), 0) AS BIGINT) AS sum_uu,
  CAST(COALESCE(SUM(a * a), 0) AS BIGINT) AS sum_aa,
  CAST(COALESCE(SUM(u * a), 0) AS BIGINT) AS sum_ua
FROM p
"""
    # quality decile x exact-dup membership, dense 10x2 spine;
    # composes the hash-green quality CTE with the exact_dedup
    # content-hash identity
    sql["quality_vs_dup_matrix"] = _QUALITY_CTE + f"""
, dq AS (
  SELECT doc_id,
    CAST(ntile(10) OVER (ORDER BY overall, doc_id) AS BIGINT)
      AS decile
  FROM q),
hsh AS (
  SELECT doc_id, md5(regexp_replace(
    regexp_replace(lower(COALESCE(text, '')),
      '{spec.EDGE_WS_PATTERN}', '', 'g'),
    '{spec.WS_PLUS_PATTERN}', ' ', 'g')) AS ch
  FROM documents),
cc AS (SELECT ch, CAST(COUNT(*) AS BIGINT) AS n
       FROM hsh GROUP BY 1),
f AS (
  SELECT hsh.doc_id,
    CASE WHEN cc.n > 1 THEN 1 ELSE 0 END AS is_dup
  FROM hsh JOIN cc USING (ch)),
m AS (
  SELECT dq.decile, f.is_dup, CAST(COUNT(*) AS BIGINT) AS n
  FROM dq JOIN f USING (doc_id) GROUP BY 1, 2),
grid AS (SELECT unnest(generate_series(1, 10)) AS decile),
fl AS (SELECT unnest([0, 1]) AS is_dup)
SELECT CAST(grid.decile AS BIGINT) AS decile,
  CAST(fl.is_dup AS BIGINT) AS is_dup,
  CAST(COALESCE(m.n, 0) AS BIGINT) AS n_docs
FROM grid CROSS JOIN fl
LEFT JOIN m ON m.decile = grid.decile AND m.is_dup = fl.is_dup
"""
    # exact vocabulary Jaccard between roles; distinctness on the
    # frozen md5-u64 token hash
    sql["role_vocab_overlap"] = f"""
WITH d AS (
  SELECT DISTINCT role, md5_number_upper(tok) AS h FROM (
    SELECT role, unnest(regexp_extract_all(
      lower(COALESCE(text, '')), '{_TOK}')) AS tok
    FROM read_parquet('{_tr_glob}'))),
s AS (SELECT role, CAST(COUNT(*) AS BIGINT) AS v
      FROM d GROUP BY 1),
p AS (
  SELECT a.role AS role_a, b.role AS role_b,
    CAST(COUNT(*) AS BIGINT) AS vc
  FROM d a JOIN d b ON a.h = b.h
  WHERE a.role < b.role GROUP BY 1, 2),
g AS (
  SELECT sa.role AS role_a, sb.role AS role_b,
    sa.v AS v_a, sb.v AS v_b
  FROM s sa JOIN s sb ON sa.role < sb.role)
SELECT g.role_a, g.role_b, g.v_a, g.v_b,
  CAST(COALESCE(p.vc, 0) AS BIGINT) AS v_common,
  CAST(1000000 * COALESCE(p.vc, 0)
       // GREATEST(g.v_a + g.v_b - COALESCE(p.vc, 0), 1)
       AS BIGINT) AS jaccard_ppm
FROM g LEFT JOIN p ON p.role_a = g.role_a AND p.role_b = g.role_b
"""
    # per-source style fingerprint: exact floor-ppm character-class
    # ratios + mean whitespace-token length
    sql["source_style_profile"] = f"""
WITH t AS (SELECT source, COALESCE(text, '') AS t FROM documents),
a AS (
  SELECT source,
    CAST(SUM(length(t)) AS BIGINT) AS nc,
    CAST(SUM(len(regexp_extract_all(t, '[A-Z]'))) AS BIGINT)
      AS caps,
    CAST(SUM(len(regexp_extract_all(t, '[0-9]'))) AS BIGINT)
      AS dig,
    CAST(SUM(len(regexp_extract_all(t, '[^A-Za-z0-9 \\t\\r\\n]')))
      AS BIGINT) AS punct,
    CAST(SUM(len(regexp_extract_all(t, '{spec.WS_TOKEN_PATTERN}')))
      AS BIGINT) AS wtok,
    CAST(SUM(length(t)
             - len(regexp_extract_all(t, '[ \\t\\r\\n]')))
      AS BIGINT) AS wchars
  FROM t GROUP BY 1)
SELECT source, nc AS n_chars,
  CAST(1000000 * caps // GREATEST(nc, 1) AS BIGINT) AS caps_ppm,
  CAST(1000000 * dig // GREATEST(nc, 1) AS BIGINT) AS digit_ppm,
  CAST(1000000 * punct // GREATEST(nc, 1) AS BIGINT) AS punct_ppm,
  CAST(1000 * wchars // GREATEST(wtok, 1) AS BIGINT)
    AS avg_word_len_milli
FROM a
"""
    # prefill cost: exclusive per-conv running token sum, bucketed by
    # the turn_position_length_curve depth rule
    sql["prefill_cost_curve"] = f"""
WITH t AS (
  SELECT conv_id, CAST(turn_idx AS BIGINT) AS ti,
    CAST(len(regexp_extract_all(lower(COALESCE(text, '')),
                                '{_TOK}')) AS BIGINT) AS n
  FROM read_parquet('{_tr_glob}')),
w AS (
  SELECT ti,
    COALESCE(SUM(n) OVER (PARTITION BY conv_id ORDER BY ti
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS p
  FROM t),
b AS (
  SELECT CAST(CASE WHEN ti < 8 THEN ti
              ELSE 4 + length(bin(ti)) END AS BIGINT) AS pos_bucket,
    p
  FROM w),
g AS (
  SELECT pos_bucket, CAST(COUNT(*) AS BIGINT) AS n_turns,
    CAST(SUM(p) AS BIGINT) AS sum_prefix_tokens
  FROM b GROUP BY 1)
SELECT pos_bucket,
  CAST(CASE WHEN pos_bucket < 8 THEN pos_bucket
       ELSE 1 << (pos_bucket - 5) END AS BIGINT) AS bucket_lo,
  n_turns, sum_prefix_tokens,
  CAST(1000 * sum_prefix_tokens // n_turns AS BIGINT)
    AS avg_prefix_tokens_milli
FROM g
"""
    # gaps-and-islands run lengths of consecutive same-role turns
    sql["role_run_lengths"] = f"""
WITH t AS (
  SELECT conv_id, CAST(turn_idx AS BIGINT) AS ti, role
  FROM read_parquet('{_tr_glob}')),
r AS (
  SELECT *,
    row_number() OVER (PARTITION BY conv_id ORDER BY ti)
    - row_number() OVER (PARTITION BY conv_id, role ORDER BY ti)
      AS grp
  FROM t),
runs AS (
  SELECT role, CAST(COUNT(*) AS BIGINT) AS run_len
  FROM r GROUP BY conv_id, role, grp)
SELECT role, run_len, CAST(COUNT(*) AS BIGINT) AS n_runs
FROM runs GROUP BY 1, 2
"""
    # tool-retry vs recovery: successor-role test on tool turns
    sql["tool_retry_stats"] = f"""
WITH o AS (
  SELECT role, lead(role) OVER (
    PARTITION BY conv_id ORDER BY turn_idx) AS nrole
  FROM read_parquet('{_tr_glob}'))
SELECT
  CAST(COUNT(*) FILTER (WHERE role = 'tool') AS BIGINT)
    AS n_tool_turns,
  CAST(COUNT(*) FILTER (WHERE role = 'tool' AND nrole = 'tool')
       AS BIGINT) AS n_retries,
  CAST(COUNT(*) FILTER (WHERE role = 'tool'
                        AND nrole = 'assistant') AS BIGINT)
    AS n_recovered,
  CAST(1000000 * COUNT(*) FILTER (WHERE role = 'tool'
                                  AND nrole = 'tool')
       // GREATEST(COUNT(*) FILTER (WHERE role = 'tool'), 1)
       AS BIGINT) AS retry_ppm
FROM o
"""
    # daily role-mix timeline with exact floor-ppm shares
    sql["role_share_daily"] = f"""
WITH t AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day, role
  FROM read_parquet('{_tr_glob}')),
g AS (
  SELECT day, role, CAST(COUNT(*) AS BIGINT) AS n_turns
  FROM t GROUP BY 1, 2),
d AS (SELECT day, CAST(SUM(n_turns) AS BIGINT) AS tot
      FROM g GROUP BY 1)
SELECT g.day, g.role, g.n_turns,
  CAST(1000000 * g.n_turns // d.tot AS BIGINT) AS share_ppm
FROM g JOIN d USING (day)
"""
    return sql
