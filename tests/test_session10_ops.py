"""Edge-case pins for the round-5 session-10 operators
(hybrid_rrf_top_docs, source_embedding_outliers, ngram_novelty_daily).
The DuckDB gate checks them corpus-wide at sf0.01; these pin boundary
semantics on crafted inputs: the RRF fusion arithmetic and rank bounds,
the off-domain-doc detection property + flag/threshold consistency, and
the novelty first-day / repeat-day / zero-bigram-day spine rules."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray

SF = "/root/testdata/sf0.001"

RECENT = "2025-12-31T00:00:00"


def _turns(rows):
    """rows: (conv_id, turn_idx, role, text, day_offset)."""
    base = np.datetime64(RECENT, "us").astype(np.int64)
    day = 86_400_000_000
    return pa.table({
        "conv_id": pa.array([r[0] for r in rows], pa.string()),
        "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
        "role": pa.array([r[2] for r in rows], pa.string()),
        "text": pa.array([r[3] for r in rows], pa.string()),
        "ts": pa.array(
            np.array([base + r[4] * day for r in rows],
                     dtype=np.int64).view("datetime64[us]")),
    })


# --- ngram_novelty_daily ----------------------------------------------------

def test_ngram_novelty_first_and_repeat_days(ray_session):
    from dataquality_ray.pipelines.conversations import ngram_novelty_daily
    rows = [
        ("c0", 0, "user", "a b c", 0),      # day0: {a b, b c} both new
        ("c1", 0, "user", "a b d", 1),      # day1: {a b old, b d new}
        ("c2", 0, "user", "a b", 2),        # day2: {a b} old only
    ]
    out = (ngram_novelty_daily(ray.data.from_arrow(_turns(rows)))
           .to_pandas().sort_values("day").reset_index(drop=True))
    assert list(out["n_distinct"]) == [2, 2, 1]
    assert list(out["n_new"]) == [2, 1, 0]
    assert list(out["novelty_permille"]) == [1000, 500, 0]


def test_ngram_novelty_zero_bigram_day_spine(ray_session):
    from dataquality_ray.pipelines.conversations import ngram_novelty_daily
    rows = [
        ("c0", 0, "user", "x y", 0),
        ("c1", 0, "user", "solo", 1),       # 1 token -> 0 bigrams
        ("c2", 0, "user", None, 2),         # null text -> 0 bigrams
    ]
    out = (ngram_novelty_daily(ray.data.from_arrow(_turns(rows)))
           .to_pandas().sort_values("day").reset_index(drop=True))
    # every day with turns emits a row, zero-bigram days as (0, 0, 0)
    assert len(out) == 3
    assert list(out["n_distinct"]) == [1, 0, 0]
    assert list(out["n_new"]) == [1, 0, 0]
    assert list(out["novelty_permille"]) == [1000, 0, 0]


def test_ngram_novelty_within_day_dedup(ray_session):
    from dataquality_ray.pipelines.conversations import ngram_novelty_daily
    # the same bigram 100x on one day counts ONCE (distinct semantics)
    rows = [(f"c{i}", 0, "user", "p q", 0) for i in range(100)]
    out = ngram_novelty_daily(ray.data.from_arrow(_turns(rows))).to_pandas()
    assert len(out) == 1
    assert out["n_distinct"][0] == 1 and out["n_new"][0] == 1


# --- hybrid_rrf_top_docs ----------------------------------------------------

def test_hybrid_rrf_fusion_arithmetic(ray_session):
    from dataquality_ray.pipelines.documents import (
        BM25_TOPK,
        RRF_K,
        hybrid_rrf_top_docs,
    )
    out = hybrid_rrf_top_docs(SF).to_pandas()
    assert len(out) > 0
    lr = out["lex_rank"].to_numpy()
    sr = out["sem_rank"].to_numpy()
    # ranks are 0 (absent) or within 1..K; every doc is in >= 1 list
    assert ((lr >= 0) & (lr <= BM25_TOPK)).all()
    assert ((sr >= 0) & (sr <= BM25_TOPK)).all()
    assert ((lr > 0) | (sr > 0)).all()
    # each present rank value appears exactly once per list
    for r in (lr, sr):
        present = r[r > 0]
        assert len(np.unique(present)) == len(present)
    # the fused score IS the integer RRF formula
    want = (np.where(lr > 0, 1_000_000 // (RRF_K + lr), 0)
            + np.where(sr > 0, 1_000_000 // (RRF_K + sr), 0))
    assert (out["rrf_ppm"].to_numpy() == want).all()
    # output ordered by (rrf desc, doc_id asc)
    key = list(zip(-out["rrf_ppm"].to_numpy(), out["doc_id"].to_numpy()))
    assert key == sorted(key)


# --- source_embedding_outliers ----------------------------------------------

def test_source_outliers_flag_matches_threshold(ray_session):
    from dataquality_ray.pipelines.documents import (
        OUTLIER_COS_TAU,
        source_embedding_outliers,
    )
    out = source_embedding_outliers(SF).to_pandas()
    n_docs = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    assert len(out) == n_docs
    cos = out["cos_centroid"].to_numpy()
    assert ((cos >= -1.0 - 1e-9) & (cos <= 1.0 + 1e-9)).all()
    assert (out["is_outlier"].to_numpy()
            == (cos < OUTLIER_COS_TAU).astype(np.int64)).all()


def test_source_outliers_detects_offdomain_doc(ray_session, tmp_path):
    from dataquality_ray.pipelines.documents import source_embedding_outliers
    # source A: 9 on-topic docs + 1 token-disjoint deviant; the deviant
    # must score the minimum cosine-to-centroid within the source
    texts = ["alpha beta gamma delta epsilon"] * 9 + [
        "zzz qqq www uuu mmm nnn ooo ppp"]
    tab = pa.table({
        "doc_id": pa.array(list(range(10)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * 10, pa.string()),
        "source": pa.array(["src_a"] * 10, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(tab, str(tmp_path / "documents.parquet"))
    out = (source_embedding_outliers(str(tmp_path)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    cos = out["cos_centroid"].to_numpy()
    assert np.argmin(cos) == 9
    # the nine identical docs share one cosine value
    assert len(np.unique(cos[:9])) == 1
    assert cos[9] < cos[0]


# --- pii_echo_turns ---------------------------------------------------------

def test_pii_echo_detects_assistant_parroting(ray_session):
    from dataquality_ray.pipelines.conversations import pii_echo_turns
    rows = [
        # c0: user gives an email at turn 0, assistant echoes it at 1
        ("c0", 0, "user", "contact me at bob@example.com", 0),
        ("c0", 1, "assistant", "sure, emailing bob@example.com now", 0),
        # c1: assistant mentions a DIFFERENT email -> no echo
        ("c1", 0, "user", "my email is ann@example.com", 0),
        ("c1", 1, "assistant", "noted, I will use help@corp.com", 0),
        # c2: assistant says the value BEFORE the user does -> no echo
        ("c2", 0, "assistant", "try 555-123-4567", 0),
        ("c2", 1, "user", "calling 555-123-4567", 0),
        # c3: no PII at all (spine row)
        ("c3", 0, "user", "hello there", 0),
    ]
    out = (pii_echo_turns(ray.data.from_arrow(_turns(rows)))
           .to_pandas().set_index("conv_id").sort_index())
    assert len(out) == 4                       # every conv emits a row
    assert out.loc["c0"].n_user_pii_values == 1
    assert out.loc["c0"].n_echo_values == 1
    assert out.loc["c0"].n_echo_turns == 1
    assert out.loc["c1"].n_echo_turns == 0
    assert out.loc["c2"].n_user_pii_values == 1
    assert out.loc["c2"].n_echo_turns == 0     # echo must be LATER
    assert out.loc["c3"].n_user_pii_values == 0


def test_pii_echo_same_turn_not_counted(ray_session):
    from dataquality_ray.pipelines.conversations import pii_echo_turns
    # the user-first turn itself (ti == fu) is not an echo even if the
    # roles were swapped at the same index in another conv
    rows = [
        ("c0", 2, "user", "ssn 123-45-6789", 0),
        ("c0", 2, "assistant", "", 0),   # same idx, no text
        ("c0", 5, "assistant", "your ssn 123-45-6789 is on file", 0),
    ]
    out = pii_echo_turns(ray.data.from_arrow(_turns(rows))).to_pandas()
    r = out.set_index("conv_id").loc["c0"]
    assert r.n_echo_turns == 1 and r.n_echo_values == 1


# --- conv_quality_trend -----------------------------------------------------

def test_conv_quality_trend_halves_and_sign(ray_session):
    from dataquality_ray.pipelines.conversations import conv_quality_trend
    # c0: 4 assistant turns, last two much longer (higher length score)
    short, long = "ok.", ("This is a well formed, reasonably long "
                          "answer with plenty of useful words in it. " * 3)
    rows = [
        ("c0", 0, "assistant", short, 0),
        ("c0", 1, "assistant", short, 0),
        ("c0", 2, "assistant", long, 0),
        ("c0", 3, "assistant", long, 0),
        # c1: single assistant turn -> excluded (n < 2)
        ("c1", 0, "assistant", long, 0),
        # c2: user-only -> excluded entirely
        ("c2", 0, "user", long, 0),
    ]
    out = (conv_quality_trend(ray.data.from_arrow(_turns(rows)))
           .to_pandas().set_index("conv_id"))
    assert list(sorted(out.index)) == ["c0"]
    r = out.loc["c0"]
    assert r.n_assistant == 4
    assert r.last_sum > r.first_sum and r.trend == 1


def test_conv_quality_trend_odd_middle_excluded(ray_session):
    from dataquality_ray.pipelines.conversations import conv_quality_trend
    # 3 identical turns: k = 1, middle turn in neither half -> flat
    t = "a perfectly ordinary answer with some words here."
    rows = [("c0", i, "assistant", t, 0) for i in range(3)]
    out = conv_quality_trend(ray.data.from_arrow(_turns(rows))).to_pandas()
    r = out.set_index("conv_id").loc["c0"]
    assert r.first_sum == r.last_sum and r.trend == 0


# --- max_containment_per_doc ------------------------------------------------

def _docs_dir(tmp_path, texts, langs=None, sources=None):
    n = len(texts)
    tab = pa.table({
        "doc_id": pa.array(list(range(n)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs or ["en"] * n, pa.string()),
        "source": pa.array(sources or ["s0"] * n, pa.string()),
        "n_chars": pa.array([len(t or "") for t in texts], pa.int64()),
    })
    pq.write_table(tab, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_containment_detects_subset_doc(ray_session, tmp_path):
    from dataquality_ray.pipelines.documents import max_containment_per_doc
    sub = "alpha beta gamma delta epsilon zeta"          # 4 shingles
    sup = sub + " eta theta iota kappa lam mu nu xi omicron pi rho"
    other = "one two three four five six seven eight"
    sf = _docs_dir(tmp_path, [sub, sup, other, "tiny doc"])
    out = (max_containment_per_doc(sf).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert len(out) == 4                       # doc spine: every doc
    # doc 0 fully contained in doc 1
    assert out.loc[0, "best_other"] == 1
    assert out.loc[0, "cont_milli"] == 1000
    assert out.loc[0, "n_shingles"] == 4
    # doc 1 contains doc 0 but is much larger -> asymmetric score
    assert out.loc[1, "best_other"] == 0
    assert 0 < out.loc[1, "cont_milli"] < 1000
    # doc 2 shares nothing; doc 3 is below the shingle width
    assert out.loc[2, "best_other"] == -1
    assert out.loc[3, "n_shingles"] == 0
    assert out.loc[3, "best_other"] == -1


def test_containment_df_cap_drops_boilerplate(ray_session, tmp_path):
    from dataquality_ray.pipelines.documents import (
        CONT_DF_CAP,
        max_containment_per_doc,
    )
    # one boilerplate sentence shared by CAP+2 docs, each padded with a
    # unique tail: the shared shingles exceed the cap and leave the
    # universe, so no doc finds a match through them
    boiler = "please do not reply to this automated message"
    texts = [f"{boiler} unique{i} tail{i} pad{i}"
             for i in range(CONT_DF_CAP + 2)]
    sf = _docs_dir(tmp_path, texts)
    out = max_containment_per_doc(sf).to_pandas()
    assert (out["best_other"] == -1).all()
    # denominator also excludes capped shingles
    assert (out["n_shingles"] < 10).all()


# --- langid_mismatch_by_source ----------------------------------------------

def test_langid_mismatch_counts(ray_session, tmp_path):
    from dataquality_ray.pipelines.documents import langid_mismatch_by_source
    en = "the cat and the dog sat in that house and it is warm"
    texts = [en, en, en, en]
    sf = _docs_dir(tmp_path, texts,
                   langs=["en", "en", "de", "es"],
                   sources=["good", "good", "bad", "bad"])
    out = (langid_mismatch_by_source(sf).to_pandas()
           .set_index("source"))
    assert out.loc["good"].n_mismatch == 0
    assert out.loc["good"].mismatch_permille == 0
    assert out.loc["bad"].n_mismatch == 2
    assert out.loc["bad"].mismatch_permille == 1000


# --- unsupported_number_turns -----------------------------------------------

def test_unsupported_numbers_grounding(ray_session):
    from dataquality_ray.pipelines.conversations import (
        unsupported_number_turns,
    )
    rows = [
        # c0: 1500 grounded by the user; 42 appears first in the
        # assistant turn -> unsupported; "5" ignored (single digit)
        ("c0", 0, "user", "my budget is 1500 for 5 items", 0),
        ("c0", 1, "assistant", "total is 1500 plus a fee of 42", 0),
        # c1: assistant introduces 99 FIRST -> unsupported even though
        # the user repeats it later
        ("c1", 0, "assistant", "it costs 99", 0),
        ("c1", 1, "user", "99 sounds fine", 0),
        # c2: all assistant numbers grounded by an earlier tool turn
        ("c2", 0, "tool", "result: 777", 0),
        ("c2", 1, "assistant", "the answer is 777", 0),
        # c3: no numbers anywhere (spine)
        ("c3", 0, "user", "hello", 0),
    ]
    out = (unsupported_number_turns(ray.data.from_arrow(_turns(rows)))
           .to_pandas().set_index("conv_id").sort_index())
    assert len(out) == 4
    assert out.loc["c0"].n_assistant_numbers == 2
    assert out.loc["c0"].n_unsupported == 1
    assert out.loc["c0"].n_ungrounded_turns == 1
    assert out.loc["c1"].n_unsupported == 1
    assert out.loc["c2"].n_unsupported == 0
    assert out.loc["c2"].n_grounded_turns == 1
    assert out.loc["c3"].n_assistant_numbers == 0


# --- semantic_drift_daily ---------------------------------------------------

def test_semantic_drift_identical_then_shifted(ray_session):
    from dataquality_ray.pipelines.conversations import semantic_drift_daily
    same = "the quick brown fox jumps over the lazy dog"
    shifted = "quantum flux capacitors destabilize chroniton emitters"
    rows = ([("a", 0, "user", same, 0)] * 3
            + [("b", 0, "user", same, 1)] * 3
            + [("c", 0, "user", shifted, 2)] * 3)
    rows = [(f"{r[0]}{i}", r[1], r[2], r[3], r[4])
            for i, r in enumerate(rows)]
    out = (semantic_drift_daily(ray.data.from_arrow(_turns(rows)))
           .to_pandas().sort_values("day").reset_index(drop=True))
    assert len(out) == 3
    assert list(out["n_turns"]) == [3, 3, 3]
    assert out.loc[0, "cos_prev"] == 1.0        # pinned first day
    assert out.loc[1, "cos_prev"] == 1.0        # identical centroids
    assert out.loc[2, "cos_prev"] < 0.5         # topical break


def test_semantic_drift_zero_vector_day(ray_session):
    from dataquality_ray.pipelines.conversations import semantic_drift_daily
    rows = [
        ("a", 0, "user", "alpha beta gamma", 0),
        ("b", 0, "user", "", 1),                 # token-less day
        ("c", 0, "user", "alpha beta gamma", 2),
    ]
    out = (semantic_drift_daily(ray.data.from_arrow(_turns(rows)))
           .to_pandas().sort_values("day").reset_index(drop=True))
    assert list(out["cos_prev"]) == [1.0, 0.0, 0.0]


# --- split_balance_audit ----------------------------------------------------

def test_split_balance_grid_and_arithmetic(ray_session, tmp_path):
    from dataquality_ray.pipelines.documents import (
        SPLIT_BUCKETS,
        SPLIT_TRAIN_LT,
        SPLIT_VAL_LT,
        split_balance_audit,
    )
    from dataquality_ray.spec import token_hash_u64
    texts = [f"doc number {i}" for i in range(40)]
    sf = _docs_dir(tmp_path, texts,
                   sources=["s0"] * 30 + ["s1"] * 10)
    out = split_balance_audit(sf).to_pandas()
    # full 2x3 grid even if a cell is empty
    assert len(out) == 6
    assert set(out["split"]) == {"train", "val", "test"}
    # recompute a cell by hand
    splits = {}
    for i in range(40):
        b = token_hash_u64(str(i)) % SPLIT_BUCKETS
        sp = ("train" if b < SPLIT_TRAIN_LT
              else "val" if b < SPLIT_VAL_LT else "test")
        src = "s0" if i < 30 else "s1"
        splits[(src, sp)] = splits.get((src, sp), 0) + 1
    row = out.set_index(["source", "split"])
    for (src, sp), n in splits.items():
        assert row.loc[(src, sp)].n_docs == n
    # deviations sum to ~0 per source (integer truncation slack)
    for src in ("s0", "s1"):
        sub = out[out.source == src]
        assert abs(int(sub.n_docs.sum()) - int(sub.expected_n.sum())) <= 3


# --- image_phash_near_dups --------------------------------------------------

def test_phash_extractor_deterministic(ray_session):
    from dataquality_ray.stages.multimodal import (
        PhashExtractor,
        encode_png,
    )
    rng = np.random.default_rng(7)
    img = rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
    batch = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "payload": pa.array([encode_png(img), encode_png(img)],
                            pa.binary()),
    })
    ex = PhashExtractor()
    out = ex(batch)
    assert out["phash"][0].as_py() == out["phash"][1].as_py()
    # a heavily perturbed image hashes differently
    img2 = 255 - img
    out2 = ex(pa.table({
        "doc_id": pa.array([2], pa.int64()),
        "payload": pa.array([encode_png(img2)], pa.binary()),
    }))
    assert out2["phash"][0].as_py() != out["phash"][0].as_py()


def test_image_phash_near_dups_finds_exact_pair(ray_session, tmp_path):
    from dataquality_ray.stages.multimodal import image_phash_near_dups
    # docs 0 and 1 identical -> identical PNGs -> hamming 0; doc 2
    # distinct
    texts = ["the same exact image content here"] * 2 + [
        "completely different pixels from other bytes entirely"]
    sf = _docs_dir(tmp_path, texts)
    out = (image_phash_near_dups(sf).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert len(out) == 3
    assert out.loc[0, "best_other"] == 1
    assert out.loc[1, "best_other"] == 0
    assert out.loc[0, "min_hamming"] == 0
    assert out.loc[2, "best_other"] == -1
    assert out.loc[2, "min_hamming"] == 64


# --- special_token_contamination --------------------------------------------

def test_special_token_contamination_counts(ray_session, tmp_path):
    from dataquality_ray.pipelines.documents import (
        SPECIAL_TOKEN_MARKERS,
        special_token_contamination,
    )
    texts = [
        "normal text here",
        "scrape artifact <|endoftext|> mid document",
        "chat leak <|im_start|>user says hi<|im_end|>",
        "llama style [INST] do the thing [/INST]",
    ]
    sf = _docs_dir(tmp_path, texts, sources=["s0", "s0", "s1", "s1"])
    out = (special_token_contamination(sf).to_pandas()
           .set_index(["source", "marker"]))
    # full grid: 2 sources x all markers
    assert len(out) == 2 * len(SPECIAL_TOKEN_MARKERS)
    assert out.loc[("s0", "<|endoftext|>")].n_docs_hit == 1
    assert out.loc[("s0", "<|endoftext|>")].hit_permille == 500
    assert out.loc[("s1", "<|im_start|>")].n_docs_hit == 1
    assert out.loc[("s1", "<|im_end|>")].n_docs_hit == 1
    assert out.loc[("s1", "[INST]")].n_docs_hit == 1
    assert out.loc[("s0", "[INST]")].n_docs_hit == 0
    assert out.loc[("s0", "canary GUID")].n_docs_hit == 0


# --- fim_split_documents ----------------------------------------------------

def test_fim_split_deterministic_and_bounded(ray_session, tmp_path):
    from dataquality_ray.pipelines.documents import (
        FIM_MIN_CHARS,
        fim_split_documents,
    )
    from dataquality_ray.spec import token_hash_u64
    long = "x" * 100
    short = "tiny"
    sf = _docs_dir(tmp_path, [long, short])
    out = (fim_split_documents(sf).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    r = out.loc[0]
    assert r.fim_eligible == 1
    # spans tile the doc exactly
    assert r.n_prefix + r.n_middle + r.n_suffix == r.n_chars == 100
    assert 0 <= r.cut1 <= r.cut2 < 100
    # the cuts ARE the hash formula (stable under re-runs)
    c1 = token_hash_u64("fim1:0") % 100
    c2 = token_hash_u64("fim2:0") % 100
    assert (r.cut1, r.cut2) == (min(c1, c2), max(c1, c2))
    # short doc ineligible, zeroed
    s = out.loc[1]
    assert s.n_chars == len(short) < FIM_MIN_CHARS
    assert s.fim_eligible == 0 and s.cut1 == 0 and s.cut2 == 0


# --- filter_agreement_matrix ------------------------------------------------

def test_filter_agreement_matrix_shape_and_consistency(ray_session):
    from dataquality_ray.pipelines.documents import (
        FILTER_GATES,
        filter_agreement_matrix,
    )
    out = filter_agreement_matrix(SF).to_pandas()
    n_g = len(FILTER_GATES)
    assert len(out) == n_g * (n_g - 1) // 2
    # every pair partitions the same corpus
    tot = (out.n_both + out.n_only_a + out.n_only_b
           + out.n_neither).unique()
    assert len(tot) == 1 and tot[0] > 0
    # jaccard formula holds
    import numpy as np
    want = (1000 * out.n_both.to_numpy()
            // np.maximum((out.n_both + out.n_only_a
                           + out.n_only_b).to_numpy(), 1))
    assert (out.jaccard_permille.to_numpy() == want).all()
    # pairs ordered and unique
    pairs = list(zip(out.gate_a, out.gate_b))
    assert len(set(pairs)) == len(pairs)


# --- calibrated_thresholds_by_source ----------------------------------------

def test_calibrated_threshold_rule(ray_session):
    from dataquality_ray.pipelines.documents import (
        CALIB_TARGET_PERMILLE,
        calibrated_thresholds_by_source,
    )
    out = calibrated_thresholds_by_source(SF).to_pandas()
    assert len(out) > 0
    # the rule: kept-rate at the chosen threshold <= target, and the
    # threshold is minimal (t-1 would overflow the target)
    assert (out.kept_permille <= CALIB_TARGET_PERMILLE).all()
    assert (out.threshold >= 0).all() and (out.threshold <= 101).all()
    import numpy as np
    from dataquality_ray.pipelines.documents import quality_documents
    q = quality_documents(SF).to_pandas()
    import pyarrow.parquet as _pq
    src = _pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "source"]).to_pandas()
    j = q.merge(src, on="doc_id")
    for _, r in out.head(5).iterrows():
        s = j[j.source == r.source]["overall_quality_score"].to_numpy()
        n = len(s)
        assert r.n_docs == n
        assert (s >= r.threshold).sum() == r.n_kept
        if r.threshold > 0:
            prev_kept = (s >= r.threshold - 1).sum()
            assert 1000 * prev_kept > CALIB_TARGET_PERMILLE * n


# --- mixture_dedup_shift ----------------------------------------------------

def test_mixture_dedup_shift_signal_and_arithmetic(ray_session):
    from dataquality_ray.pipelines.documents import (
        MIXTURE_PPM,
        mixture_dedup_shift,
    )
    out = mixture_dedup_shift(SF).to_pandas()
    assert len(out) > 0
    # kept chars never exceed raw; near-dups exist at sf0.001 so at
    # least one source actually shrank
    assert (out.sum_chars_kept <= out.sum_chars_raw).all()
    assert (out.sum_chars_kept < out.sum_chars_raw).any()
    # both weight columns are mixtures (sum to ~1e6 up to trunc slack)
    assert abs(int(out.weight_raw_ppm.sum()) - MIXTURE_PPM) < len(out)
    assert abs(int(out.weight_kept_ppm.sum()) - MIXTURE_PPM) < len(out)
    # deltas are the column difference and sum to ~0
    assert (out.delta_ppm
            == out.weight_kept_ppm - out.weight_raw_ppm).all()
    assert abs(int(out.delta_ppm.sum())) < 2 * len(out)


# --- doc_near_dup_split_leakage ---------------------------------------------

def test_doc_split_leakage_grid(ray_session):
    from dataquality_ray.pipelines.documents import (
        doc_near_dup_split_leakage,
    )
    out = doc_near_dup_split_leakage(SF).to_pandas()
    # full unordered 3x3 grid (6 cells), normalized a <= b
    assert len(out) == 6
    assert (out.split_a <= out.split_b).all()
    assert (out.n_pairs >= 0).all()
    # near-dups exist at sf0.001, so the grid carries mass
    assert out.n_pairs.sum() > 0


# --- top_duplicated_turns ---------------------------------------------------

def test_top_duplicated_turns_ranking_and_sample(ray_session):
    from dataquality_ray.pipelines.conversations import (
        TOP_DUP_K,
        top_duplicated_turns,
    )
    rows = ([("a0", 0, "user", "COPY me  please", 0)]     # norm-equal
            + [(f"b{i}", 1, "user", "copy me please", 0)
               for i in range(4)]                          # 5 copies
            + [(f"c{i}", 0, "user", "twice here", 0) for i in range(2)]
            + [("d0", 0, "user", "unique text", 0),
               ("e0", 0, "user", "", 0)])                  # excluded
    out = top_duplicated_turns(
        ray.data.from_arrow(_turns(rows))).to_pandas()
    assert len(out) <= TOP_DUP_K
    # rank 1: the 5-copy content (case/whitespace-insensitive hash)
    assert out.loc[0, "n_copies"] == 5
    # sample = min (conv_id, turn_idx) copy with its RAW text
    assert out.loc[0, "conv_id"] == "a0"
    assert out.loc[0, "sample_text"] == "COPY me  please"
    assert out.loc[1, "n_copies"] == 2
    # descending by copies
    assert list(out["n_copies"]) == sorted(out["n_copies"],
                                           reverse=True)
