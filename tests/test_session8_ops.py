"""Edge-case pins for the round-5 session-8 operators
(conv_preference_pairs, k_anonymity_documents, epoch_plan_by_source,
shard_plan_documents, pq_codes / pq_ann_topk). The DuckDB gate checks
them corpus-wide at sf0.01; these pin the boundary semantics: argmax /
argmin tie-breaking, margin-zero exclusion, the exact bit-length
bucket, the K_ANON boundary, round-robin balance, epoch capping, and
PQ self-assignment / exact-ADC arithmetic on crafted inputs."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray


# --- conv_preference_pairs ------------------------------------------------

CLEAN = ("alpha bravo charlie delta echo foxtrot golf hotel india "
         "juliet kilo lima")          # >=20 chars, distinct, no symbols
RECENT = "2025-12-31T00:00:00"        # 1 day before reference_now


def _pref(rows):
    from dataquality_ray.pipelines.conversations import (
        conv_preference_pairs,
    )
    t = pa.table({
        "conv_id": pa.array([r[0] for r in rows], pa.string()),
        "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
        "role": pa.array([r[2] for r in rows], pa.string()),
        "text": pa.array([r[3] for r in rows], pa.string()),
        "ts": pa.array(
            np.array([np.datetime64(RECENT, "us").astype(np.int64)]
                     * len(rows), dtype=np.int64).view("datetime64[us]")),
    })
    out = conv_preference_pairs(ray.data.from_arrow(t)).to_pandas()
    if len(out) == 0:     # empty Ray results drop their schema
        return out
    return out.set_index("conv_id")


def test_pref_tie_breaks_to_lower_turn_idx(ray_session):
    # two identical best turns -> chosen is the EARLIER one; the
    # empty-text turn scores 500 (length 0) and is rejected
    r = _pref([("c", 0, "assistant", CLEAN),
               ("c", 2, "assistant", CLEAN),
               ("c", 4, "assistant", "")])
    row = r.loc["c"]
    assert row.n_assistant == 3
    assert row.chosen_idx == 0 and row.chosen_score == 600
    assert row.rejected_idx == 4 and row.rejected_score == 500
    assert row.margin == 100


def test_pref_margin_zero_and_singletons_excluded(ray_session):
    r = _pref([
        ("equal", 0, "assistant", CLEAN),   # identical scores ->
        ("equal", 1, "assistant", CLEAN),   #   margin 0, dropped
        ("single", 0, "assistant", CLEAN),  # one assistant turn only
        ("single", 1, "user", ""),          # user turns never count
    ])
    assert len(r) == 0


def test_pref_non_assistant_roles_ignored(ray_session):
    # the terrible user/system/tool turns must not become 'rejected'
    r = _pref([("c", 0, "user", ""),
               ("c", 1, "assistant", CLEAN),
               ("c", 2, "system", ""),
               ("c", 3, "assistant", "short"),
               ("c", 4, "tool", "")])
    row = r.loc["c"]
    assert row.n_assistant == 2
    assert row.chosen_idx == 1 and row.rejected_idx == 3
    # 'short': length_score 100*5//20 = 25 -> h = 525
    assert row.rejected_score == 525 and row.margin == 75


# --- k_anonymity_documents --------------------------------------------------

def test_bit_length_exact():
    from dataquality_ray.pipelines.documents import _bit_length_i64
    v = np.array([-5, 0, 1, 2, 3, 4, 1023, 1024, 2**40], dtype=np.int64)
    got = _bit_length_i64(v)
    want = [0, 0, 1, 2, 2, 3, 10, 11, 41]
    assert got.tolist() == want


def _write_docs(tmp_path, rows):
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array(["x" * max(r[3], 0) for r in rows], pa.string()),
        "lang": pa.array([r[1] for r in rows], pa.string()),
        "source": pa.array([r[2] for r in rows], pa.string()),
        "n_chars": pa.array([r[3] for r in rows], pa.int64()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_k_anon_boundary_and_zero_bucket(ray_session, tmp_path):
    from dataquality_ray.pipelines.documents import (
        K_ANON,
        k_anonymity_documents,
    )
    rows = [(i, "en", "web", 5) for i in range(K_ANON)]          # == K
    rows += [(100 + i, "de", "web", 5) for i in range(K_ANON - 1)]
    rows += [(200, "en", "web", 0)]                              # bucket 0
    out = k_anonymity_documents(_write_docs(tmp_path, rows)) \
        .to_pandas().set_index(["lang", "source", "len_bucket"])
    assert bool(out.loc[("en", "web", 3)].k_anonymous) is True   # == K -> ok
    assert int(out.loc[("en", "web", 3)].group_size) == K_ANON
    assert bool(out.loc[("de", "web", 3)].k_anonymous) is False  # K-1
    assert int(out.loc[("en", "web", 0)].group_size) == 1        # 0 chars


# --- epoch_plan_by_source ---------------------------------------------------

def test_epoch_plan_cap_and_zero_source(ray_session, tmp_path):
    from dataquality_ray.pipelines.documents import (
        epoch_plan_by_source,
    )
    # 'big' 100 chars, 'tiny' 1 char, 'void' 0 chars: sqrt weights give
    # tiny/void outsized allocations; epochs cap at MAX_EPOCHS and the
    # un-fillable remainder must surface as shortfall
    rows = [(0, "en", "big", 100), (1, "en", "tiny", 1),
            (2, "en", "void", 0)]
    out = epoch_plan_by_source(_write_docs(tmp_path, rows)) \
        .to_pandas().set_index("source")
    sq_big, sq_tiny = 10_000, 1_000   # floor(sqrt(c * 1e6))
    tot = sq_big + sq_tiny
    alloc_big = (2 * 101 * sq_big) // tot
    alloc_tiny = (2 * 101 * sq_tiny) // tot
    assert int(out.loc["big"].alloc_chars) == alloc_big
    assert int(out.loc["big"].epochs) == 2        # ceil(183/100)
    assert int(out.loc["big"].shortfall_chars) == 0
    assert int(out.loc["tiny"].alloc_chars) == alloc_tiny
    assert int(out.loc["tiny"].epochs) == 4       # capped (needs 19)
    assert int(out.loc["tiny"].achieved_chars) == 4
    assert int(out.loc["tiny"].shortfall_chars) == alloc_tiny - 4
    assert int(out.loc["void"].epochs) == 0
    assert int(out.loc["void"].shortfall_chars) == \
        int(out.loc["void"].alloc_chars)


# --- shard_plan_documents ---------------------------------------------------

def test_shard_plan_round_robin_balance(ray_session, tmp_path):
    from dataquality_ray.pipelines.documents import (
        N_SHARDS,
        shard_plan_documents,
    )
    # 4*N_SHARDS docs, equal length -> rank order is doc_id order and
    # every shard gets exactly 4 docs; with MIXED lengths the dealing
    # rule keeps shard totals within one max-doc of each other
    rows = [(i, "en", "web", 7) for i in range(4 * N_SHARDS)]
    out = shard_plan_documents(_write_docs(tmp_path, rows)).to_pandas()
    assert len(out) == N_SHARDS
    assert set(out["n_docs"]) == {4}
    assert set(out["sum_chars"]) == {28}

    rows = [(i, "en", "web", 1 + (i * 37) % 100)
            for i in range(8 * N_SHARDS)]
    out2 = shard_plan_documents(_write_docs(tmp_path, rows)).to_pandas()
    spread = int(out2["sum_chars"].max() - out2["sum_chars"].min())
    assert spread <= int(out2["max_chars"].max())


# --- product quantization ---------------------------------------------------

def _write_emb(tmp_path, mat):
    t = pa.table({
        "vec_id": pa.array(range(len(mat)), pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in mat],
                              pa.list_(pa.float32())),
        "label": pa.array([0] * len(mat), pa.int32()),
    })
    pq.write_table(t, str(tmp_path / "embeddings.parquet"))
    return str(tmp_path)


def test_pq_codes_extremes_self_assign(ray_session, tmp_path):
    from dataquality_ray.pipelines.documents import (
        PQ_K,
        PQ_SUB,
        pq_codes_embeddings,
    )
    # vector j is constant (j-8)/10 in every component: the int8 dots
    # a_i*a_j are maximized at j=0 for negative a_i and j=15 for
    # positive a_i — so vec 0 and vec 15 must self-assign in every
    # subspace, and a positive mid vector must pick code 15
    mat = np.stack([np.full(8, (j - 8) / 10.0) for j in range(18)])
    out = pq_codes_embeddings(_write_emb(tmp_path, mat)).to_pandas()
    assert len(out) == 18 * PQ_SUB
    assert out["code"].between(0, PQ_K - 1).all()
    by = out.set_index(["vec_id", "subspace"])
    for s in range(PQ_SUB):
        assert int(by.loc[(0, s)].code) == 0
        assert int(by.loc[(15, s)].code) == 15
        assert int(by.loc[(12, s)].code) == 15   # a=0.4>0 -> max a_j


def test_pq_adc_matches_numpy_replay(ray_session, tmp_path):
    from dataquality_ray.pipelines.documents import (
        ANN_QUERY_IDS,
        INT8_SCALE,
        PQ_SUB,
        pq_ann_topk_embeddings,
        pq_codes_embeddings,
    )
    rng = np.random.default_rng(7)
    mat = rng.normal(0, 0.3, size=(40, 8))
    sf = _write_emb(tmp_path, mat)
    codes = pq_codes_embeddings(sf).to_pandas() \
        .set_index(["vec_id", "subspace"])["code"]
    q = np.clip(np.floor(mat * INT8_SCALE), -127, 127).astype(np.int64)
    cb = q[:16].reshape(16, PQ_SUB, 2).transpose(1, 0, 2)
    got = pq_ann_topk_embeddings(sf).to_pandas()
    for _, row in got.iterrows():
        qv = q[int(row.query_id)].reshape(PQ_SUB, 2)
        want = sum(int(qv[s] @ cb[s][int(codes.loc[(row.vec_id, s)])])
                   for s in range(PQ_SUB))
        assert int(row.adc_dot) == want
    # rank is dense 1..k per query, ties by vec_id asc
    for qid, grp in got.groupby("query_id"):
        grp = grp.sort_values("rank")
        assert grp["rank"].tolist() == list(range(1, len(grp) + 1))
        keys = list(zip(-grp["adc_dot"], grp["vec_id"]))
        assert keys == sorted(keys)
    assert set(got["query_id"]) == set(ANN_QUERY_IDS)


# --- vocab_coverage_curve -----------------------------------------------

def test_coverage_curve_tie_aware_boundary(ray_session, tmp_path):
    from dataquality_ray.pipelines.documents import (
        vocab_coverage_curve,
    )
    # counts: a=4, b=2, c=2, d=1 -> V=4, M=9; at vsize=2 the boundary
    # sits inside the cf=2 tie: covered must be 4+2=6 (never 4+2+2)
    t = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["a a b c d", "a a b c"], pa.string()),
        "lang": pa.array(["en", "en"], pa.string()),
        "source": pa.array(["w", "w"], pa.string()),
        "n_chars": pa.array([9, 7], pa.int64()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    out = vocab_coverage_curve(str(tmp_path)).to_pandas() \
        .set_index("k")
    assert int(out.loc[0].covered_cf) == 4      # top-1 = 'a'
    assert int(out.loc[1].covered_cf) == 6      # tie-aware
    assert int(out.loc[2].covered_cf) == 9      # whole vocab
    assert int(out.loc[2].vocab_size) == 4      # clamped to V
    assert int(out.loc[16].covered_cf) == 9
    assert int(out.loc[0].coverage_ppm) == 4 * 1_000_000 // 9


# --- instruction_verb_census ---------------------------------------------

def test_verb_census_openers_roles_and_ties(ray_session):
    from dataquality_ray.pipelines.conversations import (
        instruction_verb_census,
    )
    rows = [
        ("c", 0, "user", "Write a poem"),
        ("c", 1, "assistant", "here you go"),
        ("c", 2, "user", "  write faster"),    # leading ws; lowered
        ("c", 3, "user", "Summarize this"),
        ("c", 4, "user", ""),                  # no opener -> excluded
        ("c", 5, "system", "summarize all"),   # non-user -> excluded
        ("c", 6, "user", "explain it"),
    ]
    t = pa.table({
        "conv_id": pa.array([r[0] for r in rows], pa.string()),
        "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
        "role": pa.array([r[2] for r in rows], pa.string()),
        "text": pa.array([r[3] for r in rows], pa.string()),
    })
    out = instruction_verb_census(ray.data.from_arrow(t)).to_pandas()
    got = dict(zip(out["token"], out["n_turns"]))
    assert got == {"write": 2, "summarize": 1, "explain": 1}
    # ties (count 1) order lexicographically after the count sort
    assert out["token"].tolist() == ["write", "explain", "summarize"]


# --- source_centroid_similarity -------------------------------------------

def test_centroid_similarity_zero_norm_and_identical(ray_session,
                                                     tmp_path):
    from dataquality_ray.pipelines.documents import (
        source_centroid_similarity,
    )
    t = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["hello world", "", "hello world"],
                         pa.string()),
        "lang": pa.array(["en"] * 3, pa.string()),
        "source": pa.array(["x", "y", "z"], pa.string()),
        "n_chars": pa.array([11, 0, 11], pa.int64()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    out = source_centroid_similarity(str(tmp_path)).to_pandas() \
        .set_index(["source_a", "source_b"])
    assert float(out.loc[("x", "y")].cosine_sim) == 0.0   # zero norm
    assert float(out.loc[("y", "z")].cosine_sim) == 0.0
    assert float(out.loc[("x", "z")].cosine_sim) == 1.0   # identical


# --- exact_dup_source_matrix ----------------------------------------------

def test_exact_dup_matrix_count_math_and_grid(ray_session, tmp_path):
    from dataquality_ray.pipelines.documents import (
        exact_dup_source_matrix,
    )
    texts = ["Hello  World", "hello world ", "hello world",
             "other text", ""]
    srcs = ["x", "x", "y", "y", "y"]
    t = pa.table({
        "doc_id": pa.array(range(5), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * 5, pa.string()),
        "source": pa.array(srcs, pa.string()),
        "n_chars": pa.array([len(s) for s in texts], pa.int64()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    out = exact_dup_source_matrix(str(tmp_path)).to_pandas() \
        .set_index(["source_a", "source_b"])
    # norm 'hello world': x has 2 copies, y has 1
    assert int(out.loc[("x", "x")].n_dup_pairs) == 1     # C(2,2)
    assert int(out.loc[("x", "y")].n_dup_pairs) == 2     # 2*1
    assert int(out.loc[("x", "y")].n_hashes) == 1
    # grid semantics: the empty (y,y) cell still exists, zero-filled
    assert int(out.loc[("y", "y")].n_dup_pairs) == 0
    assert len(out) == 3                                 # full grid


# --- dup_rate_daily ---------------------------------------------------------

def test_dup_rate_daily_first_occurrence_and_empties(ray_session):
    from dataquality_ray.pipelines.conversations import (
        _DAY_US,
        dup_rate_daily,
    )
    day0, day1 = 100 * _DAY_US, 101 * _DAY_US
    rows = [
        ("a", 0, "same text", day0),        # first occurrence
        ("a", 1, "", day0),                 # empty: counted, never dup
        ("b", 0, "Same  Text", day1),       # norm-equal -> dup on day1
        ("b", 1, "fresh", day1),
    ]
    t = pa.table({
        "conv_id": pa.array([r[0] for r in rows], pa.string()),
        "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
        "text": pa.array([r[2] for r in rows], pa.string()),
        "ts": pa.array(np.array([r[3] for r in rows],
                                dtype=np.int64).view("datetime64[us]")),
    })
    out = dup_rate_daily(ray.data.from_arrow(t)).to_pandas() \
        .set_index("day")
    assert int(out.loc[100].n_turns) == 2
    assert int(out.loc[100].n_dup_turns) == 0
    assert int(out.loc[101].n_turns) == 2
    assert int(out.loc[101].n_dup_turns) == 1
    assert int(out.loc[101].dup_permille) == 500


# --- conv_lang_switches -----------------------------------------------------

def test_lang_switches_adjacent_and_distinct(ray_session):
    from dataquality_ray.pipelines.conversations import (
        conv_lang_switches,
    )
    rows = [
        ("c", 0, "the and of to is"),    # en
        ("c", 1, "el los que una"),      # es   (switch 1)
        ("c", 2, "the and of to is"),    # en   (switch 2)
        ("c", 3, ""),                    # und  (switch 3)
        ("d", 0, "the and of to is"),    # new conv: first turn never
        ("d", 1, "the and of to is"),    #   a switch; same lang -> 0
    ]
    t = pa.table({
        "conv_id": pa.array([r[0] for r in rows], pa.string()),
        "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
        "text": pa.array([r[2] for r in rows], pa.string()),
    })
    out = conv_lang_switches(ray.data.from_arrow(t)).to_pandas() \
        .set_index("conv_id")
    assert int(out.loc["c"].n_switches) == 3
    assert int(out.loc["c"].n_langs) == 3
    assert int(out.loc["c"].n_turns) == 4
    assert int(out.loc["d"].n_switches) == 0
    assert int(out.loc["d"].n_langs) == 1
