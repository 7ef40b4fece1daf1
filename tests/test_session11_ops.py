"""Edge-case pins for the round-5 session-11 operators
(kn_discount_stats, length_bucket_packing_stats,
phrase_match_documents, curriculum_phase_documents,
hll_users_cumulative_daily). The DuckDB gate checks them corpus-wide
at sf0.01; these pin the boundary semantics on crafted inputs:
count-of-counts arithmetic and the negative-discount clamp, the
power-of-two bucket boundaries, phrase adjacency / overlap / case /
position arithmetic, the exact tertile rank rule, and cumulative
register monotonicity + the dense grid."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _write_docs(tmp_path, rows):
    """rows: (doc_id, source, text)."""
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[2] for r in rows], pa.string()),
        "lang": pa.array(["en"] * len(rows), pa.string()),
        "source": pa.array([r[1] for r in rows], pa.string()),
        "n_chars": pa.array([len(r[2] or "") for r in rows],
                            pa.int64()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def _write_events(tmp_path, rows):
    """rows: (user_id, day_offset)."""
    base = np.datetime64("2025-01-01T00:00:00", "us").astype(np.int64)
    day = 86_400_000_000
    t = pa.table({
        "event_id": pa.array(list(range(len(rows))), pa.int64()),
        "ts": pa.array(np.array(
            [base + r[1] * day for r in rows],
            dtype=np.int64).view("datetime64[us]")),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array(["click"] * len(rows), pa.string()),
        "value": pa.array([1.0] * len(rows), pa.float64()),
        "props": pa.array(['{"k": 1}'] * len(rows), pa.string()),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))
    return str(tmp_path)


# --- kn_discount_stats ------------------------------------------------------

def test_kn_counts_and_discounts(ray_session, tmp_path):
    from dataquality_ray.pipelines.documents import kn_discount_stats
    # bigrams: "a b" x2, "c d" x1, "e f" x1, "f g" x1
    rows = [(1, "s", "a b"), (2, "s", "a b"), (3, "s", "c d"),
            (4, "s", "e f g")]
    out = kn_discount_stats(_write_docs(tmp_path, rows),
                            num_buckets=4).to_pandas().iloc[0]
    assert out.n_bigrams == 5 and out.n_distinct == 4
    assert (out.n1, out.n2, out.n3, out.n4) == (3, 1, 0, 0)
    deno = 3 + 2 * 1
    assert out.d1_micro == 1_000_000 * 3 // deno       # 600000
    assert out.d2_micro == 2 * 1 * deno * 1_000_000 // (1 * deno)
    assert out.d3_micro == 0


def test_kn_negative_discount_clamped(ray_session, tmp_path):
    from dataquality_ray.pipelines.documents import kn_discount_stats
    # n1=10 singles, n2=1 double, n3=5 triples ->
    # 3*n1*n3 = 150 > 2*n2*deno = 24 -> D2 numerator clamps to 0
    rows, did = [], 0
    for i in range(10):
        did += 1
        rows.append((did, "s", f"s{i}a s{i}b"))
    for _ in range(2):
        did += 1
        rows.append((did, "s", "d0a d0b"))
    for j in range(5):
        for _ in range(3):
            did += 1
            rows.append((did, "s", f"t{j}a t{j}b"))
    out = kn_discount_stats(_write_docs(tmp_path, rows),
                            num_buckets=4).to_pandas().iloc[0]
    assert (out.n1, out.n2, out.n3) == (10, 1, 5)
    assert out.d2_micro == 0


# --- length_bucket_packing_stats -------------------------------------------

def test_packing_bucket_boundaries(ray_session, tmp_path):
    from dataquality_ray.pipelines.documents import (
        length_bucket_packing_stats,
    )
    # token counts 0,1,2,3,4,5,8,9 -> buckets 0,0,1,2,2,3,3,4
    counts = [0, 1, 2, 3, 4, 5, 8, 9]
    rows = [(i, "s", " ".join(["w"] * n))
            for i, n in enumerate(counts)]
    out = (length_bucket_packing_stats(_write_docs(tmp_path, rows))
           .to_pandas().set_index("bucket"))
    assert list(out.index) == [0, 1, 2, 3, 4]
    assert list(out.seq_len) == [1, 2, 4, 8, 16]
    b0 = out.loc[0]
    assert b0.n_docs == 2 and b0.sum_tokens == 1
    assert b0.padded_tokens == 2 and b0.pad_waste_ppm == 500_000
    assert b0.packed_seqs == 1
    b3 = out.loc[3]
    assert b3.n_docs == 2 and b3.sum_tokens == 13
    assert b3.padded_tokens == 16
    assert b3.pad_waste_ppm == 1_000_000 * 3 // 16
    assert b3.packed_seqs == 2          # ceil(13/8)


# --- phrase_match_documents -------------------------------------------------

def test_phrase_adjacency_case_and_positions(ray_session, tmp_path):
    from dataquality_ray.pipelines.documents import (
        phrase_match_documents,
    )
    rows = [
        (1, "s", "spark window spark window"),   # pos 0 and 2
        (2, "s", "spark spark window"),          # pos 1 only
        (3, "s", "window spark"),                # wrong order: none
        (4, "s", "SPARK, WINDOW!"),              # case+punct: pos 0
        (5, "s", "spark is window"),             # not adjacent: none
        (6, "s", None),                          # null text: none
    ]
    out = (phrase_match_documents(_write_docs(tmp_path, rows))
           .to_pandas().set_index("doc_id").sort_index())
    assert list(out.index) == [1, 2, 4]
    assert (out.loc[1].n_matches, out.loc[1].first_pos) == (2, 0)
    assert (out.loc[2].n_matches, out.loc[2].first_pos) == (1, 1)
    assert (out.loc[4].n_matches, out.loc[4].first_pos) == (1, 0)


# --- curriculum_phase_documents --------------------------------------------

def test_curriculum_tertile_rank_rule(ray_session, tmp_path):
    from dataquality_ray.pipelines.documents import (
        curriculum_phase_documents,
    )
    # difficulties (cpt_milli): "" -> -1 (no tokens), "a b c d" ->
    # 1750, "ab cd" -> 2500, "aaaa" -> 4000. n=4: ceil(4/3)=2,
    # ceil(8/3)=3 -> t1 = 2nd smallest (1750), t2 = 3rd (2500).
    rows = [(1, "s", "aaaa"), (2, "s", "ab cd"),
            (3, "s", "a b c d"), (4, "s", "")]
    out = (curriculum_phase_documents(_write_docs(tmp_path, rows))
           .to_pandas().set_index("doc_id").sort_index())
    assert list(out.difficulty) == [4000, 2500, 1750, -1]
    assert list(out.phase) == [3, 2, 1, 1]


# --- hll_users_cumulative_daily --------------------------------------------

def test_hll_cumulative_grid_and_monotone(ray_session, tmp_path):
    from dataquality_ray.pipelines.metrics import (
        HLL_REGISTERS,
        hll_estimate,
        hll_reg_rho,
        hll_users_cumulative_daily,
    )
    from dataquality_ray.spec import token_hash_u64
    # day0: users {1,2}; day1: {2} (no state change); day2: {99}
    rows = [(1, 0), (2, 0), (2, 1), (99, 2)]
    out = (hll_users_cumulative_daily(_write_events(tmp_path, rows))
           .to_pandas())
    days = sorted(out["day"].unique())
    assert len(days) == 3 and len(out) == 3 * HLL_REGISTERS
    mats = {d: out[out.day == d].set_index("reg")["rho"]
            .sort_index().to_numpy() for d in days}
    # expected register states from the shared kernel
    hv = np.array([token_hash_u64(str(u)) for u in (1, 2, 99)],
                  dtype=np.uint64)
    reg, rho = hll_reg_rho(hv)
    exp0 = np.zeros(HLL_REGISTERS, dtype=np.int64)
    for r, h in zip(reg[:2], rho[:2]):
        exp0[r] = max(exp0[r], h)
    exp2 = exp0.copy()
    exp2[reg[2]] = max(exp2[reg[2]], rho[2])
    assert (mats[days[0]] == exp0).all()
    assert (mats[days[1]] == exp0).all()      # returning user: no-op
    assert (mats[days[2]] == exp2).all()
    assert (mats[days[2]] >= mats[days[0]]).all()
    est = hll_estimate(dict(enumerate(mats[days[2]])))
    assert 1.0 <= est <= 10.0                 # 3 true distinct users


# --- collocation_phrases ----------------------------------------------------

def test_collocation_score_and_tiebreak(ray_session, tmp_path):
    from dataquality_ray.pipelines.documents import (
        COLLOC_DELTA,
        collocation_phrases,
    )
    assert COLLOC_DELTA == 2
    # unigrams: new=3, york=3, city=1, the=3; pairs: (new,york)=3,
    # (york,new)=1, (york,city)=1, (the,the)=2
    rows = [(1, "s", "new york new york"),
            (2, "s", "new york city"),
            (3, "s", "the the the")]
    out = collocation_phrases(_write_docs(tmp_path, rows),
                              num_buckets=4).to_pandas()
    top = out.iloc[0]
    assert (top.a, top.b, top.c_a, top.c_b, top.c_ab) == \
        ("new", "york", 3, 3, 3)
    assert top.score_ppb == (3 - 2) * 1_000_000_000 // (3 * 3)
    # all other pairs clamp to score 0 (c_ab <= DELTA), tie-broken
    # by (a, b) ascending
    rest = out.iloc[1:]
    assert (rest.score_ppb == 0).all()
    assert list(zip(rest.a, rest.b)) == [
        ("the", "the"), ("york", "city"), ("york", "new")]


# --- shard_interleave_plan --------------------------------------------------

def test_interleave_ranks_and_grid(ray_session, tmp_path):
    from dataquality_ray.pipelines.documents import (
        shard_interleave_plan,
    )
    from dataquality_ray.spec import token_hash_u64
    rows = [(i, "a" if i % 2 else "b", f"text {i}")
            for i in range(10)]
    out = (shard_interleave_plan(_write_docs(tmp_path, rows))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert len(out) == 10
    for src, sidx in (("a", 0), ("b", 1)):
        sub = out[out.source == src]
        assert sorted(sub.src_rank) == list(range(len(sub)))
        assert (sub.global_pos == sub.src_rank * 2 + sidx).all()
        # rank order == unsigned order of the frozen hash
        hv = {i: token_hash_u64(f"ilv:{i}") for i in sub.doc_id}
        by_rank = sub.sort_values("src_rank").doc_id.tolist()
        assert by_rank == sorted(sub.doc_id, key=lambda i: (hv[i], i))
    # the grid interleaves sources 1:1 at the head
    head = out.sort_values("global_pos").head(4).source.tolist()
    assert head == ["a", "b", "a", "b"]


# --- mixture_temperature_sweep ----------------------------------------------

def test_temperature_sweep_rungs_and_flattening(ray_session, tmp_path):
    from dataquality_ray.pipelines.documents import (
        MIXTURE_PPM,
        MIXTURE_SQRT_SCALE,
        mixture_temperature_sweep,
    )
    rows = [(1, "a", "x" * 100), (2, "b", "y" * 10000)]
    out = (mixture_temperature_sweep(_write_docs(tmp_path, rows))
           .to_pandas())
    piv = out.pivot(index="tau_milli", columns="source",
                    values="weight_ppm")
    # tau=1: natural proportions
    assert piv.loc[1000, "a"] == 100 * MIXTURE_PPM // 10100
    # tau=1/2: the documented isqrt rung
    ma = int(np.floor(np.sqrt(100.0 * MIXTURE_SQRT_SCALE)))
    mb = int(np.floor(np.sqrt(10000.0 * MIXTURE_SQRT_SCALE)))
    assert piv.loc[500, "a"] == ma * MIXTURE_PPM // (ma + mb)
    # lower tau flattens: the small source's share rises monotonically
    shares = [piv.loc[t, "a"] for t in (1000, 750, 500, 250)]
    assert shares == sorted(shares)
    # weights stay a (floor-truncated) distribution per tau
    assert ((out.groupby("tau_milli").weight_ppm.sum()
             <= MIXTURE_PPM).all())


# --- vocab_growth_curve -----------------------------------------------------

def test_vocab_growth_exact_vs_bruteforce(ray_session, tmp_path):
    from dataquality_ray.pipelines.documents import (
        VOCAB_SAMPLE_KEEPS,
        VOCAB_SAMPLE_MOD,
        vocab_growth_curve,
    )
    from dataquality_ray.spec import TOKEN_PATTERN, token_hash_u64
    import re
    rows = [(i, "s", f"tok{i % 7} shared w{i}") for i in range(40)]
    out = (vocab_growth_curve(_write_docs(tmp_path, rows),
                              num_buckets=4)
           .to_pandas().set_index("sample_keep").sort_index())
    assert list(out.index) == sorted(VOCAB_SAMPLE_KEEPS)
    toks = {i: re.findall(TOKEN_PATTERN, t.lower())
            for i, _, t in rows}
    keys = {i: token_hash_u64(str(i)) % VOCAB_SAMPLE_MOD
            for i, _, _ in rows}
    for k in VOCAB_SAMPLE_KEEPS:
        samp = [i for i in keys if keys[i] < k]
        vocab = {t for i in samp for t in toks[i]}
        r = out.loc[k]
        assert r.n_docs == len(samp)
        assert r.n_tokens == sum(len(toks[i]) for i in samp)
        assert r.n_vocab == len(vocab)
    # last row is the exact full corpus; curve is monotone
    assert out.loc[VOCAB_SAMPLE_MOD].n_docs == 40
    assert (out.n_vocab.diff().dropna() >= 0).all()


# --- token_budget_plan ------------------------------------------------------

def test_token_budget_exact_formulas(ray_session, tmp_path):
    from dataquality_ray.pipelines.documents import (
        BUDGET_MODEL_PARAMS,
        BUDGET_TOKENS_PER_PARAM,
        token_budget_plan,
    )
    rows = [(1, "s", "a b c d e"), (2, "s", "f g h i j")]  # 10 tokens
    out = (token_budget_plan(_write_docs(tmp_path, rows))
           .to_pandas().set_index("model_params").sort_index())
    assert list(out.index) == sorted(BUDGET_MODEL_PARAMS)
    for p in BUDGET_MODEL_PARAMS:
        need = p * BUDGET_TOKENS_PER_PARAM
        r = out.loc[p]
        assert r.corpus_tokens == 10
        assert r.needed_tokens == need
        assert r.epochs_milli == 1000 * need // 10
        assert r.flops_peta == 6 * p * need // 10 ** 15


# --- term_posting_lists -----------------------------------------------------

def test_posting_lists_cap_and_spine(ray_session, tmp_path):
    from dataquality_ray.pipelines.documents import (
        POSTING_HEAD_K,
        SEARCH_TERMS,
        term_posting_lists,
    )
    assert SEARCH_TERMS == ("data", "join", "stream")
    # 25 docs contain 'data' (head caps at K), 2 contain 'join',
    # none contain 'stream' (spine row with df 0)
    rows = [(i, "s", "data point") for i in range(25)]
    rows += [(100, "s", "inner join"), (101, "s", "outer join")]
    out = (term_posting_lists(_write_docs(tmp_path, rows))
           .to_pandas().set_index("term"))
    d = out.loc["data"]
    assert d.df == 25
    assert d.posting_head == ",".join(
        str(i) for i in range(POSTING_HEAD_K))
    j = out.loc["join"]
    assert j.df == 2 and j.posting_head == "100,101"
    s = out.loc["stream"]
    assert s.df == 0 and s.posting_head == ""


# --- event_disorder_stats ---------------------------------------------------

def test_disorder_lateness_vs_running_max(ray_session, tmp_path):
    from dataquality_ray.pipelines.metrics import event_disorder_stats
    # arrival order = event_id; user 1: ts 10, 5, 20, 7 (days) ->
    # late at 5 (5 behind 10) and at 7 (13 behind 20); user 2 ordered
    rows = [(1, 10), (1, 5), (1, 20), (1, 7), (2, 1), (2, 2)]
    out = (event_disorder_stats(_write_events(tmp_path, rows),
                                num_buckets=4)
           .to_pandas().set_index("user_id").sort_index())
    day = 86_400_000_000
    u1 = out.loc[1]
    assert u1.n_events == 4 and u1.n_late == 2
    assert u1.max_late_us == 13 * day
    u2 = out.loc[2]
    assert u2.n_events == 2 and u2.n_late == 0 and u2.max_late_us == 0


# --- hard_negative_topk_embeddings / knn_label_probe ------------------------

def _write_embeddings(tmp_path, rows):
    """rows: (vec_id, label, vec)."""
    t = pa.table({
        "vec_id": pa.array([r[0] for r in rows], pa.int64()),
        "embedding": pa.array([list(map(float, r[2])) for r in rows],
                              pa.list_(pa.float32())),
        "label": pa.array([r[1] for r in rows], pa.int32()),
    })
    pq.write_table(t, str(tmp_path / "embeddings.parquet"))
    return str(tmp_path)


def test_hard_negatives_exclude_same_label(ray_session, tmp_path):
    from dataquality_ray.pipelines.documents import (
        hard_negative_topk_embeddings,
    )
    # query 0 (label 0) is closest to vec 10 (same label: excluded);
    # hard negatives must be the label-1 vectors by similarity
    rows = [
        (0, 0, [1.0, 0.0]),
        (10, 0, [0.99, 0.14]),          # same label: never a negative
        (20, 1, [0.9, 0.43]),           # best different-label
        (21, 1, [0.0, 1.0]),            # orthogonal
        (1, 0, [0.0, 1.0]), (2, 0, [1.0, 0.0]),
        (3, 0, [0.5, 0.5]), (4, 0, [0.1, 0.9]),
    ]
    out = (hard_negative_topk_embeddings(
        _write_embeddings(tmp_path, rows)).to_pandas())
    q0 = out[out.query_id == 0].sort_values("rank")
    assert 10 not in set(q0.vec_id)
    assert (q0.neg_label != 0).all()
    assert q0.iloc[0].vec_id == 20
    assert q0.iloc[0]["rank"] == 1


def test_knn_probe_grid_and_diagonal(ray_session, tmp_path):
    from dataquality_ray.pipelines.documents import (
        KNN_PROBE_N,
        knn_label_probe,
    )
    # two tight clusters, one per label: every probe's 1-NN shares
    # its label -> all mass on the diagonal of the dense 2x2 grid
    rows = [(i, 0, [1.0, 0.001 * i]) for i in range(8)]
    rows += [(100 + i, 1, [0.001 * i, 1.0]) for i in range(8)]
    out = (knn_label_probe(_write_embeddings(tmp_path, rows))
           .to_pandas())
    assert len(out) == 4                          # dense 2x2 spine
    n = min(len(rows), KNN_PROBE_N)
    assert out.n_queries.sum() == n
    off = out[(out.query_label != out.nn_label)]
    assert (off.n_queries == 0).all()


# --- turn_position_length_curve ---------------------------------------------

def test_position_curve_buckets_and_avgs(ray_session, tmp_path):
    from dataquality_ray.pipelines.conversations import (
        turn_position_length_curve,
    )
    import ray as _ray
    base = np.datetime64("2025-12-31T00:00:00", "us").astype(np.int64)
    # positions 0..7 exact buckets; 8..15 -> bucket 8; 16 -> bucket 9
    rows = [("c", i, "user", "x" * (i + 1)) for i in range(17)]
    turns = pa.table({
        "conv_id": pa.array([r[0] for r in rows], pa.string()),
        "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
        "role": pa.array([r[2] for r in rows], pa.string()),
        "text": pa.array([r[3] for r in rows], pa.string()),
        "ts": pa.array(np.full(len(rows), base,
                               dtype=np.int64).view("datetime64[us]")),
    })
    out = (turn_position_length_curve(_ray.data.from_arrow(turns))
        .to_pandas().set_index("pos_bucket").sort_index())
    assert list(out.index) == list(range(10))
    assert out.loc[3].bucket_lo == 3 and out.loc[3].n_turns == 1
    assert out.loc[3].avg_chars_milli == 4000
    b8 = out.loc[8]                               # positions 8..15
    assert b8.bucket_lo == 8 and b8.n_turns == 8
    assert b8.sum_chars == sum(range(9, 17))
    assert out.loc[9].bucket_lo == 16 and out.loc[9].n_turns == 1


# --- cdc_chunk_documents ----------------------------------------------------

def test_cdc_geometry_vs_bruteforce(ray_session, tmp_path):
    from dataquality_ray.pipelines.documents import (
        CDC_MOD,
        cdc_chunk_documents,
    )
    from dataquality_ray.spec import TOKEN_PATTERN, token_hash_u64
    import re
    rows = [(i, "s", " ".join(f"w{j}" for j in range(i * 3)))
            for i in range(12)]           # includes a 0-token doc
    rows.append((50, "s", ""))
    rows.append((51, "s", None))
    out = (cdc_chunk_documents(_write_docs(
        tmp_path, [(i, s, t if t is not None else None)
                   for i, s, t in rows]))
        .to_pandas().set_index("doc_id").sort_index())
    for i, _, text in rows:
        toks = re.findall(TOKEN_PATTERN, (text or "").lower())
        bnd = [p for p, t in enumerate(toks)
               if token_hash_u64(t) % CDC_MOD == 0]
        ends = [p + 1 for p in bnd]
        if toks and (not ends or ends[-1] != len(toks)):
            ends.append(len(toks))
        lengths = [e - s for s, e in zip([0] + ends[:-1], ends)]
        r = out.loc[i]
        assert r.n_tokens == len(toks)
        assert r.n_chunks == len(ends)
        assert r.first_boundary == (bnd[0] if bnd else -1)
        assert r.max_chunk_tokens == (max(lengths) if lengths else 0)
        assert r.avg_chunk_tokens_milli == (
            1000 * len(toks) // len(ends) if ends else 0)


# --- format_compliance_turns ------------------------------------------------

def test_format_compliance_pairs_and_spine(ray_session, tmp_path):
    from dataquality_ray.pipelines.conversations import (
        format_compliance_turns,
    )
    import ray as _ray
    base = np.datetime64("2025-12-31T00:00:00", "us").astype(np.int64)
    rows = [
        # compliant json pair
        ("c1", 0, "user", "give me JSON please"),
        ("c1", 1, "assistant", 'sure: {"a": 1}'),
        # json request, non-compliant reply
        ("c1", 2, "user", "more json"),
        ("c1", 3, "assistant", "here you go, no braces"),
        # list request followed by a TOOL turn: not a counted pair
        ("c2", 0, "user", "make a list"),
        ("c2", 1, "tool", "irrelevant"),
        # compliant list pair (newline-dash marker)
        ("c2", 2, "user", "a list again"),
        ("c2", 3, "assistant", "sure:\n- one\n- two"),
        # trailing user request with no next turn: not counted
        ("c2", 4, "user", "json?"),
    ]
    turns = pa.table({
        "conv_id": pa.array([r[0] for r in rows], pa.string()),
        "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
        "role": pa.array([r[2] for r in rows], pa.string()),
        "text": pa.array([r[3] for r in rows], pa.string()),
        "ts": pa.array(np.full(len(rows), base,
                               dtype=np.int64).view("datetime64[us]")),
    })
    out = (format_compliance_turns(_ray.data.from_arrow(turns),
                                   num_buckets=4)
           .to_pandas().set_index("kind"))
    assert sorted(out.index) == ["code", "json", "list"]
    j = out.loc["json"]
    assert j.n_requests == 2 and j.n_compliant == 1
    assert j.compliance_ppm == 500_000
    l = out.loc["list"]
    assert l.n_requests == 1 and l.n_compliant == 1
    c = out.loc["code"]                      # spine row
    assert c.n_requests == 0 and c.compliance_ppm == 0


# --- bpe_train_merges -------------------------------------------------------

def test_bpe_classic_merges_and_ties(ray_session, tmp_path):
    from dataquality_ray.pipelines.documents import bpe_train_merges
    # the Sennrich example: low x3, lower x2, newest x1.
    # round 1: (l,o)=5 ties (o,w)=5 -> (l,o) by symbol order;
    # round 2: (lo,w)=5; round 3: (e,r)=2 ties (low,e)=2 -> (e,r);
    # round 4: (low,er)=2
    rows = [(1, "s", "low low low"), (2, "s", "lower lower"),
            (3, "s", "newest")]
    out = bpe_train_merges(_write_docs(tmp_path, rows),
                           num_buckets=4).to_pandas()
    got = list(zip(out.sym_a, out.sym_b, out.pair_count))
    assert got == [("l", "o", 5), ("lo", "w", 5),
                   ("e", "r", 2), ("low", "er", 2)]
    assert list(out.merged) == ["lo", "low", "er", "lower"]


def test_bpe_early_stop_when_no_pairs_left(ray_session, tmp_path):
    from dataquality_ray.pipelines.documents import bpe_train_merges
    # single word 'aaaa': round 1 merges (a,a) x3; round 2 (aa,aa);
    # round 3 has no adjacent pairs left -> trainer stops at 2 rows
    rows = [(1, "s", "aaaa")]
    out = bpe_train_merges(_write_docs(tmp_path, rows),
                           num_buckets=4).to_pandas()
    assert list(zip(out.sym_a, out.sym_b, out.pair_count)) == [
        ("a", "a", 3), ("aa", "aa", 1)]


# --- lang_confusion_matrix --------------------------------------------------

def test_lang_confusion_dense_grid(ray_session, tmp_path):
    from dataquality_ray.pipelines.documents import (
        LANG_PRED_DOMAIN,
        lang_confusion_matrix,
    )
    rows = [
        (1, "s", "the cat and the dog is in that house of it"),  # en
        (2, "s", "el que una por para con los las"),             # es
        (3, "s", "zzz qqq xxx"),                                 # und
    ]
    # declared labels: en correct, en mislabeled as zh, zh->und
    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([r[2] for r in rows], pa.string()),
        "lang": pa.array(["en", "zh", "zh"], pa.string()),
        "source": pa.array(["s"] * 3, pa.string()),
        "n_chars": pa.array([len(r[2]) for r in rows], pa.int64()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    out = (lang_confusion_matrix(str(tmp_path))
           .to_pandas().set_index(["declared_lang", "pred_lang"]))
    # dense grid: 2 declared langs x the 5-value classifier domain
    assert len(out) == 2 * len(LANG_PRED_DOMAIN)
    assert out.loc[("en", "en")].n_docs == 1
    assert out.loc[("zh", "es")].n_docs == 1
    assert out.loc[("zh", "und")].n_docs == 1
    assert out.loc[("en", "fr")].n_docs == 0          # zero-filled


# --- event_type_audience_overlap --------------------------------------------

def test_audience_overlap_exact_jaccard(ray_session, tmp_path):
    from dataquality_ray.pipelines.metrics import (
        event_type_audience_overlap,
    )
    # users by type: click {1,2,3}, buy {2,3}, view {9}
    base = np.datetime64("2025-01-01T00:00:00", "us").astype(np.int64)
    ev = [(1, "click"), (2, "click"), (3, "click"), (2, "click"),
          (2, "buy"), (3, "buy"), (9, "view")]
    t = pa.table({
        "event_id": pa.array(list(range(len(ev))), pa.int64()),
        "ts": pa.array(np.full(len(ev), base,
                               dtype=np.int64).view("datetime64[us]")),
        "user_id": pa.array([e[0] for e in ev], pa.int64()),
        "event_type": pa.array([e[1] for e in ev], pa.string()),
        "value": pa.array([1.0] * len(ev), pa.float64()),
        "props": pa.array(["{}"] * len(ev), pa.string()),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = (event_type_audience_overlap(str(tmp_path), num_buckets=4)
           .to_pandas().set_index(["type_a", "type_b"]))
    assert len(out) == 3                    # all unordered pairs
    r = out.loc[("buy", "click")]
    assert (r.n_a, r.n_b, r.n_common) == (2, 3, 2)
    assert r.jaccard_ppm == 1_000_000 * 2 // 3
    r2 = out.loc[("buy", "view")]
    assert r2.n_common == 0 and r2.jaccard_ppm == 0


# --- hll_audience_union_registers -------------------------------------------

def test_hll_union_estimates_overlap(ray_session, tmp_path):
    from dataquality_ray.pipelines.metrics import (
        HLL_REGISTERS,
        hll_audience_union_registers,
        hll_estimate,
    )
    # click: 40 users, buy: 30 users, 20 shared -> union 50
    base = np.datetime64("2025-01-01T00:00:00", "us").astype(np.int64)
    ev = [(u, "click") for u in range(40)]
    ev += [(u, "buy") for u in range(20, 50)]
    t = pa.table({
        "event_id": pa.array(list(range(len(ev))), pa.int64()),
        "ts": pa.array(np.full(len(ev), base,
                               dtype=np.int64).view("datetime64[us]")),
        "user_id": pa.array([e[0] for e in ev], pa.int64()),
        "event_type": pa.array([e[1] for e in ev], pa.string()),
        "value": pa.array([1.0] * len(ev), pa.float64()),
        "props": pa.array(["{}"] * len(ev), pa.string()),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = hll_audience_union_registers(str(tmp_path)).to_pandas()
    assert len(out) == HLL_REGISTERS            # one pair, dense
    assert set(zip(out.type_a, out.type_b)) == {("buy", "click")}
    regs = dict(zip(out.reg, out.rho))
    est = hll_estimate(regs)
    # 64-register HLL: ~13% rel error; union of 50 within [30, 80]
    assert 30 <= est <= 80


# --- daily_eval_sample ------------------------------------------------------

def test_daily_eval_sample_rank_and_cap(ray_session):
    from dataquality_ray.pipelines.conversations import (
        EVAL_SAMPLE_K,
        daily_eval_sample,
    )
    from dataquality_ray.spec import token_hash_u64
    import ray as _ray
    base = np.datetime64("2025-06-01T00:00:00", "us").astype(np.int64)
    day = 86_400_000_000
    rows = [(f"c{i}", j, "user", f"t{i}:{j}", i % 2)
            for i in range(8) for j in range(3)]   # 12 turns/day
    turns = pa.table({
        "conv_id": pa.array([r[0] for r in rows], pa.string()),
        "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
        "role": pa.array([r[2] for r in rows], pa.string()),
        "text": pa.array([r[3] for r in rows], pa.string()),
        "ts": pa.array(np.array([base + r[4] * day for r in rows],
                                dtype=np.int64).view("datetime64[us]")),
    })
    out = (daily_eval_sample(_ray.data.from_arrow(turns))
           .to_pandas())
    days = sorted(out["day"].unique())
    assert len(days) == 2
    for d_i, d in enumerate(days):
        sub = out[out.day == d].sort_values("rank")
        assert list(sub["rank"]) == list(range(1, EVAL_SAMPLE_K + 1))
        expect = sorted(
            [(r[0], r[1]) for r in rows if r[4] == d_i],
            key=lambda ct: (token_hash_u64(f"{ct[0]}:{ct[1]}"),
                            ct[0], ct[1]))[:EVAL_SAMPLE_K]
        assert list(zip(sub.conv_id, sub.turn_idx)) == expect


# --- reply_length_covariance ------------------------------------------------

def test_reply_covariance_sufficient_stats(ray_session):
    from dataquality_ray.pipelines.conversations import (
        reply_length_covariance,
    )
    import ray as _ray
    base = np.datetime64("2025-06-01T00:00:00", "us").astype(np.int64)
    rows = [
        ("c1", 0, "user", "abcd"),        # u=4 -> a=6
        ("c1", 1, "assistant", "abcdef"),
        ("c1", 2, "user", "ab"),          # u=2 -> a=10
        ("c1", 3, "assistant", "a" * 10),
        ("c2", 0, "user", "xyz"),         # next is tool: no pair
        ("c2", 1, "tool", "zz"),
    ]
    turns = pa.table({
        "conv_id": pa.array([r[0] for r in rows], pa.string()),
        "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
        "role": pa.array([r[2] for r in rows], pa.string()),
        "text": pa.array([r[3] for r in rows], pa.string()),
        "ts": pa.array(np.full(len(rows), base,
                               dtype=np.int64).view("datetime64[us]")),
    })
    out = (reply_length_covariance(_ray.data.from_arrow(turns),
                                   num_buckets=4)
           .to_pandas().iloc[0])
    assert out.n_pairs == 2
    assert (out.sum_u, out.sum_a) == (6, 16)
    assert (out.sum_uu, out.sum_aa) == (20, 136)
    assert out.sum_ua == 4 * 6 + 2 * 10


# --- quality_vs_dup_matrix --------------------------------------------------

def test_quality_dup_matrix_marginals_and_spine(ray_session,
                                                tmp_path):
    from dataquality_ray.pipelines.documents import (
        quality_vs_dup_matrix,
    )
    # 2 exact dups (after ws-normalization) + 4 uniques
    rows = [(1, "s", "Hello   world"), (2, "s", "hello world"),
            (3, "s", "a completely different document here"),
            (4, "s", "short"), (5, "s", "x y z " * 20),
            (6, "s", "qq!!@@##")]
    out = (quality_vs_dup_matrix(_write_docs(tmp_path, rows))
           .to_pandas())
    assert len(out) == 20                          # dense 10x2 spine
    assert out.n_docs.sum() == 6
    assert out[out.is_dup == 1].n_docs.sum() == 2  # the dup pair


# --- role_vocab_overlap -----------------------------------------------------

def test_role_vocab_jaccard_exact(ray_session):
    from dataquality_ray.pipelines.conversations import (
        role_vocab_overlap,
    )
    import ray as _ray
    base = np.datetime64("2025-06-01T00:00:00", "us").astype(np.int64)
    rows = [
        ("c1", 0, "user", "alpha beta gamma"),
        ("c1", 1, "assistant", "beta gamma delta epsilon"),
        ("c2", 0, "user", "alpha alpha beta"),
    ]
    turns = pa.table({
        "conv_id": pa.array([r[0] for r in rows], pa.string()),
        "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
        "role": pa.array([r[2] for r in rows], pa.string()),
        "text": pa.array([r[3] for r in rows], pa.string()),
        "ts": pa.array(np.full(len(rows), base,
                               dtype=np.int64).view("datetime64[us]")),
    })
    out = (role_vocab_overlap(_ray.data.from_arrow(turns),
                              num_buckets=4)
           .to_pandas().set_index(["role_a", "role_b"]))
    r = out.loc[("assistant", "user")]
    # user vocab {alpha,beta,gamma}, assistant {beta,gamma,delta,
    # epsilon}; common {beta,gamma}; union 5
    assert (r.v_a, r.v_b, r.v_common) == (4, 3, 2)
    assert r.jaccard_ppm == 1_000_000 * 2 // 5


# --- source_style_profile ---------------------------------------------------

def test_style_profile_ratios(ray_session, tmp_path):
    from dataquality_ray.pipelines.documents import (
        source_style_profile,
    )
    rows = [(1, "caps", "ABCDEFGHIJ"),          # 10 chars, 10 caps
            (2, "nums", "12345!!!??"),          # 5 digits, 5 punct
            (3, "word", "ab cd")]               # 2 tokens, 4 wchars
    out = (source_style_profile(_write_docs(tmp_path, rows))
           .to_pandas().set_index("source"))
    c = out.loc["caps"]
    assert c.n_chars == 10 and c.caps_ppm == 1_000_000
    n = out.loc["nums"]
    assert n.digit_ppm == 500_000 and n.punct_ppm == 500_000
    w = out.loc["word"]
    assert w.avg_word_len_milli == 1000 * 4 // 2


# --- prefill_cost_curve -----------------------------------------------------

def test_prefill_exclusive_prefix_and_buckets(ray_session):
    from dataquality_ray.pipelines.conversations import (
        prefill_cost_curve,
    )
    import ray as _ray
    base = np.datetime64("2025-06-01T00:00:00", "us").astype(np.int64)
    # conv c1: token counts 2, 3, 4 -> prefixes 0, 2, 5
    # conv c2: token counts 1, 1   -> prefixes 0, 1
    texts = {("c1", 0): "a b", ("c1", 1): "a b c",
             ("c1", 2): "a b c d", ("c2", 0): "a", ("c2", 1): "b"}
    rows = sorted(texts)
    turns = pa.table({
        "conv_id": pa.array([r[0] for r in rows], pa.string()),
        "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
        "role": pa.array(["user"] * len(rows), pa.string()),
        "text": pa.array([texts[r] for r in rows], pa.string()),
        "ts": pa.array(np.full(len(rows), base,
                               dtype=np.int64).view("datetime64[us]")),
    })
    out = (prefill_cost_curve(_ray.data.from_arrow(turns),
                              num_buckets=4)
           .to_pandas().set_index("pos_bucket").sort_index())
    assert out.loc[0].n_turns == 2            # both convs, pos 0
    assert out.loc[0].sum_prefix_tokens == 0
    assert out.loc[1].sum_prefix_tokens == 2 + 1
    assert out.loc[2].sum_prefix_tokens == 5
    assert out.loc[2].avg_prefix_tokens_milli == 5000


# --- role_run_lengths -------------------------------------------------------

def test_role_runs_gaps_and_islands(ray_session):
    from dataquality_ray.pipelines.conversations import (
        role_run_lengths,
    )
    import ray as _ray
    base = np.datetime64("2025-06-01T00:00:00", "us").astype(np.int64)
    # c1: u u a a a u  -> runs: user 2, assistant 3, user 1
    # c2: a            -> assistant 1
    seq = [("c1", 0, "user"), ("c1", 1, "user"),
           ("c1", 2, "assistant"), ("c1", 3, "assistant"),
           ("c1", 4, "assistant"), ("c1", 5, "user"),
           ("c2", 0, "assistant")]
    turns = pa.table({
        "conv_id": pa.array([r[0] for r in seq], pa.string()),
        "turn_idx": pa.array([r[1] for r in seq], pa.int32()),
        "role": pa.array([r[2] for r in seq], pa.string()),
        "text": pa.array(["x"] * len(seq), pa.string()),
        "ts": pa.array(np.full(len(seq), base,
                               dtype=np.int64).view("datetime64[us]")),
    })
    out = (role_run_lengths(_ray.data.from_arrow(turns),
                            num_buckets=4)
           .to_pandas().set_index(["role", "run_len"]).sort_index())
    assert out.loc[("user", 2)].n_runs == 1
    assert out.loc[("user", 1)].n_runs == 1
    assert out.loc[("assistant", 3)].n_runs == 1
    assert out.loc[("assistant", 1)].n_runs == 1
    assert out.n_runs.sum() == 4


# --- tool_retry_stats / role_share_daily ------------------------------------

def test_tool_retry_and_recovery(ray_session):
    from dataquality_ray.pipelines.conversations import (
        tool_retry_stats,
    )
    import ray as _ray
    base = np.datetime64("2025-06-01T00:00:00", "us").astype(np.int64)
    # c1: user tool tool tool assistant -> 3 tool turns, 2 retries,
    # 1 recovery; c2: tool (trailing) -> neither
    seq = [("c1", 0, "user"), ("c1", 1, "tool"), ("c1", 2, "tool"),
           ("c1", 3, "tool"), ("c1", 4, "assistant"),
           ("c2", 0, "tool")]
    turns = pa.table({
        "conv_id": pa.array([r[0] for r in seq], pa.string()),
        "turn_idx": pa.array([r[1] for r in seq], pa.int32()),
        "role": pa.array([r[2] for r in seq], pa.string()),
        "text": pa.array(["x"] * len(seq), pa.string()),
        "ts": pa.array(np.full(len(seq), base,
                               dtype=np.int64).view("datetime64[us]")),
    })
    out = (tool_retry_stats(_ray.data.from_arrow(turns),
                            num_buckets=4).to_pandas().iloc[0])
    assert out.n_tool_turns == 4
    assert out.n_retries == 2 and out.n_recovered == 1
    assert out.retry_ppm == 1_000_000 * 2 // 4


def test_role_share_daily_sums_to_one(ray_session):
    from dataquality_ray.pipelines.conversations import (
        role_share_daily,
    )
    import ray as _ray
    base = np.datetime64("2025-06-01T00:00:00", "us").astype(np.int64)
    day = 86_400_000_000
    rows = [("c1", 0, "user", 0), ("c1", 1, "assistant", 0),
            ("c1", 2, "user", 0), ("c2", 0, "tool", 1)]
    turns = pa.table({
        "conv_id": pa.array([r[0] for r in rows], pa.string()),
        "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
        "role": pa.array([r[2] for r in rows], pa.string()),
        "text": pa.array(["x"] * len(rows), pa.string()),
        "ts": pa.array(np.array([base + r[3] * day for r in rows],
                                dtype=np.int64).view("datetime64[us]")),
    })
    out = (role_share_daily(_ray.data.from_arrow(turns))
           .to_pandas())
    d0 = out[out.day == "2025-06-01"].set_index("role")
    assert d0.loc["user"].n_turns == 2
    assert d0.loc["user"].share_ppm == 1_000_000 * 2 // 3
    assert d0.loc["assistant"].share_ppm == 333_333
    d1 = out[out.day == "2025-06-02"]
    assert len(d1) == 1 and d1.iloc[0].share_ppm == 1_000_000
