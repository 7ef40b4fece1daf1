"""Edge-case pins for the round-5 structural/repetition operators
(gopher_repetition_documents, conv_structure_violations,
conv_context_budget, conv_session_splits) on crafted inputs — the
DuckDB gate checks them corpus-wide; these pin the boundary semantics
(thresholds, ties, exact-at-budget, gap-equal-to-threshold)."""

import pyarrow as pa
import ray


def _gopher(texts):
    from dataquality_ray.pipelines.documents import (
        _gopher_repetition_batch,
    )
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    return _gopher_repetition_batch(t).to_pandas().set_index("doc_id")


def test_gopher_duplicate_lines_flag():
    r = _gopher(["spam\nspam\nspam\nunique line here"])
    row = r.loc[0]
    assert row.n_lines == 4
    assert row.dup_line_count == 2          # 2 extra 'spam' occurrences
    assert row.dup_line_chars == 8          # 2 * len('spam')
    assert row.rep_flag == 1                # 2/4 > 30%


def test_gopher_top2gram_tiebreak_and_flag():
    # 'a b' and 'b a' both occur 3x in 'a b a b a b a'; lexicographic
    # min 'a b' must win on both engines
    r = _gopher(["a b a b a b a"])
    row = r.loc[0]
    assert row.top2_gram == "a b"
    assert row.top2_count == 3
    assert row.top2_chars == 9
    assert row.rep_flag == 1                # 9/13 chars > 20%


def test_gopher_empty_and_clean_docs():
    clean = ("the quick brown fox jumps over one lazy dog while "
             "seven other animals watch quietly from a distant hill")
    r = _gopher(["", clean])
    assert r.loc[0].n_lines == 0 and r.loc[0].rep_flag == 0
    assert r.loc[0].top2_gram == ""
    assert r.loc[1].rep_flag == 0
    assert r.loc[1].dup5_chars == 0


def _gopherq(texts):
    from dataquality_ray.pipelines.documents import (
        _gopher_quality_batch,
    )
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    return _gopher_quality_batch(t).to_pandas().set_index("doc_id")


def test_gopher_quality_signal_counters():
    txt = ("the cat sat on the mat today again\n"
           "- bullet one\n* bullet two\nword... and more... #tag")
    r = _gopherq([txt]).loc[0]
    assert r.n_lines == 4
    assert r.n_bullet_lines == 2
    assert r.n_ellipsis_lines == 0          # last line ends with '#tag'
    assert r.n_hash == 1
    assert r.n_ellipsis == 2                # 'word...', 'more...'
    assert r.n_stop_hits == 2               # 'the', 'and' (distinct)
    assert r.q_flag == 1                    # <50 words + 2/4 bullets


def test_gopher_quality_clean_doc_passes():
    # 60 words, mean length in [3,10], no symbols/bullets, has a stop
    # word -> every rule passes
    clean = " ".join(["the quick brown fox jumps over lazy dogs "
                      "while seven animals watch"] * 5)
    r = _gopherq([clean]).loc[0]
    assert r.n_words == 60
    assert r.n_stop_hits == 1
    assert r.q_flag == 0


def test_gopher_quality_null_and_empty():
    t = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                  "text": pa.array([None, ""], pa.string())})
    from dataquality_ray.pipelines.documents import (
        _gopher_quality_batch,
    )
    r = _gopher_quality_batch(t).to_pandas().set_index("doc_id")
    for i in (0, 1):
        assert r.loc[i].n_words == 0
        assert r.loc[i].q_flag == 1         # fails the min-words rule


def test_gopher_quality_overlapping_ellipsis_count():
    # '....' = one leftmost match + 1 leftover dot; '......' = two
    r = _gopherq(["x .... y ......"]).loc[0]
    assert r.n_ellipsis == 3


def _conv_table(rows):
    return pa.table({
        "conv_id": pa.array([r[0] for r in rows], pa.string()),
        "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
        "role": pa.array([r[2] for r in rows], pa.string()),
        "text": pa.array([r[3] for r in rows], pa.string()),
        "ts": pa.array([r[4] for r in rows], pa.timestamp("us")),
    })


def test_conv_structure_violations_counters(ray_session):
    from dataquality_ray.pipelines.conversations import (
        conv_structure_violations,
    )
    rows = [
        # well-formed conversation
        ("good", 0, "user", "hi", 1_000_000),
        ("good", 1, "assistant", "hello", 2_000_000),
        ("good", 2, "tool", "result", 3_000_000),
        # malformed: assistant start, role repeat, orphan tool,
        # ts regression, turn_idx gap
        ("bad", 1, "assistant", "a", 5_000_000),   # bad start + idx!=0
        ("bad", 2, "assistant", "b", 4_000_000),   # repeat + ts regress
        ("bad", 4, "tool", "c", 6_000_000),        # orphan? prev=assistant
        ("bad", 5, "tool", "d", 7_000_000),        # orphan (prev=tool) + repeat
    ]
    got = (conv_structure_violations(
        ray.data.from_arrow(_conv_table(rows)), num_buckets=4)
        .to_pandas().set_index("conv_id"))
    g, b = got.loc["good"], got.loc["bad"]
    assert g.is_valid == 1 and g.n_orphan_tool == 0
    assert b.n_bad_start == 1
    assert b.n_role_repeat == 2       # assistant->assistant, tool->tool
    assert b.n_orphan_tool == 1       # only the second tool turn
    assert b.n_ts_regress == 1
    assert b.n_idx_gaps == 2          # first idx != 0, 2 -> 4 jump
    assert b.is_valid == 0


def test_conv_context_budget_exact_boundary(ray_session):
    from dataquality_ray.pipelines.conversations import (
        conv_context_budget,
    )
    # budget 10: cum sums 4, 10, 11 -> exactly-at-budget turn FITS,
    # truncation starts at the next turn
    rows = [("c", 0, "user", "aaaa", 1), ("c", 1, "assistant",
             "bbbbbb", 2), ("c", 2, "user", "x", 3)]
    got = (conv_context_budget(
        ray.data.from_arrow(_conv_table(rows)), num_buckets=2,
        budget=10).to_pandas().iloc[0])
    assert got.fit_turns == 2
    assert got.truncate_turn_idx == 2
    assert got.total_chars == 11


def test_conv_session_splits_gap_equal_not_split(ray_session):
    from dataquality_ray.pipelines.conversations import (
        conv_session_splits,
    )
    # gaps: exactly threshold (no split), threshold+1 (split)
    rows = [("c", 0, "user", "a", 0),
            ("c", 1, "assistant", "b", 100),      # gap == 100
            ("c", 2, "user", "c", 201)]           # gap == 101 > 100
    got = (conv_session_splits(
        ray.data.from_arrow(_conv_table(rows)), num_buckets=2,
        gap_us=100).to_pandas().iloc[0])
    assert got.n_sessions == 2
    assert got.max_session_turns == 2
    assert got.n_turns == 3


def test_conv_prefix_dup_groups_k_and_nulls(ray_session):
    import pyarrow as pa
    from dataquality_ray.pipelines.conversations import (
        conv_prefix_dup_groups,
    )
    t = pa.table({
        "conv_id": pa.array(["a", "a", "a", "b", "b", "c", "d"],
                            pa.string()),
        "turn_idx": pa.array([0, 1, 2, 0, 1, 0, 0], pa.int32()),
        # a and b share the first-2-turn prefix; a's turn 2 differs
        # (beyond K) and must not matter; c has ONE turn and null text;
        # d has one turn with '' text -> null joins as '' so c == d
        "text": pa.array(["hi", "yo", "DIFFERENT", "hi", "yo", None,
                          ""], pa.string()),
    })
    got = (conv_prefix_dup_groups(ray.data.from_arrow(t),
                                  num_buckets=4, k=2)
           .to_pandas().set_index("conv_id"))
    assert got.loc["a"].group_size == 2 and got.loc["a"].is_prefix_dup
    assert got.loc["a"].prefix_hash == got.loc["b"].prefix_hash
    assert got.loc["c"].prefix_hash == got.loc["d"].prefix_hash
    assert got.loc["c"].group_size == 2


def test_tool_transition_stats_kinds(ray_session):
    import pyarrow as pa
    from dataquality_ray.pipelines.conversations import (
        tool_transition_stats,
    )
    t = pa.table({
        "conv_id": pa.array(["c1", "c1", "c1", "c2", "c2"], pa.string()),
        "turn_idx": pa.array([0, 1, 2, 0, 1], pa.int32()),
        "role": pa.array(["user", "assistant", "tool", "user",
                          "assistant"], pa.string()),
        "tool": pa.array(["", "", "exec", "", ""], pa.string()),
    })
    got = (tool_transition_stats(ray.data.from_arrow(t), num_buckets=4)
           .to_pandas().set_index(["from_kind", "to_kind"]))
    # no cross-conversation transition (c1 tool -> c2 user absent)
    assert got.loc[("user", "assistant")].n_transitions == 2
    assert got.loc[("assistant", "tool:exec")].n_transitions == 1
    assert len(got) == 2


def test_conv_ttr_stats_distinct_and_empty(ray_session):
    import pyarrow as pa
    from dataquality_ray.pipelines.conversations import conv_ttr_stats
    t = pa.table({
        "conv_id": pa.array(["c", "c", "c"], pa.string()),
        "role": pa.array(["user", "user", "assistant"], pa.string()),
        # user: 4 tokens, 2 distinct (case-folded); assistant: none
        "text": pa.array(["Go go GO", "stop", "!!!"], pa.string()),
    })
    got = (conv_ttr_stats(ray.data.from_arrow(t), num_buckets=4)
           .to_pandas().set_index("role"))
    u = got.loc["user"]
    assert u.n_tokens == 4 and u.n_distinct_tokens == 2
    assert u.ttr_milli == 500
    a = got.loc["assistant"]
    assert a.n_tokens == 0 and a.ttr_milli == -1


def _c4(texts):
    from dataquality_ray.pipelines.documents import _c4_line_batch
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    return _c4_line_batch(t).to_pandas().set_index("doc_id")


def test_c4_line_rules_boundaries():
    r = _c4(["Three words here.\n"       # kept: terminal + 3 words
             "Two words.\n"              # dropped: 2 < 3 words
             "no terminal punct at all\n"  # dropped: no terminal
             "This uses JavaScript heavily.\n"   # dropped: blacklist
             'Ends with a quote."\n'     # kept: quote terminal
             "Ends with question mark?"])  # kept: ? terminal
    row = r.loc[0]
    assert row.n_lines == 6
    assert row.n_kept_lines == 3
    assert row.n_js_lines == 1
    assert row.clean_text == ('Three words here.\nEnds with a quote."'
                              "\nEnds with question mark?")
    assert row.page_flag == 1            # 3 kept < 5 minimum


def test_c4_page_flags_and_empty():
    five = "\n".join(f"Valid sentence number {i} here." for i in range(5))
    r = _c4([five,                        # clean page: no flag
             five + "\nlorem ipsum dolor.",  # page phrase
             five + "\ncode { brace }.",     # curly brace
             "", None])                   # degenerate pages
    assert r.loc[0].page_flag == 0 and r.loc[0].n_kept_lines == 5
    assert r.loc[1].page_flag == 1
    assert r.loc[2].page_flag == 1
    assert r.loc[3].page_flag == 1 and r.loc[3].clean_text == ""
    assert r.loc[4].n_lines == 1 and r.loc[4].clean_chars == 0


def test_c4_trim_charset_pinned():
    # trimming uses the pinned ' \t\r\n' charset on BOTH sides before
    # the terminal-punct / word-count tests (CLAUDE.md invariant)
    r = _c4(["  Spaces around this line.  \t\r"])
    assert r.loc[0].n_kept_lines == 1
    assert r.loc[0].clean_text == "Spaces around this line."


def test_mojibake_signals_pinned():
    from dataquality_ray.pipelines.documents import _mojibake_batch
    t = pa.table({"doc_id": pa.array(range(5), pa.int64()),
                  "text": pa.array(
                      ["plain ascii", "bad � char",
                       "ctrl\x01 here", "cafÃ© artifact",
                       "tab\tnl\ncr\r ok"], pa.string())})
    r = _mojibake_batch(t).to_pandas().set_index("doc_id")
    assert r.loc[0].moji_flag == 0
    assert r.loc[1].n_repl == 1 and r.loc[1].moji_flag == 1
    assert r.loc[2].n_ctrl == 1 and r.loc[2].moji_flag == 1
    assert r.loc[3].n_latin_artifact == 1 and r.loc[3].moji_flag == 1
    # tab/newline/CR are NOT control chars for this audit
    assert r.loc[4].n_ctrl == 0 and r.loc[4].moji_flag == 0


def test_mojibake_density_boundary():
    from dataquality_ray.pipelines.documents import _mojibake_batch
    # exactly 20% non-ascii (1 of 5 chars) is NOT flagged (> not >=)
    t = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                  "text": pa.array(["abcdé", "abé"],
                                   pa.string())})
    r = _mojibake_batch(t).to_pandas().set_index("doc_id")
    assert r.loc[0].moji_flag == 0          # 100*1 == 20*5
    assert r.loc[1].moji_flag == 1          # 100*1 > 20*3


def test_conv_markdown_stats_pinned(ray_session):
    from dataquality_ray.pipelines.conversations import conv_markdown_stats
    t = pa.table({
        "conv_id": pa.array(["c1", "c1", "c2"], pa.string()),
        "text": pa.array([
            "# H1\n```py\ncode\n```\n- item\n+ item2\n-nospace\n| t |",
            "see [a](x) and [b](y) with `tick`",
            "```unbalanced",
        ], pa.string()),
    })
    got = (conv_markdown_stats(ray.data.from_arrow(t), num_buckets=4)
           .to_pandas().set_index("conv_id"))
    c1 = got.loc["c1"]
    assert c1.n_turns == 2 and c1.n_fence_lines == 2
    assert c1.fence_balanced == 1
    assert c1.n_heading_lines == 1
    assert c1.n_bullet_lines == 2       # '-nospace' is not a bullet
    assert c1.n_table_lines == 1
    assert c1.n_links == 2 and c1.n_backticks == 8
    c2 = got.loc["c2"]
    assert c2.n_fence_lines == 1 and c2.fence_balanced == 0


def test_compression_gate_boundaries():
    from dataquality_ray.pipelines.documents import (
        _compression_gate_batch,
    )
    t = pa.table({"doc_id": pa.array(range(4), pa.int64()),
                  "text": pa.array(
                      ["normal english words flow here nicely",
                       # alternating char classes: every char its own
                       # BPE pre-token under spec.BPE_TOKEN_PATTERN
                       "a1!b2@c3#d4$e5%f6^",
                       "", None], pa.string())})
    r = _compression_gate_batch(t).to_pandas().set_index("doc_id")
    assert r.loc[0].compress_flag == 0 and r.loc[0].cpt_milli >= 2000
    assert r.loc[1].compress_flag == 1          # < 2 chars/token
    # tokenless docs: cpt = -1 and flagged
    assert r.loc[2].cpt_milli == -1 and r.loc[2].compress_flag == 1
    assert r.loc[3].cpt_milli == -1 and r.loc[3].compress_flag == 1


def test_bm25_hand_computed(ray_session, tmp_path):
    import pyarrow.parquet as pq
    from dataquality_ray.pipelines.documents import bm25_top_docs
    # N=3 docs, T=16 tokens; only 'join' of the query terms occurs
    # (df=2). idf_milli = (1000*(2*3-2*2+1))//(2*2+1) = 600; both
    # matching docs have dl=6 -> rel_dl=1125, denom_base=1312500.
    # d1 tf=3: (600*3*2200*1000)//(3000000+1312500) = 918
    # d2 tf=1: (600*1*2200*1000)//(1000000+1312500) = 570
    t = pa.table({
        "doc_id": pa.array(["d1", "d2", "d3"], pa.string()),
        "text": pa.array(["join join join other words here",
                          "join once in this doc ok",
                          "nothing relevant at all"], pa.string()),
    })
    pq.write_table(t, tmp_path / "documents.parquet")
    got = (bm25_top_docs(str(tmp_path)).to_pandas()
           .set_index("doc_id"))
    assert list(got.index) == ["d1", "d2"]      # score-desc order
    assert got.loc["d1"].score_milli == 918
    assert got.loc["d2"].score_milli == 570
    assert got.loc["d1"].n_terms_hit == 1 and got.loc["d1"].dl == 6


def test_winnow_dup_pairs_shared_span(ray_session, tmp_path):
    import pyarrow.parquet as pq
    from dataquality_ray.pipelines.documents import winnow_dup_pairs
    shared = ("the quick brown fox jumps over the lazy dog near the "
              "river bank today")
    t = pa.table({
        "doc_id": pa.array(["d1", "d2", "d3", "d4", "d5"], pa.string()),
        "text": pa.array([
            shared + " with extra tail words here one two three",
            "prefix words differ a lot but then " + shared,
            "completely unrelated content about database engines and "
            "query planners running fast",
            shared,          # the shared span verbatim
            "short doc",     # below the k-gram minimum
        ], pa.string()),
    })
    pq.write_table(t, tmp_path / "documents.parquet")
    got = (winnow_dup_pairs(str(tmp_path), num_buckets=8)
           .to_pandas().sort_values(["doc_a", "doc_b"])
           .reset_index(drop=True))
    # all three span-sharers pair up; the unrelated/short docs never do
    assert list(map(tuple, got[["doc_a", "doc_b"]].to_numpy())) == [
        ("d1", "d2"), ("d1", "d4"), ("d2", "d4")]
    assert (got.n_shared >= 2).all()
