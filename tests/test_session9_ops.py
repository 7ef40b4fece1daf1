"""Edge-case pins for the round-5 session-9 operators
(sampled_dup_rate, assistant_refusal_census, distinct_ngram_diversity,
mixture_ablation_weights). The DuckDB gate checks them corpus-wide at
sf0.01; these pin the boundary semantics on crafted inputs: hash-range
sample group-atomicity and exact-last-row, refusal pattern matching /
role filtering / null text, bigram distinctness + the zero-bigram
source spine, and the held-out renormalization arithmetic."""

import hashlib
import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray


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


# --- sampled_dup_rate -------------------------------------------------------

def _norm(s):
    import re
    return re.sub(r"\s+", " ", s.lower().strip(" \t\r\n"))


def _skey(s):
    return hashlib.md5(_norm(s).encode()).digest()[0]


def test_sampled_dup_rate_exact_last_row_and_nesting(ray_session):
    from dataquality_ray.pipelines.conversations import (
        DUP_SAMPLE_KEEPS,
        sampled_dup_rate,
    )
    texts = (["alpha beta"] * 3 + ["gamma delta"] * 2 + ["epsilon"]
             + ["", "   "])            # empty-normalized: never counted
    rows = [(f"c{i}", 0, "user", t, 0) for i, t in enumerate(texts)]
    out = (sampled_dup_rate(ray.data.from_arrow(_turns(rows)))
           .to_pandas().set_index("sample_keep").sort_index())
    assert list(out.index) == sorted(DUP_SAMPLE_KEEPS)
    # last row IS the exact full-corpus answer
    full = out.loc[DUP_SAMPLE_KEEPS[-1]]
    assert full.n_turns == 6 and full.n_distinct == 3
    assert full.dup_permille == 1000 * 3 // 6
    # independent scalar replay of every sample: group-atomic membership
    for k in DUP_SAMPLE_KEEPS:
        inc = [t for t in texts if _norm(t) and _skey(t) < k]
        assert out.loc[k].n_turns == len(inc)
        assert out.loc[k].n_distinct == len({_norm(t) for t in inc})
    # nesting: counts are monotone in the keep threshold
    assert (np.diff(out.n_turns.to_numpy()) >= 0).all()
    assert (np.diff(out.n_distinct.to_numpy()) >= 0).all()


def test_sampled_dup_rate_empty_corpus_spine(ray_session):
    from dataquality_ray.pipelines.conversations import (
        DUP_SAMPLE_KEEPS,
        sampled_dup_rate,
    )
    rows = [("c", 0, "user", "", 0)]   # only empty-normalized turns
    out = (sampled_dup_rate(ray.data.from_arrow(_turns(rows)))
           .to_pandas())
    assert len(out) == len(DUP_SAMPLE_KEEPS)
    assert (out.n_turns == 0).all() and (out.dup_permille == 0).all()


# --- assistant_refusal_census ----------------------------------------------

def test_refusal_patterns_and_role_filter(ray_session):
    from dataquality_ray.pipelines.conversations import (
        assistant_refusal_census,
    )
    rows = [
        ("c", 0, "assistant", "I cannot help with that request.", 0),
        ("c", 1, "assistant", "As an AI model I must decline.", 0),
        ("c", 2, "assistant", "Here is the answer you wanted.", 0),
        ("c", 3, "user", "i cannot believe this", 0),   # role-filtered
        ("c", 4, "assistant", None, 0),                 # null text
        ("d", 0, "assistant", "This is an Automated Response.", 1),
        ("d", 1, "assistant", "ok", 1),
    ]
    out = (assistant_refusal_census(ray.data.from_arrow(_turns(rows)))
           .to_pandas().set_index("day"))
    assert len(out) == 2
    d0, d1 = out.iloc[0], out.iloc[1]
    assert d0.n_assistant_turns == 4 and d0.n_refusal_turns == 2
    assert d0.refusal_permille == 1000 * 2 // 4
    assert d1.n_assistant_turns == 2 and d1.n_refusal_turns == 1


def test_refusal_census_zero_match_day_spine(ray_session):
    from dataquality_ray.pipelines.conversations import (
        assistant_refusal_census,
    )
    rows = [("c", 0, "assistant", "plain text", 0),
            ("c", 1, "assistant", "more plain text", 2)]
    out = (assistant_refusal_census(ray.data.from_arrow(_turns(rows)))
           .to_pandas())
    assert len(out) == 2                     # day rows exist regardless
    assert (out.n_refusal_turns == 0).all()


# --- distinct_ngram_diversity ------------------------------------------------

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


def test_bigram_diversity_counts_and_spine(ray_session, tmp_path):
    from dataquality_ray.pipelines.documents import (
        distinct_ngram_diversity,
    )
    rows = [
        (1, "a", "x y x y"),       # bigrams: x y / y x / x y -> 3, 2
        (2, "a", "x y"),           # +1 occurrence of x y -> 4, 2
        (3, "b", "p q r"),         # 2 distinct of 2
        (4, "c", "solo"),          # <2 tokens: zero bigrams
        (5, "c", ""),              # empty
    ]
    out = (distinct_ngram_diversity(_write_docs(tmp_path, rows))
           .to_pandas().set_index("source"))
    assert out.loc["a"].n_bigrams == 4
    assert out.loc["a"].n_distinct == 2
    assert out.loc["a"].diversity_micro == 1_000_000 * 2 // 4
    assert out.loc["b"].n_bigrams == 2
    assert out.loc["b"].diversity_micro == 1_000_000
    # spine: a source with no bigrams still emits a row of zeros
    assert out.loc["c"].n_bigrams == 0
    assert out.loc["c"].n_distinct == 0
    assert out.loc["c"].diversity_micro == 0


def test_bigram_diversity_cross_batch_distinct(ray_session, tmp_path):
    # the same bigram in every doc must count once per source even
    # when docs land in different read batches
    from dataquality_ray.pipelines.documents import (
        distinct_ngram_diversity,
    )
    rows = [(i, "s", "same pair") for i in range(50)]
    out = (distinct_ngram_diversity(_write_docs(tmp_path, rows))
           .to_pandas().set_index("source"))
    assert out.loc["s"].n_bigrams == 50
    assert out.loc["s"].n_distinct == 1


# --- mixture_ablation_weights ------------------------------------------------

def test_ablation_renormalization_math(ray_session, tmp_path):
    from dataquality_ray.pipelines.documents import (
        MIXTURE_PPM,
        MIXTURE_SQRT_SCALE,
        mixture_ablation_weights,
    )
    chars = {"a": 100, "b": 400, "c": 2500}
    rows = [(i, s, "x" * c) for i, (s, c) in enumerate(chars.items())]
    out = (mixture_ablation_weights(_write_docs(tmp_path, rows))
           .to_pandas().set_index(["held_out", "source"]))
    assert len(out) == 6                       # 3 sources x 2 kept
    sq = {s: math.isqrt(c * MIXTURE_SQRT_SCALE)
          for s, c in chars.items()}
    tot = sum(sq.values())
    base = {s: sq[s] * MIXTURE_PPM // tot for s in chars}
    for h in chars:
        t_h = tot - sq[h]
        for s in chars:
            if s == h:
                continue
            w = sq[s] * MIXTURE_PPM // t_h
            row = out.loc[(h, s)]
            assert row.weight_ppm == w
            assert row.delta_ppm == w - base[s]
