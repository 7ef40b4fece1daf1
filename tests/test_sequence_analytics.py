"""Randomized cross-checks for the sequence-analytics kernels
(event_type_transitions, user_funnel_stages, modal_event_type_per_user)
against brute-force references, on synthetic event tables that FORCE
the edge cases the sf fixtures may not contain: duplicate timestamps
within a user, funnel events at equal timestamps (strictly-after must
reject them), single-event users, and users missing whole stages."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

TYPES = ["signup", "click", "purchase", "view", "error"]


def _make_events(tmpdir: str, seed: int, n: int = 400) -> str:
    rng = np.random.default_rng(seed)
    ts = rng.integers(0, 50, n) * 1_000_000   # coarse -> many ties
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": pd.to_datetime(ts, unit="us"),
        "user_id": rng.integers(0, 25, n).astype(np.int64),
        "event_type": rng.choice(TYPES, n),
        "value": rng.uniform(0, 200, n).round(2),
        "props": ['{"k": %d}' % k for k in rng.integers(0, 100, n)],
    })
    out = os.path.join(tmpdir, f"ev_{seed}")
    os.makedirs(out, exist_ok=True)
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False)
                   .cast(pa.schema([
                       ("event_id", pa.int64()),
                       ("ts", pa.timestamp("us")),
                       ("user_id", pa.int64()),
                       ("event_type", pa.string()),
                       ("value", pa.float64()),
                       ("props", pa.string()),
                   ])), os.path.join(out, "events.parquet"))
    return out, df


def _brute_funnel(df: pd.DataFrame) -> dict:
    from dataquality_ray.pipelines.metrics import FUNNEL_STAGES
    out = {}
    for uid, g in df.groupby("user_id"):
        g = g.assign(ts_us=g["ts"].astype("int64"))
        stage, bound = 0, None
        for etype in FUNNEL_STAGES:
            rows = g[g["event_type"] == etype]
            if bound is not None:
                rows = rows[rows["ts_us"] > bound]
            if len(rows) == 0:
                break
            bound = rows["ts_us"].min()
            stage += 1
        out[uid] = stage
    return out


def _brute_transitions(df: pd.DataFrame) -> dict:
    pairs = {}
    for _, g in df.groupby("user_id"):
        g = g.assign(ts_us=g["ts"].astype("int64")) \
            .sort_values(["ts_us", "event_id"], kind="mergesort")
        seq = g["event_type"].tolist()
        for a, b in zip(seq, seq[1:]):
            pairs[(a, b)] = pairs.get((a, b), 0) + 1
    return pairs


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_sequence_kernels_vs_brute_force(ray_session, tmp_path, seed):
    from dataquality_ray.pipelines.metrics import (
        event_type_transitions,
        modal_event_type_per_user,
        user_funnel_stages,
    )

    sf_dir, df = _make_events(str(tmp_path), seed)

    got_f = user_funnel_stages(sf_dir).to_pandas() \
        .set_index("user_id")["funnel_stage"].to_dict()
    assert got_f == _brute_funnel(df)

    got_t = event_type_transitions(sf_dir).to_pandas()
    got_t = {(r.from_type, r.to_type): r.n for r in got_t.itertuples()}
    assert got_t == _brute_transitions(df)

    got_m = modal_event_type_per_user(sf_dir).to_pandas()
    want = (df.groupby(["user_id", "event_type"]).size().rename("n")
            .reset_index()
            .sort_values(["user_id", "n", "event_type"],
                         ascending=[True, False, True], kind="mergesort")
            .drop_duplicates("user_id"))
    got_m = got_m.sort_values("user_id").reset_index(drop=True)
    want = want.sort_values("user_id").reset_index(drop=True)
    assert got_m["event_type"].tolist() == want["event_type"].tolist()
    assert got_m["n"].tolist() == want["n"].tolist()


def _brute_moving_window(df: pd.DataFrame, k: int = 4) -> dict:
    """Per event_id: (win_n, win_sum_milli, win_min_milli,
    win_max_milli) over the last k rows of the user's
    (ts, event_id)-ordered stream — pure-Python reference."""
    out = {}
    for _, g in df.groupby("user_id"):
        g = g.assign(ts_us=g["ts"].astype("int64"),
                     vm=np.floor(g["value"] * 1000).astype(np.int64)) \
            .sort_values(["ts_us", "event_id"], kind="mergesort")
        vms = g["vm"].tolist()
        eids = g["event_id"].tolist()
        for i in range(len(vms)):
            w = vms[max(0, i - k + 1): i + 1]
            out[eids[i]] = (len(w), sum(w), min(w), max(w))
    return out


@pytest.mark.parametrize("seed", [3, 4])
def test_moving_window_vs_brute_force(ray_session, tmp_path, seed):
    from dataquality_ray.pipelines.metrics import user_moving_window

    sf_dir, df = _make_events(str(tmp_path), seed)
    got = user_moving_window(sf_dir).to_pandas()
    got_d = {r.event_id: (r.win_n, r.win_sum_milli, r.win_min_milli,
                          r.win_max_milli) for r in got.itertuples()}
    assert got_d == _brute_moving_window(df)


def test_duplicate_spans_vs_brute_force(ray_session, tmp_path):
    """Forced cross-doc span overlaps: doc B embeds an 8-token run of
    doc A mid-text; doc C repeats its own window (intra-doc repeat must
    count EVERY position once the window is cross-doc); short docs
    (< 8 tokens) must be absent from the output."""
    import pyarrow.parquet as _pq

    from dataquality_ray.pipelines.documents import (
        DUP_SPAN_K,
        duplicate_span_documents,
    )
    from dataquality_ray.spec import TOKEN_PATTERN
    import re

    texts = [
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "prefix words here alpha beta gamma delta epsilon zeta eta "
        "theta closing remark",
        "one two three four five six seven eight one two three four "
        "five six seven eight trailing",
        "short doc only",
        "one two three four five six seven eight unrelated suffix",
    ]
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                       "text": texts,
                       "source": ["s"] * len(texts)})
    out = os.path.join(str(tmp_path), "docs")
    os.makedirs(out, exist_ok=True)
    _pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                    os.path.join(out, "documents.parquet"))

    # brute force
    tokd = {r.doc_id: re.findall(TOKEN_PATTERN, r.text.lower())
            for r in df.itertuples()}
    wins = {d: [" ".join(ts[i:i + DUP_SPAN_K])
                for i in range(len(ts) - DUP_SPAN_K + 1)]
            for d, ts in tokd.items() if len(ts) >= DUP_SPAN_K}
    owners = {}
    for d, ws in wins.items():
        for w in ws:
            owners.setdefault(w, set()).add(d)
    want = {d: (len(ws),
                sum(1 for w in ws if len(owners[w]) >= 2),
                )
            for d, ws in wins.items()}

    got = duplicate_span_documents(out).to_pandas() \
        .set_index("doc_id").sort_index()
    assert set(got.index) == set(want)
    for d, (n, ndup) in want.items():
        assert got.loc[d, "n_windows"] == n, d
        assert got.loc[d, "n_dup_windows"] == ndup, d
        assert got.loc[d, "dup_frac_milli"] == (1000 * ndup) // n, d


def test_daily_event_type_dense_empty_events(ray_session, tmp_path):
    """An empty events table must yield an empty dense grid like the
    DuckDB twin, not IndexError on days[0] (round-5 ADVICE fix)."""
    from dataquality_ray.pipelines.metrics import daily_event_type_dense

    out = os.path.join(str(tmp_path), "empty_sf")
    os.makedirs(out, exist_ok=True)
    empty = pa.table({
        "event_id": pa.array([], pa.int64()),
        "ts": pa.array([], pa.timestamp("us")),
        "user_id": pa.array([], pa.int64()),
        "event_type": pa.array([], pa.string()),
        "value": pa.array([], pa.float64()),
        "props": pa.array([], pa.string()),
    })
    pq.write_table(empty, os.path.join(out, "events.parquet"))
    got = daily_event_type_dense(out)
    assert got.num_rows == 0
    assert got.schema.names == ["day", "event_type", "n_events"]
