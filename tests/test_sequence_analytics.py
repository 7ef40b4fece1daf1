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
