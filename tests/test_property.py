"""Property-based tests (hypothesis): the vectorized kernels must agree
with the scalar spec on arbitrary text, and the scrub must be idempotent
and bounded."""

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from dataquality_ray import spec
from dataquality_ray.stages.heuristics import heuristics_batch
from dataquality_ray.stages.scrub import scrub_batch

# printable-ish unicode text, incl. digits/punct that stress the regexes
_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",),
                           max_codepoint=0x2FFF),
    max_size=300,
)


@settings(max_examples=200, deadline=None)
@given(_text)
def test_scrub_idempotent(t):
    once, counts1 = spec.scrub_text(t)
    twice, counts2 = spec.scrub_text(once)
    assert twice == once
    # replacement tokens never re-match any PII pattern
    assert counts2 == {"email": 0, "ssn": 0, "phone": 0}


@settings(max_examples=200, deadline=None)
@given(_text)
def test_scores_bounded(t):
    toks = spec.tokenize(t)
    for s in (
        spec.length_score(len(t)),
        spec.repetition_score(len(set(toks)), len(toks)),
        spec.symbol_score(spec.count_symbols(t), len(t)),
        spec.boilerplate_score(spec.is_boilerplate(t)),
    ):
        assert 0 <= s <= 100


@settings(max_examples=50, deadline=None)
@given(st.lists(_text, min_size=1, max_size=20))
def test_vectorized_scrub_matches_scalar(texts):
    table = pa.table({"text": pa.array(texts, pa.string())})
    out = scrub_batch(table)
    for i, t in enumerate(texts):
        want, counts = spec.scrub_text(t)
        assert out["text"][i].as_py() == want
        assert out["n_email"][i].as_py() == counts["email"]
        assert out["n_phone"][i].as_py() == counts["phone"]
        assert out["n_ssn"][i].as_py() == counts["ssn"]


@settings(max_examples=50, deadline=None)
@given(st.lists(_text, min_size=1, max_size=20))
def test_vectorized_heuristics_match_scalar(texts):
    table = pa.table({"text": pa.array(texts, pa.string())})
    out = heuristics_batch(table)
    for i, t in enumerate(texts):
        toks = spec.tokenize(t)
        assert out["length_score"][i].as_py() == spec.length_score(len(t))
        assert out["repetition_score"][i].as_py() == \
            spec.repetition_score(len(set(toks)), len(toks))
        assert out["symbol_score"][i].as_py() == \
            spec.symbol_score(spec.count_symbols(t), len(t))
        assert out["boilerplate_score"][i].as_py() == \
            spec.boilerplate_score(spec.is_boilerplate(t))


@settings(max_examples=50, deadline=None)
@given(st.lists(_text, min_size=1, max_size=20))
def test_vectorized_content_hash_matches_scalar(texts):
    from dataquality_ray.stages.dedup import content_hash_batch
    table = pa.table({
        "conv_id": pa.array(["c"] * len(texts), pa.string()),
        "turn_idx": pa.array(range(len(texts)), pa.int32()),
        "text": pa.array(texts, pa.string()),
    })
    out = content_hash_batch(table)
    for i, t in enumerate(texts):
        assert out["content_hash"][i].as_py() == spec.content_hash(t)
        assert out["is_empty_norm"][i].as_py() == \
            (spec.normalize_for_hash(t) == "")


@settings(max_examples=100, deadline=None)
@given(_text)
def test_normalize_and_hash_stable(t):
    n1 = spec.normalize_for_hash(t)
    assert spec.normalize_for_hash(n1) == n1          # idempotent
    assert spec.content_hash(t) == spec.content_hash(" " + t + " ")


@settings(max_examples=100, deadline=None)
@given(_text, _text)
def test_langid_deterministic(a, b):
    from dataquality_ray.functions.langid import get_model
    m = get_model()
    # batched and scalar paths agree (shared summation order)
    assert m.predict_batch([a, b]) == [m.predict(a), m.predict(b)]


# toxic phrases woven into arbitrary unicode text — stresses \b semantics
_toxic_mix = st.lists(
    st.one_of(_text,
              st.sampled_from(list(spec.TOXICITY_TERMS)),
              st.sampled_from(["Worthless", "SHUT UP", "you Idiot"])),
    min_size=0, max_size=6,
).map(" ".join)


@settings(max_examples=200, deadline=None)
@given(_toxic_mix)
def test_toxicity_python_matches_duckdb_and_arrow(t):
    """Python re.ASCII, pyarrow RE2 and DuckDB RE2 must agree on
    toxicity counts + masking for arbitrary unicode-adjacent text."""
    import duckdb
    import pyarrow.compute as pc

    want_n = spec.toxicity_count(t)
    want_mask = spec.mask_toxicity(t)
    # pyarrow (RE2)
    lower = pc.utf8_lower(pa.array([t]))
    got_n = pc.count_substring_regex(lower, spec.TOXICITY_PATTERN)[0].as_py()
    got_mask = pc.replace_substring_regex(
        lower, spec.TOXICITY_PATTERN, spec.TOX_TOKEN)[0].as_py()
    assert got_n == want_n
    assert got_mask == want_mask
    # DuckDB (RE2)
    con = duckdb.connect()
    dn, dm = con.execute(
        f"SELECT len(regexp_extract_all(lower(?), '{spec.TOXICITY_PATTERN}')),"
        f" regexp_replace(lower(?), '{spec.TOXICITY_PATTERN}',"
        f" '{spec.TOX_TOKEN}', 'g')", [t, t]).fetchone()
    assert dn == want_n
    assert dm == want_mask


@settings(max_examples=200, deadline=None)
@given(_text)
def test_entities_python_matches_duckdb(t):
    """ENTITY_PATTERN (\\b-anchored capitalized spans) must extract the
    same mentions under Python re.ASCII and DuckDB RE2."""
    import duckdb
    want = spec.extract_entities(t)
    con = duckdb.connect()
    got = con.execute(
        f"SELECT regexp_extract_all(?, '{spec.ENTITY_PATTERN}')",
        [t]).fetchone()[0]
    assert got == want


@settings(max_examples=100, deadline=None)
@given(_text)
def test_fingerprint_batch_matches_scalar_property(t):
    from dataquality_ray.stages.dedup import fingerprint_batch
    out = fingerprint_batch(pa.table({"text": pa.array([t], pa.string())}))
    assert out["fingerprint"][0].as_py() == spec.rolling_fingerprint(t)


@settings(max_examples=100, deadline=None)
@given(st.lists(_text, min_size=1, max_size=8))
def test_shingle_minhash_matches_scalar(texts):
    """MinHashSimHash(ngram=3) == scalar per-row recomputation from
    spec primitives (shingles = space-joined 3-token windows, distinct,
    md5-u64, per-perm a*h+b mod 2^64 min)."""
    import numpy as np

    from dataquality_ray.config import DEFAULT_CONFIG
    from dataquality_ray.stages.dedup import MinHashSimHash

    out = MinHashSimHash(ngram=3)(pa.table({"text": texts}))
    a, b = spec.minhash_params(DEFAULT_CONFIG.minhash_perms,
                               DEFAULT_CONFIG.seed)
    maxu = np.uint64(0xFFFFFFFFFFFFFFFF)
    for i, t in enumerate(texts):
        toks = spec.tokenize(t)
        sh = {" ".join(toks[j:j + 3]) for j in range(len(toks) - 2)}
        hs = sorted(spec.token_hash_u64(s) for s in sh)
        assert out["token_hashes"][i].as_py() == hs
        sig = out["minhash_sig"][i].as_py()
        if not hs:
            assert set(sig) == {int(maxu)}
            assert out["simhash"][i].as_py() == 0
            continue
        h = np.array(hs, dtype=np.uint64)
        with np.errstate(over="ignore"):
            expect = (a[:, None] * h[None, :] + b[:, None]).min(axis=1)
        assert sig == expect.tolist()


@settings(max_examples=60, deadline=None)
@given(st.lists(
    st.tuples(st.integers(0, 4),                      # user
              st.integers(0, 3_000_000_000),          # ts offset us
              st.booleans(),                          # is error
              st.integers(-5000, 5000)),              # value milli-ish
    min_size=1, max_size=60))
def test_range_join_cumulative_matches_bruteforce(rows):
    """The merge_asof cumulative-bounds kernel == O(n^2) brute force on
    arbitrary event layouts (ties, duplicates, empty sides)."""
    import numpy as np
    import pandas as pd

    from dataquality_ray.pipelines.metrics import RANGE_JOIN_WINDOW_US

    df = pd.DataFrame(rows, columns=["user_id", "ts_us", "is_err", "v"])
    df["event_id"] = np.arange(len(df))
    df["bucket"] = 0

    # replicate window_agg's kernel (module-private closure → inline)
    err = df[df["is_err"]][["event_id", "user_id", "ts_us"]] \
        .reset_index(drop=True)
    x = df[~df["is_err"]][["user_id", "ts_us", "v"]] \
        .sort_values(["user_id", "ts_us"], kind="mergesort")
    x["c"] = x.groupby("user_id").cumcount() + 1
    x["cv"] = x.groupby("user_id")["v"].cumsum()
    right = x.rename(columns={"ts_us": "q"})[
        ["user_id", "q", "c", "cv"]].sort_values("q", kind="mergesort")

    def at_or_before(bound):
        q = pd.DataFrame({"user_id": err["user_id"], "q": bound,
                          "i": np.arange(len(err))})
        q = q.sort_values("q", kind="mergesort")
        m = pd.merge_asof(q, right, on="q", by="user_id",
                          direction="backward")
        m = m.sort_values("i", kind="mergesort")
        return m[["c", "cv"]].fillna(0).reset_index(drop=True)

    hi = at_or_before(err["ts_us"])
    lo = at_or_before(err["ts_us"] - RANGE_JOIN_WINDOW_US)
    got_n = (hi["c"] - lo["c"]).astype(int).to_numpy()
    got_s = (hi["cv"] - lo["cv"]).astype(int).to_numpy()

    for k in range(len(err)):
        u, t = err["user_id"].iloc[k], err["ts_us"].iloc[k]
        w = df[(~df["is_err"]) & (df["user_id"] == u)
               & (df["ts_us"] > t - RANGE_JOIN_WINDOW_US)
               & (df["ts_us"] <= t)]
        assert got_n[k] == len(w)
        assert got_s[k] == int(w["v"].sum())
