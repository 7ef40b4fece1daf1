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
