"""Sketch-operator properties beyond the SQL hash check: CMS never
underestimates (and returns 0 for impossible terms); the HLL estimate
derived from the hash-checked registers lands within the structure's
theoretical error of the exact distinct counts."""

import duckdb

SF = "/root/testdata/sf0.01"


def test_cms_overestimates_only(ray_session):
    from dataquality_ray.pipelines.documents import (
        CMS_QUERY_TERMS,
        term_counts_cms,
    )
    got = term_counts_cms(SF).to_pandas().set_index("term")["est_count"]
    true = dict(duckdb.sql(f"""
        WITH t AS (SELECT unnest(regexp_extract_all(lower(text),
                   '[a-z0-9]+')) AS term
                   FROM '{SF}/documents.parquet')
        SELECT term, COUNT(*) FROM t GROUP BY 1""").fetchall())
    for term in CMS_QUERY_TERMS:
        assert got[term] >= true.get(term, 0), term
    assert got["zzzabsentterm"] == 0 or true.get("zzzabsentterm", 0) > 0


def test_hll_estimate_within_bound(ray_session):
    from dataquality_ray.pipelines.metrics import (
        HLL_REGISTERS,
        distinct_users_hll,
        hll_estimate,
    )
    regs = distinct_users_hll(SF).to_pandas()
    true = dict(duckdb.sql(f"""
        SELECT event_type, COUNT(DISTINCT user_id)
        FROM '{SF}/events.parquet' GROUP BY 1""").fetchall())
    assert len(true) > 0
    for etype, part in regs.groupby("event_type"):
        r = dict(zip(part["reg"], part["rho"]))
        est = hll_estimate(r, HLL_REGISTERS)
        exact = true[etype]
        # 1.04/sqrt(64) ~ 13% standard error; allow 3 sigma
        assert abs(est - exact) <= 0.40 * exact, (etype, est, exact)


def test_bloom_decontamination_no_false_negatives(ray_session):
    """The Bloom path may over-flag (deterministic false positives,
    themselves hash-checked by the DuckDB oracle) but must NEVER
    under-flag: every (doc, n_hits) the exact set-membership operator
    reports is reached or exceeded by the Bloom probe."""
    from dataquality_ray.pipelines.documents import (
        bloom_contaminated_documents,
        contaminated_documents,
    )
    exact = contaminated_documents(SF).to_pandas().set_index("doc_id")
    bloom = bloom_contaminated_documents(SF).to_pandas() \
        .set_index("doc_id")
    assert set(exact.index) <= set(bloom.index)
    for d, row in exact.iterrows():
        assert bloom.loc[d, "n_hits"] >= row["n_hits"], d
