"""Training-data prep operators: structural properties the DuckDB
oracle comparison can't express directly (greedy-packing optimality,
chunk coverage)."""

import numpy as np

SF = "/root/testdata/sf0.001"


def test_packed_sequences_greedy_property(ray_session):
    from dataquality_ray.pipelines.documents import (
        PACK_TOKEN_BUDGET,
        packed_sequence_documents,
    )
    df = packed_sequence_documents(SF).to_pandas() \
        .sort_values(["bucket", "seq_id", "doc_id"]).reset_index(drop=True)
    g = df.groupby(["bucket", "seq_id"])["n_tokens"].agg(["sum", "size"])
    # a sequence exceeds the budget only when it holds a single
    # over-budget doc
    over = g[g["sum"] > PACK_TOKEN_BUDGET]
    assert (over["size"] == 1).all()
    # greedy: the first doc of sequence k+1 would NOT have fit in k
    for bucket, part in df.groupby("bucket"):
        sums = part.groupby("seq_id")["n_tokens"].sum().to_numpy()
        firsts = part.drop_duplicates("seq_id")["n_tokens"].to_numpy()
        assert (sums[:-1] + firsts[1:] > PACK_TOKEN_BUDGET).all()
    # tok_offset is the running total within the sequence
    run = df.groupby(["bucket", "seq_id"])["n_tokens"].cumsum() \
        - df["n_tokens"]
    assert (df["tok_offset"].to_numpy() == run.to_numpy()).all()


def test_context_chunks_cover_text(ray_session):
    from dataquality_ray.pipelines.documents import (
        CHUNK_STRIDE,
        CHUNK_WINDOW,
        doc_context_chunks,
    )
    import pyarrow.parquet as pq
    chunks = doc_context_chunks(SF).to_pandas()
    docs = pq.read_table(SF + "/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    n = docs.set_index("doc_id")["text"].str.len()
    got = chunks.groupby("doc_id").size()
    want = np.maximum((n + CHUNK_STRIDE - 1) // CHUNK_STRIDE, 1)
    assert (got.sort_index().to_numpy()
            == want.sort_index().to_numpy()).all()
    # overlapping reconstruction: stitching chunk prefixes of length
    # STRIDE (plus the last chunk whole) rebuilds every document
    joined = (chunks.sort_values(["doc_id", "chunk_idx"])
              .groupby("doc_id")
              .apply(lambda g: "".join(g["chunk_text"].str[:CHUNK_STRIDE]
                                       .iloc[:-1]) +
                     g["chunk_text"].iloc[-1], include_groups=False))
    assert (joined.sort_index() == docs.set_index("doc_id")["text"]
            .sort_index()).all()
    assert (chunks["chunk_len"] <= CHUNK_WINDOW).all()


def test_quality_deciles_are_balanced(ray_session):
    from dataquality_ray.pipelines.documents import (
        NTILE_BUCKETS,
        doc_quality_deciles,
    )
    df = doc_quality_deciles(SF).to_pandas()
    sizes = df.groupby("decile").size()
    assert len(sizes) == NTILE_BUCKETS
    assert sizes.max() - sizes.min() <= 1
    # deciles are monotone in (score, doc_id) order
    df = df.sort_values(["overall_quality_score", "doc_id"])
    assert (np.diff(df["decile"].to_numpy()) >= 0).all()
