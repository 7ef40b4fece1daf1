"""Vectorized stages must agree element-for-element with the scalar oracle.

These run the stage kernels DIRECTLY on Arrow batches (no Ray) so failures
pinpoint the kernel, not the distribution; the end-to-end Ray test lives in
test_pipeline_e2e.py.
"""

import numpy as np
import pyarrow as pa

from dataquality_ray import spec
from dataquality_ray.config import DEFAULT_CONFIG
from dataquality_ray.stages.decision import decision_batch
from dataquality_ray.stages.dedup import MinHashSimHash, content_hash_batch
from dataquality_ray.stages.heuristics import heuristics_batch
from dataquality_ray.stages.model_scorers import CombinedModelScorer
from dataquality_ray.stages.scrub import scrub_batch


def _full_stage_pass(table: pa.Table) -> pa.Table:
    out = scrub_batch(table)
    out = heuristics_batch(out)
    out = CombinedModelScorer()(out)
    out = decision_batch(out)
    out = content_hash_batch(out)
    return out


def test_scrub_matches_oracle(small_transcripts, small_oracle):
    got = scrub_batch(
        small_transcripts.sort_by([("conv_id", "ascending"),
                                   ("turn_idx", "ascending")]))
    assert got["text"].to_pylist() == small_oracle["text"].to_pylist()
    for c in ("n_email", "n_phone", "n_ssn"):
        assert got[c].to_pylist() == small_oracle[c].to_pylist(), c


def test_stages_match_oracle_columns(small_transcripts, small_oracle):
    table = small_transcripts.sort_by([("conv_id", "ascending"),
                                       ("turn_idx", "ascending")])
    got = _full_stage_pass(table)
    for col in ("length_score", "repetition_score", "symbol_score",
                "boilerplate_score", "lang_score", "ppl_score",
                "timeliness_score", "toxicity_score", "n_toxic",
                "overall_quality_score", "action",
                "keep", "lang", "content_hash"):
        assert got[col].to_pylist() == small_oracle[col].to_pylist(), col
    # floats: close, not bitwise (float32 casts)
    np.testing.assert_allclose(
        got["log2_ppl"].to_numpy(zero_copy_only=False),
        small_oracle["log2_ppl"].to_numpy(zero_copy_only=False), rtol=1e-5)


def test_minhash_simhash_batch_matches_scalar():
    texts = ["the quick brown fox", "the quick brown fox",
             "a completely different sentence here", ""]
    table = pa.table({
        "conv_id": ["c"] * 4,
        "turn_idx": pa.array(range(4), pa.int32()),
        "text": texts,
    })
    table = content_hash_batch(table)
    out = MinHashSimHash()(table)
    sigs = out["minhash_sig"].to_pylist()
    assert sigs[0] == sigs[1]                      # identical text, same sig
    assert sigs[0] != sigs[2]
    sims = out["simhash"].to_pylist()
    assert sims[0] == sims[1]
    # scalar recomputation of row 0 signature
    a, b = spec.minhash_params(DEFAULT_CONFIG.minhash_perms, DEFAULT_CONFIG.seed)
    h = np.array(sorted({spec.token_hash_u64(t)
                         for t in spec.tokenize(texts[0])}), dtype=np.uint64)
    expect = (a[:, None] * h[None, :] + b[:, None]).min(axis=1)
    assert sigs[0] == expect.tolist()


def test_content_hash_batch_matches_scalar():
    texts = ["Hello  World", "hello world", "", "  ", "X"]
    table = pa.table({
        "conv_id": ["c"] * 5,
        "turn_idx": pa.array(range(5), pa.int32()),
        "text": texts,
    })
    out = content_hash_batch(table)
    assert out["content_hash"].to_pylist() == [spec.content_hash(t) for t in texts]
    assert out["is_empty_norm"].to_pylist() == [False, False, True, True, False]
    assert out["order_key"].to_pylist()[0] == spec.order_key("c", 0)


def test_minhash_shingle_ngram_edges():
    """ngram=3 shingling: rows shorter than the ngram get the empty
    (all-max minhash, zero simhash) signature; shingle hashes equal the
    md5-u64 of the space-joined lowercased token windows (distinct)."""
    texts = ["", "one", "one two", "one two three",
             "a b c d", "A  b C d", "x x x x"]
    table = pa.table({"text": texts})
    out = MinHashSimHash(ngram=3)(table)
    toks = out["token_hashes"].to_pylist()
    assert [len(t) for t in toks] == [0, 0, 0, 1, 2, 2, 1]
    maxu = (1 << 64) - 1
    sigs = out["minhash_sig"].to_pylist()
    sims = out["simhash"].to_pylist()
    for i in range(3):
        assert set(sigs[i]) == {maxu} and sims[i] == 0
    assert toks[3] == [spec.token_hash_u64("one two three")]
    assert set(toks[4]) == {spec.token_hash_u64("a b c"),
                            spec.token_hash_u64("b c d")}
    assert toks[4] == toks[5]                    # case/ws-insensitive
    assert toks[6] == [spec.token_hash_u64("x x x")]  # distinct shingles
