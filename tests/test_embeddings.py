"""Embedding-generation stage: determinism, geometry, ANN composition."""

import numpy as np
import pyarrow as pa
import ray


def _table(texts):
    return pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })


class TestHashedProjectionEmbedder:
    def test_deterministic_and_normalized(self):
        from dataquality_ray.stages.embeddings import (
            HashedProjectionEmbedder,
        )
        texts = ["the quick brown fox jumps", "completely different words",
                 "the quick brown fox leaps", ""]
        a = HashedProjectionEmbedder()(_table(texts))
        b = HashedProjectionEmbedder()(_table(texts))  # fresh actor state
        ea = np.array(a["embedding"].to_pylist())
        eb = np.array(b["embedding"].to_pylist())
        assert np.array_equal(ea, eb)
        norms = np.linalg.norm(ea, axis=1)
        assert np.allclose(norms[:3], 1.0, atol=1e-5)
        assert norms[3] == 0.0                      # empty text → zero vec

    def test_near_dup_texts_are_close(self):
        from dataquality_ray.stages.embeddings import (
            HashedProjectionEmbedder,
        )
        texts = ["the quick brown fox jumps over the lazy dog",
                 "the quick brown fox jumps over the lazy cat",
                 "entirely unrelated content about databases and queries"]
        e = np.array(HashedProjectionEmbedder()(_table(texts))
                     ["embedding"].to_pylist())
        close = float(e[0] @ e[1])
        far = float(e[0] @ e[2])
        assert close > 0.8 > far

    def test_feeds_ann(self, ray_session):
        from dataquality_ray.stages.embeddings import embed_texts
        from dataquality_ray.stages.similarity import cosine_topk
        texts = [f"document number {i} about topic {i % 3}"
                 for i in range(30)]
        ds = embed_texts(ray.data.from_arrow(_table(texts)))
        top = cosine_topk(ds, [0, 1], k=3, id_col="doc_id").to_pandas()
        assert set(top["query_id"]) == {0, 1}
        assert (top.groupby("query_id").size() == 3).all()
