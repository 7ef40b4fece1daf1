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


class TestAccRowsVectorizedParity:
    """The vectorized _acc_rows must be BIT-identical to the original
    per-row scalar recipe (frozen-hot-path rule) — including on
    adversarial unicode where truncate/lower interact."""

    @staticmethod
    def _scalar_acc(emb, texts):
        import re

        from dataquality_ray.spec import TOKEN_PATTERN, token_hash_u64
        rx = re.compile(TOKEN_PATTERN, re.ASCII)
        out = np.zeros((len(texts), emb.dim), dtype=np.int64)
        for i, t in enumerate(texts):
            toks = rx.findall((t or "")[: emb.max_chars].lower())
            if not toks:
                continue
            idx = np.fromiter(
                (int(token_hash_u64(tok) % emb.buckets) for tok in toks),
                dtype=np.int64, count=len(toks))
            buckets, tf = np.unique(idx, return_counts=True)
            out[i] = tf.astype(np.int64) @ emb.proj[buckets]
        return out

    def test_bit_identical_adversarial(self):
        from dataquality_ray.stages.embeddings import (
            HashedProjectionEmbedder,
        )
        emb = HashedProjectionEmbedder()
        texts = [
            "", None, "   ", "a", "A" * 9000,            # truncate edge
            "İstanbul STRASSE ẞ ß Σίσυφος ΟΔΥΣΣΕΥΣ",     # case folding
            "naïve café résumé — em–dash …ellipsis",
            "𝔘𝔫𝔦𝔠𝔬𝔡𝔢 𝕥𝕖𝕩𝕥 🎉🎊 İı ﬀﬁ",  # astral+ligatures
            "tab\tnew\nline\r\nmixed  spaces",
            "x" * 7999 + "Ω" + "y" * 50,                 # boundary char
            "1234 mixed99alpha 0x1F upper LOWER MiXeD",
            "é́ combining ́ marks",
        ]
        got = emb._acc_rows(texts)
        want = self._scalar_acc(emb, texts)
        assert np.array_equal(got, want)

    def test_bit_identical_fixture_sample(self):
        from dataquality_ray.fixtures import transcripts_path
        import pyarrow.parquet as pq
        import glob, os

        from dataquality_ray.stages.embeddings import (
            HashedProjectionEmbedder,
        )
        root = transcripts_path(20_000, seed=42)
        f = sorted(glob.glob(os.path.join(root, "*.parquet")))[0]
        texts = pq.read_table(f, columns=["text"])["text"] \
            .to_pylist()[:3000]
        emb = HashedProjectionEmbedder()
        assert np.array_equal(emb._acc_rows(texts),
                              self._scalar_acc(emb, texts))
