"""Unit tests: flexible date parsing (M7), error routing (M6), similarity
kernels, multimodal plumbing, hamming distance."""

from datetime import datetime

import numpy as np
import pyarrow as pa
import pytest

from dataquality_ray.functions.dates import parse_flexible_date, to_utc_naive
from dataquality_ray.stages.dedup import hamming64
from dataquality_ray.stages.errors import route_errors


class TestFlexibleDates:
    """Reference analog: lenient date cascade metadata.py:116-149."""

    @pytest.mark.parametrize("raw,expected", [
        ("2025-12-06T12:15:58", datetime(2025, 12, 6, 12, 15, 58)),
        ("2025-12-06", datetime(2025, 12, 6)),
        ("12/06/2025", datetime(2025, 12, 6)),
        ("12/06/2025 10:30:00", datetime(2025, 12, 6, 10, 30)),
        ("12-06-2025", datetime(2025, 12, 6)),
        ("06 Dec 2025", datetime(2025, 12, 6)),
        ("Dec 06, 2025", datetime(2025, 12, 6)),
        ("December 06, 2025", datetime(2025, 12, 6)),
    ])
    def test_formats(self, raw, expected):
        assert parse_flexible_date(raw) == expected

    def test_z_suffix_utc(self):
        dt = parse_flexible_date("2025-12-06T12:00:00Z")
        assert dt is not None and dt.tzinfo is not None
        assert to_utc_naive(dt) == datetime(2025, 12, 6, 12, 0, 0)

    def test_garbage_returns_none(self):
        for bad in ["", None, "not a date", "13/45/9999x", 42]:
            assert parse_flexible_date(bad) is None


class TestErrorRouting:
    """Reference analog: error rows kept, metadata.py:284-299,477-492."""

    def _flaky(self, batch: pa.Table) -> pa.Table:
        if any(v < 0 for v in batch["x"].to_pylist()):
            raise ValueError("negative input")
        sq = pa.array([v * v for v in batch["x"].to_pylist()], pa.int64())
        return batch.append_column("x_squared", sq)

    def test_success_path(self):
        batch = pa.table({"x": pa.array([1, 2, 3], pa.int64())})
        out = route_errors(self._flaky)(batch)
        assert out["status"].to_pylist() == ["success"] * 3
        assert out["x_squared"].to_pylist() == [1, 4, 9]

    def test_bad_rows_routed_not_dropped(self):
        batch = pa.table({"x": pa.array([1, -5, 3], pa.int64())})
        out = route_errors(self._flaky)(batch)
        assert out.num_rows == 3  # never drop rows silently
        by_x = dict(zip(out["x"].to_pylist(), out["status"].to_pylist()))
        assert by_x == {1: "success", 3: "success", -5: "error"}
        err_row = out.filter(pa.compute.equal(out["x"], -5))
        assert err_row["x_squared"].to_pylist() == [None]
        assert "negative" in err_row["error"].to_pylist()[0]


class TestHamming:
    def test_hamming64(self):
        a = np.array([0, 0xFFFFFFFFFFFFFFFF, 0b1011], dtype=np.uint64)
        b = np.array([0, 0, 0b0010], dtype=np.uint64)
        assert hamming64(a, b).tolist() == [0, 64, 2]


class TestSimilarityKernels:
    def test_cosine_topk_matches_numpy(self, ray_session):
        import ray
        from dataquality_ray.stages.similarity import cosine_topk
        rng = np.random.default_rng(3)
        emb = rng.standard_normal((50, 8)).astype(np.float32)
        tab = pa.table({
            "vec_id": pa.array(range(50), pa.int64()),
            "embedding": pa.array([list(map(float, e)) for e in emb],
                                  pa.list_(pa.float32())),
        })
        got = cosine_topk(ray.data.from_arrow(tab), [0, 1], k=5).to_pandas()
        m = emb.astype(np.float64)
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        for qid in (0, 1):
            sims = m @ m[qid]
            cand = [i for i in range(50) if i not in (0, 1)]
            expect = sorted(cand, key=lambda i: (-sims[i], i))[:5]
            sub = got[got.query_id == qid].sort_values("rank")
            assert sub.vec_id.tolist() == expect

    def test_multimodal_plumbing(self, ray_session):
        from dataquality_ray.stages.multimodal import (
            FakeFeatureExtractor,
            RealImageDecoder,
            multimodal_demo,
        )
        with pytest.raises(NotImplementedError):
            RealImageDecoder().decode(b"abc")
        out = multimodal_demo("/root/testdata/sf0.001").to_pandas()
        assert len(out) > 0
        assert "payload" not in out.columns  # bytes never leave the stage
        assert len(out["features"].iloc[0]) == 16
        # determinism: same payload → same features
        fx = FakeFeatureExtractor()
        t = pa.table({"payload": pa.array([b"xyz", b"xyz"], pa.binary())})
        f = fx(t)["features"].to_pylist()
        assert f[0] == f[1]


class TestFrameSampling:
    def test_frame_sampler_expands_rows(self, ray_session):
        from dataquality_ray.stages.multimodal import multimodal_frames
        out = multimodal_frames("/root/testdata/sf0.001").to_pandas()
        assert len(out) > 0
        assert set(out.columns) == {"doc_id", "frame_idx", "features"}
        # one input row expands to multiple frame rows, capped at 8
        per_doc = out.groupby("doc_id").size()
        assert per_doc.max() <= 8
        assert (out["frame_idx"] >= 0).all()
        assert len(out["features"].iloc[0]) == 16

    def test_frame_sampler_deterministic(self):
        import pyarrow as pa
        from dataquality_ray.stages.multimodal import FrameSampler
        t = pa.table({
            "doc_id": pa.array([7], pa.int64()),
            "payload": pa.array([bytes(range(256)) * 4], pa.binary()),
        })
        a = FrameSampler()(t).to_pydict()
        b = FrameSampler()(t).to_pydict()
        assert a == b
        # stride 2 over 16 windows of 64B -> 8 frames
        assert a["frame_idx"] == list(range(8))


class TestPayloadResize:
    def test_resize_deterministic_and_fixed_width(self, ray_session):
        import pyarrow as pa
        from dataquality_ray.stages.multimodal import (
            PayloadResizer,
            resize_payloads,
            synthesize_binary_table,
        )
        t = pa.table({
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "payload": pa.array(
                [bytes(range(256)) * 3, b"short", b""], pa.binary()),
        })
        a = PayloadResizer(target_bytes=64)(t)
        b = PayloadResizer(target_bytes=64)(t)
        assert a.to_pydict() == b.to_pydict()
        assert all(len(r) == 64 for r in a["resized"].to_pylist())
        assert "payload" not in a.column_names
        assert a["n_bytes"].to_pylist() == [768, 5, 0]
        # short payload zero-padded, not interpolated
        assert a["resized"][1].as_py()[:5] == b"short"
        # end-to-end over the synthetic table
        out = resize_payloads(
            synthesize_binary_table("/root/testdata/sf0.001")).to_pandas()
        assert len(out) > 0 and "resized" in out.columns
