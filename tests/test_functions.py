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
        with pytest.raises((ValueError, OSError)):
            RealImageDecoder().decode(b"abc")  # not an image
        out = multimodal_demo("/root/testdata/sf0.001").to_pandas()
        assert len(out) > 0
        assert "payload" not in out.columns  # bytes never leave the stage
        assert len(out["features"].iloc[0]) == 16
        # determinism: same payload → same features
        fx = FakeFeatureExtractor()
        t = pa.table({"payload": pa.array([b"xyz", b"xyz"], pa.binary())})
        f = fx(t)["features"].to_pylist()
        assert f[0] == f[1]


class TestPngCodec:
    def test_roundtrip_all_channel_counts(self):
        from dataquality_ray.stages.multimodal import decode_png, encode_png
        rng = np.random.default_rng(5)
        for c in (1, 2, 3, 4):
            arr = rng.integers(0, 256, size=(11, 7, c), dtype=np.uint8)
            out = decode_png(encode_png(arr))
            assert out.shape == (11, 7, c)
            assert (out == arr).all()

    def test_decode_all_filters(self):
        """Hand-build a PNG using every scanline filter (0-4) and check
        the decoder reconstructs the reference image."""
        import struct
        import zlib
        from dataquality_ray.stages.multimodal import _PNG_SIG, decode_png
        rng = np.random.default_rng(9)
        img = rng.integers(0, 256, size=(5, 6, 3), dtype=np.uint8)
        h, w, c = img.shape
        # filter each scanline per the PNG spec (encoder side)
        lines = []
        prev = np.zeros(w * c, dtype=np.int64)
        for y, f in enumerate([0, 1, 2, 3, 4]):
            cur = img[y].reshape(-1).astype(np.int64)
            flt = np.empty_like(cur)
            for i in range(w * c):
                a = cur[i - c] if i >= c else 0
                b = prev[i]
                cc = prev[i - c] if i >= c else 0
                if f == 0:
                    pred = 0
                elif f == 1:
                    pred = a
                elif f == 2:
                    pred = b
                elif f == 3:
                    pred = (a + b) >> 1
                else:
                    p = a + b - cc
                    pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - cc)
                    pred = a if (pa_ <= pb and pa_ <= pc_) \
                        else (b if pb <= pc_ else cc)
                flt[i] = (cur[i] - pred) & 0xFF
            lines.append(bytes([f]) + flt.astype(np.uint8).tobytes())
            prev = cur

        def chunk(tag, body):
            return (struct.pack(">I", len(body)) + tag + body
                    + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

        png = (_PNG_SIG
               + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
               + chunk(b"IDAT", zlib.compress(b"".join(lines)))
               + chunk(b"IEND", b""))
        assert (decode_png(png) == img).all()

    def test_matches_pil_when_available(self):
        pytest.importorskip("PIL")
        import io
        from PIL import Image
        from dataquality_ray.stages.multimodal import decode_png
        rng = np.random.default_rng(3)
        arr = rng.integers(0, 256, size=(9, 13, 3), dtype=np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="PNG")
        assert (decode_png(buf.getvalue()) == arr).all()

    def test_real_decode_stage(self, ray_session):
        from dataquality_ray.stages.multimodal import (
            multimodal_png_features,
        )
        out = multimodal_png_features("/root/testdata/sf0.001").to_pandas()
        assert len(out) > 0
        assert "payload" not in out.columns
        assert out["decode_error"].isna().all()
        assert (out["height"] == 16).all() and (out["channels"] == 3).all()
        assert len(out["features"].iloc[0]) == 16

    def test_decode_error_routed_not_raised(self):
        import pyarrow as pa
        from dataquality_ray.stages.multimodal import ImageFeatureExtractor
        t = pa.table({
            "doc_id": pa.array([1, 2], pa.int64()),
            "payload": pa.array([b"garbage", b""], pa.binary()),
        })
        out = ImageFeatureExtractor()(t)
        errs = out["decode_error"].to_pylist()
        assert all(e is not None for e in errs)


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


class TestWavCodec:
    def test_roundtrip(self):
        from dataquality_ray.stages.multimodal import decode_wav, encode_wav
        rng = np.random.default_rng(7)
        samples = rng.integers(-32768, 32767, size=500, dtype=np.int16)
        out, rate = decode_wav(encode_wav(samples, rate=8000))
        assert rate == 8000
        assert out.shape == (500, 1)
        assert (out[:, 0] == samples).all()

    def test_features_known_signal(self):
        from dataquality_ray.stages.multimodal import (
            AudioFeatureExtractor,
            encode_wav,
        )
        # alternating +/-1000: 99 sign changes over 100 samples,
        # rms = 1000 exactly, peak 1000, duration 100/8000 s = 12 ms
        samples = np.tile([1000, -1000], 50).astype(np.int16)
        t = pa.table({"payload": pa.array(
            [encode_wav(samples), b"not a wav"], pa.binary())})
        out = AudioFeatureExtractor()(t)
        assert out["duration_ms"].to_pylist()[0] == 12
        assert out["rms_milli"].to_pylist()[0] == 1000 * 1000
        assert out["zero_crossings"].to_pylist()[0] == 99
        assert out["peak_abs"].to_pylist()[0] == 1000
        assert out["decode_error"].to_pylist()[0] is None
        assert out["decode_error"].to_pylist()[1] is not None

    def test_e2e_wav_pipeline(self, ray_session):
        from dataquality_ray.stages.multimodal import \
            multimodal_wav_features
        out = multimodal_wav_features("/root/testdata/sf0.001").to_pandas()
        assert len(out) > 0
        assert "payload" not in out.columns
        assert (out["decode_error"].isna()).all()
        assert (out["duration_ms"] == 100).all()   # 800 samples @ 8 kHz
