"""Multimodal column plumbing — opaque binary payloads + actor-pool decode.

The image/audio decode libraries are not available in this environment, so
the decode step is STUBBED: ``RealImageDecoder.decode`` raises
NotImplementedError, and ``FakeFeatureExtractor`` computes a deterministic
byte-level feature vector instead. Everything Ray-side is real and tested:
the binary column schema, the actor-pool stage signature (model "loaded"
once per actor), small batch sizing for wide binary rows, and the output
layout (fixed-size list<float> feature column + typed metadata).

At scale: binary payloads make rows wide — keep ``batch_size`` small
(default 256 here vs 4096 for text) and let block splitting handle the
rest; never carry payloads past the feature-extraction stage (project
them away immediately, as ``extract`` does).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

N_FEATURES = 16
BINARY_BATCH_SIZE = 256


class RealImageDecoder:
    """Placeholder for a real decoder (PIL / torchvision / ffmpeg).

    Kept as the documented extension point: swap this class into
    ``decode_features`` when the codec libraries exist.
    """

    def decode(self, payload: bytes) -> "np.ndarray":
        raise NotImplementedError(
            "image/audio codecs are not available in this environment; "
            "use FakeFeatureExtractor for the plumbing path")


class FakeFeatureExtractor:
    """Actor-pool stage: deterministic byte-histogram features.

    __init__ builds the (fake) model once per actor; __call__ consumes
    Arrow batches with a ``payload`` binary column and emits a
    fixed-width float32 feature list + payload size, DROPPING the binary
    payload (never ship bytes past the extract stage).
    """

    def __init__(self, n_features: int = N_FEATURES) -> None:
        self.n_features = n_features
        # fake "model": a fixed projection seeded deterministically
        rng = np.random.default_rng(1234)
        self.proj = rng.standard_normal((256, n_features)).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"]
        if isinstance(payloads, pa.ChunkedArray):
            payloads = payloads.combine_chunks()
        feats = np.zeros((batch.num_rows, self.n_features), dtype=np.float32)
        sizes = np.zeros(batch.num_rows, dtype=np.int64)
        for i, p in enumerate(payloads.to_pylist()):
            buf = np.frombuffer(p or b"", dtype=np.uint8)
            sizes[i] = len(buf)
            if len(buf):
                hist = np.bincount(buf, minlength=256).astype(np.float32)
                feats[i] = (hist / len(buf)) @ self.proj
        out = batch.drop_columns(["payload"])
        out = out.append_column("n_bytes", pa.array(sizes))
        out = out.append_column(
            "features",
            pa.FixedSizeListArray.from_arrays(
                pa.array(feats.reshape(-1)), self.n_features))
        return out


def synthesize_binary_table(sf_dir: str):
    """Deterministic opaque-binary table derived from documents.parquet
    (stand-in for an image/audio column; no external data)."""
    import ray

    from dataquality_ray.arrowutil import strip_meta
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"]) \
        .map_batches(strip_meta, batch_format="pyarrow",
                     zero_copy_batch=True)

    def to_binary(batch: pa.Table) -> pa.Table:
        payloads = [t.encode("utf-8") * 3 for t in batch["text"].to_pylist()]
        return pa.table({
            "doc_id": batch["doc_id"],
            "media_type": pa.array(["fake/bytes"] * batch.num_rows),
            "payload": pa.array(payloads, pa.binary()),
        })

    return ds.map_batches(to_binary, batch_format="pyarrow")


def decode_features(ds, concurrency=(1, 4)):
    """Actor-pool decode/feature stage over a binary-payload dataset."""
    return ds.map_batches(
        FakeFeatureExtractor,
        batch_format="pyarrow",
        batch_size=BINARY_BATCH_SIZE,   # small: wide binary rows
        concurrency=concurrency)


class FrameSampler:
    """Actor-pool stage: deterministic frame sampling from a binary
    payload — the video-frame-sample analog (every ``stride``-th
    fixed-size window becomes one "frame" row with its own feature
    vector). One input row expands to ``<= max_frames`` output rows
    (flat-map shape), payload dropped immediately.
    """

    def __init__(self, frame_bytes: int = 64, stride: int = 2,
                 max_frames: int = 8,
                 n_features: int = N_FEATURES) -> None:
        self.frame_bytes = frame_bytes
        self.stride = stride
        self.max_frames = max_frames
        self.extractor = FakeFeatureExtractor(n_features)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"]
        if isinstance(payloads, pa.ChunkedArray):
            payloads = payloads.combine_chunks()
        ids = batch["doc_id"].to_pylist()
        out_id, out_frame, out_feat = [], [], []
        fb, proj = self.frame_bytes, self.extractor.proj
        for doc_id, p in zip(ids, payloads.to_pylist()):
            buf = np.frombuffer(p or b"", dtype=np.uint8)
            n_windows = len(buf) // fb
            for fi, w in enumerate(range(0, n_windows, self.stride)):
                if fi >= self.max_frames:
                    break
                frame = buf[w * fb:(w + 1) * fb]
                hist = np.bincount(frame, minlength=256) \
                    .astype(np.float32)
                out_id.append(doc_id)
                out_frame.append(fi)
                out_feat.append((hist / fb) @ proj)
        feats = np.asarray(out_feat, dtype=np.float32) if out_feat \
            else np.zeros((0, self.extractor.n_features), dtype=np.float32)
        return pa.table({
            "doc_id": pa.array(out_id, pa.int64()),
            "frame_idx": pa.array(out_frame, pa.int32()),
            "features": pa.FixedSizeListArray.from_arrays(
                pa.array(feats.reshape(-1)), self.extractor.n_features),
        })


class PayloadResizer:
    """Actor-pool stage: deterministic payload "resize" — the image-
    resize analog over opaque bytes (real decode is stubbed in this
    environment). Down-samples the byte stream to exactly
    ``target_bytes`` by averaging equal-width windows (area
    interpolation over 1-D bytes); shorter payloads are zero-padded.
    Emits a fixed-width ``resized`` binary column + original size,
    dropping the input payload.
    """

    def __init__(self, target_bytes: int = 128) -> None:
        self.target = target_bytes

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"]
        if isinstance(payloads, pa.ChunkedArray):
            payloads = payloads.combine_chunks()
        t = self.target
        out = np.zeros((batch.num_rows, t), dtype=np.uint8)
        sizes = np.zeros(batch.num_rows, dtype=np.int64)
        for i, p in enumerate(payloads.to_pylist()):
            buf = np.frombuffer(p or b"", dtype=np.uint8)
            sizes[i] = len(buf)
            if not len(buf):
                continue
            if len(buf) <= t:
                out[i, :len(buf)] = buf
            else:
                # area interpolation: mean over t equal windows
                edges = np.linspace(0, len(buf), t + 1).astype(np.int64)
                sums = np.add.reduceat(buf.astype(np.int64), edges[:-1])
                widths = np.maximum(np.diff(edges), 1)
                out[i] = (sums // widths).astype(np.uint8)
        res = batch.drop_columns(["payload"])
        res = res.append_column("n_bytes", pa.array(sizes))
        res = res.append_column(
            "resized", pa.array([r.tobytes() for r in out], pa.binary()))
        return res


def resize_payloads(ds, target_bytes: int = 128, concurrency=(1, 4)):
    """Actor-pool resize stage over a binary-payload dataset."""
    return ds.map_batches(
        PayloadResizer,
        fn_constructor_kwargs={"target_bytes": target_bytes},
        batch_format="pyarrow",
        batch_size=BINARY_BATCH_SIZE,
        concurrency=concurrency)


def sample_frames(ds, concurrency=(1, 4)):
    """Actor-pool frame-sampling stage over a binary-payload dataset."""
    return ds.map_batches(
        FrameSampler,
        batch_format="pyarrow",
        batch_size=BINARY_BATCH_SIZE,
        concurrency=concurrency)


def multimodal_demo(sf_dir: str):
    """End-to-end multimodal plumbing: synthesize → decode → features."""
    return decode_features(synthesize_binary_table(sf_dir))


def multimodal_frames(sf_dir: str):
    """End-to-end frame-sampling plumbing: synthesize → sample frames."""
    return sample_frames(synthesize_binary_table(sf_dir))
