"""Multimodal column plumbing — opaque binary payloads + actor-pool decode.

The decode step is REAL for PNG: ``RealImageDecoder`` prefers PIL when it
is importable and otherwise falls back to a pure-Python/numpy PNG decoder
built on stdlib zlib (8-bit gray/gray+alpha/RGB/RGBA, all five scanline
filters, non-interlaced — the subset every common encoder emits).
``FakeFeatureExtractor`` remains the codec-free byte-level path for
arbitrary binary payloads. Everything Ray-side is real and tested: the
binary column schema, the actor-pool stage signature (model "loaded" once
per actor), small batch sizing for wide binary rows, and the output
layout (fixed-size list<float> feature column + typed metadata).

At scale: binary payloads make rows wide — keep ``batch_size`` small
(default 256 here vs 4096 for text) and let block splitting handle the
rest; never carry payloads past the feature-extraction stage (project
them away immediately, as ``extract`` does).
"""

from __future__ import annotations

import os
import struct
import zlib

import numpy as np
import pyarrow as pa

N_FEATURES = 16
BINARY_BATCH_SIZE = 256

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type -> channels (8-bit, non-interlaced)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def encode_png(arr: np.ndarray) -> bytes:
    """Minimal deterministic PNG encoder (filter 0, one IDAT) — lets the
    decode path be exercised end-to-end without any codec library.
    Accepts (H, W), (H, W, 1|2|3|4) uint8 arrays."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def decode_png(data: bytes) -> np.ndarray:
    """Pure-Python/numpy PNG decode (stdlib zlib): 8-bit depth, color
    types 0/2/4/6, filters 0-4, non-interlaced. Returns (H, W, C) uint8.
    Raises ValueError on anything else (palette, 16-bit, Adam7)."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, idat = 8, []
    w = h = bd = ct = interlace = None
    while pos + 8 <= len(data):
        (ln,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            w, h, bd, ct, _comp, _filt, interlace = \
                struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
    if w is None or bd != 8 or interlace != 0 or ct not in _PNG_CHANNELS:
        raise ValueError(
            f"unsupported PNG (bit depth {bd}, color type {ct}, "
            f"interlace {interlace}); only 8-bit non-interlaced "
            "gray/GA/RGB/RGBA")
    c = _PNG_CHANNELS[ct]
    stride = w * c
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("corrupt PNG: bad decompressed length")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    p = 0
    with np.errstate(over="ignore"):
        for y in range(h):
            f = raw[p]
            line = np.frombuffer(raw, np.uint8, stride, p + 1).copy()
            p += 1 + stride
            if f == 0:                      # None
                cur = line
            elif f == 2:                    # Up (vectorized, mod-256)
                cur = line + prev
            elif f == 1:                    # Sub: prefix sum per channel
                cur = line.reshape(w, c).cumsum(
                    axis=0, dtype=np.uint8).reshape(stride)
            else:                           # Average / Paeth: sequential
                cur = line
                for i in range(stride):
                    a = int(cur[i - c]) if i >= c else 0
                    b = int(prev[i])
                    if f == 3:
                        cur[i] = (int(line[i]) + ((a + b) >> 1)) & 0xFF
                    elif f == 4:
                        cc = int(prev[i - c]) if i >= c else 0
                        pp = a + b - cc
                        pa_, pb, pc_ = abs(pp - a), abs(pp - b), abs(pp - cc)
                        pred = a if (pa_ <= pb and pa_ <= pc_) \
                            else (b if pb <= pc_ else cc)
                        cur[i] = (int(line[i]) + pred) & 0xFF
                    else:
                        raise ValueError(f"bad PNG filter {f}")
            out[y] = cur
            prev = cur
    return out.reshape(h, w, c)


class RealImageDecoder:
    """Real image decoder: PIL when importable, else the pure-Python PNG
    path above. Construct once per actor (the backend probe is an
    import attempt); ``decode`` returns (H, W, C) uint8."""

    def __init__(self) -> None:
        try:
            from PIL import Image  # noqa: F401
            self._pil = Image
        except ImportError:
            self._pil = None
        self.backend = "pil" if self._pil is not None else "png-pure"

    def decode(self, payload: bytes) -> np.ndarray:
        if self._pil is not None:
            import io
            arr = np.asarray(self._pil.open(io.BytesIO(payload)))
            return arr[:, :, None] if arr.ndim == 2 else arr
        return decode_png(payload)


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


class ImageFeatureExtractor:
    """Actor-pool stage with REAL decode: PNG payload → pixel array →
    deterministic feature vector (pixel-intensity histogram × frozen
    projection + width/height/channels). Decoder and projection built
    once per actor; rows that fail to decode get null features and the
    error message in ``decode_error`` (error routing, never a crash).
    Payload dropped at extract."""

    def __init__(self, n_features: int = N_FEATURES) -> None:
        self.decoder = RealImageDecoder()
        self.n_features = n_features
        rng = np.random.default_rng(1234)
        self.proj = rng.standard_normal((256, n_features)).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        feats = np.zeros((n, self.n_features), dtype=np.float32)
        dims = np.zeros((n, 3), dtype=np.int32)
        errs: list = [None] * n
        payloads = batch["payload"]
        if isinstance(payloads, pa.ChunkedArray):
            payloads = payloads.combine_chunks()
        for i, p in enumerate(payloads.to_pylist()):
            try:
                img = self.decoder.decode(p or b"")
                h, w, c = img.shape
                dims[i] = (h, w, c)
                hist = np.bincount(img.reshape(-1), minlength=256) \
                    .astype(np.float32)
                feats[i] = (hist / max(img.size, 1)) @ self.proj
            except (ValueError, OSError) as e:
                errs[i] = str(e)[:200]
        out = batch.drop_columns(["payload"])
        out = out.append_column("height", pa.array(dims[:, 0]))
        out = out.append_column("width", pa.array(dims[:, 1]))
        out = out.append_column("channels", pa.array(dims[:, 2]))
        out = out.append_column(
            "features",
            pa.FixedSizeListArray.from_arrays(
                pa.array(feats.reshape(-1)), self.n_features))
        out = out.append_column("decode_error", pa.array(errs, pa.string()))
        return out


def synthesize_png_table(sf_dir: str):
    """Deterministic small REAL PNGs derived from documents.parquet (no
    external data): each doc's utf-8 bytes tile an (h, w, 3) array that
    is encoded with the minimal PNG encoder above."""
    import ray

    from dataquality_ray.arrowutil import strip_meta
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"]) \
        .map_batches(strip_meta, batch_format="pyarrow",
                     zero_copy_batch=True)

    def to_png(batch: pa.Table) -> pa.Table:
        payloads = []
        for t in batch["text"].to_pylist():
            buf = np.frombuffer((t or " ").encode("utf-8"), dtype=np.uint8)
            h = w = 16
            arr = np.resize(buf, h * w * 3).reshape(h, w, 3)
            payloads.append(encode_png(arr))
        return pa.table({
            "doc_id": batch["doc_id"],
            "media_type": pa.array(["image/png"] * batch.num_rows),
            "payload": pa.array(payloads, pa.binary()),
        })

    return ds.map_batches(to_png, batch_format="pyarrow")


def decode_image_features(ds, concurrency=(1, 4)):
    """Actor-pool REAL-decode feature stage over a PNG-payload dataset."""
    return ds.map_batches(
        ImageFeatureExtractor,
        batch_format="pyarrow",
        batch_size=BINARY_BATCH_SIZE,
        concurrency=concurrency)


def multimodal_demo(sf_dir: str):
    """End-to-end multimodal plumbing: synthesize → decode → features."""
    return decode_features(synthesize_binary_table(sf_dir))


def multimodal_png_features(sf_dir: str):
    """End-to-end REAL decode: synthesize PNGs → decode → features."""
    return decode_image_features(synthesize_png_table(sf_dir))


def multimodal_frames(sf_dir: str):
    """End-to-end frame-sampling plumbing: synthesize → sample frames."""
    return sample_frames(synthesize_binary_table(sf_dir))


# ---------------------------------------------------------------------------
# REAL audio decode path: PCM-16 WAV via the stdlib ``wave`` module —
# like the PNG path, the codec is real (no fake), dependency-free, and
# the actor/batch/error-routing plumbing is identical to what a
# soundfile/librosa-backed extractor would use at scale.
# ---------------------------------------------------------------------------

def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """Minimal mono PCM-16 WAV from an int16 sample array."""
    import io
    import wave
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(np.asarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


def decode_wav(data: bytes):
    """(samples[int16 (n, ch)], rate) from a PCM-16 WAV payload."""
    import io
    import wave
    with wave.open(io.BytesIO(data), "rb") as w:
        if w.getsampwidth() != 2:
            raise ValueError(
                f"unsupported sample width {w.getsampwidth()}")
        rate = w.getframerate()
        ch = w.getnchannels()
        raw = w.readframes(w.getnframes())
    arr = np.frombuffer(raw, dtype="<i2")
    return arr.reshape(-1, ch), rate


class AudioFeatureExtractor:
    """Actor-pool stage with REAL decode: WAV payload → PCM samples →
    deterministic integer features (duration_ms, rms_milli via exact
    int64 square sums, zero_crossings, peak_abs). Decode failures route
    to ``decode_error`` (never a crash); payload dropped at extract."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        dur = np.zeros(n, dtype=np.int64)
        rms = np.zeros(n, dtype=np.int64)
        zc = np.zeros(n, dtype=np.int64)
        peak = np.zeros(n, dtype=np.int64)
        errs: list = [None] * n
        payloads = batch["payload"]
        if isinstance(payloads, pa.ChunkedArray):
            payloads = payloads.combine_chunks()
        for i, p in enumerate(payloads.to_pylist()):
            try:
                samples, rate = decode_wav(p or b"")
                x = samples[:, 0].astype(np.int64)
                if not len(x) or rate <= 0:
                    raise ValueError("empty audio")
                dur[i] = len(x) * 1000 // rate
                rms[i] = np.int64(
                    np.floor(np.sqrt((x * x).sum() / len(x)) * 1000))
                s = np.sign(x)
                s = s[s != 0]
                zc[i] = int((s[1:] != s[:-1]).sum()) if len(s) else 0
                peak[i] = int(np.abs(x).max())
            except Exception as e:  # noqa: BLE001 — error routing:
                # wave.Error/ValueError/EOFError all land here, never crash
                errs[i] = str(e)[:200]
        out = batch.drop_columns(["payload"])
        out = out.append_column("duration_ms", pa.array(dur))
        out = out.append_column("rms_milli", pa.array(rms))
        out = out.append_column("zero_crossings", pa.array(zc))
        out = out.append_column("peak_abs", pa.array(peak))
        out = out.append_column("decode_error", pa.array(errs, pa.string()))
        return out


def synthesize_wav_table(sf_dir: str):
    """Deterministic small REAL WAVs derived from documents.parquet: each
    doc's utf-8 bytes tile an 800-sample int16 waveform (centered,
    scaled) encoded with the stdlib codec above."""
    import ray

    from dataquality_ray.arrowutil import strip_meta
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"]) \
        .map_batches(strip_meta, batch_format="pyarrow",
                     zero_copy_batch=True)

    def to_wav(batch: pa.Table) -> pa.Table:
        payloads = []
        for t in batch["text"].to_pylist():
            buf = np.frombuffer((t or " ").encode("utf-8"),
                                dtype=np.uint8)
            samples = (np.resize(buf, 800).astype(np.int16) - 128) * 256
            payloads.append(encode_wav(samples))
        return pa.table({
            "doc_id": batch["doc_id"],
            "media_type": pa.array(["audio/wav"] * batch.num_rows),
            "payload": pa.array(payloads, pa.binary()),
        })

    return ds.map_batches(to_wav, batch_format="pyarrow")


def decode_audio_features(ds, concurrency=(1, 4)):
    """Actor-pool REAL-decode feature stage over a WAV-payload dataset."""
    return ds.map_batches(
        AudioFeatureExtractor,
        batch_format="pyarrow",
        batch_size=BINARY_BATCH_SIZE,
        concurrency=concurrency)


def multimodal_wav_features(sf_dir: str):
    """End-to-end REAL audio decode: synthesize WAVs → decode →
    integer features."""
    return decode_audio_features(synthesize_wav_table(sf_dir))


# --- perceptual-hash near-dup over decoded images ---------------------------

# average-hash grid (8x8 -> 64-bit fingerprint), banded search bands,
# and the accept threshold: hamming <= PHASH_HAM_TAU guarantees (by
# pigeonhole over PHASH_BANDS bands) at least one exactly-equal band
PHASH_GRID = 8
PHASH_BANDS = 4
PHASH_HAM_TAU = 3
# hot-posting policy (CLAUDE.md invariant): a band value shared by
# more docs than this is flat-image boilerplate — dropped from
# candidate generation (pairs via OTHER bands still qualify)
PHASH_BAND_DF_CAP = 64


class PhashExtractor(RealImageDecoder):
    """Actor-pool stage: decode → integer luma → integer average-hash.

    All arithmetic is integer (luma = (299R + 587G + 114B) // 1000;
    bit i set iff block_sum_i * n_blocks > total_sum), so the 64-bit
    fingerprint is bit-deterministic across backends operating on the
    same decoded pixels. Payloads are dropped immediately."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"]
        if isinstance(payloads, pa.ChunkedArray):
            payloads = payloads.combine_chunks()
        hashes = np.zeros(len(payloads), dtype=np.uint64)
        for i, buf in enumerate(payloads):
            arr = self.decode(bytes(buf.as_py())).astype(np.int64)
            if arr.shape[2] >= 3:
                luma = (299 * arr[:, :, 0] + 587 * arr[:, :, 1]
                        + 114 * arr[:, :, 2]) // 1000
            else:
                luma = arr[:, :, 0]
            h, w = luma.shape
            g = PHASH_GRID
            # integer block sums over a gxg grid (trim the remainder
            # so every block has identical area)
            bh, bw = max(h // g, 1), max(w // g, 1)
            t = luma[: bh * g, : bw * g] if h >= g and w >= g \
                else np.resize(luma, (g * bh, g * bw))
            blocks = t.reshape(g, bh, g, bw).sum(axis=(1, 3))
            total = int(blocks.sum())
            bits = (blocks.ravel() * (g * g) > total)
            hashes[i] = np.packbits(
                bits.astype(np.uint8)).view(">u8")[0]
        return pa.table({
            "doc_id": batch["doc_id"],
            "phash": pa.array(hashes.view(np.int64)),
        })


def image_phash_near_dups(sf_dir: str, num_buckets: int = 16):
    """(doc_id, phash, n_candidates, best_other, min_hamming):
    perceptual near-duplicate search over REAL decoded images — the
    image-side analog of SimHash text dedup. Each image's 64-bit
    integer average-hash splits into PHASH_BANDS 16-bit bands; images
    sharing any band value become candidates (pigeonhole: hamming <=
    PHASH_HAM_TAU ⇒ >= 1 equal band, so recall is exact at the
    threshold); candidates verify by popcount. Per image: candidate
    count, the best match (min hamming, ties -> min other id) among
    candidates within the threshold, else (-1, 64). Every image emits
    a row.

    Scale shape: decode+hash is an actor pool (decoder built once per
    actor, payloads dropped at the stage boundary); the exchange ships
    4 slim (band-bucket, band-key, doc, phash) rows per image; band
    buckets expand candidates under PHASH_BAND_DF_CAP (boilerplate
    flat images cannot explode pairs); directed pairs + per-doc spine
    finish in doc-hash buckets (the max_containment_per_doc
    topology)."""
    import ray

    from dataquality_ray.spec import token_hash_u64

    ds = synthesize_png_table(sf_dir).map_batches(
        PhashExtractor,
        batch_format="pyarrow",
        batch_size=BINARY_BATCH_SIZE,
        concurrency=(1, 4))

    nb = num_buckets

    def _doc_bucket(ids: np.ndarray) -> np.ndarray:
        return np.fromiter(
            (token_hash_u64(f"d:{int(i)}") % nb for i in ids),
            dtype=np.int32, count=len(ids))

    _UNION = pa.schema([
        ("kb", pa.int32()), ("kind", pa.int8()),
        ("a", pa.int64()), ("b", pa.int64()), ("c", pa.int64())])

    def bands(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["doc_id"].to_pylist(), dtype=np.int64)
        ph = np.asarray(batch["phash"].to_pylist(),
                        dtype=np.int64).view(np.uint64)
        rows_kb, rows_a, rows_b = [], [], []
        for bi in range(PHASH_BANDS):
            band = ((ph >> np.uint64(16 * bi))
                    & np.uint64(0xFFFF)).astype(np.int64)
            # band key includes the band index so band 0 of one image
            # never collides with band 1 of another
            key = band * PHASH_BANDS + bi
            rows_kb.append((key % nb).astype(np.int32))
            rows_a.append(ids)
            rows_b.append(key)
        k0 = pa.table({
            "kb": pa.array(np.concatenate(rows_kb)),
            "kind": pa.array(
                np.zeros(len(ids) * PHASH_BANDS, dtype=np.int8)),
            "a": pa.array(np.concatenate(rows_a)),
            "b": pa.array(np.concatenate(rows_b)),
            "c": pa.array(np.tile(ph.view(np.int64), PHASH_BANDS)),
        })
        # per-doc spine carrying the phash through to the final stage
        k2 = pa.table({
            "kb": pa.array(_doc_bucket(ids)),
            "kind": pa.array(np.full(len(ids), 2, dtype=np.int8)),
            "a": pa.array(ids),
            "b": pa.array(np.full(len(ids), -1, dtype=np.int64)),
            "c": pa.array(ph.view(np.int64)),
        })
        return pa.concat_tables([k0, k2]).cast(_UNION)

    def band_scan(g: pa.Table) -> pa.Table:
        import polars as pl

        d = pl.from_arrow(g.select(["kind", "a", "b", "c"]))
        cand = (d.filter(pl.col("kind") == 0)
                .unique(["a", "b"])
                .with_columns(m=pl.len().over("b"))
                .filter((pl.col("m") >= 2)
                        & (pl.col("m") <= PHASH_BAND_DF_CAP)))
        if cand.height:
            posts = (cand.sort("a").group_by("b")
                     .agg(cs=pl.col("a").sort(),
                          hs=pl.col("c").sort_by(pl.col("a"))))
            a_p, b_p, ha_p, hb_p = [], [], [], []
            sizes = posts["cs"].list.len().to_numpy().astype(np.int64)
            flat_a = posts["cs"].explode().to_numpy().astype(np.int64)
            flat_h = posts["hs"].explode().to_numpy().astype(np.int64)
            starts = np.zeros(len(sizes) + 1, dtype=np.int64)
            np.cumsum(sizes, out=starts[1:])
            for m in np.unique(sizes):
                sel = np.flatnonzero(sizes == m)
                mat_a = flat_a[starts[sel][:, None] + np.arange(m)]
                mat_h = flat_h[starts[sel][:, None] + np.arange(m)]
                iu, ju = np.triu_indices(int(m), 1)
                a_p.append(mat_a[:, iu].ravel())
                b_p.append(mat_a[:, ju].ravel())
                ha_p.append(mat_h[:, iu].ravel())
                hb_p.append(mat_h[:, ju].ravel())
            aa = np.concatenate(a_p)
            bb = np.concatenate(b_p)
            xor = (np.concatenate(ha_p).view(np.uint64)
                   ^ np.concatenate(hb_p).view(np.uint64))
            # vectorized popcount (numpy<2 has no bitwise_count)
            ham = np.unpackbits(
                xor.view(np.uint8).reshape(-1, 8),
                axis=1).sum(axis=1).astype(np.int64)
            # dedup pairs found via multiple bands (same hamming)
            key = np.stack([aa, bb], axis=1)
            uk, idx = np.unique(key, axis=0, return_index=True)
            aa, bb, ham = uk[:, 0], uk[:, 1], ham[idx]
            da = np.concatenate([aa, bb])
            do = np.concatenate([bb, aa])
            dh = np.concatenate([ham, ham])
            k0 = pa.table({
                "kb": pa.array(_doc_bucket(da)),
                "kind": pa.array(np.zeros(len(da), dtype=np.int8)),
                "a": pa.array(da),
                "b": pa.array(do),
                "c": pa.array(dh),
            })
        else:
            k0 = _UNION.empty_table()
        fwd = g.filter(
            pa.compute.not_equal(g["kind"], 0)).select(
            ["kb", "kind", "a", "b", "c"])
        return pa.concat_tables([k0.cast(_UNION), fwd.cast(_UNION)])

    def doc_final(g: pa.Table) -> pa.Table:
        import polars as pl

        d = pl.from_arrow(g.select(["kind", "a", "b", "c"]))
        spine = (d.filter(pl.col("kind") == 2)
                 .group_by("a").agg(ph=pl.col("c").first()))
        dirx = (d.filter(pl.col("kind") == 0)
                .unique(["a", "b"], keep="first"))
        ncand = dirx.group_by("a").agg(
            nc=pl.len().cast(pl.Int64))
        best = (dirx.filter(pl.col("c") <= PHASH_HAM_TAU)
                .sort(["a", "c", "b"])
                .unique(subset="a", keep="first"))
        out = (spine.join(ncand, on="a", how="left")
               .join(best.select(["a", "b", "c"]), on="a", how="left")
               .with_columns(
                   n_candidates=pl.col("nc").fill_null(0),
                   best_other=pl.col("b").fill_null(-1),
                   min_hamming=pl.col("c").fill_null(64)))
        return (out.rename({"a": "doc_id", "ph": "phash"})
                .select(["doc_id", "phash", "n_candidates",
                         "best_other", "min_hamming"])
                .to_arrow().cast(pa.schema([
                    ("doc_id", pa.int64()), ("phash", pa.int64()),
                    ("n_candidates", pa.int64()),
                    ("best_other", pa.int64()),
                    ("min_hamming", pa.int64())])))

    return (ds.map_batches(bands, batch_format="pyarrow")
            .groupby("kb").map_groups(band_scan, batch_format="pyarrow")
            .groupby("kb").map_groups(doc_final, batch_format="pyarrow"))
