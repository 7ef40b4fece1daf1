"""Deterministic synthetic transcript generator (schemas in FIXTURES.md §1).

Produces the authoritative input table
``(conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp[us])`` as a pure function of ``seed`` — byte-identical for the
oracle and the Ray pipeline. Turn texts are drawn from labeled generator
classes (clean per-language prose, PII-injected, too-short, repetitive,
symbol-heavy, boilerplate, exact-dup, near-dup, empty) so every quality rule
and dedup path has known ground truth; the label itself is NOT emitted — the
oracle derives all labels from the text alone, like the real pipeline.

RNG strategy: one numpy Generator feeds a buffered uniform stream
(vectorized draws, scalar consumes) so generating 10^6 turns costs tens of
seconds, not minutes — the bench corpus is built once and cached on disk.
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from dataquality_ray.config import DEFAULT_CONFIG, PipelineConfig
from dataquality_ray.functions.corpora import LANG_CORPORA
from dataquality_ray.spec import BOILERPLATE_PHRASES, TOXICITY_TERMS

_FIXTURE_VERSION = "v3"   # bump when generator output changes

# generator class weights — must sum to 1.0
_CLASSES = [
    ("clean_en", 0.47),
    ("clean_other", 0.12),
    ("pii", 0.08),
    ("short", 0.06),
    ("repetitive", 0.05),
    ("symbol", 0.05),
    ("boilerplate", 0.04),
    ("toxic", 0.03),
    ("exact_dup", 0.04),
    ("near_dup", 0.03),
    ("empty", 0.03),
]
_CLASS_NAMES = [c for c, _ in _CLASSES]
_CLASS_CUM = np.cumsum([w for _, w in _CLASSES])

_OTHER_LANGS = [l for l in sorted(LANG_CORPORA) if l != "en"]
_TOOLS = ["search", "exec", "browse", "calc"]
_FILLER_WORDS = [
    "system", "value", "result", "update", "status", "report", "check",
    "window", "record", "signal", "branch", "metric", "series", "output",
]
_SYMBOLS = list("#$%^&*{}[]<>~`|\\=+@!?;:")


class _FastRand:
    """Buffered uniform stream over one numpy Generator — deterministic,
    ~20× cheaper per draw than Generator method calls."""

    __slots__ = ("rng", "buf", "i", "chunk")

    def __init__(self, rng: np.random.Generator, chunk: int = 1 << 16):
        self.rng = rng
        self.chunk = chunk
        self.buf = rng.integers(0, 1 << 32, size=chunk, dtype=np.uint64)
        self.i = 0

    def _u32(self) -> int:
        if self.i >= self.chunk:
            self.buf = self.rng.integers(0, 1 << 32, size=self.chunk,
                                         dtype=np.uint64)
            self.i = 0
        v = int(self.buf[self.i])
        self.i += 1
        return v

    def randint(self, lo: int, hi: int) -> int:
        """Uniform int in [lo, hi)."""
        return lo + self._u32() % (hi - lo)

    def random(self) -> float:
        return self._u32() / 4294967296.0

    def pick(self, seq):
        return seq[self._u32() % len(seq)]


def _pii_strings(fr: _FastRand) -> List[str]:
    d = lambda n: "".join(str(fr.randint(0, 10)) for _ in range(n))
    email = f"user{fr.randint(0, 10000)}@example{fr.randint(0, 100)}.com"
    phone = fr.pick([
        f"({d(3)}) {d(3)}-{d(4)}",
        f"{d(3)}-{d(3)}-{d(4)}",
        f"{d(3)}.{d(3)}.{d(4)}",
    ])
    ssn = f"{d(3)}-{d(2)}-{d(4)}"
    return [email, phone, ssn]


def _clean_text(fr: _FastRand, lang: str) -> str:
    corpus = LANG_CORPORA[lang]
    n = fr.randint(1, 4)
    return " ".join(fr.pick(corpus) for _ in range(n))


def _make_text(cls: str, fr: _FastRand, prev_clean: List[str]) -> str:
    if cls == "clean_en":
        return _clean_text(fr, "en")
    if cls == "clean_other":
        return _clean_text(fr, fr.pick(_OTHER_LANGS))
    if cls == "pii":
        words = _clean_text(fr, "en").split(" ")
        for pii in _pii_strings(fr)[: fr.randint(1, 4)]:
            words.insert(fr.randint(0, len(words) + 1), pii)
        return " ".join(words)
    if cls == "short":
        return " ".join(fr.pick(_FILLER_WORDS)
                        for _ in range(fr.randint(1, 3)))
    if cls == "repetitive":
        return " ".join([fr.pick(_FILLER_WORDS)] * fr.randint(20, 60))
    if cls == "symbol":
        base = _clean_text(fr, "en").split(" ")[:8]
        syms = "".join(fr.pick(_SYMBOLS)
                       for _ in range(fr.randint(30, 80)))
        base.insert(fr.randint(0, len(base) + 1), syms)
        return " ".join(base)
    if cls == "boilerplate":
        phrase = fr.pick(BOILERPLATE_PHRASES)
        return f"{_clean_text(fr, 'en')} {phrase.capitalize()}."
    if cls == "toxic":
        words = _clean_text(fr, "en").split(" ")
        for _ in range(fr.randint(1, 3)):
            words.insert(fr.randint(0, len(words) + 1),
                         fr.pick(TOXICITY_TERMS))
        return " ".join(words)
    if cls == "exact_dup" and prev_clean:
        return fr.pick(prev_clean)
    if cls == "near_dup" and prev_clean:
        base = fr.pick(prev_clean).split(" ")
        if base:
            base[fr.randint(0, len(base))] = fr.pick(_FILLER_WORDS)
        return " ".join(base)
    if cls == "empty":
        return ""
    return _clean_text(fr, "en")  # dup classes before any clean text


def generate_transcripts(n_turns: int, seed: int = 42,
                         cfg: PipelineConfig = DEFAULT_CONFIG) -> pa.Table:
    """Generate ~n_turns transcript rows (exact count may differ by < one
    conversation's length). Pure function of (n_turns, seed, cfg)."""
    rng = np.random.default_rng(seed)
    fr = _FastRand(rng)
    now_us = int(np.datetime64(cfg.reference_now, "us").astype(np.int64))

    conv_ids: List[str] = []
    turn_idxs: List[int] = []
    roles: List[str] = []
    texts: List[str] = []
    tools: List[str] = []
    ts_us: List[int] = []

    prev_clean: List[str] = []
    total = 0
    conv_no = 0
    while total < n_turns:
        conv_id = f"conv-{conv_no:08d}"
        # Zipf-ish conversation length via inverse-power sampling, clipped;
        # ~1% hot conversations (skew knob)
        u = max(fr.random(), 1e-9)
        size = int(min(u ** -0.67, 60.0)) + 1
        if fr.random() < 0.01:
            size = fr.randint(200, 400)
        start_days = fr.random() * 60.0
        t = now_us - int(start_days * 86400 * 1e6)
        for turn in range(size):
            if turn == 0 and fr.random() < 0.2:
                role = "system"
            elif fr.random() < 0.1:
                role = "tool"
            else:
                role = "user" if turn % 2 == 0 else "assistant"
            ci = int(np.searchsorted(_CLASS_CUM, fr.random(), side="right"))
            cls = _CLASS_NAMES[min(ci, len(_CLASS_NAMES) - 1)]
            text = _make_text(cls, fr, prev_clean)
            if cls in ("clean_en", "clean_other") and len(prev_clean) < 5000:
                prev_clean.append(text)
            conv_ids.append(conv_id)
            turn_idxs.append(turn)
            roles.append(role)
            texts.append(text)
            tools.append(fr.pick(_TOOLS) if role == "tool" else "")
            ts_us.append(t)
            t += fr.randint(1, 300) * 1_000_000
        total += size
        conv_no += 1

    return pa.table({
        "conv_id": pa.array(conv_ids, pa.string()),
        "turn_idx": pa.array(turn_idxs, pa.int32()),
        "role": pa.array(roles, pa.string()),
        "text": pa.array(texts, pa.string()),
        "tool": pa.array(tools, pa.string()),
        "ts": pa.array(np.array(ts_us, dtype=np.int64).view("datetime64[us]")),
    })


def transcripts_path(n_turns: int, seed: int = 42,
                     root: str = "/tmp/dq_transcripts",
                     num_files: Optional[int] = None) -> str:
    """Write (once, cached) the fixture to a multi-file Parquet dir and
    return the path. Multiple files → parallel read tasks in Ray Data."""
    path = os.path.join(root, f"n{n_turns}_s{seed}_{_FIXTURE_VERSION}")
    done = os.path.join(path, "_DONE")
    if os.path.exists(done):
        return path
    table = generate_transcripts(n_turns, seed)
    if num_files is None:
        num_files = max(1, min(64, n_turns // 15_000))
    os.makedirs(path, exist_ok=True)
    rows = table.num_rows
    step = (rows + num_files - 1) // num_files
    for i in range(num_files):
        chunk = table.slice(i * step, step)
        if chunk.num_rows:
            pq.write_table(chunk, os.path.join(path, f"part-{i:04d}.parquet"))
    with open(done, "w") as f:
        f.write("ok")
    return path


def scale_for_sf_dir(sf_dir: str) -> int:
    """Map a driver sf dir to a transcript fixture size (turn count)."""
    name = os.path.basename(sf_dir.rstrip("/"))
    return {
        "sf0.001": 2_000,
        "sf0.01": 20_000,
        "sf0.1": 4_000_000,
    }.get(name, 20_000)
