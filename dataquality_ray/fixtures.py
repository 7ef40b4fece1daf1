"""Deterministic synthetic transcript generator (schemas in FIXTURES.md §1).

Produces the authoritative input table
``(conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp[us])`` as a pure function of ``seed`` — byte-identical for the
oracle and the Ray pipeline. Turn texts are drawn from labeled generator
classes (clean per-language prose, PII-injected, too-short, repetitive,
symbol-heavy, boilerplate, exact-dup, near-dup, empty) so every quality rule
and dedup path has known ground truth; the label itself is NOT emitted — the
oracle derives all labels from the text alone, like the real pipeline.
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from dataquality_ray.config import DEFAULT_CONFIG, PipelineConfig
from dataquality_ray.functions.corpora import LANG_CORPORA
from dataquality_ray.spec import BOILERPLATE_PHRASES

# generator class weights — must sum to 1.0
_CLASSES = [
    ("clean_en", 0.50),
    ("clean_other", 0.12),
    ("pii", 0.08),
    ("short", 0.06),
    ("repetitive", 0.05),
    ("symbol", 0.05),
    ("boilerplate", 0.04),
    ("exact_dup", 0.04),
    ("near_dup", 0.03),
    ("empty", 0.03),
]
_CLASS_NAMES = [c for c, _ in _CLASSES]
_CLASS_W = np.array([w for _, w in _CLASSES])

_OTHER_LANGS = [l for l in sorted(LANG_CORPORA) if l != "en"]
_TOOLS = ["search", "exec", "browse", "calc"]
_FILLER_WORDS = [
    "system", "value", "result", "update", "status", "report", "check",
    "window", "record", "signal", "branch", "metric", "series", "output",
]
_SYMBOLS = list("#$%^&*{}[]<>~`|\\=+@!?;:")


def _pii_strings(rng: np.random.Generator) -> List[str]:
    d = lambda n: "".join(str(rng.integers(0, 10)) for _ in range(n))
    email = f"user{rng.integers(0, 10000)}@example{rng.integers(0, 100)}.com"
    phone = rng.choice([
        f"({d(3)}) {d(3)}-{d(4)}",
        f"{d(3)}-{d(3)}-{d(4)}",
        f"{d(3)}.{d(3)}.{d(4)}",
    ])
    ssn = f"{d(3)}-{d(2)}-{d(4)}"
    return [email, str(phone), ssn]


def _clean_text(rng: np.random.Generator, lang: str) -> str:
    corpus = LANG_CORPORA[lang]
    n = int(rng.integers(1, 4))
    idx = rng.integers(0, len(corpus), size=n)
    return " ".join(corpus[i] for i in idx)


def _make_text(cls: str, rng: np.random.Generator,
               prev_clean: List[str]) -> str:
    if cls == "clean_en":
        return _clean_text(rng, "en")
    if cls == "clean_other":
        lang = _OTHER_LANGS[int(rng.integers(0, len(_OTHER_LANGS)))]
        return _clean_text(rng, lang)
    if cls == "pii":
        base = _clean_text(rng, "en")
        words = base.split(" ")
        for pii in _pii_strings(rng)[: int(rng.integers(1, 4))]:
            pos = int(rng.integers(0, len(words) + 1))
            words.insert(pos, pii)
        return " ".join(words)
    if cls == "short":
        k = int(rng.integers(1, 3))
        return " ".join(
            _FILLER_WORDS[int(rng.integers(0, len(_FILLER_WORDS)))]
            for _ in range(k)
        )
    if cls == "repetitive":
        w = _FILLER_WORDS[int(rng.integers(0, len(_FILLER_WORDS)))]
        return " ".join([w] * int(rng.integers(20, 60)))
    if cls == "symbol":
        base = _clean_text(rng, "en").split(" ")[:8]
        syms = "".join(
            _SYMBOLS[int(rng.integers(0, len(_SYMBOLS)))]
            for _ in range(int(rng.integers(30, 80)))
        )
        pos = int(rng.integers(0, len(base) + 1))
        base.insert(pos, syms)
        return " ".join(base)
    if cls == "boilerplate":
        phrase = BOILERPLATE_PHRASES[int(rng.integers(0, len(BOILERPLATE_PHRASES)))]
        return f"{_clean_text(rng, 'en')} {phrase.capitalize()}."
    if cls == "exact_dup" and prev_clean:
        return prev_clean[int(rng.integers(0, len(prev_clean)))]
    if cls == "near_dup" and prev_clean:
        base = prev_clean[int(rng.integers(0, len(prev_clean)))].split(" ")
        if base:
            pos = int(rng.integers(0, len(base)))
            base[pos] = _FILLER_WORDS[int(rng.integers(0, len(_FILLER_WORDS)))]
        return " ".join(base)
    if cls == "empty":
        return ""
    # dup classes before any clean text exists → fall back to clean
    return _clean_text(rng, "en")


def generate_transcripts(n_turns: int, seed: int = 42,
                         cfg: PipelineConfig = DEFAULT_CONFIG) -> pa.Table:
    """Generate ~n_turns transcript rows (exact count may differ by < one
    conversation's length). Pure function of (n_turns, seed, cfg)."""
    rng = np.random.default_rng(seed)
    now_us = np.datetime64(cfg.reference_now, "us").astype(np.int64)

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
        # Zipf-skewed conversation length, clipped; ~1% hot conversations
        size = int(min(rng.zipf(1.5) + 1, 60))
        if rng.random() < 0.01:
            size = int(rng.integers(200, 400))  # hot conversation (skew knob)
        # conversation start: up to 60 days before reference "now"
        start_days = float(rng.uniform(0, 60))
        t = now_us - int(start_days * 86400 * 1e6)
        for turn in range(size):
            if turn == 0 and rng.random() < 0.2:
                role = "system"
            elif rng.random() < 0.1:
                role = "tool"
            else:
                role = "user" if turn % 2 == 0 else "assistant"
            cls = _CLASS_NAMES[int(rng.choice(len(_CLASS_NAMES), p=_CLASS_W))]
            text = _make_text(cls, rng, prev_clean)
            if cls in ("clean_en", "clean_other") and len(prev_clean) < 5000:
                prev_clean.append(text)
            conv_ids.append(conv_id)
            turn_idxs.append(turn)
            roles.append(role)
            texts.append(text)
            tools.append(
                _TOOLS[int(rng.integers(0, len(_TOOLS)))] if role == "tool" else ""
            )
            ts_us.append(t)
            t += int(rng.integers(1, 300)) * 1_000_000
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
    path = os.path.join(root, f"n{n_turns}_s{seed}")
    done = os.path.join(path, "_DONE")
    if os.path.exists(done):
        return path
    table = generate_transcripts(n_turns, seed)
    if num_files is None:
        num_files = max(1, min(64, n_turns // 25_000))
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
        "sf0.1": 200_000,
    }.get(name, 20_000)
