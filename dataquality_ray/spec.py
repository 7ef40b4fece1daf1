"""Scalar semantics spec — the single source of truth for every per-turn rule.

Both the vectorized Ray stages (``dataquality_ray.stages``) and the
single-process oracle labeler (``dataquality_ray.oracle``) implement exactly
these functions; tests assert the vectorized kernels agree with these scalar
definitions element-for-element. Everything here is a pure function of its
inputs (plus the frozen ``PipelineConfig``), uses integer arithmetic where a
DuckDB SQL oracle must reproduce it exactly, and sticks to RE2-compatible
regex syntax (no lookaround, no backreferences) so the same pattern string
runs identically under Python ``re``, pyarrow's RE2 kernels and DuckDB.

Reference behaviors being re-expressed (file:line in /root/reference):
- 17 canonical dimension names + clamp/default semantics:
  app/services/metadata.py:151-180
- overall score = round(mean(17 dims)): app/services/metadata.py:419-421
- action thresholds 85/70/60: app/services/metadata.py:425-433
- timeliness cap at 60 beyond 30 days: app/services/metadata.py:398-407
- token Jaccard on ``\\W+``-split lowered tokens: app/services/metadata.py:218-237
- PII risk flagging (LLM-prompted in the reference, bedrock.py:211-214) →
  deterministic regex scrub here.
"""

from __future__ import annotations

import hashlib
import re
from typing import Dict, List, Tuple

from dataquality_ray.config import DEFAULT_CONFIG, PipelineConfig

# ---------------------------------------------------------------------------
# PII scrub
# ---------------------------------------------------------------------------
# RE2-safe patterns, applied IN THIS ORDER (email, ssn, phone) with global
# (non-overlapping, left-to-right) replacement. Order matters: SSN (3-2-4)
# is replaced before phone (3-3-4 / (ddd) ddd-dddd) so digit runs are
# consumed by the more specific pattern first.
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
SSN_PATTERN = r"\b\d{3}-\d{2}-\d{4}\b"
PHONE_PATTERN = r"\(\d{3}\)[ ]?\d{3}[-.]\d{4}|\b\d{3}[-. ]\d{3}[-.]\d{4}\b"

EMAIL_TOKEN = "<EMAIL>"
SSN_TOKEN = "<SSN>"
PHONE_TOKEN = "<PHONE>"

# (name, pattern, replacement) — applied sequentially.
PII_RULES: List[Tuple[str, str, str]] = [
    ("email", EMAIL_PATTERN, EMAIL_TOKEN),
    ("ssn", SSN_PATTERN, SSN_TOKEN),
    ("phone", PHONE_PATTERN, PHONE_TOKEN),
]

# re.ASCII everywhere: RE2 (pyarrow, DuckDB) treats \s, \w, \b as ASCII
# classes; Python re defaults to Unicode. Pinning Python to ASCII keeps the
# oracle and the vectorized kernels bit-identical on unicode whitespace
# (NEL, NBSP, ...) — found by hypothesis (tests/test_property.py).
_PII_COMPILED = [(name, re.compile(pat, re.ASCII), repl)
                 for name, pat, repl in PII_RULES]


def scrub_text(text: str) -> Tuple[str, Dict[str, int]]:
    """Scrub PII from one text; returns (scrubbed, {email,ssn,phone} counts)."""
    counts: Dict[str, int] = {}
    for name, rx, repl in _PII_COMPILED:
        text, n = rx.subn(repl, text)
        counts[name] = n
    return text, counts


# ---------------------------------------------------------------------------
# Tokenization (reference analog: re.split(r"\W+", lower) metadata.py:218-226)
# ---------------------------------------------------------------------------
# ASCII alnum runs over lowercased text — identical under Python re, RE2 and
# DuckDB ``regexp_extract_all(lower(text), '[a-z0-9]+')``.
TOKEN_PATTERN = r"[a-z0-9]+"
_TOKEN_RX = re.compile(TOKEN_PATTERN, re.ASCII)

# GPT-style pre-tokenizer, simplified to ASCII and quote-free so the
# IDENTICAL pattern runs in Python re, polars (Rust regex) and DuckDB
# (RE2) — all three use leftmost-first alternation, so counts agree
# exactly. Applied to lowercased text; whitespace tokens are the \S+
# runs counted separately.
BPE_TOKEN_PATTERN = r" ?[a-z]+| ?[0-9]+| ?[^\sa-z0-9]+"
WS_TOKEN_PATTERN = r"\S+"


def tokenize(text: str) -> List[str]:
    return _TOKEN_RX.findall(text.lower())


# Whitespace is an EXPLICIT class: Python's ASCII \s includes \v but RE2's
# \s does not — an explicit set is identical in Python, RE2 and DuckDB
# (found by hypothesis on '\x0b').
WS_CLASS = r"[\t\n\v\f\r ]"
WS_PLUS_PATTERN = WS_CLASS + "+"

# Symbols: ASCII classes only (RE2 ``\w`` is ASCII); non-Latin letters count
# as symbols — documented behavior; language dims carry the nuance.
SYMBOL_PATTERN = r"[^A-Za-z0-9\t\n\v\f\r ]"
_SYMBOL_RX = re.compile(SYMBOL_PATTERN, re.ASCII)


def count_symbols(text: str) -> int:
    return len(_SYMBOL_RX.findall(text))


# ---------------------------------------------------------------------------
# Toxicity scrub/score (north_rule "PII/toxicity-scrub"; reference analog:
# the LLM rubric's risk flagging, bedrock.py:211-214,250 — re-expressed as
# a deterministic lexicon so the score is reproducible and SQL-checkable)
# ---------------------------------------------------------------------------
# Frozen phrase lexicon. Entries are lowercase ASCII, mutually
# non-overlapping (no entry is a substring of another), matched with \b
# word boundaries on LOWERCASED text — lowercasing on both sides (Python
# .lower() / pyarrow utf8_lower / DuckDB lower) sidesteps RE2-vs-re
# case-folding divergence on exotic unicode.
TOXICITY_TERMS: List[str] = [
    "you idiot",
    "you moron",
    "shut up",
    "total garbage",
    "absolute trash",
    "nobody cares",
    "worthless",
    "pathetic excuse",
    "i hate you",
    "dumbest thing",
]

TOXICITY_PATTERN = r"\b(?:" + "|".join(
    re.escape(p) for p in TOXICITY_TERMS) + r")\b"
_TOXICITY_RX = re.compile(TOXICITY_PATTERN, re.ASCII)

TOX_TOKEN = "<TOX>"


def toxicity_count(text: str) -> int:
    """Number of toxic-phrase hits in the lowercased text."""
    return len(_TOXICITY_RX.findall(text.lower()))


def toxicity_score(n_hits: int, cfg: PipelineConfig = DEFAULT_CONFIG) -> int:
    """max(0, 100 - toxicity_penalty_mult * n_hits) — integer, SQL-exact."""
    return max(0, 100 - cfg.toxicity_penalty_mult * n_hits)


def mask_toxicity(text: str) -> str:
    """Replace toxic phrases with TOX_TOKEN in the LOWERCASED text (the
    deterministic "toxicity scrub"; lowercasing is part of the contract —
    same output from Python re, pyarrow RE2 and DuckDB regexp_replace)."""
    return _TOXICITY_RX.sub(TOX_TOKEN, text.lower())


# ---------------------------------------------------------------------------
# Boilerplate phrases (lowercase substring match, any hit → score 0)
# ---------------------------------------------------------------------------
BOILERPLATE_PHRASES: List[str] = [
    "lorem ipsum",
    "click here to unsubscribe",
    "terms and conditions apply",
    "this message was generated automatically",
    "all rights reserved",
    "please do not reply to this email",
    "to whom it may concern",
    "this is an automated response",
]

# One RE2-safe alternation usable by pyarrow match_substring_regex and DuckDB
# regexp_matches on lower(text).
BOILERPLATE_PATTERN = "|".join(re.escape(p) for p in BOILERPLATE_PHRASES)
_BOILERPLATE_RX = re.compile(BOILERPLATE_PATTERN)


def is_boilerplate(text: str) -> bool:
    return _BOILERPLATE_RX.search(text.lower()) is not None


# ---------------------------------------------------------------------------
# Heuristic dimension scores — integer arithmetic only (SQL-exact)
# ---------------------------------------------------------------------------

def length_score(n_chars: int, cfg: PipelineConfig = DEFAULT_CONFIG) -> int:
    """min(100, 100 * n_chars // min_len_chars) — full credit at >= 20 chars."""
    return min(100, (100 * n_chars) // cfg.min_len_chars)


def repetition_score(n_distinct: int, n_tokens: int) -> int:
    """Type-token ratio as an integer percent; empty text scores 100."""
    if n_tokens == 0:
        return 100
    return (100 * n_distinct) // n_tokens


def symbol_score(n_symbols: int, n_chars: int,
                 cfg: PipelineConfig = DEFAULT_CONFIG) -> int:
    """100 - min(100, 300 * n_symbols // n_chars); empty text scores 100."""
    if n_chars == 0:
        return 100
    return 100 - min(100, (cfg.symbol_penalty_mult * n_symbols) // n_chars)


def boilerplate_score(hit: bool) -> int:
    return 0 if hit else 100


def lang_score(pred_lang: str, cfg: PipelineConfig = DEFAULT_CONFIG) -> int:
    return 100 if pred_lang == cfg.target_lang else cfg.lang_other_score


def ppl_score(log2_ppl: float, cfg: PipelineConfig = DEFAULT_CONFIG) -> int:
    """clamp(0, 100, a - b*log2_ppl) with floor — monotone in perplexity."""
    raw = cfg.ppl_score_a - int(cfg.ppl_score_b * log2_ppl)
    return max(0, min(100, raw))


def timeliness_score(age_days: int, cfg: PipelineConfig = DEFAULT_CONFIG) -> int:
    """Base 100, capped at 60 when older than 30 days (metadata.py:398-407)."""
    if age_days > cfg.timeliness_max_age_days:
        return min(100, cfg.timeliness_cap)
    return 100


# ---------------------------------------------------------------------------
# 17 canonical dimensions (reference: metadata.py:153-158) and the fixed
# mapping from our computed signals onto them.
# ---------------------------------------------------------------------------
DIMENSION_NAMES: List[str] = [
    "Accuracy", "Completeness", "Consistency", "Timeliness", "Validity",
    "Uniqueness", "Reliability", "Relevance", "Accessibility", "Precision",
    "Integrity", "Conformity", "Interpretability", "Traceability",
    "Credibility", "Fitness_for_Use", "Value",
]

# signal keys available: length, repetition, symbol, boilerplate, lang, ppl,
# timeliness, toxicity. Each canonical dim maps to one deterministic
# expression. Any change here MUST be mirrored in
# stages/decision.py::dimension_matrix (tests enforce agreement).
def dimension_scores(sig: Dict[str, int]) -> Dict[str, int]:
    """Map computed signals onto the 17 canonical dimension names.

    ``sig`` holds integer scores for: length, repetition, symbol,
    boilerplate, lang, ppl, timeliness, toxicity.
    """
    heur_mean = (sig["length"] + sig["repetition"] + sig["symbol"]
                 + sig["boilerplate"]) // 4
    model_mean = (sig["lang"] + sig["ppl"]) // 2
    return {
        "Accuracy": sig["ppl"],
        "Completeness": sig["length"],
        "Consistency": (sig["repetition"] + sig["symbol"]) // 2,
        "Timeliness": sig["timeliness"],
        "Validity": sig["symbol"],
        "Uniqueness": sig["repetition"],
        "Reliability": sig["ppl"],
        "Relevance": sig["boilerplate"],
        "Accessibility": sig["lang"],
        "Precision": sig["symbol"],
        "Integrity": sig["length"],
        "Conformity": sig["boilerplate"],
        "Interpretability": sig["lang"],
        "Traceability": 100,   # conv_id/turn_idx lineage always present
        "Credibility": (sig["ppl"] + sig["toxicity"]) // 2,
        "Fitness_for_Use": heur_mean,
        "Value": model_mean,
    }


DIM_EVIDENCE_TEMPLATES: Dict[str, str] = {
    "Accuracy": "n-gram LM perplexity score {score}",
    "Completeness": "length score {score}",
    "Consistency": "mean of repetition and symbol scores: {score}",
    "Timeliness": "timeliness score {score} (age rule: >30d caps at 60)",
    "Validity": "symbol-density score {score}",
    "Uniqueness": "type-token-ratio score {score}",
    "Reliability": "n-gram LM perplexity score {score}",
    "Relevance": "boilerplate score {score}",
    "Accessibility": "language-id score {score}",
    "Precision": "symbol-density score {score}",
    "Integrity": "length score {score}",
    "Conformity": "boilerplate score {score}",
    "Interpretability": "language-id score {score}",
    "Traceability": "conv_id/turn_idx lineage present",
    "Credibility": "mean of perplexity and toxicity scores: {score}",
    "Fitness_for_Use": "mean of heuristic scores: {score}",
    "Value": "mean of model scores: {score}",
}


def overall_score(dims: Dict[str, int]) -> int:
    """round(mean(17 dims)) — reference metadata.py:419-421.

    Uses Python ``round`` (banker's); the oracle and pipeline share this
    exact function so they agree bit-for-bit.
    """
    vals = [dims[name] for name in DIMENSION_NAMES]
    return round(sum(vals) / len(vals))


def derive_action(overall: int, cfg: PipelineConfig = DEFAULT_CONFIG) -> str:
    return cfg.action_for(overall)


def keep_decision(overall: int, cfg: PipelineConfig = DEFAULT_CONFIG) -> bool:
    """keep == action in {KEEP, REVIEW} == overall >= 70."""
    return overall >= cfg.keep_min_overall


# ---------------------------------------------------------------------------
# Hashing / sketches — all seeds and parameters are frozen constants
# ---------------------------------------------------------------------------
_WS_RX = re.compile(WS_PLUS_PATTERN)
EDGE_WS_PATTERN = f"^{WS_CLASS}+|{WS_CLASS}+$"   # RE2-safe trim
_EDGE_WS_RX = re.compile(EDGE_WS_PATTERN)


def normalize_for_hash(text: str) -> str:
    """Lowercase, ASCII-whitespace trim, collapse — the exact-dup
    equivalence key. Regex-based trim (not str.strip) so Python, RE2 and
    DuckDB agree on control characters like \\x1c-\\x1f."""
    return _WS_RX.sub(" ", _EDGE_WS_RX.sub("", text.lower()))


def content_hash(text: str) -> str:
    """md5 hex of the normalized text (md5 exists in DuckDB too)."""
    return hashlib.md5(normalize_for_hash(text).encode("utf-8")).hexdigest()


def token_hash_u64(token: str) -> int:
    """Stable 64-bit token hash: first 8 md5 bytes, little-endian
    (PYTHONHASHSEED-independent). md5 so the DuckDB oracle can compute
    the IDENTICAL value as ``md5_number_upper(token)`` — which makes the
    whole sketch stack (MinHash, SimHash, LSH bands) SQL-derivable."""
    return int.from_bytes(
        hashlib.md5(token.encode("utf-8")).digest()[:8], "little")


def minhash_params(n_perms: int, seed: int):
    """Deterministic (a, b) arrays for n_perms multiplicative hash functions
    over uint64 (h -> a*h + b mod 2^64, a odd). Frozen by seed."""
    import numpy as np
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 1 << 63, size=n_perms, dtype=np.uint64) * 2 + 1
    b = rng.integers(0, 1 << 63, size=n_perms, dtype=np.uint64)
    return a, b


def jaccard(set_a, set_b) -> float:
    """Exact Jaccard over token sets (reference metadata.py:232-237)."""
    if not set_a and not set_b:
        return 1.0
    if not set_a or not set_b:
        return 0.0
    inter = len(set_a & set_b)
    return inter / (len(set_a) + len(set_b) - inter)


# Rolling-fingerprint constants: multiplicative-accumulate (NOT FNV's
# multiply-XOR) — chosen because h_n = OFF·p^n + Σ c_i·p^(n-1-i) (mod 2^64)
# vectorizes as a polynomial over codepoint arrays (numpy uint64 wraparound
# IS mod-2^64 arithmetic; see stages/dedup.fingerprint_batch) and is
# SQL-expressible via DuckDB list_reduce with a HUGEINT accumulator
# (p < 2^20 keeps h·p < 2^84 inside HUGEINT range).
FP_MULT = 1000003
FP_OFFSET = 1469598103934665603   # FNV offset basis, reused as init


def rolling_fingerprint(text: str) -> int:
    """64-bit polynomial rolling hash of the normalized text:
    h = OFFSET; per codepoint: h = (h * FP_MULT + cp) mod 2^64."""
    h = FP_OFFSET
    for ch in normalize_for_hash(text):
        h = (h * FP_MULT + ord(ch)) & 0xFFFFFFFFFFFFFFFF
    return h


def order_key(conv_id: str, turn_idx: int) -> str:
    """Lexicographic composite key preserving (conv_id, turn_idx) order."""
    return f"{conv_id}#{turn_idx:08d}"


# ---------------------------------------------------------------------------
# Entity / key-term extraction (reference analog: the LLM's entity
# metadata {people, organizations, locations, topics, key_terms},
# bedrock.py:225-232, consumed by the metadata-similarity dedup gate,
# metadata.py:218-243 — re-expressed as deterministic extraction).
# ---------------------------------------------------------------------------
# Capitalized spans (Title-case runs) as entity mentions. ASCII classes;
# \b is ASCII under Python re.ASCII / RE2 / DuckDB. Vectorized paths that
# go through Rust's regex crate (polars) must prefix "(?-u)" to force the
# same ASCII \b semantics (rust \b is unicode by default).
ENTITY_PATTERN = r"\b[A-Z][a-z]+(?: [A-Z][a-z]+)*\b"
_ENTITY_RX = re.compile(ENTITY_PATTERN, re.ASCII)


def extract_entities(text: str) -> List[str]:
    """All capitalized-span mentions, in document order (may repeat)."""
    return _ENTITY_RX.findall(text)


# Frozen key-term stoplist: every stopword-marker word (all languages)
# plus common English fillers. Key terms = non-stop tokens ranked by
# (term frequency desc, term asc), top KEY_TERMS_TOP_K.
KEY_TERMS_TOP_K = 5


def _build_stoplist() -> Tuple[str, ...]:
    base = {m for _, markers in STOPWORD_MARKERS for m in markers}
    base |= {"a", "an", "i", "it", "is", "are", "was", "be", "as", "at",
             "by", "he", "she", "they", "we", "you", "of", "to", "in",
             "and", "the", "that", "for", "with", "on", "this", "from",
             "or", "but", "so", "if"}
    return tuple(sorted(base))


def key_terms(text: str, k: int = KEY_TERMS_TOP_K
              ) -> List[Tuple[str, int, int]]:
    """Top-k (term, tf, rank) non-stopword tokens, ties broken
    alphabetically — deterministic and SQL-expressible (row_number over
    tf desc, term asc)."""
    from collections import Counter
    counts = Counter(t for t in tokenize(text)
                     if t not in _KEY_TERM_STOPSET)
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return [(t, n, i + 1) for i, (t, n) in enumerate(ranked)]


# ---------------------------------------------------------------------------
# Stopword-marker language ID — the SQL-expressible langid variant.
# (The char-n-gram model in functions/langid.py is the engine's real
# classifier; this pinned marker rule exists so a DuckDB oracle can verify
# the distributed implementation bit-for-bit.)
# ---------------------------------------------------------------------------
STOPWORD_MARKERS: List[Tuple[str, Tuple[str, ...]]] = [
    ("en", ("the", "and", "of", "to", "is", "in", "that", "it")),
    ("es", ("el", "los", "las", "que", "una", "por", "para", "con")),
    ("de", ("der", "die", "das", "und", "ist", "nicht", "ein", "mit")),
    ("fr", ("le", "les", "est", "dans", "une", "pour", "vous", "nous")),
]


# Materialized after STOPWORD_MARKERS exists (used by key_terms above).
KEY_TERM_STOPWORDS: Tuple[str, ...] = _build_stoplist()
_KEY_TERM_STOPSET = frozenset(KEY_TERM_STOPWORDS)


def stopword_langid(tokens: List[str]) -> str:
    """First language (in STOPWORD_MARKERS order) whose marker count equals
    the maximum, if the maximum is > 0; else "und"."""
    counts = [sum(t in markers for t in tokens)
              for _, markers in STOPWORD_MARKERS]
    best = max(counts)
    if best == 0:
        return "und"
    for (lang, _), c in zip(STOPWORD_MARKERS, counts):
        if c == best:
            return lang
    return "und"
