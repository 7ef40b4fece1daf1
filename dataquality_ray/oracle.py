"""Single-process pure-Python reference labeler ("the oracle").

Produces, for a transcript table, the exact per-turn outputs the Ray
pipeline must match (north_rule contract: exact scrubbed-text equality,
keep/drop F1 >= 0.99, stable (conv_id, turn_idx) ordering). Implemented as a
straightforward row loop over the scalar functions in ``spec.py`` plus the
deterministic models in ``functions/`` — no Ray, no vectorization, so it is
an independent re-derivation of the semantics the vectorized stages encode.

Reference behaviors mirrored: 17-dim scoring + overall mean
(metadata.py:419-421), 85/70/60 action thresholds (metadata.py:425-433),
timeliness cap (metadata.py:398-407), exact-dup canonicalization analog of
the reference's seen-pairs dedup (metadata.py:650-667), token-Jaccard
near-dup gate (metadata.py:218-237,536,599).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np
import pyarrow as pa

from dataquality_ray.config import DEFAULT_CONFIG, PipelineConfig
from dataquality_ray import spec
from dataquality_ray.functions.langid import get_model
from dataquality_ray.functions.ngram_lm import get_lm


def label_transcripts(table: pa.Table,
                      cfg: PipelineConfig = DEFAULT_CONFIG) -> pa.Table:
    """Label every turn; returns a table sorted by (conv_id, turn_idx).

    Output columns: conv_id, turn_idx, text (scrubbed), n_email, n_phone,
    n_ssn, lang, lang_conf, log2_ppl, length_score, repetition_score,
    symbol_score, boilerplate_score, lang_score, ppl_score,
    timeliness_score, overall_quality_score, action, keep, content_hash,
    dup_of.
    """
    langid = get_model()
    lm = get_lm()
    now = np.datetime64(cfg.reference_now, "us")

    # stable order first — canonical dedup & output contract
    table = table.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    conv = table["conv_id"].to_pylist()
    turn = table["turn_idx"].to_pylist()
    raw_texts = table["text"].to_pylist()
    ts = table["ts"].to_numpy(zero_copy_only=False)

    n = len(raw_texts)
    out: Dict[str, list] = {k: [] for k in (
        "text", "n_email", "n_phone", "n_ssn", "n_toxic", "lang",
        "lang_conf", "log2_ppl", "length_score", "repetition_score",
        "symbol_score", "boilerplate_score", "lang_score", "ppl_score",
        "timeliness_score", "toxicity_score",
        "overall_quality_score", "action", "keep", "content_hash")}

    age_days = ((now - ts).astype("timedelta64[s]").astype(np.int64)
                // 86400).tolist()

    for i in range(n):
        scrubbed, counts = spec.scrub_text(raw_texts[i])
        toks = spec.tokenize(scrubbed)
        n_chars = len(scrubbed)
        n_toxic = spec.toxicity_count(scrubbed)
        sig = {
            "length": spec.length_score(n_chars, cfg),
            "repetition": spec.repetition_score(len(set(toks)), len(toks)),
            "symbol": spec.symbol_score(spec.count_symbols(scrubbed), n_chars, cfg),
            "boilerplate": spec.boilerplate_score(spec.is_boilerplate(scrubbed)),
            "timeliness": spec.timeliness_score(age_days[i], cfg),
            "toxicity": spec.toxicity_score(n_toxic, cfg),
        }
        lang, conf = langid.predict(scrubbed)
        log2_ppl = lm.log2_ppl(scrubbed)
        sig["lang"] = spec.lang_score(lang, cfg)
        sig["ppl"] = spec.ppl_score(log2_ppl, cfg)
        dims = spec.dimension_scores(sig)
        overall = spec.overall_score(dims)
        action = spec.derive_action(overall, cfg)
        out["text"].append(scrubbed)
        out["n_email"].append(counts["email"])
        out["n_phone"].append(counts["phone"])
        out["n_ssn"].append(counts["ssn"])
        out["n_toxic"].append(n_toxic)
        out["toxicity_score"].append(sig["toxicity"])
        out["lang"].append(lang)
        out["lang_conf"].append(conf)
        out["log2_ppl"].append(log2_ppl)
        out["length_score"].append(sig["length"])
        out["repetition_score"].append(sig["repetition"])
        out["symbol_score"].append(sig["symbol"])
        out["boilerplate_score"].append(sig["boilerplate"])
        out["lang_score"].append(sig["lang"])
        out["ppl_score"].append(sig["ppl"])
        out["timeliness_score"].append(sig["timeliness"])
        out["overall_quality_score"].append(overall)
        out["action"].append(action)
        out["keep"].append(spec.keep_decision(overall, cfg))
        out["content_hash"].append(spec.content_hash(scrubbed))

    # exact dedup: canonical = min (conv_id, turn_idx) per content hash of
    # NON-EMPTY normalized text; others get dup_of = "conv#turn" of canonical
    first_seen: Dict[str, Tuple[str, int]] = {}
    dup_of: List[Optional[str]] = [None] * n
    for i in range(n):  # rows are already in canonical order
        if not spec.normalize_for_hash(out["text"][i]):
            continue
        h = out["content_hash"][i]
        if h in first_seen:
            c, t = first_seen[h]
            dup_of[i] = spec.order_key(c, t)
        else:
            first_seen[h] = (conv[i], turn[i])

    return pa.table({
        "conv_id": pa.array(conv, pa.string()),
        "turn_idx": pa.array(turn, pa.int32()),
        "text": pa.array(out["text"], pa.string()),
        "n_email": pa.array(out["n_email"], pa.int32()),
        "n_phone": pa.array(out["n_phone"], pa.int32()),
        "n_ssn": pa.array(out["n_ssn"], pa.int32()),
        "n_toxic": pa.array(out["n_toxic"], pa.int32()),
        "lang": pa.array(out["lang"], pa.string()),
        "lang_conf": pa.array(out["lang_conf"], pa.float32()),
        "log2_ppl": pa.array(out["log2_ppl"], pa.float32()),
        "length_score": pa.array(out["length_score"], pa.int32()),
        "repetition_score": pa.array(out["repetition_score"], pa.int32()),
        "symbol_score": pa.array(out["symbol_score"], pa.int32()),
        "boilerplate_score": pa.array(out["boilerplate_score"], pa.int32()),
        "lang_score": pa.array(out["lang_score"], pa.int32()),
        "ppl_score": pa.array(out["ppl_score"], pa.int32()),
        "timeliness_score": pa.array(out["timeliness_score"], pa.int32()),
        "toxicity_score": pa.array(out["toxicity_score"], pa.int32()),
        "overall_quality_score": pa.array(out["overall_quality_score"], pa.int32()),
        "action": pa.array(out["action"], pa.string()),
        "keep": pa.array(out["keep"], pa.bool_()),
        "content_hash": pa.array(out["content_hash"], pa.string()),
        "dup_of": pa.array(dup_of, pa.string()),
    })


def near_dup_pairs_exact(table: pa.Table,
                         threshold: float = DEFAULT_CONFIG.near_dup_jaccard
                         ) -> List[Tuple[str, str, float]]:
    """Exact O(n²) near-dup pairs over token sets — oracle for small inputs.

    Returns sorted (key_a, key_b, jaccard) with key_a < key_b, for pairs of
    rows with distinct content hashes (exact dups are handled by dedup) and
    token-set Jaccard >= threshold.
    """
    conv = table["conv_id"].to_pylist()
    turn = table["turn_idx"].to_pylist()
    texts = table["text"].to_pylist()
    keys = [spec.order_key(c, t) for c, t in zip(conv, turn)]
    sets = [frozenset(spec.tokenize(spec.scrub_text(t)[0])) for t in texts]
    hashes = [spec.content_hash(spec.scrub_text(t)[0]) for t in texts]
    pairs = []
    n = len(keys)
    for i in range(n):
        if not sets[i]:
            continue
        for j in range(i + 1, n):
            if not sets[j] or hashes[i] == hashes[j]:
                continue
            jac = spec.jaccard(sets[i], sets[j])
            if jac >= threshold:
                a, b = sorted((keys[i], keys[j]))
                pairs.append((a, b, jac))
    return sorted(set(pairs))
