"""PII scrub stage — zero-copy Arrow, RE2 kernels.

Replaces the reference's LLM-prompted PII risk assessment
(bedrock.py:211-214,250) with a deterministic regex scrub. Uses pyarrow's
RE2-backed ``replace_substring_regex`` / ``count_substring_regex`` so the
whole batch is processed in C++ with no Python row loop, and so the exact
same pattern strings produce identical results in DuckDB (RE2 semantics on
both sides).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from dataquality_ray.spec import PII_RULES


def scrub_batch(batch: pa.Table, text_col: str = "text",
                with_counts: bool = True) -> pa.Table:
    """Scrub PII in ``text_col`` in place; append n_email/n_ssn/n_phone.

    Rules are applied in the frozen ``spec.PII_RULES`` order (email, ssn,
    phone); counts are of matches in the text as seen by each rule, i.e.
    identical to sequential ``re.subn`` in the oracle.
    """
    text = batch[text_col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    counts = {}
    for name, pattern, replacement in PII_RULES:
        if with_counts:
            counts[name] = pc.cast(
                pc.count_substring_regex(text, pattern), pa.int32())
        text = pc.replace_substring_regex(text, pattern, replacement)
    batch = batch.set_column(
        batch.schema.get_field_index(text_col), text_col, text)
    if with_counts:
        for name in ("email", "phone", "ssn"):
            batch = batch.append_column(f"n_{name}", counts[name])
    return batch
