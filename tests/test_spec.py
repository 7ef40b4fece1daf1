"""Unit tests for the scalar spec — scrub, scores, hashing, determinism."""

import pyarrow as pa

from dataquality_ray import spec
from dataquality_ray.config import DEFAULT_CONFIG


class TestScrub:
    def test_email(self):
        s, c = spec.scrub_text("contact john.doe+x@sub.example.com now")
        assert s == "contact <EMAIL> now"
        assert c == {"email": 1, "ssn": 0, "phone": 0}

    def test_ssn(self):
        s, c = spec.scrub_text("ssn is 123-45-6789.")
        assert s == "ssn is <SSN>."
        assert c["ssn"] == 1

    def test_phone_formats(self):
        for t in ["(555) 123-4567", "555-123-4567", "555.123.4567"]:
            s, c = spec.scrub_text(f"call {t} today")
            assert s == "call <PHONE> today", t
            assert c["phone"] == 1

    def test_ssn_not_phone(self):
        s, c = spec.scrub_text("123-45-6789 and 123-456-7890")
        assert s == "<SSN> and <PHONE>"

    def test_boundaries(self):
        # digits glued to a longer run must not match SSN
        s, c = spec.scrub_text("id 1123-45-67890 stays")
        assert c["ssn"] == 0

    def test_multiple(self):
        s, c = spec.scrub_text("a@b.co x@y.org 111-22-3333")
        assert c == {"email": 2, "ssn": 1, "phone": 0}


class TestScores:
    def test_length(self):
        assert spec.length_score(0) == 0
        assert spec.length_score(10) == 50
        assert spec.length_score(20) == 100
        assert spec.length_score(5000) == 100

    def test_repetition(self):
        assert spec.repetition_score(0, 0) == 100
        assert spec.repetition_score(1, 10) == 10
        assert spec.repetition_score(10, 10) == 100

    def test_symbol(self):
        assert spec.symbol_score(0, 100) == 100
        assert spec.symbol_score(34, 100) == 0   # 300*34//100 = 102 -> min 100
        assert spec.symbol_score(10, 100) == 70
        assert spec.symbol_score(0, 0) == 100

    def test_timeliness(self):
        assert spec.timeliness_score(0) == 100
        assert spec.timeliness_score(30) == 100
        assert spec.timeliness_score(31) == 60

    def test_action_thresholds(self):
        cfg = DEFAULT_CONFIG
        assert cfg.action_for(85) == "KEEP"
        assert cfg.action_for(84) == "REVIEW"
        assert cfg.action_for(70) == "REVIEW"
        assert cfg.action_for(69) == "QUARANTINE"
        assert cfg.action_for(60) == "QUARANTINE"
        assert cfg.action_for(59) == "DISCARD"

    def test_overall_uses_all_17(self):
        dims = {n: 100 for n in spec.DIMENSION_NAMES}
        assert spec.overall_score(dims) == 100
        dims[spec.DIMENSION_NAMES[0]] = 0
        assert spec.overall_score(dims) == round(1600 / 17)

    def test_dimension_names_match_reference(self):
        # canonical 17 names (reference metadata.py:153-158)
        assert len(spec.DIMENSION_NAMES) == 17
        assert spec.DIMENSION_NAMES[0] == "Accuracy"
        assert "Fitness_for_Use" in spec.DIMENSION_NAMES


class TestHashing:
    def test_normalize(self):
        assert spec.normalize_for_hash("  Hello   WORLD \n") == "hello world"

    def test_content_hash_stable(self):
        assert spec.content_hash("Hello  World") == spec.content_hash("hello world")
        assert spec.content_hash("a") != spec.content_hash("b")

    def test_token_hash_deterministic(self):
        assert spec.token_hash_u64("table") == spec.token_hash_u64("table")

    def test_jaccard(self):
        assert spec.jaccard({1, 2}, {1, 2}) == 1.0
        assert spec.jaccard({1, 2}, {3, 4}) == 0.0
        assert spec.jaccard(set(), set()) == 1.0
        assert spec.jaccard({1, 2, 3}, {2, 3, 4}) == 0.5

    def test_minhash_estimates_jaccard(self):
        import numpy as np
        a, b = spec.minhash_params(128, 42)
        s1 = {spec.token_hash_u64(f"tok{i}") for i in range(100)}
        s2 = {spec.token_hash_u64(f"tok{i}") for i in range(20, 120)}
        true_j = spec.jaccard(s1, s2)

        def sig(s):
            h = np.array(sorted(s), dtype=np.uint64)
            return (a[:, None] * h[None, :] + b[:, None]).min(axis=1)

        est = (sig(s1) == sig(s2)).mean()
        assert abs(est - true_j) < 0.15

    def test_fingerprint(self):
        assert spec.rolling_fingerprint("abc") == spec.rolling_fingerprint(" ABC ")
        assert spec.rolling_fingerprint("abc") != spec.rolling_fingerprint("abd")


class TestModels:
    def test_langid_deterministic_and_accurate(self):
        from dataquality_ray.functions.corpora import LANG_CORPORA
        from dataquality_ray.functions.langid import LangIDModel
        m1, m2 = LangIDModel(), LangIDModel()
        for lang, sents in sorted(LANG_CORPORA.items()):
            for s in sents[:5]:
                p1, p2 = m1.predict(s), m2.predict(s)
                assert p1 == p2
                assert p1[0] == lang
        assert m1.predict("")[0] == "und"

    def test_lm_ranks_quality(self):
        from dataquality_ray.functions.corpora import LANG_CORPORA
        from dataquality_ray.functions.ngram_lm import BigramLM
        lm = BigramLM()
        clean = lm.log2_ppl(LANG_CORPORA["en"][0])
        junk = lm.log2_ppl("zzz qqq xxx www vvv")
        assert clean < junk
        assert lm.log2_ppl("") == 16.0


class TestFingerprintVectorized:
    def test_batch_matches_scalar(self):
        import numpy as np
        import pyarrow as pa
        from dataquality_ray import spec
        from dataquality_ray.stages.dedup import fingerprint_batch
        texts = ["hello world", "", "  MiXeD   Case \t text ", "é ñ 日本語",
                 "a", "x" * 500, "line\nbreaks\nand\ttabs"]
        batch = pa.table({"text": pa.array(texts, pa.string())})
        got = fingerprint_batch(batch)["fingerprint"].to_numpy()
        want = np.array([spec.rolling_fingerprint(t) for t in texts],
                        dtype=np.uint64)
        assert (got == want).all()


class TestToxicity:
    def test_count_and_score(self):
        from dataquality_ray import spec
        assert spec.toxicity_count("a perfectly fine sentence") == 0
        assert spec.toxicity_count("You Idiot, that was wrong") == 1
        assert spec.toxicity_count("shut up. SHUT UP. worthless") == 3
        # \b boundaries: no match inside words
        assert spec.toxicity_count("worthlessness is a concept") == 0
        assert spec.toxicity_score(0) == 100
        assert spec.toxicity_score(1) == 60
        assert spec.toxicity_score(3) == 0
        assert spec.toxicity_score(9) == 0

    def test_mask(self):
        from dataquality_ray import spec
        assert spec.mask_toxicity("You Idiot, listen") == "<TOX>, listen"
        assert spec.mask_toxicity("Fine text.") == "fine text."

    def test_credibility_dim_uses_toxicity(self):
        from dataquality_ray import spec
        base = {"length": 100, "repetition": 100, "symbol": 100,
                "boilerplate": 100, "lang": 100, "ppl": 80,
                "timeliness": 100, "toxicity": 20}
        dims = spec.dimension_scores(base)
        assert dims["Credibility"] == (80 + 20) // 2
