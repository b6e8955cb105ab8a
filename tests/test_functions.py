"""Unit tests for the pure-Python kernel layer (no Spark needed)."""

import numpy as np
import pytest

from entity_resolution_pipeline_spark.functions.hashing import (
    hash128,
    hash64_pair,
    hash_string,
)
from entity_resolution_pipeline_spark.functions.minhash import (
    MinHasher,
    band_hashes,
    exact_jaccard,
    hamming64,
    minhash_jaccard,
    simhash64,
)
from entity_resolution_pipeline_spark.functions.similarity import (
    harmonic_mean,
    indel_ratio,
    levenshtein_distance,
    levenshtein_sim,
    ratio_capped,
    token_sort_ratio,
)
from entity_resolution_pipeline_spark.functions.text import (
    detect_language,
    fingerprint,
    normalize_text,
    quality_scores,
    tokenize_bpeish,
)
from entity_resolution_pipeline_spark.functions.years import (
    extract_birth_death_years,
    has_years,
    normalize_name,
)


class TestHashing:
    def test_mmh3_published_vectors(self):
        # Published mmh3 vectors (mmh3 README): layout low64=h1, high64=h2.
        assert hash128("foo") == 168394135621993849475852668931176482145
        assert hash64_pair("foo") == (-2129773440516405919, 9128664383759220103)

    def test_empty(self):
        assert hash128(b"", seed=0) == 0

    def test_seed_changes_value(self):
        assert hash128("foo", seed=42) != hash128("foo", seed=0)

    def test_hash_string_normalization(self):
        # strip + lower + collapse-ws before hashing
        assert hash_string("  Hello \t\n World ") == hash_string("hello world")
        assert hash_string(None) == "NULL"
        assert hash_string(123) == hash_string("123")
        # decimal-string key
        assert hash_string("x").isdigit()

    def test_tail_lengths(self):
        # exercise every tail-switch branch (1..16+ byte inputs)
        seen = set()
        for n in range(0, 40):
            v = hash128(b"a" * n, seed=42)
            assert v not in seen
            seen.add(v)


class TestNormalizeText:
    def test_reference_semantics(self):
        assert normalize_text("  a \t b\n\nc  ") == "a b c"
        assert normalize_text(None) == ""
        assert normalize_text(42) == "42"
        assert normalize_text("") == ""
        # python \s includes unicode whitespace like
        assert normalize_text("a b") == "a b"

    def test_idempotent(self):
        s = normalize_text("  x   y  ")
        assert normalize_text(s) == s


class TestSimilarity:
    def test_levenshtein(self):
        assert levenshtein_distance("kitten", "sitting") == 3
        assert levenshtein_distance("", "abc") == 3
        assert levenshtein_distance("abc", "abc") == 0
        assert levenshtein_sim("", "") == 1.0
        assert levenshtein_sim("abc", "abd") == pytest.approx(1 - 1 / 3)

    def test_indel_ratio(self):
        # rapidfuzz fuzz.ratio("abcd","bcde") = 75.0 (indel dist=2, lensum=8)
        assert indel_ratio("abcd", "bcde") == pytest.approx(0.75)
        assert indel_ratio("", "") == 1.0
        assert indel_ratio("a", "") == 0.0

    def test_token_sort_ratio(self):
        # token order must not matter
        assert token_sort_ratio("john smith", "smith john") == 1.0
        assert token_sort_ratio("a b", "b a") == 1.0
        assert 0 < token_sort_ratio("john smith", "jon smith") < 1.0

    def test_interactions(self):
        assert harmonic_mean(0.5, 0.5) == pytest.approx(0.5)
        assert harmonic_mean(0.0, 0.9) == 0.0
        assert ratio_capped(1.0, 0.05) == 10.0
        assert ratio_capped(0.5, 0.0) == 0.0
        assert ratio_capped(0.4, 0.8) == pytest.approx(0.5)


class TestYears:
    @pytest.mark.parametrize(
        "name,expected",
        [
            ("Smith, John, 1840-1902", (1840, 1902)),                      # p4
            ("565 - approximately 665", (565, 665)),                        # p1
            ("approximately 1565 - approximately 1645", (1565, 1645)),      # p2
            ("circa 1500-1550", (1500, 1550)),                              # p3
            ("Jones, Mary, -1890", (None, 1890)),                           # p6
            ("b. 1900", (1900, None)),                                      # p9
            ("born 1900", (1900, None)),                                    # p9
            ("fl. 1500-1550", (1500, 1550)),                                # p4 fires first
            ("Doe (1900-1980)", (1900, 1980)),                              # p4 fires first
            ("no years here", (None, None)),
            ("", (None, None)),
            (None, (None, None)),
            # reference quirk: "d. 1920" hits pattern 9's second alternative
            # but the code reads groups[0] -> (None, None)
            ("d. 1920", (None, None)),
        ],
    )
    def test_extract(self, name, expected):
        assert extract_birth_death_years(name) == expected

    def test_has_years(self):
        assert has_years("Smith, 1840-1902")
        assert not has_years("Smith, John")

    def test_normalize_name(self):
        assert normalize_name("Smith, John, 1840-1902") == "Smith, John"
        # reference quirk: pattern 4 strips the years before the paren-cleanup
        # regex runs, so empty parens survive (birth_death_regexes.py:213-218)
        assert normalize_name("Doe, Jane (1900-1980)") == "Doe, Jane ()"
        assert normalize_name("") == ""
        assert normalize_name("Plain Name") == "Plain Name"


class TestMinHash:
    def test_signature_similarity_tracks_jaccard(self):
        mh = MinHasher(num_perm=256, seed=42)
        t1 = "the quick brown fox jumps over the lazy dog " * 5
        t2 = "the quick brown fox jumps over the lazy cat " * 5
        t3 = "completely different content about spark pipelines and parquet"
        s1, s2, s3 = mh.signature(t1), mh.signature(t2), mh.signature(t3)
        est_close = minhash_jaccard(s1, s2)
        est_far = minhash_jaccard(s1, s3)
        true_close = exact_jaccard(t1, t2)
        assert abs(est_close - true_close) < 0.15
        assert est_far < 0.1 < est_close

    def test_identical_texts_identical_signatures(self):
        mh = MinHasher(num_perm=64, seed=42)
        assert np.array_equal(mh.signature("hello world"), mh.signature("hello world"))

    def test_band_hashes(self):
        mh = MinHasher(num_perm=64, seed=42)
        s = mh.signature("some text for banding")
        bh = band_hashes(s, bands=16)
        assert len(bh) == 16
        # band index is encoded in the bucket id
        assert len({b >> 32 for b in bh}) == 16

    def test_signatures_batch_matches_per_row(self):
        """The vectorized batch kernel used by the blocking stage must be
        value-identical to signature() — it feeds the F1-gated candidate
        set, so any drift changes candidate pairs."""
        import random

        rng = random.Random(7)
        words = ["alpha", "beta", "gamma", "delta", "smith", "john", "1840", "x"]
        texts = [
            " ".join(rng.choices(words, k=rng.randint(0, 40))) for _ in range(60)
        ]
        texts += ["", "ab", "abcd", "abcde", "a" * 5000]  # edge lengths
        for num_perm in (16, 64):
            mh = MinHasher(num_perm=num_perm, seed=42)
            batch = mh.signatures_batch(texts)
            for i, t in enumerate(texts):
                assert np.array_equal(batch[i], mh.signature(t)), (i, t[:30])

    def test_signatures_batch_megadoc_perm_block_path(self):
        """A doc long enough to trip the perm-block fallback (> 4x the
        64 MB chunk target for num_perm=64, i.e. >524k shingles) still
        matches the per-row kernel exactly."""
        mh = MinHasher(num_perm=64, seed=1)
        big = "abcdefgh " * 70_000  # ~630k chars -> ~630k char-5 shingles
        batch = mh.signatures_batch(["small text", big])
        assert np.array_equal(batch[0], mh.signature("small text"))
        assert np.array_equal(batch[1], mh.signature(big))

    def test_simhash(self):
        a = simhash64("the quick brown fox jumps over the lazy dog")
        b = simhash64("the quick brown fox jumps over the lazy cat")
        c = simhash64("spark parquet shuffle broadcast join")
        assert hamming64(a, b) < hamming64(a, c)
        assert simhash64("") == 0


class TestTextStats:
    def test_detect_language(self):
        assert detect_language("the cat sat on the mat and it was happy") == "en"
        assert detect_language("le chat est dans la maison avec une souris") == "fr"
        assert detect_language("zzz qqq xxx") == "und"
        assert detect_language("") == "und"

    def test_quality(self):
        q = quality_scores("Hello, world! This is the test.")
        assert q["n_tokens"] == 6
        assert 0 < q["punct_ratio"] < 0.2
        assert q["stopword_ratio"] > 0

    def test_bpeish_tokens(self):
        assert tokenize_bpeish("don't stop 123!") == ["don", "'", "t", "stop", "123", "!"]

    def test_fingerprint_stability(self):
        assert fingerprint("a b c d e f g h i j") == fingerprint("a  b   c d e f g h i j")
        assert fingerprint("") == 0
        assert fingerprint("xyz") != fingerprint("abc")


class TestBitParallelKernels:
    """Bit-parallel Myers/Allison-Dix must equal the DP references."""

    def test_property_fuzz(self):
        from hypothesis import given, settings, strategies as st

        from entity_resolution_pipeline_spark.functions.similarity import (
            _lcs_len,
            _lcs_len_dp,
            levenshtein_distance_dp,
        )

        @settings(max_examples=300, deadline=None)
        @given(st.text(alphabet="abcde ,", max_size=40),
               st.text(alphabet="abcde ,", max_size=40))
        def check(s1, s2):
            assert levenshtein_distance(s1, s2) == levenshtein_distance_dp(s1, s2)
            assert _lcs_len(s1, s2) == _lcs_len_dp(s1, s2)

        check()

    def test_unicode(self):
        from entity_resolution_pipeline_spark.functions.similarity import (
            levenshtein_distance_dp,
        )

        assert levenshtein_distance("héllo", "hello") == levenshtein_distance_dp("héllo", "hello")
        assert levenshtein_distance("ß", "ss") == 2


class TestBatchedLCS:
    """The numpy-batched Allison-Dix kernel must equal the scalar kernel
    on every pair, across the 1-limb/2-limb/scalar-fallback boundaries."""

    def test_property_fuzz(self):
        import numpy as np
        from hypothesis import given, settings, strategies as st

        from entity_resolution_pipeline_spark.functions.similarity import (
            _lcs_len,
            lcs_lens_batch,
        )

        @settings(max_examples=120, deadline=None)
        @given(
            st.lists(
                st.tuples(
                    st.text(alphabet="abcz ,é€", max_size=140),
                    st.text(alphabet="abcz ,é€", max_size=140),
                ),
                max_size=12,
            )
        )
        def check(pairs):
            got = lcs_lens_batch(pairs)
            exp = np.array([_lcs_len(a, b) for a, b in pairs], dtype=np.int64)
            assert (got == exp.reshape(got.shape)).all()

        check()

    def test_limb_boundaries(self):
        import numpy as np

        from entity_resolution_pipeline_spark.functions.similarity import (
            _lcs_len,
            lcs_lens_batch,
        )

        pairs = []
        for m in (1, 63, 64, 65, 127, 128, 129, 200):
            pairs.append(("ab" * m, ("ba" * (m + 3))[:2 * m + 3]))
            pairs.append(("x" * m, "x" * m))
        got = lcs_lens_batch(pairs)
        exp = np.array([_lcs_len(a, b) for a, b in pairs])
        assert (got == exp).all()

    def test_bulk_tsr_matches_get_tsr(self):
        from entity_resolution_pipeline_spark.operators.pairs import _BatchMemo

        strs = ["alpha beta", "beta alpha", "gamma delta x", "", "alpha  beta",
                "composite text here with words", "words here composite text"]
        items = [(a, b) for a in strs for b in strs]
        m1 = _BatchMemo()
        m1.bulk_tsr(items)
        m2 = _BatchMemo()
        for a, b in items:
            k = (a, b) if a <= b else (b, a)
            assert m1.tsr[k] == m2.get_tsr(a, b), (a, b)
