"""Kernel-level tests: shingles, MinHash, SimHash, suffix array.

Mirrors the reference's analytic unit tests (known outputs, no golden
files — SURVEY.md §5.1): exact duplicates must sketch identically
(≙ planted-duplicate test, reference
tests/unittests/cleaner/near_duplicates/test_embedding_distance.py:22-40)
and the MinHash estimator must track exact Jaccard.
"""

import numpy as np
import pytest

from selfclean_spark.config import SignatureConfig
from selfclean_spark.functions.sketches import (
    char_shingles,
    estimate_jaccard,
    exact_jaccard,
    hamming64,
    minhash_seeds,
    minhash_signature,
    shingle,
    simhash_signature,
    token_shingles,
)
from selfclean_spark.functions.suffix import (
    contains_via_suffix_array,
    is_substring_pair,
    suffix_array,
)

CFG = SignatureConfig()
SEEDS = minhash_seeds(CFG.num_perm, CFG.seed)


def test_char_shingles_known_count():
    s = char_shingles("abcdefg", 5)  # windows: abcde bcdef cdefg
    assert s.size == 3
    assert s.dtype == np.uint64
    assert np.all(np.diff(s.astype(np.uint64)) > 0)  # sorted unique


def test_char_shingles_short_text_padded():
    assert char_shingles("ab", 5).size == 1
    assert char_shingles("", 5).size == 1


def test_shingles_deterministic():
    a = char_shingles("def foo(): pass", 5)
    b = char_shingles("def foo(): pass", 5)
    np.testing.assert_array_equal(a, b)


def test_token_shingles():
    s = token_shingles("a b c d", 3)  # (a,b,c) (b,c,d)
    assert s.size == 2
    # order sensitivity: reversed tokens give different shingles
    s2 = token_shingles("d c b a", 3)
    assert set(s.tolist()) != set(s2.tolist())


def test_identical_content_identical_signature():
    """Exact duplicate ⇒ identical MinHash + SimHash (distance 0),
    the cluster-membership re-expression of the reference's planted
    duplicate ranking first with score 0."""
    text = "import os\nimport sys\n\ndef main():\n    return 42\n"
    sh = shingle(text, CFG)
    sig1 = minhash_signature(sh, SEEDS)
    sig2 = minhash_signature(shingle(text, CFG), SEEDS)
    np.testing.assert_array_equal(sig1, sig2)
    assert simhash_signature(sh) == simhash_signature(shingle(text, CFG))
    assert estimate_jaccard(sig1, sig2) == 1.0
    assert exact_jaccard(sh, sh) == 1.0


def test_minhash_tracks_jaccard():
    """MinHash agreement rate ≈ exact Jaccard (±0.12 at 128 perms)."""
    rng = np.random.default_rng(7)
    base = "".join(rng.choice(list("abcdefgh \n"), size=2000))
    variant = base[:1500] + "".join(rng.choice(list("abcdefgh \n"), size=500))
    sa, sb = char_shingles(base, 5), char_shingles(variant, 5)
    truth = exact_jaccard(sa, sb)
    est = estimate_jaccard(minhash_signature(sa, SEEDS), minhash_signature(sb, SEEDS))
    assert 0.0 < truth < 1.0
    assert abs(est - truth) < 0.12


def test_disjoint_content_low_estimate():
    sa = char_shingles("aaaaaaaaaaaaaaaaaaa", 5)
    sb = char_shingles("zzzzzzzzzzzzzzzzzzz", 5)
    assert exact_jaccard(sa, sb) == 0.0
    assert estimate_jaccard(
        minhash_signature(sa, SEEDS), minhash_signature(sb, SEEDS)
    ) < 0.1


def test_simhash_near_duplicates_close():
    base = "def compute(x):\n    return x * 2\n" * 20
    variant = base.replace("x * 2", "x * 3", 1)
    h1 = simhash_signature(char_shingles(base, 5))
    h2 = simhash_signature(char_shingles(variant, 5))
    assert hamming64(h1, h2) <= 16
    rand = simhash_signature(char_shingles("qwertyuiopasdfghjkl" * 30, 5))
    assert hamming64(h1, rand) > hamming64(h1, h2)


def test_hamming64():
    assert hamming64(0, 0) == 0
    assert hamming64(0, -1) == 64  # -1 = all ones
    assert hamming64(0b1010, 0b0101) == 4


def test_minhash_seed_sensitivity():
    sh = char_shingles("some sample content here", 5)
    s1 = minhash_signature(sh, minhash_seeds(128, 1))
    s2 = minhash_signature(sh, minhash_seeds(128, 2))
    assert not np.array_equal(s1, s2)


# -- suffix array ------------------------------------------------------------

def test_suffix_array_banana():
    sa = suffix_array(b"banana")
    # suffixes sorted: a(5) ana(3) anana(1) banana(0) na(4) nana(2)
    np.testing.assert_array_equal(sa, [5, 3, 1, 0, 4, 2])


def test_suffix_array_matches_naive():
    rng = np.random.default_rng(3)
    for n in (1, 2, 17, 100, 257):
        data = bytes(rng.integers(97, 102, size=n, dtype=np.uint8).tolist())
        naive = sorted(range(n), key=lambda i: data[i:])
        np.testing.assert_array_equal(suffix_array(data), naive)


def test_contains_via_suffix_array():
    hay = b"the quick brown fox jumps over the lazy dog"
    assert contains_via_suffix_array(hay, b"brown fox")
    assert contains_via_suffix_array(hay, b"the")
    assert contains_via_suffix_array(hay, b"")
    assert not contains_via_suffix_array(hay, b"cat")
    assert not contains_via_suffix_array(hay, hay + b"!")


def test_is_substring_pair():
    inner = "def helper():\n    return 1\n"
    outer = "# header\n" + inner + "# footer\n"
    assert is_substring_pair(inner, outer)
    assert is_substring_pair(outer, inner)  # symmetric
    assert not is_substring_pair("abcdef", "ghijkl")


@pytest.mark.parametrize("mode", ["char", "token"])
def test_shingle_modes(mode):
    cfg = SignatureConfig(shingle_mode=mode)
    s = shingle("hello world foo bar baz", cfg)
    assert s.size > 0
    assert s.dtype == np.uint64
