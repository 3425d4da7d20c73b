"""Frozen pipeline configuration.

Analog of the reference's hyperparameter dict
(selfclean/cleaner/selfclean.py:28-68 DINO_STANDARD_HYPERPARAMETERS) and
cleaner knobs (selfclean/cleaner/selfclean_cleaner.py:33-68): instead of
SSL-training hyperparameters we pin the shingle/signature config the
north rule fixes (char 5-grams / token w-shingles, 128 MinHash perms,
64-bit SimHash).  The config hash goes into every stage checkpoint's
lineage so "same shingle/signature config" is mechanically checkable.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import asdict, dataclass, field

# 2^61 - 1, a Mersenne prime: modulus of the universal hash family used
# by the MinHash permutations ((a*x + b) mod p).
MERSENNE_P = (1 << 61) - 1


@dataclass(frozen=True)
class SignatureConfig:
    """Shingle + sketch parameters (the reference-config the recall gate
    is measured against; BASELINE.json: char 5-grams / token w-shingles,
    128 perms, 64-bit SimHash)."""

    shingle_mode: str = "char"  # "char" (k-grams) or "token" (w-shingles)
    shingle_k: int = 5          # char k-gram width
    shingle_w: int = 3          # token w-shingle width (token mode)
    num_perm: int = 128         # MinHash permutations
    simhash_bits: int = 64      # SimHash fingerprint width (fixed: int64)
    # Banding: b*r <= num_perm (first b*r signature positions are banded).
    # Default r=5/b=25: P[candidate | s=0.8] = 1-(1-0.8^5)^25 ≈ 0.99995
    # (≈0.9994 with min_bands_hit=2) while junk collisions at s≈0.15
    # drop ~8x vs r=4/b=32 — self-similar corpora (license headers,
    # templates) generate quadratic bucket volume otherwise.
    lsh_bands: int = 25         # LSH bands b
    lsh_rows: int = 5           # rows per band r
    seed: int = 42              # reference seeds 42 (selfclean_cleaner.py:52-60)
    lowercase: bool = False     # content normalization before shingling
    collapse_ws: bool = False   # fold runs of whitespace to single space

    def __post_init__(self) -> None:
        if self.lsh_bands * self.lsh_rows > self.num_perm:
            raise ValueError(
                f"bands*rows ({self.lsh_bands}*{self.lsh_rows}) > num_perm ({self.num_perm})"
            )
        if self.shingle_mode not in ("char", "token"):
            raise ValueError(f"unknown shingle_mode {self.shingle_mode!r}")


@dataclass(frozen=True)
class PipelineConfig:
    """End-to-end dedup pipeline knobs."""

    signature: SignatureConfig = field(default_factory=SignatureConfig)
    # Candidate pairs with exact Jaccard >= tau become verified edges
    # (the analog of the reference's near-dup distance threshold; dist = 1 - jaccard).
    jaccard_threshold: float = 0.8
    # Max rows per (band, band_hash) bucket before the bucket is dropped
    # as a degenerate hot key (empty files, license boilerplate).  Dropped
    # buckets are logged, never silent (SURVEY.md §4.2).
    band_bucket_cap: int = 200
    # SimHash pre-filter: candidate pairs whose fingerprints differ in
    # more than this many bits skip exact verification (cheap reject).
    max_hamming: int = 16
    # Require a pair to collide in >= this many LSH bands.  At the
    # reference operating point (b=32, r=4, tau=0.8) P[>=2 hits | s=0.8]
    # ~ 1 - 1e-6, while corpora whose *unrelated* pairs sit at Jaccard
    # 0.1-0.2 see ~100x fewer junk candidates (P[>=2] ~ C(32,2)q^2 for
    # q = s^4).  Verbatim duplicates bypass this via the sha fast path.
    min_bands_hit: int = 2
    # Substring confirmation via per-partition suffix-array kernel.
    check_substring: bool = True
    # Connected-components iteration bound (log2 diameter backstop).
    cc_max_iterations: int = 50
    # Auto-clean (fraction_cut) parameters — analog of
    # selfclean/cleaner/auto_cleaning_mixin.py:26,45-57.
    auto_cleaning: bool = False
    cleaner_q: float = 0.05
    cleaner_alpha: float = 0.10
    # shuffle partitions for heavy stages (None = session default)
    shuffle_partitions: int | None = None

    def config_hash(self) -> str:
        payload = json.dumps(asdict(self), sort_keys=True, default=str)
        return hashlib.sha256(payload.encode()).hexdigest()[:16]
