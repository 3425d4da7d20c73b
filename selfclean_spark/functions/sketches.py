"""Shingling, MinHash, SimHash — pure vectorized NumPy kernels.

These replace the reference's embedding + dense-distance mechanism
(selfclean/cleaner/selfclean_cleaner.py:121-149 computes a full N×N
cosine matrix from SSL embeddings).  Semantics preserved: a monotone
per-pair similarity in [0,1] whose exact duplicates score 1 (distance
0) and which the LSH stage can index sub-quadratically.

All kernels are deterministic given ``SignatureConfig.seed`` — the
reference pins seed 42 (selfclean_cleaner.py:52-60) and determinism is a
north-rule requirement (identical output at local[8] vs local[32]).

No per-row Python in the hot path: shingling uses stride-trick rolling
windows over byte arrays; MinHash is one (S × P) xor-mix-min reduce;
SimHash is a bit-unpack + signed sum.  Each is O(S·P) flops on
contiguous arrays, executed inside Arrow-batched pandas UDFs.
"""

from __future__ import annotations

import numpy as np

from selfclean_spark.config import SignatureConfig

_U64 = np.uint64
# splitmix64 constants (public domain; Steele et al. "Fast Splittable
# Pseudorandom Number Generators").
_MIX1 = _U64(0xBF58476D1CE4E5B9)
_MIX2 = _U64(0x94D049BB133111EB)
_GOLDEN = _U64(0x9E3779B97F4A7C15)

_OVERFLOW_OK = np.errstate(over="ignore")


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer: uniform 64-bit avalanche.
    uint64 wraparound multiplication is intentional."""
    with _OVERFLOW_OK:
        x = (x + _GOLDEN).astype(_U64)
        x ^= x >> _U64(30)
        x *= _MIX1
        x ^= x >> _U64(27)
        x *= _MIX2
        x ^= x >> _U64(31)
    return x


def hash_bytes_vec(raw: bytes, k: int) -> np.ndarray:
    """All k-byte rolling windows of ``raw`` → uint64 polynomial hashes.

    Accumulates k shifted column products instead of a (n, k) uint64
    matmul — integer matmul has no BLAS path in NumPy and measured ~7×
    slower for k=5.
    """
    buf = np.frombuffer(raw, dtype=np.uint8)
    n = buf.shape[0] - k + 1
    h = np.zeros(n, dtype=_U64)
    w = _U64(1)
    with _OVERFLOW_OK:
        for j in range(k):
            h += buf[j : j + n].astype(_U64) * w
            w = w * _U64(257)
        h = _splitmix64_inplace(h)
    return h


def _splitmix64_inplace(x: np.ndarray) -> np.ndarray:
    """In-place splitmix64 (same output as :func:`_splitmix64`; avoids
    the temporaries — callers must own ``x``)."""
    with _OVERFLOW_OK:
        x += _GOLDEN
        x ^= x >> _U64(30)
        x *= _MIX1
        x ^= x >> _U64(27)
        x *= _MIX2
        x ^= x >> _U64(31)
    return x


def char_shingles(text: str, k: int) -> np.ndarray:
    """Hashed char k-gram set of ``text`` → sorted unique uint64 array.

    Rolling windows via byte-level stride tricks (no Python loop over
    positions).  Texts shorter than k are NUL-padded to one shingle so
    empty-ish rows still sketch deterministically.
    """
    raw = text.encode("utf-8", errors="surrogatepass")
    if len(raw) < k:
        raw = raw + b"\x00" * (k - len(raw))
    return np.unique(hash_bytes_vec(raw, k))


def token_shingles(text: str, w: int) -> np.ndarray:
    """Hashed token w-shingle set → sorted unique uint64 array.

    Tokens = maximal runs of non-whitespace.  Token streams are joined
    with a 0x1F separator and char-hashed per token, then w consecutive
    token hashes combine positionally — all vectorized.
    """
    tokens = text.split()
    if not tokens:
        tokens = [""]
    tok_hashes = np.array(
        [_py_hash_token(t) for t in tokens], dtype=_U64
    )  # token count ≪ char count; this loop is the tokenizer itself
    if len(tok_hashes) < w:
        tok_hashes = np.concatenate(
            [tok_hashes, np.zeros(w - len(tok_hashes), dtype=_U64)]
        )
    n = len(tok_hashes) - w + 1
    windows = np.lib.stride_tricks.as_strided(
        tok_hashes, shape=(n, w), strides=(tok_hashes.strides[0], tok_hashes.strides[0])
    )
    weights = np.power(_GOLDEN, np.arange(1, w + 1, dtype=_U64))
    with _OVERFLOW_OK:
        combined = (windows * weights[None, :]).sum(axis=1, dtype=_U64)
    return np.unique(_splitmix64(combined))


def _py_hash_token(token: str) -> int:
    """Deterministic FNV-1a 64 of one token (stable across processes,
    unlike builtin hash())."""
    h = 0xCBF29CE484222325
    for byte in token.encode("utf-8", errors="surrogatepass"):
        h = ((h ^ byte) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def shingle(text: str, cfg: SignatureConfig) -> np.ndarray:
    """Dispatch per config (char k-grams vs token w-shingles) with the
    deterministic normalization analog of the reference's fixed eval
    transform (selfclean/cleaner/selfclean.py:118-125)."""
    if cfg.lowercase:
        text = text.lower()
    if cfg.collapse_ws:
        text = " ".join(text.split())
    if cfg.shingle_mode == "char":
        return char_shingles(text, cfg.shingle_k)
    return token_shingles(text, cfg.shingle_w)


def minhash_seeds(num_perm: int, seed: int) -> np.ndarray:
    """(P,) per-permutation 64-bit seeds.  h_i(x) = splitmix64(x XOR s_i)
    — an avalanche-mixed family: each s_i induces an (approximately)
    independent uniform permutation of the shingle universe, which is
    all MinHash needs.  Seeded → identical on every executor/run."""
    rng = np.random.default_rng(seed)
    return rng.integers(0, 2**63, size=num_perm, dtype=np.uint64)


def minhash_signature(
    shingles: np.ndarray, perm_seeds: np.ndarray, block: int = 32
) -> np.ndarray:
    """(S,) shingle hashes → (P,) MinHash signature (int64 view).

    Broadcasted xor + splitmix + column-min, processed in permutation
    blocks of 32 so the (S × block) working set stays L2-resident
    (a full S×128 grid was measured 4× slower).  The signature is
    stored as int64 (Spark LongType); band hashing and equality are
    bit-pattern operations so signedness is irrelevant.
    """
    if shingles.size == 0:
        shingles = np.array([0], dtype=_U64)
    p = perm_seeds.shape[0]
    out = np.full(p, np.iinfo(np.uint64).max, dtype=_U64)
    # chunk the shingle axis too: a (chunk × block) grid of 512 KB stays
    # L2-resident, so the 7 splitmix passes cost L2 traffic, not DRAM —
    # crucial for multi-core scaling (32 workers share DRAM bandwidth)
    chunk = 2048
    for s0 in range(0, shingles.shape[0], chunk):
        sh = shingles[s0 : s0 + chunk]
        for i in range(0, p, block):
            grid = sh[:, None] ^ perm_seeds[None, i : i + block]
            np.minimum(
                out[i : i + block],
                _splitmix64_inplace(grid).min(axis=0),
                out=out[i : i + block],
            )
    return out.view(np.int64)


def simhash_signature(shingles: np.ndarray) -> int:
    """(S,) shingle hashes → signed 64-bit SimHash fingerprint.

    Classic Charikar sketch: per-bit ±1 votes over shingle hashes, sign
    → bit.  Bit-unpack is one np.unpackbits over the big-endian view.
    """
    if shingles.size == 0:
        return 0
    bits = np.unpackbits(
        shingles.astype(">u8").view(np.uint8).reshape(-1, 8), axis=1
    )  # (S, 64) in {0,1}
    votes = bits.sum(axis=0, dtype=np.int64) * 2 - np.int64(shingles.size)
    bitvals = (votes >= 0).astype(np.uint8)
    fingerprint = np.packbits(bitvals).view(">u8")[0]
    return int(np.uint64(fingerprint).view(np.int64))


def simhash_batch(shingle_sets: list[np.ndarray]) -> np.ndarray:
    """Batched SimHash over a list of shingle arrays → (N,) int64."""
    return np.array([simhash_signature(s) for s in shingle_sets], dtype=np.int64)


def exact_jaccard(sa: np.ndarray, sb: np.ndarray) -> float:
    """Exact Jaccard of two sorted-unique uint64 shingle arrays."""
    if sa.size == 0 and sb.size == 0:
        return 1.0
    inter = np.intersect1d(sa, sb, assume_unique=True).size
    union = sa.size + sb.size - inter
    return float(inter) / float(union) if union else 1.0


def estimate_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    """MinHash estimate: fraction of agreeing signature positions."""
    return float(np.mean(sig_a == sig_b))


def hamming64(a: int, b: int) -> int:
    """Hamming distance between two signed-64-bit SimHash fingerprints."""
    x = int(np.int64(a).view(np.uint64) ^ np.int64(b).view(np.uint64))
    return bin(x).count("1")
