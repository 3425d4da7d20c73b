"""Code-payload clone detection: MOSS winnowing fingerprints and
sub-file block-granularity clones.

The reference detects near-duplicates only at WHOLE-ITEM granularity
(`/root/reference/selfclean/cleaner/near_duplicates/embedding_distance_mixin.py:21-74`
ranks full-sample embedding pairs); a source-code corpus additionally
needs SUB-FILE clone detection — a copied function inside an otherwise
different file — which is what these operators add, re-expressed
Spark-first over the same (id, content) surface the rest of the dedup
family uses.

Two public algorithms, both credited:

* **Winnowing** (Schleimer, Wilkerson, Aiken — "Winnowing: Local
  Algorithms for Document Fingerprinting", SIGMOD 2003; the MOSS
  fingerprinter): hash every k-gram, slide a window of w consecutive
  hashes, keep the minimum of each window (leftmost on ties — the
  paper requires only a deterministic tie rule).  Guarantee: any match
  of length >= w + k - 1 shares at least one fingerprint, at expected
  density 2/(w+1).
* **Fixed-width token blocks** (the exact-clone granularity used by
  code-clone tooling and by exact-substring dedup a la Lee et al.
  2021, re-cast block-wise so it stays a pure groupBy): non-overlapping
  W-token windows, digest-collapsed, inverted-index joined.

Engine-exactness contract: the winnow hash is an explicit polynomial
over character codes mod a prime — pure int64 arithmetic both engines
evaluate identically (no library hash involved), so the DuckDB oracle
recomputes fingerprints bit-exactly.  Block digests use md5, which
Spark and DuckDB share.

100-TB shape (docstrings per operator): fingerprinting is a map-only
projection (whole-stage codegen, no UDF); the only shuffles are the
distinct-postings exchange and the df-capped inverted-index self-join
— the same count-first-cap discipline as ``dedup.token_jaccard_pairs``
(a fingerprint appearing in f docs contributes f^2 join rows, so
ubiquitous boilerplate fingerprints are cut, which on code corpora is
exactly the license-header / codegen-preamble mass you WANT out of
clone evidence).  At 10^12 files the md5 hex in block postings would
be collapsed to xxhash64 ints pre-shuffle (the ``repo_fork_pairs``
pattern); md5 is kept here because the correctness twin must reproduce
digests in SQL.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from selfclean_spark.operators.ingest import fanout_few_files

# Winnowing parameters — k-gram length, window width, polynomial base,
# prime modulus.  k = 20 chars (~4 tokens of code) per the MOSS paper's
# "longer than common idiom, shorter than a cloned block" guidance; the
# hash rolls (acc * B + char) mod M, and acc < M = 1e9+7 keeps
# acc * B + 255 < 2^63 at every step — pure int64 both engines.
WINNOW_K = 20
WINNOW_W = 8
WINNOW_B = 257
WINNOW_M = 1_000_000_007


def _winnow_selected_expr(text_sql: str) -> str:
    """SQL expression: array of DISTINCT selected gram positions'
    hashes — ``array<struct<p int, h bigint>>`` — for the winnowing of
    ``text_sql``.

    Built as a single nested higher-order-function expression so the
    whole fingerprinter stays inside whole-stage codegen: no UDF, no
    shuffle, no Python.  Windows shorter than w (ng < w) degrade to a
    single window over all grams, per the paper's boundary handling.
    """
    poly = (
        f"aggregate(sequence(i, i + {WINNOW_K - 1}), 0L,"
        f" (acc, t) -> (acc * {WINNOW_B}L"
        f" + ascii(substring({text_sql}, t, 1))) % {WINNOW_M}L)"
    )
    hashes = (
        f"transform(sequence(1, greatest(length({text_sql}) - {WINNOW_K - 1}, 0)),"
        f" i -> {poly})"
    )
    # leftmost-min of each window: strict < keeps the earliest position
    argmin = (
        f"aggregate(sequence(j, least(j + {WINNOW_W - 1}, size(hs))),"
        f" named_struct('p', -1, 'h', 9223372036854775807L),"
        f" (acc, m) -> if(element_at(hs, m) < acc.h,"
        f" named_struct('p', m, 'h', element_at(hs, m)), acc))"
    )
    # lambda-let: bind the gram-hash array ONCE (CollapseProject would
    # inline a plain column alias into each of its four uses)
    return (
        f"element_at(transform(array({hashes}), hs -> "
        f"array_distinct(transform("
        f" sequence(1, greatest(size(hs) - {WINNOW_W - 1}, 1)),"
        f" j -> {argmin}))), 1)"
    )


def _winnow_hashes_np(s: str) -> np.ndarray:
    """Numpy winnowing of one document: hashes at the DISTINCT selected
    positions, in position order (a multiset — one hash value can be
    selected at several positions).

    Bit-identical to the native SQL expression and to the DuckDB twin:
    the same (acc * B + c) mod M rolling hash (int64 never overflows:
    acc < M = 1e9+7, so acc * 257 + 255 < 2^63) and the same
    leftmost-min tie rule (``np.argmin`` returns the first minimum).
    """
    s = s.strip()
    ng = len(s) - WINNOW_K + 1
    if ng <= 0:
        return np.empty(0, dtype=np.int64)
    codes = np.fromiter(map(ord, s), dtype=np.int64, count=len(s))
    acc = np.zeros(ng, dtype=np.int64)
    for t in range(WINNOW_K):
        acc = (acc * WINNOW_B + codes[t : t + ng]) % WINNOW_M
    if ng <= WINNOW_W:
        return acc[int(np.argmin(acc))][None]
    wins = np.lib.stride_tricks.sliding_window_view(acc, WINNOW_W)
    pos = np.arange(wins.shape[0]) + np.argmin(wins, axis=1)
    # winnowing positions are non-decreasing under the leftmost rule,
    # so unique == distinct-in-position-order
    return acc[np.unique(pos)]


def _winnow_report_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        texts = pdf["text"].to_numpy()
        n = len(texts)
        out = {
            "doc_id": pdf["doc_id"].to_numpy(),
            "n_grams": np.zeros(n, dtype=np.int64),
            "n_fp": np.zeros(n, dtype=np.int64),
            "fp_xor": np.zeros(n, dtype=np.int64),
            "fp_min": np.zeros(n, dtype=np.int64),
            "fp_max": np.zeros(n, dtype=np.int64),
        }
        for r, s in enumerate(texts):
            out["n_grams"][r] = max(len(s.strip()) - WINNOW_K + 1, 0)
            hs = _winnow_hashes_np(s)
            if hs.size:
                out["n_fp"][r] = hs.size
                out["fp_xor"][r] = np.bitwise_xor.reduce(hs)
                out["fp_min"][r] = hs.min()
                out["fp_max"][r] = hs.max()
        yield pd.DataFrame(out)


def _winnow_posting_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        ids, hs = [], []
        for i, s in zip(pdf["id"].to_numpy(), pdf["text"].to_numpy()):
            u = np.unique(_winnow_hashes_np(s))  # distinct hash VALUES
            ids.append(np.full(u.size, i, dtype=np.int64))
            hs.append(u)
        yield pd.DataFrame(
            {
                "id": np.concatenate(ids) if ids else np.empty(0, np.int64),
                "h": np.concatenate(hs) if hs else np.empty(0, np.int64),
            }
        )


def winnow_fingerprints(
    df: DataFrame, id_col: str, text_col: str, impl: str = "arrow"
) -> DataFrame:
    """Per-document winnowing fingerprint report: gram count,
    fingerprint count, and min/max/xor digests of the selected hashes.

    The xor/min/max triple pins the exact fingerprint SET (not just
    its size) onto the oracle surface without emitting ~n_fp rows per
    doc.  Map-only either way: zero shuffles before the output sort.
    Docs shorter than k grams are emitted with n_fp = 0 and zeroed
    digests, keeping the report total == corpus size.

    ``impl="arrow"`` (default) runs the kernel as a vectorized numpy
    batch over Arrow (the same fast path the MinHash signatures use) —
    measured 16x end-to-end at sf0.01/local[8] (8.07 s -> 0.50 s; the
    native expression's higher-order lambdas are interpreted per
    element, not codegen'd).  ``impl="native"``
    keeps the pure-SQL single-expression form (zero Python; the
    parity twin of the DuckDB oracle).  Outputs are bit-identical
    (tested) — the trade is documented in BENCH/BASELINE.md.
    """
    if impl == "arrow":
        return (
            fanout_few_files(
                df.select(
                    F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
                )
            )
            .mapInPandas(
                _winnow_report_batches,
                schema=(
                    "doc_id long, n_grams long, n_fp long,"
                    " fp_xor long, fp_min long, fp_max long"
                ),
            )
            .orderBy("doc_id")
        )
    sel = _winnow_selected_expr(f"trim({text_col})")
    return (
        fanout_few_files(df).select(
            F.col(id_col).alias("doc_id"),
            F.expr(
                f"greatest(length(trim({text_col})) - {WINNOW_K - 1}, 0)"
            ).cast("long").alias("n_grams"),
            F.expr(sel).alias("_sel"),
        )
        .select(
            "doc_id",
            "n_grams",
            F.when(F.col("n_grams") > 0, F.size("_sel"))
            .otherwise(F.lit(0)).cast("long").alias("n_fp"),
            F.when(
                F.col("n_grams") > 0,
                F.expr("aggregate(_sel, 0L, (a, x) -> a ^ x.h)"),
            ).otherwise(F.lit(0)).cast("long").alias("fp_xor"),
            F.when(
                F.col("n_grams") > 0,
                F.expr("array_min(transform(_sel, x -> x.h))"),
            ).otherwise(F.lit(0)).cast("long").alias("fp_min"),
            F.when(
                F.col("n_grams") > 0,
                F.expr("array_max(transform(_sel, x -> x.h))"),
            ).otherwise(F.lit(0)).cast("long").alias("fp_max"),
        )
        .orderBy("doc_id")
    )


def winnow_clone_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_shared: int = 5,
    max_doc_freq: int = 1_000,
    impl: str = "arrow",
) -> DataFrame:
    """Document pairs sharing >= ``min_shared`` winnowing fingerprints
    — MOSS's clone evidence, distributed.

    Plan: map-only fingerprinting (vectorized numpy over Arrow by
    default; ``impl="native"`` for the zero-Python expression twin —
    bit-identical outputs, tested) -> distinct (fp, id) postings (one
    Exchange) -> df-capped inverted-index self-join (the f^2 cut;
    count-first, same discipline as ``dedup.token_jaccard_pairs``) ->
    per-pair shared count + overlap ratio vs the smaller fingerprint
    set.  Fingerprints are 8-byte ints end-to-end: content never
    shuffles.
    """
    if impl == "arrow":
        fps = fanout_few_files(
            df.select(F.col(id_col).alias("id"), F.col(text_col).alias("text"))
        ).mapInPandas(_winnow_posting_batches, schema="id long, h long")
    else:
        sel = _winnow_selected_expr(f"trim({text_col})")
        fps = fanout_few_files(df).select(
            F.col(id_col).alias("id"),
            F.expr(sel).alias("_sel"),
        ).select(
            "id",
            F.explode(
                F.array_distinct(F.expr("transform(_sel, x -> x.h)"))
            ).alias("h"),
        )
    # df-cap via a count window over the ONE hash(h) exchange (r6, guide
    # §2.4 — the band_pair_stream rework): the window's partition key
    # equals the self-join key, so the per-doc size count and both join
    # sides are served by AQE exchange reuse from a single materialized
    # shuffle — the winnowing kernel runs once with no persist and no
    # df-aggregate + semi-join chain (a persist here would break
    # exchange reuse: InMemoryRelation subtrees do not canonicalize
    # equal in Spark 4.1).  Capped postings are identical.
    pruned = (
        fps.withColumn(
            "df", F.count(F.lit(1)).over(Window.partitionBy("h"))
        )
        .filter(F.col("df") <= max_doc_freq)
        .drop("df")
    )
    sizes = pruned.groupBy("id").agg(F.count(F.lit(1)).alias("n_fp"))
    a = pruned.select("h", F.col("id").alias("id_a"))
    b = pruned.select("h", F.col("id").alias("id_b"))
    shared = (
        a.join(b, "h")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
    return (
        shared.join(
            sizes.select(F.col("id").alias("id_a"), F.col("n_fp").alias("n_a")),
            "id_a",
        )
        .join(
            sizes.select(F.col("id").alias("id_b"), F.col("n_fp").alias("n_b")),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            "n_shared",
            # integer DIV, not float-divide-then-cast: bit-exact vs the
            # DuckDB twin's // with no FP-rounding edge at the boundary
            F.expr("n_shared * 1000000L div least(n_a, n_b)").alias(
                "overlap_ppm"
            ),
        )
        .orderBy("id_a", "id_b")
    )


BLOCK_TOKENS = 8


def block_clone_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_tokens: int = BLOCK_TOKENS,
    min_shared: int = 2,
    max_doc_freq: int = 10_000,
) -> DataFrame:
    """Sub-file exact-clone pairs at fixed token-block granularity: a
    copied span of >= 2*W-1 tokens is guaranteed to cover a full
    W-token aligned block in at least one of the two files only if
    alignments agree, so this is the cheap precision-oriented
    complement to ``winnow_clone_pairs`` (alignment-free) and to the
    suffix-array substring confirm (exact, any offset).

    Plan: tokenize -> non-overlapping W-token chunks (full chunks
    only; the tail never forms clone evidence) -> md5 digest per block
    (content leaves the scan as 32-hex digests; at 10^12 files these
    collapse further to xxhash64 ints pre-shuffle — md5 is kept so the
    DuckDB twin reproduces digests) -> distinct postings -> df-capped
    inverted-index self-join -> pairs with >= ``min_shared`` shared
    distinct blocks.
    """
    n_blocks = F.floor(F.size(F.col("_toks")) / block_tokens).cast("int")
    blocks = (
        df.select(
            F.col(id_col).alias("id"),
            F.split(F.trim(text_col), r"\s+").alias("_toks"),
        )
        .select("id", n_blocks.alias("_nb"), "_toks")
        .filter(F.col("_nb") > 0)
        .select(
            "id",
            "_nb",
            F.explode(
                F.expr(
                    f"transform(sequence(1, _nb), i -> md5(concat_ws(' ',"
                    f" slice(_toks, (i - 1) * {block_tokens} + 1,"
                    f" {block_tokens}))))"
                )
            ).alias("bh"),
        )
        .select("id", "_nb", "bh")
        .distinct()
    )
    # df-cap via count window over the hash(bh) exchange (r6 — the
    # band_pair_stream rework); both self-join sides reuse the shuffle
    pruned = (
        blocks.withColumn(
            "df", F.count(F.lit(1)).over(Window.partitionBy("bh"))
        )
        .filter(F.col("df") <= max_doc_freq)
        .drop("df")
    )
    a = pruned.select("bh", F.col("id").alias("id_a"), F.col("_nb").alias("nb_a"))
    b = pruned.select("bh", F.col("id").alias("id_b"), F.col("_nb").alias("nb_b"))
    return (
        a.join(b, "bh")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "nb_a", "nb_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
        .select(
            "id_a",
            "id_b",
            "n_shared",
            F.expr("n_shared * 1000000L div least(nb_a, nb_b)").alias(
                "coverage_ppm"
            ),
        )
        .orderBy("id_a", "id_b")
    )
