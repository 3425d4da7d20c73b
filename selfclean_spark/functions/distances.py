"""Pluggable vector-distance kernels — the {name: kernel} registry
promised in SURVEY.md §2.10.

Reference analog: SelfCleanCleaner accepts a custom pairwise distance
function (selfclean/cleaner/selfclean_cleaner.py:39-40,77-80); its
second built-in is the projective distance
(selfclean/distances/projective_distance.py:6-35):

    d(a, b) = min(|â − b̂|, |â + b̂|) / √2,   â = a/|a|

Since |â − b̂|² = 2 − 2cos(a,b) and |â + b̂|² = 2 + 2cos(a,b), the
min-branch is equivalent to √(1 − |cos(a,b)|) — one native cosine
expression plus abs/sqrt, no second norm pass.  Identical and
antipodal vectors both sit at distance 0 (the projective identity the
reference's formula encodes), orthogonal vectors at 1.

Every kernel maps two array<numeric> column names to a double distance
Column built from native Spark expressions (JVM-side, whole-stage
codegen — no UDF in the pair hot path).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

DistanceKernel = Callable[[str, str], Column]

DISTANCE_KERNELS: dict[str, DistanceKernel] = {}


def register_distance(name: str) -> Callable[[DistanceKernel], DistanceKernel]:
    """Decorator: add a kernel to the registry under ``name``."""

    def deco(fn: DistanceKernel) -> DistanceKernel:
        DISTANCE_KERNELS[name] = fn
        return fn

    return deco


def get_distance(name: str) -> DistanceKernel:
    try:
        return DISTANCE_KERNELS[name]
    except KeyError:
        raise KeyError(
            f"unknown distance kernel {name!r}; registered: "
            f"{sorted(DISTANCE_KERNELS)}"
        ) from None


def cosine_similarity(a: str, b: str) -> Column:
    """Native cosine similarity between two array<float/double> cols."""
    dot = F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)),"
        " cast(0.0 as double), (acc, v) -> acc + v)"
    )
    na = F.sqrt(
        F.expr(
            f"aggregate({a}, cast(0.0 as double),"
            " (acc, v) -> acc + cast(v as double) * cast(v as double))"
        )
    )
    nb = F.sqrt(
        F.expr(
            f"aggregate({b}, cast(0.0 as double),"
            " (acc, v) -> acc + cast(v as double) * cast(v as double))"
        )
    )
    return dot / (na * nb)


@register_distance("cosine")
def cosine_distance(a: str, b: str) -> Column:
    """1 − cos(a, b) ∈ [0, 2] — the reference's default metric
    (selfclean_cleaner.py:137-144 cosine similarity → distance flip)."""
    return F.lit(1.0) - cosine_similarity(a, b)


@register_distance("projective")
def projective_distance(a: str, b: str) -> Column:
    """√(1 − |cos(a, b)|) ∈ [0, 1] ≡ min(|â−b̂|, |â+b̂|)/√2 — the
    reference's projective distance (projective_distance.py:6-35),
    algebraically reduced to one cosine evaluation (see module doc).
    greatest(·, 0) guards the sub-ulp negative that |cos| slightly
    above 1 would otherwise feed into sqrt."""
    return F.sqrt(
        F.greatest(F.lit(1.0) - F.abs(cosine_similarity(a, b)), F.lit(0.0))
    )
