"""Vector column expressions — JVM-side (codegen'd) math over
array<float|double> embedding columns, plus a vectorized numpy Pandas-UDF
alternative for the brute-force hot path.

The JVM forms keep similarity search inside whole-stage codegen (no Python
worker round-trip); the Arrow/numpy form wins when each task computes
millions of dot products against a broadcast query matrix — bench both.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Σ a_i·b_i — left-to-right fold, the same evaluation order DuckDB's
    list functions use, so oracle comparisons are bit-identical."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    a, b = to_double(a), to_double(b)
    return dot(a, b) / (norm(a) * norm(b))


def hyperplane_sign_bits(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH bucket id: one sign bit per plane, packed into
    a BIGINT. ``planes`` is a small literal matrix (broadcast into the plan
    as constants — no join, no shuffle to bucket a 100 TB table)."""
    v = to_double(vec)
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(float(x)) for x in plane])
        bit = (dot(v, p) >= 0).cast("long")
        bucket = bucket + F.shiftleft(bit, i)
    return bucket
