"""As-of join — a custom operator Spark lacks as a built-in.

``asof_join(left, right, ...)`` matches each left row with the most
recent right row at-or-before its timestamp, per key — the canonical
time-series enrichment join (DuckDB/kdb ASOF JOIN, pandas merge_asof).

Implementation is the scalable **union + window** composition, not a
range join: tag both sides, union them, and run ONE window pass
per key ordered by time carrying the last-seen right row forward.
Cost is a single shuffle on (key) + sort on (time) — O(n log n) per
partition, no candidate-pair explosion, no skew beyond the key's own
volume. A range-condition join would build O(left × right-per-key)
intermediates; Catalyst can't prune that for "latest before" semantics.

The carried payload travels as one struct column, so arbitrarily wide
right sides stay a single window expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_cols: list[str] | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """For each left row: columns of the latest right row with
    ``right[right_time] <= left[left_time]`` and equal ``on`` key
    (NULLs when no prior right row exists — LEFT ASOF semantics).

    Tie policy: right rows sharing the exact left timestamp DO match
    (<=); among right rows with identical times the last in (time,
    tag) order wins — deterministic because the right side sorts
    before the left at equal times.
    """
    right_cols = right_cols or [c for c in right.columns if c not in (on, right_time)]

    r = right.select(
        F.col(on).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),  # right sorts BEFORE left at equal times → <= semantics
        F.struct(*[F.col(c) for c in right_cols]).alias("_payload"),
    )
    l = left.select(
        F.col(on).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
    )
    unioned = r.select("_k", "_t", "_side", "_payload", F.lit(None).cast(l.schema["_lrow"].dataType).alias("_lrow")).unionByName(
        l.select("_k", "_t", "_side", F.lit(None).cast(r.schema["_payload"].dataType).alias("_payload"), "_lrow")
    )
    w = W.partitionBy("_k").orderBy("_t", "_side").rowsBetween(W.unboundedPreceding, W.currentRow)
    carried = unioned.withColumn("_asof", F.last("_payload", ignorenulls=True).over(w))
    out = carried.filter(F.col("_side") == 1).select(
        F.col("_lrow.*"),
        *[F.col("_asof").getField(c).alias(c + suffix) for c in right_cols],
    )
    return out
