"""Relational operators Spark lacks natively, composed from built-ins
(training-pipeline breadth; the reference has no theta/range/as-of joins,
SURVEY §2.C, so these are beyond-reference capabilities).

``asof_join``: for every left row, attach the most recent right row with
``right.ts <= left.ts`` within the same ``by`` key — implemented as the
union+window composition (tag the sides, sort by (ts, side), carry the
last non-null right value forward), which is a single shuffle on the
``by`` key instead of a per-key cross product. Ties at equal ts resolve
to the right side (>= semantics, matching ANSI ASOF JOIN).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    ts: str = "ts",
    value_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Columns of ``left`` plus, for each of ``right``'s ``value_cols``
    (default: all non-key non-ts columns), the value from the latest
    right row at-or-before the left row's ``ts`` (NULL if none)."""
    value_cols = value_cols or [
        c for c in right.columns if c not in (by, ts)
    ]
    l_tag = left.withColumn("_side", F.lit(1)).withColumn("_rts", F.lit(None).cast(
        right.schema[ts].dataType
    ))
    for c in value_cols:
        l_tag = l_tag.withColumn(f"_r_{c}", F.lit(None).cast(
            right.schema[c].dataType
        ))
    r_tag = right.select(
        by,
        F.col(ts),
        F.lit(0).alias("_side"),
        F.col(ts).alias("_rts"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
    )
    for c in left.columns:
        if c not in (by, ts):
            r_tag = r_tag.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    unioned = l_tag.unionByName(r_tag.select(l_tag.columns))

    # right rows sort before left rows at equal ts (>= semantics)
    w = W.partitionBy(by).orderBy(F.col(ts).asc(), F.col("_side").asc()).rowsBetween(
        W.unboundedPreceding, 0
    )
    carried = unioned.select(
        "*",
        F.last("_rts", ignorenulls=True).over(w).alias(f"{ts}{suffix}"),
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in value_cols
        ],
    )
    return carried.filter(F.col("_side") == 1).drop(
        "_side", "_rts", *[f"_r_{c}" for c in value_cols]
    )
