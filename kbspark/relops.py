"""Relational operators Spark lacks natively, composed from built-ins
(training-pipeline breadth; the reference has no theta/range/as-of joins,
SURVEY §2.C, so these are beyond-reference capabilities).

``asof_join``: for every left row, attach the most recent right row with
``right.ts <= left.ts`` within the same ``by`` key — implemented as the
union+window composition (tag the sides, sort by (ts, side), carry the
last non-null right value forward), which is a single shuffle on the
``by`` key instead of a per-key cross product. Ties at equal ts resolve
to the right side (>= semantics, matching ANSI ASOF JOIN); among right
rows sharing the same (by, ts), the row with the largest payload struct
wins — a deterministic tiebreak, not partition order.
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
    # the carried payload is ONE struct per right row (ts + values), so
    # ts_asof and every value_asof always come from the SAME right row —
    # carrying columns independently with last(ignorenulls) would splice
    # a NULL-valued latest row with an older row's value (round-3 review)
    r_struct = F.struct(
        F.col(ts).alias("_ts"),
        *[F.col(c).alias(f"_v_{c}") for c in value_cols],
    )
    r_tag = right.select(
        by,
        F.col(ts),
        F.lit(0).alias("_side"),
        r_struct.alias("_r"),
    )
    struct_type = r_tag.schema["_r"].dataType
    l_tag = left.withColumn("_side", F.lit(1)).withColumn(
        "_r", F.lit(None).cast(struct_type)
    )
    for c in left.columns:
        if c not in (by, ts):
            r_tag = r_tag.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    unioned = l_tag.unionByName(r_tag.select(l_tag.columns))

    # right rows sort before left rows at equal ts (>= semantics); among
    # right rows sharing the same (by, ts) the payload struct itself is
    # the final sort key, so the carried row is the MAX payload —
    # deterministic under any partitioning (round-4 review: without it,
    # duplicate right keys made value_asof partition-order-dependent)
    w = W.partitionBy(by).orderBy(
        F.col(ts).asc(), F.col("_side").asc(),
        F.col("_r").asc_nulls_first(),
    ).rowsBetween(W.unboundedPreceding, 0)
    carried = unioned.select(
        "*",
        F.last("_r", ignorenulls=True).over(w).alias("_last_r"),
    )
    out = carried.filter(F.col("_side") == 1).select(
        "*",
        F.col("_last_r._ts").alias(f"{ts}{suffix}"),
        *[
            F.col(f"_last_r._v_{c}").alias(f"{c}{suffix}")
            for c in value_cols
        ],
    )
    return out.drop("_side", "_r", "_last_r")
