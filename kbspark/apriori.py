"""A2 — a-priori link probabilities with explicit skew handling.

The reference computes, per entity, count(links where target==entity) /
count(links) as N parallel SQLite point queries
(wikipedia/entities.py:320-375). Here it is one aggregation; the
north_rule requires head-entity skew (high-frequency QIDs) to be handled
explicitly, so the aggregation is **two-phase salted**:

    phase 1: groupBy(key, salt)  — salt = pmod(hash(row-local column), S)
             shards each hot key across S reducers; partial counts
    phase 2: groupBy(key)        — sums the S partials

Phase 1 rows are at most S per key, so phase 2 is skew-free by
construction. Results are exactly equal to the unsalted aggregation
(asserted in tests and in the driver contract: a2_apriori_salted runs
the plain AND the salted aggregation against one oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_count(df: DataFrame, key: str, n_salts: int = 16,
                 weight_col: str | None = None) -> DataFrame:
    """Two-phase salted count per key → columns (key, n_links).
    ``weight_col`` turns the count into a weighted sum (e.g. rows that
    carry pre-aggregated occurrence counts)."""
    salt = F.pmod(F.spark_partition_id() + F.monotonically_increasing_id(), n_salts)
    agg = (
        F.sum(F.col(weight_col)) if weight_col is not None else F.count("*")
    ).alias("_partial")
    partial = df.withColumn("_salt", salt).groupBy(key, "_salt").agg(agg)
    return partial.groupBy(key).agg(F.sum("_partial").cast("bigint").alias("n_links"))


def apriori_probs(links: DataFrame, target_col: str = "target",
                  n_salts: int = 16, weight_col: str | None = None) -> DataFrame:
    """links table → (target, n_links, proba); proba = n_links / total
    (wikipedia/entities.py:370-372)."""
    if weight_col is not None:
        total = links.agg(F.sum(weight_col)).collect()[0][0] or 0
    else:
        total = links.count()
    counts = salted_count(links, key=target_col, n_salts=n_salts,
                          weight_col=weight_col)
    return counts.withColumn(
        "proba", F.col("n_links") / F.lit(float(total))
    )


def attach_probs(entities: DataFrame, links: DataFrame,
                 entity_key: str = "page_title",
                 target_col: str = "target",
                 weight_col: str | None = None,
                 probs_hint: str = "broadcast") -> DataFrame:
    """Join probabilities back onto the entity dictionary; entities with
    no links get proba 0.0 (the reference's count=0/total).

    ``probs_hint``: 'broadcast' for dictionary-sized entity sets,
    'auto' to let the planner/AQE choose when the dictionary is itself
    corpus-scaling (the frame-dim KB path, round-3 review)."""
    probs = apriori_probs(links, target_col=target_col, weight_col=weight_col)
    keyed = probs.withColumnRenamed(target_col, entity_key)
    if probs_hint == "broadcast":
        keyed = F.broadcast(keyed)
    return (
        entities.join(
            keyed,
            entity_key,
            "left",
        )
        .withColumn("proba", F.coalesce(F.col("proba"), F.lit(0.0)))
        .withColumn("n_links", F.coalesce(F.col("n_links"), F.lit(0)))
    )
