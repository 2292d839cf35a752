"""A1 — iterative graph closure (the reference's recursive category
descent, wikipedia/entities.py:9-48, cycle-guarded by a `found` set).

Spark has no recursive CTE in the DataFrame API, so the closure is a
driver-side fixpoint of joins:

    frontier(0) = roots
    frontier(i+1) = distinct(frontier(i) ⋈ edges) \\ visited
    visited     = visited ∪ frontier(i+1)

Cycle safety comes from the anti-join against `visited` (the `found` set
analog). Lineage is truncated with ``localCheckpoint`` every few
iterations — without it the plan doubles per level and the job dies on
deep graphs (SURVEY §4 "recursion cycle guard").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def reachable(
    edges: DataFrame,
    roots: DataFrame,
    src: str = "src",
    dst: str = "dst",
    node: str = "node",
    max_iterations: int = 50,
    checkpoint_every: int = 5,
) -> DataFrame:
    """All nodes reachable from ``roots`` (inclusive) through ``edges``.

    ``edges``: DataFrame with columns (src, dst); ``roots``: DataFrame
    with column ``node``. Returns a single-column DataFrame ``node``.
    """
    edges = edges.select(F.col(src).alias("_src"), F.col(dst).alias("_dst"))
    visited = roots.select(F.col(node).alias(node)).distinct().localCheckpoint()
    frontier = visited

    for i in range(max_iterations):
        nxt = (
            frontier.join(edges, frontier[node] == edges["_src"])
            .select(F.col("_dst").alias(node))
            .distinct()
        )
        new = nxt.join(visited, node, "left_anti")
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            new = new.localCheckpoint()
        else:
            new = new.persist()
        if new.isEmpty():
            break
        visited = visited.unionByName(new).distinct().localCheckpoint()
        frontier = new
    return visited


def descendant_edges(edges: DataFrame, root: str, parent: str = "cl_to",
                     child_title: str = "page_title") -> DataFrame:
    """The reference's get_sub_cats (wikipedia/entities.py:33-48): all
    distinct edge rows whose parent category is in the transitive closure
    below ``root``. ``edges`` columns: (cl_to = parent title, cl_from =
    child page id, page_title = child's title when the child is itself a
    category, else NULL — the reference's left join entities.py:40-42).
    Only titled (category) children are descended into, matching the
    reference's ``cats.dropna()`` recursion guard (entities.py:20)."""
    import pandas as pd

    spark = edges.sparkSession
    roots = spark.createDataFrame(pd.DataFrame({"node": [root]}))
    closure = reachable(
        edges.filter(F.col(child_title).isNotNull()).select(
            F.col(parent).alias("src"), F.col(child_title).alias("dst")
        ),
        roots,
    )
    return edges.join(
        F.broadcast(closure.withColumnRenamed("node", parent)), parent
    ).distinct()


def category_member_pages(pages: DataFrame, cats: DataFrame,
                          drop_prefix: str = "Liste_") -> DataFrame:
    """The reference's get_category_pages (entities.py:51-67): ns-0 pages
    that are members of any closure category (semi-join on cl_from =
    page_id), minus the list-page prefix (P2)."""
    page0 = pages.filter(F.col("page_namespace") == 0).select(
        "page_id", "page_title"
    )
    member_ids = cats.select(F.col("cl_from").alias("page_id")).distinct()
    return page0.join(member_ids, "page_id", "left_semi").filter(
        ~F.col("page_title").startswith(drop_prefix)
    )
