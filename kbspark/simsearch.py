"""Embedding similarity search over array<float> columns.

- ``knn_bruteforce``: exact cosine top-k — broadcast the (small) query
  set against the corpus; the dot product runs JVM-side via
  ``F.zip_with`` + ``F.aggregate`` (no Python). The corpus side streams;
  no shuffle except the final per-query top-k.
- ``knn_lsh``: random-hyperplane LSH variant — deterministic
  pseudo-hyperplanes derived from xxhash64, bucket equi-join, exact
  re-rank inside buckets. The 100-TB scale path: candidate generation is
  an equi-join on sign-pattern keys instead of a cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def knn_bruteforce(queries: DataFrame, corpus: DataFrame, k: int = 5,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   round_to: int | None = 4) -> DataFrame:
    """Exact cosine top-k of ``corpus`` for each row of ``queries``
    (self-matches excluded). Output: (query_id, neighbor_id, cosine)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("q_emb")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("c_emb"),
    )
    scored = (
        F.broadcast(q)
        .join(c, F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                _dot(F.col("q_emb"), F.col("c_emb"))
                / (_norm(F.col("q_emb")) * _norm(F.col("c_emb")))
            ).alias("cos"),
        )
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    top = scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
    cosine = F.round("cos", round_to) if round_to is not None else F.col("cos")
    return top.select("query_id", "neighbor_id", cosine.alias("cosine"))


def _hyperplane_sign(vec_col, plane_id: int, dim: int):
    """Sign of <v, h_p> where h_p is a deterministic pseudo-random
    hyperplane: component j of plane p = xxhash64('p:j') scaled to
    [-1, 1]. Fully JVM-side and reproducible across runs/partitions."""
    comps = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: (
            F.xxhash64(F.concat_ws(":", F.lit(plane_id), j.cast("string")))
            .cast("double")
            / F.lit(float(2**63))
        ),
    )
    proj = F.aggregate(
        F.zip_with(vec_col, comps, lambda x, h: x * h),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return F.when(proj >= 0, F.lit(1)).otherwise(F.lit(0))


def knn_lsh(queries: DataFrame, corpus: DataFrame, k: int = 5,
            n_planes: int = 4, n_tables: int = 8, dim: int = 64,
            id_col: str = "vec_id", vec_col: str = "embedding",
            round_to: int | None = 4) -> DataFrame:
    """Approximate cosine top-k: multi-table random-hyperplane LSH.
    Each of ``n_tables`` tables buckets on a ``n_planes``-bit sign
    pattern; candidates = pairs sharing any table bucket; exact re-rank
    on candidates. Recall < 1 by design (ANN); at scale this replaces the
    broadcast cross product with equi-joins on (table, signature)."""

    def with_buckets(df, id_alias, emb_alias):
        v = _as_double(F.col(vec_col))
        tables = F.array(
            *[
                F.struct(
                    F.lit(t).alias("table"),
                    F.concat_ws(
                        "",
                        *[
                            _hyperplane_sign(v, t * n_planes + p, dim).cast("string")
                            for p in range(n_planes)
                        ],
                    ).alias("sig"),
                )
                for t in range(n_tables)
            ]
        )
        return df.select(
            F.col(id_col).alias(id_alias), v.alias(emb_alias),
            F.explode(tables).alias("b"),
        ).select(
            id_alias, emb_alias,
            F.col("b.table").alias("table"), F.col("b.sig").alias("sig"),
        )

    q = with_buckets(queries, "query_id", "q_emb")
    c = with_buckets(corpus, "neighbor_id", "c_emb")
    cand = (
        q.join(c, ["table", "sig"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "q_emb", "neighbor_id", "c_emb")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.select(
        "query_id",
        "neighbor_id",
        (
            _dot(F.col("q_emb"), F.col("c_emb"))
            / (_norm(F.col("q_emb")) * _norm(F.col("c_emb")))
        ).alias("cos"),
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    top = scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
    cosine = F.round("cos", round_to) if round_to is not None else F.col("cos")
    return top.select("query_id", "neighbor_id", cosine.alias("cosine"))
