"""Entity-dictionary build — the reference's `join-entities` stage
(SURVEY.md §3.2; qurator/wikidata/entities.py:5-80) re-expressed as one
Spark job of unions, window dedups and regex extracts.

Input: per-class seed DataFrames (the SPARQL result frames, one per
sparql/*.query) with *varying optional columns*, plus the work-of-arts
exclusion set. Output: the canonical entity dictionary keyed by
page_title — broadcast-sized, the central dimension of the whole engine.

Semantics replicated exactly (each step cites its reference line):

 1. per class group: ordered union-by-name, dedup keep-FIRST on the class
    URI column, anti-join the work-of-arts set     (entities.py:15-26)
 2. union PER/LOC/ORG groups by name               (entities.py:34)
 3. lenient date coercion -> NULL on failure       (entities.py:36-37)
 4. per-QID first non-null per column, in union order (entities.py:39)
 5. WKT coords regex -> longitude/latitude strings (entities.py:41-45)
 6. ordered keep-first per QID, NaT last           (entities.py:49-53)
 7. PER/LOC/ORG membership flags                   (entities.py:55-61)
 8. page_title = unquote(sitelink - site prefix)   (entities.py:63)
 9. PER & ORG -> ORG wins (PER flag cleared)       (entities.py:67)
10. TYPE string from flags                         (entities.py:69-70)
11. dedup page_title keep-first + QID regex        (entities.py:72-78)

Row order in pandas is implicit; here every frame carries an explicit
``_ord`` (class_rank, row_in_class) ordering column so "first" is
deterministic under any partitioning.
"""

from __future__ import annotations

from urllib.parse import unquote

import pandas as pd
from pyspark.sql import DataFrame, Window as W, functions as F
from pyspark.sql import types as T

from kbspark.session import persist_tracked

PER_CLASSES = ["subject", "fictional-character", "fictional-person"]
LOC_CLASSES = ["geographic-entity", "fictional-location"]
ORG_CLASSES = [
    "armed-organization",
    "association",
    "business",
    "fictional-organisation",
    "group-of-people",
    "institution",
    "organ",
]

#: columns the canonical dictionary always carries (missing seed columns
#: are NULL-filled by the union, like pandas concat(sort=True))
SEED_VALUE_COLS = ["label", "sitelink", "dateofbirth", "inception", "coords", "gndid"]


def _with_ord(df: DataFrame, class_rank: int) -> DataFrame:
    """Attach the deterministic (class_rank, seq) ordering. Seed frames
    must carry a stable ``_seq`` column (row order within the seed file);
    if absent, a file-order surrogate is derived — only safe for
    single-file seeds."""
    if "_seq" not in df.columns:
        df = df.withColumn("_seq", F.monotonically_increasing_id())
    # band must exceed any surrogate _seq: monotonically_increasing_id
    # is partitionId*2^33 + row, so 10**15 holds up to ~116k partitions
    # (round-3 review: 10**12 overflowed from partition 117 on)
    return df.withColumn(
        "_ord", F.lit(class_rank).cast("long") * F.lit(10**15) + F.col("_seq")
    )


def load_class_group(
    class_frames: dict[str, DataFrame],
    classes: list[str],
    entity_type_col: str,
    woa: DataFrame,
) -> DataFrame:
    """Reference load_classes (entities.py:15-26): ordered union of the
    group's class frames, keep-first dedup on the class URI column,
    work-of-arts anti-join, rename URI column to ``wikidata``."""
    unioned = None
    for rank, cls in enumerate(classes):
        df = _with_ord(class_frames[cls], rank)
        unioned = df if unioned is None else unioned.unionByName(
            df, allowMissingColumns=True
        )
    # drop_duplicates(subset=[entity_type]) keep='first' in concat order
    w = W.partitionBy(entity_type_col).orderBy(F.col("_ord").asc())
    deduped = (
        unioned.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    # ~tmp[entity_type].isin(woa.woa)  (entities.py:22) -> anti join
    out = deduped.join(
        F.broadcast(woa.select(F.col("woa").alias(entity_type_col))),
        entity_type_col,
        "left_anti",
    )
    return out.withColumnRenamed(entity_type_col, "wikidata")


_COERCE_SCHEMA = T.TimestampType()


@F.pandas_udf(_COERCE_SCHEMA)
def coerce_datetime(s: pd.Series) -> pd.Series:
    """E12: pandas to_datetime(yearfirst=True, errors='coerce') parity
    (entities.py:36-37) — out-of-range/garbage dates become NULL, exactly
    as the reference's NaT."""
    return pd.to_datetime(s, yearfirst=True, errors="coerce")


@F.pandas_udf(T.StringType())
def url_unquote(s: pd.Series) -> pd.Series:
    """Percent-decoding with urllib semantics (entities.py:63). Spark's
    url_decode decodes '+' as space; urllib.parse.unquote does not —
    hence the pandas UDF (SURVEY §2.E E7)."""
    return s.map(lambda v: unquote(v) if v is not None else None)


_COORDS_RE = r"Point\(([\-0-9E.]+)\W.([\-0-9E.]+)\)"


def build_entities(
    class_frames: dict[str, DataFrame],
    woa: DataFrame,
    site: str,
) -> DataFrame:
    """The full load_entities dataflow. Returns the canonical dictionary:
    (page_title, wikidata, QID, label, sitelink, TYPE, PER, LOC, ORG,
    dateofbirth, inception, longitude, latitude, gndid)."""
    # each group frame feeds BOTH the main union and its membership-flag
    # join — persist so the per-group union/dedup subplan runs once, not
    # once per consumer (dictionary-sized by definition)
    per = persist_tracked(load_class_group(class_frames, PER_CLASSES, "person", woa))
    loc = persist_tracked(load_class_group(class_frames, LOC_CLASSES, "location", woa))
    org = persist_tracked(
        load_class_group(class_frames, ORG_CLASSES, "organisation", woa)
    )

    # group rank keeps pandas concat order per/loc/org (entities.py:34)
    per = per.withColumn("_ord", F.col("_ord") + F.lit(0 * 10**17))
    loc = loc.withColumn("_ord", F.col("_ord") + F.lit(1 * 10**17))
    org = org.withColumn("_ord", F.col("_ord") + F.lit(2 * 10**17))

    ent = per.unionByName(loc, allowMissingColumns=True).unionByName(
        org, allowMissingColumns=True
    )
    for c in SEED_VALUE_COLS:
        if c not in ent.columns:
            ent = ent.withColumn(c, F.lit(None).cast("string"))

    ent = ent.withColumn("dateofbirth", coerce_datetime("dateofbirth")).withColumn(
        "inception", coerce_datetime("inception")
    )

    # groupby('wikidata').first() — per column, first non-null in union
    # order (entities.py:39; pandas .first() skips NaN per column)
    first_cols = [
        F.expr(f"min_by({c}, _ord) FILTER (WHERE {c} IS NOT NULL)").alias(c)
        for c in SEED_VALUE_COLS
    ]
    ent = ent.groupBy("wikidata").agg(
        F.min("_ord").alias("_ord"), *first_cols
    )

    # coords regex (entities.py:41-45) — strings, not geometry
    ent = ent.withColumn(
        "longitude", F.nullif(F.regexp_extract("coords", _COORDS_RE, 1), F.lit(""))
    ).withColumn(
        "latitude", F.nullif(F.regexp_extract("coords", _COORDS_RE, 2), F.lit(""))
    )

    # sort (dateofbirth, inception) NaT-last + keep-first per wikidata
    # (entities.py:49-53). After the groupBy wikidata is unique, but the
    # window keeps the semantics explicit (and correct if inputs change).
    w = W.partitionBy("wikidata").orderBy(
        F.col("dateofbirth").asc_nulls_last(),
        F.col("inception").asc_nulls_last(),
        F.col("_ord").asc(),
    )
    ent = ent.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") == 1
    ).drop("_rn")

    # membership flags from the (pre-dedup) group URI sets (entities.py:55-61)
    for flag, group in (("PER", per), ("LOC", loc), ("ORG", org)):
        members = group.select("wikidata").distinct().withColumn(flag, F.lit(True))
        ent = ent.join(F.broadcast(members), "wikidata", "left").withColumn(
            flag, F.coalesce(F.col(flag), F.lit(False))
        )

    # page_title from sitelink (entities.py:63)
    ent = ent.withColumn(
        "page_title",
        url_unquote(F.replace(F.col("sitelink"), F.lit(site), F.lit(""))),
    )

    # PER & ORG -> drop PER (entities.py:67)
    ent = ent.withColumn(
        "PER", F.when(F.col("PER") & F.col("ORG"), F.lit(False)).otherwise(F.col("PER"))
    )

    # TYPE string composition (entities.py:69-70):
    # ('PER|' if p else '|') + ('LOC|' if l else '|') + ('ORG' if o else '')
    # then strip('|')
    raw_type = F.concat(
        F.when(F.col("PER"), F.lit("PER|")).otherwise(F.lit("|")),
        F.when(F.col("LOC"), F.lit("LOC|")).otherwise(F.lit("|")),
        F.when(F.col("ORG"), F.lit("ORG")).otherwise(F.lit("")),
    )
    ent = ent.withColumn(
        "TYPE", F.regexp_replace(F.regexp_replace(raw_type, r"^\|+", ""), r"\|+$", "")
    )

    # dedup page_title keep-first in current (sorted) order
    # (entities.py:72: ~index.duplicated() after set_index). Row order at
    # that point is (dateofbirth, inception) ascending NaT-last with ties
    # in post-groupby order — and pandas groupby SORTS by key, so the tie
    # order is wikidata ascending, not concat order.
    wt = W.partitionBy("page_title").orderBy(
        F.col("dateofbirth").asc_nulls_last(),
        F.col("inception").asc_nulls_last(),
        F.col("wikidata").asc(),
    )
    ent = ent.withColumn("_rn", F.row_number().over(wt)).filter(
        F.col("_rn") == 1
    ).drop("_rn")

    # QID extraction (entities.py:74)
    ent = ent.withColumn(
        "QID", F.nullif(F.regexp_extract("wikidata", r".*?(Q[0-9]+).*?", 1), F.lit(""))
    )

    return ent.select(
        "page_title", "wikidata", "QID", "label", "sitelink", "TYPE",
        "PER", "LOC", "ORG", "dateofbirth", "inception",
        "longitude", "latitude", "gndid",
    )


def wikidata_mapping(
    entities: DataFrame,
    qid_tables: dict[str, DataFrame],
    languages: list[str],
) -> DataFrame:
    """QID cross-language mapping (reference wikidatamapping,
    wikipedia/entities.py:250-317): per language a (page_title, QID)
    table from page⋈page_props; first language joins the entity dict
    inner, the rest chain in as left joins on QID (J4).

    ``qid_tables[lang]``: DataFrame (page_title, QID) already filtered to
    ns=0 / pp_propname='wikibase_item' (the reference's qid_query,
    entities.py:285-287). Returns one wide row per entity:
    (QID, <LANG1>, <LANG2>, ..., TYPE)."""
    first = languages[0]
    mapping = entities.select("page_title", "TYPE").join(
        qid_tables[first].withColumnRenamed("page_title", first),
        F.col("page_title") == F.col(first),
        "inner",
    ).drop("page_title")
    for lang in languages[1:]:
        tmp = qid_tables[lang].withColumnRenamed("page_title", lang)
        mapping = mapping.join(F.broadcast(tmp), "QID", "left")
    return mapping.select("QID", *languages, "TYPE")


def per_language_entities(mapping: DataFrame, lang: str) -> DataFrame:
    """The reference's per-language output (entities.py:305-317): the
    mapping is sorted by QID and then deduplicated keep-first on the
    language's title — so for an ambiguous title the MIN-QID row's TYPE
    survives (round-3 review: ordering by TYPE diverged from the
    reference). (page_title, TYPE) for one language, nulls dropped."""
    out = (
        mapping.select(F.col(lang).alias("page_title"), "TYPE", "QID")
        .dropna(how="any")
    )
    w = W.partitionBy("page_title").orderBy(
        F.col("QID").asc(), F.col("TYPE").asc()
    )
    return (
        out.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "QID")
    )


def hash_split(
    df: DataFrame,
    key_col: str,
    fractions: dict[str, float],
    seed: int = 41,
) -> DataFrame:
    """O3 — deterministic train/dev/test split. The reference permutes
    row positions with a seeded RandomState (ner.py:317,336-346), which
    is partition-order-dependent; distributed engines need a
    content-hash split instead (intentional, documented deviation —
    SURVEY §2.F O3). Split = first md5 nibbles of (seed || key) mapped
    to [0,1), stable across partitionings, engines and runs.

    Returns ``df`` plus a ``split`` column."""
    total = sum(fractions.values())
    if total > 1.0 + 1e-9:
        raise ValueError("fractions must sum to <= 1.0")
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(str(seed)), F.lit(":"),
                                   F.col(key_col).cast("string"))), 1, 8),
        16, 10,
    ).cast("double") / F.lit(float(16**8))
    lo = 0.0
    # build a CASE over cumulative fraction boundaries
    conds = []
    for name, frac in fractions.items():
        conds.append((name, lo, lo + frac))
        lo += frac
    expr = None
    for name, a, b in reversed(conds):
        branch = F.when((h >= a) & (h < b), F.lit(name))
        expr = branch.otherwise(expr) if expr is not None else branch
    return df.withColumn("split", F.coalesce(expr, F.lit("rest")))


def aliases_table(entities: DataFrame, redirects: DataFrame) -> DataFrame:
    """Alias dictionary for gazetteer matching (E8): entity titles +
    labels + redirect source titles, each mapping to the canonical
    page_title/QID."""
    own = entities.select(
        F.col("page_title").alias("alias"), "page_title", "QID", "TYPE"
    )
    lab = entities.filter(F.col("label").isNotNull()).select(
        F.replace(F.col("label"), F.lit(" "), F.lit("_")).alias("alias"),
        "page_title",
        "QID",
        "TYPE",
    )
    red = redirects.select(
        F.col("rd_from_title").alias("alias"),
        F.col("page_title"),
        F.col("QID"),
        F.col("TYPE"),
    )
    out = own.unionByName(lab).unionByName(red)
    w = W.partitionBy("alias").orderBy(F.col("page_title").asc())
    return out.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") == 1
    ).drop("_rn")
