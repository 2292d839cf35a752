"""E8-E10 — native candidate generation + entity-link scoring
(SURVEY.md §2.E; replaces the reference's two HTTP boundaries,
ned.py:55-83, with in-engine stages — the north_star forbids external
services in the hot path).

Dataflow (reference trace §3.3):

1. mention spans: consecutive B-/I- tagged tokens inside a sentence of
   the `tagged` table become one mention (the /parse analog, E9). Runs in
   the same Arrow batch as the tagged rows — zero shuffle.
2. candidates: normalized mention surface probed against the broadcast
   alias dictionary (labels + titles + redirects; E8 gazetteer).
3. scoring: proba_1 = a-priori link probability (A2) blended with a
   context-similarity term (token-overlap Jaccard between the mention's
   sentence and the candidate title) — E10.
4. ranking: Window per entity_id, descending score; threshold 0.01
   (ned.py:68); mentions with no candidate emit the reference's sentinel
   row page_title='-', wikidata='-', proba=0.0 (ned.py:81).

Output schema mirrors the reference's entity_linking DDL (ned.py:32-34):
(entity_id, page_title, wikidata, proba, on_page_id, on_page, gt).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window as W, functions as F

MENTION_SCHEMA = (
    "on_page_id string, on_page string, entity_id string, surface string, "
    "etype string, gt string, context string"
)


def mention_spans(tagged: DataFrame) -> DataFrame:
    """Group consecutive B-/I- tokens into mention spans (E9).

    ``tagged``: (url, page_title, text, tags, link_titles) with
    array<array<string>> columns. entity_id = '<surface>-<TYPE>-<n>' with
    n the per-page mention ordinal (stable, deterministic). gt = the
    ground-truth link title carried by the B- token (the reference's
    self-labeling trick, ned.py:50-53/88-90)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, page_title, text, tags, links in zip(
                pdf["url"], pdf["page_title"], pdf["text"], pdf["tags"],
                pdf["link_titles"],
            ):
                ordinal = 0
                for sen_toks, sen_tags, sen_links in zip(text, tags, links):
                    current = None  # (surface_tokens, etype, gt)
                    sentence = " ".join(sen_toks)
                    spans = []
                    for tok, tag, link in zip(sen_toks, sen_tags, sen_links):
                        if tag.startswith("B-"):
                            if current:
                                spans.append(current)
                            current = ([tok], tag[2:], link)
                        elif tag.startswith("I-") and current:
                            current[0].append(tok)
                        else:
                            if current:
                                spans.append(current)
                                current = None
                    if current:
                        spans.append(current)
                    for toks, etype, gt in spans:
                        surface = " ".join(toks)
                        rows.append(
                            (url, page_title,
                             f"{surface}-{etype}-{ordinal}", surface, etype,
                             gt, sentence)
                        )
                        ordinal += 1
            yield pd.DataFrame(
                rows,
                columns=["on_page_id", "on_page", "entity_id", "surface",
                         "etype", "gt", "context"],
            )

    return tagged.mapInPandas(run, schema=MENTION_SCHEMA)


def mention_spans_sql(tagged: DataFrame) -> DataFrame:
    """E9 span grouping as pure Catalyst array expressions — the JVM
    twin of ``mention_spans`` (value-identical; parity-tested).

    The pandas version ships the ENTIRE tagged table (nested
    array<array<string>> columns) through Arrow to python workers and
    back — at working-set scale that transfer dominates the EL
    pipeline's wall-clock (round-5 decomposition: spans was the largest
    stage on both dim paths). Here each page row is folded in place:
    ``aggregate`` over the zipped (token, tag, link) triples of each
    sentence rebuilds the exact B-/I- state machine (a dangling I-
    without an open span is ignored, like the python loop), sentences'
    span lists are flattened in order so the per-page mention ordinal is
    just the position in the flattened array, and one ``posexplode``
    emits the rows. Zero python, zero shuffle, and nothing leaves the
    JVM."""
    span_t = "array<struct<surface:string,etype:string,gt:string>>"

    def _zip_truncating(a, b, c):
        # python's zip TRUNCATES to the shortest input; arrays_zip
        # NULL-PADS to the longest, and a null tag would silently drop
        # an open span instead of closing it (round-5 review, verified
        # on a hand-built ragged row). Slicing the ZIPPED array to the
        # common length reproduces zip exactly (and keeps arrays_zip's
        # field names, which slicing the inputs would destroy).
        n = F.least(F.size(a), F.size(b), F.size(c))
        return F.slice(F.arrays_zip(a, b, c), 1, n)

    def sentence_spans(s):
        toks = _zip_truncating(s["text"], s["tags"], s["link_titles"])
        init = F.struct(
            F.array().cast(span_t).alias("spans"),
            F.array().cast("array<string>").alias("toks"),
            F.lit("").alias("etype"),
            F.lit("").alias("gt"),
        )

        def fin(acc):
            return F.struct(
                F.array_join(acc["toks"], " ").alias("surface"),
                acc["etype"].alias("etype"),
                acc["gt"].alias("gt"),
            )

        def step(acc, t):
            tag, tok, link = t["tags"], t["text"], t["link_titles"]
            is_b = tag.startswith("B-")
            is_i = tag.startswith("I-")
            has_cur = F.size(acc["toks"]) > 0
            spans = F.when(
                has_cur & ~(is_i & ~is_b),
                F.concat(acc["spans"], F.array(fin(acc))),
            ).otherwise(acc["spans"])
            toks_new = (
                F.when(is_b, F.array(tok))
                .when(is_i & has_cur, F.concat(acc["toks"], F.array(tok)))
                .otherwise(F.array().cast("array<string>"))
            )
            # etype unbounded like the pandas twin's tag[2:] — a fixed
            # length cap would silently truncate long type names
            # (round-5 review)
            etype = (
                F.when(is_b, tag.substr(F.lit(3), F.length(tag)))
                .when(is_i & has_cur, acc["etype"])
                .otherwise(F.lit(""))
            )
            gt = (
                F.when(is_b, link)
                .when(is_i & has_cur, acc["gt"])
                .otherwise(F.lit(""))
            )
            return F.struct(
                spans.alias("spans"), toks_new.alias("toks"),
                etype.alias("etype"), gt.alias("gt"),
            )

        return F.aggregate(
            toks, init, step,
            lambda acc: F.when(
                F.size(acc["toks"]) > 0,
                F.concat(acc["spans"], F.array(fin(acc))),
            ).otherwise(acc["spans"]),
        )

    # sentence-level raggedness truncates too (python zips the three
    # page arrays)
    sentences = _zip_truncating(
        F.col("text"), F.col("tags"), F.col("link_titles")
    )
    per_sentence = F.transform(
        sentences,
        lambda s: F.struct(
            F.array_join(s["text"], " ").alias("context"),
            sentence_spans(s).alias("spans"),
        ),
    )
    flat = F.flatten(
        F.transform(
            per_sentence,
            lambda s: F.transform(
                s["spans"],
                lambda sp: F.struct(
                    sp["surface"].alias("surface"),
                    sp["etype"].alias("etype"),
                    sp["gt"].alias("gt"),
                    s["context"].alias("context"),
                ),
            ),
        )
    )
    exploded = tagged.select(
        F.col("url").alias("on_page_id"),
        F.col("page_title").alias("on_page"),
        F.posexplode(flat).alias("_ord", "_sp"),
    )
    return exploded.select(
        "on_page_id",
        "on_page",
        F.concat_ws(
            "-", F.col("_sp.surface"), F.col("_sp.etype"),
            F.col("_ord").cast("string")
        ).alias("entity_id"),
        F.col("_sp.surface").alias("surface"),
        F.col("_sp.etype").alias("etype"),
        F.col("_sp.gt").alias("gt"),
        F.col("_sp.context").alias("context"),
    )


def mine_anchor_aliases(mentions: DataFrame, entity_dim: DataFrame,
                        surface_col: str = "surface",
                        target_col: str = "page_title",
                        max_targets_per_surface: int | None = None,
                        dim_hint: str = "broadcast") -> DataFrame:
    """Anchor-text dictionary (E8): corpus-observed (surface -> target)
    link pairs with P(target | surface) — the Wikipedia-anchor analog of
    the reference's a-priori link statistics (its `links` table,
    entities.py:330/363, keyed by surface instead of target).

    ``mentions``: any table with a surface column and a resolved target
    column — the mention_stage output (surface, page_title) or the span
    table (surface, gt). ``entity_dim``: (page_title, QID, TYPE[,
    wikidata]) dictionary. Returns (alias, page_title, QID, TYPE, proba)
    where proba is the per-surface target probability. Two-phase agg;
    skew-safe (counts).

    ``max_targets_per_surface`` (scale knob, VERDICT r01 #6): the mined
    dictionary grows with the corpus (unlike the reference's fixed
    entity dictionary); keeping only the top-k targets per surface (by
    count, title tiebreak) bounds it at k * n_distinct_surfaces so the
    EL join side stays broadcastable far longer — and beyond that,
    ``link_entities(aliases_hint='auto')`` shuffle-joins instead of
    OOMing executors.

    ``dim_hint``: 'broadcast' forces a broadcast of ``entity_dim``
    (dictionary-sized dims); 'auto' leaves the join strategy to the
    planner/AQE — required when the dim itself is corpus-scaling (the
    frame-dim pipelines, VERDICT r02 #2)."""
    cols = mentions.columns
    base = mentions
    if "entity_type" in cols:
        base = base.filter(F.col("entity_type") != "O")
    pairs = (
        base.filter(F.col(target_col) != "")
        .select(
            F.replace(F.col(surface_col), F.lit(" "), F.lit("_")).alias("alias"),
            F.col(target_col).alias("page_title"),
        )
        .groupBy("alias", "page_title")
        .agg(F.count("*").alias("n"))
    )
    w_tot = W.partitionBy("alias")
    scored = pairs.withColumn(
        "proba", F.round(F.col("n") / F.sum("n").over(w_tot), 6)
    )
    if max_targets_per_surface is not None:
        w_rank = W.partitionBy("alias").orderBy(
            F.col("n").desc(), F.col("page_title").asc()
        )
        scored = (
            scored.withColumn("_rk", F.row_number().over(w_rank))
            .filter(F.col("_rk") <= max_targets_per_surface)
            .drop("_rk")
        )
    dim = F.broadcast(entity_dim) if dim_hint == "broadcast" else entity_dim
    return scored.join(dim, "page_title").select(
        "alias", "page_title", "QID", "TYPE", "proba"
    )


def entity_context_profiles(spans: DataFrame, top_k: int = 50) -> DataFrame:
    """Per-entity context term profiles (the E10 context-similarity
    model): for every labeled mention, count the terms of its sentence
    against the linked entity; keep each entity's top-k terms. Two-phase
    agg + window top-k; profiles are broadcast-sized (entities × k).

    Returns (page_title, profile array<string>). Deterministic: ties in
    term count break on the term string."""
    terms = (
        spans.filter(F.col("gt") != "")
        .select(
            F.col("gt").alias("page_title"),
            F.explode(
                F.array_distinct(F.split(F.lower(F.col("context")), r"[\s_]+"))
            ).alias("term"),
        )
        .filter(F.length("term") > 1)
        .groupBy("page_title", "term")
        .agg(F.count("*").alias("n"))
    )
    w = W.partitionBy("page_title").orderBy(
        F.col("n").desc(), F.col("term").asc()
    )
    return (
        terms.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= top_k)
        .groupBy("page_title")
        .agg(
            F.array_sort(F.collect_list("term")).alias("profile")
        )
    )


def filter_mentions(
    mentions: DataFrame,
    entity_types: set[str] | None = None,
    min_count_per_doc: int | None = None,
) -> DataFrame:
    """The reference's pre-EL selection filters (ned.py:13-14, 25-26,
    61-65): keep only mentions of the given types, and only documents
    with at least ``min_count_per_doc`` mentions (a groupBy-having
    semi-join instead of the reference's per-page dict check)."""
    out = mentions
    if entity_types is not None:
        out = out.filter(F.col("etype").isin(*entity_types))
    if min_count_per_doc is not None:
        eligible = (
            out.groupBy("on_page_id")
            .agg(F.count("*").alias("_n"))
            .filter(F.col("_n") >= min_count_per_doc)
            .select("on_page_id")
        )
        out = out.join(eligible, "on_page_id", "left_semi")
    return out


def build_alias_dict(
    aliases: DataFrame, profiles: DataFrame | None = None
) -> DataFrame:
    """Pre-aggregate the alias dictionary to ONE row per alias carrying
    its candidate structs ``(page_title, wikidata, prior, profile)`` —
    the build side of the EL probe join (see ``link_entities``). With
    ``profiles`` given, each candidate carries its trained term profile
    (dict-sized left join); without, it carries its own title tokens.
    All dictionary-sized work: at 100 TB this is the only shuffle the
    linking stage performs."""
    if "wikidata" not in aliases.columns:
        aliases = aliases.withColumn("wikidata", F.col("QID"))
    if profiles is not None:
        aliases = aliases.join(profiles, "page_title", "left")
        prof_col = F.coalesce(
            F.col("profile"), F.array().cast("array<string>")
        )
    else:
        prof_col = F.array_distinct(
            F.split(F.lower(F.col("page_title")), r"[\s_]+")
        )
    return aliases.groupBy("alias").agg(
        F.collect_list(
            F.struct(
                F.col("page_title"),
                F.coalesce(F.col("wikidata"), F.col("QID")).alias("wikidata"),
                F.coalesce(F.col("proba"), F.lit(0.0)).alias("prior"),
                prof_col.alias("profile"),
            )
        ).alias(
            # record HOW the profile column was built (ADVICE r05): a
            # dict built without trained profiles probed under
            # profiles!=None would silently score title tokens with the
            # overlap-coefficient formula; link_entities asserts the
            # flag matches before probing a prebuilt dict.
            "_cands",
            metadata={"with_profiles": profiles is not None},
        )
    )


def link_entities(
    mentions: DataFrame,
    aliases: DataFrame,
    profiles: DataFrame | None = None,
    threshold: float = 0.01,
    context_weight: float = 0.5,
    aliases_hint: str = "broadcast",
    dict_df: DataFrame | None = None,
) -> DataFrame:
    """E10 scoring + ranking. ``aliases``: dictionary with
    (alias, page_title, QID, TYPE, proba). ``profiles``: optional
    per-entity context profiles from ``entity_context_profiles`` — when
    given, the context term is overlap(mention sentence, candidate
    profile); otherwise overlap(mention sentence, candidate title).
    Returns the reference-shaped entity_linking table including sentinel
    rows and a rank column.

    ``aliases_hint``: 'broadcast' forces a broadcast join — right for a
    fixed KB dictionary. 'auto' leaves the choice to the planner/AQE:
    corpus-MINED dictionaries grow with the corpus and a forced broadcast
    OOMs executors at 100x scale; under 'auto' Spark broadcasts while the
    dict is under the threshold and falls back to a shuffle join above it
    (same semantics either way).

    Plan shape (round 5, VERDICT r04 #3): the dictionary is
    pre-aggregated to ONE row per alias carrying its candidate structs
    (profiles folded in first — dict-sized joins only), so the probe
    join emits one row per MENTION, not per candidate, and scoring +
    threshold + ranking + sentinel emission all happen inside array
    expressions on that row. The earlier per-candidate window
    (partitionBy mention, orderBy score) shuffled and sorted the whole
    candidate table — ~k× the mention count — every run; per-mention
    candidate sets are dictionary-capped (mining caps targets/surface at
    8), so a JVM-side array sort of ≤~10 elements replaces the engine's
    widest exchange. At 100 TB the only shuffle left in this stage is
    building the dictionary itself. ``posexplode_outer`` emits the
    sentinel row natively (an empty ranked array explodes to one NULL
    row) so the whole score→filter→sort chain is evaluated exactly once
    per mention — a when/otherwise emission evaluated it 2-3×, measured
    ~2× stage cost.

    ``dict_df``: a pre-built (and typically persisted) dictionary from
    ``build_alias_dict`` — callers that probe repeatedly, or benchmarks
    that charge dictionary construction to its own stage, pass it to
    skip the in-line build. ``profiles`` still selects the similarity
    formula (overlap coefficient with trained profiles, token Jaccard
    without)."""
    if aliases_hint not in ("broadcast", "auto"):
        raise ValueError(f"unknown aliases_hint: {aliases_hint}")
    if dict_df is not None and "_cands" in dict_df.columns:
        md = dict_df.schema["_cands"].metadata
        if "with_profiles" in md and bool(md["with_profiles"]) != (
            profiles is not None
        ):
            raise ValueError(
                "dict_df was built with profiles="
                f"{bool(md['with_profiles'])} but link_entities was "
                f"called with profiles={profiles is not None}; the "
                "similarity formula would silently mismatch — rebuild "
                "the dictionary with the same profiles setting"
            )

    def sized(df):
        return F.broadcast(df) if aliases_hint == "broadcast" else df

    # profiles are keyed by page_title like the alias dictionary — they
    # fold into the DICTIONARY once (dict-sized joins; round-4
    # el_stages.link profiling: a candidate-table profile join was a
    # whole extra pass over the big side)
    dict_agg = (
        build_alias_dict(aliases, profiles) if dict_df is None else dict_df
    )

    norm_surface = F.replace(F.col("surface"), F.lit(" "), F.lit("_"))
    probe = mentions.withColumn("_alias", norm_surface).withColumn(
        # tokenize each mention's sentence ONCE per mention — never per
        # candidate row
        "_ctx",
        F.array_distinct(F.split(F.lower(F.col("context")), r"[\s_]+")),
    )
    cand = probe.join(
        sized(dict_agg.withColumnRenamed("alias", "_alias")), "_alias", "left"
    )

    ctx = F.col("_ctx")
    if profiles is not None:
        # overlap coefficient vs the entity's trained term profile
        def context_sim(c):
            inter = F.size(F.array_intersect(ctx, c["profile"])).cast("double")
            denom = F.greatest(
                F.least(F.size(ctx), F.size(c["profile"])), F.lit(1)
            ).cast("double")
            return inter / denom
    else:
        # token-set Jaccard vs the title tokens (profile column above)
        def context_sim(c):
            inter = F.size(F.array_intersect(ctx, c["profile"])).cast("double")
            union = F.size(F.array_union(ctx, c["profile"])).cast("double")
            return F.when(union > 0, inter / union).otherwise(F.lit(0.0))

    def score(c):
        p = F.round(
            (1 - context_weight) * c["prior"] + context_weight * context_sim(c),
            6,
        )
        # leading fields are the sort keys: score desc (negated, asc),
        # then page_title asc — the same order the per-candidate window
        # used, so ranks are value-identical
        return F.struct(
            (-p).alias("_negp"),
            c["page_title"].alias("page_title"),
            c["wikidata"].alias("wikidata"),
            p.alias("proba"),
        )

    scored = F.sort_array(
        F.filter(
            F.transform(F.coalesce(F.col("_cands"), F.array()), score),
            lambda c: c["proba"] >= threshold,
        )
    )
    # a mention with no candidate at/above threshold emits the
    # reference's one sentinel row (ned.py:81): posexplode_OUTER turns
    # the empty ranked array into exactly one NULL row, projected to the
    # '-' sentinel below — no union branch, no anti-join, and the score
    # chain is evaluated once per mention
    exploded = cand.select(
        "entity_id", "on_page_id", "on_page", "gt",
        F.posexplode_outer(scored).alias("_pos", "_c"),
    )
    is_sent = F.col("_pos").isNull()
    return exploded.select(
        "entity_id",
        F.when(is_sent, F.lit("-")).otherwise(
            F.col("_c.page_title")
        ).alias("page_title"),
        F.when(is_sent, F.lit("-")).otherwise(
            F.col("_c.wikidata")
        ).alias("wikidata"),
        F.when(is_sent, F.lit(0.0)).otherwise(F.col("_c.proba")).alias(
            "proba"
        ),
        "on_page_id",
        "on_page",
        "gt",
        F.coalesce(F.col("_pos") + 1, F.lit(1)).alias("rank"),
    )


def linking_quality(el: DataFrame) -> DataFrame:
    """Precision/recall of rank-1 links against the self-labeling ground
    truth (gt) — the P/R >= 0.95 gate's measurement query."""
    top = el.filter(F.col("rank") == 1)
    return top.agg(
        F.count("*").alias("n_mentions"),
        F.sum(
            F.when(
                (F.col("page_title") != "-")
                & (F.col("page_title") == F.col("gt")),
                1,
            ).otherwise(0)
        ).alias("n_correct"),
        F.sum(F.when(F.col("page_title") != "-", 1).otherwise(0)).alias(
            "n_predicted"
        ),
        F.sum(F.when(F.col("gt") != "", 1).otherwise(0)).alias("n_labeled"),
    ).select(
        "n_mentions",
        "n_correct",
        "n_predicted",
        "n_labeled",
        F.round(F.col("n_correct") / F.col("n_predicted"), 6).alias("precision"),
        F.round(F.col("n_correct") / F.col("n_labeled"), 6).alias("recall"),
    )
