"""E8-E10 entity linking: mention-span grouping, candidate scoring,
sentinel rows, and P/R >= 0.95 on the synthetic corpus (the BASELINE.json
gate, measured with the reference's self-labeling gt)."""

import pandas as pd
from pyspark.sql import functions as F

from kbspark.apriori import attach_probs
from kbspark.corpus import synth_corpus, synth_dims
from kbspark.extract import annotate_stage, mention_stage
from kbspark.linking import (
    entity_context_profiles,
    link_entities,
    linking_quality,
    mention_spans,
    mine_anchor_aliases,
)


def _tagged(spark, n_pages=60, seed=21):
    pages = spark.createDataFrame(synth_corpus(n_pages, seed=seed))
    entity_types, redirects = synth_dims()
    return (
        pages,
        entity_types,
        redirects,
        annotate_stage(pages, spark, entity_types, redirects),
    )


def test_mention_spans_grouping(spark):
    tagged = spark.createDataFrame(
        pd.DataFrame(
            {
                "url": ["u1"],
                "page_title": ["P1"],
                "text": [[["Franz", "Kafka", "liest", "."], ["Ende", "."]]],
                "tags": [[["B-PER", "I-PER", "O", "O"], ["O", "O"]]],
                "link_titles": [[["Kafka", "Kafka", "", ""], ["", ""]]],
            }
        )
    )
    spans = mention_spans(tagged).toPandas()
    assert len(spans) == 1
    row = spans.iloc[0]
    assert row["surface"] == "Franz Kafka"
    assert row["etype"] == "PER"
    assert row["gt"] == "Kafka"
    assert row["entity_id"] == "Franz Kafka-PER-0"


def test_mention_spans_sql_parity(spark):
    """mention_spans_sql (pure Catalyst state machine) must be
    value-identical to the pandas version on a real annotated corpus —
    same rows, same columns, same ordinals — plus the tricky state
    transitions on a hand-built page (dangling I- without an open span,
    span cut by O, back-to-back B- spans, multi-sentence ordinals,
    empty trailing sentence)."""
    from kbspark.linking import mention_spans_sql

    _, _, _, tagged = _tagged(spark)
    key = ["on_page_id", "entity_id"]
    a = mention_spans(tagged).toPandas().sort_values(key).reset_index(drop=True)
    b = (
        mention_spans_sql(tagged).toPandas().sort_values(key)
        .reset_index(drop=True)
    )
    assert len(a) > 0
    pd.testing.assert_frame_equal(a, b)

    tricky = spark.createDataFrame(
        pd.DataFrame(
            {
                "url": ["u1"],
                "page_title": ["P1"],
                "text": [[
                    ["Lost", "Franz", "Kafka", "und", "Anna", "Bern"],
                    ["Paris", "ist", "gross", "."],
                    [],
                ]],
                "tags": [[
                    ["I-PER", "B-PER", "I-PER", "O", "B-PER", "B-LOC"],
                    ["B-LOC", "O", "O", "O"],
                    [],
                ]],
                "link_titles": [[
                    ["x", "Kafka", "Kafka", "", "Anna", "Bern"],
                    ["Paris", "", "", ""],
                    [],
                ]],
            }
        )
    )
    a = mention_spans(tricky).toPandas().sort_values(key).reset_index(drop=True)
    b = (
        mention_spans_sql(tricky).toPandas().sort_values(key)
        .reset_index(drop=True)
    )
    # dangling I- ignored; 'Franz Kafka', 'Anna', 'Bern', 'Paris' = 4
    assert len(a) == 4
    pd.testing.assert_frame_equal(a, b)

    # ragged arrays: python's zip truncates to the shortest input at
    # BOTH levels (tokens within a sentence, sentences within a page);
    # arrays_zip null-pads, which silently dropped an open span before
    # the round-5 fix — both implementations must truncate identically
    ragged = spark.createDataFrame(
        pd.DataFrame(
            {
                "url": ["u1"],
                "page_title": ["P1"],
                "text": [[
                    ["Franz", "Kafka", "extra"],
                    ["orphan", "sentence"],
                ]],
                "tags": [[["B-PER", "I-PER"]]],
                "link_titles": [[["Kafka", "Kafka", "", ""]]],
            }
        )
    )
    a = mention_spans(ragged).toPandas().sort_values(key).reset_index(drop=True)
    b = (
        mention_spans_sql(ragged).toPandas().sort_values(key)
        .reset_index(drop=True)
    )
    assert len(a) == 1 and a.iloc[0]["surface"] == "Franz Kafka"
    pd.testing.assert_frame_equal(a, b)


def test_linking_end_to_end_pr(spark):
    pages, entity_types, redirects, tagged = _tagged(spark)
    spans = mention_spans(tagged)

    # alias dictionary: entity titles + redirect sources, with a-priori
    # probabilities from the mention stream itself (A2)
    mentions = mention_stage(pages, spark, entity_types, redirects)
    links = mentions.filter(F.col("entity_type") != "O").select(
        F.col("page_title").alias("target")
    )
    ents = spark.createDataFrame(
        pd.DataFrame(
            {
                "page_title": list(entity_types.keys()),
                "TYPE": list(entity_types.values()),
            }
        )
    ).withColumn("QID", F.concat(F.lit("Q"), F.abs(F.xxhash64("page_title"))))
    ents = attach_probs(ents, links)
    own = ents.select(
        F.col("page_title").alias("alias"), "page_title", "QID", "TYPE", "proba"
    )
    red = spark.createDataFrame(
        pd.DataFrame(
            {"alias": list(redirects.keys()), "page_title": list(redirects.values())}
        )
    ).join(ents.select("page_title", "QID", "TYPE", "proba"), "page_title")
    # anchor-text dictionary mined from the corpus link stream (E8)
    mined = mine_anchor_aliases(mentions, ents.select("page_title", "QID", "TYPE"))
    aliases = (
        own.unionByName(red.select("alias", "page_title", "QID", "TYPE", "proba"))
        .unionByName(mined)
        .groupBy("alias", "page_title", "QID", "TYPE")
        .agg(F.max("proba").alias("proba"))
    )
    profiles = entity_context_profiles(spans)
    el = link_entities(
        spans,
        aliases.withColumnRenamed("QID", "wikidata").withColumn(
            "QID", F.col("wikidata")
        ),
        profiles=profiles,
    )
    q = linking_quality(el).collect()[0]
    # ambiguous surfaces (random two-word anchors shared across entities)
    # must be resolved by the context-profile similarity
    assert q["precision"] >= 0.95, q
    assert q["recall"] >= 0.95, q


def test_filter_mentions_types_and_min_count(spark):
    from kbspark.linking import filter_mentions

    spans = spark.createDataFrame(
        pd.DataFrame(
            {
                "on_page_id": ["p1", "p1", "p1", "p2"],
                "entity_id": ["a-PER-0", "b-LOC-1", "c-ORG-2", "d-PER-0"],
                "etype": ["PER", "LOC", "ORG", "PER"],
                "surface": ["a", "b", "c", "d"],
            }
        )
    )
    typed = filter_mentions(spans, entity_types={"PER", "LOC"}).toPandas()
    assert set(typed.etype) == {"PER", "LOC"} and len(typed) == 3
    both = filter_mentions(
        spans, entity_types={"PER", "LOC"}, min_count_per_doc=2
    ).toPandas()
    assert set(both.on_page_id) == {"p1"} and len(both) == 2


def test_sentinel_rows_for_unknown_mentions(spark):
    spans = spark.createDataFrame(
        pd.DataFrame(
            {
                "on_page_id": ["u1"],
                "on_page": ["P"],
                "entity_id": ["Ghost-PER-0"],
                "surface": ["Ghost"],
                "etype": ["PER"],
                "gt": ["Ghost"],
                "context": ["Ghost walks ."],
            }
        )
    )
    aliases = spark.createDataFrame(
        pd.DataFrame(
            {
                "alias": ["Other"],
                "page_title": ["Other"],
                "QID": ["Q1"],
                "wikidata": ["Q1"],
                "TYPE": ["PER"],
                "proba": [0.5],
            }
        )
    )
    el = link_entities(spans, aliases).toPandas()
    assert len(el) == 1
    row = el.iloc[0]
    assert row.page_title == "-" and row.wikidata == "-" and row.proba == 0.0


def test_mined_alias_cap_and_join_fallback(spark):
    """VERDICT r01 #6: the corpus-mined dictionary is capped at top-k
    targets per surface, and aliases_hint='auto' drops the forced
    broadcast so an oversized dictionary shuffle-joins instead of
    OOMing executors — with identical results."""
    from kbspark.triples import entity_dim_df

    # one ambiguous surface with 20 targets at distinct counts
    rows = []
    for t in range(20):
        for r in range(t + 1):  # target t observed t+1 times
            rows.append(("u", "p", f"amb-PER-{t}-{r}", "amb", "PER",
                         f"Target_{t:02d}", "ctx words"))
    spans = spark.createDataFrame(
        pd.DataFrame(rows, columns=["on_page_id", "on_page", "entity_id",
                                    "surface", "etype", "gt", "context"])
    )
    dim = entity_dim_df(
        spark, {f"Target_{t:02d}": "PER" for t in range(20)}
    )

    capped = mine_anchor_aliases(
        spans, dim, target_col="gt", max_targets_per_surface=3
    ).toPandas()
    assert len(capped) == 3
    assert sorted(capped.page_title) == ["Target_17", "Target_18", "Target_19"]
    # probas stay the full-distribution conditionals (sum over ALL targets)
    total = sum(t + 1 for t in range(20))
    assert abs(capped.proba.max() - 20 / total) < 1e-6

    # reuse the capped dictionary for the join-strategy checks below
    # (link_entities defaults wikidata to QID when the column is absent)
    aliases = mine_anchor_aliases(
        spans, dim, target_col="gt", max_targets_per_surface=3
    )

    def run(hint):
        return sorted(
            map(tuple,
                link_entities(spans, aliases, aliases_hint=hint).collect())
        )

    def opt_plan(hint):
        df = link_entities(spans, aliases, aliases_hint=hint)
        return df._jdf.queryExecution().optimizedPlan().toString()

    # the KB dim join inside mine_anchor_aliases keeps its (dictionary-
    # sized) broadcast hint; 'auto' must drop the ALIAS join's forced
    # broadcast — strictly fewer hints than the 'broadcast' plan
    n_b = opt_plan("broadcast").count("strategy=broadcast")
    n_a = opt_plan("auto").count("strategy=broadcast")
    assert n_b >= 1 and n_a < n_b

    # oversized-dictionary scenario: disable auto-broadcast so 'auto'
    # resolves to a shuffle join; results must match the broadcast path
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    want = run("broadcast")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        got = run("auto")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert got == want and len(got) > 0
