"""End-to-end pipeline entry points (spark-submit-able; SURVEY.md §3).

``flagship_triples`` is the driver-contract flagship (__spark_entry__.entry):
documents.parquet → markup pages → E1 clean + E2 mention extraction with
broadcast dictionary resolution → canonicalized (subj, pred, obj) triples.
One narrow Arrow-batched stage plus a single pre-aggregated dedup shuffle —
the same dataflow shape as the reference's tag-wiki-entities2sqlite trace
(SURVEY.md §3.1) re-expressed Spark-first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kbspark.corpus import dims_from_documents, pages_from_documents
from kbspark.extract import annotate_stage, mention_stage
from kbspark.session import pin_session_conf
from kbspark.triples import build_triples


def flagship_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → pages → mentions → triples."""
    pin_session_conf(spark)
    pages = pages_from_documents(spark, sf_dir)
    entity_types, redirect_targets = dims_from_documents(spark, sf_dir)
    mentions = mention_stage(pages, spark, entity_types, redirect_targets)
    return build_triples(spark, mentions, entity_types, redirect_targets)


def tagged_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → pages → per-sentence BIO-tagged table (the reference's
    `tagged` table with typed nested arrays, ner.py:196-197)."""
    pin_session_conf(spark)
    pages = pages_from_documents(spark, sf_dir)
    entity_types, redirect_targets = dims_from_documents(spark, sf_dir)
    return annotate_stage(pages, spark, entity_types, redirect_targets)
