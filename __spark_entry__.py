"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship KG-construction pipeline on sf0.001;
``queries()`` / ``oracle_sql()`` map SURVEY.md §2 operators onto the
driver's parquet tables with DuckDB-checkable SQL oracles.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: documents.parquet → Common-Crawl-shaped pages →
    Arrow-batched clean+mention extraction with broadcast dictionary
    resolution → canonicalized (subj, pred, obj) triples."""
    from kbspark.jobs import flagship_triples

    return flagship_triples(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from kbspark.contract import CONTRACT_QUERIES

    return dict(CONTRACT_QUERIES)


def oracle_sql() -> dict[str, str]:
    from kbspark.contract import CONTRACT_ORACLES

    return dict(CONTRACT_ORACLES)
