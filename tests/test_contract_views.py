"""The contract view memo must self-heal when another piece of code
replaces or drops one of the ten driver table views (ADVICE r04 +
round-5 review: the memo skipped re-registration on an app/sf_dir match,
so an out-of-band createOrReplaceTempView('documents', ...) silently fed
contract queries the wrong table)."""

from pyspark.sql import functions as F  # noqa: F401

from kbspark.contract import _TABLES, _load_views, invalidate_views

SF = "/root/testdata/sf0.001"


def test_view_memo_self_heals_on_replacement(spark):
    invalidate_views(spark)
    _load_views(spark, SF)
    n0 = spark.table("documents").count()
    assert n0 > 0
    # out-of-band clobber — no invalidate call
    spark.range(3).selectExpr(
        "id as doc_id", "'x' as text", "'de' as lang"
    ).createOrReplaceTempView("documents")
    assert spark.table("documents").count() == 3
    _load_views(spark, SF)  # what contract.register does before a query
    assert spark.table("documents").count() == n0


def test_view_memo_self_heals_on_drop(spark):
    invalidate_views(spark)
    _load_views(spark, SF)
    spark.catalog.dropTempView("region")
    _load_views(spark, SF)
    assert spark.table("region").count() > 0
    assert all(spark.catalog.tableExists(t) for t in _TABLES)


def test_invalidate_views_forces_reregistration(spark):
    _load_views(spark, SF)
    spark.catalog.dropTempView("nation")
    invalidate_views(spark)
    _load_views(spark, SF)
    assert spark.table("nation").count() > 0
