"""D3 — per-partition lineage + exact resume: kill mid-job, rerun,
assert value-identical output with no duplicate appends (SURVEY §5.5)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from kbspark.catalog import Catalog
from kbspark.lineage import completed_buckets, run_stage, stage_metrics


def _input(spark, n=500):
    return spark.createDataFrame(
        pd.DataFrame(
            {"url": [f"u{i}" for i in range(n)], "value": list(range(n))}
        )
    )


def _transform(df):
    return df.withColumn("doubled", F.col("value") * 2)


def test_full_run_and_metrics(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    res = run_stage(cat, "double", _input(spark), _transform, "out",
                    n_buckets=8, buckets_per_commit=3)
    assert sorted(res["ran"]) == list(range(8))
    out = cat.read("out")
    assert out.count() == 500
    m = stage_metrics(cat, "out", "double")
    assert sum(r["n_rows"] for r in m) == 500
    assert res["commits"] == 3  # ceil(8/3)


@pytest.mark.parametrize("kill_after", [1, 2, 3])
def test_kill_and_exact_resume(spark, tmp_path, kill_after):
    cat_a = Catalog(spark, str(tmp_path / "a"))
    inp = _input(spark)
    # uninterrupted reference run
    run_stage(cat_a, "double", inp, _transform, "out", n_buckets=8,
              buckets_per_commit=2)
    golden = sorted(
        map(tuple, cat_a.read("out").select("url", "value", "doubled").collect())
    )

    # killed run: fault injection after kill_after of 4 commits
    cat_b = Catalog(spark, str(tmp_path / "b"))
    with pytest.raises(RuntimeError, match="fault injection"):
        run_stage(cat_b, "double", inp, _transform, "out", n_buckets=8,
                  buckets_per_commit=2, fail_after_commits=kill_after)
    done_after_crash = completed_buckets(cat_b, "out", "double")
    assert 0 < len(done_after_crash) < 8

    # resume: only pending buckets run; no duplicates; identical values
    res = run_stage(cat_b, "double", inp, _transform, "out", n_buckets=8,
                    buckets_per_commit=2)
    assert set(res["skipped"]) == done_after_crash
    assert set(res["ran"]).isdisjoint(done_after_crash)
    resumed = sorted(
        map(tuple, cat_b.read("out").select("url", "value", "doubled").collect())
    )
    assert resumed == golden


def test_resume_noop_when_complete(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    inp = _input(spark, n=100)
    run_stage(cat, "double", inp, _transform, "out", n_buckets=4)
    res = run_stage(cat, "double", inp, _transform, "out", n_buckets=4)
    assert res["ran"] == [] and res["commits"] == 0
    assert cat.read("out").count() == 100


def test_single_input_scan(spark, tmp_path):
    """The 100-TB property (VERDICT r01 #5): a full run reads the input
    exactly once, not once per commit batch. Counted with an accumulator
    inside an Arrow-batched pass over the input, and by transform-call
    count."""
    acc = spark.sparkContext.accumulator(0)
    calls = []

    def counted_input():
        import pandas as pd  # noqa: F401 (worker-side)

        def tick(batches):
            for pdf in batches:
                acc.add(len(pdf))
                yield pdf

        return _input(spark).mapInPandas(tick, schema="url string, value long")

    def transform(df):
        calls.append(1)
        return _transform(df)

    cat = Catalog(spark, str(tmp_path / "wh"))
    run_stage(cat, "double", counted_input(), transform, "out",
              n_buckets=8, buckets_per_commit=2)  # 4 commit batches
    assert len(calls) == 1  # transform composed once, not per batch
    assert acc.value == 500  # input rows read exactly once
    assert cat.read("out").count() == 500


def test_catalog_atomic_overwrite(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.append("t", _input(spark, 10))
    cat.append("t", _input(spark, 5))
    assert cat.row_count("t") == 15
    cat.overwrite("t", _input(spark, 3))
    assert cat.row_count("t") == 3
    assert cat.read("t").count() == 3


def test_catalog_schema_drift_fails_loudly(spark, tmp_path):
    """Two plain snapshots with different DATA columns must fail read()
    loudly, not NULL-fill (ADVICE r04 + round-5 review: a single
    multi-path parquet read silently picked one file's schema, so drift
    between two appends bypassed the drift guard)."""
    import pytest

    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.append("t", spark.createDataFrame([(1, "a")], "id long, name string"))
    cat.append(
        "t", spark.createDataFrame([(2, "b")], "id long, full_name string")
    )
    with pytest.raises(ValueError, match="schema drift"):
        cat.read("t").collect()
    # same schema appends still union fine
    cat2 = Catalog(spark, str(tmp_path / "wh2"))
    cat2.append("u", spark.createDataFrame([(1, "a")], "id long, name string"))
    cat2.append("u", spark.createDataFrame([(2, "b")], "id long, name string"))
    assert cat2.read("u").count() == 2


def test_catalog_additive_column_is_rejected_by_design(spark, tmp_path):
    """Pin the seam's chosen schema-evolution semantics (VERDICT r05
    #6): real Iceberg ALLOWS additive nullable columns; this parquet+
    manifest emulation intentionally FORBIDS them — every inter-snapshot
    column-set difference outside the known partition column(s) fails
    read() loudly. Rationale: without a real table-format catalog there
    is no authoritative schema to evolve FROM, so 'additive column' and
    'renamed column' (round-5's silent NULL-fill bug) are
    indistinguishable at read time; strictness is the safe default.
    Writers that need an additive column must backfill/rewrite the
    table (Catalog.overwrite)."""
    import pytest

    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.append("t", spark.createDataFrame([(1, "a")], "id long, name string"))
    cat.append(
        "t",
        spark.createDataFrame(
            [(2, "b", "x")], "id long, name string, extra string"
        ),
    )
    with pytest.raises(ValueError, match="schema drift"):
        cat.read("t").collect()
    # the documented evolution path: overwrite with the new schema
    cat.overwrite(
        "t",
        spark.createDataFrame(
            [(3, "c", "y")], "id long, name string, extra string"
        ),
    )
    assert cat.read("t").columns == ["id", "name", "extra"]


def test_catalog_type_drift_fails_loudly(spark, tmp_path):
    """Same column NAME re-written with a different TYPE must fail
    read() (ADVICE r05: the name-only drift check let unionByName
    silently cross-cast)."""
    import pytest

    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.append("t", spark.createDataFrame([(1, "a")], "id long, name string"))
    cat.append("t", spark.createDataFrame([("2", "b")], "id string, name string"))
    with pytest.raises(ValueError, match="type drift"):
        cat.read("t").collect()


def test_vacuum_orphan_stages(spark, tmp_path):
    """A crash between staging and the first commit orphans the stage
    dir; the next run_stage GCs it (ADVICE r02). Committed bases are
    never vacuumed."""
    import os

    cat = Catalog(spark, str(tmp_path / "wh"))
    # orphan: staged but never committed (crash-before-commit analog)
    cat.stage_partitioned("out", _transform(_input(spark, 20)).withColumn(
        "_bucket", F.pmod(F.xxhash64("url"), F.lit(4)).cast("int")
    ), "_bucket")
    tdir = str(tmp_path / "wh" / "out")
    assert any(d.startswith("stage-") for d in os.listdir(tdir))

    run_stage(cat, "double", _input(spark), _transform, "out", n_buckets=4)
    stage_dirs = [d for d in os.listdir(tdir) if d.startswith("stage-")]
    # exactly the referenced base survives; the orphan is gone
    manifest_bases = {
        os.path.basename(e["base_path"])
        for e in cat.snapshots("out") if "base_path" in e
    }
    assert set(stage_dirs) == manifest_bases
    assert cat.read("out").count() == 500
    # a second resume run vacuums nothing and stays value-identical
    removed_before = set(stage_dirs)
    run_stage(cat, "double", _input(spark), _transform, "out", n_buckets=4)
    assert {
        d for d in os.listdir(tdir) if d.startswith("stage-")
    } == removed_before


def test_partition_value_escaping():
    """commit_staged matches directories the way Spark writes them:
    URL-escaped partition values (latent bug for string partition
    values containing '/', '=', ... — ADVICE r02)."""
    from kbspark.catalog import escape_part_value

    assert escape_part_value(7) == "7"
    assert escape_part_value("a/b=c:d") == "a%2Fb%3Dc%3Ad"
    assert escape_part_value("plain-Value_1.x") == "plain-Value_1.x"


def test_partition_value_escaping_bool_and_null():
    from kbspark.catalog import escape_part_value

    assert escape_part_value(True) == "true"
    assert escape_part_value(False) == "false"
    assert escape_part_value(None) == "__HIVE_DEFAULT_PARTITION__"
