"""End-to-end KB materialization: four graph tables, resume-after-kill
value-identity, and cross-check of the triples table against the
flagship query."""

import pytest
from pyspark.sql import functions as F

from kbspark.catalog import Catalog
from kbspark.kb import build_knowledge_base


def test_kb_build_tables_and_resume(spark, sf001_dir, tmp_path):
    wh_a = str(tmp_path / "a")
    res = build_knowledge_base(spark, sf001_dir, wh_a, n_buckets=8)
    assert set(res["tables"]) == {"entities", "aliases", "sitelinks", "triples"}
    assert all(v > 0 for v in res["tables"].values())

    cat = Catalog(spark, wh_a)
    triples = cat.read("triples")
    # same triple multiset as the flagship pipeline
    from kbspark.jobs import flagship_triples

    expected = flagship_triples(spark, sf001_dir)
    a = sorted(map(tuple, triples.select("subj", "pred", "obj",
                                         "n_occurrences").collect()))
    b = sorted(map(tuple, expected.select("subj", "pred", "obj",
                                          "n_occurrences").collect()))
    assert a == b

    # entities carry a-priori probabilities summing to ~1 over mentions
    ents = cat.read("entities").toPandas()
    assert ents.proba.between(0, 1).all()
    assert abs(ents.proba.sum() - 1.0) < 1e-6

    # kill mid-run, then resume to an identical triples table
    wh_b = str(tmp_path / "b")
    with pytest.raises(RuntimeError, match="fault injection"):
        build_knowledge_base(spark, sf001_dir, wh_b, n_buckets=8,
                             fail_after_commits=1)
    res2 = build_knowledge_base(spark, sf001_dir, wh_b, n_buckets=8)
    assert res2["stage"]["skipped"], "resume should skip completed buckets"
    cat_b = Catalog(spark, wh_b)
    c = sorted(map(tuple, cat_b.read("triples").select(
        "subj", "pred", "obj", "n_occurrences").collect()))
    assert c == a

    # re-run on the complete warehouse: no new triple work
    res3 = build_knowledge_base(spark, sf001_dir, wh_a, n_buckets=8)
    assert res3["stage"]["ran"] == []
