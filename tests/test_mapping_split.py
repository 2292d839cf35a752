"""wikidata_mapping (J4 chain) vs a pandas equivalent of the reference's
wikidatamapping loop (entities.py:285-317), and hash_split determinism."""

import pandas as pd
from pyspark.sql import functions as F

from kbspark.dims import hash_split, per_language_entities, wikidata_mapping


def _fixtures(spark):
    ents = pd.DataFrame(
        {
            "page_title": [f"DE_{i}" for i in range(20)],
            "TYPE": [("PER", "LOC", "ORG")[i % 3] for i in range(20)],
        }
    )
    qid_de = pd.DataFrame(
        {"page_title": [f"DE_{i}" for i in range(15)],
         "QID": [f"Q{i}" for i in range(15)]}
    )
    qid_fr = pd.DataFrame(
        {"page_title": [f"FR_{i}" for i in range(0, 15, 2)],
         "QID": [f"Q{i}" for i in range(0, 15, 2)]}
    )
    qid_en = pd.DataFrame(
        {"page_title": [f"EN_{i}" for i in range(0, 15, 3)],
         "QID": [f"Q{i}" for i in range(0, 15, 3)]}
    )
    return ents, {"DE": qid_de, "FR": qid_fr, "EN": qid_en}


def test_wikidata_mapping_matches_pandas_chain(spark):
    ents, qids = _fixtures(spark)
    languages = ["DE", "FR", "EN"]

    # pandas equivalent of the reference chain (entities.py:294-302)
    mapping = ents.set_index("page_title").merge(
        qids["DE"].rename(columns={"page_title": "DE"}),
        left_index=True, right_on="DE",
    )
    for lang in ["FR", "EN"]:
        mapping = mapping.merge(
            qids[lang].rename(columns={"page_title": lang}), on="QID", how="left"
        )
    expected = (
        mapping[["QID", "DE", "FR", "EN", "TYPE"]]
        .sort_values("QID")
        .reset_index(drop=True)
    )

    ours = wikidata_mapping(
        spark.createDataFrame(ents),
        {k: spark.createDataFrame(v) for k, v in qids.items()},
        languages,
    ).toPandas().sort_values("QID").reset_index(drop=True)

    pd.testing.assert_frame_equal(
        ours.fillna("∅"), expected.fillna("∅"), check_dtype=False
    )


def test_per_language_entities(spark):
    ents, qids = _fixtures(spark)
    mapping = wikidata_mapping(
        spark.createDataFrame(ents),
        {k: spark.createDataFrame(v) for k, v in qids.items()},
        ["DE", "FR", "EN"],
    )
    fr = per_language_entities(mapping, "FR").toPandas()
    assert len(fr) == 8  # FR_{0,2,...,14}
    assert not fr.page_title.duplicated().any()
    assert fr.TYPE.notna().all()


def test_hash_split_deterministic_and_partition_invariant(spark):
    df = spark.range(5000).withColumnRenamed("id", "k")
    frac = {"train": 0.8, "dev": 0.1, "test": 0.1}
    a = hash_split(df, "k", frac, seed=41).toPandas().set_index("k")["split"]
    b = (
        hash_split(df.repartition(13), "k", frac, seed=41)
        .toPandas().set_index("k")["split"]
    )
    assert (a.sort_index() == b.sort_index()).all()
    counts = a.value_counts(normalize=True)
    assert abs(counts["train"] - 0.8) < 0.03
    assert abs(counts["dev"] - 0.1) < 0.02
    assert abs(counts["test"] - 0.1) < 0.02
    # different seed -> different assignment
    c = hash_split(df, "k", frac, seed=99).toPandas().set_index("k")["split"]
    assert (a.sort_index() != c.sort_index()).any()


def test_hash_split_fraction_guard(spark):
    import pytest

    df = spark.range(10).withColumnRenamed("id", "k")
    with pytest.raises(ValueError):
        hash_split(df, "k", {"a": 0.7, "b": 0.7})

def test_per_language_dedup_keeps_min_qid_row(spark):
    """Reference parity (entities.py:305-317): the mapping is sorted by
    QID before the per-language keep-first dedup, so an ambiguous title
    keeps the MIN-QID row's TYPE (round-3 review: ordering by TYPE kept
    the wrong row)."""
    import pandas as pd

    from kbspark.dims import per_language_entities

    mapping = spark.createDataFrame(
        pd.DataFrame(
            {
                "QID": ["Q2", "Q1", "Q3"],
                "DE": ["X", "X", "Y"],
                "TYPE": ["LOC", "PER", "ORG"],
            }
        )
    )
    out = {
        r["page_title"]: r["TYPE"]
        for r in per_language_entities(mapping, "DE").collect()
    }
    assert out == {"X": "PER", "Y": "ORG"}  # Q1 < Q2 -> PER survives
