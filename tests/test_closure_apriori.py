"""A1 closure (vs pure-python BFS oracle, incl. cycles) and A2 salted
aggregation (salted == unsalted under Zipf skew)."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from kbspark.apriori import apriori_probs, attach_probs, salted_count
from kbspark.closure import reachable


def python_reachable(edges, roots):
    adj = {}
    for s, d in edges:
        adj.setdefault(s, []).append(d)
    seen = set(roots)
    stack = list(roots)
    while stack:
        n = stack.pop()
        for d in adj.get(n, []):
            if d not in seen:
                seen.add(d)
                stack.append(d)
    return seen


def test_closure_with_cycles_and_dag(spark):
    rng = np.random.RandomState(5)
    edges = [(int(rng.randint(0, 60)), int(rng.randint(0, 60))) for _ in range(150)]
    edges += [(0, 1), (1, 2), (2, 0)]  # explicit cycle through the root
    edf = spark.createDataFrame(pd.DataFrame(edges, columns=["src", "dst"]))
    roots = spark.createDataFrame(pd.DataFrame({"node": [0]}))
    got = {r["node"] for r in reachable(edf, roots).collect()}
    assert got == python_reachable(edges, {0})


def test_closure_no_edges(spark):
    edf = spark.createDataFrame([], schema="src long, dst long")
    roots = spark.createDataFrame(pd.DataFrame({"node": [7]}))
    got = {r["node"] for r in reachable(edf, roots).collect()}
    assert got == {7}


def test_salted_count_equals_plain(spark):
    rng = np.random.RandomState(3)
    # Zipf head skew: a few keys dominate
    keys = np.minimum(rng.zipf(1.3, size=20000), 500)
    df = spark.createDataFrame(pd.DataFrame({"target": keys.astype("int64")}))
    plain = (
        df.groupBy("target").agg(F.count("*").alias("n_links")).toPandas()
        .sort_values("target").reset_index(drop=True)
    )
    salted = (
        salted_count(df, "target", n_salts=8).toPandas()
        .sort_values("target").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        plain.astype({"n_links": "int64"}), salted.astype({"n_links": "int64"})
    )


def test_apriori_probs_and_attach(spark):
    links = spark.createDataFrame(
        pd.DataFrame({"target": ["A"] * 6 + ["B"] * 3 + ["C"]})
    )
    probs = apriori_probs(links).toPandas().set_index("target")
    assert probs.loc["A", "proba"] == 0.6
    assert probs.loc["B", "proba"] == 0.3
    ents = spark.createDataFrame(
        pd.DataFrame({"page_title": ["A", "B", "Z"], "TYPE": ["PER", "LOC", "ORG"]})
    )
    joined = attach_probs(ents, links).toPandas().set_index("page_title")
    assert joined.loc["Z", "proba"] == 0.0
    assert joined.loc["A", "n_links"] == 6
