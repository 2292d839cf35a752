"""asof_join edge cases: no prior right row → NULL, >= tie semantics,
carry-forward across multiple lefts."""

import datetime as dt

import pandas as pd


def _ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


def test_asof_join_edges(spark):
    from kbspark.relops import asof_join

    left = spark.createDataFrame(
        pd.DataFrame(
            {
                "user_id": [1, 1, 1, 2],
                "ts": [_ts(5), _ts(10), _ts(20), _ts(3)],
                "event_id": [100, 101, 102, 103],
            }
        )
    )
    right = spark.createDataFrame(
        pd.DataFrame(
            {
                "user_id": [1, 1],
                "ts": [_ts(7), _ts(10)],
                "value": [1.5, 2.5],
            }
        )
    )
    out = (
        asof_join(left, right, by="user_id", ts="ts", value_cols=["value"])
        .toPandas()
        .set_index("event_id")
    )
    assert pd.isna(out.loc[100, "value_asof"])  # before any right row
    assert out.loc[101, "value_asof"] == 2.5  # equal ts -> >= match
    assert out.loc[102, "value_asof"] == 2.5  # carried forward
    assert pd.isna(out.loc[103, "value_asof"])  # other user: no rights
