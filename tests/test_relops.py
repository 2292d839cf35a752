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


def test_asof_join_null_value_in_latest_row(spark):
    """The latest matching right row wins even when its value is NULL —
    ts_asof and value_asof must come from the SAME row, never spliced
    from two rows (round-3 review; matches ANSI/DuckDB ASOF)."""
    import datetime as dt

    import pandas as pd

    from kbspark.relops import asof_join

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    right = spark.createDataFrame(
        pd.DataFrame(
            {"user_id": [1, 1], "ts": [t(1), t(2)], "value": [5.0, None]}
        )
    )
    left = spark.createDataFrame(
        pd.DataFrame({"user_id": [1], "ts": [t(3)], "event_id": [100]})
    )
    row = asof_join(left, right, by="user_id", ts="ts",
                    value_cols=["value"]).collect()[0]
    assert row["ts_asof"] == t(2)
    assert row["value_asof"] is None  # NOT 5.0 from the older row
