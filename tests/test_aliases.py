"""dims.aliases_table: entity titles + labels + redirect sources fold
into one deduplicated alias dictionary."""

import pandas as pd


def test_aliases_table(spark):
    from kbspark.dims import aliases_table

    entities = spark.createDataFrame(
        pd.DataFrame(
            {
                "page_title": ["Berlin", "Kafka"],
                "QID": ["Q64", "Q905"],
                "TYPE": ["LOC", "PER"],
                "label": ["Berlin Stadt", None],
            }
        )
    )
    redirects = spark.createDataFrame(
        pd.DataFrame(
            {
                "rd_from_title": ["BLN", "Franz_Kafka"],
                "page_title": ["Berlin", "Kafka"],
                "QID": ["Q64", "Q905"],
                "TYPE": ["LOC", "PER"],
            }
        )
    )
    out = aliases_table(entities, redirects).toPandas()
    aliases = dict(zip(out.alias, out.page_title))
    assert aliases["Berlin"] == "Berlin"
    assert aliases["Berlin_Stadt"] == "Berlin"  # label, space->underscore
    assert aliases["BLN"] == "Berlin"
    assert aliases["Franz_Kafka"] == "Kafka"
    assert not out.alias.duplicated().any()
