#!/usr/bin/env python
"""Type-kind audit: for every oracle-backed contract query, compare the
Spark output schema against the DuckDB oracle's result types (collapsed
to int/float/ts/bool/str kinds). The value-hash comparison can mask
int-vs-float representation differences; this catches them before the
driver does. Expect '0 queries with type diffs'."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

SF = "/root/testdata/sf0.01"

from kbspark.contract import _TABLES as TABLES  # noqa: E402


def kind(t) -> str:
    t = str(t).upper()
    if any(x in t for x in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
                            "HUGEINT", "LONG", "INT")):
        return "int"
    if any(x in t for x in ("DOUBLE", "FLOAT", "DECIMAL", "REAL")):
        return "float"
    if "TIMESTAMP" in t or "DATE" in t:
        return "ts"
    if "BOOL" in t:
        return "bool"
    return "str"


def main() -> None:
    import __spark_entry__ as m
    from kbspark.session import get_spark

    spark = get_spark(app="typeaudit", cpus=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )

    qs, oras = m.queries(), m.oracle_sql()
    n_diff = 0
    for name, sql in sorted(oras.items()):
        sdf = qs[name](spark, SF)
        stypes = {f.name: kind(f.dataType.simpleString())
                  for f in sdf.schema.fields}
        rel = con.sql(f"SELECT * FROM ({sql}) LIMIT 0")
        dtypes = dict(zip(rel.columns, [kind(t) for t in rel.types]))
        diffs = {
            c: (stypes.get(c), dtypes.get(c))
            for c in set(stypes) | set(dtypes)
            if stypes.get(c) != dtypes.get(c)
        }
        if diffs:
            n_diff += 1
            print(f"TYPEDIFF {name}: {diffs}")
    print(f"audit done, {n_diff} queries with type diffs")
    sys.exit(1 if n_diff else 0)


if __name__ == "__main__":
    main()
