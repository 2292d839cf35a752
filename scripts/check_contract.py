#!/usr/bin/env python
"""Local stand-in for the driver's correctness gate: run every
__spark_entry__.queries() entry on Spark and its oracle_sql() on DuckDB
at sf0.01, compare row count + column names + order-insensitive values.

Usage: python scripts/check_contract.py [query_name ...]

$CONTRACT_SF_DIR overrides the data directory — e.g.
CONTRACT_SF_DIR=/root/testdata/sf0.1 spot-checks entries at 10x the
driver's oracle scale (VERDICT r03 "correctness is only ever checked at
sf0.01"); the pair-emitting entries are the interesting ones there
(bucket statistics change with scale).
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

SF_DIR = os.environ.get("CONTRACT_SF_DIR", "/root/testdata/sf0.01")

from kbspark.contract import _TABLES as TABLES  # noqa: E402


def canon_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        # NaN == NULL is deliberate: toPandas represents SQL NULL in a
        # float column as NaN, so the Spark side can't tell them apart
        if math.isnan(v):
            return "NULL"
        if math.isinf(v):
            # int(inf) raises OverflowError OUTSIDE the per-query try
            # blocks and would abort the whole gate (round-4 review)
            return repr(v)
        # round FIRST: 2.9999999996 and 3.0 must canonicalize alike
        # (round-3 review: the integer fast path ran before rounding)
        r = round(v, 9)
        # ...then clamp to 13 SIGNIFICANT digits: DuckDB's decimal->double
        # cast double-rounds (int128 -> double, then / 10^scale) and can
        # land 1 ulp away from Spark's correctly-rounded cast. At sf0.01
        # magnitudes the 9-decimal round absorbs that; at sf0.1 a 10-digit
        # money sum has ulp ~5e-7 and the two engines' representations
        # diverge in the 17th significant digit (found by the round-5
        # full-contract sf0.1 run: q1 sum_disc_price). 13 significant
        # digits still checks money to sub-cent at billions.
        r = float(f"{r:.13g}")
        if r == int(r):
            return str(int(r))
        return repr(r)
    return str(v)


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon_cell(r[i]) for i in order) for r in rows)


def main(selected: list[str]):
    import __spark_entry__ as entry_mod
    from kbspark.session import get_spark

    spark = get_spark(app="contract-check", cpus=8, shuffle_partitions=8)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    names = selected or list(queries)
    failures = []
    for name in names:
        t0 = time.time()
        try:
            sdf = queries[name](spark, SF_DIR)
            spark_pdf = sdf.toPandas()
            spark_cols = list(spark_pdf.columns)
            spark_rows = list(spark_pdf.itertuples(index=False, name=None))
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {e}")
            continue
        if name not in oracles:
            print(f"ok    {name}: rows-only, {len(spark_rows)} rows "
                  f"({time.time()-t0:.1f}s)")
            if len(spark_rows) == 0:
                print(f"WARN  {name}: zero rows")
            continue
        try:
            res = con.execute(oracles[name])
            duck_cols = [d[0] for d in res.description]
            duck_rows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {type(e).__name__}: {e}")
            continue
        ok = True
        if sorted(spark_cols) != sorted(duck_cols):
            ok = False
            print(f"FAIL  {name}: columns spark={sorted(spark_cols)} "
                  f"duck={sorted(duck_cols)}")
        elif len(spark_rows) != len(duck_rows):
            ok = False
            print(f"FAIL  {name}: rowcount spark={len(spark_rows)} "
                  f"duck={len(duck_rows)}")
        else:
            a = canon_rows(spark_cols, spark_rows)
            b = canon_rows(duck_cols, duck_rows)
            if a != b:
                ok = False
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                print(f"FAIL  {name}: value mismatch; first diffs: {diff}")
        if ok:
            print(f"ok    {name}: {len(spark_rows)} rows match "
                  f"({time.time()-t0:.1f}s)")
        else:
            failures.append(name)

    print(f"\n{len(names) - len(failures)}/{len(names)} pass")
    if failures:
        print("failures:", failures)
        sys.exit(1)


if __name__ == "__main__":
    main(sys.argv[1:])
