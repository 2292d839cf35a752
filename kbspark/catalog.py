"""Thin table catalog emulating the two Iceberg features the engine
relies on (SURVEY.md §7): **atomic append** and **snapshot metadata for
resume markers**. No Iceberg jars exist in this sandbox; on a real
cluster this seam is replaced by an Iceberg catalog and
``df.writeTo(name).append()`` — the call sites don't change.

Layout: ``<root>/<table>/snap-<n>-<uuid>/part-*.parquet`` plus a
``_manifest.json`` whose atomic rename IS the commit point: data files
are invisible until the manifest references them, so a crash mid-write
leaves no partial state (the WAL/ACID analog of the reference's chunked
idempotent appends, ner.py:267-304, SURVEY §2.A S4).
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession

#: characters Spark/Hive escape in partition directory names
#: (ExternalCatalogUtils.escapePathName): control chars + the listed set.
_PART_ESCAPE = set('"#%\'*/:=?\\\x7f{[]^') | {chr(c) for c in range(0x20)}


def part_count_key(v) -> str:
    """Canonical string key for per-partition row counts: matches the
    value strings Spark yields when reading partition dirs with type
    inference DISABLED (round-3 review: inference turned '01' into 1 and
    the count lookup silently recorded n_rows=0)."""
    if v is None:
        return "__HIVE_DEFAULT_PARTITION__"
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def escape_part_value(v) -> str:
    """Render a partition value exactly as Spark writes the directory
    name (URL-style %XX escapes for the Hive-reserved set; booleans as
    lowercase true/false; NULL as the Hive default-partition marker).
    A literal f-string match silently misses directories for values
    containing '/', '=', etc. (ADVICE r02)."""
    if v is None:
        return "__HIVE_DEFAULT_PARTITION__"
    if isinstance(v, bool):
        return "true" if v else "false"
    s = str(v)
    return "".join(
        f"%{ord(c):02X}" if c in _PART_ESCAPE else c for c in s
    )


class Catalog:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- manifest ----------------------------------------------------------

    def _manifest_path(self, table: str) -> str:
        return os.path.join(self.root, table, "_manifest.json")

    def _load_manifest(self, table: str) -> list[dict]:
        path = self._manifest_path(table)
        if not os.path.exists(path):
            return []
        with open(path, encoding="utf-8") as f:
            return json.load(f)

    def _commit_manifest(self, table: str, entries: list[dict]) -> None:
        path = self._manifest_path(table)
        tmp = path + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(entries, f, indent=1)
        os.replace(tmp, path)  # atomic on POSIX — the commit point

    # -- table ops ----------------------------------------------------------

    def snapshots(self, table: str) -> list[dict]:
        return self._load_manifest(table)

    def exists(self, table: str) -> bool:
        return bool(self._load_manifest(table))

    def append(self, table: str, df: DataFrame, meta: dict | None = None) -> dict:
        """Write ``df`` as a new snapshot of ``table``; returns the
        committed manifest entry (with row count — the metrics hook)."""
        tdir = os.path.join(self.root, table)
        os.makedirs(tdir, exist_ok=True)
        entries = self._load_manifest(table)
        snap_id = f"snap-{len(entries):05d}-{uuid.uuid4().hex[:8]}"
        path = os.path.join(tdir, snap_id)
        df.write.mode("errorifexists").parquet(path)
        n_rows = self.spark.read.parquet(path).count()
        entry = {"snapshot": snap_id, "path": path, "n_rows": n_rows,
                 "meta": meta or {}}
        entries.append(entry)
        self._commit_manifest(table, entries)
        return entry

    def overwrite(self, table: str, df: DataFrame, meta: dict | None = None) -> dict:
        """Replace the table contents in one atomic manifest swap (old
        snapshots stay on disk until vacuumed — time travel analog)."""
        tdir = os.path.join(self.root, table)
        os.makedirs(tdir, exist_ok=True)
        snap_id = f"snap-ow-{uuid.uuid4().hex[:8]}"
        path = os.path.join(tdir, snap_id)
        df.write.mode("errorifexists").parquet(path)
        n_rows = self.spark.read.parquet(path).count()
        entry = {"snapshot": snap_id, "path": path, "n_rows": n_rows,
                 "meta": meta or {}}
        self._commit_manifest(table, [entry])
        return entry

    # -- staged partitioned commits (single-pass lineage) --------------------

    def stage_partitioned(self, table: str, df: DataFrame, part_col: str) -> dict:
        """Write ``df`` partitioned by ``part_col`` to an UNCOMMITTED
        staging snapshot in ONE pass (the data files exist but no
        manifest entry references them — invisible until
        ``commit_staged``). Returns a handle with per-partition row
        counts (one scan of the staged output, never of the input)."""
        from pyspark.sql import functions as F

        tdir = os.path.join(self.root, table)
        os.makedirs(tdir, exist_ok=True)
        base = os.path.join(tdir, f"stage-{uuid.uuid4().hex[:8]}")
        df.write.partitionBy(part_col).mode("errorifexists").parquet(base)
        part_dirs = [
            d for d in os.listdir(base) if d.startswith(f"{part_col}=")
        ]
        counts: dict = {}
        if part_dirs:
            # type inference OFF so '01' stays '01' — counts are keyed by
            # the canonical string (part_count_key) on both sides
            conf_key = "spark.sql.sources.partitionColumnTypeInference.enabled"
            old_conf = self.spark.conf.get(conf_key, "true")
            self.spark.conf.set(conf_key, "false")
            try:
                staged = self.spark.read.option("basePath", base).parquet(base)
                for r in (
                    staged.groupBy(part_col)
                    .agg(F.count("*").alias("n"))
                    .collect()
                ):
                    counts[part_count_key(r[part_col])] = r["n"]
            finally:
                self.spark.conf.set(conf_key, old_conf)
        return {"base": base, "part_col": part_col, "counts": counts}

    def commit_staged(self, table: str, staged: dict, values: list,
                      meta: dict | None = None) -> dict:
        """Atomically commit the staged partitions for ``values`` — a
        manifest append referencing the already-written partition
        directories (zero data movement; the rename of the manifest is
        the commit point, same as ``append``). Empty partitions commit
        as markers with no paths."""
        part_col = staged["part_col"]
        paths = []
        for v in values:
            p = os.path.join(
                staged["base"], f"{part_col}={escape_part_value(v)}"
            )
            if os.path.isdir(p):
                paths.append(p)
        entries = self._load_manifest(table)
        entry = {
            "snapshot": f"snap-{len(entries):05d}-{uuid.uuid4().hex[:8]}",
            "paths": paths,
            "base_path": staged["base"],
            "part_col": part_col,
            "n_rows": int(
                sum(staged["counts"].get(part_count_key(v), 0) for v in values)
            ),
            "meta": meta or {},
        }
        entries.append(entry)
        self._commit_manifest(table, entries)
        return entry

    def write_bucketed(self, table: str, df: DataFrame, bucket_col: str,
                       n_buckets: int = 8, sort: bool = True) -> None:
        """Bucketed (and optionally sorted) table write — the co-located
        join primitive: two tables bucketed on the same key with the same
        bucket count join WITHOUT a shuffle (and without even a sort when
        ``sort=True``), because rows are already hash-partitioned on disk.
        At 100 TB this is how repeatedly-joined fact tables amortize their
        shuffle once at write time (the local stand-in for Iceberg's
        ``bucket(N, key)`` partition transform; plan-asserted in
        tests/test_plans.py). Registers in the session catalog under
        ``table``; data lives beside the manifest tables."""
        writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
        if sort:
            writer = writer.sortBy(bucket_col)
        writer.option(
            "path", os.path.join(self.root, f"{table}__bucketed")
        ).saveAsTable(table)

    def vacuum_stages(self, table: str) -> list[str]:
        """Delete staged snapshot directories (``stage-*``) that no
        manifest entry references — the orphans left when a writer
        crashes between ``stage_partitioned`` and its ``commit_staged``
        batches (ADVICE r02: without GC, repeated kill/resume cycles
        accumulate unreferenced parquet forever). Committed bases are
        never touched; single-writer per table by design, so a stage dir
        with no manifest reference at resume time is dead. Returns the
        removed paths."""
        import shutil

        tdir = os.path.join(self.root, table)
        if not os.path.isdir(tdir):
            return []
        referenced = {
            e["base_path"] for e in self._load_manifest(table)
            if "base_path" in e
        }
        removed = []
        for d in os.listdir(tdir):
            path = os.path.join(tdir, d)
            if (
                d.startswith("stage-")
                and os.path.isdir(path)
                and path not in referenced
            ):
                shutil.rmtree(path)
                removed.append(path)
        return removed

    def read(self, table: str) -> DataFrame:
        entries = self._load_manifest(table)
        if not entries:
            raise FileNotFoundError(f"catalog table not found: {table}")
        dfs = []
        # one DataFrame per plain SNAPSHOT (not one multi-path read):
        # spark.read.parquet(*paths) silently picks one file's schema
        # and NULL-fills the rest, so drift between two appends would
        # bypass the drift guard below (round-5 review) — per-snapshot
        # reads route every snapshot pair through the strict unionByName
        for e in entries:
            if "path" in e:
                dfs.append(self.spark.read.parquet(e["path"]))
        # staged-partition entries are read PER ENTRY (ADVICE r05: the
        # earlier per-base grouping merged all staged snapshots sharing
        # one base into a single multi-path read, so data-column drift
        # between two staged commits on the same base could still be
        # silently NULL-filled by schema picking); the basePath option
        # reconstructs the partition column from the directory names
        part_cols: set[str] = set()
        for e in entries:
            if e.get("paths"):
                # part_col recorded since round 5; older manifests carry
                # it only in the directory name ('col=value')
                part_cols.add(
                    e.get("part_col")
                    or os.path.basename(e["paths"][0]).split("=", 1)[0]
                )
                dfs.append(
                    self.spark.read.option(
                        "basePath", e["base_path"]
                    ).parquet(*e["paths"])
                )
        if not dfs:
            raise FileNotFoundError(f"catalog table has no data: {table}")
        out = dfs[0]
        for d in dfs[1:]:
            # a table can legitimately hold BOTH plain snapshots (append/
            # overwrite, no partition column) and staged snapshots (the
            # reconstructed partition column) — e.g. a streaming sink on
            # a table run_stage once staged. The allowance is restricted
            # to exactly the known partition column(s): plain rows read
            # those as NULL, but any OTHER column-set drift between
            # snapshots (renamed/dropped data column) still fails loudly
            # instead of silently NULL-filling (ADVICE r04).
            diff = set(out.columns) ^ set(d.columns)
            if diff - part_cols:
                raise ValueError(
                    f"catalog table {table!r}: schema drift between "
                    f"snapshots on non-partition column(s) "
                    f"{sorted(diff - part_cols)}"
                )
            # name-level match is not enough (ADVICE r05): a column
            # re-written with a different type would be silently
            # up/cross-cast by unionByName — compare declared types too.
            # Partition columns are exempt like they are in the name
            # check: their types come from per-read directory-name
            # inference, so two healthy staged entries (or a staged
            # entry next to a plain snapshot) can legitimately disagree
            # (r06 review finding).
            t_out, t_d = dict(out.dtypes), dict(d.dtypes)
            retyped = sorted(
                c for c in (set(out.columns) & set(d.columns)) - part_cols
                if t_out[c] != t_d[c]
            )
            if retyped:
                raise ValueError(
                    f"catalog table {table!r}: type drift between "
                    f"snapshots on column(s) "
                    f"{[(c, t_out[c], t_d[c]) for c in retyped]}"
                )
            out = out.unionByName(d, allowMissingColumns=bool(diff))
        return out

    def row_count(self, table: str) -> int:
        """Metadata-only count (the Iceberg snapshot-count analog —
        SURVEY §2.D A7)."""
        return sum(e["n_rows"] for e in self._load_manifest(table))
