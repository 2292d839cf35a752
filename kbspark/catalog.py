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

    def read(self, table: str) -> DataFrame:
        entries = self._load_manifest(table)
        if not entries:
            raise FileNotFoundError(f"catalog table not found: {table}")
        return self.spark.read.parquet(*[e["path"] for e in entries])

    def row_count(self, table: str) -> int:
        """Metadata-only count (the Iceberg snapshot-count analog —
        SURVEY §2.D A7)."""
        return sum(e["n_rows"] for e in self._load_manifest(table))
