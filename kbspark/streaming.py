"""Structured Streaming incremental mode (SURVEY.md §2.G).

The reference is batch-only; its 'streaming' is chunked XML parsing +
chunked sink appends for memory control (S1/S4). Our engine's streaming
surface is therefore an **incremental-append mode over new snapshots**:
``Trigger.AvailableNow``-style processing that reuses the identical batch
dataflow — the idiomatic Spark shape for a batch pipeline that must also
absorb a trickle of new WARC partitions.

``run_incremental`` drives a streaming source through the provided batch
transform into an in-memory (or parquet) sink synchronously — the local
smoke path; on a cluster the same code takes a Kafka/files source and a
``foreachBatch`` Iceberg sink.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession


def _as_stream_dir(source_path: str) -> str:
    """The streaming file source requires a directory; wrap a single
    parquet file in a temp dir via symlink (one shared helper — the
    block was copy-pasted in four entry points, round-3 review)."""
    if not os.path.isfile(source_path):
        return source_path
    d = tempfile.mkdtemp(prefix="kbspark_stream_")
    os.symlink(os.path.abspath(source_path),
               os.path.join(d, os.path.basename(source_path)))
    import atexit
    import shutil

    atexit.register(shutil.rmtree, d, True)
    return d


def run_incremental(
    spark: SparkSession,
    source_path: str,
    transform,
    schema=None,
    query_name: str | None = None,
) -> DataFrame:
    """readStream(parquet at source_path) → transform(df) → memory sink;
    processes everything available, stops, and returns the sink contents
    as a batch DataFrame (deterministic for a static source)."""
    if schema is None:
        schema = spark.read.parquet(source_path).schema
    name = query_name or f"inc_{uuid.uuid4().hex[:8]}"
    source_path = _as_stream_dir(source_path)
    stream = (
        spark.readStream.schema(schema).parquet(source_path)
    )
    out = transform(stream)
    q = (
        out.writeStream.outputMode("complete" if out.isStreaming and _has_agg(out)
                                   else "append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


def _has_agg(df: DataFrame) -> bool:
    plan = df._jdf.queryExecution().logical().toString()
    return "Aggregate" in plan


def streaming_windowed_counts(
    spark: SparkSession,
    source_path: str,
    ts_col: str = "ts",
    key_col: str = "k",
    window: str = "10 minutes",
    watermark: str = "5 minutes",
    max_files_per_trigger: int = 1,
    query_name: str | None = None,
    return_progress: bool = False,
):
    """Watermarked tumbling-window counts over a file stream — the
    §2.G late-data path: ``withWatermark(ts, delay)`` bounds state, a
    window is emitted exactly once when the watermark passes its end
    (append mode), and events arriving after their window's state was
    evicted are DROPPED (numRowsDroppedByWatermark), never
    double-counted. One file per micro-batch so the watermark actually
    advances across batches.

    Returns (window_start, key, n) for every finalized window (plus the
    recent progress list when ``return_progress``)."""
    from pyspark.sql import functions as F

    schema = spark.read.parquet(source_path).schema
    name = query_name or f"winagg_{uuid.uuid4().hex[:8]}"
    source_path = _as_stream_dir(source_path)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_path)
    )
    agg = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), window).alias("win"), F.col(key_col)
        )
        .agg(F.count("*").alias("n"))
        .select(
            F.col("win.start").alias("window_start"), F.col(key_col), "n"
        )
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
        progress = list(q.recentProgress)
    finally:
        q.stop()
    result = spark.table(name)
    return (result, progress) if return_progress else result


def streaming_exact_dedup(
    spark: SparkSession,
    source_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_files_per_trigger: int = 1,
    query_name: str | None = None,
    return_progress: bool = False,
):
    """Stateful incremental deduplication: as document batches arrive,
    emit only first-seen content fingerprints — the streaming counterpart
    of the batch exact-dedup (kbspark.textops / t_exact_dedup).

    State is keyed by the FINGERPRINT itself (dropDuplicates-with-state
    semantics): one O(1) boolean per distinct fingerprint, so a
    micro-batch only touches the state rows of the keys it contains. The
    round-1 design kept the full fingerprint list per hash bucket and
    rewrote it every batch — O(total seen) serialization per batch,
    unbounded at 100 TB (VERDICT r01 #8). Within a key's first batch the
    smallest doc id wins (deterministic under shuffle order).

    Processes everything available from ``source_path`` (one file per
    micro-batch so cross-batch state is actually exercised) and returns
    the deduplicated rows (plus the final progress dict when
    ``return_progress`` — state-store metrics for the growth test)."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    schema = spark.read.parquet(source_path).schema
    name = query_name or f"dedup_{uuid.uuid4().hex[:8]}"
    source_path = _as_stream_dir(source_path)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_path)
    )
    from kbspark.textops import content_fingerprint

    keyed = stream.select(
        F.col(id_col).alias("doc_id"),
        content_fingerprint(text_col).alias("fp"),
    )

    def first_wins(key, pdfs, state):
        if state.exists:
            return  # fingerprint already emitted in an earlier batch
        best = None
        for pdf in pdfs:
            if len(pdf):
                m = int(pdf["doc_id"].min())
                best = m if best is None else min(best, m)
        if best is not None:
            state.update((True,))
            yield pd.DataFrame({"doc_id": [best], "fp": [key[0]]})

    out = keyed.groupBy("fp").applyInPandasWithState(
        first_wins,
        outputStructType="doc_id long, fp string",
        stateStructType="seen boolean",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
        progress = q.lastProgress
    finally:
        q.stop()
    result = spark.table(name)
    return (result, progress) if return_progress else result


def stream_to_catalog(
    spark: SparkSession,
    source_path: str,
    catalog,
    table: str,
    transform=None,
    max_files_per_trigger: int = 1,
    query_name: str | None = None,
) -> DataFrame:
    """Streaming sink into the atomic-manifest catalog (§2.G × §2.A S4):
    every micro-batch appends through ``Catalog.append`` via
    ``foreachBatch``. Spark's foreachBatch contract is at-least-once (a
    batch can be re-delivered after a restart); the sink dedups PER
    SOURCE FILE (``input_file_name()``), not on the positional batchId
    and not on the batch's file set: positional ids shift when a
    restarted source orders files differently, and batch boundaries
    shift when a re-delivered file is co-batched with a new one — both
    would silently drop or double-commit rows (round-3 review
    findings). Per-file bookkeeping commits exactly the rows of files
    not yet in the manifest, so TABLE CONTENTS are exactly-once
    (asserted in tests: whole-stream replay, shifted assignment, and
    mixed new/old co-batching). Non-file batches fall back to the
    batchId. On a cluster the identical sink function rides a
    checkpointLocation + Iceberg.

    Processes everything available and returns the committed table."""
    from pyspark.sql import functions as F
    schema = spark.read.parquet(source_path).schema
    name = query_name or f"sink_{uuid.uuid4().hex[:8]}"
    source_path = _as_stream_dir(source_path)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_path)
    )
    out = transform(stream) if transform is not None else stream

    root = os.path.abspath(source_path)

    def _rel(uri: str) -> str:
        # dedup key = path RELATIVE TO THE SOURCE ROOT, not the basename
        # (ADVICE r03): partitioned layouts (date=*/part-00000.parquet)
        # hold distinct files with equal basenames, and a basename key
        # would silently skip the second one's rows
        p = uri
        if p.startswith("file:"):
            p = p[len("file:"):]
            while p.startswith("//"):
                p = p[1:]
        if os.path.isabs(p):
            try:
                return os.path.relpath(p, root)
            except ValueError:  # different drive etc. — full path is fine
                return p
        return p

    def sink(batch_df, batch_id):
        uris = sorted(
            r["_f"]
            for r in batch_df.select(
                F.input_file_name().alias("_f")
            ).distinct().collect()
            if r["_f"]
        )
        files = [_rel(u) for u in uris]
        if not files:
            # non-file source: positional id is all we have
            key = f"batch:{batch_id}"
            committed_keys = {
                e["meta"].get("stream_key")
                for e in catalog.snapshots(table)
            }
            if key in committed_keys:
                return
            catalog.append(
                table, batch_df,
                meta={"stream_key": key, "stream_batch": batch_id,
                      "stage": f"stream:{name}"},
            )
            return
        # dedup PER FILE, not per file-set: a re-delivered file can be
        # co-batched with a brand-new one after a restart (batch
        # boundaries shift), so a set-level key would double-commit the
        # old file and a positional id would drop the new one — commit
        # exactly the not-yet-committed files' rows
        committed_files = set()
        for e in catalog.snapshots(table):
            committed_files.update(e["meta"].get("stream_files", []))
        new_files = [f for f in files if f not in committed_files]
        if not new_files:
            return  # every file in this batch is already committed
        out = batch_df
        if len(new_files) < len(files):
            new_set = set(new_files)
            new_uris = [u for u, f in zip(uris, files) if f in new_set]
            out = batch_df.filter(F.input_file_name().isin(new_uris))
        catalog.append(
            table, out,
            meta={
                "stream_files": new_files,
                "stream_batch": batch_id,
                "stage": f"stream:{name}",
            },
        )

    q = out.writeStream.foreachBatch(sink).queryName(name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return catalog.read(table)
