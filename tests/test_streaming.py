"""§2.G streaming: incremental aggregation equals batch, and stateful
cross-micro-batch deduplication keeps exactly the first occurrence."""

import pandas as pd
from pyspark.sql import functions as F

from kbspark.streaming import run_incremental, streaming_exact_dedup


_MTIME_BASE = 1_700_000_000.0


def write_stream_file(spark, flat_dir, pdf, seq: int):
    """Write ``pdf`` as one parquet file into the flat source dir with a
    PINNED mtime (the file source orders micro-batches by mtime — coarse
    filesystem timestamps would otherwise leave batch order to listing
    luck; round-3 test review). ``seq`` fixes the batch order."""
    import glob
    import os
    import shutil
    import tempfile

    tdir = tempfile.mkdtemp(dir=str(flat_dir.parent))
    spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(
        tdir
    )
    dst = flat_dir / f"{seq:03d}.parquet"
    shutil.copy(glob.glob(os.path.join(tdir, "*.parquet"))[0], dst)
    t = _MTIME_BASE + 10 * seq
    os.utime(dst, (t, t))
    shutil.rmtree(tdir)
    return dst


def test_run_incremental_equals_batch(spark, sf01_dir):
    def agg(df):
        return df.groupBy("event_type").agg(F.count("*").alias("n"))

    streamed = run_incremental(spark, f"{sf01_dir}/events.parquet", agg)
    batch = agg(spark.read.parquet(f"{sf01_dir}/events.parquet"))
    assert sorted(map(tuple, streamed.collect())) == sorted(
        map(tuple, batch.collect())
    )


def test_streaming_exact_dedup_across_batches(spark, tmp_path):
    # two parquet files -> two micro-batches (maxFilesPerTrigger=1);
    # duplicates appear within AND across batches
    a = pd.DataFrame(
        {"doc_id": [1, 2, 3], "text": ["alpha beta", "gamma", "alpha  beta"]}
    )  # 3 is a whitespace-variant dup of 1
    b = pd.DataFrame(
        {"doc_id": [4, 5], "text": ["GAMMA", "delta"]}
    )  # 4 dups 2 (case-normalized), across the batch boundary
    flat = tmp_path / "flat"
    flat.mkdir()
    write_stream_file(spark, flat, a, 0)
    write_stream_file(spark, flat, b, 1)

    out = streaming_exact_dedup(spark, str(flat)).toPandas()
    kept = set(out.doc_id)
    assert 5 in kept and len(kept) == 3
    # exactly one of each dup-group survives
    assert len({1, 3} & kept) == 1
    assert len({2, 4} & kept) == 1


def test_streaming_dedup_state_is_fingerprint_keyed(spark, tmp_path):
    """VERDICT r01 #8: per-batch state writes scale with NEW keys, not
    docs seen. Batch 1 introduces 50 fingerprints; batch 2 is 100%
    duplicates — the state store must report zero updated rows for it
    (the round-1 bucket-list design rewrote full fingerprint lists every
    batch), while total state rows equal the distinct fingerprints."""
    texts = [f"doc number {i} content" for i in range(50)]
    first = pd.DataFrame({"doc_id": range(50), "text": texts})
    dups = pd.DataFrame({"doc_id": range(100, 150), "text": texts})
    flat = tmp_path / "flat2"
    flat.mkdir()
    write_stream_file(spark, flat, first, 0)
    write_stream_file(spark, flat, dups, 1)

    out, progress = streaming_exact_dedup(
        spark, str(flat), return_progress=True
    )
    assert out.count() == 50
    assert set(out.toPandas().doc_id) == set(range(50))  # first batch wins
    state = progress["stateOperators"][0]
    assert state["numRowsTotal"] == 50  # one O(1) row per fingerprint
    assert state["numRowsUpdated"] == 0  # all-dup batch rewrites nothing


def test_watermarked_window_drops_late_and_emits_once(spark, tmp_path):
    """§2.G late data: a 10-min window with a 5-min watermark. Batch 0
    fills the 10:00 window; batch 1 advances the watermark past its end;
    batch 2 triggers its eviction/emission; batch 3 delivers a LATE
    event into the closed window — it must be dropped by the watermark
    (numRowsDroppedByWatermark), the window emitted exactly once with
    the on-time counts, and the still-open tail windows not emitted at
    all (append mode)."""
    import datetime as dt

    from kbspark.streaming import streaming_windowed_counts

    t = lambda m: dt.datetime(2024, 1, 1, 10, m)  # noqa: E731
    batches = [
        pd.DataFrame({"ts": [t(1), t(3), t(4)], "k": ["a", "a", "b"]}),
        pd.DataFrame({"ts": [t(31)], "k": ["a"]}),  # watermark -> 10:26
        pd.DataFrame({"ts": [t(33)], "k": ["b"]}),  # 10:00 window evicts
        pd.DataFrame({"ts": [t(2), t(34)], "k": ["a", "a"]}),  # 10:02 late
    ]
    flat = tmp_path / "stream"
    flat.mkdir()
    for i, pdf in enumerate(batches):
        write_stream_file(spark, flat, pdf, i)

    out, progress = streaming_windowed_counts(
        spark, str(flat), return_progress=True
    )
    rows = {
        (r.window_start.strftime("%H:%M"), r.k): r.n
        for r in out.toPandas().itertuples()
    }
    # 10:00 window finalized with ON-TIME counts only (late 10:02 dropped)
    assert rows == {("10:00", "a"): 2, ("10:00", "b"): 1}
    dropped = sum(
        p["stateOperators"][0].get("numRowsDroppedByWatermark", 0)
        for p in progress
        if p.get("stateOperators")
    )
    assert dropped == 1  # exactly the late 10:02 event


def test_stream_to_catalog_exactly_once(spark, tmp_path):
    """foreachBatch sink into the atomic-manifest catalog: streamed
    contents equal the batch read, one manifest entry per micro-batch,
    and a re-delivered batch id (Spark's at-least-once restart contract)
    commits nothing twice."""
    import pandas as pd
    from pyspark.sql import functions as F

    from kbspark.catalog import Catalog
    from kbspark.streaming import stream_to_catalog

    flat = tmp_path / "flat"
    flat.mkdir()
    for i in range(3):
        pdf = pd.DataFrame({"k": [i] * 4, "v": list(range(4))})
        write_stream_file(spark, flat, pdf, i)

    cat = Catalog(spark, str(tmp_path / "wh"))
    out = stream_to_catalog(
        spark, str(flat), cat, "events_sink",
        transform=lambda s: s.select("k", (F.col("v") * 2).alias("v2")),
    )
    batch = spark.read.parquet(str(flat)).select(
        "k", (F.col("v") * 2).alias("v2")
    )
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, batch.collect())
    )
    entries = cat.snapshots("events_sink")
    batch_ids = [e["meta"]["stream_batch"] for e in entries]
    assert len(batch_ids) == len(set(batch_ids)) == 3  # one per micro-batch

    # replay the whole stream (restart re-delivery of every batch id):
    # the sink's manifest guard must commit nothing twice
    n_before = cat.row_count("events_sink")
    again = stream_to_catalog(
        spark, str(flat), cat, "events_sink",
        transform=lambda s: s.select("k", (F.col("v") * 2).alias("v2")),
    )
    assert cat.row_count("events_sink") == n_before
    assert again.count() == n_before

    # shifted batch assignment (round-3 review finding): a NEW file with
    # an OLDER mtime re-orders the source, so positional batch ids no
    # longer line up — the content key must still commit exactly the new
    # file's rows and re-commit nothing
    import os

    pdf = pd.DataFrame({"k": [9] * 4, "v": list(range(4))})
    # a NEW file with an OLDER pinned mtime than every committed file —
    # written under an UNUSED seq so the committed 000.parquet stays on
    # disk and its re-delivery is part of the replay (round-4 test
    # review: seq=0 clobbered-then-renamed the original batch-0 file)
    dst = write_stream_file(spark, flat, pdf, 3)
    older = dst.parent / "a_older.parquet"
    dst.rename(older)
    t = _MTIME_BASE - 9999
    os.utime(older, (t, t))

    merged = stream_to_catalog(
        spark, str(flat), cat, "events_sink",
        transform=lambda s: s.select("k", (F.col("v") * 2).alias("v2")),
    )
    assert cat.row_count("events_sink") == n_before + 4
    per_key = {
        r["k"]: r["n"]
        for r in merged.groupBy("k").agg(F.count("*").alias("n")).collect()
    }
    assert per_key == {0: 4, 1: 4, 2: 4, 9: 4}


def test_stream_to_catalog_cobatched_new_and_old_files(spark, tmp_path):
    """maxFilesPerTrigger=2 after a restart co-batches a re-delivered
    file with a brand-new one: per-file dedup must commit exactly the
    new file's rows (a set-level key would double-commit, a positional
    id would drop the new file — round-3 review)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from kbspark.catalog import Catalog
    from kbspark.streaming import stream_to_catalog

    flat = tmp_path / "flat2"
    flat.mkdir()

    def add_file(i):
        write_stream_file(spark, flat, pd.DataFrame({"k": [i] * 3}), i)

    for i in range(3):
        add_file(i)
    cat = Catalog(spark, str(tmp_path / "wh2"))
    stream_to_catalog(spark, str(flat), cat, "sink2",
                      max_files_per_trigger=2)
    assert cat.row_count("sink2") == 9

    # new file lands; restart re-reads everything with 2-file batches —
    # old files now co-batch with the new one in arbitrary groupings
    add_file(7)
    out = stream_to_catalog(spark, str(flat), cat, "sink2",
                            max_files_per_trigger=2)
    assert cat.row_count("sink2") == 12
    per_key = {
        r["k"]: r["n"]
        for r in out.groupBy("k").agg(F.count("*").alias("n"))
        .collect()
    }
    assert per_key == {0: 3, 1: 3, 2: 3, 7: 3}


def test_stream_to_catalog_partitioned_layout_equal_basenames(
    spark, tmp_path
):
    """Partitioned source layouts (date=*/part-00000.parquet) hold
    DISTINCT files with EQUAL basenames; the exactly-once key must be
    the source-root-relative path, or the second partition's rows are
    silently skipped as already-committed (ADVICE r03)."""
    import os

    import pandas as pd
    from pyspark.sql import functions as F

    from kbspark.catalog import Catalog
    from kbspark.streaming import stream_to_catalog

    src = tmp_path / "part_src"
    for i, day in enumerate(["2026-01-01", "2026-01-02", "2026-01-03"]):
        d = src / f"date={day}"
        d.mkdir(parents=True)
        tmp = write_stream_file(
            spark, d, pd.DataFrame({"k": [i] * 3, "v": list(range(3))}), i
        )
        # SAME basename in every partition directory
        dst = d / "part-00000.parquet"
        tmp.rename(dst)
        t = _MTIME_BASE + 10 * i
        os.utime(dst, (t, t))

    cat = Catalog(spark, str(tmp_path / "wh3"))
    out = stream_to_catalog(spark, str(src), cat, "sink3",
                            max_files_per_trigger=1)
    per_key = {
        r["k"]: r["n"]
        for r in out.groupBy("k").agg(F.count("*").alias("n")).collect()
    }
    # a basename key would have committed only the first partition
    assert per_key == {0: 3, 1: 3, 2: 3}
    assert cat.row_count("sink3") == 9

    # full replay commits nothing twice (keys are stable relpaths)
    stream_to_catalog(spark, str(src), cat, "sink3",
                      max_files_per_trigger=1)
    assert cat.row_count("sink3") == 9
