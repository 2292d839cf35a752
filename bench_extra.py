#!/usr/bin/env python
"""Stage-level profiling harness for the optimization round (guide §1.4):
times individual pipeline stages against a noop sink so the computation,
not the sink or the driver collect, is measured. Separate from bench.py
(FROZEN for driver measurement) per the round-6 rules.

Usage:
    python bench_extra.py [stage ...]      # default: all stages

Prints one JSON line per stage: {"stage": ..., "secs": ..., "extra": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F


def noop(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 3)


def npart(df) -> int:
    return df.select(F.spark_partition_id().alias("p")).distinct().count()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    only = set(sys.argv[1:])

    from kbspark.session import get_spark, reset_memos

    spark = get_spark(app="kbspark-bench-extra", cpus=cpus,
                      shuffle_partitions=cpus)
    sc = spark.sparkContext

    # JVM + Arrow warmup (same as bench.py)
    spark.range(1000).selectExpr("sum(id)").collect()

    def _noop_pd(batches):
        for pdf in batches:
            yield pdf

    spark.range(2048).selectExpr("id").mapInPandas(
        _noop_pd, schema="id long"
    ).count()

    out: list[dict] = []

    def rec(stage: str, secs: float, **extra) -> None:
        row = {"stage": stage, "secs": secs, **extra}
        out.append(row)
        print(json.dumps(row), flush=True)

    def want(stage: str) -> bool:
        return not only or any(stage.startswith(o) for o in only)

    from kbspark.corpus import (
        dims_from_documents,
        pages_from_documents,
        words_from_documents,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    if want("scan"):
        rec("scan_partitions", 0.0,
            documents=npart(docs),
            lineitem=npart(spark.read.parquet(f"{sf_dir}/lineitem.parquet")),
            events=npart(spark.read.parquet(f"{sf_dir}/events.parquet")),
            embeddings=npart(
                spark.read.parquet(f"{sf_dir}/embeddings.parquet")
            ))

    if want("words"):
        reset_memos()
        sc.setJobDescription("words: tokenize + persist")
        t0 = time.time()
        wdf = words_from_documents(spark, sf_dir)
        wdf.count()
        rec("words_materialize", round(time.time() - t0, 3),
            parts=npart(wdf))

    if want("dims"):
        reset_memos()
        sc.setJobDescription("dims: vocab distinct + collect")
        t0 = time.time()
        dims_from_documents(spark, sf_dir)
        rec("dims_collect", round(time.time() - t0, 3))
        # second call = words memo warm, isolates the vocab part
        from kbspark import corpus as _corpus
        _corpus._DIM_CACHE.clear()
        t0 = time.time()
        dims_from_documents(spark, sf_dir)
        rec("dims_collect_warm_words", round(time.time() - t0, 3))

    if want("pages"):
        reset_memos()
        sc.setJobDescription("pages: markup derivation")
        pages = pages_from_documents(spark, sf_dir)
        rec("pages_noop", noop(pages), parts=npart(pages))

    if want("annotate"):
        reset_memos()
        from kbspark.extract import annotate_stage, mention_stage

        ents, reds = dims_from_documents(spark, sf_dir)
        pages = pages_from_documents(spark, sf_dir)
        sc.setJobDescription("annotate_stage")
        rec("annotate_noop", noop(
            annotate_stage(pages, spark, ents, reds)
        ))
        sc.setJobDescription("mention_stage")
        rec("mention_noop", noop(
            mention_stage(pages, spark, ents, reds)
        ))

    if want("spans"):
        reset_memos()
        from kbspark.extract import annotate_stage
        from kbspark.linking import mention_spans_sql

        ents, reds = dims_from_documents(spark, sf_dir)
        pages = pages_from_documents(spark, sf_dir)
        tagged = annotate_stage(pages, spark, ents, reds).persist()
        tagged.count()
        sc.setJobDescription("mention_spans_sql over persisted tagged")
        rec("spans_sql_noop", noop(mention_spans_sql(tagged)))
        rec("spans_sql_noop2", noop(mention_spans_sql(tagged)))
        tagged.unpersist()

    if want("simhash"):
        reset_memos()
        from kbspark.textops import (
            simhash64,
            simhash_block_table,
            simhash_near_dups,
        )

        words = words_from_documents(spark, sf_dir)
        sc.setJobDescription("simhash: signature agg only")
        rec("simhash_sig_noop", noop(simhash64(docs, words=words)))
        sig = simhash64(docs, words=words)
        blocks = simhash_block_table(sig, 8).persist()
        blocks.count()
        sc.setJobDescription("simhash: block join + verify (sig persisted)")
        t0 = time.time()
        simhash_near_dups(docs, max_hamming=7, n_blocks=8,
                          blocks=blocks).count()
        rec("simhash_join_verify", round(time.time() - t0, 3))
        blocks.unpersist()
        reset_memos()
        sc.setJobDescription("simhash: full cold")
        t0 = time.time()
        simhash_near_dups(
            docs, max_hamming=7, n_blocks=8,
            words=words_from_documents(spark, sf_dir),
        ).count()
        rec("simhash_full_cold", round(time.time() - t0, 3))

    if want("lsh"):
        reset_memos()
        from kbspark.textops import (
            lsh_band_table,
            lsh_near_dup_pairs,
            shingles_from_words,
        )

        words = words_from_documents(spark, sf_dir)
        sh = shingles_from_words(words, n=3).persist()
        sc.setJobDescription("lsh: shingles only")
        t0 = time.time()
        sh.count()
        rec("lsh_shingles", round(time.time() - t0, 3))
        sc.setJobDescription("lsh: band table (shingles persisted)")
        rec("lsh_bands_noop", noop(
            lsh_band_table(n_hashes=8, n_bands=2, shingles_df=sh)
        ))
        sh.unpersist()
        reset_memos()
        sc.setJobDescription("lsh: full cold")
        t0 = time.time()
        lsh_near_dup_pairs(
            docs, n_hashes=8, n_bands=2, threshold=0.5,
            words=words_from_documents(spark, sf_dir),
        ).count()
        rec("lsh_full_cold", round(time.time() - t0, 3))

    if want("el"):
        reset_memos()
        from kbspark.jobs import entity_linking_job

        sc.setJobDescription("el: full cold (dict)")
        t0 = time.time()
        entity_linking_job(spark, sf_dir).count()
        rec("el_full_cold", round(time.time() - t0, 3))

    if want("triples"):
        reset_memos()
        from kbspark.jobs import flagship_triples

        sc.setJobDescription("triples: full cold (dict)")
        t0 = time.time()
        flagship_triples(spark, sf_dir).count()
        rec("triples_full_cold", round(time.time() - t0, 3))

    sc.setJobDescription(None)
    print(json.dumps({"stages": out, "sf_dir": sf_dir, "cpus": cpus}))


if __name__ == "__main__":
    main()
