#!/usr/bin/env python
"""Scaling-efficiency protocol (BASELINE.md §3, north rule): the same
end-to-end pipeline job, same input, at local[8] (N) and local[32] (4N),
each in a fresh JVM. Efficiency = throughput(4N) / (4 × throughput(N)).

Writes BENCH/scaling.json and regenerates BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CORPUS = os.path.join(REPO, "BENCH", "corpus")
N_PAGES = int(os.environ.get("SCALING_PAGES", "120000"))
SEED = 42


def ensure_corpus() -> None:
    if os.path.exists(os.path.join(CORPUS, "_SUCCESS")):
        return
    from kbspark.corpus import synth_corpus_df
    from kbspark.session import get_spark

    spark = get_spark(app="corpus-gen", cpus=32)
    df = synth_corpus_df(spark, N_PAGES, seed=SEED, n_partitions=128)
    df.write.mode("overwrite").parquet(CORPUS)
    spark.stop()


def run(cpus: int) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "pipeline_run.py"),
         "--cpus", str(cpus), "--input", CORPUS],
        capture_output=True, text=True, check=True, cwd=REPO,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    ensure_corpus()
    results = {}
    for cpus in (8, 32):
        results[cpus] = run(cpus)
        print(json.dumps(results[cpus]))

    n, n4 = results[8], results[32]
    eff = n4["docs_per_sec"] / (4 * n["docs_per_sec"])
    summary = {
        "protocol": "same job, same input, fresh JVM per run; "
                    "local[8] (N) vs local[32] (4N)",
        "n_pages": N_PAGES,
        "seed": SEED,
        "N": n,
        "4N": n4,
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "scaling.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))

    md = f"""# BENCH/BASELINE.md — measured numbers

## Scaling efficiency (north rule: ≥0.8 from N to 4N)

Protocol (BASELINE.md §3): deterministic synthetic corpus
({N_PAGES:,} wiki-markup pages, seed={SEED}, generated once to
`BENCH/corpus/`), then the identical end-to-end pipeline job — parquet
scan → E1 clean_text + E2 mention extraction (Arrow-batched mapInPandas,
broadcast dictionaries) → triple materialization (broadcast join +
pre-aggregated dedup shuffle) → count — run cold (fresh JVM) at two
parallelism levels. `spark.sql.shuffle.partitions` = 2×cores.

| level | cores | pipeline secs | docs/sec | triples/sec |
|---|---|---|---|---|
| N  | 8  | {n['pipeline_secs']} | {n['docs_per_sec']} | {n['triples_per_sec']} |
| 4N | 32 | {n4['pipeline_secs']} | {n4['docs_per_sec']} | {n4['triples_per_sec']} |

**Scaling efficiency = {n4['docs_per_sec']} / (4 × {n['docs_per_sec']})
= {eff:.3f}** (target ≥ 0.8: {"PASS" if eff >= 0.8 else "FAIL"}).

## Headline suite

`python bench.py` (sf0.1 driver tables, local[32]) — see latest
BENCH_r*.json recorded by the driver; the flagship `kg_triples` includes
corpus derivation + full extraction + triple build.
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)


if __name__ == "__main__":
    main()
