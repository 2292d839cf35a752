"""kbspark — PySpark-native knowledge-graph construction engine.

A from-scratch, Spark-first re-expression of the query/data-processing
capabilities of qurator-spk/sbb_knowledge-base (reference at
/root/reference, cited per-operator in docstrings), designed for an
Iceberg-style corpus of Common-Crawl-style web pages
(url, warc_ts, html, text, lang) at 10^12-document scale.

Modules
-------
session    SparkSession factory tuned for local[N] testing / cluster scale
extract    E1-E6: markup->text cascade (byte-identical), mention
           extraction, tokenization, sentence split, BIO tagging
corpus     deterministic synthetic page corpora (FIXTURES.md §1)
dims       entity-dictionary build (SURVEY.md §3.2 semantics)
redirects  redirect resolution (J2/J3, redirects2entities)
closure    A1 iterative category-graph closure
apriori    A2 salted two-phase a-priori link probabilities
linking    E8-E10 candidate generation + entity-link scoring
triples    canonicalized (subj, pred, obj) materialization
lineage    per-partition checkpointed lineage + metrics + exact resume
catalog    parquet-dir table catalog emulating Iceberg atomic append
textops    training-data ops: dedup, lang-id, quality, tokens, fingerprints
simsearch  embedding similarity: brute-force + LSH-bucketed ANN
media      multimodal binary-column plumbing (decode stubbed)
jobs       end-to-end pipeline entry points
"""

__version__ = "0.1.0"
