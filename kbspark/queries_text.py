"""Training-data-pipeline operators over the documents/embeddings tables
(driver contract entries; see also kbspark.textops / kbspark.simsearch
for the reusable implementations these call)."""

from __future__ import annotations

from pyspark.sql import Window as W, functions as F

from kbspark.contract import register

# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------


_BPE_PATTERN = (
    r"'s|'t|'re|'ve|'m|'ll|'d| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s]+|\s+"
)
# DuckDB single-quoted literals do NOT process backslash escapes — only
# quotes need doubling; doubling backslashes would hand RE2 a DIFFERENT
# pattern (\s becomes literal backslash + s; round-3 review, latent
# because the sf corpora contain no punctuation-adjacent whitespace)
_BPE_SQL = _BPE_PATTERN.replace("'", "''")


@register(
    "t_text_metrics",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang, text, STRING_SPLIT_REGEX(TRIM(text), '\\s+') AS words
      FROM documents
    )
    SELECT doc_id, lang,
           CAST(LEN(words) AS INT) AS n_tokens,
           LENGTH(text) AS n_chars_actual,
           CAST(LEN(REGEXP_EXTRACT_ALL(text, '{_BPE_SQL}')) AS INT)
             AS n_bpe_tokens,
           CAST(LEN(LIST_FILTER(words, w -> w IN ('the', 'a'))) AS INT)
             AS n_stopwords,
           ROUND(LEN(LIST_FILTER(words, w -> w IN ('the', 'a')))
                 / GREATEST(LEN(words), 1), 6) AS stopword_ratio,
           ROUND(LEN(LIST_FILTER(words, w -> LENGTH(w) >= 6))
                 / GREATEST(LEN(words), 1), 6) AS long_token_ratio,
           CASE WHEN LEN(LIST_FILTER(words, w -> w IN ('the','a','of','and')))
                     > LEN(words) / 20.0
                THEN 'en_like' ELSE 'other' END AS lang_guess
    FROM toks
    """,
)
def t_text_metrics(spark, sf_dir):
    """Per-document text-analysis metrics in ONE scan + projection
    (merged r02's t_token_count / t_quality_score / t_bpe_token_count /
    t_langid_markers — the driver records at most ~50 entries, so the
    four per-doc metric families are compounded; every metric stays its
    own column so a regression in any one breaks the value hash):

    - whitespace token count + char length,
    - quality scoring (stopword ratio, long-token ratio),
    - BPE-ish token count (GPT-2-style pretokenizer regex,
      lookahead-free so Java regex and RE2 agree),
    - marker-word language-ID heuristic.

    One scan instead of four also cuts suite wall-clock. All JVM-side
    (split/filter/regexp_count) — no Python in the path."""
    words = F.split(F.trim(F.col("text")), r"\s+")
    stop = F.size(F.filter(words, lambda w: w.isin("the", "a")))
    longtok = F.size(F.filter(words, lambda w: F.length(w) >= 6))
    denom = F.greatest(F.size(words), F.lit(1))
    en = F.size(F.filter(words, lambda w: w.isin("the", "a", "of", "and")))
    return spark.table("documents").select(
        "doc_id",
        "lang",
        F.size(words).alias("n_tokens"),
        F.length("text").alias("n_chars_actual"),
        F.regexp_count("text", F.lit(_BPE_PATTERN)).cast("int").alias(
            "n_bpe_tokens"
        ),
        stop.alias("n_stopwords"),
        F.round(stop / denom, 6).alias("stopword_ratio"),
        F.round(longtok / denom, 6).alias("long_token_ratio"),
        F.when(en > F.size(words) / F.lit(20.0), "en_like")
        .otherwise("other")
        .alias("lang_guess"),
    )


@register(
    "t_exact_dedup",
    oracle="""
    WITH fp AS (
      SELECT doc_id,
             MD5(LOWER(REGEXP_REPLACE(TRIM(text), '\\s+', ' ', 'g'))) AS fingerprint
      FROM documents
    )
    SELECT doc_id, fingerprint,
           COUNT(*) OVER (PARTITION BY fingerprint) AS n_dups,
           MIN(doc_id) OVER (PARTITION BY fingerprint) AS keep_doc_id
    FROM fp
    """,
)
def t_exact_dedup(spark, sf_dir):
    """Exact deduplication, per-document view (merged r02's
    t_fingerprint + t_exact_dedup): normalized-content fingerprint
    (whitespace-collapse + lowercase + md5) per doc_id PLUS the group
    stats (dup count, deterministic survivor = min doc_id) via one
    window — verifies both the doc->fingerprint map and the hash-groupBy
    dedup in a single entry, stronger than either half alone."""
    from kbspark.textops import content_fingerprint

    fp = spark.table("documents").select(
        "doc_id", content_fingerprint("text").alias("fingerprint")
    )
    w = W.partitionBy("fingerprint")
    return fp.select(
        "doc_id",
        "fingerprint",
        F.count("*").over(w).alias("n_dups"),
        F.min("doc_id").over(w).alias("keep_doc_id"),
    )


# ---------------------------------------------------------------------------
# Near-duplicate detection
# ---------------------------------------------------------------------------

_SHINGLES_DUCK = """
      SELECT doc_id,
             LIST_DISTINCT(LIST_TRANSFORM(
               RANGE(1, GREATEST(LEN(words) - 1, 1)),
               i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]
             )) AS shingles
      FROM (SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text), '\\s+') AS words
            FROM documents)
      WHERE LEN(words) >= 3
"""


@register(
    "t_lsh_near_dup_pairs",
    oracle=f"""
    WITH RECURSIVE sh AS ({_SHINGLES_DUCK}),
    exploded AS (SELECT doc_id, UNNEST(shingles) AS shingle FROM sh),
    hashed AS (
      SELECT doc_id, h, MIN(MD5(CAST(h AS VARCHAR) || ':' || shingle)) AS minhash
      FROM exploded, (SELECT UNNEST(RANGE(0, 8)) AS h)
      GROUP BY doc_id, h
    ),
    bands AS (
      SELECT doc_id, h // 4 AS band_id,
             STRING_AGG(minhash, '|' ORDER BY h) AS band_key
      FROM hashed GROUP BY doc_id, h // 4
    ),
    bc AS (
      SELECT band_id, band_key, COUNT(*) AS n
      FROM bands GROUP BY 1, 2
    ),
    pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band_id = b.band_id AND a.band_key = b.band_key
       AND a.doc_id < b.doc_id
    ),
    jac AS (
      SELECT p.doc_a, p.doc_b,
             ROUND(LEN(LIST_INTERSECT(sa.shingles, sb.shingles)) * 1.0 /
                   LEN(LIST_DISTINCT(sa.shingles || sb.shingles)), 6) AS jaccard
      FROM pairs p
      JOIN sh sa ON sa.doc_id = p.doc_a
      JOIN sh sb ON sb.doc_id = p.doc_b
    ),
    -- capped replay: identical pipeline with over-cap buckets dropped
    -- BEFORE the candidate join (models textops' max_bucket exactly)
    bands_c AS (
      SELECT b.doc_id, b.band_id, b.band_key
      FROM bands b JOIN bc USING (band_id, band_key)
      WHERE bc.n <= 2
    ),
    pairs_c AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands_c a JOIN bands_c b
        ON a.band_id = b.band_id AND a.band_key = b.band_key
       AND a.doc_id < b.doc_id
    ),
    jac_c AS (
      SELECT p.doc_a, p.doc_b,
             ROUND(LEN(LIST_INTERSECT(sa.shingles, sb.shingles)) * 1.0 /
                   LEN(LIST_DISTINCT(sa.shingles || sb.shingles)), 6) AS jaccard
      FROM pairs_c p
      JOIN sh sa ON sa.doc_id = p.doc_a
      JOIN sh sb ON sb.doc_id = p.doc_b
    ),
    -- connected components over the PLAIN pair graph (dup-cluster
    -- resolution): recursive min-root propagation — every node seeds
    -- its own root; roots flow along undirected edges; min reachable
    -- root per node == the component's minimum doc_id
    dup_edges AS (
      SELECT doc_a AS a, doc_b AS b FROM jac WHERE jaccard >= 0.5
      UNION ALL
      SELECT doc_b, doc_a FROM jac WHERE jaccard >= 0.5
    ),
    reach(doc_id, root) AS (
      SELECT DISTINCT a, a FROM dup_edges
      UNION
      SELECT e.b, r.root FROM reach r JOIN dup_edges e ON e.a = r.doc_id
    ),
    comp AS (
      SELECT doc_id, MIN(root) AS cluster_id FROM reach GROUP BY doc_id
    )
    SELECT 'cluster' AS op, doc_id AS doc_a, cluster_id AS doc_b,
           CAST(NULL AS DOUBLE) AS jaccard, CAST(NULL AS BIGINT) AS n_dropped
    FROM comp
    UNION ALL
    SELECT 'plain' AS op, doc_a, doc_b, jaccard,
           CAST(NULL AS BIGINT) AS n_dropped
    FROM jac WHERE jaccard >= 0.5
    UNION ALL
    SELECT 'capped' AS op, doc_a, doc_b, jaccard,
           CAST(NULL AS BIGINT) AS n_dropped
    FROM jac_c WHERE jaccard >= 0.5
    UNION ALL
    SELECT 'dropped' AS op, CAST(NULL AS BIGINT) AS doc_a,
           CAST(NULL AS BIGINT) AS doc_b, CAST(NULL AS DOUBLE) AS jaccard,
           CAST((SELECT COALESCE(SUM(n), 0) FROM bc WHERE n > 2) AS BIGINT)
             AS n_dropped
    """,
)
def t_lsh_near_dup_pairs(spark, sf_dir):
    """MinHash-LSH near-duplicate pairs: band the 8-value signature into
    2 bands of 4, bucket-join on band key (candidate pairs only — never
    the O(n^2) cross join), then verify candidates with exact shingle
    Jaccard >= 0.5.

    Compound entry (VERDICT r03 #3 — cap-tripping correctness): 'plain'
    rows are the uncapped pairs; 'capped' rows rerun the pipeline with
    ``max_bucket=2``, low enough that real buckets at sf0.01 are dropped
    (two size-3 buckets exist); the 'dropped' row carries the number of
    band postings the cap removed, so the hash match proves the
    degenerate-bucket drop logic fired AND produced exactly the
    cap-modeling oracle's pair set.

    Round 5 adds a fourth branch: 'cluster' rows resolve the PLAIN pair
    graph into duplicate clusters via ``textops.dup_clusters`` (pointer-
    jumping connected components) vs a DuckDB recursive-CTE min-root
    oracle — the survivor-selection operator every dedup family needs,
    now driver-visible (VERDICT r04 #7)."""
    from kbspark.corpus import words_from_documents
    from kbspark.session import persist_tracked
    from kbspark.textops import (
        dup_clusters,
        lsh_band_table,
        lsh_near_dup_pairs,
        shingles_from_words,
    )

    words = words_from_documents(spark, sf_dir)
    # ONE shingle->minhash->band build serves all three branches (plain,
    # capped, dropped-count) — round-4 review: the compound ran the
    # dominant pipeline three times
    sh = persist_tracked(shingles_from_words(words, n=3))
    bands = persist_tracked(lsh_band_table(n_hashes=8, n_bands=2,
                                           shingles_df=sh))
    plain = persist_tracked(lsh_near_dup_pairs(
        None, n_hashes=8, n_bands=2, threshold=0.5,
        shingles_df=sh, bands=bands,
    ))
    clusters = dup_clusters(plain).select(
        F.lit("cluster").alias("op"),
        F.col("doc_id").alias("doc_a"),
        F.col("cluster_id").alias("doc_b"),
        F.lit(None).cast("double").alias("jaccard"),
        F.lit(None).cast("long").alias("n_dropped"),
    )
    capped = lsh_near_dup_pairs(
        None, n_hashes=8, n_bands=2, threshold=0.5, max_bucket=2,
        shingles_df=sh, bands=bands,
    )
    dropped = (
        bands.groupBy("band_id", "band_key")
        .agg(F.count("*").alias("_bn"))
        .filter(F.col("_bn") > 2)
        .agg(F.coalesce(F.sum("_bn"), F.lit(0)).alias("n_dropped"))
        .select(
            F.lit("dropped").alias("op"),
            F.lit(None).cast("long").alias("doc_a"),
            F.lit(None).cast("long").alias("doc_b"),
            F.lit(None).cast("double").alias("jaccard"),
            F.col("n_dropped").cast("long"),
        )
    )
    tag = lambda df, op: df.select(  # noqa: E731
        F.lit(op).alias("op"), "doc_a", "doc_b", "jaccard",
        F.lit(None).cast("long").alias("n_dropped"),
    )
    return (
        tag(plain, "plain")
        .unionByName(tag(capped, "capped"))
        .unionByName(dropped)
        .unionByName(clusters)
    )


@register(
    "t_winnowing_fingerprints",
    oracle="""
    WITH w AS (
      SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text), '\\s+') AS words
      FROM documents
    ),
    g AS (
      SELECT doc_id,
             LIST_TRANSFORM(RANGE(0, LEN(words) - 2),
               i -> ARRAY_TO_STRING(words[i+1:i+3], ' ')) AS grams
      FROM w WHERE LEN(words) >= 6
    ),
    h AS (
      SELECT doc_id,
             LIST_TRANSFORM(grams, x ->
               CAST(CONCAT('0x', SUBSTR(MD5(x), 1, 8)) AS BIGINT)) AS hs
      FROM g
    ),
    m AS (
      SELECT doc_id,
             LIST_DISTINCT(LIST_TRANSFORM(RANGE(0, LEN(hs) - 3),
               i -> LIST_MIN(hs[i+1:i+4]))) AS fps
      FROM h
    )
    SELECT doc_id, UNNEST(fps) AS fingerprint FROM m
    """,
)
def t_winnowing_fingerprints(spark, sf_dir):
    """Winnowing (rolling-hash) document fingerprints, value-checked:
    k=3 word-grams, window 4 — the oracle replays gram hashing, the
    sliding window minima and the distinct selection in SQL."""
    from kbspark.corpus import words_from_documents
    from kbspark.textops import winnowing_fingerprints

    return winnowing_fingerprints(
        spark.table("documents"), k=3, window=4,
        words=words_from_documents(spark, sf_dir),
    )


@register(
    "t_ngram_jaccard_pairs",
    oracle="""
    WITH w AS (
      SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text), '\\s+') AS words
      FROM documents
    ),
    sh AS (
      SELECT doc_id,
             LIST_DISTINCT(LIST_TRANSFORM(RANGE(0, LEN(words) - 2),
               k -> ARRAY_TO_STRING(words[k+1:k+3], ' '))) AS s
      FROM w WHERE LEN(words) >= 3
    ),
    posts AS (SELECT doc_id, UNNEST(s) AS shingle FROM sh),
    -- plain branch: |intersection| via the inverted index instead of an
    -- all-pairs LIST_INTERSECT cross join. EXACT, not a restriction: a
    -- pair sharing zero shingles has Jaccard 0 and can never reach the
    -- 0.5 threshold, and for every other pair COUNT(*) over the shared
    -- shingles IS the intersection size. The r04 all-pairs formulation
    -- made the sf0.1 full-contract run intractable (~11 min in this one
    -- oracle — VERDICT r04 #1 budget note); this computes the identical
    -- row set in seconds at both scales.
    pairs AS (
      SELECT i.doc_a, i.doc_b, i.inter,
             sa.sz AS sza, sb.sz AS szb
      FROM (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
        FROM posts a JOIN posts b USING (shingle)
        WHERE a.doc_id < b.doc_id
        GROUP BY 1, 2
      ) i
      JOIN (SELECT doc_id, LEN(s) AS sz FROM sh) sa ON sa.doc_id = i.doc_a
      JOIN (SELECT doc_id, LEN(s) AS sz FROM sh) sb ON sb.doc_id = i.doc_b
    ),
    -- capped replay: posting-list intersection with stop-shingles
    -- (document frequency > 2) dropped BEFORE the join, sizes from the
    -- FULL shingle sets — models textops' max_postings exactly (shared
    -- count becomes a lower bound, never a false positive)
    keepers AS (
      SELECT shingle FROM posts GROUP BY shingle HAVING COUNT(*) <= 3
    ),
    inter_c AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
      FROM posts a
      JOIN keepers USING (shingle)
      JOIN posts b USING (shingle)
      WHERE a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    sz AS (SELECT doc_id, LEN(s) AS sz FROM sh),
    jac_c AS (
      SELECT i.doc_a, i.doc_b,
             ROUND(i.inter::DOUBLE / (sa.sz + sb.sz - i.inter), 6)
               AS jaccard
      FROM inter_c i
      JOIN sz sa ON sa.doc_id = i.doc_a
      JOIN sz sb ON sb.doc_id = i.doc_b
    )
    SELECT 'plain' AS op, doc_a, doc_b,
           ROUND(inter::DOUBLE / (sza + szb - inter), 6) AS jaccard,
           CAST(NULL AS BIGINT) AS n_dropped
    FROM pairs
    WHERE ROUND(inter::DOUBLE / (sza + szb - inter), 6) >= 0.5
    UNION ALL
    SELECT 'capped' AS op, doc_a, doc_b, jaccard,
           CAST(NULL AS BIGINT) AS n_dropped
    FROM jac_c WHERE jaccard >= 0.5
    UNION ALL
    SELECT 'dropped' AS op, CAST(NULL AS BIGINT) AS doc_a,
           CAST(NULL AS BIGINT) AS doc_b, CAST(NULL AS DOUBLE) AS jaccard,
           CAST((SELECT COALESCE(SUM(n), 0) FROM (
              SELECT COUNT(*) AS n FROM posts GROUP BY shingle
              HAVING COUNT(*) > 3)) AS BIGINT) AS n_dropped
    """,
)
def t_ngram_jaccard_pairs(spark, sf_dir):
    """Exact n-gram Jaccard near-duplicate pairs via a posting-list
    (inverted-index) join — the third dedup family next to MinHash-LSH
    and SimHash; the oracle computes the same Jaccard all-pairs.

    Compound entry (VERDICT r03 #3, completing the trilogy with t_lsh
    and t_simhash): 'capped' rows rerun with ``max_postings=3`` — real
    sf0.01 stop-shingles reach df 7, and 4 of the 25 plain pairs lose
    enough shared shingles to fall below threshold — and the 'dropped' row carries that count, so the
    stop-shingle drop logic (shared count as a lower bound) is
    hash-verified where it fires."""
    from kbspark.corpus import words_from_documents
    from kbspark.session import persist_tracked
    from kbspark.textops import ngram_jaccard_pairs, shingles_from_words

    words = words_from_documents(spark, sf_dir)
    sh = persist_tracked(shingles_from_words(words, n=3))
    plain = ngram_jaccard_pairs(None, n=3, threshold=0.5, shingles_df=sh)
    capped = ngram_jaccard_pairs(
        None, n=3, threshold=0.5, max_postings=3, shingles_df=sh
    )
    dropped = (
        sh.select(F.explode("shingles").alias("shingle"))
        .groupBy("shingle")
        .agg(F.count("*").alias("_df"))
        .filter(F.col("_df") > 3)
        .agg(F.coalesce(F.sum("_df"), F.lit(0)).alias("n_dropped"))
        .select(
            F.lit("dropped").alias("op"),
            F.lit(None).cast("long").alias("doc_a"),
            F.lit(None).cast("long").alias("doc_b"),
            F.lit(None).cast("double").alias("jaccard"),
            F.col("n_dropped").cast("long"),
        )
    )
    tag = lambda df, op: df.select(  # noqa: E731
        F.lit(op).alias("op"), "doc_a", "doc_b", "jaccard",
        F.lit(None).cast("long").alias("n_dropped"),
    )
    return tag(plain, "plain").unionByName(tag(capped, "capped")).unionByName(
        dropped
    )


# ---------------------------------------------------------------------------
# Embedding similarity search
# ---------------------------------------------------------------------------


@register(
    "e_cosine_near_dup_pairs",
    oracle="""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           ROUND(LIST_DOT_PRODUCT(a.emb, b.emb) /
                 (SQRT(LIST_DOT_PRODUCT(a.emb, a.emb)) *
                  SQRT(LIST_DOT_PRODUCT(b.emb, b.emb))), 4) AS cosine
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE LIST_DOT_PRODUCT(a.emb, b.emb) /
          (SQRT(LIST_DOT_PRODUCT(a.emb, a.emb)) *
           SQRT(LIST_DOT_PRODUCT(b.emb, b.emb))) >= 0.35
    """,
)
def e_cosine_near_dup_pairs(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs (dedup family): exact
    all-pairs at oracle scale; the LSH-bucketed scale path is s_knn_lsh /
    kbspark.simsearch. JVM-side dot products via zip_with/aggregate."""
    from kbspark.simsearch import _as_double, _dot, _norm

    e = spark.table("embeddings").select(
        "vec_id", _as_double(F.col("embedding")).alias("emb")
    )
    a = e.select(F.col("vec_id").alias("vec_a"), F.col("emb").alias("ea"))
    b = e.select(F.col("vec_id").alias("vec_b"), F.col("emb").alias("eb"))
    cos = _dot(F.col("ea"), F.col("eb")) / (
        _norm(F.col("ea")) * _norm(F.col("eb"))
    )
    return (
        a.join(F.broadcast(b), F.col("vec_a") < F.col("vec_b"))
        .withColumn("cos", cos)
        .filter(F.col("cos") >= 0.35)
        .select("vec_a", "vec_b", F.round("cos", 4).alias("cosine"))
    )


@register(
    "s_knn_bruteforce",
    oracle="""
    WITH q AS (
      SELECT vec_id AS query_id, embedding::DOUBLE[] AS emb
      FROM embeddings WHERE vec_id < 10
    ),
    scored AS (
      SELECT q.query_id, e.vec_id AS neighbor_id,
             LIST_DOT_PRODUCT(q.emb, e.embedding::DOUBLE[]) /
             (SQRT(LIST_DOT_PRODUCT(q.emb, q.emb)) *
              SQRT(LIST_DOT_PRODUCT(e.embedding::DOUBLE[],
                                    e.embedding::DOUBLE[]))) AS cos
      FROM q JOIN embeddings e ON e.vec_id <> q.query_id
    )
    SELECT query_id, neighbor_id, ROUND(cos, 4) AS cosine FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rn
      FROM scored
    ) WHERE rn <= 5
    """,
)
def s_knn_bruteforce(spark, sf_dir):
    """Brute-force cosine top-k: broadcast the query set against the
    corpus, JVM-side float math (zip_with/aggregate), deterministic
    tiebreak. The baseline ANN path."""
    from kbspark.simsearch import knn_bruteforce

    emb = spark.table("embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return knn_bruteforce(queries, emb, k=5, round_to=4)
