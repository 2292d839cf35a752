"""Graph-closure and KG-pipeline contract queries.

The kg_* queries run the REAL extraction pipeline (E1 clean_text →
E2 mention extraction → broadcast dictionary resolution → triple
materialization) over pages derived deterministically from
documents.parquet. Their oracles do not re-implement the regex pipeline —
they invert the deterministic markup generator in SQL, so any divergence
in the extraction path (cleaning, link parsing, redirect hop, QID
assignment, dedup counting) surfaces as a value-hash mismatch.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kbspark.contract import register


@register(
    "a1_graph_closure",
    oracle="""
    WITH RECURSIVE edges AS (
      SELECT DISTINCT l_suppkey % 40 AS src, l_partkey % 40 AS dst FROM lineitem
    ),
    r(node) AS (
      SELECT CAST(0 AS BIGINT) AS node
      UNION
      SELECT e.dst FROM r JOIN edges e ON e.src = r.node
    )
    SELECT node FROM r
    """,
)
def a1_graph_closure(spark, sf_dir):
    """A1: transitive closure via iterative DataFrame BFS (the reference's
    recursive category descent, wikipedia/entities.py:9-48); oracle is a
    recursive CTE. The derived edge graph contains cycles — exercises the
    visited-set guard."""
    import pandas as pd

    from kbspark.closure import reachable

    edges = (
        spark.table("lineitem")
        .select(
            (F.col("l_suppkey") % 40).alias("src"),
            (F.col("l_partkey") % 40).alias("dst"),
        )
        .distinct()
    )
    roots = spark.createDataFrame(pd.DataFrame({"node": [0]}))
    return reachable(edges, roots).select(F.col("node").cast("bigint").alias("node"))


@register(
    "a1b_category_entities",
    oracle="""
    WITH RECURSIVE cedges AS (
      SELECT 'Cat_' || CAST(k // 3 AS VARCHAR) AS parent,
             'Cat_' || CAST(k AS VARCHAR) AS child
      FROM (SELECT UNNEST(RANGE(1, 40)) AS k) t
      UNION ALL
      SELECT * FROM (VALUES ('Cat_21', 'Cat_24'), ('Cat_18', 'Cat_26'),
                            ('Cat_27', 'Cat_22')) v(parent, child)
    ),
    roots AS (
      SELECT * FROM (VALUES ('Cat_5', 'PER'), ('Cat_6', 'PER'),
                            ('Cat_7', 'LOC'), ('Cat_8', 'ORG'),
                            ('Cat_9', 'NOTION')) r(root, typ)
    ),
    rr(root, node) AS (
      SELECT root, root FROM roots
      UNION
      SELECT rr.root, e.child FROM rr JOIN cedges e ON e.parent = rr.node
    ),
    members AS (
      SELECT DISTINCT rr.root, c.c_custkey AS page_id,
             'Art_' || CAST(c.c_custkey AS VARCHAR) AS page_title
      FROM rr JOIN customer c
        ON 'Cat_' || CAST(c.c_custkey % 40 AS VARCHAR) = rr.node
      WHERE c.c_custkey % 10 <> 0
    ),
    typed AS (
      SELECT m.page_id, m.page_title, r.typ
      FROM members m JOIN roots r USING (root)
    ),
    per AS (SELECT DISTINCT page_id, page_title FROM typed WHERE typ = 'PER'),
    loc0 AS (SELECT DISTINCT page_id, page_title FROM typed WHERE typ = 'LOC'),
    org0 AS (SELECT DISTINCT page_id, page_title FROM typed WHERE typ = 'ORG'),
    notion AS (
      SELECT DISTINCT page_id, page_title FROM typed WHERE typ = 'NOTION'
    ),
    org AS (
      SELECT * FROM org0
      WHERE page_id NOT IN (SELECT page_id FROM per)
        AND page_id NOT IN (SELECT page_id FROM loc0)
    ),
    loc AS (
      SELECT * FROM loc0
      WHERE page_id NOT IN (SELECT page_id FROM per)
        AND page_id NOT IN (SELECT page_id FROM notion)
    )
    SELECT page_title, 'PER' AS TYPE FROM per
    UNION ALL SELECT page_title, 'LOC' AS TYPE FROM loc
    UNION ALL SELECT page_title, 'ORG' AS TYPE FROM org
    """,
)
def a1b_category_entities(spark, sf_dir):
    """The reference's composed extract job (entities.py:196-247) over a
    derived category graph: a Cat_k//3 tree + three cross edges creating
    per∩org, loc∩org and loc∩notion overlaps, customers as member pages
    (Liste_ titles for custkey%10=0 exercise the P2 drop). The oracle
    replays the closure (recursive CTE) and the type-priority anti-joins.
    Parity with the reference function itself (exec'd from source over
    SQLite) is asserted in tests/test_category_pages.py."""
    import pandas as pd

    from kbspark.closure import category_entities

    tree = spark.range(1, 40).select(
        F.concat(F.lit("Cat_"), F.floor(F.col("id") / 3).cast("string")).alias(
            "cl_to"
        ),
        (F.lit(1000) + F.col("id")).alias("cl_from"),
        F.concat(F.lit("Cat_"), F.col("id").cast("string")).alias("page_title"),
    )
    cross = spark.createDataFrame(
        pd.DataFrame(
            {
                "cl_to": ["Cat_21", "Cat_18", "Cat_27"],
                "cl_from": [1024, 1026, 1022],
                "page_title": ["Cat_24", "Cat_26", "Cat_22"],
            }
        )
    )
    membership = spark.table("customer").select(
        F.concat(F.lit("Cat_"), (F.col("c_custkey") % 40).cast("string")).alias(
            "cl_to"
        ),
        F.col("c_custkey").cast("long").alias("cl_from"),
        F.lit(None).cast("string").alias("page_title"),
    )
    edges = tree.unionByName(cross).unionByName(membership)

    cat_pages = spark.range(0, 40).select(
        (F.lit(1000) + F.col("id")).alias("page_id"),
        F.concat(F.lit("Cat_"), F.col("id").cast("string")).alias("page_title"),
        F.lit(14).alias("page_namespace"),
    )
    articles = spark.table("customer").select(
        F.col("c_custkey").cast("long").alias("page_id"),
        F.when(
            F.col("c_custkey") % 10 == 0,
            F.concat(F.lit("Liste_"), F.col("c_custkey").cast("string")),
        )
        .otherwise(F.concat(F.lit("Art_"), F.col("c_custkey").cast("string")))
        .alias("page_title"),
        F.lit(0).alias("page_namespace"),
    )
    pages = cat_pages.unionByName(articles)

    return category_entities(
        pages,
        edges,
        type_roots={"PER": ("Cat_5", "Cat_6"), "LOC": ("Cat_7",),
                    "ORG": ("Cat_8",)},
        notion_root="Cat_9",
    )


_ORACLE_MENTION_BASE = """
    WITH w AS (
      SELECT doc_id, LIST_FILTER(STRING_SPLIT_REGEX(text, '\\s+'), t -> t <> '') AS words FROM documents
    ),
    pos AS (
      SELECT doc_id, UNNEST(words) AS tok, UNNEST(RANGE(0, LEN(words))) AS i FROM w
    ),
    men AS (
      SELECT doc_id, UPPER(tok[1]) || LOWER(tok[2:]) AS page_title
      FROM pos
      WHERE LENGTH(tok) >= 4
        AND (doc_id * 1000003 + i * 101) % 17 IN (0, 1, 2)
    )
"""


@register(
    "kg_mentions",
    oracle=_ORACLE_MENTION_BASE
    + """
    SELECT page_title, COUNT(*) AS n_mentions
    FROM men GROUP BY page_title
    """,
)
def kg_mentions(spark, sf_dir):
    """End-to-end extraction check: documents → markup pages → E1+E2+J5
    pipeline → per-entity mention counts. The oracle inverts the
    deterministic markup generator instead of re-running the pipeline."""
    from kbspark.corpus import dims_from_documents, pages_from_documents
    from kbspark.extract import mention_stage

    pages = pages_from_documents(spark, sf_dir)
    entity_types, redirect_targets = dims_from_documents(spark, sf_dir)
    mentions = mention_stage(pages, spark, entity_types, redirect_targets)
    return (
        mentions.filter(F.col("entity_type") != "O")
        .groupBy("page_title")
        .agg(F.count("*").alias("n_mentions"))
    )


_KG_TRIPLES_ORACLE = (
    _ORACLE_MENTION_BASE
    + """,
    dict AS (
      SELECT DISTINCT UPPER(tok[1]) || LOWER(tok[2:]) AS title
      FROM pos WHERE LENGTH(tok) >= 4
    ),
    qids AS (
      SELECT title,
             'Q' || CAST(CAST(CONCAT('0x', SUBSTR(MD5(title), 1, 6)) AS BIGINT)
                         AS VARCHAR) AS qid,
             CASE LIST_SUM(LIST_TRANSFORM(RANGE(1, LENGTH(title) + 1),
                                          i -> ORD(title[i]))) % 3
               WHEN 0 THEN 'PER' WHEN 1 THEN 'LOC' ELSE 'ORG' END AS typ
      FROM dict
    ),
    mention_triples AS (
      SELECT 'https://crawl.example/doc/' || CAST(m.doc_id AS VARCHAR) AS subj,
             'mentions' AS pred, q.qid AS obj, COUNT(*) AS n_occurrences
      FROM men m JOIN qids q ON q.title = m.page_title
      GROUP BY 1, 2, 3
    ),
    entity_triples AS (
      SELECT qid AS subj, 'instance_of' AS pred, typ AS obj,
             CAST(1 AS BIGINT) AS n_occurrences
      FROM qids
    ),
    redirect_triples AS (
      SELECT title || '_redir' AS subj, 'redirects_to' AS pred, title AS obj,
             CAST(1 AS BIGINT) AS n_occurrences
      FROM dict
    )
    SELECT subj, pred, obj, n_occurrences FROM mention_triples
    UNION ALL SELECT * FROM entity_triples
    UNION ALL SELECT * FROM redirect_triples
    """
)


@register("kg_triples", oracle=_KG_TRIPLES_ORACLE)
def kg_triples(spark, sf_dir):
    """The flagship itself, oracle-checked: full triple materialization
    (mentions/instance_of/redirects_to families) over the derived corpus."""
    from kbspark.jobs import flagship_triples

    return flagship_triples(spark, sf_dir).select(
        "subj", "pred", "obj", "n_occurrences"
    )


@register("kg_triples_dimframes", oracle=_KG_TRIPLES_ORACLE)
def kg_triples_dimframes(spark, sf_dir):
    """The flagship forced onto its 100-TB dim path (dim_collect_cap=1
    => DataFrame dims, relational J5 via resolve_mentions_frames, no
    driver collect) — hash-checked against the SAME oracle as
    kg_triples, so the driver records scale-path ≡ dict-path
    equivalence, not just pytest."""
    from kbspark.jobs import flagship_triples

    return flagship_triples(spark, sf_dir, dim_collect_cap=1).select(
        "subj", "pred", "obj", "n_occurrences"
    )


@register(
    "kg_tagged_stats",
    oracle="""
    WITH w AS (
      SELECT doc_id, LIST_FILTER(STRING_SPLIT_REGEX(text, '\\s+'), t -> t <> '') AS words
      FROM documents
    ),
    pos AS (
      SELECT doc_id, UNNEST(words) AS tok, UNNEST(RANGE(0, LEN(words))) AS i
      FROM w
    ),
    feat AS (
      -- generator-inverse of _doc_to_markup + clean_text + tokenizer:
      -- h in (3,4) => markup stripped to nothing (0 tokens), every other
      -- branch yields exactly one token for the [a-z]+ corpus vocabulary;
      -- the injected '.' after word i is its own token and a terminal
      SELECT doc_id, i,
        CASE WHEN (doc_id * 1000003 + i * 101) % 17 IN (3, 4)
             THEN 0 ELSE 1 END AS c,
        CASE WHEN (i * 7 + doc_id) % 23 = 0 THEN 1 ELSE 0 END AS p
      FROM pos
    ),
    agg AS (
      SELECT doc_id,
             SUM(c) + SUM(p) AS n_tokens,
             SUM(p) AS n_periods,
             MAX(CASE WHEN p = 1 THEN i END) AS lastp,
             MAX(CASE WHEN c = 1 THEN i END) AS lastc
      FROM feat GROUP BY doc_id
    )
    SELECT 'https://crawl.example/doc/' || CAST(doc_id AS VARCHAR) AS url,
           CAST(CASE WHEN n_periods = 0
                     THEN CASE WHEN n_tokens > 0 THEN 1 ELSE 0 END
                     ELSE n_periods
                          + CASE WHEN lastc > lastp THEN 1 ELSE 0 END
                END AS INT) AS n_sentences,
           CAST(n_tokens AS INT) AS n_tokens
    FROM agg
    """,
)
def kg_tagged_stats(spark, sf_dir):
    """The annotate stage (E1→E6) value-checked end-to-end: per-page
    sentence/token counts from the tagged table with typed nested arrays.
    The oracle inverts the deterministic markup generator + regex
    tokenizer/sentence-splitter in SQL (every corpus word is [a-z]+, so
    per-branch token counts are exact) — a regression anywhere in
    clean_text, link splitting, tokenization, sentence splitting or
    packing shifts the counts and breaks the hash."""
    from kbspark.jobs import tagged_table

    tagged = tagged_table(spark, sf_dir)
    return tagged.select(
        "url",
        F.size("text").alias("n_sentences"),
        F.aggregate(
            F.transform(F.col("text"), lambda s: F.size(s)),
            F.lit(0),
            lambda acc, x: acc + x,
        ).alias("n_tokens"),
    )


@register(
    "kg_el_quality",
    oracle=_ORACLE_MENTION_BASE
    + """
    SELECT COUNT(*) AS n_mentions, COUNT(*) AS n_correct,
           COUNT(*) AS n_predicted, COUNT(*) AS n_labeled,
           CAST(1.0 AS DOUBLE) AS precision, CAST(1.0 AS DOUBLE) AS recall
    FROM men
    """,
)
def kg_el_quality(spark, sf_dir):
    """Full native entity-linking pipeline (tagged → spans → anchor-mined
    alias dict → scored ranking), measured as rank-1 P/R against the
    corpus self-labels. On the derived corpus every mention is uniquely
    linkable, so the oracle (generator-inverse) predicts exact counts and
    P = R = 1.0 — any regression anywhere in the E1→E10 chain (cleaning,
    tokenization, BIO tags, span grouping, alias mining, scoring) breaks
    the match."""
    from kbspark.jobs import linking_quality_job

    return linking_quality_job(spark, sf_dir)


_EL_FULL_ORACLE = """
    WITH w AS (
      SELECT doc_id, LIST_FILTER(STRING_SPLIT_REGEX(text, '\\s+'), t -> t <> '') AS words
      FROM documents
    ),
    pos AS (
      SELECT doc_id, UNNEST(words) AS tok, UNNEST(RANGE(0, LEN(words))) AS i
      FROM w
    ),
    feat AS (
      SELECT doc_id, tok, i, (doc_id * 1000003 + i * 101) % 17 AS h,
             UPPER(tok[1]) || LOWER(tok[2:]) AS cap,
             CASE WHEN (doc_id * 1000003 + i * 101) % 17 IN (3, 4)
                  THEN 0 ELSE 1 END AS c,
             CASE WHEN (i * 7 + doc_id) % 23 = 0 THEN 1 ELSE 0 END AS p
      FROM pos
    ),
    -- sentence index of word i = periods injected strictly before i
    -- (the splitter ends a sentence AFTER its period token)
    fs AS (
      SELECT *, COALESCE(SUM(p) OVER (PARTITION BY doc_id ORDER BY i
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS sent
      FROM feat
    ),
    stok AS (  -- lowercase token multiset of each sentence
      SELECT doc_id, sent, tok FROM fs WHERE c = 1
      UNION ALL
      SELECT doc_id, sent, '.' AS tok FROM fs WHERE p = 1
    ),
    cterms AS (SELECT DISTINCT doc_id, sent, tok FROM stok),
    ctxn AS (
      SELECT doc_id, sent, COUNT(*) AS cn FROM cterms GROUP BY 1, 2
    ),
    men AS (
      SELECT doc_id, i, sent, cap AS gt,
             CASE WHEN h = 0 THEN cap ELSE tok END AS surface,
             CASE LIST_SUM(LIST_TRANSFORM(RANGE(1, LENGTH(cap) + 1),
                                          j -> ORD(cap[j]))) % 3
               WHEN 0 THEN 'PER' WHEN 1 THEN 'LOC' ELSE 'ORG' END AS typ,
             ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i) - 1
               AS ordinal
      FROM fs WHERE h IN (0, 1, 2) AND LENGTH(tok) >= 4
    ),
    -- per-entity context profile: a term is counted once per MENTION
    -- whose sentence contains it (distinct-per-sentence), length > 1,
    -- top-50 by (count desc, term asc) — entity_context_profiles replay
    pterms AS (
      SELECT m.gt, t.tok AS term, COUNT(*) AS n
      FROM men m JOIN cterms t USING (doc_id, sent)
      WHERE LENGTH(t.tok) > 1
      GROUP BY 1, 2
    ),
    prof AS (
      SELECT gt, term FROM pterms
      QUALIFY ROW_NUMBER() OVER (PARTITION BY gt
        ORDER BY n DESC, term ASC) <= 50
    ),
    profn AS (SELECT gt, COUNT(*) AS pn FROM prof GROUP BY 1),
    inter AS (
      SELECT m.doc_id, m.i, COUNT(*) AS icnt
      FROM men m
      JOIN cterms t USING (doc_id, sent)
      JOIN prof p ON p.gt = m.gt AND p.term = t.tok
      GROUP BY 1, 2
    )
    -- blended score: apriori P(target|surface) is exactly 1.0 on the
    -- derived corpus (unique target per surface), so
    -- proba = round(0.5 + 0.5 * overlap / max(1, min(|ctx|, |prof|)), 6)
    SELECT m.surface || '-' || m.typ || '-' || CAST(m.ordinal AS VARCHAR)
             AS entity_id,
           m.gt AS page_title,
           'Q' || CAST(CAST(CONCAT('0x', SUBSTR(MD5(m.gt), 1, 6)) AS BIGINT)
                       AS VARCHAR) AS wikidata,
           ROUND(0.5 + 0.5 * COALESCE(i2.icnt, 0)
                 / GREATEST(LEAST(c2.cn, COALESCE(p2.pn, 0)), 1), 6)
             AS proba,
           'https://crawl.example/doc/' || CAST(m.doc_id AS VARCHAR)
             AS on_page_id,
           'https://crawl.example/doc/' || CAST(m.doc_id AS VARCHAR)
             AS on_page,
           m.gt AS gt,
           CAST(1 AS INT) AS rank
    FROM men m
    JOIN ctxn c2 ON c2.doc_id = m.doc_id AND c2.sent = m.sent
    LEFT JOIN profn p2 ON p2.gt = m.gt
    LEFT JOIN inter i2 ON i2.doc_id = m.doc_id AND i2.i = m.i
"""


@register("kg_entity_linking", oracle=_EL_FULL_ORACLE)
def kg_entity_linking(spark, sf_dir):
    """The EL output table itself, reference-shaped (entity_id,
    page_title, wikidata, proba, on_page_id, on_page, gt, rank —
    ned.py:32-34 plus rank), value-hash-checked INCLUDING the blended
    float score: the oracle reconstructs every mention's sentence, the
    per-entity context profiles (count-once-per-mention, top-50) and the
    overlap-coefficient scoring from the corpus generator, so the whole
    E1→E10 chain is verified down to the ranking score."""
    from kbspark.jobs import entity_linking_job

    return entity_linking_job(spark, sf_dir)


@register(
    "t_simhash_near_dups",
    oracle="""
    WITH tok AS (
      SELECT doc_id, w, COUNT(*) AS n FROM (
        SELECT doc_id, UNNEST(STRING_SPLIT_REGEX(TRIM(text), '\\s+')) AS w
        FROM documents) t
      GROUP BY doc_id, w
    ),
    h AS (SELECT doc_id, n, MD5(w) AS hex FROM tok),
    votes AS (
      SELECT h.doc_id, bb.b AS bit,
             SUM(CASE WHEN ((CAST(CONCAT('0x', SUBSTR(h.hex, bb.b // 4 + 1, 1))
                             AS INTEGER) >> (bb.b % 4)) & 1) = 1
                      THEN h.n ELSE -h.n END) AS v
      FROM h, (SELECT UNNEST(RANGE(0, 64)) AS b) bb
      GROUP BY 1, 2
    ),
    sig AS (
      SELECT doc_id,
             STRING_AGG(CASE WHEN v > 0 THEN '1' ELSE '0' END, ''
                        ORDER BY bit) AS s
      FROM votes GROUP BY doc_id
    ),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(LIST_SUM(LIST_TRANSFORM(RANGE(1, 65), i ->
               CASE WHEN SUBSTR(a.s, CAST(i AS INT), 1)
                      <> SUBSTR(b.s, CAST(i AS INT), 1)
                    THEN 1 ELSE 0 END)) AS INT) AS hamming
      FROM sig a JOIN sig b ON a.doc_id < b.doc_id
    ),
    -- capped replay: 8-bit substring buckets (bijective with the
    -- engine's integer block keys), over-cap buckets dropped BEFORE the
    -- candidate join — models textops' max_bucket exactly
    blk AS (
      SELECT doc_id, bb.i AS block_id, SUBSTR(s, bb.i * 8 + 1, 8) AS key
      FROM sig, (SELECT UNNEST(RANGE(0, 8)) AS i) bb
    ),
    bcnt AS (
      SELECT block_id, key, COUNT(*) AS n FROM blk GROUP BY 1, 2
    ),
    blk_c AS (
      SELECT b.doc_id, b.block_id, b.key
      FROM blk b JOIN bcnt USING (block_id, key)
      WHERE bcnt.n <= 10
    ),
    cand_c AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM blk_c a JOIN blk_c b
        ON a.block_id = b.block_id AND a.key = b.key
       AND a.doc_id < b.doc_id
    ),
    pairs_c AS (
      SELECT c.doc_a, c.doc_b, p.hamming
      FROM cand_c c JOIN pairs p
        ON p.doc_a = c.doc_a AND p.doc_b = c.doc_b
    )
    SELECT 'plain' AS op, doc_a, doc_b, hamming,
           CAST(NULL AS BIGINT) AS n_dropped
    FROM pairs WHERE hamming <= 7
    UNION ALL
    SELECT 'capped' AS op, doc_a, doc_b, hamming,
           CAST(NULL AS BIGINT) AS n_dropped
    FROM pairs_c WHERE hamming <= 7
    UNION ALL
    SELECT 'dropped' AS op, CAST(NULL AS BIGINT) AS doc_a,
           CAST(NULL AS BIGINT) AS doc_b, CAST(NULL AS INT) AS hamming,
           CAST((SELECT COALESCE(SUM(n), 0) FROM bcnt WHERE n > 10)
                AS BIGINT) AS n_dropped
    """,
)
def t_simhash_near_dups(spark, sf_dir):
    """SimHash near-duplicate pairs, value-hash-checked: md5-derived
    64-bit signatures, 8-bit block LSH (8 blocks => pigeonhole-EXACT for
    Hamming <= 7), exact Hamming verification. The oracle recomputes the
    whole signature pipeline brute-force (all pairs) in SQL — any
    divergence in tokenization, voting, bit packing, blocking or
    verification breaks the hash match.

    Compound entry (VERDICT r03 #3, same shape as t_lsh): 'capped' rows
    rerun the blocking with ``max_bucket=10`` — real sf0.01 buckets
    reach 128 members, so 2,503 postings across 101 buckets drop — and
    the 'dropped' row carries that count, so the degenerate-bucket
    logic of the SECOND dedup family is also hash-verified where it
    fires. One shared signature build serves all branches. At web scale
    the engine runs n_blocks=4 (16-bit keys)."""
    from kbspark.corpus import words_from_documents
    from kbspark.session import persist_tracked
    from kbspark.textops import (
        simhash64,
        simhash_block_table,
        simhash_near_dups,
    )

    words = words_from_documents(spark, sf_dir)
    sig = persist_tracked(simhash64(spark.table("documents"), words=words))
    blocks = persist_tracked(simhash_block_table(sig, n_blocks=8))
    plain = simhash_near_dups(None, max_hamming=7, n_blocks=8,
                              sig=sig, blocks=blocks)
    capped = simhash_near_dups(None, max_hamming=7, n_blocks=8,
                               max_bucket=10, sig=sig, blocks=blocks)
    dropped = (
        blocks.groupBy("block_id", "block_key")
        .agg(F.count("*").alias("_bn"))
        .filter(F.col("_bn") > 10)
        .agg(F.coalesce(F.sum("_bn"), F.lit(0)).alias("n_dropped"))
        .select(
            F.lit("dropped").alias("op"),
            F.lit(None).cast("long").alias("doc_a"),
            F.lit(None).cast("long").alias("doc_b"),
            F.lit(None).cast("int").alias("hamming"),
            F.col("n_dropped").cast("long"),
        )
    )
    tag = lambda df, op: df.select(  # noqa: E731
        F.lit(op).alias("op"), "doc_a", "doc_b", "hamming",
        F.lit(None).cast("long").alias("n_dropped"),
    )
    return tag(plain, "plain").unionByName(tag(capped, "capped")).unionByName(
        dropped
    )


_MARKUP_CTE = """
    WITH w AS (
      SELECT doc_id, LIST_FILTER(STRING_SPLIT_REGEX(text, '\\s+'), t -> t <> '') AS words
      FROM documents
    ),
    pieces AS (
      SELECT doc_id, i,
        CASE
          WHEN h = 0 AND LENGTH(tok) >= 4 THEN '[[' || cap || ']]'
          WHEN h = 1 AND LENGTH(tok) >= 4 THEN '[[' || cap || '|' || tok || ']]'
          WHEN h = 2 AND LENGTH(tok) >= 4
            THEN '[[' || cap || '_redir|' || tok || ']]'
          WHEN h = 3 THEN '{{cite|' || tok || '}}'
          WHEN h = 4 THEN '<ref>' || tok || '</ref>'
          ELSE tok
        END || CASE WHEN (i * 7 + doc_id) % 23 = 0 THEN ' .' ELSE '' END
          AS piece
      FROM (
        SELECT doc_id, tok, i, (doc_id * 1000003 + i * 101) % 17 AS h,
               UPPER(tok[1]) || LOWER(tok[2:]) AS cap
        FROM (
          SELECT doc_id, UNNEST(words) AS tok,
                 UNNEST(RANGE(0, LEN(words))) AS i
          FROM w
        ) t
      ) t2
    ),
    marked AS (
      SELECT doc_id,
             STRING_AGG(piece, ' ' ORDER BY i)
               || ' == Literatur == trailing' AS markup
      FROM pieces GROUP BY doc_id
    )
"""


_FEATURE_LANES = ",\n".join(
    "           ROUND(CAST(CONCAT('0x', SUBSTR(SHA256(markup), "
    f"{4 * i + 1}, 4)) AS BIGINT) / 65536.0, 6) AS f{i:02d}"
    for i in range(16)
)


@register(
    "m_media_features",
    oracle=_MARKUP_CTE
    + f"""
    SELECT 'https://crawl.example/doc/' || CAST(doc_id AS VARCHAR) AS url,
           'text/html' AS media_type,
           CAST(OCTET_LENGTH(ENCODE(markup)) AS INT) AS n_bytes,
           LOWER(SHA256(markup)) AS content_hash,
{_FEATURE_LANES}
    FROM marked
    """,
)
def m_media_features(spark, sf_dir):
    """Multimodal decode + feature-extract stage, value-hash-checked
    end-to-end: metadata plus the 16 decoded feature lanes over the
    pages' html payloads (decode = deterministic sha256-derived fake;
    real codecs stubbed behind the decoder seam, kbspark/media.py). The
    oracle rebuilds the payload markup in SQL and recomputes every lane
    from SHA256 hex substrings — lane values are k/2^16 so float32 ==
    double exactly. Lanes are emitted as scalar columns (f00..f15)
    rather than an array so the driver's pandas canonicalizer can sort
    and hash them (CLAUDE.md checker pitfalls)."""
    from kbspark.corpus import pages_from_documents
    from kbspark.media import media_features

    pages = pages_from_documents(spark, sf_dir)
    feats = media_features(pages)
    lanes = [
        F.round(F.col("feature")[i].cast("double"), 6).alias(f"f{i:02d}")
        for i in range(16)
    ]
    return feats.select("url", "media_type", "n_bytes", "content_hash", *lanes)


@register(
    "m_media_stages",
    oracle=_MARKUP_CTE
    + """
    SELECT 'https://crawl.example/doc/' || CAST(doc_id AS VARCHAR) AS url,
           'text/html' AS media_type,
           CAST(OCTET_LENGTH(ENCODE(markup)) AS INT) AS n_bytes,
           LOWER(SHA256(markup)) AS content_hash,
           CAST(OCTET_LENGTH(ENCODE(markup)) AS INT) AS n_bytes_in,
           CAST(256 AS INT) AS n_bytes_out,
           HEX(REPEAT(UNHEX(SHA256(markup)), 8)) AS resized_hex
    FROM marked
    """,
)
def m_media_stages(spark, sf_dir):
    """Metadata + resize/transcode media stages in one driver entry
    (merged r02's m_media_metadata + m_resize — the driver records at
    most ~50 entries, so near-duplicate entries are compounded; each
    stage's columns stay distinguishable in the value hash):

    - metadata: payload byte length + sha256 content hash of every
      page's html payload (Arrow binary handling end-to-end);
    - resize: the deterministic fake transcode (sha256-digest repetition
      to the 256-byte target; a real image codec plugs in via the
      decoder seam) byte-parity-checked via hex.

    The oracle reconstructs the markup generator in SQL and recomputes
    hashes/bytes over identical payloads."""
    from kbspark.corpus import pages_from_documents
    from kbspark.media import media_metadata, resize

    pages = pages_from_documents(spark, sf_dir)
    meta = media_metadata(pages)
    rz = resize(pages, target_bytes=256).select(
        "url", "n_bytes_in", "n_bytes_out",
        F.hex("resized").alias("resized_hex"),
    )
    return meta.join(rz, "url")


# squared-distance ordering expression shared by the IVF oracle's
# assignment steps (numpy's expansion: x.x - 2 x.c + c.c; the x.x term is
# row-constant and cannot change the argmin)
_IVF_D2 = (
    "LIST_DOT_PRODUCT(e.emb, e.emb) - 2 * LIST_DOT_PRODUCT(e.emb, {cb}.c) "
    "+ LIST_DOT_PRODUCT({cb}.c, {cb}.c)"
)

_IVF_CTES = f"""
    WITH emb AS (
      SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
    ),
    seeds AS (
      -- codebook init: the 8 corpus vectors with the smallest
      -- md5(vec_id), cluster id = md5 rank (simsearch.train_ivf_centroids)
      SELECT ROW_NUMBER() OVER (ORDER BY MD5(CAST(vec_id AS VARCHAR))) - 1
               AS cluster,
             emb AS c
      FROM emb
      QUALIFY ROW_NUMBER() OVER (ORDER BY MD5(CAST(vec_id AS VARCHAR))) <= 8
    ),
    a1 AS (
      SELECT e.vec_id, e.emb, s.cluster FROM emb e, seeds s
      QUALIFY ROW_NUMBER() OVER (PARTITION BY e.vec_id
        ORDER BY {_IVF_D2.format(cb="s")} ASC, s.cluster ASC) = 1
    ),
    m1 AS (
      SELECT cluster, pos, AVG(x) AS m FROM (
        SELECT cluster, UNNEST(emb) AS x, UNNEST(RANGE(0, LEN(emb))) AS pos
        FROM a1) t GROUP BY 1, 2
    ),
    c1u AS (SELECT cluster, LIST(m ORDER BY pos) AS c FROM m1 GROUP BY cluster),
    c1 AS (
      SELECT s.cluster, COALESCE(u.c, s.c) AS c
      FROM seeds s LEFT JOIN c1u u USING (cluster)
    ),
    a2 AS (
      SELECT e.vec_id, e.emb, s.cluster FROM emb e, c1 s
      QUALIFY ROW_NUMBER() OVER (PARTITION BY e.vec_id
        ORDER BY {_IVF_D2.format(cb="s")} ASC, s.cluster ASC) = 1
    ),
    m2 AS (
      SELECT cluster, pos, AVG(x) AS m FROM (
        SELECT cluster, UNNEST(emb) AS x, UNNEST(RANGE(0, LEN(emb))) AS pos
        FROM a2) t GROUP BY 1, 2
    ),
    c2u AS (SELECT cluster, LIST(m ORDER BY pos) AS c FROM m2 GROUP BY cluster),
    c2 AS (
      SELECT p.cluster, COALESCE(u.c, p.c) AS c
      FROM c1 p LEFT JOIN c2u u USING (cluster)
    ),
    assign AS (
      SELECT e.vec_id, e.emb, s.cluster FROM emb e, c2 s
      QUALIFY ROW_NUMBER() OVER (PARTITION BY e.vec_id
        ORDER BY {_IVF_D2.format(cb="s")} ASC, s.cluster ASC) = 1
    )
"""

_IVF_ORACLE = _IVF_CTES + f""",
    probe AS (
      SELECT e.vec_id AS query_id, e.emb AS qe, s.cluster
      FROM emb e, c2 s WHERE e.vec_id < 10
      QUALIFY ROW_NUMBER() OVER (PARTITION BY e.vec_id
        ORDER BY {_IVF_D2.format(cb="s")} ASC, s.cluster ASC) <= 3
    ),
    scored AS (
      SELECT p.query_id, a.vec_id AS neighbor_id,
             LIST_DOT_PRODUCT(p.qe, a.emb) /
             (SQRT(LIST_DOT_PRODUCT(p.qe, p.qe)) *
              SQRT(LIST_DOT_PRODUCT(a.emb, a.emb))) AS cos
      FROM probe p JOIN assign a USING (cluster)
      WHERE a.vec_id <> p.query_id
    )
    SELECT query_id, neighbor_id, ROUND(cos, 4) AS cosine FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rn
      FROM scored
    ) WHERE rn <= 5
"""


@register(
    "g_stream_watermark",
    oracle="""
    WITH e AS (
      SELECT event_id, ts, event_type,
        CASE WHEN ts < TIMESTAMP '2024-01-11' THEN 0
             WHEN ts < TIMESTAMP '2024-01-21' THEN 1 ELSE 2 END AS base,
        CAST(CONCAT('0x', SUBSTR(MD5(CAST(event_id AS VARCHAR)), 1, 2))
             AS INT) % 10 = 0 AS straggler
      FROM events
    ),
    b AS (
      SELECT *, CASE WHEN straggler THEN 2 ELSE base END AS batch FROM e
    ),
    -- Spark's bookkeeping, replayed: the watermark IN EFFECT during
    -- batch k derives from event times through batch k-1; eviction at
    -- the end of batch j uses that in-effect watermark. So a row
    -- arriving in batch k is dropped iff its window was evicted in some
    -- batch j <= k-1, i.e. window_end <= max(ts through batch k-2) - 1h.
    -- Batch-1 arrivals can never be dropped (nothing evicted in batch 0);
    -- batch-2 arrivals are dropped against w1 = max(batch 0 ts) - 1h.
    wm AS (
      SELECT
        (SELECT MAX(ts) - INTERVAL 1 HOUR FROM b WHERE batch = 0) AS w1,
        (SELECT MAX(ts) - INTERVAL 1 HOUR FROM b) AS wf
    ),
    kept AS (
      SELECT b.* FROM b, wm
      WHERE NOT (
        batch = 2 AND DATE_TRUNC('day', ts) + INTERVAL 1 DAY <= wm.w1)
    ),
    agg AS (
      SELECT DATE_TRUNC('day', ts) AS ws, event_type, COUNT(*) AS n
      FROM kept GROUP BY 1, 2
    )
    SELECT STRFTIME(ws, '%Y-%m-%d %H:%M:%S') AS window_start, event_type, n
    FROM agg, wm WHERE ws + INTERVAL 1 DAY <= wm.wf
    """,
)
def g_stream_watermark(spark, sf_dir):
    """Watermarked streaming aggregation, value-hash-checked: events are
    replayed as three date-ordered micro-batches with md5-selected
    stragglers delivered two batches late; 1-day tumbling windows with a
    1-hour watermark. The oracle replays Spark's exact semantics —
    per-batch watermark advance, eviction (emit-once on watermark
    passage), and dropping of rows whose window was evicted in an
    earlier batch. Any drift in watermark bookkeeping, window
    boundaries, or late-row handling breaks the hash."""
    import glob
    import os
    import shutil
    import tempfile
    import time as _time

    from kbspark.streaming import streaming_windowed_counts

    # withWatermark requires TIMESTAMP (LTZ); the parquet carries NTZ —
    # session TZ is pinned UTC, so the cast is value-preserving
    events = spark.table("events").select(
        "event_id", F.col("ts").cast("timestamp").alias("ts"), "event_type"
    )
    base = (
        F.when(F.col("ts") < F.lit("2024-01-11").cast("timestamp"), 0)
        .when(F.col("ts") < F.lit("2024-01-21").cast("timestamp"), 1)
        .otherwise(2)
    )
    straggler = (
        F.conv(
            F.substring(F.md5(F.col("event_id").cast("string")), 1, 2), 16, 10
        ).cast("int")
        % 10
        == 0
    )
    batched = events.withColumn(
        "_batch", F.when(straggler, F.lit(2)).otherwise(base)
    )

    import atexit

    flat = tempfile.mkdtemp(prefix="kbspark_wmq_")
    atexit.register(shutil.rmtree, flat, True)
    mtime = _time.time() - 1000
    for k in range(3):
        part_dir = tempfile.mkdtemp(prefix="kbspark_wmp_")
        (
            batched.filter(F.col("_batch") == k)
            .drop("_batch")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(part_dir)
        )
        dst = os.path.join(flat, f"{k:03d}.parquet")
        shutil.copy(glob.glob(os.path.join(part_dir, "*.parquet"))[0], dst)
        os.utime(dst, (mtime + 10 * k, mtime + 10 * k))
        shutil.rmtree(part_dir)

    out = streaming_windowed_counts(
        spark, flat, ts_col="ts", key_col="event_type",
        window="1 day", watermark="1 hour",
    )
    return out.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias(
            "window_start"
        ),
        "event_type",
        "n",
    )


_BUILD_ENTITIES_ORACLE = """
    WITH seed AS (
      SELECT c_custkey AS k, c_name,
             c_custkey % 12 AS class_idx,
             'http://www.wikidata.org/entity/Q'
               || CAST(c_custkey % 700 AS VARCHAR) AS uri,
             'https://de.wikipedia.org/wiki/Ent%20'
               || CAST(c_custkey % 650 AS VARCHAR) AS sitelink
      FROM customer
    ),
    typed AS (
      SELECT k, c_name AS label, class_idx, uri, sitelink,
        CASE WHEN class_idx < 3 THEN 0
             WHEN class_idx < 5 THEN 1 ELSE 2 END AS g,
        CASE WHEN class_idx < 3 THEN class_idx
             WHEN class_idx < 5 THEN class_idx - 3
             ELSE class_idx - 5 END AS rank,
        CASE WHEN class_idx < 3 AND k % 7 <> 0
             THEN TRY_CAST('19' || CAST(k % 80 + 10 AS VARCHAR) || '-01-01'
                           AS TIMESTAMP) END AS dateofbirth,
        CASE WHEN class_idx >= 5 AND k % 5 = 0
             THEN TRY_CAST('18' || LPAD(CAST(k % 90 AS VARCHAR), 2, '0')
                           || '-06-15' AS TIMESTAMP) END AS inception,
        CASE WHEN class_idx IN (3, 4) AND k % 3 = 0
             THEN 'Point(13.' || CAST(k % 90 AS VARCHAR)
                  || ' -52.' || CAST(k % 60 AS VARCHAR) || ')' END AS coords,
        CASE WHEN class_idx >= 5 AND k % 11 = 0
             THEN 'gnd' || CAST(k AS VARCHAR) END AS gndid
      FROM seed
    ),
    ord_rows AS (
      SELECT *, g * 1000000000000000 + rank * 1000000000000 + k AS _ord
      FROM typed
    ),
    grp AS (  -- per-group keep-first on the class URI + work-of-arts anti
      SELECT * FROM ord_rows
      QUALIFY ROW_NUMBER() OVER (PARTITION BY g, uri ORDER BY _ord) = 1
    ),
    grp_clean AS (
      SELECT * FROM grp
      WHERE uri NOT IN (
        SELECT 'http://www.wikidata.org/entity/Q'
               || CAST(c_custkey % 700 AS VARCHAR)
        FROM customer WHERE c_custkey % 97 = 0)
    ),
    agg AS (  -- per-QID first non-null per column, in union order
      SELECT uri AS wikidata, MIN(_ord) AS _ord,
        ARG_MIN(label, _ord) FILTER (WHERE label IS NOT NULL) AS label,
        ARG_MIN(sitelink, _ord) FILTER (WHERE sitelink IS NOT NULL)
          AS sitelink,
        ARG_MIN(dateofbirth, _ord) FILTER (WHERE dateofbirth IS NOT NULL)
          AS dateofbirth,
        ARG_MIN(inception, _ord) FILTER (WHERE inception IS NOT NULL)
          AS inception,
        ARG_MIN(coords, _ord) FILTER (WHERE coords IS NOT NULL) AS coords,
        ARG_MIN(gndid, _ord) FILTER (WHERE gndid IS NOT NULL) AS gndid
      FROM grp_clean GROUP BY uri
    ),
    keep1 AS (
      SELECT * FROM agg
      QUALIFY ROW_NUMBER() OVER (PARTITION BY wikidata
        ORDER BY dateofbirth ASC NULLS LAST, inception ASC NULLS LAST,
                 _ord ASC) = 1
    ),
    flagged AS (
      SELECT k1.*,
        k1.wikidata IN (SELECT uri FROM grp_clean WHERE g = 0) AS per0,
        k1.wikidata IN (SELECT uri FROM grp_clean WHERE g = 1) AS LOC,
        k1.wikidata IN (SELECT uri FROM grp_clean WHERE g = 2) AS ORG
      FROM keep1 k1
    ),
    titled AS (
      SELECT *,
        CASE WHEN per0 AND ORG THEN FALSE ELSE per0 END AS PER,
        REPLACE(REPLACE(sitelink, 'https://de.wikipedia.org/wiki/', ''),
                '%20', ' ') AS page_title,
        REGEXP_EXTRACT(coords,
          'Point\\(([\\-0-9E.]+)\\W.([\\-0-9E.]+)\\)', 1) AS lon_raw,
        REGEXP_EXTRACT(coords,
          'Point\\(([\\-0-9E.]+)\\W.([\\-0-9E.]+)\\)', 2) AS lat_raw
      FROM flagged
    ),
    final AS (
      SELECT * FROM titled
      QUALIFY ROW_NUMBER() OVER (PARTITION BY page_title
        ORDER BY dateofbirth ASC NULLS LAST, inception ASC NULLS LAST,
                 wikidata ASC) = 1
    )
    SELECT page_title, wikidata,
           NULLIF(REGEXP_EXTRACT(wikidata, '.*?(Q[0-9]+).*?', 1), '') AS QID,
           label, sitelink,
           TRIM(CASE WHEN PER THEN 'PER|' ELSE '|' END
                || CASE WHEN LOC THEN 'LOC|' ELSE '|' END
                || CASE WHEN ORG THEN 'ORG' ELSE '' END, '|') AS TYPE,
           PER, LOC, ORG,
           STRFTIME(dateofbirth, '%Y-%m-%d %H:%M:%S') AS dateofbirth,
           STRFTIME(inception, '%Y-%m-%d %H:%M:%S') AS inception,
           NULLIF(lon_raw, '') AS longitude, NULLIF(lat_raw, '') AS latitude,
           gndid
    FROM final
"""


@register("d_build_entities", oracle=_BUILD_ENTITIES_ORACLE)
def d_build_entities(spark, sf_dir):
    """The reference's join-entities stage (§3.2, wikidata/entities.py:
    5-80) composed end-to-end over 12 derived class seed frames: ordered
    union-by-name with varying optional columns, per-group keep-first
    dedup on the class URI, work-of-arts anti-join, lenient date
    coercion, per-QID first-non-null, WKT coords extraction, NaT-last
    ordered keep-first, membership flags, PER&ORG precedence, TYPE
    composition, sitelink->page_title unquote, final title dedup and QID
    extraction. The oracle replays the entire dataflow in SQL. Parity
    with the reference function itself over real seed pickles is
    additionally asserted in tests/test_dims.py."""
    from kbspark.dims import (
        LOC_CLASSES,
        ORG_CLASSES,
        PER_CLASSES,
        build_entities,
    )

    cust = spark.table("customer")
    uri = F.concat(
        F.lit("http://www.wikidata.org/entity/Q"),
        (F.col("c_custkey") % 700).cast("string"),
    )
    sitelink = F.concat(
        F.lit("https://de.wikipedia.org/wiki/Ent%20"),
        (F.col("c_custkey") % 650).cast("string"),
    )
    all_classes = list(PER_CLASSES) + list(LOC_CLASSES) + list(ORG_CLASSES)
    frames = {}
    for idx, cls in enumerate(all_classes):
        if cls in PER_CLASSES:
            uri_col = "person"
        elif cls in LOC_CLASSES:
            uri_col = "location"
        else:
            uri_col = "organisation"
        df = (
            cust.filter(F.col("c_custkey") % 12 == idx)
            .select(
                uri.alias(uri_col),
                F.col("c_name").alias("label"),
                sitelink.alias("sitelink"),
                F.col("c_custkey").cast("long").alias("_seq"),
            )
        )
        k = F.col("_seq")
        if uri_col == "person":
            df = df.withColumn(
                "dateofbirth",
                F.when(
                    k % 7 != 0,
                    F.concat(
                        F.lit("19"), (k % 80 + 10).cast("string"),
                        F.lit("-01-01"),
                    ),
                ),
            )
        elif uri_col == "location":
            df = df.withColumn(
                "coords",
                F.when(
                    k % 3 == 0,
                    F.concat(
                        F.lit("Point(13."), (k % 90).cast("string"),
                        F.lit(" -52."), (k % 60).cast("string"), F.lit(")"),
                    ),
                ),
            )
        else:
            df = df.withColumn(
                "inception",
                F.when(
                    k % 5 == 0,
                    F.concat(
                        F.lit("18"),
                        F.lpad((k % 90).cast("string"), 2, "0"),
                        F.lit("-06-15"),
                    ),
                ),
            ).withColumn(
                "gndid",
                F.when(k % 11 == 0, F.concat(F.lit("gnd"), k.cast("string"))),
            )
        frames[cls] = df
    woa = cust.filter(F.col("c_custkey") % 97 == 0).select(uri.alias("woa"))

    out = build_entities(frames, woa, site="https://de.wikipedia.org/wiki/")
    return out.select(
        "page_title", "wikidata", "QID", "label", "sitelink", "TYPE",
        "PER", "LOC", "ORG",
        F.date_format("dateofbirth", "yyyy-MM-dd HH:mm:ss").alias(
            "dateofbirth"
        ),
        F.date_format("inception", "yyyy-MM-dd HH:mm:ss").alias("inception"),
        "longitude", "latitude", "gndid",
    )


@register("s_knn_ivf", oracle=_IVF_ORACLE)
def s_knn_ivf(spark, sf_dir):
    """IVF ANN, value-hash-checked end-to-end: the oracle replays the
    md5-ranked codebook init, BOTH Lloyd iterations (assign → per-dim
    mean, empty-cluster fallback), the final corpus assignment, the
    3-cell probe and the exact cosine re-rank in SQL. Recall vs brute
    force is additionally asserted in pytest."""
    from kbspark.simsearch import knn_ivf

    emb = spark.table("embeddings")
    return knn_ivf(
        emb.filter(F.col("vec_id") < 10), emb, k=5, n_centroids=8, n_probes=3
    )


@register(
    "s_knn_lsh",
    oracle="""
    WITH emb AS (
      SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
    ),
    planes AS (
      SELECT tt.t AS tbl, pp.p AS p, tt.t * 4 + pp.p AS plane
      FROM (SELECT UNNEST(RANGE(0, 6)) AS t) tt,
           (SELECT UNNEST(RANGE(0, 4)) AS p) pp
    ),
    comp AS (
      -- hyperplane component j of plane p: first 15 hex chars of
      -- md5('p:j') scaled to [-1, 1) — identical to kbspark.simsearch
      SELECT plane, tbl, p,
             LIST_TRANSFORM(RANGE(0, 64), j ->
               CAST(CONCAT('0x', SUBSTR(MD5(CONCAT(plane, ':', j)), 1, 15))
                    AS BIGINT) / POW(2, 59) - 1) AS h
      FROM planes
    ),
    sgn AS (
      SELECT e.vec_id, c.tbl, c.p,
             CASE WHEN LIST_DOT_PRODUCT(e.emb, c.h) >= 0
                  THEN '1' ELSE '0' END AS s
      FROM emb e, comp c
    ),
    sig AS (
      SELECT vec_id, tbl, STRING_AGG(s, '' ORDER BY p) AS sig
      FROM sgn GROUP BY vec_id, tbl
    ),
    cand AS (
      SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
      FROM sig q JOIN sig c ON q.tbl = c.tbl AND q.sig = c.sig
      WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id
    ),
    scored AS (
      SELECT cand.query_id, cand.neighbor_id,
             LIST_DOT_PRODUCT(qe.emb, ce.emb) /
             (SQRT(LIST_DOT_PRODUCT(qe.emb, qe.emb)) *
              SQRT(LIST_DOT_PRODUCT(ce.emb, ce.emb))) AS cos
      FROM cand
      JOIN emb qe ON qe.vec_id = cand.query_id
      JOIN emb ce ON ce.vec_id = cand.neighbor_id
    )
    SELECT query_id, neighbor_id, ROUND(cos, 4) AS cosine FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rn
      FROM scored
    ) WHERE rn <= 5
    """,
)
def s_knn_lsh(spark, sf_dir):
    """Random-hyperplane LSH ANN, value-hash-checked end-to-end: the
    oracle recomputes the md5-derived hyperplanes, the per-table sign
    signatures, the bucket equi-join candidate generation and the exact
    cosine re-rank in SQL — bucketing, scoring and ranking are all
    verified, not just row counts. Recall vs brute force is additionally
    asserted in tests/test_textops_simsearch.py."""
    from kbspark.simsearch import knn_lsh

    emb = spark.table("embeddings")
    return knn_lsh(
        emb.filter(F.col("vec_id") < 10), emb, k=5, n_planes=4, n_tables=6, dim=64
    )


_IVF_RECALL_ORACLE = _IVF_CTES + f""",
    probe AS (
      SELECT e.vec_id AS query_id, e.emb AS qe, s.cluster,
             ROW_NUMBER() OVER (PARTITION BY e.vec_id
               ORDER BY {_IVF_D2.format(cb="s")} ASC, s.cluster ASC) AS prank
      FROM emb e, c2 s WHERE e.vec_id < 10
      QUALIFY prank <= 3
    ),
    scored AS (
      SELECT p.query_id, p.prank, a.vec_id AS neighbor_id,
             LIST_DOT_PRODUCT(p.qe, a.emb) /
             (SQRT(LIST_DOT_PRODUCT(p.qe, p.qe)) *
              SQRT(LIST_DOT_PRODUCT(a.emb, a.emb))) AS cos
      FROM probe p JOIN assign a USING (cluster)
      WHERE a.vec_id <> p.query_id
    ),
    nps AS (SELECT UNNEST([1, 2, 3]) AS n_probes),
    cand AS (
      SELECT n.n_probes, s.query_id, s.neighbor_id, MIN(s.cos) AS cos
      FROM nps n JOIN scored s ON s.prank <= n.n_probes
      GROUP BY 1, 2, 3
    ),
    ivf_top AS (
      SELECT n_probes, query_id, neighbor_id FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY n_probes, query_id
          ORDER BY cos DESC, neighbor_id ASC) AS rn FROM cand
      ) WHERE rn <= 5
    ),
    bf AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
                 LIST_DOT_PRODUCT(q.emb, e.emb) /
                 (SQRT(LIST_DOT_PRODUCT(q.emb, q.emb)) *
                  SQRT(LIST_DOT_PRODUCT(e.emb, e.emb))) DESC,
                 e.vec_id ASC) AS rn
        FROM (SELECT * FROM emb WHERE vec_id < 10) q
        JOIN emb e ON e.vec_id <> q.vec_id
      ) WHERE rn <= 5
    ),
    nq AS (SELECT COUNT(*) AS n FROM emb WHERE vec_id < 10)
    SELECT i.n_probes,
           COUNT(*) AS n_retrieved,
           COUNT(b.query_id) AS n_hits,
           ROUND(COUNT(b.query_id) / (5.0 * MIN(nq.n)), 6) AS recall
    FROM ivf_top i
    LEFT JOIN bf b
      ON b.query_id = i.query_id AND b.neighbor_id = i.neighbor_id
    CROSS JOIN nq
    GROUP BY 1
"""


@register("s_ann_ivf_recall", oracle=_IVF_RECALL_ORACLE)
def s_ann_ivf_recall(spark, sf_dir):
    """IVF multi-probe recall fusion (VERDICT r02 stretch): the SAME
    trained codebook probed at 1, 2 and 3 cells, each re-ranked exactly
    and measured as recall@5 against the brute-force ground truth —
    the ANN quality/row-budget tradeoff as a driver-verified table
    (n_probes, n_retrieved, n_hits, recall). The oracle replays the
    whole chain in SQL (Lloyd codebook, probe ranking, per-probe-count
    top-5, brute-force top-5, recall) so both the candidate sets AND the
    recall arithmetic are hash-checked. Monotonicity (recall rises with
    probes) is asserted in pytest; at web scale n_probes is the knob
    trading shuffle volume for recall — this entry is the measured
    curve."""
    from kbspark.session import persist_tracked
    from kbspark.simsearch import knn_bruteforce, knn_ivf, train_ivf_centroids

    emb = spark.table("embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    nq = F.broadcast(q.agg(F.count("*").alias("_nq")))
    centroids = train_ivf_centroids(emb)
    bf = persist_tracked(
        knn_bruteforce(q, emb, k=5).select("query_id", "neighbor_id")
    )
    out = None
    for p in (1, 2, 3):
        ivf = knn_ivf(q, emb, k=5, n_probes=p, centroids=centroids).select(
            "query_id", "neighbor_id"
        )
        stats = (
            ivf.agg(F.count("*").alias("n_retrieved"))
            .crossJoin(
                ivf.join(bf, ["query_id", "neighbor_id"], "left_semi").agg(
                    F.count("*").alias("n_hits")
                )
            )
            .crossJoin(nq)
            .select(
                F.lit(p).alias("n_probes"),
                "n_retrieved",
                "n_hits",
                F.round(
                    F.col("n_hits") / (F.lit(5.0) * F.col("_nq")), 6
                ).alias("recall"),
            )
        )
        out = stats if out is None else out.unionByName(stats)
    return out
