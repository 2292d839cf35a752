"""End-to-end golden test (SURVEY §5.2): the distributed triple pipeline
over the synthetic wiki corpus vs a straight-line single-process oracle
that follows the reference dataflow — reference clean_text and
tokenize_links exec'd from source, then manual triple aggregation.
Target: exact match (P = R = 1.0)."""

import collections

import pandas as pd
from pyspark.sql import functions as F

from kbspark.corpus import synth_corpus, synth_dims
from kbspark.extract import RegexTokenizer, annotate_stage, mention_stage
from kbspark.triples import build_triples, qid_col
from tests.reference_oracle import reference_clean_text, reference_tokenize_links


def oracle_triples(pages: pd.DataFrame, entity_types, redirect_targets):
    """Single-process pandas pipeline using the REFERENCE functions."""
    clean = reference_clean_text()
    tokenize_links = reference_tokenize_links()
    all_entities = pd.DataFrame(
        {"TYPE": list(entity_types.values())}, index=list(entity_types.keys())
    )
    redirects = pd.DataFrame(
        {"rd_title": list(redirect_targets.values())},
        index=list(redirect_targets.keys()),
    )
    counts = collections.Counter()
    for _, row in pages.iterrows():
        parts = tokenize_links(clean(row["text"]), all_entities, redirects)
        for _surface, title, etype in parts:
            # the outer etype guard was redundant with this membership
            # check (round-3 test review) — the oracle states the
            # intended semantics in its simplest form: count resolved
            # links whose title is a known entity
            if title in entity_types:
                counts[(row["url"], title)] += 1
    return counts


def test_flagship_matches_reference_logic_exactly(spark):
    pages_pdf = synth_corpus(80, seed=31)
    entity_types, redirect_targets = synth_dims()

    expected_counts = oracle_triples(pages_pdf, entity_types, redirect_targets)

    pages = spark.createDataFrame(pages_pdf).repartition(6)
    mentions = mention_stage(pages, spark, entity_types, redirect_targets)
    triples = build_triples(spark, mentions, entity_types, redirect_targets)

    got = (
        triples.filter(F.col("pred") == "mentions")
        .join(
            spark.createDataFrame(
                pd.DataFrame(
                    {"page_title": list(entity_types.keys())}
                )
            ).withColumn("QID", qid_col()),
            F.col("obj") == F.col("QID"),
        )
        .select("subj", "page_title", "n_occurrences")
        .collect()
    )
    got_counts = {(r["subj"], r["page_title"]): r["n_occurrences"] for r in got}

    # exact match: P = R = 1.0 (stronger than the >=0.95 gate)
    assert got_counts == dict(expected_counts)
    assert len(got_counts) > 100


def test_mixed_language_annotate_seam(spark):
    """The lang→tokenizer seam with ≥2 languages (VERDICT r03 #10): a
    mixed de/en/fr corpus slice annotated with lang_col routes every
    document through the tokenizer built for ITS language (proven with a
    language-stamping test factory — init-once per (worker, lang)), and
    the default fallback factory is language-agnostic: routed mixed-lang
    output equals the unroutered single-tokenizer output exactly."""
    pages_pdf = synth_corpus(30, seed=77)
    pages_pdf["lang"] = ["de", "en", "fr"] * 10
    lang_of = dict(zip(pages_pdf["url"], pages_pdf["lang"]))
    entity_types, redirect_targets = synth_dims()
    pages = spark.createDataFrame(pages_pdf).repartition(4)

    # defined in-function so cloudpickle ships them BY VALUE — the test
    # module is not importable inside Spark's python workers. The
    # tokenizer stamps every token with the language it was built for,
    # making per-document ROUTING visible (the sandbox fallback is
    # otherwise language-agnostic, so routing alone would be
    # unobservable).
    class LangTagTokenizer(RegexTokenizer):
        def tokenize_text(self, texts):
            return [
                [f"{self.language}:{t}" for t in sent]
                for sent in super().tokenize_text(texts)
            ]

    def lang_tag_tokenizer_factory(lang):
        return LangTagTokenizer(split_camel_case=True, language=lang)

    stamped = annotate_stage(
        pages, spark, entity_types, redirect_targets,
        lang_col="lang", tokenizer_factory=lang_tag_tokenizer_factory,
    ).collect()
    assert len(stamped) == 30
    seen_langs = set()
    for row in stamped:
        want = lang_of[row["url"]] + ":"
        seen_langs.add(lang_of[row["url"]])
        toks = [t for sent in row["text"] for t in sent]
        assert toks, row["url"]
        assert all(t.startswith(want) for t in toks), (row["url"], toks[:5])
    assert seen_langs == {"de", "en", "fr"}

    # default factory: per-lang routing must not change values (the
    # regex fallback is one implementation for every language)
    routed = annotate_stage(
        pages, spark, entity_types, redirect_targets, lang_col="lang"
    ).toPandas().sort_values("url").reset_index(drop=True)
    plain = annotate_stage(
        pages, spark, entity_types, redirect_targets
    ).toPandas().sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(routed, plain)
