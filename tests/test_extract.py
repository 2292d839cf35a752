"""E2-E6 unit tests: mention extraction parity with the reference's
tokenize_links (exec'd from source with pandas-index inputs), annotation
dataflow invariants, and the Spark stages end-to-end."""

import pandas as pd

from kbspark.corpus import synth_corpus, synth_dims
from kbspark.extract import (
    RegexSentenceSplitter,
    RegexTokenizer,
    annotated_tokenization,
    clean_text,
    extract_link_parts,
    extract_mentions,
    mention_stage,
    pack_page,
    tokenize_parts,
)
from tests.reference_oracle import reference_clean_text, reference_tokenize_links

ENTITY_TYPES = {"Berlin": "LOC", "Kafka": "PER", "Siemens": "ORG", "Wien": "LOC"}
REDIRECTS = {"BLN": "Berlin", "Franz_Kafka": "Kafka", "Dead_End": "Nowhere"}


def _reference_parts(cleaned):
    """Run the reference tokenize_links (ner.py:79-120) on the same dicts,
    shaped as the pandas frames it expects."""
    tokenize_links = reference_tokenize_links()
    all_entities = pd.DataFrame(
        {"TYPE": list(ENTITY_TYPES.values())}, index=list(ENTITY_TYPES.keys())
    )
    redirects = pd.DataFrame(
        {"rd_title": list(REDIRECTS.values())}, index=list(REDIRECTS.keys())
    )
    return tokenize_links(cleaned, all_entities, redirects)


CLEANED_SAMPLES = [
    "visit [[Berlin]] today",
    "writer [[Kafka|Franz Kafka]] wrote",
    "[[BLN|the capital]] is big",  # redirect hop -> Berlin/LOC
    "[[Franz_Kafka|he]] again",  # redirect hop -> Kafka/PER
    "[[Dead_End|nothing]] here",  # redirect to non-entity -> type O
    "[[Unknown_Page|mystery]] text",
    "[[Berlin#History|old town]] anchor",
    "[[Wien]] und [[Siemens]] und [[Berlin]]",
    "no links at all",
    "[[spaced title|surface]] with space->underscore",
    "",
]


def test_parts_match_reference():
    for cleaned in CLEANED_SAMPLES:
        ours = extract_link_parts(cleaned, ENTITY_TYPES, REDIRECTS)
        ref = _reference_parts(cleaned)
        assert [tuple(p) for p in ours] == [tuple(p) for p in ref], cleaned


def test_parts_match_reference_on_synth_corpus():
    ref_clean = reference_clean_text()
    pages = synth_corpus(120, seed=13)
    entity_types, redirects = synth_dims()
    tokenize_links = reference_tokenize_links()
    all_entities = pd.DataFrame(
        {"TYPE": list(entity_types.values())}, index=list(entity_types.keys())
    )
    rd = pd.DataFrame(
        {"rd_title": list(redirects.values())}, index=list(redirects.keys())
    )
    for raw in pages["text"]:
        cleaned = clean_text(raw)
        assert cleaned == ref_clean(raw)
        ours = extract_link_parts(cleaned, entity_types, redirects)
        ref = tokenize_links(cleaned, all_entities, rd)
        assert [tuple(p) for p in ours] == [tuple(p) for p in ref]


def test_extract_mentions_subset_of_parts():
    cleaned = "a [[Berlin]] b [[Unknown|u]] c [[BLN|x]]"
    mentions = extract_mentions(cleaned, ENTITY_TYPES, REDIRECTS)
    assert mentions == [
        (0, "Berlin", "Berlin", "LOC"),
        (1, "u", "Unknown", "O"),
        (2, "x", "Berlin", "LOC"),
    ]


def test_tokenizer_camel_case_and_punct():
    tok = RegexTokenizer(split_camel_case=True)
    assert tok.tokenize("McDonald") == ["Mc", "Donald"]
    assert tok.tokenize("a b, c.") == ["a", "b", ",", "c", "."]
    assert tok.tokenize("3.14 x") == ["3.14", "x"]


def test_sentence_splitter():
    spl = RegexSentenceSplitter()
    assert spl.split(["a", ".", "b", "!", "c"]) == [["a", "."], ["b", "!"], ["c"]]
    assert spl.split([]) == []


def test_bio_tagging():
    parts = [("before ", "", "O"), ("Franz Kafka", "Kafka", "PER"), (" after", "", "O")]
    tokens, meta = tokenize_parts(RegexTokenizer(), parts)
    assert tokens == ["before", "Franz", "Kafka", "after"]
    assert meta == [
        ("", "O"),
        ("Kafka", "B-PER"),
        ("Kafka", "I-PER"),
        ("", "O"),
    ]


def test_annotated_tokenization_alignment():
    raw = "Er besucht [[Berlin]]. Danach [[Kafka|Franz Kafka]] liest."
    rows = annotated_tokenization(
        raw, RegexTokenizer(), RegexSentenceSplitter(), ENTITY_TYPES, REDIRECTS
    )
    # two sentences; tags align with the linked tokens
    by_word = {(r[2], r[4]) for r in rows}
    assert ("Berlin", "B-LOC") in by_word
    assert ("Franz", "B-PER") in by_word
    assert ("Kafka", "I-PER") in by_word
    sentences = {r[0] for r in rows}
    assert sentences == {0, 1}
    # every row count: token indices contiguous within each sentence
    for s in sentences:
        toks = sorted(r[1] for r in rows if r[0] == s)
        assert toks == list(range(len(toks)))


def test_pack_page_roundtrip():
    rows = [
        (0, 0, "a", "", "O"),
        (0, 1, "b", "X", "B-LOC"),
        (1, 0, "c", "", "O"),
    ]
    text, tags, links = pack_page(rows)
    assert text == [["a", "b"], ["c"]]
    assert tags == [["O", "B-LOC"], ["O"]]
    assert links == [["", "X"], [""]]


def test_annotate_stage_lang_keyed_tokenizers(spark):
    """E3: tokenizer instances are created per language via the factory
    seam (SURVEY §2 E3 'tokenizer keyed by lang')."""
    from kbspark.extract import annotate_stage

    pdf = synth_corpus(12, seed=2)  # langs de/fr/en
    pages = spark.createDataFrame(pdf)
    entity_types, redirects = synth_dims()

    # the factory's effect must be VISIBLE in the output (a worker-side
    # tracking list is invisible to the driver — round-3 test review):
    # each token is prefixed with the language the factory was built for,
    # proving the per-lang factory/lang_col wiring end-to-end
    class MarkingTokenizer(RegexTokenizer):
        def __init__(self, lang):
            super().__init__(split_camel_case=True, language=lang)

        def tokenize(self, text):
            return [f"{self.language}:{t}" for t in super().tokenize(text)]

    def marking_factory(lang):
        return MarkingTokenizer(lang)

    tagged = annotate_stage(
        pages, spark, entity_types, redirects,
        lang_col="lang", tokenizer_factory=marking_factory,
    ).toPandas()
    assert len(tagged) == 12
    for _, row in tagged.iterrows():
        lang = pdf.loc[pdf.url == row["url"], "lang"].iloc[0]
        toks = [t for sen in row["text"] for t in sen]
        assert toks and all(t.startswith(f"{lang}:") for t in toks), (
            lang, toks[:5]
        )


def test_annotate_never_throws_on_garbage():
    """Robustness: the full per-document chain absorbs arbitrary input
    (the reference's contract — clean_text returns '' on any exception,
    ner.py:73-76; downstream must cope with every string)."""
    import hypothesis.strategies as st
    from hypothesis import given, settings

    tok, spl = RegexTokenizer(), RegexSentenceSplitter()

    @settings(max_examples=150, deadline=None)
    @given(st.text(max_size=300))
    def run(raw):
        rows = annotated_tokenization(raw, tok, spl, ENTITY_TYPES, REDIRECTS)
        pack_page(rows)  # must also pack cleanly

    run()


def test_mention_stage_spark(spark):
    pages = spark.createDataFrame(synth_corpus(40, seed=3))
    entity_types, redirects = synth_dims()
    mentions = mention_stage(pages, spark, entity_types, redirects)
    pdf = mentions.toPandas()
    assert len(pdf) > 0
    assert set(pdf.columns) == {
        "url", "mention_pos", "surface", "page_title", "entity_type"
    }
    # every synth page links at least one known entity
    assert (pdf.entity_type != "O").sum() > 0
    # redirect links resolved to their targets
    assert not pdf.page_title.str.startswith("Redirect_").any()

    # parity: distributed result == driver-side single-process run
    rows = []
    for _, r in synth_corpus(40, seed=3).iterrows():
        for pos, surface, title, etype in extract_mentions(
            clean_text(r["text"]), entity_types, redirects
        ):
            rows.append((r["url"], pos, surface, title, etype))
    expected = pd.DataFrame(
        rows, columns=["url", "mention_pos", "surface", "page_title", "entity_type"]
    )
    got = pdf.sort_values(["url", "mention_pos"]).reset_index(drop=True)
    expected = expected.sort_values(["url", "mention_pos"]).reset_index(drop=True)
    got["mention_pos"] = got["mention_pos"].astype("int64")
    expected["mention_pos"] = expected["mention_pos"].astype("int64")
    pd.testing.assert_frame_equal(got, expected)
