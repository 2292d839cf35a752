"""E1 byte-identity: kbspark.extract.clean_text must equal the reference
extractor (qurator/wikipedia/ner.py:30-76) byte-for-byte on every input —
the per-row invariant from BASELINE.json input_hint."""

import hypothesis.strategies as st
import pytest
from hypothesis import given, settings

from kbspark.corpus import synth_corpus
from kbspark.extract import clean_text
from tests.reference_oracle import reference_clean_text

ref_clean = reference_clean_text()

CASES = [
    "",
    "plain text with no markup at all",
    "text == Literatur == removed tail",
    "a == References == gone\nmultiline\ntail",
    "film == Filmographie == tail",
    "keep <!-- comment --> going",
    "self closing <br/> tag",
    "<ref name=x> body </ref> after",
    "nested {{outer {{inner}} rest}} done",
    "{{a}}{{b}}{{c}}",
    "table {| class=x |- cell |} after",
    "nested {| outer {| inner |} tail |} end",
    "== Heading == body ==== H4 ====",
    "a&nbsp;b&nbsp;c",
    "[[Simple_Link]] text",
    "[[Target|surface words]] text",
    "[[Target#anchor|surface]] text",
    "[[Datei:bild.png|thumb|desc]] after",
    "[[File:pic.jpg]] after",
    "[[Fichier:image.png|x]] after",
    "[http://example.com external] after",
    "[https://example.com/x?q=1 ext] after",
    "mix [[A|b]] {{t}} {| tb |} <!--c--> [http://e f] [[Datei:d.png]] end",
    "unclosed {{ template",
    "unclosed {| table",
    "unclosed [[ link",
    "]] stray close",
    "<unclosed tag",
    "deep " + "{{x|" * 50 + "core" + "}}" * 50,
    "[[A|b|c]] pipes beyond two",
    "[[|empty target]]",
    "[[]] empty link",
    "text with | bare pipe",
    "{{tmpl with [[Link|s]] inside}}",
    "{| table with [[Link]] inside |}",
    "<tag>[[Link|s]]</tag>",
    "€ ünïcödé ß 中文 [[Ümlaut_Straße|ß]] text",
    "newline\n\nparagraphs\n== Literatur ==\ntail\nlines",
    "a [[x" + "y" * 500 + "]] long link",
]


@pytest.mark.parametrize("raw", CASES, ids=range(len(CASES)))
def test_golden_cases(raw):
    assert clean_text(raw) == ref_clean(raw)


def test_synth_corpus_pages_byte_identical():
    pages = synth_corpus(300, seed=7)
    for raw in pages["text"]:
        assert clean_text(raw) == ref_clean(raw)


@settings(max_examples=400, deadline=None)
@given(
    st.lists(
        st.sampled_from(
            list("ab |[]{}<>=&;:!-/\n.#") + ["&nbsp;", "<ref>", "</ref>", "{{", "}}", "[[", "]]", "{|", "|}", "=="]
        ),
        max_size=60,
    )
)
def test_property_random_markup(raw):
    raw = "".join(raw)
    assert clean_text(raw) == ref_clean(raw)


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=200))
def test_property_arbitrary_text(raw):
    assert clean_text(raw) == ref_clean(raw)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.sampled_from(
            list("ab .|") + ["&nbsp;", "{{x}}", "[[A|b]]", "{| t |}", "== h =="]
        ),
        max_size=40,
    )
)
def test_property_idempotent_on_clean_output(parts):
    """SURVEY §5.4: cleaning already-cleaned text only ever re-applies
    the wikilink-guard roundtrip — one more pass must be a fixpoint."""
    once = clean_text("".join(parts))
    assert clean_text(once) == clean_text(clean_text(once))
