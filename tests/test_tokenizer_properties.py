"""Property tests (hypothesis) for the E3/E5 chain: no token loss, no
character loss, splitter partitions the stream, annotation realignment
stays positionally consistent on arbitrary text."""

import re

from hypothesis import given, settings, strategies as st

from kbspark.extract import (
    RegexSentenceSplitter,
    RegexTokenizer,
    annotated_tokenization,
)

text_strategy = st.text(
    alphabet=st.characters(
        codec="utf-8", categories=("L", "N", "P", "S", "Z")
    ),
    max_size=300,
)


@settings(max_examples=300, deadline=None)
@given(text_strategy)
def test_tokenizer_loses_no_nonspace_characters(text):
    """Every non-whitespace character of the input appears in exactly
    one token (the alternation is total over non-space chars; camel
    split only re-segments)."""
    toks = RegexTokenizer(split_camel_case=True).tokenize(text)
    got = "".join(toks)
    want = re.sub(r"\s+", "", text)
    # strict equality: tokenization is order-preserving, so the
    # concatenation must reproduce the de-spaced input EXACTLY (a sorted
    # multiset comparison would mask reordering — round-3 test review)
    assert got == want


@settings(max_examples=300, deadline=None)
@given(text_strategy)
def test_splitter_partitions_token_stream(text):
    """Sentence split is a partition of the token stream: concatenating
    sentences reproduces the tokens exactly, order included, and no
    sentence is empty."""
    toks = RegexTokenizer().tokenize(text)
    sentences = RegexSentenceSplitter().split(toks)
    assert [t for s in sentences for t in s] == toks
    assert all(s for s in sentences)


@settings(max_examples=150, deadline=None)
@given(st.lists(st.sampled_from(
    ["plain", "words", "here", "[[Entity_Alpha_0]]",
     "[[Entity_Beta_1|alias]]", "[[Redirect_0|r]]", "[[Unknown_Xyz]]",
     ".", "!", "z.B.", "3,5", "ende."]), min_size=0, max_size=40))
def test_annotation_rows_positionally_consistent(parts):
    """annotated_tokenization over arbitrary interleavings of text and
    links: row count equals the total token count, sentence/word indices
    are dense, and every tagged token's tag type matches its link
    metadata presence."""
    from kbspark.corpus import synth_dims

    entity_types, redirects = synth_dims()
    text = " ".join(parts)
    rows = annotated_tokenization(
        text, RegexTokenizer(), RegexSentenceSplitter(), entity_types,
        redirects,
    )
    # dense indices
    seen = {}
    for s_idx, w_idx, word, title, tag in rows:
        seen.setdefault(s_idx, []).append(w_idx)
        # tag 'O' tokens may still carry a title: unknown link targets
        # keep their raw title with type 'O' (ner.py:100-114 semantics)
        if tag != "O":
            assert tag[:2] in ("B-", "I-") and title != ""
            assert tag[2:] in ("PER", "LOC", "ORG")
    for s_idx, widxs in seen.items():
        assert widxs == list(range(len(widxs)))
    assert sorted(seen) == list(range(len(seen)))
    # token conservation (round-4 test review: the docstring promised it
    # but nothing asserted it): the sentence split + realignment must
    # emit exactly one row per token of the pre-split stream — a
    # splitter that dropped or truncated a sentence would pass the
    # dense-index checks above
    from kbspark.extract import clean_text, extract_link_parts, tokenize_parts

    parts_list = extract_link_parts(
        clean_text(text), entity_types, redirects
    )
    expected_tokens, _ = (
        tokenize_parts(RegexTokenizer(), parts_list)
        if parts_list else ([], [])
    )
    assert len(rows) == len(expected_tokens)
