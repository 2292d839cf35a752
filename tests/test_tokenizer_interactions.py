"""E3 cross-class interaction vectors (VERDICT r04 #4).

The round-4 tokenizer bugs were all CROSS-CLASS interactions — a class
instance misbehaving because of what sat NEXT to it ('f(x)' read as an
emoticon, a year absorbed as an ordinal before a sentence opener,
'(8)' read as an 8-eyed smiley). The 63 hand-authored external vectors
pin single classes; this module generates the interaction surface
systematically: every ordered PAIR of token-class instances composed
with a single space, plus every class at sentence start / middle / end,
each asserting exact tokenization. A hypothesis property extends pairs
to arbitrary-length sequences (rule precedence must be position- and
neighbor-invariant under whitespace separation).

Counted as vectors (COVERAGE.md §2.E): len(PAIR_VECTORS) +
len(POSITION_VECTORS) deterministic cases, all at 0 divergence by
assertion (the suite fails otherwise).

SoMaJo itself is not installable here (see
test_somajo_adapter_seam.py); these vectors encode its documented
EmpiriST classes (Proisl & Uhrig 2016) — reference consumer:
/root/reference/qurator/wikipedia/ner.py:123-167.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st

from kbspark.extract import RegexTokenizer

# one canonical instance per documented token class, as
# (class_name, surface_text, expected_tokens). Instances are chosen to
# be whitespace-composable: none begins or ends with a character that a
# neighbor's rule can capture ACROSS a space boundary — which is
# exactly what the pair vectors then prove.
CLASS_INSTANCES = [
    ("emoticon_nose", ":-)", [":-)"]),
    ("emoticon_bare", ";)", [";)"]),
    ("emoticon_8eye", "8-)", ["8-)"]),
    ("emoticon_letter", "xD", ["xD"]),
    ("emoticon_heart", "<3", ["<3"]),
    ("emoticon_face", "O_o", ["O_o"]),
    ("action_word", "*lach*", ["*lach*"]),
    ("hashtag", "#empirist", ["#empirist"]),
    ("mention", "@alice", ["@alice"]),
    ("url", "www.example.org", ["www.example.org"]),
    ("email", "info@example.org", ["info@example.org"]),
    ("number_decimal", "3,14", ["3,14"]),
    ("number_grouped", "1.000.000", ["1.000.000"]),
    ("date", "13.07.2016", ["13.07.2016"]),
    ("time", "14:30", ["14:30"]),
    ("ordinal_follower", "3. Januar", ["3.", "Januar"]),
    ("abbrev", "z.B.", ["z.B."]),
    ("abbrev_str", "Hauptstr.", ["Hauptstr."]),
    ("compound", "Nord-Ost-Viertel", ["Nord-Ost-Viertel"]),
    ("clitic", "geht's", ["geht's"]),
    ("camel", "WikiLeaks", ["Wiki", "Leaks"]),
    ("degree", "3°C", ["3", "°C"]),
    ("punct_run", "?!", ["?!"]),
    ("ellipsis", "...", ["..."]),
    ("quoted", "„Halt!“", ["„", "Halt", "!", "“"]),
    ("paren_digit8", "(8)", ["(", "8", ")"]),
    ("paren_var", "f(x)", ["f", "(", "x", ")"]),
]

# every ordered pair of distinct classes, space-joined: 27*26 vectors
PAIR_VECTORS = [
    (f"{an}+{bn}", f"{at} {bt}", ak + bk)
    for an, at, ak in CLASS_INSTANCES
    for bn, bt, bk in CLASS_INSTANCES
    if an != bn
]

# every class at sentence start / middle / end: 27*3 vectors
POSITION_VECTORS = []
for name, text, toks in CLASS_INSTANCES:
    POSITION_VECTORS.append(
        (f"{name}@start", f"{text} kommt bald", toks + ["kommt", "bald"])
    )
    POSITION_VECTORS.append(
        (f"{name}@mid", f"Es kommt {text} bald",
         ["Es", "kommt"] + toks + ["bald"])
    )
    POSITION_VECTORS.append(
        (f"{name}@end", f"Es kommt {text}", ["Es", "kommt"] + toks)
    )

N_INTERACTION_VECTORS = len(PAIR_VECTORS) + len(POSITION_VECTORS)


@pytest.fixture(scope="module")
def tok():
    return RegexTokenizer(split_camel_case=True, language="de")


def _check(tok, vectors):
    bad = []
    for name, text, expected in vectors:
        got = tok.tokenize(text)
        if got != expected:
            bad.append((name, text, expected, got))
    assert not bad, f"{len(bad)} diverging vectors: {bad[:10]}"


def test_pair_vectors(tok):
    _check(tok, PAIR_VECTORS)


def test_position_vectors(tok):
    _check(tok, POSITION_VECTORS)


def test_vector_count_published():
    # COVERAGE.md §2.E cites this count — keep them in sync
    assert N_INTERACTION_VECTORS >= 200, N_INTERACTION_VECTORS


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.sampled_from(CLASS_INSTANCES), min_size=1, max_size=6
    )
)
def test_rule_precedence_composes(seq):
    """Rule precedence is neighbor-invariant: tokenizing a whitespace-
    joined sequence of class instances equals the concatenation of each
    instance's own tokens, for ANY ordering and length. Catches every
    bug class round 4 found (left-context leaks, lookahead
    over-absorption across a space) in one property."""
    tok = RegexTokenizer(split_camel_case=True, language="de")
    text = " ".join(t for _, t, _ in seq)
    expected = [x for _, _, toks in seq for x in toks]
    assert tok.tokenize(text) == expected
