"""Real-SoMaJo adapter dry-run marker (VERDICT r04 stretch #9).

The one place kbspark's fidelity is argued rather than measured is
E3/E5: the RegexTokenizer stands in for SoMaJo (reference consumer:
/root/reference/qurator/wikipedia/ner.py:123-167,203) because the
``somajo`` package is not installable in this sandbox. This module
keeps that gap VISIBLE in every test run: on an environment where
somajo installs, the skip flips into a live divergence measurement of
the regex fallback against the real tokenizer over the golden corpus —
no code changes needed.
"""

from __future__ import annotations

import importlib.util

import pytest

HAVE_SOMAJO = importlib.util.find_spec("somajo") is not None


@pytest.mark.skipif(
    not HAVE_SOMAJO,
    reason="somajo not installable in this sandbox (no network/pip): "
    "E3/E5 fidelity is evidenced by the documented-class vector suites "
    "(tests/test_tokenizer_fidelity.py, test_tokenizer_interactions.py) "
    "instead of a live comparison — install somajo to run this for real",
)
def test_regex_fallback_vs_real_somajo():
    from somajo import SoMaJo  # noqa: PLC0415

    from kbspark.extract import RegexTokenizer
    from tests.test_tokenizer_fidelity import GOLDENS

    real = SoMaJo("de_CMC", split_camel_case=True)
    ours = RegexTokenizer(split_camel_case=True, language="de")
    total = diverged = 0
    for text, _, _ in GOLDENS:
        want = [
            tok.text
            for sent in real.tokenize_text([text])
            for tok in sent
        ]
        got = ours.tokenize(text)
        total += len(want)
        if got != want:
            diverged += abs(len(want) - len(got)) or 1
    assert diverged / total < 0.01, (diverged, total)
