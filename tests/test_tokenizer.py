"""BPE tokenizer parity vs the reference open_clip tokenizer."""

import numpy as np
import pytest

from vitlens_tpu.text.tokenizer import get_tokenizer

from tests import ref_oracle

SAMPLES = [
    "a bird",
    "crackling fire",
    "a photo of a dog.",
    "A Person sitting at a PIANO!!",
    "sea wave",
    "an image of airplane",
    "this is a much longer caption with punctuation, numbers 123 and "
    "weird    spacing\tand unicode: café naïve",
    "",
]


def _ref_tokenizer():
    # reference tokenizer imports ftfy; stub it with a pass-through (our
    # implementation makes the same simplification)
    import sys, types, html

    if "ftfy" not in sys.modules:
        m = types.ModuleType("ftfy")
        m.fix_text = lambda s: html.unescape(html.unescape(s)).strip()
        sys.modules["ftfy"] = m
    tk = ref_oracle.load("open_clip.tokenizer")
    return tk


def test_tokenize_matches_reference():
    ref = _ref_tokenizer()
    ours = get_tokenizer()
    want = ref.tokenize(SAMPLES).numpy()
    got = ours(SAMPLES)
    np.testing.assert_array_equal(got, want.astype(np.int32))


def test_truncation_keeps_eot():
    ours = get_tokenizer()
    long = "word " * 200
    ids = ours([long])[0]
    assert ids[-1] == ours.eot_token
    assert ids[0] == ours.sot_token


def test_roundtrip_decode():
    ours = get_tokenizer()
    ids = ours.encode("a photo of a dog")
    assert ours.decode(ids).strip() == "a photo of a dog"
