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
    import sys, types
    import importlib.machinery

    if "ftfy" not in sys.modules:
        from vitlens_tpu.text.tokenizer import fix_text

        m = types.ModuleType("ftfy")
        # a real __spec__ so later importlib.util.find_spec("ftfy") probes
        # (e.g. transformers' import_utils) don't crash on the stub
        m.__spec__ = importlib.machinery.ModuleSpec("ftfy", loader=None)
        # emulate real ftfy with the package's default-pipeline reproduction
        # so token-exact parity holds on mojibake/width/quote inputs too
        m.fix_text = fix_text
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


def test_vocab_is_vendored():
    """The BPE vocab must resolve from inside the package (standalone
    deployments have no open_clip checkout on disk)."""
    import os

    import vitlens_tpu.text.tokenizer as T

    path = T.find_vocab_file()
    assert path.startswith(os.path.dirname(T.__file__)), path


def test_mojibake_repair():
    """_basic_clean approximates ftfy.fix_text's main repair: UTF-8 read as
    cp1252 (reference tokenizer.py:67-70 runs ftfy before BPE)."""
    from vitlens_tpu.text.tokenizer import _basic_clean

    assert _basic_clean("cafÃ©") == "café"
    # ftfy default uncurl_quotes=True straightens the repaired ’ as well
    assert _basic_clean("donâ€™t stop") == "don't stop"
    # nested (double-encoded) mojibake
    assert _basic_clean("cafÃƒÂ©") == "café"
    # legitimate accents must be left alone (no shrink possible)
    assert _basic_clean("Ãrsula lives in Münster") == "Ãrsula lives in Münster"
    assert _basic_clean("plain ascii") == "plain ascii"
    # tokenization of mojibake == tokenization of the clean text
    ours = get_tokenizer()
    np.testing.assert_array_equal(ours(["a cafÃ© photo"]),
                                  ours(["a café photo"]))


def test_ftfy_deep_encoding_repairs():
    """The deeper ftfy.fix_encoding heuristics (ftfy fixes.py):
    restore_byte_a0 (a mojibaked NBSP continuation byte squashed to plain
    space), decode_inconsistent_utf8 (mixed mojibake + genuine unicode
    blocks the whole-string round-trip; repair embedded runs), and lossy-
    sequence collapse (lead char + U+FFFD is unrecoverable)."""
    from vitlens_tpu.text.tokenizer import fix_text

    # "là?" -> UTF-8 C3 A0 3F -> cp1252 "Ã\xa0?" -> whitespace-normalised
    # "Ã ?": the space IS the lost NBSP continuation byte
    assert fix_text("quelque chose lÃ ?") == "quelque chose là?"
    assert fix_text("Ã bientÃ´t") == "àbientôt"  # == ftfy
    # mixed: ☕ can't encode to cp1252, so only the runs are repaired
    assert fix_text("cafÃ© ☕") == "café ☕"
    assert fix_text("cafÃ© donâ€™t ☕") == "café don't ☕"
    # 3-byte run embedded next to real unicode (constructed byte-exactly:
    # cp1252 leaves 0x81 undefined, so the mis-decode goes through latin-1)
    moji = "あり".encode("utf-8").decode("latin-1")
    assert fix_text(moji + " ☕") == "あり ☕"
    # lossy: a continuation byte already lost to U+FFFD collapses
    assert fix_text("cafÃ� x") == "caf� x"
    # guards: legitimate text with lead-like chars stays put
    assert fix_text("Ãrsula vs Münster ☕") == "Ãrsula vs Münster ☕"
    assert fix_text("A+ ça va? ☕") == "A+ ça va? ☕"


def test_ftfy_default_fixers():
    """fix_text reproduces the rest of ftfy.fix_text's DEFAULT fixer set
    (reference tokenizer.py:67-70), not just mojibake: character width,
    Latin ligatures, uncurl_quotes, C1 controls, terminal escapes, line
    breaks, surrogate pairs."""
    from vitlens_tpu.text.tokenizer import fix_text

    assert fix_text("ｆｕｌｌｗｉｄｔｈ ４２") == "fullwidth 42"
    # halfwidth katakana + halfwidth voiced mark compose under final NFC
    assert fix_text("ﾌﾞﾗｼﾞﾙ") == "ブラジル"
    assert fix_text("ideographic　space") == "ideographic space"
    assert fix_text("ﬁre ﬂow ﬆop") == "fire flow stop"
    assert fix_text("don’t say “hi”") == "don't say \"hi\""
    # C1 controls are cp1252 punctuation read through latin-1
    assert fix_text("smart \x93quotes\x94 and \x85") == 'smart "quotes" and …'
    assert fix_text("a\x1b[31mred\x1b[0mz") == "aredz"
    assert fix_text("l1\r\nl2\rl3 l4") == "l1\nl2\nl3\nl4"
    # UTF-16 surrogate pairs recombine; lone surrogates -> U+FFFD
    assert fix_text("x" + chr(0xD83D) + chr(0xDE00)) == "x😀"
    assert fix_text("x" + chr(0xDC00)) == "x�"
    # tokenization sees the normalized form
    ours = get_tokenizer()
    np.testing.assert_array_equal(ours(["don’t ｓｔｏｐ"]), ours(["don't stop"]))


def test_clean_control_chars_and_nfc():
    """ftfy.fix_text defaults also strip control chars and NFC-normalize;
    _basic_clean reproduces both (reference tokenizer.py:67-70)."""
    from vitlens_tpu.text.tokenizer import _basic_clean

    assert _basic_clean("a\x00b\x07c") == "abc"
    assert _basic_clean("keep\ttabs and\nnewlines") == "keep\ttabs and\nnewlines"
    # NFC: decomposed e + combining acute -> precomposed é
    assert _basic_clean("café") == "café"
    ours = get_tokenizer()
    np.testing.assert_array_equal(ours(["café"]), ours(["café"]))


def test_hf_tokenizer_wrapper(tmp_path):
    """HFTokenizer (reference open_clip tokenizer.py HFTokenizer): pads and
    truncates to context_length, int32 ids — verified against a local
    save_pretrained tokenizer (no network)."""
    import pytest

    transformers = pytest.importorskip("transformers")

    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
             "hello", "world", "deep", "net"]
    (tmp_path / "vocab.txt").write_text("\n".join(vocab))
    tok = transformers.BertTokenizerFast(vocab_file=str(tmp_path / "vocab.txt"))
    tok.save_pretrained(str(tmp_path / "tok"))

    from vitlens_tpu.text.tokenizer import HFTokenizer, get_tokenizer

    h = HFTokenizer(str(tmp_path / "tok"))
    ids = h(["hello world", "deep"], context_length=8)
    assert ids.shape == (2, 8) and ids.dtype == np.int32
    want = tok(["hello world", "deep"], padding="max_length",
               truncation=True, max_length=8,
               return_tensors="np")["input_ids"]
    np.testing.assert_array_equal(ids, want)

    # get_tokenizer dispatch + clear offline gating error
    assert isinstance(
        get_tokenizer(hf_tokenizer_name=str(tmp_path / "tok")), HFTokenizer)
    with pytest.raises(RuntimeError, match="tokenizer"):
        HFTokenizer(str(tmp_path / "definitely-not-there"))


def test_mojibake_badness_guard():
    """Shrink alone is not acceptance: a valid-but-garbage re-decode that
    splices a rare-script letter into a Latin word is rejected (ftfy's
    badness model's role). All three reproduce real false positives of the
    shrink-only rule (0xDF lead + NBSP/C1 continuation)."""
    from vitlens_tpu.text.tokenizer import fix_text

    # NBSP after ß: whole-string re-decode 0xDF 0xA0 -> U+07E0 would shrink
    # (NBSP itself is later collapsed by the tokenizer's whitespace_clean)
    assert fix_text("weiß\xa0nicht") == "weiß\xa0nicht"
    assert fix_text("grüß\xa0Gott ☕") == "grüß\xa0Gott ☕"  # per-run path
    assert fix_text("heiß™") == "heiß™"
    # ...while genuine multi-script mojibake still repairs
    assert fix_text("Ð¿Ñ€Ð¸Ð²ÐµÑ‚ world") == "привет world"
    assert fix_text("Î±Î²Î³") == "αβγ"
