"""Tokenizer differential vs transformers.BertTokenizer (offline).

The reference tokenizes with HF's BertTokenizer (data_loader.py:294-302,336;
dataset_spine.py:88; pl_datset.py collate). HF's slow BertTokenizer is
constructible from a local vocab file with no hub access, so this pins our
WordPieceTokenizer (and the C++ NativeWordPiece) to HF ids/mask over the
BasicTokenizer edge semantics: punctuation runs, CJK isolation (interacts
with MIBF clean_cjk), accent stripping, mixed case, >100-char UNK words,
whitespace/control chars, empty strings, truncation + padding.
"""

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")
from transformers import BertTokenizer  # noqa: E402

from mdhs_tpu.data.tokenizer import WordPieceTokenizer  # noqa: E402

VOCAB = [
    "[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
    "the", "image", "shows", "a", "melanoma", "lesion", "##s", "le",
    "##sion", ",", ".", "!", "?", "-", "(", ")", "'",
    "un", "##aff", "##able", "##ward", "hello", "world", "cafe", "naive",
    "resume", "border", "irregular", "x", "##x", "1", "##2", "12", "中",
    "文", "斑", "skin", "der", "##mo", "##scopy", "color", "##ful",
    "δ", "ss", "москва", "ist", "μg", "weiss",
]

TEXTS = [
    "The image shows a melanoma lesion.",
    "Hello, WORLD!!! unaffable",
    "café Café CAFÉ naïve résumé",          # accent stripping
    "a,b..c!?d (irregular-border)",          # punctuation runs
    "中文斑 the 中 lesion",                    # CJK isolation
    "皮肤镜 unknown 汉字",                     # CJK chars not in vocab -> [UNK]s
    "x" * 150 + " hello",                    # >100-char word -> [UNK]
    "",                                      # empty
    "   ",                                   # whitespace only
    "  multiple   spaces\t\ttabs\nnewlines  hello ",
    "x xx xxx 1 12 122",                     # greedy longest-match-first
    "lesions lesion le unward",
    "hello \x00 world � again",         # control/replacement chars
    "dermoscopy colorful skin " * 20,        # truncation
    # Beyond the C tokenizer's Latin repertoire: these route NativeWordPiece
    # to its full-unicodedata Python fallback (see native._native_tokenizer_safe)
    "Δ hello ΔΔ",                            # Greek uppercase -> δ
    "Москва МОСКВА hello",                   # Cyrillic case folding
    "Ǎ ǎ hello",                             # Latin Ext-B NFD -> a
    "hello\u2028world hello\u2029again",     # Zl/Zp: NOT whitespace in HF
    "İstanbul hello",                        # dotted capital I (Ext-A edge)
    "cafe\u0301 nai\u0308ve",                # DECOMPOSED accents (NFD input)
    "\u2126hm hello \u212bngstrom",          # OHM/ANGSTROM compatibility chars
    "hello\u00a0world\u2009again",           # NBSP + thin space (Zs)
    # Cross-block lowercasing inside the Latin-1/Ext-A range: \u00b5\u2192\u03bc (U+03BC)
    # and \u017f\u2192s. The native safe-gate must route these to the Python fallback
    # even though both codepoints sit below 0x180.
    "5\u00b5g hello",                        # MICRO SIGN: \u00b5g -> \u03bcg
    "wei\u017f\u017f hello \u017fs",         # LONG S: wei\u017f\u017f -> weiss, \u017fs -> ss
]


@pytest.fixture(scope="module")
def vocab_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("vocab") / "vocab.txt"
    p.write_text("\n".join(VOCAB) + "\n", encoding="utf-8")
    return str(p)


@pytest.fixture(scope="module")
def hf_tok(vocab_file):
    return BertTokenizer(vocab_file=vocab_file, do_lower_case=True)


def hf_encode(hf, text, max_length):
    enc = hf(
        text, max_length=max_length, padding="max_length", truncation=True,
        return_tensors="np",
    )
    return enc["input_ids"][0].astype(np.int32), enc["attention_mask"][0].astype(np.int32)


@pytest.mark.parametrize("max_length", [16, 64])
def test_python_wordpiece_matches_hf(vocab_file, hf_tok, max_length):
    ours = WordPieceTokenizer.from_vocab_file(vocab_file)
    for text in TEXTS:
        ref_ids, ref_mask = hf_encode(hf_tok, text, max_length)
        got_ids, got_mask = ours.encode(text, max_length=max_length)
        np.testing.assert_array_equal(got_ids, ref_ids, err_msg=repr(text))
        np.testing.assert_array_equal(got_mask, ref_mask, err_msg=repr(text))


def test_native_wordpiece_matches_hf(vocab_file, hf_tok):
    from mdhs_tpu import native

    if not native.available():
        pytest.skip("native library unavailable")
    cc = native.NativeWordPiece(vocab_file)
    for text in TEXTS:
        ref_ids, ref_mask = hf_encode(hf_tok, text, 48)
        got_ids, got_mask = cc.encode(text, max_length=48)
        np.testing.assert_array_equal(got_ids, ref_ids, err_msg=repr(text))
        np.testing.assert_array_equal(got_mask, ref_mask, err_msg=repr(text))
