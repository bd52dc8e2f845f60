"""Native C++ pipeline components vs their Python references."""

import numpy as np
import pytest

from mdhs_tpu import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def test_native_resize_matches_pil():
    from PIL import Image

    from mdhs_tpu.data.datasets import _resize_center_square

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (97, 143, 3), np.uint8)
    ref = np.asarray(_resize_center_square(Image.fromarray(img), 64), np.uint8)
    ours = native.resize_center_square(img, 64)
    assert ours.shape == ref.shape == (64, 64, 3)
    diff = np.abs(ours.astype(int) - ref.astype(int))
    # same triangle filter; tiny rounding differences allowed
    assert np.mean(diff) < 1.0 and np.percentile(diff, 99) <= 2, (
        diff.mean(), diff.max()
    )


def test_native_wordpiece_matches_python(tmp_path):
    from mdhs_tpu.data.tokenizer import WordPieceTokenizer

    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
             "the", "image", "shows", "a", "melanoma", "lesion", "##s",
             "le", "##sion", ",", ".", "border"]
    vp = tmp_path / "vocab.txt"
    vp.write_text("\n".join(vocab) + "\n")

    py = WordPieceTokenizer.from_vocab_file(str(vp))
    cc = native.NativeWordPiece(str(vp))
    assert cc.vocab_size == py.vocab_size

    for text in [
        "The image shows a melanoma lesion.",
        "lesions, borders",
        "",
        "unknownword here",
        "THE IMAGE",
    ]:
        pi, pm = py.encode(text, 16)
        ci, cm = cc.encode(text, 16)
        np.testing.assert_array_equal(pi, ci, err_msg=text)
        np.testing.assert_array_equal(pm, cm, err_msg=text)


def test_native_wordpiece_duplicate_vocab_lines(tmp_path):
    """Duplicate vocab lines: both implementations must agree (last id wins,
    HF load_vocab behavior) and report vocab_size = max id + 1, so embedding
    tables sized from vocab_size always cover every emitted id."""
    from mdhs_tpu.data.tokenizer import WordPieceTokenizer

    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
             "dup", "alpha", "dup", "omega"]  # "dup" appears at ids 5 and 7
    vp = tmp_path / "vocab.txt"
    vp.write_text("\n".join(vocab) + "\n")

    py = WordPieceTokenizer.from_vocab_file(str(vp))
    cc = native.NativeWordPiece(str(vp))
    assert py.vocab_size == cc.vocab_size == len(vocab)

    pi, _ = py.encode("dup alpha omega", 8)
    ci, _ = cc.encode("dup alpha omega", 8)
    np.testing.assert_array_equal(pi, ci)
    assert 7 in list(pi[:4])  # last duplicate id wins
    assert max(pi) < py.vocab_size and max(ci) < cc.vocab_size
