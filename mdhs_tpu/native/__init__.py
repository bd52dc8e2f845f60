"""ctypes bindings for the native C++ host pipeline (native/*.cpp).

Provides:
- resize_center_square(img_u8, size): antialiased canvas resize+crop
  (PIL-BILINEAR-equivalent triangle filter)
- NativeWordPiece: vocab.txt WordPiece tokenizer

The library auto-builds with g++ on first use; every entry point degrades
gracefully to the pure-Python implementations when the toolchain or .so is
unavailable, so nothing here is a hard dependency.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

log = logging.getLogger(__name__)

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libmdhs_native.so"))
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", os.path.abspath(_NATIVE_DIR)],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception as exc:  # toolchain missing, etc.
        log.info("native build skipped: %s", exc)
        return False


def get_lib():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) and os.path.isdir(_NATIVE_DIR):
            _build()
        if not os.path.exists(_LIB_PATH):
            return None
        lib = ctypes.CDLL(_LIB_PATH)
        lib.resize_center_square_u8.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
        ]
        lib.resize_u8.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
            ctypes.c_int,
        ]
        lib.wp_create.restype = ctypes.c_void_p
        lib.wp_create.argtypes = [ctypes.c_char_p, ctypes.c_int]
        lib.wp_free.argtypes = [ctypes.c_void_p]
        lib.wp_vocab_size.argtypes = [ctypes.c_void_p]
        lib.wp_vocab_size.restype = ctypes.c_int
        lib.wp_encode.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.wp_encode.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def resize_center_square(img: np.ndarray, size: int) -> np.ndarray | None:
    """uint8 HWC (or HW) image -> (size, size, C). None if native unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    img = np.ascontiguousarray(img, np.uint8)
    h, w, c = img.shape
    out = np.empty((size, size, c), np.uint8)
    lib.resize_center_square_u8(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, c,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), size,
    )
    return out[..., 0] if squeeze else out


# Codepoints the C BasicTokenizer provably handles with HF semantics
# (ASCII, Latin-1, Latin Ext-A, combining marks, Zs spaces, common
# typographic punctuation, HF's CJK ideograph ranges). Texts containing
# anything else (Greek/Cyrillic case folding, Latin Ext-B decompositions,
# Zl/Zp separators, exotic Cf controls...) are routed per-call to the
# full-unicodedata Python tokenizer so the native fast path can never
# silently diverge from transformers.BertTokenizer.
_SAFE_SINGLES = frozenset(
    {0xA0, 0x1680, 0x2013, 0x2014, 0x2018, 0x2019, 0x201C, 0x201D,
     0x2026, 0x202F, 0x205F, 0x3000, 0x3001, 0x3002}
    | set(range(0x300C, 0x3010))  # 「」『』corner brackets (Ps/Pe)
)


def _native_tokenizer_safe(text: str) -> bool:
    for ch in text:
        cp = ord(ch)
        # 0xB5 (µ) and 0x17F (ſ) lowercase CROSS-BLOCK in Python/HF
        # (µ→μ U+03BC, ſ→s) while the C latin_lower table keeps them
        # in-block — route those texts to the Python fallback.
        if cp == 0xB5 or cp == 0x17F:
            return False
        if cp < 0x180 or 0x300 <= cp <= 0x36F or 0x2000 <= cp <= 0x200A:
            continue
        if (0x4E00 <= cp <= 0x9FFF or 0x3400 <= cp <= 0x4DBF
                or 0xF900 <= cp <= 0xFAFF or 0x20000 <= cp <= 0x2A6DF):
            continue
        if cp not in _SAFE_SINGLES:
            return False
    return True


class NativeWordPiece:
    """Drop-in encode() compatible with data.tokenizer.WordPieceTokenizer."""

    def __init__(self, vocab_path: str, lowercase: bool = True):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self._h = lib.wp_create(vocab_path.encode(), int(lowercase))
        if not self._h:
            raise FileNotFoundError(vocab_path)
        self.vocab_size = lib.wp_vocab_size(self._h)
        self.pad_id = 0
        self._vocab_path = vocab_path
        self._lowercase = lowercase
        self._py = None  # lazy full-fidelity fallback

    def _python_fallback(self):
        if self._py is None:
            from ..data.tokenizer import WordPieceTokenizer

            self._py = WordPieceTokenizer.from_vocab_file(
                self._vocab_path, self._lowercase
            )
        return self._py

    def encode(self, text: str, max_length: int = 128):
        if text and not _native_tokenizer_safe(text):
            return self._python_fallback().encode(text, max_length)
        ids = np.empty(max_length, np.int32)
        mask = np.empty(max_length, np.int32)
        # NULs would truncate the C string at strlen; HF's _clean_text
        # removes them anyway, so stripping host-side is semantics-neutral.
        self._lib.wp_encode(
            self._h,
            (text or "").replace("\x00", "").encode("utf-8", errors="ignore"),
            max_length,
            ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            mask.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        )
        return ids, mask

    def encode_batch(self, texts, max_length: int = 128):
        pairs = [self.encode(t, max_length) for t in texts]
        return np.stack([p[0] for p in pairs]), np.stack([p[1] for p in pairs])

    def __del__(self):
        try:
            if getattr(self, "_h", None):
                self._lib.wp_free(self._h)
        except Exception:
            pass
