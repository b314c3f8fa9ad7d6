"""SmallFloat 3.15 norm quantization (Lucene's floatToByte315/byte315ToFloat).

The reference stores one norm byte per doc/field: the float32 value
``1/sqrt(fieldLength)`` truncated to a 3-bit mantissa / 5-bit exponent
byte with zero exponent point 15 (core/util/smallFloat.go:15,
core/search/search.go:486-507).  BM25 then *decodes* that byte back to
a quantized doc length ``1/f^2``.  Rank-identity with the reference
requires reproducing this quantization exactly, so both the engine and
the NumPy oracle share these functions.

Vectorized NumPy; no Spark dependency.
"""

from __future__ import annotations

import numpy as np

_EXP_SHIFT = 24 - 3          # float32 mantissa 23 bits -> keep top 3
_ZERO_POINT = (63 - 15) << 3  # exponent re-bias


def float_to_byte315(f: np.ndarray) -> np.ndarray:
    """float32 array -> uint8 norm bytes (truncating encode)."""
    f = np.asarray(f, dtype=np.float32)
    bits = f.view(np.int32)
    small = bits >> _EXP_SHIFT
    out = (small - _ZERO_POINT).astype(np.int64)
    out = np.where(small <= _ZERO_POINT, np.where(bits <= 0, 0, 1), out)
    out = np.where(small >= _ZERO_POINT + 0x100, 0xFF, out)
    return out.astype(np.uint8)


def byte315_to_float(b: np.ndarray) -> np.ndarray:
    """uint8 norm bytes -> float32 values (exact decode table semantics)."""
    b = np.asarray(b, dtype=np.uint8).astype(np.int32)
    bits = (b << _EXP_SHIFT) + (_ZERO_POINT << _EXP_SHIFT)
    out = bits.astype(np.int32).view(np.float32).copy()
    out[b == 0] = 0.0
    return out


# 256-entry decode table (search.go:446-454 builds the same table once)
NORM_TABLE: np.ndarray = byte315_to_float(np.arange(256, dtype=np.uint8))


def encode_norm_from_length(length: np.ndarray, boost=1.0) -> np.ndarray:
    """norm byte for a doc of `length` tokens: byte315(boost/sqrt(length)).
    ``boost`` is a scalar or a per-doc array (index-time field/doc boost,
    core/search/search.go:499-507 lengthNorm = boost/sqrt(length)).
    Zero-length docs encode boost/sqrt(0)=inf -> byte 255 per the float
    pipeline; Lucene never writes norms for empty fields, we keep 0."""
    length = np.asarray(length, dtype=np.float64)
    with np.errstate(divide="ignore"):
        f = np.where(length > 0, boost / np.sqrt(length), 0.0).astype(np.float32)
    return float_to_byte315(f)


def quantized_doc_length(norm_byte: np.ndarray) -> np.ndarray:
    """BM25's view of the norm byte: decoded dl = 1/f^2 (float32 math),
    as used by BM25Similarity's norm cache.  Returns float32."""
    f = byte315_to_float(norm_byte)
    with np.errstate(divide="ignore"):
        dl = np.where(f > 0, (np.float32(1.0) / (f * f)), np.float32(0.0))
    return dl.astype(np.float32)
