"""1-byte fieldnorm quantization (Lucene ``SmallFloat`` int4 scheme).

tantivy 0.17 — the index library the reference builds on
(reference: quickwit-indexing/Cargo.toml:37 pins tantivy 0.17) —
stores each document's per-field token count ("fieldnorm") quantized
to one byte using the same scheme as Lucene's
``SmallFloat.intToByte4`` / ``byte4ToInt``: values 0..=7 are stored
verbatim ("subnormal"), larger values keep a leading-1 + 3-bit
mantissa and a shifted exponent, and the whole byte range is offset
by 24 free low values so 0..=39 round-trip exactly.

BM25 scores are computed from the DECODED (lossy) fieldnorm, so
replicating this table is required for score equality with the
reference (SURVEY.md §4.3 item 2).

Public-knowledge basis: Lucene ``SmallFloat`` (Apache-2.0, documented
algorithm) and tantivy-0.17's published fieldnorm code semantics.
"""

from __future__ import annotations

import numpy as np

_NUM_FREE_VALUES = 24  # 255 - long_to_int4(i32::MAX) == 255 - 231


def _long_to_int4(value: int) -> int:
    if value < 0:
        raise ValueError("negative fieldnorm")
    num_bits = value.bit_length()
    if num_bits < 4:
        return value
    shift = num_bits - 4
    encoded = (value >> shift) & 0x07
    encoded |= (shift + 1) << 3
    return encoded


def _int4_to_long(encoded: int) -> int:
    bits = encoded & 0x07
    shift = (encoded >> 3) - 1
    if shift == -1:
        return bits
    return (bits | 0x08) << shift


def _build_table() -> np.ndarray:
    out = np.empty(256, dtype=np.uint64)
    for byte in range(256):
        if byte < _NUM_FREE_VALUES:
            out[byte] = byte
        else:
            out[byte] = _NUM_FREE_VALUES + _int4_to_long(byte - _NUM_FREE_VALUES)
    return out


#: FIELD_NORMS_TABLE[id] -> decoded fieldnorm (monotone increasing).
FIELD_NORMS_TABLE: np.ndarray = _build_table()


def fieldnorm_to_id(fieldnorm: np.ndarray | int) -> np.ndarray:
    """Quantize token counts to 1-byte ids (floor to table entry).

    Vectorized: ``searchsorted(side='right') - 1`` == the reference's
    binary-search-floor semantics.
    """
    arr = np.asarray(fieldnorm, dtype=np.uint64)
    ids = np.searchsorted(FIELD_NORMS_TABLE, arr, side="right") - 1
    return ids.astype(np.uint8)


def id_to_fieldnorm(norm_id: np.ndarray | int) -> np.ndarray:
    """Decode 1-byte ids back to (lossy) fieldnorms."""
    return FIELD_NORMS_TABLE[np.asarray(norm_id, dtype=np.int64)]


def fieldnorm_id_col(len_col):
    """JVM column expression equal to :func:`fieldnorm_to_id` —
    keeps the docmap stage inside whole-stage codegen (no python
    workers just to quantize a length byte).

    Closed form of the floor-quantization: with ``v = L - 24``,

    - ``L < 32`` → ``id = L`` (the 24 free values plus the int4
      subnormals 0..7 all round-trip exactly);
    - else ``shift = bitlen(v) - 4`` and
      ``id = 24 + ((shift + 1) << 3) + ((v >> shift) & 7)`` — the
      top-4-bits truncation IS the largest-table-entry-≤-L floor.

    ``bitlen(v) = floor(log2(v)) + 1`` is exact in doubles for the
    int range (< 2^53): log2 of an exact power of two is exact, and
    anything else is strictly between integers.
    """
    from pyspark.sql import functions as F

    L = len_col.cast("long")
    v = L - F.lit(24)
    shift = (F.floor(F.log2(v.cast("double"))) - F.lit(3)).cast("int")
    bits = F.call_function("shiftright", v, shift).bitwiseAND(F.lit(7))
    encoded = F.lit(24) + (shift + F.lit(1)) * F.lit(8) + bits
    # clamp: lengths >= 2^31+24 would encode past the 256-entry table
    # (fieldnorm_to_id saturates at id 255; mirror that here)
    encoded = F.least(encoded, F.lit(255))
    return F.when(L < 32, L).otherwise(encoded).cast("int")
