"""Posting-list codec: delta-gap + variable-byte blocks with skip data.

Format (our own, designed for Parquet cells; capability parity with
the tantivy-0.17 segment postings the reference drives — delta-packed
doc blocks of 128 with skip info `[tantivy]`, SURVEY.md §2.4):

A posting list for one ``(split, field, term)`` is stored as binary
columns:

- ``doc_bytes``   — varbyte stream of doc-id gaps. The first value is
  the absolute first doc id; within a block, gaps are vs the previous
  doc; the first gap of block k is vs the last doc of block k-1, so a
  block is independently decodable given the skip table.
- ``tf_bytes``    — varbyte stream of term frequencies (parallel).
- ``skip_bytes``  — per block of 128 docs, fixed-width little-endian:
  ``last_doc u32 | max_tf u32 | doc_off u32 | tf_off u32 | count u32``
  (byte offsets into the two streams → block-max WAND can decode only
  surviving blocks).
- ``pos_bytes``   — optional positions stream: per doc, ``tf`` values
  of delta-gapped token positions (first absolute). Needed only for
  ``record: position`` fields (phrase queries).

Everything here is vectorized numpy — called from Arrow-batched
pandas UDFs, never per row in Python.
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128
SKIP_ENTRY_WORDS = 5  # last_doc, max_tf, doc_off, tf_off, count


def varbyte_encode(values: np.ndarray) -> bytes:
    """LEB128-style varbyte (7 data bits, high bit = continuation)."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    nbytes = np.ones(v.size, dtype=np.int64)
    tmp = v >> np.uint64(7)
    while tmp.any():
        nbytes += tmp > 0
        tmp = tmp >> np.uint64(7)
    ends = np.cumsum(nbytes)
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    idx = ends - nbytes
    rem = v.copy()
    active = np.ones(v.size, dtype=bool)
    while active.any():
        byte = (rem & np.uint64(0x7F)).astype(np.uint8)
        rem = rem >> np.uint64(7)
        more = rem > 0
        out[idx[active]] = byte[active] | (more[active].astype(np.uint8) << 7)
        idx = idx + 1
        active = active & more
    return out.tobytes()


def varbyte_decode(buf: bytes | np.ndarray, count: int | None = None) -> np.ndarray:
    """Decode a varbyte stream to uint64 values.

    Hot path of every posting/position read. Posting gaps and
    position deltas are overwhelmingly single-byte, so the decode is
    structured around that: a pure single-byte stream is one cast,
    and mixed streams pay one masked-gather pass per byte WIDTH
    (≤10 for u64, ~2-3 in practice) instead of an
    ``np.add.reduceat`` over every byte (~6x slower measured on the
    sf1 positions stream)."""
    arr = np.frombuffer(buf, dtype=np.uint8) if isinstance(buf, (bytes, bytearray, memoryview)) else buf
    if arr.size == 0:
        return np.empty(0, dtype=np.uint64)
    cont = (arr & 0x80) != 0
    if not cont.any():
        values = arr.astype(np.uint64)
        if count is not None and values.size != count:
            raise ValueError(f"decoded {values.size} values, expected {count}")
        return values
    # a byte starts a value iff the previous byte terminated one
    starts = np.flatnonzero(np.concatenate(([True], ~cont[:-1])))
    low7 = (arr & 0x7F).astype(np.uint64)
    values = low7[starts].copy()
    lens = np.diff(np.append(starts, arr.size))
    for k in range(1, int(lens.max())):
        m = lens > k
        values[m] |= low7[starts[m] + k] << np.uint64(7 * k)
    if count is not None and values.size != count:
        raise ValueError(f"decoded {values.size} values, expected {count}")
    return values


def _varbyte_lengths(values: np.ndarray) -> np.ndarray:
    v = np.asarray(values, dtype=np.uint64)
    nbytes = np.ones(v.size, dtype=np.int64)
    tmp = v >> np.uint64(7)
    while tmp.any():
        nbytes += tmp > 0
        tmp = tmp >> np.uint64(7)
    return nbytes


def encode_posting_list(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    positions: list[np.ndarray] | None = None,
) -> dict[str, bytes]:
    """Encode one sorted posting list into the binary columns.

    ``doc_ids`` must be strictly increasing. ``positions`` (optional)
    is a per-doc array of strictly increasing token positions whose
    lengths equal ``tfs``.
    """
    doc_ids = np.asarray(doc_ids, dtype=np.uint64)
    tfs = np.asarray(tfs, dtype=np.uint64)
    n = doc_ids.size
    gaps = np.empty(n, dtype=np.uint64)
    if n:
        gaps[0] = doc_ids[0]
        np.subtract(doc_ids[1:], doc_ids[:-1], out=gaps[1:])

    doc_lens = _varbyte_lengths(gaps)
    tf_lens = _varbyte_lengths(tfs)
    doc_ends = np.cumsum(doc_lens)
    tf_ends = np.cumsum(tf_lens)

    n_blocks = (n + BLOCK_SIZE - 1) // BLOCK_SIZE
    skip = np.zeros((n_blocks, SKIP_ENTRY_WORDS), dtype=np.uint32)
    for b in range(n_blocks):
        lo = b * BLOCK_SIZE
        hi = min(lo + BLOCK_SIZE, n)
        skip[b, 0] = doc_ids[hi - 1]
        skip[b, 1] = tfs[lo:hi].max()
        skip[b, 2] = doc_ends[lo - 1] if lo else 0
        skip[b, 3] = tf_ends[lo - 1] if lo else 0
        skip[b, 4] = hi - lo

    out = {
        "doc_bytes": varbyte_encode(gaps),
        "tf_bytes": varbyte_encode(tfs),
        "skip_bytes": skip.astype("<u4").tobytes(),
    }
    if positions is not None:
        flat = []
        for p in positions:
            p = np.asarray(p, dtype=np.uint64)
            g = np.empty(p.size, dtype=np.uint64)
            if p.size:
                g[0] = p[0]
                np.subtract(p[1:], p[:-1], out=g[1:])
            flat.append(g)
        allg = np.concatenate(flat) if flat else np.empty(0, dtype=np.uint64)
        out["pos_bytes"] = varbyte_encode(allg)
    return out


def decode_posting_list(
    doc_bytes: bytes, tf_bytes: bytes, count: int
) -> tuple[np.ndarray, np.ndarray]:
    """Decode the full list → (doc_ids uint64 ascending, tfs uint64)."""
    gaps = varbyte_decode(doc_bytes, count)
    doc_ids = np.cumsum(gaps, dtype=np.uint64)
    tfs = varbyte_decode(tf_bytes, count)
    return doc_ids, tfs


def decode_skip(skip_bytes: bytes) -> np.ndarray:
    """Skip table as an (n_blocks, 5) uint32 array
    (last_doc, max_tf, doc_off, tf_off, count)."""
    arr = np.frombuffer(skip_bytes, dtype="<u4")
    return arr.reshape(-1, SKIP_ENTRY_WORDS)


def decode_blocks(
    doc_bytes: bytes,
    tf_bytes: bytes,
    skip: np.ndarray,
    block_mask: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """Decode only the blocks selected by ``block_mask``.

    Returns (doc_ids, tfs) for the surviving blocks. Core of block-max
    skipping: non-surviving blocks' bytes are never touched.
    """
    doc_arr = np.frombuffer(doc_bytes, dtype=np.uint8)
    tf_arr = np.frombuffer(tf_bytes, dtype=np.uint8)
    n_blocks = skip.shape[0]
    docs_out: list[np.ndarray] = []
    tfs_out: list[np.ndarray] = []
    for b in np.flatnonzero(block_mask):
        doc_off = int(skip[b, 2])
        tf_off = int(skip[b, 3])
        cnt = int(skip[b, 4])
        doc_end = int(skip[b + 1, 2]) if b + 1 < n_blocks else doc_arr.size
        tf_end = int(skip[b + 1, 3]) if b + 1 < n_blocks else tf_arr.size
        gaps = varbyte_decode(doc_arr[doc_off:doc_end], cnt)
        base = np.uint64(skip[b - 1, 0]) if b else np.uint64(0)
        docs = np.cumsum(gaps, dtype=np.uint64) + base
        docs_out.append(docs)
        tfs_out.append(varbyte_decode(tf_arr[tf_off:tf_end], cnt))
    if not docs_out:
        return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.uint64)
    return np.concatenate(docs_out), np.concatenate(tfs_out)


def _varbyte_decode_i32_sparse(arr: np.ndarray, count: int) -> np.ndarray:
    """uint8 varbyte stream → int32 values, optimized for streams
    whose values are almost all single-byte (position gaps: measured
    multi-byte fraction ~0.04%% on the sf1 corpus). One compress pass
    builds the output from terminal bytes; the few multi-byte runs
    are folded in with small gathers. The phrase kernel is memory-
    bandwidth-bound, so int32 output (half the traffic of the generic
    uint64 decoder) is the point, not a nicety."""
    if arr.size == 0:
        if count:
            raise ValueError(f"decoded 0 values, expected {count}")
        return np.empty(0, dtype=np.int32)
    cont = arr >= 128
    mb = np.flatnonzero(cont)
    if mb.size == 0:
        out = arr.astype(np.int32)
        if out.size != count:
            raise ValueError(f"decoded {out.size} values, expected {count}")
        return out
    out = arr[~cont].astype(np.int32)
    if out.size != count:
        raise ValueError(f"decoded {out.size} values, expected {count}")
    # multi-byte values = runs of continuation bytes + their terminal;
    # runs never span values (a value's last byte clears the cont bit)
    new_run = np.concatenate(([True], np.diff(mb) != 1))
    run_start = mb[new_run]
    run_last = mb[np.concatenate((new_run[1:], [True]))]
    term = run_last + 1  # terminal byte right after the run
    width = term - run_start  # continuation bytes per value
    vals = np.zeros(run_start.size, dtype=np.int64)
    for o in range(int(width.max()) + 1):
        sel = width >= o
        b = arr[run_start[sel] + o].astype(np.int64)
        vals[sel] += (b & 0x7F) << (7 * o)
    if vals.size and int(vals.max()) > np.iinfo(np.int32).max:
        raise ValueError("varbyte value exceeds int32 range")
    # slot of each terminal among the non-continuation bytes
    out[term - np.searchsorted(mb, term)] = vals.astype(np.int32)
    return out


def decode_positions_flat(
    pos_bytes: bytes, tfs: np.ndarray
) -> np.ndarray:
    """Absolute positions of EVERY doc as one flat int32 array
    (segment i = doc i's ``tfs[i]`` positions). The dense-phrase path:
    when most docs of a term survive the intersection, decoding the
    whole stream (no per-doc byte-range gather) is far cheaper than
    ``decode_positions_selected``'s selective gather."""
    tfs = np.asarray(tfs, dtype=np.int64)
    total = int(tfs.sum())
    arr = np.frombuffer(pos_bytes, dtype=np.uint8)
    gaps = _varbyte_decode_i32_sparse(arr, total)
    if total == 0:
        return gaps
    seg = np.cumsum(tfs) - tfs
    if int(np.sum(gaps, dtype=np.int64)) <= np.iinfo(np.int32).max:
        c = np.cumsum(gaps, dtype=np.int32)
        base = np.repeat(c[seg] - gaps[seg], tfs)
        return c - base
    # gap mass overflows a running int32 total (huge split) — widen
    # the cumsum; per-doc absolute positions still fit int32
    c = np.cumsum(gaps, dtype=np.int64)
    base = np.repeat(c[seg] - gaps[seg].astype(np.int64), tfs)
    return (c - base).astype(np.int32)


def decode_positions(
    pos_bytes: bytes, tfs: np.ndarray
) -> list[np.ndarray]:
    """Decode the positions stream into one array per doc."""
    total = int(np.asarray(tfs, dtype=np.int64).sum())
    flat = varbyte_decode(pos_bytes, total)
    out: list[np.ndarray] = []
    off = 0
    for tf in np.asarray(tfs, dtype=np.int64):
        seg = flat[off : off + tf]
        out.append(np.cumsum(seg, dtype=np.uint64))
        off += tf
    return out


def _ragged_gather(offs: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Flat indices selecting ranges [offs[i], offs[i]+lens[i]) in
    order — the standard vectorized ragged slice."""
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    seg_starts = np.cumsum(lens) - lens
    return np.arange(total, dtype=np.int64) - np.repeat(seg_starts, lens) + np.repeat(
        offs, lens
    )


def position_byte_ranges(
    p_val: np.ndarray,
    valid_rows: np.ndarray,
    ttf: np.ndarray,
    tfs: np.ndarray,
    dfreq: np.ndarray,
    row_ent: np.ndarray,
    row_of_entry: np.ndarray,
    total: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Per-entry ``[lo, len)`` byte ranges of each doc's positions
    slice within one flattened positions stream.

    Each doc's positions are a SELF-CONTAINED byte slice (the first
    gap is absolute per doc), so posting merges/rewrites can permute
    raw byte ranges without decoding. Shared by the map-side partial
    merger (build._make_partial_merger) and the demux/sorted-merge
    rewrite (merge.remap_postings_arrow) — the slicing invariant
    (varbyte continuation-bit boundaries vs total_tf accounting) must
    stay identical on both paths or merged position streams corrupt.

    Inputs: ``p_val`` flat uint8 positions bytes of all valid rows
    concatenated; ``valid_rows`` bool per posting row; ``ttf`` int64
    total_tf per row; ``tfs`` int64 per entry; ``dfreq`` int64
    doc_freq per row; ``row_ent`` int64 prefix starts per row (so
    ``row_ent[:-1]`` indexes each row's first entry);
    ``row_of_entry`` int64 owning row per entry; ``total`` entry
    count. Fails loudly when the byte stream's value count disagrees
    with the total_tf accounting."""
    tfs = np.asarray(tfs).astype(np.int64, copy=False)
    val_cnt = np.where(valid_rows, ttf, 0).astype(np.int64)
    val_base = np.cumsum(val_cnt) - val_cnt
    cont = (p_val & 0x80) != 0
    val_starts = (
        np.flatnonzero(np.concatenate(([True], ~cont[:-1])))
        if p_val.size
        else np.empty(0, dtype=np.int64)
    )
    if val_starts.size != int(val_cnt.sum()):
        raise ValueError(
            f"positions stream holds {val_starts.size} values, "
            f"total_tf of position rows sums to {int(val_cnt.sum())}"
        )
    byte_bound = np.append(val_starts, p_val.size).astype(np.int64)
    excg = np.cumsum(tfs) - tfs
    vstart = val_base[row_of_entry] + (
        excg - np.repeat(excg[row_ent[:-1]], dfreq)
    )
    ent_valid = valid_rows[row_of_entry]
    b_lo = np.zeros(total, dtype=np.int64)
    b_len = np.zeros(total, dtype=np.int64)
    iv = np.flatnonzero(ent_valid)
    b_lo[iv] = byte_bound[vstart[iv]]
    b_len[iv] = byte_bound[vstart[iv] + tfs[iv]] - b_lo[iv]
    return b_lo, b_len


def decode_positions_selected(
    pos_bytes: bytes, tfs: np.ndarray, doc_idx: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Decode positions for ONLY the docs at ``doc_idx`` (indices into
    the posting list, ascending).

    Returns ``(positions int64 flat, lens int64 per selected doc)``
    with positions absolute (per-doc delta-gaps cumsum'ed). The byte
    stream is scanned once for value boundaries (cheap bitwise pass),
    then only the selected docs' byte ranges are gathered and decoded
    — the phrase path never materializes the positions of docs outside
    the term intersection (the reference's positions skip,
    tantivy positions reader semantics, SURVEY.md §2.6)."""
    tfs = np.asarray(tfs, dtype=np.int64)
    doc_idx = np.asarray(doc_idx, dtype=np.int64)
    arr = np.frombuffer(pos_bytes, dtype=np.uint8)
    if doc_idx.size == 0 or arr.size == 0:
        return np.empty(0, dtype=np.int64), np.zeros(doc_idx.size, dtype=np.int64)
    cont = (arr & 0x80) != 0
    # byte offset where each encoded value starts
    val_starts = np.flatnonzero(np.concatenate(([True], ~cont[:-1])))
    vbound = np.concatenate(([0], np.cumsum(tfs)))  # value index per doc
    byte_bound = np.concatenate((val_starts, [arr.size]))
    lens = tfs[doc_idx]
    b_lo = byte_bound[vbound[doc_idx]]
    b_len = byte_bound[vbound[doc_idx + 1]] - b_lo
    sel = _ragged_gather(b_lo, b_len)
    gaps = varbyte_decode(arr[sel], int(lens.sum())).astype(np.int64)
    # segmented cumsum → absolute positions per selected doc
    seg_starts = np.cumsum(lens) - lens
    c = np.cumsum(gaps)
    base = np.repeat(c[seg_starts] - gaps[seg_starts], lens)
    return c - base, lens
