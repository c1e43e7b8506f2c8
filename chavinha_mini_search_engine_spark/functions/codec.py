"""Delta-gap + varbyte posting codec (vectorized numpy).

Postings store sorted local doc ids as first-id + varbyte(deltas) and term
frequencies as varbyte(tf).  Varbyte is LEB128-style: 7 payload bits per
byte, high bit set on continuation bytes, little-endian groups.  Encode and
decode are fully vectorized -- this runs inside ``applyInPandas`` on the
build path (SURVEY.md T5) and inside the WAND scorer on the query path, so
it must not loop per value.

The codec is an engine-internal replacement for what Vespa keeps opaque
behind ``enable-bm25`` (/root/reference/config/vespa/schemas/doc.sd:24).
"""

from __future__ import annotations

import numpy as np


def varbyte_encode(values: np.ndarray) -> bytes:
    """Encode a uint array to varbyte. Values must be >= 0 and < 2**63."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    # number of 7-bit groups per value (at least 1)
    ngroups = np.ones(v.shape, dtype=np.int64)
    thresh = np.uint64(1) << np.uint64(7)
    tmp = v.copy()
    while True:
        more = tmp >= thresh
        if not more.any():
            break
        ngroups[more] += 1
        tmp = tmp >> np.uint64(7)
        tmp[~more] = 0
    total = int(ngroups.sum())
    out = np.empty(total, dtype=np.uint8)
    ends = np.cumsum(ngroups)          # index just past each value's bytes
    starts = ends - ngroups
    # write groups: for k-th byte of each value (little-endian)
    maxg = int(ngroups.max())
    for k in range(maxg):
        mask = ngroups > k
        idx = starts[mask] + k
        chunk = (v[mask] >> np.uint64(7 * k)) & np.uint64(0x7F)
        cont = (ngroups[mask] - 1) > k
        out[idx] = chunk.astype(np.uint8) | (cont.astype(np.uint8) << 7)
    return out.tobytes()


def varbyte_encode_segmented(
    values: np.ndarray, seg_starts: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Encode MANY value segments in one vectorized pass.

    ``values`` is the concatenation of all segments; ``seg_starts`` holds
    each segment's first value index (seg i covers
    ``seg_starts[i]:seg_starts[i+1]`` with an implicit final end).
    Returns ``(buf, seg_byte_offsets)`` where ``buf`` is one uint8 array
    holding every segment's varbyte bytes back-to-back and
    ``buf[seg_byte_offsets[i]:seg_byte_offsets[i+1]]`` is exactly
    ``varbyte_encode(segment_i)`` (byte-identical -- the per-value
    little-endian groups don't cross value boundaries, so slicing the
    shared buffer at value boundaries is equivalent to independent
    encodes).  Exists for kernels that emit one encoded cell per segment
    at large segment counts, where per-segment ``varbyte_encode`` calls
    would dominate (map-side partial-run encoding in the postings build).
    """
    v = np.asarray(values, dtype=np.uint64)
    seg_starts = np.asarray(seg_starts, dtype=np.int64)
    if v.size == 0:
        return np.empty(0, dtype=np.uint8), np.zeros(
            len(seg_starts) + 1, dtype=np.int64
        )
    ngroups = np.ones(v.shape, dtype=np.int64)
    thresh = np.uint64(1) << np.uint64(7)
    tmp = v.copy()
    while True:
        more = tmp >= thresh
        if not more.any():
            break
        ngroups[more] += 1
        tmp = tmp >> np.uint64(7)
        tmp[~more] = 0
    ends = np.cumsum(ngroups)
    starts = ends - ngroups
    out = np.empty(int(ends[-1]), dtype=np.uint8)
    for k in range(int(ngroups.max())):
        mask = ngroups > k
        idx = starts[mask] + k
        chunk = (v[mask] >> np.uint64(7 * k)) & np.uint64(0x7F)
        cont = (ngroups[mask] - 1) > k
        out[idx] = chunk.astype(np.uint8) | (cont.astype(np.uint8) << 7)
    # byte offset where each segment begins = start byte of its first value
    seg_offsets = np.empty(len(seg_starts) + 1, dtype=np.int64)
    seg_offsets[:-1] = starts[seg_starts]
    seg_offsets[-1] = ends[-1]
    return out, seg_offsets


def varbyte_decode(buf: bytes, n: int | None = None) -> np.ndarray:
    """Decode varbyte bytes to a uint64 array."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = (b & 0x80) == 0
    ends = np.flatnonzero(is_last)                 # last-byte index per value
    starts = np.concatenate(([0], ends[:-1] + 1))
    payload = (b & 0x7F).astype(np.uint64)
    # shift each byte by 7 * (position within its value)
    pos_in_val = np.arange(b.size, dtype=np.int64) - np.repeat(
        starts, ends - starts + 1
    )
    shifted = payload << (np.uint64(7) * pos_in_val.astype(np.uint64))
    # sum shifted bytes per value
    csum = np.concatenate(([np.uint64(0)], np.cumsum(shifted, dtype=np.uint64)))
    vals = csum[ends + 1] - csum[starts]
    if n is not None:
        assert vals.size == n, f"decoded {vals.size} values, expected {n}"
    return vals


def delta_encode(sorted_ids: np.ndarray) -> bytes:
    """first-difference gaps of a strictly-increasing id array -> varbyte."""
    ids = np.asarray(sorted_ids, dtype=np.uint64)
    if ids.size == 0:
        return b""
    gaps = np.empty_like(ids)
    gaps[0] = ids[0]
    gaps[1:] = ids[1:] - ids[:-1]
    return varbyte_encode(gaps)


def delta_decode(buf: bytes, n: int | None = None) -> np.ndarray:
    gaps = varbyte_decode(buf, n)
    return np.cumsum(gaps, dtype=np.uint64)
