"""Vectorized partition hashing for WITHIN-RUN shuffle keys.

Every fixed-partition shuffle in the engine (``hash_join``,
``grouped_topk``, the dedup pair-dedup / verify partitions) needs a
deterministic ``key → partition`` map.  Integer keys always had a
vectorized splitmix-style path; string keys used to fall back to
``to_pylist()`` + per-row ``zlib.crc32`` — a Python loop on the FULL
join input whenever the key is a string (url-keyed joins).  This module
replaces that with a numpy fold over the Arrow string buffer/offsets:

- bytes are weighted by FNV-prime powers of their in-string position
  (a polynomial rolling hash, computed as one weighted cumsum-diff
  segmented sum over the whole batch's byte buffer);
- the per-string sums go through a murmur3-style 64-bit avalanche so
  near-identical keys spread across partitions.

The hash is only required to be deterministic WITHIN a run (both sides
of a join compute it independently on the same key values).  Anything
persisted across runs (the lineage ``part`` column) keeps its
documented ``crc32(url) % P`` layout in ``state/lineage.py`` and must
NOT use this module.

Unsigned overflow is the point (mod-2^64 arithmetic); numpy wraps
silently on uint64 array ops.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_FNV_PRIME = np.uint64(1099511628211)
_MIX1 = np.uint64(0xff51afd7ed558ccd)
_MIX2 = np.uint64(0xc4ceb9fe1a85ec53)
_SH33 = np.uint64(33)

#: FNV-prime power table, grown on demand (process-level; pure values)
_POWS = np.array([1], dtype=np.uint64)


def _mix64(h: np.ndarray) -> np.ndarray:
    """murmur3 fmix64 avalanche, elementwise."""
    h = h.astype(np.uint64, copy=True)
    h ^= h >> _SH33
    h *= _MIX1
    h ^= h >> _SH33
    h *= _MIX2
    h ^= h >> _SH33
    return h


def _pows_to(n: int) -> np.ndarray:
    global _POWS
    if len(_POWS) < n:
        m = max(n, 2 * len(_POWS))
        grown = np.full(m, _FNV_PRIME, dtype=np.uint64)
        grown[0] = 1
        np.cumprod(grown, out=grown)  # wraps mod 2^64, silently
        _POWS = grown
    return _POWS


#: keys longer than this take the per-byte segmented-sum path; short
#: keys (urls, ids) take the per-position loop, whose intermediates are
#: n-sized, not total-bytes-sized (first-touch page faults on the 8×
#: per-byte int64 arrays dominated cold batches in this sandbox)
_LONG_KEY = 256


def _string_hash64(a: pa.Array) -> np.ndarray:
    """Null-free string/binary Array → (n,) uint64 polynomial hash
    ``sum(byte_j * P^j) + (len+1) * P`` (batch-independent: bytes past a
    string's end contribute 0)."""
    if not (pa.types.is_large_string(a.type)
            or pa.types.is_large_binary(a.type)):
        a = a.cast(pa.large_binary() if pa.types.is_binary(a.type)
                   else pa.large_string())
    n = len(a)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    bufs = a.buffers()
    offs = np.frombuffer(bufs[1], dtype=np.int64, count=n + 1,
                         offset=8 * a.offset)
    starts, ends = offs[:-1], offs[1:]
    lens = ends - starts
    total = int(ends[-1] - starts[0])
    lbias = (lens.astype(np.uint64) + np.uint64(1)) * _FNV_PRIME
    if total == 0:  # all-empty batch
        return _mix64(lbias)
    data = np.frombuffer(bufs[2], dtype=np.uint8,
                         count=total, offset=int(starts[0]))
    maxlen = int(lens.max())
    pows = _pows_to(maxlen)
    if maxlen > _LONG_KEY:
        # per-byte segmented weighted sum (one pass over all bytes)
        idx = np.arange(total, dtype=np.int64)
        pos = idx - np.repeat(starts - starts[0], lens)
        weighted = data.astype(np.uint64) * pows[pos]
        csum = np.zeros(total + 1, dtype=np.uint64)
        np.cumsum(weighted, out=csum[1:])
        sums = csum[ends - starts[0]] - csum[starts - starts[0]]
        return _mix64(sums + lbias)
    # per-position loop: maxlen gathers of n elements each
    starts0 = starts - starts[0]
    h = np.zeros(n, dtype=np.uint64)
    idx = np.empty(n, dtype=np.int64)
    for j in range(maxlen):
        np.minimum(starts0 + j, total - 1, out=idx)  # clip: masked anyway
        h += (data[idx] * (lens > j)) * pows[j]
    return _mix64(h + lbias)


def column_hash64(arr) -> np.ndarray:
    """Arrow Array/ChunkedArray (int / string / binary) → (n,) uint64
    deterministic hashes; nulls hash to 0."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    t = arr.type
    if pa.types.is_integer(t):
        v = np.asarray(pc.fill_null(arr, 0).cast(pa.int64()),
                       dtype=np.int64).astype(np.uint64)
        h = _mix64(v)
        if arr.null_count:  # nulls → 0, same rule as the string path
            h[np.asarray(pc.is_null(arr))] = 0
        return h
    if (pa.types.is_string(t) or pa.types.is_large_string(t)
            or pa.types.is_binary(t) or pa.types.is_large_binary(t)):
        if arr.null_count:
            mask = np.asarray(pc.is_null(arr))
            fill = ("" if pa.types.is_string(t)
                    or pa.types.is_large_string(t) else b"")
            h = _string_hash64(pc.fill_null(arr, fill))
            h[mask] = 0
            return h
        return _string_hash64(arr)
    # rare fallback (floats, timestamps rendered as keys): python crc32
    return np.array(
        [0 if x is None else zlib.crc32(str(x).encode())
         for x in arr.to_pylist()], dtype=np.uint64)


def combined_hash64(columns) -> np.ndarray:
    """Hash several key columns into one 64-bit key (order-sensitive)."""
    h = column_hash64(columns[0])
    for col in columns[1:]:
        h = _mix64(h * _FNV_PRIME ^ column_hash64(col))
    return h


def partition_ids(columns, n_parts: int) -> pa.Array:
    """Key column(s) → int32 Arrow array of ``hash % n_parts``."""
    if not isinstance(columns, (list, tuple)):
        columns = [columns]
    h = combined_hash64(columns)
    return pa.array((h % np.uint64(n_parts)).astype(np.int32), pa.int32())
