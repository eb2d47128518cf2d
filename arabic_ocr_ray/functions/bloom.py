"""Bloom-filter sketch + bloom-prefiltered anti join.

The 100 TB anti-join problem: ``hash_join(how="anti")`` shuffles BOTH
sides.  When the left side is huge and the match rate is high (most
customers DO have events), almost every shuffled left row is dropped
at the probe — wasted movement.  A Bloom filter of the right side's
keys is a FIXED-SIZE broadcast (``num_bits/8`` bytes regardless of key
count — unlike a distinct-key set, which is unbounded), and a Bloom
miss is definitive (no false negatives), so:

  definite-miss rows  → emitted directly, ZERO shuffle;
  possible-hit rows   → the exact shuffled anti join (false positives
                        are culled there).

Shuffle volume drops from |left| to |left ∩ right| + FP·|left| — with
the classic (m/n, k) sizing the FP term is a few permille.

Determinism: double hashing (Kirsch–Mitzenmacher) over ``zlib.crc32``
of the key's string form — h_i = (h1 + i·h2) mod m with h2 forced odd;
C-speed per key, no per-row Python arithmetic beyond the two crc calls,
and bit-identical bitmaps on every run/layout.

Design (no reference analog — the reference is single-process and
never joins at scale; this is the engine's own scale path, same family
as functions/sketch.py's HLL).
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa


def _hash_pair(key: str) -> tuple[int, int]:
    b = key.encode("utf-8", "surrogatepass")
    h1 = zlib.crc32(b)
    h2 = zlib.crc32(b + b"#2") | 1  # odd → cycles all m residues
    return h1, h2


def _hash_arrays(keys: list) -> tuple[np.ndarray, np.ndarray]:
    """Per-key crc32 pairs as uint64 arrays — the two C-speed crc
    calls are the only per-key Python step; position arithmetic and
    bit tests run vectorized from here."""
    n = len(keys)
    h1 = np.empty(n, dtype=np.uint64)
    h2 = np.empty(n, dtype=np.uint64)
    for j, k in enumerate(keys):
        a, b = _hash_pair(str(k))
        h1[j] = a
        h2[j] = b
    return h1, h2


def build_bloom(ds, key_col: str, num_bits: int = 1 << 20,
                num_hashes: int = 4) -> np.ndarray:
    """→ packed uint8 bitmap of length ``num_bits/8``.

    Map-side partial bitmaps (one per block, fixed 128 KiB at the
    default m=2^20) OR-merged on the driver — the merge is a monoid,
    so block count never changes the result and the driver holds
    O(num_bits), never O(keys)."""
    assert num_bits % 8 == 0
    nbytes = num_bits // 8

    def partial(b: pa.Table) -> pa.Table:
        bm = np.zeros(nbytes, dtype=np.uint8)
        h1, h2 = _hash_arrays(b.column(key_col).to_pylist())
        for i in range(num_hashes):
            pos = (h1 + np.uint64(i) * h2) % np.uint64(num_bits)
            np.bitwise_or.at(bm, (pos >> np.uint64(3)).astype(np.int64),
                             np.left_shift(
                                 np.uint8(1),
                                 (pos & np.uint64(7)).astype(np.uint8)))
        return pa.table({"bm": pa.array([bm.tobytes()], pa.binary())})

    merged = np.zeros(nbytes, dtype=np.uint8)
    for batch in (ds.select_columns([key_col])
                  .map_batches(partial, batch_format="pyarrow")
                  .iter_batches(batch_format="pyarrow")):
        for blob in batch.column("bm").to_pylist():
            merged |= np.frombuffer(blob, dtype=np.uint8)
    return merged


def bloom_contains(bitmap: np.ndarray, keys: list,
                   num_hashes: int = 4) -> np.ndarray:
    """→ bool array; False is DEFINITIVE (no false negatives).
    Vectorized: per-key work is the two crc calls; position math and
    bitmap gathers are numpy."""
    num_bits = len(bitmap) * 8
    h1, h2 = _hash_arrays(keys)
    hit = np.ones(len(keys), dtype=bool)
    for i in range(num_hashes):
        pos = (h1 + np.uint64(i) * h2) % np.uint64(num_bits)
        byte = bitmap[(pos >> np.uint64(3)).astype(np.int64)]
        bit = (byte >> (pos & np.uint64(7)).astype(np.uint8)) & 1
        hit &= bit.astype(bool)
    return hit


def anti_join_bloom(left_ds, right_ds, on: str,
                    right_on: str | None = None,
                    num_bits: int = 1 << 20, num_hashes: int = 4,
                    num_partitions: int = 32):
    """Left-anti join with a Bloom prefilter on the right side's keys.

    Exactly equal to ``hash_join(how="anti")`` (parity-tested): Bloom
    misses stream straight to the output; only possible hits (true
    matches + a few-permille FP band) pay the shuffled exact anti
    join.  The broadcast is the fixed-size bitmap via ``ray.put`` —
    bounded at any right-side cardinality.

    Cost shape: TWO pruned streaming passes over the left side (one
    per output branch — Ray Data has no multi-output operator), each
    probing the bitmap.  Read amplification beats shuffle
    amplification when the match rate is high; when the left side is
    re-read-expensive and mostly non-matching, use plain
    ``hash_join(how="anti")`` instead.

    DETERMINISM REQUIREMENT: because ``left_ds`` executes twice, its
    plan must yield the same rows on both passes — a plain read or
    deterministic map chain qualifies; a plan containing ``limit()``,
    sampling, or other nondeterministic operators can give the two
    branches different row sets (duplicating or dropping output rows
    vs ``hash_join(how="anti")``).  Materialize such inputs first
    (``left_ds = left_ds.materialize()``) before calling."""
    import ray

    from .joins import hash_join

    right_on = right_on or on
    # match hash_join's key-cast rule (right key cast to the LEFT
    # key's type BEFORE hashing) so e.g. int64 5 vs float64 5.0 hash
    # identically on both sides and a true match can never become a
    # bloom definite-miss
    from .joins import _pa_type

    ls = left_ds.schema()
    key_t = _pa_type(dict(zip(ls.names, ls.types))[on])

    def _cast_key(b: pa.Table) -> pa.Table:
        return pa.table({right_on: b.column(right_on).cast(key_t)})

    right_keys = right_ds.select_columns([right_on]).map_batches(
        _cast_key, batch_format="pyarrow")
    bitmap_ref = ray.put(build_bloom(right_keys, right_on,
                                     num_bits, num_hashes))

    def _split(keep_hits: bool):
        def f(b: pa.Table) -> pa.Table:
            bm = ray.get(bitmap_ref)
            hits = bloom_contains(bm, b.column(on).to_pylist(),
                                  num_hashes)
            mask = hits if keep_hits else ~hits
            return b.filter(pa.array(mask))
        return f

    definite_miss = left_ds.map_batches(_split(False),
                                        batch_format="pyarrow")
    candidates = left_ds.map_batches(_split(True),
                                     batch_format="pyarrow")
    exact_miss = hash_join(candidates, right_ds, on=on,
                           right_on=right_on, how="anti",
                           num_partitions=num_partitions)
    # hash_join emits key-first column order; realign to the left
    # schema so the union carries ONE block schema
    left_cols = list(left_ds.schema().names)
    return definite_miss.union(exact_miss.select_columns(left_cols))
