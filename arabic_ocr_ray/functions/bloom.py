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


def _bit_positions(key: str, num_bits: int, num_hashes: int) -> list:
    h1, h2 = _hash_pair(key)
    return [(h1 + i * h2) % num_bits for i in range(num_hashes)]


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
        for k in b.column(key_col).to_pylist():
            for pos in _bit_positions(str(k), num_bits, num_hashes):
                bm[pos >> 3] |= 1 << (pos & 7)
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
    """→ bool array; False is DEFINITIVE (no false negatives)."""
    num_bits = len(bitmap) * 8
    out = np.empty(len(keys), dtype=bool)
    for j, k in enumerate(keys):
        hit = True
        for pos in _bit_positions(str(k), num_bits, num_hashes):
            if not (bitmap[pos >> 3] >> (pos & 7)) & 1:
                hit = False
                break
        out[j] = hit
    return out


def anti_join_bloom(left_ds, right_ds, on: str,
                    right_on: str | None = None,
                    num_bits: int = 1 << 20, num_hashes: int = 4,
                    num_partitions: int = 32):
    """Left-anti join with a Bloom prefilter on the right side's keys.

    Exactly equal to ``hash_join(how="anti")`` (parity-tested): Bloom
    misses stream straight to the output; only possible hits (true
    matches + a few-permille FP band) pay the shuffled exact anti
    join.  The broadcast is the fixed-size bitmap via ``ray.put`` —
    bounded at any right-side cardinality."""
    import ray

    from .joins import hash_join

    right_on = right_on or on
    bitmap_ref = ray.put(build_bloom(right_ds, right_on,
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
