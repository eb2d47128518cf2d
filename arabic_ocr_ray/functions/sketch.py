"""Distributed sketches — approximate distinct counting (HyperLogLog).

The engine's sketches are DETERMINISTIC (md5-derived, no process
seeds), which buys two things a classic random-seeded sketch lacks:

  1. bit-identical registers across runs, cluster layouts and resume
     boundaries (the merge is an elementwise max — a commutative,
     idempotent monoid, so replays/retries can never corrupt it);
  2. an exact SQL twin: the register table itself is hash-verified
     against DuckDB (`hll_user_registers` query) — only the final
     cardinality ESTIMATE is approximate, and that is gated by a
     pytest error-bound test instead.

Register definition (mirrored in the oracle SQL, `__ray_entry__`):
  hex   = md5(str(value)).hexdigest()
  idx   = int(hex[0:2], 16)                     # 256 registers
  w     = hex[2:17]                             # 15 nibbles = 60 bits
  rho   = #leading zero BITS of w + 1  (all-zero w → 61)
  reg[idx] = max(reg[idx], rho) over DISTINCT values

Shuffle shape: per-batch partial registers (local distinct + md5 over
a process-level cache) → ``groupby(key, reg_idx).aggregate(Max)`` —
the shuffle moves ≤ keys × 256 tiny rows, never values.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

M_REGISTERS = 256
_RHO_CAP = 61          # 60 payload bits, all-zero → 61

_HLL_CACHE: dict = {}
_HLL_CACHE_CAP = 1 << 20


def _bit_length_u64(w: np.ndarray) -> np.ndarray:
    """Exact elementwise ``int.bit_length`` for uint64 (6 shift
    passes — no float log2, whose 53-bit mantissa mis-rounds near
    power-of-two boundaries above 2^53)."""
    bl = np.zeros(len(w), dtype=np.int64)
    v = w.astype(np.uint64, copy=True)
    for shift in (32, 16, 8, 4, 2, 1):
        m = v >= np.uint64(1 << shift)
        bl[m] += shift
        v[m] >>= np.uint64(shift)
    bl += (v > 0)
    return bl


def _bucket_rho(value) -> tuple[int, int]:
    """Deterministic (register index, rho) for one value."""
    idx, rho = _bucket_rho_many([value])
    return int(idx[0]), int(rho[0])


def _bucket_rho_many(values) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized (register index, rho) for a sequence of values:
    cache lookups per value, ONE md5 digest-concat + numpy parse pass
    for the misses (the r3 per-distinct-value Python md5+hex loop)."""
    keys = [str(v) for v in values]
    n = len(keys)
    idx = np.empty(n, dtype=np.int64)
    rho = np.empty(n, dtype=np.int64)
    get = _HLL_CACHE.get
    miss = []
    for i, k in enumerate(keys):
        hit = get(k)
        if hit is None:
            miss.append(i)
        else:
            idx[i], rho[i] = hit
    if miss:
        md5 = hashlib.md5
        buf = b"".join([md5(keys[i].encode()).digest() for i in miss])
        d = np.frombuffer(buf, dtype=np.uint8).reshape(-1, 16)
        midx = d[:, 0].astype(np.int64)            # hex[0:2]
        # hex[2:17] = 15 nibbles: bytes 1..8 big-endian, drop low nibble
        w = (d[:, 1:9].copy().view(">u8").ravel().astype(np.uint64)
             >> np.uint64(4))
        mrho = 61 - _bit_length_u64(w)             # w==0 → 61 = _RHO_CAP
        idx[miss] = midx
        rho[miss] = mrho
        if len(_HLL_CACHE) < _HLL_CACHE_CAP:
            _HLL_CACHE.update(zip(
                (keys[i] for i in miss),
                zip(midx.tolist(), mrho.tolist())))
    return idx, rho


def hll_registers(ds, key_col: str, val_col: str):
    """→ Dataset(key_col, reg_idx, reg_val) — nonzero HLL registers of
    the DISTINCT ``val_col`` values per key (merged with Max)."""
    from ray.data.aggregate import Max

    def partial(b: pa.Table) -> pa.Table:
        # local distinct via one vectorized drop_duplicates (C-speed),
        # batched md5 over the distinct values, C-speed groupby-max
        df = (b.select([key_col, val_col]).to_pandas()
              .drop_duplicates([key_col, val_col]))
        idx, rho = _bucket_rho_many(df[val_col].tolist())
        regs = (pd.DataFrame({key_col: df[key_col].to_numpy(),
                              "reg_idx": idx, "reg_val": rho})
                .groupby([key_col, "reg_idx"], sort=True)["reg_val"]
                .max().reset_index())
        return pa.table({
            key_col: pa.array(regs[key_col],
                              type=b.schema.field(key_col).type),
            "reg_idx": pa.array(regs["reg_idx"], pa.int64()),
            "reg_val": pa.array(regs["reg_val"], pa.int64()),
        })

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby([key_col, "reg_idx"])
            .aggregate(Max("reg_val", alias_name="reg_val")))


def hll_estimate(reg_vals: np.ndarray, m: int = M_REGISTERS) -> float:
    """Standard bias-corrected HLL cardinality estimate from a DENSE
    register array (zeros included)."""
    reg_vals = np.asarray(reg_vals, dtype=np.float64)
    alpha = 0.7213 / (1 + 1.079 / m)
    raw = alpha * m * m / np.sum(np.power(2.0, -reg_vals))
    zeros = int((reg_vals == 0).sum())
    if raw <= 2.5 * m and zeros:
        return m * np.log(m / zeros)       # linear counting
    return raw


def hll_distinct_counts(ds, key_col: str, val_col: str) -> pd.DataFrame:
    """Convenience finish: registers → per-key estimated distinct
    count (small driver frame; the registers Dataset is the scalable
    surface).  O(keys) numpy end-to-end: sparse register rows pivot to
    one dense (keys × m) matrix, then a single vectorized estimate
    pass — no per-key Python loop (same math as :func:`hll_estimate`,
    bit-for-bit)."""
    df = hll_registers(ds, key_col, val_col).to_pandas()
    m = M_REGISTERS
    keys, kinv = np.unique(df[key_col].to_numpy(), return_inverse=True)
    dense = np.zeros((len(keys), m), dtype=np.float64)
    dense[kinv, df["reg_idx"].to_numpy()] = df["reg_val"].to_numpy()
    alpha = 0.7213 / (1 + 1.079 / m)
    raw = alpha * m * m / np.sum(np.power(2.0, -dense), axis=1)
    zeros = (dense == 0).sum(axis=1)
    lin = m * np.log(m / np.maximum(zeros, 1))
    est = np.where((raw <= 2.5 * m) & (zeros > 0), lin, raw)
    return pd.DataFrame({key_col: keys, "approx_distinct": est})


# --- Count-Min sketch (heavy-hitter frequency estimation) -----------------
CMS_DEPTH = 4
CMS_WIDTH = 1024

_CMS_CACHE: dict = {}


def _cms_bucket(row: int, token: str, width: int = CMS_WIDTH) -> int:
    """Deterministic bucket: first 8 md5 hex chars of ``row|token``
    mod width — mirrored EXACTLY by the SQL twin's instr() hex fold."""
    return int(_cms_buckets_many(row, [token], width)[0])


def _cms_buckets_many(row: int, tokens: list,
                      width: int = CMS_WIDTH) -> np.ndarray:
    """Vectorized buckets for one sketch row: cache lookups, then ONE
    md5 digest-concat + numpy parse pass for the misses (same batching
    as :func:`_bucket_rho_many`).  The cache stores the RAW 32-bit
    value; ``% width`` applies at lookup (r3's ``_cms_bucket`` silently
    ignored a non-default ``width``)."""
    n = len(tokens)
    raw = np.empty(n, dtype=np.int64)
    get = _CMS_CACHE.get
    miss = []
    for i, t in enumerate(tokens):
        hit = get((row, t))
        if hit is None:
            miss.append(i)
        else:
            raw[i] = hit
    if miss:
        md5 = hashlib.md5
        pre = f"{row}|"
        buf = b"".join([md5((pre + tokens[i]).encode()).digest()
                        for i in miss])
        d = np.frombuffer(buf, dtype=np.uint8).reshape(-1, 16)
        # int(hexdigest[:8], 16) == first 4 digest bytes big-endian
        b = d[:, :4].copy().view(">u4").ravel().astype(np.int64)
        raw[miss] = b
        if len(_CMS_CACHE) < _HLL_CACHE_CAP:
            _CMS_CACHE.update(zip(((row, tokens[i]) for i in miss),
                                  b.tolist()))
    return raw % width


def cms_table(ds, col: str = "text", depth: int = CMS_DEPTH,
              width: int = CMS_WIDTH):
    """Distributed Count-Min sketch over the whitespace tokens of
    ``col`` → Dataset(row, bucket, n).

    Same sketch discipline as the HLL above: the table itself is
    DETERMINISTIC (md5 buckets, no seeds) and hash-verifiable against
    a full SQL replica; only frequency ESTIMATES read from it are
    approximate (one-sided: est >= true, gated in pytest).  Shuffle
    shape: per-batch local Counter → per-block (row, bucket, n)
    partials (<= depth x width rows per block no matter the block's
    token count) → one tiny keyed Sum shuffle.  The sketch is a sum
    monoid — replays merge safely, and the finished table is
    depth x width rows (4 KiB-scale) at ANY corpus size."""
    from collections import Counter

    from ray.data.aggregate import Sum

    from .text import _WS_SPLIT

    def partial(b: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in b.column(col).to_pylist():
            c.update(_WS_SPLIT.findall((t or "").lower()))
        toks = list(c.keys())
        ns = np.fromiter(c.values(), dtype=np.int64, count=len(toks))
        rows_out, buckets_out, n_out = [], [], []
        for d in range(depth):
            # vectorized bucket lookup + dense bincount fold (the r3
            # per-(token,row) Python dict accumulate)
            dense = np.zeros(width, dtype=np.int64)
            if toks:
                np.add.at(dense, _cms_buckets_many(d, toks, width), ns)
            nz = np.flatnonzero(dense)
            rows_out.append(np.full(len(nz), d, dtype=np.int64))
            buckets_out.append(nz.astype(np.int64))
            n_out.append(dense[nz])
        return pa.table({
            "row": pa.array(np.concatenate(rows_out)),
            "bucket": pa.array(np.concatenate(buckets_out)),
            "n": pa.array(np.concatenate(n_out)),
        })

    # depth x width <= 4096 keys: cap the shuffle width (project
    # fixed-overhead rule for small key spaces)
    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(["row", "bucket"], num_partitions=8)
            .aggregate(Sum("n", alias_name="n")))


def cms_estimate(cms_df: pd.DataFrame, tokens: list,
                 depth: int = CMS_DEPTH) -> list:
    """Point-estimate counts from a finished sketch table:
    est(token) = min over rows of the token's bucket sum."""
    lut = {(int(r), int(b)): int(n) for r, b, n in
           zip(cms_df["row"], cms_df["bucket"], cms_df["n"])}
    return [min(lut.get((d, _cms_bucket(d, tok)), 0)
                for d in range(depth)) for tok in tokens]
