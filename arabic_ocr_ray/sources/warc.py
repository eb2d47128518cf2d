"""Raw WARC ingest — the alternate source for crawl archives.

SURVEY §2.1 S1 names ``read_binary_files`` for raw WARC as the
alternate ingest next to the parquet path (reference analog: the
directory scan + per-file image read, ``segment_words.py:254`` /
``:215``).  A real Common-Crawl user's first step is WARC → pages;
this module provides both directions:

- :func:`write_warc_from_pages` — serialize a pages corpus
  (url, warc_ts, html, lang) into N deterministic WARC/1.0 files,
  as a distributed shard-keyed write (same shape as
  ``pipelines/export.py``: ONE shuffle, one file per shard, records
  sorted by url in-file, atomic tmp → rename, resume by existence).
  This is the test-fixture generator — no external data.
- :func:`read_warc_pages` — ``ray.data.read_binary_files`` over the
  archive → one parse task per file → Dataset with the exact pages
  schema ``(url, warc_ts, html, lang)``, ready for the extraction
  pipeline.

Format (public ISO 28500 / WARC 1.0): each record is a header block
terminated by CRLFCRLF, a ``Content-Length``-delimited payload, then a
CRLFCRLF record separator.  Response records carry an HTTP/1.1
response whose own ``Content-Length`` delimits the html bytes; the
page language rides the standard ``Content-Language`` header.  The
parser advances by Content-Length arithmetic ONLY — payload bytes may
legally contain ``WARC/1.0`` markers, so splitting on markers would
corrupt records.

Compression (``compress=True`` / ``*.warc.gz``): the Common-Crawl
convention — each record is its OWN gzip member, members concatenated
(ISO 28500 annex; lets real readers seek to a record by offset without
decompressing the whole file).  The reader auto-detects the gzip magic
per file, so a directory may mix plain and compressed archives;
deterministic output (``mtime=0``) keeps the writer reproducible.

Scale shape: one WARC file = one read task = one parse call (the
standard CC processing unit, ~1 GiB/file in the wild); parsed records
immediately re-block into normal Arrow batches, so the whole-file
bytes block lives only for the duration of its parse task.
"""

from __future__ import annotations

import datetime as _dt
import os

import numpy as np
import pyarrow as pa

_EPOCH = _dt.datetime(1970, 1, 1)
_SOFTWARE = b"arabic-ocr-ray/warc-writer"


def _warc_date(ts_us: int) -> bytes:
    """Microsecond timestamp → WARC-Date (ISO-8601, Zulu).  WARC 1.1
    subsecond precision so warc_ts round-trips exactly."""
    d = _EPOCH + _dt.timedelta(microseconds=int(ts_us))
    return d.strftime("%Y-%m-%dT%H:%M:%S.%fZ").encode()


def _ts_us(s: bytes) -> int:
    """Robust WARC-Date → microseconds since epoch."""
    txt = s.decode().rstrip("Z")
    if "." in txt:
        base, frac = txt.split(".")
        us = int((frac + "000000")[:6])
    else:
        base, us = txt, 0
    d = _dt.datetime.strptime(base, "%Y-%m-%dT%H:%M:%S")
    return int((d - _EPOCH) // _dt.timedelta(microseconds=1)) + us


def record_bytes(url: str, ts_us: int, html: bytes, lang: str) -> bytes:
    """One WARC/1.0 response record (header + HTTP payload + separator)."""
    http = (b"HTTP/1.1 200 OK\r\n"
            b"Content-Type: text/html\r\n"
            b"Content-Language: " + lang.encode() + b"\r\n"
            b"Content-Length: " + str(len(html)).encode() + b"\r\n"
            b"\r\n" + html)
    hdr = (b"WARC/1.0\r\n"
           b"WARC-Type: response\r\n"
           b"WARC-Target-URI: " + url.encode() + b"\r\n"
           b"WARC-Date: " + _warc_date(ts_us) + b"\r\n"
           b"Content-Type: application/http; msgtype=response\r\n"
           b"Content-Length: " + str(len(http)).encode() + b"\r\n"
           b"\r\n")
    return hdr + http + b"\r\n\r\n"


def _warcinfo() -> bytes:
    body = b"software: " + _SOFTWARE + b"\r\n"
    return (b"WARC/1.0\r\n"
            b"WARC-Type: warcinfo\r\n"
            b"Content-Type: application/warc-fields\r\n"
            b"Content-Length: " + str(len(body)).encode() + b"\r\n"
            b"\r\n" + body + b"\r\n\r\n")


def parse_warc_bytes(data: bytes, strict: bool = False) -> pa.Table:
    """One WARC file's bytes → pages-schema Arrow table.

    Pure Content-Length arithmetic (no marker splitting); non-response
    records (warcinfo, request, metadata) are skipped.  Per-record
    Python is unavoidable for a record-framed format — the payload
    handling is zero-copy slicing, and one file is one task.

    Malformed-record isolation (real CC archives do contain oddities —
    the per-record twin of PixelDecoder/PdfExtractor's per-row status):
    a response record missing WARC-Target-URI / WARC-Date, with an
    unparseable date, or whose HTTP payload lacks the CRLFCRLF header
    terminator is SKIPPED (framing is unaffected: the record-level
    Content-Length was read fine).  Only a record-level Content-Length
    that won't parse stops the file — the framing itself is lost at
    that point and resyncing on ``WARC/1.0`` markers would corrupt
    records (payloads may legally contain them).  ``strict=True``
    raises ``ValueError`` instead, for fixture-validation paths."""
    urls, tss, htmls, langs = [], [], [], []
    pos, n = 0, len(data)
    while pos < n:
        hdr_end = data.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            break
        headers: dict[bytes, bytes] = {}
        for line in data[pos:hdr_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower()] = v.strip()
        try:
            clen = int(headers.get(b"content-length", b"0"))
            if clen < 0:
                raise ValueError("negative Content-Length")
        except ValueError:
            if strict:
                raise ValueError(
                    f"unparseable record Content-Length at offset {pos}")
            break  # framing lost — cannot locate the next record
        payload = data[hdr_end + 4:hdr_end + 4 + clen]
        pos = hdr_end + 4 + clen + 4  # skip record separator CRLFCRLF
        if headers.get(b"warc-type") != b"response":
            continue
        try:
            url = headers[b"warc-target-uri"].decode()
            ts = _ts_us(headers[b"warc-date"])
            http_end = payload.find(b"\r\n\r\n")
            if http_end < 0:
                raise ValueError("no HTTP header terminator in payload")
            http_headers: dict[bytes, bytes] = {}
            for line in payload[:http_end].split(b"\r\n")[1:]:
                k, _, v = line.partition(b":")
                http_headers[k.strip().lower()] = v.strip()
            body_len = int(http_headers.get(
                b"content-length",
                str(len(payload) - http_end - 4).encode()))
        except (KeyError, ValueError, UnicodeDecodeError) as e:
            if strict:
                raise ValueError(f"malformed response record: {e}") from e
            continue  # skip this record; framing already advanced
        urls.append(url)
        tss.append(ts)
        htmls.append(payload[http_end + 4:http_end + 4 + body_len])
        lg = http_headers.get(b"content-language")
        langs.append(lg.decode() if lg is not None else None)
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(tss, pa.timestamp("us")),
        "html": pa.array(htmls, pa.binary()),
        "lang": pa.array(langs, pa.string()),
    })


def read_warc_pages(path: str, concurrency: int | None = None):
    """WARC archive dir/file → Dataset(url, warc_ts, html, lang).

    One parse task per file (``read_binary_files`` block = one file);
    downstream stages re-batch normally.  ``*.warc.gz`` files
    (concatenated per-record gzip members, the CC convention) are
    detected by magic and inflated inside the parse task — the
    whole-file bytes live only for that task's duration either way."""
    import ray.data as rd

    ds = rd.read_binary_files(path, file_extensions=["warc", "gz"])

    def parse(b: pa.Table) -> pa.Table:
        import gzip

        raws = (x.as_py() for x in b.column("bytes"))
        # gzip.decompress handles multi-member streams (one member per
        # record); plain files pass through untouched.
        tabs = [parse_warc_bytes(
            gzip.decompress(r) if r[:2] == b"\x1f\x8b" else r)
            for r in raws]
        return pa.concat_tables(tabs) if tabs else parse_warc_bytes(b"")

    kw = {"concurrency": concurrency} if concurrency else {}
    return ds.map_batches(parse, batch_format="pyarrow", batch_size=1,
                          **kw)


def write_warc_from_pages(pages_parquet: str, out_dir: str,
                          n_files: int = 8, compress: bool = False):
    """Pages parquet → ``out_dir/part-K.warc[.gz]`` (K = crc32(url) % N),
    records url-sorted in-file, atomic rename, skip-if-exists resume.
    ``compress=True`` gzips each record as its own member (CC layout),
    deterministically (``mtime=0``).  Distributed: ONE shard-keyed
    shuffle, one write task per file.  Returns the manifest
    Dataset(shard, n_records)."""
    import gzip
    import zlib

    import pandas as pd
    import ray.data as rd

    from ..functions.arrowout import arrow_clean

    os.makedirs(out_dir, exist_ok=True)

    def assign(b: pa.Table) -> pa.Table:
        sh = np.fromiter(
            (zlib.crc32(u.encode()) % n_files
             for u in b.column("url").to_pylist()),
            dtype=np.int64, count=b.num_rows)
        return b.append_column("shard", pa.array(sh, pa.int64()))

    ext = ".warc.gz" if compress else ".warc"

    def write_file(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("url", kind="mergesort")
        k = int(df["shard"].iat[0])
        path = os.path.join(out_dir, f"part-{k}{ext}")
        if os.path.exists(path):
            # Resume validation (same contract as export.py's shard
            # resume): a pre-existing file must actually hold this
            # shard's records — a stale out_dir from a different
            # input would otherwise survive under a fresh-looking
            # manifest that does not describe its contents.
            with open(path, "rb") as f:
                raw = f.read()
            if raw[:2] == b"\x1f\x8b":
                raw = gzip.decompress(raw)
            n_existing = parse_warc_bytes(raw).num_rows
            if n_existing != len(df):
                raise ValueError(
                    f"resume mismatch: {path} holds {n_existing} "
                    f"response records but the current input has "
                    f"{len(df)} for shard {k}; the out_dir is stale "
                    f"— remove it or write elsewhere")
        if not os.path.exists(path):
            dt = df["warc_ts"]
            if str(dt.dtype) == "datetime64[ns]":
                ts = dt.astype("int64") // 1000       # ns → us
            elif str(dt.dtype).startswith("datetime64"):
                ts = dt.astype("datetime64[us]").astype("int64")
            else:
                ts = dt.astype("int64")               # already int us
            chunks = [_warcinfo()]
            chunks += [record_bytes(u, t, h, lg) for u, t, h, lg in
                       zip(df["url"], ts, df["html"], df["lang"])]
            if compress:
                chunks = [gzip.compress(c, mtime=0) for c in chunks]
            tmp = f"{path}.tmp{os.getpid()}"
            with open(tmp, "wb") as f:
                f.write(b"".join(chunks))
            os.replace(tmp, path)
        return pd.DataFrame({"shard": [k], "n_records": [len(df)]})

    return (rd.read_parquet(pages_parquet,
                            columns=["url", "warc_ts", "html", "lang"])
            .map_batches(assign, batch_format="pyarrow")
            .groupby("shard", num_partitions=n_files)
            .map_groups(arrow_clean(write_file), batch_format="pandas"))
