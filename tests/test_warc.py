"""Raw WARC ingest: serialize → parse round trip and extraction parity
with the parquet path (SURVEY §2.1 S1 alternate source)."""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from arabic_ocr_ray.sources import warc as W
from arabic_ocr_ray.sources.pages import pages_table


def _canon_pages(df: pd.DataFrame) -> pd.DataFrame:
    df = df.sort_values("url").reset_index(drop=True)
    df["warc_ts"] = df["warc_ts"].astype("datetime64[us]")
    return df[["url", "warc_ts", "html", "lang"]]


def test_warc_round_trip(ray_session, tmp_path):
    """pages → N WARC files → parse back: every column byte-identical,
    including the microsecond warc_ts and the binary html payload
    (hazard rows: empty, malformed, latin1 bytes, giant are all in
    the seed-9 corpus slice)."""
    t = pages_table(120, seed=9)
    src = str(tmp_path / "pages.parquet")
    pq.write_table(t, src, row_group_size=40)
    man = (W.write_warc_from_pages(src, str(tmp_path / "warc"),
                                   n_files=4).to_pandas())
    assert int(man["n_records"].sum()) == 120
    assert sorted(os.listdir(tmp_path / "warc")) == [
        f"part-{k}.warc" for k in sorted(man["shard"])]
    got = _canon_pages(
        W.read_warc_pages(str(tmp_path / "warc")).to_pandas())
    exp = _canon_pages(
        t.select(["url", "warc_ts", "html", "lang"]).to_pandas())
    pd.testing.assert_frame_equal(got, exp)


def test_warc_marker_in_payload():
    """A payload that CONTAINS WARC record markers must round-trip —
    the parser advances by Content-Length only, never by splitting on
    the magic bytes."""
    evil = (b"<html>WARC/1.0\r\n\r\nWARC-Type: response\r\n\r\n"
            b"Content-Length: 9999\r\n\r\n</html>")
    raw = (W._warcinfo()
           + W.record_bytes("https://x.test/a", 1_000_001, evil, "en")
           + W.record_bytes("https://x.test/b", 2_000_002, b"", "de"))
    t = W.parse_warc_bytes(raw)
    assert t.column("url").to_pylist() == ["https://x.test/a",
                                           "https://x.test/b"]
    assert t.column("html").to_pylist() == [evil, b""]
    assert [x.value for x in t.column("warc_ts")] == [1_000_001,
                                                      2_000_002]
    assert t.column("lang").to_pylist() == ["en", "de"]


def test_warc_extract_parity(ray_session, tmp_path):
    """Extraction over the WARC ingest is byte-identical to extraction
    over the parquet path — the S1 alternate-source contract."""
    from arabic_ocr_ray.pipelines.extract import extract_pages

    t = pages_table(80, seed=23)
    src = str(tmp_path / "pages.parquet")
    pq.write_table(t, src)
    W.write_warc_from_pages(src, str(tmp_path / "warc"),
                            n_files=3).materialize()

    def text_by_url(inp):
        df = (extract_pages(inp, batch_size=32, concurrency=2)
              .select_columns(["url", "extracted_text"]).to_pandas())
        return df.sort_values("url").reset_index(drop=True)

    via_warc = text_by_url(W.read_warc_pages(str(tmp_path / "warc")))
    via_parquet = text_by_url(src)
    pd.testing.assert_frame_equal(via_warc, via_parquet)
    # and the golden contract holds end-to-end
    golden = (t.select(["url", "text"]).to_pandas()
              .sort_values("url").reset_index(drop=True))
    assert (via_warc["extracted_text"] == golden["text"]).all()


def test_warc_write_resume(ray_session, tmp_path):
    """Re-running the writer on an existing out_dir rewrites nothing
    (mtimes unchanged) but still reports the full manifest."""
    t = pages_table(40, seed=31)
    src = str(tmp_path / "pages.parquet")
    pq.write_table(t, src)
    out = str(tmp_path / "warc")
    W.write_warc_from_pages(src, out, n_files=2).materialize()
    mtimes = {f: os.path.getmtime(os.path.join(out, f))
              for f in os.listdir(out)}
    man = W.write_warc_from_pages(src, out, n_files=2).to_pandas()
    assert int(man["n_records"].sum()) == 40
    assert {f: os.path.getmtime(os.path.join(out, f))
            for f in os.listdir(out)} == mtimes


def test_warc_gz_round_trip(ray_session, tmp_path):
    """compress=True writes per-record gzip members (CC layout); the
    reader auto-detects the magic, and a directory mixing plain and
    gzipped archives parses to the identical pages table."""
    import gzip

    t = pages_table(120, seed=9)
    src = str(tmp_path / "pages.parquet")
    pq.write_table(t, src, row_group_size=40)
    man = (W.write_warc_from_pages(src, str(tmp_path / "gz"),
                                   n_files=4, compress=True).to_pandas())
    assert int(man["n_records"].sum()) == 120
    names = sorted(os.listdir(tmp_path / "gz"))
    assert names == [f"part-{k}.warc.gz" for k in sorted(man["shard"])]
    # every file is a multi-member gzip stream: n_records+1 members
    # (warcinfo + one per record), each starting with the magic
    raw = open(tmp_path / "gz" / names[0], "rb").read()
    assert raw[:2] == b"\x1f\x8b" and raw.count(b"\x1f\x8b\x08") > 1
    assert gzip.decompress(raw).startswith(b"WARC/1.0")
    got = _canon_pages(
        W.read_warc_pages(str(tmp_path / "gz")).to_pandas())
    exp = _canon_pages(
        t.select(["url", "warc_ts", "html", "lang"]).to_pandas())
    pd.testing.assert_frame_equal(got, exp)
    # mixed directory: plain shards next to gzipped shards
    W.write_warc_from_pages(src, str(tmp_path / "gz"),
                            n_files=2).to_pandas()
    mixed = _canon_pages(
        W.read_warc_pages(str(tmp_path / "gz")).to_pandas())
    assert len(mixed) == 240  # 120 gz + 120 plain copies


def test_malformed_records_skipped_not_fatal():
    """One bad record in a 1 GiB archive must not kill the file's
    parse task: record-level framing survives, the bad record is
    skipped, good neighbors still come through (strict=True raises)."""
    import pytest

    good1 = W.record_bytes("http://a.example/1", 1_000_000, b"<p>A</p>", "en")
    good2 = W.record_bytes("http://a.example/2", 2_000_000, b"<p>B</p>", "ar")
    # response record missing WARC-Target-URI
    no_uri = good1.replace(b"WARC-Target-URI: http://a.example/1\r\n", b"")
    # response whose HTTP payload has no CRLFCRLF terminator
    http = b"HTTP/1.1 200 OK no-terminator <p>C</p>"
    no_term = (b"WARC/1.0\r\n"
               b"WARC-Type: response\r\n"
               b"WARC-Target-URI: http://a.example/3\r\n"
               b"WARC-Date: 1970-01-01T00:00:03.000000Z\r\n"
               b"Content-Length: " + str(len(http)).encode() + b"\r\n"
               b"\r\n" + http + b"\r\n\r\n")
    # unparseable WARC-Date
    bad_date = good1.replace(b"WARC-Date: 1970-01-01T00:00:01.000000Z",
                             b"WARC-Date: not-a-date")
    t = W.parse_warc_bytes(good1 + no_uri + no_term + bad_date + good2)
    assert t.column("url").to_pylist() == [
        "http://a.example/1", "http://a.example/2"]
    assert t.column("html").to_pylist() == [b"<p>A</p>", b"<p>B</p>"]
    with pytest.raises(ValueError, match="malformed"):
        W.parse_warc_bytes(no_uri, strict=True)
    # record-level Content-Length garbage: framing is lost — parse
    # stops there but keeps everything before it (strict raises)
    bad_frame = (b"WARC/1.0\r\n"
                 b"WARC-Type: response\r\n"
                 b"WARC-Target-URI: http://a.example/9\r\n"
                 b"WARC-Date: 1970-01-01T00:00:09.000000Z\r\n"
                 b"Content-Length: banana\r\n"
                 b"\r\n" + b"junk" + b"\r\n\r\n")
    broken = good1 + bad_frame + good2
    t2 = W.parse_warc_bytes(broken)
    assert t2.column("url").to_pylist() == ["http://a.example/1"]
    with pytest.raises(ValueError, match="Content-Length"):
        W.parse_warc_bytes(broken, strict=True)


def test_warc_write_resume_validates_stale_files(ray_session, tmp_path):
    """Skip-if-exists resume must verify the pre-existing file holds
    this shard's records (export.py's contract): a stale out_dir from
    a different input raises instead of surviving under a fresh
    manifest; a genuine re-run with the same input succeeds."""
    import pytest

    t = pages_table(60, seed=9)
    src = str(tmp_path / "pages.parquet")
    pq.write_table(t, src)
    out = str(tmp_path / "warc")
    W.write_warc_from_pages(src, out, n_files=2).materialize()
    # same input again: valid resume, counts match, no error
    man = W.write_warc_from_pages(src, out, n_files=2).to_pandas()
    assert int(man["n_records"].sum()) == 60
    # different input (twice the rows) against the stale out_dir
    t2 = pages_table(120, seed=9)
    src2 = str(tmp_path / "pages2.parquet")
    pq.write_table(t2, src2)
    with pytest.raises(Exception, match="resume mismatch"):
        W.write_warc_from_pages(src2, out, n_files=2).materialize()
