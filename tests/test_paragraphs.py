"""Paragraph-level corpus dedup + URL canonicalization tests."""

import random

import pyarrow as pa
import pytest

from arabic_ocr_ray.functions import paragraphs, urls


def _docs_table(texts, ids=None):
    ids = list(range(len(texts))) if ids is None else ids
    id_arr = (pa.array(ids, pa.int64()) if isinstance(ids[0], int)
              else pa.array(ids, pa.string()))
    return pa.table({"doc_id": id_arr,
                     "text": pa.array(texts, pa.string())})


# ---------------- explode ---------------------------------------------------

def test_explode_positions_and_empties():
    t = _docs_table(["a\nb", "", "x\n\ny\n"])
    out = paragraphs.explode_paragraphs(t)
    assert out.column("doc_id").to_pylist() == [0, 0, 1, 2, 2, 2, 2]
    assert out.column("pos").to_pylist() == [0, 1, 0, 0, 1, 2, 3]
    assert out.column("para").to_pylist() == [
        "a", "b", "", "x", "", "y", ""]


# ---------------- dedup_paragraphs -----------------------------------------

def _brute(rows, mode, max_occurrences=1):
    """Pure-python twin of the documented contract."""
    from collections import Counter

    paras = [(i, p, t.split("\n")) for i, p, t in
             [(r[0], None, r[1]) for r in rows]]
    occ = Counter()
    for _i, _p, ps in paras:
        occ.update(p for p in ps if p != "")
    # global first occurrence per para, by (id, pos)
    first = {}
    for i, _p, ps in sorted(paras, key=lambda x: x[0]):
        for pos, p in enumerate(ps):
            if p != "" and p not in first:
                first[p] = (i, pos)
    out = {}
    for i, _p, ps in paras:
        kept = []
        for pos, p in enumerate(ps):
            if p == "":
                kept.append(p)
            elif mode == "keep_first":
                if occ[p] == 1 or first[p] == (i, pos):
                    kept.append(p)
            else:
                if occ[p] <= max_occurrences:
                    kept.append(p)
        if kept:
            out[i] = "\n".join(kept)
    return out


@pytest.mark.parametrize("mode", ["keep_first", "drop_all"])
def test_dedup_paragraphs_planted(ray_session, mode):
    import ray.data as rd

    boiler = "accept cookies to continue"
    texts = [f"intro one\n{boiler}\nbody A",
             f"{boiler}\nbody B",
             "body C only",
             boiler,               # doc that is ALL boilerplate
             f"body D\n{boiler}"]
    ds = rd.from_arrow(_docs_table(texts))
    got = (paragraphs.dedup_paragraphs(ds, mode=mode)
           .to_pandas().set_index("doc_id")["text"].to_dict())
    want = _brute(list(enumerate(texts)), mode)
    assert got == want
    if mode == "keep_first":
        assert got[0] == f"intro one\n{boiler}\nbody A"
        assert got[1] == "body B"
        assert 3 not in got          # fully-boilerplate doc vanishes
    else:
        assert boiler not in got[0]


def test_dedup_paragraphs_roundtrip_untouched(ray_session):
    """No repeats → byte-identical reassembly (incl. blank lines and
    trailing newlines)."""
    import ray.data as rd

    texts = ["a\n\nb\n", "", "single", "x\ny\nz"]
    ds = rd.from_arrow(_docs_table(texts))
    got = (paragraphs.dedup_paragraphs(ds)
           .to_pandas().set_index("doc_id")["text"].to_dict())
    assert got == dict(enumerate(texts))


def test_dedup_paragraphs_randomized_parity(ray_session):
    import ray.data as rd

    rng = random.Random(404)
    vocab = [f"p{i}" for i in range(12)]
    texts = ["\n".join(rng.choice(vocab + [""])
                       for _ in range(rng.randint(1, 8)))
             for _ in range(60)]
    ds = rd.from_arrow(_docs_table(texts)).repartition(7)
    for mode, k in (("keep_first", 1), ("drop_all", 2)):
        got = (paragraphs.dedup_paragraphs(
                   ds, mode=mode, max_occurrences=k, num_partitions=5)
               .to_pandas().set_index("doc_id")["text"].to_dict())
        assert got == _brute(list(enumerate(texts)), mode, k)


def test_dedup_paragraphs_string_ids_keeper_order(ray_session):
    """keep_first elects min (id, pos) under the id column's natural
    (string) order."""
    import ray.data as rd

    ds = rd.from_arrow(_docs_table(
        ["dup", "dup", "dup"], ids=["b", "a", "c"]))
    got = (paragraphs.dedup_paragraphs(ds, mode="keep_first")
           .to_pandas().set_index("doc_id")["text"].to_dict())
    assert got == {"a": "dup"}


def test_common_paragraphs_counts(ray_session):
    import ray.data as rd

    texts = ["x\ny", "x\nx\nz", "x", "y\n\n"]
    ds = rd.from_arrow(_docs_table(texts)).repartition(3)
    got = (paragraphs.common_paragraphs(ds, min_docs=2)
           .to_pandas().set_index("para"))
    assert got.loc["x", "n_occurrences"] == 4
    assert got.loc["x", "n_docs"] == 3
    assert got.loc["y", "n_occurrences"] == 2
    assert got.loc["y", "n_docs"] == 2
    assert "z" not in got.index and "" not in got.index


# ---------------- urls -------------------------------------------------------

def test_canonicalize_url_rules():
    c = urls.canonicalize_url
    assert c("HTTPS://Example.COM/Path#frag") == "https://example.com/Path"
    assert c("http://example.com:80/a") == "http://example.com/a"
    assert c("https://example.com:443/a/") == "https://example.com/a"
    assert c("https://example.com:8080/a") == "https://example.com:8080/a"
    # utm params dropped, non-utm order preserved, '?' dropped if empty
    assert c("https://e.com/p?utm_source=x&id=5&utm_c=y&b=2") == \
        "https://e.com/p?id=5&b=2"
    assert c("https://e.com/p?utm_source=x") == "https://e.com/p"
    assert c("https://e.com/p?xutm=1") == "https://e.com/p?xutm=1"
    # path case preserved; root slash stripped
    assert c("https://e.com/") == "https://e.com"
    assert c("") == ""
    # path-less query: host folding must stop at '?', query case kept
    assert c("HTTPS://E.com?Q=Mixed&utm_x=1") == "https://e.com?Q=Mixed"
    assert c("https://e.com:443?a=1") == "https://e.com?a=1"


def test_url_dedup_groups(ray_session):
    import ray.data as rd

    t = pa.table({"url": pa.array([
        "https://E.com/a",
        "https://e.com/a#x",
        "https://e.com/a?utm_source=t",
        "https://e.com/b",
    ], pa.string())})
    out = (urls.url_dedup(rd.from_arrow(t))
           .to_pandas().set_index("canon_url"))
    assert out.loc["https://e.com/a", "n_variants"] == 3
    assert out.loc["https://e.com/a", "url"] == "https://E.com/a"
    assert out.loc["https://e.com/b", "n_variants"] == 1


# ---------------- curate_corpus_v3 -------------------------------------------

def test_curate_corpus_v3_planted(ray_session):
    """Each stage exercised: a leaked benchmark passage drops its doc
    BEFORE the paragraph pass could dedup it away; boilerplate
    paragraphs keep only their first occurrence; gutted docs fall to
    the token gate."""
    import ray.data as rd

    from arabic_ocr_ray.pipelines.curate import curate_corpus_v3

    leak = "the quick brown fox jumps over the lazy benchmark dog"
    boiler = "accept all cookies now"
    bench = rd.from_arrow(pa.table({
        "url": pa.array(["b0"], pa.string()),
        "text": pa.array([f"prefix {leak} suffix"], pa.string()),
    }))
    corpus = rd.from_arrow(pa.table({
        "url": pa.array(["u0", "u1", "u2", "u3"], pa.string()),
        "text": pa.array([
            f"{leak}\nlots of extra words here to pass any gate",
            f"intro paragraph one\n{boiler}\nbody words for doc one",
            f"{boiler}\nbody words for doc two go here",
            boiler,  # gutted by the paragraph pass → gate sweeps it
        ], pa.string()),
    }))
    out = (curate_corpus_v3(corpus, bench, min_tokens=5)
           .to_pandas().set_index("url"))
    assert "u0" not in out.index            # contaminated (8-gram hit)
    assert out.loc["u1", "text"] == \
        f"intro paragraph one\n{boiler}\nbody words for doc one"
    assert out.loc["u2", "text"] == "body words for doc two go here"
    assert "u3" not in out.index            # all-boilerplate → gate
    assert out.loc["u2", "n_tokens"] == 7


def test_dedup_paragraphs_broadcast_parity(ray_session):
    """broadcast reassembly (drop-key ray.put + pure source map) is
    row-identical to the shuffled reassembly in both modes."""
    import ray.data as rd

    rng = random.Random(77)
    vocab = [f"p{i}" for i in range(10)]
    texts = ["\n".join(rng.choice(vocab + [""])
                       for _ in range(rng.randint(1, 7)))
             for _ in range(50)]
    ds = rd.from_arrow(_docs_table(texts)).repartition(6)
    for mode in ("keep_first", "drop_all"):
        a = (paragraphs.dedup_paragraphs(ds, mode=mode,
                                         num_partitions=5)
             .to_pandas().set_index("doc_id")["text"].to_dict())
        b = (paragraphs.dedup_paragraphs(ds, mode=mode,
                                         num_partitions=5,
                                         reassembly="broadcast")
             .to_pandas().set_index("doc_id")["text"].to_dict())
        assert a == b


def test_dedup_paragraphs_broadcast_cap_raises(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(_docs_table(["dup", "dup", "dup"]))
    with pytest.raises(ValueError, match="max_broadcast_drops"):
        paragraphs.dedup_paragraphs(ds, reassembly="broadcast",
                                    max_broadcast_drops=1)


def test_latest_capture_keeps_newest_full_row(ray_session):
    import pyarrow as pa
    import ray.data as rd

    t = pa.table({
        "url": pa.array(["a", "b", "a", "c", "a"], pa.string()),
        "warc_ts": pa.array([100, 50, 300, 70, 200],
                            pa.int64()).cast(pa.timestamp("us")),
        "html": pa.array([b"v1", b"only", b"v3", b"c1", b"v2"],
                         pa.binary()),
    })
    out = (urls.latest_capture(rd.from_arrow(t).repartition(3),
                               num_partitions=4)
           .to_pandas().set_index("url"))
    assert len(out) == 3
    assert out.loc["a", "html"] == b"v3"       # ts=300 wins
    assert out.loc["b", "html"] == b"only"
    assert out.loc["c", "html"] == b"c1"


def test_latest_capture_null_ts_never_wins(ray_session):
    import pyarrow as pa
    import ray.data as rd

    t = pa.table({
        "url": pa.array(["a", "a", "b"], pa.string()),
        "warc_ts": pa.array([100, None, None],
                            pa.int64()).cast(pa.timestamp("us")),
        "html": pa.array([b"real", b"broken", b"only"], pa.binary()),
    })
    out = (urls.latest_capture(rd.from_arrow(t), num_partitions=2)
           .to_pandas().set_index("url"))
    assert out.loc["a", "html"] == b"real"   # NaT loses to any ts
    assert out.loc["b", "html"] == b"only"   # all-null id still emits


def test_canonicalize_query_slashes_preserved():
    c = urls.canonicalize_url
    # a trailing slash inside a query VALUE is data, not path noise
    assert c("https://e.com/login?next=/") == "https://e.com/login?next=/"
    assert c("https://e.com/p?q=ab//") == "https://e.com/p?q=ab//"
    # path slash before a query that rule 4 fully removes IS stripped
    assert c("https://e.com/p/?utm_source=x") == "https://e.com/p"


def test_dedup_paragraphs_broadcast_string_ids(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(_docs_table(
        ["dup", "dup", "dup\nkeep me here"], ids=["b", "a", "c"]))
    got = (paragraphs.dedup_paragraphs(ds, mode="keep_first",
                                       reassembly="broadcast")
           .to_pandas().set_index("doc_id")["text"].to_dict())
    assert got == {"a": "dup", "c": "keep me here"}


def test_incremental_counts_and_dedup(ray_session, tmp_path):
    """Crawl-over-crawl: build counts on the base, update with the new
    crawl, dedup the NEW docs against the merged counter — must equal
    dedup_paragraphs(drop_all) over base∪new restricted to new docs;
    epoch pointer advances and the old epoch dir is gone."""
    import os

    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from arabic_ocr_ray.functions import paragraphs as P

    boiler = "COOKIE BANNER"
    base = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([f"{boiler}\nbase one\n\nkeep a",
                          f"{boiler}\nbase two",
                          "unique base"], pa.string()),
    })
    new = pa.table({
        "doc_id": pa.array([10, 11, 12], pa.int64()),
        "text": pa.array([f"{boiler}\nnew one\n\nnew tail",
                          boiler,                      # all dropped
                          "fresh solo\nbase one"],     # cross-crawl dup
                        pa.string()),
    })
    cdir = str(tmp_path / "counts")
    P.build_paragraph_counts(rd.from_arrow(base), cdir,
                             col="text", num_partitions=8)
    assert P._current_epoch(cdir) == "epoch-0"
    P.update_paragraph_counts(rd.from_arrow(new), cdir,
                              col="text", num_partitions=8)
    assert P._current_epoch(cdir) == "epoch-1"
    assert not os.path.exists(os.path.join(cdir, "epoch-0"))

    got = (P.dedup_paragraphs_incremental(
        rd.from_arrow(new), cdir, col="text", id_col="doc_id",
        max_occurrences=1, num_partitions=8)
        .to_pandas().sort_values("doc_id").reset_index(drop=True))

    union = pa.concat_tables([base, new])
    full = (P.dedup_paragraphs(rd.from_arrow(union), col="text",
                               id_col="doc_id", mode="drop_all",
                               max_occurrences=1, num_partitions=8)
            .to_pandas())
    want = (full[full["doc_id"] >= 10]
            .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)
    # semantic spot checks: boiler (2× base + 2× new) gone everywhere,
    # 'base one' (cross-crawl 2×) gone, blanks survive, doc 11 vanished
    assert got["doc_id"].tolist() == [10, 12]
    assert got.loc[0, "text"] == "new one\n\nnew tail"
    assert got.loc[1, "text"] == "fresh solo"

    # counter values are the union's truth
    cnt = (P.read_paragraph_counts(cdir).to_pandas()
           .set_index("para")["n"])
    assert cnt[boiler] == 4 and cnt["base one"] == 2


def test_incremental_broadcast_mode_parity_and_guard(ray_session,
                                                     tmp_path):
    """Broadcast reassembly (zero-shuffle fast path) must produce
    byte-identical output to the shuffle mode, and the bounded-small-
    side guard must refuse an oversized dup inventory."""
    import pandas as pd
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from arabic_ocr_ray.functions import paragraphs as P

    base = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["dup a\nsolo base\n\ndup b",
                          "dup a\ndup b"], pa.string()),
    })
    new = pa.table({
        "doc_id": pa.array([10, 11], pa.int64()),
        "text": pa.array(["dup a\nnew solo\n\ndup b",
                          "dup a"], pa.string()),
    })
    cdir = str(tmp_path / "c")
    P.build_paragraph_counts(rd.from_arrow(base), cdir,
                             col="text", num_partitions=4)
    P.update_paragraph_counts(rd.from_arrow(new), cdir,
                              col="text", num_partitions=4)
    kw = dict(col="text", id_col="doc_id", max_occurrences=1,
              num_partitions=4)
    shuf = (P.dedup_paragraphs_incremental(rd.from_arrow(new), cdir,
                                           **kw)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    bcast = (P.dedup_paragraphs_incremental(rd.from_arrow(new), cdir,
                                            reassembly="broadcast",
                                            **kw)
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(bcast, shuf)
    assert bcast["doc_id"].tolist() == [10]
    assert bcast.loc[0, "text"] == "new solo\n"
    with pytest.raises(ValueError, match="max_broadcast_drops"):
        P.dedup_paragraphs_incremental(rd.from_arrow(new), cdir,
                                       reassembly="broadcast",
                                       max_broadcast_drops=1, **kw)
    with pytest.raises(ValueError, match="reassembly"):
        P.dedup_paragraphs_incremental(rd.from_arrow(new), cdir,
                                       reassembly="bogus", **kw)


def test_incremental_counter_partition_meta(ray_session, tmp_path):
    """The counter records its build-time num_partitions: consumers
    resolve it from _meta.json (omitting the arg just works), and an
    explicit conflicting value raises instead of silently landing
    counter and new-crawl rows in different groups (which would
    disable every drop)."""
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from arabic_ocr_ray.functions import paragraphs as P

    base = pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "text": pa.array(["dup\nsolo"], pa.string()),
    })
    new = pa.table({
        "doc_id": pa.array([10], pa.int64()),
        "text": pa.array(["dup\nnew solo"], pa.string()),
    })
    cdir = str(tmp_path / "c")
    P.build_paragraph_counts(rd.from_arrow(base), cdir,
                             col="text", num_partitions=8)
    with pytest.raises(ValueError, match="num_partitions"):
        P.update_paragraph_counts(rd.from_arrow(new), cdir,
                                  col="text", num_partitions=4)
    P.update_paragraph_counts(rd.from_arrow(new), cdir, col="text")
    with pytest.raises(ValueError, match="num_partitions"):
        P.dedup_paragraphs_incremental(rd.from_arrow(new), cdir,
                                       col="text", id_col="doc_id",
                                       num_partitions=16)
    got = (P.dedup_paragraphs_incremental(rd.from_arrow(new), cdir,
                                          col="text", id_col="doc_id")
           .to_pandas())
    assert got["text"].tolist() == ["new solo"]  # 'dup' (2x) dropped


def test_incremental_dedup_preserves_large_int_ids(ray_session,
                                                   tmp_path):
    """Hash-derived int64 ids above 2^53: the decision fold must not
    round-trip ids through float64 (counter-side nulls would float the
    column and collapse adjacent ids)."""
    import pyarrow as pa
    import ray.data as rd

    from arabic_ocr_ray.functions import paragraphs as P

    big = 2**62 + 2**61  # not representable exactly as float64 ±1
    base = pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "text": pa.array(["boiler\nbase solo"], pa.string()),
    })
    new = pa.table({
        "doc_id": pa.array([big, big + 1, big + 3], pa.int64()),
        "text": pa.array(["boiler\nkeep a", "boiler\nkeep b",
                          "keep c"], pa.string()),
    })
    cdir = str(tmp_path / "c")
    P.build_paragraph_counts(rd.from_arrow(base), cdir,
                             col="text", num_partitions=4)
    P.update_paragraph_counts(rd.from_arrow(new), cdir, col="text")
    got = (P.dedup_paragraphs_incremental(rd.from_arrow(new), cdir,
                                          col="text", id_col="doc_id")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert got["doc_id"].tolist() == [big, big + 1, big + 3]
    assert got["text"].tolist() == ["keep a", "keep b", "keep c"]
