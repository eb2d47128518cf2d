"""Robustness: extraction never raises and always returns a string,
on arbitrary byte input (hypothesis + structured nasties)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from arabic_ocr_ray.extract import extract_document
from arabic_ocr_ray.html.tokenizer import tokenize
from arabic_ocr_ray.model import PrototypeModel
from arabic_ocr_ray.templates import Templates

_MODEL = PrototypeModel.load()
_TPL = Templates()

NASTIES = [
    b"", b"<", b"<p", b"</p>", b"<p>" * 2000, b"</div>" * 2000,
    b"<a href='x'>" * 1000, b"\x00\x01\x02<p>x</p>",
    b"<p>" + b"&amp;" * 5000, b"<script>alert(1)",
    b"<!--" + b"x" * 5000, b"<p style='>'>tricky</p>",
    b"<p>a<p>b<p>c", b"\xff\xfe\x00b\x00r\x00o\x00k",
    "<div>نص عربي <b>".encode() * 50,
]


def test_structured_nasties_never_raise():
    for i, raw in enumerate(NASTIES):
        out = extract_document(raw, ("ar", "en", "de")[i % 3], _MODEL, _TPL)
        assert isinstance(out["extracted_text"], str)


@settings(max_examples=150, deadline=None, derandomize=True)
@given(st.binary(max_size=3000), st.sampled_from(["", "ar", "en", "de"]))
def test_fuzz_extract_total(raw, lang):
    out = extract_document(raw, lang, _MODEL, _TPL)
    assert isinstance(out["extracted_text"], str)
    assert out["n_spans"] >= out["n_content_spans"] >= 0


@settings(max_examples=100, deadline=None, derandomize=True)
@given(st.binary(max_size=2000))
def test_fuzz_tokenizer_invariants(raw):
    ts = tokenize(raw)
    n = len(ts)
    assert len(ts.texts) == len(ts.tags) == n
    # weights positive exactly on text tokens
    for i in range(n):
        assert (ts.weights[i] > 0) == (ts.kinds[i] == 1)
    # matched pairs are consistent
    for i in range(n):
        m = int(ts.match[i])
        if m != -1 and ts.is_open[i]:
            assert int(ts.match[m]) == i


# ---- windowed-operator properties (pure folds, no Ray per example) ----

@settings(max_examples=200, deadline=None, derandomize=True)
@given(st.lists(st.tuples(st.integers(0, 5), st.integers(0, 10_000)),
                min_size=1, max_size=60))
def test_fold_sessions_matches_bruteforce(rows):
    import numpy as np

    from arabic_ocr_ray.functions.windows import _fold_sessions

    gap = 500
    u = np.array([r[0] for r in rows], dtype=np.int64)
    ts = np.array([r[1] for r in rows], dtype=np.int64)
    out = (_fold_sessions(u.copy(), ts.copy(), gap)
           .set_index("user_id").sort_index())
    for uid in sorted(set(u.tolist())):
        t = np.sort(ts[u == uid])
        sess_lens, cur = [], 1
        for a, b in zip(t, t[1:]):
            if b - a > gap:
                sess_lens.append(cur)
                cur = 1
            else:
                cur += 1
        sess_lens.append(cur)
        assert out.loc[uid, "n_events"] == len(t)
        assert out.loc[uid, "n_sessions"] == len(sess_lens)
        assert out.loc[uid, "max_session_events"] == max(sess_lens)


@settings(max_examples=200, deadline=None, derandomize=True)
@given(st.lists(st.lists(st.integers(0, 30), min_size=1, max_size=40),
                min_size=2, max_size=12),
       st.sampled_from([600, 700, 800, 900]))
def test_prefix_filter_recall_law(sets, thr_x1000):
    """The exactness core of dedup.jaccard_dup_pairs, property-tested
    without Ray: under ANY global total order (here df asc, id asc —
    the operator's order), every pair with integer Jaccard ≥ t shares
    an element inside BOTH prefixes of length n - ceil(t*n) + 1, and
    passes the length filter min(n_a,n_b)*1000 >= t*max(n_a,n_b)."""
    import itertools

    from collections import Counter

    uniq = [sorted(set(s)) for s in sets]
    df = Counter(x for s in uniq for x in set(s))
    prefixes = []
    for s in uniq:
        ordered = sorted(s, key=lambda x: (df[x], x))
        n = len(ordered)
        p = n - (thr_x1000 * n + 999) // 1000 + 1
        prefixes.append(set(ordered[:p]))
    for (i, a), (j, b) in itertools.combinations(enumerate(uniq), 2):
        sa, sb = set(a), set(b)
        inter = len(sa & sb)
        union = len(sa) + len(sb) - inter
        if union == 0 or inter * 1000 < thr_x1000 * union:
            continue
        # length filter must keep the pair
        lo, hi = sorted((len(sa), len(sb)))
        assert lo * 1000 >= thr_x1000 * hi
        # prefix filter must surface the pair as a candidate
        assert prefixes[i] & prefixes[j], (
            f"recall miss: sets {i},{j} J*1000="
            f"{inter * 1000 // union} thr={thr_x1000}")


@settings(max_examples=300, deadline=None, derandomize=True)
@given(
    st.sampled_from(["http", "https", "HTTP", "HTTPS"]),
    st.from_regex(r"[A-Za-z](?:[A-Za-z0-9.\-]{0,12}[A-Za-z0-9])?",
                  fullmatch=True),
    st.sampled_from(["", ":80", ":443", ":8080"]),
    st.lists(st.from_regex(r"[A-Za-z0-9._~%\-]{1,8}", fullmatch=True),
             max_size=3),
    st.lists(st.tuples(
        st.sampled_from(["utm_source", "utm_c", "id", "Q", "page"]),
        st.from_regex(r"[A-Za-z0-9]{0,6}", fullmatch=True)),
        max_size=4),
    st.sampled_from(["", "/", "//"]),
    st.sampled_from(["", "#frag", "#a?utm_x=1"]),
)
def test_canonicalize_url_fixed_point_and_params(scheme, host, port,
                                                 segs, params, slash,
                                                 frag):
    """canon is a FIXED POINT (canon∘canon == canon) over structured
    urls, non-utm params survive in order, and the host is folded."""
    from arabic_ocr_ray.functions.urls import canonicalize_url as c

    path = "/" + "/".join(segs) if segs else ""
    query = ("?" + "&".join(f"{k}={v}" for k, v in params)
             if params else "")
    u = f"{scheme}://{host}{port}{path}{query}{slash}{frag}"
    cu = c(u)
    assert c(cu) == cu, (u, cu, c(cu))
    # non-utm params survive, in order, case preserved
    kept = [f"{k}={v}" for k, v in params
            if not k.startswith("utm_")]
    if kept and not (slash and query == ""):
        for p in kept:
            assert p in cu, (u, cu)
    # host always folded
    assert host.lower() in cu
