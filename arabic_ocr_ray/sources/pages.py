"""Deterministic synthetic Common-Crawl-style `pages` corpus.

Schema fixed by BASELINE.json:input_hint:
    (url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string)

The generator is the engine's conformance fixture (FIXTURES.md §1): the
``text`` column is the golden extracted text, KNOWN BY CONSTRUCTION —
the concatenation of the page's main-content block texts in document
order with the engine's canonical separators (" " inside a line, "\\n"
between lines).  The analog of the reference's paired ``inputs/`` ↔
``inputs_text/`` golden corpus (integrator.py:4-15).

Determinism: one ``random.Random((seed << 32) | i)`` per row — no
wall-clock, no dict-order dependence, rows independent of each other
(so generation itself can be distributed over row ranges).

Hazard cases (tagged in the url, FIXTURES.md §1), one per residue of
``i % 20``:
    13 empty      — no main content; golden text "" (F9 analog)
    14 tiny       — single-word content (degenerate-segment analog)
    15 malformed  — unclosed <b>, stray '>'/'&'/'<' in text
    16 latin1     — ISO-8859-1 bytes + meta charset (non-UTF8 path);
                    downgraded to normal for Arabic rows
    17 brgaps     — inline <br>-run gaps exercising the adaptive
                    threshold (utils.py:42-60 analog) at its boundary
    18 dup        — duplicate content under a distinct url
    19 readmore   — content paragraph with a boilerplate trailer link
plus ``giant`` rows (html ≥ 256 KiB skew hazard) every 499th row when
``giant=True``.

Separability contract (what makes byte-identical extraction possible,
mirroring the reference's clean training alphabet): every non-content
block is either link-wrapped (numpunc ≥ 1) or matches a boilerplate
template (templates.py); content sub-spans always have numpunc == 0.
"""

from __future__ import annotations

import html as _htmlmod
import os
import random

import pyarrow as pa
import pyarrow.parquet as pq

from ..kernels import NO_SPLIT, adaptive_gap_threshold

EPOCH_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in microseconds

#: Generator version — cache directories embed it so evolving the
#: grammar can never silently reuse stale fixture parquet.
GEN_VERSION = 2

WORDS_EN = (
    "time year people way day man thing woman life child world school state "
    "family student group country problem hand part place case week company "
    "system program question work government number night point home water "
    "room mother area money story fact month lot right study book eye job "
    "word business issue side kind head house service friend father power "
    "hour game line end member law car city community name president team "
    "minute idea body information back parent face others level office door "
    "health person art war history party result change morning reason "
    "research girl guy moment air teacher force education".split()
)
WORDS_DE = (
    "zeit jahr mensch weg tag mann ding frau leben kind welt schule staat "
    "familie gruppe land problem hand teil ort woche firma system programm "
    "frage arbeit regierung nummer nacht punkt haus wasser raum mutter "
    "gebiet geld geschichte monat recht studie buch auge beruf wort seite "
    "kopf dienst freund vater kraft stunde spiel linie ende mitglied gesetz "
    "auto stadt gemeinde name minute idee information eltern gesicht ebene "
    "tür gesundheit person kunst krieg partei ergebnis wechsel morgen grund "
    "forschung junge moment luft lehrer bildung".split()
)
WORDS_AR = (
    "كتاب مدرسة بيت ولد بنت شمس قمر بحر نهر جبل سلام كلام قلم باب نافذة "
    "طريق مدينة قرية بلاد أولاد لاعب علامة سلامة إسلام فلاح صلاح ليل نهار "
    "علم عمل خبر صوت لون طعام ماء هواء أرض سماء نجم غيم مطر ثلج ورد شجرة "
    "زهرة طائر سمك حصان جمل قطة كلب أسد نمر فيل".split()
)
WORDS = {"en": WORDS_EN, "de": WORDS_DE, "ar": WORDS_AR}
LATIN1_WORDS = "café münchen straße größe äpfel señor".split()

ASIDE_HEADINGS = ("Related Articles", "Popular Posts", "Recent Posts",
                  "Trending Now", "Related Links")
COOKIE_LINE = "We use cookies to improve your experience on this site."
COOKIE_BTNS = ("Accept all cookies", "Decline")
FOOTER_LINKS = ("Privacy Policy", "Terms of Service", "Cookie Policy")
READMORE = "Read more"

#: Fixed <br>-gap patterns for the adaptive-threshold hazard; finite so
#: the training corpus covers their feature-vector space exactly.
#: Each entry: (gap widths between spans-of-14-words, inner gap width).
BR_PATTERNS = (
    ((1, 2, 2, 2, 6), 1),
    ((2, 3, 3, 7), 2),
    ((1, 1, 4, 1, 5), 1),
)

HAZARDS = {13: "empty", 14: "tiny", 15: "malformed", 16: "latin1",
           17: "brgaps", 18: "dup", 19: "readmore"}


def _cap(w: str, lang: str) -> str:
    return w if lang == "ar" else w.capitalize()


def _words(rng: random.Random, lang: str, n: int) -> list[str]:
    wl = WORDS[lang]
    return [wl[rng.randrange(len(wl))] for _ in range(n)]


def _esc(s: str) -> str:
    return _htmlmod.escape(s, quote=False)


class _Page:
    """Accumulates html parts + golden lines + labeled golden spans."""

    def __init__(self) -> None:
        self.html: list[str] = []
        self.lines: list[str] = []   # golden content lines, document order
        self.spans: list[tuple[str, str]] = []  # (label, text) doc order


def _paragraph(rng: random.Random, page: _Page, lang: str,
               n_words: int, trailer: bool = False) -> None:
    """One content paragraph; optionally with a read-more trailer link.

    May wrap one interior word in <b>, which the fine-cut stage
    (contour_seg analog) splits into three content sub-spans whose
    reassembly is byte-identical to the source text.
    """
    ws = _words(rng, lang, n_words)
    ws[0] = _cap(ws[0], lang)
    if n_words >= 3 and rng.randrange(10) < 6:
        ws[-1] += "."
    text = " ".join(ws)
    bold_at = -1
    if n_words >= 5 and rng.randrange(10) < 3:
        bold_at = 1 + rng.randrange(n_words - 2)
    if bold_at >= 0:
        pre = " ".join(ws[:bold_at])
        mid = ws[bold_at]
        post = " ".join(ws[bold_at + 1:])
        body = f"{_esc(pre)} <b>{_esc(mid)}</b> {_esc(post)}"
        page.spans += [("content", pre), ("content", mid), ("content", post)]
    else:
        body = _esc(text)
        page.spans.append(("content", text))
    if trailer:
        body += f' <a href="#more">{READMORE}</a>'
        page.spans.append(("nav", READMORE))
    page.html.append(f"<p>{body}</p>")
    page.lines.append(text)


def _br_paragraph(rng: random.Random, page: _Page, lang: str) -> None:
    """Adaptive-threshold hazard: word groups separated by fixed-width
    <br> runs.  The gap pattern is one of BR_PATTERNS; span splits are
    derived with the engine's exact threshold rule so the labeled spans
    match segmentation (golden TEXT is independent of the splits — all
    pieces are content and reassemble with single spaces)."""
    gaps, inner = BR_PATTERNS[rng.randrange(len(BR_PATTERNS))]
    groups = []
    for gi in range(len(gaps) + 1):
        ws = _words(rng, lang, 14)
        if gi == 0:
            ws[0] = _cap(ws[0], lang)
        groups.append(ws)
    # html: words inside a group joined by <br>*inner runs; groups by gaps
    def join_ws(ws: list[str], width: int) -> str:
        sep = " " + "<br>" * width + " "
        return sep.join(_esc(w) for w in ws)

    parts = []
    for gi, ws in enumerate(groups):
        parts.append(join_ws(ws, inner))
        if gi < len(gaps):
            parts.append(" " + "<br>" * gaps[gi] + " ")
    page.html.append("<p>" + "".join(parts) + "</p>")
    # golden line: every word, single spaces
    flat = [w for ws in groups for w in ws]
    page.lines.append(" ".join(flat))
    # labeled spans: split where gap width > adaptive threshold over the
    # line's zero-run widths (leading/trailing runs don't occur here;
    # widths appear in document order: inner gaps interleaved with group
    # gaps exactly as the scanner sees them).
    widths: list[int] = []
    for gi, ws in enumerate(groups):
        widths += [inner] * (len(ws) - 1)
        if gi < len(gaps):
            widths.append(gaps[gi])
    thr = adaptive_gap_threshold(widths)
    spans: list[list[str]] = [[]]
    wi = 0
    for gi, ws in enumerate(groups):
        for k, w in enumerate(ws):
            spans[-1].append(w)
            width = widths[wi] if wi < len(widths) else None
            wi += 1
            if width is not None and thr != NO_SPLIT and width > thr:
                spans.append([])
    page.spans += [("content", " ".join(s)) for s in spans if s]


def build_page(seed: int, i: int, giant: bool = False,
               scale: int = 1) -> dict:
    """Build row ``i``; returns dict with url/warc_ts/html/text/lang
    plus the golden labeled spans (for the training fixture).

    ``scale`` multiplies the paragraph count (bench corpora use larger
    pages for realistic bytes/doc) without changing the rng draw
    sequence — golden text stays exact at any scale."""
    rng = random.Random((seed << 32) | i)
    lang = ("ar", "en", "de")[i % 3]
    hazard = HAZARDS.get(i % 20, "")
    if giant and i % 499 == 21:
        hazard = "giant"
    if hazard == "latin1" and lang == "ar":
        hazard = ""
    if hazard == "dup":
        # identical content to the base row of this dup-group, own url
        rng = random.Random((seed << 32) | (i - (i % 40)))
        lang = ("ar", "en", "de")[(i - (i % 40)) % 3]

    site_ws = _words(rng, "en", 2)
    site = " ".join(w.capitalize() for w in site_ws)
    page = _Page()

    # --- head (stripped by the tokenizer; must never leak) -------------
    charset = "iso-8859-1" if hazard == "latin1" else "utf-8"
    page.html.append(
        f'<!DOCTYPE html><html><head><meta charset="{charset}">'
        f"<title>{_esc(site)}</title>"
        "<style>body{font:16px serif}</style>"
        "<script>var x = '<p>not text</p>';</script></head><body>"
    )
    page.html.append("<!-- rendered by fixture-gen -->")

    # --- header ---------------------------------------------------------
    page.html.append(f'<header><a href="/"><h1>{_esc(site)}</h1></a></header>')
    page.spans.append(("header", site))

    # --- nav ------------------------------------------------------------
    n_nav = 3 + rng.randrange(4)
    items = _words(rng, lang, n_nav)
    page.html.append("<nav><ul>")
    for w in items:
        lab = _cap(w, lang)
        page.html.append(f'<li><a href="/{_esc(w)}">{_esc(lab)}</a></li>')
        page.spans.append(("nav", lab))
    page.html.append("</ul></nav>")

    # --- cookie banner (some pages) -------------------------------------
    if rng.randrange(10) < 3:
        page.html.append(
            f"<div><p>{COOKIE_LINE}</p>"
            f'<p><a href="#">{COOKIE_BTNS[0]}</a> <a href="#">{COOKIE_BTNS[1]}</a></p></div>'
        )
        page.spans.append(("cookie", COOKIE_LINE))
        page.spans.append(("cookie", f"{COOKIE_BTNS[0]} {COOKIE_BTNS[1]}"))

    # --- main content ----------------------------------------------------
    # Nested-wrapper variation: the deskew stress (preprocess.py:33-51
    # analog).  0-4 layers of <div> around <main> shift every content
    # depth; wrapper-depth normalization + line-local baselines keep
    # extraction byte-identical at any k.
    wrap_depth = rng.randrange(5)
    page.html.append("<div>" * wrap_depth)
    page.html.append("<main><article>")
    if hazard == "empty":
        pass
    elif hazard == "tiny":
        w = _cap(_words(rng, lang, 1)[0], lang)
        page.html.append(f"<p>{_esc(w)}</p>")
        page.spans.append(("content", w))
        page.lines.append(w)
    elif hazard == "malformed":
        ws = _words(rng, lang, 12)
        ws[0] = _cap(ws[0], lang)
        k = 3 + rng.randrange(4)
        pre, post = " ".join(ws[:k]), " ".join(ws[k:])
        text = f"{pre} {post}"
        # unclosed <b>, raw '&' and '>' and a stray '< ' in text
        page.html.append(f"<p>{_esc(pre)} <b>{_esc(post)}</p>")
        page.spans.append(("content", text))
        page.lines.append(text)
        t2 = "5 > 3 & 2 < 4"
        page.html.append(f"<p>{t2}</p>")
        page.spans.append(("content", t2))
        page.lines.append(t2)
    elif hazard == "brgaps":
        _br_paragraph(rng, page, lang)
    else:
        if rng.randrange(10) < 7:
            tw = _words(rng, lang, 2 + rng.randrange(4))
            title = " ".join(_cap(w, lang) for w in tw)
            page.html.append(f"<h2>{_esc(title)}</h2>")
            page.spans.append(("content", title))
            page.lines.append(title)
        n_par = (40 if hazard == "giant"
                 else scale * (2 + rng.randrange(4)))
        n_words_hi = (400 if hazard == "giant" else 40)
        for pi in range(n_par):
            trailer = hazard == "readmore" and pi == n_par - 1
            _paragraph(rng, page, lang, 5 + rng.randrange(n_words_hi - 4),
                       trailer=trailer)
    page.html.append("</article></main>")
    page.html.append("</div>" * wrap_depth)

    # --- aside -----------------------------------------------------------
    if rng.randrange(10) < 5:
        heading = ASIDE_HEADINGS[rng.randrange(len(ASIDE_HEADINGS))]
        page.html.append(f"<aside><h3>{heading}</h3><ul>")
        page.spans.append(("aside", heading))
        for w in _words(rng, lang, 2):
            lab = _cap(w, lang)
            page.html.append(f'<li><a href="/r/{_esc(w)}">{_esc(lab)}</a></li>')
            page.spans.append(("aside", lab))
        page.html.append("</ul></aside>")

    # --- footer ----------------------------------------------------------
    year = 2020 + i % 5
    fline = f"© {year} {site}. All rights reserved."
    page.html.append(f"<footer><p>{_esc(fline)}</p>")
    page.spans.append(("footer", fline))
    links = " ".join(f'<a href="/{j}">{t}</a>' for j, t in enumerate(FOOTER_LINKS))
    page.html.append(f"<p>{links}</p></footer></body></html>")
    page.spans.append(("nav", " ".join(FOOTER_LINKS)))

    doc = "".join(page.html)
    if hazard == "latin1":
        # prepend a content paragraph of non-ASCII latin-1 words to
        # prove the charset-sniff path end to end
        extra = " ".join(LATIN1_WORDS[:3])
        doc = doc.replace("<main><article>",
                          f"<main><article><p>{_esc(extra)}</p>", 1)
        page.lines.insert(0, extra)
        first_content = next(
            (j for j, (lab, _) in enumerate(page.spans) if lab == "content"),
            len(page.spans))
        page.spans.insert(first_content, ("content", extra))
        raw = doc.encode("latin-1", errors="replace")
    else:
        raw = doc.encode("utf-8")

    golden = "\n".join(page.lines)
    tag = hazard or "normal"
    return {
        "url": f"https://fixture.test/{seed}/{tag}/{i:08d}",
        "warc_ts": EPOCH_US + i * 1_000_000,
        "html": raw,
        "text": golden,
        "lang": lang,
        "spans": page.spans,
        "hazard": tag,
    }


def pages_table(n: int, seed: int = 42, giant: bool = False) -> pa.Table:
    rows = [build_page(seed, i, giant) for i in range(n)]
    return pa.table({
        "url": pa.array([r["url"] for r in rows], pa.string()),
        "warc_ts": pa.array([r["warc_ts"] for r in rows], pa.timestamp("us")),
        "html": pa.array([r["html"] for r in rows], pa.binary()),
        "text": pa.array([r["text"] for r in rows], pa.string()),
        "lang": pa.array([r["lang"] for r in rows], pa.string()),
    })


def golden_spans_table(n: int, seed: int = 42) -> pa.Table:
    """Training fixture (FIXTURES.md §2 `labeled_blocks`): golden spans
    per url in document order; positional-zip alignment key =
    block_idx (the `curr_word_idx` cursor analog,
    segment_words.py:173-189)."""
    urls, idxs, labels, texts = [], [], [], []
    for i in range(n):
        r = build_page(seed, i)
        for bi, (lab, txt) in enumerate(r["spans"]):
            urls.append(r["url"])
            idxs.append(bi)
            labels.append(lab)
            texts.append(txt)
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "block_idx": pa.array(idxs, pa.int32()),
        "label": pa.array(labels, pa.string()),
        "block_text": pa.array(texts, pa.string()),
    })


def ensure_pages_parquet(path: str, n: int, seed: int = 42,
                         giant: bool = False, row_group_size: int = 200) -> str:
    """Write (once) the pages corpus to ``path``; cached by existence.
    Multiple row groups so ray.data can split the read."""
    if not os.path.exists(path):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        tmp = f"{path}.tmp{os.getpid()}"  # unique per writer: concurrent
        pq.write_table(pages_table(n, seed, giant), tmp,   # callers race
                       row_group_size=row_group_size)      # benignly
        os.replace(tmp, path)
    return path


def ensure_bench_corpus(dir_path: str, n: int, seed: int = 42,
                        scale: int = 6, giant: bool = True) -> str:
    """Generate a bench-scale pages corpus WITH RAY (rows are
    independent — ``build_page(seed, i)`` — so generation itself is a
    map_batches pipeline), written once and cached.  Atomic: writes to
    a temp dir, renames on success."""
    if os.path.isdir(dir_path) and os.listdir(dir_path):
        return dir_path
    import pyarrow as pa
    import ray.data as rd

    tmp = dir_path + ".tmp"
    if os.path.isdir(tmp):
        import shutil

        shutil.rmtree(tmp)

    def gen(batch) -> pa.Table:
        ids = batch["id"].tolist()
        rows = [build_page(seed, int(i), giant=giant, scale=scale)
                for i in ids]
        return pa.table({
            "url": pa.array([r["url"] for r in rows], pa.string()),
            "warc_ts": pa.array([r["warc_ts"] for r in rows],
                                pa.timestamp("us")),
            "html": pa.array([r["html"] for r in rows], pa.binary()),
            "text": pa.array([r["text"] for r in rows], pa.string()),
            "lang": pa.array([r["lang"] for r in rows], pa.string()),
        })

    (rd.range(n)
     .map_batches(gen, batch_format="numpy", batch_size=500)
     .write_parquet(tmp))
    os.replace(tmp, dir_path)
    return dir_path


def read_pages(path: str, columns: list[str] | None = None):
    """S1 analog: the corpus scan, with column pruning at the read
    (extraction needs only url/html/lang — never load golden text on
    the hot path)."""
    import ray.data as rd
    return rd.read_parquet(path, columns=columns)
