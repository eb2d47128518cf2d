"""HTML byte-stream → token stream (the "binarize + invert" analog).

Reference mapping (SURVEY.md §2.2):
  - M2 ``convert_to_binary_and_invert`` (utils.py:35-39): decode bytes,
    strip script/style/comments, classify every token as markup
    (background, weight 0) or text (foreground, weight = char count).
  - M3 ``deskew`` (preprocess.py:33-51): estimate the document-level
    wrapper nesting offset (min text depth) and subtract it, so the
    rest of the pipeline sees depth-normalized tokens regardless of how
    many ``<html><body><div class=wrap>`` layers enclose the content.
  - X2 composite substitution (integrator.py:26-43): Arabic-language
    pages normalize the composite glyph ``لا`` to the single sentinel
    ``L`` on the way in; span assembly substitutes it back
    (functions/text.py), round-tripping exactly like the reference's
    golden-text loader + ``replace_composities``.

Everything here is pure per-document Python over compiled regexes —
stateless, deterministic, no floats.  It is invoked from inside
``map_batches`` stages only.
"""

from __future__ import annotations

import html as _htmlmod
import re
from dataclasses import dataclass

import numpy as np

# --- token kinds -----------------------------------------------------------
MARKUP = 0
TEXT = 1

# packed per-token flag bits (one list append in the scan loop; the
# bool columns are unpacked vectorized afterwards)
_F_OPEN = 1
_F_CLOSE = 2
_F_BLOCK = 4
_F_LINK = 8
_F_INLINK = 16

# Tags that terminate an inline run: each such token is its own
# zero-weight "row" in the density profile, the analog of the blank
# pixel rows separating lines (segment_words.py:51-72).
BLOCK_TAGS = frozenset(
    """address article aside blockquote body caption dd details dialog div dl dt
    fieldset figcaption figure footer form h1 h2 h3 h4 h5 h6 head header hgroup
    hr html li main menu nav ol option p pre section select summary table tbody
    td tfoot th thead title tr ul""".split()
)

# Void elements never push onto the tag stack.
VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

_COMMENT_RE = re.compile(r"<!--.*?(?:-->|$)", re.S)
_SCRIPT_STYLE_RE = re.compile(
    r"<(script|style)\b[^>]*>.*?(?:</\1\s*>|$)", re.S | re.I
)
# <head> subtree never renders; unclosed heads recover at <body>.
_HEAD_RE = re.compile(r"<head\b[^>]*>.*?(?:</head\s*>|(?=<body\b)|$)", re.S | re.I)
# A stray '<' that opens no tag is literal text (browser recovery).
_STRAY_LT_RE = re.compile(r"<(?![a-zA-Z/!?])")
# A '<' only opens a tag when followed by a letter, '/', '!' or '?'
# (browser-style error recovery; a stray '< ' stays text).  Quoted
# attribute values may contain '>' (inline JSON, onclick handlers) —
# the tag body alternation skips over them like a browser does; each
# alternative is disjoint on its first character, so matching stays
# linear.
_TAG_OR_TEXT_RE = re.compile(
    r"""<([a-zA-Z/!?](?:[^<>"']|"[^"]*"|'[^']*')*)>|([^<]+)"""
)
_CHARSET_RE = re.compile(rb"charset\s*=\s*[\"']?\s*([A-Za-z0-9_\-]+)", re.I)

_CHARSET_ALIASES = {
    "utf-8": "utf-8", "utf8": "utf-8",
    "iso-8859-1": "latin-1", "latin-1": "latin-1", "latin1": "latin-1",
    "windows-1252": "cp1252", "cp1252": "cp1252",
    "ascii": "ascii", "us-ascii": "ascii",
}

COMPOSITE = "لا"  # لا
#: Private Use Area codepoint — can never collide with genuine page
#: text.  r1 used the ASCII letter 'L' (the reference's Arabic-only
#: alphabet made that safe there, integrator.py:26-29); on mixed-script
#: Arabic pages the outbound rewrite corrupted every real Latin 'L'
#: ('London' → 'لاondon', ADVICE r1).  A page that already contains
#: U+E000 (undefined, font-private) would round-trip to لا — accepted
#: and documented; PUA glyphs carry no standardized text semantics.
COMPOSITE_SENTINEL = ""

#: Memoized tag-body parse for the high-frequency attribute-free tags
#: (``p``, ``/p``, ``li``, ``b`` …) — the full per-tag decision:
#: ``(closing, name, opens, base_flags, is_a)``.  ``base_flags``
#: packs every bit that does not depend on the live link_depth
#: (_F_OPEN/_F_CLOSE/_F_BLOCK/_F_LINK), so the scan loop's cached
#: path does zero set lookups and zero per-token flag branches (the
#: r5 frontier: BLOCK_TAGS/VOID_TAGS membership per token was ~8% of
#: the scan).  Attribute-bearing bodies (unique hrefs etc.) are
#: parsed inline and never cached; the cache is size-capped for
#: pathological inputs.
_TAG_INFO: dict[str, tuple[bool, str, bool, int, bool]] = {}


def _tag_info(body: str) -> tuple[bool, str, bool, int, bool]:
    info = _TAG_INFO.get(body)
    if info is None:
        closing = body.startswith("/")
        stripped = body.lstrip("/")
        name = stripped.split()[0].split(">")[0].lower() if stripped else ""
        # A trailing '/' marks self-closing only in a bare "name/" body
        # or when preceded by whitespace/quote.  An UNQUOTED attribute
        # value ending in '/' (common in crawls: <a href=/about/>) is
        # part of the value per the HTML5 unquoted-value state — r1
        # treated it as self-closing, skewing depth/in_link for the
        # whole subtree (ADVICE r1).
        self_closing = False
        if body.endswith("/") and not closing:
            has_attrs = any(c in body for c in " \t\n\r")
            self_closing = (not has_attrs
                            or body[-2:-1] in (" ", "\t", "\n", "\r",
                                               '"', "'"))
        name = name.rstrip("/")
        is_a = name == "a"
        block = _F_BLOCK if name in BLOCK_TAGS else 0
        if closing:
            opens = False
            base = _F_CLOSE | block
        else:
            opens = name not in VOID_TAGS and not self_closing
            base = ((_F_OPEN if opens else 0) | block
                    | (_F_LINK if (is_a and opens) else 0))
        info = (closing, name, opens, base, is_a)
        if " " not in body and len(body) < 16 and len(_TAG_INFO) < 8192:
            _TAG_INFO[body] = info
    return info


@dataclass
class TokenStream:
    """Columnar per-document token stream (arrays, not row objects).

    ``wlist``/``dlist`` are plain-list mirrors of ``weights``/``depths``
    and ``cumw`` the length-(n+1) cumulative weight sum: the
    segmentation kernels index tokens one at a time from Python, and a
    list element access is ~5× cheaper than a numpy scalar extraction
    (measured on the bench corpus); ``cumw`` turns every "does this
    range hold text" / "range text mass" question into O(1).
    ``weight > 0 ⇔ kind == TEXT`` by construction (text tokens are
    non-empty after whitespace collapse)."""

    kinds: np.ndarray      # int8: MARKUP / TEXT
    weights: np.ndarray    # int32: text char count (0 for markup)
    depths: np.ndarray     # int32: wrapper-normalized tag-stack depth
    texts: list            # str per token ('' for markup)
    tags: list             # tag name per markup token ('' for text)
    is_block: np.ndarray   # bool: markup token of a block-level tag
    is_open: np.ndarray    # bool: opening markup token (pushed stack)
    is_close: np.ndarray   # bool: closing markup token (popped stack)
    is_link: np.ndarray    # bool: opening <a> token
    in_link: np.ndarray    # bool: token lies inside an <a> element
    match: np.ndarray      # int32: open<->close partner index, -1 if none
    wlist: list = None     # list[int] mirror of weights
    dlist: list = None     # list[int] mirror of (deskewed) depths
    cumw: np.ndarray = None  # int64 (n+1,) cumulative weights

    def __post_init__(self):
        if self.wlist is None:
            self.wlist = self.weights.tolist()
        if self.dlist is None:
            self.dlist = self.depths.tolist()
        if self.cumw is None:
            self.cumw = np.concatenate(
                [[0], np.cumsum(self.weights, dtype=np.int64)])

    def __len__(self) -> int:
        return len(self.kinds)


def decode_html(raw: bytes) -> str:
    """Charset-sniffing byte decode (deterministic).

    Order: BOM → ``charset=`` declaration in the first 2048 bytes →
    strict UTF-8 → Latin-1 fallback (never fails).  The analog of the
    reference's fixed grayscale read (segment_words.py:215): get a
    canonical "pixel" representation no matter the container encoding.
    """
    if raw.startswith(b"\xef\xbb\xbf"):
        return raw.decode("utf-8-sig", errors="replace")
    if raw.startswith((b"\xff\xfe", b"\xfe\xff")):
        return raw.decode("utf-16", errors="replace")
    m = _CHARSET_RE.search(raw[:2048])
    if m:
        codec = _CHARSET_ALIASES.get(m.group(1).decode("ascii").lower())
        if codec:
            try:
                return raw.decode(codec)
            except (UnicodeDecodeError, LookupError):
                pass
    try:
        return raw.decode("utf-8")
    except UnicodeDecodeError:
        return raw.decode("latin-1")


def strip_invisible(doc: str) -> str:
    """Remove comments and script/style subtrees (must never leak into
    extracted text — FIXTURES.md hazard; binarization analog M2)."""
    doc = _COMMENT_RE.sub(" ", doc)
    doc = _SCRIPT_STYLE_RE.sub(" ", doc)
    doc = _HEAD_RE.sub(" ", doc)
    doc = _STRAY_LT_RE.sub("&lt;", doc)
    return doc


def tokenize(raw: bytes, lang: str = "") -> TokenStream:
    """bytes → :class:`TokenStream`.

    One linear regex scan; maintains a tag stack for depth/tag-path and
    records open↔close partner indices (used by the hole/concavity
    features, F1/F4 analogs).  Ends with the deskew analog: depths are
    shifted so the minimum depth over text tokens is 0.
    """
    doc = strip_invisible(decode_html(raw))

    # Hot loop layout: ONE packed-int flags list instead of five bool
    # lists (the r2 version's 11 parallel appends per token were the
    # single-core frontier); the bool columns are unpacked with
    # vectorized bit tests after the scan, and ``kinds`` is derived
    # from ``weights`` (text ⇔ weight > 0).
    weights: list[int] = []
    depths: list[int] = []
    texts: list[str] = []
    tags: list[str] = []
    flags: list[int] = []
    match: list[int] = []

    stack: list[tuple[str, int]] = []  # (tag, token index of the open)
    normalize_ar = lang == "ar"
    link_depth = 0  # number of open <a> elements (O(1) containment test)

    # bound-method locals: ~300k tokens/batch make attribute lookups a
    # measurable slice of the scan
    w_app = weights.append
    d_app = depths.append
    t_app = texts.append
    g_app = tags.append
    f_app = flags.append
    m_app = match.append
    tag_info = _tag_info
    tag_cache_get = _TAG_INFO.get  # inline the hit path (~95% of tags)

    n_tok = 0     # == len(weights); counter beats 1M len() calls
    depth = 0     # == len(stack)
    for m in _TAG_OR_TEXT_RE.finditer(doc):
        if m.lastindex == 1:  # tag (single-group fetch beats group(1,2))
            body = m.group(1).strip()
            if body[0] in "!?":  # regex guarantees body[0] exists
                continue  # doctype / processing instruction: no token
            info = tag_cache_get(body) or tag_info(body)
            closing, name, opens, base, is_a = info
            if not name:
                continue
            idx = n_tok
            # Depth convention: an element's open and close tokens carry
            # its *inside* depth (same depth as its text content), so a
            # nested element is one contiguous deeper excursion —
            # the "glyph body" the fine-cut stage looks for (C1).
            if closing:
                # Error recovery: pop through a matching open if one is
                # on the stack, else ignore the stray close.  Fast path:
                # the close matches the top of the stack (~all of a
                # well-formed page).
                found = depth - 1
                if found < 0 or stack[found][0] != name:
                    found = -1
                    for si in range(depth - 2, -1, -1):
                        if stack[si][0] == name:
                            found = si
                            break
                    if found < 0:
                        continue
                while depth > found:
                    popped_tag, open_idx = stack.pop()
                    depth -= 1
                    if popped_tag == "a":
                        link_depth -= 1
                    if depth == found:  # the matching open
                        match[open_idx] = idx
                        partner = open_idx
                w_app(0)
                d_app(found + 1)
                t_app(""); g_app(name)
                f_app(base | _F_INLINK if (is_a or link_depth) else base)
                m_app(partner)
            else:
                w_app(0)
                d_app(depth + 1 if opens else depth)
                t_app(""); g_app(name)
                # base already carries _F_LINK for an opening <a>
                f_app(base | _F_INLINK if (base & _F_LINK or link_depth)
                      else base)
                m_app(-1)
                if opens:
                    stack.append((name, idx))
                    depth += 1
                    if is_a:
                        link_depth += 1
            n_tok = idx + 1
        else:
            text = m.group(2)
            if "&" in text:  # entity fast path: unescape is a no-op
                text = _htmlmod.unescape(text)  # without an ampersand
            t = " ".join(text.split())  # ≡ _WS_RE.sub(" ", ·).strip()
            if not t:
                continue  # whitespace-only: background, no token
            if normalize_ar:
                t = t.replace(COMPOSITE, COMPOSITE_SENTINEL)
            w_app(len(t))
            d_app(depth)
            t_app(t); g_app("")
            f_app(_F_INLINK if link_depth else 0)
            m_app(-1)
            n_tok += 1

    w = np.asarray(weights, dtype=np.int32)
    k = np.where(w > 0, TEXT, MARKUP).astype(np.int8)
    d = np.asarray(depths, dtype=np.int32)
    # Deskew analog (M3, preprocess.py:33-51): subtract the global
    # wrapper offset = min depth over *text* tokens.
    text_mask = w > 0
    if text_mask.any():
        d = d - int(d[text_mask].min())
        np.maximum(d, 0, out=d)

    f = np.asarray(flags, dtype=np.uint8)
    return TokenStream(
        kinds=k,
        weights=w,
        depths=d,
        texts=texts,
        tags=tags,
        is_block=(f & _F_BLOCK) != 0,
        is_open=(f & _F_OPEN) != 0,
        is_close=(f & _F_CLOSE) != 0,
        is_link=(f & _F_LINK) != 0,
        in_link=(f & _F_INLINK) != 0,
        match=np.asarray(match, dtype=np.int32),
        wlist=weights,
        dlist=d.tolist(),
    )
