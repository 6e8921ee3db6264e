"""E11/E12: from-scratch HTML tokenizer + boilerplate stripper.

No external HTML library. A single tolerant tokenizer feeds three modes:

* ``strip_html(payload, mode="file")`` — reference-compat file mode
  (app/extractors.py:905-928): drop ``script``/``style`` subtrees, take the
  concatenation of the remaining text nodes in document order (the
  equivalent of BeautifulSoup ``get_text()``), then the reference's cleanup:
  per-line strip, split lines on double-space into phrases, drop empties,
  join with ``\\n``.
* ``strip_html(payload, mode="page")`` — reference-compat page mode
  (app/extractors.py:2988-3014): additionally drop ``nav``/``header``/
  ``footer``/``aside``; cleanup is line-strip + drop empties + join ``\\n``
  (no double-space phrase split).
* ``extract_main_content(payload)`` — heuristic main-content mode (the
  north-rule DOM-heuristics layer): block segmentation at block-level tags
  with per-block text-density / link-density / stopword-density scoring in
  the style of the published boilerpipe (Kohlschütter et al., WSDM 2010)
  and jusText (Pomikálek 2011) heuristics, plus a neighbour-promotion pass.

Tokenizer tolerances: comments, doctype, CDATA, quoted attributes containing
``>``, unterminated tags at EOF, raw-text (CDATA-content) handling of
``script``/``style``, void elements, HTML entity unescaping (stdlib
``html.unescape`` — same named/numeric tables html.parser uses).
"""

from __future__ import annotations

import re
import string
from html import unescape

# Elements whose content html.parser treats as raw text (no nested tags).
_RAWTEXT = {"script", "style"}

# ASCII-only lowercase table for close-tag search: length-preserving (real
# str.lower() can CHANGE length — 'İ'.lower() is two chars — which would
# misalign find() indices), and tag names are ASCII so this matches
# html.parser's ASCII-case-insensitive end-tag scan.
_ASCII_LOWER = str.maketrans(string.ascii_uppercase, string.ascii_lowercase)

# Void elements never push nesting depth.
_VOID = {
    "area", "base", "br", "col", "embed", "hr", "img", "input", "link",
    "meta", "param", "source", "track", "wbr",
}

# Block-level boundaries for the heuristic segmenter.
_BLOCK_TAGS = {
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul", "ol",
    "table", "tr", "td", "th", "blockquote", "pre", "article", "section",
    "main", "nav", "header", "footer", "aside", "figure", "figcaption",
    "br", "form", "dl", "dt", "dd", "body", "html", "title",
}

_STOPWORDS = frozenset(
    "the a an and or of to in is are was were be been it this that for on "
    "with as by at from not but have has had he she they we you i его на и "
    "в не что с по как это из у за от так же то все она он".split()
)


_TAG_SCAN_RE = re.compile("[\"'>]")
# ASCII prefix of the tag-name charset (isalnum() | "-_:"); the char
# loop below continues from the regex end, so non-ASCII Unicode
# alphanumerics still take the exact original predicate.
_NAME_ASCII_RE = re.compile(r"[A-Za-z0-9:_\-]*")


def _scan_tag(html: str, i: int) -> tuple[int, str, bool, bool]:
    """Scan a tag starting at ``html[i] == '<'``.

    Returns (index after tag, tag name lowercased, is_end_tag, self_closing).
    Attribute values in single/double quotes may contain '>'.
    """
    n = len(html)
    j = i + 1
    is_end = False
    if j < n and html[j] == "/":
        is_end = True
        j += 1
    start = j
    j = _NAME_ASCII_RE.match(html, j).end()
    while j < n and (html[j].isalnum() or html[j] in "-_:"):
        j += 1
    name = html[start:j].lower()
    # Scan to the closing '>', honouring quoted attribute values — via
    # C-level find/search jumps instead of the former per-char loop:
    # outside a quote the next interesting char is one of >"', inside a
    # quote it is the closing quote; identical state machine, identical
    # end position and unterminated-quote handling.
    quote_open = False
    while j < n:
        m = _TAG_SCAN_RE.search(html, j)
        if m is None:
            j = n
            break
        c = m.group()
        j = m.start()
        if c == ">":
            break
        k = html.find(c, j + 1)
        if k < 0:
            j = n
            quote_open = True
            break
        j = k + 1
    self_closing = j > i and html[j - 1 : j] == "/" and not quote_open
    return (j + 1 if j < n else n), name, is_end, self_closing


def tokenize(html: str):
    """Yield ('text', data) / ('start', tag) / ('end', tag) events."""
    i, n = 0, len(html)
    low = None  # built once on first rawtext element; O(n*tags) otherwise
    while i < n:
        lt = html.find("<", i)
        if lt < 0:
            if i < n:
                yield ("text", unescape(html[i:]))
            break
        if lt > i:
            yield ("text", unescape(html[i:lt]))
        # One char peek dispatches the three markup-declaration branches
        # (all start "<!" or "<?"), so ordinary tags skip the startswith
        # chain; branch order and semantics unchanged.
        nxt = html[lt + 1 : lt + 2]
        if nxt == "!" or nxt == "?":
            if html.startswith("<!--", lt):
                end = html.find("-->", lt + 4)
                i = n if end < 0 else end + 3
                continue
            if html.startswith("<![CDATA[", lt):
                end = html.find("]]>", lt + 9)
                if end < 0:
                    yield ("text", html[lt + 9 :])
                    i = n
                else:
                    yield ("text", html[lt + 9 : end])
                    i = end + 3
                continue
            end = html.find(">", lt)
            i = n if end < 0 else end + 1
            continue
        if not (nxt.isalpha() or nxt == "/"):
            # Bare '<' — html.parser emits it as text.
            yield ("text", "<")
            i = lt + 1
            continue
        i, name, is_end, self_closing = _scan_tag(html, lt)
        if not name:
            continue
        if is_end:
            yield ("end", name)
            continue
        yield ("start", name)
        if self_closing or name in _VOID:
            yield ("end", name)
        elif name in _RAWTEXT:
            # Raw-text content: everything up to the matching close tag.
            if low is None:
                low = html.translate(_ASCII_LOWER)
            close = low.find(f"</{name}", i)
            raw_end = n if close < 0 else close
            # Raw text is *not* emitted here — callers always drop it; if a
            # mode ever keeps script text, emit it as a text event instead.
            yield ("rawtext", html[i:raw_end])
            if close < 0:
                i = n
            else:
                i, _, _, _ = _scan_tag(html, close)
                yield ("end", name)
    return


def get_text(html: str, drop: frozenset | set = frozenset(_RAWTEXT)) -> str:
    """BeautifulSoup-``get_text()`` equivalent with dropped subtrees.

    Text nodes are concatenated in document order with no separator; any
    element whose tag is in ``drop`` removes its whole subtree (matching
    ``soup([tags]).decompose()`` at app/extractors.py:915-916, 2997-2998).
    """
    out: list[str] = []
    skip: dict[str, int] = {}
    skipping = 0
    for ev, data in tokenize(html):
        if ev == "start":
            if data in drop:
                skip[data] = skip.get(data, 0) + 1
                skipping += 1
        elif ev == "end":
            if data in drop and skip.get(data, 0) > 0:
                skip[data] -= 1
                skipping -= 1
        elif ev == "text":
            if not skipping:
                out.append(data)
        # rawtext events are always dropped (script/style only).
    return "".join(out)


def _tag_attrs(tag_src: str) -> dict[str, str | None]:
    """Parse attributes from one start tag's raw text (``'<img a="b" c>'``).

    html.parser semantics: names ASCII-lowercased, entity-unescaped values,
    valueless attributes map to ``None`` (html.parser emits ``(name, None)``
    and BeautifulSoup stores it as-is), duplicate names last-wins.
    """
    i, n = 1, len(tag_src)
    while i < n and (tag_src[i].isalnum() or tag_src[i] in "-_:/"):
        i += 1
    attrs: dict[str, str | None] = {}
    while i < n:
        while i < n and tag_src[i] in " \t\r\n\f/":
            i += 1
        if i >= n or tag_src[i] == ">":
            break
        start = i
        while i < n and tag_src[i] not in " \t\r\n\f=/>":
            i += 1
        name = tag_src[start:i].lower()
        while i < n and tag_src[i] in " \t\r\n\f":
            i += 1
        value: str | None = None
        if i < n and tag_src[i] == "=":
            i += 1
            while i < n and tag_src[i] in " \t\r\n\f":
                i += 1
            if i < n and tag_src[i] in "\"'":
                q = tag_src[i]
                i += 1
                vstart = i
                while i < n and tag_src[i] != q:
                    i += 1
                value = tag_src[vstart:i]
                i += 1
            else:
                vstart = i
                while i < n and tag_src[i] not in " \t\r\n\f>":
                    i += 1
                value = tag_src[vstart:i]
        if name:
            attrs[name] = unescape(value) if value is not None else None
    return attrs


def _find_attr_values(html: str, tag: str, attr: str,
                      cap: int | None = None) -> list[str]:
    """Document-order values of ``attr`` on ``tag`` elements that CARRY
    the attribute (presence matches, even empty — lxml-builder parity:
    a bare attribute yields ""). Comments/CDATA/doctype are skipped and
    script/style raw text is not element soup; an unclosed rawtext
    element swallows the rest of the document, like the tokenizer."""
    out: list[str] = []
    i, n = 0, len(html)
    low = None
    while i < n and (cap is None or len(out) < cap):
        lt = html.find("<", i)
        if lt < 0:
            break
        if html.startswith("<!--", lt):
            end = html.find("-->", lt + 4)
            i = n if end < 0 else end + 3
            continue
        if html.startswith("<![CDATA[", lt):
            end = html.find("]]>", lt + 9)
            i = n if end < 0 else end + 3
            continue
        if html.startswith("<!", lt) or html.startswith("<?", lt):
            end = html.find(">", lt)
            i = n if end < 0 else end + 1
            continue
        nxt = html[lt + 1 : lt + 2]
        if not (nxt.isalpha() or nxt == "/"):
            i = lt + 1
            continue
        j, name, is_end, _self_closing = _scan_tag(html, lt)
        if not is_end and name == tag:
            attrs = _tag_attrs(html[lt:j])
            if attr in attrs:
                out.append(attrs[attr] or "")
        elif not is_end and name in _RAWTEXT:
            if low is None:
                low = html.translate(_ASCII_LOWER)
            close = low.find(f"</{name}", j)
            if close < 0:
                break
            j, _, _, _ = _scan_tag(html, close)
        i = j
    return out


def find_img_srcs(html: str, cap: int | None = None) -> list[str]:
    """Document-order ``src`` values of ``<img>`` elements that carry a
    ``src`` attribute — BeautifulSoup ``find_all("img", src=True)`` parity
    (app/extractors.py:3085-3089: attribute *presence* matches, even empty).
    Imgs inside comments or script/style raw text are not element nodes and
    are skipped. ``cap`` is the reference's ``[:max_images]`` document-order
    cap applied before categorization (:3088-3089). A valueless ``src``
    yields ``""`` — the reference parses with the lxml builder
    (``BeautifulSoup(html_content, "lxml")``, :3086; lxml pinned in
    requirements.txt), where a bare attribute's value is the empty string —
    so it is categorized as a URL image and dropped by the ``if not
    img_src`` guard in ``_process_single_image`` (:3181), losing only that
    one image.
    """
    return _find_attr_values(html, "img", "src", cap)


def find_hrefs(html: str, cap: int | None = None) -> list[str]:
    """Document-order ``href`` values of ``<a>`` elements that carry an
    ``href`` attribute — the outlink twin of ``find_img_srcs`` (same
    shared walker, same bare-attribute "" semantics). Harvesting anchors
    is the first step of link-graph construction (host PageRank, crawl
    frontiers)."""
    return _find_attr_values(html, "a", "href", cap)


def find_title(html: str) -> str | None:
    """First ``<title>`` element's RCDATA content: raw text up to the
    case-insensitive ``</title`` close, entity-unescaped, whitespace
    collapsed to single spaces. Same non-element skip rules as the
    attribute walker (comments/CDATA/doctype are not tags; titles
    inside script/style raw text are not elements). An UNCLOSED title
    returns None — the RCDATA rule would swallow the rest of the
    document, and a megabyte "title" is noise, not metadata."""
    from html import unescape as _unescape

    i, n = 0, len(html)
    low = None
    while i < n:
        lt = html.find("<", i)
        if lt < 0:
            return None
        if html.startswith("<!--", lt):
            end = html.find("-->", lt + 4)
            i = n if end < 0 else end + 3
            continue
        if html.startswith("<![CDATA[", lt):
            end = html.find("]]>", lt + 9)
            i = n if end < 0 else end + 3
            continue
        if html.startswith("<!", lt) or html.startswith("<?", lt):
            end = html.find(">", lt)
            i = n if end < 0 else end + 1
            continue
        nxt = html[lt + 1 : lt + 2]
        if not (nxt.isalpha() or nxt == "/"):
            i = lt + 1
            continue
        j, name, is_end, _sc = _scan_tag(html, lt)
        if low is None:
            low = html.translate(_ASCII_LOWER)
        if not is_end and name == "title":
            # RCDATA end-tag rule: "</title" only closes when followed
            # by whitespace, "/" or ">" (else "</titles>" would cut the
            # title short — the end-tag-open state keeps scanning)
            close = j
            while True:
                close = low.find("</title", close)
                if close < 0:
                    return None
                nxt8 = low[close + 7 : close + 8]
                if nxt8 in " \t\n\r\f/>" and nxt8:
                    break
                close += 1      # "</titles..." or EOF-truncated: not a
                #                 real end tag, keep scanning (-> None)
            return " ".join(_unescape(html[j:close]).split())
        if not is_end and name in _RAWTEXT:
            close = low.find(f"</{name}", j)
            if close < 0:
                return None
            j, _, _, _ = _scan_tag(html, close)
        i = j
    return None


_FILE_DROP = frozenset({"script", "style"})
_PAGE_DROP = frozenset({"script", "style", "nav", "header", "footer", "aside"})


def strip_html(payload: str, mode: str = "file") -> str:
    """Reference-compat HTML text extraction.

    mode="file": app/extractors.py:905-928 (E11) — drop script/style;
    line-strip; split on double-space; drop empties; join "\\n".
    mode="page": app/extractors.py:2988-3014 (E12) — drop script/style/nav/
    header/footer/aside; line-strip; drop empties; join "\\n".
    """
    if mode == "file":
        text = get_text(payload, _FILE_DROP)
        lines = (line.strip() for line in text.splitlines())
        chunks = (phrase.strip() for line in lines for phrase in line.split("  "))
        return "\n".join(chunk for chunk in chunks if chunk)
    if mode == "page":
        text = get_text(payload, _PAGE_DROP)
        return "\n".join(
            line.strip() for line in text.splitlines() if line.strip()
        )
    raise ValueError(f"unknown strip_html mode: {mode}")


# ---------------------------------------------------------------------------
# Heuristic main-content mode (boilerpipe/jusText-style densities)
# ---------------------------------------------------------------------------

class _Block:
    __slots__ = ("text", "link_chars", "tag")

    def __init__(self, tag: str):
        self.text: list[str] = []
        self.link_chars = 0
        self.tag = tag


def _segment_blocks(html: str) -> list[tuple[str, float, str]]:
    """Segment into text blocks -> [(text, link_density, container_tag)]."""
    blocks: list[tuple[str, float, str]] = []
    cur = _Block("body")
    link_depth = 0
    drop: dict[str, int] = {}
    dropping = 0
    container = ["body"]

    def flush() -> None:
        nonlocal cur
        text = " ".join("".join(cur.text).split())
        if text:
            total = sum(len(t) for t in cur.text)
            ld = cur.link_chars / total if total else 0.0
            blocks.append((text, ld, cur.tag))
        cur = _Block(container[-1])

    for ev, data in tokenize(html):
        if ev == "start":
            if data in _PAGE_DROP and data in {"script", "style"}:
                drop[data] = drop.get(data, 0) + 1
                dropping += 1
            elif data == "a":
                link_depth += 1
            if data in _BLOCK_TAGS:
                flush()
                if data not in _VOID:
                    container.append(data)
                    cur.tag = data
        elif ev == "end":
            if data in {"script", "style"} and drop.get(data, 0) > 0:
                drop[data] -= 1
                dropping -= 1
            elif data == "a" and link_depth:
                link_depth -= 1
            if data in _BLOCK_TAGS and data not in _VOID:
                flush()
                if len(container) > 1 and container[-1] == data:
                    container.pop()
                cur.tag = container[-1]
        elif ev == "text":
            if not dropping and data.strip():
                cur.text.append(data)
                if link_depth:
                    cur.link_chars += len(data)
    flush()
    return blocks


def _stopword_density(text: str) -> float:
    words = text.lower().split()
    if not words:
        return 0.0
    return sum(1 for w in words if w.strip(".,;:!?()\"'") in _STOPWORDS) / len(words)


def extract_main_content(
    payload: str,
    min_good_len: int = 80,
    max_link_density: float = 0.33,
    min_stopword_density: float = 0.18,
) -> str:
    """Main-content extraction via text/link/stopword density scoring.

    Classification per block (jusText-style):
      * GOOD — long enough AND low link density AND prose-like stopword
        density, and not inside chrome containers (nav/header/footer/aside).
      * NEAR-GOOD promotion — short low-link blocks sandwiched between GOOD
        neighbours are kept (headings between paragraphs).
    Returns the kept blocks joined with "\\n".
    """
    blocks = _segment_blocks(payload)
    chrome = {"nav", "header", "footer", "aside"}
    labels: list[bool] = []
    for text, ld, tag in blocks:
        if tag in chrome:
            labels.append(False)
            continue
        good = (
            len(text) >= min_good_len
            and ld <= max_link_density
            and _stopword_density(text) >= min_stopword_density
        )
        labels.append(good)
    # Neighbour promotion — deliberately narrow: only heading-tagged blocks
    # next to good content, or short blocks directly sandwiched between two
    # good blocks (jusText's "near-good" idea). Promoting any short
    # neighbour would resurrect chrome like "SUBSCRIBE NOW" banners.
    headings = {"h1", "h2", "h3", "h4", "h5", "h6", "title"}
    promoted = list(labels)
    for i, (text, ld, tag) in enumerate(blocks):
        if labels[i] or tag in chrome or ld > 0.2 or not text:
            continue
        prev_good = i > 0 and labels[i - 1]
        next_good = i + 1 < len(labels) and labels[i + 1]
        if tag in headings and (prev_good or next_good):
            promoted[i] = True
        elif prev_good and next_good:
            promoted[i] = True
    return "\n".join(b[0] for b, keep in zip(blocks, promoted) if keep)
