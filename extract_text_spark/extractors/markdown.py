"""E13: Markdown -> text (app/extractors.py:930-947).

The reference pipes ``markdown.markdown(text)`` into BeautifulSoup
``get_text()`` with *no* cleanup pass. This module reproduces that composite
observable behaviour from scratch for the core Markdown constructs the
Python-Markdown default configuration supports (no extensions): ATX
headings, paragraphs, unordered/ordered lists (flat), blockquotes
(single level), indented code blocks (4 spaces), inline emphasis /
code / links / images, hard blank-line block separation.

Why not "markdown -> my HTML -> get_text": Python-Markdown emits one "\n"
text node between block elements and inside list/blockquote wrappers; those
newlines survive ``get_text()``. We generate the *text* directly with the
same newline placement; each block renders to its get_text() image and
blocks are joined with a single "\n".
"""

from __future__ import annotations

import re

_INLINE_PATTERNS = [
    (re.compile(r"!\[([^\]]*)\]\([^)]*\)"), r"\1"),   # image -> alt text
    (re.compile(r"\[([^\]]*)\]\([^)]*\)"), r"\1"),    # link -> label
    (re.compile(r"\*\*([^*]+)\*\*"), r"\1"),            # bold
    (re.compile(r"__([^_]+)__"), r"\1"),                 # bold
    (re.compile(r"\*([^*]+)\*"), r"\1"),                 # italic
    (re.compile(r"_([^_]+)_"), r"\1"),                   # italic
    (re.compile(r"`([^`]+)`"), r"\1"),                   # inline code
]

# Per-pattern trigger chars, applied IN THE ORIGINAL ORDER: a pattern
# can only match when its literal trigger char is present in the
# CURRENT text, so `trigger in text` before each sub skips the regex
# scan with byte-identical output. (Do NOT group/reorder by trigger:
# the `**`/`__`/`*`/`_` interleaving is load-bearing — `*` subs can
# create new `__` adjacencies, e.g. '_*_*_x_*_*_', and running `__`
# after `*` instead of before changes the result.)
_INLINE_TRIGGERS = ["[", "[", "*", "_", "*", "_", "`"]


def _inline(text: str) -> str:
    for trigger, (pat, rep) in zip(_INLINE_TRIGGERS, _INLINE_PATTERNS):
        if trigger in text:
            text = pat.sub(rep, text)
    return text


# Block-structure patterns hoisted out of the per-line loop (module-level
# compile skips the re-cache lookup per call; patterns unchanged).
_ATX_RE = re.compile(r"^(#{1,6})\s+(.*?)\s*#*\s*$")
_LIST_RE = re.compile(r"^[ ]{0,3}([-*+]|\d+\.)\s+(.*)$")
_STRUCT_RE = re.compile(r"^([ ]{0,3}([-*+]|\d+\.)\s+|#{1,6}\s+|>)")


def md_to_text(payload: str) -> str:
    """Markdown -> plain text matching markdown.markdown()+get_text()."""
    lines = payload.split("\n")
    blocks: list[str] = []
    i, n = 0, len(lines)
    while i < n:
        line = lines[i]
        if not line.strip():
            i += 1
            continue
        # Indented code block (4 spaces / tab).
        if line.startswith("    ") or line.startswith("\t"):
            code: list[str] = []
            while i < n and (
                lines[i].startswith("    ")
                or lines[i].startswith("\t")
                or not lines[i].strip()
            ):
                if lines[i].strip():
                    code.append(lines[i][4:] if lines[i].startswith("    ") else lines[i][1:])
                elif code:
                    code.append("")
                i += 1
            while code and not code[-1]:
                code.pop()
            # <pre><code>...\n</code></pre> -> get_text keeps content + "\n"
            blocks.append("\n".join(code) + "\n")
            continue
        # ATX heading.
        m = _ATX_RE.match(line)
        if m:
            blocks.append(_inline(m.group(2)))
            i += 1
            continue
        # Blockquote (single level): <blockquote>\n<p>..</p>\n</blockquote>
        if line.lstrip().startswith(">"):
            quote: list[str] = []
            while i < n and lines[i].lstrip().startswith(">"):
                quote.append(lines[i].lstrip()[1:].lstrip())
                i += 1
            blocks.append("\n" + _inline(" ".join(q for q in quote if q)) + "\n")
            continue
        # List (flat): <ul>\n<li>a</li>\n<li>b</li>\n</ul>
        m = _LIST_RE.match(line)
        if m:
            items: list[str] = []
            while i < n:
                mm = _LIST_RE.match(lines[i])
                if not mm:
                    break
                items.append(_inline(mm.group(2).strip()))
                i += 1
            blocks.append("\n" + "\n".join(items) + "\n")
            continue
        # Paragraph: consecutive non-blank, non-structural lines joined "\n".
        para: list[str] = []
        while i < n and lines[i].strip() and not _STRUCT_RE.match(
            lines[i]
        ) and not lines[i].startswith(("    ", "\t")):
            para.append(lines[i].strip())
            i += 1
        blocks.append(_inline("\n".join(para)))
    return "\n".join(blocks)
