"""E19: EPUB member extraction.

The reference iterates zip members in archive order, keeps names ending in
``.html/.xhtml/.htm``, soup-strips script/style and takes ``get_text()``
(stripped, empty members dropped), stops once cumulative member size
exceeds MAX_EXTRACTED_SIZE (100 MB), and joins member texts with "\\n\\n"
(app/extractors.py:1107-1167).

Members arrive pre-unzipped as JSON payloads ``{"name": str, "content": str,
"size": int}`` — one span per member, in member order. The pipeline calls
``extract_epub_member`` per span and the fan-in join ("\\n\\n") is the span
boundary itself.
"""

from __future__ import annotations

import json

from ..config import MAX_EXTRACTED_SIZE
from .html import get_text

_HTML_SUFFIXES = (".html", ".xhtml", ".htm")


def is_epub_html_member(name: str) -> bool:
    return name.endswith(_HTML_SUFFIXES)


def extract_epub_member(payload: str) -> str | None:
    """One member -> stripped text, or None when filtered/empty."""
    member = json.loads(payload)
    if not is_epub_html_member(member.get("name", "")):
        return None
    text = get_text(member.get("content", ""))
    text = text.strip()
    return text if text else None


def epub_members_budget(sizes: list[int]) -> int:
    """How many leading members fit the 100 MB cumulative cap.

    Mirrors the reference's pre-add check (:1137-1142): it stops *before*
    processing a member that would push the running total over the cap.
    """
    total = 0
    for i, size in enumerate(sizes):
        if total + size > MAX_EXTRACTED_SIZE:
            return i
        total += size
    return len(sizes)
