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


def extract_epub_doc(payload: str) -> str | None:
    """Whole-book payload (ingest path) -> joined text, reference control
    flow bug-for-bug (app/extractors.py:1107-1167): the budget check runs
    for EVERY member in archive order and breaks the loop when
    ``extracted + member.size`` would exceed the cap — even for a non-html
    member that would never be read — while only html members contribute
    text and accumulate size.
    """
    data = json.loads(payload)
    parts: list[str] = []
    extracted = 0
    for member in data.get("members", []):
        if extracted + member["size"] > MAX_EXTRACTED_SIZE:
            break
        if is_epub_html_member(member.get("name", "")):
            text = get_text(member.get("content", "")).strip()
            if text:
                parts.append(text)
            extracted += member["size"]
    return "\n\n".join(parts) if parts else None


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
