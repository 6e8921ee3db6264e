"""E17: minimal from-scratch RTF control-word stripper.

The reference delegates to ``striprtf.rtf_to_text`` on a utf-8/replace
decode (app/extractors.py:980-992). This module implements the small RTF
grammar the corpus exercises: groups ``{}``, control words (``\\par``/
``\\line`` -> newline, ``\\tab`` -> tab, destination groups like
``\\fonttbl``/``\\colortbl``/``\\stylesheet``/``\\info``/``\\pict`` and
``\\*`` skipped entirely), hex escapes ``\\'hh``, escaped braces and
backslashes, and unicode escapes ``\\uN?``.
"""

from __future__ import annotations

_DESTINATIONS = {
    "fonttbl", "colortbl", "stylesheet", "info", "pict", "header",
    "footer", "generator",
}

_SPECIAL = {"par": "\n", "line": "\n", "tab": "\t", "emdash": "—",
            "endash": "–", "lquote": "‘", "rquote": "’",
            "ldblquote": "“", "rdblquote": "”", "~": " "}


def rtf_to_text(payload: str) -> str:
    out: list[str] = []
    i, n = 0, len(payload)
    skip_depth = 0          # inside a destination group until depth drops
    depth = 0
    skip_until_depth = -1
    while i < n:
        c = payload[i]
        if c == "{":
            depth += 1
            i += 1
        elif c == "}":
            depth -= 1
            if skip_until_depth >= 0 and depth < skip_until_depth:
                skip_until_depth = -1
            i += 1
        elif c == "\\":
            i += 1
            if i >= n:
                break
            nc = payload[i]
            if nc in "\\{}":
                if skip_until_depth < 0:
                    out.append(nc)
                i += 1
            elif nc == "'":
                hexpair = payload[i + 1 : i + 3]
                if skip_until_depth < 0:
                    try:
                        out.append(bytes([int(hexpair, 16)]).decode("cp1252"))
                    except ValueError:
                        pass
                i += 3
            elif nc == "*":
                skip_until_depth = depth
                i += 1
            elif nc.isalpha():
                j = i
                while j < n and payload[j].isalpha():
                    j += 1
                word = payload[i:j]
                # optional numeric parameter
                k = j
                if k < n and (payload[k] == "-" or payload[k].isdigit()):
                    k += 1
                    while k < n and payload[k].isdigit():
                        k += 1
                param = payload[j:k]
                if k < n and payload[k] == " ":
                    k += 1
                if word in _DESTINATIONS:
                    skip_until_depth = depth
                elif skip_until_depth < 0:
                    if word in _SPECIAL:
                        out.append(_SPECIAL[word])
                    elif word == "u" and param:
                        code = int(param)
                        out.append(chr(code + 65536 if code < 0 else code))
                        if k < n and payload[k] == "?":
                            k += 1
                i = k
            else:
                if skip_until_depth < 0 and nc in _SPECIAL:
                    out.append(_SPECIAL[nc])
                i += 1
        else:
            if skip_until_depth < 0:
                out.append(c)
            i += 1
    text = "".join(out)
    # striprtf normalizes: leading/trailing whitespace off each output
    return text.strip()
