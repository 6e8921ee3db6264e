"""E9 plain text + E10 source code extraction kernels.

Reference semantics:
* plain: decode via the 12-encoding chain (app/extractors.py:637-643).
* source code: decode, then prepend
  ``=== {Language} File: {filename} ===\\nLines: {n}\\n``
  (+ ``Warning: Large file with {n} lines\\n`` when n > 1000), then a rule of
  fifty ``=`` and a newline, then the raw text (app/extractors.py:752-758,
  889-903). Language map: app/extractors.py:765-887 (default "Source Code").
"""

from __future__ import annotations

from .encodings import decode_text_content

# app/extractors.py:765-887 — extension -> language (keys lowercased lookup).
LANGUAGE_MAP = {
    "py": "Python", "pyx": "Python", "pyi": "Python", "pyw": "Python",
    "js": "JavaScript", "jsx": "JavaScript", "ts": "TypeScript",
    "tsx": "TypeScript", "mjs": "JavaScript", "cjs": "JavaScript",
    "java": "Java", "jav": "Java",
    "c": "C", "cpp": "C++", "cxx": "C++", "cc": "C++", "c++": "C++",
    "h": "C Header", "hpp": "C++ Header", "hxx": "C++ Header",
    "h++": "C++ Header",
    "cs": "C#", "csx": "C#",
    "php": "PHP", "php3": "PHP", "php4": "PHP", "php5": "PHP",
    "phtml": "PHP",
    "rb": "Ruby", "rbw": "Ruby", "rake": "Ruby", "gemspec": "Ruby",
    "go": "Go", "mod": "Go Module", "sum": "Go Sum",
    "rs": "Rust", "rlib": "Rust Library",
    "swift": "Swift",
    "kt": "Kotlin", "kts": "Kotlin Script",
    "scala": "Scala", "sc": "Scala",
    "r": "R", "rmd": "R Markdown",
    "sql": "SQL", "ddl": "SQL DDL", "dml": "SQL DML",
    "sh": "Shell", "bash": "Bash", "zsh": "Zsh", "fish": "Fish",
    "ksh": "Ksh", "csh": "Csh", "tcsh": "Tcsh",
    "ps1": "PowerShell", "psm1": "PowerShell Module",
    "psd1": "PowerShell Data",
    "pl": "Perl", "pm": "Perl Module", "pod": "Perl Documentation",
    "t": "Perl Test",
    "lua": "Lua",
    "bsl": "1C:Enterprise", "os": "OneScript",
    "ini": "INI Config", "cfg": "Config", "conf": "Config",
    "config": "Config", "toml": "TOML", "properties": "Properties",
    "css": "CSS", "scss": "SCSS", "sass": "Sass", "less": "Less",
    "styl": "Stylus",
    "tex": "LaTeX", "latex": "LaTeX", "rst": "reStructuredText",
    "adoc": "AsciiDoc", "asciidoc": "AsciiDoc",
    "jsonl": "JSON Lines", "ndjson": "NDJSON", "jsonc": "JSON with Comments",
    "dockerfile": "Dockerfile", "containerfile": "Containerfile",
    "makefile": "Makefile", "mk": "Makefile", "mak": "Makefile",
    "gitignore": "Git Ignore", "gitattributes": "Git Attributes",
    "gitmodules": "Git Modules",
}

LARGE_FILE_LINES = 1000  # app/extractors.py:900


def extract_plain(content: bytes) -> str:
    """E9 (app/extractors.py:637-643)."""
    return decode_text_content(content)


def get_programming_language(extension: str) -> str:
    """app/extractors.py:760-763 (case-insensitive, default 'Source Code')."""
    return LANGUAGE_MAP.get(extension.lower(), "Source Code")


def source_code_header(language: str, filename: str, text: str) -> str:
    """app/extractors.py:889-903."""
    header = f"=== {language} File: {filename} ===\n"
    line_count = len(text.split("\n"))
    header += f"Lines: {line_count}\n"
    if line_count > LARGE_FILE_LINES:
        header += f"Warning: Large file with {line_count} lines\n"
    return header


def extract_source_code(content: bytes, extension: str, filename: str) -> str:
    """E10 (app/extractors.py:737-758)."""
    text = decode_text_content(content)
    language = get_programming_language(extension)
    return source_code_header(language, filename, text) + "=" * 50 + "\n" + text
