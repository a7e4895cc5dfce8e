"""Text/file helpers (reference utils.h read_text/split; pstring.h utf8).

Python strings are already unicode, so the reference's utf8<->utf32
machinery (pstring.h) reduces to plain ``str`` here; the .gt.txt reading
convention (strip trailing newline) is preserved.
"""

from __future__ import annotations

from typing import List


def read_text(fname: str) -> str:
    """Read a text file, stripping the trailing newline (reference
    read_text semantics for .gt.txt transcripts)."""
    with open(fname, "r", encoding="utf-8") as f:
        s = f.read()
    if s.endswith("\n"):
        s = s[:-1]
    if s.endswith("\r"):
        s = s[:-1]
    return s


def split(s: str, sep: str = None) -> List[str]:
    """Whitespace (or sep) split skipping empties (reference split)."""
    return [p for p in s.split(sep) if p]
