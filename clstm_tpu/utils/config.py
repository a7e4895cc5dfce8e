"""Environment-variable configuration.

Reference: getienv/getdenv/getsenv in utils.h (≈L1-250, unverified) — the
*entire* config system of the reference CLIs is env vars with inline
defaults (SURVEY.md §5), e.g. ``lrate=1e-4 nhidden=200 clstmocrtrain ...``.
Preserved verbatim for CLI compatibility; the CLIs layer these getters over
typed dataclasses.
"""

from __future__ import annotations

import os


def getsenv(name: str, default: str = "") -> str:
    return os.environ.get(name, default)


def getienv(name: str, default: int = 0) -> int:
    v = os.environ.get(name)
    return int(v) if v not in (None, "") else default


def getdenv(name: str, default: float = 0.0) -> float:
    v = os.environ.get(name)
    return float(v) if v not in (None, "") else default


def getbenv(name: str, default: bool = False) -> bool:
    v = os.environ.get(name)
    if v in (None, ""):
        return default
    return v.lower() not in ("0", "false", "no")
