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


def enable_compile_cache(path: str = "") -> str:
    """Turn on JAX's persistent compilation cache (XLA executable cache
    on disk) — measured on the tunneled v5e: a 70s cold jit drops to
    0.9s in the next process. The reference has no compile step; here
    every (batch, T-bucket) shape compiles once per PROCESS without
    this, which dominates CLI cold-start (an 11-group corpus costs
    ~5 min of compiles over the tunnel).

    ``path``: cache directory; "" uses $compile_cache, then the default
    /tmp/clstm_tpu_xla_cache; "off"/"0" disables. Returns the directory
    in use ("" if disabled). Call before the first jit executes; the
    CLIs and bench.py call it at startup.
    """
    import tempfile

    path = path or getsenv("compile_cache", "")
    if path in ("off", "0"):
        return ""
    if not path:
        path = os.path.join(tempfile.gettempdir(), "clstm_tpu_xla_cache")
    import jax

    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return path
