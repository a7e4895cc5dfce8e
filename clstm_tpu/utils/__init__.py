"""Utilities: config, metrics, unicode (reference utils.h, pstring.h)."""

from clstm_tpu.utils.config import getienv, getdenv, getsenv, getbenv
from clstm_tpu.utils.metrics import levenshtein, cer
from clstm_tpu.utils.text import read_text, split

__all__ = ["getienv", "getdenv", "getsenv", "getbenv",
           "levenshtein", "cer", "read_text", "split"]
