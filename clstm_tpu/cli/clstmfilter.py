"""clstmfilter — string-transduction inference CLI.

Reference: clstmfilter.cc (≈L1-100, unverified). Reads lines from stdin,
writes transduced lines to stdout. Env: load=filter.clstm (required).
"""

from __future__ import annotations

import sys

from clstm_tpu.models.hl import CLSTMText
from clstm_tpu.utils.config import getsenv


def main(argv=None) -> int:
    load = getsenv("load", "")
    if not load:
        print(__doc__)
        return 1
    model = CLSTMText()
    model.load(load)
    for line in sys.stdin:
        line = line.rstrip("\n")
        print(model.predict(line), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
