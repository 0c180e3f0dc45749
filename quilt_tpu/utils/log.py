"""Timestamped logging, equivalent of the reference's print_message
(reference: QUILT/R/copied_from_stitch.R:1-22)."""
from __future__ import annotations

import datetime
import os
import sys

_VERBOSE = True


def set_verbosity(verbose: bool) -> None:
    global _VERBOSE
    _VERBOSE = verbose


def print_message(msg: str, include_mem: bool = False) -> None:
    if not _VERBOSE:
        return
    ts = datetime.datetime.now().strftime("[%Y-%m-%d %H:%M:%S]")
    if include_mem:
        try:
            with open(f"/proc/{os.getpid()}/statm") as fh:
                rss_pages = int(fh.read().split()[1])
            msg = f"{msg} (RSS {rss_pages * 4096 / 1e9:.2f} GB)"
        except OSError:
            pass
    print(f"{ts} {msg}", file=sys.stderr, flush=True)
