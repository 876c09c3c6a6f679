"""Timestamped logging (ref: Utils/TimeLogger.py:1-43).

Same observable behavior as the reference logger: wall-clock timestamped
lines, an optional in-memory accumulation buffer, a carriage-return
`oneline` mode for progress lines, and named time markers.
"""

from __future__ import annotations

import datetime
import sys
import time
from typing import Dict, List

logmsg: List[str] = []
_timemark: Dict[str, float] = {}
save_default = False
_last_oneline = False


def log(msg: str, save: bool | None = None, oneline: bool = False) -> None:
    """Print `[time]: msg`; ref Utils/TimeLogger.py:19-38."""
    global _last_oneline
    stamp = datetime.datetime.now().strftime("%Y-%m-%d %H:%M:%S")
    tem = f"{stamp}: {msg}"
    if save if save is not None else save_default:
        logmsg.append(tem + "\n")
    if oneline:
        sys.stdout.write("\r" + tem)
        sys.stdout.flush()
        _last_oneline = True
    else:
        if _last_oneline:
            sys.stdout.write("\n")
            _last_oneline = False
        print(tem)


def marktime(marker: str) -> None:
    """Record a named start time; ref Utils/TimeLogger.py:9-11."""
    _timemark[marker] = time.time()


def spent_time(marker: str) -> float:
    """Seconds since `marktime(marker)`; ref Utils/TimeLogger.py:13-15."""
    return time.time() - _timemark[marker]
