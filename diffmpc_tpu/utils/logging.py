"""Host-side logging/observability utilities.

Capability parity: the reference's ``table_log`` pretty-printer and
``verbose`` stdout prints (``mpc/util.py``, SURVEY.md §2.1 C1, §5.5), plus
the CSV logging of its experiment scripts — extended with a JSONL writer and
a profiling context for ``jax.profiler`` traces (SURVEY.md §5.1).
"""

from __future__ import annotations

import contextlib
import csv
import json
import os
import time
from typing import Iterable, Optional, Sequence, Tuple


def table_log(tag: str, values: Iterable[Tuple]) -> str:
    """Format and print a compact aligned stat line, e.g.
    ``table_log('lqr', (('iter', i), ('obj', obj, '{:.3e}')))`` —
    the reference's per-iteration print idiom."""
    parts = []
    for v in values:
        if len(v) == 2:
            name, val = v
            fmt = "{}"
        else:
            name, val, fmt = v
        parts.append(f"{name}=" + fmt.format(val))
    line = f"[{tag}] " + " ".join(parts)
    print(line)
    return line


class CSVLogger:
    """Append-only CSV metric logger (the reference experiment scripts'
    logging surface)."""

    def __init__(self, path: str, fieldnames: Sequence[str]):
        self.path = path
        self.fieldnames = list(fieldnames)
        new = not os.path.exists(path)
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._fh = open(path, "a", newline="")
        self._writer = csv.DictWriter(self._fh, fieldnames=self.fieldnames)
        if new:
            self._writer.writeheader()

    def log(self, **row):
        self._writer.writerow({k: row.get(k) for k in self.fieldnames})
        self._fh.flush()

    def close(self):
        self._fh.close()


class JSONLLogger:
    """Structured JSONL metric logger."""

    def __init__(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._fh = open(path, "a")

    def log(self, **row):
        row.setdefault("time", time.time())
        self._fh.write(json.dumps(row) + "\n")
        self._fh.flush()

    def close(self):
        self._fh.close()


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]):
    """Wrap a region in a ``jax.profiler`` trace (TensorBoard-viewable) when
    ``log_dir`` is set; no-op otherwise (SURVEY.md §5.1)."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
