"""Accept/reject bands for the tracked benchmark rows (VERDICT r4 #10).

The tunneled chip is time-shared and single readings swing 2-3x
(CLAUDE.md measurement discipline), so a per-round bench artifact is
suggestive, not decisive — the r3→r4 ``riccati_pass_ms`` scare (0.84 vs a
0.63 anchor) took a bespoke hardware A/B to settle as contention. The fix
is bands-with-memory:

- ``bench_bands.json`` (repo root) records each tracked row's OBSERVED
  r2–r4 contention band, widened for tunnel noise;
- :func:`check_bands` flags rows outside their band in one run;
- :func:`evaluate_with_history` appends each run's out-of-band rows to a
  JSONL history and promotes a row to **REGRESSION** when it is out of
  band in two consecutive recorded runs — by definition, not judgment.

``bench.py`` calls this after every run (WARN lines go to stderr — stdout
is the driver's one-JSON-line contract) and stores the verdicts in
``BENCH_DETAILS.json``.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, List, Optional, Tuple


def load_bands(path: str) -> Dict[str, dict]:
    """Read the ``rows`` table of a bands file."""
    with open(path) as fh:
        return json.load(fh)["rows"]


def check_bands(details: dict, bands: Dict[str, dict]) -> List[dict]:
    """Return one record per tracked row that is outside its band.

    Rows absent from ``details`` (budget-dropped blocks) are skipped —
    absence is visible in the artifact itself and is not a band violation.
    """
    out = []
    for row, band in bands.items():
        val = details.get(row)
        if not isinstance(val, (int, float)):
            continue
        if "min" in band and val < band["min"]:
            out.append(
                {"row": row, "value": val, "bound": band["min"],
                 "kind": "below_min"}
            )
        if "max" in band and val > band["max"]:
            out.append(
                {"row": row, "value": val, "bound": band["max"],
                 "kind": "above_max"}
            )
    return out


def evaluate_with_history(
    details: dict,
    bands_path: str,
    history_path: Optional[str] = None,
) -> Tuple[List[dict], List[str]]:
    """Check ``details`` against the bands and apply the two-consecutive-
    runs rule against the recorded history.

    Returns ``(violations, regressions)`` where ``regressions`` names the
    rows out of band both this run and in the previous recorded run. The
    history file is appended (JSONL: ``{"t": ..., "out_of_band": [...]}``)
    so the next run sees this one.
    """
    violations = check_bands(details, load_bands(bands_path))
    now_bad = sorted({v["row"] for v in violations})

    prev_bad: List[str] = []
    if history_path and os.path.exists(history_path):
        with open(history_path) as fh:
            lines = [l for l in fh.read().splitlines() if l.strip()]
        if lines:
            prev_bad = json.loads(lines[-1]).get("out_of_band", [])
    regressions = sorted(set(now_bad) & set(prev_bad))

    if history_path:
        os.makedirs(os.path.dirname(history_path) or ".", exist_ok=True)
        with open(history_path, "a") as fh:
            fh.write(
                json.dumps({"t": time.time(), "out_of_band": now_bad}) + "\n"
            )
    return violations, regressions


def format_warnings(
    violations: List[dict], regressions: List[str]
) -> List[str]:
    """Human-readable WARN/REGRESSION lines for stderr."""
    lines = []
    for v in violations:
        rel = "below" if v["kind"] == "below_min" else "above"
        tag = "REGRESSION" if v["row"] in regressions else "WARN"
        lines.append(
            f"{tag}: bench row '{v['row']}' = {v['value']:g} is {rel} its "
            f"band bound {v['bound']:g}"
            + (
                " (out of band two consecutive runs — regression by "
                "definition; bisect with an interleaved A/B, see "
                "CLAUDE.md measurement discipline)"
                if v["row"] in regressions
                else " (single reading — could be tunnel contention; "
                "decisive only if repeated next run)"
            )
        )
    return lines
