"""Run the full pytest suite and commit the result as a per-round
artifact (r8 verdict ask #2): the claim "pytest tests/ is green" is
part of the bar, and until now it lived only in commit prose — the
judge had to re-run 24 minutes of tests to verify it.

Usage: python tools/run_suite.py [SUITE_rN.json] [pytest args...]

Writes {passed, failed, errors, skipped, total, duration_sec,
pytest_exit, argv, started_utc} as one JSON file (default
SUITE.json). Exit code mirrors pytest's.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from datetime import datetime, timezone
from xml.etree import ElementTree

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "SUITE.json"
    extra = sys.argv[2:]
    junit = os.path.join(HERE, ".suite_junit.xml")
    started = datetime.now(timezone.utc).isoformat(timespec="seconds")
    t0 = time.time()
    # extra positional args (paths/node-ids) REPLACE the default
    # tests/ target; bare flags (-k, -x, ...) compose with it
    has_target = any(not a.startswith("-") for a in extra)
    target = [] if has_target else ["tests/"]
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", *target, "-q",
         f"--junitxml={junit}", *extra],
        cwd=HERE,
    )
    duration = round(time.time() - t0, 1)
    totals = {"passed": 0, "failed": 0, "errors": 0, "skipped": 0,
              "total": 0}
    try:
        root = ElementTree.parse(junit).getroot()
        suites = root.iter("testsuite")
        for s in suites:
            tests = int(s.get("tests", 0))
            failures = int(s.get("failures", 0))
            errors = int(s.get("errors", 0))
            skipped = int(s.get("skipped", 0))
            totals["total"] += tests
            totals["failed"] += failures
            totals["errors"] += errors
            totals["skipped"] += skipped
            totals["passed"] += tests - failures - errors - skipped
    finally:
        if os.path.exists(junit):
            os.remove(junit)
    record = {
        **totals,
        "duration_sec": duration,
        "pytest_exit": proc.returncode,
        "argv": extra,
        "started_utc": started,
    }
    with open(os.path.join(HERE, out_path), "w") as f:
        json.dump(record, f, indent=2, sort_keys=True)
        f.write("\n")
    print(json.dumps(record, sort_keys=True))
    return proc.returncode


if __name__ == "__main__":
    raise SystemExit(main())
