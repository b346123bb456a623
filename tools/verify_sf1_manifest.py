"""Assert an sf1 fixture tree matches the committed FIXTURES_SF1.json.

The sf1 fixtures live outside the repo (/tmp/sf1, regenerated per round
by tools/gen_sf1.py with pinned seeds); this check is what makes an
ORACLE_SF1_r{N}.json sweep reproducible evidence: run it BEFORE the
sweep so the artifact provably ran over the manifest's exact content
(r10 verdict "What's wrong" #4).

Usage: python tools/verify_sf1_manifest.py [sf1_dir] [manifest_json]
Exits non-zero with a per-table diff on mismatch.
"""
from __future__ import annotations

import json
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from gen_sf1 import manifest  # noqa: E402


def main() -> int:
    sf1_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    man_path = (sys.argv[2] if len(sys.argv) > 2
                else os.path.join(repo, "FIXTURES_SF1.json"))
    with open(man_path) as f:
        want = json.load(f)
    got = manifest(duckdb.connect(), sf1_dir)
    bad = []
    for t, w in sorted(want.items()):
        g = got.get(t)
        if g != w:
            bad.append(f"  {t}: want {w} got {g}")
    if bad:
        print(f"MANIFEST MISMATCH ({sf1_dir} vs {man_path}):")
        print("\n".join(bad))
        return 1
    print(f"manifest OK: {len(want)} tables match {man_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
