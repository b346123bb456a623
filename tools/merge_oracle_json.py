"""Merge a patch-pass oracle artifact into a base sweep artifact.

Usage: python tools/merge_oracle_json.py BASE.json PATCH.json [OUT.json]

Per-gate entries in PATCH replace the BASE entries (a re-run after a
gate/fixture fix supersedes the earlier grade); totals are recomputed.
The merged file records both passes' provenance in a "merged_from"
field so the artifact is honest about which gates were re-graded.
"""
from __future__ import annotations

import json
import sys


def main() -> int:
    base_path, patch_path = sys.argv[1], sys.argv[2]
    out_path = sys.argv[3] if len(sys.argv) > 3 else base_path
    with open(base_path) as f:
        base = json.load(f)
    with open(patch_path) as f:
        patch = json.load(f)
    replaced = sorted(set(base["queries"]) & set(patch["queries"]))
    added = sorted(set(patch["queries"]) - set(base["queries"]))
    base["queries"].update(patch["queries"])
    statuses = [q["status"] for q in base["queries"].values()]
    base["n_queries"] = len(statuses)
    base["pass"] = sum(s == "PASS" for s in statuses)
    base["fail"] = sum(s == "FAIL" for s in statuses)
    base["weak"] = sum(s not in ("PASS", "FAIL") for s in statuses)
    base["wall_seconds"] = round(
        base.get("wall_seconds", 0) + patch.get("wall_seconds", 0), 1)
    base.setdefault("merged_from", []).append({
        "patch": patch_path,
        "replaced": replaced,
        "added": added,
        "patch_sf_dir": patch.get("sf_dir"),
        "patch_jobs": patch.get("jobs"),
    })
    with open(out_path, "w") as f:
        json.dump(base, f, indent=1, sort_keys=True)
    print(f"merged {len(replaced)} replaced + {len(added)} added -> "
          f"{out_path}: {base['pass']}/{base['n_queries']} pass, "
          f"{base['fail']} fail")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
