"""Grade-history-driven query ordering (r3 verdict item 7).

The driver grades a 50-query window per round in ``queries()`` dict
order. ``_grade_ordered`` derives that order from CORRECTNESS_r*.json
so red rows re-front automatically and never-graded rows land inside
the window — no hand rotation.
"""

import json

import __spark_entry__ as entry_mod


def _history():
    import glob
    import os
    here = os.path.dirname(os.path.dirname(
        os.path.abspath(entry_mod.__file__)))
    here = os.path.dirname(os.path.abspath(entry_mod.__file__))
    out = {}
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        out.update(json.load(open(path)))
    return out


def test_red_rows_lead():
    """Any query whose last driver grade was red sorts before all
    never-graded and green rows."""
    order = list(entry_mod.queries())
    hist = _history()
    reds = set()
    import glob
    import os
    here = os.path.dirname(os.path.abspath(entry_mod.__file__))
    last = {}
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        for name, rec in json.load(open(path)).items():
            last[name] = rec
    for name, rec in last.items():
        rows_only = rec.get("err") == "no_oracle" and rec.get(
            "spark_rows") is not None
        if rows_only:
            continue
        if (rec.get("hash_match") is False or rec.get("rows_match") is False
                or rec.get("schema_match") is False
                or rec.get("err") not in (None, "no_oracle")):
            reds.add(name)
    if not reds:
        return  # board fully green — nothing to front
    worst = max(order.index(n) for n in reds)
    non_red_before = [n for n in order[:worst] if n not in reds]
    assert not non_red_before, (
        f"red rows must lead the grade window, found {non_red_before} "
        f"ahead of red rows")


def test_never_graded_rows_inside_window():
    """Every query with no driver record yet must sit inside the first
    50 positions (one grading window), oracled ones before rows-only."""
    order = list(entry_mod.queries())
    hist = _history()
    oracles = set(entry_mod.oracle_sql())
    never = [n for n in order if n not in hist]
    if not never:
        return
    positions = [order.index(n) for n in never]
    assert max(positions) < 50, (
        f"never-graded queries fall outside the 50-query window: "
        f"{[n for n in never if order.index(n) >= 50]}")
    oracled = [order.index(n) for n in never if n in oracles]
    rows_only = [order.index(n) for n in never if n not in oracles]
    if oracled and rows_only:
        assert max(oracled) < min(rows_only)


def test_green_rows_sorted_stalest_first():
    """Among green rows, an r1-graded row precedes an r3-graded row."""
    import glob
    import os
    here = os.path.dirname(os.path.abspath(entry_mod.__file__))
    last_round = {}
    status = {}
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        rnd = int("".join(c for c in os.path.basename(path)
                          if c.isdigit()) or 0)
        for name, rec in json.load(open(path)).items():
            last_round[name] = rnd
            status[name] = rec
    order = list(entry_mod.queries())
    greens = [n for n in order
              if n in status and status[n].get("hash_match") is True]
    rounds_in_order = [last_round[n] for n in greens]
    assert rounds_in_order == sorted(rounds_in_order), (
        "green rows must be ordered stalest-grade-first")


def test_ordering_is_deterministic():
    assert list(entry_mod.queries()) == list(entry_mod.queries())
    assert set(entry_mod.queries()) == set(entry_mod._QUERIES)
