"""Robust (median-based) seasonal decomposition, pinned against a
Python reference and against the robustness property itself."""
from __future__ import annotations

import pytest

from deltalake_spark.operators.timeseries import robust_seasonal_decompose


def _median_lower(vals):
    s = sorted(vals)
    return s[(len(s) + 1) // 2 - 1]


def _ref(series: dict, m: int, k: int):
    days = sorted(series)
    h = k // 2
    out = {}
    det = {}
    for idx, d in enumerate(days):
        lo, hi = max(0, idx - h), min(len(days), idx + h + 1)
        frame = [series[days[j]] for j in range(lo, hi)]
        if len(frame) != k:
            continue
        det[d] = series[d] - _median_lower(frame)
    seas = {}
    for phase in range(m):
        vals = [v for d, v in det.items() if d % m == phase]
        if vals:
            seas[phase] = _median_lower(vals)
    for phase, s in seas.items():
        vals = [v for d, v in det.items() if d % m == phase]
        out[phase] = (len(vals), s, sum(abs(v - s) for v in vals))
    return out


def test_matches_python_reference(spark):
    import random

    rng = random.Random(31)
    series = {d: 500 + (d % 7) * 25 + rng.randint(-40, 40)
              for d in range(90)}
    df = spark.createDataFrame(
        [("a", d, v) for d, v in series.items()],
        "g string, day long, v long")
    got = {r["phase"]: (r["n_obs"], r["seasonal"],
                        r["remainder_abs_sum"])
           for r in robust_seasonal_decompose(
               df, group_cols=["g"], order_col="day", value_col="v",
               season_length=7, window=7).collect()}
    assert got == _ref(series, 7, 7)


def test_outlier_robustness(spark):
    # a single massive spike must not move any phase's seasonal
    base = {d: 100 + (d % 7) * 10 for d in range(60)}
    spiked = dict(base)
    spiked[20] = base[20] + 10_000
    out = {}
    for name, series in (("base", base), ("spiked", spiked)):
        df = spark.createDataFrame(
            [("a", d, v) for d, v in series.items()],
            "g string, day long, v long")
        out[name] = {r["phase"]: r["seasonal"]
                     for r in robust_seasonal_decompose(
                         df, group_cols=["g"], order_col="day",
                         value_col="v", season_length=7,
                         window=7).collect()}
    assert out["base"] == out["spiked"]


def test_guards(spark):
    df = spark.createDataFrame([("a", 1, 1)], "g string, day long, v long")
    with pytest.raises(ValueError):
        robust_seasonal_decompose(
            df, group_cols=["g"], order_col="day", value_col="v",
            season_length=7, window=4)
    with pytest.raises(ValueError):
        robust_seasonal_decompose(
            df, group_cols=["g"], order_col="day", value_col="v",
            season_length=1, window=7)
