"""Unit tests for operators/timeseries.py — exact smoothing recursion,
window standardization, lag correlation, and Markov estimation against
hand-computed series."""

import math

import pytest

from deltalake_spark.operators.timeseries import (
    autocorrelation,
    ewma,
    markov_transitions,
    rolling_zscore,
)


def _series(spark, vals, grp="g"):
    return spark.createDataFrame(
        [(grp, i, float(v)) for i, v in enumerate(vals)],
        "grp string, day long, total double")


def test_ewma_matches_hand_recursion(spark):
    vals = [10.0, 20.0, 15.0, 30.0, 5.0]
    a = 0.4
    expect = [vals[0]]
    for v in vals[1:]:
        expect.append(a * v + (1 - a) * expect[-1])
    out = (
        ewma(_series(spark, vals), group_cols=["grp"], order_col="day",
             value_col="total", alpha=a)
        .orderBy("day").collect()
    )
    assert [r["day"] for r in out] == list(range(5))
    for r, e in zip(out, expect):
        assert r["ewma"] == pytest.approx(e, rel=1e-12)


def test_ewma_unsorted_input_and_alpha_validation(spark):
    df = spark.createDataFrame(
        [("g", 2, 3.0), ("g", 0, 1.0), ("g", 1, 2.0)],
        "grp string, day long, total double")
    out = ewma(df, group_cols=["grp"], order_col="day",
               value_col="total", alpha=0.5).orderBy("day").collect()
    # sorted fold: 1.0, then .5*2+.5*1=1.5, then .5*3+.5*1.5=2.25
    assert [r["ewma"] for r in out] == pytest.approx([1.0, 1.5, 2.25])
    with pytest.raises(ValueError):
        ewma(df, group_cols=["grp"], order_col="day",
             value_col="total", alpha=0.0)


def test_rolling_zscore_flags_spike(spark):
    vals = [10.0] * 6 + [100.0]
    out = (
        rolling_zscore(_series(spark, vals), group_cols=["grp"],
                       order_col="day", value_col="total",
                       window_size=4, threshold=1.5)
        .orderBy("day").collect()
    )
    # constant prefix: sd == 0 → z null, no anomaly
    assert out[3]["z"] is None
    # spike day: window [10,10,10,100], mean 32.5, sd 45, z = 1.5
    assert out[6]["z"] == pytest.approx(1.5)
    assert out[6]["is_anomaly"] is False  # strict inequality
    flags = [r["is_anomaly"] for r in out]
    assert True not in flags


def test_autocorrelation_alternating_series(spark):
    # perfectly alternating: lag-1 corr = -1, lag-2 corr = +1
    vals = [1.0, -1.0] * 6
    out = autocorrelation(
        _series(spark, vals), group_cols=["grp"], order_col="day",
        value_col="total", lags=[1, 2])
    got = {r["lag"]: r for r in out.collect()}
    assert got[1]["autocorr"] == pytest.approx(-1.0)
    assert got[2]["autocorr"] == pytest.approx(1.0)
    assert got[1]["n_pairs"] == 11 and got[2]["n_pairs"] == 10
    with pytest.raises(ValueError):
        autocorrelation(_series(spark, vals), group_cols=["grp"],
                        order_col="day", value_col="total", lags=[])


def test_markov_transitions_hand_chain(spark):
    # user 1: A B A B  → AB:2? transitions A→B, B→A, A→B
    # user 2: A A B    → A→A, A→B
    rows = [(1, i, s) for i, s in enumerate("ABAB")]
    rows += [(2, i + 10, s) for i, s in enumerate("AAB")]
    df = spark.createDataFrame(rows, "u long, t long, s string")
    out = markov_transitions(
        df, entity_col="u", order_cols=["t"], state_col="s")
    got = {(r["from_state"], r["to_state"]): r for r in out.collect()}
    assert got[("A", "B")]["n"] == 3
    assert got[("A", "A")]["n"] == 1
    assert got[("B", "A")]["n"] == 1
    assert got[("A", "B")]["prob"] == pytest.approx(0.75)
    assert got[("B", "A")]["prob"] == pytest.approx(1.0)


def test_markov_single_events_yield_no_rows(spark):
    df = spark.createDataFrame(
        [(1, 0, "A"), (2, 0, "B")], "u long, t long, s string")
    assert markov_transitions(
        df, entity_col="u", order_cols=["t"], state_col="s").count() == 0

# ------------------------------------------------------------------- CUSUM

def test_cusum_matches_reset_recursion(spark):
    from deltalake_spark.operators.timeseries import cusum_changepoint
    # hand series: target 10, shift upward at index 4
    xs = [10.0, 9.0, 11.0, 10.0, 14.0, 15.0, 13.0, 16.0]
    rows = [("k", i, x) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "k string, t long, x double")
    out = cusum_changepoint(
        df, group_cols=["k"], order_col="t", value_col="x",
        target=10.0, threshold=5.0).orderBy("t").collect()
    # python reference: s_t = max(0, s_{t-1} + (x - target)) in cents
    s, ref = 0, []
    for x in xs:
        s = max(0, s + round(x * 100) - 1000)
        ref.append(s)
    assert [r["cusum_units"] for r in out] == ref
    alarms = [r["alarm"] for r in out]
    assert alarms == [u > 500 for u in ref]
    firsts = [r["t"] for r in out if r["first_alarm"]]
    first_expected = next(i for i, u in enumerate(ref) if u > 500)
    assert firsts == [first_expected]


def test_cusum_resets_after_dip(spark):
    from deltalake_spark.operators.timeseries import cusum_changepoint
    # a deep dip must clamp the statistic at zero, not go negative
    xs = [5.0, 1.0, 5.0, 6.0]
    df = spark.createDataFrame(
        [("k", i, x) for i, x in enumerate(xs)],
        "k string, t long, x double")
    out = cusum_changepoint(
        df, group_cols=["k"], order_col="t", value_col="x",
        target=5.0, threshold=100.0).orderBy("t").collect()
    assert [r["cusum_units"] for r in out] == [0, 0, 0, 100]


def test_cusum_groups_independent(spark):
    from deltalake_spark.operators.timeseries import cusum_changepoint
    rows = [("a", 0, 20.0), ("b", 0, 0.0), ("b", 1, 30.0)]
    df = spark.createDataFrame(rows, "k string, t long, x double")
    out = {(r["k"], r["t"]): r for r in cusum_changepoint(
        df, group_cols=["k"], order_col="t", value_col="x",
        target=10.0, threshold=5.0).collect()}
    assert out[("a", 0)]["cusum_units"] == 1000
    assert out[("b", 0)]["cusum_units"] == 0
    assert out[("b", 1)]["cusum_units"] == 2000
    assert out[("b", 1)]["alarm"] and out[("b", 1)]["first_alarm"]


def test_cusum_validation(spark):
    from deltalake_spark.operators.timeseries import cusum_changepoint
    import pytest as _pytest
    df = spark.createDataFrame([("k", 0, 1.0)],
                               "k string, t long, x double")
    with _pytest.raises(ValueError):
        cusum_changepoint(df, group_cols=["k"], order_col="t",
                          value_col="x", target=0.0, threshold=1.0,
                          scale=0)


# -------------------------------------------------- seasonal decomposition

def test_seasonal_decompose_recovers_planted_pattern(spark):
    from deltalake_spark.operators.timeseries import seasonal_decompose
    # x(t) = 100*t (linear trend) + planted season [0, 30, -30] in a
    # period of 3; window 3 removes a linear trend exactly
    season = [0, 30, -30]
    rows = [("k", t, 100 * t + season[t % 3]) for t in range(12)]
    df = spark.createDataFrame(rows, "k string, t long, x long")
    out = {r["phase"]: r for r in seasonal_decompose(
        df, group_cols=["k"], order_col="t", value_col="x",
        season_length=3, window=3).collect()}
    # centered MA of a pure linear trend equals the trend; the
    # detrended value is the season term minus the season-window mean
    # (here mean(season)=0 in every full window of 3), so seasonal
    # recovers the planted values exactly
    assert out[0]["seasonal"] == pytest.approx(0.0)
    assert out[1]["seasonal"] == pytest.approx(30.0)
    assert out[2]["seasonal"] == pytest.approx(-30.0)
    # edges dropped: 12 points, 10 full windows
    assert sum(r["n_obs"] for r in out.values()) == 10


def test_seasonal_decompose_sum_matches_hand_calc(spark):
    from deltalake_spark.operators.timeseries import seasonal_decompose
    xs = [10, 20, 30, 40]
    df = spark.createDataFrame(
        [("k", i, x) for i, x in enumerate(xs)], "k string, t long, x long")
    out = {r["phase"]: r for r in seasonal_decompose(
        df, group_cols=["k"], order_col="t", value_col="x",
        season_length=2, window=3).collect()}
    # full windows at t=1 (sum 60) and t=2 (sum 90); k=3
    # detrend_k: t=1 -> 3*20-60 = 0 (phase 1); t=2 -> 3*30-90 = 0 (phase 0)
    assert out[0]["sum_detrend_k"] == 0 and out[0]["n_obs"] == 1
    assert out[1]["sum_detrend_k"] == 0 and out[1]["n_obs"] == 1


def test_seasonal_decompose_validation(spark):
    import pytest as _pytest
    from deltalake_spark.operators.timeseries import seasonal_decompose
    df = spark.createDataFrame([("k", 0, 1)], "k string, t long, x long")
    for kw in ({"window": 4}, {"window": 1}, {"season_length": 1}):
        args = {"season_length": 3, "window": 3, **kw}
        with _pytest.raises(ValueError):
            seasonal_decompose(df, group_cols=["k"], order_col="t",
                               value_col="x", **args)


# ------------------------------------------------------------ Holt forecast

def _holt_ref(xs, a=30, b=10, h=7):
    l, t = xs[0], 0
    for x in xs[1:]:
        nl = (a * x + (100 - a) * (l + t)) // 100
        t = (b * (nl - l) + (100 - b) * t) // 100
        l = nl
    return l, t, l + h * t


def test_holt_matches_integer_reference(spark):
    import random
    from deltalake_spark.operators.timeseries import holt_forecast
    rng = random.Random(5)
    xs = [1000 + 40 * i + rng.randrange(-100, 100) for i in range(30)]
    df = spark.createDataFrame(
        [("k", i, x) for i, x in enumerate(xs)],
        "k string, t long, x long")
    out = holt_forecast(
        df, group_cols=["k"], order_col="t", value_col="x").collect()[0]
    l, t, f = _holt_ref(xs)
    assert out["n_periods"] == 30
    assert (out["level"], out["trend"], out["forecast"]) == (l, t, f)


def test_holt_tracks_linear_trend(spark):
    from deltalake_spark.operators.timeseries import holt_forecast
    # pure line x = 100*t: trend estimate converges toward 100
    xs = [100 * i for i in range(40)]
    df = spark.createDataFrame(
        [("k", i, x) for i, x in enumerate(xs)],
        "k string, t long, x long")
    out = holt_forecast(
        df, group_cols=["k"], order_col="t", value_col="x",
        horizon=10).collect()[0]
    assert 50 <= out["trend"] <= 100
    assert out["forecast"] == out["level"] + 10 * out["trend"]


def test_holt_negative_trend_floor_semantics(spark):
    from deltalake_spark.operators.timeseries import holt_forecast
    # decreasing series drives the trend numerator negative — floor
    # (not truncate) division must match the python // reference
    xs = [1000 - 37 * i for i in range(20)]
    df = spark.createDataFrame(
        [("k", i, x) for i, x in enumerate(xs)],
        "k string, t long, x long")
    out = holt_forecast(
        df, group_cols=["k"], order_col="t", value_col="x").collect()[0]
    l, t, f = _holt_ref(xs)
    assert (out["level"], out["trend"], out["forecast"]) == (l, t, f)
    assert out["trend"] < 0


def test_holt_validation(spark):
    import pytest as _pytest
    from deltalake_spark.operators.timeseries import holt_forecast
    df = spark.createDataFrame([("k", 0, 1)], "k string, t long, x long")
    with _pytest.raises(ValueError):
        holt_forecast(df, group_cols=["k"], order_col="t",
                      value_col="x", alpha_pct=0)
    with _pytest.raises(ValueError):
        holt_forecast(df, group_cols=["k"], order_col="t",
                      value_col="x", horizon=-1)


# ---------------------------------------------------------------- r6 ops


def test_sse_changepoint_planted_step(spark):
    from deltalake_spark.operators.timeseries import sse_changepoint

    # 10 at level 100, then 10 at level 200: split MUST land at k=10
    rows = [("a", t, 100 if t < 10 else 200) for t in range(20)]
    out = sse_changepoint(
        spark.createDataFrame(rows, "g string, t long, v long"),
        group_cols=["g"], order_col="t", value_col="v").collect()
    r = out[0]
    assert r["n"] == 20 and r["cp_index"] == 10 and r["cp_order"] == 9
    assert r["mean_left"] == 100.0 and r["mean_right"] == 200.0
    # exact gain: (n*Sk - k*S)^2/(n*k*(n-k)) = (20*1000-10*3000)^2/2000
    # = 1e8/2000 = 50000 units^2, x 1e6 scale
    assert r["gain_units"] == 50_000 * 10 ** 6


def test_sse_changepoint_matches_python_argmax(spark):
    import random

    from deltalake_spark.operators.timeseries import sse_changepoint

    rng = random.Random(7)
    series = {g: [rng.randint(-50, 50) + (37 if i > rng.randint(5, 25)
                                          else 0)
                  for i in range(30)] for g in "ab"}
    rows = [(g, t, v) for g, xs in series.items()
            for t, v in enumerate(xs)]
    got = {r["g"]: r for r in sse_changepoint(
        spark.createDataFrame(rows, "g string, t long, v long"),
        group_cols=["g"], order_col="t", value_col="v").collect()}

    for g, xs in series.items():
        n, S = len(xs), sum(xs)
        best = None
        pref = 0
        for k in range(1, n):
            pref += xs[k - 1]
            a = 10 ** 6 * (n * pref - k * S) ** 2
            gain = a // (n * k * (n - k))
            cand = (gain, -k)
            if best is None or cand > best:
                best, bk = cand, k
        assert got[g]["cp_index"] == bk
        assert got[g]["gain_units"] == best[0]


def test_theil_sen_robust_to_outlier(spark):
    from deltalake_spark.operators.timeseries import theil_sen

    # y = 3t + 5 with one wild outlier: slope stays exactly 3
    rows = [("s", t, 3 * t + 5 if t != 7 else 9999) for t in range(15)]
    r = theil_sen(
        spark.createDataFrame(rows, "g string, t long, v long"),
        group_cols=["g"], order_col="t", value_col="v").collect()[0]
    assert r["n"] == 15 and r["n_pairs"] == 105
    assert r["slope"] == 3.0
    assert r["intercept"] == 5.0


def test_cross_correlation_shifted_copy(spark):
    from deltalake_spark.operators.timeseries import cross_correlation

    # y is x shifted forward by 2: r(lag=2) == 1.0 exactly
    xs = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8]
    rows = [("s", t, xs[t], xs[t - 2] if t >= 2 else 0)
            for t in range(len(xs))]
    out = {r["lag"]: r for r in cross_correlation(
        spark.createDataFrame(rows, "g string, t long, x long, y long"),
        group_cols=["g"], order_col="t", x_col="x", y_col="y",
        lags=[0, 2]).collect()}
    assert abs(out[2]["xcorr"] - 1.0) < 1e-12
    assert out[2]["n_pairs"] == len(xs) - 2
    assert abs(out[0]["xcorr"]) < 1.0


def test_cross_correlation_matches_python_moments(spark):
    import math as m
    import random

    from deltalake_spark.operators.timeseries import cross_correlation

    rng = random.Random(11)
    xs = [rng.randint(0, 100) for _ in range(40)]
    ys = [rng.randint(0, 100) for _ in range(40)]
    rows = [("s", t, xs[t], ys[t]) for t in range(40)]
    out = {r["lag"]: r["xcorr"] for r in cross_correlation(
        spark.createDataFrame(rows, "g string, t long, x long, y long"),
        group_cols=["g"], order_col="t", x_col="x", y_col="y",
        lags=[1, 3]).collect()}
    for lag in (1, 3):
        px = xs[:-lag]
        py = ys[lag:]
        n = len(px)
        num = n * sum(a * b for a, b in zip(px, py)) \
            - sum(px) * sum(py)
        dx = n * sum(a * a for a in px) - sum(px) ** 2
        dy = n * sum(b * b for b in py) - sum(py) ** 2
        assert out[lag] == num / m.sqrt(dx) / m.sqrt(dy)


class TestMarkovAbsorption:
    def _run(self, spark, rows, n_iter=12):
        from deltalake_spark.operators.timeseries import (
            markov_absorption,
        )

        df = spark.createDataFrame(rows, "u long, t long, s string")
        return {r["state"]: r for r in markov_absorption(
            df, entity_col="u", order_cols=["t"], state_col="s",
            target="buy", sinks=["quit"], n_iter=n_iter).collect()}

    def test_deterministic_chain(self, spark):
        # every a goes to b, every b goes to buy: P(absorb)=1 from both
        rows = [(1, 0, "a"), (1, 1, "b"), (1, 2, "buy"),
                (2, 0, "a"), (2, 1, "b"), (2, 2, "buy")]
        got = self._run(spark, rows)
        q = 10 ** 12
        assert got["buy"]["prob_scaled"] == q
        assert got["b"]["prob_scaled"] == q
        assert got["a"]["prob_scaled"] == q
        assert got["buy"]["is_absorbing"]
        assert not got["a"]["is_absorbing"]

    def test_split_chain_matches_python_fixed_point(self, spark):
        # from a: 2 transitions to buy, 1 to quit, 1 to a (self)
        rows = []
        uid = 0
        for dest in ("buy", "buy", "quit"):
            rows += [(uid, 0, "a"), (uid, 1, dest)]
            uid += 1
        rows += [(uid, 0, "a"), (uid, 1, "a"), (uid, 2, "buy")]
        got = self._run(spark, rows, n_iter=6)

        q = 10 ** 12
        # replay: c(a,buy)=3, c(a,quit)=1, c(a,a)=1 ; n=5
        x = {"buy": q, "quit": 0, "a": 0}
        for _ in range(6):
            x = dict(x, a=(3 * x["buy"] + 1 * x["quit"]
                           + 1 * x["a"]) // 5)
        assert got["a"]["prob_scaled"] == x["a"]
        assert got["a"]["n_out"] == 5
        # exact fixed point is 3/4; bounded horizon approaches from
        # below
        assert 0 < got["a"]["prob_scaled"] <= 0.75 * q

    def test_validation(self, spark):
        import pytest as _p

        from deltalake_spark.operators.timeseries import (
            markov_absorption,
        )

        df = spark.createDataFrame([(1, 0, "a")], "u long, t long, s string")
        with _p.raises(ValueError):
            markov_absorption(df, entity_col="u", order_cols=["t"],
                              state_col="s", target="buy",
                              sinks=[], n_iter=0)


class TestOhlcVwap:
    def test_hand_bucket(self, spark):
        from deltalake_spark.operators.timeseries import ohlc_vwap

        rows = [("g", 0, 1, 10, 2), ("g", 0, 2, 30, 1),
                ("g", 0, 3, 20, 3), ("g", 1, 4, 5, 1)]
        df = spark.createDataFrame(
            rows, "g string, b long, t long, v long, q long")
        out = {r["bucket"]: r for r in ohlc_vwap(
            df, group_cols=["g"], order_col="t", bucket_col="b",
            value_col="v", qty_col="q").collect()}
        r = out[0]
        assert (r["open"], r["high"], r["low"], r["close"]) == \
            (10, 30, 10, 20)
        assert r["sum_qty"] == 6
        assert r["vwap"] == (10 * 2 + 30 * 1 + 20 * 3) / 6
        assert out[1]["open"] == out[1]["close"] == 5

    def test_unweighted_and_zero_qty(self, spark):
        from deltalake_spark.operators.timeseries import ohlc_vwap

        rows = [("g", 0, 1, 10, 0), ("g", 0, 2, 20, 0)]
        df = spark.createDataFrame(
            rows, "g string, b long, t long, v long, q long")
        r = ohlc_vwap(df, group_cols=["g"], order_col="t",
                      bucket_col="b", value_col="v",
                      qty_col="q").collect()[0]
        assert r["vwap"] is None            # zero quantity -> null
        r2 = ohlc_vwap(df, group_cols=["g"], order_col="t",
                       bucket_col="b", value_col="v").collect()[0]
        assert r2["vwap"] == 15.0           # unweighted mean


class TestActivityStreaks:
    def test_hand_streaks(self, spark):
        from deltalake_spark.operators.timeseries import (
            activity_streaks,
        )

        rows = [(1, d) for d in (3, 4, 5, 9, 10, 20)] + \
               [(2, d) for d in (7, 7, 8)]       # dup period deduped
        df = spark.createDataFrame(rows, "u long, d long")
        out = sorted((r["u"], r["streak_start"], r["streak_end"],
                      r["length"])
                     for r in activity_streaks(
                         df, entity_col="u", period_col="d").collect())
        assert out == [(1, 3, 5, 3), (1, 9, 10, 2), (1, 20, 20, 1),
                       (2, 7, 8, 2)]

    def test_matches_python_at_volume(self, spark):
        import random

        from deltalake_spark.operators.timeseries import (
            activity_streaks,
        )

        rng = random.Random(17)
        active = {(u, d) for u in range(50)
                  for d in range(60) if rng.random() < 0.5}
        df = spark.createDataFrame(sorted(active), "u long, d long")
        got = sorted((r["u"], r["streak_start"], r["length"])
                     for r in activity_streaks(
                         df, entity_col="u", period_col="d").collect())
        want = []
        for u in range(50):
            days = sorted(d for (uu, d) in active if uu == u)
            i = 0
            while i < len(days):
                j = i
                while j + 1 < len(days) and days[j + 1] == days[j] + 1:
                    j += 1
                want.append((u, days[i], j - i + 1))
                i = j + 1
        assert got == sorted(want)


class TestTimeWeightedAverage:
    def test_locf_integral(self, spark):
        from deltalake_spark.operators.timeseries import (
            time_weighted_average,
        )

        # value 10 held for 8 units, then 50 for 2 units: TWA = 18
        rows = [("g", 0, 10), ("g", 8, 50), ("g", 10, 0)]
        df = spark.createDataFrame(rows, "g string, t long, v long")
        r = time_weighted_average(
            df, group_cols=["g"], time_col="t",
            value_col="v").collect()[0]
        assert r["twa_num"] == 10 * 8 + 50 * 2
        assert r["span"] == 10
        assert r["twa"] == 18.0
        # plain mean would say 20 — the whole point
        assert r["n"] == 3

    def test_single_sample_null(self, spark):
        from deltalake_spark.operators.timeseries import (
            time_weighted_average,
        )

        df = spark.createDataFrame([("g", 5, 7)], "g string, t long, v long")
        r = time_weighted_average(
            df, group_cols=["g"], time_col="t",
            value_col="v").collect()[0]
        assert r["span"] == 0 and r["twa"] is None
