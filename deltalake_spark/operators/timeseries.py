"""Time-series analytics over rolled-up event grains: exponential
smoothing, rolling anomaly scores, autocorrelation, and Markov chains.

Engine-native (the reference's query surface — ``src/query/index.ts``
— has no temporal smoothing/correlation operators). All operators run
on a PRE-AGGREGATED series grain (e.g. daily totals per key): the
reduction from raw events to the grain is the scale step — one hash
aggregate over N rows — and everything after operates on frames whose
size is (#keys × #periods), not raw volume.

- :func:`ewma` — EXACT recursive exponential smoothing
  ``y_n = α·x_n + (1−α)·y_{n−1}`` per series. The series is folded
  inside a JVM higher-order ``aggregate`` over the sorted per-group
  array (one shuffle, no UDFs); per-period rows are exploded back out.
  Group size = periods in the grain, bounded by construction — for
  multi-year second grains, re-grain first.
- :func:`rolling_zscore` — rolling mean/stddev window (``w`` trailing
  periods) and the standardized residual; the standard anomaly flag.
- :func:`autocorrelation` — Pearson autocorrelation at a set of lags,
  computed with ONE window pass (all lag columns share the same sort)
  and one aggregate; results unpivoted to (key, lag) rows.
- :func:`markov_transitions` — first-order state-transition counts
  and row-normalized probabilities from per-entity ordered event
  streams: one entity-keyed window for ``lag(state)``, one (from, to)
  count aggregate, marginals via a window over the tiny cell frame.

100 TB notes: the single raw-data touch in each operator is either a
grain rollup (partial-agg combine) or an entity-keyed window; both
shuffle once on their natural key. Everything downstream is
cell-frame-sized. No collects, no iteration, no Python rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "ewma",
    "rolling_zscore",
    "autocorrelation",
    "markov_transitions",
    "cusum_changepoint",
    "seasonal_decompose",
    "robust_seasonal_decompose",
    "holt_forecast",
    "sse_changepoint",
    "theil_sen",
    "cross_correlation",
    "markov_absorption",
    "ohlc_vwap",
    "activity_streaks",
    "time_weighted_average",
    "rolling_quantile",
    "rolling_mad",
]


def ewma(
    df: DataFrame,
    *,
    group_cols: list[str],
    order_col: str,
    value_col: str,
    alpha: float,
    out_col: str = "ewma",
) -> DataFrame:
    """Exact recursive EWMA per group (``y_1 = x_1``;
    ``y_n = α·x_n + (1−α)·y_{n−1}``), evaluated as a JVM
    ``aggregate`` fold over the group's order-sorted (order, value)
    array — bit-deterministic, sequential semantics with zero Python.
    Returns the input grain with ``out_col`` appended."""
    if not 0.0 < alpha <= 1.0:
        raise ValueError("alpha must be in (0, 1]")
    a = float(alpha)
    arr = F.sort_array(
        F.collect_list(F.struct(F.col(order_col).alias("o"),
                                F.col(value_col).alias("x"))))
    # fold: accumulator is the growing array of (o, smoothed) structs;
    # the next smoothed value reads the accumulator's last element
    fold = F.aggregate(
        arr,
        F.expr("CAST(array() AS ARRAY<STRUCT<o: BIGINT, y: DOUBLE>>)"),
        lambda acc, s: F.concat(
            acc,
            F.array(F.struct(
                s["o"].alias("o"),
                F.when(
                    F.size(acc) == 0, s["x"].cast("double")
                ).otherwise(
                    F.lit(a) * s["x"]
                    + F.lit(1.0 - a) * F.element_at(acc, -1)["y"]
                ).alias("y"),
            )),
        ),
    )
    grouped = df.groupBy(*group_cols).agg(fold.alias("__series"))
    ex = grouped.select(
        *group_cols, F.explode("__series").alias("__s"))
    return ex.select(
        *group_cols,
        F.col("__s.o").alias(order_col),
        F.col("__s.y").alias(out_col),
    )


def rolling_zscore(
    df: DataFrame,
    *,
    group_cols: list[str],
    order_col: str,
    value_col: str,
    window_size: int,
    threshold: float = 2.0,
) -> DataFrame:
    """Trailing-window standardization: mean and sample stddev over
    the ``window_size`` most recent periods (current inclusive),
    ``z = (x − mean)/stddev``, and an ``is_anomaly`` flag at
    |z| > threshold. z is null while the window holds < 2 periods or
    the stddev is 0 — matching SQL semantics on both engines."""
    if window_size < 2:
        raise ValueError("window_size must be >= 2")
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(order_col)
        .rowsBetween(-(window_size - 1), 0)
    )
    x = F.col(value_col).cast("double")
    mean = F.avg(x).over(w)
    sd = F.stddev_samp(x).over(w)
    z = F.when(sd > 0, (x - mean) / sd)
    return df.select(
        *group_cols,
        order_col,
        value_col,
        z.alias("z"),
        (F.abs(z) > threshold).alias("is_anomaly"),
    )


def autocorrelation(
    df: DataFrame,
    *,
    group_cols: list[str],
    order_col: str,
    value_col: str,
    lags: list[int],
) -> DataFrame:
    """Pearson autocorrelation of each group's series at the given
    lags. ONE window pass materializes every lag column (they share
    the group sort, so Spark plans a single Window node / exchange);
    one aggregate computes ``corr(x, x_lag)`` and the non-null pair
    count per lag; a literal-array explode unpivots to one row per
    (group, lag)."""
    if not lags or any(lag < 1 for lag in lags):
        raise ValueError("lags must be positive")
    w = Window.partitionBy(*group_cols).orderBy(order_col)
    x = F.col(value_col).cast("double")
    lagged = df.select(
        *group_cols,
        x.alias("__x"),
        *[F.lag(x, lag).over(w).alias(f"__l{lag}") for lag in lags],
    )
    agg = lagged.groupBy(*group_cols).agg(
        *[F.corr("__x", f"__l{lag}").alias(f"__c{lag}")
          for lag in lags],
        *[F.count(F.when(F.col(f"__l{lag}").isNotNull(), 1))
          .alias(f"__n{lag}") for lag in lags],
    )
    pairs = F.explode(F.array(*[
        F.struct(
            F.lit(lag).cast("long").alias("lag"),
            F.col(f"__c{lag}").alias("autocorr"),
            F.col(f"__n{lag}").alias("n_pairs"),
        )
        for lag in lags
    ])).alias("__p")
    return agg.select(*group_cols, pairs).select(
        *group_cols,
        F.col("__p.lag").alias("lag"),
        F.col("__p.autocorr").alias("autocorr"),
        F.col("__p.n_pairs").alias("n_pairs"),
    )


def markov_transitions(
    df: DataFrame,
    *,
    entity_col: str,
    order_cols: list[str],
    state_col: str,
) -> DataFrame:
    """First-order Markov transition estimates from per-entity ordered
    state sequences: ``lag(state)`` over one entity-keyed window pairs
    each state with its predecessor; a (from, to) count aggregate and
    a from-state marginal window (over the |S|² cell frame) yield
    row-normalized probabilities. ``order_cols`` must make the
    per-entity order total (include a tiebreaker id)."""
    w = Window.partitionBy(entity_col).orderBy(*order_cols)
    seq = df.select(
        F.lag(state_col).over(w).alias("from_state"),
        F.col(state_col).alias("to_state"),
    ).where(F.col("from_state").isNotNull())
    cells = seq.groupBy("from_state", "to_state").agg(
        F.count(F.lit(1)).alias("n"))
    marg = Window.partitionBy("from_state")
    return cells.select(
        "from_state",
        "to_state",
        "n",
        (F.col("n") / F.sum("n").over(marg)).alias("prob"),
    )


def cusum_changepoint(
    df: DataFrame,
    *,
    group_cols: list[str],
    order_col: str,
    value_col: str,
    target: float,
    threshold: float,
    scale: int = 100,
) -> DataFrame:
    """One-sided CUSUM drift detection per series (Page 1954) — the
    sequential mean-shift monitor a streaming rollup runs per key:
    raise when the cumulative excess over a target level exceeds a
    decision threshold.

    The textbook form is a RESET recursion
    ``s_t = max(0, s_{t-1} + (x_t − target))`` — apparently
    sequential, but it has the exact prefix-sum closed form

        s_t = S_t − min_{0≤j≤t} S_j,   S_t = Σ_{i≤t} (x_i − target)

    (the reset just subtracts the running minimum of the cumulative
    sum, including the empty prefix S_0 = 0). Both sides run in
    INTEGER units of ``1/scale`` (values and target quantized with
    half-away rounding), so every statistic is an exact BIGINT and
    the twin SQL replay matches bit-for-bit — two window passes, no
    iteration, no fold.

    Upper CUSUM only (drift upward); monitor ``-x`` for the lower
    side. Output: the series grain with ``(cusum_units, alarm)``
    appended, plus ``first_alarm`` marking the first breach per group
    — the changepoint detection. ``threshold`` is in value units.

    Scale shape: one shuffle on the group key; both windows (running
    sum, running min) share the same (group, order) sort. Frame sizes
    are the series grain, not raw rows.
    """
    if scale < 1:
        raise ValueError("scale must be >= 1")
    q = int(scale)
    # quantize value and target to exact integer units; round() here
    # matches DuckDB round(double) on the fixture domain (same
    # pattern the percentile/rollup cents queries pin)
    x_units = F.round(F.col(value_col) * q).cast("long")
    t_units = F.round(F.lit(float(target)) * q).cast("long")
    h_units = F.round(F.lit(float(threshold)) * q).cast("long")
    w_ord = Window.partitionBy(*group_cols).orderBy(order_col)
    run = w_ord.rowsBetween(Window.unboundedPreceding,
                            Window.currentRow)
    stepped = df.withColumn("__d", x_units - t_units)
    stepped = stepped.withColumn("__S", F.sum("__d").over(run))
    # min over prefixes INCLUDING the empty one: least(min(S), 0)
    stepped = stepped.withColumn(
        "__minS", F.least(F.min("__S").over(run), F.lit(0)))
    out = stepped.withColumn(
        "cusum_units", F.col("__S") - F.col("__minS"))
    out = out.withColumn("alarm", F.col("cusum_units") > h_units)
    w_alarm = Window.partitionBy(*group_cols)
    first_alarm = F.min(
        F.when(F.col("alarm"), F.col(order_col))).over(w_alarm)
    out = out.withColumn(
        "first_alarm",
        F.col("alarm") & (F.col(order_col) == first_alarm))
    return out.drop("__d", "__S", "__minS")


def seasonal_decompose(
    df: DataFrame,
    *,
    group_cols: list[str],
    order_col: str,
    value_col: str,
    season_length: int,
    window: int,
) -> DataFrame:
    """Classical additive seasonal decomposition — the moving-average
    method, made EXACT: which part of a series is recurring pattern
    (day-of-week, hour-of-day) and which is trend?

    The textbook method computes ``detrended = x − centered_moving_
    average(x)`` in floats and averages by phase; the float average
    makes it order-sensitive. Scaling through by the window length
    ``k`` keeps everything integral:

        trend_k(t)   = Σ window of k values        (exact BIGINT)
        detrend_k(t) = k·x(t) − trend_k(t)         (exact BIGINT)
        seasonal(φ)  = Σ_t detrend_k / (k·n_φ)     (ONE IEEE division)

    Only full centered windows contribute (the standard edge rule),
    and the phase φ is the 0-based position in the season
    (``row_number − 1 mod season_length``). With integer inputs the
    sums are order-independent BIGINTs, so the SQL twin matches
    bit-for-bit.

    Scale shape: one group-keyed shuffle; the row_number, windowed
    sum, and windowed count all share the same (group, order) sort;
    the phase aggregate runs on the series grain. ``window`` must be
    odd (centered) and ≥ 3. Output: ``(group..., phase, n_obs,
    sum_detrend_k, seasonal)``.
    """
    k = int(window)
    m = int(season_length)
    if k < 3 or k % 2 == 0:
        raise ValueError("window must be odd and >= 3")
    if m < 2:
        raise ValueError("season_length must be >= 2")
    h = k // 2
    w_ord = Window.partitionBy(*group_cols).orderBy(order_col)
    w_cent = w_ord.rowsBetween(-h, h)
    x = F.col(value_col).cast("long")
    staged = df.select(
        *group_cols,
        x.alias("__x"),
        ((F.row_number().over(w_ord) - 1) % m).alias("phase"),
        F.sum(x).over(w_cent).alias("__trend_k"),
        F.count(F.lit(1)).over(w_cent).alias("__wn"),
    )
    full = staged.filter(F.col("__wn") == k).withColumn(
        "__detrend_k", F.lit(k) * F.col("__x") - F.col("__trend_k"))
    return (
        full.groupBy(*group_cols, "phase")
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            F.sum("__detrend_k").alias("sum_detrend_k"),
        )
        .withColumn(
            "seasonal",
            F.col("sum_detrend_k") / (F.lit(k) * F.col("n_obs")))
        .orderBy(*group_cols, "phase")
    )


def robust_seasonal_decompose(
    df: DataFrame,
    *,
    group_cols: list[str],
    order_col: str,
    value_col: str,
    season_length: int,
    window: int,
) -> DataFrame:
    """ROBUST additive seasonal decomposition — the median-based
    sibling of :func:`seasonal_decompose` (the reason STL uses robust
    smoothers, Cleveland et al. 1990: one promo-day spike drags a
    moving-AVERAGE trend and leaks into every phase's seasonal; medians
    shrug it off):

        trend(t)    = centered rolling MEDIAN over ``window`` rows
        detrend(t)  = x(t) − trend(t)
        seasonal(φ) = MEDIAN of detrend over phase φ
        remainder   = detrend − seasonal

    Every step is an exact INTEGER: medians are nearest-rank-lower
    picks from sorted arrays (odd ``window`` makes the trend median
    the true middle; phase medians use sorted index ``(n+1) div 2``,
    1-based), so the whole decomposition — including the remainder
    diagnostics — replays bit-for-bit on any engine with NO division
    anywhere. Phase is the CALENDAR position ``order mod
    season_length`` (gaps keep their phase — unlike
    :func:`seasonal_decompose`'s row-position phase).

    Scale shape: one group-keyed sort shared by the centered window;
    only full windows contribute (standard edge rule); phase medians
    aggregate per-(group, phase) arrays bounded by the series length —
    for multi-year daily series that is hundreds of values, KBs. One
    broadcast join carries seasonal back. Output per (group, phase):
    ``(group..., phase, n_obs, seasonal, remainder_abs_sum)``.
    """
    k = int(window)
    m = int(season_length)
    if k < 3 or k % 2 == 0:
        raise ValueError("window must be odd and >= 3")
    if m < 2:
        raise ValueError("season_length must be >= 2")
    h = k // 2
    w_cent = (
        Window.partitionBy(*group_cols).orderBy(order_col)
        .rowsBetween(-h, h)
    )
    x = F.col(value_col).cast("long")
    frame = F.array_sort(F.collect_list(x).over(w_cent))
    staged = df.select(
        *group_cols,
        x.alias("__x"),
        (F.col(order_col).cast("long") % m).alias("phase"),
        frame.alias("__fr"),
    ).withColumn("__wn", F.size("__fr"))
    full = staged.filter(F.col("__wn") == k).withColumn(
        "__detrend",
        F.col("__x") - F.element_at("__fr", (k + 1) // 2))
    seas = (
        full.groupBy(*group_cols, "phase")
        .agg(F.array_sort(F.collect_list("__detrend")).alias("__ds"))
        .select(
            *group_cols, "phase",
            F.element_at(
                F.col("__ds"),
                F.expr("(size(__ds) + 1) div 2").cast("int"),
            ).cast("long").alias("seasonal"),
        )
    )
    joined = full.join(F.broadcast(seas), [*group_cols, "phase"])
    return (
        joined.groupBy(*group_cols, "phase")
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            F.first("seasonal").alias("seasonal"),
            F.sum(F.abs(F.col("__detrend") - F.col("seasonal")))
            .alias("remainder_abs_sum"),
        )
        .orderBy(*group_cols, "phase")
    )


def holt_forecast(
    df: DataFrame,
    *,
    group_cols: list[str],
    order_col: str,
    value_col: str,
    alpha_pct: int = 30,
    beta_pct: int = 10,
    horizon: int = 7,
) -> DataFrame:
    """Holt double exponential smoothing (level + trend) with an
    h-step-ahead forecast per series — the workhorse short-range
    forecaster for capacity planning, done in EXACT integer
    arithmetic so the recursion is bit-replayable cross-engine.

    Float Holt is doubly order-sensitive (two coupled recursions).
    Here smoothing weights are integer percents and every step is a
    FLOOR division over integer value units:

        l_t = (α·x_t + (100−α)·(l_{t−1} + b_{t−1})) fdiv 100
        b_t = (β·(l_t − l_{t−1}) + (100−β)·b_{t−1}) fdiv 100

    seeded ``l_1 = x_1, b_1 = 0``; forecast = ``l_n + h·b_n``. The
    flooring bias is < 1 value unit per step — pass cents (or any
    integer grain) and it is noise; in exchange the whole recursion
    is a pure function of the series and the oracle replays it with
    a recursive CTE. Floor (not truncate-toward-zero) semantics on
    the possibly-negative trend numerator keep Spark and DuckDB
    ``//`` in exact agreement.

    Scale shape: same as :func:`ewma` — ONE group shuffle, the
    recursion folds inside a JVM higher-order ``aggregate`` over
    each group's order-sorted array (no UDFs, no per-row Python);
    group size = series length, bounded by the grain. Output: one
    row per group — ``(group..., n_periods, level, trend,
    forecast)`` in input value units.
    """
    a, b = int(alpha_pct), int(beta_pct)
    if not 0 < a <= 100 or not 0 <= b <= 100:
        raise ValueError("alpha_pct in (0,100], beta_pct in [0,100]")
    if horizon < 0:
        raise ValueError("horizon must be >= 0")

    def fdiv100(col):
        # floor division by 100 for possibly-negative bigints (DIV
        # truncates toward zero; DuckDB // floors): subtract the
        # canonical non-negative remainder, making the numerator an
        # EXACT multiple of 100, then divide in decimal — `/ 100` on
        # longs detours through double and silently loses exactness
        # past 2^53 (level/trend numerators run ~100x input units)
        r = ((col % 100) + 100) % 100
        return (
            (col - r).cast("decimal(38,0)")
            / F.lit(100).cast("decimal(3,0)")
        ).cast("long")

    def step(acc, s):
        first = F.struct(F.lit(1).cast("long").alias("n"),
                         s["x"].alias("l"),
                         F.lit(0).cast("long").alias("b"))
        new_l = fdiv100(F.lit(a) * s["x"]
                        + F.lit(100 - a) * (acc["l"] + acc["b"]))
        new_b = fdiv100(F.lit(b) * (new_l - acc["l"])
                        + F.lit(100 - b) * acc["b"])
        rest = F.struct((acc["n"] + 1).alias("n"),
                        new_l.alias("l"), new_b.alias("b"))
        return F.when(acc["n"] == 0, first).otherwise(rest)

    arr = F.sort_array(
        F.collect_list(F.struct(F.col(order_col).alias("o"),
                                F.col(value_col).cast("long")
                                .alias("x"))))
    fold = F.aggregate(
        arr,
        F.expr("named_struct('n', CAST(0 AS BIGINT), "
               "'l', CAST(0 AS BIGINT), 'b', CAST(0 AS BIGINT))"),
        step,
    )
    grouped = df.groupBy(*group_cols).agg(fold.alias("__st"))
    return grouped.select(
        *group_cols,
        F.col("__st.n").alias("n_periods"),
        F.col("__st.l").alias("level"),
        F.col("__st.b").alias("trend"),
        (F.col("__st.l") + F.lit(int(horizon)) * F.col("__st.b"))
        .alias("forecast"),
    )


def sse_changepoint(
    df: DataFrame,
    *,
    group_cols: list[str],
    order_col: str,
    value_col: str,
    gain_scale: int = 10 ** 6,
) -> DataFrame:
    """Offline least-squares single change-point per series — the
    binary-segmentation step (Scott-Knott / CUSUM's offline sibling):
    the split ``k`` minimizing total SSE of the two segment means,
    with the variance-reduction gain it buys.

    EXACT integer arithmetic throughout: with prefix sum ``S_k``,
    total ``S``, the SSE reduction at split k is

        gain(k) = (n·S_k − k·S)² / (n·k·(n−k))

    (all in squared value units). Numerator and denominator are exact
    BIGINT-domain integers widened to ``decimal(38,0)``; the reported
    ``gain_units`` is the exact floor of ``gain_scale·gain(k)``
    computed remainder-first (``(a − a % d) / d`` — an exact multiple,
    so the decimal division is exact; no double detour, no rounding
    mode to disagree on). The argmax is ``max_by`` on the pair
    ``(gain_units, −k)`` — deterministic smallest-k tie-break. A
    DuckDB twin replays the identical recurrence on HUGEINT with
    ``//``. Domain: ``gain_scale·|value|²·n`` must stay inside 38
    digits (int64 series sums ~1e10 and 1e4 periods are fine).

    Scale shape: one shuffle on the group key; the prefix-sum window
    and the final argmax aggregate share it. Frames are the series
    grain. No iteration — the classic O(n) scan per series is a
    window + aggregate.

    Output: one row per group —
    ``(group..., n, cp_index, cp_order, gain_units, mean_left,
    mean_right)`` where ``cp_index`` = size of the left segment and
    ``cp_order`` = the last ``order_col`` value inside it.
    """
    if gain_scale < 1:
        raise ValueError("gain_scale must be >= 1")
    w = Window.partitionBy(*group_cols).orderBy(order_col)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grp = Window.partitionBy(*group_cols)

    x = F.col(value_col).cast("long")
    d = df.select(*group_cols, F.col(order_col), x.alias("__x"))
    d = d.withColumn("__k", F.row_number().over(w))
    d = d.withColumn("__Sk", F.sum("__x").over(run))
    d = d.withColumn("__n", F.count(F.lit(1)).over(grp))
    d = d.withColumn("__S", F.sum("__x").over(grp))
    d = d.filter(F.col("__k") < F.col("__n"))  # splits 1..n-1

    dec = "decimal(38,0)"
    n_ = F.col("__n").cast(dec)
    k_ = F.col("__k").cast(dec)
    num_root = n_ * F.col("__Sk").cast(dec) - k_ * F.col("__S").cast(dec)
    a = F.lit(int(gain_scale)).cast(dec) * num_root * num_root
    den = n_ * k_ * (n_ - k_)
    gain = ((a - a % den) / den).cast("long")

    d = d.withColumn("__gain", gain)
    best = d.groupBy(*group_cols).agg(
        F.first("__n").alias("n"),
        F.max(F.struct(F.col("__gain"),
                       (-F.col("__k")).alias("__negk"),
                       F.col("__k"),
                       F.col(order_col).alias("__o"),
                       F.col("__Sk"),
                       F.col("__S"))).alias("__b"),
    )
    kk = F.col("__b.__k").cast("long")
    nn = F.col("n").cast("long")
    return best.select(
        *group_cols,
        nn.alias("n"),
        kk.alias("cp_index"),
        F.col("__b.__o").alias("cp_order"),
        F.col("__b.__gain").alias("gain_units"),
        (F.col("__b.__Sk").cast("double") / kk.cast("double"))
        .alias("mean_left"),
        ((F.col("__b.__S") - F.col("__b.__Sk")).cast("double")
         / (nn - kk).cast("double")).alias("mean_right"),
    )


def theil_sen(
    df: DataFrame,
    *,
    group_cols: list[str],
    order_col: str,
    value_col: str,
) -> DataFrame:
    """Theil–Sen robust trend per series: the MEDIAN of all pairwise
    slopes ``(x_j − x_i)/(t_j − t_i)`` — a 29% breakdown-point slope
    estimator immune to the outliers that wreck OLS on dirty rollups.
    Intercept = ``median(x_i − slope·t_i)`` (Sen 1968's residual
    median — robust, unlike ``median(x) − slope·median(t)``).

    Each pairwise slope is ONE deterministic IEEE division of exact
    integers; the median uses the exact ``percentile`` aggregate
    (halves interpolation — DuckDB ``quantile_cont`` parity, the same
    contract ``mad_outliers`` pins).

    Scale shape: the pair generation is a group-keyed self-join —
    O(grain²) per series, bounded by the GRAIN, not raw volume (365
    daily points → 66k pairs); re-grain first for multi-year fine
    grains. One shuffle for the join, one for the median aggregate.

    Output: ``(group..., n, n_pairs, slope, intercept)``.
    """
    a = df.select(*group_cols,
                  F.col(order_col).cast("long").alias("__t"),
                  F.col(value_col).cast("long").alias("__x"))
    l = a.select(*group_cols, F.col("__t").alias("__ti"),
                 F.col("__x").alias("__xi"))
    r = a.select(*group_cols, F.col("__t").alias("__tj"),
                 F.col("__x").alias("__xj"))
    pairs = l.join(r, group_cols).filter(F.col("__ti") < F.col("__tj"))
    slope = (
        (F.col("__xj") - F.col("__xi")).cast("double")
        / (F.col("__tj") - F.col("__ti")).cast("double")
    )
    med = pairs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.percentile(slope, F.lit(0.5)).alias("slope"),
    )
    resid = a.join(F.broadcast(med), group_cols).withColumn(
        "__r", F.col("__x").cast("double")
        - F.col("slope") * F.col("__t").cast("double"))
    return resid.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.first("n_pairs").alias("n_pairs"),
        F.first("slope").alias("slope"),
        F.percentile(F.col("__r"), F.lit(0.5)).alias("intercept"),
    ).select(*group_cols, "n", "n_pairs", "slope", "intercept")


def cross_correlation(
    df: DataFrame,
    *,
    group_cols: list[str],
    order_col: str,
    x_col: str,
    y_col: str,
    lags: list[int],
) -> DataFrame:
    """Lagged Pearson cross-correlation between two aligned series:
    ``r(lag) = corr(x_t, y_{t+lag})`` — the lead/lag discovery tool
    (does event stream X anticipate stream Y?).

    Unlike :func:`autocorrelation` (which uses ``F.corr``), every
    moment here is an EXACT integer sum (inputs cast to long); the
    only IEEE operations are the final
    ``num / sqrt(dx) / sqrt(dy)`` — a fixed op order both engines
    replay bit-for-bit. ONE window pass materializes every lead
    column (shared sort), one aggregate per group computes all lags.

    Output: ``(group..., lag, n_pairs, xcorr)``; ``xcorr`` is NULL
    for degenerate (zero-variance) windows.
    """
    if not lags:
        raise ValueError("lags must be non-empty")
    if any(lag < 0 for lag in lags):
        raise ValueError("lags must be >= 0")
    w = Window.partitionBy(*group_cols).orderBy(order_col)
    x = F.col(x_col).cast("long")
    y = F.col(y_col).cast("long")
    led = df.select(
        *group_cols, x.alias("__x"),
        *[F.lead(y, lag).over(w).alias(f"__y{lag}") for lag in lags],
    )
    aggs = []
    for lag in lags:
        yl = F.col(f"__y{lag}")
        ok = yl.isNotNull()
        xi = F.when(ok, F.col("__x"))
        aggs += [
            F.count(xi).alias(f"__n{lag}"),
            F.sum(xi).alias(f"__sx{lag}"),
            F.sum(yl).alias(f"__sy{lag}"),
            F.sum(xi * xi).alias(f"__sxx{lag}"),
            F.sum(yl * yl).alias(f"__syy{lag}"),
            F.sum(xi * yl).alias(f"__sxy{lag}"),
        ]
    agg = led.groupBy(*group_cols).agg(*aggs)
    rows = []
    for lag in lags:
        n = F.col(f"__n{lag}")
        num = n * F.col(f"__sxy{lag}") \
            - F.col(f"__sx{lag}") * F.col(f"__sy{lag}")
        dx = n * F.col(f"__sxx{lag}") \
            - F.col(f"__sx{lag}") * F.col(f"__sx{lag}")
        dy = n * F.col(f"__syy{lag}") \
            - F.col(f"__sy{lag}") * F.col(f"__sy{lag}")
        r = F.when(
            (dx > 0) & (dy > 0),
            num.cast("double")
            / F.sqrt(dx.cast("double"))
            / F.sqrt(dy.cast("double")))
        rows.append(F.struct(
            F.lit(lag).cast("long").alias("lag"),
            n.cast("long").alias("n_pairs"),
            r.alias("xcorr")))
    pairs = F.explode(F.array(*rows)).alias("__p")
    return agg.select(*group_cols, pairs).select(
        *group_cols,
        F.col("__p.lag").alias("lag"),
        F.col("__p.n_pairs").alias("n_pairs"),
        F.col("__p.xcorr").alias("xcorr"),
    )


def markov_absorption(
    df: DataFrame,
    *,
    entity_col: str,
    order_cols: list[str],
    state_col: str,
    target: str,
    sinks: list[str],
    n_iter: int = 12,
    scale: int = 10 ** 12,
) -> DataFrame:
    """Absorbing-Markov-chain absorption probabilities — "starting
    from state s, does the empirical chain reach ``target`` before
    any competing ``sinks``?" (conversion-vs-abandonment, the funnel
    question answered with full path structure instead of one fixed
    step order).

    Model: first-order transition counts from per-entity ordered
    streams (same lag construction as :func:`markov_transitions`);
    ``target`` and every sink are declared ABSORBING — their outgoing
    transitions are dropped. The absorption vector is the fixed point
    of ``x(s) = Σ_t P(s,t)·x(t)`` with ``x(target)=1``,
    ``x(sink)=0``; this runs ``n_iter`` EXACT integer rounds in
    ``1/scale`` units — ``x'(s) = floor(Σ_t c(s,t)·x(t) / c(s))``,
    every intermediate a BIGINT — so the twin SQL replay of the same
    rounds is bit-identical (the same fixed-point discipline as
    PageRank/HITS). n_iter bounds the horizon: probabilities are
    "absorbed within n_iter steps", monotonically converging from
    below.

    Scale shape: ONE entity-keyed window pass over the raw stream +
    one (from, to) count aggregate — the only volume-touching steps.
    The iteration state is the |S|-vector x over the STATE ALPHABET
    (event types — bounded by construction, KB), so rounds run
    driver-side over the collected |S|² transition cells: zero
    per-round Spark jobs, zero lineage growth. Output:
    ``(state, is_absorbing, n_out, prob_scaled)``.
    """
    if n_iter < 1:
        raise ValueError("n_iter must be >= 1")
    absorbing = [target] + [s for s in sinks if s != target]
    w = Window.partitionBy(entity_col).orderBy(*order_cols)
    seq = df.select(
        F.lag(state_col).over(w).alias("__f"),
        F.col(state_col).alias("__t"),
    ).where(F.col("__f").isNotNull())
    # the |S|² cell frame is alphabet-bounded: ONE collect, then the
    # exact integer fixed point runs driver-side (no per-round jobs)
    cells = (
        seq.filter(~F.col("__f").isin(absorbing))
        .groupBy("__f", "__t").agg(F.count(F.lit(1)).alias("__c"))
        .collect()
    )
    counts = {(r["__f"], r["__t"]): r["__c"] for r in cells}
    n_out: dict = {}
    for (f, _), c in counts.items():
        n_out[f] = n_out.get(f, 0) + c
    states = sorted({f for f, _ in counts}
                    | {t for _, t in counts} | set(absorbing))
    q = int(scale)
    x = {s: (q if s == target else 0) for s in states}
    for _ in range(n_iter):
        nxt = {}
        for s in states:
            if s in absorbing:
                nxt[s] = q if s == target else 0
            else:
                num = sum(c * x[t] for (f, t), c in counts.items()
                          if f == s)
                nxt[s] = num // n_out[s] if s in n_out else 0
        x = nxt
    spark = df.sparkSession
    rows = [(s, s in absorbing, int(n_out.get(s, 0)), int(x[s]))
            for s in states]
    return spark.createDataFrame(
        rows, "state string, is_absorbing boolean, n_out long, "
              "prob_scaled long")


def ohlc_vwap(
    df: DataFrame,
    *,
    group_cols: list[str],
    order_col: str,
    bucket_col: str,
    value_col: str,
    qty_col: str | None = None,
) -> DataFrame:
    """OHLC candlestick + VWAP per time bucket — the hypertable rollup
    every monitoring/finance pipeline runs: open/close are the
    first/last values in ``order_col`` order (``min_by``/``max_by`` —
    one aggregate, no window), high/low are min/max, and VWAP is the
    quantity-weighted mean ``Σ v·q / Σ q`` from EXACT integer sums
    with ONE trailing IEEE division (null when the bucket's quantity
    is zero). Without ``qty_col`` every row weighs 1 (plain mean, same
    exactness).

    Scale shape: ONE hash aggregate over the detail rows (min_by/
    max_by carry (order, value) pairs through the partial combine);
    output is the bucket grain. ``order_col`` must be unique within a
    bucket (include a tiebreaker in its construction) for
    deterministic open/close.

    Output: ``(group..., bucket, n, open, high, low, close,
    sum_qty, vwap)`` — value columns in input units (cast to long).
    """
    v = F.col(value_col).cast("long")
    q = (F.col(qty_col).cast("long") if qty_col is not None
         else F.lit(1).cast("long"))
    o = F.col(order_col)
    agg = df.groupBy(*group_cols, F.col(bucket_col).alias("bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        F.min_by(v, o).alias("open"),
        F.max(v).alias("high"),
        F.min(v).alias("low"),
        F.max_by(v, o).alias("close"),
        F.sum(q).alias("sum_qty"),
        F.sum(v * q).alias("__pq"),
    )
    return agg.select(
        *group_cols, "bucket", "n", "open", "high", "low", "close",
        "sum_qty",
        F.when(F.col("sum_qty") > 0,
               F.col("__pq").cast("double")
               / F.col("sum_qty").cast("double")).alias("vwap"),
    )


def activity_streaks(
    df: DataFrame,
    *,
    entity_col: str,
    period_col: str,
) -> DataFrame:
    """Gaps-and-islands: each entity's maximal runs of CONSECUTIVE
    active periods (the retention/engagement streak metric). The
    classic trick: within an entity, consecutive periods share the
    constant ``period − row_number`` (one window), so a streak is one
    group of that difference — no self-joins, no iteration.

    Scale shape: one distinct aggregate to the (entity, period)
    grain, one entity-keyed window (row_number), one streak
    aggregate. All exact integers.

    Output: one row per streak —
    ``(entity, streak_start, streak_end, length)``.
    """
    w = Window.partitionBy(entity_col).orderBy("__p")
    grain = df.select(F.col(entity_col),
                      F.col(period_col).cast("long").alias("__p")) \
        .distinct()
    keyed = grain.withColumn(
        "__grp", F.col("__p") - F.row_number().over(w))
    return (
        keyed.groupBy(entity_col, "__grp")
        .agg(F.min("__p").alias("streak_start"),
             F.max("__p").alias("streak_end"),
             F.count(F.lit(1)).alias("length"))
        .drop("__grp")
    )


def time_weighted_average(
    df: DataFrame,
    *,
    group_cols: list[str],
    time_col: str,
    value_col: str,
) -> DataFrame:
    """Time-weighted average over an IRREGULARLY-sampled series
    (TimescaleDB ``time_weight('LOCF')`` semantics): each sample
    holds its value until the next sample, so
    ``TWA = Σ v_i·(t_{i+1} − t_i) / (t_n − t_0)`` — the honest mean
    for gauges sampled on change, where the plain AVG over-weights
    bursts.

    The integral numerator is an EXACT integer sum (value units ×
    time units — mind the 2^63 domain: quantize coarse grains first
    for century-long nanosecond series); the average is ONE IEEE
    division. One entity-keyed window (lead) + one aggregate.

    Contract: ``time_col`` must be UNIQUE within each group — with
    duplicate timestamps the LOCF ``lead`` order (and therefore which
    value holds the interval) depends on physical row placement.
    Pre-collapse duplicates first (e.g. ``max_by``/``avg`` per
    timestamp, as the gate query does with its per-second grain).

    Output: ``(group..., n, t_first, t_last, twa_num, span, twa)``;
    groups with a single sample have zero span and a null twa.
    """
    w = Window.partitionBy(*group_cols).orderBy("__t")
    d = df.select(*group_cols,
                  F.col(time_col).cast("long").alias("__t"),
                  F.col(value_col).cast("long").alias("__v"))
    led = d.withColumn("__tn", F.lead("__t").over(w))
    agg = led.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("__t").alias("t_first"),
        F.max("__t").alias("t_last"),
        F.sum(F.when(F.col("__tn").isNotNull(),
                     F.col("__v") * (F.col("__tn") - F.col("__t")))
              .otherwise(F.lit(0))).alias("twa_num"),
    )
    span = F.col("t_last") - F.col("t_first")
    return agg.select(
        *group_cols, "n", "t_first", "t_last", "twa_num",
        span.alias("span"),
        F.when(span > 0,
               F.col("twa_num").cast("double") / span.cast("double"))
        .alias("twa"),
    )


def rolling_quantile(
    df: DataFrame,
    *,
    group_cols: list[str],
    order_cols: list[str],
    value_col: str,
    q_num: int,
    q_den: int,
    window_rows: int | None = None,
    range_interval: int | None = None,
    out_col: str = "rolling_q",
    max_frame: int | None = 10_000,
) -> DataFrame:
    """EXACT trailing rolling quantile per series — the one common
    time-series screen the suite lacked (rolling median / p90 for
    robust thresholds, SLO monitors, outlier-resistant baselines).

    Definition (deterministic, integer-exact): over the trailing
    frame — ``window_rows`` rows (current inclusive; shorter at the
    series head, standard SQL semantics) or, with ``range_interval``,
    every row whose single numeric order value lies in
    ``[current − range_interval, current]`` (SQL RANGE semantics:
    equal-order peers share frames) — the NEAREST-RANK-LOWER order
    statistic — the sorted frame's element at 0-based index
    ``((n − 1) · q_num) // q_den`` where ``n`` is the frame size. The
    index arithmetic is pure integers and the pick is an array index,
    so for integral values the whole operator replays bit-for-bit on
    any engine (no interpolation, whose ``(1−f)·a + f·b`` op order is
    an IEEE hazard across engines). q = q_num/q_den, e.g. (1, 2) for
    the median, (9, 10) for p90.

    ``order_cols`` must be a TOTAL order within each group (append a
    unique tiebreak) — otherwise frame membership at the window edge
    depends on physical row order.

    Scale shape: ONE group-keyed window pass; per row the frame's
    ``window_rows`` values are collected and sorted — O(w log w) per
    row, JVM-side, bounded by the window size, never by series length.
    For very large windows (w in the tens of thousands) switch to
    :func:`operators.sketches.sliding_quantile_digest` (mergeable
    per-period digests); for the usual 7..1000-row trailing
    screens the exact sort is the right cost.

    NULL ``value_col`` rows are EXCLUDED from frames (Spark's
    ``collect_list`` semantics, made explicit here because other
    engines' list aggregates KEEP nulls); a row whose frame is all
    null gets a NULL quantile. Returns the input plus ``out_col``
    (same type as ``value_col``).

    ``max_frame`` (default 10k) makes the 100x-scale misuse fail LOUD
    instead of silently running O(w log w)/row with a fat per-task
    window state: ``window_rows`` beyond it raises here, and in RANGE
    mode — where the frame size is data-density-dependent and
    unbounded — a runtime guard raises from the executor the moment
    any row's frame exceeds it. For genuinely huge windows switch to
    a mergeable sketch (GK / equi-depth, ``operators/sketches.py``);
    ``max_frame=None`` disables the guard if you really mean it.
    """
    if (window_rows is None) == (range_interval is None):
        raise ValueError(
            "exactly one of window_rows / range_interval must be set")
    if window_rows is not None and window_rows < 1:
        raise ValueError("window_rows must be >= 1")
    if range_interval is not None and range_interval < 0:
        raise ValueError("range_interval must be >= 0")
    if q_den <= 0 or not 0 <= q_num <= q_den:
        raise ValueError("quantile q_num/q_den must be in [0, 1]")
    if not group_cols or not order_cols:
        raise ValueError("group_cols and order_cols must be non-empty")
    if (max_frame is not None and window_rows is not None
            and window_rows > max_frame):
        raise ValueError(
            f"window_rows={window_rows} exceeds max_frame={max_frame}: "
            f"the exact rolling family collects and sorts the whole "
            f"frame per row — use a mergeable digest "
            f"(operators/sketches.py sliding_quantile_digest) "
            f"for windows this large, or pass max_frame=None/larger "
            f"to accept the O(w log w)/row cost")
    base = Window.partitionBy(*group_cols).orderBy(*order_cols)
    if window_rows is not None:
        w = base.rowsBetween(-(window_rows - 1), 0)
    else:
        # time-based trailing window: all rows whose order value lies
        # in [current − range_interval, current] — SQL RANGE semantics,
        # so equal-order peers are always in each other's frame.
        # Requires a single numeric order column (SQL RANGE rule).
        if len(order_cols) != 1:
            raise ValueError(
                "range_interval requires exactly one numeric order col")
        w = base.rangeBetween(-int(range_interval), 0)
    frame = F.sort_array(F.collect_list(value_col).over(w))
    idx = F.expr(
        f"(size({'__frame'}) - 1) * {int(q_num)}L div {int(q_den)}L")
    # empty frame (every value in the window NULL): element_at(arr, 0)
    # is an ANSI error, not a null — guard explicitly. In RANGE mode
    # the frame size is data-density-dependent, so the max_frame guard
    # must run per row ON THE EXECUTOR: the raise_error branch sits
    # FIRST in the when-chain and fires before any sort/pick work.
    pick = F.when(
        F.size("__frame") > 0,
        F.element_at(F.col("__frame"), (idx + 1).cast("int")),
    )
    if max_frame is not None and range_interval is not None:
        pick = F.when(
            F.size("__frame") > int(max_frame),
            F.raise_error(F.lit(
                f"rolling_quantile: a RANGE frame exceeded "
                f"max_frame={max_frame} rows — dense series + wide "
                f"range_interval; switch to sketches.sliding_quantile_digest "
                f"(mergeable digests) or pass max_frame=None/larger")),
        ).otherwise(pick)
    return df.withColumn("__frame", frame).withColumn(
        out_col, pick
    ).drop("__frame")


def rolling_mad(
    df: DataFrame,
    *,
    group_cols: list[str],
    order_cols: list[str],
    value_col: str,
    window_rows: int | None = None,
    range_interval: int | None = None,
    med_col: str = "rolling_med",
    mad_col: str = "rolling_mad",
    max_frame: int | None = 10_000,
) -> DataFrame:
    """EXACT rolling median absolute deviation per series — the robust
    complement to :func:`rolling_zscore` (mean/stddev break on one
    outlier; median/MAD don't), the standard basis for outlier
    screens on noisy operational series.

    Per trailing frame (rows or range, same contract as
    :func:`rolling_quantile`): ``med`` = the frame's lower median
    (nearest-rank index ``(n−1)//2``), ``mad`` = the lower median of
    ``|v − med|`` over the SAME frame — the true rolling MAD, not the
    deviation-from-a-previous-median shortcut. For integral values
    every step (sort, index, abs, sort) is exact integer/array
    arithmetic, so any engine replays it bit-for-bit.

    One group-keyed window pass; both statistics come from the one
    collected frame via array expressions (the median is let-bound so
    the deviation transform reads a value, not a re-computed
    subexpression). NULL values are excluded from frames
    (collect_list semantics); an all-null frame yields NULLs.

    ``max_frame`` has the :func:`rolling_quantile` contract: oversize
    ``window_rows`` raises at call time, an oversize RANGE frame
    raises at runtime (frame size there is data-density-dependent);
    switch to :func:`operators.sketches.sliding_quantile_digest` for
    genuinely huge windows.

    Returns the input plus ``med_col`` and ``mad_col``.
    """
    if (window_rows is None) == (range_interval is None):
        raise ValueError(
            "exactly one of window_rows / range_interval must be set")
    if window_rows is not None and window_rows < 1:
        raise ValueError("window_rows must be >= 1")
    if range_interval is not None and range_interval < 0:
        raise ValueError("range_interval must be >= 0")
    if not group_cols or not order_cols:
        raise ValueError("group_cols and order_cols must be non-empty")
    if (max_frame is not None and window_rows is not None
            and window_rows > max_frame):
        raise ValueError(
            f"window_rows={window_rows} exceeds max_frame={max_frame}: "
            f"the exact rolling family collects and sorts the whole "
            f"frame per row — use a mergeable digest "
            f"(operators/sketches.py sliding_quantile_digest) "
            f"for windows this large, or pass max_frame=None/larger "
            f"to accept the O(w log w)/row cost")
    base = Window.partitionBy(*group_cols).orderBy(*order_cols)
    if window_rows is not None:
        w = base.rowsBetween(-(window_rows - 1), 0)
    else:
        if len(order_cols) != 1:
            raise ValueError(
                "range_interval requires exactly one numeric order col")
        w = base.rangeBetween(-int(range_interval), 0)
    frame = F.sort_array(F.collect_list(value_col).over(w))
    # med let-bound via transform-over-singleton so the deviation
    # lambda reads a bound VALUE (project-collapse would otherwise
    # inline the element_at(median) pick once per element)
    stats = F.expr(
        "transform(array(__frame), f -> if(size(f) = 0, null,"
        " transform(array(element_at(f,"
        "   cast((size(f) - 1) div 2 + 1 as int))), m -> named_struct("
        "   'med', m,"
        "   'mad', element_at("
        "     array_sort(transform(f, v -> abs(v - m))),"
        "     cast((size(f) - 1) div 2 + 1 as int))"
        " ))[0]))[0]")
    if max_frame is not None and range_interval is not None:
        # RANGE frames are data-density-dependent: guard per row on
        # the executor, firing before the double sort
        stats = F.when(
            F.size("__frame") > int(max_frame),
            F.raise_error(F.lit(
                f"rolling_mad: a RANGE frame exceeded "
                f"max_frame={max_frame} rows — dense series + wide "
                f"range_interval; switch to sketches.sliding_quantile_digest "
                f"(mergeable digests) or pass max_frame=None/larger")),
        ).otherwise(stats)
    return (
        df.withColumn("__frame", frame)
        .withColumn("__st", stats)
        .withColumn(med_col, F.col("__st.med"))
        .withColumn(mad_col, F.col("__st.mad"))
        .drop("__frame", "__st")
    )
