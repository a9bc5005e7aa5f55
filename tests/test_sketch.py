"""Count-min / Bloom sketch invariants (operators/sketch.py)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from usearch_spark.operators.sketch import (
    bloom_build,
    bloom_maybe_contains,
    cms_estimate,
    count_min_sketch,
)


def _freqs(spark):
    # skewed key frequencies: key k appears (50 - k) times for k in 0..49
    rows = [(k,) for k in range(50) for _ in range(50 - k)]
    return spark.createDataFrame(rows, "k int")


def test_cms_never_underestimates_and_is_tight_here(spark):
    df = _freqs(spark)
    sk = count_min_sketch(df, "k", depth=4, prefix_len=2)
    est = {
        r["k"]: r["est"]
        for r in cms_estimate(sk, df, "k", depth=4, prefix_len=2).collect()
    }
    truth = {k: 50 - k for k in range(50)}
    assert set(est) == set(truth)
    for k, t in truth.items():
        assert est[k] >= t, f"CMS underestimated key {k}"
    # 50 keys in 256 buckets x 4 seeds: collisions possible but the min
    # over seeds should be exact for the large majority
    exact = sum(1 for k in truth if est[k] == truth[k])
    assert exact >= 40


def test_cms_is_mergeable(spark):
    """Sketch(A ∪ B) == Sketch(A) + Sketch(B) cell-wise — the property
    that makes the sketch distributable."""
    df = _freqs(spark)
    a = df.filter(F.col("k") % 2 == 0)
    b = df.filter(F.col("k") % 2 == 1)
    merged = (
        count_min_sketch(a, "k")
        .unionByName(count_min_sketch(b, "k"))
        .groupBy("seed", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = count_min_sketch(df, "k")
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))


def test_cms_sketch_size_bounded(spark):
    sk = count_min_sketch(_freqs(spark), "k", depth=4, prefix_len=2)
    assert sk.count() <= 4 * 256


def test_bloom_no_false_negatives(spark):
    members = spark.createDataFrame([(i,) for i in range(0, 200, 2)], "k int")
    probes = spark.createDataFrame([(i,) for i in range(200)], "k int")
    bloom = bloom_build(members, "k", hashes=3, prefix_len=3)
    flags = {r["k"]: r["maybe"] for r in bloom_maybe_contains(bloom, probes, "k").collect()}
    for i in range(0, 200, 2):
        assert flags[i] == 1, f"false negative for member {i}"
    # 100 members x 3 hashes in 4096 bits: false-positive rate ~0.04%,
    # so the non-member half should be nearly all 0
    fps = sum(flags[i] for i in range(1, 200, 2))
    assert fps <= 5


def test_hll_sketch_accuracy_and_mergeability(spark):
    """HLL sketch: estimates land inside the m=16 error regime on known
    cardinalities, merging per-group sketches equals sketching the whole
    input (the defining HLL property), and registers are deterministic."""
    from pyspark.sql import functions as F

    from usearch_spark.operators.sketch import hll_estimate, hll_merge, hll_sketch

    df = spark.range(3000).select(
        (F.col("id") % 3).cast("string").alias("g"), F.col("id").alias("k")
    )
    sk = hll_sketch(df, "k", ["g"])
    per = {r["g"]: r["est"] for r in hll_estimate(sk, ["g"]).collect()}
    # each group holds 1000 distinct keys; m=16 sigma ~26%
    for g, est in per.items():
        assert 400 < est < 2500, (g, est)
    merged_est = hll_estimate(hll_merge(sk, []), []).collect()[0]["est"]
    whole_est = hll_estimate(hll_sketch(df, "k", []), []).collect()[0]["est"]
    assert merged_est == whole_est  # merge-of-parts == sketch-of-whole
    assert 1200 < merged_est < 7500
    again = {r["g"]: r["est"] for r in hll_estimate(hll_sketch(df, "k", ["g"]), ["g"]).collect()}
    assert again == per


def test_log_hist_sketch_merge_and_quantiles(spark):
    """Log-histogram quantile sketch: merge-of-parts equals
    sketch-of-whole cell-for-cell; the p50/p90 estimates are bin lower
    bounds within 25% below the true rank value; sketch size is bounded
    by bins, not rows."""
    from usearch_spark.operators.sketch import (
        log_hist_merge,
        log_hist_quantile,
        log_hist_sketch,
    )

    rows = [(i % 3, float(1 + (i * 37) % 1000) + 0.25) for i in range(3000)]
    df = spark.createDataFrame(rows, "g int, x double").withColumn(
        "part", F.pmod(F.monotonically_increasing_id(), F.lit(4))
    )
    parts = log_hist_sketch(df, "x", ["g", "part"])
    merged = sorted(
        map(tuple, log_hist_merge(parts, ["g"]).collect())
    )
    whole = sorted(map(tuple, log_hist_sketch(df, "x", ["g"]).collect()))
    assert merged == whole and len(merged) > 0
    assert len(merged) <= 3 * 4 * 24  # bounded bins, not 3000 rows

    sk = log_hist_sketch(df, "x", ["g"])
    for qn, qd in ((1, 2), (9, 10)):
        est = {
            r["g"]: r["est"]
            for r in log_hist_quantile(sk, ["g"], qn, qd).collect()
        }
        import math

        for g in (0, 1, 2):
            vals = sorted(x for gg, x in rows if gg == g)
            true = vals[math.ceil(qn * len(vals) / qd) - 1]
            assert est[g] <= true + 0.01
            assert true < est[g] * 1.25 + 0.01, (g, qn, qd, est[g], true)


def test_kmv_exact_below_k_and_estimator_accuracy(spark):
    """Below k the sketch holds every distinct hash (estimate == exact
    count); above k the (k-1)·2^60/h_k estimator lands within the
    ~1/sqrt(k-2) relative-error regime."""
    from pyspark.sql import functions as F

    from usearch_spark.operators.sketch import kmv_estimate, kmv_sketch

    df = spark.range(5000).select(
        (F.col("id") % 2).alias("g"),
        # group 0: 30 distinct keys (< k); group 1: 2500 distinct
        F.when(F.col("id") % 2 == 0, F.col("id") % 60).otherwise(F.col("id")).alias("k"),
    )
    sk = kmv_sketch(df, "k", ["g"], k=64)
    est = {r["g"]: (r["n_sketch"], r["est"]) for r in kmv_estimate(sk, ["g"], k=64).collect()}
    assert est[0] == (30, 30.0)  # exact path
    n1, e1 = est[1]
    assert n1 == 64 and abs(e1 - 2500) / 2500 < 0.5  # estimator path


def test_kmv_merge_equals_whole(spark):
    """min-k of the parts' min-ks == the whole input's min-k, row for
    row — the defining bottom-k mergeability."""
    from pyspark.sql import functions as F

    from usearch_spark.operators.sketch import kmv_merge, kmv_sketch

    df = spark.range(3000).select(
        (F.col("id") % 3).alias("g"), F.col("id").alias("k"),
        (F.col("id") % 4).alias("part"),
    )
    parts = kmv_sketch(df, "k", ["g", "part"], k=32)
    merged = sorted(map(tuple, kmv_merge(parts, ["g"], k=32).collect()))
    whole = sorted(map(tuple, kmv_sketch(df, "k", ["g"], k=32).collect()))
    assert merged == whole and len(whole) == 3 * 32


def test_kmv_intersect_exact_when_sketch_holds_everything(spark):
    """m < k collapses the estimator chain to the exact intersection."""
    from pyspark.sql import functions as F

    from usearch_spark.operators.sketch import kmv_intersect_estimate, kmv_sketch

    a = spark.range(0, 30).select(F.lit(0).alias("g"), F.col("id").alias("k"))
    b = spark.range(20, 50).select(F.lit(0).alias("g"), F.col("id").alias("k"))
    ska = kmv_sketch(a, "k", ["g"], k=64).select("hv")
    skb = kmv_sketch(b, "k", ["g"], k=64).select("hv")
    row = kmv_intersect_estimate(ska, skb, k=64).collect()[0]
    assert row["m"] == 50 and row["c"] == 10
    assert row["intersect_est"] == 10.0 and row["union_est"] == 50.0


def test_holt_recovers_planted_linear_trend(spark):
    """On an exactly linear daily series y_t = 10 + 3t the recurrence is
    exact: level == last value, trend == slope, forecast == the true
    extrapolation — closed-form anchor for the fold."""
    import datetime

    from pyspark.sql import functions as F

    from usearch_spark.operators.forecast import holt_forecast

    rows = []
    d0 = datetime.date(2024, 1, 1)
    for t in range(12):
        # (10 + 3t) events on day t
        rows += [("a", d0 + datetime.timedelta(days=t))] * (10 + 3 * t)
    df = spark.createDataFrame(rows, "g string, d date")
    out = holt_forecast(df, ["g"], F.col("d"), horizon=7).collect()[0]
    assert out["n_days"] == 12
    assert out["level"] == 10.0 + 3 * 11
    assert out["trend"] == 3.0
    assert out["forecast"] == 43.0 + 7 * 3.0


def test_holt_winters_periodic_fixpoint_and_python_replay(spark):
    """Two anchors for the triple-smoothing fold: (1) on an exactly
    7-periodic zero-trend series the recurrence is a fixpoint — level
    stays at the seasonal mean, trend at 0, and the m-ahead forecast
    reproduces the season; (2) an irregular integer series must match a
    pure-Python replay of the identical IEEE chain bit-for-bit."""
    import datetime

    from pyspark.sql import functions as F

    from usearch_spark.operators.forecast import holt_winters_forecast

    pattern = [4, 8, 6, 10, 2, 12, 7]  # mean 49/7 = 7 exactly
    irregular = [9, 3, 14, 7, 7, 11, 2, 10, 4, 13, 8, 6, 12, 3, 9, 9, 15, 1]
    rows = []
    d0 = datetime.date(2024, 1, 1)
    for t in range(21):
        rows += [("per", d0 + datetime.timedelta(days=t))] * pattern[t % 7]
    for t, y in enumerate(irregular):
        rows += [("irr", d0 + datetime.timedelta(days=t))] * y
    df = spark.createDataFrame(rows, "g string, d date")
    out = {
        r["g"]: r
        for r in holt_winters_forecast(df, ["g"], F.col("d"), m=7).collect()
    }
    per = out["per"]
    assert per["n_days"] == 21
    assert per["level"] == 7.0 and per["trend"] == 0.0
    assert per["season_last"] == 0.0  # day 20 is pattern[6] == the mean
    assert per["forecast"] == 7.0

    # pure-Python replay of the same chain (Python floats are IEEE doubles)
    vals = [float(v) for v in irregular]
    l = sum(vals[:7], 0.0) / 7.0
    b = sum((vals[7 + i] - vals[i] for i in range(7)), 0.0) / 7.0 / 7.0
    seas = [x - l for x in vals[:7]]
    for y in vals[7:]:
        s_old = seas.pop(0)
        lv = 0.5 * (y - s_old) + 0.5 * (l + b)
        bv = 0.25 * (0.5 * (y - s_old) + 0.5 * (l + b) - l) + 0.75 * b
        sv = 0.25 * (y - l - b) + 0.75 * s_old
        seas.append(sv)
        l, b = lv, bv
    irr = out["irr"]
    assert irr["n_days"] == 18
    assert irr["level"] == l and irr["trend"] == b
    assert irr["season_last"] == seas[-1]
    assert irr["forecast"] == l + 7.0 * b + seas[-1]


def test_cusum_detects_planted_level_shift(spark):
    """Closed-form CUSUM anchors: a 5/day -> 15/day shift halfway
    through 20 days has mean 10, stays pinned at 0 through the low
    half, then climbs +5/day to peak 50 on the last day; a constant
    series never deviates -> max 0 and a NULL change day."""
    import datetime

    from pyspark.sql import functions as F

    from usearch_spark.operators.forecast import cusum_changepoints

    rows = []
    d0 = datetime.date(2024, 3, 1)
    for t in range(20):
        rows += [("shift", d0 + datetime.timedelta(days=t))] * (5 if t < 10 else 15)
        rows += [("flat", d0 + datetime.timedelta(days=t))] * 7
    df = spark.createDataFrame(rows, "g string, d date")
    out = {r["g"]: r for r in cusum_changepoints(df, ["g"], F.col("d")).collect()}
    s = out["shift"]
    assert s["n_days"] == 20 and s["mean_daily"] == 10.0
    assert s["cusum_max"] == 50.0
    assert s["change_day"] == "2024-03-20"
    f = out["flat"]
    assert f["cusum_max"] == 0.0 and f["change_day"] is None


def test_holt_backtest_linear_series_and_python_replay(spark):
    """Two anchors for the rolling-origin backtest: (1) on an exactly
    linear series every Holt refit is exact, so mae_model == 0 and
    mase == 0 while the seasonal-naive error is exactly 7*slope;
    (2) an irregular integer series matches a pure-Python replay of the
    identical IEEE chain; (3) groups shorter than n_origins + m days
    are excluded."""
    import datetime

    from pyspark.sql import functions as F

    from usearch_spark.operators.forecast import holt_backtest

    irregular = [9, 3, 14, 7, 7, 11, 2, 10, 4, 13, 8, 6, 12, 3, 9, 9, 15, 1]
    rows = []
    d0 = datetime.date(2024, 1, 1)
    for t in range(16):
        rows += [("lin", d0 + datetime.timedelta(days=t))] * (10 + 3 * t)
    for t, y in enumerate(irregular):
        rows += [("irr", d0 + datetime.timedelta(days=t))] * y
    for t in range(10):  # too short: < 7 + 7 days
        rows += [("short", d0 + datetime.timedelta(days=t))] * 5
    df = spark.createDataFrame(rows, "g string, d date")
    out = {
        r["g"]: r
        for r in holt_backtest(
            df, ["g"], F.col("d"), n_origins=7, m=7
        ).collect()
    }
    assert "short" not in out
    lin = out["lin"]
    assert lin["n_days"] == 16 and lin["n_origins"] == 7
    assert lin["mae_model"] == 0.0
    assert lin["mae_naive"] == 21.0  # |y_t - y_{t-7}| == 7 * slope
    assert lin["mase"] == 0.0

    def fold(vals):
        l, b = vals[1], vals[1] - vals[0]
        for y in vals[2:]:
            l2 = 0.5 * y + 0.5 * (l + b)
            b2 = 0.25 * (0.5 * y + 0.5 * (l + b) - l) + 0.75 * b
            l, b = l2, b2
        return l, b

    vals = [float(y) for y in irregular]
    T, H, m = len(vals), 7, 7
    es, vs = 0.0, 0.0
    for h in range(1, H + 1):
        o = T - (H + 1 - h)  # train on vals[:o], predict vals[o]
        l, b = fold(vals[:o])
        es = es + abs(l + b - vals[o])
        vs = vs + abs(vals[o] - vals[o - m])
    import pytest as _pt

    irr = out["irr"]
    # raw doubles out: the Python replay IS the identical IEEE chain
    assert irr["mae_model"] == _pt.approx(es / 7.0, abs=1e-12)
    assert irr["mae_naive"] == _pt.approx(vs / 7.0, abs=1e-12)
    assert irr["mase"] == _pt.approx((es / 7.0) / (vs / 7.0), abs=1e-12)


def test_decompose_daily_recovers_planted_trend_and_season(spark):
    """On y_t = 20 + t + pattern[t mod 7] with a zero-sum weekly
    pattern, the centered MA(7) cancels the season exactly, so interior
    days report trend == 20 + t, seasonal == pattern[weekday], and
    remainder == 0 — all exact; edge days report NULL trend."""
    import datetime

    from pyspark.sql import functions as F

    from usearch_spark.operators.forecast import decompose_daily

    pattern = [3, -1, 2, -4, 0, 1, -1]  # sums to 0
    d0 = datetime.date(2024, 1, 1)  # a Monday -> epoch-weekday 0
    rows = []
    for t in range(21):
        y = 20 + t + pattern[t % 7]
        rows += [("a", d0 + datetime.timedelta(days=t))] * y
    df = spark.createDataFrame(rows, "g string, d date")
    out = {
        r["day"]: r
        for r in decompose_daily(df, ["g"], F.col("d"), m=7).collect()
    }
    assert len(out) == 21
    for t in range(21):
        day = (d0 + datetime.timedelta(days=t)).isoformat()
        r = out[day]
        assert r["n"] == 20 + t + pattern[t % 7]
        if 3 <= t <= 17:  # interior: full MA window
            assert r["trend"] == 20.0 + t
            assert r["seasonal"] == float(pattern[t % 7])
            assert r["remainder"] == 0.0
        else:
            assert r["trend"] is None and r["remainder"] is None


def test_sax_symbols_planted_shape(spark):
    """A constructed 12-day series with segment totals in a known order
    (w=4 segments of 3 days, alphabet=2) must produce the planted word,
    ties resolving to the earlier segment; groups shorter than w are
    excluded."""
    import datetime

    from pyspark.sql import functions as F

    from usearch_spark.operators.forecast import sax_symbols

    # segment totals: s0=6, s1=30, s2=6, s3=60 -> ranks 1,3,2,4 with the
    # s0/s2 tie resolving to s0 -> letters (alphabet=2, w=4):
    # rank-1 of each: 0,2,1,3 -> idx (r*2)//4: 0,1,0,1 -> "abab"
    seg_days = [[1, 2, 3], [10, 10, 10], [2, 2, 2], [20, 20, 20]]
    d0 = datetime.date(2024, 3, 1)
    rows = []
    t = 0
    for seg in seg_days:
        for y in seg:
            rows += [("a", d0 + datetime.timedelta(days=t))] * y
            t += 1
    rows += [("short", d0)] * 3  # 1 day < w
    df = spark.createDataFrame(rows, "g string, d date")
    out = {r["g"]: r for r in sax_symbols(df, ["g"], F.col("d"), w=4, alphabet=2).collect()}
    assert "short" not in out
    assert out["a"]["n_days"] == 12 and out["a"]["n_segments"] == 4
    assert out["a"]["sax"] == "abab"


def test_daily_acf_planted_period_and_python_replay(spark):
    """A strictly 2-periodic series has acf(2k) == 1-ish positive peaks
    and acf at odd lags negative; an irregular series matches the exact
    integer-arithmetic Python replay bit-for-bit; constant series
    report NULL (zero denominator); short groups are excluded."""
    import datetime

    from pyspark.sql import functions as F

    from usearch_spark.operators.forecast import daily_acf

    alt = [3, 9] * 7  # period 2, T=14
    irr = [9, 3, 14, 7, 7, 11, 2, 10, 4, 13, 8, 6]
    d0 = datetime.date(2024, 1, 1)
    rows = []
    for name, series in [("alt", alt), ("irr", irr)]:
        for t, y in enumerate(series):
            rows += [(name, d0 + datetime.timedelta(days=t))] * y
    for t in range(10):
        rows += [("const", d0 + datetime.timedelta(days=t))] * 5
    for t in range(4):  # too short for max_lag=7
        rows += [("short", d0 + datetime.timedelta(days=t))] * 2
    df = spark.createDataFrame(rows, "g string, d date")
    out = {}
    for r in daily_acf(df, ["g"], F.col("d"), max_lag=7).collect():
        out.setdefault(r["g"], {})[r["lag"]] = r["acf"]
    assert "short" not in out
    assert all(v is None for v in out["const"].values())
    # perfect +-c alternation under the biased estimator: even lags
    # score exactly (T-k)/T, odd lags exactly -(T-k)/T
    assert out["alt"][2] == 12 / 14 and out["alt"][4] == 10 / 14
    assert out["alt"][1] == -13 / 14 and out["alt"][3] == -11 / 14

    def acf(series, k):
        T = len(series)
        S = sum(series)
        c = [T * y - S for y in series]
        den = sum(x * x for x in c)
        num = sum(c[i] * c[i + k] for i in range(T - k))
        return num / den

    for k in range(1, 8):
        assert out["irr"][k] == acf(irr, k)


def test_stl_anomalies_planted_spike_and_explicit_median(spark):
    """A single planted spike on an otherwise exact trend+season series
    is the ONLY flagged day, and the reported MAD matches the explicit
    two-rank median of |remainder| computed in Python."""
    import datetime

    from pyspark.sql import functions as F

    from usearch_spark.operators.forecast import decompose_daily, stl_anomalies

    pattern = [3, -1, 2, -4, 0, 1, -1]  # sums to 0
    d0 = datetime.date(2024, 1, 1)
    rows = []
    for t in range(21):
        y = 20 + t + pattern[t % 7] + (60 if t == 10 else 0)  # spike at t=10
        rows += [("a", d0 + datetime.timedelta(days=t))] * y
    df = spark.createDataFrame(rows, "g string, d date")
    dec = decompose_daily(df, ["g"], F.col("d"), m=7)
    out = {r["day"]: r for r in stl_anomalies(dec, ["g"], c=3.0).collect()}
    # only interior days (full MA window) carry a remainder
    assert len(out) == 15
    rems = sorted(abs(r["remainder"]) for r in out.values())
    t = len(rems)
    want_mad = (rems[(t + 1) // 2 - 1] + rems[(t + 2) // 2 - 1]) / 2.0
    for day, r in out.items():
        assert r["mad"] == want_mad
        assert r["is_anomaly"] == (abs(r["remainder"]) > 3.0 * want_mad)
    flagged = [d for d, r in out.items() if r["is_anomaly"]]
    assert (d0 + datetime.timedelta(days=10)).isoformat() in flagged
    # the spike leaks into neighbours' MA windows; the spike day dominates
    spike_day = (d0 + datetime.timedelta(days=10)).isoformat()
    assert abs(out[spike_day]["remainder"]) == max(rems)


def test_stl_anomalies_even_count_median_is_two_rank_average(spark):
    """With an even number of remainder-carrying days the MAD is the
    average of the two middle |remainder| values — the explicit
    (lo+hi)/2 contract, not an engine median interpolation."""
    import datetime

    from pyspark.sql import functions as F

    from usearch_spark.operators.forecast import decompose_daily, stl_anomalies

    d0 = datetime.date(2024, 1, 1)
    rows = []
    # 20 days of a noisy-ish deterministic series -> 14 interior days... use
    # 19 days -> 13 interior; add one more for an even 14
    for t in range(20):
        y = 30 + ((t * 7) % 5) + (t % 3)
        rows += [("a", d0 + datetime.timedelta(days=t))] * y
    df = spark.createDataFrame(rows, "g string, d date")
    dec = decompose_daily(df, ["g"], F.col("d"), m=7)
    out = stl_anomalies(dec, ["g"], c=3.0).collect()
    assert len(out) == 14  # even
    rems = sorted(abs(r["remainder"]) for r in out)
    want = (rems[6] + rems[7]) / 2.0
    assert all(r["mad"] == want for r in out)


def test_mann_kendall_planted_trends(spark):
    """Strictly increasing series -> S = T(T-1)/2, tau_a = 1, Sen slope =
    the planted slope; strictly decreasing mirrors; a flat series -> S=0,
    slope 0; a gappy series weights slopes by actual day distance."""
    import datetime

    from pyspark.sql import functions as F

    from usearch_spark.operators.forecast import mann_kendall_trend

    d0 = datetime.date(2024, 3, 1)
    rows = []
    for t in range(10):
        rows += [("up", d0 + datetime.timedelta(days=t))] * (5 + 3 * t)
        rows += [("down", d0 + datetime.timedelta(days=t))] * (50 - 4 * t)
        rows += [("flat", d0 + datetime.timedelta(days=t))] * 7
    # gappy: counts 10 on day 0, 16 on day 3 -> single pair, slope 2.0
    rows += [("gap", d0)] * 10 + [("gap", d0 + datetime.timedelta(days=3))] * 16
    df = spark.createDataFrame(rows, "g string, d date")
    got = {
        r["g"]: r
        for r in mann_kendall_trend(df, ["g"], F.col("d")).collect()
    }
    assert got["up"]["s_stat"] == 45 and got["up"]["tau_a"] == 1.0
    assert got["up"]["sen_slope"] == 3.0
    assert got["down"]["s_stat"] == -45 and got["down"]["tau_a"] == -1.0
    assert got["down"]["sen_slope"] == -4.0
    assert got["flat"]["s_stat"] == 0 and got["flat"]["sen_slope"] == 0.0
    assert got["gap"]["n_days"] == 2 and got["gap"]["sen_slope"] == 2.0


def test_mann_kendall_median_of_pairwise_slopes(spark):
    """On a small irregular series the Sen slope equals the Python
    median of all pairwise slopes (two-rank average)."""
    import datetime

    from pyspark.sql import functions as F

    from usearch_spark.operators.forecast import mann_kendall_trend

    d0 = datetime.date(2024, 3, 1)
    counts = [4, 9, 2, 15, 11]
    rows = []
    for t, c in enumerate(counts):
        rows += [("g", d0 + datetime.timedelta(days=t))] * c
    df = spark.createDataFrame(rows, "g string, d date")
    r = mann_kendall_trend(df, ["g"], F.col("d")).collect()[0]
    slopes = sorted(
        (counts[j] - counts[i]) / (j - i)
        for i in range(len(counts))
        for j in range(i + 1, len(counts))
    )
    p = len(slopes)
    want = (slopes[(p + 1) // 2 - 1] + slopes[(p + 2) // 2 - 1]) / 2.0
    assert r["sen_slope"] == want
    s = sum(
        (1 if counts[j] > counts[i] else -1 if counts[j] < counts[i] else 0)
        for i in range(len(counts))
        for j in range(i + 1, len(counts))
    )
    assert r["s_stat"] == s


def test_ams_f2_estimator_accuracy_and_mergeability(spark):
    """The AMS median-of-means lands within the ~1/sqrt(b) regime of the
    exact F2 on a uniform stream, and the counters are ADDITIVE: the
    sketch of a union equals the sum of per-part counters (computed here
    by splitting the stream and checking the combined estimate equals
    the whole-stream estimate — sign sums commute with union)."""
    import random

    from usearch_spark.operators.sketch import ams_f2

    random.seed(11)
    rows = [("g", random.randint(0, 199)) for _ in range(30000)]
    df = spark.createDataFrame(rows, "g string, k long")
    r = ams_f2(df, "k", ["g"], r=45, b=9).collect()[0]
    assert r["n_rows"] == 30000
    exact = r["f2_exact"]
    assert abs(r["f2_est"] - exact) / exact < 0.7  # median-of-5-means regime
    # union additivity: estimates from any row order/split are identical
    # because every counter is a commutative integer sum
    df_shuffled = spark.createDataFrame(list(reversed(rows)), "g string, k long")
    r2 = ams_f2(df_shuffled, "k", ["g"], r=45, b=9).collect()[0]
    assert r2["f2_est"] == r["f2_est"] and r2["f2_exact"] == exact


def test_ams_f2_exact_on_known_frequencies(spark):
    """f2_exact is the literal sum of squared frequencies."""
    from usearch_spark.operators.sketch import ams_f2

    rows = [("g", "a")] * 3 + [("g", "b")] * 2 + [("g", "c")]
    df = spark.createDataFrame(rows, "g string, k string")
    r = ams_f2(df, "k", ["g"], r=9, b=3).collect()[0]
    assert r["f2_exact"] == 9 + 4 + 1


def test_kaplan_meier_textbook_curve(spark):
    """The estimator reproduces the hand-computed product-limit curve,
    honors the deaths-before-censorings convention (a subject censored
    AT an event time counts at risk there), and zero-event times leave
    the curve untouched."""
    from usearch_spark.operators.forecast import kaplan_meier

    rows = (
        [("g", 2, 1), ("g", 2, 1), ("g", 3, 0), ("g", 5, 1), ("g", 5, 0),
         ("g", 8, 1)] + [("g", 10, 0)] * 4
    )
    df = spark.createDataFrame(rows, "g string, dur int, evt int")
    out = {r["duration"]: r for r in kaplan_meier(df, ["g"]).collect()}
    assert sorted(out) == [2, 5, 8]  # censor-only times emit no row
    assert (out[2]["n_risk"], out[2]["n_events"]) == (10, 2)
    assert out[2]["survival"] == 0.8
    assert (out[5]["n_risk"], out[5]["n_censored"]) == (7, 1)
    assert out[5]["survival"] == 0.8 * (6.0 / 7.0)
    assert (out[8]["n_risk"],) == (5,)
    assert out[8]["survival"] == (0.8 * (6.0 / 7.0)) * (4.0 / 5.0)


def test_kaplan_meier_no_censoring_matches_empirical(spark):
    """With no censoring, S(t) is the empirical survivor function."""
    from usearch_spark.operators.forecast import kaplan_meier

    durs = [1, 1, 2, 3, 3, 3, 4, 7]
    df = spark.createDataFrame([("g", d, 1) for d in durs], "g string, dur int, evt int")
    out = {r["duration"]: r["survival"] for r in kaplan_meier(df, ["g"]).collect()}
    import pytest

    n = len(durs)
    for t, surv in out.items():
        alive = sum(1 for d in durs if d > t)
        assert surv == pytest.approx(alive / n, rel=1e-12)


def test_seasonal_strength_pure_signals(spark):
    """A pure trend+season series (zero remainder) scores F_T = F_S = 1;
    pure noise around a constant scores ~0 on both (clamped at 0)."""
    import datetime

    from pyspark.sql import functions as F

    from usearch_spark.operators.forecast import (
        decompose_daily,
        seasonal_strength,
    )

    pattern = [3, -1, 2, -4, 0, 1, -1]  # zero-sum weekly pattern
    d0 = datetime.date(2024, 1, 1)  # Monday
    rows = []
    for t in range(28):
        clean = 20 + t + pattern[t % 7]
        rows += [("clean", d0 + datetime.timedelta(days=t))] * clean
        # deterministic 'noise': no trend, no week structure (period 5)
        rows += [("noise", d0 + datetime.timedelta(days=t))] * (30 + (t * 7) % 5)
    df = spark.createDataFrame(rows, "g string, d date")
    dec = decompose_daily(df, ["g"], F.col("d"), m=7)
    got = {r["g"]: r for r in seasonal_strength(dec, ["g"]).collect()}
    assert got["clean"]["f_trend"] == 1.0 and got["clean"]["f_season"] == 1.0
    assert got["noise"]["f_trend"] < 0.6
    assert got["noise"]["f_season"] < 0.6
    assert got["clean"]["n_days"] == 22  # 28 - 2*3 edge days


def _naive_pettitt(xs):
    """Direct O(T^3) Pettitt: U_t and the first argmax of |U_t|."""
    T = len(xs)
    sgn = lambda a: (a > 0) - (a < 0)  # noqa: E731
    us = [
        sum(sgn(xs[j] - xs[i]) for i in range(t + 1) for j in range(t + 1, T))
        for t in range(T - 1)
    ]
    k = max(abs(u) for u in us)
    ts = next(i for i, u in enumerate(us) if abs(u) == k) + 1
    return us, k, ts


def test_pettitt_matches_naive_and_locates_planted_shift(spark):
    """The O(T^2) recurrence equals the direct O(T^3) definition; a
    planted level shift is located at its true boundary with the exact
    segment means; a flat series gives K = 0 with first-tie argmax."""
    import datetime

    from pyspark.sql import functions as F

    from usearch_spark.operators.forecast import pettitt_changepoint

    d0 = datetime.date(2024, 3, 1)
    series = {
        # level shift after day 5 (index 5 -> cp at t=5, day 2024-03-05)
        "shift": [10, 11, 10, 12, 11, 30, 31, 29, 30, 32],
        # noisy, no clean shift — the naive-equality workout
        "noisy": [7, 3, 9, 1, 14, 2, 8, 8, 5, 11, 4, 13],
        "flat": [5, 5, 5, 5, 5, 5],
    }
    rows = []
    for g, xs in series.items():
        for t, n in enumerate(xs):
            rows += [(g, d0 + datetime.timedelta(days=t))] * n
    df = spark.createDataFrame(rows, "g string, d date")
    got = {
        r["g"]: r
        for r in pettitt_changepoint(df, ["g"], F.col("d")).collect()
    }
    for g, xs in series.items():
        us, k, ts = _naive_pettitt(xs)
        r = got[g]
        assert r["k_stat"] == k, g
        assert r["u_star"] == us[ts - 1], g
        exp_day = (d0 + datetime.timedelta(days=ts - 1)).isoformat()
        assert r["cp_day"] == exp_day, g
        assert r["mean_before"] == sum(xs[:ts]) / ts
        assert r["mean_after"] == sum(xs[ts:]) / (len(xs) - ts)
    assert got["shift"]["cp_day"] == "2024-03-05"
    assert got["shift"]["k_stat"] == 25  # 5*5 pairs all +1
    assert got["flat"]["k_stat"] == 0 and got["flat"]["cp_day"] == "2024-03-01"


def test_croston_matches_python_replay_and_anchors(spark):
    """The fold equals a Python replay of the textbook recurrence; a
    perfectly regular series forecasts q/gap exactly; single-demand
    groups are dropped."""
    import datetime

    from usearch_spark.operators.forecast import croston_forecast

    d0 = datetime.date(2024, 1, 1)
    series = {
        # every 4 days, constant size 8 -> z=8, p=4, rate = 2.0
        "reg": [(0, 8), (4, 8), (8, 8), (12, 8), (16, 8)],
        # irregular sizes and gaps
        "irr": [(0, 5), (3, 12), (4, 2), (10, 30), (25, 1), (26, 7)],
        "single": [(2, 9)],
    }
    rows = []
    for g, pts in series.items():
        for off, q in pts:
            rows.append((g, d0 + datetime.timedelta(days=off), q))
    df = spark.createDataFrame(rows, "g string, d date, q long")
    got = {
        r["g"]: r
        for r in croston_forecast(df, ["g"], alpha=0.125).collect()
    }
    assert "single" not in got
    assert got["reg"]["level_z"] == 8.0 and got["reg"]["interval_p"] == 4.0
    assert got["reg"]["forecast_per_day"] == 2.0
    assert got["reg"]["sba_per_day"] == 0.9375 * 2.0

    def replay(pts, a=0.125):
        z, p = float(pts[0][1]), float(pts[1][0] - pts[0][0])
        prev = pts[0][0]
        for off, q in pts[1:]:
            z = a * q + (1 - a) * z
            p = a * (off - prev) + (1 - a) * p
            prev = off
        return z, p

    z, p = replay(series["irr"])
    r = got["irr"]
    assert r["level_z"] == z and r["interval_p"] == p
    assert r["forecast_per_day"] == z / p
    assert r["n_demand_days"] == 6


def test_ams_from_cells_equals_row_path(spark):
    """Count-linearity: ams_f2_from_cells over (key, cnt) cells equals
    ams_f2 over the expanded rows bit-for-bit, and the exact F2 rides
    in the same aggregate."""
    from usearch_spark.operators.sketch import ams_f2, ams_f2_from_cells

    cells = [("g", k % 7, 1 + k % 3) for k in range(40)]
    rows = [(g, k) for g, k, c in cells for _ in range(c)]
    # cells with the SAME key repeat (k%7 collides) -> pre-collapse first
    from pyspark.sql import functions as F

    cdf = (
        spark.createDataFrame(cells, "g string, k long, c long")
        .groupBy("g", "k")
        .agg(F.sum("c").alias("c"))
    )
    rdf = spark.createDataFrame(rows, "g string, k long")
    a = ams_f2(rdf, "k", ["g"], r=9, b=3).collect()[0]
    b = ams_f2_from_cells(cdf, "k", ["g"], cnt_col="c", r=9, b=3).collect()[0]
    assert (a["n_rows"], a["f2_exact"], a["f2_est"]) == (
        b["n_rows"], b["f2_exact"], b["f2_est"],
    )
    # exact F2 sanity: sum of squared key frequencies
    from collections import Counter

    freq = Counter(k for _, k in rows)
    assert a["f2_exact"] == sum(v * v for v in freq.values())


def test_runs_test_matches_textbook(spark):
    """Run/side counts and z equal the textbook statistic on a mixed
    series; a perfectly alternating series has the max run count; a
    one-sided series (all kept days above... impossible by median) and
    tie-heavy days exercise the drop rule."""
    import datetime

    import pytest

    from usearch_spark.operators.forecast import runs_test

    d0 = datetime.date(2024, 5, 1)
    series = {
        "mix": [3, 9, 8, 2, 7, 1, 6, 5, 9, 2, 8, 3],
        "alt": [1, 9, 1, 9, 1, 9, 1, 9],
        "ties": [5, 5, 9, 1, 5, 9, 1, 5],  # median 5 -> ties dropped
    }
    rows = []
    for g, xs in series.items():
        for t, n in enumerate(xs):
            rows += [(g, d0 + datetime.timedelta(days=t))] * n
    df = spark.createDataFrame(rows, "g string, d date")
    got = {r["g"]: r for r in runs_test(df, ["g"], F.col("d")).collect()}

    def naive(xs):
        sv = sorted(xs)
        t = len(xs)
        med = (sv[(t + 1) // 2 - 1] + sv[(t + 2) // 2 - 1]) / 2
        sg = [1 if x > med else 0 for x in xs if x != med]
        m, n1 = len(sg), sum(sg)
        r = 1 + sum(1 for i in range(1, m) if sg[i] != sg[i - 1])
        a = 2 * n1 * (m - n1)
        z = None
        if a > m:
            z = (m * (r - 1) - a) * (m - 1) ** 0.5 / (a * (a - m)) ** 0.5
        return m, n1, r, z

    for g, xs in series.items():
        m, n1, r, z = naive(xs)
        row = got[g]
        assert (row["n_kept"], row["n_above"], row["n_runs"]) == (m, n1, r), g
        if z is None:
            assert row["z"] is None
        else:
            assert row["z"] == pytest.approx(z, abs=1e-12)
    assert got["alt"]["n_runs"] == 8  # perfect alternation


def test_events_concurrency_hand_sweep(spark):
    """The +1/-1 cell sweep equals a brute-force per-second count on a
    tiny stream, including the earliest-second tie-break."""
    from pyspark.sql import functions as F

    # fake the _events frame shape: (event_type, ts_ns)
    secs = {"a": [0, 10, 10, 250, 600, 620], "b": [5, 1000]}
    rows = [(g, s * 1_000_000_000) for g, ss in secs.items() for s in ss]
    ev = spark.createDataFrame(rows, "event_type string, ts_ns long")
    base = ev.select("event_type", F.expr("ts_ns div 1000000000").alias("sec"))
    sc = base.groupBy("event_type", "sec").agg(F.count(F.lit(1)).alias("c"))
    cells = (
        sc.select("event_type", "sec", F.col("c").alias("delta"))
        .unionAll(
            sc.select(
                "event_type",
                (F.col("sec") + F.lit(300)).alias("sec"),
                (-F.col("c")).alias("delta"),
            )
        )
        .groupBy("event_type", "sec")
        .agg(F.sum("delta").alias("delta"))
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("event_type")
        .orderBy("sec")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = cells.withColumn("cum", F.sum("delta").over(w))
    pk = {
        r["event_type"]: r
        for r in run.groupBy("event_type")
        .agg(F.max(F.struct(F.col("cum"), (-F.col("sec")).alias("ns"))).alias("pk"))
        .select("event_type", "pk.cum", "pk.ns")
        .collect()
    }

    def brute(ss, w=300):
        best = (0, None)
        for t in sorted(set(ss)):
            c = sum(1 for s in ss if s <= t < s + w)
            if c > best[0]:
                best = (c, t)
        return best

    for g, ss in secs.items():
        c, t = brute(ss)
        assert pk[g]["cum"] == c, g
        assert -pk[g]["ns"] == t, g


def test_abc_classification_hand_count(spark):
    """The integer cross-multiplied class cuts reproduce the textbook
    80/95 cumulative-share split, including the boundary row landing in
    A exactly at 80%."""
    from pyspark.sql import Window, functions as F

    # one brand, revenues 50, 30, 15, 4, 1 (total 100):
    # cum shares 50, 80, 95, 99, 100 -> A, A (exactly 80), B (exactly 95),
    # C, C
    rows = [("B1", i, r) for i, r in enumerate([50, 30, 15, 4, 1])]
    rev = spark.createDataFrame(rows, "p_brand string, p_partkey long, rev long")
    w = Window.partitionBy("p_brand").orderBy(F.col("rev").desc(), "p_partkey")
    wt = Window.partitionBy("p_brand")
    c = rev.withColumn(
        "cum",
        F.sum("rev").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    ).withColumn("total", F.sum("rev").over(wt))
    classed = c.withColumn(
        "abc_class",
        F.when(F.lit(5) * F.col("cum") <= F.lit(4) * F.col("total"), F.lit("A"))
        .when(F.lit(20) * F.col("cum") <= F.lit(19) * F.col("total"), F.lit("B"))
        .otherwise(F.lit("C")),
    )
    got = {r["p_partkey"]: r["abc_class"] for r in classed.collect()}
    assert got == {0: "A", 1: "A", 2: "B", 3: "C", 4: "C"}


def test_esd_outliers_masking_resistance(spark):
    """A giant spike masks a second spike from a single-pass z-filter;
    ESD removes it and still finds the second one in round 2, with
    scores matching a Python replay of the exact recurrence."""
    import datetime

    import pytest
    from pyspark.sql import functions as F

    from usearch_spark.operators.forecast import esd_outliers

    d0 = datetime.date(2024, 7, 1)
    xs = [10, 11, 10, 9, 10, 200, 10, 11, 9, 10, 40, 10]  # spikes at 5, 10
    rows = []
    for i, n in enumerate(xs):
        rows += [("g", d0 + datetime.timedelta(days=i))] * n
    df = spark.createDataFrame(rows, "g string, d date")
    got = {
        r["esd_rank"]: r
        for r in esd_outliers(df, ["g"], F.col("d"), rounds=3).collect()
    }

    def replay(vals, rounds=3):
        active = list(range(len(vals)))
        out = []
        for _ in range(rounds):
            n = len(active)
            s = sum(vals[i] for i in active)
            q = sum(vals[i] ** 2 for i in active)
            mx, pick = max(
                ((abs(n * vals[i] - s), -i) for i in active),
                key=lambda p: (p[0], p[1]),
            )
            pick = -pick
            var = (n * q - s * s) / (n * (n - 1))
            out.append((pick, vals[pick], mx / (n * var ** 0.5)))
            active.remove(pick)
        return out

    exp = replay(xs)
    for r, (idx, x, sc) in enumerate(exp, 1):
        assert got[r]["day"] == (d0 + datetime.timedelta(days=idx)).isoformat()
        assert got[r]["n_events"] == x
        assert got[r]["esd_score"] == pytest.approx(sc, rel=1e-12)
    assert got[1]["day"] == "2024-07-06" and got[2]["day"] == "2024-07-11"


def test_seasonal_mann_kendall_matches_replay(spark):
    """S, the tie-corrected variance numerator, z and the pooled Sen
    slope equal a Python replay; a pure weekly cycle with no trend gives
    S = 0 while the plain test would see spurious comparisons."""
    import datetime

    import pytest
    from pyspark.sql import functions as F

    from usearch_spark.operators.forecast import seasonal_mann_kendall

    d0 = datetime.date(2024, 1, 1)  # a Monday
    rows = []
    # cycle: weekday-dependent level, NO trend -> within-weekday series
    # constant -> S = 0
    for t in range(28):
        rows += [("cyc", d0 + datetime.timedelta(days=t))] * (5 + (t % 7) * 3)
    # trend: +2/week within every weekday track
    for t in range(28):
        rows += [("up", d0 + datetime.timedelta(days=t))] * (5 + (t // 7) * 2)
    df = spark.createDataFrame(rows, "g string, d date")
    got = {
        r["g"]: r
        for r in seasonal_mann_kendall(
            df, ["g"], F.col("d"), F.dayofweek(F.col("d"))
        ).collect()
    }
    assert got["cyc"]["s_stat"] == 0 and got["cyc"]["z"] is None

    def replay(vals_by_track):
        S = V = 0
        slopes = []
        for track in vals_by_track:
            t = len(track)
            if t < 2:
                continue
            xs = [x for _, x in track]
            S += sum(
                (xs[j] > xs[i]) - (xs[j] < xs[i])
                for i in range(t) for j in range(i + 1, t)
            )
            from collections import Counter

            ties = Counter(xs)
            V += t * (t - 1) * (2 * t + 5) - sum(
                c * (c - 1) * (2 * c + 5) for c in ties.values()
            )
            es = [e for e, _ in track]
            slopes += [
                (xs[j] - xs[i]) / (es[j] - es[i])
                for i in range(t) for j in range(i + 1, t)
            ]
        slopes.sort()
        p = len(slopes)
        med = (slopes[(p + 1) // 2 - 1] + slopes[(p + 2) // 2 - 1]) / 2
        z = S / (V / 18) ** 0.5 if V > 0 else None
        return S, V, z, med

    tracks = {}
    for t in range(28):
        w = (d0 + datetime.timedelta(days=t)).weekday()
        tracks.setdefault(w, []).append(
            ((d0 + datetime.timedelta(days=t) - datetime.date(1970, 1, 1)).days,
             5 + (t // 7) * 2)
        )
    S, V, z, med = replay(list(tracks.values()))
    r = got["up"]
    assert (r["s_stat"], r["var18_num"]) == (S, V)
    assert r["z"] == pytest.approx(z, rel=1e-12)
    assert r["sen_slope"] == med
    assert r["s_stat"] > 0  # the trend is visible within tracks


def test_theil_sen_fit_anchors(spark):
    """A perfectly linear integer series fits exactly (MAE 0, R² 1,
    intercept equal to the true line's); a flat series has slope 0 and
    NULL R² (zero total variance)."""
    import datetime

    from pyspark.sql import functions as F

    from usearch_spark.operators.forecast import theil_sen_fit

    d0 = datetime.date(2024, 2, 1)
    e0 = (d0 - datetime.date(1970, 1, 1)).days
    rows = []
    for t in range(10):
        rows += [("lin", d0 + datetime.timedelta(days=t))] * (20 + 3 * t)
        rows += [("flat", d0 + datetime.timedelta(days=t))] * 6
    df = spark.createDataFrame(rows, "g string, d date")
    got = {
        r["g"]: r for r in theil_sen_fit(df, ["g"], F.col("d")).collect()
    }
    lin = got["lin"]
    assert lin["sen_slope"] == 3.0
    assert lin["intercept"] == 20 - 3.0 * e0
    assert lin["mae"] == 0.0 and lin["r2"] == 1.0
    flat = got["flat"]
    assert flat["sen_slope"] == 0.0 and flat["mae"] == 0.0
    assert flat["r2"] is None


def test_ushape_attribution_credit_conservation(spark):
    """Every attributed purchase distributes exactly 10000 bp across the
    roles: replayed on a constructed journey set with k = 1, 2, 3 and 5
    paths, per-channel credits match the hand split and the grand total
    is 10000 x n_attributed."""
    from pyspark.sql import Window, functions as F

    # journeys (purchase -> ordered touch channels):
    js = {
        1: ["click"],                                     # single: 10000
        2: ["view", "click"],                             # pair: 5000/5000
        3: ["click", "view", "signup"],                   # 4000/2000/4000
        4: ["view", "click", "click", "signup", "view"],  # 4000/666.6x3/4000
    }
    rows = []
    for pid, chans in js.items():
        for i, c in enumerate(chans):
            rows.append((pid, i + 1, c))
    j = spark.createDataFrame(rows, "pid long, tid long, channel string")
    w = Window.partitionBy("pid").orderBy("tid")
    wk = Window.partitionBy("pid")
    r = (
        j.withColumn("rn", F.row_number().over(w))
        .withColumn("k", F.count(F.lit(1)).over(wk))
        .withColumn(
            "role",
            F.when(F.col("k") == 1, F.lit("single"))
            .when(F.col("k") == 2, F.lit("pair"))
            .when(F.col("rn") == 1, F.lit("first"))
            .when(F.col("rn") == F.col("k"), F.lit("last"))
            .otherwise(F.lit("middle")),
        )
    )
    credit = (
        F.when(F.col("role") == "single", F.lit(10000.0))
        .when(F.col("role") == "pair", F.lit(5000.0))
        .when(F.col("role").isin("first", "last"), F.lit(4000.0))
        .otherwise(F.lit(2000.0) / (F.col("k") - 2).cast("double"))
    )
    got = {
        row["channel"]: row["c"]
        for row in r.groupBy("channel").agg(F.sum(credit).alias("c")).collect()
    }
    want = {
        "click": 10000 + 5000 + 4000 + 2000 / 3 * 2,
        "view": 5000 + 2000 + 4000 + 4000,
        "signup": 4000 + 2000 / 3,
    }
    for c, v in want.items():
        assert abs(got[c] - v) < 1e-9, c
    assert abs(sum(got.values()) - 10000 * 4) < 1e-9


def test_exact_percentiles_cell_rank_lookup(spark):
    """The cell-rank lookup equals numpy-style 'lower' percentiles
    (value at rank ceil(n*q/100)) on a small mixed group, including
    duplicate-heavy cells."""
    from pyspark.sql import Window, functions as F

    vals = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5]  # n = 11
    cells = (
        spark.createDataFrame([("g", v) for v in vals], "g string, vc long")
        .groupBy("g", "vc")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = (
        Window.partitionBy("g")
        .orderBy("vc")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = cells.withColumn("cum", F.sum("cnt").over(w))
    n = cells.groupBy("g").agg(F.sum("cnt").alias("n"))
    targets = n.select(
        "g", "n", F.explode(F.array(*[F.lit(q) for q in (1, 50, 75, 99)])).alias("q")
    ).withColumn("rank", F.greatest(F.lit(1), F.expr("(n * q + 99) div 100")))
    got = {
        r["q"]: r["vc"]
        for r in run.join(targets, "g")
        .filter(F.col("cum") >= F.col("rank"))
        .groupBy("q")
        .agg(F.min("vc").alias("vc"))
        .collect()
    }
    s = sorted(vals)
    import math

    for q in (1, 50, 75, 99):
        rank = max(1, math.ceil(len(s) * q / 100))
        assert got[q] == s[rank - 1], q


@pytest.mark.slow
def test_daily_pacf_durbin_levinson_replay(spark):
    """PACF equals a Python Durbin-Levinson replay over the exact-ratio
    ACF values (same operation order), and an AR(1)-like geometric ACF
    yields a PACF that cuts off after lag 1 (|pacf_k| << |pacf_1|)."""
    import datetime

    from pyspark.sql import functions as F

    from usearch_spark.operators.forecast import daily_pacf

    irr = [9, 3, 14, 7, 7, 11, 2, 10, 4, 13, 8, 6]
    d0 = datetime.date(2024, 1, 1)
    rows = []
    for t, y in enumerate(irr):
        rows += [("irr", d0 + datetime.timedelta(days=t))] * y
    df = spark.createDataFrame(rows, "g string, d date")
    got = {
        r["lag"]: r["pacf"]
        for r in daily_pacf(df, ["g"], F.col("d"), max_lag=7).collect()
    }

    def acf(series, k):
        T = len(series)
        S = sum(series)
        c = [T * y - S for y in series]
        den = sum(x * x for x in c)
        return sum(c[i] * c[i + k] for i in range(T - k)) / den

    r = {k: acf(irr, k) for k in range(1, 8)}
    phi = {(1, 1): r[1]}
    for k in range(2, 8):
        num = r[k]
        den = 1.0
        # identical order: j ascending, left-associated sums
        nsum = None
        dsum = None
        for j in range(1, k):
            nt = phi[(k - 1, j)] * r[k - j]
            dt = phi[(k - 1, j)] * r[j]
            nsum = nt if nsum is None else nsum + nt
            dsum = dt if dsum is None else dsum + dt
        phi[(k, k)] = (r[k] - nsum) / (1.0 - dsum)
        for j in range(1, k):
            phi[(k, j)] = phi[(k - 1, j)] - phi[(k, k)] * phi[(k - 1, k - j)]
    for k in range(1, 8):
        assert got[k] == round(phi[(k, k)], 6), (k, got[k], phi[(k, k)])


def test_safety_stock_replay(spark):
    """King-formula replay on known daily demands [10, 14, 12]."""
    import datetime
    import math

    from pyspark.sql import functions as F

    from usearch_spark.operators.forecast import safety_stock

    d0 = datetime.date(2024, 1, 1)
    rows = []
    for t, q in enumerate([10, 14, 12]):
        rows.append(("b", d0 + datetime.timedelta(days=t), q))
    df = spark.createDataFrame(rows, "g string, d date, q long")
    r = safety_stock(df, ["g"], F.col("d"), "q").collect()[0]
    t, s, q2 = 3, 36, 440
    sigma = math.sqrt(t * q2 - s * s) / t
    ss = 1.645 * sigma * math.sqrt(7.0)
    assert (r["n_days"], r["total_qty"]) == (3, 36)
    assert r["mean_daily"] == 12.0
    assert r["sigma_daily"] == round(sigma, 6)
    assert r["safety_stock"] == round(ss, 6)
    assert r["reorder_point"] == round(12.0 * 7.0 + ss, 6)


def test_ljung_box_python_replay_and_null_propagation(spark):
    """Q replays the exact left-associated chain on a hand-built ACF
    frame; a NULL acf lag (constant series) propagates to NULL Q and
    NULL verdict; a strong weekly pattern reads significant."""
    from usearch_spark.operators.forecast import ljung_box

    t = 100
    rs = [0.6, 0.3, 0.1, -0.05, 0.02, 0.01, 0.4]
    rows = [("strong", t, k, r) for k, r in enumerate(rs, 1)]
    rows += [("flat", 50, k, None) for k in range(1, 8)]
    df = spark.createDataFrame(rows, "g string, n_days long, lag long, acf double")
    got = {r["g"]: r for r in ljung_box(df, ["g"], k=7).collect()}

    chain = 0.0
    for j, r in enumerate(rs, 1):
        chain = chain + (r * r) / (float(t) - float(j))
    q = round((float(t) * (float(t) + 2.0)) * chain, 6)
    assert got["strong"]["q_stat"] == q
    assert got["strong"]["significant"] is (q > 14.067140449340169)
    assert got["strong"]["significant"]  # 0.6 autocorrelation at T=100
    assert got["flat"]["q_stat"] is None and got["flat"]["significant"] is None
