"""Distributed time-series processing (T3-T6, A3-A4).

Reference: ``utilities/timeseries/ts_converter.py`` — per-series imputation
(`:117-163`), Measure/Measurement/Trend emission (`:19-98,165-196`),
temporal region (`:198-208`), label templating (`ts_label_maker.py:11-44`).

The reference loops over in-memory arrays; here every operator works on a
LONG-FORMAT series table ``(series_id, idx, label, value_raw)`` so the same
code handles a spreadsheet's 40 series or a lake's 40 million:

  * window functions (partitionBy series, orderBy idx) give forward-fill /
    backfill with no driver-side state — one shuffle keyed on series_id;
  * emission operators are per-row projections / explodes — narrow;
  * linear-fit trends use native regr_slope/regr_intercept aggregates —
    map-side partial aggregation, one shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _w(series_col: str, order_col: str) -> Window:
    return Window.partitionBy(series_col).orderBy(order_col)


def backfill_labels(df: DataFrame, *, series_col: str = "series_id",
                    order_col: str = "idx", label_col: str = "label",
                    out_col: str = "label_filled") -> DataFrame:
    """T3: blank time labels inherit the previous non-blank label
    (`extractSpreadsheet.py:104-120` backfill mode; the reference scans
    backwards cell-by-cell — `last(..., ignorenulls)` is the set-oriented
    equivalent)."""
    w = _w(series_col, order_col).rowsBetween(Window.unboundedPreceding, 0)
    non_blank = F.when(F.trim(F.col(label_col)) != "", F.col(label_col))
    return df.withColumn(
        out_col, F.coalesce(F.last(non_blank, ignorenulls=True).over(w),
                            F.lit("")))


def impute_forward_fill(df: DataFrame, *, series_col: str = "series_id",
                        order_col: str = "idx",
                        value_col: str = "value_raw",
                        threshold: float = 0.8) -> DataFrame:
    """T4 + A4: the reference's three-way imputation rule
    (`ts_converter.py:117-163`):

      * numeric ratio ≥ threshold → coerce numeric strings, fill missing
        from the previous value (leading-edge missing from the next);
      * every value a non-numeric string → keep text as-is;
      * otherwise → stringify the coercible values, keep the rest.

    Adds: ``numeric_ratio`` (A4), ``value_num`` (filled, null unless the
    impute branch), ``value_text`` (null in the impute branch), ``method``
    ∈ {original, imputed_ffill, imputed_bfill, kept_text, stringified}.
    """
    v = F.col(value_col)
    # try_cast, not cast: ANSI mode (Spark 4 default) makes a failed
    # string→double cast an error; the reference's is_number probe treats
    # it as "not numeric" (`ts_converter.py:101-114`).
    vnum = v.try_cast("double")
    is_num = vnum.isNotNull()

    stats = Window.partitionBy(series_col)
    wf = _w(series_col, order_col).rowsBetween(Window.unboundedPreceding, 0)
    wb = _w(series_col, order_col).rowsBetween(0, Window.unboundedFollowing)

    ratio = F.avg(is_num.cast("int")).over(stats)
    n_null = F.sum(v.isNull().cast("int")).over(stats)
    n_num = F.sum(is_num.cast("int")).over(stats)
    ffill = F.last(F.when(is_num, vnum), ignorenulls=True).over(wf)
    bfill = F.first(F.when(is_num, vnum), ignorenulls=True).over(wb)

    impute = ratio >= threshold
    all_text = (n_num == 0) & (n_null == 0)   # total_str == len(ts)
    return (
        df.withColumn("numeric_ratio", ratio)
        .withColumn("value_num",
                    F.when(impute, F.coalesce(ffill, bfill)))
        .withColumn("value_text",
                    F.when(impute, F.lit(None).cast("string"))
                    .when(all_text, v)
                    .otherwise(F.when(is_num, vnum.cast("string"))
                               .otherwise(v)))
        .withColumn("method",
                    F.when(impute & is_num, F.lit("original"))
                    .when(impute & ffill.isNotNull(), F.lit("imputed_ffill"))
                    .when(impute, F.lit("imputed_bfill"))
                    .when(all_text, F.lit("kept_text"))
                    .otherwise(F.lit("stringified")))
    )


def temporal_region(df: DataFrame, *, series_col: str = "series_id",
                    date_col: str = "date") -> DataFrame:
    """A3: per-series min/max of the parsed date → temporal_region bounds
    (`ts_converter.py:198-208`)."""
    return df.groupBy(series_col).agg(
        F.min(date_col).alias("start_date_time"),
        F.max(date_col).alias("end_date_time"))


def emit_measures(df: DataFrame, *, dataset: str,
                  name_col: str = "name",
                  date_col: str = "date") -> DataFrame:
    """T5 Measure docs: one per series, doc_id = sha256('{dataset} {name}')
    (`ts_converter.py:84-96`), with the temporal region attached."""
    return (
        df.groupBy(name_col).agg(
            F.min(date_col).alias("start_date_time"),
            F.max(date_col).alias("end_date_time"),
            F.count(F.lit(1)).alias("n_points"))
        .select(
            F.sha2(F.concat_ws(" ", F.lit(dataset), F.col(name_col)), 256)
            .alias("doc_id"),
            F.col(name_col).alias("name"),
            F.lit("Measure").alias("type"),
            "start_date_time", "end_date_time", "n_points")
    )


def emit_measurements(df: DataFrame, *, series_col: str = "series_id",
                      date_col: str = "date",
                      value_col: str = "value_num") -> DataFrame:
    """T5 Measurement docs: one per point, FK to the series
    (`ts_converter.py:19-52`). doc_id = sha256('date|value|series') — our
    engine's canonical point-id scheme (the reference hashes a Python
    json.dumps rendering, `ts_converter.py:30-33`; divergence documented:
    same uniqueness contract, portable formatting)."""
    return df.select(
        F.sha2(F.concat_ws("|", F.col(date_col),
                           F.col(value_col).cast("string"),
                           F.col(series_col)), 256).alias("doc_id"),
        F.col(date_col).alias("date"),
        F.col(value_col).alias("number"),
        F.col(series_col).alias("timeseries"),
        F.lit("Measurement").alias("type"),
    )


def emit_trends(df: DataFrame, *, series_col: str = "series_id",
                x_col: str = "x", y_col: str = "y") -> DataFrame:
    """T5 Trend docs: per-series least-squares linear fit. The reference
    carries precomputed 'linear fits' from its annotation tooling
    (`ts_converter.py:186-196`); Spark computes them as one map-side-
    combined aggregation of EXACT integer sums, then the closed forms
    per-row — the regr_slope/intercept/r2 aggregates this replaces are
    the covariance family the wobble lint flags: they accumulate
    doubles in engine order, and over integer x / fixed-point y their
    true values are RATIONALS (slope = (nΣxy−ΣxΣy)/(nΣxx−Σx²)) that
    can sit exactly on round-6 half-boundaries. Here x is int64, y
    lifts to exact cents, the five sums are order-independent integers
    (Σy² via decimal(38,0) / HUGEINT — it passes int64 at ~4e18), the
    numerators/denominators stay in 128-bit integer arithmetic, and
    rounding is integer half-away division — no float op before the
    final division by 10⁶. Degenerate series (constant x → Q=0;
    constant y → R=0) yield NULL slope/intercept/r2 rather than an
    engine-specific NaN. Headroom: |P|·10⁴ and 2·P²·10⁶ must fit
    decimal(38)/int128 — good to ~10⁵-point series at 10⁸-cent values."""
    from dig_etl_engine_spark.functions.exact import fixed

    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    yc = fixed(F.col(y_col), 2)
    x = F.col(x_col).cast("long")
    agg = df.groupBy(series_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"), F.sum(yc).alias("sy"),
        F.sum(x * x).alias("sxx"), F.sum(x * yc).alias("sxy"),
        F.sum(dec(yc) * dec(yc)).alias("syy"))
    n, sx, sy, sxx, sxy, syy = (F.col(c) for c in
                                ("n", "sx", "sy", "sxx", "sxy", "syy"))
    P = dec(n) * dec(sxy) - dec(sx) * dec(sy)
    Q = dec(n) * dec(sxx) - dec(sx) * dec(sx)
    P2 = dec(sy) * dec(sxx) - dec(sx) * dec(sxy)
    R = dec(n) * syy - dec(sy) * dec(sy)
    TEN4 = F.lit(10 ** 4).cast("decimal(38,0)")
    TEN6 = F.lit(10 ** 6).cast("decimal(38,0)")

    def r6_cents_ratio(p, q):
        # round-half-away(p / (100·q), 6) in pure integer arithmetic
        pp = p * TEN4
        mag = F.call_function("div", 2 * F.abs(pp) + q, 2 * q)
        return F.when(q > 0,
                      F.when(pp < 0, -mag).otherwise(mag)
                      .cast("double") / F.lit(1e6))

    r2num = P * P * TEN6
    r2den = Q * R
    r2mag = F.call_function("div", 2 * r2num + r2den, 2 * r2den)
    return agg.select(
        series_col,
        r6_cents_ratio(P, Q).alias("slope"),
        r6_cents_ratio(P2, Q).alias("intercept"),
        F.when((Q > 0) & (R > 0),
               r2mag.cast("double") / F.lit(1e6)).alias("r2"),
        n.alias("n_points"),
        F.lit("Trend").alias("type"))


def label_template(parts: list[Column | str]) -> Column:
    """T6: measure-label templating with missing values → ''
    (`ts_label_maker.py:11-44`, PartialFormatter(missing='')). Compose the
    template as literal + column parts; nulls render empty."""
    cols = [F.coalesce(p, F.lit("")) if isinstance(p, Column) else F.lit(p)
            for p in parts]
    return F.concat(*cols)


def ohlc_mean_v_sql(round_digits: int = 4) -> str:
    """The DuckDB oracle expression for :func:`downsample_ohlc`'s
    ``mean_v`` column — exact cents SUM + integer half-away rounding,
    token-for-token the engine-identical twin of the Spark expression
    inside ``downsample_ohlc``. Defined HERE, next to the Spark side it
    must track, and imported by every oracle that replays the rollup
    (``ts_downsample_ohlc``, ``stream_ohlc_rollup``) so the two cannot
    drift apart silently."""
    from dig_etl_engine_spark.functions.exact import (sql_fixed,
                                                      sql_round_fixed)
    return sql_round_fixed(f"SUM({sql_fixed('value', 2)})", 2,
                           round_digits, "COUNT(*)")


def downsample_ohlc(df, *, key_col: str = "user_id", ts_col: str = "ts",
                    val_col: str = "value", id_col: str = "event_id",
                    bucket: str = "day", round_digits: int = 4):
    """Hypertable-style time-bucket rollup (the `time_bucket` +
    first/last aggregate every TSDB exposes): per (key, bucket) the
    OHLC summary — open = value at the earliest timestamp, close = at
    the latest, high/low = max/min — plus count and mean. THE
    downsampling step that turns a raw event stream into a dashboard
    series.

    One map-side-combined groupBy — open/close use `min_by`/`max_by`
    keyed on ``struct(ts, id)`` so timestamp ties break
    deterministically on the event id (the oracle's `arg_min(v, ts)`
    form is identical whenever (key, ts) is unique, which the events
    table guarantees). Bucket emitted as a formatted string (the
    registry's timestamp-projection convention)."""
    from dig_etl_engine_spark.functions.exact import fixed, round_fixed

    b = F.date_format(F.date_trunc(bucket, F.col(ts_col)),
                      "yyyy-MM-dd" if bucket == "day" else
                      "yyyy-MM-dd HH:mm:ss")
    order = F.struct(F.col(ts_col), F.col(id_col))
    r = lambda c: F.round(c, round_digits)  # noqa: E731
    # mean via exact cents SUM + integer half-away rounding (wobble
    # lint): a bucket mean is a small-denominator rational that can sit
    # EXACTLY on a round-half boundary, where a float AVG's cross-engine
    # 1-ulp accumulation wobble flips the digit. open/high/low/close are
    # per-row values — identical bits in any engine — so plain round.
    return (df.groupBy(F.col(key_col), b.alias("bucket"))
            .agg(r(F.min_by(F.col(val_col), order)).alias("open"),
                 r(F.max(val_col)).alias("high"),
                 r(F.min(val_col)).alias("low"),
                 r(F.max_by(F.col(val_col), order)).alias("close"),
                 F.count(F.lit(1)).alias("n"),
                 F.sum(fixed(F.col(val_col), 2)).alias("_s"))
            .withColumn("mean_v",
                        round_fixed(F.col("_s"), 2, round_digits,
                                    F.col("n")))
            .drop("_s"))


def rolling_anomaly(df, *, key_col: str = "user_id", ts_col: str = "ts",
                    val_col: str = "value", window_days: int = 7,
                    z_cut: float = 3.0, z_digits: int = 4):
    """Trailing-window anomaly scoring — the monitoring query every
    metrics pipeline runs: per key, each point scored against the
    baseline of the PRIOR ``window_days`` — every strictly-earlier
    point within exactly ``window_days`` days (current row EXCLUDED —
    leave-one-out: a point inside its own baseline caps its z at
    (n−1)/√n ≈ 2.3 for a week of dailies, so a genuine spike could
    never cross a 3σ cut), flagged when |z| exceeds ``z_cut``.
    Event-TIME range frame at MICROSECOND precision (the native
    timestamp resolution — a whole-second frame would silently include
    sub-second-earlier neighbors the strict-prior contract excludes),
    not row frame: gaps in the series shrink the window instead of
    silently reaching back weeks.

    One window exchange on the key; the range frame slides
    incrementally (no per-row rescan). Empty / 1-point / constant
    baselines yield z NULL → flagged false (coalesce), so cold-start
    points never alert. Returns (key, ts_us, value_cents, roll_n,
    roll_sum_cents, z_e{z_digits}, is_anomaly) — an EXACT-INTEGER
    surface (epoch-micros BIGINT timestamp, fixed-point cents, z
    scaled by 10^``z_digits`` into a BIGINT); a presentation layer
    divides back at the edge. Emitting integers is deliberate:
    it removes every engine-interpreted construct (``date_format`` /
    ``strftime`` rendering, engine ``round()`` of a continuous
    double) from the comparable output, so two engines that agree on
    the arithmetic cannot disagree on the bytes.

    Hash-determinism design (the ``gap_fill_linear`` "engine-identical
    expression tree" pattern): the window aggregates are EXACT integer
    quantities only — the input is fixed-point 2-decimal, so
    ``cents = round(value·100)`` is an exact BIGINT in every engine,
    and windowed SUM(cents), SUM(cents²), COUNT are order-independent
    integer sums that agree to the last bit regardless of how an
    engine's sliding-window accumulator sequences additions. A naive
    ``STDDEV_SAMP OVER`` instead accumulates doubles in an
    engine-chosen order (Welford vs shifted-sum, add vs retract), and
    the 1-ulp wobble flips ``round(z, 4)`` on half-boundaries in SOME
    builds but not others (observed: bitwise-identical locally, one
    flipped digit under the driver's DuckDB build). From the three
    exact integers, mean/var/z derive PER-ROW through one closed-form
    IEEE-754 expression tree written identically in the oracle SQL:
    correctly-rounded ops on bitwise-identical inputs cannot diverge.
    The frame itself is equally engine-proof: BOTH engines order on
    exact int64 epoch-microseconds with an INTEGER range frame
    (``604800000000 PRECEDING AND 1 PRECEDING``) — frame-edge
    membership is pure int64 comparison, with none of the
    INTERVAL-arithmetic machinery whose timestamp frame-edge
    computation has differed across DuckDB builds (the r7 residual
    after the arithmetic was proven bitwise-clean locally). The
    scaled z output is ``floor(z·10^z_digits + 0.5)`` cast to BIGINT —
    the same explicit two-op tree in both engines, no engine
    ``round()`` touching a continuous double anywhere.
    Two bonus exactness wins: the variance numerator ``n·SS − S²``
    stays in integer arithmetic, so constant windows give var = 0.0
    exactly (no catastrophic-cancellation epsilon → phantom huge z),
    and the positivity guard is an INTEGER comparison with no float
    boundary at all. Overflow headroom: n·SS ≤ n²·max_cents² must fit
    int64 — fine to ~30k points/window at values ≤ 10⁵ cents; wider
    windows should pre-aggregate to coarser buckets first."""
    from pyspark.sql import Window as W

    from dig_etl_engine_spark.functions.exact import fixed

    # ts_us is an OUTPUT column now (r8), so it must be
    # session-timezone-independent, not merely frame-safe. For an NTZ
    # column, `unix_micros(cast(ts as timestamp))` interprets the wall
    # time in the SESSION zone — a non-UTC driver session would shift
    # every emitted ts_us by the zone offset (measured: +18000 s under
    # America/New_York) while the DuckDB oracle's epoch_us treats naive
    # as UTC; worse, a DST transition inside the data would shift
    # values by DIFFERENT offsets, bending the frame itself. Compute
    # NTZ epochs with pure calendar arithmetic against the NTZ epoch
    # instead (no zone anywhere); true instant columns keep
    # unix_micros, which is zone-independent by definition.
    if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
        us = F.timestamp_diff(
            "MICROSECOND",
            F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"),
            F.col(ts_col))
    else:
        us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = (W.partitionBy(key_col).orderBy(us)
         .rangeBetween(-window_days * 86400 * 1_000_000, -1))
    cents = fixed(F.col(val_col), 2)
    n = F.count(F.lit(1)).over(w)
    s = F.sum(cents).over(w)
    ss = F.sum(cents * cents).over(w)
    # Per-row closed form on exact integers; mirrored token-for-token
    # in the oracle (queries_timeseries.ts_rolling_anomaly).
    var_num = n * ss - s * s            # exact int64; 0 ⇔ constant window
    n_d = n.cast("double")
    var_c = var_num.cast("double") / (n_d * (n_d - F.lit(1.0)))
    mean_c = s.cast("double") / n_d
    z = F.when(var_num > 0,
               (cents.cast("double") - mean_c) / F.sqrt(var_c))
    # scaled-integer emission via the shared helper — ONE definition of
    # the floor(x·10^d + 0.5) quantization tree for the whole registry
    # (functions/exact.fixed; its docstring carries the tie-rule and
    # cross-engine rationale), mirrored in the oracle as
    # CAST(floor(.. * 10^d + 0.5) AS BIGINT)
    z_fp = fixed(z, z_digits)
    return df.select(
        F.col(key_col),
        us.alias("ts_us"),
        cents.alias("value_cents"),
        n.alias("roll_n"),
        s.alias("roll_sum_cents"),
        z_fp.alias(f"z_e{z_digits}"),
        F.coalesce(F.abs(z) > z_cut, F.lit(False)).alias("is_anomaly"))


def gap_fill_linear(df, *, key_col: str = "series_id",
                    date_col: str = "d", val_col: str = "v",
                    round_digits: int = 4):
    """Gap-filling resample to a regular daily grid with LINEAR
    interpolation — the TSDB ``time_bucket_gapfill`` + ``interpolate``
    pair, and the superset of T4's forward-fill: missing days between
    two observations take the straight line between them; edge gaps
    (before the first / after the last observation) carry the nearest
    value. Output rows tag their provenance in ``method`` ∈
    {observed, interpolated, ffill_edge, bfill_edge}.

    Shape: the per-key (min, max) span is one map-side-combined agg;
    the dense grid explodes NARROWLY from that span table (one row per
    key-day, generated — not shuffled — where the span row lives); one
    (key, day) left join against the observations and one window pass
    per key complete the fill. The interpolation expression is pure
    per-row arithmetic — deterministic and engine-identical (no
    accumulation-order wobble)."""
    from pyspark.sql import Window as W

    span = df.groupBy(key_col).agg(F.min(date_col).alias("_d0"),
                                   F.max(date_col).alias("_d1"))
    grid = span.select(
        key_col, F.explode(F.sequence("_d0", "_d1")).alias(date_col))
    g = grid.join(df, [key_col, date_col], "left")
    v = F.col(val_col)
    wp = (W.partitionBy(key_col).orderBy(date_col)
          .rowsBetween(W.unboundedPreceding, 0))
    wn = (W.partitionBy(key_col).orderBy(date_col)
          .rowsBetween(0, W.unboundedFollowing))
    pv = F.last(v, ignorenulls=True).over(wp)
    pdate = F.last(F.when(v.isNotNull(), F.col(date_col)),
                   ignorenulls=True).over(wp)
    nv = F.first(v, ignorenulls=True).over(wn)
    ndate = F.first(F.when(v.isNotNull(), F.col(date_col)),
                    ignorenulls=True).over(wn)
    frac = (F.datediff(F.col(date_col), pdate)
            / F.datediff(ndate, pdate))
    filled = F.coalesce(
        v,
        F.when(pv.isNull(), nv)
        .when(nv.isNull(), pv)
        .otherwise(pv + (nv - pv) * frac))
    method = (F.when(v.isNotNull(), "observed")
              .when(pv.isNull(), "bfill_edge")
              .when(nv.isNull(), "ffill_edge")
              .otherwise("interpolated"))
    return g.select(
        F.col(key_col),
        F.date_format(date_col, "yyyy-MM-dd").alias("day"),
        F.round(filled, round_digits).alias("value"),
        method.alias("method"))
