"""Registry entries for the time-series subsystem (SURVEY.md §2.10 T1-T6).

The reference extracts series from annotated spreadsheets
(`utilities/timeseries/extractSpreadsheet.py`) and converts them to
Measure/Measurement/Trend docs (`ts_converter.py`). Here the distributed
operators (imputation, backfill, emission, trends) run over a deterministic
daily series derived from the ``events`` table — per event_type, sum(value)
per day — with missing values PLANTED deterministically (day-of-month
buckets) so both engines derive the identical series and the imputation
logic has real holes to fill. The driver-side spreadsheet parser (T1-T2)
is pinned by a golden query over an inline grid plus unit tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dig_etl_engine_spark.catalog import load_tables
from dig_etl_engine_spark.queries import register
from dig_etl_engine_spark.timeseries import convert as C

# Engine-identical rounded bucket mean (wobble lint): one canonical
# definition, next to the Spark expression it mirrors (convert.py).
_MEAN_V_SQL = C.ohlc_mean_v_sql()

# Shared daily-series derivation. 'n/a' ≙ a non-numeric cell in a
# spreadsheet; NULL ≙ an empty cell — the two missing shapes
# `ts_converter.py:117-137` distinguishes.
_DAILY_SQL = """
    daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
             ROUND(SUM(value), 2) AS v
      FROM events GROUP BY 1, 2
    ),
    raw AS (
      SELECT event_type, strftime(d, '%Y-%m-%d') AS day,
             CASE WHEN day(d) % 15 = 7 THEN 'n/a'
                  WHEN day(d) % 15 = 11 THEN NULL
                  ELSE v::VARCHAR END AS value_raw
      FROM daily
    )
"""


def _daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_tables(spark, sf_dir)["events"]
    return (events.groupBy("event_type", F.to_date("ts").alias("d"))
            .agg(F.round(F.sum("value"), 2).alias("v")))


def _raw_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _daily(spark, sf_dir)
    return d.select(
        "event_type", F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.when(F.dayofmonth("d") % 15 == 7, F.lit("n/a"))
        .when(F.dayofmonth("d") % 15 == 11, F.lit(None))
        .otherwise(F.col("v").cast("string")).alias("value_raw"))


@register(
    "ts_impute_forward_fill",
    oracle=f"""
    WITH {_DAILY_SQL},
    num AS (SELECT *, TRY_CAST(value_raw AS DOUBLE) AS vnum FROM raw),
    win AS (
      SELECT *,
        AVG(CASE WHEN vnum IS NOT NULL THEN 1 ELSE 0 END)
          OVER (PARTITION BY event_type) AS ratio,
        SUM(CASE WHEN value_raw IS NULL THEN 1 ELSE 0 END)
          OVER (PARTITION BY event_type) AS n_null,
        SUM(CASE WHEN vnum IS NOT NULL THEN 1 ELSE 0 END)
          OVER (PARTITION BY event_type) AS n_num,
        last_value(vnum IGNORE NULLS) OVER (PARTITION BY event_type
          ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ff,
        first_value(vnum IGNORE NULLS) OVER (PARTITION BY event_type
          ORDER BY day ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS bf
      FROM num
    )
    SELECT event_type, day, value_raw,
           ROUND(ratio, 6) AS numeric_ratio,
           ROUND(CASE WHEN ratio >= 0.8 THEN coalesce(ff, bf) END, 2) AS value_num,
           CASE WHEN ratio >= 0.8 THEN NULL
                WHEN n_num = 0 AND n_null = 0 THEN value_raw
                ELSE CASE WHEN vnum IS NOT NULL THEN vnum::VARCHAR
                          ELSE value_raw END END AS value_text,
           CASE WHEN ratio >= 0.8 AND vnum IS NOT NULL THEN 'original'
                WHEN ratio >= 0.8 AND ff IS NOT NULL THEN 'imputed_ffill'
                WHEN ratio >= 0.8 THEN 'imputed_bfill'
                WHEN n_num = 0 AND n_null = 0 THEN 'kept_text'
                ELSE 'stringified' END AS method
    FROM win
    """,
)
def ts_impute_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4 + A4 (`ts_converter.py:117-163`): ≥80%-numeric series get
    forward-fill (leading holes from the next value); window functions over
    (series, order) — one shuffle, no driver state."""
    raw = _raw_series(spark, sf_dir)
    imp = C.impute_forward_fill(raw, series_col="event_type",
                                order_col="day", value_col="value_raw")
    return imp.select(
        "event_type", "day", "value_raw",
        F.round("numeric_ratio", 6).alias("numeric_ratio"),
        F.round("value_num", 2).alias("value_num"),
        "value_text", "method")


@register(
    "ts_backfill_labels",
    oracle=f"""
    WITH {_DAILY_SQL},
    lab AS (
      SELECT event_type, strftime(d, '%Y-%m-%d') AS day,
             CASE WHEN day(d) % 3 = 1 THEN ''
                  ELSE strftime(d, '%Y-%m-%d') END AS label_raw
      FROM daily
    )
    SELECT event_type, day, label_raw,
           coalesce(last_value(nullif(trim(label_raw), '') IGNORE NULLS)
             OVER (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             '') AS label_filled
    FROM lab
    """,
)
def ts_backfill_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3 (`extractSpreadsheet.py:104-120` backfill mode): blank time
    labels inherit the previous non-blank one — last(ignorenulls) window,
    the set-oriented form of the reference's backwards cell scan."""
    d = _daily(spark, sf_dir)
    lab = d.select(
        "event_type", F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.when(F.dayofmonth("d") % 3 == 1, F.lit(""))
        .otherwise(F.date_format("d", "yyyy-MM-dd")).alias("label_raw"))
    return C.backfill_labels(lab, series_col="event_type", order_col="day",
                             label_col="label_raw")


@register(
    "ts_measure_emission",
    oracle=f"""
    WITH {_DAILY_SQL}
    SELECT sha256('events ' || event_type) AS doc_id,
           event_type AS name, 'Measure' AS type,
           min(day) AS start_date_time, max(day) AS end_date_time,
           count(*) AS n_points
    FROM raw GROUP BY event_type
    """,
)
def ts_measure_emission(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5 Measure docs + A3 temporal region (`ts_converter.py:84-96,
    165-183`): doc_id = sha256('{dataset} {name}'), start/end from the
    series' date bounds."""
    raw = _raw_series(spark, sf_dir)
    return C.emit_measures(raw, dataset="events", name_col="event_type",
                           date_col="day")


@register(
    "ts_measurement_emission",
    oracle=f"""
    WITH {_DAILY_SQL}
    SELECT sha256(day || '|' || v::VARCHAR || '|'
                  || sha256('events ' || event_type)) AS doc_id,
           day AS date, v AS number,
           sha256('events ' || event_type) AS timeseries,
           'Measurement' AS type
    FROM (SELECT event_type, strftime(d, '%Y-%m-%d') AS day, v FROM daily) t
    """,
)
def ts_measurement_emission(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5 Measurement docs (`ts_converter.py:19-52`): one per point,
    sha256 point id, FK to the Measure doc — a narrow projection that
    scales linearly."""
    d = _daily(spark, sf_dir)
    pts = d.select(
        F.sha2(F.concat_ws(" ", F.lit("events"), F.col("event_type")), 256)
        .alias("series_id"),
        F.date_format("d", "yyyy-MM-dd").alias("date"),
        F.col("v").alias("value_num"))
    return C.emit_measurements(pts)


@register(
    "ts_trend_linear_fit",
    oracle=f"""
    WITH {_DAILY_SQL},
    pts AS (
      SELECT event_type, CAST(d - DATE '2024-01-01' AS BIGINT) AS x,
             CAST(floor(v * 100 + 0.5) AS BIGINT) AS yc
      FROM daily
    ),
    s AS (
      SELECT event_type, COUNT(*) AS n, SUM(x) AS sx, SUM(yc) AS sy,
             SUM(x * x) AS sxx, SUM(x * yc) AS sxy, SUM(yc * yc) AS syy
      FROM pts GROUP BY event_type
    ),
    d2 AS (
      SELECT event_type, n,
             n * sxy - sx * sy AS p,
             n * sxx - sx * sx AS q,
             sy * sxx - sx * sxy AS p2,
             n * syy - sy * sy AS r
      FROM s
    )
    SELECT event_type,
           CASE WHEN q > 0 THEN
             CAST(CASE WHEN p * 10000 < 0
                       THEN -((2 * abs(p * 10000) + q) // (2 * q))
                       ELSE ((2 * abs(p * 10000) + q) // (2 * q)) END
                  AS DOUBLE) / 1000000.0 END AS slope,
           CASE WHEN q > 0 THEN
             CAST(CASE WHEN p2 * 10000 < 0
                       THEN -((2 * abs(p2 * 10000) + q) // (2 * q))
                       ELSE ((2 * abs(p2 * 10000) + q) // (2 * q)) END
                  AS DOUBLE) / 1000000.0 END AS intercept,
           CASE WHEN q > 0 AND r > 0 THEN
             CAST((2 * (p * p * 1000000) + q * r) // (2 * (q * r))
                  AS DOUBLE) / 1000000.0 END AS r2,
           n AS n_points, 'Trend' AS type
    FROM d2
    """,
)
def ts_trend_linear_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5 Trend docs (`ts_converter.py:186-196`): the reference carries
    precomputed 'linear fits'; we compute them from exact integer sums
    with 128-bit closed forms (see `timeseries/convert.py:emit_trends` —
    the regr_* covariance aggregates are the wobble-lint class: float
    accumulation order + rational outputs exactly on round boundaries).
    One map-side-combined shuffle on the series key, as before."""
    d = _daily(spark, sf_dir)
    fitted = d.select(
        "event_type",
        F.datediff("d", F.lit("2024-01-01")).alias("x"),
        F.col("v").alias("y"))
    return C.emit_trends(fitted, series_col="event_type")


@register(
    "ts_label_template",
    oracle=f"""
    WITH {_DAILY_SQL}
    SELECT sha256('events ' || event_type) AS doc_id,
           concat(event_type, ' ', coalesce(NULL, ''), ' series from ',
                  min(day), ' to ', max(day)) AS label
    FROM raw GROUP BY event_type
    """,
)
def ts_label_template(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T6 (`ts_label_maker.py:11-44`): measure-label templating, missing
    metadata keys render as '' (PartialFormatter(missing=''))."""
    raw = _raw_series(spark, sf_dir)
    agg = raw.groupBy("event_type").agg(F.min("day").alias("s"),
                                        F.max("day").alias("e"))
    missing_key = F.lit(None).cast("string")
    return agg.select(
        F.sha2(F.concat_ws(" ", F.lit("events"), F.col("event_type")), 256)
        .alias("doc_id"),
        C.label_template([F.col("event_type"), " ", missing_key,
                          " series from ", F.col("s"), " to ",
                          F.col("e")]).alias("label"))


# --- T1/T2 golden: driver-side spreadsheet region extraction ----------------

_GRID = [
    ["Diesel Prices", "", "", "", ""],
    ["", "2024", "", "2025", ""],
    ["location", "Jan", "Feb", "Jan", "Feb"],
    ["madrid", "1.5", "1.6", "1.7", "1.8"],
    ["paris", "2.5", "2.6", "2.7", "2.8"],
    ["", "", "", "", ""],
]

_ANNOTATION = {
    "Properties": {"sheet_indices": "[1]"},
    "GlobalMetadata": [
        {"source": "cell", "name": "name", "loc": "(A,1)"},
        {"source": "const", "name": "dataset", "val": "fuel"},
    ],
    "TimeSeriesRegions": [{
        "orientation": "row",
        "rows": "[4:*]",            # open-ended: stops at the blank row
        "locs": "[B:E]",
        "metadata": [{"source": "col", "loc": "[A]", "name": "location"}],
        "times": {"locs": "[2:3]", "mode": "backfill"},
    }],
}

_GOLDEN_ROWS = [
    ("Diesel Prices", "fuel", "madrid", "2024 Jan", "1.5"),
    ("Diesel Prices", "fuel", "madrid", "2024 Feb", "1.6"),
    ("Diesel Prices", "fuel", "madrid", "2025 Jan", "1.7"),
    ("Diesel Prices", "fuel", "madrid", "2025 Feb", "1.8"),
    ("Diesel Prices", "fuel", "paris", "2024 Jan", "2.5"),
    ("Diesel Prices", "fuel", "paris", "2024 Feb", "2.6"),
    ("Diesel Prices", "fuel", "paris", "2025 Jan", "2.7"),
    ("Diesel Prices", "fuel", "paris", "2025 Feb", "2.8"),
]


@register(
    "ts_spreadsheet_extract",
    oracle="SELECT * FROM (VALUES {}) AS t(name, dataset, location, label, value)".format(
        ", ".join(str(r) for r in _GOLDEN_ROWS)),
)
def ts_spreadsheet_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1 + T2 golden (`extractSpreadsheet.py:20-194`; `LocationParser.py`):
    the annotation-driven region extractor over an inline grid — row
    orientation, open-ended series range with blank-stop, column metadata,
    concatenated time coordinates with backfilled blanks. The oracle pins
    the exact expected series (hand-derived)."""
    from dig_etl_engine_spark.timeseries.spreadsheet import (
        extract_grids, timeseries_df)

    parsed = extract_grids({"fuel_prices": _GRID}, [_ANNOTATION],
                           filename="inline")
    ts = timeseries_df(spark, parsed, dataset="fuel")
    return ts.select(
        F.col("metadata")["name"].alias("name"),
        F.col("metadata")["dataset"].alias("dataset"),
        F.col("metadata")["location"].alias("location"),
        F.explode("points").alias("p"),
    ).select("name", "dataset", "location",
             F.col("p.label").alias("label"), F.col("p.value").alias("value"))


@register(
    "ts_downsample_ohlc",
    oracle="""
    SELECT user_id,
           strftime(date_trunc('day', ts), '%Y-%m-%d') AS bucket,
           round(arg_min(value, ts), 4) AS open,
           round(MAX(value), 4) AS high,
           round(MIN(value), 4) AS low,
           round(arg_max(value, ts), 4) AS close,
           COUNT(*) AS n,
           {mean_v} AS mean_v
    FROM events GROUP BY 1, 2
    """.format(mean_v=_MEAN_V_SQL),
)
def ts_downsample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bucket OHLC downsampling (`timeseries/convert.py:
    downsample_ohlc`): per (user, day) open/high/low/close/count/mean
    over the raw event stream — the TSDB `time_bucket` rollup as one
    map-side-combined groupBy. Ties on the open/close timestamps break
    on event_id in the operator; the oracle's arg_min/arg_max(v, ts)
    is identical because (user_id, ts) is unique in this table."""
    ev = load_tables(spark, sf_dir)["events"]
    return C.downsample_ohlc(ev)


@register(
    "ts_rolling_anomaly",
    oracle="""
    WITH c AS (
      SELECT user_id, epoch_us(ts) AS ts_us,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events
    ),
    w AS (
      SELECT user_id, ts_us, cents,
             COUNT(*) OVER fr AS roll_n,
             CAST(SUM(cents) OVER fr AS BIGINT) AS s,
             CAST(SUM(cents * cents) OVER fr AS BIGINT) AS ss
      FROM c
      WINDOW fr AS (PARTITION BY user_id ORDER BY ts_us
                    RANGE BETWEEN 604800000000 PRECEDING
                                AND 1 PRECEDING)
    ),
    d AS (
      SELECT user_id, ts_us, cents, roll_n, s,
             roll_n * ss - s * s AS var_num,
             CASE WHEN roll_n * ss - s * s > 0 THEN
               (CAST(cents AS DOUBLE) - CAST(s AS DOUBLE) / CAST(roll_n AS DOUBLE))
               / sqrt(CAST(roll_n * ss - s * s AS DOUBLE)
                      / (CAST(roll_n AS DOUBLE) * (CAST(roll_n AS DOUBLE) - 1.0)))
             END AS z_raw
      FROM w
    )
    SELECT user_id,
           ts_us,
           cents AS value_cents,
           roll_n,
           s AS roll_sum_cents,
           CAST(floor(z_raw * 10000.0 + 0.5) AS BIGINT) AS z_e4,
           COALESCE(ABS(z_raw) > 3.0, FALSE) AS is_anomaly
    FROM d
    """,
)
def ts_rolling_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day z-score anomaly flags per user
    (`timeseries/convert.py:rolling_anomaly`): event-time RANGE frame
    over the PRIOR week (leave-one-out baseline — a point in its own
    baseline caps z below 3σ) at microsecond precision, matching the
    operator's strict-prior frame exactly even on sub-second-dense
    streams; incremental sliding aggregate, one exchange; cold-start
    empty baselines never alert. Hash determinism: the windowed
    aggregates are EXACT integers only (SUM/SUMSQ/COUNT over the
    fixed-point cents input — order-independent, bit-identical in any
    engine or build), and mean/var/z derive per-row through this
    closed-form expression tree mirrored token-for-token in the
    operator; a windowed STDDEV_SAMP would instead accumulate doubles
    in an engine-chosen order whose 1-ulp wobble flips round(z,4) on
    half-boundaries in some libm builds (the r5 driver flip). The
    var>0 guard is an integer comparison — no float boundary.
    r8 hardening (the r7 residual): after the arithmetic was proven
    bitwise-clean locally, the remaining engine-sensitive surface was
    the SQL itself — the registry's only INTERVAL-framed RANGE window
    (interval frame-edge computation over timestamps varies across
    DuckDB builds), plus engine round()/strftime on the hashed
    output. All three are gone: both engines now order on exact int64
    epoch-micros with the integer frame 604800000000 PRECEDING AND 1
    PRECEDING, ts is emitted as epoch-micros BIGINT, and z as
    floor(z·1e4 + 0.5) BIGINT — the identical two-op tree in both
    engines. Every hashed column is now int64 or boolean."""
    ev = load_tables(spark, sf_dir)["events"]
    return C.rolling_anomaly(ev)


@register(
    "ts_gap_fill_linear",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
             ROUND(SUM(value), 2) AS v
      FROM events GROUP BY 1, 2
    ),
    sparse AS (SELECT * FROM daily WHERE day(d) % 11 != 3),
    span AS (
      SELECT event_type, MIN(d) AS d0, MAX(d) AS d1
      FROM sparse GROUP BY 1
    ),
    grid AS (
      SELECT event_type, CAST(dd AS DATE) AS d
      FROM span, unnest(generate_series(d0::TIMESTAMP, d1::TIMESTAMP,
                                        INTERVAL 1 DAY)) AS t(dd)
    ),
    g AS (
      SELECT grid.event_type, grid.d, s.v
      FROM grid LEFT JOIN sparse s USING (event_type, d)
    ),
    w AS (
      SELECT *,
        last_value(v IGNORE NULLS) OVER wp AS pv,
        last_value(CASE WHEN v IS NOT NULL THEN d END IGNORE NULLS)
          OVER wp AS pd,
        first_value(v IGNORE NULLS) OVER wn AS nv,
        first_value(CASE WHEN v IS NOT NULL THEN d END IGNORE NULLS)
          OVER wn AS nd
      FROM g
      WINDOW wp AS (PARTITION BY event_type ORDER BY d
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wn AS (PARTITION BY event_type ORDER BY d
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_type,
           strftime(d, '%Y-%m-%d') AS day,
           ROUND(COALESCE(v,
             CASE WHEN pv IS NULL THEN nv
                  WHEN nv IS NULL THEN pv
                  ELSE pv + (nv - pv) * ((d - pd) / (nd - pd)) END),
             4) AS value,
           CASE WHEN v IS NOT NULL THEN 'observed'
                WHEN pv IS NULL THEN 'bfill_edge'
                WHEN nv IS NULL THEN 'ffill_edge'
                ELSE 'interpolated' END AS method
    FROM w
    """,
)
def ts_gap_fill_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled daily resample with linear interpolation
    (`timeseries/convert.py:gap_fill_linear` — the TSDB
    time_bucket_gapfill + interpolate pair, superset of T4's
    forward-fill): the daily per-type series with every
    day-of-month%11==3 observation DELETED, re-densified onto the full
    grid; interior gaps take the straight line between neighbors, edge
    gaps carry the nearest value, and `method` tags provenance. The
    interpolation is per-row arithmetic with an identical expression
    tree in both engines — no accumulation-order wobble."""
    d = _daily(spark, sf_dir).filter(F.dayofmonth("d") % 11 != 3)
    return C.gap_fill_linear(d, key_col="event_type",
                             date_col="d", val_col="v")
