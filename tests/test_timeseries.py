"""Unit tests for the driver-side time-series parsing (T1-T2) — the parts
the DuckDB oracle can't exercise structurally (range grammar, blank-stop,
inline-metadata series splitting). Distributed operators (T3-T6) are
covered by the oracle-parity suite."""

from __future__ import annotations

import pytest

from dig_etl_engine_spark.timeseries.locations import (
    col_label_to_index, parse_coords, parse_range)
from dig_etl_engine_spark.timeseries.spreadsheet import extract_grids


def _indices(spec: str, limit: int = 50) -> list[int]:
    out = []
    for idx, _ in parse_range(spec):
        out.append(idx)
        if len(out) >= limit:
            break
    return out


class TestLocationParsing:
    def test_column_labels(self):
        assert col_label_to_index("A") == 1
        assert col_label_to_index("Z") == 26
        assert col_label_to_index("AA") == 27
        assert col_label_to_index("AZ") == 52

    def test_singleton_and_interval(self):
        # reference semantics: 1-based start minus one, end label inclusive
        assert _indices("[5]") == [4]
        assert _indices("[5:41]") == list(range(4, 41))
        assert _indices("[B:E]") == [1, 2, 3, 4]

    def test_strided_and_multi_component(self):
        assert _indices("[1:2:7]") == [0, 2, 4, 6]
        assert _indices("[A,C:D,7]") == [0, 2, 3, 6]

    def test_infinite(self):
        assert _indices("[3:*]", limit=4) == [2, 3, 4, 5]
        assert _indices("[3:*:2]", limit=3) == [2, 4, 6]

    def test_coords(self):
        assert parse_coords("(A,1)") == (0, 0)
        assert parse_coords("(C,12)") == (11, 2)

    def test_bad_specs(self):
        with pytest.raises(ValueError):
            parse_range("5:41")
        with pytest.raises(ValueError):
            parse_coords("[A:1]")


GRID = [
    ["Report", "", "", ""],
    ["city", "2020", "2021", "2022"],
    ["oslo", "1", "2", "3"],
    ["bern", "4", "", "6"],
    ["", "", "", ""],
    ["ghost", "7", "8", "9"],   # below the blank row: must NOT be reached
]

ANNOTATION = {
    "Properties": {"sheet_indices": "[1]"},
    "GlobalMetadata": [{"source": "sheet_name", "name": "sheet"}],
    "TimeSeriesRegions": [{
        "orientation": "row",
        "rows": "[3:*]",
        "locs": "[B:D]",
        "metadata": [{"source": "col", "loc": "[A]", "name": "city"}],
        "times": {"locs": "[2]"},
    }],
}


class TestRegionExtraction:
    def test_blank_stop_and_values(self):
        out = extract_grids({"s1": GRID}, [ANNOTATION])
        # blank metadata row 4 stops the open-ended series range: 'ghost'
        # (row 5) is never reached — extractSpreadsheet.py:133-138
        assert [s["metadata"]["city"] for s in out] == ["oslo", "bern"]
        assert out[0]["metadata"]["sheet"] == "s1"
        assert out[0]["ts"] == [("2020", "1"), ("2021", "2"), ("2022", "3")]
        assert out[1]["ts"] == [("2020", "4"), ("2021", ""), ("2022", "6")]

    def test_column_orientation(self):
        ann = {
            "Properties": {"sheet_indices": "[1]"},
            "GlobalMetadata": [],
            "TimeSeriesRegions": [{
                "orientation": "col",
                "cols": "[B:D]",
                "locs": "[3:4]",
                "metadata": [{"source": "row", "loc": "[2]", "name": "year"}],
                "times": {"locs": "[A]"},
            }],
        }
        out = extract_grids({"s": GRID}, [ann])
        assert [s["metadata"]["year"] for s in out] == ["2020", "2021", "2022"]
        # time labels come from column A (the city names)
        assert out[0]["ts"] == [("oslo", "1"), ("bern", "4")]

    def test_backfill_time_labels(self):
        grid = [
            ["", "2024", "", ""],
            ["x", "10", "20", "30"],
        ]
        ann = {
            "Properties": {"sheet_indices": "[1]"},
            "GlobalMetadata": [],
            "TimeSeriesRegions": [{
                "orientation": "row",
                "rows": "[2]",
                "locs": "[B:D]",
                "metadata": [{"source": "col", "loc": "[A]", "name": "n"}],
                "times": {"locs": "[1]", "mode": "backfill"},
            }],
        }
        out = extract_grids({"s": grid}, [ann])
        assert out[0]["ts"] == [("2024", "10"), ("2024", "20"), ("2024", "30")]

    def test_inline_metadata_splits_series(self):
        # inline labels change mid-row → the series splits there
        # (extractSpreadsheet.py:161-185)
        grid = [
            ["grp", "a", "a", "b"],
            ["t", "1", "2", "3"],
            ["x", "10", "20", "30"],
        ]
        ann = {
            "Properties": {"sheet_indices": "[1]"},
            "GlobalMetadata": [],
            "TimeSeriesRegions": [{
                "orientation": "row",
                "rows": "[3]",
                "locs": "[B:D]",
                "metadata": [
                    {"source": "col", "loc": "[A]", "name": "n"},
                    {"source": "row", "loc": "[1]", "name": "grp",
                     "mode": "inline"},
                ],
                "times": {"locs": "[2]"},
            }],
        }
        out = extract_grids({"s": grid}, [ann])
        assert len(out) == 2
        assert out[0]["metadata"]["grp"] == "a"
        assert out[0]["ts"] == [("1", "10"), ("2", "20")]
        assert out[1]["metadata"]["grp"] == "b"
        assert out[1]["ts"] == [("3", "30")]

    def test_no_eval_post_process(self):
        out = extract_grids({"s": [["h", "x"], ["a", "1"]]}, [{
            "Properties": {"sheet_indices": "[1]"},
            "GlobalMetadata": [],
            "TimeSeriesRegions": [{
                "orientation": "row", "rows": "[2]", "locs": "[B]",
                "metadata": [{"source": "col", "loc": "[A]", "name": "n"}],
                "times": {"locs": "[1]", "post_process": "upper"},
            }],
        }])
        assert out[0]["ts"] == [("X", "1")]


class TestGapFillLinear:
    def test_interior_interpolation_and_edges(self, spark):
        import datetime
        from dig_etl_engine_spark.timeseries.convert import gap_fill_linear
        d = datetime.date
        rows = [("a", d(2024, 1, 2), 10.0),   # day 1 missing → bfill edge
                ("a", d(2024, 1, 3), 10.0),
                # days 4,5 missing → interpolate toward 40.0 on day 6
                ("a", d(2024, 1, 6), 40.0)]
        df = spark.createDataFrame(rows, "k STRING, d DATE, v DOUBLE")
        out = {r["day"]: (r["value"], r["method"])
               for r in gap_fill_linear(
                   df, key_col="k", date_col="d", val_col="v").collect()}
        assert out["2024-01-02"] == (10.0, "observed")
        assert out["2024-01-04"] == (20.0, "interpolated")
        assert out["2024-01-05"] == (30.0, "interpolated")
        assert out["2024-01-06"] == (40.0, "observed")
        # grid starts at the series' own min — no bfill row before it
        assert "2024-01-01" not in out and len(out) == 5

    def test_edge_gaps_carry_nearest(self, spark):
        import datetime
        from dig_etl_engine_spark.timeseries.convert import gap_fill_linear
        d = datetime.date
        # two series; b has a trailing gap inside its own span only
        rows = [("a", d(2024, 1, 1), 1.0), ("a", d(2024, 1, 3), 3.0),
                ("b", d(2024, 1, 1), 9.0), ("b", d(2024, 1, 2), None),
                ("b", d(2024, 1, 3), None), ("b", d(2024, 1, 4), 5.0)]
        df = spark.createDataFrame(rows, "k STRING, d DATE, v DOUBLE")
        out = {(r["k"], r["day"]): (r["value"], r["method"])
               for r in gap_fill_linear(
                   df, key_col="k", date_col="d", val_col="v").collect()}
        assert out[("a", "2024-01-02")] == (2.0, "interpolated")
        # NULL observations are gaps too (left-join parity): b spans 4
        # days, interior nulls interpolate 9 → 5
        assert out[("b", "2024-01-02")][0] == pytest.approx(
            9 + (5 - 9) / 3, abs=1e-4)
        assert out[("b", "2024-01-03")][0] == pytest.approx(9 + 2 * (5 - 9) / 3, abs=1e-4)

    def test_single_point_series(self, spark):
        import datetime
        from dig_etl_engine_spark.timeseries.convert import gap_fill_linear
        df = spark.createDataFrame(
            [("a", datetime.date(2024, 1, 5), 7.0)],
            "k STRING, d DATE, v DOUBLE")
        out = gap_fill_linear(df, key_col="k", date_col="d",
                              val_col="v").collect()
        assert len(out) == 1
        assert (out[0]["value"], out[0]["method"]) == (7.0, "observed")
