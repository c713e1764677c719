"""OGR style-string accessors: known-answer conversions against the
reference's ComputeWithUnit table (ogrfeaturestyle.cpp:1921-1976) and
the quoted-value grammar, evaluated in DuckDB (the same shared text the
Spark query compiles)."""

import duckdb
import pytest

from gdal_spark.functions.style import (
    sql_style_param,
    sql_style_param_meters,
    sql_style_part,
)

_STYLE = (
    "PEN(c:#FF0000,w:2px);BRUSH(fc:#0000FF);"
    'LABEL(f:"Arial, Bold",s:12pt,t:"Hello, World")'
)


def _eval(expr, style=_STYLE):
    return duckdb.connect().execute(
        f"SELECT {expr} FROM (SELECT '{style}' AS style) t"
    ).fetchone()[0]


class TestGrammar:
    def test_part(self):
        assert _eval(sql_style_part("style", "PEN")) == "c:#FF0000,w:2px"
        assert _eval(sql_style_part("style", "SYMBOL")) == ""

    def test_params(self):
        assert _eval(sql_style_param("style", "PEN", "c")) == "#FF0000"
        assert _eval(sql_style_param("style", "BRUSH", "fc")) == "#0000FF"

    def test_quoted_value_with_comma(self):
        assert _eval(sql_style_param("style", "LABEL", "f")) == "Arial, Bold"
        assert _eval(sql_style_param("style", "LABEL", "t")) == "Hello, World"

    def test_missing_param_is_empty(self):
        assert _eval(sql_style_param("style", "PEN", "id")) == ""


class TestUnitTable:
    """GetParamNum -> meters: the exact reference constants."""

    @pytest.mark.parametrize(
        "val,want",
        [
            ("2px", 2.0 / (72.0 * 39.37)),
            ("12pt", 12.0 / (72.0 * 39.37)),  # pt == px in the reference
            ("5", 0.005),  # default unit is mm
            ("4cm", 0.04),
            ("3in", 3.0 / 39.37),
        ],
    )
    def test_fixed_units(self, val, want):
        got = _eval(
            sql_style_param_meters("style", "PEN", "w"),
            style=f"PEN(w:{val})",
        )
        assert got == pytest.approx(want, rel=1e-12)

    def test_ground_unit_uses_scale(self):
        got = _eval(
            sql_style_param_meters("style", "PEN", "w", scale="2.0e0"),
            style="PEN(w:7g)",
        )
        assert got == pytest.approx(3.5, rel=1e-12)

    def test_missing_is_null(self):
        got = _eval(
            sql_style_param_meters("style", "PEN", "w"), style="BRUSH(fc:#FF)"
        )
        assert got is None
