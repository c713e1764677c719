"""gdal raster calc expression preprocessor
(apps/gdalalg_raster_calc.cpp:40-179,366-444) — string-level pins for
the ported rewrite rules, plus an end-to-end numpy cross-check of the
compiled SQL.  The registry query `raster_calc` is oracle-checked by
the driver contract; these tests pin the preprocessor quirks the
oracle can't see (it only sees the two fixture expressions)."""

import duckdb
import numpy as np
import pytest

from gdal_spark.operators.calc import (
    compile_to_sql,
    expand_expression,
    set_band_indices,
    set_band_indices_flattened,
)


class TestSetBandIndices:
    def test_basic(self):
        assert set_band_indices("X + 1", "X", 3) == ("X[3] + 1", True)

    def test_already_indexed_untouched(self):
        assert set_band_indices("X[1] + X", "X", 2) == ("X[1] + X[2]", True)

    def test_partial_name_is_not_a_match(self):
        # XY, X_, prefix_X: the match must be a complete variable name
        assert set_band_indices("XY + 2", "X", 1) == ("XY + 2", False)
        assert set_band_indices("X_ + 2", "X", 1) == ("X_ + 2", False)
        assert set_band_indices("aX + 2", "X", 1) == ("aX + 2", False)

    def test_function_call_is_not_a_match(self):
        # X( means we matched a function name (:50-55)
        assert set_band_indices("X(3) + X", "X", 2) == ("X(3) + X[2]", True)

    def test_multiple_instances(self):
        assert set_band_indices("X*X + X[9]", "X", 4) == (
            "X[4]*X[4] + X[9]",
            True,
        )


class TestFlattenedExpansion:
    def test_inside_aggregate(self):
        assert (
            set_band_indices_flattened("avg(X)", "X", 3)
            == "avg(X[1],X[2],X[3])"
        )

    def test_outside_aggregate_untouched(self):
        assert set_band_indices_flattened("X + avg(X)", "X", 2) == (
            "X + avg(X[1],X[2])"
        )

    def test_non_aggregate_function_untouched(self):
        assert set_band_indices_flattened("foo(X)", "X", 2) == "foo(X)"

    def test_ends_with_aggregate_name_quirk(self):
        # PosIsAggregateFunctionArgument tests the 3 chars before the
        # '(' (:129-136), so ANY function name ending in avg/sum/min/
        # max counts — colsum(X) expands.  Ported as-is.
        assert (
            set_band_indices_flattened("colsum(X)", "X", 2)
            == "colsum(X[1],X[2])"
        )

    def test_second_argument_position(self):
        # commas/space/digits/dots are admitted by the backward scan
        assert (
            set_band_indices_flattened("min(1.5, X)", "X", 2)
            == "min(1.5, X[1],X[2])"
        )

    def test_operator_breaks_the_scan(self):
        # an arithmetic char between '(' and the variable: not an
        # aggregate-argument position (:115-120)
        assert set_band_indices_flattened("avg(2*X)", "X", 2) == "avg(2*X)"

    def test_indexed_instance_untouched(self):
        assert set_band_indices_flattened("avg(X[2])", "X", 3) == "avg(X[2])"


class TestExpandExpression:
    def test_multiband_with_broadcast(self):
        assert expand_expression("A + 2 * B", {"A": 3, "B": 1}) == [
            "A[1] + 2 * B[1]",
            "A[2] + 2 * B[1]",
            "A[3] + 2 * B[1]",
        ]

    def test_flatten_single_out_band(self):
        assert expand_expression(
            "avg(A) + max(A) - B", {"A": 3, "B": 1}, flatten=True
        ) == ["avg(A[1],A[2],A[3]) + max(A[1],A[2],A[3]) - B[1]"]

    def test_incompatible_band_counts_error(self):
        with pytest.raises(ValueError, match="incompatible numbers of bands"):
            expand_expression("A + C", {"A": 3, "C": 2})

    def test_explicit_indices_stay_single_band(self):
        assert expand_expression("A[2] - A[1]", {"A": 3}) == ["A[2] - A[1]"]


class TestCompile:
    def test_translation_exact(self):
        got = compile_to_sql("avg(A[1],A[2]) + sum(A[1],B[1]) - min(A[2],B[1])")
        assert got == (
            "((a_1 + a_2) / 2.0e0) + (a_1 + b_1) - least(a_2, b_1)"
        )

    def test_numpy_cross_check(self):
        # evaluate the full pipeline on a tiny grid against plain numpy
        rng = np.arange(12)
        a1, a2, a3 = (rng * 7) % 5, (rng * 3) % 7, (rng * 5) % 11
        b1 = (rng * 2) % 9
        exprs = expand_expression(
            "avg(A) + max(A) - B", {"A": 3, "B": 1}, flatten=True
        )
        sql = compile_to_sql(exprs[0])
        df = duckdb.sql(
            "SELECT i, "
            "CAST((i * 7) % 5 AS BIGINT) AS a_1, "
            "CAST((i * 3) % 7 AS BIGINT) AS a_2, "
            "CAST((i * 5) % 11 AS BIGINT) AS a_3, "
            "CAST((i * 2) % 9 AS BIGINT) AS b_1 "
            "FROM range(0, 12) t(i)"
        ).df()
        got = duckdb.sql(f"SELECT i, {sql} AS v FROM df ORDER BY i").df()
        want = (a1 + a2 + a3) / 3.0 + np.maximum(np.maximum(a1, a2), a3) - b1
        assert np.array_equal(got["v"].to_numpy(), want)
