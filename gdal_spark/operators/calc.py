"""gdal raster calc — the muparser-dialect expression preprocessor
(apps/gdalalg_raster_calc.cpp) ported string-for-string, plus a
compiler from the expanded per-band expressions to Spark/DuckDB SQL.

The reference builds a VRTDerivedRasterBand per output band by
rewriting the user expression:

  * ``SetBandIndices`` (:73-99) appends ``[band]`` to every complete,
    un-indexed occurrence of a variable (``X`` -> ``X[3]``, ``X[1]``
    untouched, ``XY``/``X_``/``X(`` are not matches);
  * ``SetBandIndicesFlattenedExpression`` (:144-179, the --flatten
    path) expands an un-indexed multiband variable INSIDE an aggregate
    function argument list to the full band list
    (``avg(X)`` -> ``avg(X[1],X[2],X[3])``);
  * ``PosIsAggregateFunctionArgument`` (:101-138) detects that context
    by scanning backwards over [alnum ,.[]_ space] to a ``(`` and then
    testing whether the three characters ending just before it spell
    avg/sum/min/max case-insensitively — which means any function name
    ENDING in one of those (``colsum``) also counts.  Ported as-is and
    pinned in tests/test_raster_calc.py.
  * the output-band loop (:372-444) grows ``nOutBands`` when a
    multiband source is applied per-band (``expressionAppliedPerBand``)
    and rejects sources with incompatible band counts; 1-band sources
    broadcast (``nDefaultInBand = min(nBands, nOutBand)``).

Sources iterate in name order (the reference holds them in a
``std::map``), so rewrites are deterministic.
"""

from __future__ import annotations

import re

_AGGS = ("avg", "sum", "min", "max")


def _is_complete_variable_name_with_no_index(s: str, frm: int, to: int) -> bool:
    """MatchIsCompleteVariableNameWithNoIndex (:40-66)."""
    if to < len(s):
        c = s[to]
        if c.isalnum() or c == "_" or c == "[" or c == "(":
            return False
    if frm > 0:
        c = s[frm - 1]
        if c.isalnum() or c == "_":
            return False
    return True


def set_band_indices(
    expression: str, variable: str, band: int
) -> tuple[str, bool]:
    """SetBandIndices (:73-99): X -> X[band] for un-indexed instances."""
    changed = False
    seek = 0
    pos = expression.find(variable, seek)
    while pos != -1:
        end = pos + len(variable)
        if _is_complete_variable_name_with_no_index(expression, pos, end):
            expression = (
                expression[:end] + "[" + str(band) + "]" + expression[end:]
            )
            changed = True
        seek = end
        pos = expression.find(variable, seek)
    return expression, changed


def _pos_is_aggregate_function_argument(expression: str, pos: int) -> bool:
    """PosIsAggregateFunctionArgument (:101-138), quirks intact: the
    backward scan admits only variable-ish characters, and the test is
    'the 3 chars ending just before the ( spell an aggregate name' —
    so ``colsum(X)`` qualifies."""
    while pos != 0:
        c = expression[pos]
        if c == "(":
            pos -= 1
            break
        if not (
            c.isspace()
            or c.isalnum()
            or c in (",", ".", "[", "]", "_")
        ):
            return False
        pos -= 1
    if pos < 2:
        return False
    return expression[pos - 2 : pos + 1].lower() in _AGGS


def set_band_indices_flattened(
    expression: str, variable: str, nbands: int
) -> str:
    """SetBandIndicesFlattenedExpression (:144-179):
    aggregate-argument X -> X[1],X[2],...,X[nbands]."""
    seek = 0
    pos = expression.find(variable, seek)
    while pos != -1:
        end = pos + len(variable)
        if _is_complete_variable_name_with_no_index(
            expression, pos, end
        ) and _pos_is_aggregate_function_argument(expression, pos):
            new = expression[:pos] + ",".join(
                f"{variable}[{i}]" for i in range(1, nbands + 1)
            )
            old_size = len(expression)
            new += expression[end:]
            end += len(new) - old_size
            expression = new
        seek = end
        pos = expression.find(variable, seek)
    return expression


def expand_expression(
    expression: str, sources: dict[str, int], flatten: bool = False
) -> list[str]:
    """The CreateDerivedBandXML output-band loop (:366-444): returns one
    fully band-indexed expression per output band."""
    n_out_bands = 1
    results: list[str] = []
    n_out_band = 1
    while n_out_band <= n_out_bands:
        band_expression = expression
        for source_name in sorted(sources):  # std::map iteration order
            nbands = sources[source_name]
            n_default_in_band = min(nbands, n_out_band)
            if flatten:
                band_expression = set_band_indices_flattened(
                    band_expression, source_name, nbands
                )
            band_expression, applied_per_band = set_band_indices(
                band_expression, source_name, n_default_in_band
            )
            if applied_per_band:
                if n_out_bands <= 1:
                    n_out_bands = nbands
                elif nbands != 1 and nbands != n_out_bands:
                    raise ValueError(
                        f"Expression cannot operate on all bands of rasters "
                        f"with incompatible numbers of bands (source "
                        f"{source_name} has {nbands} bands but expected to "
                        f"have 1 or {n_out_bands} bands)."
                    )
        results.append(band_expression)
        n_out_band += 1
    return results


_VAR_RE = re.compile(r"([A-Za-z_][A-Za-z0-9_]*)\[(\d+)\]")
_AGG_RE = re.compile(r"\b(avg|sum|min|max)\s*\(([^()]*)\)", re.IGNORECASE)


def compile_to_sql(expression: str) -> str:
    """Translate an expanded (fully band-indexed) muparser expression to
    the SQL dialect shared by Spark and DuckDB: ``X[i]`` -> column
    ``x_i``; n-ary ``min``/``max`` -> least/greatest; ``sum`` -> chained
    ``+``; ``avg`` -> chained ``+`` divided by the arg count (muparser's
    sum/count double division — the divisor rendered in E-notation so
    neither engine integer-divides)."""

    def agg_repl(m: re.Match) -> str:
        fn = m.group(1).lower()
        args = [a.strip() for a in m.group(2).split(",") if a.strip()]
        if fn == "min":
            return "least(" + ", ".join(args) + ")"
        if fn == "max":
            return "greatest(" + ", ".join(args) + ")"
        joined = "(" + " + ".join(args) + ")"
        if fn == "sum":
            return joined
        return f"({joined} / {len(args)}.0e0)"

    prev = None
    while prev != expression:  # innermost-out for nested aggregates
        prev = expression
        expression = _AGG_RE.sub(agg_repl, expression)
    return _VAR_RE.sub(lambda m: f"{m.group(1).lower()}_{m.group(2)}", expression)
