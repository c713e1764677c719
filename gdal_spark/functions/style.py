"""OGR feature-style string surface (ogr/ogrfeaturestyle.cpp
OGRStyleMgr / OGRStyleTool; the OGR_STYLE special field,
ogr/ogrsf_frmts/generic/ogr_gensql.cpp).

Style strings are `TOOL(key:value,key:value);TOOL(...)` — e.g.
``PEN(c:#FF0000,w:2px);LABEL(f:"Arial, Bold",s:12pt,t:"Hi")``.  This
module renders the accessor surface as SHARED SQL expression text
(backslash-free regex classes, valid in Spark SQL and DuckDB, pure
whole-stage codegen):

  * :func:`sql_style_part`   — the parameter body of one tool;
  * :func:`sql_style_param`  — one parameter's raw value (quotes
    stripped; quoted values may contain commas);
  * :func:`sql_style_param_meters` — GetParamNum/ComputeWithUnit
    (ogrfeaturestyle.cpp:1921-1976): value converted to METERS with the
    reference's exact unit table — ground `g`: v/scale; `px` and `pt`:
    v/(72*39.37) (the reference converts both identically); `cm`:
    v*0.01; `in`: v/39.37; default/omitted unit is millimeters
    (the serializer omits the MM suffix, ogrfeaturestyle.cpp:1489).

Documented contract: one part per tool name (the reference allows
repeated tools), and `)`/`,` inside quoted values are honoured for the
value itself but a quoted value containing `,<key>:` would confuse a
LATER key lookup in the same part — the reference's lexer is exact.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# px and pt share the reference's conversion constant (72 * 39.37)
_PX_DIV = "2.834640e3"


def sql_style_part(style: str, tool: str) -> str:
    """SQL text: the ``key:value,...`` body of ``tool`` ('' if absent)."""
    return f"regexp_extract({style}, '{tool}[(]([^)]*)[)]', 1)"


def sql_style_param(style: str, tool: str, key: str) -> str:
    """SQL text: raw value of ``key`` in ``tool`` (quotes stripped,
    '' when the tool or key is absent)."""
    body = sql_style_part(style, tool)
    return (
        f"replace(regexp_extract({body},"
        f" '(^|,){key}:(\"[^\"]*\"|[^,]*)', 2), '\"', '')"
    )


def sql_style_param_meters(
    style: str, tool: str, key: str, scale: str = "1.0e0"
) -> str:
    """SQL text: numeric parameter converted to meters
    (OGRStyleTool::ComputeWithUnit; ``scale`` = m_dfScale for ground
    units). NULL when the parameter is absent or non-numeric."""
    v = sql_style_param(style, tool, key)
    num = f"TRY_CAST(regexp_extract({v}, '^-?[0-9.]+', 0) AS DOUBLE)"
    unit = f"regexp_extract({v}, '(g|px|pt|mm|cm|in)$', 1)"
    return (
        f"(CASE {unit}"
        f" WHEN 'g' THEN {num} / ({scale})"
        f" WHEN 'px' THEN {num} / {_PX_DIV}"
        f" WHEN 'pt' THEN {num} / {_PX_DIV}"
        f" WHEN 'cm' THEN {num} * 1.0e-2"
        f" WHEN 'in' THEN {num} / 3.937e1"
        f" ELSE {num} * 1.0e-3 END)"
    )


def style_part(style, tool: str) -> Column:
    return F.expr(sql_style_part(_c(style), tool))


def style_param(style, tool: str, key: str) -> Column:
    return F.expr(sql_style_param(_c(style), tool, key))


def style_param_meters(style, tool: str, key: str, scale: float = 1.0) -> Column:
    return F.expr(sql_style_param_meters(_c(style), tool, key, f"{scale:.17e}"))


def _c(col) -> str:
    return col if isinstance(col, str) else col._jc.toString()
