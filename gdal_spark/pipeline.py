"""``gdal vector pipeline`` surface — the unified CLI's step-chain API.

The reference chains processing steps with the ``!`` separator; the
first step must be ``read`` (or ``concat``) and the last ``write``
(apps/gdalalg_pipeline.cpp; doc/source/programs/gdal_vector_pipeline.rst
:28-31).  Each step streams features into the next
(GDALPipelineStepAlgorithm::RunStep).

Spark mapping: every step is a LAZY DataFrame transform, so the whole
pipeline assembles into ONE Catalyst plan — a ``filter`` or ``select``
written as its own step still reaches the parquet scan via pushdown /
pruning, exactly the property the reference gets from streaming steps.
No step materializes anything; ``write stream`` returns the composed
DataFrame (the VRT-style lazy terminal), ``write <path>`` sinks it.

Step vocabulary (vector):

* ``read <source> [--spat x0,y0,x1,y1]`` — corpus:docs / corpus:polydocs
  derived layers or a parquet table name; ``--spat`` is the layer-level
  envelope-intersect spatial filter (inclusive, the rect-vs-rect exact
  test, ogrlayer.cpp:2287).
* ``filter <expr>`` — attribute WHERE (gdalalg_vector_filter).
* ``select <f1,f2,...>`` — field list; geometry columns ride along
  implicitly, as in the reference (-select never drops geometry).
* ``clip x0,y0,x1,y1`` — rectangle clip of the rect geometry IN THE
  CURRENT CRS (clamp = Intersection for axis-aligned pairs); empty and
  dimension-collapsed results are dropped (strict >, the
  ogr2ogr_lib.cpp:6947 nDim rule).  Usable before or after reproject,
  like the reference's clip step.
* ``reproject EPSG:<code>`` — supported for axis-separable CRS pairs
  (geographic <-> webmercator), where the rectangle maps to the
  rectangle of its transformed corners; other kinds raise (the engine's
  full CRS dispatch lives in `epsg_transform`-style column pipelines).
* ``limit <n>`` — head-of-stream cap.
* ``write stream | <path>`` — terminal.

Geometry convention: the rect-doc envelope columns (xmin, ymin, xmax,
ymax) are canonical through every step, which is what makes the steps
freely composable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gdal_spark import corpus


def parse_pipeline(spec: str) -> list[tuple[str, list[str]]]:
    """Split a '!'-separated step chain into (step, args) tuples."""
    steps = []
    for part in spec.split("!"):
        toks = part.strip().split()
        if not toks:
            raise ValueError("empty pipeline step")
        steps.append((toks[0], toks[1:]))
    if steps[0][0] not in ("read", "concat"):
        raise ValueError("first step must be 'read' or 'concat'")
    if steps[-1][0] != "write":
        raise ValueError("last step must be 'write'")
    return steps


def _bbox(arg: str) -> tuple[str, str, str, str]:
    parts = [p.strip() for p in arg.split(",")]
    if len(parts) != 4:
        raise ValueError(f"bbox needs x0,y0,x1,y1: {arg!r}")
    return tuple(parts)  # raw SQL literal text (E-notation preserved)


GEOM_COLS = ("xmin", "ymin", "xmax", "ymax")


def _read(spark: SparkSession, sf_dir: str, args: list[str]) -> DataFrame:
    src = args[0]
    if src == "corpus:polydocs":
        df = corpus.load_polydocs(spark, sf_dir)
    elif src == "corpus:docs":
        df = corpus.load_docs(spark, sf_dir)
    else:
        df = spark.read.parquet(f"{sf_dir}/{src}.parquet")
    if "--spat" in args:
        x0, y0, x1, y1 = _bbox(args[args.index("--spat") + 1])
        df = df.where(
            f"(xmax >= {x0} AND xmin <= {x1} AND ymax >= {y0} AND ymin <= {y1})"
        )
    return df


def _clip(df: DataFrame, args: list[str]) -> DataFrame:
    x0, y0, x1, y1 = _bbox(args[0])
    others = [c for c in df.columns if c not in GEOM_COLS]
    df = df.selectExpr(
        *others,
        f"greatest(xmin, {x0}) AS xmin",
        f"greatest(ymin, {y0}) AS ymin",
        f"least(xmax, {x1}) AS xmax",
        f"least(ymax, {y1}) AS ymax",
    )
    return df.where("xmax > xmin AND ymax > ymin")


def _reproject(df: DataFrame, args: list[str]) -> DataFrame:
    from gdal_spark.geometry import epsg

    code = int(args[0].split(":")[1])
    st_min = epsg.sql_transform_stages(4326, code, x="xmin", y="ymin")
    st_max = epsg.sql_transform_stages(4326, code, x="xmax", y="ymax")
    if [c for c, _ in st_min] != ["ox", "oy"]:
        raise NotImplementedError(
            "pipeline reproject supports axis-separable targets "
            "(webmercator / geographic); use the epsg_transform column "
            "pipeline for general CRS"
        )
    others = [c for c in df.columns if c not in GEOM_COLS]
    return df.selectExpr(
        *others,
        f"{dict(st_min)['ox']} AS xmin",
        f"{dict(st_min)['oy']} AS ymin",
        f"{dict(st_max)['ox']} AS xmax",
        f"{dict(st_max)['oy']} AS ymax",
    )


# ---------------------------------------------------------------- raster
# `gdal raster pipeline` (gdal_raster_pipeline.rst:35-195) — the subset
# whose semantics are pure per-pixel filters/projections: read, clip
# (-srcwin window, coords rebased), select (band list, bands RENUMBERED
# 1..n like gdalalg_raster_select), unscale (value*scale+offset),
# scale (gdal_translate -scale linear map + Byte clamp + half-up round),
# resize (integer-factor NN: src px = opx*k + floor(k/2), exact), write.
#
# Steps compile to a list of (where | project) ops over the canonical
# (band, px, py, value) columns; ONE compiler feeds BOTH the Spark
# runner (selectExpr/where) and the DuckDB SQL renderer — shared
# expression text by construction, so the registry oracle is the same
# program the engine runs.


# GDALCopyWord float->integer conversion (gcore/gdal_priv_templates.hpp):
# NaN -> 0; signed targets shift half AWAY from zero (double->short :660,
# double->int :694 — int uses >= where short uses >, identical at v=0),
# unsigned targets shift +0.5 unconditionally (generic clamp form :465);
# then GDALClampValue to the type limits and a truncating static_cast
# (toward zero — floor for the non-negative clamped values, ceil for
# negative).  All branches are IEEE-exact shared SQL text, so the Spark
# engine and the DuckDB oracle compute identical bits.
#   name -> (lo_sql, hi_sql, signed, half_cmp)
GDAL_INT_LIMITS = {
    "byte": ("0.0e0", "2.55e2", False, None),
    "uint16": ("0.0e0", "6.5535e4", False, None),
    "int16": ("-3.2768e4", "3.2767e4", True, ">"),
    "int32": ("-2.147483648e9", "2.147483647e9", True, ">="),
}


def gdal_copyword_sql(v: str, t: str) -> str:
    """Shared-text SQL for GDALCopyWord(double -> integer type ``t``)."""
    lo, hi, signed, half_cmp = GDAL_INT_LIMITS[t]
    dv = f"CAST({v} AS DOUBLE)"
    if signed:
        w = (
            f"(CASE WHEN {dv} {half_cmp} 0.0e0 THEN {dv} + 5.0e-1"
            f" ELSE {dv} - 5.0e-1 END)"
        )
    else:
        w = f"({dv} + 5.0e-1)"
    c = f"least(greatest({w}, {lo}), {hi})"
    trunc = (
        f"(CASE WHEN {c} >= 0.0e0 THEN floor({c}) ELSE ceil({c}) END)"
        if signed
        else f"floor({c})"
    )
    return f"CAST(CASE WHEN isnan({dv}) THEN 0 ELSE {trunc} END AS BIGINT)"


def _compile_raster_steps(spec: str) -> list[tuple[str, object]]:
    from gdal_spark.geometry import mercator

    _sd = mercator.sql_double
    ident = [("band", "band"), ("px", "px"), ("py", "py"), ("value", "value")]

    def proj(**over: str) -> tuple[str, list[tuple[str, str]]]:
        return ("project", [(c, over.get(c, e)) for c, e in ident])

    ops: list[tuple[str, object]] = []
    for name, args in parse_pipeline(spec):
        if name == "read":
            if args[0] != "raster:source":
                raise ValueError("raster pipeline reads the synthetic source")
        elif name == "clip":
            x0, y0, x1, y1 = (int(v) for v in args[0].split(","))
            ops.append(
                ("where", f"px >= {x0} AND px < {x1} AND py >= {y0} AND py < {y1}")
            )
            ops.append(proj(px=f"CAST(px - {x0} AS INT)", py=f"CAST(py - {y0} AS INT)"))
        elif name == "select":
            bands = [int(b) for b in args[0].split(",")]
            if len(set(bands)) != len(bands):
                # duplicate sources (gdal_translate -b 1 -b 1 -b 1, the
                # gray→RGB expansion): one source band feeds several
                # output bands, which the renumbering CASE cannot
                # express — compile to a UNION ALL fan-out instead
                # (one branch per OUTPUT band, same shape both engines)
                ops.append(("expand", [(b, i + 1) for i, b in enumerate(bands)]))
            else:
                ops.append(("where", f"band IN ({', '.join(map(str, bands))})"))
                case = (
                    "CAST(CASE "
                    + " ".join(
                        f"WHEN band = {b} THEN {i + 1}" for i, b in enumerate(bands)
                    )
                    + " END AS INT)"
                )
                ops.append(proj(band=case))
        elif name == "unscale":
            s, o = (p.strip() for p in args[0].split(","))
            ops.append(proj(value=f"(CAST(value AS DOUBLE) * {s} + ({o}))"))
        elif name == "scale":
            smin, smax, dmin, dmax = (float(v) for v in args[0].split(","))
            sc = (dmax - dmin) / (smax - smin)
            off = dmin - smin * sc
            # +1e-8 after the half-up shift: rational scale factors land
            # the exact scaled value ON X.5 for many pixels (20k of 30k on
            # the registry fixture), where floor(x + 0.5) flips on a
            # single-ulp cross-engine drift; the achievable-value gap off
            # the ties is >= 2.5e-2 and drift <= ~2e-13, so the nudge
            # resolves every tie upward (half-up) bit-robustly.  The
            # compiler feeds both engines, so the text stays shared.
            ops.append(
                proj(
                    value=(
                        f"CAST(floor(least(greatest(CAST(value AS DOUBLE) * {_sd(sc)}"
                        f" + ({_sd(off)}), {_sd(dmin)}), {_sd(dmax)}) + 5.0e-1"
                        f" + 1.0e-8) AS INT)"
                    )
                )
            )
        elif name == "scale-exp":
            # gdal_translate -scale -exponent p / `gdal raster scale
            # --exponent` (non-linear power scaling,
            # VRTComplexSource::RasterIO vrtsources.cpp:3623-3636): ratio
            # (v-smin)/(smax-smin) CLIPPED to [0,1], raised to p, then
            # affine to [dmin,dmax] — the output needs no clamp because
            # r^p stays in [0,1].  p must be a small positive INTEGER
            # here: libm pow() differs by 1 ulp across engines, so the
            # compiler unrolls r^p as repeated multiplication of the
            # identical subexpression — exact IEEE, bit-identical both
            # sides; the half-up round + tie nudge then matches the
            # linear scale step above.
            smin, smax, dmin, dmax, p = (float(v) for v in args[0].split(","))
            ip = int(p)
            if ip != p or not (1 <= ip <= 8):
                raise ValueError("scale-exp exponent must be an integer in 1..8")
            r = (
                f"least(greatest((CAST(value AS DOUBLE) - {_sd(smin)})"
                f" / {_sd(smax - smin)}, 0.0e0), 1.0e0)"
            )
            powed = "(" + " * ".join([r] * ip) + ")"
            ops.append(
                proj(
                    value=(
                        f"CAST(floor({_sd(dmax - dmin)} * {powed}"
                        f" + ({_sd(dmin)}) + 5.0e-1 + 1.0e-8) AS INT)"
                    )
                )
            )
        elif name == "resize-avg":
            # gdal_translate -outsize 1/k -r average: k x k block mean,
            # floor(mean + 0.5) (the proven overview-average rounding,
            # gcore/overview.cpp GDALResampleChunk32R_Average); partial
            # edge blocks average their ACTUAL contributors (count, not
            # k²) like the reference.  An aggregating op — the only
            # non-projection step kind.
            ops.append(("agg-resize", int(args[0])))
        elif name == "resize":
            k = int(args[0])
            h = k // 2
            ops.append(("where", f"(px - {h}) % {k} = 0 AND (py - {h}) % {k} = 0"))
            ops.append(
                proj(
                    px=f"CAST(floor((px - {h}) / {k}) AS INT)",
                    py=f"CAST(floor((py - {h}) / {k}) AS INT)",
                )
            )
        elif name == "calc":
            # gdal raster calc (gdalalg_raster_calc.cpp / gdal_calc.py):
            # per-pixel expression over the band value; raw SQL text
            # shared verbatim with the oracle
            ops.append(proj(value=f"({' '.join(args)})"))
        elif name == "set-type":
            # gdal raster set-type (gdalalg_raster_set_type.cpp — a
            # GDALTranslate -ot VRT): GDAL type names route through the
            # faithful GDALCopyWord float->int program (round half away
            # from zero + clamp + NaN->0, gcore/gdal_priv_templates.hpp);
            # the legacy raw-SQL-type spelling stays a plain CAST (used
            # by specs whose value is already integral).
            t = args[0].lower()
            if t in GDAL_INT_LIMITS:
                ops.append(proj(value=gdal_copyword_sql("value", t)))
            else:
                ops.append(proj(value=f"CAST(value AS {args[0].upper()})"))
        elif name == "write":
            if args[0] != "stream":
                raise ValueError("raster pipeline terminal is 'write stream'")
        else:
            raise ValueError(f"unknown raster pipeline step {name!r}")
    return ops


def run_raster_pipeline(spark: SparkSession, spec: str) -> DataFrame:
    """Assemble the raster step chain into one lazy plan."""
    from gdal_spark.operators.raster import source_grid

    df = source_grid(spark)
    for kind, payload in _compile_raster_steps(spec):
        if kind == "where":
            df = df.where(payload)
        elif kind == "agg-resize":
            k = payload
            df = (
                df.groupBy(
                    F.col("band"),
                    F.expr(f"CAST(floor(px / {k}.0e0) AS INT)").alias("px"),
                    F.expr(f"CAST(floor(py / {k}.0e0) AS INT)").alias("py"),
                )
                .agg(
                    F.expr(
                        "CAST(floor(CAST(sum(value) AS DOUBLE)"
                        " / CAST(count(value) AS DOUBLE) + 5.0e-1) AS INT)"
                    ).alias("value")
                )
                .select("band", "px", "py", "value")
            )
        elif kind == "expand":
            from functools import reduce

            branches = [
                df.where(f"band = {src}").selectExpr(
                    f"CAST({out} AS INT) AS band", "px", "py", "value"
                )
                for src, out in payload
            ]
            df = reduce(lambda a, b: a.unionByName(b), branches)
        else:
            df = df.selectExpr(*[f"{e} AS {c}" for c, e in payload])
    return df


def render_raster_pipeline_sql(spec: str, src_select: str) -> str:
    """The SAME compiled ops rendered as nested ANSI SQL (the oracle)."""
    sql = src_select
    for kind, payload in _compile_raster_steps(spec):
        if kind == "where":
            sql = f"SELECT * FROM ({sql}) q WHERE {payload}"
        elif kind == "agg-resize":
            k = payload
            sql = (
                f"SELECT band, CAST(floor(px / {k}.0e0) AS INT) AS px,"
                f" CAST(floor(py / {k}.0e0) AS INT) AS py,"
                f" CAST(floor(CAST(sum(value) AS DOUBLE)"
                f" / CAST(count(value) AS DOUBLE) + 5.0e-1) AS INT) AS value"
                f" FROM ({sql}) q GROUP BY 1, 2, 3"
            )
        elif kind == "expand":
            sql = " UNION ALL ".join(
                f"SELECT CAST({out} AS INT) AS band, px, py, value"
                f" FROM ({sql}) e{i} WHERE band = {src}"
                for i, (src, out) in enumerate(payload)
            )
        else:
            cols = ", ".join(f"{e} AS {c}" for c, e in payload)
            sql = f"SELECT {cols} FROM ({sql}) q"
    return sql


# ----------------------------------------------------------------- mixed
# `gdal pipeline` proper (apps/gdalalg_pipeline.cpp; gdal_pipeline.rst)
# exists to MIX vector and raster steps in one chain.  The bridge step
# here is `rasterize <zoom>` (gdal_vector_rasterize / gdalalg_vector
# rasterize): a vector layer burns into the canonical raster columns
# (band, px, py, value) — global north-up pixel coords at the given
# mercator zoom, burn value = zone_id % 255 + 1, REPLACE merge — and
# every raster step can then continue the chain.


def run_mixed_pipeline(spark: SparkSession, spec: str) -> DataFrame:
    """read <vector layer> ! rasterize <zoom> ! <raster steps> ! write."""
    from gdal_spark import zones
    from gdal_spark.operators.rasterize import rasterize_values

    steps = parse_pipeline(spec)
    if [s[0] for s in steps[:2]] != ["read", "rasterize"]:
        raise ValueError("mixed pipeline starts 'read <layer> ! rasterize <zoom>'")
    if steps[0][1][0] != "zones:rect":
        raise ValueError("mixed pipeline reads the rect zone layer")
    zoom = int(steps[1][1][0])
    z = zones.rect_zones(spark).select("zone_id", "geom_wkt")
    r = rasterize_values(z, zoom)
    side = (1 << zoom) * 256
    df = r.selectExpr(
        "CAST(1 AS INT) AS band",
        "CAST(tx * 256 + ci AS INT) AS px",
        f"CAST({side - 1} - (ty * 256 + rj) AS INT) AS py",
        "CAST(burn AS INT) AS value",
    )
    suffix = " ! ".join(
        " ".join([n, *a]) for n, a in [("read", ["raster:source"])] + steps[2:]
    )
    for kind, payload in _compile_raster_steps(suffix):
        if kind == "where":
            df = df.where(payload)
        else:
            df = df.selectExpr(*[f"{e} AS {c}" for c, e in payload])
    return df


def render_mixed_pipeline_sql(spec: str, burn_px_select: str) -> str:
    """Oracle twin: the rasterized-pixel SQL feeds the SAME raster-step
    renderer the engine's op compiler produces."""
    steps = parse_pipeline(spec)
    suffix = " ! ".join(
        " ".join([n, *a]) for n, a in [("read", ["raster:source"])] + steps[2:]
    )
    return render_raster_pipeline_sql(suffix, burn_px_select)


# The REVERSE bridge — raster -> vector via `polygonize`
# (gdal raster polygonize / gdalalg_raster_polygonize.cpp): connected
# components of the pixel grid become vector features (label, value,
# n_pixels, pixel-space envelope), and the vector steps (filter /
# select / limit) continue the chain.


def run_raster_vector_pipeline(
    spark: SparkSession, spec: str, px_df: DataFrame, w: int, h: int
) -> DataFrame:
    """read <raster> ! polygonize ! <vector steps> ! write."""
    from gdal_spark.operators.polygonize import polygonize

    steps = parse_pipeline(spec)
    if [s[0] for s in steps[:2]] != ["read", "polygonize"]:
        raise ValueError("reverse bridge starts 'read <raster> ! polygonize'")
    df = polygonize(px_df, w, h)
    for name, args in steps[2:]:
        if name == "filter":
            df = df.where(" ".join(args))
        elif name == "select":
            df = df.select(*[f.strip() for f in args[0].split(",")])
        elif name == "limit":
            df = df.limit(int(args[0]))
        elif name == "write":
            if args[0] != "stream":
                df.write.mode("overwrite").parquet(args[0])
            return df
        else:
            raise ValueError(f"unknown post-polygonize step {name!r}")
    raise AssertionError("unreachable: parse enforces a write terminal")


def run_vector_pipeline(spark: SparkSession, sf_dir: str, spec: str) -> DataFrame:
    """Assemble the step chain into one lazy plan and run the terminal."""
    df: DataFrame | None = None
    for name, args in parse_pipeline(spec):
        if name == "read":
            df = _read(spark, sf_dir, args)
        elif name == "filter":
            df = df.where(" ".join(args))
        elif name == "select":
            fields = [f.strip() for f in args[0].split(",")]
            geom = [c for c in GEOM_COLS if c in df.columns]
            df = df.select(*fields, *geom)
        elif name == "clip":
            df = _clip(df, args)
        elif name == "reproject":
            df = _reproject(df, args)
        elif name == "limit":
            df = df.limit(int(args[0]))
        elif name == "write":
            if args[0] != "stream":
                df.write.mode("overwrite").parquet(args[0])
            return df
        else:
            raise ValueError(f"unknown pipeline step {name!r}")
    raise AssertionError("unreachable: parse enforces a write terminal")
