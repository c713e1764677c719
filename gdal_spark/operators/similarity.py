"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — the target matrix is a dim table
(like the reference's in-memory point quadtree in gdalgrid.cpp), shipped
once per executor inside a mapInPandas closure; queries stream through
in Arrow batches and the scoring is one f64 GEMM per batch.  Zero
shuffle, partition-parallel.

Scale path: LSH-bucketed variant — random-hyperplane signatures bucket
both sides, candidates meet in an equi-join on (plane-prefix bucket),
exact cosine re-scored only within buckets.  Trades recall for a join
whose cost is data-proportional instead of N x M.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)


def _matrix(df: DataFrame, id_col: str, vec_col: str):
    pdf = df.select(id_col, vec_col).toPandas()
    ids = pdf[id_col].to_numpy(np.int64)
    mat = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    return ids, mat / norms[:, None]


def brute_force_topk(
    queries: DataFrame,
    targets: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """(query id, neighbor id, rnk) — exact cosine top-k; ties by min
    neighbor id."""
    tids, tmat = _matrix(targets, id_col, vec_col)
    schema = StructType(
        [
            StructField("query_id", LongType()),
            StructField("neighbor_id", LongType()),
            StructField("rnk", IntegerType()),
            StructField("cosine", DoubleType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            qids = pdf[id_col].to_numpy(np.int64)
            qmat = np.stack([np.asarray(v, np.float64) for v in pdf[vec_col]])
            qn = np.linalg.norm(qmat, axis=1)
            qn[qn == 0] = 1.0
            sims = (qmat / qn[:, None]) @ tmat.T  # (B, N)
            if exclude_self:
                self_mask = qids[:, None] == tids[None, :]
                sims = np.where(self_mask, -np.inf, sims)
            order = np.lexsort((tids[None, :].repeat(len(qids), 0), -sims), axis=1)[
                :, :k
            ]
            topk_sims = np.take_along_axis(sims, order, axis=1)
            out = pd.DataFrame(
                {
                    "query_id": np.repeat(qids, k),
                    "neighbor_id": tids[order].ravel(),
                    "rnk": np.tile(np.arange(1, k + 1, dtype=np.int32), len(qids)),
                    "cosine": topk_sims.ravel(),
                }
            )
            yield out

    return queries.select(id_col, vec_col).mapInPandas(kernel, schema)


def _det_proj_sql(table_expr: str, plane: int, dim: int) -> str:
    """SQL text of the plane projection Σ_d emb[d]·s(t,p,d) with the
    DETERMINISTIC ±1 sign formula — valid in Spark SQL and DuckDB
    (modulo summation order, which only matters within ~1e-12 of zero)."""
    sign = (
        f"(CASE WHEN ((({table_expr}) * 73856093L + {plane} * 19349663L"
        f" + CAST(d AS BIGINT) * 83492791L) % 97) % 2 = 0"
        f" THEN 1.0e0 ELSE (0.0e0 - 1.0e0) END)"
    )
    return (
        f"aggregate(sequence(1, {dim}), CAST(0.0e0 AS DOUBLE), "
        f"(acc, d) -> acc + CAST(element_at(embedding, d) AS DOUBLE) * {sign})"
    )


def lsh_topk_det(
    queries: DataFrame,
    targets: DataFrame,
    k: int = 3,
    n_planes: int = 8,
    n_tables: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k with DETERMINISTIC ±1 hyperplanes (integer-hash signs),
    signatures computed JVM-side (whole-stage codegen) — the oracle-
    checkable twin of :func:`lsh_topk` (whose planes come from an RNG).
    Same plan shape: bucket equi-join per table, exact re-score, window
    top-k."""

    def signer(df: DataFrame, out_id: str) -> DataFrame:
        e = df.select(F.col(id_col).alias(out_id), F.col(vec_col).alias("embedding"))
        rows = []
        for t in range(n_tables):
            bucket = " + ".join(
                f"(CASE WHEN {_det_proj_sql(str(t), p, dim)} > 0.0e0 THEN {1 << p} ELSE 0 END)"
                for p in range(n_planes)
            )
            rows.append(
                e.select(
                    out_id,
                    F.lit(t).alias("tbl"),
                    F.expr(f"CAST({bucket} AS INT)").alias("bucket"),
                )
            )
        out = rows[0]
        for r in rows[1:]:
            out = out.unionByName(r)
        return out

    qs = signer(queries, "query_id")
    ts = signer(targets, "neighbor_id")
    cand = (
        qs.join(ts, ["tbl", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .dropDuplicates()
    )
    qv = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    tv = targets.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("tv"))
    scored = cand.join(qv, "query_id").join(tv, "neighbor_id")
    dot = F.aggregate(
        F.zip_with("qv", "tv", lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(F.transform(c, lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
    )
    scored = scored.withColumn("cosine", dot / (norm(F.col("qv")) * norm(F.col("tv"))))
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", F.col("rnk").cast("int").alias("rnk"))
    )


def lsh_topk(
    queries: DataFrame,
    targets: DataFrame,
    k: int = 3,
    n_planes: int = 8,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Approximate cosine top-k: random-hyperplane LSH bucket join, exact
    re-score inside buckets. Recall < 1 by design (graded in tests).

    Pass ``dim`` explicitly on big inputs — the fallback sniff is a
    driver action (a .first() job) purely to learn the vector width."""
    if dim is None:
        dim = len(queries.select(vec_col).first()[0])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables, n_planes, dim))

    sig_schema = StructType(
        [
            StructField("id", LongType()),
            StructField("table", IntegerType()),
            StructField("bucket", LongType()),
        ]
    )

    def signer(df: DataFrame) -> DataFrame:
        def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                ids = pdf[id_col].to_numpy(np.int64)
                mat = np.stack([np.asarray(v, np.float64) for v in pdf[vec_col]])
                rows = []
                for t in range(n_tables):
                    bits = (mat @ planes[t].T) > 0  # (B, n_planes)
                    bucket = (
                        bits.astype(np.int64) * (1 << np.arange(n_planes))
                    ).sum(axis=1)
                    rows.append(
                        pd.DataFrame(
                            {"id": ids, "table": np.int32(t), "bucket": bucket}
                        )
                    )
                yield pd.concat(rows)

        return df.select(id_col, vec_col).mapInPandas(kernel, sig_schema)

    qs = signer(queries).withColumnsRenamed({"id": "query_id"})
    ts = signer(targets).withColumnsRenamed({"id": "neighbor_id"})
    cand = (
        qs.join(ts, ["table", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .dropDuplicates()
    )
    # exact re-score of candidates
    qv = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    tv = targets.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("tv"))
    scored = cand.join(qv, "query_id").join(tv, "neighbor_id")

    dot = F.aggregate(
        F.zip_with("qv", "tv", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(F.transform(c, lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
    )
    scored = scored.withColumn("cosine", dot / (norm(F.col("qv")) * norm(F.col("tv"))))
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", F.col("rnk").cast("int").alias("rnk"), "cosine")
    )


def _sql_dot(a: str, b: str) -> str:
    """Sequential left-fold dot product — same element order in Spark and
    (via list_transform/list_sum) DuckDB, so sums agree to the ulp."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE)"
        " * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (s, v) -> s + v)"
    )


def ivf_topk(
    queries: DataFrame,
    targets: DataFrame,
    k: int = 3,
    n_cells: int = 16,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF (inverted-file) ANN — the coarse-quantizer scale path next to
    the LSH variant.

    The codebook is the ``n_cells`` lowest-id target vectors (a
    deterministic coarse quantizer — no RNG, so a DuckDB oracle can
    reproduce the whole pipeline).  The codebook rides to executors as a
    single broadcast array column; cell assignment is a pure JVM
    ``transform``+``array_sort`` over that array — ZERO shuffle on
    either side's assignment, exactly the shape a 100 TB IVF needs
    (codebook broadcast, map-side assign).  Queries probe their
    ``n_probe`` nearest cells; candidates meet in ONE data-proportional
    equi-join on cell id.  Unlike banded LSH there is no dedup shuffle:
    each target lives in exactly one cell, so every (query, neighbor)
    candidate is generated exactly once.  Exact cosine re-score runs
    JVM-side, window top-k per query.

    Reference analog: the gdalgrid quadtree-bucketed nearest search
    (alg/gdalgridapi.h, search bounded to candidate cells) re-expressed
    as a declarative cell equi-join."""
    nrm = f"sqrt({_sql_dot(vec_col, vec_col)})"
    cents = (
        targets.orderBy(id_col)
        .limit(n_cells)
        .select(
            F.expr(
                f"named_struct('cid', CAST({id_col} AS BIGINT), 'nrm', {nrm},"
                f" 'emb', transform({vec_col}, x -> CAST(x AS DOUBLE)))"
            ).alias("c")
        )
        .agg(F.expr("array_sort(collect_list(c))").alias("cents"))
    )
    # per-row (cid, cos) over the codebook; comparator sorts by
    # (cos DESC, cid ASC) so ties take the lowest centroid id
    ccos = (
        "transform(cents, c -> named_struct('cid', c.cid, 'cos', "
        + _sql_dot(vec_col, "c.emb")
        + " / (vnrm * c.nrm)))"
    )
    ranked = (
        f"array_sort({ccos}, (l, r) -> CASE"
        " WHEN l.cos > r.cos THEN -1 WHEN l.cos < r.cos THEN 1"
        " WHEN l.cid < r.cid THEN -1 WHEN l.cid > r.cid THEN 1 ELSE 0 END)"
    )

    def assign(df: DataFrame, out_id: str, n: int) -> DataFrame:
        return (
            df.crossJoin(F.broadcast(cents))
            .withColumn("vnrm", F.expr(nrm))
            .select(
                F.col(id_col).alias(out_id),
                F.col(vec_col).alias(f"{out_id[0]}v"),
                F.col("vnrm").alias(f"{out_id[0]}n"),
                F.explode(F.expr(f"transform(slice({ranked}, 1, {n}), c -> c.cid)")).alias(
                    "cell"
                ),
            )
        )

    qs = assign(queries, "query_id", n_probe)
    ts = assign(targets, "neighbor_id", 1)
    scored = (
        qs.join(ts, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine",
            F.expr(_sql_dot("qv", "nv")) / (F.col("qn") * F.col("nn")),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", F.col("rnk").cast("int").alias("rnk"))
    )


def cosine_pairs(
    emb: DataFrame,
    tau: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """EXACT embedding-cosine near-dup pairs (id_a < id_b, cos >= tau)
    with a LOSSLESS grid prefilter — the scale shape for threshold
    dedup over an embedding column:

      cos(x, y) >= tau  =>  ||x_hat - y_hat|| <= sqrt(2(1-tau)) =: delta
      =>  |x_hat[0] - y_hat[0]| <= delta,

    so bucketing the normalized first coordinate at width delta and
    joining each vector's {b-1, b, b+1} buckets against the other
    side's home bucket cannot miss a qualifying pair (each candidate
    pair is generated exactly once).  Exact cosine re-score runs
    JVM-side (zip_with/aggregate fold over DOUBLE-cast elements) — no
    Python anywhere.  At aggressive thresholds (0.9+) delta shrinks to
    ~0.45 and the prefilter prunes hard; brute force remains O(N^2)
    only inside a bucket neighborhood."""
    import math

    delta = math.sqrt(2.0 * (1.0 - tau))
    dot_self = (
        f"aggregate(zip_with({vec_col}, {vec_col},"
        " (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
        " CAST(0.0 AS DOUBLE), (a, v) -> a + v)"
    )
    e = emb.select(
        F.col(id_col), F.col(vec_col), F.expr(f"sqrt({dot_self})").alias("nrm")
    ).withColumn(
        "b0",
        F.expr(
            f"CAST(floor((CAST(element_at({vec_col}, 1) AS DOUBLE) / nrm)"
            f" / {delta!r}) AS BIGINT)"
        ),
    )
    a = e.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"),
        F.col("nrm").alias("na"),
        F.explode(
            F.array(F.col("b0") - 1, F.col("b0"), F.col("b0") + 1)
        ).alias("jb"),
    )
    b = e.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"),
        F.col("nrm").alias("nb"), F.col("b0").alias("bb"),
    )
    cos = F.expr(
        "aggregate(zip_with(va, vb, (x, y) -> CAST(x AS DOUBLE)"
        " * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (a, v) -> a + v)"
    ) / (F.col("na") * F.col("nb"))
    return (
        a.join(b, (a.jb == b.bb) & (a.id_a < b.id_b))
        .withColumn("cos", cos)
        .filter(F.col("cos") >= tau)
        .select(
            "id_a", "id_b",
            F.expr("CAST(floor(cos * 1.0e6) AS BIGINT)").alias("cos6"),
        )
    )
