"""Text/dedup/similarity operator semantics on planted fixtures."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gdal_spark.operators import text as text_ops
from gdal_spark.operators.similarity import brute_force_topk, lsh_topk


@pytest.fixture(scope="module")
def planted(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = "the quick brown fox jumps over the lazy cat again and again today"
    rows = [
        (0, base),
        (1, base),  # exact dup of 0
        (2, near),  # near dup of 0
        (3, "completely different text about spark shuffles and joins here"),
        (4, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestExactDedup:
    def test_groups(self, planted):
        out = {
            r.content_hash: (r.n_dups, r.keeper_id)
            for r in text_ops.exact_dedup(planted).collect()
        }
        assert len(out) == 4  # 0/1 collapse
        assert (2, 0) in out.values()


class TestMinhash:
    def test_exact_dups_identical_signature(self, planted):
        sigs = {r.doc_id: r.sig for r in text_ops.minhash_signatures(planted).collect()}
        assert sigs[0] == sigs[1]
        assert sigs[0] != sigs[3]

    def test_lsh_finds_planted_pairs(self, planted):
        # 32 bands x 2 rows: P(candidate) = 1-(1-j^2)^32 — near-certain
        # for the planted j≈0.6 pair while random texts stay out
        pairs = {
            (r.id_a, r.id_b): r.est_jaccard
            for r in text_ops.minhash_lsh_pairs(
                planted, threshold=0.3, bands=32
            ).collect()
        }
        assert (0, 1) in pairs and pairs[(0, 1)] == 1.0
        assert (0, 2) in pairs  # near dup caught
        assert (0, 3) not in pairs and (1, 3) not in pairs

    def test_estimate_tracks_exact_jaccard(self, spark, planted):
        cand = spark.createDataFrame(
            [(0, 1), (0, 2), (0, 3)], "id_a long, id_b long"
        )
        exact = {
            (r.id_a, r.id_b): r.jaccard
            for r in text_ops.ngram_jaccard_pairs(planted, cand).collect()
        }
        assert exact[(0, 1)] == 1.0
        assert 0.3 < exact[(0, 2)] < 1.0
        assert exact[(0, 3)] == 0.0


class TestSimhashFingerprint:
    def test_simhash_properties(self, planted):
        sh = {r.doc_id: r.simhash for r in text_ops.simhash(planted).collect()}
        assert sh[0] == sh[1]
        # near dup within small hamming distance; unrelated far
        def ham(a, b):
            return bin((a ^ b) & ((1 << 64) - 1)).count("1")

        assert ham(sh[0], sh[2]) < ham(sh[0], sh[3])
        assert sh[4] == 0

    def test_fingerprint_deterministic(self, planted):
        a = {r.doc_id: r.fingerprint for r in text_ops.fingerprint(planted).collect()}
        b = {r.doc_id: r.fingerprint for r in text_ops.fingerprint(planted).collect()}
        assert a == b
        assert a[0] == a[1] != a[3]

    def test_fingerprint_matches_scalar_horner(self, planted):
        """The batch-vectorized kernel must equal the defining per-byte
        recurrence acc = (acc*131 + byte) mod 2^61-1."""
        got = {r.doc_id: r.fingerprint for r in text_ops.fingerprint(planted).collect()}
        p = (1 << 61) - 1
        for row in planted.collect():
            acc = 0
            for ch in (row.text or "").encode():
                acc = (acc * 131 + ch) % p
            assert got[row.doc_id] == acc, row.doc_id

    def test_simhash_pairs_planted(self, planted):
        pairs = {
            (r.id_a, r.id_b): r.hamming
            for r in text_ops.simhash_pairs(planted, max_hamming=10).collect()
        }
        assert pairs.get((0, 1)) == 0  # exact dups: distance 0
        assert (0, 3) not in pairs  # unrelated text stays out
        # near dup (one word changed) lands within the planted radius
        assert (0, 2) in pairs and pairs[(0, 2)] <= 10

    def test_dedup_clusters(self, spark, planted):
        pairs = spark.createDataFrame(
            [(0, 1), (1, 2)], "id_a long, id_b long"  # chain 0-1-2
        )
        out = {
            r.doc_id: r.cluster_id
            for r in text_ops.dedup_clusters(planted, pairs).collect()
        }
        assert out[0] == out[1] == out[2] == 0  # chain collapses to min id
        assert out[3] == 3 and out[4] == 4  # singletons keep themselves


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.default_rng(7)
    base = rng.standard_normal((40, 16))
    rows = [(int(i), [float(x) for x in base[i]]) for i in range(40)]
    # vec 39 := near-copy of vec 0
    rows[39] = (39, [float(x + 0.01) for x in base[0]])
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


class TestSimilarity:
    def test_brute_force_planted_neighbor(self, vectors):
        out = brute_force_topk(vectors, vectors, k=1)
        top = {r.query_id: r.neighbor_id for r in out.collect()}
        assert top[0] == 39 and top[39] == 0

    def test_lsh_recall(self, vectors):
        exact = {
            (r.query_id, r.neighbor_id)
            for r in brute_force_topk(vectors, vectors, k=3).collect()
        }
        approx = {
            (r.query_id, r.neighbor_id)
            for r in lsh_topk(
                vectors, vectors, k=3, n_planes=6, n_tables=8, dim=16
            ).collect()
        }
        recall = len(exact & approx) / len(exact)
        assert recall > 0.5, f"LSH recall too low: {recall}"

    def test_ivf_planted_neighbor_and_recall(self, spark):
        # 5 planted clusters x 8 members: IVF with enough cells + probes
        # must recover intra-cluster neighbors near-perfectly
        from gdal_spark.operators.similarity import ivf_topk

        rng = np.random.default_rng(11)
        centers = rng.standard_normal((5, 16)) * 4.0
        rows = []
        for i in range(40):
            v = centers[i % 5] + rng.standard_normal(16) * 0.05
            rows.append((int(i), [float(x) for x in v]))
        vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        exact = {
            (r.query_id, r.neighbor_id)
            for r in brute_force_topk(vecs, vecs, k=3).collect()
        }
        approx = {
            (r.query_id, r.neighbor_id)
            for r in ivf_topk(vecs, vecs, k=3, n_cells=10, n_probe=3).collect()
        }
        recall = len(exact & approx) / len(exact)
        assert recall >= 0.9, f"IVF recall too low: {recall}"
        # every query got exactly k ranked rows 1..k
        out = ivf_topk(vecs, vecs, k=3, n_cells=10, n_probe=3).toPandas()
        assert out.groupby("query_id").rnk.apply(
            lambda s: sorted(s) == [1, 2, 3]
        ).all()

    def test_quality_features(self, spark):
        df = spark.createDataFrame(
            [(1, "the cat, and a dog!")], "doc_id long, text string"
        )
        row = text_ops.with_quality(df).first()
        assert row.n_chars_q == 19
        assert row.n_tokens == 5
        assert row.n_punct == 2  # ',' and '!'
        assert row.n_stop_kinds == 3  # the, and, a


class TestMinhashLaneQuality:
    def test_candidate_pairs_are_true_near_dups(self):
        """Every banded-LSH candidate surviving the n_equal gate must be
        a genuine near-dup (true n-gram Jaccard >= 0.5).  Regression pin
        for the correlated-lane bug: linear-in-k (a_k, b_k) constants
        made one shared low-hash trigram win ALL lanes, flooding the
        pair set with J~0.01 false positives (1380 of 1633 at sf0.1)."""
        import duckdb

        from gdal_spark import registry as R

        con = duckdb.connect()
        con.sql(
            "CREATE VIEW documents AS "
            "SELECT * FROM '/root/testdata/sf0.01/documents.parquet'"
        )
        con.sql("CREATE TEMP TABLE pr AS " + R.ORACLES["minhash_md5"])
        jac = con.sql(
            """
WITH tk AS (SELECT doc_id, str_split(text,' ') AS toks FROM documents),
gg AS (SELECT doc_id, list_transform(range(1, len(toks)-1),
             i -> toks[i]||' '||toks[i+1]||' '||toks[i+2]) AS ngrams
       FROM tk WHERE len(toks) >= 3)
SELECT p.n_equal,
  CAST(len(list_intersect(list_distinct(a.ngrams), list_distinct(b.ngrams))) AS DOUBLE)
    / len(list_distinct(list_concat(a.ngrams, b.ngrams))) AS j
FROM pr p JOIN gg a ON p.id_a = a.doc_id JOIN gg b ON p.id_b = b.doc_id
"""
        ).df()
        assert len(jac) > 0
        assert (jac.j >= 0.5).all(), jac[jac.j < 0.5].head()

    def test_lane_constants_not_linear_in_k(self):
        """The multiplier sequence must not be an arithmetic progression
        (the structure behind the correlated-lane failure)."""
        from gdal_spark.operators.text import mh_lane_consts

        consts = mh_lane_consts(16)
        a_diffs = {consts[i + 1][0] - consts[i][0] for i in range(15)}
        b_diffs = {consts[i + 1][1] - consts[i][1] for i in range(15)}
        assert len(a_diffs) > 8 and len(b_diffs) > 8
