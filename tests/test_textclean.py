"""Semantic pins for the round-4 training-data additions, all engine-free
(pure Python + DuckDB): independent recomputes for substring_dedup /
repeat_removal, the count-min guarantees, and the weighted-sample ln
knife-edge audit.  Spark<->oracle equality itself is covered by the
auto-parametrized contract test."""

import hashlib
import math
import os

import duckdb
import pyarrow.parquet as pq
import pytest

from gdal_spark.registry import ORACLES, _SSD_K, _CMS_W

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    return c


@pytest.fixture(scope="module")
def docs():
    t = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text", "n_chars"])
    return list(zip(t["doc_id"].to_pylist(), t["text"].to_pylist(), t["n_chars"].to_pylist()))


def _clean(words, flagged_starts, k):
    cov = set()
    for st in flagged_starts:
        cov.update(range(st, st + k))
    kept = [w for i, w in enumerate(words, start=1) if i not in cov]
    return len(words), len(words) - len(kept), " ".join(kept)


def test_substring_dedup_matches_python_recompute(con, docs):
    """Third implementation: plain-Python ExactSubstr (gram dict ->
    keeper rule -> coverage cut) reproduces the oracle on every doc."""
    grams = {}
    words = {d: t.split(" ") for d, t, _ in docs}
    for d, w in words.items():
        for st in range(1, len(w) - _SSD_K + 2):
            g = " ".join(w[st - 1 : st - 1 + _SSD_K])
            grams.setdefault(g, []).append((d, st))
    expected = {}
    flagged = {d: [] for d in words}
    for g, occs in grams.items():
        ds = {d for d, _ in occs}
        if len(ds) > 1:
            keeper = min(ds)
            for d, st in occs:
                if d != keeper:
                    flagged[d].append(st)
    for d, w in words.items():
        expected[d] = _clean(w, flagged[d], _SSD_K)
    rows = con.execute(ORACLES["substring_dedup"]).fetchall()
    assert len(rows) == len(docs)
    n_cut_docs = 0
    for doc_id, n_words, n_removed, cleaned in rows:
        assert (n_words, n_removed, cleaned) == expected[doc_id], doc_id
        n_cut_docs += n_removed > 0
    assert n_cut_docs > 0, "fixture vacuous: no cross-doc duplicated grams"


def test_repeat_removal_matches_python_recompute(con, docs):
    """Plain-Python within-doc repeat cut (first occurrence survives)
    reproduces the oracle; the %7 plant makes the path non-vacuous."""
    rows = con.execute(ORACLES["repeat_removal"]).fetchall()
    got = {r[0]: r[1:] for r in rows}
    planted_cut = 0
    for doc_id, text, _ in docs:
        w = text.split(" ")
        if doc_id % 7 == 0:
            w = w + w[:8]
        seen = {}
        flagged = []
        for st in range(1, len(w) - _SSD_K + 2):
            g = " ".join(w[st - 1 : st - 1 + _SSD_K])
            if g in seen:
                flagged.append(st)
            else:
                seen[g] = st
        exp = _clean(w, flagged, _SSD_K)
        assert got[doc_id] == exp, doc_id
        if doc_id % 7 == 0 and exp[1] > 0:
            planted_cut += 1
    assert planted_cut > 0, "plant vacuous: no planted doc lost a span"


def test_cms_guarantees(con):
    """Count-min invariants over the FULL bigram vocabulary (not just
    the top-10 the query emits): estimate >= exact always, estimate
    never exceeds the stream size, and the fixture genuinely collides
    (otherwise the sketch degenerates to a lookup table)."""
    q = ORACLES["heavy_hitters"].replace("LIMIT 10", "LIMIT 1000000")
    rows = con.execute(q).fetchall()
    n_stream = con.execute(
        "SELECT SUM(len(string_split(text,' ')) - 1) FROM documents"
    ).fetchone()[0]
    assert all(o >= 0 for _, _, _, o in rows)
    assert all(cms <= n_stream for _, _, cms, _ in rows)
    assert max(o for _, _, _, o in rows) > 0, "no collision: widen the fixture"
    # every counter row's total mass equals the stream size (the
    # mergeable-sum structure; holds per row of the d x w grid)
    per_row = con.execute(f"""
        WITH s AS (SELECT string_split(text,' ') AS w FROM documents),
        words AS (SELECT array_to_string(list_slice(w, st, st + 1), ' ') AS word
                  FROM (SELECT w, unnest(generate_series(1, len(w) - 1)) AS st
                        FROM s WHERE len(w) >= 2)),
        cnt AS (SELECT word, COUNT(*) AS c FROM words GROUP BY word),
        wh AS (SELECT c, j,
                      CAST(('0x' || substring(md5(word || '#' || CAST(j AS VARCHAR)), 1, 7))::BIGINT AS BIGINT) % {_CMS_W} AS bucket
               FROM cnt, range(0, 4) t(j))
        SELECT j, CAST(SUM(c) AS BIGINT) FROM wh GROUP BY j
    """).fetchall()
    assert all(tot == n_stream for _, tot in per_row)


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01", "sf0.1"])
def test_weighted_sample_ln_grid_audit(sf):
    """Knife-edge audit for the ES race key: -ln(u)*1e6 must sit far
    from the BIGINT quantization grid at every scale the driver or
    bench touches.  Cross-engine ln drift is ~1 ulp (~4e-9 micro-units
    here); we require >= 1e-5 margin — 4 orders of magnitude."""
    t = pq.read_table(f"/root/testdata/{sf}/documents.parquet", columns=["doc_id"])
    worst = 1.0
    for doc_id in t["doc_id"].to_pylist():
        hv = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:13], 16)
        u = (2 * hv + 1) / 9007199254740992.0
        x = -math.log(u) * 1.0e6
        worst = min(worst, abs(x - round(x)))
    assert worst >= 1e-5, worst


def test_weighted_sample_race_is_weighted(con):
    """Statistical sanity: the sampled docs' mean weight must exceed
    the corpus mean (selection probability rises with n_chars) — a
    deterministic fixture fact, not a flaky statistical test."""
    sel = con.execute(
        f"SELECT AVG(weight) FROM ({ORACLES['weighted_sample']})"
    ).fetchone()[0]
    allm = con.execute("SELECT AVG(n_chars) FROM documents").fetchone()[0]
    assert sel > allm


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01", "sf0.1"])
def test_lang_entropy_ln_grid_audit(sf):
    """Knife-edge audit for the per-(source, lang) entropy term: the
    micro-nat quantization must sit far from the integer grid at every
    scale (p == 1 terms are exactly 0 by ln(1) == 0 and excluded)."""
    t = pq.read_table(
        f"/root/testdata/{sf}/documents.parquet", columns=["source", "lang"]
    ).to_pandas()
    worst = 1.0
    for _, grp in t.groupby("source"):
        n = len(grp)
        for c in grp["lang"].value_counts():
            if c == n:
                continue
            x = -1e6 * (c / n) * math.log(c / n)
            worst = min(worst, abs(x - round(x)))
    assert worst >= 1e-4, worst


def test_bpe_encode_word_semantics():
    """Hand-derived pins for the merge program: cascades (p+a then
    pa+r; e+r then m+er), rank priority, and leftmost-first."""
    from gdal_spark.operators.bpe import encode_word

    assert encode_word("part") == ["par", "t"]          # p+a, pa+r cascade
    assert encode_word("merge") == ["mer", "g", "e"]    # e+r then m+er
    assert encode_word("order") == ["or", "d", "er"]    # two disjoint merges
    assert encode_word("scan") == ["sca", "n"]          # s+c, sc+a cascade
    assert encode_word("stream") == ["st", "r", "e", "a", "m"]
    assert encode_word("error") == ["er", "r", "or"]    # leftmost e+r first
    assert encode_word("a") == ["a"]                    # no pair, unchanged


def test_bpe_oracle_matches_python_recompute(con, docs):
    """The DuckDB recursive-CTE program and the Python apply loop are
    independent implementations; they must agree on every doc."""
    from gdal_spark.operators.bpe import encode_word

    rows = con.execute(ORACLES["bpe_encode"]).fetchall()
    got = {r[0]: r[1:] for r in rows}
    for doc_id, text, _ in docs:
        ws = text.split(" ")
        toks = [encode_word(w) for w in ws]
        exp = (len(ws), sum(len(t) for t in toks), "|".join(toks[0]))
        assert got[doc_id] == exp, doc_id


def test_bpe_train_matches_python_learner(con, docs):
    """Plain-Python BPE learner with the query's exact semantics
    (corpus-weighted pair counts, l != r candidates only, ties to the
    lexicographically smallest pair, simultaneous disjoint merge)
    reproduces all emitted merge rows."""
    from collections import Counter

    freq = Counter()
    for _, text, _ in docs:
        freq.update(text.split(" "))
    toks = {w: list(w) for w in freq}
    expected = []
    for rank in range(6):
        pc = Counter()
        for w, t in toks.items():
            for i in range(len(t) - 1):
                if t[i] != t[i + 1]:
                    pc[(t[i], t[i + 1])] += freq[w]
        (left, right), cnt = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        expected.append((rank, left, right, cnt))
        for w, t in toks.items():
            nt, i = [], 0
            while i < len(t):
                if i + 1 < len(t) and t[i] == left and t[i + 1] == right:
                    nt.append(left + right)
                    i += 2
                else:
                    nt.append(t[i])
                    i += 1
            toks[w] = nt
    rows = sorted(con.execute(ORACLES["bpe_train"]).fetchall())
    assert rows == expected
