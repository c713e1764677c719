"""Round-4h additions: independent cross-implementation pins.

Spark == DuckDB parity for every query here is covered by the
auto-parametrized tests/test_driver_contract.py; these tests add a THIRD
implementation (plain Python / numpy ports of the reference semantics)
against the DuckDB oracle, plus branch-non-vacuity pins so none of the
fixture branches can silently go dead.  Pure-Python + DuckDB only — no
Spark session, so the file stays cheap.
"""

import math
from fractions import Fraction

import duckdb
import pytest

from gdal_spark import registry

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    return c


def _docs(con):
    return con.execute(
        "SELECT doc_id, text, lang, source, n_chars FROM documents"
    ).fetchall()


# ------------------------------------------------------------- set-type
def _copyword(v, lo, hi, signed, half_ge):
    """Direct port of sGDALCopyWord<double, T>
    (gcore/gdal_priv_templates.hpp:443-710)."""
    if math.isnan(v):
        return 0
    if signed:
        w = v + 0.5 if (v >= 0.0 if half_ge else v > 0.0) else v - 0.5
    else:
        w = v + 0.5
    c = min(max(w, lo), hi)
    return int(c)  # C truncating cast (toward zero)


def _stt_value(doc_id):
    if doc_id % 23 == 0:
        return float("nan")
    base = (doc_id * 53) % 1300 - 400 + (doc_id % 4) * 0.25
    return base * (100.0 if doc_id % 17 == 0 else 1.0)


class TestSetType:
    def test_matches_numpy_port(self, con):
        got = {
            r[0]: r[1:]
            for r in con.execute(registry.ORACLES["raster_set_type"]).fetchall()
        }
        for (doc_id, *_rest) in _docs(con):
            v = _stt_value(doc_id)
            iv = (doc_id * 53) % 1300 - 400
            exp = (
                _copyword(v, 0.0, 255.0, False, False),
                _copyword(v, 0.0, 65535.0, False, False),
                _copyword(v, -32768.0, 32767.0, True, False),
                _copyword(v, -2147483648.0, 2147483647.0, True, True),
                min(max(iv, 0), 255),
            )
            assert got[doc_id] == exp, doc_id

    def test_branches_fire(self, con):
        vals = [_stt_value(d) for (d, *_r) in _docs(con)]
        assert any(math.isnan(v) for v in vals)  # NaN -> 0
        assert any(v > 255 for v in vals if not math.isnan(v))  # byte clamp hi
        assert any(v < 0 for v in vals if not math.isnan(v))  # byte clamp lo
        assert any(v > 32767 for v in vals if not math.isnan(v))  # i16 hi
        assert any(v < -32768 for v in vals if not math.isnan(v))  # i16 lo
        # exact .5 halves (the away-from-zero branch does real work)
        assert any(
            not math.isnan(v) and abs(v - math.floor(v) - 0.5) < 1e-12
            for v in vals
        )
        assert any(
            not math.isnan(v) and v < 0 and abs(v - math.floor(v) - 0.5) < 1e-12
            for v in vals
        )

    def test_pipeline_settype_clamps(self, con):
        rows = con.execute(
            registry.ORACLES["raster_pipeline_settype"]
        ).fetchall()
        vals = [r[3] for r in rows]
        # unscale leaves [-20, 43.75]: clamp-at-0 and round-up both fire
        assert min(vals) == 0 and max(vals) == 44
        assert sum(1 for v in vals if v == 0) > 1000


# ------------------------------------------------------ paragraph dedup
class TestParagraphDedup:
    def test_matches_python(self, con):
        got = {
            r[0]: r[1:]
            for r in con.execute(registry.ORACLES["paragraph_dedup"]).fetchall()
        }
        seen = set()
        exp = {}
        for doc_id, text, *_r in sorted(_docs(con)):
            if doc_id % 7 < 2:
                text = registry._PD_BOILER + " " + text
            w = text.split(" ")
            paras = [
                " ".join(w[k : k + registry._PD_P])
                for k in range(0, len(w), registry._PD_P)
            ]
            kept = []
            for p in paras:
                if p not in seen:
                    seen.add(p)
                    kept.append(p)
            exp[doc_id] = (
                len(paras),
                len(kept),
                " ".join(kept) if kept else None,
            )
        assert got == exp

    def test_boilerplate_dedups(self, con):
        rows = con.execute(registry.ORACLES["paragraph_dedup"]).fetchall()
        planted = [r for r in rows if r[0] % 7 < 2]
        assert len(planted) > 100
        # exactly ONE planted doc keeps the boilerplate paragraph
        removed = [r for r in planted if r[2] < r[1]]
        assert len(removed) == len(planted) - 1


# ----------------------------------------------------- language sampling
def _lang_sizes(con):
    return dict(
        con.execute(
            "SELECT lang, SUM(n_chars) FROM documents GROUP BY lang"
        ).fetchall()
    )


class TestUniMax:
    def test_matches_greedy(self, con):
        sizes = _lang_sizes(con)
        caps = {l: (s * 8) // 5 for l, s in sizes.items()}
        budget = sum(sizes.values()) * 5 // 4
        # the paper's sequential greedy, exact rational arithmetic
        order = sorted(caps, key=lambda l: (caps[l], l))
        rem, n = Fraction(budget), len(order)
        alloc = {}
        for i, lang in enumerate(order):
            share = rem / (n - i)
            a = min(Fraction(caps[lang]), share)
            alloc[lang] = a
            rem -= a
        got = {
            r[0]: r[1:]
            for r in con.execute(registry.ORACLES["unimax_sample"]).fetchall()
        }
        for lang, s in sizes.items():
            n_chars, cap, ac, bp = got[lang]
            assert n_chars == s and cap == caps[lang]
            assert ac == math.floor(alloc[lang])
            assert bp == (ac * 10000) // s

    def test_both_branches(self, con):
        rows = con.execute(registry.ORACLES["unimax_sample"]).fetchall()
        capped = [r for r in rows if r[3] == r[2]]
        watered = [r for r in rows if r[3] < r[2]]
        assert capped and watered
        # every watered language gets the identical share
        assert len({r[3] for r in watered}) == 1
        # budget-exhausting: total allocation never exceeds the budget
        total = sum(r[1] for r in rows)
        assert sum(r[3] for r in rows) <= total * 5 // 4


class TestTemperatureMix:
    def test_matches_python(self, con):
        sizes = _lang_sizes(con)
        ts = sum(sizes.values())
        w = {l: math.floor(1e6 * math.sqrt(s / ts)) for l, s in sizes.items()}
        dw = sum(w.values())
        got = {
            r[0]: r[1:]
            for r in con.execute(registry.ORACLES["temperature_mix"]).fetchall()
        }
        for lang, s in sizes.items():
            assert got[lang] == (s, w[lang], (w[lang] * 1000000) // dw)

    def test_flattens_distribution(self, con):
        rows = con.execute(registry.ORACLES["temperature_mix"]).fetchall()
        tot = sum(r[1] for r in rows)
        for lang, s, _w, ppm in rows:
            p = s / tot
            # T=2 pulls every weight toward uniform: big langs shrink,
            # small langs grow
            if p > 1 / len(rows):
                assert ppm / 1e6 < p
            else:
                assert ppm / 1e6 > p


# ------------------------------------------------------------ url dedup
def _canon(doc_id):
    gid, v = doc_id // 8, doc_id % 8
    scheme = ("http" if v % 2 == 0 else "HTTP") if v < 4 else (
        "https" if v % 2 == 0 else "HTTPS"
    )
    host = ("Site" if v % 3 == 0 else "site") + str(gid) + (
        ".Example.com" if v % 2 == 1 else ".example.com"
    )
    port = {1: ":80", 5: ":443", 3: ":8080"}.get(v, "")
    rest = "/D/" + str(gid)
    if v == 2:
        rest += "/"
    rest += {6: "?utm_source=feed", 7: "?id=7"}.get(v, "")
    if v == 4:
        rest += "#frag"
    # canonicalize: lower authority, strip default port / fragment /
    # utm params / trailing slash — an independent non-regex program
    auth = (scheme + "://" + host + port).lower()
    if auth.startswith("http://") and auth.endswith(":80"):
        auth = auth[:-3]
    elif auth.startswith("https://") and auth.endswith(":443"):
        auth = auth[:-4]
    if "#" in rest:
        rest = rest[: rest.index("#")]
    if "?utm_" in rest:
        rest = rest[: rest.index("?utm_")]
    if rest.endswith("/"):
        rest = rest[:-1]
    return auth + rest


class TestUrlDedup:
    def test_matches_python(self, con):
        groups = {}
        for (doc_id, *_r) in _docs(con):
            groups.setdefault(_canon(doc_id), []).append(doc_id)
        exp = {
            c: (len(ids), min(ids)) for c, ids in groups.items()
        }
        got = {
            r[0]: r[1:]
            for r in con.execute(registry.ORACLES["url_dedup"]).fetchall()
        }
        assert got == exp

    def test_merge_structure(self, con):
        rows = con.execute(registry.ORACLES["url_dedup"]).fetchall()
        # full 8-variant sites merge 3+3+1+1: the default-port / fragment
        # / utm / trailing-slash variants collapse, the non-default :8080
        # and the real ?id=7 param survive alone
        merged = [r for r in rows if r[1] == 3]
        singles = [r for r in rows if r[1] == 1]
        assert merged and singles
        assert any(":8080" in r[0] for r in singles)
        assert any("?id=7" in r[0] for r in singles)
        assert not any("#" in r[0] or "utm_" in r[0] for r in rows)
        # path case preserved, authority lowered
        assert all("/D/" in r[0] for r in rows)
        assert not any("Site" in r[0] or "Example" in r[0] for r in rows)


# --------------------------------------------------------------- doremi
class TestDoReMi:
    def test_matches_python(self, con):
        import collections
        docs = con.execute(
            "SELECT doc_id, source, n_chars FROM documents"
        ).fetchall()
        agg = collections.defaultdict(lambda: [0, 0, 0])
        for doc_id, src, n_chars in docs:
            a = agg[src]
            a[0] += 1
            a[1] += n_chars
            a[2] += (doc_id * 2654435761 + 7) % 1000
        tt = sum(a[1] for a in agg.values())
        rows = {}
        for src, (n, toks, ls) in agg.items():
            proxy = math.floor(1e6 * (ls / n / 1e3 + 2.0))
            ref = math.floor(1e6 * (2.2 + (int(src[3:]) % 7) * 5.0e-2))
            exc = max(proxy - ref, 0)
            emul = math.floor(1e6 * math.exp(exc / 1e6))
            alpha = math.floor(1e6 * toks / tt)
            rows[src] = (n, proxy, exc, alpha * emul)
        den = sum(v[3] for v in rows.values())
        nd = len(rows)
        got = {
            r[0]: r[1:]
            for r in con.execute(registry.ORACLES["doremi_weights"]).fetchall()
        }
        u_ppm = 1000000 // nd
        for src, (n, proxy, exc, num) in rows.items():
            w_ppm = (num * 1000000) // den
            sm = (w_ppm * 99 + u_ppm) // 100
            assert got[src] == (n, proxy, exc, w_ppm, sm), src

    @pytest.mark.parametrize("sf", ["sf0.001", "sf0.01", "sf0.1"])
    def test_grid_margin_all_sfs(self, sf):
        c = duckdb.connect()
        c.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('/root/testdata/{sf}/documents.parquet')"
        )
        for (exc,) in c.execute(
            "SELECT excess_micro FROM ("
            + registry.ORACLES["doremi_weights"]
            + ") WHERE excess_micro > 0"
        ).fetchall():
            v = 1e6 * math.exp(exc / 1e6)
            dist = min(v - math.floor(v), math.ceil(v) - v)
            assert dist > 1e-3, (sf, exc, dist)

    def test_branches_and_grid_margin(self, con):
        rows = con.execute(registry.ORACLES["doremi_weights"]).fetchall()
        assert len(rows) == 20
        assert any(r[3] == 0 for r in rows)  # clamped excess arm
        assert any(r[3] > 0 for r in rows)  # live excess arm
        # knife-edge audit for the one libm call: 1e6*exp(x) must sit
        # far from the floor grid relative to a 1-ulp engine divergence
        for _s, _n, _p, exc, _w, _sm in rows:
            if exc == 0:
                continue  # exp(0) == 1.0 exactly in every libm — no ulp risk
            v = 1e6 * math.exp(exc / 1e6)
            dist = min(v - math.floor(v), math.ceil(v) - v)
            assert dist > 1e-3, (exc, dist)
        # reweighting favors high-excess domains: top excess domain gets
        # more than the uniform share after smoothing
        top = max(rows, key=lambda r: r[3])
        assert top[5] > 1000000 // len(rows)


# ------------------------------------------------------------- pagerank
class TestPageRank:
    def _python_pagerank(self):
        n = registry._GNM_N
        edges = []
        for r in range(n):
            for c in range(n):
                u = r * n + c
                if c + 1 < n:
                    edges += [(u, u + 1), (u + 1, u)]
                if r + 1 < n:
                    edges += [(u, u + n), (u + n, u)]
        deg = {}
        for s, _d in edges:
            deg[s] = deg.get(s, 0) + 1
        scale = registry._PR_SCALE
        t = (15 * scale) // 100
        rank = {u: scale for u in deg}
        for _ in range(registry._PR_ROUNDS):
            new = {u: t for u in deg}
            for s, d in edges:
                new[d] += (rank[s] * 85) // (100 * deg[s])
            rank = new
        return rank, deg

    def test_matches_python(self):
        rank, _deg = self._python_pagerank()
        con = duckdb.connect()
        got = dict(con.execute(registry.ORACLES["gnm_pagerank"]).fetchall())
        assert got == rank

    def test_structure(self):
        rank, deg = self._python_pagerank()
        n = registry._GNM_N
        # symmetric grid: the four corner-adjacent interior nodes share
        # the max; corners (deg 2) sit at the minimum
        corners = [0, n - 1, n * (n - 1), n * n - 1]
        assert min(rank, key=rank.get) in corners
        assert all(deg[c] == 2 for c in corners)
        # mass approximately conserved (floor leak only): within
        # rounds * nodes * max_deg ulps of the initial mass
        total0 = n * n * registry._PR_SCALE
        leak_bound = registry._PR_ROUNDS * 4 * n * n
        assert total0 - leak_bound <= sum(rank.values()) <= total0


# ------------------------------------------------------------ triangles
class TestTriangles:
    def test_matches_bruteforce(self):
        n = registry._GNM_N
        adj = {u: set() for u in range(n * n)}

        def add(a, b):
            adj[a].add(b)
            adj[b].add(a)

        for r in range(n):
            for c in range(n):
                u = r * n + c
                if c + 1 < n:
                    add(u, u + 1)
                if r + 1 < n:
                    add(u, u + n)
                if r + 1 < n and c + 1 < n:
                    add(u, u + n + 1)
        member = {u: 0 for u in adj}
        total = 0
        for a in adj:
            for b in adj[a]:
                if b <= a:
                    continue
                for c in adj[a] & adj[b]:
                    if c <= b:
                        continue
                    total += 1
                    for x in (a, b, c):
                        member[x] += 1
        assert total == 2 * (n - 1) * (n - 1)  # closed form: 2 per cell
        con = duckdb.connect()
        got = dict(con.execute(registry.ORACLES["gnm_triangles"]).fetchall())
        assert got == {u: m for u, m in member.items() if m > 0}


# ---------------------------------------------------------- percentiles
class TestExactPercentiles:
    def test_matches_python(self, con):
        import collections
        groups = collections.defaultdict(list)
        for doc_id, _t, _l, src, n_chars in _docs(con):
            groups[src].append((n_chars, doc_id))
        got = {
            r[0]: r[1:]
            for r in con.execute(
                registry.ORACLES["exact_percentiles"]
            ).fetchall()
        }
        for src, vals in groups.items():
            vals.sort()
            n = len(vals)
            exp = tuple(
                vals[-(-n * p // 100) - 1][0] for p in (50, 90, 99)
            )  # nearest-rank: ceil(p*n/100), 1-indexed
            assert got[src] == (n,) + exp, src


# ------------------------------------------------------------ media phash
class TestMediaPhash:
    def _python_phash(self, ref):
        import hashlib
        out = b""
        b = 0
        while len(out) < 256:
            out += hashlib.md5(f"{ref}:{b}".encode()).digest()
            b += 1
        arr = list(out[:252])
        cells = [sum(arr[4 * i : 4 * i + 4]) for i in range(63)]
        h = 0
        for i in range(63):
            if i % 9 < 8 and cells[i] > cells[i + 1]:
                h |= 1 << ((i // 9) * 8 + (i % 9))
        return h

    def test_matches_python(self, con):
        # third implementation: pure-Python dHash per distinct asset,
        # phash-cluster fold + asset-level banded near-dup count
        doc_ids = [d for (d, *_r) in _docs(con)]
        groups = {}
        for d in doc_ids:
            groups.setdefault(d - d % 5, []).append(d)
        hashes = {
            gid: self._python_phash(f"media://{gid}/2") for gid in groups
        }
        # hash space genuinely wide: all cluster hashes distinct
        assert len(set(hashes.values())) == len(hashes)
        # asset-level near-dup: band collision AND hamming <= 6
        refs = sorted(groups)
        nd_count = {g: 0 for g in refs}
        for i, ga in enumerate(refs):
            for gb in refs[i + 1 :]:
                ha, hb = hashes[ga], hashes[gb]
                bands = any(
                    (ha >> (14 * b)) % 16384 == (hb >> (14 * b)) % 16384
                    for b in range(4)
                )
                if bands and bin(ha ^ hb).count("1") <= 6:
                    nd_count[ga] += 1
                    nd_count[gb] += 1
        by_hash = {}
        for gid, ids in groups.items():
            by_hash.setdefault(hashes[gid], []).extend(ids)
        exp = set()
        for gid, ids in groups.items():
            cluster = by_hash[hashes[gid]]
            for d in ids:
                exp.add(
                    (d, hashes[gid], min(cluster), len(cluster),
                     nd_count[gid])
                )
        got = set(con.execute(registry.ORACLES["media_phash"]).fetchall())
        assert got == exp


# ----------------------------------------------------- audio/scene media
def _rich_payload(ref):
    import hashlib
    out = b""
    b = 0
    while len(out) < 256:
        out += hashlib.md5(f"{ref}:{b}".encode()).digest()
        b += 1
    return out[:256]


class TestMediaAudioScene:
    def test_audio_matches_python(self, con):
        got = {}
        for r in con.execute(
            registry.ORACLES["media_audio_energy"]
        ).fetchall():
            got[(r[0], r[1])] = (r[2], r[3])
        for (doc_id, *_r) in _docs(con):
            p = _rich_payload(f"media://{doc_id}/2")
            for w in range(8):
                e = sum(
                    (b - 128) ** 2 for b in p[32 * w : 32 * w + 32]
                )
                assert got[(doc_id, w)] == (e, int(e < 170000)), (doc_id, w)

    def test_scene_matches_python(self, con):
        got = {}
        for r in con.execute(registry.ORACLES["media_scene_cuts"]).fetchall():
            got[(r[0], r[1])] = (r[2], r[3])
        for (doc_id, *_r) in _docs(con):
            p = _rich_payload(f"media://{doc_id}/2")
            frames = [p[32 * f : 32 * f + 32] for f in range(8)]
            for f in range(1, 8):
                d = sum(
                    abs(a - b) for a, b in zip(frames[f], frames[f - 1])
                )
                assert got[(doc_id, f)] == (d, int(d > 2730)), (doc_id, f)


# --------------------------------------------------------------- k-core
class TestKCore:
    def test_matches_python(self):
        n = registry._GNM_N
        edges = set()

        def add(a, b):
            edges.add((a, b))
            edges.add((b, a))

        for r in range(n):
            for c in range(n):
                u = r * n + c
                if c + 1 < n:
                    add(u, u + 1)
                if r + 1 < n:
                    add(u, u + n)
                if r + 1 < n and c + 1 < n:
                    add(u, u + n + 1)
                    if 3 <= r < 9 and 3 <= c < 9:
                        add(u + 1, u + n)
        e = set(edges)
        rounds = 0
        while True:
            deg = {}
            for s, _d in e:
                deg[s] = deg.get(s, 0) + 1
            keep = {u for u, d in deg.items() if d >= registry._KC_K}
            ne = {(s, d) for s, d in e if s in keep and d in keep}
            rounds += 1
            if len(ne) == len(e):
                break
            e = ne
        exp = {}
        for s, _d in e:
            exp[s] = exp.get(s, 0) + 1
        # the fixture exercises a REAL cascade within the round budget
        assert 2 < rounds <= registry._KC_ROUNDS
        assert exp and all(d >= registry._KC_K for d in exp.values())
        con = duckdb.connect()
        got = dict(con.execute(registry.ORACLES["gnm_kcore"]).fetchall())
        assert got == exp
