"""Property-based tests (hypothesis) for the curation-family integer
math — the closed forms the Spark plans and DuckDB oracles share:

  * sequence packing: pieces partition every doc, every non-final
    sequence is exactly at capacity, offsets are consistent, and the
    piece list reconstructs the global concatenation order;
  * partition transforms: the Spark SQL rendering and the driver-side
    Python rendering agree (pinned via the pure-Python reference here;
    the Spark rendering itself is pinned in test_table_partition.py),
    truncate has floor (never toward-zero) semantics, bucket is stable
    and in-range;
  * decile formula: floor(rank*K/n) is monotone, spans 0..K-1, and
    bucket sizes differ by at most 1.

All pure Python — no SparkSession."""

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st

from gdal_spark.table import _pt_value

CAP = 512


def _pack(lens):
    """Reference packing: the closed form both engines implement."""
    out, off = [], 0
    for i, n in enumerate(lens):
        s0, s1 = off // CAP, (off + n - 1) // CAP
        for seq in range(s0, s1 + 1):
            a = max(off, seq * CAP)
            b = min(off + n, (seq + 1) * CAP)
            out.append((i, seq, a - off, b - a, a - seq * CAP))
        off += n
    return out, off


@given(st.lists(st.integers(1, 2000), min_size=1, max_size=200))
@settings(max_examples=200, deadline=None)
def test_packing_partitions_docs_and_fills_sequences(lens):
    pieces, total = _pack(lens)
    # pieces of each doc are contiguous, start at 0, and sum to its length
    for i, n in enumerate(lens):
        mine = [(ps, nt, so) for d, _s, ps, nt, so in pieces if d == i]
        assert mine[0][0] == 0
        assert sum(nt for _, nt, _ in mine) == n
        run = 0
        for ps, nt, _ in mine:
            assert ps == run and nt >= 1
            run += nt
    # every sequence except the last holds exactly CAP tokens
    per_seq = {}
    for _d, s, _ps, nt, _so in pieces:
        per_seq[s] = per_seq.get(s, 0) + nt
    seqs = sorted(per_seq)
    assert seqs == list(range(len(seqs)))  # dense ids from 0
    assert all(per_seq[s] == CAP for s in seqs[:-1])
    assert 1 <= per_seq[seqs[-1]] <= CAP
    assert sum(per_seq.values()) == total
    # seq_off is exactly the running fill of its sequence
    fill = {}
    for _d, s, _ps, nt, so in pieces:  # pieces emitted in global order
        assert so == fill.get(s, 0)
        fill[s] = so + nt


@given(st.integers(-(10**12), 10**12), st.integers(1, 10**6))
@settings(max_examples=300, deadline=None)
def test_truncate_transform_is_floor(v, w):
    t = _pt_value(v, f"truncate[{w}]")
    assert t % w == 0 and t <= v < t + w  # floor multiple, never toward 0


@given(st.integers(-(10**12), 10**12), st.integers(1, 4096))
@settings(max_examples=300, deadline=None)
def test_bucket_transform_in_range_and_stable(v, n):
    b = _pt_value(v, f"bucket[{n}]")
    assert 0 <= b < n
    assert b == _pt_value(v, f"bucket[{n}]")
    # definitionally the md5 idiom shared with the Spark rendering
    assert b == int(hashlib.md5(str(v).encode()).hexdigest()[:7], 16) % n


@given(st.integers(1, 100000), st.integers(1, 64))
@settings(max_examples=300, deadline=None)
def test_decile_formula_balanced_and_monotone(n, k):
    buckets = [(rk * k) // n for rk in range(n)]
    assert buckets[0] == 0 and buckets[-1] == (k - 1 if n >= k else buckets[-1])
    assert all(a <= b for a, b in zip(buckets, buckets[1:]))
    sizes = [buckets.count(b) for b in range(k)] if n >= k else []
    if sizes:
        assert max(sizes) - min(sizes) <= 1
