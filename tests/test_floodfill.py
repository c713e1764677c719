"""nearblack floodfill mode: the oracle's recursive-UNION closure is
cross-checked by an independent numpy breadth-first fill, and the two
semantic cases that separate floodfill from the scanline twin are pinned
(the guarded bay blanks, the interior lake survives)."""

from collections import deque

import duckdb
import numpy as np
import pytest

from gdal_spark.registry import ORACLES, _NBF_VAL  # noqa: F401

W, H = 400, 200


def _fixture():
    y, x = np.mgrid[0:H, 0:W]
    val = 3 + (x * 7 + y * 13) % 250
    lake = (x >= 100) & (x <= 110) & (y >= 50) & (y <= 60)
    val[lake] = 2
    pocket = (x >= 24) & (x <= 60) & (y >= 18) & (y <= 20)
    val[pocket] = 1
    channel = (x >= 20) & (x <= 23) & (y >= 3) & (y <= 20)
    val[channel] = (x * y)[channel] % 3
    ring = (x < 4) | (x > 395) | (y < 3) | (y > 196)
    val[ring] = (x + y)[ring] % 3
    return val


def _bfs_collar(val):
    mask = val <= 2
    seen = np.zeros_like(mask)
    dq = deque()
    for yy in range(H):
        for xx in range(W):
            if mask[yy, xx] and (xx in (0, W - 1) or yy in (0, H - 1)):
                seen[yy, xx] = True
                dq.append((xx, yy))
    while dq:
        xx, yy = dq.popleft()
        for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            nx, ny = xx + dx, yy + dy
            if 0 <= nx < W and 0 <= ny < H and mask[ny, nx] and not seen[ny, nx]:
                seen[ny, nx] = True
                dq.append((nx, ny))
    return seen


@pytest.fixture(scope="module")
def oracle_rows():
    return duckdb.connect().execute(ORACLES["nearblack_floodfill"]).fetchall()


def test_oracle_matches_numpy_bfs(oracle_rows):
    val = _fixture()
    exp = np.where(_bfs_collar(val), 0, val)
    assert len(oracle_rows) == W * H
    for x, y, v in oracle_rows:
        assert exp[y, x] == v, (x, y)


def test_bay_blanked_lake_survives(oracle_rows):
    got = {(x, y): v for x, y, v in oracle_rows}
    val = _fixture()
    # the pocket is horizontally guarded (bright on both sides of its
    # rows), so the scanline prefix/suffix rule provably keeps it...
    row = val[19]
    assert (row[4:24] > 2).any() and (row[61:396] > 2).any()
    assert val[19, 30] <= 2
    # ...but floodfill trims it (border-connected through the channel)
    assert got[(30, 19)] == 0
    # the interior lake is near-black yet NOT border-connected: kept
    assert got[(105, 55)] == 2
