"""Branch/tag refs + write-audit-publish on the snapshot table
(gdal_spark/table.py — the Iceberg "Snapshot References" model): an
audit branch receives staged commits invisible to main, a fast-forward
publishes them atomically, tags pin immutable history, and snapshot-id
allocation goes global once refs exist so no branch manifest can be
overwritten by a main commit."""

import shutil
import tempfile

import pytest

from gdal_spark.table import CommitConflict, SnapshotTable


@pytest.fixture()
def root():
    d = tempfile.mkdtemp(prefix="snaptab_wap_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _batch(spark, lo, hi, tag="x"):
    return spark.createDataFrame(
        [(i, tag) for i in range(lo, hi)], "k int, tag string"
    )


def test_branch_commits_invisible_until_publish(spark, root):
    t = SnapshotTable(spark, root)
    t.append(_batch(spark, 0, 10))
    t.create_branch("audit")
    t.append_to(_batch(spark, 10, 15), "audit")
    t.append_to(_batch(spark, 15, 18), "audit")
    # main readers see only the pre-branch state
    assert t.read().count() == 10
    assert t.read_ref("audit").count() == 18
    # publish: fast-forward main to the audited head
    head = t.fast_forward("audit")
    assert t.current_snapshot_id() == head
    assert t.read().count() == 18


def test_fast_forward_requires_ancestry(spark, root):
    t = SnapshotTable(spark, root)
    t.append(_batch(spark, 0, 5))
    t.create_branch("audit")
    t.append_to(_batch(spark, 5, 8), "audit")
    # main advances independently -> histories diverge
    t.append(_batch(spark, 100, 103))
    with pytest.raises(CommitConflict):
        t.fast_forward("audit")
    # main's own commit is intact
    assert t.read().count() == 8  # 5 + 3 divergent rows


def test_tag_is_immutable_and_stable(spark, root):
    t = SnapshotTable(spark, root)
    t.append(_batch(spark, 0, 5))
    t.create_tag("v1")
    t.append(_batch(spark, 5, 9))
    assert t.read().count() == 9
    assert t.read_ref("v1").count() == 5  # tag pins history
    with pytest.raises(ValueError):
        t.append_to(_batch(spark, 9, 10), "v1")  # tags reject writes
    with pytest.raises(ValueError):
        t.create_tag("v1")  # duplicate ref name
    refs = {r["name"]: (r["type"], r["snapshot_id"])
            for r in t.refs().collect()}
    assert refs["v1"] == ("tag", 1)
    assert refs["main"][0] == "branch"


def test_global_id_allocation_no_overwrite(spark, root):
    """Interleaved main/branch commits: every history stays readable —
    the failure mode would be a main commit reusing a branch's id and
    clobbering its manifest."""
    t = SnapshotTable(spark, root)
    t.append(_batch(spark, 0, 4))  # sid 1
    t.create_branch("b")
    b1 = t.append_to(_batch(spark, 10, 14), "b")
    m2 = t.append(_batch(spark, 4, 7))  # main, must not reuse b1's id
    b2 = t.append_to(_batch(spark, 14, 16), "b")
    assert len({1, b1, m2, b2}) == 4
    assert t.read().count() == 7  # main: 4 + 3
    assert t.read_ref("b").count() == 10  # branch: 4 + 4 + 2


def test_expire_keeps_ref_history(spark, root):
    t = SnapshotTable(spark, root)
    t.append(_batch(spark, 0, 3))
    t.create_tag("keepme")
    t.overwrite(_batch(spark, 10, 12))
    t.overwrite(_batch(spark, 20, 21))
    t.expire_snapshots(keep_last=1)
    # the tagged snapshot survived expiry and still reads
    assert t.read_ref("keepme").count() == 3
    assert t.read().count() == 1


def test_drop_ref(spark, root):
    t = SnapshotTable(spark, root)
    t.append(_batch(spark, 0, 3))
    t.create_branch("tmp")
    t.drop_ref("tmp")
    with pytest.raises(ValueError):
        t.read_ref("tmp")


def test_sid_allocation_never_clobbers_existing_manifest(spark, root):
    """Two writers racing different refs can both pass their own ref's
    optimistic check; sid allocation itself must then be the contention
    point.  Simulate the losing side of that race by planting a
    manifest at the id the commit would pick: the commit must allocate
    PAST it (O_CREAT|O_EXCL retry), never os.replace over it."""
    import json
    import os

    t = SnapshotTable(spark, root)
    t.append(_batch(spark, 0, 4))  # sid 1
    t.create_branch("b")
    # a "concurrent winner" already holds snap-2.json
    planted = os.path.join(root, "metadata", "snap-2.json")
    sentinel = {"snapshot_id": 2, "parent_id": 1, "operation": "append",
                "files": [], "added_files": [], "delete_files": [],
                "schema": None, "batch_id": None, "last_batch_id": -1,
                "sentinel": True}
    with open(planted, "w") as f:
        json.dump(sentinel, f)
    sid = t.append(_batch(spark, 4, 7))
    assert sid == 3  # allocated past the planted manifest
    with open(planted) as f:
        assert json.load(f).get("sentinel") is True  # untouched
    assert t.read().count() == 7


def test_fast_forward_detects_concurrent_main_commit(spark, root):
    """A main commit landing between fast_forward's ancestry check and
    its hint swap must not be silently discarded."""
    t = SnapshotTable(spark, root)
    t.append(_batch(spark, 0, 5))
    t.create_branch("audit")
    t.append_to(_batch(spark, 5, 8), "audit")

    real_is_ancestor = t.is_ancestor

    def racing_is_ancestor(a, d):
        ok = real_is_ancestor(a, d)
        # a concurrent writer advances main mid-fast-forward
        t2 = SnapshotTable(spark, root)
        t2.append(_batch(spark, 100, 102))
        return ok

    t.is_ancestor = racing_is_ancestor
    with pytest.raises(CommitConflict):
        t.fast_forward("audit")
    # the concurrent main commit survived
    assert t.read().count() == 7  # 5 + 2


def test_branch_commit_refs_conflict_rolls_back_manifest(spark, root):
    """If the refs CAS loses (e.g. a tag created concurrently), the
    branch commit must unpublish its manifest + data files — no
    half-applied commit."""
    import json
    import os

    t = SnapshotTable(spark, root)
    t.append(_batch(spark, 0, 5))
    t.create_branch("audit")

    real_write_refs = t._write_refs

    def racing_write_refs(refs, expected):
        # a concurrent tag lands first, moving the refs file
        path = os.path.join(root, "metadata", "refs.json")
        with open(path) as f:
            cur = json.load(f)
        cur["surprise_tag"] = {"type": "tag", "snapshot_id": 1}
        with open(path, "w") as f:
            json.dump(cur, f)
        return real_write_refs(refs, expected)

    t._write_refs = racing_write_refs
    before_manifests = set(os.listdir(os.path.join(root, "metadata")))
    before_data = set(os.listdir(os.path.join(root, "data")))
    with pytest.raises(CommitConflict):
        t.append_to(_batch(spark, 5, 8), "audit")
    t._write_refs = real_write_refs
    # nothing half-applied: no new manifest, no new data files
    after_manifests = {
        n for n in os.listdir(os.path.join(root, "metadata"))
        if n.startswith("snap-")
    }
    assert after_manifests == {
        n for n in before_manifests if n.startswith("snap-")
    }
    assert set(os.listdir(os.path.join(root, "data"))) == before_data
    # branch still readable at its old head
    assert t.read_ref("audit").count() == 5
