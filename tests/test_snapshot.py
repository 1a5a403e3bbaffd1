"""Snapshot-table tests: atomic multi-partition commit semantics —
readers see old-or-new, never mixed (the kill-mid-commit proof), hard-
link carry-forward, partition drops, vacuum retention."""

from __future__ import annotations

import os
import shutil

import pytest

from rta_registrations_pyspark_glue_spark import snapshot

ROOT = "/root/repo/.tmp/snapshot_test"


def _mk(spark, rows):
    return spark.createDataFrame(rows, ["k", "val", "year"])


def _read_rows(spark):
    return {
        (r["k"], r["val"], r["year"])
        for r in snapshot.snapshot_read(spark, ROOT).collect()
    }


def test_commit_read_replace_and_carry_forward(spark):
    shutil.rmtree(ROOT, ignore_errors=True)
    v0 = snapshot.snapshot_commit(
        _mk(spark, [(1, "a", 2023), (2, "b", 2024)]), ROOT, ["year"]
    )
    assert v0 == "v000000"
    assert _read_rows(spark) == {(1, "a", 2023), (2, "b", 2024)}
    # Merge-shaped commit: replace 2024, carry 2023 forward untouched.
    v1 = snapshot.snapshot_commit(
        _mk(spark, [(2, "B", 2024), (3, "c", 2024)]),
        ROOT,
        ["year"],
        replace_only=True,
    )
    assert v1 == "v000001"
    assert _read_rows(spark) == {(1, "a", 2023), (2, "B", 2024), (3, "c", 2024)}
    # The carried 2023 files are HARD LINKS into v000000 (metadata-only
    # carry — no data copy), byte-identical by inode.
    old_leaf = os.path.join(ROOT, "v000000", "year=2023")
    new_leaf = os.path.join(ROOT, "v000001", "year=2023")
    old_files = sorted(f for f in os.listdir(old_leaf) if f.endswith(".parquet"))
    new_files = sorted(f for f in os.listdir(new_leaf) if f.endswith(".parquet"))
    assert old_files == new_files and old_files
    for f in old_files:
        a = os.stat(os.path.join(old_leaf, f))
        b = os.stat(os.path.join(new_leaf, f))
        assert a.st_ino == b.st_ino and a.st_nlink >= 2


def test_kill_mid_commit_readers_see_old_never_mixed(spark, monkeypatch):
    shutil.rmtree(ROOT, ignore_errors=True)
    snapshot.snapshot_commit(
        _mk(spark, [(1, "a", 2023), (2, "b", 2024), (3, "c", 2025)]), ROOT, ["year"]
    )
    before = _read_rows(spark)

    # Crash AFTER the multi-partition write, BEFORE the pointer move —
    # the worst instant for replace_partitions (mixed table); here the
    # manifest never moved, so readers still see the old snapshot whole.
    def die(root, sid):
        raise RuntimeError("killed before manifest publish")

    monkeypatch.setattr(snapshot, "_publish", die)
    with pytest.raises(RuntimeError):
        snapshot.snapshot_commit(
            _mk(spark, [(2, "B", 2024), (9, "z", 2025)]),
            ROOT,
            ["year"],
            replace_only=True,
        )
    assert snapshot.snapshot_current(ROOT) == "v000000"
    assert _read_rows(spark) == before  # old, complete, not mixed

    # Crash even earlier — mid-carry-forward (half-built directory).
    monkeypatch.undo()
    monkeypatch.setattr(
        snapshot, "_carry_forward", lambda *a: (_ for _ in ()).throw(OSError("died"))
    )
    with pytest.raises(OSError):
        snapshot.snapshot_commit(
            _mk(spark, [(2, "C", 2024)]), ROOT, ["year"], replace_only=True
        )
    assert _read_rows(spark) == before

    # Recovery needs no special tooling: the next commit reuses the id,
    # clears the debris, and lands atomically.
    monkeypatch.undo()
    v1 = snapshot.snapshot_commit(
        _mk(spark, [(2, "B", 2024), (9, "z", 2025)]),
        ROOT,
        ["year"],
        replace_only=True,
    )
    assert v1 == "v000001"
    assert _read_rows(spark) == {(1, "a", 2023), (2, "B", 2024), (9, "z", 2025)}


def test_drop_partitions_and_source_is_own_table(spark):
    shutil.rmtree(ROOT, ignore_errors=True)
    snapshot.snapshot_commit(
        _mk(spark, [(1, "a", 2023), (2, "b", 2024)]), ROOT, ["year"]
    )
    # df reads FROM the current snapshot (merge-into-own-table shape):
    # legal because the build writes aside and snapshots are immutable.
    cur = snapshot.snapshot_read(spark, ROOT)
    moved = cur.filter("year = 2023").withColumn(
        "year", cur["year"] + 1
    )  # the 2023 row re-registers into 2024
    merged = moved.unionByName(cur.filter("year = 2024"))
    snapshot.snapshot_commit(
        merged, ROOT, ["year"], replace_only=True, drop_partitions=[(2023,)]
    )
    assert _read_rows(spark) == {(1, "a", 2024), (2, "b", 2024)}
    assert not os.path.isdir(
        os.path.join(ROOT, snapshot.snapshot_current(ROOT), "year=2023")
    )


def test_vacuum_keeps_current_and_linked_files_survive(spark):
    shutil.rmtree(ROOT, ignore_errors=True)
    snapshot.snapshot_commit(_mk(spark, [(1, "a", 2023)]), ROOT, ["year"])
    snapshot.snapshot_commit(
        _mk(spark, [(2, "b", 2024)]), ROOT, ["year"], replace_only=True
    )
    snapshot.snapshot_commit(
        _mk(spark, [(3, "c", 2025)]), ROOT, ["year"], replace_only=True
    )
    removed = snapshot.snapshot_vacuum(ROOT, keep=1)
    assert removed == ["v000000", "v000001"]
    # year=2023's file was written in v000000 and only ever hard-linked
    # since; after vacuuming its origin dir the current snapshot still
    # reads it (link count keeps the inode alive).
    assert _read_rows(spark) == {(1, "a", 2023), (2, "b", 2024), (3, "c", 2025)}


def test_empty_table_read_raises(spark):
    shutil.rmtree(ROOT, ignore_errors=True)
    with pytest.raises(FileNotFoundError):
        snapshot.snapshot_read(spark, ROOT)
