"""Replay-idempotent, atomically-committed parquet state for
foreachBatch sinks.

foreachBatch delivers at-least-once, so any sink whose state update is
not idempotent (additive sketches, admission sets, rollups) needs a
commit protocol: state versions land in fresh ``v-{version}`` dirs
(one parquet table per name), then ``META.json`` — recording the dir,
its table names, and the last applied ``batch_id`` — is swapped in
atomically (tmp file + ``os.replace``). A replayed batch (id <= the
committed one) is skipped before any write; a crash mid-write leaves
META pointing at the previous complete version; superseded version
dirs are GC'd after the commit.

Single-writer by construction (one streaming query owns a state dir).
On a shared object store without atomic rename the same protocol rides
a conditional-put of META or a log-structured manifest (see
sources/tick_api.py's per-batch manifest commit) — the local
form here keeps the identical read/commit API.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def read_meta(state_dir: str) -> dict | None:
    path = os.path.join(state_dir, "META.json")
    if not os.path.exists(path):
        return None
    with open(path) as fh:
        return json.load(fh)


def read_state_table(
    spark: SparkSession, state_dir: str, name: str
) -> DataFrame | None:
    """The committed version's table ``name``, or None before the
    first commit (or if that version has no such table)."""
    meta = read_meta(state_dir)
    if meta is None or name not in meta["tables"]:
        return None
    return spark.read.parquet(os.path.join(state_dir, meta["dir"], name))


def commit_state(
    state_dir: str,
    tables: dict[str, DataFrame],
    batch_id: int | None = None,
    files_per_table: int = 1,
) -> bool:
    """Write every table to a fresh version dir and atomically point
    META at it. Returns False (no write at all) when ``batch_id`` was
    already applied — the replay-skip that makes an additive update
    effectively exactly-once.

    ``files_per_table`` controls write parallelism: 1 (default) is
    right for parameter-sized state (sketch cells, totals, frontier
    tables) where a single file keeps reads cheap; corpus-growing
    state (band indexes, shingle stores) should pass more — a
    coalesce(1) serializes the whole snapshot write through one task,
    which the 30x neardup fold measured as a real wall-clock cost."""
    os.makedirs(state_dir, exist_ok=True)
    meta = read_meta(state_dir)
    if (
        meta is not None
        and batch_id is not None
        and meta.get("last_batch_id") is not None
        and batch_id <= meta["last_batch_id"]
    ):
        return False
    version = 0 if meta is None else meta["version"] + 1
    vdir = f"v-{version:010d}"
    for name, df in tables.items():
        df.coalesce(files_per_table).write.mode("overwrite").parquet(
            os.path.join(state_dir, vdir, name)
        )
    tmp = os.path.join(state_dir, "META.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(
            {
                "version": version,
                "dir": vdir,
                "tables": sorted(tables),
                "last_batch_id": batch_id,
            },
            fh,
        )
    os.replace(tmp, os.path.join(state_dir, "META.json"))  # atomic commit
    for name in os.listdir(state_dir):  # GC superseded versions
        if name.startswith("v-") and name != vdir:
            shutil.rmtree(os.path.join(state_dir, name), ignore_errors=True)
    return True
