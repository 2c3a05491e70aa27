"""Build manifest: per-stage / per-partition lineage + metrics for
resumable index builds.

The reference deletes its partial files on completion and has no resume
(/root/reference/src/main/java/it/unipi/Main.java:59); at 10^12-doc scale a
build must be restartable, so every stage records completion + row counts
under the index directory and reruns skip finished work. Segment buckets
are written atomically (tmp + rename) with a stats sidecar, giving
per-partition lineage at the bucket level.
"""

from __future__ import annotations

import json
import os
import tempfile
import time
from typing import Any


class Manifest:
    FILENAME = "manifest.json"

    def __init__(self, index_dir: str, fingerprint: str):
        self.index_dir = index_dir
        self.path = os.path.join(index_dir, self.FILENAME)
        self.fingerprint = fingerprint
        self.data: dict[str, Any] = {
            "fingerprint": fingerprint,
            "created_at": time.time(),
            "stages": {},
        }

    @classmethod
    def load_or_create(cls, index_dir: str, fingerprint: str) -> "tuple[Manifest, bool]":
        """Returns (manifest, was_reset). ``was_reset`` is True when an
        existing manifest had a DIFFERENT config fingerprint — the caller
        must wipe the artifact dirs, because per-partition skip checks
        (segment buckets, segstats sidecars) would otherwise silently reuse
        files built under the old config."""
        m = cls(index_dir, fingerprint)
        if os.path.exists(m.path):
            with open(m.path) as f:
                data = json.load(f)
            if data.get("fingerprint") == fingerprint:
                m.data = data
            else:
                return m, True
        return m, False

    def clear_stage(self, stage: str) -> None:
        if stage in self.data["stages"]:
            del self.data["stages"][stage]
            self.save()

    def stage_complete(self, stage: str) -> bool:
        info = self.data["stages"].get(stage)
        return bool(info and info.get("status") == "complete")

    def stage_info(self, stage: str) -> dict[str, Any]:
        return self.data["stages"].get(stage, {})

    def mark_complete(self, stage: str, **metrics: Any) -> None:
        self.data["stages"][stage] = {
            "status": "complete",
            "finished_at": time.time(),
            **metrics,
        }
        self.save()

    def save(self) -> None:
        os.makedirs(self.index_dir, exist_ok=True)
        atomic_write_json(self.path, self.data)


def atomic_write_json(path: str, obj: Any) -> None:
    d = os.path.dirname(path)
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(obj, f, indent=1)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def atomic_write_table(path: str, table) -> None:
    """Atomically write one parquet file (tmp + rename)."""
    import pyarrow.parquet as pq

    d = os.path.dirname(path)
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".parquet.tmp")
    os.close(fd)
    try:
        pq.write_table(table, tmp)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise
