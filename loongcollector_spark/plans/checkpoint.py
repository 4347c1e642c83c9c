"""Checkpoint/resume: partition-level done-markers + idempotent per-unit
overwrite, so a killed run replays only unfinished units (north rule:
"resumable from checkpoint with per-partition lineage").

Reference analog: exactly-once range checkpoints for file→SLS
(core/file_server/checkpoint/RangeCheckpoint.h:27; group checkpoint ptr
PipelineEventGroup.h:132-134) and the Go leveldb checkpoint manager
(pluginmanager/checkpoint_manager.go:40-114). Spark-first shape: the unit of
resume is a *logical partition* (e.g. a sink, a source shard, a date bucket)
— each unit's output goes to its own directory with dynamic-overwrite
semantics, and a driver-side manifest records completion. Re-running is
idempotent: completed units are skipped, partially-written units are
overwritten whole.

At 100 TB the manifest is tiny (one marker per unit, thousands of units) and
units map to Iceberg partition replace commits (`replaceWhere`); here the
parquet-directory implementation keeps the exact same semantics.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass
from typing import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Manifest:
    """Driver-side completion manifest: one JSON marker file per unit."""

    path: str

    def _marker(self, unit: str) -> str:
        return os.path.join(self.path, f"{unit}.done.json")

    def done_units(self) -> set[str]:
        if not os.path.isdir(self.path):
            return set()
        return {
            f[: -len(".done.json")]
            for f in os.listdir(self.path)
            if f.endswith(".done.json")
        }

    def mark_done(self, unit: str, meta: dict | None = None) -> None:
        os.makedirs(self.path, exist_ok=True)
        tmp = self._marker(unit) + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"unit": unit, "ts": time.time(), **(meta or {})}, f)
        os.replace(tmp, self._marker(unit))  # atomic publish

    def reset(self) -> None:
        if os.path.isdir(self.path):
            for f in os.listdir(self.path):
                os.remove(os.path.join(self.path, f))


def resumable_write(
    df_for_unit: Callable[[str], DataFrame],
    units: Sequence[str],
    out_dir: str,
    manifest: Manifest,
    fail_after: int | None = None,
) -> list[str]:
    """Write each unit's DataFrame to ``out_dir/unit=<u>/`` unless its marker
    exists; mark done after a successful write. Returns the units written this
    run. ``fail_after`` injects a crash after N writes (tests).

    Idempotency: mode=overwrite per unit directory — a unit that crashed
    mid-write is rewritten whole on resume; completed units are never
    touched (their files keep their mtimes)."""
    done = manifest.done_units()
    written = []
    for u in units:
        if u in done:
            continue
        if fail_after is not None and len(written) >= fail_after:
            raise RuntimeError(f"injected failure after {fail_after} units")
        path = os.path.join(out_dir, f"unit={u}")
        df_for_unit(u).write.mode("overwrite").parquet(path)
        manifest.mark_done(u, {"path": path})
        written.append(u)
    return written


def read_all_units(spark: SparkSession, out_dir: str) -> DataFrame:
    """Read the union of all unit directories (basePath keeps the unit
    partition column out of the data)."""
    return spark.read.option("basePath", out_dir).parquet(f"{out_dir}/unit=*")


def resumable_sink_write(
    routed: DataFrame,
    sinks: Sequence[str],
    out_dir: str,
    manifest: Manifest,
    sink_col: str = "sink",
    fail_after: int | None = None,
) -> list[str]:
    """The flagship use: per-sink resumable fan-out write. The routed frame is
    filtered per sink (disjoint writes); localCheckpoint/cache upstream of the
    router avoids recomputing the parse stage per sink when the plan is hot."""
    return resumable_write(
        lambda s: routed.filter(routed[sink_col] == s).drop(sink_col),
        sinks,
        out_dir,
        manifest,
        fail_after=fail_after,
    )
