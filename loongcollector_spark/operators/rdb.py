"""RDB incremental collection — input_mysql / service_pgsql / service_mssql.

Reference semantics (studied, not ported):
- plugins/input/mysql/mysql.go:374-434 (ParseRows: every selected column
  becomes a string field, renamed through ColumnsHash, SQL NULL renders as
  the string "null"; the checkpoint value advances to the checkpoint
  column of the LAST parsed row).
- plugins/input/rdb/rdb.go:152-276 (checkpoint init from CheckPointStart /
  saved state, the paged collect loop with PageSize/MaxSyncSize caps, and
  the "statement carries the ? placeholder for the checkpoint" contract —
  i.e. the user query is shaped ``… WHERE cp > ? ORDER BY cp``).

Table model: the database connection/polling loop is agent transport; the
table analog takes the source TABLE as a DataFrame and applies the same
incremental contract — filter rows past the checkpoint, optionally cap a
sync round at ``max_sync_size`` rows in checkpoint order, emit every column
as a string field. ``next_checkpoint`` is the driver-side state handoff
(one max() scalar — the same shape plans/checkpoint.py persists).

Scale note: the filter is a plain pushed predicate (partition-prunable when
the table is written bucketed/sorted by the checkpoint column); the
``max_sync_size`` cap is a TakeOrdered over the filtered slice — bounded by
the cap itself, never a full sort.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Mapping

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .base import FIELDS


@dataclass
class RdbIncremental:
    """One collect round of the rdb service over a table snapshot."""

    checkpoint_column: str = ""
    checkpoint_start: str = ""
    checkpoint_type: str = "int"  # "int" | "string" comparison semantics
    columns_hash: Mapping[str, str] = field(default_factory=dict)
    max_sync_size: int = 0

    def _cp_col(self, name: str):
        c = F.col(name)
        return c.cast("long") if self.checkpoint_type == "int" else c.cast("string")

    def collect(self, table: DataFrame, checkpoint: str | None = None) -> DataFrame:
        """Rows past ``checkpoint`` (falling back to checkpoint_start), all
        columns as string fields under the renamed keys, NULL → "null"."""
        out = table
        if self.checkpoint_column:
            cp = checkpoint if checkpoint is not None else self.checkpoint_start
            lit = (
                F.lit(int(cp)) if self.checkpoint_type == "int" else F.lit(cp)
            )
            out = out.where(self._cp_col(self.checkpoint_column) > lit)
            if self.max_sync_size > 0:
                out = out.orderBy(self._cp_col(self.checkpoint_column)).limit(
                    self.max_sync_size
                )
        entries = []
        for col in table.columns:
            key = self.columns_hash.get(col, col)
            entries.append(F.lit(key))
            entries.append(
                F.coalesce(F.col(col).cast("string"), F.lit("null"))
            )
        return out.select(F.create_map(*entries).alias(FIELDS))

    def next_checkpoint(self, collected: DataFrame) -> str | None:
        """The checkpoint column value of the last (max-checkpoint) row of
        the round — None when the round was empty (the reference keeps the
        old checkpoint then)."""
        key = self.columns_hash.get(self.checkpoint_column, self.checkpoint_column)
        val = F.element_at(F.col(FIELDS), F.lit(key))
        row = collected.select(
            F.max(
                val.cast("long") if self.checkpoint_type == "int" else val
            ).alias("cp")
        ).collect()[0]
        return None if row["cp"] is None else str(row["cp"])
