"""systemd-journal entry→log conversion (service_journal) and docker event
conversion (service_docker_event) — the table-expressible slices of the two
agent inputs (the sdjournal cursor/seek machinery and the docker event
listener are transport; the field mapping below is the pipeline semantics).
"""

from __future__ import annotations

from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .base import FIELDS, Operator

# plugins/input/journal/input_journal.go:52-77 SyslogFacilityString
SYSLOG_FACILITY_STRING = {
    "0": "kernel", "1": "user", "2": "mail", "3": "daemon", "4": "auth",
    "5": "syslog", "6": "line printer", "7": "network news", "8": "uucp",
    "9": "clock daemon", "10": "security/auth", "11": "ftp", "12": "ntp",
    "13": "log audit", "14": "log alert", "15": "clock daemon",
    "16": "local0", "17": "local1", "18": "local2", "19": "local3",
    "20": "local4", "21": "local5", "22": "local6", "23": "local7",
}

# plugins/input/journal/input_journal.go:80-89 PriorityConversionMap
PRIORITY_CONVERSION_MAP = {
    "0": "emergency", "1": "alert", "2": "critical", "3": "error",
    "4": "warning", "5": "notice", "6": "informational", "7": "debug",
}

_PRIORITY_KEY = "PRIORITY"  # sdjournal.SD_JOURNAL_FIELD_PRIORITY
_FACILITY_KEY = "SYSLOG_FACILITY"  # sdjournal.SD_JOURNAL_FIELD_SYSLOG_FACILITY


def _lookup(value, table: dict[str, str]):
    """Go ``table[val]`` semantics: a missing key yields the zero value ""
    (the reference REPLACES an unknown priority/facility with empty)."""
    m = F.create_map(*[F.lit(x) for kv in table.items() for x in kv])
    return F.coalesce(F.element_at(m, value), F.lit(""))


@dataclass
class JournalEntryLogs(Operator):
    """service_journal entry conversion (plugins/input/journal/
    input_journal.go:339-373 run): each JournalEntry's fields map becomes the
    log, with PRIORITY / SYSLOG_FACILITY optionally mapped to their textual
    forms (missing map entry → ""), plus ``_realtime_timestamp_`` /
    ``_monotonic_timestamp_`` stringified columns; event time =
    RealtimeTimestamp·1000 ns when UseJournalEventTime. Input frame:
    (fields map<string,string>, realtime_ts µs long, monotonic_ts long).
    Per-row projection — zero shuffle."""

    parse_priority: bool = False
    parse_syslog_facility: bool = False
    use_journal_event_time: bool = False
    fields_col: str = "fields"
    realtime_col: str = "realtime_ts"
    monotonic_col: str = "monotonic_ts"

    def apply(self, df: DataFrame) -> DataFrame:
        m = F.col(self.fields_col)
        if self.parse_priority:
            m = F.transform_values(
                m,
                lambda k, v: F.when(
                    k == _PRIORITY_KEY, _lookup(v, PRIORITY_CONVERSION_MAP)
                ).otherwise(v),
            )
        if self.parse_syslog_facility:
            m = F.transform_values(
                m,
                lambda k, v: F.when(
                    k == _FACILITY_KEY, _lookup(v, SYSLOG_FACILITY_STRING)
                ).otherwise(v),
            )
        passthrough = [
            c
            for c in df.columns
            if c not in (self.fields_col, self.realtime_col, self.monotonic_col)
        ]
        event_time_ns = (
            F.col(self.realtime_col).cast("long") * 1000
            if self.use_journal_event_time
            else F.lit(None).cast("long")
        )
        return df.select(
            *passthrough,
            F.map_concat(
                m,
                F.create_map(
                    F.lit("_realtime_timestamp_"),
                    F.col(self.realtime_col).cast("string"),
                    F.lit("_monotonic_timestamp_"),
                    F.col(self.monotonic_col).cast("string"),
                ),
            ).alias(FIELDS),
            event_time_ns.alias("event_time_ns"),
        )


@dataclass
class DockerEventLogs(Operator):
    """service_docker_event conversion (plugins/input/docker/event/
    input_docker_event.go:60-81 fire): each docker event → log with
    ``_time_nano_`` / ``_action_`` / ``_type_`` / ``_id_`` plus the actor
    attributes (unless IgnoreAttributes); event time = TimeNano. Input frame:
    (time_nano long, action string, type string, actor_id string,
    attributes map<string,string>). Per-row projection — zero shuffle."""

    ignore_attributes: bool = False

    def apply(self, df: DataFrame) -> DataFrame:
        base = F.create_map(
            F.lit("_time_nano_"), F.col("time_nano").cast("string"),
            F.lit("_action_"), F.col("action"),
            F.lit("_type_"), F.col("type"),
            F.lit("_id_"), F.col("actor_id"),
        )
        m = (
            base
            if self.ignore_attributes
            else F.map_concat(base, F.coalesce(F.col("attributes"), F.create_map()))
        )
        passthrough = [
            c
            for c in df.columns
            if c not in ("time_nano", "action", "type", "actor_id", "attributes")
        ]
        return df.select(
            *passthrough,
            m.alias(FIELDS),
            F.col("time_nano").alias("event_time_ns"),
        )
