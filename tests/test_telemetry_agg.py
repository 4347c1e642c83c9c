"""aggregator_opentelemetry / aggregator_skywalking routing + batching.

Rules from plugins/aggregator/opentelemetry/aggregator_opentelemetry.go:96-106
and plugins/aggregator/skywalking/aggregator_skywalking.go:93-109; the
count-capped grouping is baseagg's MaxLogCount batching.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from loongcollector_spark.aggregate import BATCH_COL, LOGSTORE_COL, TelemetryRouter


def _fields_df(spark, sizes):
    rows = [(i, {f"f{j}": "v" for j in range(n)}) for i, n in enumerate(sizes)]
    return spark.createDataFrame(rows, "event_id long, fields map<string,string>")


class TestOtelRouting:
    def test_arity_routes(self, spark):
        df = _fields_df(spark, [1, 5, 6, 18, 19, 25])
        out = (
            TelemetryRouter(mode="opentelemetry")
            .apply(df, order_col="event_id")
            .select("event_id", LOGSTORE_COL)
            .collect()
        )
        got = {r.event_id: r[LOGSTORE_COL] for r in out}
        assert got == {
            0: "otlp-metrics", 1: "otlp-metrics",
            2: "otlp-logs", 3: "otlp-logs",
            4: "otlp-traces", 5: "otlp-traces",
        }

    def test_zero_contents_dropped(self, spark):
        df = _fields_df(spark, [0, 2])
        out = TelemetryRouter(mode="opentelemetry").apply(df, order_col="event_id")
        assert [r.event_id for r in out.collect()] == [1]

    def test_custom_stores_and_batching(self, spark):
        df = _fields_df(spark, [1] * 5)
        r = TelemetryRouter(mode="opentelemetry", metrics_store="m", max_count=2)
        out = r.apply(df, order_col="event_id").orderBy("event_id").collect()
        assert [x[LOGSTORE_COL] for x in out] == ["m"] * 5
        assert [x[BATCH_COL] for x in out] == ["0", "0", "1", "1", "2"]


class TestSkywalkingRouting:
    def test_first_key_routes(self, spark):
        rows = [
            (0, {"__name__": "x", "other": "y"}),
            (1, {"links": "[]"}),
            (2, {"otlp.name": "n"}),
            (3, {"mystery": "?"}),  # unrecognized -> logs (with agent warning)
        ]
        df = spark.createDataFrame(rows, "event_id long, fields map<string,string>")
        out = (
            TelemetryRouter(mode="skywalking")
            .apply(df, order_col="event_id")
            .select("event_id", LOGSTORE_COL)
            .collect()
        )
        got = {r.event_id: r[LOGSTORE_COL] for r in out}
        assert got == {
            0: "skywalking-metrics",
            1: "skywalking-traces",
            2: "skywalking-logs",
            3: "skywalking-logs",
        }


class TestScalePathBatching:
    def test_partition_local_batches_capped(self, spark):
        df = _fields_df(spark, [1] * 100)
        r = TelemetryRouter(mode="opentelemetry", max_count=8)
        out = r.apply(df).collect()  # no order_col -> partition-local ids
        assert len(out) == 100
        # every (store, batch) group respects the cap; ids are 'pid-k' text
        from collections import Counter

        c = Counter((x[LOGSTORE_COL], x[BATCH_COL]) for x in out)
        assert all(n <= 8 for n in c.values())
        assert all("-" in b for _, b in c)
