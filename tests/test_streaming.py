"""Structured Streaming: same operator chain over readStream, availableNow
drain, watermark windowed aggregates, exactly-once checkpoint resume."""

import pyspark.sql.functions as F

from loongcollector_spark.operators.base import FIELDS, fget, to_events
from loongcollector_spark.operators.parse import RegexParser
from loongcollector_spark.routing import RouteCondition, Router
from loongcollector_spark.streaming.pipeline import (
    read_stream,
    run_available_now,
    windowed_sink_counts,
)


def _write_input(spark, path, rows):
    spark.createDataFrame(rows, ["doc_id", "content", "n_tok"]).write.mode(
        "append"
    ).parquet(path)


def test_stream_parse_matches_batch(spark, tmp_path):
    inp = str(tmp_path / "in")
    rows = [(f"d{i}", f"1.2.3.{i} GET {200 + i}", 10 + i) for i in range(20)]
    _write_input(spark, inp, rows)

    schema = spark.read.parquet(inp).schema
    parser = RegexParser(r"(\S+) (\w+) (\d+)", ["ip", "method", "status"])

    batch_out = parser.apply(to_events(spark.read.parquet(inp))).select(
        "doc_id", fget("ip").alias("ip"), fget("status").alias("status")
    )

    collected = []

    def process(bdf, epoch_id):
        out = parser.apply(to_events(bdf)).select(
            "doc_id", fget("ip").alias("ip"), fget("status").alias("status")
        )
        collected.extend(out.collect())

    stream = read_stream(spark, inp, schema)
    q = run_available_now(stream, str(tmp_path / "ckpt"), process)
    q.awaitTermination(120)
    assert sorted(collected) == sorted(batch_out.collect())


def test_stream_checkpoint_skips_processed_files(spark, tmp_path):
    inp = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    _write_input(spark, inp, [("d1", "a", 1)])
    schema = spark.read.parquet(inp).schema

    seen: list[str] = []

    def process(bdf, epoch_id):
        seen.extend(r["doc_id"] for r in bdf.collect())

    q = run_available_now(read_stream(spark, inp, schema), ckpt, process)
    q.awaitTermination(120)
    assert seen == ["d1"]

    # second run with new data: only the new file is processed (exactly-once)
    _write_input(spark, inp, [("d2", "b", 2)])
    q2 = run_available_now(read_stream(spark, inp, schema), ckpt, process)
    q2.awaitTermination(120)
    assert sorted(seen) == ["d1", "d2"]


def test_windowed_sink_counts_streaming(spark, tmp_path):
    inp = str(tmp_path / "in")
    rows = [
        ("d1", "sink_a", 5, "2024-01-01 00:00:10"),
        ("d2", "sink_a", 7, "2024-01-01 00:00:50"),
        ("d3", "sink_b", 3, "2024-01-01 00:01:10"),
    ]
    spark.createDataFrame(rows, ["doc_id", "sink", "n_tok", "ts"]).withColumn(
        "event_time", F.to_timestamp("ts")
    ).drop("ts").write.mode("append").parquet(inp)
    schema = spark.read.parquet(inp).schema

    stream = read_stream(spark, inp, schema)
    agg = windowed_sink_counts(stream, window="1 minute", watermark="2 minutes")

    out = []

    def process(bdf, epoch):
        out.extend(bdf.collect())

    q = (
        agg.writeStream.outputMode("complete")
        .foreachBatch(process)
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(str(r["window_start"]), r["sink"]): (r["events"], r["tokens_total"]) for r in out}
    assert got[("2024-01-01 00:00:00", "sink_a")] == (2, 12)
    assert got[("2024-01-01 00:01:00", "sink_b")] == (1, 3)


def test_stateful_rate_limit_across_batches(spark, tmp_path):
    """State (the per-key count) must persist across micro-batches: with
    limit=3 and 2 rows/key per batch, batch 2 contributes only 1 row/key."""
    from loongcollector_spark.streaming.pipeline import stateful_rate_limit

    inp = str(tmp_path / "in")
    # two files → two micro-batches with maxFilesPerTrigger=1
    spark.createDataFrame(
        [("k1", 0), ("k1", 1), ("k2", 2)], ["key", "seq"]
    ).coalesce(1).write.mode("append").parquet(inp)
    spark.createDataFrame(
        [("k1", 3), ("k1", 4), ("k2", 5)], ["key", "seq"]
    ).coalesce(1).write.mode("append").parquet(inp)
    schema = spark.read.parquet(inp).schema

    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(inp)
    limited = stateful_rate_limit(stream, ["key"], limit=3, output_schema=schema)

    got = []

    def process(bdf, epoch):
        got.extend((r["key"], r["seq"]) for r in bdf.collect())

    q = (
        limited.writeStream.foreachBatch(process)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    by_key = {}
    for k, s in got:
        by_key.setdefault(k, []).append(s)
    assert len(by_key["k1"]) == 3  # 2 from batch 1 + 1 from batch 2
    assert len(by_key["k2"]) == 2  # under the limit


def test_stream_router_fanout(spark, tmp_path):
    inp = str(tmp_path / "in")
    spark.createDataFrame(
        [("d1", "prod"), ("d2", "dev")], ["doc_id", "env"]
    ).write.parquet(inp)
    schema = spark.read.parquet(inp).schema
    router = Router(
        [RouteCondition("sink_prod", "env", "prod"), RouteCondition("sink_all")]
    )
    out = []

    def process(bdf, epoch):
        out.extend((r["doc_id"], r["sink"]) for r in router.apply(bdf).collect())

    q = run_available_now(read_stream(spark, inp, schema), str(tmp_path / "ck"), process)
    q.awaitTermination(120)
    assert sorted(out) == [("d1", "sink_all"), ("d1", "sink_prod"), ("d2", "sink_all")]


def test_kafka_input_mock_stream_through_pipeline(spark, tmp_path):
    """compile_input service_kafka wiring (mock rate-source stand-in: no
    broker in-sandbox, production path identical module/options) feeds the
    compiled processor chain; records arrive as (topic, partition, offset,
    timestamp, content) like the Kafka source."""
    from loongcollector_spark.plans.compiler import compile_input, compile_pipeline

    cfg = {
        "Type": "service_kafka",
        "Brokers": ["broker-1:9092"],
        "Topics": ["logs"],
        "ConsumerGroup": "cg1",
        "MockRowsPerSecond": 200,
    }
    stream = compile_input(spark, cfg, mock=True)
    assert stream.isStreaming
    assert set(["topic", "partition", "offset", "timestamp", "content"]) <= set(
        stream.columns
    )
    pipe = compile_pipeline(
        {
            "processors": [
                {
                    "Type": "processor_parse_regex_native",
                    "SourceKey": "content",
                    "Regex": r"msg-(\d+)",
                    "Keys": ["n"],
                }
            ]
        }
    )
    seen = []

    def process(bdf, epoch_id):
        out = pipe.apply(to_events(bdf))
        seen.extend(
            (r["topic"], int(r[FIELDS]["n"])) for r in out.collect()
        )

    q = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 seconds")
        .start()
    )
    import time

    deadline = time.time() + 30
    while time.time() < deadline and len(seen) < 5:
        time.sleep(0.5)
    q.stop()
    assert len(seen) >= 5
    assert all(t == "logs" for t, _ in seen)
    ns = sorted(n for _, n in seen)
    assert ns == list(range(ns[0], ns[0] + len(ns)))  # contiguous offsets


def test_kafka_input_production_wiring_options():
    """The non-mock path maps reference config fields onto the Kafka source
    options (Brokers/Topics/Offset/ConsumerGroup). Building the reader plan
    requires the kafka connector jar, absent in-sandbox — so assert the
    option mapping logic up to the load() call via a stub reader."""
    from loongcollector_spark.plans import compiler

    class StubReader:
        def __init__(self):
            self.calls = {}

        def format(self, f):
            self.calls["format"] = f
            return self

        def option(self, k, v):
            self.calls[k] = v
            return self

        def load(self):
            raise RuntimeError("no connector in sandbox")

    class StubSpark:
        readStream = StubReader()

    cfg = {
        "Type": "service_kafka",
        "Brokers": ["b1:9092", "b2:9092"],
        "Topics": ["t1", "t2"],
        "Offset": "newest",
        "ConsumerGroup": "cg",
        "MaxMessageLen": 1048576,
    }
    try:
        compiler.compile_input(StubSpark(), cfg)
    except RuntimeError:
        pass
    calls = StubSpark.readStream.calls
    assert calls["format"] == "kafka"
    assert calls["kafka.bootstrap.servers"] == "b1:9092,b2:9092"
    assert calls["subscribe"] == "t1,t2"
    assert calls["startingOffsets"] == "latest"
    assert calls["kafka.group.id"] == "cg"
    assert calls["kafka.fetch.max.bytes"] == "1048576"


def test_prom_text_relabel_windowed_rollup_streaming(spark, tmp_path):
    """The new metric operators run UNCHANGED inside Structured Streaming:
    file-stream of exposition lines → PromTextParser → RelabelConfig chain →
    watermarked event-time window rollup → memory sink."""
    import pyspark.sql.functions as F

    from loongcollector_spark.operators.prom_text import PromTextParser
    from loongcollector_spark.operators.relabel import RelabelConfig

    inp = str(tmp_path / "in")
    base = 1700000000
    rows = []
    for i in range(120):
        code = 200 if i % 3 else 500
        rows.append(
            (f"d{i}", f'http_requests_total{{code="{code}"}} 1 {base + i}')
        )
    spark.createDataFrame(rows, ["doc_id", "content"]).write.parquet(inp)

    schema = spark.read.parquet(inp).schema
    stream = spark.readStream.schema(schema).parquet(inp)
    parsed = PromTextParser().apply(stream)
    kept = RelabelConfig(
        action="keep", regex="2..", source_labels=["code"]
    ).apply(parsed, tags_col="tags")
    with_time = kept.withColumn("ts", F.timestamp_seconds(F.col("timestamp")))
    agg = (
        with_time.withWatermark("ts", "10 seconds")
        .groupBy(F.window("ts", "60 seconds"), "metric_name")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total"))
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("prom_rollup")
        .outputMode("complete")  # append would hold the last window at the watermark
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    out = spark.sql("select * from prom_rollup order by window").collect()
    # 120 lines, i%3==0 (code 500) dropped by the keep rule → 80 kept across
    # three UNALIGNED 60s windows (epoch 1700000000 starts mid-window)
    assert sum(r["n"] for r in out) == 80
    assert all(r["metric_name"] == "http_requests_total" for r in out)
    assert [r["n"] for r in out] == [26, 40, 14]


def test_prom_remote_write_ingestion_streaming(spark, tmp_path):
    """HTTP-ingestion shape for remote write as a STREAM: binary payload
    parquet files tailed by readStream → snappy+prompb decode in Arrow
    mapInPandas → per-metric counts in a complete-mode memory sink."""
    import pyspark.sql.functions as F

    from loongcollector_spark.operators.prom_rw import (
        PromRemoteWriteDecoder,
        encode_write_request,
        snappy_compress,
    )

    inp = str(tmp_path / "rw_in")
    payloads = []
    for b in range(4):
        series = [
            {
                "labels": [("__name__", f"m{(b + i) % 2}"), ("h", f"h{i}")],
                "samples": [(float(i), 1434055562000 + b)],
            }
            for i in range(3)
        ]
        payloads.append((b, bytearray(snappy_compress(encode_write_request(series)))))
    spark.createDataFrame(payloads, "req long, payload binary").write.parquet(inp)

    schema = spark.read.parquet(inp).schema
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(inp)
    decoded = PromRemoteWriteDecoder("payload", ["req"]).apply(stream)
    agg = decoded.groupBy("__name__").agg(F.count("*").alias("n"))
    q = (
        agg.writeStream.format("memory")
        .queryName("rw_counts")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {r["__name__"]: r.n for r in spark.sql("select * from rw_counts").collect()}
    assert rows == {"m0": 6, "m1": 6}


def test_skywalking_decode_streaming_matches_batch(spark, tmp_path):
    """The r4 decoder family is pure Column expressions, so the same operator
    runs unchanged under readStream — stream output must equal batch output
    (the batch/stream parity that makes every ingestion format available to
    a Structured Streaming pipeline)."""
    import json

    from loongcollector_spark.operators.skywalking import SkywalkingJvmMetricParser

    inp = str(tmp_path / "in")
    payloads = []
    for i in range(12):
        payloads.append(
            (
                f"d{i}",
                json.dumps(
                    {
                        "service": f"svc{i % 3}",
                        "serviceInstance": "i1",
                        "metrics": [
                            {
                                "time": 1663904182000 + i,
                                "cpu": {"usagePercent": i},
                                "thread": {"liveCount": i, "daemonCount": 1, "peakCount": 2},
                            }
                        ],
                    }
                ),
                1,
            )
        )
    _write_input(spark, inp, payloads)

    parser = SkywalkingJvmMetricParser()
    sel = lambda df: parser.apply(to_events(df)).select(  # noqa: E731
        "doc_id",
        fget("__name__").alias("name"),
        fget("__labels__").alias("labels"),
        fget("__value__").alias("value"),
    )
    batch = sorted(map(tuple, sel(spark.read.parquet(inp)).collect()))

    schema = spark.read.parquet(inp).schema
    collected = []

    def process(bdf, epoch_id):
        collected.extend(map(tuple, sel(bdf).collect()))

    q = run_available_now(read_stream(spark, inp, schema), str(tmp_path / "ckpt"), process)
    q.awaitTermination(120)
    assert sorted(collected) == batch and len(batch) == 12 * 4  # cpu + 3 threads


def test_pprof_profile_ingestion_streaming(spark, tmp_path):
    """Profile ingestion as a STREAM: binary pprof payload files tailed by
    readStream → Arrow mapInPandas decode → per-stack value counts in a
    complete-mode memory sink (the continuous-profiling pipeline shape)."""
    import pyspark.sql.functions as F

    from loongcollector_spark.operators.pprof_profile import (
        PprofBuilder,
        PprofProfileParser,
    )

    inp = str(tmp_path / "pprof_in")
    rows = []
    for b in range(3):
        bld = PprofBuilder()
        bld.sample_type("samples", "count")
        leaf = bld.location([bld.function(f"fn{b % 2}", "f.go")])
        bld.sample([leaf], [b + 1])
        rows.append((b, bytearray(bld.build(gzipped=b % 2 == 0))))
    spark.createDataFrame(rows, "req long, payload binary").write.parquet(inp)

    schema = spark.read.parquet(inp).schema
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(inp)
    logs = PprofProfileParser(passthrough=["req"]).apply(stream)
    agg = logs.groupBy("name").agg(F.sum(F.col("val").cast("double")).alias("v"))
    q = (
        agg.writeStream.format("memory")
        .queryName("pprof_counts")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_pprof"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["name"]: r["v"] for r in spark.sql("select * from pprof_counts").collect()}
    assert got == {"fn0 f.go": 4.0, "fn1 f.go": 2.0}  # batches 0+2 vs 1
