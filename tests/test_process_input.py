"""metric_process_v2 derivation (plugins/input/process)."""

from __future__ import annotations

from loongcollector_spark.operators.process_input import PROC_SCHEMA_HINT, ProcessMetrics


def _p(ts, pid, comm, utime, stime, rss, exe="/bin/x", cmd="x"):
    return ("h1", "ip1", ts, pid, comm, exe, cmd, utime, stime,
            rss, 1, 2, 3, 7, 9,
            (10, 11, 12, 13), (20, 21, 22, 23))


def _vals(out):
    res = {}
    for r in out:
        f = dict(r["fields"])
        res.setdefault((r["ts_ms"], r["pid"]), {})[f["__name__"]] = (
            f["__labels__"], f["__value__"]
        )
    return res


def test_cpu_rates_and_first_round_skip(spark):
    rows = [
        _p(1_000, 1, "worker", 100, 50, 5000),
        _p(3_000, 1, "worker", 300, 150, 6000),  # Δt=2s, Δutime=200, Δstime=100
        _p(3_000, 2, "fresh", 10, 10, 100),      # first observation → skipped
    ]
    df = spark.createDataFrame(rows, PROC_SCHEMA_HINT)
    out = ProcessMetrics(thread=True, open_fd=True, net_io=True, io=True).apply(df)
    res = _vals(out.collect())
    assert set(res) == {(3_000, 1)}
    m = res[(3_000, 1)]
    lbl = "comm#$#worker|hostname#$#h1|ip#$#ip1|pid#$#1"
    # 100*Δ(u+s)/100/Δt = 100*300/100/2 = 150
    assert m["process_cpu_percent"] == (lbl, "150")
    assert m["process_cpu_stime_percent"] == (lbl, "50")
    assert m["process_cpu_utime_percent"] == (lbl, "100")
    assert m["process_mem_rss"] == (lbl, "6000")
    assert m["process_threads"] == (lbl, "7")
    assert m["process_fds"] == (lbl, "9")
    assert m["process_net_in_bytes"] == (lbl, "10")
    assert m["process_read_bytes"] == (lbl, "21")


def test_regex_threshold_and_topn(spark):
    rows = []
    for pid, (cpu2, rss, comm) in enumerate(
        [(400, 100, "hog"), (300, 200, "busy"), (10, 9000, "fat"),
         (5, 8000, "mid"), (1, 10, "idle"), (350, 50, "java")]
    ):
        rows.append(_p(1_000, pid, comm, 100, 0, rss, exe=f"/bin/{comm}", cmd=comm))
        rows.append(_p(2_000, pid, comm, 100 + cpu2, 0, rss, exe=f"/bin/{comm}", cmd=comm))
    df = spark.createDataFrame(rows, PROC_SCHEMA_HINT)

    # regex gate: only 'java' survives
    out = ProcessMetrics(process_names_regex=["jav."]).apply(df).collect()
    assert {dict(r["fields"])["__labels__"].split("comm#$#")[1].split("|")[0]
            for r in out} == {"java"}

    # TopN: 2 by cpu (hog, java) + 2 by mem (fat, mid), cap 4
    out = ProcessMetrics(top_n_cpu=2, top_n_mem=2, max_process_count=4).apply(df)
    res = _vals(out.collect())
    comms = {k[1] for k in res}
    assert comms == {0, 5, 2, 3}  # pids of hog, java, fat, mid

    # thresholds: cpu ≥ 300% or rss ≥ 8000 bytes
    out = ProcessMetrics(
        min_cpu_limit_percent=300.0, min_memory_limit_kb=8
    ).apply(df)
    res = _vals(out.collect())
    assert {k[1] for k in res} == {0, 1, 2, 5}  # wait: busy is 300 exactly

    # max_process_count truncation, cpu-threshold matches first (pid order)
    out = ProcessMetrics(
        min_cpu_limit_percent=300.0, min_memory_limit_kb=8, max_process_count=3
    ).apply(df)
    res = _vals(out.collect())
    # cpu-matched {0,1,5} come first in pid order → mem-only 'fat' dropped
    assert {k[1] for k in res} == {0, 1, 5}


# --- service_snmp (input_snmp.go:536-563) ------------------------------------


def test_snmp_variable_logs(spark):
    from loongcollector_spark.operators.snmp import SnmpVariableLogs

    rows = [
        (1, 0, "10.9.0.1", "sysDescr", ".1.3.6.1.2.1.1.1.0", "", 0x04,
         bytearray(b"Linux r1"), None),
        (2, 1, "10.9.0.2", "ifInOctets", ".1.3.6.1.2.1.2.2.1.10.1", "int", 0x41,
         None, 123456789012345678),
        (3, 1, "t", "f", "o", "", 0x01, None, 1),
    ]
    df = spark.createDataFrame(
        rows,
        "i long, target_index int, target string, field string, oid string, "
        "conversion string, type_code int, value_bytes binary, value_num long",
    )
    out = {r["i"]: dict(r["fields"]) for r in SnmpVariableLogs().apply(df).collect()}
    assert out[1]["_type_"] == "OctetString" and out[1]["_content_"] == "Linux r1"
    assert out[2]["_type_"] == "Counter32"
    assert out[2]["_content_"] == "123456789012345678"
    assert out[3]["_type_"] == "Boolean "  # [sic] reference trailing space
