"""metric_system_v2 derivation (plugins/input/systemv2/input_system_v2.go)."""

from __future__ import annotations

import math

from loongcollector_spark.operators.systemv2 import SNAPSHOT_SCHEMA_HINT, SystemV2Metrics


def _cpu(user, system, idle, iowait=0.0, **kw):
    base = dict(user=user, system=system, idle=idle, nice=0.0, iowait=iowait,
                irq=0.0, softirq=0.0, steal=0.0, guest=0.0, guest_nice=0.0)
    base.update(kw)
    return tuple(base[k] for k in ("user", "system", "idle", "nice", "iowait",
                                   "irq", "softirq", "steal", "guest", "guest_nice"))


def _snap(ts, cpu, disks, nets, tcp, mounts=None):
    return (
        "h1", "10.0.0.1", ts, (1.5, 1.0, 0.5), 1700000000, 4, None, cpu,
        (42.5, 100.0, 200.0, 300.0, 400.0, 1000.0), 7.25,
        mounts or [], disks, nets, tcp,
    )


def _collect(spark, rows):
    df = spark.createDataFrame(rows, SNAPSHOT_SCHEMA_HINT)
    out = SystemV2Metrics(labels={"env": "prod"}).apply(df).collect()
    res = {}
    for r in out:
        f = dict(r["fields"])
        res.setdefault(r["ts_ms"], {})[(f["__name__"], f["__labels__"])] = f
    return res


def test_first_snapshot_and_deltas(spark):
    d0 = [("sda", 1000, 2000, 10, 20, 100, 200, 500), ("sda1", 1, 1, 1, 1, 1, 1, 1)]
    d1 = [("sda", 3000, 2000, 30, 20, 300, 200, 1500), ("sda1", 2, 2, 2, 2, 2, 2, 2)]
    n0 = [("eth0", 1000, 500, 100, 50, 0, 0, 0, 0)]
    n1 = [("eth0", 3000, 1500, 200, 150, 2, 0, 1, 1)]
    rows = [
        _snap(1_000_000, _cpu(10.0, 5.0, 85.0), d0, n0, (100, 200, 10)),
        _snap(1_002_000, _cpu(20.0, 10.0, 160.0, iowait=10.0), d1, n1, (150, 260, 13)),
    ]
    res = _collect(spark, rows)
    base = "env#$#prod|hostname#$#h1|ip#$#10.0.0.1"
    t0, t1 = res[1_000_000], res[1_002_000]

    # non-delta metrics on both snapshots
    assert t0[("system_load1", base)]["__value__"] == "1.5"
    assert t0[("cpu_count", base)]["__value__"] == "4"
    assert t0[("mem_util", base)]["__value__"] == "42.5"
    assert t0[("mem_swap_util", base)]["__value__"] == "7.25"
    # time: ms → ns digit normalization
    assert t0[("system_boot_time", base)]["__time_nano__"] == "1000000000000000000"

    # no delta metrics on the first snapshot
    assert ("cpu_util", base) not in t0
    assert not any(k[0] == "disk_rbps" for k in t0)

    # cpu: Δbusy=15, Δtotal = (20+10+160+10)-(10+5+85) = 100 → 15%
    assert t1[("cpu_util", base)]["__value__"] == "15"
    assert t1[("cpu_user_util", base)]["__value__"] == "10"
    assert t1[("cpu_wait_util", base)]["__value__"] == "10"

    # disk: Δt=2s; total excludes the sda1 partition
    dl = f"disk#$#total|{base}"
    assert t1[("disk_rbps", dl)]["__value__"] == "1000"
    assert t1[("disk_riops", dl)]["__value__"] == "10"
    # rlatency = Δread_time/Δread_count = 200/20
    assert t1[("disk_rlatency", dl)]["__value__"] == "10"
    # no write ops → NaN latency; no disk_util for total
    assert t1[("disk_wlatency", dl)]["__value__"] == "NaN"
    assert ("disk_util", dl) not in t1
    dev = f"disk#$#sda|{base}"
    assert t1[("disk_util", dev)]["__value__"] == "50"  # 1000ms io / 2s → 50%

    # net: per-interface + total
    il = "env#$#prod|hostname#$#h1|interface#$#eth0|ip#$#10.0.0.1"
    assert t1[("net_in", il)]["__value__"] == "1000"
    assert t1[("net_out_pkt", il)]["__value__"] == "50"
    # drop/err utils over pkt total (100+100): drop 2, err 2
    assert t1[("net_drop_util", il)]["__value__"] == "1"
    assert t1[("net_err_util", il)]["__value__"] == "1"
    assert ("net_in", "env#$#prod|hostname#$#h1|interface#$#total|ip#$#10.0.0.1") in t1

    # protocol tcp deltas
    assert t1[("protocol_tcp_outsegs", base)]["__value__"] == "60"
    assert t1[("protocol_tcp_retran_segs", base)]["__value__"] == "3"
    assert t1[("protocol_tcp_retran_util", base)]["__value__"] == "5"


def test_mount_filters_and_share_factor(spark):
    mounts = [
        ("/dev/sda1", "/", "ext4", 55.5, 10.0, 100, 200, 1000, 100),
        ("proc", "/proc", "proc", 1.0, 1.0, 1, 1, 1, 1),           # fs excluded
        ("/dev/sdb", "/sys/kernel", "ext4", 1.0, 1.0, 1, 1, 1, 1),  # path excluded
        ("/dev/sdc", r"/mnt/my\040disk", "xfs", 20.0, 5.0, 2, 4, 8, 2),
    ]
    row = (
        "h1", "ip", 1_000_000, None, 1, 8, 2000,
        _cpu(1.0, 1.0, 1.0), None, None, mounts, [], [], None,
    )
    df = spark.createDataFrame([row], SNAPSHOT_SCHEMA_HINT)
    out = SystemV2Metrics().apply(df).collect()
    labels = {dict(r["fields"])["__labels__"] for r in out
              if dict(r["fields"])["__name__"] == "disk_space_usage"}
    assert labels == {
        "device#$#/dev/sda1|fs_type#$#ext4|hostname#$#h1|ip#$#ip|path#$#/",
        "device#$#/dev/sdc|fs_type#$#xfs|hostname#$#h1|ip#$#ip|path#$#/mnt/my disk",
    }
    # null load/mem structs emit nothing; boot_time still there
    names = {dict(r["fields"])["__name__"] for r in out}
    assert "system_load1" not in names and "mem_util" not in names
    assert "system_boot_time" in names


def test_cpu_share_factor(spark):
    rows = [
        ("h1", "ip", 1_000, None, 1, 8, 2000, _cpu(10.0, 0.0, 90.0), None, None,
         [], [], [], None),
        ("h1", "ip", 2_000, None, 1, 8, 2000, _cpu(20.0, 0.0, 130.0), None, None,
         [], [], [], None),
    ]
    df = spark.createDataFrame(rows, SNAPSHOT_SCHEMA_HINT)
    out = SystemV2Metrics().apply(df).collect()
    vals = {dict(r["fields"])["__name__"]: dict(r["fields"])["__value__"] for r in out}
    # factor = 8/(2000/1000) = 4; Δbusy 10 / Δtotal 50 → 20% × 4 = 80
    assert vals["cpu_util"] == "80"


# --- metric_netping (plugins/input/netping/netping.go:263-346) ---------------


def test_netping_fanout(spark):
    from loongcollector_spark.operators.netping import (
        RESULTS_SCHEMA_HINT,
        NetPingMetrics,
    )

    lbl = [("name", "p1"), ("src", "h")]
    cert = [("url", "https://x"), ("issuer_commmon_name", "CA")]
    rows = [
        # valid ping with successes → counts + rtt
        (1_000, True, "ping", lbl, 10, 8, 2, 0.5, 9.5, 4.25, 100.5, 1.25,
         0, 0, None, None, None, None, None),
        # valid tcping, zero successes → counts only
        (1_000, True, "tcping", lbl, 10, 0, 10, 0.5, 9.5, 4.25, 100.5, 1.25,
         0, 0, None, None, None, None, None),
        # invalid → dropped
        (1_000, False, "ping", lbl, 10, 8, 2, 0.5, 9.5, 4.25, 100.5, 1.25,
         0, 0, None, None, None, None, None),
        # httping with cert
        (1_000, True, "httping", lbl, 1, 1, 0, None, None, None, None, None,
         123, 4567, True, cert, 42, None, None),
        # dns failure
        (1_000, None, "dns", lbl, None, None, None, None, None, None, None,
         None, None, None, None, None, None, False, None),
    ]
    df = spark.createDataFrame(rows, RESULTS_SCHEMA_HINT)
    out = NetPingMetrics().apply(df).collect()
    got = {}
    for r in out:
        f = dict(r["fields"])
        got.setdefault(f["__name__"], []).append((f["__labels__"], f["__value__"]))
    base = "name#$#p1|src#$#h"
    assert got["ping_total"] == [(base, "10")]
    assert got["ping_rtt_avg_ms"] == [(base, "4.25")]
    assert got["tcping_failed"] == [(base, "10")]
    assert "tcping_rtt_min_ms" not in got  # zero successes
    assert got["httping_rt_ms"] == [(base, "123")]
    assert got["httping_cert_ttl_days"] == [("issuer_commmon_name#$#CA|url#$#https://x", "42")]
    assert got["dns_resolve_success"] == [(base, "0")]
    assert got["dns_resolve_failed"] == [(base, "1")]
    assert "dns_resolve_rt_ms" not in got
