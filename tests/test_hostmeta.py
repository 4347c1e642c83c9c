"""metric_meta_host conversion tests — MetaNode log shape from
input_host_meta.go / host_meta_collect.go / meta_helper.go."""

from __future__ import annotations

import json

from loongcollector_spark.operators.hostmeta import HostMetaConverter

HOSTS_DDL = (
    "hostname string, ip string, host_id string, boot_time long, os string, "
    "platform string, platform_family string, platform_version string, "
    "kernel_version string, kernel_arch string, virtualization_system string, "
    "virtualization_role string, "
    "cpu struct<processor_count:int,core_count:int,vendor_id:string,"
    "family:string,model:string,model_name:string,mhz:double,cache_size:int>, "
    "mem struct<mem_total:long,swap_total:long,vsz_total:long>, "
    "disk array<struct<device:string,opts:string,fstype:string,mount_point:string>>"
)

PROCS_DDL = (
    "hostname string, ip string, host_id string, pid long, start_time long, "
    "cmd string, exe string, comm string, ppid long, rss long"
)

HOST_ROW = (
    "web-1", "10.0.0.9", "hid-9", 1663900000, "linux", "ubuntu", "debian",
    "22.04", "5.15.0", "x86_64", "kvm", "guest",
    (8, 16, "GenuineIntel", "6", "85", "Xeon", 2400.0, 1024),
    (1000000, 2000, 123),
    [("/dev/sda1", "rw", "ext4", "/")],
)


def test_host_node(spark):
    df = spark.createDataFrame([HOST_ROW], HOSTS_DDL)
    out = HostMetaConverter(labels={"env": "prod"}).host_nodes(df).collect()
    assert len(out) == 1
    r = out[0]
    assert r["id"] == "hid-9_10.0.0.9"
    assert r["type"] == "HOST"
    assert r["parents"] == "[]"
    assert json.loads(r["labels"]) == {
        "hostname": "web-1", "ip": "10.0.0.9", "boot_time": "1663900000",
        "os": "linux", "platform": "ubuntu", "platform_family": "debian",
        "platform_version": "22.04", "kernel_version": "5.15.0",
        "kernel_arch": "x86_64", "virtualization_system": "kvm",
        "virtualization_role": "guest", "host_id": "hid-9", "env": "prod",
    }
    attrs = json.loads(r["attributes"])
    assert attrs["CPU"] == {
        "cache_size": 1024, "core_count": 16, "family": "6", "mhz": 2400,
        "model": "85", "model_name": "Xeon", "processor_count": 8,
        "vendor_id": "GenuineIntel",
    }
    assert attrs["MEM"] == {"mem_total": 1000000, "swap_total": 2000, "vsz_total": 123}
    assert "DISK" not in attrs
    # attribute keys render sorted (canonical choice; easyjson map order is
    # random in the reference)
    assert r["attributes"].index('"CPU"') < r["attributes"].index('"MEM"')


def test_host_disk_category_and_no_hostid(spark):
    row = list(HOST_ROW)
    row[2] = None  # host_id NULL → host.Info() error path
    df = spark.createDataFrame([tuple(row)], HOSTS_DDL)
    out = HostMetaConverter(cpu=False, memory=False, disk=True).host_nodes(df).collect()
    r = out[0]
    assert r["id"] == "no_hostID_10.0.0.9"
    assert json.loads(r["attributes"]) == {
        "DISK": [
            {"device": "/dev/sda1", "fstype": "ext4", "mount_point": "/", "opts": "rw"}
        ]
    }


def test_process_nodes_filters_and_shape(spark):
    rows = [
        ("web-1", "10.0.0.9", "hid-9", 42, 777, "nginx -g daemon", "/sbin/nginx", "nginx", 1, 100),
        ("web-1", "10.0.0.9", "hid-9", 0, 1, "init", "/sbin/init", "init", 0, 5),      # pid 0
        ("web-1", "10.0.0.9", "hid-9", 43, 2, "", "/bin/x", "x", 1, 5),                 # empty cmd
        ("web-1", "10.0.0.9", "hid-9", 44, 3, "kthread", "/bin/k", "k", 2, 0),          # rss 0
        ("web-1", "10.0.0.9", "hid-9", 45, 4, "python app.py", "/usr/bin/python", "python", 1, 9),
    ]
    df = spark.createDataFrame(rows, PROCS_DDL)
    conv = HostMetaConverter(labels={"env": "prod"}, process_names_regex=["nginx.*"])
    out = conv.process_nodes(df).collect()
    assert len(out) == 1  # regex keeps only the nginx row
    r = out[0]
    assert r["id"] == "web-1_10.0.0.9_PROCESS_42_777"
    assert r["type"] == "PROCESS"
    assert json.loads(r["labels"]) == {"hostname": "web-1", "ip": "10.0.0.9", "env": "prod"}
    assert json.loads(r["attributes"]) == {
        "command": "nginx -g daemon", "exe": "/sbin/nginx", "name": "nginx",
        "pid": 42, "ppid": 1,
    }
    assert json.loads(r["parents"]) == ["HOST:hid-9_10.0.0.9:web-1"]
    # empty regex list matches everything that passes the stat filters
    out_all = HostMetaConverter().process_nodes(df).collect()
    assert {r["id"] for r in out_all} == {
        "web-1_10.0.0.9_PROCESS_42_777", "web-1_10.0.0.9_PROCESS_45_4"
    }


def test_format_cmd_truncation(spark):
    cmd = "x" * 4000 + "MID" + "y" * 4000  # 8003 chars
    rows = [("h", "1.2.3.4", "hid", 1, 1, cmd, "/bin/x", "x", 0, 1)]
    df = spark.createDataFrame(rows, PROCS_DDL)
    r = HostMetaConverter().process_nodes(df).collect()[0]
    got = json.loads(r["attributes"])["command"]
    assert got == "x" * 4000 + " ... " + "y" * 4000
    assert len(got) == 8005
    # ≤8000 passes through verbatim
    rows2 = [("h", "1.2.3.4", "hid", 1, 1, "z" * 8000, "/bin/x", "x", 0, 1)]
    r2 = HostMetaConverter().process_nodes(
        spark.createDataFrame(rows2, PROCS_DDL)
    ).collect()[0]
    assert json.loads(r2["attributes"])["command"] == "z" * 8000
