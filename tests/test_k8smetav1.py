"""kubernetesmetav1 MetaNode conversion (plugins/input/kubernetesmetav1)."""

from __future__ import annotations

import json

from loongcollector_spark.operators.k8smetav1 import (
    K8sMetaV1Converter,
    extract_pod_workload_name,
)

PODS = (
    "uid string, name string, namespace string, labels map<string,string>, "
    "phase string, pod_ip string, node_name string, restart_counts array<int>, "
    "claim_names array<string>, host_network boolean, "
    "containers array<struct<name:string,image:string>>, "
    "creation_ts long, resource_version string"
)
WORKLOAD = (
    "uid string, name string, namespace string, labels map<string,string>, "
    "selector map<string,string>, creation_ts long, resource_version string"
)


def _pod(spark, **over):
    row = dict(
        uid="p1", name="web-5d4b8cf9d8-x2abc", namespace="ns1",
        labels={"app": "web"}, phase="Running", pod_ip="10.0.0.9",
        node_name="node-a", restart_counts=[2, 3], claim_names=["pvc-1"],
        host_network=True, containers=[("c0", "img0"), ("c1", "img1")],
        creation_ts=1700000000, resource_version="42",
    )
    row.update(over)
    return spark.createDataFrame([tuple(row.values())], PODS)


def test_workload_name_regexes(spark):
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [("web-5d4b8cf9d8-x2abc",), ("db-0bcd1",), ("plain",), ("",)], "n string"
    )
    got = [r["w"] for r in df.select(
        extract_pod_workload_name(F.col("n")).alias("w")).collect()]
    assert got == ["web", "db", "plain", ""]


def test_pod_node_attrs_and_parents(spark):
    conv = K8sMetaV1Converter(labels={"cluster": "c1"})
    nodes = spark.createDataFrame(
        [("n-uid", "node-a")], "uid string, name string"
    )
    deployments = spark.createDataFrame(
        [("d-uid", "web", "ns1", {"tier": "fe"}, {"app": "web"}, 1, "1")], WORKLOAD
    )
    services = spark.createDataFrame(
        [("s-uid", "websvc", "ns1", {}, {"app": "web"}, 1, "1"),
         ("s2", "other", "ns1", {}, {"app": "api"}, 1, "1"),
         ("s3", "empty-sel", "ns1", {}, {}, 1, "1")], WORKLOAD
    )
    matchers = conv.matchers_frame(deployments=deployments, services=services)
    out = conv.pod_nodes(_pod(spark), nodes=nodes, matchers=matchers).collect()
    assert len(out) == 1
    r = out[0]
    assert r["id"] == "p1" and r["type"] == "Pod"
    attrs = json.loads(r["attributes"])
    assert attrs["namespace"] == "ns1"
    assert attrs["phase"] == "Running"
    assert attrs["restart_count"] == 5
    assert attrs["workload"] == "web"
    assert attrs["volume_claim"] == "pvc-1"
    assert attrs["host_network"] == "true"  # string "true" in the reference
    assert attrs["container.0.container_name"] == "c0"
    assert attrs["container.1.image_name"] == "img1"
    assert attrs["creation_time"] == 1700000000
    assert attrs["resource_version"] == "42"
    # addresses consumed by the parent wiring
    assert "addresses" not in attrs
    assert json.loads(r["labels"]) == {"app": "web", "cluster": "c1"}
    # Node parent first, then sorted matchers; empty-selector service skipped
    assert json.loads(r["parents"]) == [
        "Node:n-uid:node-a", "Deployment:d-uid:web", "Service:s-uid:websvc",
    ]


def test_pod_disable_parents_keeps_addresses(spark):
    conv = K8sMetaV1Converter(disable_report_parents=True)
    r = conv.pod_nodes(_pod(spark)).collect()[0]
    attrs = json.loads(r["attributes"])
    assert attrs["addresses"] == "node-a"
    assert r["parents"] == "[]"


def test_statefulset_string_replicas_vs_deployment_numbers(spark):
    conv = K8sMetaV1Converter()
    base = "uid string, name string, namespace string, labels map<string,string>, " \
        "creation_ts long, resource_version string, observed_generation long, " \
        "desired_replicas long, replicas long, updated_replicas long, " \
        "available_replicas long, unavailable_replicas long, strategy string, " \
        "misscheduled_replicas long"
    df = spark.createDataFrame(
        [("u1", "w", "ns", {}, 1, "1", 7, None, 3, 2, 2, 1, "RollingUpdate", 0)], base
    )
    dep = json.loads(conv.workload_nodes(df, "Deployment").collect()[0]["attributes"])
    assert dep["desired_replicas"] == 1  # nil Spec.Replicas default, number
    assert dep["replicas"] == 3 and dep["strategy"] == "RollingUpdate"
    sts = json.loads(conv.workload_nodes(df, "StatefulSet").collect()[0]["attributes"])
    # strconv.Itoa quirk: strings
    assert sts["desired_replicas"] == "1" and sts["replicas"] == "3"
    assert sts["updated_replicas"] == "2"
    assert "strategy" not in sts


def test_job_cronjob_parents_and_attrs(spark):
    conv = K8sMetaV1Converter()
    jobs = spark.createDataFrame(
        [("j1", "backup-123", "ns", {}, {"job": "b"}, 5, "1", 1, 0, 0, 100, None)],
        WORKLOAD + ", active long, succeeded long, failed long, start_time long, "
        "completion_time long",
    )
    crons = spark.createDataFrame(
        [("cj1", "backup", "ns", {}, "*/5 * * * *", None, ["j1"], 90, 5, "1")],
        "uid string, name string, namespace string, labels map<string,string>, "
        "schedule string, suspend boolean, active_refs array<string>, "
        "last_schedule_time long, creation_ts long, resource_version string",
    )
    jp = conv.job_parents(jobs, crons)
    out = conv.workload_nodes(jobs.join(jp, ["uid"], "left"), "Job").collect()[0]
    attrs = json.loads(out["attributes"])
    assert attrs["active"] == 1 and attrs["start_time"] == 100
    assert "completion_time" not in attrs
    assert json.loads(out["parents"]) == ["CronJob:cj1:backup"]
    cj = json.loads(conv.workload_nodes(crons, "CronJob").collect()[0]["attributes"])
    assert cj["schedule"] == "*/5 * * * *"
    assert cj["suspend"] is False and cj["active_jobs"] == 1
    assert cj["last_schedule_time"] == 90


def test_node_service_ingress_and_reference(spark):
    conv = K8sMetaV1Converter()
    nodes = spark.createDataFrame(
        [(
            "n1", "node-a", {"zone": "z"}, "5.10", "amd64", "b1", "containerd://1.6",
            "v1.24", "v1.24", "m1", "linux", "Ubuntu", "sys-1",
            (4000, 16_000_000_000, None, 110, None),
            [("InternalIP", "10.0.0.1"), ("Hostname", "node-a")],
            ["k=v:NoSchedule"], True, 1700000000, "9",
        )],
        "uid string, name string, labels map<string,string>, kernel_version string, "
        "architecture string, boot_id string, container_runtime_version string, "
        "kube_proxy_version string, kubelet_version string, machine_id string, "
        "operating_system string, os_image string, system_uuid string, "
        "allocatable struct<cpu:long,mem:long,ephemeral_storage:long,pods:long,storage:long>, "
        "addresses array<struct<type:string,address:string>>, taints array<string>, "
        "unschedulable boolean, creation_ts long, resource_version string",
    )
    n = json.loads(conv.node_nodes(nodes).collect()[0]["attributes"])
    assert n["allocatable_cpu"] == 4000 and "allocatable_storage" not in n
    assert n["addresses.0.InternalIP"] == "10.0.0.1"
    assert n["addresses.1.Hostname"] == "node-a"
    assert n["taints.0"] == "k=v:NoSchedule"
    assert n["unschedulable"] is True  # bool in the reference (vs pod host_network string)
    assert n["kernel_version"] == "5.10"

    services = spark.createDataFrame(
        [("s1", "websvc", "ns1", {}, "10.96.0.1", "ClusterIP",
          [(80, 0, "TCP"), (443, 30443, "TCP")], "", {"app": "web"}, 1, "1")],
        "uid string, name string, namespace string, labels map<string,string>, "
        "cluster_ip string, type string, "
        "ports array<struct<port:int,node_port:int,protocol:string>>, "
        "load_balancer_ip string, selector map<string,string>, creation_ts long, "
        "resource_version string",
    )
    ingresses = spark.createDataFrame(
        [("i1", "ing", "ns1", {}, [("h1", [("websvc", 80, "/api")])], ["1.2.3.4"], 1, "1")],
        "uid string, name string, namespace string, labels map<string,string>, "
        "rules array<struct<host:string,paths:array<struct<service:string,port:int,path:string>>>>, "
        "lb_ips array<string>, creation_ts long, resource_version string",
    )
    # pods matched to this service: one Deployment-backed pod
    deployments = spark.createDataFrame(
        [("d1", "web", "ns1", {}, {"app": "web"}, 1, "1")], WORKLOAD
    )
    matchers = conv.matchers_frame(deployments=deployments, services=services)
    pod_par = conv.pod_nodes(
        _pod(spark), matchers=matchers, keep=["name", "namespace"]
    )
    svc = conv.service_nodes(
        services, ingresses=ingresses, pod_parents=pod_par
    ).collect()[0]
    attrs = json.loads(svc["attributes"])
    assert attrs["ports"] == "80/TCP,443:30443/TCP"
    assert "load_balancer_ip" not in attrs
    assert attrs["service_reference_name"] == "web"
    assert attrs["service_reference_type"] == "Deployment"
    assert json.loads(svc["parents"]) == ["Ingress:i1:ing"]

    ing = json.loads(conv.simple_nodes(ingresses, "Ingress").collect()[0]["attributes"])
    assert ing["load_balancer_ip"] == "1.2.3.4"
    assert ing["rules"] == [{"host": "h1", "paths": ["websvc:80:/api"]}]


def test_pvc_pv_configmap(spark):
    conv = K8sMetaV1Converter()
    pvc = spark.createDataFrame(
        [("v1", "claim", "ns", {}, "Bound", "beta-sc", "fast", "vol-1", "10Gi",
          ["ReadWriteOnce", "ReadOnlyMany"], 1, "1")],
        "uid string, name string, namespace string, labels map<string,string>, "
        "phase string, beta_storage_class string, storage_class string, "
        "volume string, capacity string, access_modes array<string>, "
        "creation_ts long, resource_version string",
    )
    a = json.loads(conv.simple_nodes(pvc, "PersistentVolumeClaim").collect()[0]["attributes"])
    assert a["storage_class"] == "beta-sc"  # beta annotation wins
    assert a["request_capacity"] == "10Gi"
    assert a["access_mode"] == "ReadWriteOnce"

    cm = spark.createDataFrame(
        [("c1", "cm", "ns", {}, None, 1, "1"), ("c2", "cm2", "ns", {}, True, 1, "1")],
        "uid string, name string, namespace string, labels map<string,string>, "
        "immutable boolean, creation_ts long, resource_version string",
    )
    rows = {r["id"]: json.loads(r["attributes"])
            for r in conv.simple_nodes(cm, "ConfigMap").collect()}
    assert "immutable" not in rows["c1"]
    assert rows["c2"]["immutable"] is True
