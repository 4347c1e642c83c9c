"""service_kubernetes_meta conversion (plugins/input/kubernetesmetav2/
meta_collector*.go; fixture shapes from service_meta_test.go:17-143)."""

from __future__ import annotations

import hashlib
import json

import pytest

from loongcollector_spark.operators.k8smeta import (
    K8sEntityConverter,
    K8sLinkConverter,
    K8sMetaConfig,
)

POD = {
    "apiVersion": "v1",
    "kind": "Pod",
    "metadata": {
        "creationTimestamp": "2024-03-01T10:00:00Z",
        "labels": {"version": "v1", "app": "nginx"},
        "annotations": {"owner": "team-a", "description": "test pod"},
    },
    "spec": {
        "containers": [
            {
                "name": "nginx",
                "image": "nginx:latest",
                "resources": {
                    "requests": {"cpu": "250m"},
                    "limits": {"cpu": "1", "memory": "128Mi"},
                },
                "ports": [{"containerPort": 80}, {"containerPort": 8443}],
                "volumeMounts": [{"name": "cfg", "mountPath": "/etc/cfg"}],
            },
            {"name": "sidecar", "image": "envoy:2"},
        ]
    },
    "status": {"phase": "Running", "podIP": "10.0.0.1"},
}


def _obs(spark, kind, ns, name, payload, method="Update", fot=100, lot=200):
    return spark.createDataFrame(
        [(1, kind, ns, name, method, fot, lot, json.dumps(payload))],
        "doc_id long, kind string, namespace string, name string, method string,"
        " first_observed_time long, last_observed_time long, payload string",
    )


def _md5(cluster_id, kind, ns, name):
    return hashlib.md5((cluster_id + kind + ns + name).encode()).hexdigest()


CFG = K8sMetaConfig(
    cluster_id="c-1", cluster_name="prod", cluster_region="eu-1", interval=10,
    enable_labels=True, enable_annotations=True, container=True,
)


def _fields(df):
    rows = df.collect()
    return [dict(r["fields"]) for r in rows]


def test_pod_entity(spark):
    (f,) = _fields(K8sEntityConverter(CFG).apply(_obs(spark, "Pod", "test-ns", "test-pod", POD)))
    assert f["__domain__"] == "k8s"
    assert f["__entity_type__"] == "k8s.pod"
    assert f["__entity_id__"] == _md5("c-1", "Pod", "test-ns", "test-pod")
    assert f["__method__"] == "Update"
    assert f["__first_observed_time__"] == "100"
    assert f["__last_observed_time__"] == "200"
    assert f["__keep_alive_seconds__"] == "20"  # Interval*2
    assert f["__category__"] == "entity"
    assert f["cluster_id"] == "c-1"
    assert f["kind"] == "Pod" and f["name"] == "test-pod"
    assert f["create_time"] == "2024-03-01T10:00:00Z"
    assert f["api_version"] == "v1" and f["namespace"] == "test-ns"
    # Go json.Marshal map: sorted keys
    assert f["labels"] == '{"app":"nginx","version":"v1"}'
    assert f["annotations"] == '{"description":"test pod","owner":"team-a"}'
    assert f["status"] == "Running" and f["instance_ip"] == "10.0.0.1"
    assert f["containers"] == (
        '[{"image":"nginx:latest","name":"nginx"},{"image":"envoy:2","name":"sidecar"}]'
    )


def test_pod_labels_annotations_gating(spark):
    df = _obs(spark, "Pod", "test-ns", "test-pod", POD)
    for el, ea in [(False, False), (True, False), (False, True)]:
        cfg = K8sMetaConfig(cluster_id="c-1", enable_labels=el, enable_annotations=ea)
        (f,) = _fields(K8sEntityConverter(cfg).apply(df))
        assert ("labels" in f) == el
        assert ("annotations" in f) == ea


def test_container_entities(spark):
    df = _obs(spark, "Pod", "test-ns", "test-pod", POD)
    out = _fields(K8sEntityConverter(CFG).container_entities(df))
    assert len(out) == 2
    main = next(f for f in out if f["name"] == "nginx")
    side = next(f for f in out if f["name"] == "sidecar")
    assert main["__entity_type__"] == "k8s.container"
    assert main["__entity_id__"] == _md5("c-1", "container", "test-ns", "test-podnginx")
    assert main["pod_name"] == "test-pod" and main["pod_namespace"] == "test-ns"
    assert main["image"] == "nginx:latest"
    assert main["cpu_request"] == "250m"
    # requests map present without memory → zero Quantity → "0"
    assert main["memory_request"] == "0"
    assert main["cpu_limit"] == "1" and main["memory_limit"] == "128Mi"
    assert main["container_ports"] == "[80,8443]"
    assert main["volumes"] == '[{"volumeMountName":"cfg","volumeMountPath":"/etc/cfg"}]'
    # no resources at all → nil ResourceList → ""
    assert side["cpu_request"] == "" and side["memory_limit"] == ""
    assert side["container_ports"] == "[]" and side["volumes"] == "[]"
    assert "kind" not in side and "create_time" not in side


def test_node_entity(spark):
    node = {
        "apiVersion": "v1",
        "kind": "Node",
        "metadata": {"creationTimestamp": "2023-01-02T03:04:05Z"},
        "spec": {"providerID": "prov-1"},
        "status": {
            "conditions": [{"type": "Ready", "status": "True", "reason": "x"}],
            "addresses": [
                {"type": "InternalIP", "address": "192.168.1.9"},
                {"type": "Hostname", "address": "node-a"},
            ],
            "capacity": {"pods": "110", "cpu": "8"},
            "allocatable": {"cpu": "7900m"},
        },
    }
    (f,) = _fields(K8sEntityConverter(CFG).apply(_obs(spark, "Node", "", "node-a", node)))
    assert f["__entity_type__"] == "k8s.node"
    assert f["__entity_id__"] == _md5("c-1", "Node", "", "node-a")
    # []map{status,type}: sorted keys
    assert f["status"] == '[{"status":"True","type":"Ready"}]'
    assert f["internal_ip"] == "192.168.1.9"
    assert f["host_name"] == "node-a"
    assert f["capacity"] == '{"cpu":"8","pods":"110"}'
    assert f["allocatable"] == '{"cpu":"7900m"}'
    # struct marshal: declaration order type,address
    assert f["addresses"] == (
        '[{"type":"InternalIP","address":"192.168.1.9"},'
        '{"type":"Hostname","address":"node-a"}]'
    )
    assert f["provider_id"] == "prov-1"


def test_node_nil_maps_marshal_null(spark):
    node = {"apiVersion": "v1", "kind": "Node", "metadata": {}, "status": {}}
    (f,) = _fields(K8sEntityConverter(CFG).apply(_obs(spark, "Node", "", "n2", node)))
    # bare json.Marshal(nil map/slice) → "null"; conditions go through
    # processEntityJSONArray → "[]"
    assert f["capacity"] == "null" and f["allocatable"] == "null"
    assert f["addresses"] == "null"
    assert f["status"] == "[]"
    assert "internal_ip" not in f and "host_name" not in f
    assert f["provider_id"] == ""
    assert f["create_time"] == "0001-01-01T00:00:00Z"  # Go zero time


def test_service_entity(spark):
    svc = {
        "apiVersion": "v1",
        "kind": "Service",
        "metadata": {"creationTimestamp": "2024-01-01T00:00:00Z"},
        "spec": {
            "selector": {"app": "nginx"},
            "type": "ClusterIP",
            "clusterIP": "10.96.0.10",
            "ports": [
                {"port": 80, "targetPort": 8080, "protocol": "TCP"},
                {"port": 443, "targetPort": "https-alt", "protocol": "TCP"},
            ],
        },
    }
    (f,) = _fields(K8sEntityConverter(CFG).apply(_obs(spark, "Service", "ns1", "svc-a", svc)))
    assert f["selector"] == '{"app":"nginx"}'
    assert f["type"] == "ClusterIP" and f["cluster_ip"] == "10.96.0.10"
    # IntOrString targetPort: int renders via FormatInt, string verbatim
    assert f["ports"] == (
        '[{"port":"80","protocol":"TCP","targetPort":"8080"},'
        '{"port":"443","protocol":"TCP","targetPort":"https-alt"}]'
    )


def test_workload_entities(spark):
    dep = {
        "apiVersion": "apps/v1",
        "kind": "Deployment",
        "metadata": {"creationTimestamp": "2024-01-01T00:00:00Z"},
        "spec": {
            "selector": {"matchLabels": {"app": "web"}},
            "replicas": 3,
            "template": {"spec": {"containers": [{"name": "web", "image": "web:9"}]}},
        },
        "status": {"readyReplicas": 2},
    }
    (f,) = _fields(K8sEntityConverter(CFG).apply(_obs(spark, "Deployment", "ns1", "dep-a", dep)))
    assert f["match_labels"] == '{"app":"web"}'
    assert f["replicas"] == "3" and f["ready_replicas"] == "2"
    assert f["containers"] == '[{"image":"web:9","name":"web"}]'

    # nil *int32 replicas → "" (safeGetInt32String); absent readyReplicas → 0
    bare = {"kind": "StatefulSet", "metadata": {}, "spec": {}}
    (f,) = _fields(K8sEntityConverter(CFG).apply(_obs(spark, "StatefulSet", "ns1", "sts", bare)))
    assert f["replicas"] == "" and f["match_labels"] == "{}" and f["containers"] == "[]"

    job = {
        "kind": "Job",
        "metadata": {},
        "spec": {
            "suspend": False,
            "backoffLimit": 6,
            "completions": 1,
            "template": {"spec": {"containers": [{"name": "j", "image": "j:1"}]}},
        },
        "status": {"active": 1, "succeeded": 0, "failed": 2},
    }
    (f,) = _fields(K8sEntityConverter(CFG).apply(_obs(spark, "Job", "ns1", "job-a", job)))
    # JobStatus subset marshal: declaration order + omitempty drops zeros
    assert f["status"] == '{"active":1,"failed":2}'
    assert f["suspend"] == "false"
    assert f["backoff_limit"] == "6" and f["completion"] == "1"

    cj = {"kind": "CronJob", "metadata": {}, "spec": {"schedule": "0 * * * *", "suspend": True}}
    (f,) = _fields(K8sEntityConverter(CFG).apply(_obs(spark, "CronJob", "ns1", "cj", cj)))
    assert f["schedule"] == "0 * * * *" and f["suspend"] == "true"


def test_pvc_storageclass(spark):
    pvc = {
        "kind": "PersistentVolumeClaim",
        "metadata": {},
        "spec": {"storageClassName": "fast", "volumeName": "pv-1", "resources": {}},
        "status": {"phase": "Bound"},
    }
    (f,) = _fields(
        K8sEntityConverter(CFG).apply(_obs(spark, "PersistentVolumeClaim", "ns1", "pvc", pvc))
    )
    # Requests.Storage() has NO nil guard in the reference → zero → "0"
    assert f["storeage_requests"] == "0"
    assert f["status"] == "Bound" and f["volume_name"] == "pv-1"

    sc = {
        "apiVersion": "storage.k8s.io/v1",
        "kind": "StorageClass",
        "metadata": {},
        "reclaimPolicy": "Delete",
        "volumeBindingMode": "WaitForFirstConsumer",
    }
    (f,) = _fields(K8sEntityConverter(CFG).apply(_obs(spark, "StorageClass", "", "sc", sc)))
    assert f["reclaim_policy"] == "Delete"
    assert f["volume_binding_mode"] == "WaitForFirstConsumer"
    assert "namespace" not in f


def test_unknown_kind_dropped(spark):
    out = K8sEntityConverter(CFG).apply(
        _obs(spark, "Lease", "ns1", "x", {"kind": "Lease"})
    ).collect()
    assert out == []


def test_links(spark):
    cfg = K8sMetaConfig(
        cluster_id="c-1", interval=10,
        relations={"Node2Pod": "runs", "Pod2Container": "contains", "Service2Pod": ""},
    )
    rows = [
        (1, "Node2Pod", "Node", "", "node-a", "Pod", "ns1", "pod-a", "Update", 5, 9),
        (2, "Pod2Container", "Pod", "ns1", "pod-a", "container", "ns1", "pod-anginx", "Update", 5, 9),
        (3, "Service2Pod", "Service", "ns1", "svc", "Pod", "ns1", "pod-a", "Update", 5, 9),  # disabled
        (4, "Ingress2Service", "Ingress", "ns1", "ing", "Service", "ns1", "svc", "Update", 5, 9),  # unconfigured
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id long, link string, src_kind string, src_namespace string, src_name string,"
        " dest_kind string, dest_namespace string, dest_name string, method string,"
        " first_observed_time long, last_observed_time long",
    )
    out = {r["doc_id"]: dict(r["fields"]) for r in K8sLinkConverter(cfg).apply(df).collect()}
    assert set(out) == {1, 2}
    f = out[1]
    assert f["__src_entity_type__"] == "k8s.node"
    assert f["__src_entity_id__"] == _md5("c-1", "Node", "", "node-a")
    assert f["__dest_entity_type__"] == "k8s.pod"
    assert f["__dest_entity_id__"] == _md5("c-1", "Pod", "ns1", "pod-a")
    assert f["__relation_type__"] == "runs"
    assert f["__category__"] == "entity_link"
    assert f["__first_observed_time__"] == "5" and f["__last_observed_time__"] == "9"
    assert out[2]["__dest_entity_id__"] == _md5("c-1", "container", "ns1", "pod-anginx")
    assert out[2]["__relation_type__"] == "contains"


def test_cluster_entity_and_links(spark):
    cfg = K8sMetaConfig(
        cluster_id="c-1", cluster_name="prod", cluster_region="eu-1", interval=10,
        cluster_relations={"node": "contains_node", "namespace": "contains_ns"},
    )
    conv = K8sEntityConverter(cfg)
    (f,) = _fields(conv.cluster_entity(spark, 777))
    assert f["__entity_type__"] == "k8s.cluster"
    assert f["__entity_id__"] == _md5("c-1", "cluster", "", "")
    assert f["__method__"] == "Update"
    assert f["cluster_name"] == "prod" and f["region_id"] == "eu-1"
    assert f["__first_observed_time__"] == "777"

    node = {"kind": "Node", "metadata": {}, "status": {}}
    cm = {"kind": "ConfigMap", "metadata": {}}
    ents = conv.apply(
        _obs(spark, "Node", "", "node-a", node).union(_obs(spark, "ConfigMap", "ns1", "cm", cm))
    )
    links = _fields(conv.cluster_links(ents))
    assert len(links) == 1  # configmap is not cluster-linkable
    (l,) = links
    assert l["__src_entity_id__"] == _md5("c-1", "cluster", "", "")
    assert l["__dest_entity_type__"] == "k8s.node"
    assert l["__dest_entity_id__"] == _md5("c-1", "Node", "", "node-a")
    assert l["__relation_type__"] == "contains_node"
    assert l["__category__"] == "entity_link"


def test_cluster_links_disabled(spark):
    conv = K8sEntityConverter(K8sMetaConfig(cluster_id="c-1"))
    node = {"kind": "Node", "metadata": {}, "status": {}}
    ents = conv.apply(_obs(spark, "Node", "", "node-a", node))
    assert conv.cluster_links(ents).collect() == []
