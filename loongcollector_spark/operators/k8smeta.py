"""service_kubernetes_meta — K8s object observations → entity / link logs.

Reference semantics (studied, not ported): plugins/input/kubernetesmetav2/
meta_collector.go:271-485 (processEntityCommonPart / processEntityLinkCommonPart
/ genKey = md5 hex of clusterID+kind+namespace+name / genEntityTypeKey =
domain.lower(kind) / processEntityJSONObject|Array = Go json.Marshal: sorted
map keys, nil→"{}"/"[]"), the per-kind custom-field switches in
meta_collector_core.go / _app.go / _batch.go / _networking.go / _storage.go,
canClusterLinkDirectly (meta_collector.go:205-222) and
generateClusterEntity/generateEntityClusterLink (:410-448).

The watch/informer machinery (pkg/helper/k8smeta) is agent transport; the
CONTENTFUL part is the object→log conversion. Table model: one row per object
observation with (kind, namespace, name, method, first_observed_time,
last_observed_time, payload) where ``payload`` is the object manifest JSON.
Everything below is pure Column expressions over two ``from_json`` parses —
one linear scan, zero shuffle, whole-stage-codegen friendly.

Divergences (documented):
- ``log.Timestamp = time.Now()`` is wall clock → excluded from the table
  model (observed times carry the data-derived timestamps).
- Pod→infra.server links (processInfraServerLink) depend on cloud flags
  (ClusterType/ecs labels) — out of scope with the other env-coupled inputs.
- Job ``status`` renders the {active,succeeded,failed} subset of
  batch.JobStatus in declaration order with omitempty semantics.
- K8s Quantity strings pass through verbatim (canonical-form inputs);
  ``Quantity.String()`` re-canonicalization (e.g. "0.5"→"500m") is not
  re-implemented.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Mapping

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

from .base import FIELDS
from .common import flet

# entity reserved field names (meta_collector_const.go, "keep same with
# EntityConstants.cpp")
DOMAIN = "__domain__"
ENTITY_TYPE = "__entity_type__"
ENTITY_ID = "__entity_id__"
METHOD = "__method__"
FIRST_OBSERVED = "__first_observed_time__"
LAST_OBSERVED = "__last_observed_time__"
KEEP_ALIVE = "__keep_alive_seconds__"
CATEGORY = "__category__"
SRC_DOMAIN = "__src_domain__"
SRC_TYPE = "__src_entity_type__"
SRC_ID = "__src_entity_id__"
DEST_DOMAIN = "__dest_domain__"
DEST_TYPE = "__dest_entity_type__"
DEST_ID = "__dest_entity_id__"
RELATION = "__relation_type__"

_ZERO_TIME = "0001-01-01T00:00:00Z"  # Go zero time.Time, RFC3339

_META_T = (
    "metadata struct<creationTimestamp string, labels map<string,string>,"
    " annotations map<string,string>>"
)

# core/v1 kinds: Pod / Node / Service / ConfigMap / Namespace / PV / PVC,
# plus StorageClass's top-level fields (no name conflicts with spec)
_CORE_T = f"""struct<
  apiVersion string, {_META_T},
  spec struct<
    containers array<struct<name string, image string,
      resources struct<requests map<string,string>, limits map<string,string>>,
      ports array<struct<containerPort bigint>>,
      volumeMounts array<struct<name string, mountPath string>>>>,
    selector map<string,string>, type string, clusterIP string,
    ports array<struct<port bigint, targetPort string, protocol string>>,
    providerID string, storageClassName string,
    persistentVolumeReclaimPolicy string, volumeMode string,
    capacity map<string,string>, csi struct<fsType string>,
    resources struct<requests map<string,string>>, volumeName string>,
  status struct<phase string, podIP string,
    conditions array<struct<type string, status string>>,
    addresses array<struct<type string, address string>>,
    capacity map<string,string>, allocatable map<string,string>>,
  reclaimPolicy string, volumeBindingMode string>"""

# apps/batch kinds: Deployment / DaemonSet / StatefulSet / ReplicaSet / Job /
# CronJob (spec.selector is a LabelSelector struct here, not a map — the one
# schema conflict that forces the second parse)
_APP_T = """struct<
  spec struct<selector struct<matchLabels map<string,string>>, replicas bigint,
    template struct<spec struct<containers array<struct<name string, image string>>>>,
    suspend boolean, backoffLimit bigint, completions bigint, schedule string>,
  status struct<readyReplicas bigint, active bigint, succeeded bigint, failed bigint>>"""


def _s(c: Column) -> Column:
    return F.coalesce(c, F.lit(""))


def go_obj_json(m: Column) -> Column:
    """processEntityJSONObject: map → Go json.Marshal text (sorted keys,
    no whitespace), nil → "{}"."""
    rendered = F.to_json(F.map_from_entries(F.array_sort(F.map_entries(m))))
    return F.coalesce(rendered, F.lit("{}"))


def _go_marshal_map(m: Column) -> Column:
    """Bare json.Marshal of a (possibly nil) map: nil → "null"."""
    rendered = F.to_json(F.map_from_entries(F.array_sort(F.map_entries(m))))
    return F.coalesce(rendered, F.lit("null"))


def name_image_json(containers: Column) -> Column:
    """The recurring []map{"name","image"} render: sorted keys put image
    first; nil/empty container list → "[]" (processEntityJSONArray)."""
    arr = F.transform(
        containers,
        lambda c: F.struct(
            _s(c.getField("image")).alias("image"), _s(c.getField("name")).alias("name")
        ),
    )
    return F.coalesce(F.to_json(arr), F.lit("[]"))


def _quantity(requests: Column, key: str) -> Column:
    """Resources.Requests.Cpu().String() shape: nil ResourceList → "",
    present map without the key → zero Quantity → "0"."""
    return F.when(requests.isNull(), F.lit("")).otherwise(
        F.coalesce(F.element_at(requests, F.lit(key)), F.lit("0"))
    )


def _job_status_json(st: Column) -> Column:
    """json.Marshal(batch.JobStatus) restricted to the active/succeeded/failed
    subset: declaration order, omitempty (zero/absent fields dropped)."""
    parts = F.filter(
        F.array(
            *[
                F.when(
                    st.getField(k).isNotNull() & (st.getField(k) != 0),
                    F.concat(F.lit(f'"{k}":'), st.getField(k).cast("string")),
                )
                for k in ("active", "succeeded", "failed")
            ]
        ),
        lambda x: x.isNotNull(),
    )
    return F.concat(F.lit("{"), F.array_join(parts, ","), F.lit("}"))


@dataclass
class K8sMetaConfig:
    """ServiceK8sMeta knobs (service_meta.go:14-87) that shape the OUTPUT."""

    cluster_id: str = ""
    cluster_name: str = ""
    cluster_region: str = ""
    domain: str = "k8s"
    interval: int = 60
    enable_labels: bool = False
    enable_annotations: bool = False
    container: bool = False
    # link-kind → relation-type strings (Node2Pod, Pod2Container, …); empty
    # string = link disabled, like the reference's config fields
    relations: Mapping[str, str] = field(default_factory=dict)
    # cluster → entity direct links (canClusterLinkDirectly): lower-kind → rel
    cluster_relations: Mapping[str, str] = field(default_factory=dict)

    def type_key(self, kind: Column | str) -> Column:
        kc = F.lit(kind) if isinstance(kind, str) else kind
        return F.concat(F.lit(self.domain + "."), F.lower(kc))

    def gen_key(self, kind: Column | str, ns: Column | str, name: Column) -> Column:
        kc = F.lit(kind) if isinstance(kind, str) else kind
        nc = F.lit(ns) if isinstance(ns, str) else ns
        return F.md5(F.concat(F.lit(self.cluster_id), kc, _s(nc), _s(name)))


@dataclass
class K8sEntityConverter:
    """K8s object rows → entity logs, one CASE-on-kind projection pass.

    Input columns: ``kind namespace name method first_observed_time
    last_observed_time payload``; every other column passes through."""

    cfg: K8sMetaConfig = field(default_factory=K8sMetaConfig)

    KINDS = (
        "Pod", "Node", "Service", "ConfigMap", "Namespace", "PersistentVolume",
        "PersistentVolumeClaim", "Deployment", "DaemonSet", "StatefulSet",
        "ReplicaSet", "Job", "CronJob", "Ingress", "StorageClass",
    )

    def _common(self) -> dict[str, Column]:
        cfg = self.cfg
        kind, ns, name = F.col("kind"), F.col("namespace"), F.col("name")
        return {
            DOMAIN: F.lit(cfg.domain),
            ENTITY_TYPE: cfg.type_key(kind),
            ENTITY_ID: cfg.gen_key(kind, ns, name),
            METHOD: F.col("method"),
            FIRST_OBSERVED: F.col("first_observed_time").cast("string"),
            LAST_OBSERVED: F.col("last_observed_time").cast("string"),
            KEEP_ALIVE: F.lit(str(cfg.interval * 2)),
            CATEGORY: F.lit("entity"),
            "cluster_id": F.lit(cfg.cluster_id),
            "kind": kind,
            "name": name,
        }

    def _labels_annotations(self, meta: Column) -> dict[str, Column]:
        out: dict[str, Column] = {}
        if self.cfg.enable_labels:
            out["labels"] = go_obj_json(meta.getField("labels"))
        if self.cfg.enable_annotations:
            out["annotations"] = go_obj_json(meta.getField("annotations"))
        return out

    def _kind_fields(self, core: Column, app: Column) -> Column:
        """The per-kind custom-field switch as one chained CASE."""
        meta = core.getField("metadata")
        api = _s(core.getField("apiVersion"))
        ns = F.col("namespace")
        spec, st = core.getField("spec"), core.getField("status")
        aspec, ast = app.getField("spec"), app.getField("status")
        la = self._labels_annotations(meta)

        def m(pairs: dict[str, Column]) -> Column:
            args: list[Column] = []
            for k, v in pairs.items():
                args.extend([F.lit(k), v])
            return F.create_map(*args)

        def workload(extra: dict[str, Column]) -> Column:
            """Deployment/DaemonSet/StatefulSet/ReplicaSet shared shape."""
            sel = aspec.getField("selector")
            return m({
                "api_version": api, "namespace": ns, **la,
                "match_labels": F.when(
                    sel.isNull(), F.lit("{}")
                ).otherwise(go_obj_json(sel.getField("matchLabels"))),
                **extra,
                "containers": name_image_json(
                    aspec.getField("template").getField("spec").getField("containers")
                ),
            })

        replicas = _s(aspec.getField("replicas").cast("string"))
        suspend = _s(aspec.getField("suspend").cast("string"))
        addrs = st.getField("addresses")

        def addr_of(t: str) -> Column:
            # F.get (not element_at): NULL on empty match, no ANSI index error
            hit = F.filter(addrs, lambda a: a.getField("type") == t)
            return F.get(hit, 0).getField("address")

        # internal_ip / host_name keys only exist when the address loop hits
        node_addr = F.map_from_entries(
            F.filter(
                F.array(
                    F.struct(F.lit("internal_ip").alias("k"), addr_of("InternalIP").alias("v")),
                    F.struct(F.lit("host_name").alias("k"), addr_of("Hostname").alias("v")),
                ),
                lambda e: e.getField("v").isNotNull(),
            )
        )
        kind = F.col("kind")
        return (
            F.when(kind == "Pod", m({
                "api_version": api, "namespace": ns, **la,
                "status": _s(st.getField("phase")),
                "instance_ip": _s(st.getField("podIP")),
                "containers": name_image_json(spec.getField("containers")),
            }))
            .when(kind == "Node", F.map_concat(m({
                **la,
                "status": F.coalesce(
                    F.to_json(F.transform(
                        st.getField("conditions"),
                        lambda c: F.struct(
                            _s(c.getField("status")).alias("status"),
                            _s(c.getField("type")).alias("type"),
                        ),
                    )),
                    F.lit("[]"),
                ),
                "capacity": _go_marshal_map(st.getField("capacity")),
                "allocatable": _go_marshal_map(st.getField("allocatable")),
                # v1.NodeAddress struct marshal: declaration order type,address
                "addresses": F.coalesce(
                    F.to_json(F.transform(
                        addrs,
                        lambda a: F.struct(
                            _s(a.getField("type")).alias("type"),
                            _s(a.getField("address")).alias("address"),
                        ),
                    )),
                    F.lit("null"),
                ),
                "provider_id": _s(spec.getField("providerID")),
            }), node_addr))
            .when(kind == "Service", m({
                "api_version": api, "namespace": ns, **la,
                "selector": go_obj_json(spec.getField("selector")),
                "type": _s(spec.getField("type")),
                "cluster_ip": _s(spec.getField("clusterIP")),
                # []map{"port","targetPort","protocol"} → sorted keys
                "ports": F.coalesce(
                    F.to_json(F.transform(
                        spec.getField("ports"),
                        lambda p: F.struct(
                            _s(p.getField("port").cast("string")).alias("port"),
                            _s(p.getField("protocol")).alias("protocol"),
                            _s(p.getField("targetPort")).alias("targetPort"),
                        ),
                    )),
                    F.lit("[]"),
                ),
            }))
            .when(kind == "ConfigMap", m({"api_version": api, "namespace": ns, **la}))
            .when(kind == "Ingress", m({"api_version": api, "namespace": ns, **la}))
            .when(kind == "Namespace", m({
                "api_version": api, "kind": F.col("kind"), "name": F.col("name"), **la,
            }))
            .when(kind == "PersistentVolume", m({
                "api_version": api, "namespace": ns, **la,
                "status": _s(st.getField("phase")),
                "storage_class_name": _s(spec.getField("storageClassName")),
                "persistent_volume_reclaim_policy": _s(
                    spec.getField("persistentVolumeReclaimPolicy")
                ),
                "volume_mode": _s(spec.getField("volumeMode")),
                "capacity": F.when(
                    spec.getField("capacity").isNull(), F.lit("")
                ).otherwise(
                    F.coalesce(
                        F.element_at(spec.getField("capacity"), F.lit("storage")),
                        F.lit("0"),
                    )
                ),
                "fsType": _s(spec.getField("csi").getField("fsType")),
            }))
            .when(kind == "PersistentVolumeClaim", m({
                "api_version": api, "namespace": ns, **la,
                "status": _s(st.getField("phase")),
                # [sic] reference key name; no nil guard there — a nil
                # Requests map still yields Storage().String() == "0"
                "storeage_requests": F.coalesce(
                    F.element_at(
                        spec.getField("resources").getField("requests"),
                        F.lit("storage"),
                    ),
                    F.lit("0"),
                ),
                "storage_class_name": _s(spec.getField("storageClassName")),
                "volume_name": _s(spec.getField("volumeName")),
            }))
            .when(kind == "Deployment", workload({
                "replicas": replicas,
                "ready_replicas": F.coalesce(
                    ast.getField("readyReplicas"), F.lit(0)
                ).cast("string"),
            }))
            .when(kind == "DaemonSet", workload({}))
            .when(kind == "StatefulSet", workload({"replicas": replicas}))
            .when(kind == "ReplicaSet", workload({"replicas": replicas}))
            .when(kind == "Job", m({
                "api_version": api, "namespace": ns, **la,
                "status": _job_status_json(ast),
                "containers": name_image_json(
                    aspec.getField("template").getField("spec").getField("containers")
                ),
                "suspend": suspend,
                "backoff_limit": _s(aspec.getField("backoffLimit").cast("string")),
                "completion": _s(aspec.getField("completions").cast("string")),
            }))
            .when(kind == "CronJob", m({
                "api_version": api, "namespace": ns, **la,
                "schedule": _s(aspec.getField("schedule")),
                "suspend": suspend,
            }))
            .when(kind == "StorageClass", m({
                "api_version": api, **la,
                "reclaim_policy": _s(core.getField("reclaimPolicy")),
                "volume_binding_mode": _s(core.getField("volumeBindingMode")),
            }))
        )

    def apply(self, df: DataFrame) -> DataFrame:
        model = {"kind", "namespace", "name", "method",
                 "first_observed_time", "last_observed_time", "payload"}
        passthrough = [c for c in df.columns if c not in model]
        common = self._common()
        create = F.date_format(
            F.to_timestamp(F.get_json_object(
                F.col("payload"), "$.metadata.creationTimestamp"
            )),
            "yyyy-MM-dd'T'HH:mm:ssXXX",
        )
        core = F.from_json(F.col("payload"), _CORE_T)
        app = F.from_json(F.col("payload"), _APP_T)
        bound = F.struct(core.alias("core"), app.alias("app"))
        fields = flet(
            bound, lambda b: self._kind_fields(b.getField("core"), b.getField("app"))
        )

        def pairs(d: dict[str, Column]) -> list[Column]:
            out: list[Column] = []
            for k, v in d.items():
                out.extend([F.lit(k), v])
            return out

        base = F.create_map(
            *pairs(common), F.lit("create_time"), F.coalesce(create, F.lit(_ZERO_TIME))
        )
        return (
            df.where(F.col("kind").isin(*self.KINDS))
            .select(*passthrough, F.map_concat(base, fields).alias(FIELDS))
        )

    def container_entities(self, df: DataFrame) -> DataFrame:
        """Pod rows → one child entity per spec container (Container=true,
        meta_collector_core.go:45-117): pod/resource/port/volume fields,
        id = genKey("container", ns, podName+containerName)."""
        cfg = self.cfg
        model = {"kind", "namespace", "name", "method",
                 "first_observed_time", "last_observed_time", "payload"}
        passthrough = [c for c in df.columns if c not in model]
        core = F.from_json(F.col("payload"), _CORE_T)
        pods = df.where(F.col("kind") == "Pod").select(
            *passthrough,
            F.col("namespace"), F.col("name"), F.col("method"),
            F.col("first_observed_time"), F.col("last_observed_time"),
            F.explode(core.getField("spec").getField("containers")).alias("c"),
        )
        c = F.col("c")
        req = c.getField("resources").getField("requests")
        lim = c.getField("resources").getField("limits")
        volumes = F.coalesce(
            F.to_json(F.transform(
                c.getField("volumeMounts"),
                lambda v: F.struct(
                    _s(v.getField("name")).alias("volumeMountName"),
                    _s(v.getField("mountPath")).alias("volumeMountPath"),
                ),
            )),
            F.lit("[]"),
        )
        ports = F.coalesce(
            F.to_json(F.transform(c.getField("ports"), lambda p: p.getField("containerPort"))),
            F.lit("[]"),
        )
        fields = F.create_map(
            F.lit(DOMAIN), F.lit(cfg.domain),
            F.lit(ENTITY_TYPE), cfg.type_key("container"),
            F.lit(ENTITY_ID), cfg.gen_key(
                "container", F.col("namespace"),
                F.concat(F.col("name"), _s(c.getField("name"))),
            ),
            F.lit(METHOD), F.col("method"),
            F.lit(FIRST_OBSERVED), F.col("first_observed_time").cast("string"),
            F.lit(LAST_OBSERVED), F.col("last_observed_time").cast("string"),
            F.lit(KEEP_ALIVE), F.lit(str(cfg.interval * 2)),
            F.lit(CATEGORY), F.lit("entity"),
            F.lit("cluster_id"), F.lit(cfg.cluster_id),
            F.lit("name"), _s(c.getField("name")),
            F.lit("pod_name"), F.col("name"),
            F.lit("pod_namespace"), F.col("namespace"),
            F.lit("image"), _s(c.getField("image")),
            F.lit("cpu_request"), _quantity(req, "cpu"),
            F.lit("cpu_limit"), _quantity(lim, "cpu"),
            F.lit("memory_request"), _quantity(req, "memory"),
            F.lit("memory_limit"), _quantity(lim, "memory"),
            F.lit("container_ports"), ports,
            F.lit("volumes"), volumes,
        )
        return pods.select(*passthrough, fields.alias(FIELDS))

    def cluster_entity(self, spark: SparkSession, observed_time: int) -> DataFrame:
        """generateClusterEntity (meta_collector.go:410-428); the reference
        stamps time.Now() — the caller supplies it here."""
        cfg = self.cfg
        row = [(observed_time,)]
        df = spark.createDataFrame(row, "t long")
        fields = F.create_map(
            F.lit(DOMAIN), F.lit(cfg.domain),
            F.lit(ENTITY_TYPE), cfg.type_key("cluster"),
            F.lit(ENTITY_ID), cfg.gen_key("cluster", "", F.lit("")),
            F.lit(METHOD), F.lit("Update"),
            F.lit(FIRST_OBSERVED), F.col("t").cast("string"),
            F.lit(LAST_OBSERVED), F.col("t").cast("string"),
            F.lit(KEEP_ALIVE), F.lit(str(cfg.interval * 2)),
            F.lit(CATEGORY), F.lit("entity"),
            F.lit("cluster_id"), F.lit(cfg.cluster_id),
            F.lit("cluster_name"), F.lit(cfg.cluster_name),
            F.lit("region_id"), F.lit(cfg.cluster_region),
        )
        return df.select(fields.alias(FIELDS))

    def cluster_links(self, entities: DataFrame) -> DataFrame:
        """generateEntityClusterLink over already-converted entity rows, gated
        by canClusterLinkDirectly: only namespace/node/persistentvolume/
        storageclass kinds with a configured Cluster2X relation."""
        cfg = self.cfg
        if not cfg.cluster_relations:
            return entities.limit(0)
        fm = F.col(FIELDS)

        def g(k: str) -> Column:
            return F.element_at(fm, F.lit(k))

        lk = F.lower(g("kind"))
        rel = None
        cond = F.lit(False)
        for kind_lower, relation in cfg.cluster_relations.items():
            hit = lk == kind_lower
            cond = cond | hit
            rel = F.when(hit, F.lit(relation)) if rel is None else rel.when(hit, F.lit(relation))
        passthrough = [c for c in entities.columns if c != FIELDS]
        fields = F.create_map(
            F.lit(SRC_DOMAIN), F.lit(cfg.domain),
            F.lit(SRC_TYPE), cfg.type_key("cluster"),
            F.lit(SRC_ID), cfg.gen_key("cluster", "", F.lit("")),
            F.lit(DEST_DOMAIN), F.lit(cfg.domain),
            F.lit(DEST_TYPE), g(ENTITY_TYPE),
            F.lit(DEST_ID), g(ENTITY_ID),
            F.lit(RELATION), rel,
            F.lit(METHOD), g(METHOD),
            F.lit(FIRST_OBSERVED), g(FIRST_OBSERVED),
            F.lit(LAST_OBSERVED), g(LAST_OBSERVED),
            F.lit(KEEP_ALIVE), F.lit(str(cfg.interval * 2)),
            F.lit(CATEGORY), F.lit("entity_link"),
        )
        return entities.where(cond).select(*passthrough, fields.alias(FIELDS))


@dataclass
class K8sLinkConverter:
    """Relation pairs → entity-link logs (the 20+ processXYLink funcs are this
    one shape: link common part + the config relation type for the pair kind).

    Input columns: ``link`` (pair kind, e.g. "Node2Pod" — must have a relation
    configured, rows with unconfigured kinds are dropped like the reference's
    empty-string switch), ``src_kind src_namespace src_name dest_kind
    dest_namespace dest_name method first_observed_time last_observed_time``.
    Pod2Container pairs carry dest_name = podName+containerName
    (meta_collector_core.go:366)."""

    cfg: K8sMetaConfig = field(default_factory=K8sMetaConfig)

    def apply(self, df: DataFrame) -> DataFrame:
        cfg = self.cfg
        model = {"link", "src_kind", "src_namespace", "src_name", "dest_kind",
                 "dest_namespace", "dest_name", "method",
                 "first_observed_time", "last_observed_time"}
        passthrough = [c for c in df.columns if c not in model]
        rel: Column | None = None
        cond = F.lit(False)
        for link_kind, relation in cfg.relations.items():
            if not relation:
                continue
            hit = F.col("link") == link_kind
            cond = cond | hit
            rel = F.when(hit, F.lit(relation)) if rel is None else rel.when(hit, F.lit(relation))
        if rel is None:
            return df.limit(0).select(*passthrough, F.expr("map()").alias(FIELDS))
        fields = F.create_map(
            F.lit(SRC_DOMAIN), F.lit(cfg.domain),
            F.lit(SRC_TYPE), cfg.type_key(F.col("src_kind")),
            F.lit(SRC_ID), cfg.gen_key(
                F.col("src_kind"), F.col("src_namespace"), F.col("src_name")
            ),
            F.lit(DEST_DOMAIN), F.lit(cfg.domain),
            F.lit(DEST_TYPE), cfg.type_key(F.col("dest_kind")),
            F.lit(DEST_ID), cfg.gen_key(
                F.col("dest_kind"), F.col("dest_namespace"), F.col("dest_name")
            ),
            F.lit(METHOD), F.col("method"),
            F.lit(FIRST_OBSERVED), F.col("first_observed_time").cast("string"),
            F.lit(LAST_OBSERVED), F.col("last_observed_time").cast("string"),
            F.lit(KEEP_ALIVE), F.lit(str(cfg.interval * 2)),
            F.lit(CATEGORY), F.lit("entity_link"),
            F.lit(RELATION), rel,
        )
        return df.where(cond).select(*passthrough, fields.alias(FIELDS))
