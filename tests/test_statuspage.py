"""metric_nginx_status parse stage (plugins/input/nginx/input_nginx.go
gatherURL + getTags)."""

from __future__ import annotations

from loongcollector_spark.operators.base import to_events
from loongcollector_spark.operators.statuspage import NginxStatusParser

BODY = (
    "Active connections: 291 \n"
    "server accepts handled requests\n"
    " 16630948 16630946 31070465 \n"
    "Reading: 6 Writing: 179 Waiting: 106 \n"
)


def _events(spark, rows):
    return to_events(
        spark.createDataFrame(rows, "doc_id long, url string, content string")
    )


def test_nginx_status_parse_and_tags(spark):
    out = NginxStatusParser().apply(
        _events(spark, [(1, "http://web-1:8080/nginx_status", BODY)])
    ).collect()
    f = dict(out[0]["fields"])
    assert f == {
        "active": "291",
        "accepts": "16630948",
        "handled": "16630946",
        "requests": "31070465",
        "reading": "6",
        "writing": "179",
        "waiting": "106",
        "_server_": "web-1",
        "_port_": "8080",
    }


def test_nginx_status_default_ports_and_malformed(spark):
    rows = [
        (1, "http://a/nginx_status", BODY),
        (2, "https://b/nginx_status", BODY),
        (3, "ftp://c", BODY),
        (4, "http://d", "not a status page"),  # parse failure → no row
    ]
    out = {r["doc_id"]: dict(r["fields"]) for r in NginxStatusParser().apply(
        _events(spark, rows)
    ).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1]["_port_"] == "80"
    assert out[2]["_port_"] == "443"
    assert out[3]["_port_"] == ""  # unknown scheme (getTags default branch)
