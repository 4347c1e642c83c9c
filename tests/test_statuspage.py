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


# --- metric_redis (plugins/input/redis/input_redis.go gatherInfoOutput) ---

from loongcollector_spark.operators.statuspage import RedisInfoParser

INFO = (
    "# Server\r\n"
    "redis_version:7.0.5\r\n"
    "redis_git_sha1:00000000\r\n"
    "lru_clock:123456\r\n"
    "uptime_in_seconds:3600\r\n"
    "\r\n"
    "# Clients\r\n"
    "connected_clients:10\r\n"
    "blocked_clients:0\r\n"
    "\r\n"
    "# Memory\r\n"
    "used_memory:1024\r\n"
    "mem_allocator:jemalloc-5.2.1\r\n"
    "\r\n"
    "# Replication\r\n"
    "role:master\r\n"
    "connected_slaves:2\r\n"
    "\r\n"
    "# Keyspace\r\n"
    "db0:keys=100,expires=5,avg_ttl=3000\r\n"
    "db1:keys=50,expires=0,avg_ttl=1000\r\n"
)


def test_redis_info_parse(spark):
    out = RedisInfoParser().apply(
        _events(spark, [(1, "tcp://redis-1:6380", INFO)])
    ).collect()
    f = dict(out[0]["fields"])
    assert f == {
        "redis_version": "7.0.5",
        "lru_clock": "123456",
        "uptime": "3600",  # Tracking rename
        "clients": "10",
        "blocked_clients": "0",
        "used_memory": "1024",  # Server whitelist only hits the Server section
        "replication_role": "master",
        "connected_slaves": "2",
        "db0_keys": "100",
        "db0_expires": "5",
        "db0_avg_ttl": "3000",
        "db1_keys": "50",
        "db1_expires": "0",
        "db1_avg_ttl": "1000",
        "total_db_count": "2",
        "total_db_avg_ttl": "2000",  # (3000+1000)/2
        "total_db_keys": "150",
        "total_db_expires": "5",
        "server": "redis-1",
        "port": "6380",
    }
    # redis_git_sha1 dropped by the Server whitelist, mem_allocator skipped
    assert "redis_git_sha1" not in f and "mem_allocator" not in f


def test_redis_info_err_break_and_tags(spark):
    body = (
        "# Clients\r\n"
        "connected_clients:7\r\n"
        "-ERR unknown command\r\n"
        "used_memory:999\r\n"  # after the break: never read
    )
    rows = [
        (1, "tcp://h:6380", body),
        (2, "10.0.0.1", body),  # no scheme → tcp, default port
        (3, "unix:///var/run/redis.sock", body),
        (4, "tcp://:secret@h2", body),  # userinfo stripped
    ]
    out = {r["doc_id"]: dict(r["fields"]) for r in RedisInfoParser().apply(
        _events(spark, rows)
    ).collect()}
    f = out[1]
    assert f["clients"] == "7" and "used_memory" not in f
    # totals still appended after the break
    assert f["total_db_count"] == "0" and f["total_db_avg_ttl"] == "0"
    assert (f["server"], f["port"]) == ("h", "6380")
    assert (out[2]["server"], out[2]["port"]) == ("10.0.0.1", "6379")
    assert out[3]["socket"] == "/var/run/redis.sock" and "server" not in out[3]
    assert (out[4]["server"], out[4]["port"]) == ("h2", "6379")


def test_redis_info_overwrite_and_bad_ints(spark):
    body = (
        "connected_clients:1\r\n"
        "connected_clients:2\r\n"  # map assignment: last wins
        "# Keyspace\r\n"
        "db0:keys=abc,expires=4\r\n"  # ParseInt error → counts 0
        "db0:noequals\r\n"  # no 'keys=' → no fields, no db count
    )
    out = RedisInfoParser().apply(_events(spark, [(1, "tcp://h", body)])).collect()
    f = dict(out[0]["fields"])
    assert f["clients"] == "2"
    assert f["db0_keys"] == "abc" and f["db0_expires"] == "4"
    assert f["total_db_keys"] == "0" and f["total_db_expires"] == "4"
    assert f["total_db_count"] == "1"
