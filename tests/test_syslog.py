"""Syslog parser goldens ported from the reference's
plugins/input/syslog/parser_test.go (TestRfc3164 / TestRfc3164WithoutHostnameField
/ TestRfc5424 / TestAutoParser), with the RFC3164 year pinned to 2024 (the
reference stamps the current year — parser_test.go:46) and the session
timezone (UTC in tests) standing in for time.Local."""

from __future__ import annotations

from datetime import datetime, timezone

from loongcollector_spark.operators.base import FIELDS, to_events
from loongcollector_spark.operators.syslog import SyslogParser


def _events(spark, contents):
    df = spark.createDataFrame([(i, c) for i, c in enumerate(contents)], ["i", "content"])
    return to_events(df)


def _fields(df):
    return {r["i"]: dict(r[FIELDS]) for r in df.collect()}


def _ns(y, mo, d, h, mi, s, us=0):
    return int(datetime(y, mo, d, h, mi, s, us, tzinfo=timezone.utc).timestamp()) * 10**9 + us * 1000


RFC3164_GOLDENS = [
    # (line, hostname, program, pri, fac, sev, content, ts_ns)
    ("<60>Oct 09 14:36:47 hostname program: message",
     "hostname", "program", 60, 7, 4, "message", _ns(2024, 10, 9, 14, 36, 47)),
    ("<34>Aug  2 09:49:23 hostname program: message",
     "hostname", "program", 34, 4, 2, "message", _ns(2024, 8, 2, 9, 49, 23)),
    ("<86>Jul 31 13:14:22 rs1e13316 su: pam_unix(su:session): session closed for user nobody",
     "rs1e13316", "su", 86, 10, 6,
     "pam_unix(su:session): session closed for user nobody", _ns(2024, 7, 31, 13, 14, 22)),
    ("<13>Aug  1 14:32:44 ecs-test-yyh root: dfjksdfjkdlsfjsklf",
     "ecs-test-yyh", "root", 13, 1, 5, "dfjksdfjkdlsfjsklf", _ns(2024, 8, 1, 14, 32, 44)),
    ("<85>Aug  1 14:31:58 ecs-test-yyh polkitd[457]: Registered Authentication Agent for "
     "unix-process:22755:258653719 (system bus name :1.10269 [/usr/bin/pkttyagent "
     "--notify-fd 5 --fallback], object path /org/freedesktop/PolicyKit1/"
     "AuthenticationAgent, locale en_US.UTF-8)",
     "ecs-test-yyh", "polkitd", 85, 10, 5,
     "Registered Authentication Agent for unix-process:22755:258653719 (system bus name "
     ":1.10269 [/usr/bin/pkttyagent --notify-fd 5 --fallback], object path "
     "/org/freedesktop/PolicyKit1/AuthenticationAgent, locale en_US.UTF-8)",
     _ns(2024, 8, 1, 14, 31, 58)),
    ("<13>Aug 17 03:42:11 ecs-test-yyh LOGSTASH[-]: hello, a syslog from logstash",
     "ecs-test-yyh", "LOGSTASH", 13, 1, 5, "hello, a syslog from logstash",
     _ns(2024, 8, 17, 3, 42, 11)),
]


def test_rfc3164_goldens(spark):
    lines = [g[0] for g in RFC3164_GOLDENS]
    out = SyslogParser(mode="rfc3164", year=2024).apply(_events(spark, lines))
    got = _fields(out)
    for i, (_, host, prog, pri, fac, sev, content, ts_ns) in enumerate(RFC3164_GOLDENS):
        f = got[i]
        assert f["_hostname_"] == host, f
        assert f["_program_"] == prog
        assert f["_priority_"] == str(pri)
        assert f["_facility_"] == str(fac)
        assert f["_severity_"] == str(sev)
        assert f["_content_"] == content
        assert f["_unixtimestamp_"] == str(ts_ns)
        assert "_process_id_" not in f and "_message_id_" not in f
        assert "_structured_data_" not in f


def test_rfc3164_without_hostname_field(spark):
    # TestRfc3164WithoutHostnameField: AddHostname supplies the hostname,
    # the line starts at the tag (parser_test.go:131-170)
    out = SyslogParser(mode="rfc3164", year=2024, hostname_override="myhost").apply(
        _events(spark, ["<86>Apr 16 14:33:06 su: pam_unix(su:session): session opened "
                        "for user root by (uid=0)"])
    )
    f = _fields(out)[0]
    assert f["_hostname_"] == "myhost"
    assert f["_program_"] == "su"
    assert f["_priority_"] == "86"
    assert f["_facility_"] == "10"
    assert f["_severity_"] == "6"
    assert f["_content_"] == "pam_unix(su:session): session opened for user root by (uid=0)"
    assert f["_unixtimestamp_"] == str(_ns(2024, 4, 16, 14, 33, 6))


RFC5424_LINE_1 = (
    '<29>1 2016-02-21T04:32:57+00:00 web1 someservice 2341 2 '
    '[origin][meta sequence="14125553" service="someservice"] '
    '"GET /v1/ok HTTP/1.1" 200 145 "-" "hacheck 0.9.0" 24306 127.0.0.1:40124 575'
)
RFC5424_LINE_2 = (
    "<34>1 2003-10-11T22:14:15.003Z mymachine.example.com su - ID47 - "
    "BOM'su root' failed for lonvick on /dev/pts/8"
)


def test_rfc5424_goldens(spark):
    out = SyslogParser(mode="rfc5424").apply(
        _events(spark, [RFC5424_LINE_1, RFC5424_LINE_2])
    )
    got = _fields(out)

    f = got[0]
    assert f["_hostname_"] == "web1"
    assert f["_program_"] == "someservice"
    assert f["_priority_"] == "29"
    assert f["_facility_"] == "3"
    assert f["_severity_"] == "5"
    assert f["_process_id_"] == "2341"
    assert f["_message_id_"] == "2"
    # Go json.Marshal of map[string]map[string]string: keys sorted
    assert f["_structured_data_"] == (
        '{"meta":{"sequence":"14125553","service":"someservice"},"origin":{}}'
    )
    assert f["_content_"] == (
        '"GET /v1/ok HTTP/1.1" 200 145 "-" "hacheck 0.9.0" 24306 127.0.0.1:40124 575'
    )
    assert f["_unixtimestamp_"] == str(_ns(2016, 2, 21, 4, 32, 57))

    f = got[1]
    assert f["_hostname_"] == "mymachine.example.com"
    assert f["_program_"] == "su"
    assert f["_priority_"] == "34"
    assert f["_facility_"] == "4"
    assert f["_severity_"] == "2"
    assert "_process_id_" not in f          # procID nil
    assert f["_message_id_"] == "ID47"
    assert "_structured_data_" not in f     # SD nil
    assert f["_content_"] == "BOM'su root' failed for lonvick on /dev/pts/8"
    assert f["_unixtimestamp_"] == str(_ns(2003, 10, 11, 22, 14, 15, 3000))


def test_rfc5424_rejects_3164_line(spark):
    # TestRfc5424 "parse failed" vector: ignore_parse_failure keeps raw
    line = "Jul 29 06:20:01 ecs-test-yyh systemd: Started Session 4530 of user root."
    out = SyslogParser(mode="rfc5424").apply(_events(spark, [line]))
    f = _fields(out)[0]
    assert f["_priority_"] == "-1"
    assert f["_facility_"] == "-1"
    assert f["_severity_"] == "-1"
    assert f["_content_"] == line
    assert f["_program_"] == "" and f["_hostname_"] == ""
    assert f["_unixtimestamp_"] == "0"


def test_auto_parser_matrix(spark):
    lines = [
        "<34>Aug  2 09:49:23 hostname program: message",      # 3164
        RFC5424_LINE_1,                                        # 5424
        "<341 2003-10-11T22:14:15.003Z mymachine.example.com su - ID47 - x",  # both fail
    ]
    out = SyslogParser(mode="auto", year=2024).apply(_events(spark, lines))
    got = _fields(out)
    assert got[0]["_program_"] == "program" and got[0]["_priority_"] == "34"
    assert got[1]["_program_"] == "someservice" and got[1]["_message_id_"] == "2"
    assert got[2]["_priority_"] == "-1" and got[2]["_content_"] == lines[2]

    # ignore_parse_failure=False drops the failed line (syslog.go:403)
    strict = SyslogParser(mode="auto", year=2024, ignore_parse_failure=False).apply(
        _events(spark, lines)
    )
    assert sorted(_fields(strict)) == [0, 1]


def test_priority_out_of_range_fails(spark):
    # jeromer/syslogparser rejects priority > 191
    out = SyslogParser(mode="rfc3164", year=2024).apply(
        _events(spark, ["<192>Aug  2 09:49:23 hostname program: message"])
    )
    f = _fields(out)[0]
    assert f["_priority_"] == "-1"


def test_invalid_date_fails_line_not_job(spark):
    # Feb 30 → try_to_timestamp null → line fails (no ANSI job abort)
    out = SyslogParser(mode="rfc3164", year=2024).apply(
        _events(spark, ["<34>Feb 30 09:49:23 hostname program: message"])
    )
    f = _fields(out)[0]
    assert f["_priority_"] == "-1"


def test_syslog_generated_roundtrip_auto(spark):
    """Property check over ~150 generated RFC3164 + RFC5424 lines in auto
    mode: serializing (pri, timestamp, host, app, procid, msgid, SD, msg)
    through each RFC grammar and parsing back recovers every emitted field —
    priority/facility/severity split, µs-exact timestamps (all 1-6 fraction
    digit widths and Z/±hh:mm offsets), nil-token defaults, sorted SD JSON.
    Clean domain by construction (grammar-level ambiguities excluded, per
    the module docstring): no escaped quotes inside SD values, messages do
    not start with '[' when SD is non-nil, 3164 tags are colon-terminated."""
    import json
    import random
    from datetime import datetime, timedelta, timezone

    rng = random.Random(23)
    tok_alpha = "ahst019.-_"
    msg_alpha = "msg hel-lo(wo:rld)=.[]#"

    def tok():
        return "".join(rng.choice(tok_alpha) for _ in range(rng.randint(1, 8))).strip("-") or "x"

    lines, expected = [], []
    for i in range(150):
        pri = rng.randint(0, 191)
        exp = {"_priority_": str(pri), "_facility_": str(pri // 8),
               "_severity_": str(pri % 8)}
        if rng.random() < 0.5:
            # RFC3164: <pri>Mon d HH:MM:SS host tag[pid]: msg
            mo = rng.randint(1, 12)
            d, h, mi, s = rng.randint(1, 28), rng.randint(0, 23), rng.randint(0, 59), rng.randint(0, 59)
            mon = ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
                   "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"][mo - 1]
            day = (f" {d}" if rng.random() < 0.5 else f"{d:02d}") if d < 10 else str(d)
            host, prog = tok(), tok().replace(":", "").replace("[", "") or "p"
            pid = f"[{rng.randint(1, 9999)}]" if rng.random() < 0.4 else ""
            msg = "".join(rng.choice(msg_alpha) for _ in range(rng.randint(1, 30)))
            lines.append(f"<{pri}>{mon} {day} {h:02d}:{mi:02d}:{s:02d} {host} {prog}{pid}: {msg}")
            exp.update({
                "_hostname_": host, "_program_": prog, "_content_": msg,
                "_unixtimestamp_": str(_ns(2024, mo, d, h, mi, s)),
            })
        else:
            # RFC5424: <pri>1 TS HOST APP PROCID MSGID SD [MSG]
            if rng.random() < 0.15:
                ts_tok, ts_ns = "-", 0
            else:
                mo, d = rng.randint(1, 12), rng.randint(1, 28)
                h, mi, s = rng.randint(0, 23), rng.randint(0, 59), rng.randint(0, 59)
                nfrac = rng.choice([0, 1, 2, 3, 4, 5, 6])
                frac = "".join(rng.choice("0123456789") for _ in range(nfrac))
                off_h, off_m = rng.choice([(0, 0), (5, 30), (-8, 0), (1, 0)])
                if (off_h, off_m) == (0, 0) and rng.random() < 0.5:
                    off = "Z"
                else:
                    sign = "-" if off_h < 0 else "+"
                    off = f"{sign}{abs(off_h):02d}:{off_m:02d}"
                ts_tok = (f"2024-{mo:02d}-{d:02d}T{h:02d}:{mi:02d}:{s:02d}"
                          + (f".{frac}" if frac else "") + off)
                us = int(frac.ljust(6, "0")) if frac else 0
                delta = timedelta(hours=abs(off_h), minutes=off_m)
                tz = timezone(-delta if off_h < 0 else delta)
                dt = datetime(2024, mo, d, h, mi, s, us, tzinfo=tz)
                ts_ns = int(dt.timestamp()) * 10**9 + us * 1000
            host = "-" if rng.random() < 0.2 else tok()
            app = "-" if rng.random() < 0.2 else tok()
            procid = "-" if rng.random() < 0.5 else str(rng.randint(1, 99999))
            msgid = "-" if rng.random() < 0.5 else tok()
            if rng.random() < 0.5:
                sd_tok, sd_json = "-", None
            else:
                elems = {}
                for _ in range(rng.randint(1, 2)):
                    sid = f"e{rng.randint(1, 99)}@{rng.randint(1, 99)}"
                    if sid in elems:
                        continue
                    params = {
                        f"k{j}{rng.choice('ab_')}":
                            "".join(rng.choice("v0:. -") for _ in range(rng.randint(0, 5)))
                        for j in range(rng.randint(0, 3))
                    }
                    elems[sid] = params
                sd_tok = "".join(
                    "[" + sid
                    + "".join(f' {k}="{v}"' for k, v in sorted(ps.items()))
                    + "]"
                    for sid, ps in elems.items()
                )
                sd_json = json.dumps(
                    {sid: dict(sorted(ps.items())) for sid, ps in sorted(elems.items())},
                    separators=(",", ":"), sort_keys=True,
                )
            msg = "".join(rng.choice(msg_alpha) for _ in range(rng.randint(0, 30))).lstrip("[")
            line = f"<{pri}>1 {ts_tok} {host} {app} {procid} {msgid} {sd_tok}"
            if msg or rng.random() < 0.5:
                line += f" {msg}"
            lines.append(line)
            exp.update({
                "_hostname_": "" if host == "-" else host,
                "_program_": "" if app == "-" else app,
                "_content_": msg,
                "_unixtimestamp_": str(ts_ns),
            })
            if procid != "-":
                exp["_process_id_"] = procid
            if msgid != "-":
                exp["_message_id_"] = msgid
            if sd_json is not None:
                exp["_structured_data_"] = sd_json
        expected.append(exp)

    out = SyslogParser(mode="auto", year=2024).apply(_events(spark, lines))
    got = _fields(out)
    assert len(got) == len(expected)
    for i, exp in enumerate(expected):
        assert got[i] == exp, (i, lines[i], got[i], exp)
