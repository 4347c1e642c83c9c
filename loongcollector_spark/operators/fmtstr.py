"""Dynamic sink-name format strings (``pkg/fmtstr``): ``%{...}`` expansion
for Kafka dynamic topics and Elasticsearch time-based indexes.

Reference surface:

- the lexer/parser (``formatstring.go:133-250``): ``\\`` escapes the next
  character anywhere, ``%{`` opens a variable, ``:``/``:<op>`` introduce
  variable ops inside it, ``}`` closes; nested ``%{`` is an error, a missing
  ``}`` / empty expansion / leading operator are errors — all raised at
  pipeline-build time (flusher Init fails, flusher_kafka_v2.go:233-238);
- ``FormatTopic`` (``format_topic.go:17-33``): each variable resolves from
  the selected-field value map; a MISSING key expands to the key text
  itself (the compile callback returns ``StringElement{S: key}``);
- ``findTargetValues`` (``converter.go:284-307``): only ``content.`` /
  ``tag.`` prefixed fields are legal; a ``tag.x`` miss retries via
  ``tagKeyRenameMap[x]`` (renames were applied to the tags map, so the
  original name still resolves); any other prefix is a config error;
- ``FormatIndex`` (``format_index.go:20-41``): ``%{+<fmt>}`` renders the
  event timestamp; ``<fmt>`` is the Java/Logstash-style general format that
  ``FormatTimestamp`` (format_timestamp.go) maps onto a Go layout — Spark's
  ``date_format`` speaks that Java pattern natively, so the mapping table
  collapses away;
- ``hashPartitionKey`` (``flusher_kafka_v2.go:344-356``): the sarama hash
  partitioner key is the ``###``-join of the topic-pattern field values
  whose field names are listed in ``HashKeys``, falling back to the
  logstore name when none resolve. Go iterates a map there (unspecified
  order); we pin the deterministic HashKeys config order.

Spark mapping: the pattern is compiled ONCE at plan time into a
``concat()`` of literals and map lookups — pure Column expressions, no
Python in the hot path. Routing a 100 TB write by dynamic topic is then
``df.repartition(F.col(topic))`` (or a partitioned-table write on the topic
column); the hash partitioner key is one more deterministic column.
"""

from __future__ import annotations

from typing import Callable, Mapping, Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

CONTENT_PREFIX = "content."
TAG_PREFIX = "tag."

_OP_CHARS = set("!@#&*=+<>?")


class FormatError(ValueError):
    """Pattern compile failure — the flusher's Init would fail."""


def _lex(pattern: str) -> list[tuple[str, str]]:
    """formatstring.go makeLexer: tokens ('str'|'open'|'close'|'op', text)."""
    toks: list[tuple[str, str]] = []
    content = pattern
    off = 0
    varcount = 0

    def emit_str(s: str) -> None:
        if s:
            toks.append(("str", s))

    while content:
        stops = "%\\" if varcount == 0 else "%:}\\"
        idx = next((i for i in range(off, len(content)) if content[i] in stops), -1)
        if idx == -1:
            break
        off = idx + 1
        ch = content[idx]
        if ch == "\\":
            # drop the backslash; off (= idx+1) now sits just past the
            # escaped character in the shifted string
            content = content[:idx] + content[off:]
            continue
        if ch == ":":
            if len(content) <= off:  # ':' at end → flush remainder as text
                break
            emit_str(content[:idx])
            op = ":"
            if content[off] in _OP_CHARS:
                op = content[idx : off + 1]
                off += 1
            toks.append(("op", op))
        elif ch == "}":
            emit_str(content[:idx])
            toks.append(("close", "}"))
            varcount -= 1
        else:  # '%'
            if len(content) <= off:  # '%' at end → flush remainder as text
                break
            if content[off] != "{":
                continue
            emit_str(content[:idx])
            toks.append(("open", "%{"))
            off += 1
            varcount += 1
        content = content[off:]
        off = 0
    emit_str(content)
    return toks


def compile_format(pattern: str) -> list[tuple[str, str]]:
    """Parse (formatstring.go:parse/parseVariable) → elements
    ``('lit', text)`` / ``('var', field)``. Ops are parsed for validity and
    discarded — both FormatTopic and FormatIndex ignore them."""
    elems: list[tuple[str, str]] = []
    toks = _lex(pattern)
    i = 0
    while i < len(toks):
        typ, val = toks[i]
        i += 1
        if typ == "str":
            elems.append(("lit", val))
        elif typ == "open":
            strings: list[str] = []
            ops: list[str] = []
            closed = False
            while i < len(toks):
                t2, v2 = toks[i]
                i += 1
                if t2 == "open":
                    raise FormatError("format string variables can not be nested")
                if t2 == "close":
                    if not strings:
                        raise FormatError("empty format expansion")
                    elems.append(("var", strings[0]))
                    closed = True
                    break
                if t2 == "str":
                    if len(strings) != len(ops):
                        raise FormatError(f"unexpected string token {v2}, expected operator")
                    strings.append(v2)
                else:  # op
                    if not strings:
                        raise FormatError("unexpected formatter operator")
                    ops.append(v2)
                    if len(ops) > len(strings):
                        raise FormatError(f"consecutive operator tokens '{v2}'")
            if not closed:
                raise FormatError("missing closing '}'")
        else:
            raise FormatError(f"token '{val}'({typ}) not allowed")
    return elems


def compile_keys(pattern: str) -> list[str]:
    """fmtstr.CompileKeys — the variable field names, in order."""
    return [v for t, v in compile_format(pattern) if t == "var"]


def _target_value(
    field: str,
    contents: Column,
    tags: Column,
    tag_key_rename: Mapping[str, str],
) -> Column:
    """findTargetValues for one field: NULL ⇔ the key is absent from the
    value map (converter.go:284-307). Non content./tag. prefix = config
    error."""
    if field.startswith(CONTENT_PREFIX):
        return F.element_at(contents, F.lit(field[len(CONTENT_PREFIX) :]))
    if field.startswith(TAG_PREFIX):
        key = field[len(TAG_PREFIX) :]
        hit = F.element_at(tags, F.lit(key))
        if key in tag_key_rename and tag_key_rename[key]:
            hit = F.coalesce(hit, F.element_at(tags, F.lit(tag_key_rename[key])))
        return hit
    raise FormatError(f"unsupported field: {field}")


def format_column(
    pattern: str, resolve: Callable[[str], Column]
) -> Column:
    """Compile ``pattern`` into one concat() of literals and per-variable
    columns; a NULL resolution falls back to the literal key text
    (format_topic.go:22-24)."""
    parts: list[Column] = []
    for typ, val in compile_format(pattern):
        if typ == "lit":
            parts.append(F.lit(val))
        else:
            parts.append(F.coalesce(resolve(val), F.lit(val)))
    if not parts:
        return F.lit("")
    return F.concat(*parts)


def kafka_topic(
    pattern: str,
    contents: Column,
    tags: Column,
    tag_key_rename: Mapping[str, str] | None = None,
) -> Column:
    """flusher_kafka_v2 dynamic topic (flusher_kafka_v2.go:317-324)."""
    ren = dict(tag_key_rename or {})
    return format_column(pattern, lambda f: _target_value(f, contents, tags, ren))


def es_index(
    pattern: str,
    contents: Column,
    tags: Column,
    ts_sec: Column,
    tag_key_rename: Mapping[str, str] | None = None,
) -> Column:
    """FormatIndex (format_index.go:20-41): ``%{+yyyy.MM.dd}`` renders the
    event time (UTC — the deterministic choice for a distributed plan; the
    agent used server-local time), other variables resolve like the topic."""
    ren = dict(tag_key_rename or {})

    def resolve(field: str) -> Column:
        if field.startswith("+"):
            return F.date_format(F.from_unixtime(ts_sec.cast("long")), field[1:])
        return _target_value(field, contents, tags, ren)

    return format_column(pattern, resolve)


def kafka_hash_key(
    topic_pattern: str,
    hash_keys: Sequence[str],
    contents: Column,
    tags: Column,
    default_key: str,
    tag_key_rename: Mapping[str, str] | None = None,
) -> Column:
    """hashPartitionKey (flusher_kafka_v2.go:344-356): join the values of
    the topic-pattern fields that are listed in HashKeys (selectFields ==
    topicKeys, so only those ever reach the value map), ``###`` separator,
    logstore-name fallback. Order: HashKeys config order (Go iterates the
    value map — unspecified order; >1 key was nondeterministic there)."""
    ren = dict(tag_key_rename or {})
    topic_fields = set(compile_keys(topic_pattern))
    candidates = [
        _target_value(k, contents, tags, ren) for k in hash_keys if k in topic_fields
    ]
    if not candidates:
        return F.lit(default_key)
    arr = F.filter(F.array(*candidates), lambda c: c.isNotNull())
    return F.when(F.size(arr) > 0, F.array_join(arr, "###")).otherwise(
        F.lit(default_key)
    )


def with_kafka_routing(
    df: DataFrame,
    topic_pattern: str,
    hash_keys: Sequence[str] = (),
    default_hash_key: str = "logstore",
    tag_key_rename: Mapping[str, str] | None = None,
    contents_col: str = "contents",
    tags_col: str = "tags",
    topic_col: str = "__topic__",
    key_col: str = "__partition_key__",
) -> DataFrame:
    """Stamp the dynamic topic + partition key columns. At scale the write
    repartitions on (topic, key) — the Spark analog of sarama's per-message
    hash partitioner — so one shuffle co-locates each Kafka partition's
    payload."""
    contents, tags = F.col(contents_col), F.col(tags_col)
    out = df.withColumn(
        topic_col, kafka_topic(topic_pattern, contents, tags, tag_key_rename)
    )
    if hash_keys:
        out = out.withColumn(
            key_col,
            kafka_hash_key(
                topic_pattern, hash_keys, contents, tags, default_hash_key, tag_key_rename
            ),
        )
    return out
