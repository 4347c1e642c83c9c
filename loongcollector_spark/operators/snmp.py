"""service_snmp — PDU variables → log fields (plugins/input/snmp).

Reference semantics (studied, not ported): the gosnmp session/walk and the
net-snmp `snmptranslate` shell-outs are agent transport; the CONTENTFUL
conversion is the per-variable emission (input_snmp.go:536-563): value =
the raw octet-string bytes as text for OctetString, else the big-int
decimal render; the 7 fixed fields (_targetindex_/_target_/_field_/_oid_/
_conversion_/_type_/_content_) with the Asn1BER type-name table
(:275-323 — including the reference's literal "Boolean " trailing-space
quirk). Zero shuffle, one projection."""

from __future__ import annotations

from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .base import FIELDS, Operator

# Asn1BER2String (input_snmp.go:275-323); 0x01 really renders "Boolean "
ASN1_BER_NAMES = {
    0x00: "UnknownType", 0x01: "Boolean ", 0x02: "Integer", 0x03: "BitString",
    0x04: "OctetString", 0x05: "Null", 0x06: "ObjectIdentifier",
    0x07: "ObjectDescription", 0x40: "IPAddress", 0x41: "Counter32",
    0x42: "Gauge32", 0x43: "TimeTicks", 0x44: "Opaque", 0x45: "NsapAddress",
    0x46: "Counter64", 0x47: "Uinteger32", 0x78: "OpaqueFloat",
    0x79: "OpaqueDouble", 0x80: "NoSuchObject", 0x81: "NoSuchInstance",
    0x82: "EndOfMibView",
}


@dataclass
class SnmpVariableLogs(Operator):
    """One PDU variable per row: target_index int, target string, field
    string, oid string, conversion string, type_code int, value_bytes
    binary (OctetString payload), value_num decimal/long (everything
    else)."""

    def apply(self, df: DataFrame) -> DataFrame:
        passthrough = [
            c for c in df.columns
            if c not in ("target_index", "target", "field", "oid", "conversion",
                         "type_code", "value_bytes", "value_num", FIELDS)
        ]
        type_name = F.lit("")
        for code, name in ASN1_BER_NAMES.items():
            type_name = F.when(F.col("type_code") == code, F.lit(name)).otherwise(type_name)
        content = F.when(
            F.col("type_code") == 0x04, F.col("value_bytes").cast("string")
        ).otherwise(F.col("value_num").cast("decimal(38,0)").cast("string"))
        return df.select(
            *passthrough,
            F.create_map(
                F.lit("_targetindex_"), F.col("target_index").cast("string"),
                F.lit("_target_"), F.col("target"),
                F.lit("_field_"), F.col("field"),
                F.lit("_oid_"), F.col("oid"),
                F.lit("_conversion_"), F.col("conversion"),
                F.lit("_type_"), type_name,
                F.lit("_content_"), content,
            ).alias(FIELDS),
        )
