"""Golden cases ported verbatim from ProcessorDesensitizeNativeUnittest
(core/unittest/processor/ProcessorDesensitizeNativeUnittest.cpp):
config = SourceKey cast1, ContentPatternBeforeReplacedString 'pwd=',
ReplacedContentPattern '[^,]+', ReplacingAll false unless noted."""

from loongcollector_spark.operators.base import FIELDS
from loongcollector_spark.operators.transforms import Desensitize, DesensitizeArrow

KW = dict(
    source_key="cast1",
    prefix_pattern="pwd=",
    content_pattern="[^,]+",
    replacing_all=False,
)


def _run(spark, op, content):
    df = spark.createDataFrame([(0, {"cast1": content})], ["i", FIELDS])
    return op.apply(df).collect()[0][FIELDS]["cast1"]


def test_const_golden(spark):
    # TestCastSensWordConst case1 (lines 314-335)
    got = _run(
        spark,
        Desensitize(method="const", replacing_string="********", **KW),
        "asf@@@324 FS2$%pwd,pwd=saf543#$@,,",
    )
    assert got == "asf@@@324 FS2$%pwd,pwd=********,,"


def test_const_golden_with_newlines(spark):
    # TestCastSensWordConst case2 (lines 361-382): leading \r\n\r\n kept
    got = _run(
        spark,
        Desensitize(method="const", replacing_string="********", **KW),
        "\r\n\r\nasf@@\n\n@324 FS2$%pwd,pwd=saf543#$@,,",
    )
    assert got == "\r\n\r\nasf@@\n\n@324 FS2$%pwd,pwd=********,,"


def test_const_golden_first_occurrence_only(spark):
    # TestCastSensWordConst case3 (lines 408-429): ReplacingAll=false →
    # second pwd= untouched
    got = _run(
        spark,
        Desensitize(method="const", replacing_string="********", **KW),
        "asf@@@324 FS2$%pwd,pwd=saf543#$@,,pwd=12341,df",
    )
    assert got == "asf@@@324 FS2$%pwd,pwd=********,,pwd=12341,df"


def test_md5_golden_uppercase(spark):
    # TestCastSensWordMD5 case1 (lines 548-580): UPPERCASE md5 hex
    expect = "asf@@@324 FS2$%pwd,pwd=91F6CFCF46787E8A02082B58F7117AFA,,"
    got = _run(spark, Desensitize(method="md5", **KW), "asf@@@324 FS2$%pwd,pwd=saf543#$@,,")
    assert got == expect
    got_arrow = _run(
        spark, DesensitizeArrow(method="md5", **KW), "asf@@@324 FS2$%pwd,pwd=saf543#$@,,"
    )
    assert got_arrow == expect
