"""gopher_quality (Rae et al. 2021 table A1) and c4_clean (Raffel et al.
2020 §2.2) page-filter semantics on hand-built documents."""

from loongcollector_spark.dataops.text import c4_clean, gopher_quality


def test_gopher_quality_rules(spark):
    good = "the cat sat on the mat with a very fine hat " * 6  # 72 words
    short = "the cat"
    symbols = ("### " * 30 + "the of and ").strip()
    df = spark.createDataFrame(
        [(1, good.strip()), (2, short), (3, symbols)], "doc_id int, text string"
    )
    rows = {r.doc_id: r for r in gopher_quality(df, min_words=10).collect()}
    assert rows[1].quality_ok == 1
    assert rows[1].stopword_hits >= 2
    # too few words
    assert rows[2].quality_ok == 0
    # symbol-to-word ratio over 0.1 (each '###' word contributes 3 symbols)
    assert rows[3].symbol_ratio > 0.1
    assert rows[3].quality_ok == 0


def test_gopher_quality_bullet_and_ellipsis_lines(spark):
    bullets = "\n".join(["- item one here."] * 10)
    dots = "\n".join(["a line that trails..."] * 10)
    df = spark.createDataFrame([(1, bullets), (2, dots)], "doc_id int, text string")
    rows = {r.doc_id: r for r in gopher_quality(df, min_words=1).collect()}
    assert rows[1].bullet_line_frac == 1.0 and rows[1].quality_ok == 0
    assert rows[2].ellipsis_line_frac == 1.0 and rows[2].quality_ok == 0


def test_c4_clean_line_rules(spark):
    page = "\n".join(
        [
            "This is a fine sentence.",  # kept
            "no terminal punctuation here",  # dropped: no terminal punct
            "Too short.",  # dropped: <3 words
            "Enable JavaScript to continue.",  # dropped: javascript
            "Another good sentence stays!",  # kept
            'He said "stay".',  # kept (quote terminal)
            "Sentence four is here.",
            "Sentence five is here.",
        ]
    )
    df = spark.createDataFrame([(1, page)], "doc_id int, text string")
    r = c4_clean(df).collect()[0]
    assert r.n_lines == 8
    assert r.kept_lines == 5
    assert r.page_kept == 1
    assert "javascript" not in r.cleaned_text.lower()
    assert "no terminal punctuation" not in r.cleaned_text


def test_c4_clean_page_rules(spark):
    brace = "A perfectly good sentence. " * 6 + "but { appears"
    lorem = "\n".join(["Lorem ipsum dolor sit amet."] + ["Fine sentence here okay."] * 6)
    short = "Only two sentences here. And the second one."
    df = spark.createDataFrame(
        [(1, brace), (2, lorem), (3, short)], "doc_id int, text string"
    )
    rows = {r.doc_id: r for r in c4_clean(df).collect()}
    assert rows[1].page_kept == 0  # curly bracket
    assert rows[2].page_kept == 0  # lorem ipsum
    assert rows[3].page_kept == 0  # < 5 sentences
