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


def test_c4_span_dedup_semantics(spark):
    from loongcollector_spark.dataops.text import c4_span_dedup

    # doc 1 and doc 2 share the three-sentence span (S1,S2,S3); doc 1 is the
    # corpus-first occurrence and keeps it; doc 2 loses those sentences but
    # keeps its unique tail. doc 3 shares nothing.
    s123 = "Shared one. Shared two. Shared three."
    df = spark.createDataFrame(
        [
            (1, s123 + " Doc one tail."),
            (2, s123 + " Doc two different tail. And more."),
            (3, "Totally unique alpha. Totally unique beta. Totally unique gamma."),
        ],
        "doc_id int, text string",
    )
    rows = {r.doc_id: r for r in c4_span_dedup(df).collect()}
    assert rows[1].n_sentences == 4 and rows[1].kept_sentences == 4
    assert rows[1].deduped_text.startswith("Shared one.")
    # doc 2: windows (0,1,2) duplicates doc 1's -> sentences 0-2 removed
    assert rows[2].n_sentences == 5 and rows[2].kept_sentences == 2
    assert rows[2].deduped_text == "Doc two different tail. And more."
    assert rows[3].kept_sentences == 3


def test_c4_span_dedup_intra_doc_and_short(spark):
    from loongcollector_spark.dataops.text import c4_span_dedup

    # the same span twice INSIDE one doc: first occurrence wins, the repeat
    # is removed; a doc shorter than the span is untouched
    rep = "R one. R two. R three."
    df = spark.createDataFrame(
        [(1, rep + " Bridge sentence here. " + rep), (2, "Only two. Sentences here.")],
        "doc_id int, text string",
    )
    rows = {r.doc_id: r for r in c4_span_dedup(df).collect()}
    assert rows[1].n_sentences == 7
    assert rows[1].kept_sentences == 4
    assert rows[1].deduped_text == "R one. R two. R three. Bridge sentence here."
    assert rows[2].kept_sentences == 2 and rows[2].n_sentences == 2
