"""Gopher quality-ruleset unit tests (operators/quality.py)."""

from pivot_spark.operators.quality import GopherThresholds, gopher_filter, gopher_rules

GOOD = (
    "the quick brown fox jumps over the lazy dog and then runs back home "
    "to have dinner with all of that family before the long night begins"
)


def _rules(spark, text, **kw):
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    th = GopherThresholds(min_words=5, **kw)
    return gopher_rules(df, "text", th).first()


def test_good_doc_keeps(spark):
    r = _rules(spark, GOOD)
    assert r.keep and all(
        r[c] for c in r.asDict() if c.startswith("rule_")
    ), r.asDict()


def test_empty_text(spark):
    r = _rules(spark, "")
    assert r.n_words == 0 and not r.rule_word_count and not r.keep
    assert r.mean_word_len == 0.0 and r.alpha_word_frac == 0.0


def test_symbol_ratio_rule(spark):
    r = _rules(spark, "the code ### has ... lots # of ... symbols # here be have")
    assert r.symbol_word_ratio > 0.1 and not r.rule_symbol_ratio


def test_bullet_lines_rule(spark):
    text = "\n".join(["- item one the be to"] * 9 + ["a normal closing line"])
    r = _rules(spark, text)
    assert r.bullet_line_frac == 0.9 and r.rule_bullet_lines  # <= is inclusive
    text2 = "\n".join(["* item"] * 10)
    r2 = _rules(spark, text2)
    assert not r2.rule_bullet_lines


def test_ellipsis_lines_rule(spark):
    text = "\n".join(["trailing off the end..."] * 2 + ["solid line of the text"] * 2)
    r = _rules(spark, text)
    assert r.ellipsis_line_frac == 0.5 and not r.rule_ellipsis_lines


def test_alpha_word_rule(spark):
    r = _rules(spark, "1 2 3 4 5 6 7 8 the end")
    assert r.alpha_word_frac == 0.2 and not r.rule_alpha_words


def test_stopword_rule(spark):
    r = _rules(spark, "purely technical jargon corpus lexicon without common glue")
    assert r.stop_hits == 0 and not r.rule_stopwords
    # 'the' + 'of' present -> 2 distinct hits passes
    r2 = _rules(spark, "some words of the corpus lexicon jargon technical here")
    assert r2.stop_hits == 2 and r2.rule_stopwords


def test_word_count_bounds(spark):
    df_rows = [(1, "too few words"), (2, GOOD)]
    import pyspark.sql.functions as F

    df = (
        gopher_rules(
            __import__("pyspark").sql.SparkSession.getActiveSession().createDataFrame(
                df_rows, ["doc_id", "text"]
            ),
            "text",
            GopherThresholds(min_words=5),
        )
    )
    rows = {r.doc_id: r for r in df.collect()}
    assert not rows[1].rule_word_count and rows[2].rule_word_count


def test_filter_returns_original_columns(spark):
    df = spark.createDataFrame([(1, GOOD, "en"), (2, "", "en")], ["doc_id", "text", "lang"])
    out = gopher_filter(df, "text", GopherThresholds(min_words=5))
    assert out.columns == ["doc_id", "text", "lang"]
    assert [r.doc_id for r in out.collect()] == [1]
