"""Analyzer chain semantics — mirrors the reference HW9 test categories
(casereg, dupwords, punct, white, tagfilter; HW9Test.java:300-310)."""

from __future__ import annotations

from mini_distributed_search_engine_spark.functions.analyzer import (
    MAX_WORD_LEN, STOP_WORDS, analyze)


def test_case_and_punct():
    assert analyze("Apple, APPLES! <b>banana</b>") == ["appl", "appl", "banana"]


def test_whitespace_and_tags():
    assert analyze("figs\t\nfigs   <div class='x'>fig</div>") == ["fig", "fig", "fig"]


def test_stop_words_dropped():
    assert analyze("are only you may any again the a") == []
    assert "y" not in STOP_WORDS  # reference quirk: bare 'y' absent from list


def test_digit_and_overlong_junk():
    assert analyze("word123 42 x9y ok") == ["ok"]
    long_tok = "a" * (MAX_WORD_LEN + 1)
    assert analyze(f"{long_tok} fig") == ["fig"]


def test_overlong_stem_keeps_last_20():
    # a 20-char token whose stem stays >20 is impossible (stems never grow
    # beyond input+1 via setto('e'); inputs are capped at 20) — so exercise
    # the truncation contract through analyze's 20-char boundary instead.
    tok = "b" * 19 + "s"  # 20 chars, survives junk filter; stem drops the s
    assert analyze(tok) == ["b" * 19]


def test_post_stem_stop_filter():
    # 'onli' is not a stop word but 'only' is; reversed case: a token whose
    # STEM lands in the stop list must be dropped (Indexer.java:199).
    # porter('thi') == 'thi' (not stop); porter('wills') == 'will' (stop).
    assert analyze("wills") == []


def test_golden_corpus_doc1():
    text = ("are only you you you apple apples apple banana bananas "
            "figs figs figs fig coconuts")
    terms = analyze(text)
    assert terms == ["appl", "appl", "appl", "banana", "banana",
                     "fig", "fig", "fig", "fig", "coconut"]
