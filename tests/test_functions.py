"""Column-function semantics: keys, text metrics, language heuristic."""

from __future__ import annotations

import hashlib

from event_to_lakehouse_spark.functions.keys import composite_key, surrogate_uid
from event_to_lakehouse_spark.functions.text import (
    fingerprint,
    lang_guess,
    normalize_text,
    token_count,
)


def test_composite_key_null_safe(spark):
    df = spark.createDataFrame(
        [("  Web-01  ", "10.0.0.1"), ("HOST", None)], ["h", "ip"]
    )
    keys = [r.k for r in df.select(composite_key("h", "ip").alias("k")).collect()]
    assert keys[0] == "web-01|10.0.0.1"
    assert keys[1] == "host"  # concat_ws skips NULL, key collapses


def test_surrogate_uid_matches_hashlib(spark):
    df = spark.createDataFrame([("A", "b")], ["x", "y"])
    uid = df.select(surrogate_uid("x", "y").alias("u")).first().u
    assert uid == hashlib.sha256(b"a|b").hexdigest()


def test_token_count_edges(spark):
    df = spark.createDataFrame(
        [("a b  c",), ("   ",), ("one",)], ["text"]
    )
    counts = [r.n for r in df.select(token_count("text").alias("n")).collect()]
    assert counts == [3, 0, 1]


def test_normalize_and_fingerprint(spark):
    df = spark.createDataFrame(
        [("  Hello,   World! ",), ("hello world",)], ["text"]
    )
    out = df.select(
        normalize_text("text").alias("norm"), fingerprint("text").alias("fp")
    ).collect()
    assert out[0].norm == out[1].norm == "hello world"
    assert out[0].fp == out[1].fp


def test_lang_guess_classes(spark):
    df = spark.createDataFrame(
        [
            ("the quick brown fox and the dog",),
            ("el niño pequeño está aquí",),
            ("die straße ist schön größer",),
            ("这是一个中文句子需要识别语言",),
        ],
        ["text"],
    )
    langs = [r.g for r in df.select(lang_guess("text").alias("g")).collect()]
    assert langs == ["en", "es", "de", "zh"]
