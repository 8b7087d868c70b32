"""Text-analysis operators over the documents table (SURVEY.md §2
Part C EXT: LLM-data-pipeline text surface).

All of these are pure ``pyspark.sql.functions`` expressions — they
run JVM-side inside whole-stage codegen, no Python in the hot path,
and scale embarrassingly (per-row, no shuffle except final grouping).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ssb_coefficient_maker_spark.sources.loaders import load_table

# Deterministic stopword list shared with the oracle SQL.
STOPWORDS = ["the", "a", "of", "to", "and", "in", "is"]

# BPE-ish tokenizer regex: letter runs, digit runs, single other glyphs.
TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def words_col(text: Column) -> Column:
    return F.split(F.trim(text), "\\s+")


def q25_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus stats: docs, chars, avg doc length."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
            F.round(F.avg(F.size(words_col(F.col("text")))), 4).alias("avg_words"),
        )
        .orderBy("lang")
    )


def q26_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality signals: word count, average word length,
    stopword ratio, and a composite score — the standard cheap
    pre-filter in LLM data pipelines."""
    docs = load_table(spark, sf_dir, "documents")
    words = words_col(F.col("text"))
    n_words = F.size(words).cast("long")
    n_nonspace = F.length(F.regexp_replace(F.trim(F.col("text")), "\\s+", "")).cast("long")
    stop_arr = F.array([F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(words, lambda x: F.array_contains(stop_arr, x))).cast("long")
    avg_word_len = F.round(n_nonspace.cast("double") / n_words, 4)
    stop_ratio = F.round(n_stop.cast("double") / n_words, 4)
    # no final round: inputs are exactly-rounded 4-decimal doubles, so
    # this expression is bitwise-identical across engines; a last round
    # would reintroduce half-up-vs-half-even boundary flips
    score = F.when(n_words < 5, 0.0).otherwise(
        1.0 - F.abs(stop_ratio - 0.4) - F.abs(avg_word_len - 5.0) / 10.0
    )
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        avg_word_len.alias("avg_word_len"),
        stop_ratio.alias("stopword_ratio"),
        score.alias("quality_score"),
    ).orderBy("doc_id")


def q27_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens and BPE-ish regex tokens."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(words_col(F.col("text"))).cast("long").alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(TOKEN_RE), 0)).cast("long").alias("re_tokens"),
    ).orderBy("doc_id")


def q28_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID: stopword-marker voting, compared to the
    labeled lang column. (The synthetic corpus shares one vocabulary,
    so accuracy is meaningless here — the operator shape is what's
    exercised; swap the marker lists for real ones in production.)"""
    docs = load_table(spark, sf_dir, "documents")
    words = words_col(F.lower(F.col("text")))
    en_markers = F.array([F.lit(w) for w in ["the", "a", "is", "and"]])
    n_en = F.size(F.filter(words, lambda x: F.array_contains(en_markers, x)))
    ratio = n_en.cast("double") / F.size(words)
    predicted = F.when(ratio >= 0.05, F.lit("en")).otherwise(F.lit("und"))
    return docs.select(
        "doc_id",
        predicted.alias("predicted_lang"),
        F.col("lang").alias("actual_lang"),
        (predicted == F.col("lang")).cast("int").alias("correct"),
    ).orderBy("doc_id")


def q29_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: normalized-text content hash (md5)
    plus a 31-rolling hash over words (order-sensitive), both pure
    JVM expressions."""
    docs = load_table(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), "\\s+", " ")
    words = F.split(norm, " ")
    rolling = F.aggregate(
        words,
        F.lit(0).cast("long"),
        lambda acc, x: F.pmod(acc * 31 + F.length(x).cast("long"), F.lit(2147483647).cast("long")),
    )
    return docs.select(
        "doc_id",
        F.md5(norm).alias("content_hash"),
        rolling.alias("rolling_hash"),
    ).orderBy("doc_id")
