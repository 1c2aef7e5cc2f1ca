"""Text analysis operators — all JVM-side built-ins (no Python in the path).

Each formula is deliberately expressible in ANSI SQL so the DuckDB oracle can
replay it exactly (integer counts + deterministic double math):

- ``lang_id``: ASCII-letter-ratio n-gram-free heuristic (en / zh / other).
- ``quality_score``: length, punctuation ratio, stopword-ish ratio,
  distinct-word ratio combined into one score.
- ``token_counts``: whitespace tokens + a BPE-ish regex token count.
- ``fingerprint``: order-aware rolling-style hash via position-weighted
  modular arithmetic over words (posexplode + aggregate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MOD = 1_000_000_007


def lang_id(docs: DataFrame) -> DataFrame:
    n = F.length("text")
    ascii_letters = F.length(F.regexp_replace("text", "[^A-Za-z ]", ""))
    cjk = F.length(F.regexp_replace("text", "[^\\u4e00-\\u9fff]", ""))
    ratio_en = ascii_letters / n
    ratio_zh = cjk / n
    return docs.select(
        "doc_id",
        F.when(n == 0, F.lit("other"))
        .when(ratio_zh > 0.3, F.lit("zh"))
        .when(ratio_en > 0.8, F.lit("en"))
        .otherwise(F.lit("other"))
        .alias("lang_pred"),
    )


def quality_score(docs: DataFrame) -> DataFrame:
    words = F.split("text", " ")
    n_words = F.size(F.filter(words, lambda w: w != ""))
    n_distinct = F.size(F.array_distinct(F.filter(words, lambda w: w != "")))
    n_chars = F.length("text")
    n_punct = F.length(F.regexp_replace("text", "[^.,;:!?]", ""))
    avg_word_len = F.when(n_words > 0, (n_chars - (n_words - 1)) / n_words).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    distinct_ratio = F.when(n_words > 0, n_distinct / n_words).otherwise(F.lit(0.0))
    score = (
        F.least(n_words / F.lit(100.0), F.lit(1.0)) * 0.4
        + distinct_ratio * 0.4
        + (F.lit(1.0) - F.least(punct_ratio * 10, F.lit(1.0))) * 0.2
    )
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        n_distinct.alias("n_distinct"),
        F.round(avg_word_len, 4).alias("avg_word_len"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(score, 4).alias("quality"),
    )


def token_counts(docs: DataFrame) -> DataFrame:
    ws = F.size(F.filter(F.split("text", " "), lambda w: w != ""))
    bpe_ish = F.size(
        F.regexp_extract_all("text", F.lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"), 0)
    )
    return docs.select(
        "doc_id",
        ws.alias("ws_tokens"),
        bpe_ish.alias("bpe_tokens"),
    )


def fingerprint(docs: DataFrame) -> DataFrame:
    """Position-weighted modular word hash: identical in Spark and SQL.

    fp = sum_over_words( (ascii(first) * 131 + length(word) * 31 + 7)
                         * ((pos % 16) + 1) ) % 1e9+7
    """
    w = F.posexplode(F.filter(F.split("text", " "), lambda x: x != "")).alias(
        "pos", "word"
    )
    per_word = docs.select("doc_id", w).select(
        "doc_id",
        (
            (F.ascii("word") * 131 + F.length("word") * 31 + 7)
            * ((F.col("pos") % 16) + 1)
        ).alias("h"),
    )
    return per_word.groupBy("doc_id").agg(
        (F.sum("h") % _MOD).alias("fingerprint")
    )
