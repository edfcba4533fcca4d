"""Text-analysis operators for training-data pipelines over a ``documents``
table ``(doc_id, text, lang, source, n_chars)``.

All hot paths are built-in Column expressions (JVM-side, whole-stage codegen);
each function returns a DataFrame and has an exact ANSI-SQL twin in
``__spark_entry__.oracle_sql`` so DuckDB validates values bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# A tiny closed-class English stopword list — deliberately small and fixed so
# the SQL oracle can enumerate it verbatim.
STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "with", "for", "on"]


def tokens_col(col: str = "text"):
    """Whitespace tokenization as a Column: split on whitespace runs, drop
    empties (matches DuckDB's regexp_split_to_array + list filtering)."""
    return F.filter(F.split(F.col(col), r"\s+"), lambda t: t != "")


def token_count(docs: DataFrame) -> DataFrame:
    """Whitespace token count + a BPE-ish subword proxy: number of matches of
    ``[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]`` (letters runs / digit runs / single
    punctuation), the standard pre-tokenizer shape."""
    bpe_re = r"([A-Za-z]+|[0-9]+|[^A-Za-z0-9\s])"
    return docs.select(
        "doc_id",
        F.size(tokens_col()).cast("long").alias("n_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(bpe_re), F.lit(1))).cast("long").alias("n_subwords"),
        F.length("text").cast("long").alias("n_chars_exact"),
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """Heuristic quality features: mean word length, stopword ratio,
    punctuation ratio, uppercase ratio — the standard cheap text-quality
    screen (Gopher/C4-style rules, public)."""
    toks = tokens_col()
    n_tok = F.size(toks)
    stop_hits = F.size(F.filter(toks, lambda t: F.lower(t).isin(STOPWORDS)))
    n_punct = F.length("text") - F.length(F.regexp_replace(F.col("text"), r"[^\w\s]", ""))
    n_upper = F.length(F.regexp_replace(F.col("text"), r"[^A-Z]", ""))
    return docs.select(
        "doc_id",
        F.round(F.length("text") / F.greatest(n_tok, F.lit(1)), 4).alias("mean_word_len"),
        F.round(stop_hits / F.greatest(n_tok, F.lit(1)), 4).alias("stopword_ratio"),
        F.round(n_punct / F.greatest(F.length("text"), F.lit(1)), 4).alias("punct_ratio"),
        F.round(n_upper / F.greatest(F.length("text"), F.lit(1)), 4).alias("upper_ratio"),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """N-gram-free language heuristic: stopword-ratio vote. A document whose
    whitespace tokens hit the English closed-class list above a threshold is
    'en', else 'unknown'. (A real system plugs fastText here; the operator
    shape — cheap vote, no UDF — is the point.)"""
    toks = tokens_col()
    n_tok = F.greatest(F.size(toks), F.lit(1))
    stop_hits = F.size(F.filter(toks, lambda t: F.lower(t).isin(STOPWORDS)))
    ratio = stop_hits / n_tok
    return docs.select(
        "doc_id",
        F.round(ratio, 4).alias("en_score"),
        F.when(ratio >= 0.08, F.lit("en")).otherwise(F.lit("unknown")).alias("pred_lang"),
    )


def fingerprint(docs: DataFrame) -> DataFrame:
    """Document fingerprints: md5 of the raw text (exact-dup key) and md5 of
    the whitespace/case-normalized text (the reference's md5 pair-key trick,
    ``utils.py:267-268``, applied per-document)."""
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    return docs.select(
        "doc_id",
        F.md5(F.col("text")).alias("fp_exact"),
        F.md5(norm).alias("fp_normalized"),
    )
