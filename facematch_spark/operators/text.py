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


# PII patterns (C4/Dolma-style anonymization, public canon). Each pattern is
# written in the common subset of Java regex (Spark) and RE2 (DuckDB) —
# ASCII \d, \b word boundaries, greedy quantifiers — so the SQL oracle runs
# the IDENTICAL pattern and both engines produce the same matches.
# Order matters and is fixed: emails first (their local parts may contain
# digit runs a later numeric pattern would otherwise bite into), then IPv4,
# then phone numbers.
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}[- ]\d{3}[- ]\d{4}\b", "<PHONE>"),
]


def pii_redact(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """PII scrubbing — the anonymization pass training pipelines run before
    near-dup/quality stages (C4 / Dolma-style, public canon): replace
    emails, IPv4 addresses and phone-shaped numbers with typed placeholder
    tokens and count what was removed.

    Map-only Column expressions (three regexp_extract_all counts + three
    chained regexp_replace passes over the same scan) — zero shuffle, zero
    Python, partition-independent; at 100 TB this is a pure scan-side
    transform that fuses into whole-stage codegen with whatever runs next.
    Counts are taken BEFORE redaction (on the raw text) per pattern, in the
    fixed order above, each count on the text as left by the previous
    pattern's redaction so overlapping matches are attributed once.
    """
    cur = F.col(text_col)
    out_cols = [F.col("doc_id")]
    for name, pat, token in PII_PATTERNS:
        out_cols.append(
            F.size(F.regexp_extract_all(cur, F.lit(pat), F.lit(0)))
            .cast("long")
            .alias(f"n_{name}")
        )
        cur = F.regexp_replace(cur, pat, token)
    out_cols.append(cur.alias("redacted_text"))
    out_cols.append(F.md5(cur).alias("redacted_fp"))
    return docs.select(*out_cols)


def tfidf_top_terms(docs: DataFrame, k: int = 3) -> DataFrame:
    """Per-document top-``k`` salient terms by TF-IDF (raw term frequency ×
    ln(N/df); ties break score-desc then term-asc, so the output is a total
    order and value-hashable).

    Shape: one explode → one map-side-combined groupBy(doc_id, term) for tf
    (the only relation that sees per-position rows; everything after is
    bounded by Σ per-doc distinct terms) → document frequency as a window
    count over the tf relation (no second aggregate-join round trip, the
    session-5 prefix-stage lesson) → top-k row_number per doc. Three
    exchanges total, each over the (doc_id, term) relation, never the raw
    text. N is the full corpus document count, broadcast as a scalar.

    Scale: the tf relation is the big one but combines map-side; the df
    window partitions by term — a pathologically hot term (a stopword) is
    one skewed partition, which AQE skew-split handles since the window is
    count-only (order-free frame). At 100 TB the recorded alternative is a
    two-level partial-df aggregation; see SCALE.md.
    """
    from pyspark.sql import Window as W

    n_docs = docs.count()  # scalar; one job over the parquet footer stats
    tf = (
        docs.select("doc_id", F.explode(tokens_col()).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    df_w = W.partitionBy("term")
    scored = tf.withColumn("df", F.count("*").over(df_w)).withColumn(
        "score", F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 4)
    )
    rank_w = W.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(rank_w))
        .filter(F.col("rank") <= k)
        .select(
            "doc_id",
            F.col("rank").cast("long").alias("rank"),
            "term",
            F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
            "score",
        )
    )


def repetition_scores(docs: DataFrame) -> DataFrame:
    """Gopher-style repetition screens (Rae et al. 2021, appendix A1.1 —
    public) over word n-grams. The fixture corpus is single-line text, so
    the line-level Gopher rules would be constant here; the n-gram family is
    the live one and the line rules are a trivial re-instantiation (split on
    newline instead of whitespace).

    Columns (all round(·, 4), denominators = char length of the doc):

      * ``top_2gram_frac`` / ``top_3gram_frac`` — chars covered by the most
        frequent word n-gram (count × gram length ÷ n_chars); ties break to
        the lexicographically smallest gram; 0.0 when the doc has no n-gram.
      * ``dup_2gram_frac`` — Σ over 2-grams occurring > 1× of
        count × gram length ÷ n_chars — the sum-of-occurrences form of
        Gopher's "fraction of characters in duplicate n-grams" (overlaps
        counted per occurrence, the common public reproduction; can
        exceed 1 on degenerate repetition, which is precisely the signal).
      * ``dup_token_frac`` — fraction of token positions whose token occurs
        more than once in the doc.

    Shape: explode n-grams → groupBy(doc_id, gram) → per-doc re-aggregate.
    Deliberately NOT the map-only higher-order-function form: per-row
    ``transform(array_distinct(g), d -> size(filter(g, x = d)))`` is
    O(distinct × positions) per doc — quadratic, the same cliff class as the
    round-5 substr-shingle bug (a 1 MB doc would stall a task for minutes).
    The explode+groupBy form is linear, map-side-combined (partial counts
    before the shuffle), and AQE-skew-safe since the grouping key includes
    doc_id. A per-doc ``array_sort`` + run-length scan (O(n log n), zero
    shuffle) is the recorded alternative if this shuffle ever binds — see
    SCALE.md.
    """
    toks = tokens_col()
    base = docs.select("doc_id", F.greatest(F.length("text"), F.lit(1)).alias("n_chars"))

    tok_rel = docs.select("doc_id", F.explode(toks).alias("tok"))
    tok_counts = tok_rel.groupBy("doc_id", "tok").agg(F.count("*").alias("cnt"))
    tok_agg = tok_counts.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_tok"),
        F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(0)).alias("dup_tok"),
    )

    def _gram_aggs(n: int):
        d = docs.select("doc_id", toks.alias("tk")).filter(F.size("tk") >= n)
        grams = F.transform(
            F.sequence(F.lit(1), F.size("tk") - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice("tk", i, F.lit(n))),
        )
        rel = d.select("doc_id", F.explode(grams).alias("g"))
        counts = rel.groupBy("doc_id", "g").agg(F.count("*").alias("cnt"))
        from pyspark.sql import Window as W

        w = W.partitionBy("doc_id").orderBy(F.desc("cnt"), F.asc("g"))
        top = (
            counts.withColumn("rn", F.row_number().over(w))
            .filter("rn = 1")
            .select("doc_id", (F.col("cnt") * F.length("g")).alias(f"top{n}_chars"))
        )
        dup = counts.groupBy("doc_id").agg(
            F.sum(
                F.when(F.col("cnt") > 1, F.col("cnt") * F.length("g")).otherwise(0)
            ).alias(f"dup{n}_chars")
        )
        return top, dup

    top2, dup2 = _gram_aggs(2)
    top3, _ = _gram_aggs(3)

    out = (
        base.join(tok_agg, "doc_id", "left")
        .join(top2, "doc_id", "left")
        .join(top3, "doc_id", "left")
        .join(dup2, "doc_id", "left")
    )
    z = F.lit(0)
    return out.select(
        "doc_id",
        F.round(F.coalesce("top2_chars", z) / F.col("n_chars"), 4).alias("top_2gram_frac"),
        F.round(F.coalesce("top3_chars", z) / F.col("n_chars"), 4).alias("top_3gram_frac"),
        F.round(F.coalesce("dup2_chars", z) / F.col("n_chars"), 4).alias("dup_2gram_frac"),
        F.round(
            F.coalesce("dup_tok", z) / F.greatest(F.coalesce("n_tok", z), F.lit(1)), 4
        ).alias("dup_token_frac"),
    )


def chunk_documents(
    docs: DataFrame,
    size: int = 256,
    stride: int = 200,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into fixed-size overlapping character chunks — the
    map-only pre-tokenization step every LLM training pipeline runs (context
    packing / long-doc splitting; overlap = ``size - stride`` chars so no
    boundary n-gram is lost between neighbors).

    Pure ``explode(sequence(...)) + substring`` — whole-stage-codegen
    column expressions, zero Python, no shuffle (plan-asserted in pytest:
    no Exchange). Chunk offsets are ``0, stride, 2·stride, …`` up to the
    last offset < length; an empty document still yields one empty chunk
    (offset 0), so every input row is represented downstream. The final
    chunk is short, never padded — padding is the tokenizer's business.

    Output: (id_col, chunk_id, chunk_start, chunk_text, n_chunks) with
    chunk_id = offset / stride; n_chunks via a size() on the generated
    offset array, NOT a per-doc window (which would shuffle).
    """
    if stride <= 0 or size <= 0 or stride > size:
        raise ValueError("need 0 < stride <= size")
    offsets = F.sequence(
        F.lit(0), F.greatest(F.length(F.col(text_col)) - 1, F.lit(0)), F.lit(stride)
    )
    return (
        docs.select(
            F.col(id_col),
            F.size(offsets).cast("long").alias("n_chunks"),
            F.explode(offsets).alias("chunk_start"),
            F.col(text_col),
        )
        .select(
            F.col(id_col),
            F.floor(F.col("chunk_start") / stride).cast("long").alias("chunk_id"),
            F.col("chunk_start").cast("long").alias("chunk_start"),
            F.substring(F.col(text_col), F.col("chunk_start") + 1, F.lit(size)).alias("chunk_text"),
            F.col("n_chunks"),
        )
    )


def line_dedup(
    docs: DataFrame,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_lines: bool = False,
) -> DataFrame:
    """Line-level corpus deduplication — the C4/CCNet boilerplate scrub
    (Raffel et al. 2020 drop repeated three-sentence spans; CCNet dedups
    paragraphs): a line occurring in >= ``min_docs`` DISTINCT documents is
    corpus boilerplate (license headers, generator banners, nav chrome)
    and is removed from EVERY document; surviving lines are reassembled in
    their original order. Lines are compared verbatim (no normalization) so
    the SQL oracle reproduces the predicate exactly; blank lines follow the
    same rule as any other line.

    Dataflow (three shuffles, each on the natural key):
      1. ``posexplode(split(text, '\\n'))`` map-side;
      2. boilerplate detection: per-line distinct-doc count via
         ``dropDuplicates([key, id]) -> groupBy(key).count()`` — the two
         stages share one hash exchange on the key. A window
         ``collect_set(doc_id)`` would buffer every occurrence of a hot
         line per row (the hot key IS the boilerplate — a license line at
         100 TB occurs in billions of docs), so the agg form is the only
         scale-safe one;
      3. left join the line relation back on the same key (exchange reuse;
         AQE broadcasts when the boilerplate set is small, which it
         typically is) and re-group by doc to reassemble.

    ``hash_lines=True`` swaps the 8-byte ``xxhash64`` of the line for the
    line string as the detection/join key — the same shuffle diet as
    ``duplicate_spans(hash_grams=True)`` (parity pytest-pinned; a collision
    could only MERGE two lines' doc counts, i.e. over-remove).

    Every input row is represented in the output: a document whose lines
    are all boilerplate comes back with ``clean_text = ''``.

    Output: (id_col, clean_text, n_lines, n_removed).
    """
    arr = F.split(F.col(text_col), "\n")
    lines = docs.select(
        F.col(id_col),
        F.size(arr).cast("long").alias("n_lines"),
        F.posexplode(arr).alias("pos", "line"),
    )
    key = F.xxhash64("line") if hash_lines else F.col("line")
    bp = (
        lines.select(key.alias("_k"), id_col)
        .dropDuplicates()
        .groupBy("_k")
        .agg(F.count("*").alias("_ndocs"))
        .filter(F.col("_ndocs") >= min_docs)
        .select("_k", F.lit(True).alias("_bp"))
    )
    joined = lines.withColumn("_k", key).join(bp, "_k", "left")
    kept = F.when(F.col("_bp").isNull(), F.struct("pos", "line"))
    return (
        joined.groupBy(id_col, "n_lines")
        .agg(
            F.array_join(
                F.transform(F.array_sort(F.collect_list(kept)), lambda s: s["line"]),
                "\n",
            ).alias("clean_text"),
            F.sum(F.when(F.col("_bp").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_removed"),
        )
        .select(id_col, "clean_text", "n_lines", "n_removed")
    )
