"""Deduplication operator suite over a ``documents`` table
``(doc_id, text, lang, source, n_chars)`` — the training-data-pipeline
generalization of the core engine (SURVEY.md §2 + driver brief):

  * exact dedup        — hash groupBy (md5 key), pure SQL
  * n-gram Jaccard     — exact char-k-gram Jaccard via shingle equi-join,
                         pure built-in expressions (sequence/transform/
                         array_distinct/explode), SQL-oracle-checkable
  * MinHash + LSH      — the scale path (signatures → bands → join)
  * SimHash            — Hamming-ball near-dup pairs
  * containment        — substring dups via prefix-shingle candidate join
  * connected comps    — cluster ids over any of the pair relations

Exact-Jaccard here uses *string* shingles through Spark built-ins (no UDF, no
hashing) so the DuckDB oracle can reproduce values bit-for-bit; the MinHash
path reuses the engine's vectorized kernels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from facematch_spark.config import DedupeConfig
from facematch_spark.operators import lsh as L
from facematch_spark.operators import signatures as SIG


def exact_duplicates(docs: DataFrame) -> DataFrame:
    """Exact-dup groups: md5(text) key + group size + min doc_id as group
    representative. Hash-groupBy — one shuffle on the digest."""
    return (
        docs.select("doc_id", F.md5("text").alias("fp"))
        .groupBy("fp")
        .agg(
            F.count("*").cast("long").alias("group_size"),
            F.min("doc_id").alias("rep_id"),
        )
    )


def char_shingles(docs: DataFrame, k: int, text_col: str = "text") -> DataFrame:
    """(doc_id, shingle) distinct char k-grams via built-in expressions —
    stays in whole-stage codegen: sequence → transform(substring) →
    array_distinct → explode."""
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(text_col) - (k - 1), F.lit(0))),
            lambda i: F.substring(F.col(text_col), 1, 0).substr(i, F.lit(k))
            if False
            else F.col(text_col).substr(i, F.lit(k)),
        )
    )
    return (
        docs.filter(F.length(text_col) >= k)
        .select("doc_id", F.explode(grams).alias("shingle"))
    )


def ngram_jaccard_pairs(docs: DataFrame, k: int, threshold: float) -> DataFrame:
    """Exact char-k-gram Jaccard pairs ≥ threshold.

    Candidate generation = shingle equi-join (pairs sharing ≥1 shingle);
    exact by construction (J>0 ⇒ ≥1 shared shingle). Scale posture: the
    shuffle is on the shingle value; hot shingles are the skew risk — the
    production path (minhash_lsh_pairs) bounds them via banding + the
    hot-band cap, while this exact operator serves as its recall oracle.
    """
    sh = char_shingles(docs, k)
    card = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, F.col("a.shingle") == F.col("b.shingle"))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    ca = card.select(F.col("doc_id").alias("id_a"), F.col("n_sh").alias("n_a"))
    cb = card.select(F.col("doc_id").alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(ca, "id_a")
        .join(cb, "id_b")
        .withColumn("jaccard", F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter")))
        .filter(F.col("jaccard") >= F.lit(threshold))
        .select("id_a", "id_b", "jaccard")
    )


def docs_as_source_files(docs: DataFrame) -> DataFrame:
    """Adapt the documents table to the engine's SOURCE_FILES shape so the
    MinHash/SimHash kernels apply unchanged."""
    return docs.select(
        F.col("doc_id").cast("string").alias("repo"),
        F.lit("doc").alias("path"),
        F.lit("0" * 40).alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
    )


def doc_signatures(docs: DataFrame, cfg: DedupeConfig) -> DataFrame:
    """Documents → SIGNATURES (file_id replaced by doc_id)."""
    src = docs_as_source_files(docs)
    sigs = SIG.sign_documents(src, cfg)
    return sigs.withColumn("doc_id", F.col("repo").cast("long")).drop(
        "file_id", "repo", "path", "commit"
    ).withColumnRenamed("doc_id", "file_id")


def minhash_lsh_pairs(docs: DataFrame, cfg: DedupeConfig) -> DataFrame:
    """Scale-path near-dup pairs: MinHash signatures → LSH bands → candidate
    join → MinHash-estimated Jaccard filter. Returns
    (id_a, id_b, minhash_est). Recall vs the exact operator is pytest-gated
    (≥0.99 at the planted-dup Jaccard level)."""
    sigs = doc_signatures(docs, cfg)
    cands = L.candidate_pairs(sigs, cfg)
    from facematch_spark.operators.verify import attach_signature_metrics

    m = attach_signature_metrics(cands, sigs)
    return m.filter(F.col("minhash_est") >= F.lit(cfg.jaccard_threshold)).select(
        "id_a", "id_b", "minhash_est"
    )


def simhash_pairs(docs: DataFrame, cfg: DedupeConfig) -> DataFrame:
    """SimHash near-dup pairs: fingerprint once, candidate-generate by
    fingerprint band (4×16-bit chunks — any pair within Hamming ≤3 of 64 bits
    shares at least one exact 16-bit chunk by pigeonhole), then verify with
    bit_count(xor) ≤ max. All JVM-side."""
    sigs = doc_signatures(docs, cfg).filter(F.col("status") == "ok").select("file_id", "simhash")
    chunks = sigs.select(
        "file_id",
        "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("chunk_id"),
                    F.shiftrightunsigned("simhash", 16 * i).bitwiseAND(F.lit(0xFFFF)).alias("chunk"),
                )
                for i in range(4)
            ])
        ).alias("c"),
    ).select("file_id", "simhash", "c.chunk_id", "c.chunk")
    a, b = chunks.alias("a"), chunks.alias("b")
    return (
        a.join(
            b,
            on=[
                F.col("a.chunk_id") == F.col("b.chunk_id"),
                F.col("a.chunk") == F.col("b.chunk"),
                F.col("a.file_id") < F.col("b.file_id"),
            ],
        )
        .select(
            F.col("a.file_id").alias("id_a"),
            F.col("b.file_id").alias("id_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).cast("int").alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.col("hamming") <= F.lit(cfg.simhash_hamming_max))
    )


def containment_pairs(docs: DataFrame, k: int = 16) -> DataFrame:
    """Substring-containment dups: doc a verbatim inside doc b (a shorter).

    Candidate generation without O(N^2): a's *prefix k-gram* must appear
    among b's k-grams if a ⊆ b — equi-join a.prefix against b's exploded
    shingles, then verify with a built-in ``contains`` (JVM). The brute
    cross-join is avoided; the prefix join prunes to near-linear candidates.
    """
    short = docs.filter(F.length("text") >= k).select(
        F.col("doc_id").alias("id_a"),
        F.col("text").alias("text_a"),
        F.substring("text", 1, k).alias("prefix"),
    )
    big = char_shingles(docs, k).withColumnRenamed("doc_id", "id_b").withColumnRenamed("shingle", "gram")
    texts_b = docs.select(F.col("doc_id").alias("id_b"), F.col("text").alias("text_b"))
    cands = (
        short.join(big, [short.prefix == big.gram, short.id_a != big.id_b])
        .select("id_a", "id_b", "text_a")
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cands.join(texts_b, "id_b")
        .filter(
            (F.length("text_a") < F.length("text_b"))
            & F.col("text_b").contains(F.col("text_a"))
        )
        .select("id_a", "id_b")
    )


def dedup_clusters(docs: DataFrame, k: int, threshold: float) -> DataFrame:
    """Cluster assignment over exact n-gram-Jaccard edges: every doc gets a
    cluster_id = min doc_id of its connected component (singletons = self)."""
    from facematch_spark.operators.cluster import connected_components

    edges = ngram_jaccard_pairs(docs, k, threshold).select("id_a", "id_b")
    nodes = docs.select(F.col("doc_id").alias("file_id"))
    return (
        connected_components(edges, nodes=nodes)
        .select(F.col("file_id").alias("doc_id"), "cluster_id")
    )
