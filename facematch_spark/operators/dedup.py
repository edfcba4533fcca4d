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
    from facematch_spark.operators.signatures import _ensure_parallel

    docs = _ensure_parallel(docs)
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
    """Exact char-k-gram Jaccard pairs ≥ threshold, via a prefix-filtered
    set-similarity join (PPJoin-style; Xiao et al., WWW'08 — public
    algorithm):

      1. shingle sets hashed to longs (xxhash64 — join keys stay 8 bytes;
         distinct counts, hence Jaccard values, are hash-collision-exact in
         expectation and deterministic for a given corpus);
      2. **prefix filter**: order each doc's shingles by global frequency
         (rarest first); two sets with Jaccard ≥ t MUST share a shingle
         within each other's first ``n - ceil(t*n) + 1`` shingles, so the
         candidate equi-join runs on prefixes only. Hot boilerplate shingles
         (the skew risk — sum over shingles of count² explodes on word-soup
         corpora) sit at the END of the frequency order and never enter the
         join;
      3. exact verification: per candidate pair, intersect the full sorted
         hash arrays in an Arrow-batched NumPy stage (np.intersect1d),
         compute jaccard = |∩| / (n_a + n_b - |∩|), filter.

    Exactness: step 2 is a lossless filter (prefix-filter theorem), step 3
    is exact set intersection — output matches the naive all-shared-shingle
    join bit for bit (integer-ratio doubles).
    """
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql import Window as W

    # materialize once: the shingle relation feeds five consumers (freq,
    # rank, cardinality, broadcast collect, fallback arrays) — without a
    # checkpoint each one would re-run the explode+hash lineage
    sh = (
        char_shingles(docs, k)
        .select("doc_id", F.xxhash64("shingle").alias("sh"))
        .localCheckpoint()
    )

    freq = sh.groupBy("sh").agg(F.count("*").alias("freq"))
    ranked = (
        sh.join(freq, "sh")
        .withColumn("rnk", F.row_number().over(W.partitionBy("doc_id").orderBy("freq", "sh")))
    )
    card = ranked.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    with_n = ranked.join(card, "doc_id")
    # prefix length: n - ceil(t*n) + 1
    prefix = (
        with_n.filter(
            F.col("rnk") <= F.col("n_sh") - F.ceil(F.lit(threshold) * F.col("n_sh")) + 1
        )
        .select("doc_id", "sh", "rnk", "n_sh")
        .localCheckpoint()  # feeds both sides of the self-join
    )

    # candidate join with the lossless PPJoin filters:
    #   length filter:   t·n_a ≤ n_b ≤ n_a/t  (else J < t regardless);
    #   positional:      at the first shared prefix element (positions i, j
    #                    in the global frequency order) the overlap is at
    #                    most 1 + min(n_a-i, n_b-j); taking max over shared
    #                    elements equals the first-element bound (earliest
    #                    shared element has the largest slack), and it must
    #                    reach α = ceil(t/(1+t)·(n_a+n_b)) for J ≥ t.
    # The per-pair positional bound is max over shared elements of
    # 1 + min(n_a-rnk_a, n_b-rnk_b) — a pair survives iff ANY join row
    # passes, so the filter applies per-row BEFORE the dedup shuffle
    # (map-side pruning; the groupBy-max formulation would shuffle every
    # shared-prefix row first).
    a, b = prefix.alias("a"), prefix.alias("b")
    alpha = F.ceil(
        F.lit(threshold) / (1 + threshold) * (F.col("a.n_sh") + F.col("b.n_sh"))
    )
    slack = F.least(
        F.col("a.n_sh") - F.col("a.rnk"), F.col("b.n_sh") - F.col("b.rnk")
    )
    cands = (
        a.join(
            b,
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.col("b.n_sh") * F.lit(threshold) <= F.col("a.n_sh"))
            & (F.col("a.n_sh") * F.lit(threshold) <= F.col("b.n_sh"))
            & (slack + 1 >= alpha),
        )
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )

    # Verification tiering: when the whole shingle relation fits in a
    # broadcast (rows bounded — ~8 bytes/shingle + ids), ship the per-doc
    # sorted arrays once to every executor and verify candidates with zero
    # array shuffle (candidates travel as two longs). Past the broadcast
    # ceiling, fall back to the array equi-join (each candidate pulls both
    # sorted arrays through the shuffle) — same results, more IO.
    BROADCAST_SHINGLE_LIMIT = 50_000_000
    n_shingle_rows = sh.count()

    def _intersect_jaccard(x: np.ndarray, y: np.ndarray) -> float:
        inter = np.intersect1d(x, y, assume_unique=True).size
        return inter / (x.size + y.size - inter)

    if n_shingle_rows <= BROADCAST_SHINGLE_LIMIT:
        by_doc: dict[int, frozenset] = {}
        for r in sh.groupBy("doc_id").agg(F.collect_list("sh").alias("arr")).collect():
            by_doc[r["doc_id"]] = frozenset(r["arr"])
        bc = docs.sparkSession.sparkContext.broadcast(by_doc)

        def verify_bc(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            lookup = bc.value
            for pdf in it:
                jac = []
                for ia, ib in zip(pdf["id_a"], pdf["id_b"]):
                    sa, sb = lookup[ia], lookup[ib]
                    inter = len(sa & sb) if len(sa) <= len(sb) else len(sb & sa)
                    jac.append(inter / (len(sa) + len(sb) - inter))
                out = pdf.assign(jaccard=jac)
                yield out[out["jaccard"] >= threshold]

        return cands.mapInPandas(verify_bc, schema="id_a long, id_b long, jaccard double")

    arrays = sh.groupBy("doc_id").agg(F.sort_array(F.collect_list("sh")).alias("arr"))
    paired = (
        cands.join(arrays.select(F.col("doc_id").alias("id_a"), F.col("arr").alias("arr_a")), "id_a")
        .join(arrays.select(F.col("doc_id").alias("id_b"), F.col("arr").alias("arr_b")), "id_b")
    )

    def verify(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            n = len(pdf)
            jac = np.empty(n, dtype=np.float64)
            aa, bb = pdf["arr_a"].to_numpy(), pdf["arr_b"].to_numpy()
            for i in range(n):
                jac[i] = _intersect_jaccard(
                    np.asarray(aa[i], dtype=np.int64), np.asarray(bb[i], dtype=np.int64)
                )
            out = pd.DataFrame({"id_a": pdf["id_a"], "id_b": pdf["id_b"], "jaccard": jac})
            yield out[out["jaccard"] >= threshold]

    return paired.mapInPandas(verify, schema="id_a long, id_b long, jaccard double")


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
