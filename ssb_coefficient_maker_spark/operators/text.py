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
    pre-filter in LLM data pipelines.

    STAGED projections: the word array (and each count derived from
    it) is aliased once per stage and later stages reference the
    alias. Inlining everything into one select re-evaluates the
    split/filter lambdas per consuming expression — higher-order
    functions are excluded from codegen subexpression elimination —
    measured 2.3× slower on the sf0.1 corpus."""
    docs = load_table(spark, sf_dir, "documents")
    stop_arr = F.array([F.lit(s) for s in STOPWORDS])
    stage_w = docs.select("doc_id", "text", words_col(F.col("text")).alias("w"))
    stage_counts = stage_w.select(
        "doc_id",
        F.size("w").cast("long").alias("n_words"),
        F.length(F.regexp_replace(F.trim(F.col("text")), "\\s+", "")).cast("long").alias("n_nonspace"),
        F.size(F.filter(F.col("w"), lambda x: F.array_contains(stop_arr, x)))
        .cast("long")
        .alias("n_stop"),
    )
    stage_ratios = stage_counts.select(
        "doc_id",
        "n_words",
        F.round(F.col("n_nonspace").cast("double") / F.col("n_words"), 4).alias("avg_word_len"),
        F.round(F.col("n_stop").cast("double") / F.col("n_words"), 4).alias("stopword_ratio"),
    )
    # no final round: inputs are exactly-rounded 4-decimal doubles, so
    # this expression is bitwise-identical across engines; a last round
    # would reintroduce half-up-vs-half-even boundary flips
    score = F.when(F.col("n_words") < 5, 0.0).otherwise(
        1.0
        - F.abs(F.col("stopword_ratio") - 0.4)
        - F.abs(F.col("avg_word_len") - 5.0) / 10.0
    )
    return stage_ratios.select(
        "doc_id",
        "n_words",
        "avg_word_len",
        "stopword_ratio",
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
    en_markers = F.array([F.lit(w) for w in ["the", "a", "is", "and"]])
    # staged like q26: one word-array evaluation, one predicted-lang
    # evaluation (the single-select form re-ran the filter lambda for
    # every expression referencing `predicted`)
    stage_w = docs.select("doc_id", "lang", words_col(F.lower(F.col("text"))).alias("w"))
    stage_ratio = stage_w.select(
        "doc_id",
        "lang",
        (
            F.size(F.filter(F.col("w"), lambda x: F.array_contains(en_markers, x))).cast("double")
            / F.size("w")
        ).alias("ratio"),
    )
    stage_pred = stage_ratio.select(
        "doc_id",
        "lang",
        F.when(F.col("ratio") >= 0.05, F.lit("en")).otherwise(F.lit("und")).alias("predicted_lang"),
    )
    return stage_pred.select(
        "doc_id",
        "predicted_lang",
        F.col("lang").alias("actual_lang"),
        (F.col("predicted_lang") == F.col("lang")).cast("int").alias("correct"),
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


def q66_tfidf_top_terms(spark: SparkSession, sf_dir: str, top_k: int = 3) -> DataFrame:
    """TF-IDF top terms per document (bounded 200-doc slice so the
    oracle output stays small; the plan is corpus-size-agnostic).

    Shape at scale: one explode of the token stream, ONE (doc, term)
    count aggregation, a term-level document-frequency aggregation of
    that, joined back on the term, then a per-doc top-k window. All
    JVM expressions; the only wide shuffles are the two aggregations,
    both on high-cardinality keys (no skew). The doc-frequency side is
    NOT hint-broadcast: it is vocabulary-sized, which grows with the
    corpus — AQE picks broadcast from runtime stats while it fits and
    falls back to a shuffle join when it doesn't.
    """
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    # Corpus size as a broadcast 1-row aggregate (the q95 scalar-subquery
    # pattern) instead of a separate driver-side count() action: the whole
    # TF-IDF computation is ONE Spark job.
    nd = docs.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    ex = docs.select("doc_id", F.explode(words_col(F.col("text"))).alias("w"))
    tf = ex.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("tfreq"))
    doclen = ex.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dlen"))
    dfreq = tf.groupBy("w").agg(F.count(F.lit(1)).alias("dfreq"))
    scored = (
        tf.join(doclen, "doc_id")
        .join(dfreq, "w")
        .crossJoin(F.broadcast(nd))
        .withColumn(
            "tfidf",
            F.round(
                (F.col("tfreq") / F.col("dlen"))
                * F.log(F.col("n_docs") / F.col("dfreq")),
                4,
            ),
        )
    )
    win = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("w"))
    return (
        scored.withColumn("rk", F.row_number().over(win))
        .filter(F.col("rk") <= top_k)
        .select("doc_id", F.col("rk").alias("rank"), F.col("w").alias("term"), "tfidf")
        .orderBy("doc_id", "rank")
    )


def q67_doc_chunking(
    spark: SparkSession, sf_dir: str, chunk: int = 50, stride: int = 40
) -> DataFrame:
    """Fixed-size overlapping token chunking (chunk=50, overlap=10) —
    the standard context-window prep for LLM training. Pure
    expressions: one ``sequence`` + ``posexplode`` per doc, a
    ``slice`` per chunk; no shuffle at all until the final sort. Each
    chunk is verified by content hash, so the oracle checks the exact
    token spans, not just counts."""
    docs = load_table(spark, sf_dir, "documents")
    words = words_col(F.col("text"))
    n = F.size(words)
    n_extra = F.greatest(n - chunk, F.lit(0))
    last_idx = F.ceil(n_extra.cast("double") / stride).cast("int")
    chunked = docs.select(
        "doc_id",
        words.alias("ws"),
        F.posexplode(F.sequence(F.lit(0), last_idx)).alias("chunk_idx", "start0"),
    ).select(
        "doc_id",
        "chunk_idx",
        F.slice("ws", F.col("start0") * stride + 1, chunk).alias("ck"),
    )
    return chunked.select(
        "doc_id",
        "chunk_idx",
        F.size("ck").alias("chunk_len"),
        F.md5(F.concat_ws(" ", "ck")).alias("chunk_hash"),
    ).orderBy("doc_id", "chunk_idx")


def q68_sequence_packing(
    spark: SparkSession, sf_dir: str, capacity: int = 512
) -> DataFrame:
    """Deterministic sequence packing: documents (in doc_id order)
    are packed into ~capacity-token bins by running token total —
    ``bin = floor(cum_tokens_before / capacity)``. The contiguous
    variant every distributed trainer actually uses (true first-fit
    bin packing is inherently sequential; the running-total rule is
    order-deterministic and integer-exact across engines).

    The prefix sum is DISTRIBUTED: a naive global-order window would
    collapse to one partition. Instead: local running totals inside
    doc_id range groups + a broadcast of the per-group offsets (the
    classic two-stage prefix sum — the offset table is one row per
    group, the only single-partition step, and it is tiny). The
    decomposition is exact, so the simple global-cumsum SQL oracle
    produces identical bins."""
    from pyspark.sql import Window

    group = 1000  # docs per prefix-sum group; at 100 TB pick ~rows/partition
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.size(words_col(F.col("text"))).cast("long").alias("n_tok"),
        (F.col("doc_id") / group).cast("long").alias("grp"),
    )
    local_win = Window.partitionBy("grp").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    grp_totals = toks.groupBy("grp").agg(F.sum("n_tok").alias("grp_tok"))
    offset_win = Window.orderBy("grp").rowsBetween(Window.unboundedPreceding, -1)
    offsets = grp_totals.withColumn(
        "grp_offset", F.coalesce(F.sum("grp_tok").over(offset_win), F.lit(0))
    ).select("grp", "grp_offset")
    binned = (
        toks.join(F.broadcast(offsets), "grp")
        .withColumn(
            "cum_before",
            F.col("grp_offset") + F.coalesce(F.sum("n_tok").over(local_win), F.lit(0)),
        )
        .withColumn("bin_id", F.floor(F.col("cum_before") / capacity).cast("long"))
    )
    return (
        binned.groupBy("bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("bin_id")
    )


def q75_udtf_rle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4 user-defined TABLE function) as the
    imperative row-expansion seam: run-length encoding of each
    document's word stream — one input row fans out to one row per
    run of consecutive equal words. The sequential run-tracking loop
    is what the UDTF extension point is FOR (expression to express it
    natively: a lag window + islands sum — exactly the SQL the oracle
    runs, so the UDTF's semantics are fully checked). Bounded to
    doc_id < 100 to keep the oracle output small."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id long, seg_idx int, word string, run_len int")
    class RLE:
        def eval(self, doc_id: int, text: str):
            words = text.strip().split()
            seg = -1
            prev = None
            run = 0
            for w in words:
                if w != prev:
                    if prev is not None:
                        yield doc_id, seg, prev, run
                    seg += 1
                    prev = w
                    run = 1
                else:
                    run += 1
            if prev is not None:
                yield doc_id, seg, prev, run

    spark.udtf.register("rle_words", RLE)
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    docs.createOrReplaceTempView("docs_for_rle")
    return spark.sql(
        "SELECT r.* FROM docs_for_rle, LATERAL rle_words(doc_id, text) r "
        "ORDER BY doc_id, seg_idx"
    )


def ngram_hashes_col(col: Column, k: int) -> Column:
    """k-word-gram identities of the normalized text as an
    array<long> (empty array below k words): each word hashed once
    (xxhash64), grams as rolling combines via zip_with over shifted
    slices — O(n·k) integer ops per row, no gram-string
    materialization (measured 3.8× faster than the string form on
    the sf0.1 corpus). A gram's identity is its 64-bit hash —
    collisions are negligible at any per-document gram count, so
    distinct/total counts match the string identities an external
    engine computes."""
    from ssb_coefficient_maker_spark.operators.dedup import normalized_text

    words = F.split(normalized_text(col), " ")
    n = F.size(words)
    m = n - (k - 1)
    hs = F.transform(words, lambda w: F.xxhash64(w))

    def rolled() -> Column:
        acc = F.slice(hs, 1, m)
        for j in range(1, k):
            acc = F.zip_with(acc, F.slice(hs, 1 + j, m), lambda a, b: F.xxhash64(a, b))
        return acc

    empty = F.array().cast("array<long>")
    return F.when(n >= k, rolled()).otherwise(empty)


def q90_repetition_filter(
    spark: SparkSession, sf_dir: str, k: int = 3, threshold: float = 0.1
) -> DataFrame:
    """Repetition-based quality signal (the Gopher/MassiveText-style
    rule family): fraction of k-word-grams that are duplicates of an
    earlier gram in the SAME document. Machine-generated and boiler-
    plate text repeats itself; high rep_frac docs get filtered before
    training. Pure per-row expressions (gram array, two sizes) + no
    shuffle at all — at 100 TB this is a map-only pass. The oracle
    computes the same counts over gram STRINGS — identical modulo
    64-bit hash collisions (negligible per document).
    """
    docs = load_table(spark, sf_dir, "documents")
    # STAGED projections: the gram array is aliased once and the
    # counts reference the alias — inlining the gram expression into
    # every consumer (the single-select form) re-evaluates the
    # zip_with chain per consuming expression (no cross-expression
    # CSE), measured 2.4× slower. CollapseProject keeps this staged
    # because `g` has multiple references.
    g = docs.select("doc_id", ngram_hashes_col(F.col("text"), k).alias("g"))
    counts = g.select(
        "doc_id",
        F.size("g").alias("n"),
        F.size(F.array_distinct("g")).alias("nd"),
    )
    rep = F.when(
        F.col("n") > 0,
        F.round(1.0 - F.col("nd").cast("double") / F.col("n").cast("double"), 4),
    ).otherwise(F.lit(0.0))
    return (
        counts.select(
            "doc_id",
            F.col("n").cast("long").alias("n_grams"),
            F.col("nd").cast("long").alias("n_distinct"),
            rep.alias("rep_frac"),
        )
        .withColumn("flagged", (F.col("rep_frac") > threshold).cast("boolean"))
        .orderBy("doc_id")
    )


def q113_word_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-distribution entropy per document — the information-
    density quality signal the CCNet/Gopher filter family uses
    (templated/boilerplate text has low entropy, natural prose high;
    thresholding it is the next filter after the repetition rule,
    q90). H = -sum((tf/len) * ln(tf/len)) over the doc's word
    frequencies — computed single-pass via the algebraic identity
    H = ln(n) - sum(c*ln(c))/n with n = sum(c), so doc length is
    derived FROM the (doc, word) counts instead of re-aggregating the
    raw word stream: the corpus explodes exactly once and there is no
    (doc,word)->doc join re-shuffling the gram stream (plan-asserted
    in tests/test_text.py). Shape at scale: explode -> (doc, word)
    count -> per-doc aggregate — both aggregations shuffle on doc_id
    and partial-aggregate map-side; the per-language rollup is
    languages-sized."""
    docs = load_table(spark, sf_dir, "documents")
    ex = docs.select(
        "doc_id", "lang", F.explode(words_col(F.col("text"))).alias("w")
    )
    tf = ex.groupBy("doc_id", "lang", "w").agg(F.count(F.lit(1)).alias("c"))
    ent = tf.groupBy("doc_id", "lang").agg(
        (
            F.log(F.sum("c"))
            - F.sum(F.col("c") * F.log("c")) / F.sum("c")
        ).alias("h")
    )
    return (
        ent.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("h"), 4).alias("avg_entropy"),
            F.round(F.max("h"), 4).alias("max_entropy"),
        )
        .orderBy("lang")
    )


Q113_ORACLE = """
WITH d AS (
  SELECT doc_id, lang, regexp_split_to_array(trim(text), '\\s+') AS ws
  FROM documents
), ex AS (
  SELECT doc_id, lang, unnest(ws) AS w FROM d
), tf AS (
  SELECT doc_id, lang, w, count(*) AS c FROM ex GROUP BY 1, 2, 3
), ent AS (
  SELECT doc_id, lang,
         ln(sum(c)) - sum(c * ln(c)) / sum(c) AS h
  FROM tf GROUP BY 1, 2
)
SELECT lang, count(*) AS n_docs, round(avg(h), 4) AS avg_entropy,
       round(max(h), 4) AS max_entropy
FROM ent GROUP BY lang ORDER BY lang
"""


# ------------------------------------------------------------------
# BPE tokenizer-training merge rounds (q226)
# ------------------------------------------------------------------

BPE_ROUNDS = 3


def _bpe_merge_round(vocab: DataFrame, r: int) -> tuple[DataFrame, DataFrame]:
    """One BPE training round over the weighted vocabulary
    ``(word, cnt, seq)`` — ``seq`` is the word's current
    space-joined token sequence. Returns (merged vocab, 1-row
    summary (round, new_token, pair_count, corpus_tokens_after)).

    Pair statistics are one vocab-sized groupBy; the k=1 argmax is
    collected driver-side and inlined as literals (the q35
    trained-centroids precedent — HF trainers pop the heap top the
    same way), so the merge itself compiles to a pure per-row JVM
    ``aggregate`` fold with NO shuffle and no window: walk the token
    array left to right, and when the accumulator's last token is
    ``pa`` and the current is ``pb``, replace the last with the
    merged token. That fold IS the greedy non-overlapping BPE
    contract — a merged token can never re-match (it is strictly
    longer than ``pa``), adjacent occurrences each merge, and
    same-token chains take every other position. A naive string
    ``replace`` on the joined sequence gets both wrong (adjacent
    occurrences share the delimiter space) — regression-tested
    against a pure-python reference on adversarial chain corpora.
    The DuckDB oracle computes the identical result via an explicit
    gaps-and-islands window pass (SQL has no ordered fold).

    An earlier all-lazy formulation (windows + joins, best pair as a
    1-row broadcast) was measured at 17 s warm / sf0.1 because every
    reference to the prior vocab re-derived the corpus groupBy; this
    form is ~1 job per round on the checkpointed vocab.
    """
    toks = F.split("seq", " ")
    pairs = vocab.select(
        "cnt",
        F.explode(
            F.expr(
                "transform(slice(split(seq, ' '), 1, size(split(seq, ' ')) - 1), "
                "(x, i) -> concat(x, ' ', split(seq, ' ')[i + 1]))"
            )
        ).alias("pair"),
    )
    best = (
        pairs.groupBy("pair")
        .agg(F.sum("cnt").alias("pair_count"))
        .orderBy(F.desc("pair_count"), F.asc("pair"))
        .limit(1)
        .collect()
    )
    if not best:
        raise ValueError(
            f"BPE round {r}: no pairs left to merge (all sequences are "
            "single tokens) — lower `rounds`"
        )
    pa, pb = best[0]["pair"].split(" ")
    new_token, pair_count = pa + pb, int(best[0]["pair_count"])
    merged_seq = F.array_join(
        F.aggregate(
            toks,
            F.array().cast("array<string>"),
            lambda acc, x: F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == F.lit(pa))
                & (x == F.lit(pb)),
                F.concat(
                    F.slice(acc, F.lit(1), F.size(acc) - 1),
                    F.array(F.lit(new_token)),
                ),
            ).otherwise(F.concat(acc, F.array(x))),
        ),
        " ",
    )
    merged = vocab.select("word", "cnt", merged_seq.alias("seq"))
    summary = merged.agg(
        F.sum(F.col("cnt") * F.size(F.split("seq", " "))).alias(
            "corpus_tokens_after"
        )
    ).select(
        F.lit(r).cast("int").alias("round"),
        F.lit(new_token).alias("new_token"),
        F.lit(pair_count).cast("long").alias("pair_count"),
        "corpus_tokens_after",
    )
    return merged, summary


def bpe_merge_rounds(docs: DataFrame, rounds: int = BPE_ROUNDS) -> DataFrame:
    """Distributed BPE tokenizer-training rounds (the Sennrich et al.
    2016 algorithm HuggingFace trainers implement): learn ``rounds``
    merge rules from a document corpus and report, per round, the
    learned token, its pair frequency, and the corpus token count
    AFTER applying the merge — the last column pins the merge
    APPLICATION (greedy, non-overlapping), not just the argmax
    selection.

    Corpus-scale work is exactly ONE map-side-combined word-count
    groupBy, materialized once (eager localCheckpoint — the q184/q220
    lineage-cut pattern; measured necessity: the all-lazy form
    re-derived the corpus groupBy per vocab reference, 17 s warm at
    sf0.1 vs ~1.9 s here); every round after that is ONE vocab-sized
    pair-count job (the standard trainer design — HF pre-tokenizes to
    word counts for the same reason), so round cost is independent of
    corpus size. Merges are literal fold expressions over the
    checkpointed vocab (see ``_bpe_merge_round``), so lineage stays
    shallow without per-round cuts. Ties break (count desc, pair asc)
    — total order, engine-independent. A production 30k-merge trainer
    runs the same job-per-round loop.
    """
    vocab = _initial_vocab(docs)
    summaries = []
    for r in range(1, rounds + 1):
        # merges are literal expressions over the checkpointed vocab,
        # so lineage stays shallow without per-round cuts
        vocab, summary = _bpe_merge_round(vocab, r)
        summaries.append(summary)
    out = summaries[0]
    for s in summaries[1:]:
        out = out.unionByName(s)
    return out.orderBy("round")


def _initial_vocab(docs: DataFrame) -> DataFrame:
    """Word-count vocabulary with char-split token sequences — the
    ONE corpus-scale job of BPE training, materialized eagerly so the
    vocab-sized merge rounds never re-derive it."""
    words = docs.select(F.explode(words_col(F.col("text"))).alias("word"))
    vocab = (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("seq", F.trim(F.regexp_replace("word", "(.)", "$1 ")))
    )
    return vocab.localCheckpoint(eager=True)


def q226_bpe_merge_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer-training rounds over the documents corpus —
    tokenizer TRAINING, the LLM-pipeline step the token-counting
    surface (q27/q178/q196) consumes but nothing else in the
    registry produces. See ``bpe_merge_rounds``. Value-oracled: the
    DuckDB replica mirrors the pair-count/argmax/greedy-merge rounds
    CTE-for-stage, so a wrong tie-break, an overlapping merge, or a
    lost occurrence shifts either a learned token or the post-merge
    corpus total and fails the driver hash."""
    return bpe_merge_rounds(load_table(spark, sf_dir, "documents"))


def bpe_trained_vocab(docs: DataFrame, rounds: int = BPE_ROUNDS) -> DataFrame:
    """Train ``rounds`` BPE merges (see ``bpe_merge_rounds``) and
    return the final weighted vocabulary ``(word, cnt, seq)`` — the
    APPLY artifact: tokenizing a corpus is then one broadcast join of
    its word instances against this table (BPE is word-local, so the
    per-word token sequence is the whole tokenizer)."""
    vocab = _initial_vocab(docs)
    for r in range(1, rounds + 1):
        vocab, _ = _bpe_merge_round(vocab, r)
    return vocab


def q229_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility / fairness audit — the APPLY half of the
    BPE story (q226 trains): tokenize the corpus with the trained
    vocab and report, per language, words, tokens, characters,
    FERTILITY (tokens per word — the cross-language fairness metric:
    languages the tokenizer under-serves pay more tokens for the same
    text) and COMPRESSION (chars per token). Applying BPE is one
    BROADCAST join of per-(lang, word) counts against the vocab's
    (word → token count) — the text column itself never reshuffles,
    and the tokenizer table is broadcast-sized by construction (it is
    the vocabulary). Value-oracled end to end: the DuckDB replica
    re-trains the same merges (the q226 CTE chain) and re-applies
    them, so a training drift OR an application bug lands in the
    fertility numbers and fails the driver hash."""
    docs = load_table(spark, sf_dir, "documents")
    vocab = bpe_trained_vocab(docs)
    lw = (
        docs.select("lang", F.explode(words_col(F.col("text"))).alias("word"))
        .groupBy("lang", "word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tok = vocab.select(
        "word",
        F.size(F.split("seq", " ")).alias("n_toks"),
        F.length("word").alias("n_chars_w"),
    )
    return (
        lw.join(F.broadcast(tok), "word")
        .groupBy("lang")
        .agg(
            F.sum("n").alias("n_words"),
            F.sum(F.col("n") * F.col("n_toks")).alias("n_tokens"),
            F.sum(F.col("n") * F.col("n_chars_w")).alias("n_chars"),
        )
        .select(
            "lang",
            "n_words",
            "n_tokens",
            "n_chars",
            F.round(F.col("n_tokens") / F.col("n_words"), 4).alias("fertility"),
            F.round(F.col("n_chars") / F.col("n_tokens"), 4).alias(
                "compression"
            ),
        )
        .orderBy("lang")
    )
