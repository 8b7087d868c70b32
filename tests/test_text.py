"""Edge-case tests for the training-pipeline text operators
(chunking, packing)."""

from __future__ import annotations

from pyspark.sql import functions as F



def test_chunking_edges(spark, sf_dir):
    """Every doc yields >=1 chunk; consecutive chunks overlap by 10
    tokens (stride 40, size 50); short docs yield exactly one chunk."""
    from ssb_coefficient_maker_spark.operators.text import q67_doc_chunking, words_col
    from ssb_coefficient_maker_spark.sources.loaders import load_table

    docs = load_table(spark, sf_dir, "documents")
    chunks = q67_doc_chunking(spark, sf_dir).toPandas()
    n_docs = docs.count()
    assert chunks.groupby("doc_id").size().min() >= 1
    assert chunks["doc_id"].nunique() == n_docs
    assert (chunks["chunk_len"] <= 50).all() and (chunks["chunk_len"] >= 1).all()
    # a doc with <=50 tokens must produce exactly one chunk
    short_ids = {
        r["doc_id"]
        for r in docs.select("doc_id", F.size(words_col(F.col("text"))).alias("n"))
        .filter(F.col("n") <= 50)
        .collect()
    }
    if short_ids:
        per_doc = chunks.groupby("doc_id").size()
        assert all(per_doc[d] == 1 for d in short_ids)


def test_sequence_packing_conserves_tokens(spark, sf_dir):
    """Packing must conserve the corpus token count and never let a
    bin start past the running-total capacity rule (each bin's fill
    is < capacity + its last doc's length by construction)."""
    from ssb_coefficient_maker_spark.operators.text import q68_sequence_packing, words_col
    from ssb_coefficient_maker_spark.sources.loaders import load_table

    bins = q68_sequence_packing(spark, sf_dir).toPandas()
    docs = load_table(spark, sf_dir, "documents")
    total = docs.select(F.sum(F.size(words_col(F.col("text")))).alias("t")).head()["t"]
    assert bins["n_tokens"].sum() == total
    # bin ids are the dense prefix range
    assert bins["bin_id"].tolist() == sorted(bins["bin_id"].tolist())
    # doc ranges are contiguous across bins (order-preserving packing)
    assert (bins["first_doc"].iloc[1:].to_numpy() > bins["last_doc"].iloc[:-1].to_numpy()).all()


def test_repetition_filter_flags_planted_repeats(spark, tmp_path):
    """A doc that is one phrase looped must score near-max rep_frac;
    natural-ish text must not be flagged at the 0.1 default."""
    import pandas as pd

    from ssb_coefficient_maker_spark.operators.text import q90_repetition_filter
    from ssb_coefficient_maker_spark.sources.loaders import load_table  # noqa: F401

    looped = " ".join(["buy cheap pills now"] * 12)
    normal = "the quick brown fox jumps over the lazy dog near the old river bank"
    short = "hi"
    pdf = pd.DataFrame({"doc_id": [0, 1, 2], "text": [looped, normal, short]})
    sf = str(tmp_path)
    spark.createDataFrame(pdf).write.parquet(sf + "/documents.parquet")
    out = q90_repetition_filter(spark, sf).toPandas().set_index("doc_id")
    assert out.loc[0, "rep_frac"] > 0.8 and bool(out.loc[0, "flagged"])
    assert not bool(out.loc[1, "flagged"])
    # sub-k-word doc: zero grams, rep 0, not flagged
    assert out.loc[2, "n_grams"] == 0 and out.loc[2, "rep_frac"] == 0.0


def test_decontamination_finds_planted_overlap(spark, tmp_path):
    """A corpus doc embedding a benchmark doc's 8-gram must surface
    with the right benchmark-hit count; clean docs must not."""
    import pandas as pd

    from ssb_coefficient_maker_spark.operators.dedup import q91_decontamination

    bench = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    contaminated = "prefix words here " + bench + " suffix words there"
    clean = "completely unrelated sentence about distributed query engines and storage"
    pdf = pd.DataFrame(
        {"doc_id": [0, 100, 101], "text": [bench, contaminated, clean]}
    )
    sf = str(tmp_path)
    spark.createDataFrame(pdf).write.parquet(sf + "/documents.parquet")
    out = q91_decontamination(spark, sf, bench_max_id=50).toPandas()
    assert out.doc_id.tolist() == [100]
    assert out.iloc[0].n_bench_docs == 1
    assert out.iloc[0].n_shared_grams >= 5  # 12-word overlap -> 5 shared 8-grams


def test_word_entropy_bounds(spark, sf_dir):
    """Per-language average word entropy must sit in (0, ln(max doc
    words)] — and a constant-word document must score exactly 0."""
    import math

    from pyspark.sql import functions as F

    from ssb_coefficient_maker_spark.operators.text import q113_word_entropy

    rows = q113_word_entropy(spark, sf_dir).collect()
    assert rows
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    max_words = docs.select(
        F.max(F.size(F.split(F.trim("text"), "\\s+")))
    ).collect()[0][0]
    for r in rows:
        assert 0 < r["avg_entropy"] <= r["max_entropy"] <= math.log(max_words) + 1e-9
    # degenerate doc: all words identical -> H = 0
    one = spark.createDataFrame([(1, "x x x x x", "en")], "doc_id long, text string, lang string")
    ex = one.select("doc_id", F.explode(F.split(F.trim("text"), "\\s+")).alias("w"))
    tf = ex.groupBy("doc_id", "w").count()
    n = ex.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    h = (
        tf.join(n, "doc_id")
        .groupBy("doc_id")
        .agg((-F.sum((F.col("count") / F.col("n")) * F.log(F.col("count") / F.col("n")))).alias("h"))
        .collect()[0]["h"]
    )
    assert h == 0.0


def test_word_entropy_single_explode_no_join(spark, sf_dir):
    """q113 must explode the corpus exactly ONCE: doc length is
    derived from the (doc, word) counts (H = ln(n) - sum(c*ln c)/n),
    not re-aggregated from the raw word stream — the round-3 shape
    evaluated the explode pipeline twice and joined the gram stream
    back to itself. One Generate, zero Joins in the optimized plan."""
    from ssb_coefficient_maker_spark.operators.text import q113_word_entropy

    plan = (
        q113_word_entropy(spark, sf_dir)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert plan.count("Generate") == 1, plan
    assert "Join" not in plan, plan
