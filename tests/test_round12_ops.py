"""Round-12 optimization tests: plan-shape and equivalence guards for
operators whose internals changed this round."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


class TestQ228SinglePassAggregation:
    """q228_ann_recall_audit now computes the exact brute-force top-k
    ONCE and derives n_exact and n_hits from a single left join with
    the marked IVF top-k (round 12: the old hits-join + separate
    groupBy duplicated the crossJoin subtree in the physical plan)."""

    @pytest.fixture(scope="class")
    def result_df(self, spark, sf_dir):
        from ssb_coefficient_maker_spark.queries import REGISTRY

        return REGISTRY["q228_ann_recall_audit"].fn(spark, sf_dir)

    def test_exact_subtree_appears_once(self, result_df):
        # Two cross joins total: embeddings x panel (exact side) and
        # panel x centroids (probe selection). The old shape had three
        # (the exact side twice). No sort-merge join remains.
        plan = result_df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("BroadcastNestedLoopJoin") == 2, plan
        assert "SortMergeJoin" not in plan, plan

    def test_values_consistent(self, result_df):
        from ssb_coefficient_maker_spark.queries import (
            Q228_QUERY_CAP,
            Q228_QUERY_MOD,
            Q228_TOP_K,
        )

        rows = result_df.collect()
        assert rows, "empty recall audit"
        qids = [r["qid"] for r in rows]
        assert qids == sorted(qids)
        for r in rows:
            assert r["qid"] % Q228_QUERY_MOD == 0 and r["qid"] < Q228_QUERY_CAP
            assert 0 <= r["n_hits"] <= r["n_exact"] <= Q228_TOP_K
            assert r["recall"] == round(r["n_hits"] / float(Q228_TOP_K), 4)

    def test_hits_match_independent_intersection(self, spark, sf_dir, result_df):
        """Recompute |exact ∩ ivf| per qid with the pre-round-12 shape
        (inner join + separate aggregates) and compare."""
        from pyspark.sql import Window

        from ssb_coefficient_maker_spark.functions.vectors import cosine
        from ssb_coefficient_maker_spark.operators.similarity import ivf_index
        from ssb_coefficient_maker_spark.queries import (
            Q228_CENTROIDS,
            Q228_NPROBE,
            Q228_QUERY_CAP,
            Q228_QUERY_MOD,
            Q228_TOP_K,
            literal_df,
            load_table,
        )

        cents, assigned = ivf_index(spark, sf_dir, n_centroids=Q228_CENTROIDS)
        emb = load_table(spark, sf_dir, "embeddings")
        qs = emb.filter(
            (F.col("vec_id") % Q228_QUERY_MOD == 0)
            & (F.col("vec_id") < Q228_QUERY_CAP)
        ).select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qv"))
        cent_df = literal_df(
            spark,
            [(i, [float(x) for x in c]) for i, c in enumerate(cents)],
            "bucket int, cent array<double>",
        )
        wprobe = Window.partitionBy("qid").orderBy(
            F.desc("score"), F.asc("bucket")
        )
        probes = (
            qs.crossJoin(F.broadcast(cent_df))
            .withColumn("score", cosine(F.col("cent"), F.col("qv")))
            .withColumn("rn", F.row_number().over(wprobe))
            .filter(F.col("rn") <= Q228_NPROBE)
            .select("qid", "qv", "bucket")
        )
        wrank = Window.partitionBy("qid").orderBy(
            F.desc("cos_sim"), F.asc("vec_id")
        )

        def topk(scored):
            return (
                scored.filter(F.col("vec_id") != F.col("qid"))
                .withColumn("rank", F.row_number().over(wrank))
                .filter(F.col("rank") <= Q228_TOP_K)
                .select("qid", "vec_id")
            )

        exact = topk(
            emb.crossJoin(F.broadcast(qs)).select(
                "qid",
                "vec_id",
                F.round(cosine(F.col("embedding"), F.col("qv")), 4).alias(
                    "cos_sim"
                ),
            )
        )
        ivf = topk(
            assigned.join(F.broadcast(probes), "bucket").select(
                "qid",
                "vec_id",
                F.round(cosine(F.col("embedding"), F.col("qv")), 4).alias(
                    "cos_sim"
                ),
            )
        )
        hits = (
            exact.join(ivf, ["qid", "vec_id"])
            .groupBy("qid")
            .agg(F.count(F.lit(1)).alias("n_hits"))
        )
        old = {
            r["qid"]: (r["n_exact"], r["n_hits"])
            for r in (
                exact.groupBy("qid")
                .agg(F.count(F.lit(1)).alias("n_exact"))
                .join(hits, "qid", "left")
                .select(
                    "qid",
                    "n_exact",
                    F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
                )
                .collect()
            )
        }
        new = {r["qid"]: (r["n_exact"], r["n_hits"]) for r in result_df.collect()}
        assert new == old


class TestBlockPairComputeSpread:
    """round 12: the block-pair tables feeding the dense-product
    kernels are explicitly repartitioned (compute-aware) — AQE's
    byte-based coalescing packed ~64 pairs per task and capped the
    kernel at a few tasks regardless of core count (measured sf1:
    q50 ~23 s warm on 32 AND on 8 cores; 5.6 s after the spread)."""

    def test_blocked_kernel_plan_has_spread_exchange(self, spark, sf_dir):
        from ssb_coefficient_maker_spark.queries import REGISTRY

        df = REGISTRY["q50_embedding_neardup"].fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "REPARTITION_BY_NUM" in plan, plan

    def test_spread_width_is_bounded(self, spark, sf_dir):
        # cap = min(n_pairs, 2 * defaultParallelism): tiny corpora
        # must not fan out beyond their pair count
        from ssb_coefficient_maker_spark.queries import load_table
        from ssb_coefficient_maker_spark.operators.similarity import (
            cosine_neardup_blocked,
        )

        emb = load_table(spark, sf_dir, "embeddings")
        out = cosine_neardup_blocked(emb, threshold=0.4)
        n = out.rdd.getNumPartitions()
        slots = spark.sparkContext.defaultParallelism
        assert 1 <= n <= 2 * slots
