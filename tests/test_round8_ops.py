"""Round-8 operator tests: celled-tier quadratic guard, CDC empty-text
bounds, and the round-8 VERDICT/ADVICE items."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ssb_coefficient_maker_spark.sources.loaders import load_table


# ------------------------------------------- q115 celled-tier guard


class TestCelledTierGuard:
    def test_isotropic_corpus_refuses_past_bound(self, spark, sf_dir):
        """On a no-structure corpus the angular bound prunes ~nothing
        (raw testdata embeddings are isotropic — median ~78 deg to
        their own centroid), so the SURVIVING block-pair count stays
        ~quadratic and the guard must refuse loudly with the q57
        pointer instead of silently launching the full product."""
        from ssb_coefficient_maker_spark.operators.similarity import (
            cosine_neardup_celled,
        )

        emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
        stats: dict = {}
        with pytest.raises(ValueError, match="q57|lsh_neardup_pairs"):
            cosine_neardup_celled(
                emb,
                threshold=0.4,
                n_cells=4,
                iters=1,
                block_size=8,
                stats=stats,
                max_block_pairs=16,
            )
        # the refusal was driven by the post-pruning count, and on
        # this corpus pruning genuinely kept (almost) everything
        assert stats["surviving_block_pairs"] > 16
        assert stats["kept_cell_pairs"] >= stats["total_cell_pairs"] * 0.8

    def test_clustered_corpus_prunes_under_same_bound(self, spark, sf_dir):
        """Identical bound, but on the planted clustered corpus the
        bound fires: surviving pairs collapse to ~within-cell and the
        plan builds. The guard is inert exactly when pruning bites."""
        from ssb_coefficient_maker_spark.operators.similarity import (
            Q115_CLUSTERS,
            Q115_THRESHOLD,
            clustered_embeddings,
            cosine_neardup_celled,
        )

        emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
        corpus = clustered_embeddings(emb)
        stats: dict = {}
        df = cosine_neardup_celled(
            corpus,
            threshold=Q115_THRESHOLD,
            n_cells=Q115_CLUSTERS,
            iters=1,
            stats=stats,
        )
        assert df.columns == ["vec_a", "vec_b", "cos_sim"]
        assert stats["kept_cell_pairs"] < stats["total_cell_pairs"] * 0.25
        assert stats["surviving_block_pairs"] <= 8192

    def test_blocked_guard_counts_populated_blocks(self, spark):
        """The q50 guard counts POPULATED blocks (countDistinct of the
        block id), so a sparse/offset id space cannot overcount and
        spuriously refuse (round-7 guard inferred density from
        max(vec_id))."""
        from ssb_coefficient_maker_spark.operators.similarity import (
            cosine_neardup_blocked,
        )

        # 4 vectors with ids offset to 1e9..: max-id inference would
        # see ~1e9/2 blocks; the populated count is 2
        rows = [(10**9 + i, [1.0, float(i)]) for i in range(4)]
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )
        df = cosine_neardup_blocked(emb, block_size=2, max_block_pairs=3)
        assert df.count() >= 0  # plan built and runs


# --------------------------------------------- CDC empty-text bounds


class TestCdcEmptyText:
    def test_empty_text_yields_single_bound(self, spark):
        """bounds('') == [0], not [0, 0]: a duplicate bound would emit
        a zero-length md5('') chunk the oracle's list_distinct (and
        the old md5-window expression's array_distinct) never
        produces."""
        from ssb_coefficient_maker_spark.operators.dedup import (
            cdc_bounds_gear_udf,
        )

        df = spark.createDataFrame(
            [(0, ""), (1, "short"), (2, "x" * 64)], "doc_id long, text string"
        )
        out = {
            r["doc_id"]: r["b"]
            for r in df.select(
                "doc_id", cdc_bounds_gear_udf()(F.col("text")).alias("b")
            ).collect()
        }
        assert out[0] == [0]
        assert out[1] == [0, 5]
        assert out[2][0] == 0 and out[2][-1] == 64
        assert len(out[2]) == len(set(out[2]))  # no duplicate bounds
