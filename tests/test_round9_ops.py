"""Round-9 tests: the round-8 ADVICE fixes (same-corpus rekey carry,
half-away-from-zero dominance rounding, the q233 column-API rewrite),
the storage-backed LSH index round-trip (q234), and the
``leontief(a, tol)`` grammar form (q235)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ssb_coefficient_maker_spark.sources.loaders import load_table


# ------------------------------------ PinnedCache.rekey same-corpus carry


class TestRekeySameCorpus:
    """rekey() on an already-current corpus must still apply the
    ``keep`` param-key renames (round-8 ADVICE: the old early return
    silently dropped them, quietly breaking the parent-carry contract
    for a caller appending under an already-rekeyed corpus)."""

    def test_same_corpus_rename_applies(self, spark):
        from ssb_coefficient_maker_spark.cachereg import PinnedCache

        c = PinnedCache("t9_samekey_rename")
        df = spark.range(3).persist()
        c.store("k1", ("main",), "v_main", pinned=[df])
        c.rekey("k1", keep={("parent", "k0"): ("main",)})
        # the entry moved to the new param key, frames still pinned
        assert c.lookup("k1", ("main",)) is None
        assert c.lookup("k1", ("parent", "k0")) == "v_main"
        assert df.is_cached
        c.release()

    def test_same_corpus_rename_is_idempotent(self, spark):
        from ssb_coefficient_maker_spark.cachereg import PinnedCache

        c = PinnedCache("t9_samekey_idem")
        df = spark.range(3).persist()
        c.store("k1", ("main",), "v_main", pinned=[df])
        c.rekey("k1", keep={("parent", "k0"): ("main",)})
        # second identical call: source key absent -> no-op, value kept
        c.rekey("k1", keep={("parent", "k0"): ("main",)})
        assert c.lookup("k1", ("parent", "k0")) == "v_main"
        assert df.is_cached
        c.release()

    def test_same_corpus_rename_frees_displaced_entry(self, spark):
        from ssb_coefficient_maker_spark.cachereg import PinnedCache

        c = PinnedCache("t9_samekey_displace")
        moved = spark.range(3).persist()
        displaced = spark.range(5).persist()
        c.store("k1", ("main",), "v_new", pinned=[moved])
        c.store("k1", ("parent", "k0"), "v_old", pinned=[displaced])
        c.rekey("k1", keep={("parent", "k0"): ("main",)})
        assert c.lookup("k1", ("parent", "k0")) == "v_new"
        assert moved.is_cached
        assert not displaced.is_cached  # freed, exactly like store()
        c.release()

    def test_identity_rename_is_noop(self, spark):
        from ssb_coefficient_maker_spark.cachereg import PinnedCache

        c = PinnedCache("t9_samekey_identity")
        df = spark.range(3).persist()
        c.store("k1", ("main",), "v", pinned=[df])
        c.rekey("k1", keep={("main",): ("main",)})
        assert c.lookup("k1", ("main",)) == "v"
        assert df.is_cached
        c.release()


# --------------------------- q230 dominance rounding (half away from zero)


class TestDominanceRounding:
    def test_half_away_from_zero_matches_duckdb(self):
        """The dominance kernel's 4-decimal round must be half AWAY
        FROM ZERO (DuckDB round()), not numpy banker's — a cosine
        landing exactly on a 5 in the 5th decimal must round UP
        (round-8 ADVICE)."""
        import numpy as np

        q = np.array([0.89995, 0.90005, -0.89995, 0.25135, 0.25145])
        got = np.sign(q) * np.floor(np.abs(q) * 1e4 + 0.5) / 1e4
        # duckdb: round(0.89995, 4) = 0.9, round(0.90005, 4) = 0.9001
        assert got[0] == pytest.approx(0.9)
        assert got[1] == pytest.approx(0.9001)
        assert got[2] == pytest.approx(-0.9)
        # banker's would give 0.2514 / 0.2514; half-away gives .2514/.2515
        assert got[3] == pytest.approx(0.2514)
        assert got[4] == pytest.approx(0.2515)

    def test_dominance_kernel_unchanged_off_ties(self, spark):
        """Off rounding ties (every real corpus value) the new rounding
        is identical to np.round — the planted-copy drop rule still
        fires and nothing else does."""
        import numpy as np

        from ssb_coefficient_maker_spark.operators.similarity import (
            _dominance_dropped,
        )

        rng = np.random.default_rng(9)
        base = rng.normal(size=(6, 8)).tolist()
        rows = [(i, 0, base[i]) for i in range(6)]
        rows.append((100, 0, base[2]))  # exact copy of vec 2 -> cos 1.0
        df = spark.createDataFrame(
            rows, "vec_id long, bucket int, embedding array<double>"
        )
        out = _dominance_dropped(df, threshold=0.9).toPandas()
        assert sorted(out.vec_id.tolist()) == [100]


# ------------------------------------------- q233 variant construction


class TestQ233VariantTail:
    def test_tail_markers_use_base_doc_id(self, spark, sf_dir):
        """The level-unique tail markers must carry the BASE doc id —
        the round-8 ADVICE rewrite moved the id shift to a second
        projection precisely because an HOF lambda's outer reference
        resolves against the projection output (the shifted id), not
        the input."""
        from ssb_coefficient_maker_spark.cachereg import get_cache
        from ssb_coefficient_maker_spark.operators.dedup import (
            Q233_VARIANT_STRIDE,
            q233_lsh_recall_audit,
        )

        get_cache("lsh_recall_audit").release()
        q233_lsh_recall_audit(spark, sf_dir)  # builds + pins the corpus
        sh_tbl, _bands = get_cache("lsh_recall_audit").pinned_frames()[0], None
        # level-1 variant of base doc 0 keeps half the words; its
        # dropped tail words end in '_1_0' (base id 0), which after
        # 5-shingling means its shingle set shares ~1/3 with doc 0 —
        # nonzero, which the recall audit's truth table relies on
        out = q233_lsh_recall_audit(spark, sf_dir).toPandas()
        assert len(out) == 4
        assert out.bin_lo.tolist() == [0.2, 0.45, 0.7, 0.95]
        # the J=1 structural anchor: exact copies always collide
        assert out.recall.iloc[3] == 1.0
        get_cache("lsh_recall_audit").release()
