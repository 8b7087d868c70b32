"""Round-10 tests: the round-9 ADVICE fixes (chained same-corpus
rekey ordering, LSH store geometry threading + geometry-carrying
index, driver_priority import/decorator staleness), the shared
half-away-from-zero rounding helper, and the real multimodal header
decoder (q237)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ssb_coefficient_maker_spark.sources.loaders import load_table


# --------------------------- PinnedCache.rekey chained-rename ordering


class TestRekeyChainedRenames:
    """Chained keep maps (keep={b: a, c: b}) must read every source
    from the PRE-rekey state on BOTH paths — the same-corpus path
    previously applied renames sequentially against the live dict, so
    the just-moved entry got moved again (round-9 ADVICE, latent)."""

    def test_same_corpus_chain_reads_pre_rekey_state(self, spark):
        from ssb_coefficient_maker_spark.cachereg import PinnedCache

        c = PinnedCache("t10_chain_same")
        da = spark.range(2).persist()
        db = spark.range(3).persist()
        c.store("k1", ("a",), "v_a", pinned=[da])
        c.store("k1", ("b",), "v_b", pinned=[db])
        # chain: b <- a, c <- b. Pre-state reads: b gets v_a, c gets
        # v_b. Sequential application would give c the JUST-MOVED v_a.
        c.rekey("k1", keep={("b",): ("a",), ("c",): ("b",)})
        assert c.lookup("k1", ("a",)) is None
        assert c.lookup("k1", ("b",)) == "v_a"
        assert c.lookup("k1", ("c",)) == "v_b"
        assert da.is_cached and db.is_cached
        c.release()

    def test_corpus_change_chain_matches_same_corpus_chain(self, spark):
        from ssb_coefficient_maker_spark.cachereg import PinnedCache

        results = []
        for corpus_changes in (False, True):
            c = PinnedCache(f"t10_chain_{corpus_changes}")
            da = spark.range(2).persist()
            db = spark.range(3).persist()
            c.store("k1", ("a",), "v_a", pinned=[da])
            c.store("k1", ("b",), "v_b", pinned=[db])
            target = "k2" if corpus_changes else "k1"
            c.rekey(target, keep={("b",): ("a",), ("c",): ("b",)})
            results.append(
                (c.lookup(target, ("b",)), c.lookup(target, ("c",)))
            )
            c.release()
        assert results[0] == results[1] == ("v_a", "v_b")


# ------------------------------ LSH index geometry threading (store)


class TestLshGeometry:
    def test_root_geometry_roundtrip(self, tmp_path):
        from ssb_coefficient_maker_spark.operators.dedup import (
            _lsh_root_geometry,
            lsh_store_root,
        )

        root = lsh_store_root(str(tmp_path), family="md5", k=7)
        assert _lsh_root_geometry(root) == ("md5", 7)

    def test_foreign_root_refused(self, tmp_path):
        from ssb_coefficient_maker_spark.operators.dedup import (
            _lsh_root_geometry,
        )

        with pytest.raises(ValueError, match="not an lsh store root"):
            _lsh_root_geometry(str(tmp_path / "lsh_store"))

    def test_wrong_banding_refused(self, tmp_path):
        from ssb_coefficient_maker_spark.operators.dedup import (
            _lsh_root_geometry,
        )

        with pytest.raises(ValueError, match="mint a new root"):
            _lsh_root_geometry(str(tmp_path / "lsh_store_md5_k5_h64_b8_v1"))

    def test_writer_cross_checks_family_and_k(self, spark, sf_dir, tmp_path):
        from ssb_coefficient_maker_spark.operators.dedup import (
            N_BANDS,
            N_HASHES,
            write_lsh_store_base,
        )

        docs = load_table(spark, sf_dir, "documents").limit(5)
        root = str(tmp_path / f"lsh_store_md5_k5_h{N_HASHES}_b{N_BANDS}_v1")
        with pytest.raises(ValueError, match="does not match the root"):
            write_lsh_store_base(docs, root, family="xxhash64")
        with pytest.raises(ValueError, match="does not match the root"):
            write_lsh_store_base(docs, root, family="md5", k=9)

    def test_store_written_with_root_k_not_default(
        self, spark, sf_dir, tmp_path
    ):
        """A k=3 root must yield k=3 shingles on disk — previously the
        writer always shingled with the default k=5 regardless of what
        the root name claimed (round-9 ADVICE: 'wrong, not stale')."""
        from ssb_coefficient_maker_spark.cachereg import get_cache
        from ssb_coefficient_maker_spark.operators.dedup import (
            N_BANDS,
            N_HASHES,
            load_lsh_store,
            shingles_col,
            write_lsh_store_base,
        )

        docs = load_table(spark, sf_dir, "documents").filter(
            F.col("doc_id") < 40
        )
        root = str(tmp_path / f"lsh_store_md5_k3_h{N_HASHES}_b{N_BANDS}_v1")
        assert write_lsh_store_base(docs, root)
        index = load_lsh_store(spark, root)
        assert (index.family, index.k) == ("md5", 3)
        got = {
            (r["doc_id"], tuple(sorted(r["sh"])))
            for r in index[1].collect()
        }
        want = {
            (r["doc_id"], tuple(sorted(r["sh"])))
            for r in docs.select(
                "doc_id", shingles_col(F.col("text"), k=3, family="md5").alias("sh")
            ).collect()
        }
        assert got == want
        get_cache("lsh_store_index").release()

    def test_probe_refuses_mismatched_geometry(self, spark, sf_dir):
        from ssb_coefficient_maker_spark.cachereg import get_cache
        from ssb_coefficient_maker_spark.operators.dedup import (
            build_lsh_index,
            probe_lsh_index,
        )

        docs = load_table(spark, sf_dir, "documents").filter(
            F.col("doc_id") < 40
        )
        index = build_lsh_index(docs, family="md5", cache_name="t10_geom")
        assert (index.family, index.k) == ("md5", 5)
        batch = docs.limit(3)
        with pytest.raises(ValueError, match="does not match the index"):
            probe_lsh_index(batch, index, family="xxhash64")
        with pytest.raises(ValueError, match="does not match the index"):
            probe_lsh_index(batch, index, family="md5", k=4)
        # matching geometry still probes; a bare tuple is caller-owned
        # but now deprecated — it carries no geometry to verify, so
        # the probe warns (FutureWarning: visible under default
        # filters even from library code, round-10 ADVICE)
        probe_lsh_index(batch, index, family="md5").count()
        with pytest.warns(FutureWarning, match="bare .bands, shingles. tuple"):
            probe_lsh_index(batch, tuple(index), family="md5").count()
        get_cache("t10_geom").release()


# --------------------------------- shared half-away-from-zero rounding


class TestRound4Away:
    def test_matches_duckdb_round(self):
        import duckdb
        import numpy as np

        from ssb_coefficient_maker_spark.operators.similarity import (
            _round4_away,
        )

        vals = [0.89995, 0.90005, -0.89995, -0.90005, 0.25135, 0.12345]
        got = _round4_away(np.array(vals))
        want = [
            duckdb.sql(f"SELECT round({v!r}::DOUBLE, 4)").fetchone()[0]
            for v in vals
        ]
        assert got.tolist() == pytest.approx(want)


# ----------------------- driver_priority: imports/decorators as symbols


class TestPrioritySymbols:
    def _symbols(self, src):
        import os
        import sys

        sys.path.insert(
            0,
            os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools"),
        )
        import driver_priority

        return driver_priority._toplevel_symbols(src)

    def test_import_rebind_changes_symbol(self):
        a = self._symbols("from mod_x import helper\n\ndef q():\n    return helper()\n")
        b = self._symbols("from mod_y import helper\n\ndef q():\n    return helper()\n")
        assert a["helper"] != b["helper"]
        assert a["q"] == b["q"]

    def test_decorator_edit_changes_symbol(self):
        a = self._symbols("@deco(1)\ndef q():\n    return 1\n")
        b = self._symbols("@deco(2)\ndef q():\n    return 1\n")
        assert a["q"] != b["q"]

    def test_repeated_binding_merges_segments(self):
        base = "import helper\n\ndef helper():\n    return 1\n"
        edited = "import helper\n\ndef helper():\n    return 2\n"
        assert self._symbols(base)["helper"] != self._symbols(edited)["helper"]


# ------------------------------ real multimodal header decode (q237)


class TestHeaderDecode:
    def test_bmp_roundtrip(self):
        from ssb_coefficient_maker_spark.operators.multimodal import (
            _encode_bmp,
            decode_media_header,
        )

        got = decode_media_header(_encode_bmp(640, 480))
        assert (got["fmt"], got["width"], got["height"]) == ("bmp", 640, 480)
        assert got["sample_rate"] is None

    def test_bmp_topdown_negative_height(self):
        """Top-down BMPs store height NEGATIVE — the decoder must
        report magnitude (a real-world header quirk, not covered by
        the synthetic corpus)."""
        import struct

        from ssb_coefficient_maker_spark.operators.multimodal import (
            _encode_bmp,
            decode_media_header,
        )

        payload = bytearray(_encode_bmp(64, 32))
        struct.pack_into("<i", payload, 22, -32)
        got = decode_media_header(bytes(payload))
        assert (got["width"], got["height"]) == (64, 32)

    def test_ppm_roundtrip_with_comment(self):
        from ssb_coefficient_maker_spark.operators.multimodal import (
            _encode_ppm,
            decode_media_header,
        )

        got = decode_media_header(_encode_ppm(123, 45))
        assert (got["fmt"], got["width"], got["height"]) == ("ppm", 123, 45)

    def test_wav_roundtrip_duration(self):
        from ssb_coefficient_maker_spark.operators.multimodal import (
            _encode_wav,
            decode_media_header,
        )

        got = decode_media_header(_encode_wav(16000, 2, 48000))
        assert got["fmt"] == "wav"
        assert got["sample_rate"] == 16000
        assert got["channels"] == 2
        assert got["duration_ms"] == 3000

    def test_corrupt_magic_raises(self):
        from ssb_coefficient_maker_spark.operators.multimodal import (
            decode_media_header,
        )

        with pytest.raises(ValueError, match="unrecognized|empty"):
            decode_media_header(b"\x89PNG\r\n")
        with pytest.raises(ValueError, match="empty"):
            decode_media_header(b"")

    def test_truncated_wav_raises(self):
        from ssb_coefficient_maker_spark.operators.multimodal import (
            _encode_wav,
            decode_media_header,
        )

        with pytest.raises(ValueError, match="truncated WAV"):
            decode_media_header(_encode_wav(8000, 1, 100)[:20])

    def test_q237_matches_oracle_sf0001(self, spark):
        import duckdb
        import pandas as pd

        from ssb_coefficient_maker_spark.queries import REGISTRY

        sf = "/root/testdata/sf0.001"
        spec = REGISTRY["q237_header_decode"]
        got = spec.fn(spark, sf).toPandas()
        con = duckdb.connect()
        con.sql(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf}/documents.parquet')"
        )
        want = con.sql(spec.oracle).df()
        for frame in (got, want):
            for c in frame.columns:
                if c != "fmt":
                    frame[c] = frame[c].astype("Int64")
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True),
            want.reset_index(drop=True),
            check_dtype=False,
        )


# -------------------------------- auto tier dispatch (q238, round 10)


class TestNeardupAuto:
    def _corpus(self, spark, sf_dir):
        from ssb_coefficient_maker_spark.operators.similarity import (
            clustered_embeddings,
        )

        emb = load_table(spark, sf_dir, "embeddings").select(
            "vec_id", "embedding"
        )
        return clustered_embeddings(emb)

    def test_dispatch_picks_blocked_under_bound(self, spark, sf_dir):
        from ssb_coefficient_maker_spark.operators.similarity import (
            cosine_neardup_auto,
        )

        stats = {}
        cosine_neardup_auto(
            self._corpus(spark, sf_dir), threshold=0.95, stats=stats
        ).count()
        assert stats["tier"] == "blocked"
        assert stats["n_block_pairs"] <= 8192

    def test_tiers_agree_when_flip_is_forced(self, spark, sf_dir):
        """Force the celled tier with max_block_pairs=0-ish bound and
        small blocks — the dispatcher's two physical plans must return
        the IDENTICAL exact pair set (the q238 contract)."""
        from ssb_coefficient_maker_spark.operators.similarity import (
            cosine_neardup_auto,
        )

        corpus = self._corpus(spark, sf_dir)
        stats_b, stats_c = {}, {}
        blocked = cosine_neardup_auto(
            corpus, threshold=0.95, block_size=64, stats=stats_b
        )
        celled = cosine_neardup_auto(
            corpus,
            threshold=0.95,
            block_size=64,
            max_block_pairs=stats_b["n_block_pairs"] - 1,
            n_cells=16,
            stats=stats_c,
        )
        assert stats_b["tier"] == "blocked" and stats_c["tier"] == "celled"
        b = sorted(map(tuple, blocked.collect()))
        c = sorted(map(tuple, celled.collect()))
        assert b == c and len(b) > 0

    def test_unprunable_case_still_refuses(self, spark, sf_dir):
        """Isotropic corpus + low threshold past the bound: the celled
        tier's own guard must propagate — auto planning never silently
        runs the quadratic job."""
        from ssb_coefficient_maker_spark.operators.similarity import (
            cosine_neardup_auto,
        )

        emb = load_table(spark, sf_dir, "embeddings").select(
            "vec_id", "embedding"
        )
        with pytest.raises(ValueError, match="max_block_pairs"):
            cosine_neardup_auto(
                emb, threshold=0.1, block_size=16, max_block_pairs=3
            ).count()

    def test_q238_equals_q115(self, spark, sf_dir):
        from ssb_coefficient_maker_spark.operators.similarity import (
            q115_celled_neardup,
            q238_neardup_auto,
        )

        a = sorted(map(tuple, q238_neardup_auto(spark, sf_dir).collect()))
        b = sorted(map(tuple, q115_celled_neardup(spark, sf_dir).collect()))
        assert a == b and len(a) > 0
