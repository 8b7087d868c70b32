"""Round-11 operator tests: the exact-dup collapse pre-pass (q239),
the round-10 ADVICE fixes (header-decode error contract, bench
subset fail-fast, auto-dispatch single guard agg, bare-tuple probe
deprecation), and the auto-dispatcher front-door contract."""

from __future__ import annotations

import os
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

from ssb_coefficient_maker_spark.operators import dedup
from ssb_coefficient_maker_spark.sources.loaders import load_table

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestCollapsedNeardup:
    """q239: collapse exact-dup cliques, near-dup the representatives,
    expand — output must equal the uncollapsed tier EXACTLY."""

    def _cliqued(self, spark, sf_dir, copies=3, n_docs=120):
        """Planted clique corpus: every doc becomes a `copies`-clique
        of exact duplicates with shifted ids (the make_scale_data
        crawl shape, shrunk to test size)."""
        docs = load_table(spark, sf_dir, "documents").filter(
            F.col("doc_id") < n_docs
        )
        return docs.crossJoin(
            spark.range(copies).select(F.col("id").alias("r"))
        ).select((F.col("doc_id") + F.col("r") * 1000).alias("doc_id"), "text")

    def test_equals_uncollapsed_on_clique_corpus(self, spark, sf_dir):
        corpus = self._cliqued(spark, sf_dir)
        direct = dedup.minhash_lsh_pairs(
            corpus, threshold=0.4, family="md5"
        ).toPandas()
        dedup.release_shingle_cache()
        collapsed = dedup.minhash_neardup_collapsed(
            corpus, threshold=0.4, family="md5"
        ).toPandas()
        assert len(direct) > 0
        assert direct.equals(collapsed)
        dedup.release_shingle_cache()
        dedup.release_exact_dup_map()

    def test_equals_uncollapsed_via_pinned_shingle_fastpath(
        self, spark, sf_dir
    ):
        # when the batch tier already pinned the FULL-corpus shingle
        # table, the collapse derives rep shingles by semi-join — the
        # r11 lookup-only fast path must yield the identical pair set
        corpus = self._cliqued(spark, sf_dir)
        direct = dedup.minhash_lsh_pairs(
            corpus, threshold=0.4, family="md5"
        ).toPandas()
        # do NOT release the shingle cache: the collapsed call below
        # must take the pinned-table fast path
        from ssb_coefficient_maker_spark.cachereg import get_cache

        assert (
            get_cache("shingle_table").lookup(
                (corpus.semanticHash(), "md5"), ()
            )
            is not None
        )
        collapsed = dedup.minhash_neardup_collapsed(
            corpus, threshold=0.4, family="md5"
        ).toPandas()
        assert len(direct) > 0
        assert direct.equals(collapsed)
        dedup.release_shingle_cache()
        dedup.release_exact_dup_map()
        get_cache("collapsed_rep_pairs").release()

    def test_equals_uncollapsed_without_any_dups(self, spark, sf_dir):
        # duplicate-free corpus: the pre-pass must be an exact no-op
        docs = load_table(spark, sf_dir, "documents").filter(
            F.col("doc_id") < 200
        )
        direct = dedup.minhash_lsh_pairs(
            docs, threshold=0.4, family="md5"
        ).toPandas()
        dedup.release_shingle_cache()
        collapsed = dedup.minhash_neardup_collapsed(
            docs, threshold=0.4, family="md5"
        ).toPandas()
        assert direct.equals(collapsed)
        dedup.release_shingle_cache()
        dedup.release_exact_dup_map()

    def test_canonicalize_map_and_reps(self, spark, sf_dir):
        corpus = self._cliqued(spark, sf_dir, copies=4, n_docs=30)
        reps, members = dedup.canonicalize_exact_dups(corpus)
        m = members.toPandas()
        # every clique maps to its min doc_id (the base replica)
        assert (m["rep_id"] == m["doc_id"] % 1000).all()
        # one representative row per distinct content, text preserved
        r = reps.toPandas()
        assert sorted(r["doc_id"]) == sorted(m["rep_id"].unique())
        assert set(reps.columns) == {"doc_id", "text"}
        dedup.release_exact_dup_map()

    def test_within_clique_pairs_are_jaccard_one(self, spark, sf_dir):
        corpus = self._cliqued(spark, sf_dir, copies=3, n_docs=10)
        out = dedup.minhash_neardup_collapsed(
            corpus, threshold=0.4, family="md5"
        ).toPandas()
        same_clique = out[
            (out["doc_a"] % 1000) == (out["doc_b"] % 1000)
        ]
        assert len(same_clique) == 10 * 3  # C(3,2) per clique
        assert (same_clique["jaccard"] == 1.0).all()
        dedup.release_shingle_cache()
        dedup.release_exact_dup_map()


class TestHeaderDecodeErrorContract:
    """Round-10 ADVICE: every corrupt-blob path raises the documented
    ValueError — never struct.error or ZeroDivisionError."""

    def test_truncated_bmp_raises_valueerror(self):
        from ssb_coefficient_maker_spark.operators.multimodal import (
            decode_media_header,
        )

        with pytest.raises(ValueError, match="truncated BMP"):
            decode_media_header(b"BM" + b"\x00" * 10)

    def test_zero_channel_wav_raises_valueerror(self):
        import struct

        from ssb_coefficient_maker_spark.operators.multimodal import (
            decode_media_header,
        )

        def wav(channels, bits, rate):
            return (
                struct.pack("<4sI4s", b"RIFF", 36 + 8, b"WAVE")
                + struct.pack(
                    "<4sIHHIIHH", b"fmt ", 16, 1, channels, rate,
                    rate * 2, 2, bits,
                )
                + struct.pack("<4sI", b"data", 8)
                + b"\x00" * 8
            )

        with pytest.raises(ValueError, match="corrupt WAV fmt"):
            decode_media_header(wav(0, 16, 8000))
        with pytest.raises(ValueError, match="corrupt WAV fmt"):
            decode_media_header(wav(1, 0, 8000))
        with pytest.raises(ValueError, match="corrupt WAV fmt"):
            decode_media_header(wav(1, 16, 0))


class TestBenchSubsetFailFast:
    """Round-10 ADVICE: a BENCH_ONLY subset that matches nothing must
    exit non-zero before a Spark session exists, not emit a
    success-shaped zero-value JSON."""

    def test_unknown_only_exits_nonzero(self):
        env = dict(os.environ, SPARK_GRAFT_BENCH_ONLY="zz_not_a_query")
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env, capture_output=True, text=True, timeout=300,
        )
        assert proc.returncode != 0
        assert "matched no registry queries" in proc.stderr
        # fail-fast contract: no JSON payload was emitted
        assert '"metric"' not in proc.stdout


class TestAutoDispatchSingleAgg:
    """Round-10 ADVICE: the auto dispatcher threads its block count
    into the blocked tier instead of re-running the guard agg."""

    def test_precounted_blocks_skips_recount_and_matches(self, spark, sf_dir):
        from ssb_coefficient_maker_spark.operators.similarity import (
            clustered_embeddings,
            cosine_neardup_blocked,
        )

        emb = load_table(spark, sf_dir, "embeddings").select(
            "vec_id", "embedding"
        )
        corpus = clustered_embeddings(emb).limit(200)
        base = cosine_neardup_blocked(corpus, threshold=0.95).toPandas()
        threaded = cosine_neardup_blocked(
            corpus, threshold=0.95, _n_blocks=1
        ).toPandas()
        assert base.equals(threaded)
        # the threaded count feeds the guard: an over-stated count
        # must trip it without running the eager agg
        with pytest.raises(ValueError, match="exceeds max_block_pairs"):
            cosine_neardup_blocked(
                corpus, threshold=0.95, max_block_pairs=2, _n_blocks=10
            )

    def test_front_door_tier_at_shipped_sfs(self, spark):
        """The documented front door (cosine_neardup_auto) selects the
        blocked tier at every shipped SF — the q238 dispatch contract
        (VERDICT r10 next-round #4)."""
        from ssb_coefficient_maker_spark.operators.similarity import (
            Q115_THRESHOLD,
            clustered_embeddings,
            cosine_neardup_auto,
        )

        for sf in ("sf0.001", "sf0.01"):
            emb = load_table(spark, f"/root/testdata/{sf}", "embeddings")
            corpus = clustered_embeddings(emb.select("vec_id", "embedding"))
            stats: dict = {}
            cosine_neardup_auto(
                corpus, threshold=Q115_THRESHOLD, stats=stats
            )
            assert stats["tier"] == "blocked", (sf, stats)


class TestPixelDecode:
    """q240: the pixel/sample layer decode must read bytes in the
    container's real layout — flip, padding, channel order, and
    interleave are each value-checked."""

    def test_bmp_ppm_same_logical_pixels(self):
        from ssb_coefficient_maker_spark.operators.multimodal import (
            _encode_bmp_px,
            _encode_ppm_px,
            decode_media_pixels,
        )

        # same dims/seed: BMP (bottom-up padded BGR) and PPM (top-down
        # RGB) encode the SAME logical image — a decoder that misses
        # the flip, the padding stride, or the BGR swap disagrees
        for w, h, seed in [(5, 4, 37), (4, 7, 0), (16, 14, 250)]:
            fb = decode_media_pixels(_encode_bmp_px(w, h, seed))
            fp = decode_media_pixels(_encode_ppm_px(w, h, seed))
            assert fb["n_units"] == fp["n_units"] == w * h
            for k in ("sum_c1", "sum_c2", "sum_c3", "wchk"):
                assert fb[k] == fp[k], (k, w, h, seed)

    def test_bmp_wchk_detects_missed_flip(self):
        import struct

        from ssb_coefficient_maker_spark.operators.multimodal import (
            _encode_bmp_px,
            decode_media_pixels,
        )

        # a top-down BMP (negative height) stores rows in the OPPOSITE
        # file order; same pixels, so sums agree — only the position-
        # weighted checksum can tell the layouts apart, and the
        # decoder must honour the sign
        w, h, seed = 5, 4, 37
        up = _encode_bmp_px(w, h, seed)
        body = up[54:]
        row = ((24 * w + 31) // 32) * 4
        flipped = b"".join(
            body[j * row : (j + 1) * row] for j in reversed(range(h))
        )
        down = (
            up[:18]
            + struct.pack("<ii", w, -h)
            + up[26:54]
            + flipped
        )
        fu, fd = decode_media_pixels(up), decode_media_pixels(down)
        assert fu == fd  # same logical image through both layouts
        # and a WRONG decode (treating bottom-up bytes as top-down)
        # would differ exactly in wchk: assert the checksum actually
        # depends on row order for this pattern
        wrong = decode_media_pixels(up[:18] + struct.pack("<ii", w, -h) + up[26:])
        assert wrong["sum_c1"] == fu["sum_c1"]
        assert wrong["wchk"] != fu["wchk"]

    def test_truncated_and_unsupported_raise(self):
        from ssb_coefficient_maker_spark.operators.multimodal import (
            _encode_bmp_px,
            _encode_ppm_px,
            _encode_wav_px,
            decode_media_pixels,
        )

        with pytest.raises(ValueError, match="truncated BMP pixel"):
            decode_media_pixels(_encode_bmp_px(5, 4, 1)[:-8])
        with pytest.raises(ValueError, match="truncated PPM pixel"):
            decode_media_pixels(_encode_ppm_px(5, 4, 1)[:-8])
        with pytest.raises(ValueError, match="truncated WAV sample"):
            decode_media_pixels(_encode_wav_px(8000, 2, 10, 1)[:-8])

    def test_stereo_interleave(self):
        from ssb_coefficient_maker_spark.operators.multimodal import (
            _encode_wav_px,
            decode_media_pixels,
        )

        f = decode_media_pixels(_encode_wav_px(8000, 2, 50, 99))
        s1 = sum(((99 * 31 + i * 17) % 65536) - 32768 for i in range(50))
        s2 = sum(((99 * 31 + i * 17 + 9) % 65536) - 32768 for i in range(50))
        wc = sum((i + 1) * (((99 * 31 + i * 17) % 65536) - 32768) for i in range(50))
        assert f == {
            "fmt": "wav", "n_units": 50, "sum_c1": s1, "sum_c2": s2,
            "sum_c3": None, "wchk": wc,
        }
        mono = decode_media_pixels(_encode_wav_px(8000, 1, 50, 99))
        assert mono["sum_c1"] == s1 and mono["sum_c2"] is None

    def test_q240_runs_and_covers_all_formats(self, spark, sf_dir):
        from ssb_coefficient_maker_spark.operators.multimodal import (
            q240_pixel_decode,
        )

        out = q240_pixel_decode(spark, sf_dir).toPandas()
        assert set(out["fmt"]) == {"bmp", "ppm", "wav"}
        assert out["n_units"].notna().all()
        assert out["wchk"].notna().all()
        # images carry all three channel sums; wav never has c3
        assert out.loc[out["fmt"] != "wav", "sum_c3"].notna().all()
        assert out.loc[out["fmt"] == "wav", "sum_c3"].isna().all()


class TestCollapsedWeightedJaccard:
    """q241: the collapse pre-pass applied to the case-SENSITIVE
    weighted-Jaccard verify — output must equal q214's exactly, and
    the collapse key must not fold case."""

    def _cliqued(self, spark, sf_dir, copies=3, n_docs=80):
        docs = load_table(spark, sf_dir, "documents").filter(
            F.col("doc_id") < n_docs
        )
        return docs.crossJoin(
            spark.range(copies).select(F.col("id").alias("r"))
        ).select((F.col("doc_id") + F.col("r") * 1000).alias("doc_id"), "text")

    def test_equals_uncollapsed_on_clique_corpus(self, spark, sf_dir):
        from ssb_coefficient_maker_spark.queries import (
            _weighted_jaccard_pairs,
        )

        corpus = self._cliqued(spark, sf_dir)
        direct = (
            _weighted_jaccard_pairs(corpus)
            .orderBy(F.desc("weighted_jaccard"), "a", "b")
            .toPandas()
        )
        reps, members = dedup.canonicalize_exact_dups(corpus, casefold=False)
        rep_pairs = _weighted_jaccard_pairs(reps)
        collapsed = (
            dedup.expand_pairs_through_cliques(
                rep_pairs, members, a_col="a", b_col="b",
                value_col="weighted_jaccard",
            )
            .orderBy(F.desc("weighted_jaccard"), "a", "b")
            .toPandas()
        )
        # FULL pair-set equality, not just the top-20 the query emits
        assert len(direct) > 0
        assert direct.equals(collapsed)
        dedup.release_exact_dup_map()

    def test_casefold_collapse_would_be_wrong(self, spark):
        """Two docs differing only in CASE: q214 scores them below 1.0
        (case-sensitive tokens), so the case-folding collapse must NOT
        merge them — casefold=False keeps them distinct."""
        import pandas as pd

        from ssb_coefficient_maker_spark.queries import (
            _weighted_jaccard_pairs,
        )

        docs = spark.createDataFrame(
            pd.DataFrame(
                {
                    "doc_id": [1, 2, 3],
                    # the case difference sits PAST the first-5-word
                    # family prefix, so the pair still blocks together
                    "text": [
                        "alpha beta gamma delta eps zeta eta",
                        "alpha beta gamma delta eps Zeta eta",  # case twin
                        "alpha beta gamma delta eps zeta eta",  # dup of 1
                    ],
                }
            )
        )
        reps_cs, members_cs = dedup.canonicalize_exact_dups(
            docs, casefold=False
        )
        m = members_cs.toPandas().set_index("doc_id")["rep_id"]
        assert m[1] == 1 and m[3] == 1 and m[2] == 2  # case twin NOT merged
        truth = _weighted_jaccard_pairs(docs).toPandas().set_index(["a", "b"])
        # the case pair scores below 1.0 — merging it would be wrong
        assert truth.loc[(1, 2), "weighted_jaccard"] < 1.0
        assert truth.loc[(1, 3), "weighted_jaccard"] == 1.0
        dedup.release_exact_dup_map()
        # the casefold=True map (q30/q31 equivalence) merges all three
        reps_cf, members_cf = dedup.canonicalize_exact_dups(
            docs, casefold=True
        )
        mcf = members_cf.toPandas().set_index("doc_id")["rep_id"]
        assert (mcf == 1).all()
        dedup.release_exact_dup_map()


class TestReviewFixesR11:
    """Round-11 review findings: pixel-layer error contracts (BMP
    26-29 bytes, non-16-bit-PCM WAV), NULL-text collapse divergence,
    and the cross-SF canary-normalization gate."""

    def test_bmp_header_ok_but_too_short_for_pixel_layer(self):
        from ssb_coefficient_maker_spark.operators.multimodal import (
            decode_media_header,
            decode_media_pixels,
        )

        # 27 bytes: passes the header layer's 26-byte dims guard but
        # not the pixel layer's bpp read at offset 28 — must raise the
        # documented ValueError, never struct.error
        payload = b"BM" + b"\x00" * 25
        decode_media_header(payload)  # header layer accepts
        with pytest.raises(ValueError, match="truncated BMP header"):
            decode_media_pixels(payload)

    @staticmethod
    def _wav(audio_fmt, channels, bits, rate, data):
        import struct

        return (
            struct.pack("<4sI4s", b"RIFF", 36 + len(data), b"WAVE")
            + struct.pack(
                "<4sIHHIIHH", b"fmt ", 16, audio_fmt, channels, rate,
                rate * channels * max(bits // 8, 1),
                channels * max(bits // 8, 1), bits,
            )
            + struct.pack("<4sI", b"data", len(data))
            + data
        )

    def test_non_16bit_pcm_wav_refused_not_misdecoded(self):
        from ssb_coefficient_maker_spark.operators.multimodal import (
            decode_media_header,
            decode_media_pixels,
        )

        # 8-bit PCM: the header layer reports duration fine, but the
        # sample layer reads little-endian int16 — it must refuse, not
        # silently return half the frames with garbage sums
        wav8 = self._wav(1, 1, 8, 8000, bytes(range(16)))
        assert decode_media_header(wav8)["fmt"] == "wav"
        with pytest.raises(ValueError, match="16-bit PCM"):
            decode_media_pixels(wav8)
        # non-PCM fmt code (3 = IEEE float) likewise refused
        wavf = self._wav(3, 1, 16, 8000, b"\x00" * 16)
        with pytest.raises(ValueError, match="16-bit PCM"):
            decode_media_pixels(wavf)

    def test_null_text_docs_form_no_clique(self, spark, sf_dir):
        import pandas as pd

        docs = load_table(spark, sf_dir, "documents").filter(
            F.col("doc_id") < 40
        ).select("doc_id", "text")
        nulls = spark.createDataFrame(
            pd.DataFrame({"doc_id": [90001, 90002, 90003]})
        ).select("doc_id", F.lit(None).cast("string").alias("text"))
        corpus = docs.unionByName(nulls)
        # default policy (weighted-Jaccard family): NULL-text docs
        # never enter the member map — its direct tier's tokenize
        # joins drop them, so a fabricated "contentless clique" would
        # emit max-score pairs the direct tier never produces
        _, members = dedup.canonicalize_exact_dups(corpus)
        m = members.toPandas()
        assert not m["doc_id"].isin([90001, 90002, 90003]).any()
        dedup.release_exact_dup_map()
        # clique policy (MinHash family): the direct tier pairs
        # NULL-text docs at jaccard 1.0 (empty shingle sets collide
        # in every band), so the collapse mirrors it — and the
        # collapsed ≡ direct contract holds INCLUDING the NULL pairs
        _, members_c = dedup.canonicalize_exact_dups(
            corpus, null_text="clique"
        )
        mc = members_c.toPandas().set_index("doc_id")["rep_id"]
        assert mc[90002] == 90001 and mc[90003] == 90001
        dedup.release_exact_dup_map()
        direct = dedup.minhash_lsh_pairs(
            corpus, threshold=0.4, family="md5"
        ).toPandas()
        assert {(90001, 90002), (90001, 90003), (90002, 90003)} <= set(
            zip(direct["doc_a"], direct["doc_b"])
        )
        dedup.release_shingle_cache()
        collapsed = dedup.minhash_neardup_collapsed(
            corpus, threshold=0.4, family="md5"
        ).toPandas()
        assert direct.equals(collapsed)
        dedup.release_shingle_cache()
        dedup.release_exact_dup_map()

    def test_null_text_weighted_jaccard_collapsed_matches_direct(
        self, spark, sf_dir
    ):
        import pandas as pd

        from ssb_coefficient_maker_spark.queries import (
            _weighted_jaccard_pairs,
        )

        docs = load_table(spark, sf_dir, "documents").filter(
            F.col("doc_id") < 40
        ).select("doc_id", "text")
        nulls = spark.createDataFrame(
            pd.DataFrame({"doc_id": [90001, 90002]})
        ).select("doc_id", F.lit(None).cast("string").alias("text"))
        corpus = docs.unionByName(nulls)
        direct = _weighted_jaccard_pairs(corpus).toPandas()
        # the q241 pipeline inline (canonicalize under the
        # case-SENSITIVE key with the default drop policy, verify the
        # reps, expand): NULL-text docs must produce NO pairs, exactly
        # like the direct tier whose tokenize joins drop them
        reps, members = dedup.canonicalize_exact_dups(
            corpus, casefold=False
        )
        collapsed = dedup.expand_pairs_through_cliques(
            _weighted_jaccard_pairs(reps), members,
            a_col="a", b_col="b", value_col="weighted_jaccard",
        ).toPandas()
        assert not collapsed["a"].isin([90001, 90002]).any()
        assert not collapsed["b"].isin([90001, 90002]).any()
        key = ["a", "b"]
        assert direct.sort_values(key).reset_index(drop=True).equals(
            collapsed.sort_values(key).reset_index(drop=True)
        )
        dedup.release_exact_dup_map()

    def test_canary_normalization_gated_on_same_sf(self, tmp_path):
        stamp = {
            "total_warm_sec": 10.0,
            "queries_warm": {"q01": 1.0},
            "canary": {"mean_sec": 1.0},
            "sf": 0.1,
        }
        other = dict(stamp, sf=1.0, total_warm_sec=20.0,
                     canary={"mean_sec": 2.0})
        import json as _json

        a, b = tmp_path / "a.json", tmp_path / "b.json"
        a.write_text(_json.dumps(stamp))
        b.write_text(_json.dumps(other))
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools/compare_bench.py"),
             str(a), str(b)],
            capture_output=True, text=True, timeout=60,
        )
        assert "same-SF only" in out.stdout
        assert "canary-normalized" not in out.stdout
        b.write_text(_json.dumps(dict(other, sf=0.1)))
        out2 = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools/compare_bench.py"),
             str(a), str(b)],
            capture_output=True, text=True, timeout=60,
        )
        assert "canary-normalized total ratio" in out2.stdout


class TestDedupPipeline:
    """q242: the end-to-end dedup pass (collapse -> near-dup ->
    components -> keep-one summary) checked against an independent
    in-process union-find over the pair set."""

    def test_summary_matches_union_find_over_pairs(self, spark, sf_dir):
        pairs = dedup.q31_minhash_neardup(spark, sf_dir).toPandas()
        dedup.release_shingle_cache()
        out = dedup.q242_dedup_pipeline(spark, sf_dir).toPandas()

        parent: dict = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        nodes = set()
        for a, b in zip(pairs["doc_a"], pairs["doc_b"]):
            ra, rb = find(int(a)), find(int(b))
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
            nodes.update((int(a), int(b)))
        clusters: dict = {}
        for n in nodes:
            clusters.setdefault(find(n), []).append(n)
        expected = sorted(
            (rep, len(ms) + 1, max(ms + [rep]))
            for rep, ms in (
                (min(ms), [m for m in ms if m != min(ms)])
                for ms in clusters.values()
            )
            if len(ms) >= 1
        )
        got = sorted(
            zip(out["cluster_rep"], out["cluster_size"], out["largest_member"])
        )
        assert [tuple(map(int, t)) for t in got] == expected
        # no singleton rows; reps are genuine minima
        assert (out["cluster_size"] >= 2).all()
        assert (out["cluster_rep"] < out["largest_member"]).all()

    def test_cached_second_call_is_identical(self, spark, sf_dir):
        first = dedup.q242_dedup_pipeline(spark, sf_dir).toPandas()
        second = dedup.q242_dedup_pipeline(spark, sf_dir).toPandas()
        assert first.equals(second)


class TestIncrementalDedupPipeline:
    """q243: the O(batch) incremental maintenance of the dedup
    artifact must equal q242's full-corpus batch recompute exactly —
    star edges of yesterday's label map + pinned-index probe pairs +
    within-batch pairs have the same transitive closure as the full
    pair set."""

    def test_incremental_equals_batch_recompute(self, spark, sf_dir):
        batch = dedup.q242_dedup_pipeline(spark, sf_dir).toPandas()
        incr = dedup.q243_incremental_dedup_pipeline(
            spark, sf_dir
        ).toPandas()
        assert len(batch) > 0
        assert batch.equals(incr)

    def test_cross_day_merges_present(self, spark, sf_dir):
        """The incremental path must actually exercise the probe: at
        least one cluster should span the corpus/batch split (else the
        equality above would hold trivially with an empty probe)."""
        incr = dedup.q243_incremental_dedup_pipeline(
            spark, sf_dir
        ).toPandas()
        m = dedup.Q243_BATCH_MOD
        spans = (
            (incr["cluster_rep"] % m != m - 1)
            & (incr["largest_member"] % m == m - 1)
        )
        assert spans.any()


class TestLshPairsFromIndex:
    def test_identical_to_direct_listing(self, spark, sf_dir):
        """lsh_pairs_from_index must reproduce minhash_lsh_pairs
        exactly — the index frames ARE the direct run's two
        intermediates, materialized."""
        docs = load_table(spark, sf_dir, "documents").filter(
            F.col("doc_id") < 300
        )
        direct = dedup.minhash_lsh_pairs(
            docs, threshold=0.4, family="md5"
        ).toPandas()
        dedup.release_shingle_cache()
        index = dedup.build_lsh_index(
            docs, family="md5", cache_name="t11_pairs_idx"
        )
        from_index = dedup.lsh_pairs_from_index(index, threshold=0.4).toPandas()
        assert direct.equals(from_index)
        from ssb_coefficient_maker_spark.cachereg import get_cache
        get_cache("t11_pairs_idx").release()


class TestSpreadCorpus:
    def test_spreads_single_partition_scan(self, spark, sf_dir):
        docs = load_table(spark, sf_dir, "documents")
        assert docs.rdd.getNumPartitions() < spark.sparkContext.defaultParallelism
        out = dedup._spread_corpus(docs)
        target = max(2, spark.sparkContext.defaultParallelism // 4)
        assert out.rdd.getNumPartitions() == target
        # row set unchanged
        assert out.count() == docs.count()

    def test_noop_on_already_parallel_input(self, spark, sf_dir):
        docs = load_table(spark, sf_dir, "documents")
        target = max(2, spark.sparkContext.defaultParallelism // 4)
        wide = docs.repartition(target + 1)  # past half the target: no-op
        assert dedup._spread_corpus(wide) is wide
