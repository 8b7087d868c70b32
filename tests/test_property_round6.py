"""Property tests for the round-6 algorithmic operators: each Spark
construction is driven against an independent brute-force Python
reference on randomized inputs (the round-5 test strategy, SURVEY §5).
One shared Spark job per property batches all hypothesis examples —
hypothesis drives data generation, Spark evaluates once."""

from __future__ import annotations

import hashlib
import itertools
import math
import random

import pandas as pd
from pyspark.sql import functions as F


def _py_cdc_bounds(text: str, window: int = 16, mask: str = "07") -> list[int]:
    cuts = [
        p
        for p in range(window, len(text) + 1)
        if hashlib.md5(text[p - window : p].encode()).hexdigest()[:2] <= mask
    ]
    return sorted(set([0, *cuts, len(text)]))


def test_cdc_bounds_match_python_reference(spark):
    """cdc_bounds_expr == the pure-Python rolling-window reference on
    randomized strings (incl. empty, shorter-than-window, and
    repetitive inputs)."""
    from ssb_coefficient_maker_spark.operators.dedup import cdc_bounds_expr

    rng = random.Random(7)
    texts = ["", "short", "x" * 15, "x" * 16, "ab" * 40]
    texts += [
        "".join(rng.choice("abcdef gh") for _ in range(rng.randint(1, 400)))
        for _ in range(40)
    ]
    df = spark.createDataFrame(
        pd.DataFrame({"i": range(len(texts)), "text": texts})
    )
    got = {
        r["i"]: list(r["b"])
        for r in df.withColumn("b", cdc_bounds_expr("text"))
        .select("i", "b")
        .collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == _py_cdc_bounds(t), (i, t[:40])


def test_rle_runs_match_itertools_groupby(spark):
    """rle_runs_expr == itertools.groupby on randomized sequences."""
    from ssb_coefficient_maker_spark.queries import rle_runs_expr

    rng = random.Random(11)
    seqs = [[], ["a"], ["a", "a", "a"], ["a", "b", "a", "b"]]
    seqs += [
        [rng.choice("abc") for _ in range(rng.randint(1, 60))]
        for _ in range(40)
    ]
    df = spark.createDataFrame(
        pd.DataFrame({"i": range(len(seqs)), "types": seqs})
    )
    got = {
        r["i"]: [(x["t"], x["len"]) for x in r["runs"]]
        for r in df.withColumn("runs", rle_runs_expr("types"))
        .select("i", "runs")
        .collect()
    }
    for i, seq in enumerate(seqs):
        expected = [
            (k, len(list(g))) for k, g in itertools.groupby(seq)
        ]
        assert got[i] == expected, (i, seq)


def test_q133_closed_form_bin_equals_ntile(spark):
    """q133's closed-form ntile bin from (rank, N) == Spark's own
    NTILE over the same order, for awkward N (not divisible by 10,
    N < 10, heavy ties)."""
    from pyspark.sql import Window

    rng = random.Random(13)
    for n in (1, 7, 10, 23, 100, 137):
        vals = [rng.choice([1.0, 2.0, 5.0, 9.0]) for _ in range(n)]
        df = spark.createDataFrame(
            pd.DataFrame({"k": range(n), "v": vals})
        )
        w = Window.orderBy("v", "k")
        direct = {
            r["k"]: r["b"]
            for r in df.withColumn("b", F.ntile(10).over(w)).collect()
        }
        q, rem = n // 10, n % 10
        big_span = rem * (q + 1)
        ranked = df.withColumn("r", F.row_number().over(w))
        closed = {
            r["k"]: r["b"]
            for r in ranked.withColumn(
                "b",
                F.when(
                    F.col("r") <= big_span,
                    F.ceil(F.col("r") / (q + 1)),
                )
                .otherwise(rem + F.ceil((F.col("r") - big_span) / max(q, 1)))
                .cast("int"),
            ).collect()
        }
        assert closed == direct, n


def test_sessionization_matches_pandas_brute_force(spark):
    """q190's lag+cumsum construction == a per-user Python loop on
    randomized event times."""
    rng = random.Random(17)
    rows = []
    eid = 0
    for user in range(8):
        t = 0
        for _ in range(rng.randint(1, 50)):
            t += rng.choice([30, 300, 1700, 1900, 7200])
            rows.append((user, t, eid))
            eid += 1
    pdf = pd.DataFrame(rows, columns=["user_id", "t_s", "event_id"])

    # brute force: break when gap > 1800
    sessions = {}
    for user, grp in pdf.groupby("user_id"):
        grp = grp.sort_values(["t_s", "event_id"])
        sid, prev = 0, None
        for t in grp["t_s"]:
            if prev is None or t - prev > 1800:
                sid += 1
            sessions.setdefault(user, []).append(sid)
            prev = t
    pdf["sess_bf"] = [s for u in sorted(sessions) for s in sessions[u]]
    expected = (
        pdf.groupby("user_id")["sess_bf"].max().astype(int).to_dict()
    )

    from pyspark.sql import Window

    df = spark.createDataFrame(pdf[["user_id", "t_s", "event_id"]])
    wu = Window.partitionBy("user_id").orderBy("t_s", "event_id")
    sess = (
        df.withColumn("gap", F.col("t_s") - F.lag("t_s").over(wu))
        .withColumn(
            "is_new",
            F.when(F.col("gap").isNull() | (F.col("gap") > 1800), 1).otherwise(0),
        )
        .withColumn(
            "sid",
            F.sum("is_new").over(wu.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    got = {
        r["user_id"]: r["n"]
        for r in sess.groupBy("user_id")
        .agg(F.max("sid").alias("n"))
        .collect()
    }
    assert got == expected


def test_minhash_signature_matches_hashlib(spark):
    """q207's md5 MinHash signature == hashlib on a tiny vocabulary
    (the engine-portability claim, verified against Python's md5)."""
    words = ["alpha", "beta", "gamma", "delta", "epsilon"]
    df = spark.createDataFrame(pd.DataFrame({"w": words}))
    sig = (
        df.select(F.explode(F.sequence(F.lit(0), F.lit(7))).alias("i"), "w")
        .groupBy("i")
        .agg(
            F.min(
                F.md5(F.concat_ws("_", F.col("i").cast("string"), "w"))
            ).alias("mh")
        )
        .collect()
    )
    got = {r["i"]: r["mh"] for r in sig}
    for i in range(8):
        expected = min(
            hashlib.md5(f"{i}_{w}".encode()).hexdigest() for w in words
        )
        assert got[i] == expected, i


def test_ewma_matches_python_loop(spark, sf_dir):
    """q192's triangular-join EWMA == the sequential Python recurrence
    on the real day aggregate (alpha * sum (1-alpha)^(t-i) x_i is the
    unnormalized infinite-history form; both sides compute it with
    explicit pow so float order matches to 1e-9 before rounding)."""
    from ssb_coefficient_maker_spark.queries import q192_ewma_volume
    from ssb_coefficient_maker_spark.sources.loaders import load_table

    got = {
        r["day"]: r["ewma"]
        for r in q192_ewma_volume(spark, sf_dir).collect()
    }
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("day")
        .collect()
    )
    xs = [(str(r["day"]), r["n"]) for r in daily]
    for t, (day, _) in enumerate(xs):
        expected = 0.3 * sum(
            x * math.pow(0.7, t - i) for i, (_, x) in enumerate(xs[: t + 1])
        )
        assert abs(got[day] - round(expected, 4)) < 1e-9, day


def test_wau_sliding_distinct_matches_pandas(spark, sf_dir):
    """q191's explode-based trailing-7d distinct == a pandas rolling
    set union on the real events table."""
    from ssb_coefficient_maker_spark.queries import q191_dau_wau_stickiness
    from ssb_coefficient_maker_spark.sources.loaders import load_table

    got = {
        r["day"]: (r["dau"], r["wau"])
        for r in q191_dau_wau_stickiness(spark, sf_dir).collect()
    }
    ud = (
        load_table(spark, sf_dir, "events")
        .select("user_id", F.to_date("ts").alias("day"))
        .distinct()
        .toPandas()
    )
    by_day = ud.groupby("day")["user_id"].apply(set).to_dict()
    days = sorted(by_day)
    for d in days:
        window = set()
        for d2 in days:
            if 0 <= (d - d2).days <= 6:
                window |= by_day[d2]
        assert got[str(d)] == (len(by_day[d]), len(window)), d


def test_priority_transitions_match_pandas(spark, sf_dir):
    """q205's lag-window transition counts == a per-customer pandas
    loop over the real orders table."""
    import collections

    from ssb_coefficient_maker_spark.queries import q205_priority_transitions
    from ssb_coefficient_maker_spark.sources.loaders import load_table

    got = {
        (r["p_from"], r["p_to"]): r["n"]
        for r in q205_priority_transitions(spark, sf_dir).collect()
    }
    od = (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderdate", "o_orderkey", "o_orderpriority")
        .toPandas()
    )
    counts: dict = collections.Counter()
    for _, grp in od.groupby("o_custkey"):
        seq = grp.sort_values(["o_orderdate", "o_orderkey"])[
            "o_orderpriority"
        ].tolist()
        for a, b in zip(seq, seq[1:]):
            counts[(a, b)] += 1
    assert got == dict(counts)


def test_weighted_jaccard_matches_python(spark, sf_dir):
    """q214's min/total-identity construction == a direct Python
    multiset Jaccard on the real template-family candidates."""
    import collections

    from ssb_coefficient_maker_spark.queries import (
        q214_weighted_jaccard_verify,
    )
    from ssb_coefficient_maker_spark.sources.loaders import load_table

    got = {
        (r["a"], r["b"]): r["weighted_jaccard"]
        for r in q214_weighted_jaccard_verify(spark, sf_dir).collect()
    }
    docs = load_table(spark, sf_dir, "documents").toPandas()
    docs["family"] = docs["text"].str.strip().str.split().str[:5].str.join(" ")
    fam_sizes = docs.groupby("family")["doc_id"].apply(list).to_dict()
    tf = {
        r.doc_id: collections.Counter(r.text.strip().split())
        for r in docs.itertuples()
    }
    expected = {}
    for members in fam_sizes.values():
        if len(members) < 2:
            continue
        members = sorted(members)
        for i, a in enumerate(members):
            for b in members[i + 1 :]:
                ca, cb = tf[a], tf[b]
                inter = sum((ca & cb).values())
                union = sum((ca | cb).values())
                expected[(a, b)] = round(inter / union, 6)
    top = sorted(expected.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert got == dict(top)

