"""Registry-wide physical-plan audit: sweep every query's executed
plan for distributed anti-patterns and fail on anything not
explicitly whitelisted with a justification.

Patterns flagged:
- CartesianProduct          — an unbounded all-pairs join
- BroadcastNestedLoopJoin   — acceptable ONLY for 1-row broadcast
                              scalar joins (avgdl / corpus totals)
- BatchEvalPython           — row-at-a-time Python UDF in the plan
- global-window             — a WindowExec with an EMPTY partition
  spec whose input subtree is NOT provably reduced (no aggregate /
  limit on some path to a leaf). An unpartitioned window moves its
  whole input to ONE partition; that is only acceptable over
  aggregate-sized tables (decile/bucket rollups), never over raw
  scans — the q166 class of scale bug (round-5 VERDICT item 3).

Run:  python tools/plan_audit.py [sf_dir]
Exits non-zero and prints the offending queries if any UNEXPECTED
flag appears. tests/test_operators.py runs the same audit in CI.
"""

from __future__ import annotations

import sys

# name -> (pattern, justification). Every entry must name the 1-row
# (or otherwise bounded) operand that makes the pattern safe.
WHITELIST: dict[str, tuple[str, str]] = {
    "q100_temperature_mixing": ("bnlj", "1-row source-total broadcast"),
    "q111_constraint_audit": ("bnlj", "1-row expected-count broadcast"),
    "q124_bigram_pmi": ("bnlj", "1-row corpus-total broadcast"),
    "q130_bm25_topk": ("bnlj", "1-row avgdl broadcast"),
    "q142_benford_digits": ("bnlj", "1-row digit-total broadcast"),
    "q155_unigram_xent": ("bnlj", "1-row LM-total broadcast"),
    "q161_rrf_fusion": ("bnlj", "1-row avgdl broadcast (BM25 stage)"),
    "q173_qq_drift": ("bnlj", "1-row corpus-quartile broadcast"),
    "q177_top_gram_coverage": ("bnlj", "1-row gram-total broadcast"),
    "q50_embedding_neardup": ("bnlj", "block-pair driver table (n_blocks², bounded)"),
    "q238_neardup_auto": (
        "cartesian",
        "same bounded block-pair table as q50 (n_blocks² rows, guard-capped "
        "at max_block_pairs) — the clustered corpus's upstream broadcast "
        "shifts the planner's non-equi pick from BNLJ to CartesianProduct; "
        "at audit SF the dispatcher selects the blocked tier",
    ),
    "q66_tfidf_top_terms": ("bnlj", "1-row doc-count broadcast"),
    "q72_batch_topk": ("bnlj", "query-set literal table broadcast"),
    "q95_histogram": ("bnlj", "1-row min/max bounds broadcast"),
    "q75_udtf_rle": ("py-row-udf", "deliberate UDTF extension-point showcase"),
    "q192_ewma_volume": (
        "bnlj",
        "triangular (irn <= trn) join of the calendar-sized day "
        "aggregate to itself — day-count², both sides reduced",
    ),
    "q198_bigram_xent": ("bnlj", "1-row vocabulary-size broadcast"),
    "q218_heavy_hitters_audit": ("bnlj", "1-row sketch+total broadcast"),
    "q223_anonymity_risk_audit": (
        "bnlj",
        "threshold literal table x bounded-domain QI cell aggregate "
        "(<=1,375 cells) + 1-row corpus-total broadcast",
    ),
    "q224_dp_noised_release": (
        "bnlj",
        "epsilon literal table x released-grain aggregate (5 segments)",
    ),
    "q225_bottomk_sample_audit": (
        "bnlj",
        "64-row bottom-k sample x 1-row estimator-stats broadcasts",
    ),
    "q228_ann_recall_audit": (
        "bnlj",
        "20-row query-panel and centroid-literal broadcasts (the "
        "exact brute-force twin is one corpus scan x 20 queries)",
    ),
    "q219_theta_set_algebra_audit": (
        "bnlj",
        "1-row×1-row sketch and exact-twin broadcasts",
    ),
    "q166_heaps_law": ("bnlj", "1-row decile-cuts broadcast (lazy percentile agg)"),
    "q211_quality_length_calibration": (
        "bnlj",
        "1-row quintile-cuts broadcast (lazy percentile agg)",
    ),
    "q199_jl_projection_audit": (
        "bnlj",
        "pair join (id_a < id_b) of the deterministic 1-in-97 vector "
        "sample — sample², both sides filtered tiny",
    ),
}

# name -> justification. Queries allowed an unpartitioned WindowExec
# over an input the reducedness heuristic can't prove bounded. Every
# entry must name the bounded operand (cardinality argument), exactly
# like the BNLJ whitelist.
GLOBAL_WINDOW_WHITELIST: dict[str, str] = {
    "q161_rrf_fusion": (
        "fusion ranks run over the candidate union: an INNER join on "
        "unique doc_id whose BM25 side is a term-filtered aggregate, "
        "so the window input is bounded by that aggregate-sized "
        "operand (the all-paths heuristic can't see join-key "
        "uniqueness); at 100 TB the inputs are per-ranker top-k lists"
    ),
}

PATTERNS = {
    "cartesian": "CartesianProduct",
    "bnlj": "BroadcastNestedLoopJoin",
    "py-row-udf": "BatchEvalPython",
}

# Nodes that reduce (or hard-bound) the cardinality flowing up a plan
# branch. An aggregate's output is group-cardinality-sized — the
# audit's proxy for "aggregate-sized table"; limits are exact bounds.
_REDUCING = (
    "HashAggregate",
    "SortAggregate",
    "ObjectHashAggregate",
    "GlobalLimit",
    "LocalLimit",
    "CollectLimit",
    "TakeOrderedAndProject",
    "WindowGroupLimit",
)


def _children(node):
    """All sub-plans of a JVM SparkPlan node: regular children, the
    AQE wrapper's input plan, and subquery plans."""
    out = []
    if node.nodeName() == "AdaptiveSparkPlan":
        try:
            out.append(node.inputPlan())
        except Exception:
            try:
                out.append(node.initialPlan())
            except Exception:
                pass
    ch = node.children()
    for i in range(ch.length()):
        out.append(ch.apply(i))
    try:
        sq = node.subqueries()
        for i in range(sq.length()):
            out.append(sq.apply(i))
    except Exception:
        pass
    return out


def _walk(node):
    yield node
    for c in _children(node):
        yield from _walk(c)


def _is_reduced(node) -> bool:
    """True iff EVERY path from this node down to a leaf passes
    through a reducing node — i.e. the subtree's output cardinality is
    aggregate/limit-bounded, so a single-partition window over it is
    safe."""
    if node.nodeName() in _REDUCING:
        return True
    kids = _children(node)
    if not kids:
        return False  # raw leaf (scan / in-memory relation)
    return all(_is_reduced(c) for c in kids)


def _unbounded_global_windows(plan) -> int:
    """Count WindowExec nodes with an empty partition spec whose input
    is not provably reduced."""
    n = 0
    for node in _walk(plan):
        if node.nodeName() != "Window":
            continue
        try:
            unpartitioned = node.partitionSpec().isEmpty()
        except Exception:
            continue
        if unpartitioned and not all(_is_reduced(c) for c in _children(node)):
            n += 1
    return n


def audit(spark, sf_dir: str) -> dict[str, list[str]]:
    """Return {query_name: [unexpected flags]} — empty dict = clean."""
    from ssb_coefficient_maker_spark import queries as Q

    unexpected: dict[str, list[str]] = {}
    for name, spec in Q.REGISTRY.items():
        plan = spec.fn(spark, sf_dir)._jdf.queryExecution().executedPlan()
        plan_str = plan.toString()
        flags = [key for key, marker in PATTERNS.items() if marker in plan_str]
        if (
            _unbounded_global_windows(plan) > 0
            and name not in GLOBAL_WINDOW_WHITELIST
        ):
            flags.append("global-window")
        allowed = WHITELIST.get(name, (None, None))[0]
        bad = [f for f in flags if f != allowed]
        if bad:
            unexpected[name] = bad
    return unexpected


def main() -> int:
    import os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from ssb_coefficient_maker_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="plan-audit")
    bad = audit(spark, sf_dir)
    if bad:
        print(f"PLAN AUDIT FAILED — {len(bad)} queries with unexpected patterns:")
        for name, flags in sorted(bad.items()):
            print(f"  {name}: {', '.join(flags)}")
        return 1
    from ssb_coefficient_maker_spark import queries as Q

    print(
        f"plan audit clean: {len(Q.REGISTRY)} queries, "
        f"{len(WHITELIST)} whitelisted exceptions (all justified 1-row/"
        f"bounded broadcasts or the UDTF showcase), "
        f"{len(GLOBAL_WINDOW_WHITELIST)} justified unpartitioned windows"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
