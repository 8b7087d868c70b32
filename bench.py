"""Benchmark harness: runs the declared query surface at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"q01...": sec, ...}, "sf": ...}

Each query is executed to completion with a noop sink (full plan
runs, nothing collected to the driver — the honest distributed
cost). Timings are wall-clock on a warm session; the first query
additionally pays JVM/codegen warmup, so a throwaway warmup query
runs first.

Round 12: a compact totals-only JSON line (marked
``"summary_line": true``, no per-query dicts) is printed BEFORE the
full line, so a truncated stdout capture still yields the totals
(r11 VERDICT #4 — the r08-r10 driver captures cut the full payload
mid-JSON). The full contract line stays LAST and unchanged.
"""

from __future__ import annotations

import json
import os
import sys
import time


def run_query(df) -> None:
    df.write.mode("overwrite").format("noop").save()


# the drift canary: three pure-JVM queries (scan+agg, sort-limit,
# date functions — no Python workers, no pinned caches) whose code is
# stable across rounds; see the canary block construction in main()
CANARY_QUERIES = ("q01_pricing_summary", "q03_top_revenue_orders",
                  "q17_date_functions")


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from ssb_coefficient_maker_spark.queries import REGISTRY
    from ssb_coefficient_maker_spark.session import get_spark
    from ssb_coefficient_maker_spark.sources.loaders import load_table

    # optional subset (round-10): SPARK_GRAFT_BENCH_ONLY="q115_...,q50_..."
    # limits the run to the named queries — the knob behind targeted
    # quiet-window re-measures (sf1 regression bisects) and the sf10
    # heavy-family ladder, where a full-registry pass would bury the
    # signal under 40 minutes of unrelated work. The emitted JSON keeps
    # the same shape; n_queries tells a reader it was a subset run.
    # Resolved BEFORE the Spark session starts: a subset that matches
    # nothing must fail fast, not emit a success-shaped zero (r10 ADVICE).
    only_env = os.environ.get("SPARK_GRAFT_BENCH_ONLY", "").strip()
    only = {q.strip() for q in only_env.split(",") if q.strip()}
    if only:
        unknown = only - set(REGISTRY)
        if unknown:
            print(f"BENCH WARN unknown queries in BENCH_ONLY: {sorted(unknown)}",
                  file=sys.stderr)
        if not (only & set(REGISTRY)):
            # every requested name is unknown: a warn-and-continue here
            # would emit a success-shaped JSON with value 0 that could
            # be stamped as a real measurement (round-10 ADVICE)
            raise SystemExit(
                f"BENCH ERROR: SPARK_GRAFT_BENCH_ONLY matched no registry "
                f"queries (requested: {sorted(only)})"
            )

    spark = get_spark(app_name="bench")

    # warmup: JVM + parquet footer caches + codegen paths. Partial
    # scale dirs (the sf10 heavy ladder ships only documents/
    # embeddings/part) may lack lineitem — fall back rather than die
    # before the first query.
    try:
        run_query(
            load_table(spark, sf_dir, "lineitem").groupBy("l_returnflag").count()
        )
    except Exception:
        run_query(load_table(spark, sf_dir, "documents").groupBy().count())

    items = [(n, s) for n, s in REGISTRY.items() if not only or n in only]

    # window-drift canary (round-11, VERDICT r10 next-round #5): three
    # fixed pure-JVM queries timed immediately BEFORE and AFTER the
    # measured run. Their cost is code that never changes round to
    # round, so before/after (and stamp-vs-stamp) canary ratios
    # separate box/window drift from real regressions — the round-8/10
    # "same code moved +0.3 s" arguments become arithmetic instead of
    # medians. Warm-measured (one throwaway + one timed pass each).
    def run_canary() -> dict[str, float]:
        out: dict[str, float] = {}
        for cq in CANARY_QUERIES:
            spec = REGISTRY.get(cq)
            if spec is None:
                continue
            try:
                run_query(spec.fn(spark, sf_dir))
                t0 = time.time()
                run_query(spec.fn(spark, sf_dir))
                out[cq] = round(time.time() - t0, 3)
            except Exception as exc:
                print(f"BENCH WARN canary {cq}: {exc}", file=sys.stderr)
        return out

    canary_before = run_canary()

    timings: dict[str, float] = {}
    warm: dict[str, float] = {}
    for name, spec in items:
        t0 = time.time()
        try:
            run_query(spec.fn(spark, sf_dir))
            timings[name] = round(time.time() - t0, 3)
        except Exception as exc:  # a failed query must not hide the rest
            timings[name] = -1.0
            print(f"BENCH ERROR {name}: {type(exc).__name__}: {exc}", file=sys.stderr)
            continue
        # second run = steady-state (whole-stage-codegen JIT'd, parquet
        # footers cached) — the per-query cost that scales with data
        t1 = time.time()
        run_query(spec.fn(spark, sf_dir))
        warm[name] = round(time.time() - t1, 3)

    canary_after = run_canary()

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    total_warm = round(sum(warm.values()), 3)
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    cb, ca = sum(canary_before.values()), sum(canary_after.values())
    payload = {
        "metric": "total_wall_sec_all_queries",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_warm": warm,
        "total_warm_sec": total_warm,
        "sf": float(sf) if sf else sf_dir,
        "n_queries": len(timings),
        # normalize stamp-vs-stamp comparisons by the canary sums:
        # (other_stamp.canary mean / this.canary mean) estimates the
        # window's speed ratio on code that never changed
        "canary": {
            "queries": list(canary_before),
            "before": canary_before,
            "after": canary_after,
            "before_sec": round(cb, 3),
            "after_sec": round(ca, 3),
            "mean_sec": round((cb + ca) / 2, 3),
        },
    }
    # Defensive totals-only line FIRST (r11 VERDICT #4 / next-round
    # #6): the r08-r10 driver captures truncated the full one-line
    # payload mid-JSON (parsed: null); a compact line without the
    # 243-entry dicts survives truncation so the totals always parse.
    # Additions-only — the full contract line below stays LAST and
    # unchanged, and timing happened entirely above this point.
    print(json.dumps({
        "metric": "total_wall_sec_all_queries",
        "value": total,
        "unit": "sec",
        "total_warm_sec": total_warm,
        "sf": payload["sf"],
        "n_queries": len(timings),
        "n_failed": sum(1 for t in timings.values() if t < 0),
        "canary_mean_sec": payload["canary"]["mean_sec"],
        "summary_line": True,
    }))
    print(json.dumps(payload))
    # The driver keeps only a stdout tail, which truncates 96 queries —
    # persist the full cold+warm table so every run's per-query numbers
    # stay reviewable (round-2 VERDICT item 3). Since round 8 the
    # default path is a SCRATCH file (untracked — .gitignore): the
    # committed evidence is the ROUND-STAMPED copy written when
    # SPARK_GRAFT_BENCH_ROUND is set (e.g. =r8 -> bench_sf0.1_r8.json),
    # which BASELINE.md cites. This ends the recurring
    # quoted-vs-committed drift where every later run overwrote the one
    # file the docs pointed at (VERDICT r7 item 6).
    here = os.path.dirname(os.path.abspath(__file__))
    out_paths = [
        os.environ.get(
            "SPARK_GRAFT_BENCH_OUT",
            os.path.join(here, f"bench_results_sf{sf or 'x'}.json"),
        )
    ]
    stamp = os.environ.get("SPARK_GRAFT_BENCH_ROUND")
    if stamp:
        out_paths.append(os.path.join(here, f"bench_sf{sf or 'x'}_{stamp}.json"))
    for out_path in out_paths:
        try:
            with open(out_path, "w") as f:
                json.dump(payload, f, indent=1, sort_keys=True)
                f.write("\n")
        except OSError as exc:
            print(f"BENCH WARN could not write {out_path}: {exc}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
