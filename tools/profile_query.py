"""Per-query job/stage profiler (guide §1 empirical loop, round 11).

Runs named registry queries with the Spark UI enabled, then reads the
UI REST API (localhost:4040) to attribute wall time to jobs and
stages: per-stage duration, task count, shuffle read/write bytes,
input bytes. This is how "q57 is 3 s warm" decomposes into "which
Exchange / which Python stage".

Usage:
    python tools/profile_query.py <sf_dir> <query> [<query> ...]

Prints, per query: one warmup pass (untimed), then a timed pass with
the job description set to the query name, followed by the job/stage
table for exactly those jobs.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _get(url: str):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def main() -> int:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    os.environ["SPARK_UI"] = "true"

    from ssb_coefficient_maker_spark.queries import REGISTRY
    from ssb_coefficient_maker_spark.session import get_spark

    spark = get_spark(app_name="profile")
    sc = spark.sparkContext
    base = sc.uiWebUrl  # e.g. http://host:4040
    app_id = sc.applicationId

    def run(df):
        df.write.format("noop").mode("overwrite").save()

    cold_only = os.environ.get("PROFILE_COLD") == "1"
    for name in names:
        spec = REGISTRY[name]
        if cold_only:
            # profile the FIRST (cold) run — where pinned-cache builds
            # and one-time jobs live; no warmup pass
            sc.setJobDescription(f"PROFILE:{name}")
            t0 = time.time()
            run(spec.fn(spark, sf_dir))
            wall = time.time() - t0
            sc.setJobDescription(None)
        else:
            # warmup (codegen + caches) — untimed, unlabeled
            run(spec.fn(spark, sf_dir))
            sc.setJobDescription(f"PROFILE:{name}")
            t0 = time.time()
            run(spec.fn(spark, sf_dir))
            wall = time.time() - t0
            sc.setJobDescription(None)

        jobs = _get(f"{base}/api/v1/applications/{app_id}/jobs")
        mine = [j for j in jobs if j.get("description") == f"PROFILE:{name}"]
        mine.sort(key=lambda j: j["jobId"])
        kind = "cold" if cold_only else "warm"
        print(f"\n=== {name}: {kind} wall {wall:.3f}s, {len(mine)} job(s) ===")
        for j in mine:
            sub = time.strptime(j["submissionTime"][:19], "%Y-%m-%dT%H:%M:%S")
            try:
                comp = time.strptime(j["completionTime"][:19], "%Y-%m-%dT%H:%M:%S")
                dur = time.mktime(comp) - time.mktime(sub)
            except Exception:
                dur = float("nan")
            print(f"job {j['jobId']:4d} ~{dur:4.0f}s  stages={j['stageIds']}")
            for sid in sorted(j["stageIds"]):
                try:
                    sts = _get(
                        f"{base}/api/v1/applications/{app_id}/stages/{sid}"
                    )
                except Exception:
                    continue
                for st in sts:
                    if st["status"] == "SKIPPED":
                        print(f"   stage {sid:4d} SKIPPED")
                        continue
                    ms = st.get("executorRunTime", 0)
                    print(
                        f"   stage {sid:4d} {st['status']:9s} "
                        f"tasks={st['numCompleteTasks']:4d} "
                        f"runTime={ms/1000:7.2f}s "
                        f"in={st.get('inputBytes',0)>>10}K "
                        f"sr={st.get('shuffleReadBytes',0)>>10}K "
                        f"sw={st.get('shuffleWriteBytes',0)>>10}K  "
                        f"{st.get('name','')[:60]}"
                    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
