"""Capture ``.explain("formatted")`` output for named registry
queries into ``plans/$SPARK_GRAFT_PLAN_ROUND/<query>_<tag>.txt``
(default round ``r12``) — the before/after plan
evidence the optimization round commits (guide §1.4/§7.2).

Usage:
    python tools/capture_plan.py <sf_dir> <tag> <query> [<query> ...]

``tag`` is typically ``before`` or ``after``.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir, tag = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]

    from ssb_coefficient_maker_spark.queries import REGISTRY
    from ssb_coefficient_maker_spark.session import get_spark

    spark = get_spark(app_name="capture_plan")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(
        here, "plans", os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r12")
    )
    os.makedirs(out_dir, exist_ok=True)

    for name in names:
        df = REGISTRY[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
