"""Property-based tests (hypothesis) for the round-5 algorithmic
operators: the Spark implementation must agree with a brute-force
pandas/python recompute on randomized small inputs — the same
differential strategy test_property_formula.py applies to the
formula engine (SURVEY.md §5)."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_PROP = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@_PROP
@given(
    pts=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=50),   # price (small grid → ties)
            st.integers(min_value=0, max_value=20),   # size
        ),
        min_size=1,
        max_size=40,
    )
)
def test_skyline_matches_bruteforce_dominance(spark, tmp_path_factory, pts):
    """q160's bucketed partition-merge frontier == the O(n²) dominance
    definition, including duplicate points and price ties."""
    from ssb_coefficient_maker_spark.queries import q160_skyline

    tmp = tmp_path_factory.mktemp("sky")
    part = pd.DataFrame(
        {
            "p_partkey": range(len(pts)),
            "p_name": ["x"] * len(pts),
            "p_brand": ["B"] * len(pts),
            "p_type": ["t"] * len(pts),
            "p_size": [s for _, s in pts],
            "p_retailprice": [float(p) for p, _ in pts],
        }
    )
    spark.createDataFrame(part).write.mode("overwrite").parquet(
        str(tmp / "part.parquet")
    )
    got = set(
        map(
            tuple,
            q160_skyline(spark, str(tmp))
            .toPandas()[["p_retailprice", "p_size"]]
            .itertuples(index=False),
        )
    )
    uniq = {(float(p), s) for p, s in pts}
    want = {
        (p, s)
        for (p, s) in uniq
        if not any(
            (q < p and t >= s) or (q <= p and t > s) for (q, t) in uniq
        )
    }
    assert got == want


@_PROP
@given(
    base=st.text(alphabet="abc", min_size=2, max_size=8),
    edit=st.sampled_from(["sub", "ins", "del", "none", "far"]),
    pos=st.integers(min_value=0, max_value=7),
)
def test_symspell_finds_every_ed1_variant(
    spark, tmp_path_factory, base, edit, pos
):
    """Any string within one edit of the base must collide in the
    deletion-neighborhood join; ED-2+ strings must not be reported."""
    from ssb_coefficient_maker_spark.queries import q183_symspell_join

    p = pos % len(base)
    if edit == "sub":
        other = base[:p] + ("z" if base[p] != "z" else "y") + base[p + 1 :]
    elif edit == "ins":
        other = base[:p] + "z" + base[p:]
    elif edit == "del":
        other = base[:p] + base[p + 1 :]
    elif edit == "none":
        other = base
    else:  # far: guaranteed ED >= 2 (append two distinct chars)
        other = base + "zz"
    tmp = tmp_path_factory.mktemp("sym")
    sup = pd.DataFrame(
        {
            "s_suppkey": [1, 2],
            "s_name": [base, other],
            "s_nationkey": [0, 0],
            "s_acctbal": [0.0, 0.0],
        }
    )
    spark.createDataFrame(sup).write.mode("overwrite").parquet(
        str(tmp / "supplier.parquet")
    )
    out = q183_symspell_join(spark, str(tmp)).toPandas()
    expect_pair = _ed(base, other) <= 1
    if expect_pair:
        assert set(out["s_suppkey"]) == {1, 2}
        assert (out["n_neighbors"] == 1).all()
    else:
        assert len(out) == 0


def _ed(a: str, b: str) -> int:
    # classic DP, small strings only
    m, n = len(a), len(b)
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        cur = [i] + [0] * n
        for j in range(1, n + 1):
            cur[j] = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (a[i - 1] != b[j - 1]),
            )
        prev = cur
    return prev[n]


@_PROP
@given(
    spans=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=100),
            st.integers(min_value=0, max_value=100),
        ),
        min_size=1,
        max_size=25,
    )
)
def test_concurrency_sweep_matches_bruteforce(spark, tmp_path_factory, spans):
    """q168's +1/−1 sweep peak == max over boundary instants of the
    covering-interval count, on randomized single-user-per-row days."""
    import datetime

    from ssb_coefficient_maker_spark.queries import q168_max_concurrency

    base = datetime.datetime(2024, 3, 1)
    rows = []
    eid = 0
    for uid, (a, b) in enumerate(spans):
        lo, hi = (a, b) if a <= b else (b, a)
        for off in (lo, hi):
            rows.append(
                (
                    eid,
                    base + datetime.timedelta(minutes=off),
                    uid,
                    "view",
                    1.0,
                    "{}",
                )
            )
            eid += 1
    ev = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    tmp = tmp_path_factory.mktemp("conc")
    spark.createDataFrame(ev).write.mode("overwrite").parquet(
        str(tmp / "events.parquet")
    )
    out = q168_max_concurrency(spark, str(tmp)).toPandas()
    assert len(out) == 1
    norm = [(min(a, b), max(a, b)) for a, b in spans]
    brute = max(
        sum(1 for (lo, hi) in norm if lo <= t <= hi)
        for t in {x for ab in norm for x in ab}
    )
    assert out.iloc[0]["peak_concurrency"] == brute
