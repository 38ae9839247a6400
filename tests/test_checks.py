"""Declarative constraint verification (`operators/checks.py`): each
constraint kind crossing pass and fail independently, exact violation
counts, declaration-order report, and loud refusals."""

from __future__ import annotations

import pytest

from social_media_data_pipeline_spark.operators import checks as ck


@pytest.fixture()
def df(spark):
    rows = [
        (1, "a", 10.0, "ok-1"),
        (2, "b", 20.0, "ok-2"),
        (2, "c", -5.0, "bad3"),   # dup key, below range, bad shape
        (None, "a", 500.0, None),  # null key, above range, null text
    ]
    return spark.createDataFrame(rows, "k bigint, cat string, v double, s string")


def _report(spark, df, constraints):
    rows = ck.constraint_report(df, constraints).orderBy("ord").collect()
    return [
        (r["constraint"], r["column"], r["violations"], r["total"], r["passed"])
        for r in rows
    ]


class TestConstraintKinds:
    def test_single_pass_suite_exact_counts(self, spark, df):
        got = _report(
            spark,
            df,
            [
                ck.not_null("k"),
                ck.unique("k"),
                ck.in_range("v", lo=0.0, hi=100.0),
                ck.accepted_values("cat", ["a", "b"]),
                ck.matches("s", r"^ok-[0-9]$"),
                ck.row_count(min_rows=3),
            ],
        )
        assert got == [
            ("not_null", "k", 1, 4, False),
            ("unique", "k", 1, 3, False),      # 3 non-null, 2 distinct
            ("in_range[0.0,100.0]", "v", 2, 4, False),
            ("accepted_values[a,b]", "cat", 1, 4, False),
            ("matches[^ok-[0-9]$]", "s", 1, 3, False),  # null s skipped
            ("row_count[3,None]", "*", 0, 4, True),
        ]

    def test_row_count_shortfall_and_excess(self, spark, df):
        got = _report(spark, df, [ck.row_count(min_rows=10)])
        assert got == [("row_count[10,None]", "*", 6, 4, False)]
        got = _report(spark, df, [ck.row_count(min_rows=1, max_rows=2)])
        assert got == [("row_count[1,2]", "*", 2, 4, False)]

    def test_allowed_budget(self, spark, df):
        got = _report(spark, df, [ck.not_null("k", allowed=1)])
        assert got == [("not_null", "k", 1, 4, True)]  # inside budget

    def test_referential_orphans(self, spark, df):
        ref = spark.createDataFrame([(1,)], "rk bigint")
        got = _report(spark, df, [ck.referential("k", ref, "rk")])
        # non-null keys 1,2,2 → the two k=2 rows are orphans
        assert got == [("referential[rk]", "k", 2, 3, False)]
        ref_ok = spark.createDataFrame([(1,), (2,)], "rk bigint")
        got = _report(spark, df, [ck.referential("k", ref_ok, "rk")])
        assert got == [("referential[rk]", "k", 0, 3, True)]

    def test_mixed_suite_preserves_declaration_order(self, spark, df):
        ref = spark.createDataFrame([(1,), (2,)], "rk bigint")
        got = _report(
            spark,
            df,
            [ck.not_null("k"), ck.referential("k", ref, "rk"), ck.unique("k")],
        )
        assert [g[0] for g in got] == ["not_null", "referential[rk]", "unique"]


class TestEdgeHardening:
    """r10-ADVICE regressions: empty tables, hostile labels, and the
    fact-to-fact referential path."""

    def test_empty_table_reports_zero_violations(self, spark, df):
        empty = df.limit(0)
        got = _report(
            spark,
            empty,
            [
                ck.not_null("k"),
                ck.unique("k"),
                ck.in_range("v", lo=0.0, hi=100.0),
                ck.accepted_values("cat", ["a"]),
                ck.matches("s", r"^ok$"),
            ],
        )
        # every constraint: 0 violations (never NULL), passed is a real
        # boolean True — a gate consumer must see a bool, not NULL
        for name, _col, violations, _total, passed in got:
            assert violations == 0, name
            assert passed is True, name

    def test_quote_and_backslash_labels_survive(self, spark, df):
        # a quote in an accepted value / a backslash in a regex must
        # neither break the query nor corrupt the report label
        pat = r"^ok-\d'\"$"
        got = _report(
            spark,
            df,
            [
                ck.accepted_values("cat", ["a'; drop--", "b"]),
                ck.matches("s", pat),
            ],
        )
        assert got[0][0] == "accepted_values[a'; drop--,b]"
        assert got[0][2] == 3  # only cat='b' row passes
        assert got[1][0] == f"matches[{pat}]"  # byte-faithful label
        assert got[1][2] == 3  # no value matches the quoted pattern

    def test_referential_no_broadcast_degrades_to_shuffle(self, spark, df):
        ref = spark.createDataFrame([(1,), (2,)], "rk bigint")
        got = _report(
            spark, df, [ck.referential("k", ref, "rk", broadcast=False)]
        )
        assert got == [("referential[rk]", "k", 0, 3, True)]
        # and the plan genuinely drops the broadcast hint
        rep = ck.constraint_report(
            df, [ck.referential("k", ref, "rk", broadcast=False)]
        )
        plan = rep._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan


class TestRefusals:
    def test_empty_suite_refused(self, spark, df):
        with pytest.raises(ValueError, match="empty constraint list"):
            ck.constraint_report(df, [])

    def test_unbounded_range_refused(self, spark):
        with pytest.raises(ValueError, match="at least one bound"):
            ck.in_range("v")

    def test_empty_accepted_values_refused(self, spark):
        with pytest.raises(ValueError, match="non-empty value set"):
            ck.accepted_values("cat", [])
