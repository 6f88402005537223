"""Data-quality operators: single-pass profile and expectation report."""

from __future__ import annotations

from icenetetl_spark.operators.quality import expect, profile


def test_profile_long_form(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "c")], "k long, v string"
    )
    out = {r["col_name"]: r for r in profile(df, ["k", "v"]).collect()}
    assert out["k"]["n_rows"] == 3 and out["k"]["n_null"] == 0
    assert out["k"]["n_distinct"] == 2
    assert out["k"]["min_value"] == "1" and out["k"]["max_value"] == "2"
    assert out["v"]["n_null"] == 1 and out["v"]["n_distinct"] == 2


def test_expectations(spark):
    df = spark.createDataFrame(
        [(1, 10.0, "x"), (1, 200.0, None), (2, -5.0, "y")],
        "k long, val double, tag string",
    )
    rep = {
        r["check"]: r["n_violations"]
        for r in expect(
            df,
            not_null=["tag"],
            unique=[["k"]],
            ranges={"val": (0.0, 100.0)},
        ).collect()
    }
    assert rep == {"not_null:tag": 1, "unique:k": 1, "range:val": 2}


def test_expectations_clean_input(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k long, tag string")
    rep = {
        r["check"]: r["n_violations"]
        for r in expect(df, not_null=["tag"], unique=[["k"]]).collect()
    }
    assert rep == {"not_null:tag": 0, "unique:k": 0}


def test_expect_no_checks_returns_stable_empty_schema(spark):
    df = spark.createDataFrame([(1,)], "k long")
    rep = expect(df)
    assert rep.count() == 0
    assert [(f.name, f.dataType.simpleString()) for f in rep.schema.fields] == [
        ("check", "string"),
        ("n_violations", "bigint"),
    ]
