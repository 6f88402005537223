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


def test_drift_psi_flags_shift_and_clears_identical(spark):
    from pyspark.sql import functions as F

    from icenetetl_spark.operators.quality import drift_psi

    rows = []
    # group "stable": same uniform spread in both periods
    for i in range(400):
        rows.append(("stable", float(i % 100), i % 2 == 0))
    # group "shifted": baseline near 0, current near the top of the range
    for i in range(200):
        rows.append(("shifted", 5.0 + (i % 10), False))
        rows.append(("shifted", 450.0 + (i % 10), True))
    df = spark.createDataFrame(rows, "g string, v double, is_b boolean")
    out = {
        r["g"]: r
        for r in drift_psi(
            df, "g", "v", period=F.col("is_b"), lo=0.0, hi=500.0
        ).collect()
    }
    assert out["stable"]["psi"] < 0.05 and not out["stable"]["drifted"]
    assert out["shifted"]["psi"] > 1.0 and out["shifted"]["drifted"]
    assert out["shifted"]["n_a"] == 200 and out["shifted"]["n_b"] == 200


def test_drift_psi_deterministic_and_symmetricish(spark):
    from pyspark.sql import functions as F

    from icenetetl_spark.operators.quality import drift_psi

    rows = [("g", float((i * 37) % 500), i % 3 == 0) for i in range(300)]
    df = spark.createDataFrame(rows, "g string, v double, is_b boolean")
    a = drift_psi(df, "g", "v", period=F.col("is_b")).collect()
    b = drift_psi(
        df.repartition(11), "g", "v", period=F.col("is_b")
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # PSI is non-negative up to quantization of each term
    assert all(r["psi"] >= -1e-8 for r in a)
