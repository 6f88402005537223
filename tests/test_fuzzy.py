"""SymSpell deletion-blocked fuzzy matching vs brute-force Levenshtein."""

from __future__ import annotations

from icenetetl_spark.operators.fuzzy import deletion_variants, fuzzy_name_pairs
from icenetetl_spark.sources.testdata import load_table

SF_DIR = "/root/testdata/sf0.001"


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_variants_include_identity_and_all_deletions(spark):
    from pyspark.sql import functions as F

    row = (
        spark.createDataFrame([("abc",)], "w string")
        .select(deletion_variants(F.col("w")).alias("v"))
        .collect()[0]
    )
    assert row["v"] == ["abc", "bc", "ac", "ab"]


def test_finds_substitution_insertion_deletion_rejects_false_candidates(spark):
    names = [
        (1, "kitten"),
        (2, "mitten"),   # substitution -> lev 1
        (3, "kitte"),    # deletion -> lev 1 of kitten
        (4, "kittens"),  # insertion -> lev 1 of kitten
        (5, "xy"),
        (6, "yz"),       # share deletion variant "y" but lev 2 -> rejected
        (7, "unrelated"),
    ]
    df = spark.createDataFrame(names, "eid long, nm string")
    got = {
        (r["id_a"], r["id_b"])
        for r in fuzzy_name_pairs(df, "eid", "nm").collect()
    }
    want = {
        (a, b)
        for i, (a, na) in enumerate(names)
        for (b, nb) in names[i + 1 :]
        if _lev(na, nb) <= 1
    }
    assert got == want
    assert (5, 6) not in got
    assert (1, 2) in got and (1, 3) in got and (1, 4) in got


def test_matches_bruteforce_on_customer_names(spark):
    cust = load_table(spark, SF_DIR, "customer")
    names = [(r["c_custkey"], r["c_name"]) for r in cust.collect()]
    got = {
        (r["id_a"], r["id_b"], r["lev"])
        for r in fuzzy_name_pairs(cust, "c_custkey", "c_name").collect()
    }
    want = {
        (a, b, _lev(na, nb))
        for i, (a, na) in enumerate(names)
        for (b, nb) in names[i + 1 :]
        if _lev(na, nb) <= 1
    }
    assert got == want and len(got) > 0


def test_bucket_cap_drops_degenerate_buckets_only(spark):
    # 20 DISTINCT single-char names all share the "" deletion variant;
    # with a cap below 20 the "" bucket is dropped but identity-variant
    # matches of longer names survive
    rows = [(i, chr(97 + i)) for i in range(20)]
    rows += [(100, "abcd"), (101, "abcde")]
    df = spark.createDataFrame(rows, "eid long, nm string")
    got = {
        (r["id_a"], r["id_b"])
        for r in fuzzy_name_pairs(df, "eid", "nm", bucket_cap=10).collect()
    }
    assert (100, 101) in got
    # single-char pairs (lev 1 via substitution) were dropped by the cap
    assert not any(a < 100 and b < 100 for a, b in got)
