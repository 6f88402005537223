"""Change-aware registry rotation (queries/_staleness.py).

The driver gates the first 50 registry entries per round, so the registry
order must put (a) never-verified, (b) changed-since-green — newest change
first — ahead of age-rotated green queries. These tests pin the closure
derivation, the git fingerprinting, and the promotion semantics without
needing a SparkSession.
"""

from __future__ import annotations

import subprocess

import pytest

from icenetetl_spark.queries import _staleness as s
from icenetetl_spark import queries as qreg


def _git_available() -> bool:
    try:
        out = subprocess.run(
            ["git", "-C", s._repo_root(), "rev-parse", "--git-dir"],
            capture_output=True,
        )
    except OSError:
        return False
    return out.returncode == 0


pytestmark = pytest.mark.skipif(
    not _git_available(), reason="staleness needs the git checkout"
)


def test_closure_includes_transitive_operator_modules():
    # dedup_semantic is defined in queries/similarity.py but its plan lives
    # in operators/semdedup.py — the round-8 lesson: an operator edit must
    # mark the query stale
    cl = s.import_closure("icenetetl_spark.queries.similarity")
    assert "icenetetl_spark/queries/similarity.py" in cl
    assert "icenetetl_spark/operators/semdedup.py" in cl
    assert "icenetetl_spark/operators/similarity.py" in cl
    # the package __init__ is a hub importing every module; including it
    # would mark everything stale on any edit anywhere
    assert "icenetetl_spark/queries/__init__.py" not in cl


def test_worktree_blob_sha_matches_git(tmp_path):
    # our in-process blob sha must agree with `git hash-object`
    rel = "icenetetl_spark/queries/_staleness.py"
    ours = s._blob_sha_worktree(rel)
    theirs = subprocess.run(
        ["git", "-C", s._repo_root(), "hash-object", rel],
        capture_output=True,
        text=True,
        check=True,
    ).stdout.strip()
    assert ours == theirs


def test_unchanged_module_is_not_stale_against_head_round():
    last = qreg._last_verified_round()
    latest = max(last.values(), default=-1)
    if latest < 0:
        pytest.skip("no CORRECTNESS files")
    commit = s._round_commit(latest)
    if commit is None:
        pytest.skip("latest round commit not in history")
    blobs = s._blobs_at_commit(commit)
    # find any module whose closure is byte-identical to the latest gate
    # commit and assert it is NOT considered changed at that round
    for mod in sorted({m for m in qreg._QUERY_SRC_MODULE.values()}):
        paths = s.import_closure(mod)
        if paths and s._fingerprint(paths, blobs) == s._fingerprint(paths, None):
            assert not s.changed_since_round(mod, latest)
            return
    pytest.skip("every module differs from the latest gate commit")


def test_module_added_after_green_round_counts_as_changed():
    # a closure path absent from the historical tree must fingerprint as a
    # change (round-8 regression: semdedup.py helpers added after the r5
    # green made the fingerprint 'unknown' and the query looked unchanged)
    fp_with_absent = s._fingerprint(
        frozenset({"icenetetl_spark/queries/_staleness.py"}), {}
    )
    fp_now = s._fingerprint(
        frozenset({"icenetetl_spark/queries/_staleness.py"}), None
    )
    assert fp_with_absent is not None
    assert fp_now is not None
    assert fp_with_absent != fp_now


def test_registry_orders_changed_before_age_rotated_green():
    last = qreg._last_verified_round()
    latest = max(last.values(), default=-1)
    if latest < 0:
        pytest.skip("no CORRECTNESS files")
    names = list(qreg.all_queries())

    def cls(name):
        rnd = last.get(name, -1)
        if rnd < 0:
            return 0
        mod = qreg._QUERY_SRC_MODULE.get(name)
        if mod and s.changed_since_round(mod, rnd):
            return 1
        return 2

    classes = [cls(n) for n in names]
    # classes must be non-decreasing: never-verified, then changed, then green
    assert classes == sorted(classes)
    # within the changed class, newest change epoch leads
    changed = [n for n in names if cls(n) == 1]
    epochs = [
        s.change_epoch(qreg._QUERY_SRC_MODULE[n], last[n], latest)
        for n in changed
    ]
    assert epochs == sorted(epochs, reverse=True)


def test_oracle_order_matches_query_order_on_common_keys():
    qnames = [n for n in qreg.all_queries() if n in qreg.all_oracles()]
    onames = list(qreg.all_oracles())
    assert qnames == [n for n in onames if n in set(qnames)]
