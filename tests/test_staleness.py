"""Change-aware registry rotation (queries/_staleness.py).

The driver gates the first 50 registry entries per round, so the registry
order must put (a) never-verified, (b) changed-since-green — newest change
first — ahead of age-rotated green queries. These tests pin the closure
derivation, the git fingerprinting, and the promotion semantics without
needing a SparkSession.
"""

from __future__ import annotations

import os
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


def _query_root(name):
    """(module, func|None) the registry fingerprints a query under."""
    root = qreg._QUERY_SRC_FUNC.get(name)
    if root is not None:
        return root
    return (qreg._QUERY_SRC_MODULE.get(name), None)


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
        fmod, func = _query_root(name)
        mod = qreg._QUERY_SRC_MODULE.get(name)
        if fmod and s.changed_since_round(fmod, rnd, func):
            return 1
        # round-11: the query's oracle entry is a second fingerprint root
        if mod and s.oracle_changed_since_round(mod, rnd, name):
            return 1
        return 2

    classes = [cls(n) for n in names]
    # classes must be non-decreasing: never-verified, then changed, then green
    assert classes == sorted(classes)
    # within the changed class, newest change epoch leads
    changed = [n for n in names if cls(n) == 1]
    epochs = []
    for n in changed:
        fmod, func = _query_root(n)
        e = -1
        if fmod and s.changed_since_round(fmod, last[n], func):
            e = max(e, s.change_epoch(fmod, last[n], latest, func))
        mod = qreg._QUERY_SRC_MODULE.get(n)
        if mod and s.oracle_changed_since_round(mod, last[n], n):
            e = max(e, s.change_epoch(mod, last[n], latest, "ORACLES"))
        epochs.append(e)
    assert epochs == sorted(epochs, reverse=True)


# ---------------------------------------------------------------------------
# Function-level fingerprints (round 10)
# ---------------------------------------------------------------------------

HUB = "icenetetl_spark/queries/text.py"


def _all_function_fps():
    out = {}
    for name, root in qreg._QUERY_SRC_FUNC.items():
        if root is None:
            continue
        fmod, func = root
        fp = s.function_fingerprint(fmod, func, None)
        if fp is not None:
            out[name] = fp
    return out


def _seed_worktree_source(relpath, src):
    s._SRC_CACHE[(None, relpath)] = src


def _hub_source():
    import os

    with open(os.path.join(s._repo_root(), HUB), encoding="utf-8") as f:
        return f.read()


def test_single_function_edit_stales_under_30_closures():
    """The round-9 verdict's done-criterion: a single-module (here even a
    single-FUNCTION) edit must stale fewer than 30 query closures — the
    module-granularity fingerprint staled >100 on a one-line hub edit."""
    s.reset_caches()
    base = _all_function_fps()
    assert len(base) > 150  # nearly every query resolves to a def root
    # simulate editing ONE function in the biggest hub: re-binding the
    # name appends a second def entry, changing exactly that def's items
    s.reset_caches()
    _seed_worktree_source(
        HUB,
        _hub_source()
        + "\n\ndef text_stats(spark, sf_dir):\n    return None\n",
    )
    edited = _all_function_fps()
    s.reset_caches()
    changed = sorted(n for n in base if base[n] != edited.get(n))
    assert "text_stats" in changed
    assert 0 < len(changed) < 30, changed


def test_constant_edit_stales_its_consumers_only():
    """Editing a module-level constant must stale the queries whose defs
    reference it — and not the rest of the hub."""
    s.reset_caches()
    base = _all_function_fps()
    s.reset_caches()
    _seed_worktree_source(HUB, _hub_source() + "\nBM25_TOPK = 21\n")
    edited = _all_function_fps()
    s.reset_caches()
    changed = sorted(n for n in base if base[n] != edited.get(n))
    assert "text_bm25_topk" in changed
    assert len(changed) < 30, changed
    # an unrelated query in the SAME module must not move
    assert "text_lang_id" not in changed


def test_comment_only_edit_stales_nothing():
    """ast.dump is blind to comments and blank lines — the class of edit
    that must never burn driver-window slots."""
    s.reset_caches()
    base = _all_function_fps()
    s.reset_caches()
    _seed_worktree_source(
        HUB, _hub_source() + "\n# a trailing comment, no code change\n"
    )
    edited = _all_function_fps()
    s.reset_caches()
    changed = sorted(n for n in base if base[n] != edited.get(n))
    assert changed == []


def test_operator_edit_reaches_through_local_imports():
    """The repo's late-import style (``from pkg.operators.x import f``
    INSIDE a def) must still contribute reachability edges: editing the
    imported operator stales the query."""
    rel = "icenetetl_spark/operators/graph.py"
    import os

    with open(os.path.join(s._repo_root(), rel), encoding="utf-8") as f:
        src = f.read()
    s.reset_caches()
    base = _all_function_fps()
    s.reset_caches()
    _seed_worktree_source(
        rel, src + "\n\ndef pagerank(edges, iterations=10):\n    return None\n"
    )
    edited = _all_function_fps()
    s.reset_caches()
    changed = sorted(n for n in base if base[n] != edited.get(n))
    # graph_pagerank imports pagerank inside its def body
    assert "graph_pagerank" in changed
    assert len(changed) < 30, changed


def test_function_fingerprint_root_missing_falls_back():
    assert s.function_fingerprint(
        "icenetetl_spark.queries.text", "no_such_function_xyz", None
    ) is None


def test_oracle_order_matches_query_order_on_common_keys():
    qnames = [n for n in qreg.all_queries() if n in qreg.all_oracles()]
    onames = list(qreg.all_oracles())
    assert qnames == [n for n in onames if n in set(qnames)]


def test_round_commit_matches_subject_only():
    """Round-9 advice: a commit that merely MENTIONS 'round N:' in its
    body must not be mistaken for the gate commit — the match anchors to
    the subject line."""
    import subprocess

    latest = max(qreg._last_verified_round().values(), default=-1)
    if latest < 0:
        pytest.skip("no CORRECTNESS files")
    sha = s._round_commit(latest)
    if sha is None:
        pytest.skip("gate commit not in history")
    subject = subprocess.run(
        ["git", "-C", s._repo_root(), "log", "-1", "--format=%s", sha],
        capture_output=True, text=True, check=True,
    ).stdout.strip()
    assert subject.startswith(f"round {latest}:")


# ---------------------------------------------------------------------------
# Oracle-dict fingerprint root (round 11 — round-10 advice #1)
# ---------------------------------------------------------------------------


def test_oracle_edit_stales_only_that_query():
    """Editing ONE query's oracle SQL is a gate-semantics change for that
    query alone: its per-key fingerprint must move while siblings in the
    same ORACLES dict stay fixed (the whole-dict root staled all ~25
    module queries against old green rounds, clobbering the window)."""
    mod = "icenetetl_spark.queries.text"
    s.reset_caches()
    base_hit = s.oracle_fingerprint(mod, "text_stats", None)
    base_other = s.oracle_fingerprint(mod, "text_lang_id", None)
    assert base_hit is not None and base_other is not None
    s.reset_caches()
    _seed_worktree_source(
        HUB, _hub_source() + '\nORACLES["text_stats"] = "SELECT 1"\n'
    )
    assert s.oracle_fingerprint(mod, "text_stats", None) != base_hit
    assert s.oracle_fingerprint(mod, "text_lang_id", None) == base_other
    s.reset_caches()


def test_oracle_comment_edit_changes_nothing():
    """A comment near the ORACLES dict must not stale the module's gates
    (ast.dump blindness applies to the oracle root too)."""
    mod = "icenetetl_spark.queries.text"
    s.reset_caches()
    base = s.oracle_fingerprint(mod, "text_stats", None)
    s.reset_caches()
    _seed_worktree_source(
        HUB, _hub_source() + "\n# oracle commentary, no code change\n"
    )
    edited = s.oracle_fingerprint(mod, "text_stats", None)
    s.reset_caches()
    assert edited == base


def test_oracle_fingerprint_reaches_its_builder_helpers_only():
    """ORACLES entries built by helper calls (_ivf_oracle, lloyd_cents_cte)
    must fingerprint THE HELPERS THAT ORACLE USES — and not helpers other
    keys use (a helper added for a new oracle in r9 must not stale every
    r7-green sibling)."""
    mod = "icenetetl_spark.queries.similarity"
    s.reset_caches()
    nodes = s._oracle_value_nodes(mod, "knn_ivf", None)
    assert nodes  # indexable dict-literal entry
    synth = "__oracle__knn_ivf"
    entries = []
    for node in nodes:
        names, attrs = s._node_refs(node)
        lfrom, lmods = s._local_imports(node)
        entries.append((s._dump_sha(node), names, attrs, lfrom, lmods))
    items = s.function_items(mod, synth, None, extra_defs={synth: entries})
    blob = "\n".join(items)
    assert "_ivf_oracle" in blob
    # the Lloyd CTE builder lives in operators/kmeans.py and is reached
    # through _lloyd_cents_sql's def-local import
    assert "operators/kmeans" in blob
    # a helper only the BM25/hybrid oracles use must NOT be reached
    assert "_SIGN_BUCKET" not in blob


def test_oracle_nodes_absent_key_and_subscript_forms():
    # a key that does not exist resolves to an empty node list -> the
    # fingerprint is the ABSENT sentinel (added oracle = change), never
    # un-indexable
    mod = "icenetetl_spark.queries.text"
    s.reset_caches()
    assert s._oracle_value_nodes(mod, "no_such_query_xyz", None) == []
    assert s.oracle_fingerprint(mod, "no_such_query_xyz", None) == "ABSENT"
    # subscript registration is indexed per key too (reset FIRST — it
    # clears the seeded source)
    s.reset_caches()
    _seed_worktree_source(
        HUB, _hub_source() + '\nORACLES["qq_sub"] = "SELECT 2"\n'
    )
    got = s._oracle_value_nodes(mod, "qq_sub", None)
    assert got and len(got) == 1
    assert s.oracle_fingerprint(mod, "qq_sub", None) not in (None, "ABSENT")
    s.reset_caches()


def test_oracle_mutation_forms_fall_back_to_whole_dict_root():
    """r11 advice #1: an ``ORACLES |= {...}`` AugAssign or an
    ``ORACLES.update({...})`` call must mark the binding UN-indexable
    (whole-dict fallback) — previously the per-key scanner skipped those
    statements entirely, so every key fingerprinted as the stable ABSENT
    sentinel on both trees and oracle edits registered through such forms
    were invisible to the rotation. An ``ORACLES: dict = {...}``
    AnnAssign with a Dict literal stays per-key indexable (parity with
    _parse_info, which already handles AnnAssign)."""
    mod = "icenetetl_spark.queries.text"
    for mutation in (
        '\nORACLES |= {"qq_aug": "SELECT 3"}\n',
        '\nORACLES.update({"qq_upd": "SELECT 4"})\n',
    ):
        s.reset_caches()
        _seed_worktree_source(HUB, _hub_source() + mutation)
        assert s._oracle_value_nodes(mod, "text_stats", None) is None
        fp = s.oracle_fingerprint(mod, "text_stats", None)
        # whole-dict fallback, not the invisible-ABSENT failure mode
        assert fp not in (None, "ABSENT")
    # AnnAssign with a Dict literal: still indexed per key
    s.reset_caches()
    _seed_worktree_source(
        HUB, _hub_source().replace("ORACLES = {", "ORACLES: dict = {", 1)
    )
    nodes = s._oracle_value_nodes(mod, "text_stats", None)
    assert nodes and len(nodes) == 1
    s.reset_caches()


def test_oracle_fixture_content_is_part_of_staleness_root():
    """r11 advice #4: text_compression_ratio's gate semantics depend on
    fixtures/zlib_signals.parquet CONTENT (the oracle joins its expected
    deflate lengths), so a make_zlib_fixture.py rerun must move the
    oracle fingerprint even though no AST changes."""
    mod = "icenetetl_spark.queries.text"
    q = "text_compression_ratio"
    rel = "fixtures/zlib_signals.parquet"
    assert rel in s.ORACLE_DATA_FILES.get(q, ())
    s.reset_caches()
    base = s.oracle_fingerprint(mod, q, None)
    assert base not in (None, "ABSENT")
    # the fixture lives OUTSIDE the package dir _blobs_at_commit scans:
    # the historical lookup must still find its blob (ABSENT here would
    # permanently stale the query against every past round)
    hist = s._data_blob(rel, "HEAD")
    assert hist != "ABSENT"
    assert hist == s._data_blob(rel, None)  # committed and unchanged
    # simulate a fixture regeneration: same ASTs, different file bytes
    s.reset_caches()
    s._DATA_BLOB_CACHE[(None, rel)] = "0" * 40
    assert s.oracle_fingerprint(mod, q, None) != base
    s.reset_caches()
    # and the REAL path (r12 advice #3): an actual byte rewrite of the
    # fixture must be visible through reset_caches() alone — this walks
    # _data_blob -> the lru_cached _blob_sha_worktree, so it pins that
    # reset_caches() clears BOTH layers, not just _DATA_BLOB_CACHE
    path = os.path.join(s._repo_root(), rel)
    with open(path, "rb") as f:
        original = f.read()
    try:
        with open(path, "ab") as f:
            f.write(b"\x00")
        s.reset_caches()
        assert s.oracle_fingerprint(mod, q, None) != base
    finally:
        with open(path, "wb") as f:
            f.write(original)
    s.reset_caches()
    assert s.oracle_fingerprint(mod, q, None) == base
    s.reset_caches()


def test_oracle_helper_edit_for_other_key_does_not_stale_sibling():
    """The round-11 window regression this design exists to avoid: adding
    a constant + helper used by a NEW oracle must leave existing queries'
    oracle fingerprints untouched."""
    mod = "icenetetl_spark.queries.text"
    s.reset_caches()
    base = s.oracle_fingerprint(mod, "text_stats", None)
    s.reset_caches()
    _seed_worktree_source(
        HUB,
        _hub_source()
        + '\nNEW_HELPER_K = 7\n'
        + '\ndef _new_oracle_sql(k):\n    return f"SELECT {k}"\n'
        + '\nORACLES["brand_new_query"] = _new_oracle_sql(NEW_HELPER_K)\n',
    )
    assert s.oracle_fingerprint(mod, "text_stats", None) == base
    # while the new key itself fingerprints (and differs from ABSENT)
    assert s.oracle_fingerprint(mod, "brand_new_query", None) not in (
        None,
        "ABSENT",
    )
    s.reset_caches()


def test_oracle_unchanged_against_head_round():
    """A module whose full closure is byte-identical to the latest gate
    commit must not read as oracle-stale (guards against the ORACLES root
    silently degrading to a whole-module fingerprint that drags in an
    edited neighbor)."""
    latest = max(qreg._last_verified_round().values(), default=-1)
    if latest < 0:
        pytest.skip("no CORRECTNESS files")
    commit = s._round_commit(latest)
    if commit is None:
        pytest.skip("latest round commit not in history")
    blobs = s._blobs_at_commit(commit)
    for mod in sorted(set(qreg._QUERY_SRC_MODULE.values())):
        paths = s.import_closure(mod)
        if paths and s._fingerprint(paths, blobs) == s._fingerprint(
            paths, None
        ):
            for q, m in qreg._QUERY_SRC_MODULE.items():
                if m == mod:
                    assert not s.oracle_changed_since_round(mod, latest, q)
            return
    pytest.skip("every module differs from the latest gate commit")


def test_oracles_are_colocated_with_their_queries():
    """The per-key oracle fingerprint looks up ORACLES[qname] in the
    query's DEFINING module; an oracle registered in a different module
    would read as permanently ABSENT there and its edits would bypass
    the rotation. Pin the co-location invariant the design assumes."""
    for m in qreg._MODULES:
        missing = set(m.ORACLES) - set(m.QUERIES)
        assert not missing, (
            f"{m.__name__} registers oracles for queries it does not "
            f"define: {sorted(missing)}"
        )
    for name, mod in qreg._QUERY_SRC_MODULE.items():
        owner = next(x for x in qreg._MODULES if x.__name__ == mod)
        foreign = [
            x.__name__
            for x in qreg._MODULES
            if x is not owner and name in x.ORACLES
        ]
        assert not foreign, (
            f"{name}'s oracle is registered in {foreign}, not its "
            f"defining module {mod}"
        )
