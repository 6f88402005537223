"""Change-aware staleness detection for the query-registry rotation.

The driver's correctness gate records rows for only the first N registry
entries per round, so ``queries.__init__._reorder`` rotates
least-recently-verified queries to the front. That rotation is blind to code
changes: a query whose implementing module was edited *after* its last green
round would ride unverified until its round-age alone rotated it back in
(observed in round 8: ``ev_range_join``'s strategy dispatch shipped r8 but the
query's last green was r7, so it wouldn't re-enter the 50-slot window until
~r10).

This module closes that hole by fingerprinting each query's implementation:

- the fingerprint is the set of git blob hashes of the query's defining
  module plus its transitive ``icenetetl_spark`` import closure (AST-derived,
  so it needs no imports to run and sees operator/plan/source modules the
  query delegates to);
- the "as verified" fingerprint is taken from the tree of the driver's gate
  commit for the query's last green round (the driver commits correctness
  results as ``round N: verdict/...``; the code it gated is that commit's
  tree, since the driver only adds result files on top of the builder's last
  commit);
- the current fingerprint hashes the *working tree* (uncommitted edits count
  as changes — exactly the window in which a builder iterates).

A query whose fingerprints differ is "stale" and sorts as if never verified,
so it re-enters the driver window in the very next round after its code
changes.

Everything degrades gracefully: outside a git checkout, with an unreadable
history, or for an unresolvable module, a query is simply treated as
unchanged and the age-only rotation applies.
"""

from __future__ import annotations

import ast
import hashlib
import os
import subprocess
from functools import lru_cache

_PKG = "icenetetl_spark"


def _repo_root() -> str:
    # queries/_staleness.py -> queries -> icenetetl_spark -> repo root
    return os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )


def _module_relpath(modname: str) -> str | None:
    """Repo-relative source path for a package module, or None."""
    if not modname.startswith(_PKG):
        return None
    parts = modname.split(".")
    root = _repo_root()
    as_file = os.path.join(*parts) + ".py"
    if os.path.isfile(os.path.join(root, as_file)):
        return as_file
    as_pkg = os.path.join(*parts, "__init__.py")
    if os.path.isfile(os.path.join(root, as_pkg)):
        return as_pkg
    return None


@lru_cache(maxsize=None)
def _direct_imports(relpath: str) -> frozenset[str]:
    """icenetetl_spark module names imported directly by one source file."""
    try:
        with open(os.path.join(_repo_root(), relpath), encoding="utf-8") as f:
            tree = ast.parse(f.read())
    except (OSError, SyntaxError):
        return frozenset()
    found: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for alias in node.names:
                if alias.name.startswith(_PKG):
                    found.add(alias.name)
        elif isinstance(node, ast.ImportFrom) and node.module:
            # absolute imports only (the package uses no relative imports);
            # ``from icenetetl_spark.sources import fixtures`` imports
            # submodules, so probe each alias as a module too
            if node.level == 0 and node.module.startswith(_PKG):
                # ``from pkg import submodule`` depends on the submodule, not
                # on the package __init__ (which may be a hub importing the
                # whole package — including it would mark everything stale on
                # any edit anywhere); depend on the package itself only when
                # an alias is a name defined in the __init__
                names_in_pkg = False
                for alias in node.names:
                    cand = f"{node.module}.{alias.name}"
                    if _module_relpath(cand) is not None:
                        found.add(cand)
                    else:
                        names_in_pkg = True
                if names_in_pkg:
                    found.add(node.module)
    return frozenset(found)


@lru_cache(maxsize=None)
def import_closure(modname: str) -> frozenset[str]:
    """Repo-relative paths of ``modname`` plus its transitive package imports."""
    seen_mods: set[str] = set()
    paths: set[str] = set()
    stack = [modname]
    while stack:
        mod = stack.pop()
        if mod in seen_mods:
            continue
        seen_mods.add(mod)
        rel = _module_relpath(mod)
        if rel is None:
            continue
        paths.add(rel)
        stack.extend(_direct_imports(rel))
    return frozenset(paths)


def _git(*args: str) -> str | None:
    try:
        out = subprocess.run(
            ["git", "-C", _repo_root(), *args],
            capture_output=True,
            text=True,
            timeout=30,
        )
    except (OSError, subprocess.TimeoutExpired):
        return None
    return out.stdout if out.returncode == 0 else None


@lru_cache(maxsize=None)
def _round_commit(rnd: int) -> str | None:
    """The driver's gate commit for round ``rnd`` (its tree is the code the
    gate actually ran). Matched against the SUBJECT line only (round-9
    advice): a later commit merely *mentioning* "round N:" in its body must
    not be mistaken for the gate commit — that would fingerprint the wrong
    tree and report false fresh/stale."""
    out = _git("log", "--format=%H%x1f%s")
    if not out:
        return None
    prefix = f"round {rnd}:"
    for line in out.splitlines():
        try:
            sha, subject = line.split("\x1f", 1)
        except ValueError:
            continue
        # newest matching subject wins: the driver's verdict/correctness
        # commit and its snapshot commit share the tree's code files
        if subject.startswith(prefix):
            return sha.strip() or None
    return None


@lru_cache(maxsize=None)
def _blobs_at_commit(commit: str) -> dict[str, str] | None:
    """path -> blob sha for every package file in a commit's tree."""
    out = _git("ls-tree", "-r", "--format=%(objectname) %(path)", commit, _PKG)
    if out is None:
        # older gits lack --format on ls-tree; fall back to default layout
        out = _git("ls-tree", "-r", commit, _PKG)
        if out is None:
            return None
        blobs = {}
        for line in out.splitlines():
            try:
                meta, path = line.split("\t", 1)
                blobs[path] = meta.split()[2]
            except (ValueError, IndexError):
                continue
        return blobs
    blobs = {}
    for line in out.splitlines():
        try:
            sha, path = line.split(" ", 1)
        except ValueError:
            continue
        blobs[path] = sha
    return blobs


@lru_cache(maxsize=None)
def _blob_sha_worktree(relpath: str) -> str | None:
    """git blob sha of a working-tree file, computed in-process (sha1 of
    ``blob <len>\\0<content>``) so uncommitted edits are visible."""
    try:
        with open(os.path.join(_repo_root(), relpath), "rb") as f:
            data = f.read()
    except OSError:
        return None
    h = hashlib.sha1()
    h.update(b"blob %d\x00" % len(data))
    h.update(data)
    return h.hexdigest()


def _fingerprint(paths: frozenset[str], blobs: dict[str, str] | None) -> str | None:
    """Stable digest over (path, blob sha) pairs. A path absent from a
    historical tree hashes as ABSENT — a closure module that did not exist at
    the green round is by definition a change. Returns None only when the
    *working tree* is unreadable (unknown, not changed)."""
    items = []
    for p in sorted(paths):
        if blobs is None:
            sha = _blob_sha_worktree(p)
            if sha is None:
                return None
        else:
            sha = blobs.get(p, "ABSENT")
        items.append(f"{p}:{sha}")
    return hashlib.sha256("\n".join(items).encode()).hexdigest()


def changed_since_round(modname: str, rnd: int) -> bool:
    """True iff the implementation closure of ``modname`` differs between the
    working tree and round ``rnd``'s gate commit. Unknowable -> False (age
    rotation still applies)."""
    if rnd < 0:
        return False  # never verified: already sorts first
    commit = _round_commit(rnd)
    if commit is None:
        return False
    blobs = _blobs_at_commit(commit)
    if blobs is None:
        return False
    paths = import_closure(modname)
    if not paths:
        return False
    then = _fingerprint(paths, blobs)
    now = _fingerprint(paths, None)
    if then is None or now is None:
        return False
    return then != now


def change_epoch(modname: str, rnd: int, latest: int) -> int:
    """Approximate round in which ``modname``'s closure last changed, given
    its last green round ``rnd`` and the newest recorded round ``latest``:
    the smallest r in (rnd, latest] whose gate-commit fingerprint already
    equals the current worktree fingerprint (the change landed by round r),
    or ``latest + 1`` when even the latest commit differs (the change is in
    the current round's working tree). Used to order the changed group so
    the most recently edited plans re-enter the driver window first."""
    paths = import_closure(modname)
    now = _fingerprint(paths, None)
    if now is None:
        return latest + 1
    for r in range(rnd + 1, latest + 1):
        commit = _round_commit(r)
        if commit is None:
            continue
        blobs = _blobs_at_commit(commit)
        if blobs is None:
            continue
        if _fingerprint(paths, blobs) == now:
            return r
    return latest + 1


def reset_caches() -> None:
    """Test hook: drop memoized git/file state."""
    _direct_imports.cache_clear()
    import_closure.cache_clear()
    _round_commit.cache_clear()
    _blobs_at_commit.cache_clear()
    _blob_sha_worktree.cache_clear()
