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

Round 10 adds a FUNCTION-level layer on top (see ``function_fingerprint``):
when the registered callable resolves to a top-level def, the fingerprint
covers only the definitions statically CALL-REACHABLE from it (hashing each
reached def's ``ast.dump``), so a one-line edit to an unrelated function in
the same 1500-line hub module no longer stales every query in the module's
import closure (round-9 verdict: one r9 edit staled 127 closures and the
50-slot window needed two rounds to drain changes the driver had already
gated). Unresolvable bindings degrade to whole-module inclusion — always
toward "stale", never toward missing a change — and unresolvable ROOTS fall
back to the module-closure fingerprint above.

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


# --------------------------------------------------------------------------
# Function-level fingerprints (round 10).
#
# The module-granularity closure over-approximates badly: queries/text.py
# alone hosts ~25 queries plus constants imported by other hubs, so a
# one-line edit to ONE function staled >100 query closures in round 9 and
# the driver's 50-slot window needed multiple rounds to drain changes it
# had already gated. The fix: fingerprint the CALL-REACHABLE top-level
# definitions, not whole files. Starting from the query's registered
# function, walk the AST reference graph — names used by a def resolve to
# sibling defs/assigns, package from-imports resolve into the imported
# module, attribute access through a package-module alias resolves to that
# module's def — and hash the ``ast.dump`` of every reached definition
# (whitespace/comment edits are invisible; ANY code edit inside a reached
# def changes its dump). External imports contribute the dump of their
# import statement. Anything the static walk cannot resolve (star imports,
# module objects passed as values, re-exports, getattr) degrades to
# including the whole target module's blob — over-approximation is always
# toward "stale", never toward missing a real change. If the ROOT function
# itself cannot be found (lambda/partial registrations), the caller falls
# back to the module-closure fingerprint above.
# --------------------------------------------------------------------------


class _ModuleInfo:
    """Static binding surface of one module source file."""

    __slots__ = ("defs", "mod_aliases", "from_names", "ext_imports", "stars")

    def __init__(self):
        # name -> list of (dump_sha, bare_names, attr_pairs)
        self.defs: dict[str, list] = {}
        # alias -> package module fullname (``import pkg.x as y``)
        self.mod_aliases: dict[str, str] = {}
        # alias -> (package module fullname, attr) (``from pkg.x import a``)
        self.from_names: dict[str, tuple[str, str]] = {}
        # alias -> dump sha of the import statement (non-package imports)
        self.ext_imports: dict[str, str] = {}
        # package modules star-imported (forces whole-module inclusion)
        self.stars: list[str] = []


class _RefVisitor(ast.NodeVisitor):
    """Collect bare name loads and (base, attr) pairs for Name-based
    attribute access. Over-approximates on purpose: local variables that
    shadow module names simply pull in extra (harmless) definitions."""

    def __init__(self):
        self.names: set[str] = set()
        self.attrs: set[tuple[str, str]] = set()

    def visit_Attribute(self, node):
        if isinstance(node.value, ast.Name):
            self.attrs.add((node.value.id, node.attr))
        else:
            self.generic_visit(node)

    def visit_Name(self, node):
        self.names.add(node.id)


def _node_refs(node) -> tuple[frozenset, frozenset]:
    v = _RefVisitor()
    v.visit(node)
    return frozenset(v.names), frozenset(v.attrs)


def _local_imports(node) -> tuple[dict, dict]:
    """Package imports nested INSIDE a definition (the repo's standard
    late-import style): bound name -> (module, attr) for from-imports,
    bound name -> module fullname for module imports. The import statement
    itself is part of the def's dump; what these edges add is reachability
    into the imported DEFINITIONS."""
    lfrom: dict[str, tuple[str, str]] = {}
    lmods: dict[str, str] = {}
    for sub in ast.walk(node):
        if isinstance(sub, ast.Import):
            for alias in sub.names:
                if alias.name.startswith(_PKG):
                    bound = alias.asname or alias.name.split(".")[0]
                    lmods[bound] = alias.name
        elif isinstance(sub, ast.ImportFrom):
            mod = sub.module or ""
            if sub.level == 0 and mod.startswith(_PKG):
                for alias in sub.names:
                    if alias.name != "*":
                        bound = alias.asname or alias.name
                        lfrom[bound] = (mod, alias.name)
    return lfrom, lmods


def _dump_sha(node) -> str:
    return hashlib.sha1(ast.dump(node).encode()).hexdigest()


def _assign_names(node) -> list[str]:
    targets = (
        node.targets
        if isinstance(node, ast.Assign)
        else [node.target]
    )
    out = []
    for t in targets:
        if isinstance(t, ast.Name):
            out.append(t.id)
        elif isinstance(t, (ast.Tuple, ast.List)):
            out.extend(e.id for e in t.elts if isinstance(e, ast.Name))
        elif isinstance(t, ast.Subscript) and isinstance(
            t.value, ast.Name
        ):
            # ``QUERIES["x"] = fn`` mutates an existing binding: attribute
            # the statement to the base name so edits to registration
            # lines fingerprint under it
            out.append(t.value.id)
    return out


def _parse_info(src: str) -> _ModuleInfo | None:
    try:
        tree = ast.parse(src)
    except SyntaxError:
        return None
    info = _ModuleInfo()

    def record_def(name: str, node) -> None:
        names, attrs = _node_refs(node)
        lfrom, lmods = _local_imports(node)
        info.defs.setdefault(name, []).append(
            (_dump_sha(node), names, attrs, lfrom, lmods)
        )

    def scan(body) -> None:
        for node in body:
            if isinstance(
                node,
                (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef),
            ):
                record_def(node.name, node)
            elif isinstance(
                node, (ast.Assign, ast.AnnAssign, ast.AugAssign)
            ):
                for name in _assign_names(node):
                    record_def(name, node)
            elif isinstance(node, ast.Import):
                sha = _dump_sha(node)
                for alias in node.names:
                    bound = alias.asname or alias.name.split(".")[0]
                    if alias.name.startswith(_PKG):
                        # un-aliased ``import pkg.a.b`` binds ``pkg``; the
                        # resolvable target is still the full module
                        info.mod_aliases[bound] = alias.name
                    else:
                        info.ext_imports[bound] = sha
            elif isinstance(node, ast.ImportFrom):
                sha = _dump_sha(node)
                mod = node.module or ""
                if node.level == 0 and mod.startswith(_PKG):
                    for alias in node.names:
                        if alias.name == "*":
                            info.stars.append(mod)
                        else:
                            bound = alias.asname or alias.name
                            info.from_names[bound] = (mod, alias.name)
                else:
                    for alias in node.names:
                        bound = alias.asname or alias.name
                        info.ext_imports[bound] = sha
            elif isinstance(node, (ast.If, ast.Try, ast.With)):
                for attr in ("body", "orelse", "finalbody"):
                    scan(getattr(node, attr, []) or [])
                for h in getattr(node, "handlers", []) or []:
                    scan(h.body)
            elif isinstance(node, (ast.For, ast.While)):
                scan(node.body)
                scan(node.orelse or [])
    scan(tree.body)
    return info


# tree key: None = worktree, else a commit sha
_SRC_CACHE: dict = {}
_INFO_CACHE: dict = {}
_FN_FP_CACHE: dict = {}


def _relpath_in(modname: str, tree: str | None) -> str | None:
    """Repo-relative path of a package module within a tree (worktree or
    gate commit)."""
    if not modname.startswith(_PKG):
        return None
    if tree is None:
        return _module_relpath(modname)
    blobs = _blobs_at_commit(tree)
    if blobs is None:
        return None
    parts = modname.split(".")
    for cand in ("/".join(parts) + ".py", "/".join(parts) + "/__init__.py"):
        if cand in blobs:
            return cand
    return None


def _module_source(relpath: str, tree: str | None) -> str | None:
    key = (tree, relpath)
    if key in _SRC_CACHE:
        return _SRC_CACHE[key]
    src: str | None = None
    if tree is None:
        try:
            with open(
                os.path.join(_repo_root(), relpath), encoding="utf-8"
            ) as f:
                src = f.read()
        except OSError:
            src = None
    else:
        blobs = _blobs_at_commit(tree)
        sha = blobs.get(relpath) if blobs else None
        if sha is not None:
            src = _git("cat-file", "-p", sha)
    _SRC_CACHE[key] = src
    return src


def _module_info(relpath: str, tree: str | None) -> _ModuleInfo | None:
    src = _module_source(relpath, tree)
    if src is None:
        return None
    key = hashlib.sha1(src.encode()).hexdigest()
    if key not in _INFO_CACHE:
        _INFO_CACHE[key] = _parse_info(src)
    return _INFO_CACHE[key]


def _tree_blob(relpath: str, tree: str | None) -> str:
    if tree is None:
        # honor a seeded _SRC_CACHE entry (the staleness tests simulate
        # worktree edits by seeding sources) so whole-module items see the
        # same bytes the parser saw
        src = _SRC_CACHE.get((None, relpath))
        if isinstance(src, str):
            data = src.encode()
            h = hashlib.sha1()
            h.update(b"blob %d\x00" % len(data))
            h.update(data)
            return h.hexdigest()
        return _blob_sha_worktree(relpath) or "ABSENT"
    blobs = _blobs_at_commit(tree)
    return (blobs or {}).get(relpath, "ABSENT")


def function_fingerprint(
    modname: str, funcname: str, tree: str | None
) -> str | None:
    """Digest of the call-reachable definition set of ``modname.funcname``
    in ``tree`` (None = worktree, else a gate-commit sha). Returns None
    only when the ROOT cannot be resolved in the WORKTREE layout — the
    caller then falls back to the module closure. A root that is missing
    from a historical tree fingerprints as ABSENT (a new function is by
    definition a change)."""
    items = function_items(modname, funcname, tree)
    if items is None:
        return None
    return hashlib.sha256("\n".join(items).encode()).hexdigest()


def function_items(
    modname: str,
    funcname: str,
    tree: str | None,
    extra_defs: dict[str, list] | None = None,
) -> list[str] | None:
    """The sorted item set behind :func:`function_fingerprint` — exposed
    for diagnostics and for the staleness tests' item-diff assertions.

    ``extra_defs`` injects synthetic definition entries (the
    ``_parse_info`` record 5-tuple: dump sha, bare names, attr pairs,
    def-local from-imports, def-local module imports) visible only in the
    ROOT module — the oracle per-key fingerprint roots the walk at a
    query's ORACLES value expression this way. Callers using it must pick
    a ``funcname`` unique per injected root (it keys the cache)."""
    cache_key = (tree, modname, funcname)
    if cache_key in _FN_FP_CACHE:
        return _FN_FP_CACHE[cache_key]
    items: set[str] = set()
    whole_modules: set[str] = set()
    # (mod, name) -> whether a static binding was found; a later EXPECTED
    # edge to a name first reached as a plain miss still forces the
    # whole-module fallback
    visited: dict[tuple[str, str], bool] = {}
    unresolved_root = False

    def include_module(mod: str) -> None:
        # a whole-module fallback covers the module's TRANSITIVE import
        # closure (worktree-derived, like the module-level fingerprint),
        # so an unresolvable binding can never hide a change landing in a
        # module it delegates to
        for rel in import_closure(mod) or (
            r for r in [_relpath_in(mod, tree)] if r
        ):
            whole_modules.add(rel)

    def visit(
        mod: str, name: str, expect: bool = False, is_root: bool = False
    ) -> None:
        nonlocal unresolved_root
        if (mod, name) in visited:
            if expect and not visited[(mod, name)]:
                include_module(mod)
            return
        visited[(mod, name)] = True  # provisional; corrected below on miss
        rel = _relpath_in(mod, tree)
        if rel is None:
            # module absent from this tree: hash as ABSENT via the
            # worktree layout's path when we have one
            wrel = _relpath_in(mod, None)
            if wrel is not None:
                items.add(f"def:{wrel}:{name}:ABSENT")
            elif is_root:
                unresolved_root = True
            return
        info = _module_info(rel, tree)
        if info is None:
            whole_modules.add(rel)
            return
        if info.stars:
            for star in info.stars:
                include_module(star)
        def is_module(fullname: str) -> bool:
            return bool(
                _relpath_in(fullname, tree) or _relpath_in(fullname, None)
            )

        def module_target(base: str, lfrom, lmods) -> str | None:
            """Module fullname a name is bound to (def-local bindings
            first), or None when it's not a module binding."""
            if base in lmods:
                return lmods[base]
            for table in (lfrom, info.from_names):
                if base in table:
                    smod, sname = table[base]
                    sub = f"{smod}.{sname}"
                    return sub if is_module(sub) else None
            if base in info.mod_aliases:
                return info.mod_aliases[base]
            return None

        def follow_from(binding: tuple[str, str]) -> None:
            smod, sname = binding
            sub = f"{smod}.{sname}"
            if is_module(sub):
                # ``from pkg.a import b`` importing a MODULE used as a
                # bare value: conservative whole-module
                include_module(sub)
            else:
                visit(smod, sname, expect=True)

        entries = list(info.defs.get(name, []))
        if extra_defs and mod == modname and name in extra_defs:
            entries.extend(extra_defs[name])
        hit = False
        if entries:
            hit = True
            for sha, names, attrs, lfrom, lmods in entries:
                items.add(f"def:{rel}:{name}:{sha}")
                for n in names:
                    if n in lmods:
                        include_module(lmods[n])
                    elif n in lfrom:
                        follow_from(lfrom[n])
                    else:
                        resolve(mod, info, n)
                for base, attr in attrs:
                    target = module_target(base, lfrom, lmods)
                    if target is not None:
                        sub = f"{target}.{attr}"
                        if is_module(sub):
                            include_module(sub)
                        else:
                            visit(target, attr, expect=True)
                    elif base in lfrom:
                        follow_from(lfrom[base])
                    else:
                        resolve(mod, info, base)
        if name in info.from_names:
            hit = True
            follow_from(info.from_names[name])
        if name in info.mod_aliases:
            hit = True
            # a package module used as a bare value: whole module
            include_module(info.mod_aliases[name])
        if name in info.ext_imports:
            hit = True
            items.add(f"imp:{rel}:{name}:{info.ext_imports[name]}")
        if not hit:
            visited[(mod, name)] = False
            if is_root:
                unresolved_root = True
            elif expect:
                # reached through an explicit package import or a
                # module-alias attribute but NOT statically bound in the
                # target (re-export, __getattr__, dynamic registration):
                # include the whole module so the change cannot be missed
                include_module(mod)
            # bare names that resolve nowhere are builtins/locals: external
            return

    def resolve(mod: str, info: _ModuleInfo, name: str) -> None:
        if (
            name in info.defs
            or name in info.from_names
            or name in info.mod_aliases
            or name in info.ext_imports
        ):
            visit(mod, name)

    visit(modname, funcname, is_root=True)
    if unresolved_root and tree is None:
        _FN_FP_CACHE[cache_key] = None
        return None
    if unresolved_root:
        # root missing from the historical tree: a change by definition
        wrel = _relpath_in(modname, None) or modname
        items.add(f"def:{wrel}:{funcname}:ABSENT")
    for rel in sorted(whole_modules):
        items.add(f"mod:{rel}:{_tree_blob(rel, tree)}")
    out = sorted(items)
    _FN_FP_CACHE[cache_key] = out
    return out


_ORACLE_NODE_CACHE: dict = {}

_DATA_BLOB_CACHE: dict = {}


def _data_blob(relpath: str, tree: str | None) -> str:
    """Blob sha of a repo-relative DATA file (may live outside the package
    dir _blobs_at_commit is restricted to). Worktree reads the bytes
    directly so an uncommitted regeneration is visible; historical trees
    ask git for that commit's own blob. ABSENT when missing."""
    key = (tree, relpath)
    if key in _DATA_BLOB_CACHE:
        return _DATA_BLOB_CACHE[key]
    if tree is None:
        sha = _blob_sha_worktree(relpath) or "ABSENT"
    else:
        out = _git("rev-parse", f"{tree}:{relpath}")
        sha = out.strip() if out else "ABSENT"
    _DATA_BLOB_CACHE[key] = sha
    return sha


# Repo-relative data files whose CONTENT is part of a query's oracle
# semantics (r11 advice #4: the text_compression_ratio oracle joins
# fixtures/zlib_signals.parquet, so regenerating the fixture changes what
# the gate asserts without any AST movement). oracle_fingerprint folds
# each file's git blob sha — per tree, so a historical commit compares
# its OWN fixture bytes — into the fingerprint items. Declared here (not
# registered from the query modules) so this machinery module never
# enters a query module's import closure.
ORACLE_DATA_FILES: dict[str, tuple[str, ...]] = {
    "text_compression_ratio": ("fixtures/zlib_signals.parquet",),
}


def _oracle_value_nodes(modname: str, qname: str, tree: str | None):
    """AST value expressions bound to ``ORACLES[qname]`` in ``modname`` —
    via the dict-literal entry (``ORACLES = {"q": <expr>, ...}``) and/or
    the subscript form (``ORACLES["q"] = <expr>``), searched through the
    same If/Try/loop nesting ``_parse_info`` scans. Returns a (possibly
    empty) list of nodes, or None when the binding cannot be indexed
    per-key (non-Dict assign, ``**`` merges, non-constant subscript keys)
    — the caller then falls back to the whole-dict fingerprint."""
    cache_key = (tree, modname, qname)
    if cache_key in _ORACLE_NODE_CACHE:
        return _ORACLE_NODE_CACHE[cache_key]
    result = None
    rel = _relpath_in(modname, tree)
    src = _module_source(rel, tree) if rel else None
    if src is not None:
        try:
            mod_tree = ast.parse(src)
        except SyntaxError:
            mod_tree = None
        nodes: list = []
        indexable = True

        def index_dict(value) -> None:
            nonlocal indexable
            if isinstance(value, ast.Dict):
                for k, v in zip(value.keys, value.values):
                    if k is None:  # {**other} merge
                        indexable = False
                    elif isinstance(k, ast.Constant) and k.value == qname:
                        nodes.append(v)
            else:
                indexable = False

        def scan(body):
            nonlocal indexable
            for node in body:
                if isinstance(node, ast.AnnAssign):
                    # ``ORACLES: dict = {...}`` — same per-key indexing as
                    # the plain Assign form (r11 advice: _parse_info handles
                    # AnnAssign, so this scanner must too)
                    t = node.target
                    if isinstance(t, ast.Name) and t.id == "ORACLES":
                        if node.value is not None:
                            index_dict(node.value)
                        else:
                            indexable = False
                elif isinstance(node, ast.Assign):
                    for t in node.targets:
                        if isinstance(t, ast.Name) and t.id == "ORACLES":
                            index_dict(node.value)
                        elif (
                            isinstance(t, ast.Subscript)
                            and isinstance(t.value, ast.Name)
                            and t.value.id == "ORACLES"
                        ):
                            if (
                                isinstance(t.slice, ast.Constant)
                                and t.slice.value == qname
                            ):
                                nodes.append(node.value)
                            elif not isinstance(t.slice, ast.Constant):
                                indexable = False
                elif isinstance(node, (ast.If, ast.Try, ast.With)):
                    for attr in ("body", "orelse", "finalbody"):
                        scan(getattr(node, attr, []) or [])
                    for h in getattr(node, "handlers", []) or []:
                        scan(h.body)
                elif isinstance(node, (ast.For, ast.While)):
                    scan(node.body)
                    scan(node.orelse or [])

        if mod_tree is not None:
            scan(mod_tree.body)
            # Mutation forms the per-key scan cannot attribute to a single
            # key (r11 advice: these previously fingerprinted as a stable
            # ABSENT on both trees, making oracle edits invisible):
            # ``ORACLES |= {...}`` / ``ORACLES += ...`` (AugAssign) and any
            # method call on the dict (``ORACLES.update({...})``,
            # ``ORACLES.setdefault(...)``) — anywhere in the module,
            # including helper functions that mutate at import time. Flag
            # them un-indexable so the caller falls back to the
            # whole-ORACLES-rooted fingerprint instead of the sentinel.
            for node in ast.walk(mod_tree):
                if isinstance(node, ast.AugAssign):
                    t = node.target
                    if isinstance(t, ast.Name) and t.id == "ORACLES":
                        indexable = False
                elif isinstance(node, ast.Call):
                    f = node.func
                    if (
                        isinstance(f, ast.Attribute)
                        and isinstance(f.value, ast.Name)
                        and f.value.id == "ORACLES"
                    ):
                        indexable = False
            if indexable:
                result = nodes
    _ORACLE_NODE_CACHE[cache_key] = result
    return result


def oracle_fingerprint(
    modname: str, qname: str, tree: str | None
) -> str | None:
    """Digest of the gate-semantics surface of ``qname``'s oracle SQL in
    ``modname`` (round-10 advice #1: the function-level fingerprint roots
    at the registered query callable, which never references the
    module-level ORACLES dict, so an oracle edit was invisible to the
    rotation). When the dict is statically indexable per key, the walk is
    rooted at THIS query's value expression (injected as a synthetic def
    via ``function_items``'s ``extra_defs``), so it reaches exactly the
    helpers/constants that oracle uses — editing one query's SQL, or a
    helper only other oracles use, does not stale its siblings (the
    whole-dict root staled all ~25 module queries against old green
    rounds and would have clobbered the driver window). Un-indexable
    forms degrade to the whole ORACLES-rooted item set; a key ABSENT from
    one tree fingerprints as a change (oracle added/removed). None = no
    trackable ORACLES binding."""
    data_items = [
        f"data:{rel}:{_data_blob(rel, tree)}"
        for rel in ORACLE_DATA_FILES.get(qname, ())
    ]
    nodes = _oracle_value_nodes(modname, qname, tree)
    if nodes is None:
        items = function_items(modname, "ORACLES", tree)
        if items is None:
            return None
        return hashlib.sha256(
            ("WHOLE\n" + "\n".join(sorted(items + data_items))).encode()
        ).hexdigest()
    if not nodes:
        return "ABSENT"
    synth = f"__oracle__{qname}"
    entries = []
    for node in nodes:
        names, attrs = _node_refs(node)
        lfrom, lmods = _local_imports(node)
        entries.append((_dump_sha(node), names, attrs, lfrom, lmods))
    items = function_items(
        modname, synth, tree, extra_defs={synth: entries}
    )
    if items is None:
        return None
    return hashlib.sha256(
        "\n".join(sorted(items + data_items)).encode()
    ).hexdigest()


def oracle_changed_since_round(modname: str, rnd: int, qname: str) -> bool:
    """True iff ``qname``'s oracle surface (see :func:`oracle_fingerprint`)
    differs between the working tree and round ``rnd``'s gate commit.
    Returns False when the module has no statically resolvable ORACLES
    binding (nothing to track) or history is unreadable (age rotation
    still applies)."""
    if rnd < 0:
        return False
    commit = _round_commit(rnd)
    if commit is None:
        return False
    now = oracle_fingerprint(modname, qname, None)
    if now is None:
        return False
    return oracle_fingerprint(modname, qname, commit) != now


def changed_since_round(
    modname: str, rnd: int, func: str | None = None
) -> bool:
    """True iff the implementation of ``modname`` (or, when ``func`` is
    given and statically resolvable, just the call-reachable definition
    set of ``modname.func``) differs between the working tree and round
    ``rnd``'s gate commit. Unknowable -> False (age rotation still
    applies)."""
    if rnd < 0:
        return False  # never verified: already sorts first
    commit = _round_commit(rnd)
    if commit is None:
        return False
    blobs = _blobs_at_commit(commit)
    if blobs is None:
        return False
    if func is not None:
        now_fn = function_fingerprint(modname, func, None)
        if now_fn is not None:
            return function_fingerprint(modname, func, commit) != now_fn
    paths = import_closure(modname)
    if not paths:
        return False
    then = _fingerprint(paths, blobs)
    now = _fingerprint(paths, None)
    if then is None or now is None:
        return False
    return then != now


def change_epoch(
    modname: str, rnd: int, latest: int, func: str | None = None
) -> int:
    """Approximate round in which ``modname``'s (or ``modname.func``'s)
    implementation last changed, given its last green round ``rnd`` and the
    newest recorded round ``latest``: the smallest r in (rnd, latest] whose
    gate-commit fingerprint already equals the current worktree fingerprint
    (the change landed by round r), or ``latest + 1`` when even the latest
    commit differs (the change is in the current round's working tree).
    Used to order the changed group so the most recently edited plans
    re-enter the driver window first."""
    now_fn = (
        function_fingerprint(modname, func, None)
        if func is not None
        else None
    )
    if now_fn is None:
        paths = import_closure(modname)
        now = _fingerprint(paths, None)
        if now is None:
            return latest + 1
    for r in range(rnd + 1, latest + 1):
        commit = _round_commit(r)
        if commit is None:
            continue
        if now_fn is not None:
            if function_fingerprint(modname, func, commit) == now_fn:
                return r
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
    _SRC_CACHE.clear()
    _INFO_CACHE.clear()
    _FN_FP_CACHE.clear()
    _ORACLE_NODE_CACHE.clear()
    _DATA_BLOB_CACHE.clear()
