"""Interleaved A/B of the full bench suite between two git commits.

Motivation (VERDICT r7 #1): BENCH totals drifted r5 12.38s -> r6 14.68s ->
r7 16.18s with every query moving a uniform 1.15-1.53x while the audited
plans were unchanged.  A one-shot number can't distinguish "the code got
slower" from "the host got slower", because each round's bench ran hours or
days apart on a shared box.  This harness removes the time-of-day confound
the same way tools/scale_stress.py does for the 10x table: it checks out the
old commit into a throwaway git worktree and alternates full bench.py
subprocess runs A,B,A,B,... inside ONE session, so both sides see the same
ambient machine state, then reports per-side medians, spreads, and the
ratio with a min/max envelope.

Usage:
    python tools/bench_ab.py [BASE_COMMIT] [REPS_PER_SIDE]

Defaults: BASE_COMMIT=72a630e (round-6 record), REPS_PER_SIDE=4.
Each rep is a full `python bench.py` run (itself a median-of-3 per query),
so one side's statistic is a median of medians.  The worktree is removed on
exit.  Output: human table on stderr, one JSON line on stdout.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import tempfile


def run_bench(tree: str, env: dict) -> dict:
    """One full bench.py subprocess from `tree`; returns the parsed JSON line."""
    proc = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=tree,
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
    )
    if proc.returncode != 0:
        raise RuntimeError(f"bench failed in {tree}: {proc.stderr[-2000:]}")
    for line in reversed(proc.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no JSON line from bench in {tree}")


def main() -> None:
    base = sys.argv[1] if len(sys.argv) > 1 else "72a630e"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    with tempfile.TemporaryDirectory(prefix="bench_ab_") as tmp:
        base_tree = os.path.join(tmp, "base")
        subprocess.run(
            ["git", "worktree", "add", "--detach", base_tree, base],
            cwd=repo,
            check=True,
            capture_output=True,
        )
        try:
            sides = {"base": base_tree, "head": repo}
            results: dict[str, list[dict]] = {"base": [], "head": []}
            # Alternate base,head,base,head,... so slow ambient windows hit
            # both sides equally; a drift during the session shows up as
            # within-side spread, not as a between-side bias.
            for i in range(reps):
                for name in ("base", "head"):
                    r = run_bench(sides[name], env)
                    results[name].append(r)
                    print(
                        f"rep {i + 1}/{reps} {name}: total {r['value']:.2f}s",
                        file=sys.stderr,
                        flush=True,
                    )
        finally:
            subprocess.run(
                ["git", "worktree", "remove", "--force", base_tree],
                cwd=repo,
                capture_output=True,
            )

    out: dict = {"base_commit": base, "reps": reps, "totals": {}, "queries": {}}
    for name in ("base", "head"):
        totals = [r["value"] for r in results[name]]
        out["totals"][name] = {
            "median": round(statistics.median(totals), 3),
            "min": round(min(totals), 3),
            "max": round(max(totals), 3),
        }
    shared = set(results["base"][0]["queries"]) & set(results["head"][0]["queries"])
    for q in sorted(shared):
        med = {
            name: statistics.median(r["queries"][q] for r in results[name])
            for name in ("base", "head")
        }
        out["queries"][q] = {
            "base": round(med["base"], 3),
            "head": round(med["head"], 3),
            "ratio": round(med["head"] / med["base"], 3) if med["base"] else None,
        }

    bt, ht = out["totals"]["base"], out["totals"]["head"]
    print(
        f"\nbase {base}: total median {bt['median']} [{bt['min']}..{bt['max']}]\n"
        f"head      : total median {ht['median']} [{ht['min']}..{ht['max']}]\n"
        f"head/base ratio {ht['median'] / bt['median']:.3f}",
        file=sys.stderr,
    )
    worst = sorted(out["queries"].items(), key=lambda kv: -(kv[1]["ratio"] or 0))[:5]
    for q, v in worst:
        print(f"  {q}: {v['base']} -> {v['head']} ({v['ratio']}x)", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
