#!/usr/bin/env python
"""Same-commit bench variance envelope: run bench.py K times (fresh JVM
each — exactly what the per-round driver does), aggregate per-query
best-of-N values, and print an envelope table for PERFORMANCE.md.

Usage: python tools/bench_variance.py [K] [sf_dir]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _contention(doc: dict) -> str:
    """The cpu_canary contention ratio stamped into every bench
    artifact: 32-wide wall / single wall. ~1.0x on an idle 32-core
    box; larger means the host was contended at capture time, so a
    slow suite number is machine drift, not an engine regression.
    '?' for artifacts predating the canary (rounds 1-6)."""
    a, b = doc.get("canary_1p_s"), doc.get("canary_32p_s")
    if not a or not b:
        return "?"
    return f"{b / a:.2f}x"


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--compare":
        compare(sys.argv[2], sys.argv[3])
        return
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)

    docs = []
    for i in range(k):
        # --single: one suite pass per fresh JVM. Plain `bench.py` is
        # now the contention-proof ORCHESTRATOR (itself K fresh JVMs
        # with retries) — spawning it here would square the JVM count
        # and re-measure what it already envelopes.
        proc = subprocess.run(
            [sys.executable, "bench.py", "--single"],
            cwd=REPO, env=env, capture_output=True, text=True,
        )
        if proc.returncode != 0:
            sys.stderr.write(proc.stderr[-2000:])
            raise SystemExit(f"bench run {i + 1}/{k} failed")
        doc = json.loads(proc.stdout.strip().splitlines()[-1])
        docs.append(doc)
        print(
            f"run {i + 1}/{k}: total={doc['value']}s"
            f" contention={_contention(doc)}", file=sys.stderr
        )

    names = list(docs[0]["queries"])
    print(f"# {k} bench.py invocations, {sf_dir}, commit "
          + subprocess.run(["git", "rev-parse", "--short", "HEAD"], cwd=REPO,
                           capture_output=True, text=True).stdout.strip())
    print("| query | min | max | spread | mean | stddev | cv |")
    print("|---|---|---|---|---|---|---|")
    rows = []
    for name in names:
        vals = [d["queries"][name] for d in docs]
        mn, mx = min(vals), max(vals)
        mean = statistics.mean(vals)
        sd = statistics.stdev(vals) if len(vals) > 1 else 0.0
        rows.append((name, vals, mn, mx, mean, sd))
        print(
            f"| {name} | {mn:.3f} | {mx:.3f} | {(mx / mn - 1) * 100:+.0f}% "
            f"| {mean:.3f} | {sd:.3f} | {sd / mean * 100:.0f}% |"
        )
    totals = [d["value"] for d in docs]
    tsd = statistics.stdev(totals) if len(totals) > 1 else 0.0
    print(
        f"| **total** | {min(totals):.3f} | {max(totals):.3f} "
        f"| {(max(totals) / min(totals) - 1) * 100:+.0f}% | {statistics.mean(totals):.3f} "
        f"| {tsd:.3f} | {tsd / statistics.mean(totals) * 100:.0f}% |"
    )
    # contention line: pin every suite number to its machine state so
    # cross-round deltas can be attributed mechanically (VERDICT r7 #7)
    print(
        "\ncontention (canary 32p/1p per run): "
        + ", ".join(f"{d['value']:.3f}s @ {_contention(d)}" for d in docs)
    )
    with open(os.path.join(REPO, "bench_variance_runs.json"), "w") as fh:
        json.dump(docs, fh, indent=1)
    print("\nraw per-run docs -> bench_variance_runs.json", file=sys.stderr)


def compare(path_a: str, path_b: str) -> None:
    """`bench_variance.py --compare A.json B.json`: suite + per-query
    delta between two bench artifacts, each number shown next to its
    canary contention ratio — the mechanical attribution the round
    verdicts need when the driver's box was loaded at capture time."""
    a, b = (json.load(open(f)) for f in (path_a, path_b))
    # driver artifacts wrap the bench line under "parsed"
    a, b = a.get("parsed", a), b.get("parsed", b)
    ca, cb = _contention(a), _contention(b)
    # round-12+ orchestrated artifacts: surface the envelope + clean
    # count next to the headline so a cross-round delta can be
    # attributed without opening the JSON
    for name, d in ((path_a, a), (path_b, b)):
        if "envelope" in d:
            print(
                f"{os.path.basename(name)}: envelope {d['envelope']} "
                f"clean {d.get('n_clean')}/{d.get('n_passes')} "
                f"contended={d.get('contended')}"
            )
    print(f"| artifact | suite | contention |")
    print(f"|---|---|---|")
    print(f"| {os.path.basename(path_a)} | {a['value']:.3f}s | {ca} |")
    print(f"| {os.path.basename(path_b)} | {b['value']:.3f}s | {cb} |")
    print()
    print("| query | A | B | delta |")
    print("|---|---|---|---|")
    for name in a.get("queries", {}):
        va = a["queries"][name]
        vb = b.get("queries", {}).get(name)
        if vb is None:
            continue
        print(f"| {name} | {va:.3f} | {vb:.3f} | {(vb / va - 1) * 100:+.0f}% |")


if __name__ == "__main__":
    main()
