#!/usr/bin/env python
"""Standing drift-aware regression command (VERDICT r4 item 6): ONE
command that re-runs the three surfaces every "is it code or is it
the VM?" adjudication has needed, best-of-N, and appends ONE dated
row to BENCH.md (and BASELINE.md) — so rounds stop re-deriving the
environment argument by hand:

  1. headline serving bench — ``bench.py`` at $SPARK_GRAFT_SF_DIR
     (itself best-of-N per timed row since r5);
  2. compute-kernel scaling unit — ``tools/bench_scaling.py kernel``
     (cache-resident codec work, the surface the north-rule ≥0.8
     efficiency is held on; best-of-N inside);
  3. real-corpus 527k e2e — ``tools/trec_e2e.py`` (resumable index:
     re-runs on a built --index-dir only pay the 50-topic search),
     reporting MAP / P@20 / nDCG@20 + the serving wall-clock next to
     the reference's published numbers.

Usage: python tools/regress.py [--skip-e2e] [--skip-bench]
       [--skip-kernel] [--index-dir /tmp/trec_idx] [--reps 3]
       [--note TEXT] [--no-append]
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

HEADER = (
    "| date | bench total (s) | index_build | wand_topk | kernel "
    "3→12 eff | TREC MAP | P@20 | nDCG@20 | e2e search (s) | note |\n"
    "|---|---|---|---|---|---|---|---|---|---|\n")
SECTION = "## Standing regression rows (tools/regress.py, best-of-N)"


def _run(cmd: list[str], timeout: int) -> str:
    p = subprocess.run(cmd, capture_output=True, text=True,
                       timeout=timeout, cwd=ROOT)
    if p.returncode != 0:
        raise RuntimeError(f"{cmd} failed rc={p.returncode}:\n"
                           f"{p.stdout[-2000:]}\n{p.stderr[-2000:]}")
    return p.stdout


def _last_json_line(out: str, prefix: str = "") -> dict:
    for line in reversed(out.splitlines()):
        line = line.strip()
        if prefix and line.startswith(prefix):
            return json.loads(line[len(prefix):])
        if not prefix and line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no JSON line (prefix={prefix!r}) in output")


def _append_row(path: str, row: str) -> None:
    with open(path) as f:
        body = f.read()
    if SECTION not in body:
        body = body.rstrip() + f"\n\n{SECTION}\n\n{HEADER}"
    lines = body.rstrip() + "\n" + row + "\n"
    with open(path, "w") as f:
        f.write(lines)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-e2e", action="store_true")
    ap.add_argument("--skip-bench", action="store_true")
    ap.add_argument("--skip-kernel", action="store_true")
    ap.add_argument("--index-dir", default="/tmp/trec_idx")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--note", default="")
    ap.add_argument("--no-append", action="store_true",
                    help="print the row, do not touch the md files")
    args = ap.parse_args()

    bench = kernel = e2e = None
    if not args.skip_bench:
        env = dict(os.environ, SPARK_GRAFT_BENCH_REPS=str(args.reps))
        p = subprocess.run([sys.executable, "bench.py"],
                           capture_output=True, text=True,
                           timeout=3600, cwd=ROOT, env=env)
        if p.returncode != 0:
            raise RuntimeError(f"bench.py failed:\n{p.stderr[-2000:]}")
        bench = _last_json_line(p.stdout)
        print(f"[bench] total={bench['value']}s "
              f"index_build={bench['queries']['index_build']}s "
              f"wand={bench['queries']['wand_topk']}s", flush=True)
    if not args.skip_kernel:
        out = _run([sys.executable, "tools/bench_scaling.py", "kernel",
                    "100000", "3", "12", str(args.reps)], 1800)
        kernel = _last_json_line(out)
        print(f"[kernel] speedup={kernel['speedup']} "
              f"eff={kernel['scaling_efficiency']}", flush=True)
    if not args.skip_e2e:
        out = _run([sys.executable, "tools/trec_e2e.py",
                    "--index-dir", args.index_dir,
                    "--out", "/tmp/trec_runs/regress.run"], 3600)
        e2e = _last_json_line(out, "RESULT ")
        print(f"[e2e] metrics={e2e['metrics']} "
              f"search_sec={e2e['search_sec']}", flush=True)

    def g(d, *keys, default="-"):
        for k in keys:
            if d is None:
                return default
            d = d.get(k) if isinstance(d, dict) else default
        return default if d is None else d

    date = datetime.date.today().isoformat()
    row = (f"| {date} | {g(bench, 'value')} "
           f"| {g(bench, 'queries', 'index_build')} "
           f"| {g(bench, 'queries', 'wand_topk')} "
           f"| {g(kernel, 'scaling_efficiency')} "
           f"| {g(e2e, 'metrics', 'MAP')} | {g(e2e, 'metrics', 'P@20')} "
           f"| {g(e2e, 'metrics', 'nDCG@20')} | {g(e2e, 'search_sec')} "
           f"| {args.note or '-'} |")
    print(row)
    if not args.no_append:
        _append_row(os.path.join(ROOT, "BENCH.md"), row)
        _append_row(os.path.join(ROOT, "BASELINE.md"), row)
        print("appended to BENCH.md and BASELINE.md")


if __name__ == "__main__":
    main()
