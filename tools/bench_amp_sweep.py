"""Broadcast-amortization evidence (VERDICT r3 #7): the 2 -> 8
EXECUTOR ladder (local-cluster[2,4] vs local-cluster[8,4]) run at a
SWEEP of input amplifications, reporting efficiency vs amp.

Why: under local-cluster a broadcast relation is a real per-execution
serialize+send to every executor (free under local[N]); that fixed
cost shrinks relative to scan work as the input grows, so efficiency
vs amp is the direct measurement of "at production scan sizes the
broadcast amortizes". The 8->32-core step also rides the box's memory
-bus ceiling (~0.62, tools/bench_probe.py), so the curve's plateau —
not 1.0 — is the honest asymptote on this host.

Writes/replaces its own section in BENCH/BASELINE.md (the scaling
tool's keep-logic preserves any non-"## local" section, so the two
tools never clobber each other). Run with the box otherwise idle:
SCALING_ROUNDS independent ladder repeats, per-stage minima per level
(same shared-host defense as tools/bench_scaling.py).

Usage: python tools/bench_amp_sweep.py [sf_dir] [amp,amp,...]
"""

from __future__ import annotations

import json
import os
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO / "tools"))
sys.path.insert(0, str(REPO))

from bench_scaling import run_subprocess  # noqa: E402

MARKER = "## Broadcast amortization"


def best(runs: list[dict]) -> dict:
    out = dict(runs[0])
    for k in ("t_pip", "t_dissolve", "t_raster"):
        out[k] = min(r[k] for r in runs)
    out["total"] = round(out["t_pip"] + out["t_dissolve"]
                         + out["t_raster"], 3)
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    amps = ([int(a) for a in sys.argv[2].split(",")]
            if len(sys.argv) > 2 else [8, 32, 96])
    rounds = int(os.environ.get("SCALING_ROUNDS", "2"))
    rows = []
    for amp in amps:
        lo_runs, hi_runs = [], []
        for _ in range(rounds):
            # lo = 2 executors x 4 cores, hi = 8 executors x 4 cores
            lo_runs.append(run_subprocess(4, sf_dir, amp, 2))
            hi_runs.append(run_subprocess(4, sf_dir, amp, 8))
        lo, hi = best(lo_runs), best(hi_runs)
        eff = round(lo["total"] / (4.0 * hi["total"]), 3)
        pip_eff = round(lo["t_pip"] / (4.0 * hi["t_pip"]), 3)
        rows.append((amp, lo, hi, eff, pip_eff))
        print(json.dumps({"amp": amp, "eff": eff, "pip_eff": pip_eff,
                          "lo_total": lo["total"],
                          "hi_total": hi["total"]}))

    table = "\n".join(
        f"| x{amp} | {lo['docs']:,} | {lo['total']} | {hi['total']}"
        f" | {eff} | {pip_eff} |"
        for amp, lo, hi, eff, pip_eff in rows)
    section = f"""{MARKER}: amp vs efficiency, 2 -> 8 executors

local-cluster[2,4,mem] vs local-cluster[8,4,mem] (8 -> 32 cores, REAL
executor JVMs), same composite job as the ladder above, swept over
input amplification; {rounds} independent rounds, per-stage minima.
A broadcast is a fixed per-execution serialize+send per executor, so
efficiency must RISE with amp until the box's 8->32-core memory-bus
ceiling (~0.62 pure-JVM probe, ~0.72-0.81 pure-CPU probe) takes over
— the plateau, not 1.0, is this host's asymptote; on a real cluster
4x executors bring 4x memory channels.

| amp | docs | T_2exec (s) | T_8exec (s) | efficiency | PIP-stage eff |
|---|---|---|---|---|---|
{table}
"""
    md = REPO / "BENCH" / "BASELINE.md"
    text = md.read_text() if md.exists() else ""
    # replace any previous sweep section (ends at the next "## " or EOF)
    pat = re.compile(re.escape(MARKER) + r".*?(?=\n## |\Z)", re.DOTALL)
    if pat.search(text):
        text = pat.sub(section.rstrip() + "\n", text)
    else:
        text = text.rstrip() + "\n\n" + section
    md.write_text(text)
    print(f"wrote {md}")


if __name__ == "__main__":
    main()
