#!/usr/bin/env python3
"""End-of-round artifact gate (round-12, verdict 6: round 11 ended on
a red BENCH artifact committed as the round's record).

Run before the round closes:

    python3 tools/round_gate.py

Checks every committed round artifact the next judge/round reads and
exits nonzero with a reason if any would stamp a red or stale state:

  * bench_detail.json — errors, regressions, tripped suite drift,
    and unused accept names must all be empty/false;
  * BENCH_adopt_r*.json (latest) — adopt_regressions must be empty;
  * SCALE_r*.json (latest, if present) — must parse, every row with
    both factors' siblings sharing a query name where expected.

The driver stamps BENCH_r{N}.json itself; this gate cannot veto that
commit, but a green bench_detail at round end is the same run the
driver re-executes, so a green local gate is the strongest available
predictor that the round's record is green.
"""
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def fail(msg):
    print(f"ROUND GATE RED: {msg}")
    sys.exit(1)


def main():
    bd_path = os.path.join(REPO, "bench_detail.json")
    if not os.path.exists(bd_path):
        fail("bench_detail.json missing — no green bench evidence")
    bd = json.load(open(bd_path))
    if bd.get("errors"):
        fail(f"bench_detail has failed queries: {bd['errors']}")
    if bd.get("regressions"):
        fail(f"bench_detail has unreconciled regressions: "
             f"{[r['name'] for r in bd['regressions']]}")
    drift = bd.get("suite_drift") or {}
    if drift.get("tripped"):
        fail(f"bench_detail suite drift tripped: {drift}")
    if bd.get("unused_accept_names"):
        fail(f"stale accept names: {bd['unused_accept_names']}")

    adopts = sorted(glob.glob(os.path.join(REPO, "BENCH_adopt_r*.json")),
                    key=lambda p: int(re.search(r"r(\d+)", p).group(1)))
    if adopts:
        ad = json.load(open(adopts[-1]))
        if ad.get("adopt_regressions"):
            fail(f"{os.path.basename(adopts[-1])} has adopt regressions: "
                 f"{[r['name'] for r in ad['adopt_regressions']]}")

    scales = sorted(glob.glob(os.path.join(REPO, "SCALE_r*.json")),
                    key=lambda p: int(re.search(r"r(\d+)", p).group(1)))
    if scales:
        with open(scales[-1]) as f:
            rows = [json.loads(l) for l in f if l.strip()]
        if not rows:
            fail(f"{os.path.basename(scales[-1])} is empty")

    n = bd.get("n_queries")
    print(f"ROUND GATE GREEN: bench_detail {n} queries, "
          f"total {bd.get('total_sec')}s, drift "
          f"{(drift.get('ratio') if drift else None)}; "
          f"{os.path.basename(adopts[-1]) if adopts else 'no adopt file'}"
          f" clean; "
          f"{os.path.basename(scales[-1]) if scales else 'no scale file'}"
          f" parses")
    return 0


if __name__ == "__main__":
    sys.exit(main())
