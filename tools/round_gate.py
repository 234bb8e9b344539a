#!/usr/bin/env python3
"""End-of-round artifact gate (round-12, verdict 6: round 11 ended on
a red BENCH artifact committed as the round's record; round-13,
verdict 2: two straight rounds committed COVERAGE.md prose numbers
that contradicted the committed bench_detail.json).

Run before the round closes:

    python3 tools/round_gate.py

Checks every committed round artifact the next judge/round reads and
exits nonzero with a reason if any would stamp a red or stale state:

  * bench_detail.json — errors, regressions, tripped suite drift,
    and unused accept names must all be empty/false;
  * COVERAGE.md — its machine-readable bench marker AND every
    "suite total <N> s" prose claim must match bench_detail.json
    (the round-11/12 failure mode: prose citing an intra-round run
    that is not the committed evidence);
  * BENCH_adopt_r*.json (latest) — adopt_regressions must be empty;
  * SCALE_r*.json (latest, if present) — must parse non-empty;
    duplicate (query, factor) rows are deduped keeping the LAST
    occurrence (re-runs append) and reported, so a stale row can
    never silently shadow a fresh one.

The driver stamps BENCH_r{N}.json itself; this gate cannot veto that
commit, but a green bench_detail at round end is the same run the
driver re-executes, so a green local gate is the strongest available
predictor that the round's record is green.

ROUND_GATE_REPO overrides the repo root (spec harness only).
"""
import glob
import json
import os
import re
import subprocess
import sys

REPO = os.environ.get(
    "ROUND_GATE_REPO",
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fail(msg):
    print(f"ROUND GATE RED: {msg}")
    sys.exit(1)


def round_key(path):
    # the round number lives in the BASENAME; matching the full path
    # would latch onto any r<digits> directory segment and degrade
    # the 'latest round' selection to glob order (round-12 advice)
    m = re.search(r"r(\d+)", os.path.basename(path))
    return int(m.group(1)) if m else -1


def coverage_claim_errors(bd):
    """COVERAGE.md's bench-claim mismatches vs one bench_detail dict.

    Two layers:
      1. a REQUIRED marker line
         `<!-- bench: total_sec=<N> n_queries=<N> drift_ratio=<N> -->`
         that must equal bench_detail.json (total within 0.05 s,
         ratio within 0.005 — the artifact's own print precision);
      2. every prose phrase `suite total <N> s` must be within 0.15 s
         of the artifact's total (catches a stale narrative number
         even when the marker was dutifully updated).

    Returns a list of error strings (empty = consistent) so the caller
    can retry the same checks against the COMMITTED artifact before
    going red (see committed_bench_detail).
    """
    cov_path = os.path.join(REPO, "COVERAGE.md")
    if not os.path.exists(cov_path):
        return ["COVERAGE.md missing"]
    cov = open(cov_path).read()
    m = re.search(
        r"<!--\s*bench:\s*total_sec=([\d.]+)\s+n_queries=(\d+)"
        r"\s+drift_ratio=([\d.]+|none)\s*-->", cov)
    if not m:
        return ["COVERAGE.md lacks the bench marker line "
                "'<!-- bench: total_sec=… n_queries=… drift_ratio=… -->' "
                "— add it next to the perf note so this gate can verify "
                "the prose against bench_detail.json"]
    errs = []
    total, nq = float(m.group(1)), int(m.group(2))
    bd_total = bd.get("total_sec")
    bd_nq = bd.get("n_queries")
    drift = (bd.get("suite_drift") or {}).get("ratio")
    if bd_total is None or abs(total - bd_total) > 0.05:
        errs.append(f"COVERAGE.md bench marker total_sec={total} != "
                    f"bench_detail total_sec={bd_total}")
    if nq != bd_nq:
        errs.append(f"COVERAGE.md bench marker n_queries={nq} != "
                    f"bench_detail n_queries={bd_nq}")
    if m.group(3) != "none":
        if drift is None or abs(float(m.group(3)) - drift) > 0.005:
            errs.append(f"COVERAGE.md bench marker drift_ratio={m.group(3)}"
                        f" != bench_detail suite_drift.ratio={drift}")
    elif drift is not None:
        errs.append(f"COVERAGE.md bench marker drift_ratio=none but "
                    f"bench_detail records suite_drift.ratio={drift}")
    if bd_total is not None:
        for claim in re.finditer(r"suite total ([\d.]+)\s*s", cov):
            v = float(claim.group(1))
            if abs(v - bd_total) > 0.15:
                errs.append(
                    f"COVERAGE.md prose claims 'suite total {v} s' but the "
                    f"committed bench_detail.json records {bd_total} s — "
                    f"update the prose to the committed artifact (the "
                    f"round-11/12 doc-vs-evidence failure)")
    return errs


def committed_bench_detail():
    """bench_detail.json as committed at HEAD, or None.

    Round-14 fix (round-13 verdict 3): the driver's post-snapshot
    bench overwrites the WORKING-TREE bench_detail.json at round open,
    so a marker that faithfully matches the committed evidence read as
    red through no builder fault. When the working-tree artifact
    disagrees with COVERAGE.md, the gate retries against the committed
    copy: marker == HEAD artifact means only an uncommitted re-stamp
    is pending (green with a loud note). If the new bench is later
    committed without re-stamping the marker, HEAD disagrees too and
    the gate goes red — the fallback cannot launder a stale marker
    past a round close, because closing commits the artifact.
    """
    try:
        out = subprocess.run(
            ["git", "-C", REPO, "show", "HEAD:bench_detail.json"],
            capture_output=True, text=True, timeout=30)
        if out.returncode == 0 and out.stdout.strip():
            return json.loads(out.stdout)
    except Exception:
        pass
    return None


def check_coverage_claims(bd):
    errs = coverage_claim_errors(bd)
    if not errs:
        return
    head_bd = committed_bench_detail()
    if head_bd is not None and not coverage_claim_errors(head_bd):
        print("NOTE: working-tree bench_detail.json disagrees with "
              "COVERAGE.md, but the marker matches the COMMITTED "
              "artifact at HEAD — a post-snapshot driver re-stamp is "
              "pending. Green at round open; re-stamp the COVERAGE "
              "marker before committing the new bench_detail.")
        return
    fail(errs[0])


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
    # attributed trips stay green (the confirmation-time probe showed
    # the HOST slowed, not the query — round-14 q66) but must be
    # loudly visible in the round record, never silent
    for a in bd.get("attributed_regressions") or []:
        print(f"NOTE: {a['name']} tripped the per-query gate "
              f"({a['prev_sec']}s -> {a['cur_sec']}s) but was attributed "
              f"to confirmation-time host load (probe ratio "
              f"{a['probe_ratio']}x); anchor carried unchanged")

    check_coverage_claims(bd)

    adopts = sorted(glob.glob(os.path.join(REPO, "BENCH_adopt_r*.json")),
                    key=round_key)
    if adopts:
        ad = json.load(open(adopts[-1]))
        if ad.get("adopt_regressions"):
            fail(f"{os.path.basename(adopts[-1])} has adopt regressions: "
                 f"{[r['name'] for r in ad['adopt_regressions']]}")

    scales = sorted(glob.glob(os.path.join(REPO, "SCALE_r*.json")),
                    key=round_key)
    dupes = 0
    if scales:
        with open(scales[-1]) as f:
            rows = [json.loads(l) for l in f if l.strip()]
        if not rows:
            fail(f"{os.path.basename(scales[-1])} is empty")
        # keep-last dedupe on (query, factor): ScaleCheck APPENDS, so a
        # re-run leaves stale siblings in the file; last wins, and the
        # count is surfaced so a re-stamp is a visible event
        seen = {}
        for r in rows:
            seen[(r.get("query"), r.get("factor"))] = r
        dupes = len(rows) - len(seen)
        if dupes:
            print(f"NOTE {os.path.basename(scales[-1])}: {dupes} stale "
                  f"duplicate (query, factor) rows superseded by later "
                  f"re-runs (kept last of each)")

    n = bd.get("n_queries")
    print(f"ROUND GATE GREEN: bench_detail {n} queries, "
          f"total {bd.get('total_sec')}s, drift "
          f"{(drift.get('ratio') if drift else None)}; "
          f"COVERAGE.md claims consistent; "
          f"{os.path.basename(adopts[-1]) if adopts else 'no adopt file'}"
          f" clean; "
          f"{os.path.basename(scales[-1]) if scales else 'no scale file'}"
          f" parses")
    return 0


if __name__ == "__main__":
    sys.exit(main())
