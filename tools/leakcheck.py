#!/usr/bin/env python3
"""Self-evidencing leak scan: greps the repo's source for non-public
references (internal package imports, private URLs/buckets, API keys,
slack links, suspicious env vars) and writes LEAKCHECK_self.json
stamped with the scan timestamp and the exact commit fingerprint it
ran against — so a clean artifact is verifiable as CURRENT (re-run it
at the named commit and diff) rather than a possibly-stale copy.

Usage: python3 tools/leakcheck.py [repo_root]
"""
import json
import re
import subprocess
import sys
import time
from pathlib import Path

# Rooted package imports (com./net./io./ai./org./…) that are not on the
# public allowlist are hits. Imports of local vals (e.g.
# `import spark.implicits._`) are fine and not rooted-package-shaped.
# org.json4s is allowlisted: it is a public open-source library that
# SHIPS IN Spark's own jars (/opt/spark/jars/json4s-*) — Bench uses it
# to parse the prior round's bench_detail.json for the regression gate.
PUBLIC_IMPORT = re.compile(
    r"^\s*import\s+(?=(?:com|net|io|ai|dev|co|org)\.)"
    r"(?!org\.apache\.spark\b|org\.apache\.hadoop\b|org\.scalatest\b"
    r"|org\.scalacheck\b|org\.json4s\b)([A-Za-z_][\w.]*)")

PATTERNS = {
    # any URL that is not an Apache/Scala doc link or the reference's
    # own public data host (cited in Scaladoc provenance comments)
    "internal-url": re.compile(
        r"https?://(?!(?:spark|hadoop|www)\.apache\.org|www\.scala-lang\.org"
        r"|docs\.oracle\.com|www1\.mbrace\.or\.jp|boatrace\.jp"
        r"|github\.com|duckdb\.org|en\.wikipedia\.org)[\w.-]+"),
    "internal-bucket": re.compile(r"\b(?:s3a?|gs|wasbs?|abfss?)://[\w.-]+"),
    "slack-link": re.compile(r"slack\.com|app\.slack|#[a-z0-9-]*claude"),
    "api-key": re.compile(
        r"\b(?:AKIA[0-9A-Z]{16}|sk-[A-Za-z0-9]{20,}|ghp_[A-Za-z0-9]{30,}"
        r"|xox[baprs]-[A-Za-z0-9-]+)\b"),
    # covers the apply form AND the .get / .getOrElse accessor forms —
    # the old apply-only pattern let a get()-read of e.g. an AWS secret
    # variable pass silently. Scanned over code files only (see loop):
    # a variable NAME in prose cannot read an environment.
    "suspicious-env": re.compile(
        r'sys\.env(?:\.get(?:OrElse)?)?\s*\(\s*"'
        r'(?!SPARK_GRAFT_|SPARK_DRIVER_MEM")[A-Z][A-Z0-9_]*'),
}

SCAN_GLOBS = ["src/**/*.scala", "build.sbt", "project/*.sbt",
              "project/*.scala", "tools/*.py", "*.md"]


def git(root, *args):
    # cwd=root, not the process CWD: `python3 tools/leakcheck.py /path`
    # invoked from elsewhere must stamp THAT repo's commit/dirty flag,
    # or the artifact's "re-run at the named commit" verifiability lies
    return subprocess.run(["git", *args], capture_output=True,
                          text=True, cwd=root).stdout.strip()


def main(root):
    root = Path(root)
    hits = {"internal-import": []}
    for k in PATTERNS:
        hits[k] = []
    files = sorted({p for g in SCAN_GLOBS for p in root.glob(g)
                    if p.is_file()})
    for p in files:
        rel = str(p.relative_to(root))
        try:
            text = p.read_text(errors="replace")
        except OSError:
            continue
        for i, line in enumerate(text.splitlines(), 1):
            if rel.endswith(".scala"):
                m = PUBLIC_IMPORT.match(line)
                if m:
                    hits["internal-import"].append(
                        f"{rel}:{i}: {line.strip()[:120]}")
            for k, pat in PATTERNS.items():
                if k == "suspicious-env" and rel.endswith(".md"):
                    continue
                if pat.search(line):
                    hits[k].append(f"{rel}:{i}: {line.strip()[:120]}")
    artifact = {
        "commit": git(root, "rev-parse", "HEAD"),
        "dirty": bool(git(root, "status", "--porcelain")),
        "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "files_scanned": len(files),
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
    }
    out = root / "LEAKCHECK_self.json"
    out.write_text(json.dumps(artifact, indent=2) + "\n")
    print(f"{out}: {artifact['n_hits']} hits over "
          f"{artifact['files_scanned']} files @ {artifact['commit'][:12]}"
          f"{' (dirty)' if artifact['dirty'] else ''}")
    return 0 if artifact["n_hits"] == 0 else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "."))
