#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify),
runs the matching oracle SQL from oracle_sql.json in DuckDB over the
same sf tables, sorts columns by name and rows by value, and diffs.
"""
import json
import os
import sys
import zlib

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def t08_compression_ratio(con, sfdir):
    """Python oracle for t08 (deflate compression-ratio quality
    signal): DuckDB has no deflate, but zlib recomputes the engine's
    java.util.zip.Deflater(6) byte counts value-exactly — both are
    the canonical zlib stream (level 6, windowBits 15, memLevel 8,
    default strategy), so n_compressed matches byte-for-byte and the
    ratio is the identical IEEE division."""
    df = con.execute(
        f"SELECT doc_id, text FROM read_parquet('{sfdir}/documents.parquet')"
        " ORDER BY doc_id").fetchdf()
    rows = []
    for doc_id, text in zip(df["doc_id"], df["text"]):
        raw = ("" if text is None else text).encode("utf-8")
        z = len(zlib.compress(raw, 6))
        rows.append((doc_id, len(raw), z,
                     0.0 if len(raw) == 0 else z / len(raw)))
    out = pd.DataFrame(
        rows, columns=["doc_id", "n_bytes", "n_compressed",
                       "compression_ratio"])
    out["doc_id"] = out["doc_id"].astype("int64")
    out["n_bytes"] = out["n_bytes"].astype("int32")
    out["n_compressed"] = out["n_compressed"].astype("int32")
    return out


# Oracles whose expected frame is computed in Python rather than
# DuckDB SQL (non-SQL-expressible semantics with an exact public
# recomputation). Checked with the same norm/compare as SQL oracles.
PYTHON_ORACLES = {"t08_compression_ratio": t08_compression_ratio}

# zlib-implementation pin for t08: the byte-exact claim holds for
# stock madler zlib on BOTH sides (CPython's bundled zlib vs the
# JRE's). A zlib-ng-linked CPython or an exotic JRE produces
# different (still valid) streams, which would surface as
# environment-dependent false FAILs — so self-check a known vector
# once and, on divergence, drop t08's byte-exact oracle with a
# loud note instead of reporting a bogus failure.
# 60 bytes: verified identical for CPython zlib.compress(·, 6) and
# java.util.zip.Deflater(6) on this container's stock zlib.
_ZLIB_PIN = (b"the quick brown fox jumps over the lazy dog " * 20, 60)


def _zlib_pinned():
    import zlib
    return len(zlib.compress(_ZLIB_PIN[0], 6)) == _ZLIB_PIN[1]


def norm(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    with open(f"{outdir}/oracle_sql.json") as f:
        oracle = json.load(f)
    # Python-computed oracles join the pool whenever Verify dumped
    # the query's result (subset runs may omit it).
    py = {name: fn for name, fn in PYTHON_ORACLES.items()
          if os.path.isdir(f"{outdir}/{name}")}
    if py and not _zlib_pinned():
        print("NOTE python zlib diverges from the pinned stock-zlib "
              "stream (zlib-ng?) — t08's byte-exact oracle skipped on "
              "this environment")
        py = {}
    n_ok = n_fail = 0
    for name in sorted(set(oracle) | set(py)):
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").fetchdf()
            exp = (py[name](con, sfdir) if name in py
                   else con.execute(oracle[name]).fetchdf())
            got, exp = norm(got), norm(exp)
            if list(got.columns) != list(exp.columns):
                print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
                n_fail += 1
                continue
            if got.shape != exp.shape:
                print(f"FAIL {name}: shape {got.shape} != {exp.shape}")
                n_fail += 1
                continue
            # dtype report (informational — the driver may compare types)
            dt = [(c, str(got[c].dtype), str(exp[c].dtype))
                  for c in got.columns if str(got[c].dtype) != str(exp[c].dtype)]
            diff_cols = []
            for c in got.columns:
                a, b = got[c], exp[c]
                if not a.equals(b):
                    try:
                        eq = (a == b) | (a.isna() & b.isna())
                        if not eq.all():
                            diff_cols.append(c)
                    except Exception:
                        diff_cols.append(c)
            if diff_cols:
                print(f"FAIL {name}: value diff in {diff_cols}")
                for c in diff_cols[:2]:
                    m = ~((got[c] == exp[c]) | (got[c].isna() & exp[c].isna()))
                    print(f"  {c} first diffs:\n    got {got[c][m].head(3).tolist()}"
                          f"\n    exp {exp[c][m].head(3).tolist()}")
                n_fail += 1
            else:
                extra = f" (dtype diff: {dt})" if dt else ""
                print(f"OK   {name}: {got.shape[0]} rows{extra}")
                n_ok += 1
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
    print(f"\n{n_ok} ok, {n_fail} fail, "
          f"{len(set(oracle) | set(py))} with oracle "
          f"({len(py)} python-computed)")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
