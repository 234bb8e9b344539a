#!/usr/bin/env python3
"""Generate the committed t08 expected-bytes fixture (round-13,
verdict 4: the driver's correctness harness runs only DuckDB SQL, so
t08's deflate check stayed `no_oracle` in the driver's artifact for
two rounds even though this repo's check_oracle.py verifies it
byte-exactly with Python zlib).

The fix: pin zlib's deflate(level 6) byte count per document as a
COMMITTED resource (src/main/resources/graft/t08/<sf>.csv), generated
HERE by CPython's zlib — the independent implementation, NOT the
engine's java.util.zip.Deflater, so the fixture is an oracle, not an
echo. graft.Verify dumps the resource matching its sfDir basename as
`<outDir>/t08_expected/` parquet and t08's oracle SQL joins documents
against it in plain DuckDB — giving the driver's gate real booleans.

The two implementations produce identical streams for stock madler
zlib (level 6, windowBits 15, memLevel 8, default strategy) — the
same pin check_oracle.py self-verifies before using its Python
oracle. Regenerate whenever the documents fixture changes:

    python3 tools/gen_t08_fixture.py
"""
import os
import sys
import zlib

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "src", "main", "resources", "graft", "t08")
SFS = ["sf0.001", "sf0.01", "sf0.1"]

# the same stock-zlib pin as check_oracle.py: refuse to generate a
# fixture from a zlib-ng-linked CPython whose streams differ
_PIN = (b"the quick brown fox jumps over the lazy dog " * 20, 60)
if len(zlib.compress(_PIN[0], 6)) != _PIN[1]:
    print("FATAL: this Python's zlib diverges from the pinned stock-zlib "
          "stream — fixture would not match java.util.zip.Deflater")
    sys.exit(1)

os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()
for sf in SFS:
    src = f"/root/testdata/{sf}/documents.parquet"
    if not os.path.exists(src):
        print(f"skip {sf}: {src} missing")
        continue
    df = con.execute(
        f"SELECT doc_id, text FROM read_parquet('{src}') ORDER BY doc_id"
    ).fetchall()
    path = os.path.join(OUT, f"{sf}.csv")
    with open(path, "w") as f:
        f.write("doc_id,n_compressed\n")
        for doc_id, text in df:
            raw = ("" if text is None else text).encode("utf-8")
            f.write(f"{doc_id},{len(zlib.compress(raw, 6))}\n")
    print(f"wrote {path}: {len(df)} rows")
