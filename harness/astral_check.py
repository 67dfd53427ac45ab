#!/usr/bin/env python3
"""Non-BMP (astral) oracle-parity probe.

The driver fixtures are BMP-only, so they cannot catch a divergence
between the engine's hash kernels and the DuckDB recompute oracles on
SUPPLEMENTARY-plane text (emoji, rare CJK): DuckDB's unicode()/substr
are code-point addressed while a naive JVM charAt fold sees UTF-16
units — a surrogate pair would hash as two units on one side and one
code point on the other. The engine folds code points everywhere a
recompute oracle exists (FastSig.hashString, TextFunctions
.murmur3TokenHash, TextFunctions.winnow); this script PROVES it
end-to-end: clone sf0.001, inject astral documents (including planted
astral near-dup pairs that must survive banding), then run the
hash-sensitive qids through the standard Verify + check.py gate.

Usage: python3 harness/astral_check.py
"""
import shutil
import subprocess
import sys
from pathlib import Path

import duckdb

SRC = Path("/root/testdata/sf0.001")
DST = Path("/tmp/graft_astral_sf")
OUT = Path("/tmp/graft_astral_verify")
QIDS = ",".join([
    "dedup_simhash",          # murmur3TokenHash via simhash64
    "dedup_near_minhash",     # FastSig.hashString via hashedShingles
    "dedup_ngram_jaccard",    # text n-gram jaccard oracle
    "text_fingerprint",       # winnow kernel
    "text_containment",       # winnow-based containment
    "text_bpe_encode",        # code-point BPE kernel vs recursive CTE
    "text_bpe_train",         # code-point trainer loop vs recursive CTE
    "text_bpe_encode_trained",  # trained merges through the same kernel
    "text_langid_nb",         # code-point char-bigram features
])


def main():
    if DST.exists():
        shutil.rmtree(DST)
    shutil.copytree(SRC, DST)
    con = duckdb.connect()
    # astral rows: emoji-bearing docs, an exact astral copy pair, and a
    # one-token-jittered astral near-dup pair (must band-collide and
    # verify identically on both sides)
    base = "the 😀 fast 🚀 key order sort 😀😁😂 table scan merge part"
    near = "the 😀 fast 🚀 key order sort 😀😁😂 table scan merge zzz"
    cjkx = "\U00020BB7 plane two \U00020BB7\U00020BB7 ideographs mixed in"
    rows = [
        (900001, base, "en", "astral", len(base)),
        (900002, base, "en", "astral", len(base)),     # exact copy
        (900003, near, "en", "astral", len(near)),     # near dup
        (900004, cjkx, "en", "astral", len(cjkx)),
        (900005, "solo 😀 emoji doc unlike others", "en", "astral", 30),
    ]
    con.execute(
        "CREATE TABLE aug AS SELECT * FROM read_parquet(?)",
        [str(SRC / "documents.parquet")])
    con.executemany(
        "INSERT INTO aug VALUES (?, ?, ?, ?, ?)", rows)
    con.execute(
        f"COPY aug TO '{DST / 'documents.parquet'}' (FORMAT PARQUET)")
    print(f"fixture: {DST} (+{len(rows)} astral docs)")

    r = subprocess.run(
        ["sbt", "-batch",
         f"runMain graft.Verify {DST} {OUT} {QIDS}"],
        capture_output=True, text=True)
    tail = "\n".join(r.stdout.splitlines()[-3:])
    print(tail)
    if "failed=0" not in tail:
        print(r.stdout[-3000:], file=sys.stderr)
        sys.exit(1)
    sys.exit(subprocess.call(
        [sys.executable, "harness/check.py", str(DST), str(OUT)]))


if __name__ == "__main__":
    main()
