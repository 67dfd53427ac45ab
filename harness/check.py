#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 harness/check.py <sfDir> <verifyOutDir>

For each query dir under <verifyOutDir> (written by graft.Verify):
  - read the Spark result parquet with DuckDB
  - run the matching SQL from oracle_sql.json against the sfDir tables
  - compare: column names (sorted), row count, and a hash over
    sorted-rows x sorted-columns stringified values.

Exit code 0 iff everything matches. Run this BEFORE declaring any qid.
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(v):
    """Canonical string for a value — float-tolerant, container-recursive."""
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # 12 significant digits: catches real mismatches, forgives ulps
        return f"{v:.12g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon(x)}" for k, x in sorted(v.items())) + "}"
    return str(v)


def frame(rel):
    cols = rel.columns
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = [tuple(canon(r[i]) for i in order) for r in rel.fetchall()]
    return sorted(cols), sorted(rows)


def main():
    sf_dir, out_dir = Path(sys.argv[1]), Path(sys.argv[2])
    con = duckdb.connect()
    for t in TABLES:
        p = sf_dir / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads((out_dir / "oracle_sql.json").read_text())

    failures, passed, rows_only = [], 0, 0
    qdirs = sorted(d for d in out_dir.iterdir() if d.is_dir())
    for qdir in qdirs:
        name = qdir.name
        spark_rel = con.sql(f"SELECT * FROM read_parquet('{qdir}/*.parquet')")
        # The DRIVER's harness sorts rows with pandas, which cannot hash
        # ARRAY/MAP/STRUCT values -> the query goes red there even when the
        # answers match. Enforce scalar-only declared outputs HERE, hard.
        # anchored on the DuckDBPyType id so a future scalar type whose
        # rendered name merely CONTAINS one of these can't false-positive
        def is_container(t) -> bool:
            tid = getattr(t, "id", "")
            if tid in ("list", "map", "struct", "array", "union"):
                return True
            # fallback for duckdb builds without .id: anchor the pattern
            s = str(t)
            return s.endswith("[]") or any(
                s.startswith(k) for k in ("MAP(", "STRUCT(", "UNION("))
        bad_cols = [
            c for c, t in zip(spark_rel.columns, spark_rel.types)
            if is_container(t)
        ]
        if bad_cols:
            failures.append((name, f"container-typed output columns {bad_cols}"))
            print(f"  {name}: CONTAINER-OUTPUT {bad_cols} (driver would go red)")
            continue
        s_cols, s_rows = frame(spark_rel)
        if name not in oracle:
            status = "rows-only"
            if len(s_rows) == 0 and name != "_allow_empty":
                failures.append((name, "rows-only check: 0 rows"))
                status = "EMPTY"
            else:
                rows_only += 1
            print(f"  {name}: {status} ({len(s_rows)} rows)")
            continue
        try:
            o_rel = con.sql(oracle[name])
            # The DRIVER hashes oracle output via pandas, where DuckDB's
            # int128 (HUGEINT/UHUGEINT — e.g. any un-CAST sum(BIGINT))
            # renders differently from Spark's int64 -> hash-fail on the
            # driver even when values match. canon() here hides that, so
            # enforce the CAST(sum(..) AS BIGINT) convention hard.
            huge_cols = [
                c for c, t in zip(o_rel.columns, o_rel.types)
                if str(t) in ("HUGEINT", "UHUGEINT")
            ]
            if huge_cols:
                failures.append(
                    (name, f"HUGEINT oracle output columns {huge_cols} "
                           "(driver would hash-fail; CAST(.. AS BIGINT))"))
                print(f"  {name}: HUGEINT-ORACLE {huge_cols} (driver would go red)")
                continue
            o_cols, o_rows = frame(o_rel)
        except Exception as e:
            failures.append((name, f"oracle SQL error: {e}"))
            print(f"  {name}: ORACLE-SQL-ERROR {e}")
            continue
        if s_cols != o_cols:
            failures.append((name, f"columns spark={s_cols} oracle={o_cols}"))
            print(f"  {name}: COLUMN-MISMATCH spark={s_cols} oracle={o_cols}")
        elif len(s_rows) != len(o_rows):
            failures.append((name, f"rowcount spark={len(s_rows)} oracle={len(o_rows)}"))
            print(f"  {name}: ROWCOUNT spark={len(s_rows)} oracle={len(o_rows)}")
        elif s_rows != o_rows:
            diff_s = [r for r in s_rows if r not in set(o_rows)][:3]
            diff_o = [r for r in o_rows if r not in set(s_rows)][:3]
            failures.append((name, f"values spark-only={diff_s} oracle-only={diff_o}"))
            print(f"  {name}: VALUE-MISMATCH\n    spark-only: {diff_s}\n    oracle-only: {diff_o}")
        else:
            passed += 1
            print(f"  {name}: OK ({len(s_rows)} rows)")

    declared = set(oracle) - {d.name for d in qdirs}
    for name in declared:
        failures.append((name, "oracle declared but no query output"))

    print(f"\n{passed} oracle-pass, {rows_only} rows-only, {len(failures)} failures")
    if failures:
        for n, msg in failures:
            print(f"FAIL {n}: {msg}")
        sys.exit(1)


if __name__ == "__main__":
    main()
