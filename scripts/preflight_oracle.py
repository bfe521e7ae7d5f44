#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate (SURVEY §5.2.1).

Usage: python3 scripts/preflight_oracle.py <sfDir> <outDir>

Runs after `graft.Verify <sfDir> <outDir>`: executes each oracle_sql.json
entry in DuckDB over the same parquet tables and compares against the
parquet that Verify wrote — column names (sorted), arrow types, and exact
values in row order. Exits nonzero if any oracle-bearing query mismatches.
"""
import json
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    # bytes (md5 on some engines) → str for stable compare
    if isinstance(v, bytes):
        return v.decode("utf-8", "replace")
    return v


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    names = sorted(p.name for p in Path(out_dir).iterdir() if p.is_dir())
    n_pass = n_fail = n_noop = 0
    for name in names:
        spark_tbl = con.execute(
            f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").arrow()
        if name not in oracle:
            n_noop += 1
            print(f"[no-oracle] {name}: rows={spark_tbl.num_rows}")
            continue
        try:
            duck_tbl = con.execute(oracle[name]).arrow()
        except Exception as e:
            n_fail += 1
            print(f"[FAIL] {name}: oracle SQL error: {e}")
            continue
        ok = True
        s_cols, d_cols = sorted(spark_tbl.column_names), sorted(duck_tbl.column_names)
        if s_cols != d_cols:
            print(f"[FAIL] {name}: columns spark={s_cols} duck={d_cols}")
            ok = False
        elif spark_tbl.num_rows != duck_tbl.num_rows:
            print(f"[FAIL] {name}: rows spark={spark_tbl.num_rows} duck={duck_tbl.num_rows}")
            ok = False
        else:
            for c in s_cols:
                st, dt = spark_tbl.column(c).type, duck_tbl.column(c).type
                if str(st) != str(dt):
                    print(f"[FAIL] {name}.{c}: type spark={st} duck={dt}")
                    ok = False
            if ok:
                for c in s_cols:
                    sv = [norm(v) for v in spark_tbl.column(c).to_pylist()]
                    dv = [norm(v) for v in duck_tbl.column(c).to_pylist()]
                    if sv != dv:
                        bad = next(i for i in range(len(sv)) if sv[i] != dv[i])
                        print(f"[FAIL] {name}.{c}: first diff at row {bad}: "
                              f"spark={sv[bad]!r} duck={dv[bad]!r}")
                        ok = False
                        break
        if ok:
            n_pass += 1
            print(f"[pass] {name} rows={spark_tbl.num_rows}")
        else:
            n_fail += 1
    missing = sorted(set(oracle) - set(names))
    for m in missing:
        n_fail += 1
        print(f"[FAIL] {m}: oracle declared but Verify wrote no output")
    print(f"== {n_pass} pass, {n_fail} fail, {n_noop} oracle-omitted ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
