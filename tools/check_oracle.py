#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Loads each <name>.parquet written by graft.Verify, runs the matching SQL from
oracle_sql.json in DuckDB over the base tables of <sfDir>, canonicalizes both
(columns sorted by name, rows sorted, floats rounded) and reports per-query
match/mismatch.
"""
import json, sys, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = f"{v:.9g}"
            vals.append(str(v))
        out.append("|".join(vals))
    out.sort()
    return out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            got_rel = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got = canon(got_rel.fetchall(), got_rel.columns)
            want_rel = con.sql(sql)
            want = canon(want_rel.fetchall(), want_rel.columns)
            got_cols = sorted(c.lower() for c in got_rel.columns)
            want_cols = sorted(c.lower() for c in want_rel.columns)
            if got_cols != want_cols:
                print(f"FAIL {name}: columns {got_cols} vs {want_cols}")
                n_bad += 1
            elif got != want:
                extra = [r for r in got if r not in set(want)][:2]
                missing = [r for r in want if r not in set(got)][:2]
                print(f"FAIL {name}: rows {len(got)} vs {len(want)}; "
                      f"extra={extra} missing={missing}")
                n_bad += 1
            else:
                print(f"ok   {name} ({len(got)} rows)")
                n_ok += 1
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} failed")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
