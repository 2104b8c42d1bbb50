#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Runs each oracle SQL from <outDir>/oracle_sql.json in DuckDB against the
testdata parquet tables, loads the Spark-written parquet result from
<outDir>/<name>/, canonicalizes both (columns sorted by name, rows sorted),
and compares values exactly (with a float near-miss report).

Usage: python3 tools/oracle_check.py <sfDir> <outDir>
(Driver-side python deps only — never imported by the Scala library.)
"""
import json, math, sys, glob

import duckdb
import pyarrow.parquet as pq


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    def key(t):
        return tuple((v is None, str(type(v)), str(v)) for v in t)
    return sorted(out, key=key), [cols[i] for i in order]


def norm_val(v):
    # make arrow / duckdb values comparable
    if hasattr(v, "tolist"):
        v = v.tolist()
    if isinstance(v, float) and v.is_integer():
        return v
    return v


def approx_eq(a, b):
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-12)
    if isinstance(a, (list, tuple)) and isinstance(b, (list, tuple)):
        return len(a) == len(b) and all(approx_eq(x, y) for x, y in zip(a, b))
    return a == b


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    no_oracle = []
    import os
    produced = {os.path.basename(p) for p in glob.glob(f"{out_dir}/*") if os.path.isdir(p)}
    for name in sorted(produced):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output parquet")
            n_fail += 1
            continue
        tbl = pq.read_table(files[0])
        spark_cols = tbl.column_names
        spark_rows = [tuple(norm_val(v) for v in row) for row in
                      zip(*[tbl.column(c).to_pylist() for c in spark_cols])] if tbl.num_rows else []
        if name not in oracle:
            no_oracle.append((name, tbl.num_rows))
            continue
        try:
            res = con.execute(oracle[name])
            duck_cols = [d[0] for d in res.description]
            duck_rows = [tuple(norm_val(v) for v in r) for r in res.fetchall()]
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        sc = sorted(spark_cols)
        dc = sorted(duck_cols)
        if sc != dc:
            print(f"FAIL {name}: columns differ spark={sc} duck={dc}")
            n_fail += 1
            continue
        s_rows, _ = canon(spark_rows, spark_cols)
        d_rows, _ = canon(duck_rows, duck_cols)
        if len(s_rows) != len(d_rows):
            print(f"FAIL {name}: rowcount spark={len(s_rows)} duck={len(d_rows)}")
            n_fail += 1
            continue
        exact = s_rows == d_rows
        if exact:
            print(f"PASS {name} ({len(s_rows)} rows)")
            n_pass += 1
        else:
            near = all(approx_eq(a, b) for sr, dr in zip(s_rows, d_rows)
                       for a, b in zip(sr, dr))
            if near:
                print(f"NEAR {name}: float-only differences ({len(s_rows)} rows) — "
                      f"exact-hash compare would FAIL")
                for sr, dr in zip(s_rows, d_rows):
                    if sr != dr:
                        print(f"   spark={sr}\n   duck ={dr}")
                        break
                n_fail += 1
            else:
                print(f"FAIL {name}: value mismatch")
                shown = 0
                for sr, dr in zip(s_rows, d_rows):
                    if sr != dr and shown < 3:
                        print(f"   spark={sr}\n   duck ={dr}")
                        shown += 1
                n_fail += 1
    for name, rows in no_oracle:
        print(f"ROWS {name}: no oracle, rows={rows}")
    print(f"\n{n_pass} pass, {n_fail} fail, {len(no_oracle)} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
