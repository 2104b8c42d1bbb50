#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Runs each oracle SQL from <outDir>/oracle_sql.json in DuckDB against the
testdata parquet tables, loads the Spark-written parquet result from
<outDir>/<name>/, canonicalizes both (columns sorted by name, rows sorted),
and compares values exactly (with a float near-miss report).

Usage: python3 tools/oracle_check.py <sfDir> <outDir>
(Driver-side python deps only — never imported by the Scala library.)

Type parity (round 10): the official gate hashes Arrow values TYPE-sensitively,
so a value-equal but type-divergent column (e.g. DuckDB HUGEINT→decimal128
vs Spark int64, the w6 bug hidden for three rounds) must FAIL here too.
We fetch the DuckDB result as Arrow and compare normalized Arrow types
column-by-column; any decimal128/HUGEINT oracle column is an instant FAIL
with a "CAST the oracle" hint.
"""
import json, math, sys, glob

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq


def norm_type(t):
    """Normalize Arrow types to the PYTHON VALUE CLASS the official hash
    sees after .to_pylist(): every integer width → int, every float → float,
    string/large_string → str — but decimal stays decimal (Decimal != int,
    the exact divergence that kept w6 red for three rounds)."""
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_large_string(t) or pa.types.is_string(t):
        return "string"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{norm_type(t.value_type)}>"
    return str(t)


def type_parity(name, spark_schema, duck_schema):
    """Return list of human-readable type-mismatch strings (empty = parity)."""
    issues = []
    s_types = {f.name: f.type for f in spark_schema}
    d_types = {f.name: f.type for f in duck_schema}
    for col in sorted(set(s_types) & set(d_types)):
        st, dt = s_types[col], d_types[col]
        if pa.types.is_decimal(dt):
            issues.append(
                f"{col}: oracle emits {dt} (DuckDB HUGEINT/DECIMAL) vs spark {st}"
                f" — CAST the oracle column (e.g. AS BIGINT/DOUBLE)")
        elif norm_type(st) != norm_type(dt):
            issues.append(f"{col}: spark {st} vs duck {dt}")
    return issues


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
    print(f"duckdb {duckdb.__version__}, pyarrow {pa.__version__}")
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
            duck_tbl = con.execute(oracle[name]).fetch_arrow_table()
            duck_cols = duck_tbl.column_names
            duck_rows = [tuple(norm_val(v) for v in row) for row in
                         zip(*[duck_tbl.column(c).to_pylist() for c in duck_cols])] \
                if duck_tbl.num_rows else []
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
        t_issues = type_parity(name, tbl.schema, duck_tbl.schema)
        if t_issues:
            print(f"FAIL {name}: TYPE parity (official hash is type-sensitive):")
            for msg in t_issues:
                print(f"   {msg}")
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
