#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run Verify's parquet dumps
against the DuckDB oracle SQL and compare (column-name-sorted, row-sorted,
exact values). Usage: check.py <sfDir> <verifyOutDir> [query ...]"""
import sys, os, json, math
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in idx))
    return sorted(out, key=lambda t: tuple((x is None, str(type(x)), x) for x in t)), [cols[i] for i in idx]

def eq(a, b):
    if a is None and b is None: return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b): return True
        return a == b
    return a == b

def main():
    sf, out = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only: continue
        try:
            spark_rel = con.sql(f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')")
            s_rows, s_cols = canon(spark_rel.fetchall(), spark_rel.columns)
            duck_rel = con.sql(sql)
            d_rows, d_cols = canon(duck_rel.fetchall(), duck_rel.columns)
        except Exception as e:
            print(f"FAIL {name}: error {e}")
            n_bad += 1
            continue
        if s_cols != d_cols:
            print(f"FAIL {name}: schema spark={s_cols} duck={d_cols}")
            n_bad += 1
            continue
        # column TYPES must agree too: the driver's hash is type-sensitive
        # (e.g. BIGINT 5 vs DOUBLE 5.0, HUGEINT via arrow), while python value
        # comparison (5 == 5.0) would mask the divergence
        s_types = dict(zip(spark_rel.columns, map(str, spark_rel.types)))
        d_types = dict(zip(duck_rel.columns, map(str, duck_rel.types)))
        tdiff = {c: (s_types[c], d_types[c]) for c in s_types if s_types[c] != d_types.get(c)}
        if tdiff:
            print(f"FAIL {name}: column types differ {tdiff}")
            n_bad += 1
            continue
        if len(s_rows) != len(d_rows):
            print(f"FAIL {name}: rows spark={len(s_rows)} duck={len(d_rows)}")
            n_bad += 1
            continue
        bad = None
        for i, (sr, dr) in enumerate(zip(s_rows, d_rows)):
            if not all(eq(a, b) for a, b in zip(sr, dr)):
                bad = (i, sr, dr)
                break
        if bad:
            i, sr, dr = bad
            print(f"FAIL {name}: row {i} of {len(s_rows)} cols={d_cols}\n  spark={sr}\n  duck ={dr}")
            n_bad += 1
        else:
            print(f"ok   {name} ({len(s_rows)} rows)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail")
    sys.exit(1 if n_bad else 0)

main()
