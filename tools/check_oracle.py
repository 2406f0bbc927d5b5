#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle check: compare Verify output
parquet against oracle_sql.json run in DuckDB over the raw testdata tables."""
import sys, os, json, glob
import duckdb
import math

def norm(v):
    if v is None: return None
    if isinstance(v, float):
        if math.isnan(v): return 'nan'
        return round(v, 6)
    return v

def rows_of(cur):
    cols = [d[0] for d in cur.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    data = cur.fetchall()
    rows = [tuple(norm(r[i]) for i in order) for r in data]
    return sorted(cols), sorted(rows, key=lambda t: tuple((x is None, str(x)) for x in t))

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    ok = fail = 0
    for name, sql in sorted(oracles.items()):
        rdir = f"{outdir}/{name}"
        if not os.path.isdir(rdir):
            print(f"FAIL {name}: no result dir"); fail += 1; continue
        try:
            got_cols, got = rows_of(con.execute(
                f"SELECT * FROM read_parquet('{rdir}/*.parquet')"))
            exp_cols, exp = rows_of(con.execute(sql))
        except Exception as e:
            print(f"FAIL {name}: {e}"); fail += 1; continue
        if got_cols != exp_cols:
            print(f"FAIL {name}: cols {got_cols} != {exp_cols}"); fail += 1; continue
        if got != exp:
            print(f"FAIL {name}: {len(got)} rows vs {len(exp)};")
            for i, (a, b) in enumerate(zip(got, exp)):
                if a != b:
                    print(f"  first diff at {i}: got={a} exp={b}"); break
            else:
                if len(got) != len(exp):
                    print(f"  got[0:2]={got[:2]} exp[0:2]={exp[:2]}")
            fail += 1; continue
        ok += 1
        print(f"OK   {name} ({len(got)} rows)")
    print(f"== {ok} ok, {fail} fail")
    return 1 if fail else 0

if __name__ == '__main__':
    sys.exit(main(sys.argv[1], sys.argv[2]))
