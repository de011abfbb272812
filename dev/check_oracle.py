#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify first,
then this script compares each <out>/<name>/ parquet against DuckDB running
the matching oracle_sql.json entry over the raw sf tables.

Usage: python3 dev/check_oracle.py [sf_dir] [verify_out_dir]
"""
import sys, json, math
import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))

def canon(cols, rows):
    # fetchall (not fetch_df) so SQL NULL stays None and a float NaN stays
    # nan — pandas would collapse both to NaN. NaN then canonicalizes to a
    # distinct sentinel so NaN-vs-NULL divergences fail the compare.
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple("NaN" if (isinstance(r[i], float) and math.isnan(r[i]))
                 else (tuple(r[i]) if isinstance(r[i], list) else r[i])
                 for i in order) for r in rows]
    return sorted(cols), sorted(
        out, key=lambda r: tuple((v is None, str(v)) for v in r))

n_pass = n_fail = 0
for name in sorted(oracle):
    sql = oracle[name]
    try:
        cur = con.execute(
            f"SELECT * FROM read_parquet('{OUT}/{name}/*.parquet')")
        got_cols = [d[0] for d in cur.description]
        got_rows = cur.fetchall()
        cur = con.execute(sql)
        exp_cols = [d[0] for d in cur.description]
        exp_rows = cur.fetchall()
    except Exception as e:
        print(f"FAIL {name}: exception {e}")
        n_fail += 1
        continue
    # Emulate the driver harness, which fetches via pandas, sorts rows by
    # every column (crashes on array/struct cells), and hashes the string
    # form of each cell (int32 1234 and int64 1234 both read "1234", but a
    # DuckDB HUGEINT arrives as float64 and reads "1234.0" — hash mismatch
    # even when values are numerically equal).
    try:
        gdf = con.execute(
            f"SELECT * FROM read_parquet('{OUT}/{name}/*.parquet')").df()
        edf = con.execute(sql).df()
        gdf = gdf[sorted(gdf.columns)].sort_values(by=sorted(gdf.columns))
        edf = edf[sorted(edf.columns)].sort_values(by=sorted(edf.columns))
        gstr = [tuple(map(str, r)) for r in gdf.itertuples(index=False)]
        estr = [tuple(map(str, r)) for r in edf.itertuples(index=False)]
        if sorted(gstr) != sorted(estr):
            diff = next(((a, b) for a, b in zip(sorted(gstr), sorted(estr))
                         if a != b),
                        ('<row-count>', f'{len(gstr)} vs {len(estr)} rows'))
            print(f"FAIL {name}: pandas-form mismatch; first diff "
                  f"got={diff[0]} exp={diff[1]}")
            n_fail += 1
            continue
    except Exception as e:
        print(f"FAIL {name}: driver-emulation exception {e}")
        n_fail += 1
        continue
    gc, gr = canon(got_cols, got_rows)
    ec, er = canon(exp_cols, exp_rows)
    if gc != ec:
        print(f"FAIL {name}: columns {gc} vs oracle {ec}")
        n_fail += 1
        continue
    if len(gr) != len(er):
        print(f"FAIL {name}: {len(gr)} rows vs oracle {len(er)}")
        n_fail += 1
        continue
    bad = [(a, b) for a, b in zip(gr, er) if a != b]
    if bad:
        print(f"FAIL {name}: {len(bad)}/{len(gr)} rows differ; first: "
              f"got={bad[0][0]} exp={bad[0][1]}")
        # float diagnostics
        for a, b in bad[:1]:
            for x, y, c in zip(a, b, gc):
                if x != y:
                    extra = ""
                    if isinstance(x, float) and isinstance(y, float):
                        extra = f" (reldiff={abs(x-y)/max(abs(y),1e-300):.2e})"
                    print(f"   col {c}: {x!r} vs {y!r}{extra}")
        n_fail += 1
    else:
        print(f"PASS {name} ({len(gr)} rows)")
        n_pass += 1

print(f"\n{n_pass} passed, {n_fail} failed of {len(oracle)}")
sys.exit(1 if n_fail else 0)
