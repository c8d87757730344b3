#!/usr/bin/env python3
"""Local pre-validation of SparkEntry oracles, mimicking the driver's
t2 check: run graft.Verify output (parquet per query + oracle_sql.json)
against DuckDB over the same testdata tables, compare exactly.

The Spark side is read RAW via pyarrow — NOT through DuckDB. The round-9
14-query hash-red class existed precisely because reading both sides
through DuckDB gave them identical decimal canonicalization, hiding a
Spark-vs-DuckDB divergence the driver (which reads the sides with
different engines) could see. pyarrow preserves Spark's physical types
(a DECIMAL(38,0) column arrives as decimal128 objects), so any
canonicalization gap is visible here first.

A decimal dtype in the Spark FINAL schema is a hard FAIL (the Fx rule:
accumulate exact, convert once at the end — to BIGINT/DOUBLE, never a
decimal final). StructuralSpec enforces the same ban JVM-side.

Usage: python3 tools/check.py <verify_outdir> <sf_dir>
(dev tool only — the shipped Scala library has no Python dependency)
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import pyarrow.parquet as pq

def spark_read_raw(files):
    """Read the Spark output with pyarrow only — the driver's view."""
    tbl = pq.read_table(sorted(files))
    df = tbl.to_pandas()
    decs = [f.name for f in tbl.schema
            if str(f.type).startswith("decimal")]
    return df, decs

def normalize_temporals(df):
    """Spark DATE columns arrive from pyarrow as python date objects
    while DuckDB's fetchdf gives datetime64 — same values, different
    dtype. Coerce both representations to datetime64[us] so the value
    compare is engine-neutral (the driver canonicalizes temporals the
    same way). Runs AFTER the decimal ban, which sees the raw schema.
    """
    import datetime
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            nn = df[c].dropna()
            if len(nn) and isinstance(
                    nn.iloc[0], (datetime.date, datetime.datetime)):
                df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
    return df

def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output");  n_fail += 1;  continue
        try:
            got, dec_cols = spark_read_raw(files)
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: read/oracle error: {e}");  n_fail += 1;  continue
        if dec_cols:
            print(f"FAIL {name}: decimal FINAL columns {dec_cols} "
                  "(cross-engine hash hazard; cast to BIGINT/DOUBLE)")
            n_fail += 1;  continue
        got = normalize_temporals(got.reindex(sorted(got.columns), axis=1))
        want = normalize_temporals(want.reindex(sorted(want.columns), axis=1))
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
            n_fail += 1;  continue
        if got.shape != want.shape:
            print(f"FAIL {name}: shape {got.shape} vs {want.shape}")
            n_fail += 1;  continue
        dt_got, dt_want = list(map(str, got.dtypes)), list(map(str, want.dtypes))
        if dt_got != dt_want:
            # decimal already failed above; remaining diffs (e.g. int32
            # vs int64) surface as value inequality below if material
            print(f"WARN {name}: dtypes {dt_got} vs {dt_want}")
        # exact compare in given order, then sorted order
        eq_ordered = got.reset_index(drop=True).equals(want.reset_index(drop=True))
        gs = got.sort_values(by=list(got.columns)).reset_index(drop=True)
        ws = want.sort_values(by=list(want.columns)).reset_index(drop=True)
        eq_sorted = gs.equals(ws)
        if eq_ordered:
            print(f"PASS {name} ({got.shape[0]} rows)");  n_pass += 1
        elif eq_sorted:
            # the driver's comparison is ordered-exact: a query whose
            # ORDER BY is not total WILL fail there, so count it as a
            # failure here too instead of green-lighting it
            print(f"FAIL {name}: row order differs (ORDER BY not total; "
                  "driver ordered-compare would fail)")
            n_fail += 1
        else:
            n_fail += 1
            diff = (gs != ws) & ~(gs.isna() & ws.isna())
            bad = diff.any(axis=1)
            print(f"FAIL {name}: {int(bad.sum())}/{len(gs)} rows differ; first diffs:")
            idx = gs.index[bad][:3]
            for i in idx:
                print(f"  got : {gs.loc[i].to_dict()}")
                print(f"  want: {ws.loc[i].to_dict()}")
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
