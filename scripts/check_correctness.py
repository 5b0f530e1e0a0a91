#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate (dev tooling only — the
engine itself is pure Scala/Spark).

Usage: python3 scripts/check_correctness.py [sfDir] [outDir]

Runs nothing itself — expects `sbt "runMain graft.Verify <sfDir> <outDir>"`
to have populated outDir with <name>.parquet dirs + oracle_sql.json.
Then runs each oracle SQL in DuckDB over the same parquet tables and
compares: column names (sorted), row count, and values (rows sorted).
"""
import decimal, json, math, os, sys
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

BAD_DUCK_TYPES = ("DECIMAL", "HUGEINT", "UHUGEINT", "BLOB",
                  "[]", "STRUCT", "MAP", "UNION")

def duck_type_violations(con, sql: str, side: str) -> list:
    """Type-level guard, checked BEFORE pandas conversion (r5 lesson, part
    two: DuckDB hands DECIMAL(38,0) to pandas as lossy float64, so a
    decimal column can survive a value compare that the driver's stricter
    hash fails). Any DECIMAL/HUGEINT/BLOB/list/struct output type is a
    dtype-contract break regardless of what pandas makes of it."""
    try:
        desc = con.execute(f"DESCRIBE {sql}").fetchall()
    except Exception:
        return []  # the oracle itself will error later with a clearer message
    return [f"{side}.{r[0]}: {r[1]} output type — cast to "
            "BIGINT/DOUBLE/VARCHAR at the query boundary on both sides"
            for r in desc if any(t in r[1].upper() for t in BAD_DUCK_TYPES)]

def dtype_violations(df: pd.DataFrame, side: str) -> list:
    """Dtype-strict guard (r5 lesson: the mirror's pd.to_numeric coercion
    let a DECIMAL(38,0) output pass locally while the driver's hash went
    red). Any output column that arrives as DECIMAL, uncast HUGEINT,
    binary, or array is a dtype-contract break — cast it to
    BIGINT/DOUBLE/VARCHAR at the query layer on BOTH sides instead."""
    viols = []
    for c in df.columns:
        if df[c].dtype != object:
            continue
        sample = next((v for v in df[c]
                       if v is not None
                       and not (isinstance(v, float) and math.isnan(v))), None)
        if sample is None or isinstance(sample, str):
            continue  # strings (and all-null) are fine as object
        if isinstance(sample, decimal.Decimal):
            viols.append(f"{side}.{c}: DECIMAL — driver hash cannot "
                         "canonicalize; cast to BIGINT/DOUBLE on both sides")
        elif isinstance(sample, int):
            viols.append(f"{side}.{c}: uncast wide int (HUGEINT?) — "
                         "cast to BIGINT on both sides")
        elif isinstance(sample, (bytes, bytearray)):
            viols.append(f"{side}.{c}: binary output column — hex/base64 it")
        else:
            viols.append(f"{side}.{c}: non-scalar {type(sample).__name__} — "
                         "explode/serialize arrays before the query boundary")
    return viols

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize timestamps/dates to strings, floats rounded
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif df[c].dtype == object:
            # post-dtype_violations: only strings/nulls remain here
            df[c] = df[c].apply(lambda v: v if v is None else str(v))
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = [d for d in os.listdir(out_dir)
             if os.path.isdir(os.path.join(out_dir, d))]
    passed, failed, no_oracle = [], [], []
    # graft.Verify swallows per-query exceptions — a crashed query produces
    # no output dir. Fail on any expected query that is missing, instead of
    # silently dropping it from the comparison.
    expected = set(oracles)
    manifest = f"{out_dir}/query_names.json"
    if os.path.exists(manifest):
        expected |= set(json.load(open(manifest)))
    for name in sorted(expected - set(names)):
        failed.append((name, "no output dir — query crashed in graft.Verify"))
    for name in sorted(names):
        spark_df = duckdb.sql(
            f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        if name not in oracles:
            no_oracle.append((name, len(spark_df)))
            continue
        try:
            ora_df = con.execute(oracles[name]).df()
        except Exception as e:
            failed.append((name, f"oracle SQL error: {e}"))
            continue
        viols = (duck_type_violations(
                     con, f"SELECT * FROM '{out_dir}/{name}/*.parquet'", "spark")
                 + duck_type_violations(con, oracles[name], "oracle")
                 + dtype_violations(spark_df, "spark")
                 + dtype_violations(ora_df, "oracle"))
        if viols:
            failed.append((name, "dtype contract: " + "; ".join(viols)))
            continue
        a, b = canon(spark_df), canon(ora_df)
        if list(a.columns) != list(b.columns):
            failed.append((name, f"cols spark={list(a.columns)} oracle={list(b.columns)}"))
            continue
        if list(map(str, a.dtypes)) != list(map(str, b.dtypes)):
            dd = {c: (str(a[c].dtype), str(b[c].dtype))
                  for c in a.columns if a[c].dtype != b[c].dtype}
            failed.append((name, f"post-canon dtype mismatch spark-vs-oracle: {dd}"))
            continue
        if len(a) != len(b):
            failed.append((name, f"rows spark={len(a)} oracle={len(b)}"))
            continue
        if not a.equals(b):
            diff = (a != b) & ~(a.isna() & b.isna())
            bad = diff.any(axis=1)
            idx = bad[bad].index[:3]
            detail = "; ".join(
                f"row{int(i)}: spark={a.loc[i].to_dict()} oracle={b.loc[i].to_dict()}"
                for i in idx)
            failed.append((name, f"value mismatch ({int(bad.sum())} rows): {detail[:500]}"))
            continue
        passed.append((name, len(a)))
    print(f"== PASS ({len(passed)})")
    for n, r in passed: print(f"   {n}  ({r} rows)")
    if no_oracle:
        print(f"== NO-ORACLE rows-only ({len(no_oracle)})")
        for n, r in no_oracle: print(f"   {n}  ({r} rows)" + ("  !! 0 ROWS" if r == 0 else ""))
    if failed:
        print(f"== FAIL ({len(failed)})")
        for n, m in failed: print(f"   {n}: {m}")
        sys.exit(1)

if __name__ == "__main__":
    main()
