#!/usr/bin/env python3
"""Dev-loop correctness checker mimicking the driver's DuckDB oracle:
runs each oracle SQL against the test tables, loads the Verify parquet
dump, sorts columns by name and rows by all columns, and compares values.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name and rows by value. Floats are rounded in the
    SORT KEY only (values themselves stay exact): two engines whose floats
    differ within the comparison tolerance on a sort-key column would
    otherwise pair rows off misaligned and report spurious VALUE failures.
    Non-float columns sort first so float ties rarely matter at all."""
    df = df.reindex(sorted(df.columns), axis=1)
    nonf = [c for c in df.columns if not pd.api.types.is_float_dtype(df[c])]
    flts = [c for c in df.columns if pd.api.types.is_float_dtype(df[c])]
    key = pd.concat([df[nonf], df[flts].round(6)], axis=1) if flts else df
    order = key.sort_values(by=nonf + flts, kind="mergesort").index
    return df.loc[order].reset_index(drop=True)


def dtype_class(s: pd.Series) -> str:
    """Coarse dtype class used for strict parity. The driver hashes the
    pandas-rendered values, so an int64 column on one side and float64 on
    the other (e.g. DuckDB sum(BIGINT)->HUGEINT->float64) renders '100'
    vs '100.0' and can NEVER hash-match even when values are identical.
    Coercing past that here would make dev-loop green lie about driver
    green, which is exactly how the dt_* bug survived two rounds."""
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_float_dtype(s):
        return "float"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    return "other"


def compare(name, spark_df, duck_df):
    if list(spark_df.columns) != list(duck_df.columns):
        return f"SCHEMA cols spark={list(spark_df.columns)} duck={list(duck_df.columns)}"
    if len(spark_df) != len(duck_df):
        return f"ROWS spark={len(spark_df)} duck={len(duck_df)}"
    for c in spark_df.columns:
        ka, kb = dtype_class(spark_df[c]), dtype_class(duck_df[c])
        if ka != kb:
            return (f"DTYPE col {c}: spark={spark_df[c].dtype}({ka}) "
                    f"duck={duck_df[c].dtype}({kb}) — driver hash would mismatch")
    for c in spark_df.columns:
        a, b = spark_df[c], duck_df[c]
        try:
            if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
                ok = ((a - b).abs() < 1e-9) | (a.isna() & b.isna())
            else:
                ok = (a.astype(str) == b.astype(str))
        except Exception as e:
            return f"CMP-ERR col {c}: {e}"
        if not ok.all():
            i = (~ok).idxmax()
            return f"VALUE col {c} row {i}: spark={a[i]!r} duck={b[i]!r}"
    return None


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    errs_path = f"{out_dir}/errors.json"
    errs = json.load(open(errs_path)) if os.path.exists(errs_path) else {}
    results = {}
    for name in sorted(os.listdir(out_dir)):
        pdir = os.path.join(out_dir, name)
        if not os.path.isdir(pdir):
            continue
        if name in errs:
            # the latest run recorded a failure for this query: a parquet
            # dump left by an earlier run is stale — never report it OK
            results[name] = f"ERR {errs[name][:120]}"
            continue
        files = glob.glob(f"{pdir}/*.parquet")
        if not files:
            results[name] = "NO-PARQUET"
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        if name not in oracle:
            results[name] = f"rows-only ({len(spark_df)} rows)" if len(spark_df) else "rows-only EMPTY!"
            continue
        try:
            duck_df = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            results[name] = f"ORACLE-ERR {e}"
            continue
        err = compare(name, canon(spark_df), canon(duck_df))
        # a 0-row match is vacuous: both sides agreeing on nothing usually
        # means the query's predicate misses the dataset entirely (seen
        # with a date range outside the generated span) — flag it so the
        # dev loop surfaces weak entries the driver's rows>0 smoke would
        # also question
        if err is None and len(spark_df) == 0:
            results[name] = "OK-EMPTY (0 rows — vacuous match, check predicates)"
        else:
            results[name] = err or f"OK ({len(spark_df)} rows)"
    for k in sorted(oracle):
        if k not in results:
            results[k] = f"ERR {errs[k][:120]}" if k in errs else "MISSING SPARK OUTPUT"
    width = max(len(k) for k in results)
    n_ok = sum(1 for v in results.values() if v.startswith(("OK", "rows-only (")))
    for k, v in sorted(results.items()):
        print(f"{k:<{width}}  {v}")
    print(f"\n{n_ok}/{len(results)} green")
    return 0 if n_ok == len(results) else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
