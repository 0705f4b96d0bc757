"""Local replica of the driver's correctness gate.

Runs every __spark_entry__.queries() entry on Spark and its
oracle_sql() on DuckDB over the same parquet tables, then compares
row count, column names/sorted order, and exact values (rows sorted
by all columns). Exit code != 0 on any mismatch.

Usage: PYTHONPATH=/root/repo python tests/run_contract_check.py [sf_dir] [query ...]

Unlike the driver, comparison here normalizes integer widths — but the
driver's value-hash is dtype-sensitive (DuckDB HUGEINT comes back as
float64 from fetchdf and then hashes differently from Spark's int64).
So we ALSO flag any oracle column whose raw fetchdf dtype is float
while Spark's is integer (or vice versa): that would be a driver-side
hash mismatch even with identical values.
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)]
    # unify integer dtypes / object vs string for comparison
    for c in pdf.columns:
        if pd.api.types.is_integer_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("Int64")
        elif pd.api.types.is_float_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("float64")
    return pdf.sort_values(list(pdf.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    errs: list[str] = []
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        errs.append(
            f"{name}: columns differ spark={sorted(spark_pdf.columns)} "
            f"duck={sorted(duck_pdf.columns)}"
        )
        return errs
    if len(spark_pdf) != len(duck_pdf):
        errs.append(f"{name}: rowcount spark={len(spark_pdf)} duck={len(duck_pdf)}")
        return errs
    for c in sorted(spark_pdf.columns):
        s_int = pd.api.types.is_integer_dtype(spark_pdf[c])
        d_int = pd.api.types.is_integer_dtype(duck_pdf[c])
        s_f = pd.api.types.is_float_dtype(spark_pdf[c])
        d_f = pd.api.types.is_float_dtype(duck_pdf[c])
        if (s_int and d_f) or (s_f and d_int):
            errs.append(
                f"{name}: DTYPE mismatch col={c} spark={spark_pdf[c].dtype} "
                f"duck={duck_pdf[c].dtype} (driver hash gate would flag this;"
                " cast the oracle column)"
            )
    a, b = _normalize(spark_pdf), _normalize(duck_pdf)
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype == "float64":
            neq = ~((av == bv) | (av.isna() & bv.isna()))
        else:
            neq = ~((av.astype(object) == bv.astype(object)) | (av.isna() & bv.isna()))
        if neq.any():
            i = int(neq.idxmax())
            errs.append(
                f"{name}: value mismatch col={c} row={i} "
                f"spark={av.iloc[i]!r} duck={bv.iloc[i]!r} ({int(neq.sum())} rows differ)"
            )
    return errs


def main(sf_dir: str, only: list[str] | None = None) -> int:
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod
    from cityfinder_spark.session import get_spark

    spark = get_spark("contract-check", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    if only:
        unknown = set(only) - set(qs)
        if unknown:
            print(f"unknown queries: {sorted(unknown)}")
            return 1
        qs = {k: v for k, v in qs.items() if k in only}
    failures: list[str] = []
    for name, fn in qs.items():
        sdf = fn(spark, sf_dir)
        spark_pdf = sdf.toPandas()
        if name not in oracles:
            print(f"  [rows-only] {name}: {len(spark_pdf)} rows")
            if len(spark_pdf) == 0:
                failures.append(f"{name}: rows-only query returned 0 rows")
            continue
        duck_pdf = con.execute(oracles[name]).fetchdf()
        errs = compare(name, spark_pdf, duck_pdf)
        status = "OK " if not errs else "FAIL"
        print(f"  [{status}] {name}: spark={len(spark_pdf)} duck={len(duck_pdf)} rows")
        failures.extend(errs)

    # smoke: entry() (skip when checking a subset)
    if not only:
        n = entrymod.entry(spark).count()
        print(f"  [entry] rows={n}")
        if n <= 0:
            failures.append("entry(): 0 rows")

    for e in failures:
        print("MISMATCH:", e)
    print(f"{'PASS' if not failures else 'FAIL'}: {len(qs)} queries checked at {sf_dir}")
    return 1 if failures else 0


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    raise SystemExit(main(sf, only=sys.argv[2:] or None))
