"""Local replica of the driver's DuckDB-oracle comparison.

Runs a catalog query on Spark and its oracle SQL on DuckDB over the
same parquet fixtures, then compares row count, column names, and an
order-insensitive value frame (columns sorted by name, rows sorted by
all columns). Used by tests/test_oracle_parity.py so every registered
query is validated locally before the driver ever sees it.
"""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd

from rust_etl_spark.sources.tables import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    out = df[sorted(df.columns)].copy()
    for c in out.columns:
        if out[c].dtype == object:
            out[c] = out[c].astype(str)
        elif pd.api.types.is_float_dtype(out[c]):
            out[c] = out[c].astype(float)
        elif pd.api.types.is_integer_dtype(out[c]):
            out[c] = out[c].astype("int64")
    return out.sort_values(by=list(out.columns), ignore_index=True)


#: dtype.kind -> comparison class. The driver hashes raw values, so an
#: int64-vs-float64 column pair hash-mismatches even when every value is
#: numerically equal (round-1 failures: DuckDB HUGEINT sums -> float64 via
#: fetchdf(), sign() TINYINT vs signum DOUBLE). The local gate must be at
#: least as strict as that.
_KIND_CLASS = {"i": "int", "u": "int", "f": "float", "b": "bool", "M": "datetime", "O": "object"}


def _kind(series: pd.Series) -> str:
    return _KIND_CLASS.get(series.dtype.kind, series.dtype.kind)


def compare(spark_df, oracle_pdf: pd.DataFrame, float_tol: float = 0.0) -> list[str]:
    """Return a list of mismatch descriptions; empty means match.

    Strictness matches the driver's value-hash gate: same columns, same
    row count, same *dtype class* per column (int vs float vs bool ...),
    bit-identical zero signs, and equal values. The only tolerated dtype
    difference is object-vs-datetime (dates arrive as python objects from
    Spark and datetime64 from DuckDB; proven hash-equal in round 1).
    """
    errs: list[str] = []
    s = spark_df.toPandas()
    o = oracle_pdf
    if sorted(s.columns) != sorted(o.columns):
        return [f"columns differ: spark={sorted(s.columns)} oracle={sorted(o.columns)}"]
    if len(s) != len(o):
        errs.append(f"row count differs: spark={len(s)} oracle={len(o)}")
        return errs
    for c in sorted(s.columns):
        ka, kb = _kind(s[c]), _kind(o[c])
        if ka != kb and {ka, kb} != {"object", "datetime"}:
            errs.append(
                f"column {c!r}: dtype class mismatch spark={s[c].dtype}({ka}) "
                f"oracle={o[c].dtype}({kb}) — would flip the driver's value hash"
            )
    if errs:
        return errs
    cs, co = _canon(s), _canon(o)
    for c in cs.columns:
        a, b = cs[c], co[c]
        if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
            aa, bb = a.astype(float), b.astype(float)
            bad = ~(
                (aa.isna() & bb.isna())
                | (aa - bb).abs().le(float_tol)
                | (aa == bb)
            )
            # -0.0 vs 0.0 compares equal but hashes differently at the
            # driver; treat a sign mismatch at zero as a failure.
            zero_sign = (aa == 0.0) & (bb == 0.0) & (
                np.signbit(aa.fillna(0.0).to_numpy()) != np.signbit(bb.fillna(0.0).to_numpy())
            )
            bad = bad | zero_sign
        else:
            bad = ~((a.isna() & b.isna()) | (a.astype(str) == b.astype(str)))
        n_bad = int(bad.sum())
        if n_bad:
            i = bad.idxmax()
            errs.append(f"column {c!r}: {n_bad} mismatched values, first at row {i}: spark={a[i]!r} oracle={b[i]!r}")
    return errs
