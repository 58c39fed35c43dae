"""Local replica of the driver's correctness gate.

Runs every catalog query on Spark and its oracle SQL on DuckDB at a
given scale factor, then compares row count, schema (column names),
and values cell-exactly after canonical sorting. Stricter than any
plausible driver hash — if this passes, the driver's
order-insensitive value-hash passes.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            dt = df[c]
            if getattr(dt.dtype, "tz", None) is not None:
                dt = dt.dt.tz_localize(None)
            df[c] = dt.astype("datetime64[us]")
    return df.sort_values(list(df.columns), na_position="last").reset_index(drop=True)


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    problems: list[str] = []
    if len(sdf) != len(odf):
        problems.append(f"rowcount spark={len(sdf)} oracle={len(odf)}")
    s_cols, o_cols = sorted(sdf.columns), sorted(odf.columns)
    if s_cols != o_cols:
        problems.append(f"columns spark={s_cols} oracle={o_cols}")
        return problems
    if problems:
        return problems
    s, o = _canon(sdf), _canon(odf)
    for c in s.columns:
        sv, ov = s[c], o[c]
        if pd.api.types.is_float_dtype(sv) or pd.api.types.is_float_dtype(ov):
            sa = sv.astype("float64").to_numpy()
            oa = ov.astype("float64").to_numpy()
            both_nan = np.isnan(sa) & np.isnan(oa)
            eq = (sa == oa) | both_nan
            if not eq.all():
                bad = int((~eq).sum())
                idx = np.argmax(~eq)
                diff = np.nanmax(np.abs(np.nan_to_num(sa) - np.nan_to_num(oa)))
                problems.append(
                    f"col {c}: {bad} mismatches, first@{idx} "
                    f"spark={sa[idx]!r} oracle={oa[idx]!r} maxabsdiff={diff:.3e}"
                )
        else:
            sv = sv.astype("object").where(pd.notna(sv), None)
            ov = ov.astype("object").where(pd.notna(ov), None)
            neq = sv.ne(ov) & ~(sv.isna() & ov.isna())
            if neq.any():
                i = int(np.argmax(neq.to_numpy()))
                problems.append(
                    f"col {c}: {int(neq.sum())} mismatches, first@{i} "
                    f"spark={sv.iloc[i]!r} oracle={ov.iloc[i]!r}"
                )
    # dtype report (informational — driver may compare schemas)
    for c in s.columns:
        if str(s[c].dtype) != str(o[c].dtype):
            problems.append(f"dtype {c}: spark={s[c].dtype} oracle={o[c].dtype} (warn)")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import marketdatapipeline_spark.catalog_corpus  # noqa: F401 — registers
    import marketdatapipeline_spark.catalog_multimodal  # noqa: F401 — registers
    import marketdatapipeline_spark.catalog_operators  # noqa: F401 — registers
    import marketdatapipeline_spark.catalog_pipeline  # noqa: F401 — registers
    from marketdatapipeline_spark.catalog import EXTENDED_REGISTRY, REGISTRY
    from marketdatapipeline_spark.session import get_spark

    spark = get_spark(app_name="check_oracle")
    con = duckdb.connect()
    from marketdatapipeline_spark.sources.tables import TABLES

    for t in TABLES:
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures = 0
    for name, spec in {**REGISTRY, **EXTENDED_REGISTRY}.items():
        if only and name not in only:
            continue
        try:
            sdf = spec.fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures += 1
            continue
        if spec.sql is None:
            print(f"SKIP  {name}: rows-only ({len(sdf)} rows)")
            continue
        try:
            odf = con.sql(spec.sql).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: oracle error: {e}")
            failures += 1
            continue
        problems = compare(name, sdf, odf)
        hard = [p for p in problems if not p.endswith("(warn)")]
        status = "FAIL" if hard else ("WARN" if problems else "PASS")
        if hard:
            failures += 1
        print(f"{status}  {name}  ({len(sdf)} rows)")
        for p in problems:
            print(f"      {p}")
    from marketdatapipeline_spark.caching import release_caches

    release_caches()  # last query's scoped persists
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
