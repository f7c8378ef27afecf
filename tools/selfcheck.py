#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB against the sf parquet tables and compare with the Verify parquet
dumps. Exact compare (and float-tolerance report) so cross-engine IEEE
drift is caught before the driver sees it.

Usage: python3 tools/selfcheck.py <sfdir> <verify_outdir>
"""
import json
import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main(sfdir: str, outdir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_bad = 0
    for name in sorted(oracle):
        try:
            got = canon(pd.read_parquet(f"{outdir}/{name}"))
            exp = canon(con.execute(oracle[name]).df())
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_bad += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
            n_bad += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}")
            n_bad += 1
            continue
        bad_cols = []
        for c in got.columns:
            g, e = got[c], exp[c]
            # Driver hashes typed values, so int-vs-float drift (e.g. DuckDB
            # HUGEINT from SUM vs Spark BIGINT) is a real mismatch there —
            # refuse to paper over it with astype(float).
            if g.dtype.kind != e.dtype.kind:
                bad_cols.append(f"{c}(dtype {g.dtype} vs {e.dtype})")
                continue
            if g.dtype.kind == "f" or e.dtype.kind == "f":
                g = g.astype(float)
                e = e.astype(float)
                same = (g.values == e.values) | (g.isna().values & e.isna().values)
                if not same.all():
                    d = np.nanmax(np.abs(g.values - e.values))
                    bad_cols.append(f"{c}(maxdiff={d:.3e},n={int((~same).sum())})")
            else:
                same = (g.values == e.values) | (pd.isna(g).values & pd.isna(e).values)
                if not same.all():
                    bad_cols.append(f"{c}(n={int((~same).sum())})")
        if bad_cols:
            print(f"FAIL {name}: value mismatch {', '.join(bad_cols)}")
            n_bad += 1
        else:
            print(f"ok   {name} ({len(got)} rows)")
    print(f"{len(oracle) - n_bad}/{len(oracle)} queries match")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
