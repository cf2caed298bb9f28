#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: after `sbt "runMain graft.Verify <sfDir> <outDir>"`, run
    python3 tools/check_oracle.py <sfDir> <outDir>

For each query dir under <outDir>, loads the Spark parquet result and runs
the matching SQL from oracle_sql.json in DuckDB against views named after
the tables in <sfDir>. Compares after sorting columns by name and rows by
all values. Reports exact / approx / mismatch per query.
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="last")
    return df.reset_index(drop=True)


def negzero_cells(df: pd.DataFrame) -> list:
    """(-0.0) cells — banned fleet-wide: value-equality (this script,
    pandas, python float ==) treats -0.0 == 0.0 but the driver's HASH
    compare renders the sign, so a query that is 'exact' here can be
    hash-red at the driver (the round-4/round-6 q_ext_covariance bug:
    DuckDB's C-style round() keeps the sign on round(-1e-7, 6) while
    Spark's BigDecimal HALF_UP round never emits -0.0). Emitting
    queries must normalize with `+ 0.0` on BOTH sides.
    """
    import numpy as np
    bad = []
    for c in df.columns:
        arr = df[c].to_numpy()
        if arr.dtype.kind != "f":
            continue
        hits = np.flatnonzero((arr == 0.0) & np.signbit(arr))
        for i in hits[:3]:
            bad.append((c, int(i)))
    return bad


def cell_eq(a, b) -> bool:
    if a is None and b is None:
        return True
    try:
        if pd.isna(a) and pd.isna(b):
            return True
        if pd.isna(a) or pd.isna(b):
            return False
    except (TypeError, ValueError):
        pass
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if fa == fb:
            return True
        return math.isclose(fa, fb, rel_tol=1e-12, abs_tol=1e-12)
    return a == b


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    n_bad = 0
    # Rows-only queries have no oracle entry, so a crash there is
    # invisible to the SQL loop below — reconcile against the declared
    # surface Verify records in its manifest.
    manifest_p = Path(out_dir) / "_verify_manifest.json"
    if manifest_p.exists():
        manifest = json.loads(manifest_p.read_text())
        for name in manifest.get("missing", []):
            print(f"FAIL  {name}: declared but wrote no output (crashed)")
            n_bad += 1
    for name in sorted(oracle):
        qdir = Path(out_dir) / name
        if not qdir.exists():
            print(f"FAIL  {name}: no Spark output written")
            n_bad += 1
            continue
        try:
            got = canon(con.execute(
                f"SELECT * FROM read_parquet('{qdir}/*.parquet')").df())
            want = canon(con.execute(oracle[name]).df())
        except Exception as e:
            print(f"FAIL  {name}: {e}")
            n_bad += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL  {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_bad += 1
            continue
        if len(got) != len(want):
            print(f"FAIL  {name}: rows {len(got)} != {len(want)}")
            n_bad += 1
            continue
        nz_got, nz_want = negzero_cells(got), negzero_cells(want)
        if nz_got or nz_want:
            print(f"FAIL  {name}: -0.0 emitted (driver hash hazard) "
                  f"spark={nz_got} oracle={nz_want} — normalize with + 0.0")
            n_bad += 1
            continue
        exact = got.equals(want)
        if exact:
            print(f"OK    {name}: exact ({len(got)} rows)")
            continue
        bad = []
        for c in got.columns:
            gv, wv = got[c].tolist(), want[c].tolist()
            for i, (a, b) in enumerate(zip(gv, wv)):
                if not cell_eq(a, b):
                    bad.append((c, i, a, b))
                    if len(bad) >= 3:
                        break
            if len(bad) >= 3:
                break
        if not bad:
            print(f"OK~   {name}: approx-equal, not bit-exact ({len(got)} rows) "
                  f"— tighten rounding/types")
        else:
            print(f"FAIL  {name}: first diffs {bad}")
            n_bad += 1
    return n_bad


if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)
