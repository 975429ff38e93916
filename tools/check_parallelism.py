#!/usr/bin/env python3
"""Parallelism-stability check: run graft.Verify at two CPU counts and
diff the dumps. Any difference = a partial-aggregation-order-dependent
value (e.g. a double SUM) that can flake the driver's hash gate
depending on its thread count.

Usage: python3 tools/check_parallelism.py [sfDir]
Dev tool only — NOT part of the engine.
"""
import glob
import os
import subprocess
import sys

import pandas as pd


def run_verify(sf_dir: str, out: str, cpus: str) -> None:
    env = dict(os.environ, SPARK_GRAFT_CPUS=cpus)
    subprocess.run(
        ["sbt", "-batch", f"runMain graft.Verify {sf_dir} {out}"],
        env=env, check=True, capture_output=True)


def canon(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    df = df.reindex(cols, axis=1).copy()
    for c in cols:
        if len(df) and not isinstance(df[c].iloc[0], str) \
                and hasattr(df[c].iloc[0], "__len__"):
            df[c] = df[c].apply(tuple)
    return df.sort_values(by=cols, kind="mergesort",
                          na_position="first").reset_index(drop=True)


def main(sf_dir: str) -> int:
    a, b = "/tmp/graft_par_a", "/tmp/graft_par_b"
    run_verify(sf_dir, a, "3")
    run_verify(sf_dir, b, "32")
    bad = 0
    for da in sorted(glob.glob(f"{a}/*")):
        name = os.path.basename(da)
        if name == "oracle_sql.json":
            continue
        if not canon(pd.read_parquet(da)).equals(
                canon(pd.read_parquet(f"{b}/{name}"))):
            print(f"PARALLELISM-SENSITIVE: {name}")
            bad += 1
    print(f"parallelism-sensitive queries: {bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else
                  "/root/testdata/sf0.01"))
