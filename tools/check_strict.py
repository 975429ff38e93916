#!/usr/bin/env python3
"""Repr-strict oracle compare: the closest local emulation of the
driver's exact value-hash gate (tools/check_oracle.py tolerates 1e-9,
which can hide a last-ULP divergence the driver would flag).

Usage: python3 tools/check_strict.py [sfDir] [dumpDir]
Run graft.Verify into dumpDir first. Dev tool only — NOT the engine.
"""
import json
import os
import sys

import duckdb
import pandas as pd

from check_oracle import TABLES  # ONE fixture-table list, no drift


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    dump = sys.argv[2] if len(sys.argv) > 2 else "/tmp/v"
    con = duckdb.connect()
    for t in TABLES:
        if os.path.exists(f"{sf_dir}/{t}.parquet"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    sqls = json.load(open(f"{dump}/oracle_sql.json"))
    bad = []
    for name, sql in sorted(sqls.items()):
        if not os.path.isdir(f"{dump}/{name}"):
            bad.append((name, "MISSING dump directory"))
            continue
        try:
            o = con.execute(sql).fetchdf()
            s = pd.read_parquet(f"{dump}/{name}")  # whole dir, all parts
            o = o.reindex(sorted(o.columns), axis=1)
            s = s.reindex(sorted(s.columns), axis=1)
            if list(o.columns) != list(s.columns):
                bad.append((name, f"schema {list(o.columns)} vs {list(s.columns)}"))
                continue
            cols = list(o.columns)
            o = o.sort_values(cols, kind="mergesort").reset_index(drop=True)
            s = s.sort_values(cols, kind="mergesort").reset_index(drop=True)
            if len(o) != len(s):
                bad.append((name, f"rows {len(o)} vs {len(s)}"))
                continue
            mism = sum(repr(a) != repr(b)
                       for c in cols for a, b in zip(o[c], s[c]))
            if mism:
                bad.append((name, f"{mism} value mismatches"))
                for c in cols:
                    for a, b in zip(o[c], s[c]):
                        if repr(a) != repr(b):
                            print(f"  {name}.{c}: oracle {a!r} vs spark {b!r}")
                            break
                    else:
                        continue
                    break
        except Exception as e:  # noqa: BLE001 — report, keep checking
            bad.append((name, f"ERR {e}"))
    if bad:
        for name, why in bad:
            print(f"STRICT-FAIL {name}: {why}")
        print(f"{len(sqls) - len(bad)}/{len(sqls)} queries repr-identical")
        return 1
    print(f"{len(sqls)}/{len(sqls)} queries repr-identical")
    return 0


if __name__ == "__main__":
    sys.exit(main())
