#!/usr/bin/env python3
"""Vacuity audit over a graft.Verify dump: flag gate outputs that PASS
the DuckDB oracle while measuring nothing.

The oracle gate checks AGREEMENT between engines, not BITE: a query
whose probe set is empty, whose denominator is zero, or whose headline
column is all-NULL agrees perfectly with an equally vacuous oracle.
Three such incidents slipped through rounds 6-8 (q_callback_schedule's
"no purchase ever", q_power_mde's user-level conversion, q_bloom_fpr's
empty probe set) — this tool automates the lesson.

Usage: vacuity_audit.py <verifyOutDir> [allowlist.json]

Flags, per query output:
  EMPTY          0 rows
  ALLNULL(col)   a column with every value NULL
  ALLZERO(col)   a numeric column with every value 0 (multi-row, or any
                 1-row count/n_* column)
  CONST(col)     a multi-row output whose column holds ONE distinct
                 non-null value (excluding boolean flag columns)

The allowlist maps "query.col" (or "query" for EMPTY) to a one-line
justification; allowlisted findings print as EXPLAINED and don't count
toward the exit status. Exit 1 iff any unexplained finding remains.
"""
import json
import os
import sys

import pandas as pd


def audit(out_dir: str, allow: dict) -> int:
    unexplained = 0
    explained = 0
    clean = 0
    for name in sorted(os.listdir(out_dir)):
        path = os.path.join(out_dir, name)
        if not os.path.isdir(path):
            continue
        df = pd.read_parquet(path)
        findings = []
        if len(df) == 0:
            findings.append((name, "EMPTY 0 rows"))
        for c in df.columns:
            s = df[c]
            key = f"{name}.{c}"
            if len(df) > 0 and s.isna().all():
                findings.append((key, f"ALLNULL {c}"))
                continue
            if pd.api.types.is_numeric_dtype(s):
                nn = s.dropna()
                if len(nn) and (nn == 0).all() and (
                        len(df) > 1 or c.startswith(("n_", "count", "num_"))):
                    findings.append((key, f"ALLZERO {c}"))
                    continue
            if len(df) > 1 and pd.api.types.is_bool_dtype(s) is False:
                nn = s.dropna()
                if len(nn) == len(df) and nn.nunique() == 1:
                    findings.append((key, f"CONST {c}={nn.iloc[0]!r}"))
        if not findings:
            clean += 1
        for key, desc in findings:
            if key in allow:
                explained += 1
                print(f"EXPLAINED {name}: {desc} — {allow[key]}")
            else:
                unexplained += 1
                print(f"FLAG {name}: {desc}")
    print(f"\n{clean} clean / {explained} explained / {unexplained} unexplained")
    return 1 if unexplained else 0


if __name__ == "__main__":
    out_dir = sys.argv[1]
    allow = {}
    if len(sys.argv) > 2:
        allow = json.load(open(sys.argv[2]))
    sys.exit(audit(out_dir, allow))
