#!/usr/bin/env python3
"""Guard: SURVEY.md's round-state "passing" claim must be licensed by a
machine-readable local gate result (dev tool only; the engine itself is
pure Scala/Spark).

Added r9 after VERDICT r8 §wrong-2: round 8 shipped a SURVEY sentence
claiming "every oracle-checked query passing ... at ALL" scale factors
while the driver's (newer) DuckDB disagreed on 3 queries. Two rules now
hold:

  1. The claim may only describe the LOCAL gate — the round-state
     sentence must carry the words "local" and the pinned DuckDB version
     that actually ran (from .gate/local_gate.json, written by
     tools/check.py).
  2. The claim's counts must match the gate record: failures must be
     empty, and the declared/oracle-checked totals must equal what the
     gate measured.

Usage: python3 tools/claim_check.py          (from the repo root)
Exit 0 = claim licensed. Prints the violation otherwise.
"""
import json
import os
import re
import sys

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")


def main():
    gate_path = os.path.join(ROOT, ".gate", "local_gate.json")
    if not os.path.exists(gate_path):
        print("claim_check: no .gate/local_gate.json — run the gate "
              "(tools/check.py) before writing any SURVEY passing claim")
        return 1
    gate = json.load(open(gate_path))
    survey = open(os.path.join(ROOT, "SURVEY.md")).read()

    # Latest round-state block (highest round number wins).
    states = re.findall(r"Round-(\d+) state:\s*(.{0,600})", survey, re.S)
    if not states:
        print("claim_check: no 'Round-N state:' sentence in SURVEY.md")
        return 1
    rnd, claim = max(states, key=lambda t: int(t[0]))

    m = re.search(r"(\d+)\s+declared queries\s*[—-]+\s*(\d+)\s+oracle-checked",
                  claim)
    if not m:
        print(f"claim_check: round-{rnd} state lacks the guarded "
              "'N declared queries — M oracle-checked' phrase")
        return 1
    declared, oracle_checked = int(m.group(1)), int(m.group(2))

    errs = []
    if gate["failures"]:
        errs.append(f"gate records failures {gate['failures']} — no passing "
                    "claim is licensed until the gate is clean")
    # dtype hazards are gate failures too (r17): an uncast wide-integer
    # emit passes the local value compare but hash-fails the driver's
    # pandas render — r16's one red row. An old gate record without the
    # key is unlicensed (forces a re-run with the audited gate).
    if gate.get("dtype_hazards", ["gate record predates the dtype audit — "
                                  "re-run tools/check.py"]):
        errs.append(f"gate records dtype hazards "
                    f"{gate.get('dtype_hazards')} — driver-hash risk")
    if declared != gate["n_total"]:
        errs.append(f"claim says {declared} declared queries, gate measured "
                    f"{gate['n_total']}")
    if oracle_checked != gate["oracle_checked"]:
        errs.append(f"claim says {oracle_checked} oracle-checked, gate "
                    f"measured {gate['oracle_checked']}")
    # Only police the qualifier when the sentence actually claims passing.
    if re.search(r"passing", claim, re.I):
        if not re.search(r"\blocal\b", claim, re.I):
            errs.append("a passing claim must say it is about the LOCAL "
                        "gate (driver's oracle version may differ)")
        if gate["duckdb"] not in claim:
            errs.append(f"a passing claim must pin the DuckDB version that "
                        f"ran ({gate['duckdb']})")
    if errs:
        for e in errs:
            print(f"claim_check: round-{rnd}: {e}")
        return 1
    print(f"claim_check: round-{rnd} claim licensed by local gate "
          f"({gate['n_ok']}/{gate['n_total']}, duckdb {gate['duckdb']})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
