#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate (dev tool only; the
engine itself is pure Scala/Spark).

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Loads each <verifyOutDir>/<name>/ parquet result, runs the corresponding
oracle SQL from oracle_sql.json in DuckDB over the <sfDir> parquet tables,
and compares as the driver does: columns sorted by name, rows sorted,
values hashed."""
import sys, os, json, glob
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        return repr(v)
    return str(v)


def canon(names, rows):
    order = sorted(range(len(names)), key=lambda i: names[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort()
    return [names[i] for i in order], out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    results = {}
    # an oracle-declared query whose result dir is missing FAILED in
    # Verify — surface it instead of silently shrinking the denominator
    for name in oracle:
        if not os.path.isdir(os.path.join(out_dir, name)):
            results[name] = "NO-OUTPUT (query failed in Verify)"
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(os.path.join(d, "*.parquet"))
        if not files:
            results[name] = "NO-OUTPUT"
            continue
        tbl = pq.read_table(d)
        spark_names = tbl.column_names
        spark_rows = [tuple(r[c] for c in spark_names) for r in tbl.to_pylist()]
        if name not in oracle:
            results[name] = f"rows-only ({len(spark_rows)} rows)" if spark_rows else "rows-only EMPTY"
            continue
        try:
            cur = con.execute(oracle[name])
            oc_names = [dsc[0] for dsc in cur.description]
            oc_rows = cur.fetchall()
        except Exception as e:
            results[name] = f"ORACLE-ERROR: {e}"
            continue
        sn, sr = canon(spark_names, spark_rows)
        on, orows = canon(oc_names, oc_rows)
        if sn != on:
            results[name] = f"SCHEMA-MISMATCH spark={sn} oracle={on}"
        elif sr != orows:
            diffs = [i for i, (a, b) in enumerate(zip(sr, orows)) if a != b][:3]
            detail = "; ".join(f"row{i}: spark={sr[i]} oracle={orows[i]}" for i in diffs)
            results[name] = (f"VALUE-MISMATCH rows spark={len(sr)} oracle={len(orows)} "
                             f"first-diffs: {detail}")
        else:
            results[name] = f"OK ({len(sr)} rows)"
    width = max(len(k) for k in results) if results else 0
    n_ok = sum(1 for v in results.values() if v.startswith(("OK", "rows-only (")))
    for k, v in sorted(results.items()):
        print(f"{k:<{width}}  {v}")
    print(f"\n{n_ok}/{len(results)} passing")
    # The dtype audit is PART of the gate (r17): r16 shipped an uncast
    # HUGEINT emit (cdc_mv_routed_share) that passed value-comparison on
    # the local DuckDB but hash-failed the driver's pandas render — the
    # audit catches that class statically, so a gate run that skips it is
    # not a gate run. Hazards fail the gate like value mismatches do.
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import dtype_audit
    hazards = dtype_audit.collect_hazards(sf_dir, out_dir)
    for h in hazards:
        print("DTYPE-HAZARD", h)
    print(f"{len(hazards)} dtype hazards")
    # Machine-readable gate record: the ONLY licensed source for any
    # "passing" claim in SURVEY.md/README.md (tools/claim_check.py
    # enforces this — added r9 after VERDICT r8 §wrong-2, where the
    # narrative claimed all-green while the driver's newer DuckDB
    # disagreed on 3 queries). Records the local DuckDB version so the
    # claim must carry the "local, version-pinned" qualifier.
    gate = {
        "duckdb": duckdb.__version__,
        "sf_dir": os.path.abspath(sf_dir),
        "n_ok": n_ok,
        "n_total": len(results),
        "oracle_checked": sum(1 for v in results.values() if v.startswith("OK")),
        "rows_only": sorted(k for k, v in results.items()
                            if v.startswith("rows-only (")),
        "failures": sorted(k for k, v in results.items()
                           if not v.startswith(("OK", "rows-only ("))),
        "dtype_hazards": hazards,
    }
    gate_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "..", ".gate")
    os.makedirs(gate_dir, exist_ok=True)
    with open(os.path.join(gate_dir, "local_gate.json"), "w") as f:
        json.dump(gate, f, indent=1, sort_keys=True)
    return 0 if n_ok == len(results) and not hazards else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
