#!/usr/bin/env python3
"""Oracle output-dtype audit — driver-hash hazard detector (dev tool).

The driver's correctness gate converts BOTH sides to pandas before
hashing, and that conversion is dtype-sensitive in ways tools/check.py
(python-native fetchall) is not:

  - DuckDB HUGEINT — produced by SUM(BIGINT), and preserved by %, //,
    etc. — becomes pandas float64, so a value renders '32.0' while
    Spark's LongType renders '32': hash false-red on every row even
    though the values are identical (bit us on cur_pack_sequences, r4).
  - LIST/STRUCT/MAP columns become numpy arrays; the driver's pandas
    row-sort crashes with "unhashable type: numpy.ndarray" (bit us on
    x2_array_agg, r4).
  - An int column on one side vs a float column on the other renders
    '32' vs '32.0' — same hash failure without any DuckDB widening.

Rule (Inventory.scala determinism rule 5): every gated output column
must be a scalar with the SAME type family on both sides — BIGINT/
INTEGER, DOUBLE, VARCHAR, DATE, TIMESTAMP, or BOOLEAN. CAST anything
DuckDB widens (SUM, %, //, list len) to an explicit type; string-join
any array.

Rule 2 (added r9 after VERDICT r8 §wrong-1): any AGGREGATE over a
DECIMAL cast whose argument references a DOUBLE-typed source column
(`SUM(CAST(value AS DECIMAL(18,6)))`) is a hazard regardless of output
type — the per-row double→decimal cast rounds differently across DuckDB
versions, so a query can pass the local gate and fail the driver's
(w4_rolling_range / t7_attribution / pipeline_item_insights, r8). Use
floor-scaled BIGINT micro-points instead (Inventory.scala rule 2).

Rule 6 (r9, found by t14_twap): a >2^53 exact integer (DECIMAL(38,0)
moment, HUGEINT product-sum) cast straight to DOUBLE rounds
engine-implementation-defined (1-ulp divergence measured between java
BigDecimal and DuckDB's HUGEINT path). NOT statically flagged here —
direct casts of envelope-bounded (<2^53) wide integers are legitimate
and common (a18/a20) — so the rule is enforced by review + the Exact
.bigColToDouble/bigSqlToDouble helpers, which split at 2^52 and
reassemble with identical IEEE ops on both engines.

Usage: python3 tools/dtype_audit.py <sfDir> <verifyOutDir>
Exit 0 = no hazards. Prints one line per flagged column otherwise.
"""
import sys, os, json, glob, re
import duckdb
import pyarrow.parquet as pq
import pyarrow as pa

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def duck_family(t):
    """Collapse a DuckDB declared type to a render-equivalence family."""
    t = t.upper()
    if t in ("HUGEINT", "UHUGEINT"):
        return "HAZARD:hugeint(->float64 in pandas)"
    if "[]" in t or t.startswith(("STRUCT", "LIST", "MAP")):
        return "HAZARD:nested(pandas sort crashes)"
    if t.startswith("DECIMAL"):
        # pandas renders Decimal objects ('32.00') unlike float ('32.0')
        # or int ('32') — only safe if Spark emits the identical decimal.
        return "decimal"
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    if t in ("FLOAT", "REAL", "DOUBLE"):
        return "float"
    if t in ("VARCHAR", "TEXT", "STRING", "BLOB"):
        return "str"
    if t.startswith("TIMESTAMP"):
        return "timestamp"
    if t == "DATE":
        return "date"
    if t == "BOOLEAN":
        return "bool"
    return t


def arrow_family(t):
    if pa.types.is_nested(t):
        return "HAZARD:nested(pandas sort crashes)"
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_string(t) or pa.types.is_large_string(t) or pa.types.is_binary(t):
        return "str"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_boolean(t):
        return "bool"
    return str(t)


AGG_DECIMAL_CAST = re.compile(
    r"\b(SUM|AVG|MIN|MAX|STDDEV\w*|VAR\w*|PRODUCT)\s*\(\s*(?:DISTINCT\s+)?"
    r"CAST\s*\((.*?)\s+AS\s+DECIMAL", re.I | re.S)


def decimal_cast_hazards(name, sql, double_cols):
    """Flag aggregates over DECIMAL casts of DOUBLE source columns.

    The cast argument is matched textually against the known DOUBLE
    column names (word-boundary), so `CAST(value AS ...)`,
    `CAST(p.value AS ...)` and `CAST(value * 2 AS ...)` all flag.
    Aliases that rename a double column evade this — keep gated SQL
    referring to source columns by their table names (house rule).
    """
    out = []
    for m in AGG_DECIMAL_CAST.finditer(sql):
        arg = m.group(2)
        hits = [c for c in double_cols
                if re.search(rf"\b{re.escape(c)}\b", arg)]
        if hits:
            out.append(
                f"{name}: {m.group(1).upper()}(CAST({arg.strip()[:40]} AS"
                f" DECIMAL..)) aggregates a decimal cast of DOUBLE column(s)"
                f" {hits} — double->decimal rounding diverges across DuckDB"
                f" versions; use floor-scaled BIGINT micro-points")
    return out


def collect_hazards(sf_dir, out_dir):
    """The audit core, importable by tools/check.py (the gate runs this
    unconditionally since r17 — r16's cdc_mv_routed_share slipped through
    precisely because the audit existed but was not part of the gate).
    Returns the hazard lines; empty list = clean."""
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    double_cols = set()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
            for cname, ctype, *_ in con.execute(f"DESCRIBE {t}").fetchall():
                if ctype.upper() in ("DOUBLE", "FLOAT", "REAL"):
                    double_cols.add(cname)
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    hazards = []
    for name, sql in sorted(oracle.items()):
        hazards.extend(decimal_cast_hazards(name, sql, double_cols))
        try:
            desc = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as e:
            hazards.append(f"{name}: DESCRIBE failed: {e}")
            continue
        ofam = {r[0]: duck_family(r[1]) for r in desc}
        d = os.path.join(out_dir, name)
        sfam = {}
        if glob.glob(os.path.join(d, "*.parquet")):
            sch = pq.read_schema(glob.glob(os.path.join(d, "*.parquet"))[0])
            sfam = {f.name: arrow_family(f.type) for f in sch}
        for c, fam in ofam.items():
            if fam.startswith("HAZARD"):
                hazards.append(f"{name}.{c}: oracle {fam}")
        for c, fam in sfam.items():
            if fam.startswith("HAZARD"):
                hazards.append(f"{name}.{c}: spark {fam}")
        for c in set(ofam) & set(sfam):
            a, b = ofam[c], sfam[c]
            if a.startswith("HAZARD") or b.startswith("HAZARD"):
                continue
            if a != b:
                hazards.append(
                    f"{name}.{c}: family mismatch oracle={a} spark={b}"
                    " (renders differently under the driver's hash)")
    return hazards


def main(sf_dir, out_dir):
    hazards = collect_hazards(sf_dir, out_dir)
    for h in hazards:
        print("FLAG", h)
    print(f"{len(hazards)} hazards")
    return 1 if hazards else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
