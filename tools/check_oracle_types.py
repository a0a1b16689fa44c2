#!/usr/bin/env python3
"""Static dtype-pairing gate: Spark dump schema vs DuckDB oracle types.

Usage: python3 tools/check_oracle_types.py <sfDir> <verifyOutDir> \
           [--report PATH] [--selftest]

The driver's correctness compare hashes VALUE REPRS after pandas conversion,
so value-equal results can still fail when the two engines' column types
render differently (round 12: DuckDB types a terminal `sum(BIGINT)` as
HUGEINT, pandas renders HUGEINT float64, and Spark's BIGINT "10" hashes
differently from "10.0"). This check catches the whole class STATICALLY —
`duckdb.sql(...)` resolves output types without executing, so all oracles
check in seconds:

  * any HUGEINT/UHUGEINT terminal oracle column  -> FAIL (cast ::BIGINT);
  * any DECIMAL terminal column on either side   -> FAIL (pandas renders
    DuckDB decimals float64 but pyarrow decimals object(Decimal) — repr
    skew; cast to DOUBLE or BIGINT);
  * any list/struct/map terminal column          -> FAIL (the driver's
    pandas sort crashes on unhashable cells — the q217 lesson);
  * int-vs-float pairing (either direction)      -> FAIL ("10" vs "10.0");
  * float32-vs-float64 pairing                   -> FAIL (shortest-repr
    skew: str(float32(0.1)) = "0.1" but its float64 widening reprs
    "0.10000000149...");
  * any remaining cross-class pairing            -> FAIL.

Exit 0 = every (query, column) pairing explained; nonzero otherwise.
"""
import sys, json, glob, os, argparse

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def duck_class(t):
    """DuckDB type -> (class, detail) as pandas/the driver will see it."""
    s = str(t).upper()
    if s in ("HUGEINT", "UHUGEINT"):
        return ("HUGEINT", s)
    if s.startswith("DECIMAL"):
        return ("decimal", s)
    if s in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return ("int", s)
    if s == "FLOAT":
        return ("float32", s)
    if s == "DOUBLE":
        return ("float64", s)
    if s == "BOOLEAN":
        return ("bool", s)
    if s.startswith("VARCHAR"):
        return ("str", s)
    if s.startswith("TIMESTAMP"):
        return ("timestamp", s)
    if s == "DATE":
        return ("date", s)
    if s.endswith("[]") or s.startswith(("STRUCT", "MAP", "LIST", "UNION")):
        return ("nested", s)
    return ("other", s)


def arrow_class(t):
    """pyarrow type (Spark's parquet dump) -> (class, detail)."""
    import pyarrow as pa
    if pa.types.is_integer(t):
        return ("int", str(t))
    if pa.types.is_float32(t):
        return ("float32", str(t))
    if pa.types.is_float64(t):
        return ("float64", str(t))
    if pa.types.is_decimal(t):
        return ("decimal", str(t))
    if pa.types.is_boolean(t):
        return ("bool", str(t))
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return ("str", str(t))
    if pa.types.is_timestamp(t):
        return ("timestamp", str(t))
    if pa.types.is_date(t):
        return ("date", str(t))
    if (pa.types.is_list(t) or pa.types.is_large_list(t)
            or pa.types.is_struct(t) or pa.types.is_map(t)):
        return ("nested", str(t))
    return ("other", str(t))


def check_query(name, sql, out_dir, con):
    """Returns a list of violation strings (empty = clean)."""
    import pyarrow.parquet as pq
    bad = []
    try:
        rel = con.sql(sql)  # resolves types WITHOUT executing
        duck = dict(zip(rel.columns, [duck_class(t) for t in rel.types]))
    except Exception as e:
        return [f"oracle does not resolve: {str(e).splitlines()[0][:200]}"]
    for c, (cls, det) in duck.items():
        if cls == "HUGEINT":
            bad.append(f"oracle col {c}: {det} (cast ::BIGINT)")
        elif cls == "decimal":
            bad.append(f"oracle col {c}: terminal {det} (cast to DOUBLE/BIGINT)")
        elif cls == "nested":
            bad.append(f"oracle col {c}: nested type {det} (driver pandas sort crashes)")
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        bad.append("no spark dump to pair against")
        return bad
    schema = pq.read_schema(files[0])
    spark = {f.name: arrow_class(f.type) for f in schema}
    for c, (cls, det) in spark.items():
        if cls == "decimal":
            bad.append(f"spark col {c}: terminal decimal {det}")
        elif cls == "nested":
            bad.append(f"spark col {c}: nested type {det} (driver pandas sort crashes)")
    if set(spark) != set(duck):
        bad.append(f"column sets differ: spark={sorted(spark)} duck={sorted(duck)}")
        return bad
    for c in sorted(spark):
        scls, sdet = spark[c]
        dcls, ddet = duck[c]
        if dcls in ("HUGEINT", "decimal", "nested") or scls in ("decimal", "nested"):
            continue  # already reported above
        if scls != dcls and {scls, dcls} != {"timestamp", "date"}:
            # timestamp-vs-date is the one benign cross-class pairing:
            # pandas converts a DuckDB DATE to datetime64 just like a
            # timestamp, so both sides repr identically (q101 passes the
            # driver's hash with exactly this pairing)
            bad.append(f"col {c}: spark {scls}({sdet}) vs oracle {dcls}({ddet})")
    return bad


def selftest(con):
    """The gate must FLAG a deliberately uncast integer sum, a terminal
    decimal, and a nested column — and PASS their cast forms."""
    got = {}
    for label, sql in [
        ("hugeint", "SELECT sum(l_quantity::BIGINT) AS s FROM lineitem"),
        ("decimal", "SELECT sum(l_quantity::BIGINT)::DECIMAL(18,4) AS s FROM lineitem"),
        ("nested",  "SELECT [1, 2] AS s"),
        ("clean",   "SELECT sum(l_quantity::BIGINT)::BIGINT AS s FROM lineitem"),
    ]:
        rel = con.sql(sql)
        cls = duck_class(rel.types[0])[0]
        got[label] = cls
    assert got["hugeint"] == "HUGEINT", got
    assert got["decimal"] == "decimal", got
    assert got["nested"] == "nested", got
    assert got["clean"] == "int", got
    print("[types] selftest OK (uncast sum flagged HUGEINT; cast form clean)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("out_dir")
    ap.add_argument("--report", default=None)
    ap.add_argument("--selftest", action="store_true")
    args = ap.parse_args()
    import duckdb
    con = duckdb.connect()
    con.execute("SET threads TO 4")
    for t in TABLES:
        p = f"{args.sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    if args.selftest:
        selftest(con)
    oracles = json.load(open(f"{args.out_dir}/oracle_sql.json"))
    report, n_bad = {}, 0
    for name in sorted(oracles):
        bad = check_query(name, oracles[name], args.out_dir, con)
        report[name] = bad
        if bad:
            n_bad += 1
            for b in bad:
                print(f"{name}: TYPE-FAIL {b}", flush=True)
    if args.report:
        with open(args.report, "w") as f:
            json.dump({"n_total": len(oracles), "n_bad": n_bad,
                       "violations": {k: v for k, v in report.items() if v}},
                      f, indent=1)
    print(f"[types] {len(oracles) - n_bad}/{len(oracles)} oracles dtype-clean")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
