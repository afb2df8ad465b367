#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: read Verify's parquet
dumps, run each oracle SQL in DuckDB over the same sf tables, compare
(sorted columns, sorted rows, exact values). Usage:
    python3 tools/oracle_check.py <sfDir> <verifyOutDir>
"""
import json, math, re, sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Wide integral decimals (DuckDB HUGEINT / DECIMAL(>18,0)) are rendered
# differently by the driver's hash pipeline per engine (exact int128 vs
# float64), so value-identical frames still hash-mismatch — exactly how
# nine round-4 rows shipped red while this mirror said PASS (fetchdf()
# converts HUGEINT to float64, masking the divergence). Gate the TYPES of
# both result frames, not just the fetched values.
_DEC = re.compile(r"DECIMAL\((\d+),(\d+)\)")


def wide_cols(cols_types):
    bad = []
    for c, t in cols_types:
        s = str(t)
        if s in ("HUGEINT", "UHUGEINT"):
            bad.append(f"{c}:{s}")
        else:
            m = _DEC.fullmatch(s)
            if m and int(m.group(2)) == 0 and int(m.group(1)) > 18:
                bad.append(f"{c}:{s}")
    return bad


def normalize(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def compare(name, spark_df, duck_df):
    if sorted(spark_df.columns) != sorted(duck_df.columns):
        return f"SCHEMA cols spark={sorted(spark_df.columns)} duck={sorted(duck_df.columns)}"
    if len(spark_df) != len(duck_df):
        return f"ROWS spark={len(spark_df)} duck={len(duck_df)}"
    a, b = normalize(spark_df), normalize(duck_df)
    for c in a.columns:
        av, bv = a[c].tolist(), b[c].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if x is None and y is None:
                continue
            if isinstance(x, float) and isinstance(y, float):
                if math.isnan(x) and math.isnan(y):
                    continue
                if x != y:
                    return f"VAL col={c} row={i} spark={x!r} duck={y!r} (diff={abs(x-y)})"
            elif x != y:
                fx = float(x) if x is not None else None
                fy = float(y) if y is not None else None
                try:
                    d = abs(fx - fy)
                except Exception:
                    d = "?"
                return f"VAL col={c} row={i} spark={x!r} duck={y!r} (diff={d})"
    return None


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    oracle = json.loads(Path(f"{out_dir}/oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    n_pass = n_fail = 0
    for name in sorted(oracle):
        spark_path = f"{out_dir}/{name}"
        if not Path(spark_path).exists():
            print(f"FAIL {name}: no spark output");  n_fail += 1;  continue
        try:
            spark_df = con.execute(
                f"SELECT * FROM '{spark_path}/*.parquet'").fetchdf()
            spark_desc = con.execute(
                f"DESCRIBE SELECT * FROM '{spark_path}/*.parquet'").fetchall()
            duck_rel = con.sql(oracle[name])
            duck_types = list(zip(duck_rel.columns, duck_rel.types))
            duck_df = duck_rel.fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {e}");  n_fail += 1;  continue
        wide = wide_cols([(r[0], r[1]) for r in spark_desc]) \
            + wide_cols(duck_types)
        if wide:
            print(f"FAIL {name}: WIDE-TYPE {wide} — driver hash renders "
                  "HUGEINT/DECIMAL(>18,0) differently per engine; cast to "
                  "BIGINT/DOUBLE in the final select of BOTH engines")
            n_fail += 1
            continue
        err = compare(name, spark_df, duck_df)
        if err:
            print(f"FAIL {name}: {err}");  n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_df)} rows)");  n_pass += 1
    # queries without oracle → rows-only
    for d in sorted(Path(out_dir).iterdir()):
        if d.is_dir() and d.name not in oracle:
            try:
                n = con.execute(f"SELECT count(*) FROM '{d}/*.parquet'").fetchone()[0]
                print(f"ROWS-ONLY {d.name}: {n} rows {'OK' if n > 0 else 'EMPTY!'}")
            except Exception as e:
                print(f"ROWS-ONLY {d.name}: unreadable {e}")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
