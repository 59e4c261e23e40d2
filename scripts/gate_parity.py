"""Run named driver gates (from __spark_entry__) against their DuckDB
oracles at sf0.01 and diff sorted results — the per-round development
feedback loop (usage: python scripts/gate_parity.py t23 q25 ...)."""

import sys

import duckdb

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


def compare(name, sdf, con, sql):
    import pandas as pd

    sp = sdf.toPandas()
    du = con.execute(sql).df()
    sp = sp[sorted(sp.columns)]
    du = du[sorted(du.columns)]
    # harmonize datetime representations: Spark DATE -> object of
    # datetime.date while DuckDB DATE -> datetime64[us]; and ns-vs-us
    # resolutions compare raw int64 under check_exact
    import datetime as _dt

    import pandas as _pd

    for frame in (sp, du):
        for c in frame.columns:
            if str(frame[c].dtype).startswith("datetime64"):
                frame[c] = frame[c].astype("datetime64[us]")
            elif frame[c].dtype == object:
                nn = frame[c].dropna()
                if len(nn) and isinstance(nn.iloc[0], (_dt.date, _dt.datetime)):
                    frame[c] = _pd.to_datetime(frame[c]).astype("datetime64[us]")
    sp = sp.sort_values(list(sp.columns)).reset_index(drop=True)
    du = du.sort_values(list(du.columns)).reset_index(drop=True)
    ok_rows = len(sp) == len(du)
    ok_cols = list(sp.columns) == list(du.columns)
    ok_vals = False
    if ok_rows and ok_cols:
        try:
            pd.testing.assert_frame_equal(sp, du, check_dtype=False, check_exact=True)
            ok_vals = True
        except AssertionError as e:
            print(f"[{name}] VALUE MISMATCH: {str(e)[:600]}")
    print(
        f"[{name}] rows spark={len(sp)} duck={len(du)} cols_ok={ok_cols} "
        f"vals_ok={ok_vals}"
    )
    if not (ok_rows and ok_cols and ok_vals):
        print(" spark cols:", list(sp.columns))
        print(" duck  cols:", list(du.columns))
        print(" spark:\n", sp.head(8).to_string())
        print(" duck :\n", du.head(8).to_string())
    return ok_rows and ok_cols and ok_vals


def main():
    import __spark_entry__ as entry
    from stepist_spark.session import get_spark

    names = sys.argv[1:]
    qs = entry.queries()
    oracles = entry.oracle_sql()
    targets = [n for n in qs if any(n.startswith(p) for p in names)] if names else list(qs)
    spark = get_spark()
    con = duck()
    ok = True
    for n in targets:
        if n not in oracles:
            print(f"[{n}] (rows-only gate, skipping value diff)")
            continue
        try:
            ok &= compare(n, qs[n](spark, SF), con, oracles[n])
        except Exception as e:
            ok = False
            print(f"[{n}] ERROR: {type(e).__name__}: {str(e)[:600]}")
    print("ALL OK" if ok else "FAILURES")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
