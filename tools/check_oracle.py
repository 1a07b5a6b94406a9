#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate: run Verify's parquet
dumps against the DuckDB oracle SQL and hash-compare (columns sorted by name,
rows sorted, values stringified EXACTLY as-is — no float rounding collapse).

Driver parity notes (round 6 lesson): the driver stringifies raw values, so
an oracle-side HUGEINT/DECIMAL that lands in pandas as float64 prints "3.0"
where Spark's int64 prints "3" — a hash MISMATCH. The old %.9g formatting
here collapsed 3.0 -> 3 and masked exactly that class of bug. Values are now
hashed via plain str(), and pandas dtypes are compared too, so a type-skewed
oracle FAILS locally the same way it fails the driver.

Usage: check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, os, json, hashlib
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def normalize_dates(df):
    # pyarrow reads a Spark DATE as datetime.date objects; duckdb's .df()
    # yields datetime64 — but DATE-output queries (q54) PASS the driver's
    # gate, so the driver normalizes dates (unlike decimals, which failed
    # q66 in round 6). Mirror that: fold date objects into timestamps.
    import datetime, pandas as pd
    for c in df.columns:
        if df[c].dtype == object:
            nn = df[c].dropna()
            if len(nn) and isinstance(nn.iloc[0], datetime.date) \
               and not isinstance(nn.iloc[0], datetime.datetime):
                df = df.assign(**{c: pd.to_datetime(df[c])})
    return df

def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    h = hashlib.sha256()
    for row in df.itertuples(index=False):
        h.update(("|".join(str(v) for v in row) + "\n").encode())
    return h.hexdigest(), len(df)

def dtypes_of(df):
    # Compare numpy KIND (i/u/f/b/O/M), not exact width: int32 vs int64
    # stringify identically in both engines (driver passes them), but
    # int vs float is exactly the "3" vs "3.0" skew the driver fails on.
    def kind(dt):
        k = getattr(dt, "kind", "O")
        return "i" if k == "u" else k
    return {c: kind(df[c].dtype) for c in df.columns}

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    failures = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        # pyarrow, NOT duckdb: the driver reads the Spark side faithfully
        # (int64 stays int64, DECIMAL becomes Decimal objects) while its
        # oracle side goes through duckdb.df() (which floats decimals) —
        # loading both sides through duckdb here would hide exactly that
        # asymmetry (it hid the decimal-vs-float skew until round 7).
        import pandas as _pd
        got = normalize_dates(_pd.read_parquet(d))
        if name not in oracle:
            print(f"{name:28s} rows={len(got):7d}  (no oracle: rows-only check)"
                  + ("  EMPTY!" if len(got) == 0 else ""))
            continue
        try:
            want = normalize_dates(con.sql(oracle[name]).df())
        except Exception as e:
            print(f"{name:28s} ORACLE SQL ERROR: {e}")
            failures += 1
            continue
        gh, gn = canon(got)
        wh, wn = canon(want)
        dt_ok = dtypes_of(got) == dtypes_of(want)
        ok = gh == wh and dt_ok
        if not ok:
            failures += 1
        print(f"{name:28s} rows={gn:7d} oracle_rows={wn:7d} "
              f"schema={'OK' if sorted(got.columns)==sorted(want.columns) else 'MISMATCH'} "
              f"dtypes={'OK' if dt_ok else 'MISMATCH'} "
              f"hash={'OK' if gh == wh else 'MISMATCH'}")
        if not dt_ok:
            gd, wd = dtypes_of(got), dtypes_of(want)
            for c in sorted(set(gd) | set(wd)):
                if gd.get(c) != wd.get(c):
                    print(f"   dtype {c}: got={gd.get(c)} want={wd.get(c)}")
        if not ok and sorted(got.columns) == sorted(want.columns) and gn == wn:
            g = got[sorted(got.columns)].sort_values(by=sorted(got.columns)).reset_index(drop=True)
            w = want[sorted(want.columns)].sort_values(by=sorted(want.columns)).reset_index(drop=True)
            for i in range(min(len(g), 200000)):
                if tuple(map(str, g.iloc[i])) != tuple(map(str, w.iloc[i])):
                    print(f"   first diff at sorted row {i}:")
                    print(f"   got : {list(g.iloc[i])}")
                    print(f"   want: {list(w.iloc[i])}")
                    break
    print("FAILURES:", failures)
    return failures

if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)
