"""Hunt wave U: differential probes vs real pandas — categorical ops,
timedelta family, merge_asof corners, frame apply/transform, io
round-trips, nullable dtypes, string/object mixing, window min_periods
edge cases, df-level fill/clip, Series accessor chains.

Run: python scripts/hunt_wave_u.py [probe-name ...]
"""
from __future__ import annotations

import sys
import traceback

sys.path.insert(0, "/root/repo")

import numpy as np
import pandas as pd

import pandas_expr_spark as pes

PROBES = []


def probe(fn):
    PROBES.append((fn.__name__, fn))
    return fn


def base_df():
    return pd.DataFrame({
        "g": list("abcabca"),
        "v": [1.5, -2.5, 3.5, np.nan, 2.5, 0.5, -0.5],
        "i": [10, 3, 7, 3, 10, 1, 5],
        "s": ["New York", "ab-cd", "", "xx yy", None, "AB", "b"],
        "d": pd.to_datetime(["2024-01-31", "2024-02-29", "2024-03-15",
                             "2024-07-04", "2023-12-31", "2024-06-30",
                             "2024-02-01"]),
    })


def run_pair(fn):
    want = fn(pd, base_df())
    got = fn(pes, pes.from_pandas(base_df()))
    if hasattr(got, "compute"):
        got = got.compute()
    return want, got


def cmp(want, got):
    if isinstance(want, pd.DataFrame):
        if not isinstance(got, pd.DataFrame):
            return "FAIL", f"type: want DataFrame got {type(got).__name__}"
        wc, gc = [str(c) for c in want.columns], [str(c) for c in got.columns]
        if wc != gc:
            return "FAIL", f"cols: {wc} vs {gc}"
        if len(want) != len(got):
            return "FAIL", f"len: {len(want)} vs {len(got)}"
        w, g = want.reset_index(drop=True), got.reset_index(drop=True)
        for c1, c2 in zip(want.columns, got.columns):
            st, d = _cmp_col(w[c1], g[c2], str(c1))
            if st != "OK":
                return st, d
        return "OK", ""
    if isinstance(want, pd.Series):
        if not isinstance(got, pd.Series):
            return "FAIL", f"type: want Series got {type(got).__name__}"
        if len(want) != len(got):
            return "FAIL", f"len: {len(want)} vs {len(got)}"
        st, d = _cmp_col(want.reset_index(drop=True),
                         got.reset_index(drop=True), "values")
        if st != "OK":
            return st, d
        wi, gi = list(map(str, want.index)), list(map(str, got.index))
        if wi != gi:
            return "FAIL", f"index: {wi[:6]} vs {gi[:6]}"
        return "OK", ""
    if isinstance(want, float) and isinstance(got, float):
        if (want != want and got != got) or np.isclose(want, got):
            return "OK", ""
        return "FAIL", f"{want!r} vs {got!r}"
    if want != got:
        return "FAIL", f"{want!r} vs {got!r}"
    return "OK", ""


def _cmp_col(w, g, name):
    import pandas.api.types as pt
    if pt.is_float_dtype(w) or pt.is_float_dtype(g):
        try:
            wv = w.astype("float64").to_numpy()
            gv = g.astype("float64").to_numpy()
        except (ValueError, TypeError):
            return "FAIL", f"{name}: float cast failed"
        if not np.allclose(wv, gv, equal_nan=True, rtol=1e-9, atol=1e-12):
            bad = np.where(~np.isclose(wv, gv, equal_nan=True))[0][:4]
            return "FAIL", f"{name}: {[(wv[i], gv[i]) for i in bad]}"
        return "OK", ""
    wl = ["<NA>" if pd.isna(x) else str(x) for x in w.tolist()]
    gl = ["<NA>" if pd.isna(x) else str(x) for x in g.tolist()]
    if wl != gl:
        i = next(i for i, (a, b) in enumerate(zip(wl, gl)) if a != b)
        return "FAIL", f"{name}[{i}]: {wl[i]!r} vs {gl[i]!r}"
    return "OK", ""


# --------------------------------------------------------------- categorical
@probe
def cat_reorder_and_sort(m, df):
    s = df["g"].astype(pd.CategoricalDtype(["c", "a", "b"], ordered=True))
    return s.sort_values().astype(str).reset_index(drop=True)


@probe
def cat_add_remove_categories(m, df):
    s = df["g"].astype("category")
    if m is pd:
        return s.cat.add_categories(["z"]).cat.categories.tolist()
    return s.cat.add_categories(["z"]).cat.categories


@probe
def cat_value_counts_includes_unobserved(m, df):
    s = df["g"].astype(pd.CategoricalDtype(["a", "b", "c", "z"]))
    r = s.value_counts()
    r = r.reset_index()
    r = r.rename(columns=dict(zip(list(r.columns), ["g", "count"])))
    return r.sort_values(["count", "g"],
                         ascending=[False, True]).reset_index(drop=True)


# ---------------------------------------------------------------- timedelta
@probe
def timedelta_components(m, df):
    td = df["d"] - df["d"].shift(2)
    return td.dt.days


@probe
def timedelta_seconds_accessor(m, df):
    td = (df["d"] + pd.Timedelta(hours=5, seconds=31)) - df["d"]
    return td.dt.seconds


@probe
def timedelta_div_timedelta(m, df):
    a = df["d"] - df["d"].shift(1)
    return a / pd.Timedelta(days=1)


@probe
def timedelta_sum(m, df):
    td = (df["d"] - df["d"].shift(1)).dropna()
    tot = td.sum()
    if m is not pd:
        tot = tot.compute()
    return float(tot.total_seconds())


@probe
def to_timedelta_strings(m, df):
    if m is pd:
        return pd.to_timedelta(pd.Series(["1 days", "3 hours", None])) \
            .dt.total_seconds()
    return m.to_timedelta(
        m.from_pandas(pd.Series(["1 days", "3 hours", None]))) \
        .dt.total_seconds()


# --------------------------------------------------------------- merge_asof
@probe
def merge_asof_by_group(m, df):
    left = pd.DataFrame({"t": [1, 5, 10, 3, 7], "g": list("aabba"),
                         "x": range(5)}).sort_values("t")
    right = pd.DataFrame({"t": [2, 4, 8, 1, 6], "g": list("abbaa"),
                          "y": [10., 20, 30, 40, 50]}).sort_values("t")
    if m is pd:
        return pd.merge_asof(left, right, on="t", by="g")
    return m.merge_asof(m.from_pandas(left), m.from_pandas(right),
                        on="t", by="g")


@probe
def merge_asof_allow_exact_false(m, df):
    left = pd.DataFrame({"t": [1, 3, 5]})
    right = pd.DataFrame({"t": [1, 3, 5], "y": [10., 20, 30]})
    if m is pd:
        return pd.merge_asof(left, right, on="t", allow_exact_matches=False)
    return m.merge_asof(m.from_pandas(left), m.from_pandas(right),
                        on="t", allow_exact_matches=False)


# -------------------------------------------------------------- frame apply
@probe
def frame_apply_axis0_reduce(m, df):
    r = df[["i", "v"]].apply(lambda s: s.max() - s.min())
    return r.sort_index().reset_index()


@probe
def frame_apply_axis1(m, df):
    return df[["i", "v"]].fillna(0).apply(
        lambda row: row["i"] + row["v"], axis=1)


@probe
def series_transform_str(m, df):
    return df["i"].transform("sqrt")


@probe
def frame_transform_dict(m, df):
    r = df[["i", "v"]].transform({"i": "cumsum", "v": "abs"})
    return r


# ----------------------------------------------------------- nullable dtypes
@probe
def int64_na_roundtrip(m, df):
    s = pd.Series([1, None, 3], dtype="Int64")
    if m is pd:
        return s.fillna(-1).astype("int64")
    return pes.from_pandas(s).fillna(-1).astype("int64")


@probe
def boolean_na_roundtrip(m, df):
    s = pd.Series([True, None, False], dtype="boolean")
    if m is pd:
        return s.fillna(False).astype("bool")
    return pes.from_pandas(s).fillna(False).astype("bool")


@probe
def string_dtype_ops(m, df):
    s = pd.Series(["a", None, "c"], dtype="string")
    if m is pd:
        return s.str.upper().fillna("?")
    return pes.from_pandas(s).str.upper().fillna("?")


# ------------------------------------------------------------------ windows
@probe
def rolling_count_min_periods_0(m, df):
    return df["v"].rolling(3, min_periods=1).count()


@probe
def expanding_min_periods_3(m, df):
    return df["i"].expanding(min_periods=3).sum()


@probe
def cummin_int_dtype(m, df):
    return df["i"].cummin()


@probe
def groupby_rolling_mean_reset(m, df):
    r = df.groupby("g")["i"].rolling(2).mean()
    return pd.Series(r.reset_index(drop=True)) if m is pd else \
        r.reset_index(drop=True)


# ------------------------------------------------------------------- fills
@probe
def frame_ffill_axis0(m, df):
    return df[["v", "i"]].ffill()["v"]


@probe
def frame_bfill(m, df):
    return df[["v"]].bfill()["v"]


@probe
def fillna_method_df(m, df):
    return df[["v"]].fillna(value=0.0)["v"]


@probe
def clip_frame(m, df):
    return df[["i", "v"]].clip(lower=1, upper=8)["i"]


# ------------------------------------------------------------- io roundtrip
@probe
def parquet_roundtrip(m, df):
    import tempfile
    import os
    path = os.path.join(tempfile.mkdtemp(), "t.parquet")
    if m is pd:
        df.to_parquet(path)
        r = pd.read_parquet(path)
        return r["i"].sum() * 1.0
    df.to_parquet(path)
    r = pes.read_parquet(path)
    return float(r["i"].sum())


@probe
def csv_roundtrip(m, df):
    import tempfile
    import os
    d = tempfile.mkdtemp()
    path = os.path.join(d, "t.csv")
    if m is pd:
        df[["g", "i"]].to_csv(path, index=False)
        return pd.read_csv(path)["i"].sum() * 1.0
    df[["g", "i"]].to_csv(path, index=False)
    return float(pes.read_csv(path)["i"].sum())


# ------------------------------------------------------------------- chains
@probe
def str_chain_split_get(m, df):
    return df["s"].str.split(" ").str.get(0).str.upper()


@probe
def dt_chain_month_name_lower(m, df):
    return df["d"].dt.month_name().str.lower().str[:3]


@probe
def sorted_head_then_groupby(m, df):
    r = df.sort_values("i").head(5).groupby("g")["i"].sum()
    return r.reset_index().sort_values("g").reset_index(drop=True)


@probe
def filter_assign_sort_cumsum(m, df):
    d2 = df[df["i"] > 2]
    d2 = d2.assign(cs=d2.sort_values("i")["i"].cumsum())
    return d2["cs"].sort_values().reset_index(drop=True)


@probe
def abs_then_nlargest(m, df):
    return df["v"].abs().nlargest(3).reset_index(drop=True)


@probe
def rank_then_filter(m, df):
    r = df["i"].rank(method="dense")
    return df[r > 2]["i"].reset_index(drop=True)


@probe
def value_counts_head(m, df):
    r = df["g"].value_counts().head(2)
    return r.reset_index().rename(columns=dict(
        zip(["index", "g", "count"], ["g", "g", "n"])))[["g"]]


@probe
def series_astype_int32_overflowish(m, df):
    return (df["i"] * 1000000).astype("int32")


@probe
def series_floordiv_series(m, df):
    return df["i"] // (df["i"].shift(1).fillna(1))


@probe
def series_divmod_like(m, df):
    q = df["i"] // 3
    r = df["i"] % 3
    return (q + r).reset_index(drop=True)


def main():
    only = set(sys.argv[1:])
    fails = []
    for name, fn in PROBES:
        if only and name not in only:
            continue
        try:
            want, got = run_pair(fn)
        except Exception as exc:  # noqa: BLE001
            tb = traceback.format_exc().splitlines()
            print(f"ERR  {name}: {type(exc).__name__}: {exc} | "
                  f"{tb[-3].strip()[:110]}")
            fails.append(name)
            continue
        st, detail = cmp(want, got)
        print(f"{st:4s} {name}" + (f": {detail}" if detail else ""))
        if st != "OK":
            fails.append(name)
    print(f"\nfails: {fails}")


if __name__ == "__main__":
    main()
