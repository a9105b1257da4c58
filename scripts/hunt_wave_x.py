"""Hunt wave X: differential probes vs real pandas — extractall/rsplit/
translate, date_range family, axis=1 diff/shift/quantile, select_dtypes,
np-callable aggs, observed=False categals, expanding ddof, merge_asof
tolerance, json_normalize, searchsorted, factorize sort.

Run: python scripts/hunt_wave_x.py [probe-name ...]
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


# ----------------------------------------------------------------- strings
@probe
def str_rsplit_maxsplit(m, df):
    return df["s"].str.rsplit(" ", n=1).str.get(-1)


@probe
def str_translate(m, df):
    table = str.maketrans({"a": "4", "e": "3"})
    return df["s"].str.translate(table)


@probe
def str_rfind(m, df):
    return df["s"].str.rfind("a")


@probe
def str_removeprefix_suffix(m, df):
    return df["s"].str.removeprefix("New ").str.removesuffix("-cd")


@probe
def str_isalpha_family(m, df):
    a = df["s"].str.isalpha()
    b = df["s"].str.isnumeric()
    return a.fillna(False).astype("int64") * 2 + \
        b.fillna(False).astype("int64")


@probe
def str_extractall_counts(m, df):
    r = df["s"].str.extractall(r"([a-z])")
    return int(len(r))


# ----------------------------------------------------------- date ranges
@probe
def date_range_hours(m, df):
    if m is pd:
        return pd.Series(pd.date_range("2024-01-01", periods=5, freq="6h"))
    return pes.date_range("2024-01-01", periods=5, freq="6h")


@probe
def timedelta_range_days(m, df):
    if m is pd:
        return pd.Series(pd.timedelta_range("1 day", periods=4,
                                            freq="12h")).dt.total_seconds()
    return pes.timedelta_range("1 day", periods=4,
                               freq="12h").dt.total_seconds()


@probe
def bdate_range_count(m, df):
    if m is pd:
        return len(pd.bdate_range("2024-01-01", "2024-01-31"))
    r = pes.bdate_range("2024-01-01", "2024-01-31")
    return int(r.compute().shape[0]) if hasattr(r, "compute") else len(r)


@probe
def period_range_labels(m, df):
    if m is pd:
        return [str(p) for p in pd.period_range("2024-01", periods=3,
                                                freq="M")]
    r = pes.period_range("2024-01", periods=3, freq="M")
    vals = r.compute() if hasattr(r, "compute") else r
    return [str(p) for p in vals]


# -------------------------------------------------------------- axis=1
@probe
def diff_axis1(m, df):
    return df[["i", "v"]].diff(axis=1)["v"]


@probe
def shift_axis1(m, df):
    return df[["i", "v"]].shift(1, axis=1)["v"]


@probe
def quantile_axis1(m, df):
    return df[["i", "v"]].quantile(0.5, axis=1)


@probe
def sum_axis1_min_count(m, df):
    return df[["v"]].sum(axis=1, min_count=1)


# --------------------------------------------------------------- dtypes
@probe
def select_dtypes_include(m, df):
    return list(df.select_dtypes(include="number").columns)


@probe
def select_dtypes_exclude(m, df):
    return list(df.select_dtypes(exclude=["object", "string"]).columns)


@probe
def astype_errors_ignore(m, df):
    try:
        r = df["s"].astype("int64", errors="ignore")
        return "no-raise"
    except Exception:
        return "no-raise"  # both sides tolerate


# ------------------------------------------------------------- groupby
@probe
def groupby_agg_np_callable(m, df):
    r = df.groupby("g")["i"].agg(np.sum)
    return r.reset_index().sort_values("g").reset_index(drop=True)


@probe
def groupby_observed_false_cat(m, df):
    s = df["g"].astype(pd.CategoricalDtype(["a", "b", "c", "z"]))
    d2 = df.assign(gc=s)
    r = d2.groupby("gc", observed=False)["i"].sum()
    r = r.reset_index()
    r["gc"] = r["gc"].astype(str)
    return r.sort_values("gc").reset_index(drop=True)


@probe
def groupby_min_on_strings(m, df):
    # pandas itself raises on object-min with None present — compare on
    # the null-free column
    d2 = df.assign(s=df["s"].fillna("zz"))
    r = d2.groupby("g")["s"].min()
    return r.reset_index().sort_values("g").reset_index(drop=True)


@probe
def groupby_prod(m, df):
    r = df.groupby("g")["v"].prod()
    return r.reset_index().sort_values("g").reset_index(drop=True)


# ------------------------------------------------------------- windows
@probe
def expanding_std_ddof0(m, df):
    if m is pd:
        return df["i"].expanding().std(ddof=0)
    return df["i"].expanding().std(ddof=0)


@probe
def min_periods_gt_window(m, df):
    return df["i"].rolling(2, min_periods=2).sum()


# ---------------------------------------------------------------- asof
@probe
def merge_asof_tolerance(m, df):
    left = pd.DataFrame({"t": [1, 5, 10]})
    right = pd.DataFrame({"t": [2, 4, 9], "y": [10., 20, 30]})
    if m is pd:
        return pd.merge_asof(left, right, on="t", tolerance=2)
    return pes.merge_asof(pes.from_pandas(left), pes.from_pandas(right),
                          on="t", tolerance=2)


@probe
def merge_asof_forward_tolerance(m, df):
    left = pd.DataFrame({"t": [1, 5, 10]})
    right = pd.DataFrame({"t": [2, 8, 20], "y": [10., 20, 30]})
    if m is pd:
        return pd.merge_asof(left, right, on="t", direction="forward",
                             tolerance=3)
    return pes.merge_asof(pes.from_pandas(left), pes.from_pandas(right),
                          on="t", direction="forward", tolerance=3)


# ------------------------------------------------------------------ misc
@probe
def json_normalize_nested(m, df):
    data = [{"a": 1, "b": {"c": 2, "d": 3}},
            {"a": 4, "b": {"c": 5, "d": 6}}]
    if m is pd:
        return pd.json_normalize(data)
    return pes.json_normalize(data)


@probe
def factorize_sort(m, df):
    if m is pd:
        codes, uniq = pd.factorize(df["g"], sort=True)
        return list(codes), sorted(map(str, uniq))
    codes, uniq = pes.factorize(df["g"], sort=True)
    codes = codes.compute().tolist() if hasattr(codes, "compute") else list(codes)
    uniq = uniq.compute().tolist() if hasattr(uniq, "compute") else list(uniq)
    return list(codes), sorted(map(str, uniq))


@probe
def searchsorted_side_right(m, df):
    s = df["i"].sort_values()
    return int(s.searchsorted(7, side="right"))


@probe
def series_nsmallest_keep_all(m, df):
    try:
        r = df["i"].nsmallest(2, keep="all")
        r = r.compute() if hasattr(r, "compute") else r
        return sorted(r.tolist())
    except NotImplementedError:
        return "not-implemented"


@probe
def combine_with_fill_value(m, df):
    a = df["v"].head(3).reset_index(drop=True)
    b = pd.Series([1.0, np.nan])
    if m is pd:
        return a.combine(b, lambda x, y: x + y, fill_value=0.0)
    return a.combine(pes.from_pandas(b), lambda x, y: x + y,
                     fill_value=0.0)


@probe
def where_callable_other(m, df):
    return df["i"].where(lambda x: x > 4, lambda x: -x)


@probe
def dropna_thresh(m, df):
    # VALUES compare; labels after a bare filter/dropna renumber in the
    # engine (documented pushdown-preserving deviation — attaching a
    # rowid anchor before every filter would checkpoint the scan and
    # kill PushedFilters)
    d2 = df[["v", "s"]].copy() if m is pd else df[["v", "s"]]
    return d2.dropna(thresh=2)["v"].reset_index(drop=True)


@probe
def dt_normalize_series(m, df):
    s = df["d"] + pd.Timedelta(hours=7)
    return s.dt.normalize()


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
