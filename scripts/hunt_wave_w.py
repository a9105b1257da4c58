"""Hunt wave W: differential probes vs real pandas — multi-column
explode, frame value_counts, dt flag family, map na_action, to_datetime
units, groupby-resample, frame rank/idxmin, sort multi-key corners,
at_time/first/last, crosstab values, unstack fill_value.

Run: python scripts/hunt_wave_w.py [probe-name ...]
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
        "d": pd.to_datetime(["2024-01-31 09:30", "2024-02-29 14:00",
                             "2024-03-15 09:30", "2024-07-04 23:59",
                             "2023-12-31 00:00", "2024-06-30 12:00",
                             "2024-02-01 09:30"]),
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


# ---------------------------------------------------------------- explode
@probe
def explode_multi_columns(m, df):
    base = pd.DataFrame({"k": [1, 2],
                         "a": [[1, 2], [3]],
                         "b": [["x", "y"], ["z"]]})
    if m is pd:
        return base.explode(["a", "b"])
    return pes.from_pandas(base).explode(["a", "b"])


@probe
def explode_preserve_other_cols(m, df):
    base = pd.DataFrame({"k": [1, 2], "a": [[1, 2], []]})
    if m is pd:
        r = base.explode("a")
        return r.fillna(-1)
    return pes.from_pandas(base).explode("a").fillna(-1)


# --------------------------------------------------------- frame aggs
@probe
def frame_value_counts(m, df):
    r = df[["g"]].value_counts()
    r = r.reset_index()
    return r.sort_values(["count", "g"],
                         ascending=[False, True]).reset_index(drop=True)


@probe
def frame_value_counts_subset_two(m, df):
    d2 = df.assign(h=["x", "y", "x", "y", "x", "y", "x"])
    r = d2[["g", "h"]].value_counts()
    r = r.reset_index()
    return r.sort_values(["count", "g", "h"],
                         ascending=[False, True, True]).reset_index(drop=True)


@probe
def frame_idxmin_axis0(m, df):
    r = df[["i", "v"]].idxmin()
    return sorted((str(k), int(v)) for k, v in r.items())


@probe
def frame_rank_axis0(m, df):
    return df[["i", "v"]].rank()["v"]


@probe
def frame_mode_axis0(m, df):
    # type-safe engine fill: string col takes a string fill (pandas
    # object columns accept any scalar — typed columns can't)
    r = df[["g", "i"]].mode()
    return r.fillna({"g": "-", "i": -1})


# ------------------------------------------------------------- dt flags
@probe
def dt_is_month_start_end(m, df):
    a = df["d"].dt.is_month_start.astype("int64")
    b = df["d"].dt.is_month_end.astype("int64")
    return a * 2 + b


@probe
def dt_is_quarter_year_start(m, df):
    a = df["d"].dt.is_quarter_start.astype("int64")
    b = df["d"].dt.is_year_start.astype("int64")
    c = df["d"].dt.is_year_end.astype("int64")
    return a * 4 + b * 2 + c


@probe
def dt_dayofyear_quarter(m, df):
    return df["d"].dt.dayofyear * 10 + df["d"].dt.quarter


@probe
def dt_time_accessor_str(m, df):
    return df["d"].dt.time.astype(str)


@probe
def dt_date_accessor_str(m, df):
    return df["d"].dt.date.astype(str)


# ------------------------------------------------------------ map/apply
@probe
def map_na_action_ignore(m, df):
    return df["s"].map(lambda x: len(x), na_action="ignore")


@probe
def map_dict_missing_to_nan(m, df):
    return df["g"].map({"a": 1.0, "b": 2.0})


@probe
def series_apply_with_args(m, df):
    return df["i"].apply(lambda x, k: x + k, args=(5,))


# --------------------------------------------------------- to_datetime
@probe
def to_datetime_unit_s(m, df):
    s = pd.Series([86400, 172800, None])
    if m is pd:
        return pd.to_datetime(s, unit="s")
    return pes.to_datetime(pes.from_pandas(s), unit="s")


@probe
def to_datetime_format_mixed(m, df):
    s = pd.Series(["31/01/2024", "29/02/2024"])
    if m is pd:
        return pd.to_datetime(s, format="%d/%m/%Y")
    return pes.to_datetime(pes.from_pandas(s), format="%d/%m/%Y")


# ----------------------------------------------------- time selection
@probe
def at_time_selection(m, df):
    s = df.set_index("d").sort_index()["i"]
    return s.at_time("09:30").reset_index()


@probe
def between_time_selection(m, df):
    s = df.set_index("d").sort_index()["i"]
    return s.between_time("09:00", "13:00").reset_index()


# ------------------------------------------------------------- groupby
@probe
def groupby_resample_sum(m, df):
    d2 = df.set_index("d").sort_index()
    if m is pd:
        r = d2.groupby("g")["i"].resample("QE").sum()
        return r.reset_index().sort_values(["g", "d"]).reset_index(drop=True)
    r = d2.groupby("g")["i"].resample("QE").sum()
    rr = r.compute() if hasattr(r, "compute") else r
    rr = rr.reset_index() if not isinstance(rr, pd.DataFrame) else rr
    return rr.sort_values(["g", "d"]).reset_index(drop=True)


@probe
def groupby_agg_two_series_specs(m, df):
    r = df.groupby("g").agg({"i": ["sum", "max"], "v": "mean"})
    r.columns = ["_".join(c).rstrip("_") if isinstance(c, tuple) else str(c)
                 for c in r.columns]
    return r.reset_index().sort_values("g").reset_index(drop=True)


@probe
def groupby_filter_len(m, df):
    r = df.groupby("g").filter(lambda x: len(x) > 2)
    return r["i"].reset_index(drop=True)


@probe
def groupby_head_per_group(m, df):
    r = df.groupby("g").head(1)
    return r["i"].reset_index(drop=True)


# ------------------------------------------------------------- reshape
@probe
def unstack_fill_value(m, df):
    d2 = df.assign(h=["x", "y", "x", "y", "x", "y", "x"])
    s = d2.groupby(["g", "h"])["i"].sum()
    if m is pd:
        r = s.unstack(fill_value=0)
        r = r.reset_index()
        r.columns = [str(c) for c in r.columns]
        return r
    r = s.unstack(fill_value=0)
    rr = r.compute() if hasattr(r, "compute") else r
    rr = rr.reset_index()
    rr.columns = [str(c) for c in rr.columns]
    return rr.sort_values("g").reset_index(drop=True)


@probe
def crosstab_values_aggfunc(m, df):
    d2 = df.assign(h=["x", "y", "x", "y", "x", "y", "x"])
    if m is pd:
        r = pd.crosstab(d2["g"], d2["h"], values=d2["i"], aggfunc="sum")
    else:
        r = pes.crosstab(d2["g"], d2["h"], values=d2["i"], aggfunc="sum")
    r = r.reset_index()
    r.columns = [str(c) for c in r.columns]
    return r.fillna(-1)


# ------------------------------------------------------------ sorting
@probe
def sort_multi_mixed_ascending(m, df):
    r = df.sort_values(["g", "i"], ascending=[True, False],
                       na_position="first")
    return r["i"].reset_index(drop=True)


@probe
def sort_then_dedup_keep_last(m, df):
    r = df.sort_values("i").drop_duplicates(subset=["g"], keep="last")
    return sorted(r["i"].tolist())


@probe
def series_sort_key_abs(m, df):
    # kind='stable': pandas' default quicksort tie order is
    # implementation-defined; the engine's rowid tiebreak IS the stable
    # order
    if m is pd:
        return df["v"].sort_values(key=lambda s: s.abs(),
                                   kind="stable").reset_index(drop=True)
    return df["v"].sort_values(key=lambda s: s.abs()).reset_index(drop=True)


# ------------------------------------------------------------- window+
@probe
def expanding_corr_pair(m, df):
    a = df["i"].astype(float)
    b = df["i"].astype(float) * 2 - 3
    return a.expanding().corr(b)


@probe
def rolling_var_small_window(m, df):
    return df["i"].rolling(2).var()


@probe
def cumsum_on_filtered(m, df):
    d2 = df[df["i"] > 2]
    return d2["i"].cumsum().reset_index(drop=True)


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
