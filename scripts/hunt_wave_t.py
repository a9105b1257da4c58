"""Hunt wave T: differential probes vs real pandas — merge corners,
MultiIndex, pivot_table/crosstab margins, datetime offsets, rolling
corners, align/combine, index ops, expanding apply.

Run: python scripts/hunt_wave_t.py [probe-name ...]
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
        "h": list("xyxyxyx"),
        "v": [1.5, -2.5, 3.5, np.nan, 2.5, 0.5, -0.5],
        "i": [10, 3, 7, 3, 10, 1, 5],
        "d": pd.to_datetime(["2024-01-31", "2024-02-29", "2024-03-15",
                             "2024-07-04", "2023-12-31", "2024-06-30",
                             "2024-02-01"]),
    })


def aux_df():
    return pd.DataFrame({"g": list("abd"), "w": [100.0, 200.0, 300.0],
                         "i": [10, 3, 99]})


def run_pair(fn):
    want = fn(pd, base_df(), aux_df())
    got = fn(pes, pes.from_pandas(base_df()), pes.from_pandas(aux_df()))
    if hasattr(got, "compute"):
        got = got.compute()
    return want, got


def cmp(want, got):
    if isinstance(want, pd.DataFrame):
        if not isinstance(got, pd.DataFrame):
            return "FAIL", f"type: want DataFrame got {type(got).__name__}"
        wc = [str(c) for c in want.columns]
        gc = [str(c) for c in got.columns]
        if wc != gc:
            return "FAIL", f"cols: {wc} vs {gc}"
        if len(want) != len(got):
            return "FAIL", f"len: {len(want)} vs {len(got)}"
        w = want.reset_index(drop=True)
        g = got.reset_index(drop=True)
        for c1, c2 in zip(want.columns, got.columns):
            st, d = _cmp_col(w[c1], g[c2], str(c1))
            if st != "OK":
                return st, d
        wi, gi = list(map(str, want.index)), list(map(str, got.index))
        if wi != gi:
            return "FAIL", f"index: {wi[:6]} vs {gi[:6]}"
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


# ----------------------------------------------------------------- merge
@probe
def merge_on_common_cols_natural(m, df, aux):
    # on=None: natural join on ALL common columns (g AND i)
    r = df.merge(aux, how="inner")
    return r.sort_values(list(r.columns)).reset_index(drop=True)


@probe
def merge_outer_sorts_keys(m, df, aux):
    r = df[["g", "i"]].merge(aux[["g", "w"]], on="g", how="outer")
    return r.sort_values(["g", "i"]).reset_index(drop=True)


@probe
def merge_left_on_right_index(m, df, aux):
    a = aux.set_index("g") if m is pd else aux.set_index("g")
    r = df[["g", "v"]].merge(a[["w"]], left_on="g", right_index=True,
                             how="left")
    return r.reset_index(drop=True)


@probe
def merge_suffix_collision(m, df, aux):
    r = df[["g", "i"]].merge(aux[["g", "i"]], on="g", how="inner",
                             suffixes=("_L", "_R"))
    return r.sort_values(["g", "i_L"]).reset_index(drop=True)


@probe
def merge_cross(m, df, aux):
    r = df[["g"]].head(2).merge(aux[["w"]], how="cross")
    return r.reset_index(drop=True)


@probe
def join_on_index(m, df, aux):
    a = df.set_index("g")[["v"]]
    b = aux.set_index("g")[["w"]]
    r = a.join(b, how="left")
    return r.sort_values(["v"]).reset_index()


# ------------------------------------------------------------ multiindex
@probe
def groupby_two_keys_agg_unstack(m, df, aux):
    r = df.groupby(["g", "h"])["i"].sum()
    r = r.reset_index()
    return r.sort_values(["g", "h"]).reset_index(drop=True)


@probe
def set_index_two_cols_loc(m, df, aux):
    r = df.set_index(["g", "h"]).loc[("a", "x")]
    if isinstance(r, (pd.DataFrame,)) or hasattr(r, "compute"):
        rr = r.compute() if hasattr(r, "compute") else r
        return rr["i"].sum() if hasattr(rr["i"], "sum") else rr
    return r


@probe
def swaplevel_sort(m, df, aux):
    r = df.set_index(["g", "h"])["i"].swaplevel().sort_index()
    return r.reset_index()


@probe
def droplevel_index(m, df, aux):
    r = df.set_index(["g", "h"]).droplevel(1)["i"]
    return r.sort_index().reset_index()


# -------------------------------------------------------------- pivots
@probe
def pivot_table_margins(m, df, aux):
    if m is pd:
        r = pd.pivot_table(df, index="g", columns="h", values="i",
                           aggfunc="sum", margins=True)
    else:
        r = m.pivot_table(df, index="g", columns="h", values="i",
                          aggfunc="sum", margins=True)
    r = r.reset_index()
    r.columns = [str(c) for c in r.columns]
    return r


@probe
def pivot_table_multi_aggfunc(m, df, aux):
    if m is pd:
        r = pd.pivot_table(df, index="g", values=["i", "v"],
                           aggfunc={"i": "sum", "v": "mean"})
    else:
        r = m.pivot_table(df, index="g", values=["i", "v"],
                          aggfunc={"i": "sum", "v": "mean"})
    return r.reset_index()


@probe
def crosstab_margins(m, df, aux):
    if m is pd:
        r = pd.crosstab(df["g"], df["h"], margins=True)
    else:
        r = m.crosstab(df["g"], df["h"], margins=True)
    r = r.reset_index()
    r.columns = [str(c) for c in r.columns]
    return r


@probe
def pivot_plain(m, df, aux):
    d2 = df.drop_duplicates(subset=["g", "h"])
    if m is pd:
        r = d2.pivot(index="g", columns="h", values="i")
    else:
        r = m.pivot(d2, index="g", columns="h", values="i")
    r = r.reset_index()
    r.columns = [str(c) for c in r.columns]
    return r


# ------------------------------------------------------------- datetime
@probe
def shift_freq_days(m, df, aux):
    s = df.set_index("d")["i"]
    return s.shift(freq="2D").reset_index()


@probe
def dt_month_end_offset(m, df, aux):
    if m is pd:
        return df["d"] + pd.offsets.MonthEnd(0)
    return df["d"] + pd.offsets.MonthEnd(0)


@probe
def dt_quarter_start(m, df, aux):
    return df["d"].dt.to_period("Q").dt.start_time if m is pd else \
        df["d"].dt.to_period("Q").dt.start_time


@probe
def resample_weekly_sum(m, df, aux):
    s = df.set_index("d").sort_index()["i"]
    r = s.resample("W").sum()
    return r.reset_index()


@probe
def asfreq_daily(m, df, aux):
    s = df.set_index("d").sort_index()["i"].iloc[:3]
    r = s.asfreq("D")
    return r.reset_index()


@probe
def dt_round_hour(m, df, aux):
    s = df["d"] + pd.Timedelta(minutes=42)
    return s.dt.round("h")


# ------------------------------------------------------------- windows
@probe
def rolling_closed_left(m, df, aux):
    return df["i"].rolling(3, closed="left").sum()


@probe
def rolling_min_periods_1(m, df, aux):
    return df["v"].rolling(4, min_periods=1).mean()


@probe
def expanding_apply_range(m, df, aux):
    return df["i"].expanding(min_periods=2).max() - \
        df["i"].expanding(min_periods=2).min()


@probe
def rolling_rank(m, df, aux):
    if m is pd:
        return df["i"].rolling(3).rank()
    return df["i"].rolling(3).rank()


@probe
def grouped_rolling_sum(m, df, aux):
    r = df.groupby("g")["i"].rolling(2).sum()
    if m is pd:
        return r.reset_index(drop=True)
    return r.reset_index(drop=True)


# ------------------------------------------------------- align/combine
@probe
def align_outer_fill(m, df, aux):
    a = df[["g", "i"]].set_index("g")["i"]
    b = aux.set_index("g")["w"]
    l, r = a.align(b, join="outer")
    out = (l.fillna(0) + r.fillna(0))
    return out.sort_index().reset_index()


@probe
def combine_max(m, df, aux):
    a = df["i"].head(3).reset_index(drop=True)
    b = (df["i"].head(3) * 2).reset_index(drop=True)
    if m is pd:
        return a.combine(b, max)
    return a.combine(b, max)


@probe
def update_series(m, df, aux):
    a = df["v"].copy() if m is pd else df["v"]
    b = pd.Series([99.0], index=[3])
    if m is pd:
        a.update(b)
        return a.reset_index(drop=True)
    a.update(pes.from_pandas(b))
    return a.sort_index().reset_index(drop=True)


# ------------------------------------------------------------ index ops
@probe
def reindex_with_fill(m, df, aux):
    s = df.set_index("g")["i"]
    s = s[~s.index.duplicated()] if m is pd else s
    # engine may lack index.duplicated chain — reduce both to dedup merge
    a = df.drop_duplicates(subset=["g"]).set_index("g")["i"]
    r = a.reindex(["a", "b", "c", "d"], fill_value=-1)
    return r.reset_index()


@probe
def sort_index_descending(m, df, aux):
    s = df.set_index("g")["i"]
    return s.sort_index(ascending=False).reset_index()


@probe
def idx_value_counts(m, df, aux):
    r = df.set_index("g").index.value_counts()
    r = r.reset_index()
    r = r.rename(columns=dict(zip(list(r.columns), ["g", "count"])))
    return r.sort_values(["count", "g"],
                         ascending=[False, True]).reset_index(drop=True)


@probe
def rename_axis_reset(m, df, aux):
    r = df.set_index("g").rename_axis("key").reset_index()
    return r[["key", "i"]]


@probe
def first_last_valid_index(m, df, aux):
    return float(df["v"].first_valid_index()), float(
        df["v"].last_valid_index())


# ----------------------------------------------------------- reductions
@probe
def agg_dict_on_frame(m, df, aux):
    r = df.agg({"i": "sum", "v": "mean"})
    return float(r["i"]), float(r["v"])


@probe
def frame_sum_numeric_only(m, df, aux):
    r = df.sum(numeric_only=True)
    return r.sort_index().reset_index() if m is pd else \
        r.sort_index().reset_index()


@probe
def series_agg_list(m, df, aux):
    r = df["i"].agg(["min", "max", "mean"])
    return [float(x) for x in r]


@probe
def groupby_agg_named(m, df, aux):
    r = df.groupby("g").agg(tot=("i", "sum"), avg=("v", "mean"))
    return r.reset_index().sort_values("g").reset_index(drop=True)


@probe
def groupby_quantile(m, df, aux):
    r = df.groupby("g")["i"].quantile(0.5)
    return r.reset_index().sort_values("g").reset_index(drop=True)


@probe
def groupby_sem(m, df, aux):
    r = df.groupby("g")["i"].sem()
    return r.reset_index().sort_values("g").reset_index(drop=True)


@probe
def groupby_agg_multi_col_list(m, df, aux):
    r = df.groupby("g")[["i", "v"]].agg(["sum", "max"])
    r = r.reset_index()
    r.columns = ["_".join(c).rstrip("_") if isinstance(c, tuple) else str(c)
                 for c in r.columns]
    return r.sort_values(r.columns[0]).reset_index(drop=True)


# ----------------------------------------------------------------- misc
@probe
def series_between_time_like_filter(m, df, aux):
    s = df.set_index("d").sort_index()["i"]
    return s.loc["2024-02":"2024-06"].reset_index()


@probe
def frame_take(m, df, aux):
    return df.take([0, 3, 5])["i"].reset_index(drop=True)


@probe
def series_where_callable(m, df, aux):
    return df["i"].where(lambda x: x > 4, -1)


@probe
def frame_insert(m, df, aux):
    d2 = df[["g", "i"]]
    if m is pd:
        d2 = d2.copy()
        d2.insert(1, "z", d2["i"] * 2)
        return d2
    d2.insert(1, "z", d2["i"] * 2)
    return d2


@probe
def series_pop_frame(m, df, aux):
    d2 = df[["g", "i"]].copy() if m is pd else df[["g", "i"]]
    s = d2.pop("i")
    return s.sum() * 1.0 if m is pd else float(s.sum())


@probe
def nlargest_frame_all_cols(m, df, aux):
    return df.nlargest(3, ["i", "v"])[["g", "i"]].reset_index(drop=True)


@probe
def rank_axis1(m, df, aux):
    return df[["i", "v"]].rank(axis=1)["i"]


@probe
def cumsum_axis1(m, df, aux):
    return df[["i", "v"]].cumsum(axis=1)["v"]


@probe
def frame_round_all(m, df, aux):
    return (df[["v"]] * 1.23456).round(2)["v"]


@probe
def applymap_or_map(m, df, aux):
    return df[["i"]].map(lambda x: x + 1)["i"] if hasattr(df, "map") else \
        df[["i"]].applymap(lambda x: x + 1)["i"]


@probe
def pipe_chain(m, df, aux):
    return df.pipe(lambda d: d[d["i"] > 3])["i"].sum() * 1.0 if m is pd \
        else float(df.pipe(lambda d: d[d["i"] > 3])["i"].sum())


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
