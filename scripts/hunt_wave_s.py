"""Hunt wave S: differential probes vs real pandas in corners not covered
by waves J-R2 (replace/regex, rounding, dtype promotion, rank/clip/where,
datetime accessors, string methods, cut/qcut, interpolate, ewm, misc).

Run: python scripts/hunt_wave_s.py [probe-name ...]
Prints one line per probe: OK / SOFT (dtype-only) / FAIL / ERR.
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
    pdf = base_df()
    want = fn(pd, pdf)
    edf = pes.from_pandas(base_df())
    got = fn(pes, edf)
    if hasattr(got, "compute"):
        got = got.compute()
    return want, got


def cmp(want, got):
    """Return (status, detail). Strict on values/shape, soft on dtype."""
    if isinstance(want, (pd.DataFrame,)):
        if not isinstance(got, pd.DataFrame):
            return "FAIL", f"type: want DataFrame got {type(got).__name__}"
        if list(want.columns) != list(got.columns):
            return "FAIL", f"cols: {list(want.columns)} vs {list(got.columns)}"
        if len(want) != len(got):
            return "FAIL", f"len: {len(want)} vs {len(got)}"
        w = want.reset_index(drop=False)
        g = got.reset_index(drop=False)
        for c in w.columns:
            if c not in g.columns:
                return "FAIL", f"missing col {c}"
            st, d = _cmp_col(w[c], g[c], c)
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
        wi = list(want.index)
        gi = list(got.index)
        if wi != gi:
            return "FAIL", f"index: {wi[:8]} vs {gi[:8]}"
        return "OK", ""
    # scalar
    if isinstance(want, float) and isinstance(got, float):
        if np.isnan(want) and np.isnan(got):
            return "OK", ""
        if np.isclose(want, got, equal_nan=True):
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
            return "FAIL", (f"{name}: {[ (wv[i], gv[i]) for i in bad ]}")
        return "OK", ""
    wl = ["<NA>" if pd.isna(x) else x for x in w.tolist()]
    gl = ["<NA>" if pd.isna(x) else x for x in g.tolist()]
    if wl != gl:
        i = next(i for i, (a, b) in enumerate(zip(wl, gl)) if a != b)
        return "FAIL", f"{name}[{i}]: {wl[i]!r} vs {gl[i]!r}"
    return "OK", ""


# ---------------------------------------------------------------- replace
@probe
def replace_scalar_pairs(m, df):
    return df.replace(3, 300) if m is pd else df.replace(3, 300)


@probe
def replace_regex_str(m, df):
    return df["s"].replace(r"^ab.*", "MATCH", regex=True)


@probe
def replace_dict_of_dicts(m, df):
    return df.replace({"i": {3: 33, 10: 100}})


@probe
def replace_list_to_list(m, df):
    return df["i"].replace([3, 10], [30, 100])


@probe
def replace_nan_with_value(m, df):
    return df["v"].replace(np.nan, -1.0)


# ---------------------------------------------------------------- rounding
@probe
def round_half_even(m, df):
    # pandas/numpy rounds half-to-even: 1.5->2, -2.5->-2, 2.5->2, 0.5->0
    return df["v"].round(0)


@probe
def round_negative_decimals(m, df):
    return (df["i"] * 15).round(-2)


@probe
def round_frame_dict(m, df):
    return df[["v", "i"]].round({"v": 1})


# ------------------------------------------------------- dtype promotion
@probe
def int_div_float(m, df):
    return df["i"] / 2


@probe
def floordiv_negative(m, df):
    return df["i"].floordiv(-3)


@probe
def mod_negative(m, df):
    return (df["i"] - 6) % 4


@probe
def float_floordiv_zero(m, df):
    return df["v"] // 0


@probe
def pow_negative_base(m, df):
    return df["v"] ** 0.5


@probe
def bool_plus_int(m, df):
    return (df["i"] > 5) + 1


@probe
def int_mod_zero_float(m, df):
    return df["v"] % 0


# ------------------------------------------------------------------ rank
@probe
def rank_pct_ties(m, df):
    return df["i"].rank(pct=True)


@probe
def rank_na_top(m, df):
    return df["v"].rank(na_option="top", method="dense")


@probe
def groupby_rank_min(m, df):
    return df.groupby("g")["i"].rank(method="min")


# ------------------------------------------------------------- clip/where
@probe
def clip_series_bounds(m, df):
    lo = df["v"] * 0 - 1
    return df["v"].clip(lower=lo, upper=2.0)


@probe
def where_scalar(m, df):
    return df["i"].where(df["i"] > 4, -1)


@probe
def mask_series_other(m, df):
    return df["i"].mask(df["i"] > 4, df["i"] * 10)


@probe
def frame_where(m, df):
    return df[["v", "i"]].where(df[["v", "i"]] > 2)


# ------------------------------------------------------------- datetime
@probe
def dt_days_in_month(m, df):
    return df["d"].dt.days_in_month


@probe
def dt_is_leap_year(m, df):
    return df["d"].dt.is_leap_year


@probe
def dt_isocalendar_week(m, df):
    return df["d"].dt.isocalendar().week.astype("int64")


@probe
def dt_to_period_quarter(m, df):
    return df["d"].dt.to_period("Q").astype(str)


@probe
def dt_floor_week(m, df):
    return df["d"].dt.normalize()


@probe
def dt_diff_days(m, df):
    return (df["d"] - df["d"].shift(1)).dt.days


@probe
def dt_add_timedelta(m, df):
    return df["d"] + pd.Timedelta(days=3)


@probe
def to_datetime_coerce(m, df):
    s = df["s"]
    if m is pd:
        return pd.to_datetime(pd.Series(["2024-01-02", "bad", None]),
                              errors="coerce")
    return m.to_datetime(
        m.from_pandas(pd.Series(["2024-01-02", "bad", None])),
        errors="coerce")


# ------------------------------------------------------------- strings
@probe
def str_extract_group(m, df):
    return df["s"].str.extract(r"([a-z]+)-([a-z]+)")


@probe
def str_findall_len(m, df):
    return df["s"].str.findall(r"[a-z]+").str.len()


@probe
def str_pad_both(m, df):
    return df["s"].str.pad(8, side="both", fillchar="*")


@probe
def str_zfill(m, df):
    return df["i"].astype(str).str.zfill(4)


@probe
def str_slice_replace(m, df):
    return df["s"].str.slice_replace(1, 3, "XX")


@probe
def str_partition(m, df):
    return df["s"].str.partition("-")


@probe
def str_repeat(m, df):
    return df["s"].str.repeat(2)


@probe
def str_swapcase(m, df):
    return df["s"].str.swapcase()


@probe
def str_split_expand(m, df):
    return df["s"].str.split(" ", expand=True)


@probe
def str_cat_sep(m, df):
    return df["s"].str.cat(df["g"], sep="|")


@probe
def str_count_regex(m, df):
    return df["s"].str.count(r"[aeiou]")


@probe
def str_wrap(m, df):
    return df["s"].str.wrap(3)


@probe
def str_get_dummies(m, df):
    return df["g"].str.get_dummies()


# ------------------------------------------------------------- cut/qcut
@probe
def cut_labels_false(m, df):
    if m is pd:
        return pd.cut(df["i"], bins=[0, 4, 8, 12], labels=False)
    return m.cut(df["i"], bins=[0, 4, 8, 12], labels=False)


@probe
def cut_right_false(m, df):
    if m is pd:
        return pd.cut(df["i"], bins=[1, 5, 10], right=False,
                      include_lowest=True).astype(str)
    return m.cut(df["i"], bins=[1, 5, 10], right=False,
                 include_lowest=True).astype(str)


@probe
def qcut_labels(m, df):
    if m is pd:
        return pd.qcut(df["i"], 3, labels=["lo", "mid", "hi"],
                       duplicates="drop").astype(str)
    return m.qcut(df["i"], 3, labels=["lo", "mid", "hi"],
                  duplicates="drop").astype(str)


# -------------------------------------------------------- interpolation
@probe
def interpolate_limit(m, df):
    s = df["v"].copy() if m is pd else df["v"]
    return s.interpolate(limit=1)


@probe
def interpolate_limit_direction(m, df):
    return df["v"].interpolate(limit_direction="backward")


@probe
def ffill_limit(m, df):
    return df["v"].ffill(limit=1)


# ---------------------------------------------------------------- ewm
@probe
def ewm_adjust_false(m, df):
    return df["v"].fillna(0).ewm(alpha=0.5, adjust=False).mean()


@probe
def ewm_span_var(m, df):
    return df["v"].ewm(span=3).var()


# ------------------------------------------------------------- reductions
@probe
def sum_min_count(m, df):
    return float(df["v"].iloc[:0].sum(min_count=1)) if m is pd else float(
        df["v"].head(0).sum(min_count=1))


@probe
def prod_min_count(m, df):
    return float(df["v"].prod(min_count=10))


@probe
def idxmax_series(m, df):
    return int(df["i"].idxmax())


@probe
def value_counts_dropna_false(m, df):
    r = df["v"].value_counts(dropna=False)
    r = r.reset_index()
    r = r.rename(columns=dict(zip(list(r.columns), ["v", "count"])))
    return r.sort_values("v", na_position="last").reset_index(drop=True)


@probe
def cummax_skipna_false(m, df):
    return df["v"].cummax(skipna=False)


@probe
def cumprod_with_nan(m, df):
    return df["v"].cumprod()


@probe
def any_object_col(m, df):
    return bool(df["s"].notna().any())


@probe
def quantile_int_col(m, df):
    return float(df["i"].quantile(0.3))


@probe
def median_even(m, df):
    return float(df["i"].median())


# ------------------------------------------------------------- selection
@probe
def nsmallest_keep_last(m, df):
    return df.nsmallest(3, "i", keep="last")["i"]


@probe
def duplicated_keep_false(m, df):
    return df["i"].duplicated(keep=False)


@probe
def isin_with_nan(m, df):
    return df["v"].isin([np.nan, 1.5])


@probe
def between_inclusive_left(m, df):
    return df["i"].between(3, 10, inclusive="left")


@probe
def sort_values_key(m, df):
    return df.sort_values("s", key=lambda s: s.str.len(),
                          na_position="first")["i"]


@probe
def truncate_rows(m, df):
    return df["i"].truncate(before=2, after=5)


# ------------------------------------------------------------- reshaping
@probe
def explode_empty_and_nan(m, df):
    if m is pd:
        s = pd.Series([[1, 2], [], None, [3]])
        return s.explode()
    s = m.from_pandas(pd.Series([[1, 2], [], None, [3]]))
    return s.explode()


@probe
def get_dummies_dummy_na(m, df):
    s = df["s"].str.lower().str[:1]
    if m is pd:
        return pd.get_dummies(s, prefix="p", dummy_na=True, dtype="int64")
    return m.get_dummies(s, prefix="p", dummy_na=True, dtype="int64")


@probe
def melt_var_value_names(m, df):
    if m is pd:
        return pd.melt(df[["g", "v", "i"]], id_vars="g",
                       var_name="metric", value_name="val")
    return m.melt(df[["g", "v", "i"]], id_vars="g",
                  var_name="metric", value_name="val")


@probe
def stack_dropna_false(m, df):
    if m is pd:
        return df[["v", "i"]].stack(future_stack=True).reset_index(drop=True)
    return df[["v", "i"]].stack(dropna=False).reset_index(drop=True)


# ------------------------------------------------------------- groupby
@probe
def groupby_first_skipna(m, df):
    return df.groupby("g")["v"].first()


@probe
def groupby_agg_lambda(m, df):
    return df.groupby("g")["i"].agg(lambda s: int(s.max() - s.min()))


@probe
def groupby_nth_neg(m, df):
    return df.groupby("g")["i"].nth(-1)


@probe
def groupby_cumcount(m, df):
    return df.groupby("g").cumcount()


@probe
def groupby_pct_change(m, df):
    return df.groupby("g")["i"].pct_change()


@probe
def groupby_describe_count(m, df):
    return df.groupby("g")["v"].describe()["count"]


@probe
def groupby_value_counts(m, df):
    r = df.groupby("g")["i"].value_counts()
    return r.sort_index()


@probe
def groupby_idxmin(m, df):
    return df.groupby("g")["v"].idxmin()


# ------------------------------------------------------------- shift/diff
@probe
def shift_fill_value(m, df):
    return df["i"].shift(2, fill_value=0)


@probe
def diff_negative_periods(m, df):
    return df["i"].diff(-2)


@probe
def pct_change_periods(m, df):
    return df["i"].pct_change(periods=2)


# ------------------------------------------------------------- misc
@probe
def astype_float_to_bool(m, df):
    return df["v"].fillna(0).astype(bool)


@probe
def combine_first_series(m, df):
    other = pd.Series([100.0] * 7)
    if m is pd:
        return df["v"].reset_index(drop=True).combine_first(other)
    return df["v"].reset_index(drop=True).combine_first(
        m.from_pandas(other))


@probe
def abs_timedelta(m, df):
    return (df["d"] - df["d"].shift(3)).abs().dt.days


@probe
def series_mode_ties(m, df):
    return df["i"].mode()


@probe
def nunique_axis1(m, df):
    return df[["i", "v"]].nunique(axis=1)


@probe
def rename_columns_callable(m, df):
    return df[["v", "i"]].rename(columns=str.upper)


@probe
def eval_local_var(m, df):
    t = 4
    return df.eval("i > @t", local_dict={"t": t}) if m is pd else \
        df.eval("i > @t", local_dict={"t": t})


@probe
def df_dot_series(m, df):
    w = pd.Series([2.0, 0.5], index=["v", "i"])
    if m is pd:
        return df[["v", "i"]].fillna(0).dot(w)
    return df[["v", "i"]].fillna(0).dot(w)


@probe
def squeeze_single_col(m, df):
    return df[["i"]].squeeze()


@probe
def series_repeat(m, df):
    if m is pd:
        return df["g"].repeat(2).reset_index(drop=True)
    return df["g"].repeat(2).reset_index(drop=True)


@probe
def series_searchsorted(m, df):
    if m is pd:
        return int(df["i"].sort_values().searchsorted(6))
    return int(df["i"].sort_values().searchsorted(6))


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
            print(f"ERR  {name}: {type(exc).__name__}: {exc} | {tb[-3].strip()[:120]}")
            fails.append(name)
            continue
        st, detail = cmp(want, got)
        print(f"{st:4s} {name}" + (f": {detail}" if detail else ""))
        if st != "OK":
            fails.append(name)
    print(f"\n{len(PROBES) - len(fails)}/{len(PROBES) if not only else len(only)} ok; fails: {fails}")


if __name__ == "__main__":
    main()
