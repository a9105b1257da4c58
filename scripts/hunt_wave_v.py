"""Hunt wave V: differential probes vs real pandas — frame comparison
methods, tz handling, masked setitem, arg* family, str flags, groupby
shapes, concat mixes, axis=1 reductions, reindex/rename, autocorr.

Run: python scripts/hunt_wave_v.py [probe-name ...]
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


# ------------------------------------------------- frame comparison methods
@probe
def frame_lt_scalar(m, df):
    return df[["i", "v"]].lt(4)["i"]


@probe
def frame_ge_series_axis0(m, df):
    other = df["i"] - 5
    return df[["i"]].ge(other, axis=0)["i"]


@probe
def series_add_fill_value(m, df):
    a = df["v"]
    b = df["v"].shift(2)
    return a.add(b, fill_value=0)


@probe
def frame_add_series_axis0(m, df):
    return df[["i", "v"]].add(df["i"], axis=0)["v"]


@probe
def frame_pow_scalar(m, df):
    return (df[["i"]] ** 2)["i"]


# ------------------------------------------------------------ tz handling
@probe
def tz_localize_convert(m, df):
    s = df["d"].dt.tz_localize("UTC").dt.tz_convert("US/Eastern")
    return s.dt.hour


@probe
def tz_localize_then_naive(m, df):
    s = df["d"].dt.tz_localize("UTC").dt.tz_localize(None)
    return s


# -------------------------------------------------------------- arg family
@probe
def series_argmax(m, df):
    return int(df["i"].argmax())


@probe
def series_argmin(m, df):
    return int(df["i"].argmin())


@probe
def series_argsort_head(m, df):
    r = df["i"].argsort()
    return r.reset_index(drop=True)


@probe
def idxmax_axis1(m, df):
    return df[["i", "v"]].fillna(-99).idxmax(axis=1)


@probe
def count_axis1(m, df):
    return df[["v", "i", "s"]].count(axis=1)


@probe
def all_axis1(m, df):
    return (df[["i", "v"]] > 0).all(axis=1)


@probe
def mean_axis1_skipna_false(m, df):
    return df[["i", "v"]].mean(axis=1, skipna=False)


# ------------------------------------------------------------ str flags
@probe
def str_contains_case_na(m, df):
    return df["s"].str.contains("ab", case=False, na=False)


@probe
def str_startswith_tuple(m, df):
    return df["s"].str.startswith(("New", "ab"), na=False)


@probe
def str_replace_case_insensitive(m, df):
    return df["s"].str.replace("AB", "@", case=False, regex=False)


@probe
def str_match_vs_fullmatch(m, df):
    a = df["s"].str.match(r"[a-z]+", na=False)
    b = df["s"].str.fullmatch(r"[a-z]+", na=False)
    return a.astype("int64") * 2 + b.astype("int64")


# --------------------------------------------------------------- groupby
@probe
def groupby_as_index_false_named(m, df):
    r = df.groupby("g", as_index=False).agg(tot=("i", "sum"))
    return r.sort_values("g").reset_index(drop=True)


@probe
def groupby_size_series(m, df):
    r = df.groupby("g").size()
    return r.reset_index(name="n").sort_values("g").reset_index(drop=True)


@probe
def groupby_multi_dropna_false(m, df):
    d2 = df.assign(k=[1, None, 1, None, 2, 2, 1]) if m is pd else \
        df.assign(k=pd.Series([1, None, 1, None, 2, 2, 1]))
    r = d2.groupby(["g", "k"], dropna=False)["i"].sum()
    r = r.reset_index()
    return r.sort_values(["g", "k"],
                         na_position="last").reset_index(drop=True)


@probe
def series_groupby_by_series(m, df):
    r = df["i"].groupby(df["g"]).sum()
    return r.reset_index().sort_values("g").reset_index(drop=True)


@probe
def groupby_agg_string_on_frame(m, df):
    r = df.groupby("g")[["i", "v"]].agg("max")
    return r.reset_index().sort_values("g").reset_index(drop=True)


@probe
def groupby_ngroup(m, df):
    return df.groupby("g").ngroup()


# ----------------------------------------------------------------- concat
@probe
def concat_series_frame_mix(m, df):
    s = df["i"].rename("j")
    if m is pd:
        return pd.concat([df[["g"]], s], axis=1)
    return pes.concat([df[["g"]], s], axis=1)


@probe
def concat_different_cols_outer(m, df):
    a = df[["g", "i"]].head(2)
    b = df[["g", "v"]].head(2)
    if m is pd:
        r = pd.concat([a, b], ignore_index=True)
    else:
        r = pes.concat([a, b], ignore_index=True)
    return r


@probe
def concat_axis1_reset(m, df):
    a = df[["i"]].head(3).reset_index(drop=True)
    b = df[["v"]].head(3).reset_index(drop=True)
    if m is pd:
        return pd.concat([a, b], axis=1)
    return pes.concat([a, b], axis=1)


# ---------------------------------------------------------------- reindex
@probe
def reindex_columns(m, df):
    return df.reindex(columns=["i", "g", "missing"])


@probe
def rename_index_labels(m, df):
    s = df.set_index("g")["i"]
    return s.rename(index={"a": "A"}).reset_index()


# ------------------------------------------------------------------- misc
@probe
def series_autocorr(m, df):
    return float(df["i"].autocorr(lag=1))


@probe
def frame_cov_ddof(m, df):
    # NOTE: pandas' nancorr path IGNORES ddof when NaNs are present (it
    # hardcodes N-1); the engine honors ddof uniformly — deliberate
    # deviation, so compare on the NaN-free frame where pandas honors it
    r = df[["i", "v"]].dropna().cov(ddof=0)
    return r.reset_index(drop=True)


@probe
def series_is_unique(m, df):
    return bool(df["g"].is_unique), bool(df["d"].is_unique)


@probe
def series_is_monotonic(m, df):
    return bool(df["i"].is_monotonic_increasing), bool(
        df["d"].sort_values().is_monotonic_increasing)


@probe
def clip_only_lower(m, df):
    return df["v"].clip(lower=0)


@probe
def nunique_dropna_false(m, df):
    return int(df["v"].nunique(dropna=False))


@probe
def masked_setitem_scalar(m, df):
    d2 = df[["i"]].copy() if m is pd else df[["i"]]
    if m is pd:
        d2.loc[d2["i"] > 5, "i"] = 0
        return d2["i"]
    d2.loc[d2["i"] > 5, "i"] = 0
    return d2["i"]


@probe
def setitem_with_series_mask(m, df):
    d2 = df[["i", "v"]].copy() if m is pd else df[["i", "v"]]
    d2["w"] = d2["i"].where(d2["i"] > 4)
    return d2["w"]


@probe
def query_backtick_columns(m, df):
    d2 = df.rename(columns={"i": "my col"})
    return d2.query("`my col` > 4")["g"].reset_index(drop=True)


@probe
def between_datetime(m, df):
    return df["d"].between("2024-01-01", "2024-06-30")


@probe
def duplicated_subset_frame(m, df):
    return df.duplicated(subset=["g"])


@probe
def resample_two_weeks(m, df):
    s = df.set_index("d").sort_index()["i"]
    return s.resample("2W").sum().reset_index()


@probe
def dt_weekday_alias(m, df):
    return (df["d"].dt.weekday - df["d"].dt.dayofweek).astype("int64")


@probe
def unique_module_fn(m, df):
    if m is pd:
        return sorted(pd.unique(df["g"]))
    return sorted(pes.unique(df["g"]).compute().tolist())


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
