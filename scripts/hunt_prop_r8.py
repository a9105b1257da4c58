"""Round-8 randomized differential hunt: NAMES + stamp×rowid compositions.

Extends the r7 harness along the two r7-verdict axes:

1. the NAME dimension — `.name`, `.index.name(s)`, `.columns.names` are
   compared on every terminal (the `__v__` value_counts leak survived 520
   r7 seeds precisely because the harness never looked at names);
2. stamp-minting ops (drop_duplicates→reset_index, concat, melt, sorts)
   composed with every positional rowid consumer (rank, positional
   binops, bool-list loc, assign-list, rolling/expanding incl. pairwise,
   explode, nlargest, where) — the `_attach_rowid` misalignment class.

Run: python scripts/hunt_prop_r8.py [n_cases] [seed ...]
"""
from __future__ import annotations

import random
import sys
import traceback

sys.path.insert(0, "/root/repo")

import numpy as np
import pandas as pd

import pandas_expr_spark as pes


def rand_frame(rng: random.Random) -> pd.DataFrame:
    n = rng.randint(4, 16)
    return pd.DataFrame({
        "g": [rng.choice("abcd") for _ in range(n)],
        "v": [np.nan if rng.random() < 0.15
              else round(rng.uniform(-9, 9), 3) for _ in range(n)],
        "i": [rng.randint(-5, 5) for _ in range(n)],
        "L": [[rng.randint(0, 3) for _ in range(rng.randint(1, 3))]
              for _ in range(n)],
    })


def _is_eng(d):
    return not isinstance(d, (pd.DataFrame, pd.Series))


def _concat(parts, **kw):
    return (pes.concat if _is_eng(parts[0]) else pd.concat)(parts, **kw)


# pipeline ops — heavy on stamp minting (dedup/reset, concat, melt) and
# rowid consumption (rank, masks, positional ops)
OPS = [
    ("dedup_reset", lambda d, r: d.drop_duplicates(subset=["g"])
                                  .reset_index(drop=True)),
    ("dedup_gi_reset", lambda d, r: d.drop_duplicates(subset=["g", "i"])
                                     .reset_index(drop=True)),
    ("concat_ignore", lambda d, r: _concat([d, d], ignore_index=True)),
    ("filter_pos", lambda d, r: d[d["i"] > r.randint(-2, 2)]),
    ("dropna", lambda d, r: d.dropna(subset=["v"])),
    ("head", lambda d, r: d.head(r.randint(3, 10))),
    ("tail", lambda d, r: d.tail(r.randint(3, 10))),
    ("sort_v", lambda d, r: d.sort_values("v", na_position="last",
                                          kind="stable")),
    ("sort_ignore", lambda d, r: d.sort_values("i", ignore_index=True,
                                               kind="stable")),
    ("reset_drop", lambda d, r: d.reset_index(drop=True)),
    ("rank_cols", lambda d, r: d.assign(rv=d[["v", "i"]].rank()["v"])),
    ("mask_self", lambda d, r: d[d["i"] != 0]),
    ("assign_series", lambda d, r: d.assign(w=d["v"].fillna(0.0) + 1)),
    ("project", lambda d, r: d[["g", "v", "i", "L"]]),
    ("iloc_slice", lambda d, r: d.iloc[1:12]),
    ("iloc_rev", lambda d, r: d.iloc[::-1]),
    ("copy", lambda d, r: d.copy()),
    ("fillna", lambda d, r: d.fillna({"v": -1.0})),
]

# terminals exercising rowid consumers and name surfaces
def _t_rank(d, r):
    return d[["v", "i"]].rank()

def _t_explode(d, r):
    return d.explode("L")

def _t_nlargest(d, r):
    return d.nlargest(3, "i")

def _t_frame_add(d, r):
    e = d[["v", "i"]]
    if _is_eng(e):
        n = len(e.compute())
        other = pes.from_pandas(
            pd.DataFrame({"v": np.arange(n) * 1.0, "i": np.ones(n, int)}))
    else:
        n = len(e)
        other = pd.DataFrame({"v": np.arange(n) * 1.0, "i": np.ones(n, int)})
    return e + other

def _t_bool_loc(d, r):
    n = len(d.compute()) if _is_eng(d) else len(d)
    mask = [bool((x + 1) % 2) for x in range(n)]
    return d.loc[mask]

def _t_assign_list(d, r):
    n = len(d.compute()) if _is_eng(d) else len(d)
    return d.assign(z=list(range(100, 100 + n)))

def _t_rolling_cov(d, r):
    return d["v"].rolling(3).cov(d["i"]).to_frame("c")

def _t_expanding_cov(d, r):
    return d["v"].expanding(2).cov(d["i"]).to_frame("c")

def _t_value_counts(d, r):
    # pandas value_counts tie order is UNDEFINED (unstable quicksort
    # inside pandas) — canonicalize by value so the comparison checks
    # counts/labels/names, not tie order
    return d["g"].value_counts().sort_index()

def _t_unnamed_vc(d, r):
    return d["g"].rename(None).value_counts().sort_index()

def _t_series_index(d, r):
    return d["v"].index.to_series().reset_index(drop=True)

def _t_melt(d, r):
    return d[["v", "i"]].melt()

def _t_rolling_on(d, r):
    return d[["v", "i"]].rolling(2, on="i").sum()

def _t_grp_cumsum(d, r):
    return d.assign(cs=d.groupby("g")["i"].cumsum())

def _t_grp_rank(d, r):
    return d.assign(gr=d.groupby("g")["i"].rank(method="min"))

def _t_grp_transform(d, r):
    return d.assign(gm=d.groupby("g")["i"].transform("max"))

def _t_grp_shift(d, r):
    return d.assign(gs=d.groupby("g")["v"].shift(1))

TAILS = [
    ("rank", _t_rank), ("explode", _t_explode), ("nlargest", _t_nlargest),
    ("frame_add", _t_frame_add), ("bool_loc", _t_bool_loc),
    ("assign_list", _t_assign_list), ("rolling_cov", _t_rolling_cov),
    ("expanding_cov", _t_expanding_cov), ("value_counts", _t_value_counts),
    ("unnamed_vc", _t_unnamed_vc), ("series_index", _t_series_index),
    ("melt", _t_melt), ("rolling_on", _t_rolling_on),
    # r8b: grouped positional ops over stamped/label-carrying frames
    ("grp_cumsum", _t_grp_cumsum), ("grp_rank", _t_grp_rank),
    ("grp_transform", _t_grp_transform), ("grp_shift", _t_grp_shift),
    ("none", None),
]


def as_cmp(d):
    return d.compute() if hasattr(d, "compute") else d


def _names(obj):
    if isinstance(obj, pd.Series):
        return {"name": obj.name, "index_names": list(obj.index.names)}
    return {"columns": list(obj.columns),
            "columns_names": list(obj.columns.names),
            "index_names": list(obj.index.names)}


def run_case(seed: int) -> tuple[str, str]:
    rng = random.Random(seed)
    pdf = rand_frame(rng)
    depth = rng.randint(1, 4)
    steps = [OPS[rng.randrange(len(OPS))] for _ in range(depth)]
    tail = TAILS[rng.randrange(len(TAILS))]
    trace = [s[0] for s in steps] + ([tail[0]] if tail[1] else [])
    try:
        eng, ref = pes.from_pandas(pdf), pdf
        for name, fn in steps:
            r1, r2 = random.Random(seed * 7 + 1), random.Random(seed * 7 + 1)
            eng, ref = fn(eng, r1), fn(ref, r2)
        if tail[1] is not None:
            r1, r2 = random.Random(seed + 3), random.Random(seed + 3)
            eng, ref = tail[1](eng, r1), tail[1](ref, r2)
        got, exp = as_cmp(eng), ref
    except Exception:
        return "ERR", "->".join(trace) + "\n" + traceback.format_exc()
    if len(got) != len(exp):
        return "FAIL", f"{'->'.join(trace)}: len {len(got)} vs {len(exp)}"
    # NAME dimension (r8): every name surface must match pandas
    gn, en = _names(got), _names(exp)
    if gn != en:
        return "FAIL", f"{'->'.join(trace)}: NAMES {gn} vs {en}"
    # DTYPE dimension (r8b): result dtypes must match pandas
    if isinstance(exp, pd.Series):
        if str(got.dtype) != str(exp.dtype):
            return "FAIL", f"{'->'.join(trace)}: DTYPE {got.dtype} vs {exp.dtype}"
    else:
        gd = [str(got[c].dtype) for c in exp.columns]
        ed = [str(exp[c].dtype) for c in exp.columns]
        if gd != ed:
            return "FAIL", f"{'->'.join(trace)}: DTYPES {gd} vs {ed}"
    gi = [str(x) for x in got.index.tolist()]
    ei = [str(x) for x in exp.index.tolist()]
    if gi != ei:
        return "FAIL", f"{'->'.join(trace)}: LABELS {gi[:8]} vs {ei[:8]}"
    gcols = [got] if isinstance(got, pd.Series) else \
        [got[c] for c in got.columns]
    ecols = [exp] if isinstance(exp, pd.Series) else \
        [exp[c] for c in exp.columns]
    for gc, ec in zip(gcols, ecols):
        for a, b in zip(gc.tolist(), ec.tolist()):
            if isinstance(a, np.ndarray):
                a = list(a)
            if isinstance(b, np.ndarray):
                b = list(b)
            if (pd.isna(a) if not isinstance(a, list) else False) \
                    and (pd.isna(b) if not isinstance(b, list) else False):
                continue
            if isinstance(b, float):
                if not np.isclose(float(a), b, rtol=1e-9, atol=1e-12,
                                  equal_nan=True):
                    return "FAIL", f"{'->'.join(trace)}: {ec.name} {a} vs {b}"
            elif str(a) != str(b):
                return "FAIL", f"{'->'.join(trace)}: {ec.name} {a!r} vs {b!r}"
    return "OK", ""


def main():
    args = sys.argv[1:]
    import os
    base = int(os.environ.get("HUNT_SEED_BASE", "30000"))
    if args and len(args) > 1:
        seeds = [int(a) for a in args]
    else:
        n = int(args[0]) if args else 200
        seeds = list(range(base, base + n))
    fails = 0
    for s in seeds:
        st, detail = run_case(s)
        if st != "OK":
            fails += 1
            print(f"{st} seed={s}: {detail}")
    print(f"{len(seeds)} cases, {fails} failures")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
