"""Randomized differential hunt: random small frames through random op
pipelines, engine vs pandas.  Finds interaction bugs single-shot probes
miss (e.g. sort→filter→positional, groupby-on-weird-keys).

Run: python scripts/hunt_prop.py [n_cases]
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
    n = rng.randint(1, 12)
    cols = {}
    cols["g"] = [rng.choice("abc") for _ in range(n)]
    vals = []
    for _ in range(n):
        r = rng.random()
        if r < 0.15:
            vals.append(np.nan)
        elif r < 0.3:
            vals.append(float(rng.randint(-3, 3)))
        else:
            vals.append(round(rng.uniform(-10, 10), 3))
    cols["v"] = vals
    cols["i"] = [rng.randint(-5, 5) for _ in range(n)]
    return pd.DataFrame(cols)


# each op: (name, fn(df) -> df/series) — must be engine/pandas agnostic
OPS = [
    ("sort_v", lambda d: d.sort_values("v", na_position="last")),
    ("sort_gi", lambda d: d.sort_values(["g", "i"],
                                        ascending=[True, False])),
    ("filter_pos", lambda d: d[d["i"] > 0]),
    ("filter_ne", lambda d: d[d["v"] != 0.0]),
    ("head3", lambda d: d.head(3)),
    ("tail3", lambda d: d.tail(3)),
    ("assign_cs", lambda d: d.assign(cs=d["v"].cumsum())),
    ("assign_rank", lambda d: d.assign(rk=d["i"].rank(method="min"))),
    ("dropdup_g", lambda d: d.drop_duplicates(subset=["g"])),
    ("fill0", lambda d: d.fillna(0)),
    ("abs_v", lambda d: d.assign(v=d["v"].abs())),
    ("shift_i", lambda d: d.assign(sh=d["i"].shift(1))),
    ("reset", lambda d: d.reset_index(drop=True)),
    ("gcumsum", lambda d: d.assign(gc=d.groupby("g")["i"].cumsum())),
    ("gshift", lambda d: d.assign(gs=d.groupby("g")["v"].shift(1))),
    ("ffill_v", lambda d: d.assign(v=d["v"].ffill())),
    ("clip_i", lambda d: d.assign(i=d["i"].clip(-2, 2))),
    ("concat_self", lambda d: (pd.concat([d, d], ignore_index=True)
                               if isinstance(d, pd.DataFrame)
                               else __import__("pandas_expr_spark")
                               .concat([d, d], ignore_index=True))),
    ("nlargest2", lambda d: d.nlargest(2, "i")),
    ("query_pos", lambda d: d.query("i >= 0")),
]

TERMINALS = [
    ("sum_v", lambda d: float(d["v"].sum()) if len(d) else 0.0),
    ("vals_i", lambda d: [None if pd.isna(x) else int(x)
                          for x in d["i"].tolist()]),
    ("vals_v", lambda d: [None if pd.isna(x) else round(float(x), 6)
                          for x in d["v"].tolist()]),
    ("grp_sum", lambda d: sorted(
        (k, round(float(v), 6)) for k, v in
        d.groupby("g")["i"].sum().items())),
]


def run_case(seed: int):
    rng = random.Random(seed)
    base = rand_frame(rng)
    n_ops = rng.randint(1, 4)
    chain = [rng.choice(OPS) for _ in range(n_ops)]
    term = rng.choice(TERMINALS)

    def apply_all(d):
        for _, fn in chain:
            d = fn(d)
        return term[1](d)

    want = apply_all(base.copy())
    e = pes.from_pandas(base)
    got_obj = e
    for _, fn in chain:
        got_obj = fn(got_obj)
    got = term[1](got_obj.compute() if hasattr(got_obj, "compute")
                  else got_obj)
    desc = "->".join(n for n, _ in chain) + f" | {term[0]}"
    return desc, want, got


def close(a, b):
    if isinstance(a, float) and isinstance(b, float):
        return (a != a and b != b) or abs(a - b) < 1e-9
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(close(x, y) for x, y in zip(a, b))
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(close(x, y) for x, y in zip(a, b))
    return a == b


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    fails = []
    for seed in range(n):
        try:
            desc, want, got = run_case(seed)
        except Exception as exc:  # noqa: BLE001
            tb = traceback.format_exc().splitlines()[-3].strip()
            print(f"ERR  seed={seed}: {type(exc).__name__}: {exc} | {tb[:100]}")
            fails.append(seed)
            continue
        if close(want, got):
            print(f"OK   seed={seed}: {desc}")
        else:
            print(f"FAIL seed={seed}: {desc}\n     want={want}\n     got ={got}")
            fails.append(seed)
    print(f"\n{n - len(fails)}/{n} ok; fails: {fails}")


if __name__ == "__main__":
    main()
