"""Set operations / concatenation (reference ``_concat.py`` → SURVEY §2.4).

``concat`` is the reference's only set op (axis=0, outer/inner column join —
``_concat.py:9-64``).  Spark's ``unionByName(allowMissingColumns=True)`` is
the exact distributed analogue: a union is shuffle-free (partitions are simply
appended), so this scales linearly.  We add the Spark-native set ops the
reference lacks (SURVEY §2.4): intersect / except / distinct-union.
"""

from __future__ import annotations

from functools import reduce as _reduce
from typing import Sequence

from .._expr import Node


def concat(frames: Sequence, join: str = "outer", axis: int = 0,
           ignore_index: bool = False):
    from .._collection import DataFrame, Series

    if axis not in (0, "index"):
        # reference explicitly rejects axis=1 (`_collection.py:638-652`)
        raise NotImplementedError("concat(axis=1) is not supported; use merge/join")
    if not frames:
        raise ValueError("No objects to concatenate")
    frames = [f.to_frame() if isinstance(f, Series) else f for f in frames]
    if join == "inner":
        common = [c for c in frames[0].columns
                  if all(c in f.columns for f in frames[1:])]
        frames = [f[common] for f in frames]
        out = _reduce(lambda a, b: a._sdf.select(*common).unionByName(
            b._sdf.select(*common)), frames[1:], frames[0])
        if isinstance(out, DataFrame):
            out = out._sdf
    elif join == "outer":
        out = _reduce(lambda a, b: a.unionByName(b._sdf.select(*(list(b._index_cols) + b.columns)),
                                                 allowMissingColumns=True),
                      frames[1:],
                      frames[0]._sdf.select(*(list(frames[0]._index_cols) + frames[0].columns)))
    else:
        raise ValueError(f"join must be 'inner' or 'outer', got {join!r}")

    node = Node("concat", {"join": join, "n": len(frames)},
                *[f._expr for f in frames])
    idx = frames[0]._index_cols if not ignore_index and join == "outer" and all(
        f._index_cols == frames[0]._index_cols for f in frames) else ()
    names = frames[0]._index_names if idx else None
    return DataFrame(out, node, idx, names)


def union(left, right, distinct: bool = False):
    from .._collection import DataFrame
    out = left._sdf.unionByName(right._sdf, allowMissingColumns=True)
    if distinct:
        out = out.distinct()
    return DataFrame(out, Node("union", {"distinct": distinct},
                               left._expr, right._expr), (), None)


def intersect(left, right, all: bool = False):
    from .._collection import DataFrame
    out = left._sdf.intersectAll(right._sdf) if all else left._sdf.intersect(right._sdf)
    return DataFrame(out, Node("intersect", {"all": all},
                               left._expr, right._expr), (), None)


def except_(left, right, all: bool = False):
    from .._collection import DataFrame
    out = left._sdf.exceptAll(right._sdf) if all else left._sdf.subtract(right._sdf)
    return DataFrame(out, Node("except", {"all": all},
                               left._expr, right._expr), (), None)
