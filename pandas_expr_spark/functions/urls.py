"""URL curation for web-crawl corpora: canonicalization, domain
extraction, URL-level dedup, and per-group document caps.

The reference engine (phofl/pandas-expr) has no web-specific operators;
this module covers the URL hygiene steps every CC-derived pretraining
pipeline (C4, RefinedWeb, FineWeb) runs before content-level dedup:

* **Canonicalization** (`normalize_url`) — lowercase scheme/host, strip
  ``www.``, default ports, fragments and tracking parameters
  (``utm_*``/``fbclid``/``gclid``/...), sort the surviving query
  parameters, trim trailing slashes.  Entirely JVM-side: ``parse_url``
  plus array functions — a narrow map, no shuffle, reproducible in ANSI
  SQL (the gate's DuckDB oracle re-derives the same canonical form with
  regex + list lambdas).
* **Domain extraction** (`extract_domain`) — registrable domain via a
  small public-suffix heuristic (two labels, three when the second-level
  label is a known country-code multiplexer like ``co.uk``).
* **URL dedup** (`url_dedup`) — one row per canonical URL, deterministic
  winner (``max_by`` on a (preference, -key) struct): a single
  hash-shuffle groupBy with map-side partials, no window.
* **Per-group caps** (`cap_per_group`) — "at most N documents per
  domain", the crawl-frequency equalizer.  The naive per-domain
  ``row_number`` window puts a whole domain in one task (a mega-domain =
  one mega-task).  Here the greedy prefix over md5 order is computed with
  the two-phase hash-histogram plan (same scale shape as
  ``curation.budget_sample``): md5-PREFIX buckets are ordered consistently
  with full-md5 order, so whole buckets are kept via a broadcast semi
  join and only the single boundary bucket per group is sorted exactly.

All deterministic (md5 order, no RNG) — bit-stable across runs, cluster
sizes, and engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame as SparkDF, Window, functions as F

__all__ = ["normalize_url", "extract_domain", "url_dedup", "cap_per_group",
           "TRACKING_PARAMS"]

# Common click/campaign trackers (public lists: C4 / uBlock "AdGuard URL
# Tracking Protection" core set).  Matched against the full `k=v` token.
TRACKING_PARAMS = ["utm_source", "utm_medium", "utm_campaign", "utm_term",
                   "utm_content", "fbclid", "gclid", "msclkid", "ref",
                   "ref_src", "igshid", "mc_cid", "mc_eid"]

# Country-code second-level multiplexers: host tails where the registrable
# domain is three labels, not two (a pragmatic subset of the public-suffix
# list; swap in the full PSL as a broadcast table for production).
_CC_SLD = ["co", "com", "org", "net", "ac", "gov", "edu"]
_CC_TLD = ["uk", "au", "jp", "br", "in", "nz", "za", "mx", "kr"]


def normalize_url(col: Column | str) -> Column:
    """Canonical URL as a JVM column expression (no Python, no shuffle).

    Steps (each reproducible in the DuckDB oracle):
      1. scheme and host lowercased; ``www.`` prefix and default
         ``:80``/``:443`` ports stripped from the host;
      2. fragment dropped;
      3. query parameters: tracking params removed, the rest sorted
         byte-wise and re-joined with ``&`` (empty query → no ``?``);
      4. path: trailing slashes trimmed (root path becomes empty).
    """
    c = F.col(col) if isinstance(col, str) else col
    scheme = F.lower(F.parse_url(c, F.lit("PROTOCOL")))
    host = F.lower(F.parse_url(c, F.lit("HOST")))
    host = F.regexp_replace(host, r"^www\.", "")
    # parse_url(HOST) excludes the port and Hive's parse_url has no PORT
    # part — recover it from AUTHORITY so non-default ports survive.
    port = F.regexp_extract(
        F.coalesce(F.parse_url(c, F.lit("AUTHORITY")), F.lit("")),
        r":(\d+)$", 1)
    keep_port = (port != "") & ~port.isin("80", "443")
    hostport = F.when(keep_port, F.concat(host, F.lit(":"), port)) \
                .otherwise(host)
    path = F.regexp_replace(F.coalesce(F.parse_url(c, F.lit("PATH")),
                                       F.lit("")), "/+$", "")
    query = F.coalesce(F.parse_url(c, F.lit("QUERY")), F.lit(""))
    non_utm = "|".join(p for p in TRACKING_PARAMS if not p.startswith("utm_"))
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(f"^(utm_[^=]*|{non_utm})="))
    clean_q = F.array_join(F.array_sort(params), "&")
    return F.concat(
        scheme, F.lit("://"), hostport, path,
        F.when(clean_q != "", F.concat(F.lit("?"), clean_q))
         .otherwise(F.lit("")))


def extract_domain(col: Column | str) -> Column:
    """Registrable domain of a URL (or bare host) column.

    Heuristic public-suffix handling: ``a.b.co.uk`` → ``b.co.uk`` (the
    second-level label is in the country-code multiplexer list),
    ``a.b.example.com`` → ``example.com``.
    """
    c = F.col(col) if isinstance(col, str) else col
    host = F.when(c.contains("://"),
                  F.lower(F.parse_url(c, F.lit("HOST")))) \
            .otherwise(F.lower(c))
    host = F.regexp_replace(host, r"^www\.", "")
    sld = "|".join(_CC_SLD)
    tld = "|".join(_CC_TLD)
    three = F.regexp_extract(host,
                             rf"([^.]+\.(?:{sld})\.(?:{tld}))$", 1)
    two = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    return F.when(three != "", three).otherwise(
        F.when(two != "", two).otherwise(host))


def url_dedup(sdf: SparkDF, url_col: str = "url", key_col: str = "doc_id",
              prefer_col: str | None = None,
              norm_col: str = "norm_url") -> SparkDF:
    """One row per canonical URL.  The winner is deterministic: highest
    ``prefer_col`` (e.g. ``n_chars`` — keep the richest capture), ties
    broken by smallest ``key_col``.  Adds ``norm_col`` (the canonical
    URL) and ``url_dup_count``.

    Plan: one narrow canonicalization projection + ONE hash-shuffle
    groupBy whose aggregates (``max_by`` over a unique ordering struct +
    ``count``) all combine map-side — no window, no second shuffle;
    scales to any corpus the groupBy key space fits (URLs hash-partition
    uniformly).
    """
    base = sdf.withColumn(norm_col, normalize_url(url_col))
    prefer = (F.col(prefer_col).cast("double") if prefer_col
              else F.lit(0.0))
    # unique ordering => max_by is deterministic: (prefer asc, -key desc)
    ordk = F.struct(prefer.alias("p"),
                    (-F.col(key_col)).alias("nk"))
    payload = F.struct(*[F.col(c) for c in sdf.columns])
    won = (base.groupBy(norm_col)
           .agg(F.max_by(payload, ordk).alias("__row__"),
                F.count(F.lit(1)).alias("url_dup_count")))
    cols = [F.col(f"__row__.{c}").alias(c) for c in sdf.columns]
    return won.select(*cols, norm_col, "url_dup_count")


def cap_per_group(sdf: SparkDF, n: "int | Mapping | None",
                  group_col: str | list[str] = "source",
                  key_col: str = "doc_id", salt: str = "",
                  n_buckets: int = 4096,
                  frac: float | None = None) -> SparkDF:
    """Keep at most ``n`` rows per group (or exactly ``bround(frac *
    group_size)`` rows when ``frac`` is given) — the rows with the
    smallest ``md5(key || salt)`` (deterministic, engine-reproducible;
    the SQL oracle is a plain ``row_number() OVER (PARTITION BY g ORDER
    BY md5(key), key)``).  ``n`` may also be a Mapping {group value →
    cap} (single ``group_col`` only): the caps land on the tiny
    histogram via a driver-built literal map, so per-group quotas
    (temperature mixing, per-domain budgets) cost nothing extra; groups
    absent from the mapping are dropped.

    Scale design — a per-group window sorts every row of a group in one
    task.  Instead (mirroring ``curation.budget_sample``, but the bucket
    is the md5 PREFIX, not a mod, so bucket order == md5 order):

    1. bucket = first 3 hex chars of md5 (4096 ordered buckets);
    2. (group, bucket) count histogram — tiny, map-side combined;
    3. cumsum per group over the tiny table (group totals come free, so
       a ``frac`` cap is derived right here — no extra pass); buckets
       fully under the cap are kept whole via a broadcast semi join (no
       sort of the big side);
    4. only each group's single boundary bucket (~1/4096 of its rows)
       gets an exact (md5, key) window for the remaining slots.
    """
    if (n is None) == (frac is None):
        raise ValueError("cap_per_group: pass exactly one of n= or frac=")
    groups = [group_col] if isinstance(group_col, str) else list(group_col)
    h = F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt)))
    nhex = max(1, (n_buckets - 1).bit_length() // 4)
    bucket = F.conv(F.substring(h, 1, nhex), 16, 10).cast("bigint")
    base = sdf.withColumn("__h__", h).withColumn("__b__", bucket)

    hist = base.groupBy(*groups, "__b__").agg(
        F.count(F.lit(1)).alias("__bn__"))
    wh = (Window.partitionBy(*groups).orderBy("__b__")
          .rowsBetween(Window.unboundedPreceding, 0))
    wt = (Window.partitionBy(*groups)
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
    from collections.abc import Mapping as _Mapping
    if isinstance(n, _Mapping):
        if len(groups) != 1:
            raise ValueError("mapping caps need a single group_col")
        # literal CASE over the (tiny) histogram — groups without a cap
        # get 0 and fall out entirely
        cap = F.lit(0).cast("bigint")
        expr = None
        for g, c in n.items():
            cond = F.col(groups[0]) == F.lit(g)
            expr = F.when(cond, int(c)) if expr is None \
                else expr.when(cond, int(c))
        cap = expr.otherwise(F.lit(0)).cast("bigint") if expr is not None \
            else cap
    elif frac is None:
        cap = F.lit(n)
    else:
        # pandas sample(frac=) takes round(frac*len) per group; bround
        # (half-even) matches Python round
        cap = F.bround(F.sum("__bn__").over(wt) * frac, 0).cast("bigint")
    hist = (hist.withColumn("__cum__", F.sum("__bn__").over(wh))
            .withColumn("__prev__", F.col("__cum__") - F.col("__bn__"))
            .withColumn("__cap__", cap)
            .localCheckpoint(eager=False))

    full = (hist.filter(F.col("__cum__") <= F.col("__cap__"))
            .select(*groups, "__b__"))
    taken_full = base.join(F.broadcast(full), [*groups, "__b__"],
                           "left_semi")

    boundary = (hist.filter((F.col("__cum__") > F.col("__cap__"))
                            & (F.col("__prev__") < F.col("__cap__")))
                .select(*groups, "__b__",
                        (F.col("__cap__") - F.col("__prev__"))
                        .alias("__room__")))
    wb = (Window.partitionBy(*groups, "__b__")
          .orderBy("__h__", key_col)
          .rowsBetween(Window.unboundedPreceding, 0))
    taken_boundary = (base.join(F.broadcast(boundary), [*groups, "__b__"])
                      .withColumn("__rn__", F.sum(F.lit(1)).over(wb))
                      .filter(F.col("__rn__") <= F.col("__room__"))
                      .drop("__room__", "__rn__"))

    return (taken_full.unionByName(taken_boundary)
            .drop("__h__", "__b__"))
