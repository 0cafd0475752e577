"""URL/domain-level curation — the CCNet / RefinedWeb front-door gates.

Web-scale training corpora dedup and filter on the URL axis before any
text gate runs (RefinedWeb §3.1: URL filtering is the first stage;
CCNet dedups by normalized URL). Everything here is pure codegen
(regexp/split/array expressions — map-only, zero shuffle) except the
explicitly-shuffling dedup/cap operators, which reuse the repo's
verified shapes (groupBy-min first-occurrence, salted two-phase top-k).

Operators:
- ``parse_urls``       — host / registered domain / path / normalized
                         URL columns from a raw ``url`` column.
- ``url_dedup``        — exact dedup on the normalized URL
                         (first-occurrence by id, groupBy-min — the
                         n5 hash-dedup shape, never a window).
- ``domain_blocklist_filter`` — drop docs whose host is a blocked
                         domain or any subdomain of one (broadcast).
- ``url_badword_score`` / ``url_badword_filter`` — RefinedWeb-style
                         soft-ban scoring of URL substrings.
- ``domain_cap``       — at most k docs per registered domain
                         (per-domain crawl budget), salted two-phase.

Normalization rules (pinned, mirrored by the pure-Python oracle in
tests/test_urls.py): lowercase scheme+host, strip a leading ``www.``,
drop the fragment, drop tracking params (``utm_`` by prefix; gclid,
fbclid, ref, igshid, mc_cid, mc_eid by exact param NAME — ``refresh=``
is not ``ref``), sort surviving query params, strip default ports
(:80/:443), collapse a trailing ``/`` on a bare path.

The reference (/root/reference/pg2kinesis) has no analogue — this is
north-star training-data surface, not parity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pg2kinesis_spark.functions.dedup import HASH60

# multi-label public suffixes common enough to matter for registered-
# domain extraction; a full PSL drop-in would replace this tuple
_TWO_LABEL_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk",
    "com.au", "net.au", "org.au", "com.br", "com.cn", "com.mx",
    "co.jp", "or.jp", "ne.jp", "co.in", "co.kr", "com.tw",
    "com.ar", "com.tr", "co.za", "com.sg", "com.hk",
)

_TRACKING_PARAMS = ("utm_", "gclid", "fbclid", "ref", "igshid", "mc_cid", "mc_eid")


def _host(url: str | Column = "url") -> Column:
    c = F.col(url) if isinstance(url, str) else url
    return F.lower(F.try_parse_url(c, F.lit("HOST")))


def registered_domain(host: Column) -> Column:
    """eTLD+1 for the common suffixes above, else last two labels.

    Pure array expression over the split host — no UDF, no join.
    """
    parts = F.split(host, r"\.")
    n = F.size(parts)
    last2 = F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1))
    last3 = F.when(
        n >= 3,
        F.concat_ws(
            ".", F.element_at(parts, -3), F.element_at(parts, -2), F.element_at(parts, -1)
        ),
    )
    is_two_label = last2.isin(*_TWO_LABEL_SUFFIXES)
    # NULL host -> NULL domain (concat_ws would silently yield "" and
    # collapse every unparseable URL into one cap group)
    return (
        F.when(host.isNull(), F.lit(None).cast("string"))
        .when(n <= 1, host)
        .when(is_two_label & (n >= 3), last3)
        .otherwise(last2)
    )


def normalize_url(url: str | Column = "url") -> Column:
    """The pinned CCNet-style canonical form (docstring above).

    Built entirely from parse_url + regexp/array codegen; NULL in →
    NULL out; a URL with no query keeps none.
    """
    c = F.col(url) if isinstance(url, str) else url
    scheme = F.lower(F.coalesce(F.try_parse_url(c, F.lit("PROTOCOL")), F.lit("http")))
    host = F.regexp_replace(_host(c), r"^www\.", "")
    # optional userinfo is consumed POSSESSIVELY (?+) — a plain ? lets
    # the engine backtrack out of it and capture a numeric password as
    # the port (user:1234@host)
    port = F.regexp_extract(
        c, r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#]*@)?+[^/?#:]*:(\d+)", 1
    )
    keep_port = F.when(
        (port != "") & ~port.isin("80", "443"), F.concat(F.lit(":"), port)
    ).otherwise(F.lit(""))
    path = F.coalesce(F.try_parse_url(c, F.lit("PATH")), F.lit(""))
    path = F.when(path == "/", F.lit("")).otherwise(path)
    query = F.coalesce(F.try_parse_url(c, F.lit("QUERY")), F.lit(""))
    # utm_* matches by prefix; every other tracking entry matches the
    # exact param NAME (t or t=...) — a bare prefix would also strip
    # genuine params like refresh= / reference=
    def _tracked(p: Column) -> Column:
        hit = F.lit(False)
        for t in _TRACKING_PARAMS:
            if t.endswith("_"):  # prefix-family entry (utm_*)
                hit = hit | p.startswith(t)
            else:
                hit = hit | (p == t) | p.startswith(t + "=")
        return hit

    kept = F.array_sort(
        F.filter(F.split(query, "&"), lambda p: (p != "") & ~_tracked(p))
    )
    qstr = F.when(F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))).otherwise(
        F.lit("")
    )
    return F.when(
        c.isNull() | _host(c).isNull(), F.lit(None).cast("string")
    ).otherwise(F.concat(scheme, F.lit("://"), host, keep_port, path, qstr))


def parse_urls(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Adds host, domain (registered), path, url_norm — one map-only pass."""
    host = _host(url_col)
    return (
        df.withColumn("host", host)
        .withColumn("domain", registered_domain(F.col("host")))
        .withColumn("path", F.try_parse_url(F.col(url_col), F.lit("PATH")))
        .withColumn("url_norm", normalize_url(url_col))
    )


def url_dedup(df: DataFrame, url_col: str = "url", id_col: str = "doc_id") -> DataFrame:
    """One doc per normalized URL — the smallest id wins (deterministic
    first-occurrence). GroupBy-min + semi-join on (url_norm, id): the
    verified n5 exact-dedup shape — partial-aggregated, no window, and
    only (hash-sized key, id) rows ever shuffle. Docs whose URL fails
    to parse (url_norm NULL) are all kept — no evidence of duplication.
    """
    base = df.withColumn("_un", normalize_url(url_col))
    winners = (
        base.filter(F.col("_un").isNotNull())
        .groupBy("_un")
        .agg(F.min(id_col).alias(id_col))
    )
    kept = base.filter(F.col("_un").isNotNull()).join(winners, ["_un", id_col], "left_semi")
    return kept.unionByName(base.filter(F.col("_un").isNull())).drop("_un")


def _py_registered(b: str) -> str:
    parts = b.split(".")
    if len(parts) <= 1:
        return b
    last2 = ".".join(parts[-2:])
    if last2 in _TWO_LABEL_SUFFIXES and len(parts) >= 3:
        return ".".join(parts[-3:])
    return last2


def domain_blocklist_filter(
    df: DataFrame, blocklist: list[str], url_col: str = "url"
) -> DataFrame:
    """Drop rows whose host IS a blocked domain or a subdomain of one.

    The blocklist is a driver-side list (typically 10³–10⁵ entries —
    UT1/adult-blocklist scale). It is split at compile time:

    * entries that ARE a registered domain (the overwhelming majority
      in real blocklists) match by eTLD+1 equality — one broadcast
      HASH anti-join, O(1) per row regardless of list size;
    * deeper entries (e.g. ``bad.example.com``) match by host equality
      or ``.``-suffix — a broadcast theta anti-join over only that
      (small) residue, never the full list.
    """
    spark = df.sparkSession
    base = df.withColumn("_h", _host(url_col)).withColumn(
        "_d", registered_domain(F.col("_h"))
    )
    entries = sorted({b.lower().lstrip(".") for b in blocklist})
    regs = [b for b in entries if _py_registered(b) == b]
    deep = [b for b in entries if _py_registered(b) != b]
    out = base
    if regs:
        rdf = F.broadcast(spark.createDataFrame([(b,) for b in regs], "b string"))
        out = out.join(rdf, out["_d"] == rdf["b"], "left_anti")
    if deep:
        ddf = F.broadcast(spark.createDataFrame([(b,) for b in deep], "b string"))
        out = out.join(
            ddf,
            (out["_h"] == ddf["b"]) | out["_h"].endswith(F.concat(F.lit("."), ddf["b"])),
            "left_anti",
        )
    return out.drop("_h", "_d")


def url_badword_score(url_col: str = "url", words: tuple[str, ...] = ()) -> Column:
    """RefinedWeb-style soft-ban score: how many banned substrings the
    lowercased URL contains (each counted once). Pure regexp codegen."""
    c = F.lower(F.col(url_col))
    score = F.lit(0)
    for w in words:
        score = score + F.when(c.contains(w.lower()), 1).otherwise(0)
    return score


def url_badword_filter(
    df: DataFrame, words: tuple[str, ...], max_score: int = 0, url_col: str = "url"
) -> DataFrame:
    """Keep rows whose badword score is <= max_score — map-only."""
    return df.filter(url_badword_score(url_col, words) <= max_score)


def domain_cap(
    df: DataFrame,
    k: int,
    url_col: str = "url",
    id_col: str = "doc_id",
    order_col: str | None = None,
    n_salt: int = 32,
) -> DataFrame:
    """At most k docs per registered domain — the per-domain crawl
    budget (CommonCrawl-style hostload). Keeps the k best by
    (order_col desc, id) when order_col is given (e.g. a quality
    score), else the k smallest ids. Salted two-phase ranking: no
    whole-domain reducer funnel (the hot-domain case is exactly the
    skew this repo's top-k shape exists for). Docs whose URL fails to
    parse (NULL domain) all pass through uncapped — the url_dedup
    no-evidence rule, not one shared cap bucket."""
    from pyspark.sql import Window as W

    base = df.withColumn("_dom", registered_domain(_host(url_col)))
    unparsed = base.filter(F.col("_dom").isNull()).drop("_dom")
    base = base.filter(F.col("_dom").isNotNull())
    if order_col is None:
        order = (F.col(id_col).asc(),)
    else:
        order = (F.col(order_col).desc(), F.col(id_col).asc())
    h = F.expr(HASH60.format(x=f"cast({id_col} as string)"))
    salted = base.withColumn("_salt", F.pmod(h, F.lit(n_salt)))
    w_local = W.partitionBy("_dom", "_salt").orderBy(*order)
    pre = salted.withColumn("_lrnk", F.row_number().over(w_local)).filter(
        F.col("_lrnk") <= k
    )
    w = W.partitionBy("_dom").orderBy(*order)
    capped = (
        pre.withColumn("_rnk", F.row_number().over(w))
        .filter(F.col("_rnk") <= k)
        .drop("_dom", "_salt", "_lrnk", "_rnk")
    )
    return capped.unionByName(unparsed)
