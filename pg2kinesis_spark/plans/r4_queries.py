"""Round-4 operator queries: DSIR selection, URL/domain gates, and LM
perplexity — the newest LLM-pipeline surface, each hash-checked against
a DuckDB oracle that re-derives the full pipeline independently.

Every operator here was previously pytest-only (pure-Python mirrors in
tests/test_dsir.py, test_urls.py, test_lm.py); these rows put them on
the driver's cross-engine CORRECTNESS board as well. Determinism notes:

* DSIR (n21): every hash is the cross-engine md5-60 recipe, the Gumbel
  noise is a deterministic hash-uniform, and the fit's smoothing math
  is plain double arithmetic — both engines produce bit-comparable
  doubles (the driver rounds to 6 decimals).
* URLs (n22): the query synthesizes a URL per doc_id from modular
  arithmetic, exercising every pinned normalization rule (case, www,
  default ports, tracking params, param sort, fragment) plus dedup,
  blocklist (deep-entry path), badword gate, and the per-domain cap;
  the oracle recomputes the EXPECTED output from the same formulas
  without parsing anything — an independent end-to-end derivation.
* LM (n23): count-table caps break ties on the token strings (both
  engines sort strings bytewise), and the interpolated probability is
  evaluated with the same literal lambdas and association order.

The reference (/root/reference/pg2kinesis) has no analogue for any of
these — north-star training-data surface, not parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pg2kinesis_spark.io import load_table

# DuckDB twin of dedup.HASH60 (cast(conv(substr(md5(x),1,15),16,10) as bigint))
_H60 = "(('0x' || substr(md5({x}), 1, 15))::BIGINT)"


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


# --------------------------------------------------------------------------
# n21: DSIR — fit log-ratios (en docs as target), score all docs, Gumbel
# top-k resample. One registered query covers fit + score + select.
# --------------------------------------------------------------------------

_DSIR_BUCKETS = 256
_DSIR_N = 100


def n21_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pg2kinesis_spark.functions import dsir

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    target = _docs(spark, sf_dir).filter(F.col("lang") == "en").select("text")
    # fused fit+select (r12 opt round): one corpus gram explode instead
    # of three; identical integers into the fit, identical gram rows
    # into the scorer — hash-checked unchanged against the oracle.
    out = dsir.dsir_fit_select(
        docs, target, n=_DSIR_N, n_buckets=_DSIR_BUCKETS, alpha=1.0
    )
    return out.orderBy(F.desc("gk"), "doc_id")


_N21_SQL = f"""
WITH raw AS (
  SELECT doc_id, lang,
         list_filter(string_split_regex(lower(text), ' +'), w -> w != '') AS ws
  FROM documents
),
grams AS (
  SELECT doc_id, lang,
         unnest(ws || list_transform(range(1, len(ws)),
                                     i -> ws[i] || ' ' || ws[i + 1])) AS gram
  FROM raw
),
bucketed AS (
  SELECT doc_id, lang, {_H60.format(x='gram')} % {_DSIR_BUCKETS} AS bucket FROM grams
),
tb AS (SELECT bucket, count(*) AS tc FROM bucketed WHERE lang = 'en' GROUP BY 1),
rb AS (SELECT bucket, count(*) AS rc FROM bucketed GROUP BY 1),
jb AS (
  SELECT b.range AS bucket, coalesce(tc, 0) AS tc, coalesce(rc, 0) AS rc
  FROM range({_DSIR_BUCKETS}) b
  LEFT JOIN tb ON tb.bucket = b.range
  LEFT JOIN rb ON rb.bucket = b.range
),
tot AS (SELECT sum(tc) AS tt, sum(rc) AS rt FROM jb),
lr AS (
  SELECT bucket,
         ln((tc + 1.0) / (tt + {float(_DSIR_BUCKETS)}))
           - ln((rc + 1.0) / (rt + {float(_DSIR_BUCKETS)})) AS logratio
  FROM jb, tot
),
sc AS (
  SELECT d.doc_id, coalesce(s.lw, 0.0) AS logw
  FROM documents d
  LEFT JOIN (
    SELECT g.doc_id, sum(lr.logratio) AS lw
    FROM bucketed g JOIN lr ON g.bucket = lr.bucket
    GROUP BY g.doc_id
  ) s ON s.doc_id = d.doc_id
)
SELECT doc_id, logw,
       logw - ln(-ln((({_H60.format(x='doc_id::VARCHAR')}) + 1.0)
                     / 1152921504606846976.0)) AS gk
FROM sc
ORDER BY gk DESC, doc_id
LIMIT {_DSIR_N}
"""


# --------------------------------------------------------------------------
# n22: URL/domain curation — synthesize a URL per doc from modular
# arithmetic, then run the full front-door gate chain: parse/normalize,
# normalized-URL dedup, domain blocklist (deep entries), badword filter,
# per-domain cap. Oracle derives the expected output from the formulas.
# --------------------------------------------------------------------------

_URL_EXPR = (
    "concat('HTTPS://', CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END, "
    "'D', doc_id % 25, "
    "CASE WHEN doc_id % 2 = 1 THEN '.shop.co.uk' ELSE '.example.com' END, "
    "CASE doc_id % 5 WHEN 0 THEN ':443' WHEN 1 THEN ':8080' ELSE '' END, "
    "'/p/', CASE WHEN doc_id % 25 = 13 THEN 'casino-' ELSE '' END, doc_id % 60, "
    "'?utm_source=x&b=', doc_id % 3, '&a=1', "
    "CASE WHEN doc_id % 2 = 0 THEN '#frag' ELSE '' END)"
)

_URL_BLOCKLIST = ["d7.example.com", "d11.example.com"]
_URL_CAP = 80


def n22_url_gates(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pg2kinesis_spark.functions import urls

    docs = _docs(spark, sf_dir).select("doc_id", F.expr(_URL_EXPR).alias("url"))
    out = urls.parse_urls(docs)
    # reuse the parsed columns through the chain — same results, but
    # the PSL longest-match CASE evaluates once per row, not per stage
    out = urls.url_dedup(out, norm_col="url_norm")
    out = urls.domain_blocklist_filter(
        out, _URL_BLOCKLIST, host_col="host", domain_col="domain"
    )
    out = urls.url_badword_filter(out, ("casino",), max_score=0)
    out = urls.domain_cap(out, k=_URL_CAP, domain_col="domain")
    return out.select("doc_id", "host", "domain", "url_norm").orderBy("doc_id")


_N22_SQL = f"""
WITH comp AS (
  SELECT doc_id,
         doc_id % 25 AS g, doc_id % 2 AS odd, doc_id % 5 AS pm,
         doc_id % 60 AS pathid, doc_id % 3 AS bq
  FROM documents
),
expected AS (
  -- host mirrors parse_urls (lowered, www KEPT); url_norm mirrors
  -- normalize_url (www stripped, :443 dropped, params sorted, utm_ and
  -- the fragment gone)
  SELECT doc_id, g, odd,
         CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END
           || 'd' || g
           || CASE WHEN odd = 1 THEN '.shop.co.uk' ELSE '.example.com' END AS host,
         CASE WHEN odd = 1 THEN 'shop.co.uk' ELSE 'example.com' END AS domain,
         'https://d' || g
           || CASE WHEN odd = 1 THEN '.shop.co.uk' ELSE '.example.com' END
           || CASE WHEN pm = 1 THEN ':8080' ELSE '' END
           || '/p/' || CASE WHEN g = 13 THEN 'casino-' ELSE '' END || pathid
           || '?a=1&b=' || bq AS url_norm
  FROM comp
),
deduped AS (
  SELECT e.* FROM expected e
  JOIN (SELECT url_norm, min(doc_id) AS doc_id FROM expected GROUP BY 1) w
    ON e.url_norm = w.url_norm AND e.doc_id = w.doc_id
),
gated AS (
  SELECT * FROM deduped
  WHERE NOT (host = 'd7.example.com' OR host LIKE '%.d7.example.com'
             OR host = 'd11.example.com' OR host LIKE '%.d11.example.com')
    AND g != 13
),
capped AS (
  SELECT doc_id, host, domain, url_norm,
         row_number() OVER (PARTITION BY domain ORDER BY doc_id) AS rn
  FROM gated
)
SELECT doc_id, host, domain, url_norm
FROM capped WHERE rn <= {_URL_CAP}
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# n23: CCNet-style LM perplexity — train the interpolated bigram model on
# the English slice (capped count tables, string tie-breaks), score every
# document. Empty docs keep NULL perplexity.
# --------------------------------------------------------------------------

_LM_VOCAB = 400
_LM_BIGRAMS = 3000


def n23_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pg2kinesis_spark.functions import lm

    docs = _docs(spark, sf_dir)
    model = lm.train_ngram_lm(
        docs.filter(F.col("lang") == "en"),
        max_vocab=_LM_VOCAB,
        max_bigrams=_LM_BIGRAMS,
    )
    return lm.score_perplexity(docs.select("doc_id", "text"), model).orderBy("doc_id")


_N23_SQL = f"""
WITH toks AS (
  SELECT doc_id, lang,
         list_filter(string_split(text, ' '), w -> w != '') AS ws
  FROM documents
),
uni AS (
  SELECT w, count(*) AS c1
  FROM (SELECT unnest(ws) AS w FROM toks WHERE lang = 'en')
  GROUP BY w ORDER BY c1 DESC, w LIMIT {_LM_VOCAB}
),
tpairs AS (
  SELECT p.prev AS prev, p.w AS w
  FROM (
    SELECT unnest(list_transform(range(1, len(ws) + 1),
             i -> struct_pack(prev := CASE WHEN i = 1 THEN '<s>' ELSE ws[i - 1] END,
                              w := ws[i]))) AS p
    FROM toks WHERE lang = 'en'
  )
),
big AS (
  SELECT prev, w, count(*) AS c2 FROM tpairs
  GROUP BY prev, w ORDER BY c2 DESC, prev, w LIMIT {_LM_BIGRAMS}
),
tot AS (SELECT sum(c1) AS t, count(*) AS v FROM uni),
ctx AS (SELECT prev, sum(c2) AS ca FROM big GROUP BY prev),
dpairs AS (
  SELECT doc_id, p.prev AS prev, p.w AS w
  FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(ws) + 1),
             i -> struct_pack(prev := CASE WHEN i = 1 THEN '<s>' ELSE ws[i - 1] END,
                              w := ws[i]))) AS p
    FROM toks
  )
),
scored AS (
  SELECT doc_id,
         -ln(0.89 * coalesce(big.c2 / ctx.ca, 0.0)
             + 0.1 * coalesce(uni.c1 / tot.t, 0.0)
             + 0.01 / tot.v) AS nlp
  FROM dpairs
  LEFT JOIN big ON dpairs.prev = big.prev AND dpairs.w = big.w
  LEFT JOIN ctx ON dpairs.prev = ctx.prev
  LEFT JOIN uni ON dpairs.w = uni.w
  CROSS JOIN tot
),
agg AS (
  SELECT doc_id, count(*) AS n_lm_tokens, avg(nlp) AS avg_neg_logp
  FROM scored GROUP BY doc_id
)
SELECT d.doc_id, coalesce(a.n_lm_tokens, 0) AS n_lm_tokens,
       a.avg_neg_logp, exp(a.avg_neg_logp) AS perplexity
FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
ORDER BY d.doc_id
"""


R4_QUERIES = {
    "n21_dsir_select": n21_dsir_select,
    "n22_url_gates": n22_url_gates,
    "n23_lm_perplexity": n23_lm_perplexity,
}

R4_ORACLE_SQL = {
    "n21_dsir_select": _N21_SQL,
    "n22_url_gates": _N22_SQL,
    "n23_lm_perplexity": _N23_SQL,
}
