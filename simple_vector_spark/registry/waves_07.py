"""Registry part: see package docstring (registration order = file order)."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import knn as K
from ..operators import mutation as M
from ..sources.loaders import load_table

from . import finalize_double, query
from .core_relational import E, R
from .core_dedup import D, _CLUSTER_LABELS_CTES, _H_SQL, _docs_plus_spark, _minhash_pairs
from .core_ann import T
from .core_text import BM25_TERMS, _BM25_TERMS_SQL, _TK_SQL
from .core_multimodal_streaming import MM
from .waves_01 import CU, SK



# --------------------------------------------------------------------------
# Wave 177 (round 2): AR(2) Yule-Walker fit — the autoregressive member of
# the forecasting suite.
# --------------------------------------------------------------------------


@query(
    "orders_ar2_yule_walker",
    """
WITH monthly AS (
  SELECT date_trunc('month', o_orderdate) AS m,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS y
  FROM orders GROUP BY 1
),
mu AS (
  SELECT CAST(SUM(y) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mu,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM monthly
),
cent AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY m) AS BIGINT) AS t, n,
         CAST(ROUND(CAST(y AS DOUBLE) - mu, 6) AS DECIMAL(24,6)) AS c
  FROM monthly CROSS JOIN mu
),
g0 AS (
  SELECT SUM(CAST(ROUND(CAST(c AS DOUBLE) * CAST(c AS DOUBLE), 6)
                  AS DECIMAL(30,6))) AS g0,
         MAX(n) AS n
  FROM cent
),
g1 AS (
  SELECT SUM(CAST(ROUND(CAST(a.c AS DOUBLE) * CAST(b.c AS DOUBLE), 6)
                  AS DECIMAL(30,6))) AS g1
  FROM cent a JOIN cent b ON a.t = b.t - 1
),
g2 AS (
  SELECT SUM(CAST(ROUND(CAST(a.c AS DOUBLE) * CAST(b.c AS DOUBLE), 6)
                  AS DECIMAL(30,6))) AS g2
  FROM cent a JOIN cent b ON a.t = b.t - 2
),
raw AS (
  SELECT n,
         CAST(g1 AS DOUBLE) / NULLIF(CAST(g0 AS DOUBLE), 0.0) AS r1,
         CAST(g2 AS DOUBLE) / NULLIF(CAST(g0 AS DOUBLE), 0.0) AS r2
  FROM g0 CROSS JOIN g1 CROSS JOIN g2
),
fit AS (
  SELECT n, r1, r2,
         r1 * (1.0 - r2) / NULLIF(1.0 - r1 * r1, 0.0) AS phi1,
         (r2 - r1 * r1) / NULLIF(1.0 - r1 * r1, 0.0) AS phi2
  FROM raw
)
SELECT n,
       ROUND(r1, 6) + 0.0 AS acf_lag1,
       ROUND(r2, 6) + 0.0 AS acf_lag2,
       ROUND(phi1, 6) + 0.0 AS phi1,
       ROUND(phi2, 6) + 0.0 AS phi2,
       CAST(CASE WHEN ABS(phi2) < 1 AND phi2 + phi1 < 1 AND phi2 - phi1 < 1
                 THEN 1 ELSE 0 END AS INT) AS stationary
FROM fit
""",
)
def orders_ar2_yule_walker(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yule-Walker AR(2) on mean-centered monthly revenue: lag-1/2
    autocorrelations from rank self-joins, closed-form phi's and a
    stationarity verdict."""
    return R.ar2_yule_walker(load_table(spark, sf_dir, "orders"))


# --------------------------------------------------------------------------
# Wave 178 (round 2): EWMA control chart — the small-shift SPC monitor.
# --------------------------------------------------------------------------

_EWL = repr(R.EWMA_CHART_LAMBDA)
_EWOML = repr(1 - R.EWMA_CHART_LAMBDA)
_EWOML2 = repr((1 - R.EWMA_CHART_LAMBDA) ** 2)
_EWRAT = repr(R.EWMA_CHART_LAMBDA / (2 - R.EWMA_CHART_LAMBDA))
_EWLIM = repr(R.EWMA_CHART_L)


@query(
    "orders_ewma_chart",
    f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS x
  FROM orders GROUP BY 1
),
packed AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
         CAST(SUM(x) AS DECIMAL(38,0)) AS sx,
         CAST(SUM(x * x) AS DECIMAL(38,0)) AS sxx,
         list(CAST(x AS DOUBLE) ORDER BY d) AS ys
  FROM daily
),
base AS (
  SELECT n_days, ys,
         ROUND(CAST(sx AS DOUBLE) / CAST(n_days AS DOUBLE), 9) AS mu,
         ROUND(SQRT((CAST(sxx AS DOUBLE)
                     - CAST(n_days AS DOUBLE)
                       * (CAST(sx AS DOUBLE) / CAST(n_days AS DOUBLE))
                       * (CAST(sx AS DOUBLE) / CAST(n_days AS DOUBLE)))
                    / (CAST(n_days AS DOUBLE) - 1.0)), 9) AS sig
  FROM packed
),
st AS (
  SELECT n_days, mu, sig,
         list_reduce(
           list_prepend([mu, CAST(1.0 AS DOUBLE), CAST(0.0 AS DOUBLE),
                         CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE)],
                        list_transform(ys, y -> [y])),
           (acc, e) -> [
             {_EWL} * e[1] + {_EWOML} * acc[1],
             acc[2] * {_EWOML2},
             acc[3] + CASE WHEN ({_EWL} * e[1] + {_EWOML} * acc[1])
                             > mu + {_EWLIM} * sig
                               * SQRT({_EWRAT} * (1.0 - acc[2] * {_EWOML2}))
                        OR ({_EWL} * e[1] + {_EWOML} * acc[1])
                             < mu - {_EWLIM} * sig
                               * SQRT({_EWRAT} * (1.0 - acc[2] * {_EWOML2}))
                      THEN 1.0 ELSE 0.0 END,
             CASE WHEN acc[4] = 0.0
                   AND (({_EWL} * e[1] + {_EWOML} * acc[1])
                          > mu + {_EWLIM} * sig
                            * SQRT({_EWRAT} * (1.0 - acc[2] * {_EWOML2}))
                        OR ({_EWL} * e[1] + {_EWOML} * acc[1])
                          < mu - {_EWLIM} * sig
                            * SQRT({_EWRAT} * (1.0 - acc[2] * {_EWOML2})))
                  THEN acc[5] + 1.0 ELSE acc[4] END,
             acc[5] + 1.0
           ]) AS s
  FROM base
)
SELECT n_days,
       ROUND(mu, 6) + 0.0 AS mean_daily,
       ROUND(sig, 6) + 0.0 AS sigma_daily,
       ROUND(s[1], 6) AS ewma_final,
       CAST(s[3] AS BIGINT) AS n_out_of_control,
       CAST(s[4] AS BIGINT) AS first_breach_day
FROM st
""",
)
def orders_ewma_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA control chart on daily order counts with time-varying
    limits; single-row array fold, list_reduce-mirrored."""
    return R.ewma_control_chart(load_table(spark, sf_dir, "orders"))


# --------------------------------------------------------------------------
# Wave 179 (round 2): HITS hubs/authorities — dual-role trade centrality.
# --------------------------------------------------------------------------


def _hits_oracle() -> str:
    ctes = [
        """edges AS MATERIALIZED (
  SELECT s_nationkey AS src, c_nationkey AS dst, COUNT(*) AS w
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  GROUP BY 1, 2
)""",
        """nodes AS MATERIALIZED (SELECT n_nationkey AS node FROM nation)""",
        """nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes)""",
        """h0 AS (SELECT node, ROUND(1.0 / nn.n, 8) AS s
  FROM nodes CROSS JOIN nn)""",
    ]

    def half(i: int, vec: str, out: str, from_c: str, to_c: str) -> str:
        return f"""{out}raw{i} AS (
  SELECT e.{to_c} AS node,
         SUM(CAST(ROUND(CAST(e.w AS DOUBLE) * v.s, 8) AS DECIMAL(20,8)))
           AS raw
  FROM edges e JOIN {vec} v ON e.{from_c} = v.node GROUP BY 1
),
{out}tot{i} AS (SELECT SUM(raw) AS tot FROM {out}raw{i}),
{out}{i} AS MATERIALIZED (
  SELECT nodes.node,
         ROUND(CAST(COALESCE(r.raw, 0) AS DOUBLE)
               / NULLIF(CAST(t.tot AS DOUBLE), 0.0), 8) AS s
  FROM nodes LEFT JOIN {out}raw{i} r ON nodes.node = r.node
  CROSS JOIN {out}tot{i} t
)"""

    for i in range(1, R.HITS_ITERS + 1):
        ctes.append(half(i, f"h{i-1}", "a", "src", "dst"))
        ctes.append(half(i, f"a{i}", "h", "dst", "src"))
    body = ",\n".join(ctes)
    k = R.HITS_ITERS
    return f"""
WITH {body}
SELECT n_name AS nation,
       ROUND(h.s, 6) + 0.0 AS hub,
       ROUND(a.s, 6) + 0.0 AS authority
FROM nodes
JOIN nation ON nodes.node = n_nationkey
JOIN h{k} h ON nodes.node = h.node
JOIN a{k} a ON nodes.node = a.node
ORDER BY nation
"""


@query("nation_trade_hits", _hits_oracle())
def nation_trade_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs/authorities on the nation trade graph (fixed
    iterations, per-half-step 8dp DECIMAL normalization) — the
    dual-role centrality beside PageRank."""
    return R.nation_trade_hits(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "nation"),
    )


# --------------------------------------------------------------------------
# Wave 180 (round 2): Dirichlet query-likelihood retrieval — the LM ranker
# beside BM25.
# --------------------------------------------------------------------------


@query(
    "text_lm_dirichlet_search",
    f"""
WITH tk AS (SELECT doc_id, unnest({_TK_SQL}) AS t FROM documents),
dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM tk GROUP BY 1),
ctot AS (SELECT CAST(COUNT(*) AS BIGINT) AS ctot FROM tk),
coll AS (
  SELECT t, CAST(COUNT(*) AS BIGINT) AS cf FROM tk
  WHERE t IN ({_BM25_TERMS_SQL}) GROUP BY 1
),
tf AS (
  SELECT doc_id, t, CAST(COUNT(*) AS BIGINT) AS tf FROM tk
  WHERE t IN ({_BM25_TERMS_SQL}) GROUP BY 1, 2
),
cands AS (
  SELECT DISTINCT doc_id FROM tf
),
grid AS (
  SELECT c.doc_id, d.dl, co.t, co.cf, ct.ctot, tf.tf
  FROM cands c
  JOIN dl d USING (doc_id)
  CROSS JOIN coll co
  CROSS JOIN ctot ct
  LEFT JOIN tf ON tf.doc_id = c.doc_id AND tf.t = co.t
),
scored AS (
  SELECT doc_id,
         CAST(ROUND(ln((CAST(COALESCE(tf, 0) AS DOUBLE)
                        + {T.QL_MU} * (CAST(cf AS DOUBLE)
                                       / CAST(ctot AS DOUBLE)))
                       / (CAST(dl AS DOUBLE) + {T.QL_MU})), 9)
              AS DECIMAL(18,9)) AS ts
  FROM grid
)
SELECT doc_id, ROUND(CAST(SUM(ts) AS DOUBLE), 4) + 0.0 AS score
FROM scored GROUP BY doc_id
ORDER BY score DESC, doc_id ASC
LIMIT 20
""",
)
def text_lm_dirichlet_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dirichlet-smoothed query-likelihood top-20 for the shared BM25
    query terms — the LM retrieval baseline beside BM25."""
    return T.lm_dirichlet_search(
        load_table(spark, sf_dir, "documents"), BM25_TERMS, 20
    )


# --------------------------------------------------------------------------
# Waves 181-182 (round 2): Welch's unequal-variances t-test and
# Durbin-Levinson partial autocorrelations.
# --------------------------------------------------------------------------


def _nsf2_sql(col: str) -> str:
    """Two-sided normal tail 2*(1-Phi(col)) as SQL — the same
    Zelen-Severo polynomial operators/events._norm_sf2 evaluates, so
    both engines share one float64 expression."""
    t = f"(1.0 / (1.0 + 0.2316419 * {col}))"
    return (
        f"LEAST(1.0, 2.0 * (0.3989422804014327 * EXP(-({col} * {col}) / 2.0))"
        f" * (((((1.330274429 * {t} - 1.821255978) * {t}"
        f" + 1.781477937) * {t} - 0.356563782) * {t}"
        f" + 0.319381530) * {t}))"
    )


@query(
    "lineitem_welch_ttest",
    f"""
WITH g AS (
  SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(l_quantity AS DECIMAL(10,2))) AS s1,
         SUM(CAST(CAST(l_quantity AS DECIMAL(10,2))
                  * CAST(l_quantity AS DECIMAL(10,2)) AS DECIMAL(38,4))) AS s2
  FROM lineitem WHERE l_returnflag IN ('R', 'N')
  GROUP BY 1
),
j AS (
  SELECT a.n AS n_a, a.s1 AS s1a, a.s2 AS s2a,
         b.n AS n_b, b.s1 AS s1b, b.s2 AS s2b
  FROM (SELECT * FROM g WHERE l_returnflag = 'R') a
  CROSS JOIN (SELECT * FROM g WHERE l_returnflag = 'N') b
),
raw AS (
  SELECT n_a, n_b,
         CAST(s1a AS DOUBLE) / CAST(n_a AS DOUBLE) AS ma,
         CAST(s1b AS DOUBLE) / CAST(n_b AS DOUBLE) AS mb,
         (CAST(s2a AS DOUBLE) - CAST(n_a AS DOUBLE)
            * (CAST(s1a AS DOUBLE) / CAST(n_a AS DOUBLE))
            * (CAST(s1a AS DOUBLE) / CAST(n_a AS DOUBLE)))
           / (CAST(n_a AS DOUBLE) - 1.0) AS va,
         (CAST(s2b AS DOUBLE) - CAST(n_b AS DOUBLE)
            * (CAST(s1b AS DOUBLE) / CAST(n_b AS DOUBLE))
            * (CAST(s1b AS DOUBLE) / CAST(n_b AS DOUBLE)))
           / (CAST(n_b AS DOUBLE) - 1.0) AS vb
  FROM j
),
tstat AS (
  SELECT n_a, n_b, ma, mb, va, vb,
         va / CAST(n_a AS DOUBLE) + vb / CAST(n_b AS DOUBLE) AS se2,
         (ma - mb) / NULLIF(SQRT(va / CAST(n_a AS DOUBLE)
                                 + vb / CAST(n_b AS DOUBLE)), 0.0) AS t
  FROM raw
)
SELECT n_a, n_b,
       ROUND(ma, 6) + 0.0 AS mean_a,
       ROUND(mb, 6) + 0.0 AS mean_b,
       ROUND(t, 6) + 0.0 AS t_stat,
       ROUND(se2 * se2
             / NULLIF((va / CAST(n_a AS DOUBLE)) * (va / CAST(n_a AS DOUBLE))
                        / (CAST(n_a AS DOUBLE) - 1.0)
                      + (vb / CAST(n_b AS DOUBLE)) * (vb / CAST(n_b AS DOUBLE))
                        / (CAST(n_b AS DOUBLE) - 1.0), 0.0), 6) + 0.0
         AS welch_df,
       ROUND({_nsf2_sql("ABS(t)")}, 6) + 0.0 AS p_value
FROM tstat
""",
)
def lineitem_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's t between R and N returnflag quantity means — the
    significance member beside Cohen's d and the MW/KS tests."""
    return R.welch_ttest(load_table(spark, sf_dir, "lineitem"))


@query(
    "orders_pacf",
    """
WITH monthly AS (
  SELECT date_trunc('month', o_orderdate) AS m,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS y
  FROM orders GROUP BY 1
),
mu AS (
  SELECT CAST(SUM(y) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mu,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM monthly
),
cent AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY m) AS BIGINT) AS t, n,
         CAST(ROUND(CAST(y AS DOUBLE) - mu, 6) AS DECIMAL(24,6)) AS c
  FROM monthly CROSS JOIN mu
),
g0 AS (
  SELECT SUM(CAST(ROUND(CAST(c AS DOUBLE) * CAST(c AS DOUBLE), 6)
                  AS DECIMAL(30,6))) AS g0,
         MAX(n) AS n
  FROM cent
),
g1 AS (
  SELECT SUM(CAST(ROUND(CAST(a.c AS DOUBLE) * CAST(b.c AS DOUBLE), 6)
                  AS DECIMAL(30,6))) AS g1
  FROM cent a JOIN cent b ON a.t = b.t - 1
),
g2 AS (
  SELECT SUM(CAST(ROUND(CAST(a.c AS DOUBLE) * CAST(b.c AS DOUBLE), 6)
                  AS DECIMAL(30,6))) AS g2
  FROM cent a JOIN cent b ON a.t = b.t - 2
),
g3 AS (
  SELECT SUM(CAST(ROUND(CAST(a.c AS DOUBLE) * CAST(b.c AS DOUBLE), 6)
                  AS DECIMAL(30,6))) AS g3
  FROM cent a JOIN cent b ON a.t = b.t - 3
),
raw AS (
  SELECT n,
         CAST(g1 AS DOUBLE) / NULLIF(CAST(g0 AS DOUBLE), 0.0) AS r1,
         CAST(g2 AS DOUBLE) / NULLIF(CAST(g0 AS DOUBLE), 0.0) AS r2,
         CAST(g3 AS DOUBLE) / NULLIF(CAST(g0 AS DOUBLE), 0.0) AS r3
  FROM g0 CROSS JOIN g1 CROSS JOIN g2 CROSS JOIN g3
),
lvl2 AS (
  SELECT n, r1, r2, r3,
         r1 AS p11,
         (r2 - r1 * r1) / NULLIF(1.0 - r1 * r1, 0.0) AS p22
  FROM raw
),
lvl3 AS (
  SELECT n, r1, r2, r3, p11, p22,
         p11 - p22 * p11 AS a21
  FROM lvl2
)
SELECT n,
       ROUND(p11, 6) + 0.0 AS pacf_1,
       ROUND(p22, 6) + 0.0 AS pacf_2,
       ROUND((r3 - a21 * r2 - p22 * r1)
             / NULLIF(1.0 - a21 * r1 - p22 * r2, 0.0), 6) + 0.0 AS pacf_3
FROM lvl3
""",
)
def orders_pacf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin-Levinson partial autocorrelations (lags 1-3) of monthly
    revenue — the AR model-order dial beside the Yule-Walker fit."""
    return R.pacf_durbin_levinson(load_table(spark, sf_dir, "orders"))


# --------------------------------------------------------------------------
# Wave 183 (round 2): large-star/small-star connected components — the
# O(log^2 n)-round CC the label-propagation docstring promises at web scale.
# --------------------------------------------------------------------------


@query(
    "dedup_clusters_star",
    f"""
WITH RECURSIVE {_CLUSTER_LABELS_CTES}
SELECT node, cluster FROM labels
""",
)
def dedup_clusters_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the MinHash candidate pairs by
    alternating large-star/small-star — same labeling as
    dedup_clusters, rounds bounded by O(log^2 n) instead of the
    cluster diameter (the difference that matters on chain-shaped
    near-dup graphs in crawl data)."""
    return D.dup_clusters_star(_minhash_pairs(spark, sf_dir))


# --------------------------------------------------------------------------
# Wave 184 (round 2): Misra-Gries guaranteed heavy hitters (two-pass exact).
# --------------------------------------------------------------------------


@query(
    "events_misra_gries_hh",
    f"""
WITH tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM events)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(CAST(COUNT(*) AS DOUBLE) / CAST(MAX(tot.n) AS DOUBLE), 6) + 0.0
         AS share
FROM events CROSS JOIN tot
GROUP BY user_id
HAVING CAST(COUNT(*) AS BIGINT) * {SK.MG_K} > MAX(tot.n)
ORDER BY n_events DESC, user_id ASC
""",
)
def events_misra_gries_hh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Misra-Gries two-pass heavy hitters over user_id: bounded-memory
    mergeable candidate summary, exact recount of candidates, f*k > n
    threshold — deterministic despite partitioning."""
    return SK.misra_gries_heavy_users(load_table(spark, sf_dir, "events"))


# --------------------------------------------------------------------------
# Wave 185 (round 2): SymSpell deletes-join spelling correction.
# --------------------------------------------------------------------------

_SYMSPELL_VALUES = ", ".join(f"('{q}')" for q in T.SYMSPELL_TYPOS)
_SS_VAR = (
    "unnest(list_transform(range(0, length({c}) + 1),"
    " i -> CASE WHEN i = 0 THEN {c}"
    " ELSE substr({c}, 1, CAST(i AS INT) - 1)"
    " || substr({c}, CAST(i AS INT) + 1, length({c})) END)) AS v"
)


@query(
    "vocab_symspell_suggest",
    f"""
WITH tk AS (SELECT unnest({_TK_SQL}) AS term FROM documents),
vocab AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS freq FROM tk GROUP BY 1),
vvar AS (
  SELECT term, freq, {_SS_VAR.format(c="term")} FROM vocab
),
q(query) AS (VALUES {_SYMSPELL_VALUES}),
qvar AS (
  SELECT query, {_SS_VAR.format(c="query")} FROM q
),
cands AS (
  SELECT DISTINCT query, term, freq
  FROM vvar JOIN qvar USING (v)
  WHERE levenshtein(query, term) <= 1 AND query <> term
),
ranked AS (
  SELECT query, term AS suggestion, freq,
         CAST(ROW_NUMBER() OVER (PARTITION BY query
                                 ORDER BY freq DESC, term ASC) AS INT) AS rnk
  FROM cands
)
SELECT query, suggestion, freq, rnk
FROM ranked WHERE rnk <= {T.SYMSPELL_TOPK}
ORDER BY query, rnk
""",
)
def vocab_symspell_suggest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SymSpell deletes-join spell suggestions against the corpus
    vocabulary: O(len) variants + equi-join instead of a vocab x
    queries Levenshtein cross join; frequency-ranked top-3."""
    return T.symspell_candidates(load_table(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# Wave 186 (round 2): RAKE keyphrase extraction (stopword-island phrases,
# degree/freq word scores).
# --------------------------------------------------------------------------

_RAKE_SW_SQL = ", ".join(f"'{w}'" for w in T.RAKE_STOPWORDS)


@query(
    "doc_rake_keyphrases",
    f"""
WITH t AS (SELECT doc_id, {_TK_SQL} AS tk FROM documents),
tok AS (
  SELECT doc_id, i AS pos, tk[i] AS w
  FROM t, UNNEST(range(1, len(tk) + 1)) AS u(i)
),
ns AS (
  SELECT doc_id, pos, w,
         pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS island
  FROM tok
  WHERE w NOT IN ({_RAKE_SW_SQL})
),
phrases AS (
  SELECT doc_id, island,
         string_agg(w, ' ' ORDER BY pos) AS phrase,
         CAST(COUNT(*) AS BIGINT) AS plen
  FROM ns GROUP BY 1, 2
),
members AS (
  SELECT ns.w, p.plen, p.phrase
  FROM ns JOIN phrases p USING (doc_id, island)
),
words AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS freq,
         CAST(SUM(plen) AS BIGINT) AS degree
  FROM members GROUP BY 1
),
wscore AS (
  SELECT w, CAST(ROUND(CAST(degree AS DOUBLE) / CAST(freq AS DOUBLE), 6)
                 AS DECIMAL(18,6)) AS ws
  FROM words
),
scored AS (
  SELECT phrase, SUM(ws) AS raw, CAST(COUNT(*) AS BIGINT) AS n_occurrences
  FROM members JOIN wscore USING (w)
  GROUP BY 1
)
SELECT phrase, ROUND(CAST(raw AS DOUBLE), 6) + 0.0 AS score, n_occurrences
FROM scored
ORDER BY score DESC, phrase ASC
LIMIT {T.RAKE_TOPK}
""",
)
def doc_rake_keyphrases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyphrases: stopword-island phrase segmentation,
    degree/freq word scores, phrase-sum ranking — the unsupervised
    keyphrase baseline beside TextRank."""
    return T.rake_keyphrases(load_table(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# Wave 187 (round 2): Laspeyres/Paasche/Fisher price indices.
# --------------------------------------------------------------------------


@query(
    "lineitem_price_indices",
    f"""
WITH py AS (
  SELECT l_partkey AS part_id, year(l_shipdate) AS yr,
         SUM(CAST(l_extendedprice AS DECIMAL(15,2))) AS rev,
         SUM(CAST(l_quantity AS DECIMAL(15,2))) AS qty
  FROM lineitem
  WHERE year(l_shipdate) IN ({R.PRICE_INDEX_YEARS[0]}, {R.PRICE_INDEX_YEARS[1]})
  GROUP BY 1, 2
  HAVING SUM(CAST(l_quantity AS DECIMAL(15,2))) > 0
),
priced AS (
  SELECT part_id, yr,
         ROUND(CAST(rev AS DOUBLE) / CAST(qty AS DOUBLE), 6) AS p, qty
  FROM py
),
j AS (
  SELECT b.part_id, b.p AS p0, b.qty AS q0, c.p AS p1, c.qty AS q1
  FROM (SELECT * FROM priced WHERE yr = {R.PRICE_INDEX_YEARS[0]}) b
  JOIN (SELECT * FROM priced WHERE yr = {R.PRICE_INDEX_YEARS[1]}) c
    USING (part_id)
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_parts,
         SUM(CAST(ROUND(p1 * CAST(q0 AS DOUBLE), 6) AS DECIMAL(30,6))) AS s10,
         SUM(CAST(ROUND(p0 * CAST(q0 AS DOUBLE), 6) AS DECIMAL(30,6))) AS s00,
         SUM(CAST(ROUND(p1 * CAST(q1 AS DOUBLE), 6) AS DECIMAL(30,6))) AS s11,
         SUM(CAST(ROUND(p0 * CAST(q1 AS DOUBLE), 6) AS DECIMAL(30,6))) AS s01
  FROM j
)
SELECT n_parts,
       ROUND(CAST(s10 AS DOUBLE) / NULLIF(CAST(s00 AS DOUBLE), 0.0), 6) + 0.0
         AS laspeyres,
       ROUND(CAST(s11 AS DOUBLE) / NULLIF(CAST(s01 AS DOUBLE), 0.0), 6) + 0.0
         AS paasche,
       ROUND(SQRT((CAST(s10 AS DOUBLE) / NULLIF(CAST(s00 AS DOUBLE), 0.0))
                  * (CAST(s11 AS DOUBLE) / NULLIF(CAST(s01 AS DOUBLE), 0.0))),
             6) + 0.0 AS fisher
FROM s
""",
)
def lineitem_price_indices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laspeyres / Paasche / Fisher price indices 1996->1997 over the
    common part basket — index-number economics on one fact pass."""
    return R.price_indices(load_table(spark, sf_dir, "lineitem"))


# --------------------------------------------------------------------------
# Wave 188 (round 2): Cochran-Mantel-Haenszel stratified 2x2 test.
# --------------------------------------------------------------------------


@query(
    "lineitem_cmh_test",
    """
WITH cells AS (
  SELECT year(l_shipdate) AS yr,
         CAST(SUM(CASE WHEN p_type LIKE 'PROMO%' AND l_returnflag = 'R'
                       THEN 1 ELSE 0 END) AS BIGINT) AS a,
         CAST(SUM(CASE WHEN p_type LIKE 'PROMO%' AND l_returnflag <> 'R'
                       THEN 1 ELSE 0 END) AS BIGINT) AS b,
         CAST(SUM(CASE WHEN p_type NOT LIKE 'PROMO%' AND l_returnflag = 'R'
                       THEN 1 ELSE 0 END) AS BIGINT) AS c,
         CAST(SUM(CASE WHEN p_type NOT LIKE 'PROMO%' AND l_returnflag <> 'R'
                       THEN 1 ELSE 0 END) AS BIGINT) AS d
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY 1
),
terms AS (
  SELECT a,
         CAST(ROUND(CAST(a + b AS DOUBLE) * CAST(a + c AS DOUBLE)
                    / CAST(a + b + c + d AS DOUBLE), 9) AS DECIMAL(28,9)) AS e,
         CAST(ROUND((CAST(a + b AS DOUBLE) * CAST(c + d AS DOUBLE)
                     * CAST(a + c AS DOUBLE) * CAST(b + d AS DOUBLE))
                    / NULLIF(CAST(a + b + c + d AS DOUBLE)
                             * CAST(a + b + c + d AS DOUBLE)
                             * (CAST(a + b + c + d AS DOUBLE) - 1.0), 0.0), 9)
              AS DECIMAL(28,9)) AS v,
         CAST(ROUND(CAST(a AS DOUBLE) * CAST(d AS DOUBLE)
                    / CAST(a + b + c + d AS DOUBLE), 9) AS DECIMAL(28,9)) AS ad,
         CAST(ROUND(CAST(b AS DOUBLE) * CAST(c AS DOUBLE)
                    / CAST(a + b + c + d AS DOUBLE), 9) AS DECIMAL(28,9)) AS bc,
         b, c, d
  FROM cells
),
s AS (
  SELECT CAST(COUNT(*) AS INT) AS n_strata,
         CAST(SUM(a) AS BIGINT) AS sa, SUM(e) AS se, SUM(v) AS sv,
         SUM(ad) AS sad, SUM(bc) AS sbc,
         CAST(SUM(b) AS BIGINT) AS sb, CAST(SUM(c) AS BIGINT) AS sc,
         CAST(SUM(d) AS BIGINT) AS sd
  FROM terms
)
SELECT n_strata,
       ROUND((CAST(sa AS DOUBLE) - CAST(se AS DOUBLE))
             * (CAST(sa AS DOUBLE) - CAST(se AS DOUBLE))
             / NULLIF(CAST(sv AS DOUBLE), 0.0), 6) + 0.0 AS cmh_chi2,
       ROUND(CAST(sad AS DOUBLE) / NULLIF(CAST(sbc AS DOUBLE), 0.0), 6) + 0.0
         AS or_mh,
       ROUND(CAST(sa AS DOUBLE) * CAST(sd AS DOUBLE)
             / NULLIF(CAST(sb AS DOUBLE) * CAST(sc AS DOUBLE), 0.0), 6) + 0.0
         AS or_crude
FROM s
""",
)
def lineitem_cmh_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CMH chi-square + Mantel-Haenszel common OR for PROMO-vs-return
    stratified by ship year — the adjusted test beside the Simpson
    audit's confounding flag."""
    return R.cmh_promo_returns(
        load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "part")
    )


# --------------------------------------------------------------------------
# Wave 189 (round 2): T5-style span-corruption masking audit.
# --------------------------------------------------------------------------


@query(
    "doc_span_masking_audit",
    f"""
WITH t AS (SELECT doc_id, source, {_TK_SQL} AS tk FROM documents),
tok AS (
  SELECT doc_id, source, i AS pos,
         CASE WHEN {_H_SQL.format(v="CAST(doc_id AS VARCHAR) || ':' || CAST(i - 1 AS VARCHAR)")}
                   < {CU.MASK_DENSITY_GATE} THEN 1 ELSE 0 END AS masked
  FROM t, UNNEST(range(1, len(tk) + 1)) AS u(i)
),
spans AS (
  SELECT doc_id, ANY_VALUE(source) AS source,
         CAST(COUNT(*) AS BIGINT) AS span_len
  FROM (
    SELECT doc_id, source, pos,
           pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos)
             AS island
    FROM tok WHERE masked = 1
  )
  GROUP BY doc_id, island
),
src_tok AS (
  SELECT source, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
         CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(SUM(masked) AS BIGINT) AS masked_tokens
  FROM tok GROUP BY 1
),
src_span AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_spans FROM spans GROUP BY 1
),
j AS (
  SELECT t.source, t.n_docs, t.n_tokens, t.masked_tokens,
         CAST(COALESCE(s.n_spans, 0) AS BIGINT) AS n_spans
  FROM src_tok t LEFT JOIN src_span s USING (source)
)
SELECT source, n_docs, n_tokens, masked_tokens, n_spans,
       ROUND(CAST(masked_tokens AS DOUBLE)
             / NULLIF(CAST(n_tokens AS DOUBLE), 0.0), 6) + 0.0 AS mask_rate,
       ROUND(CAST(masked_tokens AS DOUBLE)
             / NULLIF(CAST(n_spans AS DOUBLE), 0.0), 6) + 0.0
         AS mean_span_len,
       ROUND(CAST(n_spans AS DOUBLE)
             / NULLIF(CAST(n_tokens - masked_tokens + n_spans AS DOUBLE),
                      0.0), 6) + 0.0 AS sentinel_share
FROM j
ORDER BY source
""",
)
def doc_span_masking_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic T5-style span-corruption plan per source: md5-
    gated ~15% token noise, gaps-and-islands span fuse, sentinel
    budget — the reproducible masking schedule audit."""
    return CU.span_masking_audit(load_table(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# Wave 190 (round 2): exact Shapley-value conversion attribution.
# --------------------------------------------------------------------------


@query(
    "events_shapley_attribution",
    """
WITH users AS (
  SELECT user_id,
         CAST(MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS INT) AS c0,
         CAST(MAX(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS INT) AS c1,
         CAST(MAX(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS INT) AS c2,
         CAST(MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS INT) AS c3,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
  FROM events GROUP BY 1
),
ct AS (
  SELECT c0 * 1 + c1 * 2 + c2 * 4 + c3 * 8 AS t, CAST(SUM(conv) AS BIGINT) AS c
  FROM users GROUP BY 1
),
subsets AS (SELECT CAST(i AS INT) AS s FROM UNNEST(range(0, 16)) AS u(i)),
v AS (
  SELECT s, CAST(COALESCE(SUM(c), 0) AS BIGINT) AS v
  FROM subsets LEFT JOIN ct ON (t & s) = t
  GROUP BY s
),
terms AS (
  SELECT 'click' AS channel,
         CAST(ROUND((CASE WHEN bit_count(a.s) = 0 THEN 0.25 WHEN bit_count(a.s) = 1 THEN 0.08333333333333333 WHEN bit_count(a.s) = 2 THEN 0.08333333333333333 WHEN bit_count(a.s) = 3 THEN 0.25 ELSE 0.0 END)
                    * CAST(b.v - a.v AS DOUBLE), 9) AS DECIMAL(20,9)) AS term
  FROM v a JOIN v b ON b.s = a.s + 1
  WHERE ((a.s >> 0) & 1) = 0
  UNION ALL
  SELECT 'error' AS channel,
         CAST(ROUND((CASE WHEN bit_count(a.s) = 0 THEN 0.25 WHEN bit_count(a.s) = 1 THEN 0.08333333333333333 WHEN bit_count(a.s) = 2 THEN 0.08333333333333333 WHEN bit_count(a.s) = 3 THEN 0.25 ELSE 0.0 END)
                    * CAST(b.v - a.v AS DOUBLE), 9) AS DECIMAL(20,9)) AS term
  FROM v a JOIN v b ON b.s = a.s + 2
  WHERE ((a.s >> 1) & 1) = 0
  UNION ALL
  SELECT 'signup' AS channel,
         CAST(ROUND((CASE WHEN bit_count(a.s) = 0 THEN 0.25 WHEN bit_count(a.s) = 1 THEN 0.08333333333333333 WHEN bit_count(a.s) = 2 THEN 0.08333333333333333 WHEN bit_count(a.s) = 3 THEN 0.25 ELSE 0.0 END)
                    * CAST(b.v - a.v AS DOUBLE), 9) AS DECIMAL(20,9)) AS term
  FROM v a JOIN v b ON b.s = a.s + 4
  WHERE ((a.s >> 2) & 1) = 0
  UNION ALL
  SELECT 'view' AS channel,
         CAST(ROUND((CASE WHEN bit_count(a.s) = 0 THEN 0.25 WHEN bit_count(a.s) = 1 THEN 0.08333333333333333 WHEN bit_count(a.s) = 2 THEN 0.08333333333333333 WHEN bit_count(a.s) = 3 THEN 0.25 ELSE 0.0 END)
                    * CAST(b.v - a.v AS DOUBLE), 9) AS DECIMAL(20,9)) AS term
  FROM v a JOIN v b ON b.s = a.s + 8
  WHERE ((a.s >> 3) & 1) = 0
)
SELECT channel, ROUND(CAST(SUM(term) AS DOUBLE), 6) + 0.0
         AS shapley_conversions
FROM terms GROUP BY 1 ORDER BY 1
""",
)
def events_shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Shapley conversion attribution over the 4 touch channels
    (16-subset lattice; v(S) = conversions with touch set within S) —
    the coalition-game upgrade of the heuristic attribution models."""
    return E.shapley_attribution(load_table(spark, sf_dir, "events"))


# --------------------------------------------------------------------------
# Wave 191 (round 2): streaming CDC apply with tombstones.
# --------------------------------------------------------------------------


@query(
    "stream_cdc_apply",
    """
WITH latest AS (
  SELECT user_id, event_id, value,
         CASE WHEN event_type = 'error' THEN 'd' ELSE 'u' END AS op,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT user_id, CAST(event_id AS BIGINT) AS last_event_id,
       ROUND(value, 6) AS last_value
FROM latest
WHERE rn = 1 AND op <> 'd'
""",
)
def stream_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDC with deletes: error events are tombstones merged
    latest-wins into the snapshot via foreachBatch; keys whose latest
    op is a delete vanish from the visible state."""
    from ..streaming.jobs import cdc_apply_stream

    return cdc_apply_stream(spark, sf_dir)


# --------------------------------------------------------------------------
# Wave 192 (round 2): leave-one-out kNN classifier evaluation.
# --------------------------------------------------------------------------


@query(
    "embedding_knn_loo_accuracy",
    f"""
WITH emb_s AS (
  -- deterministic all-pairs decimation cap (stride 1 at test scale):
  -- same rule as operators.knn._decimated
  SELECT * FROM embeddings
  WHERE vec_id % (SELECT GREATEST(1, CAST(CEIL(COUNT(*) / 65536.0) AS BIGINT))
                  FROM embeddings) = 0
),
pairs AS (
  SELECT a.vec_id AS qid, a.label AS qlabel,
         b.vec_id AS cid, b.label AS clabel,
         unnest(CAST(a.embedding AS DOUBLE[])) AS x,
         unnest(CAST(b.embedding AS DOUBLE[])) AS y
  FROM emb_s a CROSS JOIN emb_s b
  WHERE a.vec_id <> b.vec_id
),
d AS (
  SELECT qid, qlabel, cid, clabel, ROUND(SUM((x - y) * (x - y)), 6) AS dist
  FROM pairs GROUP BY qid, qlabel, cid, clabel
),
top AS (
  SELECT qid, qlabel, clabel
  FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                                 ORDER BY dist ASC, cid ASC) AS rnk
    FROM d
  ) WHERE rnk <= {K.LOO_K}
),
votes AS (
  SELECT qid, qlabel, clabel, CAST(COUNT(*) AS BIGINT) AS nv
  FROM top GROUP BY 1, 2, 3
),
pred AS (
  SELECT qid, qlabel, clabel
  FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                                 ORDER BY nv DESC, clabel ASC) AS vr
    FROM votes
  ) WHERE vr = 1
)
SELECT qlabel AS label, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN clabel = qlabel THEN 1 ELSE 0 END) AS BIGINT)
         AS n_correct,
       ROUND(CAST(SUM(CASE WHEN clabel = qlabel THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) + 0.0 AS accuracy
FROM pred GROUP BY 1 ORDER BY 1
""",
)
def embedding_knn_loo_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out 5-NN majority-vote accuracy per label over the
    embedding corpus — the separability report for labels + space."""
    return K.knn_loo_accuracy(load_table(spark, sf_dir, "embeddings"))


# --------------------------------------------------------------------------
# Wave 193 (round 2): Goh-Barabasi inter-arrival burstiness.
# --------------------------------------------------------------------------


@query(
    "events_burstiness_coefficient",
    f"""
WITH gaps AS (
  SELECT user_id,
         CAST(ROUND(epoch(ts) - epoch(LAG(ts) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id)), 3)
              AS DECIMAL(20,3)) AS g
  FROM events
  QUALIFY LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
            IS NOT NULL
),
per AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n, SUM(g) AS sg,
         SUM(CAST(ROUND(CAST(g AS DOUBLE) * CAST(g AS DOUBLE), 3)
                  AS DECIMAL(30,3))) AS sgg
  FROM gaps GROUP BY 1
  HAVING COUNT(*) >= {E.BURSTINESS_MIN_GAPS}
),
scored AS (
  SELECT user_id,
         CAST(ROUND((SQRT(GREATEST((CAST(sgg AS DOUBLE)
                      - CAST(n AS DOUBLE)
                        * (CAST(sg AS DOUBLE) / CAST(n AS DOUBLE))
                        * (CAST(sg AS DOUBLE) / CAST(n AS DOUBLE)))
                     / (CAST(n AS DOUBLE) - 1.0), 0.0))
                     - CAST(sg AS DOUBLE) / CAST(n AS DOUBLE))
                    / NULLIF(SQRT(GREATEST((CAST(sgg AS DOUBLE)
                        - CAST(n AS DOUBLE)
                          * (CAST(sg AS DOUBLE) / CAST(n AS DOUBLE))
                          * (CAST(sg AS DOUBLE) / CAST(n AS DOUBLE)))
                       / (CAST(n AS DOUBLE) - 1.0), 0.0))
                       + CAST(sg AS DOUBLE) / CAST(n AS DOUBLE), 0.0), 6)
              AS DECIMAL(10,6)) AS b
  FROM per
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
       ROUND(CAST(SUM(b) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) + 0.0
         AS mean_burstiness,
       ROUND(CAST(MIN(b) AS DOUBLE), 6) + 0.0 AS min_b,
       ROUND(CAST(MAX(b) AS DOUBLE), 6) + 0.0 AS max_b,
       CAST(SUM(CASE WHEN b > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_bursty
FROM scored
""",
)
def events_burstiness_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Goh-Barabasi inter-arrival burstiness per user, summarized —
    the timing-structure diagnostic beside the count-based Fano
    dispersion index."""
    return E.interarrival_burstiness(load_table(spark, sf_dir, "events"))


# --------------------------------------------------------------------------
# Wave 194 (round 2): UMass topic coherence of the frequency head.
# --------------------------------------------------------------------------


@query(
    "vocab_umass_coherence",
    f"""
WITH inc AS (
  SELECT DISTINCT doc_id, t.term
  FROM (SELECT doc_id, unnest({_TK_SQL}) AS term FROM documents) t
  WHERE t.term NOT IN ({_RAKE_SW_SQL})
),
df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM inc GROUP BY 1),
top AS (
  SELECT term, df,
         CAST(ROW_NUMBER() OVER (ORDER BY df DESC, term ASC) AS INT) AS rnk
  FROM df ORDER BY df DESC, term ASC LIMIT {T.COHERENCE_TOPN}
),
ti AS (SELECT i.doc_id, t.term, t.rnk, t.df FROM inc i JOIN top t USING (term)),
co AS (
  SELECT a.term AS wi, b.term AS wj, CAST(COUNT(*) AS BIGINT) AS dij
  FROM ti a JOIN ti b ON a.doc_id = b.doc_id AND a.rnk > b.rnk
  GROUP BY 1, 2
),
grid AS (
  SELECT a.term AS wi, a.rnk AS ri, b.term AS wj, b.df AS dfj
  FROM top a CROSS JOIN top b WHERE a.rnk > b.rnk
),
terms AS (
  SELECT wi, ri,
         CAST(ROUND(ln((CAST(COALESCE(co.dij, 0) AS DOUBLE) + 1.0)
                       / CAST(dfj AS DOUBLE)), 9) AS DECIMAL(18,9)) AS t
  FROM grid LEFT JOIN co USING (wi, wj)
),
per_term AS (
  SELECT wi, ri, SUM(t) AS contrib FROM terms GROUP BY 1, 2
),
tot AS (SELECT SUM(contrib) AS coh FROM per_term)
SELECT p.wi AS term, p.ri AS rank, t.df AS doc_freq,
       ROUND(CAST(p.contrib AS DOUBLE), 6) + 0.0 AS contribution,
       ROUND(CAST(tot.coh AS DOUBLE), 6) + 0.0 AS umass_coherence
FROM per_term p
CROSS JOIN tot
JOIN top t ON p.wi = t.term
ORDER BY rank
""",
)
def vocab_umass_coherence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UMass coherence over the top-10 non-stopword terms (full
    ordered-pair grid including zero-co-occurrence penalties) — the
    intrinsic topic-quality score."""
    return T.umass_coherence(load_table(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# Wave 195 (round 2): weighted MinHash by integer expansion.
# --------------------------------------------------------------------------


@query(
    "dedup_weighted_minhash",
    """
WITH docs_plus AS (
  SELECT doc_id, text, source FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text, source
  FROM documents WHERE doc_id % 100 = 0
),
tf AS (
  SELECT doc_id, t, CAST(COUNT(*) AS INT) AS tf
  FROM (
    SELECT doc_id,
           unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                              x -> x != '')) AS t
    FROM docs_plus
  ) GROUP BY 1, 2
),
expanded AS (
  SELECT doc_id, CAST(concat('0x', substr(md5(t || '#' || CAST(i AS VARCHAR)), 1, 8)) AS BIGINT) AS h
  FROM tf, UNNEST(range(1, tf + 1)) AS u(i)
),
sigs AS (
  SELECT doc_id,
         CAST(MIN((1000003 * h + 12345) % 2147483647) AS BIGINT) AS mh0,
         CAST(MIN((1000033 * h + 23456) % 2147483647) AS BIGINT) AS mh1,
         CAST(MIN((1000037 * h + 34567) % 2147483647) AS BIGINT) AS mh2,
         CAST(MIN((1000039 * h + 45678) % 2147483647) AS BIGINT) AS mh3,
         CAST(MIN((1000081 * h + 56789) % 2147483647) AS BIGINT) AS mh4,
         CAST(MIN((1000099 * h + 67890) % 2147483647) AS BIGINT) AS mh5,
         CAST(MIN((1000117 * h + 78901) % 2147483647) AS BIGINT) AS mh6,
         CAST(MIN((1000121 * h + 89012) % 2147483647) AS BIGINT) AS mh7
  FROM expanded GROUP BY doc_id
),
bands AS (
  -- 2 bands x 4 rows: same layout as the operator (high-sim S-curve)
  SELECT doc_id, 0 AS band,
         CAST(mh0 AS VARCHAR) || '_' || CAST(mh1 AS VARCHAR) || '_' ||
         CAST(mh2 AS VARCHAR) || '_' || CAST(mh3 AS VARCHAR) AS bucket FROM sigs
  UNION ALL
  SELECT doc_id, 1 AS band,
         CAST(mh4 AS VARCHAR) || '_' || CAST(mh5 AS VARCHAR) || '_' ||
         CAST(mh6 AS VARCHAR) || '_' || CAST(mh7 AS VARCHAR) AS bucket FROM sigs
),
cand AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM bands x JOIN bands y
    ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id
),
est AS (
  SELECT c.doc_a, c.doc_b,
         ROUND(CAST(CASE WHEN sa.mh0 = sb.mh0 THEN 1 ELSE 0 END + CASE WHEN sa.mh1 = sb.mh1 THEN 1 ELSE 0 END + CASE WHEN sa.mh2 = sb.mh2 THEN 1 ELSE 0 END + CASE WHEN sa.mh3 = sb.mh3 THEN 1 ELSE 0 END + CASE WHEN sa.mh4 = sb.mh4 THEN 1 ELSE 0 END + CASE WHEN sa.mh5 = sb.mh5 THEN 1 ELSE 0 END + CASE WHEN sa.mh6 = sb.mh6 THEN 1 ELSE 0 END + CASE WHEN sa.mh7 = sb.mh7 THEN 1 ELSE 0 END AS DOUBLE) / 8.0, 6) AS est_wjaccard
  FROM cand c
  JOIN sigs sa ON c.doc_a = sa.doc_id
  JOIN sigs sb ON c.doc_b = sb.doc_id
),
inter AS (
  SELECT c.doc_a, c.doc_b,
         CAST(SUM(LEAST(ta.tf, tb.tf)) AS BIGINT) AS smin
  FROM cand c
  JOIN tf ta ON ta.doc_id = c.doc_a
  JOIN tf tb ON tb.doc_id = c.doc_b AND tb.t = ta.t
  GROUP BY 1, 2
),
sizes AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS sz FROM tf GROUP BY 1),
exact AS (
  SELECT c.doc_a, c.doc_b,
         ROUND(CAST(COALESCE(i.smin, 0) AS DOUBLE)
               / CAST(za.sz + zb.sz - COALESCE(i.smin, 0) AS DOUBLE), 6)
           AS exact_wjaccard
  FROM cand c
  LEFT JOIN inter i ON c.doc_a = i.doc_a AND c.doc_b = i.doc_b
  JOIN sizes za ON c.doc_a = za.doc_id
  JOIN sizes zb ON c.doc_b = zb.doc_id
)
SELECT e.doc_a, e.doc_b, e.est_wjaccard, x.exact_wjaccard,
       ROUND(ABS(e.est_wjaccard - x.exact_wjaccard), 6) AS abs_err
FROM est e JOIN exact x ON e.doc_a = x.doc_a AND e.doc_b = x.doc_b
ORDER BY x.exact_wjaccard DESC, e.doc_a ASC, e.doc_b ASC
LIMIT 30
""",
)
def dedup_weighted_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """tf-aware near-dup pairs: integer-expansion MinHash makes plain
    signatures estimate WEIGHTED Jaccard; banded candidates, exact
    sum-min/sum-max verification, estimator error reported."""
    return D.weighted_minhash_pairs(_docs_plus_spark(spark, sf_dir))


# --------------------------------------------------------------------------
# Wave 196 (round 2): Bayesian beta-binomial A/B readout.
# --------------------------------------------------------------------------


@query(
    "events_bayes_ab",
    f"""
WITH users AS (
  SELECT user_id,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
  FROM events GROUP BY 1
),
arms AS (
  SELECT CAST({_H_SQL.format(v="CAST(user_id AS VARCHAR)")} % 2 AS INT)
           AS arm,
         CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(conv) AS BIGINT) AS c
  FROM users GROUP BY 1
),
j AS (
  SELECT a.n AS n_a, a.c AS c_a, b.n AS n_b, b.c AS c_b
  FROM (SELECT * FROM arms WHERE arm = 0) a
  CROSS JOIN (SELECT * FROM arms WHERE arm = 1) b
),
post AS (
  SELECT n_a, c_a, n_b, c_b,
         (CAST(c_a AS DOUBLE) + 1.0)
           / ((CAST(c_a AS DOUBLE) + 1.0)
              + (CAST(n_a - c_a AS DOUBLE) + 1.0)) AS ma,
         (CAST(c_a AS DOUBLE) + 1.0) * (CAST(n_a - c_a AS DOUBLE) + 1.0)
           / (((CAST(c_a AS DOUBLE) + 1.0) + (CAST(n_a - c_a AS DOUBLE) + 1.0))
              * ((CAST(c_a AS DOUBLE) + 1.0)
                 + (CAST(n_a - c_a AS DOUBLE) + 1.0))
              * ((CAST(c_a AS DOUBLE) + 1.0)
                 + (CAST(n_a - c_a AS DOUBLE) + 1.0) + 1.0)) AS va,
         (CAST(c_b AS DOUBLE) + 1.0)
           / ((CAST(c_b AS DOUBLE) + 1.0)
              + (CAST(n_b - c_b AS DOUBLE) + 1.0)) AS mb,
         (CAST(c_b AS DOUBLE) + 1.0) * (CAST(n_b - c_b AS DOUBLE) + 1.0)
           / (((CAST(c_b AS DOUBLE) + 1.0) + (CAST(n_b - c_b AS DOUBLE) + 1.0))
              * ((CAST(c_b AS DOUBLE) + 1.0)
                 + (CAST(n_b - c_b AS DOUBLE) + 1.0))
              * ((CAST(c_b AS DOUBLE) + 1.0)
                 + (CAST(n_b - c_b AS DOUBLE) + 1.0) + 1.0)) AS vb
  FROM j
),
zed AS (
  SELECT *, (mb - ma) / NULLIF(SQRT(va + vb), 0.0) AS zdiff
  FROM post
)
SELECT n_a, c_a, n_b, c_b,
       ROUND(ma, 6) + 0.0 AS post_mean_a,
       ROUND(mb, 6) + 0.0 AS post_mean_b,
       ROUND(1.959964 * SQRT(va), 6) + 0.0 AS ci95_halfwidth_a,
       ROUND(1.959964 * SQRT(vb), 6) + 0.0 AS ci95_halfwidth_b,
       ROUND(CASE WHEN zdiff >= 0
                  THEN 1.0 - {_nsf2_sql("ABS(zdiff)")} / 2.0
                  ELSE {_nsf2_sql("ABS(zdiff)")} / 2.0 END, 6) + 0.0
         AS p_b_beats_a
FROM zed
""",
)
def events_bayes_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Beta(1,1)-posterior A/B conversion readout with P(B>A) via the
    shared normal tail — the any-time Bayesian companion to SPRT."""
    return E.bayes_ab_conversion(load_table(spark, sf_dir, "events"))


# --------------------------------------------------------------------------
# Wave 197 (round 2): deterministic permutation test on the A/B diff.
# --------------------------------------------------------------------------


@query(
    "events_permutation_test",
    f"""
WITH users AS (
  SELECT user_id,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
  FROM events GROUP BY 1
),
base AS (
  SELECT user_id, conv,
         CAST({_H_SQL.format(v="CAST(user_id AS VARCHAR)")} % 2 AS INT) AS arm
  FROM users
),
obs AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
         CAST(SUM(CASE WHEN arm = 1 THEN conv END) AS BIGINT) AS cb,
         CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb,
         CAST(SUM(CASE WHEN arm = 0 THEN conv END) AS BIGINT) AS ca,
         CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na
  FROM base
),
perms AS (
  SELECT i AS pid, conv,
         CAST({_H_SQL.format(v="CAST(i AS VARCHAR) || '@' || CAST(user_id AS VARCHAR)")} % 2 AS INT)
           AS parm
  FROM base, UNNEST(range(1, {E.PERM_B} + 1)) AS u(i)
),
pstats AS (
  SELECT pid,
         CAST(SUM(CASE WHEN parm = 1 THEN conv END) AS BIGINT) AS cb,
         CAST(SUM(CASE WHEN parm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb,
         CAST(SUM(CASE WHEN parm = 0 THEN conv END) AS BIGINT) AS ca,
         CAST(SUM(CASE WHEN parm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na
  FROM perms GROUP BY 1
),
exceed AS (
  SELECT CAST(SUM(CASE WHEN
           ROUND(ABS(CAST(p.cb AS DOUBLE) / NULLIF(CAST(p.nb AS DOUBLE), 0.0)
                     - CAST(p.ca AS DOUBLE)
                       / NULLIF(CAST(p.na AS DOUBLE), 0.0)), 9)
           >= ROUND(ABS(CAST(o.cb AS DOUBLE) / CAST(o.nb AS DOUBLE)
                        - CAST(o.ca AS DOUBLE) / CAST(o.na AS DOUBLE)), 9)
           THEN 1 ELSE 0 END) AS BIGINT) AS n_exceed
  FROM pstats p CROSS JOIN obs o
)
SELECT n_users,
       ROUND(CAST(ca AS DOUBLE) / CAST(na AS DOUBLE), 6) + 0.0 AS rate_a,
       ROUND(CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE), 6) + 0.0 AS rate_b,
       ROUND(ABS(CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE)
                 - CAST(ca AS DOUBLE) / CAST(na AS DOUBLE)), 6) + 0.0
         AS abs_diff,
       n_exceed,
       ROUND((CAST(n_exceed AS DOUBLE) + 1.0) / {float(E.PERM_B + 1)}, 6)
         + 0.0 AS p_value
FROM obs CROSS JOIN exceed
""",
)
def events_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-style permutation test on the A/B conversion difference:
    200 md5-keyed deterministic relabelings, add-one p — reproducible
    nonparametric inference with no normal approximation."""
    return E.permutation_test_conversion(load_table(spark, sf_dir, "events"))


# --------------------------------------------------------------------------
# Wave 198 (round 2): Weibull retention-shape fit.
# --------------------------------------------------------------------------


@query(
    "events_weibull_retention",
    f"""
WITH spans AS (
  SELECT user_id,
         date_diff('day', MIN(CAST(ts AS DATE)), MAX(CAST(ts AS DATE)))
           AS span
  FROM events GROUP BY 1
),
hist AS (SELECT span, CAST(COUNT(*) AS BIGINT) AS c FROM spans GROUP BY 1),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n_users FROM hist),
grid AS (SELECT CAST(i AS INT) AS t
         FROM UNNEST(range(1, {E.WEIBULL_MAX_T} + 1)) AS u(i)),
surv AS (
  SELECT g.t, tot.n_users,
         CAST(SUM(h.c) AS DOUBLE) / CAST(tot.n_users AS DOUBLE) AS r
  FROM grid g JOIN hist h ON h.span >= g.t CROSS JOIN tot
  GROUP BY g.t, tot.n_users
  HAVING CAST(SUM(h.c) AS DOUBLE) / CAST(tot.n_users AS DOUBLE) > 0
     AND CAST(SUM(h.c) AS DOUBLE) / CAST(tot.n_users AS DOUBLE) < 1
),
pts AS (
  SELECT n_users,
         CAST(ROUND(ln(CAST(t AS DOUBLE)), 9) AS DECIMAL(18,9)) AS lx,
         CAST(ROUND(ln(-ln(r)), 9) AS DECIMAL(18,9)) AS ly
  FROM surv
),
s AS (
  SELECT n_users, CAST(COUNT(*) AS BIGINT) AS m,
         SUM(lx) AS sx, SUM(ly) AS sy, SUM(lx * ly) AS sxy,
         SUM(lx * lx) AS sxx, SUM(ly * ly) AS syy
  FROM pts GROUP BY 1
),
fit AS (
  -- decimal -> double through VARCHAR: scale-18 product sums exceed
  -- 2^53 significands and DuckDB's direct cast can be 1 ulp off
  -- Spark's correctly-rounded BigDecimal cast (the
  -- nation_gravity_model failure class, round 5)
  SELECT n_users, m,
         CAST(m AS DOUBLE) * CAST(CAST(sxy AS VARCHAR) AS DOUBLE)
           - CAST(CAST(sx AS VARCHAR) AS DOUBLE)
             * CAST(CAST(sy AS VARCHAR) AS DOUBLE) AS num,
         CAST(m AS DOUBLE) * CAST(CAST(sxx AS VARCHAR) AS DOUBLE)
           - CAST(CAST(sx AS VARCHAR) AS DOUBLE)
             * CAST(CAST(sx AS VARCHAR) AS DOUBLE) AS denx,
         CAST(m AS DOUBLE) * CAST(CAST(syy AS VARCHAR) AS DOUBLE)
           - CAST(CAST(sy AS VARCHAR) AS DOUBLE)
             * CAST(CAST(sy AS VARCHAR) AS DOUBLE) AS deny,
         CAST(CAST(sx AS VARCHAR) AS DOUBLE) AS sxd,
         CAST(CAST(sy AS VARCHAR) AS DOUBLE) AS syd
  FROM s
),
kk AS (
  SELECT n_users, m, num, denx, deny, sxd, syd,
         num / NULLIF(denx, 0.0) AS k
  FROM fit
)
SELECT n_users, m AS n_points,
       ROUND(k, 6) + 0.0 AS weibull_k,
       ROUND(EXP(-(((syd - k * sxd) / CAST(m AS DOUBLE))
                   / NULLIF(k, 0.0))), 6) + 0.0 AS weibull_lambda,
       ROUND(num * num / NULLIF(denx * deny, 0.0), 6) + 0.0 AS r2,
       CASE WHEN ROUND(k, 6) < 0.95 THEN 'front_loaded'
            WHEN ROUND(k, 6) > 1.05 THEN 'wear_out'
            ELSE 'exponential_like' END AS churn_shape
FROM kk
""",
)
def events_weibull_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weibull shape/scale fit of the activity-span survival curve —
    front-loaded vs wear-out churn, the dimension the exponential
    half-life collapses."""
    return E.weibull_retention_fit(load_table(spark, sf_dir, "events"))


# --------------------------------------------------------------------------
# Wave 199 (round 2): Syntetos-Boylan demand-forecastability quadrants.
# --------------------------------------------------------------------------


@query(
    "parts_sbc_classification",
    f"""
WITH pm AS (
  SELECT l_partkey AS part_id, date_trunc('month', l_shipdate) AS m,
         SUM(CAST(l_quantity AS DECIMAL(15,2))) AS q
  FROM lineitem GROUP BY 1, 2
  HAVING SUM(CAST(l_quantity AS DECIMAL(15,2))) > 0
),
horizon AS (SELECT CAST(COUNT(DISTINCT m) AS BIGINT) AS mm FROM pm),
per AS (
  SELECT part_id, CAST(COUNT(*) AS BIGINT) AS p, SUM(q) AS sq,
         SUM(CAST(ROUND(CAST(q AS DOUBLE) * CAST(q AS DOUBLE), 4)
                  AS DECIMAL(30,4))) AS sqq
  FROM pm GROUP BY 1
),
scored AS (
  SELECT part_id,
         ROUND(CAST(mm AS DOUBLE) / CAST(p AS DOUBLE), 6) AS adi,
         ROUND((CASE WHEN p > 1
                     THEN (CAST(sqq AS DOUBLE)
                           - CAST(p AS DOUBLE)
                             * (CAST(sq AS DOUBLE) / CAST(p AS DOUBLE))
                             * (CAST(sq AS DOUBLE) / CAST(p AS DOUBLE)))
                          / (CAST(p AS DOUBLE) - 1.0)
                     ELSE 0.0 END)
               / NULLIF((CAST(sq AS DOUBLE) / CAST(p AS DOUBLE))
                        * (CAST(sq AS DOUBLE) / CAST(p AS DOUBLE)), 0.0), 6)
           AS cv2
  FROM per CROSS JOIN horizon
),
tagged AS (
  SELECT part_id,
         CASE WHEN adi < {R.SBC_ADI_CUT} AND cv2 < {R.SBC_CV2_CUT}
                THEN 'smooth'
              WHEN adi >= {R.SBC_ADI_CUT} AND cv2 < {R.SBC_CV2_CUT}
                THEN 'intermittent'
              WHEN adi < {R.SBC_ADI_CUT} AND cv2 >= {R.SBC_CV2_CUT}
                THEN 'erratic'
              ELSE 'lumpy' END AS demand_class,
         CAST(adi AS DECIMAL(12,6)) AS adi,
         CAST(cv2 AS DECIMAL(12,6)) AS cv2
  FROM scored
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM tagged)
SELECT demand_class, CAST(COUNT(*) AS BIGINT) AS n_parts,
       ROUND(CAST(COUNT(*) AS DOUBLE) / CAST(MAX(tot.n_total) AS DOUBLE), 6)
         + 0.0 AS share,
       ROUND(CAST(SUM(adi) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) + 0.0
         AS avg_adi,
       ROUND(CAST(SUM(cv2) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) + 0.0
         AS avg_cv2
FROM tagged CROSS JOIN tot
GROUP BY 1 ORDER BY 1
""",
)
def parts_sbc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Syntetos-Boylan ADI x CV^2 forecastability quadrants per part,
    rolled up — which forecasting family each SKU deserves."""
    return R.sbc_demand_classification(load_table(spark, sf_dir, "lineitem"))


# --------------------------------------------------------------------------
# Wave 200 (round 2): feature-vs-label mutual-information ranking.
# --------------------------------------------------------------------------


@query(
    "events_feature_mi_ranking",
    """
WITH base AS (
  SELECT CAST(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS INT)
           AS y,
         'h' || CAST(CAST(FLOOR(hour(ts) / 6) AS INT) AS VARCHAR)
           AS hour_band,
         CAST(CAST(CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END
                   AS INT) AS VARCHAR) AS weekend,
         CASE WHEN value < 50 THEN 'q1' WHEN value < 100 THEN 'q2'
              WHEN value < 150 THEN 'q3' ELSE 'q4' END AS value_band
  FROM events
),
long AS (
  SELECT 'hour_band' AS feature, hour_band AS v, y FROM base
  UNION ALL
  SELECT 'weekend', weekend, y FROM base
  UNION ALL
  SELECT 'value_band', value_band, y FROM base
),
cells AS (
  SELECT feature, v, y, CAST(COUNT(*) AS BIGINT) AS n
  FROM long GROUP BY 1, 2, 3
),
fx AS (SELECT feature, v, CAST(SUM(n) AS BIGINT) AS nx
       FROM cells GROUP BY 1, 2),
fy AS (SELECT feature, y, CAST(SUM(n) AS BIGINT) AS ny
       FROM cells GROUP BY 1, 2),
ft AS (SELECT feature, CAST(SUM(n) AS BIGINT) AS nt FROM cells GROUP BY 1),
j AS (
  SELECT c.feature, c.n, x.nx, yy.ny, t.nt
  FROM cells c
  JOIN fx x ON c.feature = x.feature AND c.v = x.v
  JOIN fy yy ON c.feature = yy.feature AND c.y = yy.y
  JOIN ft t ON c.feature = t.feature
),
mi AS (
  SELECT feature,
         SUM(CAST(ROUND((CAST(n AS DOUBLE) / CAST(nt AS DOUBLE))
                        * log2((CAST(n AS DOUBLE) / CAST(nt AS DOUBLE))
                               / NULLIF((CAST(nx AS DOUBLE)
                                         / CAST(nt AS DOUBLE))
                                        * (CAST(ny AS DOUBLE)
                                           / CAST(nt AS DOUBLE)), 0.0)), 9)
                  AS DECIMAL(18,9))) AS mi
  FROM j GROUP BY 1
),
hx AS (
  SELECT x.feature,
         SUM(CAST(ROUND(-(CAST(nx AS DOUBLE) / CAST(nt AS DOUBLE))
                        * log2(CAST(nx AS DOUBLE) / CAST(nt AS DOUBLE)), 9)
                  AS DECIMAL(18,9))) AS hx
  FROM fx x JOIN ft t ON x.feature = t.feature
  GROUP BY 1
),
out AS (
  SELECT m.feature,
         ROUND(CAST(m.mi AS DOUBLE), 6) + 0.0 AS mi_bits,
         ROUND(CAST(m.mi AS DOUBLE)
               / NULLIF(CAST(h.hx AS DOUBLE), 0.0), 6) + 0.0 AS mi_over_hx
  FROM mi m JOIN hx h ON m.feature = h.feature
)
SELECT feature, mi_bits, mi_over_hx,
       CAST(ROW_NUMBER() OVER (ORDER BY mi_bits DESC, feature ASC) AS INT)
         AS rank
FROM out ORDER BY rank
""",
)
def events_feature_mi_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-feature mutual information with the purchase label, ranked
    — the model-free feature-selection table."""
    return E.feature_mi_ranking(load_table(spark, sf_dir, "events"))


# --------------------------------------------------------------------------
# Wave 201 (round 2): Kneser-Ney smoothed bigram LM per source.
# --------------------------------------------------------------------------


@query(
    "source_kneser_ney_ppl",
    f"""
WITH t AS (SELECT source, {_TK_SQL} AS tk FROM documents),
bg AS (
  SELECT source, tk[i] AS v, tk[i + 1] AS w
  FROM t, UNNEST(range(1, len(tk))) AS u(i)
),
occ AS (
  SELECT source, v, w, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM bg GROUP BY 1, 2, 3
),
cvw AS (SELECT v, w, CAST(SUM(cnt) AS BIGINT) AS cvw FROM occ GROUP BY 1, 2),
cv AS (
  SELECT v, CAST(SUM(cvw) AS BIGINT) AS cv, CAST(COUNT(*) AS BIGINT) AS n1v
  FROM cvw GROUP BY 1
),
n1w AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS n1w FROM cvw GROUP BY 1),
types AS (SELECT CAST(COUNT(*) AS BIGINT) AS tt FROM cvw),
terms AS (
  SELECT o.source, o.cnt,
         CAST(ROUND(ln(GREATEST(CAST(c.cvw AS DOUBLE) - {T.KN_DISCOUNT}, 0.0)
                       / CAST(g.cv AS DOUBLE)
                       + ({T.KN_DISCOUNT} * CAST(g.n1v AS DOUBLE)
                          / CAST(g.cv AS DOUBLE))
                         * (CAST(nw.n1w AS DOUBLE) / CAST(ty.tt AS DOUBLE))),
                    9) AS DECIMAL(18,9))
           * CAST(o.cnt AS DECIMAL(20,0)) AS t
  FROM occ o
  JOIN cvw c USING (v, w)
  JOIN cv g USING (v)
  JOIN n1w nw USING (w)
  CROSS JOIN types ty
),
agg AS (
  SELECT source, CAST(SUM(cnt) AS BIGINT) AS n_bigrams, SUM(t) AS st
  FROM terms GROUP BY 1
)
SELECT source, n_bigrams,
       ROUND(CAST(st AS DOUBLE) / CAST(n_bigrams AS DOUBLE), 6) + 0.0
         AS avg_ln_prob,
       ROUND(EXP(-(CAST(st AS DOUBLE) / CAST(n_bigrams AS DOUBLE))), 6) + 0.0
         AS perplexity
FROM agg ORDER BY source
""",
)
def source_kneser_ney_ppl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kneser-Ney bigram perplexity per source — absolute discounting
    + continuation-probability backoff, the properly smoothed LM
    beside the interpolated baseline."""
    return T.bigram_kneser_ney(load_table(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# Wave 202 (round 2): IPS / SNIPS off-policy evaluation.
# --------------------------------------------------------------------------


@query(
    "events_offpolicy_ips",
    f"""
WITH users AS (
  SELECT user_id,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS r
  FROM events GROUP BY 1
),
base AS (
  SELECT r,
         CAST({_H_SQL.format(v="CAST(user_id AS VARCHAR)")} % 2 AS INT) AS a
  FROM users
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
         CAST(SUM(r) AS BIGINT) AS sr,
         CAST(SUM(CASE WHEN a = 1 THEN r ELSE 0 END) AS BIGINT) AS srb,
         CAST(SUM(CASE WHEN a = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb
  FROM base
)
SELECT n_users,
       ROUND(CAST(sr AS DOUBLE) / CAST(n_users AS DOUBLE), 6) + 0.0
         AS v_behavior,
       ROUND(2.0 * CAST(srb AS DOUBLE) / CAST(n_users AS DOUBLE), 6) + 0.0
         AS v_ips,
       ROUND(2.0 * CAST(srb AS DOUBLE)
             / NULLIF(2.0 * CAST(nb AS DOUBLE), 0.0), 6) + 0.0 AS v_snips,
       ROUND((2.0 * CAST(nb AS DOUBLE)) * (2.0 * CAST(nb AS DOUBLE))
             / NULLIF(4.0 * CAST(nb AS DOUBLE), 0.0), 6) + 0.0 AS ess,
       ROUND(((2.0 * CAST(nb AS DOUBLE)) * (2.0 * CAST(nb AS DOUBLE))
              / NULLIF(4.0 * CAST(nb AS DOUBLE), 0.0))
             / NULLIF(CAST(n_users AS DOUBLE), 0.0), 6) + 0.0
         AS ess_fraction
FROM s
""",
)
def events_offpolicy_ips(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IPS / SNIPS value of the B-only policy from 50/50 logs with
    effective sample size — counterfactual policy evaluation."""
    return E.offpolicy_eval_ips(load_table(spark, sf_dir, "events"))


# --------------------------------------------------------------------------
# Wave 203 (round 2): Leontief input-output multipliers (truncated Neumann
# series on the trade coefficient matrix).
# --------------------------------------------------------------------------


def _leontief_oracle() -> str:
    ctes = [
        """flows AS MATERIALIZED (
  SELECT s_nationkey AS i, c_nationkey AS j,
         SUM(CAST(l_extendedprice AS DECIMAL(15,2))) AS z
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  GROUP BY 1, 2
)""",
        """inflow AS (SELECT j, SUM(z) AS inflow FROM flows GROUP BY 1)""",
        f"""a AS MATERIALIZED (
  SELECT i, j,
         ROUND({R.LEONTIEF_DAMP} * CAST(z AS DOUBLE)
               / CAST(inflow AS DOUBLE), 9) AS a
  FROM flows JOIN inflow USING (j)
)""",
        """nodes AS MATERIALIZED (SELECT n_nationkey AS node FROM nation)""",
        """v0 AS (SELECT node, CAST(1.0 AS DOUBLE) AS s FROM nodes)""",
    ]
    for k in range(1, R.LEONTIEF_ITERS + 1):
        ctes.append(f"""r{k} AS (
  SELECT a.j AS node,
         SUM(CAST(ROUND(a.a * v.s, 9) AS DECIMAL(20,9))) AS raw
  FROM a JOIN v{k-1} v ON a.i = v.node GROUP BY 1
),
v{k} AS MATERIALIZED (
  SELECT nodes.node,
         ROUND(CAST(COALESCE(r.raw, 0) AS DOUBLE), 9) AS s
  FROM nodes LEFT JOIN r{k} r ON nodes.node = r.node
)""")
    unions = "\n  UNION ALL\n  ".join(
        f"SELECT node, s FROM v{k}" for k in range(0, R.LEONTIEF_ITERS + 1)
    )
    ctes.append(f"""acc AS (
  SELECT node,
         CAST(SUM(CAST(ROUND(s, 9) AS DECIMAL(20,9))) AS DOUBLE) AS s
  FROM (
  {unions}
  ) GROUP BY node
)""")
    body = ",\n".join(ctes)
    return f"""
WITH {body}
SELECT n_name AS nation,
       CAST(CAST(COALESCE(inflow, 0) AS DECIMAL(38,2)) AS DOUBLE) AS inflow,
       ROUND(s, 6) + 0.0 AS output_multiplier
FROM acc
JOIN nation ON acc.node = n_nationkey
LEFT JOIN inflow ON acc.node = inflow.j
ORDER BY nation
"""


@query("nation_leontief_multipliers", _leontief_oracle())
def nation_leontief_multipliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leontief output multipliers per nation: truncated Neumann series
    over damped trade coefficients — the demand-ripple economics the
    centrality scores don't give."""
    return finalize_double(
        R.leontief_multipliers(
            load_table(spark, sf_dir, "lineitem"),
            load_table(spark, sf_dir, "orders"),
            load_table(spark, sf_dir, "customer"),
            load_table(spark, sf_dir, "supplier"),
            load_table(spark, sf_dir, "nation"),
        ),
        "inflow",
    )


# --------------------------------------------------------------------------
# Wave 204 (round 2): Dickey-Fuller unit-root test.
# --------------------------------------------------------------------------


@query(
    "orders_dickey_fuller",
    f"""
WITH monthly AS (
  SELECT date_trunc('month', o_orderdate) AS m,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS y
  FROM orders GROUP BY 1
),
ranked AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY m) AS BIGINT) AS t,
         CAST(y AS DOUBLE) AS y
  FROM monthly
),
pairs AS (
  SELECT p.y AS x, c.y - p.y AS dy
  FROM ranked c JOIN ranked p ON c.t = p.t + 1
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(ROUND(x, 4) AS DECIMAL(38,4))) AS sx,
         SUM(CAST(ROUND(dy, 4) AS DECIMAL(38,4))) AS sy,
         SUM(CAST(ROUND(x * x, 4) AS DECIMAL(38,4))) AS sxx,
         SUM(CAST(ROUND(x * dy, 4) AS DECIMAL(38,4))) AS sxy,
         SUM(CAST(ROUND(dy * dy, 4) AS DECIMAL(38,4))) AS syy
  FROM pairs
),
fit AS (
  SELECT n,
         CAST(n AS DOUBLE) AS nd,
         CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd,
         CAST(sxx AS DOUBLE) AS sxxd, CAST(sxy AS DOUBLE) AS sxyd,
         CAST(syy AS DOUBLE) AS syyd
  FROM s
),
bet AS (
  SELECT n, nd, sxd, syd, sxyd, syyd,
         sxxd - sxd * sxd / nd AS sxx_c,
         (sxyd - sxd * syd / nd) / NULLIF(sxxd - sxd * sxd / nd, 0.0) AS b
  FROM fit
),
tau AS (
  SELECT n, b,
         b / NULLIF(SQRT(((syyd - ((syd - b * sxd) / nd) * syd - b * sxyd)
                          / NULLIF(nd - 2.0, 0.0))
                         / NULLIF(sxx_c, 0.0)), 0.0) AS tau
  FROM bet
)
SELECT n,
       ROUND(b, 6) + 0.0 AS beta,
       ROUND(tau, 6) + 0.0 AS df_tau,
       {R.DF_CRIT_5PCT} AS crit_5pct,
       CAST(CASE WHEN ROUND(tau, 6) < {R.DF_CRIT_5PCT} THEN 1 ELSE 0 END
            AS INT) AS stationary_5pct
FROM tau
""",
)
def orders_dickey_fuller(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dickey-Fuller tau on monthly revenue (constant, no trend) vs
    the -2.86 5% critical value — the stationarity precondition check
    under the ARMA-family fits."""
    return R.dickey_fuller_test(load_table(spark, sf_dir, "orders"))


# --------------------------------------------------------------------------
# Wave 205 (round 2): Two-NN intrinsic-dimension estimate.
# --------------------------------------------------------------------------


@query(
    "embedding_intrinsic_dim",
    """
WITH emb_s AS (
  -- deterministic all-pairs decimation cap (stride 1 at test scale):
  -- same rule as operators.knn._decimated
  SELECT * FROM embeddings
  WHERE vec_id % (SELECT GREATEST(1, CAST(CEIL(COUNT(*) / 65536.0) AS BIGINT))
                  FROM embeddings) = 0
),
pairs AS (
  SELECT a.vec_id AS qid, b.vec_id AS cid,
         unnest(CAST(a.embedding AS DOUBLE[])) AS x,
         unnest(CAST(b.embedding AS DOUBLE[])) AS y
  FROM emb_s a CROSS JOIN emb_s b
  WHERE a.vec_id <> b.vec_id
),
d AS (
  SELECT qid, cid, ROUND(SUM((x - y) * (x - y)), 6) AS d
  FROM pairs GROUP BY qid, cid
),
top2 AS (
  SELECT qid,
         MIN(CASE WHEN rnk = 1 THEN d END) AS d1,
         MIN(CASE WHEN rnk = 2 THEN d END) AS d2
  FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                                 ORDER BY d ASC, cid ASC) AS rnk
    FROM d
  ) WHERE rnk <= 2
  GROUP BY qid
),
terms AS (
  SELECT CAST(ROUND(0.5 * ln(d2 / NULLIF(d1, 0.0)), 9) AS DECIMAL(18,9))
           AS lr
  FROM top2 WHERE d1 > 0
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_valid, SUM(lr) AS slr FROM terms
),
dupes AS (
  SELECT CAST(SUM(CASE WHEN d1 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_dupes
  FROM top2
)
SELECT n_valid, n_dupes,
       ROUND(CAST(n_valid - 1 AS DOUBLE)
             / NULLIF(CAST(slr AS DOUBLE), 0.0), 6) + 0.0 AS intrinsic_dim,
       ROUND(CAST(slr AS DOUBLE) / CAST(n_valid AS DOUBLE), 6) + 0.0
         AS mean_ln_ratio
FROM s CROSS JOIN dupes
""",
)
def embedding_intrinsic_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Facco two-NN intrinsic dimension of the embedding cloud —
    degrees of freedom actually used vs the ambient 64."""
    return K.twonn_intrinsic_dim(load_table(spark, sf_dir, "embeddings"))


# --------------------------------------------------------------------------
# Wave 206 (round 2): composite bot / automation screen.
# --------------------------------------------------------------------------


@query(
    "events_bot_screen",
    f"""
WITH per AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS days
  FROM events GROUP BY 1
),
tcnt AS (
  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
ent AS (
  SELECT t.user_id,
         CAST(SUM(CAST(ROUND(-(CAST(t.c AS DOUBLE)
                               / CAST(p.n_events AS DOUBLE))
                             * log2(CAST(t.c AS DOUBLE)
                                    / CAST(p.n_events AS DOUBLE)), 9)
                       AS DECIMAL(18,9))) AS DOUBLE) AS type_entropy
  FROM tcnt t JOIN per p USING (user_id)
  GROUP BY 1
),
gaps AS (
  SELECT user_id,
         CAST(ROUND(epoch(ts) - epoch(LAG(ts) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id)), 3)
              AS DECIMAL(20,3)) AS g
  FROM events
  QUALIFY LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
            IS NOT NULL
),
bur AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS ng, SUM(g) AS sg,
         SUM(CAST(ROUND(CAST(g AS DOUBLE) * CAST(g AS DOUBLE), 3)
                  AS DECIMAL(30,3))) AS sgg
  FROM gaps GROUP BY 1 HAVING COUNT(*) >= 2
),
bcol AS (
  SELECT user_id,
         ROUND((SQRT(GREATEST((CAST(sgg AS DOUBLE)
                    - CAST(ng AS DOUBLE)
                      * (CAST(sg AS DOUBLE) / CAST(ng AS DOUBLE))
                      * (CAST(sg AS DOUBLE) / CAST(ng AS DOUBLE)))
                   / (CAST(ng AS DOUBLE) - 1.0), 0.0))
                - CAST(sg AS DOUBLE) / CAST(ng AS DOUBLE))
               / NULLIF(SQRT(GREATEST((CAST(sgg AS DOUBLE)
                      - CAST(ng AS DOUBLE)
                        * (CAST(sg AS DOUBLE) / CAST(ng AS DOUBLE))
                        * (CAST(sg AS DOUBLE) / CAST(ng AS DOUBLE)))
                     / (CAST(ng AS DOUBLE) - 1.0), 0.0))
                     + CAST(sg AS DOUBLE) / CAST(ng AS DOUBLE), 0.0), 6)
           AS burstiness
  FROM bur
),
joined AS (
  SELECT p.user_id, p.n_events,
         ROUND(CAST(p.n_events AS DOUBLE) / CAST(p.days AS DOUBLE), 6)
           AS rate_per_day,
         ROUND(e.type_entropy, 6) + 0.0 AS type_entropy,
         b.burstiness
  FROM per p JOIN ent e USING (user_id) JOIN bcol b USING (user_id)
)
SELECT user_id, n_events, rate_per_day, type_entropy, burstiness,
       ROUND(rate_per_day / 10.0 + (2.321928094887362 - type_entropy)
             - burstiness, 6) + 0.0 AS bot_score
FROM joined
ORDER BY bot_score DESC, user_id ASC
LIMIT {E.BOT_TOPK}
""",
)
def events_bot_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rate x variety x timing composite bot score per user, ranked —
    the abuse screen with every signal column shipped for re-weighting."""
    return E.bot_detection_screen(load_table(spark, sf_dir, "events"))


# --------------------------------------------------------------------------
# Wave 207 (round 2): payload byte-entropy content sniffing.
# --------------------------------------------------------------------------


@query(
    "multimodal_entropy_sniff",
    f"""
WITH base AS (
  SELECT doc_id, source,
         substr(hex(encode(text)), 1, 2 * {MM.ENTROPY_PREFIX_BYTES}) AS hx
  FROM documents
),
bytes AS (
  SELECT doc_id, source, CAST(length(hx) / 2 AS INT) AS nb,
         substr(hx, (i - 1) * 2 + 1, 2) AS b
  FROM base, UNNEST(range(1, CAST(length(hx) / 2 AS INT) + 1)) AS u(i)
  WHERE length(hx) >= 2
),
cnt AS (
  SELECT doc_id, source, nb, b, CAST(COUNT(*) AS BIGINT) AS c
  FROM bytes GROUP BY 1, 2, 3, 4
),
ent AS (
  -- log2 only on INTEGERS 1..{MM.ENTROPY_PREFIX_BYTES}, quantized to
  -- DECIMAL(18,9); per-doc nano-bits numerator folds exactly, then
  -- HALF_UP to 6-dp micros in pure HUGEINT arithmetic — no double is
  -- ever ROUNDed, so tie-break semantics cannot diverge from Spark
  SELECT doc_id, source,
         (2 * CAST((CAST(nb AS DECIMAL(9,0))
                * CAST(ROUND(log2(CAST(nb AS DOUBLE)), 9) AS DECIMAL(18,9))
              - SUM(CAST(c AS DECIMAL(9,0))
                * CAST(ROUND(log2(CAST(c AS DOUBLE)), 9) AS DECIMAL(18,9)))
              ) * 1000000000 AS HUGEINT)
          + 1000 * CAST(nb AS HUGEINT))
         // (2000 * CAST(nb AS HUGEINT)) AS h6
  FROM cnt GROUP BY doc_id, source, nb
)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST((2 * SUM(CAST(h6 AS HUGEINT)) + COUNT(*))
            // (2 * CAST(COUNT(*) AS HUGEINT)) AS DOUBLE)
         / 1000000.0 AS avg_entropy_bits,
       CAST(MAX(h6) AS DOUBLE) / 1000000.0 AS max_entropy_bits,
       CAST(SUM(CASE WHEN h6 > {int(round(MM.ENTROPY_HIGH_BITS * 1_000_000))}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_high_entropy
FROM ent GROUP BY 1 ORDER BY 1
""",
)
def multimodal_entropy_sniff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source byte-entropy triage of payload prefixes — the body
    complement to magic-byte mime sniffing; flags compressed/encrypted
    blobs a text pipeline should quarantine."""
    return MM.payload_entropy_sniff(load_table(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# Wave 208 (round 2): link prediction on the major-lane trade graph.
# --------------------------------------------------------------------------


@query(
    "nation_link_prediction",
    f"""
WITH flows AS MATERIALIZED (
  SELECT s_nationkey AS u, c_nationkey AS v, CAST(COUNT(*) AS BIGINT) AS w
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  WHERE s_nationkey <> c_nationkey
  GROUP BY 1, 2
),
edges AS (
  SELECT u, v FROM (
    SELECT u, v,
           ROW_NUMBER() OVER (PARTITION BY u ORDER BY w DESC, v ASC) AS rnk
    FROM flows
  ) WHERE rnk <= 3
),
und AS MATERIALIZED (
  SELECT u, v FROM edges UNION SELECT v, u FROM edges
),
deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS deg FROM und GROUP BY 1),
hop AS (
  SELECT x.u AS a, x.v AS z, y.v AS b
  FROM und x JOIN und y ON x.v = y.u
  WHERE x.u < y.v
),
cand AS (
  SELECT a, z, b FROM hop
  WHERE NOT EXISTS (SELECT 1 FROM und e WHERE e.u = hop.a AND e.v = hop.b)
),
scored AS (
  SELECT a, b, CAST(COUNT(*) AS BIGINT) AS common,
         SUM(CAST(ROUND(1.0 / NULLIF(ln(CAST(d.deg AS DOUBLE)), 0.0), 9)
                  AS DECIMAL(18,9))) AS aa
  FROM cand JOIN deg d ON cand.z = d.u
  GROUP BY 1, 2
),
out AS (
  SELECT s.a, s.b, s.common,
         ROUND(CAST(s.common AS DOUBLE)
               / CAST(da.deg + db.deg - s.common AS DOUBLE), 6) AS jaccard,
         ROUND(CAST(s.aa AS DOUBLE), 6) + 0.0 AS adamic_adar
  FROM scored s
  JOIN deg da ON s.a = da.u
  JOIN deg db ON s.b = db.u
)
SELECT na.n_name AS nation_a, nb.n_name AS nation_b, common, jaccard,
       adamic_adar
FROM out
JOIN nation na ON out.a = na.n_nationkey
JOIN nation nb ON out.b = nb.n_nationkey
ORDER BY adamic_adar DESC, nation_a ASC, nation_b ASC
LIMIT {R.LINKPRED_TOPK}
""",
)
def nation_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jaccard + Adamic-Adar link prediction over non-edges of the
    top-3-partner trade graph, candidates from 2-hop paths only."""
    return R.trade_link_prediction(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "nation"),
    )


# --------------------------------------------------------------------------
# Wave 209 (round 2): held-out lambda sweep for the interpolated bigram LM.
# --------------------------------------------------------------------------


@query(
    "source_lm_lambda_sweep",
    """
WITH tagged AS (
  SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x != '') AS tk,
         (CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 5 = 0) AS held
  FROM documents
),
bg AS (
  SELECT held, tk[i] AS v, tk[i + 1] AS w
  FROM tagged, UNNEST(range(1, len(tk))) AS u(i)
),
cvw AS (
  SELECT v, w, CAST(COUNT(*) AS BIGINT) AS cvw
  FROM bg WHERE NOT held GROUP BY 1, 2
),
cv AS (SELECT v, CAST(SUM(cvw) AS BIGINT) AS cv FROM cvw GROUP BY 1),
cw AS (SELECT w, CAST(SUM(cvw) AS BIGINT) AS cw FROM cvw GROUP BY 1),
tot AS (
  SELECT CAST(SUM(cw) AS BIGINT) AS nn, CAST(COUNT(*) AS BIGINT) AS vv
  FROM cw
),
held AS (
  SELECT v, w, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM bg WHERE held GROUP BY 1, 2
),
joined AS (
  SELECT h.cnt, c.cvw, g.cv, x.cw, t.nn, t.vv
  FROM held h
  LEFT JOIN cvw c USING (v, w)
  LEFT JOIN cv g USING (v)
  LEFT JOIN cw x USING (w)
  CROSS JOIN tot t
),
lams(lam) AS (VALUES (0.1), (0.3), (0.5), (0.7), (0.9)),
scored AS (
  SELECT l.lam, j.cnt,
         CAST(ROUND(ln(l.lam * COALESCE(CAST(j.cvw AS DOUBLE)
                                        / NULLIF(CAST(j.cv AS DOUBLE), 0.0),
                                        0.0)
                       + (1.0 - l.lam)
                         * ((CAST(COALESCE(j.cw, 0) AS DOUBLE) + 1.0)
                            / (CAST(j.nn AS DOUBLE) + CAST(j.vv AS DOUBLE)))),
                    9) AS DECIMAL(18,9))
           * CAST(j.cnt AS DECIMAL(20,0)) AS t
  FROM joined j CROSS JOIN lams l
),
agg AS (
  SELECT lam, CAST(SUM(cnt) AS BIGINT) AS n_scored, SUM(t) AS st
  FROM scored GROUP BY 1
),
out AS (
  SELECT lam, n_scored,
         ROUND(CAST(st AS DOUBLE) / CAST(n_scored AS DOUBLE), 6) + 0.0
           AS avg_ln_prob,
         ROUND(EXP(-(CAST(st AS DOUBLE) / CAST(n_scored AS DOUBLE))), 6) + 0.0
           AS perplexity
  FROM agg
)
SELECT lam, n_scored, avg_ln_prob, perplexity,
       CAST(CASE WHEN ROW_NUMBER() OVER (ORDER BY perplexity ASC, lam ASC) = 1
                 THEN 1 ELSE 0 END AS INT) AS is_best
FROM out ORDER BY lam
""",
)
def source_lm_lambda_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolation-weight sweep for the bigram LM scored on an
    md5-gated held-out split — tuning with honest evaluation, best
    lambda flagged by held-out perplexity."""
    return T.bigram_lambda_sweep(load_table(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# Wave 210 (round 2): candidate-key discovery profiling.
# --------------------------------------------------------------------------

_KEY_UNIONS = "\nUNION ALL\n".join(
    f"""SELECT '{t}' AS table_name, '{c}' AS column_name,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
       CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls
FROM {t}"""
    for t, cols in R.KEY_CANDIDATES.items()
    for c in cols
)


@query(
    "table_key_discovery",
    f"""
WITH stats AS (
{_KEY_UNIONS}
)
SELECT table_name, column_name, n_rows, n_distinct, n_nulls,
       ROUND(CAST(n_distinct AS DOUBLE)
             / NULLIF(CAST(n_rows - n_nulls AS DOUBLE), 0.0), 6) + 0.0
         AS uniqueness,
       CAST(CASE WHEN n_distinct = n_rows AND n_nulls = 0
                 THEN 1 ELSE 0 END AS INT) AS is_key,
       CAST(CASE WHEN ROUND(CAST(n_distinct AS DOUBLE)
                            / NULLIF(CAST(n_rows - n_nulls AS DOUBLE), 0.0),
                            6) >= 0.99
                 THEN 1 ELSE 0 END AS INT) AS is_near_key
FROM stats
ORDER BY table_name, column_name
""",
)
def table_key_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-key mining per table: uniqueness ratios + key /
    near-key verdicts off one aggregate per table."""
    return R.key_discovery(
        {t: load_table(spark, sf_dir, t) for t in R.KEY_CANDIDATES}
    )


# --------------------------------------------------------------------------
# Wave 211 (round 2): lognormal session-duration fit.
# --------------------------------------------------------------------------


@query(
    "events_session_lognormal",
    f"""
WITH marked AS (
  SELECT user_id, ts, event_id,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR epoch(ts) - epoch(LAG(ts) OVER w)
                   > {E.LOGNORM_GAP_MIN} * 60
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
),
durs AS (
  SELECT user_id, sid,
         ROUND(MAX(epoch(ts)) - MIN(epoch(ts)), 3) AS d
  FROM sess GROUP BY 1, 2
),
pts AS (
  SELECT CAST(ROUND(ln(d), 9) AS DECIMAL(18,9)) AS l FROM durs WHERE d > 0
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions, SUM(l) AS sl,
         SUM(CAST(ROUND(CAST(l AS DOUBLE) * CAST(l AS DOUBLE), 9)
                  AS DECIMAL(28,9))) AS sll
  FROM pts
),
zero AS (
  SELECT CAST(SUM(CASE WHEN d = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_single
  FROM durs
),
emp AS (
  SELECT SUM(CAST(d AS DECIMAL(20,3))) AS sd FROM durs WHERE d > 0
),
fit AS (
  SELECT n_sessions, n_single, sd,
         CAST(sl AS DOUBLE) / CAST(n_sessions AS DOUBLE) AS mu,
         SQRT(GREATEST((CAST(sll AS DOUBLE)
                        - CAST(n_sessions AS DOUBLE)
                          * (CAST(sl AS DOUBLE) / CAST(n_sessions AS DOUBLE))
                          * (CAST(sl AS DOUBLE) / CAST(n_sessions AS DOUBLE)))
                       / (CAST(n_sessions AS DOUBLE) - 1.0), 0.0)) AS sig
  FROM s CROSS JOIN zero CROSS JOIN emp
)
SELECT n_sessions, n_single,
       ROUND(mu, 6) + 0.0 AS mu_ln,
       ROUND(sig, 6) + 0.0 AS sigma_ln,
       ROUND(EXP(mu), 6) + 0.0 AS median_model_s,
       ROUND(EXP(mu + sig * sig / 2.0), 6) + 0.0 AS mean_model_s,
       ROUND(CAST(sd AS DOUBLE) / CAST(n_sessions AS DOUBLE), 6) + 0.0
         AS mean_empirical_s,
       ROUND(EXP(mu + 1.644854 * sig), 6) + 0.0 AS p95_model_s
FROM fit
""",
)
def events_session_lognormal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lognormal (mu, sigma) of session durations by log-moment
    matching, with model median/mean/p95 beside the empirical mean —
    the parametric capacity-planning fit."""
    return E.session_lognormal_fit(load_table(spark, sf_dir, "events"))


# --------------------------------------------------------------------------
# Wave 212 (round 2): recency-bucket next-purchase hazard (PIT cutoff).
# --------------------------------------------------------------------------


@query(
    "orders_recency_hazard",
    f"""
WITH cut AS (
  SELECT MAX(o_orderdate) - INTERVAL {R.HAZARD_HORIZON_DAYS} DAY AS cutoff
  FROM orders
),
bef AS (
  SELECT o_custkey,
         date_diff('day', MAX(o_orderdate), MAX(c.cutoff)) AS recency
  FROM orders CROSS JOIN cut c
  WHERE o_orderdate <= c.cutoff
  GROUP BY 1
),
aft AS (
  SELECT DISTINCT o_custkey, 1 AS bought
  FROM orders CROSS JOIN cut c
  WHERE o_orderdate > c.cutoff
),
tagged AS (
  SELECT CASE WHEN recency <= 30 THEN 'a_0_30'
              WHEN recency <= 60 THEN 'b_31_60'
              WHEN recency <= 120 THEN 'c_61_120'
              WHEN recency <= 365 THEN 'd_121_365'
              ELSE 'e_365_plus' END AS recency_bucket,
         COALESCE(a.bought, 0) AS bought
  FROM bef b LEFT JOIN aft a USING (o_custkey)
),
base AS (
  SELECT CAST(SUM(bought) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS base_rate
  FROM tagged
)
SELECT recency_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(bought) AS BIGINT) AS n_purchased,
       ROUND(CAST(SUM(bought) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) + 0.0
         AS next30_rate,
       ROUND((CAST(SUM(bought) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
             / NULLIF(MAX(base.base_rate), 0.0), 6) + 0.0 AS lift_vs_base
FROM tagged CROSS JOIN base
GROUP BY 1 ORDER BY 1
""",
)
def orders_recency_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-bucket next-30-day purchase rates with lift vs base —
    the PIT-disciplined reactivation calibration table."""
    return R.recency_purchase_hazard(load_table(spark, sf_dir, "orders"))


# --------------------------------------------------------------------------
# Wave 213 (round 2): kNN-distance out-of-distribution scores.
# --------------------------------------------------------------------------


@query(
    "embedding_knn_ood",
    f"""
WITH emb_s AS (
  -- deterministic all-pairs decimation cap (stride 1 at test scale):
  -- same rule as operators.knn._decimated
  SELECT * FROM embeddings
  WHERE vec_id % (SELECT GREATEST(1, CAST(CEIL(COUNT(*) / 65536.0) AS BIGINT))
                  FROM embeddings) = 0
),
pairs AS (
  SELECT a.vec_id AS qid, b.vec_id AS cid,
         unnest(CAST(a.embedding AS DOUBLE[])) AS x,
         unnest(CAST(b.embedding AS DOUBLE[])) AS y
  FROM emb_s a CROSS JOIN emb_s b
  WHERE a.vec_id <> b.vec_id
),
d AS (
  SELECT qid, cid, ROUND(SUM((x - y) * (x - y)), 6) AS d
  FROM pairs GROUP BY qid, cid
),
tops AS (
  SELECT qid,
         MIN(CASE WHEN rnk = 1 THEN d END) AS d1,
         MIN(CASE WHEN rnk = {K.OOD_K} THEN d END) AS dk
  FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                                 ORDER BY d ASC, cid ASC) AS rnk
    FROM d
  ) WHERE rnk <= {K.OOD_K}
  GROUP BY qid
)
SELECT qid AS vec_id,
       ROUND(SQRT(d1), 6) AS dist_nn1,
       ROUND(SQRT(dk), 6) AS ood_score
FROM tops
ORDER BY ood_score DESC, vec_id ASC
LIMIT {K.OOD_TOPN}
""",
)
def embedding_knn_ood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-th-NN distance OOD scores, top candidates — the
    non-parametric outlier detector beside the norm screen."""
    return K.knn_ood_scores(load_table(spark, sf_dir, "embeddings"))


# --------------------------------------------------------------------------
# Wave 214 (round 2): GPD peaks-over-threshold tail fit (PWM closed form).
# --------------------------------------------------------------------------


@query(
    "orders_gpd_tail",
    f"""
WITH u AS (
  SELECT ROUND(quantile_cont(CAST(o_totalprice AS DOUBLE),
                             {R.GPD_THRESHOLD_Q}), 6) AS u,
         CAST(COUNT(*) AS BIGINT) AS n_total
  FROM orders
),
exc AS (
  SELECT o_orderkey, u.u, u.n_total,
         ROUND(CAST(o_totalprice AS DOUBLE) - u.u, 6) AS y
  FROM orders CROSS JOIN u
  WHERE CAST(o_totalprice AS DOUBLE) > u.u
),
ranked AS (
  SELECT *,
         CAST(ROW_NUMBER() OVER (ORDER BY y ASC, o_orderkey ASC) AS BIGINT)
           AS r,
         CAST(COUNT(*) OVER () AS BIGINT) AS n
  FROM exc
),
s AS (
  SELECT u, n_total, n,
         SUM(CAST(y AS DECIMAL(20,6))) AS sy,
         SUM(CAST(ROUND(CAST(r - 1 AS DOUBLE) / CAST(n - 1 AS DOUBLE) * y, 6)
                  AS DECIMAL(24,6))) AS swy
  FROM ranked GROUP BY 1, 2, 3
),
fit AS (
  SELECT u, n_total, n,
         CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS b0,
         CAST(swy AS DOUBLE) / CAST(n AS DOUBLE) AS b1
  FROM s
),
kk AS (
  SELECT u, n_total, n, b0, b1,
         b0 / NULLIF(2.0 * b1 - b0, 0.0) - 2.0 AS k
  FROM fit
)
SELECT u AS threshold, n AS n_exceed,
       ROUND(-k, 6) + 0.0 AS gpd_xi,
       ROUND(b0 * (1.0 + k), 6) + 0.0 AS gpd_sigma,
       ROUND(u + (b0 * (1.0 + k)) / NULLIF(-k, 0.0)
                 * (pow((CAST(n AS DOUBLE) / CAST(n_total AS DOUBLE))
                        / (1.0 / ({float(R.GPD_RET_MULT)}
                                  * CAST(n_total AS DOUBLE))), -k)
                    - 1.0), 6) + 0.0 AS return_level_10n,
       CASE WHEN ROUND(-k, 6) > 0.05 THEN 'heavy'
            WHEN ROUND(-k, 6) < -0.05 THEN 'bounded'
            ELSE 'exponential_like' END AS tail_class
FROM kk
""",
)
def orders_gpd_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hosking-Wallis PWM fit of the GPD over P95 exceedances with the
    10N return level — the full EVT read beside the Hill index."""
    return R.gpd_tail_fit(load_table(spark, sf_dir, "orders"))


# --------------------------------------------------------------------------
# Wave 215 (round 2): Burrows' Delta stylometric source similarity.
# --------------------------------------------------------------------------


@query(
    "source_burrows_delta",
    f"""
WITH toks AS (
  SELECT source, unnest({_TK_SQL}) AS t FROM documents
),
stot AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_src
         FROM toks GROUP BY 1),
top AS (
  SELECT t FROM (
    SELECT t, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY 1
  ) ORDER BY c DESC, t ASC LIMIT {T.DELTA_TOP_WORDS}
),
grid AS (
  SELECT k.source, k.t,
         ROUND(CAST(COUNT(*) AS DOUBLE) / CAST(MAX(s.n_src) AS DOUBLE), 9)
           AS f
  FROM toks k JOIN top USING (t) JOIN stot s USING (source)
  GROUP BY 1, 2
),
full_grid AS (
  SELECT s.source, top.t, COALESCE(g.f, 0.0) AS f
  FROM stot s CROSS JOIN top
  LEFT JOIN grid g ON g.source = s.source AND g.t = top.t
),
stats AS (
  SELECT t, CAST(COUNT(*) AS BIGINT) AS k,
         SUM(CAST(f AS DECIMAL(18,9))) AS sf,
         SUM(CAST(ROUND(f * f, 12) AS DECIMAL(24,12))) AS sff
  FROM full_grid GROUP BY 1
),
wstats AS (
  SELECT t,
         ROUND(CAST(sf AS DOUBLE) / CAST(k AS DOUBLE), 9) AS mu,
         ROUND(SQRT(GREATEST((CAST(sff AS DOUBLE)
                              - CAST(k AS DOUBLE)
                                * (CAST(sf AS DOUBLE) / CAST(k AS DOUBLE))
                                * (CAST(sf AS DOUBLE) / CAST(k AS DOUBLE)))
                             / (CAST(k AS DOUBLE) - 1.0), 0.0)), 9) AS sd
  FROM stats
),
z AS (
  SELECT g.source, g.t,
         ROUND((g.f - w.mu) / NULLIF(w.sd, 0.0), 6) AS z
  FROM full_grid g JOIN wstats w USING (t)
),
pairs AS (
  SELECT a.source AS source_a, b.source AS source_b,
         CAST(COUNT(*) AS BIGINT) AS n_words,
         SUM(CAST(ROUND(ABS(a.z - b.z), 6) AS DECIMAL(20,6))) AS sdz
  FROM z a JOIN z b ON a.t = b.t AND a.source < b.source
  GROUP BY 1, 2
)
SELECT source_a, source_b,
       ROUND(CAST(sdz AS DOUBLE) / CAST(n_words AS DOUBLE), 6) + 0.0
         AS delta
FROM pairs
ORDER BY delta ASC, source_a ASC, source_b ASC
LIMIT {T.DELTA_TOPK_PAIRS}
""",
)
def source_burrows_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burrows' Delta over the top-30 corpus words: the most
    stylistically similar source pairs — template farms and mirrored
    scrapes show up as near-zero Delta."""
    return T.burrows_delta_pairs(load_table(spark, sf_dir, "documents"))

