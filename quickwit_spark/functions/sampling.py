"""Deterministic sampling for training-data pipelines.

A 100 TB corpus is rarely consumed whole: training mixes down-sample
by language / source / quality ("take 3% of English, all of the rare
languages", "keep the N longest docs per language"). Two properties
matter at that scale and neither is provided by ``df.sample()``:

- **determinism**: the same doc must make the same keep/drop decision
  on every run, executor, retry and engine (Spark's ``sample()`` is
  seed-stable only for a fixed partitioning — a repartition reshuffles
  the outcome). Here the decision is a pure function of the doc key:
  a 60-bit uniform draw from ``md5(seed|key)``, so an exact SQL
  oracle (DuckDB) reproduces the selection bit-for-bit.
- **no shuffle for the Bernoulli path**: ``stratified_sample`` is a
  single ``filter`` — a map over the scan with the parquet pushdown
  intact. At 10^12 docs it costs one pass, no exchange, no skew.

``topn_per_stratum`` (the "N best docs per language" shape) does
shuffle — one hash exchange on the stratum column. Stratum skew is
the classic window-function hazard (one task owns all of ``en``), but
expressing it as ``row_number() ≤ N`` lets Catalyst insert a
**partial WindowGroupLimit before the exchange** (Spark ≥3.5): each
map task pre-prunes to its local top-N under the same ordering, so a
mega-stratum ships ``N × input_partitions`` rows, not its full mass
(asserted in tests/test_functions.py::test_topn_per_stratum_order_and_plan).

The uniform draw uses the first 15 hex chars of md5 (60 bits — exact
in an int64 and in DuckDB's BIGINT), compared against integer
thresholds ``floor(rate · 2^60)`` computed driver-side in Python so
both engines compare the same literals (no float rounding divergence).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SCALE = 1 << 60  # 15 hex digits


def sample_hash_col(key: Column, seed: str = "sample") -> Column:
    """60-bit uniform integer draw, a pure function of (seed, key).

    SQL-oracle equivalent:
    ``CAST(concat('0x', substr(md5(concat('<seed>|', key)), 1, 15)) AS BIGINT)``.
    """
    hexs = F.substring(
        F.md5(F.concat(F.lit(f"{seed}|"), key.cast("string"))), 1, 15
    )
    return F.conv(hexs, 16, 10).cast("long")


def rate_thresholds(
    rates: dict[str, float], default_rate: float = 0.0
) -> tuple[dict[str, int], int]:
    """Per-stratum integer thresholds ``floor(rate · 2^60)`` — the
    exact literals both the Spark plan and a SQL oracle compare
    against."""
    for s, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for stratum {s!r} must be in [0, 1]: {r}")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError(f"default_rate must be in [0, 1]: {default_rate}")
    return (
        {s: min(int(r * _SCALE), _SCALE) for s, r in rates.items()},
        min(int(default_rate * _SCALE), _SCALE),
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    key_col: str,
    seed: str = "sample",
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum Bernoulli sample: keep a row iff
    ``hash(seed|key) < floor(rate[stratum] · 2^60)``.

    One ``filter`` — no shuffle, no state; strata not in ``rates``
    fall back to ``default_rate``. The keep decision depends only on
    (seed, key, stratum), so re-runs, retries and different
    partitionings select the identical row set.
    """
    thr, dflt = rate_thresholds(rates, default_rate)
    threshold = F.lit(dflt).cast("long")
    for s, t in thr.items():
        threshold = (
            F.when(F.col(strata_col) == F.lit(s), F.lit(t).cast("long"))
            .otherwise(threshold)
        )
    return df.filter(sample_hash_col(F.col(key_col), seed) < threshold)


def topn_per_stratum(
    df: DataFrame,
    strata_col: str,
    n: int,
    key_col: str,
    order_col: str | None = None,
    descending: bool = True,
) -> DataFrame:
    """The N "best" rows per stratum, deterministically.

    ``order_col`` ranks rows within a stratum (e.g. a quality score or
    ``n_chars``), descending by default, with ``key_col`` as the total
    tie-break; ``order_col=None`` ranks by the uniform key hash — a
    deterministic fixed-size subsample per stratum.

    Skew guard: the plan is exactly ``row_number() over (partition by
    stratum order by ...) <= n``, the shape Catalyst rewrites into a
    partial ``WindowGroupLimit`` ahead of the exchange (Spark >= 3.5)
    — any row outside a map task's local top-N cannot be in the
    global top-N, so each task ships at most N rows per stratum.
    """
    if order_col is None:
        df = df.withColumn("__rank_key", sample_hash_col(F.col(key_col)))
        rank_col, desc = "__rank_key", False
    else:
        rank_col, desc = order_col, descending
    order = [
        F.col(rank_col).desc() if desc else F.col(rank_col).asc(),
        F.col(key_col).asc(),
    ]
    w = Window.partitionBy(strata_col).orderBy(*order)
    out = (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )
    return out.drop("__rank_key") if order_col is None else out


def token_budget_sample(
    df: DataFrame,
    budgets: dict[str, int],
    stratum_col: str = "lang",
    text_col: str = "text",
    key_col: str = "doc_id",
    seed: str = "mix",
) -> DataFrame:
    """Data-mixture curation: down-sample each stratum (language /
    domain / source) so its EXPECTED token count matches a target
    budget — the standard step that turns a raw crawl into a training
    mix ("2B tokens of code, 500M of French, ...").

    ``rate_s = min(1, budget_s / total_tokens_s)`` from one exact
    per-stratum token-total aggregation (whitespace tokens — the same
    contract as chunking/packing), then the deterministic md5-keyed
    Bernoulli filter of :func:`stratified_sample` with those rates.
    Strata without a budget are dropped (rate 0). Two corpus passes
    (one agg + one filter), both full-width maps; the thresholds are
    plan literals computed driver-side, so the selection is a pure
    function of (seed, key, stratum) — identical on re-runs, retries
    and any partitioning, and reproducible exactly by a SQL oracle
    that re-derives the same rates from the same totals.
    """
    n_toks = F.size(
        F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
    )
    totals = {
        r[stratum_col]: int(r["t"])
        for r in df.groupBy(stratum_col)
        .agg(F.sum(n_toks).alias("t"))
        .collect()
        if r[stratum_col] is not None and r["t"] is not None
    }
    rates = {
        s: min(1.0, float(b) / totals[s]) if totals.get(s) else 1.0
        for s, b in budgets.items()
    }
    return stratified_sample(
        df, stratum_col, rates, key_col, seed=seed, default_rate=0.0
    )


def assign_splits(
    df: DataFrame,
    key_col: str,
    rates: dict[str, float],
    seed: str = "split",
) -> DataFrame:
    """Leakage-safe train/test(/val) assignment: every row whose
    ``key_col`` is equal lands in the SAME split (hash the grouping
    key — a domain, a URL, a document cluster id — so correlated docs
    can never straddle the train/eval boundary).

    ``rates`` maps split name → fraction (e.g. ``{"test": 0.1,
    "val": 0.05}``); the remainder is ``"train"``. Bands are integer
    thresholds ``floor(cum_rate · 2^60)`` over the 60-bit md5 draw, so
    the assignment is exact, deterministic, and reproducible in SQL.

    Pure map — no shuffle; assigning 10^12 rows costs one scan.
    """
    import math

    h = sample_hash_col(F.col(key_col), seed)
    split = None
    cum = 0.0
    for name, rate in rates.items():
        cum += rate
        bound = F.lit(math.floor(cum * _SCALE)).cast("long")
        cond = h < bound
        split = F.when(cond, name) if split is None else split.when(cond, name)
    split = split.otherwise("train") if split is not None else F.lit("train")
    return df.withColumn("split", split)
