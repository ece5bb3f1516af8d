"""Similarity search over embedding columns (``array<float>``).

- :func:`cosine_topk` — brute-force cosine top-k against one query
  vector. Pure column expressions: ``zip_with`` dot product +
  ``aggregate`` norms, all JVM-side; the scan parallelizes over the
  table and top-k is a TakeOrdered. The exact baseline.
- :func:`knn_join` — top-k neighbors for a (small) probe set:
  broadcast the probes, cross-join, window rank. Probe side must fit
  in a broadcast (the classic scale shape: small query batch × huge
  corpus).
- :func:`rp_lsh_buckets` / :func:`rp_lsh_ann` — the scale path:
  random-hyperplane LSH. Plane coefficients are derived
  deterministically (SplitMix64 from a seed), signatures are sign
  bits of plane dot products, and candidate generation is a bucket
  join on the signature — shuffle on bucket keys instead of
  all-pairs. Exact cosine re-ranks within buckets.

Cosine math is float64 over float32 inputs, sequential over the
array (``aggregate``) — bit-reproducible and matched by the SQL
oracle's per-element sum.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def cosine_col(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine similarity to ``query_vec``."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        df.select(
            F.col(key_col).alias("key"),
            F.round(cosine_col(F.col(vec_col), q), 6).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col("key").asc())
        .limit(k)
    )


def knn_join(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 3,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    max_probe_rows: int | None = 100_000,
) -> DataFrame:
    """Top-k corpus neighbors per probe row (probe ⨯ corpus with the
    probe side broadcast; excludes self-matches).

    The broadcast is only valid for a bounded probe batch: every
    executor holds the full probe set and scores it against its
    corpus partitions. ``max_probe_rows`` guards that contract with a
    cheap early-stopping count (``limit(n+1).count()`` — never a full
    probe scan); pass ``None`` to skip for trusted callers. For
    probe sets beyond the cap, use ``rp_lsh_ann`` (bucketed) instead.
    """
    if max_probe_rows is not None:
        got = probes.limit(max_probe_rows + 1).count()
        if got > max_probe_rows:
            raise ValueError(
                f"knn_join probe side exceeds max_probe_rows="
                f"{max_probe_rows}; broadcasting it would not scale — "
                "use rp_lsh_ann or raise the cap explicitly"
            )
    p = probes.select(
        F.col(key_col).alias("probe_id"), F.col(vec_col).alias("probe_vec")
    )
    c = corpus.select(
        F.col(key_col).alias("neighbor_id"), F.col(vec_col).alias("nvec")
    )
    joined = c.join(F.broadcast(p), F.col("probe_id") != F.col("neighbor_id"))
    scored = joined.select(
        "probe_id",
        "neighbor_id",
        F.round(cosine_col(F.col("probe_vec"), F.col("nvec")), 6).alias("cosine"),
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "cosine", "rank")
    )


def _splitmix64_scalar(x: int) -> int:
    x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return x ^ (x >> 31)


def random_planes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    """Deterministic hyperplanes: each coefficient from a SplitMix64
    counter stream, mapped to [-1, 1)."""
    out = np.empty((n_planes, dim), dtype=np.float64)
    for p in range(n_planes):
        for d in range(dim):
            h = _splitmix64_scalar(seed * 1_000_003 + p * 65_537 + d)
            out[p, d] = (h / 2**63) - 1.0
    return out


def rp_lsh_buckets(
    df: DataFrame,
    dim: int,
    n_planes: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
) -> DataFrame:
    """(key, bucket): bucket = sign bits of the plane dot products."""
    planes = random_planes(dim, n_planes, seed)
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        plane = F.array(*[F.lit(float(c)) for c in planes[p]])
        bit = F.when(_dot(F.col(vec_col), plane) >= 0, F.lit(1 << p)).otherwise(0)
        bucket = bucket + bit
    return df.select(F.col(key_col).alias("key"), bucket.alias("bucket"))


def write_planes_parquet(path: str, dim: int, n_planes: int = 8, seed: int = 42) -> str:
    """Materialize the deterministic hyperplanes as a small parquet
    ``(plane_id, idx, coef)`` — lets an external SQL oracle (DuckDB)
    reproduce signatures/buckets exactly. Idempotent per path."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    if not os.path.exists(path):
        planes = random_planes(dim, n_planes, seed)
        plane_id = np.repeat(np.arange(n_planes), dim)
        idx = np.tile(np.arange(dim), n_planes)
        tbl = pa.table(
            {
                "plane_id": plane_id.astype(np.int64),
                "idx": idx.astype(np.int64),
                "coef": planes.reshape(-1),
            }
        )
        tmp = f"{path}.tmp.{os.getpid()}"
        pq.write_table(tbl, tmp)
        os.replace(tmp, path)
    return path


def banded_lsh_buckets(
    df: DataFrame,
    dim: int,
    n_bands: int = 8,
    planes_per_band: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
) -> DataFrame:
    """(key, band, bucket) — one row per band, bucket = sign bits of
    that band's hyperplanes. The banding trick (multiple independent
    hash tables) applied to random-projection LSH: near vectors agree
    on SOME band's full bit pattern with high probability even when
    no single long signature matches."""
    planes = random_planes(dim, n_bands * planes_per_band, seed)
    band_cols = []
    for b in range(n_bands):
        bucket = F.lit(0).cast("long")
        for j in range(planes_per_band):
            plane = F.array(
                *[F.lit(float(c)) for c in planes[b * planes_per_band + j]]
            )
            bucket = bucket + F.when(
                _dot(F.col(vec_col), plane) >= 0, F.lit(1 << j)
            ).otherwise(0)
        band_cols.append(
            F.struct(F.lit(b).alias("band"), bucket.alias("bucket"))
        )
    return df.select(
        F.col(key_col).alias("key"), F.explode(F.array(*band_cols)).alias("bb")
    ).select("key", "bb.band", "bb.bucket")


def embedding_near_dup_pairs(
    df: DataFrame,
    dim: int,
    threshold: float = 0.85,
    n_bands: int = 8,
    planes_per_band: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: banded RP-LSH candidate
    generation + exact cosine verification ≥ ``threshold``.

    Scale shape: candidates come from a self-join on (band, bucket) —
    shuffle on bucket keys, never all-pairs — then ONE exact-cosine
    pass over the deduplicated candidates (join back to the vectors
    on key). Sizing rule: ``2**planes_per_band`` buckets per band
    must scale with the corpus (≈ log2(N) + 4 bits), else birthday
    collisions make every pair a candidate; ``max_bucket_size``
    drops degenerate mega-buckets (e.g. the all-zeros vector bucket)
    before the quadratic join, like its MinHash-LSH counterpart.
    Everything is deterministic given (dim, seed): planes from
    SplitMix64, so an external SQL oracle reproduces the exact same
    candidate set and verdicts."""
    exploded = banded_lsh_buckets(
        df, dim, n_bands, planes_per_band, seed, vec_col, key_col
    )
    if max_bucket_size is not None:
        wcnt = Window.partitionBy("band", "bucket")
        exploded = (
            exploded.withColumn("__bsz", F.count("*").over(wcnt))
            .filter(F.col("__bsz") <= max_bucket_size)
            .drop("__bsz")
        )
    # merge hint: under AQE a broadcast-converted self-join side breaks
    # shuffle-stage reuse and recomputes the banded-projection lineage
    # (see dedup.lsh_candidate_pairs) — pin SMJ so the exploded band
    # table is computed once
    a = exploded.alias("a").hint("merge")
    b = exploded.alias("b").hint("merge")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.key") < F.col("b.key")),
        )
        .select(F.col("a.key").alias("key_a"), F.col("b.key").alias("key_b"))
        .distinct()
    )
    vecs = df.select(F.col(key_col).alias("k"), F.col(vec_col).alias("v"))
    va = vecs.withColumnsRenamed({"k": "key_a", "v": "va"})
    vb = vecs.withColumnsRenamed({"k": "key_b", "v": "vb"})
    return (
        cands.join(va, "key_a")
        .join(vb, "key_b")
        .select(
            "key_a",
            "key_b",
            F.round(cosine_col(F.col("va"), F.col("vb")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= F.lit(threshold))
    )


def rp_lsh_probe_buckets(
    query_vec: list[float], dim: int, n_planes: int = 8, seed: int = 42,
    multiprobe: int = 0,
) -> list[int]:
    """The query's bucket plus the ``multiprobe`` neighbor buckets
    obtained by flipping the lowest-|margin| sign bits — the standard
    multi-probe LSH recall fix (probe the buckets the query almost
    fell into)."""
    planes = random_planes(dim, n_planes, seed)
    q = np.asarray(query_vec, dtype=np.float64)
    dots = [float(planes[p] @ q) for p in range(n_planes)]
    q_bucket = 0
    for p in range(n_planes):
        if dots[p] >= 0:
            q_bucket |= 1 << p
    probe = {q_bucket}
    order = sorted(range(n_planes), key=lambda p: (abs(dots[p]), p))
    for p in order[: max(0, multiprobe)]:
        probe.add(q_bucket ^ (1 << p))
    return sorted(probe)


def rp_lsh_ann(
    df: DataFrame,
    query_vec: list[float],
    dim: int,
    k: int = 10,
    n_planes: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    multiprobe: int = 0,
) -> DataFrame:
    """Approximate top-k: restrict exact cosine to the query's LSH
    bucket(s). ``multiprobe`` extra buckets (lowest-|margin| bit
    flips) trade a slightly larger candidate set for recall — the
    scale shape stays a bucket-key join, never all-pairs."""
    probe = rp_lsh_probe_buckets(query_vec, dim, n_planes, seed, multiprobe)
    buckets = rp_lsh_buckets(df, dim, n_planes, seed, vec_col, key_col)
    cand = df.join(
        buckets.filter(F.col("bucket").isin(probe)),
        df[key_col] == F.col("key"),
    ).drop("bucket")
    qc = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        cand.select(
            F.col("key"),
            F.round(cosine_col(F.col(vec_col), qc), 6).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col("key").asc())
        .limit(k)
    )


# ---------------------------------------------------------------------
# IVF (inverted-file) ANN — the centroid-bucketed scale path
# ---------------------------------------------------------------------


def ivf_centroids(
    df: DataFrame,
    n_cells: int,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    seed: int = 42,
) -> np.ndarray:
    """Deterministic sampled coarse quantizer: the ``n_cells`` corpus
    vectors with the smallest ``md5('<seed>|<key>')`` digest become
    the cell centroids, cell id = rank in that ordering (a
    TakeOrdered over the scan — no training iterations, no
    driver-side corpus pass). Sampling-based quantizers are the
    standard cheap IVF bootstrap; a Lloyd refinement could replace
    this function without touching assignment/query, but would make
    the centroids float-summation-order dependent — sampled centroids
    are bit-reproducible from (data, seed), and md5 is computable by
    any external SQL oracle, which is what lets DuckDB verify the
    whole query path with no side-channel artifact."""
    h = F.md5(
        F.concat(F.lit(f"{seed}|"), F.col(key_col).cast("string"))
    )
    rows = (
        df.select(
            F.col(key_col).alias("k"), F.col(vec_col).alias("v"), h.alias("h")
        )
        .orderBy("h", "k")
        .limit(n_cells)
        .collect()
    )
    return np.array([list(r["v"]) for r in rows], dtype=np.float64)


def _cell_assignment_col(centroids: np.ndarray, vec_col: str) -> Column:
    """argmax-cosine cell id as a pure column expression: one
    sequential-fold dot per centroid (bit-reproducible, same fold the
    SQL oracle does), argmax via max-of-structs with ascending-cell
    tie-break. Expression size grows with n_cells — right for the
    coarse quantizers this targets (≤ a few hundred cells per level;
    at billion-vector scale swap the fold for an Arrow matmul batch
    UDF, the plan shape — broadcast centroids, shuffle-free scan —
    stays the same)."""
    scored = []
    for cid in range(centroids.shape[0]):
        c = F.array(*[F.lit(float(x)) for x in centroids[cid]])
        cos = cosine_col(F.col(vec_col), c)
        scored.append(F.struct(cos.alias("cos"), F.lit(-cid).alias("negcell")))
    best = F.array_max(F.array(*scored))
    return (-best["negcell"]).cast("int")


def ivf_assign(
    df: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
) -> DataFrame:
    """(key, cell): each vector's nearest centroid by cosine
    (ties → lowest cell id). Shuffle-free single scan."""
    return df.select(
        F.col(key_col).alias("key"),
        _cell_assignment_col(centroids, vec_col).alias("cell"),
    )


def ivf_assign_matmul(
    df: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
) -> DataFrame:
    """(key, cell) like :func:`ivf_assign`, but via an Arrow-batched
    numpy matmul — the beyond-few-hundred-cells quantizer path the
    expression fold can't take (its plan grows one sub-expression per
    centroid; a 65k-cell quantizer needs one GEMM per Arrow batch
    instead). Plan shape is identical: broadcast centroids (a real
    ``SparkContext.broadcast``, shipped once per executor, not per
    task), shuffle-free narrow scan; cell id = argmax cosine, ties →
    lowest cell id (``np.argmax`` first-max, same tie order as the
    fold). Results match :func:`ivf_assign` up to float-associativity
    on exact cosine ties — the fold sums sequentially, the GEMM may
    not, so only degenerate exactly-tied inputs can differ.

    Zero-vector handling DIFFERS from the expression fold: here a
    zero query/centroid contributes cosine 0 (norm clamped to 1),
    whereas ``cosine_col`` divides by the true zero norm and yields
    NaN — which Spark orders above every double, so the fold assigns
    ALL vectors to a zero centroid's cell. Zero vectors are
    degenerate inputs for cosine ANN either way; filter them out
    upstream if the corpus can contain them.
    """
    import pandas as pd

    cn = np.asarray(centroids, dtype=np.float64)
    norms = np.linalg.norm(cn, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    bc = df.sparkSession.sparkContext.broadcast(cn / norms)

    ktype = df.schema[key_col].dataType.simpleString()

    def assign(batches):
        cmat = bc.value  # (n_cells, d) row-normalized
        for pdf in batches:
            if len(pdf) == 0:
                continue
            v = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            vn = np.linalg.norm(v, axis=1, keepdims=True)
            vn[vn == 0] = 1.0
            sims = (v / vn) @ cmat.T  # (batch, n_cells)
            yield pd.DataFrame(
                {
                    "key": pdf[key_col],
                    "cell": sims.argmax(axis=1).astype("int32"),
                }
            )

    return df.select(
        F.col(key_col).alias(key_col), F.col(vec_col)
    ).mapInPandas(assign, schema=f"key {ktype}, cell int")


#: above this many cells the expression-fold quantizer's plan stops
#: being reasonable (one sub-expression per centroid → Catalyst plan
#: size and codegen time grow linearly); ivf_ann switches to the
#: Arrow-GEMM assignment path automatically past it
IVF_MATMUL_THRESHOLD = 300


def _probe_filter_matmul(
    df: DataFrame,
    centroids: np.ndarray,
    probe: list[int],
    vec_col: str,
    key_col: str,
) -> DataFrame:
    """Rows whose GEMM-assigned cell is in ``probe`` — assignment and
    cell filter fused into one shuffle-free Arrow pass (no (key, cell)
    join back onto the corpus). Same semantics as
    :func:`ivf_assign_matmul` (incl. its zero-vector note)."""
    import pandas as pd

    cn = np.asarray(centroids, dtype=np.float64)
    norms = np.linalg.norm(cn, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    bc = df.sparkSession.sparkContext.broadcast(cn / norms)
    probe_arr = np.array(sorted(probe), dtype=np.int64)
    sub = df.select(key_col, vec_col)

    def flt(batches):
        cmat = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            v = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            vn = np.linalg.norm(v, axis=1, keepdims=True)
            vn[vn == 0] = 1.0
            cells = ((v / vn) @ cmat.T).argmax(axis=1)
            yield pdf[np.isin(cells, probe_arr)]

    return sub.mapInPandas(flt, schema=sub.schema)


def ivf_probe_cells(
    query_vec: list[float], centroids: np.ndarray, nprobe: int
) -> list[int]:
    """The ``nprobe`` cells whose centroids are most cosine-similar
    to the query (sequential float64 fold, ties → lowest cell id)."""
    q = [float(x) for x in query_vec]
    qn = 0.0
    for x in q:
        qn += x * x
    qn = qn**0.5
    sims = []
    for cid in range(centroids.shape[0]):
        dot, cn = 0.0, 0.0
        for a, b in zip(centroids[cid], q):
            dot += float(a) * b
            cn += float(a) * float(a)
        sims.append((-(dot / (cn**0.5 * qn)), cid))
    sims.sort()
    return sorted(cid for _, cid in sims[: max(1, nprobe)])


def ivf_ann(
    df: DataFrame,
    query_vec: list[float],
    centroids: np.ndarray,
    k: int = 10,
    nprobe: int = 2,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    assign_mode: str = "auto",
) -> DataFrame:
    """Approximate top-k: exact cosine restricted to the vectors
    whose IVF cell is among the query's ``nprobe`` nearest cells.
    Scale shape: assignment is a shuffle-free scan (at ingest time it
    would be precomputed and stored as a partition column, making the
    probe a partition-pruned scan); rerank touches only the probed
    cells' rows.

    ``assign_mode``: ``"fold"`` — per-centroid JVM expression fold
    (whole-stage codegen, exact-oracle-reproducible, plan grows with
    n_cells); ``"matmul"`` — Arrow-GEMM batch assignment (the
    beyond-few-hundred-cells regime, e.g. a 65k-cell quantizer);
    ``"auto"`` (default) — matmul when ``n_cells >
    IVF_MATMUL_THRESHOLD``, fold otherwise. The two agree except on
    degenerate inputs: exact cosine TIES may break differently under
    float associativity, and a ZERO query/centroid vector scores
    cosine NaN under the fold (NaN sorts above every double, so a
    zero centroid absorbs all rows) but cosine 0 under matmul (norm
    clamped to 1) — filter zero vectors upstream either way."""
    if assign_mode not in ("auto", "fold", "matmul"):
        raise ValueError(f"unknown assign_mode {assign_mode!r}")
    n_cells = int(np.asarray(centroids).shape[0])
    use_matmul = assign_mode == "matmul" or (
        assign_mode == "auto" and n_cells > IVF_MATMUL_THRESHOLD
    )
    probe = ivf_probe_cells(query_vec, centroids, nprobe)
    if use_matmul:
        assigned = _probe_filter_matmul(df, centroids, probe, vec_col, key_col)
    else:
        assigned = df.withColumn(
            "__cell", _cell_assignment_col(centroids, vec_col)
        ).filter(F.col("__cell").isin(probe))
    qc = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        assigned.select(
            F.col(key_col).alias("key"),
            F.round(cosine_col(F.col(vec_col), qc), 6).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col("key").asc())
        .limit(k)
    )
