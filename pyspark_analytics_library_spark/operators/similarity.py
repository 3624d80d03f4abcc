"""Similarity search over embeddings (SURVEY.md §2.12).

Exact cosine top-k / threshold pairs (small-n paths, full oracles) and
random-hyperplane LSH bucketing (the 100 TB path, rows-only + recall
property test in tests/test_properties.py).

All exact queries share one kernel: a BROADCAST normalized index matrix
+ BLAS matmul inside mapInPandas.  This is the idiomatic Spark shape
for vectorized brute-force similarity — measured ~240× faster than the
pair-expression formulation (zip_with+aggregate lambdas are
interpreted, not codegen'd).  At 100 TB the index no longer fits one
broadcast: shard it (IVF — union of per-shard results, re-ranked) or
switch to sim_lsh_approx; brute force remains the per-shard /
validation kernel (SCALE.md).

Float discipline: DuckDB's ``list_cosine_similarity`` computes in
float32 (measured deltas ~1e-7 — breaks ROUND(6) parity), so oracles
compute cosine in DOUBLE via unnest-zip + SUM; numpy matmul agrees to
~1e-15 and ROUND(6) is safe.  Ranks order by the ROUNDED cosine + id so
tie resolution is identical cross-engine.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyspark_analytics_library_spark.functions.coercion import scaled_int_text
from pyspark_analytics_library_spark.registry import query
from pyspark_analytics_library_spark.sources.io import load_tables


def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine similarity of two float-array columns as a pure JVM
    expression (double-precision sequential fold).  Fine for a handful
    of evaluations; use the broadcast kernel for pairwise workloads."""
    ad = F.transform(a, lambda x: x.cast("double"))
    bd = F.transform(b, lambda x: x.cast("double"))
    dot = F.aggregate(F.zip_with(ad, bd, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
    na = F.aggregate(ad, F.lit(0.0), lambda acc, x: acc + x * x)
    nb = F.aggregate(bd, F.lit(0.0), lambda acc, x: acc + x * x)
    return dot / F.sqrt(na * nb)


# ---------------------------------------------------------------------------
# Broadcast brute-force kernel
# ---------------------------------------------------------------------------


#: Default cap for the broadcast index build (bytes of float64 matrix).
#: Override per-session with spark.conf "spark.analytics.sim.maxIndexBytes".
DEFAULT_MAX_INDEX_BYTES = 2 * 1024**3


class IndexTooLargeError(RuntimeError):
    """Raised when the embeddings table exceeds the broadcast-index cap.

    The eager alternative to a late driver OOM: callers should switch to
    the sharded paths (`sim_ivf_approx` / `sim_lsh_approx`)."""


def build_index(spark: SparkSession, e: DataFrame, max_bytes: int | None = None):
    """Collect + broadcast the (ids, L2-normalized matrix, labels)
    index.  The ONE documented driver materialization in the package:
    valid while the index fits a broadcast (GBs); beyond that, shard.

    Guarded: estimates rows × dim × 8 BEFORE collecting and raises
    IndexTooLargeError over the cap (conf "spark.analytics.sim.
    maxIndexBytes", default 2 GiB) — an eager, explainable error instead
    of a silent driver OOM deep into a 100 TB job."""
    if max_bytes is None:
        max_bytes = int(
            spark.conf.get(
                "spark.analytics.sim.maxIndexBytes", str(DEFAULT_MAX_INDEX_BYTES)
            )
        )
    # Two cheap probes, not one full scan: dim from a single-row take
    # (reads one Arrow batch), row count from count() (metadata-only on
    # a plain Parquet scan).  max(size(embedding)) would read the widest
    # column end-to-end just to decide whether reading it is safe.
    probe = e.select(F.size("embedding").alias("d")).limit(1).collect()
    dim = probe[0]["d"] if probe else 0
    n_rows = e.count()
    est = n_rows * max(dim, 0) * 8
    if est > max_bytes:
        raise IndexTooLargeError(
            f"broadcast index would be ~{est / 1e9:.1f} GB "
            f"({n_rows} rows x {dim} dims x 8 B) > cap {max_bytes / 1e9:.1f} GB; "
            "use sim_ivf_approx (sharded cells) or sim_lsh_approx instead, or "
            "raise spark.analytics.sim.maxIndexBytes"
        )
    pdf = e.toPandas()
    ids = pdf["vec_id"].to_numpy()
    if len(pdf):
        mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        mat /= _safe_norm(mat)
    else:
        # Empty corpus (a filter matched nothing): dim probes 0 here, so
        # this is a (0, 0) matrix — every kernel early-returns on the
        # empty index (len(ids) == 0) BEFORE touching shapes, instead of
        # np.stack dying on "need at least one array to stack".
        mat = np.zeros((0, max(dim, 0)), dtype=np.float64)
    labels = pdf["label"].to_numpy() if "label" in pdf.columns else None
    return spark.sparkContext.broadcast((ids, mat, labels))


def _safe_norm(m: "np.ndarray") -> "np.ndarray":
    """Row L2 norms with zeros mapped to 1: an all-zero embedding has no
    direction, so it keeps cosine 0 with everything rather than
    poisoning the score matrix with NaNs (fixtures contain no zero
    vectors — this guards user data)."""
    norm = np.linalg.norm(m, axis=1, keepdims=True)
    return np.where(norm == 0.0, 1.0, norm)


def brute_topk(e: DataFrame, bc, k: int = 5, with_labels: bool = False) -> DataFrame:
    """Exact top-k neighbors per query row against the broadcast index
    (self excluded), ranked by (rounded cos desc, id asc)."""
    schema = "id_a long, id_b long, cos double, rn long"
    if with_labels:
        schema += ", label_a int, label_b int"

    def gen(batches):
        ids_b, M, labels = bc.value
        n = len(ids_b)
        if n == 0:  # empty index: no neighbor exists for any query row
            return
        kk = min(k, n - 1)
        # Composite key: rounded cos desc, id asc.  Rounded cosines sit
        # on a 1e-6 grid; id·eps (eps·max_rank ≪ 1e-6) encodes the
        # tie-break exactly — fully vectorized.
        eps = 1e-7 / max(n, 1)
        id_bias = np.argsort(np.argsort(ids_b)) * eps
        for pdf in batches:
            if not len(pdf):
                continue
            A = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            A /= _safe_norm(A)
            S = np.round(A @ M.T, 6)
            a_ids = pdf["vec_id"].to_numpy()
            S[a_ids[:, None] == ids_b[None, :]] = -np.inf  # exclude self
            key = -S + id_bias[None, :]
            part = np.argpartition(key, kk, axis=1)[:, :kk]
            order = np.take_along_axis(
                part, np.argsort(np.take_along_axis(key, part, axis=1), axis=1), axis=1
            )
            out = {
                "id_a": np.repeat(a_ids, kk),
                "id_b": ids_b[order].ravel(),
                "cos": np.take_along_axis(S, order, axis=1).ravel(),
                "rn": np.tile(np.arange(1, kk + 1), len(a_ids)),
            }
            if with_labels:
                out["label_a"] = np.repeat(pdf["label"].to_numpy(), kk)
                out["label_b"] = labels[order].ravel()
            yield pd.DataFrame(out)

    return e.mapInPandas(gen, schema)


def brute_threshold_pairs(e: DataFrame, bc, tau: float) -> DataFrame:
    """All (id_a < id_b) pairs with rounded cosine > tau."""

    def gen(batches):
        ids_b, M, _ = bc.value
        if len(ids_b) == 0:  # empty index: no pair can exist; M is (0, 0)
            return
        for pdf in batches:
            if not len(pdf):
                continue
            A = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            A /= _safe_norm(A)
            S = np.round(A @ M.T, 6)
            a_ids = pdf["vec_id"].to_numpy()
            mask = (S > tau) & (a_ids[:, None] < ids_b[None, :])
            ai, bi = np.nonzero(mask)
            yield pd.DataFrame(
                {"id_a": a_ids[ai], "id_b": ids_b[bi], "cos": S[ai, bi]}
            )

    return e.mapInPandas(gen, "id_a long, id_b long, cos double")


#: Shared oracle fragment: double-precision pairwise cosine via
#: unnest-zip (DuckDB zips parallel unnests positionally).
def _pair_cosine_cte(join_cond: str) -> str:
    return f"""
    WITH p AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               a.label AS label_a, b.label AS label_b,
               CAST(unnest(a.embedding) AS DOUBLE) AS xa,
               CAST(unnest(b.embedding) AS DOUBLE) AS xb
        FROM embeddings a JOIN embeddings b ON {join_cond}
    ), c AS (
        SELECT id_a, id_b,
               any_value(label_a) AS label_a, any_value(label_b) AS label_b,
               SUM(xa * xb) / SQRT(SUM(xa * xa) * SUM(xb * xb)) AS cos
        FROM p GROUP BY id_a, id_b
    )
    """


@query(
    "sim_topk_exact",
    oracle=_pair_cosine_cte("a.vec_id <> b.vec_id")
    + """
    SELECT id_a, id_b, cos, rn FROM (
        SELECT id_a, id_b, ROUND(cos, 6) AS cos,
               ROW_NUMBER() OVER (
                   PARTITION BY id_a ORDER BY ROUND(cos, 6) DESC, id_b ASC
               ) AS rn
        FROM c
    ) WHERE rn <= 5
    """,
)
def q_sim_topk_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 neighbors per vector (broadcast kernel).

    At fixture scale the table is one input partition and the whole
    query is one worker round-trip (~0.25 s floor); a real deployment
    reads many partitions and the per-batch matmuls parallelize
    naturally — measured that forcing a repartition here costs more
    (shuffle + per-task broadcast deserialization) than it buys.
    """
    t = load_tables(spark, sf_dir)
    e = t["embeddings"].select("vec_id", "embedding")
    return brute_topk(e, build_index(spark, e), k=5)


@query(
    "sim_threshold_pairs",
    oracle=_pair_cosine_cte("a.vec_id < b.vec_id")
    + """
    SELECT id_a, id_b, ROUND(cos, 6) AS cos
    FROM c WHERE ROUND(cos, 6) > 0.3
    """,
)
def q_sim_threshold_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All pairs above cosine 0.3 (fixture cosines top out ≈0.48, so
    0.9 would be an always-empty — hollow — check)."""
    t = load_tables(spark, sf_dir)
    e = t["embeddings"].select("vec_id", "embedding")
    return brute_threshold_pairs(e, build_index(spark, e), tau=0.3)


@query(
    "sim_knn_labels",
    oracle=_pair_cosine_cte("a.vec_id <> b.vec_id")
    + """
    , topk AS (
        SELECT label_a, label_b FROM (
            SELECT label_a, label_b,
                   ROW_NUMBER() OVER (
                       PARTITION BY id_a ORDER BY ROUND(cos, 6) DESC, id_b ASC
                   ) AS rn
            FROM c
        ) WHERE rn <= 5
    )
    SELECT label_a AS label,
           ROUND(AVG(CASE WHEN label_b = label_a THEN 1.0 ELSE 0.0 END), 4)
               AS knn_agreement,
           COUNT(*) AS n_pairs
    FROM topk GROUP BY label_a
    """,
)
def q_sim_knn_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN label-agreement per cluster label: among each vector's top-5
    neighbors, the fraction sharing its label."""
    t = load_tables(spark, sf_dir)
    e = t["embeddings"].select("vec_id", "embedding", "label")
    topk = brute_topk(e, build_index(spark, e), k=5, with_labels=True)
    return topk.groupBy(F.col("label_a").alias("label")).agg(
        F.round(
            F.avg(F.when(F.col("label_b") == F.col("label_a"), 1.0).otherwise(0.0)), 4
        ).alias("knn_agreement"),
        F.count(F.lit(1)).alias("n_pairs"),
    )


# ---------------------------------------------------------------------------
# LSH — the scale path
# ---------------------------------------------------------------------------

_DIM = 64
# 16 tables x 4 bits: a cos≈0.3 neighbor collides in ≥1 table with
# p ≈ 0.89 (measured recall 0.87 on sf0.001 vs the ≥0.8 bar in
# tests/test_properties.py), while random pairs still collide at only
# 1/16 per table.  Tables buy recall linearly in shuffle cost; bits buy
# pruning exponentially at recall's expense.
_LSH_TABLES = 16
_LSH_BITS = 4
# Fixed random hyperplanes (deterministic; baked at import so every run
# and every executor sees identical planes — no driver-state capture).
_PLANES = (
    np.random.RandomState(42).normal(size=(_LSH_TABLES, _LSH_BITS, _DIM)).tolist()
)


def lsh_table_keys(emb: Column) -> Column:
    """Multi-table random-hyperplane LSH: per table, a sign-bit bucket
    key; returns array<struct<table:int, key:long>> to explode.

    Collision prob. for angle θ is (1 - θ/π)^bits per table, amortized
    over `tables` OR-ed tables — bits trades precision (pruning) for
    recall; tables buys recall linearly in cost.  With 16 tables × 4
    bits, a cos≈0.4 neighbor is caught with p ≈ 0.97 while random pairs
    (cos≈0) collide at 1/16 per table.  Pure expression — evaluated
    scan-side; the bucket equi-join replaces the O(n²) pair space.
    """
    ed = F.transform(emb, lambda x: x.cast("double"))
    entries = []
    for ti, table in enumerate(_PLANES):
        key = F.lit(0).cast("long")
        for bi, plane in enumerate(table):
            p = F.array(*[F.lit(v) for v in plane])
            dot = F.aggregate(
                F.zip_with(ed, p, lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            key = key + F.when(dot > 0, F.lit(1 << bi)).otherwise(F.lit(0))
        entries.append(F.struct(F.lit(ti).alias("table"), key.alias("key")))
    return F.array(*entries)


_IVF_CELLS = 16
# nprobe is high relative to cells because the fixture vectors are
# near-isotropic (max cosine ≈ 0.48 — worst case for ANN); real
# embedding corpora cluster strongly and run nprobe/cells ≪ this.
_IVF_NPROBE = 6


def _bounded_hash_sample(e: DataFrame, sample: int) -> pd.DataFrame:
    """Deterministic, layout-independent training sample whose
    driver-side merge is bounded by a hash filter's selectivity, not by
    partition count (VERDICT r13 #5).

    The former ``orderBy("vec_id").limit(sample)`` planned as
    TakeOrderedAndProject: each of P scan partitions ships up to
    ``sample`` rows into the driver-side ordered merge — P×sample rows
    at extreme partition counts (a 100 TB table at 128 MB splits is
    ~800k partitions).  Here every row gets a deterministic bucket
    ``h = pmod(xxhash64(vec_id), 1e6)`` and only rows with
    ``h < threshold`` — sized to ~1.2×sample expected survivors —
    reach the ordered merge at all, so the driver-side cost is bounded
    by the FILTER (~1.2×sample rows TOTAL across all partitions).

    The chosen set — the ``sample`` smallest (h, vec_id) pairs — is a
    pure function of the ids: rerun-exact, layout-independent, and
    independent of the escalation path (an under-delivering threshold
    — hash variance makes this rare at the 1.2× margin — only WIDENS
    the candidate pool when doubled; the smallest-(h, id) rule never
    changes, so any threshold that yields ≥sample survivors selects
    the identical set).

    ROW ORDER is part of the contract (ADVICE r14): the returned frame
    is sorted by ``vec_id`` on BOTH paths, because the consumer
    (:func:`train_ivf_centroids`) is row-order sensitive — ``rng.choice``
    picks rows by position and float mean accumulation order varies —
    so an unpinned order would make trained centroids depend on the
    physical partition layout.  The sort happens DRIVER-side on the
    already-bounded frame (≤ ``sample`` rows), so it costs nothing
    distributed.

    Small-table path (every fixture SF lands here): a single
    ``limit(sample + 1).toPandas()`` probe — CollectLimit, incremental
    and driver-bounded at ``sample + 1`` rows at ANY partition count.
    ≤ ``sample`` rows back means the probe IS the whole table; sorting
    it by vec_id yields exactly what the former count()-then-toPandas()
    spelling produced, minus one full job (ADVICE r14: the count and
    the pull scanned the same data twice).  ``sample + 1`` rows back
    means n > sample, and only then is the count() (a column-less
    metadata-speed scan) paid to size the hash threshold — the loop
    path's per-pass scans are kept in preference to persisting the
    input, which at 100 TB would spill the whole table to executor
    disk to save one cheap pass.
    """
    e = e.select("vec_id", "embedding")
    pdf = e.limit(sample + 1).toPandas()
    if len(pdf) <= sample:
        return pdf.sort_values("vec_id", ignore_index=True)
    n = e.count()
    hmod = F.pmod(F.xxhash64(F.col("vec_id")), F.lit(1_000_000))
    thr = max(1, math.ceil(1_000_000 * sample * 1.2 / n))
    while True:
        cand = e.withColumn("_h", hmod).filter(F.col("_h") < F.lit(thr))
        pdf = cand.orderBy("_h", "vec_id").limit(sample).toPandas()
        if len(pdf) >= sample or thr >= 1_000_000:
            return (
                pdf.drop(columns="_h").sort_values("vec_id", ignore_index=True)
            )
        thr = min(1_000_000, thr * 2)


def train_ivf_centroids(e: DataFrame, k: int = _IVF_CELLS, iters: int = 10, sample: int = 100_000):
    """Deterministic spherical k-means on a bounded sample → L2-normalized
    centroid matrix.  Centroid training on a driver-side sample is the
    standard IVF build recipe (FAISS does the same): centroids only
    need to capture the density shape, so `sample` rows suffice at any
    input scale, and a fixed seed + fixed iteration count keeps reruns
    (and the property tests) exact.  The sample itself comes from
    :func:`_bounded_hash_sample` — deterministic AND driver-bounded at
    any partition count.
    """
    pdf = _bounded_hash_sample(e, sample)
    M = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    norms = np.linalg.norm(M, axis=1, keepdims=True)
    norms[norms == 0] = 1.0  # zero-norm guard: keep the row, avoid NaN
    M /= norms
    rng = np.random.RandomState(7)
    C = M[rng.choice(len(M), size=min(k, len(M)), replace=False)].copy()
    for _ in range(iters):
        assign = np.argmax(M @ C.T, axis=1)
        for j in range(len(C)):
            members = M[assign == j]
            if len(members):
                C[j] = members.mean(axis=0)
        cn = np.linalg.norm(C, axis=1, keepdims=True)
        cn[cn == 0] = 1.0
        C /= cn
    return C


def _assign_cells(C: np.ndarray, nprobe: int):
    """mapInPandas generator: (vec_id, embedding) → one row per probed
    cell, nearest-first.  nprobe=1 builds the index side; nprobe>1 the
    query side."""

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            A = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            A /= _safe_norm(A)
            cells = np.argsort(-(A @ C.T), axis=1)[:, :nprobe]
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(pdf["vec_id"].to_numpy(), nprobe),
                    "cell": cells.ravel().astype(np.int32),
                    "embedding": [e for e in pdf["embedding"] for _ in range(nprobe)],
                }
            )

    return gen


@query("sim_ivf_approx", tags=("rows-only",))  # recall checked by property test
def q_sim_ivf_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) approximate top-5: partition vectors into
    centroid cells, search only the query's `nprobe` nearest cells.

    The 100 TB sharded-index path complementing `sim_lsh_approx`: the
    full index is never broadcast — each cell's vectors meet only the
    queries probing that cell (cogrouped `applyInPandas`, shuffled by
    cell id), and the per-cell kernel is the same vectorized matmul as
    the exact path.  Per-query cost drops from O(n) to
    O(n·nprobe/cells); cell skew is bounded because spherical k-means
    balances density, and AQE splits an oversized cell's shuffle
    partition.  Final global top-5 merges the per-cell candidates with
    one window (rounded-cos, id tie-break — same discipline as exact).
    """
    t = load_tables(spark, sf_dir)
    e = t["embeddings"].select("vec_id", "embedding")
    C = train_ivf_centroids(e)
    index = e.mapInPandas(
        _assign_cells(C, 1), "vec_id long, cell int, embedding array<float>"
    )
    probes = e.mapInPandas(
        _assign_cells(C, _IVF_NPROBE), "vec_id long, cell int, embedding array<float>"
    )

    def local_topk(qdf: pd.DataFrame, idf: pd.DataFrame) -> pd.DataFrame:
        if not len(qdf) or not len(idf):
            return pd.DataFrame({"id_a": [], "id_b": [], "cos": []}).astype(
                {"id_a": "int64", "id_b": "int64", "cos": "float64"}
            )
        Q = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
        Q /= np.linalg.norm(Q, axis=1, keepdims=True)
        I = np.stack(idf["embedding"].to_numpy()).astype(np.float64)
        I /= np.linalg.norm(I, axis=1, keepdims=True)
        S = np.round(Q @ I.T, 6)
        q_ids = qdf["vec_id"].to_numpy()
        i_ids = idf["vec_id"].to_numpy()
        S[q_ids[:, None] == i_ids[None, :]] = -np.inf
        kk = min(5, S.shape[1])
        part = np.argpartition(-S, kk - 1, axis=1)[:, :kk]
        keep = np.take_along_axis(S, part, axis=1) > -np.inf
        return pd.DataFrame(
            {
                "id_a": np.repeat(q_ids, kk)[keep.ravel()],
                "id_b": i_ids[part].ravel()[keep.ravel()],
                "cos": np.take_along_axis(S, part, axis=1).ravel()[keep.ravel()],
            }
        )

    candidates = (
        probes.groupby("cell")
        .cogroup(index.groupby("cell"))
        .applyInPandas(local_topk, "id_a long, id_b long, cos double")
        .dropDuplicates(["id_a", "id_b"])
    )
    w = Window.partitionBy("id_a").orderBy(F.desc("cos"), F.asc("id_b"))
    return (
        candidates.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("id_a", "id_b", "cos", "rn")
    )


@query("sim_lsh_approx", tags=("rows-only",))  # LSH recall checked by property test
def q_sim_lsh_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate NN: candidates = same bucket in ANY of the LSH
    tables; exact cosine only on candidates, evaluated as a per-bucket
    vectorized matmul (`applyInPandas` cogrouped by (table, key)).

    Why per-bucket kernels instead of a pair self-join: with 4-bit
    keys (chosen for recall at cos ≈ 0.3), random pairs still collide
    in SOME of the 16 tables with p ≈ 0.64, so a bucket self-join
    materializes a large fraction of all n² pairs — each dragging two
    embedding arrays through shuffle and an interpreted expression
    fold (measured 21 s at sf0.1).  Grouping instead shuffles each
    vector exactly `tables` times (ids + one array, no pair blowup),
    runs one blocked BLAS matmul per bucket, and emits ONLY the pairs
    above threshold; the cross-table duplicates that remain are the
    final (id_a, id_b) dropDuplicates — threshold-survivor-sized, not
    candidate-sized.  Same candidate set, same filter, same recall;
    3.4 s at sf0.1.  Bucket skew is bounded by the 2048-row matmul
    blocking plus AQE shuffle splitting."""
    t = load_tables(spark, sf_dir)
    e = (
        t["embeddings"]
        .select(
            "vec_id",
            "embedding",
            F.explode(lsh_table_keys(F.col("embedding"))).alias("tk"),
        )
        .select("vec_id", "embedding", "tk.table", "tk.key")
    )

    def bucket_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "id_a": pd.Series(dtype="int64"),
                "id_b": pd.Series(dtype="int64"),
                "cos": pd.Series(dtype="float64"),
            }
        )
        n = len(pdf)
        if n < 2:
            return empty
        pdf = pdf.sort_values("vec_id")  # positional < ⇒ vec_id <
        ids = pdf["vec_id"].to_numpy()
        E = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        E /= np.linalg.norm(E, axis=1, keepdims=True)
        cols = np.arange(n)
        out = []
        block = 2048
        for i0 in range(0, n, block):
            S = np.round(E[i0 : i0 + block] @ E.T, 6)
            upper = cols[None, :] > (i0 + np.arange(S.shape[0]))[:, None]
            r, c = np.nonzero((S > 0.3) & upper)
            if len(r):
                out.append(
                    pd.DataFrame(
                        {"id_a": ids[i0 + r], "id_b": ids[c], "cos": S[r, c]}
                    )
                )
        return pd.concat(out, ignore_index=True) if out else empty

    pairs = e.groupBy("table", "key").applyInPandas(
        bucket_pairs, "id_a long, id_b long, cos double"
    )
    # Identical (id_a, id_b) from different tables carry the identical
    # float64 cos, so which duplicate survives is immaterial.
    return pairs.dropDuplicates(["id_a", "id_b"])


@query(
    "sim_range_search",
    oracle="""
    WITH q AS (
        SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0
    ), p AS (
        SELECT e.vec_id,
               CAST(unnest(e.embedding) AS DOUBLE) AS xa,
               CAST(unnest(q.q_emb) AS DOUBLE) AS xb
        FROM embeddings e, q
        WHERE e.vec_id <> 0
    ), c AS (
        SELECT vec_id,
               SUM(xa * xb) / SQRT(SUM(xa * xa) * SUM(xb * xb)) AS cos
        FROM p GROUP BY vec_id
    )
    SELECT vec_id, ROUND(cos, 6) AS cos
    FROM c
    WHERE ROUND(cos, 6) >= 0.25
    ORDER BY ROUND(cos, 6) DESC, vec_id
    """,
)
def q_sim_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-query range search: every vector within cosine ≥ 0.25 of
    one probe vector (vec_id 0) — the point-lookup twin of
    sim_threshold_pairs (which materializes ALL qualifying pairs).

    The probe is a one-row broadcast; the cosine is the pure JVM
    expression fold, evaluated scan-side with zero shuffles — a 100 TB
    index answers a single query at full scan parallelism (and the
    LSH/IVF paths shortcut even that scan).  Threshold compares the
    ROUNDED value on both engines (§5.3 float discipline).
    """
    t = load_tables(spark, sf_dir)
    e = t["embeddings"].select("vec_id", "embedding")
    qv = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q_emb"))
    cos = F.round(cosine_sim(F.col("embedding"), F.col("q_emb")), 6)
    return (
        e.filter(F.col("vec_id") != 0)
        .join(F.broadcast(qv))
        .select("vec_id", cos.alias("cos"))
        .filter(F.col("cos") >= 0.25)
        .orderBy(F.desc("cos"), F.asc("vec_id"))
    )


@query(
    "sim_centroid",
    oracle="""
    WITH p AS (
        SELECT label, i,
               CAST(FLOOR(ROUND(AVG(embedding[i]), 6) * 1000000 + 0.5)
                    AS BIGINT) AS v
        FROM embeddings, generate_series(1, 64) AS g(i)
        GROUP BY label, i
    )
    SELECT label, COUNT(*) AS dim,
           array_to_string(list(CAST(v AS VARCHAR) ORDER BY i), ',')
               AS centroid
    FROM p GROUP BY label ORDER BY label
    """,
)
def q_sim_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroid — the building block of IVF cell
    training, class prototypes, and centroid-based dedup.

    ONE hash aggregate: each dimension is an independent avg(emb[i])
    aggregate expression (64 of them), so the per-task partial state
    is one 64-float accumulator per label and the whole query is a
    single shuffle of (labels × 64 doubles) plus the output sort.
    This was measured against the posexplode → groupBy(label, pos) →
    collect_list reassembly formulation, which costs THREE exchanges
    (hash(label, pos) does not satisfy the reassembly's hash(label)
    clustering, and the 64× row explosion shuffles 64 rows per vector
    instead of one partial row per label) — the widened aggregate is
    the plan you want at 100 TB.  Nothing vector-sized ever reaches
    the driver.

    The centroid vector is serialized to floor-scaled-integer text at
    the compare boundary (flatten-before-compare, §5.3 rules 4+7 —
    same discipline as fn_array's head4 and mm_struct_bundle: engine
    bridges disagree on array containers and float→string formatting,
    while FLOOR(x*1e6+0.5) over the 6dp-rounded average is identical
    IEEE arithmetic on both engines).
    """
    emb = load_tables(spark, sf_dir)["embeddings"]
    dim = 64  # fixture embedding width (TESTDATA.md); helper param at API level
    per_dim_avgs = [
        F.round(F.avg(F.col("embedding")[i]), 6).alias(f"_c{i}") for i in range(dim)
    ]
    scaled = [scaled_int_text(f"_c{i}") for i in range(dim)]
    return (
        emb.groupBy("label")
        .agg(F.count(F.lit(1)).alias("n_vecs"), *per_dim_avgs)
        .select(
            "label",
            F.lit(dim).cast("long").alias("dim"),
            F.array_join(F.array(*scaled), ",").alias("centroid"),
        )
        .orderBy("label")
    )


def _nearest_clusters(C: "np.ndarray", A: "np.ndarray") -> "np.ndarray":
    """Nearest centroid per row of A by squared L2 (vectorized; ties
    broken by lowest cluster index, which np.argmin guarantees)."""
    d2 = (
        (A * A).sum(axis=1, keepdims=True)
        - 2.0 * (A @ C.T)
        + (C * C).sum(axis=1)[None, :]
    )
    return np.argmin(d2, axis=1)


def _assign_nearest(C: "np.ndarray"):
    """mapInPandas generator: (vec_id, embedding) → (vec_id, cluster).
    Round 19: the embedding column no longer rides back across the
    Arrow boundary — no consumer ever read it from the output (guide
    §4.1: pass only the columns the function needs, both directions)."""

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            A = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "cluster": _nearest_clusters(C, A).astype(np.int32),
                }
            )

    return gen


def _assign_partials(C: "np.ndarray"):
    """mapInPandas generator for the Lloyd UPDATE step: per Arrow batch,
    assign rows to centroids and emit the per-cluster partial sums and
    counts — ≤ k×dim rows per batch, never row-sized output.

    Round-19 optimization (guide §2.3 "aggregate before you shuffle",
    §4.1): the previous update shipped every (vec_id, cluster,
    embedding) row back to the JVM, posexploded n×dim (cluster, dim, x)
    rows, and relied on hash-aggregate map-side combine.  Folding the
    partial aggregation into the SAME matmul pass means embeddings
    never leave the Python worker and the exchange carries only
    k×dim×batches partials.  Final means = sum(s)/sum(cnt) per
    (cluster, dim) — verified assignment-identical to the old
    formulation at sf0.001/0.01/0.1 (OPTIMIZATION_r19.md #5)."""
    k, dim = C.shape

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            A = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            cl = _nearest_clusters(C, A)
            sums = np.zeros((k, dim))
            cnts = np.zeros(k, dtype=np.int64)
            np.add.at(sums, cl, A)
            np.add.at(cnts, cl, 1)
            nz = np.nonzero(cnts)[0]
            yield pd.DataFrame(
                {
                    "cluster": np.repeat(nz, dim).astype(np.int32),
                    "dim": np.tile(np.arange(dim, dtype=np.int32), len(nz)),
                    "s": sums[nz].ravel(),
                    "cnt": np.repeat(cnts[nz], dim),
                }
            )

    return gen


def distributed_kmeans_assign(
    e: DataFrame, k: int = 8, iters: int = 5
) -> DataFrame:
    """Fully DISTRIBUTED Lloyd k-means: per-iteration Arrow-batched
    assignment + partial-sum centroid update fused into ONE mapInPandas
    pass (``_assign_partials`` — round 19; previously assignment and a
    posexplode → groupBy avg ran as separate row-sized stages), with
    only the k×dim centroid matrix crossing to the driver each round —
    the iterative-ML companion to :func:`train_ivf_centroids`, which
    trains on a bounded driver-side SAMPLE (the FAISS recipe).  Use
    this shape when the training set itself is the 100 TB table: state
    on the driver is k×dim floats per iteration (the same bounded
    class as PageRank's rank vector), every data-sized operation is a
    scan whose output is ≤ k×dim partial rows per Arrow batch before
    the exchange; embeddings never leave the Python workers.

    Deterministic: init = the first ``k`` vectors by vec_id
    (orderBy before limit — layout-independent), fixed ``iters``, no
    RNG; reruns are exact, enabling the numpy-twin test.
    """
    # Persist the projected input across the Lloyd iterations (VERDICT
    # r12 #5): each iteration's update job is a fresh action, so without
    # the cache every round re-reads the scan — iters× redundant I/O at
    # 100 TB.  Unpersisted after the loop: the returned frame is lazy,
    # so a cache it depended on could never be released; the final
    # assignment pass pays one re-scan instead of a permanent pin.
    e = e.persist()
    try:
        init = e.orderBy("vec_id").limit(k).collect()  # k rows: bounded
        C = np.stack(
            [np.asarray(r["embedding"], dtype=np.float64) for r in init]
        )
        for _ in range(iters):
            upd = (
                e.mapInPandas(
                    _assign_partials(C), "cluster int, dim int, s double, cnt long"
                )
                .groupBy("cluster", "dim")
                .agg((F.sum("s") / F.sum("cnt")).alias("m"))
                .collect()  # k×dim rows: bounded, not data-sized
            )
            for r in upd:
                C[r["cluster"], r["dim"]] = r["m"]
    finally:
        e = e.unpersist()
    return e.mapInPandas(_assign_nearest(C), "vec_id long, cluster int")


@query("sim_kmeans_assign", tags=("rows-only",))  # iterative float loop
def q_sim_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd k-means cluster assignment over the embeddings
    table (k=8, 5 iterations, deterministic init) — see
    :func:`distributed_kmeans_assign`.  Rows-only: the result depends
    on float iteration no SQL engine reproduces bit-exactly, but it is
    rerun-exact and
    tests/test_properties.py::test_kmeans_assign_matches_numpy_twin
    re-derives every assignment with an independent numpy
    implementation (plus a near-tie margin guard, so the comparison is
    robust to summation-order ulps)."""
    t = load_tables(spark, sf_dir)
    e = t["embeddings"].select("vec_id", "embedding")
    return distributed_kmeans_assign(e).orderBy("vec_id")
