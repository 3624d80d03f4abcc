"""Deduplication operators (SURVEY.md §2.8 + LLM-pipeline dedup suite).

Five dedup families over `documents` / `embeddings`:

- exact           — content/composite-key hash, deterministic keeper
- fuzzy MinHash   — shingle → minhash → band → bucket-join (LSH), native
                    DataFrame ops (no ml.feature Vector overhead)
- n-gram Jaccard  — exact pairwise shingle-set similarity (small-n path)
- SimHash         — 32-bit sign-sum signature per document
- embedding cosine— near-dup by vector similarity

Scale posture: MinHash-LSH is THE 100 TB path — candidate generation is
an equi-join on (band_id, band_hash) buckets (no O(n²) pair space), and
only candidates pay the exact-Jaccard verification.  The exact pairwise
variants are deliberately the *small-n* path (SURVEY.md §4.3.3) and say
so; at scale they exist to validate LSH recall on samples.
"""

from __future__ import annotations

import os
from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyspark_analytics_library_spark.registry import query
from pyspark_analytics_library_spark.sources.io import load_tables


def word_shingles(text_col: Column, k: int = 3) -> Column:
    """Distinct k-word shingles of a lowercased text column (built from
    zip_with over shifted slices — pure JVM expression, no UDF)."""
    w = F.split(F.lower(text_col), " ")
    n = F.size(w)
    cnt = F.greatest(n - (k - 1), F.lit(0))
    out = F.slice(w, 1, cnt)
    for i in range(1, k):
        out = F.zip_with(out, F.slice(w, 1 + i, cnt), lambda a, b: F.concat_ws(" ", a, b))
    return F.array_distinct(out)


def dedup_exact_keep_min(
    df: DataFrame, group_cols: list[str], order_col: str
) -> DataFrame:
    """Exact dedup with a deterministic keeper (min ``order_col`` per
    duplicate group) — ``dropDuplicates`` keeps an arbitrary row, which
    can never parity-check across engines.

    Implemented as ONE hash aggregate (min + min_by + count), not a
    window: the aggregate gets map-side partial aggregation, so at
    100 TB only one pre-combined row per group per map task reaches the
    shuffle, where the window formulation shuffles and sorts EVERY row.
    ``min_by`` carries the keeper's non-key columns (deterministic here
    because ``order_col`` is unique per group, same contract as the
    row_number formulation).

    ``group_cols`` takes column NAMES (one or a list — the helper must
    compute the complement column set, which Column expressions cannot
    name); a bare string is one column, not characters.
    """
    if isinstance(group_cols, str):
        group_cols = [group_cols]
    if isinstance(group_cols, Column) or any(
        not isinstance(c, str) for c in group_cols
    ):
        raise TypeError(
            "dedup_exact_keep_min needs column NAMES for group_cols "
            "(it derives the carried-column set from df.columns), got "
            f"{group_cols!r}"
        )
    other = [c for c in df.columns if c not in group_cols and c != order_col]
    return df.groupBy(*group_cols).agg(
        F.min(order_col).alias(order_col),
        *[F.min_by(c, order_col).alias(c) for c in other],
        F.count(F.lit(1)).alias("n_dupes"),
    ).select(*df.columns, "n_dupes")


def jaccard(a: Column, b: Column) -> Column:
    """Jaccard similarity of two *distinct-element* arrays, computed the
    same way both engines can (intersection size / inclusion-exclusion)."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    return inter / (F.size(a) + F.size(b) - inter)


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    bands: int = 4,
    rows_per_band: int | None = None,
    verify_threshold: float = 0.4,
) -> DataFrame:
    """Near-duplicate pairs via shingle → minhash → band → bucket-join.

    Fully deterministic (xxhash64 with fixed per-hash salts).  Pipeline:
    1. distinct 3-word shingles per doc (JVM array expressions);
    2. per doc, signature[i] = array_min over xxhash64(salt_i, shingle)
       — a pure projection, no explode/groupBy shuffle (round 19);
    3. band key = xxhash64 over each band's rows; explode (band_id, key);
    4. equi-join docs sharing a (band_id, key) bucket → candidates;
    5. exact-Jaccard verification of candidates only.
    The bucket self-join and both shingle-array verify joins carry
    explicit merge hints: all sides are text-exploded and corpus-sized,
    the class the static planner mis-broadcasts off compressed file
    estimates (see ngram_jaccard_pairs for the measured failure).
    At 100 TB: no O(n²) stage exists; the bucket join shuffles each doc
    ``bands`` times; skew from degenerate buckets is AQE-split.

    Choosing (bands, rows_per_band) — VERDICT r12 #2: a pair with true
    Jaccard ``s`` becomes a candidate with probability
    ``1 − (1 − s^r)^b`` (r = rows_per_band, b = bands), an S-curve with
    inflection near ``(1/b)^(1/r)``.  More bands at fixed r → recall
    is monotonically non-decreasing (each band is one more independent
    chance to collide; tests/test_properties.py pins this), at the cost
    of ``b``× signature/bucket rows.  Deeper bands (larger r) sharpen
    the curve — fewer false candidates to verify — but push the
    inflection up.  For a target false-negative rate ``fn`` at
    threshold τ, pick the smallest b with ``(1 − τ^r)^b ≤ fn``.  The
    MEASURED recall curve for this corpus (SCALE.md round-13: sf0.1 +
    a 500 k-doc staging, against the unblocked exact-Jaccard truth) —
    the defaults b=4, r=2 sit at the curve's knee for τ=0.4; recall
    near τ is content-hash-sensitive (the r12 probe: borderline pairs
    flip with the text's hash draw), so treat single-pair differences
    near the threshold as expected, not as corruption.

    Pass EITHER ``rows_per_band`` (then num_hashes = bands × r exactly)
    or a ``num_hashes`` divisible by ``bands`` (the legacy spelling —
    a non-divisible count would silently truncate the signature, so it
    raises instead).
    """
    if rows_per_band is not None:
        num_hashes = bands * rows_per_band
    elif num_hashes % bands != 0:
        raise ValueError(
            f"num_hashes={num_hashes} not divisible by bands={bands}; "
            "pass rows_per_band explicitly"
        )
    else:
        rows_per_band = num_hashes // bands
    shingled = docs.select(
        F.col(id_col), word_shingles(F.col(text_col)).alias("shingles")
    ).filter(F.size("shingles") > 0)

    # Signature via array_min(transform(...)) — a pure per-row
    # projection.  Round-19 optimization (guide §2.4 "remove shuffles
    # outright"): the previous explode + groupBy(doc) formulation
    # shuffled the EXPLODED shingle table (corpus × ~shingles-per-doc
    # rows — the largest exchange in the whole pipeline at corpus
    # scale) just to take per-doc minima that are computable inside
    # the row.  Same hashes, same minima, proven row-identical and
    # measured ~20 % faster end-to-end even at bench scale
    # (OPTIMIZATION_r19.md #3).  The per-salt closure is a named
    # factory: a two-parameter lambda would be called as
    # (element, index) by the higher-order-function binder.
    def _salted(i: int):
        return lambda s: F.xxhash64(F.lit(i), s)

    sig = shingled.select(
        id_col,
        *[
            F.array_min(F.transform("shingles", _salted(i))).alias(f"mh_{i}")
            for i in range(num_hashes)
        ],
    )
    band_rows = sig.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.xxhash64(
                            F.lit(b),
                            *[
                                F.col(f"mh_{b * rows_per_band + r}")
                                for r in range(rows_per_band)
                            ],
                        ).alias("band_hash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select(id_col, "bk.band_id", "bk.band_hash")

    a = band_rows.select(
        F.col(id_col).alias("id_a"), "band_id", "band_hash"
    )
    b = band_rows.select(
        F.col(id_col).alias("id_b"), "band_id", "band_hash"
    )
    candidates = (
        a.join(b.hint("merge"), ["band_id", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    sh_a = shingled.select(F.col(id_col).alias("id_a"), F.col("shingles").alias("sh_a"))
    sh_b = shingled.select(F.col(id_col).alias("id_b"), F.col("shingles").alias("sh_b"))
    return (
        candidates.join(sh_a.hint("merge"), "id_a")
        .join(sh_b.hint("merge"), "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(jaccard(F.col("sh_a"), F.col("sh_b")), 4).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= verify_threshold)
    )


def simhash_32(tokens: Column, hash_salt: int = 7) -> Column:
    """32-bit SimHash: per token, xxhash64 → for each bit position sum
    ±1 → sign vector → packed int.  One aggregate expression tree, no
    UDF, no shuffle beyond the enclosing groupBy."""
    h = F.xxhash64(F.lit(hash_salt), F.col("tok"))
    bit_sums = [
        F.sum(F.when(h.bitwiseAND(F.lit(1 << i)) != 0, 1).otherwise(-1)).alias(
            f"s_{i}"
        )
        for i in range(32)
    ]
    return bit_sums  # aggregated by caller; packed via pack_simhash


def pack_simhash() -> Column:
    return reduce(
        lambda acc, i: acc + F.when(F.col(f"s_{i}") > 0, F.lit(1 << i)).otherwise(0),
        range(32),
        F.lit(0).cast("long"),
    ).alias("simhash")


@query(
    "dedup_exact",
    oracle="""
    WITH g AS (
        SELECT doc_id, lang,
               CAST(FLOOR(n_chars / 100.0) AS BIGINT) AS len_bucket,
               sha256(text) AS content_hash,
               ROW_NUMBER() OVER (
                   PARTITION BY lang, CAST(FLOOR(n_chars / 100.0) AS BIGINT)
                   ORDER BY doc_id ASC) AS rn,
               COUNT(*) OVER (
                   PARTITION BY lang, CAST(FLOOR(n_chars / 100.0) AS BIGINT)
               ) AS n_dupes
        FROM documents
    )
    SELECT doc_id, lang, len_bucket, content_hash, CAST(n_dupes AS BIGINT) AS n_dupes
    FROM g WHERE rn = 1
    """,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on a composite key (lang, 100-char length bucket) —
    fixture texts are globally unique (FIXTURES.md), so the composite
    gives real collapsing; sha256(text) is carried as the content-hash
    surface (hex-identical across engines)."""
    t = load_tables(spark, sf_dir)
    df = t["documents"].select(
        "doc_id",
        "lang",
        F.floor(F.col("n_chars") / 100.0).alias("len_bucket"),
        F.sha2(F.col("text"), 256).alias("content_hash"),
    )
    return dedup_exact_keep_min(df, ["lang", "len_bucket"], "doc_id")


@query("dedup_fuzzy_minhash", tags=("rows-only",))  # xxhash64 absent in DuckDB
def q_dedup_fuzzy_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return minhash_lsh_pairs(t["documents"])


#: Shared by dedup_ngram_jaccard and its prefix-filtered variant: the
#: filter is LOSSLESS (every τ-qualifying pair must collide inside both
#: frequency-ordered prefixes), so both declared queries verify against
#: the identical unblocked DuckDB oracle.
_NGRAM_JACCARD_ORACLE = """
    WITH t AS (
        SELECT doc_id, lang, string_split(lower(text), ' ') AS words FROM documents
    ), u AS (
        SELECT doc_id, lang, unnest(words) AS w,
               generate_subscripts(words, 1) AS pos
        FROM t
    ), s AS (
        SELECT doc_id, lang,
               w || ' ' || LEAD(w, 1) OVER win || ' ' || LEAD(w, 2) OVER win AS sh
        FROM u WINDOW win AS (PARTITION BY doc_id ORDER BY pos)
    ), shl AS (
        SELECT doc_id, lang, list_distinct(list(sh)) AS shingles
        FROM s WHERE sh IS NOT NULL GROUP BY doc_id, lang
    ), pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.lang AS lang,
               len(list_filter(a.shingles, x -> list_contains(b.shingles, x))) AS inter,
               len(a.shingles) AS na, len(b.shingles) AS nb
        FROM shl a JOIN shl b ON a.lang = b.lang AND a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, lang,
           ROUND(CAST(inter AS DOUBLE) / (na + nb - inter), 4) AS jaccard
    FROM pairs
    WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= 0.2
    """


@query("dedup_ngram_jaccard", oracle=_NGRAM_JACCARD_ORACLE)
def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact pairwise 3-shingle Jaccard within language — see
    :func:`ngram_jaccard_pairs`.  The declared query keeps
    ``prefix_filter`` OFF: this row attests the plain inverted-index
    join; the filtered web-scale path is declared separately below."""
    t = load_tables(spark, sf_dir)
    return ngram_jaccard_pairs(t["documents"])


@query("dedup_ngram_jaccard_prefixed", oracle=_NGRAM_JACCARD_ORACLE)
def q_dedup_ngram_jaccard_prefixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``prefix_filter=True`` web-scale path of
    :func:`ngram_jaccard_pairs` as its own declared query (VERDICT r5
    #5): prefix filtering is lossless, so it shares the unblocked
    oracle — a driver hash-green row attests that the filter-then-
    verify split returns the byte-identical pair set, not just that a
    property test said so at fixture scale."""
    t = load_tables(spark, sf_dir)
    return ngram_jaccard_pairs(t["documents"], prefix_filter=True)


def ngram_jaccard_pairs(
    docs: DataFrame, tau: float = 0.2, prefix_filter: bool = False
) -> DataFrame:
    """All same-language doc pairs with 3-shingle Jaccard ≥ ``tau``, as
    a distributed set-similarity join: explode each document's distinct
    shingles, equi-join on (lang, shingle), and COUNT the matches per
    (id_a, id_b) — that count IS |A∩B| exactly, so no pair ever
    carries (or intersects) the shingle arrays themselves.  Sizes join
    back afterward for the inclusion-exclusion denominator.

    Why this shape: any pair with J ≥ tau shares ≥ 1 shingle, so the
    shingle equi-join is SOUND blocking with the selectivity of the
    shingle vocabulary — candidate volume is Σ_s C(df_s, 2), a function
    of how often a shingle repeats across docs, not |docs|² per
    language.  (The previous log₅ shingle-count bucketing collapsed to
    ~2 distinct buckets on real length distributions, making it
    lang-only blocking: 107 s at sf0.1; this shape runs the same query
    in a few seconds and shuffles id pairs, not arrays.)

    ``prefix_filter=True`` is the web-scale path for the residual risk
    of ubiquitous hot shingles ("of the and") fattening Σ C(df_s, 2):
    classic prefix filtering orders each document's shingles by
    ascending global document frequency (ties by shingle text — a total
    order, so every doc agrees) and joins only on each doc's first
    n − ⌈τ·n⌉ + 1 of them.  Any τ-qualifying pair must collide inside
    both prefixes under a shared total order, so the candidate set is a
    superset of the answer; the hottest shingles sort LAST and drop out
    of the join entirely.  Survivor-sized candidates are then verified
    exactly via array_intersect on the full shingle sets (JVM-side,
    candidate-volume work — the standard filter-then-verify split).

    The threshold filters the UNROUNDED ratio (identical IEEE division
    on both engines); only the output column is rounded.

    Every join below carries an explicit ``merge`` hint: all sides —
    posting lists, the shingle-df vocabulary, candidates, and the
    full shingle-array table — are CORPUS-sized, and Catalyst's static
    planner estimates them from the pre-explode parquet file size,
    which text compression can understate by orders of magnitude.
    The round-9 sf≈10 probe (1 M docs in a 4.5 MB file — 100×
    -duplicated text) demonstrated the failure: every join planned
    BroadcastHashJoin and the build died with
    notEnoughMemoryToBuildAndBroadcastTable.  A corpus-sized side must
    never be statically broadcast; sort-merge is the scale-safe
    strategy, and at fixture scale the cost is milliseconds."""
    sh = docs.select("doc_id", "lang", word_shingles(F.col("text")).alias("sh"))
    posts = sh.select(
        "doc_id", "lang", F.size("sh").alias("n"), F.explode("sh").alias("s")
    )
    if prefix_filter:
        dfreq = posts.groupBy("lang", "s").agg(F.count(F.lit(1)).alias("df"))
        ranked = posts.join(dfreq.hint("merge"), ["lang", "s"]).withColumn(
            "pos",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy("df", "s")
            ),
        )
        # Lossless bound: keep the first n − ⌈τ·n⌉ + 1 shingles.  The
        # ⌈·⌉ argument is nudged down by 1e-9 before ceil: when τ·n is
        # an exact integer in real arithmetic, double rounding can land
        # one ulp ABOVE it (relative error ~1.7e-16 > half-ulp), ceil
        # would return k+1, and the prefix would shrink below the
        # lossless bound — silently dropping qualifying pairs for
        # arbitrary caller-supplied τ.  The nudge can only lengthen the
        # prefix (more candidates, never fewer), so soundness holds for
        # every τ; 1e-9 dwarfs the ulp error yet is far below the 1/n
        # gap between attainable τ·n values at any realistic n.
        prefix = ranked.filter(
            F.col("pos")
            <= F.col("n") - F.ceil(F.lit(tau) * F.col("n") - F.lit(1e-9)) + 1
        )
        pa = prefix.select(F.col("doc_id").alias("id_a"), "lang", "s")
        pb = prefix.select(
            F.col("doc_id").alias("id_b"),
            F.col("lang").alias("lang_b"),
            F.col("s").alias("s_b"),
        )
        cand = (
            pa.join(
                pb.hint("merge"),
                (F.col("s") == F.col("s_b"))
                & (F.col("lang") == F.col("lang_b"))
                & (F.col("id_a") < F.col("id_b")),
            )
            .select("id_a", "id_b", "lang")
            .distinct()
        )
        verified = (
            cand.join(
                sh.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a")).hint(
                    "merge"
                ),
                "id_a",
            )
            .join(
                sh.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b")).hint(
                    "merge"
                ),
                "id_b",
            )
            .select(
                "id_a",
                "id_b",
                "lang",
                F.size(F.array_intersect("sh_a", "sh_b")).alias("inter"),
                F.size("sh_a").alias("na"),
                F.size("sh_b").alias("nb"),
            )
        )
    else:
        a = posts.select(
            F.col("doc_id").alias("id_a"), "lang", F.col("n").alias("na"), "s"
        )
        b = posts.select(
            F.col("doc_id").alias("id_b"),
            F.col("lang").alias("lang_b"),
            F.col("n").alias("nb"),
            F.col("s").alias("s_b"),
        )
        verified = (
            a.join(
                b.hint("merge"),
                (F.col("s") == F.col("s_b"))
                & (F.col("lang") == F.col("lang_b"))
                & (F.col("id_a") < F.col("id_b")),
            )
            .groupBy("id_a", "id_b", "lang", "na", "nb")
            .agg(F.count(F.lit(1)).alias("inter"))
        )
    j_raw = F.col("inter").cast("double") / (
        F.col("na") + F.col("nb") - F.col("inter")
    )
    return (
        verified.select("id_a", "id_b", "lang", j_raw.alias("j_raw"))
        .filter(F.col("j_raw") >= tau)
        .select("id_a", "id_b", "lang", F.round(F.col("j_raw"), 4).alias("jaccard"))
    )


@query("dedup_simhash", tags=("rows-only",))  # xxhash64 absent in DuckDB
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document 32-bit SimHash signature (near-dup candidates are
    signatures within small Hamming distance — tested by property)."""
    t = load_tables(spark, sf_dir)
    toks = t["documents"].select(
        "doc_id", F.explode(F.array_distinct(F.split(F.lower("text"), " "))).alias("tok")
    )
    agg = toks.groupBy("doc_id").agg(*simhash_32(F.col("tok")))
    return agg.select("doc_id", pack_simhash())


@query(
    "dedup_embedding",
    oracle="""
    WITH p AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               CAST(unnest(a.embedding) AS DOUBLE) AS xa,
               CAST(unnest(b.embedding) AS DOUBLE) AS xb
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    ), c AS (
        SELECT id_a, id_b,
               SUM(xa * xb) / SQRT(SUM(xa * xa) * SUM(xb * xb)) AS cos
        FROM p GROUP BY id_a, id_b
    )
    SELECT DISTINCT id_b AS dup_vec_id
    FROM c WHERE ROUND(cos, 6) > 0.35
    """,
)
def q_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup removal: vec_ids duplicating an
    earlier vector (cosine > 0.35 — fixture cosines top out ≈0.48).
    Exact pairwise via the broadcast BLAS kernel — small-n path; LSH in
    similarity.py is the scale path.  Cosine computed in double on both
    engines (DuckDB's list_cosine_similarity is float32 — not
    parity-safe)."""
    from pyspark_analytics_library_spark.operators.similarity import (
        brute_threshold_pairs,
        build_index,
    )

    t = load_tables(spark, sf_dir)
    e = t["embeddings"].select("vec_id", "embedding")
    pairs = brute_threshold_pairs(e, build_index(spark, e), tau=0.35)
    return pairs.select(F.col("id_b").alias("dup_vec_id")).distinct()


def connected_components(
    edges: DataFrame, vertices: DataFrame, max_iters: int = 30
) -> DataFrame:
    """Min-label connected components over (src, dst) edges: every
    vertex ends up labeled with the smallest vertex id in its
    component — the step that turns near-dup PAIRS into dedup GROUPS
    (pick one keeper per component).

    Vertex/edge contract (since round 19; made explicit per ADVICE
    r19): edge endpoints need NOT appear in ``vertices`` — labels
    initialize from the edge-incident endpoint set on both dispatch
    paths, so an out-of-vertex endpoint participates in merging and
    its id can become a component's label (it just never appears as an
    output row, since the output is keyed on ``vertices``).  Callers
    wanting the pre-r19 "edges outside the vertex set never propagate"
    behavior must semi-join their edges to the vertex set first.
    NULL endpoints are no-ops (a NULL never equi-joins), and every
    vertex absent from any edge labels itself.

    Algorithm: two-phase hash-to-min.  Each round (1) takes the min
    label over each vertex's neighborhood, then (2) takes the min of
    that over each CURRENT LABEL GROUP and joins it back through both
    the old and the new label.  Phase 2 is what makes the round count
    O(log n): labels form shrinking star clusters whose mins merge
    pairwise per round regardless of how vertex ids are laid out.
    (The previous formulation — pointer doubling, label <- label(label)
    — is only logarithmic when ids increase along paths; on the real
    fixture graph, whose doc_ids are RANDOM along the n_chars chain,
    it degraded to near-linear rounds: >20 rounds at sf0.1 where this
    scheme takes 8, and a 500-node chain took 84-342 rounds in
    simulation vs ≤10 for group-min.)

    Every round materializes the label table to an app-and-run-scoped
    scratch parquet (see _iteration_scratch_root) and re-reads it.  This does TWO jobs ``localCheckpoint``
    does not: it cuts the logical plan (cache() truncates recompute,
    NOT the plan tree) AND it resets Catalyst's size statistics —
    LogicalRDD carries the ORIGIN plan's estimated stats, and a
    join's size estimate is the product of its children's, so the
    carried estimate compounds exponentially across rounds until the
    driver OOMs inside the BigInteger stats arithmetic (observed at
    sf0.1, round ~20: 30 s planning per round, then heap exhaustion).
    A cluster run writes the same per-round table to durable storage
    — this is exactly GraphFrames' periodic-checkpoint discipline.
    The convergence check is one driver-side scalar per round (the
    same pattern as any Pregel-style loop).

    Round-19 optimization (guide §1.2 "the distributed algorithm", §5
    guarded-driver discipline), measured shapes in OPTIMIZATION_r19.md:

    - **Driver union-find dispatch.**  When the edge set fits
      ``spark.analytics.cc.driverUnionFindMaxEdges`` (default 500 000 —
      ≲ tens of MB of id pairs on the driver, sub-second union-find),
      the pair list is collected once (``limit(cap+1)`` — one early-
      exiting pass decides the dispatch AND delivers the data) and the
      closure is computed driver-side, exactly like the dense-matmul
      branch of ``graph.triangle_census`` and ``similarity.build_index``
      collect under their caps.  This removes the per-round job latency
      entirely for small candidate graphs (the common LSH output: a few
      hundred to a few hundred thousand pairs even on large corpora).
      Set the cap to ``0`` to force the distributed loop.  Above-cap
      cost, stated honestly (ADVICE r19): ``CollectLimit`` early-exits
      only when the edge plan's FINAL stage is limit-pushable — when
      the plan ends in a shuffle (the usual LSH candidate join), the
      probe executes that plan essentially in full before the loop
      materializes it AGAIN, so operators of large fuzzy pipelines
      whose edge sets are known to exceed the cap should set the cap
      to ``0`` and skip the probe.
    - **Singleton bypass.**  The distributed loop now iterates over the
      EDGE-INCIDENT vertices only — every other vertex's component is
      itself by definition, so carrying them through log(diameter)
      rounds of joins shuffled |V| rows per round for zero information
      (guide §2.3 "shuffle fewer bytes").  Singletons rejoin via one
      left join + coalesce at the end.  On a dedup workload where 1-10 %
      of documents have any candidate pair, the per-round shuffle drops
      10-100×.
    """
    spark = edges.sparkSession
    e2 = edges.select("src", "dst")
    uf_cap = int(
        spark.conf.get("spark.analytics.cc.driverUnionFindMaxEdges", "500000")
    )
    if uf_cap > 0:
        head = e2.limit(uf_cap + 1).collect()
        if len(head) <= uf_cap:
            return _cc_driver_union_find(
                spark, head, vertices, e2.schema["src"].dataType
            )
    # Symmetrize by a row-local explode, NOT a union of two branches
    # (round 20, guide §2.4): a union references ``e2`` twice, so the
    # sym materialization job executed the CALLER'S edge-generation
    # plan — here a self-join, in the fuzzy pipelines a full LSH
    # candidate stage — twice (plan: 7 source scans → 4; measured
    # −30 % on the sym build at sf0.1; rows proven identical).
    sym = e2.select(
        F.explode(
            F.array(
                F.struct(F.col("src"), F.col("dst")),
                F.struct(F.col("dst").alias("src"), F.col("src").alias("dst")),
            )
        ).alias("_e")
    ).select("_e.src", "_e.dst")
    # Scoped shuffle-partition trim (measured 13.3 s -> 3.5 s at sf0.01
    # on a bare session): every round pays per-partition task + state
    # overhead x partitions x rounds, and AQE's coalescing does not
    # shrink what localCheckpoint materializes.  Only the untouched 200
    # default is trimmed — a deliberately sized session is respected —
    # and the conf is restored on exit (safe: every round runs eagerly,
    # so nothing inside the loop is re-planned after restore).
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions", "200")
    # Gate to local masters (same discipline as the loader's trim in
    # sources/io.py): on a cluster whose admin left the default alone,
    # a library helper must not pin a petabyte shuffle to 8 reducers.
    # Locally the label table is fixture-sized and each round pays
    # per-task overhead × partitions × rounds, so fewer is faster.
    is_local = spark.sparkContext.master.startswith("local")
    trim = is_local and prev_parts in ("200", "32")
    if trim:
        spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        # Reaching the loop with uf_cap > 0 means the dispatch probe
        # PROVED |E| > uf_cap — the signal the auto edge-bucketing
        # policy keys on (see _cc_materialize_sym).
        lab = _cc_loop(sym, max_iters, big_edges=uf_cap > 0)
    finally:
        if trim:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    return _attach_singletons(vertices, lab, broadcast_labels=False)


def _attach_singletons(
    vertices: DataFrame, lab: DataFrame, broadcast_labels: bool
) -> DataFrame:
    """Label every vertex: edge-incident vertices from ``lab`` (v, label),
    everything else — the singletons the loop/union-find never saw — as
    its own component.  ``broadcast_labels`` is set on the union-find
    path, where ``lab`` is bounded by the driver cap by construction;
    the loop path leaves the strategy to the planner (``lab`` is backed
    by the final-round parquet with exact size stats)."""
    lab2 = lab.select(F.col("v").alias("_cc_lv"), F.col("label"))
    if broadcast_labels:
        lab2 = F.broadcast(lab2)
    return vertices.join(
        lab2, vertices["v"] == F.col("_cc_lv"), "left"
    ).select(
        vertices["v"].alias("v"),
        F.coalesce(F.col("label"), vertices["v"]).alias("label"),
    )


def _cc_driver_union_find(
    spark: SparkSession, edge_rows, vertices: DataFrame, v_type
) -> DataFrame:
    """Min-label components of a driver-resident edge list via weighted-
    by-id union-find (smaller id becomes the root, so every final root
    IS its component's min id — the same labeling the distributed loop
    converges to).  Edges with a NULL endpoint are no-ops, matching the
    loop's join semantics (a NULL never equi-joins a label row).

    Only the NON-TRIVIAL mapping rows (label ≠ vertex) are shipped back
    — bounded by the edge cap — and singletons fall out of the same
    left-join + coalesce the loop path uses."""
    from pyspark.sql import types as T

    parent: dict = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != r:
            parent[x], x = r, parent[x]
        return r

    for row in edge_rows:
        a, b = row[0], row[1]
        if a is None or b is None:
            continue
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra

    mapping = [
        (v, r)
        for v in list(parent)
        if (r := find(v)) != v
    ]
    mdf = spark.createDataFrame(
        mapping,
        T.StructType(
            [T.StructField("v", v_type), T.StructField("label", v_type)]
        ),
    )
    return _attach_singletons(vertices, mdf, broadcast_labels=True)


class ConvergenceError(RuntimeError):
    """Raised when an iterative algorithm exhausts max_iters unconverged.

    Partially converged component labels are silently WRONG (split
    components), so the loop refuses to return them — callers either
    raise ``max_iters`` (group-min hash-to-min needs ~log₂(n) rounds,
    so the default 30 covers any graph of ~10⁹ vertices) or catch and
    accept partial labels explicitly.
    """


def _fs_delete(spark: SparkSession, path: str) -> None:
    """Best-effort recursive delete through the Hadoop FileSystem API —
    works for any URI Spark can write (file://, hdfs://, s3a://), which
    ``shutil.rmtree`` does not once scratchDir points at remote
    storage."""
    try:
        jvm = spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = hpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
        fs.delete(hpath, True)
    except Exception:  # cleanup must never fail the computation
        pass


def _cc_checkpoint(df: DataFrame, scratch_root: str, round_no: int) -> DataFrame:
    """Materialize a loop frame to scratch parquet and re-read it —
    cuts BOTH the logical plan and the carried size statistics (see
    connected_components docstring).  Rolls the prior round's files off
    via the Hadoop FS API (so the delete is real on remote scratchDirs
    too); only the latest round is ever on disk, and the loop deletes
    everything except the FINAL round's files — those back the returned
    DataFrame and are reclaimed by :func:`reclaim_iteration_scratch`
    (the documented per-app pruning helper), by the caller clearing the
    app-scoped scratch dir, or locally by the OS tempdir cleaner.

    Writes are coalesced to a few files: the label table is
    vertex-count-sized and every downstream round re-reads it whole, so
    shuffle-partition-many tiny files would pay per-file open/commit
    cost × rounds for zero parallelism benefit.  (coalesce, not
    repartition — no extra shuffle; a billion-vertex cluster run sizes
    this up with the rest of the session's partitioning.)"""
    path = os.path.join(scratch_root, f"round_{round_no}")
    df.coalesce(4).write.mode("overwrite").parquet(path)
    _fs_delete(df.sparkSession, os.path.join(scratch_root, f"round_{round_no - 1}"))
    # The written schema is df's own — passing it skips the re-read's
    # footer-based schema inference (~70 ms of driver work per reader
    # build, ~log(diameter) builds per loop; measured round 20).
    return df.sparkSession.read.schema(df.schema).parquet(path)


def _iteration_scratch_root(spark: SparkSession) -> str:
    """Durable scratch base for iterative materialization, scoped by
    the cluster-unique Spark application id (NOT the driver pid: pids
    collide across hosts and containerized drivers are routinely pid 1,
    so two apps sharing one scratchDir URI would overwrite each other's
    round files).

    Resolution order (VERDICT r4 "what's wrong" #1 — a driver-local
    tempdir is only correct when driver and executors share a
    filesystem, i.e. local masters):

    1. ``spark.analytics.scratchDir`` conf — any Hadoop-visible URI
       (hdfs://, s3a://, a shared mount); used verbatim when set.
    2. local[*] master — the OS tempdir (single machine: executors and
       driver share it; the tempdir cleaner reclaims leftovers).
    3. cluster master — ``sparkContext.getCheckpointDir()`` if the
       application already configured one, else raise eagerly: silently
       writing executor-unreachable local paths would corrupt the loop
       mid-flight, far worse than failing before the first job.
    """
    import tempfile

    conf_dir = spark.conf.get("spark.analytics.scratchDir", None)
    if conf_dir:
        base = conf_dir
    elif spark.sparkContext.master.startswith("local"):
        base = tempfile.gettempdir()
    else:
        base = spark.sparkContext.getCheckpointDir()
        if not base:
            raise ValueError(
                "iterative operators need durable scratch storage on a "
                "cluster: set spark.analytics.scratchDir to a shared "
                "URI (hdfs://, s3a://, ...) or call "
                "sparkContext.setCheckpointDir() first"
            )
    import uuid

    # App-id scoping isolates concurrent applications sharing one
    # scratch URI; the per-call uuid isolates repeated/concurrent loops
    # WITHIN an application — a second run must not overwrite the final
    # round files still backing the first run's returned DataFrame.
    app_id = spark.sparkContext.applicationId
    return os.path.join(
        base, f"pyspark_analytics_cc_{app_id}", uuid.uuid4().hex[:12]
    )


def reclaim_iteration_scratch(
    spark: SparkSession, keep_latest: bool = True
) -> list[str]:
    """Prune THIS application's superseded iteration-scratch generations.

    Iterative operators (:func:`connected_components`'s loop; the
    sparse triangle census self-cleans since round 10) materialize to a
    fresh per-call uuid generation under
    ``<base>/pyspark_analytics_cc_<applicationId>/`` — a second call
    must never overwrite the final-round parquet still backing the
    first call's returned DataFrame, so generations accumulate across
    calls in a long-lived application (VERDICT r9 "what's wrong" #2).
    This helper is the documented reclaim path: it lists the app-scoped
    dir under every base :func:`_iteration_scratch_root` could have
    used (``spark.analytics.scratchDir``, the OS tempdir on local
    masters, the checkpoint dir) and deletes superseded generations
    through the Hadoop FileSystem API, so the delete is real on
    hdfs://, s3a://, etc., not just local paths.

    ``keep_latest=True`` (default) keeps the most-recently-modified
    generation per base — the one backing the LAST returned frame —
    and deletes the rest.  ``keep_latest=False`` deletes every
    generation and the app-scoped dir itself; any not-yet-materialized
    DataFrame previously returned by these operators becomes invalid,
    so callers must persist/collect results they still need first.

    Returns the URIs it deleted (best-effort: unreachable bases and
    race-lost deletes are skipped silently, same stance as
    :func:`_fs_delete` — reclaim must never fail the computation).
    """
    import tempfile

    bases: list[str] = []
    conf_dir = spark.conf.get("spark.analytics.scratchDir", None)
    if conf_dir:
        bases.append(conf_dir)
    if spark.sparkContext.master.startswith("local"):
        bases.append(tempfile.gettempdir())
    try:
        chk = spark.sparkContext.getCheckpointDir()
    except Exception:
        chk = None
    if chk:
        bases.append(chk)

    app_id = spark.sparkContext.applicationId
    deleted: list[str] = []
    seen: set[str] = set()
    for base in bases:
        app_dir = os.path.join(base, f"pyspark_analytics_cc_{app_id}")
        if app_dir in seen:
            continue
        seen.add(app_dir)
        try:
            jvm = spark._jvm
            hpath = jvm.org.apache.hadoop.fs.Path(app_dir)
            fs = hpath.getFileSystem(
                spark.sparkContext._jsc.hadoopConfiguration()
            )
            if not fs.exists(hpath):
                continue
            gens = sorted(
                (s.getModificationTime(), str(s.getPath()))
                for s in fs.listStatus(hpath)
                if s.isDirectory()
            )
            victims = gens[:-1] if keep_latest and gens else gens
            for _mtime, gen in victims:
                if fs.delete(jvm.org.apache.hadoop.fs.Path(gen), True):
                    deleted.append(gen)
            if not keep_latest:
                fs.delete(hpath, True)
        except Exception:  # best-effort, like _fs_delete
            continue
    return deleted


def _cc_materialize_sym(
    spark, sym: DataFrame, scratch_root: str, big_edges: bool = False
):
    """Materialize the symmetrized edge list ONCE — as a BUCKETED,
    src-sorted table when the edge set is big (round-20 optimization,
    guide §2.4 "bucketed tables persist a partitioning across jobs" /
    VERDICT r19 next #1), else as plain coalesced parquet.

    The loop joins ``sym`` on ``src`` every round; a plain parquet
    materialization loses the layout, so at any label size past the
    broadcast threshold every round re-shuffles (and re-sorts) the
    ENTIRE edge table for the sort-merge join — log(diameter) edge
    exchanges for one edge set.  ``bucketBy(n, src).sortBy(src)``
    persists hash(src) partitioning + order in the table metadata, so
    every round's join reads the buckets with ZERO exchange and ZERO
    sort on the edge side (plan pinned by
    tests/test_plans.py::test_cc_sym_bucketed_join_no_edge_exchange);
    only the vertex-sized label table moves per round.  The up-front
    ``repartition(n, src)`` uses the same hash as the bucket spec, so
    each task holds exactly one bucket → one file per bucket (no
    small-file spray).

    The bucketed write costs one up-front edge shuffle plus a catalog
    round-trip (~0.3-0.5 s measured locally), which only pays off when
    the per-round join would otherwise exchange the edge table — i.e.
    when |E| is large.  ``spark.analytics.cc.edgeBuckets`` picks the
    policy: ``auto`` (default) buckets exactly when the union-find
    dispatch probe PROVED |E| > driverUnionFindMaxEdges (the only case
    the loop runs in production; bucket count = the session's shuffle
    partitions — on a cluster size it like any edge-table shuffle), an
    integer > 0 forces bucketing with that count (the plan-pin test
    and cluster operators who zeroed the UF cap), and ``0`` never
    buckets.

    Returns ``(df, drop_fn)``; ``drop_fn`` removes the catalog entry
    (the data files live in ``scratch_root`` and are reclaimed by the
    loop's normal scratch lifecycle)."""
    import uuid as _uuid

    sym_path = os.path.join(scratch_root, "sym")
    conf = str(spark.conf.get("spark.analytics.cc.edgeBuckets", "auto"))
    if conf == "auto":
        bucket, n_buckets = big_edges, 0
    else:
        n_buckets = int(conf)
        bucket = n_buckets > 0
    if not bucket:
        sym.coalesce(8).write.mode("overwrite").parquet(sym_path)
        # known schema: skip the re-read's footer inference (see
        # _cc_checkpoint)
        return spark.read.schema(sym.schema).parquet(sym_path), (lambda: None)
    if n_buckets <= 0:
        n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    tbl = f"pyspark_analytics_cc_sym_{_uuid.uuid4().hex[:12]}"
    (
        sym.repartition(n_buckets, "src")
        .write.mode("overwrite")
        .bucketBy(n_buckets, "src")
        .sortBy("src")
        .option("path", sym_path)
        .format("parquet")
        .saveAsTable(tbl)
    )

    def drop():
        try:
            spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        except Exception:  # cleanup must never fail the computation
            pass

    return spark.table(tbl), drop


def _cc_step(sym: DataFrame, start: DataFrame) -> DataFrame:
    """One group-min hash-to-min round (phases 1+2), lazily.  ``start``
    carries (v, label, base_label); base_label — the label at the last
    materialized state — passes through untouched so the convergence
    count can compare against it.

    Phase 2 was restructured in round 20 (guide §2.4; measured in
    OPTIMIZATION_r20.md #1).  The previous shape computed
    ``gmin = stepped.groupBy(round_old).min(c)`` and joined it back
    TWICE (through round_old and through c); with ``stepped`` lazy,
    the physical plan computed the ENTIRE phase-1 subtree — the
    edge-table join — three times per round (plan capture:
    plans/r20/cc_round_step_before.txt, 10 exchanges + 3 broadcasts).
    Now each row explodes into its two lookup keys, ONE explicit
    ``repartition(k)`` exchange feeds BOTH the group-min aggregate and
    the join probe (identical subtree → ReusedExchange, statically
    pinned with AQE off), and a vertex-keyed aggregate folds the two
    lookups back:

        label'(v) = min over v's rows of least(c, g'(k))
                  = least(c, g'(round_old), g'(c))

    where g'(k) = min(c) over ALL exploded rows keyed k.  Equivalence
    to the old two-join form, pointwise: the exploded (c → c) rows
    change g only to g'(l) = min(g(l), l·[∃u: c(u) = l]); for
    k = round_old(v), v itself is in group round_old so
    g(round_old) ≤ c(v) ≤ round_old and the extra candidate never
    wins; for k = c(v), the extra candidate is c(v) itself, already an
    argument of the outer least; and where the old form's left-join
    coalesced a missing g(c) to c, g'(c) = c exactly (v's own (c → c)
    row).  Labels and per-round convergence counts are therefore
    IDENTICAL (measured: same labels, same round count at sf0.01 — 3
    rounds — and sf0.1 — 8 rounds).  One semantic footnote: a NULL
    edge endpoint's (NULL, NULL) label row is dropped by the inner
    join (NULL never equi-matches) instead of carried inert — it never
    matched anything downstream (_attach_singletons joins on the
    caller's vertices), so outputs are unchanged; pinned incl. NULL
    endpoints by test_cc_driver_union_find_matches_loop.

    Why it matters: phase 1 (the EDGE-SIZED join + neighbor-min) now
    executes once per round instead of three times, and phase 2's
    delivery stays a partial-aggregated groupBy + equi-join — hot
    label groups (a giant component in late rounds) keep map-side
    combining and AQE skew-split, which a window-function delivery
    (measured marginally faster locally) would serialize onto one
    task at 100 TB."""
    nb = (
        sym.join(start, sym.src == start.v)
        .groupBy(F.col("dst").alias("nv"))
        .agg(F.min("label").alias("nb_min"))
    )
    stepped = start.join(nb, start.v == F.col("nv"), "left").select(
        "v",
        "base_label",
        F.col("label").alias("round_old"),
        F.least(F.col("label"), F.coalesce("nb_min", "label")).alias("c"),
    )
    ex = stepped.select(
        "v",
        "base_label",
        "c",
        F.explode(F.array("round_old", "c")).alias("k"),
    ).repartition("k")
    g = ex.groupBy("k").agg(F.min("c").alias("gm"))
    return (
        ex.join(g, "k")
        .groupBy("v")
        .agg(
            F.min(F.least(F.col("c"), F.col("gm"))).alias("label"),
            F.min("base_label").alias("base_label"),
        )
    )


def _cc_loop(
    sym: DataFrame, max_iters: int, big_edges: bool = False
) -> DataFrame:
    spark = sym.sparkSession
    scratch_root = _iteration_scratch_root(spark)
    # Materialize the symmetrized edge list ONCE (bucketed + sorted on
    # src for proven-big edge sets — see _cc_materialize_sym): the loop
    # references it every round, and without a cut each round would
    # re-execute the caller's edge-generation plan (here a self-join;
    # in the fuzzy pipeline a full LSH candidate stage) ~log(diameter)
    # times.  Also gives every round's planner exact size stats for
    # the join side.
    sym_path = os.path.join(scratch_root, "sym")
    sym, drop_sym_table = _cc_materialize_sym(
        spark, sym, scratch_root, big_edges=big_edges
    )
    # Labels start from the EDGE-INCIDENT vertex set only (derived from
    # the materialized edges — no extra pass over the caller's plan);
    # singletons rejoin in connected_components via _attach_singletons.
    # sym carries both directions, so src alone covers every endpoint.
    verts_e = sym.select(F.col("src").alias("v")).distinct()
    lab = _cc_checkpoint(
        verts_e.select(F.col("v"), F.col("v").alias("label")), scratch_root, 0
    )

    # One round per materialization.  (A GraphFrames-style
    # checkpointInterval=2 — two lazy rounds per write — was measured
    # SLOWER here: the mid-round joins plan against unmaterialized
    # intermediates with no size stats and lose the broadcast/shape
    # choices the per-round parquet stats buy, costing more than the
    # saved write.  Measured at sf0.1: 8-10 s vs 5-6 s warm.)
    #
    # The convergence count piggybacks on the checkpoint write via an
    # Observation — the metric is collected DURING the write job, so
    # each round launches exactly ONE job instead of write + count.
    # At fixture scale the count job was pure job-launch latency
    # (~0.1 s × rounds); on a cluster it saves a full re-read of the
    # label table per round.
    from pyspark.sql import Observation

    changed = 0
    try:
        for round_no in range(1, max_iters + 1):
            start = lab.select(
                "v", "label", F.col("label").alias("base_label")
            )
            once = _cc_step(sym, start)
            obs = Observation()
            observed = once.select(
                "v", F.col("base_label").alias("old_label"), "label"
            ).observe(
                obs,
                F.sum(
                    (F.col("label") != F.col("old_label")).cast("long")
                ).alias("changed"),
            )
            chk = _cc_checkpoint(observed, scratch_root, round_no)
            changed = obs.get["changed"] or 0
            lab = chk.select("v", "label")
            if changed == 0:
                break
    finally:
        # The catalog entry is metadata only; the data files follow the
        # scratch lifecycle below (and _fs_delete is idempotent).
        drop_sym_table()
    if changed != 0:
        # Nothing useful survives an unconverged run — reclaim it all.
        _fs_delete(lab.sparkSession, scratch_root)
        raise ConvergenceError(
            f"connected components did not converge within {max_iters} "
            f"group-min rounds ({changed} labels still changing); "
            "returning partial labels would silently split components"
        )
    # The edge materialization is dead once the loop exits; only the
    # final round's parquet (backing the returned frame) must survive.
    _fs_delete(lab.sparkSession, sym_path)
    return lab


def candidate_edges(d: DataFrame) -> DataFrame:
    """Near-dup candidate edges: same lang, |Δn_chars| ≤ 2, src < dst.

    Bucketed by floor(n_chars/3) with a ±1 probe on one side: any pair
    with |Δn_chars| ≤ 2 lands at most one bucket apart (width 3), so
    the blocking is SOUND — it prunes only pairs the residual would
    reject anyway, and the unblocked oracle closure still matches.
    Without this the equi-key is `lang` alone (5 distinct values):
    five giant skewed join buckets at corpus scale.  Same discipline
    as dedup_ngram_jaccard's log₅ shingle buckets above.
    """
    bkt = F.floor(F.col("n_chars") / 3)
    a = d.select(
        F.col("doc_id").alias("src"),
        F.col("lang").alias("l_a"),
        F.col("n_chars").alias("nc_a"),
        F.explode(F.array(bkt - 1, bkt, bkt + 1)).alias("bkt_a"),
    )
    b = d.select(
        F.col("doc_id").alias("dst"),
        F.col("lang").alias("l_b"),
        F.col("n_chars").alias("nc_b"),
        bkt.alias("bkt_b"),
    )
    return a.join(
        b,
        (F.col("l_a") == F.col("l_b"))
        & (F.col("bkt_a") == F.col("bkt_b"))
        & (F.abs(F.col("nc_a") - F.col("nc_b")) <= 2)
        & (F.col("src") < F.col("dst")),
    ).select("src", "dst")


@query(
    "dedup_connected_components",
    oracle="""
    WITH RECURSIVE edges AS (
        SELECT a.doc_id AS src, b.doc_id AS dst
        FROM documents a JOIN documents b
        ON a.lang = b.lang AND abs(a.n_chars - b.n_chars) <= 2
           AND a.doc_id <> b.doc_id
    ), reach(v, label) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.v
        WHERE r.label < e.dst
    )
    SELECT v AS doc_id, MIN(label) AS component
    FROM reach GROUP BY v ORDER BY doc_id
    """,
)
def q_dedup_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dup-group assignment: components of the near-dup candidate
    graph (here: same lang, n_chars within 2 — a deterministic stand-in
    for an LSH candidate edge set), labeled by smallest doc_id.

    This is the missing last mile of every fuzzy-dedup pipeline:
    MinHash/LSH emit PAIRS; transitivity must merge (a,b),(b,c) into
    one keep-group {a,b,c} even though (a,c) never scored.  The oracle
    states the same closure as a recursive CTE (label < dst pruning —
    safe because a component's min label precedes every member).

    Round-19 optimization (guide §8 — use what the optimizer cannot
    know): THIS candidate predicate is a 1-D proximity rule, so its
    graph is an interval graph over the distinct ``n_chars`` values
    within each lang.  Two docs are transitively connected iff every
    gap between consecutive distinct n_chars values on the path is
    ≤ 2 — so the closure is gap-based segmentation of the per-lang
    sorted distinct values, and NO edge set needs to exist at all.
    That matters at 100 TB far beyond the bench win: the edge-based
    formulation is QUADRATIC in docs-per-(lang, n_chars) (10⁶ docs of
    one length → 5·10¹¹ edges before the loop even starts), while this
    shape is one small aggregate + a window over (langs × distinct
    lengths) rows + one broadcast join, at any corpus size.  Result
    proven hash-identical to the recursive-CTE oracle at sf0.001/0.01/
    0.1 (OPTIMIZATION_r19.md).  The general-purpose closure for
    ARBITRARY pair sets remains :func:`connected_components` (used by
    the fuzzy pipelines; benched by the ``cc_distributed`` row).

    Docs with a NULL lang or NULL n_chars never satisfy the edge
    predicate on either engine (NULL equi-join / NULL arithmetic), so
    they are singletons: the mapping is built on non-null keys only and
    the left join's coalesce labels them with their own id."""
    t = load_tables(spark, sf_dir)
    d = t["documents"].select("doc_id", "lang", "n_chars")
    clean = d.filter(F.col("lang").isNotNull() & F.col("n_chars").isNotNull())
    # One row per distinct (lang, n_chars): the min doc_id at that value.
    per_val = clean.groupBy("lang", "n_chars").agg(
        F.min("doc_id").alias("val_min")
    )
    # Gap > 2 between consecutive distinct values starts a new segment;
    # the running gap count IS the segment id.  The window is over the
    # (langs × distinct lengths) aggregate — tiny at any corpus scale.
    w = Window.partitionBy("lang").orderBy("n_chars")
    seg = per_val.withColumn(
        "seg",
        F.sum(
            F.when(
                F.col("n_chars") - F.lag("n_chars").over(w) > 2, 1
            ).otherwise(0)
        ).over(w),
    )
    # Component label = min doc_id over the segment (min of per-value
    # minima), attached back to every (lang, n_chars) key.
    mapping = seg.withColumn(
        "component",
        F.min("val_min").over(Window.partitionBy("lang", "seg")),
    ).select("lang", "n_chars", "component")
    # The mapping's cardinality is languages × distinct document
    # lengths — usually tiny, but bounded by data, not by structure
    # (ADVICE r19: a corpus of very long documents could make it
    # millions of rows).  Round 20 drops the unconditional broadcast
    # hint and lets the planner choose: the mapping sits behind an
    # aggregate exchange, so AQE sees its TRUE runtime size and still
    # picks a broadcast join whenever it fits (verified at sf0.1: all
    # four joins stay BroadcastHashJoin, rows identical, timing equal
    # — plans/r20/dedup_connected_components_{before,after}.txt),
    # while a pathological mapping degrades to a sort-merge join
    # instead of an executor OOM.
    return (
        d.join(mapping, ["lang", "n_chars"], "left")
        .select(
            "doc_id",
            F.coalesce("component", F.col("doc_id")).alias("component"),
        )
        .orderBy("doc_id")
    )
