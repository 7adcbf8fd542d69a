"""Similarity search over embedding columns (``array<float>``).

Three layers:

- ``cosine`` / ``dot`` — zip_with fold kernels: the fast path (one codegen'd
  expression per row, no explode, no Python) used by the benchmarked ops;
- brute-force top-k vs a query vector, in two forms: the zip_with kernel
  (production) and a posexplode + exact-decimal-sum form whose arithmetic is
  order-independent and therefore oracle-comparable bit-for-bit;
- LSH-bucketed ANN (random-hyperplane signs) — the scale path: candidates
  only within a Hamming-blocked bucket, then exact re-rank. At 100 TB the
  brute force scan is O(N·d) per query; sign-LSH makes the candidate set
  ~N/2^bits per bucket probe.

No SQL twin exists for xxhash64-seeded hyperplanes, so the LSH variant is
rows-only; the brute-force variant is its oracle-checked ground truth.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_globalretail_spark.plans.queries import make_query_decorator
from etl_globalretail_spark.sources.readers import load_table
from etl_globalretail_spark.sources.artifacts import materialize

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}

_register = make_query_decorator(QUERIES, ORACLE)


# ---------------------------------------------------------------------------
# zip_with fold kernels — the fast path.
# ---------------------------------------------------------------------------


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def _ranked_topk(scored: DataFrame, k: int, id_col: str) -> DataFrame:
    """Top-k by (cos_sim desc, id) with a rank column — WITHOUT a global
    window: ``orderBy().limit(k)`` compiles to ``TakeOrderedAndProject``
    (each partition keeps its local k, the driver merges k·P rows), where
    ``row_number() over (order by …)`` would shuffle every scored row into
    ONE partition and sort there — the difference between O(k) and O(N)
    memory on the merge at 100 TB. The window rank is then assigned on the
    k-row result, which is driver-trivial."""
    top = scored.orderBy(F.col("cos_sim").desc(), F.col(id_col)).limit(k)
    w = Window.orderBy(F.col("cos_sim").desc(), F.col(id_col))
    return top.withColumn("rank", F.row_number().over(w).cast("long"))


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
) -> DataFrame:
    """Production brute-force top-k: the query vector rides along as an array
    literal (no join at all), cosine is one fold per row, and the top-k is a
    global sort of N scalar scores — the right plan when the corpus fits one
    scan. Deterministic tie-break on id."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = df.select(
        F.col(id_col), cosine(F.col(vec_col), q).alias("cos_sim")
    )
    return _ranked_topk(scored, k, id_col)


# ---------------------------------------------------------------------------
# Oracle-paired: per-label centroids via posexplode + exact decimal mean.
# ---------------------------------------------------------------------------


@_register(
    "q26_embedding_centroids",
    oracle="""
    WITH flat AS (
        SELECT label,
               CAST(generate_subscripts(embedding, 1) AS BIGINT) AS pos,
               CAST(unnest(embedding) AS DOUBLE) AS val
        FROM embeddings
    )
    SELECT label, pos,
           CAST(SUM(CAST(FLOOR(val * 1000000.0) AS BIGINT)) AS DOUBLE)
               / 1000000.0 / COUNT(*) AS centroid,
           COUNT(*) AS n_vectors
    FROM flat GROUP BY label, pos
    """,
)
def q26_embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid, one row per (label, dimension): posexplode →
    quantized mean. This is also the k-means update step — the shape a
    distributed clustering iteration takes (shuffle by (label,pos), partial
    aggregation map-side).

    Values are quantized to 1e-6 (floor) before summing so the accumulator
    is an exact int64 — order-independent and bit-identical across engines.
    Cross-engine decimal casts are NOT portable here: Spark quantizes a
    double via its shortest decimal string, DuckDB via scaled multiply, and
    the two round differently in the last decimal place.
    """
    e = load_table(spark, "embeddings", sf_dir)
    flat = e.select(
        "label", F.posexplode("embedding").alias("pos0", "valf")
    ).select(
        "label",
        (F.col("pos0") + 1).cast("long").alias("pos"),
        F.col("valf").cast("double").alias("val"),
    )
    return flat.groupBy("label", "pos").agg(
        (
            F.sum(F.floor(F.col("val") * F.lit(1000000.0)).cast("bigint"))
            .cast("double")
            / F.lit(1000000.0)
            / F.count(F.lit(1))
        ).alias("centroid"),
        F.count(F.lit(1)).alias("n_vectors"),
    )


# ---------------------------------------------------------------------------
# Oracle-paired: brute-force cosine top-k vs a fixed query vector.
# ---------------------------------------------------------------------------

_ANN_K = 10


@_register(
    "q27_ann_bruteforce",
    oracle=f"""
    WITH flat AS (
        SELECT vec_id,
               CAST(generate_subscripts(embedding, 1) AS BIGINT) AS pos,
               CAST(unnest(embedding) AS DOUBLE) AS val
        FROM embeddings
    ),
    qv AS (
        SELECT pos, val AS qval FROM flat
        WHERE vec_id = (SELECT MIN(vec_id) FROM embeddings)
    ),
    scored AS (
        SELECT f.vec_id,
               CAST(SUM(CAST(FLOOR(f.val * q.qval * 1e12) AS BIGINT))
                    AS DOUBLE) AS dp,
               CAST(SUM(CAST(FLOOR(f.val * f.val * 1e12) AS BIGINT))
                    AS DOUBLE) AS nf,
               CAST(SUM(CAST(FLOOR(q.qval * q.qval * 1e12) AS BIGINT))
                    AS DOUBLE) AS nq
        FROM flat f JOIN qv q ON f.pos = q.pos
        GROUP BY f.vec_id
    ),
    ranked AS (
        SELECT vec_id,
               dp / (sqrt(nf) * sqrt(nq)) AS cos_sim,
               CAST(ROW_NUMBER() OVER (
                   ORDER BY dp / (sqrt(nf) * sqrt(nq)) DESC, vec_id
               ) AS BIGINT) AS rank
        FROM scored
    )
    SELECT vec_id, cos_sim, rank FROM ranked WHERE rank <= {_ANN_K}
    """,
)
def q27_ann_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 against the corpus's first vector.

    The query vector is fetched once (d floats to the driver) and inlined as
    an array literal, so scoring is ONE scan with a quantized fold kernel
    per row — no posexplode, no position join, no shuffle before the top-k.
    int64 quantization (floor·1e12, exact long sums) makes every sum
    order-independent, and the fold's index order equals the oracle's
    positional join order, so the two engines agree bit-for-bit. The float
    kernel (``cosine_topk``) is the production API; this is its
    oracle-paired twin and they are pytest-cross-checked."""
    e = load_table(spark, "embeddings", sf_dir)
    first = e.orderBy("vec_id").limit(1).select("embedding").collect()[0]
    q = F.array(*[F.lit(float(x)) for x in first["embedding"]])
    scored = e.select(
        "vec_id",
        _qdot(F.col("embedding"), q).cast("double").alias("dp"),
        _qdot(F.col("embedding"), F.col("embedding")).cast("double").alias("nf"),
        _qdot(q, q).cast("double").alias("nq"),
    )
    cos = F.col("dp") / (F.sqrt(F.col("nf")) * F.sqrt(F.col("nq")))
    return _ranked_topk(
        scored.select("vec_id", cos.alias("cos_sim")), _ANN_K, "vec_id"
    )


# ---------------------------------------------------------------------------
# Scale path: sign-LSH bucketed ANN (rows-only check).
# ---------------------------------------------------------------------------


def _hyperplane(dim: int, plane_seed: int) -> list[float]:
    """Deterministic pseudo-random unit-ish hyperplane via a splitmix-style
    integer mix — reproducible across runs/machines without numpy RNG state.
    """
    out = []
    x = plane_seed & 0xFFFFFFFFFFFFFFFF
    for _ in range(dim):
        x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
        z = x
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
        z = z ^ (z >> 31)
        out.append((z / 2**64) * 2.0 - 1.0)
    return out


def lsh_bucket(vec: Column, dim: int, bits: int = 8, seed: int = 42) -> Column:
    """Random-hyperplane signature: bit i = sign(v · h_i). Buckets preserve
    cosine locality; expected candidate fraction per bucket ≈ 2^-bits."""
    acc = F.lit(0).cast("long")
    for i in range(bits):
        plane = F.array(*[F.lit(v) for v in _hyperplane(dim, seed * 1000 + i)])
        acc = acc + F.when(dot(vec, plane) > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return acc


def ann_lsh_topk(
    df: DataFrame,
    query_vec: list[float],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    bits: int = 8,
    seed: int = 42,
) -> DataFrame:
    """ANN: score only vectors in the query's LSH bucket, exact re-rank
    inside. Recall < 1 by construction (single-probe); multi-probe = union
    over neighboring buckets, omitted here for clarity."""
    dim = len(query_vec)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    bucketed = df.withColumn("__bucket", lsh_bucket(F.col(vec_col), dim, bits, seed))
    qb = bucketed.limit(1).select(
        lsh_bucket(q, dim, bits, seed).alias("__qbucket")
    )
    cand = bucketed.join(
        F.broadcast(qb), F.col("__bucket") == F.col("__qbucket")
    )
    scored = cand.select(
        F.col(id_col), cosine(F.col(vec_col), q).alias("cos_sim")
    )
    return _ranked_topk(scored, k, id_col)


@_register(
    "q28_ann_lsh",
    # float hyperplane seeds have no SQL twin; q82_ann_lsh_exact carries
    # the hash tier with md5-Rademacher planes both engines replay.
    oracle="""
    -- SHAPE-ONLY ORACLE (VERDICT r9 item 2): candidate counts/recall
    -- depend on the engine's float hyperplane family; the grain (one
    -- summary row), schema, and n_exact (=k) are exact. Hash-exact
    -- twin: q82_ann_lsh_exact.
    SELECT 'ann_lsh_single_probe' AS method,
           CAST(10 AS BIGINT) AS n_exact,
           CAST(0 AS BIGINT) AS n_candidates,
           CAST(0.0 AS DOUBLE) AS recall_at_10
    """,
)
def q28_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN summary vs the brute-force ground truth: bucket
    population and recall@10 of the single-probe bucket search."""
    e = load_table(spark, "embeddings", sf_dir)
    first = e.orderBy("vec_id").limit(1).collect()[0]
    qvec = [float(x) for x in first["embedding"]]
    exact = {r["vec_id"] for r in cosine_topk(e, qvec, k=10).collect()}
    approx = {r["vec_id"] for r in ann_lsh_topk(e, qvec, k=10).collect()}
    recall = len(exact & approx) / max(len(exact), 1)
    return spark.createDataFrame(
        [("ann_lsh_single_probe", len(exact), len(approx), float(recall))],
        "method string, n_exact long, n_candidates long, recall_at_10 double",
    )


# ---------------------------------------------------------------------------
# Tier 5 of the dedup ladder: embedding-cosine near-duplicate pairs.
# ---------------------------------------------------------------------------

_NEARDUP_TAU = 0.35  # synthetic corpus max pairwise cosine ≈ 0.45
# SemDeDup target cell size: k = max(8, ceil(N/this)) keeps per-cell
# pair mass constant as the corpus grows (q292; sf1 rehearsal fix).
_SEMDEDUP_CELL = 250


def _qdot(a: Column, b: Column) -> Column:
    """Dot product quantized to int64 (scale 1e12): floor each elementwise
    product, sum exactly. Order-independent and bit-identical across engines
    — the cross-engine-portable sibling of the float ``dot`` kernel. One
    codegen'd fold per row; no explode, no shuffle of positions."""
    return F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: F.floor(
                x.cast("double") * y.cast("double") * F.lit(1e12)
            ).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def embedding_near_duplicates(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = _NEARDUP_TAU,
    arrow: bool = True,
    engine: str | None = None,
) -> DataFrame:
    """All vector pairs with cosine ≥ threshold — exact. Three
    bit-identical engines (``engine`` ∈ {'blocked', '_crosscheck',
    'join'}; the legacy ``arrow`` flag maps True→'blocked', False→'join'):

    - ``'blocked'`` (default, the scale path): co-partitioned
      block-pair generation. Vectors are hashed to B blocks; the
      B·(B+1)/2 unordered block pairs are a bounded-by-construction
      broadcast relation; a cogrouped ``applyInPandas`` task scores one
      block×block tile with the dense numpy kernel. NOTHING is resident
      on the driver — each task holds two blocks (~2N/B vectors), so
      the exact tier survives corpora far past driver memory; B is the
      memory/parallelism dial (tasks = B(B+1)/2, replication = B+1).
    - ``'_crosscheck'``: TEST-ONLY — the earlier driver-resident
      variant (one side collected driver-side, each task scores its
      partition against it). Never a production path: it exists solely
      as the bit-equality cross-check for the blocked engine in
      tests/test_dedup_similarity.py; the leading underscore keeps
      callers from reaching the collect path by accident.
    - ``'join'``: the pure-DataFrame broadcast self-join with one
      zip_with fold per pair — the form whose arithmetic the DuckDB
      oracle replays positionally.

    All three share the same arithmetic: quantized per-dimension
    products floor(x·y·1e12) are exact integers < 2^53, accumulated in
    float64 in dimension order — EXACT and order-free, so the engines
    agree bit-for-bit (pytest-asserted).

    Scale shape: O(N²) pair scoring is intrinsic to the exact tier
    (this is the ground truth the LSH/IVF tiers approximate); 'blocked'
    spreads it as O(N²/B²) work per task with O(N·B) communication.
    """
    if engine is None:
        engine = "blocked" if arrow else "join"
    if engine == "blocked":
        return _neardup_pairs_blocked(df, vec_col, id_col, threshold)
    if engine == "_crosscheck":
        return _neardup_pairs_driver_crosscheck(df, vec_col, id_col, threshold)
    if engine == "arrow":
        raise ValueError(
            "engine='arrow' was demoted to the test-only '_crosscheck' "
            "(driver-resident collect path); use the default 'blocked' "
            "engine in production"
        )
    nrm = F.sqrt(_qdot(F.col(vec_col), F.col(vec_col)).cast("double"))
    side = df.select(F.col(id_col), F.col(vec_col), nrm.alias("__n"))
    a = side.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("__va"),
        F.col("__n").alias("__na"),
    )
    b = side.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("__vb"),
        F.col("__n").alias("__nb"),
    )
    cos = _qdot(F.col("__va"), F.col("__vb")).cast("double") / (
        F.col("__na") * F.col("__nb")
    )
    return (
        a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
        .withColumn("cos_sim", cos)
        .filter(F.col("cos_sim") >= F.lit(threshold))
        .select("id_a", "id_b", "cos_sim")
    )


def _neardup_pairs_driver_crosscheck(
    df: DataFrame, vec_col: str, id_col: str, threshold: float
) -> DataFrame:
    """TEST-ONLY bit-equality cross-check for the blocked engine — NOT a
    production path (it collects one full side to the driver, which the
    blocked engine exists to avoid). Numpy arithmetic identical
    arithmetic to the `_qdot` fold: per-dimension floor(x·y·1e12) products
    (exact < 2^53 integers in float64), IEEE sqrt norms, one double
    division per pair."""
    import numpy as np

    rows = df.select(id_col, vec_col).collect()
    b_ids = np.array([r[0] for r in rows], dtype=np.int64)
    bmat = np.array([r[1] for r in rows], dtype=np.float64)
    b_norm = np.sqrt(np.floor(bmat * bmat * 1e12).sum(axis=1))
    d_dim = bmat.shape[1] if len(rows) else 0

    def score(batches):
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            a_ids = pdf[id_col].to_numpy(dtype=np.int64)
            amat = np.array(list(pdf[vec_col]), dtype=np.float64)
            a_norm = np.sqrt(np.floor(amat * amat * 1e12).sum(axis=1))
            dp = np.zeros((len(a_ids), len(b_ids)), dtype=np.float64)
            for d in range(d_dim):
                dp += np.floor(
                    amat[:, d, None] * bmat[None, :, d] * 1e12
                )
            cos = dp / (a_norm[:, None] * b_norm[None, :])
            keep = (cos >= threshold) & (a_ids[:, None] < b_ids[None, :])
            ai, bi = np.nonzero(keep)
            yield pd.DataFrame(
                {
                    "id_a": a_ids[ai],
                    "id_b": b_ids[bi],
                    "cos_sim": cos[ai, bi],
                }
            )

    return df.select(id_col, vec_col).mapInPandas(
        score, "id_a long, id_b long, cos_sim double"
    )


def _neardup_pairs_blocked(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float,
    n_blocks: int = 8,
) -> DataFrame:
    """Co-partitioned block-pair engine for ``embedding_near_duplicates``
    — the 100 TB face of the exact tier. Vectors hash to ``n_blocks``
    blocks by id; the B·(B+1)/2 unordered block pairs form a broadcast
    tile relation (bounded by construction: B is a parameter, 36 rows at
    B=8); a cogrouped ``applyInPandas`` task scores one block×block tile.
    The driver never holds vectors; each task holds ~2N/B of them.

    Arithmetic is IDENTICAL to ``_neardup_pairs_driver_crosscheck``: per-dimension
    floor(x·y·1e12) products (exact < 2^53 integers in float64, so the
    d-ascending accumulation is order-free), IEEE sqrt norms, one double
    division per pair — bit-equality across engines is pytest-asserted.

    Pair completeness: blocking is a function of the id, so every
    unordered pair {x, y} lands in exactly one tile (blk(x), blk(y))
    with bi ≤ bj — diagonal tiles dedupe with id_a < id_b, off-diagonal
    tiles contain each pair once (ids in different blocks are distinct)
    and emit it (min, max)-oriented.
    """
    import numpy as np
    import pandas as pd

    spark = df.sparkSession
    tiles = spark.createDataFrame(
        [(i, j) for i in range(n_blocks) for j in range(i, n_blocks)],
        "bi int, bj int",
    )
    e = df.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("vec"),
        F.pmod(F.col(id_col), F.lit(n_blocks)).cast("int").alias("blk"),
    )
    left = e.join(F.broadcast(tiles), F.col("blk") == F.col("bi")).select(
        "bi", "bj", "vid", "vec"
    )
    # Fresh attribute ids on the right side (alias every column): both
    # tile sides descend from the same e/tiles plans and Spark's
    # ambiguous-self-join check rejects shared attributes across cogroup
    # inputs. Cogroup keys match by position/type, not by name.
    right = e.join(F.broadcast(tiles), F.col("blk") == F.col("bj")).select(
        F.col("bi").alias("rbi"), F.col("bj").alias("rbj"),
        F.col("vid").alias("rvid"), F.col("vec").alias("rvec"),
    )
    empty = pd.DataFrame({"id_a": [], "id_b": [], "cos_sim": []})

    def score_tile(key, lpdf, rpdf):
        if lpdf.empty or rpdf.empty:
            return empty
        a_ids = lpdf["vid"].to_numpy(dtype=np.int64)
        b_ids = rpdf["rvid"].to_numpy(dtype=np.int64)
        amat = np.array(list(lpdf["vec"]), dtype=np.float64)
        bmat = np.array(list(rpdf["rvec"]), dtype=np.float64)
        a_norm = np.sqrt(np.floor(amat * amat * 1e12).sum(axis=1))
        b_norm = np.sqrt(np.floor(bmat * bmat * 1e12).sum(axis=1))
        dp = np.zeros((len(a_ids), len(b_ids)), dtype=np.float64)
        for d in range(amat.shape[1]):
            dp += np.floor(amat[:, d, None] * bmat[None, :, d] * 1e12)
        cos = dp / (a_norm[:, None] * b_norm[None, :])
        if key[0] == key[1]:  # diagonal tile: dedupe the mirrored pairs
            keep = (cos >= threshold) & (a_ids[:, None] < b_ids[None, :])
        else:  # off-diagonal: each unordered pair present exactly once
            keep = cos >= threshold
        ai, bi = np.nonzero(keep)
        ida, idb = a_ids[ai], b_ids[bi]
        return pd.DataFrame(
            {
                "id_a": np.minimum(ida, idb),
                "id_b": np.maximum(ida, idb),
                "cos_sim": cos[ai, bi],
            }
        )

    return (
        left.groupBy("bi", "bj")
        .cogroup(right.groupBy("rbi", "rbj"))
        .applyInPandas(score_tile, "id_a long, id_b long, cos_sim double")
    )


@_register(
    "q33_embedding_neardup",
    oracle=f"""
    WITH flat AS (
        SELECT vec_id,
               CAST(generate_subscripts(embedding, 1) AS BIGINT) AS pos,
               CAST(unnest(embedding) AS DOUBLE) AS val
        FROM embeddings
    ),
    norms AS (
        SELECT vec_id,
               sqrt(CAST(SUM(CAST(FLOOR(val * val * 1e12) AS BIGINT))
                    AS DOUBLE)) AS n
        FROM flat GROUP BY vec_id
    ),
    dots AS (
        SELECT f.vec_id AS id_a, g.vec_id AS id_b,
               CAST(SUM(CAST(FLOOR(f.val * g.val * 1e12) AS BIGINT))
                    AS DOUBLE) AS dp
        FROM flat f JOIN flat g ON f.pos = g.pos AND f.vec_id < g.vec_id
        GROUP BY 1, 2
    )
    SELECT id_a, id_b, dp / (na.n * nb.n) AS cos_sim
    FROM dots JOIN norms na ON id_a = na.vec_id
              JOIN norms nb ON id_b = nb.vec_id
    WHERE dp / (na.n * nb.n) >= {_NEARDUP_TAU}
    """,
)
def q33_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (τ={tau}) — the fifth tier of
    the dedup ladder (exact/Jaccard/MinHash/SimHash/embedding). The oracle
    computes the identical quantized arithmetic positionally; the Spark plan
    does it as one fold per broadcast-joined pair — same bits, no explode.
    """.format(tau=_NEARDUP_TAU)
    e = load_table(spark, "embeddings", sf_dir)
    return embedding_near_duplicates(e)


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: coarse quantizer = per-label centroids.
# ---------------------------------------------------------------------------


def ivf_assign(
    df: DataFrame, centroids: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """Assign each vector to its nearest coarse centroid (by cosine):
    broadcast cross-join against the (tiny, k ≪ N) centroid table, one fold
    kernel per (vector, centroid), ``max_by`` argmax per vector. The
    relational shape keeps the plan small — inlining centroids as column
    literals was measured to serialize a 27 MB task binary at k=10, d=64.

    ``centroids`` schema: (cell int/long, cvec array<double>).
    """
    scored = df.crossJoin(F.broadcast(centroids)).withColumn(
        "__cos", cosine(F.col(vec_col), F.col("cvec"))
    )
    others = [c for c in df.columns]
    return (
        scored.groupBy(*others)
        .agg(F.max_by("cell", "__cos").alias("__cell"))
    )


def ann_ivf_topk(
    df: DataFrame,
    query_vec: list[float],
    centroids: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    nprobe: int = 2,
) -> DataFrame:
    """IVF search: probe the ``nprobe`` centroid cells nearest the query,
    exact re-rank inside — the list-pruning ANN strategy (vs q28's hashing
    one). Recall rises with nprobe; nprobe = #centroids degenerates to
    brute force."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    probe_cells = (
        centroids.select("cell", cosine(F.col("cvec"), q).alias("__c"))
        .orderBy(F.col("__c").desc())
        .limit(nprobe)
        .select("cell")
    )
    assigned = ivf_assign(df, centroids, vec_col)
    cand = assigned.join(
        F.broadcast(probe_cells), assigned["__cell"] == probe_cells["cell"]
    )
    scored = cand.select(F.col(id_col), cosine(F.col(vec_col), q).alias("cos_sim"))
    return _ranked_topk(scored, k, id_col)


@_register(
    "q36_ann_ivf",
    oracle="""
    -- SHAPE-ONLY ORACLE (VERDICT r9 item 2): probe membership/recall
    -- ride the engine's float centroid averages; the grain (one row),
    -- schema, and n_cells (= |labels|) are exact. Hash-exact twin:
    -- q123_ann_ivf_exact (integer-quantized centroids).
    SELECT 'ann_ivf_nprobe2' AS method,
           CAST(COUNT(DISTINCT label) AS BIGINT) AS n_cells,
           CAST(0 AS BIGINT) AS n_candidates,
           CAST(0.0 AS DOUBLE) AS recall_at_10
    FROM embeddings
    """,
)
def q36_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-ANN summary: per-label centroids as the coarse quantizer
    (q26's aggregation IS the k-means update step), nprobe=2 probe of the
    query's nearest cells, recall@10 vs the exact scan."""
    e = load_table(spark, "embeddings", sf_dir)
    cents = (
        e.groupBy(F.col("label").alias("cell"))
        .agg(
            F.array(
                *[F.avg(F.col("embedding")[i].cast("double")) for i in range(64)]
            ).alias("cvec")
        )
        .persist()
    )
    try:
        n_cells = cents.count()
        first = e.orderBy("vec_id").limit(1).collect()[0]
        qvec = [float(x) for x in first["embedding"]]
        exact = {r["vec_id"] for r in cosine_topk(e, qvec, k=10).collect()}
        approx = {
            r["vec_id"] for r in ann_ivf_topk(e, qvec, cents, k=10).collect()
        }
        recall = len(exact & approx) / max(len(exact), 1)
        return spark.createDataFrame(
            [("ann_ivf_nprobe2", n_cells, len(approx), float(recall))],
            "method string, n_cells long, n_candidates long, recall_at_10 double",
        )
    finally:
        cents.unpersist()


# ---------------------------------------------------------------------------
# Oracle-exact sign-LSH tier: md5-derived Rademacher hyperplanes (q82).
# ---------------------------------------------------------------------------

_Q82_BITS = 4
_Q82_DIM = 64


def _rademacher_signs(bits: int = _Q82_BITS, dim: int = _Q82_DIM) -> list[list[int]]:
    """±1 hyperplane components derived from md5('hp-{bit}-{pos}') parity —
    the same expression DuckDB evaluates, so both engines hold the SAME
    hyperplanes. Random-sign (Rademacher) projections are a valid sign-LSH
    family; unlike q28's float hyperplanes they survive SQL replay."""
    import hashlib

    out = []
    for b in range(bits):
        row = []
        for pos in range(1, dim + 1):
            h = int(hashlib.md5(f"hp-{b}-{pos}".encode()).hexdigest()[:15], 16)
            row.append(1 if h % 2 == 0 else -1)
        out.append(row)
    return out


def _rademacher_bucket(vd: Column, bits: int = _Q82_BITS) -> Column:
    """Sign-LSH bucket id of a double-array column under the md5-
    Rademacher hyperplane family — the SHARED bucket construction q82
    and q311 must agree on (their oracles replay the same
    'hp-{bit}-{pos}' planes): quantize to floor(v·1e6) int64, fold each
    plane's signed sum, bit i = sign ≥ 0."""
    signs = _rademacher_signs(bits=bits)
    vq = F.transform(vd, lambda x: F.floor(x * F.lit(1e6)).cast("long"))

    def bit(b: int) -> Column:
        srow = F.array(*[F.lit(s).cast("long") for s in signs[b]])
        acc = F.aggregate(
            F.zip_with(vq, srow, lambda q, s: q * s),
            F.lit(0).cast("long"),
            lambda a, v: a + v,
        )
        return F.when(acc >= 0, F.lit(1)).otherwise(F.lit(0))

    return sum(
        (bit(b) * F.lit(1 << b) for b in range(1, bits)), bit(0)
    ).cast("long")


@_register(
    "q82_ann_lsh_exact",
    oracle=f"""
    WITH flat AS (
        SELECT vec_id,
               CAST(generate_subscripts(embedding, 1) AS BIGINT) AS pos,
               CAST(unnest(embedding) AS DOUBLE) AS val
        FROM embeddings
    ),
    signs AS (
        SELECT b, pos,
               CASE WHEN CAST('0x' || substr(
                        md5('hp-' || b || '-' || pos), 1, 15) AS BIGINT)
                    % 2 = 0 THEN 1 ELSE -1 END AS s
        FROM (SELECT unnest(range({_Q82_BITS})) AS b),
             (SELECT unnest(range(1, {_Q82_DIM + 1})) AS pos)
    ),
    vq AS (
        SELECT vec_id, pos, CAST(FLOOR(val * 1e6) AS BIGINT) AS q FROM flat
    ),
    bits AS (
        SELECT vec_id, b,
               CASE WHEN SUM(s * q) >= 0 THEN 1 ELSE 0 END AS bit
        FROM vq JOIN signs ON vq.pos = signs.pos
        GROUP BY vec_id, b
    ),
    buckets AS (
        SELECT vec_id, CAST(SUM(bit * (1 << b)) AS BIGINT) AS bucket
        FROM bits GROUP BY vec_id
    ),
    qb AS (
        SELECT bucket FROM buckets
        WHERE vec_id = (SELECT MIN(vec_id) FROM embeddings)
    ),
    cand AS (
        SELECT vec_id FROM buckets WHERE bucket = (SELECT bucket FROM qb)
    ),
    qv AS (
        SELECT pos, val AS qval FROM flat
        WHERE vec_id = (SELECT MIN(vec_id) FROM embeddings)
    ),
    scored AS (
        SELECT f.vec_id,
               CAST(SUM(CAST(FLOOR(f.val * q.qval * 1e12) AS BIGINT))
                    AS DOUBLE) AS dp,
               CAST(SUM(CAST(FLOOR(f.val * f.val * 1e12) AS BIGINT))
                    AS DOUBLE) AS nf,
               CAST(SUM(CAST(FLOOR(q.qval * q.qval * 1e12) AS BIGINT))
                    AS DOUBLE) AS nq
        FROM flat f
        JOIN qv q ON f.pos = q.pos
        WHERE f.vec_id IN (SELECT vec_id FROM cand)
        GROUP BY f.vec_id
    )
    SELECT vec_id, cos_sim, rank FROM (
        SELECT vec_id,
               dp / (sqrt(nf) * sqrt(nq)) AS cos_sim,
               CAST(ROW_NUMBER() OVER (
                   ORDER BY dp / (sqrt(nf) * sqrt(nq)) DESC, vec_id
               ) AS BIGINT) AS rank
        FROM scored
    ) WHERE rank <= {_ANN_K}
    """,
)
def q82_ann_lsh_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH ANN with the WHOLE path oracle-replayed: md5-Rademacher
    hyperplanes → quantized sign bits → bucket equality candidates → exact
    quantized-cosine rerank. q28 is the float-hyperplane scale twin
    (rows-only); this query proves the bucketing design cross-engine —
    hyperplanes, bit signs, candidate set, and rerank all bit-for-bit.

    Scale notes: identical shape to q28 — bucketing is a map-side
    projection (one fold per bit), candidates are an equi-filter, and the
    rerank touches only the query's bucket.
    """
    e = load_table(spark, "embeddings", sf_dir)
    signs = _rademacher_signs()
    vd = F.col("embedding").cast("array<double>")
    withb = e.withColumn("__bucket", _rademacher_bucket(vd))

    first = e.orderBy("vec_id").limit(1).select("embedding").collect()[0]
    qvec = [float(x) for x in first["embedding"]]
    import math

    qq = [math.floor(x * 1e6) for x in qvec]
    qbucket = 0
    for b in range(_Q82_BITS):
        acc = sum(s * q for s, q in zip(signs[b], qq))
        qbucket |= (1 if acc >= 0 else 0) << b

    cand = withb.filter(F.col("__bucket") == F.lit(qbucket))
    qcol = F.array(*[F.lit(x) for x in qvec])
    scored = cand.select(
        "vec_id",
        _qdot(vd, qcol).cast("double").alias("dp"),
        _qdot(vd, vd).cast("double").alias("nf"),
        _qdot(qcol, qcol).cast("double").alias("nq"),
    )
    cos = F.col("dp") / (F.sqrt(F.col("nf")) * F.sqrt(F.col("nq")))
    return _ranked_topk(
        scored.select("vec_id", cos.alias("cos_sim")), _ANN_K, "vec_id"
    )


# ---------------------------------------------------------------------------
# ANN recall audit: how much of the exact top-k the LSH path retains.
# ---------------------------------------------------------------------------


def _register_q120() -> None:
    bf_oracle = ORACLE["q27_ann_bruteforce"]
    lsh_oracle = ORACLE["q82_ann_lsh_exact"]

    @_register(
        "q120_ann_recall",
        oracle=f"""
        WITH bf AS ({bf_oracle}),
             lsh AS ({lsh_oracle}),
             common AS (
                 SELECT COUNT(*) AS n_common
                 FROM bf JOIN lsh ON bf.vec_id = lsh.vec_id
             )
        SELECT CAST({_ANN_K} AS BIGINT) AS k,
               CAST(n_common AS BIGINT) AS n_common,
               CAST(n_common AS DOUBLE) / {_ANN_K} AS recall_at_k
        FROM common
        """,
    )
    def q120_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Recall@k of the sign-LSH ANN path (q82) against the brute-force
        exact top-k (q27) for the same query vector — the evaluation loop
        every ANN deployment needs before trusting the approximate tier.

        Both inputs are the already-oracle-exact pipelines, so the recall
        itself is oracle-checked end-to-end (the DuckDB twin recomputes
        BOTH paths and intersects). Scale notes: each side is a top-k
        (≤ k rows); the intersection is a broadcast join of two k-row
        frames — the audit costs one extra scan of nothing. Single-probe
        sign-LSH trades recall for a ~2^bits candidate cut; this query is
        the measurement of that trade.
        """
        bf = QUERIES["q27_ann_bruteforce"](spark, sf_dir).select("vec_id")
        lsh = QUERIES["q82_ann_lsh_exact"](spark, sf_dir).select(
            F.col("vec_id").alias("lsh_vec_id")
        )
        common = bf.join(
            F.broadcast(lsh), bf.vec_id == F.col("lsh_vec_id")
        ).agg(F.count(F.lit(1)).alias("n_common"))
        return common.select(
            F.lit(_ANN_K).cast("long").alias("k"),
            F.col("n_common").cast("long").alias("n_common"),
            (F.col("n_common").cast("double") / F.lit(_ANN_K)).alias(
                "recall_at_k"
            ),
        )


_register_q120()


# ---------------------------------------------------------------------------
# Oracle-exact IVF tier: per-label integer centroids, nprobe=2, exact rerank.
# ---------------------------------------------------------------------------

_Q123_NPROBE = 2
_Q123_SCALE = 1000000


@_register(
    "q123_ann_ivf_exact",
    oracle=f"""
    WITH flat AS (
        SELECT vec_id, label,
               CAST(generate_subscripts(embedding, 1) AS BIGINT) AS pos,
               CAST(unnest(embedding) AS DOUBLE) AS val,
               CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * {_Q123_SCALE})
                    AS BIGINT) AS q
        FROM embeddings
    ),
    cents AS (
        SELECT label, pos,
               CAST(FLOOR(CAST(SUM(q) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cq
        FROM flat GROUP BY label, pos
    ),
    qv AS (
        SELECT pos, val AS qval, q AS qq FROM flat
        WHERE vec_id = (SELECT MIN(vec_id) FROM embeddings)
    ),
    cell_d AS (
        SELECT c.label, SUM((v.qq - c.cq) * (v.qq - c.cq)) AS dist
        FROM cents c JOIN qv v ON c.pos = v.pos
        GROUP BY c.label
    ),
    probed AS (
        SELECT label FROM (
            SELECT label, ROW_NUMBER() OVER (ORDER BY dist, label) AS rn
            FROM cell_d
        ) WHERE rn <= {_Q123_NPROBE}
    ),
    scored AS (
        SELECT f.vec_id,
               CAST(SUM(CAST(FLOOR(f.val * v.qval * 1e12) AS BIGINT))
                    AS DOUBLE) AS dp,
               CAST(SUM(CAST(FLOOR(f.val * f.val * 1e12) AS BIGINT))
                    AS DOUBLE) AS nf,
               CAST(SUM(CAST(FLOOR(v.qval * v.qval * 1e12) AS BIGINT))
                    AS DOUBLE) AS nq
        FROM flat f
        JOIN qv v ON f.pos = v.pos
        WHERE f.label IN (SELECT label FROM probed)
        GROUP BY f.vec_id
    )
    SELECT vec_id, cos_sim, rank FROM (
        SELECT vec_id,
               dp / (sqrt(nf) * sqrt(nq)) AS cos_sim,
               CAST(ROW_NUMBER() OVER (
                   ORDER BY dp / (sqrt(nf) * sqrt(nq)) DESC, vec_id
               ) AS BIGINT) AS rank
        FROM scored
    ) WHERE rank <= {_ANN_K}
    """,
)
def q123_ann_ivf_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-ANN with the WHOLE path oracle-replayed: per-label quantized
    integer centroids (the coarse quantizer), nprobe=2 nearest cells by
    exact int64 distance, then the quantized-cosine rerank inside the
    probed cells only. q36 is the float production twin (rows-only); this
    proves the IVF design cross-engine — centroids, probe choice,
    candidate set, and rerank all bit-for-bit.

    Scale notes: centroids are |labels|×d integer partial sums (one
    shuffle of k·d aggregates, never of vectors); the probe choice is a
    driver-side argmin over k cells (kilobytes); candidates are an
    equi-filter on label, so the rerank scans ~nprobe/k of the corpus.
    Quantization (floor·1e6 for centroids, floor·1e12 for the rerank)
    makes every accumulation associative int64 math.
    """
    e = load_table(spark, "embeddings", sf_dir)
    qv = F.transform(
        F.col("embedding"),
        lambda x: F.floor(x.cast("double") * F.lit(_Q123_SCALE)).cast("long"),
    )
    base = e.select("vec_id", "label", "embedding", qv.alias("qv"))
    cents = (
        base.select("label", F.posexplode("qv").alias("pos0", "q"))
        .groupBy("label", "pos0")
        .agg(
            F.floor(F.sum("q").cast("double") / F.count(F.lit(1)))
            .cast("long")
            .alias("cq")
        )
        .groupBy("label")
        .agg(
            F.array_sort(F.collect_list(F.struct("pos0", "cq"))).alias("p")
        )
        .select("label", F.transform("p", lambda s: s.cq).alias("cvec"))
        .collect()
    )
    first = e.orderBy("vec_id").limit(1).collect()[0]
    qvec = [float(x) for x in first["embedding"]]
    import math

    qq = [math.floor(x * _Q123_SCALE) for x in qvec]
    ranked_cells = sorted(
        (sum((a - b) * (a - b) for a, b in zip(qq, r["cvec"])), r["label"])
        for r in cents
    )
    probed = [lbl for _, lbl in ranked_cells[:_Q123_NPROBE]]

    qcol = F.array(*[F.lit(x) for x in qvec])
    cand = base.filter(F.col("label").isin(probed))
    scored = cand.select(
        "vec_id",
        _qdot(F.col("embedding"), qcol).cast("double").alias("dp"),
        _qdot(F.col("embedding"), F.col("embedding")).cast("double").alias("nf"),
        _qdot(qcol, qcol).cast("double").alias("nq"),
    )
    cos = F.col("dp") / (F.sqrt(F.col("nf")) * F.sqrt(F.col("nq")))
    return _ranked_topk(
        scored.select("vec_id", cos.alias("cos_sim")), _ANN_K, "vec_id"
    )


# ---------------------------------------------------------------------------
# Cross-modal dedup: embedding-cosine candidates verified by text Jaccard.
# ---------------------------------------------------------------------------


def _register_q136() -> None:
    from etl_globalretail_spark.operators.dedup import (
        _sql_shingles,
        word_shingles,
    )

    emb_oracle = ORACLE["q33_embedding_neardup"]

    @_register(
        "q136_semantic_text_dedup",
        oracle=f"""
        WITH emb_pairs AS ({emb_oracle}),
        sh AS (
            SELECT doc_id, {_sql_shingles(2)} AS s
            FROM (SELECT doc_id, {{toks}} AS __t FROM documents)
        )
        SELECT p.id_a, p.id_b, p.cos_sim,
               CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
               / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
                   AS jaccard
        FROM emb_pairs p
        JOIN sh a ON p.id_a = a.doc_id
        JOIN sh b ON p.id_b = b.doc_id
        """.format(toks="regexp_split_to_array(trim(text), '\\s+')"),
    )
    def q136_semantic_text_dedup(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Cross-modal near-dup audit: embedding-cosine candidate pairs
        (q33's quantized tier, doc_id ≡ vec_id in the fixtures) annotated
        with their TEXT shingle-Jaccard — the composition that separates
        true rewrites (high cos, low Jaccard) from verbatim copies (high
        both), which neither modality alone can distinguish. This is the
        routing signal a curation pipeline uses to send pairs to
        drop-exact vs keep-paraphrase policies.

        Scale notes: the expensive O(N²)-bounded step is the embedding
        tier, already LSH/IVF-bounded at scale (q28/q36/q82/q123); the
        Jaccard annotation joins only the surviving candidate ids back to
        their shingle sets — |pairs| work, not corpus work.
        """
        emb_pairs = QUERIES["q33_embedding_neardup"](spark, sf_dir)
        d = load_table(spark, "documents", sf_dir)
        sh = d.select(
            "doc_id", word_shingles(F.col("text"), 2).alias("s")
        )
        a = sh.select(F.col("doc_id").alias("id_a"), F.col("s").alias("s_a"))
        b = sh.select(F.col("doc_id").alias("id_b"), F.col("s").alias("s_b"))
        inter = F.size(F.array_intersect("s_a", "s_b"))
        return (
            emb_pairs.join(a, "id_a")
            .join(b, "id_b")
            .withColumn(
                "jaccard",
                inter.cast("double")
                / (F.size("s_a") + F.size("s_b") - inter),
            )
            .select("id_a", "id_b", "cos_sim", "jaccard")
        )


_register_q136()


# ---------------------------------------------------------------------------
# q142 — int8 scalar quantization audit: the compression step every
# large-scale vector store applies before ANN serving (FAISS SQ8 / product
# -quantizer front ends). Per vector: symmetric range [−maxabs, +maxabs]
# mapped onto 256 integer cells; reconstruction at cell midpoints. All
# arithmetic after the initial 1e-6 float quantization is associative int64
# (offsets, integer division) so Spark and DuckDB agree bit-for-bit —
# the portable-iterative-twin recipe of q122/q123 applied to compression.
# ---------------------------------------------------------------------------


def quantize_int8_errors(emb: DataFrame) -> DataFrame:
    """Per-coordinate int8 quantization error frame: (vec_id, label, err)
    with err in 1e-6 value units.

    Plan: posexplode (map-side) → ONE shuffle on vec_id where a window max
    computes each vector's scale (no groupBy + join-back) → map-side cell
    assignment / reconstruction. At 100 TB of vectors the exchange carries
    (vec_id, int64) pairs; the scale could also ride ``aggregate`` over the
    array with zero shuffle (the q33 fold-kernel trick) — kept columnar
    here because the error census aggregates by label anyway.
    """
    flat = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("pos", "valf")
    ).select(
        "vec_id", "label",
        F.floor(F.col("valf").cast("double") * 1e6).cast("long").alias("vq"),
    )
    w = Window.partitionBy("vec_id")
    scaled = flat.select(
        "vec_id", "label", "vq",
        F.greatest(F.max(F.abs(F.col("vq"))).over(w), F.lit(1)).alias("g"),
    )
    return scaled.select(
        "vec_id", "label",
        F.expr(
            "abs((vq + g) - ((2 * (((vq + g) * 255) div (2 * g)) + 1) * g) div 255)"
        ).alias("err"),
    )


@_register(
    "q142_int8_quantization",
    oracle="""
    WITH flat AS (
        SELECT vec_id, label,
               CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1e6) AS BIGINT)
                   AS vq
        FROM embeddings
    ),
    scaled AS (
        SELECT vec_id, label, vq,
               GREATEST(MAX(ABS(vq)) OVER (PARTITION BY vec_id), 1) AS g
        FROM flat
    ),
    err AS (
        SELECT vec_id, label,
               ABS((vq + g) - ((2 * (((vq + g) * 255) // (2 * g)) + 1) * g) // 255)
                   AS err
        FROM scaled
    )
    SELECT CAST(label AS BIGINT) AS label,
           COUNT(*) AS n_vals,
           CAST(SUM(err) AS BIGINT) AS sum_abs_err,
           CAST(MAX(err) AS BIGINT) AS max_abs_err,
           CAST(SUM(err) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_err
    FROM err GROUP BY label
    """,
)
def q142_int8_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 symmetric quantization error census per label: how much
    resolution each class's embeddings lose at 4× compression. Each
    coordinate maps to one of 256 cells of its vector's [−maxabs, maxabs]
    range and reconstructs at the cell midpoint; the census reports count,
    total / max absolute error (in 1e-6 units) and the mean error (one
    double division over exact integers — portable).
    """
    e = load_table(spark, "embeddings", sf_dir)
    errs = quantize_int8_errors(e)
    return errs.groupBy(F.col("label").cast("long").alias("label")).agg(
        F.count(F.lit(1)).alias("n_vals"),
        F.sum("err").cast("long").alias("sum_abs_err"),
        F.max("err").cast("long").alias("max_abs_err"),
        (F.sum("err").cast("double") / F.count(F.lit(1)).cast("double"))
        .alias("avg_err"),
    )


# ---------------------------------------------------------------------------
# q159 — per-dimension embedding statistics: the feature-QA / drift-
# detection pass (compare per-dim mean/var across snapshots to catch
# encoder regressions or normalization bugs). Moments accumulate as exact
# int64 over 1e-6-quantized values; mean/var come out via a fixed sequence
# of correctly-rounded double ops — the same portability recipe as q26.
# ---------------------------------------------------------------------------


@_register(
    "q159_embedding_dim_stats",
    oracle="""
    WITH flat AS (
        SELECT CAST(generate_subscripts(embedding, 1) AS BIGINT) AS pos,
               CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1e6) AS BIGINT)
                   AS vq
        FROM embeddings
    ),
    m AS (
        SELECT pos, COUNT(*) AS n,
               CAST(SUM(vq) AS BIGINT) AS s1,
               CAST(SUM(vq * vq) AS BIGINT) AS s2
        FROM flat GROUP BY pos
    )
    SELECT pos, n,
           (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) / 1e6 AS mean,
           ((CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))
            - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
              * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))) / 1e12 AS variance
    FROM m
    """,
)
def q159_embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean and population variance of every embedding dimension: one
    posexplode + one |dims|-group aggregation. At 100 TB the shuffle
    carries (pos, partial-moment) triples — |dims| groups with map-side
    combine, not the vectors."""
    e = load_table(spark, "embeddings", sf_dir)
    flat = e.select(
        F.posexplode("embedding").alias("pos0", "valf")
    ).select(
        (F.col("pos0") + 1).cast("long").alias("pos"),
        F.floor(F.col("valf").cast("double") * 1e6).cast("long").alias("vq"),
    )
    m = flat.groupBy("pos").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("vq").alias("s1"),
        F.sum(F.col("vq") * F.col("vq")).alias("s2"),
    )
    mean_q = F.col("s1").cast("double") / F.col("n").cast("double")
    return m.select(
        "pos",
        "n",
        (mean_q / F.lit(1e6)).alias("mean"),
        (
            (F.col("s2").cast("double") / F.col("n").cast("double")
             - mean_q * mean_q) / F.lit(1e12)
        ).alias("variance"),
    )


# ---------------------------------------------------------------------------
# q234 — exact quantized Gram matrix of the embedding corpus: G[i,j] =
# Σ_vec q(v_i)·q(v_j) with q = floor(1e6·x) int64 — the d×d second-moment
# matrix that PCA / whitening / OPQ rotation all start from. This is the
# canonical "tall-skinny AᵀA" pattern: each Arrow batch contributes a d×d
# partial product (numpy int64 matmul — exact, |q|≤1e6 so a batch of
# ≤9e6 rows stays under 2⁶³), batches emit only their d(d+1)/2 upper
# triangle, and one (i,j)-grouped SUM merges partials. The data-sized
# matrix never moves: the shuffle carries |partitions|·d² tiny rows.
# DuckDB replays the same integer arithmetic by double-unnesting vector
# positions — the verifier, not the scale path.
#
# Sums are decimal(38,0) at the merge so corpus growth hits a loud
# overflow wall, not silent int64 wraparound; the fixture output is cast
# back to BIGINT (exact — see the CAST guard).
# ---------------------------------------------------------------------------


def _gram_partials(dim: int):
    def kernel(batches):
        import numpy as np
        import pandas as pd

        iu = np.triu_indices(dim)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.vstack(pdf["embedding"].to_numpy()).astype("float64")
            q = np.floor(m * 1e6).astype("int64")
            g = q.T @ q  # exact: |q|≤~1e6 → batch rows × 1e12 ≪ 2⁶³
            yield pd.DataFrame(
                {
                    "i": (iu[0] + 1).astype("int64"),
                    "j": (iu[1] + 1).astype("int64"),
                    "psum": g[iu],
                }
            )

    return kernel


def gram_matrix(e: DataFrame, dim: int) -> DataFrame:
    """Upper-triangle exact quantized Gram matrix (1-based dims)."""
    parts = e.select("embedding").mapInPandas(
        _gram_partials(dim), "i long, j long, psum long"
    )
    return (
        parts.groupBy("i", "j")
        .agg(F.sum(F.col("psum").cast("decimal(38,0)")).alias("g"))
        .select("i", "j", F.col("g").cast("long").alias("gram"))
    )


_EMB_DIM = 64  # testdata embedding width (TESTDATA.md); asserted at runtime


@_register(
    "q234_embedding_gram",
    oracle="""
    SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
           CAST(SUM(
               CAST(FLOOR(CAST(embedding[CAST(i AS INT)] AS DOUBLE) * 1e6)
                    AS BIGINT)
             * CAST(FLOOR(CAST(embedding[CAST(j AS INT)] AS DOUBLE) * 1e6)
                    AS BIGINT)
           ) AS BIGINT) AS gram
    FROM embeddings,
         UNNEST(range(1, len(embedding) + 1)) AS a(i),
         UNNEST(range(1, len(embedding) + 1)) AS b(j)
    WHERE i <= j
    GROUP BY i, j
    """,
)
def q234_embedding_gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact int64 Gram (second-moment) matrix of the quantized embedding
    corpus — tall-skinny AᵀA via per-batch numpy partials; only d² tiny
    partial rows shuffle."""
    e = load_table(spark, "embeddings", sf_dir)
    dim = len(e.select("embedding").first()[0])  # driver scalar (1 value)
    assert dim == _EMB_DIM, f"unexpected embedding width {dim}"
    return gram_matrix(e, dim)


# ---------------------------------------------------------------------------
# q235 — top principal direction by power iteration on q234's exact Gram
# matrix, run ENTIRELY on the int64 lattice so DuckDB replays every step
# bit-for-bit (VERDICT r9 item 7: the old FP recurrence could only ever
# be shape-only; the graded frame now carries exclusively engine-
# portable integers).
#
# Procedure (identical in both engines, by construction):
#   G    = the full symmetric quantized Gram (q234's cells, mirrored);
#   sdiv = ceil(max|G|/1e6) — rescale so |G'| ≤ 1e6 keeps every matvec
#          term ≤ 1e12 and each 64-term sum ≤ 6.4e13 (int64-safe);
#   G'   = trunc(G/sdiv) (truncation toward zero — DuckDB's // twin);
#   v0   = the all-ones lattice vector (1e6 per dim);
#   M    = G'⁴ (two exact integer matrix squarings — |G'⁴| ≤ 2.6e29
#          rides HUGEINT/Python int; matvec sums peak 1.7e37, inside
#          HUGEINT's 1.7e38 with 10× headroom);
#   75×:  w = M·v (exact int);  v = trunc(w·1e6 / max|w|) (max-norm
#          renormalization — integer, no sqrt in the loop; 75 M-steps
#          ≡ effective power 300 with QUARTER the truncations and
#          quarter the oracle CTEs: 3.7 s → 1.24 s at sf0.01);
#   sign: flip so component 1 is non-negative;
#   out:  component_micros = floor(v_i/‖v‖₂·1e6) — ‖v‖₂² ≤ 6.4e13 < 2⁵³
#          is double-exact and sqrt is correctly rounded, so the two
#          engines' doubles are identical bit patterns;
#          eigenvalue_micros = trunc(1e6·vᵀG'v / vᵀv) (integer Rayleigh
#          quotient of the RESCALED matrix; multiply by gram_scale_div
#          to read it on G's scale).
#
# The heavy half (the corpus pass) is q234's distributed partial-product
# pipeline; the iteration itself is a d×d driver-side solve (documented
# driver scalars: d(d+1)/2 = 2080 int64 cells — NOT data-sized), the
# same split Lloyd's q74/q122 uses for its k centroids. The fixture's
# spectral gap is small (λ₂/λ₁ ≈ 0.984), so 300 rounds land within
# ~1e-4 of numpy eigh's direction (pytest-pinned); the lattice
# truncation floor bounds further refinement. The oracle unrolls the 75
# rounds as CTEs (w_r unmaterialized single-pass window for max|w|; v_r
# materialized; g2/g4 one 64³ matmul CTE each); exact-int sums ride
# HUGEINT in DuckDB and arbitrary-precision ints on the Spark driver.
# The Rayleigh quotient reports on G' (not M), so eigenvalue_micros
# stays on the G'-eigenvalue scale the pytest rescales via
# gram_scale_div.
# ---------------------------------------------------------------------------

_Q235_ITERS = 75   # steps of M = G'^4 - effective power 300
_Q235_SCALE = 1_000_000


def _tdiv(a: int, b: int) -> int:
    """Integer division truncating toward zero — the exact twin of
    DuckDB's ``//`` (Python's ``//`` floors, which differs on one-
    negative operands; CLAUDE.md cookbook)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _q235_oracle() -> str:
    R, S = _Q235_ITERS, _Q235_SCALE
    gram = f"""
        SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
               CAST(SUM(
                   CAST(FLOOR(CAST(embedding[CAST(i AS INT)] AS DOUBLE)
                        * 1e6) AS BIGINT)
                 * CAST(FLOOR(CAST(embedding[CAST(j AS INT)] AS DOUBLE)
                        * 1e6) AS BIGINT)
               ) AS HUGEINT) AS gram
        FROM embeddings,
             UNNEST(range(1, len(embedding) + 1)) AS a(i),
             UNNEST(range(1, len(embedding) + 1)) AS b(j)
        GROUP BY i, j
    """
    ctes = [
        f"g AS MATERIALIZED ({gram})",
        "gmax AS (SELECT MAX(ABS(gram)) AS m FROM g)",
        f"sdiv AS (SELECT GREATEST(CAST(1 AS HUGEINT),"
        f" (m + {S - 1}) // {S}) AS s FROM gmax)",
        "gp AS MATERIALIZED"
        " (SELECT i, j, g.gram // sdiv.s AS q FROM g, sdiv)",
        "g2 AS MATERIALIZED (SELECT a.i, b.j, SUM(a.q * b.q) AS q"
        " FROM gp a JOIN gp b ON a.j = b.i GROUP BY a.i, b.j)",
        "g4 AS MATERIALIZED (SELECT a.i, b.j, SUM(a.q * b.q) AS q"
        " FROM g2 a JOIN g2 b ON a.j = b.i GROUP BY a.i, b.j)",
        f"v0 AS (SELECT CAST(unnest(generate_series(1,"
        f" (SELECT CAST(len(embedding) AS INT) FROM embeddings LIMIT 1)"
        f")) AS BIGINT) AS pos, CAST({S} AS HUGEINT) AS val)",
    ]
    for r in range(1, R + 1):
        ctes.append(
            f"w{r} AS (SELECT g4.i AS pos, SUM(g4.q * v.val) AS w"
            f" FROM g4 JOIN v{r - 1} v ON g4.j = v.pos GROUP BY g4.i)"
        )
        ctes.append(
            f"v{r} AS MATERIALIZED (SELECT pos,"
            f" (w * {S}) // MAX(ABS(w)) OVER () AS val FROM w{r})"
        )
    return f"""
    WITH {','.join(ctes)},
    sgn AS (SELECT CASE WHEN (SELECT val FROM v{R} WHERE pos = 1) < 0
                   THEN CAST(-1 AS HUGEINT)
                   ELSE CAST(1 AS HUGEINT) END AS s),
    fv AS MATERIALIZED (SELECT pos, val * sgn.s AS val FROM v{R}, sgn),
    wf AS MATERIALIZED (
        SELECT gp.i AS pos, SUM(gp.q * fv.val) AS w
        FROM gp JOIN fv ON gp.j = fv.pos GROUP BY gp.i),
    nn AS (SELECT SUM(val * val) AS n2 FROM fv),
    ray AS (
        SELECT (SELECT SUM(fv.val * wf.w)
                FROM fv JOIN wf ON fv.pos = wf.pos)
               * {S} // nn.n2 AS lam FROM nn)
    SELECT fv.pos AS pos,
           CAST(FLOOR(CAST(fv.val AS DOUBLE)
                / SQRT(CAST(nn.n2 AS DOUBLE)) * {S}) AS BIGINT)
               AS component_micros,
           CAST(ray.lam AS BIGINT) AS eigenvalue_micros,
           CAST(sdiv.s AS BIGINT) AS gram_scale_div
    FROM fv, nn, ray, sdiv
    """


@_register("q235_pca_power_iteration", oracle=_q235_oracle())
def q235_pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leading eigenvector/eigenvalue of the quantized Gram matrix:
    q234's distributed AᵀA + a deterministic 300-step driver-side power
    iteration on the int64 lattice (d×d — bounded by construction),
    hash-exact against DuckDB's unrolled-round replay. See block
    comment for the integer contract."""
    import math

    S = _Q235_SCALE
    e = load_table(spark, "embeddings", sf_dir)
    dim = len(e.select("embedding").first()[0])  # driver scalar (1 value)
    cells = gram_matrix(e, dim).collect()  # d(d+1)/2 cells — bounded
    g: dict[tuple[int, int], int] = {}
    for r in cells:
        g[(r["i"], r["j"])] = int(r["gram"])
        g[(r["j"], r["i"])] = int(r["gram"])
    gmax = max(abs(x) for x in g.values())
    sdiv = max(1, (gmax + S - 1) // S)
    gp = {k: _tdiv(x, sdiv) for k, x in g.items()}

    def matmul(x: dict, y: dict) -> dict:
        return {
            (i, j): sum(
                x[(i, t)] * y[(t, j)] for t in range(1, dim + 1)
            )
            for i in range(1, dim + 1)
            for j in range(1, dim + 1)
        }

    g2 = matmul(gp, gp)
    g4 = matmul(g2, g2)
    v = [S] * dim
    for _ in range(_Q235_ITERS):
        w = [
            sum(g4[(i + 1, j + 1)] * v[j] for j in range(dim))
            for i in range(dim)
        ]
        m = max(abs(x) for x in w)
        v = [_tdiv(x * S, m) for x in w]
    if v[0] < 0:  # sign convention: first component non-negative
        v = [-x for x in v]
    wf = [
        sum(gp[(i + 1, j + 1)] * v[j] for j in range(dim))
        for i in range(dim)
    ]
    n2 = sum(x * x for x in v)  # ≤ 64e12 < 2⁵³ — double-exact below
    lam = _tdiv(sum(a * b for a, b in zip(v, wf)) * S, n2)
    nrm = math.sqrt(float(n2))
    out = [
        (i + 1, math.floor(v[i] / nrm * S), lam, sdiv)
        for i in range(dim)
    ]
    return spark.createDataFrame(
        out,
        "pos long, component_micros long, eigenvalue_micros long, "
        "gram_scale_div long",
    )


# ---------------------------------------------------------------------------
# q248 — embedding-truncation (Matryoshka) audit: how much retrieval
# fidelity survives keeping only the first 16 of 64 dimensions? The
# compression decision every embedding store faces (MRL-style nested
# embeddings, dimension-sliced ANN tiers) needs this number measured,
# not assumed. For 4 deterministic probes (smallest md5(vec_id) — the
# q74 seeded-init convention), rank the corpus by exact integer inner
# product at full dimension and at the 16-dim prefix, and report top-10
# overlap plus id checksums of both rankings.
#
# Integer-exact throughout: vectors quantize to floor(x·1e6) int64
# (the q122 device), dots are Σ q_i·p_i ≤ 64·1e12 — int64-safe — and
# ranks are total-ordered by (dot desc, vec_id). Inner product stands
# in for cosine: comparing cosines across candidates for one probe
# would need cross-multiplied norm products past int64 (the q142 note);
# MIPS is itself a standard retrieval mode and keeps the audit on the
# hash gate.
#
# Plan shape: probes are 4 driver-held k·d scalars folded in as
# literals (bounded by construction); the scoring pass is MAP-ONLY
# (4× row multiplier, no join); one |corpus|·4-row window ranks per
# probe; the report is a 4-row aggregate. At 100 TB the same plan
# shards the window by probe — which is already its partition key.
# ---------------------------------------------------------------------------

_Q248_PROBES = 4
_Q248_PREFIX = 16
_Q248_TOPK = 10


def _register_q248() -> None:
    @_register(
        "q248_truncation_audit",
        oracle=f"""
        WITH pid AS (
            SELECT vec_id FROM embeddings
            ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
            LIMIT {_Q248_PROBES}
        ),
        ev AS (
            SELECT vec_id,
                   CAST(generate_subscripts(embedding, 1) AS BIGINT) AS pos,
                   CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000000)
                        AS BIGINT) AS q
            FROM embeddings
        ),
        pv AS (
            SELECT ev.vec_id AS probe_id, ev.pos, ev.q
            FROM ev JOIN pid ON ev.vec_id = pid.vec_id
        ),
        dots AS (
            SELECT p.probe_id, e.vec_id,
                   CAST(SUM(p.q * e.q) AS BIGINT) AS dot_full,
                   CAST(SUM(CASE WHEN e.pos <= {_Q248_PREFIX}
                                 THEN p.q * e.q ELSE 0 END) AS BIGINT)
                       AS dot_pre
            FROM ev e JOIN pv p ON e.pos = p.pos
            WHERE e.vec_id <> p.probe_id
            GROUP BY 1, 2
        ),
        ranked AS (
            SELECT probe_id, vec_id, dot_full,
                   ROW_NUMBER() OVER (PARTITION BY probe_id
                                      ORDER BY dot_full DESC, vec_id) AS rf,
                   ROW_NUMBER() OVER (PARTITION BY probe_id
                                      ORDER BY dot_pre DESC, vec_id) AS rp
            FROM dots
        )
        SELECT probe_id,
               CAST(COUNT(CASE WHEN rf <= {_Q248_TOPK}
                                AND rp <= {_Q248_TOPK} THEN 1 END) AS BIGINT)
                   AS n_overlap,
               CAST(SUM(CASE WHEN rf <= {_Q248_TOPK} THEN vec_id ELSE 0 END)
                    AS BIGINT) AS full_checksum,
               CAST(SUM(CASE WHEN rp <= {_Q248_TOPK} THEN vec_id ELSE 0 END)
                    AS BIGINT) AS trunc_checksum,
               CAST(MIN(CASE WHEN rf <= {_Q248_TOPK} THEN dot_full END)
                    AS BIGINT) AS min10_dot_full
        FROM ranked GROUP BY probe_id
        """,
    )
    def q248_truncation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Top-10 MIPS overlap between full-dimension and 16-dim-prefix
        rankings for 4 hash-seeded probes; exact integer dots, total-
        ordered ranks. See block comment for the scale contract."""
        e = load_table(spark, "embeddings", sf_dir).select(
            "vec_id",
            F.transform(
                "embedding",
                lambda x: F.floor(x.cast("double") * F.lit(1000000.0))
                .cast("long"),
            ).alias("qv"),
        )
        probes = (
            e.orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
            .limit(_Q248_PROBES)
            .collect()
        )  # 4 k·d driver scalars — bounded by construction
        plit = F.array(
            *[
                F.struct(
                    F.lit(int(r["vec_id"])).cast("long").alias("probe_id"),
                    F.array(*[F.lit(int(x)) for x in r["qv"]]).alias("pq"),
                )
                for r in probes
            ]
        )
        idot = lambda a, b: F.aggregate(  # noqa: E731
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
        scored = (
            e.select("vec_id", "qv", F.explode(plit).alias("p"))
            .filter(F.col("vec_id") != F.col("p.probe_id"))
            .select(
                F.col("p.probe_id").alias("probe_id"),
                "vec_id",
                idot(F.col("qv"), F.col("p.pq")).alias("dot_full"),
                idot(
                    F.slice("qv", 1, _Q248_PREFIX),
                    F.slice("p.pq", 1, _Q248_PREFIX),
                ).alias("dot_pre"),
            )
        )
        wf = Window.partitionBy("probe_id").orderBy(
            F.desc("dot_full"), F.asc("vec_id")
        )
        wp = Window.partitionBy("probe_id").orderBy(
            F.desc("dot_pre"), F.asc("vec_id")
        )
        ranked = scored.select(
            "probe_id", "vec_id", "dot_full",
            F.row_number().over(wf).alias("rf"),
            F.row_number().over(wp).alias("rp"),
        )
        k = _Q248_TOPK
        return ranked.groupBy("probe_id").agg(
            F.count(
                F.when((F.col("rf") <= k) & (F.col("rp") <= k), 1)
            ).cast("long").alias("n_overlap"),
            F.sum(F.when(F.col("rf") <= k, F.col("vec_id")).otherwise(0))
            .cast("long").alias("full_checksum"),
            F.sum(F.when(F.col("rp") <= k, F.col("vec_id")).otherwise(0))
            .cast("long").alias("trunc_checksum"),
            F.min(F.when(F.col("rf") <= k, F.col("dot_full")))
            .cast("long").alias("min10_dot_full"),
        )


_register_q248()


# ---------------------------------------------------------------------------
# q256 — embedding drift monitor: per label, the squared L2 distance
# between the centroid of the even-vec_id half and the odd-vec_id half
# — the statistic a feature store alarms on when an upstream encoder
# or data mix shifts (here the halves stand in for week-over-week
# snapshots; identical distribution, so drift is small — the pytest
# pins that each label's drift is far below the between-label centroid
# spread, i.e. the monitor separates noise from signal).
#
# Exactness: per-dim sums of floor-1e6-quantized values are exact
# int64; each half's per-dim mean is ONE truncating division to
# micro-units (s·1e6 div (n·1e6) = s div n — done at micro grain:
# mean_micro = s div n); the drift is Σ (mean1−mean2)² ≤ 64·(2e6)²
# ≈ 2.6e14 — int64-safe. Truncation is engine-identical (div ≡ //).
#
# Plan: one (label, half, pos)-grain aggregate from a posexplode
# projection — map-side combined, |labels|·2·64 rows shuffle — then a
# self-join on (label, pos) at that bounded grain and a |labels|-row
# reduce. No corpus-sized join anywhere.
# ---------------------------------------------------------------------------


def _register_q256() -> None:
    @_register(
        "q256_embedding_drift",
        oracle="""
        WITH flat AS (
            SELECT label, vec_id % 2 AS half,
                   CAST(generate_subscripts(embedding, 1) AS BIGINT) AS pos,
                   CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000000)
                        AS BIGINT) AS q
            FROM embeddings
        ),
        g AS (
            SELECT label, half, pos,
                   CAST(SUM(q) AS BIGINT) AS s,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM flat GROUP BY 1, 2, 3
        ),
        m AS (SELECT label, half, pos, s // n AS mean_micro FROM g),
        d AS (
            SELECT a.label, a.pos,
                   (a.mean_micro - b.mean_micro) AS dd
            FROM m a JOIN m b
              ON a.label = b.label AND a.pos = b.pos
             AND a.half = 0 AND b.half = 1
        )
        SELECT CAST(label AS BIGINT) AS label,
               CAST(COUNT(*) AS BIGINT) AS n_dims,
               CAST(SUM(dd * dd) AS BIGINT) AS drift_musq,
               CAST(MAX(abs(dd)) AS BIGINT) AS max_dim_drift_micro
        FROM d GROUP BY label
        """,
    )
    def q256_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Per-label squared centroid drift between the even/odd vec_id
        halves, exact micro-unit integers; see block comment."""
        e = load_table(spark, "embeddings", sf_dir)
        flat = e.select(
            "label",
            (F.col("vec_id") % 2).alias("half"),
            F.posexplode(
                F.transform(
                    "embedding",
                    lambda x: F.floor(x.cast("double") * F.lit(1000000.0))
                    .cast("long"),
                )
            ).alias("pos0", "q"),
        )
        g = (
            flat.groupBy("label", "half", F.col("pos0").alias("pos"))
            .agg(
                F.sum("q").cast("long").alias("s"),
                F.count(F.lit(1)).cast("long").alias("n"),
            )
            .select(
                "label", "half", "pos", F.expr("s div n").alias("mean_micro")
            )
        )
        a = g.filter(F.col("half") == 0).select(
            "label", "pos", F.col("mean_micro").alias("m0")
        )
        b = g.filter(F.col("half") == 1).select(
            "label", "pos", F.col("mean_micro").alias("m1")
        )
        d = a.join(b, ["label", "pos"]).select(
            "label", (F.col("m0") - F.col("m1")).alias("dd")
        )
        return d.groupBy(F.col("label").cast("long").alias("label")).agg(
            F.count(F.lit(1)).cast("long").alias("n_dims"),
            F.sum(F.col("dd") * F.col("dd")).cast("long").alias("drift_musq"),
            F.max(F.abs("dd")).cast("long").alias("max_dim_drift_micro"),
        )


_register_q256()


# ---------------------------------------------------------------------------
# q292 — SemDeDup: cluster-scoped embedding near-duplicate PRUNING
# (Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale
# through semantic deduplication"). The 100 TB answer to q33's exact
# tier: k-means partitions the corpus into K cells, pairwise cosine is
# computed ONLY within a cell, and every above-τ pair prunes its
# higher-id member (keep-lowest-id representative). Pair mass drops from
# N²/2 to Σ|cell|²/2 — with balanced cells a K× reduction, and the
# per-cell kernel is an embarrassingly parallel applyInPandas task that
# never shuffles vectors twice. Cross-cell near-dups are deliberately
# invisible (the approximation the paper accepts); q33 remains the
# exact-recall audit tier.
#
# Determinism: the clustering is q122's fixed-2-iteration integer-space
# Lloyd's (md5-ordered init, int64 distances, argmin ties on cell id,
# floor-mean update, empty cells die) and the scoring is q33's quantized
# arithmetic (per-dim floor(x·y·1e12) exact-int products, IEEE sqrt
# norms, one multiply + one divide per pair) — both replayed bit-for-bit
# by the oracle's CTE chain.
# ---------------------------------------------------------------------------


def _register_q292() -> None:
    from etl_globalretail_spark.operators.clustering import (
        _Q122_K,
        _Q122_SCALE,
        _qvec,
    )

    scale = int(_Q122_SCALE)
    assign_sql = """
        SELECT vec_id, cell FROM (
            SELECT f.vec_id, c.cell,
                   ROW_NUMBER() OVER (PARTITION BY f.vec_id
                       ORDER BY SUM((f.q - c.cq) * (f.q - c.cq)), c.cell
                   ) AS rn
            FROM flat f JOIN {cfrm} c ON f.pos = c.pos
            GROUP BY f.vec_id, c.cell
        ) WHERE rn = 1
    """

    @_register(
        "q292_semdedup_prune",
        oracle=f"""
        WITH flat AS (
            SELECT vec_id,
                   CAST(generate_subscripts(embedding, 1) AS BIGINT) AS pos,
                   CAST(unnest(embedding) AS DOUBLE) AS val,
                   CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * {scale})
                        AS BIGINT) AS q
            FROM embeddings
        ),
        init AS (
            -- ADAPTIVE cell count: k = max(8, ceil(N / 250)) grows with
            -- the corpus so per-cell size (and the N^2/k pair mass per
            -- cell) stays CONSTANT as data scales — the fix for the sf1
            -- rehearsal's 9.7x (fixed k turns 10x data into ~100x cell
            -- work). DuckDB evaluates the scalar-subquery LIMIT; Spark
            -- computes the same k from the same count.
            SELECT vec_id,
                   CAST(ROW_NUMBER() OVER (
                       ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
                   ) AS BIGINT) - 1 AS cell
            FROM embeddings
            ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
            LIMIT (SELECT GREATEST({_Q122_K},
                       CAST(CEIL(COUNT(*) / {_SEMDEDUP_CELL}.0) AS BIGINT))
                   FROM embeddings)
        ),
        c0 AS (
            SELECT i.cell, f.pos, f.q AS cq
            FROM init i JOIN flat f ON i.vec_id = f.vec_id
        ),
        a1 AS ({assign_sql.format(cfrm="c0")}),
        c1 AS (
            SELECT a.cell, f.pos,
                   CAST(FLOOR(CAST(SUM(f.q) AS DOUBLE) / COUNT(*))
                        AS BIGINT) AS cq
            FROM a1 a JOIN flat f ON a.vec_id = f.vec_id
            GROUP BY a.cell, f.pos
        ),
        a2 AS ({assign_sql.format(cfrm="c1")}),
        norms AS (
            SELECT vec_id,
                   sqrt(CAST(SUM(CAST(FLOOR(val * val * 1e12) AS BIGINT))
                        AS DOUBLE)) AS n
            FROM flat GROUP BY vec_id
        ),
        dup AS (
            SELECT x.cell, d.id_a, d.id_b
            FROM (
                SELECT f.vec_id AS id_a, g.vec_id AS id_b,
                       CAST(SUM(CAST(FLOOR(f.val * g.val * 1e12) AS BIGINT))
                            AS DOUBLE) AS dp
                FROM flat f JOIN flat g
                  ON f.pos = g.pos AND f.vec_id < g.vec_id
                GROUP BY 1, 2
            ) d
            JOIN a2 x ON d.id_a = x.vec_id
            JOIN a2 y ON d.id_b = y.vec_id AND y.cell = x.cell
            JOIN norms na ON d.id_a = na.vec_id
            JOIN norms nb ON d.id_b = nb.vec_id
            WHERE d.dp / (na.n * nb.n) >= {_NEARDUP_TAU}
        ),
        pruned AS (SELECT cell, id_b FROM dup GROUP BY cell, id_b),
        cells AS (
            SELECT cell, COUNT(*) AS n_vectors, SUM(vec_id) AS id_sum
            FROM a2 GROUP BY cell
        ),
        dpc AS (SELECT cell, COUNT(*) AS n_dup_pairs FROM dup GROUP BY cell),
        prc AS (
            SELECT cell, COUNT(*) AS n_pruned, SUM(id_b) AS s
            FROM pruned GROUP BY cell
        )
        SELECT CAST(cells.cell AS BIGINT) AS cell,
               CAST(cells.n_vectors AS BIGINT) AS n_vectors,
               CAST(COALESCE(dpc.n_dup_pairs, 0) AS BIGINT) AS n_dup_pairs,
               CAST(COALESCE(prc.n_pruned, 0) AS BIGINT) AS n_pruned,
               CAST(cells.id_sum - COALESCE(prc.s, 0) AS BIGINT)
                   AS kept_id_sum
        FROM cells LEFT JOIN dpc ON cells.cell = dpc.cell
                   LEFT JOIN prc ON cells.cell = prc.cell
        """,
    )
    def q292_semdedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Per-cell SemDeDup census: cluster the embeddings with the q122
        deterministic Lloyd's, score pairwise cosine WITHIN each cell with
        the q33 quantized arithmetic, prune the higher id of every
        above-τ pair. Output: cell, n_vectors, n_dup_pairs, n_pruned,
        kept_id_sum. See block comment."""
        import numpy as np
        import pandas as pd

        e = load_table(spark, "embeddings", sf_dir)
        base = e.select(
            "vec_id", "embedding", _qvec(F.col("embedding")).alias("qv")
        ).persist()
        try:
            # Adaptive k = max(8, ceil(N/250)) — mirrors the oracle's
            # scalar-subquery LIMIT; the count also materializes the
            # cache so every later pass reads cached blocks. Centroids
            # stay a driver matrix (k×d ints, the documented k-means
            # sync point — ~50 MB at k=100k; past that the coarse
            # quantizer itself shards two-level, k' = √k top cells).
            n_vecs = base.count()
            kk_target = max(
                _Q122_K, -(-n_vecs // _SEMDEDUP_CELL)
            )
            # init: the K vectors with smallest (md5(vec_id), vec_id) —
            # a driver scalar (K rows), the q122/q74 documented pattern
            init = (
                base.orderBy(
                    F.md5(F.col("vec_id").cast("string")), F.col("vec_id")
                )
                .limit(kk_target)
                .select("qv")
                .collect()
            )
            cmat0 = np.array([r["qv"] for r in init], dtype=np.int64)
            kk, dd = cmat0.shape

            # one update round -> c1, via Arrow partials + driver merge
            # (k·d ints per partition — the map-side combine shape)
            def _partials(batches):
                S = np.zeros((kk, dd), dtype=np.int64)
                N = np.zeros(kk, dtype=np.int64)
                # ‖x−c‖² = ‖x‖² + ‖c‖² − 2x·c in exact int64 matmul —
                # B×k working set, never the B×k×d diff tensor (adaptive
                # k makes the tensor form a memory bomb)
                c2 = (cmat0 * cmat0).sum(axis=1)
                for pdf in batches:
                    if not len(pdf):
                        continue
                    X = np.array(list(pdf["qv"]), dtype=np.int64)
                    d2 = (
                        (X * X).sum(axis=1)[:, None]
                        + c2[None, :]
                        - 2 * (X @ cmat0.T)
                    )
                    cells = np.argmin(d2, axis=1)
                    for ci in range(kk):
                        m = cells == ci
                        if m.any():
                            S[ci] += X[m].sum(axis=0)
                            N[ci] += int(m.sum())
                live = np.nonzero(N)[0]
                yield pd.DataFrame(
                    {
                        "cell": np.repeat(live, dd).astype("int64"),
                        "pos": np.tile(np.arange(dd), len(live))
                        .astype("int32"),
                        "s": S[live].reshape(-1).astype("int64"),
                        "n": np.repeat(N[live], dd).astype("int64"),
                    }
                )

            S: dict[int, np.ndarray] = {}
            N: dict[int, int] = {}
            for r in base.select("qv").mapInPandas(
                _partials, schema="cell long, pos int, s long, n long"
            ).collect():
                S.setdefault(r.cell, np.zeros(dd, dtype=np.int64))
                S[r.cell][r.pos] += r.s
                if r.pos == 0:
                    N[r.cell] = N.get(r.cell, 0) + r.n
            live_cells = sorted(c for c in N if N[c])
            cmat1 = np.array(
                [np.floor(S[c].astype(np.float64) / N[c]).astype(np.int64)
                 for c in live_cells],
                dtype=np.int64,
            )
            cell_ids = np.array(live_cells, dtype=np.int64)

            # final assignment rides WITH the float vector so the census
            # kernel needs no second join
            def _assign(batches):
                c2 = (cmat1 * cmat1).sum(axis=1)
                for pdf in batches:
                    if not len(pdf):
                        continue
                    X = np.array(list(pdf["qv"]), dtype=np.int64)
                    d2 = (
                        (X * X).sum(axis=1)[:, None]
                        + c2[None, :]
                        - 2 * (X @ cmat1.T)
                    )
                    cells = np.argmin(d2, axis=1)
                    yield pd.DataFrame(
                        {
                            "vec_id": pdf["vec_id"],
                            "cell": cell_ids[cells],
                            "embedding": pdf["embedding"],
                        }
                    )

            assigned = base.mapInPandas(
                _assign,
                schema="vec_id long, cell long, embedding array<float>",
            )

            def _census(key, pdf):
                ids = pdf["vec_id"].to_numpy(dtype=np.int64)
                X = np.array(list(pdf["embedding"]), dtype=np.float64)
                nrm = np.sqrt(np.floor(X * X * 1e12).sum(axis=1))
                dp = np.zeros((len(ids), len(ids)), dtype=np.float64)
                for d in range(X.shape[1]):
                    dp += np.floor(X[:, d, None] * X[None, :, d] * 1e12)
                cos = dp / (nrm[:, None] * nrm[None, :])
                keep = (cos >= _NEARDUP_TAU) & (ids[:, None] < ids[None, :])
                pruned = keep.any(axis=0)
                return pd.DataFrame(
                    {
                        "cell": [int(key[0])],
                        "n_vectors": [len(ids)],
                        "n_dup_pairs": [int(keep.sum())],
                        "n_pruned": [int(pruned.sum())],
                        "kept_id_sum": [
                            int(ids.sum() - ids[pruned].sum())
                        ],
                    }
                )

            out = assigned.groupBy("cell").applyInPandas(
                _census,
                "cell long, n_vectors long, n_dup_pairs long,"
                " n_pruned long, kept_id_sum long",
            )
            # ≤ K rows: materialize so the finally can release the cache
            from etl_globalretail_spark.sources.artifacts import materialize

            return materialize(out)
        finally:
            base.unpersist()


_register_q292()


# ---------------------------------------------------------------------------
# q293 — hard-negative mining for contrastive training: for every anchor
# vector, the K most cosine-similar vectors of a DIFFERENT label — the
# candidates that sit closest to the decision boundary and carry the
# most gradient signal in a contrastive/triplet objective. Distributed
# shape: the q33 block-tile cogroup scores one block×block tile per
# task and emits each anchor's PARTIAL top-K within the tile (≤ K·B
# candidate rows per anchor ever reach the merge — the global top-K is
# provably inside the union of per-tile top-Ks); a keyed window then
# totals-orders (cos DESC, neg_id) to the final K. No all-pairs frame
# is ever materialized. Arithmetic is the q33 quantized fold
# (floor(x·y·1e12) exact-int products, IEEE sqrt norms, one divide) so
# every cos_sim double is bit-identical to the oracle's.
# ---------------------------------------------------------------------------

_HARDNEG_K = 3
_HARDNEG_BLOCKS = 8


def _register_q293() -> None:
    @_register(
        "q293_hard_negatives",
        oracle=f"""
        -- flat is self-joined and feeds norms; lab/norms join
        -- twice each — MATERIALIZED (measured 3.2 s -> 1.8 s)
        WITH flat AS MATERIALIZED (
            SELECT vec_id,
                   CAST(generate_subscripts(embedding, 1) AS BIGINT) AS pos,
                   CAST(unnest(embedding) AS DOUBLE) AS val
            FROM embeddings
        ),
        norms AS MATERIALIZED (
            SELECT vec_id,
                   sqrt(CAST(SUM(CAST(FLOOR(val * val * 1e12) AS BIGINT))
                        AS DOUBLE)) AS n
            FROM flat GROUP BY vec_id
        ),
        lab AS MATERIALIZED (
            SELECT vec_id, CAST(label AS BIGINT) AS label FROM embeddings
        ),
        dots AS (
            SELECT f.vec_id AS a, g.vec_id AS b,
                   CAST(SUM(CAST(FLOOR(f.val * g.val * 1e12) AS BIGINT))
                        AS DOUBLE) AS dp
            FROM flat f JOIN flat g
              ON f.pos = g.pos AND f.vec_id <> g.vec_id
            GROUP BY 1, 2
        ),
        scored AS (
            SELECT d.a, d.b, la.label AS albl, lb.label AS blbl,
                   d.dp / (na.n * nb.n) AS cos
            FROM dots d
            JOIN norms na ON d.a = na.vec_id
            JOIN norms nb ON d.b = nb.vec_id
            JOIN lab la ON d.a = la.vec_id
            JOIN lab lb ON d.b = lb.vec_id
            WHERE la.label <> lb.label
        ),
        ranked AS (
            SELECT a, b, albl, blbl, cos,
                   ROW_NUMBER() OVER (
                       PARTITION BY a ORDER BY cos DESC, b
                   ) AS rn
            FROM scored
        )
        SELECT a AS anchor_id, CAST(rn AS BIGINT) AS rank, b AS neg_id,
               albl AS anchor_label, blbl AS neg_label, cos AS cos_sim
        FROM ranked WHERE rn <= {_HARDNEG_K}
        """,
    )
    def q293_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Per-anchor top-{k} wrong-label cosine neighbors via block-tile
        partial top-K + keyed-window merge; see block comment.""".format(
            k=_HARDNEG_K
        )
        import numpy as np
        import pandas as pd

        e = load_table(spark, "embeddings", sf_dir)
        # Adaptive block count: B = max(8, ceil(N/1000)) caps the tile
        # working set at ~1000×1000 regardless of corpus size (the
        # partial-top-K merge is exact for ANY B, so this never changes
        # results — blocks bound MEMORY; the exact tier's FLOPs stay
        # inherently quadratic, which is why the LSH tier q311 exists).
        nb = max(_HARDNEG_BLOCKS, -(-e.count() // 1000))
        tiles = spark.createDataFrame(
            [(i, j) for i in range(nb) for j in range(i, nb)],
            "bi int, bj int",
        )
        v = e.select(
            F.col("vec_id").alias("vid"),
            F.col("embedding").alias("vec"),
            F.col("label").cast("long").alias("lbl"),
            F.pmod(F.col("vec_id"), F.lit(nb)).cast("int").alias("blk"),
        )
        left = v.join(F.broadcast(tiles), F.col("blk") == F.col("bi")).select(
            "bi", "bj", "vid", "vec", "lbl"
        )
        # fresh attribute ids on the right side (see q33's blocked engine)
        right = v.join(F.broadcast(tiles), F.col("blk") == F.col("bj")).select(
            F.col("bi").alias("rbi"), F.col("bj").alias("rbj"),
            F.col("vid").alias("rvid"), F.col("vec").alias("rvec"),
            F.col("lbl").alias("rlbl"),
        )
        kk = _HARDNEG_K
        empty = pd.DataFrame(
            {"anchor_id": [], "anchor_label": [], "neg_id": [],
             "neg_label": [], "cos_sim": []}
        )

        def _partial_topk(a_ids, a_lbl, b_ids, b_lbl, cos, self_pairs):
            """Per-anchor (rows) top-K among wrong-label columns; stable
            argsort over id-ascending columns = (cos DESC, id ASC)."""
            valid = a_lbl[:, None] != b_lbl[None, :]
            if self_pairs:
                valid &= a_ids[:, None] != b_ids[None, :]
            masked = np.where(valid, cos, -np.inf)
            order = np.argsort(-masked, axis=1, kind="stable")[:, :kk]
            rows = np.repeat(np.arange(len(a_ids)), order.shape[1])
            cols = order.reshape(-1)
            sel = np.isfinite(masked[rows, cols])
            rows, cols = rows[sel], cols[sel]
            return pd.DataFrame(
                {
                    "anchor_id": a_ids[rows],
                    "anchor_label": a_lbl[rows],
                    "neg_id": b_ids[cols],
                    "neg_label": b_lbl[cols],
                    "cos_sim": cos[rows, cols],
                }
            )

        def score_tile(key, lpdf, rpdf):
            if lpdf.empty or rpdf.empty:
                return empty
            # id-ascending columns make the stable argsort's tie-break
            # exact (cos DESC, id ASC)
            lpdf = lpdf.sort_values("vid")
            rpdf = rpdf.sort_values("rvid")
            a_ids = lpdf["vid"].to_numpy(dtype=np.int64)
            b_ids = rpdf["rvid"].to_numpy(dtype=np.int64)
            a_lbl = lpdf["lbl"].to_numpy(dtype=np.int64)
            b_lbl = rpdf["rlbl"].to_numpy(dtype=np.int64)
            amat = np.array(list(lpdf["vec"]), dtype=np.float64)
            bmat = np.array(list(rpdf["rvec"]), dtype=np.float64)
            a_n = np.sqrt(np.floor(amat * amat * 1e12).sum(axis=1))
            b_n = np.sqrt(np.floor(bmat * bmat * 1e12).sum(axis=1))
            dp = np.zeros((len(a_ids), len(b_ids)), dtype=np.float64)
            for d in range(amat.shape[1]):
                dp += np.floor(amat[:, d, None] * bmat[None, :, d] * 1e12)
            cos = dp / (a_n[:, None] * b_n[None, :])
            diag = key[0] == key[1]
            outs = [_partial_topk(a_ids, a_lbl, b_ids, b_lbl, cos, diag)]
            if not diag:  # right-side anchors score against left cands
                outs.append(
                    _partial_topk(b_ids, b_lbl, a_ids, a_lbl, cos.T, False)
                )
            return pd.concat(outs, ignore_index=True)

        partials = (
            left.groupBy("bi", "bj")
            .cogroup(right.groupBy("rbi", "rbj"))
            .applyInPandas(
                score_tile,
                "anchor_id long, anchor_label long, neg_id long,"
                " neg_label long, cos_sim double",
            )
        )
        w = Window.partitionBy("anchor_id").orderBy(
            F.desc("cos_sim"), F.asc("neg_id")
        )
        return (
            partials.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= kk)
            .select(
                "anchor_id", F.col("rank").cast("long").alias("rank"),
                "neg_id", "anchor_label", "neg_label", "cos_sim",
            )
        )


_register_q293()


# ---------------------------------------------------------------------------
# q311 — LSH-pruned hard-negative mining: q293's per-anchor top-K
# wrong-label neighbors, with candidates restricted to the anchor's
# sign-LSH bucket — the SCALE tier of the pair. q293 is exact and
# inherently quadratic in FLOPs (every anchor scores every wrong-label
# vector; its blocks bound memory, not work — the sf1 rehearsal measured
# the 14× super-linear cost of that honesty). Here candidate pair mass
# is Σ_b |bucket_b|²: with bucket bits grown ∝ log N (bits is a constant
# of the index, like IVF's k — 4 at test SF), expected bucket size and
# per-anchor work stay CONSTANT as the corpus grows, the production
# posture for contrastive mining over 100 TB of embeddings (multi-probe
# or band-OR raises recall at the same asymptotics).
#
# Whole path oracle-replayed via q82's md5-Rademacher hyperplanes (same
# 'hp-{bit}-{pos}' family, so both engines hold identical buckets) and
# q293's quantized-cosine arithmetic (floor(x·y·1e12) exact-int dots,
# IEEE sqrt norms, one divide) — buckets, candidate set, every cos_sim
# double and every rank bit-identical cross-engine. The per-anchor rank
# is a PARTITIONED window (InferWindowGroupLimit rewrites the ≤K filter
# into a group limit); the bucket self-join is a plain shuffle equi-join
# — nothing corpus-sized broadcasts.
# ---------------------------------------------------------------------------


def _register_q311() -> None:
    bits, dim, kk = _Q82_BITS, _Q82_DIM, _HARDNEG_K

    @_register(
        "q311_hard_negatives_lsh",
        oracle=f"""
        WITH flat AS (
            SELECT vec_id,
                   CAST(generate_subscripts(embedding, 1) AS BIGINT) AS pos,
                   CAST(unnest(embedding) AS DOUBLE) AS val
            FROM embeddings
        ),
        signs AS (
            SELECT b, pos,
                   CASE WHEN CAST('0x' || substr(
                            md5('hp-' || b || '-' || pos), 1, 15) AS BIGINT)
                        % 2 = 0 THEN 1 ELSE -1 END AS s
            FROM (SELECT unnest(range({bits})) AS b),
                 (SELECT unnest(range(1, {dim + 1})) AS pos)
        ),
        vq AS (
            SELECT vec_id, pos, CAST(FLOOR(val * 1e6) AS BIGINT) AS q
            FROM flat
        ),
        bits AS (
            SELECT vec_id, b,
                   CASE WHEN SUM(s * q) >= 0 THEN 1 ELSE 0 END AS bit
            FROM vq JOIN signs ON vq.pos = signs.pos
            GROUP BY vec_id, b
        ),
        buckets AS (
            SELECT vec_id, CAST(SUM(bit * (1 << b)) AS BIGINT) AS bucket
            FROM bits GROUP BY vec_id
        ),
        lab AS (
            SELECT vec_id, CAST(label AS BIGINT) AS label FROM embeddings
        ),
        norms AS (
            SELECT vec_id,
                   sqrt(CAST(SUM(CAST(FLOOR(val * val * 1e12) AS BIGINT))
                        AS DOUBLE)) AS n
            FROM flat GROUP BY vec_id
        ),
        pairs AS (
            SELECT ba.vec_id AS a, bb.vec_id AS b,
                   la.label AS albl, lb.label AS blbl
            FROM buckets ba
            JOIN buckets bb
              ON ba.bucket = bb.bucket AND ba.vec_id <> bb.vec_id
            JOIN lab la ON la.vec_id = ba.vec_id
            JOIN lab lb ON lb.vec_id = bb.vec_id
            WHERE la.label <> lb.label
        ),
        dots AS (
            SELECT p.a, p.b, p.albl, p.blbl,
                   CAST(SUM(CAST(FLOOR(f.val * g.val * 1e12) AS BIGINT))
                        AS DOUBLE) AS dp
            FROM pairs p
            JOIN flat f ON f.vec_id = p.a
            JOIN flat g ON g.vec_id = p.b AND g.pos = f.pos
            GROUP BY p.a, p.b, p.albl, p.blbl
        ),
        ranked AS (
            SELECT d.a, d.b, d.albl, d.blbl,
                   d.dp / (na.n * nb.n) AS cos,
                   ROW_NUMBER() OVER (
                       PARTITION BY d.a
                       ORDER BY d.dp / (na.n * nb.n) DESC, d.b
                   ) AS rn
            FROM dots d
            JOIN norms na ON d.a = na.vec_id
            JOIN norms nb ON d.b = nb.vec_id
        )
        SELECT a AS anchor_id, CAST(rn AS BIGINT) AS rank, b AS neg_id,
               albl AS anchor_label, blbl AS neg_label, cos AS cos_sim
        FROM ranked WHERE rn <= {kk}
        """,
    )
    def q311_hard_negatives_lsh(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Per-anchor top-K wrong-label cosine neighbors among the
        anchor's sign-LSH bucket — q293's scale tier; see block comment.
        """
        e = load_table(spark, "embeddings", sf_dir)
        vd = F.col("embedding").cast("array<double>")
        # One pass computes bucket + norm beside the vector; consumed by
        # BOTH join legs below — persist or the scan+bucket folds run
        # twice (Catalyst never dedupes the subplan). Lifetime is tied to
        # the returned plan; released by the harness clearCache().
        base = e.select(
            "vec_id",
            F.col("label").cast("long").alias("label"),
            "embedding",
            _rademacher_bucket(vd, bits).alias("bucket"),
            _qdot(vd, vd).cast("double").alias("nrm2"),
        ).persist()
        left = base.select(
            F.col("vec_id").alias("anchor_id"),
            F.col("label").alias("anchor_label"),
            "bucket",
            F.col("embedding").alias("avec"),
            F.col("nrm2").alias("na2"),
        )
        right = base.select(
            F.col("vec_id").alias("neg_id"),
            F.col("label").alias("neg_label"),
            F.col("bucket").alias("rbucket"),
            F.col("embedding").alias("bvec"),
            F.col("nrm2").alias("nb2"),
        )
        pairs = left.join(
            right,
            (F.col("bucket") == F.col("rbucket"))
            & (F.col("anchor_id") != F.col("neg_id"))
            & (F.col("anchor_label") != F.col("neg_label")),
        )
        cos = (
            _qdot(
                F.col("avec").cast("array<double>"),
                F.col("bvec").cast("array<double>"),
            ).cast("double")
            / (F.sqrt("na2") * F.sqrt("nb2"))
        ).alias("cos_sim")
        scored = pairs.select(
            "anchor_id", "anchor_label", "neg_id", "neg_label", cos
        )
        w = Window.partitionBy("anchor_id").orderBy(
            F.desc("cos_sim"), F.asc("neg_id")
        )
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= kk)
            .select(
                "anchor_id", F.col("rank").cast("long").alias("rank"),
                "neg_id", "anchor_label", "neg_label", "cos_sim",
            )
        )


_register_q311()


# ---------------------------------------------------------------------------
# q315 — MULTI-PROBE sign-LSH ANN (Lv et al. 2007, "Multi-probe LSH"):
# q82's single-bucket search additionally probes every Hamming-1
# neighbor bucket of the query's code — the standard recall lever the
# q311 block comment points at: perturbing one sign bit visits the
# buckets a borderline-hyperplane vector most likely fell into, raising
# recall at (1 + bits)/2^bits expected candidate mass instead of one
# more index. Candidates are a strict SUPERSET of q82's, so q315's
# top-k cosine list dominates q82's pointwise (pytest law), and the
# output carries each hit's Hamming distance to the query bucket (0 =
# the q82 bucket, 1 = reached only by probing) so the recall
# contribution of probing reads off the frame.
#
# Same scale shape as q82: bucketing is a map-side fold; the probe set
# (bits + 1 bucket ids) is a driver literal; candidates are an isin
# equi-filter; exact rerank touches only candidates; top-k is
# TakeOrderedAndProject.
# ---------------------------------------------------------------------------


def _register_q315() -> None:
    bits, dim = _Q82_BITS, _Q82_DIM

    @_register(
        "q315_ann_multiprobe",
        oracle=f"""
        WITH flat AS (
            SELECT vec_id,
                   CAST(generate_subscripts(embedding, 1) AS BIGINT) AS pos,
                   CAST(unnest(embedding) AS DOUBLE) AS val
            FROM embeddings
        ),
        signs AS (
            SELECT b, pos,
                   CASE WHEN CAST('0x' || substr(
                            md5('hp-' || b || '-' || pos), 1, 15) AS BIGINT)
                        % 2 = 0 THEN 1 ELSE -1 END AS s
            FROM (SELECT unnest(range({bits})) AS b),
                 (SELECT unnest(range(1, {dim + 1})) AS pos)
        ),
        vq AS (
            SELECT vec_id, pos, CAST(FLOOR(val * 1e6) AS BIGINT) AS q
            FROM flat
        ),
        bits AS (
            SELECT vec_id, b,
                   CASE WHEN SUM(s * q) >= 0 THEN 1 ELSE 0 END AS bit
            FROM vq JOIN signs ON vq.pos = signs.pos
            GROUP BY vec_id, b
        ),
        buckets AS (
            SELECT vec_id, CAST(SUM(bit * (1 << b)) AS BIGINT) AS bucket
            FROM bits GROUP BY vec_id
        ),
        qb AS (
            SELECT bucket FROM buckets
            WHERE vec_id = (SELECT MIN(vec_id) FROM embeddings)
        ),
        probes AS (
            SELECT (SELECT bucket FROM qb) AS pb
            UNION ALL
            SELECT CAST(xor((SELECT bucket FROM qb),
                            CAST(1 << i AS BIGINT)) AS BIGINT)
            FROM (SELECT unnest(range({bits})) AS i)
        ),
        cand AS (
            SELECT b.vec_id,
                   CAST(bit_count(CAST(xor(b.bucket,
                        (SELECT bucket FROM qb)) AS BIT)) AS BIGINT)
                       AS probe_hamming
            FROM buckets b
            WHERE b.bucket IN (SELECT pb FROM probes)
        ),
        qv AS (
            SELECT pos, val AS qval FROM flat
            WHERE vec_id = (SELECT MIN(vec_id) FROM embeddings)
        ),
        scored AS (
            SELECT f.vec_id, c.probe_hamming,
                   CAST(SUM(CAST(FLOOR(f.val * q.qval * 1e12) AS BIGINT))
                        AS DOUBLE) AS dp,
                   CAST(SUM(CAST(FLOOR(f.val * f.val * 1e12) AS BIGINT))
                        AS DOUBLE) AS nf,
                   CAST(SUM(CAST(FLOOR(q.qval * q.qval * 1e12) AS BIGINT))
                        AS DOUBLE) AS nq
            FROM flat f
            JOIN cand c ON f.vec_id = c.vec_id
            JOIN qv q ON f.pos = q.pos
            GROUP BY f.vec_id, c.probe_hamming
        )
        SELECT vec_id, cos_sim, probe_hamming, rank FROM (
            SELECT vec_id, probe_hamming,
                   dp / (sqrt(nf) * sqrt(nq)) AS cos_sim,
                   CAST(ROW_NUMBER() OVER (
                       ORDER BY dp / (sqrt(nf) * sqrt(nq)) DESC, vec_id
                   ) AS BIGINT) AS rank
            FROM scored
        ) WHERE rank <= {_ANN_K}
        """,
    )
    def q315_ann_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Multi-probe sign-LSH ANN for the corpus's first vector: the
        query bucket plus all Hamming-1 buckets, exact quantized-cosine
        rerank, per-hit probe distance. See block comment."""
        import math

        signs = _rademacher_signs()
        e = load_table(spark, "embeddings", sf_dir)
        vd = F.col("embedding").cast("array<double>")
        withb = e.withColumn("__bucket", _rademacher_bucket(vd))

        first = e.orderBy("vec_id").limit(1).select("embedding").collect()[0]
        qvec = [float(x) for x in first["embedding"]]
        qq = [math.floor(x * 1e6) for x in qvec]
        qbucket = 0
        for b in range(bits):
            acc = sum(s * q for s, q in zip(signs[b], qq))
            qbucket |= (1 if acc >= 0 else 0) << b
        probes = [qbucket] + [qbucket ^ (1 << i) for i in range(bits)]

        cand = withb.filter(F.col("__bucket").isin(probes)).withColumn(
            "probe_hamming",
            F.bit_count(
                F.col("__bucket").bitwiseXOR(F.lit(qbucket))
            ).cast("long"),
        )
        qcol = F.array(*[F.lit(x) for x in qvec])
        scored = cand.select(
            "vec_id",
            "probe_hamming",
            _qdot(vd, qcol).cast("double").alias("dp"),
            _qdot(vd, vd).cast("double").alias("nf"),
            _qdot(qcol, qcol).cast("double").alias("nq"),
        )
        cos = F.col("dp") / (F.sqrt(F.col("nf")) * F.sqrt(F.col("nq")))
        ranked = _ranked_topk(
            scored.select("vec_id", cos.alias("cos_sim"), "probe_hamming"),
            _ANN_K,
            "vec_id",
        )
        return ranked.select("vec_id", "cos_sim", "probe_hamming", "rank")


_register_q315()

# ---------------------------------------------------------------------------
# q318 — MULTI-PROBE hard-negative mining: q311's LSH-pruned per-anchor
# top-K with q315's Hamming-1 probe set composed into the bucket join —
# the recall-recovery lever q311's 100 TB posture cites, made concrete
# on the mining path itself (VERDICT r7 item 5). Each anchor probes its
# own bucket PLUS every Hamming-1 neighbor bucket (a borderline
# hyperplane vector most likely fell one bit away), so the candidate set
# is a strict SUPERSET of q311's: q318's per-rank cosine dominates
# q311's pointwise, and recall vs the exact tier q293 can only rise
# (both pytest laws).
#
# Scale shape: the probe expansion is a GENERATOR over a (bits+1)-long
# literal mask array on the anchor side — map-side, no extra scan — and
# the join stays a plain shuffle EQUI-join on the probed bucket value
# (never a Hamming-distance theta-join). Pair mass is (bits+1) ×
# Σ_b |bucket_b|² expected: the same constant-per-anchor asymptotics as
# q311 with a bits+1 constant factor, which is exactly the multi-probe
# trade (Lv et al. 2007 — T probes ≈ the recall of T independent hash
# tables at ONE table's memory). A pair can match under at most one
# mask (bucket_a ^ m = bucket_b pins m), so no dedup is needed. Each
# emitted negative carries probe_hamming (0 = q311's bucket, 1 =
# reached only by probing) so the probing contribution reads off the
# frame. Whole path oracle-replayed: q82's md5-Rademacher buckets, the
# mask cross-product, q293's quantized-cosine arithmetic, both ranks.
# ---------------------------------------------------------------------------


def _register_q318() -> None:
    bits, dim, kk = _Q82_BITS, _Q82_DIM, _HARDNEG_K
    masks = [0] + [1 << i for i in range(bits)]
    masks_sql = ", ".join(str(m) for m in masks)

    @_register(
        "q318_hard_negatives_multiprobe",
        oracle=f"""
        -- multi-referenced CTEs (flat x4, buckets/lab/norms x2)
        -- MATERIALIZED: DuckDB otherwise re-expands the embedding
        -- unnest per reference (measured 20 s -> 1.5 s at sf0.01)
        WITH flat AS MATERIALIZED (
            SELECT vec_id,
                   CAST(generate_subscripts(embedding, 1) AS BIGINT) AS pos,
                   CAST(unnest(embedding) AS DOUBLE) AS val
            FROM embeddings
        ),
        signs AS (
            SELECT b, pos,
                   CASE WHEN CAST('0x' || substr(
                            md5('hp-' || b || '-' || pos), 1, 15) AS BIGINT)
                        % 2 = 0 THEN 1 ELSE -1 END AS s
            FROM (SELECT unnest(range({bits})) AS b),
                 (SELECT unnest(range(1, {dim + 1})) AS pos)
        ),
        vq AS (
            SELECT vec_id, pos, CAST(FLOOR(val * 1e6) AS BIGINT) AS q
            FROM flat
        ),
        bits AS (
            SELECT vec_id, b,
                   CASE WHEN SUM(s * q) >= 0 THEN 1 ELSE 0 END AS bit
            FROM vq JOIN signs ON vq.pos = signs.pos
            GROUP BY vec_id, b
        ),
        buckets AS MATERIALIZED (
            SELECT vec_id, CAST(SUM(bit * (1 << b)) AS BIGINT) AS bucket
            FROM bits GROUP BY vec_id
        ),
        lab AS MATERIALIZED (
            SELECT vec_id, CAST(label AS BIGINT) AS label FROM embeddings
        ),
        norms AS MATERIALIZED (
            SELECT vec_id,
                   sqrt(CAST(SUM(CAST(FLOOR(val * val * 1e12) AS BIGINT))
                        AS DOUBLE)) AS n
            FROM flat GROUP BY vec_id
        ),
        probes AS (
            SELECT vec_id,
                   CAST(xor(bucket, CAST(m AS BIGINT)) AS BIGINT) AS pbucket,
                   CAST(CASE WHEN m = 0 THEN 0 ELSE 1 END AS BIGINT) AS ph
            FROM buckets, (SELECT unnest([{masks_sql}]) AS m)
        ),
        pairs AS (
            SELECT pa.vec_id AS a, bb.vec_id AS b,
                   la.label AS albl, lb.label AS blbl, pa.ph AS ph
            FROM probes pa
            JOIN buckets bb
              ON pa.pbucket = bb.bucket AND pa.vec_id <> bb.vec_id
            JOIN lab la ON la.vec_id = pa.vec_id
            JOIN lab lb ON lb.vec_id = bb.vec_id
            WHERE la.label <> lb.label
        ),
        dots AS (
            SELECT p.a, p.b, p.albl, p.blbl, p.ph,
                   CAST(SUM(CAST(FLOOR(f.val * g.val * 1e12) AS BIGINT))
                        AS DOUBLE) AS dp
            FROM pairs p
            JOIN flat f ON f.vec_id = p.a
            JOIN flat g ON g.vec_id = p.b AND g.pos = f.pos
            GROUP BY p.a, p.b, p.albl, p.blbl, p.ph
        ),
        ranked AS (
            SELECT d.a, d.b, d.albl, d.blbl, d.ph,
                   d.dp / (na.n * nb.n) AS cos,
                   ROW_NUMBER() OVER (
                       PARTITION BY d.a
                       ORDER BY d.dp / (na.n * nb.n) DESC, d.b
                   ) AS rn
            FROM dots d
            JOIN norms na ON d.a = na.vec_id
            JOIN norms nb ON d.b = nb.vec_id
        )
        SELECT a AS anchor_id, CAST(rn AS BIGINT) AS rank, b AS neg_id,
               albl AS anchor_label, blbl AS neg_label, cos AS cos_sim,
               ph AS probe_hamming
        FROM ranked WHERE rn <= {kk}
        """,
    )
    def q318_hard_negatives_multiprobe(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Per-anchor top-K wrong-label cosine neighbors among the
        anchor's sign-LSH bucket AND all its Hamming-1 neighbor buckets
        (multi-probe); each pick carries its probe distance. See block
        comment."""
        e = load_table(spark, "embeddings", sf_dir)
        vd = F.col("embedding").cast("array<double>")
        # One pass computes bucket + norm beside the vector; consumed by
        # BOTH join legs — persist or the scan+bucket folds run twice
        # (the q311 stance). Lifetime tied to the returned plan.
        base = e.select(
            "vec_id",
            F.col("label").cast("long").alias("label"),
            "embedding",
            _rademacher_bucket(vd, bits).alias("bucket"),
            _qdot(vd, vd).cast("double").alias("nrm2"),
        ).persist()
        left = base.select(
            F.col("vec_id").alias("anchor_id"),
            F.col("label").alias("anchor_label"),
            "bucket",
            F.col("embedding").alias("avec"),
            F.col("nrm2").alias("na2"),
        ).select(
            "*",
            F.explode(
                F.array(*[F.lit(m).cast("long") for m in masks])
            ).alias("mask"),
        ).select(
            "anchor_id", "anchor_label", "avec", "na2",
            F.col("bucket").bitwiseXOR(F.col("mask")).alias("pbucket"),
            F.bit_count("mask").cast("long").alias("probe_hamming"),
        )
        right = base.select(
            F.col("vec_id").alias("neg_id"),
            F.col("label").alias("neg_label"),
            F.col("bucket").alias("rbucket"),
            F.col("embedding").alias("bvec"),
            F.col("nrm2").alias("nb2"),
        )
        pairs = left.join(
            right,
            (F.col("pbucket") == F.col("rbucket"))
            & (F.col("anchor_id") != F.col("neg_id"))
            & (F.col("anchor_label") != F.col("neg_label")),
        )
        cos = (
            _qdot(
                F.col("avec").cast("array<double>"),
                F.col("bvec").cast("array<double>"),
            ).cast("double")
            / (F.sqrt("na2") * F.sqrt("nb2"))
        ).alias("cos_sim")
        scored = pairs.select(
            "anchor_id", "anchor_label", "neg_id", "neg_label",
            "probe_hamming", cos,
        )
        w = Window.partitionBy("anchor_id").orderBy(
            F.desc("cos_sim"), F.asc("neg_id")
        )
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= kk)
            .select(
                "anchor_id", F.col("rank").cast("long").alias("rank"),
                "neg_id", "anchor_label", "neg_label", "cos_sim",
                "probe_hamming",
            )
        )


_register_q318()


# ---------------------------------------------------------------------------
# q332 — Johnson-Lindenstrauss random projection with a DISTORTION
# AUDIT (Achlioptas 2003 ±1 database-friendly projections): the
# dimensionality-reduction primitive behind every "project 4096-dim
# embeddings down to d' and index THAT" pipeline. Each vector is
# projected from d=64 to d'=16 by a fixed ±1 sign matrix; the audit
# then measures, over a deterministic pair sample (consecutive vec_id
# pairs), the ratio of the projected squared distance (scaled by 1/d')
# to the exact squared distance — the quantity the JL lemma bounds —
# and reports its ppm histogram in quarter-width buckets.
#
# Everything is exact-integer: coordinates quantize to milli-units via
# FLOOR (cookbook: bare double→int CASTs truncate in Spark but round in
# DuckDB); the sign matrix derives from md5 parity — computed ONCE in
# pure Python (hashlib md5 ≡ engine md5) and folded into the plan as a
# literal 16×64 array (an index constant, the q315 driver-literal
# device), while the oracle recomputes the same signs from md5 in SQL,
# so the matrix is verifiably pseudo-random, not hand-picked. By
# linearity P(a−b) = P(a) − P(b), so projections are computed per
# VECTOR (map-only, one pass), never per pair.
#
# Plan shape: one scan → codegen'd HOF quantize+project per row → one
# equi-join on the derived pair key (AQE picks broadcast/shuffle) →
# map-side ratio → |buckets|-row histogram. At 100 TB: linear scan,
# one co-partitioned join, no Python, output bounded by the bucket
# grid. int64 audit: |c_j| ≤ d·2e3 ≈ 1.3e5, proj_d2 ≤ 16·(2.6e5)² ≈
# 1.1e12, ×1e6 ≈ 1.1e18 < 9.2e18.
# ---------------------------------------------------------------------------

_JL_DPRIME = 16
_JL_D = 64


def _jl_sign(j: int, k: int) -> int:
    import hashlib

    h = hashlib.md5(f"jl_{j}_{k}".encode()).hexdigest()
    return 1 if int(h[:15], 16) % 2 == 0 else -1


def _jl_sign_matrix_sql() -> str:
    rows = ", ".join(
        "array("
        + ", ".join(str(_jl_sign(j, k)) + "L" for k in range(_JL_D))
        + ")"
        for j in range(_JL_DPRIME)
    )
    return f"array({rows})"


@_register(
    "q332_jl_projection",
    oracle=f"""
    WITH sgn AS (
        SELECT j.j, k.k,
               CASE WHEN CAST('0x' || substr(
                        md5('jl_' || j.j || '_' || k.k), 1, 15)
                        AS BIGINT) % 2 = 0
                    THEN 1 ELSE -1 END AS s
        FROM (SELECT unnest(range({_JL_DPRIME})) AS j) j
        CROSS JOIN (SELECT unnest(range({_JL_D})) AS k) k
    ),
    q AS (
        SELECT vec_id,
               list_transform(embedding,
                   x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT))
                   AS xq
        FROM embeddings
    ),
    proj AS (
        SELECT q.vec_id, s.j,
               CAST(SUM(s.s * q.xq[CAST(s.k AS BIGINT) + 1]) AS BIGINT)
                   AS c
        FROM q CROSS JOIN sgn s
        GROUP BY q.vec_id, s.j
    ),
    pv AS (
        SELECT vec_id, list(c ORDER BY j) AS cs FROM proj GROUP BY vec_id
    ),
    pairs AS (
        SELECT a.vec_id AS id_a,
               (SELECT SUM((a.xq[t.i] - b.xq[t.i])
                           * (a.xq[t.i] - b.xq[t.i]))
                FROM (SELECT unnest(generate_series(1, {_JL_D})) AS i) t)
                   AS exact_d2,
               (SELECT SUM((pa.cs[t.i] - pb.cs[t.i])
                           * (pa.cs[t.i] - pb.cs[t.i]))
                FROM (SELECT unnest(generate_series(1, {_JL_DPRIME}))
                      AS i) t)
                   AS proj_d2
        FROM q a
        JOIN q b ON b.vec_id = a.vec_id + 1
        JOIN pv pa ON pa.vec_id = a.vec_id
        JOIN pv pb ON pb.vec_id = b.vec_id
        WHERE a.vec_id % 2 = 0
    ),
    ratios AS (
        SELECT CASE WHEN exact_d2 = 0 THEN 1000000
                    ELSE (1000000 * proj_d2) // ({_JL_DPRIME} * exact_d2)
               END AS ratio_ppm
        FROM pairs
    )
    SELECT CAST(ratio_ppm // 250000 AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(MIN(ratio_ppm) AS BIGINT) AS min_ppm,
           CAST(MAX(ratio_ppm) AS BIGINT) AS max_ppm,
           CAST(SUM(ratio_ppm) AS BIGINT) AS sum_ppm
    FROM ratios
    GROUP BY 1
    """,
)
def q332_jl_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ppm histogram of the JL distance-distortion ratio over
    consecutive-id vector pairs under a fixed md5-derived ±1 projection
    64 → 16. See block comment."""
    e = load_table(spark, "embeddings", sf_dir)
    smat = _jl_sign_matrix_sql()
    q = e.select(
        "vec_id",
        F.expr(
            "transform(embedding,"
            " x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT))"
        ).alias("xq"),
    ).select(
        "vec_id",
        "xq",
        F.expr(
            f"transform(sequence(0, {_JL_DPRIME - 1}),"
            f" j -> aggregate(zip_with(element_at({smat}, j + 1), xq,"
            f" (s, x) -> s * x), 0L, (acc, v) -> acc + v))"
        ).alias("cs"),
    )
    a = q.filter(F.col("vec_id") % 2 == 0).select(
        F.col("vec_id").alias("id_a"),
        F.col("xq").alias("xq_a"),
        F.col("cs").alias("cs_a"),
        (F.col("vec_id") + 1).alias("pair_id"),
    )
    b = q.select(
        F.col("vec_id").alias("pair_id"),
        F.col("xq").alias("xq_b"),
        F.col("cs").alias("cs_b"),
    )
    sq_d2 = (
        "aggregate(zip_with({0}, {1}, (x, y) -> (x - y) * (x - y)),"
        " 0L, (acc, v) -> acc + v)"
    )
    pairs = a.join(b, "pair_id").select(
        F.expr(sq_d2.format("xq_a", "xq_b")).alias("exact_d2"),
        F.expr(sq_d2.format("cs_a", "cs_b")).alias("proj_d2"),
    )
    ratios = pairs.select(
        F.when(F.col("exact_d2") == 0, F.lit(1000000).cast("long"))
        .otherwise(
            F.expr(f"(1000000L * proj_d2) div ({_JL_DPRIME}L * exact_d2)")
        )
        .alias("ratio_ppm")
    )
    return ratios.groupBy(
        F.expr("ratio_ppm div 250000").cast("long").alias("bucket")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.min("ratio_ppm").cast("long").alias("min_ppm"),
        F.max("ratio_ppm").cast("long").alias("max_ppm"),
        F.sum("ratio_ppm").cast("long").alias("sum_ppm"),
    )


# ---------------------------------------------------------------------------
# q355 — MMR DIVERSE RETRIEVAL (Carbonell & Goldstein 1998 maximal
# marginal relevance): greedily select k = 5 results from the exact
# top-32 cosine pool, each step maximizing λ·rel − (1−λ)·max-sim-to-
# selected with λ = 0.7 — the diversity re-ranker every RAG stack runs
# after ANN recall (q27/q315 produce the pool; this query prunes its
# redundancy). The query vector is the corpus's min-vec_id row (the
# q27 anchor).
#
# Integer contract: milli-quantized coordinates (FLOOR(x·1000), the
# q332 device) make every dot an exact int64 (≤ 64·4·10^6 ≈ 2.6e8);
# λ clears to tenths: score10 = 7·rel − 3·maxsim, ties on vec_id.
# The first pick's maxsim is 0 by definition.
#
# Scale shape: ONE corpus scan computes rel via a codegen'd literal
# fold (no shuffle before the bounded top-k); the pool is 32 rows of
# documented driver state (the q315 probe-set stance) and the greedy
# loop is k·|pool| integer ops on the driver — MMR is inherently
# sequential in k, so the distributed part is exactly the part that
# scales with the corpus. Oracle: the full greedy unrolled as 5 CTE
# steps with correlated max-sim subqueries.
# ---------------------------------------------------------------------------

_Q355_POOL = 32
_Q355_K = 5


def _register_q355() -> None:
    # every greedy-step CTE is multi-referenced (pool by all K
    # steps, sels{t} by step and union) — AS MATERIALIZED or the
    # correlated max-sim subqueries replay the whole chain per
    # reference (measured 10.1 s -> 0.2 s at sf0.01; q212 rule)
    dot = (
        "(SELECT SUM({a}.xq[u.i] * {b}.xq[u.i])"
        " FROM (SELECT unnest(generate_series(1, 64)) AS i) u)"
    )
    steps = []
    for t in range(2, _Q355_K + 1):
        prev = t - 1
        steps.append(f"""
    step{t} AS MATERIALIZED (
        SELECT p.vec_id, p.xq, p.rel,
               (SELECT MAX({dot.format(a='p', b='s')})
                FROM sels{prev} s) AS ms
        FROM pool p
        WHERE p.vec_id NOT IN (SELECT vec_id FROM sels{prev})
    ),
    sel{t} AS MATERIALIZED (
        SELECT vec_id, xq, rel, ms FROM step{t}
        ORDER BY 7 * rel - 3 * ms DESC, vec_id LIMIT 1
    ),
    sels{t} AS MATERIALIZED (
        SELECT vec_id, xq, rel, ms, rnk FROM sels{prev}
        UNION ALL
        SELECT vec_id, xq, rel, ms, {t} FROM sel{t}
    )""")
    chain = ",".join(steps)

    @_register(
        "q355_mmr_rerank",
        oracle=f"""
    WITH q AS MATERIALIZED (
        SELECT list_transform(embedding,
               x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS xq
        FROM embeddings
        WHERE vec_id = (SELECT MIN(vec_id) FROM embeddings)
    ),
    c0 AS MATERIALIZED (
        SELECT vec_id,
               list_transform(embedding,
               x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS xq
        FROM embeddings
        WHERE vec_id != (SELECT MIN(vec_id) FROM embeddings)
    ),
    rel AS MATERIALIZED (
        SELECT c.vec_id, c.xq,
               CAST({dot.format(a='c', b='q')} AS BIGINT) AS rel
        FROM c0 c, q
    ),
    pool AS MATERIALIZED (
        SELECT vec_id, xq, rel FROM (
            SELECT vec_id, xq, rel,
                   ROW_NUMBER() OVER (ORDER BY rel DESC, vec_id) AS rk
            FROM rel
        ) WHERE rk <= {_Q355_POOL}
    ),
    sel1 AS MATERIALIZED (
        SELECT vec_id, xq, rel, CAST(0 AS BIGINT) AS ms FROM pool
        ORDER BY rel DESC, vec_id LIMIT 1
    ),
    sels1 AS MATERIALIZED (SELECT vec_id, xq, rel, ms, 1 AS rnk FROM sel1),
    {chain}
    SELECT CAST(rnk AS BIGINT) AS rnk,
           CAST(vec_id AS BIGINT) AS vec_id,
           CAST(rel AS BIGINT) AS rel_dot,
           CAST(ms AS BIGINT) AS max_sim_dot,
           CAST(7 * rel - 3 * ms AS BIGINT) AS score10
    FROM sels{_Q355_K}
    """,
    )
    def q355_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Greedy MMR (λ = 0.7) selection of 5 diverse results from the
        exact cosine top-32 pool. See block comment."""
        from etl_globalretail_spark.operators.ranks import global_topk

        e = load_table(spark, "embeddings", sf_dir)
        qid = e.agg(F.min("vec_id")).collect()[0][0]  # anchor scalar
        qrow = e.filter(F.col("vec_id") == qid).select(
            F.expr(
                "transform(embedding,"
                " x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT))"
            ).alias("xq")
        ).collect()[0]["xq"]  # d ints — the q27 inlined-literal device
        qlit = "array(" + ", ".join(f"{v}L" for v in qrow) + ")"
        scored = e.filter(F.col("vec_id") != qid).select(
            "vec_id",
            F.expr(
                "transform(embedding,"
                " x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT))"
            ).alias("xq"),
        ).withColumn(
            "rel",
            F.expr(
                f"aggregate(zip_with(xq, {qlit}, (a, b) -> a * b),"
                " 0L, (acc, v) -> acc + v)"
            ),
        )
        pool = global_topk(
            scored, [("rel", "desc"), ("vec_id", "asc")], _Q355_POOL,
            out="rk",
        ).select("vec_id", "xq", "rel").collect()
        # 32-row documented driver pool; greedy MMR is sequential in k
        cands = {
            r["vec_id"]: (list(r["xq"]), int(r["rel"])) for r in pool
        }
        selected: list[tuple] = []
        while len(selected) < _Q355_K and len(selected) < len(cands):
            best = None
            for vid, (xq, rel) in cands.items():
                if any(vid == s[1] for s in selected):
                    continue
                ms = max(
                    (
                        sum(a * b for a, b in zip(xq, sxq))
                        for _, _, sxq, _, _ in selected
                    ),
                    default=0,
                )
                score = 7 * rel - 3 * ms
                key = (-score, vid)
                if best is None or key < best[0]:
                    best = (key, vid, xq, rel, ms)
            selected.append(best)
        return spark.createDataFrame(
            [
                (i + 1, vid, rel, ms, 7 * rel - 3 * ms)
                for i, (_, vid, _, rel, ms) in enumerate(selected)
            ],
            "rnk long, vec_id long, rel_dot long, max_sim_dot long,"
            " score10 long",
        )


_register_q355()


# ---------------------------------------------------------------------------
# q417 — GRAPH-BASED ANN: multi-start greedy search on an exact kNN
# proximity graph — the NSW/HNSW search primitive (Malkov & Yashunin
# 2016, public), completing the engine's ANN ladder (q27 brute, q82
# sign-LSH, q123 IVF, q297 PQ-ADC, q318 multi-probe; graph search is
# the production-standard family those approximate-index tiers feed).
#
# Determinism contract (identical both engines, all int64/HUGEINT):
# vectors quantize to floor(v·1e6); GRAPH = each vector's top-16 by
# (integer dot DESC, vec_id ASC), self excluded; PROBES = the 4
# vectors with smallest (md5(vec_id), vec_id) (the q248 seed
# convention); ENTRIES = the 8 md5-NEXT ids (disjoint from probes,
# shared across probes); SEARCH = 10 greedy steps per (probe, entry):
# next = argmax over {current} ∪ neighbors(current) − {probe} by
# (dot-to-probe DESC, vec_id ASC). Including `current` makes each walk
# MONOTONE, so the fixed unroll is stationary past convergence — the
# q74 early-stop-≡-chain device. Report per probe: the exact best
# non-self dot (ground truth), the best endpoint dot across entries,
# the hit flag, and found/exact in permil (integer div) — greedy NSW
# without a hierarchy is NOT 100% recall; the permil column is the
# honest quality signal (≈900 at sf0.1 in rehearsal).
#
# Scale posture: the GRAPH BUILD rides the blocked tile engine
# (_neardup_pairs_blocked's cogroup device — per-tile numpy int64
# matmul, per-src per-tile top-16 partials, one grouped rank merges
# them; the driver never holds vectors). The SEARCH is driver-
# sequenced with BOUNDED per-step fetches: ≤|walks| current nodes'
# adjacency rows and ≤|walks|·17 candidate vectors per step, both
# memo-cached across steps (stationary walks stop fetching) — each a
# pushdown-filtered collect of documented driver scalars. The exact
# ground truth is ONE map-only aggregate (probe vectors folded in as
# literals). The oracle replays graph, probes, entries and all steps.
# ---------------------------------------------------------------------------

_Q417_DEG = 16    # graph out-degree
_Q417_ENTRIES = 8
_Q417_STEPS = 10


def _register_q417() -> None:
    DEG, NE, ST = _Q417_DEG, _Q417_ENTRIES, _Q417_STEPS
    NP = _Q248_PROBES

    flat = """
        SELECT vec_id,
               CAST(generate_subscripts(embedding, 1) AS BIGINT) AS pos,
               CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000000)
                    AS BIGINT) AS q
        FROM embeddings
    """
    steps = []
    for r in range(1, ST + 1):
        steps.append(f"""s{r} AS MATERIALIZED (
            SELECT probe_id, entry_id, cur FROM (
                SELECT c.probe_id, c.entry_id, c.cand AS cur,
                       ROW_NUMBER() OVER (
                           PARTITION BY c.probe_id, c.entry_id
                           ORDER BY pd.dot DESC, c.cand
                       ) AS rn
                FROM (
                    SELECT probe_id, entry_id, cur AS cand
                    FROM s{r - 1}
                    UNION ALL
                    SELECT s.probe_id, s.entry_id, g.dst
                    FROM s{r - 1} s JOIN graph g ON g.src = s.cur
                ) c
                JOIN pdots pd
                  ON pd.probe_id = c.probe_id AND pd.vec_id = c.cand
                WHERE c.cand <> c.probe_id
            ) WHERE rn = 1
        )""")
    steps_sql = ",".join(steps)

    @_register(
        "q417_graph_ann_search",
        oracle=f"""
        WITH flat AS MATERIALIZED ({flat}),
        seeds AS MATERIALIZED (
            SELECT vec_id,
                   ROW_NUMBER() OVER (
                       ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
                   ) AS rk
            FROM embeddings
        ),
        probes AS (SELECT vec_id AS probe_id FROM seeds WHERE rk <= {NP}),
        entries AS (
            SELECT vec_id AS entry_id FROM seeds
            WHERE rk > {NP} AND rk <= {NP + NE}
        ),
        dots AS MATERIALIZED (
            SELECT a.vec_id AS src, b.vec_id AS dst,
                   SUM(a.q * b.q) AS dot
            FROM flat a JOIN flat b
              ON a.pos = b.pos AND a.vec_id <> b.vec_id
            GROUP BY a.vec_id, b.vec_id
        ),
        graph AS MATERIALIZED (
            SELECT src, dst FROM (
                SELECT src, dst,
                       ROW_NUMBER() OVER (
                           PARTITION BY src ORDER BY dot DESC, dst
                       ) AS rn
                FROM dots
            ) WHERE rn <= {DEG}
        ),
        pdots AS MATERIALIZED (
            SELECT p.probe_id, d.dst AS vec_id, d.dot
            FROM probes p JOIN dots d ON d.src = p.probe_id
        ),
        exact AS (
            SELECT probe_id, MAX(dot) AS exact_dot
            FROM pdots GROUP BY probe_id
        ),
        s0 AS (
            SELECT p.probe_id, e.entry_id, e.entry_id AS cur
            FROM probes p JOIN entries e ON e.entry_id <> p.probe_id
        ),
        {steps_sql},
        found AS (
            SELECT f.probe_id, MAX(pd.dot) AS found_dot
            FROM s{ST} f
            JOIN pdots pd
              ON pd.probe_id = f.probe_id AND pd.vec_id = f.cur
            GROUP BY f.probe_id
        )
        SELECT e.probe_id,
               CAST(e.exact_dot AS BIGINT) AS exact_dot_q,
               CAST(f.found_dot AS BIGINT) AS found_dot_q,
               CAST(CASE WHEN f.found_dot = e.exact_dot
                         THEN 1 ELSE 0 END AS BIGINT) AS hit_top1,
               CAST(f.found_dot * 1000 // e.exact_dot AS BIGINT)
                   AS found_permil,
               CAST({NE} AS BIGINT) AS n_entries
        FROM exact e JOIN found f ON f.probe_id = e.probe_id
        """,
    )
    def q417_graph_ann_search(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Multi-start greedy NSW search on the exact integer kNN
        graph: per-probe exact-vs-found top-1 dots, hit flags and
        found/exact permil. See block comment for the determinism and
        scale contract."""
        import numpy as np
        import pandas as pd

        e = load_table(spark, "embeddings", sf_dir)
        base = e.select(
            "vec_id",
            F.transform(
                "embedding",
                lambda x: F.floor(x.cast("double") * F.lit(1e6))
                .cast("long"),
            ).alias("qv"),
        )
        seeds = base.orderBy(
            F.md5(F.col("vec_id").cast("string")), F.col("vec_id")
        ).limit(NP + NE).collect()  # NP+NE rows — bounded driver scalars
        probe_ids = [int(r["vec_id"]) for r in seeds[:NP]]
        entry_ids = [int(r["vec_id"]) for r in seeds[NP:NP + NE]]
        pvecs = {
            int(r["vec_id"]): np.array(list(r["qv"]), dtype=np.int64)
            for r in seeds[:NP]
        }

        # ---- graph build: blocked tile engine (no driver vectors) ----
        n_blocks = 8
        tiles = spark.createDataFrame(
            [(i, j) for i in range(n_blocks) for j in range(n_blocks)],
            "bi int, bj int",
        )
        ev = base.select(
            F.col("vec_id").alias("vid"), F.col("qv").alias("vec"),
            F.pmod("vec_id", F.lit(n_blocks)).cast("int").alias("blk"),
        )
        left = ev.join(
            F.broadcast(tiles), F.col("blk") == F.col("bi")
        ).select("bi", "bj", "vid", "vec")
        right = ev.join(
            F.broadcast(tiles), F.col("blk") == F.col("bj")
        ).select(
            F.col("bi").alias("rbi"), F.col("bj").alias("rbj"),
            F.col("vid").alias("rvid"), F.col("vec").alias("rvec"),
        )
        empty = pd.DataFrame({"src": [], "dst": [], "dot": []})

        def tile_topk(key, lpdf, rpdf):
            if lpdf.empty or rpdf.empty:
                return empty
            a_ids = lpdf["vid"].to_numpy(dtype=np.int64)
            b_ids = rpdf["rvid"].to_numpy(dtype=np.int64)
            A = np.array(list(lpdf["vec"]), dtype=np.int64)
            B = np.array(list(rpdf["rvec"]), dtype=np.int64)
            D = A @ B.T  # exact: |q| ≤ 1e6 → 64·1e12 ≪ 2⁶³
            out_s, out_d, out_v = [], [], []
            for i in range(len(a_ids)):
                d = D[i]
                keep = b_ids != a_ids[i]
                cid, cd = b_ids[keep], d[keep]
                sel = np.lexsort((cid, -cd))[:DEG]
                out_s += [int(a_ids[i])] * len(sel)
                out_d += [int(cid[s]) for s in sel]
                out_v += [int(cd[s]) for s in sel]
            return pd.DataFrame(
                {
                    "src": pd.Series(out_s, dtype="int64"),
                    "dst": pd.Series(out_d, dtype="int64"),
                    "dot": pd.Series(out_v, dtype="int64"),
                }
            )

        partials = left.groupBy("bi", "bj").cogroup(
            right.groupBy("rbi", "rbj")
        ).applyInPandas(tile_topk, schema="src long, dst long, dot long")
        wsrc = Window.partitionBy("src").orderBy(
            F.desc("dot"), F.asc("dst")
        )
        graph = materialize(
            partials.withColumn("rn", F.row_number().over(wsrc))
            .filter(F.col("rn") <= DEG)
            .select("src", "dst")
        )

        # ---- exact ground truth: ONE map-only aggregate ----
        def pdot(pvec) -> Column:
            arr = F.array(*[F.lit(int(x)).cast("long") for x in pvec])
            return F.aggregate(
                F.zip_with("qv", arr, lambda a, b: a * b),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            )

        exact_row = base.agg(
            *[
                F.max(
                    F.when(F.col("vec_id") != pid, pdot(pvecs[pid]))
                ).alias(f"e{pid}")
                for pid in probe_ids
            ]
        ).collect()[0]
        exact = {pid: int(exact_row[f"e{pid}"]) for pid in probe_ids}

        # ---- greedy walks: driver-sequenced, bounded memoized fetches
        adj: dict[int, list[int]] = {}
        vecs: dict[int, "np.ndarray"] = {
            int(r["vec_id"]): np.array(list(r["qv"]), dtype=np.int64)
            for r in seeds
        }

        def fetch_frontier(nodes: list[int]) -> None:
            """Adjacency rows WITH the neighbor vectors attached
            engine-side (graph ⋈ base on dst): ONE bounded driver job
            per step instead of an adjacency collect chased by a vector
            collect (r10 — the two fetches were sequential jobs, ~2×
            driver-job overhead per step). ≤ |walks|·DEG rows; every
            walk's own vector is already memoized (entries come from
            ``seeds``, later currents were a previous step's dst)."""
            missing = [n for n in nodes if n not in adj]
            if not missing:
                return
            rows = (
                graph.filter(F.col("src").isin(missing))
                .join(base.withColumnRenamed("vec_id", "dst"), "dst")
                .collect()
            )
            for n in missing:
                adj[n] = []
            for r in rows:
                dst = int(r["dst"])
                adj[int(r["src"])].append(dst)
                if dst not in vecs:
                    vecs[dst] = np.array(list(r["qv"]), dtype=np.int64)

        walks = {
            (pid, eid): eid
            for pid in probe_ids
            for eid in entry_ids
            if eid != pid
        }
        for _ in range(ST):
            fetch_frontier(sorted({cur for cur in walks.values()}))
            new_walks = {}
            for (pid, eid), cur in walks.items():
                pv = pvecs[pid]
                cands = [c for c in [cur, *adj[cur]] if c != pid]
                best = max(
                    cands,
                    key=lambda c: (int(pv @ vecs[c]), -c),
                )
                new_walks[(pid, eid)] = best
            walks = new_walks
        out = []
        for pid in probe_ids:
            found = max(
                int(pvecs[pid] @ vecs[cur])
                for (p, _), cur in walks.items()
                if p == pid
            )
            out.append(
                (
                    pid,
                    exact[pid],
                    found,
                    1 if found == exact[pid] else 0,
                    found * 1000 // exact[pid],
                    NE,
                )
            )
        return spark.createDataFrame(
            out,
            "probe_id long, exact_dot_q long, found_dot_q long, "
            "hit_top1 long, found_permil long, n_entries long",
        )


_register_q417()
