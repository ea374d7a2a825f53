"""Embedding similarity search (brute-force + LSH-bucketed ANN).

Cosine math is pure higher-order-function column algebra over
``array<float>`` — ``zip_with``/``aggregate`` run JVM-side with a strict
left-to-right fold, which is what makes the DuckDB oracle able to
reproduce the doubles bit-for-bit (same cast-to-double, same fold order).

Scale notes (10^9 vectors):
- brute-force top-k is the correctness baseline: broadcast the (small)
  query set, one pass over the corpus, per-query top-k via window. Cost
  O(queries × corpus) — fine for ≤10^3 queries over any corpus size
  because it stays a single scan with map-side work.
- the scale path is sign-hyperplane LSH (random-projection SimHash):
  bucket = sign bits of ⟨v, p_j⟩ for NUM_PLANES deterministic ±1 planes.
  Bucketing is a per-row projection; candidate generation is an
  equi-join on the bucket id (shuffle keyed on an 8-bit-ish value →
  salt-friendly), exact cosine re-ranks only within buckets. Recall is
  tunable via planes/probes; an IVF variant would swap the bucket fn for
  a k-means assignment with the same join shape.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from crawler_spark.functions.texthash import h64_seeded

# Shared knobs — sqlgen imports these.
TOPK_K = 3
NEARDUP_COSINE = 0.3
NUM_PLANES = 8
EMBED_DIM = 64


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ as a strict sequential double fold (oracle-reproducible)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_sq(a: Column) -> Column:
    return dot(a, a)


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / F.sqrt(norm_sq(a) * norm_sq(b))


def cosine_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = TOPK_K,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force exact top-k cosine neighbors for the given query ids.

    The query side is broadcast (tiny) → no shuffle on the corpus scan;
    the only shuffle is the per-query top-k window over |queries|·|corpus|
    scored rows, which AQE coalesces."""
    q = emb.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    scored = (
        emb.join(F.broadcast(q), F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.round(cosine(F.col("q_vec"), F.col(vec_col)), 4).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .select("query_id", "neighbor_id", "cos_sim", F.col("_rn").alias("rank"))
    )


def cosine_neardup_pairs(
    emb: DataFrame,
    threshold: float = NEARDUP_COSINE,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs with cosine ≥ threshold (exact, O(n²) — the oracle
    baseline; use :func:`lsh_neardup_pairs` at scale)."""
    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b", F.round(cosine(F.col("va"), F.col("vb")), 4).alias("cos_sim")
        )
        .where(F.col("cos_sim") >= threshold)
    )


# ----------------------------------------------------- deterministic planes --


def hyperplanes(num_planes: int = NUM_PLANES, dim: int = EMBED_DIM) -> list[list[int]]:
    """±1 hyperplanes derived from md5(plane:dim) — deterministic,
    embeddable as literals in both the Spark plan and the oracle SQL."""
    planes = []
    for j in range(num_planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"plane{j}:{d}".encode()).hexdigest()
            row.append(1 if int(h[0], 16) % 2 == 0 else -1)
        planes.append(row)
    return planes


def lsh_bucket(
    vec: Column, num_planes: int = NUM_PLANES, dim: int = EMBED_DIM
) -> Column:
    """Sign-bit bucket id in [0, 2^num_planes)."""
    planes = hyperplanes(num_planes, dim)
    bucket = F.lit(0).cast("long")
    for j, p in enumerate(planes):
        plane_col = F.array(*[F.lit(float(v)) for v in p])
        d = dot(vec, plane_col)
        bucket = bucket + F.when(
            d >= 0, F.shiftleft(F.lit(1).cast("long"), j)
        ).otherwise(F.lit(0).cast("long"))
    return bucket


def lsh_neardup_pairs(
    emb: DataFrame,
    threshold: float = NEARDUP_COSINE,
    num_planes: int = NUM_PLANES,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN near-dup pairs: candidates = same LSH bucket, then exact cosine
    re-rank. Approximate (bucket boundaries cost recall) but linear-ish:
    the join is keyed on the bucket id instead of all-pairs."""
    bucketed = emb.select(
        F.col(id_col), F.col(vec_col), lsh_bucket(F.col(vec_col), num_planes).alias("bucket")
    )
    a = bucketed.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), "bucket")
    b = bucketed.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), "bucket")
    return (
        a.join(b, "bucket")
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b", F.round(cosine(F.col("va"), F.col("vb")), 4).alias("cos_sim")
        )
        .where(F.col("cos_sim") >= threshold)
    )


IVF_NPROBE = 2


def centroid_vectors(
    emb: DataFrame, label_col: str = "label", vec_col: str = "embedding"
) -> DataFrame:
    """Full per-cell mean vector (the IVF coarse quantizer). Each dim is
    rounded to 6 dp so the centroid constants are bit-identical across
    engines (avg-of-doubles differs in the last bits between fold orders;
    the rounding collapses that far below any decision boundary)."""
    dim_cols = [
        F.round(F.avg(F.element_at(F.col(vec_col), d + 1).cast("double")), 6).alias(f"d{d}")
        for d in range(EMBED_DIM)
    ]
    agg = emb.groupBy(label_col).agg(*dim_cols)
    return agg.select(
        F.col(label_col).alias("cell"),
        F.array(*[F.col(f"d{d}") for d in range(EMBED_DIM)]).alias("centroid"),
    )


def assign_cells_mapside(
    emb: DataFrame, cent_rows, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Nearest-centroid cell per vector as a pure map-side argmax: the
    collected centroid rows (ncells ≪ corpus) are embedded as literals
    and the winner is ``array_min`` over ``struct(-score, cell)`` —
    zero shuffle over the corpus, no window, tie-break (highest cosine,
    lowest cell) identical to the oracle's ORDER BY. Shared by IVF-Flat
    probing and SemDedup clustering."""
    scored = F.array(
        *[
            F.struct(
                (
                    -cosine(
                        F.col(vec_col),
                        F.array(*[F.lit(float(v)) for v in r["centroid"]]),
                    )
                ).alias("neg_s"),
                F.lit(r["cell"]).alias("cell"),
            )
            for r in cent_rows
        ]
    )
    return emb.select(
        F.col(id_col),
        F.col(vec_col),
        F.array_min(scored).getField("cell").alias("cell"),
    )


# Within-cell pair-join bound. A skewed embedding distribution can put
# 10-30% of the corpus in ONE cell (c ≈ √n centroids does not guarantee
# balance), turning the "O(n^1.5)" within-cell join O(n²) in practice.
# Cells above the cap are deterministically sub-split (see semdedup).
SEMDEDUP_MAX_CELL = 4096


def semdedup(
    emb: DataFrame,
    threshold: float = NEARDUP_COSINE,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cell_vectors: int = SEMDEDUP_MAX_CELL,
) -> DataFrame:
    """SemDedup (Abbas et al. 2023, arXiv:2303.09540 — public): prune
    semantic near-duplicates INSIDE coarse clusters instead of across
    all pairs. Assign every vector to its nearest centroid (map-side
    argmax, zero shuffle), then compare pairs only within a cell and
    drop any vector that has a lower-id cell-mate above the cosine
    threshold (keep-lowest-id — deterministic; the paper's
    keep-farthest-from-centroid is a one-line swap of the keep key).

    This is the scale route for embedding dedup: all-pairs is O(n²);
    with c ≈ √n cells the within-cell work is O(n²/c) ≈ O(n^1.5), and
    each cell's pair join is an equi-join on the cell id — skewed mega
    cells are the known failure mode, handled the same way as hot LSH
    buckets: a cell holding more than ``max_cell_vectors`` vectors is
    deterministically sub-split into ``ceil(n/cap)`` shards keyed by
    ``vec_id % nshards`` and pairs are compared only within a shard.
    The split bounds every join bucket to ~cap² pair work (bounded skew,
    AQE-splittable); near-dups landing in different shards of a mega
    cell are the documented recall trade. ``vec_id % nshards`` (not a
    random salt) keeps the drop set deterministic, so the DuckDB twin
    applies the identical rule and oracle parity holds under planted
    skew.

    Returns (vec_id, cell, is_kept) for every vector — the audit view;
    filter ``is_kept`` for the pruned corpus."""
    cent_rows = sorted(
        centroid_vectors(emb, vec_col=vec_col).collect(), key=lambda r: r["cell"]
    )
    # persisted because THREE branches read it (both pair-join sides +
    # the final verdict join) — without the cache the corpus-wide scan +
    # ncells-way argmax would run three times per action (same rule as
    # dedup.filter_unseen_pruned's probed cache). Spark evicts it LRU
    # after the query; long-lived pipelines can unpersist explicitly.
    assigned = assign_cells_mapside(
        emb, cent_rows, id_col=id_col, vec_col=vec_col
    ).persist()
    # mega-cell guard: per-cell shard counts are ncells scalars — collect
    # them (one tiny agg over the persisted cache) and embed as a literal
    # map, exactly like the centroid constants; the shard key is then a
    # pure map-side expression, no join re-entering the plan. nshards=1
    # below the cap, so the common case shards everything to 0.
    sizes = assigned.groupBy("cell").agg(F.count(F.lit(1)).alias("n")).collect()
    nsh_map = F.create_map(
        *[
            lit
            for r in sorted(sizes, key=lambda x: x["cell"])
            for lit in (
                F.lit(r["cell"]),
                F.lit(-(-int(r["n"]) // max_cell_vectors)),
            )
        ]
    )
    sub = assigned.withColumn(
        "_shard",
        F.pmod(F.col(id_col).cast("long"), F.element_at(nsh_map, F.col("cell"))),
    )
    a = sub.select(
        F.col("cell"), F.col("_shard"), F.col(id_col).alias("_ida"), F.col(vec_col).alias("_va")
    )
    b = sub.select(
        F.col("cell"), F.col("_shard"), F.col(id_col).alias("_idb"), F.col(vec_col).alias("_vb")
    )
    dropped = (
        a.join(b, ["cell", "_shard"])
        .where(F.col("_ida") < F.col("_idb"))
        .where(F.round(cosine(F.col("_va"), F.col("_vb")), 4) >= threshold)
        .select(F.col("_idb").alias(id_col))
        .distinct()
    )
    return (
        assigned.join(dropped.withColumn("_drop", F.lit(True)), id_col, "left")
        .select(
            id_col,
            "cell",
            F.coalesce(~F.col("_drop"), F.lit(True)).alias("is_kept"),
        )
    )


def ivf_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = TOPK_K,
    nprobe: int = IVF_NPROBE,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-Flat approximate top-k: assign every vector to its nearest
    centroid cell (cosine, ties → lowest cell), probe the ``nprobe``
    closest cells per query, exact-search only inside them.

    The scale path past LSH: search cost drops from O(corpus) to
    O(corpus·nprobe/ncells) per query. The collected centroid table
    (ncells ≪ corpus, rounded to 6 dp so both engines see identical
    doubles) is embedded as literals, so cell assignment is a pure
    map-side per-row argmax — zero shuffle over the corpus, no window.
    Tie-break (highest cosine, lowest cell) is expressed as
    ``array_min`` over ``struct(-score, cell)``, identical to the
    oracle's ``ORDER BY cos DESC, cell ASC``. Candidate generation is an
    equi-join on the cell id with the tiny probe side broadcast."""
    cent_rows = sorted(
        centroid_vectors(emb, vec_col=vec_col).collect(), key=lambda r: r["cell"]
    )
    assigned = assign_cells_mapside(emb, cent_rows, id_col=id_col, vec_col=vec_col)
    cents = F.broadcast(
        emb.sparkSession.createDataFrame(
            [(r["cell"], [float(v) for v in r["centroid"]]) for r in cent_rows],
            "cell int, centroid array<double>",
        )
    )
    q = emb.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    qs = q.crossJoin(cents).select(
        "query_id", "q_vec", "cell", cosine(F.col("q_vec"), F.col("centroid")).alias("_s")
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("_s"), F.asc("cell"))
    probes = (
        qs.withColumn("_rn", F.row_number().over(wq))
        .where(F.col("_rn") <= nprobe)
        .select("query_id", "q_vec", "cell")
    )
    cand = (
        assigned.join(F.broadcast(probes), "cell")
        .where(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.round(cosine(F.col("q_vec"), F.col(vec_col)), 4).alias("cos_sim"),
        )
    )
    wr = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(wr)).where(F.col("rank") <= k)
    )


def centroids(emb: DataFrame, label_col: str = "label", vec_col: str = "embedding") -> DataFrame:
    """Per-label centroid norm (IVF seed shape): mean of each dimension,
    reported as the rounded L2 norm (scalar — oracle-hashable)."""
    dim_cols = [
        F.avg(F.element_at(F.col(vec_col), d + 1).cast("double")).alias(f"d{d}")
        for d in range(EMBED_DIM)
    ]
    agg = emb.groupBy(label_col).agg(*dim_cols, F.count("*").alias("n_vecs"))
    sq = F.lit(0.0)
    for d in range(EMBED_DIM):
        sq = sq + F.col(f"d{d}") * F.col(f"d{d}")
    return agg.select(
        label_col, F.col("n_vecs"), F.round(F.sqrt(sq), 4).alias("centroid_norm")
    )


QUANT_LEVELS = 127  # int8 symmetric range


def quantize_embeddings(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Symmetric per-dimension int8 scalar quantization (faiss-SQ8
    shape): q_d = floor(x_d * 127 / max|x_d|), the storage step that
    shrinks a 10^9-vector float32 corpus 4x before ANN.

    Scale shape: the per-dim max|x| is ONE exploded partial aggregate
    (docs x dims rows combine map-side down to ``dims`` rows), the
    64-float scale vector broadcasts, and quantization is a single
    zip_with map pass — no shuffle of the corpus. floor (not round)
    keeps both engines' IEEE doubles bit-identical.

    Returns (id, qvec array<int>, l1 bigint) — l1 is the quantized
    Manhattan norm, the cheap magnitude signal int8 ANN re-rankers use.
    """
    dim_max = (
        emb.select(F.posexplode(vec_col).alias("pos", "v"))
        .groupBy("pos")
        .agg(F.max(F.abs(F.col("v").cast("double"))).alias("m"))
    )
    mx = dim_max.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "m"))),
            lambda s: s["m"],
        ).alias("ms")
    )
    qd = F.zip_with(
        F.col(vec_col),
        F.col("ms"),
        lambda x, m: F.when(m == 0.0, F.lit(0.0)).otherwise(
            F.floor(x.cast("double") * QUANT_LEVELS / m)
        ),
    )
    return (
        emb.crossJoin(F.broadcast(mx))
        .select(
            id_col,
            F.transform(qd, lambda v: v.cast("int")).alias("qvec"),
        )
        .withColumn(
            "l1",
            F.aggregate(
                "qvec",
                F.lit(0).cast("long"),
                lambda acc, x: acc + F.abs(x).cast("long"),
            ),
        )
    )


def ann_recall(
    emb: DataFrame,
    query_ids: list[int],
    k: int = TOPK_K,
    nprobe: int = IVF_NPROBE,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, k_eff, hits, recall_pm): recall@k of the IVF-Flat
    index against exact brute-force ground truth, per query.

    The standard ANN quality harness (measure, don't guess): run the
    SAME queries through :func:`ivf_topk` and :func:`cosine_topk` and
    count how many exact top-k neighbors the index returned. At corpus
    scale the ground truth is computed for a SAMPLE of queries only —
    exact search is O(corpus) per query, which is precisely why the
    index exists; the sample bounds that cost while still estimating
    recall. recall is integer per-mille of ``k_eff`` (the exact list's
    size — < k when the corpus is small), so the report is bit-stable.
    """
    exact = cosine_topk(emb, query_ids, k, id_col, vec_col).select(
        "query_id", "neighbor_id"
    )
    approx = ivf_topk(emb, query_ids, k, nprobe, id_col, vec_col).select(
        "query_id", F.col("neighbor_id").alias("_approx_n")
    )
    j = exact.join(
        approx,
        (exact["query_id"] == approx["query_id"])
        & (exact["neighbor_id"] == approx["_approx_n"]),
        "left",
    ).select(exact["query_id"].alias("query_id"), "_approx_n")
    return j.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("k_eff"),
        F.count("_approx_n").alias("hits"),
        F.expr("count(_approx_n) * 1000 div count(*)").alias("recall_pm"),
    )


# ------------------------------------------------- product quantization --
#
# Jégou, Douze & Schmid, "Product Quantization for Nearest Neighbor
# Search" (TPAMI 2011 — public; faiss's PQ): split each vector into M
# subvectors and quantize each against its own K-word codebook, so a
# 64-float32 vector stores as M=4 bytes — 64x smaller than float32 and
# 16x smaller than SQ8 (quantize_embeddings above). IVF gives the
# coarse cell; PQ is what makes the residual fit in RAM at 10^9+
# vectors.
#
# Codebook: the K training vectors with the SMALLEST seeded-md5 hash of
# vec_id — a deterministic uniform sample (the k-means++-free seeding
# step; a production train would run Lloyd rounds from these seeds with
# the exact same assignment plan below, each round one partial-agg
# mean per (m, code)). Deterministic sampling keeps the whole operator
# integer/data-exact so the DuckDB twin is row-identical — raw float32
# codewords, no averaged values to round.
#
# Scale shape: the codebook is M·K = 64 subvectors collected once
# (bounded, like the IVF cent_rows) and embedded as literals; encoding
# is a PURE MAP — per subspace an array_min over struct(d²_micro,
# code), zero shuffle over the corpus, no window, no join. Distances
# are quantized ONCE to int64 micro-units (round(d²·10⁶)) — comparing
# and summing integers thereafter, because re-rounding a SUM of
# rounded doubles lands exactly on decimal half-boundaries where
# Spark's HALF_UP BigDecimal and DuckDB's binary-double rounding
# disagree (observed: Σ of four 6-dp values = 1.25995 → 1.26 vs
# 1.2599). Ties break on the lower code id in both engines.

PQ_M = 4  # subvectors per vector
PQ_K = 16  # codewords per sub-codebook (1 byte stores two codes)
PQ_SUBDIM = EMBED_DIM // PQ_M
PQ_SEED = 41


def _l2sq_sub(vec: Column, m: int, codeword) -> Column:
    """Squared L2 between subvector m of ``vec`` and a literal codeword
    slice, as the same strict sequential double fold as :func:`dot`."""
    sub = F.slice(vec, m * PQ_SUBDIM + 1, PQ_SUBDIM)
    lit = F.array(
        *[F.lit(float(codeword[m * PQ_SUBDIM + i])) for i in range(PQ_SUBDIM)]
    )
    return F.aggregate(
        F.zip_with(sub, lit, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pq_encode(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, c0..c{M-1}, recon_err_u6): per-subspace nearest-codeword
    codes against the deterministic sampled codebook, plus the total
    squared reconstruction error in int64 micro-units. One bounded
    collect (K codebook rows), then a zero-shuffle map over the
    corpus."""
    sample = (
        emb.select(
            id_col,
            vec_col,
            h64_seeded(F.col(id_col).cast("string"), PQ_SEED).alias("h"),
        )
        .orderBy("h", id_col)
        .limit(PQ_K)
        .collect()
    )
    cols = [F.col(id_col)]
    errs = []
    for m in range(PQ_M):
        cands = F.array(
            *[
                F.struct(
                    F.round(
                        _l2sq_sub(F.col(vec_col), m, sample[j][vec_col])
                        * F.lit(1_000_000.0)
                    )
                    .cast("long")
                    .alias("d"),
                    F.lit(j).alias("c"),
                )
                for j in range(PQ_K)
            ]
        )
        best = F.array_min(cands)
        cols.append(best.getField("c").cast("int").alias(f"c{m}"))
        errs.append(best.getField("d"))
    err = errs[0]
    for e in errs[1:]:
        err = err + e
    cols.append(err.cast("long").alias("recon_err_u6"))
    return emb.select(*cols)
