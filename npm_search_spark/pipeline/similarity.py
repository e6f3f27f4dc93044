"""Similarity search over an embedding column (array<float>).

  brute-force cosine top-k   exact baseline: broadcast the query set,
                             zip_with dot products (JVM-side), window top-k
  LSH-bucketed ANN           random-hyperplane signatures -> bucket join ->
                             top-k within bucket (the 100 TB scale path:
                             the corpus is scanned once, shuffled only by
                             bucket key, never all-pairs)

Hyperplanes are derived deterministically from (plane index, dimension)
hashes — reproducible across runs/cluster sizes with no RNG state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

N_PLANES = 16


def _norm(v):
    return F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))




def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbours per query vector. The query set is broadcast;
    the corpus is scanned once (no shuffle of the big side); ranking
    shuffles only (n_queries x corpus) -> reduced per-query rows."""
    # r6: norms are hoisted BELOW the join — computed once per input row
    # instead of once per (query x corpus) pair (the join multiplies rows
    # n_queries-fold, and CollapseProject cannot inline a projection
    # across the join boundary, so the hoist survives optimization). The
    # per-pair expression keeps the exact `_dot / (_norm(q) * _norm(c))`
    # left-fold arithmetic, so cos values are bit-identical to the
    # previous shape. Measured at sf1.0 (100k pairs, dim 64): 1.23 s ->
    # 0.79 s noop-sink. (Unrolling the folds into GetArrayItem chains was
    # measured SLOWER — 2.4 s — the per-element array accesses re-evaluate
    # the upstream cast; the interpreted fold evaluates it once.)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qvec"),
        _norm(F.col(vec_col).cast("array<double>")).alias("_qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cvec"),
        _norm(F.col(vec_col).cast("array<double>")).alias("_cn"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cos",
            F.round(
                _dot(F.col("qvec"), F.col("cvec")) / (F.col("_qn") * F.col("_cn")),
                6,
            ),
        )
        .select("query_id", "neighbor_id", "cos")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def hyperplane(plane_idx: int, dim: int):
    """Deterministic pseudo-random unit-free hyperplane: component d =
    (hash(plane, d) scaled to [-1, 1])."""
    return F.array(
        *[
            (F.hash(F.lit(plane_idx), F.lit(d)).cast("double") / F.lit(2147483647.0))
            for d in range(dim)
        ]
    )


def lsh_signature(vec_col, dim: int, n_planes: int = N_PLANES):
    """n_planes sign bits packed into a long bucket id."""
    bits = [
        F.when(_dot(vec_col.cast("array<double>"), hyperplane(p, dim)) >= 0, F.lit(1)).otherwise(F.lit(0))
        for p in range(n_planes)
    ]
    out = F.lit(0).cast("long")
    for i, b in enumerate(bits):
        out = out + (b.cast("long") * F.lit(2**i).cast("long"))
    return out


def lsh_probe_buckets(vec_col, dim: int, n_planes: int, probe_radius: int = 0):
    """The query's bucket plus every bucket within ``probe_radius`` sign
    flips (multiprobe LSH): near-boundary neighbors land one plane away, so
    probing Hamming-adjacent buckets buys recall without growing buckets."""
    sig = lsh_signature(vec_col, dim, n_planes)
    probes = [F.lit(0).cast("long")]
    if probe_radius >= 1:
        probes += [F.lit(1 << i).cast("long") for i in range(n_planes)]
    if probe_radius >= 2:
        probes += [
            F.lit((1 << i) | (1 << j)).cast("long")
            for i in range(n_planes)
            for j in range(i + 1, n_planes)
        ]
    return F.transform(F.array(*probes), lambda m: sig.bitwiseXOR(m))


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_radius: int = 0,
) -> DataFrame:
    """Approximate top-k: candidates share one of the query's probe buckets
    (its own hyperplane-sign bucket, plus Hamming-``probe_radius``
    neighbors — multiprobe); exact cosine ranks within the candidates.
    Recall/latency tuned by n_planes (fewer planes -> bigger buckets) and
    probe_radius (more probes -> higher recall, more candidates)."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cvec"),
        _norm(F.col(vec_col).cast("array<double>")).alias("_cn"),
        lsh_signature(F.col(vec_col), dim, n_planes).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qvec"),
        _norm(F.col(vec_col).cast("array<double>")).alias("_qn"),
        F.explode(
            lsh_probe_buckets(F.col(vec_col), dim, n_planes, probe_radius)
        ).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cos",
            # norms hoisted below the join (r6, see cosine_topk) — same
            # left-fold arithmetic, bit-identical values
            F.round(
                _dot(F.col("qvec"), F.col("cvec")) / (F.col("_qn") * F.col("_cn")),
                6,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def ivf_centroids(
    corpus: DataFrame, k: int = 16, id_col: str = "vec_id", vec_col: str = "embedding"
) -> list[list[float]]:
    """Deterministic centroid seed: the k corpus vectors with the smallest
    xxhash64(id) — reproducible across runs and cluster sizes without RNG
    or iterative k-means (good enough as coarse quantizer cells; swap in
    k-means refinement when recall targets demand it).

    Plan note: orderBy+limit(k) compiles to TakeOrderedAndProject — a
    per-partition bounded heap merged on the driver (O(n) scan, k rows
    moved per partition), NOT a global sort; plan-asserted in
    tests/test_plans.py."""
    rows = (
        corpus.select(id_col, vec_col)
        .orderBy(F.xxhash64(F.col(id_col)))
        .limit(k)
        .collect()
    )
    return [list(map(float, r[vec_col])) for r in rows]


def ivf_centroids_kmeans(
    corpus: DataFrame,
    k: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Lloyd-refined coarse quantizer: start from the deterministic hash
    seed (ivf_centroids) and run ``iters`` distributed k-means steps —
    assign each vector to its nearest centroid with the JVM-side argmin,
    recompute centroids as per-cell means via posexplode + hash agg.

    Scale shape per iteration: one corpus scan (narrow — centroid argmin
    is a codegen'd expression over broadcast-literal centroids), one
    shuffle keyed by (cell, dim) with map-side partial aggregation, and
    k x dim result rows to the driver. No per-row Python, no RNG —
    deterministic per configuration (same data, partitioning and session
    config replay bitwise; across different partition layouts the F.avg
    merges float partials in shuffle order, so boundary cells may differ
    at the last ulp). Empty cells keep their previous centroid (the
    standard degenerate-cell rule)."""
    cents = ivf_centroids(corpus, k, id_col, vec_col)
    dim = len(cents[0]) if cents else 0
    for _ in range(iters):
        # two selects: a generator (posexplode) in the same projection as
        # the argmin struct expression makes the analyzer re-plan the
        # struct through Generate and drop its field aliases
        assigned = corpus.select(
            ivf_cell(F.col(vec_col), cents).alias("_cell"),
            F.col(vec_col).cast("array<double>").alias("_v"),
        ).select("_cell", F.posexplode("_v").alias("_dim", "_val"))
        rows = assigned.groupBy("_cell", "_dim").agg(F.avg("_val").alias("_m")).collect()
        means: dict[int, dict[int, float]] = {}
        for r in rows:
            means.setdefault(r["_cell"], {})[r["_dim"]] = r["_m"]
        cents = [
            [means[i][d] for d in range(dim)] if i in means else c
            for i, c in enumerate(cents)
        ]
    return cents


def _sq_l2(vec_col, lit_vec: list[float]):
    lit_arr = F.array(*[F.lit(float(x)) for x in lit_vec])
    return F.aggregate(
        F.zip_with(vec_col, lit_arr, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def ivf_cell(vec_col, centroids: list[list[float]]):
    """Nearest-centroid cell id (argmin over literal centroids)."""
    entries = F.array(
        *[
            F.struct(_sq_l2(vec_col.cast("array<double>"), c).alias("d"), F.lit(i).alias("cid"))
            for i, c in enumerate(centroids)
        ]
    )
    return F.array_min(entries)["cid"]


def ivf_probe_cells(vec_col, centroids: list[list[float]], nprobe: int):
    """The nprobe nearest cells for a query vector."""
    entries = F.array(
        *[
            F.struct(_sq_l2(vec_col.cast("array<double>"), c).alias("d"), F.lit(i).alias("cid"))
            for i, c in enumerate(centroids)
        ]
    )
    return F.transform(
        F.slice(F.array_sort(entries), 1, nprobe), lambda e: e["cid"]
    )


def ivf_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: the corpus is partitioned into coarse cells
    (computed once — at scale, persisted with the table); each query probes
    its nprobe nearest cells and ranks exactly within them. The corpus-side
    cell assignment is a narrow map; the search shuffles only (cell) keys."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cvec"),
        _norm(F.col(vec_col).cast("array<double>")).alias("_cn"),
        ivf_cell(F.col(vec_col), centroids).alias("cell"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qvec"),
        _norm(F.col(vec_col).cast("array<double>")).alias("_qn"),
        F.explode(ivf_probe_cells(F.col(vec_col), centroids, nprobe)).alias("cell"),
    )
    scored = (
        c.join(F.broadcast(q), "cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cos",
            # norms hoisted below the join (r6, see cosine_topk)
            F.round(
                _dot(F.col("qvec"), F.col("cvec")) / (F.col("_qn") * F.col("_cn")),
                6,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def embedding_cosine_dup_pairs_lsh(
    df: DataFrame, threshold: float = 0.95, dim: int = 64,
    id_col: str = "vec_id", vec_col: str = "embedding", n_planes: int = 8,
) -> DataFrame:
    """APPROXIMATE near-duplicate pairs, LSH-bucketed (single band of
    ``n_planes`` hyperplane sign bits -> bucket equi-join). Misses a pair
    when any hyperplane separates it: per-pair miss probability is
    1 - (1 - theta/pi)^n_planes (theta = the pair's angle) — ~0 for exact
    copies, small-but-nonzero for near-copies. This is the one-scan,
    bucket-shuffled shape for corpus-scale dedup where a documented recall
    bound is acceptable; `embedding_cosine_dup_pairs` below is the exact
    variant the oracle-gated battery runs."""
    c = df.select(
        F.col(id_col).alias("a"),
        F.col(vec_col).cast("array<double>").alias("va"),
        _norm(F.col(vec_col).cast("array<double>")).alias("_an"),
        lsh_signature(F.col(vec_col), dim, n_planes).alias("bucket"),
    )
    d = df.select(
        F.col(id_col).alias("b"),
        F.col(vec_col).cast("array<double>").alias("vb"),
        _norm(F.col(vec_col).cast("array<double>")).alias("_bn"),
        lsh_signature(F.col(vec_col), dim, n_planes).alias("bucket"),
    )
    return (
        c.join(d, "bucket")
        .where(F.col("a") < F.col("b"))
        .withColumn(
            "cos",
            # norms hoisted below the join (r6, see cosine_topk)
            F.round(
                _dot(F.col("va"), F.col("vb")) / (F.col("_an") * F.col("_bn")),
                6,
            ),
        )
        .where(F.col("cos") >= threshold)
        .select("a", "b", "cos")
        .distinct()
    )


def embedding_cosine_dup_pairs(
    df: DataFrame, threshold: float = 0.95, dim: int = 64,
    id_col: str = "vec_id", vec_col: str = "embedding",
    block_rows: int = 4096, n_planes: int | None = None,
) -> DataFrame:
    """EXACT embedding-cosine near-duplicate pairs (unordered, a < b,
    round(cos, 6) >= threshold) as a blocked all-pairs similarity join.

    Random-hyperplane LSH cannot be exact for non-identical vectors (round
    5's sf1.0 battery measured a 0.2% pair miss on near-copies), and this
    operator's contract — it is oracle-gated against brute force — is
    exactness. Plan shape:

    1. hash-assign each vector to one of P = ceil(n/block_rows) blocks and
       pack each block into ONE Arrow row (ids int64 + row-normalized
       float64 matrix bytes) via applyInPandas — one shuffle of the corpus,
       P rows out;
    2. join the block table to itself on lb <= rb — the P(P+1)/2 block-pair
       grid, each task BLAS-multiplies Ml @ Mr.T (vectorized, ~1 GFLOP per
       4096x4096x64 tile) and emits candidate id pairs at
       threshold - 1e-6 (the margin covers gemm-vs-sequential float
       summation drift);
    3. equi-join candidates back to the vectors and keep
       round(cosine, 6) >= threshold computed with the same JVM expression
       the rest of the engine uses, so emitted values are bit-identical to
       the other cosine paths.

    All-pairs exactness costs O(P^2) block pairs by nature; at the 10^10
    north star run this on the deduped/filtered candidate subset, or accept
    the recall bound and use `embedding_cosine_dup_pairs_lsh`.

    ``dim``/``n_planes`` are accepted for call-site compatibility with the
    LSH variant and ignored (the exact method needs neither)."""
    # one projected, checkpointed frame feeds everything (the count, the
    # pack stage and both verify sides) — the upstream lineage used to be
    # re-evaluated four times (r6, ADVICE #1)
    base = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    ).localCheckpoint(eager=False)
    n = base.count()
    n_blocks = max(1, -(-n // block_rows))
    margin = 1e-6

    def pack(pdf):
        import numpy as np
        import pandas as pd

        ids = pdf["_id"].to_numpy(dtype=np.int64)
        mat = np.stack(pdf["_v"].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0.0] = 1.0
        mat = mat / norms[:, None]
        return pd.DataFrame(
            {
                "blk": [int(pdf["blk"].iloc[0])],
                "ids": [ids.tobytes()],
                "mat": [mat.tobytes()],
            }
        )

    blocks = (
        base.select(
            F.pmod(F.xxhash64(F.col("_id")), F.lit(n_blocks)).cast("int").alias("blk"),
            "_id",
            "_v",
        )
        .groupBy("blk")
        .applyInPandas(pack, "blk int, ids binary, mat binary")
        .localCheckpoint(eager=False)  # packed once; both grid sides read it
    )
    # r6 (ADVICE #2): the non-equi lb <= rb condition runs over the TINY
    # (blk) index frame only; each side's multi-MB packed payload then
    # equi-joins in by block id — the nested-loop join never carries the
    # matrices.
    blks = blocks.select("blk")
    tiles = (
        blks.alias("l")
        .join(blks.alias("r"), F.col("l.blk") <= F.col("r.blk"))
        .select(F.col("l.blk").alias("lb"), F.col("r.blk").alias("rb"))
    )
    grid = (
        tiles.join(
            blocks.select(
                F.col("blk").alias("lb"), F.col("ids").alias("lids"),
                F.col("mat").alias("lmat"),
            ),
            "lb",
        )
        .join(
            blocks.select(
                F.col("blk").alias("rb"), F.col("ids").alias("rids"),
                F.col("mat").alias("rmat"),
            ),
            "rb",
        )
    )

    def emit(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            for row in pdf.itertuples(index=False):
                la = np.frombuffer(row.lids, dtype=np.int64)
                ra = np.frombuffer(row.rids, dtype=np.int64)
                ml = np.frombuffer(row.lmat, dtype=np.float64).reshape(len(la), -1)
                mr = np.frombuffer(row.rmat, dtype=np.float64).reshape(len(ra), -1)
                sims = ml @ mr.T
                ii, jj = np.nonzero(sims >= threshold - margin)
                a, b = la[ii], ra[jj]
                if row.lb == row.rb:
                    keep = a < b  # diagonal tile: upper triangle only
                    a, b = a[keep], b[keep]
                lo, hi = np.minimum(a, b), np.maximum(a, b)
                yield pd.DataFrame({"a": lo, "b": hi})

    cand = grid.mapInPandas(emit, "a long, b long")
    va = base.select(F.col("_id").alias("a"), F.col("_v").alias("va"))
    vb = base.select(F.col("_id").alias("b"), F.col("_v").alias("vb"))
    return (
        cand.join(va, "a")
        .join(vb, "b")
        .withColumn(
            "cos",
            F.round(cosine(F.col("va"), F.col("vb")), 6),
        )
        .where(F.col("cos") >= threshold)
        .select("a", "b", "cos")
    )
