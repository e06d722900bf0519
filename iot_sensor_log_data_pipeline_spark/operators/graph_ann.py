"""Graph ANN: k-NN-graph construction by LSH-seeded NN-descent and
batched greedy beam-search probes -- the graph member of the ANN
family (LSH / IVF / PQ in ``similarity.py`` + ``ann_index.py``).

Why not HNSW itself: HNSW's layered build inserts points ONE AT A
TIME, each insertion greedily searching the graph built so far -- an
inherently sequential recurrence with no DataFrame expression (the
same reason LTTB runs in ``applyInPandas``: order-dependent state).
The scalable-relational restatement of "navigable neighborhood graph +
greedy search" is:

- BUILD, small corpora (``seed="lsh"``): NN-descent (Dong, Moses &
  Li, WWW 2011, "Efficient K-Nearest Neighbor Graph Construction for
  Generic Similarity Measures"): seed
  each node's neighbor list from SRP-LSH band buckets (the engine's
  existing banding machinery), then iterate "my neighbors' neighbors
  are candidate neighbors" -- per round one self-join of the
  undirected edge list, an anti-join against already-scored pairs,
  exact cosine on the NEW candidates only, and a per-node top-k
  window.  Every step is a bounded equi-join: seeding emits
  <= bands * seed_cap pairs per node (hot-bucket ring cap,
  ``lsh_seed_pairs``) and each round a node contributes
  <= (2 * build_k)^2 candidates (out-degree AND reverse degree both
  capped at the working width), so cost is ~N * 16k^2 cosines,
  never N^2 -- even when m near-identical vectors share every band
  bucket.
- BUILD, at scale (``seed="ivf"``, the derived default above
  ``IVF_SEED_MIN_N`` -- round 14): the IVF cogroup EXACT join at the
  derived ``ivf_geometry`` -- every node's exact top-``build_k``
  within its probed coarse cells, computed as vectorized per-cell
  matmuls with a deterministic hot-cell cap.  NN-descent's
  convergence collapses once LSH ring seeds are a vanishing corpus
  fraction (edge recall 0.23 at 50k after one round); the cell-exact
  seed measures 0.88 there at ~1/10 the wall-clock, with ``n_iter``
  refinement rounds kept as optional polish.  See
  ``graph_geometry`` for the measured derivation.
- PROBE: batched best-first beam search over the persisted adjacency
  lists: all queries advance together, one frontier-to-adjacency
  equi-join per hop, exact cosine against the touched vectors only,
  top-``beam`` per query between hops.  ``hops`` is fixed (like
  ``graph.pagerank_fixed``), so the plan is a bounded join chain.
  ``beam``/``hops`` derive from the build-time corpus size by
  default: short-range-only edges mean the walk budget must grow
  ~log N (``graph_geometry``), the navigability cost HNSW pays with
  layers.

Determinism: hyperplanes are md5-derived, NN-descent rounds are fixed
count, ties break on node id -- identical output across runs and
partitionings (pytest).  The result is approximate by nature (no SQL
oracle can replay a graph walk cheaply), so the catalog row is
rows-only and the accuracy contract lives in the recall-floor pytest
and the bench's recall@10 line -- the same verification story as
``similarity_ivf_ann``.

On-disk layout (``build_graph_index``), matching ``ann_index.py``:

    <root>/config/   one row: kind='knn_graph', k, n_iter, n_entry
    <root>/graph/    (src, dst, score) directed k-NN adjacency
    <root>/vectors/  (id, vec, nrm) re-rank + scoring vectors
    <root>/entries/  (id) the n_entry md5-smallest node ids -- the
                     deterministic search entry points
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from .ann_index import (
    _local_fs_path,
    _read_small,
    _run_overlapped,
    _sub,
    _write_small,
)
from .similarity import _srp_bands_udf, dot, hash_hyperplanes, l2_norm

#: Default NN-descent neighbor-list width; also the per-node fan-out
#: the beam search explores per hop.
DEFAULT_K = 10

#: Default per-(band, bucket) seed degree.  A corpus with m
#: near-identical vectors collides them in EVERY band, so an uncapped
#: bucket self-join emits bands * m^2 seed pairs -- the same quadratic
#: bomb the dedup anchors cap guards against (``dedup.verbatim_runs``).
#: The cap must neither strand nodes (keeping c members and
#: self-joining them gives the other m - c members ZERO seeds in every
#: band) nor funnel everyone through the same few hubs (a hub-star
#: throttles NN-descent: candidates reachable through a hub are only
#: its 2k stored edges, and recall plateaus -- measured 0.86 vs 0.98
#: at sf0.1).  Ring seeding does both: per (band, bucket) the members
#: are sorted by md5(band_id, id) into a ring and each connects to its
#: next ``seed_cap`` successors.  <= bands * m * seed_cap pairs
#: (linear in the bucket), every member keeps min(m - 1, seed_cap)
#: seed edges, and the union of ``bands`` independently-ordered rings
#: is a random ~(bands * seed_cap)-regular graph -- an expander, the
#: random-neighbor initialization the NN-descent paper assumes
#: (Dong et al. 2011 §2.2), so refinement converges instead of
#: stalling behind hubs.
DEFAULT_SEED_CAP = 16

#: Corpus size above which ``build_graph_index`` seeds the graph from
#: the IVF cogroup exact join instead of LSH rings + NN-descent (see
#: ``graph_geometry``).  Below it the two builds measure equal (and
#: every small-scale invariant pytest predates the threshold); above
#: it NN-descent's convergence collapses -- measured round 14.
IVF_SEED_MIN_N = 20_000


def graph_geometry(n_vectors: int, k: int = DEFAULT_K) -> dict:
    """Corpus-scaled graph build + probe geometry -- the knn_graph
    member of the derived-geometry family (``similarity.ivf_geometry``
    / ``ivfpq_geometry``): the round-8 fixed defaults (LSH-ring
    NN-descent build; beam 32 x 5 hops) were tuned at the ~6k-vector
    bench corpus and COLLAPSE quietly at scale -- measured round 14 at
    the defaults: probe recall@10 0.998 at 6k, 0.286 at 50k, 0.064 at
    200k.  Two independent failures, each with its own derived knob:

    - BUILD: one NN-descent round from 4-bit SRP ring seeds stops
      converging once the seeds are a vanishing fraction of the corpus
      (edge recall 0.23 at 50k; +~0.1/round at ~100 s/round there, so
      round count cannot close the gap).  Above ``IVF_SEED_MIN_N`` the
      build seeds from the IVF cogroup EXACT join instead
      (``similarity.ivf_cogroup_join`` at the derived
      ``ivf_geometry``): cell-local exact top-k gives edge recall
      0.88 at 50k in ~1/10 the NN-descent wall-clock, with no
      refinement rounds needed (they stay available as
      ``n_iter`` polish).
    - PROBE: a pure k-NN graph has only short-range edges, so the
      beam budget must grow with the entry-to-neighborhood distance,
      ~log N (the navigability cost HNSW pays with layers).  Measured
      at 50k over the 0.88-edge-recall graph: beam 32 x 5 hops 0.664,
      beam 64 x 10 hops 0.946.

    Derivation (log2 steps above the ~3k-vector regime where the old
    defaults were correct; each step widens the beam by 24 and adds 2
    hops):

        steps  = max(1, ceil(log2(n / 3000)))
        beam   = max(32, 24 * steps),  hops = max(5, 2 * steps)
        seed   = "ivf" if n >= IVF_SEED_MIN_N else "lsh"
        n_iter = 0 for ivf (cell-exact seeds), 1 for lsh

    At 6k this reproduces the round-8 defaults exactly (lsh, 1 round,
    beam 32, hops 5) -- bench-scale behavior is unchanged; at 200k it
    derives ivf / beam 168 / hops 14."""
    import math

    n = max(int(n_vectors), 1)
    steps = max(1, math.ceil(math.log2(max(n, 2) / 3000.0)))
    seed = "ivf" if n >= IVF_SEED_MIN_N else "lsh"
    return {
        "seed": seed,
        "n_iter": 0 if seed == "ivf" else 1,
        "beam": max(32, 24 * steps),
        "hops": max(5, 2 * steps),
    }


def _build_geometry(cfg) -> dict[str, int]:
    """Build geometry from a persisted index config row, with the
    defaults in force WHEN PRE-GEOMETRY INDEXES WERE BUILT (rounds
    <= 8: ``build_k = 2 * k``, not today's ``3 * k``) for configs
    persisted before the geometry columns existed -- an older
    4-column config must keep appending/optimizing with the widths its
    edges were actually built at, not die on a missing field."""
    d = cfg.asDict() if hasattr(cfg, "asDict") else dict(cfg)
    k = int(d["k"])
    return {
        "bands": int(d.get("bands") or 16),
        "rows_per_band": int(d.get("rows_per_band") or 4),
        "seed_cap": int(d.get("seed_cap") or DEFAULT_SEED_CAP),
        "build_k": int(d.get("build_k") or 2 * k),
        # Round-14 columns: seed strategy + build-time corpus size
        # (probe-budget derivation).  Pre-round-14 configs were all
        # LSH-seeded and predate the derived probe budget (0 keeps the
        # fixed round-8 beam/hops for them).
        "seed": str(d.get("seed") or "lsh"),
        "n_vectors": int(d.get("n_vectors") or 0),
    }


def _graph_tombstones(spark, path: str):
    """The distinct tombstoned ids of a graph index, or None -- the
    graph twin of the ann_index family's read-layer delete hook."""
    import os as _os

    tomb = _sub(path, "tombstones")
    if _os.path.exists(tomb):
        return spark.read.parquet(tomb).select("id").distinct()
    return None


def _read_graph_table(
    spark, path: str, name: str, exclude_batch: int | None = None
):
    """A graph-index table unioned with its streaming segment tree
    (``<name>_stream/batch=<id>``) when one exists -- the knn_graph
    member of the family segment contract.  ``exclude_batch`` drops
    one batch id from the union: the ingest path's own probe reads
    main + every segment EXCEPT the one it is about to (re)write, so
    a replayed batch links against the same graph it saw the first
    time instead of its own prior write."""
    import os as _os

    main = spark.read.parquet(_sub(path, name))
    seg_dir = _sub(path, f"{name}_stream")
    if _os.path.exists(seg_dir):
        seg = spark.read.option("basePath", seg_dir).parquet(seg_dir)
        if exclude_batch is not None:
            seg = seg.where(F.col("batch") != int(exclude_batch))
        main = main.unionByName(seg.select(*main.columns))
    return main


#: Size gate for the driver-local beam search (round 15): when the
#: whole persisted graph index (adjacency + vectors + live segments)
#: is at most this many bytes on a LOCAL filesystem, the probe walks
#: it driver-side instead of scheduling ~3 Spark jobs per hop.  The
#: round-14 profile showed the distributed probe is job-scheduling
#: bound at this scale (similarity_graph_seed_ann: 52 jobs, 2.5 s of
#: its 3.8 s wall in inter-job gaps) -- the same diagnosis that moved
#: KB-scale metadata I/O driver-side (``ann_index._write_small``),
#: applied to a MB-scale read-only walk.  The default matches the
#: session's broadcast threshold (64 MB): an index the engine would
#: happily broadcast to every executor is also safe to hold once on
#: the driver.  Above the gate (or on non-local URIs, or with an
#: ``allowed`` filter) the distributed beam search runs unchanged.
_DRIVER_PROBE_MAX_BYTES = int(
    os.environ.get("ENGINE_GRAPH_DRIVER_PROBE_MAX_BYTES", str(64 * 1024 * 1024))
)


def _local_dir_bytes(path: str) -> int | None:
    """Total bytes of files under ``path`` (recursive), or None when the
    directory does not exist."""
    if not os.path.isdir(path):
        return None
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                return None
    return total


def _read_graph_table_local(
    lp: str, name: str, exclude_batch: int | None, columns: list[str]
):
    """pyarrow table of a graph-index table unioned with its live
    streaming segments -- the driver-side twin of ``_read_graph_table``
    (same union and ``exclude_batch`` semantics, no Spark jobs)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    parts = [pq.read_table(_sub(lp, name), columns=columns)]
    seg_dir = _sub(lp, f"{name}_stream")
    if os.path.isdir(seg_dir):
        for entry in sorted(os.listdir(seg_dir)):
            if not entry.startswith("batch="):
                continue
            if exclude_batch is not None and entry == f"batch={int(exclude_batch)}":
                continue
            sub = os.path.join(seg_dir, entry)
            if os.path.isdir(sub):
                parts.append(pq.read_table(sub, columns=columns))
    return pa.concat_tables(parts) if len(parts) > 1 else parts[0]


def _fold_dot_cols(A, B):
    """Row-wise dot of two float64 (n, d) matrices with the EXACT
    left-to-right add order of ``similarity.dot``'s JVM fold: one
    vectorized float64 multiply + add per dimension, sequential across
    dimensions.  Elementwise IEEE ops are identical scalar-vs-vector,
    so the result is bit-identical to the distributed scorer."""
    import numpy as np

    acc = np.zeros(A.shape[0], dtype="float64")
    for d in range(A.shape[1]):
        acc = acc + A[:, d] * B[:, d]
    return acc


def _round6_like_spark(x: float) -> float:
    """``F.round(x, 6)`` replayed exactly: Spark rounds DoubleType via
    BigDecimal(Double.toString(x)).setScale(6, HALF_UP), and BigDecimal
    has no negative zero (so -1e-9 rounds to +0.0)."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    if math.isnan(x) or math.isinf(x):
        return x
    v = float(Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP))
    return 0.0 if v == 0.0 else v


_PA_TO_SPARK_ID_TYPES = {
    "int64": T.LongType(),
    "int32": T.IntegerType(),
    "string": T.StringType(),
    "large_string": T.StringType(),
}


def _driver_beam_search(
    spark: SparkSession,
    lp: str,
    queries: DataFrame,
    k: int,
    beam: int,
    hops: int,
    id_col: str,
    vec_col: str,
    exclude_batch: int | None,
) -> DataFrame | None:
    """Driver-local replay of the batched beam search for indexes small
    enough to hold in driver memory (gated by the caller): identical
    dataflow -- entry scoring, per-hop frontier-to-adjacency expansion
    minus the current frontier, exact cosine on the touched set, beam
    truncation on (score desc, node asc) -- with every float op
    replayed bit-identically (``_fold_dot_cols``, ``_round6_like_spark``,
    NaN-first descending order).  Returns None on any shape this replay
    does not cover (the caller falls back to the distributed walk):
    exotic id types, duplicate query ids, NULL/ragged vectors.
    """
    import math

    import numpy as np

    # --- corpus tables (driver-side reads, no Spark jobs) ---
    vec_tbl = _read_graph_table_local(
        lp, "vectors", exclude_batch, ["id", "vec", "nrm"]
    )
    id_t = str(vec_tbl.schema.field("id").type)
    if id_t not in _PA_TO_SPARK_ID_TYPES:
        return None
    ids = vec_tbl.column("id").to_pylist()
    vec_lists = vec_tbl.column("vec").to_pylist()
    nrms = vec_tbl.column("nrm").to_pylist()
    if any(v is None for v in vec_lists) or any(n is None for n in nrms):
        return None
    dims = {len(v) for v in vec_lists}
    if len(dims) > 1:
        return None
    dim = dims.pop() if dims else 0

    tomb: set = set()
    tomb_dir = _sub(lp, "tombstones")
    if os.path.isdir(tomb_dir):
        import pyarrow.parquet as pq

        tomb = set(pq.read_table(tomb_dir, columns=["id"]).column("id").to_pylist())

    import pyarrow.parquet as pq

    entries = [
        e
        for e in pq.read_table(_sub(lp, "entries"), columns=["id"])
        .column("id")
        .to_pylist()
        if e not in tomb
    ]

    adj_tbl = _read_graph_table_local(lp, "graph", exclude_batch, ["src", "dst"])
    srcs = adj_tbl.column("src").to_pylist()
    dsts = adj_tbl.column("dst").to_pylist()
    adj: dict = {}
    if tomb:
        for s, d in zip(srcs, dsts):
            if s in tomb or d in tomb:
                continue
            adj.setdefault(s, []).append(d)
    else:
        for s, d in zip(srcs, dsts):
            adj.setdefault(s, []).append(d)

    # id -> dense row index over the TOMBSTONE-FILTERED vector set
    # (the distributed path anti-joins tombstones out of ``vecs``).
    idmap: dict = {}
    keep_rows = []
    for row, i in enumerate(ids):
        if i in tomb or i in idmap:
            if i in idmap:
                return None  # duplicate id: contract violation, replay ambiguous
            continue
        idmap[i] = len(keep_rows)
        keep_rows.append(row)
    try:
        V = np.array([vec_lists[r] for r in keep_rows], dtype="float64")
    except (TypeError, ValueError):
        return None
    N = np.array([nrms[r] for r in keep_rows], dtype="float64")

    # --- query batch (same driver pull the distributed path's
    # ``F.broadcast(q)`` already performs) ---
    q_rows = queries.select(F.col(id_col), F.col(vec_col)).collect()
    qid_type = queries.schema[id_col].dataType
    if not isinstance(qid_type, (T.LongType, T.IntegerType, T.StringType)):
        return None
    qids = [r[0] for r in q_rows]
    if len(set(qids)) != len(qids):
        return None
    qvec_lists = [r[1] for r in q_rows]
    if any(v is None or len(v) != dim for v in qvec_lists):
        if q_rows:  # empty query batch is fine; ragged vectors are not
            return None
    out_schema = T.StructType(
        [
            T.StructField("query_id", qid_type, True),
            T.StructField("neighbor_id", _PA_TO_SPARK_ID_TYPES[id_t], True),
            T.StructField("cos_sim", T.DoubleType(), True),
            T.StructField("rank", T.LongType(), True),
        ]
    )
    if not q_rows:
        return spark.createDataFrame([], out_schema)
    Q = np.array([[float(x) for x in v] for v in qvec_lists], dtype="float64")
    QN = np.sqrt(_fold_dot_cols(Q, Q))  # l2_norm's fold, then IEEE sqrt

    def rank_key(item):
        node, score = item
        # Spark's descending double order places NaN first (NaN sorts as
        # the largest double, and NaN == NaN so ties break on node);
        # -0.0 == 0.0 ties also break on node.
        if math.isnan(score):
            return (0, 0.0, node)
        return (1, -score, node)

    def score_pairs(pairs):
        """(qi, node) pairs -> list of (qi, node, score), skipping nodes
        absent from the vector table (the distributed inner join)."""
        kept = [(qi, n) for qi, n in pairs if n in idmap]
        if not kept:
            return []
        qi_arr = np.array([p[0] for p in kept], dtype="int64")
        rows = np.array([idmap[p[1]] for p in kept], dtype="int64")
        dots = _fold_dot_cols(Q[qi_arr], V[rows])
        scores = dots / (QN[qi_arr] * N[rows])
        return [
            (kept[j][0], kept[j][1], float(scores[j])) for j in range(len(kept))
        ]

    # entry scoring: every query x every (live) entry point
    frontiers: list[list] = [[] for _ in q_rows]
    for qi, node, score in score_pairs(
        [(qi, e) for qi in range(len(q_rows)) for e in entries]
    ):
        frontiers[qi].append((node, score))
    frontiers = [sorted(fr, key=rank_key)[:beam] for fr in frontiers]

    for _ in range(hops):
        pairs = []
        for qi, fr in enumerate(frontiers):
            fnodes = {n for n, _ in fr}
            nbrs: set = set()
            for n, _ in fr:
                nbrs.update(adj.get(n, ()))
            nbrs -= fnodes
            pairs.extend((qi, n) for n in nbrs)
        if not pairs:
            break
        scored = score_pairs(pairs)
        for qi, node, score in scored:
            frontiers[qi].append((node, score))
        frontiers = [sorted(fr, key=rank_key)[:beam] for fr in frontiers]

    out = []
    for qi, fr in enumerate(frontiers):
        hits = sorted(
            ((n, s) for n, s in fr if n != qids[qi]), key=rank_key
        )[:k]
        for rank, (n, s) in enumerate(hits, start=1):
            out.append((qids[qi], n, _round6_like_spark(s), rank))
    return spark.createDataFrame(out, out_schema)


def lsh_seed_pairs(
    banded: DataFrame, seed_cap: int = DEFAULT_SEED_CAP
) -> DataFrame:
    """Distinct (src, dst) seed pairs from banded LSH signatures with
    the hot-bucket ring cap above: one md5-ordered ring per
    (band_id, bucket), each member joined to its ``seed_cap``
    successors (wrapping).  Two windows (row_number + partition count)
    and one positional equi-join per band -- an O(m log m) sort on the
    hottest bucket, never the m^2 self-join it replaces."""
    order_key = F.md5(
        F.concat_ws(
            ":", F.col("band_id").cast("string"), F.col("id").cast("string")
        )
    )
    bucket_w = Window.partitionBy("band_id", "bucket")
    pos = banded.select(
        "band_id",
        "bucket",
        "id",
        (F.row_number().over(bucket_w.orderBy(order_key, F.col("id"))) - 1).alias(
            "__pos"
        ),
        F.count(F.lit(1)).over(bucket_w).alias("__m"),
    ).where(F.col("__m") > 1)
    fanned = pos.select(
        "band_id",
        "bucket",
        F.col("id").alias("src"),
        F.explode(
            F.transform(
                F.sequence(
                    F.lit(1), F.least(F.lit(seed_cap), F.col("__m") - 1)
                ),
                lambda d: (F.col("__pos") + d) % F.col("__m"),
            )
        ).alias("__nbr"),
    )
    return (
        fanned.join(
            pos.select(
                "band_id",
                "bucket",
                F.col("id").alias("dst"),
                F.col("__pos").alias("__nbr"),
            ),
            ["band_id", "bucket", "__nbr"],
        )
        .select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def _score(col_a: str, col_b: str, nrm_a: str, nrm_b: str):
    return dot(F.col(col_a), F.col(col_b)) / (F.col(nrm_a) * F.col(nrm_b))


def _einsum_scores(
    joined: DataFrame,
    out_cols: tuple[str, str],
    out_types: tuple[str, str],
) -> DataFrame:
    """Vectorized pair scoring: mapInPandas computes the row-wise dot
    of the (va, vb) array columns with one ``np.einsum`` per Arrow
    batch -- the same fix ``semdedup._cell_pairs_arrow`` applies: the
    per-pair JVM ``aggregate(zip_with(...))`` fold costs ~30 us/pair
    in intermediate array allocations, so scoring a few hundred
    thousand NN-descent candidates dominated the graph build (einsum
    is ~ns/pair).  float64 sums of float32-exact values, same result
    to ~1e-15 (structural pytest asserts 1e-9 vs numpy)."""
    import numpy as np
    import pandas as pd

    a_name, b_name = out_cols
    a_type, b_type = out_types
    schema = f"{a_name} {a_type}, {b_name} {b_type}, score double"

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            A = np.vstack(pdf["va"].to_numpy()).astype("float64")
            B = np.vstack(pdf["vb"].to_numpy()).astype("float64")
            s = np.einsum("ij,ij->i", A, B) / (
                pdf["na"].to_numpy() * pdf["nb"].to_numpy()
            )
            yield pd.DataFrame(
                {
                    a_name: pdf["__oa"].to_numpy(),
                    b_name: pdf["__ob"].to_numpy(),
                    "score": s,
                }
            )

    return joined.mapInPandas(score, schema)


def knn_graph(
    vectors: DataFrame,
    k: int = DEFAULT_K,
    n_iter: int | None = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bands: int = 16,
    rows_per_band: int = 4,
    planes: list[list[float]] | None = None,
    seed_cap: int = DEFAULT_SEED_CAP,
    build_k: int | None = None,
    seed: str = "lsh",
    _n_vectors: int | None = None,
) -> DataFrame:
    """Directed k-NN graph (src, dst, score) by LSH-seeded NN-descent:
    ``k`` best-cosine neighbors per node after ``n_iter`` refinement
    rounds.  Each round scores ONLY pairs never scored before
    (anti-join), so total work is bounded by the distinct candidate
    pairs ever generated: <= bands * seed_cap per node at seeding and
    <= (2 * build_k)^2 per node per round (out-degree build_k by
    ``top_k``, reverse degree build_k by the reverse-edge cap below).

    ``build_k`` (default ``3 * k``) is the neighbor-list width DURING
    refinement, pruned to ``k`` at the end: NN-descent explores through
    the current lists, so a wider working list is the paper's lever
    against local optima (Dong et al. 2011 use K well above the served
    k).  Measured at sf0.1 with capped seeds: build_k = k stalls at
    edge-recall 0.82 even with two rounds; the round-8 default
    (n_iter = 2, build_k = 2k) reached probe recall@10 0.985 over 20
    queries; ONE round at build_k = 3k reaches 1.0 at 0.63x that
    build's wall-clock -- per-node candidate work is similar
    ((2*3k)^2 * 1 vs (2*2k)^2 * 2) but each round also pays a fixed
    barrier (localCheckpoint materialization + window prune), so fewer,
    wider rounds win.  Both measurements in SCALE.md.

    ``seed`` selects the initial edge source (round 14):

    - ``"lsh"`` (default): SRP ring seeds + NN-descent, as above.
      Converges at bench scale; edge recall COLLAPSES once the seeds
      are a vanishing corpus fraction (0.23 at 50k -- the
      ``graph_geometry`` story).
    - ``"ivf"``: the IVF cogroup EXACT join at the derived
      ``ivf_geometry`` (Lloyd centroids at the derived sample size,
      every node's exact top-``build_k`` within its probed cells,
      neighbor-side hot-cell cap) -- edge recall 0.88 at 50k in ~1/10
      the NN-descent wall-clock, because cell-local exact scoring is
      a vectorized cogroup matmul instead of per-pair candidate
      generations.  ``n_iter`` refinement rounds remain available as
      polish; the derived default is 0 (``n_iter=None``) because the
      seed is already cell-exact.

    ``n_iter=None`` resolves per seed strategy (lsh -> 1, ivf -> 0)."""
    if build_k is None:
        build_k = 3 * k
    if build_k < k:
        raise ValueError(f"build_k ({build_k}) must be >= k ({k})")
    if seed not in ("lsh", "ivf"):
        raise ValueError(f"unknown graph seed strategy {seed!r}")
    if n_iter is None:
        n_iter = 0 if seed == "ivf" else 1

    def _base() -> DataFrame:
        # Eager: narrow lineage (scan + norm) referenced several times
        # (banding, both scoring sides, refinement) -- without
        # materialized blocks each reference would re-scan the corpus.
        return vectors.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).alias("vec"),
            l2_norm(F.col(vec_col)).alias("nrm"),
        ).localCheckpoint(eager=True)

    base: DataFrame | None = None
    if seed == "ivf":
        from .similarity import ivf_cogroup_join, ivf_geometry, kmeans_centroids

        # The ivf seed works off ``vectors`` directly (the cogroup join
        # computes its own norms), so the (id, vec, nrm) base table is
        # only materialized when refinement rounds actually need it --
        # one full-corpus checkpoint job saved on the default
        # n_iter=0 path (round 15).
        n = _n_vectors if _n_vectors is not None else vectors.count()
        geo = ivf_geometry(n)
        cents = kmeans_centroids(
            vectors, geo["n_cells"], id_col=id_col, vec_col=vec_col,
            sample_size=geo["sample_size"],
        )
        # Exact top-(build_k) within the probed cells; +1 covers the
        # self-match the self-join surfaces at rank 1.  The hot-cell
        # cap bounds each cell's neighbor table (near-identical blobs
        # quantize to ONE cell -- any cap's worth of them are
        # interchangeable neighbors, so blob recall is unaffected
        # while the per-task matmul bound becomes real).
        cap = max(64 * (n // max(geo["n_cells"], 1) + 1), 4 * (build_k + 1))
        joined = ivf_cogroup_join(
            vectors, vectors, cents, k=build_k + 1,
            n_probe=geo["n_probe"], n_assign=geo["n_assign"],
            id_col=id_col, vec_col=vec_col, max_cell_rows=cap,
        )
        graph = (
            joined.where(F.col("query_id") != F.col("neighbor_id"))
            .select(
                F.col("query_id").alias("src"),
                F.col("neighbor_id").alias("dst"),
                F.col("cos_sim").alias("score"),
            )
        )
        # Lazy: the graph's plan tail is a ranking window (an
        # exchange), so downstream multi-references share the shuffle
        # inside whichever single job consumes the build -- no eager
        # count-job barrier needed (round 15).
        graph = _top_n(graph, build_k).localCheckpoint(eager=False)
    else:
        base = _base()
        if planes is None:
            # Plane dimensionality comes from the data (one head() row
            # -- bounded driver pull), not a hardcoded corpus
            # assumption: a 32- or 768-dim embedding column must band
            # correctly too.
            sample = vectors.select(vec_col).head()
            dim = len(sample[0]) if sample is not None else 1
            planes = hash_hyperplanes(bands * rows_per_band, dim=dim)
        bands_udf = _srp_bands_udf(planes, bands, rows_per_band)
        banded = base.select(
            "id",
            F.posexplode(bands_udf(F.col("vec"))).alias("band_id", "bucket"),
        )
        seeds = lsh_seed_pairs(banded, seed_cap=seed_cap)
        graph = _top_n(
            _score_pairs(base, seeds), build_k
        ).localCheckpoint(eager=False)
    if n_iter:
        if base is None:
            base = _base()
        graph = _refine(base, graph, build_k, n_iter)
    return _top_n(graph, k)


def _score_pairs(base: DataFrame, pairs: DataFrame) -> DataFrame:
    """Exact cosine for every (src, dst) pair via the einsum scorer;
    ``base`` is the (id, vec, nrm) table."""
    va = base.select(
        F.col("id").alias("src"), F.col("vec").alias("va"), F.col("nrm").alias("na")
    )
    vb = base.select(
        F.col("id").alias("dst"), F.col("vec").alias("vb"), F.col("nrm").alias("nb")
    )
    id_type = base.schema["id"].dataType.simpleString()
    joined = (
        pairs.join(va, "src")
        .join(vb, "dst")
        .select(
            F.col("src").alias("__oa"),
            F.col("dst").alias("__ob"),
            "va",
            "na",
            "vb",
            "nb",
        )
    )
    return _einsum_scores(joined, ("src", "dst"), (id_type, id_type))


def _top_n(edges: DataFrame, n: int) -> DataFrame:
    w = Window.partitionBy("src").orderBy(F.desc("score"), F.asc("dst"))
    return (
        edges.withColumn("__r", F.row_number().over(w))
        .where(F.col("__r") <= n)
        .drop("__r")
    )


def _refine(
    base: DataFrame, graph: DataFrame, build_k: int, n_iter: int
) -> DataFrame:
    """NN-descent refinement rounds over a scored (src, dst, score)
    edge list: per round, neighbors-of-neighbors become candidates,
    only never-kept pairs are scored, lists prune to ``build_k``."""
    for _ in range(n_iter):
        # Reverse edges capped at build_k per node (NN-descent's
        # reverse sampling, Dong et al. 2011 §2.3): out-degree is
        # bounded by _top_n, but IN-degree is unbounded -- a node
        # everyone lists as a neighbor would otherwise have
        # corpus-sized degree in the undirected view and the
        # neighbors-of-neighbors self-join would square it.
        # Best-score reverse edges keep the refinement signal;
        # degree <= 2 * build_k makes the documented
        # (2 * build_k)^2-per-node round bound real.
        rev = _top_n(
            graph.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), "score"
            ),
            build_k,
        )
        und = graph.select("src", "dst").unionByName(rev.select("src", "dst"))
        cand = (
            und.alias("g1")
            .join(und.alias("g2"), F.col("g1.dst") == F.col("g2.src"))
            .select(F.col("g1.src").alias("src"), F.col("g2.dst").alias("dst"))
            .where(F.col("src") != F.col("dst"))
            .distinct()
            .join(graph.select("src", "dst"), ["src", "dst"], "left_anti")
        )
        # Lazy: bounds the next round's plan at a window-tail RDD; the
        # consuming action shares the tail exchange between references.
        graph = _top_n(
            graph.unionByName(_score_pairs(base, cand)), build_k
        ).localCheckpoint(eager=False)
    return graph


def build_graph_index(
    vectors: DataFrame,
    path: str,
    k: int = DEFAULT_K,
    n_iter: int | None = None,
    n_entry: int = 32,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bands: int = 16,
    rows_per_band: int = 4,
    seed_cap: int = DEFAULT_SEED_CAP,
    build_k: int | None = None,
    seed: str | None = None,
) -> None:
    """Materialize the k-NN graph, scoring vectors, and deterministic
    entry points at ``path`` (build once, probe many -- the graph twin
    of ``build_lsh_index``/``build_ivf_index``).

    ``seed``/``n_iter`` default to the corpus-derived
    ``graph_geometry`` (round 14): LSH-ring NN-descent below
    ``IVF_SEED_MIN_N`` -- bit-identical to the round-8 behavior at
    bench scale -- and the IVF cogroup exact-join seed above it, where
    NN-descent stops converging.  The corpus size and resolved seed
    strategy are persisted in the config so probes can derive their
    beam/hop budget and maintenance jobs reproduce the build."""
    spark = vectors.sparkSession
    n_vectors = vectors.count()
    geo = graph_geometry(n_vectors, k=k)
    if seed is None:
        seed = geo["seed"]
    if n_iter is None:
        n_iter = 0 if seed == "ivf" else 1
    graph = knn_graph(
        vectors,
        k=k,
        n_iter=n_iter,
        id_col=id_col,
        vec_col=vec_col,
        bands=bands,
        rows_per_band=rows_per_band,
        seed_cap=seed_cap,
        build_k=build_k,
        seed=seed,
        _n_vectors=n_vectors,  # already counted for the geometry
    )
    base = vectors.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        l2_norm(F.col(vec_col)).alias("nrm"),
    )
    entries = (
        base.select("id")
        .orderBy(F.md5(F.col("id").cast("string")), F.col("id"))
        .limit(n_entry)
    )
    # Three independent output directories; the vector copy and the
    # tiny entries TakeOrdered back-fill the graph job's straggler tail
    # (guide §2.6), exactly as the lsh/ivf/pq builds already overlap.
    _run_overlapped(
        lambda: graph.write.mode("overwrite").parquet(_sub(path, "graph")),
        lambda: base.write.mode("overwrite").parquet(_sub(path, "vectors")),
        lambda: entries.write.mode("overwrite").parquet(_sub(path, "entries")),
    )
    # The FULL build geometry is persisted, not just the serving
    # parameters: append_graph_index runs an intra-batch NN-descent
    # and must reproduce the build-time seeding/refinement widths or
    # appended-batch edge quality silently differs from built edges.
    _write_small(
        spark,
        [
            (
                "knn_graph",
                int(k),
                int(n_iter),
                int(n_entry),
                int(bands),
                int(rows_per_band),
                int(seed_cap),
                int(build_k if build_k is not None else 3 * k),
                str(seed),
                int(n_vectors),
            )
        ],
        "kind string, k int, n_iter int, n_entry int,"
        " bands int, rows_per_band int, seed_cap int, build_k int,"
        " seed string, n_vectors bigint",
        _sub(path, "config"),
    )


def build_seed_hub_index(
    vectors: DataFrame,
    path: str,
    n_hubs: int = 32,
    k_out: int = 2,
    r_rev: int = 16,
    n_entry: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Deterministic hub-routed navigable graph -- the PINNED twin of
    the NN-descent build, playing the role ``seed_centroids`` plays
    for IVF: hubs are the ``n_hubs`` corpus vectors with smallest
    md5(id); every node keeps out-edges to its ``k_out`` best-cosine
    hubs, every hub keeps its ``r_rev`` best reverse edges (HNSW's
    upper-layer shape, collapsed to two layers).  Entry points are the
    first ``n_entry`` corpus ids in md5 order, exactly as
    ``build_graph_index`` picks them.

    Every stage is one-statement SQL replayable (md5-ordered hub
    sample, bounded cross score, two ranking windows), so probing the
    persisted index with ``query_graph_index`` -- the REAL beam-search
    code path, unchanged -- becomes oracle-checkable end to end; the
    NN-descent build differs only in how the adjacency was produced.

    Scale shape: ONE corpus pass against a broadcast ``n_hubs``-row
    side (geometry-bounded, the IVF-assignment cost), two window
    ranks, no corpus-by-corpus work.  Scoring uses the JVM
    left-to-right fold (not the einsum scorer): an external engine's
    ``list_sum`` adds in the same order, so the doubles -- and
    therefore the ranking cutoffs -- replay bit-identically.
    """
    spark = vectors.sparkSession
    base = vectors.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        l2_norm(F.col(vec_col)).alias("nrm"),
    ).localCheckpoint(eager=True)
    hubs = (
        base.orderBy(F.md5(F.col("id").cast("string")), F.col("id"))
        .limit(n_hubs)
        .select(
            F.col("id").alias("hub"),
            F.col("vec").alias("hvec"),
            F.col("nrm").alias("hnrm"),
        )
    )
    scored = (
        base.crossJoin(F.broadcast(hubs))
        .where(F.col("id") != F.col("hub"))
        .select(
            F.col("id").alias("src"),
            F.col("hub").alias("dst"),
            _score("vec", "hvec", "nrm", "hnrm").alias("score"),
        )
        .localCheckpoint(eager=True)
    )
    out_e = _top_n(scored, k_out)
    w_rev = Window.partitionBy("dst").orderBy(F.desc("score"), F.asc("src"))
    rev_e = (
        scored.withColumn("__r", F.row_number().over(w_rev))
        .where(F.col("__r") <= r_rev)
        .select(F.col("dst").alias("src"), F.col("src").alias("dst"), "score")
    )
    graph = out_e.unionByName(rev_e).dropDuplicates(["src", "dst"])
    # All three tables derive from eager checkpoints (base / scored),
    # so the writes are independent -- overlapped (guide §2.6).
    _run_overlapped(
        lambda: graph.write.mode("overwrite").parquet(_sub(path, "graph")),
        lambda: base.write.mode("overwrite").parquet(_sub(path, "vectors")),
        lambda: (
            base.select("id")
            .orderBy(F.md5(F.col("id").cast("string")), F.col("id"))
            .limit(n_entry)
            .write.mode("overwrite")
            .parquet(_sub(path, "entries"))
        ),
    )
    _write_small(
        spark,
        [("knn_graph", int(k_out), 0, int(n_entry), 0, 0, 0, int(k_out))],
        "kind string, k int, n_iter int, n_entry int,"
        " bands int, rows_per_band int, seed_cap int, build_k int",
        _sub(path, "config"),
    )


def query_graph_index(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int = 10,
    beam: int | None = None,
    hops: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    allowed: DataFrame | None = None,
    _exclude_batch: int | None = None,
) -> DataFrame:
    """Batched greedy beam search over a persisted k-NN graph:
    (query_id, neighbor_id, cos_sim, rank), descending cosine,
    neighbor-id tiebreak, self-matches excluded.

    ``beam``/``hops`` default (None) to the corpus-derived budget
    recorded at build time (``graph_geometry`` over the config's
    ``n_vectors``): a pure k-NN graph has only short-range edges, so
    the walk budget must grow ~log N or recall collapses quietly at
    scale (round 14: 0.998 at 6k -> 0.064 at 200k at the old fixed
    32 x 5).  Explicit values always win; indexes whose config
    predates the ``n_vectors`` column keep the fixed round-8 budget.

    All queries advance together: per hop one frontier-to-adjacency
    equi-join expands each query's ``beam`` best nodes by their stored
    neighbor lists, exact cosine scores the (small) touched set, and a
    per-query window keeps the best ``beam``.  State is
    |queries| x beam rows between hops -- query-batch-sized, never
    corpus-sized.  Streaming segment trees union in automatically
    (``graph_ingest_apply_batch``'s bidirectional edges make streamed
    nodes reachable from the unchanged entry points);
    ``_exclude_batch`` is the ingest path's replay-determinism hook.

    ``allowed`` (optional, 1 column named ``id_col``): metadata-filtered
    search with the filtered-HNSW strategy -- the filter applies to
    RESULTS only, never to routing (excluding non-matching nodes from
    traversal would disconnect the graph exactly when the filter is
    selective).  Every node the beam scores is tested against the
    allow-list and accumulated into a per-query hit set; final top-k
    ranks the hits, so k results are returned whenever the walk
    touches k matching nodes.  Under high selectivity widen ``beam``
    (~1/selectivity) so the walk keeps touching matches; below
    selectivity ~ 1/beam the family answer applies -- partition the
    index by the attribute (`similarity.filtered_ivf_topk` cost
    model).
    """
    cfg = _read_small(spark, _sub(path, "config"))[0]
    if cfg["kind"] != "knn_graph":
        raise ValueError(f"index at {path} is {cfg['kind']!r}, not knn_graph")
    if beam is None or hops is None:
        n_vectors = _build_geometry(cfg)["n_vectors"]
        derived = (
            graph_geometry(n_vectors)
            if n_vectors
            else {"beam": 32, "hops": 5}
        )
        beam = derived["beam"] if beam is None else beam
        hops = derived["hops"] if hops is None else hops
    # Driver-local fast path (round 15): an index small enough to
    # broadcast is walked once on the driver instead of ~3 Spark jobs
    # per hop -- the probe was measured job-scheduling-bound at this
    # scale (52 jobs, 2.5 s of 3.8 s wall in inter-job gaps for the
    # seed-ann row).  Bit-identical replay (exact fold order, HALF_UP
    # rounding, NaN-first descending ties) pinned by the
    # driver-vs-distributed parity pytest; any unsupported shape falls
    # back to the distributed walk below, as do non-local URIs,
    # over-gate index sizes, and ``allowed``-filtered searches.
    lp = _local_fs_path(path)
    if lp is not None and allowed is None:
        size = _local_dir_bytes(_sub(lp, "graph"))
        vsize = _local_dir_bytes(_sub(lp, "vectors"))
        for extra in ("graph_stream", "vectors_stream"):
            s = _local_dir_bytes(_sub(lp, extra))
            if s:
                size = (size or 0) + s
        if (
            size is not None
            and vsize is not None
            and size + vsize <= _DRIVER_PROBE_MAX_BYTES
        ):
            try:
                out = _driver_beam_search(
                    spark, lp, queries, k, beam, hops, id_col, vec_col,
                    _exclude_batch,
                )
            except Exception:
                out = None  # resilient fast path: fall back, never fail
            if out is not None:
                return out
    adj = _read_graph_table(spark, path, "graph", _exclude_batch).select(
        "src", "dst"
    )
    vecs = _read_graph_table(spark, path, "vectors", _exclude_batch)
    entries = spark.read.parquet(_sub(path, "entries"))
    # Tombstoned nodes vanish from every read: as results (vectors,
    # entries) AND as routing (edges in BOTH directions) -- the beam
    # must never traverse or return a deleted node.  Routing through a
    # deleted hub is lost until apply_graph_deletes +
    # optimize_graph_index re-link its neighborhood (the refinement
    # round IS the repair pass); recall degrades gracefully as
    # tombstones accumulate, never correctness.
    tombs = _graph_tombstones(spark, path)
    if tombs is not None:
        vecs = vecs.join(tombs, "id", "left_anti")
        entries = entries.join(tombs, "id", "left_anti")
        adj = adj.join(
            tombs.select(F.col("id").alias("src")), "src", "left_anti"
        ).join(tombs.select(F.col("id").alias("dst")), "dst", "left_anti")

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        l2_norm(F.col(vec_col)).alias("qnrm"),
    )

    def score_nodes(nodes: DataFrame) -> DataFrame:
        # nodes: (query_id, node); join the touched vectors, then the
        # (broadcast) query batch, exact cosine.  JVM fold, NOT the
        # einsum scorer: per hop only |queries| x beam x k rows get
        # scored (query-batch-sized), so Arrow worker round-trips per
        # hop cost more than the fold saves -- the opposite trade from
        # the build, where candidates scale with the corpus.
        return (
            nodes.join(vecs.select(F.col("id").alias("node"), "vec", "nrm"), "node")
            .join(F.broadcast(q), "query_id")
            .select(
                "query_id",
                "node",
                _score("qvec", "vec", "qnrm", "nrm").alias("score"),
            )
        )

    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("node"))
    allow = (
        None
        if allowed is None
        else allowed.select(F.col(id_col).alias("node"))
    )

    scored_entries = score_nodes(
        q.select("query_id").crossJoin(
            F.broadcast(entries.select(F.col("id").alias("node")))
        )
    )
    if allow is not None:
        # Materialize once: both the beam truncation and the hit-set
        # seed read it, and an un-checkpointed lineage would run the
        # entry-scoring job twice.
        scored_entries = scored_entries.localCheckpoint(eager=True)
    frontier = (
        scored_entries.withColumn("__r", F.row_number().over(w))
        .where(F.col("__r") <= beam)
        .drop("__r")
        .localCheckpoint(eager=True)
    )
    # Filtered search: hits accumulate every scored node that passes
    # the allow-list, independent of whether it survives beam
    # truncation -- routing (the frontier) stays unfiltered.  Seeded
    # from the PRE-truncation entry scores: with more entry points
    # than beam, an allowed entry scored just past the cutoff must
    # still enter the hit set (the every-scored-node contract).
    hits = (
        None
        if allow is None
        else scored_entries.join(allow, "node", "left_semi")
        .localCheckpoint(eager=True)
    )
    # Per-hop driver jobs trimmed (round 15): the old loop spent one
    # eager-checkpoint job on ``nbrs`` plus one ``isEmpty`` probe job
    # per hop.  ``nbrs`` is consumed exactly once when no allow-list is
    # set, so it needs no materialization (the frontier checkpoint
    # still bounds plan growth), and the early-exit probe cost a full
    # job per hop to save no-op hops that cost near-zero stages: a
    # converged walk makes every later hop an empty union re-ranked to
    # the identical frontier (bit-identical output).
    for _ in range(hops):
        nbrs = (
            frontier.select("query_id", F.col("node").alias("src"))
            .join(adj, "src")
            .select("query_id", F.col("dst").alias("node"))
            .distinct()
            .join(frontier.select("query_id", "node"), ["query_id", "node"], "left_anti")
        )
        if allow is not None:
            # Read twice below (hit-set semi-join + scoring): pin once.
            nbrs = nbrs.localCheckpoint(eager=True)
        scored_nbrs = score_nodes(nbrs)
        if hits is not None:
            hits = (
                hits.unionByName(scored_nbrs.join(allow, "node", "left_semi"))
                .dropDuplicates(["query_id", "node"])
                .localCheckpoint(eager=True)
            )
        merged = frontier.unionByName(scored_nbrs)
        frontier = (
            merged.withColumn("__r", F.row_number().over(w))
            .where(F.col("__r") <= beam)
            .drop("__r")
            .localCheckpoint(eager=True)
        )
    result_set = frontier if hits is None else hits
    return (
        result_set.where(F.col("node") != F.col("query_id"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("node").alias("neighbor_id"),
            F.round("score", 6).alias("cos_sim"),
            "rank",
        )
    )


def graph_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    beam: int = 32,
    hops: int = 5,
    graph_k: int = DEFAULT_K,
    n_iter: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Ad-hoc build+probe convenience: NN-descent graph in temp
    scratch, then ``query_graph_index`` -- the one-shot form the bench
    recall line uses; services persist the build instead."""
    from ..io_utils import scratch_dir

    path = scratch_dir("graph_ann_adhoc")
    build_graph_index(
        vectors, path, k=graph_k, n_iter=n_iter, id_col=id_col, vec_col=vec_col
    )
    return query_graph_index(
        vectors.sparkSession,
        path,
        queries,
        k=k,
        beam=beam,
        hops=hops,
        id_col=id_col,
        vec_col=vec_col,
    )


def append_graph_index(
    vectors: DataFrame,
    path: str,
    beam: int | None = None,
    hops: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Incrementally add vectors to a persisted k-NN graph -- HNSW's
    insert primitive, batched: every new point runs the SAME batched
    beam search a query runs, and its top-k results become its
    neighbor list; reverse edges (existing -> new) are appended so the
    new points are reachable.  INTRA-batch edges come from one
    NN-descent build over just the appended batch (batch-sized, not
    corpus-sized), so a batch of mutual near-neighbors far from the
    indexed corpus links up immediately instead of waiting for a full
    rebuild.  Cost is one beam search plus one batch-local NN-descent
    plus two appends -- no corpus pass, no rebuild.

    Append-only contract: touched existing nodes temporarily hold
    MORE than k edges (their old list plus the reverse edges); the
    beam search only ever unions adjacency into candidate frontiers,
    so extra edges raise recall and per-hop cost slightly, never
    correctness.  ``optimize_graph_index`` re-prunes to k and
    refreshes entry points.  Caller contract: ids must be disjoint
    from ids already indexed (append never dedups)."""
    spark = vectors.sparkSession
    edges, base = _link_batch(
        spark, path, vectors, beam, hops, id_col, vec_col
    )
    # Independent output directories (edges derive from an eager
    # checkpoint, base from the input batch) -- overlapped (guide §2.6).
    _run_overlapped(
        lambda: edges.write.mode("append").parquet(_sub(path, "graph")),
        lambda: base.write.mode("append").parquet(_sub(path, "vectors")),
    )


def _link_batch(
    spark,
    path: str,
    vectors: DataFrame,
    beam: int,
    hops: int,
    id_col: str,
    vec_col: str,
    exclude_batch: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """(edges, base) for inserting ``vectors`` into the graph at
    ``path`` -- the shared search-then-link core of the batch append
    and the streaming ingest: beam-search hits become forward edges,
    reverse edges make the new nodes reachable, and one batch-local
    NN-descent links intra-batch mutual neighbors.  With
    ``exclude_batch`` set, every index read skips that segment id
    (the ingest replay contract)."""
    cfg = _read_small(spark, _sub(path, "config"))[0]
    if cfg["kind"] != "knn_graph":
        raise ValueError(f"index at {path} is {cfg['kind']!r}, not knn_graph")

    hits = query_graph_index(
        spark,
        path,
        vectors,
        k=int(cfg["k"]),
        beam=beam,
        hops=hops,
        id_col=id_col,
        vec_col=vec_col,
        _exclude_batch=exclude_batch,
    ).select(
        F.col("query_id").alias("src"),
        F.col("neighbor_id").alias("dst"),
    )
    # Persisted-element-type guard (same as the ann_index appends):
    # a double-typed batch must not leave mixed parquet schemas in a
    # float vectors table.
    stored_t = spark.read.parquet(_sub(path, "vectors")).schema["vec"].dataType
    base = vectors.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast(stored_t).alias("vec"),
        l2_norm(F.col(vec_col).cast(stored_t)).alias("nrm"),
    )
    # Exact (unrounded) scores for the stored edges: recompute from
    # the vectors rather than reusing the probe's display-rounded
    # cosine, so appended edges carry the same precision as built ones.
    old_vecs = _read_graph_table(spark, path, "vectors", exclude_batch)
    nv = base.select(
        F.col("id").alias("src"), F.col("vec").alias("va"), F.col("nrm").alias("na")
    )
    ov = old_vecs.select(
        F.col("id").alias("dst"), F.col("vec").alias("vb"), F.col("nrm").alias("nb")
    )
    fwd = (
        hits.join(nv, "src")
        .join(ov, "dst")
        .select("src", "dst", _score("va", "vb", "na", "nb").alias("score"))
        .localCheckpoint(eager=True)
    )
    rev = fwd.select(
        F.col("dst").alias("src"), F.col("src").alias("dst"), "score"
    )
    edges = fwd.unionByName(rev)
    # Intra-batch edges: NN-descent over just the new vectors.  The
    # probe above only reaches PRE-existing nodes, so without this a
    # batch of mutual near-neighbors with no close indexed point would
    # stay unlinked until a rebuild (round-5 ADVICE finding).
    if vectors.limit(2).count() > 1:
        geo = _build_geometry(cfg)
        intra = knn_graph(
            vectors,
            k=int(cfg["k"]),
            n_iter=int(cfg["n_iter"]),
            id_col=id_col,
            vec_col=vec_col,
            bands=geo["bands"],
            rows_per_band=geo["rows_per_band"],
            seed_cap=geo["seed_cap"],
            build_k=geo["build_k"],
        )
        edges = edges.unionByName(intra)
    return edges, base


def graph_ingest_apply_batch(
    batch: DataFrame,
    batch_id: int,
    path: str,
    beam: int = 32,
    hops: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """One micro-batch of the streaming graph-index ingest -- HNSW's
    search-then-link insertion under the family segment contract:
    each arriving vector beam-searches the index (main + every
    segment EXCEPT this batch's own id -- a replayed batch links
    against the same graph it saw the first time), its hits become
    forward edges, reverse edges make it reachable from the unchanged
    entry points, intra-batch NN-descent links mutual near-neighbors
    within the batch, and everything lands as whole-directory
    OVERWRITES of ``graph_stream/batch=<id>`` /
    ``vectors_stream/batch=<id>``.  Probes union segments
    automatically, so a vector is beam-findable the micro-batch after
    it arrives.  ``optimize_graph_index`` absorbs the segments on the
    maintenance cadence (refinement then covers streamed nodes too).
    Caller contract: ids disjoint from everything already indexed."""
    import os as _os

    if not batch.take(1):
        return
    spark = batch.sparkSession
    edges, base = _link_batch(
        spark, path, batch, beam, hops, id_col, vec_col,
        exclude_batch=int(batch_id),
    )
    # Two independent segment directories per micro-batch -- overlapped
    # so the tiny vector-segment write back-fills the edge write's tail
    # (guide §2.6; this loop runs once per trigger, so the per-batch
    # constant is the streaming ingest throughput).
    _run_overlapped(
        lambda: edges.write.mode("overwrite").parquet(
            _os.path.join(_sub(path, "graph_stream"), f"batch={int(batch_id)}")
        ),
        lambda: base.write.mode("overwrite").parquet(
            _os.path.join(_sub(path, "vectors_stream"), f"batch={int(batch_id)}")
        ),
    )


def optimize_graph_index(
    spark: SparkSession,
    path: str,
    n_refine: int = 1,
    build_k: int | None = None,
) -> None:
    """Maintenance re-prune of an append-grown graph index -- the
    graph twin of ``compaction.optimize_parquet_table``: appends leave
    touched nodes with more than k edges and appended nodes with only
    probe-derived lists, degrading probe cost and (slowly) recall
    toward a rebuild cliff.  This job (1) widens every node's list to
    ``build_k`` working width, (2) runs ``n_refine`` NN-descent
    refinement rounds over the CURRENT edge set -- so appended nodes
    gain the cross-links a fresh build would have found, at bounded
    per-node cost, without re-seeding or re-scanning the corpus --
    (3) prunes back to exactly k edges per node, and (4) refreshes the
    md5-deterministic entry points over the full (old + appended)
    vector set.  Run it on the same cadence as table OPTIMIZE: after
    every few append batches, or when probe latency drifts.

    At 100 TB: cost is the refinement rounds' bounded equi-joins
    (~N * (2 * build_k)^2 cosines per round) plus one graph rewrite --
    no LSH re-banding, no full NN-descent restart.  The rewrite
    materializes via localCheckpoint before overwriting the directory
    it was read from (same read-then-swap contract as the parquet
    compactor).

    Streaming segment trees are ABSORBED here (stream stopped,
    single-writer): the union of main + segments is deduplicated (by
    id for vectors, full-row for edges), refined, written to the main
    tables, and the segment trees removed LAST.  A crash between the
    main writes and the segment removal leaves duplicates the dedup
    collapses on the next run -- re-running the optimize is the
    recovery, and it is idempotent.  Absorption is what lets the
    refinement rounds cover streamed nodes (probe-derived lists gain
    the cross-links a fresh build would have found)."""
    import os as _os
    import shutil

    cfg = _read_small(spark, _sub(path, "config"))[0]
    if cfg["kind"] != "knn_graph":
        raise ValueError(f"index at {path} is {cfg['kind']!r}, not knn_graph")
    k = int(cfg["k"])
    if build_k is None:
        # Persisted build-time width; module default for indexes that
        # predate the persisted-geometry config schema.
        build_k = _build_geometry(cfg)["build_k"]
    base = (
        _read_graph_table(spark, path, "vectors")
        .dropDuplicates(["id"])
        .localCheckpoint(eager=True)
    )
    graph = _top_n(
        _read_graph_table(spark, path, "graph").distinct(), build_k
    ).localCheckpoint(eager=True)
    if n_refine:
        graph = _refine(base, graph, build_k, n_refine)
    final = _top_n(graph, k).localCheckpoint(eager=True)
    base.write.mode("overwrite").parquet(_sub(path, "vectors"))
    final.write.mode("overwrite").parquet(_sub(path, "graph"))
    (
        base.select("id")
        .orderBy(F.md5(F.col("id").cast("string")), F.col("id"))
        .limit(int(cfg["n_entry"]))
        .write.mode("overwrite")
        .parquet(_sub(path, "entries"))
    )
    # Refresh the config's corpus size over the absorbed union: the
    # probe derives its beam/hop budget from it (graph_geometry), and
    # an append-grown index probing at its build-time budget would
    # under-search exactly as it outgrows it.
    g = _build_geometry(cfg)
    _write_small(
        spark,
        [
            (
                "knn_graph",
                k,
                int(cfg["n_iter"]),
                int(cfg["n_entry"]),
                g["bands"],
                g["rows_per_band"],
                g["seed_cap"],
                g["build_k"],
                g["seed"],
                int(base.count()),
            )
        ],
        "kind string, k int, n_iter int, n_entry int,"
        " bands int, rows_per_band int, seed_cap int, build_k int,"
        " seed string, n_vectors bigint",
        _sub(path, "config"),
    )
    for name in ("graph_stream", "vectors_stream"):
        seg_dir = _sub(path, name)
        if _os.path.exists(seg_dir):
            shutil.rmtree(seg_dir)


def delete_from_graph_index(
    ids: DataFrame, path: str, id_col: str = "vec_id"
) -> None:
    """Tombstone deletes for the graph index -- the knn_graph member of
    the family-wide takedown path (``ann_index.delete_from_index`` for
    lsh/ivf/pq): APPEND ids to ``tombstones/``; every probe excludes
    them the same moment, as results AND as routing (edges in both
    directions drop at read time).  Routing that passed THROUGH a
    deleted hub is lost until the physical pass re-links its
    neighborhood -- graceful recall degradation, never a returned
    deleted row.  Repeat deletes are idempotent."""
    ids.select(F.col(id_col).cast("long").alias("id")).write.mode(
        "append"
    ).parquet(_sub(path, "tombstones"))


def apply_graph_deletes(
    spark: SparkSession,
    path: str,
    n_refine: int = 1,
    retire_tombstones: bool = False,
) -> None:
    """Physically retire a graph index's tombstones: rewrite vectors
    and edges minus the deleted nodes (edges filtered on BOTH ends),
    run ``n_refine`` NN-descent refinement rounds so neighborhoods
    that routed through deleted hubs re-link (the repair pass --
    neighbors-of-neighbors reconnects what the hub connected), and
    refresh the md5-deterministic entry points from the SURVIVING
    nodes.  Streaming segment trees are absorbed into the rewrite
    (dedup makes re-running after a crash the recovery, exactly as in
    ``optimize_graph_index``).  The tombstone table is KEPT by
    default (compacted): with a streaming ingest path, a replayed
    in-flight batch that contained deleted ids must stay masked --
    pass ``retire_tombstones=True`` only when no replay is possible.
    Read-then-swap via localCheckpoint, single-writer, stream
    stopped -- the family contract."""
    import os as _os
    import shutil

    tombs = _graph_tombstones(spark, path)
    if tombs is None:
        return
    tombs = tombs.localCheckpoint(eager=True)
    cfg = _read_small(spark, _sub(path, "config"))[0]
    base = (
        _read_graph_table(spark, path, "vectors")
        .dropDuplicates(["id"])
        .join(tombs, "id", "left_anti")
        .localCheckpoint(eager=True)
    )
    graph = (
        _read_graph_table(spark, path, "graph")
        .distinct()
        .join(tombs.select(F.col("id").alias("src")), "src", "left_anti")
        .join(tombs.select(F.col("id").alias("dst")), "dst", "left_anti")
        .localCheckpoint(eager=True)
    )
    build_k = _build_geometry(cfg)["build_k"]
    if n_refine:
        graph = _top_n(graph, build_k).localCheckpoint(eager=True)
        graph = _refine(base, graph, build_k, n_refine)
    final = _top_n(graph, int(cfg["k"])).localCheckpoint(eager=True)
    base.write.mode("overwrite").parquet(_sub(path, "vectors"))
    final.write.mode("overwrite").parquet(_sub(path, "graph"))
    (
        base.select("id")
        .orderBy(F.md5(F.col("id").cast("string")), F.col("id"))
        .limit(int(cfg["n_entry"]))
        .write.mode("overwrite")
        .parquet(_sub(path, "entries"))
    )
    for name in ("graph_stream", "vectors_stream"):
        seg_dir = _sub(path, name)
        if _os.path.exists(seg_dir):
            shutil.rmtree(seg_dir)
    if retire_tombstones:
        shutil.rmtree(_sub(path, "tombstones"))
    else:
        tombs.coalesce(1).write.mode("overwrite").parquet(
            _sub(path, "tombstones")
        )
