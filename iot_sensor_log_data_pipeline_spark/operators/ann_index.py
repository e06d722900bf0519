"""Persisted ANN indexes: build once on disk, probe many times.

The ad-hoc ANN operators (``operators/similarity.py``) recompute the
banded SRP-LSH signatures / IVF cell assignment for every query batch.
That is the right shape for one-shot jobs, but at 100 TB the index
build IS the expensive pass (a full corpus scan plus an Arrow-batched
matmul per row), so a production similarity service builds the index
ONCE and amortizes it across query batches -- the same
persist-the-index pattern the streaming near-dup matcher already uses
for its corpus LSH bands (``streaming/pipeline.py:near_dup_match_stream``),
generalized here to the whole similarity family.

On-disk layout (all plain parquet under one index root; no metastore
dependency, readable by any engine):

    <root>/config/     one row of index hyperparameters (kind, bands,
                       rows_per_band / n_cells, n_assign, dim)
    <root>/planes/     (plane_id, w array<double>)        [lsh]
    <root>/centroids/  (cell, cv array<double>)           [ivf]
    <root>/entries/    the postings: (id, band_id, bucket) [lsh]
                       or (id, cell)                       [ivf]
    <root>/vectors/    (id, vec) for the exact re-rank join

Scale design:
- Build is one corpus pass; entries hold only (id, key) pairs -- the
  vectors table is written once, NOT duplicated per band/cell.
- Probe reads config/planes/centroids driver-side (KBs -- the bounded
  sketch-to-closure pattern), computes the query-side keys with the
  same Arrow UDFs as the ad-hoc path, equi-joins the postings on the
  key, and re-ranks exactly against ``vectors`` -- candidates only.
  The query side broadcasts; the postings scan is the only big input,
  and Catalyst pushes the key predicates into the parquet scan.
- Determinism: probing a persisted index returns byte-identical
  results to the ad-hoc operator with the same hyperparameters
  (asserted in pytest), so the catalog's persisted-index queries
  reuse the ad-hoc queries' DuckDB oracles unchanged.

Path contract (every public ``build_*`` / ``query_*`` / maintenance
entry point): a SCHEME-LESS index root is driver-local filesystem by
contract -- the layout's existence checks (tombstones, stream
segments, swap healing) and the KB-metadata fast paths
(``_write_small`` / ``_read_small``) all resolve bare paths locally.
On a deployment whose Hadoop default FS is not the local filesystem,
pass an explicit URI (``hdfs://...``, ``s3a://...``): those take the
distributed reader/writer for every table, metadata included, so the
index never splits across filesystems.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .similarity import (
    DIM,
    _cogroup_cell_topk,
    _srp_bands_udf,
    _top_cells_udf,
    cosine,
    hyperplanes,
    kmeans_centroids,
    l2_norm,
)


def _sub(path: str, name: str) -> str:
    return os.path.join(path, name)


def _local_fs_path(path: str) -> str | None:
    """Local-filesystem form of ``path`` for the KB-scale metadata fast
    paths, or None when the path needs the distributed reader/writer (a
    non-file URI).  The index layout already leans on a locally visible
    filesystem for existence checks (tombstones, stream segments,
    ``_heal_swap_for_read``), so bare paths are local by contract."""
    if path.startswith("file://"):
        return path[len("file://"):]
    if "://" in path:
        return None
    return path


#: DDL -> Arrow types for the metadata tables (flat schemas only).
#: int maps to int32 / long to int64 exactly as Spark's parquet writer
#: emits them, so a table written here reads back with the identical
#: Spark schema the ``createDataFrame`` path produced.
_DDL_ARROW_TYPES = {
    "boolean": "bool_",
    "int": "int32",
    "integer": "int32",
    "long": "int64",
    "bigint": "int64",
    "float": "float32",
    "double": "float64",
    "string": "string",
}


def _arrow_schema_from_ddl(schema: str):
    """pyarrow schema for a flat DDL string ("name type, ..."), or None
    when a type falls outside the metadata vocabulary (caller falls
    back to the Spark writer)."""
    import pyarrow as pa

    fields = []
    for part in schema.split(","):
        toks = part.strip().split(None, 1)
        if len(toks) != 2:
            return None
        name, typ = toks[0], toks[1].strip().lower()
        if typ.startswith("array<") and typ.endswith(">"):
            inner = typ[len("array<"):-1].strip()
            if inner not in _DDL_ARROW_TYPES:
                return None
            fields.append(
                pa.field(name, pa.list_(getattr(pa, _DDL_ARROW_TYPES[inner])()))
            )
        elif typ in _DDL_ARROW_TYPES:
            fields.append(pa.field(name, getattr(pa, _DDL_ARROW_TYPES[typ])()))
        else:
            return None
    return pa.schema(fields)


def _write_small(spark: SparkSession, data: list, schema: str, path: str) -> None:
    """Write a KB-scale metadata table as ONE parquet file.

    Local paths are written DRIVER-SIDE via pyarrow (guide §5: KB-scale
    metadata is driver work -- launching a distributed job for a config
    row costs ~0.4 s of pure scheduling per call, and the persisted
    composites pay it 2-4x per build).  The non-local fallback is the
    original ``parallelize(data, 1)`` single-task write
    (``createDataFrame(...).coalesce(1)`` would put the
    default-parallelism local partitions into a single task that
    deserializes them sequentially -- measured ~5 s per tiny table on
    local[32])."""
    lp = _local_fs_path(path)
    asch = _arrow_schema_from_ddl(schema) if lp is not None else None
    if asch is not None:
        import shutil

        import pyarrow as pa
        import pyarrow.parquet as pq

        names = asch.names
        for row in data:
            # dict(zip(...)) would silently NULL-fill or drop on arity
            # mismatch where the Spark createDataFrame path raised --
            # keep caller bugs loud (round-14 advice).
            if len(row) != len(names):
                raise ValueError(
                    f"metadata row arity {len(row)} != schema arity "
                    f"{len(names)} for {path}"
                )
        table = pa.Table.from_pylist(
            [dict(zip(names, row)) for row in data], schema=asch
        )
        shutil.rmtree(lp, ignore_errors=True)
        os.makedirs(lp, exist_ok=True)
        pq.write_table(
            table, os.path.join(lp, "part-00000.parquet"), compression="zstd"
        )
        # Spark-writer layout parity for any reader that looks for it.
        open(os.path.join(lp, "_SUCCESS"), "w").close()
        return
    spark.createDataFrame(
        spark.sparkContext.parallelize(data, 1), schema
    ).write.mode("overwrite").parquet(path)


def _read_small(spark: SparkSession, path: str) -> list[dict]:
    """Rows of a KB-scale metadata table as dicts.  Local paths read
    driver-side via pyarrow -- a config/stats/quantizer pull is a
    scalar driver read, not a distributed job (each saved Spark job is
    ~0.15-0.3 s of scheduling on the probe path); non-local paths fall
    back to the distributed reader."""
    lp = _local_fs_path(path)
    if lp is not None and os.path.isdir(lp):
        import pyarrow.parquet as pq

        return pq.read_table(lp).to_pylist()
    return [r.asDict() for r in spark.read.parquet(path).collect()]


def _run_overlapped(*thunks) -> None:
    """Run independent Spark write jobs concurrently from a small
    driver thread pool (guide §2.6: actions are only sequential because
    driver code calls them sequentially).  Spark schedules concurrent
    jobs FIFO, so the later job's tasks back-fill executors freed by
    the earlier job's straggler tail instead of waiting at a full
    barrier.  Callers pass writes to DIFFERENT output directories with
    no shared mutable state; any thunk's exception propagates after all
    have finished (no partial-silence)."""
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=len(thunks)) as pool:
        futures = [pool.submit(t) for t in thunks]
        errs = [f.exception() for f in futures]
    for e in errs:
        if e is not None:
            raise e


def build_lsh_index(
    vectors: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bands: int = 16,
    rows_per_band: int = 4,
    planes: list[list[float]] | None = None,
    seed: int = 42,
    dim: int = DIM,
) -> None:
    """Materialize an SRP-LSH index for ``vectors`` at ``path``.

    One corpus pass computes the banded signatures (Arrow matmul UDF);
    postings and the re-rank vector table are written as parquet.  The
    hyperplane matrix and config row are persisted alongside so a
    probe needs nothing but the path.
    """
    if planes is None:
        planes = hyperplanes(bands * rows_per_band, dim=dim, seed=seed)
    elif len(planes) != bands * rows_per_band:
        raise ValueError("planes must have bands * rows_per_band rows")
    spark = vectors.sparkSession
    bands_udf = _srp_bands_udf(planes, bands, rows_per_band)

    base = vectors.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    entries = base.select(
        "id", F.posexplode(bands_udf(F.col("vec"))).alias("band_id", "bucket")
    )
    # The two corpus-pass writes are independent (different output
    # dirs, shared read-only lineage) -- overlapped so the signature
    # pass and the vector copy share the executor pool instead of
    # running back to back (guide §2.6).
    _run_overlapped(
        lambda: entries.write.mode("overwrite").parquet(_sub(path, "entries")),
        lambda: base.write.mode("overwrite").parquet(_sub(path, "vectors")),
    )
    _write_small(
        spark,
        [(j, [float(x) for x in plane]) for j, plane in enumerate(planes)],
        "plane_id int, w array<double>",
        _sub(path, "planes"),
    )
    _write_small(
        spark,
        [("lsh", int(bands), int(rows_per_band), int(dim))],
        "kind string, bands int, rows_per_band int, dim int",
        _sub(path, "config"),
    )


def append_lsh_index(
    vectors: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Incrementally add vectors to an existing SRP-LSH index: the
    persisted hyperplanes are re-read (so signatures are computed
    against the SAME quantizer the index was built with) and the new
    postings/vectors are appended -- the daily-ingest maintenance
    path; no rebuild, cost is one pass over the NEW rows only.
    Caller contract: ids must be disjoint from ids already indexed
    (append never dedups)."""
    spark = vectors.sparkSession
    cfg = _read_small(spark, _sub(path, "config"))[0]
    if cfg["kind"] != "lsh":
        raise ValueError(f"index at {path} is {cfg['kind']!r}, not lsh")
    plane_rows = sorted(
        _read_small(spark, _sub(path, "planes")), key=lambda r: r["plane_id"]
    )
    planes = [list(r["w"]) for r in plane_rows]
    bands_udf = _srp_bands_udf(planes, cfg["bands"], cfg["rows_per_band"])

    # Cast to the PERSISTED element type: appending array<double> rows
    # into an array<float> vectors table would leave mixed parquet
    # schemas that fail at read time (same guard as append_pq_index).
    stored_t = spark.read.parquet(_sub(path, "vectors")).schema["vec"].dataType
    base = vectors.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast(stored_t).alias("vec")
    )
    entries = base.select(
        "id", F.posexplode(bands_udf(F.col("vec"))).alias("band_id", "bucket")
    )
    entries.write.mode("append").parquet(_sub(path, "entries"))
    base.write.mode("append").parquet(_sub(path, "vectors"))


def _check_match_args(match_col, attrs, negate) -> None:
    """Shared parameter contract for the per-query attribute constraint
    (``match_col``/``attrs``/``negate``) on persisted-index probes."""
    if negate and match_col is None:
        raise ValueError("negate=True needs match_col")
    if (match_col is None) != (attrs is None):
        raise ValueError("match_col and attrs must be passed together "
                         "(attrs is the (id, attribute) side table)")


def _apply_match_filter(
    cand: DataFrame,
    attrs: DataFrame,
    id_col: str,
    match_col: str,
    negate: bool,
    nb_col: str = "id",
) -> DataFrame:
    """Apply the null-safe per-query attribute constraint to a
    candidate table that carries ``q_attr`` (the query's value) and
    ``nb_col`` (the neighbor id): join the (id, attribute) metadata
    side table and keep rows where the attributes match (or differ,
    ``negate=True`` -- hard-negative mining).  IS [NOT] DISTINCT FROM
    semantics throughout, the ``similarity.filtered_ivf_topk``
    contract.  The join is candidate-sized, not corpus-sized, when
    the probe is selective.

    The attrs join is LEFT so a candidate whose id has no attrs row
    keeps ``nb_attr = NULL`` and the null-safe predicate decides --
    exactly the ad-hoc contract, where ``match_col`` is a column of
    the vectors table and a missing attribute is a NULL, never a
    dropped row.  (An inner join here silently removed metadata-less
    neighbors under BOTH polarities, contradicting the advertised
    "NULLs never silently drop rows" semantics for ``negate=True``.)"""
    cand = cand.join(
        attrs.select(
            F.col(id_col).alias(nb_col), F.col(match_col).alias("nb_attr")
        ),
        nb_col,
        "left",
    )
    eq = F.col("nb_attr").eqNullSafe(F.col("q_attr"))
    return cand.where(~eq if negate else eq).drop("nb_attr", "q_attr")


def query_lsh_index(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    allowed: DataFrame | None = None,
    match_col: str | None = None,
    attrs: DataFrame | None = None,
    negate: bool = False,
) -> DataFrame:
    """Probe a persisted SRP-LSH index: band-bucket candidates from the
    postings scan, exact cosine re-rank against the stored vectors.
    Same result contract as ``similarity.lsh_topk`` -- (query_id,
    neighbor_id, cos_sim, rank).

    ``allowed`` (optional, 1 column named ``id_col``): metadata-filtered
    search -- postings LEFT SEMI joined on the allow-list BEFORE the
    re-rank, the family-wide contract documented at
    ``similarity.filtered_ivf_topk`` (for LSH the recall lever under
    selectivity is more bands, not more probes).

    ``match_col`` + ``attrs`` (+ ``negate``): the per-query attribute
    constraint from an (``id_col``, ``match_col``) metadata side
    table, applied null-safely to the candidate set BEFORE the
    re-rank -- the ``query_ivf_index`` contract, family-wide."""
    _check_match_args(match_col, attrs, negate)
    cfg = _read_small(spark, _sub(path, "config"))[0]
    if cfg["kind"] != "lsh":
        raise ValueError(f"index at {path} is {cfg['kind']!r}, not lsh")
    plane_rows = sorted(
        _read_small(spark, _sub(path, "planes")), key=lambda r: r["plane_id"]
    )
    planes = [list(r["w"]) for r in plane_rows]
    bands_udf = _srp_bands_udf(planes, cfg["bands"], cfg["rows_per_band"])

    q_cols = [
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("query_vec"),
        F.posexplode(bands_udf(F.col(vec_col))).alias("band_id", "bucket"),
    ]
    if match_col is not None:
        q_cols.append(F.col(match_col).alias("q_attr"))
    qb = queries.select(*q_cols)
    entries = _read_with_segments(spark, path, "entries")
    if allowed is not None:
        entries = entries.join(
            allowed.select(F.col(id_col).alias("id")), "id", "left_semi"
        )
    cand = entries.join(F.broadcast(qb), ["band_id", "bucket"]).where(
        F.col("id") != F.col("query_id")
    )
    if match_col is not None:
        cand = _apply_match_filter(cand, attrs, id_col, match_col, negate)
    cand = (
        cand.groupBy("query_id", "id")
        .agg(F.first("query_vec").alias("query_vec"))
        .select("query_id", F.col("id").alias("neighbor_id"), "query_vec")
    )
    vecs = _read_with_segments(spark, path, "vectors").select(
        F.col("id").alias("neighbor_id"), "vec"
    )
    scored = cand.join(vecs, "neighbor_id").select(
        "query_id",
        "neighbor_id",
        cosine(F.col("query_vec"), F.col("vec")).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", F.round("cos_sim", 6).alias("cos_sim"), "rank"
        )
    )


#: Marker + manifest for segment absorption (``absorb_stream_segments``).
#: The marker is held across the absorb's main-table rewrites so probes
#: dedup the union in the crash window (the text-index ``_absorbing``
#: contract); the manifest records WHICH batch ids have been folded into
#: the main tables, permanently excluding them from segment reads -- so
#: a batch replayed AFTER its absorb (at-least-once delivery, checkpoint
#: behind the absorb) recreates its directory but never double-counts.
#: Batch ids are unique per index lifetime by the ingest contract (a
#: replayed id carries the same rows; reusing an id for new data was
#: already a replay-idempotency violation before absorption existed).
_ABSORB_MARKER = "_absorbing"
_ABSORB_MANIFEST = "_absorbed.json"


def _absorbed_batches(path: str) -> dict[str, list[int]]:
    import json

    mf = _sub(path, _ABSORB_MANIFEST)
    if not os.path.exists(mf):
        return {}
    with open(mf) as fh:
        return {k: list(v) for k, v in json.load(fh).items()}


#: Sidecar INSIDE a segment tree listing the original batch ids the
#: fold merged into ``batch=-1``.  Living inside the tree makes it
#: atomic with the fold's data swap (one rename commits both), parquet
#: directory listings skip the ``_`` prefix, and reads exclude the
#: listed ids exactly like absorbed ones -- so a batch directory
#: replayed AFTER its fold never double-counts against ``batch=-1``
#: (previously a documented until-next-fold window), and the absorb
#: manifest can record fold-destroyed ids it could no longer see.
_FOLDED_SIDECAR = "_folded_ids.json"


def _folded_ids(seg_dir: str) -> list[int]:
    import json

    sc = os.path.join(seg_dir, _FOLDED_SIDECAR)
    if not os.path.exists(sc):
        return []
    with open(sc) as fh:
        return [int(i) for i in json.load(fh)]


def _write_absorb_manifest(path: str, tree_names) -> None:
    """Atomically extend the absorb manifest with every stream batch
    id now living in the main tables: per present tree, the directory
    ids on disk PLUS the fold sidecar's destroyed ids, unioned with
    the FULL prior manifest (keys for absent trees must survive --
    dropping one reopens the replay double-count).  One writer for
    all three families (ann / text / winnowing) so the contract can
    never drift per copy."""
    import json

    prior = _absorbed_batches(path)
    new_ids = {k: sorted(set(int(i) for i in v)) for k, v in prior.items()}
    for tree in tree_names:
        tdir = _sub(path, tree)
        if not os.path.exists(tdir):
            continue
        ids = {
            int(d.split("=", 1)[1])
            for d in os.listdir(tdir)
            if d.startswith("batch=") and int(d.split("=", 1)[1]) >= 0
        }
        new_ids[tree] = sorted(
            ids | set(_folded_ids(tdir)) | set(new_ids.get(tree, []))
        )
    mf_tmp = _sub(path, _ABSORB_MANIFEST + ".tmp")
    with open(mf_tmp, "w") as fh:
        json.dump(new_ids, fh)
    os.replace(mf_tmp, _sub(path, _ABSORB_MANIFEST))


def _recover_swap(path: str, main_name: str) -> None:
    """Re-run recovery for ``_swap_dir``'s crash window: a missing
    main table with its ``__old`` twin present is restored (the
    pre-swap state; the interrupted maintenance simply re-runs), and
    stale ``__old`` / ``__next`` staging directories are cleared."""
    import shutil

    final = _sub(path, main_name)
    old = final + "__old"
    tmp = final + "__next"
    if not os.path.exists(final) and os.path.exists(old):
        os.rename(old, final)
    for stale in (old, tmp):
        if os.path.exists(final) and os.path.exists(stale):
            shutil.rmtree(stale)


def _heal_swap_for_read(path: str, name: str) -> None:
    """The restore-from-``__old`` half of ``_recover_swap``, safe to
    run on EVERY probe: a crash between ``_swap_dir``'s two renames
    leaves the table absent with its aside copy present, and before
    round 12 probes failed loudly on the missing path until the next
    maintenance job ran recovery -- an availability window with a
    one-rename fix.  Unlike full ``_recover_swap`` this never deletes
    staging directories, so a read racing a healthy in-flight
    maintenance job cannot destroy that job's ``__next`` work; if the
    heal fires inside a healthy swap's two-rename window (on-disk
    state is indistinguishable from a crash), ``_swap_dir``'s retry
    loop takes the restored copy aside again and completes -- the
    race costs the maintenance job one extra rename, never the staged
    data."""
    final = _sub(path, name)
    old = final + "__old"
    if not os.path.exists(final) and os.path.exists(old):
        try:
            os.rename(old, final)
        except OSError:
            # Lost the race with recovery/maintenance doing the same
            # rename -- the table exists now, which is all reads need.
            if not os.path.exists(final):
                raise


def _swap_dir(final: str, tmp: str) -> None:
    """Replace ``final`` with ``tmp`` via rename-aside (never
    rmtree-then-rename: deleting a large parquet dir first leaves a
    long window with NO main table if the process dies).  The only
    vulnerable window is between the two renames -- two metadata ops
    -- and ``_recover_swap`` restores the aside copy on re-run.

    A probe's ``_heal_swap_for_read`` can fire INSIDE that window (it
    cannot tell a crashed swap from an in-flight one -- the on-disk
    state is identical) and rename the aside copy back, making the
    second rename fail on an existing target.  The swap therefore
    RETRIES: take the restored copy aside again and land ``tmp``;
    heals are rare (one rename per probe start, only while ``final``
    is missing), so the loop converges immediately in practice and a
    bounded attempt cap turns a pathological livelock into a loud
    error instead of a silent half-swap."""
    import shutil

    old = final + "__old"
    for _attempt in range(8):
        if os.path.exists(old):
            shutil.rmtree(old)
        os.rename(final, old)
        try:
            os.rename(tmp, final)
            break
        except OSError:
            if not os.path.exists(final):
                # Not the heal race -- a real rename failure with the
                # main table parked at __old.  Best-effort restore so
                # availability does not hinge on a later probe's
                # _heal_swap_for_read, then surface the error.
                try:
                    os.rename(old, final)
                except OSError:
                    pass  # restore failed too; recovery path still applies
                raise
            continue  # a probe healed the window shut; re-take aside
    else:
        raise OSError(
            f"_swap_dir could not land {tmp!r} on {final!r}: concurrent "
            "probes kept restoring the aside copy (heal race)"
        )
    shutil.rmtree(old)


def _fold_tree(
    spark: SparkSession,
    path: str,
    tree_name: str,
    excluded: set[int] | None = None,
    transform=None,
) -> None:
    """Fold ONE streaming segment tree to ``batch=-1`` under the
    crash-safe contract shared by every index family (ann / text /
    winnowing folds and the physical-delete segment rewrites):

    - re-run recovery first (``_recover_swap``): a tree caught
      mid-swap is restored from its ``__old`` aside, so a crashed fold
      never strands the folded data in ``__next`` with probes silently
      serving main-only results;
    - directories whose id is in ``excluded`` (the family's absorb
      manifest) or in the tree's own ``_folded_ids.json`` sidecar are
      at-least-once replays of rows already flowing through another
      read path -- skipped, never re-merged;
    - the merge is full-row DISTINCT; ``transform`` (optional) applies
      last (the delete rewrites pass their tombstone anti-join);
    - the sidecar accumulates every id ever folded and is written INTO
      the staged tree, so one rename commits data + ledger atomically;
    - the swap is rename-aside (``_swap_dir``), never rmtree-first.
    """
    import json

    _recover_swap(path, tree_name)
    seg_dir = _sub(path, tree_name)
    if not os.path.exists(seg_dir):
        return
    gone = set(excluded or ()) | set(_folded_ids(seg_dir))
    live = sorted(
        {
            int(d.split("=", 1)[1])
            for d in os.listdir(seg_dir)
            if d.startswith("batch=") and int(d.split("=", 1)[1]) >= 0
        }
        - gone
    )
    seg = spark.read.option("basePath", seg_dir).parquet(seg_dir)
    if gone:
        seg = seg.where(~F.col("batch").isin(sorted(gone)))
    merged = seg.drop("batch").distinct()
    if transform is not None:
        merged = transform(merged)
    tmp = seg_dir + "__next"
    merged.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(tmp, "batch=-1")
    )
    with open(os.path.join(tmp, _FOLDED_SIDECAR), "w") as fh:
        json.dump(sorted(set(_folded_ids(seg_dir)) | set(live)), fh)
    _swap_dir(seg_dir, tmp)


def _read_with_segments(spark: SparkSession, path: str, name: str) -> DataFrame:
    """A built table unioned with its streaming segment tree
    (``<name>_stream/batch=<id>/``) when one exists -- how the probe
    path sees stream-ingested rows without any rebuild.  The partition
    column from the segment layout is dropped; columns align by
    name.  Batches listed in the absorb manifest are excluded (their
    rows live in the main table now), and a crashed absorb's marker
    makes the union full-row-distinct until the re-run finishes the
    job -- the healthy path pays neither.  Probes self-heal a crashed
    swap first (``_heal_swap_for_read`` on the table and its stream
    tree): availability never waits for the next maintenance run."""
    _heal_swap_for_read(path, name)
    _heal_swap_for_read(path, f"{name}_stream")
    main = spark.read.parquet(_sub(path, name))
    seg_dir = _sub(path, f"{name}_stream")
    if os.path.exists(seg_dir):
        seg = spark.read.option("basePath", seg_dir).parquet(seg_dir)
        # Excluded ids: absorbed into the main table (manifest) or
        # folded into batch=-1 (tree sidecar) -- either way a
        # same-numbered directory is an at-least-once replay whose
        # rows already flow through another read path.
        gone = set(_absorbed_batches(path).get(f"{name}_stream", []))
        gone |= set(_folded_ids(seg_dir))
        if gone:
            seg = seg.where(~F.col("batch").isin(sorted(gone)))
        seg = seg.select(*main.columns)
        main = main.unionByName(seg)
        if os.path.exists(_sub(path, _ABSORB_MARKER)):
            main = main.distinct()
    # Tombstoned ids vanish from EVERY read (postings, codes, re-rank
    # vectors) the moment delete_from_index commits -- not merely from
    # final results: a posting that ranked and then disappeared at the
    # re-rank join would silently shrink top-k below k.
    tomb_dir = _sub(path, "tombstones")
    if os.path.exists(tomb_dir):
        tombs = spark.read.parquet(tomb_dir).select("id")
        main = main.join(tombs, "id", "left_anti")
    return main


def read_index_vectors(
    spark: SparkSession,
    path: str,
    id_col: str = "id",
    vec_col: str = "vec",
) -> DataFrame:
    """PUBLIC read of an index's stored re-rank vector table --
    ``(id_col, vec_col)`` with the full read-path semantics a probe
    sees (streaming segments unioned, absorbed/folded batches
    excluded, tombstoned ids anti-joined, crashed swaps healed).  The
    supported way for serving compositions (MMR re-rank pools, RAG
    context assembly) to source vectors from the deployed store
    instead of re-embedding the corpus, without coupling to segment
    layout or absorb markers (round-12 advice: plans were reaching
    into ``_read_with_segments``)."""
    return _read_with_segments(spark, path, "vectors").select(
        F.col("id").alias(id_col), F.col("vec").alias(vec_col)
    )


def _top_cells_udf_from_path(spark: SparkSession, path: str):
    """(assignment UDF over the persisted centroids, stored vector
    element type) -- the frozen-quantizer encode state a streaming
    ingest batch needs, all KB-scale driver pulls."""
    cfg = _read_small(spark, _sub(path, "config"))[0]
    if cfg["kind"] != "ivf":
        raise ValueError(f"index at {path} is {cfg['kind']!r}, not ivf")
    cent_rows = sorted(
        _read_small(spark, _sub(path, "centroids")), key=lambda r: r["cell"]
    )
    centroids = [(int(r["cell"]), list(r["cv"])) for r in cent_rows]
    stored_t = spark.read.parquet(_sub(path, "vectors")).schema["vec"].dataType
    return _top_cells_udf(centroids, int(cfg["n_assign"])), stored_t


def optimize_stream_segments(spark: SparkSession, path: str) -> None:
    """Compact the streaming segment trees of an ingest-fed index
    (any kind): fold every ``<table>_stream/batch=*`` tree into a
    single ``batch=-1`` tree (rows just concatenate -- segments carry
    no aggregation state), so the probe-side union scans one file set
    however long the stream has run.  Each tree swaps independently
    (rmtree + rename, the optimize-family contract): they are
    separate append-only stores, so a crash between swaps leaves
    every tree self-consistent.  The MAIN tables are never touched;
    use ``absorb_stream_segments`` (round 11) to retire the trees
    entirely -- the fold is the lighter mid-stream compaction, the
    absorb the full maintenance pass.  Single-writer, stream stopped.

    The fold records the original batch ids it merges in a
    ``_folded_ids.json`` sidecar INSIDE the new tree -- committed
    atomically with the data by the same rename -- and reads exclude
    sidecar-listed ids exactly like absorbed ones, so a batch
    directory replayed after its fold (at-least-once delivery,
    checkpoint behind the fold) never double-counts against
    ``batch=-1``, and a later ``absorb_stream_segments`` can still
    record the fold-destroyed ids in its manifest.  Directories whose
    id is already in the absorb manifest or the sidecar are replays
    and are excluded from the merge (their rows already flow through
    the main table or ``batch=-1``); the merge stays full-row
    DISTINCT as a final belt against duplicate rows inside one
    replayed-then-appended directory."""
    absorbed_all = _absorbed_batches(path)
    for name in ("entries_stream", "vectors_stream", "codes_stream"):
        _fold_tree(spark, path, name, set(absorbed_all.get(name, [])))


#: Back-compat alias (round-9 name before the sink went family-wide).
optimize_ivf_stream_segments = optimize_stream_segments


def absorb_stream_segments(spark: SparkSession, path: str) -> None:
    """Absorb the streaming segment trees of an ingest-fed index (any
    of lsh / ivf / pq / ivfpq) INTO the main tables, retiring the
    trees entirely -- the maintenance step that keeps a long-running
    stream's probe plan scanning one file set instead of an
    ever-growing union (``optimize_stream_segments`` folds the trees
    but leaves the union read in place; this removes it).

    Commit protocol (single-writer, stream stopped; the text-index
    absorb contract extended with a replay manifest):

    1. the ``_absorbing`` marker is written -- probes full-row-dedup
       the main+segment union while it exists, so every crash window
       below stays correct (absorbed rows are exact copies of segment
       rows);
    2. each main table is rewritten as (main UNION segments) DISTINCT,
       materialized BEFORE the swap (localCheckpoint), swapped with
       tmp-write + rename-aside (``_swap_dir``: the old table moves to
       ``__old`` and is deleted only after the new one is in place, so
       no crash window leaves the index without a main table;
       ``_recover_swap`` at re-run start restores an interrupted
       swap's aside copy);
    3. the absorb manifest (``_absorbed.json``) is atomically replaced
       (os.replace) recording the stream batch ids now living in the
       main tables: segment reads exclude those ids FOREVER, so a
       batch replayed after its absorb (at-least-once delivery,
       checkpoint behind the absorb) recreates its directory but never
       double-counts -- the wrongness the fold-only design left to a
       documented re-run;
    4. the segment trees are removed, then the marker.

    A crash anywhere re-runs to completion (every step is idempotent);
    probes are correct at every intermediate state -- before the
    manifest lands the marker's distinct covers, after it the batch
    exclusion does.  Tombstoned ids are filtered during the rewrite
    (they were already invisible to probes), which doubles as the
    physical half of a pending takedown for the absorbed rows.

    Batch ids must be unique per index lifetime (the existing ingest
    contract: a replayed id carries the same rows).  The manifest
    records every stream-written id now living in the main tables:
    the directory ids present at absorb time PLUS the ids an earlier
    fold merged into ``batch=-1`` (read from the tree's
    ``_folded_ids.json`` sidecar -- without it a replay of a
    folded-then-absorbed batch would double-count, since the fold
    destroyed its directory id).  ``batch=-1`` itself is absorbed but
    never listed -- the fold, not the stream, writes that id, so a
    post-absorb fold of new batches must stay readable."""
    import shutil

    marker = _sub(path, _ABSORB_MARKER)
    all_names = ("entries_stream", "vectors_stream", "codes_stream")
    # Re-run recovery first: restore any main table OR segment tree
    # caught mid-swap and clear stale staging dirs -- BEFORE anything
    # reads them (a crashed fold's tree recovers here too).
    for seg_name in all_names:
        _recover_swap(path, seg_name[: -len("_stream")])
        _recover_swap(path, seg_name)
    seg_names = [n for n in all_names if os.path.exists(_sub(path, n))]
    if not seg_names:
        # A crash between segment removal and marker removal leaves
        # the marker orphaned; without this cleanup every future
        # probe would pay the marker's full-union distinct forever.
        if os.path.exists(marker):
            os.remove(marker)
        return
    with open(marker, "w") as fh:
        fh.write("absorb in progress; probes dedup segment unions\n")

    for seg_name in seg_names:
        main_name = seg_name[: -len("_stream")]
        # _read_with_segments gives main ∪ (segments minus already-
        # absorbed/folded) minus tombstones, deduped under the marker
        # we just wrote; materialize before the swap reads from it.
        merged = _read_with_segments(spark, path, main_name).localCheckpoint(
            eager=True
        )
        tmp = _sub(path, f"{main_name}__next")
        merged.write.mode("overwrite").parquet(tmp)
        _swap_dir(_sub(path, main_name), tmp)

    # Shared manifest writer: dir ids + fold-sidecar ids, unioned with
    # the FULL prior manifest (absent trees keep their keys).
    _write_absorb_manifest(path, seg_names)

    for seg_name in seg_names:
        shutil.rmtree(_sub(path, seg_name))
    os.remove(marker)


def build_ivf_index(
    vectors: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int | None = None,
    n_assign: int = 2,
    centroids: list[tuple[int, list[float]]] | None = None,
    sample_size: int | None = None,
    kmeans_iter: int = 10,
    seed: int = 42,
    dim: int = DIM,
) -> None:
    """Materialize an IVF index: the coarse quantizer's centroid table
    plus the corpus-to-cell multi-assignment (the inverted lists).
    Pass ``centroids`` (e.g. ``seed_centroids``) to pin the quantizer;
    otherwise the sampled Lloyd's quantizer (``kmeans_centroids``)
    trains on build -- with cells/sample derived from the corpus size
    (``similarity.ivf_geometry``) when not given, so a growing corpus
    gets a growing quantizer instead of a frozen 64-cell default."""
    if centroids is None:
        from .similarity import _derived_sample_size, ivf_geometry

        if n_cells is None:
            # Only the cell count needs the corpus size -- a pinned
            # n_cells must not pay a corpus count job.
            n_cells = ivf_geometry(vectors.count(), n_assign=n_assign)["n_cells"]
        if sample_size is None:
            sample_size = _derived_sample_size(n_cells)
        centroids = kmeans_centroids(
            vectors,
            n_cells,
            id_col=id_col,
            vec_col=vec_col,
            sample_size=sample_size,
            n_iter=kmeans_iter,
            seed=seed,
        )
    spark = vectors.sparkSession
    assign_cells = _top_cells_udf(centroids, n_assign)

    base = vectors.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    entries = base.select("id", F.explode(assign_cells(F.col("vec"))).alias("cell"))
    # Independent writes (different dirs, read-only shared lineage):
    # overlap the assignment pass and the vector copy (guide §2.6).
    _run_overlapped(
        lambda: entries.write.mode("overwrite").parquet(_sub(path, "entries")),
        lambda: base.write.mode("overwrite").parquet(_sub(path, "vectors")),
    )
    _write_small(
        spark,
        [(int(c), [float(x) for x in v]) for c, v in centroids],
        "cell int, cv array<double>",
        _sub(path, "centroids"),
    )
    _write_small(
        spark,
        [("ivf", int(n_assign), int(dim))],
        "kind string, n_assign int, dim int",
        _sub(path, "config"),
    )


def append_ivf_index(
    vectors: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Incrementally add vectors to an existing IVF index against its
    PERSISTED centroids (quantizer state never drifts between build
    and append).  Same caller contract as ``append_lsh_index``: new
    ids must be disjoint from those already indexed."""
    spark = vectors.sparkSession
    cfg = _read_small(spark, _sub(path, "config"))[0]
    if cfg["kind"] != "ivf":
        raise ValueError(f"index at {path} is {cfg['kind']!r}, not ivf")
    cent_rows = sorted(
        _read_small(spark, _sub(path, "centroids")), key=lambda r: r["cell"]
    )
    centroids = [(int(r["cell"]), list(r["cv"])) for r in cent_rows]
    assign_cells = _top_cells_udf(centroids, cfg["n_assign"])

    # Same persisted-element-type guard as append_lsh_index/_pq_index.
    stored_t = spark.read.parquet(_sub(path, "vectors")).schema["vec"].dataType
    base = vectors.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast(stored_t).alias("vec")
    )
    entries = base.select("id", F.explode(assign_cells(F.col("vec"))).alias("cell"))
    entries.write.mode("append").parquet(_sub(path, "entries"))
    base.write.mode("append").parquet(_sub(path, "vectors"))


def optimize_ivf_index(
    spark: SparkSession,
    path: str,
    cell_cap: int,
    max_rounds: int = 16,
    spill_frac: float = 0.05,
) -> None:
    """Re-balance an append-grown IVF index: ``append_ivf_index`` adds
    postings under FROZEN centroids, so a skewed ingest fattens a few
    inverted lists unboundedly (probe cost over a hot cell grows
    linearly forever).  This job completes the optimize family
    (parquet / graph / winnowing / text / history): cells over
    ``cell_cap`` are split by the distributed RP-tree median-cut pass
    the semantic-dedup family already uses
    (``semdedup.split_oversized_cells`` -- spill-banded random-
    projection cuts, O(log2(max_cell/cap)) rounds, no balance
    assumptions), each touched cell's centroid is re-derived as its
    members' MEAN (one posexplode agg -- the Lloyd's update step for
    exactly the cells that changed), and untouched cells keep their
    original trained centroids so their probe routing is unchanged.

    The rewritten centroid table stays a driver-side broadcast (the
    IVF probe contract); splitting raises its size by at most
    sum(ceil(size/cap) - 1) over hot cells -- callers cap growth by
    choosing ``cell_cap`` at the advisory-partition scale, same
    regime as ``semdedup.quantizer_plan``.  A cell of exactly
    identical vectors cannot split (the RP pass freezes it) and
    legitimately stays over the cap.  Both rewritten tables are staged
    to ``__next`` directories FIRST, then the centroids and entries
    swaps run back-to-back LAST (rmtree + rename, local/posix-rename
    contract, like the other optimize jobs) -- all-compute-then-swap
    shrinks the window in which a crash leaves new centroids (fresh
    cell ids, moved parents) pointing at old entries from the whole
    entries rewrite down to the two renames; single-writer."""
    import os
    import shutil

    from .semdedup import split_oversized_cells
    from .similarity import l2_norm

    cfg = _read_small(spark, _sub(path, "config"))[0]
    if cfg["kind"] != "ivf":
        raise ValueError(f"index at {path} is {cfg['kind']!r}, not ivf")
    if os.path.exists(_sub(path, "entries_stream")):
        # Splitting cells while stream segments reference the OLD cell
        # ids would strand their postings on the wrong side of the
        # split; absorbing them here would need a cross-directory
        # atomic swap.  Rebuild (or re-append the segment vectors)
        # after draining the stream instead.
        raise ValueError(
            "index has streaming ingest segments; re-balance requires a "
            "rebuild that absorbs them (drain the stream, then "
            "build_ivf_index over the unioned vectors)"
        )

    entries = spark.read.parquet(_sub(path, "entries"))
    oversized = [
        int(r["cell"])
        for r in entries.groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > cell_cap)
        .collect()
    ]
    if not oversized:
        return
    vectors = spark.read.parquet(_sub(path, "vectors"))
    assigned = entries.join(vectors, "id").select(
        "id", "vec", l2_norm(F.col("vec")).alias("nrm"), "cell"
    )
    re_assigned = split_oversized_cells(
        assigned, cell_cap, max_rounds=max_rounds, spill_frac=spill_frac
    ).localCheckpoint(eager=True)

    # Mean centroid per TOUCHED cell (parents keep their id for the
    # left half; right halves got fresh ids > the old maximum).
    old_cent = {
        int(r["cell"]): list(r["cv"])
        for r in _read_small(spark, _sub(path, "centroids"))
    }
    touched = re_assigned.where(
        F.col("cell").isin(oversized) | ~F.col("cell").isin(list(old_cent))
    )
    means = (
        touched.select("cell", F.posexplode("vec").alias("pos", "x"))
        .groupBy("cell", "pos")
        .agg(F.avg("x").alias("m"))
        .groupBy("cell")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
        .select("cell", F.col("pm.m").alias("cv"))
        .collect()
    )
    new_cent = dict(old_cent)
    for r in means:
        new_cent[int(r["cell"])] = [float(x) for x in r["cv"]]
    # Stage EVERYTHING, then swap both directories back-to-back: the
    # expensive entries rewrite happens while the live centroids and
    # entries are still mutually consistent.
    cent_tmp = _sub(path, "centroids__next")
    _write_small(
        spark,
        [(c, v) for c, v in sorted(new_cent.items())],
        "cell int, cv array<double>",
        cent_tmp,
    )
    ent_tmp = _sub(path, "entries__next")
    re_assigned.select("id", "cell").write.mode("overwrite").parquet(ent_tmp)
    cent_final = _sub(path, "centroids")
    ent_final = _sub(path, "entries")
    shutil.rmtree(cent_final)
    os.rename(cent_tmp, cent_final)
    shutil.rmtree(ent_final)
    os.rename(ent_tmp, ent_final)


def query_ivf_index(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    allowed: DataFrame | None = None,
    match_col: str | None = None,
    attrs: DataFrame | None = None,
    negate: bool = False,
) -> DataFrame:
    """Probe a persisted IVF index: nearest-``n_probe`` cells per query
    (centroids loaded driver-side, KBs), postings equi-join on the cell
    id, exact cosine re-rank.  Same result contract as
    ``similarity.ivf_topk``.

    ``allowed`` (optional, 1 column named ``id_col``): metadata-filtered
    search against the SAME index -- the postings are LEFT SEMI joined
    on the allow-list before the re-rank, so all k results satisfy the
    filter and the re-rank cost shrinks with the selectivity (raise
    ``n_probe`` ~ 1/selectivity to hold recall; see
    ``similarity.filtered_ivf_topk`` for the cost model).

    ``match_col`` + ``attrs`` (optional): the PER-QUERY attribute
    constraint (``filtered_ivf_topk``'s other shape, served from the
    index).  The index stores only (id, cell, vec) -- attributes live
    in a caller-supplied side table ``attrs`` with columns (``id_col``,
    ``match_col``), the vector-DB metadata-table convention; queries
    must carry ``match_col`` too.  The (null-safe, IS [NOT] DISTINCT
    FROM) predicate applies to the candidate set BEFORE the re-rank;
    ``negate=True`` flips it -- HARD-NEGATIVE MINING from the
    persisted index.  Cost: one id-keyed equi join of the candidate
    postings against ``attrs`` (candidates, not corpus, when the
    probe is selective)."""
    _check_match_args(match_col, attrs, negate)
    cfg = _read_small(spark, _sub(path, "config"))[0]
    if cfg["kind"] != "ivf":
        raise ValueError(f"index at {path} is {cfg['kind']!r}, not ivf")
    cent_rows = sorted(
        _read_small(spark, _sub(path, "centroids")), key=lambda r: r["cell"]
    )
    centroids = [(int(r["cell"]), list(r["cv"])) for r in cent_rows]
    probe_cells = _top_cells_udf(centroids, n_probe)

    q_cols = [
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("query_vec"),
        F.explode(probe_cells(F.col(vec_col))).alias("cell"),
    ]
    if match_col is not None:
        q_cols.append(F.col(match_col).alias("q_attr"))
    probes = queries.select(*q_cols)
    entries = _read_with_segments(spark, path, "entries")
    if allowed is not None:
        entries = entries.join(
            allowed.select(F.col(id_col).alias("id")), "id", "left_semi"
        )
    cand = entries.join(F.broadcast(probes), "cell").where(
        F.col("id") != F.col("query_id")
    )
    if match_col is not None:
        cand = _apply_match_filter(cand, attrs, id_col, match_col, negate)
    cand = (
        cand.groupBy("query_id", "id")
        .agg(F.first("query_vec").alias("query_vec"))
        .select("query_id", F.col("id").alias("neighbor_id"), "query_vec")
    )
    vecs = _read_with_segments(spark, path, "vectors").select(
        F.col("id").alias("neighbor_id"), "vec"
    )
    scored = cand.join(vecs, "neighbor_id").select(
        "query_id",
        "neighbor_id",
        cosine(F.col("query_vec"), F.col("vec")).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", F.round("cos_sim", 6).alias("cos_sim"), "rank"
        )
    )


def ivf_index_cogroup_join(
    spark: SparkSession,
    path: str,
    batch: DataFrame,
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Large-by-large ANN join against a PERSISTED IVF index: the
    top-``k`` corpus neighbors for EVERY row of an incoming table,
    with the corpus's cell assignments read straight from the index's
    inverted lists instead of recomputed -- the build-once /
    join-many form of ``similarity.ivf_cogroup_join`` (daily
    embedding-decontamination of incoming batches against a fixed
    benchmark store).  Only the BATCH side is assigned at join time
    (centroids loaded driver-side, KBs); the stored ``n_assign``
    decides the dedup pass, so results match the ad-hoc join called
    with the same centroids and assignment width (asserted in
    pytest).  Appends/optimize keep the entries table current, and
    the amortized corpus pass is exactly what the ad-hoc form pays
    per call."""
    cfg = _read_small(spark, _sub(path, "config"))[0]
    if cfg["kind"] != "ivf":
        raise ValueError(f"index at {path} is {cfg['kind']!r}, not ivf")
    cent_rows = sorted(
        _read_small(spark, _sub(path, "centroids")), key=lambda r: r["cell"]
    )
    centroids = [(int(r["cell"]), list(r["cv"])) for r in cent_rows]
    probe_cells = _top_cells_udf(centroids, n_probe)

    qa = batch.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        l2_norm(F.col(vec_col)).alias("qn"),
        F.explode(probe_cells(F.col(vec_col))).alias("cell"),
    )
    vecs = _read_with_segments(spark, path, "vectors")
    nb = (
        _read_with_segments(spark, path, "entries")
        .join(vecs, "id")
        .select(
            F.col("id").alias("neighbor_id"),
            F.col("vec").alias("nv"),
            l2_norm(F.col("vec")).alias("nn"),
            "cell",
        )
    )
    id_type = batch.schema[id_col].dataType.simpleString()
    return _cogroup_cell_topk(
        qa, nb, k, id_type, dedup=int(cfg["n_assign"]) > 1
    )


def ivf_index_probe_sweep(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    probes: tuple[int, ...] = (1, 2, 4, 8),
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Recall/cost sweep measured ON THE PERSISTED STORE -- the
    deployment-tuning twin of ``similarity.ivf_probe_sweep``: the
    inverted lists come straight off the index's ``entries`` table
    (stream segments and tombstones included, so the curve describes
    the index as probes actually see it TODAY -- appends and deletes
    shift it), the query fan-out uses the persisted centroids, and the
    exact ground truth is one brute-force pass over the index's own
    vector table with the bounded query sample broadcast.  Returns
    (n_probe, recall_at_k, scan_frac), the curve a serving team reads
    before changing a deployed index's probe width.  Result-identical
    to the ad-hoc sweep at the same quantizer (pytest), so the
    catalog's persisted row reuses the ad-hoc oracle."""
    from .similarity import _probe_sweep_from_parts, brute_force_topk

    if not probes or any(int(p) < 1 for p in probes):
        raise ValueError("probes must be a non-empty tuple of levels >= 1")
    cfg = _read_small(spark, _sub(path, "config"))[0]
    if cfg["kind"] != "ivf":
        raise ValueError(f"index at {path} is {cfg['kind']!r}, not ivf")
    cent_rows = sorted(
        _read_small(spark, _sub(path, "centroids")), key=lambda r: r["cell"]
    )
    centroids = [(int(r["cell"]), list(r["cv"])) for r in cent_rows]
    probe_cells = _top_cells_udf(centroids, max(probes))

    vectors = _read_with_segments(spark, path, "vectors").select(
        F.col("id").alias(id_col), F.col("vec").alias(vec_col)
    )
    n_corpus = vectors.count()
    n_q = queries.count()
    if n_q == 0 or n_corpus < 2:
        raise ValueError(
            "ivf_index_probe_sweep needs a non-empty query sample and "
            ">= 2 indexed vectors"
        )
    exact = brute_force_topk(
        vectors, queries, k=k, id_col=id_col, vec_col=vec_col
    ).select("query_id", "neighbor_id")
    probe_ranked = queries.select(
        F.col(id_col).alias("query_id"),
        F.posexplode(probe_cells(F.col(vec_col))).alias("cell_pos", "cell"),
    ).select("query_id", (F.col("cell_pos") + 1).alias("cell_rank"), "cell")
    assigned = _read_with_segments(spark, path, "entries").select(
        F.col("id").alias("neighbor_id"), "cell"
    )
    return _probe_sweep_from_parts(
        spark, exact, probe_ranked, assigned, probes, n_corpus, n_q
    )


def build_pq_index(
    vectors: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    n_codes: int = 16,
    codebooks: list[list[list[float]]] | None = None,
    rotation: tuple | None = None,
    dim: int = DIM,
) -> None:
    """Materialize a product-quantization index: per-vector packed code
    arrays (m small ints -- the 64x-compressed corpus representation
    that makes billion-vector serving memory-feasible), the codebook
    table, optionally the OPQ rotation, and the exact-re-rank vector
    table.  The missing member of the persisted family
    (lsh / ivf / text / graph): at 100 TB the ENCODE pass is the
    expensive corpus scan, so a serving tier runs it once and probes
    forever.

    ``codebooks`` pins the quantizer (``pq_seed_codebooks`` for the
    oracle-checkable twin); default trains the production Lloyd
    codebooks (``pq_codebooks``).  ``rotation`` is an optional
    (mu[dim], R[dim, dim]) pair from ``similarity.opq_rotation`` --
    when present, corpus (here) and queries (at probe) are rotated
    before coding, making this an OPQ index; the rotation is persisted
    row-wise so the probe needs nothing but the path.

    Layout (plain parquet, the family contract):
        <root>/config/     (kind='pq', m, n_codes, dim, rotated)
        <root>/codebooks/  (subspace, code, cv array<double>)
        <root>/codes/      (id, codes array<int>)   -- packed, 1 row/vec
        <root>/rotation/   (i, r array<double>, mu double)  [if OPQ]
        <root>/vectors/    (id, vec)                -- exact re-rank
    """
    from .similarity import (
        _apply_projection,
        _pq_codes_udf,
        pq_codebooks,
        pq_seed_codebooks,
    )

    spark = vectors.sparkSession
    src = vectors.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    enc_src = src
    if rotation is not None:
        mu, R = rotation
        enc_src = _apply_projection(
            src, mu, R, id_col="id", vec_col="vec"
        ).localCheckpoint(eager=True)
    if codebooks is None:
        codebooks = pq_codebooks(
            enc_src, m=m, k=n_codes, dim=dim, id_col="id", vec_col="vec"
        )
    codes_udf = _pq_codes_udf(codebooks)
    # Vectors are stored UNROTATED: rotation is orthogonal, so exact
    # re-rank distances are identical either way, and the raw table
    # stays reusable by every other index family.  The encode pass and
    # the vector copy are independent writes -- overlapped (guide §2.6).
    _run_overlapped(
        lambda: enc_src.select(
            "id", codes_udf(F.col("vec")).alias("codes")
        ).write.mode("overwrite").parquet(_sub(path, "codes")),
        lambda: src.write.mode("overwrite").parquet(_sub(path, "vectors")),
    )
    _write_small(
        spark,
        [
            (int(s), int(c), [float(x) for x in cb])
            for s, sub in enumerate(codebooks)
            for c, cb in enumerate(sub)
        ],
        "subspace int, code int, cv array<double>",
        _sub(path, "codebooks"),
    )
    if rotation is not None:
        mu, R = rotation
        _write_small(
            spark,
            [
                (int(i), [float(x) for x in R[i]], float(mu[i]))
                for i in range(dim)
            ],
            "i int, r array<double>, mu double",
            _sub(path, "rotation"),
        )
    _write_small(
        spark,
        [("pq", int(m), int(n_codes), int(dim), rotation is not None)],
        "kind string, m int, n_codes int, dim int, rotated boolean",
        _sub(path, "config"),
    )


def _centroid_df(spark: SparkSession, centroids) -> DataFrame:
    return F.broadcast(
        spark.createDataFrame(
            [(int(c), [float(x) for x in v]) for c, v in centroids],
            "cell int, cv array<double>",
        )
    )


def _ivfpq_encode(
    df: DataFrame,
    centroids,
    codebooks,
    id_col: str,
    vec_col: str,
    n_assign: int = 1,
    rotation: list[list[float]] | None = None,
) -> DataFrame:
    """(id, cell, codes) for ``df`` under the IVF-PQ quantizer pair:
    ``n_assign``-cell dot-product assignment (one codes row per
    assigned cell -- multi-assignment is the coarse-recall lever, see
    ``similarity.ivfpq_geometry``), element-wise residual against
    each cell centroid, PQ encode of the residual -- the shared
    encode of the build pass and the streaming ingest (one Arrow pass
    each for assignment and coding, one broadcast centroid join).
    ``rotation`` (optional): the OPQ coding rotation applied to the
    residual BEFORE encoding via the same left-to-right fold the
    ad-hoc ``ivfpq_topk(rotation=...)`` uses -- codes come out
    bit-identical to the ad-hoc path."""
    from .similarity import _dbl, _pq_codes_udf, _rotate_expr

    spark = df.sparkSession
    assign = _top_cells_udf(centroids, n_assign)
    codes_udf = _pq_codes_udf(codebooks)
    residual = F.zip_with(
        F.col("vec"), F.col("cv"), lambda x, y: _dbl(x) - _dbl(y)
    )
    if rotation is not None:
        residual = _rotate_expr(residual, rotation)
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).alias("vec"),
            F.explode(assign(F.col(vec_col))).alias("cell"),
        )
        .join(_centroid_df(spark, centroids), "cell")
        .select("id", "cell", codes_udf(residual).alias("codes"))
    )


def build_ivfpq_index(
    vectors: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    m: int = 8,
    n_codes: int = 64,
    centroids=None,
    codebooks=None,
    dim: int = DIM,
    n_assign: int = 1,
    rotation: list[list[float]] | None = None,
) -> None:
    """Materialize an IVF-PQ index (IVFADC) -- the billion-scale
    serving composite: coarse centroid table, residual-space codebook
    table, the (cell id + m codes)-per-vector serving table, and the
    exact-re-rank vectors.  Pass ``centroids`` + ``codebooks``
    TOGETHER or neither: the codebooks live in the residual space the
    centroids define (a mismatched pair silently mis-codes), so the
    default trains the production pair
    (``similarity.ivfpq_trained_quantizers``: coarse k-means, then
    residual-space Lloyd codebooks); seed both from
    ``seed_centroids`` + residual ``pq_seed_codebooks`` for the
    oracle-checkable twin.

    ``rotation`` (optional, dim x dim orthogonal): OPQ-rotated
    residual coding (``similarity.ivfpq_topk(rotation=...)``).  The
    rotation persists to ``<root>/rotation/`` so probes and streaming
    ingest encode against it forever after; requires ``centroids`` +
    ``codebooks`` trained in the rotated residual space
    (``ivfpq_opq_quantizers`` / ``ivfpq_opq_seed_quantizers``).

    Layout (plain parquet, the family contract):
        <root>/config/     (kind='ivfpq', m, n_codes, n_cells, dim,
                            n_assign, rotated)
        <root>/centroids/  (cell, cv array<double>)
        <root>/codebooks/  (subspace, code, cv array<double>)
        <root>/rotation/   (i, r array<double>) -- rotated builds only
        <root>/codes/      (id, cell, codes array<int>)
        <root>/vectors/    (id, vec)
    """
    from .similarity import ivfpq_trained_quantizers

    if (centroids is None) != (codebooks is None):
        raise ValueError(
            "pass centroids and codebooks together (codebooks live in "
            "the residual space the centroids define) or neither"
        )
    if rotation is not None and codebooks is None:
        raise ValueError(
            "rotation needs centroids + codebooks trained in the rotated "
            "residual space (ivfpq_opq_quantizers / "
            "ivfpq_opq_seed_quantizers)"
        )
    if centroids is None:
        centroids, codebooks = ivfpq_trained_quantizers(
            vectors, n_cells=n_cells, m=m, n_codes=n_codes,
            id_col=id_col, vec_col=vec_col, dim=dim,
        )
    spark = vectors.sparkSession
    # Encode pass and vector copy are independent writes -- overlapped
    # (guide §2.6).
    _run_overlapped(
        lambda: _ivfpq_encode(
            vectors, centroids, codebooks, id_col, vec_col,
            n_assign=n_assign, rotation=rotation,
        ).write.mode("overwrite").parquet(_sub(path, "codes")),
        lambda: vectors.select(
            F.col(id_col).alias("id"), F.col(vec_col).alias("vec")
        ).write.mode("overwrite").parquet(_sub(path, "vectors")),
    )
    _write_small(
        spark,
        [(int(c), [float(x) for x in v]) for c, v in centroids],
        "cell int, cv array<double>",
        _sub(path, "centroids"),
    )
    _write_small(
        spark,
        [
            (int(s), int(c), [float(x) for x in cb])
            for s, sub in enumerate(codebooks)
            for c, cb in enumerate(sub)
        ],
        "subspace int, code int, cv array<double>",
        _sub(path, "codebooks"),
    )
    if rotation is not None:
        _write_small(
            spark,
            [(int(i), [float(x) for x in row]) for i, row in enumerate(rotation)],
            "i int, r array<double>",
            _sub(path, "rotation"),
        )
    _write_small(
        spark,
        [
            (
                "ivfpq",
                int(m),
                int(n_codes),
                int(len(centroids)),
                int(dim),
                int(n_assign),
                rotation is not None,
            )
        ],
        "kind string, m int, n_codes int, n_cells int, dim int, "
        "n_assign int, rotated boolean",
        _sub(path, "config"),
    )


def _load_ivfpq_meta(spark: SparkSession, path: str):
    """(cfg row, centroids list, codebooks nested list,
    rotation-or-None) from a persisted IVF-PQ index -- KB-scale driver
    pulls.  Pre-round-13 indexes have no ``rotated`` config field;
    they load with ``rotation=None`` (back-compat)."""
    cfg = _read_small(spark, _sub(path, "config"))[0]
    if cfg["kind"] != "ivfpq":
        raise ValueError(f"index at {path} is {cfg['kind']!r}, not ivfpq")
    cent_rows = sorted(
        _read_small(spark, _sub(path, "centroids")), key=lambda r: r["cell"]
    )
    centroids = [(int(r["cell"]), list(r["cv"])) for r in cent_rows]
    cb_rows = _read_small(spark, _sub(path, "codebooks"))
    codebooks: list[list[list[float]]] = [
        [None] * int(cfg["n_codes"]) for _ in range(int(cfg["m"]))
    ]
    for r in cb_rows:
        codebooks[int(r["subspace"])][int(r["code"])] = list(r["cv"])
    rotation = None
    if cfg.get("rotated"):
        rot_rows = _read_small(spark, _sub(path, "rotation"))
        dim = int(cfg["dim"])
        rotation = [[0.0] * dim for _ in range(dim)]
        for r in rot_rows:
            rotation[int(r["i"])] = list(r["r"])
    return cfg, centroids, codebooks, rotation


def query_ivfpq_index(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 8,
    rerank: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    allowed: DataFrame | None = None,
    match_col: str | None = None,
    attrs: DataFrame | None = None,
    negate: bool = False,
) -> DataFrame:
    """Probe a persisted IVF-PQ index: per query, LUTs for its
    ``n_probe`` best cells (each cell gets its own table -- the
    query's residual differs per cell), a (cell, subspace, code)-keyed
    ADC join that touches only probed cells' codes, and an exact-L2
    re-rank of the ``rerank`` shortlist against the stored vectors.
    Stream segments union in; tombstoned ids vanish from codes and
    re-rank vectors alike.  Result-identical to
    ``similarity.ivfpq_topk`` at identical quantizers/budgets
    (asserted in pytest).

    ``allowed`` (optional, 1 column named ``id_col``): metadata-filtered
    search -- the codes scan is LEFT SEMI joined on the allow-list
    BEFORE the ADC join, so both the shortlist and the final k satisfy
    the filter and the ADC/re-rank cost shrinks with selectivity
    (family contract: ``similarity.filtered_ivf_topk``; keep the
    ``rerank`` budget sized to the FILTERED shortlist).

    ``match_col`` + ``attrs`` (+ ``negate``): the per-query attribute
    constraint from an (``id_col``, ``match_col``) metadata side
    table -- the ``query_ivf_index`` contract, family-wide; applied
    to the ADC-scored candidates BEFORE the shortlist cut, so all k
    results satisfy it."""
    from .similarity import _dbl, _pq_query_dists_udf, _rotate_expr

    _check_match_args(match_col, attrs, negate)
    cfg, centroids, codebooks, rotation = _load_ivfpq_meta(spark, path)
    n_codes = int(cfg["n_codes"])
    probe_cells = _top_cells_udf(centroids, n_probe)
    qdists_udf = _pq_query_dists_udf(codebooks)
    residual = F.zip_with(
        F.col(vec_col), F.col("cv"), lambda x, y: _dbl(x) - _dbl(y)
    )
    if rotation is not None:
        # OPQ-rotated index: query residuals rotate by the persisted
        # coding rotation before the LUTs -- same fold as the build's
        # encode, so ADC distances match the ad-hoc rotated query.
        residual = _rotate_expr(residual, rotation)
    probes = (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col),
            F.explode(probe_cells(F.col(vec_col))).alias("cell"),
        )
        .join(_centroid_df(spark, centroids), "cell")
        .select("query_id", "cell", residual.alias("q_rv"))
    )
    qd = probes.select(
        "query_id",
        "cell",
        F.posexplode(qdists_udf(F.col("q_rv"))).alias("flat_idx", "d2"),
    ).select(
        "query_id",
        "cell",
        (F.col("flat_idx") / n_codes).cast("int").alias("subspace"),
        (F.col("flat_idx") % n_codes).alias("code"),
        "d2",
    )
    codes_src = _read_with_segments(spark, path, "codes")
    if allowed is not None:
        codes_src = codes_src.join(
            allowed.select(F.col(id_col).alias("id")), "id", "left_semi"
        )
    codes = codes_src.select(
        F.col("id").alias("neighbor_id"),
        "cell",
        F.posexplode(F.col("codes")).alias("subspace", "code"),
    )
    per_cell = (
        codes.join(F.broadcast(qd), ["cell", "subspace", "code"])
        .where(F.col("neighbor_id") != F.col("query_id"))
        .groupBy("query_id", "neighbor_id", "cell")
        .agg(F.sum("d2").alias("cell_dist"))
    )
    # min over cells (identity under single assignment): each cell's
    # sum is a complete distance estimate under that cell's residual.
    scored = per_cell.groupBy("query_id", "neighbor_id").agg(
        F.min("cell_dist").alias("adc_dist")
    )
    if match_col is not None:
        q_attrs = queries.select(
            F.col(id_col).alias("query_id"), F.col(match_col).alias("q_attr")
        )
        scored = _apply_match_filter(
            scored.join(F.broadcast(q_attrs), "query_id"),
            attrs, id_col, match_col, negate, nb_col="neighbor_id",
        )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("adc_dist"), F.asc("neighbor_id")
    )
    shortlist = (
        scored.withColumn("adc_rank", F.row_number().over(w))
        .where(F.col("adc_rank") <= rerank)
        .select("query_id", "neighbor_id")
    )
    qv = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("query_vec")
    )
    nv = _read_with_segments(spark, path, "vectors").select(
        F.col("id").alias("neighbor_id"), "vec"
    )
    l2 = F.aggregate(
        F.zip_with(
            F.col("query_vec"),
            F.col("vec"),
            lambda x, y: (_dbl(x) - _dbl(y)) * (_dbl(x) - _dbl(y)),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.asc("l2_dist"), F.asc("neighbor_id")
    )
    return (
        shortlist.join(F.broadcast(qv), "query_id")
        .join(nv, "neighbor_id")
        .select("query_id", "neighbor_id", l2.alias("l2_dist"))
        .withColumn("rank", F.row_number().over(w2).cast("long"))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("l2_dist", 6).alias("l2_dist"),
            "rank",
        )
    )


def _load_pq_meta(spark: SparkSession, path: str):
    """(cfg row, codebooks nested list, rotation-or-None) from a
    persisted PQ index -- KB-scale driver pulls, the
    sketch-to-closure pattern."""
    cfg = _read_small(spark, _sub(path, "config"))[0]
    if cfg["kind"] != "pq":
        raise ValueError(f"index at {path} is {cfg['kind']!r}, not pq")
    cb_rows = _read_small(spark, _sub(path, "codebooks"))
    codebooks: list[list[list[float]]] = [
        [None] * int(cfg["n_codes"]) for _ in range(int(cfg["m"]))
    ]
    for r in cb_rows:
        codebooks[int(r["subspace"])][int(r["code"])] = list(r["cv"])
    rotation = None
    if cfg.get("rotated"):
        import numpy as np

        rot_rows = _read_small(spark, _sub(path, "rotation"))
        dim = int(cfg["dim"])
        R = np.zeros((dim, dim), dtype="float64")
        mu = np.zeros(dim, dtype="float64")
        for r in rot_rows:
            R[int(r["i"])] = list(r["r"])
            mu[int(r["i"])] = float(r["mu"])
        rotation = (mu, R)
    return cfg, codebooks, rotation


def append_pq_index(
    vectors: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Incrementally encode new vectors against the PERSISTED codebooks
    (and rotation, if OPQ) -- quantizer state never drifts between
    build and append, exactly the ``append_ivf_index`` contract.  New
    ids must be disjoint from those already indexed.  Codebook retrain
    means re-encoding everything: that is a rebuild by definition, so
    no optimize job exists for this family (codes cannot skew -- every
    vector holds exactly m of them)."""
    from .similarity import _apply_projection, _pq_codes_udf

    spark = vectors.sparkSession
    cfg, codebooks, rotation = _load_pq_meta(spark, path)
    # Cast to the PERSISTED element type: appending array<double> rows
    # into an array<float> vectors table would leave mixed parquet
    # schemas that fail at read time.
    stored_t = spark.read.parquet(_sub(path, "vectors")).schema["vec"].dataType
    src = vectors.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast(stored_t).alias("vec")
    )
    enc_src = src
    if rotation is not None:
        mu, R = rotation
        enc_src = _apply_projection(
            src, mu, R, id_col="id", vec_col="vec"
        ).localCheckpoint(eager=True)
    codes_udf = _pq_codes_udf(codebooks)
    enc_src.select("id", codes_udf(F.col("vec")).alias("codes")).write.mode(
        "append"
    ).parquet(_sub(path, "codes"))
    src.write.mode("append").parquet(_sub(path, "vectors"))


def query_pq_index(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int = 10,
    rerank: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    allowed: DataFrame | None = None,
    match_col: str | None = None,
    attrs: DataFrame | None = None,
    negate: bool = False,
) -> DataFrame:
    """Probe a persisted PQ index with asymmetric distances: per-query
    lookup tables broadcast against the stored packed codes
    (posexploded to the (subspace, code)-keyed join of
    ``similarity.pq_adc_topk``), optional exact re-rank against the
    raw vector table.  Result-identical to the ad-hoc operator with
    the same codebooks/rotation (asserted in pytest), so the
    catalog's persisted row reuses the ad-hoc oracle unchanged.

    ``allowed`` (optional, 1 column named ``id_col``): metadata-filtered
    search -- the codes scan is LEFT SEMI joined on the allow-list
    BEFORE the ADC join (family contract:
    ``similarity.filtered_ivf_topk``).

    ``match_col`` + ``attrs`` (+ ``negate``): the per-query attribute
    constraint from an (``id_col``, ``match_col``) metadata side
    table -- the ``query_ivf_index`` contract, family-wide.  Applied
    to the ADC-scored candidate table (one row per (query, neighbor))
    BEFORE the shortlist cut and re-rank, so all k results satisfy
    the constraint and the attrs join is candidate-sized."""
    from pyspark.sql.window import Window as W

    from .similarity import _apply_projection, _dbl, _pq_query_dists_udf

    _check_match_args(match_col, attrs, negate)
    cfg, codebooks, rotation = _load_pq_meta(spark, path)
    n_codes = int(cfg["n_codes"])
    q = queries.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    enc_q = q
    if rotation is not None:
        mu, R = rotation
        enc_q = _apply_projection(q, mu, R, id_col="id", vec_col="vec")
    qdists_udf = _pq_query_dists_udf(codebooks)
    qd = enc_q.select(
        F.col("id").alias("query_id"),
        F.posexplode(qdists_udf(F.col("vec"))).alias("flat_idx", "d2"),
    ).select(
        "query_id",
        (F.col("flat_idx") / n_codes).cast("int").alias("subspace"),
        (F.col("flat_idx") % n_codes).alias("code"),
        "d2",
    )
    codes_src = _read_with_segments(spark, path, "codes")
    if allowed is not None:
        codes_src = codes_src.join(
            allowed.select(F.col(id_col).alias("id")), "id", "left_semi"
        )
    codes = codes_src.select(
        F.col("id").alias("neighbor_id"),
        F.posexplode(F.col("codes")).alias("subspace", "code"),
    )
    scored = (
        codes.join(F.broadcast(qd), ["subspace", "code"])
        .where(F.col("neighbor_id") != F.col("query_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("d2").alias("adc_dist"))
    )
    if match_col is not None:
        q_attrs = queries.select(
            F.col(id_col).alias("query_id"), F.col(match_col).alias("q_attr")
        )
        scored = _apply_match_filter(
            scored.join(F.broadcast(q_attrs), "query_id"),
            attrs, id_col, match_col, negate, nb_col="neighbor_id",
        )
    w = W.partitionBy("query_id").orderBy(F.asc("adc_dist"), F.asc("neighbor_id"))
    if rerank is None:
        return (
            scored.withColumn("rank", F.row_number().over(w).cast("long"))
            .where(F.col("rank") <= k)
            .select(
                "query_id",
                "neighbor_id",
                F.round("adc_dist", 6).alias("adc_dist"),
                "rank",
            )
        )
    shortlist = (
        scored.withColumn("adc_rank", F.row_number().over(w))
        .where(F.col("adc_rank") <= rerank)
        .select("query_id", "neighbor_id")
    )
    # Exact re-rank in the RAW space (rotation preserves L2, and the
    # stored vector table is unrotated by contract).
    qv = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("query_vec")
    )
    nv = _read_with_segments(spark, path, "vectors").select(
        F.col("id").alias("neighbor_id"), "vec"
    )
    l2 = F.aggregate(
        F.zip_with(
            F.col("query_vec"),
            F.col("vec"),
            lambda x, y: (_dbl(x) - _dbl(y)) * (_dbl(x) - _dbl(y)),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    exact = (
        shortlist.join(F.broadcast(qv), "query_id")
        .join(nv, "neighbor_id")
        .select("query_id", "neighbor_id", l2.alias("l2_dist"))
    )
    w2 = W.partitionBy("query_id").orderBy(F.asc("l2_dist"), F.asc("neighbor_id"))
    return (
        exact.withColumn("rank", F.row_number().over(w2).cast("long"))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("l2_dist", 6).alias("l2_dist"),
            "rank",
        )
    )


def delete_from_index(
    ids: DataFrame, path: str, id_col: str = "vec_id"
) -> None:
    """Tombstone deletes for the persisted ANN family (lsh / ivf /
    pq) -- the takedown/right-to-be-forgotten path a 100 TB serving
    index needs: APPEND the ids to ``tombstones/`` and every probe
    excludes them immediately (the ``_read_with_segments`` anti-join
    covers postings, codes, re-rank vectors, and stream segments in
    one hook), without rewriting a single data file.  The bytes
    remain on disk until ``apply_deletes`` -- logical-then-physical,
    the standard two-phase deletion contract (Delta/Iceberg delete
    vectors follow the same shape).

    Scale shape: the tombstone table is deletion-sized, the probe-side
    anti-join shuffles nothing extra (broadcast while small, hash join
    when takedowns grow huge), and repeated deletes of the same id are
    harmless (anti-join semantics are idempotent)."""
    ids.select(F.col(id_col).cast("long").alias("id")).write.mode(
        "append"
    ).parquet(_sub(path, "tombstones"))


def apply_deletes(
    spark: SparkSession, path: str, retire_tombstones: bool = False
) -> None:
    """Physically rewrite an index minus its tombstones -- run on the
    OPTIMIZE cadence, after takedown volume makes the probe-side
    anti-join worth retiring.  Each main table rewrites via the
    read-then-swap contract (localCheckpoint materializes before the
    overwrite); each stream-segment tree folds to a filtered
    ``batch=-1`` (so a batch id replayed AFTER the rewrite would
    resurrect nothing into the COMPACTED tree -- its directory
    overwrite lands beside it exactly as after
    ``optimize_stream_segments``).  Single-writer, stream stopped --
    the family contract.

    The tombstone table is KEPT by default (rewritten compacted, one
    distinct file): a stopped-but-not-checkpointed ingest stream can
    replay an in-flight batch that CONTAINED deleted ids, and if the
    tombstones were dropped with the rewrite those ids would
    resurrect unmasked -- fatal for a right-to-be-forgotten path.
    Retained tombstones keep replayed rows invisible to every probe
    and the next ``apply_deletes`` scrubs them physically; the cost is
    an anti-join against total takedown history (deletion-sized, tiny
    vs the corpus).  Pass ``retire_tombstones=True`` only when the
    caller ASSERTS no replay is possible (streams stopped after a
    clean checkpoint commit, or batch-only index)."""
    import shutil

    tomb_dir = _sub(path, "tombstones")
    if not os.path.exists(tomb_dir):
        return
    tombs = (
        spark.read.parquet(tomb_dir)
        .select("id")
        .distinct()
        .localCheckpoint(eager=True)
    )
    for name in ("entries", "vectors", "codes"):
        d = _sub(path, name)
        if os.path.exists(d):
            kept = (
                spark.read.parquet(d)
                .join(tombs, "id", "left_anti")
                .localCheckpoint(eager=True)
            )
            kept.write.mode("overwrite").parquet(d)
        seg_dir = _sub(path, f"{name}_stream")
        if os.path.exists(seg_dir):
            kept = (
                spark.read.option("basePath", seg_dir)
                .parquet(seg_dir)
                .drop("batch")
                .distinct()  # replayed-batch duplicates fold to one row
                .join(tombs, "id", "left_anti")
                .localCheckpoint(eager=True)
            )
            tmp = seg_dir.rstrip("/") + "__next"
            kept.coalesce(1).write.mode("overwrite").parquet(
                os.path.join(tmp, "batch=-1")
            )
            shutil.rmtree(seg_dir)
            os.rename(tmp, seg_dir)
    if retire_tombstones:
        shutil.rmtree(tomb_dir)
    else:
        tombs.coalesce(1).write.mode("overwrite").parquet(tomb_dir)
