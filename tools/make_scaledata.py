"""Deterministic scale-up corpora for the sf1 measurement pass
(round-13 verdict item 4: the geometry derivations -- ``ivf_geometry``,
``ivfpq_geometry``, SemDeDup cell caps -- were clamp-tested in pytest
but never MEASURED above sf0.1).

Generates, under ``/root/repo/scaledata/``:

- ``sf1/``: ``documents.parquet`` (50k rows) + ``embeddings.parquet``
  (20k rows) -- 10x the sf0.1 row counts, matching the driver corpus's
  measured shape (31-word analytics vocabulary, 10-100 tokens/doc,
  lang/source mixture, 64-dim unit-norm near-isotropic vectors,
  labels 0-9) so family costs scale like the real tables would.  Only
  the document/embedding tables are generated: the five most expensive
  bench families are all text/similarity/dedup (no TPC-H semantics to
  reproduce), and that restriction is stated in SCALE.md.
- ``vec200k/``: ``embeddings.parquet`` (200k rows) -- 100x sf0.1, which
  pushes ``ivf_geometry`` across a power-of-two cell boundary
  (4*sqrt(200k) ~ 1789 -> 2048 cells) so the derived plan is priced,
  not extrapolated.
- ``vec200k_aniso/``: ``embeddings.parquet`` (200k rows) -- the
  round-14 OPQ scale corpus: correlated ANISOTROPIC vectors (100:1
  geometric spectrum under a fixed random rotation, the
  ``test_ivfpq_opq_rotation_beats_raw_at_shallow_rerank`` fixture
  shape at 64 dims).  The isotropic ``vec200k`` corpus cannot show an
  OPQ win by construction (every rotation of white noise is white
  noise), so the composition's at-scale recall point needs this one.

Everything is seeded (numpy ``default_rng``); re-running overwrites
with identical bytes-equivalent content.  NOT driver testdata -- the
oracle gate keeps running on /root/testdata; these corpora exist only
for the SCALE.md measurement pass.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "scaledata")

VOCAB = (
    "key agg row scan slow fast table value part hash merge batch sort "
    "join window filter group order query column vector line data stream "
    "small big customer the a spark index"
).split()
assert len(VOCAB) == 31
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.41, 0.14, 0.15, 0.15, 0.15]
SOURCES = [f"src{i}" for i in range(20)]


def make_documents(n: int, seed: int = 42) -> pa.Table:
    rng = np.random.default_rng(seed)
    n_toks = rng.integers(10, 101, size=n)
    langs = rng.choice(len(LANGS), size=n, p=LANG_P)
    sources = rng.integers(0, len(SOURCES), size=n)
    texts = []
    for i in range(n):
        toks = rng.choice(VOCAB, size=n_toks[i])
        texts.append(" ".join(toks))
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype="int64")),
            "text": pa.array(texts),
            "lang": pa.array([LANGS[j] for j in langs]),
            "source": pa.array([SOURCES[j] for j in sources]),
            "n_chars": pa.array(
                np.array([len(t) for t in texts], dtype="int64")
            ),
        }
    )


def make_embeddings(n: int, seed: int = 43, dim: int = 64) -> pa.Table:
    rng = np.random.default_rng(seed)
    M = rng.standard_normal((n, dim)).astype("float32")
    M /= np.linalg.norm(M, axis=1, keepdims=True)
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype="int64")),
            "embedding": pa.array(list(M), type=pa.list_(pa.float32())),
            "label": pa.array(
                rng.integers(0, 10, size=n).astype("int32")
            ),
        }
    )


def make_embeddings_anisotropic(
    n: int, seed: int = 53, dim: int = 64
) -> pa.Table:
    """Correlated anisotropic embeddings: a 100:1 geometric variance
    spectrum rotated by a seeded orthogonal matrix -- per-axis
    variances are deliberately NOT aligned to the m=8 subspace grid,
    which is exactly the imbalance OPQ's eigenvalue-allocation
    rotation corrects (Ge et al. 2013 §4).  Deliberately NOT
    unit-normalized, matching the pytest win-regime fixture
    (``test_ivfpq_opq_rotation_beats_raw_at_shallow_rerank``): the
    first cut of this corpus normalized onto the sphere, which packed
    200k points so densely that 10-NN margins fell below the 8x64
    ADC's resolution and BOTH raw and rotated recall collapsed to
    noise at every rerank budget -- an honest density effect, but one
    that hides the rotation delta this corpus exists to measure.
    Ground truth for it is L2 (the ivfpq_topk metric)."""
    rng = np.random.default_rng(seed)
    Q, _ = np.linalg.qr(rng.standard_normal((dim, dim)))
    M = (
        rng.standard_normal((n, dim))
        @ np.diag(np.geomspace(10.0, 0.1, dim))
        @ Q.T
    ).astype("float32")
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype="int64")),
            "embedding": pa.array(list(M), type=pa.list_(pa.float32())),
            "label": pa.array(rng.integers(0, 10, size=n).astype("int32")),
        }
    )


def make_events(n: int, seed: int = 61) -> pa.Table:
    """10x-shape events table (round-15: the cusum / ks-drift / events
    families were never measured above sf0.1).  Matches the driver
    corpus's measured shape: 30 days of timestamps, ~67 events/user,
    5 event types, per-user value level + noise (so per-user stats are
    non-degenerate), small JSON props."""
    rng = np.random.default_rng(seed)
    n_users = max(n // 67, 1)
    user = rng.integers(0, n_users, size=n).astype("int64")
    base = rng.standard_normal(n_users) * 10.0
    value = base[user] + rng.standard_normal(n) * 2.0
    ts_us = np.sort(
        rng.integers(0, 30 * 24 * 3600 * 1_000_000, size=n, dtype="int64")
    ) + 1_704_067_200_000_000  # 2024-01-01 UTC
    etypes = np.array(["signup", "click", "view", "purchase", "error"])
    et = etypes[rng.integers(0, 5, size=n)]
    props = [f'{{"k":{int(v)}}}' for v in rng.integers(0, 100, size=n)]
    return pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype="int64")),
            "ts": pa.array(ts_us, type=pa.timestamp("us")),
            "user_id": pa.array(user),
            "event_type": pa.array(et),
            "value": pa.array(value.astype("float64")),
            "props": pa.array(props),
        }
    )


def main() -> None:
    sf1 = os.path.join(ROOT, "sf1")
    os.makedirs(sf1, exist_ok=True)
    pq.write_table(make_documents(50_000), os.path.join(sf1, "documents.parquet"))
    pq.write_table(make_embeddings(20_000), os.path.join(sf1, "embeddings.parquet"))
    pq.write_table(make_events(1_000_000), os.path.join(sf1, "events.parquet"))
    v200 = os.path.join(ROOT, "vec200k")
    os.makedirs(v200, exist_ok=True)
    pq.write_table(
        make_embeddings(200_000, seed=47), os.path.join(v200, "embeddings.parquet")
    )
    v200a = os.path.join(ROOT, "vec200k_aniso")
    os.makedirs(v200a, exist_ok=True)
    pq.write_table(
        make_embeddings_anisotropic(200_000),
        os.path.join(v200a, "embeddings.parquet"),
    )
    print("scaledata written under", ROOT)


if __name__ == "__main__":
    main()
