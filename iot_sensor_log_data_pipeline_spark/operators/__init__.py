"""Engine operators that are NOT one-line compositions of built-ins.

Design stance (SURVEY.md §7): the relational surface -- joins, windows,
aggregations, scalar functions -- IS the stock DataFrame API, declared
directly in ``plans/`` so Catalyst sees the whole plan; wrapping those
in pass-through helpers would only hide pushdown opportunities.  This
package holds the operators Spark genuinely lacks:

- :mod:`.asof`        -- as-of (nearest-prior-event) join.
- :mod:`.compaction`  -- the reference's small-file compaction job.
- :mod:`.dedup`       -- exact / MinHash-LSH / SimHash / n-gram dedup.
- :mod:`.similarity`  -- embedding cosine top-k (brute force + LSH).
- :mod:`.text`        -- language-ID, quality scoring, token counts,
                         fingerprinting.
- :mod:`.multimodal`  -- binary-column decode/feature plumbing (stubbed
                         codecs, real Spark plumbing).
"""
