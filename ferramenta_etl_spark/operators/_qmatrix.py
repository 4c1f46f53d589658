"""Shared bounded-query-side collection for the numpy scorers
(pq_topk / ivfpq_topk / cosine_topk_arrow): the query matrix is the
SMALL side by contract, collected once to the driver and shipped in
the task closure, behind one loud size guard so the guard text and
vector-usability rules cannot drift between scorers."""

from __future__ import annotations

from pyspark.sql import DataFrame


def collect_query_matrix(
    queries: DataFrame,
    query_id_col: str,
    query_vec_col: str,
    max_queries: int,
    param_name: str = "max_queries",
):
    """(qids, qmat, qn): ids, float64 matrix, and norms of the usable
    (finite, nonzero-norm) query vectors."""
    import numpy as np

    # fetch is capped at max_queries+1 rows so the guard fires BEFORE an
    # oversized "small by contract" side can materialize on the driver —
    # the sentinel row is the only excess ever transferred
    qrows = (
        queries.select(query_id_col, query_vec_col)
        .limit(max_queries + 1)
        .collect()
    )
    if len(qrows) > max_queries:
        # each query costs driver + closure memory linear in Q (ADC: an
        # (m x codes) float LUT per query — 10^5 queries at m=16/
        # codes=256 is ~3 GB). Loud guard, same philosophy as minhash's
        # max_block_size.
        raise ValueError(
            f"query side exceeds {param_name}={max_queries} (fetch capped "
            f"at {max_queries + 1} rows — the actual count may be far "
            "larger): batch the query side (the closure grows linearly "
            f"with it), or raise {param_name} deliberately"
        )
    if not qrows:
        return np.array([]), np.empty((0, 0)), np.array([])
    qmat = np.array([list(r[1]) for r in qrows], dtype=np.float64)
    qids = np.array([r[0] for r in qrows])
    usable = np.isfinite(qmat).all(axis=1) & ((qmat * qmat).sum(axis=1) > 0)
    qmat, qids = qmat[usable], qids[usable]
    return qids, qmat, np.sqrt((qmat * qmat).sum(axis=1))
