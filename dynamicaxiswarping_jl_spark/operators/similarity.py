"""Similarity search over embedding columns (ARRAY<FLOAT>).

- ``cosine_topk``: brute-force exact cosine top-k — the dot product is a
  JVM-side ``aggregate(zip_with(...))`` expression (whole-stage codegen,
  no Python), queries broadcast, top-k via window row_number. The exact
  baseline every ANN variant is verified against.
- ``lsh_cosine_topk``: random-hyperplane LSH scale path — sign-bit
  signatures bucket the vectors; candidates are reranked exactly within
  buckets. Recall < 1 by construction; the knob is (n_planes, n_tables).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .topk import topk_per_key

__all__ = ["cosine_topk", "lsh_cosine_topk"]


def _dot(a: str, b: str):
    return F.expr(f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (acc, v) -> acc + v)")


def _norm(a: str):
    return F.sqrt(F.expr(
        f"aggregate({a}, 0D, (acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE))"))


def cosine_topk(embeddings: DataFrame, queries: DataFrame, k: int = 5,
                id_col: str = "vec_id", vec_col: str = "embedding",
                qid_col: str = "query_id", qvec_col: str = "q") -> DataFrame:
    """Exact cosine top-k of each query against all embeddings.

    Returns (query_id, vec_id, sim, rk). Self-matches (same id) are kept —
    filter upstream if queries come from the corpus.
    """
    joined = embeddings.select(id_col, vec_col).crossJoin(
        F.broadcast(queries.select(qid_col, qvec_col)))
    sim = (_dot(vec_col, qvec_col) /
           (_norm(vec_col) * _norm(qvec_col))).alias("sim")
    scored = joined.select(qid_col, id_col, sim)
    return topk_per_key(scored, qid_col, "sim", k, ascending=False)


def lsh_cosine_topk(embeddings: DataFrame, queries: DataFrame, k: int = 5,
                    n_planes: int = 12, n_tables: int = 4, dim: int = None,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    qid_col: str = "query_id", qvec_col: str = "q",
                    seed: int = 42) -> DataFrame:
    """Approximate cosine top-k: sign-LSH bucket join + exact rerank.

    Scale path: candidates per query ≈ corpus / 2^n_planes per table, so
    the crossJoin disappears; exactness traded for recall (union over
    n_tables recovers most of it).
    """
    if dim is None:
        dim = len(embeddings.select(vec_col).first()[0])
    rng = np.random.default_rng(seed)
    planes = rng.normal(size=(n_tables, n_planes, dim)).astype(np.float64)

    def signer(colname, outname, id_type):
        sig_schema = T.StructType([
            T.StructField("_id", id_type),
            T.StructField("table", T.IntegerType()),
            T.StructField(outname, T.LongType()),
        ])

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                V = np.stack([np.asarray(v, dtype=np.float64)
                              for v in pdf[colname]])
                ids = pdf["_id"].to_numpy()
                outs = []
                for t in range(n_tables):
                    proj = V @ planes[t].T > 0  # (n, n_planes)
                    sig = (proj * (1 << np.arange(n_planes))).sum(axis=1)
                    outs.append(pd.DataFrame({
                        "_id": ids, "table": t, outname: sig.astype(np.int64)}))
                yield pd.concat(outs, ignore_index=True)

        return run, sig_schema

    emb = embeddings.select(F.col(id_col).alias("_id"), vec_col)
    qs = queries.select(F.col(qid_col).alias("_id"), qvec_col)
    run_e, sch = signer(vec_col, "sig", emb.schema["_id"].dataType)
    e_sig = emb.mapInPandas(run_e, sch)
    run_q, schq = signer(qvec_col, "sig", qs.schema["_id"].dataType)
    q_sig = qs.mapInPandas(run_q, schq)

    cands = (q_sig.select(F.col("_id").alias(qid_col), "table", "sig")
             .join(e_sig.select(F.col("_id").alias(id_col), "table", "sig"),
                   ["table", "sig"])
             .select(qid_col, id_col).distinct())
    joined = (cands
              .join(embeddings.select(id_col, vec_col), id_col)
              .join(F.broadcast(queries.select(qid_col, qvec_col)), qid_col))
    sim = (_dot(vec_col, qvec_col) /
           (_norm(vec_col) * _norm(qvec_col))).alias("sim")
    scored = joined.select(qid_col, id_col, sim)
    return topk_per_key(scored, qid_col, "sim", k, ascending=False)
