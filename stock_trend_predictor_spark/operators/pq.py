"""Product quantization (PQ) — the memory half of the billion-scale
ANN layout (IVF prunes the probe, PQ compresses the residency).

Jégou, Douze, Schmid, "Product Quantization for Nearest Neighbor
Search" (TPAMI 2011): split the d-dim vector into M subvectors,
k-means each subspace independently (here with the same deterministic
Lloyd used by operators/ivf.py — seeds are the lowest-id rows, only
M x KSUB x d/M floats ever reach the driver), store each vector as M
small codes (M bytes at KSUB=256; M x 4 bits at 16). Search scores a
query against codes via ADC (asymmetric distance computation): one
M x KSUB lookup table of exact query-subvector/centroid dot products
per query, then a table-lookup sum per corpus code — no original
vectors touched.

Spark shapes:
- codebook build: all M subspaces run their deterministic Lloyd
  TOGETHER — one Arrow assign pass + one mean aggregate per round
  (1 + iters actions total; per-iteration driver traffic is the
  M x KSUB x dsub codebook itself — a model, same policy as IVF
  centroids).
- encoding: one Arrow-batched pandas UDF — all M argmin assignments
  are a single (batch, d) x (d, M*KSUB) matmul reshaped, the same
  vectorization argument as the LSH hasher in similarity.py.
- ADC scoring: corpus side streams (neighbor_id, codes) through
  mapInPandas with the (parameter-sized) query lookup tables in the
  closure; only code arrays and scores move. At 100 TB the codes
  table is ~M bytes/vector — the entire point.

ADC search stays approximate by construction -> no SQL oracle for the
top-k queries; recall@10 vs the exact brute force is published per
round in RECALL.json and floor-asserted in tests/test_round4.py,
alongside an exact-replication law against a local numpy PQ. The
ENCODING itself (pq_embedding_codes) carries a full oracle since r9:
the decimal-sum Lloyd makes every codebook value a pure function of
the assignment sets, and DuckDB replays it — see
plans/similarity_queries.py::_pq_codes_oracle_sql for the replay and
:func:`pq_min_assign_margin` for the regime gate that makes code
equality engine-exact (cross-engine decimal-cast noise in the
centroids is ~1e-14 relative; the gate demands every argmin margin
beat it by orders of magnitude).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stock_trend_predictor_spark.operators.similarity import as_double

#: number of subspaces (64-dim embeddings -> 4 dims per subspace).
#: Tuned on the bench corpus (near-random embeddings quantize HARD):
#: m=8/ksub=16 (4 B/vec) gave refine-recall@10 0.537; m=16/ksub=16
#: (8 B/vec, a 32x compression over float32) gives 0.950 with the
#: 200-deep refine shortlist — the published operating point.
PQ_M = 16
#: centroids per subspace (4-bit codes)
PQ_KSUB = 16
PQ_ITERS = 3
#: ADC shortlist depth fed to the exact refine stage
PQ_REFINE_SHORTLIST = 200


def pq_min_assign_margin(vecs: DataFrame, cb_now: "np.ndarray") -> float:
    """Smallest (second-best − best) assignment-distance gap over all
    (row, subspace) pairs for the given codebooks — ONE Arrow pass,
    one double per batch, min-aggregated. The oracle regime gate for
    pq_embedding_codes: cross-engine decimal-cast noise perturbs the
    replayed centroids by ~1e-14 relative, so code-for-code equality
    is engine-exact iff every argmin margin dominates that
    (measured: 3.3e-7 at sf0.001, 2.5e-6 at sf0.01 — a 1e-9 gate
    trips only when the data genuinely leaves the regime).
    ``vecs`` carries one double-array column ``v``."""
    m, ksub, dsub = cb_now.shape
    cnorm2 = (cb_now * cb_now).sum(axis=2)

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf["v"].to_numpy()).astype(np.float64)
            xs = x.reshape(len(x), m, dsub)
            dist = cnorm2[None, :, :] - 2.0 * np.einsum(
                "bmd,mkd->bmk", xs, cb_now
            )
            part = np.partition(dist, 1, axis=2)
            yield pd.DataFrame(
                {"mm": [float((part[:, :, 1] - part[:, :, 0]).min())]}
            )

    row = (
        vecs.mapInPandas(probe, schema="mm double")
        .agg(F.min("mm").alias("mm"))
        .collect()[0]
    )
    return float(row["mm"])


def pq_codebooks(
    corpus: DataFrame,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    iters: int = PQ_ITERS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    margin_probe: list | None = None,
) -> list[list[list[float]]]:
    """M per-subspace codebooks, each ksub x (d/m), via deterministic
    Lloyd (seeds = the ksub lowest-id rows' subvectors, empty clusters
    keep their previous centroid — the same contract as
    operators/ivf.py::kmeans_centroids).

    ALL M subspaces iterate together: per Lloyd round ONE Arrow pass
    assigns every row's M codes (reshaped matmul) and emits
    (subspace, code, dim, value) rows, and ONE aggregate computes all
    M x ksub x d/m centroid means — so the whole build is
    1 + iters actions regardless of M (a per-subspace loop was
    M x iters x 2 actions, ~25 s at sf0.01; this is ~3 s). Driver
    traffic per round: the M x ksub x d/m codebook itself."""
    seeds = (
        corpus.orderBy(id_col)
        .limit(ksub)
        .select(as_double(vec_col).alias("v"))
        .collect()
    )
    sx = np.array([r["v"] for r in seeds], dtype=np.float64)
    d = sx.shape[1]
    if d % m != 0:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    cb = sx.reshape(ksub, m, dsub).transpose(1, 0, 2).copy()  # (m,k,dsub)
    vecs = corpus.select(as_double(vec_col).alias("v"))
    for _ in range(iters):
        cb_now = cb.copy()
        if margin_probe is not None:
            # oracle regime evidence: the min assignment margin under
            # THIS round's codebooks (one extra Arrow pass, gate runs
            # only when the caller asks)
            margin_probe.append(pq_min_assign_margin(vecs, cb_now))
        cnorm2 = (cb_now * cb_now).sum(axis=2)

        def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if not len(pdf):
                    continue
                x = np.stack(pdf["v"].to_numpy()).astype(np.float64)
                b = len(x)
                xs = x.reshape(b, m, dsub)
                dots = np.einsum("bmd,mkd->bmk", xs, cb_now)
                codes = (cnorm2[None, :, :] - 2.0 * dots).argmin(axis=2)
                shape = (b, m, dsub)
                yield pd.DataFrame(
                    {
                        "sub": np.broadcast_to(
                            np.arange(m)[None, :, None], shape
                        ).ravel(),
                        "cid": np.broadcast_to(
                            codes[:, :, None], shape
                        ).ravel(),
                        "pos": np.broadcast_to(
                            np.arange(dsub)[None, None, :], shape
                        ).ravel(),
                        "x": xs.ravel(),
                    }
                )

        # centroid means from DECIMAL sums, not F.avg over doubles:
        # decimal addition is order-independent, so the codebook is
        # bit-identical under any partition/merge schedule — the
        # determinism the docstring contract claims (ADVICE r4). The
        # single rounding to double happens once, in the driver.
        means = (
            vecs.mapInPandas(
                emit, schema="sub int, cid int, pos int, x double"
            )
            .groupBy("sub", "cid", "pos")
            .agg(
                F.sum(F.col("x").cast("decimal(38,18)")).alias("sx"),
                F.count(F.lit(1)).alias("nx"),
            )
            .collect()
        )
        for r in means:
            cb[r["sub"], r["cid"], r["pos"]] = float(r["sx"]) / r["nx"]
    return [[list(map(float, c)) for c in book] for book in cb]


def pq_encode(
    corpus: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, codes array<int>, recon_mse double): nearest-centroid
    code per subspace and the per-row reconstruction MSE. All M
    assignments happen in one Arrow batch as a reshaped matmul
    (||x - c||^2 = ||x||^2 - 2 x.c + ||c||^2, argmin over the last
    two terms per subspace)."""
    m = len(codebooks)
    ksub = len(codebooks[0])
    dsub = len(codebooks[0][0])
    cb = np.asarray(codebooks, dtype=np.float64)  # (m, ksub, dsub)
    cnorm2 = (cb * cb).sum(axis=2)  # (m, ksub)

    @F.pandas_udf("struct<codes: array<int>, recon_mse: double>")
    def encode(v: pd.Series) -> pd.DataFrame:
        if len(v) == 0:
            return pd.DataFrame({"codes": [], "recon_mse": []})
        x = np.stack(v.to_numpy()).astype(np.float64)
        xs = x.reshape(len(x), m, dsub)
        # (batch, m, ksub) dot products via einsum, then argmin of
        # cnorm2 - 2*dot (the ||x||^2 term is constant per argmin)
        dots = np.einsum("bmd,mkd->bmk", xs, cb)
        codes = (cnorm2[None, :, :] - 2.0 * dots).argmin(axis=2)
        recon = cb[np.arange(m)[None, :], codes]  # (batch, m, dsub)
        mse = ((xs - recon) ** 2).mean(axis=(1, 2))
        return pd.DataFrame(
            {
                "codes": list(codes.astype(np.int32)),
                "recon_mse": mse,
            }
        )

    enc = corpus.select(
        F.col(id_col).alias("vec_id"),
        encode(as_double(vec_col)).alias("e"),
    )
    return enc.select("vec_id", "e.codes", "e.recon_mse")


def pq_adc_topk(
    codes: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k by ADC: each query's M x KSUB lookup
    table of exact subvector-centroid dots rides in the task closure
    (parameter-sized, same policy as broadcast centroids); the corpus
    side streams only (neighbor_id, codes). Approximate cosine =
    dot(q, recon(x)) / (|q| * |recon(x)|)."""
    from pyspark.sql.window import Window

    cb = np.asarray(codebooks, dtype=np.float64)  # (m, ksub, dsub)
    m, ksub, dsub = cb.shape
    cnorm2 = (cb * cb).sum(axis=2)  # (m, ksub)
    qrows = queries.select(
        F.col(id_col).alias("query_id"), as_double(vec_col).alias("qv")
    ).collect()  # parameter-sized: the fixed query set
    qids = np.array([r["query_id"] for r in qrows])
    qx = np.stack([np.asarray(r["qv"], dtype=np.float64) for r in qrows])
    qnorm = np.sqrt((qx * qx).sum(axis=1))
    # (nq, m, ksub): exact dot of each query subvector with each centroid
    luts = np.einsum("qmd,mkd->qmk", qx.reshape(len(qx), m, dsub), cb)

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            codes_arr = np.stack(pdf["codes"].to_numpy()).astype(np.int64)
            nid = pdf["vec_id"].to_numpy()
            sub = np.arange(m)[None, :]
            rnorm = np.sqrt(cnorm2[sub, codes_arr].sum(axis=1))
            out = []
            for qi in range(len(qids)):
                dots = luts[qi][sub, codes_arr].sum(axis=1)
                sim = dots / (qnorm[qi] * rnorm)
                keep = nid != qids[qi]
                out.append(
                    pd.DataFrame(
                        {
                            "query_id": qids[qi],
                            "neighbor_id": nid[keep],
                            "sim_adc": sim[keep],
                        }
                    )
                )
            yield pd.concat(out, ignore_index=True)

    scored = codes.select("vec_id", "codes").mapInPandas(
        score, schema="query_id long, neighbor_id long, sim_adc double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim_adc").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def pq_adc_score_pairs(
    cand_codes: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC-score explicit (query_id, neighbor_id, codes) candidate
    rows — the building block for IVF+PQ composition, where the
    candidate set is already cell-pruned per query (unlike
    pq_adc_topk's full-codes scan). One Arrow batch scores all rows:
    the per-query M x KSUB lookup tables ride in the closure
    (parameter-sized) and are gathered per row by query id."""
    cb = np.asarray(codebooks, dtype=np.float64)
    m, ksub, dsub = cb.shape
    cnorm2 = (cb * cb).sum(axis=2)
    qrows = queries.select(
        F.col(id_col).alias("query_id"), as_double(vec_col).alias("qv")
    ).collect()  # parameter-sized fixed query set
    qids = [int(r["query_id"]) for r in qrows]
    qx = np.stack([np.asarray(r["qv"], dtype=np.float64) for r in qrows])
    qnorm = np.sqrt((qx * qx).sum(axis=1))
    luts = np.einsum("qmd,mkd->qmk", qx.reshape(len(qx), m, dsub), cb)
    qindex = {q: i for i, q in enumerate(qids)}

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sub = np.arange(m)[None, :]
        for pdf in batches:
            if not len(pdf):
                continue
            codes_arr = np.stack(pdf["codes"].to_numpy()).astype(np.int64)
            qi = np.array([qindex[q] for q in pdf["query_id"]])
            rnorm = np.sqrt(cnorm2[sub, codes_arr].sum(axis=1))
            dots = luts[qi[:, None], sub, codes_arr].sum(axis=1)
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"].to_numpy(),
                    "neighbor_id": pdf["neighbor_id"].to_numpy(),
                    "sim_adc": dots / (qnorm[qi] * rnorm),
                }
            )

    return cand_codes.select(
        "query_id", "neighbor_id", "codes"
    ).mapInPandas(
        score, schema="query_id long, neighbor_id long, sim_adc double"
    )
