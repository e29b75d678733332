"""Embedding-matrix decompositions: streaming covariance and PCA.

PCA over a 100 TB embedding corpus factors into two very different
scales: the dim×dim covariance (64×64 here — KB-sized) and the corpus
itself. The split below keeps each on the right side of the cluster:

- ``covariance_stats``: one Arrow-batched pass emits per-batch partials
  (count, Σx, XᵀX) as flat arrays; a posexplode + groupBy(pos) reduces
  them to dim²+dim+1 cells — shuffle volume is partials × (dim²+dim+1)
  doubles, NEVER corpus-sized, and no dim²-per-row explode ever exists.
- ``pca_fit``: eigendecomposition of the tiny covariance on the driver
  (numpy ``eigh`` — a 64×64 symmetric eig is microseconds); components
  get a deterministic sign convention so refits on identical data are
  bit-stable.
- ``pca_project``: map-only projection; the k component vectors embed as
  plan literals for small k (whole-stage codegen) and switch to a numpy
  GEMM ``mapInPandas`` above ``LITERAL_PROJECT_MAX_K`` — the same
  dual-path shape as `similarity.assign_nearest_cluster`.

Reference capability: embedding post-processing for the curation stack
(whitening before cosine dedup, dimensionality reduction before ANN) —
an operator family the reference delegates to offline Python tooling.
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import dot, to_double

LITERAL_PROJECT_MAX_K = 16


def covariance_stats(df: DataFrame, vec_col: str):
    """(n, mean, population covariance) of an ``array<float|double>``
    column as numpy arrays. One corpus pass; see module docstring for the
    partial-aggregate shape."""
    import numpy as np

    from ..session import ensure_package_on_executors

    ensure_package_on_executors(df.sparkSession)

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            flat = np.concatenate(([float(len(m))], m.sum(axis=0),
                                   (m.T @ m).ravel()))
            yield pd.DataFrame({"p": [flat.tolist()]})

    summed = (df.select(vec_col).mapInPandas(partial, "p array<double>")
              .select(F.posexplode("p").alias("pos", "x"))
              .groupBy("pos").agg(F.sum("x").alias("s"))
              .collect())
    cells = np.zeros(len(summed))
    for r in summed:
        cells[r["pos"]] = r["s"]
    # len = 1 + dim + dim²  ⇒  dim = (sqrt(4·len − 3) − 1) / 2
    dim = int((np.sqrt(4 * len(cells) - 3) - 1) // 2)
    n = int(cells[0])
    s = cells[1:dim + 1]
    xtx = cells[dim + 1:].reshape(dim, dim)
    mean = s / n
    cov = xtx / n - np.outer(mean, mean)
    return n, mean, cov


@dataclass
class PCAModel:
    """Fitted PCA: row i of ``components`` is the i-th principal axis."""
    mean: "object"            # np.ndarray (dim,)
    components: "object"      # np.ndarray (k, dim), variance-ordered
    explained_var: "object"   # np.ndarray (k,) eigenvalues, descending
    all_eigvals: "object"     # np.ndarray (dim,) full spectrum, descending
    n_samples: int


def pca_fit(df: DataFrame, vec_col: str, k: int) -> PCAModel:
    """Fit PCA from one covariance pass. Deterministic: ``eigh`` on the
    same covariance bytes gives the same factors, and each component is
    sign-normalized so its largest-|coordinate| entry is positive."""
    import numpy as np

    n, mean, cov = covariance_stats(df, vec_col)
    evals, evecs = np.linalg.eigh(cov)        # ascending
    order = np.argsort(evals)[::-1]
    evals_desc = evals[order]
    comps = evecs[:, order[:k]].T.copy()      # (k, dim)
    for row in comps:
        if row[np.argmax(np.abs(row))] < 0:
            row *= -1.0
    return PCAModel(mean=mean, components=comps,
                    explained_var=evals_desc[:k],
                    all_eigvals=evals_desc, n_samples=n)


def pca_project(df: DataFrame, id_col: str, vec_col: str,
                model: PCAModel, whiten: bool = False,
                literal_k_max: int | None = None) -> DataFrame:
    """(id, pc array<double>) — centered projection onto the fitted
    components; ``whiten`` scales each score by 1/√eigenvalue so every
    output dimension has unit variance. Map-only at any corpus size."""
    import numpy as np

    k = len(model.components)
    scale = (1.0 / np.sqrt(np.maximum(model.explained_var, 1e-30))
             if whiten else np.ones(k))
    if literal_k_max is None:
        literal_k_max = LITERAL_PROJECT_MAX_K
    if k <= literal_k_max:
        v = to_double(F.col(vec_col))
        # (v − mean)·c = v·c − mean·c: the mean dot is a plan-time scalar
        pcs = [((dot(v, F.array(*[F.lit(float(x)) for x in comp]))
                 - F.lit(float(np.dot(model.mean, comp)))) * F.lit(float(sc)))
               for comp, sc in zip(model.components, scale)]
        return df.select(F.col(id_col).alias("id"), F.array(*pcs).alias("pc"))

    from ..session import ensure_package_on_executors

    ensure_package_on_executors(df.sparkSession)
    ct = (model.components * scale[:, None]).T      # (dim, k)
    offs = (model.mean @ model.components.T) * scale  # (k,)

    def project(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                yield pd.DataFrame({"id": [], "pc": []})
                continue
            m = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            sc = m @ ct - offs
            yield pd.DataFrame({"id": pdf[id_col],
                                "pc": list(sc)})

    return (df.select(id_col, vec_col)
            .mapInPandas(project, "id long, pc array<double>"))
