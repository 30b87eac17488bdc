"""Unit tests for the SemDeDup gram kernel (s06) — the one similarity
operator whose core is a vectorized applyInPandas kernel rather than a
pure relational plan.  End-to-end parity with DuckDB is covered by the
driver gate (s01 suite); this pins the kernel against a brute-force
pairwise reference on hand-built clusters."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pdf_ocr_spark.queries.similarity import _S06_THETA, _semdedup_gram


def _brute(ids, vecs, theta):
    """Reference: for each b, lowest-id a<b with cosine >= theta."""
    out = {}
    for j, b in enumerate(ids):
        for i, a in sorted(enumerate(ids), key=lambda t: t[1]):
            if a >= b:
                continue
            va, vb = np.asarray(vecs[i]), np.asarray(vecs[j])
            cos = float(
                va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb))
            )
            if cos >= theta:
                out[b] = (a, cos)
                break
    return out


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_semdedup_gram_matches_bruteforce(seed):
    rng = np.random.default_rng(seed)
    n, d = 40, 8
    V = rng.normal(size=(n, d))
    # plant twins: 5 perturbed copies of earlier rows
    for k in range(5):
        V[n - 1 - k] = V[k * 3] + 0.001
    ids = rng.permutation(n * 7)[:n]  # unsorted, sparse ids
    pdf = pd.DataFrame(
        {"vec_id": ids, "cluster": 3, "v": [list(r) for r in V]}
    )
    got = _semdedup_gram(_S06_THETA)(pdf)
    exp = _brute(list(ids), list(V), _S06_THETA)
    assert set(got["vec_id"]) == set(exp)
    for _i, r in got.iterrows():
        a, cos = exp[r["vec_id"]]
        assert r["dup_of"] == a
        assert abs(r["cosine"] - cos) < 1e-12
        assert r["cluster"] == 3


def test_semdedup_gram_degenerate_clusters():
    k = _semdedup_gram(0.95)
    empty = k(pd.DataFrame({"vec_id": [], "cluster": [], "v": []}))
    assert len(empty) == 0
    one = k(pd.DataFrame({"vec_id": [5], "cluster": [1], "v": [[1.0, 0.0]]}))
    assert len(one) == 0
    # orthogonal vectors: no pairs
    ortho = k(
        pd.DataFrame(
            {
                "vec_id": [1, 2],
                "cluster": [1, 1],
                "v": [[1.0, 0.0], [0.0, 1.0]],
            }
        )
    )
    assert len(ortho) == 0
    assert list(ortho.columns) == ["vec_id", "cluster", "dup_of", "cosine"]
