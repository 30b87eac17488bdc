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


def test_s07_int8_quantize_reference(spark, tmp_path):
    """Codes match the per-dim affine reference; reconstruction error
    is bounded by half a quantization step."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_ocr_spark.queries.similarity import QUERIES

    rng = np.random.RandomState(7)
    vecs = rng.uniform(-1, 1, size=(20, 4)).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(20), pa.int64()),
            "embedding": pa.array(
                [list(map(float, v)) for v in vecs],
                pa.list_(pa.float32()),
            ),
            "label": pa.array([0] * 20, pa.int32()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    rows = {
        r["vec_id"]: r
        for r in QUERIES["s07_int8_quantize"](spark, str(tmp_path)).collect()
    }
    v64 = vecs.astype(np.float64)
    mn, mx = v64.min(axis=0), v64.max(axis=0)
    sc = (mx - mn) / 255.0
    for i in range(20):
        # HALF_UP like Spark/DuckDB round (np.round is half-to-even);
        # the ratio is >= 0 so floor(x + 0.5) is away-from-zero
        q = np.floor((v64[i] - mn) / sc + 0.5).astype(int) - 128
        assert list(rows[i]["q"]) == list(q), (i, rows[i]["q"], q)
        assert all(-128 <= c <= 127 for c in rows[i]["q"])
        err = np.abs(v64[i] - (mn + (q + 128) * sc)).max()
        assert abs(rows[i]["max_err"] - round(err, 9)) < 1e-12
        assert rows[i]["max_err"] <= sc.max() / 2 + 1e-12


def test_s08_kmeans_matches_lloyd_reference(spark, tmp_path):
    """Two unrolled Lloyd iterations match a NumPy reference: init =
    first k vectors, squared-L2 argmin with ties to the lower cid,
    exact elementwise means between iterations."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_ocr_spark.queries.similarity import _S08_K, QUERIES

    rng = np.random.RandomState(11)
    n, d = 60, 6
    vecs = rng.uniform(-1, 1, size=(n, d)).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(
                [list(map(float, v)) for v in vecs],
                pa.list_(pa.float32()),
            ),
            "label": pa.array([0] * n, pa.int32()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    out = {
        r["vec_id"]: r
        for r in QUERIES["s08_kmeans"](spark, str(tmp_path)).collect()
    }

    V = vecs.astype(np.float64)

    def assign(C):
        # argmin over squared L2; np.argmin keeps the first (lowest
        # cid) on exact ties, matching the strictly-less fold
        D = ((V[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        return D.argmin(axis=1), D.min(axis=1)

    C0 = V[:_S08_K].copy()
    a1, _ = assign(C0)
    C1 = np.stack(
        [V[a1 == c].mean(axis=0) for c in sorted(set(a1))]
    )
    cids = sorted(set(a1))
    a2, d2 = assign(C1)
    assert len(out) == n
    for i in range(n):
        assert out[i]["cluster_it1"] == a1[i], i
        assert out[i]["cluster"] == cids[a2[i]], i
        assert abs(out[i]["dist2"] - d2[i]) < 1e-5, i


def test_s09_recall_matches_numpy_reference(spark, tmp_path):
    """s09: two-phase exact top-k ground truth + bucket candidate/hit
    counts match a NumPy brute-force reference (including recall)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_ocr_spark.queries.similarity import (
        _S09_K,
        _S09_NQ,
        DIM,
        HYPERPLANES,
        N_PLANES,
        QUERIES,
    )

    rng = np.random.RandomState(23)
    n, d = 80, DIM
    vecs = rng.uniform(-1, 1, size=(n, d)).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(
                [list(map(float, v)) for v in vecs],
                pa.list_(pa.float32()),
            ),
            "label": pa.array([0] * n, pa.int32()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))

    V = vecs.astype(np.float64)
    planes = np.array(HYPERPLANES, dtype=np.float64)
    buckets = ((V @ planes.T >= 0) * (1 << np.arange(N_PLANES))).sum(axis=1)

    def cosine(a, b):
        return (a @ b) / (np.linalg.norm(a) * np.linalg.norm(b))

    rows = {
        r["qid"]: r
        for r in QUERIES["s09_ann_recall"](spark, str(tmp_path)).collect()
    }
    assert len(rows) == _S09_NQ
    for qid in range(_S09_NQ):
        cos = np.array(
            [cosine(V[i], V[qid]) if i != qid else -2.0 for i in range(n)]
        )
        order = sorted(
            (i for i in range(n) if i != qid),
            key=lambda i: (-cos[i], i),
        )
        gt = set(order[:_S09_K])
        cand = {
            i for i in range(n) if i != qid and buckets[i] == buckets[qid]
        }
        r = rows[qid]
        assert r["n_cand"] == len(cand), qid
        assert r["n_hit"] == len(gt & cand), qid
        assert abs(r["recall"] - len(gt & cand) / _S09_K) < 1e-12


def test_s10_pq_matches_numpy_reference(spark, tmp_path):
    """s10: per-subspace codes, reconstruction error, and ADC distance
    match a NumPy PQ reference (codebook = first k vectors' subvectors,
    ties to the lower codeword id)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_ocr_spark.queries.similarity import (
        _PQ_K,
        _PQ_M,
        _PQ_SUB,
        DIM,
        QUERIES,
    )

    rng = np.random.RandomState(31)
    n = 50
    vecs = rng.uniform(-1, 1, size=(n, DIM)).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(
                [list(map(float, v)) for v in vecs],
                pa.list_(pa.float32()),
            ),
            "label": pa.array([0] * n, pa.int32()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))

    V = vecs.astype(np.float64)
    rows = {
        r["vec_id"]: r
        for r in QUERIES["s10_product_quantize"](
            spark, str(tmp_path)
        ).collect()
    }
    assert len(rows) == n
    q = V[0]
    for i in range(n):
        recon, adc = 0.0, 0.0
        for m in range(_PQ_M):
            lo, hi = m * _PQ_SUB, (m + 1) * _PQ_SUB
            sub = V[i, lo:hi]
            cents = V[:_PQ_K, lo:hi]
            d = ((cents - sub) ** 2).sum(axis=1)
            cid = int(d.argmin())  # first minimum = lowest cid
            assert rows[i][f"code{m}"] == cid, (i, m)
            recon += d[cid]
            adc += ((q[lo:hi] - cents[cid]) ** 2).sum()
        assert abs(rows[i]["recon"] - round(recon, 6)) < 1e-9, i
        assert abs(rows[i]["adc"] - round(adc, 6)) < 1e-9, i
    # every vector below k encodes itself exactly in every subspace
    for i in range(_PQ_K):
        assert rows[i]["recon"] == 0.0
        assert [rows[i][f"code{m}"] for m in range(_PQ_M)] == [i] * _PQ_M


def test_s11_ivfpq_matches_numpy_reference(spark, tmp_path):
    """s11: the routed cell and the ADC top-5 ranking match a NumPy
    IVF-PQ reference (centroid = per-label mean, codebook = first k
    vectors' subvectors, argmin ties to the lower codeword id)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_ocr_spark.queries.similarity import (
        _PQ_K,
        _PQ_M,
        _PQ_SUB,
        DIM,
        QUERIES,
    )

    rng = np.random.RandomState(47)
    n, n_labels = 60, 3
    vecs = rng.uniform(-1, 1, size=(n, DIM)).astype(np.float32)
    labels = [i % n_labels for i in range(n)]
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(
                [list(map(float, v)) for v in vecs],
                pa.list_(pa.float32()),
            ),
            "label": pa.array(labels, pa.int32()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))

    V = vecs.astype(np.float64)
    q = V[0]
    # route: nearest per-label centroid by cosine, ties to lower label
    best_label, best_sim = None, -2.0
    for lb in range(n_labels):
        c = V[[i for i in range(n) if labels[i] == lb]].mean(axis=0)
        sim = c @ q / (np.linalg.norm(c) * np.linalg.norm(q))
        if sim > best_sim:
            best_label, best_sim = lb, sim
    # ADC over the routed cell
    adc = {}
    for i in range(1, n):
        if labels[i] != best_label:
            continue
        s = 0.0
        for m in range(_PQ_M):
            lo, hi = m * _PQ_SUB, (m + 1) * _PQ_SUB
            d = ((V[i, lo:hi] - V[:_PQ_K, lo:hi]) ** 2).sum(axis=1)
            cid = int(np.argmin(d))  # np.argmin ties -> lowest index
            s += float(((q[lo:hi] - V[cid, lo:hi]) ** 2).sum())
        adc[i] = s
    want = sorted(adc, key=lambda i: (adc[i], i))[:5]

    rows = QUERIES["s11_ivfpq_search"](spark, str(tmp_path)).collect()
    assert [r["vec_id"] for r in sorted(rows, key=lambda r: r["rk"])] == want
    assert all(r["label"] == best_label for r in rows)
    got = {r["vec_id"]: r["adc"] for r in rows}
    for i in want:
        assert abs(got[i] - adc[i]) < 1e-5, i


def test_s12_hybrid_rrf_matches_python_reference(spark, tmp_path):
    """s12: on a constructed corpus with unambiguous per-arm rankings,
    the fused top-10 (ranks, -1 sentinels for single-arm docs, integer
    RRF) matches a pure-Python reference; docs retrieved by only one
    arm still fuse."""
    import numpy as np
    import pandas as pd

    n = 14
    # lexical arm: doc i repeats 'spark' (a t16 query term) n-i times,
    # padded to equal length -> bm25 strictly decreasing in i; docs
    # 10+ contain no query term (not retrieved lexically)
    texts = []
    for i in range(n):
        hits = max(0, 10 - i)
        texts.append(" ".join(["spark"] * hits + ["pad"] * (20 - hits)))
    pd.DataFrame(
        {"doc_id": range(n), "lang": ["en"] * n, "text": texts}
    ).to_parquet(str(tmp_path / "documents.parquet"))

    # vector arm: only even doc ids have embeddings (partial coverage);
    # cosine to vec 0 strictly decreasing in id via well-separated
    # angles in 2D (padded to 4 dims)
    ids = [i for i in range(n) if i % 2 == 0]
    angs = np.linspace(0.0, 1.2, len(ids))
    emb = [
        np.array([np.cos(a), np.sin(a), 0.0, 0.0], dtype=np.float32)
        for a in angs
    ]
    pd.DataFrame(
        {
            "vec_id": ids,
            "embedding": [list(map(float, v)) for v in emb],
            "label": [0] * len(ids),
        }
    ).to_parquet(str(tmp_path / "embeddings.parquet"))

    # --- pure-Python reference ---------------------------------------
    lex_rank = {i: i for i in range(1, 10)}  # doc 0 excluded, 9 hits
    vec_rank = {
        i: r + 1 for r, i in enumerate(ids[1:])  # vec 0 excluded
    }
    fused = {}
    for d in set(lex_rank) | set(vec_rank):
        s = 0
        for rk in (lex_rank.get(d), vec_rank.get(d)):
            if rk is not None:
                # HALF_UP like both engines (not Python's half-to-even)
                s += int(1000000.0 / (60 + rk) + 0.5)
        fused[d] = s
    top = sorted(fused.items(), key=lambda kv: (-kv[1], kv[0]))[:10]

    from pdf_ocr_spark.queries.similarity import QUERIES

    rows = QUERIES["s12_hybrid_rrf"](spark, str(tmp_path)).collect()
    assert [(r["doc_id"], r["rrf_micro"]) for r in rows] == top
    for r in rows:
        assert r["lex_rank"] == lex_rank.get(r["doc_id"], -1)
        assert r["vec_rank"] == vec_rank.get(r["doc_id"], -1)
    # both single-arm shapes actually occur in the fused top-10
    assert any(r["lex_rank"] == -1 for r in rows)
    assert any(r["vec_rank"] == -1 for r in rows)


def test_s13_kcenter_matches_greedy_reference(spark, tmp_path):
    """s13: the unrolled farthest-point rounds match a pure-Python
    greedy k-center with the identical integer chain, and on a
    3-cluster fixture the first selections cover all clusters (the
    diversity property k-center exists for)."""
    import math

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_ocr_spark.queries.similarity import _S13_M, QUERIES

    rng = np.random.RandomState(7)
    # three tight, well-separated clusters around distant anchors
    anchors = np.array(
        [[0.0] * 6, [10.0] * 6, [-10.0, 10.0] * 3], dtype=np.float64
    )
    n_per = 12
    vecs = np.concatenate(
        [
            a + rng.uniform(-0.2, 0.2, size=(n_per, 6))
            for a in anchors
        ]
    ).astype(np.float32)
    n = len(vecs)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(
                [list(map(float, v)) for v in vecs],
                pa.list_(pa.float32()),
            ),
            "label": pa.array([i // n_per for i in range(n)], pa.int32()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))

    # pure-Python reference: identical fold order + integer chain
    V = [[float(x) for x in v] for v in vecs.astype(np.float64)]

    def dmic(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + (x - y) * (x - y)
        return round(acc * 1000000)

    dmin = [dmic(v, V[0]) for v in V]
    sel_round = [0] + [-1] * (n - 1)
    for i in range(1, _S13_M + 1):
        key = [
            (dmin[j] if sel_round[j] == -1 else -1, -j)
            for j in range(n)
        ]
        sid = -max(key)[1]
        sel_round[sid] = i
        dmin = [
            min(dmin[j], dmic(V[j], V[sid])) for j in range(n)
        ]
    radius = max(dmin)

    out = {
        r["vec_id"]: r
        for r in QUERIES["s13_kcenter_coreset"](
            spark, str(tmp_path)
        ).collect()
    }
    assert len(out) == n
    for j in range(n):
        assert out[j]["sel_round"] == sel_round[j], j
        assert out[j]["dmin_micro"] == dmin[j], j
        assert out[j]["radius_micro"] == radius, j
    # diversity: the seed + first two selections hit all 3 clusters
    first3 = sorted(
        j for j in range(n) if 0 <= sel_round[j] <= 2
    )
    assert {j // n_per for j in first3} == {0, 1, 2}
    # coverage radius is cluster-diameter scale, not anchor scale
    assert radius < dmic(list(anchors[0]), list(anchors[1]))
    assert math.isfinite(radius)


def test_s14_mrl_matches_numpy_reference(spark, tmp_path):
    """s14: the prefix-dim shortlist and the full-dim re-ranked top-10
    match a NumPy two-stage reference, including a vector that ranks
    high on the prefix but falls out on the full re-rank."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_ocr_spark.queries.similarity import (
        _S14_PREFIX,
        _S14_SHORTLIST,
        DIM,
        QUERIES,
    )

    rng = np.random.RandomState(41)
    n, d, p = 120, DIM, _S14_PREFIX
    vecs = rng.uniform(-1, 1, size=(n, d)).astype(np.float32)
    # vec 1: prefix aligned with the query, tail anti-aligned -> must
    # enter the shortlist on coarse but sink on the full re-rank.
    vecs[1, :p] = vecs[0, :p]
    vecs[1, p:] = -vecs[0, p:]
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(
                [list(map(float, v)) for v in vecs],
                pa.list_(pa.float32()),
            ),
            "label": pa.array([0] * n, pa.int32()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))

    V = vecs.astype(np.float64)
    q = V[0]

    def cos(a, b):
        return (a @ b) / (np.linalg.norm(a) * np.linalg.norm(b))

    coarse = {i: cos(V[i, :p], q[:p]) for i in range(1, n)}
    short = sorted(coarse, key=lambda i: (-coarse[i], i))[:_S14_SHORTLIST]
    full = {i: cos(V[i], q) for i in short}
    top10 = sorted(full, key=lambda i: (-full[i], i))[:10]

    rows = QUERIES["s14_mrl_rerank"](spark, str(tmp_path)).collect()
    assert [r["vec_id"] for r in sorted(
        rows, key=lambda r: (-r["cosine"], r["vec_id"])
    )] == top10
    for r in rows:
        assert abs(r["coarse"] - coarse[r["vec_id"]]) < 1e-9
        assert abs(r["cosine"] - full[r["vec_id"]]) < 1e-9
    assert 1 in short and 1 not in top10


def test_s15_maxsim_matches_hashlib_reference(spark, tmp_path):
    """s15: per-query-token maxima and the MaxSim sum match a pure
    hashlib reference, including the 32-token cap and dedup."""
    import hashlib
    import re

    import pandas as pd

    from pdf_ocr_spark.queries.similarity import (
        _S15_DIM,
        _S15_DOC_TOKS,
        _S15_QUERY,
        _s15_qvec,
        QUERIES,
    )

    texts = [
        "table scan merge stream table table filter join",
        "completely unrelated words here nothing shared at all",
        " ".join(f"tok{i}" for i in range(50)) + " table",  # cap cuts 'table'
    ]
    pd.DataFrame(
        {"doc_id": range(3), "lang": ["en"] * 3, "text": texts}
    ).to_parquet(str(tmp_path / "documents.parquet"))

    def vec(tok):
        h = hashlib.md5(tok.encode()).hexdigest()
        return [int(h[d], 16) - 7 for d in range(_S15_DIM)]

    rows = {
        r["doc_id"]: r
        for r in QUERIES["s15_colbert_maxsim"](
            spark, str(tmp_path)
        ).collect()
    }
    for d, text in enumerate(texts):
        toks = []
        for tk in re.findall(r"[a-z0-9]+", text.lower())[:_S15_DOC_TOKS]:
            if tk not in toks:
                toks.append(tk)
        exp_m = [
            max(
                sum(q * v for q, v in zip(_s15_qvec(qt), vec(tk)))
                for tk in toks
            )
            for qt in _S15_QUERY
        ]
        r = rows[d]
        for i, m in enumerate(exp_m):
            assert r[f"m{i}"] == m, (d, i)
        assert r["maxsim"] == sum(exp_m), d
    # doc 2's late 'table' token must be cut by the 32-token cap
    assert rows[2]["maxsim"] < rows[0]["maxsim"]


def test_s16_margin_matches_numpy_reference(spark):
    """s16: label-blocked candidates, best/second cosines per side,
    and the k=1 margin ratio match a pure-Python reference; both
    accept branches occur."""
    import duckdb

    from pdf_ocr_spark.queries.similarity import QUERIES

    sf = "/root/testdata/sf0.001"
    rows = {
        r["src_id"]: r
        for r in QUERIES["s16_bitext_margin"](spark, sf).collect()
    }
    vecs = {
        int(v): (int(lb), list(map(float, e)))
        for v, e, lb in duckdb.sql(
            f"SELECT vec_id, embedding, label"
            f" FROM '{sf}/embeddings.parquet'"
        ).fetchall()
    }

    def cos(a, b):
        dot = na = nb = 0.0
        for x, y in zip(a, b):
            dot += x * y
        for x in a:
            na += x * x
        for y in b:
            nb += y * y
        return dot / ((na ** 0.5) * (nb ** 0.5))

    by_label = {}
    for vid, (lb, v) in vecs.items():
        by_label.setdefault(lb, {"s": [], "t": []})[
            "s" if vid % 2 == 0 else "t"
        ].append(vid)

    pair_cos = {}
    for lb, sides in by_label.items():
        for s_ in sides["s"]:
            for t_ in sides["t"]:
                pair_cos[(s_, t_)] = cos(vecs[s_][1], vecs[t_][1])

    accepts = set()
    n_src = 0
    for lb, sides in by_label.items():
        for s_ in sides["s"]:
            cands = sorted(
                ((pair_cos[(s_, t_)], t_) for t_ in sides["t"]),
                key=lambda x: (-x[0], x[1]),
            )
            if not cands:
                continue
            n_src += 1
            best_c, best_t = cands[0]
            second_s = cands[1][0] if len(cands) > 1 else best_c
            tcands = sorted(
                ((pair_cos[(s2, best_t)], s2) for s2 in sides["s"]),
                key=lambda x: (-x[0], x[1]),
            )
            second_t = tcands[1][0] if len(tcands) > 1 else tcands[0][0]
            margin = 2 * best_c / (second_s + second_t)
            r = rows[s_]
            assert r["tgt_id"] == best_t, s_
            assert abs(r["cosine"] - best_c) < 1e-12, s_
            assert abs(r["margin"] - margin) < 1e-12, s_
            assert r["accept"] == (margin > 1.05), s_
            accepts.add(r["accept"])
    assert len(rows) == n_src
    assert accepts == {True, False}, "both margin branches must occur"


def test_s17_graph_beam_matches_python_reference(spark):
    """s17: the LSH-banded seed graph, the NN-descent refinement
    round, per-label entry points, and all four beam-search hops
    match a pure-Python replication of the same procedure; the
    EXACT all-pairs kNN graph (the demoted N^2 build) stays here as
    the recall oracle the seeded build is audited against."""
    import duckdb

    from pdf_ocr_spark.queries.similarity import (
        HYPERPLANES,
        QUERIES,
        _S17_BANDS,
        _S17_SEED_G,
    )

    sf = "/root/testdata/sf0.001"
    got = {}
    for r in QUERIES["s17_graph_beam_search"](spark, sf).collect():
        got.setdefault(r["qid"], []).append((r["rank"], r["vec_id"]))
    vecs = {
        int(v): (int(lb), list(map(float, e)))
        for v, e, lb in duckdb.sql(
            f"SELECT vec_id, embedding, label"
            f" FROM '{sf}/embeddings.parquet'"
        ).fetchall()
    }

    def cos(a, b):
        dot = na = nb = 0.0
        for x, y in zip(a, b):
            dot += x * y
        for x in a:
            na += x * x
        for y in b:
            nb += y * y
        return dot / ((na ** 0.5) * (nb ** 0.5))

    def dot_fold(a, b):
        # the engine's sequential left fold (aggregate/zip_with)
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    ids = sorted(vecs)

    def top_g(cand, g):
        return {
            s: [
                o
                for _c, o in sorted(
                    ((-cos(vecs[s][1], vecs[o][1]), o) for o in cand[s])
                )[:g]
            ]
            for s in ids
        }

    # LSH-banded seed: one bucket per (band, signature); candidates =
    # same-bucket peers in any band
    cand = {s: set() for s in ids}
    for lo, hi in _S17_BANDS:
        buckets = {}
        for s in ids:
            sig = sum(
                (1 << (j - lo))
                for j in range(lo, hi)
                if dot_fold(vecs[s][1], HYPERPLANES[j]) >= 0
            )
            buckets.setdefault(sig, []).append(s)
        for members in buckets.values():
            for s in members:
                cand[s].update(o for o in members if o != s)
    seed = top_g(cand, _S17_SEED_G)
    # one NN-descent round: neighbors ∪ reverse-neighbors ∪
    # neighbors-of-neighbors, re-ranked to the final out-degree
    und = {s: set(seed[s]) for s in ids}
    for s in ids:
        for o in seed[s]:
            und[o].add(s)
    refined = {s: set(und[s]) for s in ids}
    for s in ids:
        for mid in und[s]:
            refined[s].update(o for o in und[mid] if o != s)
    graph = top_g(refined, 6)
    by_label = {}
    for vid, (lb, _v) in vecs.items():
        by_label.setdefault(lb, []).append(vid)
    entries = [min(vs) for vs in by_label.values()]
    qids = sorted(v for v in ids if v % 97 == 3)
    assert qids, "query set must be non-empty"
    n_hit = n_tot = 0
    for qid in qids:
        qv = vecs[qid][1]
        beam = list(entries)
        for _hop in range(4):
            cand = set(beam)
            for b in beam:
                cand.update(graph[b])
            scored = sorted(
                ((-cos(vecs[c][1], qv), c) for c in cand)
            )
            beam = [c for _s, c in scored[:8]]
        # engine contract: self-match excluded from the emitted top-5,
        # survivors re-ranked (the query stays in the beam)
        expect = [
            (i + 1, c)
            for i, c in enumerate(
                [c for _s, c in scored if c != qid][:5]
            )
        ]
        assert sorted(got[qid]) == expect, qid
        exact = {
            c
            for _s, c in sorted(
                ((-cos(vecs[c][1], qv), c) for c in ids if c != qid)
            )[:5]
        }
        n_hit += len(exact & {c for _r, c in expect})
        n_tot += 5
    assert set(got) == set(qids)
    # seeded build + self-excluded results: 30/30 measured here (the
    # exact-graph oracle's own score); floor at 0.9 for headroom
    assert n_hit / n_tot >= 0.9, f"recall@5 too low: {n_hit}/{n_tot}"


def test_s18_metrics_match_python_reference(spark):
    """s18: nDCG@5 / MRR / DCG over the s17 ranking match a pure-Python
    recomputation from the collected s17 rows and the exact cosine
    ranking (self-match excluded, like the engine); the sf0.01
    corpus exercises non-perfect rows (the seeded s17 build is 27/30
    there)."""
    import duckdb

    from pdf_ocr_spark.queries.similarity import (
        QUERIES,
        _S18_DISC,
        _S18_GAIN,
        _S18_IDCG,
    )

    sf = "/root/testdata/sf0.01"
    retr = {}
    for r in QUERIES["s17_graph_beam_search"](spark, sf).collect():
        retr.setdefault(r["qid"], []).append((r["rank"], r["vec_id"]))
    got = {
        r["qid"]: (
            r["n_rel_found"], r["dcg_micro"], r["ndcg_ppm"], r["rr_micro"]
        )
        for r in QUERIES["s18_retrieval_metrics"](spark, sf).collect()
    }
    vecs = {
        int(v): list(map(float, e))
        for v, e in duckdb.sql(
            f"SELECT vec_id, embedding FROM '{sf}/embeddings.parquet'"
        ).fetchall()
    }

    def cos(a, b):
        dot = na = nb = 0.0
        for x, y in zip(a, b):
            dot += x * y
        for x in a:
            na += x * x
        for y in b:
            nb += y * y
        return dot / ((na ** 0.5) * (nb ** 0.5))

    ids = sorted(vecs)
    n_imperfect = 0
    for qid, rows in retr.items():
        qv = vecs[qid]
        exact = [
            c
            for _s, c in sorted(
                ((-cos(vecs[c], qv), c) for c in ids if c != qid)
            )[:5]
        ]
        rel_of = {c: 5 - i + 1 for i, c in enumerate(exact, start=1)}
        dcg = n_rel = 0
        first_rel = None
        for rank, vid in sorted(rows):
            rel = rel_of.get(vid, 0)
            if rel > 0:
                n_rel += 1
                if first_rel is None:
                    first_rel = rank
            dcg += _S18_GAIN[rel] * _S18_DISC[rank]
        expect = (
            n_rel,
            dcg,
            1000000 * dcg // _S18_IDCG,
            1000000 // first_rel if first_rel else 0,
        )
        assert got[qid] == expect, qid
        if expect[2] < 1000000:
            n_imperfect += 1
    assert set(got) == set(retr)
    assert n_imperfect >= 1, "corpus must exercise a non-perfect nDCG"


def test_s19_silhouette_matches_python_reference(spark):
    """s19: per-vector silhouette values match a pure-Python
    replication of the decomposed formula (unit vectors, per-cluster
    sums, self-dot subtraction) AND stay within tolerance of the
    naive pairwise-mean definition; both sign branches occur."""
    import math

    import duckdb

    from pdf_ocr_spark.queries.similarity import QUERIES

    sf = "/root/testdata/sf0.001"
    got = {
        r["vec_id"]: (
            r["cluster"], r["nearest_other"], r["sil_micro"]
        )
        for r in QUERIES["s19_silhouette"](spark, sf).collect()
    }
    rows = duckdb.sql(
        f"SELECT vec_id, label, embedding"
        f" FROM '{sf}/embeddings.parquet'"
    ).fetchall()
    lab = {int(v): int(lb) for v, lb, _e in rows}
    vec = {int(v): list(map(float, e)) for v, _lb, e in rows}

    def dot(a, b):
        s = 0.0
        for x, y in zip(a, b):
            s += x * y
        return s

    unit = {
        v: [x / math.sqrt(dot(e, e)) for x in e]
        for v, e in vec.items()
    }
    by_label = {}
    for v in unit:
        by_label.setdefault(lab[v], []).append(v)
    csum = {
        lb: [
            sum(unit[v][i] for v in vs)
            for i in range(len(next(iter(unit.values()))))
        ]
        for lb, vs in by_label.items()
    }
    signs = set()
    for v in unit:
        u = unit[v]
        means = {}
        for lb, vs in by_label.items():
            if lb == lab[v]:
                means[lb] = 1 - (dot(u, csum[lb]) - dot(u, u)) / (
                    len(vs) - 1
                )
            else:
                means[lb] = 1 - dot(u, csum[lb]) / len(vs)
        a_mean = means[lab[v]]
        nb_mean, nb_lab = min(
            (m, lb) for lb, m in means.items() if lb != lab[v]
        )
        sil = math.floor(
            1_000_000 * (nb_mean - a_mean) / max(a_mean, nb_mean)
        )
        gc, gn, gs = got[v]
        assert (gc, gn) == (lab[v], nb_lab), v
        # decomposed reference: python csum uses float sums where the
        # engines use exact DECIMAL partials -> tiny drift allowed
        assert abs(gs - sil) <= 2, (v, gs, sil)
        # naive pairwise definition: same value up to fp regrouping
        pair_a = sum(
            1 - dot(u, unit[o])
            for o in by_label[lab[v]]
            if o != v
        ) / (len(by_label[lab[v]]) - 1)
        assert abs(a_mean - pair_a) < 1e-9
        signs.add(gs > 0)
    assert signs == {True, False}


def test_s20_mips_reduction_theorem(spark):
    """s20: the top-5-by-inner-product set matches a Python brute
    force, and the augmented-cosine rank equals the inner-product
    rank on every emitted row (the norm-augmentation reduction)."""
    import duckdb

    from pdf_ocr_spark.queries.similarity import QUERIES

    sf = "/root/testdata/sf0.001"
    got = {}
    for r in QUERIES["s20_mips_norm_augment"](spark, sf).collect():
        assert r["ranks_agree"], (r["qid"], r["vec_id"])
        assert r["dot_rank"] == r["aug_rank"]
        got.setdefault(r["qid"], []).append(
            (r["dot_rank"], r["vec_id"])
        )
    vecs = {
        int(v): list(map(float, e))
        for v, e in duckdb.sql(
            f"SELECT vec_id, embedding FROM '{sf}/embeddings.parquet'"
        ).fetchall()
    }

    def dot(a, b):
        s = 0.0
        for x, y in zip(a, b):
            s += x * y
        return s

    qids = [v for v in vecs if v % 101 == 7]
    assert set(got) == set(qids)
    for qid in qids:
        order = sorted(
            ((-dot(vecs[o], vecs[qid]), o) for o in vecs if o != qid)
        )[:5]
        expect = [(i + 1, o) for i, (_d, o) in enumerate(order)]
        assert sorted(got[qid]) == expect, qid


def test_s21_jl_projection_matches_python_reference(spark):
    """s21: per-pair estimates match a Python replication against the
    same literal projection matrix, and the MEAN distortion over the
    sample sits near 1.0 (the JL unbiasedness), though single pairs
    vary widely at K=16."""
    import math

    import duckdb

    from pdf_ocr_spark.queries.similarity import _S21_K, QUERIES, S21_PLANES

    sf = "/root/testdata/sf0.001"
    got = {
        (r["id_a"], r["id_b"]): (
            r["orig_d2"], r["est_d2"], r["distortion_milli"]
        )
        for r in QUERIES["s21_jl_projection"](spark, sf).collect()
    }
    vecs = {
        int(v): list(map(float, e))
        for v, e in duckdb.sql(
            f"SELECT vec_id, embedding FROM '{sf}/embeddings.parquet'"
        ).fetchall()
    }

    def dot(a, b):
        s = 0.0
        for x, y in zip(a, b):
            s += x * y
        return s

    n = ratio_sum = 0
    for a in sorted(vecs):
        if a % 10 != 0 or a + 250 not in vecs:
            continue
        dv = [x - y for x, y in zip(vecs[a], vecs[a + 250])]
        orig = dot(dv, dv)
        est = 3.0 / _S21_K * sum(
            dot(dv, S21_PLANES[j]) ** 2 for j in range(_S21_K)
        )
        expect = (orig, est, math.floor(1000 * est / orig))
        assert got[(a, a + 250)] == expect, a
        ratio_sum += est / orig
        n += 1
    assert n == len(got) > 0
    assert 0.7 < ratio_sum / n < 1.3, ratio_sum / n


def test_s22_ari_matches_python_reference(spark):
    """s22: the contingency table and the exact integer ARI match a
    pure-Python pair-counting computation from the collected s08
    assignments and corpus labels."""
    import duckdb

    from pdf_ocr_spark.queries.similarity import QUERIES

    sf = "/root/testdata/sf0.001"
    km = {
        r["vec_id"]: r["cluster"]
        for r in QUERIES["s08_kmeans"](spark, sf).collect()
    }
    lab = {
        int(v): int(lb)
        for v, lb in duckdb.sql(
            f"SELECT vec_id, label FROM '{sf}/embeddings.parquet'"
        ).fetchall()
    }
    got = {
        (r["label"], r["cluster"]): (r["n_ij"], r["ari_micro"])
        for r in QUERIES["s22_cluster_stability"](spark, sf).collect()
    }
    from collections import Counter

    cells = Counter((lab[v], km[v]) for v in lab)
    rows = Counter(lab.values())
    cols = Counter(km.values())

    def c2(x):
        return x * (x - 1) // 2

    a = sum(c2(n) for n in cells.values())
    b = sum(c2(n) for n in rows.values())
    c = sum(c2(n) for n in cols.values())
    n2 = c2(len(lab))
    ari = 1_000_000 * 2 * (a * n2 - b * c) // (
        n2 * (b + c) - 2 * b * c
    )
    assert set(got) == set(cells)
    for k, n in cells.items():
        assert got[k] == (n, ari), k


def test_s23_probe_sweep_matches_python_reference(spark):
    """s23: reachable counts and recall match a Python recomputation
    of cell ranks + exact ranks; the curve is monotone in the probe
    budget for every query."""
    import duckdb

    from pdf_ocr_spark.queries.similarity import QUERIES

    sf = "/root/testdata/sf0.001"
    got = {
        (r["qid"], r["nprobe"]): (
            r["n_reachable"], r["n_hit"], r["recall_ppm"]
        )
        for r in QUERIES["s23_ivf_probe_sweep"](spark, sf).collect()
    }
    rows = duckdb.sql(
        f"SELECT vec_id, label, embedding"
        f" FROM '{sf}/embeddings.parquet'"
    ).fetchall()
    lab = {int(v): int(lb) for v, lb, _e in rows}
    vec = {int(v): list(map(float, e)) for v, _lb, e in rows}

    def cos(a, b):
        dot = na = nb = 0.0
        for x, y in zip(a, b):
            dot += x * y
        for x in a:
            na += x * x
        for y in b:
            nb += y * y
        return dot / ((na ** 0.5) * (nb ** 0.5))

    from collections import defaultdict

    by_label = defaultdict(list)
    for v in vec:
        by_label[lab[v]].append(v)
    dim = len(next(iter(vec.values())))
    cents = {
        lb: [
            sum(vec[v][i] for v in vs) / len(vs) for i in range(dim)
        ]
        for lb, vs in by_label.items()
    }
    qids = [v for v in vec if v % 97 == 3]
    for qid in qids:
        qv = vec[qid]
        cell_rk = {
            lb: i + 1
            for i, (_c, lb) in enumerate(
                sorted((-cos(cents[lb], qv), lb) for lb in cents)
            )
        }
        order = sorted(
            (-cos(vec[o], qv), o) for o in vec if o != qid
        )
        exact5 = {o for _c, o in order[:5]}
        prev_recall = -1
        for p in (1, 2, 3):
            reach = sum(
                1 for o in vec if o != qid and cell_rk[lab[o]] <= p
            )
            hit = sum(1 for o in exact5 if cell_rk[lab[o]] <= p)
            expect = (reach, hit, 1_000_000 * hit // 5)
            assert got[(qid, p)] == expect, (qid, p)
            assert expect[2] >= prev_recall
            prev_recall = expect[2]
