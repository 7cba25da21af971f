#!/usr/bin/env python
"""ANN recall curves on NON-separable data (VERDICT r2 item 7).

The pytest recall assertions use separable synthetic clusters; this
bench measures recall@10 vs exact cosine on a realistic hard mixture:
overlapping Gaussian clusters whose within-cluster std matches the
between-centroid spread (no clean cell structure), plus a heavy-tailed
scale perturbation — the regime where IVF probes and PQ codes actually
lose neighbors.

Sweeps n_probe (IVF, IVF-PQ) and rerank (PQ) and prints one JSON line
per setting: {"variant", "param", "recall_at_10", "sec"}.

Usage: python tools/bench_ann_recall.py [--n 100000] [--dim 64]
           [--queries 20] [--cpus 16]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_vectors(n: int, dim: int, n_clusters: int = 20,
                 seed: int = 7) -> np.ndarray:
    """Non-separable mixture: centroids ~N(0,1), within-cluster std
    1.0 (same scale → heavy overlap), plus lognormal radial scaling
    (heavy tail). float32 like a real embedding table."""
    rng = np.random.default_rng(seed)
    cents = rng.normal(0.0, 1.0, size=(n_clusters, dim))
    assign = rng.integers(0, n_clusters, size=n)
    x = cents[assign] + rng.normal(0.0, 1.0, size=(n, dim))
    x *= rng.lognormal(0.0, 0.4, size=(n, 1))
    return x.astype(np.float32)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--queries", type=int, default=20)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "16"))
    args = ap.parse_args()

    import pandas as pd

    from engine.pipeline import similarity as sim
    from engine.session import get_spark

    spark = get_spark(app="ann-recall", master=f"local[{args.cpus}]",
                      shuffle_partitions=int(args.cpus))
    spark.sparkContext.setLogLevel("ERROR")

    x = make_vectors(args.n, args.dim)
    pdf = pd.DataFrame({"vec_id": np.arange(args.n, dtype=np.int64),
                        "embedding": list(x)})
    emb = spark.createDataFrame(pdf).repartition(int(args.cpus)).persist()
    emb.count()
    qids = [int(i) for i in
            np.linspace(0, args.n - 1, args.queries, dtype=np.int64)]

    def topset(df, score_col_desc=True):
        rows = df.collect()
        out: dict[int, set] = {}
        for r in rows:
            out.setdefault(int(r["qid"]), set()).add(int(r["vec_id"]))
        return out

    t = time.time()
    exact_cos = topset(sim.cosine_topk(emb, qids, args.k))
    exact_sec = time.time() - t
    print(json.dumps({"variant": "exact", "param": None,
                      "recall_at_10": 1.0,
                      "sec": round(exact_sec, 1)}), flush=True)

    # ground truth per metric: IVF/LSH variants rank by COSINE, the
    # PQ family ranks by L2 — measuring a PQ run against cosine truth
    # would conflate quantization loss with the metric difference.
    # Exact L2 neighbors via numpy (driver-side, trivial at bench n).
    xd = x.astype(np.float64)
    exact_l2: dict[int, set] = {}
    for q in qids:
        d = ((xd - xd[q]) ** 2).sum(axis=1)
        d[q] = np.inf                       # engine excludes self
        exact_l2[q] = set(np.argsort(d, kind="stable")[:args.k].tolist())

    def recall(approx: dict[int, set],
               exact: dict[int, set]) -> float:
        vals = [len(approx.get(q, set()) & exact[q]) / len(exact[q])
                for q in exact]
        return round(float(np.mean(vals)), 4)

    results = []

    n_cent = sim.derive_n_centroids(args.n)
    for n_probe in (1, 4, 8, 16, 32):
        t = time.time()
        ap_ = topset(sim.cosine_topk_ivf(emb, qids, args.k,
                                         n_centroids=n_cent,
                                         n_probe=n_probe))
        row = {"variant": f"ivf(c={n_cent})", "param": f"n_probe={n_probe}",
               "recall_at_10": recall(ap_, exact_cos), "sec": round(time.time() - t, 1)}
        results.append(row)
        print(json.dumps(row), flush=True)

    t = time.time()
    ap_ = topset(sim.cosine_topk_multiprobe(emb, qids, args.k))
    row = {"variant": "multiprobe-lsh(derived bits)", "param": "H<=1",
           "recall_at_10": recall(ap_, exact_cos), "sec": round(time.time() - t, 1)}
    results.append(row)
    print(json.dumps(row), flush=True)

    for rerank in (20, 60, 100):
        t = time.time()
        ap_ = topset(sim.pq_topk(emb, qids, args.k, m=16, n_centroids=16,
                                 rerank=rerank))
        row = {"variant": "pq(m=16,K=16)", "param": f"rerank={rerank}",
               "recall_at_10": recall(ap_, exact_l2), "sec": round(time.time() - t, 1)}
        results.append(row)
        print(json.dumps(row), flush=True)

    for n_probe in (4, 8, 16):
        t = time.time()
        ap_ = topset(sim.ivfpq_topk(emb, qids, args.k, n_ivf=n_cent,
                                    n_probe=n_probe, m=16, n_centroids=16,
                                    rerank=100))
        row = {"variant": f"ivfpq(c={n_cent},m=16)",
               "param": f"n_probe={n_probe},rerank=100",
               "recall_at_10": recall(ap_, exact_l2), "sec": round(time.time() - t, 1)}
        results.append(row)
        print(json.dumps(row), flush=True)

    print("RESULT " + json.dumps({"n": args.n, "dim": args.dim,
                                  "queries": args.queries,
                                  "exact_sec": round(exact_sec, 1),
                                  "rows": results}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
