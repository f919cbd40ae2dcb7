"""ANN / dedup bench at bucketing scale (round-2 VERDICT item 2).

The corpus tables top out at 2k vectors / 5k docs, where LSH vs brute
force is a wash; this bench synthesizes deterministic cluster-structured
vectors (100k) and boilerplate-laced documents (50k) with Catalyst-only
generators (data/synth.py) and measures, head to head:

* exact cosine top-k (brute force) vs LSH top-k vs IVF top-k —
  wall time, recall@k against brute force, and candidate counts vs the
  |Q|x|C| cross-join a brute-force scan implies;
* exact n-gram-Jaccard near-dup (DF-capped inverted index — the exact
  twin) vs MinHash-LSH candidates + Jaccard verify — wall time,
  candidate-pair counts vs n(n-1)/2, and found-pair parity against the
  planted ground truth (every 20th doc is a near-dup of its
  predecessor).

Standalone: ``python tools/ann_bench.py`` writes ANN_BENCH.json.
bench.py imports :func:`run` so the numbers land in BENCH_r{N}.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(spark, n_vec: int = 100_000, n_docs: int = 50_000, k: int = 10) -> dict:
    from pyspark.sql import functions as F

    from etl_pipeline_rdf_star_spark.data.synth import (
        synth_embeddings,
        synth_near_dup_docs,
    )
    from etl_pipeline_rdf_star_spark.functions.dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
    )
    from etl_pipeline_rdf_star_spark.functions.similarity import (
        brute_force_topk,
        ivf_topk,
        lsh_candidate_pairs,
        lsh_topk,
    )

    out: dict = {"n_vectors": n_vec, "n_docs": n_docs, "k": k}

    # -- vectors -----------------------------------------------------------
    # enough queries that the one-time index cost (LSH signatures / IVF
    # centroid assignment over the corpus) amortizes — the ANN serving
    # shape; at a handful of queries brute force trivially wins and the
    # comparison says nothing
    n_queries = 600
    emb = synth_embeddings(spark, n_vec + n_queries).persist()
    emb.count()
    queries = emb.where(F.col("vec_id") < n_queries)
    corpus = emb.where(F.col("vec_id") >= n_queries)

    def timed(fn):
        t0 = time.perf_counter()
        rows = fn().collect()
        return round(time.perf_counter() - t0, 2), {
            (r["query_id"], r["neighbor_id"]) for r in rows
        }

    t_brute, brute = timed(lambda: brute_force_topk(queries, corpus, k=k))
    LSH = dict(n_tables=8, n_planes=14)
    t_lsh, lsh = timed(lambda: lsh_topk(queries, corpus, k=k, **LSH))
    IVF = dict(n_centroids=256, n_probe=16, corpus_size=n_vec)
    t_ivf, ivf = timed(lambda: ivf_topk(queries, corpus, k=k, **IVF))

    # candidate-count diagnostics (separate jobs, not in the timings)
    lsh_cand = lsh_candidate_pairs(
        queries, corpus, n_tables=LSH["n_tables"], n_planes=LSH["n_planes"]
    ).count()
    exact_pairs_scanned = n_queries * n_vec
    out["vectors"] = {
        "brute_force_sec": t_brute,
        "lsh_sec": t_lsh,
        "ivf_sec": t_ivf,
        "lsh_recall_at_k": round(len(lsh & brute) / len(brute), 4),
        "ivf_recall_at_k": round(len(ivf & brute) / len(brute), 4),
        "pairs_scanned_exact": exact_pairs_scanned,
        "lsh_candidate_pairs": lsh_cand,
        "lsh_candidate_fraction": round(lsh_cand / exact_pairs_scanned, 5),
        "lsh_params": LSH,
        "ivf_params": IVF,
    }
    emb.unpersist()

    # -- documents ---------------------------------------------------------
    docs = synth_near_dup_docs(spark, n_docs, boilerplate_pct=40).persist()
    docs.count()
    planted = n_docs // 20

    # the TRUE exact twin: uncapped all-shingle inverted-index self-join —
    # on a boilerplate-laced corpus the hot shingles make it quadratic
    t0 = time.perf_counter()
    exact_full = ngram_jaccard_pairs(docs, k=3, threshold=0.8)
    n_exact_full = exact_full.count()
    t_exact_full = round(time.perf_counter() - t0, 2)

    # the engine's scale-safe exact variant: DF-capped inverted index
    # (hot shingles dropped; recall held by rare shingles)
    t0 = time.perf_counter()
    exact = ngram_jaccard_pairs(docs, k=3, threshold=0.8, max_doc_freq=50)
    n_exact = exact.count()
    t_exact = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    cand = minhash_lsh_pairs(docs, bands=6, rows_per_band=2).persist()
    n_cand = cand.count()
    verified = ngram_jaccard_pairs(docs, k=3, threshold=0.8, candidates=cand)
    n_lsh = verified.count()
    t_lsh_doc = round(time.perf_counter() - t0, 2)
    cand.unpersist()
    docs.unpersist()

    all_pairs = n_docs * (n_docs - 1) // 2
    out["docs"] = {
        "planted_near_dup_pairs": planted,
        "exact_uncapped_sec": t_exact_full,
        "exact_uncapped_pairs_found": n_exact_full,
        "exact_capped_sec": t_exact,
        "exact_capped_pairs_found": n_exact,
        "lsh_verify_sec": t_lsh_doc,
        "lsh_candidate_pairs": n_cand,
        "lsh_pairs_found": n_lsh,
        "all_pairs_n2": all_pairs,
        "lsh_candidate_fraction": round(n_cand / all_pairs, 8),
        "lsh_params": {"bands": 6, "rows_per_band": 2},
        "boilerplate_pct": 40,
    }
    return out


def main() -> None:
    from etl_pipeline_rdf_star_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("ann-bench", cores=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    report = run(spark)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "ANN_BENCH.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
