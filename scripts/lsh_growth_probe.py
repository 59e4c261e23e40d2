#!/usr/bin/env python
"""LSH candidate-growth audit (round-11 verdict #2): measure how
candidate-pair volume scales with corpus size for the two LSH families
— MinHash text dedup (t08's shape, operators/dedup.py) and sign-LSH
vector search (v03/v04's shape, operators/similarity.py) — across
banding parameters, and decompose candidates into true pairs
(jaccard ≥ 0.5 on the hashed 3-shingle unit) vs sub-threshold
collisions the S-curve tail lets through.

Corpora: /root/testdata/sf0.01 (500 docs), sf0.1 (5k docs), and the
sf1 synthetic 10×-replica corpus (50k docs — dup-DENSE by design:
replicas 1-9 append ' repN' to each text, so every base doc carries 9
genuine near-identical twins; build with scripts/sf1_smoke.py
--rebuild first). The same corpus transform as the t08 gate
(_docs_with_near_dups — planted +5% near-dups) is applied at every SF.

Prints one JSON document:
  text:   per (sf, n_hashes, bands): candidates, true_pairs (jacc≥.5),
          fp_share, candidate wall sec
  vector: per (sf, n_bands, planes): candidate count, wall sec

Run solo (never concurrently with another Spark session).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TEXT_PARAMS = [(8, 4), (16, 2), (64, 16)]  # (n_hashes, bands) → r = 2 / 8 / 4
VEC_PARAMS = [(4, 8), (4, 16)]  # (n_bands, planes_per_band) → 32 / 64 planes


def main() -> None:
    from pyspark.sql import functions as F

    from stepist_spark.operators import dedup, similarity
    from stepist_spark.queries.llm_text import _docs_with_near_dups
    from stepist_spark.session import get_spark, load_table, warehouse_root

    spark = get_spark(app_name="lsh_growth_probe")
    sf1_dir = os.path.join(warehouse_root(spark), "stepist_scratch", "sf1")
    sfs = [
        ("sf0.01", "/root/testdata/sf0.01"),
        ("sf0.1", "/root/testdata/sf0.1"),
    ]
    if os.path.isdir(os.path.join(sf1_dir, "documents.parquet")):
        sfs.append(("sf1", sf1_dir))

    out: dict = {"loadavg": round(os.getloadavg()[0], 2), "text": [], "vector": []}
    for sf_name, sf_dir in sfs:
        corpus = _docs_with_near_dups(spark, sf_dir)
        n_docs = corpus.count()
        for n_hashes, bands in TEXT_PARAMS:
            t0 = time.perf_counter()
            cands = dedup.minhash_lsh_candidates(
                corpus, "doc_id", "text", n_hashes=n_hashes, bands=bands
            ).localCheckpoint()
            n_cands = cands.count()
            wall = round(time.perf_counter() - t0, 2)
            n_true = dedup.jaccard_pairs(
                corpus, cands, "doc_id", "text", threshold=0.5, shingle_k=3
            ).count()
            out["text"].append(
                {
                    "sf": sf_name,
                    "n_docs": n_docs,
                    "n_hashes": n_hashes,
                    "bands": bands,
                    "r": n_hashes // bands,
                    "candidates": n_cands,
                    "true_pairs": n_true,
                    "fp_share": round(1 - n_true / n_cands, 4) if n_cands else None,
                    "cand_sec": wall,
                }
            )
            print(json.dumps(out["text"][-1]), file=sys.stderr)

        emb = load_table(spark, sf_dir, "embeddings")
        queries = emb.filter(F.col("vec_id") % 25 == 0)  # 4% query slice
        n_vec, n_q = emb.count(), queries.count()
        for n_bands, planes in VEC_PARAMS:
            t0 = time.perf_counter()
            cb = similarity.lsh_band_signatures(
                emb, "vec_id", "embedding", n_bands, planes, out_id="neighbor_id"
            )
            qb = similarity.lsh_band_signatures(
                queries, "vec_id", "embedding", n_bands, planes, out_id="query_id"
            )
            n_cands = (
                cb.join(F.broadcast(qb), ["band", "sig"])
                .filter(F.col("query_id") != F.col("neighbor_id"))
                .select("query_id", "neighbor_id")
                .distinct()
                .count()
            )
            wall = round(time.perf_counter() - t0, 2)
            out["vector"].append(
                {
                    "sf": sf_name,
                    "n_vecs": n_vec,
                    "n_queries": n_q,
                    "n_bands": n_bands,
                    "planes": planes,
                    "candidates": n_cands,
                    "cand_sec": wall,
                }
            )
            print(json.dumps(out["vector"][-1]), file=sys.stderr)

    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
