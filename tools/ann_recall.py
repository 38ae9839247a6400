"""ANN recall harness: MEASURE what each approximation trades.

For a query sample, compute exact cosine top-k (ground truth), then
recall@k of every ANN variant the library ships — IVF with id-stride
centroids, IVF with TRAINED (Lloyd) centroids, PQ ADC with seeded and
with trained codebooks, and composed IVF-PQ. Also reports the
candidate fraction (scored pairs / brute-force pairs) — the scan cost
each recall point is bought at. This is the number that justifies the
round-6 k-means work: trained cells/codebooks should dominate the
seeded ones at equal cost.

Usage: python tools/ann_recall.py [n_queries] [k]   (sf dir from
SPARK_GRAFT_SF_DIR, default sf0.1)
"""

from __future__ import annotations

import math
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from social_media_data_pipeline_spark import io as eio  # noqa: E402
from social_media_data_pipeline_spark.functions import kmeans as ekm  # noqa: E402
from social_media_data_pipeline_spark.functions import pq as epq  # noqa: E402
from social_media_data_pipeline_spark.functions import similarity as sim  # noqa: E402
from social_media_data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def recall_at_k(truth: dict, got_rows, k: int) -> float:
    got: dict[int, set] = {}
    for r in got_rows:
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = sum(len(truth[q] & got.get(q, set())) for q in truth)
    return hits / (len(truth) * k)


def main() -> int:
    n_queries = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark("ann-recall")
    emb = eio.read_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    if os.environ.get("ANN_RECALL_NORMALIZE"):
        # unit-normalize at "ingest": cosine and L2 rankings coincide,
        # which is the convention real embedding corpora ship with
        emb = emb.select(
            "vec_id", sim.l2_normalize("embedding").alias("embedding")
        ).localCheckpoint()
    n = emb.count()
    queries = emb.filter(F.col("vec_id") < n_queries)
    print(f"corpus {n} vectors, {n_queries} queries, recall@{k}\n")

    exact = sim.brute_force_topk(queries, emb, k=k).collect()
    truth: dict[int, set] = {}
    for r in exact:
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])

    kc = math.isqrt(n)
    stride_cents = sim.select_ivf_centroids(emb, corpus_size=n)
    mod50_cents = emb.filter(F.col("vec_id") % 50 == 0)
    trained_cents = ekm.kmeans_centroids(emb, iters=5, corpus_size=n)
    cb_seed = epq.pq_codebook(emb, m=8, ksub=16)
    cb_trained = epq.pq_codebook_kmeans(emb, m=8, ksub=16, iters=3)

    # candidate fraction for IVF = avg cell occupancy / n
    def cell_fraction(cents):
        sizes = (
            sim.ivf_assign(emb, cents)
            .groupBy("cluster")
            .count()
            .agg(F.sum(F.col("count") * F.col("count")).alias("ss"))
            .collect()[0]["ss"]
        )
        # scored pairs ≈ Σ c_i² when queries distribute like the corpus
        return sizes / (n * n)

    # multiprobe retrieval is the LIBRARY path now
    # (similarity.ivf_topk_multiprobe, registered as
    # embedding_ivf_topk_multiprobe) — the harness measures the same
    # code the oracle checks
    def ivf_multiprobe_topk(cents, probes):
        return sim.ivf_topk_multiprobe(queries, emb, cents, k=k, probes=probes)

    variants = [
        ("ivf (id-stride centroids)",
         lambda: sim.ivf_topk(queries, emb, stride_cents, k=k),
         cell_fraction(stride_cents)),
        ("ivf (trained centroids)",
         lambda: sim.ivf_topk(queries, emb, trained_cents, k=k),
         cell_fraction(trained_cents)),
        ("pq adc (seeded codebook)",
         lambda: epq.pq_adc_topk(queries, epq.pq_encode(emb, cb_seed), cb_seed, k=k),
         1.0),
        ("pq adc (trained codebook)",
         lambda: epq.pq_adc_topk(queries, epq.pq_encode(emb, cb_trained), cb_trained, k=k),
         1.0),
        ("ivf-pq (trained both)",
         lambda: epq.ivf_pq_topk(queries, emb, trained_cents, cb_trained, k=k),
         cell_fraction(trained_cents)),
        ("ivf trained, 4-probe",
         lambda: ivf_multiprobe_topk(trained_cents, 4),
         4 * cell_fraction(trained_cents)),
        ("ivf trained, 8-probe",
         lambda: ivf_multiprobe_topk(trained_cents, 8),
         8 * cell_fraction(trained_cents)),
        # the registered-query configuration (embedding_ivf_topk /
        # embedding_ivf_topk_multiprobe): %50-stride centroids
        ("ivf %50 cents, 1-probe",
         lambda: sim.ivf_topk(queries, emb, mod50_cents, k=k),
         cell_fraction(mod50_cents)),
        ("ivf %50 cents, 4-probe",
         lambda: ivf_multiprobe_topk(mod50_cents, 4),
         4 * cell_fraction(mod50_cents)),
        ("ivf-pq RESIDUAL, 1-probe",
         lambda: epq.ivf_pq_residual_topk(
             queries, emb, trained_cents, m=8, ksub=16, iters=3, k=k, probes=1),
         cell_fraction(trained_cents)),
        ("ivf-pq RESIDUAL, 8-probe",
         lambda: epq.ivf_pq_residual_topk(
             queries, emb, trained_cents, m=8, ksub=16, iters=3, k=k, probes=8),
         8 * cell_fraction(trained_cents)),
    ]
    print(f"{'variant':30s} {'recall@'+str(k):>9s} {'cand_frac':>10s}")
    print(f"{'brute force (truth)':30s} {'1.000':>9s} {'1.000':>10s}")
    for name, make, frac in variants:
        rec = recall_at_k(truth, make().collect(), k)
        print(f"{name:30s} {rec:>9.3f} {frac:>10.3f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
