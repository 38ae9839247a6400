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

    # ---- OPQ rotation on the ANISOTROPIC fixtures (r12) ----
    # The rotation's value is measured on TWO skewed 16-dim corpora at
    # EQUAL cand_frac, with the DATA-TRAINED persisted rotation
    # (ann_index.opq_rotation_for — the real eigh path):
    #  * "gauss×S": the deterministic md5 CLT-gaussian sample under the
    #    same skew S the registered embedding_ivf_pq_opq query embeds —
    #    the distribution the covariance-only OPQ model assumes; the
    #    allocation should WIN here (it does: measured ~+0.13 recall).
    #  * "bench×S": the bench embeddings' 16-dim slice under S. These
    #    vectors are UNIT-NORM (a sphere), and a covariance-only
    #    rotation cannot see the norm constraint that coordinate PQ
    #    happens to exploit — the rotation measurably LOSES here. Both
    #    numbers are reported; the honest negative is the documented
    #    boundary of second-moment OPQ (same spirit as the r11
    #    PCA-rotation-hurts measurement).
    # Truth for this section is L2 (PQ ADC approximates squared
    # distance and the fixtures are unnormalized); rotation is
    # orthogonal so truth on each skewed corpus carries over to its
    # rotated variant's neighbor ids.
    import numpy as np

    from social_media_data_pipeline_spark.functions import ann_index
    from social_media_data_pipeline_spark.functions import pca as epca

    s_mat = epca.opq_demo_fixture(d=16, m=4)[0]

    def matmul_col(mat, d):
        e = F.col("embedding")
        outs = []
        for i in range(d):
            expr = F.lit(float(mat[i][0])) * e[0].cast("double")
            for j in range(1, d):
                expr = expr + F.lit(float(mat[i][j])) * e[j].cast("double")
            outs.append(expr)
        return F.array(*outs)

    bench_skew = emb.select(
        "vec_id", matmul_col(s_mat, 16).alias("embedding")
    ).localCheckpoint()
    g = sum(
        epca._md5_uniform(f"recall-corpus|G{t}", 512 * 16) for t in range(4)
    ).reshape(512, 16) * np.sqrt(3.0)
    y_gauss = g @ s_mat.T
    gauss_skew = spark.createDataFrame(
        [(i, [float(v) for v in y_gauss[i]]) for i in range(512)],
        "vec_id bigint, embedding array<double>",
    ).localCheckpoint()

    print(f"\nOPQ rotation at equal cand_frac (trained persisted "
          f"rotation, L2 truth, m=4 ksub=16):")
    for label, corpus in (("gauss×S", gauss_skew), ("bench×S", bench_skew)):
        mean, r_mat = ann_index.opq_rotation_for(
            corpus, f"{SF_DIR}:recall:{label}", m=4
        )
        rotated = (
            epca.pca_project(corpus, mean, r_mat, "embedding", "rot")
            .select("vec_id", F.col("rot").alias("embedding"))
            .localCheckpoint()
        )
        rows = sorted(corpus.collect(), key=lambda r: r["vec_id"])
        ids = np.array([r["vec_id"] for r in rows])
        xs = np.array([r["embedding"] for r in rows])
        truth_s: dict[int, set] = {}
        for qi in range(len(ids)):
            if ids[qi] >= n_queries:
                continue
            dist = ((xs - xs[qi]) ** 2).sum(axis=1)
            dist[qi] = np.inf
            truth_s[int(ids[qi])] = set(
                int(v) for v in ids[np.argsort(dist)[:k]]
            )
        q_s = corpus.filter(F.col("vec_id") < n_queries)
        q_r = rotated.filter(F.col("vec_id") < n_queries)
        cb_s = epq.pq_codebook_kmeans(corpus, m=4, ksub=16, iters=3)
        cb_r = epq.pq_codebook_kmeans(rotated, m=4, ksub=16, iters=3)
        rec_no = recall_at_k(
            truth_s,
            epq.pq_adc_topk(
                q_s, epq.pq_encode(corpus, cb_s), cb_s, k=k
            ).collect(),
            k,
        )
        rec_opq = recall_at_k(
            truth_s,
            epq.pq_adc_topk(
                q_r, epq.pq_encode(rotated, cb_r), cb_r, k=k
            ).collect(),
            k,
        )
        print(f"{label + ' pq adc, no rotation':30s} {rec_no:>9.3f} {1.0:>10.3f}")
        print(f"{label + ' pq adc + OPQ rotation':30s} {rec_opq:>9.3f} {1.0:>10.3f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
