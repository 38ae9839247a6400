"""Streaming curation flagship throughput, WITH continuous cluster-label
maintenance (r10): sf0.1 documents in 8 ordered batches of 625 through
`curation.curate_batch(labels_path=...)` — the r9 protocol (permissive
word-count gate so every stage does real work) plus the label store.

Reports per batch: dup pairs flagged, docs committed, label rows
CHANGED (the store commit is an anti join — untouched components never
rewrite), and wall seconds. The claim on trial: per-batch wall stays
flat while curated table + band store + label store all grow, and the
label commit volume tracks the AFFECTED subgraph, not the store size.

Usage: python tools/curation_throughput.py [sf_dir] [spectrum]
  pass a second arg "spectrum" to also fold committed survivors'
  embeddings into the spectrum store per batch (r12: the eigenvalue
  drift alarm) — the per-batch wall delta vs the plain run is the
  alarm's measured overhead (one batch Gram pass + a store-sized
  merge + one driver eigh pair).
"""

from __future__ import annotations

import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from social_media_data_pipeline_spark import io as eio  # noqa: E402
from social_media_data_pipeline_spark import scale  # noqa: E402
from social_media_data_pipeline_spark.session import get_spark  # noqa: E402
from social_media_data_pipeline_spark.streaming import curation  # noqa: E402

SCRATCH = os.path.join(REPO, "spark-warehouse", "curation_throughput")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("curation-throughput")
    shutil.rmtree(SCRATCH, ignore_errors=True)
    mode = sys.argv[2] if len(sys.argv) > 2 else ""
    with_spectrum = mode == "spectrum"
    # "joined" = the spectrum run's exact corpus (docs ⋈ embeddings)
    # WITHOUT the spectrum fold — the like-for-like overhead baseline
    with_join = with_spectrum or mode == "joined"
    table = os.path.join(SCRATCH, "curated")
    store = os.path.join(SCRATCH, "bands")
    labels = os.path.join(SCRATCH, "labels")
    spectrum = os.path.join(SCRATCH, "spectrum") if with_spectrum else None
    docs = eio.read_table(spark, sf_dir, "documents").select("doc_id", "text")
    if with_join:
        # inner join: every curated row carries its embedding (the
        # spectrum fold has no NULL-vector branch by design)
        emb = eio.read_table(spark, sf_dir, "embeddings").select(
            F.col("vec_id").alias("doc_id"), "embedding"
        )
        docs = docs.join(emb, "doc_id")
    n = docs.count()
    n_batches = 8
    per = (n + n_batches - 1) // n_batches
    gate = F.size(F.split(F.trim(F.col("text")), "\\s+")) >= 5
    print(f"{'batch':>5} {'flagged':>8} {'committed':>9} "
          f"{'labels_chg':>10} {'store_rows':>10} {'wall s':>7}"
          + ("  drift alarm" if with_spectrum else ""))
    for b in range(n_batches):
        batch = docs.filter(
            (F.col("doc_id") >= b * per) & (F.col("doc_id") < (b + 1) * per)
        ).localCheckpoint(eager=True)
        t0 = time.time()
        stats = curation.curate_batch(
            spark, batch, table, store,
            quality_predicate=gate, labels_path=labels,
            spectrum_path=spectrum,
        )
        wall = time.time() - t0
        store_rows = (
            scale.manifest_read(spark, labels).count()
            if os.path.exists(labels) else 0
        )
        extra = ""
        if with_spectrum:
            d = stats.get("spectrum_drift")
            extra = (
                f"  {d if d is None else round(d, 3)!s:>6}"
                f" {str(stats.get('spectrum_alarm')):>5}"
            )
        print(f"{b:>5} {stats['dup_flagged']:>8} {stats['committed']:>9} "
              f"{stats['labels_changed']:>10} {store_rows:>10} {wall:>7.1f}"
              + extra,
              flush=True)
    shutil.rmtree(SCRATCH, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
