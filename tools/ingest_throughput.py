"""Bulk-ingest throughput: MEASURE the WARC and archive-shard sources.

The r6 verdict: the two bulk-ingest sources (sources/warc.py,
sources/binary.py:read_archive_members) have correctness tests but no
measured numbers backing the 100 TB ingest claim. This tool generates
multi-member fixtures and measures:

1. WARC shards 1x->8x: wall seconds, records/s, MB/s (shard-per-task
   parallelism — the Common Crawl layout).
2. Small-files comparison: N members inside ONE zip (read via
   read_archive_members, shard-per-task) vs the same N as loose files
   (binaryFile scan, file-per-row) — the small-files problem the
   archive source exists to kill.

Usage: python tools/ingest_throughput.py [n_members]
Writes fixtures under <repo>/spark-warehouse/ingest_throughput/.
"""

from __future__ import annotations

import os
import shutil
import sys
import time
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from social_media_data_pipeline_spark.session import get_spark  # noqa: E402
from social_media_data_pipeline_spark.sources import warc as ewarc  # noqa: E402
from social_media_data_pipeline_spark.sources.binary import (  # noqa: E402
    read_archive_members,
)

SCRATCH = os.path.join(REPO, "spark-warehouse", "ingest_throughput")


def _body(i: int, size: int = 4096) -> bytes:
    # deterministic compressible-but-not-trivial text payload
    seed = f"record {i}: the quick brown fox jumps over shard {i % 97}. "
    return (seed * (size // len(seed) + 1))[:size].encode()


def make_warc_shards(
    n_shards: int, recs_per_shard: int, dirpath: str, body_size: int = 4096
) -> int:
    os.makedirs(dirpath, exist_ok=True)
    total = 0
    for s in range(n_shards):
        records = []
        for i in range(recs_per_shard):
            body = _body(s * recs_per_shard + i, body_size)
            records.append(
                {
                    "warc_type": "response",
                    "url": f"https://example.org/{s}/{i}",
                    "payload": ewarc.build_http_response(
                        body, content_type="text/plain"
                    ),
                }
            )
        blob = ewarc.build_warc(records, gzip_members=True)
        with open(os.path.join(dirpath, f"shard-{s:04d}.warc.gz"), "wb") as f:
            f.write(blob)
        total += len(blob)
    return total


def bench_warc() -> None:
    spark = get_spark("ingest-throughput")
    print(f"{'shards':>7} {'records':>8} {'MB':>7} {'wall s':>7} "
          f"{'rec/s':>8} {'MB/s':>7}")
    for n_shards in (8, 16, 32, 64):
        d = os.path.join(SCRATCH, f"warc_{n_shards}")
        nbytes = make_warc_shards(n_shards, 250, d)
        best = None
        for _ in range(2):
            t0 = time.time()
            n = ewarc.read_warc(spark, d).count()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        print(
            f"{n_shards:>7} {n:>8} {nbytes / 1e6:>7.1f} {best:>7.2f} "
            f"{n / best:>8.0f} {nbytes / 1e6 / best:>7.1f}"
        )
    # decompress-bound point: 64 KB bodies — MB/s once per-record
    # overhead stops dominating (uncompressed payload MB reported)
    d = os.path.join(SCRATCH, "warc_big")
    make_warc_shards(32, 64, d, body_size=65536)
    raw_mb = 32 * 64 * 65536 / 1e6
    best = None
    for _ in range(2):
        t0 = time.time()
        n = ewarc.read_warc(spark, d).count()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(
        f"{'32x64KB':>7} {n:>8} {raw_mb:>7.1f} {best:>7.2f} "
        f"{n / best:>8.0f} {raw_mb / best:>7.1f}  (uncompressed MB)"
    )


def bench_small_files(n_members: int) -> None:
    spark = get_spark("ingest-throughput")
    # one zip holding n_members files
    zdir = os.path.join(SCRATCH, "zip_shard")
    os.makedirs(zdir, exist_ok=True)
    zpath = os.path.join(zdir, "members.zip")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for i in range(n_members):
            z.writestr(f"doc-{i:05d}.txt", _body(i, 2048))
    # the same members as loose files
    ldir = os.path.join(SCRATCH, "loose")
    os.makedirs(ldir, exist_ok=True)
    for i in range(n_members):
        with open(os.path.join(ldir, f"doc-{i:05d}.txt"), "wb") as f:
            f.write(_body(i, 2048))

    best_zip = best_loose = None
    for _ in range(2):
        t0 = time.time()
        nz = read_archive_members(spark, zdir, glob="*.zip").count()
        dt = time.time() - t0
        best_zip = dt if best_zip is None else min(best_zip, dt)
    for _ in range(2):
        t0 = time.time()
        nl = (
            spark.read.format("binaryFile")
            .option("pathGlobFilter", "*.txt")
            .load(ldir)
            .count()
        )
        dt = time.time() - t0
        best_loose = dt if best_loose is None else min(best_loose, dt)
    assert nz == nl == n_members, (nz, nl)
    print(
        f"\nsmall-files: {n_members} members x 2 KB\n"
        f"  one zip shard (read_archive_members): {best_zip:.2f} s\n"
        f"  loose files   (binaryFile scan):      {best_loose:.2f} s\n"
        f"  ratio: {best_loose / best_zip:.1f}x"
    )


def main() -> int:
    n_members = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
    shutil.rmtree(SCRATCH, ignore_errors=True)
    bench_warc()
    bench_small_files(n_members)
    shutil.rmtree(SCRATCH, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
