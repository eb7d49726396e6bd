#!/usr/bin/env python
"""Corpus link/quality report: spark-submit --py-files intelligent_ocr_spark.zip
jobs/run_corpus_report.py --input <pages parquet/table> --output <dir>
[--pagerank-iters N] [--quota Q]

Reads a pages table (url, html[, ...]; html binary or string), extracts
the link graph, and writes four parquet tables under --output:

  links/      (src_url, src_host, href, dst_host) — every absolute anchor
  authority/  (node, rank_scaled)                 — integer-exact PageRank
  profile/    (host, n_docs, n_links_out, n_links_in, rank_scaled)
  frontier/   (dst_host, rank_scaled, href, slot) — per-host quota picks

Prints a one-line JSON summary. Deterministic: rerunning on the same
input yields byte-identical tables (integer PageRank, content-addressed
quota order).
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="pages parquet path / table")
    ap.add_argument("--output", required=True, help="report output directory")
    ap.add_argument("--pagerank-iters", type=int, default=5)
    ap.add_argument("--quota", type=int, default=3,
                    help="frontier URL slots per target host")
    args = ap.parse_args()

    from pyspark.sql import SparkSession, Window
    from pyspark.sql import functions as F

    from intelligent_ocr_spark.operators.graph import pagerank
    from intelligent_ocr_spark.operators.web import extract_links, host_edges

    spark = SparkSession.builder.appName(
        "intelligent_ocr_spark.corpus_report"
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    pages = spark.read.parquet(args.input)
    # html may be binary (crawl tables) or string; permissive cast never
    # fails a partition on malformed legacy bytes
    pages = pages.select("url", F.col("html").cast("string").alias("html"))

    links = extract_links(pages)
    links.write.mode("overwrite").parquet(f"{args.output}/links")
    links = spark.read.parquet(f"{args.output}/links")  # reuse, don't recompute

    auth = pagerank(host_edges(links), n_iter=args.pagerank_iters)
    auth.write.mode("overwrite").parquet(f"{args.output}/authority")
    auth = spark.read.parquet(f"{args.output}/authority")

    n_docs = pages.groupBy(
        F.regexp_extract("url", r"^[a-z][a-z0-9+.-]*://([^/:?#]+)", 1).alias("host")
    ).agg(F.count(F.lit(1)).alias("n_docs"))
    out_links = links.groupBy(F.col("src_host").alias("host")).agg(
        F.count(F.lit(1)).alias("n_links_out")
    )
    in_links = links.groupBy(F.col("dst_host").alias("host")).agg(
        F.count(F.lit(1)).alias("n_links_in")
    )
    profile = (
        n_docs.join(out_links, "host", "left")
        .join(in_links, "host", "left")
        .join(auth.withColumnRenamed("node", "host"), "host", "left")
        .select(
            "host",
            "n_docs",
            F.coalesce("n_links_out", F.lit(0)).alias("n_links_out"),
            F.coalesce("n_links_in", F.lit(0)).alias("n_links_in"),
            "rank_scaled",
        )
    )
    profile.write.mode("overwrite").parquet(f"{args.output}/profile")

    w = Window.partitionBy("dst_host").orderBy(
        F.md5(F.encode("href", "UTF-8")), "href"
    )
    frontier = (
        links.select("href", "dst_host")
        .distinct()
        .withColumn("slot", F.row_number().over(w).cast("long"))
        .filter(F.col("slot") <= args.quota)
        .join(auth, F.col("dst_host") == F.col("node"))
        .select("dst_host", "rank_scaled", "href", "slot")
    )
    frontier.write.mode("overwrite").parquet(f"{args.output}/frontier")

    summary = {
        "out_dir": args.output,
        "n_pages": pages.count(),
        "n_links": links.count(),
        "n_hosts": profile.count(),
        "n_frontier": spark.read.parquet(f"{args.output}/frontier").count(),
        "pagerank_iters": args.pagerank_iters,
    }
    print(json.dumps(summary))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
