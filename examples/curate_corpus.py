"""Worked example: a training-data curation run over the documents table,
composing the ops library end-to-end — the workflow a 100 TB corpus job
runs, exercised here on the sf0.001 sample.

    python examples/curate_corpus.py [sf_dir] [out_dir]

Stages (each a lazy DataFrame op; one action per artifact):

1. quality gate        — Gopher-style rule bitmask (ops.text)
2. PII redaction       — chained JVM regex scrub (ops.text)
3. dedup               — exact + MinHash/LSH + connected components,
                         one canonical doc per near-dup cluster
                         (ops.curation composes ops.dedup + ops.cluster)
4. contamination screen— drop docs sharing 8-grams with a benchmark set
                         (ops.corpus)
5. mixing              — stratified per-language sampling (ops.corpus)
6. chunking            — fixed-token chunks with overlap, the unit a
                         tokenizer/embedder consumes (ops.corpus)
7. ANN index           — IVF assignment written partitionBy(cell) so
                         similarity probes prune files (ops.similarity)
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from logzoom_spark.ops.corpus import (  # noqa: E402
    chunk_documents,
    contamination_pairs,
    stratified_sample,
)
from logzoom_spark.ops.curation import curate  # noqa: E402
from logzoom_spark.ops.similarity import ivf_assign  # noqa: E402
from logzoom_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/curated_corpus"

    spark = get_spark("curate_corpus", cpus=8)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n0 = docs.count()

    # 1-3: quality -> redact -> dedup -> canonical survivors
    clean = curate(docs)

    # 4: contamination screen against a held-out benchmark set
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    dirty = contamination_pairs(clean, bench, n=8).select("doc_id").distinct()
    screened = clean.join(dirty, "doc_id", "left_anti")

    # 5: mixing recipe — keep 80% en, 40% zh, 20% of the rest
    # (curate() carries only doc_id/text/n_redacted; re-attach lang from
    # the source metadata — a broadcast-sized key join at any scale since
    # it rides the doc_id key both sides already shuffle on)
    screened = screened.join(docs.select("doc_id", "lang"), "doc_id")
    mixed = stratified_sample(screened, "lang", {"en": 8000, "zh": 4000}, 2000)

    # 6: chunk for the tokenizer/embedder
    chunks = chunk_documents(mixed, chunk_tokens=64, overlap=16)
    chunks.write.mode("overwrite").parquet(f"{out}/chunks")

    # 7: ANN index over the (separate) embeddings table, probe-prunable
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    (
        ivf_assign(emb)
        .repartition("cell")
        .write.partitionBy("cell")
        .mode("overwrite")
        .parquet(f"{out}/ivf_index")
    )

    n_chunks = spark.read.parquet(f"{out}/chunks").count()
    n_mixed = mixed.count()
    print(
        f"documents in: {n0}; after curate+screen+mix: {n_mixed}; "
        f"chunks out: {n_chunks}; artifacts under {out}/"
    )
    spark.stop()


if __name__ == "__main__":
    main()
