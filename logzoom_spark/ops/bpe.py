"""Distributed BPE (byte-pair encoding) tokenizer training + application.

The classic BPE training loop (Sennrich et al. 2016, public algorithm) is
inherently iterative — each round merges the most frequent adjacent symbol
pair — so, like k-means (`ops/kmeans.py`) and connected components
(`ops/cluster.py`), it runs as a bounded driver loop over DataFrame rounds:

- **Everything is vocabulary-sized, never corpus-sized.** Training runs
  over the DISTINCT-WORD table weighted by word frequency (the standard
  BPE trick; `ops/text.bpe_pair_counts` is the single-round primitive).
  At 100 TB the corpus has ~10^12 tokens but the vocabulary is ~10^7 rows;
  every shuffle, merge fold, and checkpoint here touches only the latter.
- **One bounded collect per round**: the single winning pair (1 row).
  Merge application is a pure codegen fold over each word's symbol array
  (`F.aggregate` with an (arr, prev) accumulator — greedy left-to-right,
  so 'aaa' + merge (a,a) → [aa, a], matching the reference algorithm).
- **Lineage truncation per round** (`localCheckpoint`), the same guard as
  the CC loop: M rounds would otherwise nest M fold lambdas in one plan.
- **Encoding is a broadcast vocabulary join**, not per-doc Python: explode
  doc words, join the learned word→pieces table (vocabulary-sized, hence
  broadcastable), aggregate per doc. Out-of-vocabulary words fall back to
  character count — counted, not dropped.

Verification: pytest against an independent pure-Python reference
implementation (same tie-breaks: count desc, then pair lexicographic asc),
PLUS full DuckDB value oracles — the fixed 12-round deterministic loop
unrolls into 12 chained CTE rounds (`oracles._bpe_rounds_sql`), with the
greedy left-to-right merge expressed non-sequentially (merge starts where
the pair matches and, for a == b, an even number of a's precedes in-run).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def word_counts(docs: DataFrame, col: str = "text") -> DataFrame:
    """(word, cnt): frequency-weighted distinct vocabulary (lowercased,
    whitespace-split — the same fold as `text.bpe_pair_counts`). One
    map-side-combined shuffle carrying (word, partial-count) pairs."""
    return (
        docs.select(
            F.explode(
                F.split(F.lower(F.trim(F.coalesce(F.col(col), F.lit("")))), r"\s+")
            ).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _char_syms(word: Column) -> Column:
    """Split a word into its initial character symbols (array<string>)."""
    return F.transform(
        F.sequence(F.lit(1), F.length(word)), lambda i: word.substr(i, F.lit(1))
    )


def sym_pair_counts(vocab: DataFrame) -> DataFrame:
    """(a, b, cnt): corpus-weighted adjacent symbol-pair counts over the
    current segmentation. Per-position multiplicity counts exactly
    ('aaa' contributes (a,a) twice). Vocabulary-sized exchange only."""
    pairs = vocab.filter(F.size("syms") >= 2).select(
        "cnt",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("syms") - 1),
                lambda i: F.struct(
                    F.element_at(F.col("syms"), i).alias("a"),
                    F.element_at(F.col("syms"), i + 1).alias("b"),
                ),
            )
        ).alias("p"),
    )
    return (
        pairs.select(F.col("p.a").alias("a"), F.col("p.b").alias("b"), "cnt")
        .groupBy("a", "b")
        .agg(F.sum("cnt").alias("cnt"))
    )


def _merge_expr(syms: Column, a: str, b: str) -> Column:
    """Greedy left-to-right merge of adjacent (a, b) into a||b — a pure
    codegen fold with an (arr, prev) accumulator; no UDF, no shuffle."""
    merged = a + b
    empty = F.expr("cast(array() AS array<string>)")
    init = F.struct(
        empty.alias("arr"), F.lit(None).cast("string").alias("prev")
    )

    def step(acc: Column, s: Column) -> Column:
        hit = acc["prev"].eqNullSafe(F.lit(a)) & s.eqNullSafe(F.lit(b))
        return F.when(
            hit,
            F.struct(
                F.concat(acc["arr"], F.array(F.lit(merged))).alias("arr"),
                F.lit(None).cast("string").alias("prev"),
            ),
        ).otherwise(
            F.struct(
                F.when(acc["prev"].isNull(), acc["arr"])
                .otherwise(F.concat(acc["arr"], F.array(acc["prev"])))
                .alias("arr"),
                s.alias("prev"),
            )
        )

    def finish(acc: Column) -> Column:
        return F.when(acc["prev"].isNull(), acc["arr"]).otherwise(
            F.concat(acc["arr"], F.array(acc["prev"]))
        )

    return F.aggregate(syms, init, step, finish)


def _merge_word(syms: list, a: str, b: str) -> list:
    """Greedy left-to-right merge — the driver twin of `_merge_expr`'s
    (arr, prev) fold: same non-overlapping semantics ('aaa' + (a,a) →
    [aa, a])."""
    out: list = []
    prev = None
    for s in syms:
        if prev == a and s == b:
            out.append(a + b)
            prev = None
        else:
            if prev is not None:
                out.append(prev)
            prev = s
    if prev is not None:
        out.append(prev)
    return out


def bpe_learn(
    docs: DataFrame,
    n_merges: int = 16,
    col: str = "text",
    min_pair_count: int = 2,
    driver_max_vocab: int = 65536,
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Learn up to ``n_merges`` BPE merges; returns (merges, vocab) where
    vocab is (word, cnt, syms) under the final segmentation.

    Tie-break is fully deterministic: highest count, then lexicographically
    smallest (a, b). Stops early when no pair reaches ``min_pair_count``
    (merging singleton pairs just memorizes whole words).

    Bounded-vocabulary fast path: BPE training state is the weighted
    DISTINCT-WORD table, never the corpus — when it holds at most
    ``driver_max_vocab`` rows (head-probed on the lazily checkpointed
    aggregate, the broadcast-relation size class) the whole merge loop
    runs driver-side over the collected rows with identical arithmetic
    and tie-breaks, replacing 2·n_merges tiny cluster rounds with zero.
    Larger vocabularies fall through to the distributed round loop
    unchanged (reusing the same checkpointed aggregate — no extra pass);
    ``driver_max_vocab=0`` forces it."""
    wc = word_counts(docs, col).localCheckpoint(eager=False)
    merges: list[tuple[str, str]] = []
    if driver_max_vocab > 0:
        head = wc.head(driver_max_vocab + 1)
        if len(head) <= driver_max_vocab:
            segs: list[list] = [
                [r["word"], int(r["cnt"]), list(r["word"])] for r in head
            ]
            for _ in range(n_merges):
                pc: dict = {}
                for _w, cnt, syms in segs:
                    for i in range(len(syms) - 1):
                        p = (syms[i], syms[i + 1])
                        pc[p] = pc.get(p, 0) + cnt
                if not pc:
                    break
                (a, b), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
                if c < min_pair_count:
                    break
                merges.append((a, b))
                for rec in segs:
                    rec[2] = _merge_word(rec[2], a, b)
            spark = docs.sparkSession
            vocab = spark.createDataFrame(
                [(w, c, s) for w, c, s in segs],
                "word string, cnt bigint, syms array<string>",
            )
            return merges, vocab
    vocab = (
        wc.select("word", "cnt", _char_syms(F.col("word")).alias("syms"))
        .localCheckpoint()
    )
    for _ in range(n_merges):
        top = (
            sym_pair_counts(vocab)
            .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not top or int(top[0]["cnt"]) < min_pair_count:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        # localCheckpoint: materialize this round's segmentation and cut
        # the lineage, or round M's plan nests M merge folds
        vocab = vocab.withColumn(
            "syms", _merge_expr(F.col("syms"), a, b)
        ).localCheckpoint()
    return merges, vocab


def bpe_encode_counts(
    docs: DataFrame, vocab: DataFrame, col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, n_words, n_bpe_tokens): per-document token counts under a
    learned segmentation — the tokens-per-doc budget input to chunking and
    sequence packing (`ops/corpus.py`).

    Plan: explode doc words (row-local), broadcast-join the learned
    word→pieces vocabulary (vocabulary-sized), sum per doc — one shuffle
    on doc_id carrying (doc_id, int) rows. Out-of-vocabulary words fall
    back to their character count (counted, not dropped)."""
    words = docs.select(
        F.col(id_col),
        F.explode(
            F.split(F.lower(F.trim(F.coalesce(F.col(col), F.lit("")))), r"\s+")
        ).alias("word"),
    ).filter(F.col("word") != "")
    pieces = vocab.select("word", F.size("syms").alias("n_pieces"))
    return (
        words.join(F.broadcast(pieces), "word", "left")
        .select(
            id_col,
            F.coalesce(F.col("n_pieces"), F.length("word")).alias("n_pieces"),
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_pieces").alias("n_bpe_tokens"),
        )
    )
