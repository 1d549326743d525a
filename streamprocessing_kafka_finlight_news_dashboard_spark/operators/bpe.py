"""Byte-pair-encoding tokenizer tier (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units" —
public method; merge-application order as in the GPT-2 BPE).

Whitespace token counts (operators/text.py) are the cheap budget
proxy; real training pipelines budget in SUBWORD tokens. This module
adds the two halves:

- :func:`bpe_train` — learn a merge table. Like every trained
  artifact in this engine (IVF/PQ quantizers), training follows the
  bounded sample-fit recipe: one distributed word-count, one bounded
  TakeOrdered collect of the most frequent words, then the classic
  Sennrich merge loop driver-side over the word-frequency dict (the
  loop is O(num_merges · |sample vocab|) — seconds, and exactly what
  single-node tokenizer trainers do on a corpus sample). Fully
  deterministic: sample order (count desc, word asc) and tie-breaks
  (pair count desc, pair lexicographic asc) are total orders.
- :func:`bpe_encode_stats` — apply the merges to every document in
  ONE Arrow pass (broadcast rank dict, per-batch word cache) and emit
  per-doc subword counts next to the whitespace counts. Encoding is
  the standard lowest-rank-first merge loop per word, so the output
  is independent of batch/partition boundaries.

Scale shape: train = one uniform word-keyed shuffle + a bounded
collect; encode = the round-robin compute scatter + linear
per-document work, no shuffle at all. Correctness evidence (the merge
loop is iterative — not SQL-expressible): pinned merge-table artifact,
encode/decode roundtrip + monotonicity invariants, and a pure-Python
reference encode cross-check in tests/test_text_plans.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from streamprocessing_kafka_finlight_news_dashboard_spark.operators.text import tokens
from streamprocessing_kafka_finlight_news_dashboard_spark.session import shuffle_partitions

#: End-of-word marker symbol (kept out of any plausible corpus char).
EOW = "</w>"


def _word_symbols(word: str) -> tuple[str, ...]:
    return tuple(word) + (EOW,)


def _train_merges(word_freqs: list[tuple[str, int]], num_merges: int) -> list[tuple[str, str]]:
    """Driver-side Sennrich merge loop over a word-frequency sample.
    Deterministic: best pair = max count, ties to the lexicographically
    smallest (left, right)."""
    from collections import Counter

    vocab = {_word_symbols(w): f for w, f in word_freqs if w}
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for syms, freq in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += freq
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab = {}
        for syms, freq in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == best[0] and syms[i + 1] == best[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + freq
        vocab = new_vocab
    return merges


def bpe_encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """GPT-2-style application: repeatedly merge the LOWEST-rank
    adjacent pair until none of the word's pairs is in the table.
    Pure function of (word, ranks) — partition-order independent."""
    syms = list(_word_symbols(word))
    while len(syms) > 1:
        best_rank = None
        best_idx = -1
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_idx = r, i
        if best_idx < 0:
            break
        syms[best_idx : best_idx + 2] = [syms[best_idx] + syms[best_idx + 1]]
    return syms


def bpe_train(
    df: DataFrame,
    num_merges: int = 64,
    sample_words: int = 32768,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Learn a BPE merge table from the corpus: distributed word
    count → bounded TakeOrdered sample of the most frequent words
    (count desc, word asc — a total order, so the sample and
    therefore the merges are deterministic) → driver merge loop.
    Returns (rank int, left string, right string)."""
    spark = df.sparkSession
    n_part = shuffle_partitions(spark)
    wc = (
        df.repartition(n_part, F.col(id_col))
        .select(F.explode(tokens(F.col(text_col))).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    sample = [
        (r["word"], r["freq"])
        for r in wc.orderBy(F.desc("freq"), F.asc("word")).limit(sample_words).collect()
    ]
    merges = _train_merges(sample, num_merges)
    return spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(merges)],
        "rank int, left string, right string",
    )


def bpe_encode_stats(
    df: DataFrame,
    merges: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document subword statistics in one Arrow pass:
    (doc_id, n_ws_tokens, n_bpe_tokens, n_chars, compression) where
    compression = n_bpe_tokens / n_ws_tokens (round 6). The merge-rank
    dict is broadcast; encodes are memoized per batch (corpus word
    distributions are Zipfian, so the cache hit rate is high). NULL
    text emits no row, matching the doc-operator convention;
    n_ws_tokens uses tokens()/token_count() semantics exactly
    (unfiltered split, so empty tokens from empty or oddly-whitespaced
    docs count) — doc_token_stats is its oracle twin row-for-row."""
    from streamprocessing_kafka_finlight_news_dashboard_spark.operators.arrow_docs import _tokens, scatter_rr

    spark = df.sparkSession
    ranks = {
        (r["left"], r["right"]): r["rank"] for r in merges.collect()
    }
    bc = spark.sparkContext.broadcast(ranks)

    def op(batches):
        import pandas as pd

        rk = bc.value
        cache: dict[str, int] = {}

        def n_sub(word: str) -> int:
            n = cache.get(word)
            if n is None:
                n = len(bpe_encode_word(word, rk))
                cache[word] = n
            return n

        for pdf in batches:
            ids, n_ws, n_bpe, n_chars = [], [], [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                if text is None:
                    continue
                # n_ws_tokens counts len(_tokens(text)) UNFILTERED so it
                # matches token_count()/doc_token_stats exactly (empty/
                # whitespace-only docs included); empty tokens contribute
                # zero BPE subwords, so n_bpe skips them.
                words = _tokens(text)
                ids.append(doc_id)
                n_ws.append(len(words))
                n_bpe.append(sum(n_sub(w) for w in words if w))
                n_chars.append(len(text))
            yield pd.DataFrame(
                {id_col: ids, "n_ws_tokens": n_ws, "n_bpe_tokens": n_bpe, "n_chars": n_chars}
            )

    out = scatter_rr(df.select(F.col(id_col), F.col(text_col))).mapInPandas(
        op, f"{id_col} bigint, n_ws_tokens bigint, n_bpe_tokens bigint, n_chars bigint"
    )
    return out.withColumn(
        "compression",
        F.round(F.try_divide(F.col("n_bpe_tokens"), F.col("n_ws_tokens")), 6),
    )
