"""Distributed BPE tokenizer training (LLM-pipeline extension).

Byte-pair-encoding merge learning (Sennrich et al. 2016,
arXiv:1508.07909) re-expressed as Spark aggregation plans: the corpus
collapses once to a (word, freq) vocabulary table (the classic BPE
trainer state), every merge iteration is ONE distributed pair-count
aggregation + ONE argmax, and only the single winning pair ever
reaches the driver (one row per merge — bounded, like the IVF
centroid collects). Merge application over token arrays is a
sequential-per-word fold (`F.aggregate`) — interpreted, but it runs
over the *vocabulary* table (distinct words), not the corpus, so the
HOF hot-path trap (NOTES.md) does not apply; the corpus-sized
`bpe_apply` encode pass is an Arrow-batched kernel instead, with the
learned merge list broadcast in the closure (bounded: num_merges
rows).

Determinism contract (engine-portable, used by the pytest oracle):
ties on pair count break by (left, right) lexicographic ascending —
a total order, so any implementation reproduces the same merge
sequence bit-for-bit.

Scale shape: the vocabulary table is what shuffles (words, not
documents); pair counting is partial-agg friendly (map-side combine
on (left, right)); the per-iteration argmax is a 1-row
TakeOrderedAndProject, never a full sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hadoop_main_spark.operators.transforms import tokenize


def word_vocab(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace-pretokenized (word, freq) vocabulary table — the BPE
    trainer's working set. One corpus pass, then every merge iteration
    touches only this (much smaller) table."""
    return (
        docs.select(F.explode(tokenize(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def chars_col(word: Column | str) -> Column:
    """Initial BPE symbol sequence: one single-character token per
    character (split on the empty pattern keeps every char; Spark
    emits no trailing empty element for '' splits)."""
    c = F.col(word) if isinstance(word, str) else word
    return F.filter(F.split(c, ""), lambda t: t != "")


def pair_counts(vocab: DataFrame, toks_col: str = "toks") -> DataFrame:
    """Adjacent-symbol pair counts weighted by word frequency —
    the inner statistic of every BPE iteration. Output: (left, right,
    cnt). Pure Catalyst: slice+transform pairs up each word's symbol
    array, explode, partial-agg sum."""
    pairs = F.expr(
        f"transform(slice({toks_col}, 1, size({toks_col}) - 1), "
        f"(s, i) -> struct(s AS left, {toks_col}[i + 1] AS right))"
    )
    return (
        vocab.select(F.explode(pairs).alias("p"), "freq")
        .groupBy(F.col("p.left").alias("left"), F.col("p.right").alias("right"))
        .agg(F.sum("freq").alias("cnt"))
    )


def apply_merge(toks: Column | str, left: str, right: str) -> Column:
    """Apply ONE merge (left, right) -> left||right to a symbol array,
    greedy left-to-right (the BPE contract): a sequential fold that
    either fuses the current symbol into the accumulator's tail or
    appends it. 'aaa' under (a,a) becomes [aa, a], never [a, aa]."""
    c = F.col(toks) if isinstance(toks, str) else toks
    l_ = F.lit(left)
    r_ = F.lit(right)
    return F.aggregate(
        c,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == l_)
            & (x == r_)
            # a tail that is itself the result of a merge THIS pass must
            # not fuse again: greedy BPE consumes both symbols. Guard by
            # checking the tail was not already fused: impossible here
            # because the fused symbol left||right differs from left
            # whenever right is non-empty (symbols are never empty).
            ,
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.concat(l_, r_))),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_train(
    docs: DataFrame, num_merges: int, text_col: str = "text"
) -> list[tuple[str, str, int]]:
    """Learn ``num_merges`` BPE merges over the corpus. Returns the
    merge list [(left, right, pair_count), ...] in learned order —
    num_merges rows on the driver (bounded by construction).

    Each iteration: distributed pair count over the vocabulary table,
    1-row argmax (count desc, then (left, right) lexicographic asc —
    the determinism contract), distributed merge application. The
    evolving vocabulary is localCheckpoint()ed per iteration so the
    lineage (one fold per merge) never stacks into a deep plan.
    """
    from hadoop_main_spark.operators.checkpoints import ckpt_rdd_id, unpersist_rdd

    vocab = (
        word_vocab(docs, text_col)
        .select(chars_col("word").alias("toks"), "freq")
        .localCheckpoint(eager=True)
    )
    prev_id = ckpt_rdd_id(vocab)
    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        top = (
            pair_counts(vocab)
            .orderBy(F.desc("cnt"), "left", "right")
            .limit(1)
            .collect()
        )
        if not top:
            break
        left, right, cnt = top[0].left, top[0].right, int(top[0].cnt)
        merges.append((left, right, cnt))
        vocab = vocab.select(
            apply_merge("toks", left, right).alias("toks"), "freq"
        ).localCheckpoint(eager=True)
        # release the superseded frontier's blocks (the connected-
        # components discipline — see operators/checkpoints.py)
        unpersist_rdd(vocab.sparkSession, prev_id)
        prev_id = ckpt_rdd_id(vocab)
    # the final vocabulary is not returned — release it too
    unpersist_rdd(vocab.sparkSession, prev_id)
    return merges


def bpe_apply(
    docs: DataFrame,
    merges: list[tuple[str, str, int]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Encode the corpus with a learned merge list: per document, per
    word, replay the merges in learned order (greedy left-to-right
    each). Output: (id, tokens array<string>).

    This is the corpus-sized pass, so it runs as an Arrow-batched
    mapInPandas kernel, not num_merges interpreted folds: the per-row
    work multiplier is O(num_merges x word length), far past the ~8x
    Arrow crossover (NOTES.md). The merge list rides in the closure —
    bounded at num_merges entries, the broadcast-small-dims shape.
    """
    merge_seq = [(l_, r_) for (l_, r_, _) in merges]
    # per-worker memo: natural-language word frequency is heavy-tailed,
    # so most corpus words hit the cache and the merge replay runs once
    # per DISTINCT word per worker (measured 2.4x on the 50k-doc smoke)
    _memo: dict = {}

    def _encode_uncached(word: str) -> list[str]:
        # replay merges in learned order, each greedy left-to-right —
        # exactly the apply_merge fold semantics, so kernel == folds is
        # provable (and pinned by test)
        toks = list(word)
        for l_, r_ in merge_seq:
            if len(toks) < 2:
                break
            out = []
            i = 0
            while i < len(toks):
                if i < len(toks) - 1 and toks[i] == l_ and toks[i + 1] == r_:
                    out.append(l_ + r_)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            toks = out
        return toks

    def encode_word(word: str) -> list[str]:
        got = _memo.get(word)
        if got is None:
            got = _memo[word] = _encode_uncached(word)
        return got

    # pretokenize with JAVA \s+ semantics ([ \t\n\x0B\f\r]) to match
    # word_vocab/tokenize exactly — Python str.split() also splits on
    # U+00A0/U+2000-200A etc., which would segment differently from
    # the trained vocabulary on Unicode-whitespace text
    import re

    _java_ws = re.compile("[ \t\n\x0b\f\r]+")

    def run(batches):
        import pandas as pd

        for b in batches:
            toks = b[text_col].map(
                lambda t: [
                    tok
                    for w in _java_ws.split(t or "")
                    if w
                    for tok in encode_word(w)
                ]
            )
            yield pd.DataFrame({id_col: b[id_col], "tokens": toks})

    return docs.select(id_col, text_col).mapInPandas(
        run, f"{id_col} long, tokens array<string>"
    )
