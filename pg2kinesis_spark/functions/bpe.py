"""Byte-pair-encoding subword tokenizer — learned on the corpus, applied
with DataFrame operators.

The word-level vocabulary in :mod:`vocab` systematically misestimates
real LLM token budgets (one id per word regardless of length; one id per
*character* for OOV). This module learns a BPE merge table (Sennrich et
al. 2016, "Neural Machine Translation of Rare Words with Subword Units")
and produces budget-true subword token counts for
``token_budget_select`` / ``pack_sequences`` / ``materialize_corpus``.

Scale design
------------
BPE training famously operates on the *word-frequency table*, not the
raw corpus — ``(word, freq)`` pairs are sufficient statistics for every
merge decision. So the distributed part is exactly one shuffle:

* ``learn_bpe``: explode + word-keyed partial-agg count (map-side
  combine), top-``max_word_types`` via ``orderBy(...).limit`` (executed
  as TakeOrderedAndProject — per-partition heaps, no global sort), then
  the classic incremental merge loop runs driver-side over the bounded
  table. At 100 TB the word-type table is a few million rows (Heaps'
  law), i.e. megabytes — collecting it is the correct plan, not a
  driver-side anti-pattern.

* ``bpe_encode`` / ``bpe_token_counts``: the merge loop is inherently
  iterative-per-word, so Python is unavoidable — but it only ever runs
  over the DISTINCT word types (an Arrow-batched pandas_udf on the
  deduplicated word table), never the corpus. The corpus-side plan is
  pure JVM: posexplode -> broadcast join against the (word -> ids) table
  -> positional reassemble, identical discipline to ``vocab.encode``.
  Encoding work is O(|word types|), corpus work is O(|tokens|) in
  whole-stage codegen.

* Determinism: merge ties break on the lexicographically smallest
  (left, right) pair; the word-type cap ties break on the word string —
  the same corpus always yields the same merge table and ids.

The reference (`/root/reference/pg2kinesis`) has no tokenizer at all —
this is north-star pipeline surface, not parity.
"""

from __future__ import annotations

from collections import Counter
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: end-of-word sentinel symbol appended to every word before merging —
#: lets the model learn word-final units ("ing</w>") distinct from
#: word-internal ones ("ing").
EOW = "</w>"
#: id for symbols outside the learned alphabet (characters never seen at
#: learn time). Base-alphabet ids start at 1; merge ids follow.
UNK_ID = 0


@dataclass(frozen=True)
class BpeModel:
    """Learned merge table + deterministic symbol ids.

    ``merges`` is rank-ordered: merges[r] was the r-th most frequent
    pair when it was chosen. ``token_ids`` maps every base character,
    ``EOW``, and every merged symbol to a stable integer id.
    """

    merges: tuple = ()
    token_ids: dict = field(default_factory=dict)

    @property
    def ranks(self) -> dict:
        return {pair: r for r, pair in enumerate(self.merges)}

    def segment_word(self, word: str) -> list:
        """Apply the merge table to one word; returns subword symbols."""
        syms = list(word) + [EOW]
        ranks = self.ranks
        while len(syms) > 1:
            best_rank, best_pair = None, None
            for pair in zip(syms, syms[1:]):
                r = ranks.get(pair)
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_pair = r, pair
            if best_pair is None:
                break
            syms = _merge_once(syms, best_pair)
        return syms

    def encode_word(self, word: str) -> list:
        ids = self.token_ids
        return [ids.get(s, UNK_ID) for s in self.segment_word(word)]

    def to_merges_df(self, spark) -> DataFrame:
        """(rank, left, right) — the model as a table, for persistence."""
        rows = [(r, a, b) for r, (a, b) in enumerate(self.merges)]
        return spark.createDataFrame(rows, ["rank", "left", "right"])


def _merge_once(syms: list, pair: tuple) -> list:
    """Replace every left-to-right occurrence of ``pair`` in ``syms``."""
    out, i, n = [], 0, len(syms)
    a, b = pair
    while i < n:
        if i < n - 1 and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def word_frequencies(
    docs: DataFrame, text_col: str = "text", max_word_types: int = 1_000_000
) -> DataFrame:
    """(w, freq): the BPE sufficient statistic — one shuffle, then a
    TakeOrdered cap so the driver collect is bounded by word TYPES."""
    return (
        docs.select(F.explode(F.split(text_col, " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("w"))
        .limit(max_word_types)
    )


def learn_bpe(
    docs: DataFrame,
    num_merges: int = 200,
    text_col: str = "text",
    max_word_types: int = 1_000_000,
) -> BpeModel:
    """Learn ``num_merges`` BPE merges from the corpus.

    One distributed word-count, then the standard incremental pair-count
    loop over the (word, freq) table. Ties break on the smallest
    (left, right) pair so learning is deterministic.
    """
    wf = [
        (r["w"], r["freq"])
        for r in word_frequencies(docs, text_col, max_word_types).collect()
    ]
    return learn_bpe_from_frequencies(wf, num_merges)


def learn_bpe_from_frequencies(word_freqs: list, num_merges: int) -> BpeModel:
    """Driver-side merge learning over a bounded (word, freq) table.

    Incremental bookkeeping (subword-nmt style): a pair -> count
    Counter plus a pair -> {word index} inverted index; each merge
    touches only the words containing the chosen pair.
    """
    words = [list(w) + [EOW] for w, _ in word_freqs]
    freqs = [f for _, f in word_freqs]

    pair_counts: Counter = Counter()
    pair_words: dict = {}
    for idx, syms in enumerate(words):
        f = freqs[idx]
        for pair in zip(syms, syms[1:]):
            pair_counts[pair] += f
            pair_words.setdefault(pair, set()).add(idx)

    # Lazy-deletion max-heap over (-count, pair): a full min() scan of
    # the pair table per merge is O(P) and makes 8k merges over a
    # million-type vocabulary quadratic; the heap pops stale entries
    # until one matches the live count. Heap order (-count, pair)
    # ascending == most frequent pair, ties to the lexicographically
    # smallest (a, b) — identical to the naive scan, and the pure-Python
    # oracle test pins that equivalence.
    import heapq

    heap = [(-cnt, pair) for pair, cnt in pair_counts.items()]
    heapq.heapify(heap)

    merges = []
    for _ in range(num_merges):
        best_pair = None
        while heap:
            neg, pair = heapq.heappop(heap)
            if pair_counts.get(pair) == -neg:
                best_pair = pair
                break
        if best_pair is None:
            break
        merges.append(best_pair)
        for idx in list(pair_words.get(best_pair, ())):
            syms = words[idx]
            f = freqs[idx]
            for pair in zip(syms, syms[1:]):
                pair_counts[pair] -= f
                if pair_counts[pair] <= 0:
                    del pair_counts[pair]
                else:
                    # decrements need a heap entry too: stale higher
                    # counts get discarded on pop, so without this the
                    # pair would become unselectable forever
                    heapq.heappush(heap, (-pair_counts[pair], pair))
                s = pair_words.get(pair)
                if s is not None:
                    s.discard(idx)
                    if not s:
                        del pair_words[pair]
            merged = _merge_once(syms, best_pair)
            words[idx] = merged
            for pair in zip(merged, merged[1:]):
                pair_counts[pair] += f
                pair_words.setdefault(pair, set()).add(idx)
                heapq.heappush(heap, (-pair_counts[pair], pair))

    alphabet = sorted({c for w, _ in word_freqs for c in w} | {EOW})
    token_ids = {s: i + 1 for i, s in enumerate(alphabet)}
    next_id = len(alphabet) + 1
    for a, b in merges:
        tok = a + b
        if tok not in token_ids:
            token_ids[tok] = next_id
            next_id += 1
    return BpeModel(merges=tuple(merges), token_ids=dict(token_ids))


def _word_ids_table(docs: DataFrame, model: BpeModel, text_col: str) -> DataFrame:
    """(w, ids array<int>): BPE applied to DISTINCT word types only —
    the single Python stage, bounded by vocabulary size not corpus size."""
    # plain dicts in the closure — ranks built ONCE, not per word
    ranks, token_ids = model.ranks, model.token_ids

    def _encode_word(word: str) -> list:
        syms = list(word) + [EOW]
        while len(syms) > 1:
            best_rank, best_pair = None, None
            for pair in zip(syms, syms[1:]):
                r = ranks.get(pair)
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_pair = r, pair
            if best_pair is None:
                break
            syms = _merge_once(syms, best_pair)
        return [token_ids.get(s, UNK_ID) for s in syms]

    @F.pandas_udf("array<int>")
    def _enc(words: pd.Series) -> pd.Series:
        return words.map(_encode_word)

    wt = (
        docs.select(F.explode(F.split(text_col, " ")).alias("w"))
        .filter(F.col("w") != "")
        .distinct()
    )
    return wt.withColumn("ids", _enc("w"))


def bpe_encode(
    docs: DataFrame,
    model: BpeModel,
    key_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(key_col, token_ids array<int>): full subword encoding.

    Corpus-side plan is JVM-only — posexplode, broadcast join against
    the word->ids table, positional reassemble. Empty docs yield [].
    """
    words = docs.select(
        key_col, F.posexplode(F.split(text_col, " ")).alias("pos", "w")
    ).filter(F.col("w") != "")
    mapped = words.join(F.broadcast(_word_ids_table(docs, model, text_col)), "w")
    seqs = (
        mapped.select(key_col, "pos", "ids")
        .groupBy(key_col)
        .agg(
            F.flatten(
                F.expr("transform(array_sort(collect_list(struct(pos, ids))), s -> s.ids)")
            ).alias("token_ids")
        )
    )
    return (
        docs.select(key_col)
        .join(seqs, key_col, "left")
        .select(
            key_col,
            F.coalesce("token_ids", F.expr("cast(array() as array<int>)")).alias(
                "token_ids"
            ),
        )
    )


def bpe_token_counts(
    docs: DataFrame,
    model: BpeModel,
    key_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(key_col, n_bpe_tokens): budget-true token counts WITHOUT
    materializing sequences — per-word subword lengths join the exploded
    corpus and partial-aggregate to a per-doc sum. This is the counter
    to feed ``token_budget_select`` / ``pack_sequences``."""
    word_n = _word_ids_table(docs, model, text_col).select(
        "w", F.size("ids").alias("n")
    )
    words = docs.select(
        key_col, F.explode(F.split(text_col, " ")).alias("w")
    ).filter(F.col("w") != "")
    per_doc = (
        words.join(F.broadcast(word_n), "w")
        .groupBy(key_col)
        .agg(F.sum("n").alias("n_bpe_tokens"))
    )
    return (
        docs.select(key_col)
        .join(per_doc, key_col, "left")
        .select(
            key_col,
            F.coalesce("n_bpe_tokens", F.lit(0)).cast("long").alias("n_bpe_tokens"),
        )
    )


def save_model(model: BpeModel, path: str) -> None:
    """Persist the learned model as JSON (merges in rank order + ids).
    The model is driver-side metadata — kilobytes to a few megabytes —
    so a plain file is the right container, like MLlib coefficients."""
    import json
    import os

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(
            {"merges": [list(p) for p in model.merges], "token_ids": model.token_ids},
            f,
        )


def load_model(path: str) -> BpeModel:
    import json

    with open(path) as f:
        d = json.load(f)
    return BpeModel(
        merges=tuple(tuple(p) for p in d["merges"]), token_ids=dict(d["token_ids"])
    )


def bpe_decode(
    encoded: DataFrame,
    model: BpeModel,
    key_col: str = "doc_id",
    ids_col: str = "token_ids",
) -> DataFrame:
    """(key_col, text): invert ``bpe_encode`` — ids map back to symbols
    via a broadcast (id, token) join, sequences reassemble positionally,
    EOW markers become word boundaries. Round-trips exactly for any text
    whose characters were all in the learn-time alphabet (UNK is lossy
    by nature). All JVM-side; the id table is vocabulary-bounded."""
    spark = encoded.sparkSession
    id_rows = [(i, t) for t, i in model.token_ids.items()]
    id_df = spark.createDataFrame(id_rows, ["tid", "tok"])
    toks = encoded.select(
        key_col, F.posexplode(ids_col).alias("pos", "tid")
    ).join(F.broadcast(id_df), "tid", "left")
    seqs = (
        toks.select(key_col, "pos", F.coalesce("tok", F.lit("�")).alias("tok"))
        .groupBy(key_col)
        .agg(
            F.expr(
                "concat_ws('', transform(array_sort(collect_list(struct(pos, tok))), s -> s.tok))"
            ).alias("_joined")
        )
        .select(
            key_col,
            F.trim(F.replace(F.col("_joined"), F.lit(EOW), F.lit(" "))).alias("text"),
        )
    )
    return (
        encoded.select(key_col)
        .join(seqs, key_col, "left")
        .select(key_col, F.coalesce("text", F.lit("")).alias("text"))
    )


def bpe_fertility(
    docs: DataFrame,
    model: BpeModel,
    text_col: str = "text",
) -> DataFrame:
    """One row: (n_words, n_bpe_tokens, fertility, chars_per_token) —
    the standard tokenizer-quality metrics (fertility = subword tokens
    per word; lower is better for a fixed vocabulary). Same bounded
    word-type Python stage as the counters; the corpus side is one
    broadcast join + global agg."""
    word_n = _word_ids_table(docs, model, text_col).select(
        "w", F.size("ids").alias("n")
    )
    words = docs.select(F.explode(F.split(text_col, " ")).alias("w")).filter(
        F.col("w") != ""
    )
    return (
        words.join(F.broadcast(word_n), "w")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("n").alias("n_bpe_tokens"),
            F.sum(F.length("w")).alias("_chars"),
        )
        .select(
            "n_words",
            "n_bpe_tokens",
            (F.col("n_bpe_tokens") / F.col("n_words")).alias("fertility"),
            (F.col("_chars") / F.col("n_bpe_tokens")).alias("chars_per_token"),
        )
    )
