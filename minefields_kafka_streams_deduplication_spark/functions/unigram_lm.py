"""Unigram-LM (SentencePiece-style) subword tokenizer trainer.

Kudo 2018 ("Subword Regularization", the SentencePiece unigram model)
beside the BPE trainer in text.py — the other mainstream subword
vocabulary algorithm: pieces carry log-probabilities, a word's
tokenization is its most probable segmentation (Viterbi), and the
vocabulary is learned by EM over piece probabilities with pruning
rounds down to a target size. VERDICT r5 #5.

Distributed shape (the part that matters at 100 TB):

- ALL statistics run over the DISTINCT-WORD table weighted by word
  frequency — Heaps-law (vocabulary-) bounded, never corpus-sized.
  One corpus scan builds (word, count); every EM/prune round after
  that touches only that table.
- E-step: per-word Viterbi segmentation in an Arrow-batched
  ``mapInPandas`` kernel (the piece-score dict rides the closure like
  the BPE merge table — vocabulary-bounded). The kernel emits
  per-batch PARTIAL piece counts (a hand-rolled map-side combine), so
  the shuffle carries piece-count rows, not segmentations.
- M-step: one piece-bounded ``groupBy(piece).sum`` collected to the
  driver to rebuild the score dict (same bounded-driver-state policy
  as ``bpe_train_merges``' one-row-per-round TakeOrdered).
- Pruning: drop the lowest-expected-count pieces (keeping every
  single character so any word stays segmentable) until the target
  vocabulary size — a simplification of Kudo's exact
  likelihood-loss ranking, documented as such.

Determinism: EVERY tie is broken totally — seed/prune selection by
(weight DESC, piece ASC), Viterbi by (score, fewer pieces, longer
last piece) with an epsilon comparator shared with the pure-Python
reference in tests.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query

UNIGRAM_VOCAB_SIZE = 64
UNIGRAM_SEED_MAX_PIECE = 6
UNIGRAM_SEED_FACTOR = 4  # seed vocab = factor x target size
UNIGRAM_EM_ROUNDS = 2
UNIGRAM_PRUNE_FRAC = 0.25
_TIE_EPS = 1e-12

__all__ = [
    "unigram_train",
    "unigram_viterbi",
    "unigram_encode",
    "UNIGRAM_VOCAB_SIZE",
]


def unigram_viterbi(word: str, scores: dict[str, float],
                    max_len: int) -> list[str] | None:
    """Most probable segmentation of ``word`` under piece log-probs.

    DP over end positions; candidate comparison is (higher score, then
    FEWER pieces, then LONGER last piece), with scores within
    ``_TIE_EPS`` treated as equal — a total, float-order-insensitive
    rule the pure-Python test reference shares. Returns None when the
    word cannot be covered (impossible once all single chars are in
    the vocabulary)."""
    n = len(word)
    # dp[i] = (score, n_pieces, pieces) for word[:i]
    dp: list[tuple[float, int, list[str]] | None] = [None] * (n + 1)
    dp[0] = (0.0, 0, [])
    for i in range(1, n + 1):
        best = None
        best_j = -1
        for j in range(max(0, i - max_len), i):
            prev = dp[j]
            if prev is None:
                continue
            piece = word[j:i]
            s = scores.get(piece)
            if s is None:
                continue
            cand = (prev[0] + s, prev[1] + 1)
            if best is None:
                best, best_j = cand, j
                continue
            if cand[0] > best[0] + _TIE_EPS:
                better = True
            elif cand[0] < best[0] - _TIE_EPS:
                better = False
            elif cand[1] != best[1]:
                better = cand[1] < best[1]  # fewer pieces
            else:
                better = j < best_j  # longer last piece
            if better:
                best, best_j = cand, j
        if best is not None:
            dp[i] = (best[0], best[1], dp[best_j][2] + [word[best_j:i]])
    if dp[n] is None:
        return None
    return dp[n][2]


def _word_table(docs: DataFrame) -> DataFrame:
    """(word, wcount) — the Heaps-bounded statistic every round reuses.
    localCheckpoint: the EM loop must not re-scan/re-split the corpus
    per round (the bpe_train_merges lesson), and the one-file fixture
    must fan out before the checkpoint pins partition width."""
    spark = docs.sparkSession
    n_part = spark.sparkContext.defaultParallelism
    return (
        docs.select(F.explode(F.split(F.lower("text"), " ")).alias("word"))
        .where(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wcount"))
        .repartition(n_part, "word")
        .localCheckpoint()
    )


def _seed_scores(words: DataFrame, vocab_size: int, max_len: int) -> dict[str, float]:
    """Seed vocabulary: every substring of length ≤ max_len weighted by
    its containing words' frequencies, top (factor × target) by
    (weight DESC, piece ASC) — plus EVERY single character (coverage
    guarantee). Substring explosion is codegen (sequence × sequence),
    output piece-bounded by the top-K."""
    n_seed = vocab_size * UNIGRAM_SEED_FACTOR
    subs = words.select(
        F.explode(
            F.expr(
                "flatten(transform(sequence(1, char_length(word)),"
                f" i -> transform(sequence(i, least(char_length(word), i + {max_len - 1})),"
                " j -> substring(word, i, j - i + 1))))"
            )
        ).alias("piece"),
        "wcount",
    )
    weighted = subs.groupBy("piece").agg(F.sum("wcount").alias("w"))
    top = weighted.where(F.length("piece") > 1).orderBy(
        F.desc("w"), "piece"
    ).limit(n_seed)
    chars = weighted.where(F.length("piece") == 1)
    rows = top.unionByName(chars).collect()
    total = sum(r.w for r in rows)
    return {r.piece: math.log(r.w / total) for r in rows}


def _estep_counts(words: DataFrame, scores: dict[str, float],
                  max_len: int) -> dict[str, float]:
    """One E-step: Viterbi-segment every distinct word (Arrow kernel),
    return expected piece counts weighted by word frequency. The kernel
    pre-aggregates per batch so the shuffle is piece-bounded."""
    import pandas as pd

    def kernel(batches):
        for pdf in batches:
            acc: dict[str, int] = {}
            for word, wc in zip(pdf["word"], pdf["wcount"]):
                pieces = unigram_viterbi(word, scores, max_len)
                if pieces is None:
                    continue  # unreachable with char coverage
                for p in pieces:
                    acc[p] = acc.get(p, 0) + int(wc)
            yield pd.DataFrame(
                {"piece": list(acc.keys()), "c": list(acc.values())}
            )

    agg = (
        words.mapInPandas(kernel, "piece STRING, c LONG")
        .groupBy("piece")
        .agg(F.sum("c").alias("c"))
        .collect()
    )
    return {r.piece: float(r.c) for r in agg}


def unigram_train(
    docs: DataFrame,
    vocab_size: int = UNIGRAM_VOCAB_SIZE,
    max_len: int = UNIGRAM_SEED_MAX_PIECE,
    em_rounds: int = UNIGRAM_EM_ROUNDS,
    prune_frac: float = UNIGRAM_PRUNE_FRAC,
) -> dict[str, float]:
    """Learn a unigram-LM piece vocabulary with log-probs. Outer loop:
    ``em_rounds`` of (Viterbi E-step → renormalized M-step), then prune
    the lowest-count multi-char pieces (chars are never pruned), until
    the vocabulary reaches ``vocab_size``."""
    words = _word_table(docs)
    scores = _seed_scores(words, vocab_size, max_len)
    while True:
        counts = {}
        for _ in range(em_rounds):
            counts = _estep_counts(words, scores, max_len)
            # chars stay with +1 smoothing so coverage never breaks
            # even when a char drops out of every Viterbi path
            for p in scores:
                if len(p) == 1:
                    counts[p] = counts.get(p, 0.0) + 1.0
            counts = {p: c for p, c in counts.items() if c > 0}
            total = sum(counts.values())
            scores = {p: math.log(c / total) for p, c in counts.items()}
        n_multi = sum(1 for p in scores if len(p) > 1)
        n_chars = len(scores) - n_multi
        if len(scores) <= vocab_size or n_multi == 0:
            break
        # prune: drop the lowest-count multi-char pieces — at least one
        # per round so the loop always terminates
        target_multi = max(
            vocab_size - n_chars, 0
        )
        keep_multi = max(
            min(int(n_multi * (1.0 - prune_frac)), n_multi - 1), target_multi
        )
        ranked = sorted(
            ((p, counts[p]) for p in scores if len(p) > 1),
            key=lambda x: (-x[1], x[0]),
        )
        kept = {p for p, _ in ranked[:keep_multi]}
        scores = {p: s for p, s in scores.items() if len(p) == 1 or p in kept}
        if keep_multi == target_multi:
            # final renormalize over the pruned vocabulary
            counts = _estep_counts(words, scores, max_len)
            for p in scores:
                if len(p) == 1:
                    counts[p] = counts.get(p, 0.0) + 1.0
            total = sum(counts.values())
            scores = {
                p: math.log(counts.get(p, 1.0) / total)
                for p in scores
                if counts.get(p, 0) > 0 or len(p) == 1
            }
            break
    return scores


def unigram_encode(docs: DataFrame, scores: dict[str, float],
                   max_len: int = UNIGRAM_SEED_MAX_PIECE) -> DataFrame:
    """Encode the corpus with a learned vocabulary: per-doc piece
    sequence + count + total NLL. One narrow Arrow kernel pass
    (embarrassingly parallel; the vocabulary ships in the closure).
    Returns (doc_id, pieces, n_pieces, nll)."""
    import pandas as pd

    # OOV floor for byte-fallback chars outside the vocabulary: the
    # worst in-vocabulary log-prob. scores.get(c, 0.0) — log-prob 0,
    # probability 1 — silently DEFLATED the corpus NLL on
    # out-of-vocab text instead of penalizing it (ADVICE r6);
    # SentencePiece charges unk_surface pieces a real penalty too.
    unk_logprob = min(scores.values()) if scores else 0.0

    def kernel(batches):
        for pdf in batches:
            out_pieces, out_n, out_nll = [], [], []
            for toks in pdf["tokens"]:
                pieces: list[str] = []
                nll = 0.0
                for w in toks:
                    seg = unigram_viterbi(w, scores, max_len)
                    if seg is None:
                        seg = list(w)  # byte-fallback analog
                        nll += sum(scores.get(c, unk_logprob) for c in seg)
                    else:
                        nll += sum(scores[p] for p in seg)
                    pieces.extend(seg)
                out_pieces.append(pieces)
                out_n.append(len(pieces))
                out_nll.append(-nll)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "pieces": out_pieces,
                    "n_pieces": out_n,
                    "nll": out_nll,
                }
            )

    n_part = docs.sparkSession.sparkContext.defaultParallelism
    toks = docs.repartition(n_part, "doc_id").select(
        "doc_id", F.split(F.lower("text"), " ").alias("tokens")
    )
    return toks.mapInPandas(
        kernel, "doc_id LONG, pieces ARRAY<STRING>, n_pieces INT, nll DOUBLE"
    )


@query("unigram_train_vocab")  # rows-only: iterative EM training (driver loop)
def unigram_train_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The learned unigram vocabulary over the documents corpus:
    (piece, logprob, piece_len), score-ranked. Deterministic given the
    corpus (all tie-breaks total); semantics pinned against a
    pure-Python reference trainer + Hypothesis corpora in
    tests/test_unigram.py."""
    scores = unigram_train(load_table(spark, sf_dir, "documents"))
    rows = sorted(scores.items(), key=lambda x: (-x[1], x[0]))
    return spark.createDataFrame(
        [(p, float(s), len(p)) for p, s in rows],
        "piece STRING, logprob DOUBLE, piece_len INT",
    )


@query("unigram_encode_nll")  # rows-only: depends on the trained vocabulary
def unigram_encode_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the unigram vocabulary, encode the corpus, and report the
    corpus-level piece count and NLL next to the whitespace-token
    baseline — the tokenizer-evaluation twin of
    ``bpe_encode_compression``."""
    docs = load_table(spark, sf_dir, "documents")
    scores = unigram_train(docs)
    enc = unigram_encode(docs, scores)
    before = F.size(F.split(F.lower("text"), " "))
    orig = docs.select(F.sum(before).alias("words_before"))
    return (
        enc.agg(
            F.sum("n_pieces").alias("pieces_after"),
            F.sum("nll").alias("corpus_nll"),
        )
        .crossJoin(F.broadcast(orig))
        .select(
            F.col("words_before").cast("long").alias("words_before"),
            F.col("pieces_after").cast("long").alias("pieces_after"),
            F.round("corpus_nll", 4).alias("corpus_nll"),
            F.lit(len(scores)).cast("int").alias("vocab_size"),
        )
    )
