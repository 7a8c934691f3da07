"""Unigram-LM tokenizer trainer (functions/unigram_lm.py) — VERDICT r5
#5. Pins: Viterbi vs brute-force enumeration (independent
implementation), the full distributed trainer vs a pure-Python
reference trainer (same spec, no Spark), coverage/determinism
invariants on Hypothesis corpora, and the registered queries' shapes.
"""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st

import minefields_kafka_streams_deduplication_spark as engine
from minefields_kafka_streams_deduplication_spark.functions.unigram_lm import (
    UNIGRAM_SEED_FACTOR,
    _TIE_EPS,
    unigram_encode,
    unigram_train,
    unigram_viterbi,
)


# --- pure-Python reference implementations (no Spark, independent) ----------


def _ref_segmentations(word, vocab):
    """ALL segmentations of word into vocab pieces (brute force)."""
    if word == "":
        return [[]]
    out = []
    for i in range(1, len(word) + 1):
        head = word[:i]
        if head in vocab:
            for rest in _ref_segmentations(word[i:], vocab):
                out.append([head] + rest)
    return out


def _ref_viterbi(word, scores, max_len):
    """Brute-force best segmentation under the shared tie rule:
    (score desc with eps, fewer pieces, then longest-prefix-first
    lexicographic preference ~ longer last piece via recursive order)."""
    segs = [
        s
        for s in _ref_segmentations(word, set(scores))
        if all(len(p) <= max_len for p in s)
    ]
    if not segs:
        return None

    def key(s):
        return (sum(scores[p] for p in s), -len(s))

    best = None
    for s in segs:
        if best is None:
            best = s
            continue
        ks, kb = key(s), key(best)
        if ks[0] > kb[0] + _TIE_EPS:
            best = s
        elif abs(ks[0] - kb[0]) <= _TIE_EPS:
            if ks[1] > kb[1]:
                best = s
            elif ks[1] == kb[1]:
                # longer last piece preferred
                if len(s[-1]) > len(best[-1]):
                    best = s
    return best


def _ref_train(texts, vocab_size, max_len, em_rounds, prune_frac):
    """Pure-Python replica of unigram_train's spec (seed → EM → prune),
    driven from a plain word-count dict."""
    words = {}
    for t in texts:
        for w in t.lower().split(" "):
            if w:
                words[w] = words.get(w, 0) + 1
    # seed
    sub_w = {}
    for w, c in words.items():
        for i in range(len(w)):
            for j in range(i + 1, min(len(w), i + max_len) + 1):
                p = w[i:j]
                sub_w[p] = sub_w.get(p, 0) + c
    multi = sorted(
        ((p, c) for p, c in sub_w.items() if len(p) > 1),
        key=lambda x: (-x[1], x[0]),
    )[: vocab_size * UNIGRAM_SEED_FACTOR]
    seed = dict(multi) | {p: c for p, c in sub_w.items() if len(p) == 1}
    total = sum(seed.values())
    scores = {p: math.log(c / total) for p, c in seed.items()}

    def estep(scores):
        counts = {}
        for w, wc in words.items():
            seg = unigram_viterbi(w, scores, max_len)  # shared DP (pinned
            # separately against _ref_viterbi)
            if seg is None:
                continue
            for p in seg:
                counts[p] = counts.get(p, 0) + wc
        return counts

    while True:
        counts = {}
        for _ in range(em_rounds):
            counts = estep(scores)
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
        target_multi = max(vocab_size - n_chars, 0)
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
            counts = estep(scores)
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


# --- Viterbi vs brute force -------------------------------------------------


@given(
    st.text(alphabet="abc", min_size=1, max_size=8),
    st.integers(min_value=1, max_value=97),
)
@settings(max_examples=80, deadline=None)
def test_viterbi_matches_bruteforce(word, seed):
    """DP Viterbi == brute-force enumeration under the shared tie rule,
    on random small vocabularies over random words."""
    import random

    rng = random.Random(seed)
    pieces = {"a", "b", "c"}  # coverage
    for _ in range(rng.randint(0, 6)):
        ln = rng.randint(2, 4)
        pieces.add("".join(rng.choice("abc") for _ in range(ln)))
    # integer-ratio log scores: deterministic, no adversarial float ties
    scores = {p: math.log(rng.randint(1, 50) / 100.0) for p in sorted(pieces)}
    got = unigram_viterbi(word, scores, max_len=4)
    ref = _ref_viterbi(word, scores, max_len=4)
    assert got is not None and ref is not None
    assert "".join(got) == word
    got_score = sum(scores[p] for p in got)
    ref_score = sum(scores[p] for p in ref)
    assert abs(got_score - ref_score) <= 1e-9, (word, got, ref)
    assert len(got) == len(ref), (word, got, ref)


def test_viterbi_prefers_probable_pieces():
    scores = {"a": math.log(0.05), "b": math.log(0.05), "ab": math.log(0.9)}
    assert unigram_viterbi("abab", scores, 4) == ["ab", "ab"]
    # unreachable word -> None
    assert unigram_viterbi("abc", scores, 4) is None


# --- distributed trainer vs pure-Python reference ---------------------------


def test_trainer_matches_python_reference(spark):
    """The distributed trainer's final vocabulary AND log-probs equal
    the pure-Python reference trainer's on a crafted corpus (float
    tolerance: summation order only)."""
    texts = [
        "the cat sat on the mat",
        "the cats sat on the mats",
        "a cat and a mat and a hat",
        "hats and mats and cats",
        "the hat the mat the cat",
    ] * 3
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id LONG, text STRING"
    )
    got = unigram_train(docs, vocab_size=20, max_len=4, em_rounds=2)
    ref = _ref_train(texts, vocab_size=20, max_len=4, em_rounds=2,
                     prune_frac=0.25)
    assert set(got) == set(ref), (set(got) ^ set(ref))
    for p in got:
        assert abs(got[p] - ref[p]) < 1e-9, (p, got[p], ref[p])
    # normalization: piece probs sum to 1
    assert abs(sum(math.exp(s) for s in got.values()) - 1.0) < 1e-9


def test_trainer_learns_frequent_subwords(spark):
    """On a corpus dominated by a repeated subword, that subword must
    survive training as a multi-char piece."""
    texts = ["walking talking marking parking"] * 10
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id LONG, text STRING"
    )
    vocab = unigram_train(docs, vocab_size=12, max_len=4, em_rounds=2)
    assert any("king" in p or p == "king" for p in vocab if len(p) > 1), vocab


@given(
    st.lists(
        st.text(alphabet="abcd ", min_size=1, max_size=30),
        min_size=1,
        max_size=6,
    )
)
@settings(max_examples=15, deadline=None)
def test_trainer_invariants_on_random_corpora(spark, corpus):
    """Hypothesis invariants: every corpus word re-segments EXACTLY
    (coverage — single chars never pruned), probs normalize, and the
    vocabulary respects the target size bound for multi-char pieces."""
    rows = [(i, t) for i, t in enumerate(corpus)]
    words = {w for t in corpus for w in t.lower().split(" ") if w}
    if not words:
        return
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    vocab = unigram_train(docs, vocab_size=10, max_len=3, em_rounds=1)
    assert abs(sum(math.exp(s) for s in vocab.values()) - 1.0) < 1e-9
    chars = {c for w in words for c in w}
    assert chars <= set(vocab)  # coverage chars all present
    for w in words:
        seg = unigram_viterbi(w, vocab, 3)
        assert seg is not None and "".join(seg) == w


def test_registered_queries_shapes(spark, sf_dir):
    """unigram_train_vocab / unigram_encode_nll over the fixture:
    deterministic across reruns, encode conserves characters."""
    v1 = engine.get_queries()["unigram_train_vocab"](spark, sf_dir).collect()
    v2 = engine.get_queries()["unigram_train_vocab"](spark, sf_dir).collect()
    assert [(r.piece, r.logprob) for r in v1] == [(r.piece, r.logprob) for r in v2]
    assert len(v1) > 0 and all(r.logprob < 0 for r in v1)

    enc = engine.get_queries()["unigram_encode_nll"](spark, sf_dir).first()
    assert enc.pieces_after >= enc.words_before  # pieces at least split words
    assert enc.corpus_nll > 0
    assert enc.vocab_size == len(v1)


def test_encode_reconstructs_words(spark):
    """Per-doc encode: concatenating each word's pieces reproduces the
    word — checked via character conservation per document."""
    texts = ["hello world", "hello there world", "worldly things"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id LONG, text STRING"
    )
    vocab = unigram_train(docs, vocab_size=15, max_len=4, em_rounds=1)
    out = {r.doc_id: r for r in unigram_encode(docs, vocab).collect()}
    for i, t in enumerate(texts):
        assert "".join(out[i].pieces) == t.lower().replace(" ", "")


def test_encode_charges_oov_penalty(spark):
    """ADVICE r6: out-of-vocab byte-fallback chars must be charged a
    real penalty (the worst in-vocab log-prob), not log-prob 0 — an
    OOV doc must carry a HIGHER NLL than an in-vocab doc of the same
    length, never a deflated one."""
    vocab = {"a": -1.0, "b": -2.0, "ab": -0.5}
    docs = spark.createDataFrame(
        [(0, "ab ab"), (1, "zq zq")],  # z, q nowhere in the vocab
        "doc_id LONG, text STRING",
    )
    from minefields_kafka_streams_deduplication_spark.functions.unigram_lm import unigram_encode

    out = {r.doc_id: r for r in unigram_encode(docs, vocab).collect()}
    assert out[0].nll == 1.0  # two 'ab' pieces at -0.5
    # each OOV char pays the floor (-2.0): 4 chars -> nll 8, not 0
    assert out[1].nll == 8.0
    assert out[1].nll > out[0].nll
