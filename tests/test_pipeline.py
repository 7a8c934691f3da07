"""Invariants for the training-data pipeline operators
(functions/pipeline.py): profiling, splits, shuffle, per-group top-k,
sequence packing. The oracle-backed queries are additionally
hash-checked by tools/check.py; these tests pin the semantic properties
the oracle can't express (determinism, budget invariants, coverage).
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

import minefields_kafka_streams_deduplication_spark as engine

from minefields_kafka_streams_deduplication_spark.functions.pipeline import (
    PACK_BUDGET_TOKENS,
    TOPK_TERMS_PER_LANG,
    pack_sequences,
    profile_lineitem,
    shuffle_deterministic,
    topk_terms_per_lang,
    train_val_split,
)


def test_profile_one_row_per_column(spark, sf_dir):
    rows = {r["col"]: r for r in profile_lineitem(spark, sf_dir).collect()}
    assert set(rows) == {"l_quantity", "l_extendedprice", "l_discount", "l_tax"}
    q = rows["l_quantity"]
    assert q["n"] == q["n_nonnull"] > 0  # fixture has no nulls
    assert q["min_v"] <= q["avg_v"] <= q["max_v"]
    assert q["n_distinct"] <= q["n"]


def test_split_partitions_whole_corpus_and_is_stable(spark, sf_dir):
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    rows = {r["split"]: r["n_docs"] for r in train_val_split(spark, sf_dir).collect()}
    assert sum(rows.values()) == n_docs
    assert rows.get("val", 0) > 0 and rows["train"] > rows.get("val", 0)
    again = {r["split"]: r["n_docs"] for r in train_val_split(spark, sf_dir).collect()}
    assert rows == again  # salt-determined, not RNG-determined


def test_shuffle_is_a_permutation_and_deterministic(spark, sf_dir):
    out = shuffle_deterministic(spark, sf_dir).collect()
    n = len(out)
    assert sorted(r["shuffle_pos"] for r in out) == list(range(1, n + 1))
    by_doc = {r["doc_id"]: r["shuffle_pos"] for r in out}
    again = {
        r["doc_id"]: r["shuffle_pos"] for r in shuffle_deterministic(spark, sf_dir).collect()
    }
    assert by_doc == again
    # A pseudo-random order, not the natural doc_id order.
    ordered = [by_doc[d] for d in sorted(by_doc)]
    assert ordered != sorted(ordered)


def test_topk_terms_respects_k_and_ordering(spark, sf_dir):
    out = topk_terms_per_lang(spark, sf_dir).collect()
    per_lang = defaultdict(list)
    for r in out:
        per_lang[r["lang"]].append((r["freq"], r["token"]))
    for lang, rows in per_lang.items():
        assert len(rows) <= TOPK_TERMS_PER_LANG
        # winners are the top frequencies; verify against a full count
        tf = (
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .filter(F.col("lang") == lang)
            .select(F.explode(F.split(F.lower("text"), " ")).alias("token"))
            .groupBy("token")
            .count()
            .collect()
        )
        expect = sorted(((r["count"], r["token"]) for r in tf), key=lambda t: (-t[0], t[1]))
        got = sorted(rows, key=lambda t: (-t[0], t[1]))
        assert got == expect[: len(rows)]


def test_pack_sequences_invariants(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()
    out = pack_sequences(spark, sf_dir).collect()
    # every doc packed exactly once
    assert len(out) == n_docs
    assert len({r["doc_id"] for r in out}) == n_docs
    fills = defaultdict(int)
    sizes = defaultdict(int)
    for r in out:
        fills[r["bin_id"]] += r["n_tokens"]
        sizes[r["bin_id"]] += 1
    for b, tot in fills.items():
        # a bin may exceed budget only as a singleton (oversized doc)
        assert tot <= PACK_BUDGET_TOKENS or sizes[b] == 1
    # packing must actually pack (bins ≪ docs at 256-token budget)
    assert len(fills) < n_docs
    again = pack_sequences(spark, sf_dir).collect()
    assert sorted((r["doc_id"], r["bin_id"]) for r in again) == sorted(
        (r["doc_id"], r["bin_id"]) for r in out
    )


def test_dsir_weight_orders_target_like_docs(spark, monkeypatch):
    """A doc made of target-domain (en) vocabulary must outweigh a doc of
    out-of-domain vocabulary under the importance LLR."""
    from minefields_kafka_streams_deduplication_spark.functions import pipeline

    rows = [
        (0, "alpha beta alpha beta", "en", "s", 21),
        (1, "gamma delta gamma delta", "de", "s", 23),
        (2, "alpha beta gamma delta", "de", "s", 22),
    ]
    df = spark.createDataFrame(
        rows, "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"
    )
    monkeypatch.setattr(pipeline, "load_table", lambda s, d, n: df)
    w = {
        r.doc_id: r.dsir_weight
        for r in pipeline.importance_weight_dsir(spark, "ignored").collect()
    }
    # doc 0 is pure target vocab, doc 2 half, doc 1 none.
    assert w[0] > w[2] > w[1]


def test_corpus_pipeline_report_invariants(spark, sf_dir):
    """Stages must chain: docs_out(i) == docs_in(i+1), counts monotone,
    stage-1 parity with the standalone exact dedup."""
    import minefields_kafka_streams_deduplication_spark as engine

    rows = {
        r.stage: r
        for r in engine.get_queries()["corpus_dedup_pipeline_report"](
            spark, sf_dir
        ).collect()
    }
    s1, s2, s3 = (
        rows["1_exact_dedup"],
        rows["2_minhash_near_dedup"],
        rows["3_span_scrub"],
    )
    assert s1.docs_out == s2.docs_in and s2.docs_out == s3.docs_in
    assert s1.docs_in >= s1.docs_out >= s2.docs_out
    assert s1.removed_docs == s1.docs_in - s1.docs_out
    exact = engine.get_queries()["dedup_text_exact"](spark, sf_dir).count()
    assert s1.docs_out == exact
    assert s3.tokens_removed >= 0


def test_unigram_logprob_semantics(spark, sf_dir):
    """avg_nll is positive, bounded by ln(total), and a doc made of the
    corpus's rarest tokens scores higher than one of its most common."""
    import math

    out = engine.get_queries()["doc_unigram_logprob"](spark, sf_dir)
    rows = out.collect()
    docs = engine.load_table(spark, sf_dir, "documents")
    assert len(rows) == docs.count()
    total_tokens = docs.select(
        F.sum(F.size(F.split(F.lower("text"), " "))).alias("n")
    ).collect()[0].n
    assert sum(r.n_tokens for r in rows) == total_tokens
    for r in rows:
        assert 0.0 <= r.avg_nll <= math.log(total_tokens) + 1e-9, r

    # Rank correlation with rarity: the doc whose tokens are rarest on
    # average must not score below the doc whose tokens are commonest.
    tf = (
        docs.select(F.explode(F.split(F.lower("text"), " ")).alias("t"))
        .groupBy("t").count()
    )
    tok = docs.select("doc_id", F.explode(F.split(F.lower("text"), " ")).alias("t"))
    mean_rarity = (
        tok.join(tf, "t")
        .groupBy("doc_id")
        .agg(F.avg(F.log("count")).alias("mean_log_cnt"))
        .collect()
    )
    rarest = min(mean_rarity, key=lambda r: r.mean_log_cnt).doc_id
    commonest = max(mean_rarity, key=lambda r: r.mean_log_cnt).doc_id
    nll = {r.doc_id: r.avg_nll for r in rows}
    assert nll[rarest] >= nll[commonest]


def test_sample_topk_per_group_exact_and_stable(spark, sf_dir):
    """The threshold-pruned sample must equal the naive full-window
    top-K exactly, cap at K per group, and be identical across runs."""
    from pyspark.sql import Window

    from minefields_kafka_streams_deduplication_spark.functions.pipeline import (
        SAMPLE_K,
        SAMPLE_SALT,
    )

    got = engine.get_queries()["sample_topk_per_group"](spark, sf_dir)
    rows = sorted(map(tuple, got.collect()))
    per_group = {}
    for lang, _, _ in rows:
        per_group[lang] = per_group.get(lang, 0) + 1
    sizes = {
        r.lang: r.n
        for r in engine.load_table(spark, sf_dir, "documents")
        .groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    for lang, n in per_group.items():
        assert n == min(SAMPLE_K, sizes[lang])

    naive = (
        engine.load_table(spark, sf_dir, "documents")
        .select(
            "lang",
            "doc_id",
            F.md5(
                F.concat(F.lit(f"{SAMPLE_SALT}:"), F.col("doc_id").cast("string"))
            ).alias("hash"),
        )
        .withColumn(
            "_rn",
            F.row_number().over(Window.partitionBy("lang").orderBy("hash", "doc_id")),
        )
        .filter(F.col("_rn") <= SAMPLE_K)
        .select("lang", "doc_id", "hash")
    )
    assert rows == sorted(map(tuple, naive.collect()))
    assert rows == sorted(map(tuple, got.collect()))  # run-to-run stable


def test_compression_ratio_separates_repetitive_from_noise(spark):
    """The quality-filter contract: repetitive text compresses far
    below prose, high-entropy text barely compresses at all."""
    import random
    import string

    from minefields_kafka_streams_deduplication_spark.functions.pipeline import (
        compression_ratio_batches,
    )
    import pandas as pd

    rng = random.Random(7)
    noise = "".join(rng.choice(string.ascii_letters + string.digits) for _ in range(4000))
    repetitive = "spam ham " * 500
    prose = " ".join(
        rng.choice(["the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog"])
        for _ in range(800)
    )
    pdf = pd.DataFrame({"doc_id": [1, 2, 3], "text": [repetitive, prose, noise]})
    out = pd.concat(list(compression_ratio_batches(iter([pdf])))).set_index("doc_id")
    assert out.loc[1, "ratio"] < out.loc[2, "ratio"] < out.loc[3, "ratio"]
    assert out.loc[1, "ratio"] < 0.05       # pure repetition collapses
    assert out.loc[3, "ratio"] > 0.7        # noise is incompressible
    assert (out["n_bytes"] > 0).all() and (out["n_compressed"] > 0).all()


def test_compression_ratio_query_runs_distributed(spark, sf_dir):
    out = engine.get_queries()["doc_compression_ratio"](spark, sf_dir)
    rows = out.collect()
    n_docs = engine.load_table(spark, sf_dir, "documents").count()
    assert len(rows) == n_docs
    assert all(0 < r.ratio <= 1.5 for r in rows)


def test_vocab_stats_invariants(spark, sf_dir):
    rows = engine.get_queries()["corpus_vocab_stats"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r.vocab_size <= r.n_tokens
        assert 0 <= r.n_hapax <= r.vocab_size
        assert r.top_token_freq >= 1
        assert abs(r.type_token_ratio - r.vocab_size / r.n_tokens) < 1e-6


def test_sample_topk_keeps_null_lang_group(spark, monkeypatch):
    """Review fix: NULL-lang docs must form their own sample group (the
    oracle's PARTITION BY keeps them; a plain equi-join would drop
    them)."""
    from minefields_kafka_streams_deduplication_spark.functions import pipeline

    df = spark.createDataFrame(
        [(i, "t", None if i % 2 else "en", "s", 1) for i in range(10)],
        "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG",
    )
    monkeypatch.setattr(pipeline, "load_table", lambda s, d, n: df)
    rows = pipeline.sample_topk_per_group(spark, "x").collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, set()).add(r.doc_id)
    assert by_lang.get("en") == {0, 2, 4, 6, 8}
    assert by_lang.get(None) == {1, 3, 5, 7, 9}


def test_key_skew_diagnostic_invariants(spark, sf_dir):
    rows = engine.get_queries()["diagnose_key_skew"](spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    ns = [r.n for r in rows]
    assert ns == sorted(ns, reverse=True)
    assert all(0 < r.share <= 1 for r in rows)
    # the heaviest key is at least as skewed as average by definition
    assert rows[0].skew_ratio >= 1.0


def test_shard_balance_within_one_max_doc(spark, sf_dir):
    """Round-robin-by-descending-size guarantees every shard's token
    mass is within max(n_tokens) of every other — the balance property
    the data-loader story depends on."""
    import minefields_kafka_streams_deduplication_spark as engine
    from pyspark.sql import functions as F

    df = engine.get_queries()["shard_balanced_tokens"](spark, sf_dir)
    sums = {
        r.shard_id: r.s
        for r in df.groupBy("shard_id").agg(F.sum("n_tokens").alias("s")).collect()
    }
    max_doc = df.agg(F.max("n_tokens")).first()[0]
    assert len(sums) == 8
    assert max(sums.values()) - min(sums.values()) <= max_doc


def test_mix_temperature_flattens_shares(spark, sf_dir):
    """Temperature re-weighting semantics: weights sum to 1, and α<1
    FLATTENS the distribution — every source below the uniform share
    gains weight (mix_weight > natural_share) and every source above
    it loses. The budget allocation follows the flattened weights."""
    import minefields_kafka_streams_deduplication_spark as engine
    from minefields_kafka_streams_deduplication_spark.functions.pipeline import (
        MIX_SAMPLE_BUDGET,
    )

    rows = engine.get_queries()["mix_temperature_weights"](spark, sf_dir).collect()
    assert len(rows) >= 2
    assert abs(sum(r.mix_weight for r in rows) - 1.0) < 1e-3
    uniform = 1.0 / len(rows)
    for r in rows:
        if r.natural_share < uniform - 1e-6:
            assert r.mix_weight > r.natural_share, r
        elif r.natural_share > uniform + 1e-6:
            assert r.mix_weight < r.natural_share, r
        # mix_weight is published at 4 decimals while budget_docs uses
        # the unrounded weight: bound = 0.5 (floor) + budget * 5e-5
        assert abs(r.budget_docs - r.mix_weight * MIX_SAMPLE_BUDGET) <= 0.5 + MIX_SAMPLE_BUDGET * 5e-5 + 1


def test_chunk_documents_coverage_and_overlap(spark, sf_dir):
    """Chunking invariants: every token of every doc lands in at least
    one chunk (reassembling stride-aligned prefixes reproduces the
    doc), neighbor chunks overlap by W-S tokens, chunk sizes are
    bounded by W, and short docs are exactly one whole chunk."""
    import minefields_kafka_streams_deduplication_spark as engine
    from minefields_kafka_streams_deduplication_spark.functions.pipeline import (
        CHUNK_STRIDE,
        CHUNK_TOKENS,
    )

    rows = engine.get_queries()["chunk_documents"](spark, sf_dir).collect()
    docs = {
        r.doc_id: r.text.split(" ")
        for r in engine.load_table(spark, sf_dir, "documents").collect()
    }
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(docs)
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r.chunk_idx)
        toks = docs[doc_id]
        n = len(toks)
        assert [r.chunk_idx for r in chunks] == list(range(len(chunks)))
        for r in chunks:
            start = r.chunk_idx * CHUNK_STRIDE
            want = toks[start : start + CHUNK_TOKENS]
            assert r.chunk_text.split(" ") == want if want else r.chunk_text == ""
            assert r.n_tokens == len(want) <= CHUNK_TOKENS
        # full coverage: last chunk reaches the end of the doc
        last = chunks[-1]
        assert last.chunk_idx * CHUNK_STRIDE + last.n_tokens == n
        if n <= CHUNK_TOKENS:
            assert len(chunks) == 1 and chunks[0].chunk_text == " ".join(toks)


def test_bigram_logprob_matches_python_reference(spark, monkeypatch):
    """Crafted corpus replayed by a pure-Python interpolated-bigram LM:
    per-doc avg NLL matches to the 4-decimal snap, and a doc made of
    the corpus's dominant transition scores lower (better) than one
    using a rare transition."""
    import math
    from collections import Counter

    from minefields_kafka_streams_deduplication_spark.functions import pipeline

    texts = {0: "a b a b a b", 1: "a c", 2: "a b x y", 3: "q"}
    rows = [(i, t, "en", "s", len(t)) for i, t in texts.items()]
    df = spark.createDataFrame(
        rows, "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"
    )
    monkeypatch.setattr(pipeline, "load_table", lambda s, d, n: df)
    got = {
        r.doc_id: (r.n_bigrams, r.avg_nll)
        for r in pipeline.doc_bigram_logprob(spark, "ignored").collect()
    }

    toks = {i: t.split(" ") for i, t in texts.items()}
    bg = Counter(
        (w1, w2) for tk in toks.values() for w1, w2 in zip(tk, tk[1:])
    )
    left = Counter()
    for (w1, _), c in bg.items():
        left[w1] += c
    uni = Counter(w for tk in toks.values() for w in tk)
    tot = sum(uni.values())
    lam = pipeline.BIGRAM_LAMBDA

    def snap6(x: float) -> float:
        return round(x, 6)  # DECIMAL(18,6) snap of each ln term

    expect = {}
    for i, tk in toks.items():
        prs = list(zip(tk, tk[1:]))
        if not prs:
            continue  # <2 tokens: no bigrams, no row
        s = sum(
            snap6(math.log(lam * (bg[p] / left[p[0]]) + (1 - lam) * (uni[p[1]] / tot)))
            for p in prs
        )
        expect[i] = (len(prs), math.floor(-s / len(prs) * 10000 + 0.5) / 10000)

    assert set(got) == set(expect)  # doc 3 (1 token) absent
    for i in expect:
        assert got[i][0] == expect[i][0]
        assert abs(got[i][1] - expect[i][1]) < 2e-4, (i, got[i], expect[i])
    # dominant transition (a->b x3) beats the rare one (a->c)
    assert got[0][1] < got[1][1]


def test_psi_drift_detects_shift(spark, monkeypatch):
    """A corpus whose second half shifts its value distribution upward
    produces a large PSI; an un-shifted corpus reads ~0. Crafted so
    the halves are unambiguous (integer-µs midpoint split)."""
    import datetime as dt

    from minefields_kafka_streams_deduplication_spark.functions import pipeline

    t0 = dt.datetime(2024, 1, 1)
    schema = (
        "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, "
        "value DOUBLE, props STRING"
    )

    def mk(values_by_minute):
        rows = [
            (i, t0 + dt.timedelta(minutes=m), 1, "x", v, "{}")
            for i, (m, v) in enumerate(values_by_minute)
        ]
        return spark.createDataFrame(rows, schema)

    # shifted: first half clustered low, second half clustered high
    shifted = mk([(m, 5.0 + (m % 3)) for m in range(50)]
                 + [(m, 95.0 - (m % 3)) for m in range(50, 100)])
    monkeypatch.setattr(pipeline, "load_table", lambda s, d, n: shifted)
    rows = pipeline.drift_report_value_psi(spark, "ignored").collect()
    psi = sum(r.psi_term for r in rows)
    assert psi > 1.0  # near-total migration across cells
    assert all(r.n_base + r.n_curr > 0 for r in rows)

    # stable: identical distribution in both halves
    stable = mk([(m, float(m % 10)) for m in range(100)])
    monkeypatch.setattr(pipeline, "load_table", lambda s, d, n: stable)
    rows = pipeline.drift_report_value_psi(spark, "ignored").collect()
    assert sum(r.psi_term for r in rows) < 0.05


def test_expectations_count_violations(spark, monkeypatch):
    """Crafted violations are counted per rule: one out-of-range
    quantity, one null price, one orphan FK on each relationship."""
    import datetime as dt

    from minefields_kafka_streams_deduplication_spark.functions import pipeline

    li = spark.createDataFrame(
        [
            (1, 1, 1, 1, 10.0, 100.0, 0.05, 0.0, "N", "O", dt.date(2024, 1, 1)),
            (1, 2, 1, 2, 99.0, 100.0, 0.05, 0.0, "N", "O", dt.date(2024, 1, 1)),
            (2, 1, 1, 1, 10.0, None, 0.5, 0.0, "N", "O", None),
            (777, 1, 1, 1, 10.0, 100.0, 0.05, 0.0, "N", "O", dt.date(2024, 1, 1)),
        ],
        "l_orderkey LONG, l_partkey LONG, l_suppkey LONG, l_linenumber INT, "
        "l_quantity DOUBLE, l_extendedprice DOUBLE, l_discount DOUBLE, "
        "l_tax DOUBLE, l_returnflag STRING, l_linestatus STRING, l_shipdate DATE",
    )
    orders = spark.createDataFrame(
        [(1, 10, "O", 1.0, dt.date(2024, 1, 1), "1-URGENT"),
         (2, 999, "O", 1.0, dt.date(2024, 1, 1), "1-URGENT")],
        "o_orderkey LONG, o_custkey LONG, o_orderstatus STRING, "
        "o_totalprice DOUBLE, o_orderdate DATE, o_orderpriority STRING",
    )
    customer = spark.createDataFrame(
        [(10, "a", 1, 0.0)], "c_custkey LONG, c_name STRING, c_nationkey LONG, c_acctbal DOUBLE"
    )
    tables = {"lineitem": li, "orders": orders, "customer": customer}
    monkeypatch.setattr(pipeline, "load_table", lambda s, d, n: tables[n])
    got = {r.rule: (r.n_checked, r.n_violations)
           for r in pipeline.validate_expectations(spark, "x").collect()}
    assert got["lineitem.quantity_in_1_50"] == (4, 1)
    assert got["lineitem.discount_in_0_0.1"] == (4, 1)
    assert got["lineitem.extendedprice_positive"] == (4, 1)
    assert got["lineitem.shipdate_not_null"] == (4, 1)
    assert got["lineitem.orderkey_refs_orders"] == (4, 1)   # orderkey 777
    assert got["orders.custkey_refs_customer"] == (2, 1)    # custkey 999


def test_weighted_sample_inclusion_tracks_weight(spark):
    """Across 40 independent salts, a doc with 50x the weight of its
    peers is included far more often — inclusion probability tracks
    weight. Also: deterministic per salt, K rows, no duplicates."""
    from minefields_kafka_streams_deduplication_spark.functions.pipeline import (
        weighted_sample,
    )

    rows = [(i, "t", "en", "s", 1000 if i < 5 else 20) for i in range(100)]
    docs = spark.createDataFrame(
        rows, "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"
    )
    heavy_hits = light_hits = 0
    for s in range(40):
        got = [r.doc_id for r in weighted_sample(docs, 10, f"salt{s}").collect()]
        assert len(got) == 10 and len(set(got)) == 10
        again = [r.doc_id for r in weighted_sample(docs, 10, f"salt{s}").collect()]
        assert got == again  # deterministic per salt
        heavy_hits += sum(1 for d in got if d < 5)
        light_hits += sum(1 for d in got if d >= 5)
    # 5 heavy docs (w=1000) vs 95 light (w=20): heavy inclusion ~1.0,
    # light ~ (10-5)/95. Expect heavy_hits ≈ 200, light ≈ 200; assert
    # the heavy RATE dominates by a wide, flake-proof margin.
    heavy_rate = heavy_hits / (40 * 5)
    light_rate = light_hits / (40 * 95)
    assert heavy_rate > 0.8
    assert heavy_rate > 5 * light_rate


def test_ks_drift_detects_shift(spark, monkeypatch):
    """The KS statistic reads ~1 for disjoint halves, ~0 for identical
    halves — and catches a within-cell shift PSI's equal-width binning
    can miss."""
    import datetime as dt

    from minefields_kafka_streams_deduplication_spark.functions import pipeline

    t0 = dt.datetime(2024, 1, 1)
    schema = (
        "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, "
        "value DOUBLE, props STRING"
    )

    def mk(vals):
        return spark.createDataFrame(
            [(i, t0 + dt.timedelta(minutes=m), 1, "x", v, "{}")
             for i, (m, v) in enumerate(vals)],
            schema,
        )

    disjoint = mk([(m, float(m % 7)) for m in range(50)]
                  + [(m, 100.0 + m % 7) for m in range(50, 100)])
    monkeypatch.setattr(pipeline, "load_table", lambda s, d, n: disjoint)
    r = pipeline.drift_report_value_ks(spark, "x").collect()[0]
    assert r.ks_stat == 1.0 and r.n_base == 50 and r.n_curr == 50

    stable = mk([(m, float(m % 10)) for m in range(100)])
    monkeypatch.setattr(pipeline, "load_table", lambda s, d, n: stable)
    r = pipeline.drift_report_value_ks(spark, "x").collect()[0]
    assert r.ks_stat < 0.1
