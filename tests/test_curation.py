"""Training-data curation operators: paragraph-level exact dedup
(CCNet-style), Gopher repetition/quality gates, PII scrubbing.

All three are pure-Catalyst (no Python rows); these tests pin semantics
on tiny closed-form corpora. The driver queries (dedup_paragraphs,
ta_gopher, ta_pii_scrub) hash-check them against DuckDB at sf0.01.
"""

from pyspark.sql import functions as F

from extract_text_spark.functions import dedup, sampling, text_stats


def test_word_chunks_cover_and_order(spark):
    df = spark.createDataFrame([(1, "a b c d e f g")], "id long, text string")
    (chunks,) = df.select(
        dedup.word_chunks_col("text", k=3).alias("c")).first()
    assert chunks == ["a b c", "d e f", "g"]


def test_paragraph_dedup_first_occurrence_wins(spark):
    rows = [
        (1, ["alpha beta", "dup para", "gamma"]),
        (2, ["dup para", "delta", "dup para"]),      # both copies dropped
        (3, ["dup para"]),                           # whole doc duplicated
    ]
    df = spark.createDataFrame(rows, "doc_id long, paragraphs array<string>")
    got = {r.doc_id: r for r in dedup.paragraph_dedup(df).collect()}
    assert got[1].n_paras == 3 and got[1].n_kept == 3
    assert got[1].text_kept == "alpha beta\n\ndup para\n\ngamma"
    assert got[2].n_paras == 3 and got[2].n_kept == 1
    assert got[2].text_kept == "delta"
    assert got[3].n_paras == 1 and got[3].n_kept == 0
    assert got[3].text_kept == ""                    # all dropped -> empty


def test_paragraph_dedup_within_doc_dedups_too(spark):
    df = spark.createDataFrame(
        [(7, ["same", "same", "other"])],
        "doc_id long, paragraphs array<string>")
    r = dedup.paragraph_dedup(df).first()
    assert r.n_kept == 2 and r.text_kept == "same\n\nother"


def test_gopher_word_stats(spark):
    df = spark.createDataFrame(
        [(1, "aa bbbb # 123 ...")], "doc_id long, text string")
    r = df.select(*(v.alias(k) for k, v in
                    text_stats.gopher_word_cols("text").items())).first()
    assert r.n_words == 5
    # chars: 2+4+1+3+3 = 13 over 5 words
    assert r.mean_word_len_milli == round(13 / 5 * 1e6)
    assert r.symbol_word_ratio_milli == round(2 / 5 * 1e6)
    assert r.alpha_word_frac_milli == round(2 / 5 * 1e6)


def test_gopher_duplicate_lines(spark):
    df = spark.createDataFrame(
        [(1, ["x y", "xx", "x y", "x y", "zz"])],
        "doc_id long, lines array<string>")
    r = df.select(*(v.alias(k) for k, v in
                    text_stats.gopher_dup_line_cols("lines").items())).first()
    assert r.n_lines == 5
    assert r.dup_line_frac_milli == round(2 / 5 * 1e6)
    # dup chars: 3+3 of total 3+2+3+3+2 = 13
    assert r.dup_line_char_frac_milli == round(6 / 13 * 1e6)


def test_gopher_top2gram_mass(spark):
    # "ab cd ab cd ab" -> 2-grams: [ab cd, cd ab, ab cd, cd ab]; top is a
    # tie at cnt=2, both 5 chars -> chars=10 over 14 text chars
    df = spark.createDataFrame([(1, "ab cd ab cd ab")],
                               "doc_id long, text string")
    from extract_text_spark.functions.text_stats import gopher_top_ngram_cols
    r = df.select(*(v.alias(k) for k, v in
                    gopher_top_ngram_cols("text").items())).first()
    assert r.top2gram_char_frac_milli == round(10 / 14 * 1e6)


def test_gopher_keep_gate_composes(spark):
    from extract_text_spark.functions import text_stats as ts
    # genuinely diverse doc: 60 distinct words (a repeated phrase would
    # rightly trip the dup-chunk and top-2-gram gates)
    good = " ".join(f"alpha{i} beta{i}" for i in range(30))
    bad = "spam " * 60                                 # one hot 2-gram
    df = spark.createDataFrame(
        [(1, good.strip()), (2, bad.strip())], "doc_id long, text string")
    df = df.withColumn("lines", dedup.word_chunks_col("text", k=3))
    cols = {**ts.gopher_word_cols("text"),
            **ts.gopher_dup_line_cols("lines"),
            **ts.gopher_top_ngram_cols("text", n=2)}
    cols["keep"] = ts.gopher_keep_col(cols)
    got = {r.doc_id: r.keep for r in df.select(
        "doc_id", *(v.alias(k) for k, v in cols.items())).collect()}
    assert got == {1: True, 2: False}


def test_pii_scrub_counts_and_tokens(spark):
    text = ("mail bob.smith+x@corp.example.com and alice@ex.io, "
            "server 10.2.0.7, call +44-555-0042 now")
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = df.select(*(v.alias(k) for k, v in
                    text_stats.pii_scrub_cols("text").items())).first()
    assert (r.n_emails, r.n_ips, r.n_phones) == (2, 1, 1)
    assert r.scrubbed == ("mail <EMAIL> and <EMAIL>, "
                          "server <IP>, call <PHONE> now")


def test_pii_scrub_email_domain_not_double_counted_as_ip(spark):
    # a dotted-quad inside an email domain must be scrubbed as EMAIL
    df = spark.createDataFrame(
        [(1, "x u@10.1.2.3.example.com y")], "doc_id long, text string")
    r = df.select(*(v.alias(k) for k, v in
                    text_stats.pii_scrub_cols("text").items())).first()
    assert (r.n_emails, r.n_ips) == (1, 0)
    assert r.scrubbed == "x <EMAIL> y"


def test_stratified_sample_deterministic_and_rate(spark):
    from extract_text_spark.functions import sampling
    df = spark.range(0, 4000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("src"), (F.col("id") % 2).cast("string"))
         .alias("source"))
    s = sampling.stratified_sample(
        df, {"src0": 500000, "src1": 100000}, id_col="doc_id")
    a = sorted(r.doc_id for r in s.collect())
    b = sorted(r.doc_id for r in
               s.orderBy(F.rand(7)).repartition(13).collect())
    assert a == b                                    # partitioning-stable
    n0 = sum(1 for i in a if i % 2 == 0)
    n1 = len(a) - n0
    assert abs(n0 / 2000 - 0.5) < 0.05               # ~50% of src0
    assert abs(n1 / 2000 - 0.1) < 0.03               # ~10% of src1


def test_mixture_sample_targets_and_cap(spark):
    """Per-source absolute targets -> capped integer rates; sources over
    their target thin toward it, sources under it keep everything
    (rate cap), unlisted sources drop (mixture = whitelist)."""
    from extract_text_spark.functions import sampling
    df = spark.range(0, 3000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % 3).cast("string"))
         .alias("source"))                           # 1000 docs each
    s = sampling.mixture_sample(
        df, {"s0": 100, "s1": 5000})                 # s2 unlisted
    rows = s.collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r.doc_id)
    assert set(by_src) <= {"s0", "s1"}
    assert abs(len(by_src["s0"]) - 100) < 40         # ~10% rate
    assert len(by_src["s1"]) == 1000                 # capped: keep all
    # partitioning-stable membership
    again = sorted(r.doc_id for r in
                   s.orderBy(F.rand(3)).repartition(7).collect())
    assert again == sorted(r.doc_id for r in rows)


def test_contamination_flags_ngram_overlap(spark):
    rows = [
        (0, "held out eval question about spark"),     # benchmark (id%2==0... pred below)
        (1, "the eval question about spark appears verbatim here"),
        (3, "completely unrelated words only"),
        (5, "x y"),                                    # too short for 3-grams
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.id: (r.n_hits, r.contaminated)
           for r in dedup.contamination_flags(
               df, F.col("doc_id") == 0, n=3).collect()}
    assert 0 not in out                                # bench doc excluded
    assert out[1][1] is True and out[1][0] >= 1        # shares "eval question about"
    assert out[3] == (0, False)
    assert out[5] == (0, False)                        # short doc kept, 0 hits


def test_pack_sequences_contiguous_bins(spark):
    from extract_text_spark.functions import sampling
    df = spark.createDataFrame(
        [(i, 100) for i in range(10)], "doc_id long, n_tokens long")
    out = sampling.pack_sequences(df, "n_tokens", budget=256, buckets=1)
    rows = sorted((r.doc_id, r.pack_bin) for r in out.collect())
    # 100-token docs into 256-token bins: exclusive cumsum // 256
    assert [b for _, b in rows] == [i * 100 // 256 for i in range(10)]
    # an oversized doc overflows its own bin, never dropped
    big = spark.createDataFrame(
        [(1, 50), (2, 9000), (3, 50)], "doc_id long, n_tokens long")
    got = {r.doc_id: r.pack_bin for r in sampling.pack_sequences(
        big, "n_tokens", budget=256, buckets=1).collect()}
    assert got[1] == 0 and got[2] == 0 and got[3] == (50 + 9000) // 256


def test_curation_plans_stay_jvm_side(spark):
    """ta_gopher / ta_pii_scrub are single-scan codegen plans — no
    Python evaluation, no exchange (beyond the final orderBy sort)."""
    from extract_text_spark import queries
    for name in ("ta_gopher", "ta_pii_scrub"):
        plan = queries.QUERIES[name](
            spark, "/root/testdata/sf0.001")._jdf.queryExecution() \
            .executedPlan().toString()
        assert "InMemoryTableScan" in plan or "Scan parquet" in plan
        assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


def test_gopher_top2gram_bounded_on_book_length_doc(spark):
    """The top-n-gram stat must be O(L log L) in-row, not O(L^2): a
    50k-word doc was ~2.5e9 lambda evaluations under the old per-gram
    filter (one unsplittable multi-minute task); the sorted run-length
    aggregate finishes in seconds. The value stays closed-form: 'w0 w1
    ... w49999 REP REP ... REP' -> top 2-gram 'REP REP' (cnt 99)."""
    import time
    from extract_text_spark.functions.text_stats import gopher_top_ngram_cols
    words = [f"w{i}" for i in range(50_000)] + ["REP"] * 100
    text = " ".join(words)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    t0 = time.monotonic()
    r = df.select(*(v.alias(k) for k, v in
                    gopher_top_ngram_cols("text").items())).first()
    elapsed = time.monotonic() - t0
    assert r.top2gram_char_frac_milli == round(99 * 7 / len(text) * 1e6)
    # generous bound for the oversubscribed host; the quadratic form
    # took minutes on this doc
    assert elapsed < 60, f"top-2-gram took {elapsed:.1f}s on 50k words"


def test_exact_substring_dedup_first_occurrence_wins(spark):
    """Lee-et-al exact substring dedup: duplicated k-token windows are
    stripped from every occurrence except the corpus-first (doc_id, pos);
    overlapping removed windows merge through the coverage mask."""
    rows = [
        (1, "a b c d e f g h"),
        (2, "x y a b c d e f z"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r
           for r in dedup.exact_substring_dedup(df, k=4).collect()}
    assert got[1].text_kept == "a b c d e f g h"   # corpus-first copy intact
    assert got[1].n_dup_windows == 0
    # doc 2 re-uses doc 1's "a b c d e f": dup windows at pos 2,3,4 merge
    # to cover tokens 2..7
    assert got[2].text_kept == "x y z"
    assert got[2].n_removed_tokens == 6
    assert got[2].n_dup_windows == 3
    assert got[2].n_windows == 6 and got[2].n_tokens == 9


def test_exact_substring_dedup_identical_docs(spark):
    df = spark.createDataFrame(
        [(1, "p q r s t"), (2, "p q r s t")], "doc_id long, text string")
    got = {r.doc_id: r
           for r in dedup.exact_substring_dedup(df, k=4).collect()}
    assert got[1].text_kept == "p q r s t" and got[1].n_removed_tokens == 0
    assert got[2].text_kept == "" and got[2].n_removed_tokens == 5


def test_exact_substring_dedup_within_doc(spark):
    df = spark.createDataFrame(
        [(3, "m n o p m n o p")], "doc_id long, text string")
    r = dedup.exact_substring_dedup(df, k=4).first()
    # the second "m n o p" duplicates the window at pos 0
    assert r.text_kept == "m n o p"
    assert r.n_removed_tokens == 4 and r.n_dup_windows == 1


def test_exact_substring_dedup_short_doc_untouched(spark):
    df = spark.createDataFrame([(5, "a b c")], "doc_id long, text string")
    r = dedup.exact_substring_dedup(df, k=4).first()
    assert r.n_windows == 0 and r.n_removed_tokens == 0
    assert r.text_kept == "a b c"


def test_exact_substring_dedup_linear_on_book_length_doc(spark):
    """The coverage mask is k pre-shifted zip_with passes — O(k*T) per
    doc. A 50k-word doc sharing a 1000-token run must finish in seconds
    (a per-token membership scan would be O(T*D) ~ 5e7 lambda evals)."""
    import time
    base = " ".join(f"w{i}" for i in range(50_000))
    copy = " ".join([f"u{i}" for i in range(100)]
                    + [f"w{i}" for i in range(1000, 2000)]
                    + [f"v{i}" for i in range(100)])
    df = spark.createDataFrame(
        [(1, base), (2, copy)], "doc_id long, text string")
    t0 = time.monotonic()
    got = {r.doc_id: r
           for r in dedup.exact_substring_dedup(df, k=4).collect()}
    elapsed = time.monotonic() - t0
    assert got[1].n_removed_tokens == 0              # corpus-first
    assert got[2].n_removed_tokens == 1000           # exactly the w-run
    assert got[2].n_dup_windows == 997
    assert elapsed < 60, f"substring dedup took {elapsed:.1f}s"


def test_rarity_score_inverse_frequency(spark):
    """rarity = (1e6 * N_total) div count(token), summed exactly; mean is
    one double division (the CCNet perplexity-filter shape, log-free)."""
    df = spark.createDataFrame(
        [(1, "a a a"), (2, "b")], "doc_id long, text string")
    got = {r.doc_id: r for r in text_stats.rarity_score(df).collect()}
    assert got[1].n_tokens == 3
    assert got[1].rarity_sum == 3 * (4_000_000 // 3)   # common token: low
    assert got[2].rarity_sum == 4_000_000              # rare token: high
    assert got[2].rarity_mean == 4_000_000.0
    # the web-scale fallback (vocab too big to broadcast) drops the
    # explicit broadcast HINT (no unconditional driver collect; the
    # optimizer is free to pick the join strategy from actual sizes)
    # and must produce identical values
    shuf = text_stats.rarity_score(df, broadcast_vocab=False)
    assert {r.doc_id: (r.rarity_sum, r.n_tokens)
            for r in shuf.collect()} == {
        k: (v.rarity_sum, v.n_tokens) for k, v in got.items()}


def test_bm25_integer_exact(spark):
    """BM25 closed form on a 3-doc corpus: hand-computed integer chain
    (idf/rel/norm/denom/term all exact integral divisions)."""
    df = spark.createDataFrame(
        [(1, "join join filter"), (2, "join scan scan scan"),
         (3, "scan scan")],
        "doc_id long, text string")
    got = {r.doc_id: r
           for r in text_stats.bm25_score(df, ["join", "filter"]).collect()}
    # corpus: N=3 docs, A=9 tokens. doc1 dl=3: rel=(1e6*3*3)//9=1000000,
    # norm=250000+750000*1000000//1000000=1000000,
    # k1norm=1200000*1000000//1000000=1200000
    # join: df=2, idf=(3e6)//2=1500000, tf=2:
    #   denom=2000000+1200000=3200000
    #   term=1500000*2*2200000//3200000=2062500
    # filter: df=1, idf=3000000, tf=1: denom=1000000+1200000=2200000
    #   term=3000000*1*2200000//2200000=3000000
    assert got[1].bm25_milli == 2062500 + 3000000
    assert got[1].n_query_terms == 2 and got[1].n_tokens == 3
    # doc2 dl=4: rel=(1e6*4*3)//9=1333333,
    # norm=250000+750000*1333333//1000000=250000+999999=1249999
    # k1norm=1200000*1249999//1000000=1499998
    # join tf=1: denom=1000000+1499998=2499998
    #   term=1500000*1*2200000//2499998=1320001
    assert got[2].bm25_milli == 1320001 and got[2].n_query_terms == 1
    # doc3: no query terms -> zero score, still present (LEFT join)
    assert got[3].bm25_milli == 0 and got[3].n_query_terms == 0
    assert got[3].n_tokens == 2


def test_split_assign_deterministic(spark):
    """Split assignment is a pure function of (salt, id): stable across
    reruns, disjoint cumulative ranges, corpus growth never reassigns."""
    df = spark.createDataFrame([(i,) for i in range(400)], "doc_id long")
    out = sampling.split_assign(
        df, {"test": 100000, "val": 150000}).collect()
    by = {r.doc_id: r.split for r in out}
    assert set(by.values()) == {"train", "val", "test"}
    # growth invariance: the first 200 ids keep their assignment
    small = {r.doc_id: r.split
             for r in sampling.split_assign(
                 df.filter("doc_id < 200"),
                 {"test": 100000, "val": 150000}).collect()}
    assert all(by[i] == small[i] for i in range(200))
    # ranges are cumulative and exclusive: bucket<100k test, <250k val
    from extract_text_spark.functions.sampling import hash_bucket_col
    import pyspark.sql.functions as F
    b = {r.doc_id: r.b for r in df.select(
        "doc_id", hash_bucket_col("doc_id", salt="split").alias("b"))
        .collect()}
    for i, s in by.items():
        want = ("test" if b[i] < 100000
                else "val" if b[i] < 250000 else "train")
        assert s == want
    # over-allocated fractions are a loud error
    import pytest as _pytest
    with _pytest.raises(ValueError):
        sampling.split_assign(df, {"a": 900000, "b": 200000}).collect()


def test_c4_cols_line_rules(spark):
    """C4 line filter: terminal punctuation + >=3 words + no javascript;
    the page drops when kept text has <5 sentences."""
    lines = ["Good line one here.", "too short.", "no terminal punct",
             "javascript is bad.", "Another fine line stays!",
             "Held? Yes kept here."]
    df = spark.createDataFrame([(1, lines)],
                               "doc_id long, lines array<string>")
    stats = text_stats.c4_cols("lines")
    r = df.select(*[v.alias(k) for k, v in stats.items()]).first()
    assert r.n_lines == 6 and r.n_kept_lines == 3
    assert r.text_kept == ("Good line one here.\n"
                           "Another fine line stays!\n"
                           "Held? Yes kept here.")
    assert r.n_sentences == 4          # . ! ? . across the kept lines
    assert not r.keep                  # <5 sentences -> page dropped


def test_c4_cols_page_rules(spark):
    good = [f"Sentence number {i} right here." for i in range(5)]
    rows = [
        (2, good),                                     # clean page
        (3, good + ["brace { here."]),                 # curly brace
        (4, good + ["We have Lorem Ipsum included."]), # lorem ipsum (ci)
    ]
    df = spark.createDataFrame(rows, "doc_id long, lines array<string>")
    stats = text_stats.c4_cols("lines")
    got = {r.doc_id: r for r in
           df.select("doc_id",
                     *[v.alias(k) for k, v in stats.items()]).collect()}
    assert got[2].keep and got[2].n_sentences == 5
    assert got[3].has_brace and not got[3].keep
    assert got[4].has_lorem and not got[4].keep


def test_exact_substring_dedup_matches_python_reference(spark):
    """Seeded random corpus (tiny vocabulary -> dense window collisions,
    within- and cross-doc) checked row-for-row against an independent
    pure-Python implementation of the same first-occurrence-wins rule."""
    import random

    rng = random.Random(1234)
    vocab = [f"w{i}" for i in range(10)]
    docs = {i: " ".join(rng.choice(vocab)
                        for _ in range(rng.randint(1, 25)))
            for i in range(40)}
    k = 4

    toks = {i: t.split(" ") for i, t in docs.items()}
    occ = {}
    for i in sorted(docs):
        for p in range(len(toks[i]) - k + 1):
            occ.setdefault(" ".join(toks[i][p:p + k]), []).append((i, p))
    flagged = {i: set() for i in docs}
    for lst in occ.values():
        if len(lst) > 1:
            first = min(lst)
            for (i, p) in lst:
                if (i, p) != first:
                    flagged[i].add(p)
    expect = {}
    for i in sorted(docs):
        covered = [False] * len(toks[i])
        for p in flagged[i]:
            for j in range(p, p + k):
                covered[j] = True
        expect[i] = (
            len(toks[i]), max(len(toks[i]) - k + 1, 0), len(flagged[i]),
            sum(covered),
            " ".join(t for t, c in zip(toks[i], covered) if not c))

    df = spark.createDataFrame(list(docs.items()),
                               "doc_id long, text string")
    got = {r.doc_id: (r.n_tokens, r.n_windows, r.n_dup_windows,
                      r.n_removed_tokens, r.text_kept)
           for r in dedup.exact_substring_dedup(df, k=k).collect()}
    assert got == expect


def test_quality_classifier_closed_form(spark):
    """Hashed-feature linear classifier: unigrams and bigrams both score
    (with multiplicity), unmatched features contribute weight 0 but still
    count in the mean, single-token docs have no bigram."""
    from extract_text_spark.functions.text_stats import (
        classifier_bucket_col, quality_classifier)

    seeds = [("the", 400), ("a", 250), ("slow", -350), ("scan", -200),
             ("fast table", 500)]
    w = spark.createDataFrame(seeds, "feat string, w long").select(
        classifier_bucket_col(F.col("feat"), 1 << 20).alias("bucket"), "w")
    docs = spark.createDataFrame(
        [(1, "the the a"),     # 3 uni + 2 bi; sum 400+400+250 = 1050
         (2, "slow scan"),     # 2 uni + 1 bi; sum -550
         (3, "fast table"),    # bigram feature fires: sum +500
         (4, "x")],            # single token: no bigram, n=1
        "doc_id long, text string")
    got = {r.doc_id: r for r in quality_classifier(
        docs, w, nbuckets=1 << 20, threshold_milli=0).collect()}
    assert (got[1].n_features, got[1].logit_sum) == (5, 1050)
    assert got[1].logit_milli == 210000000 and got[1].keep
    assert (got[2].n_features, got[2].logit_sum) == (3, -550)
    assert got[2].logit_milli == -183333333 and not got[2].keep
    assert (got[3].n_features, got[3].logit_sum) == (3, 500)
    assert got[3].logit_milli == 166666667 and got[3].keep
    assert (got[4].n_features, got[4].logit_sum) == (1, 0)
    assert got[4].logit_milli == 0 and got[4].keep


def test_dsir_sample_upweights_unseen_in_domain_docs(spark):
    """The point of DSIR: docs that LOOK like the target domain but were
    never in the target sample score the same importance as target docs,
    and out-of-domain docs score far lower; resampling is deterministic
    (pure hash membership, rerun-identical)."""
    from extract_text_spark.functions import sampling
    rows = []
    for i in range(60):
        dom = ("proton neutron electron field theory" if i % 3 == 0
               else "recipe butter flour sugar oven")
        rows.append((i, dom + " shared tail"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # target = only EVEN in-domain docs; odd in-domain docs are unseen
    target = docs.filter((F.col("doc_id") % 3 == 0)
                         & (F.col("doc_id") % 2 == 0))
    out = {r.doc_id: r for r in sampling.dsir_sample(
        docs, target, nbuckets=2048, mult_milli=500000).collect()}
    seen = out[0].importance_milli
    unseen = out[3].importance_milli          # in-domain, not in target
    outside = out[1].importance_milli
    assert seen == unseen                     # same text -> same weight
    assert unseen > 3 * outside
    rerun = {r.doc_id: r.keep for r in sampling.dsir_sample(
        docs, target, nbuckets=2048, mult_milli=500000).collect()}
    assert rerun == {k: v.keep for k, v in out.items()}
    assert all(r.n_features == 13 for r in out.values())  # 7 uni + 6 bi


def test_bpe_merge_word_rank_precedence_and_rounds():
    ranks = {("a", "b"): 0, ("ab", "c"): 1, ("b", "c"): 2}
    # lowest rank wins even when a later pair appears first in the word
    assert text_stats.bpe_merge_word("abc", ranks) == ("abc",)
    # each round merges EVERY occurrence of the chosen pair
    assert text_stats.bpe_merge_word("abab", {("a", "b"): 0}) == ("ab", "ab")
    # no known pair -> untouched character split
    assert text_stats.bpe_merge_word("xyz", ranks) == ("x", "y", "z")
    assert text_stats.bpe_merge_word("", ranks) == ()


def test_bpe_encode_df_matches_pretokenizer_and_python(spark):
    from extract_text_spark.queries import BPE_MERGES
    docs = spark.createDataFrame(
        [(0, "low lower"), (1, "don't stop now"), (2, ""), (3, "42!!")],
        "doc_id long, text string")
    out = {r.doc_id: r for r in
           text_stats.bpe_encode_df(docs, BPE_MERGES).collect()}
    # n_pretokens always equals the cheap Catalyst count column
    counts = {str(r.doc_id): r.n for r in docs.select(
        "doc_id", text_stats.bpe_token_count_col("text").alias("n")
    ).collect()}
    assert {k: v.n_pretokens for k, v in out.items()} == counts
    assert out["0"].encoded == "low|low er"
    assert out["1"].encoded == "d o n|' t|st o p|n o w"
    assert (out["2"].n_pretokens, out["2"].n_tokens,
            out["2"].encoded) == (0, 0, "")
    assert out["3"].encoded == "4 2|! !"


def test_exact_k_per_stratum_count_and_growth(spark):
    """exact_k_per_stratum returns exactly min(k, |stratum|) rows per
    stratum in hash order, and corpus growth displaces AT MOST one
    previous member per stratum (the boundary-eviction contract)."""
    from extract_text_spark.functions import sampling

    rows = [(i, "a" if i % 3 else "b") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    sel = sampling.exact_k_per_stratum(df, 5).collect()
    by = {}
    for r in sel:
        by.setdefault(r.stratum, []).append(r)
    assert {s: len(v) for s, v in by.items()} == {"a": 5, "b": 5}
    for v in by.values():
        ordered = sorted(v, key=lambda r: r.sel_rank)
        assert [(r.sel_bucket, r.doc_id) for r in ordered] == sorted(
            (r.sel_bucket, r.doc_id) for r in v)
    # tiny stratum: returns all of it
    small = spark.createDataFrame([(1, "x"), (2, "x")],
                                  "doc_id long, source string")
    assert sampling.exact_k_per_stratum(small, 5).count() == 2
    # growth: one added doc changes each stratum's set by <= 1 member
    grown = spark.createDataFrame(rows + [(999, "a")],
                                  "doc_id long, source string")
    sel2 = {(r.stratum, r.doc_id)
            for r in sampling.exact_k_per_stratum(grown, 5).collect()}
    sel1 = {(r.stratum, r.doc_id) for r in sel}
    assert len(sel1 - sel2) <= 1 and len(sel2 - sel1) <= 1


def test_exact_k_candidate_bucket_limit_lossless(spark):
    """candidate_bucket_limit pre-prunes the window input but the output
    is IDENTICAL to the unpruned rank: a giant stratum with plenty of
    kept candidates uses only pruned rows, a stratum that the limit
    starves below k (including one pruned to ZERO candidates) falls
    back to its full membership."""
    from extract_text_spark.functions import sampling

    # 'giant' has 300 members (plenty survive any reasonable limit);
    # 'rare' has 3 — with k=5 it is under-k even unpruned, exercising
    # the fallback including the all-rows-pruned corner for limit=0.
    rows = [(i, "giant") for i in range(300)] + [
        (1000 + i, "rare") for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    want = sorted(
        (r.stratum, r.doc_id, r.sel_bucket, r.sel_rank)
        for r in sampling.exact_k_per_stratum(df, 5).collect())
    for limit in (0, 1, 50_000, 200_000, 1_000_000):
        got = sorted(
            (r.stratum, r.doc_id, r.sel_bucket, r.sel_rank)
            for r in sampling.exact_k_per_stratum(
                df, 5, candidate_bucket_limit=limit).collect())
        assert got == want, f"limit={limit} diverged"
    # the prune really bounds the window input: at limit L the kept
    # candidate pool for 'giant' is its rows with sel_bucket < L
    pruned_pool = sampling.exact_k_per_stratum(
        df, 5, candidate_bucket_limit=200_000)
    base_buckets = [
        r.sel_bucket for r in df.select(
            sampling.hash_bucket_col("doc_id", salt="exactk")
            .alias("sel_bucket")).collect()]
    assert sum(1 for b in base_buckets if b < 200_000) < len(rows)
    assert pruned_pool.count() == 5 + 3


def test_stupid_backoff_broadcast_vocab_fallback(spark):
    """broadcast_vocab=False (the web-scale shuffle-join path) returns
    byte-identical rows to the default broadcast path."""
    train = spark.createDataFrame(
        [(0, "a b a b c"), (1, "b c d")], "doc_id long, text string")
    score = spark.createDataFrame(
        [(0, "a b c"), (1, "c a"), (2, "a z"), (3, "a")],
        "doc_id long, text string")
    want = sorted(map(tuple, text_stats.stupid_backoff_score(
        score, train).collect()))
    got = sorted(map(tuple, text_stats.stupid_backoff_score(
        score, train, broadcast_vocab=False).collect()))
    assert got == want


def test_stupid_backoff_terms(spark):
    """Hand-computed Stupid Backoff terms: seen bigram = integer
    conditional frequency, unseen bigram with a seen w2 = 0.4 * unigram
    relative frequency (staged integer divisions), unseen w2 = 0, and a
    one-token document scores zero transitions."""
    train = spark.createDataFrame(
        [(0, "a b a b c")], "doc_id long, text string")
    # train counts: c(a)=2 c(b)=2 c(c)=1, N=5; c(a b)=2 c(b a)=1 c(b c)=1
    score = spark.createDataFrame(
        [(0, "a b c"),        # seen: a-b and b-c
         (1, "c a"),          # unseen bigram, both unigrams seen
         (2, "a z"),          # unseen bigram, unseen w2 -> 0
         (3, "a")],           # no transitions at all
        "doc_id long, text string")
    got = {r.doc_id: r for r in text_stats.stupid_backoff_score(
        score, train).collect()}
    # doc0: (1e6*2)//2 + (1e6*1)//2 = 1_000_000 + 500_000
    assert (got[0].n_transitions, got[0].n_backoff,
            got[0].lm_score_milli) == (2, 0, 1_500_000)
    # doc1: backoff for 'c a': (400000 * ((1e6*2)//5)) // 1e6 = 160000
    assert (got[1].n_transitions, got[1].n_backoff,
            got[1].lm_score_milli) == (1, 1, 160_000)
    assert (got[2].n_transitions, got[2].n_backoff,
            got[2].lm_score_milli) == (1, 1, 0)
    assert (got[3].n_transitions, got[3].n_backoff,
            got[3].lm_score_milli) == (0, 0, 0)


def test_ccnet_buckets_cut_semantics(spark):
    """Head/middle/tail cuts land at the 1/3 and 2/3 MASS points of the
    score distribution, equal scores never straddle a cut, and a
    degenerate single-score distribution is all head."""
    # 9 docs, scores 10x3, 20x3, 30x3 -> cut1=10, cut2=20
    rows = [(i, s) for i, s in enumerate([10] * 3 + [20] * 3 + [30] * 3)]
    df = spark.createDataFrame(rows, "doc_id long, score_milli long")
    got = {r.doc_id: r.bucket for r in
           text_stats.ccnet_buckets(df).collect()}
    assert [got[i] for i in range(9)] == (
        ["head"] * 3 + ["middle"] * 3 + ["tail"] * 3)
    # a fat tie spanning the 1/3 point pulls the whole score into head:
    # scores 5x5, 9x1 -> cum(5)=5, 5*3 >= 6 -> cut1=5, cut2=5
    rows2 = [(i, 5) for i in range(5)] + [(5, 9)]
    got2 = {r.doc_id: r.bucket for r in text_stats.ccnet_buckets(
        spark.createDataFrame(rows2, "doc_id long, score_milli long")
    ).collect()}
    assert [got2[i] for i in range(5)] == ["head"] * 5
    assert got2[5] == "tail"            # 9 > cut2=5
    # single distinct score: everything is head
    one = spark.createDataFrame([(0, 7), (1, 7)],
                                "doc_id long, score_milli long")
    assert {r.bucket for r in text_stats.ccnet_buckets(one).collect()} \
        == {"head"}


def test_bpe_train_matches_sennrich_replica(spark):
    """bpe_train == a pure-Python learn_bpe (overlap-inclusive pair
    counts, greedy left-to-right merge application, lexicographic
    tie-break, min_count stop), and the learned table feeds
    bpe_encode_df directly (train -> encode composes)."""
    import collections
    import re

    texts = ["low lower lowest", "newest newer new",
             "low low low cost!", "don't stop the test",
             "aaaa aaaa baa", "", "\x1ewe ird\x1e kept"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = [(r.merge_rank, r.pair_left, r.pair_right, r.pair_count)
           for r in text_stats.bpe_train(docs, 8)
           .orderBy("merge_rank").collect()]

    pat = re.compile(text_stats._BPE_TOKEN_RE)
    vocab = collections.Counter()
    for t in texts:
        for w in pat.findall(t):
            w = w.lstrip(" ")
            if "\x1e" not in w:           # delimiter words are excluded
                vocab[tuple(w)] += 1
    exp = []
    for rank in range(1, 9):
        stats = collections.Counter()
        for syms, fq in vocab.items():
            for i in range(len(syms) - 1):
                stats[(syms[i], syms[i + 1])] += fq
        if not stats:
            break
        (a, b), cnt = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < 2:
            break
        exp.append((rank, a, b, cnt))
        nxt = collections.Counter()
        for syms, fq in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and (syms[i], syms[i + 1]) == (a, b):
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nxt[tuple(out)] += fq
        vocab = nxt
    assert got == exp and len(got) == 8
    # 'aaaa': overlap-inclusive counting (3 pairs/word) but greedy
    # non-overlapping application ('aa','aa') — the pair (a,a) must win
    # an early round and ('aa','aa') must appear in a later one
    assert ("a", "a") in {(l, r) for _, l, r, _ in got}
    assert ("aa", "aa") in {(l, r) for _, l, r, _ in got}
    # train -> encode: the learned merges drive the encoder unchanged
    merges = [(l, r) for _, l, r, _ in got]
    enc = {r.doc_id: r for r in text_stats.bpe_encode_df(
        docs, merges).collect()}
    assert enc["0"].encoded.startswith("low|low")
    # min_count stop: a corpus where no pair repeats learns nothing
    # at min_count=2 but does learn at min_count=1
    single = spark.createDataFrame([(0, "ab cd")], "doc_id long, t string")
    assert text_stats.bpe_train(single, 4, text_col="t").count() == 0
    one = text_stats.bpe_train(single, 1, text_col="t",
                               min_count=1).collect()
    assert [(r.pair_left, r.pair_right, r.pair_count)
            for r in one] == [("a", "b", 1)]
    # the ORACLE mirrors the min_count stop structurally: an empty
    # best-pair round empties the chain, so a degenerate corpus yields
    # zero rows on BOTH sides (engine breaks, SQL filter + cross join)
    import duckdb
    from extract_text_spark.queries import (TA_BPE_TRAIN_SQL,
                                            _bpe_train_ctes)
    con = duckdb.connect()
    con.execute("CREATE TABLE documents AS SELECT 0::BIGINT AS doc_id,"
                " 'ab cd ef' AS text")
    assert con.execute(TA_BPE_TRAIN_SQL).fetchall() == []
    # and with min_count=1 the same corpus learns sequentially
    sql1 = ("WITH " + _bpe_train_ctes(2, min_count=1)
            + "\nSELECT a, b, cnt FROM bt_b1 UNION ALL "
              "SELECT a, b, cnt FROM bt_b2")
    assert con.execute(sql1).fetchall() == [("a", "b", 1), ("c", "d", 1)]


def test_fix_text_rules():
    ft = text_stats.fix_text
    # Byte-sensitive fixtures are constructed PROGRAMMATICALLY (source
    # literals with C1 controls do not survive editing).
    moji = "caf" + "é".encode("utf-8").decode("latin-1")
    assert ft(moji) == ("café", True)          # latin-1 mojibake

    def cp1252ish(bs):
        # a cp1252 mis-decode with the latin-1 fallback real decoders
        # apply to the five unmapped bytes (0x81/8D/8F/90/9D)
        out = []
        for b in bs:
            try:
                out.append(bytes([b]).decode("cp1252"))
            except UnicodeDecodeError:
                out.append(chr(b))
        return "".join(out)

    curly = cp1252ish("“q”".encode("utf-8"))
    assert ft(curly) == ("“q”", True)     # sloppy-1252 path
    # NFC precomposition, no mojibake flag
    assert ft("café") == ("café", False)
    # EOL normalization + control strip, tab preserved
    assert ft("a\x00b\rc\r\nd\te") == ("ab\nc\nd\te", False)
    # marker present but not repairable (codepoints > 255): untouched
    mixed = "Ã and 中文"
    assert ft(mixed) == (mixed, False)
    # idempotent on already-clean text
    assert ft("plain text") == ("plain text", False)
