"""Text-analysis tests (SURVEY.md §2.11 item 13): token counting, quality
scoring, language ID, fingerprinting."""

from __future__ import annotations

from pyspark.sql import functions as F

from tmdb_spark_data_pipeline_spark.operators import text

EN = "the cat sat of the mat and it is a story that goes on for a while now"
ES = "el perro corre por la calle y se va de la casa que los vecinos tienen por un rato"
NUMS = "12 34 56 78 90 11 22 33 44 55"


def test_token_count(spark):
    df = spark.createDataFrame([("  a b   c  ",)], ["t"])
    assert df.select(text.token_count("t").alias("n")).first().n == 3


def test_bpe_ish_tokens_split_punctuation(spark):
    df = spark.createDataFrame([("Hello, world! (yes)",)], ["t"])
    toks = df.select(text.bpe_ish_tokens("t").alias("tok")).first().tok
    assert toks == ["Hello", ",", "world", "!", "(", "yes", ")"]


def test_text_stats_columns(spark):
    df = spark.createDataFrame([(1, "a b a")], ["doc_id", "t"])
    row = text.text_stats(df, "t", "doc_id").first()
    assert (row.n_chars, row.n_tokens, row.n_unique_tokens) == (5, 3, 2)
    assert row.type_token_ratio == round(2 / 3, 6)


def test_quality_score_zero_outside_length_band(spark):
    df = spark.createDataFrame([("too short",), (EN,)], ["t"])
    rows = df.select(text.quality_score("t").alias("q")).collect()
    assert rows[0].q == 0.0  # < 10 tokens
    assert 0.0 < rows[1].q <= 1.0


def test_language_id_votes(spark):
    df = spark.createDataFrame([(1, EN), (2, ES), (3, NUMS)], ["id", "t"])
    got = {r.id: r.lang for r in df.select("id", text.language_id("t").alias("lang")).collect()}
    assert got == {1: "en", 2: "es", 3: "und"}


def test_stopword_ratio(spark):
    df = spark.createDataFrame([("the the dog",)], ["t"])
    assert abs(df.select(text.stopword_ratio("t", "en").alias("r")).first().r - 2 / 3) < 1e-9


def test_fingerprint_normalizes_case_and_whitespace(spark):
    df = spark.createDataFrame([(1, "Hello   World"), (2, "hello world"), (3, "other")], ["id", "t"])
    fps = {r.id: r.fp for r in df.select("id", text.fingerprint("t").alias("fp")).collect()}
    assert fps[1] == fps[2]
    assert fps[1] != fps[3]
    assert len(fps[1]) == 16  # 64-bit hex prefix


def test_repetition_stats_dominant_ngram(spark):
    df = spark.createDataFrame(
        [(1, "spam spam spam spam spam"), (2, "all words here are different")],
        ["doc_id", "t"],
    )
    out = {r.doc_id: r for r in text.repetition_stats(df, "t", "doc_id").collect()}
    assert out[1].n_ngrams == 3 and out[1].top_ngram_count == 3
    assert out[1].repetition_ratio == 1.0
    assert out[2].top_ngram_count == 1


def test_adjacent_pairs_order_and_case(spark):
    df = spark.createDataFrame([(1, "The cat  sat"), (2, "solo")], ["doc_id", "t"])
    rows = text.adjacent_pairs(df, "t", "doc_id").collect()
    got = sorted((r.doc_id, r.a, r.b) for r in rows)
    # lowercased, multi-whitespace collapsed; single-token docs yield no pairs
    assert got == [(1, "cat", "sat"), (1, "the", "cat")]


def test_oov_stats_hand_corpus(spark):
    """Vocab of size 2 over a 3-doc corpus: 'a' and 'b' are kept (most
    frequent, ties broken lexicographically), everything else is OOV."""
    import pytest

    from tmdb_spark_data_pipeline_spark.operators.text import oov_stats

    df = spark.createDataFrame(
        [
            (1, "a a b", "en"),   # 0/3 OOV
            (2, "a b x", "en"),   # 1/3 OOV
            (3, "y z", "fr"),     # 2/2 OOV
        ],
        ["doc_id", "text", "lang"],
    )
    rows = {r.lang: r for r in oov_stats(df, "text", "doc_id", "lang", vocab_size=2).collect()}
    assert rows["en"].n_docs == 2
    assert rows["en"].avg_oov_rate == pytest.approx((0 + 1 / 3) / 2, abs=1e-6)
    assert rows["fr"].avg_oov_rate == pytest.approx(1.0, abs=1e-6)


def test_unigram_logprob_frequent_tokens_score_lower(spark):
    docs = spark.createDataFrame(
        [(1, "the the the the"), (2, "the zebra"), (3, "qux")],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in text.unigram_logprob_stats(docs, "text", "doc_id").collect()}
    # corpus counts: the=5, zebra=1, qux=1 -> N=7, V=3
    # doc 1 = all 'the' (most frequent) must score lower than doc 3 (hapax)
    assert out[1].avg_neg_logprob < out[3].avg_neg_logprob
    assert out[1].n_tokens == 4 and out[2].n_tokens == 2
    import math
    expected_doc3 = round(-math.log((1 + 1) / (7 + 3)), 6)
    assert abs(out[3].avg_neg_logprob - expected_doc3) < 1e-6


def test_char_entropy_uniform_vs_constant(spark):
    docs = spark.createDataFrame(
        [(1, "aaaa"), (2, "abab"), (3, "abcd")],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in text.char_entropy_stats(docs, "text", "doc_id").collect()}
    assert out[1].char_entropy_bits == 0.0          # single symbol: zero bits
    assert abs(out[2].char_entropy_bits - 1.0) < 1e-9   # two symbols, uniform
    assert abs(out[3].char_entropy_bits - 2.0) < 1e-9   # four symbols, uniform
    assert out[3].n_chars == 4


def test_textrank_empty_and_tiny_corpus(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    out = text.textrank_keywords(empty, "text")
    assert out.columns == ["token", "rank"] and out.count() == 0
    tiny = spark.createDataFrame([(1, "alpha beta alpha beta")], ["doc_id", "text"])
    rows = {r.token: r.rank for r in text.textrank_keywords(tiny, "text").collect()}
    # symmetric two-node graph: equal ranks, each 0.5
    assert set(rows) == {"alpha", "beta"}
    assert abs(rows["alpha"] - 0.5) < 1e-6 and abs(rows["beta"] - 0.5) < 1e-6


def test_token_kl_drift_identical_halves_zero(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e", "en"), (2, "a b c d e", "en")], ["doc_id", "text", "lang"]
    )
    out = text.token_kl_drift(
        docs.filter("doc_id = 1"), docs.filter("doc_id = 2"), "text", "lang"
    ).collect()
    assert len(out) == 1 and out[0].kl_new_vs_old == 0.0


def test_pmi_collocations_ranks_bound_pair_over_glue(spark):
    # "san francisco" always co-occur; "the" pairs with everything (glue).
    rows = [(i, "the city of san francisco is near the bay area") for i in range(5)]
    rows += [(100 + i, "the weather in san francisco is foggy in the bay") for i in range(5)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = text.pmi_collocations(df, "text", "doc_id", min_count=5, top_k=20).collect()
    pmi = {(r.a, r.b): r.pmi for r in out}
    assert ("san", "francisco") in pmi
    # perfectly-bound pairs score ln(T^2/(n·B)): the RARER bound pair ranks
    # higher ("city of", n=5, beats "san francisco", n=10) — the defining
    # PMI behavior (frequency top-k would invert it)
    assert pmi[("city", "of")] > pmi[("san", "francisco")] > 0
    # glue pairs ("the" attaches to everything) score strictly lower than
    # any perfectly-bound pair despite equal-or-higher frequency
    glue = [v for (a, b), v in pmi.items() if a == "the" or b == "the"]
    assert glue and all(v < pmi[("san", "francisco")] for v in glue)


def test_winnowing_shared_run_shares_a_fingerprint(spark):
    from tmdb_spark_data_pipeline_spark.operators import text as T

    # Docs 1 and 2 share a 6-word run (= window + k - 1 = 4 + 3 - 1), the
    # minimum length the winnowing guarantee covers; doc 3 is disjoint.
    shared = "alpha beta gamma delta epsilon zeta"
    df = spark.createDataFrame(
        [
            (1, "one two " + shared + " tail words here"),
            (2, shared + " completely different ending tokens"),
            (3, "red green blue cyan magenta yellow black white"),
        ],
        "doc_id int, text string",
    )
    fp = T.winnowed_fingerprints(df, "text", "doc_id", k=3, window=4)
    sets = {
        i: {r.fingerprint for r in rows}
        for i, rows in [
            (i, fp.filter(fp.doc_id == i).collect()) for i in (1, 2, 3)
        ]
    }
    assert sets[1] & sets[2], "guaranteed shared fingerprint missing"
    assert not (sets[1] & sets[3]) and not (sets[2] & sets[3])
    # density ~ 2/(w+1): selection must be sparser than one-per-gram
    n_grams_1 = len(df.collect()[0].text.split()) - 2
    assert len(sets[1]) < n_grams_1


def test_winnowing_short_doc_and_param_guards(spark):
    import pytest

    from tmdb_spark_data_pipeline_spark.operators import text as T

    df = spark.createDataFrame(
        [(1, "just five words in doc"), (2, "ab cd")],
        "doc_id int, text string",
    )
    # doc 1: 5 tokens -> 3 grams -> windows need 4 grams -> no fingerprints
    # doc 2: shorter than k -> filtered before explode
    assert T.winnowed_fingerprints(df, "text", "doc_id", k=3, window=4).count() == 0
    with pytest.raises(ValueError, match="window"):
        T.winnowed_fingerprints(df, "text", "doc_id", k=0)


def test_dsir_importance_stats_hand_case(spark):
    """Hand-checked log-ratio LM: target corpus 'a a b', source docs
    'a a' (in-domain-looking) and 'c c' (out-of-domain) — the 'a' doc
    must outscore the 'c' doc, and both means must equal the closed-form
    smoothed ratio."""
    import math

    from tmdb_spark_data_pipeline_spark.operators import text as T

    rows = [
        (1, "a a b", True),
        (2, "a a", False),
        (3, "c c", False),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "is_target"])
    out = {
        r.doc_id: (r.n_tokens, r.avg_log_ratio)
        for r in T.dsir_importance_stats(df, "text", "doc_id", "is_target").collect()
    }
    assert set(out) == {2, 3}  # target doc never scored
    # counts: ct(a)=2 ct(b)=1 ct(c)=0; cs(a)=2 cs(b)=0 cs(c)=2
    # Nt=3, Ns=4, V=3 (union vocab)
    def term(ct, cs):
        return round(math.log((ct + 1) / (3 + 3)) - math.log((cs + 1) / (4 + 3)), 12)

    assert out[2] == (2, round(term(2, 2), 6))
    assert out[3] == (2, round(term(0, 2), 6))
    assert out[2][1] > out[3][1]  # in-domain-looking source doc wins


def test_bpe_train_merges_hand_computed(spark):
    """Three merge rounds on one crafted doc, every rule hand-verified —
    pins rule selection order (count desc, left asc, right asc), greedy
    left-to-right non-overlap on self-pair runs ([a,a,a] -> [aa,a]), and
    that merged tokens re-enter the pair stream for later rounds."""
    from tmdb_spark_data_pipeline_spark.operators import text as T

    df = spark.createDataFrame([(1, "a a a b a b")], "doc_id long, text string")
    rules = {
        r.step: (r.left, r.right, r.merged, r.n_pairs)
        for r in T.bpe_train_merges(df, "text", "doc_id", merges=3).collect()
    }
    # step 1: (a,a) and (a,b) both occur twice; tie-break right asc -> (a,a)
    # greedy over [a,a,a,...]: merge positions 1-2 only -> [aa, a, b, a, b]
    assert rules[1] == ("a", "a", "a a", 2)
    # step 2: (a,b) now the unique most-frequent pair (2x)
    assert rules[2] == ("a", "b", "a b", 2)
    # step 3: stream is ["a a", "a b", "a b"]; ("a a","a b") and
    # ("a b","a b") tie at count 1 — left asc picks "a a" < "a b"
    assert rules[3] == ("a a", "a b", "a a a b", 1)


# --- unigram-LM Viterbi subword segmentation --------------------------------


def test_viterbi_segment_words_hand_case_and_tie_break(spark):
    """Crafted integer costs: 'abab' -> [ab][ab] (cost 40, 2 pieces);
    'ab' ties [ab]=20 vs [a][b]=20 and must take the SMALLEST split start
    (strict-less argmin) -> one piece; unknown chars never block single-char
    coverage when present in the inventory."""
    from tmdb_spark_data_pipeline_spark.operators import text as T

    words = spark.createDataFrame(
        [("abab",), ("ba",), ("a",), ("ab",)], ["word"]
    )
    pieces = [("a", 10), ("b", 10), ("ab", 20)]
    got = {
        r.word: (r.seg_cost, r.n_pieces)
        for r in T.viterbi_segment_words(words, pieces, max_piece=3).collect()
    }
    assert got == {"abab": (40, 2), "ba": (20, 2), "a": (10, 1), "ab": (20, 1)}


def test_subword_piece_costs_inventory_and_formula(spark):
    """All single chars kept, exactly top_multi multi-char pieces by
    (total desc, piece asc), cost = round(-ln(total/T)*1e6)."""
    import math

    from tmdb_spark_data_pipeline_spark.operators import text as T

    wcnt = spark.createDataFrame(
        [("aab", 3), ("ab", 2), ("bb", 1)], ["word", "cnt"]
    )
    rows = T.subword_piece_costs(wcnt, max_piece=3, top_multi=2).collect()
    by_piece = {r.piece: r for r in rows}
    # chars: a(3*2+2)=8? a appears twice in aab (x3) + once in ab (x2) = 8; b: 3+2+2=7
    assert by_piece["a"].total == 8 and by_piece["b"].total == 7
    multi = sorted((r.piece for r in rows if len(r.piece) > 1))
    # ab: 3+2=5, aa: 3, bb: 1, aab: 3 -> top2 = ab(5), then aa/aab tie at 3 -> 'aa'
    assert multi == ["aa", "ab"]
    T_total = sum(r.total for r in rows)
    for r in rows:
        expect = round(-math.log(r.total / T_total) * 1e6)
        assert abs(r.cost - expect) <= 1, r
    # every piece of the same inventory must round-trip through segmentation
    seg = T.viterbi_segment_words(
        wcnt, [(r.piece, r.cost) for r in rows], max_piece=3
    ).collect()
    assert all(r.n_pieces >= 1 and r.seg_cost > 0 for r in seg)


def test_viterbi_matches_python_model_random(spark):
    """Random words + random integer-cost inventories vs a naive python DP
    with the same smallest-start tie rule."""
    import random

    from tmdb_spark_data_pipeline_spark.operators import text as T

    rng = random.Random(29)
    alphabet = "abc"
    for trial in range(3):
        words = [
            "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 9)))
            for _ in range(25)
        ]
        pieces = {ch: rng.randint(5, 30) for ch in alphabet}
        for _ in range(6):
            p = "".join(rng.choice(alphabet) for _ in range(rng.randint(2, 3)))
            pieces.setdefault(p, rng.randint(5, 60))
        plist = sorted(pieces.items())

        def model(w):
            INF = 10**15
            dp = [(0, 0)] + [(INF, 0)] * len(w)
            for p in range(1, len(w) + 1):
                best = (INF, 0)
                for j in range(max(1, p - 2), p + 1):
                    c = pieces.get(w[j - 1 : p])
                    if c is None:
                        continue
                    cand = (dp[j - 1][0] + c, dp[j - 1][1] + 1)
                    if cand[0] < best[0]:
                        best = cand
                dp[p] = best
            return dp[len(w)]

        df = spark.createDataFrame([(w,) for w in set(words)], ["word"])
        got = {
            r.word: (r.seg_cost, r.n_pieces)
            for r in T.viterbi_segment_words(df, plist, max_piece=3).collect()
        }
        assert got == {w: model(w) for w in set(words)}, trial


def test_viterbi_segment_pieces_backtrace(spark):
    """seg_pieces must concatenate back to the word, have exactly n_pieces
    elements, each piece in the inventory, and piece costs sum to seg_cost
    — checked on crafted and random inventories."""
    import random

    from tmdb_spark_data_pipeline_spark.operators import text as T

    words = spark.createDataFrame(
        [("abab",), ("ba",), ("bab",), ("a",)], ["word"]
    )
    pieces = [("a", 10), ("b", 10), ("ab", 20)]
    rows = T.viterbi_segment_pieces(words, pieces, max_piece=3).collect()
    got = {r.word: r for r in rows}
    assert got["abab"].seg_pieces == ["ab", "ab"]
    assert got["ba"].seg_pieces == ["b", "a"]
    assert got["bab"].seg_pieces == ["b", "ab"]
    cost = dict(pieces)
    rng = random.Random(31)
    rand_words = spark.createDataFrame(
        [("".join(rng.choice("abc") for _ in range(rng.randint(1, 9))),)
         for _ in range(20)],
        ["word"],
    ).distinct()
    inv = [(ch, rng.randint(5, 30)) for ch in "abc"] + [
        ("ab", 12), ("bc", 14), ("cab", 25), ("aa", 40)
    ]
    cost = dict(inv)
    for r in T.viterbi_segment_pieces(rand_words, inv, max_piece=3).collect():
        assert "".join(r.seg_pieces) == r.word
        assert len(r.seg_pieces) == r.n_pieces
        assert all(p in cost for p in r.seg_pieces)
        assert sum(cost[p] for p in r.seg_pieces) == r.seg_cost


def test_viterbi_uncovered_word_yields_nulls(spark):
    """A word containing a character OUTSIDE the piece inventory has no
    valid segmentation: both segmenters must surface NULL seg_cost /
    n_pieces / seg_pieces for that row (not the 1e15 sentinel or a
    garbage backtrace), while covered rows in the same frame are
    unaffected."""
    from tmdb_spark_data_pipeline_spark.operators import text as T

    words = spark.createDataFrame([("abab",), ("axb",), ("x",)], ["word"])
    pieces = [("a", 10), ("b", 10), ("ab", 20)]
    got = {
        r.word: (r.seg_cost, r.n_pieces)
        for r in T.viterbi_segment_words(words, pieces, max_piece=3).collect()
    }
    assert got["abab"] == (40, 2)
    assert got["axb"] == (None, None)
    assert got["x"] == (None, None)
    rows = {
        r.word: r
        for r in T.viterbi_segment_pieces(words, pieces, max_piece=3).collect()
    }
    assert rows["abab"].seg_pieces == ["ab", "ab"]
    assert rows["axb"].seg_cost is None and rows["axb"].seg_pieces is None
    assert rows["x"].seg_pieces is None and rows["x"].n_pieces is None


def test_bigram_kneser_ney_matches_python_model(spark, sf_smoke):
    """Replicate the KN query's exact math in python (same md5 hash split,
    same D=0.75, same add-one-smoothed continuation floor) and compare
    per-doc averages; also pin the ablation claim: KN mean held-out
    -ln p < add-one mean on this corpus."""
    import hashlib
    import math
    from collections import Counter

    import pytest

    from tmdb_spark_data_pipeline_spark.plans.queries import REGISTRY
    from tmdb_spark_data_pipeline_spark.sources.io import load_table

    sf_dir = sf_smoke
    docs = {
        r.doc_id: r.text
        for r in load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    }

    def split_of(doc_id):
        h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16)
        return "train" if h % 10000 < 9000 else "test"

    bgs = {}
    for d, t in docs.items():
        w = [x for x in t.strip().lower().split() if x != ""]
        bgs[d] = [(w[i], w[i + 1]) for i in range(len(w) - 1)]
    c12, vocab = Counter(), set()
    for d, t in docs.items():
        if split_of(d) == "train":
            for p in bgs[d]:
                c12[p] += 1
            vocab.update(x for x in t.strip().lower().split() if x != "")
    c1, n1pa, n1pb = Counter(), Counter(), Counter()
    for (a, b), c in c12.items():
        c1[a] += c
        n1pa[a] += 1
        n1pb[b] += 1
    T, V = len(c12), len(vocab)

    def p_kn(a, b):
        pc = (n1pb.get(b, 0) + 1) / (T + V + 1)
        if a not in c1:
            return pc
        return max(c12.get((a, b), 0) - 0.75, 0) / c1[a] + 0.75 * n1pa[a] / c1[a] * pc

    expect = {}
    for d in docs:
        if split_of(d) == "test" and bgs[d]:
            terms = [round(-math.log(p_kn(a, b)), 12) for a, b in bgs[d]]
            expect[d] = (len(terms), round(sum(terms) / len(terms), 6))
    got = {
        r.doc_id: (r.n_bigrams, r.avg_neg_logprob)
        for r in REGISTRY["bigram_kneser_ney_heldout"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(expect)
    for d in got:
        assert got[d][0] == expect[d][0]
        assert got[d][1] == pytest.approx(expect[d][1], abs=2e-6), d
    addone = {
        r.doc_id: r.avg_neg_logprob
        for r in REGISTRY["bigram_heldout_logprob"].fn(spark, sf_dir).collect()
    }
    assert sum(got[d][1] for d in got) / len(got) < sum(addone.values()) / len(addone)
