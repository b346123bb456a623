"""Training-data curation: decontamination + PII redaction
(operators/curation.py)."""

import pytest
from pyspark.sql import functions as F

from deltalake_spark.operators.curation import (
    decontaminate,
    redact_pii,
    token_ngrams,
)


@pytest.fixture()
def corpus(spark):
    return spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "completely unrelated text about spark partitions"),
            (3, "prefix words then the quick brown fox jumps over "
                "the lazy dog today suffix"),
        ],
        "doc_id long, text string",
    )


def test_token_ngrams_windows(spark):
    df = spark.createDataFrame([("a b c d",), ("a b",)], "text string")
    rows = df.select(
        token_ngrams(F.col("text"), 3).alias("g")).collect()
    assert rows[0]["g"] == ["a b c", "b c d"]
    assert rows[1]["g"] == []  # fewer tokens than n


def test_decontaminate_drops_overlapping_docs(spark, corpus):
    eval_df = spark.createDataFrame(
        [(100, "x quick brown fox jumps over the lazy y")],
        "doc_id long, text string",
    )
    # 5-gram "quick brown fox jumps over" appears in docs 1 and 3
    kept = decontaminate(corpus, eval_df, n=5)
    assert [r["doc_id"] for r in kept.collect()] == [2]
    marked = decontaminate(corpus, eval_df, n=5, mark_only=True)
    flags = {r["doc_id"]: r["contaminated"] for r in marked.collect()}
    assert flags == {1: True, 2: False, 3: True}
    # a longer n than any shared window finds nothing
    clean = decontaminate(corpus, eval_df, n=12)
    assert clean.count() == 3


def test_decontaminate_case_and_punctuation_insensitive(spark):
    corpus = spark.createDataFrame(
        [(1, "The QUICK, brown fox; jumps over the lazy dog!")],
        "doc_id long, text string")
    eval_df = spark.createDataFrame(
        [(9, "quick brown fox jumps over the lazy dog")],
        "doc_id long, text string")
    assert decontaminate(corpus, eval_df, n=8).count() == 0


def test_redact_pii_all_kinds(spark):
    df = spark.createDataFrame(
        [(1, "mail a.b+x@ex-1.org call 555-123-4567 ssn 123-45-6789 "
             "ip 10.0.0.1 end")],
        "id long, text string")
    out = redact_pii(df).collect()[0]
    assert out["text"] == ("mail [EMAIL] call [PHONE] ssn [SSN] "
                           "ip [IP] end")
    assert (out["n_email"], out["n_phone"], out["n_ssn"],
            out["n_ipv4"]) == (1, 1, 1, 1)


def test_redact_pii_counts_do_not_shadow(spark):
    """Counts are taken on the ORIGINAL text per kind: a phone must not
    count as an ssn, and an email's digits must not leak phone counts
    after replacement ordering."""
    df = spark.createDataFrame(
        [(1, "two mails a@b.co c@d.io and 555-000-1111")],
        "id long, text string")
    out = redact_pii(df).collect()[0]
    assert out["n_email"] == 2
    assert out["n_phone"] == 1
    assert out["n_ssn"] == 0
    assert out["text"] == "two mails [EMAIL] [EMAIL] and [PHONE]"


def test_redact_pii_no_matches_identity(spark):
    df = spark.createDataFrame([(1, "plain words only")],
                               "id long, text string")
    out = redact_pii(df).collect()[0]
    assert out["text"] == "plain words only"
    assert out["n_email"] == out["n_phone"] == 0


def test_decontaminate_plan_broadcasts_eval_grams(spark, corpus):
    """Scale shape: the eval gram set must join as a BROADCAST (eval
    suites are KB-MB; the corpus side must never shuffle its text)."""
    eval_df = spark.createDataFrame(
        [(9, "quick brown fox jumps over")], "doc_id long, text string")
    out = decontaminate(corpus, eval_df, n=5, mark_only=True)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_repetition_stats_exact(spark):
    from deltalake_spark.operators.curation import repetition_stats

    df = spark.createDataFrame(
        [
            (1, "a b a b a b"),      # 3-grams: aba,bab,aba,bab -> 2/4 dup
            (2, "w x y z q r"),      # all distinct -> 0
            (3, "a b"),              # < 3 tokens -> no grams
        ],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in repetition_stats(df, n=3).collect()}
    assert out[1]["ngram_total"] == 4
    assert out[1]["dup_ngram_frac"] == 0.5
    assert out[2]["dup_ngram_frac"] == 0.0
    assert out[3]["ngram_total"] == 0
    assert out[3]["dup_ngram_frac"] == 0.0


def test_canonicalize_url_rules(spark):
    """Every canonicalization rule, one assertion each: fragment strip,
    scheme+host lowercase, default-port strip (https:443 / http:80,
    non-default kept), tracking-param drop (utm_* prefix + blocklist),
    query-param sort, trailing-slash collapse, bare host -> '/'."""
    from deltalake_spark.operators.curation import canonicalize_url
    from pyspark.sql import functions as F

    cases = [
        ("HTTPS://WWW.Ex.COM:443/a/b/?utm_source=x&b=2&a=1#frag",
         "https://www.ex.com/a/b?a=1&b=2"),
        ("http://Ex.com:80/path", "http://ex.com/path"),
        ("http://ex.com:8080/path", "http://ex.com:8080/path"),
        ("https://ex.com/p?fbclid=1&gclid=2&keep=3&sessionid=4",
         "https://ex.com/p?keep=3"),
        ("https://ex.com/p?z=1&a=2", "https://ex.com/p?a=2&z=1"),
        ("https://ex.com///", "https://ex.com/"),
        ("https://ex.com", "https://ex.com/"),
        ("https://ex.com/p?utm_campaign=c", "https://ex.com/p"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r[0] for r in
           df.select(canonicalize_url(F.col("url"))).collect()]
    assert got == [want for _, want in cases]

    # idempotence: canonicalizing a canonical URL is a no-op
    canon = spark.createDataFrame([(w,) for _, w in cases], "url string")
    again = [r[0] for r in
             canon.select(canonicalize_url(F.col("url"))).collect()]
    assert again == [want for _, want in cases]


def test_url_dedup_stats_collapse(spark):
    from deltalake_spark.operators.curation import url_dedup_stats

    rows = [
        ("https://a.com/x?utm_source=1",),
        ("HTTPS://A.com/x/",),
        ("https://a.com/y",),
        ("http://b.com:80/z#f",),
        ("http://b.com/z",),
    ]
    df = spark.createDataFrame(rows, "url string")
    out = {r["host"]: r for r in
           url_dedup_stats(df, url_col="url").collect()}
    assert out["a.com"]["n_rows"] == 3
    assert out["a.com"]["n_raw"] == 3
    assert out["a.com"]["n_canonical"] == 2  # /x variants collapse
    assert out["b.com"]["n_canonical"] == 1
    assert float(out["b.com"]["collapse_ratio"]) == 2.0


def _span_words(prefix, n):
    return [f"{prefix}{i}" for i in range(n)]


def test_longest_dup_span_exact_lengths(spark):
    """Seed-and-extend recovers the TRUE maximal overlap: a planted
    25-token lift scores exactly 25 (not a 10-token cell count), two
    disjoint lifts count as two regions, and sub-threshold overlap
    (9 < min_tokens) reports nothing."""
    from deltalake_spark.operators.curation import longest_dup_span_pairs

    shared = " ".join(_span_words("s", 25))
    shared2 = " ".join(_span_words("z", 14))
    small = " ".join(_span_words("q", 9))
    a = " ".join(_span_words("a", 30)) + f" {shared} " + \
        " ".join(_span_words("b", 10)) + f" {shared2}"
    b = " ".join(_span_words("c", 5)) + f" {shared} " + \
        " ".join(_span_words("d", 40)) + f" {shared2}"
    c = " ".join(_span_words("e", 30)) + f" {small}"
    d = " ".join(_span_words("f", 30)) + f" {small}"
    df = spark.createDataFrame(
        [(1, a), (2, b), (3, c), (4, d)], "doc_id long, text string")
    for mode in ("portable", "native"):
        rows = longest_dup_span_pairs(
            df, min_tokens=10, hash_mode=mode).collect()
        got = sorted((r["id_a"], r["id_b"], r["longest_tokens"],
                      r["n_regions"]) for r in rows)
        assert got == [(1, 2, 25, 2)], (mode, got)


def test_longest_dup_span_short_and_null_docs_drop(spark):
    from deltalake_spark.operators.curation import longest_dup_span_pairs

    text = " ".join(_span_words("s", 12))
    df = spark.createDataFrame(
        [(1, text), (2, text), (3, "tiny doc"), (4, None)],
        "doc_id long, text string")
    rows = longest_dup_span_pairs(df, min_tokens=10).collect()
    assert [(r["id_a"], r["id_b"], r["longest_tokens"]) for r in rows] \
        == [(1, 2, 12)]


def test_longest_dup_span_stop_span_cap(spark):
    """Boilerplate present in more docs than max_bucket occurrences is
    dropped deterministically — no pair explosion from hot spans."""
    from deltalake_spark.operators.curation import longest_dup_span_pairs

    boiler = " ".join(_span_words("s", 10))
    rows = [(i, " ".join(_span_words(f"u{i}x", 15)) + f" {boiler}")
            for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # every doc carries the 10-token boilerplate once -> 30 occurrences
    assert longest_dup_span_pairs(
        df, min_tokens=10, max_bucket=10).count() == 0
    assert longest_dup_span_pairs(
        df, min_tokens=10, max_bucket=1000).count() == 30 * 29 // 2


def test_winnow_fingerprints_match_reference(spark):
    """r9: the array-expression winnowing selection equals a direct
    Python implementation of Schleimer 2003 — including the rightmost
    tie rule on pathological all-equal-hash inputs — and short docs
    (< window + k - 1 chars) emit nothing."""
    import hashlib

    from deltalake_spark.operators.text import winnow_fingerprints

    def ref(text, k=8, w=16):
        n = len(text)
        if n < k + w - 1:
            return set()
        hs = [int(hashlib.md5(text[i:i + k].encode())
                  .hexdigest()[:15], 16) for i in range(n - k + 1)]
        sel = set()
        for j in range(len(hs) - w + 1):
            win = hs[j:j + w]
            m = min(win)
            pos = j + max(i for i, h in enumerate(win) if h == m)
            sel.add((pos + 1, m))
        return sel

    texts = [
        (1, "the quick brown fox jumps over the lazy dog repeatedly "
            "and often"),
        (2, "abcabcabcabcabcabcabcabcabcabcabc"),   # periodic ties
        (3, "short"),                               # below threshold
        (4, "x" * 40),                              # ALL hashes equal
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {}
    for r in winnow_fingerprints(df, k=8, window=16).collect():
        got.setdefault(r["doc_id"], set()).add((r["pos"], r["fp"]))
    for i, t in texts:
        assert got.get(i, set()) == ref(t), i
    # density sanity: expected ~2/(w+1) of grams on random-ish text
    n_grams = len(texts[0][1]) - 7
    assert len(got[1]) <= n_grams


def test_winnow_guarantee_shared_fingerprint(spark):
    """The winnowing guarantee: any verbatim match of length >=
    window + k - 1 chars yields at least one SHARED fingerprint,
    regardless of offset — the property fixed-stride sampling lacks."""
    from deltalake_spark.operators.text import winnow_fingerprints

    lift = "zqwxv jkmtr plgdh snbcy feuoa"  # 29 chars > 23
    a = "A" * 17 + lift + "B" * 30
    b = "C" * 4 + lift + "D" * 40  # different offset
    df = spark.createDataFrame(
        [(1, a), (2, b)], "doc_id long, text string")
    rows = winnow_fingerprints(df, k=8, window=16).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    assert by_doc[1] & by_doc[2], "no shared fingerprint on a 29-char lift"


def test_gopher_quality_flags_rules(spark):
    """r9: each published Gopher rule fires on its canonical violation
    and NULL text fails everything."""
    from deltalake_spark.operators.curation import gopher_quality_flags

    good = ("the quick brown fox jumps over the lazy dog and then "
            "rests by the barn with a happy grin on its face while "
            "birds of every feather sing songs that have no end and "
            "clouds drift to the west in a sky so wide it seems to "
            "hold all of the world in one long breath of light")
    rows = [
        (1, good),                                   # passes all
        (2, "too short to count"),                   # word count
        (3, " ".join(["a"] * 60)),                   # mean word len < 3
        (4, good + " " + " ".join(["#"] * 30)),      # symbol ratio
        (5, " ".join(["123"] * 30) + " " + good),    # alpha frac < .8
        (6, " ".join(f"w{i}" for i in range(60))),   # no stopwords
        (7, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           gopher_quality_flags(df).collect()}
    assert got[1]["pass_all"] is True
    assert got[2]["ok_word_count"] is False
    assert got[3]["ok_mean_word_len"] is False
    assert got[4]["ok_symbol_ratio"] is False and \
        got[4]["ok_word_count"] is True
    assert got[5]["ok_alpha_frac"] is False
    assert got[6]["ok_stopwords"] is False
    assert got[7]["pass_all"] is False and got[7]["n_words"] == 0
    for d in (2, 3, 4, 5, 6, 7):
        assert got[d]["pass_all"] is False


def test_winnow_decontaminate_guarantee_and_miss(spark):
    """r9: a corpus doc lifting >= window+k-1 = 23 chars verbatim from
    the eval set is flagged (MOSS guarantee, any offset); a doc with
    only a short (< 23 char) overlap may legitimately pass; clean docs
    keep n_shared_fps = 0; drop mode removes flagged rows."""
    from deltalake_spark.operators.curation import winnow_decontaminate

    lift = "zq1wx2v jk3mt4r pl5gd6h snb7cy8"  # 31 chars
    ev = spark.createDataFrame(
        [(1000, "EVAL prefix " + lift + " eval suffix text here")],
        "doc_id long, text string")
    corpus = spark.createDataFrame(
        [(1, "A" * 10 + lift + "B" * 30),            # verbatim lift
         (2, "totally unrelated corpus document about volcanoes "
             "and violins with no overlap at all"),
         (3, "C" * 30 + " zq1wx2v jk" + "D" * 30)],  # 10-char overlap
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in winnow_decontaminate(
        corpus, ev, mark_only=True).collect()}
    assert out[1]["contaminated"] is True and out[1]["n_shared_fps"] >= 1
    assert out[2]["contaminated"] is False
    assert out[2]["n_shared_fps"] == 0
    assert out[3]["contaminated"] is False  # below the guarantee floor
    kept = winnow_decontaminate(corpus, ev).select("doc_id").collect()
    assert sorted(r["doc_id"] for r in kept) == [2, 3]


def test_top_duplicated_spans_matches_python(spark):
    """r10 verdict #7: the corpus-level span census equals a direct
    Python re-derivation (stride-1 windows, distinct-doc counts,
    the >= 2 docs floor, and the total-order head), and the native
    mode ranks identically with NULL span_text."""
    from deltalake_spark.operators.curation import top_duplicated_spans

    boiler = "all rights reserved by the example corpus project team"
    docs = [
        (1, boiler + " alpha beta gamma delta"),
        (2, "intro words here " + boiler),
        (3, boiler + " unrelated tail content words"),
        (4, "completely different text with no shared spans at all ok"),
        (5, "short text"),  # < min_tokens: emits nothing
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = top_duplicated_spans(
        df, id_col="doc_id", text_col="text", min_tokens=5,
        top_n=10).collect()

    # python reference
    from collections import defaultdict
    occ = defaultdict(list)
    for did, text in docs:
        w = text.split()
        for i in range(len(w) - 4):
            occ[" ".join(w[i:i + 5])].append(did)
    ref = [(s, len(set(ids)), len(ids)) for s, ids in occ.items()
           if len(set(ids)) >= 2]
    ref.sort(key=lambda r: (-r[1], -r[2], r[0]))
    # rows with n_docs >= 2 exist (the boilerplate) and match, in the
    # same total order modulo the hash tiebreak (compare as sets per
    # (n_docs, n_occ) level plus the top level's exact membership)
    assert len(got) == min(10, len(ref))
    got_set = {(r["span_text"], r["n_docs"], r["n_occurrences"])
               for r in got}
    ref_rank = {(s, nd, no) for s, nd, no in ref}
    assert got_set <= ref_rank
    top_docs = got[0]["n_docs"]
    assert top_docs == max(nd for _, nd, _ in ref) == 3
    # every 5-gram inside the shared boilerplate has n_docs = 3
    bw = boiler.split()
    for i in range(len(bw) - 4):
        span = " ".join(bw[i:i + 5])
        assert (span, 3, 3) in got_set

    # native mode: same ranking by hash, no span strings materialized
    nat = top_duplicated_spans(
        df, id_col="doc_id", text_col="text", min_tokens=5,
        top_n=10, hash_mode="native").collect()
    assert len(nat) == len(got)
    assert all(r["span_text"] is None for r in nat)
    assert ([(r["n_docs"], r["n_occurrences"]) for r in nat]
            == [(r["n_docs"], r["n_occurrences"]) for r in got])
