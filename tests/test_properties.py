"""Property-based tests (hypothesis) for the operators whose
correctness argument is algebraic rather than example-driven: salting
must be join-invariant for ANY data, connected components must match a
union-find reference on ANY graph, quantization error is bounded by
half a step for ANY vector.

max_examples is kept small: every example runs real Spark jobs."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from streamprocessing_kafka_finlight_news_dashboard_spark.operators.dedup import (
    connected_components,
)
from streamprocessing_kafka_finlight_news_dashboard_spark.operators.skew import salted_join

_settings = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


@given(
    fact_keys=st.lists(st.integers(min_value=0, max_value=5), min_size=1, max_size=40),
    n_salts=st.integers(min_value=2, max_value=16),
)
@_settings
def test_salted_join_equals_plain_join(spark, fact_keys, n_salts):
    """For any fact key multiset (including a 100%-hot key) and any salt
    count, the salted join must produce exactly the plain join's rows."""
    fact = spark.createDataFrame(
        [(i, k) for i, k in enumerate(fact_keys)], "row_id long, k long"
    )
    dim = spark.createDataFrame([(k, f"d{k}") for k in range(6)], "dk long, payload string")
    salted = salted_join(fact, dim, "k", "dk", n_salts=n_salts)
    plain = fact.join(dim, fact.k == dim.dk)
    assert sorted(
        (r.row_id, r.payload) for r in salted.select("row_id", "payload").collect()
    ) == sorted((r.row_id, r.payload) for r in plain.select("row_id", "payload").collect())


@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=14), st.integers(min_value=0, max_value=14)
        ),
        max_size=25,
    )
)
@_settings
def test_connected_components_match_union_find(spark, edges):
    """Spark min-label propagation must agree with a plain union-find
    on any graph over 15 nodes (self-loops and duplicates included)."""
    edges = [(a, b) for a, b in edges if a != b]
    nodes = list(range(15))
    # reference union-find
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {n: find(n) for n in nodes}

    nodes_df = spark.createDataFrame([(n,) for n in nodes], "doc_id long")
    if edges:
        edges_df = spark.createDataFrame(edges, "id_a long, id_b long")
    else:
        edges_df = spark.createDataFrame([], "id_a long, id_b long")
    got = {
        r.doc_id: r.cluster_id
        for r in connected_components(edges_df, nodes_df).collect()
    }
    assert got == expected


@given(
    vec=st.lists(
        st.floats(min_value=-100.0, max_value=100.0, allow_nan=False, width=32),
        min_size=1,
        max_size=32,
    )
)
@_settings
def test_quantization_error_bounded_by_half_step(spark, vec):
    """Reconstruction error of half-up int8 quantization is at most
    scale/2 per element, so max_err <= scale/2 (+ rounding slack)."""
    from streamprocessing_kafka_finlight_news_dashboard_spark.operators.similarity import (
        quantize_int8_report,
    )

    df = spark.createDataFrame([(0, vec)], "vec_id long, embedding array<float>")
    row = quantize_int8_report(df).first()
    assert row.max_err <= row.scale / 2 + 1e-6, row
    assert row.rmse <= row.max_err + 1e-6


def test_cc_driver_and_distributed_paths_identical(spark):
    """The scale-adaptive solver must be invisible: driver union-find
    (small graphs) and the distributed contraction loop must return
    identical (id, cluster_id) sets on the same pair graph, isolated
    nodes included."""
    from streamprocessing_kafka_finlight_news_dashboard_spark.operators.dedup import (
        connected_components,
        simhash_hamming_pairs,
    )
    from streamprocessing_kafka_finlight_news_dashboard_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    d = load_table(spark, SF_SMOKE, "documents")
    pairs = simhash_hamming_pairs(d, radius=3).select("id_a", "id_b")
    nodes = d.select("doc_id")
    drv = set(map(tuple, connected_components(pairs, nodes).collect()))
    dist = set(
        map(tuple, connected_components(pairs, nodes, driver_threshold=0).collect())
    )
    assert drv == dist and len(drv) == d.count()
    assert any(i != c for i, c in drv), "no non-trivial cluster in fixture"


@given(
    words=st.lists(
        st.text(alphabet="abcdefg hij", min_size=0, max_size=12), min_size=0, max_size=8
    ),
    emails=st.integers(min_value=0, max_value=3),
    ips=st.integers(min_value=0, max_value=2),
)
@_settings
def test_pii_scrub_plants_always_redacted(spark, words, emails, ips):
    """For ANY surrounding text, planted PII spans are counted and
    redacted: n_email/n_ipv4 are at least the planted counts, no
    planted literal survives in the scrubbed text, and the total
    reconciles with the placeholders present."""
    from streamprocessing_kafka_finlight_news_dashboard_spark.operators.text import pii_scrub

    planted_emails = [f"user{i}@host{i}.example.com" for i in range(emails)]
    planted_ips = [f"10.1.2.{i + 1}" for i in range(ips)]
    parts = list(words)
    for j, p in enumerate(planted_emails + planted_ips):
        parts.insert((j * 2) % (len(parts) + 1), p)
    text = " ".join(parts)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = pii_scrub(df).collect()[0]
    assert r.n_email >= emails
    assert r.n_ipv4 >= ips
    for lit in planted_emails + planted_ips:
        assert lit not in r.scrubbed_text
    n_ph = sum(
        r.scrubbed_text.count(f"<{fam.upper()}>")
        for fam in ("email", "ssn", "ipv4", "phone")
    )
    assert n_ph == r.n_redactions


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from("alpha beta gamma delta eps zeta eta theta".split()),
            min_size=0,
            max_size=20,
        ),
        min_size=2,
        max_size=6,
    ),
    plant=st.lists(
        st.sampled_from("red blue green gold pink onyx jade ruby opal sage".split()),
        min_size=4,
        max_size=4,
        unique=True,
    ),
    n_plants=st.integers(min_value=2, max_value=4),
    k=st.integers(min_value=3, max_value=4),
)
@_settings
def test_substring_dedup_plants_cut_exactly_once(spark, docs, plant, n_plants, k):
    """For ANY surrounding corpus, a planted k-token phrase repeated
    across documents survives the substring cut EXACTLY ONCE
    (keep-first), every cleaned doc's kept tokens are a subsequence of
    its original tokens, and token accounting reconciles. The plant
    uses a disjoint vocabulary so incidental corpus repeats never
    alias it."""
    from collections import Counter

    from streamprocessing_kafka_finlight_news_dashboard_spark.operators.dedup import dedup_substrings

    phrase = plant[:k]
    rows = []
    for i, words in enumerate(docs):
        toks = list(words)
        if i < n_plants:
            toks[len(toks) // 2 : len(toks) // 2] = phrase
        rows.append((i, " ".join(toks)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in dedup_substrings(df, k=k).collect()}
    originals = {i: (t.split(" ") if t else [""]) for i, t in rows}
    phrase_str = " ".join(phrase)
    survivors = 0
    for i, r in got.items():
        orig = originals[i]
        # "".split(" ") == [""] — an empty-text doc keeps its single
        # empty token, while a fully-cut doc keeps nothing
        kept = [] if r.n_removed == r.n_tokens else r.clean_text.split(" ")
        assert r.n_tokens == len(orig)
        assert r.n_tokens - r.n_removed == len(kept)
        it = iter(orig)
        assert all(any(o == w for o in it) for w in kept), (i, orig, kept)
        c = Counter(
            " ".join(kept[j : j + k]) for j in range(len(kept) - k + 1)
        )
        survivors += c.get(phrase_str, 0)
    assert survivors == 1, f"planted phrase survived {survivors}x"


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["aa", "bb", "cc", "dd", "ee"]),
            min_size=0,
            max_size=30,
        ),
        min_size=1,
        max_size=12,
    ),
    chunk=st.integers(min_value=2, max_value=8),
    stride_delta=st.integers(min_value=1, max_value=6),
)
@_settings
def test_chunk_windows_tile_any_corpus(spark, docs, chunk, stride_delta):
    """For ANY token corpus and any (chunk, stride<=chunk) config:
    chunk starts advance by exactly the stride, every token is covered,
    concatenating stride-prefixes of chunks (plus the last chunk)
    reconstructs the document, and empty docs emit nothing."""
    from streamprocessing_kafka_finlight_news_dashboard_spark.operators.text import chunk_windows

    stride = max(1, chunk - stride_delta % chunk)
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = chunk_windows(df, chunk_tokens=chunk, stride=stride)
    by_doc = {}
    for r in out.collect():
        by_doc.setdefault(r.id, []).append(r)
    for i, toks in enumerate(docs):
        if not toks:
            assert i not in by_doc
            continue
        cs = sorted(by_doc[i], key=lambda c: c.chunk_id)
        assert [c.chunk_start for c in cs] == [j * stride for j in range(len(cs))]
        # reconstruct: stride-prefix of each chunk, full last chunk
        rebuilt = []
        for c in cs[:-1]:
            rebuilt.extend(c.chunk_text.split(" ")[:stride])
        rebuilt.extend(cs[-1].chunk_text.split(" "))
        assert rebuilt == toks, (i, chunk, stride)


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["p1", "p2", "p3", "p4"]),
            min_size=1,
            max_size=6,
        ),
        min_size=1,
        max_size=10,
    ),
    para_tokens=st.integers(min_value=2, max_value=4),
)
@_settings
def test_paragraph_dedup_canonical_election_any_corpus(spark, docs, para_tokens):
    """For ANY corpus re-lined at any paragraph width: the corpus-wide
    kept count equals the number of DISTINCT paragraphs, exactly one
    occurrence of every paragraph survives, and it is the globally
    first by (doc_id, para_no)."""
    from streamprocessing_kafka_finlight_news_dashboard_spark.operators.dedup import paragraph_dedup

    # docs are lists of paragraph NAMES; expand each name to
    # para_tokens copies of itself so paragraphs align to the width
    rows = [
        (i, " ".join(tok for name in names for tok in [name] * para_tokens))
        for i, names in enumerate(docs)
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {r.doc_id: r for r in paragraph_dedup(df, para_tokens=para_tokens).collect()}
    # reference: first (doc_id, para_no) per paragraph name
    first_seen = {}
    for i, names in enumerate(docs):
        for j, name in enumerate(names):
            first_seen.setdefault(name, (i, j))
    distinct = len(first_seen)
    assert sum(r.n_kept for r in out.values()) == distinct
    for i, names in enumerate(docs):
        want = [
            " ".join([name] * para_tokens)
            for j, name in enumerate(names)
            if first_seen[name] == (i, j)
        ]
        assert out[i].clean_text.split("\n") == want or (
            not want and out[i].clean_text == ""
        ), (i, names)


@given(
    vals=st.lists(
        st.integers(min_value=-5_000_000, max_value=5_000_000),
        min_size=1,
        max_size=120,
    ),
    fracs=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=7),
            st.integers(min_value=1, max_value=8),
        ).filter(lambda t: t[0] <= t[1]),
        min_size=1,
        max_size=3,
    ),
)
@_settings
def test_exact_quantile_values_match_sorted_ground_truth(spark, vals, fracs):
    """The two-pass distributed order-statistic selection must return
    EXACTLY the value at ascending 1-based rank ceil(num·n/den) of the
    sorted multiset — for any values (duplicates, negatives, all in
    one cell, spread across cells) and any rational quantiles
    including q=1 (the max). Ground truth is a driver-side sort."""
    from streamprocessing_kafka_finlight_news_dashboard_spark.functions.stats import exact_quantile_values

    # round-6-style grid: the documented bounded-fine-pass regime
    doubles = [round(v / 1_000_000.0, 6) for v in vals]
    df = spark.createDataFrame([(v,) for v in doubles], "x double")
    got = exact_quantile_values(df, "x", fracs)
    n = len(doubles)
    srt = sorted(doubles)
    want = [srt[(num * n + den - 1) // den - 1] for num, den in fracs]
    assert got == want


def test_exact_quantile_values_fine_pass_bound_fails_loudly(spark):
    """ADVICE r9: on an effectively-continuous column a target cell can
    hold one distinct value per row — the fine pass must refuse a
    driver collect past max_fine_rows with tuning guidance, checked
    distributed-side BEFORE collecting; a compliant column is
    unaffected by the default bound."""
    import pytest

    from streamprocessing_kafka_finlight_news_dashboard_spark.functions.stats import exact_quantile_values

    # 500 distinct values all inside ONE 1e-3 cell: continuous regime
    vals = [(0.0001 + i * 1e-9,) for i in range(500)]
    df = spark.createDataFrame(vals, "x double")
    with pytest.raises(ValueError, match="max_fine_rows"):
        exact_quantile_values(df, "x", [(1, 2)], max_fine_rows=100)
    # generous bound: same data still selects the exact median
    got = exact_quantile_values(df, "x", [(1, 2)], max_fine_rows=1000)
    assert got == [sorted(v[0] for v in vals)[250 - 1]]


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),
            st.integers(min_value=-5_000_000, max_value=5_000_000),
        ),
        min_size=1,
        max_size=100,
    ),
    fracs=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=7),
            st.integers(min_value=1, max_value=8),
        ).filter(lambda t: t[0] <= t[1]),
        min_size=1,
        max_size=3,
    ),
)
@_settings
def test_grouped_quantile_values_match_per_group_sort(spark, rows, fracs):
    """exact_quantile_values_by_group must return, for EVERY group,
    exactly what exact_quantile_values returns on that group's rows
    alone — i.e. the value at ascending rank ceil(num·n_g/den) of each
    group's sorted multiset (ground truth: per-group driver sort)."""
    from streamprocessing_kafka_finlight_news_dashboard_spark.functions.stats import (
        exact_quantile_values_by_group,
    )

    data = [(g, round(v / 1_000_000.0, 6)) for g, v in rows]
    df = spark.createDataFrame(data, "g string, x double")
    got = exact_quantile_values_by_group(df, "g", "x", fracs)
    by_g = {}
    for g, v in data:
        by_g.setdefault(g, []).append(v)
    assert set(got) == set(by_g)
    for g, vals in by_g.items():
        srt = sorted(vals)
        n = len(srt)
        want = [srt[(num * n + den - 1) // den - 1] for num, den in fracs]
        assert got[g] == want, (g, got[g], want)


@given(
    stats=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),
            st.integers(min_value=1, max_value=10**12),
        ),
        min_size=1,
        max_size=8,
        unique_by=lambda t: t[0],
    ),
    alpha=st.sampled_from([0.1, 0.2, 0.3, 0.5, 0.7, 0.9, 1.0]),
)
@_settings
def test_temperature_rates_match_python_replay(spark, stats, alpha):
    """temperature_rates must equal a pure-Python replay of its own
    rounding discipline for ANY token-count table and α — sqrt path
    (α = 1/2) and exp/ln path alike. Python floats are IEEE doubles
    and math.sqrt/exp/log are the same correctly-rounded (sqrt) /
    libm (exp, log) calls the JVM makes on identical inputs after
    each 9dp/6dp rounding, so a mismatch would mean the expression
    shape drifted from the documented discipline. Also pins the
    smallest-source-keeps-exactly-100 invariant at every α."""
    import math

    from streamprocessing_kafka_finlight_news_dashboard_spark.operators.text import temperature_rates
    from tests.test_similarity_ann import _round_half_up

    rows = [(f"l{g}", 1, n) for g, n in stats]
    df = spark.createDataFrame(rows, "lang string, n_docs long, n_tokens long")
    got = {
        r.lang: r.rate_pct
        for r in temperature_rates(df, validate=False, alpha=alpha).collect()
    }
    mn = min(n for _, _, n in rows)
    want = {}
    for lang, _, n in rows:
        ratio = float(mn) / float(n)
        if alpha == 0.5:
            flat = math.sqrt(ratio)
        else:
            # F.round is HALF_UP over the shortest decimal repr —
            # Python's builtin round() (half-even) differs on midpoints
            flat = _round_half_up(
                math.exp((1.0 - alpha) * _round_half_up(math.log(ratio), 9)), 6
            )
        want[lang] = int(math.floor(100.0 * flat))
    assert got == want
    smallest = min(rows, key=lambda r: r[2])[0]
    assert got[smallest] == 100


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["aa", "bb", "ccc", "dddd", "e"]),
            min_size=2,
            max_size=30,
        ),
        min_size=1,
        max_size=6,
    ),
)
@_settings
def test_repetition_report_matches_python_reference(spark, docs):
    """For ANY corpus over a tiny vocabulary (maximally repetitive —
    the regime the Gopher caps exist for), every n-gram coverage
    fraction from the one-pass Spark plan equals a brute-force Python
    reference: top-n coverage = max-count gram's (count x non-space
    chars) over doc non-space chars with the lexicographic tie-break,
    dup-n coverage = the same sum over all grams occurring >= 2x."""
    from collections import Counter

    from streamprocessing_kafka_finlight_news_dashboard_spark.operators.text import repetition_report

    rows = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in repetition_report(rows).collect()}
    for i, toks in enumerate(docs):
        nonspace = sum(len(t) for t in toks)
        expect = {}
        for n in range(2, 11):
            grams = [tuple(toks[j : j + n]) for j in range(len(toks) - n + 1)]
            if not grams:
                expect[f"top_{n}"] = 0.0 if n <= 4 else None
                expect[f"dup_{n}"] = 0.0
                continue
            counts = Counter(grams)
            mx = max(counts.values())
            top = min(g for g, c in counts.items() if c == mx)
            expect[f"top_{n}"] = round(mx * sum(len(t) for t in top) / nonspace, 6)
            expect[f"dup_{n}"] = round(
                sum(c * sum(len(t) for t in g) for g, c in counts.items() if c >= 2)
                / nonspace,
                6,
            )
        if all(len(toks) < n for n in range(2, 11)):
            assert i not in got  # no gram of any grade: doc drops (both engines)
            continue
        r = got[i]
        for n in (2, 3, 4):
            if len(toks) >= n:
                assert getattr(r, f"top_{n}gram_char_frac") == expect[f"top_{n}"], (
                    i, n, toks)
            else:
                assert getattr(r, f"top_{n}gram_char_frac") == 0.0
        for n in range(5, 11):
            if len(toks) >= n:
                assert getattr(r, f"dup_{n}gram_char_frac") == expect[f"dup_{n}"], (
                    i, n, toks)
            else:
                assert getattr(r, f"dup_{n}gram_char_frac") == 0.0


@given(
    prefix_a=st.lists(st.sampled_from(["xq", "wz", "vy", "um", "tn"]), max_size=20),
    suffix_b=st.lists(st.sampled_from(["kp", "jr", "hs", "gt", "fu"]), max_size=20),
    shared=st.lists(
        st.sampled_from(["m1", "m2", "m3", "m4", "m5", "m6"]),
        min_size=8,
        max_size=14,
    ),
)
@_settings
def test_winnow_guarantee_any_shared_span(spark, prefix_a, suffix_b, shared):
    """Schleimer et al.'s detection guarantee, property-tested: for ANY
    two documents sharing a contiguous span of >= k + w - 1 = 8 tokens
    (whatever surrounds it), winnowing selects at least one common
    fingerprint and the pair operator reports them. Also pins the
    subset property: every selected fingerprint is one of the doc's
    span hashes."""
    from streamprocessing_kafka_finlight_news_dashboard_spark.operators.dedup import winnow_overlap_pairs
    from streamprocessing_kafka_finlight_news_dashboard_spark.operators.text import (
        rolling_window_hashes,
        winnow_fingerprints,
    )

    a = " ".join(prefix_a + shared)
    b = " ".join(shared + suffix_b)
    df = spark.createDataFrame([(1, a), (2, b)], "doc_id long, text string")
    pairs = winnow_overlap_pairs(df).collect()
    assert any((r.id_a, r.id_b) == (1, 2) for r in pairs), (a, b)
    subset = df.select(
        F.size(
            F.array_except(
                winnow_fingerprints(F.col("text")),
                rolling_window_hashes(F.col("text")),
            )
        ).alias("extra")
    ).collect()
    assert all(r.extra == 0 for r in subset)


@given(
    counts=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 500), st.integers(0, 500)),
        min_size=1,
        max_size=10,
        unique_by=lambda t: t[0],
    )
)
@_settings
def test_psi_from_counts_nonnegative_and_reflexive(spark, counts):
    """PSI properties over arbitrary histograms: every bucket term
    (p_cur − p_base)·ln(p_cur/p_base) has matching signs, so PSI ≥ 0
    (up to the scaled-long term rounding, which can only clip toward
    zero); and a histogram against itself is EXACTLY 0.0."""
    from streamprocessing_kafka_finlight_news_dashboard_spark.operators.text import psi_from_counts

    base = spark.createDataFrame(
        [("f", b, cb) for b, cb, _ in counts],
        "feature string, bucket int, cnt long",
    )
    cur = spark.createDataFrame(
        [("f", b, cc) for b, _, cc in counts],
        "feature string, bucket int, cnt long",
    )
    row = psi_from_counts(base, cur).first()
    assert row.psi >= 0.0, row
    same = psi_from_counts(base, base).first()
    assert same.psi == 0.0 and same.drift == "stable"


@given(
    counts=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 500), st.integers(0, 500)),
        min_size=1,
        max_size=8,
        unique_by=lambda t: t[0],
    ),
    n_periods=st.integers(1, 3),
)
@_settings
def test_psi_trend_from_counts_reflexive_per_period(spark, counts, n_periods):
    """Trend-form PSI properties: a period whose histogram EQUALS the
    frozen reference reports exactly 0.0/'stable' for that period; a
    period with a different histogram reports PSI ≥ 0; and the report
    carries exactly |periods|×|features| rows regardless of which
    buckets are populated."""
    from streamprocessing_kafka_finlight_news_dashboard_spark.operators.text import psi_trend_from_counts

    base = spark.createDataFrame(
        [("f", b, cb) for b, cb, _ in counts],
        "feature string, bucket int, cnt long",
    )
    rows = []
    for p in range(n_periods):
        for b, cb, cc in counts:
            # even periods replay the reference; odd ones the cur side
            rows.append((f"p{p}", "f", b, cb if p % 2 == 0 else cc))
    trend = spark.createDataFrame(
        rows, "period string, feature string, bucket int, cnt long"
    )
    got = {r.period: r for r in psi_trend_from_counts(base, trend).collect()}
    assert len(got) == n_periods
    for p in range(n_periods):
        r = got[f"p{p}"]
        if p % 2 == 0:
            assert r.psi == 0.0 and r.drift == "stable", r
        else:
            assert r.psi >= 0.0, r


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from("alpha beta gamma delta eps zeta".split()),
            min_size=1,
            max_size=8,
        ),
        min_size=1,
        max_size=6,
    )
)
@_settings
def test_ngram_novelty_self_is_zero(spark, docs):
    """Novelty invariants over arbitrary corpora: a corpus scored
    against ITSELF has novelty exactly 0.0 for every document (every
    gram is by definition in the reference), n_novel ≤ n_grams always,
    and against a disjoint-vocabulary reference every gram-bearing doc
    scores exactly 1.0."""
    from streamprocessing_kafka_finlight_news_dashboard_spark.operators.dedup import ngram_novelty

    corpus = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string",
    )
    for r in ngram_novelty(corpus, corpus, n=3).collect():
        assert r.n_novel == 0 and r.novelty_rate == 0.0, r
        assert r.n_grams > 0
    alien = spark.createDataFrame(
        [(99, "qq rr ss tt uu vv ww")], "doc_id long, text string"
    )
    for r in ngram_novelty(corpus, alien, n=3).collect():
        assert r.n_novel == r.n_grams and r.novelty_rate == 1.0, r
