"""Property-based tests (SURVEY §5.2): invariants over generated inputs."""

import datetime

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pipeline_etl_website_visits_spark.functions import ratio_round


# ratio_round is the determinism linchpin for every cross-engine ratio; prove
# it against Python's exact Fraction-based half-up rounding.
@given(num=st.integers(min_value=0, max_value=10**9), den=st.integers(min_value=1, max_value=10**6))
@settings(max_examples=200, deadline=None)
def test_ratio_round_is_exact_half_up(num, den):
    import fractions

    for decimals in (2, 3):
        scale = 10**decimals
        expected = (fractions.Fraction(num, den) * scale + fractions.Fraction(1, 2)) // 1
        got = (num * 2 * scale + den) // (2 * den)
        assert got == int(expected)


def _mk_rows(emails_dates):
    from tests.fixtures import valid_row

    rows = []
    for i, (email_ok, dates_bad) in enumerate(emails_dates):
        r = valid_row(i)
        if not email_ok:
            r[0] = "not-an-email"
        for j in range(dates_bad):
            r[4 + (0 if j == 0 else 1)] = "bad-date"  # Fecha envio, Fecha open
        rows.append(r)
    return rows


@given(
    spec=st.lists(
        st.tuples(st.booleans(), st.integers(min_value=0, max_value=2)), min_size=1, max_size=30
    )
)
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_row_count_conservation_and_error_expansion(spark, tmp_path_factory, spec):
    """|valid| + |invalid| = |input|; |errores| = Σ failed checks per row
    (the reference's own logged invariant, utils/utils_transform.py:181-189)."""
    import uuid

    from tests.fixtures import HEADER, write_csv
    from pipeline_etl_website_visits_spark.etl.pipeline import read_report
    from pipeline_etl_website_visits_spark.etl.transform import transform_file, with_validity_flags

    d = tmp_path_factory.mktemp("prop")
    path = write_csv(str(d / f"report_{uuid.uuid4().hex}.txt"), HEADER, _mk_rows(spec))
    raw = read_report(spark, path)
    stats, _, errores = transform_file(raw, "f.txt")
    flagged = with_validity_flags(raw)

    n_input = len(spec)
    n_valid = sum(1 for ok, bad in spec if ok and bad == 0)
    n_errors = sum((0 if ok else 1) + bad for ok, bad in spec)
    assert flagged.count() == n_input
    assert stats.count() == n_valid
    assert errores.count() == n_errors


@given(counts=st.lists(st.integers(min_value=1, max_value=5), min_size=1, max_size=5))
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_merge_totals_additive_over_batches(spark, counts):
    """visitasTotales after N merges equals the sum of per-batch counts."""
    from pipeline_etl_website_visits_spark.etl.load import VISITANTES_SCHEMA
    from pipeline_etl_website_visits_spark.operators.merge import visitantes_merge

    D = datetime.date
    target = spark.createDataFrame([], VISITANTES_SCHEMA)
    for c in counts:
        batch = spark.createDataFrame(
            [("a@example.com", D(2026, 8, 1), D(2026, 8, 2), c, c, c)], VISITANTES_SCHEMA
        )
        target = visitantes_merge(target, batch, process_date="2026-08-28")
    row = target.filter(F.col("email") == "a@example.com").first()
    assert row["visitasTotales"] == sum(counts)
    assert row["visitasAnioActual"] == sum(counts)
    assert row["fechaPrimeraVisita"] == D(2026, 8, 1)


@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["tok%d" % i for i in range(12)]), min_size=1, max_size=120
        ).map(" ".join),
        min_size=1,
        max_size=8,
    ),
    window=st.integers(min_value=2, max_value=20),
)
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_chunking_covers_every_token_and_respects_window(spark, texts, window):
    """Chunk invariants for any corpus/window: every chunk ≤ window tokens,
    chunk starts advance by exactly stride, the union of [start, start+len)
    ranges covers [0, n) with no gaps."""
    from pipeline_etl_website_visits_spark.operators.text import chunk_documents

    stride = max(window - 1, 1)
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id int, text string")
    rows = chunk_documents(df, "text", "doc_id", window=window, stride=stride).collect()
    n_toks = {i: len(t.split()) for i, t in enumerate(texts)}
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append((r["chunk_idx"], r["n_chunk_tokens"]))
    for doc_id, chunks in by_doc.items():
        chunks.sort()
        covered_to = 0
        for idx, (chunk_idx, n) in enumerate(chunks):
            assert chunk_idx == idx
            assert 1 <= n <= window
            start = chunk_idx * stride
            assert start <= covered_to  # no gap
            covered_to = max(covered_to, start + n)
        assert covered_to == n_toks[doc_id]  # full coverage, exact tail


@given(
    docs=st.lists(
        st.lists(st.sampled_from(["a", "b", "c", "d", "e"]), min_size=1, max_size=30).map(" ".join),
        min_size=1,
        max_size=6,
    )
)
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_repetition_metrics_match_python_reference(spark, docs):
    """dup_token_ratio and top_token_frac agree with an exact Python
    recomputation (including the tie rule) on arbitrary corpora."""
    from collections import Counter

    from pipeline_etl_website_visits_spark.operators.text import repetition_features

    df = spark.createDataFrame(list(enumerate(docs)), "doc_id int, text string")
    out = {r["doc_id"]: r for r in repetition_features(df, "text", "doc_id").collect()}
    for i, text in enumerate(docs):
        toks = text.split()
        c = Counter(toks)
        r = out[i]
        assert r["n_tokens"] == len(toks)
        assert r["n_distinct_tokens"] == len(c)
        top = max(c.items(), key=lambda kv: (kv[1], kv[0]))  # count, then token desc
        assert r["top_token"] == top[0]
        assert r["top_token_frac"] == ((top[1] * 2000 + len(toks)) // (2 * len(toks))) / 1000.0


@given(
    pts=st.lists(
        st.tuples(st.integers(min_value=0, max_value=15), st.integers(min_value=0, max_value=15)),
        min_size=1,
        max_size=60,
    )
)
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_skyline_dominance_invariants(spark, pts):
    """For ANY point set: (a) every returned point is non-dominated, (b)
    every omitted point is dominated by some input point, (c) result is
    independent of partitioning."""
    from pipeline_etl_website_visits_spark.operators.skyline import skyline_2d

    rows = [(i, x, float(y)) for i, (x, y) in enumerate(pts)]
    df = spark.createDataFrame(rows, "id long, x int, y double")
    got = {r["id"] for r in skyline_2d(df, "x", "y").collect()}
    got_repart = {r["id"] for r in skyline_2d(df.repartition(7), "x", "y").collect()}
    assert got == got_repart

    def dominated(i, x, y):
        return any(
            (bx >= x and by <= y and (bx > x or by < y)) for j, bx, by in rows if j != i
        )

    for i, x, y in rows:
        assert (i not in got) == dominated(i, x, y), (i, x, y, sorted(got))


@given(
    docs=st.lists(
        st.lists(st.sampled_from(["a", "b", "c", "d", "e", "f", "g", "hot"]), min_size=1, max_size=12),
        min_size=1,
        max_size=25,
    ),
    denom=st.sampled_from([4, 8, 16]),
)
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_heavy_hitters_exact_for_any_corpus(spark, docs, denom):
    """For ANY corpus and threshold: the sketch-then-verify result equals
    the brute-force frequency filter exactly (capacity >= denom holds)."""
    import collections

    from pipeline_etl_website_visits_spark.operators.text import heavy_hitters

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(5)
    got = [(r["token"], r["cnt"]) for r in heavy_hitters(df, "text", denom=denom, capacity=denom + 7).collect()]

    cnt = collections.Counter(t for _, txt in rows for t in txt.split(" "))
    n = sum(cnt.values())
    want = sorted(((t, c) for t, c in cnt.items() if c * denom >= n), key=lambda tc: (-tc[1], tc[0]))
    assert got == want


@given(
    corpus=st.lists(
        st.lists(
            st.sampled_from(["alpha", "beta", "gamma", "delta", "eps"]),
            min_size=1,
            max_size=12,
        ),
        min_size=2,
        max_size=10,
    )
)
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_zipf_slope_matches_reference_ols(spark, corpus):
    """Any corpus: the operator's integer-quantized OLS slope equals the
    same formula computed in plain Python over the same quantized points
    (rank by count desc then token asc — the operator's tie rule)."""
    import math
    from collections import Counter

    from pipeline_etl_website_visits_spark.operators.text import zipf_slope

    df = spark.createDataFrame(
        [(i, " ".join(doc)) for i, doc in enumerate(corpus)],
        "doc_id long, text string",
    )
    cnt = Counter(t for doc in corpus for t in doc)
    ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    pts = [
        (math.floor(math.log(r + 1) * 1e6), math.floor(math.log(c) * 1e6))
        for r, (_, c) in enumerate(ranked)
    ]
    out = zipf_slope(df, "text").collect()[0]
    assert out["n_points"] == len(pts)
    if len(pts) < 2 or len({x for x, _ in pts}) < 2:
        return  # degenerate fit: slope undefined (den=0) — NULL/NaN fine
    n = len(pts)
    sx = sum(x for x, _ in pts); sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts); sxx = sum(x * x for x, _ in pts)
    den = n * sxx - sx * sx
    want = round((n * sxy - sx * sy) / den, 6)
    assert out["zipf_slope"] == want


@given(
    docs=st.lists(
        st.tuples(
            st.sampled_from(["s1", "s2", "s3"]),
            st.lists(
                st.sampled_from(["a", "b", "c", "d", "e", "f"]),
                min_size=3,
                max_size=8,
            ),
        ),
        min_size=2,
        max_size=8,
    )
)
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_source_overlap_matches_brute_force(spark, docs):
    """Any corpus: the HOF pair-expansion result equals the brute-force
    (source, gram) pair intersection computed in Python."""
    from collections import defaultdict

    from pipeline_etl_website_visits_spark.operators.dedup import (
        source_overlap_matrix,
    )

    df = spark.createDataFrame(
        [(i, " ".join(toks), src) for i, (src, toks) in enumerate(docs)],
        "doc_id long, text string, source string",
    )
    by_src = defaultdict(set)
    for src, toks in docs:
        for i in range(len(toks) - 2):
            by_src[src].add(" ".join(toks[i : i + 3]))
    want = {}
    srcs = sorted(by_src)
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            shared = len(by_src[a] & by_src[b])
            if shared:
                want[(a, b)] = shared
    got = {
        (r["source_a"], r["source_b"]): r["shared_grams"]
        for r in source_overlap_matrix(df, "text", "doc_id", "source").collect()
    }
    assert got == want


@given(
    baskets=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=6),  # basket id
            st.integers(min_value=1, max_value=9),  # item
        ),
        min_size=1,
        max_size=24,
    )
)
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_co_occurrence_matches_brute_force(spark, baskets):
    """Any basket multiset: HOF pair expansion == brute-force per-basket
    distinct-pair counting (each pair once per basket, a < b canonical)."""
    from collections import defaultdict
    from itertools import combinations

    from pipeline_etl_website_visits_spark.operators.itemsets import co_occurrence_pairs

    df = spark.createDataFrame(baskets, "l_orderkey long, l_partkey long")
    by_basket = defaultdict(set)
    for b, i in baskets:
        by_basket[b].add(i)
    want = defaultdict(int)
    for items in by_basket.values():
        for a, b in combinations(sorted(items), 2):
            want[(a, b)] += 1
    got = {
        (r.item_a, r.item_b): r.n_baskets
        for r in co_occurrence_pairs(df, basket_col="l_orderkey", item_col="l_partkey").collect()
    }
    assert got == dict(want)


@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),  # user
            st.sampled_from(["a", "b", "c"]),
        ),
        min_size=1,
        max_size=20,
    )
)
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_event_transitions_match_brute_force(spark, events):
    """Any event log: transition counts == per-user consecutive pairs in
    (ts, event_id) order, and ppm = floor(n*1e6 / from-total)."""
    import datetime
    from collections import defaultdict

    from pipeline_etl_website_visits_spark.operators.timeseries import event_transitions

    rows = [
        (i, datetime.datetime(2024, 1, 1) + datetime.timedelta(minutes=i), u, t, 0.0, None)
        for i, (u, t) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    seqs = defaultdict(list)
    for i, (u, t) in enumerate(events):
        seqs[u].append(t)  # event_id order == ts order by construction
    want = defaultdict(int)
    for seq in seqs.values():
        for frm, to in zip(seq, seq[1:]):
            want[(frm, to)] += 1
    from_tot = defaultdict(int)
    for (frm, _), n in want.items():
        from_tot[frm] += n
    got = {(r.from_type, r.to_type): (r.n, r.prob_ppm) for r in event_transitions(df).collect()}
    assert got == {
        (f, t): (n, n * 1_000_000 // from_tot[f]) for (f, t), n in want.items()
    }


@given(
    vals=st.lists(
        st.integers(min_value=-50, max_value=50).map(float), min_size=1, max_size=25
    )
)
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_mad_outliers_match_numpy(spark, vals):
    """Any value list: med/MAD equal numpy's exact medians and the flag
    count equals the brute-force |v-med| > 3*MAD count."""
    import datetime

    import numpy as np

    from pipeline_etl_website_visits_spark.operators.timeseries import mad_outliers

    rows = [
        (i, datetime.datetime(2024, 1, 1), 1, "g", v, None) for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    med = float(np.median(vals))
    adev = np.abs(np.array(vals) - med)
    mad = float(np.median(adev))
    n_out = int((adev > 3 * mad).sum())
    (r,) = mad_outliers(df, group_col="event_type", value_col="value", k=3.0).collect()
    assert (r.med, r.mad, r.n_outliers, r.n_rows) == (round(med, 6), round(mad, 6), n_out, len(vals))


@given(
    texts=st.lists(
        st.text(alphabet="ab xyQ ", min_size=0, max_size=30), min_size=1, max_size=8
    ),
    vocab=st.lists(st.sampled_from(["a", "b", "ab", "x", "q"]), min_size=1, max_size=4),
)
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_oov_counts_matches_python_reference(spark, texts, vocab):
    """oov_counts == a pure-Python recount of the same normalize+split
    rule, over fuzzed whitespace/case/empty-string shapes."""
    import re

    from pipeline_etl_website_visits_spark.operators.text import oov_counts

    df = spark.createDataFrame(
        [("s", i, t) for i, t in enumerate(texts)],
        "source string, doc_id long, text string",
    )
    got = {
        r["source"]: (r["n_tokens"], r["n_oov"])
        for r in oov_counts(df, vocab, "text", "doc_id", "source").collect()
    }
    vset = set(vocab)
    n_toks = n_oov = 0
    for t in texts:
        toks = re.sub(r"\s+", " ", t.strip().lower()).split(" ")
        n_toks += len(toks)
        n_oov += sum(1 for tok in toks if tok not in vset)
    assert got == {"s": (n_toks, n_oov)}


@given(seed=st.integers(min_value=0, max_value=2**31 - 1))
@settings(max_examples=5, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_leakage_free_split_matches_python_reference(spark, seed):
    """leakage_free_split == a pure-Python md5-prefix replica on random
    doc contents (the engine must add nothing beyond the documented
    hash rule)."""
    import hashlib
    import random
    import re

    from pipeline_etl_website_visits_spark.operators.text import (
        leakage_free_split,
        split_bounds,
    )

    rng = random.Random(seed)
    rows = [(i, " ".join(f"w{rng.randint(0, 50)}" for _ in range(rng.randint(0, 8))))
            for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["split"] for r in leakage_free_split(df, "text", "doc_id").collect()}
    lo, hi = split_bounds(0.8, 0.1)
    want = {}
    for did, text in rows:
        norm = re.sub(r"\s+", " ", text.strip().lower())
        pref = hashlib.md5(norm.encode()).hexdigest()[:8]
        want[did] = "train" if pref < lo else ("val" if pref < hi else "test")
    assert got == want


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["g1", "g2", "g3"]),
            st.integers(min_value=0, max_value=6),  # low-cardinality scores: ties
        ),
        min_size=1,
        max_size=40,
    ),
    pm=st.sampled_from([0, 133, 500, 999, 1000]),
)
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_stratified_top_fraction_matches_python_reference(spark, rows, pm):
    """Both methods == a pure-Python re-derivation of 'keep exactly
    k = cnt*pm DIV 1000 rows per group by (score desc, id asc)' over
    fuzzed tie-heavy shapes."""
    import pyspark.sql.functions as F

    from pipeline_etl_website_visits_spark.operators.text import stratified_top_fraction

    data = [(g, i, s) for i, (g, s) in enumerate(rows)]
    df = spark.createDataFrame(data, "grp string, id long, score long")

    want = set()
    by_g: dict = {}
    for g, i, s in data:
        by_g.setdefault(g, []).append((i, s))
    for g, members in by_g.items():
        k = len(members) * pm // 1000
        ranked = sorted(members, key=lambda t: (-t[1], t[0]))
        want |= {(g, i, s) for i, s in ranked[:k]}

    for method in ("window", "histogram"):
        got = {
            tuple(r)
            for r in stratified_top_fraction(
                df, F.col("score"), "grp", "id", pm, method=method
            ).collect()
        }
        assert got == want, (method, pm)


@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    c=st.integers(1, 3),
    factor=st.integers(1, 5),
    seed=st.integers(0, 2**16),
)
@settings(max_examples=60, deadline=None)
def test_block_mean_resize_matches_brute_force(h, w, c, factor, seed):
    """Pure-kernel property: every output pixel is floor(sum/count) over
    its (ragged-edge-aware) block, for any geometry and factor."""
    import numpy as np

    from pipeline_etl_website_visits_spark.operators.multimodal import block_mean_resize

    rng = np.random.RandomState(seed)
    px = rng.randint(0, 256, (h, w, c)).astype(np.uint8)
    out = block_mean_resize(px, factor=factor)
    oh, ow = -(-h // factor), -(-w // factor)
    assert out.shape == (oh, ow, c)
    for by in range(oh):
        for bx in range(ow):
            blk = px[by * factor : min((by + 1) * factor, h),
                     bx * factor : min((bx + 1) * factor, w)].astype(int)
            n = blk.shape[0] * blk.shape[1]
            assert (out[by, bx] == blk.reshape(n, c).sum(axis=0) // n).all()


@given(
    frames=st.lists(
        st.tuples(st.integers(1, 8), st.integers(1, 8), st.integers(0, 255)),
        min_size=0,
        max_size=6,
    )
)
@settings(max_examples=40, deadline=None)
def test_npv_container_roundtrip(frames):
    """NPV encode/decode round-trips any frame list (including empty),
    preserving order, geometry, and pixel values."""
    import numpy as np

    from pipeline_etl_website_visits_spark.operators.multimodal import npv_decode, npv_encode

    arrs = [np.full((h, w), v, dtype=np.uint8) for h, w, v in frames]
    dec = npv_decode(npv_encode(arrs))
    assert len(dec) == len(arrs)
    for a, d in zip(arrs, dec):
        assert d.shape == (a.shape[0], a.shape[1], 1)
        assert (d[:, :, 0] == a).all()


@given(
    legs=st.lists(
        st.lists(
            st.tuples(st.sampled_from(["qa", "qb"]), st.integers(0, 20)),
            min_size=0,
            max_size=15,
            unique_by=lambda t: t,
        ),
        min_size=1,
        max_size=3,
    ),
    k=st.integers(1, 8),
    c=st.integers(0, 100),
)
@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_reciprocal_rank_fusion_matches_python_reference(spark, legs, k, c):
    """RRF over arbitrary ranked legs equals the pure-python fusion:
    ranks are assigned per leg by (query, doc) insertion order, fused
    scores are exact integer sums, final order (score desc, doc asc)."""
    leg_dfs, py_legs = [], []
    for leg in legs:
        ranked, seen = [], {}
        for q, d in leg:
            seen.setdefault(q, 0)
            seen[q] += 1
            ranked.append((q, d, seen[q]))
        py_legs.append(ranked)
        leg_dfs.append(
            spark.createDataFrame(ranked or [("__none__", -1, 1)], "query_id string, doc_id long, rank int")
            .where("doc_id >= 0")
        )

    from pipeline_etl_website_visits_spark.operators.similarity import reciprocal_rank_fusion

    got = [
        (r["query_id"], r["doc_id"], r["rrf_micro"], r["n_legs"], r["rank"])
        for r in reciprocal_rank_fusion(leg_dfs, k=k, c=c).collect()
    ]

    fused: dict = {}
    for ranked in py_legs:
        for q, d, rk in ranked:
            s, n = fused.get((q, d), (0, 0))
            fused[(q, d)] = (s + 1000000 // (c + rk), n + 1)
    expect = []
    for q in sorted({q for q, _ in fused}):
        rows = sorted(
            ((-s, d, n) for (qq, d), (s, n) in fused.items() if qq == q),
        )
        for i, (negs, d, n) in enumerate(rows[:k], start=1):
            expect.append((q, d, -negs, n, i))
    assert sorted(got) == sorted(expect)


@given(
    events=st.lists(
        st.tuples(
            st.integers(0, 3),          # user
            st.integers(0, 50),         # ts (coarse -> frequent ties)
            st.sampled_from(["view", "click", "purchase", "error"]),
        ),
        min_size=0,
        max_size=40,
    )
)
@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_touch_attribution_matches_python_reference(spark, events):
    """Random event streams (with heavy ts ties) vs a brute-force
    replica: segments from prior-conversion counts, first/last touch by
    (ts, event_id) order, unattributable conversions dropped."""
    from pipeline_etl_website_visits_spark.operators.timeseries import touch_attribution

    rows = [(i, ts, u, ty) for i, (u, ts, ty) in enumerate(events)]
    df = spark.createDataFrame(
        rows or [(0, 0, 0, "error")], "event_id long, ts long, user_id long, event_type string"
    )
    if not rows:
        df = df.where("event_id < 0")

    got = {
        r["purchase_id"]: (r["first_touch"], r["last_touch"], r["n_touches"])
        for r in touch_attribution(df).collect()
    }

    expect = {}
    by_user: dict = {}
    for eid, ts, u, ty in rows:
        by_user.setdefault(u, []).append((ts, eid, ty))
    for u, evs in by_user.items():
        evs.sort()
        seg, touches = 0, {}
        for ts, eid, ty in evs:
            if ty in ("view", "click"):
                touches.setdefault(seg, []).append(ty)
            elif ty == "purchase":
                if touches.get(seg):
                    t = touches[seg]
                    expect[eid] = (t[0], t[-1], len(t))
                seg += 1
    assert got == expect


@given(
    events=st.lists(
        st.tuples(
            st.integers(0, 3),
            st.integers(0, 30),
            st.sampled_from(["view", "click", "purchase"]),
        ),
        min_size=0,
        max_size=40,
    ),
    gap=st.integers(1, 10),
)
@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_timed_funnel_matches_python_reference(spark, events, gap):
    """Earliest-completion timed funnel vs brute force: t1 = min view;
    t2 = min click in (t1, t1+gap]; t3 = min purchase in (t2, t2+gap]."""
    from pipeline_etl_website_visits_spark.operators.timeseries import timed_funnel

    rows = [(i, ts * 1_000_000_000, u, ty) for i, (u, ts, ty) in enumerate(events)]
    df = spark.createDataFrame(
        rows or [(0, 0, 0, "view")], "event_id long, ts long, user_id long, event_type string"
    )
    if not rows:
        df = df.where("event_id < 0")

    out = timed_funnel(df, gap_seconds=gap).collect()[0]

    gN = gap * 1_000_000_000
    by_user: dict = {}
    for eid, ts, u, ty in rows:
        by_user.setdefault(u, []).append((ts, ty))
    n1 = n2 = n3 = 0
    for u, evs in by_user.items():
        views = [t for t, ty in evs if ty == "view"]
        if not views:
            continue
        n1 += 1
        t1 = min(views)
        clicks = [t for t, ty in evs if ty == "click" and t1 < t <= t1 + gN]
        if not clicks:
            continue
        n2 += 1
        t2 = min(clicks)
        purchases = [t for t, ty in evs if ty == "purchase" and t2 < t <= t2 + gN]
        if purchases:
            n3 += 1
    assert (out["n_step1"], out["n_step2"], out["n_step3"]) == (n1, n2, n3)


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 3), st.integers(0, 4)),
        min_size=1,
        max_size=60,
    )
)
@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_t_closeness_tvd_matches_brute_force(spark, rows):
    """x167's integer TVD vs a fraction-exact brute force over random
    (group, bucket, sensitive) populations."""
    from fractions import Fraction

    import pyspark.sql.functions as F

    df = spark.createDataFrame(rows, "g int, bb int, s int").select(
        F.col("g").cast("string").alias("segment"),
        F.col("bb").alias("bal_bucket"),
        F.col("s"),
    )
    gs = df.groupBy("segment", "bal_bucket", "s").agg(F.count("*").cast("long").alias("cnt_gs"))
    g = gs.groupBy("segment", "bal_bucket").agg(F.sum("cnt_gs").cast("long").alias("n_g"))
    sglob = gs.groupBy("s").agg(F.sum("cnt_gs").cast("long").alias("cnt_s"))
    tot = gs.agg(F.sum("cnt_gs").cast("long").alias("n"))
    grid = (
        g.crossJoin(F.broadcast(sglob))
        .join(gs, ["segment", "bal_bucket", "s"], "left")
        .na.fill({"cnt_gs": 0})
        .crossJoin(F.broadcast(tot))
    )
    got = {
        (r["segment"], r["bal_bucket"]): r["tvd_micro"]
        for r in grid.groupBy("segment", "bal_bucket")
        .agg(
            F.expr(
                "CAST((SUM(ABS(cnt_gs * n - cnt_s * n_g)) * 500000) div (MAX(n_g) * MAX(n)) AS BIGINT)"
            ).alias("tvd_micro")
        )
        .collect()
    }

    n = len(rows)
    glob: dict = {}
    groups: dict = {}
    for gg, bb, s in rows:
        glob[s] = glob.get(s, 0) + 1
        groups.setdefault((str(gg), bb), []).append(s)
    for key, members in groups.items():
        n_g = len(members)
        tvd = Fraction(0)
        for s, cnt_s in glob.items():
            cnt_gs = members.count(s)
            tvd += abs(Fraction(cnt_gs, n_g) - Fraction(cnt_s, n))
        expect = int(tvd / 2 * 1_000_000)  # floor via int() on a non-negative Fraction
        assert got[key] == expect, (key, got[key], expect)
