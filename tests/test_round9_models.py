"""Python-model checks for the round-9 composed operators: each
engine result is replayed by an independent pure-Python implementation
(third referee alongside the DuckDB oracle — the round-8 DuckDB
list-aggregation incident showed the oracle engine itself can be the
wrong party on order- or arithmetic-sensitive compositions)."""

from __future__ import annotations

import random
from collections import Counter


def _py_gopher(text: str, stopwords: tuple[str, ...]):
    toks = text.strip().split()
    n = len(toks)
    sum_len = sum(len(t) for t in toks)
    low = [t.lower() for t in toks]
    d = len(set(low))
    sw = len({t for t in low if t in stopwords})
    mwl_c = sum_len * 100 // n
    uniq_bp = d * 10000 // n
    r_len = int(20 <= n <= 100000)
    r_mwl = int(300 <= mwl_c <= 1000)
    r_uniq = int(uniq_bp >= 2000)
    r_sw = int(sw >= 2)
    return (n, mwl_c, uniq_bp, sw, r_len, r_mwl, r_uniq, r_sw,
            r_len * r_mwl * r_uniq * r_sw)


def test_gopher_rules_match_python_model(spark):
    from flink_demo_spark.operators.text import STOPWORDS
    from flink_demo_spark.plans.corpus import gopher_rules_frame

    rng = random.Random(91)
    words = ["alpha", "Beta", "the", "of", "to", "x", "yz", "longword",
             "supercalifragilistic", "a"]
    rows = []
    for i in range(40):
        n = rng.randrange(1, 60)
        rows.append((i, " ".join(rng.choice(words) for _ in range(n))))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_words, r.mwl_c, r.uniq_bp, r.n_sw_distinct,
                   r.r_len, r.r_mwl, r.r_uniq, r.r_sw, r.keep)
        for r in gopher_rules_frame(df).collect()
    }
    for i, text in rows:
        assert got[i] == _py_gopher(text, STOPWORDS), (i, text)


def test_hourly_mad_outliers_match_python_model(spark):
    """Exact 2x-median / 4x-MAD flags vs a pure-Python replay on a
    series with one engineered spike and one quiet hour."""
    import datetime as dt

    from flink_demo_spark.plans.registry import REGISTRY, _load_all

    _load_all()
    rng = random.Random(917)
    base = dt.datetime(1970, 1, 5)
    counts = [rng.randrange(8, 13) for _ in range(20)]
    counts[7] = 90   # spike
    counts[13] = 1   # quiet hour
    rows = []
    eid = 0
    for h, c in enumerate(counts):
        for _ in range(c):
            rows.append((eid, base + dt.timedelta(hours=h, minutes=eid % 50)))
            eid += 1
    import os
    import tempfile

    d = tempfile.mkdtemp(prefix="mad_model_")
    spark.createDataFrame(rows, "event_id long, ts timestamp").write.mode(
        "overwrite"
    ).parquet(os.path.join(d, "events.parquet"))

    # python model
    def two_mid(xs):
        s = sorted(xs)
        h = len(s)
        return s[(h + 1) // 2 - 1] + s[h // 2]

    med2 = two_mid(counts)
    dev2 = [abs(2 * c - med2) for c in counts]
    mad4 = two_mid(dev2)
    expect = {
        h: (c, abs(2 * c - med2), mad4, int(2 * abs(2 * c - med2) > 3 * mad4))
        for h, c in enumerate(counts)
    }

    # the registry query reads the events table from a dir; feed ours.
    # (ts here is a plain µs timestamp — the loader's ns normalization
    # is a no-op for it.)
    out = REGISTRY["events_hourly_mad_outliers"].fn(spark, d)
    got = {
        int((r.window_start - base).total_seconds() // 3600):
            (r.cnt, r.dev2, r.mad4, r.is_outlier)
        for r in out.collect()
    }
    assert got == expect
    assert got[7][3] == 1 and got[13][3] == 1
    assert sum(v[3] for v in got.values()) == 2


def test_triangle_count_matches_python_model(spark):
    """Triangle census vs itertools on a random graph built the same
    way (per-user lag edges)."""
    from itertools import combinations

    from flink_demo_spark.plans.registry import REGISTRY, _load_all

    _load_all()
    rng = random.Random(9173)
    rows = []
    eid = 0
    import datetime as dt
    import json as _json
    import os
    import tempfile

    base = dt.datetime(1970, 1, 10)
    for u in range(12):
        for s in range(rng.randrange(2, 9)):
            page = rng.randrange(0, 7)
            rows.append(
                (eid, u, base + dt.timedelta(seconds=eid),
                 _json.dumps({"k": page}))
            )
            eid += 1
    d = tempfile.mkdtemp(prefix="tri_model_")
    spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, props string"
    ).write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))

    # python model
    by_user: dict[int, list] = {}
    for eid_, u, ts, props in rows:
        by_user.setdefault(u, []).append((ts, eid_, _json.loads(props)["k"]))
    edges = set()
    for seq in by_user.values():
        seq.sort()
        for (_, _, a), (_, _, b) in zip(seq, seq[1:]):
            if a != b:
                edges.add((min(a, b), max(a, b)))
    nodes = {v for e in edges for v in e}
    tri = sum(
        1
        for x, y, z in combinations(sorted(nodes), 3)
        if (x, y) in edges and (y, z) in edges and (x, z) in edges
    )
    r = REGISTRY["browse_triangle_count"].fn(spark, d).collect()[0]
    assert (r.n_nodes, r.n_edges, r.n_triangles) == (len(nodes), len(edges), tri)


def test_oov_and_blocklist_match_python_model(spark):
    import os
    import tempfile

    from flink_demo_spark.plans.registry import REGISTRY, _load_all

    _load_all()
    rng = random.Random(77)
    words = [f"w{i}" for i in range(30)] + ["slow", "scan", "spam"]
    rows = []
    for i in range(50):
        n = rng.randrange(3, 40)
        # Zipf-ish skew so the top-16 vocab is non-trivial
        rows.append(
            (i, " ".join(
                words[min(rng.randrange(0, 33), rng.randrange(0, 33))]
                for _ in range(n)
            ), "en", "src0", 0)
        )
    d = tempfile.mkdtemp(prefix="oov_model_")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))

    census = Counter()
    for _, text, *_ in rows:
        census.update(t.lower() for t in text.strip().split())
    vocab = {t for t, _ in sorted(census.items(), key=lambda kv: (-kv[1], kv[0]))[:16]}

    got = {
        r.doc_id: (r.n_tokens, r.n_oov, r.oov_bp)
        for r in REGISTRY["text_oov_rate"].fn(spark, d).collect()
    }
    bl = {"slow", "spam", "casino", "scan"}
    got_bl = {
        r.doc_id: (r.n_hits, r.n_terms, r.hit_bp, r.flagged)
        for r in REGISTRY["text_blocklist_filter"].fn(spark, d).collect()
    }
    for i, text, *_ in rows:
        toks = [t.lower() for t in text.strip().split()]
        oov = sum(1 for t in toks if t not in vocab)
        assert got[i] == (len(toks), oov, oov * 10000 // len(toks)), i
        hits = [t for t in toks if t in bl]
        hb = len(hits) * 10000 // len(toks)
        assert got_bl[i] == (len(hits), len(set(hits)), hb, int(hb >= 500)), i


def test_knn_graph_mutual_matches_numpy_model(spark, sf_dir):
    """Mutual top-3 edges vs a numpy replay on the real sf0.001
    embeddings (same rounding, same tie-break)."""
    import numpy as np

    from flink_demo_spark.catalog import load_table
    from flink_demo_spark.plans.registry import REGISTRY, _load_all

    _load_all()
    emb = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    ids = sorted(emb)
    sims = {}
    for i in ids:
        vi = emb[i]
        ni = float(np.sqrt(np.dot(vi, vi)))
        for j in ids:
            if j <= i:
                continue
            vj = emb[j]
            raw = float(np.dot(vi, vj)) / (ni * float(np.sqrt(np.dot(vj, vj))))
            if raw >= 0.4:  # the query's candidate floor
                sims[(i, j)] = round(raw, 6)

    def topk(src):
        cand = []
        for dst in ids:
            if dst == src:
                continue
            key = (min(src, dst), max(src, dst))
            if key in sims:
                cand.append((-sims[key], dst))
        cand.sort()
        return {dst: rk + 1 for rk, (_, dst) in enumerate(cand[:3])}

    tk = {i: topk(i) for i in ids}
    expect = {}
    for a in ids:
        for b, rab in tk[a].items():
            if a < b and a in tk[b]:
                expect[(a, b)] = (rab, tk[b][a],
                                  sims[(a, b)])
    got = {
        (r.a, r.b): (r.rank_ab, r.rank_ba, r.cosine_sim)
        for r in REGISTRY["knn_graph_mutual"].fn(spark, sf_dir).collect()
    }
    # numpy dot vs the engine's sequential fold can differ in the last
    # ulp; compare ranks exactly and sims to 5dp
    assert set(got) == set(expect)
    for k, (rab, rba, s) in expect.items():
        grab, grba, gs = got[k]
        assert (grab, grba) == (rab, rba), k
        assert abs(gs - s) < 2e-6, k
