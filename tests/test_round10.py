"""Round-10 pins: the sketch-tier DAU/WAU/MAU pair.

Both queries are oracle-less (DataSketches HLL registers are
engine-specific), so — like uv_approx_hll — their correctness evidence
is (a) an error bound against the EXACT oracle-backed twin and (b)
exact batch/streaming agreement, which HLL's order-insensitive
register max-merge guarantees for identical input.
"""

from __future__ import annotations

import math

from flink_demo_spark.plans.registry import REGISTRY, _load_all

_load_all()

# lgConfigK=12 -> relative standard error ~= 1.04 / sqrt(2^12); the
# 5x multiplier is the same slack uv_approx_hll's bound uses
RSD = 1.04 / math.sqrt(2 ** 12)


def _by_day(df):
    return {
        r["day"]: (r["dau"], r["wau"], r["mau"]) for r in df.collect()
    }


def test_dau_wau_mau_hll_error_bound(spark, sf_dir):
    exact = _by_day(REGISTRY["events_dau_wau_mau"].fn(spark, sf_dir))
    approx = _by_day(REGISTRY["events_dau_wau_mau_hll"].fn(spark, sf_dir))
    assert set(exact) == set(approx)
    for day, ex in exact.items():
        for metric, (e, a) in enumerate(zip(ex, approx[day])):
            assert e > 0
            rel = abs(a - e) / e
            assert rel <= 5 * RSD, (day, metric, a, e, rel)


def test_streaming_hll_twin_equals_batch(spark, sf_dir):
    batch = _by_day(REGISTRY["events_dau_wau_mau_hll"].fn(spark, sf_dir))
    stream = _by_day(REGISTRY["streaming_dau_wau_mau_hll"].fn(spark, sf_dir))
    assert batch == stream


def _toks(t: str) -> list[str]:
    return t.strip().split()


def test_repetition_rules_match_python_model(spark, sf_dir):
    """Independent pure-Python re-derivation of the Gopher repetition
    fractions (most-common 2/3-gram token share, duplicated-5-gram
    position coverage) over every sf0.001 doc."""
    import duckdb

    docs = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    want = {}
    for doc_id, text in docs:
        tk = _toks(text)
        n = len(tk)

        def top_frac(k: int) -> int:
            grams = [" ".join(tk[i : i + k]) for i in range(n - k + 1)]
            if not grams:
                return 0
            counts: dict[str, int] = {}
            for g in grams:
                counts[g] = counts.get(g, 0) + 1
            best = min((-c, g) for g, c in counts.items())
            return (-best[0]) * k * 10000 // n

        g5 = [" ".join(tk[i : i + 5]) for i in range(n - 4)]
        c5: dict[str, int] = {}
        for g in g5:
            c5[g] = c5.get(g, 0) + 1
        covered: set[int] = set()
        for i, g in enumerate(g5):
            if c5[g] >= 2:
                covered.update(range(i, i + 5))
        want[doc_id] = (
            top_frac(2), top_frac(3), len(covered) * 10000 // n
        )

    got = {
        r["doc_id"]: (
            r["top2_frac_bp"], r["top3_frac_bp"], r["dup5_frac_bp"]
        )
        for r in REGISTRY["quality_repetition_rules"].fn(spark, sf_dir).collect()
    }
    assert got == want


def test_substring_removal_matches_python_model(spark, sf_dir):
    """Pure-Python 20-gram corpus census + position-coverage removal:
    the cleaned text must equal the engine's for every affected doc,
    and unaffected docs must not appear."""
    import duckdb

    docs = dict(
        duckdb.sql(
            f"SELECT doc_id, text FROM read_parquet('{sf_dir}/documents.parquet')"
        ).fetchall()
    )
    k = 20
    census: dict[str, int] = {}
    grams = {}
    for doc_id, text in docs.items():
        tk = _toks(text)
        gs = [" ".join(tk[i : i + k]) for i in range(len(tk) - k + 1)]
        grams[doc_id] = gs
        for g in gs:
            census[g] = census.get(g, 0) + 1
    want = {}
    for doc_id, text in docs.items():
        tk = _toks(text)
        covered: set[int] = set()
        for i, g in enumerate(grams[doc_id]):
            if census[g] >= 2:
                covered.update(range(i, i + k))
        if covered:
            clean = " ".join(
                w for i, w in enumerate(tk) if i not in covered
            )
            want[doc_id] = (len(tk), len(covered), clean)

    got = {
        r["doc_id"]: (r["n_toks"], r["n_removed"], r["clean_text"])
        for r in REGISTRY["dedup_substring_removal"].fn(spark, sf_dir).collect()
    }
    assert got == want
    assert len(got) > 0  # sf0.001 must actually contain duplicated passages


def test_chunk_cdc_matches_python_model(spark, sf_dir):
    """Independent pure-Python re-derivation of the content-defined
    chunking: md5-fold 60-bit digest of each 3-token window, cut where
    digest % 16 == 0, chunks hashed by content. Also asserts the
    partition property (chunks tile the token array exactly) and the
    CDC property itself: every chunk's hash equals the hash of its
    text, so identical passages yield identical chunk hashes at any
    offset."""
    import hashlib

    import duckdb

    def h60(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    docs = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    want = {}
    hash_freq = {}
    for doc_id, text in docs:
        t = text.strip().split()
        n = len(t)
        cuts = [
            i
            for i in range(3, n)  # cut AFTER i, only i < n matters
            if i < n and h60(" ".join(t[i - 3 : i])) % 16 == 0
        ]
        # NB: positions are 1-indexed in the engine; python slice of
        # the window ending at 1-indexed i is t[i-3:i]
        starts = [1] + [c + 1 for c in cuts]
        ends = cuts + [n]
        chunks = []
        covered = []
        for j, (s, e) in enumerate(zip(starts, ends)):
            txt = " ".join(t[s - 1 : e])
            chunks.append((j, s, e - s + 1, h60(txt)))
            covered.extend(t[s - 1 : e])
            hash_freq[h60(txt)] = hash_freq.get(h60(txt), 0) + 1
        assert covered == t, doc_id  # chunks tile the document
        want[doc_id] = chunks

    got = {}
    rows = REGISTRY["chunk_cdc"].fn(spark, sf_dir).collect()
    for r in rows:
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_id"], r["chunk_start"], r["n_chunk_tokens"],
             r["chunk_hash"], r["corpus_freq"])
        )
    assert set(got) == set(want)
    for doc_id, chunks in want.items():
        engine = sorted(got[doc_id])
        assert [c[:4] for c in engine] == chunks, doc_id
        for c in engine:
            assert c[4] == hash_freq[c[3]], (doc_id, c)


def test_decayed_popularity_weights_exact(spark, sf_dir):
    """The decayed score must be the exact integer census fold:
    re-derive it from the (day, page) census in Python with arbitrary
    precision ints and compare bit-for-bit (the DOUBLE cast is exact
    for these magnitudes)."""
    import duckdb

    census = duckdb.sql(
        f"""
        SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS d,
               CAST(props->>'$.k' AS INT) AS page, count(*) AS cnt
        FROM read_parquet('{sf_dir}/events.parquet') GROUP BY 1, 2
        """
    ).fetchall()
    max_d = max(d for d, _, _ in census)
    scores: dict[int, int] = {}
    totals: dict[int, int] = {}
    for d, page, cnt in census:
        age = (max_d - d).days
        scores[page] = scores.get(page, 0) + cnt * (1 << (29 - age))
        totals[page] = totals.get(page, 0) + cnt
    top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    want = [(p, totals[p], float(s)) for p, s in top]
    got = [
        (r["page"], r["total_events"], r["decayed_score"])
        for r in REGISTRY["events_decayed_popularity"].fn(spark, sf_dir).collect()
    ]
    assert got == want


def test_split_leakage_safe_invariants(spark, sf_dir):
    """The split's two contracts, re-derived independently: (a) every
    doc in a near-dup cluster lands in the same split as its whole
    cluster (leaked_pairs == 0 is computed by the query; here we
    re-check by construction), (b) the 80/10/10 buckets come from the
    md5-fold of the cluster id."""
    import hashlib

    assign = {
        r["doc_id"]: (r["cluster_id"], r["keep"])
        for r in REGISTRY["dedup_cluster_assign"].fn(spark, sf_dir).collect()
    }
    rows = REGISTRY["split_leakage_safe"].fn(spark, sf_dir).collect()
    got = {r["split"]: (r["n_docs"], r["n_clusters"], r["leaked_pairs"]) for r in rows}
    assert all(v[2] == 0 for v in got.values())

    def bucket(cid: int) -> str:
        h = int(hashlib.md5(str(cid).encode()).hexdigest()[:15], 16) % 10
        return "train" if h <= 7 else ("valid" if h == 8 else "test")

    want: dict[str, list] = {"train": [set(), 0], "valid": [set(), 0],
                             "test": [set(), 0]}
    for doc_id, (cid, _) in assign.items():
        b = bucket(cid)
        want[b][0].add(cid)
        want[b][1] += 1
    for split, (clusters, n_docs) in want.items():
        if n_docs == 0:
            assert split not in got
        else:
            assert got[split][:2] == (n_docs, len(clusters)), split


def test_attribution_matches_python_model(spark, sf_dir):
    """Independent pure-Python walk of each user's timeline: latest
    click strictly before each purchase (ts, then event_id), 24 h
    window, revenue in exact cents."""
    import json as _json

    import duckdb

    rows = duckdb.sql(
        f"""SELECT user_id, event_id, event_type, value,
                   CAST(epoch_ms(CAST(ts AS TIMESTAMP)) AS BIGINT), props
            FROM read_parquet('{sf_dir}/events.parquet')
            ORDER BY user_id, 5, event_id"""
    ).fetchall()
    want: dict[int, list] = {}
    last_click: dict[int, tuple] = {}
    cur_user = None
    for user_id, event_id, etype, value, ts_ms, props in rows:
        if user_id != cur_user:
            cur_user, carry = user_id, None
        if etype == "purchase" and carry is not None:
            c_ts, c_page = carry
            if c_ts >= ts_ms - 86400000:
                ent = want.setdefault(c_page, [0, 0])
                ent[0] += 1
                ent[1] += int(round(value * 100))
        if etype == "click":
            carry = (ts_ms, int(_json.loads(props)["k"]))
    got = {
        r["page"]: [r["n_attributed"], r["attributed_cents"]]
        for r in REGISTRY["attribution_last_touch"].fn(spark, sf_dir).collect()
    }
    assert got == want
