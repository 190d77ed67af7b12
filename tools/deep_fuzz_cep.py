#!/usr/bin/env python
"""Deep split-invariance fuzz for the streaming CEP drain cores.

The committed suite (tests/test_cep_stream_fuzz.py) pins each pattern
against a SPARK batch golden on one dataset + 25 splits. This tool
scales the SPLIT-INVARIANCE axis orders of magnitude further without a
JVM: for thousands of random (dataset, split-sequence) pairs, replaying
the stream in arbitrary micro-batch chunks through
``drain_in_order`` / ``drain_all_in_order`` must produce exactly the
single-shot ``eos=True`` drain over the complete input (whose own
batch-equality is what the Spark-backed suite pins).

    python tools/deep_fuzz_cep.py --trials 100 --splits 8 [--seed 7]

Exit 0 iff no divergence; a failure prints the pattern, seed, rows and
split that reproduce it (paste into a regression test).
"""

from __future__ import annotations

import argparse
import os
import random
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"
))

from test_cep_stream_fuzz import _gen_rows, _measures, _patterns  # noqa: E402

from flink_demo_spark.streaming.cep_stream import (  # noqa: E402
    drain_all_in_order,
    drain_in_order,
)


def _timed_out(rows_df, b):
    return _measures(rows_df, b)


def _run(rows_sorted, pattern_fn, drain, chunks, **kw):
    """Replay rows through drain in the given chunking; final eos flush."""
    out = []
    state: dict = {}
    for chunk in chunks:
        by_key: dict = {}
        for r in chunk:
            by_key.setdefault(r[0], []).append(
                {"k": r[0], "event_type": r[1], "ts": r[2], "event_id": r[3]}
            )
        for k, rows_k in by_key.items():
            recs = state.get(k, []) + rows_k
            rows_out, recs = drain(
                recs, pattern_fn(), "ts", ["k"], (k,), _measures, **kw
            )
            out.extend(rows_out)
            state[k] = recs
    keys = {r[0] for ch in chunks for r in ch}
    for k in keys:
        rows_out, _ = drain(
            state.get(k, []), pattern_fn(), "ts", ["k"], (k,), _measures,
            eos=True, **kw,
        )
        out.extend(rows_out)
    return Counter(tuple(sorted(r.items())) for r in out)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=100)
    ap.add_argument("--splits", type=int, default=8)
    ap.add_argument("--seed", type=int, default=7)
    args = ap.parse_args()

    pats = _patterns()
    configs = [
        ("one", drain_in_order, {}),
        ("one+timeout", drain_in_order, {"timeout_measures": _timed_out}),
        ("all", drain_all_in_order, {}),
    ]
    failures = 0
    total = 0
    for pname, pattern_fn in sorted(pats.items()):
        for trial in range(args.trials):
            rng = random.Random(args.seed * 1_000_003 + hash(pname) % 99991 + trial)
            rows = sorted(_gen_rows(rng), key=lambda r: (r[2], r[3]))
            for cname, drain, kw in configs:
                golden = _run(rows, pattern_fn, drain, [rows], **kw)
                for s in range(args.splits):
                    n_cuts = rng.randrange(1, min(7, len(rows) - 1))
                    cuts = sorted(rng.sample(range(1, len(rows)), n_cuts))
                    chunks = [
                        rows[a:b]
                        for a, b in zip([0, *cuts], [*cuts, len(rows)])
                    ]
                    got = _run(rows, pattern_fn, drain, chunks, **kw)
                    total += 1
                    if got != golden:
                        failures += 1
                        print(
                            f"DIVERGENCE pattern={pname} cfg={cname} "
                            f"trial={trial} split={s} cuts={cuts}\n"
                            f"  rows={rows}\n  golden={golden}\n  got={got}",
                        )
        print(f"  {pname}: ok ({args.trials} datasets x "
              f"{args.splits} splits x {len(configs)} cfgs)", file=sys.stderr)
    print(f"{total} comparisons, {failures} divergences")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
