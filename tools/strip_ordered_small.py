"""One-shot refactor: replace `ordered_small(df_expr, "c1", ...)` with
`df_expr` at every call site in plans/ (the driver's value hash and the
local oracle compare are both order-insensitive, so the presentation
sort buys nothing and its repartition(1) funnels table-proportional
output through a single task — VERDICT r5 item 1)."""

from __future__ import annotations

import re
import sys
from pathlib import Path

PLANS = Path(__file__).resolve().parent.parent / "flink_demo_spark" / "plans"


def split_args(body: str) -> list[str]:
    """Split a call body on top-level commas."""
    args, depth, cur, in_str = [], 0, [], None
    i = 0
    while i < len(body):
        ch = body[i]
        if in_str:
            if ch == "\\":
                cur.append(body[i : i + 2])
                i += 2
                continue
            if ch == in_str:
                in_str = None
            cur.append(ch)
        elif ch in "\"'":
            in_str = ch
            cur.append(ch)
        elif ch in "([{":
            depth += 1
            cur.append(ch)
        elif ch in ")]}":
            depth -= 1
            cur.append(ch)
        elif ch == "," and depth == 0:
            args.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
        i += 1
    if "".join(cur).strip():
        args.append("".join(cur))
    return args


def rewrite(text: str) -> tuple[str, int]:
    out, n, pos = [], 0, 0
    pat = re.compile(r"ordered_small\(")
    while True:
        m = pat.search(text, pos)
        if m is None:
            out.append(text[pos:])
            break
        start = m.end()
        depth, i, in_str = 1, start, None
        while depth:
            ch = text[i]
            if in_str:
                if ch == "\\":
                    i += 2
                    continue
                if ch == in_str:
                    in_str = None
            elif ch in "\"'":
                in_str = ch
            elif ch in "([{":
                depth += 1
            elif ch in ")]}":
                depth -= 1
            i += 1
        body = text[start : i - 1]
        first = split_args(body)[0].strip()
        out.append(text[pos : m.start()])
        out.append(first)
        pos = i
        n += 1
    return "".join(out), n


def main() -> None:
    total = 0
    for f in sorted(PLANS.glob("*.py")):
        if f.name == "_util.py":
            continue
        src = f.read_text()
        new, n = rewrite(src)
        if n:
            # drop now-unused import
            new = re.sub(
                r"^from \._util import ordered_small\n", "", new, flags=re.M
            )
            new = re.sub(r", ordered_small(?=\b)", "", new)
            new = re.sub(r"ordered_small, ", "", new)
            f.write_text(new)
            total += n
            print(f"{f.name}: {n} sites")
    print(f"total: {total}")


if __name__ == "__main__":
    main()
