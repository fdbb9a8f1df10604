#!/usr/bin/env python3
"""One-shot rewrite: inside Some(\"\"\"...\"\"\" oracle-SQL blocks of the query
files, replace round(EXPR, N) with floor((EXPR) * 10^N + 0.5) / 10^N.
Spark-side code keeps calling round(...) — shadow-imported Canon.round.
"""
import re
import sys
from pathlib import Path


def rewrite_sql(sql: str) -> str:
    out = []
    i = 0
    while i < len(sql):
        m = re.match(r"round\(", sql[i:])
        if not m:
            out.append(sql[i])
            i += 1
            continue
        # find balanced closing paren
        depth = 1
        j = i + len("round(")
        start = j
        while depth > 0:
            if sql[j] == "(":
                depth += 1
            elif sql[j] == ")":
                depth -= 1
            j += 1
        inner = sql[start:j - 1]
        # split top-level comma for scale arg
        depth = 0
        for k in range(len(inner) - 1, -1, -1):
            if inner[k] == ")":
                depth += 1
            elif inner[k] == "(":
                depth -= 1
            elif inner[k] == "," and depth == 0:
                break
        expr, scale = inner[:k], int(inner[k + 1:].strip())
        factor = 10 ** scale
        out.append(f"floor(({rewrite_sql(expr)}) * {factor} + 0.5) / {factor}")
        i = j
    return "".join(out)


def rewrite_file(p: Path):
    src = p.read_text()
    parts = []
    pos = 0
    pat = re.compile(r'Some\((\s*)(s?)"""', re.S)
    for m in pat.finditer(src):
        start = m.end()
        end = src.index('"""', start)
        parts.append(src[pos:start])
        parts.append(rewrite_sql(src[start:end]))
        pos = end
    parts.append(src[pos:])
    new = "".join(parts)
    if new != src:
        p.write_text(new)
        print(f"rewrote {p}")


for f in sys.argv[1:]:
    rewrite_file(Path(f))
