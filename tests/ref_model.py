"""Pure-Python transcription of the reference's set-algebra merge loops
(query.cc:68-196, 137-156) — the oracle for operator property tests.

Postings are lists of (offset:int, score:float) sorted by offset.  Where
run order matters, inputs must be pre-sorted by (offset, score) — the
engine's canonical intra-run order (see operators/set_algebra.py).
"""

from __future__ import annotations

NEG_INF = float("-inf")


def union(lhs, rhs):
    """UnionOffsets (query.cc:68-94): each rhs element displaces one lhs
    element at the same offset."""
    result = []
    i, j = 0, 0
    while i < len(lhs) and j < len(rhs):
        if lhs[i][0] < rhs[j][0]:
            result.append(lhs[i]); i += 1
        else:
            if lhs[i][0] == rhs[j][0]:
                i += 1
            result.append(rhs[j]); j += 1
    result.extend(lhs[i:])
    result.extend(rhs[j:])
    return result


def intersect(lhs, rhs):
    """IntersectOffsets (query.cc:96-125): keep lhs runs whose offset
    appears in rhs."""
    out = []
    i, j = 0, 0
    while i < len(lhs) and j < len(rhs):
        if lhs[i][0] == rhs[j][0]:
            off = lhs[i][0]
            while i < len(lhs) and lhs[i][0] == off:
                out.append(lhs[i]); i += 1
            j += 1
            continue
        if lhs[i][0] < rhs[j][0]:
            i += 1
        else:
            j += 1
    return out


def subtract(lhs, rhs):
    """SubtractOffsets (query.cc:358-392)."""
    rhs_offsets = {o for o, _ in rhs}
    return [p for p in lhs if p[0] not in rhs_offsets]


def theta(lhs, rhs, op):
    """Join template (query.cc:139-164): element-wise advance of both
    cursors; keep lhs element when filter holds."""
    out = []
    i, j = 0, 0
    while i < len(lhs) and j < len(rhs):
        if lhs[i][0] < rhs[j][0]:
            i += 1
            continue
        if rhs[j][0] < lhs[i][0]:
            j += 1
            continue
        if (op == "gt" and lhs[i][1] > rhs[j][1]) or \
           (op == "lt" and lhs[i][1] < rhs[j][1]):
            out.append(lhs[i])
        i += 1
        j += 1
    return out


def order_by(lhs, rhs):
    """kOperatorOrderBy (query.cc:519-547)."""
    out = []
    i, j = 0, 0
    while i < len(lhs) and j < len(rhs):
        if lhs[i][0] < rhs[j][0]:
            out.append((lhs[i][0], NEG_INF)); i += 1
            continue
        if rhs[j][0] < lhs[i][0]:
            j += 1
            continue
        out.append((lhs[i][0], rhs[j][1]))
        i += 1
        j += 1
    while i < len(lhs):
        out.append((lhs[i][0], NEG_INF)); i += 1
    return out


def dedup(v, use_max=True):
    """RemoveDuplicates (query.cc:137-156)."""
    out = []
    for off, sc in v:
        if out and out[-1][0] == off:
            if use_max == (sc > out[-1][1]):
                out[-1] = (off, sc)
        else:
            out.append((off, sc))
    return out
