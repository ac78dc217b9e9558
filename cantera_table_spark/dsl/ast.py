"""AST for the cantera-table search DSL.

Mirrors the reference's arena AST (query.h:39-68: Query node types Key,
Leaf, BinaryOperator, UnaryOperator; 14 operator types) — the parse tree
IS the IR, there is no further lowering before compilation (reference has
none either; we compile to Catalyst logical plans instead of interpreting).
"""

from __future__ import annotations

from dataclasses import dataclass, field


class Node:
    pass


@dataclass
class Leaf(Node):
    """Index keyword lookup (reference kQueryLeaf, query.cc:411-415).

    Special identifier forms handled at compile time (query.cc:222-352):
    - ``FIELD-in:KEY``  external-document expansion (CAS fetch)
    - ``in-KEY:PARAM``  key-prefix range scan with substring filter
    """
    identifier: str


@dataclass
class KeyLookup(Node):
    """``KEY=ident`` — summary point lookup (kQueryKey, query.cc:397-406)."""
    identifier: str


@dataclass
class Binary(Node):
    """op in {'or','and','subtract','eq','gt','ge','lt','le','range',
    'orderby','sample'}.  For comparisons rhs is None and value holds the
    literal; gt/lt may carry a rhs sub-query instead (theta join,
    query.cc:459-505)."""
    op: str
    lhs: Node
    rhs: Node | None = None
    value: float | None = None
    value2: float | None = None


@dataclass
class Unary(Node):
    """op in {'max','min','negate'} (query.cc:578-611)."""
    op: str
    lhs: Node


@dataclass
class Thresholds:
    values: list[float]
    key: str


@dataclass
class QueryStmt:
    query: Node
    keys_only: bool = False
    thresholds: Thresholds | None = None
    limit: int = -1          # -1 = all (reference fetchClause default)
    offset: int = 0


@dataclass
class CorrelateStmt:
    query_a: Node
    query_b: Node


@dataclass
class SelectStmt:
    fields: list[Node]
    query: Node
    with_summaries: bool = False
    parallel: int = 0


@dataclass
class ParseStmt:
    query: Node


@dataclass
class SetStmt:
    parameter: str           # 'output_format' | 'time_format'
    value: str


def format_query(q: Node) -> str:
    """Normalized echo of a query — reference PrintQuery (query.cc:630-724)."""
    if isinstance(q, Leaf):
        return q.identifier
    if isinstance(q, KeyLookup):
        return f"KEY={q.identifier}"
    if isinstance(q, Unary):
        if q.op == "negate":
            return f"~{format_query(q.lhs)}"
        return f"{q.op.upper()}({format_query(q.lhs)})"
    if isinstance(q, Binary):
        if q.op == "or":
            return f"({format_query(q.lhs)} OR {format_query(q.rhs)})"
        if q.op == "and":
            return f"({format_query(q.lhs)} AND {format_query(q.rhs)})"
        if q.op == "subtract":
            return f"({format_query(q.lhs)} AND NOT {format_query(q.rhs)})"
        if q.op == "orderby":
            return f"({format_query(q.lhs)} ORDER BY {format_query(q.rhs)})"
        if q.op == "sample":
            return f"RANDOM_SAMPLE({format_query(q.lhs)}, {int(q.value)})"
        if q.op == "range":
            return f"{_atom(q.lhs)}[{_num(q.value)},{_num(q.value2)}]"
        sym = {"eq": "=", "gt": ">", "ge": ">=", "lt": "<", "le": "<="}[q.op]
        if q.rhs is not None:
            if q.op not in ("gt", "lt"):
                # the grammar builds theta joins only for > and <
                # (query-parser.yy: '>' '<' between subqueries); = >= <=
                # with a subquery rhs has no parseable echo, so a
                # hand-built AST must fail loudly rather than print
                # text that breaks the round-trip contract
                raise TypeError(
                    f"comparison op {q.op!r} cannot take a subquery rhs"
                    " (theta joins exist only for gt/lt)")
            # theta join: atomize BOTH operands — a bare postfix
            # comparison on the rhs would re-parse with the literal
            # bound to the whole join, and a bare `~x` on the lhs would
            # re-parse as negate-of-the-join (negate consumes a full
            # postfix chain, parse_primary).  The reference's
            # PrintQuery parenthesizes every binary node
            # (query.cc:672-721) so its echo never emits the ambiguous
            # forms either.
            return f"({_atom(q.lhs)} {sym} {_atom(q.rhs)})"
        return f"{_atom(q.lhs)}{sym}{_num(q.value)}"
    raise TypeError(f"unknown node {q!r}")


def _atom(q: Node) -> str:
    """Format a postfix-comparison operand; non-atomic forms get parens
    so the echo re-parses to the same tree (postfix binds tighter than
    prefix ``~`` and the binary operators)."""
    text = format_query(q)
    # decided by NODE TYPE, not text shape: a postfix comparison whose
    # operand is parenthesized ("(a OR b)=0") starts with "(" yet is
    # NOT one paren group — a startswith check would leave it bare and
    # the re-parse would bind its literal to the enclosing operator
    self_delimited = (
        isinstance(q, (Leaf, KeyLookup))
        or (isinstance(q, Unary) and q.op in ("max", "min"))
        or (isinstance(q, Binary) and (
            q.op in ("sample", "or", "and", "subtract", "orderby")
            or (q.op in ("gt", "lt") and q.rhs is not None)))
    )
    return text if self_delimited else f"({text})"


def _num(v: float) -> str:
    """Numeric literal that re-parses to the same value: repr() emits
    scientific notation below 1e-4 ('1e-07'), which the tokenizer
    would split into NUMBER 1.0 and IDENT 'e-07' — silently a
    different tree, breaking the format/parse round trip this module
    raises TypeError elsewhere to protect (r11 review finding).
    numpy's unique positional rendering is the shortest decimal
    expansion that round-trips."""
    if v == int(v):
        return str(int(v))
    s = repr(v)
    if "e" in s or "E" in s:
        import numpy as np
        s = np.format_float_positional(v, unique=True)
        if s.endswith("."):
            s += "0"        # tokenizer NUMERIC wants digits after '.'
    return s
