"""AST -> DataFrame compiler.

Replaces the reference's recursive interpreter over sorted
``vector<ca_offset_score>`` (ProcessSubQuery, query.cc:394-628) with a
recursive *composition of DataFrame operators* — the logical plan is
declared and Catalyst/Tungsten pick the physical strategy (the reference
had no optimizer; SURVEY.md §4).
"""

from __future__ import annotations

import re
from typing import Callable
from urllib.parse import unquote

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cantera_table_spark.dsl import ast
from cantera_table_spark.model import Catalog
from cantera_table_spark.operators import set_algebra as sa


class CompileError(ValueError):
    pass


class QueryCompiler:
    """Compiles a query AST to a result DataFrame (doc_id, score).

    Parameters
    ----------
    catalog: the table set (summaries / indexes / overrides).
    unique_postings: promise that every index table has at most one row
        per (keyword, doc_id); lets set ops skip the duplicate-run
        machinery (operators/set_algebra.py docstring).
    blob_fetcher: resolver for ``FIELD-in:KEY`` external-document
        expansion (query.cc:222-305).  The reference fetches from a CAS
        service; here any ``key -> text`` callable (unset -> error).
    """

    def __init__(self, catalog: Catalog, unique_postings: bool = False,
                 blob_fetcher: Callable[[str], str] | None = None,
                 f32_scores: bool = False):
        self.catalog = catalog
        self.unique = unique_postings
        self.blob_fetcher = blob_fetcher
        self.f32 = f32_scores
        # doc_id -> {"_header": ..., "_header_key": ...} side-channel from
        # FIELD-in:KEY expansion (reference extra_data, query.cc:57,293-299)
        self.extra: DataFrame | None = None

    # -- leaf lookups -------------------------------------------------
    def _lookup_leaf(self, token: str) -> DataFrame:
        delim = token.find(":")
        if delim > 3 and token[delim - 3:delim] == "-in":
            return self._lookup_external(token, delim)
        if token.startswith("in-") and ":" in token[3:]:
            return self._lookup_prefix(token)
        return self._lookup_plain(token)

    def _lookup_plain(self, token: str) -> DataFrame:
        """S1 point lookup; identifiers are %-decoded (query.cc:203).

        At scale this filter prunes to one keyword-bucket partition and
        pushes ``keyword = k`` into the Parquet scan.
        """
        key = unquote(token)
        idx = self.catalog.index()
        rows = idx.filter(F.col("keyword") == key)
        n = self.catalog.postings_buckets
        if n and "bucket" in idx.columns:
            # directory-partition pruning: the bucket of a literal key
            # is itself a literal, so only one partition is scanned
            # (bucket_expr: the writer-shared hash, model.py).  The
            # NULL arm keeps catalogs that MIX bucketed and unbucketed
            # index tables correct: unionByName(allowMissingColumns)
            # fills the unbucketed side's bucket with NULL, and a bare
            # equality would silently drop every one of its postings
            # (r11 review finding) — Catalyst pushes the disjunction
            # per branch, so the bucketed side still prunes to one
            # partition and the unbucketed side scans as it must.
            from cantera_table_spark.model import bucket_expr
            rows = rows.filter(
                F.col("bucket").isNull() |
                (F.col("bucket") == bucket_expr(F.lit(key), n)))
        score = F.col("score")
        if self.f32:
            # Reference scores are float32 (ca-table.h:100).  Fidelity
            # mode quantizes through float32 on read so `=`/threshold
            # comparisons see exactly the values the reference stores
            # (SURVEY.md §7 hard-item 3); computation stays in float64.
            score = score.cast("float").cast("double")
        return rows.select("doc_id", score.alias("score"))

    def _lookup_prefix(self, token: str) -> DataFrame:
        """S2 ``in-KEY:PARAM`` (query.cc:306-352): keys with prefix KEY
        whose full key case-insensitively contains PARAM; distinct
        offsets, scores zeroed."""
        body = token[3:]
        key, _, param = body.partition(":")
        idx = self.catalog.index()
        rows = idx.filter(F.col("keyword").startswith(key))
        if param:
            rows = rows.filter(
                F.lower(F.col("keyword")).contains(param.lower()))
        return (rows.select("doc_id").distinct()
                .withColumn("score", F.lit(0.0)))

    def _lookup_external(self, token: str, delim: int) -> DataFrame:
        """S3 ``FIELD-in:KEY`` (query.cc:222-305): fetch blob, extract
        domain names and ``{header}`` markers, look each name up as
        ``FIELD:name``, union distinct offsets with score 0.

        The blob parse runs driver-side (the blob is one small external
        object); the lookups and union are Spark joins.
        """
        if self.blob_fetcher is None:
            raise CompileError(
                f"no blob_fetcher configured for external token {token!r}")
        field = token[:delim - 3] + ":"
        if field == "links:":
            field = "name:"  # reference quirk, query.cc:240-241
        key = token[delim + 1:]
        data = self.blob_fetcher(key)

        names: dict[str, tuple[str, str]] = {}
        header, header_key, in_header, header_idx = "", "", False, 0
        name_chars: list[str] = []

        def flush_name():
            nonlocal name_chars
            name = "".join(name_chars)
            name_chars = []
            if name.startswith("www."):
                name = name[4:]
            # IsValidDomainName (query.cc:127-134)
            if len(name) >= 3 and not name.startswith(".") \
                    and not name.endswith("."):
                names.setdefault(name, (header, header_key))

        for ch in data:
            if in_header:
                if ch.isalnum() or ch in " .,_&-":
                    header += ch
                elif ch == "}":
                    header_key = "%06d" % header_idx
                    header_idx += 1
                    in_header = False
                else:
                    header = ""
                    in_header = False
            elif ch == "{":
                in_header = True
                header = ""
            elif ch.isalnum() or ch in ".-":
                name_chars.append(ch.lower())
            elif name_chars:
                flush_name()
        if name_chars:
            flush_name()

        idx = self.catalog.index()
        spark = idx.sparkSession
        if not names:
            return spark.createDataFrame([], "doc_id long, score double")
        name_rows = [(field + n, h, hk) for n, (h, hk) in names.items()]
        names_df = spark.createDataFrame(
            name_rows, "keyword string, _header string, _header_key string")
        # Broadcast: the name list is tiny next to the postings table.
        hits = idx.join(F.broadcast(names_df), "keyword")
        extra = (
            hits.filter(F.col("_header") != "")
            .groupBy("doc_id")
            .agg(F.min(F.struct("_header_key", "_header")).alias("__h"))
            .select("doc_id", F.col("__h._header").alias("_header"),
                    F.col("__h._header_key").alias("_header_key"))
        )
        # The reference accumulates extra_data across every external
        # lookup in the query (query.cc:293-299) — merge, don't replace.
        if self.extra is not None:
            merged = self.extra.unionByName(extra)
            extra = (merged
                     .groupBy("doc_id")
                     .agg(F.min(F.struct("_header_key", "_header"))
                          .alias("__h"))
                     .select("doc_id",
                             F.col("__h._header").alias("_header"),
                             F.col("__h._header_key")
                             .alias("_header_key")))
        self.extra = extra
        return (hits.select("doc_id").distinct()
                .withColumn("score", F.lit(0.0)))

    def _lookup_summary_key(self, ident: str) -> DataFrame:
        """S4 ``KEY=ident`` (query.cc:397-406): document by name, score 0."""
        docs = self.catalog.summary()
        return (docs.filter(F.col("key") == ident)
                .select("doc_id").withColumn("score", F.lit(0.0)))

    # -- recursive compile --------------------------------------------
    def compile(self, node: ast.Node) -> DataFrame:
        if isinstance(node, ast.Leaf):
            return self._lookup_leaf(node.identifier)
        if isinstance(node, ast.KeyLookup):
            return self._lookup_summary_key(node.identifier)
        if isinstance(node, ast.Unary):
            inner = self.compile(node.lhs)
            if node.op == "negate":
                return sa.negate(inner)
            if node.op == "max":
                return sa.dedup(inner, use_max=True)
            if node.op == "min":
                return sa.dedup(inner, use_max=False)
            raise CompileError(f"unknown unary op {node.op}")
        if isinstance(node, ast.Binary):
            lhs = self.compile(node.lhs)
            if node.op == "and":
                return sa.intersect_and(lhs, self.compile(node.rhs),
                                        unique=self.unique)
            if node.op == "or":
                return sa.union_or(lhs, self.compile(node.rhs),
                                   unique=self.unique)
            if node.op == "subtract":
                return sa.subtract(lhs, self.compile(node.rhs),
                                   unique=self.unique)
            if node.op == "orderby":
                return sa.order_by(lhs, self.compile(node.rhs),
                                   unique=self.unique)
            if node.op == "sample":
                return sa.sample(lhs, int(node.value))
            if node.op in ("eq", "ge", "le", "range"):
                return sa.score_filter(lhs, node.op, node.value, node.value2)
            if node.op in ("gt", "lt"):
                if node.rhs is not None:
                    return sa.theta_join(lhs, self.compile(node.rhs),
                                         node.op, unique=self.unique)
                return sa.score_filter(lhs, node.op, node.value)
            raise CompileError(f"unknown binary op {node.op}")
        raise CompileError(f"unknown node type {type(node).__name__}")

    def process_query(self, node: ast.Node, use_max: bool = True
                      ) -> DataFrame:
        """ProcessQuery (query.cc:624-628): compile + final dedup.

        With ``unique_postings`` every operator preserves at-most-one-
        row-per-doc (see operators/set_algebra.py), so the final dedup
        is an identity — skipping it removes a whole shuffle from every
        query (at scale: the difference between one exchange per query
        and none for broadcast-able plans).
        """
        df = self.compile(node)
        if self.unique:
            return df
        return sa.dedup(df, use_max=use_max)
