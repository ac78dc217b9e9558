"""Engine facade: executes parsed statements against a Catalog.

The reference's statement dispatch (statement.cc:12-51) and the QUERY /
SELECT executors (query.cc:726-948, select.cc:80-154) re-expressed as
DataFrame pipelines.  Only the final page materializes driver-side (the
JSON envelope is a page of top-k results — small by construction).
"""

from __future__ import annotations

import bisect
import json
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cantera_table_spark.dsl import ast
from cantera_table_spark.dsl.compiler import QueryCompiler
from cantera_table_spark.dsl.parser import parse_script
from cantera_table_spark.functions.dates import (
    days_to_date_string, double_to_string, header_sort_key,
)
from cantera_table_spark.model import Catalog
from cantera_table_spark.operators import set_algebra as sa


class Engine:
    def __init__(self, catalog: Catalog, unique_postings: bool = False,
                 blob_fetcher: Callable[[str], str] | None = None,
                 f32_scores: bool = False, count_mode: str = "exact"):
        self.catalog = catalog
        self.unique_postings = unique_postings
        self.blob_fetcher = blob_fetcher
        self.f32_scores = f32_scores
        if count_mode not in ("exact", "approx", "none"):
            raise ValueError(f"count_mode must be exact|approx|none, "
                             f"got {count_mode!r}")
        # result-count policy for QUERY envelopes (SURVEY §4): "exact"
        # (reference-faithful, query.cc:933 — materializes the full
        # result once to count it), "approx" (Bernoulli-sample estimate
        # — one sampled count job instead of a full materialization), or
        # "none" (omit result-count; the page is the only job, the
        # at-100 TB interactive default).
        self.count_mode = count_mode
        self.approx_count_fraction = 0.05
        # session parameters (reference SET statement, statement.cc:35-48;
        # default CSV per output.cc:32)
        self.output_format = "csv"
        # cached intermediates registered by CORRELATE runs; release
        # with release_caches() after consuming their results
        self._correlate_caches: list = []
        self.time_format = "%Y-%m-%d %H:%M:%S"

    def register_views(self, prefix: str = "") -> None:
        """Expose the catalog tables as Spark SQL temp views
        (``postings``, ``documents``, ``overrides``) so users can mix
        the search DSL with plain ``spark.sql`` analytics over the same
        data — the relational surface the reference never had."""
        self.catalog.index().createOrReplaceTempView(f"{prefix}postings")
        self.catalog.summary().createOrReplaceTempView(
            f"{prefix}documents")
        ov = self.catalog.override()
        if ov is not None:
            ov.createOrReplaceTempView(f"{prefix}overrides")

    def release_caches(self) -> None:
        """Unpersist intermediates cached by CORRELATE statements (call
        after consuming their result DataFrames in long-lived
        sessions)."""
        for df in self._correlate_caches:
            df.unpersist()
        self._correlate_caches.clear()

    def _compiler(self) -> QueryCompiler:
        return QueryCompiler(self.catalog,
                             unique_postings=self.unique_postings,
                             blob_fetcher=self.blob_fetcher,
                             f32_scores=self.f32_scores)

    # ------------------------------------------------------------------
    # Script / statement entry points
    # ------------------------------------------------------------------
    def execute_script(self, text: str) -> list:
        """Run a ';'-separated script; returns one result object per
        statement (dict for QUERY, DataFrame for SELECT/CORRELATE,
        str for PARSE, None for SET)."""
        out = []
        for stmt in parse_script(text):
            out.append(self.execute(stmt))
        return out

    def execute(self, stmt):
        if isinstance(stmt, ast.QueryStmt):
            return self.query_stmt(stmt)
        if isinstance(stmt, ast.SelectStmt):
            return self.select_stmt(stmt)
        if isinstance(stmt, ast.CorrelateStmt):
            from cantera_table_spark.operators.correlate import correlate
            return correlate(self, stmt.query_a, stmt.query_b)
        if isinstance(stmt, ast.ParseStmt):
            return ast.format_query(stmt.query)
        if isinstance(stmt, ast.SetStmt):
            if stmt.parameter == "output_format":
                self.output_format = stmt.value
            elif stmt.parameter == "time_format":
                # store-only, like the reference: CA_time_format is
                # defined (output.cc:31), written (statement.cc:43-45,
                # ca-shell.cc:106) and never READ anywhere in the
                # reference tree — SET TIME FORMAT is vestigial there,
                # so consuming it here would invent behavior
                self.time_format = stmt.value
            elif stmt.parameter == "count_mode":
                self.count_mode = stmt.value
            return None
        raise TypeError(f"unknown statement {stmt!r}")

    # ------------------------------------------------------------------
    # QUERY — result DataFrame (the distributed part)
    # ------------------------------------------------------------------
    def query_df(self, query: ast.Node,
                 thresholds: ast.Thresholds | None = None,
                 limit: int = -1, offset: int = 0,
                 compiler: QueryCompiler | None = None) -> DataFrame:
        """Evaluate to the (doc_id, score) page DataFrame (pre-envelope)."""
        comp = compiler or self._compiler()
        result = comp.process_query(query, use_max=True)
        if thresholds is not None:
            key = thresholds.key
            if key.startswith("~"):
                key = key[1:]
            kp = comp._lookup_leaf(key)
            result = sa.threshold_filter(result, kp, thresholds.values)
        return sa.top_k(result, limit, offset)

    def query_stmt(self, stmt: ast.QueryStmt, count_mode: str | None = None):
        """Full QUERY executor: returns the JSON envelope as a dict
        (``{"result-count": N, "result": [...]}`` — query.cc:933-941) or,
        for KEYS FOR, a list of keys.

        ``count_mode`` (default: the engine's) picks the result-count
        policy: "exact" caches and counts the full result (reference
        behavior); "approx" estimates it from a Bernoulli sample
        (documented divergence — the count job reads the result once at
        ``approx_count_fraction`` instead of materializing it); "none"
        omits ``result-count`` and runs the page as the only job."""
        mode = count_mode or self.count_mode
        if mode not in ("exact", "approx", "none"):
            raise ValueError(f"count_mode must be exact|approx|none, "
                             f"got {mode!r}")
        if stmt.keys_only:
            # KEYS FOR output carries no result-count, so exact mode's
            # cache+count (a full extra materialization per query) and
            # approx's sample job buy nothing (r11 review finding);
            # the one behavioral use of the count — offset beyond the
            # result returning a bare [] — falls out of the empty page
            # identically on the countless path below.
            mode = "none"
        comp = self._compiler()
        result = comp.process_query(stmt.query, use_max=True)

        thr_values = None
        use_date_headers = reverse = False
        if stmt.thresholds is not None:
            key = stmt.thresholds.key
            if key.startswith("~"):
                key = key[1:]
                reverse = True
            use_date_headers = self.catalog.is_timestamped(key)
            thr_values = sorted(stmt.thresholds.values)
            kp = comp._lookup_leaf(key)
            result = sa.threshold_filter(result, kp, thr_values)

        total = None
        if mode == "exact":
            result = result.cache()
        try:
            if mode == "exact":
                total = result.count()
                if stmt.offset >= total:
                    # Reference prints a bare "[]" here (query.cc:796-799)
                    return []
            elif mode == "approx":
                frac = self.approx_count_fraction
                total = int(round(
                    result.sample(False, frac, seed=0).count() / frac))
            page_df = sa.top_k(result, stmt.limit, stmt.offset)
            docs = self.catalog.summary()
            page = page_df.join(docs, "doc_id", "left")
            ov = self.catalog.override()
            if ov is not None:
                ov = ov.withColumnRenamed("doc", "__ov_doc")
                page = page.join(ov, "key", "left")
            extra = comp.extra
            if extra is not None:
                page = page.join(extra, "doc_id", "left")
            # ONE sort, after the last join: joins don't preserve
            # order, so sorting earlier is dead weight (r11 review —
            # the previous per-join orderBy chain declared three
            # identical Sort nodes of which only the last mattered)
            rows = (page.orderBy(F.col("score").desc(),
                                 F.col("doc_id").asc()).collect())
        finally:
            if mode == "exact":
                result.unpersist()
        if mode != "exact" and not rows and stmt.limit != 0:
            # approx/none learn "offset beyond the result" from the
            # empty page itself (an empty offset-0 page means the
            # result set is empty, i.e. offset >= total); same bare-[]
            # form as exact (query.cc:796-799).  A LIMIT 0 page is empty
            # by construction and proves nothing about the total, so it
            # keeps the envelope form exact mode would produce.
            return []
        if mode == "approx":
            # reconcile the sample estimate with what the page proved:
            # an under-full page (or a dump-all page) means the result
            # ENDED inside it, so the exact total is known and beats
            # the estimate in both directions (r9 review finding — a
            # 3-doc result with frac 0.05 could otherwise report
            # result-count 20); a full page only proves a lower bound
            if stmt.limit < 0 or len(rows) < stmt.limit:
                total = stmt.offset + len(rows)
            else:
                total = max(total, stmt.offset + len(rows))

        if stmt.keys_only:
            return [r["key"] for r in rows]

        results = []
        for r in rows:
            obj: dict = {"_key": r["key"]}
            if r["doc"]:
                obj.update(json.loads(r["doc"]))
            if "__ov_doc" in r.__fields__ and r["__ov_doc"]:
                obj.update(json.loads(r["__ov_doc"]))
            if "_header" in r.__fields__ and r["_header"] is not None:
                obj["_header"] = r["_header"]
                obj["_header_key"] = r["_header_key"]
            if thr_values is not None:
                obj.update(self._threshold_header(
                    r["score"], thr_values, use_date_headers, reverse))
            results.append(obj)
        if total is None:
            return {"result": results}
        return {"result-count": total, "result": results}

    @staticmethod
    def _threshold_header(score: float, thresholds: list[float],
                          use_date_headers: bool, reverse: bool) -> dict:
        """Group header assembly (query.cc:893-927)."""
        i = bisect.bisect_left(thresholds, score, lo=1)
        if i < len(thresholds) and thresholds[i] == score \
                and i + 1 < len(thresholds):
            i += 1
        lo_v, hi_v = thresholds[i - 1], thresholds[i]
        if not use_date_headers:
            header = f"{double_to_string(lo_v)}–{double_to_string(hi_v)}"
        elif lo_v + 1 != hi_v:
            header = (f"{days_to_date_string(lo_v)}–"
                      f"{days_to_date_string(hi_v)}")
        else:
            header = days_to_date_string(lo_v)
        key = i
        if reverse:
            key = len(thresholds) - key
        return {"_header": header, "_header_key": header_sort_key(key)}

    def export_results(self, query: ast.Node) -> DataFrame:
        """Distributed full-result export: one JSON object string per
        matching document, assembled executor-side with the reference's
        concatenation scheme (query.cc:862-890: '_key' + brace-stripped
        summary body + override body appended — later keys win at the
        client).  Unlike query_stmt (which collects a top-k page), this
        never touches the driver, so exporting millions of results is a
        plain distributed write: engine.export_results(q).write.text(...).
        """
        comp = self._compiler()
        result = comp.process_query(query, use_max=True)
        docs = self.catalog.summary()
        joined = result.join(docs, "doc_id", "left")
        # to_json(named_struct('_key', key)) = {"_key":"..."} with full
        # JSON escaping; strip its closing brace, append the
        # brace-stripped summary body, then overrides, then close.
        def body_of(col_name: str):
            """Brace-stripped JSON body prefixed with a comma, or ''
            when the column is NULL/empty/'{}' — an unconditional comma
            before an empty body would emit invalid trailing-comma
            JSON."""
            c = F.col(col_name)
            stripped = F.when(
                c.startswith("{"),
                F.expr(f"substring({col_name}, 2, "
                       f"length({col_name}) - 2)")).otherwise(c)
            return F.when(
                c.isNull() | (F.length(F.coalesce(stripped, F.lit("")))
                              == 0),
                F.lit("")).otherwise(F.concat(F.lit(","), stripped))

        doc_body = body_of("doc")
        ov = self.catalog.override()
        if ov is not None:
            joined = joined.join(
                ov.withColumnRenamed("doc", "__ov_doc"), "key", "left")
            ov_body = body_of("__ov_doc")
        else:
            ov_body = F.lit("")
        json_col = F.concat(
            F.expr("substring(" +
                   "to_json(named_struct('_key', key)), 1, " +
                   "length(to_json(named_struct('_key', key))) - 1)"),
            doc_body, ov_body, F.lit("}"))
        return joined.select("doc_id", json_col.alias("result_json"))

    # ------------------------------------------------------------------
    # SELECT — feature matrix (select.cc:80-154)
    # ------------------------------------------------------------------
    def select_df(self, fields: list[ast.Node], query: ast.Node,
                  with_summaries: bool = False,
                  field_names: list[str] | None = None) -> DataFrame:
        """Feature matrix: one row per selected doc (key first), one
        float column per field query; NaN = missing, all-zero-score
        fields report 1.0 presence (select.cc:47-65).

        All fields evaluate in ONE pass: union-with-index + pivot, so
        Spark schedules every field lookup in parallel (replacing the
        reference's 16-thread pool) and shuffles once.
        """
        comp = self._compiler()
        sel = comp.process_query(query, use_max=False)

        n = len(fields)
        names = field_names or [f"f{i}" for i in range(n)]
        if len(names) != n:
            raise ValueError("field_names length mismatch")

        parts = []
        for i, fq in enumerate(fields):
            fdf = comp.process_query(fq, use_max=False)
            parts.append(fdf.select(F.lit(i).alias("__fidx"), "doc_id",
                                    "score"))
        allf = parts[0]
        for p in parts[1:]:
            allf = allf.unionByName(p)

        # all-zero -> presence indicator 1.0 (select.cc:47-53)
        stats = allf.groupBy("__fidx").agg(
            F.max(F.abs(F.col("score"))).alias("__mx"))
        allf = (allf.join(F.broadcast(stats), "__fidx")
                .withColumn("__val",
                            F.when(F.col("__mx") == 0.0, F.lit(1.0))
                            .otherwise(F.col("score"))))

        matrix = (allf.groupBy("doc_id")
                  .pivot("__fidx", list(range(n)))
                  .agg(F.first("__val")))
        for i, name in enumerate(names):
            matrix = matrix.withColumnRenamed(str(i), name)

        out = sel.select("doc_id").join(matrix, "doc_id", "left")
        for name in names:
            out = out.withColumn(
                name, F.coalesce(F.col(name), F.lit(float("nan"))))

        docs = self.catalog.summary()
        cols = ["key"] + names + (["doc"] if with_summaries else [])
        return (out.join(docs, "doc_id", "left")
                .select("doc_id", *cols).orderBy("doc_id"))

    def select_stmt(self, stmt: ast.SelectStmt) -> DataFrame:
        return self.select_df(stmt.fields, stmt.query,
                              with_summaries=stmt.with_summaries)
