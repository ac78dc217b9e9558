"""Adversarial edge-case fixture generator: copy the sf0.001 tables and
INJECT the rows the driver's synthetic generator never produces — tied
timestamps, NULL payloads at ties, NULL keys/groups, empty/unicode/
whitespace text, exact clone documents, duplicate and zero vectors,
bin-boundary timestamps.  Running the full gate sweep against this
directory (tools/check_gate.py /tmp/cantera_edge) checks that the
Spark implementation and its DuckDB oracle agree on exactly the corner
semantics the regular testdata cannot exercise — the class of latent
divergence a round-4 advisory found by hand in asof_join's forward
tie-break (NULL payload shadowing a real one).

Usage: python tools/edge_data.py [out_dir]   (default /tmp/cantera_edge)
       python tools/edge_data.py --empty [out_dir]
                                 (default /tmp/cantera_empty)

--empty writes every table with its exact source schema and ZERO rows:
the production shape of a filter that matches nothing, a brand-new
source, or an empty ingest day.  Operators at 100 TB must degrade to
empty output (or a defined scalar), never throw — this sweep pins that
for every gate AND its oracle.
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

SRC = "/root/testdata/sf0.001"

PASSTHROUGH = ["region", "nation", "customer", "supplier", "part",
               "orders", "lineitem"]


ALL_TABLES = PASSTHROUGH + ["documents", "events", "embeddings"]


def write_empty(out: str) -> None:
    """Zero-row copies of every table, schemas intact."""
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    con = duckdb.connect()
    for t in ALL_TABLES:
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet' WHERE false) TO "
            f"'{out}/{t}.parquet' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        assert n == 0
    print(f"empty fixture ({len(ALL_TABLES)} zero-row tables) "
          f"written to {out}")


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--empty":
        write_empty(sys.argv[2] if len(sys.argv) > 2
                    else "/tmp/cantera_empty")
        return
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/cantera_edge"
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    con = duckdb.connect()

    for t in PASSTHROUGH:
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO "
            f"'{out}/{t}.parquet' (FORMAT PARQUET)")

    # ---- documents: text-shape corners ---------------------------------
    # doc_ids continue past the copied range so joins stay unique
    con.execute(f"""
COPY (
  SELECT * FROM '{SRC}/documents.parquet'
  UNION ALL
  SELECT * FROM (VALUES
    -- empty and whitespace-only text (0 tokens: packing/spans/quality
    -- operators must agree on the degenerate doc)
    (9000, '', 'en', 'src0', 0),
    (9001, '   ', 'en', 'src0', 3),
    -- single token / single char
    (9002, 'a', 'en', 'src1', 1),
    -- punctuation & digits only (tokenizer [^a-z]+ yields nothing)
    (9003, '!!! ??? 123 456', 'en', 'src1', 15),
    -- unicode: lower()/regex class semantics must match across engines
    (9004, 'Héllo WÖRLD ünïcode ß straße 中文 日本語 emoji 🙂 done',
     'de', 'src2', 48),
    -- embedded tab / newline / backslash (escape paths)
    (9005, 'tab	here' || chr(10) || 'line two \\ backslash', 'en',
     'src2', 40),
    -- exact clones (dedup family: same text, three ids, two sources)
    (9006, 'clone clone text shared by three documents exactly',
     'en', 'src3', 50),
    (9007, 'clone clone text shared by three documents exactly',
     'en', 'src3', 50),
    (9008, 'clone clone text shared by three documents exactly',
     'fr', 'src4', 50),
    -- heavy internal repetition (repeated-spans / span-cut operators)
    (9009, repeat('badger mushroom snake ', 40), 'en', 'src4', 880),
    -- NULL language and NULL source (grouping keys: a NULL group must
    -- surface consistently on both engines)
    (9010, 'null lang document with plain words here', NULL, 'src5', 40),
    (9011, 'null source document with plain words here', 'en', NULL, 42),
    -- one-word doc repeated many times (tf skew)
    (9012, repeat('spark ', 60), 'en', 'src5', 360)
  ) v(doc_id, text, lang, source, n_chars)
) TO '{out}/documents.parquet' (FORMAT PARQUET)""")

    # ---- events: time corners ------------------------------------------
    con.execute(f"""
COPY (
  SELECT * FROM '{SRC}/events.parquet'
  UNION ALL
  SELECT * FROM (VALUES
    -- tied timestamps, same user: view + TWO purchases at the same
    -- instant, one with NULL value (the asof forward tie-break class)
    (9100, TIMESTAMP '2024-01-02 10:00:00', 901, 'view', 1.0, '{{}}'),
    (9101, TIMESTAMP '2024-01-02 10:00:00', 901, 'purchase', NULL, '{{}}'),
    (9102, TIMESTAMP '2024-01-02 10:00:00', 901, 'purchase', 5.0, '{{}}'),
    -- tie at a later instant, NULL first by event_id
    (9103, TIMESTAMP '2024-01-02 11:00:00', 901, 'purchase', NULL, '{{}}'),
    (9104, TIMESTAMP '2024-01-02 10:30:00', 901, 'view', 2.0, '{{}}'),
    -- exact hour-bin boundary hits (interval binning: ts == start,
    -- ts == end of a typical 1h interval)
    (9105, TIMESTAMP '2024-01-02 12:00:00', 902, 'click', 1.5, '{{}}'),
    (9106, TIMESTAMP '2024-01-02 13:00:00', 902, 'purchase', 2.5, '{{}}'),
    -- NULL value on a regular event; NULL event_type; duplicate row
    (9107, TIMESTAMP '2024-01-02 14:00:00', 903, 'view', NULL, '{{}}'),
    (9108, TIMESTAMP '2024-01-02 14:30:00', 903, NULL, 3.0, '{{}}'),
    (9109, TIMESTAMP '2024-01-02 15:00:00', 903, 'view', 4.0, '{{}}'),
    (9110, TIMESTAMP '2024-01-02 15:00:00', 903, 'view', 4.0, '{{}}'),
    -- a user whose events all carry NULL values (all-NULL aggregation
    -- group), plus epoch-second-exact timestamps (no microseconds)
    (9111, TIMESTAMP '2024-01-02 16:00:00', 904, 'purchase', NULL, '{{}}'),
    (9112, TIMESTAMP '2024-01-02 16:00:01', 904, 'purchase', NULL, '{{}}'),
    -- numeric extremes: negative zero, negative values, magnitudes
    -- that stress float formatting/summation on both engines
    (9113, TIMESTAMP '2024-01-02 17:00:00', 905, 'view', -0.0, '{{}}'),
    (9114, TIMESTAMP '2024-01-02 17:00:01', 905, 'view', -185.22, '{{}}'),
    (9115, TIMESTAMP '2024-01-02 17:00:02', 905, 'view', 1e15, '{{}}'),
    (9116, TIMESTAMP '2024-01-02 17:00:03', 905, 'view', 1e-9, '{{}}')
  ) v(event_id, ts, user_id, event_type, value, props)
) TO '{out}/events.parquet' (FORMAT PARQUET)""")

    # ---- embeddings: vector corners ------------------------------------
    # same dim (64) as the source table; vec_ids continue past the range.
    # NO zero vector: cosine(0, x) is NaN and NaN ordering is explicitly
    # engine-specific — the operators' contract (docstrings) requires
    # finite non-degenerate vectors; NULL embeddings ARE in contract
    # (guarded) and included.
    con.execute(f"""
COPY (
  SELECT * FROM '{SRC}/embeddings.parquet'
  UNION ALL
  SELECT * FROM (VALUES
    -- exact duplicate pair (cosine exactly 1.0, tie-breaks by id)
    (9200, (SELECT embedding FROM '{SRC}/embeddings.parquet'
            WHERE vec_id = 7), 1),
    (9201, (SELECT embedding FROM '{SRC}/embeddings.parquet'
            WHERE vec_id = 7), 1),
    -- exact negation (cosine exactly -1.0)
    (9202, (SELECT list_transform(embedding, x -> -x)
            FROM '{SRC}/embeddings.parquet' WHERE vec_id = 7), 2),
    -- NULL embedding (every ANN entry point guards this)
    (9203, NULL, 3),
    -- NULL label
    (9204, (SELECT embedding FROM '{SRC}/embeddings.parquet'
            WHERE vec_id = 11), NULL)
  ) v(vec_id, embedding, label)
) TO '{out}/embeddings.parquet' (FORMAT PARQUET)""")

    for t in PASSTHROUGH + ["documents", "events", "embeddings"]:
        n = con.execute(
            f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")
    print(f"edge fixture written to {out}")


if __name__ == "__main__":
    main()
