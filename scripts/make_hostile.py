"""Build a hostile clone of a testdata scale-factor directory.

Copies the TPC-H-ish passthrough tables verbatim and re-writes ``events``,
``documents`` and ``embeddings`` with planted hostile rows — NULLs in every
nullable column, malformed JSON, empty/CJK/separator-smuggling/very-long
text, and ragged/empty/NULL embedding vectors. Running the full oracle gate
against the clone checks that BOTH engines assign the same (well-defined)
semantics to degenerate input, not just to the friendly fixtures:

    PYTHONPATH=. python scripts/make_hostile.py [--src /root/testdata/sf0.001]
                                                [--out /tmp/hostile_sf]
    PYTHONPATH=. python scripts/check_oracle.py --sf /tmp/hostile_sf

This sweep is how the NULL-user_id conv_id divergence (Spark concat
null-propagates, DuckDB concat treats NULL as '') and the DuckDB
json_extract crash on malformed props were found.
"""

from __future__ import annotations

import argparse
import os
import shutil

import duckdb

PASSTHROUGH = [
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem",
]


def build(src: str, out: str) -> None:
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    for t in PASSTHROUGH:
        p = f"{src}/{t}.parquet"
        if os.path.isdir(p):
            shutil.copytree(p, f"{out}/{t}.parquet")
        elif os.path.exists(p):
            shutil.copy(p, f"{out}/{t}.parquet")

    con = duckdb.connect()
    # events: NULL ts, NULL user_id, NULL props, malformed JSON props,
    # NULL event_type/value
    con.execute(f"""
COPY (
  SELECT * FROM '{src}/events.parquet'
  UNION ALL
  SELECT * FROM (VALUES
    (9000001, NULL::TIMESTAMP, 42, 'view',  1.0, '{{"k": 1}}'),
    (9000002, TIMESTAMP '2026-03-01 00:00:00.123456', NULL, 'purchase',
     NULL, 'not json at all'),
    (9000003, TIMESTAMP '2026-03-01 00:00:00.123457', 42, NULL, 2.5, NULL),
    (9000004, TIMESTAMP '2026-03-01 00:00:01', 42, 'view', 3.0,
     '{{"deeply": {{"nested": [1,2,3]}}}}')
  ) v(event_id, ts, user_id, event_type, value, props)
) TO '{out}/events.parquet' (FORMAT PARQUET)
""")
    # documents: NULL text, empty text, CJK/emoji, separator smuggling,
    # very long doc, NULL lang/source
    big = "word " * 3000
    con.execute(f"""
COPY (
  SELECT * FROM '{src}/documents.parquet'
  UNION ALL
  SELECT * FROM (VALUES
    (9000001, NULL, 'en', 'web', 0),
    (9000002, '', NULL, 'web', 0),
    (9000003, '今天天气很好 🚀 emoji and 中文', 'zh', NULL, 17),
    (9000004, 'separator \x1e\x1f smuggling | pipe', 'en', 'web', 30),
    (9000005, '{big}', 'en', 'books', {len(big)})
  ) v(doc_id, text, lang, source, n_chars)
) TO '{out}/documents.parquet' (FORMAT PARQUET)
""")
    # embeddings: NULL vector, empty vector, wrong-dim vector, NULL label,
    # and three CORRECT-dimension degenerates — NaN element, Inf element,
    # all-zero — which ride the exact cosine path (ragged ones exit early).
    # Both engines order NaN above every real double and pass NaN >= tau,
    # so an unguarded NaN corpus vector tops EVERY query's top-k; Inf makes
    # inf/inf = NaN in the divide; zero-norm exercises try_divide's NULL.
    dim = con.execute(
        f"SELECT len(embedding) FROM '{src}/embeddings.parquet' LIMIT 1"
    ).fetchone()[0]
    con.execute(f"""
COPY (
  SELECT * FROM '{src}/embeddings.parquet'
  UNION ALL
  SELECT * FROM (VALUES
    (9000001, NULL, 1),
    (9000002, []::FLOAT[], NULL),
    (9000003, [1.0, 2.0]::FLOAT[], 2),
    (9000004, list_transform(range({dim}), i ->
        CASE WHEN i = 0 THEN 'nan'::FLOAT ELSE 0.1::FLOAT END)::FLOAT[], 3),
    (9000005, list_transform(range({dim}), i ->
        CASE WHEN i = 0 THEN 'inf'::FLOAT ELSE 0.1::FLOAT END)::FLOAT[], 4),
    (9000006, list_transform(range({dim}), i -> 0.0::FLOAT)::FLOAT[], 5)
  ) v(vec_id, embedding, label)
) TO '{out}/embeddings.parquet' (FORMAT PARQUET)
""")
    print("hostile tables written:", sorted(os.listdir(out)))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default="/tmp/hostile_sf")
    args = ap.parse_args()
    build(args.src, args.out)
