"""Deterministic scale-up of the driver's synthetic testdata.

Replicates an existing sf directory K times with consistent key
offsets so every FK relation keeps its selectivity (each copy is a
disjoint key universe joined to the shared region/nation dims).
Content columns that drive similarity operators are re-synthesized
per copy — document text is re-sampled from the source row's own
vocabulary and embeddings get small deterministic perturbations — so
the scaled corpus does not contain K exact copies of every document
(which would quadratically inflate near-dup pair counts and measure
an artifact, not throughput).

Usage: python tools/make_sf.py SRC_DIR DST_DIR K
e.g.   python tools/make_sf.py /root/testdata/sf0.1 testdata_sf1 10

Output is bench-only input (oracle correctness still runs at
driver-pinned scales); keep DST out of git.
"""

from __future__ import annotations

import os
import random
import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

# per-copy key offsets = (max key + 1) of the source table, queried at
# runtime; FK columns shift by the parent's offset
PLAIN_SQL = {
    "region": None,   # shared dims: copied once
    "nation": None,
    "customer": (
        "SELECT c_custkey + {i} * {customer} AS c_custkey, c_name, "
        "c_nationkey, c_acctbal, c_mktsegment FROM src"
    ),
    "supplier": (
        "SELECT s_suppkey + {i} * {supplier} AS s_suppkey, s_name, "
        "s_nationkey, s_acctbal FROM src"
    ),
    "part": (
        "SELECT p_partkey + {i} * {part} AS p_partkey, p_name, p_brand, "
        "p_type, p_size, p_retailprice FROM src"
    ),
    "orders": (
        "SELECT o_orderkey + {i} * {orders} AS o_orderkey, "
        "o_custkey + {i} * {customer} AS o_custkey, o_orderstatus, "
        "o_totalprice, o_orderdate, o_orderpriority FROM src"
    ),
    "lineitem": (
        "SELECT l_orderkey + {i} * {orders} AS l_orderkey, "
        "l_partkey + {i} * {part} AS l_partkey, "
        "l_suppkey + {i} * {supplier} AS l_suppkey, "
        "l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, "
        "l_returnflag, l_linestatus, l_shipdate FROM src"
    ),
    "events": (
        "SELECT event_id + {i} * {events} AS event_id, ts, "
        "user_id + {i} * {users} AS user_id, event_type, value, props "
        "FROM src"
    ),
}

KEY_SQL = {
    "customer": "SELECT max(c_custkey) + 1 FROM src",
    "supplier": "SELECT max(s_suppkey) + 1 FROM src",
    "part": "SELECT max(p_partkey) + 1 FROM src",
    "orders": "SELECT max(o_orderkey) + 1 FROM src",
    "events": "SELECT max(event_id) + 1 FROM src",
}


def scale_plain(con, src_dir, dst_dir, k, offsets):
    for name, tpl in PLAIN_SQL.items():
        src = os.path.join(src_dir, f"{name}.parquet")
        dst = os.path.join(dst_dir, f"{name}.parquet")
        con.execute(
            f"CREATE OR REPLACE VIEW src AS SELECT * FROM read_parquet('{src}')"
        )
        if tpl is None:
            con.execute(f"COPY src TO '{dst}' (FORMAT parquet)")
            continue
        parts = ["(" + tpl.format(i=i, **offsets) + ")" for i in range(k)]
        union = " UNION ALL ".join(parts)
        con.execute(f"COPY ({union}) TO '{dst}' (FORMAT parquet)")
        print(f"{name}: x{k}", flush=True)


def _row_group_rows(sample_table, target_bytes=32 << 20):
    """Rows per parquet row group targeting ~32 MB uncompressed — the
    warehouse-layout shape (several groups per file) rather than
    pyarrow's default whole-table single group, which reports
    byte-range splits to Spark but serializes all map work onto one
    task (SCALE.md round-9 trap; spread() probes footers as the
    backstop, but the fixture itself should not need it)."""
    bpr = max(1, sample_table.nbytes // max(1, sample_table.num_rows))
    return max(8192, min(1 << 20, target_bytes // bpr))


def scale_documents(src_dir, dst_dir, k):
    """Copy 0 verbatim; copies 1..k-1 re-sample each document's words
    from its own vocabulary (seeded per row) — same length and word
    statistics, no cross-copy near-duplicate structure. Written one
    copy at a time through a ParquetWriter with explicit row-group
    sizing (bounded memory, multi-group layout)."""
    t = pq.read_table(os.path.join(src_dir, "documents.parquet"))
    n = t.num_rows
    doc_ids = t.column("doc_id").to_pylist()
    texts = t.column("text").to_pylist()
    langs = t.column("lang").to_pylist()
    sources = t.column("source").to_pylist()
    schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("text", pa.string()),
            ("lang", pa.string()),
            ("source", pa.string()),
            ("n_chars", pa.int64()),
        ]
    )
    group_rows = _row_group_rows(t)
    writer = pq.ParquetWriter(
        os.path.join(dst_dir, "documents.parquet"), schema
    )
    for i in range(k):
        out_ids, out_text, out_n = [], [], []
        for j in range(n):
            if i == 0:
                txt = texts[j]
            else:
                words = texts[j].split()
                rng = random.Random(doc_ids[j] * 1009 + i)
                txt = " ".join(rng.choice(words) for _ in range(len(words)))
            out_ids.append(doc_ids[j] + i * n)
            out_text.append(txt)
            out_n.append(len(txt))
        writer.write_table(
            pa.table(
                {
                    "doc_id": pa.array(out_ids, pa.int64()),
                    "text": pa.array(out_text, pa.string()),
                    "lang": pa.array(langs, pa.string()),
                    "source": pa.array(sources, pa.string()),
                    "n_chars": pa.array(out_n, pa.int64()),
                },
                schema=schema,
            ),
            row_group_size=group_rows,
        )
    writer.close()
    print(f"documents: x{k} (resampled, {group_rows} rows/group)", flush=True)


def scale_embeddings(src_dir, dst_dir, k):
    """Copy 0 verbatim; later copies add a small deterministic
    perturbation per component — geometry (labels, rough neighbor
    structure) is preserved, exact duplicates are not."""
    t = pq.read_table(os.path.join(src_dir, "embeddings.parquet"))
    n = t.num_rows
    vec_ids = t.column("vec_id").to_pylist()
    vecs = t.column("embedding").to_pylist()
    labels = t.column("label").to_pylist()
    schema = pa.schema(
        [
            ("vec_id", pa.int64()),
            ("embedding", pa.list_(pa.float32())),
            ("label", pa.int32()),
        ]
    )
    group_rows = _row_group_rows(t)
    writer = pq.ParquetWriter(
        os.path.join(dst_dir, "embeddings.parquet"), schema
    )
    for i in range(k):
        out_ids, out_vec = [], []
        for j in range(n):
            v = vecs[j]
            if i > 0:
                v = [
                    c + (((vec_ids[j] * 31 + i * 7 + d) % 997) - 498) * 2e-4
                    for d, c in enumerate(v)
                ]
            out_ids.append(vec_ids[j] + i * n)
            out_vec.append(v)
        writer.write_table(
            pa.table(
                {
                    "vec_id": pa.array(out_ids, pa.int64()),
                    "embedding": pa.array(out_vec, pa.list_(pa.float32())),
                    "label": pa.array(labels, pa.int32()),
                },
                schema=schema,
            ),
            row_group_size=group_rows,
        )
    writer.close()
    print(f"embeddings: x{k} (perturbed, {group_rows} rows/group)", flush=True)


def main():
    src_dir, dst_dir, k = sys.argv[1], sys.argv[2], int(sys.argv[3])
    os.makedirs(dst_dir, exist_ok=True)
    con = duckdb.connect()
    offsets = {}
    for name, sql in KEY_SQL.items():
        con.execute(
            "CREATE OR REPLACE VIEW src AS SELECT * FROM "
            f"read_parquet('{os.path.join(src_dir, name + '.parquet')}')"
        )
        offsets[name] = con.execute(sql).fetchone()[0]
    con.execute(
        "CREATE OR REPLACE VIEW src AS SELECT * FROM "
        f"read_parquet('{os.path.join(src_dir, 'events.parquet')}')"
    )
    offsets["users"] = con.execute("SELECT max(user_id) + 1 FROM src").fetchone()[0]
    scale_plain(con, src_dir, dst_dir, k, offsets)
    scale_documents(src_dir, dst_dir, k)
    scale_embeddings(src_dir, dst_dir, k)


if __name__ == "__main__":
    main()
