#!/usr/bin/env python3
"""Synthesize the ROUND11 scale-measurement corpora (dev tooling only —
NOT part of the engine).

Usage: python3 tools/make_scale_corpus.py <sfDir> <outDir> [copies]

Builds an id-shifted union of `copies` (default 10) copies of <sfDir>:
fact-table keys are shifted into disjoint ranges per copy (orderkey
+1e6*i, cust/user keys +1e5*i, doc/vec ids +1e5*i) so joins scale
honestly; dimension tables are copied once. NOTE the documented caveat
(ROUND11.md §5): text/embedding PAYLOADS repeat across copies, so
near-dup/ANN queries see every document with copies-1 exact twins — an
adversarial duplicate density no real 10x crawl has. Pair-emitting
operators' OUTPUT genuinely grows quadratically in that density; judge
their scaling by output accounting, not wall-clock alone.
"""
import sys

import duckdb


def main(sf_dir: str, out_dir: str, copies: int = 10) -> None:
    con = duckdb.connect()
    b = dict(ordk=1_000_000, cust=100_000, part=100_000, supp=10_000,
             evt=1_000_000, usr=100_000, doc=100_000, vec=100_000)
    cps = f"(SELECT unnest(generate_series(0, {copies - 1})) AS i)"
    jobs = {
        "lineitem": f"""SELECT l_orderkey + i*{b['ordk']} AS l_orderkey,
            l_partkey + i*{b['part']} AS l_partkey,
            l_suppkey + i*{b['supp']} AS l_suppkey,
            l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
            l_returnflag, l_linestatus, l_shipdate
          FROM '{sf_dir}/lineitem.parquet', {cps}""",
        "orders": f"""SELECT o_orderkey + i*{b['ordk']} AS o_orderkey,
            o_custkey + i*{b['cust']} AS o_custkey, o_orderstatus,
            o_totalprice, o_orderdate, o_orderpriority
          FROM '{sf_dir}/orders.parquet', {cps}""",
        "customer": f"""SELECT c_custkey + i*{b['cust']} AS c_custkey,
            c_name, c_nationkey, c_acctbal, c_mktsegment
          FROM '{sf_dir}/customer.parquet', {cps}""",
        "part": f"""SELECT p_partkey + i*{b['part']} AS p_partkey, p_name,
            p_brand, p_type, p_size, p_retailprice
          FROM '{sf_dir}/part.parquet', {cps}""",
        "supplier": f"""SELECT s_suppkey + i*{b['supp']} AS s_suppkey,
            s_name, s_nationkey, s_acctbal
          FROM '{sf_dir}/supplier.parquet', {cps}""",
        "events": f"""SELECT event_id + i*{b['evt']} AS event_id, ts,
            user_id + i*{b['usr']} AS user_id, event_type, value, props
          FROM '{sf_dir}/events.parquet', {cps}""",
        "documents": f"""SELECT doc_id + i*{b['doc']} AS doc_id, text,
            lang, source, n_chars
          FROM '{sf_dir}/documents.parquet', {cps}""",
        "embeddings": f"""SELECT vec_id + i*{b['vec']} AS vec_id,
            embedding, label
          FROM '{sf_dir}/embeddings.parquet', {cps}""",
        "nation": f"SELECT * FROM '{sf_dir}/nation.parquet'",
        "region": f"SELECT * FROM '{sf_dir}/region.parquet'",
    }
    for t, q in jobs.items():
        con.execute(f"COPY ({q}) TO '{out_dir}/{t}.parquet' (FORMAT PARQUET)")
        n = con.sql(f"SELECT COUNT(*) FROM '{out_dir}/{t}.parquet'").fetchone()[0]
        print(t, n)


if __name__ == "__main__":
    import pathlib
    out = sys.argv[2]
    pathlib.Path(out).mkdir(parents=True, exist_ok=True)
    main(sys.argv[1], out, int(sys.argv[3]) if len(sys.argv) > 3 else 10)
