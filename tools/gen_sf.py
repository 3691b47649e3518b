"""Deterministic local fixture generator for scale factors the driver
doesn't ship.

/root/testdata provides sf0.001/0.01/0.1 (read-only). The 100 TB
question needs at least one decade more of local evidence, so this
produces an sf1 (or any sf) directory with the SAME ten tables,
schemas, key ranges, and value distributions as the driver's data —
measured from sf0.1 (see docstrings per table) — under
``.localdata/`` (gitignored). Correctness gates still run ONLY against
the driver's directories; these fixtures exist purely for
``bench.py --scaling``'s wall-clock-vs-sf curves.

Usage::

    python tools/gen_sf.py 1.0            # -> .localdata/sf1
    python tools/gen_sf.py 0.3 --out DIR  # custom target

Determinism: a single numpy PCG64 seeded with (42, sf-in-thousandths)
drives every table, so regeneration is bit-identical.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# Observed at sf0.1: rows per table / sf (documents and embeddings are
# floored — the driver keeps 500 rows at both sf0.001 and sf0.01).
ROWS_PER_SF = {
    "customer": 150_000,
    "supplier": 10_000,
    "part": 200_000,
    "orders": 1_500_000,
    "lineitem_orders": 1_500_000,  # lineitem rows follow orders (1-7 lines each)
    "events": 1_000_000,
    "documents": 50_000,
    "embeddings": 20_000,
}
DOC_FLOOR = 500
EMB_FLOOR = 500

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PART_TYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
PART_ADJS = ["large", "hot", "blue", "red", "green", "small", "cold", "dark"]
PART_NOUNS = ["ring", "bolt", "nut", "gear", "cog", "pin", "rod", "cap"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
# The documents vocab observed at sf0.1 (30 base words; 'dup' is the
# 31st, appearing only in planted near-duplicate copies).
DOC_VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window",
]
DOC_LANGS = ["en", "de", "es", "fr", "zh"]
DOC_LANG_P = [0.42, 0.145, 0.145, 0.145, 0.145]  # en-heavy, observed
N_SOURCES = 20
NEARDUP_FRAC = 0.05  # docs that are 1-word-mutated copies ('dup' marker)
EXACTDUP_FRAC = 0.0016  # verbatim copies (8 pairs / 5000 docs at sf0.1)

DAY_US = 86_400_000_000  # microseconds per day


def _ts_us(rng: np.random.Generator, n: int, lo_day: str, hi_day: str) -> np.ndarray:
    lo = np.datetime64(lo_day).astype("datetime64[us]").astype(np.int64)
    hi = np.datetime64(hi_day).astype("datetime64[us]").astype(np.int64)
    return rng.integers(lo, hi, n)


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    path = os.path.join(out_dir, f"{name}.parquet")
    pq.write_table(table, path, compression="snappy")
    print(f"  {name}: {table.num_rows} rows -> {path}")


def _ts_col(us: np.ndarray) -> pa.Array:
    return pa.array(us, type=pa.timestamp("us"))


def generate(sf: float, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.Generator(np.random.PCG64([42, int(round(sf * 1000))]))

    _write(out_dir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    _write(out_dir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    n_cust = int(ROWS_PER_SF["customer"] * sf)
    _write(out_dir, "customer", pa.table({
        "c_custkey": np.arange(n_cust, dtype=np.int64),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": rng.integers(0, 25, n_cust).astype(np.int32),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": np.array(SEGMENTS)[rng.integers(0, 5, n_cust)],
    }))

    n_supp = int(ROWS_PER_SF["supplier"] * sf)
    _write(out_dir, "supplier", pa.table({
        "s_suppkey": np.arange(n_supp, dtype=np.int64),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": rng.integers(0, 25, n_supp).astype(np.int32),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
    }))

    n_part = int(ROWS_PER_SF["part"] * sf)
    adj = np.array(PART_ADJS)[rng.integers(0, len(PART_ADJS), n_part)]
    noun = np.array(PART_NOUNS)[rng.integers(0, len(PART_NOUNS), n_part)]
    _write(out_dir, "part", pa.table({
        "p_partkey": np.arange(n_part, dtype=np.int64),
        "p_name": np.char.add(np.char.add(adj, " "), noun),
        "p_brand": np.array([f"Brand#{b}" for b in range(1, 26)])[
            rng.integers(0, 25, n_part)
        ],
        "p_type": np.array(PART_TYPES)[rng.integers(0, 6, n_part)],
        "p_size": rng.integers(1, 51, n_part).astype(np.int32),
        # observed: retailprice = 900 + (partkey % 1000) / 10
        "p_retailprice": 900.0 + (np.arange(n_part) % 1000) / 10.0,
    }))

    n_ord = int(ROWS_PER_SF["orders"] * sf)
    odate_us = _ts_us(rng, n_ord, "1995-01-01", "2001-08-02")
    odate_us -= odate_us % DAY_US  # observed: date-granular timestamps
    _write(out_dir, "orders", pa.table({
        "o_orderkey": np.arange(n_ord, dtype=np.int64),
        "o_custkey": rng.integers(0, max(n_cust, 1), n_ord),
        "o_orderstatus": np.array(["F", "O", "P"])[rng.integers(0, 3, n_ord)],
        "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
        "o_orderdate": _ts_col(odate_us),
        "o_orderpriority": np.array(PRIORITIES)[rng.integers(0, 5, n_ord)],
    }))

    # lineitem: each order draws 1-7 lines (observed mean ~4.08)
    n_lines = rng.integers(1, 8, n_ord)
    l_orderkey = np.repeat(np.arange(n_ord, dtype=np.int64), n_lines)
    total = int(n_lines.sum())
    linenumber = (
        np.arange(total, dtype=np.int64)
        - np.repeat(np.cumsum(n_lines) - n_lines, n_lines)
        + 1
    ).astype(np.int32)
    qty = rng.integers(1, 51, total).astype(np.float64)
    sdate_us = np.repeat(odate_us, n_lines) + rng.integers(1, 96, total) * DAY_US
    _write(out_dir, "lineitem", pa.table({
        "l_orderkey": l_orderkey,
        "l_partkey": rng.integers(0, max(n_part, 1), total),
        "l_suppkey": rng.integers(0, max(n_supp, 1), total),
        "l_linenumber": linenumber,
        "l_quantity": qty,
        "l_extendedprice": np.round(qty * rng.uniform(900, 2100, total), 2),
        "l_discount": np.round(rng.integers(0, 11, total) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, total) / 100.0, 2),
        "l_returnflag": np.array(["A", "N", "R"])[rng.integers(0, 3, total)],
        "l_linestatus": np.array(["F", "O"])[rng.integers(0, 2, total)],
        "l_shipdate": _ts_col(sdate_us),
    }))

    n_ev = int(ROWS_PER_SF["events"] * sf)
    n_users = max(int(n_ev * 0.015), 1)  # 1500 users / 100k events observed
    _write(out_dir, "events", pa.table({
        "event_id": np.arange(n_ev, dtype=np.int64),
        "ts": _ts_col(np.sort(_ts_us(rng, n_ev, "2024-01-01", "2024-01-31"))),
        "user_id": rng.integers(0, n_users, n_ev),
        "event_type": np.array(EVENT_TYPES)[rng.integers(0, 5, n_ev)],
        "value": np.round(rng.exponential(75.0, n_ev).clip(0, 600), 2),
        "props": [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, n_ev)],
    }))

    # documents: 10-100 words from the 30-word vocab; ~5% near-dup
    # copies of an earlier doc with one word swapped to 'dup'; ~0.16%
    # verbatim copies — the densities the LSH/dedup queries see.
    n_doc = max(DOC_FLOOR, int(ROWS_PER_SF["documents"] * sf))
    vocab = np.array(DOC_VOCAB)
    texts: list[str] = []
    for i in range(n_doc):
        wc = int(rng.integers(10, 101))
        texts.append(" ".join(vocab[rng.integers(0, len(vocab), wc)]))
    n_near = int(n_doc * NEARDUP_FRAC)
    for tgt in rng.choice(n_doc, n_near, replace=False):
        src_doc = int(rng.integers(0, n_doc))
        words = texts[src_doc].split(" ")
        words[int(rng.integers(0, len(words)))] = "dup"
        texts[int(tgt)] = " ".join(words)
    n_exact = int(n_doc * EXACTDUP_FRAC)
    if n_exact:
        picks = rng.choice(n_doc, 2 * n_exact, replace=False)
        for a, b in picks.reshape(-1, 2):
            texts[int(b)] = texts[int(a)]
    _write(out_dir, "documents", pa.table({
        "doc_id": np.arange(n_doc, dtype=np.int64),
        "text": texts,
        "lang": np.array(DOC_LANGS)[
            rng.choice(len(DOC_LANGS), n_doc, p=DOC_LANG_P)
        ],
        "source": np.array([f"src{s}" for s in range(N_SOURCES)])[
            rng.integers(0, N_SOURCES, n_doc)
        ],
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
    }))

    # embeddings: unit-norm 64-dim gaussians, label uniform 0-9
    # (observed: no cluster structure, no planted near-dup vectors)
    n_emb = max(EMB_FLOOR, int(ROWS_PER_SF["embeddings"] * sf))
    E = rng.standard_normal((n_emb, 64)).astype(np.float32)
    E /= np.linalg.norm(E, axis=1, keepdims=True)
    _write(out_dir, "embeddings", pa.table({
        "vec_id": np.arange(n_emb, dtype=np.int64),
        "embedding": pa.array(list(E), pa.list_(pa.float32())),
        "label": rng.integers(0, 10, n_emb).astype(np.int32),
    }))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("sf", type=float, help="scale factor, e.g. 1.0")
    ap.add_argument("--out", default=None, help="target dir (default .localdata/sf<sf>)")
    args = ap.parse_args()
    sf_name = f"{args.sf:g}"
    out = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".localdata",
        f"sf{sf_name}",
    )
    print(f"generating sf{sf_name} -> {out}")
    generate(args.sf, out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
