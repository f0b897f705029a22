"""Generate scale-factor testdata matching /root/testdata's schema and
distributions, for UPWARD scaling runs (sf1 and beyond) that the driver's
read-only testdata does not provide.

Shapes are fit to the driver's sf0.1 tables (sampled empirically:
key ranges, category frequencies, lineitem-per-order fan-out, document
vocabulary and length, embedding cluster structure) and generated
deterministically (numpy PCG64, seed 4242) so runs are reproducible.
Row counts scale linearly: sf1 = 10x sf0.1 on every non-dimension table.

Usage:
    python tools/gen_scale_data.py [sf] [out_dir]
    # default: sf=1.0, out_dir=.scaledata/sf1   (gitignored)

The output is bench-compatible: SPARK_GRAFT_SF_DIR=<out_dir> python bench.py
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REF = "/root/testdata/sf0.1"  # shape donor (read-only)

# rows per table at sf=1.0 (10x the driver's sf0.1)
COUNTS = {
    "customer": 150_000,
    "supplier": 10_000,
    "part": 200_000,
    "orders": 1_500_000,
    "events": 1_000_000,
    "documents": 50_000,
    "embeddings": 20_000,
}

MKTSEGMENTS = ["FURNITURE", "MACHINERY", "AUTOMOBILE", "HOUSEHOLD", "BUILDING"]
P_TYPES = ["LARGE", "ECONOMY", "SMALL", "STANDARD", "PROMO", "MEDIUM"]
P_ADJ = ["large", "hot", "blue", "red", "small", "green", "cold", "dark"]
P_NOUN = ["ring", "bolt", "screw", "washer", "nut", "plate", "rod", "gear"]
O_STATUS = ["O", "P", "F"]
O_PRIO = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
EVENT_TYPES = ["signup", "click", "purchase", "error", "view"]
LANGS = (["en"] * 41 + ["de"] * 15 + ["zh"] * 15 + ["fr"] * 15 + ["es"] * 14)

US = 1_000_000  # microseconds per second


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    path = os.path.join(out_dir, f"{name}.parquet")
    # row groups sized so local[32] gets parallel splits without tiny files
    pq.write_table(table, path, row_group_size=200_000)
    print(f"  {name}: {table.num_rows} rows -> {path}", flush=True)


def _ts_us(days_from: str, span_days: float, n: int, rng) -> pa.Array:
    base = np.datetime64(days_from, "us").astype("int64")
    offs = (rng.random(n) * span_days * 86400 * US).astype("int64")
    return pa.array(base + offs, type=pa.timestamp("us"))


def gen(sf: float, out_dir: str, seed: int = 4242) -> None:
    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)
    scale = sf / 0.1  # COUNTS are calibrated at sf1 = 10x sf0.1
    n = {k: max(1, int(v * sf)) for k, v in COUNTS.items()}

    # dimensions are sf-invariant: copy the driver's region/nation
    for dim in ("region", "nation"):
        t = pq.read_table(os.path.join(REF, f"{dim}.parquet"))
        _write(out_dir, dim, t)

    # ---- customer ----
    nc = n["customer"]
    _write(out_dir, "customer", pa.table({
        "c_custkey": pa.array(np.arange(nc), type=pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(nc)],
        "c_nationkey": pa.array(rng.integers(0, 25, nc), type=pa.int32()),
        "c_acctbal": np.round(rng.uniform(-999.99, 9999.99, nc), 2),
        "c_mktsegment": pa.array(np.array(MKTSEGMENTS)[rng.integers(0, 5, nc)]),
    }))

    # ---- supplier ----
    ns = n["supplier"]
    _write(out_dir, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(ns), type=pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(ns)],
        "s_nationkey": pa.array(rng.integers(0, 25, ns), type=pa.int32()),
        "s_acctbal": np.round(rng.uniform(-999.99, 9999.99, ns), 2),
    }))

    # ---- part ----
    npart = n["part"]
    _write(out_dir, "part", pa.table({
        "p_partkey": pa.array(np.arange(npart), type=pa.int64()),
        "p_name": [
            f"{P_ADJ[i % 8]} {P_NOUN[(i // 8) % 8]}"
            for i in rng.integers(0, 64, npart)
        ],
        "p_brand": [f"Brand#{b}" for b in rng.integers(0, 25, npart)],
        "p_type": pa.array(np.array(P_TYPES)[rng.integers(0, 6, npart)]),
        "p_size": pa.array(rng.integers(1, 51, npart), type=pa.int32()),
        "p_retailprice": np.round(rng.uniform(900.0, 999.9, npart), 2),
    }))

    # ---- orders ----
    no = n["orders"]
    _write(out_dir, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(no), type=pa.int64()),
        "o_custkey": pa.array(rng.integers(0, nc, no), type=pa.int64()),
        "o_orderstatus": pa.array(np.array(O_STATUS)[rng.integers(0, 3, no)]),
        "o_totalprice": np.round(rng.uniform(1000.0, 500000.0, no), 2),
        "o_orderdate": _ts_us("1995-01-01", 365.25 * 6.6, no, rng),
        "o_orderpriority": pa.array(np.array(O_PRIO)[rng.integers(0, 5, no)]),
    }))

    # ---- lineitem: 1 + Poisson(3) lines per order (mean 4, the sf0.1 fit)
    per_order = 1 + rng.poisson(3.0, no)
    l_orderkey = np.repeat(np.arange(no, dtype=np.int64), per_order)
    nl = len(l_orderkey)
    linenumber = (
        np.arange(nl, dtype=np.int64)
        - np.repeat(np.concatenate(([0], np.cumsum(per_order)[:-1])), per_order)
        + 1
    )
    qty = rng.integers(1, 51, nl).astype("float64")
    _write(out_dir, "lineitem", pa.table({
        "l_orderkey": pa.array(l_orderkey, type=pa.int64()),
        "l_partkey": pa.array(rng.integers(0, npart, nl), type=pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, ns, nl), type=pa.int64()),
        "l_linenumber": pa.array(linenumber, type=pa.int32()),
        "l_quantity": qty,
        "l_extendedprice": np.round(qty * rng.uniform(900.0, 2100.0, nl), 2),
        "l_discount": np.round(rng.integers(0, 11, nl) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, nl) / 100.0, 2),
        "l_returnflag": pa.array(np.array(["R", "A", "N"])[rng.integers(0, 3, nl)]),
        "l_linestatus": pa.array(np.array(["F", "O"])[rng.integers(0, 2, nl)]),
        "l_shipdate": _ts_us("1995-01-01", 365.25 * 6.85, nl, rng),
    }))
    print(f"  (lineitem fan-out mean {nl / no:.2f})", flush=True)

    # ---- events ----
    ne = n["events"]
    _write(out_dir, "events", pa.table({
        "event_id": pa.array(np.arange(ne), type=pa.int64()),
        "ts": _ts_us("2024-01-01", 30.0, ne, rng),
        "user_id": pa.array(
            rng.integers(0, max(1, int(1500 * scale)), ne), type=pa.int64()
        ),
        "event_type": pa.array(np.array(EVENT_TYPES)[rng.integers(0, 5, ne)]),
        "value": np.round(rng.exponential(80.0, ne).clip(0, 560.0), 2),
        "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, ne)],
    }))

    # ---- documents: bag-of-words over the driver's own vocabulary, with
    # the empirical word-frequency and doc-length profile, plus a 0.2%
    # exact-duplicate tail (the sf0.1 rate) so dedup queries stay honest
    ref_docs = pq.read_table(
        os.path.join(REF, "documents.parquet"), columns=["text"]
    )["text"].to_pylist()
    from collections import Counter

    freq = Counter(w for t in ref_docs for w in t.split(" "))
    vocab = np.array(list(freq))
    probs = np.array(list(freq.values()), dtype="float64")
    probs /= probs.sum()
    lengths = np.array([len(t.split(" ")) for t in ref_docs])
    nd = n["documents"]
    n_dup = max(1, nd // 500)
    n_uniq = nd - n_dup
    doc_lens = rng.choice(lengths, n_uniq)
    words = rng.choice(vocab, size=int(doc_lens.sum()), p=probs)
    texts, pos = [], 0
    for ln in doc_lens:
        texts.append(" ".join(words[pos:pos + ln]))
        pos += ln
    texts.extend(rng.choice(np.array(texts), n_dup))  # exact-dup tail
    _write(out_dir, "documents", pa.table({
        "doc_id": pa.array(np.arange(nd), type=pa.int64()),
        "text": texts,
        "lang": pa.array(np.array(LANGS)[rng.integers(0, len(LANGS), nd)]),
        "source": [f"src{s}" for s in rng.integers(0, 20, nd)],
        "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
    }))

    # ---- embeddings: 10 gaussian clusters in 64-d (label = cluster), the
    # structure that makes IVF/ANN pruning and recall queries meaningful
    nv = n["embeddings"]
    centers = rng.normal(0.0, 1.0, (10, 64))
    labels = rng.integers(0, 10, nv)
    vecs = (centers[labels] + rng.normal(0.0, 0.35, (nv, 64))).astype("float32")
    _write(out_dir, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(nv), type=pa.int64()),
        "embedding": pa.array(list(vecs), type=pa.list_(pa.float32())),
        "label": pa.array(labels, type=pa.int32()),
    }))

    # schema parity check against the donor
    for name in list(COUNTS) + ["region", "nation", "lineitem"]:
        ref = pq.read_schema(os.path.join(REF, f"{name}.parquet"))
        got = pq.read_schema(os.path.join(out_dir, f"{name}.parquet"))
        for f in ref:
            g = got.field(f.name) if f.name in got.names else None
            assert g is not None and g.type == f.type, (
                f"{name}.{f.name}: {g.type if g else None} != {f.type}"
            )
    print("schema parity vs sf0.1: OK", flush=True)


if __name__ == "__main__":
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".scaledata",
            f"sf{sf:g}",
        )
    )
    print(f"generating sf={sf} into {out}")
    gen(sf, out)
