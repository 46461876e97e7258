#!/usr/bin/env python3
"""Measurement-only 10x scale-up of the driver's sf0.1 fixtures.

The driver's round-end measurement runs at a LARGER, driver-generated scale
factor (BENCH_r05.json recorded sf=1.0) that does not exist in this sandbox.
This script synthesizes an sf-N-shaped dataset with the SAME schemas and the
sf0.1 fixtures' empirical distributions (word vocabulary + frequencies, doc
length law, key ranges, dim-table copies) so heavy-query optimization can be
measured at driver scale.  Deterministic (fixed numpy seed).  Output goes to
a separate directory (default /root/scaledata/sf1.0) — /root/testdata is
read-only and never touched.

NOT part of the frozen measurement contract; bench.py reads whatever
$SPARK_GRAFT_SF_DIR points to.

Usage: python scripts/gen_scaledata.py [scale=10] [out_dir]
"""

from __future__ import annotations

import os
import shutil
import sys

import numpy as np
import pandas as pd

SRC = "/root/testdata/sf0.1"


def gen_documents(scale: int, rng: np.random.Generator) -> pd.DataFrame:
    d = pd.read_parquet(f"{SRC}/documents.parquet")
    words = pd.Series(" ".join(d.text.tolist()).split(" ")).value_counts()
    vocab = words.index.to_numpy()
    probs = (words / words.sum()).to_numpy()
    n = len(d) * scale
    # empirical word-count law (uniform 10..100 in the fixture; resample it)
    nw = rng.choice(d.text.str.split(" ").str.len().to_numpy(), size=n)
    total = int(nw.sum())
    flat = rng.choice(vocab, size=total, p=probs)
    texts = []
    off = 0
    for c in nw:
        texts.append(" ".join(flat[off:off + c]))
        off += c
    langs = rng.choice(d.lang.value_counts().index.to_numpy(), size=n,
                       p=(d.lang.value_counts() / len(d)).to_numpy())
    n_sources = d.source.nunique() * scale
    out = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "text": texts,
        "lang": langs,
        "source": [f"src{i % n_sources}" for i in range(n)],
    })
    out["n_chars"] = out.text.str.len().astype("int64")
    return out


def gen_star(scale: int, rng: np.random.Generator, out_dir: str) -> None:
    c = pd.read_parquet(f"{SRC}/customer.parquet")
    nc = len(c) * scale
    cust = pd.DataFrame({
        "c_custkey": np.arange(nc, dtype=np.int64),
        "c_name": [f"Customer#{i:09d}" for i in range(nc)],
        "c_nationkey": rng.integers(0, 25, nc).astype("int64"),
        "c_acctbal": np.round(rng.uniform(-999, 9999, nc), 2),
        "c_mktsegment": rng.choice(c.c_mktsegment.unique(), nc),
    })
    cust.to_parquet(f"{out_dir}/customer.parquet", index=False)

    o = pd.read_parquet(f"{SRC}/orders.parquet")
    no = len(o) * scale
    orders = pd.DataFrame({
        "o_orderkey": np.arange(no, dtype=np.int64),
        "o_custkey": rng.integers(0, nc, no).astype("int64"),
        "o_orderstatus": rng.choice(o.o_orderstatus.unique(), no),
        "o_totalprice": np.round(rng.uniform(900, 450000, no), 2),
        "o_orderdate": pd.to_datetime("1995-01-01")
        + pd.to_timedelta(rng.integers(0, 2500, no), unit="D"),
        "o_orderpriority": rng.choice(o.o_orderpriority.unique(), no),
    })
    orders["o_orderdate"] = orders.o_orderdate.astype("datetime64[us]")
    orders.to_parquet(f"{out_dir}/orders.parquet", index=False)

    li = pd.read_parquet(f"{SRC}/lineitem.parquet")
    nl = len(li) * scale
    lineitem = pd.DataFrame({
        "l_orderkey": rng.integers(0, no, nl).astype("int64"),
        "l_partkey": rng.integers(0, li.l_partkey.max() + 1, nl).astype("int64"),
        "l_suppkey": rng.integers(0, li.l_suppkey.max() + 1, nl).astype("int64"),
        "l_linenumber": rng.integers(1, 8, nl).astype("int32"),
        "l_quantity": rng.integers(1, 51, nl).astype("float64"),
        "l_extendedprice": np.round(rng.uniform(900, 105000, nl), 2),
        "l_discount": np.round(rng.uniform(0, 0.1, nl), 2),
        "l_tax": np.round(rng.uniform(0, 0.08, nl), 2),
        "l_returnflag": rng.choice(li.l_returnflag.unique(), nl),
        "l_linestatus": rng.choice(li.l_linestatus.unique(), nl),
        "l_shipdate": (pd.to_datetime("1995-01-01")
                       + pd.to_timedelta(rng.integers(0, 2500, nl), unit="D")),
    })
    lineitem["l_shipdate"] = lineitem.l_shipdate.astype("datetime64[us]")
    lineitem.to_parquet(f"{out_dir}/lineitem.parquet", index=False)

    ev = pd.read_parquet(f"{SRC}/events.parquet")
    ne = len(ev) * scale
    ts = (pd.to_datetime("2024-01-01").value // 1000
          + np.sort(rng.integers(0, 30 * 86400 * 10**6, ne)))
    events = pd.DataFrame({
        "event_id": np.arange(ne, dtype=np.int64),
        "ts": pd.to_datetime(ts, unit="us"),
        "user_id": rng.integers(0, ev.user_id.max() * scale + 1, ne).astype("int64"),
        "event_type": rng.choice(ev.event_type.unique(), ne),
        "value": np.round(rng.uniform(0, 200, ne), 2),
        "props": [f'{{"k": {int(x)}}}' for x in rng.integers(0, 100, ne)],
    })
    events["ts"] = events.ts.astype("datetime64[us]")
    events.to_parquet(f"{out_dir}/events.parquet", index=False)

    emb = pd.read_parquet(f"{SRC}/embeddings.parquet")
    nv = len(emb) * scale
    dim = len(emb.embedding.iloc[0])
    mat = rng.normal(0, 0.12, (nv, dim)).astype("float32")
    embeddings = pd.DataFrame({
        "vec_id": np.arange(nv, dtype=np.int64),
        "embedding": list(mat),
        "label": rng.integers(0, 8, nv).astype("int64"),
    })
    embeddings.to_parquet(f"{out_dir}/embeddings.parquet", index=False)

    for name in ("nation", "region", "part", "supplier"):
        shutil.copy(f"{SRC}/{name}.parquet", f"{out_dir}/{name}.parquet")


def main() -> None:
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = sys.argv[2] if len(sys.argv) > 2 else f"/root/scaledata/sf{scale / 10:g}"
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(20260821)
    gen_documents(scale, rng).to_parquet(f"{out_dir}/documents.parquet", index=False)
    gen_star(scale, rng, out_dir)
    print(f"wrote {out_dir}")


if __name__ == "__main__":
    main()
