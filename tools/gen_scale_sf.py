"""Generate a larger-SF measurement dataset by structure-preserving
replication of the driver's sf0.1 synthetics (VERDICT r14 task 3).

At sf0.1 every 8-vs-32-core ratio sits at ~1 (BENCH_r14_c8: all queries
are scheduler/fixed-overhead-bound), so the repo had no *measured*
parallelism evidence for its 100 TB arguments. The driver testdata is
read-only and tops out at sf0.1; this tool builds a K-times replica
(default 10x, "sf1-equivalent") OUTSIDE /root/testdata purely as a
scaling-measurement input — never an oracle or bench input.

Replication is structure-preserving so the WORKLOAD scales linearly by
construction rather than degenerating:

- TPC-H-ish tables: replica i offsets every key column by i * (its
  table's row-id space), so joins keep exactly K times the matches and
  group-bys keep K times the groups of the original relationships.
- documents: every whitespace token in replica i > 0 gets a "~i"
  suffix. Within a replica all shingle/token identities are preserved
  verbatim (same dedup structure, same duplicate spans); across
  replicas the token spaces are disjoint, so no spurious cross-replica
  near-duplicates inflate pair counts quadratically. n_chars is
  recomputed to stay consistent with the rewritten text.
- embeddings: replica i > 0 applies a seeded random permutation + sign
  flip of the 64 dims — an orthogonal transform, so every
  WITHIN-replica inner product (hence every cosine, every near-dup
  pair) is preserved exactly, while cross-replica cosines scatter like
  random vectors and stay below the operators' thresholds.
- region/nation: fixed dimensions, copied once (their keys are the
  shared nation/region universe both replicas reference).

Deterministic: numpy seeded per (table, replica). Usage:

    python tools/gen_scale_sf.py --src /root/testdata/sf0.1 \
        --out /root/scale10 --k 10
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

OFFSET_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
# the id space each key column offsets by (key -> table whose row-id
# space it references)
KEY_SPACE = {
    "c_custkey": "customer",
    "s_suppkey": "supplier",
    "p_partkey": "part",
    "o_orderkey": "orders",
    "o_custkey": "customer",
    "l_orderkey": "orders",
    "l_partkey": "part",
    "l_suppkey": "supplier",
    "event_id": "events",
    "user_id": "events",  # user ids live inside the events id space
    "doc_id": "documents",
    "vec_id": "embeddings",
}
COPY_ONCE = ("region", "nation")


def _spaces(src: str) -> dict[str, int]:
    spaces: dict[str, int] = {}
    for t in set(KEY_SPACE.values()):
        tbl = pq.read_table(os.path.join(src, f"{t}.parquet"))
        hi = 0
        for col in OFFSET_COLS.get(t, []):
            if KEY_SPACE[col] == t and col in tbl.column_names:
                hi = max(hi, pc.max(tbl[col]).as_py() or 0)
        spaces[t] = int(hi) + 1
    return spaces


def _replicate_documents(tbl: pa.Table, i: int) -> pa.Table:
    if i == 0:
        return tbl
    texts = tbl["text"].to_pylist()
    out = [" ".join(f"{w}~{i}" for w in t.split(" ")) if t else t for t in texts]
    tbl = tbl.set_column(
        tbl.schema.get_field_index("text"), "text", pa.array(out, pa.string())
    )
    n_chars = pa.array([len(t) if t is not None else None for t in out], pa.int64())
    return tbl.set_column(tbl.schema.get_field_index("n_chars"), "n_chars", n_chars)


def _replicate_embeddings(tbl: pa.Table, i: int) -> pa.Table:
    if i == 0:
        return tbl
    vecs = np.asarray(tbl["embedding"].to_pylist(), dtype=np.float32)
    rng = np.random.default_rng(1_000_003 * i + 42)
    perm = rng.permutation(vecs.shape[1])
    sign = rng.choice([-1.0, 1.0], size=vecs.shape[1]).astype(np.float32)
    out = vecs[:, perm] * sign  # orthogonal: within-replica cosines exact
    arr = pa.array(list(out), pa.list_(pa.float32()))
    return tbl.set_column(
        tbl.schema.get_field_index("embedding"), "embedding", arr
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", required=True)
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    spaces = _spaces(args.src)
    print("id spaces:", spaces)

    for t in COPY_ONCE:
        tbl = pq.read_table(os.path.join(args.src, f"{t}.parquet"))
        pq.write_table(tbl, os.path.join(args.out, f"{t}.parquet"))
        print(t, "copied once:", tbl.num_rows)

    for t, cols in OFFSET_COLS.items():
        base = pq.read_table(os.path.join(args.src, f"{t}.parquet"))
        reps = []
        for i in range(args.k):
            r = base
            if t == "documents":
                r = _replicate_documents(r, i)
            if t == "embeddings":
                r = _replicate_embeddings(r, i)
            for col in cols:
                off = i * spaces[KEY_SPACE[col]]
                if off:
                    idx = r.schema.get_field_index(col)
                    r = r.set_column(
                        idx, col, pc.add(r[col], pa.scalar(off, r[col].type))
                    )
            reps.append(r)
        out = pa.concat_tables(reps)
        pq.write_table(out, os.path.join(args.out, f"{t}.parquet"))
        print(t, f"x{args.k}:", out.num_rows, "rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
