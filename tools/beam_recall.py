#!/usr/bin/env python3
"""Recall@k of an ANN dump vs the brute-force truth dump.

Usage: beam_recall.py <truth_query_dir> <ann_query_dir>

Both dirs are Verify outputs (parquet with query_id, neighbor_id).
Dev-time measurement tooling for SCALING.md frontier rows only.
"""
import sys, glob
from collections import defaultdict
import pyarrow.parquet as pq


def pairs(d):
    t = pq.read_table(glob.glob(d + "/*.parquet"))
    m = defaultdict(set)
    for q, n in zip(t.column("query_id").to_pylist(),
                    t.column("neighbor_id").to_pylist()):
        m[q].add(n)
    return m


truth = pairs(sys.argv[1])
got = pairs(sys.argv[2])
rec = [len(got.get(q, set()) & s) / len(s) for q, s in sorted(truth.items())]
print(f"queries={len(rec)} mean_recall={sum(rec)/len(rec):.4f} "
      f"min={min(rec):.2f} frac_perfect={sum(1 for r in rec if r == 1.0)/len(rec):.2f}")
