#!/usr/bin/env python3
"""Measure the GEMM numeric margins PARITY.md #16 relies on (VERDICT r3
item 6 — a runnable check instead of a docstring claim).

`llm_sim.block_pairs_gemm` computes block-local all-pairs dots with numpy
GEMMs (SIMD fold order) while the DuckDB twin folds sequentially. That is
only sound if the fold-order error is orders of magnitude smaller than:

1. margin_tau — the closest any within-block pair's dot sits to the
   SIM_PAIRS_TAU threshold (either side): a reorder can only flip pair
   MEMBERSHIP if it crosses this gap;
2. margin_4dp — the closest any kept pair's dot sits to a 4-decimal
   rounding half-boundary: a reorder can only change a ROUNDED OUTPUT if it
   crosses this gap;
3. reorder_err — the actually-observed |GEMM dot − sequential-fold dot|.

Exit status is non-zero if either margin is within 1000× of the reorder
error — the signal to re-measure after any fixture or tau change (this
script IS the re-measurement; run it and update PARITY.md #16's numbers).

Run: python3 scripts/check_gemm_margin.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow.parquet as pq

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

SAFETY_FACTOR = 1000.0


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"
    )
    from rvi_big_data_api_spark.operators.llm_sim import SIM_PAIRS_TAU

    tbl = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    labels = tbl.column("label").to_numpy(zero_copy_only=False)
    embs = np.stack(
        [np.asarray(v, dtype=np.float64) for v in tbl.column("embedding").to_pylist()]
    )

    margin_tau = np.inf
    margin_4dp = np.inf
    reorder_err = 0.0
    n_pairs = n_kept = 0
    for lab in np.unique(labels):
        M = embs[labels == lab]
        if len(M) < 2:
            continue
        G = M @ M.T  # the GEMM (SIMD) fold
        iu, ju = np.triu_indices(len(M), k=1)
        dots = G[iu, ju]
        n_pairs += len(dots)
        margin_tau = min(margin_tau, float(np.abs(dots - SIM_PAIRS_TAU).min()))
        kept = dots[dots >= SIM_PAIRS_TAU]
        n_kept += len(kept)
        if len(kept):
            # distance to the nearest 4-dp half-boundary (where round() flips)
            frac = np.abs(kept) * 1e4 + 0.5
            margin_4dp = min(
                margin_4dp, float((np.abs(frac - np.round(frac)) / 1e4).min())
            )
            # sequential left fold, same order as Spark's F.aggregate /
            # DuckDB's list_dot_product
            for i, j in zip(iu[dots >= SIM_PAIRS_TAU], ju[dots >= SIM_PAIRS_TAU]):
                seq = 0.0
                for x, y in zip(M[i], M[j]):
                    seq += x * y
                reorder_err = max(reorder_err, abs(seq - G[i, j]))

    print(f"sf_dir         : {sf_dir}")
    print(f"tau            : {SIM_PAIRS_TAU}")
    print(f"pairs examined : {n_pairs} ({n_kept} kept)")
    print(f"margin_tau     : {margin_tau:.3e}")
    print(f"margin_4dp     : {margin_4dp:.3e}")
    print(f"reorder_err    : {reorder_err:.3e}")
    ok = (
        margin_tau > SAFETY_FACTOR * reorder_err
        and margin_4dp > SAFETY_FACTOR * reorder_err
    )
    print(f"verdict        : {'OK' if ok else 'MARGIN TOO THIN — update PARITY.md #16'}"
          f" (require both margins > {SAFETY_FACTOR:.0f}x reorder_err)")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
