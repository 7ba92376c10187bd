#!/usr/bin/env python
"""Compare kernel paths against each other and save/diff baselines — the
analog of reference scripts/bench-compare.sh (criterion baselines across
-C target-cpu levels). Here the "levels" are execution paths:

  pallas   — fused streaming kernels
  mxu      — XLA matmul + total-order top-k
  reference— forced jnp oracle path

Usage:
  python scripts/bench_compare.py --save baseline.json
  python scripts/bench_compare.py --compare baseline.json
"""

import argparse
import json
import time

import numpy as np


def timed(fn, reps=3):
    fn()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def run_matrix(n=200_000, d=128, k=10, queries=16):
    import jax.numpy as jnp

    import innr_tpu as it
    from innr_tpu import config
    from innr_tpu.kernels import knn as kknn

    rng = np.random.default_rng(0)
    rows = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    qs = jnp.asarray(rng.standard_normal((queries, d)).astype(np.float32))
    vb = it.VerticalBatch(rows)

    results = {}
    results["pallas_fused_dot"] = timed(
        lambda: np.asarray(kknn.fused_knn_dot_batch(qs, rows, k)[0])
    )
    results["mxu_dot"] = timed(
        lambda: np.asarray(
            jnp.matmul(qs, rows.T, preferred_element_type=jnp.float32)
        )[:1]
    )
    config.force_reference(True)
    try:
        results["reference_knn"] = timed(
            lambda: it.batch_knn_dot(np.asarray(qs[0]), vb, k)
        )
    finally:
        config.force_reference(False)
    return {name: {"seconds": s, "evals_per_s": n * queries / s if "dot" in name else n / s}
            for name, s in results.items()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--save", metavar="FILE")
    ap.add_argument("--compare", metavar="FILE")
    ap.add_argument("--n", type=int, default=200_000)
    args = ap.parse_args()

    current = run_matrix(n=args.n)
    for name, r in current.items():
        print(f"{name:24s} {r['seconds']*1e3:9.2f} ms")

    if args.save:
        with open(args.save, "w") as f:
            json.dump(current, f, indent=2)
        print(f"saved -> {args.save}")
    if args.compare:
        with open(args.compare) as f:
            base = json.load(f)
        for name, r in current.items():
            if name in base:
                ratio = base[name]["seconds"] / r["seconds"]
                flag = "FASTER" if ratio > 1.05 else ("SLOWER" if ratio < 0.95 else "same")
                print(f"{name:24s} {ratio:5.2f}x vs baseline  [{flag}]")


if __name__ == "__main__":
    main()
