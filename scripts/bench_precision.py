#!/usr/bin/env python
"""Score-matmul precision A/B for the fused kNN scan (real chip).

The f32 score matmul runs as bf16 passes on the MXU: DEFAULT=1 pass,
HIGH=3 passes (~f32-faithful), HIGHEST=6 passes (exact f32). The scan is
supposed to be HBM-bound, so extra passes should be free — this measures
whether they actually are on this chip, against a same-session read.
Selection parity vs the HIGHEST path is reported for each level (ties and
near-ties can flip under coarser scores; distance *values* get re-scored
exactly in serving pipelines, so index parity is the number that matters).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from innr_tpu import config
from innr_tpu.kernels import knn as kknn


def _best(fn, reps=4):
    fn()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    n, d, queries, k = 10_000_000, 128, 32, 10
    rng = np.random.default_rng(0)
    host = np.empty((n, d), dtype=np.float32)
    for i in range(0, n, 1_000_000):
        host[i : i + 1_000_000] = rng.standard_normal(
            (min(1_000_000, n - i), d), dtype=np.float32
        )
    rows = jnp.asarray(host)
    del host
    qs = jnp.asarray(rng.standard_normal((queries, d)).astype(np.float32))

    @jax.jit
    def read(r):
        return jnp.sum(r)

    t_read = _best(lambda: np.asarray(read(rows)))
    gb = n * d * 4 / 1e9
    print(f"corpus {n} x {d} ({gb:.2f} GB); read {t_read*1e3:.1f} ms "
          f"({gb/t_read:.1f} GB/s)")

    results = {}
    for level in ("highest", "default"):
        config.set_matmul_precision(level)
        kknn._fused_knn_raw.clear_cache()
        t = _best(lambda: np.asarray(kknn.fused_knn_dot_batch(qs, rows, k)[0]))
        idx = np.asarray(kknn.fused_knn_dot_batch(qs, rows, k)[1])
        results[level] = (t, idx)
        print(f"  precision={level:8s}: {t*1e3:8.1f} ms  "
              f"roofline={t_read/t:5.2f}  ({queries*n/t/1e9:6.2f} G evals/s)")
    config.set_matmul_precision("highest")
    kknn._fused_knn_raw.clear_cache()

    base = results["highest"][1]
    for level, (_, idx) in results.items():
        agree = float((idx == base).mean())
        print(f"  index parity vs highest [{level}]: {agree:.4f}")


if __name__ == "__main__":
    main()
