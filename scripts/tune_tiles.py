#!/usr/bin/env python
"""Tile-size sweep for the fused streaming kNN kernels on real hardware.

The corpus-tile height is the one free parameter of the streaming
score+top-k kernels (kernels/knn.py::_pick_tile_n and
kernels/packed_knn.py::_pick_tile_n). This sweep times each candidate
against a same-session same-bytes ``jnp.sum`` read (the roofline) so the
chosen defaults are measured, not guessed. Run on the TPU:

    python scripts/tune_tiles.py [--n 10000000] [--d 128]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def _best(fn, reps=4):
    fn()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def sweep_f32(n, d, queries=32, k=10):
    from innr_tpu.kernels import knn as kknn

    rng = np.random.default_rng(0)
    host = np.empty((n, d), dtype=np.float32)
    step = 1_000_000
    for i in range(0, n, step):
        host[i : i + step] = rng.standard_normal(
            (min(step, n - i), d), dtype=np.float32
        )
    rows = jnp.asarray(host)
    del host
    qs = jnp.asarray(rng.standard_normal((queries, d)).astype(np.float32))

    @jax.jit
    def read(r):
        return jnp.sum(r)

    t_read = _best(lambda: np.asarray(read(rows)))
    gb = n * d * 4 / 1e9
    print(f"f32 corpus {n} x {d} ({gb:.2f} GB); read {t_read*1e3:.1f} ms "
          f"({gb/t_read:.1f} GB/s)")
    orig = kknn._pick_tile_n
    try:
        for tile in (2048, 4096, 8192, 16384, 32768):
            kknn._pick_tile_n = lambda n_, d_, _t=tile: _t
            kknn._fused_knn_raw.clear_cache()
            t = _best(lambda: np.asarray(kknn.fused_knn_dot_batch(qs, rows, k)[0]))
            print(f"  tile_n={tile:6d}: {t*1e3:8.1f} ms  roofline={t_read/t:5.2f}  "
                  f"({queries*n/t/1e9:6.2f} G evals/s)")
    finally:
        kknn._pick_tile_n = orig
        kknn._fused_knn_raw.clear_cache()


def sweep_packed(n, words=24):
    from innr_tpu.kernels import packed_knn as kp

    rng = np.random.default_rng(0)
    words_t = jnp.asarray(rng.integers(0, 2**32, (words, n), dtype=np.uint32))
    q = jnp.asarray(rng.integers(0, 2**32, words, dtype=np.uint32))
    qb = jnp.asarray(rng.integers(0, 2**32, (32, words), dtype=np.uint32))

    @jax.jit
    def read(w):
        return jnp.sum(jax.lax.population_count(w).astype(jnp.int32))

    t_read = _best(lambda: np.asarray(read(words_t)))
    gb = n * words * 4 / 1e9
    print(f"packed corpus {words} x {n} u32 ({gb:.2f} GB); read "
          f"{t_read*1e3:.1f} ms ({gb/t_read:.1f} GB/s)")
    orig, orig_mq = kp._pick_tile_n, kp._pick_tile_n_mq
    try:
        for tile in (1024, 2048, 4096, 8192, 16384):
            kp._pick_tile_n = lambda n_, w_, _t=tile: _t
            # mq tiles: scale down by the budgeted per-lane blowup so the
            # sweep stays inside scoped VMEM (Q=32 -> /16 of the 1q tile).
            kp._pick_tile_n_mq = lambda n_, w_, q_, _t=tile: max(_t // 16, 256)
            kp.fused_binary_knn.clear_cache()
            kp.fused_binary_knn_batch.clear_cache()
            try:
                t1 = _best(lambda: np.asarray(kp.fused_binary_knn(q, words_t, 40)[0]))
                t32 = _best(
                    lambda: np.asarray(kp.fused_binary_knn_batch(qb, words_t, 40)[0])
                )
            except Exception as e:  # VMEM OOM etc: report and continue
                print(f"  tile_n={tile:6d}: FAILED ({type(e).__name__})")
                continue
            print(f"  tile_n={tile:6d}: 1q {t1*1e3:8.1f} ms (roofline "
                  f"{t_read/t1:5.2f})   32q(tile/16) {t32*1e3:8.1f} ms (roofline "
                  f"{t_read/t32:5.2f})")
    finally:
        kp._pick_tile_n, kp._pick_tile_n_mq = orig, orig_mq
        kp.fused_binary_knn.clear_cache()
        kp.fused_binary_knn_batch.clear_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10_000_000)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--packed-n", type=int, default=4_000_000)
    ap.add_argument("--skip-f32", action="store_true")
    ap.add_argument("--skip-packed", action="store_true")
    args = ap.parse_args()
    if not args.skip_f32:
        sweep_f32(args.n, args.d)
    if not args.skip_packed:
        sweep_packed(args.packed_n)


if __name__ == "__main__":
    main()
