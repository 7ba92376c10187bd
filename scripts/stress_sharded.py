#!/usr/bin/env python
"""10M-row sharded-corpus stress run on the virtual CPU mesh.

Validates the BASELINE.json scale point end-to-end through the
distribution layer: a 10M x 128d corpus streamed per-shard from a disk
memmap (no full host materialization) onto an 8-virtual-device mesh,
multi-query distributed kNN, result checked against a sampled brute
force. Run:

    python scripts/stress_sharded.py [--n 10000000]
"""

from __future__ import annotations

import argparse
import os
import tempfile
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10_000_000)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--devices", type=int, default=8)
    args = ap.parse_args()

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.devices}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from innr_tpu.parallel import ShardedCorpus, default_mesh

    n, d = args.n, args.d
    rng = np.random.default_rng(0)
    path = os.path.join(tempfile.mkdtemp(), "corpus.f32")
    mm = np.memmap(path, dtype=np.float32, mode="w+", shape=(n, d))
    step = 1_000_000
    t0 = time.perf_counter()
    for i in range(0, n, step):
        mm[i : i + step] = rng.standard_normal(
            (min(step, n - i), d), dtype=np.float32
        )
    mm.flush()
    print(f"wrote {n} x {d} corpus ({n * d * 4 / 2**30:.2f} GiB) "
          f"in {time.perf_counter() - t0:.1f}s")

    mesh = default_mesh()
    print(f"mesh: {mesh.devices.size} devices on {jax.default_backend()}")
    src = np.memmap(path, dtype=np.float32, mode="r", shape=(n, d))
    t0 = time.perf_counter()
    corpus = ShardedCorpus.from_row_source(
        lambda a, b: src[a:b], n, d, mesh=mesh
    )
    jax.block_until_ready(corpus.rows)
    print(f"sharded load (streamed per shard): {time.perf_counter() - t0:.1f}s")

    qs = rng.standard_normal((8, d)).astype(np.float32)
    t0 = time.perf_counter()
    vals, idx = corpus.knn_dot(qs, 10)
    vals, idx = np.asarray(vals), np.asarray(idx)
    dt = time.perf_counter() - t0
    print(f"distributed 8-query kNN over {n} rows: {dt:.2f}s "
          f"({8 * n / dt / 1e6:.0f} M evals/s on CPU mesh)")

    # Verify query 0 against a chunked brute force over the memmap.
    best = np.full(10, -np.inf)
    best_i = np.zeros(10, np.int64)
    for i in range(0, n, step):
        dots = src[i : i + step].astype(np.float64) @ qs[0]
        j = np.argsort(-dots, kind="stable")[:10]
        cand_v = np.concatenate([best, dots[j]])
        cand_i = np.concatenate([best_i, i + j])
        order = np.argsort(-cand_v, kind="stable")[:10]
        best, best_i = cand_v[order], cand_i[order]
    assert list(idx[0]) == list(best_i), (idx[0], best_i)
    print("OK: distributed top-10 equals memmap brute force")

    # 2-D grid: devices/2 corpus shards x 2 query groups (rows replicate
    # across the query axis, so run at n/2 to keep the same footprint).
    if args.devices < 4:
        print("skipping 2-D grid (needs >= 4 devices)")
        os.unlink(path)
        return
    from innr_tpu.parallel import GridIndex, grid_mesh

    n_grid = n // 2
    t0 = time.perf_counter()
    grid = GridIndex(src[:n_grid], grid_mesh(args.devices // 2, 2))
    gvals, gidx = grid.knn_dot(qs, 10)
    gvals, gidx = np.asarray(gvals), np.asarray(gidx)
    print(f"2-D grid (4 shards x 2 query groups) over {n_grid} rows: "
          f"{time.perf_counter() - t0:.1f}s")
    gbest = np.full(10, -np.inf)
    gbest_i = np.zeros(10, np.int64)
    for i in range(0, n_grid, step):
        dots = src[i : i + step].astype(np.float64) @ qs[0]
        j = np.argsort(-dots, kind="stable")[:10]
        cand_v = np.concatenate([gbest, dots[j]])
        cand_i = np.concatenate([gbest_i, i + j])
        order = np.argsort(-cand_v, kind="stable")[:10]
        gbest, gbest_i = cand_v[order], cand_i[order]
    assert list(gidx[0]) == list(gbest_i), (gidx[0], gbest_i)
    print("OK: grid top-10 equals brute force")
    os.unlink(path)


if __name__ == "__main__":
    main()
