#!/usr/bin/env python
"""Mechanized on-chip validation of the pruned scan's DMA-elision claim.

``kernels/pruned_knn.py``'s dynamic variants (``_pruned_raw_dynamic``,
``_threshold_raw_dynamic``) are SILICON-ONLY: ``pltpu.emit_pipeline``
queries the TPU device kind at trace time, so the CPU interpreter can
never execute them (the static-grid twins carry the value semantics in
CI). That leaves their load-bearing behavior — "pruned tiles are never
read from HBM" — without an executing CI check, which the reference never
allows for an ISA path (it runs AVX-512 under Intel SDE emulation,
``.github/workflows/ci.yml:94-115``). This script is the TPU analog: a
single command whose exit code states mechanically whether elision holds
ON THE CHIP.

Method (all measurements same-session so relay bandwidth drift cancels):

1. measure HBM bandwidth (bare jnp.sum over the corpus, repeated) and the
   per-dispatch floor (the same pruned kernel over a tiny corpus);
2. build survivor plans at several elision levels (queries concentrated
   on few clusters -> high elision; threshold forced to keep all tiles ->
   zero elision);
3. for each level, predict ``floor + survivor_bytes / bandwidth`` and
   compare with the measured pruned-scan wall time.

Exit codes:
    0  elision holds: every level within --tol of its prediction
    2  ELISION REGRESSED: some level's time is inconsistent with its
       surviving bytes (e.g. the pipeline silently read dead tiles — the
       failure this script exists to catch)
    3  RELAY NOISE: the bandwidth/floor measurements were too unstable
       this session to adjudicate (re-run; nothing is known to be wrong)

Usage:  python scripts/validate_elision.py --n 10000000
"""

from __future__ import annotations

import argparse
import sys
import time


def _reps(fn, reps=5):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts), max(ts)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10_000_000)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--centers", type=int, default=256)
    ap.add_argument("--tol", type=float, default=0.35,
                    help="relative error allowed between measured and "
                         "predicted pruned-scan time")
    ap.add_argument("--noise", type=float, default=0.5,
                    help="max (max-min)/min spread of the bandwidth "
                         "measurement before the session is declared "
                         "too noisy to adjudicate")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from innr_tpu import prune as _prune
    from innr_tpu.kernels import pruned_knn as kpruned

    if jax.devices()[0].platform == "cpu":
        print("validate_elision: needs real TPU (emit_pipeline is "
              "silicon-only); rc=3", file=sys.stderr)
        return 3

    n, d, k = args.n, args.d, args.k
    tile_n = kpruned.pruned_tile_n(n, d)
    n_tiles = -(-n // tile_n)
    rng = np.random.default_rng(0)

    rows = jax.jit(
        lambda: 3.0 * jax.random.normal(
            jax.random.PRNGKey(0), (args.centers, d), dtype=jnp.float32
        )[jnp.sort(jax.random.randint(
            jax.random.PRNGKey(1), (n,), 0, args.centers))]
        + 0.05 * jax.random.normal(
            jax.random.PRNGKey(2), (n, d), dtype=jnp.float32
        )
    )()
    jax.block_until_ready(rows)
    corpus_bytes = n * d * 4

    # -- same-session bandwidth + stability check -------------------------
    @jax.jit
    def _read(r):
        return jnp.sum(r)

    t_read, t_read_max = _reps(lambda: np.asarray(_read(rows)))
    spread = (t_read_max - t_read) / t_read
    # The fetch/launch round trip rides inside BOTH the read and the scan
    # measurements; estimate it with a floor probe so the BANDWIDTH part
    # of the read is separable.
    tiny = jnp.zeros((256, d), jnp.float32)
    t_floor, t_floor_max = _reps(lambda: np.asarray(_read(tiny)))
    bw = corpus_bytes / max(t_read - t_floor, 1e-9)
    print(f"# session: read {t_read * 1e3:.1f} ms (spread {spread:.0%}), "
          f"floor {t_floor * 1e3:.1f} ms, bw {bw / 1e9:.0f} GB/s, "
          f"tile_n {tile_n} ({n_tiles} tiles)", file=sys.stderr)
    if spread > args.noise or t_floor_max - t_floor > 0.5 * t_read:
        print(f"RELAY NOISE: read spread {spread:.0%} / floor spread "
              f"{(t_floor_max - t_floor) * 1e3:.1f} ms too large to "
              "adjudicate; rc=3")
        return 3

    summ = _prune.build_tile_summary(rows, tile_n)
    cent = np.asarray(
        jax.jit(lambda r: r, )(summ.centroids)
    )

    # -- elision levels ----------------------------------------------------
    # Queries near ONE cluster centroid -> few survivor tiles; queries
    # spread over many centroids -> more survivors; the all-tiles row uses
    # order = identity, n_surv = n_tiles (what the scan does when nothing
    # prunes) — measured through the SAME dynamic kernel.
    levels = []
    for n_cent, label in ((1, "1-cluster"), (8, "8-cluster"),
                          (64, "64-cluster")):
        qs = jnp.asarray(
            cent[np.arange(32) % n_cent]
            + 0.02 * rng.standard_normal((32, d)).astype(np.float32)
        )
        order, n_surv = _prune.plan_survivors(
            qs, summ.centroids, summ.radii, summ.counts, k, "dot"
        )
        levels.append((label, qs, order, int(n_surv)))
    qs_all = levels[-1][1]
    order_all = jnp.arange(n_tiles, dtype=jnp.int32)
    levels.append(("no-elision", qs_all, order_all, n_tiles))

    failures = []
    for label, qs, order, n_surv in levels:
        n_surv_arr = jnp.asarray(n_surv, jnp.int32)

        def scan(qs=qs, order=order, n_surv_arr=n_surv_arr):
            keys, _ = kpruned._pruned_raw_dynamic(
                qs, rows, None, order, n_surv_arr, k, "dot", tile_n
            )
            return np.asarray(keys[:, 0])

        t_scan, _ = _reps(scan)
        surv_bytes = min(n_surv, n_tiles) * tile_n * d * 4
        t_pred = t_floor + surv_bytes / bw
        err = (t_scan - t_pred) / t_pred
        ok = abs(err) <= args.tol
        print(f"# {label}: surv {n_surv}/{n_tiles} "
              f"({surv_bytes / 1e9:.2f} GB) measured {t_scan * 1e3:.1f} ms "
              f"predicted {t_pred * 1e3:.1f} ms err {err:+.0%} "
              f"{'OK' if ok else 'FAIL'}", file=sys.stderr)
        if not ok:
            failures.append((label, err))

    if failures:
        print(f"ELISION REGRESSED: {failures}; rc=2")
        return 2
    print(f"elision holds: every level within {args.tol:.0%} of "
          f"survivor-bytes/bandwidth; rc=0")
    return 0


if __name__ == "__main__":
    sys.exit(main())
