#!/usr/bin/env python
"""Capture a jax.profiler trace of the hot kernels — the flamegraph analog
of reference scripts/profile.sh (dtrace/perf over criterion binaries).

Writes an xprof/TensorBoard trace directory; inspect with
``tensorboard --logdir <out>`` or xprof.

Usage: python scripts/profile.py [--out /tmp/innr_tpu_trace] [--n 500000]
"""

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/innr_tpu_trace")
    ap.add_argument("--n", type=int, default=500_000)
    ap.add_argument("--d", type=int, default=128)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from innr_tpu.kernels import knn as kknn, packed_knn as kpacked

    rng = np.random.default_rng(0)
    rows = jnp.asarray(rng.standard_normal((args.n, args.d)).astype(np.float32))
    qs = jnp.asarray(rng.standard_normal((32, args.d)).astype(np.float32))
    words_t = jnp.asarray(
        rng.integers(0, 2**32, (args.d // 32 or 1, args.n), dtype=np.uint32)
    )
    q_words = jnp.asarray(rng.integers(0, 2**32, args.d // 32 or 1, dtype=np.uint32))

    # Compile outside the trace.
    np.asarray(kknn.fused_knn_dot_batch(qs, rows, 10)[0])
    np.asarray(kpacked.fused_binary_knn(q_words, words_t, 10)[0])

    with jax.profiler.trace(args.out):
        for _ in range(3):
            np.asarray(kknn.fused_knn_dot_batch(qs, rows, 10)[0])
            np.asarray(kpacked.fused_binary_knn(q_words, words_t, 10)[0])
    print(f"trace written to {args.out}")


if __name__ == "__main__":
    main()
