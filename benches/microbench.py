#!/usr/bin/env python
"""Per-op microbenchmark suite — the criterion analog (reference benches/).

Covers the reference's bench families (dense dot/cosine/norm/l2/l1,
hamming, dot_u8, mixed dot, binary, topk, batch, ternary, maxsim, sparse,
fast_math, f64, slot) at the reference's dimension grid, in the shapes that
make sense on TPU: per-op latency is measured on a *batched* call and
divided by the batch, since single-element dispatch measures the runtime,
not the kernel (see PERF.md).

Usage: python benches/microbench.py [--dims 16,64,128,768,1536] [--rows 8192]
Prints one line per (op, dim): ns/eval and Gelem/s.
"""

import argparse
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dims", default="16,64,128,256,512,768,1024,1536")
    ap.add_argument("--rows", type=int, default=8192)
    args = ap.parse_args()
    dims = [int(x) for x in args.dims.split(",")]
    n = args.rows

    import jax
    import jax.numpy as jnp

    import innr_tpu as it

    rng = np.random.default_rng(0)
    print(f"{'op':24s} {'dim':>6} {'ns/eval':>10} {'Gelem/s':>9}")

    @jax.jit
    def batch_dot(q, rows):
        return jnp.matmul(rows, q, preferred_element_type=jnp.float32)

    @jax.jit
    def batch_cos(q, rows):
        d = jnp.matmul(rows, q, preferred_element_type=jnp.float32)
        qn = jnp.sqrt(jnp.sum(q * q))
        rn = jnp.sqrt(jnp.sum(rows * rows, axis=1))
        return d / (qn * rn)

    @jax.jit
    def batch_l2(q, rows):
        d = rows - q[None, :]
        return jnp.sum(d * d, axis=1)

    @jax.jit
    def batch_l1(q, rows):
        return jnp.sum(jnp.abs(rows - q[None, :]), axis=1)

    @jax.jit
    def batch_norm(rows):
        return jnp.sqrt(jnp.sum(rows * rows, axis=1))

    @jax.jit
    def batch_fast_cos(q, rows):
        ab = jnp.matmul(rows, q, preferred_element_type=jnp.float32)
        aa = jnp.sum(q * q)
        bb = jnp.sum(rows * rows, axis=1)
        return ab * jax.lax.rsqrt(aa) * jax.lax.rsqrt(bb)

    for d in dims:
        rows = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
        q = jnp.asarray(rng.standard_normal(d).astype(np.float32))
        for name, fn in [
            ("dot", lambda: np.asarray(batch_dot(q, rows))[:1]),
            ("cosine", lambda: np.asarray(batch_cos(q, rows))[:1]),
            ("fast_cosine", lambda: np.asarray(batch_fast_cos(q, rows))[:1]),
            ("norm", lambda: np.asarray(batch_norm(rows))[:1]),
            ("l2_distance_sq", lambda: np.asarray(batch_l2(q, rows))[:1]),
            ("l1_distance", lambda: np.asarray(batch_l1(q, rows))[:1]),
        ]:
            t = timed(fn)
            per = t / n
            print(f"{name:24s} {d:>6} {per*1e9:>10.2f} {d/per/1e9:>9.2f}")

        # u8 / hamming families at byte widths derived from d
        codes = jnp.asarray(rng.integers(0, 256, (n, d), dtype=np.uint8))
        qq = jnp.asarray(rng.integers(0, 256, d, dtype=np.uint8))
        t = timed(lambda: np.asarray(it.batch_dot_u8(qq, codes))[:1])
        print(f"{'dot_u8':24s} {d:>6} {t/n*1e9:>10.2f} {d/(t/n)/1e9:>9.2f}")

        w = max(d // 32, 1)
        words = jnp.asarray(rng.integers(0, 2**32, (n, w), dtype=np.uint32))
        qw = jnp.asarray(rng.integers(0, 2**32, w, dtype=np.uint32))
        t = timed(lambda: np.asarray(it.batch_binary_hamming(qw, words))[:1])
        print(f"{'hamming(bits)':24s} {d:>6} {t/n*1e9:>10.2f} {d/(t/n)/1e9:>9.2f}")

    # slot hamming u32 at the standard sketch width
    s = jnp.asarray(rng.integers(0, 2**31, (n, 128), dtype=np.uint32))
    qs = jnp.asarray(rng.integers(0, 2**31, 128, dtype=np.uint32))
    t = timed(lambda: np.asarray(it.batch_slot_hamming_u32(qs, s))[:1])
    print(f"{'slot_hamming_u32':24s} {128:>6} {t/n*1e9:>10.2f} {128/(t/n)/1e9:>9.2f}")

    # maxsim 32x128 @ d=128
    Q = jnp.asarray(rng.standard_normal((1, 32, 128)).astype(np.float32))
    D = jnp.asarray(rng.standard_normal((256, 128, 128)).astype(np.float32))
    t = timed(lambda: np.asarray(it.batch_maxsim(Q, D)))
    print(f"{'maxsim(32x128,d=128)':24s} {128:>6} {t/256*1e9:>10.2f} {'':>9}")

    # fused streaming kNN at the serving shape (32 queries, k=10)
    from innr_tpu.kernels import knn as kknn, packed_knn as kpacked

    big = jnp.asarray(rng.standard_normal((max(n * 16, 131072), 128)).astype(np.float32))
    qs32 = jnp.asarray(rng.standard_normal((32, 128)).astype(np.float32))
    nn = int(big.shape[0])
    t = timed(lambda: np.asarray(kknn.fused_knn_dot_batch(qs32, big, 10)[0]))
    per = t / (nn * 32)
    print(f"{'fused_knn_dot(32q)':24s} {128:>6} {per*1e9:>10.2f} {128/per/1e9:>9.2f}")

    wt = jnp.asarray(rng.integers(0, 2**32, (24, nn), dtype=np.uint32))
    qw1 = jnp.asarray(rng.integers(0, 2**32, 24, dtype=np.uint32))
    t = timed(lambda: np.asarray(kpacked.fused_binary_knn(qw1, wt, 10)[0]))
    print(f"{'fused_binary_knn':24s} {768:>6} {t/nn*1e9:>10.2f} {768/(t/nn)/1e9:>9.2f}")

    # fused slot-sketch retrieval (single + 16-query) at the sketch width
    from innr_tpu.kernels import slot_knn as kslot

    st = jnp.asarray(rng.integers(0, 2**31, (128, nn), dtype=np.uint32))
    qs1 = jnp.asarray(rng.integers(0, 2**31, 128, dtype=np.uint32))
    qs16 = jnp.asarray(rng.integers(0, 2**31, (16, 128), dtype=np.uint32))
    t = timed(lambda: np.asarray(kslot.fused_slot_knn(qs1, st, 10)[0]))
    print(f"{'fused_slot_knn':24s} {128:>6} {t/nn*1e9:>10.2f} {128/(t/nn)/1e9:>9.2f}")
    t = timed(lambda: np.asarray(kslot.fused_slot_knn_batch(qs16, st, 10)[0]))
    per = t / (nn * 16)
    print(f"{'fused_slot_knn(16q)':24s} {128:>6} {per*1e9:>10.2f} {128/per/1e9:>9.2f}")

    # sparse retrieval at a SPLADE-ish shape (32 nnz docs, 64 nnz query)
    n_docs = max(n, 4096)
    d_idx = np.sort(
        rng.integers(0, 30000, (n_docs, 32), dtype=np.uint32), axis=1
    )
    d_val = rng.standard_normal((n_docs, 32)).astype(np.float32)
    corpus = it.SparseCorpus((d_idx, d_val))
    q_idx = np.sort(rng.choice(30000, 64, replace=False)).astype(np.uint32)
    q_val = rng.standard_normal(64).astype(np.float32)
    t = timed(lambda: np.asarray(it.sparse_knn((q_idx, q_val), corpus, 10)[0]))
    print(f"{'sparse_knn(32nnz)':24s} {'-':>6} {t/n_docs*1e9:>10.2f} {'':>9}")


if __name__ == "__main__":
    main()
