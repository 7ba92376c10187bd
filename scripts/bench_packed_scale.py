"""Floor-amortized packed-kernel benchmarks (>= 1.4 GB working sets).

The axon relay pays a ~24 ms fixed floor per dispatch (PERF.md round-5),
so the 1M-row pinned configs are floor-dominated and cannot distinguish
kernel quality. This script measures the packed kNN kernels at working
sets large enough that the floor is amortized:

- binary single-query + 16-query at 30M x 768 bits (2.88 GB)
- ternary single-query + 16-query at 15M x 768d (2 x 1.44 GB planes)
- u8 asymmetric 32-query at 4M x 768d (3.1 GB)

Each prints time and roofline vs a same-bytes bare HBM read in the same
session. Source for the `*_scale` pins in benches/medians.json.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

import innr_tpu.kernels.knn as kknn
import innr_tpu.kernels.packed_knn as kpacked


def _time_best(fn, reps=4):
    fn()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> int:
    w, n_q, k = 24, 16, 10
    read = jax.jit(lambda x: jnp.sum(x.astype(jnp.int32)))
    gen = jax.jit(
        lambda key: jax.random.randint(
            key, (w, 5_000_000), 0, 1 << 30, jnp.int32
        ).astype(jnp.uint32)
    )

    # --- binary: 30M x 768 bits ---
    words_t = jnp.concatenate(
        [gen(jax.random.PRNGKey(i)) for i in range(6)], axis=1
    )
    qs = jnp.transpose(words_t[:, :n_q])
    t_read = _time_best(lambda: np.asarray(read(words_t)))
    t1 = _time_best(
        lambda: np.asarray(kpacked.fused_binary_knn(words_t[:, 0], words_t, k)[0])
    )
    tm = _time_best(
        lambda: np.asarray(kpacked.fused_binary_knn_batch(qs, words_t, k)[0])
    )
    print(f"# binary_1q_30M_roofline: {t_read / t1:.3f} ({t1 * 1e3:.1f} ms)")
    print(f"# binary_mq16_30M_roofline: {t_read / tm:.3f} ({tm * 1e3:.1f} ms)")
    del words_t, qs

    # --- ternary: 15M x 768d ---
    pos_t = jnp.concatenate(
        [gen(jax.random.PRNGKey(10 + i)) for i in range(3)], axis=1
    )
    neg_t = jnp.concatenate(
        [gen(jax.random.PRNGKey(20 + i)) for i in range(3)], axis=1
    )
    neg_t = neg_t & ~pos_t
    qp = jnp.transpose(pos_t[:, :n_q])
    qn = jnp.transpose(neg_t[:, :n_q])
    read2 = jax.jit(
        lambda a, b: jnp.sum(a.astype(jnp.int32)) + jnp.sum(b.astype(jnp.int32))
    )
    t_read = _time_best(lambda: np.asarray(read2(pos_t, neg_t)))
    t1 = _time_best(
        lambda: np.asarray(
            kpacked.fused_ternary_knn(pos_t[:, 1], neg_t[:, 1], pos_t, neg_t, k)[0]
        )
    )
    tm = _time_best(
        lambda: np.asarray(
            kpacked.fused_ternary_knn_batch(qp, qn, pos_t, neg_t, k)[0]
        )
    )
    print(f"# ternary_1q_15M_roofline: {t_read / t1:.3f} ({t1 * 1e3:.1f} ms)")
    print(f"# ternary_mq16_15M_roofline: {t_read / tm:.3f} ({tm * 1e3:.1f} ms)")
    del pos_t, neg_t, qp, qn

    # --- u8: 4M x 768d ---
    gen8 = jax.jit(
        lambda key: jax.random.randint(
            key, (500_000, 768), 0, 256, jnp.int32
        ).astype(jnp.uint8)
    )
    codes = jnp.concatenate([gen8(jax.random.PRNGKey(i)) for i in range(8)])
    qv = jax.random.normal(jax.random.PRNGKey(99), (32, 768), jnp.float32)
    t_read = _time_best(lambda: np.asarray(read(codes)))
    tm = _time_best(lambda: np.asarray(kknn.fused_knn_u8_batch(qv, codes, k)[0]))
    print(f"# u8_mq32_4M_roofline: {t_read / tm:.3f} ({tm * 1e3:.1f} ms)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
