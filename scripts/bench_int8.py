#!/usr/bin/env python
"""int8-MXU experiment for the u8 scoring paths (survey §2.4 mandate).

A/Bs three exact implementations of the symmetric u8 corpus dot
(reference ``dot_u8_avx512``, src/arch/x86_64.rs:1102) on the real chip:

  widen-i32 : corpus.astype(i32) @ query.astype(i32)    (current default)
  s8-mxu    : zero-point-shifted s8 x s8 dot_general + int32 correction
  widen-f32 : corpus.astype(f32) @ query.astype(f32)    (INEXACT above 2^24)

and the asymmetric f32-query x u8-codes matmul (the fused kernel's inner
op) against an s8-quantized-query variant (approximate — measured for
bandwidth only, not wired). Each timing forces a host fetch; a same-bytes
jnp.sum read gives the roofline. Decision + numbers land in PERF.md.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def _best(fn, reps=5):
    fn()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    from innr_tpu.ops.quant import batch_dot_u8, batch_dot_u8_s8

    rng = np.random.default_rng(0)
    n, d = 1_000_000, 768
    corpus = jnp.asarray(rng.integers(0, 256, (n, d), dtype=np.uint8))
    q = jnp.asarray(rng.integers(0, 256, d, dtype=np.uint8))

    j_i32 = jax.jit(batch_dot_u8)
    j_s8 = jax.jit(batch_dot_u8_s8)

    @jax.jit
    def j_f32(q, c):
        return jnp.matmul(
            c.astype(jnp.float32), q.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )

    @jax.jit
    def read(c):
        return jnp.sum(jax.lax.population_count(c.astype(jnp.uint32)).astype(jnp.int32))

    # Correctness first: s8 decomposition must equal i32 widen exactly.
    a = np.asarray(j_i32(q, corpus[:4096]))
    b = np.asarray(j_s8(q, corpus[:4096]))
    assert (a == b).all(), "s8 decomposition mismatch"

    t_read = _best(lambda: np.asarray(read(corpus)))
    t_i32 = _best(lambda: np.asarray(j_i32(q, corpus)[:8]))
    t_s8 = _best(lambda: np.asarray(j_s8(q, corpus)[:8]))
    t_f32 = _best(lambda: np.asarray(j_f32(q, corpus)[:8]))

    gb = n * d / 1e9
    print(f"corpus: {n} x {d} u8 ({gb:.2f} GB)")
    print(f"same-bytes read : {t_read*1e3:8.2f} ms  ({gb/t_read:6.1f} GB/s)")
    for name, t in [("widen-i32", t_i32), ("s8-mxu", t_s8), ("widen-f32", t_f32)]:
        print(
            f"{name:15s}: {t*1e3:8.2f} ms  ({gb/t:6.1f} GB/s, "
            f"roofline {t_read/t:4.2f}, {n/t/1e6:8.1f} M evals/s)"
        )

    # Multi-query (32) forms — the serving shape.
    qs = jnp.asarray(rng.integers(0, 256, (32, d), dtype=np.uint8))

    @jax.jit
    def mq_i32(qs, c):
        return jax.lax.dot_general(
            c.astype(jnp.int32), qs.astype(jnp.int32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    @jax.jit
    def mq_s8(qs, c):
        cs = (c ^ jnp.uint8(0x80)).view(jnp.int8)
        ss = (qs ^ jnp.uint8(0x80)).view(jnp.int8)
        main = jax.lax.dot_general(
            cs, ss,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        rsum = jnp.sum(cs.astype(jnp.int32), axis=1, keepdims=True)
        qsum = jnp.sum(ss.astype(jnp.int32), axis=1)[None, :]
        return main + 128 * rsum + 128 * qsum + 128 * 128 * d

    a = np.asarray(mq_i32(qs, corpus[:4096]))
    b = np.asarray(mq_s8(qs, corpus[:4096]))
    assert (a == b).all(), "multi-query s8 mismatch"
    t_mq_i32 = _best(lambda: np.asarray(mq_i32(qs, corpus)[:4, :4]))
    t_mq_s8 = _best(lambda: np.asarray(mq_s8(qs, corpus)[:4, :4]))
    for name, t in [("mq32 widen-i32", t_mq_i32), ("mq32 s8-mxu", t_mq_s8)]:
        print(
            f"{name:15s}: {t*1e3:8.2f} ms  ({gb/t:6.1f} GB/s, "
            f"roofline {t_read/t:4.2f}, {32*n/t/1e6:8.1f} M evals/s)"
        )


if __name__ == "__main__":
    main()
