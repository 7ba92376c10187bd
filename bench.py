#!/usr/bin/env python
"""Headline benchmark: batch_knn_dot distance evals/s/chip.

Measures the fused Pallas streaming score+top-k scan (the flagship kernel)
at d=128 over a 5.12 GB corpus in HBM and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N,
     "roofline_fraction": F, "submetrics": {...}}

The headline config is the **bf16 corpus** (20M rows x 128d — the same HBM
byte count as the 10M f32 north-star config): ``VerticalBatch``'s
half-precision storage mode reads 2 bytes/dim, so the HBM-bound scan
delivers 2x the distance evals per second at ~1e-2 relative score
precision. ``submetrics`` records, measured in the same session:

- ``f32_10M_128d``: the original f32 north-star config (evals/s, x-baseline,
  roofline fraction);
- ``u8_1M_768d``: the u8 asymmetric config (BASELINE.json);
- ``bf16_vs_f32_top10_overlap``: top-10 index agreement between the bf16
  and f32 scans of the SAME logical corpus — the recorded precision bound
  for the headline number.

Baseline: the reference's published dot throughput at d=128 is 7.92 ns/eval
(Apple Silicon NEON, cache-resident, single core; BASELINE.md), i.e.
~126.3M distance evals/s. ``vs_baseline`` is our evals/s divided by that.

``roofline_fraction`` is measured IN THE SAME SESSION as the kernel: the
time for a bare ``jnp.sum`` over the same corpus bytes (one HBM read — the
speed-of-light for any one-pass scan) divided by the kernel's launch time.
1.0 means the fused scan runs at the chip's achievable memory bandwidth;
cross-session bandwidth fluctuation through the relay cancels out (the
within-session A/B methodology of PERF.md).

Run ``python bench.py --full`` for the complete suite (all BASELINE.json
configs), each with its own roofline fraction.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

# Reference baseline: dot @ 128d = 7.92 ns/eval (BASELINE.md).
BASELINE_EVALS_PER_S = 1.0 / 7.92e-9


def _backend_ready(attempts=3, probe_timeout=90, backoffs=(20, 60)):
    """Hang-proof TPU-backend liveness probe with bounded retry/backoff.

    ``jax.devices()`` on a dead relay does not raise — it HANGS forever
    (round-3 driver: bench rc=1 on one outage mode, dryrun rc=124 on the
    other). So the probe runs in a child process under a timeout; the main
    process only initializes the backend after a probe succeeds. Returns
    (ok, detail). Bounded worst case: attempts*probe_timeout + sum(backoffs).
    """
    attempts = int(os.environ.get("INNR_BENCH_PROBE_ATTEMPTS", attempts))
    code = (
        "import jax, jax.numpy as jnp; d = jax.devices(); "
        "x = jnp.ones((8, 8)); jnp.sum(x @ x).block_until_ready(); "
        "print('READY', d[0].platform, len(d))"
    )
    detail = ""
    for i in range(attempts):
        try:
            r = subprocess.run(
                [sys.executable, "-c", code],
                capture_output=True,
                text=True,
                timeout=probe_timeout,
                cwd=os.path.dirname(os.path.abspath(__file__)) or ".",
            )
            if r.returncode == 0 and "READY" in r.stdout:
                return True, r.stdout.strip().splitlines()[-1]
            detail = (r.stderr or r.stdout).strip().splitlines()[-1:] or [""]
            detail = f"probe rc={r.returncode}: {detail[0][:300]}"
        except subprocess.TimeoutExpired:
            detail = f"probe hung >{probe_timeout}s (relay unresponsive)"
        if i + 1 < attempts:
            time.sleep(backoffs[min(i, len(backoffs) - 1)])
    return False, detail


def _emit_error(stage, detail):
    """One structured JSON line so the driver can distinguish 'code broken'
    from 'relay down' instead of recording a raw-traceback rc=1."""
    print(
        json.dumps(
            {
                "metric": "batch_knn_dot_evals_per_s_d128",
                "error": detail[:500],
                "stage": stage,
                "value": None,
                "unit": "distance evals/s/chip",
                "vs_baseline": None,
            }
        )
    )


def _time_best(fn, reps=3):
    """Min wall-time over reps; fn must force a host fetch itself."""
    fn()  # warmup / compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def _read_time(*arrays, reps=3):
    """Same-session speed-of-light: one full HBM read of the given arrays,
    reduced to a scalar in a single fused jitted pass (no intermediate
    writes), host-fetching the result."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def _reduce(*xs):
        acc = jnp.float32(0.0)
        for x in xs:
            if jnp.issubdtype(x.dtype, jnp.floating):
                acc = acc + jnp.sum(x)
            else:
                acc = acc + jnp.sum(
                    jax.lax.population_count(x.astype(jnp.uint32)).astype(jnp.int32)
                ).astype(jnp.float32)
        return acc

    return _time_best(lambda: np.asarray(_reduce(*arrays)), reps)


def bench_knn_dot(n=10_000_000, d=128, k=10, queries=32, repeats=5,
                  dtype="float32"):
    """Fused multi-query kNN-dot scan over an (n, d) corpus.

    One kernel launch scores all ``queries`` queries against the corpus
    (one corpus HBM read shared by the batch). Timing forces a host fetch
    of the results each repeat, so asynchronous dispatch cannot flatter the
    number. ``dtype``: "float32" or "bfloat16" corpus storage (bf16 halves
    HBM bytes/row — the half-precision serving mode of VerticalBatch).
    Returns (evals/s/chip, launch seconds, roofline fraction).
    """
    import jax
    import jax.numpy as jnp

    from innr_tpu.kernels import knn as kknn

    rng = np.random.default_rng(42)
    jdt = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    # Generate the corpus ON DEVICE: host-generating billions of gaussians
    # and pushing 5 GB through the transfer path costs minutes and measures
    # nothing (scan timing is data-independent).
    rows = jax.jit(
        lambda: jax.random.normal(jax.random.PRNGKey(42), (n, d), dtype=jdt)
    )()
    jax.block_until_ready(rows)
    qs = jnp.asarray(rng.standard_normal((queries, d)).astype(np.float32))

    launch = _time_best(
        lambda: np.asarray(kknn.fused_knn_dot_batch(qs, rows, k)[0]),
        reps=repeats,
    )
    read = _read_time(rows)
    del rows
    evals_per_s = queries * n / launch
    return evals_per_s, launch, read / launch


def bench_u8(n=1_000_000, d=768, k=10, queries=32):
    """u8 asymmetric config (BASELINE.json): f32 queries x u8 codes, codes
    stay 1 byte/dim in HBM and widen on-chip. Returns (evals/s, roofline)."""
    import jax
    import jax.numpy as jnp

    from innr_tpu.kernels import knn as kknn

    rng = np.random.default_rng(7)
    codes = jax.jit(
        lambda: jax.random.randint(
            jax.random.PRNGKey(0), (n, d), 0, 256, dtype=jnp.int32
        ).astype(jnp.uint8)
    )()
    jax.block_until_ready(codes)
    qv = jnp.asarray(rng.standard_normal((queries, d)).astype(np.float32))
    dt = _time_best(lambda: np.asarray(kknn.fused_knn_u8_batch(qv, codes, k)[0]))
    read = _read_time(codes)
    del codes
    return queries * n / dt, read / dt


def bench_bf16_parity(n=1_000_000, d=128, k=10, queries=32):
    """Top-k index agreement between the f32 and bf16 scans of the SAME
    logical corpus — the recorded precision bound for the bf16 headline.
    Returns mean fraction of the f32 top-k recovered by the bf16 scan."""
    import jax
    import jax.numpy as jnp

    from innr_tpu.kernels import knn as kknn

    rng = np.random.default_rng(3)
    rows32 = jax.jit(
        lambda: jax.random.normal(
            jax.random.PRNGKey(9), (n, d), dtype=jnp.float32
        )
    )()
    rows16 = jax.jit(lambda r: r.astype(jnp.bfloat16))(rows32)
    qs = jnp.asarray(rng.standard_normal((queries, d)).astype(np.float32))
    idx32 = np.asarray(kknn.fused_knn_dot_batch(qs, rows32, k)[1])
    idx16 = np.asarray(kknn.fused_knn_dot_batch(qs, rows16, k)[1])
    del rows32, rows16
    return float(
        np.mean(
            [
                len(set(idx32[i].tolist()) & set(idx16[i].tolist())) / k
                for i in range(queries)
            ]
        )
    )


def bench_sharded_overhead(n=2_000_000, d=128, k=10, queries=32):
    """shard_map overhead bound on a trivial mesh (round-5 verdict item
    8): the sharded kNN path on a 1-device mesh vs the direct fused
    kernel over the same corpus. Multi-chip hardware isn't reachable
    here, but the DEGENERATE mesh runs the full shard_map + local-scan +
    merge machinery on silicon — the ratio bounds what the distribution
    layer costs when the mesh is trivial (should be ~1.0)."""
    import jax
    import jax.numpy as jnp

    from innr_tpu.kernels import knn as kknn
    from innr_tpu.parallel import ShardedCorpus
    from innr_tpu.parallel.sharded import default_mesh

    rng = np.random.default_rng(11)
    rows = jax.jit(
        lambda: jax.random.normal(
            jax.random.PRNGKey(21), (n, d), dtype=jnp.float32
        )
    )()
    jax.block_until_ready(rows)
    qs = jnp.asarray(rng.standard_normal((queries, d)).astype(np.float32))
    direct = _time_best(
        lambda: np.asarray(kknn.fused_knn_dot_batch(qs, rows, k)[0])
    )
    sc = ShardedCorpus(rows, mesh=default_mesh(jax.devices()[:1]))
    sharded = _time_best(lambda: np.asarray(sc.knn_dot(qs, k)[0]))
    del rows, sc
    return sharded / direct


def bench_full():
    """All BASELINE.json north-star configs with per-config roofline
    fractions (same-session jnp.sum read time / kernel time); prints one
    line each to stderr."""
    import jax
    import jax.numpy as jnp

    import innr_tpu as it
    from innr_tpu.kernels import knn as kknn, packed_knn as kpacked

    rng = np.random.default_rng(0)
    out = {}

    # 1. batch_demo: 10K x 128d, 100 queries, top-2 (examples/batch_demo.rs)
    rows = jnp.asarray(rng.standard_normal((10_000, 128)).astype(np.float32))
    queries = jnp.asarray(rng.standard_normal((100, 128)).astype(np.float32))
    dt = _time_best(lambda: np.asarray(kknn.fused_knn_dot_batch(queries, rows, 2)[0]))
    out["batch_demo_10k_qps"] = (100 / dt, None)

    # 2. MaxSim ColBERT: 32-token queries x 128-token docs at d=128,
    #    batched over 256 docs per launch.
    q_toks = jnp.asarray(rng.standard_normal((1, 32, 128)).astype(np.float32))
    docs = jnp.asarray(rng.standard_normal((256, 128, 128)).astype(np.float32))
    dt = _time_best(lambda: np.asarray(it.batch_maxsim(q_toks, docs)))
    out["maxsim_scored_docs_per_s"] = (256 / dt, _read_time(docs) / dt)

    # 3. u8 asymmetric: 1M x 768d with precomputed query context,
    #    32-query batch (the serving shape). Corpora generate on device —
    #    host transfer costs minutes through a relay and measures nothing.
    n_u8 = 1_000_000
    key = jax.random.PRNGKey(0)
    codes = jax.jit(
        lambda: jax.random.randint(key, (n_u8, 768), 0, 256, dtype=jnp.int32
        ).astype(jnp.uint8)
    )()
    qv = jnp.asarray(rng.standard_normal((32, 768)).astype(np.float32))
    dt = _time_best(lambda: np.asarray(kknn.fused_knn_u8_batch(qv, codes, 10)[0]))
    out["u8_1M_768d_evals_per_s"] = (32 * n_u8 / dt, _read_time(codes) / dt)
    del codes  # free HBM before the next corpus

    # 4. binary + ternary coarse scans over 1M x 768d.
    n_b = 1_000_000
    corpus_f = rng.standard_normal((100, 768)).astype(np.float32)  # encode sample
    words_t = jax.jit(
        lambda: jax.random.bits(jax.random.PRNGKey(1), (24, n_b), jnp.uint32)
    )()
    q_words = jnp.asarray(rng.integers(0, 2**32, 24, dtype=np.uint32))
    dt = _time_best(lambda: np.asarray(kpacked.fused_binary_knn(q_words, words_t, 40)[0]))
    out["binary_1M_768d_evals_per_s"] = (n_b / dt, _read_time(words_t) / dt)

    pos_t = jax.jit(
        lambda: jax.random.bits(jax.random.PRNGKey(2), (24, n_b), jnp.uint32)
    )()
    neg_t = jnp.zeros((24, n_b), dtype=jnp.uint32)
    qt = it.encode_ternary(corpus_f[0], 0.5)
    dt = _time_best(
        lambda: np.asarray(kpacked.fused_ternary_knn(qt.pos, qt.neg, pos_t, neg_t, 40)[0])
    )
    out["ternary_1M_768d_evals_per_s"] = (
        n_b / dt,
        _read_time(pos_t, neg_t) / dt,
    )
    del words_t, pos_t, neg_t

    # 5. slot-Hamming / MinHash over 10M 128-slot sketches (batched compare-
    #    reduce; 5 GB read as uint32).
    n_s = 10_000_000
    sketches = jax.jit(
        lambda: jax.random.bits(
            jax.random.PRNGKey(3), (n_s, 128), jnp.uint32
        ) >> 1
    )()
    q_sketch = jnp.asarray(rng.integers(0, 2**31, 128, dtype=np.uint32))

    @jax.jit
    def slot_scan(q, s):
        return jnp.sum((s != q[None, :]).astype(jnp.int32), axis=1)

    dt = _time_best(lambda: np.asarray(slot_scan(q_sketch, sketches)[:8]))
    out["slot_hamming_10M_128slot_evals_per_s"] = (
        n_s / dt,
        _read_time(sketches) / dt,
    )
    del sketches

    # 5a. fused multi-query slot kNN (MinHash retrieval): 16 sketches share
    #     ONE corpus read + streaming top-k (slot-major layout). NOTE: at
    #     Q=16 this op is VPU-bound (Q compares per 4 corpus bytes ~= 4
    #     ops/byte exceeds the compute:bandwidth ratio), so its HBM-read
    #     fraction is structurally < 1 — measured ~0.9 of VPU peak; see
    #     PERF.md "slot multi-query physics".
    from innr_tpu.kernels.slot_knn import fused_slot_knn_batch

    slots_t = jax.jit(
        lambda: jax.random.bits(
            jax.random.PRNGKey(4), (128, n_s), jnp.uint32
        ) >> 1
    )()
    qs_sketch = jnp.asarray(
        rng.integers(0, 2**31, (16, 128), dtype=np.uint32)
    )
    dt = _time_best(
        lambda: np.asarray(fused_slot_knn_batch(qs_sketch, slots_t, 10)[0])
    )
    out["slot_knn_10M_128slot_16q_evals_per_s"] = (
        16 * n_s / dt,
        _read_time(slots_t) / dt,
    )
    del slots_t

    # 5c. sparse (SPLADE-style) retrieval: 1M x 32nnz docs, scan-scale
    #     binary-search join of the query into the whole corpus.
    n_sp, L_sp = 1_000_000, 32
    sp_idx = jax.jit(
        lambda: jnp.sort(
            jax.random.randint(
                jax.random.PRNGKey(5), (n_sp, L_sp), 0, 100_000, jnp.int32
            ).astype(jnp.uint32),
            axis=1,
        )
    )()
    sp_val = jax.jit(
        lambda: jax.random.normal(jax.random.PRNGKey(6), (n_sp, L_sp), jnp.float32)
    )()
    sp_corpus = it.SparseCorpus((sp_idx, sp_val))
    spq_i = np.sort(rng.choice(100_000, 64, replace=False)).astype(np.uint32)
    spq_v = rng.standard_normal(64).astype(np.float32)
    dt = _time_best(
        lambda: np.asarray(it.sparse_knn((spq_i, spq_v), sp_corpus, 10)[0])
    )
    out["sparse_knn_1M_32nnz_docs_per_s"] = (
        n_sp / dt,
        _read_time(sp_idx, sp_val) / dt,
    )
    del sp_idx, sp_val, sp_corpus

    # 5b. kNN recall@10 (BASELINE.json north-star metric): two-stage
    #     coarse->rerank over a clustered 100K x 256d corpus (256 centers +
    #     noise — the realistic embedding regime; uniform gaussian is the
    #     degenerate worst case for 1-bit sketches), 64 queries, vs exact.
    n_r, d_r = 100_000, 256
    centers = rng.standard_normal((256, d_r)).astype(np.float32)
    rows_r = (
        centers[rng.integers(0, 256, n_r)]
        + 0.3 * rng.standard_normal((n_r, d_r)).astype(np.float32)
    )
    qs_r = rows_r[:64] + 0.05 * rng.standard_normal((64, d_r)).astype(np.float32)
    vb_r = it.VerticalBatch.from_rows(rows_r)
    exact = it.batch_knn_dot(jnp.asarray(qs_r), vb_r, 10).indices
    # Rerank budgets sized to the coarse stage's information content:
    # 1-2 bit sketches keep more candidates (still only 0.64% of the
    # corpus), 8-bit and f32-prefix stages need fewer.
    for kind, rf in (("binary", 64), ("ternary", 64), ("u8", 8), ("matryoshka", 8)):
        idx2 = it.TwoStageIndex(rows_r, kind, rerank_factor=rf)
        got = idx2.search_batch(jnp.asarray(qs_r), 10).indices
        recall = float(
            np.mean(
                [
                    len(set(got[i].tolist()) & set(exact[i].tolist())) / 10
                    for i in range(64)
                ]
            )
        )
        out[f"two_stage_recall_at_10_{kind}_rf{rf}"] = (recall, None)
    del rows_r, vb_r

    # 5c. bf16 half-precision corpus (TPU-native extension): half the HBM
    #     bytes per scan — 20M rows at the same byte count as 10M f32.
    n_h = 20_000_000
    rows16 = jax.jit(
        lambda: jax.random.normal(
            jax.random.PRNGKey(5), (n_h, 128), dtype=jnp.bfloat16
        )
    )()
    qh = jnp.asarray(rng.standard_normal((32, 128)).astype(np.float32))
    dt = _time_best(lambda: np.asarray(kknn.fused_knn_dot_batch(qh, rows16, 10)[0]))

    @jax.jit
    def _read16(r):
        return jnp.sum(r.astype(jnp.float32))

    t_r16 = _time_best(lambda: np.asarray(_read16(rows16)))
    out["bf16_20M_128d_evals_per_s"] = (32 * n_h / dt, t_r16 / dt)
    del rows16

    # 5d. tile-skip pruned scan (HBM-level early exit) on a clustered,
    #     cluster-ordered 10M x 128d corpus: amortized over 4 scans per
    #     launch (the relay's ~28 ms launch floor would otherwise mask
    #     the bandwidth win). Reported value = full/pruned speedup; the
    #     pruned scan is EXACT (innr_tpu/prune.py bounds are sound).
    from innr_tpu import prune as _prune
    from innr_tpu.kernels import pruned_knn as _kpruned

    n_p = 10_000_000
    @jax.jit
    def _gen_clustered():
        centers = 3.0 * jax.random.normal(
            jax.random.PRNGKey(0), (256, 128), dtype=jnp.float32
        )
        assign = jnp.sort(
            jax.random.randint(jax.random.PRNGKey(1), (n_p,), 0, 256)
        )
        noise = 0.05 * jax.random.normal(
            jax.random.PRNGKey(2), (n_p, 128), dtype=jnp.float32
        )
        return centers[assign] + noise, centers

    rows_c, centers_c = _gen_clustered()
    jax.block_until_ready(rows_c)
    tile_p = _kpruned.pruned_tile_n(n_p, 128)
    summ = _prune.build_tile_summary(rows_c, tile_p)
    qs_c = jnp.asarray(
        np.asarray(centers_c[:32])
        + 0.01 * rng.standard_normal((32, 128)).astype(np.float32)
    )
    cent_c, rad_c, cnt_c = summ.centroids, summ.radii, summ.counts

    @jax.jit
    def _full4(r, *qss):
        return jnp.stack(
            [kknn.fused_knn_dot_batch(q, r, 10)[0][:, 0] for q in qss]
        )

    @jax.jit
    def _pruned4(r, ce, ra, cn, *qss):
        outs = []
        for q in qss:
            o, ns = _prune.plan_survivors(q, ce, ra, cn, 10, "dot", fast=True)
            keys, _ = _kpruned._pruned_raw_dynamic(
                q, r, None, o, ns, 10, "dot", tile_p
            )
            outs.append(keys[:, 0])
        return jnp.stack(outs)

    qss4 = tuple(qs_c * (1.0 + 0.01 * j) for j in range(4))
    t_f = _time_best(lambda: np.asarray(_full4(rows_c, *qss4)))
    t_p = _time_best(lambda: np.asarray(_pruned4(rows_c, cent_c, rad_c, cnt_c, *qss4)))
    out["pruned_scan_speedup_vs_full_clustered_10M"] = (t_f / t_p, None)
    del rows_c, summ

    # 6. matryoshka prefix kNN: 128d coarse over 1M x 768d corpus + 768d
    #    rerank of top-100 — through the product pipeline (TwoStageIndex:
    #    one fused coarse launch + one fused rerank launch), 32 queries
    #    amortizing the per-launch latency.
    rows768 = jax.jit(
        lambda: 0.05 * jax.random.normal(
            jax.random.PRNGKey(4), (n_b, 768), dtype=jnp.float32
        )
    )()
    idx_m = it.TwoStageIndex(
        rows768, it.CoarseConfig(kind="matryoshka", prefix_dims=128),
        rerank_factor=10,
    )
    q768 = jnp.asarray(rng.standard_normal((32, 768)).astype(np.float32))
    dt = _time_best(lambda: idx_m.search_batch(q768, 10).indices)
    out["matryoshka_coarse128_fine768_qps"] = (
        32 / dt,
        _read_time(idx_m._coarse) / dt,
    )

    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true")
    ap.add_argument("--n", type=int, default=10_000_000)
    ap.add_argument(
        "--no-probe",
        action="store_true",
        help="skip the backend liveness probe (e.g. CPU-only smoke runs)",
    )
    args = ap.parse_args()

    if not args.no_probe:
        ok, detail = _backend_ready()
        if not ok:
            _emit_error("backend_init", detail)
            sys.exit(1)

    stage = "start"
    try:
        stage = "full_suite"
        if args.full:
            extra = bench_full()
            for name, (v, rf) in sorted(extra.items()):
                frac = f" roofline={rf:.2f}" if rf is not None else ""
                print(f"# {name}: {v:,.1f}{frac}", file=sys.stderr)

        # Sub-metrics first (each frees its corpus before the next
        # allocates).
        stage = "f32_10M_128d"
        f32_evals, _, f32_roofline = bench_knn_dot(n=args.n, dtype="float32")
        stage = "u8_1M_768d"
        u8_evals, u8_roofline = bench_u8()
        stage = "bf16_parity"
        parity = bench_bf16_parity()
        # GATE (round-5 verdict item 5): the headline rides the bf16
        # corpus, which is only legitimate while its fidelity holds. A
        # kernel change that degraded bf16 agreement below this floor
        # must FAIL the bench, not print a big number with a quiet
        # submetric. Override only for deliberate experiments.
        overlap_floor = float(
            os.environ.get("INNR_BENCH_MIN_BF16_OVERLAP", 0.98)
        )
        if parity < overlap_floor:
            _emit_error(
                stage,
                f"bf16_vs_f32_top10_overlap {parity:.4f} < floor "
                f"{overlap_floor} — bf16 headline fidelity regressed",
            )
            sys.exit(1)
        stage = "sharded_overhead_1dev"
        sharded_ratio = bench_sharded_overhead(n=min(args.n, 2_000_000))
        # Headline: bf16 corpus at the same HBM byte count as the f32
        # north-star config (2x rows at 2 bytes/dim) — the recorded serving
        # configuration for d=128 retrieval.
        stage = "bf16_headline"
        n16 = 2 * args.n
        evals_per_s, latency, roofline = bench_knn_dot(n=n16, dtype="bfloat16")
    except Exception as e:  # noqa: BLE001 — one JSON line, then re-raise code
        _emit_error(stage, f"{type(e).__name__}: {e}")
        sys.exit(1)
    # Same `# name: value [roofline=F]` stderr format as the bench_full
    # stages, so plot_benchmarks.py --check/--update can pin these too.
    print(
        f"# f32_headline_evals_per_s: {f32_evals:,.1f} "
        f"roofline={f32_roofline:.2f}",
        file=sys.stderr,
    )
    print(
        f"# bf16_headline_evals_per_s: {evals_per_s:,.1f} "
        f"roofline={roofline:.2f}",
        file=sys.stderr,
    )
    print(f"# bf16_vs_f32_top10_overlap: {parity:.4f}", file=sys.stderr)
    print(f"# sharded_overhead_1dev: {sharded_ratio:.3f}", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "batch_knn_dot_evals_per_s_d128",
                "value": round(evals_per_s),
                "unit": (
                    f"distance evals/s/chip ({n16} x 128d bf16 corpus "
                    f"[= {args.n} x f32 HBM bytes], k=10, 32-query batch)"
                ),
                "vs_baseline": round(evals_per_s / BASELINE_EVALS_PER_S, 2),
                "roofline_fraction": round(roofline, 3),
                "submetrics": {
                    "f32_10M_128d": {
                        "evals_per_s": round(f32_evals),
                        "vs_baseline": round(f32_evals / BASELINE_EVALS_PER_S, 2),
                        "roofline_fraction": round(f32_roofline, 3),
                    },
                    "u8_1M_768d": {
                        "evals_per_s": round(u8_evals),
                        "roofline_fraction": round(u8_roofline, 3),
                    },
                    "bf16_vs_f32_top10_overlap": round(parity, 4),
                    "sharded_overhead_1dev": round(sharded_ratio, 3),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
