"""Serving-style two-stage retrieval: quantized coarse scan -> exact rerank,
comparing all four coarse representations on the same corpus.

Run: python examples/two_stage_pipeline.py
"""

import numpy as np

import innr_tpu as it
from innr_tpu.pipeline import CoarseConfig, TwoStageIndex


def main():
    rng = np.random.default_rng(29)
    n, d, k, n_queries = 20_000, 256, 10, 20

    # Clustered unit embeddings (the regime quantized retrieval serves).
    centers = rng.standard_normal((400, d)).astype(np.float32)
    rows = centers[rng.integers(0, 400, n)] + 0.4 * rng.standard_normal(
        (n, d)
    ).astype(np.float32)
    rows /= np.linalg.norm(rows, axis=1, keepdims=True)
    queries = rows[rng.choice(n, n_queries, replace=False)] + 0.05 * rng.standard_normal(
        (n_queries, d)
    ).astype(np.float32)

    print(f"corpus {n} x {d} f32 = {rows.nbytes / 1e6:.0f} MB, "
          f"recall@{k} vs exact search, rerank_factor=8\n")
    print(f"{'coarse':12s} {'memory':>10s} {'compression':>12s} {'recall':>8s}")
    for kind, cfg in [
        ("binary", CoarseConfig("binary")),
        ("ternary", CoarseConfig("ternary", threshold=0.02)),
        ("u8", CoarseConfig("u8")),
        ("matryoshka", CoarseConfig("matryoshka", prefix_dims=64)),
    ]:
        index = TwoStageIndex(rows, cfg, rerank_factor=8)
        mem = index.memory_bytes()
        coarse_mb = mem[f"coarse_{kind}"] / 1e6
        recall = index.recall_vs_exact(queries, k)
        print(f"{kind:12s} {coarse_mb:>8.2f}MB {rows.nbytes / mem[f'coarse_{kind}']:>11.0f}x {recall:>8.0%}")
        assert recall > 0.5, f"{kind} recall collapsed"
    print("\nOK")


if __name__ == "__main__":
    main()
