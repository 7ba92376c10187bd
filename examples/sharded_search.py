"""Distributed kNN over a device mesh — the TPU-native scaling path the
single-core reference cannot express (survey §2.4 mandate).

Runs on whatever devices are present; to simulate a pod on CPU:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/sharded_search.py
"""

import numpy as np
import jax

import innr_tpu as it
from innr_tpu.parallel import ShardedCorpus, default_mesh


def main():
    rng = np.random.default_rng(23)
    n, d, k = 100_000, 128, 10
    rows = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal(d).astype(np.float32)

    mesh = default_mesh()
    print(f"mesh: {mesh.devices.size} device(s) on {jax.default_backend()}")

    corpus = ShardedCorpus(rows, mesh=mesh)
    vals, idx = corpus.knn_dot(q, k)
    idx = np.asarray(idx)

    brute = np.argsort(-(rows.astype(np.float64) @ q), kind="stable")[:k]
    assert list(idx) == list(brute), "distributed merge must equal brute force"
    print(f"top-{k} indices: {idx.tolist()}")
    print("OK: distributed top-k equals single-host brute force")


if __name__ == "__main__":
    main()
