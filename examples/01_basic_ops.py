"""Basic ops tour (reference examples/01_basic_ops.rs).

Demonstrates dot/cosine/norm/L2 and checks the L2^2 = 2(1 - cos) identity
for unit vectors. Run: python examples/01_basic_ops.py
"""

import numpy as np

import innr_tpu as it


def main():
    rng = np.random.default_rng(7)
    a = np.asarray(it.normalize(rng.standard_normal(128).astype(np.float32)))
    b = np.asarray(it.normalize(rng.standard_normal(128).astype(np.float32)))

    d = float(it.dot(a, b))
    c = float(it.cosine(a, b))
    n = float(it.norm(a))
    l2sq = float(it.l2_distance_squared(a, b))
    ang = float(it.angular_distance(a, b))

    print(f"dot(a, b)          = {d:+.6f}")
    print(f"cosine(a, b)       = {c:+.6f}")
    print(f"norm(a)            = {n:.6f}")
    print(f"l2^2(a, b)         = {l2sq:.6f}")
    print(f"angular(a, b)      = {ang:.6f}")

    # For unit vectors: dot == cosine, and ||a-b||^2 == 2(1 - cos).
    assert abs(d - c) < 1e-5, "unit vectors: dot must equal cosine"
    assert abs(l2sq - 2.0 * (1.0 - c)) < 1e-5, "L2^2 = 2(1 - cos) identity"
    assert abs(n - 1.0) < 1e-6
    print("OK: identities hold")


if __name__ == "__main__":
    main()
