"""Benchmark the three device NMS implementations on the real chip.

VERDICT round-2 item 8: the sequential greedy Pallas kernel dominates
batch-1 serving latency; kernels/nms_matrix.py replaces one-round-per-keeper
with one round per suppression-chain-depth. This measures both (plus the
pure-XLA while_loop fallback) at serving shapes so the dispatch gate in
ops/nms.py (K<=1024, B<=16 -> matrix) is backed by numbers.

A single synced call on this harness is pinned at the ~27 ms relay RTT
floor, which hides any kernel difference — so each timing runs R=32
kernel invocations chained in one lax.scan (distinct inputs per step,
one checksum sync at the end) and reports the floor-corrected per-call
time. Prints one JSON line per (impl, B, K).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/bench_nms_kernels.py
"""

import json
import os
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")


def make_candidates(rng, b, k):
    """Realistic serving distribution: clustered boxes (NMS actually
    suppresses), scores descending with a dead tail."""
    centers = rng.uniform(80, 560, (b, k // 8, 2))
    idx = rng.integers(0, k // 8, (b, k))
    cxy = np.take_along_axis(centers, idx[..., None], axis=1) + rng.normal(
        0, 12, (b, k, 2))
    wh = rng.uniform(20, 120, (b, k, 2))
    boxes = np.concatenate([cxy - wh / 2, cxy + wh / 2], axis=-1)
    scores = np.sort(rng.uniform(0.05, 1.0, (b, k)))[:, ::-1].copy()
    scores[:, int(k * 0.75):] = 0.0  # dead tail past the conf cut
    return boxes.astype(np.float32), scores.astype(np.float32)


def main():
    import jax
    import jax.numpy as jnp

    from yoloseries_tpu.kernels.nms_matrix import pallas_matrix_nms
    from yoloseries_tpu.kernels.nms_pallas import pallas_greedy_nms
    from yoloseries_tpu.ops.nms import greedy_nms

    impls = {
        "pallas_greedy": lambda bx, sc: pallas_greedy_nms(bx, sc, 0.45),
        "pallas_matrix": lambda bx, sc: pallas_matrix_nms(bx, sc, 0.45),
        "xla_while": lambda bx, sc: jax.vmap(
            lambda b1, s1: greedy_nms(b1, s1, 0.45, 300))(bx, sc),
    }
    rng = np.random.default_rng(0)
    R = 32  # kernel invocations per sync, amortizing the relay RTT

    # measured sync floor: one scalar pull through the relay
    trivial = jax.jit(lambda x: x + 1.0)
    float(trivial(jnp.zeros(())))
    floor_ms = sorted(
        [(lambda t0: (float(trivial(jnp.zeros(()) + i)),
                      time.perf_counter() - t0)[1])(time.perf_counter())
         for i in range(8)]
    )[4] * 1e3
    print(json.dumps({"relay_floor_ms": round(floor_ms, 3), "R": R}))

    results = []
    for b, k in [(1, 512), (8, 512), (16, 512), (1, 1024), (256, 512)]:
        stacks = []
        for _ in range(2):
            bx, sc = make_candidates(rng, b * R, k)
            stacks.append((
                jnp.asarray(bx.reshape(R, b, k, 4)),
                jnp.asarray(sc.reshape(R, b, k)),
            ))
        data = [(s[0][0], s[1][0]) for s in stacks]  # single-call inputs
        for name, fn in impls.items():
            if name == "pallas_matrix" and (k > 1024):
                continue

            def scan_run(bxs, scs, f=fn):
                def step(carry, xs):
                    o = f(*xs)
                    return (carry + jnp.sum(o[0].astype(jnp.float32))
                            + jnp.sum(o[1].astype(jnp.float32))), None
                tot, _ = jax.lax.scan(step, jnp.zeros(()), (bxs, scs))
                return tot

            jf = jax.jit(scan_run)
            try:
                float(jf(*stacks[0]))  # compile + warm
                times = []
                for i in range(5):
                    t0 = time.perf_counter()
                    float(jf(*stacks[i % 2]))
                    times.append(time.perf_counter() - t0)
                tot_ms = sorted(times)[len(times) // 2] * 1e3
                per = max(tot_ms - floor_ms, 0.0) / R
                rec = {"impl": name, "B": b, "K": k,
                       "per_call_ms": round(per, 3),
                       "scan_total_ms": round(tot_ms, 2)}
            except Exception as e:  # surface per-impl compile failures
                rec = {"impl": name, "B": b, "K": k,
                       "error": f"{type(e).__name__}: {e}"[:200]}
            print(json.dumps(rec))
            results.append(rec)

    # keep-set agreement sanity on the last dataset (greedy == matrix)
    import jax

    bx, sc = data[0]
    a = pallas_greedy_nms(bx, sc, 0.45)
    m = pallas_matrix_nms(bx, sc, 0.45) if k <= 1024 else a
    agree = bool(np.array_equal(
        np.where(np.asarray(a[1]), np.asarray(a[0]), -1),
        np.where(np.asarray(m[1]), np.asarray(m[0]), -1)))
    print(json.dumps({"check": "greedy==matrix keep order", "agree": agree}))


if __name__ == "__main__":
    main()
