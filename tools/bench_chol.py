"""Microbench the Pallas Cholesky+inverse kernel variants on the TPU.

Dependency-chained timing (CLAUDE.md): a lax.scan of `reps` calls, each
input perturbed by the previous output so XLA can neither parallelize nor
elide them, plus a scalar fetch.

Usage: python tools/bench_chol.py [reps=50] [n=136] [batch=128]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from boundplanner_tpu.ops.pallas_chol import cholesky_inverse  # noqa: E402


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 136
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 128

    rng = np.random.default_rng(0)
    a = rng.standard_normal((batch, n, n)).astype(np.float32)
    k = a @ np.transpose(a, (0, 2, 1)) + n * np.eye(n, dtype=np.float32)
    k = jnp.asarray(k)

    outs = {}
    for name, kw in (
        ("baseline(two_d)", {}),
        ("interleave", {"interleave": True}),
    ):
        @jax.jit
        def chain(k0):
            def step(ki, _):
                li = cholesky_inverse(ki, **kw)  # noqa: B023
                # perturb diagonally so the next call depends on this one
                return ki + 1e-6 * li[0, 0, 0] * jnp.eye(n, dtype=ki.dtype), li
            kf, lis = jax.lax.scan(step, k0, None, length=reps)
            return kf, lis[-1]

        kf, last = chain(k)
        _ = float(np.asarray(last)[0, 0, 0])  # compile + warm
        t0 = time.perf_counter()
        kf, last = chain(k)
        _ = float(np.asarray(last)[0, 0, 0])
        wall = time.perf_counter() - t0
        outs[name] = np.asarray(last)
        print(f"{name}: {wall * 1e3 / reps:.3f} ms/call "
              f"(B={batch}, n={n}, {reps} chained reps)")

    base, il = outs["baseline(two_d)"], outs["interleave"]
    print("bit-identical on device:", bool((base == il).all()),
          "maxdiff:", float(np.abs(base - il).max()))


if __name__ == "__main__":
    main()
