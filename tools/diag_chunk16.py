"""Chip-side control for the CPU-mesh quality gap (ROUND5_NOTES).

The 8-virtual-device CPU mesh fails ~20 scenes that the chip's batch-128
program tracks, and the f32/f64 CPU failing sets OVERLAP — systematic,
not dtype chaos. The shared factor is the PER-DEVICE BATCH SHAPE (16).
This tool runs the SAME fleet on the chip with chunk=16 (program shape
16, like one mesh device) and prints the failing set: if it resembles
the CPU-mesh set, the gap is program-shape basin selection (the
bisect_batch mechanism at shape 16), not a backend defect.

Usage: python tools/diag_chunk16.py [chunk=16] [ticks=10]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from boundplanner_tpu.config import perf_mpc_params  # noqa: E402
from boundplanner_tpu.parallel.batch import chunked_rollout  # noqa: E402
from boundplanner_tpu.parallel.fleet_cache import ensure  # noqa: E402


def main():
    chunk = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    ticks = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    cfg = perf_mpc_params()
    fleet = ensure(128, 7, cfg.nr_segs)
    cb = jax.device_put(fleet["carry"])
    ob = jax.device_put(fleet["obs"])
    qb = jax.device_put(jnp.asarray(fleet["q0"]))
    roll = jax.jit(
        lambda c, q, o: chunked_rollout(c, q, o, cfg, ticks, chunk=chunk)
    )
    _, recs = roll(cb, qb, ob)
    succ = np.asarray(recs["success"])
    viol = np.asarray(recs["viol"])
    phi = np.asarray(recs["phi"])
    fails = (succ < 0.5).sum(axis=1)
    bad = np.nonzero(fails)[0]
    print(f"chip chunk={chunk} ticks={ticks}: success {succ.mean():.4f} "
          f"max_viol {viol.max():.4f} mean_phi {phi[:, -1].mean():.4f}")
    for s in bad:
        print(f"  scene {s:3d}: fails {int(fails[s])}/{ticks} "
              f"max_viol {viol[s].max():.4f} phi_final {phi[s, -1]:.3f}")


if __name__ == "__main__":
    main()
