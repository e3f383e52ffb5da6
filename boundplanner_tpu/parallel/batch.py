"""Scenario batching: thousands of planner+MPC rollouts per step.

The reference is a single-process single-robot CPU program (SURVEY.md
§2.3); the TPU build's parallelism is *new design*: the fused MPC tick
(`mpc.bound_mpc.mpc_tick`) is a pure function of (carry, measurement,
obstacles), so a fleet of scenes is one ``vmap`` and a whole closed-loop
simulation is one ``lax.scan`` — no host round-trips inside the loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import MPCParams
from ..mpc import bound_mpc
from ..mpc.bound_mpc import MPCCarry, init_carry, mpc_tick
from ..path.reference_path import build_path
from ..planner.set_finder import ObstacleArrays, build_obstacle_arrays
from ..robot import kinematics as kin
from ..utils.integration import integrate_jerk_step


def make_batch_scene(paths, p0s, obstacles_list, cfg: MPCParams, dtype=jnp.float32):
    """Stack per-scene PathStates / carries / obstacle arrays into batched
    pytrees (leading scenario axis)."""
    carries = [init_carry(p, jnp.asarray(np.asarray(q), dtype), cfg, dtype)
               for p, q in zip(paths, p0s)]
    carry = jax.tree.map(lambda *xs: jnp.stack(xs), *carries)
    obs = [build_obstacle_arrays(o) for o in obstacles_list]
    obs = jax.tree.map(lambda *xs: jnp.stack([jnp.asarray(x, None) for x in xs]), *obs)
    return carry, obs


@functools.partial(jax.jit, static_argnames=("cfg",))
def batched_mpc_tick(carry, meas, obs, cfg: MPCParams):
    """One control period for a whole fleet (vmapped fused tick)."""
    return jax.vmap(lambda c, m, o: mpc_tick(c, m, o, cfg))(carry, meas, obs)


def _plant_measurement(q, dq, ddq, jerk, qf, dtype):
    pose = kin.fk_pose(q)
    jac = kin.jacobian_fk(q)
    return {
        "q0": q,
        "dq0": dq,
        "ddq0": ddq,
        "p0": pose,
        "v0": jac @ dq,
        "u0": jerk,
        "qf": qf,
    }


@functools.partial(jax.jit, static_argnames=("cfg", "n_ticks"))
def closed_loop_rollout(carry, q0, obs, cfg: MPCParams, n_ticks: int):
    """Full closed-loop simulation on device: FK -> MPC tick -> apply first
    jerk -> integrate the joint state (the MPCNode loop,
    `MPCNode.py:106-160`, as one scan). Batched over scenes when the inputs
    carry a leading scenario axis (wrap with vmap).

    Returns (final carry, stacked per-tick outputs dict).
    """
    dtype = q0.dtype
    nj = q0.shape[-1]
    zeros = jnp.zeros_like(q0)

    def step(state, _):
        carry, q, dq, ddq, jerk, qf = state
        meas = _plant_measurement(q, dq, ddq, jerk, qf, dtype)
        carry, out = mpc_tick(carry, meas, obs, cfg)
        u0 = out["dddq"][0]
        u1 = out["dddq"][1]
        q_n, dq_n, ddq_n = integrate_jerk_step(q, dq, ddq, u0, u1, cfg.dt)
        qf_n = out["q"][-1]
        record = {
            "phi": out["phi"][1],
            "q": q_n,
            "p": meas["p0"],
            "success": out["success"],
            "viol": out["viol"],
        }
        return (carry, q_n, dq_n, ddq_n, u1, qf_n), record

    state0 = (carry, q0, zeros, zeros, zeros, q0)
    state, recs = jax.lax.scan(step, state0, None, length=n_ticks)
    return state[0], recs


def chunked_rollout(carry_b, q0_b, obs_b, cfg: MPCParams, n_ticks: int,
                    chunk: int = 128):
    """Closed-loop rollout of an arbitrarily large fleet in fixed-width
    chunks.

    On tunnel-attached TPUs, compile time grows with buffer sizes, so one
    compiled 128-wide program (sequentially mapped over chunks with
    ``lax.map``) scales to any fleet size with bounded compile cost —
    BASELINE config 4 ("batch-1024 randomized scenes").

    The leading batch axis must be divisible by ``chunk``.
    """
    bsz = jax.tree.leaves(q0_b)[0].shape[0]
    if bsz % chunk:
        raise ValueError(f"batch {bsz} not divisible by chunk {chunk}")
    k = bsz // chunk

    reshape = lambda x: jnp.reshape(jnp.asarray(x), (k, chunk) + x.shape[1:])
    carry_c = jax.tree.map(reshape, carry_b)
    obs_c = jax.tree.map(reshape, obs_b)
    q0_c = reshape(jnp.asarray(q0_b))

    def run_chunk(args):
        c, q, o = args
        return jax.vmap(
            lambda cc, qq, oo: closed_loop_rollout(cc, qq, oo, cfg, n_ticks)
        )(c, q, o)

    final_c, recs_c = jax.lax.map(run_chunk, (carry_c, q0_c, obs_c))
    unshape = lambda x: jnp.reshape(x, (bsz,) + x.shape[2:])
    return jax.tree.map(unshape, final_c), jax.tree.map(unshape, recs_c)
