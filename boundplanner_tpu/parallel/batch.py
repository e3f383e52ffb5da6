"""Scenario batching: thousands of planner+MPC rollouts per step.

The reference is a single-process single-robot CPU program (SURVEY.md
§2.3); the TPU build's parallelism is *new design*: the fused MPC tick
(`mpc.bound_mpc.mpc_tick`) is a pure function of (carry, measurement,
obstacles), so a fleet of scenes is one ``vmap`` and a whole closed-loop
simulation is one ``lax.scan`` — no host round-trips inside the loop.
"""

from __future__ import annotations

import dataclasses
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


def _plant_measurement(q, dq, ddq, jerk, qf, dtype, robot="iiwa14"):
    chain = kin.chain_by_name(robot)
    pose = kin.fk_pose(q, chain)
    jac = kin.jacobian_fk(q, chain)
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
        meas = _plant_measurement(q, dq, ddq, jerk, qf, dtype, cfg.robot)
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


def _escalate_failed_lanes(carry_in, meas, obs, carry_n, out,
                           cfg: MPCParams, tick_fn=None, eligible=None):
    """Budget escalation on failing ticks (VERDICT r3 next-#3).

    The perf iteration budget (sqp 3 / qp 5) leaves ~1% of fleet ticks
    infeasible; `tests/test_external_anchor.py` proved those ticks are
    iteration-budget misses the SAME solver closes at sqp 6 / qp 8
    (matching SLSQP's optimum). The reference absorbs them with Ipopt's
    max_iter=100 (`BoundMPC.py:203-206`); a batch-wide budget raise would
    cost every lane 2-3x. TPU-native re-design: compact the (rare)
    failing lanes into a fixed `esc_lanes`-wide sub-batch, re-run the
    FULL tick for just those lanes at the escalated budget, and scatter
    the retried (carry, outputs) back — all under a real `lax.cond` at
    batch level (NOT per-lane `cond`-under-vmap, which XLA lowers to
    select and would pay the escalated solve for every lane every tick).

    Correctness: the retry recomputes `mpc_tick` from the identical
    pre-tick carry, so a retry that ALSO fails reproduces the base tick's
    fallback semantics exactly (same error_count, same shifted horizon) —
    scattering it back is a no-op by value. Out-of-capacity failures
    (more than esc_lanes in one tick) keep their base fallback outputs.
    Gather indices for the fill positions point out of bounds and the
    scatters use mode="drop", so no lane is written twice.
    """
    k = min(cfg.esc_lanes, out["success"].shape[0])
    if tick_fn is None:
        # esc_pallas picks the retry's KKT route: the Pallas kernel pads
        # its lane axis to 128 (a k-lane retry pays full-width
        # factorization towers); the masked-loop Cholesky tiles the tiny
        # sub-batch at 8 sublanes. A/B on the TPU in ROUND4_NOTES.
        cfg_esc = dataclasses.replace(
            cfg, sqp_iters=cfg.esc_sqp_iters, qp_iters=cfg.esc_qp_iters,
            esc_lanes=0, pallas_kkt=cfg.esc_pallas and cfg.pallas_kkt,
        )
        tick_fn = lambda c, m, o: mpc_tick(c, m, o, cfg_esc)
    fail = ~out["success"]
    if eligible is not None:
        fail = fail & eligible
    batch = fail.shape[0]

    def retry(carry_n, out):
        # first k failing lanes; fill positions get index == batch (OOB)
        idx = jnp.nonzero(fail, size=k, fill_value=batch)[0]
        gidx = jnp.minimum(idx, batch - 1)
        take = lambda x: x[gidx]
        sub_c = jax.tree.map(take, carry_in)
        sub_m = jax.tree.map(take, meas)
        sub_o = jax.tree.map(take, obs)
        sub_cn, sub_out = jax.vmap(tick_fn)(sub_c, sub_m, sub_o)
        # OOB (fill) updates are dropped; real indices are unique
        scat = lambda full, sub: full.at[idx].set(sub, mode="drop")
        return (
            jax.tree.map(scat, carry_n, sub_cn),
            jax.tree.map(scat, out, sub_out),
        )

    return jax.lax.cond(
        jnp.any(fail), retry, lambda c, o: (c, o), carry_n, out
    )


@functools.partial(jax.jit, static_argnames=("cfg", "n_ticks"))
def fleet_rollout(carry_b, q0_b, obs_b, cfg: MPCParams, n_ticks: int):
    """Batched closed-loop rollout with the batch axis INSIDE the scan.

    Semantically `vmap(closed_loop_rollout)` (scan-of-vmap == vmap-of-scan
    for this pure tick), but the batch-level scan body is where the
    failing-lane budget escalation lives: `lax.cond` stays a real branch
    here, whereas under an outer vmap it would lower to a select and
    always pay both sides. Use this (not vmap(closed_loop_rollout)) for
    any rollout that may run with ``cfg.esc_lanes > 0``.
    """
    dtype = q0_b.dtype
    zeros = jnp.zeros_like(q0_b)
    batch = q0_b.shape[0]

    def step(state, _):
        carry, q, dq, ddq, jerk, qf, streak = state
        meas = jax.vmap(
            lambda *a: _plant_measurement(*a, dtype, cfg.robot)
        )(q, dq, ddq, jerk, qf)
        carry_n, out = jax.vmap(
            lambda c, m, o: mpc_tick(c, m, o, cfg)
        )(carry, meas, obs_b)
        if cfg.esc_lanes > 0:
            # retry only lanes whose failure streak is still short: a
            # STRUCTURALLY infeasible scene (e.g. slack-active in a tight
            # corridor — insensitive to iterations, README "hard fleet")
            # fails every tick and would otherwise fire the retry branch
            # for the whole rollout; budget misses are fresh failures and
            # always qualify. The streak lives in the ROLLOUT state, not
            # MPCCarry (cached fleet pickles must keep loading).
            carry_n, out = _escalate_failed_lanes(
                carry, meas, obs_b, carry_n, out, cfg,
                eligible=streak < cfg.esc_streak_limit,
            )
        streak = jnp.where(out["success"], 0, streak + 1)
        u0 = out["dddq"][:, 0]
        u1 = out["dddq"][:, 1]
        q_n, dq_n, ddq_n = integrate_jerk_step(q, dq, ddq, u0, u1, cfg.dt)
        qf_n = out["q"][:, -1]
        record = {
            "phi": out["phi"][:, 1],
            "q": q_n,
            "p": meas["p0"],
            "success": out["success"],
            "viol": out["viol"],
        }
        return (carry_n, q_n, dq_n, ddq_n, u1, qf_n, streak), record

    state0 = (carry_b, q0_b, zeros, zeros, zeros, q0_b,
              jnp.zeros(batch, jnp.int32))
    state, recs = jax.lax.scan(step, state0, None, length=n_ticks)
    # records come out time-major (n_ticks, batch, ...); match the
    # vmap(closed_loop_rollout) layout (batch, n_ticks, ...)
    recs = jax.tree.map(lambda x: jnp.swapaxes(x, 0, 1), recs)
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
        return fleet_rollout(c, q, o, cfg, n_ticks)

    final_c, recs_c = jax.lax.map(run_chunk, (carry_c, q0_c, obs_c))
    unshape = lambda x: jnp.reshape(x, (bsz,) + x.shape[2:])
    return jax.tree.map(unshape, final_c), jax.tree.map(unshape, recs_c)
