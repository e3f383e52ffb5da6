"""Per-tick MPC parameter preparation (pure JAX).

Covers the pre-solve work of the reference ``BoundMPC.step``
(`bound_planner/BoundMPC/BoundMPC.py:388-542`): initial orientation errors
per segment, orientation projection vectors, desired-phi shaping, per-link
collision sets, and parameter assembly. Everything here is jit/vmap-safe
and runs inside the fused MPC tick.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils import so3
from ..robot import kinematics as kin
from ..robot.model import COL_JOINT_SIZES, ocp_limits  # noqa: F401
from ..config import NUM_LINK_SETS
from ..planner.set_finder import ObstacleArrays, find_set_line


def integrate_rotation_reference(pr_ref, omega, phi0, phi1):
    """Rotate the reference rotvec by omega over [phi0, phi1]
    (ref `bound_mpc_functions.py:16-27`)."""
    r0 = so3.rotvec_to_matrix(pr_ref)
    on = jnp.linalg.norm(omega)
    axis = omega / jnp.maximum(on, 1e-12)
    dr = so3.rodrigues(axis, (phi1 - phi0) * on)
    r1 = jnp.where(on > 1e-4, dr @ r0, r0)
    return so3.matrix_to_rotvec(r1)


def compute_initial_rot_errors(pr, pr_ref, dp_normed, br1, br2):
    """Initial Lie-algebra orientation error and its zyx-Euler decomposition
    in the (br2, path, br1) frame (ref `bound_mpc_functions.py:30-46`)."""
    tauc = so3.rotvec_to_matrix(pr)
    taud = so3.rotvec_to_matrix(pr_ref)
    dtau_init = so3.matrix_to_rotvec(tauc @ taud.T)

    r01 = jnp.stack([br2, dp_normed, br1], axis=1)  # columns
    dtau_01 = r01.T @ so3.rotvec_to_matrix(dtau_init) @ r01
    eul = so3.matrix_to_euler_zyx(dtau_01)
    return (
        dtau_init,
        eul[1] * dp_normed,   # parallel component
        eul[0] * br1,         # orth1
        eul[2] * br2,         # orth2
    )


def orientation_projection_vectors(dtau_init, dtau_par, dtau_orth1, dtau_orth2, dp_normed, br1, br2):
    """Dual-basis projection vectors v1/v2/v3 and the SO(3) inverse Jacobians
    (ref `BoundMPC.compute_orientation_projection_vectors`,
    `BoundMPC.py:338-386`). All (nr_segs, 3) arrays; returns v1, v2, v3
    (nr_segs, 3) and jac_l, jac_r (3, 3)."""
    jac_r = so3.jac_so3_inv_right(dtau_init[0])
    jac_l = so3.jac_so3_inv_left(dtau_init[0])
    r_dtau0 = so3.rotvec_to_matrix(dtau_init[0])

    def one(seg_par, seg_orth1, seg_orth2, dpn, b1, b2):
        rest1 = r_dtau0 @ so3.rotvec_to_matrix(seg_orth1).T
        rest2 = rest1 @ so3.rotvec_to_matrix(seg_par).T
        jac_r1 = so3.jac_so3_inv_right(so3.matrix_to_rotvec(rest1))
        jac_r2 = so3.jac_so3_inv_right(so3.matrix_to_rotvec(rest2))
        w1 = jac_r @ b1
        w2 = jac_r1 @ dpn
        w3 = jac_r2 @ b2
        m = jnp.stack([w1, w2, w3], axis=1)            # (3, 3) columns
        gram = m.T @ m
        dual = m @ jnp.linalg.inv(gram)                # dual basis columns
        return dual[:, 0], dual[:, 1], dual[:, 2]

    v1, v2, v3 = jax.vmap(one)(dtau_par, dtau_orth1, dtau_orth2, dp_normed, br1, br2)
    return v1, v2, v3, jac_l, jac_r


def link_collision_sets(q0, qf, obs: ObstacleArrays, e_max=0.7, robot="iiwa14"):
    """Per-tick convex sets around each link's motion segment
    (ref `BoundMPC.py:480-498`): 6 sets, all rows shrunk by the link sphere
    radius. ``robot`` selects chain + sphere radii (ref `RobotModel.py:36-39`)."""
    chain = kin.chain_by_name(robot)
    _, _, _, col_sizes = ocp_limits(robot)
    p0s = kin.fk_pos_col_all(q0, chain)[:NUM_LINK_SETS]
    p1s = kin.fk_pos_col_all(qf, chain)[:NUM_LINK_SETS]
    dtype = q0.dtype
    sizes = jnp.asarray(col_sizes[:NUM_LINK_SETS], dtype)
    ws = jnp.zeros(3, dtype)  # unused when limit_space=True

    def one(p0, p1, size):
        a, b, _ = find_set_line(p0, p1, obs, e_max, ws, ws, limit_space=True)
        return a, b - size

    a_j, b_j = jax.vmap(one)(p0s, p1s, sizes)
    return a_j, b_j


def shape_phi_weights(weights, phi_max, phi_current):
    """Desired-phi weight scaling and long-trajectory clamping
    (ref `BoundMPC.py:464-478`)."""
    x_phi_d0 = phi_max
    scaling = 1.0 / jnp.maximum((phi_max - phi_current) ** 2, 1e-12)
    scaling = jnp.minimum(scaling, 2.0)
    apply = (x_phi_d0 < 1.0) & (phi_max > 0.001)
    w4 = jnp.where(apply, weights[4] * scaling, weights[4])
    weights = weights.at[4].set(w4)

    phi_max_c = jnp.minimum(phi_current + 5.0, phi_max)
    x_phi_d = jnp.stack(
        [jnp.minimum(phi_current + 5.0, x_phi_d0), jnp.zeros_like(phi_max), jnp.zeros_like(phi_max)]
    )
    return weights, x_phi_d, phi_max_c
