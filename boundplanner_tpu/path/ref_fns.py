"""Reference projection and error decomposition along the path.

Pure-JAX transcription of the reference's dual numeric/symbolic functions
(`bound_planner/BoundMPC/bound_mpc_functions.py:85-424` and
`mpc_utils_casadi.py:6-92`): in JAX one traced function serves both the
optimizer (differentiated) and telemetry (evaluated), replacing the
``isinstance(np.ndarray)`` branching and nested CasADi ``if_else`` chains
with gathers over the segment axis.

Conventions (all per single horizon step; ``vmap`` over the horizon):
- ``win``: the path window dict from ``path.reference_path.path_window``
  extended with projection vectors v1/v2/v3 (computed per tick).
- ``split_idx``: (nr_segs+1,) int array assigning horizon steps to window
  segments (ref `BoundMPC.py:126`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_index(idx, split_idx, nr_segs: int):
    """Active window segment for horizon step ``idx``
    (ref `bound_mpc_functions.py:49-63`): counts split thresholds passed."""
    return jnp.sum(
        (idx > split_idx[1 : nr_segs - 1]).astype(jnp.int32), dtype=jnp.int32
    )


def terminal_segment_index(split_idx, n_horizon, nr_segs: int):
    """Index of the first window segment that is *not* active inside the
    horizon (ref `bound_mpc_functions.py:163-182,304-314`)."""
    j = nr_segs - 1
    for i in range(nr_segs - 2, 0, -1):
        j = jnp.where(split_idx[i] == n_horizon, i, j)
    return j


def reference_function(win, split_idx, idx, p, v, n_horizon: int, nr_segs: int):
    """Pose reference at horizon step ``idx``
    (ref `bound_mpc_functions.py:85-253`). ``p``/``v`` are the 6-dim pose
    (position + integrated omega) and twist at that step."""
    s = segment_index(idx, split_idx, nr_segs)
    sn = s + 1

    p_ref = win["p_ref"]          # (S, 6)
    dp_ref = win["dp_ref"]        # (S, 6)
    phi_switch = win["phi_switch"]  # (S+1,)

    dp_d = dp_ref[s]
    dp_dn = dp_ref[sn]
    p_ref_c = p_ref[s]
    p_ref_n = p_ref[sn]
    phi_start = phi_switch[s]

    phi_loc = jnp.dot(p[:3] - p_ref_c[:3], dp_d[:3])
    phi_next_loc = jnp.dot(p[:3] - p_ref_n[:3], dp_dn[:3])
    dphi = jnp.dot(v[:3], dp_d[:3])

    p_d = jnp.concatenate(
        [p_ref_c[:3] + dp_d[:3] * phi_loc, p_ref_c[3:] + dp_d[3:] * phi_loc]
    )
    p_dr_next = p_ref_n[3:] + dp_dn[3:] * phi_next_loc
    phi = phi_loc + phi_start

    e_r_bound = win["e_r_bound"]  # (S, 6)
    # terminal-next selection (symbolic-branch semantics,
    # `bound_mpc_functions.py:176-182`)
    j = terminal_segment_index(split_idx, n_horizon, nr_segs)

    out = {
        "p_d": p_d,
        "p_dr_next": p_dr_next,
        "p_r_omega0": p_ref_c[3:],
        "dp_d": dp_d,
        "ddp_d": jnp.zeros_like(dp_d),
        "bp1_current": win["bp1"][s],
        "bp2_current": win["bp2"][s],
        "br1_current": win["br1"][s],
        "br2_current": win["br2"][s],
        "br1_next": win["br1"][sn],
        "br2_next": win["br2"][sn],
        "dp_normed_d": win["dp_normed"][s],
        "dp_normed_n": win["dp_normed"][sn],
        "v1_current": win["v1"][s],
        "v2_current": win["v2"][s],
        "v3_current": win["v3"][s],
        "v1_next": win["v1"][sn],
        "v2_next": win["v2"][sn],
        "v3_next": win["v3"][sn],
        "r_bound_lower": e_r_bound[s][3:],
        "r_bound_upper": e_r_bound[s][:3],
        "r_bound_lower_next": e_r_bound[sn][3:],
        "r_bound_upper_next": e_r_bound[sn][:3],
        "a_current": win["a_set"][s],
        "b_current": win["b_set"][s],
        "a_next": win["a_set"][j],
        "b_next": win["b_set"][j],
        "phi_end_seg": phi_switch[j],
        "phi": phi,
        "dphi": dphi,
        "phi_switchk": phi_start,
        "seg": s,
        "seg_next_term": j,
    }
    return out


def compute_position_error(p3, v3, p_d3, dp_d3, dphi):
    """Position error split parallel/orthogonal to the path
    (ref `mpc_utils_casadi.py:25-70`, with ddp_desired = 0)."""
    e = p3 - p_d3
    e_par = jnp.dot(dp_d3, e) * dp_d3
    e_orth = e - e_par
    de = v3 - dp_d3 * dphi
    de_par = jnp.dot(dp_d3, de) * dp_d3
    de_orth = de - de_par
    return e_par, e_orth, de_par, de_orth, e, de


def error_function(
    ref,
    params,
    split_idx,
    idx,
    p,
    v,
    i_omega_0,
    n_horizon: int,
    nr_segs: int,
):
    """Decomposed pose errors at one horizon step
    (ref `bound_mpc_functions.py:256-390`).

    ``params`` carries dtau_init* (nr_segs,3), jac_dtau_l/r (3,3),
    i_omega_ref_0 (3,).
    """
    s = segment_index(idx, split_idx, nr_segs)
    sn = s + 1
    j = ref["seg_next_term"]

    e_p_par, e_p_orth, de_p_par, de_p_orth, e_p, de_p = compute_position_error(
        p[:3], v[:3], ref["p_d"][:3], ref["dp_d"][:3], ref["dphi"]
    )

    i_w_ref_0 = jnp.where(
        idx <= split_idx[1], params["i_omega_ref_0"], ref["p_r_omega0"]
    )

    jac_l = params["jac_dtau_l"]
    jac_r = params["jac_dtau_r"]
    e_init = params["dtau_init"][s]
    e_initn = params["dtau_init"][j]

    # Lie-algebra error integration (ref `mpc_utils_casadi.py:6-14`)
    dw = jac_l @ (p[3:] - i_omega_0)
    e_r = e_init + dw - jac_r @ (ref["p_d"][3:] - i_w_ref_0)
    e_rn = e_initn + dw - jac_r @ (ref["p_dr_next"] - i_w_ref_0)
    de_r = jac_l @ v[3:] - jac_r @ (ref["dp_d"][3:] * ref["dphi"])

    # project onto the dual projection vectors (ref `:339-353`)
    d = e_r - e_init
    dn = e_rn - e_initn
    e_r_orth1 = params["dtau_init_orth1"][s] + jnp.dot(d, ref["v1_current"]) * ref["br1_current"]
    e_r_par = params["dtau_init_par"][s] + jnp.dot(d, ref["v2_current"]) * ref["dp_normed_d"]
    e_r_orth2 = params["dtau_init_orth2"][s] + jnp.dot(d, ref["v3_current"]) * ref["br2_current"]
    e_r_orth1n = params["dtau_init_orth1"][sn] + jnp.dot(dn, ref["v1_next"]) * ref["br1_next"]
    e_r_parn = params["dtau_init_par"][sn] + jnp.dot(dn, ref["v2_next"]) * ref["dp_normed_n"]
    e_r_orth2n = params["dtau_init_orth2"][sn] + jnp.dot(dn, ref["v3_next"]) * ref["br2_next"]

    return {
        "e_p_par": e_p_par,
        "e_p_orth": e_p_orth,
        "de_p_par": de_p_par,
        "de_p_orth": de_p_orth,
        "e_p": e_p,
        "de_p": de_p,
        "e_r": e_r,
        "de_r": de_r,
        "e_r_par": e_r_par,
        "e_r_orth1": e_r_orth1,
        "e_r_orth2": e_r_orth2,
        "e_r_parn": e_r_parn,
        "e_r_orth1n": e_r_orth1n,
        "e_r_orth2n": e_r_orth2n,
    }


def approx_one_norm(x, alpha=0.1):
    """Smooth |x| (ref `bound_mpc_functions.py:427-428`)."""
    return jnp.sqrt(jnp.sum(x * x) + alpha**2) - alpha


def decompose_orthogonal_error(e_orth, v1, v2):
    """Coordinates of an orthogonal error in the (v1, v2) plane
    (ref `mpc_utils_casadi.py:73-92`)."""
    return jnp.stack([jnp.dot(e_orth, v1), jnp.dot(e_orth, v2)])
