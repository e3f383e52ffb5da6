"""Global convex-set path planner.

Re-design of `bound_planner/BoundPlanner/BoundPlanner.py:26-896` for TPU:
the irregular parts (growing a graph of convex sets, Dijkstra over the
intersection graph, rejection sampling) stay host-side numpy/networkx
orchestration, while every numeric leaf runs as a batched device kernel:

- set growth              -> `set_finder.find_set_around_point` / `find_set_line`
- intersection testing    -> `ops.qp.solve_feasibility` (replaces HiGHS linprog)
- EE-fit probing          -> `via_opt.fit_ee_in_set` (20 rotation samples in
                             one vmap; replaces 20 sequential qpOASES solves)
- edge-cost projections   -> `ops.qp.solve_projection`
- via-point rotation NLP  -> `via_opt.solve_via_rot` (replaces Ipopt)
- H-rep redundancy removal-> `utils.sets.reduce_ineqs` (native geom core /
                             numpy; replaces cddlib)

Fidelity notes: the reference always ends up calling its around-point set
search with ``fixed_mid`` truthy due to a tuple bug (`BoundPlanner.py:494`
creates a non-empty tuple); we use ``fixed_mid=True`` for sampled seeds,
which is the de-facto reference behavior. The replanning backward-extension
LP (`BoundPlanner.py:713-718`) is one-dimensional and solved in closed form.
"""

from __future__ import annotations

import copy
import time
from typing import List, Optional, Sequence

import networkx as nx
import numpy as np
from scipy.spatial.transform import Rotation as SciRotation

import jax.numpy as jnp

from ..config import PlannerParams, MPC_SET_ROWS
from ..ops.qp import solve_feasibility, solve_projection
from ..utils.sets import make_box, box_vertices, normalize_set_size, reduce_ineqs
from .set_finder import (
    MAX_OBS,
    ObstacleArrays,
    build_obstacle_arrays,
    find_set_around_point,
    find_set_line,
)
from .via_opt import fit_ee_in_set, solve_via_rot

FIT_ROWS = 48  # padded row count for intersection-set device problems


def _pad(a, b, rows):
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64).reshape(-1)
    m = a.shape[0]
    if m > rows:
        # keep the tightest rows (smallest b after normalization); reference
        # would print an error (`util_functions.py:130-132`)
        order = np.argsort(b)[:rows]
        a, b, m = a[order], b[order], rows
    a_p = np.zeros((rows, 3))
    b_p = 10.0 * np.ones(rows)
    a_p[:m] = a
    b_p[:m] = b
    return a_p, b_p


def _strip(a, b, tol=9.0):
    """Remove inactive padded rows."""
    a = np.asarray(a)
    b = np.asarray(b)
    keep = (b < tol) & (np.linalg.norm(a, axis=1) > 1e-8)
    return a[keep], b[keep]


def _rodrigues_np(axis, angle):
    return SciRotation.from_rotvec(np.asarray(axis) * angle).as_matrix()


class BoundPlanner:
    def __init__(
        self,
        obstacles: Sequence[Sequence[float]] = (),
        e_p_max: float = 0.5,
        obs_size_increase: float = 0.08,
        workspace_max=(1.0, 1.0, 1.2),
        workspace_min=(-1.0, -1.0, 0.0),
        seed: Optional[int] = None,
        verbose: bool = False,
        broker=None,
    ):
        # optional `parallel.broker.BatchBroker` (duck-typed): when set,
        # the device-kernel wrappers below coalesce with other scenes'
        # planners into shared vmapped calls (see
        # `parallel.broker.register_planner_kernels`)
        self.broker = broker
        self.params = PlannerParams(
            e_p_max=e_p_max,
            obs_size_increase=obs_size_increase,
            workspace_max=tuple(workspace_max),
            workspace_min=tuple(workspace_min),
        )
        self.verbose = verbose
        self.rng = np.random.default_rng(seed)
        self.max_set_size = self.params.max_set_size
        self.ws_min = jnp.asarray(np.asarray(workspace_min, dtype=np.float64))
        self.ws_max = jnp.asarray(np.asarray(workspace_max, dtype=np.float64))
        self.sets_via_prev: List = []
        self.replanning = False
        self.replanning_phi = 0.0

        # timing accumulators (ref `BoundPlanner.py:40-46`)
        self.comp_time_set = 0.0
        self.comp_time_edge = 0.0
        self.comp_time_fit = 0.0
        self.comp_time_graph = 0.0
        self.comp_time_path = 0.0
        self.comp_time_via = 0.0
        self.comp_time_total = 0.0

        self.obstacles: List[List[float]] = []
        self.obs_sets: List = []          # expanded, padded [A,b]
        self.obs_sets_orig: List = []
        self.obs_points_sets: List[np.ndarray] = []
        self.add_obstacle_reps(obstacles)

    # ------------------------------------------------------------------
    def _log(self, *args):
        if self.verbose:
            print(*args)

    def add_obstacle_reps(self, obstacles, update=False, reset=False):
        """(ref `BoundPlanner.py:131-152`)."""
        if reset:
            self.obstacles = []
            self.obs_sets = []
            self.obs_sets_orig = []
            self.obs_points_sets = []
        inc = self.params.obs_size_increase
        for ob in obstacles:
            self.obstacles.append(list(ob))
            lb, ub = np.asarray(ob[:3], float), np.asarray(ob[3:], float)
            a, b = make_box(lb, ub)
            self.obs_sets_orig.append([a, b])
            self.obs_sets.append(list(_pad(a, b + inc, MPC_SET_ROWS)))
            self.obs_points_sets.append(box_vertices(lb - inc, ub + inc))
        self.obs_arrays = build_obstacle_arrays(self.obstacles, inc)

    # ------------------------------------------------------------------
    # device-kernel wrappers (numpy in / numpy out)

    def _find_set_around_point(self, p_seed, fixed_mid=False):
        if self.broker is not None:
            a, b, shape, center, ok = self.broker.call(
                "fsap_mid" if fixed_mid else "fsap",
                np.asarray(p_seed, float), self.obs_arrays,
                self.ws_min, self.ws_max,
            )
            return (np.asarray(a), np.asarray(b), np.asarray(shape),
                    np.asarray(center), bool(ok))
        a, b, shape, center, ok = find_set_around_point(
            jnp.asarray(np.asarray(p_seed, float)),
            self.obs_arrays,
            self.ws_min,
            self.ws_max,
            fixed_mid=fixed_mid,
            n_rows=self.max_set_size,
        )
        return (
            np.asarray(a),
            np.asarray(b),
            np.asarray(shape),
            np.asarray(center),
            bool(ok),
        )

    def _find_set_line(self, p0, p1, compute_ellipsoid=False):
        if self.broker is not None:
            a, b, coll = self.broker.call(
                "fsl", np.asarray(p0, float), np.asarray(p1, float),
                self.obs_arrays, self.ws_min, self.ws_max,
            )
            a, b = np.asarray(a), np.asarray(b)
        else:
            a, b, coll = find_set_line(
                jnp.asarray(np.asarray(p0, float)),
                jnp.asarray(np.asarray(p1, float)),
                self.obs_arrays,
                0.0,
                self.ws_min,
                self.ws_max,
                limit_space=False,
                n_rows=self.max_set_size,
            )
            a, b = np.asarray(a), np.asarray(b)
        if compute_ellipsoid:
            from ..ops.mvie import mvie

            if self.broker is not None:
                res = self.broker.call("mvie", a, b)
            else:
                res = mvie(jnp.asarray(a), jnp.asarray(b))
            return a, b, np.asarray(res.shape), np.asarray(res.center), bool(coll)
        return a, b, bool(coll)

    def set_intersection(self, set1, set2, tol=0.0):
        """Feasibility of the intersection (ref `BoundPlanner.py:774-787`,
        scipy linprog replaced by the device phase-1 QP)."""
        a = np.concatenate([set1[0], set2[0]])
        b = np.concatenate([set1[1], set2[1]])
        a_p, b_p = _pad(a, b - tol, FIT_ROWS)
        if self.broker is not None:
            x, t, _ = self.broker.call("feas", a_p, b_p)
        else:
            x, t, _ = solve_feasibility(jnp.asarray(a_p), jnp.asarray(b_p))
        success = bool(t < 1e-7)
        return np.asarray(x), [a, b], success

    def check_intersection(self, a_set, b_set, l_ee, sample):
        """EE fits in the set for one of 20 rotation samples
        (ref `BoundPlanner.py:745-772`)."""
        a_p, b_p = _pad(a_set, b_set - 0.001, FIT_ROWS)
        if self.broker is not None:
            fits, omega, p_in = self.broker.call(
                "fit_ee", a_p, b_p, np.asarray(l_ee, float),
                np.asarray(self.omega_normed), np.asarray(self.omega_norm),
                np.asarray(sample, float),
            )
        else:
            fits, omega, p_in = fit_ee_in_set(
                jnp.asarray(a_p),
                jnp.asarray(b_p),
                jnp.asarray(l_ee),
                jnp.asarray(self.omega_normed),
                jnp.asarray(self.omega_norm),
                jnp.asarray(np.asarray(sample, float)),
            )
        p_via = np.concatenate((np.asarray(sample, float), [float(omega)]))
        if bool(fits):
            p_via = np.concatenate((np.asarray(sample, float), [float(omega)]))
        return bool(fits), p_via

    def _project_into(self, a, b, target, x0=None):
        a_p, b_p = _pad(a, b, FIT_ROWS)
        if self.broker is not None:
            sol = self.broker.call("proj", a_p, b_p, np.asarray(target, float))
            return np.asarray(sol.x)
        sol = solve_projection(
            jnp.asarray(a_p), jnp.asarray(b_p), jnp.asarray(np.asarray(target, float))
        )
        return np.asarray(sol.x)

    # ------------------------------------------------------------------
    def add_edges(self, id_new, graph, inter_graph, end, start):
        """(ref `BoundPlanner.py:789-896`)."""
        connected = False
        set_new = graph.nodes[id_new]["cset"]
        for vertex in list(graph.nodes.items()):
            if vertex[0] != id_new:
                setc = vertex[1]["cset"]
                idc = vertex[0]
                p_intersect, set_inter, intersects = self.set_intersection(
                    setc, set_new, tol=0.01
                )
            else:
                intersects = False
            if not intersects:
                continue

            t0 = time.perf_counter()
            fits, via = self.check_intersection(
                set_inter[0], set_inter[1], self.l_ee, p_intersect
            )
            self.comp_time_fit += time.perf_counter() - t0

            self.id_inter += 1
            inter_graph.add_node(
                self.id_inter,
                cset=set_inter,
                name=f"Interset {self.id_inter}",
                id0=idc,
                id1=id_new,
                set0=setc,
                set1=set_new,
                conn_to_start=False,
                conn_to_end=False,
                p_proj=None,
                p_via=via,
            )
            for edge in list(inter_graph.nodes.items()):
                v0, v1 = edge[1]["id0"], edge[1]["id1"]
                cond1 = v0 == vertex[0] or v1 == vertex[0]
                cond2 = v0 == id_new or v1 == id_new
                if cond1:
                    size = vertex[1]["size"]
                elif cond2:
                    size = graph.nodes[id_new]["size"]
                if self.id_inter != edge[0] and (cond1 or cond2):
                    p_proj = edge[1]["p_proj"]
                    if p_proj is None:
                        p_proj = end
                    if inter_graph.nodes[self.id_inter]["p_proj"] is None:
                        inter_graph.nodes[self.id_inter]["p_proj"] = self._project_into(
                            set_inter[0], set_inter[1], p_proj
                        )
                    dist = np.linalg.norm(
                        inter_graph.nodes[self.id_inter]["p_proj"] - p_proj
                    )
                    conn_to_start = (
                        inter_graph.nodes[self.id_inter]["conn_to_start"]
                        or edge[1]["conn_to_start"]
                    )
                    conn_to_end = (
                        inter_graph.nodes[self.id_inter]["conn_to_end"]
                        or edge[1]["conn_to_end"]
                    )
                    inter_graph.nodes[self.id_inter]["conn_to_start"] = conn_to_start
                    inter_graph.nodes[self.id_inter]["conn_to_end"] = conn_to_end
                    edge[1]["conn_to_start"] = conn_to_start
                    edge[1]["conn_to_end"] = conn_to_end
                    connected = conn_to_start and conn_to_end

                    c_size = np.tanh(0.25 - np.cbrt(size))
                    cost = dist * (1 + self.params.w_size * c_size) + self.params.w_bias
                    if not fits:
                        cost += self.params.c_fit
                    inter_graph.add_edge(self.id_inter, edge[0], weight=cost)
        return connected

    # ------------------------------------------------------------------
    def compute_via_points(
        self, path, start, end, graph, inter_graph, with_rot=False, p_via_guess=None
    ):
        """(ref `BoundPlanner.py:586-743`)."""
        x0 = np.empty(0)
        sets_inter = []
        for edge in path[1:-1]:
            cset = inter_graph.nodes[edge]["cset"]
            a = np.asarray(cset[0]).copy()
            b = np.asarray(cset[1]).copy()
            idx = np.linalg.norm(a, axis=1) > 1e-4
            b[idx] -= 0.001
            sets_inter.append([a, b])
            x0 = np.concatenate((x0, inter_graph.nodes[edge]["p_proj"], [0.5]))

        sets = []
        q_ellipse = []
        p_mid = []
        w_size_via = []
        last_id = None
        for i in range(len(path)):
            node = inter_graph.nodes[path[i]]
            if i == 0:
                a_set, b_set = node["cset"]
                last_id = node["id0"]
                w_size_via.append(graph.nodes[last_id]["size"])
                q_ellipse.append(graph.nodes[last_id]["q_ellipse"])
                p_mid.append(graph.nodes[last_id]["p_mid"])
            else:
                id0, id1 = node["id0"], node["id1"]
                nid = id0 if id0 != last_id else id1
                if nid != last_id:
                    a_set, b_set = graph.nodes[nid]["cset"]
                    w_size_via.append(graph.nodes[nid]["size"])
                    q_ellipse.append(graph.nodes[nid]["q_ellipse"])
                    p_mid.append(graph.nodes[nid]["p_mid"])
                    last_id = nid
            sets.append([np.asarray(a_set), np.asarray(b_set)])
        w_size_via = 1 - np.cbrt(np.asarray(w_size_via, dtype=float))

        nr_via = len(sets_inter)
        sol_x = None
        # The rotation NLP packs exactly nr_via+1 via sets / size weights
        # (the reference's fixed parameter layout assumes the same,
        # `BoundPlanner.py:651-667`). Rare graph paths produce an extra
        # set change at the terminal node; fall back to projection-based
        # via points there instead of mis-packing (the reference would
        # silently corrupt its parameter vector).
        if len(w_size_via) != nr_via + 1:
            self._log(
                f"(PosOpt) irregular set chain ({len(w_size_via)} sizes for "
                f"{nr_via} intersections); skipping rot NLP"
            )
            with_rot = False
        if with_rot and nr_via > 0:
            a_i = np.stack([_pad(s[0], s[1], FIT_ROWS)[0] for s in sets_inter])
            b_i = np.stack([_pad(s[0], s[1], FIT_ROWS)[1] for s in sets_inter])
            a_v = np.stack([_pad(s[0], s[1], FIT_ROWS)[0] for s in sets])
            b_v = np.stack([_pad(s[0], s[1], FIT_ROWS)[1] for s in sets])
            res = solve_via_rot(
                jnp.asarray(x0),
                jnp.asarray(np.asarray(start, float)),
                jnp.asarray(np.asarray(end, float)),
                jnp.asarray(self.l_ee),
                jnp.asarray(self.omega_normed),
                jnp.asarray(self.omega_norm),
                jnp.asarray(np.asarray(w_size_via, float)),
                jnp.asarray(a_i),
                jnp.asarray(b_i),
                jnp.asarray(a_v),
                jnp.asarray(b_v),
                nr_via=nr_via,
            )
            if not bool(res.success):
                self._log(
                    f"(PosOpt) ERROR No convergence in via point rot optimization "
                    f"(viol {float(res.viol):.2e})"
                )
            else:
                self._log("(PosOpt) Found via point path with rot through graph")
            sol_x = np.asarray(res.x)

        sets_via = []
        p_via = [np.asarray(start, float)]
        omega_via = [0.0]
        for i in range(nr_via):
            if sol_x is not None:
                via_opt = sol_x[4 * i : 4 * (i + 1)]
            else:
                via_opt = x0[4 * i : 4 * (i + 1)]
            p_via_opt = via_opt[:3]
            omega_opt = float(via_opt[3])
            if np.linalg.norm(p_via_opt - p_via[-1]) > 1e-4:
                p_via.append(p_via_opt)
                omega_via.append(omega_opt)
                sets_via.append(sets[i])
            # replanning: extend the first segment backwards (ref `:706-729`)
            if self.replanning and i == 0 and len(p_via) > 1:
                a0 = np.asarray(sets_via[0][0])
                b0 = np.asarray(sets_via[0][1])
                b_trans0 = b0 - a0 @ p_via[0]
                dp0 = p_via[1] - p_via[0]
                dp0 = dp0 / np.linalg.norm(dp0)
                dp_horizon = np.asarray(self.p_horizon) - p_via[0]
                # min phi s.t. a0 (phi dp0) <= b_trans0 — 1-D closed form
                coef = a0 @ dp0
                neg = coef < -1e-12
                phi_lp = np.max(b_trans0[neg] / coef[neg]) if np.any(neg) else -np.inf
                phi_horizon = float(np.min(dp0 @ dp_horizon.T))
                phi_horizon = min(phi_horizon, -0.5)
                self.replanning_phi = max(-phi_horizon, 0.0)
                self._log(f"(Replanning) Horizon phi: {phi_horizon:.3f}")
                self._log(f"(Replanning) Linprog phi: {phi_lp:.3f}")
                if phi_horizon < phi_lp:
                    self._log("(Replanning) Horizon needs deviations")
                p_via[0] = p_via[0] - self.replanning_phi * dp0

        p_via.append(np.asarray(end, float))
        omega_via.append(1.0)
        sets_via.append(sets[-1])
        return np.array(p_via), p_via, omega_via, sets_via, q_ellipse, p_mid

    # ------------------------------------------------------------------
    def plan_convex_set_path(
        self,
        start,
        end,
        r0,
        r1,
        replanning=False,
        p_horizon=(),
        first_sample=None,
        new_obs=False,
    ):
        """(ref `BoundPlanner.py:174-584`)."""
        par = self.params
        start = np.asarray(start, float).copy()
        end = np.asarray(end, float).copy()
        t_total0 = time.perf_counter()
        self.replanning = replanning
        self.replanning_phi = 0.0
        self.p_horizon = list(p_horizon)
        sampled_first = False

        # project end point out of obstacles (ref `:199-204`)
        for ob in self.obs_sets:
            a_ob, b_ob = _strip(ob[0], ob[1])
            viol = a_ob @ end - b_ob
            if not np.any(viol > 0):
                self._log("(PosPath) Projecting end point to collision free space")
                idx = int(np.argmax(viol))
                end = end - (viol[idx] - par.obs_size_increase) * a_ob[idx]

        # rotation setup (ref `:207-219`)
        self.omega = SciRotation.from_matrix(r1 @ np.asarray(r0).T).as_rotvec()
        self.omega_norm = float(np.linalg.norm(self.omega))
        if self.omega_norm > 1e-6:
            self.omega_normed = self.omega / self.omega_norm
        else:
            self.omega_normed = np.array([0.0, 0.0, 1.0])
        self.l_ee = np.asarray(r0) @ np.array([-par.length_ee, 0, 0])
        self.l_ee_end = np.asarray(r1) @ np.array([-par.length_ee, 0, 0])

        graph = nx.Graph()
        inter_graph = nx.Graph()
        self.nr_sets = 0

        # --- start set (ref `:229-325`) ---
        t0 = time.perf_counter()
        collision = False
        if replanning and self.sets_via_prev:
            max_h = 1
            for k, s in enumerate(self.sets_via_prev):
                a_s, b_s = np.asarray(s[0]), np.asarray(s[1])
                start_in = np.max(a_s @ start - b_s) < 1e-8
                h_arr = np.asarray(self.p_horizon)
                if h_arr.size:
                    h_in = np.max(a_s @ h_arr.T - b_s[:, None], axis=0) < 1e-8
                    h_idx = np.where(~h_in)[0]
                    if start_in and h_idx.size and h_idx[0] > 0:
                        max_h = max(max_h, h_idx[0] - 1)
                    elif start_in and not h_idx.size:
                        max_h = len(self.p_horizon) - 1
                        break
            if new_obs:
                max_h = 1
            self.p_horizon_max = self.p_horizon[max_h] if self.p_horizon else start
            a_set, b_set, q_ell, p_mid0, collision = self._find_set_line(
                start, self.p_horizon_max, compute_ellipsoid=True
            )
        else:
            a_set, b_set, q_ell, p_mid0, ok = self._find_set_around_point(
                start, fixed_mid=True
            )
            a_s, b_s = _strip(a_set, b_set)
            if np.max(a_s @ (start + self.l_ee) - b_s) > 1e-8:
                a_set, b_set, q_ell, p_mid0, collision = self._find_set_line(
                    start, start + self.l_ee, compute_ellipsoid=True
                )
        if collision:
            if self.sets_via_prev:
                self._log("[WARNING] Could not find start set, reusing old end set")
                a_set = copy.deepcopy(np.asarray(self.sets_via_prev[-1][0]))
                b_set = copy.deepcopy(np.asarray(self.sets_via_prev[-1][1]))
                p_mid0 = start
                q_ell = np.eye(3)
        self.comp_time_set += time.perf_counter() - t0

        a_np, b_np = reduce_ineqs(*_strip(a_set, b_set))
        set_start = [a_np, b_np]
        self.id_inter = 0
        self.id_graph = 0
        graph.add_node(
            0,
            cset=set_start,
            name="Vertex start",
            size=float(np.linalg.det(q_ell)),
            q_ellipse=q_ell,
            p_mid=p_mid0,
            a_set=a_np,
            b_set=b_np,
        )
        inter_graph.add_node(
            0,
            cset=set_start,
            name="Vertex start",
            id0=0,
            id1=0,
            set0=set_start,
            set1=set_start,
            conn_to_start=True,
            conn_to_end=False,
            p_proj=start,
            p_via=np.concatenate((start, [0.0])),
        )
        self.nr_sets += 1
        t0 = time.perf_counter()
        connected = self.add_edges(0, graph, inter_graph, end, start)
        self.comp_time_edge += time.perf_counter() - t0

        # end point already inside the start set? (ref `:361-375`)
        if (
            np.max(a_np @ end - b_np) < 1e-8
            and np.max(a_np @ (end + self.l_ee_end) - b_np) < 1e-8
        ):
            self._log("(PosPath) End point in start set, finishing ...")
            p_via_list = [start, end]
            omega_via = [0.0, 1.0]
            r_via = [
                _rodrigues_np(self.omega_normed, self.omega_norm * x) @ np.asarray(r0)
                for x in omega_via
            ]
            bp1_list = [np.array([0.0, 0.0, 1.0])]
            sets_via = normalize_set_size([[a_np, b_np]], MPC_SET_ROWS)
            self.sets_via_prev = copy.deepcopy(sets_via)
            self.graph, self.inter_graph = graph, inter_graph
            return p_via_list, r_via, bp1_list, sets_via

        # --- end set (ref `:377-423`) ---
        t0 = time.perf_counter()
        a_set, b_set, q_ell_e, p_mid_e, collision = self._find_set_line(
            end, end + self.l_ee_end, compute_ellipsoid=True
        )
        a_np, b_np = reduce_ineqs(*_strip(a_set, b_set))
        self.comp_time_set += time.perf_counter() - t0
        set_end = [a_np, b_np]
        self.id_graph += 1
        self.id_inter += 1
        graph.add_node(
            self.id_graph,
            cset=set_end,
            name="Vertex end",
            size=float(np.linalg.det(q_ell_e)),
            q_ellipse=q_ell_e,
            p_mid=p_mid_e,
            a_set=a_np,
            b_set=b_np,
        )
        inter_graph.add_node(
            self.id_inter,
            cset=set_end,
            name="Vertex end",
            id0=self.id_graph,
            id1=self.id_graph,
            set0=set_end,
            set1=set_end,
            conn_to_start=False,
            conn_to_end=True,
            p_proj=end,
            p_via=np.concatenate((end, [1.0])),
        )
        self.nr_sets += 1
        t0 = time.perf_counter()
        connected = self.add_edges(self.id_graph, graph, inter_graph, end, start) or connected
        self.comp_time_edge += time.perf_counter() - t0

        # --- grow graph until via points converge (ref `:426-534`) ---
        t_graph0 = time.perf_counter()
        nr_samples = 0
        success = False
        p_via_old = None
        p_via_list = None
        path = None
        while not success:
            via_sample = False
            if connected:
                t0 = time.perf_counter()
                path = nx.shortest_path(inter_graph, 0, 1, weight="weight")
                self.comp_time_path += time.perf_counter() - t0
                t0 = time.perf_counter()
                p_via, p_via_list, omega_via, sets_via, _, _ = self.compute_via_points(
                    path, start, end, graph, inter_graph
                )
                self.comp_time_via += time.perf_counter() - t0
                if p_via_old is not None and p_via_old.shape == p_via.shape:
                    if np.linalg.norm(p_via_old - p_via) < 1e-4:
                        self._log("(PosPath) Found path solution")
                        success = True
                        break
                samples = p_via_list[1:-1]
                via_sample = True
                p_via_old = np.copy(p_via)
            elif not sampled_first and first_sample is not None:
                samples = [np.asarray(first_sample, float)]
            else:
                in_collision, in_safe = True, True
                nr_sampled = 0
                while (in_collision or in_safe) and nr_sampled <= par.max_samples:
                    in_collision = False
                    in_safe = False
                    sample = self.rng.uniform(par.workspace_min, par.workspace_max, 3)
                    nr_sampled += 1
                    for ob in self.obs_sets:
                        a_ob, b_ob = _strip(ob[0], ob[1])
                        if np.max(a_ob @ sample - b_ob) < 1e-3:
                            in_collision = True
                            break
                    for _, nd in graph.nodes.items():
                        if np.max(nd["a_set"] @ sample - nd["b_set"]) < 1e-3:
                            in_safe = True
                            break
                if nr_sampled >= par.max_samples:
                    raise RuntimeError("(PosPath) Could not find collision-free sample")
                samples = [sample]
                self._log(f"(PosPath) Adding random point {sample} to graph")
                nr_samples += 1
                if nr_samples > par.max_iters:
                    raise RuntimeError("(PosPath) Exceeded max iterations")
            for sample in samples:
                t0 = time.perf_counter()
                a_set, b_set, shape, p_mid, ok = self._find_set_around_point(
                    np.asarray(sample, float), fixed_mid=True
                )
                a_np, b_np = reduce_ineqs(*_strip(a_set, b_set))
                sampled_first = True
                self.comp_time_set += time.perf_counter() - t0
                dvertex = np.inf
                for _, nd in graph.nodes.items():
                    dvertex = min(
                        dvertex,
                        np.linalg.norm(shape - nd["q_ellipse"])
                        + np.linalg.norm(p_mid - nd["p_mid"]),
                    )
                if dvertex > 0.01:
                    self.id_graph += 1
                    graph.add_node(
                        self.id_graph,
                        cset=[a_np, b_np],
                        name=f"Vertex {self.id_graph}",
                        size=float(np.linalg.det(shape)),
                        q_ellipse=shape,
                        p_mid=p_mid,
                        a_set=a_np,
                        b_set=b_np,
                    )
                    self.nr_sets += 1
                    t0 = time.perf_counter()
                    conn = self.add_edges(self.id_graph, graph, inter_graph, end, start)
                    connected = conn or connected
                    self.comp_time_edge += time.perf_counter() - t0
                else:
                    self._log(f"(PosPath) Set already known, min distance {dvertex:.3f}")

        self.comp_time_graph = time.perf_counter() - t_graph0

        # --- final via path with rotation (ref `:538-584`) ---
        t0 = time.perf_counter()
        p_via, p_via_list, omega_via, sets_via, _, _ = self.compute_via_points(
            path, start, end, graph, inter_graph, with_rot=True, p_via_guess=p_via_list
        )
        self.sets_via_prev = copy.deepcopy(sets_via)
        self.comp_time_via += time.perf_counter() - t0

        b1d = np.array([0.0, 0.0, 1.0])
        bp1_list = []
        for i in range(len(p_via) - 1):
            dp = p_via[i + 1] - p_via[i]
            dp = dp / np.linalg.norm(dp)
            b1 = b1d - np.dot(dp, b1d) * dp
            n1 = np.linalg.norm(b1)
            if n1 < 1e-3:
                b1 = np.array([1.0, 1.0, 1.0])
                b1 = b1 - np.dot(dp, b1) * dp
                n1 = np.linalg.norm(b1)
            bp1_list.append(b1 / n1)

        r_via = [
            _rodrigues_np(self.omega_normed, self.omega_norm * x) @ np.asarray(r0)
            for x in omega_via
        ]
        r_via[0] = (
            _rodrigues_np(self.omega_normed, -self.replanning_phi * self.omega_norm)
            @ np.asarray(r0)
        ) if self.omega_norm > 1e-9 else np.asarray(r0)

        sets_via_normed = normalize_set_size(sets_via, MPC_SET_ROWS)
        self.comp_time_total = time.perf_counter() - t_total0
        self.graph, self.inter_graph = graph, inter_graph
        if self.verbose:
            self.print_computation_time()
        return p_via_list, r_via, bp1_list, sets_via_normed

    def print_computation_time(self):
        """(ref `BoundPlanner.py:154-172`)."""
        print(f"(PosPath) Computed {self.nr_sets} sets")
        print(f"(PosPath) Building graph of convex sets: {self.comp_time_graph:.4f}s")
        print(f"(PosPath) -> Shortest path: {self.comp_time_path:.4f}s")
        print(f"(PosPath) -> Via point optimization: {self.comp_time_via:.4f}s")
        print(f"(PosPath) -> Set computation: {self.comp_time_set:.4f}s")
        print(f"(PosPath) -> Edge computation: {self.comp_time_edge:.4f}s")
        print(f"(PosPath) --> Fit computation: {self.comp_time_fit:.4f}s")
        print(f"(PosPath) Total time: {self.comp_time_total:.4f}s")
