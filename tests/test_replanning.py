"""Replanning flow: new obstacle appears mid-track -> replan -> hand-off.

Exercises the reference's recovery path (SURVEY.md §3.4:
`BoundPlanner.plan_convex_set_path(replanning=True, p_horizon=...)` +
`BoundMPC.update` + `MPCNode.update_reference`).
"""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from boundplanner_tpu.mpc import MPCNode
from boundplanner_tpu.planner import BoundPlanner


@pytest.mark.slow
def test_replan_with_new_obstacle():
    q0 = np.zeros(7)
    q0[3] = -np.pi / 2
    q0[5] = np.pi / 2
    node = MPCNode(q0)

    p0fk, _, _ = node.robot_model.forward_kinematics(q0, 0 * q0)
    p0 = p0fk[:3]
    r0 = R.from_rotvec(np.array(p0fk[3:])).as_matrix()
    p1 = np.array([0.45, -0.4, 0.3])
    r1 = R.from_euler("XYZ", [0, 90, 0], degrees=True).as_matrix()

    obstacles = [[0.2, -1.0, -0.1, 1.0, 1.0, 0.0]]
    planner = BoundPlanner(
        e_p_max=0.5,
        obstacles=obstacles,
        workspace_max=[1.0, 0.38, 1.0],
        workspace_min=[-0.14, -1.0, 0.0],
        seed=0,
    )
    p_via, r_via, bp1_list, sets_via = planner.plan_convex_set_path(p0, p1, r0, r1)

    def handoff(p_via, r_via, bp1_list, sets_via, obstacles):
        a_sets = [x[0] for x in sets_via]
        b_sets = [x[1] for x in sets_via]
        br1 = [np.array([0.0, 0.0, 1.0])] * len(bp1_list)
        erb = [np.array([90, 90, 90, -90, -90, -90]) * np.pi / 180] * len(bp1_list)
        node.update_reference(p_via, r_via, bp1_list, br1, erb, a_sets, b_sets, obstacles)

    handoff(p_via, r_via, bp1_list, sets_via, obstacles)
    for _ in range(6):
        node.step()
    phi_before = float(node.mpc.phi_current[0])
    assert phi_before > 0.01

    # a new obstacle appears ahead; replan from the current pose reusing the
    # committed horizon
    # placed ahead of the current EE position, not on top of it
    new_obstacles = obstacles + [[0.36, -0.42, 0.0, 0.5, -0.3, 0.22]]
    planner.add_obstacle_reps(new_obstacles, update=True, reset=True)
    p_now = node.p_lie[:3].copy()
    r_now = R.from_rotvec(np.array(node.p_lie[3:])).as_matrix()
    p_horizon = [row for row in node.traj.T[:, :3]] if node.traj is not None else [p_now]
    p_horizon = [np.asarray(p, float) for p in np.asarray(node.traj)[:3].T]
    p_via2, r_via2, bp1_2, sets_via2 = planner.plan_convex_set_path(
        p_now, p1, r_now, r1, replanning=True, p_horizon=p_horizon, new_obs=True
    )
    assert len(p_via2) >= 2
    handoff(p_via2, r_via2, bp1_2, sets_via2, new_obstacles)

    # phi was re-initialized by projection; continue tracking
    for _ in range(25):
        node.step()
        for ob in new_obstacles[1:]:
            a = np.vstack([np.eye(3), -np.eye(3)])
            b = np.concatenate([ob[3:], -np.asarray(ob[:3])])
            # small tolerance: constraints are slacked (ref
            # `casadi_ocp_formulation.py:82-101`) and the obstacle may
            # appear close to the committed horizon
            assert np.max(a @ node.p_lie[:3] - b) > -0.01, "EE deep in new obstacle"
        if float(node.mpc.phi_current[0]) >= float(node.mpc.phi_max[0]) - 0.02:
            break
    # reached (or nearly reached) the goal of the new plan
    assert float(node.mpc.phi_current[0]) > 0.5 * float(node.mpc.phi_max[0])
