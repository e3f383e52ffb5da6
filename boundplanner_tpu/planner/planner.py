"""Global convex-set path planner (host graph orchestration over batched
device geometry kernels). See `planner/set_finder.py` for the device side.

Re-design of `bound_planner/BoundPlanner/BoundPlanner.py:26-896`.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from ..config import PlannerParams
from .set_finder import ObstacleArrays, build_obstacle_arrays


class BoundPlanner:
    """Placeholder shell — filled in by the planner milestone. Holds the
    obstacle representation and the set finder interface used by the MPC
    (link collision sets)."""

    def __init__(
        self,
        obstacles: Sequence[Sequence[float]] = (),
        e_p_max: float = 0.5,
        obs_size_increase: float = 0.08,
        workspace_max=(1.0, 1.0, 1.2),
        workspace_min=(-1.0, -1.0, 0.0),
    ):
        self.params = PlannerParams(
            e_p_max=e_p_max,
            obs_size_increase=obs_size_increase,
            workspace_max=tuple(workspace_max),
            workspace_min=tuple(workspace_min),
        )
        self.obstacles = [list(ob) for ob in obstacles]
        self.obs_arrays = build_obstacle_arrays(self.obstacles, obs_size_increase)

    def add_obstacle_reps(self, obstacles, update=False, reset=False):
        if reset:
            self.obstacles = []
        self.obstacles.extend([list(ob) for ob in obstacles])
        self.obs_arrays = build_obstacle_arrays(
            self.obstacles, self.params.obs_size_increase
        )
