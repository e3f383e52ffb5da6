"""Optional ROS 2 adapter (visualization / telemetry publishing).

The reference ships RViz publishers and message schemas
(`bound_planner/RvizTools/RvizTools.py:13-101`, `RvizToolsMPC.py:13-174`,
`boundmpcmsg/msg/MPCData.msg`). This engine keeps ROS strictly optional:
the message PAYLOADS (triangle meshes for convex sets, via-point spheres,
EE paths, joint states, MPCData telemetry) are constructed as plain dicts
by pure functions — testable without ROS — and ``RosPublisher`` converts
them to real messages only when rclpy is importable. In ROS-less
deployments every publish is a no-op, mirroring the reference's
``USE_RVIZ = False`` path (`boundplanner_example.py:11`).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from .utils.sets import polytope_vertices

try:  # pragma: no cover - rclpy is not installed in the dev environment
    import rclpy  # type: ignore

    HAVE_ROS = True
except Exception:  # pragma: no cover
    rclpy = None
    HAVE_ROS = False


# ---------------------------------------------------------------------------
# pure message-payload builders (dict-shaped visualization_msgs/Marker etc.)
# ---------------------------------------------------------------------------

def set_marker(a_set, b_set, ns: str = "Set", marker_id: int = 0,
               color=(0.0, 1.0, 0.0), alpha: float = 0.1,
               frame_id: str = "world") -> Optional[Dict]:
    """TRIANGLE_LIST marker for one convex set — the mesh construction of
    the reference `RvizTools.create_marker_msg:71-96` (hull facets
    triangulated from the H-rep vertices; cddlib replaced by the
    triple-plane enumeration in `utils.sets.polytope_vertices`)."""
    from scipy.spatial import ConvexHull

    a = np.asarray(a_set, float)
    b = np.asarray(b_set, float)
    keep = (b < 9.0) & (np.linalg.norm(a, axis=1) > 1e-8)
    pts = polytope_vertices(a[keep], b[keep])
    if pts.shape[0] < 4:
        return None
    hull = ConvexHull(pts)
    tri_points: List[List[float]] = []
    for face in hull.simplices:
        for idx in face:
            tri_points.append([float(c) for c in pts[idx]])
    return {
        "header": {"frame_id": frame_id},
        "ns": ns,
        "id": int(marker_id),
        "type": "TRIANGLE_LIST",
        "action": "ADD",
        "points": tri_points,
        "scale": {"x": 1.0, "y": 1.0, "z": 1.0},
        "color": {"r": float(color[0]), "g": float(color[1]),
                  "b": float(color[2]), "a": float(alpha)},
    }


def delete_all_marker(frame_id: str = "world") -> Dict:
    """DELETEALL marker (ref `RvizTools.delete_sets:56-62`)."""
    return {"header": {"frame_id": frame_id}, "action": "DELETEALL"}


def via_point_markers(p_via, diameter: float = 0.03,
                      color=(1.0, 0.5, 0.0), frame_id: str = "world") -> List[Dict]:
    """SPHERE marker per via point (ref `RvizTools.publish_via_points:37-51`)."""
    out = []
    for i, p in enumerate(np.asarray(p_via, float)):
        out.append(
            {
                "header": {"frame_id": frame_id},
                "ns": "via",
                "id": i,
                "type": "SPHERE",
                "action": "ADD",
                "pose": {"position": [float(c) for c in p[:3]]},
                "scale": {"x": diameter, "y": diameter, "z": diameter},
                "color": {"r": float(color[0]), "g": float(color[1]),
                          "b": float(color[2]), "a": 1.0},
            }
        )
    return out


def collision_sphere_markers(centers, radii, color=(0.2, 0.2, 1.0),
                             alpha: float = 0.4,
                             frame_id: str = "world") -> List[Dict]:
    """SPHERE markers for the robot collision spheres (ref
    `RvizToolsMPC.py` collision visualization; radii from
    `RobotModel.py:37` col_joint_sizes)."""
    out = []
    for i, (c, r) in enumerate(zip(np.asarray(centers, float), radii)):
        d = 2.0 * float(r)
        out.append(
            {
                "header": {"frame_id": frame_id},
                "ns": "collision",
                "id": i,
                "type": "SPHERE",
                "action": "ADD",
                "pose": {"position": [float(x) for x in c[:3]]},
                "scale": {"x": d, "y": d, "z": d},
                "color": {"r": float(color[0]), "g": float(color[1]),
                          "b": float(color[2]), "a": float(alpha)},
            }
        )
    return out


def path_msg(points, frame_id: str = "world") -> Dict:
    """nav_msgs/Path-shaped dict: planned or reference EE path (ref
    `RvizToolsMPC.py` path publishers)."""
    return {
        "header": {"frame_id": frame_id},
        "poses": [
            {"position": [float(c) for c in np.asarray(p, float)[:3]]}
            for p in points
        ],
    }


def joint_state_msg(q, names: Optional[Sequence[str]] = None) -> Dict:
    """sensor_msgs/JointState-shaped dict (ref `RvizToolsMPC.py` kinematic
    robot mover)."""
    q = np.asarray(q, float).reshape(-1)
    if names is None:
        names = [f"joint_a{i + 1}" for i in range(q.shape[0])]
    return {"name": list(names), "position": [float(v) for v in q]}


def mpc_data_dict(record) -> Dict:
    """MPCData.msg-shaped telemetry dict from a `telemetry.MPCTickRecord`
    (field parity with `boundmpcmsg/msg/MPCData.msg`)."""
    get = lambda f, d=None: getattr(record, f, d)
    out = {
        "t_comp": float(get("t_comp", 0.0)),
        "phi": float(get("phi", 0.0)),
        "dphi": float(get("dphi", 0.0)),
        "cost": float(get("cost", 0.0)),
        "iterations": int(get("sqp_iters", 0)),
        "sector": int(get("sector", 0)),
        "fails": int(get("fails", 0)),
    }
    for f in ("q", "dq", "p", "v", "e_p", "e_r", "p_ref"):
        v = get(f)
        if v is not None:
            out[f] = np.asarray(v, float).tolist()
    return out


class RosPublisher:
    """Publishes telemetry/markers when ROS 2 is present; builds (and
    returns) the payload dicts either way so callers/tests can inspect
    them. API mirrors the reference RvizTools surface
    (`RvizTools.py:13-101`, `RvizToolsMPC.py:13-174`)."""

    def __init__(self, node_name: str = "boundplanner_tpu"):
        self.active = False
        if HAVE_ROS:  # pragma: no cover
            rclpy.init()
            self.node = rclpy.create_node(node_name)
            self.active = True

    def publish_via_points(self, p_via, r_via):
        markers = via_point_markers(p_via)
        self._log(f"via points: {len(markers)}")
        return markers

    def publish_sets(self, sets, color=(0.0, 1.0, 0.0), alpha: float = 0.1):
        markers = [delete_all_marker()]
        for i, (a, b) in enumerate(sets):
            m = set_marker(a, b, marker_id=i, color=color, alpha=alpha)
            if m is not None:
                markers.append(m)
        self._log(f"{len(markers) - 1} convex sets")
        return markers

    def publish_path(self, t, traj, ref):
        msgs = {"planned": path_msg(traj), "reference": path_msg(ref)}
        self._log(f"paths at t={t:.2f}")
        return msgs

    def publish_collision_spheres(self, centers, radii):
        return collision_sphere_markers(centers, radii)

    def publish_joint_state(self, q):
        return joint_state_msg(q)

    def publish_tick(self, record):
        """MPCData-equivalent telemetry (`boundmpcmsg/msg/MPCData.msg`)."""
        msg = mpc_data_dict(record)
        self._log(f"phi={msg['phi']:.3f} t_comp={msg['t_comp'] * 1e3:.0f}ms")
        return msg

    def _log(self, text: str):
        if self.active:  # pragma: no cover
            self.node.get_logger().info(text)

    def shutdown(self):  # pragma: no cover
        if self.active:
            self.node.destroy_node()
            rclpy.shutdown()
            self.active = False
