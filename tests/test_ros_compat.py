"""ROS adapter payload construction (no rclpy needed; ref
`RvizTools.py:13-101`, `boundmpcmsg/msg/MPCData.msg`)."""

import numpy as np
import pytest

from boundplanner_tpu import ros_compat as rc


def unit_box(half=0.5):
    a = np.vstack([np.eye(3), -np.eye(3)])
    b = half * np.ones(6)
    return a, b


def test_set_marker_triangulates_box():
    a, b = unit_box()
    m = rc.set_marker(a, b)
    assert m["type"] == "TRIANGLE_LIST"
    pts = np.asarray(m["points"])
    assert pts.shape[0] % 3 == 0 and pts.shape[0] >= 36  # 12 facets min
    assert np.all(np.abs(pts) <= 0.5 + 1e-9)
    # every cube corner appears in the mesh
    from itertools import product
    for corner in product([-0.5, 0.5], repeat=3):
        assert np.min(np.linalg.norm(pts - np.array(corner), axis=1)) < 1e-9


def test_set_marker_degenerate_returns_none():
    a = np.array([[1.0, 0, 0], [-1.0, 0, 0]])
    b = np.array([0.5, 0.5])
    assert rc.set_marker(a, b) is None


def test_publisher_payloads_without_ros():
    pub = rc.RosPublisher()
    assert not pub.active
    a, b = unit_box()
    sets = pub.publish_sets([(a, b), (a, b + 0.1)])
    assert sets[0]["action"] == "DELETEALL" and len(sets) == 3
    vias = pub.publish_via_points([[0, 0, 0.5], [0.2, 0, 0.6]], None)
    assert len(vias) == 2 and vias[0]["type"] == "SPHERE"
    paths = pub.publish_path(0.0, [[0, 0, 0]], [[0, 0, 0.1]])
    assert paths["planned"]["poses"][0]["position"] == [0.0, 0.0, 0.0]
    js = pub.publish_joint_state(np.zeros(7))
    assert len(js["name"]) == 7
    spheres = pub.publish_collision_spheres(np.zeros((3, 3)), [0.1, 0.1, 0.2])
    assert spheres[2]["scale"]["x"] == 0.4


def test_mpc_data_fields():
    class Rec:
        t_comp = 0.01
        phi = 1.2
        dphi = 0.5
        cost = 3.0
        sqp_iters = 4
        sector = 1
        fails = 0
        q = np.zeros(7)
        e_p = np.zeros(3)

    msg = rc.mpc_data_dict(Rec())
    assert msg["iterations"] == 4
    assert msg["q"] == [0.0] * 7
    assert msg["e_p"] == [0.0] * 3


# ---------------------------------------------------------------------------
# real-publishing path, driven through an injected fake rclpy stack
# ---------------------------------------------------------------------------

import sys
import types


class _Obj:
    """Attribute bag standing in for a generated ROS message."""

    def __init__(self):
        self.__dict__.update()

    def __getattr__(self, name):
        val = _Obj()
        setattr(self, name, val)
        return val


def _msg_cls(list_fields=()):
    def init(self):
        for f in list_fields:
            setattr(self, f, [])

    return type("Msg", (_Obj,), {"__init__": init})


class _FakePublisher:
    def __init__(self):
        self.published = []

    def publish(self, msg):
        self.published.append(msg)


class _FakeNode:
    def __init__(self):
        self.pubs = []

    def create_publisher(self, type_, topic, depth):
        p = _FakePublisher()
        p.topic, p.type_ = topic, type_
        self.pubs.append(p)
        return p

    def get_logger(self):
        class L:
            def info(self, _):
                pass

        return L()

    def destroy_node(self):
        pass


def _install_fake_ros(monkeypatch):
    rclpy = types.ModuleType("rclpy")
    rclpy._ok = False
    rclpy.ok = lambda: rclpy._ok
    node = _FakeNode()

    def _init():
        rclpy._ok = True

    rclpy.init = _init
    rclpy.shutdown = lambda: None
    rclpy.create_node = lambda name: node

    def msg_mod(name, **classes):
        parent = types.ModuleType(name.split(".")[0])
        mod = types.ModuleType(name)
        for cname, cls in classes.items():
            setattr(mod, cname, cls)
        parent.msg = mod
        monkeypatch.setitem(sys.modules, name.split(".")[0], parent)
        monkeypatch.setitem(sys.modules, name, mod)

    monkeypatch.setitem(sys.modules, "rclpy", rclpy)
    msg_mod("visualization_msgs.msg", Marker=_msg_cls(("points",)),
            MarkerArray=_msg_cls(("markers",)))
    msg_mod("geometry_msgs.msg", Point=_msg_cls(), PoseStamped=_msg_cls())
    msg_mod("nav_msgs.msg", Path=_msg_cls(("poses",)))
    msg_mod("sensor_msgs.msg", JointState=_msg_cls())
    msg_mod("std_msgs.msg", String=_msg_cls())
    return node


def test_real_publishing_with_fake_rclpy(monkeypatch):
    node = _install_fake_ros(monkeypatch)
    pub = rc.RosPublisher()
    assert pub.active
    # publishers were created at construction, one per topic
    assert {p.topic for p in node.pubs} == {t for t, _ in rc.RosPublisher.TOPICS.values()}

    a, b = unit_box()
    pub.publish_sets([(a, b)])
    sets_pub = next(p for p in node.pubs if p.topic.endswith("set_marker_array"))
    assert len(sets_pub.published) == 1
    arr = sets_pub.published[0]
    assert arr.markers[0].action == 3  # DELETEALL
    add = arr.markers[1]
    assert add.type == 11 and len(add.points) >= 36
    assert abs(add.points[0].x) <= 0.5 + 1e-9

    pub.publish_via_points([[0, 0, 0.5]], None)
    via_pub = next(p for p in node.pubs if p.topic.endswith("via_marker_array"))
    sphere = via_pub.published[0].markers[0]
    assert sphere.type == 2 and sphere.pose.position.z == 0.5

    pub.publish_path(0.0, [[0, 0, 0]], [[0.1, 0.2, 0.3]])
    ref_pub = next(p for p in node.pubs if p.topic.endswith("ref_traj"))
    assert ref_pub.published[0].poses[0].pose.position.z == 0.3

    pub.publish_joint_state(np.arange(7.0))
    js_pub = next(p for p in node.pubs if p.topic == "/joint_states")
    assert js_pub.published[0].position == [float(i) for i in range(7)]

    class Rec:
        t_comp, phi, dphi, cost, sqp_iters, sector, fails = 0.01, 1.0, 0.1, 2.0, 3, 0, 0

    pub.publish_tick(Rec())
    import json
    data_pub = next(p for p in node.pubs if p.topic.endswith("mpc_data"))
    assert json.loads(data_pub.published[0].data)["iterations"] == 3

    pub.shutdown()
    assert not pub.active


def test_host_services_drive_mpc_node():
    calls = {}

    class FakeNode:
        from boundplanner_tpu.config import MPCParams

        params = MPCParams()

        def update_reference(self, *args):
            calls["update"] = args

        def reconfigure(self, params):
            calls["params"] = params

    svc = rc.MpcHostServices(FakeNode())
    out = svc.trajectory([1], [2], [3], [4], [5], [6], [7], obstacles=[[0] * 6])
    assert out["success"] and len(calls["update"]) == 8

    out = svc.mpc_params(nr_segs=3)
    assert out["success"]
    assert calls["params"].nr_segs == 3 and out["params"]["nr_segs"] == 3


@pytest.mark.slow
def test_rviz_bringup_headless():
    """The launch-analog script (`examples/rviz_bringup.py`, ref
    `launch/rviz.launch.py`) runs end to end without rclpy: plans,
    registers host services, publishes sets/via/tick/joint payloads."""
    from examples.rviz_bringup import main

    assert main(max_ticks=3) == 3
