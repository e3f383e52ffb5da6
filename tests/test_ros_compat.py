"""ROS adapter payload construction (no rclpy needed; ref
`RvizTools.py:13-101`, `boundmpcmsg/msg/MPCData.msg`)."""

import numpy as np

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
