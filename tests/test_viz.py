"""Smoke tests for the matplotlib debug plots (Agg backend)."""

import matplotlib

matplotlib.use("Agg")

import numpy as np

from boundplanner_tpu.viz import plot_graph, plot_set, plot_via_path


def box(center, half):
    a = np.vstack([np.eye(3), -np.eye(3)])
    b = np.concatenate([np.asarray(center) + half, -(np.asarray(center) - half)])
    return [a, b]


def test_plot_via_path():
    import matplotlib.pyplot as plt

    p_via = [np.zeros(3), np.array([0.2, 0.0, 0.0]), np.array([0.2, 0.2, 0.0])]
    r_via = [np.eye(3)] * 3
    sets_via = [box([0.1, 0, 0], 0.2), box([0.2, 0.1, 0], 0.2)]
    obs = [box([0.5, 0.5, 0.5], 0.1)]
    ax = plot_via_path(p_via, r_via, sets_via, obs)
    assert ax is not None
    plt.close("all")


def test_plot_graph():
    import matplotlib.pyplot as plt

    from boundplanner_tpu.planner.roadmap import Junction, SafeSet, SetRoadmap

    rm = SetRoadmap(w_size=1.0, w_bias=0.1, c_fit=10.0)
    s = box([0, 0, 0], 0.3)
    sid = rm.add_set(
        SafeSet(a=s[0], b=s[1], volume=0.1, ellipsoid=np.eye(3), mid=np.zeros(3))
    )
    rm.add_junction(
        Junction(a=s[0], b=s[1], owners=(sid, sid), anchor=np.zeros(3),
                 via=np.zeros(4), fits=True)
    )
    ax = plot_graph(np.zeros(3), np.ones(3), rm, [])
    assert ax is not None
    plt.close("all")
