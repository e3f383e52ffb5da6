"""The analytic FLOP model stays consistent with the OCP dimensions."""

import dataclasses

from boundplanner_tpu.config import perf_mpc_params
from boundplanner_tpu.mpc.flops import solve_flops


def test_flop_model_orderings():
    dense = dataclasses.replace(perf_mpc_params(), struct_ocp=False)
    flat = dataclasses.replace(perf_mpc_params(), struct_ocp=True,
                               struct_chunked=False)
    chunked = dataclasses.replace(flat, struct_chunked=True)
    fd, ff, fc = solve_flops(dense), solve_flops(flat), solve_flops(chunked)
    # structural exploitation must strictly reduce every level
    assert fc["total"] < ff["total"] < fd["total"]
    # the documented headline ratios (README): flat ~1.5-1.7x, chunked >2x
    assert 1.4 < fd["total"] / ff["total"] < 1.8
    assert fd["total"] / fc["total"] > 2.0
    # factorization work is mode-independent
    assert fd["factorization"] == ff["factorization"] == fc["factorization"]
