"""Pallas batched Cholesky-inverse kernel vs numpy (interpreter mode)."""

import numpy as np
import pytest

import jax.numpy as jnp

from boundplanner_tpu.ops.pallas_chol import cholesky_inverse


@pytest.mark.parametrize("n", [16, 40])
@pytest.mark.parametrize(
    "kw",
    [dict(two_d=False, rank2=False), dict(two_d=True, rank2=False),
     dict(rank2=True), dict(interleave=True)],
    ids=["rank1_full", "rank1_2d", "rank2", "interleave"],
)
def test_matches_numpy(rng, n, kw):
    bsz = 5
    ks = []
    for _ in range(bsz):
        a = rng.normal(size=(n, n))
        ks.append(a @ a.T + n * np.eye(n))
    ks = np.stack(ks).astype(np.float64)
    li = np.asarray(cholesky_inverse(jnp.asarray(ks), interpret=True, **kw))
    for i in range(bsz):
        l_ref = np.linalg.cholesky(ks[i])
        np.testing.assert_allclose(li[i] @ l_ref, np.eye(n), atol=1e-9)
        # exactly lower-triangular in every variant
        assert np.abs(np.triu(li[i], 1)).max() == 0.0
        # K^{-1} = L^{-T} L^{-1}
        np.testing.assert_allclose(
            li[i].T @ li[i] @ ks[i], np.eye(n), atol=1e-7
        )


@pytest.mark.parametrize("n", [16, 40, 136])
def test_interleave_bit_identical(rng, n):
    """The round-4 interleaved kernel (chol_step(j) + inv_step(j) in one
    loop of n steps) must be BIT-IDENTICAL to the baseline two-sweep
    kernel: per-element arithmetic and accumulation order are unchanged,
    only the temporal interleaving of disjoint writes differs (also
    verified on the real TPU by tools/bench_chol.py)."""
    bsz = 4
    ks = []
    for _ in range(bsz):
        a = rng.normal(size=(n, n))
        ks.append(a @ a.T + n * np.eye(n))
    ks = np.stack(ks).astype(np.float32)
    base = np.asarray(cholesky_inverse(jnp.asarray(ks), interpret=True))
    il = np.asarray(
        cholesky_inverse(jnp.asarray(ks), interpret=True, interleave=True)
    )
    assert (base == il).all()
