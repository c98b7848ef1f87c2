"""Pallas fused Hamming top-2 kernel vs the XLA matrix path — bit-exact
(distances are small integers; both paths are lossless)."""

import jax.numpy as jnp
import numpy as np
import pytest

from orbslam3_tpu.ops import matching
from orbslam3_tpu.ops import pallas_match as pm

INTERP = dict(interpret=True)  # CPU tests run the kernel interpreted


def _rand_desc(rng, n):
    return jnp.asarray(rng.integers(0, 256, (n, 32), dtype=np.uint8))


@pytest.mark.parametrize("n,m", [(64, 256), (100, 777), (300, 1500)])
def test_top2_matches_xla(n, m):
    rng = np.random.default_rng(n + m)
    da, db = _rand_desc(rng, n), _rand_desc(rng, m)
    vb = jnp.asarray(rng.random(m) > 0.2)

    D = matching._mask_matrix(matching.hamming_matrix(da, db), None, vb)
    d1r, d2r, jr = matching.best_two(D)
    d1, d2, j = pm.hamming_top2(da, db, valid_b=vb, **INTERP)

    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d1r))
    np.testing.assert_array_equal(np.asarray(d2), np.asarray(d2r))
    # argmin ties can differ in index; distances at the index must match.
    np.testing.assert_array_equal(
        np.asarray(D)[np.arange(n), np.asarray(j)], np.asarray(d1r)
    )


def test_windowed_matches_search_by_projection():
    rng = np.random.default_rng(7)
    n, m = 90, 600
    da, db = _rand_desc(rng, n), _rand_desc(rng, m)
    va = jnp.asarray(rng.random(n) > 0.1)
    vb = jnp.asarray(rng.random(m) > 0.1)
    uvq = jnp.asarray(rng.uniform(0, 640, (n, 2)), jnp.float32)
    uvk = jnp.asarray(rng.uniform(0, 640, (m, 2)), jnp.float32)
    rad = jnp.asarray(rng.uniform(30, 120, (n,)), jnp.float32)
    octk = jnp.asarray(rng.integers(0, 8, (m,)), jnp.int32)
    lo = jnp.asarray(rng.integers(0, 4, (n,)), jnp.int32)
    hi = lo + 2

    ref = matching.search_by_projection(
        da, uvq, va, db, uvk, vb, rad,
        octave_kp=octk, octave_lo=lo, octave_hi=hi,
        max_dist=80.0, ratio=0.85,
    )
    got = pm.match_nn_fused(
        da, db, valid_a=va, valid_b=vb, max_dist=80.0, ratio=0.85,
        cross_check=False,
        window=pm.MatchWindow(uvq, uvk, rad, octk, lo, hi), **INTERP,
    )
    np.testing.assert_array_equal(np.asarray(got.valid), np.asarray(ref.valid))
    np.testing.assert_array_equal(
        np.asarray(got.idx)[np.asarray(ref.valid)],
        np.asarray(ref.idx)[np.asarray(ref.valid)],
    )


def test_match_nn_fused_cross_check():
    rng = np.random.default_rng(3)
    n, m = 120, 450
    da, db = _rand_desc(rng, n), _rand_desc(rng, m)
    va = jnp.asarray(rng.random(n) > 0.15)
    vb = jnp.asarray(rng.random(m) > 0.15)
    ref = matching.match_nn(da, db, va, vb, max_dist=256.0, ratio=0.95,
                            cross_check=True)
    got = pm.match_nn_fused(da, db, valid_a=va, valid_b=vb, max_dist=256.0,
                            ratio=0.95, cross_check=True, **INTERP)
    # Ties in argmin may be broken differently between lax.top_k and the
    # tiled fold; compare on rows where the reference match is unambiguous.
    D = np.asarray(matching._mask_matrix(
        matching.hamming_matrix(da, db), va, vb))
    unamb = (D == D.min(1, keepdims=True)).sum(1) == 1
    np.testing.assert_array_equal(
        np.asarray(got.valid)[unamb], np.asarray(ref.valid)[unamb]
    )
    sel = unamb & np.asarray(ref.valid)
    np.testing.assert_array_equal(np.asarray(got.idx)[sel], np.asarray(ref.idx)[sel])
