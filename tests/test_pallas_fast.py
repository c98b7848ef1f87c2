"""Fused FAST+NMS Pallas kernel == XLA path on the interior (the 19px
EDGE_THRESHOLD border is masked by the extractor in both paths)."""

import numpy as np
import jax.numpy as jnp

from orbslam3_tpu.ops import features as feat
from orbslam3_tpu.ops import pallas_fast

INTERP = dict(interpret=True)  # CPU tests run the kernel interpreted


def _render(rng, H=240, W=320):
    img = np.full((H, W), 40.0, np.float32)
    for _ in range(120):
        y, x = rng.integers(5, H - 20), rng.integers(5, W - 20)
        s = rng.integers(4, 16)
        img[y : y + s, x : x + s] = rng.uniform(60, 250)
    return img + rng.normal(0, 1.0, (H, W)).astype(np.float32)


def test_pallas_fast_matches_xla_interior(rng):
    img = jnp.asarray(_render(rng))
    score_x, ini_x = feat.fast_score(img, 7.0, 20.0)
    score_x = feat._nms3(score_x)
    score_p, ini_p = pallas_fast.fast_score_nms_pallas(img, 7.0, 20.0, **INTERP)
    b = feat.EDGE_THRESHOLD
    sx = np.asarray(score_x)[b:-b, b:-b]
    sp = np.asarray(score_p)[b:-b, b:-b]
    np.testing.assert_array_equal(sp, sx)
    np.testing.assert_array_equal(
        np.asarray(ini_p)[b:-b, b:-b], np.asarray(ini_x)[b:-b, b:-b]
    )
    assert (sx > 0).sum() > 50  # scene actually produced corners


def test_extract_unchanged_with_kernel(rng):
    """extract() dispatching to the kernel must select identical keypoints."""
    img = jnp.asarray(_render(rng))
    params = feat.OrbParams(n_features=300, n_levels=3)
    try:
        pallas_fast.use_pallas_fast(False)
        ref = feat.extract(img, params)
        # interpret mode so the kernel path runs on CPU
        import orbslam3_tpu.ops.pallas_fast as pf
        orig = pf.fast_score_nms_pallas
        pf_wrapped = lambda im, lo, hi: orig(im, lo, hi, interpret=True)
        pf.fast_score_nms_pallas = pf_wrapped
        pallas_fast.use_pallas_fast(True)
        out = feat.extract(img, params)
    finally:
        pallas_fast.use_pallas_fast(None)
        pf.fast_score_nms_pallas = orig
    np.testing.assert_array_equal(np.asarray(out.uv), np.asarray(ref.uv))
    np.testing.assert_array_equal(np.asarray(out.desc), np.asarray(ref.desc))
    np.testing.assert_array_equal(np.asarray(out.valid), np.asarray(ref.valid))
