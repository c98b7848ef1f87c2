"""Pallas TPU kernel: fused Hamming distance + top-2 reduction.

The XLA path in `ops/matching.py` materializes the full (N, M) Hamming
matrix in HBM before `top_k` reads it back — for a 16384-point local map
against 1024 keypoints that is a ~64 MB round trip per call on what is
fundamentally a streaming reduction. The reference never has this matrix
at all (scalar popcount loops, `ORBmatcher.cc:2700`); this kernel is the
TPU-native middle ground: the distance TILE lives only in VMEM, the MXU
computes it via the bit-matmul identity

    hamming(a, b) = popcnt(a) + popcnt(b) - 2 * <bits(a), bits(b)>

and a running (best, second-best, argbest) per query row is folded
across key tiles in-register. The geometric window of the
SearchByProjection family (pixel radius + octave band — the mask of
`matching.window_mask`) is evaluated in-kernel from per-row/per-column
attributes, so the O(N*M) mask is never materialized either.

Grid: (query tiles, key tiles), key axis innermost and sequential; the
output blocks revisit the same (i, 0) slot across the key axis, which
keeps the accumulators resident in VMEM (standard Pallas reduction
pattern). Outputs are bit-exact vs the XLA path (distances are small
integers: bf16 dot of {0,1} vectors of length 256 is exact, f32
accumulation is lossless).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF = 1e9  # plain float: jnp constants may not be captured by kernels

TILE_Q = 256  # query rows per program
TILE_K = 512  # key columns per inner step


class MatchWindow(NamedTuple):
    """Per-query / per-key attributes of the projection search window
    (TPU form of `Frame::GetFeaturesInArea`, ref `Frame.cc:755`)."""

    uv_q: jnp.ndarray  # (N, 2) predicted pixel positions of the queries
    uv_k: jnp.ndarray  # (M, 2) keypoint pixel positions
    radius_q: jnp.ndarray  # (N,) search radius per query (pixels)
    octave_k: jnp.ndarray  # (M,) keypoint octave
    octave_lo: jnp.ndarray  # (N,) inclusive lower octave gate
    octave_hi: jnp.ndarray  # (N,) inclusive upper octave gate


def _kernel(windowed: bool, n_k_tiles: int, *refs):
    if windowed:
        (a_ref, b_ref, pen_ref, uvq_ref, uvk_ref, rad_ref, octk_ref,
         lo_ref, hi_ref, d1_ref, d2_ref, j1_ref) = refs
    else:
        a_ref, b_ref, pen_ref, d1_ref, d2_ref, j1_ref = refs

    jt = pl.program_id(1)

    a = a_ref[...]  # (TILE_Q, 256) bf16 bits
    b = b_ref[...]  # (TILE_K, 256) bf16 bits
    dots = jnp.dot(a, b.T, preferred_element_type=jnp.float32)  # MXU
    pa = jnp.sum(a.astype(jnp.float32), axis=1, keepdims=True)
    pb = jnp.sum(b.astype(jnp.float32), axis=1, keepdims=True)
    d = pa + pb.T - 2.0 * dots  # (TILE_Q, TILE_K)
    d = d + pen_ref[...]  # (1, TILE_K) invalid-key penalty, broadcasts

    if windowed:
        uvq = uvq_ref[...].astype(jnp.float32)  # (TILE_Q, 2)
        uvk = uvk_ref[...].astype(jnp.float32)  # (TILE_K, 2)
        du = jnp.abs(uvq[:, 0:1] - uvk[:, 0:1].T)
        dv = jnp.abs(uvq[:, 1:2] - uvk[:, 1:2].T)
        r = rad_ref[...].astype(jnp.float32)  # (TILE_Q, 1)
        ok = (du <= r) & (dv <= r)
        octk = octk_ref[...].astype(jnp.float32).T  # (1, TILE_K)
        ok &= octk >= lo_ref[...].astype(jnp.float32)
        ok &= octk <= hi_ref[...].astype(jnp.float32)
        d = jnp.where(ok, d, INF)

    # Tile-local top-2 along the key axis.
    lane = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    m1 = jnp.min(d, axis=1, keepdims=True)
    i1 = jnp.argmin(d, axis=1).astype(jnp.int32)[:, None]
    m2 = jnp.min(jnp.where(lane == i1, INF, d), axis=1, keepdims=True)
    col1 = jt * TILE_K + i1

    @pl.when(jt == 0)
    def _init():
        d1_ref[...] = m1
        d2_ref[...] = m2
        j1_ref[...] = col1

    @pl.when(jt != 0)
    def _fold():
        r1 = d1_ref[...]
        r2 = d2_ref[...]
        # Merge two sorted pairs: best = min of bests; second =
        # min(max of bests, both seconds).
        d1_ref[...] = jnp.minimum(r1, m1)
        d2_ref[...] = jnp.minimum(jnp.maximum(r1, m1), jnp.minimum(r2, m2))
        j1_ref[...] = jnp.where(m1 < r1, col1, j1_ref[...])


def _pad_rows(x: jnp.ndarray, rows: int, fill) -> jnp.ndarray:
    if x.shape[0] == rows:
        return x
    pad = [(0, rows - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad, constant_values=fill)


@functools.partial(
    jax.jit, static_argnames=("windowed", "interpret", "tile_q", "tile_k")
)
def _top2_call(
    bits_a, bits_b, penalty_b, window_args, *,
    windowed: bool, interpret: bool, tile_q: int, tile_k: int,
):
    nq, nk = bits_a.shape[0], bits_b.shape[0]
    grid = (nq // tile_q, nk // tile_k)
    row = lambda i, j: (i, 0)
    col = lambda i, j: (j, 0)
    in_specs = [
        pl.BlockSpec((tile_q, 256), row),
        pl.BlockSpec((tile_k, 256), col),
        pl.BlockSpec((1, tile_k), lambda i, j: (0, j)),
    ]
    inputs = [bits_a, bits_b, penalty_b]
    if windowed:
        uvq, uvk, rad, octk, lo, hi = window_args
        in_specs += [
            pl.BlockSpec((tile_q, 2), row),
            pl.BlockSpec((tile_k, 2), col),
            pl.BlockSpec((tile_q, 1), row),
            pl.BlockSpec((tile_k, 1), col),
            pl.BlockSpec((tile_q, 1), row),
            pl.BlockSpec((tile_q, 1), row),
        ]
        inputs += [uvq, uvk, rad, octk, lo, hi]
    out_specs = [
        pl.BlockSpec((tile_q, 1), row),
        pl.BlockSpec((tile_q, 1), row),
        pl.BlockSpec((tile_q, 1), row),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((nq, 1), jnp.float32),
        jax.ShapeDtypeStruct((nq, 1), jnp.float32),
        jax.ShapeDtypeStruct((nq, 1), jnp.int32),
    ]
    kern = functools.partial(_kernel, windowed, grid[1])
    d1, d2, j1 = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*inputs)
    return d1[:, 0], d2[:, 0], j1[:, 0]


def hamming_top2(
    desc_a: jnp.ndarray,  # (N, 32) uint8
    desc_b: jnp.ndarray,  # (M, 32) uint8
    valid_b: Optional[jnp.ndarray] = None,  # (M,) bool
    window: Optional[MatchWindow] = None,
    *,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused equivalent of
    `best_two(_mask_matrix(hamming_matrix(a, b), None, valid_b))`,
    optionally with the projection window folded in — without ever
    materializing the (N, M) matrix. Returns (best, second, argbest).

    Row validity is intentionally NOT an argument: invalid query rows
    produce garbage that callers mask afterwards, exactly like the XLA
    path. Inputs are padded to tile multiples internally.
    """
    from orbslam3_tpu.ops.matching import unpack_bits

    n, m = desc_a.shape[0], desc_b.shape[0]
    # Tile sizes respect TPU layout: sublane axis multiple of 8, lane
    # axis multiple of 128.
    tq = min(TILE_Q, 8 * ((n + 7) // 8))
    tk = min(TILE_K, 128 * ((m + 127) // 128))
    npad = tq * ((n + tq - 1) // tq)
    mpad = tk * ((m + tk - 1) // tk)

    bits_a = _pad_rows(unpack_bits(desc_a), npad, 0)
    bits_b = _pad_rows(unpack_bits(desc_b), mpad, 0)
    pen = jnp.zeros((m,), jnp.float32) if valid_b is None else jnp.where(
        valid_b, 0.0, INF
    )
    pen = _pad_rows(pen, mpad, INF)[None, :]

    wargs = None
    if window is not None:
        wargs = (
            _pad_rows(window.uv_q.astype(jnp.float32), npad, 0.0),
            _pad_rows(window.uv_k.astype(jnp.float32), mpad, 1e9),
            _pad_rows(window.radius_q.astype(jnp.float32)[:, None], npad, 0.0),
            _pad_rows(window.octave_k.astype(jnp.float32)[:, None], mpad, -1.0),
            _pad_rows(window.octave_lo.astype(jnp.float32)[:, None], npad, 0.0),
            _pad_rows(window.octave_hi.astype(jnp.float32)[:, None], npad, 0.0),
        )

    d1, d2, j1 = _top2_call(
        bits_a, bits_b, pen, wargs,
        windowed=window is not None, interpret=interpret,
        tile_q=tq, tile_k=tk,
    )
    return d1[:n], d2[:n], j1[:n]


def match_nn_fused(
    desc_a: jnp.ndarray,
    desc_b: jnp.ndarray,
    valid_a: Optional[jnp.ndarray] = None,
    valid_b: Optional[jnp.ndarray] = None,
    max_dist: float = 50.0,
    ratio: float = 0.9,
    cross_check: bool = True,
    window: Optional[MatchWindow] = None,
    *,
    interpret: bool = False,
):
    """Drop-in for `matching.match_nn` / `matching.search_by_projection`
    (window != None) on the Pallas path. Cross-check runs the kernel a
    second time with operands swapped (windowed matching is one-sided in
    the reference too, so cross_check and window are exclusive)."""
    from orbslam3_tpu.ops.matching import Matches

    assert not (cross_check and window is not None)
    d1, d2, j = hamming_top2(
        desc_a, desc_b, valid_b=valid_b, window=window, interpret=interpret
    )
    ok = (d1 <= max_dist) & (d1 <= ratio * d2)
    if valid_a is not None:
        ok &= valid_a
    if cross_check:
        _, _, back = hamming_top2(
            desc_b, desc_a, valid_b=valid_a, interpret=interpret
        )
        ok &= back[j] == jnp.arange(desc_a.shape[0])
    return Matches(idx=jnp.where(ok, j, -1), dist=d1, valid=ok)
