"""Pallas TPU kernel: fused FAST-9/16 + score + 3x3 NMS for one pyramid
level — the #1 hot loop of the reference (`ORBextractor.cc:763-1156`,
SURVEY §3 "hot loops ranked").

The XLA path (`ops/features.py::fast_score` + `_nms3`) expresses the
segment test as 16 whole-image shifted copies per threshold plus a
reduce_window — each a separate HBM-resident intermediate, so one level
costs ~35 full-image HBM round trips. This kernel reads the (padded)
image into VMEM ONCE and computes everything — both thresholds' 16-point
segment tests, the contiguous-arc bitmask reduction, the margin score,
and the 3x3 non-max suppression — entirely in VMEM, writing back exactly
two maps (score, pass_ini).

A SLAM level image is small by TPU standards (752x480 f32 = 1.4 MB), so
the whole level lives in VMEM for one kernel invocation; levels above
~2.5 MB fall back to the XLA path (`fits_vmem`). All 16 ring taps are
static slices of the padded slab — the loop unrolls into pure VPU ops.
Outputs are bit-exact vs the XLA path (identical float ops, identical
integer bitmask logic).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from orbslam3_tpu.ops.features import _FAST_OFFSETS

PAD = 4  # FAST ring radius (3) + NMS reach (1)
VMEM_LIMIT_BYTES = 2_600_000  # level image size above which we fall back

_FORCE: Optional[bool] = None


def use_pallas_fast(enable: Optional[bool]) -> None:
    """Force the Pallas FAST kernel on/off (None = auto: TPU only)."""
    global _FORCE
    _FORCE = enable


def enabled_for(h: int, w: int) -> bool:
    """Default OFF: on v5e the kernel is bit-exact but NOT faster than
    XLA's fusion of the 16-shift formulation (measured 2.3 ms vs 1.7 ms
    at 752x480 — XLA already keeps the shifted intermediates fused), so
    it stays an opt-in (`use_pallas_fast(True)`) until a tiled variant
    beats the XLA path. SURVEY §3 ranked extraction as hot loop #1 from
    the reference's scalar-loop structure; on TPU the batched XLA
    formulation already removed that bottleneck."""
    if _FORCE is not None:
        return _FORCE and (h * w * 4) <= VMEM_LIMIT_BYTES
    return False


def _fast_nms_kernel(
    min_th, ini_th, h, w,
    img_ref, score_ref, ini_ref,
    bits_scr, sb_scr, sd_scr, s_scr,
):
    """Padded slab (h+2*PAD, w+2*PAD) -> (h, w) NMS'd score + ini mask.

    Scores are computed on an (h+2, w+2) extended interior so the 3x3
    suppression at the true interior's edge pixels sees its neighbors.
    Accumulators live in explicit VMEM scratch refs and are UPDATED in
    place — with SSA-value accumulators Mosaic stack-allocates a fresh
    full-size temporary per unrolled tap (observed 29 MB scoped-vmem for
    a 0.3 MB level) and blows the 16 MB scoped limit."""
    he, we = h + 2, w + 2
    c0 = PAD - 1
    center = img_ref[c0 : c0 + he, c0 : c0 + we]

    # bits_scr packs four 16-bit masks into two uint32 planes:
    # plane 0 = brighter/darker @ min_th, plane 1 = @ ini_th.
    bits_scr[...] = jnp.zeros((2, he, we), jnp.uint32)
    sb_scr[...] = jnp.zeros((he, we), jnp.float32)
    sd_scr[...] = jnp.zeros((he, we), jnp.float32)
    for i in range(16):
        dx, dy = int(_FAST_OFFSETS[i, 0]), int(_FAST_OFFSETS[i, 1])
        r = img_ref[c0 + dy : c0 + dy + he, c0 + dx : c0 + dx + we]
        d = r - center
        bmin = (d > min_th).astype(jnp.uint32) | (
            (d < -min_th).astype(jnp.uint32) << 16
        )
        bini = (d > ini_th).astype(jnp.uint32) | (
            (d < -ini_th).astype(jnp.uint32) << 16
        )
        bits_scr[0] = bits_scr[0] | (bmin << i)
        bits_scr[1] = bits_scr[1] | (bini << i)
        sb_scr[...] = sb_scr[...] + jnp.maximum(d - min_th, 0.0)
        sd_scr[...] = sd_scr[...] + jnp.maximum(-d - min_th, 0.0)

    def arc9(bits):
        # Contiguous run >= 9 over the 16-cycle (same bit trick as
        # features.fast_score::arc9); bright in low 16 bits, dark in high.
        low = bits & jnp.uint32(0xFFFF)
        high = bits >> 16
        out = jnp.zeros_like(bits, dtype=jnp.bool_)
        for part in (low, high):
            wrapped = part | (part << 16)
            acc = wrapped
            for j in range(1, 9):
                acc = acc & (wrapped >> j)
            out = out | ((acc & jnp.uint32(0xFFFF)) != 0)
        return out

    is_min = arc9(bits_scr[0])
    is_ini = arc9(bits_scr[1])
    s_scr[...] = jnp.where(is_min, jnp.maximum(sb_scr[...], sd_scr[...]), 0.0)

    # 3x3 max including the center tap — same semantics as reduce_window
    # in features._nms3 (ties with self always pass).
    neigh = s_scr[0:h, 0:w]
    for dy in range(3):
        for dx in range(3):
            if dy == 0 and dx == 0:
                continue  # already the init value
            neigh = jnp.maximum(neigh, s_scr[dy : dy + h, dx : dx + w])
    inner = s_scr[1 : 1 + h, 1 : 1 + w]
    score_ref[...] = jnp.where(inner >= neigh, inner, 0.0)
    ini_ref[...] = (is_ini & is_min)[1 : 1 + h, 1 : 1 + w].astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("min_th", "ini_th", "interpret"))
def fast_score_nms_pallas(
    img: jnp.ndarray, min_th: float, ini_th: float, interpret: bool = False
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(score_after_nms, pass_ini) for one level, fused in VMEM.

    Equivalent to `_nms3(fast_score(img, min_th, ini_th)[0])` plus the
    pass_ini mask for interior pixels; pixels within PAD of the border
    differ (roll-wraparound there in the XLA path) — the caller masks a
    19px border anyway (EDGE_THRESHOLD > PAD)."""
    H, W = img.shape
    padded = jnp.pad(img, ((PAD, PAD), (PAD, PAD)))
    kern = functools.partial(_fast_nms_kernel, float(min_th), float(ini_th), H, W)
    score, ini = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_shape=(
            jax.ShapeDtypeStruct((H, W), jnp.float32),
            jax.ShapeDtypeStruct((H, W), jnp.int8),
        ),
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, H + 2, W + 2), jnp.uint32),
            pltpu.VMEM((H + 2, W + 2), jnp.float32),
            pltpu.VMEM((H + 2, W + 2), jnp.float32),
            pltpu.VMEM((H + 2, W + 2), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            # Mosaic's default scoped-vmem cap is 16 MB; the unrolled
            # 16-tap loop's transients peak at ~25 MB for a 752x480
            # level. v5e has 128 MB of physical VMEM per core — raise
            # the cap instead of shrinking the kernel.
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(padded)
    return score, ini.astype(bool)
