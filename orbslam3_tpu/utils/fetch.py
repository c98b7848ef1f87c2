"""Batched device->host transfers.

On real TPU hosts D2H latency is microseconds; over this sandbox's axon
tunnel every FRESH device buffer costs ~35-150 ms to fetch, sequentially.
`fetch` starts the copies for every leaf concurrently
(`copy_to_host_async`) before materializing any of them — measured ~5x
cheaper than sequential `np.asarray` calls for a 10-array bundle. The
deeper fix is architectural (fewer, packed host round-trips per frame —
see pipeline/tracking.py), but every remaining multi-array pull should go
through here.
"""

from __future__ import annotations

import functools

import jax
import numpy as np

_CHUNK_BYTES = 256 * 1024  # split D2H transfers bigger than this
_MAX_CHUNKS = 32


@functools.lru_cache(maxsize=64)
def _splitter(n_chunks: int):
    return jax.jit(
        lambda x: [c for c in jnp_split(x, n_chunks)], static_argnums=()
    )


def jnp_split(x, n):
    import jax.numpy as jnp

    m = x.shape[0]
    sizes = [(m + n - 1) // n] * n
    out, off = [], 0
    for s in sizes:
        s = min(s, m - off)
        if s <= 0:
            break
        out.append(jax.lax.slice_in_dim(x, off, off + s, axis=0))
        off += s
    return out


def _big_fetch(x: jax.Array) -> np.ndarray:
    """Chunk a large device array along axis 0 and fetch the chunks with
    concurrent copies (measured 4.4x faster than a single-stream
    transfer over the axon tunnel: 2.5 MB in ~90 ms vs ~380 ms)."""
    n = min(_MAX_CHUNKS, max(2, x.nbytes // _CHUNK_BYTES))
    if x.ndim == 0 or x.shape[0] < n:
        return np.asarray(x)
    chunks = _splitter(n)(x)
    for c in chunks:
        try:
            c.copy_to_host_async()
        except Exception:
            pass
    return np.concatenate([np.asarray(c) for c in chunks])


def fetch(*vals):
    """np.asarray every jax.Array leaf in `vals`, with all device->host
    copies in flight concurrently. Returns the same structure(s); a
    single argument returns its converted self."""
    leaves, treedefs = [], []
    for v in vals:
        lv, td = jax.tree_util.tree_flatten(v)
        leaves.append(lv)
        treedefs.append(td)
    big = {}
    for lv in leaves:
        for x in lv:
            if isinstance(x, jax.Array):
                if x.nbytes > 2 * _CHUNK_BYTES and x.ndim >= 1:
                    big[id(x)] = None  # fetched via _big_fetch below
                else:
                    try:
                        x.copy_to_host_async()
                    except Exception:
                        pass

    def _to_np(x):
        if not isinstance(x, jax.Array):
            return x
        if id(x) in big:
            if big[id(x)] is None:
                big[id(x)] = _big_fetch(x)
            return big[id(x)]
        return np.asarray(x)

    out = [
        td.unflatten([_to_np(x) for x in lv])
        for lv, td in zip(leaves, treedefs)
    ]
    return out[0] if len(out) == 1 else tuple(out)
