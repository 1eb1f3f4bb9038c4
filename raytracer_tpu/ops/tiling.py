"""Pixel-tile ray ordering.

The cluster engine's culling quality depends on rays within a TILE-sized
contiguous run being spatially coherent.  Row-major order makes a
TILE-ray run a 1-pixel-tall sliver; re-ordering the flattened pixel axis
into blocks (8x16 for TILE=128) makes every run a compact frustum.

When the block shape divides the frame — true for every bundled scene —
the reorder is a pure reshape/transpose (`to_blocks`/`from_blocks`,
bandwidth-bound); otherwise a host-precomputed permutation is applied as
a device gather (`block_permutation`).  Shading is elementwise over
rays, so the ordering is semantically invisible.
"""

from __future__ import annotations

import functools

import numpy as np


def divides(h: int, w: int, bh: int, bw: int) -> bool:
    """True when the (h, w) pixel grid tiles evenly into (bh, bw) blocks —
    the case where the block permutation is a pure reshape/transpose."""
    return h % bh == 0 and w % bw == 0


def to_blocks(x, h: int, w: int, bh: int, bw: int):
    """Row-major (h*w, ...) -> block-order, as reshape+transpose.

    Equivalent to ``x[perm]`` from :func:`block_permutation` when
    ``divides(h, w, bh, bw)`` but ~50x cheaper on TPU: XLA lowers the
    transpose as a tiled copy instead of a 1-row-per-index gather
    (a (1M, 3) gather measured ~8 ms; the copy is bandwidth-bound)."""
    lead = x.shape[1:]
    y = x.reshape(h // bh, bh, w // bw, bw, *lead)
    y = y.transpose((0, 2, 1, 3) + tuple(range(4, 4 + len(lead))))
    return y.reshape((h * w,) + tuple(lead))


def from_blocks(x, h: int, w: int, bh: int, bw: int):
    """Inverse of :func:`to_blocks` (block order -> row-major)."""
    lead = x.shape[1:]
    y = x.reshape(h // bh, w // bw, bh, bw, *lead)
    y = y.transpose((0, 2, 1, 3) + tuple(range(4, 4 + len(lead))))
    return y.reshape((h * w,) + tuple(lead))


def apply_tile_order(x, h: int, w: int, blocks, perm):
    """Row-major -> tile order: reshape/transpose when ``blocks=(bh, bw)``
    is set, else a ``perm`` gather, else identity."""
    if blocks is not None:
        return to_blocks(x, h, w, *blocks)
    if perm is not None:
        return x[perm]
    return x


def undo_tile_order(x, h: int, w: int, blocks, inv):
    """Tile order -> row-major (inverse of :func:`apply_tile_order`)."""
    if blocks is not None:
        return from_blocks(x, h, w, *blocks)
    if inv is not None:
        return x[inv]
    return x


@functools.lru_cache(maxsize=64)
def block_permutation(h: int, w: int, bh: int, bw: int):
    """(perm, inv) int32 arrays of length h*w.

    ``perm[i]`` = row-major pixel index of the i-th ray in block order;
    ``inv`` satisfies ``x[perm][inv] == x``.  Handles H/W not divisible by
    the block size (edge blocks are partial, order stays a permutation).
    """
    rows = np.arange(h)
    cols = np.arange(w)
    rr, cc = np.meshgrid(rows, cols, indexing="ij")
    key = (
        (rr // bh).astype(np.int64) * ((w + bw - 1) // bw) + (cc // bw)
    ) * (h * w) + (rr % bh) * bw + (cc % bw)
    perm = np.argsort(key.reshape(-1), kind="stable").astype(np.int32)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(h * w, dtype=np.int32)
    return perm, inv
