"""Gather-free per-keypoint patch extraction for the ORB front end.

The reference samples per-keypoint pixels with pointer arithmetic
(`IC_Angle` ORBextractor.cc:77, `computeOrbDescriptor` :108,
`ComputeStereoMatches` Frame.cc:470). A literal translation needs ~5M
scattered pixel gathers per stereo frame; measured on the chip
(tools/true_bench*.py) XLA:TPU gathers run at ~8 ns/element and per-block
slices at ~2 us/block — both far too slow for a 10 fps budget.

TPU re-design, exploiting that keypoints come from `cell x cell` grid
selection (fast.select_keypoints_cells — at most one winner per cell):

  1. `cell_windows`: build a [n_cells, S, S] window tensor around every
     grid cell with STATIC slices + reshapes only (S = cell + 2*WINDOW_PAD).
     No gathers; pure layout work the TPU does at HBM bandwidth.
  2. gather the winning cells' windows — a row gather of few-KB rows,
     which the TPU does at bandwidth (~180 ns/row), not per element.
  3. `recenter`: cut the patch centered on the keypoint out of its window
     with two batched one-hot matmuls (exact: one operand is 0/1, the
     other holds integers <= 255, both exact in bf16 MXU passes).

Patches then feed matmul-style consumers: orientation moments and binned
rotated-BRIEF are selection matmuls (ops/brief.py), stereo SAD is static
slices of the patches (ops/stereo.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Window half-extent around a keypoint anywhere inside its cell. Must cover
# the largest sampling radius: rotated BRIEF needs +-(BRIEF_RADIUS * sqrt2)
# ~= +-19; orientation +-15; stereo SAD +-10.
WINDOW_PAD = 24


def cell_windows(img: jnp.ndarray, cell: int) -> jnp.ndarray:
    """[H, W] -> [gy * gx, S, S] windows, S = cell + 2 * WINDOW_PAD.

    Window (cy, cx) covers rows cy*cell - PAD .. cy*cell + cell + PAD of the
    zero-padded image, so every pixel within PAD of any point in the cell is
    inside the window. Built from (S//cell + 1)^2 static shifted slabs.
    """
    P = WINDOW_PAD
    h, w = img.shape
    ph = (cell - h % cell) % cell
    pw = (cell - w % cell) % cell
    H, W = h + ph, w + pw
    gy, gx = H // cell, W // cell
    S = cell + 2 * P
    # Pad so slab i (i = 0 .. S/cell) starts at row i*cell - P >= -P.
    n_sl = S // cell  # S must be a multiple of cell
    assert S % cell == 0, "WINDOW_PAD must make cell + 2*PAD a cell multiple"
    ext = jnp.pad(img, ((P, ph + P), (P, pw + P)))
    slabs = []
    for i in range(n_sl):
        row_sl = jax.lax.dynamic_slice_in_dim(ext, i * cell, H, axis=0)
        for j in range(n_sl):
            slabs.append(
                jax.lax.dynamic_slice_in_dim(row_sl, j * cell, W, axis=1)
            )
    # [n_sl, n_sl, gy, cell, gx, cell] -> [gy, gx, n_sl, cell, n_sl, cell]
    st = jnp.stack(slabs).reshape(n_sl, n_sl, gy, cell, gx, cell)
    win = st.transpose(2, 4, 0, 3, 1, 5).reshape(gy * gx, S, S)
    return win


def winner_patches(windows: jnp.ndarray, cell_id: jnp.ndarray) -> jnp.ndarray:
    """Row-gather the winning cells' windows: [K] ids -> [K, S, S]."""
    return windows[cell_id]


def recenter(
    win: jnp.ndarray,   # [K, S, S] windows (keypoint at P+iy, P+ix)
    iy: jnp.ndarray,    # [K] in-cell offsets
    ix: jnp.ndarray,
    out: int,           # output patch size (even; center at out//2)
) -> jnp.ndarray:
    """Cut [K, out, out] patches with the keypoint at (out//2, out//2),
    via two batched one-hot matmuls (exact selection, MXU-friendly)."""
    K, S, _ = win.shape
    c = out // 2
    base_y = iy + (WINDOW_PAD - c)  # window row of patch row 0
    base_x = ix + (WINDOW_PAD - c)
    a = jnp.arange(out, dtype=jnp.int32)
    r = jnp.arange(S, dtype=jnp.int32)
    ohy = (base_y[:, None, None] + a[None, :, None] == r[None, None, :])
    ohx = (base_x[:, None, None] + a[None, :, None] == r[None, None, :])
    ohy = ohy.astype(win.dtype)
    ohx = ohx.astype(win.dtype)
    rows = jnp.einsum("kar,krc->kac", ohy, win)          # [K, out, S]
    return jnp.einsum("kac,kbc->kab", rows, ohx)          # [K, out, out]
