"""Host-side repacking of K-quant super-blocks into TPU plane layout.

The on-disk Q2_K/Q3_K layout (interleaved per-super-block structs, see
deepseek_tpu.quant.kquant) is hostile to TPU lanes: quants for consecutive
columns live at different bit offsets of bytes scattered across a struct.

We repack once at load time into separate *plane* arrays chosen so that the
in-kernel unpack is `(qs >> shift) & mask` followed by a concatenation along
the lane (last) dimension — no shuffles.

Columns are stored in **stride-16 permuted order**: permuted position
``c' = o * (n/16) + g`` holds original column ``g*16 + o``. Consequence: the
per-16-column scale of permuted column c' is ``S16[c' mod n/16]`` — i.e. the
scale row expands to full width by *tile concatenation* (``pltpu.repeat``),
which Mosaic supports natively, instead of an element-repeat lane reshape,
which it does not. The per-256 super scales expand to per-16 granularity with
a tiny one-hot matmul inside the kernel.

    qs_plane[..., j]   holds permuted columns  j, j+n/4, j+2n/4, j+3n/4
    hm_plane[..., j]   holds permuted columns  j + b*n/8 for b in 0..7

Scale grids stay per-16-group / per-superblock in original group order
(groups are indexed by ``g``, which is exactly the permuted minor index).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from deepseek_tpu.quant.kquant import (
    QK_K,
    _unpack_q3_scales,
    _unpack_qs_2bit,
    q2k_fields,
    q3k_fields,
)


def stride16_perm(n: int) -> np.ndarray:
    """perm[c'] = original column index for permuted position c'."""
    n16 = n // 16
    o = np.arange(16).repeat(n16)          # o = c' // n16
    g = np.tile(np.arange(n16), 16)        # g = c' %  n16
    return (g * 16 + o).astype(np.int64)


def stride16_inv_perm(n: int) -> np.ndarray:
    """inv[orig] = permuted position of original column orig."""
    return np.argsort(stride16_perm(n)).astype(np.int64)


def _plane_pack_2bit(q: np.ndarray) -> np.ndarray:
    """(..., n) values in [0,3] -> (..., n//4) uint8 plane bytes."""
    n = q.shape[-1]
    n4 = n // 4
    q = q.astype(np.uint8)
    return (q[..., :n4]
            | (q[..., n4:2 * n4] << 2)
            | (q[..., 2 * n4:3 * n4] << 4)
            | (q[..., 3 * n4:] << 6))


def _plane_pack_1bit(h: np.ndarray) -> np.ndarray:
    """(..., n) values in {0,1} -> (..., n//8) uint8 plane bytes."""
    n = h.shape[-1]
    n8 = n // 8
    h = h.astype(np.uint8)
    out = np.zeros(h.shape[:-1] + (n8,), dtype=np.uint8)
    for b in range(8):
        out |= h[..., b * n8:(b + 1) * n8] << b
    return out


def repack_q2k(raw: np.ndarray, rows: int, cols: int
               ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Raw Q2_K block bytes (..., rows, row_bytes) -> plane arrays.

    Returns (qs (..., rows, cols//4) u8, sm (..., rows, cols//16) u8,
    d (..., rows, cols//256) f32, dmin same).
    """
    lead = raw.shape[:-2]
    assert raw.shape[-2] == rows
    nbr = cols // QK_K  # blocks per row
    scales, qs, d, dmin = q2k_fields(raw)
    # scales: (..., rows, nbr, 16); qs: (..., rows, nbr, 64)
    q = _unpack_qs_2bit(qs.reshape(-1, 64)).reshape(*lead, rows, nbr * QK_K)
    q = q[..., stride16_perm(nbr * QK_K)]
    sm = scales.reshape(*lead, rows, nbr * 16)  # sc|mn<<4, per 16-group, g-order
    qs_plane = _plane_pack_2bit(q)
    return (qs_plane,
            np.ascontiguousarray(sm),
            np.ascontiguousarray(d.reshape(*lead, rows, nbr)),
            np.ascontiguousarray(dmin.reshape(*lead, rows, nbr)))


def repack_q3k(raw: np.ndarray, rows: int, cols: int
               ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Raw Q3_K block bytes -> (qs (..., rows, cols//4) u8,
    hm (..., rows, cols//8) u8, sc (..., rows, cols//16) i8,
    d (..., rows, cols//256) f32)."""
    lead = raw.shape[:-2]
    assert raw.shape[-2] == rows
    nbr = cols // QK_K
    hmask, qs, scales, d = q3k_fields(raw)
    n = nbr * QK_K
    perm = stride16_perm(n)
    qlow = _unpack_qs_2bit(qs.reshape(-1, 64)).reshape(*lead, rows, n)[..., perm]
    pos = np.arange(QK_K)
    # high bit: byte pos%32, bit pos//32 within each super-block
    hb = ((hmask[..., pos % 32] >> (pos // 32)) & 1)  # (..., rows, nbr, 256)
    hb = hb.reshape(*lead, rows, n)[..., perm]
    sc6 = _unpack_q3_scales(scales.reshape(-1, 12)).reshape(*lead, rows, nbr * 16)
    sc = (sc6 - 32).astype(np.int8)
    return (_plane_pack_2bit(qlow),
            _plane_pack_1bit(hb),
            np.ascontiguousarray(sc),
            np.ascontiguousarray(d.reshape(*lead, rows, nbr)))
