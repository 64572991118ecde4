"""Sparse-byte coding of bit-packed pianorolls for device->host transport.

``ops/bitpack`` ships binary rolls at 1 bit/cell; at musical densities
(~1% of cells on — BASELINE density-matrix row) ~94% of those packed
bytes are zero, and the full 64-bar serving drain is FETCH-bound on
this environment's ~6 MB/s tunneled device link (BASELINE "SERVING
SERVICE" row). This codec ships only the NONZERO packed bytes as
``(flat_position, value)`` records — measured ~3.4x fewer bytes than
the packed frames at converged-model densities.

Why bytes and not note events: a device-side note-event extraction
(onset/offset run pairing over cells) was built and measured first —
bit-exact, but the capped stream compaction over the 27.5M-CELL domain
costs ~300 ms on a v5e chip (XLA cumsum ~36 ms + scatter ~164 ms per
mask, two masks), which LOSES to just fetching the packed frames.
Compacting at BYTE granularity shrinks the domain 8x, needs one mask
instead of two, no (B,T,K,D)->(B,K,D,T) relayout, and no uint16 range
limits; the note form, when wanted (MIDI export), is cheap to derive
on host from the decoded roll.

Record layout (the host inverse is ``sparse_unpack``): one ``(cap, 5)``
uint8 buffer; row j = 4 little-endian bytes of the flat byte position
within the packed roll + the byte value. Rows past ``count`` (the
int32 total-nonzero-bytes scalar, exact even when truncated) are
zero-filled; iff ``count > cap`` the buffer is truncated and the
caller must fall back to a frame transport (callers keep the packed
roll as a second, lazily-fetched output — Generator.fetch_rolls only
pulls the arrays it needs).

Fetching pulls the buffer in units of ONE fixed chunk (``FETCH_CHUNK``
rows) through a dynamic_slice whose start is a TRACED argument — so the
whole adaptive-prefix machinery is exactly ONE extra compiled program,
warmed at service init. (A first design quantized the prefix length
into bucket-sized slice programs; on this environment's remote-compile
tunnel EVERY new program shape costs minutes cold — measured 310 s of
serving stall from two cold slice shapes — so shape-per-length is a
non-starter. The chunk start being an argument keeps the program count
at one while fetch waste stays <= one chunk, 1.25 MiB.)
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

RECORD_BYTES = 5  # 4-byte LE position + 1-byte value
FETCH_CHUNK = 262144  # records per fetch chunk (1.25 MiB) — module docstring


def sparse_pack(packed: jnp.ndarray, cap: int
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Device-side: a bit-packed roll (any shape, uint8 — ops/bitpack
    layout) -> ``(buf (cap, 5) uint8, count int32 scalar)``. Stream
    compaction is an exclusive-cumsum + out-of-bounds-dropping scatter
    of the nonzero byte positions (unique by construction), then a
    gather for the values — no sort, one bandwidth pass over the
    packed bytes plus O(cap) placement."""
    flat = packed.reshape(-1)
    if flat.size >= 1 << 31:
        raise ValueError(f"packed roll has {flat.size} bytes; int32 "
                         "positions overflow")
    mask = flat != 0
    hits = mask.astype(jnp.int32)
    pos = jnp.cumsum(hits) - hits                 # exclusive prefix sum
    tgt = jnp.where(mask, pos, cap)               # cap = dropped (oob)
    idx = jnp.arange(flat.size, dtype=jnp.int32)
    posbuf = jnp.zeros((cap,), jnp.int32).at[tgt].set(
        idx, mode="drop", unique_indices=True)
    count = hits.sum()
    valid = jnp.arange(cap) < count               # pad rows gather flat[0]
    val = jnp.where(valid, flat[posbuf], 0)
    upos = posbuf.astype(jnp.uint32)
    buf = jnp.stack([upos & 0xFF, (upos >> 8) & 0xFF, (upos >> 16) & 0xFF,
                     (upos >> 24) & 0xFF], axis=-1).astype(jnp.uint8)
    buf = jnp.where(valid[:, None], buf, 0)
    return jnp.concatenate([buf, val[:, None].astype(jnp.uint8)], axis=-1), \
        count


def sparse_unpack(buf: np.ndarray, count: int, packed_shape) -> np.ndarray:
    """Host-side inverse: ``(n >= count, 5)`` uint8 records -> the
    bit-packed uint8 roll of ``packed_shape`` (feed to
    bitpack.unpack_rolls for cells). Vectorized numpy scatter."""
    buf = np.asarray(buf, np.uint8)
    count = int(count)
    if buf.ndim != 2 or buf.shape[1] != RECORD_BYTES or buf.shape[0] < count:
        raise ValueError(f"record buffer {buf.shape} can't hold "
                         f"{count} records")
    out = np.zeros(int(np.prod(packed_shape)), np.uint8)
    if count:
        pos = (buf[:count, :4].copy().view("<u4").reshape(-1)
               .astype(np.int64))
        if pos.max() >= out.size:
            raise ValueError("corrupt record stream (position out of "
                             "range)")
        out[pos] = buf[:count, 4]
    return out.reshape(packed_shape)


def record_cap(packed_size: int, chunk: int = FETCH_CHUNK) -> int:
    """Static record-buffer rows for a packed roll of ``packed_size``
    bytes: a 25%-nonzero-bytes allowance (~4x the measured
    converged-model rate — BASELINE density-matrix row), rounded UP to
    a whole number of fetch chunks so chunked dynamic_slice reads never
    need clamping (an OOB-clamped start would overlap the previous
    chunk and corrupt record order)."""
    want = max(packed_size // 4, 1)
    return -(-want // chunk) * chunk


def n_chunks(count: int, chunk: int = FETCH_CHUNK) -> int:
    """Fetch chunks needed to cover ``count`` valid records (>= 1 so a
    zero-count fetch still exercises/warms the one chunk program)."""
    return max(1, -(-count // chunk))
