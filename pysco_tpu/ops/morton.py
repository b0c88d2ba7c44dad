"""Morton (Z-order) indexing: encode/decode and tesseral arithmetic.

TPU-native counterpart of the reference's bit-twiddling module
(``morton.py``): 21 bits per axis interleaved into 64-bit keys via
magic-number spreads, vectorised over particle arrays with jnp integer ops
(no LLVM intrinsics needed -- these are pure elementwise uint64 ops that
XLA fuses). The main simulation path only needs ``positions_to_keys``
(utils.py:1053); encode/decode round-trips and the level-wise neighbour
increments (incX/decX...) are provided for parity and for future
tile-bucketing work.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

U64 = jnp.uint64
BITS = 21
_MASKS_SPREAD = (
    (32, 0x1F00000000FFFF),
    (16, 0x1F0000FF0000FF),
    (8, 0x100F00F00F00F00F),
    (4, 0x10C30C30C30C30C3),
    (2, 0x1249249249249249),
)

# per-axis dilated masks for tesseral arithmetic: key bits of axis a are
# at positions 3*i + (2 - a) given the (x<<2 | y<<1 | z) interleave
_X_MASK = 0x4924924924924924
_Y_MASK = 0x2492492492492492
_Z_MASK = 0x1249249249249249


def spread_bits(v: jax.Array) -> jax.Array:
    """Dilate the low 21 bits so they occupy every third bit."""
    x = v.astype(U64) & U64(0x1FFFFF)
    for shift, mask in _MASKS_SPREAD:
        x = (x | (x << shift)) & U64(mask)
    return x


def compact_bits(v: jax.Array) -> jax.Array:
    """Inverse of :func:`spread_bits`."""
    x = v.astype(U64) & U64(0x1249249249249249)
    x = (x ^ (x >> 2)) & U64(0x10C30C30C30C30C3)
    x = (x ^ (x >> 4)) & U64(0x100F00F00F00F00F)
    x = (x ^ (x >> 8)) & U64(0x1F0000FF0000FF)
    x = (x ^ (x >> 16)) & U64(0x1F00000000FFFF)
    x = (x ^ (x >> 32)) & U64(0x1FFFFF)
    return x


def encode(i: jax.Array, j: jax.Array, k: jax.Array) -> jax.Array:
    """Interleave three 21-bit integer coordinates into a Morton key."""
    return (spread_bits(i) << 2) | (spread_bits(j) << 1) | spread_bits(k)


def decode(key: jax.Array):
    """Recover (i, j, k) from Morton keys."""
    key = key.astype(U64)
    return (
        compact_bits(key >> 2).astype(jnp.uint32),
        compact_bits(key >> 1).astype(jnp.uint32),
        compact_bits(key).astype(jnp.uint32),
    )


def positions_to_keys(position: jax.Array) -> jax.Array:
    """Morton keys from positions in [0, 1) at 21 bits/axis
    (morton.py:112-258 equivalent)."""
    scaled = jnp.clip(
        (position.astype(jnp.float32) * jnp.float32(2.0 ** BITS)).astype(
            jnp.uint32
        ),
        0,
        jnp.uint32(2 ** BITS - 1),
    )
    return encode(scaled[:, 0], scaled[:, 1], scaled[:, 2])


def keys_to_positions(keys: jax.Array) -> jax.Array:
    """Cell-centre positions from Morton keys (inverse of
    positions_to_keys up to quantisation)."""
    i, j, k = decode(keys)
    inv = jnp.float32(0.5 ** BITS)
    return jnp.stack(
        [
            (i.astype(jnp.float32) + 0.5) * inv,
            (j.astype(jnp.float32) + 0.5) * inv,
            (k.astype(jnp.float32) + 0.5) * inv,
        ],
        axis=1,
    )


def _axis_add(key, delta_key, mask):
    """Tesseral add along one axis: add within the dilated axis bits."""
    key = key.astype(U64)
    mask = U64(mask)
    inv = ~mask
    return ((key | inv) + (delta_key & mask)) & mask | (key & inv)


def _level_unit(axis: int, level: int) -> int:
    """Dilated '1' for the given axis at a coarse level (cells of size
    2^level quantisation units)."""
    shift = 3 * level + (2 - axis)
    return 1 << shift


def increment(key: jax.Array, axis: int, level: int = 0) -> jax.Array:
    """Move to the +1 neighbour along an axis at the given level
    (morton.py:259-560 incX/incY/incZ equivalents, periodic in 21 bits)."""
    mask = (_X_MASK, _Y_MASK, _Z_MASK)[axis]
    return _axis_add(key, U64(_level_unit(axis, level)), mask)


def decrement(key: jax.Array, axis: int, level: int = 0) -> jax.Array:
    """Move to the -1 neighbour along an axis at the given level."""
    mask = (_X_MASK, _Y_MASK, _Z_MASK)[axis]
    key = key.astype(U64)
    mask = U64(mask)
    inv = ~mask
    # subtract within dilated bits: (key & mask) - unit, borrow-safe
    return ((key & mask) - U64(_level_unit(axis, level))) & mask | (key & inv)
