"""Tile/untile + padding masks. Pure reshapes — XLA compiles these to
layout changes, not copies, whenever possible."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def pad_to_multiple(
    img: jax.Array, tile_h: int, tile_w: int
) -> Tuple[jax.Array, Tuple[int, int]]:
    """Zero-pad ``(H, W, ...)`` up to tile multiples; returns (padded, (H, W))."""
    h, w = img.shape[0], img.shape[1]
    ph, pw = _ceil_to(h, tile_h), _ceil_to(w, tile_w)
    if (ph, pw) == (h, w):
        return img, (h, w)
    pad = [(0, ph - h), (0, pw - w)] + [(0, 0)] * (img.ndim - 2)
    return jnp.pad(img, pad), (h, w)


def valid_mask(
    padded_hw: Tuple[int, int], valid_hw: Tuple[int, int]
) -> jax.Array:
    """(H_pad, W_pad) bool mask of real pixels (True) vs padding."""
    ph, pw = padded_hw
    h, w = valid_hw
    rows = jnp.arange(ph) < h
    cols = jnp.arange(pw) < w
    return rows[:, None] & cols[None, :]


def tile_image(img: jax.Array, tile_h: int, tile_w: int) -> jax.Array:
    """``(H, W, ...)`` -> ``(nh, nw, tile_h, tile_w, ...)``; H, W must be
    multiples of the tile size (use :func:`pad_to_multiple` first)."""
    h, w = img.shape[0], img.shape[1]
    assert h % tile_h == 0 and w % tile_w == 0, (img.shape, tile_h, tile_w)
    nh, nw = h // tile_h, w // tile_w
    rest = img.shape[2:]
    x = img.reshape((nh, tile_h, nw, tile_w) + rest)
    return jnp.swapaxes(x, 1, 2)  # (nh, nw, th, tw, ...)


def untile_image(tiles: jax.Array) -> jax.Array:
    """Inverse of :func:`tile_image`."""
    nh, nw, th, tw = tiles.shape[:4]
    rest = tiles.shape[4:]
    x = jnp.swapaxes(tiles, 1, 2)  # (nh, th, nw, tw, ...)
    return x.reshape((nh * th, nw * tw) + rest)
