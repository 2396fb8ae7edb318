"""Tonemapping operators (src/graphics/tonemap.h analog), batched jnp."""

from __future__ import annotations

import jax.numpy as jnp


def clamp_color(color, max_mag):
    """Clamp a color to a maximum magnitude (tonemap.h:6-13)."""
    sqr = jnp.sum(color * color, axis=-1, keepdims=True)
    scale = jnp.where(sqr > max_mag * max_mag,
                      max_mag / jnp.sqrt(jnp.maximum(sqr, 1e-30)), 1.0)
    return color * scale


def reinhard(v):
    return v / (1.0 + v)


def reinhard_extended(v, max_white):
    return v * (1.0 + v / (max_white * max_white)) / (1.0 + v)


def aces_approx(v):
    """ACES filmic approximation (tonemap.h:22-30) — the default output
    transform (renderer.cpp:184,211)."""
    v = v * 0.6
    a, b, c, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    return jnp.clip((v * (a * v + b)) / (v * (c * v + d) + e), 0.0, 1.0)


def uncharted2(v):
    def curve(x):
        a, b, c, d, e, f = 0.15, 0.50, 0.10, 0.20, 0.02, 0.30
        return (x * (a * x + c * b) + d * e) / (x * (a * x + b) + d * f) - e / f

    v = curve(v * 2.0) / curve(11.2)
    return jnp.power(jnp.maximum(v, 0.0), 1.0 / 2.4)


def to_rgb8(v):
    """float [0,1] -> uint8 (RGBF32_to_RGB8 analog, precomp.h:342-359)."""
    return jnp.clip(v * 255.0 + 0.5, 0, 255).astype(jnp.uint8)
