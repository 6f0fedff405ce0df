"""Branchless ray-primitive intersection, shared by both renderers.

All rays are intersected against every object slot in its body frame; misses
return +inf so reductions (nearest hit / highest surface) stay branchless.
Everything vmaps over rays and objects and fuses into one XLA kernel.
"""

from __future__ import annotations

import jax.numpy as jnp

from smg_tpu.physics import shapes

INF = jnp.inf


def _safe_div(a, b):
    eps = 1e-12
    return a / jnp.where(jnp.abs(b) < eps, jnp.where(b >= 0, eps, -eps), b)


def ray_box(o, d, he):
    """Entry t of ray o + t d against an origin-centered box; +inf on miss.

    Slab method; o, d: (..., 3); he: (..., 3) broadcastable.
    """
    t1 = _safe_div(-he - o, d)
    t2 = _safe_div(he - o, d)
    tmin = jnp.max(jnp.minimum(t1, t2), axis=-1)
    tmax = jnp.min(jnp.maximum(t1, t2), axis=-1)
    hit = (tmax >= tmin) & (tmax >= 0.0)
    return jnp.where(hit, tmin, INF)


def ray_sphere(o, d, r):
    """Entry t against an origin-centered sphere of radius r; +inf on miss."""
    b = jnp.sum(o * d, axis=-1)
    c = jnp.sum(o * o, axis=-1) - r * r
    disc = b * b - c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t = -b - sq
    hit = (disc >= 0.0) & (t >= 0.0)
    # Ray starting inside: entry at t=0.
    inside = (disc >= 0.0) & (c < 0.0)
    t = jnp.where(inside, 0.0, t)
    return jnp.where(hit | inside, t, INF)


def ray_cylinder(o, d, R, hh):
    """Entry t against a z-axis cylinder (radius R, half-height hh)."""
    a = d[..., 0] ** 2 + d[..., 1] ** 2
    b = o[..., 0] * d[..., 0] + o[..., 1] * d[..., 1]
    c = o[..., 0] ** 2 + o[..., 1] ** 2 - R * R
    disc = b * b - a * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t_side = _safe_div(-b - sq, a)
    z_at = o[..., 2] + t_side * d[..., 2]
    side_ok = (disc >= 0.0) & (t_side >= 0.0) & (jnp.abs(z_at) <= hh)
    t_side = jnp.where(side_ok, t_side, INF)

    # Caps.
    t_top = _safe_div(hh - o[..., 2], d[..., 2])
    t_bot = _safe_div(-hh - o[..., 2], d[..., 2])

    def cap_ok(t):
        x = o[..., 0] + t * d[..., 0]
        y = o[..., 1] + t * d[..., 1]
        return (t >= 0.0) & (x * x + y * y <= R * R)

    t_top = jnp.where(cap_ok(t_top), t_top, INF)
    t_bot = jnp.where(cap_ok(t_bot), t_bot, INF)
    return jnp.minimum(t_side, jnp.minimum(t_top, t_bot))


def ray_primitive(o, d, shape_type, he):
    """Entry t against a primitive by type code. All args broadcast."""
    t_box = ray_box(o, d, he)
    t_cyl = ray_cylinder(o, d, he[..., 0], he[..., 2])
    t_sph = ray_sphere(o, d, he[..., 0])
    return jnp.select(
        [shape_type == shapes.BOX, shape_type == shapes.CYLINDER],
        [t_box, t_cyl],
        t_sph,
    )
