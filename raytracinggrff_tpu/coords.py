"""Coordinate conversions with the reference's exact orientation conventions.

The pipeline maps image-cube Cartesian (x, y, z) to MAS spherical coordinates
via the axis swap cart_to_sph(x, -z, y, phi0) — i.e. the MAS polar axis is the
image's +y axis and the observer looks down -z (ref: build_rays.py:93,
script/resample_with_ray_tracing.py:122, script/resampling_MAS_LOS.py:233).
"""

from __future__ import annotations

import jax.numpy as jnp


def cart_to_sph(x, y, z, phi0_offset_deg=0.0):
    """Cartesian -> spherical (r, colatitude [0, pi], longitude [0, 2pi)).

    Matches reference cart_to_sph (build_rays.py:35-45): lon gets a degree
    offset added, then is wrapped into [0, 2pi).
    """
    r = jnp.sqrt(x ** 2 + y ** 2 + z ** 2)
    colat = jnp.arccos(jnp.clip(z / r, -1.0, 1.0))
    lon = jnp.arctan2(y, x)
    lon = lon + phi0_offset_deg * jnp.pi / 180.0
    lon = jnp.where(lon < 0, lon + 2.0 * jnp.pi, lon)
    return r, colat, lon


def sph_to_cart(r, colat, lon):
    """Spherical -> Cartesian (ref: script/resampling_MAS_LOS.py:70-77)."""
    x = r * jnp.sin(colat) * jnp.cos(lon)
    y = r * jnp.sin(colat) * jnp.sin(lon)
    z = r * jnp.cos(colat)
    return x, y, z


def image_xyz_to_mas_sph(x, y, z, phi0_offset_deg=0.0):
    """Image-frame Cartesian -> MAS (r, colat, lon) with the (x, -z, y) swap.

    This is THE convention every resampler in the reference uses
    (build_rays.py:93). Returns (r, colat, lon) in radians.
    """
    return cart_to_sph(x, -z, y, phi0_offset_deg)
