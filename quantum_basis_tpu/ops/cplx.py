"""Split-complex vector helpers.

TPU v5e has no complex128; all device numerics carry (re, im) pairs of
float64 arrays, with ``im=None`` for real sectors (real symmetric H). These
helpers keep solver code readable. A "cvec" is the tuple (re, im_or_None).
"""

from __future__ import annotations

import jax.numpy as jnp


def is_real(x):
    return x[1] is None


def zeros_like(x):
    re, im = x
    return (jnp.zeros_like(re), None if im is None else jnp.zeros_like(im))


def add(x, y):
    xr, xi = x
    yr, yi = y
    im = None
    if xi is not None or yi is not None:
        im = (xi if xi is not None else 0.0) + (yi if yi is not None else 0.0)
    return (xr + yr, im)


def sub(x, y):
    xr, xi = x
    yr, yi = y
    im = None
    if xi is not None or yi is not None:
        im = (xi if xi is not None else 0.0) - (yi if yi is not None else 0.0)
    return (xr - yr, im)


def scale(x, s):
    """Scale by a real scalar."""
    re, im = x
    return (re * s, None if im is None else im * s)


def axpy(a, x, y):
    """y + a*x with real scalar a."""
    xr, xi = x
    yr, yi = y
    im = None
    if xi is not None or yi is not None:
        im = (yi if yi is not None else 0.0) + a * (xi if xi is not None else 0.0)
    return (yr + a * xr, im)


def vdot_re(x, y):
    """Re <x, y> (conjugate-linear in x)."""
    xr, xi = x
    yr, yi = y
    out = jnp.vdot(xr, yr)
    if xi is not None and yi is not None:
        out = out + jnp.vdot(xi, yi)
    return out


def vdot(x, y):
    """<x, y> = (re, im) with im possibly None."""
    xr, xi = x
    yr, yi = y
    re = jnp.vdot(xr, yr)
    im = None
    if xi is not None or yi is not None:
        xi_ = 0.0 if xi is None else xi
        yi_ = 0.0 if yi is None else yi
        re = re + jnp.vdot(xi_, yi_)
        im = jnp.vdot(xr, yi_) - jnp.vdot(xi_, yr)
    return re, im


def norm(x):
    return jnp.sqrt(vdot_re(x, x))


def to_numpy_complex(x):
    import numpy as np

    re, im = x
    if im is None:
        return np.asarray(re)
    return np.asarray(re) + 1j * np.asarray(im)
