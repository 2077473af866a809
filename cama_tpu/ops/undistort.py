"""Undistortion + resize remap, computed ONCE per camera.

The reference recomputes cv2.initUndistortRectifyMap for every frame
(cama/reproject.py:238-239) — its dominant CPU cost (SURVEY.md §3.3).  Here
the remap grid is computed once per camera and cached; applying it is either
cv2.remap on host (byte-exact to the reference, since the maps are identical)
or a jitted bilinear gather on device.

`compute_remap` replicates OpenCV's initUndistortRectifyMap math (pinhole +
radial k1..k6 / tangential p1 p2 distortion, identity rectification): for each
output pixel, unproject through K_new, apply the distortion model, reproject
through K_orig.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def compute_remap(K_orig, d, K_new, out_size):
    """Build (mapx, mapy) float32 arrays of shape out_size=(h, w).

    d follows OpenCV layout [k1, k2, p1, p2, k3, k4, k5, k6] (shorter arrays
    are zero-padded).  Matches cv2.initUndistortRectifyMap(K_orig, d, None,
    K_new, (w, h), cv2.CV_32FC1).
    """
    h, w = out_size
    K_orig = np.asarray(K_orig, dtype=np.float64)
    K_new = np.asarray(K_new, dtype=np.float64)
    dd = np.zeros(8)
    d = np.asarray(d, dtype=np.float64).reshape(-1)
    dd[: len(d)] = d
    k1, k2, p1, p2, k3, k4, k5, k6 = dd

    u, v = np.meshgrid(np.arange(w, dtype=np.float64), np.arange(h, dtype=np.float64))
    iK = np.linalg.inv(K_new)
    x = iK[0, 0] * u + iK[0, 1] * v + iK[0, 2]
    y = iK[1, 0] * u + iK[1, 1] * v + iK[1, 2]
    zw = iK[2, 0] * u + iK[2, 1] * v + iK[2, 2]
    x, y = x / zw, y / zw

    r2 = x * x + y * y
    radial = (1 + k1 * r2 + k2 * r2**2 + k3 * r2**3) / (1 + k4 * r2 + k5 * r2**2 + k6 * r2**3)
    x_d = x * radial + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
    y_d = y * radial + p1 * (r2 + 2 * y * y) + 2 * p2 * x * y

    mapx = (K_orig[0, 0] * x_d + K_orig[0, 1] * y_d + K_orig[0, 2]).astype(np.float32)
    mapy = (K_orig[1, 0] * x_d + K_orig[1, 1] * y_d + K_orig[1, 2]).astype(np.float32)
    return mapx, mapy


class RemapCache:
    """Per-camera cached remap grids (host + device copies)."""

    def __init__(self):
        self._host = {}
        self._dev = {}

    def get(self, key, K_orig, d, K_new, out_size):
        if key not in self._host:
            self._host[key] = compute_remap(K_orig, d, K_new, out_size)
        return self._host[key]

    def get_scaled(self, key, K_orig, d, K_new, out_size, scale):
        """Remap grids rescaled into a `scale`-reduced source image (for
        cv2.IMREAD_REDUCED_COLOR_{scale} decodes).  Reduced pixel j covers
        source pixels [scale*j, scale*j+scale), center at scale*j +
        (scale-1)/2 — so source coordinate x lands at (x - (scale-1)/2)/scale
        in the reduced image."""
        if key not in self._host:
            mapx, mapy = compute_remap(K_orig, d, K_new, out_size)
            off = (scale - 1) / 2.0
            self._host[key] = (
                ((mapx - off) / scale).astype(np.float32),
                ((mapy - off) / scale).astype(np.float32),
            )
        return self._host[key]

    def get_device(self, key, K_orig, d, K_new, out_size):
        if key not in self._dev:
            mapx, mapy = self.get(key, K_orig, d, K_new, out_size)
            self._dev[key] = (jnp.asarray(mapx), jnp.asarray(mapy))
        return self._dev[key]


def remap_host(image, mapx, mapy, interpolation=None):
    """cv2.remap when available (byte-exact to the reference pipeline),
    else the float bilinear fallback."""
    try:
        import cv2

        interp = cv2.INTER_LINEAR if interpolation is None else interpolation
        return cv2.remap(image, mapx, mapy, interpolation=interp)
    except ImportError:  # pragma: no cover
        return np.asarray(remap_bilinear(jnp.asarray(image), jnp.asarray(mapx), jnp.asarray(mapy)))


@jax.jit
def remap_bilinear(image, mapx, mapy):
    """Device bilinear remap with BORDER_CONSTANT=0 (cv2.remap default).

    image: [H, W, C] uint8 (or float); mapx/mapy: [h, w] float32.
    Returns [h, w, C] of the input dtype.
    """
    H, W = image.shape[0], image.shape[1]
    img = image.astype(jnp.float32)
    x0 = jnp.floor(mapx)
    y0 = jnp.floor(mapy)
    fx = mapx - x0
    fy = mapy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(yi, xi):
        inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        yc = jnp.clip(yi, 0, H - 1)
        xc = jnp.clip(xi, 0, W - 1)
        val = img[yc, xc]
        return jnp.where(inb[..., None], val, 0.0)

    out = (
        tap(y0i, x0i) * ((1 - fx) * (1 - fy))[..., None]
        + tap(y0i, x0i + 1) * (fx * (1 - fy))[..., None]
        + tap(y0i + 1, x0i) * ((1 - fx) * fy)[..., None]
        + tap(y0i + 1, x0i + 1) * (fx * fy)[..., None]
    )
    if jnp.issubdtype(image.dtype, jnp.integer):
        out = jnp.round(out)
    return out.astype(image.dtype)
