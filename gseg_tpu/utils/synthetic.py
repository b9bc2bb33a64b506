"""Synthetic test/benchmark images.

Stand-ins for the reference's datasets (BSDS500 481x321 quality set and the
960x540..7680x4320 JPG resolution ladder, reference README.md:21,26), used
because the benchmark data lives in unmounted branches and CI has no network.
Images are deterministic functions of (shape, seed).
"""

from __future__ import annotations

import numpy as np


def blobs_image(h: int, w: int, num_blobs: int = 6, noise: float = 8.0,
                seed: int = 0) -> np.ndarray:
    """Piecewise-constant colored voronoi-ish blobs + Gaussian noise, uint8.

    Has a known coarse structure, so segmentation quality is testable: the
    blob id map is returned by `blobs_ground_truth` with the same args.
    """
    rng = np.random.default_rng(seed)
    own = blobs_ground_truth(h, w, num_blobs, seed)
    palette = rng.integers(0, 256, (num_blobs, 3))
    img = palette[own].astype(np.float64)
    img += rng.normal(0.0, noise, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def blobs_ground_truth(h: int, w: int, num_blobs: int = 6, seed: int = 0
                       ) -> np.ndarray:
    rng = np.random.default_rng(seed)
    cy = rng.uniform(0, h, num_blobs)
    cx = rng.uniform(0, w, num_blobs)
    yy, xx = np.mgrid[0:h, 0:w]
    d = (yy[..., None] - cy) ** 2 + (xx[..., None] - cx) ** 2
    return np.argmin(d, axis=-1).astype(np.int32)


def gradient_image(h: int, w: int) -> np.ndarray:
    """Smooth diagonal RGB gradient, uint8 — worst case for segmentation
    (no edges), good for convergence/termination tests."""
    yy, xx = np.mgrid[0:h, 0:w]
    r = (255 * yy / max(h - 1, 1)).astype(np.uint8)
    g = (255 * xx / max(w - 1, 1)).astype(np.uint8)
    b = ((r.astype(int) + g.astype(int)) // 2).astype(np.uint8)
    return np.stack([r, g, b], axis=-1)


def checkerboard_image(h: int, w: int, cell: int = 8) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    c = ((yy // cell + xx // cell) % 2).astype(np.uint8) * 255
    return np.stack([c, c, c], axis=-1)
