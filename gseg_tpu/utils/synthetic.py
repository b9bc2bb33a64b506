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
    if h * w > 1 << 22:
        # large rungs: float32 noise halves the host memory/time (content
        # is arbitrary there; small shapes keep the legacy f64 stream so
        # committed quality artifacts stay byte-stable).
        img = palette[own].astype(np.float32)
        img += rng.standard_normal(img.shape, dtype=np.float32) * np.float32(noise)
        return np.clip(img, 0, 255).astype(np.uint8)
    img = palette[own].astype(np.float64)
    img += rng.normal(0.0, noise, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def blobs_ground_truth(h: int, w: int, num_blobs: int = 6, seed: int = 0
                       ) -> np.ndarray:
    """Nearest-center (voronoi) blob id map, O(H*W) memory.

    Computed as a running argmin over centers in float32 — a materialized
    (H, W, num_blobs) float64 distance tensor is ~8 GB at 4K and ~134 GB
    at 8K with the ladder's pixel-proportional blob counts (the 4K+ rung
    image generation used to dominate bench wall time and contributed to
    the 8K host OOM)."""
    rng = np.random.default_rng(seed)
    cy = rng.uniform(0, h, num_blobs)
    cx = rng.uniform(0, w, num_blobs)
    if h * w > 1 << 22:
        # Large images (perf-ladder rungs, pixel-proportional blob counts):
        # the per-center loop below makes num_blobs memory-bound passes
        # over the whole image (~minutes at 8K x 506 blobs). Use a chunked
        # BLAS form instead: argmin_i |p - c_i|^2 = argmin_i (|c_i|^2 -
        # 2 p.c_i), one (chunk, B) GEMM + argmin per row block. Rounding
        # differs from the legacy loop (near-tie boundary pixels may flip
        # center), so the small shapes every committed quality artifact
        # depends on keep the legacy arithmetic exactly.
        c = np.stack([cy, cx]).astype(np.float32)          # (2, B)
        c2 = (c[0] ** 2 + c[1] ** 2).astype(np.float32)    # (B,)
        own = np.empty((h, w), np.int32)
        xs = np.arange(w, dtype=np.float32)
        rows_per_chunk = max((1 << 24) // max(num_blobs * w, 1), 1)
        for y0 in range(0, h, rows_per_chunk):
            y1 = min(y0 + rows_per_chunk, h)
            ys = np.arange(y0, y1, dtype=np.float32)
            p = np.empty(((y1 - y0) * w, 2), np.float32)
            p[:, 0] = np.repeat(ys, w)
            p[:, 1] = np.tile(xs, y1 - y0)
            score = p @ c                                  # (chunk, B)
            score *= -2.0
            score += c2[None, :]
            own[y0:y1] = np.argmin(score, axis=1).reshape(y1 - y0, w)
        return own
    yy, xx = np.mgrid[0:h, 0:w]
    yy = yy.astype(np.float32)
    xx = xx.astype(np.float32)
    best = np.full((h, w), np.inf, np.float32)
    own = np.zeros((h, w), np.int32)
    for i in range(num_blobs):
        d = (yy - np.float32(cy[i])) ** 2 + (xx - np.float32(cx[i])) ** 2
        closer = d < best
        best[closer] = d[closer]
        own[closer] = i
    return own


def textured_image(h: int, w: int, seed: int = 0) -> np.ndarray:
    """Photo-like test content: multi-octave value noise (soft regions of
    many scales), a global illumination gradient, and per-pixel sensor
    noise, uint8.

    The reference benchmarks JPG photographs (reference README.md:26);
    blob images have atypically clean region structure, so every
    capacity/gate constant tuned on them (component-count decay, boundary
    density, iteration counts) needs a de-risking input with photo-like
    statistics: smooth shading, textured areas, edges at many contrasts,
    no piecewise-constant ground truth.
    """
    rng = np.random.default_rng(seed)
    acc = np.zeros((h, w, 3), np.float64)
    amp = 1.0
    # octaves: coarse 8x8 lattice up to ~quarter resolution, bilinearly
    # upsampled — classic value noise, deterministic and dataset-free.
    cells = 8
    while cells <= max(h, w) // 4:
        gh, gw = min(cells, h), min(cells, w)
        lattice = rng.uniform(-1.0, 1.0, (gh + 1, gw + 1, 3))
        yy = np.linspace(0, gh, h, endpoint=False)
        xx = np.linspace(0, gw, w, endpoint=False)
        y0 = yy.astype(int)
        x0 = xx.astype(int)
        fy = (yy - y0)[:, None, None]
        fx = (xx - x0)[None, :, None]
        a = lattice[y0][:, x0]
        b = lattice[y0][:, x0 + 1]
        c = lattice[y0 + 1][:, x0]
        d = lattice[y0 + 1][:, x0 + 1]
        acc += amp * ((a * (1 - fx) + b * fx) * (1 - fy)
                      + (c * (1 - fx) + d * fx) * fy)
        amp *= 0.55
        cells *= 2
    acc /= max(np.abs(acc).max(), 1e-9)
    img = 128.0 + 96.0 * acc
    # illumination gradient + sensor noise
    yy, xx = np.mgrid[0:h, 0:w]
    img += (20.0 * yy / max(h - 1, 1) - 10.0)[..., None]
    img += rng.normal(0.0, 3.0, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


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
