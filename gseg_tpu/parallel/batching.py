"""Batch parallelism: vmap over images, optionally sharded over a device mesh.

The reference processes one image at a time (SURVEY.md §2.4 S10: batch
parallelism absent upstream); on TPU, `jax.vmap` turns every per-image
pipeline into a batched one for free (BASELINE.json config 5: vmapped 4K
video frames), and a 1-D device mesh scales the batch across chips over
ICI/DCN — the data-parallel axis of this workload.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import SegmentationConfig


def _segment_batch_impl(images: jnp.ndarray, cfg: SegmentationConfig):
    """Returns (labels (B, H, W), flags () int32 OR over the batch)."""
    from ..models.atomic_boruvka import segment_atomic_impl
    from ..models.fastmst import segment_fastmst_impl
    from ..models.superpixel import segment_superpixel_impl
    from ..models.turbo import segment_turbo_impl

    if cfg.algorithm == "atomic":
        labels = jax.vmap(lambda im: segment_atomic_impl(im, cfg))(images)
        return labels, jnp.int32(0)

    # lax.map (one jitted program, sequential over the batch) for the
    # compact-round paths: their Pallas kernels and data-adaptive
    # while_loops don't vmap, and per-image convergence avoids vmap's
    # lockstep worst-case. Flags are OR-reduced over the batch.
    fn = {
        "turbo": segment_turbo_impl,
        "fastmst": segment_fastmst_impl,
        "superpixel": segment_superpixel_impl,
    }[cfg.algorithm]
    labels, flags = jax.lax.map(lambda im: fn(im, cfg), images)
    return labels, jax.lax.associative_scan(jnp.bitwise_or, flags)[-1]


segment_batch_flagged = jax.jit(_segment_batch_impl, static_argnames=("cfg",))


def segment_batch(images: jnp.ndarray, cfg: SegmentationConfig) -> jnp.ndarray:
    """(B, H, W, 3) -> (B, H, W) int32 labels, one jitted vmapped program.

    Checks the turbo path's capacity flags on the host (once per batch; see
    models.turbo.segment_turbo for the per-image semantics)."""
    labels, flags = segment_batch_flagged(images, cfg)
    if int(flags) != 0:
        from ..models.turbo import describe_flags

        if cfg.on_overflow == "fallback":
            from ..models.atomic_boruvka import segment_atomic_impl

            return jax.jit(
                jax.vmap(lambda im: segment_atomic_impl(im, cfg)),
            )(images)
        if cfg.on_overflow != "ignore":
            raise RuntimeError(
                "turbo capacity/budget violation in batch: "
                + describe_flags(int(flags))
            )
    return labels


def data_parallel_mesh(devices=None, axis: str = "data") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    import numpy as np

    return Mesh(np.asarray(devices), (axis,))


def segment_batch_sharded(
    images: jnp.ndarray, cfg: SegmentationConfig, mesh: Mesh, axis: str = "data"
) -> jnp.ndarray:
    """Data-parallel batched segmentation: batch axis sharded over the mesh.

    Each image stays chip-local, so no cross-chip traffic occurs inside the
    Boruvka loop — the embarrassingly-parallel scale-out mode (SURVEY.md §5
    distributed-communication row: DCN only for independent images).
    """
    sharding = NamedSharding(mesh, P(axis))
    images = jax.device_put(images, sharding)
    out_sharding = NamedSharding(mesh, P(axis))
    fn = jax.jit(
        functools.partial(_segment_batch_impl, cfg=cfg),
        in_shardings=sharding,
        out_shardings=(out_sharding, NamedSharding(mesh, P())),
    )
    labels, flags = fn(images)
    if int(flags) != 0 and cfg.on_overflow == "raise":
        from ..models.turbo import describe_flags

        raise RuntimeError(
            "turbo capacity/budget violation in sharded batch: "
            + describe_flags(int(flags))
        )
    return labels
