"""End-to-end quality benchmark pipeline on the synthetic stand-in set
(small: CI has no BSDS500 and a single CPU)."""

import numpy as np

from gseg_tpu.bench.harness import run_quality_benchmark, summarize_quality
from gseg_tpu.config import SegmentationConfig
from gseg_tpu.utils.datasets import synthetic_quality_set


def test_quality_pipeline_runs_and_scores_sanely():
    cfg = SegmentationConfig(k=30.0, min_size=10)
    samples = list(synthetic_quality_set(n=2, h=48, w=64, noise=4.0))
    rows = run_quality_benchmark(
        samples, algorithms=("boruvka_cpu", "kruskal_cpu"), cfg=cfg
    )
    assert len(rows) == 4
    summary = summarize_quality(rows)
    # Kruskal (the quality gold standard) near-perfect on easy blobs;
    # the Boruvka formulation is known to trade quality for parallelism
    # (the reference's GPU variants show the same gap: ASA 0.905 vs 0.974,
    # BASELINE.md Fig. 4) — assert it stays within its expected band.
    assert summary["kruskal_cpu"]["asa_median"] > 0.95
    assert summary["kruskal_cpu"]["ue_median"] < 0.1
    assert summary["boruvka_cpu"]["asa_median"] > 0.5
    assert summary["boruvka_cpu"]["ue_median"] < 1.0


def test_quality_rows_schema():
    cfg = SegmentationConfig(k=150.0, min_size=20)
    samples = list(synthetic_quality_set(n=1, h=32, w=40, noise=6.0))
    rows = run_quality_benchmark(samples, algorithms=("boruvka_cpu",), cfg=cfg)
    r = rows[0]
    assert set(r) == {"image", "algorithm", "asa", "ue"}
    assert 0.0 <= r["asa"] <= 1.0
    assert 0.0 <= r["ue"] <= 2.0


def test_bsds_like_scene_structure():
    """The BSDS500 stand-in (reference protocol shape, README.md:21):
    deterministic, multiple GTs at annotator-like granularities."""
    from gseg_tpu.utils.synthetic import bsds_like_scene

    img, gts = bsds_like_scene(h=81, w=121, n_regions=40, seed=3)
    img2, gts2 = bsds_like_scene(h=81, w=121, n_regions=40, seed=3)
    assert img.shape == (81, 121, 3) and img.dtype == np.uint8
    assert (img == img2).all()
    assert len(gts) >= 3
    counts = []
    for g, g2 in zip(gts, gts2):
        assert g.shape == (81, 121) and g.dtype == np.int32
        assert (g == g2).all()
        counts.append(len(np.unique(g)))
    # coarse -> fine ordering with real granularity spread
    assert counts[0] < counts[-1]
    assert counts[-1] >= 25 and counts[0] <= 12


def test_bsds_like_protocol_level4():
    """Exact reference quality protocol (K=80, min_size=100, hierarchy
    level 4, ASA-maximizing GT — report-extract.txt:651-658) on the
    BSDS-scale stand-in, CPU oracle + one hierarchy algorithm."""
    import jax.numpy as jnp

    from gseg_tpu.bench.harness import segment_level_fn
    from gseg_tpu.metrics.compare import asa_ue_best_gt
    from gseg_tpu.utils.datasets import bsds_like_quality_set
    from gseg_tpu.utils.labels import compact_labels_np

    # small shape keeps the 1-core CI compile bounded; the campaign runs
    # the full 321x481 set on hardware (scripts/run_evidence.py --sections
    # bsds).
    (name, image, gts), = list(
        bsds_like_quality_set(n=1, h=81, w=121)
    )
    assert len(gts) >= 3
    cfg = SegmentationConfig(k=80.0, min_size=100, on_overflow="fallback")
    for algo in ("kruskal_native", "fastmst"):
        labels = np.asarray(
            segment_level_fn(algo, cfg, level=4)(jnp.asarray(image))
        )
        asa, ue = asa_ue_best_gt(compact_labels_np(labels), gts)
        assert 0.7 < asa <= 1.0, (algo, asa)
        assert 0.0 <= ue < 0.5, (algo, ue)


def test_segment_level_fn_picks_requested_level():
    """level-k output must equal hierarchy level k from the raw API."""
    import jax.numpy as jnp

    from gseg_tpu.bench.harness import segment_level_fn
    from gseg_tpu.models.fastmst import segment_fastmst_hierarchy
    from gseg_tpu.utils.synthetic import blobs_image

    img = jnp.asarray(blobs_image(40, 56, 5, 5.0, 1))
    cfg = SegmentationConfig(k=80.0, min_size=100, on_overflow="fallback")
    got = np.asarray(segment_level_fn("fastmst", cfg, level=2)(img))
    levels, _ = segment_fastmst_hierarchy(img, cfg)
    want = np.asarray(levels[min(2, levels.shape[0] - 1)])
    assert (got == want).all()
