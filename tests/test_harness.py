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
