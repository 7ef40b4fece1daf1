"""Session-scoped Ray fixture — ray.init exactly ONCE per pytest session."""

from __future__ import annotations

import os

os.environ.setdefault("POLARS_MAX_THREADS", "1")  # see bench.py

import pytest
import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def small_transcripts():
    """~1k-turn deterministic fixture table (seed 42)."""
    from dataquality_ray.fixtures import generate_transcripts
    return generate_transcripts(1000, seed=42)


@pytest.fixture(scope="session")
def small_oracle(small_transcripts):
    from dataquality_ray.oracle import label_transcripts
    return label_transcripts(small_transcripts)
