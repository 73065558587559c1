"""Session-scoped Ray fixture — the ONLY ray.init in the test suite."""

from __future__ import annotations

import logging

import pytest
import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from vectrain_ray.tuning import apply_data_context

    apply_data_context()
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def small_transcripts():
    """Deterministic shared corpus (with empty rows + duplicate re-sends)."""
    from vectrain_ray import synth

    return synth.generate_transcripts(num_convs=40, turns_per_conv=10, seed=11)


@pytest.fixture(scope="session")
def kg_result(small_transcripts, tmp_path_factory):
    """One full pipeline run shared by the e2e assertions (runs take ~20 s)."""
    import ray.data as rd

    from vectrain_ray.pipelines.kg import run_kg

    out = str(tmp_path_factory.mktemp("kg_out"))
    return run_kg(rd.from_arrow(small_transcripts), out_dir=out), out
