"""Typed-config validation (reference D5/D2 semantics: fail fast before any
work is scheduled)."""

import json

import pytest

from vectrain_ray.config import PipelineSpec


def test_valid_spec_roundtrip(tmp_path):
    d = {
        "source": {"kind": "parquet", "path": "/tmp/in"},
        "encoder": {"dim": 32, "concurrency": 2},
        "sink": {"out_dir": "/tmp/out", "num_parts": 4},
    }
    p = tmp_path / "spec.json"
    p.write_text(json.dumps(d))
    spec = PipelineSpec.load(str(p))
    assert spec.encoder.dim == 32
    assert spec.sink.num_parts == 4
    assert spec.resumable is True


def test_missing_path_rejected():
    with pytest.raises(ValueError, match="source.path"):
        PipelineSpec.from_dict({"sink": {"out_dir": "/tmp/x"}})


def test_unknown_source_kind_rejected():
    with pytest.raises(ValueError, match="source.kind"):
        PipelineSpec.from_dict(
            {"source": {"kind": "postgres", "path": "x"},
             "sink": {"out_dir": "/tmp/x"}}
        )


def test_unknown_key_rejected():
    with pytest.raises(ValueError, match="unknown EncoderSpec keys"):
        PipelineSpec.from_dict(
            {"source": {"path": "x"}, "encoder": {"dimension": 5},
             "sink": {"out_dir": "/tmp/x"}}
        )


def test_bad_threshold_rejected():
    with pytest.raises(ValueError, match="fuzzy_threshold"):
        PipelineSpec.from_dict(
            {"source": {"path": "x"}, "linker": {"fuzzy_threshold": 1.5},
             "sink": {"out_dir": "/tmp/x"}}
        )
