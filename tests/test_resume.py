"""Exact resume: kill mid-run → resume → identical rows to a clean run
(SURVEY.md §5 test 3 / BASELINE.md resume-correctness target)."""

import glob
import os

import pandas as pd
import pytest
import ray.data as rd

from vectrain_ray.pipelines.resume import run_kg_resumable
from vectrain_ray.synth import write_transcripts


@pytest.fixture(scope="module")
def transcripts_path(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("resume_in"))
    write_transcripts(d, num_convs=30, turns_per_conv=8, seed=5, num_files=4)
    return d


def _load(out_dir, table):
    files = sorted(glob.glob(os.path.join(out_dir, table, "**", "*.parquet"),
                             recursive=True))
    df = rd.read_parquet(files).to_pandas().astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_kill_and_resume_identical(transcripts_path, tmp_path):
    clean = str(tmp_path / "clean")
    killed = str(tmp_path / "killed")

    m = run_kg_resumable(transcripts_path, clean, num_parts=4)
    assert len(m["p1_parts"]) >= 1

    with pytest.raises(RuntimeError, match="injected kill"):
        run_kg_resumable(transcripts_path, killed, num_parts=4,
                         fail_after_phase1_parts=2)
    # resume: must skip the completed shards and converge
    m2 = run_kg_resumable(transcripts_path, killed, num_parts=4)
    assert m2["skipped_p1"] >= 2

    for table in ("nodes", "edges", "triples"):
        a, b = _load(clean, table), _load(killed, table)
        pd.testing.assert_frame_equal(a, b), table


def test_second_run_skips_everything(transcripts_path, tmp_path):
    out = str(tmp_path / "twice")
    run_kg_resumable(transcripts_path, out, num_parts=4)
    before = _load(out, "edges")
    m = run_kg_resumable(transcripts_path, out, num_parts=4)
    # all per-shard work skipped on the second run
    assert m["skipped_p1"] == len(m["p1_parts"])
    assert m["skipped_p3"] == len(m["p3_parts"])
    after = _load(out, "edges")
    pd.testing.assert_frame_equal(before, after)


def test_stale_fingerprint_forces_reprocess(transcripts_path, tmp_path):
    out = str(tmp_path / "stale")
    run_kg_resumable(transcripts_path, out, num_parts=4)
    # tamper with one shard's input → fingerprint mismatch → re-run that shard
    shard_files = sorted(glob.glob(os.path.join(out, "shards", "part=0", "*.parquet")))
    with open(shard_files[0], "ab") as f:
        f.write(b"\0")  # size change only; parquet footer still readable? no —
    # rewrite properly: copy file to itself doubled is invalid parquet; instead
    # just check is_done flips false via the manifest API
    from vectrain_ray.state.manifest import PartitionManifest

    man = PartitionManifest(os.path.join(out, "p1_extract"))
    assert not man.is_done(0, shard_files)


def test_pre_partials_out_dir_is_backfilled(transcripts_path, tmp_path):
    """Upgrade path: an out_dir written before the surface_partials artifact
    existed (simulated by deleting partials + mapping marker while p1
    manifests stay valid) must be backfilled — the mapping is rebuilt from
    ALL shards, never a silently truncated subset — and converge to the
    same bytes."""
    import shutil

    out = str(tmp_path / "old_layout")
    run_kg_resumable(transcripts_path, out, num_parts=4)
    before = {t: _load(out, t) for t in ("nodes", "edges", "triples")}

    shutil.rmtree(os.path.join(out, "surface_partials"))
    os.remove(os.path.join(out, "mapping", "_DONE"))

    m = run_kg_resumable(transcripts_path, out, num_parts=4)
    assert m["skipped_p1"] == len(m["p1_parts"])  # p1 itself untouched
    # partials were backfilled for every extracted shard
    for part in m["p1_parts"]:
        assert glob.glob(os.path.join(out, "surface_partials",
                                      f"part={part}", "*.parquet")), part
    for t in ("nodes", "edges", "triples"):
        pd.testing.assert_frame_equal(before[t], _load(out, t)), t
