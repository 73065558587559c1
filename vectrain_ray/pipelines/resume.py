"""Resumable, partitioned KG pipeline — the checkpoint/exact-resume path.

Phases (each phase unit is idempotent + manifest-gated):

  0. shard      transcripts → shards/part=K/ by crc_bucket(conv_id, P)
                (conversation never splits; one-time layout shuffle)
  1. extract    per shard: filter+extract → extracted/part=K/ + the shard's
                surface-count partials surface_partials/part=K/ [manifest]
  2. canonical  global mapping rebuilt FROM THE STORED PARTIALS (mergeable
                sums → O(distinct surfaces), never re-reads mentions):
                mapping/ + link index                           [marker]
  3. link       per shard: triples → linked triples/part=K/ +
                edge partial aggregates edge_partials/part=K/   [manifest,
                records n_unsafe = link.count_unsafe_links]
  4. finalize   global: edge partials → edges/, mapping+degree → nodes/
                                                                [marker]

Killing the job anywhere and re-running converges to the same rows: shard
outputs are overwritten whenever their manifest is missing/stale, manifests
commit last (state/manifest.py), and every id is a stable hash. Per-shard
manifests carry row counts + wall time = the per-partition lineage/metrics.

Streaming appends are O(delta): a mapping rebuild invalidates phase 3 ONLY
for shards with mapping-DEPENDENT links — a shard with n_unsafe == 0 had
every surface resolve as an exact dict hit whose id is the pure per-surface
hash (see link.count_unsafe_links for the full soundness argument, which
also covers why any dict MISS — even a fallback that emitted the pure id —
forces a relink), so its committed output is provably unchanged by data
arriving elsewhere. Incremental ≡ one-shot stays exact
(test_stream.test_trickle_append_relinks_only_touched_parts).

At 100 TB: P = O(cluster size × few); phases 1/3 are embarrassingly parallel
per shard (each shard itself a streaming Ray Data pipeline); phases 2/4 only
touch pre-aggregated small tables — and per-poll cost tracks the delta, not
the corpus.
"""

from __future__ import annotations

import glob
import os
import time

import pyarrow as pa
import ray
import ray.data as rd

import logging

from .. import rules
from ..functions.dedup_exact import dedup_exact
from ..logs import log_event
from ..stages import canonicalize, materialize
from ..stages.encode import ENCODERS
from ..stages.extract import (
    extract_batch,
    filter_nonempty_text,
    mentions_table,
    triples_table,
)
from ..stages.link import (
    EntityLinker,
    ShardedEntityLinker,
    build_link_index,
    make_link_shard_actors,
    write_link_index,
)
from ..state.manifest import (
    PartitionManifest,
    clear_partition_outputs,
    partition_output_dir,
)

_LOG = logging.getLogger("vectrain_ray.resume")

TABLES_P1 = ["extracted", "surface_partials"]
TABLES_P3 = ["triples", "mentions", "edge_partials"]
# above this many mapping rows the n_unsafe skip criterion switches from a
# driver-side norm set to the distributed counter (stages/link.py) — same
# size class as the kg.BROADCAST_MAX_ENTITIES broadcast gate
UNSAFE_SET_MAX_ENTITIES = 2_000_000


def _shard(input_path: str, out_dir: str, num_parts: int,
           source_kind: str = "parquet") -> str:
    shards = os.path.join(out_dir, "shards")
    marker = os.path.join(shards, "_DONE")
    if os.path.exists(marker):
        return shards
    if source_kind == "parquet":
        ds = rd.read_parquet(input_path,
                             columns=["conv_id", "turn_idx", "text"])
    else:  # registry dispatch (SourceSpec.kind), then prune columns
        from ..sources.readers import get_reader

        ds = get_reader(source_kind)(input_path).select_columns(
            ["conv_id", "turn_idx", "text"])

    def add_part(t: pa.Table) -> pa.Table:
        # null conv_id (admissible input — run_kg tolerates it) buckets as
        # the empty string instead of crashing crc_bucket's .encode()
        parts = [rules.crc_bucket(c or "", num_parts)
                 for c in t["conv_id"].to_pylist()]
        return t.append_column("part", pa.array(parts, pa.int32()))

    ds.map_batches(add_part, batch_format="pyarrow").write_parquet(
        shards, partition_cols=["part"]
    )
    open(marker, "w").write("ok")
    return shards


def _shard_files(shards: str, part: int) -> list[str]:
    return sorted(glob.glob(os.path.join(shards, f"part={part}", "*.parquet")))


def _write_surface_partials(out_dir: str, part: int,
                            atomic: bool = False) -> None:
    """(Re)build one shard's surface-count partials from its committed
    extracted output. Tolerates an all-filtered shard (zero extracted
    files): the partials dir is simply absent, and phase 2 treats missing
    partials for an extracted-empty shard as zero mentions.

    ``atomic``: write to a tmp dir and rename — required by the backfill
    path, whose only completion signal is the dir's existence (the normal
    phase-1 call is covered by the manifest committing after it, so a
    half-written dir there is cleared and rewritten on resume)."""
    ext_files = sorted(glob.glob(os.path.join(
        out_dir, "extracted", f"part={part}", "*.parquet")))
    sp_dir = partition_output_dir(out_dir, "surface_partials", part)
    if not ext_files:
        return
    dest = sp_dir
    if atomic:
        import shutil

        dest = sp_dir.rstrip("/") + "__tmp"
        shutil.rmtree(dest, ignore_errors=True)
    canonicalize.surface_partials(
        rd.read_parquet(ext_files)
        .map_batches(mentions_table, batch_format="pyarrow")
    ).write_parquet(dest)
    if atomic:
        os.rename(dest, sp_dir)


def _backfill_surface_partials(out_dir: str, num_parts: int) -> int:
    """Upgrade path: output dirs written BEFORE the partials artifact
    existed have valid p1 manifests (so phase 1 skips) but no
    surface_partials — rebuilding the mapping from partials alone would
    then silently drop those shards' entities. Backfill any shard that has
    extracted output but no partials (one-time cost per migrated shard).
    Each shard's backfill is write-to-tmp + rename: the dir's existence is
    this path's only completion signal, so a crash mid-write must not
    leave a half-dir that a re-run would treat as complete (and then
    permanently truncate the mapping)."""
    import shutil

    n = 0
    for part in range(num_parts):
        sp_dir = os.path.join(out_dir, "surface_partials", f"part={part}")
        shutil.rmtree(sp_dir + "__tmp", ignore_errors=True)  # stale crash tmp
        ext = glob.glob(os.path.join(out_dir, "extracted", f"part={part}",
                                     "*.parquet"))
        sp = glob.glob(os.path.join(sp_dir, "*.parquet"))
        if ext and not sp:
            clear_partition_outputs(out_dir, ["surface_partials"], part)
            _write_surface_partials(out_dir, part, atomic=True)
            n += 1
    return n


def run_kg_resumable(
    input_path: str,
    out_dir: str,
    num_parts: int = 8,
    dim: int = 64,
    batch_size: int = 4096,
    fail_after_phase1_parts: int | None = None,
    max_task_retries: int = 2,
    link_shards: int = 0,
    encoder_kind: str = "hashing",
    encoder_kwargs: dict | None = None,
    fuzzy_threshold: float = 0.85,
    link_ann: str = "exact",
    link_ann_cells: int = 64,
    link_ann_probe: int | None = None,
    source_kind: str = "parquet",
    shard_parallelism: int | None = None,
) -> dict:
    """Run (or resume) the partitioned pipeline. ``fail_after_phase1_parts``
    injects a crash after N phase-1 shards (kill-point testing only).

    ``shard_parallelism``: phases 1 and 3 are independent per shard, so up
    to this many shard pipelines run CONCURRENTLY on driver threads (each
    is its own streaming Ray Data execution; Ray schedules their tasks onto
    the shared CPU pool). This overlaps the per-pipeline fixed cost
    (planning + actor spin-up, ~2 s each) that a serial loop pays P times —
    the difference between O(P) and O(P/threads) wall for small micro-
    batches. Default (None) auto-sizes to cluster CPUs // 8: each shard
    pipeline reserves ~4-6 CPU slots (two 2-actor pools + read/write
    tasks), and pool actors HOLD their slot while idle — oversubscribing a
    small cluster makes competing pipelines starve each other (measured:
    the 4-CPU test session crawled at 4 threads). Manifests are per-part
    files, so concurrent commits of DIFFERENT parts never race; the
    kill-injection path stays serial so "fail after N shards" remains
    deterministic for the resume tests."""
    if shard_parallelism is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        shard_parallelism = max(1, min(8, cpus // 8))
    os.makedirs(out_dir, exist_ok=True)
    man1 = PartitionManifest(os.path.join(out_dir, "p1_extract"))
    man3 = PartitionManifest(os.path.join(out_dir, "p3_link"))
    metrics: dict = {"skipped_p1": 0, "skipped_p3": 0}

    shards = _shard(input_path, out_dir, num_parts, source_kind)

    # ---- phase 1: per-shard extraction ----------------------------------
    p1_todo: list[tuple[int, list[str]]] = []
    for part in range(num_parts):
        files = _shard_files(shards, part)
        if not files:
            continue
        if man1.is_done(part, files):
            metrics["skipped_p1"] += 1
            continue
        p1_todo.append((part, files))

    def _run_p1(part: int, files: list[str]) -> None:
        t0 = time.time()
        clear_partition_outputs(out_dir, TABLES_P1, part)
        ext_dir = partition_output_dir(out_dir, "extracted", part)
        ds = rd.read_parquet(files)
        # shards contain whole conversations → per-shard input dedup is exact
        ds = dedup_exact(ds, ["conv_id", "turn_idx"], sort_within=["text"])
        ext = ds.map_batches(
            filter_nonempty_text, batch_format="pyarrow", batch_size=batch_size
        ).map_batches(extract_batch, batch_format="pyarrow", batch_size=batch_size)
        ext.write_parquet(ext_dir)
        # phase-1.5 artifact: the shard's surface-count partials. Mergeable
        # sums, so phase 2 rebuilds the GLOBAL mapping from every shard's
        # partials in O(distinct surfaces) — a streaming append re-reads
        # the new shards' mentions only, never the whole corpus.
        _write_surface_partials(out_dir, part)
        import pyarrow.parquet as pq

        n = sum(pq.read_metadata(f).num_rows
                for f in glob.glob(os.path.join(ext_dir, "*.parquet")))
        man1.commit(part, files, {"rows_out": n, "wall_sec": round(time.time() - t0, 3)})
        log_event(_LOG, f"p1 extract part={part} committed", phase="p1",
                  part=part, rows_out=n,
                  wall_sec=round(time.time() - t0, 3))

    if fail_after_phase1_parts is not None:
        # deterministic kill-point path (serial): exactly the first N todo
        # shards commit before the injected crash
        for done1, (part, files) in enumerate(p1_todo, start=1):
            _run_p1(part, files)
            if done1 >= fail_after_phase1_parts:
                raise RuntimeError("injected kill after phase-1 shard "
                                   f"{part} (testing resume)")
    elif p1_todo:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(
                max_workers=max(1, min(shard_parallelism, len(p1_todo)))
        ) as pool:
            # list() drains the iterator → first worker exception re-raises
            list(pool.map(lambda pf: _run_p1(*pf), p1_todo))

    # ---- phase 2: global canonicalization (small) -----------------------
    # The marker stores the fingerprint of the extracted/part=* inputs: if
    # phase 1 re-extracted anything (changed shard inputs), the mapping is
    # rebuilt AND every p3 manifest is invalidated — a stale entity mapping
    # makes every shard's linking output stale even when that shard's own
    # extracted files did not change.
    from ..state.manifest import _fingerprint

    _backfill_surface_partials(out_dir, num_parts)  # pre-partials out_dirs
    mapping_dir = os.path.join(out_dir, "mapping")
    mapping_marker = os.path.join(mapping_dir, "_DONE")
    sp_all = sorted(glob.glob(os.path.join(
        out_dir, "surface_partials", "part=*", "*.parquet")))
    ext_fp = _fingerprint(sp_all)
    marker_ok = False
    if os.path.exists(mapping_marker):
        try:
            marker_ok = open(mapping_marker).read() == ext_fp
        except OSError:
            marker_ok = False
    if not marker_ok:
        # O(distinct surfaces): the global mapping is rebuilt from the
        # per-shard count partials, not by re-reading every mention.
        # An all-empty corpus (every turn filtered) has no partials at all:
        # build the mapping from a zero-row partials table.
        if sp_all:
            partials_ds = rd.read_parquet(sp_all)
        else:
            partials_ds = canonicalize.surface_partials(rd.from_arrow(
                pa.table({"surface_form": pa.array([], pa.string())})))
        mapping = canonicalize.build_mapping_from_partials(partials_ds)
        import shutil

        if os.path.exists(mapping_dir):
            shutil.rmtree(mapping_dir)
        mapping.write_parquet(mapping_dir)
        # The mapping changed — but a shard's phase-3 output is a PURE
        # function of its own extracted input unless some surface resolved
        # through the mapping-dependent path: a fuzzy-cosine DEPARTURE from
        # the per-surface stable hash, or any dict MISS at all (a miss's
        # below-threshold fallback yields the pure id, yet whether it stays
        # below threshold depends on what entities exist — a later append
        # can flip it). Invalidate shards whose manifest records
        # n_unsafe > 0 (or pre-upgrade manifests lacking the counter);
        # everything else keeps its committed outputs, so a streaming
        # append relinks O(delta) shards, not O(corpus) — incremental ≡
        # one-shot is preserved exactly (test_stream). The marker commits
        # LAST: a crash before it re-runs this whole block on resume.
        for done_part in man3.completed_parts():
            meta = man3.load(done_part) or {}
            if meta.get("n_unsafe") != 0:
                man3.invalidate(done_part)
        open(mapping_marker, "w").write(ext_fp)
    shard_actors: list = []
    if link_shards:
        # sharded index artifact lives next to the mapping; rebuilt whenever
        # the mapping was rebuilt or the shard count changed
        index_dir = os.path.join(out_dir, "link_index")
        shards_marker = os.path.join(index_dir, "_SHARDS")
        # the marker binds BOTH the shard count and the mapping fingerprint
        # the index was built from: a crash between the mapping commit and
        # the index rebuild (or a shard-count change in between) must not
        # let phase 3 link against a stale index
        want = f"{link_shards}|{ext_fp}"
        index_ok = marker_ok and os.path.exists(shards_marker) and \
            open(shards_marker).read() == want
        if not index_ok:
            write_link_index(rd.read_parquet(mapping_dir), index_dir,
                             link_shards)
            open(shards_marker, "w").write(want)
        shard_actors = make_link_shard_actors(
            index_dir, link_shards, dim=dim, ann=link_ann,
            n_cells=link_ann_cells, n_probe=link_ann_probe)
        linker_cls: type = ShardedEntityLinker
        linker_kwargs: dict = {"shard_handles": shard_actors, "dim": dim,
                               "fuzzy_threshold": fuzzy_threshold}
    else:
        mapping_df = rd.read_parquet(mapping_dir).to_pandas()
        index_ref = ray.put(build_link_index(mapping_df, dim=dim))
        linker_cls = EntityLinker
        linker_kwargs = {"index_ref": index_ref, "dim": dim,
                         "fuzzy_threshold": fuzzy_threshold}

    import threading

    _norms_lock = threading.Lock()
    _metrics_lock = threading.Lock()
    _lazy: dict = {"mapping_norms": None, "n_map_rows": None}
    # ---- phase 3: per-shard linking + mention encoding + edge partials --
    p3_todo: list[tuple[int, list[str]]] = []
    for part in range(num_parts):
        ext_files = sorted(
            glob.glob(os.path.join(out_dir, "extracted", f"part={part}", "*.parquet"))
        )
        if not ext_files:
            continue
        if man3.is_done(part, ext_files):
            metrics["skipped_p3"] += 1
            continue
        p3_todo.append((part, ext_files))

    def _run_p3(part: int, ext_files: list[str]) -> None:
        with _metrics_lock:
            metrics.setdefault("p3_parts_run", []).append(part)
        t0 = time.time()
        clear_partition_outputs(out_dir, TABLES_P3, part)
        ext = rd.read_parquet(ext_files)

        mentions = ext.map_batches(
            mentions_table, batch_format="pyarrow"
        ).map_batches(
            ENCODERS[encoder_kind],
            fn_constructor_kwargs={"dim": dim, **(encoder_kwargs or {})},
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=2,
            **({"max_task_retries": max_task_retries} if max_task_retries else {}),
        )
        # overlap the encode+write with the link→edges chain below (the
        # kg.py driver-thread write-overlap pattern): the two sinks share no
        # state, and the shard's wall was 3 serial executions' fixed cost.
        # Gated on cluster size: concurrent executions mean BOTH actor
        # pools (2 encoders + 2 linkers) hold CPU slots at once, which on a
        # ≤4-CPU session leaves zero slots for the map/write tasks feeding
        # them — same starvation mode as the shard_parallelism auto-gate
        mentions_dir = partition_output_dir(out_dir, "mentions", part)
        if int(ray.cluster_resources().get("CPU", 8)) >= 16:
            from concurrent.futures import ThreadPoolExecutor as _TPE

            with _TPE(max_workers=1) as _mw:
                mentions_fut = _mw.submit(mentions.write_parquet,
                                          mentions_dir)
                n_tr, n_unsafe = _run_p3_tail(part, ext)
                mentions_fut.result()  # propagate encode/write failures
        else:
            mentions.write_parquet(mentions_dir)
            n_tr, n_unsafe = _run_p3_tail(part, ext)
        # commit LAST, after BOTH sinks are durable — a commit racing the
        # mentions write could mark a shard done with missing mentions
        man3.commit(part, ext_files,
                    {"triples_out": n_tr, "n_unsafe": n_unsafe,
                     "wall_sec": round(time.time() - t0, 3)})
        log_event(_LOG, f"p3 link part={part} committed", phase="p3",
                  part=part, triples_out=n_tr,
                  wall_sec=round(time.time() - t0, 3))

    def _run_p3_tail(part: int, ext) -> tuple[int, int]:
        triples = ext.map_batches(triples_table, batch_format="pyarrow")
        linked = triples.map_batches(
            linker_cls,
            fn_constructor_kwargs=linker_kwargs,
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=2,
            # no max_task_retries: ctor arg is an object-store ref — actor
            # pools with max_restarts>0 + object-store ctor args can deadlock
            # restarts (ray#53727); see pipelines/kg.py
        )
        tr_dir = partition_output_dir(out_dir, "triples", part)
        linked.write_parquet(tr_dir)

        import pyarrow.parquet as pq

        # a shard with mentions but ZERO triples (no sentence matched the
        # predicate vocabulary) writes no files at all — read_parquet([])
        # raises, so the edge-partial step must skip such shards instead of
        # permanently wedging every resume on the same crash
        tr_files = sorted(glob.glob(os.path.join(tr_dir, "*.parquet")))
        if tr_files:
            # per-shard edge partials: combiner + bucketed merge → tiny rows
            ep = (
                rd.read_parquet(tr_files)
                .map_batches(materialize.partial_edges,
                             batch_format="pyarrow")
                .groupby("bucket")
                .map_groups(materialize._finalize_edges_bucket,
                            batch_format="pandas")
            )
            ep.write_parquet(partition_output_dir(out_dir, "edge_partials",
                                                  part))
        n_tr = sum(pq.read_metadata(f).num_rows for f in tr_files)
        from ..stages.link import (count_unsafe_links,
                                   count_unsafe_links_distributed)

        with _norms_lock:  # footer scan once per run, reuse per part
            if _lazy["n_map_rows"] is None:
                _lazy["n_map_rows"] = sum(
                    pq.read_metadata(f).num_rows
                    for f in glob.glob(os.path.join(mapping_dir,
                                                    "*.parquet")))
        if not tr_files:
            n_unsafe = 0
        elif (_lazy["n_map_rows"] >= UNSAFE_SET_MAX_ENTITIES
              or n_tr >= UNSAFE_SET_MAX_ENTITIES):
            # distributed when EITHER side is driver-hostile: a small
            # vocabulary over a huge corpus still means shard-sized
            # triples, which the small branch loads as one pandas frame
            # big-mapping regime: neither the shard's triples nor the
            # mapping norms touch the driver (stages/link.py)
            n_unsafe = count_unsafe_links_distributed(tr_files, mapping_dir)
        else:
            with _norms_lock:  # load once per run, reuse per part
                if _lazy["mapping_norms"] is None:
                    _lazy["mapping_norms"] = set(
                        pq.read_table(mapping_dir, columns=["surface_norm"])
                        ["surface_norm"].to_pylist())
            n_unsafe = count_unsafe_links(
                pq.read_table(tr_files, columns=["subj", "obj", "subj_id",
                                                 "obj_id"]).to_pandas(),
                _lazy["mapping_norms"],
            )
        return n_tr, n_unsafe

    if p3_todo:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(
                max_workers=max(1, min(shard_parallelism, len(p3_todo)))
        ) as pool:
            list(pool.map(lambda pf: _run_p3(*pf), p3_todo))
    if "p3_parts_run" in metrics:
        metrics["p3_parts_run"].sort()  # thread completion order varies

    for a in shard_actors:  # linking done → free the index actors
        ray.kill(a)

    # ---- phase 4: global finalize (small pre-aggregated inputs) ---------
    final_marker = os.path.join(out_dir, "_FINAL_DONE")
    ep_all = sorted(glob.glob(os.path.join(out_dir, "edge_partials", "part=*", "*.parquet")))
    import shutil

    for tbl in ("edges", "nodes"):
        p = os.path.join(out_dir, tbl)
        if os.path.exists(p):
            shutil.rmtree(p)
    if os.path.exists(final_marker):
        os.remove(final_marker)

    if ep_all:
        ep = rd.read_parquet(ep_all).map_batches(
            materialize.finalized_to_partial_rows, batch_format="pyarrow"
        )
    else:  # zero triples corpus-wide → empty partial-row table
        ep = rd.from_arrow(pa.table({
            "src_id": pa.array([], pa.string()),
            "dst_id": pa.array([], pa.string()),
            "pred": pa.array([], pa.string()),
            "prov": pa.array([], pa.string()),
            "cnt": pa.array([], pa.int64()),
            "bucket": pa.array([], pa.int32()),
        }))
    edges = ep.groupby("bucket").map_groups(
        materialize._finalize_edges_bucket, batch_format="pandas"
    ).materialize()
    edges.map_batches(materialize.prov_to_struct, batch_format="pyarrow").write_parquet(
        os.path.join(out_dir, "edges")
    )
    degree_partials = edges.map_batches(
        materialize.partial_degrees, batch_format="pyarrow"
    )
    mapping = rd.read_parquet(mapping_dir)
    materialize.nodes_with_degree(mapping, degree_partials).write_parquet(
        os.path.join(out_dir, "nodes")
    )
    open(final_marker, "w").write("ok")

    metrics["p1_parts"] = man1.completed_parts()
    metrics["p3_parts"] = man3.completed_parts()
    return metrics
