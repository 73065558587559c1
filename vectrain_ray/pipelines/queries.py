"""The operator-coverage query registry (driver contract, SURVEY.md §2/§7.9).

Every entry returns a Ray Dataset / pyarrow Table computed Ray-Data-first
(column-pruned reads, vectorized batch kernels, partial pre-aggregation
before every groupby) and has — where SQL-expressible — an exactly-matching
DuckDB oracle in ORACLE_SQL (same column NAMES and values; floats rounded
identically on both sides).

Reference parity notes: q_filter_project/T2 mirrors the empty-text admission
rule (http/client.go:90-97); q_id_backfill/T3 the ID:=UUID backfill
(kafka/fetch_messages.go:71-73); q_typed_projection/T4 the typed payload
casts (qdrant/store.go:53-89); the kg_* queries exercise the full
extraction→linking→canonicalization→materialization path with a SQL oracle
built from the templated TPC-H transcripts (pipelines/tpch_kg.py).
"""

from __future__ import annotations

import functools
import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data as rd
from ray.data.aggregate import Max, Min, Sum

from ..functions import textops
from ..functions.dedup import dedup_minhash, simhash_candidate_pairs
from ..functions.dedup_exact import dedup_exact, key_buckets
from ..functions.similarity import neardup_pairs_cosine, topk_cosine
from ..stages.extract import extract_batch, filter_nonempty_text, triples_table
from ..synth import transcripts_from_documents
from .kg import run_kg
from .tpch_kg import tpch_transcripts


def _read(sf_dir: str, table: str, columns=None):
    """Column-pruned parquet read with an explicit METADATA-FREE schema
    (see sources.readers._stripped_schema — ONE shared implementation of
    the unhashable-pandas-metadata fix; a second copy here would drift)."""
    from ..sources.readers import _stripped_schema

    path = os.path.join(sf_dir, f"{table}.parquet")
    return rd.read_parquet(path, columns=columns,
                           schema=_stripped_schema(path, columns))


def _doc_tokens(t: pa.Table, text_col: str = "text"):
    """ORACLE-LOCKED tokenization shared by every token-based op:
    trim(lower(coalesce(text,''))) split on RE2 ``\\s+``; callers drop
    empty tokens via ``keep`` (split of "" yields [""]). The DuckDB mirror
    is ``list_filter(regexp_split_to_array(trim(lower(coalesce(text,''))),
    '\\s+'), x -> x <> '')`` — change BOTH or NEITHER, or oracle parity
    silently diverges across the 8 token-based ops.

    Returns (toks, words, keep, parents): per-row list array, flattened
    tokens, nonempty-token mask, and list-parent row indices."""
    trimmed = pc.utf8_trim_whitespace(
        pc.utf8_lower(pc.fill_null(t[text_col], ""))
    ).combine_chunks()
    toks = pc.split_pattern_regex(trimmed, pattern=r"\s+")
    words = pc.list_flatten(toks)
    keep = pc.not_equal(words, "")
    parents = pc.list_parent_indices(toks)
    return toks, words, keep, parents


def _join_partitions(per_cpu_divisor: int = 2, cap: int = 16) -> int:
    """Hash-join partition count sized to the cluster: the join's
    aggregator actors each reserve a CPU slot, and an oversized pool stalls
    scheduling on small clusters (observed at num_partitions=16 with 4
    CPUs). Joins whose inputs are combiner-reduced (bounded by distinct
    keys, not raw rows) pass a larger divisor: each aggregator actor costs
    ~0.5 s of startup, so a join moving a few MB wants FEW partitions
    (measured at sf0.1: 16 → 4 partitions = 4.5 → 2.7 s), while raw-row
    joins keep the denser default."""
    cpus = int(ray.cluster_resources().get("CPU", 4))
    return max(2, min(cap, cpus // per_cpu_divisor))


def _broadcast_keyset_filter(ds, col: str, keys: pa.Array, keep: bool,
                             distinct: bool = True):
    """Broadcast-membership filter: keep (or drop) rows of ``ds`` whose
    ``col`` is in the broadcast key set (ships once via ray.put).
    ``distinct=True`` first collapses ``ds`` to distinct ``col`` values —
    the set-op shape (INTERSECT / EXCEPT); ``distinct=False`` filters the
    full rows — the SEMI / ANTI join shape."""
    ref = ray.put(keys)
    probe = dedup_exact(ds, [col]) if distinct else ds

    class KeySetFilter:
        def __init__(self):
            self.keys = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ks = pc.cast(self.keys, t[col].type)
            mask = pc.is_in(t[col], value_set=ks)
            if not keep:
                mask = pc.invert(mask)
            return t.filter(mask)

    return probe.map_batches(KeySetFilter, batch_format="pyarrow",
                             concurrency=(1, 2))


def _bucketed(ds, keys: list[str], n: int = 64):
    """Append the process-stable shuffle ``bucket`` column for ``keys`` —
    the front half of the repo's bucket-then-vectorize pattern (one
    map_groups call per bucket, never per key)."""
    from ..functions.dedup_exact import key_buckets

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df["bucket"] = key_buckets(df, keys, n)
        return df

    return ds.map_batches(add_bucket, batch_format="pandas",
                          batch_size=65536)


def _round_half_away(arr, nd: int) -> pa.Array:
    """DuckDB round(): half AWAY from zero. pc.round / pandas .round are
    half-to-even, which differs on exactly-representable midpoints
    (pc.round(1234.125, 2) = 1234.12; DuckDB = 1234.13)."""
    x = np.asarray(pc.cast(arr, pa.float64()).to_numpy(zero_copy_only=False),
                   dtype=np.float64)
    scale = 10.0 ** nd
    return pa.array(np.sign(x) * np.floor(np.abs(x) * scale + 0.5) / scale,
                    pa.float64())


def _round_cols(cols: dict[str, int]):
    def fn(t: pa.Table) -> pa.Table:
        for c, nd in cols.items():
            i = t.schema.get_field_index(c)
            t = t.set_column(i, c, _round_half_away(t[c], nd))
        return t

    return fn


# --- per-batch / projection ops (T2–T5) -----------------------------------
def q_filter_project(sf_dir: str):
    """Empty-text admission + predicate filter + projection, pushed TO THE
    READ: the predicates ride read_parquet's fragment ``filter`` (pyarrow
    dataset expression → row-group statistics pruning + scan-level row
    filtering, so non-matching rows never leave storage) and only the
    needed columns are scanned. The map stage is a pure projection. This
    is the prune-at-the-read shape every 100 TB ingest wants — the same
    predicate as a kernel-side filter would move every row off disk
    first."""
    import pyarrow.dataset as pads

    path = os.path.join(sf_dir, "documents.parquet")
    # fill_null(text,'') <> '' ≡ text IS NOT NULL AND text <> ''
    expr = ((pads.field("n_chars") > 100)
            & pads.field("text").is_valid()
            & (pads.field("text") != ""))
    # pyarrow evaluates the filter on NON-projected columns, so the wide
    # text column never enters the object store at all — and the read IS
    # the whole op (no map stage). No explicit schema here: a filter field
    # outside the projection is incompatible with a user schema, and the
    # schema-hash warning this guards against only fires on shuffles.
    return rd.read_parquet(path, columns=["doc_id", "lang", "n_chars"],
                           filter=expr)


def q_id_backfill(sf_dir: str):
    """Vectorized if_else ID normalization (reference fetch_messages.go:71-73)."""
    ds = _read(sf_dir, "documents", ["doc_id", "source"])

    def fn(t: pa.Table) -> pa.Table:
        src = pc.fill_null(t["source"], "")
        fallback = pc.binary_join_element_wise(
            pa.array(["doc-"] * t.num_rows),
            pc.cast(t["doc_id"], pa.string()), "",
        )
        idn = pc.if_else(pc.equal(src, ""), fallback, src)
        return pa.table({"doc_id": t["doc_id"], "id_norm": idn})

    return ds.map_batches(fn, batch_format="pyarrow")


def q_read_json(sf_dir: str):
    """T1 (JSON parse / schema-on-read, kafka/fetch_messages.go:33-34):
    documents round-tripped once to JSONL under /tmp, ingested with
    ray.data.read_json, typed projection pushed to Arrow. Oracle reads the
    same columns from the parquet view — value-exact."""
    import hashlib as _hl

    src = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(src)
    fp = f"{st.st_size}:{st.st_mtime_ns}"  # regenerate when the corpus does
    tag = _hl.md5(sf_dir.encode()).hexdigest()[:8]
    jdir = f"/tmp/vectrain_json_{tag}"
    marker = os.path.join(jdir, "_DONE")
    jpath = os.path.join(jdir, "docs.jsonl")
    if not (os.path.exists(marker) and os.path.exists(jpath)
            and open(marker).read() == fp):
        os.makedirs(jdir, exist_ok=True)
        t = pq.read_table(src, columns=["doc_id", "lang", "n_chars"])
        # atomic publish: a concurrent process re-reading mid-rewrite must
        # never see a truncated file (tmp is per-pid, rename is atomic)
        tmp = f"{jpath}.{os.getpid()}.tmp"
        t.to_pandas().to_json(tmp, orient="records", lines=True)
        os.replace(tmp, jpath)
        mtmp = f"{marker}.{os.getpid()}.tmp"
        open(mtmp, "w").write(fp)
        os.replace(mtmp, marker)
    ds = rd.read_json(jpath)
    sch = pq.read_schema(os.path.join(sf_dir, "documents.parquet"))

    def fn(t: pa.Table) -> pa.Table:
        # cast back to the parquet column types (JSON numbers arrive int64)
        return pa.table(
            {c: pc.cast(t[c], sch.field(c).type)
             for c in ("doc_id", "lang", "n_chars")}
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def q_typed_projection(sf_dir: str):
    """Typed projection + cast with zero-value defaults (qdrant/store.go:53-89)."""
    ds = _read(sf_dir, "events", ["event_id", "event_type", "value", "props"])

    def fn(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": t["event_id"],
                "event_type": t["event_type"],
                "value_floor": pc.cast(pc.floor(t["value"]), pa.int64()),
                "props_str": pc.fill_null(t["props"], ""),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


# --- aggregation ----------------------------------------------------------
def q_groupby_agg(sf_dir: str):
    """TPC-H-Q1-style grouped aggregate with the partial+final pattern: each
    batch collapses to ≤ (#groups) rows in Arrow C++ BEFORE the shuffle."""
    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity",
                "l_extendedprice", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        disc = pc.multiply(t["l_extendedprice"], pc.subtract(1.0, t["l_discount"]))
        t = t.append_column("disc_price", disc)
        g = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("l_quantity", "sum"), ("l_extendedprice", "sum"),
             ("disc_price", "sum"), ([], "count_all")]  # count(*) parity:
            # a NULL l_quantity must still count the row
        )
        return g.rename_columns(
            ["l_returnflag", "l_linestatus", "p_qty", "p_base", "p_disc", "p_cnt"]
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("p_qty", alias_name="sum_qty"),
            Sum("p_base", alias_name="sum_base_price"),
            Sum("p_disc", alias_name="sum_disc_price"),
            Sum("p_cnt", alias_name="count_order"),
        )
    )
    return out.map_batches(
        _round_cols({"sum_qty": 2, "sum_base_price": 2, "sum_disc_price": 2}),
        batch_format="pyarrow",
    )


def q_grouped_median(sf_dir: str):
    """Exact grouped quantile via the value-count combiner: each batch
    collapses to (group, value, count) in Arrow C++, counts merge in one
    tiny groupby, and the discrete median (DuckDB quantile_disc semantics:
    element at floor((n-1)/2) of the sorted multiset) is read off the CDF.
    Exact at any scale when the VALUE domain is bounded (quantities, ages,
    scores) — the classic alternative to t-digest sketches."""
    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["l_returnflag", "l_quantity"]).aggregate(
            [("l_quantity", "count")]
        )
        return g.rename_columns(["l_returnflag", "l_quantity", "p_cnt"])

    merged = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby(["l_returnflag", "l_quantity"])
        .aggregate(Sum("p_cnt", alias_name="cnt"))
    )

    def cdf_median(df: pd.DataFrame) -> pd.DataFrame:
        out_g, out_m = [], []
        for flag, g in df.groupby("l_returnflag", sort=True):
            g = g.sort_values("l_quantity", kind="stable")
            n = int(g["cnt"].sum())
            idx = (n - 1) // 2  # discrete lower median
            cum = g["cnt"].cumsum()
            v = g.loc[cum > idx, "l_quantity"].iloc[0]
            out_g.append(flag)
            out_m.append(float(v))
        return pd.DataFrame({"l_returnflag": out_g, "median_qty": out_m})

    # merged is ≤ (#groups × #distinct values) rows → one task reads the CDF
    return merged.repartition(1).map_batches(
        cdf_median, batch_format="pandas", batch_size=None)


def q_set_intersect(sf_dir: str):
    """Set intersection: customer keys that are ALSO event users — bucketed
    distinct + broadcast key-set filter (the positive twin of set_except)."""
    cust = _read(sf_dir, "customer", ["c_custkey"])
    ukeys = pc.unique(pq.read_table(os.path.join(sf_dir, "events.parquet"),
                                    columns=["user_id"])["user_id"]
                      .combine_chunks())
    return _broadcast_keyset_filter(cust, "c_custkey", ukeys, keep=True)


def q_sort_topk(sf_dir: str):
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    return ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(10)


def q_distinct(sf_dir: str):
    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_linestatus"])
    return dedup_exact(ds, ["l_returnflag", "l_linestatus"])


def q_broadcast_join(sf_dir: str):
    """customer ⋈ nation ⋈ region with both small sides broadcast via
    ray.put (dimension-table pattern — zero shuffle for the join itself)."""
    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet"))
    region = pq.read_table(os.path.join(sf_dir, "region.parquet"))
    r_name = dict(zip(region["r_regionkey"].to_pylist(), region["r_name"].to_pylist()))
    nk2region = {
        nk: r_name[rk]
        for nk, rk in zip(nation["n_nationkey"].to_pylist(),
                          nation["n_regionkey"].to_pylist())
    }
    lookup_ref = ray.put(nk2region)

    class AddRegion:
        def __init__(self):
            # broadcast lookup as Arrow key/value arrays: index_in + take is
            # the vectorized dictionary-join idiom (no per-row dict.get)
            lut = ray.get(lookup_ref)
            self.keys = pa.array(list(lut.keys()))
            self.vals = pa.array(list(lut.values()), pa.string())

        def __call__(self, t: pa.Table) -> pa.Table:
            idx = pc.index_in(t["c_nationkey"], value_set=self.keys)
            t = t.append_column("r_name", pc.take(self.vals, idx))
            g = t.group_by("r_name").aggregate(
                [("c_acctbal", "sum"), ([], "count_all")]  # count(*)
            )
            return g.rename_columns(["r_name", "p_bal", "p_cnt"])

    ds = _read(sf_dir, "customer", ["c_custkey", "c_nationkey", "c_acctbal"])
    out = (
        ds.map_batches(AddRegion, batch_format="pyarrow", concurrency=(1, 2))
        .groupby("r_name")
        .aggregate(Sum("p_cnt", alias_name="n_customers"),
                   Sum("p_bal", alias_name="sum_acctbal"))
    )
    return out.map_batches(_round_cols({"sum_acctbal": 2}), batch_format="pyarrow")


def q_hash_join(sf_dir: str):
    """orders ⋈ customer, both sides large → Ray hash join (hash-partitioned
    on the key), then partial+final aggregate per market segment.

    Combiner-first: orders are pre-aggregated per custkey INSIDE
    map_batches before the join, so the shuffle moves ≤ |distinct custkeys|
    rows per side instead of every order row — the shape that matters at
    100 TB, and measured 4.6 → 2.7 s at sf0.1/32 CPUs together with the
    smaller key-bounded partition count."""
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])

    def pre(t: pa.Table) -> pa.Table:
        g = t.group_by("o_custkey").aggregate(
            [("o_totalprice", "sum"), ([], "count_all")]  # count(*)
        )
        return g.rename_columns(["o_custkey", "p_rev", "p_cnt"])

    nparts = _join_partitions(per_cpu_divisor=8)  # key-bounded sides
    joined = orders.map_batches(pre, batch_format="pyarrow").join(
        cust, join_type="inner", num_partitions=nparts,
        on=("o_custkey",), right_on=("c_custkey",))

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by("c_mktsegment").aggregate(
            [("p_rev", "sum"), ("p_cnt", "sum")]
        )
        return g.rename_columns(["c_mktsegment", "p_rev", "p_cnt"])

    out = (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("c_mktsegment")
        .aggregate(Sum("p_rev", alias_name="revenue"),
                   Sum("p_cnt", alias_name="n_orders"))
    )
    return out.map_batches(_round_cols({"revenue": 2}), batch_format="pyarrow")


def q_sessionize(sf_dir: str):
    """Per-user session counting (30-min gap rule): hash-BUCKET user_id into
    64 coarse partitions, then ONE vectorized pass per bucket — sort by
    (user_id, ts), a session break is a user change or a >30-min gap
    (groupby(user_id).map_groups would be one Python call per user KEY —
    the measured-100×-slower trap; see functions/dedup_exact.py)."""
    ds = _read(sf_dir, "events", ["user_id", "ts"])


    def sessions_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"], kind="stable")
        new_user = g["user_id"].ne(g["user_id"].shift())
        gap = g["ts"].diff() > pd.Timedelta(minutes=30)
        brk = (new_user | gap).astype("int64")
        out = (
            pd.DataFrame({"user_id": g["user_id"].values, "brk": brk.values})
            .groupby("user_id", sort=False)["brk"].sum().reset_index()
        )
        return out.rename(columns={"brk": "n_sessions"})

    return (
        _bucketed(ds, ["user_id"])
        .groupby("bucket")
        .map_groups(sessions_bucket, batch_format="pandas")
    )


def q_window_tumbling(sf_dir: str):
    """Tumbling 1-hour event-time window via floor_temporal + partial+final
    aggregate (no watermark needed: bounded input)."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        hb = pc.floor_temporal(t["ts"], unit="hour")
        t = t.append_column("hour_bucket", hb)
        g = t.group_by(["user_id", "hour_bucket"]).aggregate(
            [("value", "sum"), ([], "count_all")]  # count(*) parity
        )
        g = g.rename_columns(["user_id", "hour_bucket", "p_sum", "p_cnt"])
        # shuffle bucket computed IN Arrow (no pandas round-trip): Fibonacci
        # hash of user_id xor the hour's epoch value, & 31 (process-stable)
        uid = pc.cast(g["user_id"], pa.uint64())
        tsi = pc.cast(pc.cast(g["hour_bucket"], pa.int64()), pa.uint64())
        h = pc.bit_wise_xor(pc.multiply(uid, pa.scalar(0x9E3779B1, pa.uint64())), tsi)
        bucket = pc.cast(pc.bit_wise_and(h, pa.scalar(31, pa.uint64())), pa.int32())
        return g.append_column("bucket", bucket)

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["user_id", "hour_bucket"], sort=True).agg(
            n_events=("p_cnt", "sum"), sum_value=("p_sum", "sum")
        ).reset_index()
        v = out["sum_value"].to_numpy(dtype=np.float64)
        # DuckDB half-away rounding, not pandas half-even (_round_half_away)
        out["sum_value"] = np.sign(v) * np.floor(np.abs(v) * 100.0 + 0.5) / 100.0
        out["n_events"] = out["n_events"].astype("int64")
        return out

    # bucketed final merge: one Python call per bucket, vectorized within —
    # ~5× faster than the row-level sort-based aggregate at ~100k keys
    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby("bucket")
        .map_groups(merge_bucket, batch_format="pandas")
    )


def q_running_total(sf_dir: str):
    """Running per-key aggregate (the ordered window-function class):
    cumulative event count per user ordered by (ts, event_id). Same
    bucket-then-vectorize shape as sessionize — users hash into 64 coarse
    buckets, ONE sorted cumcount pass per bucket (never per user key);
    exact SQL mirror via count(*) OVER (PARTITION BY ... ORDER BY ...)."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id"])


    def running_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        out = pd.DataFrame(
            {
                "user_id": g["user_id"].values,
                "event_id": g["event_id"].values,
                "running_n": (g.groupby("user_id", sort=False).cumcount()
                              + 1).astype("int64").values,
            }
        )
        return out

    return (
        _bucketed(ds, ["user_id"])
        .groupby("bucket")
        .map_groups(running_bucket, batch_format="pandas")
    )


_SLIDE_W = 3600  # window width (sec)
_SLIDE_S = 900   # slide step (sec) → each event lands in 4 windows


def q_window_sliding(sf_dir: str):
    """Sliding event-time window (1 h wide, 15 min step): each event is
    exploded to its width/step windows VECTORIZED (numpy repeat on integer
    window indices — no per-row Python), partial-aggregated per
    (window, event_type) inside the batch, then one bucketed final merge.
    The multi-window explode is the canonical sliding-window shape: shuffle
    volume is (width/step) × the PARTIAL rows, never × the events."""
    ds = _read(sf_dir, "events", ["event_type", "ts"])
    n_win = _SLIDE_W // _SLIDE_S

    def partial(t: pa.Table) -> pa.Table:
        sec = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        sec = sec // 1_000_000  # timestamp[us] → epoch seconds
        hi = sec // _SLIDE_S  # last window index containing the event
        # windows hi-n_win+1 .. hi  (those whose [start, start+W) cover ts)
        wi = (np.repeat(hi, n_win)
              - np.tile(np.arange(n_win, dtype=np.int64), len(hi)))
        et = np.repeat(
            np.asarray(t["event_type"].to_pylist(), dtype=object), n_win)
        df = pd.DataFrame({"window_start": wi * _SLIDE_S, "event_type": et})
        g = df.groupby(["window_start", "event_type"], sort=False).size() \
            .reset_index(name="p_cnt")
        from ..functions.dedup_exact import key_buckets

        g["bucket"] = key_buckets(g, ["window_start"], 32)
        return pa.Table.from_pandas(g, preserve_index=False)

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["window_start", "event_type"], sort=True)["p_cnt"] \
            .sum().reset_index(name="n_events")
        out["n_events"] = out["n_events"].astype("int64")
        return out

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby("bucket")
        .map_groups(merge_bucket, batch_format="pandas")
    )


def q_heavy_hitters(sf_dir: str):
    """Frequency top-k (the heavy-hitters sketch's exact form): per-batch
    partial counts in Arrow C++ → tiny groupby sum → global top-20 with a
    deterministic (count desc, key asc) tie-break. At 100 TB the partial
    pass bounds shuffle rows by (#batches × #distinct-in-batch)."""
    ds = _read(sf_dir, "lineitem", ["l_partkey"])

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by("l_partkey").aggregate([("l_partkey", "count")])
        return g.rename_columns(["l_partkey", "p_cnt"])

    out = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby("l_partkey")
        .aggregate(Sum("p_cnt", alias_name="cnt"))
    )
    return out.sort(["cnt", "l_partkey"], descending=[True, False]).limit(20)


def q_set_except(sf_dir: str):
    """Set difference (EXCEPT): customer keys minus event-user keys —
    bucketed distinct on the minuend, broadcast distinct-key-set
    anti-filter for the subtrahend via pc.is_in + invert. (For a
    subtrahend too large to broadcast, use the shuffle path of q_anti_join
    instead — that op filters ROWS, this one computes the key SET.)"""
    cust = _read(sf_dir, "customer", ["c_custkey"])
    ukeys = pc.unique(pq.read_table(os.path.join(sf_dir, "events.parquet"),
                                    columns=["user_id"])["user_id"]
                      .combine_chunks())
    return _broadcast_keyset_filter(cust, "c_custkey", ukeys, keep=False)


# broadcast gate for the as-of join's build side — same size class as
# kg.BROADCAST_MAX_ENTITIES: above it the deduped orders frame no longer
# fits a worker heap and the op switches to the key-bucketed path
ASOF_BROADCAST_MAX_ROWS = 2_000_000


def q_asof_join(sf_dir: str):
    """As-of join (events ↔ latest order at-or-before ts per user), auto-
    gated like every broadcast in this repo: when the build side (orders)
    is ≤ ASOF_BROADCAST_MAX_ROWS it is deduped driver-side to one row per
    (cust, date), broadcast sorted once, and each batch runs a vectorized
    pd.merge_asof; above the gate neither side touches the driver — the
    key-bucketed two-sided path (q_asof_join_bucketed) runs instead.
    Both paths are oracle-identical (same registry SQL; equality pinned by
    tests/test_round5_ops.py)."""
    n_orders = pq.read_metadata(
        os.path.join(sf_dir, "orders.parquet")).num_rows
    if n_orders > ASOF_BROADCAST_MAX_ROWS:
        return q_asof_join_bucketed(sf_dir)
    orders = pq.read_table(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_orderdate", "o_orderkey"],
    ).to_pandas()
    # deterministic tie-break: keep max o_orderkey per (cust, date)
    orders = (
        orders.sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
        .drop_duplicates(["o_custkey", "o_orderdate"], keep="last")
        .sort_values("o_orderdate", kind="stable")
        .reset_index(drop=True)
    )
    orders_ref = ray.put(orders)

    class AsOf:
        def __init__(self):
            self.orders = ray.get(orders_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            df = df.sort_values("ts", kind="stable")
            m = pd.merge_asof(
                df, self.orders, left_on="ts", right_on="o_orderdate",
                left_by="user_id", right_by="o_custkey",
            )
            m = m.dropna(subset=["o_orderkey"])  # inner semantics
            return pd.DataFrame(
                {
                    "event_id": m["event_id"].astype("int64"),
                    "user_id": m["user_id"].astype("int64"),
                    "o_orderkey": m["o_orderkey"].astype("int64"),
                }
            )

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    return ds.map_batches(AsOf, batch_format="pandas", concurrency=(1, 2))


def q_asof_join_bucketed(sf_dir: str, num_buckets: int = 64):
    """The as-of join's two-big-sides scale path (r4 verdict item 4):
    events and orders each combiner-shrink per batch, union with a side
    tag, shuffle ONCE on hash(user) — every row of one user lands in one
    bucket — and each bucket runs the same deterministic dedup +
    pd.merge_asof locally. Nothing materializes on the driver; identical
    output to the broadcast path (same oracle SQL row in the registry, so
    the driver certifies this path directly)."""
    from ..functions.dedup_exact import key_buckets

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    od = _read(sf_dir, "orders", ["o_custkey", "o_orderdate", "o_orderkey"])

    def ev_rows(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "user_id": df["user_id"].astype("int64"),
            "t": df["ts"],
            "event_id": df["event_id"].astype("Int64"),
            "o_orderkey": pd.array([pd.NA] * len(df), dtype="Int64"),
        })
        out["bucket"] = key_buckets(out, ["user_id"], num_buckets)
        return out

    def od_rows(df: pd.DataFrame) -> pd.DataFrame:
        # batch-local combiner: the bucket dedup is exact anyway; this just
        # shrinks the exchange to ≤1 row per (cust, date) per batch
        df = (df.sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
              .drop_duplicates(["o_custkey", "o_orderdate"], keep="last"))
        out = pd.DataFrame({
            "user_id": df["o_custkey"].astype("int64"),
            "t": df["o_orderdate"],
            "event_id": pd.array([pd.NA] * len(df), dtype="Int64"),
            "o_orderkey": df["o_orderkey"].astype("Int64"),
        })
        out["bucket"] = key_buckets(out, ["user_id"], num_buckets)
        return out

    unioned = ev.map_batches(ev_rows, batch_format="pandas").union(
        od.map_batches(od_rows, batch_format="pandas"))

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        is_ev = g["o_orderkey"].isna()
        left = g.loc[is_ev, ["user_id", "t", "event_id"]]
        right = g.loc[~is_ev, ["user_id", "t", "o_orderkey"]]
        empty = pd.DataFrame({"event_id": pd.Series([], dtype="int64"),
                              "user_id": pd.Series([], dtype="int64"),
                              "o_orderkey": pd.Series([], dtype="int64")})
        if left.empty or right.empty:
            return empty
        right = (right.sort_values(["user_id", "t", "o_orderkey"])
                 .drop_duplicates(["user_id", "t"], keep="last")
                 .sort_values("t", kind="stable"))
        left = left.sort_values("t", kind="stable")
        m = pd.merge_asof(left, right, on="t", by="user_id")
        m = m.dropna(subset=["o_orderkey"])  # inner semantics
        return pd.DataFrame({
            "event_id": m["event_id"].astype("int64"),
            "user_id": m["user_id"].astype("int64"),
            "o_orderkey": m["o_orderkey"].astype("int64"),
        })

    return unioned.groupby("bucket").map_groups(merge_bucket,
                                                batch_format="pandas")


def q_anti_join(sf_dir: str):
    """Anti join via broadcast key set (ray_guide 'Semi / anti join'):
    customers with no events — the distinct key set is tiny, shipped once."""
    user_ids = pc.unique(
        pq.read_table(os.path.join(sf_dir, "events.parquet"),
                      columns=["user_id"])["user_id"].combine_chunks()
    )
    ds = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    return _broadcast_keyset_filter(ds, "c_custkey", user_ids, keep=False,
                                    distinct=False)


def q_topk_per_group(sf_dir: str):
    """Top-5 events per event_type by (value desc, event_id): per-batch
    partial top-5 combiner, tiny final per-group merge."""
    ds = _read(sf_dir, "events", ["event_type", "event_id", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["event_type", "value", "event_id"],
                            ascending=[True, False, True], kind="stable")
        return df.groupby("event_type", sort=False).head(5)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["value", "event_id"], ascending=[False, True],
                          kind="stable").head(5)
        return g[["event_type", "event_id", "value"]]

    return (
        ds.map_batches(partial, batch_format="pandas", batch_size=65536)
        .groupby("event_type")
        .map_groups(final, batch_format="pandas")
    )


# --- dedup family ---------------------------------------------------------
def _add_md5(t: pa.Table, col="text", out="text_hash") -> pa.Table:
    """ONE content-hash definition repo-wide: fingerprint, dedup_exact and
    dup_rate must share it or the cross-query invariant silently drifts."""
    return textops.add_md5_fingerprint(t, col=col, out=out)


def q_dedup_exact(sf_dir: str):
    """Exact content dedup: md5(text) partition key, keep min doc_id —
    partial min per batch before the shuffle."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        t = _add_md5(t)
        g = t.group_by("text_hash").aggregate([("doc_id", "min")])
        return g.rename_columns(["text_hash", "p_min"])

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("text_hash")
        .aggregate(Min("p_min", alias_name="doc_id"))
    )


def q_fingerprint(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        lambda t: pa.table({"doc_id": t["doc_id"],
                            "fp": _add_md5(t, out="fp")["fp"]}),
        batch_format="pyarrow",
    )


def q_sample_hash(sf_dir: str):
    """Deterministic 10% sample (SURVEY §2.6 sampling): keep rows whose
    md5-lower-64 of the id is ≡ 0 mod 10 — reproducible across runs,
    partitionings and engines, unlike ds.random_sample; exactly mirrored by
    the SQL oracle's md5_number_lower. The right sampling primitive for
    lineage-stable subsets at 100 TB (re-runs pick the SAME rows)."""
    ds = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])

    class HashSampler:
        """md5 has no numpy/Arrow kernel, so the mask is computed by an
        in-process DuckDB connection (vectorized C++, zero-copy over the
        Arrow batch) — one connection per actor, ~9× the per-row hashlib
        loop it replaced, and md5_number_lower parity with the SQL oracle
        by construction."""

        def __init__(self):
            import duckdb

            self.con = duckdb.connect()

        def __call__(self, t: pa.Table) -> pa.Table:
            self.con.register("b", t)
            mask = self.con.execute(
                "select md5_number_lower(cast(doc_id as varchar)) % 10 = 0"
                " as k from b"
            ).arrow()["k"]
            self.con.unregister("b")
            return t.filter(mask)

    return ds.map_batches(HashSampler, batch_format="pyarrow", concurrency=(1, 2))


def _cache_key(sf_dir: str) -> tuple:
    """(input fingerprint, Ray job id): a cached MaterializedDataset is
    valid only while BOTH hold — regenerating the sf_dir in place
    invalidates by file stats, and ray.shutdown()+init invalidates by job
    id (the old object-store blocks are gone)."""
    import glob as _glob

    fp = tuple(
        (os.path.basename(f), os.stat(f).st_size, os.stat(f).st_mtime_ns)
        for f in sorted(_glob.glob(os.path.join(sf_dir, "*.parquet"))))
    job = (ray.get_runtime_context().get_job_id()
           if ray.is_initialized() else None)
    return (fp, job)


_TOKENIZED_DOCS_CACHE: dict[str, tuple] = {}

# ONE ChunkedArray-combining helper for the whole package (it also has the
# single-chunk fast path); a second copy here would drift
from ..functions.dedup import _as_array  # noqa: E402


def _doc_tokens_from_lists(t: pa.Table):
    """(words, parents) for a cached (doc_id, toks) batch — the
    empty-filtered twin of _doc_tokens for _tokenized_docs consumers
    (the cached lists already dropped empty tokens, so there is no
    ``keep`` mask to apply)."""
    toks = _as_array(t["toks"])
    return pc.list_flatten(toks), pc.list_parent_indices(toks)


def _tokenized_docs(sf_dir: str):
    """Session-scoped tokenized-corpus intermediate (VERDICT r3 item 8):
    ONE materialized narrow (doc_id, toks) table — toks is the
    oracle-locked _doc_tokens split with empty tokens already removed per
    row — shared by wordcount / tfidf / pmi / bm25 / chunk /
    pack_sequences / dup_ngram_spans, so a session running several token
    ops tokenizes the corpus ONCE instead of once per op. Blocks live in
    the spillable object store (MaterializedDataset); invalidated like the
    sibling corpus caches by input fingerprint + Ray job id."""
    key = _cache_key(sf_dir)
    hit = _TOKENIZED_DOCS_CACHE.get(sf_dir)
    if hit is None or hit[0] != key:
        ds = _read(sf_dir, "documents", ["doc_id", "text"])

        def tok(t: pa.Table) -> pa.Table:
            _, words, keep, parents = _doc_tokens(t)
            keepn = keep.to_numpy(zero_copy_only=False)
            par = parents.to_numpy(zero_copy_only=False)
            n = t.num_rows
            counts = np.bincount(par[keepn], minlength=n) if len(par) else \
                np.zeros(n, np.int64)
            offsets = np.zeros(n + 1, np.int64)
            np.cumsum(counts, out=offsets[1:])
            # int64 offsets (LargeList): no int32 token ceiling per batch
            lst = pa.LargeListArray.from_arrays(
                pa.array(offsets, pa.int64()),
                _as_array(words.filter(pa.array(keepn))))
            return pa.table({"doc_id": t["doc_id"], "toks": lst})

        _TOKENIZED_DOCS_CACHE[sf_dir] = (
            key, ds.map_batches(tok, batch_format="pyarrow",
                                batch_size=65536).materialize())
    return _TOKENIZED_DOCS_CACHE[sf_dir][1]


_UNIGRAM_COUNTS_CACHE: dict[str, tuple] = {}


def _unigram_counts(sf_dir: str):
    """Session-scoped corpus unigram counts (word, cnt) — the wordcount
    combiner output, materialized once and shared by wordcount /
    vocab_coverage / pmi_bigrams / lm_bigram_score / bpe_merge_pairs, so
    a session running several vocab-consuming ops reduces the corpus to
    its vocabulary ONCE instead of once per op. Vocabulary-sized blocks
    in the spillable object store; invalidated like _tokenized_docs by
    input fingerprint + Ray job id."""
    key = _cache_key(sf_dir)
    hit = _UNIGRAM_COUNTS_CACHE.get(sf_dir)
    if hit is None or hit[0] != key:
        ds = _tokenized_docs(sf_dir)

        def partial(t: pa.Table) -> pa.Table:
            words, _ = _doc_tokens_from_lists(t)
            g = pa.table({"word": words}).group_by("word").aggregate(
                [("word", "count")])
            return g.rename_columns(["word", "p_cnt"])

        _UNIGRAM_COUNTS_CACHE[sf_dir] = (
            key,
            ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=65536)
            .groupby("word").aggregate(Sum("p_cnt", alias_name="cnt"))
            .materialize())
    return _UNIGRAM_COUNTS_CACHE[sf_dir][1]


_MINHASH_CLUSTERS_CACHE: dict[str, tuple] = {}


def _minhash_clusters(sf_dir: str):
    """Session-scoped clustering artifact shared by dedup_minhash and
    dedup_keep_best (the _KG_CACHE pattern): one process computes the
    MinHash clustering once; blocks live in the spillable object store
    (MaterializedDataset), never the driver heap. Invalidated by input
    fingerprint + Ray job id (_cache_key)."""
    key = _cache_key(sf_dir)
    hit = _MINHASH_CLUSTERS_CACHE.get(sf_dir)
    if hit is None or hit[0] != key:
        ds = _read(sf_dir, "documents", ["doc_id", "text"])
        n_docs = pq.read_metadata(
            os.path.join(sf_dir, "documents.parquet")).num_rows
        _MINHASH_CLUSTERS_CACHE[sf_dir] = (
            key, dedup_minhash(ds, threshold=0.8,
                               approx_rows=n_docs).materialize())
    return _MINHASH_CLUSTERS_CACHE[sf_dir][1]


def q_dedup_minhash(sf_dir: str):
    """MinHash+LSH near-dedup, fully SQL-mirrored (ORACLE_SQL reproduces the
    md5 shingles, affine-mod-2^64 permutations, banding, Jaccard verify and
    recursive-CTE clustering bit-for-bit)."""
    return _minhash_clusters(sf_dir)


def q_simhash_pairs(sf_dir: str):
    """SimHash-banded near-dup candidate pairs, fully SQL-mirrored (the
    oracle reproduces the md5 token hashes, bit votes, 4×16 banding,
    per-band cap and Hamming≤3 verify — see ORACLE_SQL)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return simhash_candidate_pairs(ds, max_hamming=3)


_ND_PLANES = 6
_ND_THRESHOLD = 0.4  # yields >0 pairs at every test SF (max offdiag ≈ 0.5)


def _embedding_dim(sf_dir: str) -> int:
    """Vector width from ONE row group's first row — reading the whole
    embedding column just to measure one list would pull the entire corpus
    column into the driver."""
    pf = pq.ParquetFile(os.path.join(sf_dir, "embeddings.parquet"))
    for first in pf.iter_batches(batch_size=1, columns=["embedding"]):
        if len(first):
            return len(first["embedding"][0].as_py())
    return 0  # empty corpus: every caller early-returns before using it


def q_embed_neardup(sf_dir: str):
    """Embedding-cosine near-duplicate pairs via LSH buckets. Full SQL
    oracle: the seeded hyperplanes are emitted as literals and the bucketing
    + in-bucket exact cosine are reproduced in DuckDB."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    dim = _embedding_dim(sf_dir)
    pairs = neardup_pairs_cosine(ds, dim=dim, threshold=_ND_THRESHOLD,
                                 n_planes=_ND_PLANES,
                                 max_bucket=_ND_MAX_BUCKET)
    return pairs.select_columns(["id_a", "id_b"])


# --- text analysis --------------------------------------------------------
def q_token_count(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        lambda t: textops.add_token_count(t).select(["doc_id", "n_tokens"]),
        batch_format="pyarrow",
    )


def q_quality(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        lambda t: textops.add_quality_stats(t).select(
            ["doc_id", "n_chars_txt", "n_tokens", "sum_token_len"]
        ),
        batch_format="pyarrow",
    )


def q_stopword_count(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        lambda t: textops.add_stopword_count(t).select(["doc_id", "n_stopwords"]),
        batch_format="pyarrow",
    )


def q_lang_guess(sf_dir: str):
    """Stopword-vote language ID (rows-only oracle)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        lambda t: textops.add_lang_guess(t).select(["doc_id", "lang_guess"]),
        batch_format="pyarrow",
    )


# --- similarity search ----------------------------------------------------
def q_ann_topk(sf_dir: str):
    """Brute-force cosine top-10 vs the embedding of min(vec_id): broadcast
    query, per-batch partial top-k, tiny final sort."""
    # pin: min + query-row probe + top-k are three consumers of a lazy
    # read — unmaterialized, each would re-run the whole scan
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"]).materialize()
    qmin = ds.min("vec_id")
    qrow = ds.map_batches(
        lambda t: t.filter(pc.equal(t["vec_id"], qmin)), batch_format="pyarrow"
    ).take(1)[0]
    q = np.asarray(qrow["embedding"], dtype=np.float64)
    return topk_cosine(ds, q, k=10)


KMEANS_K = 8


def _centroid_matrix(ds, dim: int, k: int = KMEANS_K):
    """Deterministic centroids = the ``k`` embeddings with the smallest
    vec_id, via a two-level per-batch min-K reduce — the driver receives
    exactly k rows regardless of batch count (see q_kmeans_assign's scale
    note). Returns ``(C_normalized, c_zero_mask)``; C is (0, dim) on an
    empty corpus. Shared by kmeans_assign and semantic_dedup so both ops
    assign against bit-identical centroids."""

    def min_k(t: pa.Table) -> pa.Table:  # partial: K smallest ids per batch
        order = pc.array_sort_indices(t["vec_id"])[:k]
        return t.take(order)

    crows = sorted(
        ds.map_batches(min_k, batch_format="pyarrow")
        .repartition(1).map_batches(min_k, batch_format="pyarrow").take_all(),
        key=lambda r: r["vec_id"])[:k]
    C = (np.asarray([r["embedding"] for r in crows], dtype=np.float64)
         if crows else np.empty((0, dim), np.float64))
    cnorm = np.linalg.norm(C, axis=1, keepdims=True)
    c_zero = (cnorm <= 1e-30).reshape(-1)
    return C / np.maximum(cnorm, 1e-30), c_zero


def _assign_clusters(X: np.ndarray, C: np.ndarray,
                     c_zero: np.ndarray) -> np.ndarray:
    """Max-cosine centroid per row with DuckDB list_cosine_similarity
    zero-vector semantics (-1.0 when EITHER side is a 0-vector, so
    degenerate centroids rank last and zero rows tie to cluster 0);
    ties → smallest centroid index (np.argmax first-max = the SQL
    tie-break). ONE shared kernel for kmeans_assign and cluster_purity —
    both must assign bit-identically or their oracles drift apart."""
    xnorm = np.linalg.norm(X, axis=1, keepdims=True)
    X = X / np.maximum(xnorm, 1e-30)
    sims = X @ C.T
    sims[:, c_zero] = -1.0
    sims[(xnorm <= 1e-30).reshape(-1), :] = -1.0
    return np.argmax(sims, axis=1)


def q_kmeans_assign(sf_dir: str):
    """Nearest-centroid assignment (one k-means E-step) over the embedding
    corpus: centroids = the KMEANS_K embeddings with the smallest vec_id
    (deterministic, seed-free), every vector assigned to its max-cosine
    centroid (ties → smallest centroid index, = np.argmax first-max and
    the SQL tie-break).

    Scale path: centroid selection is a per-batch partial min-K + a tiny
    driver merge (NOT a global sort — Ray's sort is an all-to-all shuffle
    and limit() does not push down); the centroid matrix broadcasts once;
    assignment is one normalized matmul + argmax per Arrow batch — zero
    shuffles, the same shape the IVF index build uses
    (state/vector_index.py) and the canonical clustering primitive for
    corpus bucketing at 100 TB."""
    from ..functions.similarity import _to_matrix

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"]).materialize()
    # two-level min-K reduce: per-batch partials, then ONE reduce task over
    # the K x n_batches partial rows — the driver receives exactly K rows
    # regardless of batch count (at 100 TB the single-level take_all would
    # pull K x ~10^6 partial embeddings through the driver)
    C, c_zero = _centroid_matrix(ds, dim=_embedding_dim(sf_dir))
    if C.shape[0] == 0:
        return rd.from_arrow(pa.table({
            "vec_id": pa.array([], pa.int64()),
            "cluster": pa.array([], pa.int64())}))
    c_ref = ray.put((C, c_zero))

    class Assign:
        def __init__(self):
            # once per actor, not per batch
            self.C, self.c_zero = ray.get(c_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            X = _to_matrix(t["embedding"], dim=self.C.shape[1])
            cluster = _assign_clusters(X, self.C, self.c_zero)
            return pa.table({
                "vec_id": t["vec_id"],
                "cluster": pa.array(cluster, pa.int64()),
            })

    return ds.map_batches(Assign, batch_format="pyarrow", batch_size=4096,
                          concurrency=(1, 2))


def q_cluster_purity(sf_dir: str):
    """Cluster-purity evaluation — the quality check a clustering-based
    pipeline stage (SemDeDup buckets, IVF cells, topic shards) runs
    against ground-truth labels: per k-means cluster, the majority label
    and its share. Output (cluster, n_vecs, top_label, n_top, purity);
    ties break to the smallest label (the oracle's ORDER BY c DESC,
    label).

    Scale path: the same broadcast-centroid zero-shuffle assignment as
    kmeans_assign, with the label column riding along; each batch
    collapses to ≤ K × #labels count partials, so the one exchange moves
    domain-bounded rows; purity is one float division of exact ints."""
    from ..functions.similarity import _to_matrix

    ds = _read(sf_dir, "embeddings",
               ["vec_id", "embedding", "label"]).materialize()
    C, c_zero = _centroid_matrix(ds, dim=_embedding_dim(sf_dir))
    if C.shape[0] == 0:
        return rd.from_arrow(pa.table({
            "cluster": pa.array([], pa.int64()),
            "n_vecs": pa.array([], pa.int64()),
            "top_label": pa.array([], pa.int64()),
            "n_top": pa.array([], pa.int64()),
            "purity": pa.array([], pa.float64())}))
    c_ref = ray.put((C, c_zero))

    class AssignCount:
        def __init__(self):
            self.C, self.c_zero = ray.get(c_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            X = _to_matrix(t["embedding"], dim=self.C.shape[1])
            cluster = _assign_clusters(X, self.C, self.c_zero)
            g = pa.table({
                "cluster": pa.array(cluster, pa.int64()),
                "label": pc.cast(t["label"], pa.int64()),
            }).group_by(["cluster", "label"]).aggregate([([], "count_all")])
            return g.rename_columns(["cluster", "label", "p_cnt"])

    partials = ds.map_batches(AssignCount, batch_format="pyarrow",
                              batch_size=4096, concurrency=(1, 2))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        # merge the per-batch partials and pick the majority label in one
        # vectorized pass; ≤ K × #labels rows per bucket by construction.
        # dropna=False: the Arrow partial and the SQL GROUP BY both keep a
        # NULL-label group — pandas' default dropna=True would silently
        # undercount n_vecs and inflate purity. Pandas sorts NaN last =
        # DuckDB's NULLS LAST, so the tie-break matches too.
        c = (df.groupby(["cluster", "label"], sort=False, dropna=False)
             ["p_cnt"].sum().reset_index(name="c"))
        agg = c.groupby("cluster", sort=False).agg(
            n_vecs=("c", "sum")).reset_index()
        top = (c.sort_values(["cluster", "c", "label"],
                             ascending=[True, False, True], kind="stable")
               .drop_duplicates("cluster"))
        m = agg.merge(top[["cluster", "label", "c"]], on="cluster")
        return pd.DataFrame({
            "cluster": m["cluster"].astype("int64"),
            "n_vecs": m["n_vecs"].astype("int64"),
            "top_label": m["label"].astype("Int64"),  # NULL-majority safe
            "n_top": m["c"].astype("int64"),
            "purity": m["c"].to_numpy(np.float64)
            / m["n_vecs"].to_numpy(np.float64)})

    # ONE cluster-bucketed exchange over domain-bounded partials — never a
    # native aggregate fan-out (see dup_ngram_fraction's 47 s lesson)
    return (_bucketed(partials, ["cluster"], 4)
            .groupby("bucket").map_groups(finish, batch_format="pandas"))


def q_ann_index_topk(sf_dir: str):
    """Persisted-IVF-index path (the vector-store sink, qdrant/store.go role):
    build the index artifact under /tmp, then query it with n_probe=all —
    exact, so it shares ann_topk's SQL oracle."""
    import hashlib

    from ..state.vector_index import build_ivf_index, query_ivf_index

    # pin: index build + min + query-row probe each consume the read
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"]).materialize()
    dim = _embedding_dim(sf_dir)
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    index_dir = f"/tmp/vectrain_ivf_{tag}"
    n_centroids = 16
    build_ivf_index(ds, index_dir, dim=dim, n_centroids=n_centroids)
    qmin = ds.min("vec_id")
    qrow = ds.map_batches(
        lambda t: t.filter(pc.equal(t["vec_id"], qmin)), batch_format="pyarrow"
    ).take(1)[0]
    q = np.asarray(qrow["embedding"], dtype=np.float64)
    return query_ivf_index(index_dir, q, k=10, n_probe=n_centroids)


# --- transcripts / KG -----------------------------------------------------
def q_transcript_turns(sf_dir: str):
    """documents → derived transcript turns; the per-turn text-equality
    invariant, DuckDB-checkable (literal '. ' split + LATERAL index)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        lambda t: transcripts_from_documents(t).select(
            ["conv_id", "turn_idx", "role", "text"]
        ),
        batch_format="pyarrow",
    )


def q_conversation_stats(sf_dir: str):
    """Per-conversation dialogue-shape stats over the derived transcripts
    — the turn-level profile (who talks, how much) that drives transcript
    curation: for every conversation, n_turns, per-role turn counts,
    per-role character totals, and the assistant/user verbosity ratio
    (NULL when the user side is empty). Roles follow the derivation's
    parity rule (even turn_idx = user).

    Shape at scale: one conversation = one document row, so this is a
    pure per-batch map — ZERO shuffles at any corpus size. The split /
    position / length arithmetic is all Arrow + numpy (list offsets give
    intra-list turn positions; bincount does the per-role sums);
    utf8_length is codepoints on both sides, resp_ratio is one float
    division of exact integers (the oracle's tree, denominator masked
    BEFORE the divide)."""
    from ..rules import SENTENCE_SEP

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def stats(t: pa.Table) -> pa.Table:
        txt = pc.fill_null(t["text"], "").combine_chunks()  # (text or "")
        parts = pc.split_pattern(txt, pattern=SENTENCE_SEP)
        flat = _as_array(pc.list_flatten(parts))
        par = pc.list_parent_indices(parts).to_numpy(zero_copy_only=False)
        n = t.num_rows
        counts = pc.list_value_length(parts).to_numpy(
            zero_copy_only=False).astype(np.int64)
        offs = np.zeros(n + 1, np.int64)
        np.cumsum(counts, out=offs[1:])
        pos = np.arange(len(par), dtype=np.int64) - offs[par]
        is_user = pos % 2 == 0
        chars = pc.utf8_length(flat).to_numpy(
            zero_copy_only=False).astype(np.int64)
        n_user = np.bincount(par[is_user], minlength=n).astype(np.int64)
        user_chars = np.bincount(par[is_user], weights=chars[is_user],
                                 minlength=n).astype(np.int64)
        asst_chars = np.bincount(par[~is_user], weights=chars[~is_user],
                                 minlength=n).astype(np.int64)
        no_user = user_chars == 0
        ratio = asst_chars.astype(np.float64) / np.where(
            no_user, 1, user_chars).astype(np.float64)
        return pa.table({
            "conv_id": pc.binary_join_element_wise(
                "doc-", pc.cast(t["doc_id"], pa.string()), ""),
            "n_turns": pa.array(counts, pa.int64()),
            "n_user": pa.array(n_user, pa.int64()),
            "n_assistant": pa.array(counts - n_user, pa.int64()),
            "user_chars": pa.array(user_chars, pa.int64()),
            "assistant_chars": pa.array(asst_chars, pa.int64()),
            "resp_ratio": pa.array(ratio, pa.float64(), mask=no_user),
        })

    return ds.map_batches(stats, batch_format="pyarrow", batch_size=65536)


def q_turn_overlap(sf_dir: str):
    """Consecutive-turn lexical overlap within each transcript
    conversation — the turn-level self-repetition signal transcript
    curation uses to flag degenerate dialogues (assistants parroting
    the user, loops): for every turn t ≥ 1, the distinct-token sets of
    turn t−1 and t give (n_prev, n_cur, n_common, jaccard). Token rule
    is the oracle-locked _doc_tokens split applied per turn; rows whose
    union is empty (both turns tokenless — jaccard undefined) are
    excluded. jaccard is exact integers through one float division (the
    oracle's tree).

    Shape at scale: ONE conv-bucketed exchange co-locates each
    conversation's turns (the _cosupply_edges pattern — turn text moves
    exactly once, crc_bucket_array is vectorized), then everything
    inside a bucket is Arrow splits + a pandas drop_duplicates/merge
    over (conv, turn, token) — one Python call per BUCKET, never per
    conversation, and nothing corpus-sized exists anywhere."""
    from ..rules import crc_bucket_array

    ts = tpch_transcripts(sf_dir)

    def add_bucket(t: pa.Table) -> pa.Table:
        t = t.select(["conv_id", "turn_idx", "text"])
        return t.append_column(
            "bucket", pa.array(crc_bucket_array(t["conv_id"], 64),
                               pa.int32()))

    def overlap(df: pd.DataFrame) -> pd.DataFrame:
        t = pa.Table.from_pandas(df[["conv_id", "turn_idx", "text"]],
                                 preserve_index=False)
        conv = t["conv_id"].combine_chunks()
        turn = t["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
        # oracle-locked per-turn tokenization
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(pc.utf8_lower(
                pc.fill_null(t["text"], ""))).combine_chunks(),
            pattern=r"\s+")
        words = pc.list_flatten(toks)
        keep = pc.not_equal(words, "")
        tpar = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        keepn = keep.to_numpy(zero_copy_only=False)
        d = pd.DataFrame({
            "row": tpar[keepn],
            "tok": words.filter(pa.array(keepn)).to_pandas(),
        })
        d["conv"] = conv.take(pa.array(d["row"].to_numpy())).to_pandas()
        d["turn"] = turn[d["row"].to_numpy()]
        d = d.drop_duplicates(["conv", "turn", "tok"])
        ntok = np.zeros(t.num_rows, np.int64)
        if len(d):
            per = d.groupby("row", sort=False).size()
            # distinct per (conv, turn): (conv, turn) ↔ row is 1:1 here
            ntok[per.index.to_numpy(np.int64)] = per.to_numpy(np.int64)
        key = pd.DataFrame({"conv": conv.to_pandas(), "turn": turn,
                            "row": np.arange(t.num_rows, dtype=np.int64)})
        ncom = np.zeros(t.num_rows, np.int64)
        if len(d):
            prev = d[["conv", "turn", "tok"]].copy()
            prev["turn"] = prev["turn"] + 1
            m = prev.merge(d[["conv", "turn", "tok", "row"]],
                           on=["conv", "turn", "tok"])
            if len(m):
                per = m.groupby("row", sort=False).size()
                ncom[per.index.to_numpy(np.int64)] = per.to_numpy(np.int64)
        # n_prev: count of the (conv, turn-1) row when present, else 0
        pk = key.copy()
        pk["turn"] = pk["turn"] + 1
        pk["pn"] = ntok[pk["row"].to_numpy()]
        cur = key[key["turn"] >= 1].merge(
            pk[["conv", "turn", "pn"]], on=["conv", "turn"], how="left")
        g = cur["row"].to_numpy(np.int64)
        npv = cur["pn"].fillna(0).to_numpy(np.int64)
        ncu, ncm = ntok[g], ncom[g]
        union = npv + ncu - ncm
        ok = union > 0
        g, npv, ncu, ncm, union = g[ok], npv[ok], ncu[ok], ncm[ok], union[ok]
        return pd.DataFrame({
            "conv_id": conv.take(pa.array(g)).to_pandas(),
            "turn_idx": cur["turn"].to_numpy(np.int64)[ok].astype(np.int32),
            "n_prev": npv,
            "n_cur": ncu,
            "n_common": ncm,
            "jaccard": ncm.astype(np.float64) / union.astype(np.float64),
        })

    return (ts.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(overlap, batch_format="pandas"))


def q_kg_triples(sf_dir: str):
    """Templated TPC-H transcripts → extraction only → (conv, turn, s, p, o).
    Full SQL oracle: the triples are exactly customer/supplier⋈nation."""
    ts = tpch_transcripts(sf_dir)
    ext = ts.map_batches(filter_nonempty_text, batch_format="pyarrow").map_batches(
        extract_batch, batch_format="pyarrow"
    )
    return ext.map_batches(
        lambda t: triples_table(t).select(
            ["conv_id", "turn_idx", "subj", "pred", "obj"]
        ),
        batch_format="pyarrow",
    )


# --- graph analytics over derived edge tables (functions/graph.py) --------
def _cosupply_edges(sf_dir: str):
    """Directed supplier co-occurrence graph: u → v when v supplied the
    NEXT line (l_linenumber + 1) of the same order. The synthetic lineitem
    has duplicate (orderkey, linenumber) keys, so this must mirror the SQL
    self-join's cross-product semantics exactly — a per-order-bucket
    vectorized pandas merge (orders are co-located by the bucket groupby;
    one Python call per BUCKET, never per order)."""
    from ..functions.dedup_exact import key_buckets

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_suppkey"])

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket"] = key_buckets(df, ["l_orderkey"], 64)
        return df

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        a = g[["l_orderkey", "l_linenumber", "l_suppkey"]].copy()
        a["ln1"] = a["l_linenumber"] + 1
        m = a.merge(a, left_on=["l_orderkey", "ln1"],
                    right_on=["l_orderkey", "l_linenumber"],
                    suffixes=("_u", "_v"))
        out = pd.DataFrame({"u": m["l_suppkey_u"].astype("int64"),
                            "v": m["l_suppkey_v"].astype("int64")})
        return out.drop_duplicates()

    return ds.map_batches(add_bucket, batch_format="pandas").groupby(
        "bucket").map_groups(pairs, batch_format="pandas")


def _kg_star_edges(sf_dir: str):
    """Entity graph edges straight from the TPC-H tables (the same
    customer/supplier–nation topology the full KG pipeline extracts):
    'cust:K' — 'nat:N' and 'sup:K' — 'nat:N'."""

    def cust(t: pa.Table) -> pa.Table:
        return pa.table({
            "src": pc.binary_join_element_wise(
                "cust", pc.cast(t["c_custkey"], pa.string()), ":"),
            "dst": pc.binary_join_element_wise(
                "nat", pc.cast(t["c_nationkey"], pa.string()), ":"),
        })

    def sup(t: pa.Table) -> pa.Table:
        return pa.table({
            "src": pc.binary_join_element_wise(
                "sup", pc.cast(t["s_suppkey"], pa.string()), ":"),
            "dst": pc.binary_join_element_wise(
                "nat", pc.cast(t["s_nationkey"], pa.string()), ":"),
        })

    c = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
        cust, batch_format="pyarrow")
    s = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).map_batches(
        sup, batch_format="pyarrow")
    return c.union(s)


def q_kg_components(sf_dir: str):
    """Connected components of the entity graph by iterative min-label
    propagation (functions/graph.connected_components — broadcast-or-join
    label lookup, combiner-before-shuffle per iteration). Oracle: recursive
    transitive closure + min reachable id."""
    from ..functions.graph import connected_components

    return connected_components(_kg_star_edges(sf_dir), "src", "dst")


def q_pagerank(sf_dir: str):
    """3-iteration INTEGER PageRank over the co-supply graph — floor
    arithmetic is bit-exact across partitionings and mirrors the unrolled
    SQL oracle (float PageRank cannot be oracle-checked: summation order)."""
    from ..functions.graph import pagerank_int

    return pagerank_int(_cosupply_edges(sf_dir), "u", "v", iters=3)


def q_triangle_count(sf_dir: str):
    """Exact triangle count: degree orientation + bucketed wedge semi-join
    (the shuffle-optimal exact algorithm; wedge volume Σ C(outdeg⁺, 2))."""
    from ..functions.graph import triangle_count as _tri

    return _tri(_cosupply_edges(sf_dir), "u", "v")


def q_sssp(sf_dir: str):
    """Bounded-round weighted shortest paths (4 Bellman-Ford rounds) over
    the distinct co-supply graph; deterministic integer weight
    w = 1 + (u + v) % 5, seed = smallest node id. min/plus over int64 is
    order-independent → bit-exact vs the unrolled SQL oracle."""
    from ..functions.graph import _distinct_edges, _node_table, sssp_rounds

    e = _distinct_edges(_cosupply_edges(sf_dir), "u", "v",
                        symmetric=False).materialize()

    def add_w(t: pa.Table) -> pa.Table:
        u = t["u"].to_numpy(zero_copy_only=False)
        v = t["v"].to_numpy(zero_copy_only=False)
        return t.append_column("w", pa.array(1 + (u + v) % 5, pa.int64()))

    seed = _node_table(e).min("node")
    return sssp_rounds(e.map_batches(add_w, batch_format="pyarrow"), seed,
                       rounds=4)


def q_clustering_coeff(sf_dir: str):
    """Per-node local clustering coefficient over the co-supply graph —
    the standard graph-health signal after triangle counting:
    coeff = 2·n_tri / (degree·(degree−1)) for degree ≥ 2, else 0.0.
    Output (node, degree, n_tri, coeff) for every node.

    Scale path: triangles_per_node reuses triangle_count's
    degree-orientation machinery (wedge volume Σ C(outdeg⁺, 2), the
    shuffle-optimal exact plan) with apex-carrying wedges so each
    verified triangle credits its three corners; the only extra exchange
    is ONE node-bucketed merge of node-sized partials. coeff is exact
    integers through one float division — the oracle's tree."""
    from ..functions.graph import triangles_per_node

    tri = triangles_per_node(_cosupply_edges(sf_dir), "u", "v")

    def finish(t: pa.Table) -> pa.Table:
        deg = t["degree"].to_numpy(zero_copy_only=False)
        n = t["n_tri"].to_numpy(zero_copy_only=False)
        can = deg >= 2
        denom = np.where(can, deg.astype(np.float64)
                         * (deg - 1).astype(np.float64), 1.0)
        coeff = np.where(can, (2.0 * n.astype(np.float64)) / denom, 0.0)
        return t.append_column("coeff", pa.array(coeff, pa.float64()))

    return tri.map_batches(finish, batch_format="pyarrow")


def q_degree_assortativity(sf_dir: str):
    """Newman degree assortativity of the co-supply graph — one scalar
    (with the edge count) summarizing hub-mixing structure; NULL r on a
    regular graph. See functions/graph.degree_assortativity for the
    moments-combiner scale path."""
    from ..functions.graph import degree_assortativity

    return rd.from_arrow(
        degree_assortativity(_cosupply_edges(sf_dir), "u", "v"))


def q_edge_jaccard(sf_dir: str):
    """Per-edge neighborhood Jaccard over the co-supply graph — the
    structural edge-strength signal for KG edge pruning: n_common (=
    triangles through the edge, off the shared degree-oriented wedge
    plan) over deg_u + deg_v − n_common. Exact integers through one
    float division (the oracle's tree); see functions/graph.edge_jaccard
    for the shuffle accounting."""
    from ..functions.graph import edge_jaccard

    return edge_jaccard(_cosupply_edges(sf_dir), "u", "v")


def q_link_predict_ra(sf_dir: str):
    """Resource-Allocation link prediction over the co-supply graph —
    the KG-completion candidate generator: for every non-adjacent pair
    sharing a neighbor, ra_score = Σ scale // deg(z) over common
    neighbors z in FIXED POINT (exact-integer distributed sum). Hub
    apexes above the cap are excluded by contract — the documented
    scale lever on power-law graphs (functions/graph.link_predict_ra)."""
    from ..functions.graph import link_predict_ra

    return link_predict_ra(_cosupply_edges(sf_dir), "u", "v",
                           apex_cap=1000)


def q_reciprocity(sf_dir: str):
    """Per-node edge reciprocity over the directed co-supply graph — the
    mutual-link share that separates symmetric relations from one-way
    ones when typing KG edges: for every node with out-edges, n_out
    distinct out-neighbors, n_recip of them with the reverse edge, and
    their ratio (exact integers through one float division — the
    oracle's tree). Pair-sized + node-sized exchanges only
    (functions/graph.reciprocity)."""
    from ..functions.graph import reciprocity

    return reciprocity(_cosupply_edges(sf_dir), "u", "v")


def q_khop(sf_dir: str):
    """Min-hop distance ≤ 3 from supplier 1 by frontier-broadcast BFS
    (per hop: pc.is_in semi-join over the streaming edge set)."""
    from ..functions.graph import khop_hops

    return khop_hops(_cosupply_edges(sf_dir), [1], 3, "u", "v")


_KG_CACHE: dict[str, dict] = {}


def _run_tpch_kg(sf_dir: str) -> dict:
    """kg_edges and kg_nodes share one pipeline run per sf_dir (results are
    small → materialize once instead of re-running the whole DAG)."""
    key = _cache_key(sf_dir)
    hit = _KG_CACHE.get(sf_dir)
    if hit is None or hit.get("_key") != key:
        res = run_kg(tpch_transcripts(sf_dir), out_dir=None, write_outputs=False)
        _KG_CACHE[sf_dir] = {
            "_key": key,  # input fingerprint + Ray job id (see _cache_key)
            "edges": res["edges"].materialize(),
            "nodes": res["nodes"].materialize(),
        }
    return _KG_CACHE[sf_dir]


def name_edges(edges, nodes, broadcast_max: int | None = None):
    """edges (src_id, dst_id, pred, weight) ⋈ nodes (entity_id →
    canonical_name) → (src_name, pred, dst_name, weight).

    Same deployment policy as the link index (pipelines/kg.py
    BROADCAST_MAX_ENTITIES): when the node table fits a broadcast object,
    ship it once via ray.put and resolve per batch with index_in/take
    (zero shuffle); above the threshold fall back to two hash joins — the
    node table is never pulled whole to the driver OR to one worker.
    ``broadcast_max`` overrides the threshold (tests force the join path)."""
    from .kg import BROADCAST_MAX_ENTITIES

    if broadcast_max is None:
        broadcast_max = BROADCAST_MAX_ENTITIES
    # pin once: count + the chosen path would otherwise re-execute a lazy
    # nodes dataset 2-3 times
    names = nodes.select_columns(["entity_id", "canonical_name"]).materialize()
    if names.count() < broadcast_max:
        nd = names.to_pandas()
        name_ref = ray.put((list(nd["entity_id"]), list(nd["canonical_name"])))

        class NameEdges:
            def __init__(self):
                keys, vals = ray.get(name_ref)
                self.keys = pa.array(keys, pa.string())
                self.vals = pa.array(vals, pa.string())

            def _lookup(self, col) -> pa.Array:
                return pc.take(self.vals, pc.index_in(col, value_set=self.keys))

            def __call__(self, t: pa.Table) -> pa.Table:
                return pa.table(
                    {
                        "src_name": self._lookup(t["src_id"]),
                        "pred": t["pred"],
                        "dst_name": self._lookup(t["dst_id"]),
                        "weight": t["weight"],
                    }
                )

        return edges.map_batches(NameEdges, batch_format="pyarrow",
                                 concurrency=(1, 2))
    # scale path: LEFT join once per key side (scalar columns only) — left,
    # not inner, so an edge whose endpoint id is missing from nodes keeps a
    # null name exactly like the broadcast path (the two deployment shapes
    # must agree row-for-row).
    nparts = _join_partitions()
    sn = names.map_batches(
        lambda t: t.rename_columns(["src_id", "src_name"]),
        batch_format="pyarrow")
    dn = names.map_batches(
        lambda t: t.rename_columns(["dst_id", "dst_name"]),
        batch_format="pyarrow")
    out = (edges.select_columns(["src_id", "dst_id", "pred", "weight"])
           .join(sn, join_type="left_outer", num_partitions=nparts,
                 on=("src_id",))
           .join(dn, join_type="left_outer", num_partitions=nparts,
                 on=("dst_id",)))
    return out.select_columns(["src_name", "pred", "dst_name", "weight"])


def q_kg_edges(sf_dir: str):
    """Full pipeline → edges with readable names (ids → canonical_name,
    broadcast-or-join per name_edges policy). SQL oracle: weight 2 per
    (entity, nation)."""
    res = _run_tpch_kg(sf_dir)
    return name_edges(res["edges"], res["nodes"])


def q_kg_nodes(sf_dir: str):
    """Full pipeline → nodes (canonical_name, n_mentions, degree); SQL oracle
    from the templated construction."""
    res = _run_tpch_kg(sf_dir)
    return res["nodes"].select_columns(["canonical_name", "n_mentions", "degree"])


# --- widening pass: outer join, unnest, pivot, rollup, ranges, regex -------
def q_grouped_quantiles(sf_dir: str):
    """Exact grouped multi-quantile (p25/p50/p90) via the value-count
    combiner + CDF walk — generalizes q_grouped_median to any quantile list.
    DuckDB quantile_disc semantics: 1-based rank ceil(q*n), computed here in
    exact integer arithmetic ((num*n + den - 1) // den) so no float-rank
    drift vs SQL. Exact at any scale for bounded value domains."""
    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["l_returnflag", "l_quantity"]).aggregate(
            [("l_quantity", "count")]
        )
        return g.rename_columns(["l_returnflag", "l_quantity", "p_cnt"])

    merged = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby(["l_returnflag", "l_quantity"])
        .aggregate(Sum("p_cnt", alias_name="cnt"))
    )
    quantiles = [("p25", 1, 4), ("p50", 1, 2), ("p90", 9, 10)]

    def cdf_walk(df: pd.DataFrame) -> pd.DataFrame:
        rows: dict[str, list] = {"l_returnflag": []}
        rows.update({name: [] for name, _, _ in quantiles})
        for flag, g in df.groupby("l_returnflag", sort=True):
            g = g.sort_values("l_quantity", kind="stable")
            n = int(g["cnt"].sum())
            cum = g["cnt"].cumsum()
            rows["l_returnflag"].append(flag)
            for name, num, den in quantiles:
                idx = (num * n + den - 1) // den - 1  # 0-based ceil(q*n)-1
                rows[name].append(
                    float(g.loc[cum > idx, "l_quantity"].iloc[0])
                )
        return pd.DataFrame(rows)

    return merged.repartition(1).map_batches(
        cdf_walk, batch_format="pandas", batch_size=None
    )



def q_left_join(sf_dir: str):
    """customer LEFT OUTER JOIN pre-aggregated orders (native Ray hash join,
    join_type="left_outer"): every customer appears exactly once, zero-filled
    when they have no orders. The orders side collapses to ≤1 row per custkey
    via the partial+final combiner BEFORE the join, so the join exchange
    moves pre-aggregated rows only (complements q_hash_join's inner join on
    raw rows)."""
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by("o_custkey").aggregate(
            [("o_totalprice", "sum"), ([], "count_all")]  # count(*)
        )
        return g.rename_columns(["o_custkey", "p_rev", "p_cnt"])

    per_cust = (
        orders.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby("o_custkey")
        .aggregate(Sum("p_rev", alias_name="revenue"),
                   Sum("p_cnt", alias_name="n_orders"))
    )
    joined = cust.join(per_cust, join_type="left_outer",
                       num_partitions=_join_partitions(),
                       on=("c_custkey",), right_on=("o_custkey",))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": t["c_custkey"],
                "c_mktsegment": t["c_mktsegment"],
                "n_orders": pc.cast(pc.fill_null(t["n_orders"], 0), pa.int64()),
                "revenue": _round_half_away(
                    pc.fill_null(t["revenue"], 0.0), 2),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


def q_wordcount(sf_dir: str):
    """Unnest/explode + wordcount: split text on whitespace in Arrow C++
    (split_pattern_regex — the same RE2 engine DuckDB uses), explode the
    list column zero-copy (list_flatten), count per batch (combiner), one
    final groupby over distinct words, then global top-100 with a
    deterministic tie-break (count desc, word asc)."""
    counts = _unigram_counts(sf_dir)  # shared vocab-once intermediate
    return counts.sort(["cnt", "word"], descending=[True, False]).limit(100)


def q_vocab_coverage(sf_dir: str):
    """Vocabulary coverage / OOV-rate scoring — the tokenizer-prep
    primitive: build the global top-V vocabulary (count desc, word asc —
    the deterministic wordcount ranking) and score every document's
    out-of-vocabulary token fraction against it. Output (doc_id, n_tokens,
    n_oov, oov_rate) for docs with at least one token.

    Shape at scale: the vocabulary comes off the wordcount combiner path
    (the exchange moves distinct words, never tokens) and is V rows on the
    driver BY CONSTRUCTION; it broadcasts via ray.put and the corpus
    streams ONE pass with a vectorized pc.is_in membership + bincount —
    zero additional shuffles. oov_rate is a float64 division of exact
    integer counts, the identical IEEE tree the oracle spells out."""
    V = 20
    vocab = pa.array([r["word"] for r in q_wordcount(sf_dir).take(V)],
                     pa.string())
    vocab_ref = ray.put(vocab)
    ds = _tokenized_docs(sf_dir)

    class OOVScan:
        def __init__(self):
            self.vocab = ray.get(vocab_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            words, parents = _doc_tokens_from_lists(t)
            ntok = pc.list_value_length(_as_array(t["toks"])).to_numpy(
                zero_copy_only=False).astype(np.int64)
            oov = pc.invert(pc.is_in(words, value_set=self.vocab))
            n_oov = np.bincount(
                parents.to_numpy(zero_copy_only=False)[
                    oov.to_numpy(zero_copy_only=False)],
                minlength=t.num_rows).astype(np.int64)
            keep = ntok > 0
            ids = t["doc_id"].combine_chunks().to_numpy(
                zero_copy_only=False)[keep]
            nt, no = ntok[keep], n_oov[keep]
            return pa.table({
                "doc_id": pa.array(ids, pa.int64()),
                "n_tokens": pa.array(nt, pa.int64()),
                "n_oov": pa.array(no, pa.int64()),
                "oov_rate": pa.array(no.astype(np.float64) /
                                     nt.astype(np.float64), pa.float64()),
            })

    return ds.map_batches(OOVScan, batch_format="pyarrow",
                          batch_size=65536, concurrency=(1, 4))


def q_length_quantiles(sf_dir: str):
    """Exact per-source token-length percentiles (p50/p90/p99) — the
    corpus-curation length profile that sets truncation and packing
    budgets (the value-count-combiner CDF walk of q_grouped_quantiles,
    composed with the oracle-locked tokenizer over the documents
    corpus). Output (source, n_docs, p50, p90, p99); the percentile rank
    is pure integer arithmetic, k_p = ceil(n·p/100) = (n·p + 99) // 100,
    value = smallest n_tok whose cumulative count reaches k_p — no float
    anywhere, so the oracle match is exact by construction.

    Shape at scale: the corpus streams ONE pass emitting per-batch
    (source, n_tok) count partials — the exchange moves distinct
    (source, length) pairs (bounded: lengths are bounded, sources are
    few), never documents; selection is a vectorized cumsum+searchsorted
    per source inside one bucketed map_groups. Zero-token docs (empty
    text) count at length 0, mirroring the oracle's filtered split."""
    ds = _read(sf_dir, "documents", ["source", "text"])

    def partial(t: pa.Table) -> pa.Table:
        _, _, keep, parents = _doc_tokens(t)
        par = parents.to_numpy(zero_copy_only=False)
        keepn = keep.to_numpy(zero_copy_only=False)
        ntok = (np.bincount(par[keepn], minlength=t.num_rows)
                if len(par) else np.zeros(t.num_rows, np.int64))
        g = pd.DataFrame({
            "source": t["source"].to_pandas(),
            "n_tok": ntok.astype(np.int64),
        }).groupby(["source", "n_tok"], sort=False).size().reset_index(
            name="c")
        b = key_buckets(g[["source"]], ["source"], 16)
        g["bucket"] = b.values
        return pa.Table.from_pandas(g, preserve_index=False)

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for source, grp in g.groupby("source", sort=False):
            cc = grp.groupby("n_tok", sort=True)["c"].sum()
            vals = cc.index.to_numpy()
            cum = np.cumsum(cc.to_numpy())
            n = int(cum[-1])

            def pick(p: int) -> int:
                return int(vals[np.searchsorted(cum, (n * p + 99) // 100)])

            rows.append((source, n, pick(50), pick(90), pick(99)))
        return pd.DataFrame(rows, columns=["source", "n_docs", "p50",
                                           "p90", "p99"]).astype(
            {"n_docs": "int64", "p50": "int64", "p90": "int64",
             "p99": "int64"})

    return ds.map_batches(partial, batch_format="pyarrow",
                          batch_size=65536).groupby("bucket").map_groups(
        finish, batch_format="pandas")


LM_FP_SCALE = 1_000_000_000  # fixed-point: floor(SCALE·p) per bigram
LM_BROADCAST_MAX_ROWS = 2_000_000  # bigram-model rows shippable via ray.put


def q_lm_bigram_score(sf_dir: str, _force_join: bool = False):
    """Bigram-LM fluency scoring — the CCNet/KenLM-style quality filter:
    score every document by its mean add-one-smoothed bigram probability
    under the corpus's own bigram model, p(w2|w1) = (c12+1)/(c1+V).
    Output (doc_id, n_bigrams, lm_score) for docs with ≥ 2 tokens;
    higher = more predictable text (LM-filter pipelines keep a band).

    Determinism at scale: the textbook Σ ln p is a float sum, and a
    distributed sum has no stable order — so each bigram's probability is
    accumulated in FIXED POINT instead: fp = (SCALE·(c12+1)) // (c1+V) is
    exact int64 arithmetic, int64 sums are associative under any block
    order/parallelism, and the only float op is ONE division per output
    row — the identical IEEE tree the oracle spells out, so value hashes
    match bit-for-bit.

    Shape at scale: model counts come off the bigram/wordcount combiner
    paths (exchanges move distinct n-grams, never tokens; the pmi_bigrams
    shape). Scoring is gated like every broadcast in the repo: a model
    under LM_BROADCAST_MAX_ROWS has per-pair fp precomputed on the driver
    and ships ONCE via ray.put, and the corpus streams one zero-shuffle
    pass (per-batch pandas merge — vectorized, no Python loop); above the
    gate (a web corpus's bigram vocab) the per-doc distinct-bigram table
    hash-joins the model on (w1, w2) + unigrams on w1 and re-aggregates
    per doc — every exchange is distinct-key-sized, never token-sized."""
    ds = _tokenized_docs(sf_dir)  # shared tokenize-once intermediate

    def bigram_partial(t: pa.Table) -> pa.Table:
        words, parents = _doc_tokens_from_lists(t)  # empties pre-dropped
        d = pd.DataFrame({"w": words.to_pandas(), "p": parents.to_pandas()})
        d["nxt"] = d["w"].shift(-1)
        d["pn"] = d["p"].shift(-1)
        d = d[(d["p"] == d["pn"]) & d["nxt"].notna()]
        c = d.groupby(["w", "nxt"], sort=False).size().reset_index(name="p_cnt")
        return pa.table({"w1": pa.array(c["w"], pa.string()),
                         "w2": pa.array(c["nxt"], pa.string()),
                         "p_cnt": pa.array(c["p_cnt"], pa.int64())})

    def sum_bucket(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby(["w1", "w2"], sort=False)["p_cnt"].sum().reset_index(
            name="c12")
        c["c12"] = c["c12"].astype("int64")
        return c

    bigrams = (_bucketed(
        ds.map_batches(bigram_partial, batch_format="pyarrow",
                       batch_size=65536), ["w1", "w2"])
        .groupby("bucket").map_groups(sum_bucket, batch_format="pandas")
    ).materialize()

    unigrams = _unigram_counts(sf_dir).map_batches(
        lambda t: t.rename_columns(["word", "c1"]), batch_format="pyarrow")

    vocab_size = int(unigrams.count())
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "n_bigrams": pa.array([], pa.int64()),
                      "lm_score": pa.array([], pa.float64())})
    if vocab_size == 0:
        return rd.from_arrow(empty)

    def _doc_bigram_counts(t: pa.Table) -> pd.DataFrame:
        """Per-doc distinct-bigram multiplicities (p, w1, w2, k) — the
        batch-local combiner both scoring paths share."""
        words, parents = _doc_tokens_from_lists(t)
        d = pd.DataFrame({"w": words.to_pandas(), "p": parents.to_pandas()})
        d["nxt"] = d["w"].shift(-1)
        d["pn"] = d["p"].shift(-1)
        d = d[(d["p"] == d["pn"]) & d["nxt"].notna()]
        if d.empty:
            return pd.DataFrame({"p": pd.Series([], dtype="int64"),
                                 "w1": pd.Series([], dtype="object"),
                                 "w2": pd.Series([], dtype="object"),
                                 "k": pd.Series([], dtype="int64")})
        g = (d.groupby(["p", "w", "nxt"], sort=False).size()
             .reset_index(name="k"))
        g.columns = ["p", "w1", "w2", "k"]
        return g

    def _score_table(ids: np.ndarray, sum_fp: np.ndarray,
                     nb: np.ndarray) -> pa.Table:
        # the op's ONLY float op — same tree as the oracle:
        # CAST(sum_fp AS DOUBLE) / (CAST(n_bigrams AS DOUBLE) * SCALE)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_bigrams": pa.array(nb, pa.int64()),
            "lm_score": pa.array(
                sum_fp.astype(np.float64)
                / (nb.astype(np.float64) * float(LM_FP_SCALE)),
                pa.float64()),
        })

    if not _force_join and bigrams.count() <= LM_BROADCAST_MAX_ROWS:
        # model fp precomputed once on the driver (model-sized, gated)
        model = bigrams.to_pandas().merge(
            unigrams.to_pandas(), left_on="w1", right_on="word")
        c12 = model["c12"].to_numpy(np.int64)
        c1 = model["c1"].to_numpy(np.int64)
        model = pd.DataFrame({
            "w1": model["w1"], "w2": model["w2"],
            "fp": (LM_FP_SCALE * (c12 + 1)) // (c1 + vocab_size)})
        model_ref = ray.put(model)

        class LMScan:
            def __init__(self):
                self.model = ray.get(model_ref)

            def __call__(self, t: pa.Table) -> pa.Table:
                g = _doc_bigram_counts(t)
                if g.empty:
                    return empty
                g = g.merge(self.model, on=["w1", "w2"])  # model ⊇ corpus
                g["contrib"] = g["fp"].to_numpy(np.int64) * \
                    g["k"].to_numpy(np.int64)
                per = (g.groupby("p", sort=False)
                       .agg(sum_fp=("contrib", "sum"), nb=("k", "sum"))
                       .reset_index())
                ids = t["doc_id"].combine_chunks().to_numpy(
                    zero_copy_only=False)[per["p"].to_numpy(np.int64)]
                return _score_table(ids, per["sum_fp"].to_numpy(np.int64),
                                    per["nb"].to_numpy(np.int64))

        return ds.map_batches(LMScan, batch_format="pyarrow",
                              batch_size=65536, concurrency=(1, 4))

    # scale path: distinct-key hash joins + per-doc re-aggregation
    def doc_bigrams(t: pa.Table) -> pa.Table:
        g = _doc_bigram_counts(t)
        ids = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": pa.array(ids[g["p"].to_numpy(np.int64)], pa.int64())
            if len(g) else pa.array([], pa.int64()),
            "w1": pa.array(g["w1"], pa.string()),
            "w2": pa.array(g["w2"], pa.string()),
            "k": pa.array(g["k"].to_numpy(np.int64), pa.int64())})

    db = ds.map_batches(doc_bigrams, batch_format="pyarrow",
                        batch_size=65536)
    bg = bigrams.map_batches(
        lambda t: t.rename_columns(["b1", "b2", "c12"]),
        batch_format="pyarrow")
    un = unigrams.map_batches(
        lambda t: t.rename_columns(["u_word", "c1"]), batch_format="pyarrow")
    nparts = _join_partitions(per_cpu_divisor=8)  # combiner-reduced inputs
    j = db.join(bg, join_type="inner", num_partitions=nparts,
                on=("w1", "w2"), right_on=("b1", "b2"))
    j = j.join(un, join_type="inner", num_partitions=nparts,
               on=("w1",), right_on=("u_word",))

    def contrib(t: pa.Table) -> pa.Table:
        c12 = t["c12"].to_numpy()
        c1 = t["c1"].to_numpy()
        k = t["k"].to_numpy()
        fp = (LM_FP_SCALE * (c12 + 1)) // (c1 + vocab_size)
        return pa.table({"doc_id": t["doc_id"],
                         "contrib": pa.array(fp * k, pa.int64()),
                         "k": pa.array(k, pa.int64())})

    agg = (j.map_batches(contrib, batch_format="pyarrow")
           .groupby("doc_id")
           .aggregate(Sum("contrib", alias_name="sum_fp"),
                      Sum("k", alias_name="n_bigrams")))

    def finish(t: pa.Table) -> pa.Table:
        return _score_table(
            t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False),
            t["sum_fp"].combine_chunks().to_numpy(zero_copy_only=False),
            t["n_bigrams"].combine_chunks().to_numpy(zero_copy_only=False))

    return agg.map_batches(finish, batch_format="pyarrow")


def q_bpe_merge_pairs(sf_dir: str):
    """BPE merge-pair counting (Sennrich et al. 2016) — the inner step of
    byte-pair-encoding tokenizer training: top-20 adjacent character
    pairs by corpus frequency, each distinct word contributing its pairs
    weighted by its corpus count. Output (pair, cnt), count desc / pair
    asc — the pair a BPE trainer would merge first is row 1.

    Scale path: the corpus collapses to the DISTINCT vocabulary first
    (the wordcount combiner — the exchange moves distinct words, never
    tokens), so pair extraction runs over vocab-sized data as a loop over
    CHARACTER OFFSETS (bounded by the longest word) of vectorized
    utf8_slice kernels — never a loop over rows. Pair counts then take
    one distinct-pair-sized groupby with per-batch partials and a
    top-k-partial before the final tiny sort."""
    vocab = _unigram_counts(sf_dir).map_batches(
        lambda t: t.rename_columns(["word", "c"]), batch_format="pyarrow")

    empty = pa.table({"pair": pa.array([], pa.string()),
                      "p_cnt": pa.array([], pa.int64())})

    def pair_partial(t: pa.Table) -> pa.Table:
        w = _as_array(t["word"])
        c = pc.cast(_as_array(t["c"]), pa.int64())
        lens = pc.utf8_length(w)
        maxlen = pc.max(lens).as_py() if t.num_rows else None
        pieces = []
        for i in range(int(maxlen or 0) - 1):  # offsets, not rows
            keep = pc.greater_equal(lens, i + 2)
            pieces.append(pa.table({
                "pair": pc.utf8_slice_codeunits(w, start=i, stop=i + 2)
                .filter(keep),
                "p_cnt": c.filter(keep)}))
        if not pieces:
            return empty
        g = pa.concat_tables(pieces).group_by("pair").aggregate(
            [("p_cnt", "sum")])
        return g.rename_columns(["pair", "p_cnt"])

    def topk_partial(t: pa.Table) -> pa.Table:
        idx = pc.select_k_unstable(
            t, k=20, sort_keys=[("cnt", "descending"), ("pair", "ascending")])
        return t.take(idx)

    return (vocab.map_batches(pair_partial, batch_format="pyarrow")
            .groupby("pair").aggregate(Sum("p_cnt", alias_name="cnt"))
            .map_batches(topk_partial, batch_format="pyarrow")
            .sort(["cnt", "pair"], descending=[True, False]).limit(20))


def q_token_entropy(sf_dir: str):
    """Per-document unigram entropy — the Gopher-family repetitiveness /
    quality signal (low entropy = templated or repeated text; filters
    keep a band). Output (doc_id, n_tokens, entropy) for docs with ≥ 1
    token, entropy in nats.

    Determinism at scale: the textbook -Σ p ln p is a float sum over a
    doc's terms with no stable order, so the identity
    H = ln(n) - (Σ c·ln c)/n is computed with the Σ in FIXED POINT:
    each distinct count contributes c · floor(SCALE·ln(c)) — exact int64,
    associative — leaving two float ops per OUTPUT row (one scalar libm
    ln + one division), the oracle's exact tree, so hashes match
    bit-for-bit. ln(c) comes from a per-batch memo over DISTINCT counts
    (a handful of integers), not per row.

    Shape at scale: ONE zero-shuffle streaming pass — per-doc term counts
    are batch-local (a doc is one row), nothing corpus-sized exists."""
    import math

    ds = _tokenized_docs(sf_dir)  # shared tokenize-once intermediate

    def entropy(t: pa.Table) -> pa.Table:
        words, parents = _doc_tokens_from_lists(t)
        ntok = pc.list_value_length(_as_array(t["toks"])).to_numpy(
            zero_copy_only=False).astype(np.int64)
        d = pd.DataFrame({"w": words.to_pandas(),
                          "p": parents.to_pandas()})
        if len(d):
            cw = (d.groupby(["p", "w"], sort=False).size()
                  .reset_index(name="c"))
            c = cw["c"].to_numpy(np.int64)
            lut = {int(v): math.floor(LM_FP_SCALE * math.log(float(v)))
                   for v in np.unique(c)}  # distinct counts, not rows
            fp_term = c * np.vectorize(lut.__getitem__,
                                       otypes=[np.int64])(c)
            per = (pd.DataFrame({"p": cw["p"], "fp": fp_term})
                   .groupby("p", sort=False)["fp"].sum())
            fp = np.zeros(t.num_rows, np.int64)
            fp[per.index.to_numpy(np.int64)] = per.to_numpy(np.int64)
        else:
            fp = np.zeros(t.num_rows, np.int64)
        keep = ntok > 0
        ids = t["doc_id"].combine_chunks().to_numpy(
            zero_copy_only=False)[keep]
        n, f = ntok[keep], fp[keep]
        # the oracle's exact tree: ln(n) - fp/(n*SCALE), scalar libm ln
        ent = np.array([math.log(float(v)) for v in n], np.float64) \
            - f.astype(np.float64) / (n.astype(np.float64)
                                      * float(LM_FP_SCALE))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "n_tokens": pa.array(n, pa.int64()),
                         "entropy": pa.array(ent, pa.float64())})

    return ds.map_batches(entropy, batch_format="pyarrow",
                          batch_size=65536)


def q_type_token_ratio(sf_dir: str):
    """Per-document lexical diversity — the TTR / hapax profile quality
    filters use alongside entropy (a low distinct/total ratio or a
    vanishing hapax share flags templated, repetitive text). Output
    (doc_id, n_tokens, n_distinct, n_hapax, ttr) for docs with ≥ 1
    token; ttr = n_distinct / n_tokens is ONE float division of exact
    integers (the oracle's tree), so hashes match bit-for-bit.

    Shape at scale: a doc is one row, so the per-doc term counts are
    batch-local — ONE zero-shuffle streaming pass over the shared
    tokenize-once intermediate; nothing corpus-sized exists anywhere."""
    ds = _tokenized_docs(sf_dir)  # shared tokenize-once intermediate

    def ttr(t: pa.Table) -> pa.Table:
        words, parents = _doc_tokens_from_lists(t)
        ntok = pc.list_value_length(_as_array(t["toks"])).to_numpy(
            zero_copy_only=False).astype(np.int64)
        n = t.num_rows
        d = pd.DataFrame({"w": words.to_pandas(),
                          "p": parents.to_pandas()})
        nd = np.zeros(n, np.int64)
        nh = np.zeros(n, np.int64)
        if len(d):
            cw = (d.groupby(["p", "w"], sort=False).size()
                  .reset_index(name="c"))
            per_d = cw.groupby("p", sort=False).size()
            nd[per_d.index.to_numpy(np.int64)] = per_d.to_numpy(np.int64)
            hap = cw[cw["c"] == 1].groupby("p", sort=False).size()
            nh[hap.index.to_numpy(np.int64)] = hap.to_numpy(np.int64)
        keep = ntok > 0
        ids = t["doc_id"].combine_chunks().to_numpy(
            zero_copy_only=False)[keep]
        nt, ndk, nhk = ntok[keep], nd[keep], nh[keep]
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_tokens": pa.array(nt, pa.int64()),
            "n_distinct": pa.array(ndk, pa.int64()),
            "n_hapax": pa.array(nhk, pa.int64()),
            "ttr": pa.array(ndk.astype(np.float64)
                            / nt.astype(np.float64), pa.float64()),
        })

    return ds.map_batches(ttr, batch_format="pyarrow", batch_size=65536)


def q_zscore_by_group(sf_dir: str):
    """Per-group feature standardization — the z-score transform a
    training pipeline applies before length-based filtering or mixing:
    z = (x - mean_g) / std_g of n_chars within each source. Output
    (doc_id, source, n_chars, z); zero-variance groups are excluded
    (z undefined there).

    Scale path: pass 1 is the grouped_stats (n, s, sq) combiner — the
    corpus collapses to ≤ #sources stat rows (bounded by the source
    domain), which broadcast via ray.put; pass 2 is ONE zero-shuffle
    streaming pass with a vectorized per-batch merge. Parity: s/sq are
    exact integer sums, and mean/std/z use the identical IEEE tree the
    oracle spells out (the grouped_stats argument), so z is bit-equal."""
    ds = _read(sf_dir, "documents", ["doc_id", "source", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        x = pc.cast(t["n_chars"], pa.int64())
        g = pa.table({
            "source": t["source"], "x": x, "xx": pc.multiply(x, x),
        }).group_by("source").aggregate(
            [("x", "count"), ("x", "sum"), ("xx", "sum")])
        return g.rename_columns(["source", "n", "s", "sq"])

    stats = (ds.map_batches(partial, batch_format="pyarrow",
                            batch_size=65536)
             .groupby("source")
             .aggregate(Sum("n", alias_name="n"), Sum("s", alias_name="s"),
                        Sum("sq", alias_name="sq"))
             ).to_pandas()  # ≤ #sources rows — domain-bounded by design
    if stats.empty:
        return rd.from_arrow(pa.table({
            "doc_id": pa.array([], pa.int64()),
            "source": pa.array([], pa.string()),
            "n_chars": pa.array([], pa.int64()),
            "z": pa.array([], pa.float64())}))
    n = stats["n"].to_numpy().astype(np.float64)
    s = stats["s"].to_numpy()
    sq = stats["sq"].to_numpy()
    mean = s / n
    std = np.sqrt(sq / n - mean * mean)  # the oracle's exact tree
    model = pd.DataFrame({"source": stats["source"], "mean": mean,
                          "std": std})[std > 0]
    model_ref = ray.put(model)

    class ZScore:
        def __init__(self):
            self.model = ray.get(model_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            m = df.merge(self.model, on="source")  # drops zero-var groups
            z = (m["n_chars"].to_numpy().astype(np.float64)
                 - m["mean"].to_numpy()) / m["std"].to_numpy()
            return pd.DataFrame({
                "doc_id": m["doc_id"].astype("int64"),
                "source": m["source"],
                "n_chars": m["n_chars"].astype("int64"),
                "z": z})

    return ds.map_batches(ZScore, batch_format="pandas",
                          batch_size=65536, concurrency=(1, 4))


def q_full_join(sf_dir: str):
    """customer FULL OUTER JOIN events-per-user (native Ray hash join,
    join_type="full_outer") — the reconciliation join: one row per key
    from EITHER side; customers who never fired an event AND event users
    with no customer row both survive, zero-/'(none)'-filled. Completes
    the registry's join-type coverage (inner/left/semi/anti/broadcast/
    multi/asof/range/skew/fuzzy). The event side collapses to ≤1 row per
    user via the count combiner BEFORE the join, so the exchange moves
    distinct keys only; Ray's full_outer coalesces the right-only key
    values into the left key column."""
    events = _read(sf_dir, "events", ["user_id"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by("user_id").aggregate([([], "count_all")])
        return g.rename_columns(["user_id", "p_cnt"])

    per_user = (events.map_batches(partial, batch_format="pyarrow",
                                   batch_size=65536)
                .groupby("user_id")
                .aggregate(Sum("p_cnt", alias_name="n_events")))
    joined = cust.join(per_user, join_type="full_outer",
                       num_partitions=_join_partitions(per_cpu_divisor=8),
                       on=("c_custkey",), right_on=("user_id",))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_key": pc.cast(t["c_custkey"], pa.int64()),
            "c_mktsegment": pc.fill_null(t["c_mktsegment"], "(none)"),
            "n_events": pc.fill_null(pc.cast(t["n_events"], pa.int64()), 0),
        })

    return joined.map_batches(finish, batch_format="pyarrow")


def q_normalize_text(sf_dir: str):
    """Text normalization — the cleaning transform at the head of every
    training-data pipeline: lowercase, strip non-alphanumerics to spaces,
    collapse whitespace runs, trim. Output (doc_id, norm_text,
    n_chars_norm); rows whose text normalizes to empty are dropped (they
    carry no trainable content downstream).

    Scale path: ONE zero-shuffle streaming pass of pure Arrow C++ RE2
    kernels (utf8_lower → two replace_substring_regex → trim) — no Python
    in the hot path. Both sides run RE2 ('g'-flag regexp_replace in
    DuckDB), so the normalized strings are byte-identical."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def norm(t: pa.Table) -> pa.Table:
        a = pc.fill_null(_as_array(t["text"]), "")
        a = pc.utf8_lower(a)
        a = pc.replace_substring_regex(a, pattern=r"[^a-z0-9\s]+",
                                       replacement=" ")
        a = pc.replace_substring_regex(a, pattern=r"\s+", replacement=" ")
        a = pc.utf8_trim_whitespace(a)
        keep = pc.not_equal(a, "")
        return pa.table({
            "doc_id": pc.cast(t["doc_id"], pa.int64()).filter(keep),
            "norm_text": a.filter(keep),
            "n_chars_norm": pc.cast(pc.utf8_length(a), pa.int64())
            .filter(keep)})

    return ds.map_batches(norm, batch_format="pyarrow", batch_size=65536)


_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_pivot_counts(sf_dir: str):
    """PIVOT: per-day event counts spread into one column per event type.
    A per-batch pandas crosstab collapses each batch to ≤ #days rows
    (combiner), then the final groupby sums the already-pivoted columns —
    the shuffle moves #days × #types cells, never raw events. The pivot
    column domain is the operator's declared config (the reference's typed
    projection declares its field list the same way, qdrant/client.go:38)."""
    ds = _read(sf_dir, "events", ["ts", "event_type"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        day = df["ts"].dt.floor("D")
        ct = pd.crosstab(day, df["event_type"])
        for et in _EVENT_TYPES:
            if et not in ct.columns:
                ct[et] = 0
        ct = ct[_EVENT_TYPES].astype("int64")
        ct.columns = [f"n_{c}" for c in _EVENT_TYPES]
        ct.index.name = "day"
        return ct.reset_index()

    return (
        ds.map_batches(partial, batch_format="pandas", batch_size=65536)
        .groupby("day")
        .aggregate(*[Sum(f"n_{c}", alias_name=f"n_{c}") for c in _EVENT_TYPES])
    )


def q_count_distinct(sf_dir: str):
    """COUNT(DISTINCT) via the two-level pattern: per-batch distinct pairs
    (combiner inside dedup_exact) → bucketed global dedup of
    (event_type, user_id) → partial counts → tiny final groupby. The only
    all-to-all moves pre-deduped narrow pairs."""
    ds = _read(sf_dir, "events", ["event_type", "user_id"])
    pairs = dedup_exact(ds, ["event_type", "user_id"])

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by("event_type").aggregate([("user_id", "count")])
        return g.rename_columns(["event_type", "p_cnt"])

    return (
        pairs.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("p_cnt", alias_name="n_users"))
    )


_PRICE_BANDS = [
    ("p00_low", 0.0, 125_000.0),
    ("p01_mid", 125_000.0, 250_000.0),
    ("p02_high", 250_000.0, 375_000.0),
    ("p03_top", 375_000.0, float("inf")),
]


def q_range_join(sf_dir: str):
    """Range (interval) join: each order matched to the price band with
    lo <= price < hi. The band table is tiny → held as a broadcast constant;
    the probe is one vectorized np.searchsorted per batch — a range join
    with ZERO shuffle (the general pattern for banding / bucketing joins:
    broadcast the sorted interval bounds, binary-search the probe column)."""
    ds = _read(sf_dir, "orders", ["o_totalprice"])
    names = np.array([b[0] for b in _PRICE_BANDS], dtype=object)
    lows = np.array([b[1] for b in _PRICE_BANDS])

    def assign(t: pa.Table) -> pa.Table:
        price = t["o_totalprice"].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(lows, price, side="right") - 1
        # idx == -1 (price below every band's lower bound) would Python-wrap
        # to the TOP band; the oracle's inner range join drops such rows
        keep = idx >= 0
        idx, price = idx[keep], price[keep]
        band = pa.array(names[idx], pa.string())
        g = pa.table({"band": band, "price": pa.array(price)}).group_by(
            "band"
        ).aggregate([("price", "sum"), ([], "count_all")])  # count(*)
        return g.rename_columns(["band", "p_rev", "p_cnt"])

    out = (
        ds.map_batches(assign, batch_format="pyarrow", batch_size=65536)
        .groupby("band")
        .aggregate(Sum("p_rev", alias_name="revenue"),
                   Sum("p_cnt", alias_name="n_orders"))
    )
    return out.map_batches(_round_cols({"revenue": 2}), batch_format="pyarrow")


def q_rollup_agg(sf_dir: str):
    """GROUP BY ROLLUP(lang, source): the finest level is a distributed
    partial+final groupby; the coarser levels re-aggregate the finest result
    in ONE vectorized task — at any input scale the rollup fan-in sees
    ≤ |lang|×|source| pre-aggregated rows, so it is fixed-size and
    driver-free. Integer metrics (doc count, char sum) → exact vs SQL."""
    ds = _read(sf_dir, "documents", ["lang", "source", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        # count_all (= SQL count(*)) not count(n_chars): a null n_chars must
        # still count the row; null group KEYS are kept by Arrow group_by
        g = t.group_by(["lang", "source"]).aggregate(
            [("n_chars", "sum"), ([], "count_all")]
        )
        return g.rename_columns(["lang", "source", "p_chars", "p_cnt"])

    finest = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby(["lang", "source"])
        .aggregate(Sum("p_chars", alias_name="sum_chars"),
                   Sum("p_cnt", alias_name="n_docs"))
    )

    def rollup(df: pd.DataFrame) -> pd.DataFrame:
        lvl0 = df[["lang", "source", "n_docs", "sum_chars"]].copy()
        lvl1 = (
            df.groupby("lang", as_index=False, dropna=False)[
                ["n_docs", "sum_chars"]]
            .sum()
            .assign(source="ALL")
        )
        lvl2 = pd.DataFrame(
            {"lang": ["ALL"], "source": ["ALL"],
             "n_docs": [df["n_docs"].sum()],
             "sum_chars": [df["sum_chars"].sum()]}
        )
        out = pd.concat([lvl0, lvl1, lvl2], ignore_index=True)
        out["n_docs"] = out["n_docs"].astype("int64")
        out["sum_chars"] = out["sum_chars"].astype("int64")
        return out[["lang", "source", "n_docs", "sum_chars"]]

    return finest.repartition(1).map_batches(
        rollup, batch_format="pandas", batch_size=None
    )


def _pair_explode(df: pd.DataFrame) -> pd.DataFrame:
    """Adjacent-id pair fan-out shared by the pair-verify ops
    (ngram_jaccard / ngram_containment): each doc ships to its ≤2
    candidate pairs, keyed for ONE bucketed exchange. Lower ONCE per
    batch with the Arrow kernel (≡ DuckDB lower — both utf8proc; Python
    str.lower() full-case-maps final-sigma/dotted-İ and would break
    oracle parity)."""
    from ..functions.dedup_exact import key_buckets

    lowered = pc.utf8_lower(pc.fill_null(
        pa.array(df["text"], pa.string()), "")).to_pandas()
    a = pd.DataFrame({"pair_id": df["doc_id"], "role": 0, "text": lowered})
    b = pd.DataFrame({"pair_id": df["doc_id"] - 1, "role": 1,
                      "text": lowered})
    out = pd.concat([a, b], ignore_index=True)
    out = out[out["pair_id"] >= 0].copy()
    out["bucket"] = key_buckets(out, ["pair_id"], 64)
    return out


def _char_shingles(t) -> set:
    """ORACLE-LOCKED 5-char shingle rule shared by the pair-verify ops:
    distinct substr(lower(text), i, 5); texts shorter than 5 chars
    contribute themselves. Text must arrive ALREADY lowered
    (_pair_explode's vectorized utf8_lower). The DuckDB mirror is the
    shing CTE in the ngram_jaccard / ngram_containment oracles — change
    BOTH or NEITHER."""
    t = t or ""
    if not t:
        return set()
    if len(t) < 5:
        return {t}
    return {t[i:i + 5] for i in range(len(t) - 4)}


def q_ngram_jaccard(sf_dir: str):
    """Standalone n-gram Jaccard similarity: exact 5-char-shingle overlap
    for each adjacent-doc-id pair (adjacent ids stand in for any candidate
    pair list, e.g. LSH output — the operator is the pair-keyed bucketed
    verify). Each doc ships to its ≤2 pairs through ONE bucketed shuffle;
    per-bucket work touches only each pair's two shingle sets. Integer
    (n_common, n_union) output → exact vs SQL, no float rounding."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    explode, _shingles = _pair_explode, _char_shingles

    def bucket_fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["pair_id", "role"], kind="stable")
        doc_a, doc_b, n_common, n_union = [], [], [], []
        for pid, gg in g.groupby("pair_id", sort=True):
            if len(gg) != 2:  # pair missing one side → not a pair
                continue
            sa = _shingles(gg["text"].iloc[0])
            sb = _shingles(gg["text"].iloc[1])
            doc_a.append(pid)
            doc_b.append(pid + 1)
            n_common.append(len(sa & sb))
            n_union.append(len(sa | sb))
        return pd.DataFrame(
            {
                "doc_a": np.asarray(doc_a, dtype="int64"),
                "doc_b": np.asarray(doc_b, dtype="int64"),
                "n_common": np.asarray(n_common, dtype="int64"),
                "n_union": np.asarray(n_union, dtype="int64"),
            }
        )

    return (
        ds.map_batches(explode, batch_format="pandas", batch_size=65536)
        .groupby("bucket")
        .map_groups(bucket_fn, batch_format="pandas")
    )


def q_ngram_containment(sf_dir: str):
    """Asymmetric n-gram containment — the quote/subset-duplicate signal
    Jaccard misses: a short doc fully embedded in a long one scores
    containment ≈ 1 but Jaccard ≈ |short|/|long|. Same pair-keyed
    bucketed verify as ngram_jaccard (adjacent-id pairs stand in for any
    candidate list); output per pair (n_a, n_b, n_common, containment =
    n_common / min(n_a, n_b)); pairs where either side has no shingles
    are excluded (score undefined).

    Scale path: each doc ships to its ≤2 pairs through ONE bucketed
    exchange; per-bucket work touches only each pair's two shingle sets.
    Integer counts + one float division → exact vs SQL."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    explode = _pair_explode

    def bucket_fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["pair_id", "role"], kind="stable")
        rows = []
        for pid, gg in g.groupby("pair_id", sort=True):
            if len(gg) != 2:
                continue
            sa = _char_shingles(gg["text"].iloc[0])
            sb = _char_shingles(gg["text"].iloc[1])
            if not sa or not sb:
                continue
            nc = len(sa & sb)
            rows.append((pid, pid + 1, len(sa), len(sb), nc,
                         nc / min(len(sa), len(sb))))
        cols = ["doc_a", "doc_b", "n_a", "n_b", "n_common", "containment"]
        if not rows:
            return pd.DataFrame({c: pd.Series(
                [], dtype="float64" if c == "containment" else "int64")
                for c in cols})
        out = pd.DataFrame(rows, columns=cols)
        for c in cols[:5]:
            out[c] = out[c].astype("int64")
        return out

    return (
        ds.map_batches(explode, batch_format="pandas", batch_size=65536)
        .groupby("bucket")
        .map_groups(bucket_fn, batch_format="pandas")
    )


def q_regex_extract(sf_dir: str):
    """Vectorized regex field extraction (RE2 extract_regex kernel — no
    per-row Python) from the JSON-ish props string, then a grouped
    aggregate: per event_type, row count and sum of the extracted k."""
    ds = _read(sf_dir, "events", ["event_type", "props"])

    def partial(t: pa.Table) -> pa.Table:
        m = pc.extract_regex(pc.fill_null(t["props"], ""),
                             pattern=r'"k":\s*(?P<k>\d+)')
        k = pc.fill_null(pc.cast(pc.struct_field(m, "k"), pa.int64()), 0)
        g = pa.table({"event_type": t["event_type"], "k": k}).group_by(
            "event_type"
        ).aggregate([("k", "sum"), ("k", "count")])
        return g.rename_columns(["event_type", "p_k", "p_cnt"])

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby("event_type")
        .aggregate(Sum("p_k", alias_name="sum_k"),
                   Sum("p_cnt", alias_name="n_events"))
    )


# --- extended analytics / training-data ops --------------------------------
def q_semi_join(sf_dir: str):
    """SEMI join: customers having ≥1 order — the positive twin of
    q_anti_join. The key side collapses to its distinct key set and ships
    once (ray.put); the probe side streams through one vectorized pc.is_in
    per batch. For an unbounded key domain the bucketed dedup_exact +
    merge path replaces the broadcast (set_intersect shows that shape)."""
    okeys = pc.unique(
        pq.read_table(os.path.join(sf_dir, "orders.parquet"),
                      columns=["o_custkey"])["o_custkey"].combine_chunks()
    )
    ds = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    return _broadcast_keyset_filter(ds, "c_custkey", okeys, keep=True,
                                    distinct=False)


def q_histogram(sf_dir: str):
    """Fixed-width histogram (bin = floor(price / 25000)): per-batch Arrow
    combiner collapses each batch to ≤ #bins rows, one tiny final groupby —
    the canonical distributed histogram with a constant-size shuffle."""
    ds = _read(sf_dir, "orders", ["o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        b = pc.cast(pc.floor(pc.divide(t["o_totalprice"], 25000.0)), pa.int64())
        g = pa.table({"bin": b}).group_by("bin").aggregate([("bin", "count")])
        return g.rename_columns(["bin", "p_cnt"])

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby("bin")
        .aggregate(Sum("p_cnt", alias_name="n_orders"))
    )


def q_mode_per_group(sf_dir: str):
    """Grouped MODE (most frequent event_type per user; ties → lexicographic
    first): per-batch pair-count combiner → ONE user-bucketed shuffle →
    vectorized count-sum + argmax per 64-bucket (sort + drop_duplicates,
    never one Python call per user or per group)."""
    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    from ..functions.dedup_exact import key_buckets

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = (
            df.groupby(["user_id", "event_type"], sort=False)
            .size().reset_index(name="p_cnt")
        )
        out["bucket"] = key_buckets(out, ["user_id"], 64)
        return out

    def argmax_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # sum the per-batch partial counts, then argmax — both vectorized;
        # a Ray groupby(["user_id","event_type"]).aggregate here is the
        # high-cardinality-aggregate trap (per-group Python cost: measured
        # 346 s for 116k groups at sf0.01 in q_cooccurrence's first draft)
        c = (
            g.groupby(["user_id", "event_type"], sort=False)["p_cnt"]
            .sum().reset_index(name="cnt")
        )
        c = c.sort_values(["user_id", "cnt", "event_type"],
                          ascending=[True, False, True], kind="stable")
        out = c.drop_duplicates("user_id", keep="first").copy()
        out["cnt"] = out["cnt"].astype("int64")
        return out[["user_id", "event_type", "cnt"]]

    return (
        ds.map_batches(partial, batch_format="pandas", batch_size=65536)
        .groupby("bucket")
        .map_groups(argmax_bucket, batch_format="pandas")
    )


def q_stratified_sample(sf_dir: str):
    """Stratified deterministic sampling: 10 docs per lang stratum in
    md5(doc_id) order. Rank-by-hash makes the sample reproducible across
    runs AND partitionings; the per-batch partial top-10 combiner caps the
    shuffle at 10·#strata rows per batch (distributed ORDER BY hash
    LIMIT k per group). The md5 loop is per-row by nature (same as
    q_fingerprint) but touches only (id, lang) — no payload movement."""
    ds = _read(sf_dir, "documents", ["doc_id", "lang"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["hkey"] = [hashlib.md5(str(d).encode()).hexdigest()
                      for d in df["doc_id"]]
        df = df.sort_values(["lang", "hkey", "doc_id"], kind="stable")
        return df.groupby("lang", sort=False).head(10)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["hkey", "doc_id"], kind="stable").head(10)
        return g[["lang", "doc_id"]]

    return (
        ds.map_batches(partial, batch_format="pandas", batch_size=65536)
        .groupby("lang")
        .map_groups(final, batch_format="pandas")
    )


def q_dense_rank(sf_dir: str):
    """DENSE_RANK of each user's events by event time: hash-bucket users,
    ONE vectorized pandas rank (C path) per bucket."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def rank_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        g["rnk"] = (
            g.groupby("user_id", sort=False)["ts"]
            .rank(method="dense").astype("int64")
        )
        return g[["event_id", "user_id", "rnk"]]

    return (
        _bucketed(ds, ["user_id"])
        .groupby("bucket")
        .map_groups(rank_bucket, batch_format="pandas")
    )


def q_lag_delta(sf_dir: str):
    """LAG-based inter-event gaps per user, in integer microseconds (exact
    vs SQL — no float time arithmetic): bucketed vectorized diff; per user
    the gap count, the max gap, and the telescoped span."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def gaps_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        us = g["ts"].astype("datetime64[us]").astype("int64")
        dt = us.diff().astype("float64")
        dt[g["user_id"].ne(g["user_id"].shift())] = np.nan  # user boundary
        agg = (
            pd.DataFrame({"user_id": g["user_id"].values, "dt": dt.values})
            .groupby("user_id", sort=False)["dt"]
            .agg(["count", "max", "sum"])
        )
        agg = agg[agg["count"] >= 1]
        return pd.DataFrame(
            {
                "user_id": agg.index,
                "n_gaps": agg["count"].astype("int64").values,
                "max_gap_us": agg["max"].astype("int64").values,
                "span_us": agg["sum"].astype("int64").values,
            }
        )

    return (
        _bucketed(ds, ["user_id"])
        .groupby("bucket")
        .map_groups(gaps_bucket, batch_format="pandas")
    )


def q_cooccurrence(sf_dir: str):
    """Item co-occurrence (market-basket): part pairs within one order,
    global top-100. Two bucketed exchanges, both vectorized: (1) orders
    hash-bucket; each bucket self-merges on the order key (pandas join —
    the blow-up is bounded by order size²) and emits pair-count partials
    tagged with a PAIR-key bucket; (2) pair buckets sum their counts and
    keep a local top-100 (safe: a pair key lives entirely in one bucket,
    so the global top-100 is within the union of per-bucket top-100s);
    a fixed ≤64·100-row sort/limit finishes. The first draft's
    groupby(pair).aggregate(Sum) took 346 s on 116k distinct pairs at
    sf0.01 — Ray's multi-key aggregate pays per-group Python cost, so
    high-cardinality aggregation MUST go through bucketed map_groups."""
    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    from ..functions.dedup_exact import key_buckets

    def pairs_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g[["l_orderkey", "l_partkey"]]
        m = g.merge(g, on="l_orderkey", suffixes=("_a", "_b"))
        m = m[m["l_partkey_a"] < m["l_partkey_b"]]
        out = (
            m.groupby(["l_partkey_a", "l_partkey_b"], sort=False)
            .size().reset_index(name="p_cnt")
        )
        out = out.rename(
            columns={"l_partkey_a": "part_a", "l_partkey_b": "part_b"}
        )
        out["bucket"] = key_buckets(out, ["part_a", "part_b"], 64)
        return out

    def top_bucket(g: pd.DataFrame) -> pd.DataFrame:
        c = (
            g.groupby(["part_a", "part_b"], sort=False)["p_cnt"]
            .sum().reset_index(name="cnt")
        )
        c["cnt"] = c["cnt"].astype("int64")
        c = c.sort_values(["cnt", "part_a", "part_b"],
                          ascending=[False, True, True], kind="stable")
        return c.head(100)

    counts = (
        _bucketed(ds, ["l_orderkey"])
        .groupby("bucket")
        .map_groups(pairs_bucket, batch_format="pandas")
        .groupby("bucket")
        .map_groups(top_bucket, batch_format="pandas")
    )
    return counts.sort(["cnt", "part_a", "part_b"],
                       descending=[True, False, False]).limit(100)


_FUNNEL_STAGES = ["view", "click", "purchase"]


def q_funnel_counts(sf_dir: str):
    """3-stage event funnel (view → click → purchase, first-timestamp
    semantics): users hash-bucket; each bucket computes its users' stage
    times fully vectorized (3 grouped mins + 2 merges) and emits ONE
    partial-count row per stage; the fixed-3-row final sums them — funnel
    analysis with a constant-size shuffle at any input scale."""
    ds = _read(sf_dir, "events", ["user_id", "event_type", "ts"])

    def funnel_bucket(g: pd.DataFrame) -> pd.DataFrame:
        v = g[g["event_type"] == "view"].groupby("user_id")["ts"].min()
        cl = g[g["event_type"] == "click"][["user_id", "ts"]].merge(
            v.rename("t1").reset_index(), on="user_id")
        c = cl[cl["ts"] >= cl["t1"]].groupby("user_id")["ts"].min()
        pu = g[g["event_type"] == "purchase"][["user_id", "ts"]].merge(
            c.rename("t2").reset_index(), on="user_id")
        p = pu[pu["ts"] >= pu["t2"]].groupby("user_id")["ts"].min()
        return pd.DataFrame({"stage": _FUNNEL_STAGES,
                             "p_cnt": [len(v), len(c), len(p)]})

    agg = (
        _bucketed(ds, ["user_id"])
        .groupby("bucket")
        .map_groups(funnel_bucket, batch_format="pandas")
        .groupby("stage")
        .aggregate(Sum("p_cnt", alias_name="n_users"))
    )

    def ensure_all(df: pd.DataFrame) -> pd.DataFrame:
        df = df.set_index("stage").reindex(_FUNNEL_STAGES, fill_value=0)
        return pd.DataFrame({"stage": df.index,
                             "n_users": df["n_users"].astype("int64").values})

    return agg.repartition(1).map_batches(ensure_all, batch_format="pandas",
                                          batch_size=None)


def q_inverted_index(sf_dir: str):
    """Inverted text index: word → document frequency + first-10 posting
    doc_ids. Tokenize/explode in Arrow C++ (split_pattern_regex +
    list_parent_indices), per-batch pair dedup (combiner), ONE bucketed
    global pair dedup, then per-word partials (count + packed min-10 ids)
    merged vectorized per word-bucket. Min-k postings are mergeable at
    every level, so no stage ever holds a full posting list — the scale
    path for building retrieval indexes over a 100 TB corpus."""
    ds = _tokenized_docs(sf_dir)  # shared tokenize-once intermediate
    from ..functions.dedup_exact import key_buckets

    def pairs(t: pa.Table) -> pa.Table:
        words, parents = _doc_tokens_from_lists(t)
        docs = pc.take(_as_array(t["doc_id"]), parents)
        pt = pa.table({"word": words, "doc_id": docs})
        return pt.group_by(["word", "doc_id"]).aggregate([])

    pair_ds = dedup_exact(
        ds.map_batches(pairs, batch_format="pyarrow", batch_size=65536),
        ["word", "doc_id"],
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["word", "doc_id"], kind="stable")
        g = df.groupby("word", sort=False)
        out = g.size().to_frame("p_df")
        capped = df[g.cumcount() < 10].copy()
        capped["ds"] = capped["doc_id"].astype(str)
        out["p_docs"] = capped.groupby("word", sort=False)["ds"].agg(",".join)
        out = out.reset_index()
        out["bucket"] = key_buckets(out, ["word"], 64)
        return out

    def final_bucket(g: pd.DataFrame) -> pd.DataFrame:
        df_tot = g.groupby("word", sort=True)["p_df"].sum()
        pv = g[["word", "p_docs"]].copy()
        pv["p_docs"] = pv["p_docs"].str.split(",")
        pv = pv.explode("p_docs")
        pv["doc_id"] = pv["p_docs"].astype("int64")
        pv = pv.sort_values(["word", "doc_id"], kind="stable")
        capped = pv[pv.groupby("word", sort=False).cumcount() < 10].copy()
        capped["ds"] = capped["doc_id"].astype(str)
        # comma-joined string, not list<int64>: a stable cross-engine value
        # representation for the posting sample (lists hash differently from
        # pandas vs DuckDB result frames)
        tops = capped.groupby("word", sort=True)["ds"].agg(",".join)
        return pd.DataFrame(
            {
                "word": df_tot.index,
                "df": df_tot.astype("int64").values,
                "top_docs": tops.reindex(df_tot.index).values,
            }
        )

    return (
        pair_ds.map_batches(partial, batch_format="pandas", batch_size=262144)
        .groupby("bucket")
        .map_groups(final_bucket, batch_format="pandas")
    )


def q_cube_agg(sf_dir: str):
    """GROUP BY CUBE(lang, source): the finest level is a distributed
    partial+final groupby; all three coarser planes re-aggregate the finest
    result in ONE fixed-size vectorized task (q_rollup_agg plus the
    source-only plane)."""
    ds = _read(sf_dir, "documents", ["lang", "source", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        # count_all (= SQL count(*)) not count(n_chars): a null n_chars must
        # still count the row; null group KEYS are kept by Arrow group_by
        g = t.group_by(["lang", "source"]).aggregate(
            [("n_chars", "sum"), ([], "count_all")]
        )
        return g.rename_columns(["lang", "source", "p_chars", "p_cnt"])

    finest = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby(["lang", "source"])
        .aggregate(Sum("p_chars", alias_name="sum_chars"),
                   Sum("p_cnt", alias_name="n_docs"))
    )

    def cube(df: pd.DataFrame) -> pd.DataFrame:
        lvl0 = df[["lang", "source", "n_docs", "sum_chars"]].copy()
        by_lang = (
            df.groupby("lang", as_index=False, dropna=False)[
                ["n_docs", "sum_chars"]].sum().assign(source="ALL")
        )
        by_src = (
            df.groupby("source", as_index=False, dropna=False)[
                ["n_docs", "sum_chars"]].sum().assign(lang="ALL")
        )
        total = pd.DataFrame(
            {"lang": ["ALL"], "source": ["ALL"],
             "n_docs": [df["n_docs"].sum()],
             "sum_chars": [df["sum_chars"].sum()]}
        )
        out = pd.concat([lvl0, by_lang, by_src, total], ignore_index=True)
        out["n_docs"] = out["n_docs"].astype("int64")
        out["sum_chars"] = out["sum_chars"].astype("int64")
        return out[["lang", "source", "n_docs", "sum_chars"]]

    return finest.repartition(1).map_batches(
        cube, batch_format="pandas", batch_size=None
    )


def q_repetition_stats(sf_dir: str):
    """Gopher-style repetition/quality signals (Rae et al. 2021 §A1.1:
    duplicate-token and top-n-gram fractions flag low-quality docs), as
    EXACT integers per doc: token count, distinct tokens, duplicate tokens,
    and the count of the most frequent adjacent bigram. Embarrassingly
    parallel — each doc is one row, so the whole operator is ONE
    map_batches with zero shuffle at any corpus size; ratios are a trivial
    downstream projection (integers keep the oracle hash-exact)."""
    ds = _tokenized_docs(sf_dir)  # shared tokenize-once intermediate

    def stats(t: pa.Table) -> pd.DataFrame:
        # the cached lists use the SAME RE2 kernel family as the SQL oracle
        # (ASCII \s+): pandas str.split() splits on UNICODE whitespace and
        # would diverge on e.g. NBSP in a multilingual corpus
        words, parents = _doc_tokens_from_lists(t)
        docs = pc.take(_as_array(t["doc_id"]), parents)
        tmp = pd.DataFrame({"doc_id": docs.to_pandas(),
                            "tok": words.to_pandas()})
        g = tmp.groupby("doc_id", sort=False)["tok"]
        base = pd.DataFrame({"n_tokens": g.size(), "n_distinct": g.nunique()})
        # adjacent bigrams: explode preserves within-doc order, so a
        # group-wise shift(-1) pairs each token with its successor
        tmp["nxt"] = tmp.groupby("doc_id", sort=False)["tok"].shift(-1)
        bi = tmp[tmp["nxt"].notna()]
        top = (
            bi.groupby(["doc_id", "tok", "nxt"], sort=False).size()
            .groupby("doc_id").max()
        )
        base["top_bigram_cnt"] = top.reindex(base.index).fillna(0)
        base = base.reset_index()
        return pd.DataFrame(
            {
                "doc_id": base["doc_id"],
                "n_tokens": base["n_tokens"].astype("int64"),
                "n_distinct": base["n_distinct"].astype("int64"),
                "dup_tokens": (base["n_tokens"] - base["n_distinct"]).astype(
                    "int64"),
                "top_bigram_cnt": base["top_bigram_cnt"].astype("int64"),
            }
        )

    return ds.map_batches(stats, batch_format="pyarrow", batch_size=65536)


def ntile_assign(i, n, k: int):
    """Vectorized SQL NTILE: 0-based row index ``i`` within an ordered
    partition of size ``n`` → 1-based tile of ``k`` (tile sizes differ by
    at most 1, larger tiles first — with q = n // k and r = n % k, the
    first r tiles have q+1 rows). Property-tested against the row-by-row
    definition in tests/test_properties.py."""
    i = np.asarray(i)
    n = np.asarray(n)
    q, r = n // k, n % k
    cut = r * (q + 1)
    tile = np.where(
        i < cut,
        i // np.maximum(q + 1, 1) + 1,
        r + np.where(q > 0, (i - cut) // np.maximum(q, 1), 0) + 1,
    )
    return tile.astype("int64")


def q_ntile(sf_dir: str):
    """NTILE(4) of each user's events by (ts, event_id) — the partitioned
    quartile window fn. Exact NTILE semantics (bucket sizes differ by ≤1,
    larger buckets first), computed vectorized per user-bucket from the
    ordered row index: with n rows, k tiles, q = n // k, r = n % k, row i
    (0-based) is in tile i // (q+1) + 1 while i < r·(q+1), else
    r + (i - r·(q+1)) // q + 1."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def ntile_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        grp = g.groupby("user_id", sort=False)
        i = grp.cumcount().to_numpy()
        n = grp["user_id"].transform("size").to_numpy()
        out = g[["event_id", "user_id"]].copy()
        out["tile"] = ntile_assign(i, n, 4)
        return out

    return (
        _bucketed(ds, ["user_id"])
        .groupby("bucket")
        .map_groups(ntile_bucket, batch_format="pandas")
    )


def q_first_last(sf_dir: str):
    """FIRST_VALUE / LAST_VALUE per user over the full partition frame:
    each user's first and last event_type by (ts, event_id) — a per-batch
    partial keeps only each batch's first/last row
    per user (2 rows max), so the shuffle carries ≤ 2·users·batches rows
    and the final merge is vectorized per user-bucket."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "event_type", "ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="stable")
        g = df.groupby("user_id", sort=False)
        keep = df[(g.cumcount() == 0)
                  | (g.cumcount() == g["user_id"].transform("size") - 1)]
        return keep[["event_id", "user_id", "event_type", "ts"]]

    def final_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        grp = g.groupby("user_id", sort=False)
        first = g[grp.cumcount() == 0].set_index("user_id")
        last = g[grp.cumcount() == grp["user_id"].transform("size") - 1
                 ].set_index("user_id")
        return pd.DataFrame(
            {
                "user_id": first.index,
                "first_type": first["event_type"].values,
                "last_type": last["event_type"].reindex(first.index).values,
            }
        )

    return (
        _bucketed(
            ds.map_batches(partial, batch_format="pandas", batch_size=65536),
            ["user_id"],
        )
        .groupby("bucket")
        .map_groups(final_bucket, batch_format="pandas")
    )


_KMV_K = 256


def q_approx_distinct(sf_dir: str):
    """Approximate COUNT(DISTINCT o_custkey) via a KMV (k-minimum-values)
    sketch (Bar-Yossef et al. 2002) — the sketch family behind
    approx_count_distinct, chosen over HLL because its estimate is EXACTLY
    reproducible in SQL: est = (k-1)·2³² // h_k with h_k the k-th smallest
    32-bit md5 prefix of the distinct keys (integer division keeps the
    oracle hash-exact; falls back to the exact distinct count below k).
    Distributed shape: each batch emits its ≤k smallest distinct hashes
    (min-k is mergeable at every level, like the inverted-index postings),
    so the fan-in is ≤ k rows per batch regardless of input size."""
    ds = _read(sf_dir, "orders", ["o_custkey"])
    k = _KMV_K

    def partial(t: pa.Table) -> pa.Table:
        keys = pc.unique(t["o_custkey"].combine_chunks())
        hs = np.unique(np.array(
            [int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16)
             for v in keys.to_pylist()], dtype=np.int64))
        return pa.table({"h32": pa.array(hs[:k], pa.int64())})

    def final(t: pa.Table) -> pa.Table:
        hs = np.unique(np.asarray(t["h32"]))
        if len(hs) >= k:
            kth = int(hs[k - 1])
            est = (k - 1) * (1 << 32) // kth
        else:
            kth, est = None, len(hs)
        return pa.table({"k_used": pa.array([k], pa.int64()),
                         "kth_min": pa.array([kth], pa.int64()),
                         "est_distinct": pa.array([est], pa.int64())})

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


def q_retention(sf_dir: str):
    """Cohort retention: users grouped by first-activity week (the cohort),
    counted per week-offset they were active again — the standard
    product-analytics retention matrix, all integer-exact. Users hash-bucket
    once; each bucket computes its users' cohort week and distinct active
    weeks fully vectorized and emits pre-counted (cohort, offset) partials,
    so the final groupby sees ≤ weeks² rows per bucket."""
    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def cohort_bucket(g: pd.DataFrame) -> pd.DataFrame:
        us = g["ts"].astype("datetime64[us]").astype("int64")
        week = us // (7 * 86400 * 1_000_000)
        d = pd.DataFrame({"user_id": g["user_id"].values, "week": week.values})
        d = d.drop_duplicates()
        first = d.groupby("user_id", sort=False)["week"].transform("min")
        pairs = pd.DataFrame(
            {"cohort_week": first, "week_offset": d["week"] - first}
        )
        out = (
            pairs.groupby(["cohort_week", "week_offset"], sort=False)
            .size().reset_index(name="p_users")
        )
        return out

    def final(df: pd.DataFrame) -> pd.DataFrame:
        # ≤ weeks² distinct (cohort, offset) pairs total — one vectorized
        # task, NOT a Ray multi-key aggregate (the per-group-Python trap)
        out = (
            df.groupby(["cohort_week", "week_offset"], sort=True)["p_users"]
            .sum().reset_index(name="n_users")
        )
        out["n_users"] = out["n_users"].astype("int64")
        return out

    return (
        _bucketed(ds, ["user_id"])
        .groupby("bucket")
        .map_groups(cohort_bucket, batch_format="pandas")
        .repartition(1)
        .map_batches(final, batch_format="pandas", batch_size=None)
    )


def q_percent_rank(sf_dir: str):
    """PERCENT_RANK of each user's events by (ts, event_id), emitted as the
    integer pair (rank-1, n-1) instead of the float ratio — float division
    order would break hash-exactness vs SQL; the ratio is a trivial
    downstream projection. One vectorized cumcount per user-bucket."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def pr_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        grp = g.groupby("user_id", sort=False)
        out = g[["event_id", "user_id"]].copy()
        out["rank_minus_1"] = grp.cumcount().astype("int64")
        out["n_minus_1"] = (
            grp["user_id"].transform("size") - 1).astype("int64")
        return out

    return (
        _bucketed(ds, ["user_id"])
        .groupby("bucket")
        .map_groups(pr_bucket, batch_format="pandas")
    )


def q_pair_similarity(sf_dir: str):
    """ALL-PAIRS user similarity over a bounded categorical feature space
    (event-type sets) WITHOUT materializing user pairs: users collapse to
    their distinct type set (bucketed, like group_concat), the sets
    collapse to a histogram (≤ 2^|types| rows), and the final fixed-size
    task emits one row per unordered SET pair with exact integer Jaccard
    components and the pair multiplicity (n·m across sets, n·(n−1)/2
    within). O(users) shuffle for an O(users²) answer — the scale pattern
    for pairwise stats over low-cardinality features."""
    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        return t.group_by(["user_id", "event_type"]).aggregate([])

    def sets_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # same distinct-set construction as q_group_concat, but collapsed
        # straight to a per-bucket SET HISTOGRAM — at scale the histogram
        # (≤2^|types| rows/bucket) must leave the bucket, not per-user rows
        g = g.drop_duplicates(["user_id", "event_type"])
        g = g.sort_values(["user_id", "event_type"], kind="stable")
        s = (
            g.groupby("user_id", sort=False)["event_type"]
            .agg(",".join).reset_index(name="tset")
        )
        return s.groupby("tset", sort=False).size().reset_index(name="p_n")

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        h = df.groupby("tset", sort=True)["p_n"].sum()
        rows = []
        sets = list(h.index)
        for i, a in enumerate(sets):
            sa = set(a.split(","))
            for b in sets[i:]:
                sb = set(b.split(","))
                n = int(h[a]) * (int(h[a]) - 1) // 2 if a == b \
                    else int(h[a]) * int(h[b])
                rows.append((a, b, len(sa & sb), len(sa | sb), n))
        out = pd.DataFrame(rows, columns=["set_a", "set_b", "n_common",
                                          "n_union", "n_pairs"])
        for c in ("n_common", "n_union", "n_pairs"):
            out[c] = out[c].astype("int64")
        return out

    return (
        _bucketed(
            ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=65536),
            ["user_id"],
        )
        .groupby("bucket")
        .map_groups(sets_bucket, batch_format="pandas")
        .repartition(1)
        .map_batches(pairs, batch_format="pandas", batch_size=None)
    )


_PROFILE_COLS = ["l_orderkey", "l_partkey", "l_suppkey"]


def q_profile(sf_dir: str):
    """Table profiling (the at-a-glance report a pipeline runs before
    training): per column the row count, null count and a KMV
    distinct-count estimate (same integer-exact sketch as
    q_approx_distinct, k=256). One narrow partial stream carries both the
    per-batch counters and the per-batch k-minimum hashes (tagged rows in
    one table), so the final task sees ≤ (k+1)·cols rows per batch."""
    ds = _read(sf_dir, "lineitem", _PROFILE_COLS)
    k = _KMV_K

    def partial(t: pa.Table) -> pa.Table:
        cols, h32s, rows, nulls = [], [], [], []
        for c in _PROFILE_COLS:
            a = t[c]
            cols.append(c)
            h32s.append(-1)  # counter row sentinel
            rows.append(t.num_rows)
            nulls.append(pc.sum(pc.is_null(a)).as_py() or 0)
            vals = pc.unique(pc.drop_null(a.combine_chunks()))
            hs = np.unique(np.array(
                [int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16)
                 for v in vals.to_pylist()], dtype=np.int64))[:k]
            cols.extend([c] * len(hs))
            h32s.extend(hs.tolist())
            rows.extend([0] * len(hs))
            nulls.extend([0] * len(hs))
        return pa.table(
            {
                "col": pa.array(cols, pa.string()),
                "h32": pa.array(h32s, pa.int64()),
                "p_rows": pa.array(rows, pa.int64()),
                "p_nulls": pa.array(nulls, pa.int64()),
            }
        )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for c in _PROFILE_COLS:
            sub = df[df["col"] == c]
            hs = np.unique(sub.loc[sub["h32"] >= 0, "h32"].to_numpy())
            if len(hs) >= k:
                est = (k - 1) * (1 << 32) // int(hs[k - 1])
            else:
                est = len(hs)
            out.append(
                {
                    "col": c,
                    "n_rows": int(sub["p_rows"].sum()),
                    "n_nulls": int(sub["p_nulls"].sum()),
                    "est_distinct": int(est),
                }
            )
        return pd.DataFrame(out)

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .repartition(1)
        .map_batches(final, batch_format="pandas", batch_size=None)
    )


def q_weekday_hour(sf_dir: str):
    """Activity heatmap: event counts by (ISO weekday, hour) — the fixed
    7×24-cell reporting aggregate. Per-batch Arrow combiner collapses to
    ≤168 rows, so the exchange is constant-size at any input scale."""
    ds = _read(sf_dir, "events", ["ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t = df["ts"].astype("datetime64[us]")
        out = (
            pd.DataFrame({"dow": t.dt.isocalendar().day.astype("int64"),
                          "hour": t.dt.hour.astype("int64")})
            .groupby(["dow", "hour"], sort=False)
            .size().reset_index(name="p_cnt")
        )
        return out

    return (
        ds.map_batches(partial, batch_format="pandas", batch_size=65536)
        .groupby(["dow", "hour"])
        .aggregate(Sum("p_cnt", alias_name="n_events"))
    )


def q_rolling_count(sf_dir: str):
    """Per-row rolling window count (feature engineering's bread and
    butter): for every event, how many of the same user's events fall in
    [ts − 1h, ts] — SQL's RANGE INTERVAL 1 HOUR PRECEDING AND CURRENT ROW.
    One user-bucketed shuffle; inside a bucket the per-user ranges become
    ONE vectorized searchsorted pair by offsetting each user's timestamps
    onto a disjoint segment of the int64 line (stride > the corpus time
    span + window, so windows can never cross users) — no per-user Python
    loop at any cardinality."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    win_us = 3_600_000_000

    def roll_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"], kind="stable")
        cnt = _windowed_counts(g, ["user_id"], win_us, inclusive=True)
        return pd.DataFrame({"event_id": g["event_id"].values,
                             "cnt_1h": cnt})

    return (
        _bucketed(ds, ["user_id"])
        .groupby("bucket")
        .map_groups(roll_bucket, batch_format="pandas")
    )


def q_daily_series(sf_dir: str):
    """Gap-filled daily event series (reporting needs EVERY calendar day,
    zero-count days included): per-batch day-count partials → tiny groupby
    → ONE fixed-size final task that reindexes over the full min..max day
    range. The dense calendar is bounded (days, not rows), so densification
    never belongs in the distributed part."""
    ds = _read(sf_dir, "events", ["ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        day = df["ts"].astype("datetime64[us]").dt.floor("D")
        out = day.value_counts().rename_axis("day").reset_index(
            name="p_cnt")
        return out

    agg = (
        ds.map_batches(partial, batch_format="pandas", batch_size=65536)
        .groupby("day")
        .aggregate(Sum("p_cnt", alias_name="n_events"))
    )

    def densify(df: pd.DataFrame) -> pd.DataFrame:
        df["day"] = pd.to_datetime(df["day"])
        full = pd.date_range(df["day"].min(), df["day"].max(), freq="D")
        out = (
            df.set_index("day")["n_events"].reindex(full, fill_value=0)
            .rename_axis("day").reset_index()
        )
        out["n_events"] = out["n_events"].astype("int64")
        return out

    return agg.repartition(1).map_batches(densify, batch_format="pandas",
                                          batch_size=None)


def q_time_to_convert(sf_dir: str):
    """Time-to-conversion: per user the integer µs from first view to the
    first purchase at-or-after it (users with both only) — the funnel's
    latency companion. Per-user-bucket vectorized (two grouped mins + one
    merge); exact vs SQL because all arithmetic is integer µs."""
    ds = _read(sf_dir, "events", ["user_id", "event_type", "ts"])

    def ttc_bucket(g: pd.DataFrame) -> pd.DataFrame:
        us = g["ts"].astype("datetime64[us]").astype("int64")
        d = pd.DataFrame({"user_id": g["user_id"].values,
                          "event_type": g["event_type"].values,
                          "us": us.values})
        v = (d[d["event_type"] == "view"].groupby("user_id")["us"].min()
             .rename("t_view"))
        pu = d[d["event_type"] == "purchase"][["user_id", "us"]].merge(
            v.reset_index(), on="user_id")
        pu = pu[pu["us"] >= pu["t_view"]]
        first_p = pu.groupby("user_id").agg(t_view=("t_view", "first"),
                                            t_buy=("us", "min"))
        return pd.DataFrame(
            {
                "user_id": first_p.index,
                "ttc_us": (first_p["t_buy"] - first_p["t_view"]).astype(
                    "int64").values,
            }
        )

    return (
        _bucketed(ds, ["user_id"])
        .groupby("bucket")
        .map_groups(ttc_bucket, batch_format="pandas")
    )


def _lev_le1(a: str, b: str) -> bool:
    """Exact edit-distance ≤ 1 check in O(len): equal, one substitution, or
    one insertion/deletion."""
    if a == b:
        return True
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:  # exactly one substitution allowed
        return sum(1 for x, y in zip(a, b) if x != y) == 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    i = 0  # a is the shorter: one skip allowed in b
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1:]


def q_fuzzy_join(sf_dir: str):
    """Fuzzy string self-join (edit distance ≤ 1) over distinct part names
    via DELETION-NEIGHBORHOOD blocking — the scalable similarity-join
    pattern: each distinct string emits itself plus its single-character
    deletions as blocking keys (|s|+1 short rows), candidates are pairs
    sharing a key (provably a superset of every distance-≤1 pair, and no
    pair beyond distance 2), then an O(len) exact check verifies. One
    variant-bucketed exchange + one pair dedup; never an all-pairs product.
    Per-batch distinct-string collapse keeps Zipf-duplicated names from
    multiplying variants."""
    ds = _read(sf_dir, "part", ["p_name"])

    def variants(t: pa.Table) -> pa.Table:
        names = sorted({s for s in t["p_name"].to_pylist() if s is not None})
        va: list = []
        vs: list = []
        for s in names:
            va.append(s)
            vs.append(s)
            for i in range(len(s)):
                va.append(s[:i] + s[i + 1:])
                vs.append(s)
        return pa.table({"v": pa.array(va, pa.string()),
                         "s": pa.array(vs, pa.string())})

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates()
        m = g.merge(g, on="v", suffixes=("_l", "_r"))
        m = m[m["s_l"] < m["s_r"]]
        return m[["s_l", "s_r"]].drop_duplicates().rename(
            columns={"s_l": "a", "s_r": "b"})

    cands = (
        _bucketed(ds.map_batches(variants, batch_format="pyarrow",
                                 batch_size=65536), ["v"])
        .groupby("bucket")
        .map_groups(pairs_in_bucket, batch_format="pandas")
    )
    cands = dedup_exact(cands, ["a", "b"])  # a pair can share many variants

    def verify(t: pa.Table) -> pa.Table:
        keep = [_lev_le1(x, y) for x, y in zip(t["a"].to_pylist(),
                                               t["b"].to_pylist())]
        return t.filter(pa.array(keep, pa.bool_()))

    return cands.map_batches(verify, batch_format="pyarrow")


def _windowed_counts(g: pd.DataFrame, keys: list[str], win_us: int,
                     inclusive: bool) -> np.ndarray:
    """Per-row count of same-``keys`` events in the trailing ``win_us``
    window, over a SORTED-BY-(keys, ts) frame — the disjoint-segment
    searchsorted kernel shared by q_rolling_count and q_event_throttle.
    ``inclusive`` counts events at the row's own ts (RANGE ... CURRENT ROW);
    exclusive counts strictly-earlier ones only. Each key group is offset
    onto its own segment of the int64 line (stride > time span + window, so
    windows can never cross groups); when key-count × span would overflow
    int64 the bucket is processed in key-code slices — each slice is still
    ONE vectorized searchsorted pair, the loop is over slices, never keys."""
    us = g["ts"].astype("datetime64[us]").astype("int64").to_numpy()
    codes, _ = pd.factorize(
        pd.MultiIndex.from_arrays([g[k] for k in keys]) if len(keys) > 1
        else g[keys[0]], sort=False)
    span = int(us.max() - us.min()) + 2 * win_us + 1
    per_slice = max(1, (1 << 62) // span)
    rel = us - us.min()
    out = np.empty(len(g), np.int64)
    for base in range(0, int(codes.max()) + 1, per_slice):
        m = (codes >= base) & (codes < base + per_slice)
        key = (codes[m] - base).astype("int64") * span + rel[m]
        lo = np.searchsorted(key, key - win_us, side="left")
        hi = np.searchsorted(key, key, side="right" if inclusive else "left")
        out[m] = hi - lo
    return out


def q_mixture_sample(sf_dir: str):
    """Token-budgeted mixture sampling (pre-training data-mixture
    weighting): per source, take docs in deterministic md5(doc_id) order
    while the source's RUNNING token total stays ≤ 200
    (binding at every test scale — ~70 of 500 docs survive at sf0.01). Rank-by-hash makes
    the sample reproducible across partitionings; only narrow (source, id,
    hkey, n_tokens) rows enter the single source-bucketed exchange — the
    ordered prefix-sum selection fundamentally needs the per-source ordered
    scan, so no combiner can prune it (a 0-token doc anywhere in hash order
    can still be selected), but the payload never moves."""
    ds = _read(sf_dir, "documents", ["doc_id", "source", "text"])
    budget = 200

    def partial(t: pa.Table) -> pd.DataFrame:
        df = textops.add_token_count(t).select(
            ["source", "doc_id", "n_tokens"]).to_pandas()
        df["hkey"] = [hashlib.md5(str(d).encode()).hexdigest()
                      for d in df["doc_id"]]
        return df

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["source", "hkey", "doc_id"], kind="stable")
        cum = g.groupby("source", sort=False)["n_tokens"].cumsum()
        out = g[cum <= budget]
        return out[["source", "doc_id", "n_tokens"]]

    return (
        _bucketed(ds.map_batches(partial, batch_format="pyarrow",
                                 batch_size=65536), ["source"])
        .groupby("bucket")
        .map_groups(pick, batch_format="pandas")
    )


def q_event_throttle(sf_dir: str):
    """Windowed event dedup (throttle/debounce — the streaming-ingest
    cleanup op): keep an event only if the same (user, event_type) key had
    NO strictly-earlier event in the preceding hour. Same disjoint-segment
    searchsorted kernel as q_rolling_count — one key-bucketed shuffle, one
    vectorized window probe per bucket slice, no per-key Python."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "event_type", "ts"])
    win_us = 3_600_000_000

    def keep_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "event_type", "ts"], kind="stable")
        keep = _windowed_counts(g, ["user_id", "event_type"], win_us,
                                inclusive=False) == 0
        return g.loc[keep, ["event_id", "user_id", "event_type"]]

    return (
        _bucketed(ds, ["user_id", "event_type"])
        .groupby("bucket")
        .map_groups(keep_bucket, batch_format="pandas")
        .select_columns(["event_id", "user_id", "event_type"])
    )


def q_bigram_top(sf_dir: str):
    """Corpus-wide top-20 adjacent word bigrams (language-model data prep):
    Arrow tokenize, vectorized within-doc shift pairing, per-batch count
    combiner, then a bigram-bucketed vectorized sum with per-bucket local
    top-20 (a bigram lives wholly in one bucket, so the global top-20 is
    inside the union) and a fixed ≤64·20-row final sort — NOT a Ray
    groupby.aggregate over the full bigram vocabulary (the
    high-cardinality-aggregate trap, see q_cooccurrence)."""
    ds = _tokenized_docs(sf_dir)  # shared tokenize-once intermediate

    def partial(t: pa.Table) -> pa.Table:
        words, parents = _doc_tokens_from_lists(t)  # empties pre-dropped
        d = pd.DataFrame({"w": words.to_pandas(), "p": parents.to_pandas()})
        d["nxt"] = d["w"].shift(-1)
        d["pn"] = d["p"].shift(-1)
        d = d[(d["p"] == d["pn"]) & d["nxt"].notna()]
        c = (d["w"] + " " + d["nxt"]).value_counts()
        return pa.table({"bigram": pa.array(c.index, pa.string()),
                         "p_cnt": pa.array(c.values, pa.int64())})

    def top_bucket(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby("bigram", sort=False)["p_cnt"].sum().reset_index(
            name="cnt")
        c["cnt"] = c["cnt"].astype("int64")
        c = c.sort_values(["cnt", "bigram"], ascending=[False, True],
                          kind="stable")
        return c.head(20)

    return (
        _bucketed(
            ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=65536),
            ["bigram"],
        )
        .groupby("bucket")
        .map_groups(top_bucket, batch_format="pandas")
        .sort(["cnt", "bigram"], descending=[True, False])
        .limit(20)
    )


def q_decontaminate(sf_dir: str):
    """Benchmark decontamination — the standard pre-training data-prep
    step: flag corpus docs sharing any 5-word shingle with a benchmark set
    (here: docs with doc_id % 97 == 0). Output (doc_id, n_hits) where
    n_hits = DISTINCT overlapping shingles, docs with hits only.

    Shape at scale: the benchmark side is SMALL by definition (eval sets
    are a few MB against a 100 TB corpus), so its distinct shingle set is
    broadcast once via ray.put and the corpus side streams through ONE
    map_batches with a vectorized pc.is_in membership test — zero
    shuffles, no corpus-sized state anywhere. If the benchmark ever
    outgrew a broadcast object, the fallback is the shingle-bucketed
    semi-join (the q_pair_similarity exchange shape)."""
    ds = _tokenized_docs(sf_dir)  # shared tokenize-once intermediate
    K = 5

    def shingle_lists(t: pa.Table):
        """(doc_ids np, list<str> shingles np-of-lists) for a batch."""
        words, parents = _doc_tokens_from_lists(t)  # empties pre-dropped
        d = pd.DataFrame({"w": words.to_pandas(), "p": parents.to_pandas()})
        cols = {"w0": d["w"]}
        for i in range(1, K):
            nxt = d["w"].shift(-i)
            samedoc = d["p"].shift(-i) == d["p"]
            cols[f"w{i}"] = nxt.where(samedoc)
        sh = pd.DataFrame(cols)
        sh["p"] = d["p"].values
        sh = sh.dropna()
        if sh.empty:
            return pd.DataFrame({"doc": [], "s": []})
        s = sh["w0"].str.cat([sh[f"w{i}"] for i in range(1, K)], sep=" ")
        return pd.DataFrame({"doc": t["doc_id"].to_pandas().values[sh["p"]],
                             "s": s.values})

    def _is_bench(t: pa.Table) -> pa.Array:
        ids = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.array(ids % 97 == 0)

    def bench_partial(t: pa.Table) -> pa.Table:
        keep = _is_bench(t)
        sh = shingle_lists(t.filter(keep))
        return pa.table({"s": pa.array(sh["s"].unique(), pa.string())})

    # benchmark shingles: distinct per batch, distinct again on the driver —
    # benchmark-sized by assumption (documented above)
    bench_parts = ds.map_batches(bench_partial, batch_format="pyarrow",
                                 batch_size=65536).take_all()
    bench_set = pa.array(sorted({r["s"] for r in bench_parts}), pa.string())
    bench_ref = ray.put(bench_set)

    class ScanContaminated:
        def __init__(self):
            self.bench = ray.get(bench_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            keep = pc.invert(_is_bench(t))
            sh = shingle_lists(t.filter(keep))
            if not len(sh):
                return pa.table({"doc_id": pa.array([], pa.int64()),
                                 "n_hits": pa.array([], pa.int64())})
            sh = sh.drop_duplicates()  # distinct (doc, shingle)
            hit = pc.is_in(pa.array(sh["s"], pa.string()),
                           value_set=self.bench).to_pandas()
            c = sh.loc[hit.values].groupby("doc", sort=False).size()
            return pa.table({"doc_id": pa.array(c.index, pa.int64()),
                             "n_hits": pa.array(c.values, pa.int64())})

    # a doc lives wholly in one read block → per-batch counts ARE final
    # (documents.parquet rows are never split mid-doc by map_batches on the
    # doc-sized batches used here); still merge defensively per doc_id in
    # one bucketed pass to stay partition-agnostic
    parts = ds.map_batches(ScanContaminated, batch_format="pyarrow",
                           batch_size=65536, concurrency=(1, 2))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby("doc_id", sort=False)["n_hits"].sum().reset_index()
        m["n_hits"] = m["n_hits"].astype("int64")
        return m

    return _bucketed(parts, ["doc_id"]).groupby("bucket").map_groups(
        merge, batch_format="pandas")


def q_decontaminate_fuzzy(sf_dir: str):
    """MinHash-based benchmark decontamination — the FUZZY complement of
    q_decontaminate's exact-shingle overlap: flag train-corpus docs that are
    NEAR-duplicates (char-5-shingle Jaccard >= 0.8) of any benchmark doc
    (fixture bench set: doc_id % 31 == 0 — a modulus chosen so the synthetic
    corpus actually has verified bench near-dups at sf0.001 AND sf0.01; the
    exact-overlap op keeps its own % 97 fixture). This is the standard eval-set
    scrub for lightly edited benchmark copies that exact n-gram overlap
    misses (whitespace/punctuation edits, dropped sentences). Output one row
    per contaminated train doc: (doc_id, n_bench_matches, best_bench=min
    matched bench id).

    Shape at scale: the bench side is eval-set-sized BY DEFINITION (a few
    MB against a 100 TB corpus), so both its LSH band index and its shingle
    sketches are collected once and broadcast via ray.put; the corpus then
    streams through ONE map_batches that sketches, bands, probes the bench
    index and Jaccard-verifies in place — zero shuffles, zero corpus-sized
    state. The per-candidate verify loop is Python but candidates are
    contamination-rate-sparse (band-hash collisions with a tiny bench set);
    everything batch-sized is vectorized (DuckDB sketch kernel, numpy
    segment-min signatures, pandas band-index merge). Parameters
    (num_perm=64, bands=8, k=5, seed=42, threshold 0.8, empty-vs-empty
    matches) mirror dedup_minhash exactly so the oracle reuses its
    permutation/band literals."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    idx_ref = _fuzzy_bench_index(ds, sf_dir)

    _EMPTY = pa.table({"doc_id": pa.array([], pa.int64()),
                       "n_bench_matches": pa.array([], pa.int64()),
                       "best_bench": pa.array([], pa.int64())})

    class ScanFuzzyContaminated:
        def __init__(self):
            self.bands, self.sets = ray.get(idx_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            t = t.filter(pc.invert(_fuzzy_bench_mask(t)))
            hits = _fuzzy_hits(t, self.bands, self.sets)
            if not hits:
                return _EMPTY
            docs = sorted(hits)
            return pa.table({
                "doc_id": pa.array(docs, pa.int64()),
                "n_bench_matches": pa.array(
                    [len(hits[d]) for d in docs], pa.int64()),
                "best_bench": pa.array(
                    [min(hits[d]) for d in docs], pa.int64()),
            })

    # a doc lives wholly in one read block (same invariant q_decontaminate
    # documents) so per-batch rows are final — no merge pass needed; empty
    # signatures are all-sentinel and thus collide, which is exactly the
    # oracle's fullsigs semantics (empty train text matches empty bench text)
    return ds.map_batches(ScanFuzzyContaminated, batch_format="pyarrow",
                          batch_size=65536, concurrency=(1, 4))


def _fuzzy_bench_mask(t: pa.Table) -> pa.Array:
    """The fuzzy-decontamination fixture's benchmark membership (doc_id %
    31 == 0 — see q_decontaminate_fuzzy's docstring for the choice)."""
    ids = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
    return pa.array(ids % 31 == 0)


_FUZZY_BENCH_CACHE: dict[str, tuple] = {}


def _fuzzy_bench_index(ds, sf_dir: str | None = None):
    """Broadcast-ready bench-side LSH index: ObjectRef of (band rows
    DataFrame(band_id, band_hash, bench_id), {bench_id: sorted uint64
    shingle sketch}). Bench sketches stream out of one pruned scan;
    banding the collected bench table happens driver-side (it is
    eval-set-sized) through the SAME MinHashBander kernel as the corpus —
    via a LOCAL bander, not band_batch: the cached wrapper would park a
    DuckDB connection in the driver's _STAGE_CACHE, poisoning any later
    nested transform that cloudpickles that global by value. Pass sf_dir
    to memoize per input fingerprint + Ray job (the _KG_CACHE pattern) —
    decontaminate_fuzzy and corpus_prep then share ONE bench scan per
    session instead of one each."""
    if sf_dir is not None:
        key = _cache_key(sf_dir)
        hit = _FUZZY_BENCH_CACHE.get(sf_dir)
        if hit is not None and hit[0] == key:
            return hit[1]
        ref = _fuzzy_bench_index(ds)
        _FUZZY_BENCH_CACHE[sf_dir] = (key, ref)
        return ref

    from ..functions.dedup import _SH_TYPE, MinHashBander, sketch_batch

    def bench_partial(t: pa.Table) -> pa.Table:
        return sketch_batch(t.filter(_fuzzy_bench_mask(t)))

    parts = ds.map_batches(bench_partial, batch_format="pyarrow",
                           batch_size=65536).take_all()
    # explicit schema: from_pylist would infer int64 for the uint64 shingle
    # hashes and overflow on values >= 2^63 (half of the md5 space)
    bench_sk = pa.Table.from_pylist(
        parts, schema=pa.schema([("doc_id", pa.int64()), ("sh", _SH_TYPE)]))
    if bench_sk.num_rows == 0:
        bench_bands = pd.DataFrame({"band_id": [], "band_hash": [],
                                    "bench_id": []})
        bench_sets: dict = {}
    else:
        bt = MinHashBander(bands=8, sketch_col="sh")(bench_sk).to_pandas()
        bench_bands = bt.rename(columns={"doc_id": "bench_id"})
        bench_sets = {
            r["doc_id"]: np.sort(np.asarray(r["sh"], dtype=np.uint64))
            for r in bench_sk.to_pylist()
        }
    return ray.put((bench_bands, bench_sets))


def _fuzzy_hits(t: pa.Table, bench_bands: pd.DataFrame,
                bench_sets: dict) -> dict[int, list[int]]:
    """{train doc_id: [verified bench ids]} for one TRAIN-side batch:
    sketch → band → probe the broadcast bench index → exact shingle-set
    Jaccard >= 0.8 per candidate (the dedup_minhash rule, incl.
    empty-vs-empty TRUE). Everything batch-sized is vectorized; the final
    loop is over contamination-rate-sparse candidates only."""
    from ..functions.dedup import band_batch, sketch_batch

    if t.num_rows == 0 or not len(bench_bands):
        return {}
    sk = sketch_batch(t)
    bd = band_batch(sk, sketch_col="sh").to_pandas()
    cand = bd.merge(bench_bands, on=["band_id", "band_hash"])[
        ["doc_id", "bench_id"]].drop_duplicates()
    if cand.empty:
        return {}
    # sketches for just the candidate train docs of THIS batch — filter in
    # Arrow BEFORE the Python conversion: candidates are sparse, so
    # converting the whole batch's sketches to Python lists would dominate
    need = pa.array(cand["doc_id"].unique(), pa.int64())
    sk_c = sk.filter(pc.is_in(sk["doc_id"], value_set=need))
    tsets = {
        r["doc_id"]: np.sort(np.asarray(r["sh"], dtype=np.uint64))
        for r in sk_c.to_pylist()
    }
    from ..functions.dedup import sketch_jaccard_ok

    hits: dict[int, list[int]] = {}
    for did, bid in cand.itertuples(index=False):
        if sketch_jaccard_ok(tsets[did], bench_sets[bid], 0.8):
            hits.setdefault(did, []).append(bid)
    return hits


def q_corpus_prep(sf_dir: str):
    """The composed training-corpus preparation pipeline — the chain a real
    LLM data pipeline runs END TO END, as one lazy Dataset plan:

      1. near-dedup: keep only MinHash cluster keepers (shared
         _minhash_clusters artifact; exact dups are subsumed — identical
         text hashes to identical signatures, keeper = min doc_id),
      2. eval scrub: drop benchmark docs (doc_id % 31 == 0) AND train docs
         fuzzy-contaminated by them (the decontaminate_fuzzy probe, folded
         into the same streaming pass),
      3. quality gate: 10 <= n_tokens <= 10000 (the token_count kernel),
      4. split tag: md5-lower-64(doc_id) % 10 — 'test' on 0 else 'train'
         (the lineage-stable train_test_split primitive).

    Output: (doc_id, n_tokens, split) for every surviving doc. Shape at
    scale: ONE streaming pass over the pruned corpus does tokens + quality
    + bench removal + contamination probe (bench index broadcast once);
    the only exchanges are the ones inside the shared clustering artifact
    and one narrow hash join against the keeper ids. All filter order is
    conjunctive, so the plan can reorder freely without changing results."""
    from ..functions import textops
    from ..functions.dedup import _duck_conn, _md5_lower64

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    idx_ref = _fuzzy_bench_index(ds, sf_dir)

    _EMPTY = pa.table({"doc_id": pa.array([], pa.int64()),
                       "n_tokens": pa.array([], pa.int64()),
                       "split": pa.array([], pa.string())})

    class PrepScan:
        def __init__(self):
            self.bands, self.sets = ray.get(idx_ref)
            self.con = _duck_conn()

        def __call__(self, t: pa.Table) -> pa.Table:
            t = t.filter(pc.invert(_fuzzy_bench_mask(t)))  # drop bench docs
            if t.num_rows == 0:
                return _EMPTY
            t = textops.add_token_count(t)
            nt = t["n_tokens"]
            t = t.filter(pc.and_(pc.greater_equal(nt, 10),
                                 pc.less_equal(nt, 10000)))
            if t.num_rows == 0:
                return _EMPTY
            contaminated = _fuzzy_hits(t, self.bands, self.sets)
            if contaminated:
                bad = pa.array(sorted(contaminated), pa.int64())
                t = t.filter(pc.invert(pc.is_in(t["doc_id"],
                                                value_set=bad)))
            ids = pc.cast(t["doc_id"], pa.string()).combine_chunks()
            split = np.where(_md5_lower64(self.con, ids) % 10 == 0,
                             "test", "train")
            return pa.table({
                "doc_id": t["doc_id"],
                "n_tokens": pc.cast(t["n_tokens"], pa.int64()),
                "split": pa.array(split, pa.string()),
            })

    prepped = ds.map_batches(PrepScan, batch_format="pyarrow",
                             batch_size=65536, concurrency=(1, 4))

    # keeper semi-join: narrow (doc_id) keeper ids from the shared
    # clustering artifact via the native hash join (dedup_keep_best shape)
    def keeper_ids(t: pa.Table) -> pa.Table:
        k = t.filter(t["is_keeper"])
        return pa.table({"k_doc_id": k["doc_id"]})

    keepers = _minhash_clusters(sf_dir).map_batches(
        keeper_ids, batch_format="pyarrow")
    # raw-row join (both sides are one row per surviving document, NOT
    # combiner-reduced) — keep _join_partitions's denser default so each
    # aggregator buffers 1/16 of the corpus rather than 1/4
    return prepped.join(
        keepers, join_type="inner",
        num_partitions=_join_partitions(),
        on=("doc_id",), right_on=("k_doc_id",),
    )


def _nationkey_counts(sf_dir: str, tag_col: str | None, side: str,
                      sign: int = 1):
    """Shared side-builder for the multiset set-ops: a one-column nation-key
    projection collapsed to per-batch (k, c[, side]) count partials.
    ``side`` selects the table ("l" = customer, anything else = supplier)
    AND is the constant label written when ``tag_col`` is set (INTERSECT
    ALL's two-sided min); ``sign`` scales counts (EXCEPT ALL's signed
    merge)."""
    table, col = (("customer", "c_nationkey") if side == "l"
                  else ("supplier", "s_nationkey"))
    ds = _read(sf_dir, table, [col]).map_batches(
        lambda t, c=col: pa.table({"k": t[c]}), batch_format="pyarrow")

    def counted(t: pa.Table) -> pa.Table:
        g = t.group_by("k").aggregate([([], "count_all")])
        g = g.rename_columns(["k", "c"])
        cols = {"k": g["k"],
                "c": pc.multiply(pc.cast(g["c"], pa.int64()), sign)}
        if tag_col:
            # explicit type: an EMPTY batch would otherwise infer null and
            # break the union's schema
            cols[tag_col] = pa.array([side] * g.num_rows, pa.string())
        return pa.table(cols)

    return ds.map_batches(counted, batch_format="pyarrow", batch_size=65536)


def q_intersect_all(sf_dir: str):
    """INTERSECT ALL (bag intersection): per key min(count_left,
    count_right) where both sides occur. Each side collapses to per-batch
    (key, side, count) partials; ONE key-bucketed merge computes the
    vectorized per-key min. The multiset twin of q_except_all."""
    both = _nationkey_counts(sf_dir, "side", "l").union(
        _nationkey_counts(sf_dir, "side", "r"))

    def min_bucket(g: pd.DataFrame) -> pd.DataFrame:
        m = (
            g.groupby(["k", "side"], sort=False)["c"].sum()
            .unstack("side", fill_value=0)
        )
        if "l" not in m.columns:
            m["l"] = 0
        if "r" not in m.columns:
            m["r"] = 0
        mult = m[["l", "r"]].min(axis=1)
        mult = mult[mult > 0]
        return pd.DataFrame({"k": mult.index,
                             "multiplicity": mult.astype("int64").values})

    return (
        _bucketed(both, ["k"])
        .groupby("bucket")
        .map_groups(min_bucket, batch_format="pandas")
    )


def q_dup_rate(sf_dir: str):
    """Corpus duplicate-rate report (the first number a training-data run
    checks): per source, total docs and docs whose exact text (md5) occurs
    more than once corpus-wide. Fingerprints dedup-count through ONE
    hash-bucketed exchange; the per-source totals are a constant-size
    final. Integer counts keep the oracle exact — the ratio is a trivial
    projection."""
    ds = _read(sf_dir, "documents", ["doc_id", "source", "text"])

    def fp(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["fp"] = [hashlib.md5((t or "").encode()).hexdigest()  # = textops
                    # .add_md5_fingerprint's rule (NULL ≡ ''), pandas-side
                    for t in df["text"]]
        return df[["doc_id", "source", "fp"]]

    def dup_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # a fingerprint lives entirely in one bucket → corpus-wide counts
        cnt = g.groupby("fp", sort=False)["fp"].transform("size")
        g = g.assign(is_dup=(cnt > 1).astype("int64"))
        out = (
            g.groupby("source", sort=False)
            .agg(p_docs=("doc_id", "size"), p_dups=("is_dup", "sum"))
            .reset_index()
        )
        return out

    return (
        _bucketed(
            ds.map_batches(fp, batch_format="pandas", batch_size=65536),
            ["fp"],
        )
        .groupby("bucket")
        .map_groups(dup_bucket, batch_format="pandas")
        .groupby("source")
        .aggregate(Sum("p_docs", alias_name="n_docs"),
                   Sum("p_dups", alias_name="n_dup_docs"))
    )


def q_session_stats(sf_dir: str):
    """Session DURATION stats (the usual follow-up to sessionize): per user
    the session count, total active µs and longest session µs, with the
    same 30-minute gap rule. One user-bucketed shuffle, then everything
    vectorized per bucket (cumsum session ids → grouped min/max → telescoped
    integer durations; exact vs SQL — no float time math)."""
    ds = _read(sf_dir, "events", ["user_id", "ts"])
    gap_us = 30 * 60 * 1_000_000

    def stats_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"], kind="stable")
        us = g["ts"].astype("datetime64[us]").astype("int64")
        new_user = g["user_id"].ne(g["user_id"].shift())
        brk = new_user | (us.diff() > gap_us)
        sid = brk.cumsum()  # globally increasing → unique per (user, session)
        d = pd.DataFrame({"user_id": g["user_id"].values, "us": us.values,
                          "sid": sid.values})
        per = d.groupby("sid", sort=False).agg(
            user_id=("user_id", "first"), lo=("us", "min"), hi=("us", "max"))
        per["dur"] = per["hi"] - per["lo"]
        out = per.groupby("user_id", sort=False)["dur"].agg(
            ["count", "sum", "max"])
        return pd.DataFrame(
            {
                "user_id": out.index,
                "n_sessions": out["count"].astype("int64").values,
                "total_dur_us": out["sum"].astype("int64").values,
                "max_dur_us": out["max"].astype("int64").values,
            }
        )

    return (
        _bucketed(ds, ["user_id"])
        .groupby("bucket")
        .map_groups(stats_bucket, batch_format="pandas")
    )


def q_except_all(sf_dir: str):
    """EXCEPT ALL (bag difference, multiset semantics): customer nation
    keys minus supplier nation keys with multiplicity — each side collapses
    to per-batch (key, count) partials, ONE key-bucketed exchange merges
    both sides' counts vectorized, and rows surviving with multiplicity
    m > 0 are emitted as (key, m). Never materializes either side's rows."""
    both = _nationkey_counts(sf_dir, None, "l", sign=1).union(
        _nationkey_counts(sf_dir, None, "r", sign=-1))

    def diff_bucket(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby("k", sort=False)["c"].sum()
        m = m[m > 0]
        return pd.DataFrame({"k": m.index,
                             "multiplicity": m.astype("int64").values})

    return (
        _bucketed(both, ["k"])
        .groupby("bucket")
        .map_groups(diff_bucket, batch_format="pandas")
    )


def q_latest_per_key(sf_dir: str):
    """Log compaction / CDC upsert semantics: the LATEST record per key
    (user's last event by (ts, event_id) — the keep-newest twin of
    dedup_exact's keep-first). Per-batch partial keeps each batch's latest
    row per user (max is mergeable), so the shuffle carries ≤ one row per
    user per batch; one vectorized argmax per user-bucket finishes."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "event_type", "ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="stable")
        return df[df.groupby("user_id", sort=False).cumcount(
            ascending=False) == 0]

    def latest_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        out = g[g.groupby("user_id", sort=False).cumcount(
            ascending=False) == 0]
        return out[["user_id", "event_id", "event_type"]]

    return (
        _bucketed(
            ds.map_batches(partial, batch_format="pandas", batch_size=65536),
            ["user_id"],
        )
        .groupby("bucket")
        .map_groups(latest_bucket, batch_format="pandas")
    )


def q_union(sf_dir: str):
    """SQL UNION (distinct) via ``Dataset.union`` + the bucketed exact
    dedup: the tagged nation/region name projections concatenate block-wise
    (no shuffle) and distinct-ness costs one hash-bucketed exchange."""
    a = _read(sf_dir, "nation", ["n_name"]).map_batches(
        lambda t: pa.table({"name": t["n_name"]}), batch_format="pyarrow")
    b = _read(sf_dir, "region", ["r_name"]).map_batches(
        lambda t: pa.table({"name": t["r_name"]}), batch_format="pyarrow")
    return dedup_exact(a.union(b), ["name"])


def q_group_concat(sf_dir: str):
    """GROUP_CONCAT / string_agg: each user's distinct event types, sorted
    and comma-joined. Per-batch pair-dedup combiner caps the shuffle at
    (users × types) rows per batch; ONE vectorized join per user-bucket.
    Mergeable because set-union is: batch-level distinct pairs union to the
    global distinct set before any string is built."""
    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["user_id", "event_type"]).aggregate([])
        return g

    def concat_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["user_id", "event_type"])
        g = g.sort_values(["user_id", "event_type"], kind="stable")
        out = (
            g.groupby("user_id", sort=False)["event_type"]
            .agg(",".join).reset_index(name="types")
        )
        return out

    return (
        _bucketed(
            ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=65536),
            ["user_id"],
        )
        .groupby("bucket")
        .map_groups(concat_bucket, batch_format="pandas")
    )


def q_validate(sf_dir: str):
    """Data-validation operator (the pre-run sanity gate a training-data
    pipeline needs): integer violation counts per rule over orders —
    null keys, non-positive prices, and referential orphans (o_custkey
    with no customer row; broadcast key set + vectorized is_in, the
    semi-join shape). Per-batch Arrow combiner emits one 4-column partial
    row; the final sum is constant-size at any input scale."""
    ckeys = pc.unique(
        pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                      columns=["c_custkey"])["c_custkey"].combine_chunks()
    )
    ref = ray.put(ckeys)
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])

    class Validate:
        def __init__(self):
            self.keys = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ks = pc.cast(self.keys, t["o_custkey"].type)
            null_key = pc.is_null(t["o_custkey"])
            orphan = pc.and_(pc.invert(null_key),
                             pc.invert(pc.is_in(t["o_custkey"],
                                                value_set=ks)))
            bad_price = pc.less_equal(pc.fill_null(t["o_totalprice"], 0.0),
                                      0.0)
            return pa.table(
                {
                    "p_rows": pa.array([t.num_rows], pa.int64()),
                    "p_null_key": pa.array(
                        [pc.sum(null_key).as_py() or 0], pa.int64()),
                    "p_orphan": pa.array(
                        [pc.sum(orphan).as_py() or 0], pa.int64()),
                    "p_bad_price": pa.array(
                        [pc.sum(bad_price).as_py() or 0], pa.int64()),
                }
            )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "n_rows": [int(df["p_rows"].sum())],
                "n_null_key": [int(df["p_null_key"].sum())],
                "n_orphans": [int(df["p_orphan"].sum())],
                "n_bad_price": [int(df["p_bad_price"].sum())],
            }
        )

    return (
        ds.map_batches(Validate, batch_format="pyarrow", batch_size=65536,
                       concurrency=(1, 2))
        .repartition(1)
        .map_batches(final, batch_format="pandas", batch_size=None)
    )


def q_multi_join(sf_dir: str):
    """Chained mixed-strategy join (TPC-H Q5 shape): revenue per nation =
    orders ⋈ customer ⋈ nation. Strategy per edge chosen by side size —
    nation (25 rows) broadcasts into the customer scan as a vectorized
    pandas .map; the orders⋈customer edge is a genuine two-large-sides
    Ray hash join; a partial+final aggregate finishes. The planner rule a
    user applies at 100 TB: broadcast every dimension-sized side, shuffle
    only fact⋈fact edges."""
    nat = pq.read_table(os.path.join(sf_dir, "nation.parquet"),
                        columns=["n_nationkey", "n_name"])
    nref = ray.put(dict(zip(nat["n_nationkey"].to_pylist(),
                            nat["n_name"].to_pylist())))
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])

    class AddNation:
        def __init__(self):
            d = ray.get(nref)
            self.keys = pa.array(list(d.keys()))
            self.names = pa.array(list(d.values()), pa.string())

        def __call__(self, t: pa.Table) -> pa.Table:
            # Arrow-native broadcast lookup (a pandas .map here would hand
            # the join metadata-bearing pandas-block schemas — the
            # unhashable-schema warning — and cost a format round-trip)
            idx = pc.index_in(t["c_nationkey"],
                              value_set=pc.cast(self.keys,
                                                t["c_nationkey"].type))
            return pa.table({"c_custkey": t["c_custkey"],
                             "n_name": pc.take(self.names, idx)})

    cust_n = cust.map_batches(AddNation, batch_format="pyarrow",
                              concurrency=(1, 2))
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    joined = orders.join(cust_n, join_type="inner",
                         num_partitions=_join_partitions(),
                         on=("o_custkey",), right_on=("c_custkey",))

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by("n_name").aggregate(
            [("o_totalprice", "sum"), ([], "count_all")]
        )
        return g.rename_columns(["n_name", "p_rev", "p_cnt"])

    out = (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("n_name")
        .aggregate(Sum("p_rev", alias_name="revenue"),
                   Sum("p_cnt", alias_name="n_orders"))
    )
    return out.map_batches(_round_cols({"revenue": 2}),
                           batch_format="pyarrow")


def q_multimodal_meta(sf_dir: str):
    """Multimodal-column plumbing under the driver gate with an EXACT
    oracle: documents.text becomes an opaque ``binary`` payload column
    (the functions/multimodal.py MEDIA_SCHEMA idiom — UTF-8 bytes here;
    images/audio are the same shape with undecodable bytes), then an
    actor-pool metadata stage extracts integer stats per payload: byte
    length and a 32-bit md5 prefix. Both are functions of the raw BYTES,
    so DuckDB mirrors them exactly (octet_length(encode(text)), md5) for
    ANY text; small batch_size because binary rows are wide — the same
    sizing rule the real image/audio decoders document."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def to_payload(t: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": t["doc_id"],
             "payload": pc.cast(pc.fill_null(t["text"], ""), pa.binary())}
        )

    class MetaExtract:
        """Per-actor state (the hasher constructor) initialized once, like
        the model-loading decoders; __call__ handles one Arrow batch."""

        def __init__(self):
            self.md5 = hashlib.md5

        def __call__(self, t: pa.Table) -> pa.Table:
            pays = t["payload"].to_pylist()
            h32 = [int(self.md5(p).hexdigest()[:8], 16) for p in pays]
            return pa.table(
                {
                    "doc_id": t["doc_id"],
                    "n_bytes": pc.cast(pc.binary_length(t["payload"]),
                                       pa.int64()),
                    "h32": pa.array(h32, pa.int64()),
                }
            )

    return (
        ds.map_batches(to_payload, batch_format="pyarrow", batch_size=4096)
        .map_batches(MetaExtract, batch_format="pyarrow", batch_size=1024,
                     concurrency=(1, 2))
    )


def q_read_csv(sf_dir: str):
    """CSV ingestion (schema-on-read like T1/read_json, for the delimited
    flat-file sources a reference user would point at this engine):
    customer round-tripped once to CSV under /tmp, ingested with
    ray.data.read_csv, typed cast-back pushed to Arrow. Oracle reads the
    same columns from the parquet view — value-exact."""
    import hashlib as _hl

    src = os.path.join(sf_dir, "customer.parquet")
    st = os.stat(src)
    fp = f"{st.st_size}:{st.st_mtime_ns}"  # regenerate when the corpus does
    tag = _hl.md5(sf_dir.encode()).hexdigest()[:8]
    cdir = f"/tmp/vectrain_csv_{tag}"
    marker = os.path.join(cdir, "_DONE")
    cpath = os.path.join(cdir, "customer.csv")
    cols = ["c_custkey", "c_nationkey", "c_acctbal", "c_mktsegment"]
    if not (os.path.exists(marker) and os.path.exists(cpath)
            and open(marker).read() == fp):
        os.makedirs(cdir, exist_ok=True)
        t = pq.read_table(src, columns=cols)
        # atomic publish — same concurrent-reader rule as q_read_json
        tmp = f"{cpath}.{os.getpid()}.tmp"
        t.to_pandas().to_csv(tmp, index=False)
        os.replace(tmp, cpath)
        mtmp = f"{marker}.{os.getpid()}.tmp"
        open(mtmp, "w").write(fp)
        os.replace(mtmp, marker)
    ds = rd.read_csv(cpath)
    sch = pq.read_schema(src)

    def fn(t: pa.Table) -> pa.Table:
        return pa.table(
            {c: pc.cast(t[c], sch.field(c).type) for c in cols}
        )

    return ds.map_batches(fn, batch_format="pyarrow")


# Registry order matters operationally: the correctness driver certifies the
# FIRST 50 entries each round, so the newest / highest-risk ops lead and the
# long-stable basics trail (round-2 verdict item 5 — every op is
# driver-certified across rounds 2+3 combined).
PMI_MIN_CNT = 5  # rare-pair noise floor (standard PMI practice)


def q_pmi_bigrams(sf_dir: str):
    """Collocation mining: top-20 adjacent word bigrams by pointwise
    mutual information, pmi = ln((c_xy/P) / ((c_x/T)·(c_y/T))), over
    bigrams with count ≥ PMI_MIN_CNT.

    Scale path: bigram counts via the bigram_top combiner + ONE
    pair-bucketed sum (all pairs of a bigram land in one bucket); unigram
    counts via the wordcount combiner + one single-key groupby over the
    combiner-reduced vocab; candidates (≥ MIN_CNT collocations — sparse
    by construction) join the vocab twice with native hash joins; the
    final sort runs over candidates only. ln() is scalar math.log per
    candidate row — the same scalar libm as DuckDB's ln, so pmi doubles
    hash bit-identical (the candidate stage is the op's smallest table)."""
    import math

    ds = _tokenized_docs(sf_dir)  # shared tokenize-once intermediate

    def bigram_partial(t: pa.Table) -> pa.Table:
        words, parents = _doc_tokens_from_lists(t)  # empties pre-dropped
        d = pd.DataFrame({"w": words.to_pandas(), "p": parents.to_pandas()})
        d["nxt"] = d["w"].shift(-1)
        d["pn"] = d["p"].shift(-1)
        d = d[(d["p"] == d["pn"]) & d["nxt"].notna()]
        c = d.groupby(["w", "nxt"], sort=False).size().reset_index(name="p_cnt")
        return pa.table({"w1": pa.array(c["w"], pa.string()),
                         "w2": pa.array(c["nxt"], pa.string()),
                         "p_cnt": pa.array(c["p_cnt"], pa.int64())})

    def sum_bucket(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby(["w1", "w2"], sort=False)["p_cnt"].sum().reset_index(
            name="cnt")
        c["cnt"] = c["cnt"].astype("int64")
        return c

    bigrams = (_bucketed(
        ds.map_batches(bigram_partial, batch_format="pyarrow",
                       batch_size=65536), ["w1", "w2"])
        .groupby("bucket").map_groups(sum_bucket, batch_format="pandas")
    ).materialize()  # consumed twice: P total + candidate filter

    unigrams = _unigram_counts(sf_dir).map_batches(
        lambda t: t.rename_columns(["word", "c"]), batch_format="pyarrow")

    p_total = float(bigrams.sum("cnt") or 0)
    t_total = float(unigrams.sum("c") or 0)
    if p_total == 0 or t_total == 0:
        # registry contract: every op returns a ray.data.Dataset
        return rd.from_arrow(pa.table({"w1": pa.array([], pa.string()),
                                       "w2": pa.array([], pa.string()),
                                       "cnt": pa.array([], pa.int64()),
                                       "pmi": pa.array([], pa.float64())}))

    cands = bigrams.map_batches(
        lambda t: t.filter(pc.greater_equal(t["cnt"], PMI_MIN_CNT)),
        batch_format="pyarrow")  # vectorized: the bigram vocab is huge
    u1 = unigrams.map_batches(
        lambda t: t.rename_columns(["u1_word", "c1"]), batch_format="pyarrow")
    u2 = unigrams.map_batches(
        lambda t: t.rename_columns(["u2_word", "c2"]), batch_format="pyarrow")
    nparts = _join_partitions(per_cpu_divisor=8)
    joined = cands.join(u1, join_type="inner", num_partitions=nparts,
                        on=("w1",), right_on=("u1_word",))
    joined = joined.join(u2, join_type="inner", num_partitions=nparts,
                         on=("w2",), right_on=("u2_word",))

    def score(t: pa.Table) -> pa.Table:
        cnt = t["cnt"].to_pylist()
        c1 = t["c1"].to_pylist()
        c2 = t["c2"].to_pylist()
        pmi = [math.log((x / p_total) / ((a / t_total) * (b / t_total)))
               for x, a, b in zip(cnt, c1, c2)]
        return pa.table({"w1": t["w1"], "w2": t["w2"],
                         "cnt": pc.cast(t["cnt"], pa.int64()),
                         "pmi": pa.array(pmi, pa.float64())})

    return (joined.map_batches(score, batch_format="pyarrow")
            .sort(["pmi", "w1", "w2"], descending=[True, False, False])
            .limit(20))


def q_tfidf_top_terms(sf_dir: str):
    """Per-document top-3 TF-IDF terms (score = tf · ln(N/df)) — the
    keyword-extraction op of a training-data pipeline.

    Scale path: (doc, word, tf) pairs are combiner-built per batch (a doc
    never spans batches), then ONE word-bucketed exchange computes each
    word's global df AND scores its pairs inside the same bucket (all
    pairs for a word land together), then one doc-bucketed exchange takes
    the per-doc top-3 — two bounded shuffles over the pair table, nothing
    driver-side. ln() is evaluated per DISTINCT df via scalar math.log —
    the same scalar libm DuckDB's ln uses, so scores are bit-identical to
    the oracle (numpy's SIMD log can differ by 1 ulp; don't use it)."""
    import math

    from ..functions.dedup_exact import key_buckets

    ds = _tokenized_docs(sf_dir)  # shared tokenize-once intermediate

    def pairs(t: pa.Table) -> pa.Table:
        words, parents = _doc_tokens_from_lists(t)
        docs = pc.take(_as_array(t["doc_id"]), parents)
        pt = pa.table({"word": words, "doc_id": docs})
        g = pt.group_by(["word", "doc_id"]).aggregate([("doc_id", "count")])
        return g.rename_columns(["word", "doc_id", "tf"])

    # no materialize: the pair table has exactly ONE downstream consumer,
    # so the lazy plan executes once and streams (pinning it in the object
    # store would hold the op's largest intermediate for no benefit)
    pair_ds = ds.map_batches(pairs, batch_format="pyarrow",
                             batch_size=65536)
    n_docs = _read(sf_dir, "documents", ["doc_id"]).count()

    def score_bucket(g: pd.DataFrame) -> pd.DataFrame:
        df_per_word = g.groupby("word", sort=False)["doc_id"].nunique()
        df_vals = g["word"].map(df_per_word).to_numpy()
        logs = {int(d): math.log(n_docs / int(d)) for d in set(df_vals)}
        out = g[["doc_id", "word", "tf"]].copy()
        out["tfidf"] = out["tf"].to_numpy() * np.array(
            [logs[int(d)] for d in df_vals])
        return out.drop(columns=["tf"])

    def add_wbucket(t: pa.Table) -> pa.Table:
        b = key_buckets(t.to_pandas(), ["word"], 64)
        return t.append_column("b", pa.array(b, pa.int32()))

    scored = (pair_ds.map_batches(add_wbucket, batch_format="pyarrow")
              .groupby("b")
              .map_groups(score_bucket, batch_format="pandas"))

    def top3(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["doc_id", "tfidf", "word"],
                          ascending=[True, False, True], kind="stable")
        return g[g.groupby("doc_id", sort=False).cumcount() < 3]

    def add_dbucket(t: pa.Table) -> pa.Table:
        b = key_buckets(t.to_pandas(), ["doc_id"], 64)
        return t.append_column("b2", pa.array(b, pa.int32()))

    return (scored.map_batches(add_dbucket, batch_format="pyarrow")
            .groupby("b2")
            .map_groups(top3, batch_format="pandas")
            .drop_columns(["b2"]))


def q_dedup_keep_best(sf_dir: str):
    """Near-dup cluster dedup that keeps the BEST document per cluster
    (max n_chars, doc_id tie-break) instead of an arbitrary keeper — the
    composition a real corpus-dedup pipeline runs: MinHash clustering ×
    quality signal → one survivor per cluster.

    Scale path: reuses the fully distributed dedup_minhash clustering,
    joins the narrow (doc_id, n_chars) quality side with a native hash
    join, and picks winners inside ONE cluster-bucketed exchange."""
    from ..functions.dedup_exact import key_buckets

    clustered = _minhash_clusters(sf_dir)  # doc_id, cluster_id, ...
    meta = _read(sf_dir, "documents", ["doc_id", "n_chars"])
    joined = clustered.select_columns(["doc_id", "cluster_id"]).join(
        meta.map_batches(lambda t: t.rename_columns(["m_doc_id", "n_chars"]),
                         batch_format="pyarrow"),
        join_type="inner", num_partitions=_join_partitions(per_cpu_divisor=8),
        on=("doc_id",), right_on=("m_doc_id",),
    )  # the native join drops the right-side key column

    def add_bucket(t: pa.Table) -> pa.Table:
        b = key_buckets(t.to_pandas(), ["cluster_id"], 64)
        return t.append_column("b", pa.array(b, pa.int32()))

    def best(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cluster_id", "n_chars", "doc_id"],
                          ascending=[True, False, True], kind="stable")
        w = g[g.groupby("cluster_id", sort=False).cumcount() == 0]
        return w[["doc_id", "cluster_id"]]

    return (joined.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("b").map_groups(best, batch_format="pandas"))


def q_dedup_cluster_stats(sf_dir: str):
    """Dedup reporting: the cluster-size histogram every corpus-dedup run
    publishes — (cluster_size, n_clusters, n_docs) over the MinHash
    clustering, where n_docs = cluster_size · n_clusters is the corpus
    mass held in clusters of that size (size 1 = unique docs; the sum of
    n_docs over sizes ≥ 2 minus n_clusters is the removable-duplicate
    count).

    Scale path: reuses the shared distributed clustering artifact, then
    two two-level count reductions — per-batch Arrow group_by partials
    feeding cluster_id- then size-keyed groupbys — so both exchanges move
    distinct-key partial counts, never per-doc rows, and the output is
    at most #distinct-sizes rows."""
    clusters = _minhash_clusters(sf_dir)

    def size_partial(t: pa.Table) -> pa.Table:
        g = t.select(["cluster_id"]).group_by("cluster_id").aggregate(
            [([], "count_all")])
        return g.rename_columns(["cluster_id", "p_cnt"])

    sizes = (clusters.map_batches(size_partial, batch_format="pyarrow")
             .groupby("cluster_id")
             .aggregate(Sum("p_cnt", alias_name="cluster_size")))

    def hist_partial(t: pa.Table) -> pa.Table:
        g = t.select(["cluster_size"]).group_by("cluster_size").aggregate(
            [([], "count_all")])
        return g.rename_columns(["cluster_size", "p_n"])

    def finish(t: pa.Table) -> pa.Table:
        n = pc.cast(t["n_clusters"], pa.int64())
        cs = pc.cast(t["cluster_size"], pa.int64())
        return pa.table({"cluster_size": cs, "n_clusters": n,
                         "n_docs": pc.multiply_checked(cs, n)})

    return (sizes.map_batches(hist_partial, batch_format="pyarrow")
            .groupby("cluster_size")
            .aggregate(Sum("p_n", alias_name="n_clusters"))
            .map_batches(finish, batch_format="pyarrow"))


def q_train_test_split(sf_dir: str):
    """Deterministic hash train/test split (90/10) with per-split,
    per-language audit counts — the lineage-stable split a training
    pipeline needs (re-runs and re-partitionings assign every doc to the
    SAME side; no random state). Split mask = md5-lower-64(doc_id) % 10,
    the same engine-neutral primitive as sample_hash; the audit aggregate
    is combiner-first (per-batch pandas partials, one tiny groupby)."""
    ds = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])

    class SplitCounter:
        def __init__(self):
            import duckdb

            self.con = duckdb.connect()

        def __call__(self, t: pa.Table) -> pa.Table:
            self.con.register("b", t)
            return self.con.execute(
                "select case when md5_number_lower(cast(doc_id as varchar))"
                " % 10 = 0 then 'test' else 'train' end as split, lang,"
                " count(*) as p_docs, cast(sum(n_chars) as bigint) as p_chars"
                " from b group by 1, 2"
            ).arrow()

    parts = ds.map_batches(SplitCounter, batch_format="pyarrow",
                           batch_size=65536, concurrency=(1, 2))
    return (parts.groupby(["split", "lang"])
            .aggregate(Sum("p_docs", alias_name="n_docs"),
                       Sum("p_chars", alias_name="sum_chars")))


CHUNK_SIZE, CHUNK_STEP = 64, 48  # 16-token overlap


def q_chunk_tokens(sf_dir: str):
    """Token-budget document chunking with overlap — the pre-training
    chunker: each document becomes ceil(dl/STEP)-ish rows of ≤CHUNK_SIZE
    tokens, consecutive chunks overlapping by CHUNK_SIZE-CHUNK_STEP.

    Fully vectorized: Arrow tokenization, list rebuild (empty tokens
    filtered inside the list to match the SQL list_filter), then one
    pc.list_slice + binary_join per chunk ordinal — the loop is over the
    max chunks-per-doc in the batch (small constant), never over rows.
    Stateless per batch, so it streams at any scale."""
    ds = _tokenized_docs(sf_dir)  # shared tokenize-once intermediate

    def from_cache(t: pa.Table) -> pa.Table:
        toks = _as_array(t["toks"])
        dl = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        return _chunk_token_lists(_as_array(t["doc_id"]), toks,
                                  dl.astype(np.int64))

    return ds.map_batches(from_cache, batch_format="pyarrow",
                          batch_size=65536)


def _chunk_tokens_batch(t: pa.Table) -> pa.Table:
    """q_chunk_tokens' pure per-batch kernel over RAW (doc_id, text) rows
    (module-level so the property tests can drive it without a Ray
    session; the query itself feeds _chunk_token_lists from the cached
    tokenized corpus)."""
    # rebuild lists with empty tokens dropped INSIDE each list (the
    # SQL list_filter equivalent; split of "" yields [""])
    _, words, keep, parents = _doc_tokens(t)
    keep = keep.to_numpy(zero_copy_only=False)
    parents = parents.to_numpy(zero_copy_only=False)
    n = t.num_rows
    dl = np.bincount(parents[keep], minlength=n)
    offsets = np.zeros(n + 1, np.int64)
    np.cumsum(dl, out=offsets[1:])
    if offsets[-1] >= 2**31:  # int32 ListArray offset ceiling
        raise ValueError(
            f"batch holds {offsets[-1]} tokens (> int32 offsets); "
            "lower batch_size for this corpus")
    toks = pa.ListArray.from_arrays(
        pa.array(offsets.astype(np.int32), pa.int32()),
        words.filter(pa.array(keep)))
    return _chunk_token_lists(t["doc_id"].combine_chunks(), toks, dl)


def _chunk_token_lists(doc_ids, toks, dl: np.ndarray) -> pa.Table:
    """Chunking core over pre-built per-doc token LISTS (int32 or large
    list — pc.list_slice and binary_join accept both)."""
    n = len(doc_ids)
    out_id, out_k, out_text, out_n = [], [], [], []
    max_k = int(max(1, -(-dl.max() // CHUNK_STEP))) if n else 0
    for k in range(max_k):
        mask = pa.array(dl > k * CHUNK_STEP) if k else pa.array(
            np.ones(n, bool))
        sub = toks.filter(mask)
        sl = pc.list_slice(sub, start=k * CHUNK_STEP,
                           stop=k * CHUNK_STEP + CHUNK_SIZE)
        out_id.append(doc_ids.filter(mask))
        out_k.append(pa.array(np.full(len(sub), k, np.int32)))
        out_text.append(pc.binary_join(sl, " "))
        out_n.append(pc.cast(pc.list_value_length(sl), pa.int64()))
    if not out_id:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "chunk_idx": pa.array([], pa.int32()),
                         "chunk_text": pa.array([], pa.string()),
                         "n_tokens": pa.array([], pa.int64())})
    concat = pa.concat_arrays
    return pa.table({
        "doc_id": concat([a.combine_chunks() if isinstance(
            a, pa.ChunkedArray) else a for a in out_id]),
        "chunk_idx": concat(out_k),
        "chunk_text": concat([a.combine_chunks() if isinstance(
            a, pa.ChunkedArray) else a for a in out_text]),
        "n_tokens": concat([a.combine_chunks() if isinstance(
            a, pa.ChunkedArray) else a for a in out_n]),
    })


BM25_TERMS = ("vector", "join", "stream")  # fixed OR-query, seed-free


def q_bm25_topk(sf_dir: str):
    """BM25 ranked retrieval (k1=1.2, b=0.75) for a fixed 3-term OR query
    over the documents table — the ranked-retrieval op a training-data
    pipeline uses for targeted corpus slicing (pairs with inverted_index,
    which builds the index this would serve from).

    Scale path: two streaming passes over a NARROW per-doc stats table.
    Pass 1 computes (dl, tf per term) vectorized — Arrow C++ tokenization,
    np.bincount over list-parent indices — plus a one-row-per-batch global
    reduce (N, Σdl, df). Pass 2 scores with broadcast scalar constants and
    keeps a per-batch top-k partial, so no global sort and nothing
    corpus-sized ever materializes.

    Float parity with the DuckDB oracle: both sides evaluate the exact
    same expression tree in the same literal term order over the same
    integer inputs — IEEE-754 doubles are deterministic, so the hashes
    match bit-for-bit."""
    import math

    ds = _tokenized_docs(sf_dir)  # shared tokenize-once intermediate
    terms = BM25_TERMS

    def stats(t: pa.Table) -> pa.Table:
        words, parents = _doc_tokens_from_lists(t)
        parents = parents.to_numpy(zero_copy_only=False)
        n = t.num_rows
        dl = pc.cast(pc.list_value_length(_as_array(t["toks"])), pa.int64())
        cols = {"doc_id": t["doc_id"], "dl": dl}
        for i, term in enumerate(terms):
            m = pc.equal(words, term).to_numpy(zero_copy_only=False)
            cols[f"tf{i}"] = pa.array(np.bincount(parents[m], minlength=n),
                                      pa.int64())
        return pa.table(cols)

    stats_ds = ds.map_batches(stats, batch_format="pyarrow",
                              batch_size=65536).materialize()

    def totals(t: pa.Table) -> pa.Table:
        row = {"n": [t.num_rows], "sum_dl": [pc.sum(t["dl"]).as_py() or 0]}
        for i in range(len(terms)):
            row[f"df{i}"] = [pc.sum(pc.cast(pc.greater(t[f"tf{i}"], 0),
                                            pa.int64())).as_py() or 0]
        return pa.table(row)

    parts = stats_ds.map_batches(totals, batch_format="pyarrow").to_pandas()
    n_docs = float(parts["n"].sum())
    if n_docs == 0:  # Dataset, not pa.Table — run.py materialize()s results
        return rd.from_arrow(pa.table({"doc_id": pa.array([], pa.int64()),
                                       "score": pa.array([], pa.float64())}))
    avgdl = float(parts["sum_dl"].sum()) / n_docs
    idf = [math.log((n_docs - float(parts[f"df{i}"].sum()) + 0.5)
                    / (float(parts[f"df{i}"].sum()) + 0.5) + 1.0)
           for i in range(len(terms))]

    def score_topk(t: pa.Table) -> pa.Table:
        dl = t["dl"].to_numpy().astype(np.float64)
        tf_i = [t[f"tf{i}"].to_numpy() for i in range(len(terms))]
        score = np.zeros(t.num_rows, np.float64)
        for i in range(len(terms)):
            tf = tf_i[i].astype(np.float64)
            # same literal tree as the SQL:
            # idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl)))
            score = score + (idf[i] * (tf * 2.2)
                             / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl))))
        matched = sum(tf_i) > 0
        doc_id = t["doc_id"].to_numpy()[matched]
        score = score[matched]
        top = np.lexsort((doc_id, -score))[:10]  # per-batch top-k partial
        return pa.table({"doc_id": pa.array(doc_id[top]),
                         "score": pa.array(score[top], pa.float64())})

    return stats_ds.map_batches(
        score_topk, batch_format="pyarrow", batch_size=65536,
    ).sort(["score", "doc_id"], descending=[True, False]).limit(10)


# --- round-4 additions: packing / semantic dedup / knn join / span dedup /
# --- skew join --------------------------------------------------------------
PACK_BUDGET = 256  # tokens per packed training sequence
PACK_BUCKETS = 64  # order-preserving doc_id range buckets for the prefix sum


def q_pack_sequences(sf_dir: str):
    """Token-budget sequence packing (the training-data batching step): docs
    in doc_id order are packed into fixed PACK_BUDGET-token sequences, a
    doc's seq_id = floor(tokens_before_it / budget) — the fixed-boundary
    packing rule, mirrored exactly by a SQL window cumsum.

    Scale path — a distributed PREFIX SUM, not a global sort: doc_id ranges
    bucket ORDER-PRESERVINGLY (every id in bucket k precedes every id in
    bucket k+1), per-bucket token totals are combiner-reduced to ≤
    PACK_BUCKETS rows which the driver prefix-sums, and each bucket then
    resolves its docs with one vectorized in-bucket cumsum + the bucket's
    offset. One narrow (doc_id, n_tokens) exchange; the text column never
    shuffles."""
    ds = _tokenized_docs(sf_dir)  # shared tokenize-once intermediate

    def tok_counts(t: pa.Table) -> pa.Table:
        n = pc.cast(pc.list_value_length(_as_array(t["toks"])), pa.int64())
        return pa.table({"doc_id": t["doc_id"], "n_tokens": n})

    narrow = ds.map_batches(tok_counts, batch_format="pyarrow",
                            batch_size=65536).materialize()
    max_id = narrow.max("doc_id")
    if max_id is None:
        return rd.from_arrow(pa.table({
            "doc_id": pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64()),
            "seq_id": pa.array([], pa.int64())}))
    span = max(1, (int(max_id) + PACK_BUCKETS) // PACK_BUCKETS)

    def add_bucket(t: pa.Table) -> pa.Table:
        b = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False)) // span
        return t.append_column("bucket", pa.array(b.astype("int32")))

    bucketed = narrow.map_batches(add_bucket, batch_format="pyarrow")

    def bucket_partial(t: pa.Table) -> pa.Table:  # combiner: ≤64 rows/batch
        g = t.group_by("bucket").aggregate([("n_tokens", "sum")])
        return g.rename_columns(["bucket", "p_tokens"])

    totals = (bucketed.map_batches(bucket_partial, batch_format="pyarrow")
              .groupby("bucket").aggregate(Sum("p_tokens", alias_name="tok"))
              .take_all())  # ≤ PACK_BUCKETS rows on the driver
    totals.sort(key=lambda r: r["bucket"])
    offsets, acc = {}, 0
    for r in totals:
        offsets[int(r["bucket"])] = acc
        acc += int(r["tok"])

    def pack_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id", kind="stable")
        n = g["n_tokens"].to_numpy()
        before = offsets[int(g["bucket"].iloc[0])] + np.cumsum(n) - n
        return pd.DataFrame({"doc_id": g["doc_id"].to_numpy(),
                             "n_tokens": n.astype("int64"),
                             "seq_id": (before // PACK_BUDGET).astype(
                                 "int64")})

    return bucketed.groupby("bucket").map_groups(pack_bucket,
                                                 batch_format="pandas")


SEMDEDUP_T = 0.35  # exercises the drop path on this synthetic corpus; real
# text-embedding corpora run ~0.95+ (Abbas et al. 2023, SemDeDup)


def q_semantic_dedup(sf_dir: str):
    """SemDeDup-style semantic deduplication (Abbas et al. 2023): assign
    every embedding to its nearest deterministic centroid (exactly
    kmeans_assign's E-step, shared _centroid_matrix), then WITHIN each
    cluster drop any vector whose cosine to a smaller-vec_id cluster member
    reaches SEMDEDUP_T — greedy keep-first-by-id, which is the SQL NOT
    EXISTS mirror. Returns the kept (vec_id, cluster).

    Scale path: the in-cluster prune is one cluster-bucketed exchange and
    one vectorized Gram matmul per cluster — never an all-pairs join across
    clusters. In-cluster cost is O(|cluster|²): at corpus scale K grows
    with N (SemDeDup uses N/avg_cluster_size clusters) so cluster size — and
    the Gram matrix — stays bounded; K is a constant here only because the
    oracle must enumerate the centroids."""
    from ..functions.similarity import _to_matrix

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"]).materialize()
    dim = _embedding_dim(sf_dir)
    C, c_zero = _centroid_matrix(ds, dim=dim)
    if C.shape[0] == 0:
        return rd.from_arrow(pa.table({
            "vec_id": pa.array([], pa.int64()),
            "cluster": pa.array([], pa.int64())}))
    c_ref = ray.put((C, c_zero))

    class AssignKeepVec:
        def __init__(self):
            self.C, self.c_zero = ray.get(c_ref)  # once per actor

        def __call__(self, t: pa.Table) -> pa.Table:
            X = _to_matrix(t["embedding"], dim=self.C.shape[1])
            xnorm = np.linalg.norm(X, axis=1, keepdims=True)
            Xn = X / np.maximum(xnorm, 1e-30)
            sims = Xn @ self.C.T
            # DuckDB list_cosine_similarity zero-vector convention (= -1.0)
            # on both sides, same as q_kmeans_assign
            sims[:, self.c_zero] = -1.0
            sims[(xnorm <= 1e-30).reshape(-1), :] = -1.0
            cluster = np.argmax(sims, axis=1)  # first max = min j
            return pa.table({
                "vec_id": t["vec_id"],
                "cluster": pa.array(cluster, pa.int64()),
                "embedding": t["embedding"],
            })

    assigned = ds.map_batches(AssignKeepVec, batch_format="pyarrow",
                              batch_size=4096, concurrency=(1, 2))

    emb_dim = C.shape[1]

    def prune_cluster(g: pa.Table) -> pa.Table:
        order = pc.array_sort_indices(g["vec_id"])
        g = g.take(order)
        X = _to_matrix(g["embedding"], dim=emb_dim)  # vectorized, no
        # per-row Python (the _to_matrix kernel the assign stage uses)
        norm = np.linalg.norm(X, axis=1, keepdims=True)
        Xn = X / np.maximum(norm, 1e-30)
        S = Xn @ Xn.T
        zero = (norm <= 1e-30).reshape(-1)
        S[zero, :] = -1.0
        S[:, zero] = -1.0
        # drop row i iff ANY j < i (by vec_id, kept or not) has sim >= T —
        # the greedy-vs-all variant the SQL NOT EXISTS reproduces exactly
        keep = pa.array(~np.tril(S >= SEMDEDUP_T, -1).any(axis=1))
        return pa.table({
            "vec_id": _as_array(g["vec_id"]).filter(keep),
            "cluster": _as_array(g["cluster"]).filter(keep),
        })

    return assigned.groupby("cluster").map_groups(prune_cluster,
                                                  batch_format="pyarrow")


KNN_QUERY_MOD = 50  # vec_id % MOD == 0 defines the (bounded) query workload
KNN_K = 3
KNN_QUERY_CHUNK = 2048  # matmul slab width: worker temp = batch × chunk


def q_knn_join(sf_dir: str):
    """k-NN similarity join: for every query vector (vec_id % KNN_QUERY_MOD
    == 0) find its KNN_K most-cosine-similar OTHER vectors, ties broken by
    smaller vec_id.

    The corpus streams (never shuffled, never on the driver); the query
    side broadcasts once (ray.put of the normalized matrix) and each batch
    keeps a BATCH-LOCAL top-k per query, matmul'd in ≤KNN_QUERY_CHUNK
    column slabs so worker temp memory stays (batch × chunk) regardless of
    |Q|. HONEST SCALE LIMIT: this fixture's workload is vec_id % 50 — 2%
    of the corpus — so the driver-side query gather and the per-batch
    k·|Q| partial rows grow linearly with corpus size; a truly corpus-
    scale query side needs the IVF route (q_ann_index_topk) or a bucketed
    self-join, not this broadcast."""
    from ..functions.similarity import _to_matrix

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"]).materialize()

    def is_query(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % KNN_QUERY_MOD == 0))

    qrows = ds.map_batches(is_query, batch_format="pyarrow").take_all()
    if not qrows:
        return rd.from_arrow(pa.table({
            "q_id": pa.array([], pa.int64()),
            "n_id": pa.array([], pa.int64()),
            "score": pa.array([], pa.float64())}))
    qrows.sort(key=lambda r: r["vec_id"])
    q_ids = np.asarray([r["vec_id"] for r in qrows], dtype=np.int64)
    Q = np.asarray([r["embedding"] for r in qrows], dtype=np.float64)
    qnorm = np.linalg.norm(Q, axis=1, keepdims=True)
    q_zero = (qnorm <= 1e-30).reshape(-1)
    Qn = Q / np.maximum(qnorm, 1e-30)
    q_ref = ray.put((q_ids, Qn, q_zero))

    class PartialTopK:
        def __init__(self):
            self.q_ids, self.Qn, self.q_zero = ray.get(q_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            X = _to_matrix(t["embedding"], dim=self.Qn.shape[1])
            xnorm = np.linalg.norm(X, axis=1, keepdims=True)
            Xn = X / np.maximum(xnorm, 1e-30)
            x_zero = (xnorm <= 1e-30).reshape(-1)
            ids = t["vec_id"].to_numpy(zero_copy_only=False)
            out_q, out_n, out_s = [], [], []
            for c0 in range(0, len(self.q_ids), KNN_QUERY_CHUNK):
                c1 = min(c0 + KNN_QUERY_CHUNK, len(self.q_ids))
                sims = Xn @ self.Qn[c0:c1].T  # (B, ≤chunk) slab
                sims[x_zero, :] = -1.0
                sims[:, self.q_zero[c0:c1]] = -1.0
                for jj in range(c1 - c0):
                    j = c0 + jj
                    col = sims[:, jj].copy()
                    col[ids == self.q_ids[j]] = -np.inf  # self-exclusion
                    k = min(KNN_K, len(col))
                    # top-k by (sim desc, vec_id asc), batch-local partial
                    top = np.lexsort((ids, -col))[:k]
                    top = top[col[top] > -np.inf]
                    out_q.append(np.full(len(top), self.q_ids[j]))
                    out_n.append(ids[top])
                    out_s.append(col[top])
            return pa.table({
                "q_id": pa.array(np.concatenate(out_q) if out_q else [],
                                 pa.int64()),
                "n_id": pa.array(np.concatenate(out_n) if out_n else [],
                                 pa.int64()),
                "sim": pa.array(np.concatenate(out_s) if out_s else [],
                                pa.float64()),
            })

    partials = ds.map_batches(PartialTopK, batch_format="pyarrow",
                              batch_size=4096, concurrency=(1, 2))

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", "n_id"], ascending=[False, True],
                          kind="stable").head(KNN_K)
        # _round_half_away, NOT np.round: DuckDB round() is half away from
        # zero, numpy is half-to-even — they differ on exactly-representable
        # 4-decimal midpoints (np.round(0.40625, 4)=0.4062, DuckDB=0.4063)
        score = _round_half_away(
            pa.array(g["sim"].to_numpy(), pa.float64()), 4)
        return pd.DataFrame({"q_id": g["q_id"].to_numpy(),
                             "n_id": g["n_id"].to_numpy(),
                             "score": score.to_numpy(zero_copy_only=False)})

    return partials.groupby("q_id").map_groups(final_topk,
                                               batch_format="pandas")


NGRAM_SPAN = 5  # duplicated-substring span width, in tokens


def q_dup_ngram_spans(sf_dir: str):
    """Cross-document duplicated token spans (the substring-dedup signal of
    Lee et al. 2022, "Deduplicating Training Data Makes Language Models
    Better"): every 5-token window shared by ≥ 2 documents, with its
    document count and total occurrence count.

    Scale path: spans are built VECTORIZED per batch (group-wise pandas
    shift over the exploded token column — never a per-row Python loop),
    combiner-reduced per (span, doc) inside the batch, then ONE
    span-bucketed exchange computes distinct-doc and occurrence counts
    together."""
    ds = _tokenized_docs(sf_dir)  # shared tokenize-once intermediate

    def spans(t: pa.Table) -> pd.DataFrame:
        words, parents = _doc_tokens_from_lists(t)
        docs = pc.take(_as_array(t["doc_id"]), parents)
        df = pd.DataFrame({"doc_id": docs.to_pandas(),
                           "tok": words.to_pandas()})
        if not len(df):
            return pd.DataFrame({"ngram": pd.Series([], dtype=str),
                                 "doc_id": pd.Series([], dtype="int64"),
                                 "p_cnt": pd.Series([], dtype="int64")})
        g = df.groupby("doc_id", sort=False)["tok"]
        parts = [df["tok"]]
        for s in range(1, NGRAM_SPAN):
            parts.append(g.shift(-s))  # group-wise → never crosses docs
        full = parts[-1].notna()  # trailing NaNs are contiguous per doc
        ngram = parts[0]
        for p in parts[1:]:
            ngram = ngram + " " + p
        out = pd.DataFrame({"ngram": ngram[full], "doc_id": df["doc_id"][full]})
        # batch-local combiner: one row per (span, doc) with its count
        return (out.groupby(["ngram", "doc_id"], sort=False).size()
                .reset_index(name="p_cnt"))

    partials = ds.map_batches(spans, batch_format="pyarrow",
                              batch_size=65536)

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        per_doc = g.groupby(["ngram", "doc_id"], sort=False)["p_cnt"].sum()
        agg = per_doc.reset_index().groupby("ngram", sort=False).agg(
            n_docs=("doc_id", "nunique"), n_occ=("p_cnt", "sum"))
        agg = agg[agg["n_docs"] >= 2].reset_index()
        return pd.DataFrame({"ngram": agg["ngram"],
                             "n_docs": agg["n_docs"].astype("int64"),
                             "n_occ": agg["n_occ"].astype("int64")})

    return (_bucketed(partials, ["ngram"])
            .groupby("bucket")
            .map_groups(merge_bucket, batch_format="pandas"))


SKEW_HOT_MIN = 8  # fact-side keys at least this frequent are "hot"
# dim sides at most this big take the broadcast map-side plan (no shuffle
# → skew moot); the same 2M-row bar as kg.BROADCAST_MAX_ENTITIES /
# ASOF_BROADCAST_MAX_ROWS
SKEW_DIM_BROADCAST_MAX = 2_000_000


def q_skew_join(sf_dir: str, _force_split: bool = False):
    """Skew-aware fact⋈dim join (lineitem ⋈ orders), auto-gated by the
    plan skew actually threatens. Skew hurts exactly one thing — the
    reducer that receives a hot key's partition — so the decision tree is:

    - dim ≤ SKEW_DIM_BROADCAST_MAX rows → broadcast map-side join (ray.put
      once, merge per batch): there IS no shuffle, so no reducer to
      overload, and the whole skew question dissolves. This is also the
      fastest plan outright (one fact scan, zero exchanges).
    - dim too big to broadcast → hot keys are detected with a zero-shuffle
      batch-local frequency count, their dim rows (one per key — always
      broadcastable even when dim isn't) joined map-side, while the cold
      majority takes the normal hash-partitioned join. Salting S ways is
      the fallback when even the hot dim slice is too big.

    Both paths share the plain-join oracle (the split must be semantics-
    free); the driver certifies the split via skew_join_split, which
    forces the gate — the same two-path certification as asof_join /
    asof_join_bucketed."""
    out_cols = ["l_orderkey", "l_linenumber", "l_extendedprice",
                "o_totalprice", "o_orderpriority"]
    fact = _read(sf_dir, "lineitem",
                 ["l_orderkey", "l_linenumber", "l_extendedprice"])
    n_dim = pq.read_metadata(
        os.path.join(sf_dir, "orders.parquet")).num_rows
    if n_dim <= SKEW_DIM_BROADCAST_MAX and not _force_split:
        dim_df = pq.read_table(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_orderkey", "o_totalprice", "o_orderpriority"],
        ).to_pandas()
        dim_ref = ray.put(dim_df)

        def bcast_join(df: pd.DataFrame) -> pd.DataFrame:
            m = df.merge(ray.get(dim_ref), left_on="l_orderkey",
                         right_on="o_orderkey")
            return m[out_cols]

        return fact.map_batches(bcast_join, batch_format="pandas")

    dim = _read(sf_dir, "orders",
                ["o_orderkey", "o_totalprice", "o_orderpriority"])

    # Hot-key detection is BATCH-LOCAL and zero-shuffle: a key is hot when
    # any single batch holds >= SKEW_HOT_MIN of its rows. This catches
    # storage-contiguous skew exactly — the pathological shape, since a
    # hot entity's rows are co-located by the upstream partitioning — and
    # is a ROUTING decision only: a missed (diffusely spread) hot key just
    # takes the ordinary hash-join path, so the output is identical either
    # way (the plain-join oracle checks exactly that). The exact global
    # count would itself be the all-to-all this op exists to avoid
    # (measured: 6.3 s groupby vs 0.3 s batch-local at sf0.1/32 CPUs).
    def hot_partial(t: pa.Table) -> pa.Table:
        g = t.group_by("l_orderkey").aggregate([([], "count_all")])
        g = g.rename_columns(["l_orderkey", "cnt"])
        return g.filter(pc.greater_equal(g["cnt"], SKEW_HOT_MIN))

    hot_rows = fact.map_batches(hot_partial, batch_format="pyarrow",
                                batch_size=65536).take_all()
    hot_keys = pa.array(sorted({r["l_orderkey"] for r in hot_rows}),
                        pa.int64())

    if len(hot_keys) == 0:
        # no skew detected → the split buys nothing; running both branches
        # anyway cost a second full fact scan + an empty broadcast join +
        # a union (r4 verdict item 3: 4.4 s vs the 2.5 s plain join). The
        # detection partial itself is zero-shuffle and ~0.3 s.
        return fact.join(
            dim, join_type="inner", num_partitions=_join_partitions(),
            on=("l_orderkey",), right_on=("o_orderkey",)
        ).select_columns(out_cols)

    # plain TASK-based map_batches throughout this op (no actor pools):
    # the DAG already schedules the join's aggregator actors, and stacking
    # three pinned pools next to them starves the feeding tasks on small
    # clusters (observed deadlock at num_cpus=4). ray.get of the broadcast
    # refs inside a task is a local object-store read — the hot set still
    # ships once per node, not per batch.
    keys_ref = ray.put(hot_keys)

    def split(keep_hot: bool):
        def fn(t: pa.Table) -> pa.Table:
            keys = ray.get(keys_ref)
            m = pc.is_in(t["l_orderkey"], value_set=keys)
            return t.filter(m if keep_hot else pc.invert(m))

        return fact.map_batches(fn, batch_format="pyarrow")

    # cold path: normal hash join (no hot key reaches a reducer)
    cold = split(False).join(
        dim, join_type="inner", num_partitions=_join_partitions(),
        on=("l_orderkey",), right_on=("o_orderkey",)
    ).select_columns(out_cols)

    # hot path: broadcast the hot dim slice, join map-side
    hot_dim_rows = dim.map_batches(
        lambda t: t.filter(pc.is_in(t["o_orderkey"], value_set=hot_keys)),
        batch_format="pyarrow").take_all()  # |hot keys| rows, tiny
    hot_dim = pd.DataFrame(hot_dim_rows) if hot_dim_rows else pd.DataFrame(
        {"o_orderkey": pd.Series([], dtype="int64"),
         "o_totalprice": pd.Series([], dtype="float64"),
         "o_orderpriority": pd.Series([], dtype=str)})
    dim_ref = ray.put(hot_dim)

    def map_join(df: pd.DataFrame) -> pd.DataFrame:
        m = df.merge(ray.get(dim_ref), left_on="l_orderkey",
                     right_on="o_orderkey")
        return m[out_cols]

    hot = split(True).map_batches(map_join, batch_format="pandas")
    return cold.union(hot)


def q_window_dedup(sf_dir: str):
    """Windowed deduplication: the FIRST event per (user_id, event_type)
    in each 1-hour tumbling window — the streaming-dedup shape (drop
    repeats within a horizon, emit again next window) that complements
    event_throttle's sliding-gap rule.

    Scale path: one (user, type)-bucketed exchange, then a vectorized
    keep-first per bucket (sort + duplicated mask — one Python call per
    BUCKET, never per key or per window)."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "event_type", "ts"])

    _NULL_WIN = np.iinfo(np.int64).min  # sentinel: the SQL NULL partition

    def keep_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        us = g["ts"].to_numpy(dtype="datetime64[us]").astype("int64")
        nat = g["ts"].isna().to_numpy()
        us = np.where(nat, 0, us)  # NaT encodes as int64 min — negating it
        # below would overflow; the value is sentinel-overwritten anyway
        d = 3_600_000_000
        # DuckDB integer // TRUNCATES toward zero (-5 // 2 = -2); a floor
        # division would assign pre-epoch timestamps one window earlier
        # and silently break the oracle on pre-1970 data
        win = np.where(us >= 0, us // d, -((-us) // d))
        # NULL ts rows group into ONE window per key, like the SQL NULL
        # partition; their ordering falls to event_id (ts all NULL)
        win[nat] = _NULL_WIN
        g["win"] = win
        g["us_key"] = np.where(nat, _NULL_WIN, us)
        g = g.sort_values(
            ["user_id", "event_type", "win", "us_key", "event_id"],
            kind="stable")
        first = ~g.duplicated(["user_id", "event_type", "win"])
        out = g.loc[first, ["event_id", "user_id", "event_type"]].copy()
        w = g.loc[first, "win"].to_numpy()
        # mask BEFORE multiplying: w*3600 on the sentinel rows wraps int64
        # (INT64_MIN × 3600) — masked to NA below so the output was right,
        # but the overflow was computed (and warnable) on every NaT row
        out["window_start"] = pd.array(
            np.where(w == _NULL_WIN, 0, w) * 3600,
            dtype="Int64")  # nullable int64, NULL on the NaT window
        out.loc[w == _NULL_WIN, "window_start"] = pd.NA
        return out

    return (_bucketed(ds, ["user_id", "event_type"])
            .groupby("bucket")
            .map_groups(keep_bucket, batch_format="pandas"))


def q_grouped_stats(sf_dir: str):
    """Grouped descriptive statistics (count, sum, mean, population
    variance, population stddev) of lineitem quantity per return flag via
    the classic (n, sum, sumsq) combiner: each batch collapses to at most
    #groups partial rows INSIDE map_batches, the exchange moves only those
    partials, and the finisher derives mean/var/std from the merged sums
    with the SAME IEEE expression tree the oracle SQL spells out
    (mean = s/n, var = sq/n - mean*mean, std = sqrt(var)). l_quantity is
    integer-valued (1..50), so s and sq are order-independent-exact in
    float64 far past this fixture's scale — the bm25 float-parity argument;
    at 100 TB the shuffle fan-in is #flags × #blocks partial rows."""
    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])

    def partial(t: pa.Table) -> pa.Table:
        q = t["l_quantity"]
        g = pa.table({
            "l_returnflag": t["l_returnflag"],
            "q": q,
            "qq": pc.multiply(q, q),
        }).group_by("l_returnflag").aggregate(
            [("q", "count"), ("q", "sum"), ("qq", "sum")])
        return g.rename_columns(["l_returnflag", "n", "s", "sq"])

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=65536)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        m = df.groupby("l_returnflag", sort=False).agg(
            n=("n", "sum"), s=("s", "sum"), sq=("sq", "sum")).reset_index()
        n = m["n"].to_numpy().astype(np.float64)
        s = m["s"].to_numpy()
        sq = m["sq"].to_numpy()
        mean = s / n
        var = sq / n - mean * mean
        return pd.DataFrame({
            "l_returnflag": m["l_returnflag"],
            "n_rows": m["n"].astype("int64"),
            "sum_qty": s,
            "mean_qty": mean,
            "var_qty": var,
            "std_qty": np.sqrt(var),
        })

    return _bucketed(parts, ["l_returnflag"]).groupby("bucket").map_groups(
        finish, batch_format="pandas")


def q_kg_degree_hist(sf_dir: str):
    """Degree distribution of the constructed knowledge graph (the first
    health check on a KG build: a spike at degree 1 or a runaway hub shows
    up here immediately). Reuses the cached flagship KG run; the histogram
    is a per-batch count combiner over the nodes table + one tiny groupby
    — node count rows never exceed distinct degrees downstream."""
    res = _run_tpch_kg(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by("degree").aggregate([([], "count_all")])
        return g.rename_columns(["degree", "p_cnt"])

    return (res["nodes"].select_columns(["degree"])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("degree").aggregate(Sum("p_cnt", alias_name="n_nodes")))


def q_winsorize_by_group(sf_dir: str):
    """Per-group percentile winsorization — the outlier-clipping
    transform a feature pipeline applies before z-scoring: n_chars
    clipped to each source's [p5, p95]. Output (doc_id, source, n_chars,
    n_chars_w, clipped) with the clip flag as 0/1 BIGINT.

    Scale path: pass 1 is the length_quantiles value-count combiner —
    the corpus collapses to distinct (source, n_chars) pairs (domain-
    bounded), the CDF walk runs on ≤ that many rows driver-side and the
    per-source (lo, hi) thresholds broadcast via ray.put; pass 2 is ONE
    zero-shuffle streaming pass with a vectorized per-batch clip.
    Parity: thresholds use length_quantiles' pure-integer rank rule
    k_p = (n·p + 99)//100 and the clip is min/max over integers — no
    float anywhere, exact by construction."""
    # pin: the stats pass and the clip pass both consume this narrow read
    # — unmaterialized, each would re-run the whole scan
    ds = _read(sf_dir, "documents",
               ["doc_id", "source", "n_chars"]).materialize()

    def vc(t: pa.Table) -> pa.Table:
        g = pa.table({
            "source": t["source"],
            "n_chars": pc.cast(t["n_chars"], pa.int64()),
        }).group_by(["source", "n_chars"]).aggregate([([], "count_all")])
        return g.rename_columns(["source", "n_chars", "p_cnt"])

    counts = (ds.map_batches(vc, batch_format="pyarrow", batch_size=65536)
              .groupby(["source", "n_chars"])
              .aggregate(Sum("p_cnt", alias_name="c"))
              ).to_pandas()  # ≤ distinct (source, length) pairs
    if counts.empty:
        return rd.from_arrow(pa.table({
            "doc_id": pa.array([], pa.int64()),
            "source": pa.array([], pa.string()),
            "n_chars": pa.array([], pa.int64()),
            "n_chars_w": pa.array([], pa.int64()),
            "clipped": pa.array([], pa.int64())}))
    counts = counts.sort_values(["source", "n_chars"])
    counts["cum"] = counts.groupby("source", sort=False)["c"].cumsum()
    n = counts.groupby("source", sort=False)["c"].transform("sum")
    rows = []
    for p, col in ((5, "lo"), (95, "hi")):
        k = (n * p + 99) // 100
        hit = counts[counts["cum"] >= k].groupby("source", sort=False)[
            "n_chars"].min()
        rows.append(hit.rename(col))
    th = pd.concat(rows, axis=1).reset_index()
    th_ref = ray.put(th)

    class Clip:
        def __init__(self):
            self.th = ray.get(th_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            m = df.merge(self.th, on="source")
            x = m["n_chars"].to_numpy(np.int64)
            lo = m["lo"].to_numpy(np.int64)
            hi = m["hi"].to_numpy(np.int64)
            w = np.minimum(np.maximum(x, lo), hi)
            return pd.DataFrame({
                "doc_id": m["doc_id"].astype("int64"),
                "source": m["source"],
                "n_chars": m["n_chars"].astype("int64"),
                "n_chars_w": w,
                "clipped": (w != x).astype("int64")})

    return ds.map_batches(Clip, batch_format="pandas",
                          batch_size=65536, concurrency=(1, 4))


def q_cross_join(sf_dir: str):
    """CROSS join (region × nation) — the Cartesian product that grid
    ops (parameter sweeps, all-pairs scaffolds) need; completes the
    registry's join-type coverage alongside inner/left/full/semi/anti/
    asof/range/skew/fuzzy/broadcast. Output every (r_name, n_name) pair
    plus the nation key.

    Scale path: a cross join is only sane when ONE side is small — the
    small side (region) ships once via ray.put and each streaming batch
    of the big side expands in a vectorized pandas merge(how="cross");
    the big side never shuffles and output size is |big| × |small| by
    construction (the caller's contract, documented, not silently
    truncated)."""
    small = _read(sf_dir, "region", ["r_name"]).to_pandas()  # ≤ 5 rows
    small_ref = ray.put(small)
    big = _read(sf_dir, "nation", ["n_nationkey", "n_name"])

    class CrossJoin:
        def __init__(self):
            self.small = ray.get(small_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            out = df.merge(self.small, how="cross")
            return pd.DataFrame({
                "n_nationkey": out["n_nationkey"].astype("int64"),
                "n_name": out["n_name"],
                "r_name": out["r_name"]})

    return big.map_batches(CrossJoin, batch_format="pandas",
                           batch_size=65536, concurrency=(1, 2))


def q_embed_quantize(sf_dir: str):
    """Symmetric int8 quantization of the embedding column — the
    compression step an ANN index applies before serving (4× smaller
    vectors, one dequant scale per vector). Per vector: scale =
    max|x|/127 and code_i = floor(x_i·127/max|x| + 0.5); output
    (vec_id, dim, scale, code_sum, code_l1) — the integer code
    aggregates certify every element of the code list without hashing
    list columns. Zero-max (all-zero) vectors are excluded (scale
    undefined).

    Scale path: ONE zero-shuffle streaming pass; each batch is one
    (n, d) float64 matrix with vectorized abs/max/floor kernels.
    Parity: float32→float64 widening is exact, both sides spell
    floor(x·127/mx + 0.5) over doubles identically, and the per-vector
    code sums are ≤ 127·d — exact integers, order-independent."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def quant(t: pa.Table) -> pa.Table:
        from ..functions.similarity import _to_matrix
        m = _to_matrix(t["embedding"])
        dims = pc.list_value_length(
            _as_array(t["embedding"])).to_numpy(zero_copy_only=False)
        mx = np.abs(m).max(axis=1, initial=0.0)
        ok = mx > 0
        with np.errstate(divide="ignore", invalid="ignore"):
            codes = np.floor(m * 127.0 / mx[:, None] + 0.5)
        okm = codes[ok]
        return pa.table({
            "vec_id": pc.cast(t["vec_id"], pa.int64()).filter(pa.array(ok)),
            "dim": pa.array(dims[ok].astype(np.int64), pa.int64()),
            "scale": pa.array(mx[ok] / 127.0, pa.float64()),
            "code_sum": pa.array(okm.sum(axis=1).astype(np.int64),
                                 pa.int64()),
            "code_l1": pa.array(np.abs(okm).sum(axis=1).astype(np.int64),
                                pa.int64())})

    return ds.map_batches(quant, batch_format="pyarrow", batch_size=4096)


def q_value_corr(sf_dir: str):
    """Per-group Pearson correlation + OLS slope between two event
    features (value vs the props.k payload field, per event_type) — the
    drift/leakage check a feature pipeline runs before training on a
    signal. Output (event_type, n_events, corr, slope); zero-variance
    groups are excluded (corr undefined there).

    Scale path: ONE zero-shuffle per-batch combiner reduces the corpus to
    ≤ #event_types rows of (n, Σx, Σy, Σx², Σy², Σxy); the exchange moves
    six integers per group. Parity: x is the FIXED-POINT value in cents
    (round(value·100) via the repo's half-away-from-zero rule, matching
    DuckDB round() exactly INCLUDING .5 edges; a finish-time guard fails
    loudly if a group is large enough that an int64 partial sum could
    wrap where DuckDB's HUGEINT sum would not), y is the
    regex-extracted integer k, so all six sums are exact integers and
    corr/slope are computed through the identical double tree the oracle
    spells out — bit-equal."""
    ds = _read(sf_dir, "events", ["event_type", "value", "props"])

    def partial(t: pa.Table) -> pa.Table:
        v = np.asarray(pc.fill_null(t["value"], 0.0)
                       .to_numpy(zero_copy_only=False), np.float64)
        c = v * 100.0
        # DuckDB round() = std::round: half AWAY from zero, decided on
        # the EXACT double. floor(|c| + 0.5) is NOT that — the addition
        # can carry a value just below .5 over the edge (|c| =
        # 0.49999999999999994 → |c|+0.5 rounds to 1.0 → floor 1, DuckDB
        # 0). a − floor(a) is exact (Sterbenz), so compare the exact
        # fraction instead of adding.
        a = np.abs(c)
        f = np.floor(a)
        r = f + (a - f >= 0.5)
        x = pa.array((np.sign(c) * r).astype(np.int64), pa.int64())
        m = pc.extract_regex(pc.fill_null(t["props"], ""),
                             pattern=r'"k":\s*(?P<k>\d+)')
        y = pc.fill_null(pc.cast(pc.struct_field(m, "k"), pa.int64()), 0)
        g = pa.table({
            "event_type": t["event_type"], "x": x, "y": y,
            "xx": pc.multiply(x, x), "yy": pc.multiply(y, y),
            "xy": pc.multiply(x, y),
            "ax": pc.abs(x), "ay": pc.abs(y),
        }).group_by("event_type").aggregate(
            [("x", "count"), ("x", "sum"), ("y", "sum"),
             ("xx", "sum"), ("yy", "sum"), ("xy", "sum"),
             ("ax", "max"), ("ay", "max")])
        return g.rename_columns(
            ["event_type", "n", "sx", "sy", "sxx", "syy", "sxy",
             "mx", "my"])

    stats = (ds.map_batches(partial, batch_format="pyarrow",
                            batch_size=65536)
             .groupby("event_type")
             .aggregate(*([Sum(c, alias_name=c)
                           for c in ("n", "sx", "sy", "sxx", "syy", "sxy")]
                          + [Max(c, alias_name=c) for c in ("mx", "my")])))

    def finish(t: pa.Table) -> pa.Table:
        # exact-int sums → double AFTER the reduce; n·sxx overflows int64
        # at scale, so every product is computed in float64 (the oracle's
        # exact tree). The SUMS themselves wrap silently in int64 while
        # DuckDB promotes to HUGEINT — guard with the sufficient condition
        # n·max(x)² < 2^62 (Σx² ≤ n·mx², |Σxy| ≤ n·mx·my, |Σx| ≤ n·mx).
        nn = pc.cast(t["n"], pa.int64()).to_numpy().astype(np.float64)
        mx = t["mx"].to_numpy().astype(np.float64)
        my = t["my"].to_numpy().astype(np.float64)
        if len(nn) and float(np.max(
                nn * np.maximum(mx, my) ** 2)) >= 2.0 ** 62:
            raise ValueError(
                "value_corr partial sums may exceed int64 — the group is "
                "too large/wide for fixed-point parity with the HUGEINT "
                "oracle; shrink the fixed-point scale or shard the group")
        n = nn
        sx = t["sx"].to_numpy().astype(np.float64)
        sy = t["sy"].to_numpy().astype(np.float64)
        sxx = t["sxx"].to_numpy().astype(np.float64)
        syy = t["syy"].to_numpy().astype(np.float64)
        sxy = t["sxy"].to_numpy().astype(np.float64)
        cov = n * sxy - sx * sy
        varx = n * sxx - sx * sx
        vary = n * syy - sy * sy
        ok = (varx > 0) & (vary > 0)
        with np.errstate(divide="ignore", invalid="ignore"):
            corr = cov / (np.sqrt(varx) * np.sqrt(vary))
            slope = cov / varx
        return pa.table({
            "event_type": _as_array(t["event_type"]).filter(pa.array(ok)),
            "n_events": pa.array(n[ok].astype(np.int64), pa.int64()),
            "corr": pa.array(corr[ok], pa.float64()),
            "slope": pa.array(slope[ok], pa.float64())})

    return stats.map_batches(finish, batch_format="pyarrow")


DUPFRAC_N = 3  # n-gram width of the duplicated-fraction quality signal


def q_dup_ngram_fraction(sf_dir: str):
    """Per-document duplicated-n-gram fraction (the Gopher/RefinedWeb
    "fraction of characters in duplicated n-grams" family, on token
    3-grams): for each doc, the share of its 3-gram OCCURRENCES whose
    gram appears in ≥ 2 distinct documents corpus-wide. The per-doc
    score the span-level dup_ngram_spans report can't give — this is
    the number the keep/drop filter actually thresholds.

    Scale path: grams are built vectorized per batch (group-wise pandas
    shifts, no row loop) and combiner-reduced per (gram, doc) INSIDE the
    batch; ONE gram-bucketed exchange computes each gram's distinct-doc
    count and collapses to per-(doc, bucket) partial sums — so the second
    (doc-keyed) exchange moves ≤ #docs × #buckets tiny integer rows, never
    grams. dup_frac is one float division over exact integers."""
    ds = _tokenized_docs(sf_dir)  # shared tokenize-once intermediate

    def grams(t: pa.Table) -> pd.DataFrame:
        words, parents = _doc_tokens_from_lists(t)
        docs = pc.take(_as_array(t["doc_id"]), parents)
        df = pd.DataFrame({"doc_id": docs.to_pandas(),
                           "tok": words.to_pandas()})
        if not len(df):
            return pd.DataFrame({"gram": pd.Series([], dtype=str),
                                 "doc_id": pd.Series([], dtype="int64"),
                                 "p_cnt": pd.Series([], dtype="int64")})
        g = df.groupby("doc_id", sort=False)["tok"]
        parts = [df["tok"]]
        for s in range(1, DUPFRAC_N):
            parts.append(g.shift(-s))  # group-wise → never crosses docs
        full = parts[-1].notna()
        gram = parts[0]
        for p in parts[1:]:
            gram = gram + " " + p
        out = pd.DataFrame({"gram": gram[full], "doc_id": df["doc_id"][full]})
        return (out.groupby(["gram", "doc_id"], sort=False).size()
                .reset_index(name="p_cnt"))

    partials = ds.map_batches(grams, batch_format="pyarrow",
                              batch_size=65536)

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        per = (g.groupby(["gram", "doc_id"], sort=False)["p_cnt"].sum()
               .reset_index())
        nd = per.groupby("gram", sort=False)["doc_id"].nunique()
        dup = per["gram"].map(nd) >= 2
        per["dup_cnt"] = per["p_cnt"].where(dup, 0)
        agg = per.groupby("doc_id", sort=False).agg(
            n=("p_cnt", "sum"), ndup=("dup_cnt", "sum")).reset_index()
        return pd.DataFrame({"doc_id": agg["doc_id"].astype("int64"),
                             "n": agg["n"].astype("int64"),
                             "ndup": agg["ndup"].astype("int64")})

    merged = (_bucketed(partials, ["gram"])
              .groupby("bucket").map_groups(merge_bucket,
                                            batch_format="pandas"))

    # final doc-keyed reduce via the same bucket-then-vectorize pattern —
    # measured 47 s as a native groupby().aggregate(Sum) on 64 tiny input
    # blocks vs 0.6 s as one more bucketed exchange over the ≤ #docs ×
    # #buckets integer partials
    def finish(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("doc_id", sort=False).agg(
            n=("n", "sum"), ndup=("ndup", "sum")).reset_index()
        n = agg["n"].to_numpy(np.float64)
        nd = agg["ndup"].to_numpy(np.float64)
        return pd.DataFrame({
            "doc_id": agg["doc_id"].astype("int64"),
            "n_grams": agg["n"].astype("int64"),
            "n_dup_grams": agg["ndup"].astype("int64"),
            "dup_frac": nd / n})

    return (_bucketed(merged, ["doc_id"], 16)
            .groupby("bucket").map_groups(finish, batch_format="pandas"))


def q_quality_filter(sf_dir: str):
    """Gopher-style composite quality filter (Rae et al. 2021 §A1.1): the
    keep/drop decision every pretraining corpus applies before mixing,
    as the conjunction of four per-doc rules — token count in [30, 90],
    mean token length in [4.0, 5.0], distinct-token fraction ≥ 0.4
    (duplicate fraction ≤ 0.6), and top-unigram fraction ≤ 0.2. Output:
    (doc_id, n_tokens, ok_len, ok_tok_len, ok_distinct, ok_top, keep)
    with flags as 0/1 BIGINTs.

    Scale path: ONE zero-shuffle streaming pass over the shared
    tokenize-once intermediate — each doc's rule inputs (n, Σlen(tok),
    n_distinct, max unigram count) are batch-local integers. Parity:
    every threshold is evaluated as an INTEGER cross-multiplication
    (e.g. mean-length ∈ [4, 5] → 40·n ≤ 10·Σlen ≤ 50·n), so there is
    no float anywhere and the oracle hash is exact by construction."""
    ds = _tokenized_docs(sf_dir)  # shared tokenize-once intermediate

    def rules(t: pa.Table) -> pd.DataFrame:
        words, parents = _doc_tokens_from_lists(t)
        docs = pc.take(_as_array(t["doc_id"]), parents)
        df = pd.DataFrame({"doc_id": docs.to_pandas(),
                           "tok": words.to_pandas()})
        if not len(df):
            return pd.DataFrame({
                "doc_id": pd.Series([], dtype="int64"),
                **{c: pd.Series([], dtype="int64") for c in
                   ("n_tokens", "ok_len", "ok_tok_len", "ok_distinct",
                    "ok_top", "keep")}})
        df["toklen"] = df["tok"].str.len()
        g = df.groupby("doc_id", sort=False)
        per = pd.DataFrame({
            "n": g.size(),
            "sumlen": g["toklen"].sum(),
            "nd": g["tok"].nunique(),
            "topc": (df.groupby(["doc_id", "tok"], sort=False).size()
                     .groupby("doc_id").max()),
        }).reset_index()
        n = per["n"].to_numpy()
        ok_len = (30 <= n) & (n <= 90)
        sl = per["sumlen"].to_numpy()
        ok_tok_len = (40 * n <= 10 * sl) & (10 * sl <= 50 * n)
        ok_distinct = 10 * per["nd"].to_numpy() >= 4 * n
        ok_top = 5 * per["topc"].to_numpy() <= n
        keep = ok_len & ok_tok_len & ok_distinct & ok_top
        return pd.DataFrame({
            "doc_id": per["doc_id"].astype("int64"),
            "n_tokens": per["n"].astype("int64"),
            "ok_len": ok_len.astype("int64"),
            "ok_tok_len": ok_tok_len.astype("int64"),
            "ok_distinct": ok_distinct.astype("int64"),
            "ok_top": ok_top.astype("int64"),
            "keep": keep.astype("int64")})

    return ds.map_batches(rules, batch_format="pyarrow", batch_size=65536)


QUERIES = {
    # ---- driver-gate window (first 50): every op NEW or with a CHANGED
    # ---- code path this round, audited by function-body hash against the
    # ---- r4 cert commit (74232fe) including helper modules. r5 NEW (27
    # ---- entries): cross_join, embed_quantize, value_corr,
    # ---- dup_ngram_fraction, quality_filter, type_token_ratio,
    # ---- reciprocity, turn_overlap, edge_jaccard, link_predict_ra,
    # ---- length_quantiles, conversation_stats, decontaminate_fuzzy,
    # ---- grouped_stats, corpus_prep, vocab_coverage, lm_bigram_score
    # ---- (+_join), dedup_cluster_stats, bpe_merge_pairs, normalize_text,
    # ---- full_join, zscore_by_group, token_entropy, clustering_coeff,
    # ---- degree_assortativity, asof_join_bucketed. r5 CHANGED (direct or
    # ---- via helper): window_dedup, kg_degree_hist, asof_join, knn_join,
    # ---- semantic_dedup, skew_join (+_split), dup_ngram_spans, wordcount,
    # ---- pmi_bigrams, simhash_pairs (simhash_candidate_pairs helper),
    # ---- dedup_minhash / dedup_keep_best (dedup.py + _minhash_clusters),
    # ---- triangle_count (graph.py body), kg_edges / kg_nodes / kg_triples
    # ---- (canonicalize/materialize/link/encode/tpch_kg stage internals
    # ---- fused this round). Verdict-r4 rotations: ngram_jaccard,
    # ---- distinct, pair_similarity. The session-5 NEW ops
    # ---- winsorize_by_group + ngram_containment + cluster_purity took
    # ---- the kmeans_assign / tfidf_top_terms / dedup_exact slots —
    # ---- kmeans_assign + tfidf are unchanged + r4-certified; dedup_exact
    # ---- grew an optional pre_batch param whose DEFAULT path (the one
    # ---- every registry caller takes) is bit-identical, and sits first
    # ---- below the window. Displaced below
    # ---- (UNCHANGED since their r4 driver-green row, re-verified locally
    # ---- every sweep via tools/check_oracle.py): pack_sequences,
    # ---- chunk_tokens, bm25_topk, inverted_index, repetition_stats,
    # ---- decontaminate (comment-only diffs), sample_hash, set_except,
    # ---- sssp, kg_components.
    "cluster_purity": q_cluster_purity,
    "ngram_containment": q_ngram_containment,
    "winsorize_by_group": q_winsorize_by_group,
    "cross_join": q_cross_join,
    "embed_quantize": q_embed_quantize,
    "value_corr": q_value_corr,
    "dup_ngram_fraction": q_dup_ngram_fraction,
    "quality_filter": q_quality_filter,
    "type_token_ratio": q_type_token_ratio,
    "reciprocity": q_reciprocity,
    "turn_overlap": q_turn_overlap,
    "window_dedup": q_window_dedup,
    "kg_degree_hist": q_kg_degree_hist,
    "edge_jaccard": q_edge_jaccard,
    "link_predict_ra": q_link_predict_ra,
    "length_quantiles": q_length_quantiles,
    "conversation_stats": q_conversation_stats,
    "decontaminate_fuzzy": q_decontaminate_fuzzy,
    "grouped_stats": q_grouped_stats,
    "corpus_prep": q_corpus_prep,
    "vocab_coverage": q_vocab_coverage,
    "lm_bigram_score": q_lm_bigram_score,
    "lm_bigram_score_join": functools.partial(q_lm_bigram_score,
                                              _force_join=True),
    "dedup_cluster_stats": q_dedup_cluster_stats,
    "bpe_merge_pairs": q_bpe_merge_pairs,
    "normalize_text": q_normalize_text,
    "full_join": q_full_join,
    "zscore_by_group": q_zscore_by_group,
    "token_entropy": q_token_entropy,
    "clustering_coeff": q_clustering_coeff,
    "degree_assortativity": q_degree_assortativity,
    "triangle_count": q_triangle_count,
    "asof_join": q_asof_join,
    "asof_join_bucketed": q_asof_join_bucketed,
    "ngram_jaccard": q_ngram_jaccard,
    "distinct": q_distinct,
    "pair_similarity": q_pair_similarity,
    "semantic_dedup": q_semantic_dedup,
    "knn_join": q_knn_join,
    "dup_ngram_spans": q_dup_ngram_spans,
    "skew_join": q_skew_join,
    "skew_join_split": functools.partial(q_skew_join, _force_split=True),
    "dedup_minhash": q_dedup_minhash,
    "dedup_keep_best": q_dedup_keep_best,
    "simhash_pairs": q_simhash_pairs,
    "wordcount": q_wordcount,
    "pmi_bigrams": q_pmi_bigrams,
    "kg_edges": q_kg_edges,
    "kg_nodes": q_kg_nodes,
    "kg_triples": q_kg_triples,
    # ---- end of the first-50 driver-gate window ----
    "dedup_exact": q_dedup_exact,
    "tfidf_top_terms": q_tfidf_top_terms,
    "kmeans_assign": q_kmeans_assign,
    "pack_sequences": q_pack_sequences,
    "chunk_tokens": q_chunk_tokens,
    "bm25_topk": q_bm25_topk,
    "inverted_index": q_inverted_index,
    "repetition_stats": q_repetition_stats,
    "decontaminate": q_decontaminate,
    "ann_topk": q_ann_topk,
    "ann_index_topk": q_ann_index_topk,
    "embed_neardup": q_embed_neardup,
    "read_csv": q_read_csv,
    # displaced window fills (unchanged this round, r4 driver-certified):
    # the r5-new ops above took their first-50 slots
    "bigram_top": q_bigram_top,
    "sample_hash": q_sample_hash,
    "train_test_split": q_train_test_split,
    "set_intersect": q_set_intersect,
    "cooccurrence": q_cooccurrence,
    "funnel_counts": q_funnel_counts,
    "cube_agg": q_cube_agg,
    "ntile": q_ntile,
    "first_last": q_first_last,
    "approx_distinct": q_approx_distinct,
    "retention": q_retention,
    "percent_rank": q_percent_rank,
    "multimodal_meta": q_multimodal_meta,
    "multi_join": q_multi_join,
    "validate": q_validate,
    "group_concat": q_group_concat,
    "union": q_union,
    "filter_project": q_filter_project,
    # ---- below: certified in an earlier round and untouched since ----
    "histogram": q_histogram,
    "mode_per_group": q_mode_per_group,
    "stratified_sample": q_stratified_sample,
    "dense_rank": q_dense_rank,
    "lag_delta": q_lag_delta,
    "latest_per_key": q_latest_per_key,
    "except_all": q_except_all,
    "session_stats": q_session_stats,
    "time_to_convert": q_time_to_convert,
    "daily_series": q_daily_series,
    "rolling_count": q_rolling_count,
    "weekday_hour": q_weekday_hour,
    "profile": q_profile,
    "event_throttle": q_event_throttle,
    "mixture_sample": q_mixture_sample,
    "fuzzy_join": q_fuzzy_join,
    "sssp": q_sssp,
    "intersect_all": q_intersect_all,
    "dup_rate": q_dup_rate,
    "hash_join": q_hash_join,
    "sessionize": q_sessionize,
    "kg_components": q_kg_components,
    "pagerank": q_pagerank,
    "khop": q_khop,
    "id_backfill": q_id_backfill,
    "typed_projection": q_typed_projection,
    "read_json": q_read_json,
    "groupby_agg": q_groupby_agg,
    "grouped_median": q_grouped_median,
    "sort_topk": q_sort_topk,
    "broadcast_join": q_broadcast_join,
    "window_tumbling": q_window_tumbling,
    "window_sliding": q_window_sliding,
    "running_total": q_running_total,
    "heavy_hitters": q_heavy_hitters,
    "set_except": q_set_except,
    "anti_join": q_anti_join,
    "topk_per_group": q_topk_per_group,
    "fingerprint": q_fingerprint,
    "token_count": q_token_count,
    "quality": q_quality,
    "stopword_count": q_stopword_count,
    "lang_guess": q_lang_guess,
    "transcript_turns": q_transcript_turns,
    "left_join": q_left_join,
    "pivot_counts": q_pivot_counts,
    "count_distinct": q_count_distinct,
    "range_join": q_range_join,
    "rollup_agg": q_rollup_agg,
    "regex_extract": q_regex_extract,
    "grouped_quantiles": q_grouped_quantiles,
    "semi_join": q_semi_join,
}

# shared CTE text for the co-supply graph oracles (same cross-product join
# semantics the bucketed pandas merge in _cosupply_edges mirrors)
_COSUPPLY_RAW = (
    "SELECT l1.l_suppkey AS u, l2.l_suppkey AS v FROM lineitem l1 "
    "JOIN lineitem l2 ON l1.l_orderkey = l2.l_orderkey "
    "AND l2.l_linenumber = l1.l_linenumber + 1"
)

_EN_LIST_SQL = ", ".join(f"'{w}'" for w in textops.EN_STOPWORDS)

# MinHash permutation params as SQL literals — same seeded family as the Ray
# op (functions.dedup._perm_params), so the oracle reproduces the signatures
# bit-for-bit: h_j(x) = (a_j*x + b_j) mod 2^64 with a_j < 2^31 (the HUGEINT
# product never overflows).
from ..functions.dedup import _perm_params as _mh_perm_params  # noqa: E402

_MH_A, _MH_B = _mh_perm_params(64, seed=42)
_MH_PERM_VALUES = ", ".join(
    f"({i}, {int(a)}, {int(b)})" for i, (a, b) in enumerate(zip(_MH_A, _MH_B))
)
# Shared MinHash CTE prefix (shingle hash = md5_number_lower of each distinct
# lowercase 5-gram, 64 affine-permutation minima, 8 bands of 8 with band key =
# md5_number_lower of the comma-joined signature chunk) — the common front of
# the dedup_minhash and decontaminate_fuzzy mirrors.
_MH_BANDS_CTE = (
    "WITH RECURSIVE "
    f"perms(pidx, a, b) AS (VALUES {_MH_PERM_VALUES}), "
    "docs AS (SELECT doc_id, lower(coalesce(text,'')) AS t FROM documents), "
    "shing AS ("
    "SELECT DISTINCT doc_id, md5_number_lower(substr(t, i, 5)) AS x "
    "FROM docs, LATERAL (SELECT unnest(generate_series(1, len(t) - 4)) AS i) "
    "WHERE len(t) >= 5 "
    "UNION "
    "SELECT doc_id, md5_number_lower(t) FROM docs WHERE len(t) > 0 AND len(t) < 5), "
    "sigs AS (SELECT s.doc_id, p.pidx, "
    "min(CAST((CAST(p.a AS HUGEINT) * s.x + p.b) % 18446744073709551616 AS UBIGINT)) AS sig "
    "FROM shing s CROSS JOIN perms p GROUP BY s.doc_id, p.pidx), "
    "fullsigs AS (SELECT d.doc_id, p.pidx, "
    "coalesce(sg.sig, CAST(18446744073709551615 AS UBIGINT)) AS sig "
    "FROM (SELECT doc_id FROM documents) d CROSS JOIN perms p "
    "LEFT JOIN sigs sg ON sg.doc_id = d.doc_id AND sg.pidx = p.pidx), "
    "bands AS (SELECT doc_id, pidx // 8 AS band_id, "
    "md5_number_lower(string_agg(CAST(sig AS VARCHAR), ',' ORDER BY pidx)) AS band_hash "
    "FROM fullsigs GROUP BY doc_id, pidx // 8), "
)
# Full SQL mirror of MinHash+LSH near-dedup: the shared banding prefix, the
# same 200-per-band-bucket cap, exact shingle-set Jaccard >= 0.8 verification,
# and connected components via a recursive CTE (cluster id = min member id).
_DEDUP_MINHASH_SQL = _MH_BANDS_CTE + (
    "capped AS (SELECT * FROM bands "
    "QUALIFY row_number() OVER (PARTITION BY band_id, band_hash ORDER BY doc_id) <= 200), "
    "cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b "
    "FROM capped x JOIN capped y ON x.band_id = y.band_id "
    "AND x.band_hash = y.band_hash AND x.doc_id < y.doc_id), "
    "nsh AS (SELECT doc_id, count(*) AS n FROM shing GROUP BY doc_id), "
    "common AS (SELECT c.id_a, c.id_b, count(*) AS nc FROM cand c "
    "JOIN shing sa ON sa.doc_id = c.id_a "
    "JOIN shing sb ON sb.doc_id = c.id_b AND sb.x = sa.x "
    "GROUP BY c.id_a, c.id_b), "
    "verified AS (SELECT c.id_a, c.id_b FROM cand c "
    "LEFT JOIN nsh na ON na.doc_id = c.id_a "
    "LEFT JOIN nsh nb ON nb.doc_id = c.id_b "
    "LEFT JOIN common cm ON cm.id_a = c.id_a AND cm.id_b = c.id_b "
    "WHERE CASE WHEN coalesce(na.n, 0) + coalesce(nb.n, 0) = 0 THEN TRUE "
    "ELSE coalesce(cm.nc, 0) * 1.0 / "
    "(coalesce(na.n, 0) + coalesce(nb.n, 0) - coalesce(cm.nc, 0)) >= 0.8 END), "
    "edges AS (SELECT id_a AS u, id_b AS v FROM verified "
    "UNION SELECT id_b, id_a FROM verified), "
    "reach(src, dst) AS (SELECT u, v FROM edges "
    "UNION SELECT r.src, e.v FROM reach r JOIN edges e ON r.dst = e.u), "
    "clusters AS (SELECT src AS doc_id, least(src, min(dst)) AS cluster_id "
    "FROM reach GROUP BY src) "
    "SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS cluster_id, "
    "coalesce(c.cluster_id, d.doc_id) = d.doc_id AS is_keeper "
    "FROM documents d LEFT JOIN clusters c USING (doc_id)"
)
# Fuzzy decontamination mirror: same banding prefix, candidate pairs are the
# bench×train band-bucket join (NO per-bucket cap — the Ray side probes the
# whole broadcast bench bucket list), Jaccard >= 0.8 verification with the
# empty-vs-empty TRUE rule, then one group per contaminated train doc.
_DECON_FUZZY_SQL = _MH_BANDS_CTE + (
    "bench AS (SELECT * FROM bands WHERE doc_id % 31 = 0), "
    "train AS (SELECT * FROM bands WHERE doc_id % 31 <> 0), "
    "cand AS (SELECT DISTINCT t.doc_id AS tid, b.doc_id AS bid "
    "FROM train t JOIN bench b ON t.band_id = b.band_id "
    "AND t.band_hash = b.band_hash), "
    "nsh AS (SELECT doc_id, count(*) AS n FROM shing GROUP BY doc_id), "
    "common AS (SELECT c.tid, c.bid, count(*) AS nc FROM cand c "
    "JOIN shing sa ON sa.doc_id = c.tid "
    "JOIN shing sb ON sb.doc_id = c.bid AND sb.x = sa.x "
    "GROUP BY c.tid, c.bid), "
    "verified AS (SELECT c.tid, c.bid FROM cand c "
    "LEFT JOIN nsh na ON na.doc_id = c.tid "
    "LEFT JOIN nsh nb ON nb.doc_id = c.bid "
    "LEFT JOIN common cm ON cm.tid = c.tid AND cm.bid = c.bid "
    "WHERE CASE WHEN coalesce(na.n, 0) + coalesce(nb.n, 0) = 0 THEN TRUE "
    "ELSE coalesce(cm.nc, 0) * 1.0 / "
    "(coalesce(na.n, 0) + coalesce(nb.n, 0) - coalesce(cm.nc, 0)) >= 0.8 END) "
    "SELECT tid AS doc_id, count(*) AS n_bench_matches, "
    "min(bid) AS best_bench FROM verified GROUP BY tid"
)
_LANG_LIST_SQL = {
    lg: ", ".join(f"'{w}'" for w in sorted(textops.STOPWORDS[lg]))
    for lg in sorted(textops.STOPWORDS)
}
# Stopword-vote language ID in SQL: one list_filter count per language, then
# a CASE chain ordered fr→es→en→de so ties resolve to the lexicographically
# LAST tied language — exactly Python's max(langs, key=(score, lang)).
_LANG_GUESS_SQL = (
    "WITH c AS (SELECT doc_id, "
    + ", ".join(
        "len(list_filter(regexp_split_to_array(trim(lower(coalesce(text,''))),"
        f" '\\s+'), x -> list_contains([{_LANG_LIST_SQL[lg]}], x))) AS c_{lg}"
        for lg in sorted(textops.STOPWORDS)
    )
    + " FROM documents) SELECT doc_id, CASE "
    "WHEN greatest(c_de, c_en, c_es, c_fr) = 0 THEN 'und' "
    "WHEN c_fr >= c_es AND c_fr >= c_en AND c_fr >= c_de THEN 'fr' "
    "WHEN c_es >= c_en AND c_es >= c_de THEN 'es' "
    "WHEN c_en >= c_de THEN 'en' ELSE 'de' END AS lang_guess FROM c"
)

# Embedding near-dup in SQL: the seeded random hyperplanes (identical to
# functions.similarity.hyperplanes(64, 6, 42)) as DOUBLE[] literals; bucket =
# sign-pattern integer; exact cosine within bucket. repr() round-trips the
# float64 values exactly.
from ..functions.similarity import hyperplanes as _nd_hyperplanes  # noqa: E402

_ND_DIM = 64  # embeddings.parquet dim across all test SFs
_ND_PLANE_VALUES = ", ".join(
    "({}, [{}])".format(i, ", ".join(repr(float(v)) for v in row))
    for i, row in enumerate(_nd_hyperplanes(_ND_DIM, _ND_PLANES, seed=42))
)
_ND_MAX_BUCKET = 2000  # must equal neardup_pairs_cosine(max_bucket=...)
_EMBED_NEARDUP_SQL = (
    f"WITH planes(pidx, vec) AS (VALUES {_ND_PLANE_VALUES}), "
    "b0 AS (SELECT vec_id, embedding, "
    "sum(CASE WHEN list_dot_product(embedding, p.vec) > 0 "
    "THEN (1 << p.pidx) ELSE 0 END) AS bucket "
    "FROM embeddings CROSS JOIN planes p GROUP BY vec_id, embedding), "
    # same deterministic per-bucket cap as the Ray path (sorted by id,
    # head max_bucket) so the oracle stays exact past 2000-vector buckets
    "b AS (SELECT * FROM b0 QUALIFY "
    f"row_number() OVER (PARTITION BY bucket ORDER BY vec_id) <= {_ND_MAX_BUCKET}) "
    "SELECT a.vec_id AS id_a, c.vec_id AS id_b "
    "FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id "
    f"WHERE list_cosine_similarity(a.embedding, c.embedding) >= {_ND_THRESHOLD}"
)

def _bm25_sql() -> str:
    """Same expression tree + literal term order as q_bm25_topk (see its
    docstring for the float-parity argument)."""
    tok = ("list_filter(regexp_split_to_array(trim(lower(coalesce(text,''))),"
           " '\\s+'), x -> x <> '')")
    tf_cols = ", ".join(
        f"len(list_filter({tok}, x -> x = '{t}')) AS tf{i}"
        for i, t in enumerate(BM25_TERMS))
    df_cols = ", ".join(
        f"sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS df{i}"
        for i in range(len(BM25_TERMS)))
    idf_cols = ", ".join(
        f"ln((n - df{i} + 0.5) / (df{i} + 0.5) + 1.0) AS idf{i}"
        for i in range(len(BM25_TERMS)))
    score = " + ".join(
        f"idf{i} * (tf{i} * 2.2) / (tf{i} + 1.2 * (0.25 + 0.75 * (dl / avgdl)))"
        for i in range(len(BM25_TERMS)))
    matched = " + ".join(f"tf{i}" for i in range(len(BM25_TERMS)))
    return (
        f"WITH s AS (SELECT doc_id, len({tok}) AS dl, {tf_cols} FROM documents), "
        f"tot AS (SELECT count(*) AS n, sum(dl) AS sum_dl, {df_cols} FROM s), "
        f"c AS (SELECT sum_dl / n AS avgdl, {idf_cols} FROM tot) "
        f"SELECT doc_id, {score} AS score FROM s, c WHERE {matched} > 0 "
        f"ORDER BY score DESC, doc_id LIMIT 10"
    )


_LM_ORACLE_SQL = (
    "WITH w AS (SELECT doc_id, list_filter(regexp_split_to_array("
    "trim(lower(coalesce(text,''))), '\\s+'), x -> x <> '') AS ws "
    "FROM documents), "
    "bg AS (SELECT doc_id, unnest(list_transform(generate_series(1, "
    "len(ws) - 1), i -> ws[i])) AS w1, "
    "unnest(list_transform(generate_series(1, len(ws) - 1), "
    "i -> ws[i+1])) AS w2 FROM w WHERE len(ws) >= 2), "
    "bc AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY w1, w2), "
    "uc AS (SELECT word, count(*) AS c1 FROM "
    "(SELECT unnest(ws) AS word FROM w) GROUP BY word), "
    "v AS (SELECT count(*) AS vs FROM uc) "
    "SELECT bg.doc_id, count(*) AS n_bigrams, "
    f"CAST(sum((CAST({LM_FP_SCALE} AS BIGINT) * (bc.c12 + 1)) "
    "// (uc.c1 + v.vs)) AS DOUBLE) "
    f"/ (CAST(count(*) AS DOUBLE) * {float(LM_FP_SCALE)}) AS lm_score "
    "FROM bg JOIN bc USING (w1, w2) JOIN uc ON uc.word = bg.w1 "
    "CROSS JOIN v GROUP BY bg.doc_id"
)

ORACLE_SQL = {
    "cross_join": (
        "SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name, r_name "
        "FROM nation CROSS JOIN region"
    ),
    # cluster_purity: composes the kmeans_assign mirror; exact integer
    # counts, majority tie → smallest label, one float division.
    "cluster_purity": (
        "WITH c AS (SELECT embedding AS ce, row_number() OVER "
        "(ORDER BY vec_id) - 1 AS j FROM embeddings "
        f"QUALIFY row_number() OVER (ORDER BY vec_id) <= {KMEANS_K}), "
        "a AS (SELECT vec_id, j AS cluster FROM embeddings e CROSS JOIN c "
        "QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY "
        "list_cosine_similarity(e.embedding, c.ce) DESC, j) = 1), "
        "l AS (SELECT a.cluster, e.label, count(*) AS c FROM a "
        "JOIN embeddings e USING (vec_id) GROUP BY a.cluster, e.label), "
        "t AS (SELECT cluster, label, c, row_number() OVER ("
        "PARTITION BY cluster ORDER BY c DESC, label) AS rn, "
        "sum(c) OVER (PARTITION BY cluster) AS n FROM l) "
        "SELECT CAST(cluster AS BIGINT) AS cluster, "
        "CAST(n AS BIGINT) AS n_vecs, CAST(label AS BIGINT) AS top_label, "
        "CAST(c AS BIGINT) AS n_top, "
        "CAST(c AS DOUBLE) / CAST(n AS DOUBLE) AS purity FROM t "
        "WHERE rn = 1"
    ),
    # ngram_containment: integer shingle counts; containment is the one
    # float division both sides spell identically (int/int → double).
    "ngram_containment": (
        "WITH docs AS (SELECT doc_id, lower(coalesce(text,'')) AS t "
        "FROM documents), "
        "shing AS (SELECT DISTINCT doc_id, substr(t, i, 5) AS s FROM docs, "
        "LATERAL (SELECT unnest(generate_series(1, len(t) - 4)) AS i) "
        "WHERE len(t) >= 5 "
        "UNION SELECT doc_id, t FROM docs WHERE len(t) > 0 AND len(t) < 5), "
        "pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b "
        "FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1), "
        "nsh AS (SELECT doc_id, count(*) AS n FROM shing GROUP BY doc_id), "
        "common AS (SELECT p.doc_a, p.doc_b, count(*) AS nc FROM pairs p "
        "JOIN shing sa ON sa.doc_id = p.doc_a "
        "JOIN shing sb ON sb.doc_id = p.doc_b AND sb.s = sa.s "
        "GROUP BY p.doc_a, p.doc_b) "
        "SELECT p.doc_a, p.doc_b, na.n AS n_a, nb.n AS n_b, "
        "coalesce(cm.nc, 0) AS n_common, "
        "CAST(coalesce(cm.nc, 0) AS DOUBLE) / least(na.n, nb.n) "
        "AS containment "
        "FROM pairs p JOIN nsh na ON na.doc_id = p.doc_a "
        "JOIN nsh nb ON nb.doc_id = p.doc_b "
        "LEFT JOIN common cm ON cm.doc_a = p.doc_a AND cm.doc_b = p.doc_b"
    ),
    # winsorize_by_group: length_quantiles' integer rank rule + integer
    # min/max clip — no float anywhere, exact by construction.
    "winsorize_by_group": (
        "WITH g AS (SELECT source, n_chars, count(*) AS c FROM documents "
        "GROUP BY source, n_chars), "
        "cum AS (SELECT source, n_chars, "
        "sum(c) OVER (PARTITION BY source ORDER BY n_chars) AS cum, "
        "sum(c) OVER (PARTITION BY source) AS n FROM g), "
        "th AS (SELECT source, "
        "min(CASE WHEN cum >= (n * 5 + 99) // 100 THEN n_chars END) AS lo, "
        "min(CASE WHEN cum >= (n * 95 + 99) // 100 THEN n_chars END) AS hi "
        "FROM cum GROUP BY source) "
        "SELECT d.doc_id, d.source, CAST(d.n_chars AS BIGINT) AS n_chars, "
        "CAST(least(greatest(d.n_chars, th.lo), th.hi) AS BIGINT) "
        "AS n_chars_w, "
        "CAST(CASE WHEN d.n_chars < th.lo OR d.n_chars > th.hi "
        "THEN 1 ELSE 0 END AS BIGINT) AS clipped "
        "FROM documents d JOIN th USING (source)"
    ),
    # embed_quantize: float32→double widening is exact; both sides spell
    # floor(x*127/mx + 0.5) identically; code sums are exact integers.
    "embed_quantize": (
        "WITH m AS (SELECT vec_id, CAST(len(embedding) AS BIGINT) AS dim, "
        "list_max(list_transform(embedding, "
        "x -> abs(CAST(x AS DOUBLE)))) AS mx, embedding FROM embeddings), "
        "c AS (SELECT vec_id, dim, mx, list_transform(embedding, "
        "x -> floor(CAST(x AS DOUBLE) * 127 / mx + 0.5)) AS codes "
        "FROM m WHERE mx > 0) "
        "SELECT vec_id, dim, mx / 127 AS scale, "
        "CAST(list_sum(codes) AS BIGINT) AS code_sum, "
        "CAST(list_sum(list_transform(codes, c -> abs(c))) AS BIGINT) "
        "AS code_l1 FROM c"
    ),
    # value_corr: six exact-integer sums; corr/slope through the
    # identical double tree (every product computed in DOUBLE — n·sxx
    # overflows BIGINT at scale on BOTH engines).
    "value_corr": (
        "WITH b AS (SELECT event_type, "
        "CAST(round(coalesce(value, 0) * 100) AS BIGINT) AS x, "
        "CAST(coalesce(nullif(regexp_extract(coalesce(props, ''), "
        "'\"k\":\\s*(\\d+)', 1), ''), '0') AS BIGINT) AS y FROM events), "
        "s AS (SELECT event_type, count(*) AS n, sum(x) AS sx, "
        "sum(y) AS sy, sum(x * x) AS sxx, sum(y * y) AS syy, "
        "sum(x * y) AS sxy FROM b GROUP BY event_type), "
        "f AS (SELECT event_type, n, "
        "CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) "
        "- CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS cov, "
        "CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) "
        "- CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS varx, "
        "CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) "
        "- CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS vary FROM s) "
        "SELECT event_type, CAST(n AS BIGINT) AS n_events, "
        "cov / (sqrt(varx) * sqrt(vary)) AS corr, cov / varx AS slope "
        "FROM f WHERE varx > 0 AND vary > 0"
    ),
    # dup_ngram_fraction: exact integer gram counts; dup_frac is the one
    # float division both sides spell identically.
    "dup_ngram_fraction": (
        "WITH w AS (SELECT doc_id, list_filter(regexp_split_to_array("
        "trim(lower(coalesce(text,''))), '\\s+'), x -> x <> '') AS ws "
        "FROM documents), "
        f"g AS (SELECT doc_id, unnest(list_transform(generate_series(1, "
        f"len(ws) - {DUPFRAC_N - 1}), i -> ws[i] || ' ' || ws[i+1] || ' ' "
        f"|| ws[i+2])) AS gram FROM w WHERE len(ws) >= {DUPFRAC_N}), "
        "gc AS (SELECT gram, doc_id, count(*) AS c FROM g "
        "GROUP BY gram, doc_id), "
        "gd AS (SELECT gram, count(*) AS nd FROM gc GROUP BY gram), "
        "per AS (SELECT gc.doc_id, sum(gc.c) AS n, "
        "sum(CASE WHEN gd.nd >= 2 THEN gc.c ELSE 0 END) AS ndup "
        "FROM gc JOIN gd USING (gram) GROUP BY gc.doc_id) "
        "SELECT doc_id, CAST(n AS BIGINT) AS n_grams, "
        "CAST(ndup AS BIGINT) AS n_dup_grams, "
        "CAST(ndup AS DOUBLE) / CAST(n AS DOUBLE) AS dup_frac FROM per"
    ),
    # quality_filter: all four Gopher rules are integer
    # cross-multiplications — no float anywhere, hash exact by
    # construction.
    "quality_filter": (
        "WITH w AS (SELECT doc_id, list_filter(regexp_split_to_array("
        "trim(lower(coalesce(text,''))), '\\s+'), x -> x <> '') AS ws "
        "FROM documents), "
        "cw AS (SELECT doc_id, word, count(*) AS c FROM "
        "(SELECT doc_id, unnest(ws) AS word FROM w) GROUP BY doc_id, word), "
        "per AS (SELECT doc_id, sum(c) AS n, count(*) AS nd, max(c) AS topc, "
        "sum(len(word) * c) AS sumlen FROM cw GROUP BY doc_id), "
        "fl AS (SELECT doc_id, n, "
        "CASE WHEN n >= 30 AND n <= 90 THEN 1 ELSE 0 END AS ok_len, "
        "CASE WHEN 40 * n <= 10 * sumlen AND 10 * sumlen <= 50 * n "
        "THEN 1 ELSE 0 END AS ok_tok_len, "
        "CASE WHEN 10 * nd >= 4 * n THEN 1 ELSE 0 END AS ok_distinct, "
        "CASE WHEN 5 * topc <= n THEN 1 ELSE 0 END AS ok_top FROM per) "
        "SELECT doc_id, CAST(n AS BIGINT) AS n_tokens, "
        "CAST(ok_len AS BIGINT) AS ok_len, "
        "CAST(ok_tok_len AS BIGINT) AS ok_tok_len, "
        "CAST(ok_distinct AS BIGINT) AS ok_distinct, "
        "CAST(ok_top AS BIGINT) AS ok_top, "
        "CAST(ok_len * ok_tok_len * ok_distinct * ok_top AS BIGINT) AS keep "
        "FROM fl"
    ),
    # turn_overlap: same templated TPC-H transcript derivation as the
    # kg_triples oracle (turn 0 = stmt, turn 1 = 'Yes, ' || stmt),
    # oracle-locked token rule per turn; exact integer counts through
    # one float division.
    "turn_overlap": (
        "WITH turns(turn) AS (VALUES (0), (1)), "
        "base AS ("
        "SELECT 'c-' || CAST(c_custkey AS VARCHAR) AS conv_id, "
        "'C' || lpad(CAST(c_custkey AS VARCHAR), 7, '0') || "
        "' located in ' || n_name || '.' AS stmt "
        "FROM customer JOIN nation ON c_nationkey = n_nationkey "
        "UNION ALL "
        "SELECT 's-' || CAST(s_suppkey AS VARCHAR), "
        "'S' || lpad(CAST(s_suppkey AS VARCHAR), 7, '0') || "
        "' located in ' || n_name || '.' "
        "FROM supplier JOIN nation ON s_nationkey = n_nationkey), "
        "t AS (SELECT conv_id, turn, CASE WHEN turn = 0 THEN stmt "
        "ELSE 'Yes, ' || stmt END AS txt FROM base CROSS JOIN turns), "
        "tok AS (SELECT DISTINCT conv_id, turn, w FROM ("
        "SELECT conv_id, turn, unnest(list_filter(regexp_split_to_array("
        "trim(lower(txt)), '\\s+'), x -> x <> '')) AS w FROM t)), "
        "cnt AS (SELECT conv_id, turn, count(*) AS n FROM tok "
        "GROUP BY conv_id, turn), "
        "com AS (SELECT a.conv_id, b.turn, count(*) AS c FROM tok a "
        "JOIN tok b ON b.conv_id = a.conv_id AND b.turn = a.turn + 1 "
        "AND b.w = a.w GROUP BY a.conv_id, b.turn) "
        "SELECT cu.conv_id, CAST(cu.turn AS INTEGER) AS turn_idx, "
        "CAST(coalesce(cp.n, 0) AS BIGINT) AS n_prev, "
        "CAST(coalesce(cc.n, 0) AS BIGINT) AS n_cur, "
        "CAST(coalesce(cm.c, 0) AS BIGINT) AS n_common, "
        "CAST(coalesce(cm.c, 0) AS DOUBLE) / CAST(coalesce(cp.n, 0) "
        "+ coalesce(cc.n, 0) - coalesce(cm.c, 0) AS DOUBLE) AS jaccard "
        "FROM t cu "
        "LEFT JOIN cnt cp ON cp.conv_id = cu.conv_id "
        "AND cp.turn = cu.turn - 1 "
        "LEFT JOIN cnt cc ON cc.conv_id = cu.conv_id AND cc.turn = cu.turn "
        "LEFT JOIN com cm ON cm.conv_id = cu.conv_id AND cm.turn = cu.turn "
        "WHERE cu.turn >= 1 AND coalesce(cp.n, 0) + coalesce(cc.n, 0) "
        "- coalesce(cm.c, 0) > 0"
    ),
    # type_token_ratio: exact integer counts; ttr is the single float
    # division both sides spell identically, so hashes are bit-equal.
    "type_token_ratio": (
        "WITH w AS (SELECT doc_id, list_filter(regexp_split_to_array("
        "trim(lower(coalesce(text,''))), '\\s+'), x -> x <> '') AS ws "
        "FROM documents), "
        "cw AS (SELECT doc_id, word, count(*) AS c FROM "
        "(SELECT doc_id, unnest(ws) AS word FROM w) GROUP BY doc_id, word), "
        "per AS (SELECT doc_id, sum(c) AS n, count(*) AS nd, "
        "sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS nh "
        "FROM cw GROUP BY doc_id) "
        "SELECT doc_id, CAST(n AS BIGINT) AS n_tokens, "
        "CAST(nd AS BIGINT) AS n_distinct, CAST(nh AS BIGINT) AS n_hapax, "
        "CAST(nd AS DOUBLE) / CAST(n AS DOUBLE) AS ttr FROM per"
    ),
    "pack_sequences": (
        "WITH tk AS (SELECT doc_id, CAST(len(list_filter("
        "regexp_split_to_array(trim(lower(coalesce(text,''))), '\\s+'), "
        "x -> x <> '')) AS BIGINT) AS n_tokens FROM documents) "
        "SELECT doc_id, n_tokens, CAST((sum(n_tokens) OVER ("
        "ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n_tokens) "
        f"// {PACK_BUDGET} AS BIGINT) AS seq_id FROM tk"
    ),
    "semantic_dedup": (
        "WITH c AS (SELECT embedding AS ce, row_number() OVER "
        "(ORDER BY vec_id) - 1 AS j FROM embeddings "
        f"QUALIFY row_number() OVER (ORDER BY vec_id) <= {KMEANS_K}), "
        "a AS (SELECT vec_id, embedding, j AS cluster "
        "FROM embeddings e CROSS JOIN c "
        "QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY "
        "list_cosine_similarity(e.embedding, c.ce) DESC, j) = 1) "
        "SELECT a.vec_id, a.cluster FROM a WHERE NOT EXISTS ("
        "SELECT 1 FROM a b WHERE b.cluster = a.cluster "
        "AND b.vec_id < a.vec_id "
        "AND list_cosine_similarity(a.embedding, b.embedding) "
        f">= {SEMDEDUP_T})"
    ),
    "knn_join": (
        "WITH q AS (SELECT vec_id AS q_id, embedding AS qe "
        f"FROM embeddings WHERE vec_id % {KNN_QUERY_MOD} = 0) "
        "SELECT q_id, vec_id AS n_id, "
        "round(list_cosine_similarity(embedding, qe), 4) AS score "
        "FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.q_id "
        "QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY "
        f"list_cosine_similarity(embedding, qe) DESC, vec_id) <= {KNN_K}"
    ),
    "dup_ngram_spans": (
        "WITH w AS (SELECT doc_id, list_filter(regexp_split_to_array("
        "trim(lower(coalesce(text,''))), '\\s+'), x -> x <> '') AS ws "
        "FROM documents), "
        "g AS (SELECT doc_id, unnest(list_transform("
        f"generate_series(1, len(ws) - {NGRAM_SPAN - 1}), "
        "i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || "
        "ws[i+3] || ' ' || ws[i+4])) AS ngram "
        f"FROM w WHERE len(ws) >= {NGRAM_SPAN}) "
        "SELECT ngram, count(DISTINCT doc_id) AS n_docs, "
        "count(*) AS n_occ FROM g GROUP BY ngram "
        "HAVING count(DISTINCT doc_id) >= 2"
    ),
    "skew_join": (
        "SELECT l_orderkey, l_linenumber, l_extendedprice, "
        "o_totalprice, o_orderpriority "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey"
    ),
    # the forced-split certification path — identical SQL by construction
    # (the hot/cold split must be semantics-free)
    "skew_join_split": (
        "SELECT l_orderkey, l_linenumber, l_extendedprice, "
        "o_totalprice, o_orderpriority "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey"
    ),
    "bm25_topk": _bm25_sql(),
    "tfidf_top_terms": (
        "WITH toks AS (SELECT doc_id, unnest(list_filter("
        "regexp_split_to_array(trim(lower(coalesce(text,''))), '\\s+'), "
        "x -> x <> '')) AS word FROM documents), "
        "tf AS (SELECT doc_id, word, count(*) AS tf FROM toks "
        "GROUP BY doc_id, word), "
        "df AS (SELECT word, count(DISTINCT doc_id) AS df FROM toks "
        "GROUP BY word), "
        "n AS (SELECT count(*) AS n FROM documents), "
        "s AS (SELECT tf.doc_id, tf.word, tf.tf * ln(n.n / df.df) AS tfidf "
        "FROM tf JOIN df USING (word) CROSS JOIN n) "
        "SELECT doc_id, word, tfidf FROM s QUALIFY "
        "row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, word) "
        "<= 3"
    ),
    "chunk_tokens": (
        "WITH toks AS (SELECT doc_id, list_filter(regexp_split_to_array("
        "trim(lower(coalesce(text,''))), '\\s+'), x -> x <> '') AS tk "
        "FROM documents), "
        "starts AS (SELECT doc_id, tk, unnest(range(0, greatest(len(tk),1), "
        f"{CHUNK_STEP})) AS st FROM toks) "
        f"SELECT doc_id, CAST(st // {CHUNK_STEP} AS INTEGER) AS chunk_idx, "
        # coalesce: array_to_string of an EMPTY list is NULL in DuckDB,
        # while the engine's binary_join emits '' — zero-token documents
        # produce one empty chunk on both sides
        f"coalesce(array_to_string(tk[st+1:st+{CHUNK_SIZE}], ' '), '') "
        "AS chunk_text, "
        f"len(tk[st+1:st+{CHUNK_SIZE}]) AS n_tokens FROM starts"
    ),
    "filter_project": (
        "SELECT doc_id, lang, n_chars FROM documents "
        "WHERE coalesce(text,'') <> '' AND n_chars > 100"
    ),
    "id_backfill": (
        "SELECT doc_id, CASE WHEN coalesce(source,'') = '' "
        "THEN 'doc-' || CAST(doc_id AS VARCHAR) ELSE source END AS id_norm "
        "FROM documents"
    ),
    "typed_projection": (
        "SELECT event_id, event_type, CAST(floor(value) AS BIGINT) AS value_floor, "
        "coalesce(props,'') AS props_str FROM events"
    ),
    "groupby_agg": (
        "SELECT l_returnflag, l_linestatus, round(sum(l_quantity),2) AS sum_qty, "
        "round(sum(l_extendedprice),2) AS sum_base_price, "
        "round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc_price, "
        "count(*) AS count_order FROM lineitem GROUP BY l_returnflag, l_linestatus"
    ),
    "sort_topk": (
        "SELECT o_orderkey, o_totalprice FROM orders "
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"
    ),
    "distinct": "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    "broadcast_join": (
        "SELECT r_name, count(*) AS n_customers, round(sum(c_acctbal),2) AS sum_acctbal "
        "FROM customer JOIN nation ON c_nationkey = n_nationkey "
        "JOIN region ON n_regionkey = r_regionkey GROUP BY r_name"
    ),
    "hash_join": (
        "SELECT c_mktsegment, round(sum(o_totalprice),2) AS revenue, "
        "count(*) AS n_orders FROM orders JOIN customer ON o_custkey = c_custkey "
        "GROUP BY c_mktsegment"
    ),
    "sessionize": (
        "WITH g AS (SELECT user_id, ts, CASE WHEN ts - lag(ts) OVER "
        "(PARTITION BY user_id ORDER BY ts) > INTERVAL 30 MINUTE OR lag(ts) OVER "
        "(PARTITION BY user_id ORDER BY ts) IS NULL THEN 1 ELSE 0 END AS brk "
        "FROM events) SELECT user_id, CAST(sum(brk) AS BIGINT) AS n_sessions "
        "FROM g GROUP BY user_id"
    ),
    "window_tumbling": (
        "SELECT user_id, date_trunc('hour', ts) AS hour_bucket, "
        "count(*) AS n_events, round(sum(value),2) AS sum_value "
        "FROM events GROUP BY user_id, date_trunc('hour', ts)"
    ),
    "asof_join": (
        "WITH o AS (SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey "
        "FROM orders GROUP BY o_custkey, o_orderdate) "
        "SELECT e.event_id, e.user_id, o.o_orderkey FROM events e "
        "ASOF JOIN o ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate"
    ),
    # the bucketed scale path must be value-identical to the broadcast path
    "asof_join_bucketed": (
        "WITH o AS (SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey "
        "FROM orders GROUP BY o_custkey, o_orderdate) "
        "SELECT e.event_id, e.user_id, o.o_orderkey FROM events e "
        "ASOF JOIN o ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate"
    ),
    "anti_join": (
        "SELECT c_custkey, c_name FROM customer "
        "WHERE c_custkey NOT IN (SELECT DISTINCT user_id FROM events)"
    ),
    "topk_per_group": (
        "SELECT event_type, event_id, value FROM events "
        "QUALIFY row_number() OVER (PARTITION BY event_type "
        "ORDER BY value DESC, event_id) <= 5"
    ),
    # coalesce(text, '') everywhere: the Ray side defines NULL text ≡ ''
    # (same rule dup_rate/wordcount already mirror) — bare md5(text)/
    # length(text) would return NULL for a NULL-text row instead
    "dedup_exact": (
        "SELECT md5(coalesce(text, '')) AS text_hash, min(doc_id) AS doc_id "
        "FROM documents GROUP BY md5(coalesce(text, ''))"
    ),
    "fingerprint":
        "SELECT doc_id, md5(coalesce(text, '')) AS fp FROM documents",
    "token_count": (
        "SELECT doc_id, CASE WHEN trim(text) = '' THEN 0 ELSE "
        "len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens "
        "FROM documents"
    ),
    "quality": (
        "WITH d AS (SELECT doc_id, coalesce(text, '') AS text FROM documents) "
        "SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars_txt, "
        "CASE WHEN trim(text)='' THEN 0 ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens, "
        "CAST(length(regexp_replace(text, '\\s', '', 'g')) AS BIGINT) AS sum_token_len "
        "FROM d"
    ),
    "stopword_count": (
        "SELECT doc_id, CASE WHEN trim(text)='' THEN CAST(0 AS BIGINT) ELSE "
        "len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), "
        f"x -> list_contains([{_EN_LIST_SQL}], x))) END AS n_stopwords "
        "FROM documents"
    ),
    "lang_guess": _LANG_GUESS_SQL,
    "sample_hash": (
        "SELECT doc_id, lang, n_chars FROM documents "
        "WHERE md5_number_lower(CAST(doc_id AS VARCHAR)) % 10 = 0"
    ),
    "train_test_split": (
        "SELECT CASE WHEN md5_number_lower(CAST(doc_id AS VARCHAR)) % 10 "
        "= 0 THEN 'test' ELSE 'train' END AS split, lang, "
        "count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars "
        "FROM documents GROUP BY 1, 2"
    ),
    "pmi_bigrams": (
        "WITH w AS (SELECT list_filter(regexp_split_to_array("
        "trim(lower(coalesce(text,''))), '\\s+'), x -> x <> '') AS ws "
        "FROM documents), "
        "bg AS (SELECT unnest(list_transform(generate_series(1, "
        "len(ws) - 1), i -> ws[i])) AS w1, "
        "unnest(list_transform(generate_series(1, len(ws) - 1), "
        "i -> ws[i+1])) AS w2 FROM w WHERE len(ws) >= 2), "
        "bc AS (SELECT w1, w2, count(*) AS cnt FROM bg GROUP BY w1, w2), "
        "ug AS (SELECT unnest(ws) AS word FROM w), "
        "uc AS (SELECT word, count(*) AS c FROM ug GROUP BY word), "
        "tot AS (SELECT (SELECT CAST(sum(cnt) AS DOUBLE) FROM bc) AS p, "
        "(SELECT CAST(count(*) AS DOUBLE) FROM ug) AS t) "
        "SELECT w1, w2, cnt, "
        "ln((cnt / p) / ((a.c / t) * (b.c / t))) AS pmi "
        "FROM bc JOIN uc a ON bc.w1 = a.word JOIN uc b ON bc.w2 = b.word "
        f"CROSS JOIN tot WHERE cnt >= {PMI_MIN_CNT} "
        "ORDER BY pmi DESC, w1, w2 LIMIT 20"
    ),
    "read_json": "SELECT doc_id, lang, n_chars FROM documents",
    # sliding window: each event joins the 4 window indices covering it
    "window_sliding": (
        "SELECT wi * 900 AS window_start, event_type, "
        "count(*) AS n_events FROM ("
        "SELECT event_type, unnest(generate_series("
        "(epoch_us(ts) // 1000000) // 900 - 3, "
        "(epoch_us(ts) // 1000000) // 900)) AS wi "
        "FROM events) GROUP BY wi, event_type"
    ),
    "running_total": (
        "SELECT user_id, event_id, count(*) OVER ("
        "PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS UNBOUNDED PRECEDING) AS running_n FROM events"
    ),
    "heavy_hitters": (
        "SELECT l_partkey, count(*) AS cnt FROM lineitem "
        "GROUP BY l_partkey ORDER BY cnt DESC, l_partkey LIMIT 20"
    ),
    "set_except": (
        "SELECT c_custkey FROM customer "
        "EXCEPT SELECT user_id FROM events"
    ),
    "set_intersect": (
        "SELECT c_custkey FROM customer "
        "INTERSECT SELECT user_id FROM events"
    ),
    "grouped_median": (
        "SELECT l_returnflag, "
        "CAST(quantile_disc(l_quantity, 0.5) AS DOUBLE) AS median_qty "
        "FROM lineitem GROUP BY l_returnflag"
    ),
    "dedup_minhash": _DEDUP_MINHASH_SQL,
    "decontaminate_fuzzy": _DECON_FUZZY_SQL,
    # corpus_prep: the composed prep chain — keeper semi-join against the
    # dedup_minhash mirror, bench + fuzzy-contamination scrub against the
    # decontaminate_fuzzy mirror, the token_count gate, the
    # train_test_split md5 tag. All conjunctive, so order is free.
    "corpus_prep": (
        f"WITH mh AS ({_DEDUP_MINHASH_SQL}), "
        f"cont AS ({_DECON_FUZZY_SQL}), "
        "tok AS (SELECT doc_id, CASE WHEN trim(text) = '' THEN 0 ELSE "
        "len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens "
        "FROM documents) "
        "SELECT t.doc_id, CAST(t.n_tokens AS BIGINT) AS n_tokens, "
        "CASE WHEN md5_number_lower(CAST(t.doc_id AS VARCHAR)) % 10 = 0 "
        "THEN 'test' ELSE 'train' END AS split "
        "FROM tok t JOIN mh ON mh.doc_id = t.doc_id AND mh.is_keeper "
        "WHERE t.doc_id % 31 <> 0 "
        "AND t.doc_id NOT IN (SELECT doc_id FROM cont) "
        "AND t.n_tokens BETWEEN 10 AND 10000"
    ),
    # grouped_stats: the SQL spells out the EXACT tree the finisher computes
    # (mean = s/n, var = sq/n - mean*mean) over order-independent-exact
    # integer-valued sums — bit-identical float64 on both sides
    "grouped_stats": (
        "WITH p AS (SELECT l_returnflag, count(l_quantity) AS n, "
        "sum(l_quantity) AS s, sum(l_quantity * l_quantity) AS sq "
        "FROM lineitem GROUP BY l_returnflag) "
        "SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows, s AS sum_qty, "
        "s / n AS mean_qty, sq / n - (s / n) * (s / n) AS var_qty, "
        "sqrt(sq / n - (s / n) * (s / n)) AS std_qty FROM p"
    ),
    "dedup_keep_best": (
        f"WITH base AS ({_DEDUP_MINHASH_SQL}) "
        "SELECT b.doc_id, b.cluster_id FROM base b "
        "JOIN documents d ON b.doc_id = d.doc_id QUALIFY row_number() "
        "OVER (PARTITION BY b.cluster_id "
        "ORDER BY d.n_chars DESC, b.doc_id) = 1"
    ),
    "dedup_cluster_stats": (
        f"WITH base AS ({_DEDUP_MINHASH_SQL}), "
        "cs AS (SELECT cluster_id, count(*) AS cluster_size FROM base "
        "GROUP BY cluster_id) "
        "SELECT cluster_size, count(*) AS n_clusters, "
        "cluster_size * count(*) AS n_docs FROM cs GROUP BY cluster_size"
    ),
    "embed_neardup": _EMBED_NEARDUP_SQL,
    # Full SQL mirror of the SimHash op: token hash = md5_number_lower
    # (= functions.dedup.md5_lower64), 64 bit-position votes per doc, 4×16-bit
    # banding with the same deterministic 200-per-bucket cap (QUALIFY), exact
    # Hamming verify via bit_count(xor(...)) <= 3.
    "simhash_pairs": (
        "WITH toks AS (SELECT doc_id, tok FROM (SELECT doc_id, "
        "unnest(regexp_split_to_array(trim(lower(coalesce(text,''))), '\\s+')) AS tok "
        "FROM documents) WHERE tok <> ''), "
        "votes AS (SELECT doc_id, b.bit, "
        "sum(CASE WHEN (md5_number_lower(tok) >> b.bit) & 1 = 1 THEN 1 ELSE -1 END) AS v "
        "FROM toks CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS bit) b "
        "GROUP BY doc_id, b.bit), "
        "sh0 AS (SELECT doc_id, CAST(sum(CASE WHEN v > 0 THEN "
        "(CAST(1 AS UBIGINT) << bit) ELSE CAST(0 AS UBIGINT) END) AS UBIGINT) "
        "AS simhash FROM votes GROUP BY doc_id), "
        "sh AS (SELECT d.doc_id, coalesce(s.simhash, CAST(0 AS UBIGINT)) AS simhash "
        "FROM documents d LEFT JOIN sh0 s USING (doc_id)), "
        "banded AS (SELECT doc_id, simhash, b.band, "
        "(simhash >> (16 * b.band)) & 65535 AS band_val "
        "FROM sh CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS band) b), "
        "capped AS (SELECT * FROM banded "
        "QUALIFY row_number() OVER (PARTITION BY band, band_val ORDER BY doc_id) <= 200) "
        "SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, "
        "CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming "
        "FROM capped a JOIN capped b ON a.band = b.band "
        "AND a.band_val = b.band_val AND a.doc_id < b.doc_id "
        "WHERE bit_count(xor(a.simhash, b.simhash)) <= 3"
    ),
    "kmeans_assign": (
        "WITH c AS (SELECT embedding AS ce, row_number() OVER "
        "(ORDER BY vec_id) - 1 AS j FROM embeddings "
        f"QUALIFY row_number() OVER (ORDER BY vec_id) <= {KMEANS_K}) "
        "SELECT vec_id, j AS cluster FROM embeddings e CROSS JOIN c "
        "QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY "
        "list_cosine_similarity(e.embedding, c.ce) DESC, j) = 1"
    ),
    "ann_topk": (
        "WITH q AS (SELECT embedding AS e FROM embeddings "
        "WHERE vec_id = (SELECT min(vec_id) FROM embeddings)) "
        "SELECT vec_id, round(list_cosine_similarity(embedding, (SELECT e FROM q)), 4) "
        "AS score FROM embeddings "
        "ORDER BY list_cosine_similarity(embedding, (SELECT e FROM q)) DESC, vec_id "
        "LIMIT 10"
    ),
    # same result set as ann_topk: n_probe = n_centroids reads every cell →
    # the persisted-index query is exactly brute-force cosine top-10
    "ann_index_topk": (
        "WITH q AS (SELECT embedding AS e FROM embeddings "
        "WHERE vec_id = (SELECT min(vec_id) FROM embeddings)) "
        "SELECT vec_id, round(list_cosine_similarity(embedding, (SELECT e FROM q)), 4) "
        "AS score FROM embeddings "
        "ORDER BY list_cosine_similarity(embedding, (SELECT e FROM q)) DESC, vec_id "
        "LIMIT 10"
    ),
    "transcript_turns": (
        "SELECT 'doc-' || CAST(doc_id AS VARCHAR) AS conv_id, "
        "CAST(idx - 1 AS INTEGER) AS turn_idx, "
        "CASE WHEN (idx - 1) % 2 = 0 THEN 'user' ELSE 'assistant' END AS role, "
        "parts[idx] AS text "
        "FROM (SELECT doc_id, string_split(text, '. ') AS parts FROM documents), "
        "LATERAL (SELECT unnest(generate_series(1, len(parts))) AS idx)"
    ),
    # conversation_stats: same '. '-split derivation as transcript_turns;
    # length() is codepoints on both sides; resp_ratio is one
    # DOUBLE/HUGEINT division of exact integer sums (NULL when the user
    # side is empty — the Ray side masks before dividing).
    "conversation_stats": (
        "WITH t AS (SELECT doc_id, idx - 1 AS turn_idx, parts[idx] AS txt "
        "FROM (SELECT doc_id, string_split(coalesce(text, ''), '. ') "
        "AS parts FROM documents), "
        "LATERAL (SELECT unnest(generate_series(1, len(parts))) AS idx)) "
        "SELECT 'doc-' || CAST(doc_id AS VARCHAR) AS conv_id, "
        "CAST(count(*) AS BIGINT) AS n_turns, "
        "CAST(sum(CASE WHEN turn_idx % 2 = 0 THEN 1 ELSE 0 END) "
        "AS BIGINT) AS n_user, "
        "CAST(sum(CASE WHEN turn_idx % 2 = 1 THEN 1 ELSE 0 END) "
        "AS BIGINT) AS n_assistant, "
        "CAST(sum(CASE WHEN turn_idx % 2 = 0 THEN length(txt) ELSE 0 END) "
        "AS BIGINT) AS user_chars, "
        "CAST(sum(CASE WHEN turn_idx % 2 = 1 THEN length(txt) ELSE 0 END) "
        "AS BIGINT) AS assistant_chars, "
        "CASE WHEN sum(CASE WHEN turn_idx % 2 = 0 THEN length(txt) "
        "ELSE 0 END) = 0 THEN NULL ELSE "
        "CAST(sum(CASE WHEN turn_idx % 2 = 1 THEN length(txt) ELSE 0 END) "
        "AS DOUBLE) / sum(CASE WHEN turn_idx % 2 = 0 THEN length(txt) "
        "ELSE 0 END) END AS resp_ratio "
        "FROM t GROUP BY doc_id"
    ),
    "kg_triples": (
        "WITH turns(turn_idx) AS (VALUES (CAST(0 AS INTEGER)), (CAST(1 AS INTEGER))) "
        "SELECT 'c-' || CAST(c_custkey AS VARCHAR) AS conv_id, turn_idx, "
        "'C' || lpad(CAST(c_custkey AS VARCHAR), 7, '0') AS subj, "
        "'located_in' AS pred, n_name AS obj "
        "FROM customer JOIN nation ON c_nationkey = n_nationkey CROSS JOIN turns "
        "UNION ALL "
        "SELECT 's-' || CAST(s_suppkey AS VARCHAR) AS conv_id, turn_idx, "
        "'S' || lpad(CAST(s_suppkey AS VARCHAR), 7, '0') AS subj, "
        "'located_in' AS pred, n_name AS obj "
        "FROM supplier JOIN nation ON s_nationkey = n_nationkey CROSS JOIN turns"
    ),
    "kg_edges": (
        "SELECT 'C' || lpad(CAST(c_custkey AS VARCHAR), 7, '0') AS src_name, "
        "'located_in' AS pred, n_name AS dst_name, CAST(2 AS BIGINT) AS weight "
        "FROM customer JOIN nation ON c_nationkey = n_nationkey "
        "UNION ALL "
        "SELECT 'S' || lpad(CAST(s_suppkey AS VARCHAR), 7, '0') AS src_name, "
        "'located_in' AS pred, n_name AS dst_name, CAST(2 AS BIGINT) AS weight "
        "FROM supplier JOIN nation ON s_nationkey = n_nationkey"
    ),
    "kg_nodes": (
        "SELECT 'C' || lpad(CAST(c_custkey AS VARCHAR), 7, '0') AS canonical_name, "
        "CAST(2 AS BIGINT) AS n_mentions, CAST(1 AS BIGINT) AS degree FROM customer "
        "UNION ALL "
        "SELECT 'S' || lpad(CAST(s_suppkey AS VARCHAR), 7, '0'), "
        "CAST(2 AS BIGINT), CAST(1 AS BIGINT) FROM supplier "
        "UNION ALL "
        "SELECT n_name, CAST(2 * (cnt_c + cnt_s) AS BIGINT), "
        "CAST(cnt_c + cnt_s AS BIGINT) FROM ("
        "SELECT n_name, "
        "(SELECT count(*) FROM customer WHERE c_nationkey = n_nationkey) AS cnt_c, "
        "(SELECT count(*) FROM supplier WHERE s_nationkey = n_nationkey) AS cnt_s "
        "FROM nation) WHERE cnt_c + cnt_s > 0"
    ),
    # every QUERIES entry above has a full value-exact oracle — including
    # dedup_minhash (banding + Jaccard + recursive-CTE clustering),
    # simhash_pairs, embed_neardup (literal hyperplanes) and lang_guess.
    "kg_components": (
        "WITH RECURSIVE base AS ("
        "SELECT 'cust:' || CAST(c_custkey AS VARCHAR) AS a, "
        "'nat:' || CAST(c_nationkey AS VARCHAR) AS b FROM customer "
        "UNION ALL "
        "SELECT 'sup:' || CAST(s_suppkey AS VARCHAR), "
        "'nat:' || CAST(s_nationkey AS VARCHAR) FROM supplier), "
        "sym AS (SELECT a, b FROM base UNION SELECT b, a FROM base), "
        "reach AS ("
        "SELECT a AS n, a AS m FROM sym "
        "UNION "
        "SELECT r.n, s.b AS m FROM reach r JOIN sym s ON s.a = r.m) "
        "SELECT n AS node, min(m) AS component FROM reach GROUP BY n"
    ),
    "pagerank": (
        "WITH raw AS (" + _COSUPPLY_RAW + "), "
        "e AS (SELECT DISTINCT u, v FROM raw WHERE u <> v), "
        "nodes AS (SELECT u AS n FROM e UNION SELECT v AS n FROM e), "
        "od AS (SELECT u AS n, count(*) AS d FROM e GROUP BY u), "
        "r0 AS (SELECT n, CAST(1000000000000 AS BIGINT) AS r FROM nodes), "
        "s1 AS (SELECT e.v AS n, SUM(r0.r // od.d) AS c FROM e "
        "JOIN r0 ON r0.n = e.u JOIN od ON od.n = e.u GROUP BY e.v), "
        "r1 AS (SELECT nodes.n AS n, 150000000000 + "
        "(85 * COALESCE(s1.c, 0)) // 100 AS r "
        "FROM nodes LEFT JOIN s1 ON s1.n = nodes.n), "
        "s2 AS (SELECT e.v AS n, SUM(r1.r // od.d) AS c FROM e "
        "JOIN r1 ON r1.n = e.u JOIN od ON od.n = e.u GROUP BY e.v), "
        "r2 AS (SELECT nodes.n AS n, 150000000000 + "
        "(85 * COALESCE(s2.c, 0)) // 100 AS r "
        "FROM nodes LEFT JOIN s2 ON s2.n = nodes.n), "
        "s3 AS (SELECT e.v AS n, SUM(r2.r // od.d) AS c FROM e "
        "JOIN r2 ON r2.n = e.u JOIN od ON od.n = e.u GROUP BY e.v), "
        "r3 AS (SELECT nodes.n AS n, 150000000000 + "
        "(85 * COALESCE(s3.c, 0)) // 100 AS r "
        "FROM nodes LEFT JOIN s3 ON s3.n = nodes.n) "
        "SELECT n AS node, CAST(r AS BIGINT) AS pr FROM r3"
    ),
    "triangle_count": (
        "WITH raw AS (" + _COSUPPLY_RAW + "), "
        "e AS (SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b "
        "FROM raw WHERE u <> v) "
        "SELECT count(*) AS n_triangles FROM e e1 "
        "JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b "
        "JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b"
    ),
    "degree_assortativity": (
        "WITH raw AS (" + _COSUPPLY_RAW + "), "
        "e AS (SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b "
        "FROM raw WHERE u <> v), "
        "deg AS (SELECT node, count(*) AS d FROM ("
        "SELECT a AS node FROM e UNION ALL SELECT b FROM e) "
        "GROUP BY node), "
        "ej AS (SELECT da.d AS j, db.d AS k FROM e "
        "JOIN deg da ON da.node = e.a JOIN deg db ON db.node = e.b), "
        "s AS (SELECT count(*) AS m, sum(j * k) AS s_jk, "
        "sum(j + k) AS s_sum, sum(j * j + k * k) AS s_sq FROM ej), "
        "c AS (SELECT m, CAST(s_jk AS DOUBLE) / m AS t1, "
        "CAST(s_sum AS DOUBLE) / (2 * m) AS mu, "
        "CAST(s_sq AS DOUBLE) / (2 * m) AS t2 FROM s) "
        "SELECT CAST(m AS BIGINT) AS n_edges, "
        "CASE WHEN t2 - mu * mu = 0 THEN NULL "
        "ELSE (t1 - mu * mu) / (t2 - mu * mu) END AS r FROM c"
    ),
    "clustering_coeff": (
        "WITH raw AS (" + _COSUPPLY_RAW + "), "
        "e AS (SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b "
        "FROM raw WHERE u <> v), "
        "tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z FROM e e1 "
        "JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b "
        "JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b), "
        "tn AS (SELECT node, count(*) AS n_tri FROM ("
        "SELECT x AS node FROM tri UNION ALL SELECT y FROM tri "
        "UNION ALL SELECT z FROM tri) GROUP BY node), "
        "deg AS (SELECT node, count(*) AS degree FROM ("
        "SELECT a AS node FROM e UNION ALL SELECT b FROM e) "
        "GROUP BY node) "
        "SELECT d.node, CAST(d.degree AS BIGINT) AS degree, "
        "CAST(coalesce(tn.n_tri, 0) AS BIGINT) AS n_tri, "
        "CASE WHEN d.degree >= 2 THEN (2.0 * coalesce(tn.n_tri, 0)) / "
        "(CAST(d.degree AS DOUBLE) * (d.degree - 1)) ELSE 0.0 END AS coeff "
        "FROM deg d LEFT JOIN tn ON tn.node = d.node"
    ),
    # edge_jaccard: n_common = triangles through the edge (each triangle
    # x<y<z credits its three ordered pairs); jaccard is one DOUBLE/BIGINT
    # division of exact integers — the identical IEEE tree on both sides.
    # reciprocity: exact integer counts through one float division —
    # both sides spell n_recip/n_out identically, so bits match.
    "reciprocity": (
        "WITH raw AS (" + _COSUPPLY_RAW + "), "
        "e AS (SELECT DISTINCT u, v FROM raw WHERE u <> v), "
        "r AS (SELECT e.u, e.v, CASE WHEN e2.u IS NOT NULL THEN 1 ELSE 0 "
        "END AS rec FROM e LEFT JOIN e e2 "
        "ON e2.u = e.v AND e2.v = e.u) "
        "SELECT u AS node, CAST(count(*) AS BIGINT) AS n_out, "
        "CAST(sum(rec) AS BIGINT) AS n_recip, "
        "CAST(sum(rec) AS DOUBLE) / CAST(count(*) AS DOUBLE) "
        "AS recip_ratio FROM r GROUP BY u"
    ),
    "edge_jaccard": (
        "WITH raw AS (" + _COSUPPLY_RAW + "), "
        "e AS (SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b "
        "FROM raw WHERE u <> v), "
        "tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z FROM e e1 "
        "JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b "
        "JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b), "
        "pe AS (SELECT p, q, count(*) AS n FROM ("
        "SELECT x AS p, y AS q FROM tri "
        "UNION ALL SELECT x, z FROM tri "
        "UNION ALL SELECT y, z FROM tri) GROUP BY p, q), "
        "deg AS (SELECT node, count(*) AS d FROM ("
        "SELECT a AS node FROM e UNION ALL SELECT b FROM e) "
        "GROUP BY node) "
        "SELECT e.a AS u, e.b AS v, CAST(da.d AS BIGINT) AS deg_u, "
        "CAST(db.d AS BIGINT) AS deg_v, "
        "CAST(coalesce(pe.n, 0) AS BIGINT) AS n_common, "
        "CAST(coalesce(pe.n, 0) AS DOUBLE) / "
        "(da.d + db.d - coalesce(pe.n, 0)) AS jaccard "
        "FROM e JOIN deg da ON da.node = e.a "
        "JOIN deg db ON db.node = e.b "
        "LEFT JOIN pe ON pe.p = e.a AND pe.q = e.b"
    ),
    # link_predict_ra: fixed-point RA index — scale // deg(apex) is exact
    # integer division on both sides, the sum is order-independent; the
    # apex-degree cap (2 ≤ d ≤ 1000) is part of the op's contract.
    "link_predict_ra": (
        "WITH raw AS (" + _COSUPPLY_RAW + "), "
        "e AS (SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b "
        "FROM raw WHERE u <> v), "
        "deg AS (SELECT node, count(*) AS d FROM ("
        "SELECT a AS node FROM e UNION ALL SELECT b FROM e) "
        "GROUP BY node), "
        "adj AS (SELECT a AS apex, b AS nb FROM e "
        "UNION ALL SELECT b, a FROM e), "
        "aw AS (SELECT adj.apex, adj.nb, deg.d FROM adj "
        "JOIN deg ON deg.node = adj.apex "
        "WHERE deg.d >= 2 AND deg.d <= 1000), "
        "w AS (SELECT a1.nb AS u, a2.nb AS v, a1.d AS d FROM aw a1 "
        "JOIN aw a2 ON a2.apex = a1.apex AND a1.nb < a2.nb) "
        "SELECT w.u, w.v, CAST(count(*) AS BIGINT) AS n_common, "
        "CAST(sum(1000000000000 // w.d) AS BIGINT) AS ra_score "
        "FROM w WHERE NOT EXISTS (SELECT 1 FROM e "
        "WHERE e.a = w.u AND e.b = w.v) "
        "GROUP BY w.u, w.v"
    ),
    "khop": (
        "WITH raw AS (" + _COSUPPLY_RAW + "), "
        "e AS (SELECT DISTINCT u, v FROM raw WHERE u <> v), "
        "f0 AS (SELECT CAST(1 AS BIGINT) AS n, CAST(0 AS BIGINT) AS h), "
        "f1 AS (SELECT DISTINCT e.v AS n, CAST(1 AS BIGINT) AS h "
        "FROM e JOIN f0 ON e.u = f0.n), "
        "f2 AS (SELECT DISTINCT e.v AS n, CAST(2 AS BIGINT) AS h "
        "FROM e JOIN f1 ON e.u = f1.n), "
        "f3 AS (SELECT DISTINCT e.v AS n, CAST(3 AS BIGINT) AS h "
        "FROM e JOIN f2 ON e.u = f2.n) "
        "SELECT n AS node, min(h) AS hops FROM ("
        "SELECT n, h FROM f0 UNION ALL SELECT n, h FROM f1 "
        "UNION ALL SELECT n, h FROM f2 UNION ALL SELECT n, h FROM f3) u "
        "GROUP BY n"
    ),
    "left_join": (
        "SELECT c.c_custkey, c.c_mktsegment, "
        "coalesce(o.n_orders, 0) AS n_orders, "
        "round(coalesce(o.revenue, 0.0), 2) AS revenue "
        "FROM customer c LEFT JOIN ("
        "SELECT o_custkey, count(*) AS n_orders, "
        "sum(o_totalprice) AS revenue FROM orders GROUP BY o_custkey) o "
        "ON o.o_custkey = c.c_custkey"
    ),
    "wordcount": (
        "WITH toks AS (SELECT unnest(list_filter("
        "regexp_split_to_array(trim(lower(coalesce(text,''))), '\\s+'), "
        "x -> x <> '')) AS word FROM documents) "
        "SELECT word, count(*) AS cnt FROM toks GROUP BY word "
        "ORDER BY cnt DESC, word LIMIT 100"
    ),
    # vocab_coverage: same tokenization + top-V ranking as wordcount; the
    # oov_rate division tree (DOUBLE n_oov / n_tokens over exact integer
    # counts) matches the numpy expression bit-for-bit
    "vocab_coverage": (
        "WITH toks AS (SELECT doc_id, unnest(list_filter("
        "regexp_split_to_array(trim(lower(coalesce(text,''))), '\\s+'), "
        "x -> x <> '')) AS word FROM documents), "
        "vocab AS (SELECT word FROM (SELECT word, count(*) AS cnt "
        "FROM toks GROUP BY word ORDER BY cnt DESC, word LIMIT 20)), "
        "per AS (SELECT doc_id, count(*) AS n_tokens, "
        "sum(CASE WHEN word NOT IN (SELECT word FROM vocab) "
        "THEN 1 ELSE 0 END) AS n_oov FROM toks GROUP BY doc_id) "
        "SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, "
        "CAST(n_oov AS BIGINT) AS n_oov, "
        "CAST(n_oov AS DOUBLE) / n_tokens AS oov_rate "
        "FROM per WHERE n_tokens > 0"
    ),
    # length_quantiles: percentile rank is pure integer arithmetic,
    # k_p = (n·p + 99) // 100 (= ceil(n·p/100)); value = smallest n_tok
    # whose cumulative count reaches k_p — no float anywhere, exact by
    # construction. Same oracle-locked tokenization as wordcount.
    "length_quantiles": (
        "WITH per AS (SELECT source, len(list_filter("
        "regexp_split_to_array(trim(lower(coalesce(text,''))), '\\s+'), "
        "x -> x <> '')) AS n_tok FROM documents), "
        "g AS (SELECT source, n_tok, count(*) AS c FROM per "
        "GROUP BY source, n_tok), "
        "cum AS (SELECT source, n_tok, "
        "sum(c) OVER (PARTITION BY source ORDER BY n_tok) AS cum, "
        "sum(c) OVER (PARTITION BY source) AS n FROM g) "
        "SELECT source, CAST(max(n) AS BIGINT) AS n_docs, "
        "CAST(min(CASE WHEN cum >= (n * 50 + 99) // 100 THEN n_tok END) "
        "AS BIGINT) AS p50, "
        "CAST(min(CASE WHEN cum >= (n * 90 + 99) // 100 THEN n_tok END) "
        "AS BIGINT) AS p90, "
        "CAST(min(CASE WHEN cum >= (n * 99 + 99) // 100 THEN n_tok END) "
        "AS BIGINT) AS p99 "
        "FROM cum GROUP BY source"
    ),
    # token_entropy: H = ln(n) - (Σ c·floor(SCALE·ln c))/(n·SCALE) —
    # the Σ is exact int64 (order-independent), the two float ops per
    # output row are the identical tree, so entropy hashes bit-for-bit.
    "token_entropy": (
        "WITH w AS (SELECT doc_id, list_filter(regexp_split_to_array("
        "trim(lower(coalesce(text,''))), '\\s+'), x -> x <> '') AS ws "
        "FROM documents), "
        "cw AS (SELECT doc_id, word, count(*) AS c FROM "
        "(SELECT doc_id, unnest(ws) AS word FROM w) GROUP BY doc_id, word), "
        "per AS (SELECT doc_id, sum(c) AS n, sum(c * CAST(floor("
        f"{LM_FP_SCALE} * ln(CAST(c AS DOUBLE))) AS BIGINT)) AS fp "
        "FROM cw GROUP BY doc_id) "
        "SELECT doc_id, CAST(n AS BIGINT) AS n_tokens, "
        "ln(CAST(n AS DOUBLE)) - CAST(fp AS DOUBLE) / "
        f"(CAST(n AS DOUBLE) * {float(LM_FP_SCALE)}) AS entropy FROM per"
    ),
    # zscore_by_group: mean/std/z share grouped_stats' exact IEEE tree
    # over exact integer sums, so z hashes bit-identical.
    "zscore_by_group": (
        "WITH p AS (SELECT source, count(n_chars) AS n, "
        "sum(n_chars) AS s, sum(n_chars * n_chars) AS sq "
        "FROM documents GROUP BY source), "
        "c AS (SELECT source, s / n AS mean, "
        "sqrt(sq / n - (s / n) * (s / n)) AS std FROM p) "
        "SELECT d.doc_id, d.source, d.n_chars, "
        "(CAST(d.n_chars AS DOUBLE) - c.mean) / c.std AS z "
        "FROM documents d JOIN c ON d.source = c.source WHERE c.std > 0"
    ),
    "full_join": (
        "SELECT coalesce(c.c_custkey, e.user_id) AS user_key, "
        "coalesce(c.c_mktsegment, '(none)') AS c_mktsegment, "
        "coalesce(e.n_events, 0) AS n_events "
        "FROM customer c FULL JOIN (SELECT user_id, count(*) AS n_events "
        "FROM events GROUP BY user_id) e ON e.user_id = c.c_custkey"
    ),
    # normalize_text: both sides are RE2 (Arrow replace_substring_regex /
    # DuckDB 'g'-flag regexp_replace), so normalized strings are
    # byte-identical; length is codepoints on both sides.
    "normalize_text": (
        "WITH n AS (SELECT doc_id, trim(regexp_replace(regexp_replace("
        "lower(coalesce(text,'')), '[^a-z0-9\\s]+', ' ', 'g'), "
        "'\\s+', ' ', 'g')) AS norm_text FROM documents) "
        "SELECT doc_id, norm_text, "
        "CAST(length(norm_text) AS BIGINT) AS n_chars_norm "
        "FROM n WHERE norm_text <> ''"
    ),
    # bpe_merge_pairs: DuckDB substr/len are codepoint-based, matching
    # Arrow's utf8_slice_codeunits / utf8_length on valid UTF-8.
    "bpe_merge_pairs": (
        "WITH uc AS (SELECT word, count(*) AS c FROM (SELECT unnest("
        "list_filter(regexp_split_to_array(trim(lower(coalesce(text,''))), "
        "'\\s+'), x -> x <> '')) AS word FROM documents) GROUP BY word) "
        "SELECT pair, sum(c) AS cnt FROM ("
        "SELECT substr(word, i, 2) AS pair, c FROM uc, "
        "unnest(generate_series(1, len(word) - 1)) AS t(i)) "
        "GROUP BY pair ORDER BY cnt DESC, pair LIMIT 20"
    ),
    # lm_bigram_score: same oracle serves both scoring paths (the _join
    # variant is the same function with the broadcast gate forced shut).
    # Fixed-point fp = (SCALE·(c12+1)) // (c1+V) keeps the distributed sum
    # exact-integer; the one float op is the final division.
    "lm_bigram_score": _LM_ORACLE_SQL,
    "lm_bigram_score_join": _LM_ORACLE_SQL,
    "pivot_counts": (
        "SELECT date_trunc('day', ts) AS day, "
        + ", ".join(
            f"count(*) FILTER (WHERE event_type = '{et}') AS n_{et}"
            for et in _EVENT_TYPES
        )
        + " FROM events GROUP BY 1"
    ),
    "count_distinct": (
        "SELECT event_type, count(DISTINCT user_id) AS n_users "
        "FROM events GROUP BY event_type"
    ),
    "range_join": (
        "WITH bands(band, lo, hi) AS (VALUES "
        + ", ".join(
            f"('{n}', {lo!r}, {(1e308 if hi == float('inf') else hi)!r})"
            for n, lo, hi in _PRICE_BANDS
        )
        + ") SELECT b.band, round(sum(o.o_totalprice), 2) AS revenue, "
        "count(*) AS n_orders FROM orders o JOIN bands b "
        "ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi GROUP BY b.band"
    ),
    "rollup_agg": (
        "SELECT CASE WHEN GROUPING(lang) = 1 THEN 'ALL' ELSE lang END "
        "AS lang, "
        "CASE WHEN GROUPING(source) = 1 THEN 'ALL' ELSE source END "
        "AS source, count(*) AS n_docs, "
        "CAST(sum(n_chars) AS BIGINT) AS sum_chars "
        "FROM documents GROUP BY ROLLUP(lang, source)"
    ),
    "ngram_jaccard": (
        "WITH docs AS (SELECT doc_id, lower(coalesce(text,'')) AS t "
        "FROM documents), "
        "shing AS (SELECT DISTINCT doc_id, substr(t, i, 5) AS s FROM docs, "
        "LATERAL (SELECT unnest(generate_series(1, len(t) - 4)) AS i) "
        "WHERE len(t) >= 5 "
        "UNION SELECT doc_id, t FROM docs WHERE len(t) > 0 AND len(t) < 5), "
        "pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b "
        "FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1), "
        "nsh AS (SELECT doc_id, count(*) AS n FROM shing GROUP BY doc_id), "
        "common AS (SELECT p.doc_a, p.doc_b, count(*) AS nc FROM pairs p "
        "JOIN shing sa ON sa.doc_id = p.doc_a "
        "JOIN shing sb ON sb.doc_id = p.doc_b AND sb.s = sa.s "
        "GROUP BY p.doc_a, p.doc_b) "
        "SELECT p.doc_a, p.doc_b, coalesce(cm.nc, 0) AS n_common, "
        "coalesce(na.n, 0) + coalesce(nb.n, 0) - coalesce(cm.nc, 0) "
        "AS n_union "
        "FROM pairs p LEFT JOIN nsh na ON na.doc_id = p.doc_a "
        "LEFT JOIN nsh nb ON nb.doc_id = p.doc_b "
        "LEFT JOIN common cm ON cm.doc_a = p.doc_a AND cm.doc_b = p.doc_b"
    ),
    "regex_extract": (
        "SELECT event_type, CAST(sum(coalesce(CAST(NULLIF("
        "regexp_extract(coalesce(props, ''), '\"k\":\\s*(\\d+)', 1), '') "
        "AS BIGINT), 0)) AS BIGINT) AS sum_k, count(*) AS n_events "
        "FROM events GROUP BY event_type"
    ),
    "grouped_quantiles": (
        "SELECT l_returnflag, quantile_disc(l_quantity, 0.25) AS p25, "
        "quantile_disc(l_quantity, 0.5) AS p50, "
        "quantile_disc(l_quantity, 0.9) AS p90 "
        "FROM lineitem GROUP BY l_returnflag"
    ),
    "semi_join": (
        "SELECT c_custkey, c_name FROM customer "
        "WHERE c_custkey IN (SELECT o_custkey FROM orders)"
    ),
    "histogram": (
        "SELECT CAST(floor(o_totalprice / 25000.0) AS BIGINT) AS bin, "
        "count(*) AS n_orders FROM orders GROUP BY 1"
    ),
    "mode_per_group": (
        "SELECT user_id, event_type, cnt FROM ("
        "SELECT user_id, event_type, count(*) AS cnt, "
        "row_number() OVER (PARTITION BY user_id "
        "ORDER BY count(*) DESC, event_type) AS rn "
        "FROM events GROUP BY user_id, event_type) WHERE rn = 1"
    ),
    "stratified_sample": (
        "SELECT lang, doc_id FROM ("
        "SELECT lang, doc_id, row_number() OVER (PARTITION BY lang "
        "ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn "
        "FROM documents) WHERE rn <= 10"
    ),
    "dense_rank": (
        "SELECT event_id, user_id, CAST(dense_rank() OVER ("
        "PARTITION BY user_id ORDER BY ts) AS BIGINT) AS rnk FROM events"
    ),
    "lag_delta": (
        "WITH d AS (SELECT user_id, epoch_us(ts) - epoch_us(lag(ts) OVER ("
        "PARTITION BY user_id ORDER BY ts, event_id)) AS gap FROM events) "
        "SELECT user_id, count(gap) AS n_gaps, "
        "CAST(max(gap) AS BIGINT) AS max_gap_us, "
        "CAST(sum(gap) AS BIGINT) AS span_us "
        "FROM d WHERE gap IS NOT NULL GROUP BY user_id"
    ),
    "cooccurrence": (
        "SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, "
        "count(*) AS cnt FROM lineitem a JOIN lineitem b "
        "ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey "
        "GROUP BY 1, 2 ORDER BY cnt DESC, part_a, part_b LIMIT 100"
    ),
    "funnel_counts": (
        "WITH v AS (SELECT user_id, min(ts) AS t1 FROM events "
        "WHERE event_type = 'view' GROUP BY user_id), "
        "c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e "
        "JOIN v ON e.user_id = v.user_id "
        "WHERE e.event_type = 'click' AND e.ts >= v.t1 GROUP BY e.user_id), "
        "p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e "
        "JOIN c ON e.user_id = c.user_id "
        "WHERE e.event_type = 'purchase' AND e.ts >= c.t2 GROUP BY e.user_id) "
        "SELECT 'view' AS stage, (SELECT count(*) FROM v) AS n_users "
        "UNION ALL SELECT 'click', (SELECT count(*) FROM c) "
        "UNION ALL SELECT 'purchase', (SELECT count(*) FROM p)"
    ),
    "inverted_index": (
        "WITH toks AS (SELECT doc_id, unnest(list_filter("
        "regexp_split_to_array(trim(lower(coalesce(text,''))), '\\s+'), "
        "x -> x <> '')) AS word FROM documents), "
        "pairs AS (SELECT DISTINCT word, doc_id FROM toks), "
        "ranked AS (SELECT word, doc_id, row_number() OVER ("
        "PARTITION BY word ORDER BY doc_id) AS rn FROM pairs) "
        "SELECT word, count(*) AS df, string_agg("
        "CASE WHEN rn <= 10 THEN CAST(doc_id AS VARCHAR) END, ',' "
        "ORDER BY doc_id) AS top_docs FROM ranked GROUP BY word"
    ),
    "cube_agg": (
        "SELECT CASE WHEN GROUPING(lang) = 1 THEN 'ALL' ELSE lang END "
        "AS lang, "
        "CASE WHEN GROUPING(source) = 1 THEN 'ALL' ELSE source END "
        "AS source, count(*) AS n_docs, "
        "CAST(sum(n_chars) AS BIGINT) AS sum_chars "
        "FROM documents GROUP BY CUBE(lang, source)"
    ),
    "repetition_stats": (
        "WITH w AS (SELECT doc_id, list_filter(string_split_regex("
        "trim(lower(coalesce(text,''))), '\\s+'), x -> x <> '') AS ws "
        "FROM documents), "
        "tok AS (SELECT doc_id, unnest(ws) AS word FROM w), "
        "base AS (SELECT doc_id, count(*) AS n_tokens, "
        "count(DISTINCT word) AS n_distinct FROM tok GROUP BY doc_id), "
        "bg AS (SELECT doc_id, unnest(list_transform("
        "generate_series(1, len(ws) - 1), i -> ws[i] || ' ' || ws[i+1])) "
        "AS bigram FROM w WHERE len(ws) >= 2), "
        "bgm AS (SELECT doc_id, max(c) AS top_bigram_cnt FROM ("
        "SELECT doc_id, bigram, count(*) AS c FROM bg "
        "GROUP BY doc_id, bigram) GROUP BY doc_id) "
        "SELECT b.doc_id, b.n_tokens, b.n_distinct, "
        "b.n_tokens - b.n_distinct AS dup_tokens, "
        "coalesce(bgm.top_bigram_cnt, 0) AS top_bigram_cnt "
        "FROM base b LEFT JOIN bgm ON b.doc_id = bgm.doc_id"
    ),
    "read_csv": (
        "SELECT c_custkey, c_nationkey, c_acctbal, c_mktsegment "
        "FROM customer"
    ),
    "ntile": (
        "SELECT event_id, user_id, CAST(ntile(4) OVER ("
        "PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS tile "
        "FROM events"
    ),
    "first_last": (
        "SELECT DISTINCT user_id, first_value(event_type) OVER w "
        "AS first_type, last_value(event_type) OVER w AS last_type "
        "FROM events WINDOW w AS (PARTITION BY user_id "
        "ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING "
        "AND UNBOUNDED FOLLOWING)"
    ),
    "approx_distinct": (
        "WITH h AS (SELECT DISTINCT ('0x' || substr(md5("
        "CAST(o_custkey AS VARCHAR)), 1, 8))::BIGINT AS h32 FROM orders), "
        "r AS (SELECT h32, row_number() OVER (ORDER BY h32) AS rn FROM h), "
        "n AS (SELECT count(*) AS nd FROM h) "
        "SELECT 256 AS k_used, "
        "CASE WHEN nd >= 256 THEN (SELECT h32 FROM r WHERE rn = 256) "
        "ELSE NULL END AS kth_min, "
        "CASE WHEN nd >= 256 THEN "
        "255 * 4294967296 // (SELECT h32 FROM r WHERE rn = 256) "
        "ELSE nd END AS est_distinct FROM n"
    ),
    "retention": (
        "WITH d AS (SELECT DISTINCT user_id, "
        "epoch_us(ts) // 604800000000 AS week FROM events), "
        "c AS (SELECT user_id, min(week) AS cw FROM d GROUP BY user_id) "
        "SELECT c.cw AS cohort_week, d.week - c.cw AS week_offset, "
        "count(*) AS n_users FROM d JOIN c ON d.user_id = c.user_id "
        "GROUP BY 1, 2"
    ),
    "percent_rank": (
        "SELECT event_id, user_id, CAST(rank() OVER w - 1 AS BIGINT) "
        "AS rank_minus_1, CAST(count(*) OVER ("
        "PARTITION BY user_id) - 1 AS BIGINT) AS n_minus_1 "
        "FROM events WINDOW w AS (PARTITION BY user_id "
        "ORDER BY ts, event_id)"
    ),
    "multimodal_meta": (
        "SELECT doc_id, CAST(octet_length(encode(coalesce(text, ''))) "
        "AS BIGINT) AS n_bytes, "
        "('0x' || substr(md5(coalesce(text, '')), 1, 8))::BIGINT AS h32 "
        "FROM documents"
    ),
    "multi_join": (
        "SELECT n_name, round(sum(o_totalprice), 2) AS revenue, "
        "count(*) AS n_orders FROM orders "
        "JOIN customer ON o_custkey = c_custkey "
        "JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name"
    ),
    "validate": (
        "SELECT count(*) AS n_rows, "
        "CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) "
        "AS BIGINT) AS n_null_key, "
        "CAST(sum(CASE WHEN o_custkey IS NOT NULL AND o_custkey NOT IN "
        "(SELECT c_custkey FROM customer) THEN 1 ELSE 0 END) "
        "AS BIGINT) AS n_orphans, "
        "CAST(sum(CASE WHEN coalesce(o_totalprice, 0) <= 0 THEN 1 "
        "ELSE 0 END) AS BIGINT) AS n_bad_price FROM orders"
    ),
    "group_concat": (
        "SELECT user_id, string_agg(DISTINCT event_type, ',' "
        "ORDER BY event_type) AS types FROM events GROUP BY user_id"
    ),
    "union": (
        "SELECT n_name AS name FROM nation "
        "UNION SELECT r_name AS name FROM region"
    ),
    "latest_per_key": (
        "SELECT user_id, event_id, event_type FROM ("
        "SELECT user_id, event_id, event_type, row_number() OVER ("
        "PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn "
        "FROM events) WHERE rn = 1"
    ),
    "except_all": (
        "WITH d AS (SELECT c_nationkey AS k FROM customer "
        "EXCEPT ALL SELECT s_nationkey AS k FROM supplier) "
        "SELECT k, count(*) AS multiplicity FROM d GROUP BY k"
    ),
    "session_stats": (
        "WITH g AS (SELECT user_id, ts, CASE WHEN lag(ts) OVER w IS NULL "
        "OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END "
        "AS brk FROM events WINDOW w AS (PARTITION BY user_id "
        "ORDER BY ts)), "
        "s AS (SELECT user_id, ts, sum(brk) OVER (PARTITION BY user_id "
        "ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid FROM g), "
        "d AS (SELECT user_id, sid, epoch_us(max(ts)) - epoch_us(min(ts)) "
        "AS dur FROM s GROUP BY user_id, sid) "
        "SELECT user_id, count(*) AS n_sessions, "
        "CAST(sum(dur) AS BIGINT) AS total_dur_us, "
        "CAST(max(dur) AS BIGINT) AS max_dur_us FROM d GROUP BY user_id"
    ),
    "intersect_all": (
        "WITH d AS (SELECT c_nationkey AS k FROM customer "
        "INTERSECT ALL SELECT s_nationkey AS k FROM supplier) "
        "SELECT k, count(*) AS multiplicity FROM d GROUP BY k"
    ),
    "pair_similarity": "WITH s AS (SELECT user_id, string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS tset FROM events GROUP BY user_id), h AS (SELECT tset, count(*) AS n FROM s GROUP BY tset) SELECT a.tset AS set_a, b.tset AS set_b, CAST(len(list_intersect(string_split(a.tset, ','), string_split(b.tset, ','))) AS BIGINT) AS n_common, CAST(len(list_distinct(list_concat(string_split(a.tset, ','), string_split(b.tset, ',')))) AS BIGINT) AS n_union, CAST(CASE WHEN a.tset = b.tset THEN a.n * (a.n - 1) // 2 ELSE a.n * b.n END AS BIGINT) AS n_pairs FROM h a JOIN h b ON a.tset <= b.tset",
    "profile": "WITH h_l_orderkey AS (SELECT DISTINCT ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 8))::BIGINT AS h32 FROM lineitem WHERE l_orderkey IS NOT NULL), r_l_orderkey AS (SELECT h32, row_number() OVER (ORDER BY h32) AS rn FROM h_l_orderkey), n_l_orderkey AS (SELECT count(*) AS nd FROM h_l_orderkey), h_l_partkey AS (SELECT DISTINCT ('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 8))::BIGINT AS h32 FROM lineitem WHERE l_partkey IS NOT NULL), r_l_partkey AS (SELECT h32, row_number() OVER (ORDER BY h32) AS rn FROM h_l_partkey), n_l_partkey AS (SELECT count(*) AS nd FROM h_l_partkey), h_l_suppkey AS (SELECT DISTINCT ('0x' || substr(md5(CAST(l_suppkey AS VARCHAR)), 1, 8))::BIGINT AS h32 FROM lineitem WHERE l_suppkey IS NOT NULL), r_l_suppkey AS (SELECT h32, row_number() OVER (ORDER BY h32) AS rn FROM h_l_suppkey), n_l_suppkey AS (SELECT count(*) AS nd FROM h_l_suppkey) SELECT 'l_orderkey' AS col, (SELECT count(*) FROM lineitem) AS n_rows, CAST((SELECT count(*) FROM lineitem WHERE l_orderkey IS NULL) AS BIGINT) AS n_nulls, CAST(CASE WHEN (SELECT nd FROM n_l_orderkey) >= 256 THEN 255 * 4294967296 // (SELECT h32 FROM r_l_orderkey WHERE rn = 256) ELSE (SELECT nd FROM n_l_orderkey) END AS BIGINT) AS est_distinct UNION ALL SELECT 'l_partkey' AS col, (SELECT count(*) FROM lineitem) AS n_rows, CAST((SELECT count(*) FROM lineitem WHERE l_partkey IS NULL) AS BIGINT) AS n_nulls, CAST(CASE WHEN (SELECT nd FROM n_l_partkey) >= 256 THEN 255 * 4294967296 // (SELECT h32 FROM r_l_partkey WHERE rn = 256) ELSE (SELECT nd FROM n_l_partkey) END AS BIGINT) AS est_distinct UNION ALL SELECT 'l_suppkey' AS col, (SELECT count(*) FROM lineitem) AS n_rows, CAST((SELECT count(*) FROM lineitem WHERE l_suppkey IS NULL) AS BIGINT) AS n_nulls, CAST(CASE WHEN (SELECT nd FROM n_l_suppkey) >= 256 THEN 255 * 4294967296 // (SELECT h32 FROM r_l_suppkey WHERE rn = 256) ELSE (SELECT nd FROM n_l_suppkey) END AS BIGINT) AS est_distinct",
    "weekday_hour": (
        "SELECT isodow(ts) AS dow, CAST(hour(ts) AS BIGINT) AS hour, "
        "count(*) AS n_events FROM events GROUP BY 1, 2"
    ),
    "rolling_count": (
        "SELECT event_id, CAST(count(*) OVER (PARTITION BY user_id "
        "ORDER BY ts RANGE BETWEEN INTERVAL 1 HOUR PRECEDING "
        "AND CURRENT ROW) AS BIGINT) AS cnt_1h FROM events"
    ),
    "daily_series": (
        "WITH c AS (SELECT date_trunc('day', ts) AS day, count(*) AS n "
        "FROM events GROUP BY 1), "
        "r AS (SELECT unnest(generate_series((SELECT min(day) FROM c), "
        "(SELECT max(day) FROM c), INTERVAL 1 DAY)) AS day) "
        "SELECT r.day, CAST(coalesce(c.n, 0) AS BIGINT) AS n_events "
        "FROM r LEFT JOIN c ON r.day = c.day"
    ),
    "time_to_convert": (
        "WITH v AS (SELECT user_id, min(ts) AS t_view FROM events "
        "WHERE event_type = 'view' GROUP BY user_id), "
        "p AS (SELECT e.user_id, min(e.ts) AS t_buy FROM events e "
        "JOIN v ON e.user_id = v.user_id WHERE e.event_type = 'purchase' "
        "AND e.ts >= v.t_view GROUP BY e.user_id) "
        "SELECT p.user_id, epoch_us(p.t_buy) - epoch_us(v.t_view) "
        "AS ttc_us FROM p JOIN v ON p.user_id = v.user_id"
    ),
    "bigram_top": (
        "WITH w AS (SELECT list_filter(regexp_split_to_array("
        "trim(lower(coalesce(text,''))), '\\s+'), x -> x <> '') AS ws "
        "FROM documents), "
        "bg AS (SELECT unnest(list_transform(generate_series(1, "
        "len(ws) - 1), i -> ws[i] || ' ' || ws[i+1])) AS bigram FROM w "
        "WHERE len(ws) >= 2) "
        "SELECT bigram, count(*) AS cnt FROM bg GROUP BY bigram "
        "ORDER BY cnt DESC, bigram LIMIT 20"
    ),
    "sssp": (
        "WITH raw AS (" + _COSUPPLY_RAW + "), "
        "e AS (SELECT DISTINCT u, v FROM raw WHERE u <> v), "
        "w AS (SELECT u, v, 1 + (u + v) % 5 AS w FROM e), "
        "nodes AS (SELECT u AS n FROM e UNION SELECT v AS n FROM e), "
        "d0 AS (SELECT min(n) AS n, CAST(0 AS BIGINT) AS d FROM nodes), "
        "d1 AS (SELECT n, min(d) AS d FROM (SELECT n, d FROM d0 UNION ALL SELECT w.v AS n, d0.d + w.w AS d FROM d0 JOIN w ON w.u = d0.n) GROUP BY n), "
        "d2 AS (SELECT n, min(d) AS d FROM (SELECT n, d FROM d1 UNION ALL SELECT w.v AS n, d1.d + w.w AS d FROM d1 JOIN w ON w.u = d1.n) GROUP BY n), "
        "d3 AS (SELECT n, min(d) AS d FROM (SELECT n, d FROM d2 UNION ALL SELECT w.v AS n, d2.d + w.w AS d FROM d2 JOIN w ON w.u = d2.n) GROUP BY n), "
        "d4 AS (SELECT n, min(d) AS d FROM (SELECT n, d FROM d3 UNION ALL SELECT w.v AS n, d3.d + w.w AS d FROM d3 JOIN w ON w.u = d3.n) GROUP BY n)"
        " SELECT n AS node, d AS dist FROM d4"
    ),
    "fuzzy_join": (
        "WITH n AS (SELECT DISTINCT p_name AS s FROM part) "
        "SELECT a.s AS a, b.s AS b FROM n a JOIN n b "
        "ON a.s < b.s AND levenshtein(a.s, b.s) <= 1"
    ),
    "mixture_sample": (
        "WITH d AS (SELECT source, doc_id, CASE WHEN trim(text) = '' "
        "THEN 0 ELSE len(regexp_split_to_array(trim(text), '\\s+')) END "
        "AS n_tokens, md5(CAST(doc_id AS VARCHAR)) AS hkey FROM documents), "
        "c AS (SELECT source, doc_id, n_tokens, sum(n_tokens) OVER ("
        "PARTITION BY source ORDER BY hkey, doc_id) AS cum FROM d) "
        "SELECT source, doc_id, n_tokens FROM c WHERE cum <= 200"
    ),
    "event_throttle": (
        "SELECT e.event_id, e.user_id, e.event_type FROM events e "
        "WHERE NOT EXISTS (SELECT 1 FROM events p "
        "WHERE p.user_id = e.user_id AND p.event_type = e.event_type "
        "AND p.ts < e.ts "
        "AND epoch_us(e.ts) - epoch_us(p.ts) <= 3600000000)"
    ),
    "decontaminate": (
        "WITH toks AS (SELECT doc_id, list_filter(regexp_split_to_array("
        "trim(lower(coalesce(text,''))), '\\s+'), x -> x <> '') AS ws "
        "FROM documents), "
        "sh AS (SELECT doc_id, unnest(list_transform(generate_series(1, "
        "len(ws) - 4), i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || "
        "' ' || ws[i+3] || ' ' || ws[i+4])) AS s FROM toks "
        "WHERE len(ws) >= 5), "
        "bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 97 = 0), "
        "hits AS (SELECT DISTINCT d.doc_id, d.s FROM sh d "
        "JOIN bench USING (s) WHERE d.doc_id % 97 <> 0) "
        "SELECT doc_id, count(*) AS n_hits FROM hits GROUP BY doc_id"
    ),
    "dup_rate": (
        "WITH f AS (SELECT doc_id, source, md5(coalesce(text, '')) AS fp "
        "FROM documents), "
        "c AS (SELECT fp, count(*) AS n FROM f GROUP BY fp) "
        "SELECT source, count(*) AS n_docs, "
        "CAST(sum(CASE WHEN c.n > 1 THEN 1 ELSE 0 END) AS BIGINT) "
        "AS n_dup_docs FROM f JOIN c ON f.fp = c.fp GROUP BY source"
    ),
}

# Every single-argument trim() above mirrors the Ray side's Arrow
# utf8_trim_whitespace — which strips the full 29-codepoint Unicode
# whitespace set, while SQL trim(x) strips ONLY spaces ('\ta b' would
# count 3 tokens in SQL, 2 in Arrow). Rewrite each trim(x) to
# trim(x, <the exact Arrow set>) so the mirror holds on any input, not
# just whitespace-tame fixtures.
_ARROW_WS = [0x09, 0x0a, 0x0b, 0x0c, 0x0d, 0x1c, 0x1d, 0x1e, 0x1f, 0x20,
             0x85, 0xa0, 0x1680, *range(0x2000, 0x200b), 0x2028, 0x2029,
             0x202f, 0x205f, 0x3000]
_WS_SET_SQL = "(" + " || ".join(f"chr({c})" for c in _ARROW_WS) + ")"


def _unicode_trim_sql(sql: str) -> str:
    """Rewrite every single-arg trim(expr) to trim(expr, _WS_SET_SQL),
    paren-matched (expressions nest)."""
    out: list[str] = []
    i = 0
    low = sql.lower()
    while True:
        j = low.find("trim(", i)
        if j < 0:
            out.append(sql[i:])
            break
        if j > 0 and (sql[j - 1].isalnum() or sql[j - 1] == "_"):
            out.append(sql[i:j + 5])  # rtrim/ltrim etc. — leave alone
            i = j + 5
            continue
        depth, k = 0, j + 4
        while True:
            if sql[k] == "(":
                depth += 1
            elif sql[k] == ")":
                depth -= 1
                if depth == 0:
                    break
            k += 1
        out.append(sql[i:j])
        out.append("trim(" + sql[j + 5:k] + ", " + _WS_SET_SQL + ")")
        i = k + 1
    return "".join(out)


ORACLE_SQL["window_dedup"] = (
    "SELECT event_id, user_id, event_type, "
    "CAST((epoch_us(ts) // 3600000000) * 3600 AS BIGINT) AS window_start "
    "FROM events QUALIFY row_number() OVER ("
    "PARTITION BY user_id, event_type, epoch_us(ts) // 3600000000 "
    "ORDER BY ts, event_id) = 1"
)
# degree histogram over the SAME closed-form node table kg_nodes mirrors
ORACLE_SQL["kg_degree_hist"] = (
    "SELECT degree, count(*) AS n_nodes "
    f"FROM ({ORACLE_SQL['kg_nodes']}) GROUP BY degree"
)

ORACLE_SQL = {k: _unicode_trim_sql(v) for k, v in ORACLE_SQL.items()}
