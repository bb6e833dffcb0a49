"""Checkpointed partition manifests → resumable batch runs (north_rule).

The output is written bucket-by-bucket (bucket = pmod(xxhash64(conv_id),
n_buckets)); each completed bucket gets an atomic manifest JSON recording
row counts and an input fingerprint. A restarted run loads the manifest
directory, verifies fingerprints, and anti-filters completed buckets from
the input — plain deterministic batch bookkeeping, no Structured Streaming
involved (the reference is strictly batch too; SURVEY.md §2.9).

Layout:
    <out>/data/bucket=<k>/*.parquet      labeled rows for bucket k
    <out>/_manifests/bucket-<k>.json     {"bucket", "n_rows", "n_keep",
                                          "input_fingerprint", "config_fingerprint"}

Atomicity: manifest is written to a temp name then os.replace()d — a
manifest either fully exists or doesn't, so a crash mid-bucket re-runs
that bucket (output dir for the bucket is overwritten idempotently).
"""

from __future__ import annotations

import hashlib
import json
import os
from dataclasses import dataclass

from pyspark.sql import functions as F

from qamd_spark.config import QamdConfig


def config_fingerprint(cfg: QamdConfig) -> str:
    blob = json.dumps(
        {"settings": cfg.settings, "actions": cfg.actions, "stopwords": cfg.stopwords,
         "n_buckets": cfg.n_buckets},
        sort_keys=True,
        default=str,
    )
    return hashlib.sha256(blob.encode()).hexdigest()[:16]


@dataclass
class Manifest:
    bucket: int
    n_rows: int
    n_keep: int
    input_fingerprint: str
    config_fingerprint: str


class CheckpointStore:
    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self.data_dir = os.path.join(out_dir, "data")
        self.manifest_dir = os.path.join(out_dir, "_manifests")
        os.makedirs(self.data_dir, exist_ok=True)
        os.makedirs(self.manifest_dir, exist_ok=True)

    def _path(self, bucket: int) -> str:
        return os.path.join(self.manifest_dir, f"bucket-{bucket:05d}.json")

    def completed_buckets(self, input_fp: str, config_fp: str) -> set[int]:
        done = set()
        if not os.path.isdir(self.manifest_dir):
            return done
        for name in os.listdir(self.manifest_dir):
            if not name.startswith("bucket-") or not name.endswith(".json"):
                continue
            with open(os.path.join(self.manifest_dir, name)) as f:
                m = json.load(f)
            if (
                m.get("input_fingerprint") == input_fp
                and m.get("config_fingerprint") == config_fp
            ):
                done.add(int(m["bucket"]))
        return done

    def write_manifest(self, m: Manifest) -> None:
        path = self._path(m.bucket)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m.__dict__, f)
        os.replace(tmp, path)  # atomic publish


def input_fingerprint(spark, input_path: str) -> str:
    """Fingerprint of the input table: file names + sizes + mtimes of the
    parquet footprint (cheap driver-side listing; at Iceberg scale this
    would be the snapshot id instead)."""
    parts = []
    input_path = input_path.removeprefix("csv:")
    for root, _dirs, files in os.walk(input_path):
        for fn in sorted(files):
            if fn.startswith("_") or fn.startswith("."):
                continue
            p = os.path.join(root, fn)
            st = os.stat(p)
            parts.append(f"{os.path.relpath(p, input_path)}:{st.st_size}")
    if not parts and os.path.isfile(input_path):
        st = os.stat(input_path)
        parts.append(f"{os.path.basename(input_path)}:{st.st_size}")
    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:16]


def _bucket_col(cfg: QamdConfig):
    # MUST match pipeline.label's bucket derivation so the input pre-filter
    # selects exactly the rows the group's output partitions will hold
    return F.pmod(F.xxhash64(F.col("conv_id")), F.lit(cfg.n_buckets))


def global_stats_tables(
    spark, df, out_dir: str, cfg: QamdConfig, in_fp: str, cfg_fp: str
):
    """One global pass for the cross-row aggregates, persisted as compact
    side tables under <out>/_stats (reused on resume when the input/config
    fingerprints match). Returns (text_stats_df | None, conv_stats_df | None).

    These tables are SMALL relative to the input — text_stats has one row
    per duplicated-or-counted distinct text (occurrence counts only, no
    payload beyond the text key), conv_stats one row per conversation — so
    at 10^12 turns they are the right thing to materialize: every bucket
    group then joins against the side table instead of re-running the
    global aggregation over the whole input (which was a 4-8x total
    recompute with default group sizes).
    """
    from qamd_spark import pipeline

    need_text = cfg.enabled("duplicate_turn") or cfg.enabled("rare_signature")
    need_conv = cfg.enabled("conv_missing_fraction")
    stats_dir = os.path.join(out_dir, "_stats")
    meta_path = os.path.join(stats_dir, "meta.json")
    text_path = os.path.join(stats_dir, "text_stats.parquet")
    conv_path = os.path.join(stats_dir, "conv_stats.parquet")
    reuse = False
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        reuse = (
            meta.get("input_fingerprint") == in_fp
            and meta.get("config_fingerprint") == cfg_fp
        )
    if not reuse:
        os.makedirs(stats_dir, exist_ok=True)
        if need_text:
            pipeline.text_stats(df).write.mode("overwrite").parquet(text_path)
        if need_conv:
            pipeline.conv_stats(df).write.mode("overwrite").parquet(conv_path)
        tmp = meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {"input_fingerprint": in_fp, "config_fingerprint": cfg_fp}, f
            )
        os.replace(tmp, meta_path)  # atomic publish, after the data
    ts = spark.read.parquet(text_path) if need_text else None
    cs = spark.read.parquet(conv_path) if need_conv else None
    return ts, cs


def run_with_checkpoints(
    spark,
    input_path: str,
    out_dir: str,
    cfg: QamdConfig | None = None,
    bucket_batch: int = 8,
    fail_after_buckets: int | None = None,
    progress: bool = False,
) -> list[Manifest]:
    """Label the table and write it bucket-group by bucket-group, manifesting
    each completed bucket. ``fail_after_buckets`` simulates a crash (tests).

    Buckets are processed in fixed ascending order in groups of
    ``bucket_batch`` (one Spark job per group — amortizes scheduling while
    keeping the resume grain at a single bucket).

    Work shape (scale-critical): the global cross-row aggregations run
    ONCE into side tables (:func:`global_stats_tables`); each group job
    then (a) pre-filters the INPUT on pmod(xxhash64(conv_id), n_buckets)
    — evaluated directly above the scan, so only the group's rows reach
    the joins and the Python scoring stage — and (b) joins the precomputed
    stats. Total compute ≈ one stats pass + one scoring pass over the
    input, regardless of n_buckets/bucket_batch. (The previous formulation
    filtered the fully-labeled plan per group; the bucket column was born
    downstream of the scoring stage, so every group re-scored and
    re-aggregated the whole input — an n_groups-fold recompute.)

    Manifest counts are collected DURING each group's write via the
    Observation API (per-bucket conditional sums piggyback on the write
    job) — no read-back job and no re-run of the group plan.
    """
    cfg = cfg or QamdConfig()
    store = CheckpointStore(out_dir)
    in_fp = input_fingerprint(spark, input_path)
    cfg_fp = config_fingerprint(cfg)
    done = store.completed_buckets(in_fp, cfg_fp)
    todo = [b for b in range(cfg.n_buckets) if b not in done]
    if not todo:
        return []

    from qamd_spark import io, pipeline

    df = io.normalize_input(io.read_table(spark, input_path))
    ts, cs = global_stats_tables(spark, df, out_dir, cfg, in_fp, cfg_fp)
    written: list[Manifest] = []
    from pyspark.sql import Observation

    # Pre-bucketed input fast path: when the input carries a `bucket`
    # partition column (our own labeled output being re-audited, or an
    # Iceberg table with a bucket(conv_id) spec read as partition dirs),
    # filter on the PARTITION column — Spark prunes the group's
    # directories at file-listing time, so each group job reads only its
    # ~1/n_groups slice instead of scanning the full input to evaluate
    # the hash expression. The column must equal
    # pmod(xxhash64(conv_id), n_buckets) — a mismatch (e.g. a different
    # n_buckets) would misroute rows across groups, so each group's
    # observation also counts rows whose RECOMPUTED bucket fell outside
    # the group and the run aborts loudly on the first misroute.
    bucket_partitioned = "bucket" in df.columns
    for i in range(0, len(todo), bucket_batch):
        group = todo[i : i + bucket_batch]
        if bucket_partitioned:
            part_in = df.filter(F.col("bucket").isin(group)).drop("bucket")
        else:
            part_in = df.filter(_bucket_col(cfg).isin(group))
        part = pipeline.label(part_in, cfg, text_stats_df=ts, conv_stats_df=cs)
        obs = Observation(f"qamd-group-{group[0]}")
        metrics = []
        for b in group:
            is_b = F.col("bucket") == F.lit(b)
            metrics.append(F.sum(is_b.cast("long")).alias(f"n_{b}"))
            metrics.append(
                F.sum((is_b & F.col("keep")).cast("long")).alias(f"k_{b}")
            )
        if bucket_partitioned:
            metrics.append(
                F.sum((~F.col("bucket").isin(group)).cast("long")).alias("_misrouted")
            )
        part = part.observe(obs, *metrics)
        (
            pipeline.salted_repartition(part, cfg)
            .write.mode("overwrite")
            .partitionBy("bucket")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(store.data_dir)
        )
        got = obs.get  # collected during the write job, no extra pass
        if bucket_partitioned and int(got.get("_misrouted") or 0) > 0:
            raise RuntimeError(
                f"input `bucket` partition column disagrees with "
                f"pmod(xxhash64(conv_id), {cfg.n_buckets}) for "
                f"{got['_misrouted']} rows in group {group} — the input was "
                "bucketed with a different spec; drop the column or set "
                "engine.n_buckets to match"
            )
        for b in group:
            m = Manifest(
                b,
                int(got.get(f"n_{b}") or 0),
                int(got.get(f"k_{b}") or 0),
                in_fp,
                cfg_fp,
            )
            store.write_manifest(m)
            written.append(m)
        if progress:
            # reference -p progress reporting (src/bin/qamd.rs progress
            # flag); per-group lines instead of a per-cell bar
            done_n = len(done) + len(written)
            print(
                f"[qamd] buckets {done_n}/{cfg.n_buckets} "
                f"(+{sum(m.n_rows for m in written[-len(group):])} rows)",
                flush=True,
            )
        if fail_after_buckets is not None and len(written) >= fail_after_buckets:
            raise RuntimeError(f"simulated crash after {len(written)} buckets")
    return written
