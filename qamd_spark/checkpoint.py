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
    """Fingerprint of the input table's identity, used to decide whether a
    manifest is still valid on resume.

    - ``iceberg:`` refs delegate to the table's latest snapshot id
      (io.table_fingerprint) — the canonical input identity there.
    - a single file (e.g. a ``csv:`` path) is statted directly:
      name + size + mtime.
    - a directory hashes the file listing (relpath + size + mtime).

    An input that yields NOTHING (missing path, empty dir) raises instead
    of hashing the empty string: a constant fingerprint would make resume
    treat a changed or entirely different input as already-done and skip
    every bucket — the exact staleness the fingerprint exists to prevent.
    """
    from qamd_spark import io as qio

    if input_path.startswith(qio.ICEBERG_PREFIX):
        return qio.table_fingerprint(spark, input_path)
    path = (
        input_path.removeprefix(qio.CSV_PREFIX)
        .removeprefix(qio.JSONL_PREFIX)
        .removeprefix(qio.ORC_PREFIX)
    )
    parts = []
    if os.path.isfile(path):
        st = os.stat(path)
        parts.append(f"{os.path.basename(path)}:{st.st_size}:{st.st_mtime_ns}")
    else:
        for root, _dirs, files in os.walk(path):
            for fn in sorted(files):
                if fn.startswith("_") or fn.startswith("."):
                    continue
                p = os.path.join(root, fn)
                st = os.stat(p)
                parts.append(
                    f"{os.path.relpath(p, path)}:{st.st_size}:{st.st_mtime_ns}"
                )
    if not parts:
        raise FileNotFoundError(
            f"input {input_path!r} has no data files to fingerprint — "
            "refusing to checkpoint against an empty/missing input"
        )
    # os.walk yields SUBDIRECTORIES in filesystem-dependent order (only
    # files within one directory are sorted above) — without this sort
    # the same unchanged multi-directory input could fingerprint
    # differently across machines and silently invalidate every manifest
    parts.sort()
    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:16]


# widest group whose per-bucket counters still ride on the write via the
# Observation API (2 aggregate exprs per bucket); wider groups read the
# counters back from the written parquet instead
_MAX_OBSERVED_BUCKETS = 256


def _bucket_col(cfg: QamdConfig):
    # MUST match pipeline.label's bucket derivation so the input pre-filter
    # selects exactly the rows the group's output partitions will hold
    return F.pmod(F.xxhash64(F.col("conv_id")), F.lit(cfg.n_buckets))


def global_stats_tables(
    spark, df, out_dir: str, cfg: QamdConfig, in_fp: str, cfg_fp: str
):
    """One global pass for the cross-row aggregates, persisted as compact
    side tables under <out>/_stats (reused on resume when the input/config
    fingerprints match). Returns (text_stats_df | None, conv_stats_df | None,
    conv_dup_df | None).

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
    need_cdup = cfg.enabled("conv_neardup")
    stats_dir = os.path.join(out_dir, "_stats")
    meta_path = os.path.join(stats_dir, "meta.json")
    text_path = os.path.join(stats_dir, "text_stats.parquet")
    conv_path = os.path.join(stats_dir, "conv_stats.parquet")
    cdup_path = os.path.join(stats_dir, "conv_dup.parquet")
    # The side tables' CONTENT depends only on the input and on WHICH
    # stats are needed — never on rule thresholds (text_stats is raw
    # occurrence counts + keeper keys; conv_stats raw empty/turn counts).
    # Keying reuse on the full config fingerprint would force a re-audit
    # under a tightened threshold (the advertised workflow) to re-pay the
    # global aggregation pass, so the meta records this narrower
    # stats fingerprint instead. Bucket manifests still key on the full
    # config fingerprint — labels DO change with thresholds.
    stats_fp = f"{in_fp}:text={need_text}:conv={need_conv}:cdup={need_cdup}"
    reuse = False
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        reuse = meta.get("stats_fingerprint") == stats_fp
    if not reuse:
        os.makedirs(stats_dir, exist_ok=True)
        if need_text:
            pipeline.text_stats(df).write.mode("overwrite").parquet(text_path)
        if need_conv:
            pipeline.conv_stats(df).write.mode("overwrite").parquet(conv_path)
        if need_cdup:
            pipeline.conv_dup_stats(df).write.mode("overwrite").parquet(cdup_path)
        tmp = meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"stats_fingerprint": stats_fp}, f)
        os.replace(tmp, meta_path)  # atomic publish, after the data
    ts = spark.read.parquet(text_path) if need_text else None
    cs = spark.read.parquet(conv_path) if need_conv else None
    cd = spark.read.parquet(cdup_path) if need_cdup else None
    return ts, cs, cd


def run_with_checkpoints(
    spark,
    input_path: str,
    out_dir: str,
    cfg: QamdConfig | None = None,
    bucket_batch: int | None = None,
    fail_after_buckets: int | None = None,
    progress: bool = False,
) -> list[Manifest]:
    """Label the table and write it bucket-group by bucket-group, manifesting
    each completed bucket. ``fail_after_buckets`` simulates a crash (tests).

    Buckets are processed in fixed ascending order in groups of
    ``bucket_batch`` (one Spark job per group — amortizes scheduling while
    keeping the resume grain at a single bucket).

    ``bucket_batch=None`` (default) is adaptive: a FRESH run (no completed
    manifests) processes all buckets in ONE job — no per-group input
    filter, one write, one Observation with per-bucket counters — so the
    checkpointed CLI pays only the side-table stats pass over the raw
    labeled write (the r2 grouped default paid n_groups re-scans plus
    n_groups of per-job fixed cost and ran at 1.47x). A RESUME (some
    manifests present) degrades to groups of 8, where the per-group input
    pre-filter (partition-pruned on bucketed input) keeps redone work
    proportional to the missing buckets. Passing an explicit int forces
    that group size for both cases.

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
    if not done and os.path.isdir(store.data_dir):
        # No manifest from this (input, config) is valid, so anything
        # under data/ belongs to a PREVIOUS input/config. Dynamic
        # partition overwrite only replaces partitions that receive new
        # rows — a changed input whose rows no longer hash to bucket k
        # (or a smaller n_buckets) would leave the old run's bucket=k
        # files readable next to fresh manifests saying n_rows=0. Wipe
        # before a full redo; on a partial resume (done non-empty) the
        # surviving partitions are this run's own and must stay.
        import shutil

        shutil.rmtree(store.data_dir)
    if bucket_batch is None:
        # fresh run: one job over everything; resume: bucket-grained groups
        bucket_batch = len(todo) if not done else 8

    from qamd_spark import io, pipeline

    df = io.normalize_input(io.read_table(spark, input_path))
    # Pre-bucketed input fast path: when the input carries a `bucket`
    # partition column (our own labeled output being re-audited, or an
    # Iceberg table with a bucket(conv_id) spec read as partition dirs),
    # group jobs filter on the PARTITION column — Spark prunes the group's
    # directories at file-listing time, so each group job reads only its
    # ~1/n_groups slice instead of scanning the full input to evaluate the
    # hash expression. The column must equal pmod(xxhash64(conv_id),
    # n_buckets): a mismatch (e.g. a different n_buckets) would misroute
    # rows across groups AND — because the write uses dynamic partition
    # overwrite — clobber partitions whose manifests already say done. So
    # the spec is validated UP FRONT with one cheap early-exit scan of
    # (conv_id, bucket), before anything is written (r2 ADVICE: the
    # previous post-write Observation check fired only after the damage).
    bucket_partitioned = "bucket" in df.columns
    if bucket_partitioned:
        # marker file keyed on (input, config) fingerprints: resume skips
        # the validation scan it already paid
        spec_ok = os.path.join(
            store.manifest_dir, f"spec-ok-{in_fp}-{cfg_fp}"
        )
        if not os.path.exists(spec_ok):
            # null-SAFE inequality: a NULL bucket value must count as a
            # mismatch (null-unsafe != would let NULL-bucket rows pass
            # validation and then silently match no group's isin filter)
            bad = (
                df.select("conv_id", "bucket")
                .filter(~F.col("bucket").eqNullSafe(_bucket_col(cfg)))
                .limit(1)
                .count()
            )
            if bad:
                raise RuntimeError(
                    f"input `bucket` partition column disagrees with "
                    f"pmod(xxhash64(conv_id), {cfg.n_buckets}) — the input "
                    "was bucketed with a different spec; drop the column or "
                    "set engine.n_buckets to match"
                )
            with open(spec_ok, "w"):
                pass
    # The side-table stats pass exists so that MULTIPLE group jobs reuse
    # one global aggregation. A single job covering every todo bucket
    # (the fresh-run fast path) has no reuse to gain — inline aggregation
    # inside pipeline.label is the same plan the raw labeled write runs,
    # and skipping the extra stats job + side-table write/read is what
    # keeps the checkpointed CLI at ~the raw write's cost. Resume (or an
    # explicit multi-group bucket_batch) builds the side tables then —
    # the deferred stats pass is paid once, only on the path that needs
    # it, and the meta.json fingerprint check still allows reuse across
    # repeated resumes.
    # inline stats are only GLOBAL when the one job sees every bucket —
    # a resume of 3 leftover buckets must still join the precomputed
    # global side tables, or its inline aggregates would only cover the
    # filtered slice
    single_job = len(todo) == cfg.n_buckets and bucket_batch >= len(todo)
    if single_job:
        ts = cs = cd = None
    else:
        ts, cs, cd = global_stats_tables(spark, df, out_dir, cfg, in_fp, cfg_fp)
    written: list[Manifest] = []
    from pyspark.sql import Observation

    for i in range(0, len(todo), bucket_batch):
        group = todo[i : i + bucket_batch]
        if len(group) == cfg.n_buckets:
            part_in = df.drop("bucket") if bucket_partitioned else df
        elif bucket_partitioned:
            part_in = df.filter(F.col("bucket").isin(group)).drop("bucket")
        else:
            part_in = df.filter(_bucket_col(cfg).isin(group))
        part = pipeline.label(
            part_in, cfg, text_stats_df=ts, conv_stats_df=cs, conv_dup_df=cd
        )
        # Per-bucket manifest counters: piggyback on the write via the
        # Observation API for normal group sizes (no extra pass). The
        # Observation carries 2 aggregate expressions per bucket, so for
        # very wide groups (the single-job fresh run with thousands of
        # buckets) that would bloat the plan/codegen — there the counters
        # come instead from one cheap post-write aggregation over the
        # just-written parquet (reads only the bucket partition column +
        # keep; dynamic overwrite guarantees the group's partitions hold
        # exactly this run's rows).
        use_obs = len(group) <= _MAX_OBSERVED_BUCKETS
        obs = Observation(f"qamd-group-{group[0]}")
        if use_obs:
            metrics = []
            for b in group:
                is_b = F.col("bucket") == F.lit(b)
                metrics.append(F.sum(is_b.cast("long")).alias(f"n_{b}"))
                metrics.append(
                    F.sum((is_b & F.col("keep")).cast("long")).alias(f"k_{b}")
                )
            part = part.observe(obs, *metrics)
        (
            pipeline.salted_repartition(part, cfg)
            .write.mode("overwrite")
            .partitionBy("bucket")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(store.data_dir)
        )
        if use_obs:
            got = obs.get  # collected during the write job, no extra pass
        else:
            counts = (
                spark.read.parquet(store.data_dir)
                .filter(F.col("bucket").isin(group))
                .groupBy("bucket")
                .agg(
                    F.count(F.lit(1)).alias("_n"),
                    F.sum(F.col("keep").cast("long")).alias("_k"),
                )
                .collect()
            )
            got = {}
            for r in counts:
                got[f"n_{r['bucket']}"] = r["_n"]
                got[f"k_{r['bucket']}"] = r["_k"]
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
