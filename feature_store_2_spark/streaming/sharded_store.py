"""Sharded keyed store: incremental MERGE that rewrites only changed
key-shards, with shard-pruned point lookups.

The plain grants store (grants_store.py) rewrites the WHOLE table per
upsert — correct, but at 100 TB a micro-batch touching 0.01% of users
cannot pay a full rewrite. Here the key space is hash-sharded
(``pmod(xxhash64(user_id), n_shards)``) and each upsert:

  1. computes which shards the incoming rows touch (tiny distinct agg);
  2. rewrites ONLY those shards (anti-join old shard data + union new);
  3. commits a manifest mapping shard -> owning version, then swaps the
     ``_LATEST`` pointer (readers never see a half-written version).

This is exactly the shape of Delta/Iceberg MERGE (log = manifest, file
group = shard): write amplification proportional to data touched, not
table size. Reference parity: the per-key dict update of
/root/reference/services/user_feature.py:32-44, made durable and
incremental. Point lookups (app.py:63-79) hash the key to one shard and
read one directory — the poor man's primary-key index.

Compaction: after many incremental upserts the manifest references many
versions (each a directory). When the live-version count exceeds
``compact_after``, the upsert folds everything into one new version —
Delta's OPTIMIZE. Unreferenced versions are deleted after commit.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

N_SHARDS = 16
SHARD_COL = "__shard"


def _latest_path(path: str) -> str:
    return os.path.join(path, "_LATEST")


def _manifest_path(path: str, version: int) -> str:
    return os.path.join(path, f"manifest_v{version}.json")


def _data_dir(path: str, version: int) -> str:
    return os.path.join(path, "data", f"v{version}")


def current_version(path: str) -> int | None:
    try:
        with open(_latest_path(path)) as f:
            return int(f.read().strip())
    except (FileNotFoundError, ValueError):
        return None


def _read_manifest(path: str) -> dict[int, int] | None:
    version = current_version(path)
    if version is None:
        return None
    with open(_manifest_path(path, version)) as f:
        return {int(k): int(v) for k, v in json.load(f)["shards"].items()}


def _read_manifest_doc(path: str) -> dict | None:
    """The full current manifest document (shards + any txn stamps)."""
    version = current_version(path)
    if version is None:
        return None
    with open(_manifest_path(path, version)) as f:
        return json.load(f)


def read_txn(path: str, app_id: str) -> int | None:
    """Last transaction version committed for ``app_id``, or None.

    The Delta ``txnAppId``/``txnVersion`` idempotence surface: a writer
    that stamps ``upsert(..., txn=(app_id, version))`` can detect a
    replayed write (same or older version) and skip re-applying it —
    the exactly-once guard for at-least-once callers (foreachBatch)."""
    doc = _read_manifest_doc(path)
    if doc is None:
        return None
    v = doc.get("txn", {}).get(app_id)
    return None if v is None else int(v)


def shard_of(key_col: str, n_shards: int = N_SHARDS) -> F.Column:
    return F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_shards)).cast("int")


# --- driver-side XXH64, bit-identical to Spark's xxhash64 on BIGINT ---
# (XXH64 is public domain; this is the fixed-width 8-byte lane path with
# Spark's default seed 42.) Lets a point lookup compute its shard without
# launching a Spark job — the serving path is then one pruned read.
_M64 = (1 << 64) - 1
_P1, _P2, _P3, _P4, _P5 = (
    0x9E3779B185EBCA87,
    0xC2B2AE3D27D4EB4F,
    0x165667B19E3779F9,
    0x85EBCA77C2B2AE63,
    0x27D4EB2F165667C5,
)


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def xxhash64_long(value: int, seed: int = 42) -> int:
    """Spark-compatible xxhash64 of one BIGINT (signed result).
    Verified bit-identical to ``F.xxhash64(col)`` for LongType in
    tests/test_sharded_store.py."""
    l = value & _M64
    acc = (seed + _P5 + 8) & _M64
    k1 = _rotl64((l * _P2) & _M64, 31)
    acc ^= (k1 * _P1) & _M64
    acc = (_rotl64(acc, 27) * _P1 + _P4) & _M64
    acc ^= acc >> 33
    acc = (acc * _P2) & _M64
    acc ^= acc >> 29
    acc = (acc * _P3) & _M64
    acc ^= acc >> 32
    return acc - (1 << 64) if acc >= (1 << 63) else acc


def read_store(
    spark: SparkSession,
    path: str,
    shards: set[int] | None = None,
    at_version: int | None = None,
) -> DataFrame | None:
    """Snapshot read; ``shards`` restricts the read to those shard
    directories (partition pruning on the ``__shard`` column).

    ``at_version`` time-travels to an earlier committed version (Delta's
    ``VERSION AS OF``): each manifest is an immutable shard->version map,
    so any retained manifest reconstructs its exact snapshot. Retention
    is ``upsert(retain_versions=...)``; reading a GC'd version raises.
    """
    if at_version is not None:
        try:
            with open(_manifest_path(path, at_version)) as f:
                manifest = {
                    int(k): int(v) for k, v in json.load(f)["shards"].items()
                }
        except FileNotFoundError:
            raise ValueError(
                f"version {at_version} is not retained (GC'd or never written)"
            )
    else:
        manifest = _read_manifest(path)
    if manifest is None:
        return None
    by_version: dict[int, list[int]] = {}
    for shard, version in manifest.items():
        if shards is None or shard in shards:
            by_version.setdefault(version, []).append(shard)
    parts = []
    for version, owned in sorted(by_version.items()):
        df = spark.read.parquet(_data_dir(path, version))
        parts.append(df.filter(F.col(SHARD_COL).isin(owned)))
    if not parts:
        return None
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def snapshot(spark: SparkSession, path: str) -> DataFrame | None:
    """Current store contents without the internal ``__shard`` column."""
    df = read_store(spark, path)
    return None if df is None else df.drop(SHARD_COL)


def upsert(
    new: DataFrame,
    path: str,
    key_cols: tuple[str, ...],
    shard_key: str,
    n_shards: int = N_SHARDS,
    compact_after: int = 8,
    touched: set[int] | None = None,
    retain_versions: int = 1,
    txn: tuple[str, int] | None = None,
) -> None:
    """MERGE ``new`` into the store: matching ``key_cols`` rows replaced,
    others carried forward; only shards containing incoming rows are
    rewritten (plus a full fold when compaction triggers).

    ``new`` may already carry the ``__shard`` column (and ``touched`` the
    matching shard set) — callers that need the shard set themselves
    (e.g. to restrict a pre-merge read) compute it once and pass both.

    ``retain_versions`` keeps the last N committed manifests (and every
    data version they reference) readable via
    ``read_store(at_version=...)`` — Delta's retention window; 1 keeps
    only the current snapshot.

    ``txn=(app_id, version)`` stamps an application transaction version
    into the SAME manifest commit (Delta's ``txnAppId``/``txnVersion``):
    the stamp and the data become visible atomically, so an
    at-least-once caller (foreachBatch replaying a micro-batch after a
    crash landed the store write but not the checkpoint commit) can
    consult ``read_txn`` and skip the re-apply. Stamps from other apps
    are carried forward untouched.
    """
    spark = new.sparkSession
    doc = _read_manifest_doc(path) or {}
    txn_map: dict[str, int] = {k: int(v) for k, v in doc.get("txn", {}).items()}
    if txn is not None:
        txn_map[txn[0]] = int(txn[1])
    manifest = {int(k): int(v) for k, v in doc.get("shards", {}).items()}
    # Version off _LATEST, not manifest truthiness: a delete_keys that
    # emptied every shard leaves a committed EMPTY manifest, and the next
    # upsert must continue the version chain, not restart at v0.
    version = current_version(path)
    next_version = (version + 1) if version is not None else 0

    if SHARD_COL not in new.columns:
        new = new.withColumn(SHARD_COL, shard_of(shard_key, n_shards))
    if touched is None:
        touched = {
            r[0] for r in new.select(SHARD_COL).distinct().collect()
        }  # tiny: <= n_shards ints

    live_versions = set(manifest.values())
    compacting = len(live_versions) + 1 > compact_after
    shards_to_write = set(manifest) | touched if compacting else touched
    if not shards_to_write:  # empty batch, nothing to fold
        return

    old = read_store(spark, path, shards=shards_to_write)
    merged = (
        new
        if old is None
        else old.join(new, list(key_cols), "left_anti").unionByName(new)
    )
    target = _data_dir(path, next_version)
    # Align the write's task partitioning with the directory
    # partitioning (optimization guide §6, small files): without this,
    # every task holding rows of k shards opens k files, so a
    # 16-task micro-batch writing 16 shards lands up to 256 near-empty
    # parquet files PER VERSION — paid again by every snapshot /
    # pre-merge read (listing + per-file open). Repartitioning by the
    # shard column first bounds the file count by the shard count
    # (plus hash-collision doubling), and the shuffled bytes are
    # exactly the rows being rewritten — which the store's design
    # already bounds to the touched shards.
    merged = merged.repartition(F.col(SHARD_COL))
    merged.write.mode("overwrite").partitionBy(SHARD_COL).parquet(target)

    new_manifest = dict(manifest)
    for s in shards_to_write:
        new_manifest[s] = next_version
    os.makedirs(path, exist_ok=True)
    manifest_doc: dict = {
        "shards": {str(k): v for k, v in new_manifest.items()}
    }
    if txn_map:
        manifest_doc["txn"] = txn_map
    with open(_manifest_path(path, next_version), "w") as f:
        json.dump(manifest_doc, f)
    tmp = _latest_path(path) + ".tmp"
    with open(tmp, "w") as f:
        f.write(str(next_version))
    os.replace(tmp, _latest_path(path))

    # GC: keep the data referenced by the last ``retain_versions``
    # manifests (the time-travel window); everything older goes.
    oldest_kept = max(0, next_version - retain_versions + 1)
    still_live: set[int] = set()
    for v in range(oldest_kept, next_version + 1):
        try:
            with open(_manifest_path(path, v)) as f:
                still_live |= {int(x) for x in json.load(f)["shards"].values()}
        except FileNotFoundError:
            pass
    for old_v in (live_versions | {next_version}) - still_live:
        shutil.rmtree(_data_dir(path, old_v), ignore_errors=True)
    for old_v in range(oldest_kept):
        if old_v not in still_live:
            try:
                os.remove(_manifest_path(path, old_v))
            except FileNotFoundError:
                pass


def point_lookup(
    spark: SparkSession,
    path: str,
    shard_key: str,
    key_value,
    n_shards: int = N_SHARDS,
) -> DataFrame | None:
    """Rows for one key, reading exactly one shard directory.

    The shard must come from the SAME hash ``upsert``'s ``shard_of``
    applied — ``xxhash64`` hashes by type, so hashing
    ``lit(key).cast('long')`` would silently pick the wrong shard for
    any non-bigint shard key (e.g. string user ids). Bigint keys hash
    driver-side (``xxhash64_long``, bit-identical, zero Spark jobs —
    the serving path is then a single pruned read); other dtypes fall
    back to a one-row frame carrying the column's STORED dtype.
    """
    manifest = _read_manifest(path)
    if not manifest:
        return None
    any_version = next(iter(manifest.values()))
    dtype = (
        spark.read.parquet(_data_dir(path, any_version)).schema[shard_key].dataType
    )
    if isinstance(dtype, T.LongType):
        shard = xxhash64_long(int(key_value)) % n_shards
    else:
        shard = (
            spark.createDataFrame(
                [(key_value,)], T.StructType([T.StructField(shard_key, dtype)])
            )
            .select(shard_of(shard_key, n_shards).alias("s"))
            .collect()[0]["s"]
        )
    snap = read_store(spark, path, shards={shard})
    if snap is None:
        return None
    return snap.filter(F.col(shard_key) == key_value).drop(SHARD_COL)


def delete_keys(
    keys: DataFrame,
    path: str,
    key_cols: tuple[str, ...],
    shard_key: str,
    n_shards: int = N_SHARDS,
    retain_versions: int = 1,
) -> int:
    """MERGE-DELETE (Delta ``DELETE WHERE`` analog): drop every stored
    row matching ``keys`` on ``key_cols``. Only shards containing a key
    are rewritten — the right-to-be-forgotten shape: a deletion batch
    touching k users costs k shard rewrites, not a full-table rewrite.
    Commits a new manifest version like ``upsert`` (so the deletion is
    itself time-travelable within the retention window — and retention
    is the compliance knob: ``retain_versions=1`` makes the purge
    immediate and the GC below removes the old data files).

    Returns the number of shards rewritten.
    """
    spark = keys.sparkSession
    doc = _read_manifest_doc(path) or {}
    txn_map = {k: int(v) for k, v in doc.get("txn", {}).items()}
    manifest = {int(k): int(v) for k, v in doc.get("shards", {}).items()}
    if not manifest:
        return 0
    version = current_version(path)
    next_version = version + 1

    if SHARD_COL not in keys.columns:
        keys = keys.withColumn(SHARD_COL, shard_of(shard_key, n_shards))
    keys = keys.select(*key_cols, SHARD_COL).distinct()
    touched = {r[0] for r in keys.select(SHARD_COL).distinct().collect()}
    # Only shards the store actually holds can be rewritten — keys hashing
    # to never-written shards would otherwise make read_store return None
    # below (and a no-op deletion should cost zero rewrites).
    touched &= set(manifest)
    if not touched:
        return 0

    old = read_store(spark, path, shards=touched)
    kept = old.join(keys.drop(SHARD_COL), list(key_cols), "left_anti")
    target = _data_dir(path, next_version)
    kept.write.mode("overwrite").partitionBy(SHARD_COL).parquet(target)

    new_manifest = dict(manifest)
    for s in touched:
        # A shard whose every row was deleted writes no partition
        # directory; referencing next_version for it would point readers
        # at a parquet-less path (schema inference fails). Drop it from
        # the manifest instead — the shard now holds zero rows.
        if os.path.isdir(os.path.join(target, f"{SHARD_COL}={s}")):
            new_manifest[s] = next_version
        else:
            new_manifest.pop(s, None)
    manifest_doc: dict = {
        "shards": {str(k): v for k, v in new_manifest.items()}
    }
    if txn_map:
        manifest_doc["txn"] = txn_map
    with open(_manifest_path(path, next_version), "w") as f:
        json.dump(manifest_doc, f)
    tmp = _latest_path(path) + ".tmp"
    with open(tmp, "w") as f:
        f.write(str(next_version))
    os.replace(tmp, _latest_path(path))

    oldest_kept = max(0, next_version - retain_versions + 1)
    still_live: set[int] = set()
    for v in range(oldest_kept, next_version + 1):
        try:
            with open(_manifest_path(path, v)) as f:
                still_live |= {int(x) for x in json.load(f)["shards"].values()}
        except FileNotFoundError:
            pass
    for old_v in (set(manifest.values()) | {next_version}) - still_live:
        shutil.rmtree(_data_dir(path, old_v), ignore_errors=True)
    for old_v in range(oldest_kept):
        if old_v not in still_live:
            try:
                os.remove(_manifest_path(path, old_v))
            except FileNotFoundError:
                pass
    return len(touched)
