"""Filesystem primitives for crash-safe table maintenance.

Two contracts the sinks rely on:

- `path_exists` makes "is this a first run?" an EXPLICIT check instead of
  a bare except around the read — a corrupt footer, permission error, or
  FS hiccup on an EXISTING store must propagate, never silently disable a
  dedup/merge gate (that would violate the first-seen invariant
  append_new_to_store exists to enforce).

- `swap_into_place` replaces a table atomically-enough via RENAME-ASIDE:
  dst -> dst__old__, tmp -> dst, delete dst__old__. Unlike
  delete-then-rename, the destination is only ever absent between two
  renames, and every crash point is recoverable from the leftovers —
  `recover_swap` (called before reads and before the next swap) completes
  or rolls back an interrupted swap instead of mistaking it for a first
  run. Reference analog: the per-log JSON state write's replace-not-append
  contract (storage/localdiskbackend.go:201-210).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

TMP_SUFFIX = "__tmp__"
OLD_SUFFIX = "__old__"


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(hconf), p


def path_exists(spark: SparkSession, path: str) -> bool:
    fs, p = _fs_and_path(spark, path)
    return bool(fs.exists(p))


def delete_path(spark: SparkSession, path: str) -> None:
    """Recursively delete a table path (and any swap leftovers), used to
    invalidate derived tables whose base table is being overwritten."""
    fs, p = _fs_and_path(spark, path)
    for suffix in ("", TMP_SUFFIX, OLD_SUFFIX):
        _, q = _fs_and_path(spark, path + suffix)
        if fs.exists(q):
            fs.delete(q, True)


def count_parquet_files(spark: SparkSession, path: str) -> int:
    """Recursive .parquet data-file count under `path` (0 if absent) —
    the health metric index-compaction maintains: probe cost over a
    long-lived partitioned store is file opens before it is bytes."""
    fs, p = _fs_and_path(spark, path)
    if not fs.exists(p):
        return 0
    n = 0
    stack = [p]
    while stack:
        for st in fs.listStatus(stack.pop()):
            name = st.getPath().getName()
            if name.startswith(("_", ".")):
                # same convention as Spark's input listing: underscore/
                # hidden trees (e.g. an IVF index's _centroids sidecar)
                # are not data files
                continue
            if st.isDirectory():
                stack.append(st.getPath())
            elif name.endswith(".parquet"):
                n += 1
    return n


def recover_swap(spark: SparkSession, path: str) -> None:
    """Complete or roll back an interrupted swap_into_place on `path`.

    Crash points and their leftovers (swap order: write tmp fully ->
    rename dst->old -> rename tmp->dst -> delete old):
      * during tmp write:        dst intact, tmp partial  -> delete tmp
      * between the two renames: dst absent, old+tmp here -> tmp is
        complete (renames only start after a full tmp write): finish the
        swap (tmp->dst, delete old)
      * before the old cleanup:  dst intact, old here     -> delete old
      * old only, dst absent (defensive; not reachable from one crash):
        roll back (old->dst)
    """
    fs, dst = _fs_and_path(spark, path)
    _, tmp = _fs_and_path(spark, path + TMP_SUFFIX)
    _, old = _fs_and_path(spark, path + OLD_SUFFIX)
    if fs.exists(dst):
        if fs.exists(old):
            fs.delete(old, True)
        if fs.exists(tmp):
            fs.delete(tmp, True)
        return
    if fs.exists(old):
        if fs.exists(tmp):
            if not fs.rename(tmp, dst):
                raise IOError(f"swap recovery failed: {tmp} -> {dst}")
        elif not fs.rename(old, dst):
            raise IOError(f"swap rollback failed: {old} -> {dst}")
        if fs.exists(old):
            fs.delete(old, True)


def swap_into_place(spark: SparkSession, tmp_path: str, path: str) -> None:
    """Rename-aside swap of a fully-written `tmp_path` over `path`."""
    fs, dst = _fs_and_path(spark, path)
    _, tmp = _fs_and_path(spark, tmp_path)
    _, old = _fs_and_path(spark, path + OLD_SUFFIX)
    if fs.exists(old):  # leftover from an interrupted earlier swap
        fs.delete(old, True)
    had_dst = fs.exists(dst)
    if had_dst and not fs.rename(dst, old):
        raise IOError(f"swap failed: could not set aside {dst} -> {old}")
    if not fs.rename(tmp, dst):
        # roll back so the table is never left absent
        if had_dst:
            fs.rename(old, dst)
        raise IOError(f"swap failed: could not rename {tmp} -> {dst}")
    if had_dst:
        fs.delete(old, True)
