"""Hadoop FileSystem helpers for engine-managed directories.

Modules that own on-disk state (bucketed dedup intermediates, split-filter
tables, merge-lineage checkpoints) route existence checks, listings, and
deletion through the Hadoop FileSystem API of the live SparkSession rather
than driver-local ``os``/``shutil``. That makes every path scheme Spark can
write — local, ``hdfs://``, ``s3a://`` — equally manageable: a remote
``spark.qfilter.intermediateDir`` is actually swept and actually freed,
instead of the driver silently no-opping (or worse, rmtree-ing an unrelated
local path that shares the path component of a remote URI).

All helpers are best-effort where the callers are best-effort: ``delete``
and ``list_entries`` swallow filesystem errors (a raced concurrent cleanup
must not fail the query), while ``exists`` propagates none.
"""

from __future__ import annotations


def jpath(spark, path: str):
    return spark._jvm.org.apache.hadoop.fs.Path(path)


def get_fs(spark, path: str):
    """The FileSystem owning ``path`` (resolves the scheme/authority)."""
    return jpath(spark, path).getFileSystem(spark._jsc.hadoopConfiguration())


def exists(spark, path: str) -> bool:
    try:
        return bool(get_fs(spark, path).exists(jpath(spark, path)))
    except Exception:
        return False


def is_dir(spark, path: str) -> bool:
    try:
        fs = get_fs(spark, path)
        p = jpath(spark, path)
        return bool(fs.exists(p)) and bool(fs.getFileStatus(p).isDirectory())
    except Exception:
        return False


def delete(spark, path: str) -> bool:
    """Recursive best-effort delete; True when the path is gone."""
    try:
        fs = get_fs(spark, path)
        p = jpath(spark, path)
        if not fs.exists(p):
            return True
        return bool(fs.delete(p, True))
    except Exception:
        return False


def list_entries(spark, base: str) -> list[tuple[str, float, bool]]:
    """``(name, mtime_secs, is_dir)`` for each child of ``base``; empty on
    a missing/unlistable base (mirrors the old os.listdir OSError path)."""
    try:
        fs = get_fs(spark, base)
        p = jpath(spark, base)
        if not fs.exists(p):
            return []
        out = []
        for st in fs.listStatus(p):
            out.append((st.getPath().getName(),
                        st.getModificationTime() / 1000.0,
                        bool(st.isDirectory())))
        return out
    except Exception:
        return []


def child(base: str, name: str) -> str:
    """URI-safe join (``os.path.join`` is fine for posix paths but this
    keeps intent explicit for scheme-qualified bases)."""
    return base.rstrip("/") + "/" + name


def total_length(spark, input_files: list[str], max_dirs: int = 64) -> int:
    """Total bytes of a set of scan input files (one ``listStatus`` RPC
    per distinct parent directory, same shape as :func:`content_stamp`).
    Returns 0 when nothing is listable — callers must treat 0 as
    "unknown" and fall back to a safe default."""
    by_parent: dict[str, set[str]] = {}
    for f in input_files:
        if "/" in f:
            d, name = f.rsplit("/", 1)
            by_parent.setdefault(d, set()).add(name)
    if len(by_parent) > max_dirs:
        return 0
    total = 0
    matched = 0
    for d in sorted(by_parent):
        names = by_parent[d]
        try:
            fs = get_fs(spark, d)
            for st in fs.listStatus(jpath(spark, d)):
                if st.getPath().getName() in names:
                    total += int(st.getLen())
                    matched += 1
        except Exception:
            return 0
    # any input file missing from its parent's listing (deleted between
    # planning and sizing, URI-escaped name mismatch, ...) makes the sum
    # a silent undercount — report unknown instead of a partial total
    if matched < sum(len(v) for v in by_parent.values()):
        return 0
    return total


def content_stamp(spark, input_files: list[str], max_dirs: int = 64) -> int:
    """A freshness fingerprint for a set of scan input files: hashes each
    distinct parent directory's listing of ``(name, mtime, length)``.

    Used to salt content-address cache keys so an input overwritten
    mid-session can never serve a stale derived table. One ``listStatus``
    RPC per distinct parent directory (not per file); beyond ``max_dirs``
    distinct parents the stamp degrades to the sorted path list only —
    still correct for append/replace-by-new-path layouts (Iceberg
    snapshots, date partitions), documented as weaker for sustained
    in-place overwrites of enormous many-directory tables.
    """
    import hashlib

    h = hashlib.blake2b(digest_size=8)
    for f in sorted(input_files):
        h.update(f.encode())
    by_parent: dict[str, set[str]] = {}
    for f in input_files:
        if "/" in f:
            d, name = f.rsplit("/", 1)
            by_parent.setdefault(d, set()).add(name)
    if len(by_parent) > max_dirs:
        return int.from_bytes(h.digest(), "big")
    for d in sorted(by_parent):
        names = by_parent[d]  # per-directory: an unrelated file in one
        try:                  # dir sharing a basename with an input file
            fs = get_fs(spark, d)  # from ANOTHER dir must not perturb it
            stats = sorted(
                (st.getPath().getName(), st.getModificationTime(), st.getLen())
                for st in fs.listStatus(jpath(spark, d)))
            for name, mtime, length in stats:
                if name in names:
                    h.update(f"{d}|{name}|{mtime}|{length}".encode())
        except Exception:
            h.update(f"{d}|unlistable".encode())
    return int.from_bytes(h.digest(), "big")
