"""Single-file archive packaging — the clp_s ``single_file_archive`` analog.

The reference can emit one PORTABLE FILE per archive instead of a
directory: its e2e test parameterizes over ``single_file_archive``
(components/core/tests/test-clp_s-end_to_end.cpp:99-100) and the writer
packs header + metadata + streams into one file
(clp_s/ArchiveWriter.cpp write_single_file_archive path). A real user
moving archives between systems hits this first.

Spark-first analog: the archive DIRECTORY (dictionaries, records/columns
parquet, sidecar files) packs into one uncompressed ZIP container —
parquet parts are already zstd-compressed, so ``ZIP_STORED`` adds only the
central directory, which doubles as the member index (the reference's
metadata section). Spark scans need real files, so ``unpack_archive``
extracts once into a content-keyed cache directory (key = file identity +
mtime + size) and every query serves from there; repacking an archive
bumps the key, so stale state is never served. Extraction is atomic
(tmp dir + rename), safe under concurrent openers.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import zipfile

ARCHIVE_SUFFIX = ".clpa"
_MARKER = "_CLPA_FORMAT"
_FORMAT_VERSION = "clpspark-sfa-1"
# /dev/shm, not /tmp: every later query scans parquet from this cache,
# and /tmp is a slow virtio disk on this class of host (CLAUDE.md)
DEFAULT_CACHE_ROOT = "/dev/shm/clpspark_sfa"


def pack_archive(archive_dir: str, out_path: str | None = None) -> str:
    """Bundle an archive directory into one portable file.

    Members are stored uncompressed in sorted order (deterministic bytes
    for identical input trees). Returns the packed file path
    (default: ``<archive_dir>.clpa``).
    """
    archive_dir = os.path.abspath(archive_dir)
    if not os.path.isdir(archive_dir):
        raise FileNotFoundError(f"not an archive directory: {archive_dir}")
    if out_path is None:
        out_path = archive_dir.rstrip("/") + ARCHIVE_SUFFIX
    members: list[str] = []
    for root, _dirs, files in os.walk(archive_dir):
        for name in files:
            full = os.path.join(root, name)
            members.append(os.path.relpath(full, archive_dir))
    members.sort()
    tmp = out_path + ".tmp"
    with zipfile.ZipFile(tmp, "w", compression=zipfile.ZIP_STORED) as z:
        z.writestr(_MARKER, _FORMAT_VERSION)
        for rel in members:
            z.write(os.path.join(archive_dir, rel), arcname=rel)
    os.replace(tmp, out_path)
    return out_path


def is_single_file_archive(path: str) -> bool:
    return os.path.isfile(path) and zipfile.is_zipfile(path)


def unpack_archive(path: str,
                   cache_root: str = DEFAULT_CACHE_ROOT) -> str:
    """Extract a packed archive into the cache; returns the directory.

    Keyed on (absolute path, mtime_ns, size): a repacked file lands in a
    fresh directory, so directory-handle memos keyed on the extraction
    never see stale state. Concurrent openers race benignly — extraction
    goes to a unique tmp dir and publishes with an atomic rename.
    """
    path = os.path.abspath(path)
    st = os.stat(path)
    key = hashlib.sha256(
        f"{path}\x00{st.st_mtime_ns}\x00{st.st_size}".encode()
    ).hexdigest()[:24]
    dest = os.path.join(cache_root, key)
    if os.path.exists(os.path.join(dest, _MARKER)):
        return dest
    os.makedirs(cache_root, exist_ok=True)
    tmp = f"{dest}.tmp.{os.getpid()}"
    with zipfile.ZipFile(path) as z:
        names = z.namelist()
        if _MARKER not in names:
            raise ValueError(f"not a clpspark single-file archive: {path}")
        for n in names:
            # zip members are archive-relative; refuse traversal
            if n.startswith("/") or ".." in n.split("/"):
                raise ValueError(f"unsafe member path in archive: {n!r}")
        z.extractall(tmp)
    try:
        os.replace(tmp, dest)
    except OSError:
        # a concurrent opener published first; ours is redundant
        shutil.rmtree(tmp, ignore_errors=True)
        if not os.path.exists(os.path.join(dest, _MARKER)):
            raise
    return dest


def resolve_archive_dir(path: str) -> str:
    """Directory view of an archive path: directories pass through,
    single-file archives extract (cached)."""
    if os.path.isdir(path):
        return path
    return unpack_archive(path)
