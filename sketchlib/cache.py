"""Hermetic /tmp cache management for derived tables (VERDICT r4 #1/#2).

Round-4 forensics showed the basename-keyed, write-if-missing cache dirs
under ``/tmp/sketchlib_cache/<sf>/`` are a shared mutable resource: any
concurrent run (fuzz gate, replica check, a second driver) can overwrite a
dir while another process reads it — preserving the row count but silently
corrupting values (the exact rows_match+hash_mismatch signature the driver
recorded for hourly_continuous_aggregate and sink_roundtrip_csv).

Two fixes, both here:

* **content-addressed immutable caches** (:func:`content_cache_path` +
  :func:`ensure_cached`): the path embeds a fingerprint of the input
  parquet files AND a code-version token, the build writes to a unique
  temp dir, and an atomic ``os.rename`` publishes it. Readers only ever
  see complete dirs; published dirs are NEVER overwritten; a builder that
  loses the publish race discards its own temp. Code changes or new input
  data automatically land on a fresh path (no manual version-bump
  ceremony — though callers still pass a version token so semantic
  changes that don't alter the code's inputs can force a new key).
* **run-scoped scratch paths** (:func:`run_scoped_path`): sink-roundtrip
  queries write to a per-run unique dir and remove it after read-back —
  no two runs ever share a sink path.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import uuid
from typing import Callable, Iterable

CACHE_ROOT = "/tmp/sketchlib_cache"


def _update_with_tree(h: "hashlib._Hash", path: str) -> None:
    """Feed (relative-name, size, mtime_ns) of every data file under
    ``path`` (a parquet file OR directory) into the hash, in sorted order.
    mtime_ns closes the size-collision hole (ADVICE r5): regenerated
    testdata that happens to produce byte-identical file sizes would
    otherwise alias to a stale cache."""

    def _feed(full: str, rel: str) -> None:
        st = os.stat(full)
        h.update(rel.encode())
        h.update(str(st.st_size).encode())
        h.update(str(st.st_mtime_ns).encode())

    if os.path.isfile(path):
        _feed(path, os.path.basename(path))
        return
    for root, dirs, files in os.walk(path):
        dirs.sort()
        for f in sorted(files):
            if f.startswith(".") or f.endswith(".crc"):
                continue
            full = os.path.join(root, f)
            _feed(full, os.path.relpath(full, path))


def content_cache_path(
    sf_dir: str, name: str, version: str, tables: Iterable[str]
) -> str:
    """Cache dir path keyed by (input content, code version): under
    ``CACHE_ROOT/<sf-basename>/<name>_<fp16>`` where the fingerprint
    hashes the version token plus the file list+sizes of every input
    ``<table>.parquet`` under ``sf_dir``. Same inputs + same code version
    → same path (reuse across runs); anything else → a fresh dir."""
    h = hashlib.sha256()
    h.update(version.encode())
    for t in sorted(tables):
        p = os.path.join(sf_dir, f"{t}.parquet")
        h.update(t.encode())
        if os.path.exists(p):
            _update_with_tree(h, p)
        else:
            h.update(b"<absent>")
    fp = h.hexdigest()[:16]
    base = os.path.basename(sf_dir.rstrip("/")) or "root"
    return os.path.join(CACHE_ROOT, base, f"{name}_{fp}")


def ensure_cached(
    path: str, writer: Callable[[str], None], expect: tuple[str, ...] = ()
) -> str:
    """Build-if-missing with an ATOMIC publish: ``writer(tmp)`` writes to
    a unique sibling temp dir, then ``os.rename`` publishes it at
    ``path``. POSIX rename onto an existing non-empty dir fails, so the
    first publisher wins, later builders discard their temp and read the
    winner — a published dir is immutable and readers can never observe a
    partial or mid-overwrite state.

    ``expect``: child paths (relative to the cache dir) that a VALID
    publication must contain. The marker alone proves the publish rename
    happened, not that every artifact the CONSUMER reads exists — a
    killed run's half-materialized state (or a writer edit that drops an
    artifact) would otherwise wedge the entry until manual rmtree
    (observed r6: an IVF cache published with ``index`` but no
    ``index_centroids`` after a SIGTERM mid-session). A marker-bearing
    dir missing an expected child is quarantined and rebuilt, and the
    same validation is applied to OUR OWN publication before returning."""
    marker = os.path.join(path, "_SUCCESS")

    def _valid() -> bool:
        return os.path.exists(marker) and all(
            os.path.exists(os.path.join(path, e)) for e in expect
        )

    def _dir_valid(d: str) -> bool:
        return os.path.exists(os.path.join(d, "_SUCCESS")) and all(
            os.path.exists(os.path.join(d, e)) for e in expect
        )

    if _valid():
        return path
    if os.path.exists(path):
        # a dir exists but LOOKED invalid — no _SUCCESS (writer that
        # skipped the marker, or success-marker conf disabled) or a
        # missing expected child: quarantine it so the publish below can
        # land instead of wedging forever (ADVICE r5, r6 partial-publish).
        # The validity check above is a stale observation by the time the
        # rename lands (TOCTOU): a concurrent builder may have published
        # a VALID dir in between, and acting on the stale check would
        # delete its publication — the one thing the atomic-publish
        # invariant forbids. So re-verify AFTER the atomic claim and put
        # a dir that turned out valid straight back.
        quarantine = f"{path}.markerless-{uuid.uuid4().hex}"
        try:
            os.rename(path, quarantine)
        except OSError:
            pass  # a concurrent builder already moved/published it
        else:
            if _dir_valid(quarantine):
                try:
                    os.rename(quarantine, path)
                    return path
                except OSError:
                    # a third publication landed at path meanwhile; the
                    # end-of-function validity check covers it
                    pass
            shutil.rmtree(quarantine, ignore_errors=True)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = f"{path}.tmp-{uuid.uuid4().hex}"
    try:
        writer(tmp)
        try:
            os.rename(tmp, path)
        except OSError:
            # lost the publish race (or a stale complete dir appeared) —
            # keep the winner's dir, drop ours
            pass
    finally:
        # a raising writer (or a lost race) must not leak the temp dir
        shutil.rmtree(tmp, ignore_errors=True)
    if not _valid():
        raise RuntimeError(
            f"cache publish failed for {path}: missing _SUCCESS marker or "
            f"an expected child of {expect} "
            f"(remediation: rm -rf {path} and rerun)"
        )
    return path


def run_scoped_path(name: str) -> str:
    """A per-run unique scratch dir (uuid-suffixed) for sink roundtrips:
    never shared between runs, removed by the caller after read-back."""
    return os.path.join(CACHE_ROOT, "run", f"{name}-{uuid.uuid4().hex}")


def discard(path: str) -> None:
    """Remove a run-scoped dir (best-effort)."""
    shutil.rmtree(path, ignore_errors=True)
