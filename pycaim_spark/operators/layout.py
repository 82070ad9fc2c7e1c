"""Snapshot-pointer commits for the bucketed table layout (r17).

The r16 store bases (minhash ``sets``/``buckets``, IVF-PQ ``codes``)
already commit through immutable versioned dirs behind an atomic
pointer; the bucketed TABLE still mutated its one live file set — the
upsert swap's remove/rename instant was the last place a lockless
reader could crash (VERDICT r16 #1, citing advanced.py's own "residual
window" docstring). This module ports the pattern to the layout:

- A mutable relation ``rel`` inside a layout slug lives in IMMUTABLE
  version dirs ``{rel}_v{N}``; the single commit point is the atomic
  pointer file ``{rel}_current.json`` = ``{"version": N, "dir":
  "{rel}_v{N}", ...}`` with the state the version serves (the CDC batch
  spec, the stream's applied-batch manifest, the re-bucket progress)
  folded INSIDE the pointer, exactly like the signature store folds its
  layer manifest into ``current.json`` — no interleaving can pair a new
  file set with a stale batch record.
- A MERGE publishes version N+1 by HARD-LINKING the untouched buckets'
  files from version N (zero byte copy — the local stand-in for a
  table-format manifest that simply re-lists unchanged data files) and
  moving the staged rewrites in, then flips the pointer. Version N's
  dir is never mutated: a lockless reader that resolved it keeps
  scanning intact files.
- Displaced versions are tombstoned in place (underscore-prefixed
  ``_superseded.json``, invisible to parquet scans) and collected by
  `gc_layout_versions` on later WRITE passes after
  ``$PYCAIM_LAYOUT_GC_GRACE`` (default 900 s) — the repo-wide two-phase
  GC rule ("never delete store files a lockless reader may have
  resolved").
- Crash recovery needs no undo journal: a version dir the pointer does
  not reference was never published, so the next locked writer simply
  deletes it and re-merges from the last committed version. This
  replaces the r16 in-place arm's pending-journal + undo-dir rollback
  (strictly less machinery for strictly more safety).

On an object store the pointer write is the table-format snapshot
commit and hard links become manifest entries; flock + link is the
single-host stand-in (same caveat as the signature store).
"""

from __future__ import annotations

import json
import os
import re
import shutil
import sys
import time

import cloudpickle as _cloudpickle

from pycaim_spark.operators.merge import mv_with_crc

_VDIR_RE = re.compile(r"^(.+)_v(\d+)$")


def _pointer_path(slug_dir: str, rel: str) -> str:
    return os.path.join(slug_dir, f"{rel}_current.json")


def load_layout_pointer(slug_dir: str, rel: str) -> dict | None:
    """Parse ``{rel}_current.json``; None if absent or unparseable
    (written only via `_write_json_atomic`, so unparseable ⇒ legacy
    artifact, same doctrine as the store pointer)."""
    path = _pointer_path(slug_dir, rel)
    if not os.path.exists(path):
        return None
    try:
        with open(path) as f:
            ptr = json.load(f)
        return ptr if isinstance(ptr.get("version"), int) else None
    except (OSError, ValueError, AttributeError):
        return None


def resolve_layout_rel(slug_dir: str, rel: str) -> tuple[str, dict | None]:
    """One atomic pointer parse → (current data dir, pointer). A rel
    that was never version-published resolves to its plain dir (the
    builder's original bucketed write) with pointer None — version 0 in
    spirit; `publish_layout_version` starts at v1 from there."""
    ptr = load_layout_pointer(slug_dir, rel)
    if ptr is not None:
        return os.path.join(slug_dir, ptr["dir"]), ptr
    return os.path.join(slug_dir, rel), None


def _link_or_copy(src: str, dst: str) -> None:
    try:
        os.link(src, dst)
    except OSError:
        shutil.copy2(src, dst)


def publish_layout_version(
    slug_dir: str,
    rel: str,
    *,
    src_dir: str | None,
    skip_names: set[str] | None = None,
    staged_files: list[str] | None = None,
    extra: dict | None = None,
    prebuilt_dir: str | None = None,
) -> tuple[str, dict]:
    """Publish the next version of ``rel`` and atomically flip its
    pointer — the caller MUST hold the layout flock (publishes are
    serialized; readers never take it).

    Content = hard links of every file in ``src_dir`` except
    ``skip_names`` (the touched buckets' displaced files; their hidden
    ``.crc`` sidecars are skipped with them) + ``staged_files`` moved
    in. ``src_dir`` may belong to a DIFFERENT rel (the clone arm links
    its base relation's untouched files — a zero-copy clone), or be
    None with ``prebuilt_dir`` set: a dir whose entire content was
    staged fresh (pristine rebuilds, re-bucket completions) is RENAMED
    into place as the new version instead of link-assembled.

    The pointer carries ``extra`` verbatim (batch spec / applied
    manifest / split progress — the commit record). Returns
    (version dir, new pointer). Never touches the previous version's
    files: tombstoning the displaced dir is the CALLER's decision
    (`tombstone_layout_dir`), because the source may be another rel's
    live state."""
    old = load_layout_pointer(slug_dir, rel)
    n = (old["version"] + 1) if old else 1
    vname = f"{rel}_v{n}"
    vdir = os.path.join(slug_dir, vname)
    if os.path.exists(vdir):
        # Unpublished leftover from a crashed publish (we hold the
        # lock, so no live writer owns it) — never pointer-referenced,
        # so no reader can have resolved it.
        shutil.rmtree(vdir)
    if prebuilt_dir is not None:
        os.rename(prebuilt_dir, vdir)
    else:
        os.makedirs(vdir)
        skip = skip_names or set()
        for fn in os.listdir(src_dir):
            full = os.path.join(src_dir, fn)
            if not os.path.isfile(full):
                continue
            if fn == "_superseded.json" or fn.endswith(".tmp"):
                continue
            base = fn[1:-len(".crc")] if (
                fn.startswith(".") and fn.endswith(".crc")
            ) else fn
            if base in skip:
                continue
            _link_or_copy(full, os.path.join(vdir, fn))
        for f in staged_files or ():
            mv_with_crc(f, vdir)
    from pycaim_spark.operators.dedup import _write_json_atomic

    ptr = {"version": n, "dir": vname, **(extra or {})}
    _write_json_atomic(_pointer_path(slug_dir, rel), ptr)
    return vdir, ptr


def rewrite_layout_pointer(slug_dir: str, rel: str, ptr: dict) -> None:
    """Atomically rewrite a rel's pointer in place (same version/dir,
    updated commit record — e.g. recording an empty CDC batch)."""
    from pycaim_spark.operators.dedup import _write_json_atomic

    _write_json_atomic(_pointer_path(slug_dir, rel), dict(ptr))


def tombstone_layout_dir(path: str) -> None:
    """Phase-1 GC: mark a displaced version dir for collection after
    grace. Underscore-prefixed so parquet scans of the dir (a reader
    still inside its grace window) never see it as data."""
    if not os.path.isdir(path):
        return
    from pycaim_spark.operators.dedup import _write_json_atomic

    _write_json_atomic(
        os.path.join(path, "_superseded.json"), {"ts": time.time()}
    )


def gc_layout_versions(slug_dir: str) -> None:
    """Phase-2 GC + crash sweep, under the layout flock:

    - any dir carrying ``_superseded.json`` older than
      ``$PYCAIM_LAYOUT_GC_GRACE`` (default 900 s) is deleted — a
      displaced version past every reader's grace window;
    - any ``{rel}_v{N}`` dir the rel's pointer does not reference and
      that is not tombstoned is a CRASHED PARTIAL PUBLISH (publishes
      happen under the lock we hold; a committed-then-displaced version
      is always tombstoned first) — deleted immediately, no reader can
      hold a dir that was never pointer-visible. A pointer FILE that
      exists but fails to parse makes us skip the rel entirely
      (fail-safe: never delete on ambiguity);
    - legacy r16 undo dirs (``*_old-*`` with a bare ``superseded.json``)
      are collected past the same grace.
    """
    if not os.path.isdir(slug_dir):
        return
    grace = float(os.environ.get("PYCAIM_LAYOUT_GC_GRACE", "900"))
    now = time.time()
    for d in os.listdir(slug_dir):
        p = os.path.join(slug_dir, d)
        if not os.path.isdir(p):
            continue
        tomb = os.path.join(p, "_superseded.json")
        legacy_tomb = os.path.join(p, "superseded.json")
        if os.path.exists(tomb) or ("_old-" in d and os.path.exists(legacy_tomb)):
            if _gc_retained(slug_dir, p, d):
                continue  # pinned snapshot (time travel): never collect
            m = _VDIR_RE.match(d)
            if m and os.path.exists(tomb):
                ptr = load_layout_pointer(slug_dir, m.group(1))
                if ptr is not None and ptr.get("dir") == d:
                    # The rel's pointer still references this dir: the
                    # tombstone is debris from an interrupted cleanup —
                    # resurrect the LIVE state rather than collect it.
                    os.remove(tomb)
                    continue
            src = tomb if os.path.exists(tomb) else legacy_tomb
            try:
                with open(src) as f:
                    ts = float(json.load(f).get("ts", now))
            except (OSError, ValueError, TypeError):
                continue  # unreadable tombstone: leave for a later pass
            if now - ts > grace:
                shutil.rmtree(p, ignore_errors=True)
            continue
        if d.endswith("_stage") or "_feed_tmp_" in d:
            # Stage/scratch dirs only live inside a locked writer's own
            # motion; one visible at lock-acquisition (gc always runs
            # under the flock) is an orphan from a crashed motion —
            # unpublished by construction, no reader ever resolves it.
            shutil.rmtree(p, ignore_errors=True)
            continue
        m = _VDIR_RE.match(d)
        if m:
            rel = m.group(1)
            if os.path.exists(_pointer_path(slug_dir, rel)):
                ptr = load_layout_pointer(slug_dir, rel)
                if ptr is None:
                    continue  # unparseable pointer: fail safe, skip rel
                if ptr["dir"] != d:
                    shutil.rmtree(p, ignore_errors=True)
            else:
                # No pointer at all: crashed before the rel's first
                # publish — the plain dir is still the live state.
                shutil.rmtree(p, ignore_errors=True)


def _gc_retained(slug_dir: str, path: str, dirname: str) -> bool:
    """True if ``dirname`` is a RETAINED version of its rel — pinned in
    the pointer's ``retained`` list (time travel, r17): retention
    overrides the tombstone, so a pinned snapshot stays readable past
    the grace window until the pin is dropped (``unretain``)."""
    m = _VDIR_RE.match(dirname)
    if not m:
        return False
    ptr = load_layout_pointer(slug_dir, m.group(1))
    return ptr is not None and int(m.group(2)) in (
        ptr.get("retained") or ()
    )


def resolve_layout_rel_version(
    slug_dir: str, rel: str, version: int
) -> str:
    """TIME TRAVEL: the data dir of a SPECIFIC committed version.
    Version dirs are immutable once published, so any version still on
    disk — the current one, a tombstoned one inside its grace window,
    or a RETAINED one pinned in the pointer's ``retained`` list — reads
    consistently. Raises FileNotFoundError for an expired (collected)
    version: history retention is explicit, not unbounded."""
    ptr = load_layout_pointer(slug_dir, rel)
    if ptr is not None and ptr["version"] == version:
        return os.path.join(slug_dir, ptr["dir"])
    if version == 0:
        path = os.path.join(slug_dir, rel)
    else:
        path = os.path.join(slug_dir, f"{rel}_v{version}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        raise FileNotFoundError(
            f"version {version} of {rel} in {slug_dir} is not on disk "
            "(expired past its grace window and not in the pointer's "
            "retained list)"
        )
    return path


# Ship by value: Spark workers cannot import pycaim_spark (driver-only
# sys.path).
_cloudpickle.register_pickle_by_value(sys.modules[__name__])
