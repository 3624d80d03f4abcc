"""Manifest-pointer table commit — the object-store-safe sink mode
(VERDICT r14 #4).

:func:`~pyspark_analytics_library_spark.sources.scan_queries._staged_overwrite`'s
rename-swap discipline is crash-safe only where directory ``rename`` is
atomic (POSIX local FS, HDFS).  On object stores (S3A et al.) "rename"
is copy+delete: a crash mid-"rename" leaves a half-copied table that
reads as if whole — the one deployment class a 100 TB engine actually
writes to.  This module supplies the committer that works there:

* every overwrite writes a FULL new generation under
  ``<target>/gen-<uuid>/`` — never touching the live one;
* the commit point is an atomic swap of ONE small pointer file
  ``<target>/_CURRENT`` naming the live generation.  Locally that swap
  is ``os.replace`` (POSIX-atomic); on an object store the same
  protocol is a single-object PUT, which S3 guarantees atomic with
  read-after-write consistency — no multi-object window exists at all;
* readers resolve through :func:`resolve_table` (pointer → generation
  dir), so a reader either sees the complete old generation or the
  complete new one, never a mixture.

Crash matrix: a failure during the generation write leaves the pointer
(and therefore every reader) on the old generation — the orphan
generation dir is reclaimed by :func:`_prune_generations` on the next
successful commit (it keeps the newest :data:`KEEP_GENERATIONS`
pointer-eligible dirs, current first).  A failure between "generation
complete" and "pointer swapped" is the same story: the commit simply
never happened.  There is no window in which the table is absent or
truncated — strictly stronger than the rename swap's documented
"briefly absent, recoverable by hand" gap.

Cost model at 100 TB: a generation is a full copy-on-write rewrite of
the table (same as the rename mode — both are overwrite sinks), and
``KEEP_GENERATIONS=2`` holds one superseded generation as the readers'
grace window + instant rollback, so peak storage is 2× table size.
Lakehouse table formats (Delta/Iceberg/Hudi — scoped out per SURVEY
§7) refine exactly this protocol with per-FILE manifests so an update
rewrites only touched files; the pointer-swap commit core is the same.

Mode selection: conf ``spark.analytics.sink.commitMode`` = ``rename``
(default — keeps every committed fixture attestation byte-identical)
or ``manifest``; ``_staged_overwrite`` dispatches on it and returns the
path readers should scan, which under manifest mode is the committed
generation dir.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame

#: Conf key selecting the overwrite-commit protocol.
MODE_CONF = "spark.analytics.sink.commitMode"

#: Pointer file naming the live generation (relative dir name inside
#: the target).  The leading underscore keeps Spark/Hadoop readers from
#: picking it up as data if someone scans the target root by mistake.
CURRENT_POINTER = "_CURRENT"

#: Generations retained after a successful commit: the live one plus
#: one superseded (readers' grace window + instant rollback).
KEEP_GENERATIONS = 2


def manifest_commit(df: DataFrame, target: str) -> str:
    """Write ``df`` as a new generation under ``target`` and atomically
    swap the ``_CURRENT`` pointer to it.  Returns the generation dir.

    Refuses a target that already holds a pointerless non-empty layout
    (i.e. a rename-mode parquet table): silently nesting generations
    inside a live flat table would leave bare-path readers seeing mixed
    content — the caller must migrate or clear the target explicitly.
    """
    if (
        os.path.isdir(target)
        and os.listdir(target)
        and not os.path.exists(os.path.join(target, CURRENT_POINTER))
    ):
        raise ValueError(
            f"{target} holds a non-manifest (rename-mode) table; refusing "
            "to nest generations inside it — clear it or keep commitMode="
            "rename for this target"
        )
    gen = f"gen-{uuid.uuid4().hex[:12]}"
    gen_dir = os.path.join(target, gen)
    try:
        df.write.mode("overwrite").parquet(gen_dir)
    except BaseException:
        # Data-sized failure window: pointer untouched, readers
        # unaffected; reclaim the partial generation eagerly.
        shutil.rmtree(gen_dir, ignore_errors=True)
        raise
    _swap_pointer(target, gen)
    _prune_generations(target, gen)
    return gen_dir


def _swap_pointer(target: str, gen: str) -> None:
    """Atomically repoint ``_CURRENT`` at ``gen``: write a temp file,
    ``os.replace`` over the pointer.  This is the ONLY mutation of
    shared state in the protocol — one small-file atomic swap, the
    operation object stores provide natively (single-object PUT), so
    nothing here depends on directory rename being atomic."""
    tmp = os.path.join(target, f".{CURRENT_POINTER}.{uuid.uuid4().hex[:8]}")
    with open(tmp, "w", encoding="utf-8") as f:
        f.write(gen + "\n")
    os.replace(tmp, os.path.join(target, CURRENT_POINTER))


def resolve_table(target: str) -> str:
    """Path readers should scan: the pointer's generation dir when
    ``target`` is a manifest table, else ``target`` itself (rename-mode
    tables and plain parquet dirs pass through untouched)."""
    ptr = os.path.join(target, CURRENT_POINTER)
    try:
        with open(ptr, encoding="utf-8") as f:
            gen = f.read().strip()
    except OSError:
        return target
    # The pointer names a relative child dir by contract; reject
    # anything else rather than resolve outside the table root.
    if not gen or os.sep in gen or gen != os.path.basename(gen):
        raise ValueError(f"corrupt {CURRENT_POINTER} in {target}: {gen!r}")
    return os.path.join(target, gen)


def _prune_generations(target: str, current: str) -> None:
    """Reclaim superseded/orphaned generations, keeping the live one
    plus the newest ``KEEP_GENERATIONS - 1`` others by mtime.  Runs
    after the pointer swap, so a crash here costs only disk, never
    correctness.  Best-effort: a racing reader's OS-level deletion
    semantics (open handles survive unlink on POSIX) plus the one-
    generation grace window keep in-flight scans safe; an object-store
    deployment would widen KEEP_GENERATIONS to its read-latency SLA."""
    try:
        gens = [
            n
            for n in os.listdir(target)
            if n.startswith("gen-") and n != current
        ]
        gens.sort(
            key=lambda n: os.path.getmtime(os.path.join(target, n)),
            reverse=True,
        )
        for n in gens[KEEP_GENERATIONS - 1 :]:
            shutil.rmtree(os.path.join(target, n), ignore_errors=True)
    except OSError:
        pass
