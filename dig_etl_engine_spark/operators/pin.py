"""Lineage pinning with a cluster-profile knob.

Several operators pin intermediate tables so one physical result feeds
many consumers (minhash shingle/band tables, KMV sketches, iterative
round states): without a pin, Catalyst re-derives the whole lineage per
consumer — a measured 4× corpus re-scan in the minhash plan — and
iterative loops pay a compounding re-optimization cost per round.

The DEFAULT pin is ``localCheckpoint``: it truncates lineage to
executor-held blocks with zero external storage. The caveat (flagged in
external review): those blocks have NO lineage to recompute from, so on
a real cluster the loss of one executor mid-query fails every consumer
of the pin. That is the right trade on a single-node/local deployment
(this container, notebooks, small jobs) and the wrong one for long
multi-hour cluster runs. Rather than hard-coding one choice per call
site, every pin in the package routes through :func:`pin`, and the
session conf picks the strategy ONCE per deployment:

``spark.digetl.pin.strategy`` (read per call, so it can be changed
between queries on a live session):

* ``local`` (default) — ``localCheckpoint``; fastest, executor-loss
  fragile.
* ``reliable`` — ``DataFrame.checkpoint`` to the reliable checkpoint
  dir (``spark.digetl.pin.checkpointDir`` conf, or a dir already set
  via ``SparkContext.setCheckpointDir``); survives executor loss, costs
  a write to shared storage. The production setting for multi-hour
  jobs on preemptible fleets.
* ``persist`` — ``persist(MEMORY_AND_DISK)``; keeps full lineage, so
  executor loss triggers recomputation instead of failure, but does
  NOT truncate the logical plan (iterative loops still pay Catalyst
  re-optimization growth — prefer ``reliable`` for those).

``eager=True`` materializes the pin immediately (used by iterative
loops so each round's work is bounded); under ``persist`` this runs a
``count()`` to populate the cache, matching localCheckpoint(eager)
semantics.

``snapshot=True`` marks pins whose job is a point-in-time SNAPSHOT, not
a performance hint: the incremental dedup operators pin their result
BEFORE appending the batch's own rows to the index directory the plan
reads. For those, ``persist`` is semantically wrong — it keeps full
lineage, so a lost cache block (executor loss, memory pressure
eviction) re-executes the plan against the post-append directory and
the batch silently matches itself. Snapshot pins therefore upgrade
``persist`` to a true materialization: the reliable checkpoint when a
checkpoint dir is configured (honouring the durability intent), else
``localCheckpoint``. ``local``/``reliable`` already materialize
irreversibly and are unchanged. Snapshot pins are always eager — a
lazy snapshot is a contradiction (the directory mutates before the
first action otherwise).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

STRATEGY_CONF = "spark.digetl.pin.strategy"
CHECKPOINT_DIR_CONF = "spark.digetl.pin.checkpointDir"


def _checkpoint_dir(spark) -> str | None:
    """Resolve (and lazily install) the reliable checkpoint dir from
    the session conf; returns the active dir or None."""
    sc = spark.sparkContext
    conf_dir = spark.conf.get(CHECKPOINT_DIR_CONF, None)
    if conf_dir and not sc.getCheckpointDir():
        sc.setCheckpointDir(conf_dir)
    return sc.getCheckpointDir()


def pin(df: DataFrame, *, eager: bool = False,
        snapshot: bool = False) -> DataFrame:
    """Pin ``df``'s result for multi-consumer / iterative reuse under
    the session-selected strategy (module docstring). ``snapshot=True``
    demands an irreversible point-in-time materialization — the plan
    must never be able to re-execute (see module docstring)."""
    spark = df.sparkSession
    strategy = spark.conf.get(STRATEGY_CONF, "local")
    if snapshot:
        eager = True
    if strategy == "reliable":
        if not _checkpoint_dir(spark):
            raise ValueError(
                f"{STRATEGY_CONF}=reliable needs a checkpoint dir: set "
                f"{CHECKPOINT_DIR_CONF} or SparkContext.setCheckpointDir")
        return df.checkpoint(eager=eager)
    if strategy == "persist":
        if snapshot:
            # persist keeps lineage: a lost cache block re-EXECUTES the
            # plan, and for a snapshot pin the source has mutated by then
            # (wrong results, not slow results). Upgrade to a real
            # materialization; keep it durable if a dir is configured.
            if _checkpoint_dir(spark):
                return df.checkpoint(eager=True)
            return df.localCheckpoint(eager=True)
        from pyspark import StorageLevel
        out = df.persist(StorageLevel.MEMORY_AND_DISK)
        if eager:
            out.count()
        return out
    if strategy != "local":
        raise ValueError(
            f"unknown {STRATEGY_CONF}={strategy!r} "
            "(expected local | reliable | persist)")
    return df.localCheckpoint(eager=eager)
