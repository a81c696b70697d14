"""Bounded persist lifecycle shared by repeat-call cache sites.

``one_slot_persist`` persists a DataFrame and releases the PREVIOUS call's
table for the same slot — the idiom that fixed the round-2 linker leak
(a persist per call that was never unpersisted: the bench doubled storage
by running every query twice).  Side effect callers accept: a still-lazy
result DataFrame from an earlier call loses its cache when a later call
claims the slot — it recomputes correctly, just without the cached read.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def no_pushdown(cond: Column) -> Column:
    """OR an always-false non-deterministic guard onto a filter predicate so
    Catalyst cannot push it below the projection/exchange that computes the
    predicate's inputs. Needed when the predicate references an EXPENSIVE
    derived column (``from_json``, a regex chain): the pushed copy re-derives
    the expression below the fan-out exchange — i.e. on the unsplittable
    single-row-group scan side, in ONE task, for every row (measured: the
    wikidata 10x entity parse ran twice, once single-threaded — 44 s → 22 s
    after guarding; the engine namespace gate likewise). The guard must be an
    OR-ed always-FALSE arm: an AND-ed always-true arm is split off and the
    deterministic conjunct pushed anyway, and ``rand() < -1`` is constant-
    folded by Spark 4 (rand's range is known). ``monotonically_increasing_id()
    < -1`` ≡ false (ids are non-negative), is non-deterministic (never
    pushed/reordered) and is not folded, so results are unchanged and task
    retries are safe (the arm is false on every draw)."""
    return cond | (F.monotonically_increasing_id() < F.lit(-1))


def one_slot_persist(slot: list, df: DataFrame) -> DataFrame:
    """Persist ``df``; unpersist whatever the slot held before."""
    df = df.persist()
    while slot:
        slot.pop().unpersist()
    slot.append(df)
    return df


_REGISTERED_CKPT_DIR: list = []  # first checkpoint dir registered on the context


def truncate_lineage(df: DataFrame, *, eager: bool, checkpoint_dir: str | None = None) -> DataFrame:
    """Per-round lineage truncation for iterative operators.

    ``checkpoint_dir=None`` → ``localCheckpoint``: fastest, but blocks live
    in executor storage — on a real cluster an executor loss kills the job
    instead of recomputing (fine on local[*], the default here). With a
    ``checkpoint_dir`` (HDFS/S3 path on a cluster) the truncation goes
    through a RELIABLE ``checkpoint()`` so iterative jobs survive executor
    loss; the dir is registered on the SparkContext on first use."""
    if checkpoint_dir is None:
        return df.localCheckpoint(eager=eager)
    sc = df.sparkSession.sparkContext
    if sc._jsc.sc().getCheckpointDir().isEmpty():
        sc.setCheckpointDir(checkpoint_dir)
        _REGISTERED_CKPT_DIR.append(checkpoint_dir)
    elif _REGISTERED_CKPT_DIR and _REGISTERED_CKPT_DIR[0] != checkpoint_dir:
        import warnings

        warnings.warn(
            f"truncate_lineage: checkpoint_dir {checkpoint_dir!r} differs from the "
            f"SparkContext's already-registered {_REGISTERED_CKPT_DIR[0]!r}; "
            f"checkpoints will land under the registered dir (ADVICE r5: one "
            f"checkpoint dir per SparkContext — set it before the first iterative "
            f"job)"
        )
    return df.checkpoint(eager=eager)
