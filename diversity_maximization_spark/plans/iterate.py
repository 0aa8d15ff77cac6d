"""Audited iteration primitives for self-derived join loops.

Every iterative DataFrame algorithm in this engine (pointer doubling,
min-label propagation, BFS frontiers, k-core/k-truss peeling, BPE
merge rounds) re-derives the next state by joining the current state
— often with itself. Two driver-side failure modes hide there, both
invisible to correctness gates and only caught by the round-6 scale
ladder:

1. **Lineage growth**: without checkpointing, the logical plan doubles
   per round and analysis/optimization time explodes. Fix:
   ``localCheckpoint(eager=True)`` per round (cheap, keeps blocks on
   executors).
2. **Stats squaring**: ``localCheckpoint`` truncates lineage but
   ``rewriteStats`` PROPAGATES sizeInBytes into the LogicalRDD, and
   Catalyst's join-stats visitor MULTIPLIES the children's stats. When
   both join sides descend from the same evolving state the stat
   SQUARES every round — bits double per round, and by round ~14 the
   driver is doing Toom-Cook multiplication of multi-megabit
   BigIntegers (measured in round 6: an 18-minute driver-side hang at
   rounds=16 / 60k rows, zero executor tasks). Fix: every ``every``
   rounds a parquet round-trip resets the stat to the true file size,
   bounding growth between barriers at 2^every x file-size bits.

Loops that join the evolving state against a CONSTANT table (label
propagation vs a fixed edge list) only grow the stat linearly per
round and need mode (1) only; loops whose join is state-vs-state
(pointer doubling, transitive closure by squaring) need mode (2).
``iterate_with_barrier`` is the one audited loop driver for both; the
pinned regression test (tests/test_plans.py) asserts the stat stays
bounded across rounds so the hang cannot silently return.
"""

from __future__ import annotations

import shutil
import tempfile
from typing import Callable

from pyspark.sql import DataFrame


def stats_barrier(
    df: DataFrame,
    r: int,
    every: int = 4,
    squaring: bool = True,
    eager: bool = True,
) -> DataFrame:
    """Checkpoint round ``r`` of an iterative loop.

    Always truncates lineage with ``localCheckpoint(eager=True)``;
    when ``squaring`` (the state-vs-state join case) ALSO resets
    Catalyst's propagated sizeInBytes with a parquet round-trip every
    ``every`` rounds, so the join-stats product can't square into
    multi-megabit BigInteger arithmetic on the driver.

    The round-trip dir is deleted BEFORE returning (r8, ADVICE fix —
    the old code leaked one /tmp dir per barrier): the read-back is
    immediately re-checkpointed eagerly, which pins every partition in
    the block manager while PRESERVING the parquet relation's
    file-size stat in the resulting LogicalRDD (rewriteStats copies
    the child's sizeInBytes — the reset is exactly what the barrier
    exists for), so the files are never re-read and can be removed at
    once. Failure-recovery note (r8 ADVICE): localCheckpoint blocks
    are not fault-tolerant, and the source parquet is gone — losing a
    block after this returns is a HARD job failure, not a recompute.
    Acceptable in the documented local/single-node scope (one JVM, no
    executor loss short of process death); a cluster deployment would
    use reliable ``checkpoint()`` against shared storage and clean
    asynchronously.

    ``eager=False`` (r11, constant-join-side loops with a FIXED round
    count and no per-round convergence action only): the checkpoint
    still truncates lineage at PLAN level immediately — the returned
    frame's logical plan is a LogicalRDD either way, so analysis cost
    and the stats protections are identical — but materialization
    happens inside the caller's single final action instead of one
    blocking job per round (the graph_hits r11 pattern). Loops that
    run a per-round action anyway (convergence counts) gain nothing
    and keep eager=True."""
    df = df.localCheckpoint(eager=eager)
    if squaring and r % every == every - 1:
        path = tempfile.mkdtemp(prefix="dms_stats_barrier_")
        try:
            df.write.mode("overwrite").parquet(path)
            df = df.sparkSession.read.parquet(path).localCheckpoint(
                eager=True
            )
        finally:
            shutil.rmtree(path, ignore_errors=True)
    return df


def iterate_with_barrier(
    state: DataFrame,
    step: Callable[[DataFrame, int], DataFrame],
    rounds: int,
    every: int = 4,
    squaring: bool = True,
    converged: Callable[[DataFrame, int], bool] | None = None,
    eager: bool = True,
) -> DataFrame:
    """Run ``state = step(state, r)`` for up to ``rounds`` rounds with
    the stats barrier applied after every step.

    ``converged(state, r)`` (checked AFTER the barrier, so any action
    it runs hits checkpointed data) stops early when it returns True.
    ``squaring=False`` is the constant-join-side mode: lineage
    truncation only, no parquet round-trips."""
    for r in range(rounds):
        state = stats_barrier(
            step(state, r), r, every=every, squaring=squaring, eager=eager
        )
        if converged is not None and converged(state, r):
            break
    return state
