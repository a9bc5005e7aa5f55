"""Iterative fixpoint harness — the engine's replacement for the reference's
BSP executor (bsp/executor.go:8-124 RunToCompletion/RunSteps with
PreStep/PostStep/ShouldRunAnotherStep callbacks).

Catalyst cannot express iteration, so the engine owns this driver loop:
  - each superstep is a pure DataFrame -> DataFrame function (the
    ``compute_fn`` extension point, mirroring bsp.ComputeFunc — SURVEY §2.14
    U2);
  - lineage is truncated with localCheckpoint every ``checkpoint_every``
    iterations, otherwise 10-30 iterations of join/agg blow up the plan and
    the driver (the reference's 100k-vertex convergence test is the gate);
  - convergence is a driver-side predicate over per-step aggregates
    (ShouldRunAnotherStep).

At cluster scale, ``reliable_checkpoint`` should point at a fault-tolerant
checkpoint dir; localCheckpoint trades re-computability for speed, which is
the right default for iterative analytics that can simply rerun.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass
class IterationResult:
    state: DataFrame
    steps: int
    converged: bool
    history: list[dict]


def run_fixpoint(
    state: DataFrame,
    step_fn: Callable[[DataFrame, int], tuple[DataFrame, dict]],
    should_continue: Callable[[dict, int], bool],
    max_steps: int = 100,
    checkpoint_every: int = 1,
) -> IterationResult:
    """Run ``step_fn`` until ``should_continue`` says stop or ``max_steps``.

    ``step_fn(state, step) -> (new_state, metrics)`` — metrics is a dict of
    driver-side aggregates (the BSP "aggregators": SAD, active counts, ...).
    ``should_continue(metrics, step) -> bool`` evaluated after each step.
    """
    history: list[dict] = []
    current = state
    steps = 0
    converged = False
    for step in range(1, max_steps + 1):
        new_state, metrics = step_fn(current, step)
        if step % checkpoint_every == 0:
            new_state = new_state.localCheckpoint(eager=True)
        history.append(metrics)
        current = new_state
        steps = step
        if not should_continue(metrics, step):
            converged = True
            break
    return IterationResult(state=current, steps=steps, converged=converged, history=history)
