"""RePaint time-travel (jump/resample) schedules as static step programs.

The reference walks a Python list of timesteps, branching per pair into a
denoise or a re-noise ("undo") transition (models/gaussian_diffusion.py:
1211-1278, models/scheduler.py:70-208).  Data-dependent Python control flow
like that defeats XLA, so here the walk is precomputed into a ``StepProgram``
— stacked int/bool arrays — and the sampler runs one ``lax.scan`` over it.
Every transition becomes the same traced step with a ``denoise`` predicate,
which keeps the whole DDIM+RePaint loop on-device as a single executable.
"""

from __future__ import annotations

from typing import List, NamedTuple

import jax.numpy as jnp


def jump_schedule(t_T: int, jump_length: int, jump_n_sample: int) -> List[int]:
    """RePaint jump schedule starting from ``t_T``.

    Matches the generator at reference models/scheduler.py:150-176 (paper
    variant) generalised to arbitrary t_T/jump params as in
    ``get_schedule_jump_cjm_ddim`` (:178-208).
    """
    jumps = {j: jump_n_sample - 1 for j in range(0, t_T - jump_length, jump_length)}
    t = t_T
    ts: List[int] = []  # NOTE: t_T itself is not walked — the first
    # transition pair is (t_T - 1, t_T - 2) (reference scheduler.py:192-203)
    while t >= 1:
        t -= 1
        ts.append(t)
        if jumps.get(t, 0) > 0:
            jumps[t] -= 1
            for _ in range(jump_length):
                t += 1
                ts.append(t)
    ts.append(-1)
    _check_times(ts, -1, t_T)
    return ts


def jump_schedule_ddim(
    time_respacing: int = 25, jump_length: int = 1, jump_n_sample: int = 1
) -> List[int]:
    """The DiffSHEG outpainting schedule: starts at 60% of the respaced chain
    (t_T = 15 for ddim25 — reference models/scheduler.py:178-183), because the
    overlap frames carry enough signal that the first 40% of denoising is
    redundant.  This truncation is the paper's speed/quality knob.
    """
    t_T = 15 if time_respacing == 25 else int(time_respacing * 0.6)
    return jump_schedule(t_T, jump_length, jump_n_sample)


def generic_jump_schedule(
    t_T: int,
    n_sample: int = 1,
    jump_length: int = 1,
    jump_n_sample: int = 1,
    jump2_length: int = 1,
    jump2_n_sample: int = 1,
    jump3_length: int = 1,
    jump3_n_sample: int = 1,
    start_resampling: int = 10 ** 8,
) -> List[int]:
    """The fully-general RePaint walk (reference models/scheduler.py:70-148,
    ``get_schedule_jump``) with all knobs: inline micro-resampling
    (``n_sample``), THREE nested jump levels, and a ``start_resampling``
    gate below which resampling activates.  Taking a level-1 jump refills
    the level-2 and level-3 budgets; a level-2 jump refills level-3 —
    the hierarchy lets short jumps re-run inside each long-jump span.

    Every shipped reference config leaves these at defaults (where this
    degenerates to :func:`jump_schedule` — asserted by tests), but the
    surface exists for schedule experiments; compile the result with
    :func:`make_step_program` like any other walk.
    """

    def budgets(length: int, per_site: int) -> dict:
        return {site: per_site - 1
                for site in range(0, t_T - length, length)}

    lvl1 = budgets(jump_length, jump_n_sample)
    lvl2 = budgets(jump2_length, jump2_n_sample)
    lvl3 = budgets(jump3_length, jump3_n_sample)

    t = t_T
    ts: List[int] = []

    def climb(n: int) -> None:
        nonlocal t
        for _ in range(n):
            t += 1
            ts.append(t)

    while t >= 1:
        t -= 1
        ts.append(t)

        # inline micro-resampling: (n_sample - 1) up/down pairs at t
        if t + 1 < t_T - 1 and t <= start_resampling:
            for _ in range(n_sample - 1):
                climb(1)
                t -= 1
                ts.append(t)

        # innermost level first; outer levels refill the inner budgets
        if lvl3.get(t, 0) > 0 and t <= start_resampling - jump3_length:
            lvl3[t] -= 1
            climb(jump3_length)
        if lvl2.get(t, 0) > 0 and t <= start_resampling - jump2_length:
            lvl2[t] -= 1
            climb(jump2_length)
            lvl3 = budgets(jump3_length, jump3_n_sample)
        if lvl1.get(t, 0) > 0 and t <= start_resampling - jump_length:
            lvl1[t] -= 1
            climb(jump_length)
            lvl2 = budgets(jump2_length, jump2_n_sample)
            lvl3 = budgets(jump3_length, jump3_n_sample)

    ts.append(-1)
    _check_times(ts, -1, t_T)
    return ts


def jump_schedule_paper() -> List[int]:
    """The original RePaint paper schedule: t_T=250, jump_length=10,
    jump_n_sample=10 (reference models/scheduler.py:150-176) — used by the
    ancestral ``p_sample_loop_progressive_harmonize`` path
    (gaussian_diffusion.py:885)."""
    return jump_schedule(250, 10, 10)


def _check_times(times: List[int], t_0: int, t_T: int) -> None:
    assert times[0] > times[1], (times[0], times[1])
    assert times[-1] == -1, times[-1]
    for a, b in zip(times[:-1], times[1:]):
        assert abs(a - b) == 1, (a, b)
    for t in times:
        assert t_0 <= t <= t_T, (t, t_0, t_T)


class StepProgram(NamedTuple):
    """A static reverse-process program.

    ``t``        int32 (S,)  — timestep the transition operates at
    ``denoise``  bool  (S,)  — True: DDIM denoise t -> t-1; False: undo t-1 -> t

    For a denoise pair (t_last, t_cur = t_last-1) the model runs at t_last.
    For an undo pair (t_last, t_cur = t_last+1) the forward step runs at
    t = t_last (reference gaussian_diffusion.py:1273-1278 passes t_last to
    ``undo``).
    """

    t: jnp.ndarray
    denoise: jnp.ndarray

    @property
    def num_transitions(self) -> int:
        return self.t.shape[0]

    @property
    def num_model_calls(self) -> int:
        return int(self.denoise.sum())


def make_step_program(times: List[int]) -> StepProgram:
    """Compile a timestep walk (e.g. from ``jump_schedule_ddim``) into arrays."""
    t_steps, denoise = [], []
    for t_last, t_cur in zip(times[:-1], times[1:]):
        t_steps.append(t_last)
        denoise.append(t_cur < t_last)
    return StepProgram(
        t=jnp.asarray(t_steps, dtype=jnp.int32),
        denoise=jnp.asarray(denoise, dtype=bool),
    )


def plain_program(num_steps: int) -> StepProgram:
    """The non-outpainting program: every respaced step, descending
    (reference gaussian_diffusion.py:1187 ``indices = range(N)[::-1]``)."""
    t = jnp.arange(num_steps - 1, -1, -1, dtype=jnp.int32)
    return StepProgram(t=t, denoise=jnp.ones((num_steps,), dtype=bool))
