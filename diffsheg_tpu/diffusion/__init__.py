from diffsheg_tpu.diffusion.schedule import (
    DiffusionSchedule,
    get_named_beta_schedule,
    make_schedule,
)
from diffsheg_tpu.diffusion.respace import space_timesteps, make_respaced_schedule
from diffsheg_tpu.diffusion.jump import (
    jump_schedule,
    jump_schedule_ddim,
    StepProgram,
    make_step_program,
    plain_program,
)
from diffsheg_tpu.diffusion.vlb import (  # noqa: F401
    discretized_gaussian_log_likelihood,
    learned_range_logvar,
    normal_kl,
    prior_kl,
    split_learned_variance,
    vlb_term,
)
