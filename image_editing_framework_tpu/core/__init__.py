from image_editing_framework_tpu.core.scheduler import (
    DDIMSchedule,
    make_ddim_schedule,
    ddim_step,
    ddim_reverse_step,
    add_noise,
)
from image_editing_framework_tpu.core import config
from image_editing_framework_tpu.core import rng
