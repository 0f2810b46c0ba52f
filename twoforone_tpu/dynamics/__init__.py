from twoforone_tpu.dynamics.integrators import (  # noqa: F401
    LangevinSimulation,
    baoab_step,
    overdamped_step,
)
from twoforone_tpu.dynamics.langevin import (  # noqa: F401
    LangevinDiffusion,
    make_diffusion_force_fn,
)
