"""twoforone_tpu — TPU-native diffusion models and force fields for CG molecular dynamics.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
microsoft/two-for-one-diffusion ("Two for One: Diffusion Models and Force
Fields for Coarse-Grained Molecular Dynamics", JCTC 2023):

- one DDPM trained on coarse-grained (C-alpha bead) protein conformations,
- used for i.i.d. equilibrium sampling (full reverse chain) and
- as a force field at a fixed noise level driving Langevin dynamics.

Everything on the hot path is pure-functional jnp compiled under ``jax.jit``:
the reverse-diffusion chain and the Langevin integrator are ``lax.scan`` loops,
forces come from ``jax.grad`` of the learned energy, and parallel chains /
sample batches shard over a ``jax.sharding.Mesh``.
"""

__version__ = "0.1.0"

from twoforone_tpu.core.diffusion import GaussianDiffusion  # noqa: F401
from twoforone_tpu.models import get_model  # noqa: F401
