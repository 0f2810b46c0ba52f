"""Diffusion-model force field -> Langevin dynamics driver.

Capability-parity redesign of reference dynamics/langevin.py:46-212:

- :func:`make_diffusion_force_fn` — the "ForcesWrapper": the learned score at
  one fixed noise level ``t`` is rescaled into a CG force field,
  ``F = -eps_hat(x, t) / kbt_inv / sqrt(1 - alpha_bar_t)``
  (reference dynamics/langevin.py:75-92). Here it returns a jit-able pure
  function that fuses the score-net forward (+ the jax.grad energy
  differentiation in conservative mode) into the integrator's scan body.
- :class:`LangevinDiffusion` — unit handling (KB in g/mol, Angstrom, ps, K),
  norm-factor algebra, auto-dt, and the BAOA(F)B simulation
  (reference dynamics/langevin.py:95-212).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from twoforone_tpu.data.molecules import AVOGADRO, JPERKCAL, KB, KBOLTZMANN
from twoforone_tpu.dynamics.integrators import LangevinSimulation


def resolve_fused_mode(model, fused: str, chains_per_dev, backend: str) -> str:
    """Resolve ``fused="auto"`` to a concrete force path from the measured
    win regimes (docs/PERF_NOTES.md): the chain-lane mega-kernel is 2.4-4x
    at N <= 10; beyond that Mosaic cannot compile it (register spill slots)
    and the attention-core clx path wins up to bba size from ~256 chains
    PER DEVICE (1.36x trp_cage / 1.12x bba at 1024 chains); at
    villin/protein_g the plain XLA geometric path is the fastest measured
    option. Force with fused="cl"/"clx" to experiment outside these.
    Explicit (non-"auto") values pass through untouched."""
    if fused != "auto":
        return fused

    from twoforone_tpu.ops.fused_score_cl import VERIFIED_MAX_N
    from twoforone_tpu.ops.fused_score_clx import CLX_MAX_N, CLX_MIN_CHAINS

    supported = (
        getattr(model, "conservative", False)
        and model.use_intrinsic_coords
        and not model.use_abs_coords
        and not model.use_distances
    )
    if backend in ("cpu",) or not supported:
        return "never"
    if model.num_beads <= VERIFIED_MAX_N:
        return "cl"
    if (
        model.num_beads <= CLX_MAX_N
        and chains_per_dev is not None
        and chains_per_dev >= CLX_MIN_CHAINS
    ):
        return "clx"
    return "never"


def make_diffusion_force_fn(
    diffusion: "GaussianDiffusion",  # noqa: F821
    params,
    t: int,
    kbt_inv: float,
    fused: str = "never",
    fused_block: int = 128,
    bf16: bool = False,
    n_chains: Optional[int] = None,
    mesh=None,
    interpret: bool = False,
):
    """Build ``x -> (potential, forces)`` from a diffusion model at noise level t.

    ``x`` is in *normalized* units (divided by norm_factor). The potential
    returned is zeros (as in the reference, dynamics/langevin.py:92).

    ``bf16`` runs the score net in bfloat16 (the TPU-idiomatic analogue of the
    reference's AMP, trainer.py:141): ~1.3-1.5x faster; validated to leave the
    Langevin equilibrium distribution unchanged on the exactly solvable
    Gaussian system (docs/PERF_NOTES.md). The fused Pallas kernels supersede
    this flag: they keep f32 activations and use default-precision (bf16 MXU
    pass) matmuls already, so ``bf16=True`` only affects the plain-XLA and
    head-packed paths — on the chain-lane path it is a no-op.

    ``fused`` selects a fused Pallas score path: "cl" = the chain-lane
    mega-kernel (ops/fused_score_cl.py, N <= 10 regime), "clx" = the
    chain-lane attention-core path for larger proteins
    (ops/fused_score_clx.py), "always" = the head-packed kernel
    (ops/fused_score.py), "auto" picks per model size and chain count
    (``n_chains``) from the measured win regimes, "never" keeps the plain
    XLA path. Mega-kernel Mosaic compiles can run minutes for full-size
    models (cached persistently afterwards — see utils/cache.py).

    ``mesh``: when the chain axis is sharded over a multi-device mesh, the
    Pallas paths are fanned out per device via shard_map (a pallas_call has
    no GSPMD partitioning rule; the XLA path needs no wrapping). The auto
    gate then compares the PER-DEVICE chain count against the measured win
    thresholds — each device runs n_chains/mesh_size chains.
    """
    buf = diffusion.buffers
    sqrt_one_minus = float(buf.sqrt_one_minus_alphas_cumprod[t])
    t_norm = float(t) / diffusion.timesteps
    scale = 1.0 / (kbt_inv * sqrt_one_minus)
    model = diffusion.model
    if bf16:
        model = model.clone(dtype=jnp.bfloat16)

    from twoforone_tpu.parallel.mesh import mesh_size

    n_dev = mesh_size(mesh)
    chains_per_dev = None if n_chains is None else n_chains // n_dev

    def _shard_wrap(force_fn):
        """Fan a single-device (Pallas) force fn out over the mesh's chain
        axis. pallas_call has no GSPMD partitioning rule, so jitting it over
        sharded operands would gather/replicate; shard_map runs the kernel
        per device on its local chains (embarrassingly parallel, zero
        collectives — the design the iid path uses, core/diffusion.py
        make_fused_sample_fn)."""
        if n_dev == 1:
            return force_fn
        import jax
        from jax.sharding import PartitionSpec as P

        axis = mesh.axis_names[0]
        # check_vma=False: pallas_call's out_shape carries no varying-mesh-
        # axes annotation; the body is per-device-independent by construction.
        return jax.shard_map(
            force_fn, mesh=mesh, in_specs=P(axis),
            out_specs=(P(axis), P(axis)), check_vma=False,
        )

    import jax

    mode = resolve_fused_mode(
        diffusion.model, fused, chains_per_dev, jax.default_backend()
    )

    if mode == "clx":
        from twoforone_tpu.ops.fused_score_clx import make_clx_force_fn

        clx = make_clx_force_fn(
            diffusion.model, params, t_norm, interpret=interpret
        )

        def force_fn(x):
            eps_hat = clx(x)
            forces = -eps_hat * scale
            potential = jnp.zeros((x.shape[0],), dtype=jnp.float32)
            return potential, forces

        return _shard_wrap(force_fn)

    if mode == "cl":
        from twoforone_tpu.ops.fused_score import pad_chains
        from twoforone_tpu.ops.fused_score_cl import (
            LANE_B,
            auto_opts,
            make_fused_force_kernel_cl,
        )

        kernel = make_fused_force_kernel_cl(
            model, params, t_norm, interpret=interpret,
            **auto_opts(model.num_beads)
        )

        def force_fn(x):
            b = x.shape[0]
            xp, _ = pad_chains(x, LANE_B)
            eps_hat = kernel(xp)[:b]
            forces = -eps_hat * scale
            potential = jnp.zeros((b,), dtype=jnp.float32)
            return potential, forces

        return _shard_wrap(force_fn)

    if mode == "always":
        from twoforone_tpu.ops.fused_score import make_fused_force_kernel, pad_chains

        kernel = make_fused_force_kernel(
            model, params, t_norm, block_chains=fused_block,
            interpret=interpret,
        )

        def force_fn(x):
            b = x.shape[0]
            xp, _ = pad_chains(x, fused_block)
            eps_hat = kernel(xp)[:b]
            forces = -eps_hat * scale
            potential = jnp.zeros((b,), dtype=jnp.float32)
            return potential, forces

        return _shard_wrap(force_fn)

    from twoforone_tpu.models.graph_transformer import make_score_fn

    score_fn = make_score_fn(model, params)

    def force_fn(x):
        b = x.shape[0]
        tt = jnp.full((b,), t_norm, dtype=jnp.float32)
        eps_hat = score_fn(x, tt)
        forces = -eps_hat * scale
        potential = jnp.zeros((b,), dtype=jnp.float32)
        return potential, forces

    return force_fn


class LangevinDiffusion:
    """Simulate Langevin dynamics from a trained diffusion model.

    Mirrors the reference driver (dynamics/langevin.py:95-212): normalizes
    initial coordinates, converts the score into forces with consistent units,
    auto-derives dt when not given, runs BAOA(F)B, and rescales the saved
    trajectory back to data units.

    ``mesh``: optional jax.sharding.Mesh — shards the chain axis over its
    devices for multi-chip simulation (the reference's DataParallel fan-out,
    sample.py:180-186, done the TPU way: zero collectives in the hot loop).
    The number of chains must be divisible by the mesh size.
    """

    def __init__(
        self,
        diffusion: "GaussianDiffusion",  # noqa: F821
        params,
        init_mol,
        n_timesteps: int = 1000000,
        save_interval: int = 250,
        t: int = 15,
        temp_data: float = 300,
        temp_sim: float = 300,
        dt: Optional[float] = 2e-3,
        masses: Sequence[float] = (12.8,) * 5,
        friction: Optional[float] = 1,
        kb: str = "consistent",
        random_seed: Optional[int] = None,
        steps_per_chunk: Optional[int] = None,
        log: bool = True,
        fused: str = "never",
        fused_block: int = 128,
        bf16: bool = False,
        restraint_k: float = 0.0,
        max_force: Optional[float] = None,
        mesh=None,
        dt_scale: float = 1.0,
    ):
        self.norm_factor = float(diffusion.norm_factor)
        init_sample = np.asarray(init_mol, dtype=np.float32) / self.norm_factor
        buf = diffusion.buffers
        self.one_minus_alphas_cumprod = 1.0 - float(buf.alphas_cumprod[t])

        if kb == "consistent":
            self.kb_inv = 1.0 / KB * self.norm_factor**2
        elif kb == "kcal":
            self.kb_inv = JPERKCAL / KBOLTZMANN / AVOGADRO * (self.norm_factor**2) / 100
        else:
            raise ValueError("Wrong kb value")

        force_fn = make_diffusion_force_fn(
            diffusion, params, t, kbt_inv=self.kb_inv / temp_data,
            fused=fused, fused_block=fused_block, bf16=bf16,
            n_chains=init_sample.shape[0], mesh=mesh,
        )

        if friction is None:
            friction_aux = 1.0
            diffusion_constant = 1.0 / masses[0]
        else:
            friction_aux = friction
            diffusion_constant = 1.0
        if dt is None:
            # Auto-dt from the noise floor (reference dynamics/langevin.py:161-168):
            # dt = (1 - alpha_bar_t) * gamma * m * kb_inv / T_data
            dt = (
                self.one_minus_alphas_cumprod
                * friction_aux
                * masses[0]
                * self.kb_inv
                / temp_data
            )
        # BAOAB discretization bias in the sampled stationary distribution
        # is O(dt^2); the reference's auto-dt formula above targets speed,
        # not bias, so dt_scale < 1 trades wall-clock for lower stationary
        # bias when a long run's distribution quality matters more than
        # covered simulation time (no reference equivalent — its dt is
        # fixed by the same formula, dynamics/langevin.py:161-168).
        dt = dt * dt_scale

        self.sim = LangevinSimulation(
            force_fn=force_fn,
            initial_coordinates=init_sample,
            length=n_timesteps,
            save_interval=save_interval,
            beta=self.kb_inv / temp_sim,
            save_potential=False,
            log_interval=save_interval if log else None,
            log_type="print",
            diffusion=diffusion_constant,
            masses=list(masses),
            friction=friction,
            dt=dt,
            random_seed=random_seed,
            steps_per_chunk=steps_per_chunk,
            restraint_k=restraint_k,
            max_force=max_force,
            mesh=mesh,
        )

        if log:
            fr = 1.0 if friction is None else friction
            print(f"norm factor:{self.norm_factor}")
            print(f"Diffusion model Beta : {float(buf.betas[t])}")
            print(f"Diffusion model sqrt_alphas_cumprod {float(buf.sqrt_alphas_cumprod[t])}")
            print(
                "Diffusion model sqrt_one_minus_alphas_cumprod "
                f"{float(buf.sqrt_one_minus_alphas_cumprod[t])}"
            )
            print(f"Diffusion model one_minus_alphas_cumprod {self.one_minus_alphas_cumprod}")
            print(
                f"dt*kb*T/M/gamma: {dt * temp_data / self.kb_inv / masses[0] / fr} "
                "(should be on a similar scale as one_minus_alphas_cumprod)"
            )
            print(f"dt: {dt: .8f} (ps)")
            print(f"KbT: {temp_data / self.kb_inv: .4f}")

    def sample(self, reference_temp: Optional[float] = None) -> np.ndarray:
        """Run the simulation; return (n_frames_total, n_beads, 3) in Angstrom
        (all chains concatenated, reference dynamics/langevin.py:205-212).

        ``reference_temp`` (K) enables the integrator's tempering ramp
        (reference langevin_cgnet.py:724-735, reachable there only via a
        direct ``simulate(reference_beta=...)`` call — trainer.py:346 fetches
        ``temp_dict_pt`` and never uses it). kbT profile over the run: start
        at reference_temp, linear ramp to temp_sim over the first quarter,
        hold a quarter, ramp back over a quarter, hold at reference_temp.
        With the tempering table (``temp_dict_pt``, 450-500 K) as
        reference_temp the run starts hot to cross barriers and anneals to
        temp_sim.
        """
        reference_beta = (
            None if reference_temp is None else self.kb_inv / float(reference_temp)
        )
        traj = self.sim.simulate(reference_beta=reference_beta)  # (n_sims, n_saves, beads, 3)
        traj = traj.reshape(-1, traj.shape[2], traj.shape[3])
        return traj * self.norm_factor
