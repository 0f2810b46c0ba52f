"""Langevin / Brownian integrators as lax.scan programs.

Capability-parity redesign of the CGnet-derived integrator
(reference dynamics/langevin_cgnet.py:17-792) for TPU:

- The BAOA(F)B step (one force evaluation per step,
  langevin_cgnet.py:447-479) and the overdamped/Brownian step
  (langevin_cgnet.py:481-500) are pure functions.
- The trajectory loop compiles to ONE XLA program per chunk: an inner
  ``lax.fori_loop`` advances ``save_interval`` steps, an outer ``lax.scan``
  collects saved frames, so 10^4-10^6 steps run without a single Python-level
  iteration or host transfer. The reference executes one Python iteration +
  kernel launch batch per MD step (langevin_cgnet.py:737-771).
- Parallel chains are the leading batch axis; shard it over a device mesh for
  multi-chip scaling (chains are independent — no collectives in the hot
  loop).
- Noise is on-device threefry (keys folded per step); trajectories stay in
  HBM and stream to host once per chunk.
- Like the reference (langevin_cgnet.py:719-722), the simulation object is
  resumable: state (x, v, t, key) persists across ``simulate`` calls and can
  be checkpointed.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from functools import partial
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from twoforone_tpu.ops.geometry import center_zero

ForceFn = Callable[[jnp.ndarray], tuple]  # x -> (potential, forces)


def baoab_step(x, v, forces, noise, dt, masses, vscale, noisescale, beta):
    """One BAOA(F)B update (reference langevin_cgnet.py:447-479).

    [BB] v += dt * F / m
    [A]  x += v * dt/2
    [O]  v  = v * vscale + noisescale * sqrt(1/(beta m)) * dW
    [A]  x += v * dt/2
    """
    m = masses[:, None]
    v = v + dt * forces / m
    x = x + v * (dt / 2.0)
    v = v * vscale + noisescale * jnp.sqrt(1.0 / (beta * m)) * noise
    x = x + v * (dt / 2.0)
    return x, v


def overdamped_step(x, forces, noise, dtau, beta):
    """Brownian dynamics step (reference langevin_cgnet.py:481-500):
    x += F * dtau + sqrt(2 dtau / beta) * dW."""
    return x + forces * dtau + jnp.sqrt(2.0 * dtau / beta) * noise


@dataclass
class LangevinSimulation:
    """Batched CG Langevin simulation driven by a force field.

    Parameters mirror the reference ``Langevin``
    (dynamics/langevin_cgnet.py:168-237): ``friction=None`` selects
    overdamped dynamics; otherwise BAOA(F)B with ``masses``.

    ``force_fn(x) -> (potential, forces)`` over a batch of chains
    (n_sims, n_beads, 3).
    """

    force_fn: ForceFn
    initial_coordinates: np.ndarray  # (n_sims, n_beads, 3)
    dt: float = 5e-4
    beta: float = 1.0
    friction: Optional[float] = None
    masses: Optional[Sequence[float]] = None
    diffusion: float = 1.0
    save_forces: bool = False
    save_potential: bool = False
    length: int = 100
    save_interval: int = 10
    random_seed: Optional[int] = None
    export_interval: Optional[int] = None
    log_interval: Optional[int] = None
    log_type: str = "write"
    filename: Optional[str] = None
    steps_per_chunk: Optional[int] = None  # host-offload granularity
    # Wall-time budget per device dispatch when steps_per_chunk is auto
    # (None). A single dispatch that runs for minutes can exceed the RPC
    # deadline of a tunneled TPU runtime and take the worker down
    # ("TPU worker process crashed or restarted" — observed at ~200 s
    # dispatches; <= ~70 s is reliably fine). Auto chunking probes the
    # per-step cost and sizes chunks to stay under this budget.
    target_chunk_seconds: float = 45.0
    # Optional harmonic position restraint F += -k x (framework extension, no
    # reference equivalent): bounds trajectories driven by unphysical force
    # fields (untrained nets in benchmarks) and supports umbrella-style tethers.
    restraint_k: float = 0.0
    # Optional per-component force clipping (framework extension): a standard
    # CG-MD stabilizer against rare spikes of learned force fields.
    max_force: Optional[float] = None
    # Optional jax.sharding.Mesh: shards the chain axis across its devices
    # (the TPU-native replacement for the reference's DataParallel sampling
    # fan-out, sample.py:180-186). Chains are independent, so the hot loop
    # needs no collectives and throughput scales linearly with device count.
    # n_sims must be divisible by the mesh size.
    mesh: Optional[object] = None

    def __post_init__(self):
        ic = np.asarray(self.initial_coordinates, dtype=np.float32)
        if ic.ndim != 3:
            raise ValueError("initial_coordinates shape must be [frames, beads, dimensions]")
        self.n_sims, self.n_beads, self.n_dims = ic.shape
        self._initial_x = ic

        from twoforone_tpu.parallel.mesh import chain_sharding, mesh_size

        self._chain_sharding = None
        if self.mesh is not None and mesh_size(self.mesh) > 1:
            if self.n_sims % mesh_size(self.mesh) != 0:
                raise ValueError(
                    f"n_sims={self.n_sims} must be divisible by the mesh size "
                    f"{mesh_size(self.mesh)} (pad the chain count, e.g. "
                    "parallel.mesh.round_to_mesh)"
                )
            self._chain_sharding = chain_sharding(self.mesh)

        if self.length % self.save_interval != 0:
            raise ValueError("The save_interval must be a factor of the simulation length")
        if self.log_type not in ("print", "write"):
            raise ValueError("log_type can be either 'print' or 'write'")

        if self.friction is not None:
            if self.masses is None:
                raise RuntimeError("if friction is not None, masses must be given")
            if len(self.masses) != self.n_beads:
                raise ValueError("mass list length must be number of CG beads")
            self._masses = jnp.asarray(self.masses, dtype=jnp.float32)
            self.vscale = float(np.exp(-self.dt * self.friction))
            self.noisescale = float(np.sqrt(1.0 - self.vscale * self.vscale))
            if self.diffusion != 1:
                import warnings

                warnings.warn(
                    "Diffusion other than 1. was provided, but since friction and "
                    "masses were given, Langevin dynamics will be used which do "
                    "not incorporate this diffusion parameter"
                )
        else:
            self._dtau = self.diffusion * self.dt
            self._masses = None
            if self.masses is not None:
                import warnings

                warnings.warn(
                    "Masses were provided, but will not be used since friction "
                    "is None (i.e., infinite)."
                )

        if self.export_interval is not None:
            if self.filename is None:
                raise RuntimeError("Must specify filename if export_interval isn't None")
            if self.length // self.export_interval >= 1000:
                raise ValueError(
                    "Simulation saving is not implemented if more than 1000 files "
                    "will be generated"
                )
            if os.path.isfile(f"{self.filename}_coords_000.npy"):
                raise ValueError(
                    f"{self.filename}_coords_000.npy already exists; choose a "
                    "different filename."
                )
            if self.export_interval % self.save_interval != 0:
                raise ValueError("Numpy saving must occur at a multiple of save_interval")
        if self.log_interval is not None:
            if self.log_interval % self.save_interval != 0:
                raise ValueError("Logging must occur at a multiple of save_interval")
            if self.log_type == "write":
                if self.filename is None:
                    raise RuntimeError(
                        "Must specify filename if log_interval isn't None and "
                        "log_type=='write'"
                    )
                self._log_file = self.filename + "_log.txt"
                if os.path.isfile(self._log_file):
                    raise ValueError(
                        f"{self._log_file} already exists; choose a different filename."
                    )

        seed = 0 if self.random_seed is None else self.random_seed
        self._key = jax.random.PRNGKey(seed)
        self._state = None  # (x, v) device arrays; populated lazily
        self._t = 0  # global step counter (resumable)
        self._npy_file_index = 0
        self._simulated = False
        self._chunk_fn = None
        self._per_step_s = None  # steady-state s/step, calibrated on first run
        self._seen_chunk_sizes = set()  # n_saves values already compiled

    # ------------------------------------------------------------------ state
    def _place(self, arr):
        """Device placement for chain-axis arrays (sharded when mesh given)."""
        if arr is None:
            return None
        if self._chain_sharding is not None:
            return jax.device_put(jnp.asarray(arr), self._chain_sharding)
        return jnp.asarray(arr)

    def _init_state(self):
        x = self._place(self._initial_x)
        v = self._place(np.zeros_like(self._initial_x)) if self.friction is not None else None
        return x, v

    @property
    def state(self):
        """Checkpointable integrator state (x, v, t, key)."""
        if self._state is None:
            self._state = self._init_state()
        x, v = self._state
        return {
            "x": np.asarray(x),
            "v": None if v is None else np.asarray(v),
            "t": self._t,
            "key": np.asarray(self._key),
        }

    def load_state(self, state: dict):
        self._state = (self._place(state["x"]), self._place(state["v"]))
        self._t = int(state["t"])
        self._key = jnp.asarray(state["key"])

    # ------------------------------------------------------------- hot loop
    def _build_chunk_fn(self):
        """Compile: (x, v, key, kbt_inv_schedule) -> final state + saved frames.

        One scan iteration = one save period (= save_interval inner steps with
        the force evaluation fused in); outputs are the saved coordinates and,
        if configured, forces/potential/kinetic energies.
        """
        save_interval = self.save_interval
        langevin = self.friction is not None
        force_fn = self.force_fn
        save_forces = self.save_forces
        save_potential = self.save_potential
        masses = self._masses
        dt = self.dt

        restraint_k = self.restraint_k
        max_force = self.max_force

        def one_step(x, v, key, beta):
            x = center_zero(x)
            potential, forces = force_fn(x)
            if max_force is not None:
                forces = jnp.clip(forces, -max_force, max_force)
            if restraint_k:
                forces = forces - restraint_k * x
            noise = jax.random.normal(key, x.shape, dtype=x.dtype)
            if langevin:
                x_new, v_new = baoab_step(
                    x, v, forces, noise, dt, masses, self.vscale, self.noisescale, beta
                )
            else:
                x_new = overdamped_step(x, forces, noise, self._dtau, beta)
                v_new = v
            return x_new, v_new, potential, forces

        def save_period(carry, xs):
            x, v = carry
            period_key, betas = xs  # betas: (save_interval,) 1/kbt values

            def body(i, c):
                x, v = c
                x, v, _, _ = one_step(x, v, jax.random.fold_in(period_key, i), betas[i])
                return (x, v)

            x, v = jax.lax.fori_loop(0, save_interval - 1, body, (x, v))
            # Final step of the period: capture forces/potential actually used
            # to produce the saved frame (reference saves the step's forces,
            # langevin_cgnet.py:752-753).
            x, v, potential, forces = one_step(
                x, v, jax.random.fold_in(period_key, save_interval - 1),
                betas[save_interval - 1],
            )
            out = {"coords": x}
            if save_forces:
                out["forces"] = forces
            if save_potential:
                out["potential"] = potential
            if langevin:
                out["kinetic_energy"] = 0.5 * jnp.sum(
                    jnp.sum(masses[:, None] * v**2, axis=2), axis=1
                )
            return (x, v), out

        @partial(jax.jit, static_argnames=("n_saves",))
        def run_chunk(x, v, root_key, period_offset, betas, n_saves):
            # Per-period keys derive from the global save-period index so the
            # trajectory is invariant to host-offload chunking and resumable.
            period_idx = period_offset + jnp.arange(n_saves)
            period_keys = jax.vmap(lambda i: jax.random.fold_in(root_key, i))(period_idx)
            betas = betas.reshape(n_saves, save_interval)
            (x, v), saved = jax.lax.scan(save_period, (x, v), (period_keys, betas))
            return x, v, saved

        return run_chunk

    # ------------------------------------------------------------- driving
    def simulate(self, sub_interval: Optional[int] = None, reference_beta: Optional[float] = None):
        """Advance the simulation by ``sub_interval`` steps (default: all).

        Returns saved coordinates with shape
        (n_sims, n_frames_saved, n_beads, 3) — same layout as the reference
        (langevin_cgnet.py:779-792).

        ``reference_beta`` enables the tempering ramp of the reference
        (langevin_cgnet.py:724-735): kbT ramps linearly from 1/reference_beta
        up to 1/beta for a quarter of the interval, holds, ramps back down,
        then holds at 1/reference_beta.
        """
        sub_interval = self.length if sub_interval is None else sub_interval
        if sub_interval % self.save_interval != 0:
            raise ValueError("sub_interval must be a multiple of save_interval")
        if self._state is None:
            self._state = self._init_state()
            self._log(
                f"Generating {self.n_sims} simulations of length {self.length} "
                f"saved at {self.save_interval}-step intervals ({time.asctime()})"
            )
        if self._chunk_fn is None:
            self._chunk_fn = self._build_chunk_fn()

        # Per-step inverse temperature schedule (tempering ramp or constant).
        if reference_beta is not None:
            q = sub_interval // 4
            kbt = np.concatenate(
                [
                    np.linspace(1 / reference_beta, 1 / self.beta, num=q),
                    np.full(q, 1 / self.beta),
                    np.linspace(1 / self.beta, 1 / reference_beta, num=q),
                    np.full(sub_interval - 3 * q, 1 / reference_beta),
                ]
            )
            betas_all = (1.0 / kbt).astype(np.float32)
        else:
            betas_all = np.full(sub_interval, self.beta, dtype=np.float32)

        steps_per_chunk = self.steps_per_chunk
        auto_chunk = steps_per_chunk is None
        if auto_chunk:
            # Memory cap: bound device-resident saved frames to ~2^16 per
            # chunk. The wall-time calibration in the drive loop below further
            # shrinks this for slow configs (see target_chunk_seconds).
            saves_per_chunk = max(1, min(sub_interval // self.save_interval, 65536 // max(1, self.n_sims)))
            steps_per_chunk = saves_per_chunk * self.save_interval
        steps_per_chunk -= steps_per_chunk % self.save_interval
        steps_per_chunk = max(self.save_interval, steps_per_chunk)

        def _fit_to_budget(per_step_s):
            cap = int(self.target_chunk_seconds / max(per_step_s, 1e-9))
            cap = (cap // self.save_interval) * self.save_interval
            return max(self.save_interval, min(steps_per_chunk, cap))

        # Auto chunks never issue the full-size dispatch blind: until a
        # compile-free dispatch has measured the per-step cost, stay at a
        # small probe size (the probe advances the trajectory — no work is
        # wasted). Calibration persists across simulate() calls.
        probe_steps = min(steps_per_chunk, 2 * self.save_interval)
        budget_steps = (
            _fit_to_budget(self._per_step_s) if self._per_step_s is not None else None
        )

        remaining = min(sub_interval, self.length - self._t)
        total_saves = remaining // self.save_interval
        coords_out = np.empty(
            (total_saves, self.n_sims, self.n_beads, self.n_dims), dtype=np.float32
        )
        forces_out = np.empty_like(coords_out) if self.save_forces else None
        potential_out = None
        ke_out = (
            np.empty((total_saves, self.n_sims), dtype=np.float32)
            if self.friction is not None
            else None
        )

        x, v = self._state
        done = 0
        save_idx = 0
        export_start = 0
        while done < remaining:
            if not auto_chunk:
                chunk = steps_per_chunk
            elif budget_steps is not None:
                chunk = budget_steps
            else:
                chunk = probe_steps
            chunk = min(chunk, remaining - done)
            n_saves = chunk // self.save_interval
            compile_free = n_saves in self._seen_chunk_sizes
            self._seen_chunk_sizes.add(n_saves)
            period_offset = self._t // self.save_interval
            betas = jnp.asarray(betas_all[done : done + chunk])
            t0 = time.perf_counter()
            x, v, saved = self._chunk_fn(
                x, v, self._key, jnp.int32(period_offset), betas, n_saves=n_saves
            )
            sl = slice(save_idx, save_idx + n_saves)
            coords_out[sl] = np.asarray(saved["coords"])
            if self.save_forces:
                forces_out[sl] = np.asarray(saved["forces"])
            if self.save_potential:
                pot = np.asarray(saved["potential"])
                if potential_out is None:
                    potential_out = np.empty((total_saves,) + pot.shape[1:], dtype=np.float32)
                potential_out[sl] = pot
            if ke_out is not None:
                ke_out[sl] = np.asarray(saved["kinetic_energy"])
            elapsed = time.perf_counter() - t0
            if auto_chunk and compile_free:
                # Compile-free dispatch == clean per-step measurement. First
                # one calibrates; later ones only shrink the chunk if cost
                # drifted well above the budget (re-growing would recompile
                # for little gain).
                measured = elapsed / max(1, chunk)
                if budget_steps is None:
                    self._per_step_s = measured
                    budget_steps = _fit_to_budget(measured)
                elif elapsed > 1.5 * self.target_chunk_seconds:
                    self._per_step_s = measured
                    budget_steps = _fit_to_budget(measured)
            done += chunk
            save_idx += n_saves
            self._t += chunk

            if self.export_interval is not None:
                while (save_idx - export_start) * self.save_interval >= self.export_interval:
                    n_exp = self.export_interval // self.save_interval
                    self._export_npy(coords_out, forces_out, potential_out, ke_out,
                                     export_start, export_start + n_exp)
                    export_start += n_exp
            if self.log_interval is not None and (self._t % self.log_interval) < self.save_interval:
                self._log(
                    f"{save_idx}/{self.length // self.save_interval} time points "
                    f"saved ({time.asctime()})"
                )

        if self.export_interval is not None and export_start < save_idx:
            self._export_npy(
                coords_out, forces_out, potential_out, ke_out, export_start, save_idx
            )

        self._state = (x, v)
        # (saves, sims, beads, 3) -> (sims, saves, beads, 3), reference layout
        self.simulated_coords = coords_out.swapaxes(0, 1)
        self.simulated_forces = None if forces_out is None else forces_out.swapaxes(0, 1)
        self.simulated_potential = (
            None if potential_out is None else potential_out.swapaxes(0, 1)
        )
        self.kinetic_energies = None if ke_out is None else ke_out.swapaxes(0, 1)
        self._simulated = True
        return self.simulated_coords

    # ------------------------------------------------------------- plumbing
    def _export_npy(self, coords, forces, potential, ke, start, stop):
        key = f"{self._npy_file_index:03d}"
        np.save(f"{self.filename}_coords_{key}.npy", coords[start:stop].swapaxes(0, 1))
        if forces is not None:
            np.save(f"{self.filename}_forces_{key}.npy", forces[start:stop].swapaxes(0, 1))
        if potential is not None:
            np.save(
                f"{self.filename}_potential_{key}.npy", potential[start:stop].swapaxes(0, 1)
            )
        if ke is not None:
            np.save(
                f"{self.filename}_kineticenergy_{key}.npy", ke[start:stop].swapaxes(0, 1)
            )
        self._npy_file_index += 1

    def _log(self, msg: str):
        if self.log_interval is None:
            return
        if self.log_type == "print":
            print(msg)
        else:
            with open(self._log_file, "a") as f:
                f.write(msg + "\n")
