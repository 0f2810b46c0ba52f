"""Shared fixtures for the force-path benchmark scripts.

Single source of truth for the shipped protein shapes and the serialized
K-step chain timer used by scripts/bench_cl_proteins.py and
scripts/mfu_report.py (previously duplicated; a config edit must not be
able to desynchronize the two reports).
"""

import time

# (beads, hidden_nf, n_layers) from the shipped args.pickle configs
# (SURVEY "shipped model config"); bead counts from the packaged
# folded_pdbs/*-c-alpha.pdb CA atom counts (villin/2F4K has 35:
# 33 standard residues + 2 norleucine HETATM C-alphas).
CONFIGS = {
    "alanine": (5, 96, 2),
    "chignolin": (10, 64, 3),
    "trp_cage": (20, 128, 3),
    "bba": (28, 96, 3),
    "villin": (35, 128, 3),
    "protein_g": (56, 128, 3),
}


def time_chain(force_fn, x, k=200, iters=2):
    """Seconds per force evaluation, measured as a serialized K-step chain
    (each step consumes the previous output, so per-dispatch tunnel latency
    amortizes away and XLA cannot batch independent evals)."""
    import jax

    @jax.jit
    def chain(x):
        def body(x, _):
            return x + 1e-6 * force_fn(x), ()

        out, _ = jax.lax.scan(body, x, None, length=k)
        return out

    out = chain(x)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(chain(x))
        best = min(best, time.perf_counter() - t0)
    return best / k
