"""Per-protein chain-lane kernel compile + parity + timing on the real TPU.

For each shipped protein config (saved_models/*/args.pickle shapes), builds
the chain-lane fused force kernel with the auto-selected options
(ops/fused_score_cl.auto_opts), verifies Mosaic compiles it, checks force
parity against the XLA geometric path, and times both (serialized K-step
chain, like scripts/bench_force.py).

Each protein runs in its own subprocess (the local compile helper can
SIGKILL oversized Mosaic compiles; a crash must not kill the sweep):

    python scripts/bench_cl_proteins.py            # all six, subprocessed
    python scripts/bench_cl_proteins.py trp_cage   # one, in-process
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _bench_common import CONFIGS, time_chain  # noqa: E402


def run_one(mol: str, b: int = 128):
    import jax
    import jax.numpy as jnp

    from twoforone_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from twoforone_tpu.models.graph_transformer import (
        GraphTransformer,
        make_score_fn,
    )
    from twoforone_tpu.ops.fused_score_cl import (
        auto_opts,
        make_fused_force_kernel_cl,
    )
    from twoforone_tpu.ops.fused_score_clx import make_clx_force_fn

    n, nf, layers = CONFIGS[mol]
    model = GraphTransformer(
        num_beads=n, hidden_nf=nf, n_layers=layers,
        use_intrinsic_coords=True, use_abs_coords=False,
        use_distances=False, conservative=True,
    )
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, n, 3)), jnp.zeros((1,)),
        return_energy=True,
    )["params"]
    t_norm = 0.015
    rng = np.random.default_rng(0)
    x = np.asarray(rng.normal(size=(b, n, 3)), np.float32) * 3.0
    x = x - x.mean(axis=1, keepdims=True)

    # fused path under test: the mega-kernel in its verified N<=10 range,
    # the attention-core clx path beyond (docs/PERF_NOTES.md "Round 3").
    if n <= 10:
        opts = auto_opts(n)
        path = f"cl[{opts['remat']}]"
        build = lambda: make_fused_force_kernel_cl(model, params, t_norm, **opts)
    else:
        path = "clx"
        build = lambda: make_clx_force_fn(model, params, t_norm)

    t0 = time.perf_counter()
    kern = jax.jit(build())
    out_f = np.asarray(kern(x))
    compile_s = time.perf_counter() - t0

    fn = make_score_fn(model, params)
    tt = np.full((b,), t_norm, np.float32)
    ref = np.asarray(jax.jit(lambda xx: fn(xx, tt))(x))
    err = np.abs(out_f - ref)
    scale = float(np.abs(ref).mean())

    per_f = time_chain(kern, x)
    per_xla = time_chain(lambda xx: fn(xx, tt), x)

    # bf16 ACTIVATIONS on the same XLA geometric path (matmuls already ride
    # the bf16 MXU pass at default precision; this halves HBM traffic too —
    # the LangevinDiffusion bf16=True production option, physics-validated
    # at distribution level by the bf16 positive-control bars).
    model_bf16 = model.clone(dtype=jnp.bfloat16)
    fn_bf16 = make_score_fn(model_bf16, params)
    per_xla_bf16 = time_chain(lambda xx: fn_bf16(xx, tt), x)

    print(json.dumps({
        "mol": mol, "beads": n, "nf": nf, "path": path, "batch": b,
        "compile_s": round(compile_s, 1),
        "err_typ": round(float(err.mean()), 4),
        "err_max": round(float(err.max()), 3),
        "force_scale": round(scale, 2),
        "fused_us": round(per_f * 1e6, 1),
        "xla_us": round(per_xla * 1e6, 1),
        "xla_bf16_us": round(per_xla_bf16 * 1e6, 1),
        "speedup": round(per_xla / per_f, 2),
    }), flush=True)


def main():
    args = sys.argv[1:]
    if args and args[0] in CONFIGS:
        run_one(args[0], int(args[1]) if len(args) > 1 else 128)
        return
    mols = args if args else list(CONFIGS)
    for mol in mols:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), mol],
            capture_output=True, text=True, timeout=3600,
        )
        out = (r.stdout or "").strip().splitlines()
        if out and out[-1].startswith("{"):
            print(out[-1], flush=True)
        else:
            tail = ((r.stderr or "").strip().splitlines() or ["?"])[-1][:200]
            print(json.dumps({"mol": mol, "rc": r.returncode, "err": tail}),
                  flush=True)


if __name__ == "__main__":
    main()
