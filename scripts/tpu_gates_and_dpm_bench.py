"""Inter-control-run TPU window tasks: the driver's single-chip compile
gate plus strided-solver iid throughput measurements.

Run between long control runs (the chip is claimed by one process at a
time): verifies ``__graft_entry__.entry()`` compiles and executes on the
real TPU, then measures iid samples/s for the DDIM and DPM-Solver++(2M)
ladders through the production fused sampling path (chignolin shipped
config, trained chain10 weights when staged).

    python scripts/tpu_gates_and_dpm_bench.py [--out /tmp/dpm2m_tpu_bench.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/dpm2m_tpu_bench.json")
    p.add_argument("--batch", type=int, default=4096)
    args = p.parse_args()

    from twoforone_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    from __graft_entry__ import _flagship, entry
    from bench import _load_trained_params

    results = {}

    # 1. driver single-chip gate
    fn, a = entry()
    out = jax.jit(fn)(*a)
    jax.block_until_ready(out)
    results["entry_compile_ok"] = list(out.shape)
    print(f"entry() compiled and ran: {out.shape}")

    # 2. strided-solver throughput ladder through the fused runtime-t kernel
    model, gd = _flagship()
    params = _load_trained_params(gd)
    results["params"] = "trained_chain10" if params is not None else "random"
    if params is None:
        params = gd.init_params(jax.random.PRNGKey(0))

    for solver, steps in [("ddim", 100), ("dpm2m", 50), ("dpm2m", 25),
                          ("dpm2m", 100)]:
        sample_fn = gd.make_fused_sample_fn(
            params, args.batch, sample_steps=steps, solver=solver
        )
        out = sample_fn(jax.random.PRNGKey(0))
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = sample_fn(jax.random.PRNGKey(1))
        jax.block_until_ready(out)
        sps = args.batch / (time.perf_counter() - t0)
        results[f"iid_sps_{solver}_{steps}"] = round(sps, 2)
        print(f"{solver}-{steps}: {sps:.1f} samples/s")

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
