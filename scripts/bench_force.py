"""Microbenchmark: one force evaluation (score fwd + grad) per path/batch.

Times a serialized chain of K force evaluations inside one jit (data
dependency forces sequential execution, mimicking the Langevin scan body) so
per-eval cost includes the same per-op overheads the production loop pays.

    python scripts/bench_force.py <path> <batch>
        path in: xla32 xla16 fused32 fused128 cl cl0
    python scripts/bench_force.py all      # runs each in a subprocess
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = 500


def time_chain(force_fn, x, iters=2):
    import jax

    @jax.jit
    def chain(x):
        def body(x, _):
            f = force_fn(x)
            return x + 1e-6 * f, ()

        out, _ = jax.lax.scan(body, x, None, length=K)
        return out

    out = chain(x)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = chain(x)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best / K


def run_one(path, b):
    import jax

    from twoforone_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from __graft_entry__ import _flagship
    from twoforone_tpu.models.graph_transformer import make_score_fn

    model, gd = _flagship()
    params = gd.init_params(jax.random.PRNGKey(0))
    t_norm = 0.02
    rng = np.random.default_rng(0)
    x = np.asarray(rng.normal(size=(b, 10, 3)), np.float32)
    x = x - x.mean(axis=1, keepdims=True)

    if path == "xla32":
        fn = make_score_fn(model, params)
        per = time_chain(lambda xx: fn(xx, np.full((b,), t_norm, np.float32)), x)
    elif path == "xla16":
        import jax.numpy as jnp

        fn = make_score_fn(model.clone(dtype=jnp.bfloat16), params)
        per = time_chain(lambda xx: fn(xx, np.full((b,), t_norm, np.float32)), x)
    elif path in ("fused32", "fused128"):
        from twoforone_tpu.ops.fused_score import make_fused_force_kernel

        blk = int(path[5:])
        kern = make_fused_force_kernel(model, params, t_norm, block_chains=blk)
        per = time_chain(kern, x)
    elif path in ("cl", "cl0"):
        from twoforone_tpu.ops.fused_score_cl import make_fused_force_kernel_cl

        kern = make_fused_force_kernel_cl(model, params, t_norm, remat=(path == "cl"))
        per = time_chain(kern, x)
    else:
        raise SystemExit(f"unknown path {path}")
    print(json.dumps({f"{path}_b{b}_us": round(per * 1e6, 1)}), flush=True)


def main():
    if sys.argv[1:] == ["all"] or not sys.argv[1:]:
        for path in ("xla32", "xla16", "fused32", "cl", "cl0"):
            for b in (128, 1024):
                r = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), path, str(b)],
                    capture_output=True, text=True, timeout=2400,
                )
                out = (r.stdout or "").strip().splitlines()
                print(out[-1] if out else f'{{"{path}_b{b}": "rc={r.returncode}"}}',
                      flush=True)
        return
    run_one(sys.argv[1], int(sys.argv[2]))


if __name__ == "__main__":
    main()
