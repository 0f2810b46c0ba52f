"""Microbenchmark: one force evaluation (score fwd + grad) per path/batch.

Times a serialized chain of K force evaluations inside one jit (data
dependency forces sequential execution, mimicking the Langevin scan body) so
per-eval cost includes the same per-op overheads the production loop pays.

    python scripts/bench_force.py [paths...]   # default: xla32 xla16 fused
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = 50


def time_chain(force_fn, x, iters=3):
    import jax
    import jax.numpy as jnp

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


def main():
    import jax

    from twoforone_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from __graft_entry__ import _flagship
    from twoforone_tpu.models.graph_transformer import make_score_fn

    which = sys.argv[1:] or ["xla32", "xla16", "fused"]
    model, gd = _flagship()
    params = gd.init_params(jax.random.PRNGKey(0))
    t_norm = 0.02

    results = {}
    for b in (128, 1024):
        rng = np.random.default_rng(0)
        x = np.asarray(rng.normal(size=(b, 10, 3)), np.float32)
        x = x - x.mean(axis=1, keepdims=True)

        if "xla32" in which:
            fn = make_score_fn(model, params)
            per = time_chain(lambda xx: fn(xx, np.full((b,), t_norm, np.float32)), x)
            results[f"xla_f32_b{b}_us"] = round(per * 1e6, 1)
        if "xla16" in which:
            import jax.numpy as jnp

            m16 = model.clone(dtype=jnp.bfloat16)
            fn = make_score_fn(m16, params)
            per = time_chain(lambda xx: fn(xx, np.full((b,), t_norm, np.float32)), x)
            results[f"xla_bf16_b{b}_us"] = round(per * 1e6, 1)
        if "fused" in which:
            from twoforone_tpu.ops.fused_score import make_fused_force_kernel

            for blk in (32, 128):
                if b % blk:
                    continue
                kern = make_fused_force_kernel(model, params, t_norm, block_chains=blk)
                per = time_chain(kern, x)
                results[f"fused_blk{blk}_b{b}_us"] = round(per * 1e6, 1)
        print(json.dumps(results))


if __name__ == "__main__":
    main()
