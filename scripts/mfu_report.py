"""MFU / roofline report for the force-evaluation paths (VERDICT r2 #4).

Counts the analytic FLOPs of one conservative force evaluation (forward +
backward through the score net) for a given protein config, measures the
achieved time per evaluation for each path on the real TPU, and reports
utilization against the v5e peaks. Prints one JSON line per (path, batch).

FLOP model (per chain, forward; backward via grad ~ 2x forward for
matmul-dominated graphs):
  projections per layer: (to_q + to_kv) = 3 * inner * C * N * 2
  attention per head:    sim (dh*N^2*2) + out (dh*N^2*2) + geom (~3*N^2*8)
  to_out + edge folds:   inner * C * N * 2 (+ 3*C*N*2)
  gates:                 2 * (3C * N * 2)
  FF per layer:          2 * C * ff_mult*C * N * 2
  embedding/decoder:     (N+1)*C*N*2 + C*N*2

    python scripts/mfu_report.py chignolin 1024 xla,clx
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _bench_common import CONFIGS, time_chain  # noqa: E402

V5E_PEAK_BF16 = 197e12  # FLOPs/s, one v5e chip
V5E_PEAK_F32 = 49e12    # approx (6-pass f32 on the MXU)
V5E_HBM_BW = 819e9      # bytes/s


def flops_per_chain_forward(n, c, layers, heads=8, dh=64, ff_mult=4):
    inner = heads * dh
    per_layer = 0
    per_layer += 3 * inner * c * n * 2            # q + kv projections
    per_layer += heads * (2 * dh * n * n * 2)     # sim + out contractions
    per_layer += heads * (8 * 3 * n * n)          # geometric terms (VPU)
    per_layer += inner * c * n * 2 + 3 * c * n * 2  # to_out + diff fold
    per_layer += 2 * (3 * c) * n * 2              # two gates
    per_layer += 2 * c * (ff_mult * c) * n * 2    # FF
    emb = (n + 1) * c * n * 2 + c * n * 2
    return layers * per_layer + emb


def main():
    mol = sys.argv[1] if len(sys.argv) > 1 else "chignolin"
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    paths = (sys.argv[3] if len(sys.argv) > 3 else "xla").split(",")

    import jax
    import jax.numpy as jnp

    from twoforone_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from twoforone_tpu.models.graph_transformer import (
        GraphTransformer,
        make_score_fn,
    )

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
    rng = np.random.default_rng(0)
    x = np.asarray(rng.normal(size=(b, n, 3)), np.float32) * 3.0
    x = x - x.mean(axis=1, keepdims=True)
    t_norm = 0.015

    # fwd + conservative backward ~ 3x forward matmul FLOPs
    fl_fwd = flops_per_chain_forward(n, nf, layers)
    fl_total = 3 * fl_fwd

    for path in paths:
        if path == "xla":
            fn = make_score_fn(model, params)
            tt = np.full((b,), t_norm, np.float32)
            force = lambda xx: fn(xx, tt)
        elif path == "xla16":
            fn = make_score_fn(model.clone(dtype=jnp.bfloat16), params)
            tt = np.full((b,), t_norm, np.float32)
            force = lambda xx: fn(xx, tt)
        elif path == "cl":
            from twoforone_tpu.ops.fused_score_cl import (
                auto_opts,
                make_fused_force_kernel_cl,
            )

            force = make_fused_force_kernel_cl(model, params, t_norm,
                                               **auto_opts(n))
        elif path == "clx":
            from twoforone_tpu.ops.fused_score_clx import make_clx_force_fn

            force = make_clx_force_fn(model, params, t_norm)
        else:
            raise SystemExit(f"unknown path {path}")

        per_eval = time_chain(force, x)
        us_chain = per_eval / b * 1e6
        achieved = fl_total * b / per_eval
        print(json.dumps({
            "mol": mol, "path": path, "batch": b,
            "flops_per_chain_eval": fl_total,
            "per_eval_us": round(per_eval * 1e6, 1),
            "us_per_chain": round(us_chain, 3),
            "achieved_tflops": round(achieved / 1e12, 3),
            "mfu_bf16_peak_pct": round(100 * achieved / V5E_PEAK_BF16, 2),
            "mfu_f32_peak_pct": round(100 * achieved / V5E_PEAK_F32, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
