"""i.i.d. sampling throughput: samples/sec through the full T=1000 reverse
chain (chignolin shipped config), at serving batch size."""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    from twoforone_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from __graft_entry__ import _flagship

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    model, gd = _flagship()
    params = gd.init_params(jax.random.PRNGKey(0))
    fn = gd.make_sample_fn(batch)
    out = fn(params, jax.random.PRNGKey(1))  # compile + warmup
    jax.block_until_ready(out)

    n = 3
    t0 = time.perf_counter()
    for i in range(n):
        out = fn(params, jax.random.PRNGKey(2 + i))
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    assert np.all(np.isfinite(np.asarray(out)))
    print(json.dumps({
        "metric": "iid_samples_per_sec_chignolin_T1000",
        "value": round(n * batch / dt, 2),
        "unit": "samples/s",
        "batch": batch,
    }))


if __name__ == "__main__":
    main()
