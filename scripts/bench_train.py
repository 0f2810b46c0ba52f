"""Training-throughput benchmark: steps/sec of the full jitted train step
(chignolin shipped config: nf=64, 3 layers, batch 512, conservative)."""

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

    import jax.numpy as jnp
    import optax

    from twoforone_tpu.ops.geometry import random_rotation
    from twoforone_tpu.train.ema import EMAConfig, ema_update, init_ema
    from __graft_entry__ import _flagship

    model, gd = _flagship()
    params = gd.init_params(jax.random.PRNGKey(0))
    optimizer = optax.adamw(4e-4, weight_decay=1e-12)
    opt_state = optimizer.init(params)
    ema_params = init_ema(params)
    ema_cfg = EMAConfig()

    batch = 512
    data = np.random.default_rng(0).normal(size=(batch, 10, 3)).astype(np.float32)
    data = (data - data.mean(axis=1, keepdims=True)) * gd.norm_factor

    @jax.jit
    def step(params, ema_params, opt_state, s, batch, key):
        k1, k2 = jax.random.split(key)
        batch = random_rotation(batch, k1)
        (loss, aux), grads = jax.value_and_grad(
            lambda p: gd.loss(p, batch, k2), has_aux=True
        )(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        ema_params = ema_update(ema_params, params, s, ema_cfg)
        return params, ema_params, opt_state, loss

    key = jax.random.PRNGKey(1)
    x = jnp.asarray(data)
    for i in range(3):  # warmup/compile
        key, sk = jax.random.split(key)
        params, ema_params, opt_state, loss = step(params, ema_params, opt_state, i, x, sk)
    jax.block_until_ready(loss)

    n = 50
    t0 = time.perf_counter()
    for i in range(n):
        key, sk = jax.random.split(key)
        params, ema_params, opt_state, loss = step(
            params, ema_params, opt_state, i + 3, x, sk
        )
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": "train_steps_per_sec_chignolin_bs512",
        "value": round(n / dt, 2),
        "unit": "steps/s",
        "samples_per_sec": round(n * batch / dt, 1),
    }))


if __name__ == "__main__":
    main()
