import time, numpy as np, jax, jax.numpy as jnp
from twoforone_tpu.models.graph_transformer import GraphTransformer, score_forward

def probe(n_sims, geometric, dtype=jnp.float32, steps=50, nbeads=10, hidden=64, layers=3):
    model = GraphTransformer(num_beads=nbeads, hidden_nf=hidden, n_layers=layers,
        use_intrinsic_coords=True, use_abs_coords=False, use_distances=False,
        conservative=True, dtype=dtype, use_geometric_edges=geometric)
    x0 = jnp.zeros((1,nbeads,3)); tz = jnp.zeros((1,))
    params = model.init(jax.random.PRNGKey(0), x0, tz, return_energy=True)["params"]

    @jax.jit
    def run(x, t):
        def body(i, x):
            return x + 1e-6 * score_forward(model, params, x, t)
        return jax.lax.fori_loop(0, steps, body, x)

    x = jnp.asarray(np.random.default_rng(0).normal(size=(n_sims,nbeads,3)), jnp.float32)
    t = jnp.full((n_sims,), 0.02)
    r = run(x, t); jax.block_until_ready(r)
    best = 1e9
    for _ in range(3):
        t1 = time.perf_counter(); r = run(x, t); jax.block_until_ready(r)
        best = min(best, time.perf_counter()-t1)
    print(f"sims={n_sims:5d} N={nbeads} geo={int(geometric)} {str(dtype)[18:26]:>8s}: "
          f"{best/steps*1e6:8.1f} us/step  {n_sims*steps/best:.3e} chainsteps/s", flush=True)

probe(100, True)
probe(1000, True)
probe(1000, True, jnp.bfloat16)
probe(1000, True, nbeads=56)
probe(4000, True)
