import time, numpy as np, jax, jax.numpy as jnp
from twoforone_tpu.models.graph_transformer import GraphTransformer, score_forward

def probe(n_sims, dtype, conservative=True, steps=50, hidden=64, layers=3, nbeads=10):
    model = GraphTransformer(num_beads=nbeads, hidden_nf=hidden, n_layers=layers,
        use_intrinsic_coords=True, use_abs_coords=False, use_distances=False,
        conservative=conservative, dtype=dtype)
    x0 = jnp.zeros((1,nbeads,3)); tz = jnp.zeros((1,))
    kw = {"return_energy": True} if conservative else {}
    params = model.init(jax.random.PRNGKey(0), x0, tz, **kw)["params"]

    @jax.jit
    def run(x, t):
        def body(i, x):
            return x + 1e-6 * score_forward(model, params, x, t)
        return jax.lax.fori_loop(0, steps, body, x)

    x = jnp.asarray(np.random.default_rng(0).normal(size=(n_sims,nbeads,3)), jnp.float32)
    t = jnp.full((n_sims,), 0.02)
    tc = time.perf_counter()
    r = run(x, t); jax.block_until_ready(r)
    compile_s = time.perf_counter()-tc
    best = 1e9
    for _ in range(3):
        t1 = time.perf_counter(); r = run(x, t); jax.block_until_ready(r)
        best = min(best, time.perf_counter()-t1)
    print(f"sims={n_sims:5d} N={nbeads} cons={int(conservative)} {str(dtype)[18:26]:>8s}: "
          f"{best/steps*1e6:8.1f} us/step  {n_sims*steps/best:.2e} chainsteps/s (compile {compile_s:.0f}s)", flush=True)

probe(100, jnp.float32)
probe(1000, jnp.float32)
probe(1000, jnp.bfloat16)
probe(1000, jnp.float32, conservative=False)
probe(1000, jnp.float32, nbeads=56)
