import time, numpy as np, jax, jax.numpy as jnp
from twoforone_tpu.core.diffusion import GaussianDiffusion
from twoforone_tpu.models.graph_transformer import GraphTransformer
from twoforone_tpu.models.graph_transformer import score_forward

def probe_fwd(n_sims, dtype, conservative=True, steps=200, hidden=64, layers=3):
    model = GraphTransformer(num_beads=10, hidden_nf=hidden, n_layers=layers,
        use_intrinsic_coords=True, use_abs_coords=False, use_distances=False,
        conservative=conservative, dtype=dtype)
    x0 = jnp.zeros((1,10,3)); t0_ = jnp.zeros((1,))
    kw = {"return_energy": True} if conservative else {}
    params = model.init(jax.random.PRNGKey(0), x0, t0_, **kw)["params"]

    @jax.jit
    def run(x, t):
        def body(i, x):
            out = score_forward(model, params, x, t)
            return x + 1e-6 * out
        return jax.lax.fori_loop(0, steps, body, x)

    x = jnp.asarray(np.random.default_rng(0).normal(size=(n_sims,10,3)), jnp.float32)
    t = jnp.full((n_sims,), 0.02)
    r = run(x, t); jax.block_until_ready(r)
    best = 1e9
    for _ in range(3):
        t1 = time.perf_counter(); r = run(x, t); jax.block_until_ready(r)
        best = min(best, time.perf_counter()-t1)
    print(f"sims={n_sims:5d} cons={conservative} {str(dtype)[-10:-2]:>8s}: {best/steps*1e6:8.1f} us/step  {n_sims*steps/best:.2e} chainsteps/s")

for b in (100, 400, 1000):
    probe_fwd(b, jnp.float32, conservative=True)
for b in (100, 1000):
    probe_fwd(b, jnp.float32, conservative=False)
    probe_fwd(b, jnp.bfloat16, conservative=True)
