import jax, jax.numpy as jnp, numpy as np, time
from twoforone_tpu.models.graph_transformer import GraphTransformer, score_forward
from twoforone_tpu.ops.fused_score import make_fused_force_kernel

model = GraphTransformer(num_beads=10, hidden_nf=64, n_layers=3,
    use_intrinsic_coords=True, use_abs_coords=False, use_distances=False,
    conservative=True)
params = model.init(jax.random.PRNGKey(0), jnp.zeros((1,10,3)), jnp.zeros((1,)),
                    return_energy=True)["params"]
x = jnp.asarray(np.random.default_rng(0).normal(size=(128,10,3)), jnp.float32)
x = x - x.mean(axis=1, keepdims=True)
t = jnp.full((128,), 0.02)

with jax.default_matmul_precision("highest"):
    ref = score_forward(model, params, x, t)
fused = make_fused_force_kernel(model, params, 0.02, block_chains=32)
out = jax.jit(fused)(x)
err = float(jnp.abs(out - ref).max())
rel = err / float(jnp.abs(ref).max())
print("max abs diff:", err, "rel:", rel)

# timing: fused vs xla inside fori loop
def timeit(fn, x, steps=200):
    @jax.jit
    def run(x):
        def body(i, x):
            return x + 1e-6 * fn(x)
        return jax.lax.fori_loop(0, steps, body, x)
    r = run(x); jax.block_until_ready(r)
    best=1e9
    for _ in range(3):
        t0=time.perf_counter(); jax.block_until_ready(run(x)); best=min(best,time.perf_counter()-t0)
    return best/steps*1e6

xla_fn = lambda xx: score_forward(model, params, xx, jnp.full((xx.shape[0],),0.02))
for B in (128, 1024):
    xb = jnp.asarray(np.random.default_rng(1).normal(size=(B,10,3)), jnp.float32)
    t_fused = timeit(fused, xb)
    t_xla = timeit(xla_fn, xb)
    print(f"B={B}: fused {t_fused:.1f} us/step  xla {t_xla:.1f} us/step  speedup {t_xla/t_fused:.2f}x")
