import sys, time
import jax, jax.numpy as jnp, numpy as np
from twoforone_tpu.models.graph_transformer import GraphTransformer, score_forward
from twoforone_tpu.ops.fused_score import make_fused_force_kernel

model = GraphTransformer(num_beads=10, hidden_nf=64, n_layers=3,
    use_intrinsic_coords=True, use_abs_coords=False, use_distances=False, conservative=True)
params = model.init(jax.random.PRNGKey(0), jnp.zeros((1,10,3)), jnp.zeros((1,)),
                    return_energy=True)["params"]

def timeit(fn, x, steps=500):
    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, steps, lambda i, y: y + 1e-6*fn(y), x)
    jax.block_until_ready(run(x))
    best=1e9
    for _ in range(3):
        t0=time.perf_counter(); jax.block_until_ready(run(x)); best=min(best,time.perf_counter()-t0)
    return best/steps*1e6

# reference (XLA highest precision) for error measurement
x128 = jnp.asarray(np.random.default_rng(0).normal(size=(128,10,3)), jnp.float32)
x128 = x128 - x128.mean(axis=1, keepdims=True)
with jax.default_matmul_precision("highest"):
    ref = score_forward(model, params, x128, jnp.full((128,), 0.02))

for prec in ("default", "highest"):
    for tb in (32, 128):
        fused = make_fused_force_kernel(model, params, 0.02, block_chains=tb, precision=prec)
        out = jax.jit(fused)(x128)
        err = float(jnp.abs(out-ref).max())/float(jnp.abs(ref).max())
        t = timeit(fused, x128)
        print(f"prec={prec:7s} TB={tb:4d}: {t:7.1f} us/step (B=128) relerr={err:.2e}", flush=True)

xla_fn = lambda xx: score_forward(model, params, xx, jnp.full((xx.shape[0],),0.02))
print(f"XLA default     : {timeit(xla_fn, x128):7.1f} us/step (B=128)", flush=True)

# larger batch
x1024 = jnp.asarray(np.random.default_rng(1).normal(size=(1024,10,3)), jnp.float32)
fused = make_fused_force_kernel(model, params, 0.02, block_chains=128)
print(f"fused TB=128 B=1024: {timeit(fused, x1024):7.1f} us/step", flush=True)
print(f"XLA          B=1024: {timeit(xla_fn, x1024):7.1f} us/step", flush=True)
