import jax, jax.numpy as jnp, numpy as np, time
jax.config.update("jax_default_matmul_precision", "highest")
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

ref = score_forward(model, params, x, t)
fused = make_fused_force_kernel(model, params, 0.02, block_chains=64)
out = jax.jit(fused)(x)
print("max abs diff:", float(jnp.abs(out - ref).max()))
print("ref norm:", float(jnp.abs(ref).max()))
