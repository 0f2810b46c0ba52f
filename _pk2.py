import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def try_kernel(name, fn, *shapes):
    xs = [jnp.asarray(np.random.default_rng(i).normal(size=s), jnp.float32) for i, s in enumerate(shapes)]
    def kernel(*refs):
        ins = [r[:] for r in refs[:-1]]
        refs[-1][:] = fn(*ins)
    out_shape = jax.eval_shape(fn, *xs)
    try:
        r = pl.pallas_call(kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*len(xs),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(out_shape.shape, out_shape.dtype))(*xs)
        expected = fn(*xs)
        err = float(jnp.abs(r - expected).max())
        print(f"{name}: OK err={err:.2e}")
    except Exception as e:
        print(f"{name}: FAIL {str(e)[:110]}")

# 2D matmul
try_kernel("2d mm", lambda a,b: jnp.dot(a,b, preferred_element_type=jnp.float32), (128,64),(64,128))
# batched matmul (TB,N,K)x(TB,K,M)
try_kernel("batched mm", lambda a,b: jnp.einsum('bik,bkj->bij', a, b), (16,10,64),(16,64,10))
# batched mm with shared rhs
try_kernel("b,shared rhs", lambda a,b: jnp.einsum('bik,kj->bij', a, b), (16,10,64),(64,128))
# 4d batched 'bihd,bjhd->bhij'
try_kernel("qk 4d", lambda q,k: jnp.einsum('bihd,bjhd->bhij', q, k), (8,10,4,64),(8,10,4,64))
# 'bhij,bjhd->bihd'
try_kernel("attnv 4d", lambda a,v: jnp.einsum('bhij,bjhd->bihd', a, v), (8,4,10,10),(8,10,4,64))
# 'bhic,bjc->bhij'
try_kernel("qkd3", lambda a,x: jnp.einsum('bhic,bjc->bhij', a, x), (8,4,10,3),(8,10,3))
# vector dot -> matmul 2d with (K,1)
try_kernel("mv", lambda a,b: jnp.dot(a, b, preferred_element_type=jnp.float32), (128,64),(64,1))
# softmax, layernorm-ish, grad of small fn
try_kernel("softmax", lambda a: jax.nn.softmax(a, axis=-1), (8,4,10,10))
try_kernel("grad poly", lambda x: jax.grad(lambda y: jnp.sum(jnp.sin(y)**2))(x), (16,10,3))
# grad through a 2d matmul
try_kernel("grad mm", lambda x,w: jax.grad(lambda y: jnp.sum(jnp.tanh(y@w)))(x), (32,64),(64,64))
