"""Validate the Pallas fused EGNN kernel vs the reference jnp path, on TPU."""
import numpy as np, jax, jax.numpy as jnp, time
from coati_tpu.ops.pallas.egnn_messages import (
    egnn_messages,
    egnn_messages_bf16,
    egnn_messages_reference,
)

print("backend:", jax.default_backend())
rng = np.random.default_rng(0)
B, N, Hm = 4, 37, 256  # deliberately unaligned N
a = jnp.asarray(rng.normal(size=(B,N,Hm)), jnp.float32)
c = jnp.asarray(rng.normal(size=(B,N,Hm)), jnp.float32)
d2 = jnp.asarray(np.abs(rng.normal(size=(B,N,N))), jnp.float32)
w = jnp.asarray(rng.uniform(size=(B,N,N)) * (rng.uniform(size=(B,N,N))>0.3), jnp.float32)
wd = jnp.asarray(rng.normal(size=(Hm,)), jnp.float32)
b1 = jnp.asarray(rng.normal(size=(Hm,)), jnp.float32)
w2 = jnp.asarray(rng.normal(size=(Hm,Hm))*0.05, jnp.float32)
b2 = jnp.asarray(rng.normal(size=(Hm,)), jnp.float32)

ref = np.asarray(egnn_messages_reference(a,c,d2,w,wd,b1,w2,b2))
out = np.asarray(jax.jit(egnn_messages)(a,c,d2,w,wd,b1,w2,b2))
print("fwd max abs diff:", np.abs(out-ref).max(), " rel:", np.abs(out-ref).max()/np.abs(ref).max())
out16 = np.asarray(jax.jit(egnn_messages_bf16)(a,c,d2,w,wd,b1,w2,b2))
print("fwd bf16mm rel diff:", np.abs(out16-ref).max()/np.abs(ref).max(), "(expect ~bf16 eps)")

# gradients
def loss_fused(a,c,wd,b1,w2,b2):
    return jnp.sum(jnp.sin(egnn_messages(a,c,d2,w,wd,b1,w2,b2)))
def loss_ref(a,c,wd,b1,w2,b2):
    return jnp.sum(jnp.sin(egnn_messages_reference(a,c,d2,w,wd,b1,w2,b2)))
g_fused = jax.jit(jax.grad(loss_fused, argnums=(0,1,2,3,4,5)))(a,c,wd,b1,w2,b2)
g_ref = jax.jit(jax.grad(loss_ref, argnums=(0,1,2,3,4,5)))(a,c,wd,b1,w2,b2)
for name, gf, gr in zip(["da","dc","dwd","db1","dw2","db2"], g_fused, g_ref):
    gf, gr = np.asarray(gf), np.asarray(gr)
    denom = max(np.abs(gr).max(), 1e-6)
    print(f"{name}: rel diff {np.abs(gf-gr).max()/denom:.2e}")

# perf: grande-like batch
B2, N2 = 160, 128
a2 = jnp.asarray(rng.normal(size=(B2,N2,Hm)), jnp.float32)
c2 = jnp.asarray(rng.normal(size=(B2,N2,Hm)), jnp.float32)
d22 = jnp.asarray(np.abs(rng.normal(size=(B2,N2,N2))), jnp.float32)
w22 = jnp.asarray(rng.uniform(size=(B2,N2,N2)), jnp.float32)
f_fused = jax.jit(egnn_messages)
f_ref = jax.jit(egnn_messages_reference)
for name, f in [("fused", f_fused), ("dense", f_ref)]:
    out = np.asarray(f(a2,c2,d22,w22,wd,b1,w2,b2))
    t0=time.perf_counter()
    for _ in range(5): out = np.asarray(f(a2,c2,d22,w22,wd,b1,w2,b2))
    print(f"{name} fwd: {(time.perf_counter()-t0)/5*1000:.2f} ms")
# grads perf
def l_f(a): return jnp.sum(egnn_messages(a,c2,d22,w22,wd,b1,w2,b2))
def l_r(a): return jnp.sum(egnn_messages_reference(a,c2,d22,w22,wd,b1,w2,b2))
for name, f in [("fused", jax.jit(jax.grad(l_f))), ("dense", jax.jit(jax.grad(l_r)))]:
    g = np.asarray(f(a2))
    t0=time.perf_counter()
    for _ in range(5): g = np.asarray(f(a2))
    print(f"{name} grad: {(time.perf_counter()-t0)/5*1000:.2f} ms")
