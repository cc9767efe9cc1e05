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
